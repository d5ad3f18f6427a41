"""Mosaic + stacker goldens
(/root/reference/zen3geo/tests/test_datapipes_stackstac.py:15-50)."""

from pyspark.sql import functions as F

from zen3geo_spark.operators.mosaic import mosaic_first_valid
from zen3geo_spark.operators.stacker import snap_to_grid, stack
from zen3geo_spark.sources.fixtures import datacube_for_mosaic


def test_mosaic_golden(spark):
    """(3,1,32,32) of ones → (1,32,32) summing 32*32."""
    cube = datacube_for_mosaic(spark)
    out = mosaic_first_valid(cube, order_col="tile")
    assert out.count() == 32 * 32
    assert out.agg(F.sum("value")).collect()[0][0] == 32 * 32
    # first-valid: everything should come from tile 0
    assert out.agg(F.max("src")).collect()[0][0] == 0


def test_mosaic_nodata_falls_through(spark):
    """nodata quadrant in tile 0 → those pixels come from tile 1
    (docs/stacking.md:309 nodata kwarg)."""
    cube = datacube_for_mosaic(spark, nodata_variant=True)
    out = mosaic_first_valid(cube, order_col="tile", nodata=0.0)
    assert out.count() == 32 * 32
    assert out.agg(F.sum("value")).collect()[0][0] == 32 * 32
    srcs = dict(out.groupBy("src").count().collect())
    assert srcs[1] == 16 * 16
    assert srcs[0] == 32 * 32 - 16 * 16


def test_stack_band_select_and_bounds(spark):
    """Stacker: union + asset/band isin + bounds range filters + grid snap."""
    t1 = spark.range(100).selectExpr(
        "0 as time", "cast(id % 2 as int) as band",
        "cast(id % 10 as double) as x", "cast(id div 10 as double) as y",
        "1.0 as value")
    t2 = spark.range(100).selectExpr(
        "1 as time", "cast(id % 2 as int) as band",
        "cast(id % 10 as double) as x", "cast(id div 10 as double) as y",
        "2.0 as value")
    cube = stack([t1, t2], assets=[0], bounds=(0.0, 0.0, 5.0, 5.0))
    assert cube.select("band").distinct().count() == 1
    assert cube.agg(F.max("x")).collect()[0][0] < 5.0
    snapped = snap_to_grid(cube, xmin=0.0, ymax=5.0, res=1.0)
    r = snapped.filter((F.col("x") == 2.0) & (F.col("y") == 1.0)).first()
    assert r["x_idx"] == 2 and r["y_idx"] == 4  # row 0 at ymax, north-up


def test_build_overviews_pyramid(spark):
    """Level L+1 = 2x2-block average; pyramid row counts shrink 4x per
    level; level means are preserved (avg of avgs over full blocks)."""
    from pyspark.sql import functions as F
    from zen3geo_spark.operators.stacker import build_overviews

    base = spark.range(1024).selectExpr(
        "cast(0 as int) as band",
        "cast(id div 32 as int) as y_idx",
        "cast(id % 32 as int) as x_idx",
        "cast(id as double) as value",
    )
    pyr = build_overviews(base, levels=2)
    counts = {r["level"]: r["count"] for r in pyr.groupBy("level").count().collect()}
    assert counts == {0: 1024, 1: 256, 2: 64}
    means = {r["level"]: r["m"] for r in
             pyr.groupBy("level").agg(F.avg("value").alias("m")).collect()}
    assert means[0] == means[1] == means[2] == 511.5
    # golden block: level-1 pixel (0,0) = avg of ids {0,1,32,33} = 16.5
    v = pyr.filter("level = 1 and y_idx = 0 and x_idx = 0").first()["value"]
    assert v == 16.5


def test_bilinear_regrid_exact_on_linear_ramp(spark):
    """Bilinear interpolation reproduces a linear function exactly at
    interior target pixels (the defining property), and edge pixels
    renormalize (clamp) instead of dropping."""
    import numpy as np
    from zen3geo_spark.operators.stacker import regrid_bilinear

    # source: 8x8 at res 2 (centers 1,3,..,15), v = 3x + 5y + 7
    src = spark.range(64).selectExpr(
        "cast(0 as int) as time", "'vv' as band",
        "cast((id % 8) * 2.0 + 1.0 as double) as x",
        "cast(15.0 - (id div 8) * 2.0 as double) as y",
    ).selectExpr("time", "band", "x", "y", "3.0 * x + 5.0 * y + 7.0 as value")
    out = regrid_bilinear(src, (0.0, 16.0, 2.0), (0.0, 16.0, 1.0, 16, 16))
    got = {(r["y_idx"], r["x_idx"]): r["value"] for r in out.collect()}
    assert len(got) == 256
    for (j, i), v in got.items():
        cx, cy = i + 0.5, 16.0 - (j + 0.5)
        if 1.0 <= cx <= 15.0 and 1.0 <= cy <= 15.0:  # interior
            assert abs(v - (3.0 * cx + 5.0 * cy + 7.0)) < 1e-9, (j, i)


def test_stack_dtype_fill_value_xy_coords(spark):
    """stackstac kwargs parity (reference stackstac.py:106-126,
    docs/stacking.md:244-251): dtype casts the value column, fill_value
    densifies the output lattice where no source pixel landed, xy_coords
    labels grid indices with world coords (center vs topleft)."""
    from zen3geo_spark.operators.stacker import stack

    # 4x4 source block in the top-left of an 8x8 bounds lattice
    src = spark.range(16).selectExpr(
        "cast(0 as int) as time", "'vv' as band",
        "cast((id % 4) * 2.0 + 1.0 as double) as x",
        "cast(15.0 - (id div 4) * 2.0 as double) as y",
        "cast(id * 3 as double) as value",
    )
    out = stack([src], assets=["vv"], bounds=(0.0, 0.0, 16.0, 16.0),
                xmin=0.0, ymax=16.0, res=2.0, fill_value=-1.0,
                dtype="float32", xy_coords="center")
    rows = {(r["y_idx"], r["x_idx"]): r for r in out.collect()}
    assert len(rows) == 64  # full 8x8 lattice
    assert out.schema["value"].dataType.typeName() == "float"
    # present block keeps source values, cast to float32
    assert rows[(0, 0)]["value"] == 0.0
    assert rows[(3, 3)]["value"] == 45.0
    # gap rows got the fill
    assert rows[(7, 7)]["value"] == -1.0
    assert rows[(0, 4)]["value"] == -1.0
    # centroid labels
    assert rows[(0, 0)]["x_coord"] == 1.0 and rows[(0, 0)]["y_coord"] == 15.0
    assert rows[(7, 7)]["x_coord"] == 15.0 and rows[(7, 7)]["y_coord"] == 1.0
    # topleft labels on the same cube
    tl = stack([src], bounds=(0.0, 0.0, 16.0, 16.0), xmin=0.0, ymax=16.0,
               res=2.0, xy_coords="topleft")
    r00 = tl.filter("y_idx = 0 and x_idx = 0").first()
    assert r00["x_coord"] == 0.0 and r00["y_coord"] == 16.0
    # error contracts
    import pytest
    with pytest.raises(ValueError):
        stack([src], fill_value=0.0)
    with pytest.raises(ValueError):
        stack([src], res=2.0, xy_coords="middle")
