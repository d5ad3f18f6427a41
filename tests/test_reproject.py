"""Per-chip CRS reprojection goldens — the reference's different-CRS
clipper test replicated number-for-number
(/root/reference/zen3geo/tests/test_datapipes_geopandas.py:93-156):
chips reprojected to EPSG:3857 and EPSG:32631 via the GDAL
suggested-warp-output grid, vector clipped per chip in the chip's CRS.
Tolerance 1e-6 m (the engine's from-scratch mercator/Krüger forward vs
pyproj differs at libm-ulp level, ~1e-9 m)."""

import pytest
from pyspark.sql import functions as F

from zen3geo_spark.functions.geo import mercator_np, tmerc_np
from zen3geo_spark.operators.clipper import (
    chip_bounds_from_grid, clip_vector_with_rectangle,
    clip_vector_with_rectangle_crs, suggested_warp_grid,
)
from zen3geo_spark.sources.fixtures import clip_boxes, raster_grid

CHIPS_SCHEMA = ("chip_id long, xmin double, ymin double, xmax double, "
                "ymax double, crs string")


def test_tmerc_forward_golden():
    """Krüger forward vs pyproj-derived reference literals (EPSG:32631)."""
    e, n = tmerc_np(4.0, 4.0, lon0=3.0)
    assert float(n) == pytest.approx(442194.9725083875, abs=1e-6)
    e2, _ = tmerc_np(2.5, 2.5, lon0=3.0)
    # chip1's left edge lands on this corner after warping
    assert float(e2) == pytest.approx(444414.4114896285, abs=1e-6)


def test_suggested_warp_grid_matches_rio_reproject_goldens(spark):
    """The warp grids must equal rio.reproject's output bounds/dims for
    both golden chips."""
    grid = raster_grid(spark)
    c0 = chip_bounds_from_grid(grid, -1, 0, 1, 1, chip_id=0).collect()[0]
    assert (c0["xmin"], c0["ymin"], c0["xmax"], c0["ymax"]) == (-1.5, -0.5, 1.5, 1.5)
    g0 = suggested_warp_grid(c0["xmin"], c0["ymin"], c0["xmax"], c0["ymax"],
                             c0["width"], c0["height"], "EPSG:3857")
    assert g0[0] == pytest.approx(-166979.23618991036, abs=1e-6)
    assert g0[1] == pytest.approx(-55646.75541526544, abs=1e-6)
    assert g0[2] == pytest.approx(166988.3675623712, abs=1e-6)
    assert g0[3] == pytest.approx(166998.31375292226, abs=1e-6)
    assert (g0[5], g0[6]) == (3, 2)

    c1 = chip_bounds_from_grid(grid, 3, 3, 5, 4, chip_id=1).collect()[0]
    g1 = suggested_warp_grid(c1["xmin"], c1["ymin"], c1["xmax"], c1["ymax"],
                             c1["width"], c1["height"], "EPSG:32631")
    assert g1[0] == pytest.approx(444414.4114896285, abs=1e-6)
    assert g1[1] == pytest.approx(276009.81064532325, abs=1e-6)
    assert g1[2] == pytest.approx(777205.5384580799, abs=1e-6)
    assert g1[3] == pytest.approx(497870.56195762416, abs=1e-6)
    assert (g1[5], g1[6]) == (3, 2)


def test_clip_reproject_goldens(spark):
    """Clipped geoseries bounds per chip CRS (reference :126-156)."""
    g0 = suggested_warp_grid(-1.5, -0.5, 1.5, 1.5, 3, 2, "EPSG:3857")
    g1 = suggested_warp_grid(2.5, 2.5, 5.5, 4.5, 3, 2, "EPSG:32631")
    chips = spark.createDataFrame(
        [(0, g0[0], g0[1], g0[2], g0[3], "EPSG:3857"),
         (1, g1[0], g1[1], g1[2], g1[3], "EPSG:32631")], CHIPS_SCHEMA)
    out = {(r["chip_id"], r["geom_id"]): r for r in
           clip_vector_with_rectangle_crs(clip_boxes(spark), chips).collect()}
    # each chip keeps exactly ONE surviving geometry, like the reference
    assert set(out) == {(0, 0), (1, 1)}
    r0 = out[(0, 0)]
    assert r0["crs"] == "EPSG:3857"
    assert r0["clip_minx"] == pytest.approx(0.0, abs=1e-6)
    assert r0["clip_miny"] == pytest.approx(0.0, abs=1e-6)
    assert r0["clip_maxx"] == pytest.approx(166988.3675623712, abs=1e-6)
    assert r0["clip_maxy"] == pytest.approx(166998.31375292226, abs=1e-6)
    r1 = out[(1, 1)]
    assert r1["crs"] == "EPSG:32631"
    assert r1["clip_minx"] == pytest.approx(444414.4114896285, abs=1e-6)
    assert r1["clip_miny"] == pytest.approx(276009.81064532325, abs=1e-6)
    assert r1["clip_maxx"] == pytest.approx(611163.137304327, abs=1e-6)
    assert r1["clip_maxy"] == pytest.approx(442194.9725083875, abs=1e-6)


def test_clip_crs_path_same_crs_matches_plain_clipper(spark):
    """With chip crs == geometry crs the CRS path must equal the plain
    rectangle clipper (identity transform)."""
    grid = raster_grid(spark)
    chips_plain = chip_bounds_from_grid(grid, -1, 0, 1, 1, chip_id=0).unionByName(
        chip_bounds_from_grid(grid, 3, 3, 5, 4, chip_id=1))
    plain = {(r["chip_id"], r["geom_id"]):
             (r["clip_minx"], r["clip_miny"], r["clip_maxx"], r["clip_maxy"])
             for r in clip_vector_with_rectangle(
                 clip_boxes(spark), chips_plain).collect()}
    chips_crs = chips_plain.select("chip_id", "xmin", "ymin", "xmax", "ymax", "crs")
    crs = {(r["chip_id"], r["geom_id"]):
           (r["clip_minx"], r["clip_miny"], r["clip_maxx"], r["clip_maxy"])
           for r in clip_vector_with_rectangle_crs(
               clip_boxes(spark), chips_crs).collect()}
    assert plain == crs


def test_mercator_np_matches_columns(spark):
    df = spark.createDataFrame([(51.5, -0.1), (-33.9, 151.2)], "lat double, lon double")
    from zen3geo_spark.functions.geo import mercator_x, mercator_y
    got = df.select(mercator_x(F.col("lon")).alias("x"),
                    mercator_y(F.col("lat")).alias("y")).collect()
    for r, (lat, lon) in zip(got, [(51.5, -0.1), (-33.9, 151.2)]):
        x, y = mercator_np(lat, lon)
        assert r["x"] == pytest.approx(float(x), abs=1e-6)
        assert r["y"] == pytest.approx(float(y), abs=1e-6)


def test_tmerc_inverse_roundtrip_property():
    """Inverse TM (β series + Newton conformal-latitude inversion)
    round-trips the forward to < 1e-9 degrees across the zone."""
    import numpy as np
    from zen3geo_spark.functions.geo import tmerc_inv_np, tmerc_np

    rng = np.random.RandomState(7)
    lat = rng.uniform(-80.0, 80.0, 500)
    lon = rng.uniform(-1.0, 7.0, 500)
    e, n = tmerc_np(lat, lon, lon0=3.0)
    lat2, lon2 = tmerc_inv_np(e, n, lon0=3.0)
    assert np.abs(lat2 - lat).max() < 1e-9
    assert np.abs(lon2 - lon).max() < 1e-9
