"""Rectangle-clipper goldens from the reference
(/root/reference/zen3geo/tests/test_datapipes_geopandas.py:53-90,159-168)."""

import pytest
from pyspark.sql import functions as F

from zen3geo_spark.operators.clipper import (
    chip_bounds_from_grid, clip_vector_with_rectangle, validate_single_vector,
)
from zen3geo_spark.sources.fixtures import clip_boxes, raster_grid


def test_clip_goldens(spark):
    """chip1: clipped geom bounds (0,0,1.5,1.5), chip bounds
    (-1.5,-0.5,1.5,1.5); chip2: geom (2.5,2.5,4,4), chip (2.5,2.5,5.5,4.5)."""
    grid = raster_grid(spark)
    chips = chip_bounds_from_grid(grid, -1, 0, 1, 1, chip_id=0).unionByName(
        chip_bounds_from_grid(grid, 3, 3, 5, 4, chip_id=1)
    )
    rows = {r["chip_id"]: r for r in chips.collect()}
    assert (rows[0]["xmin"], rows[0]["ymin"], rows[0]["xmax"], rows[0]["ymax"]) == (-1.5, -0.5, 1.5, 1.5)
    assert (rows[0]["height"], rows[0]["width"]) == (2, 3)
    assert (rows[1]["xmin"], rows[1]["ymin"], rows[1]["xmax"], rows[1]["ymax"]) == (2.5, 2.5, 5.5, 4.5)
    assert (rows[1]["height"], rows[1]["width"]) == (2, 3)

    vec = clip_boxes(spark)
    clipped = clip_vector_with_rectangle(vec, chips).collect()
    by_chip = {r["chip_id"]: r for r in clipped}
    assert len(clipped) == 2  # one surviving geometry per chip
    c0, c1 = by_chip[0], by_chip[1]
    assert c0["geom_id"] == 0
    assert (c0["clip_minx"], c0["clip_miny"], c0["clip_maxx"], c0["clip_maxy"]) == (0.0, 0.0, 1.5, 1.5)
    assert c1["geom_id"] == 1
    assert (c1["clip_minx"], c1["clip_miny"], c1["clip_maxx"], c1["clip_maxy"]) == (2.5, 2.5, 4.0, 4.0)


def test_clipped_output_is_polygon(spark):
    """Clipped outputs stay polygons (>=3 vertices), like the reference's
    all(geom_type == 'Polygon') assert."""
    grid = raster_grid(spark)
    chips = chip_bounds_from_grid(grid, -1, 0, 1, 1, chip_id=0)
    out = clip_vector_with_rectangle(clip_boxes(spark), chips).collect()
    assert all(r["n_vertices"] >= 3 for r in out)


def test_single_vector_contract(spark):
    vec = clip_boxes(spark).withColumn("vset_id", F.col("geom_id"))
    with pytest.raises(NotImplementedError, match="length can only be 1"):
        validate_single_vector(vec)
