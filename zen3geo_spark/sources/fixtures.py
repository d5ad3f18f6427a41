"""Fixture DataFrames lifted from the reference's own tests (FIXTURES.md).

All literal values come from /root/reference/zen3geo/tests — these are the
golden inputs whose outputs the engine must reproduce exactly
(SURVEY.md §5). No geometry libraries: geometries are typed coordinate
arrays ``parts: array<array<struct<x:double,y:double>>>`` (rings / line
parts / point sets) plus denormalized bbox columns for range-join pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, DoubleType, IntegerType, LongType, StringType, StructField,
    StructType,
)

XY = StructType([StructField("x", DoubleType()), StructField("y", DoubleType())])

GEOM_SCHEMA = StructType(
    [
        StructField("geom_id", LongType()),
        StructField("geom_type", StringType()),  # multipoint|linestring|polygon|geometrycollection
        StructField("parts", ArrayType(ArrayType(XY))),
        StructField("crs", StringType()),
    ]
)

CANVAS_SCHEMA = StructType(
    [
        StructField("canvas_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("xmin", DoubleType()),
        StructField("ymin", DoubleType()),
        StructField("xmax", DoubleType()),
        StructField("ymax", DoubleType()),
        StructField("crs", StringType()),
    ]
)


def _xy(seq) -> list[dict]:
    return [{"x": float(x), "y": float(y)} for x, y in seq]


def geometries_datashader(spark: SparkSession) -> DataFrame:
    """The MultiPoint/LineString/Polygon fixture
    (reference tests/test_datapipes_datashader.py:36-40)."""
    rows = [
        (0, "multipoint", [_xy([(4.5, 4.5), (3.5, 1.0), (6.0, 3.5)])], "OGC:CRS84"),
        (1, "linestring", [_xy([(3, 5), (5, 3), (3, 2), (5, 0)])], "OGC:CRS84"),
        (2, "polygon", [_xy([(6, 5), (3.5, 2.5), (6, 0), (6, 2.5), (5, 2.5)])], "OGC:CRS84"),
    ]
    return with_bbox(spark.createDataFrame(rows, GEOM_SCHEMA))


def with_bbox(geoms: DataFrame) -> DataFrame:
    """Denormalize per-geometry bbox columns from the coordinate arrays."""
    flat = F.flatten("parts")
    return geoms.select(
        "*",
        F.array_min(F.transform(flat, lambda p: p.x)).alias("minx"),
        F.array_min(F.transform(flat, lambda p: p.y)).alias("miny"),
        F.array_max(F.transform(flat, lambda p: p.x)).alias("maxx"),
        F.array_max(F.transform(flat, lambda p: p.y)).alias("maxy"),
    )


def canvas_rasterize(spark: SparkSession, n: int = 1, crs: str | None = "OGC:CRS84") -> DataFrame:
    """The 14x10 canvas x_range=(1,8) y_range=(0,5)
    (reference tests/test_datapipes_datashader.py:20-24); ``n`` copies."""
    rows = [(i, 14, 10, 1.0, 0.0, 8.0, 5.0, crs) for i in range(n)]
    return spark.createDataFrame(rows, CANVAS_SCHEMA)


def clip_boxes(spark: SparkSession) -> DataFrame:
    """Two unit boxes (reference tests/test_datapipes_geopandas.py:21-24)."""
    rows = [
        (0, "polygon", [_xy([(0, 0), (2, 0), (2, 2), (0, 2)])], "OGC:CRS84"),
        (1, "polygon", [_xy([(2, 2), (4, 2), (4, 4), (2, 4)])], "OGC:CRS84"),
    ]
    return with_bbox(spark.createDataFrame(rows, GEOM_SCHEMA))


def raster_grid(spark: SparkSession) -> DataFrame:
    """1 band x 5y x 7x all-ones grid, y linspace(4,0,5), x linspace(-1,5,7)
    (reference tests/test_datapipes_geopandas.py:36-45). Long form with
    pixel-center coordinate columns; pixel size 1.0 x 1.0."""
    df = (
        spark.range(1)
        .select(
            F.lit(0).cast("long").alias("scene_id"),
            F.explode(F.sequence(F.lit(0), F.lit(0))).alias("band"),
        )
        .select("scene_id", "band", F.explode(F.sequence(F.lit(0), F.lit(4))).alias("y_idx"))
        .select("scene_id", "band", "y_idx", F.explode(F.sequence(F.lit(0), F.lit(6))).alias("x_idx"))
        .select(
            "scene_id", "band", "y_idx", "x_idx",
            (F.lit(4.0) - F.col("y_idx")).alias("y"),
            (F.lit(-1.0) + F.col("x_idx")).alias("x"),
            F.lit(1.0).alias("value"),
            F.lit("OGC:CRS84").alias("crs"),
        )
    )
    return df


def scenes_meta(spark: SparkSession, rows: list[tuple]) -> DataFrame:
    """Scene metadata rows ``(scene_id, n_band, n_y, n_x)`` for chip math."""
    return spark.createDataFrame(rows, "scene_id long, n_band int, n_y int, n_x int")


def datacube_for_mosaic(spark: SparkSession, nodata_variant: bool = False) -> DataFrame:
    """3 tiles x 1 band x 32x32 of ones
    (reference tests/test_datapipes_stackstac.py:20-25). The nodata variant
    zeroes a quadrant of tile 0 so first-valid must fall through to tile 1
    (reference docs/stacking.md:309 nodata kwarg)."""
    df = (
        spark.range(3).toDF("tile")
        .select("tile", F.explode(F.sequence(F.lit(0), F.lit(31))).alias("y_idx"))
        .select("tile", "y_idx", F.explode(F.sequence(F.lit(0), F.lit(31))).alias("x_idx"))
        .select("tile", F.lit(0).alias("band"), "y_idx", "x_idx", F.lit(1.0).alias("value"))
    )
    if nodata_variant:
        df = df.withColumn(
            "value",
            F.when((F.col("tile") == 0) & (F.col("y_idx") < 16) & (F.col("x_idx") < 16), F.lit(0.0))
            .otherwise(F.col("value")),
        )
    return df


def stac_items(spark: SparkSession, n: int = 50) -> DataFrame:
    """~n synthetic catalog items across 3 collections with deterministic
    bbox/datetime (FIXTURES.md F7; field shape from reference
    zen3geo/datapipes/pystac_client.py:29-39)."""
    return spark.range(n).selectExpr(
        "concat('item-', cast(id as string)) as item_id",
        "case cast(id % 3 as int) when 0 then 'sentinel-2-l2a' when 1 then 'sentinel-1-grd' else 'landsat-c2-l2' end as collection",
        "timestamp'2022-01-01 00:00:00' + make_interval(0,0,0,cast(id as int),0,0,0) as dt",
        "cast(-180 + (id * 37 % 340) as double) as minx",
        "cast(-85 + (id * 53 % 160) as double) as miny",
        "cast(-180 + (id * 37 % 340) + 10 as double) as maxx",
        "cast(-85 + (id * 53 % 160) + 8 as double) as maxy",
        "map('platform', concat('sat-', cast(id % 2 as string)), 'cloud', cast(id % 100 as string)) as properties",
        "map('vv', concat('s3://bucket/', cast(id as string), '/vv.tif'), 'vh', concat('s3://bucket/', cast(id as string), '/vh.tif')) as assets",
    )
