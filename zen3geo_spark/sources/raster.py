"""Raster & vector scan sources (RioXarrayReader / PyogrioReader /
XpySTACAssetReader analogues).

The reference reads GeoTIFF/GPKG/FlatGeoBuf/Zarr through GDAL-backed
libraries (/root/reference/zen3geo/datapipes/rioxarray.py:70-74,
pyogrio.py:87-89, xpystac.py:135-139). Those codecs aren't in this
container; the engine's scan substrate is:

* ``scan_tiles`` — a partitioned Parquet long-form tile table
  (scene_id, level, band, y_idx, x_idx, value). ``overview_level``
  (COG pyramid selection, docs/walkthrough.md:142) is a partition-column
  filter → partition pruning, free.
* ``scan_vectors`` — a GeoParquet-style table (geom_id, geom_type, parts,
  bbox cols, crs, attrs) — SURVEY.md §1 row 5.
* ``scan_binary_assets`` — ``spark.read.format('binaryFile')`` over raw
  asset files + a decode hook via mapInArrow/mapInPandas
  (operators/multimodal.py holds the stubbed decode kernels).
* ``open_asset`` — XpySTACAssetReader's engine-dispatch: format name →
  the right Spark reader.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def scan_tiles(spark: SparkSession, path: str,
               overview_level: int | None = None,
               bands: list[int] | None = None) -> DataFrame:
    """Raster scan with pyramid-level partition pruning + band pruning."""
    df = spark.read.parquet(path)
    if overview_level is not None and "level" in df.columns:
        df = df.filter(F.col("level") == overview_level)
    if bands is not None:
        df = df.filter(F.col("band").isin(bands))
    return df


def scan_vectors(spark: SparkSession, path: str,
                 bbox: tuple[float, float, float, float] | None = None) -> DataFrame:
    """Vector scan; bbox predicate prunes on the denormalized bounds
    columns (parquet min/max stats make this a real scan prune)."""
    df = spark.read.parquet(path)
    if bbox is not None:
        qxmin, qymin, qxmax, qymax = bbox
        df = df.filter(
            (F.col("minx") < qxmax) & (F.col("maxx") > qxmin)
            & (F.col("miny") < qymax) & (F.col("maxy") > qymin)
        )
    return df


def scan_binary_assets(spark: SparkSession, path_glob: str) -> DataFrame:
    """Raw asset scan: (path, modificationTime, length, content binary)."""
    return spark.read.format("binaryFile").load(path_glob)


ENGINES = {"parquet", "json", "csv", "binaryFile"}


def open_asset(spark: SparkSession, path: str, engine: str = "parquet",
               **options) -> DataFrame:
    """XpySTACAssetReader's engine dispatch (xpystac.py:41-46): the
    ``engine`` kwarg ≙ Spark's format(...) choice."""
    if engine not in ENGINES:
        raise ValueError(f"unsupported engine {engine!r}; one of {sorted(ENGINES)}")
    reader = spark.read.format(engine)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(path)
