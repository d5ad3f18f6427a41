"""zen3geo_spark — a PySpark-native spatial-join + tiling engine.

A from-scratch re-expression of the query/data-processing capabilities of
``weiji14/zen3geo`` (reference: /root/reference) as idiomatic Spark
DataFrame transforms. zen3geo composes torchdata IterDataPipes over
rioxarray/pyogrio/xbatcher/datashader/geopandas/pystac
(``/root/reference/zen3geo/datapipes/__init__.py:5-26``); this engine
re-expresses each operator's *semantics* — raster/vector scans, fixed-stride
chip slicing, canvas rasterization, rectangle clipping, STAC-style catalog
search, stack/mosaic — as lazy, Catalyst-optimized DataFrame plans with
vectorized pandas/Arrow UDFs for the geometry kernels (no per-row Python).

Data model (SURVEY.md §1): rasters are long-form tile tables
``(scene_id, band, y_idx, x_idx, value)``; vectors are coordinate-array
tables ``(geom_id, geom_type, parts, minx..maxy, crs)``; canvases are pure
metadata rows; web pages are ``(url, warc_ts, html, text, lang)``.
"""

__version__ = "0.1.0"

from zen3geo_spark.session import get_spark  # noqa: F401
