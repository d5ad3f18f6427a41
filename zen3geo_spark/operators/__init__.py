from zen3geo_spark.operators import (  # noqa: F401
    canvas,
    chipper,
    clipper,
    combinators,
    dedup,
    mosaic,
    multimodal,
    rasterize,
    similarity,
    spatial_join,
    stac,
    stacker,
)
