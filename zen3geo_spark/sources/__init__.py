from zen3geo_spark.sources import fixtures, pages, tables  # noqa: F401
