from zen3geo_spark.streaming import incremental  # noqa: F401
