from zen3geo_spark.plans import checkpoint  # noqa: F401
