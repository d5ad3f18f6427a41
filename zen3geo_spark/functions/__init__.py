from zen3geo_spark.functions import geo, text  # noqa: F401
