from franzoxide_spark.functions import numeric, text, vectors  # noqa: F401
