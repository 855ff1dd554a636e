from franzoxide_spark.sources.registry import SOURCE_CLASSES, build_source  # noqa: F401
