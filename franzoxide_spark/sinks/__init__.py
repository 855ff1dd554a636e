from franzoxide_spark.sinks.object_sink import ObjectSink  # noqa: F401
