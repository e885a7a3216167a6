from stateful_spark_streaming_spark.operators import tracks  # noqa: F401
