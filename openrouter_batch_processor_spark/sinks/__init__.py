from openrouter_batch_processor_spark.sinks import artifacts  # noqa: F401
