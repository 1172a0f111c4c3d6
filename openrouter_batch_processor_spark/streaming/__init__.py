from openrouter_batch_processor_spark.streaming import windows  # noqa: F401
