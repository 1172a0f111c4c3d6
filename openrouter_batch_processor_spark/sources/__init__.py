from openrouter_batch_processor_spark.sources import ingest  # noqa: F401
