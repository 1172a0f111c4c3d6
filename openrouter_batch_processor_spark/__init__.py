"""openrouter_batch_processor_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the data-processing capabilities of
``ValRCS/openrouter_batch_processor`` (a single-node Flask batch
LLM-pipeline app) as an idiomatic, horizontally scalable PySpark engine:

- every data operation of the reference (SURVEY.md §2: scans, sinks,
  projections, filters, grouping, dedup, joins, sorts, renumbering,
  incremental progress) re-expressed as DataFrame / Spark SQL lineage;
- plus the large-scale training-data-pipeline operators the reference
  lacks: exact + fuzzy dedup (MinHash-LSH, SimHash, n-gram Jaccard),
  embedding similarity search, multimodal binary columns, text analysis
  (language id, quality scoring, token counting, fingerprinting), and
  Structured Streaming windows.

Design rules (enforced throughout):
- DataFrame-first; Catalyst does the optimizing. No RDDs on the hot path.
- No ``collect()`` inside operators (only tiny driver-side literals such
  as a top-k query vector or cumulative partition offsets).
- Python UDFs only where Column expressions genuinely cannot express the
  semantics (LLM transport, JSON repair, timedelta rendering) — and then
  Arrow-batched pandas UDFs, never row-at-a-time.
- Every operator has a DuckDB-oracle SQL twin in ``registry.py``.
"""

__version__ = "0.1.0"

# Lazy top-level API (PEP 562): the package import stays cheap and
# circular-free; `from openrouter_batch_processor_spark import REGISTRY`
# (or get_spark, run_llm_pipeline, ...) resolves on first access.
_API = {
    "REGISTRY": ("openrouter_batch_processor_spark.registry", "REGISTRY"),
    "get_spark": ("openrouter_batch_processor_spark.session", "get_spark"),
    "load_table": ("openrouter_batch_processor_spark.session", "load_table"),
    "run_llm_pipeline": (
        "openrouter_batch_processor_spark.plans.pipeline",
        "run_llm_pipeline",
    ),
    "register_zip_source": (
        "openrouter_batch_processor_spark.sources.zip_datasource",
        "register_zip_source",
    ),
}


def __getattr__(name: str):
    if name in _API:
        import importlib

        mod, attr = _API[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


def __dir__():
    return sorted(list(globals()) + list(_API))
