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
