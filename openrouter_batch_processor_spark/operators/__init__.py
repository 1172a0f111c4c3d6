"""Distributed operators: grouping, LLM map, aggregation, dedup,
similarity search, text analysis, renumbering."""
