"""Text assembly + JSON repair (reference ops F8, F9, F13, F16).

F13 (JSON extraction + repair, worker.py:186-207) is irreducibly
procedural — slice from the first '{'/'[' to the last '}'/']', attempt
parse, strip trailing commas, retry, and return a ``false`` sentinel on
final failure. It is implemented as an Arrow-batched pandas UDF (the
only sane Python boundary), everything else as Column expressions.
"""

from __future__ import annotations

import json
import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# F8 — footer append with conditional newline separator (worker.py:238-244)
# ---------------------------------------------------------------------------


def append_footer(text: Column, footer: Column) -> Column:
    """Append footer unless blank; insert '\\n' unless text ends \\n or \\r."""
    needs_sep = ~(text.endswith("\n") | text.endswith("\r"))
    joined = F.when(needs_sep, F.concat(text, F.lit("\n"), footer)).otherwise(
        F.concat(text, footer)
    )
    blank_footer = F.trim(footer) == ""
    return F.when(footer.isNull() | blank_footer, text).otherwise(joined)


# ---------------------------------------------------------------------------
# F9 — file labeling for prompts (worker.py:69-98, gate worker.py:306)
# ---------------------------------------------------------------------------


def label_text_for_prompt(rel_path: Column, text: Column, multi: Column) -> Column:
    """Prefix 'File: <rel>\\n' when the group has >1 file or is a folder."""
    return F.when(multi, F.concat(F.lit("File: "), rel_path, F.lit("\n"), text)).otherwise(text)


# ---------------------------------------------------------------------------
# F16 — output-format list normalization (app.py:746-754, worker.py:267-279)
# ---------------------------------------------------------------------------

_ALLOWED_FORMATS = ("text", "csv", "json")


def normalize_formats(formats: Column, separate_outputs: Column) -> Column:
    """strip/lower, whitelist {text,csv,json}, order-preserving dedup,
    empty -> ['text'] if separate_outputs else ['csv'].

    Spark's array_distinct preserves first-occurrence order, matching the
    reference's manual seen-set loop.
    """
    cleaned = F.array_distinct(
        F.filter(
            F.transform(formats, lambda x: F.lower(F.trim(x))),
            lambda x: x.isin(*_ALLOWED_FORMATS),
        )
    )
    default = F.when(separate_outputs, F.array(F.lit("text"))).otherwise(
        F.array(F.lit("csv"))
    )
    return F.when(F.size(cleaned) == 0, default).otherwise(cleaned)


# ---------------------------------------------------------------------------
# F13 — JSON extraction + repair parse (worker.py:186-207)
# ---------------------------------------------------------------------------

_TRAILING_COMMA_RE = re.compile(r",(\s*[}\]])")


def _repair_parse_one(raw: str | None) -> tuple[str | None, bool]:
    """Mirror of the reference algorithm. Returns (canonical_json, ok)."""
    if raw is None:
        return None, False
    start_candidates = [i for i in (raw.find("{"), raw.find("[")) if i != -1]
    end_candidates = [i for i in (raw.rfind("}"), raw.rfind("]")) if i != -1]
    if not start_candidates or not end_candidates:
        return None, False
    sliced = raw[min(start_candidates) : max(end_candidates) + 1]
    for attempt in (sliced, _TRAILING_COMMA_RE.sub(r"\1", sliced)):
        try:
            parsed = json.loads(attempt)
            return json.dumps(parsed, ensure_ascii=False, sort_keys=True), True
        except (json.JSONDecodeError, ValueError):
            continue
    return None, False


_REPAIR_SCHEMA = T.StructType(
    [
        T.StructField("parsed_json", T.StringType()),
        T.StructField("parse_ok", T.BooleanType()),
    ]
)


@F.pandas_udf(_REPAIR_SCHEMA)
def json_repair_parse(raw: pd.Series) -> pd.DataFrame:
    """F13 as an Arrow-batched pandas UDF: (parsed_json, parse_ok).

    The reference returns the sentinel ``false`` for unparseable output
    (D5); we model that as parse_ok=False + NULL parsed_json, and the
    JSON sink serializes that pair back to ``false`` for byte parity.
    """
    out = [_repair_parse_one(v) for v in raw]
    return pd.DataFrame(out, columns=["parsed_json", "parse_ok"])
