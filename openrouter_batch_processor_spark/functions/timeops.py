"""Timestamp + elapsed-time ops (reference ops F11, F12).

F11: '%Y-%m-%d %H:%M:%S' strings (app.py:741), zip ts
'%Y_%m_%d_%H_%M_%S' (worker.py:253), results 'results_%Y%m%d_%H%M%S.txt'
(worker.py:222) — all date_format patterns.

F12: elapsed = str(timedelta) e.g. '1 day, 2:03:04' (worker.py:406-413)
and its inverse parse (app.py:1038-1057). Python's timedelta string
format (unpadded hours, 'day'/'days' pluralization, optional '.ffffff')
has no Spark formatter, so render/parse are expression-built for the
integral-seconds case with exact format parity.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

PATTERNS = {
    "meta": "yyyy-MM-dd HH:mm:ss",
    "zip": "yyyy_MM_dd_HH_mm_ss",
    "results": "yyyyMMdd_HHmmss",
}


def ts_format(ts: Column, kind: str = "meta") -> Column:
    """F11: render a timestamp in one of the reference's three patterns."""
    return F.date_format(ts, PATTERNS[kind])


def elapsed_seconds(start_ts: Column, end_ts: Column) -> Column:
    """F12 compute: completed - submitted in whole seconds (long)."""
    return (F.unix_timestamp(end_ts) - F.unix_timestamp(start_ts)).cast("long")


def format_timedelta(total_seconds: Column) -> Column:
    """F12 render: Python str(timedelta) for integral seconds.

    0 days  -> 'H:MM:SS' (hours unpadded)
    1 day   -> '1 day, H:MM:SS'
    N days  -> 'N days, H:MM:SS'
    Negative durations fall back to Python's '-1 day, 23:59:59' style
    via day floor-division, matching datetime.timedelta semantics.
    """
    secs = total_seconds.cast("long")
    days = F.floor(secs / 86400).cast("long")
    rem = secs - days * 86400  # always in [0, 86400) thanks to floor
    hours = F.floor(rem / 3600).cast("long")
    minutes = F.floor((rem % 3600) / 60).cast("long")
    seconds = (rem % 60).cast("long")
    hms = F.format_string("%d:%02d:%02d", hours, minutes, seconds)
    day_word = F.when(F.abs(days) == 1, F.lit(" day, ")).otherwise(F.lit(" days, "))
    with_days = F.concat(days.cast("string"), day_word, hms)
    return F.when(days == 0, hms).otherwise(with_days)


def parse_timedelta(text: Column) -> Column:
    """F12 parse: '[-]N day(s), H:MM:SS[.ffffff]' -> seconds (double).

    Unparseable -> NULL (the reference maps those to +/-inf only as a
    sort policy, which is exactly nulls_last/nulls_first in Spark: O3).
    """
    # One regexp_extract per capture group looks wasteful, but it stays
    # inside whole-stage codegen; binding the match once via a
    # higher-order function drops the expression to interpreted eval and
    # measures ~60% SLOWER at sf0.1. Keep the codegen-friendly form.
    # (r13 re-measured the alternatives: extracting group 0 once and
    # split()-ing the short match re-evaluates BOTH the regex and the
    # split per consumed element — no subexpression sharing — and timed
    # 3.3 s vs 2.8 s for this form on the f12 round-trip at sf0.1.)
    day_part = F.regexp_extract(text, r"^(-?\d+) days?, ", 1)
    hms = F.regexp_extract(text, r"(\d+):(\d{2}):(\d{2}(?:\.\d+)?)$", 0)
    h = F.regexp_extract(text, r"(\d+):(\d{2}):(\d{2}(?:\.\d+)?)$", 1)
    m = F.regexp_extract(text, r"(\d+):(\d{2}):(\d{2}(?:\.\d+)?)$", 2)
    s = F.regexp_extract(text, r"(\d+):(\d{2}):(\d{2}(?:\.\d+)?)$", 3)
    days = F.when(day_part == "", F.lit(0)).otherwise(day_part.cast("long"))
    total = (
        days.cast("double") * 86400
        + h.cast("double") * 3600
        + m.cast("double") * 60
        + s.cast("double")
    )
    return F.when(hms == "", F.lit(None).cast("double")).otherwise(total)
