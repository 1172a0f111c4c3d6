"""Session-staged tables: materialize-once artifacts shared across
registry queries, the way a production corpus run stages them.

A real dedup/curation pipeline does not recompute cluster membership or
quality scores per consumer: it writes the scores table and the cluster
"kill list" once, and every keep-policy/report/yield consumer joins the
staged artifact (the reference analog is the content-addressed results
registry, app.py:1029 — compute once, look up thereafter). `staged()`
is that pattern inside one Spark session: an eager localCheckpoint
memoized on the INPUT PLAN (semanticHash + schema + session), so

- the first consumer pays the full compute (visible as the cold pass-1
  number in BENCH_DETAIL.json["runs"]);
- later consumers — other registry queries in the same session — read
  the materialized table;
- a different input plan (other sf_dir, other survivor set, other
  session) can never hit a stale entry: the key IS the plan.

Scale note: at 100 TB "staged" means a parquet/Delta write instead of a
localCheckpoint; the sharing contract (compute once per input, join
everywhere) is identical, and the artifacts staged here are chosen for
bounded size — cluster membership is O(duplicates), quality scores are
one row per doc.

DURABLE MODE: set ``SPARK_GRAFT_STAGING_DIR`` to a directory and both
``staged()`` and ``staged_from()`` become that parquet write — the
artifact is written once under a plan-content-addressed name
(label + schema + semanticHash, like the reference's config-hash-keyed
results registry, app.py:148-177) and every later consumer — INCLUDING
A DIFFERENT SESSION — reads the parquet scan instead of recomputing.
The commit is atomic (write to a tmp dir, os.rename into place), the
same last-writer-wins discipline as the reference's atomic JSON
replace, so concurrent stagers are benign. The address is the LOGICAL
PLAN, not the data: re-staging after in-place mutation of an input
table requires a new directory (test data here is immutable, and at
production scale inputs are immutable snapshots).
"""

from __future__ import annotations

import hashlib
import os
import threading
from collections import OrderedDict

from pyspark.sql import DataFrame

# Bounded LRU (r04 self-review): an unbounded memo would pin every
# checkpointed artifact's storage blocks for the application's lifetime
# — at larger scale factors the ACCUMULATION, not any one table, becomes
# the memory ceiling. Evicting just drops our reference; Spark's
# ContextCleaner reclaims the checkpoint blocks once unreferenced. The
# cap trades re-staging cost for bounded storage; override with
# SPARK_GRAFT_STAGING_CACHE_MAX.
_CACHE_MAX = int(os.environ.get("SPARK_GRAFT_STAGING_CACHE_MAX", "64"))
_CACHE: "OrderedDict[tuple, DataFrame]" = OrderedDict()
# FAIR-pool jobs (plans/jobs.py, T3) can stage from several threads at
# once; the lock covers the check/insert/evict steps only — builds run
# OUTSIDE it, so a duplicate concurrent build is possible and benign
# (last writer wins, both results are correct), while a half-updated
# LRU order is not.
_LOCK = threading.Lock()


def _cache_put(key: tuple, df: DataFrame) -> None:
    with _LOCK:
        _CACHE[key] = df
        _CACHE.move_to_end(key)
        while len(_CACHE) > _CACHE_MAX:
            _CACHE.popitem(last=False)


def _cache_get(key: tuple):
    with _LOCK:
        hit = _CACHE.get(key)
        if hit is not None:
            _CACHE.move_to_end(key)
        return hit


def _key(df: DataFrame, label: str) -> tuple:
    return (
        df.sparkSession.sparkContext.applicationId,
        label,
        df.schema.simpleString(),
        df.semanticHash(),
    )


def _durable_path(df: DataFrame, label: str) -> str | None:
    """Plan-content address under SPARK_GRAFT_STAGING_DIR, or None when
    durable mode is off. No applicationId in the address — that is the
    point: a later session resolves the same input plan to the same
    artifact."""
    root = os.environ.get("SPARK_GRAFT_STAGING_DIR")
    if not root:
        return None
    ident = f"{label}|{df.schema.simpleString()}|{df.semanticHash()}"
    digest = hashlib.sha256(ident.encode()).hexdigest()[:16]
    safe = "".join(c if c.isalnum() or c in "-_" else "-" for c in label)
    return os.path.join(root, f"{safe}-{digest}")


def _durable_read_or_write(df_in: DataFrame, path: str, compute) -> DataFrame:
    """Read the parquet artifact at ``path`` if committed, else run
    ``compute()`` and commit it atomically (tmp dir + rename — the
    reference's atomic-replace registry commit, app.py:171-177)."""
    spark = df_in.sparkSession
    if not os.path.isdir(path):
        tmp = f"{path}.tmp-{os.getpid()}-{threading.get_ident()}"
        compute().write.mode("overwrite").parquet(tmp)
        try:
            os.rename(tmp, path)
        except OSError:
            # concurrent stager won the rename — its artifact is the
            # same function of the same input; drop ours
            import shutil

            shutil.rmtree(tmp, ignore_errors=True)
    return spark.read.parquet(path)


def staged(df: DataFrame, label: str) -> DataFrame:
    """Return an eagerly-materialized, session-memoized version of
    ``df``. ``label`` namespaces independent staging sites that could
    conceivably produce plan-identical inputs. With
    SPARK_GRAFT_STAGING_DIR set, the artifact is a durable parquet
    table shared across sessions (see module docstring)."""
    key = _key(df, label)
    hit = _cache_get(key)
    if hit is not None:
        return hit
    durable = _durable_path(df, label)
    if durable is not None:
        out = _durable_read_or_write(df, durable, lambda: df)
    else:
        out = df.localCheckpoint(eager=True)
    _cache_put(key, out)
    return out


def staged_from(input_df: DataFrame, label: str, build) -> DataFrame:
    """Memoize ``build(input_df)`` keyed on the INPUT plan — for
    builders whose output plan is not hashable as an identity (e.g.
    iterative algorithms whose result scans per-run checkpointed RDDs:
    duplicate_clusters' output plan differs every run even though the
    computation is the same function of the same input). With
    SPARK_GRAFT_STAGING_DIR set, the artifact is a durable parquet
    table shared across sessions (see module docstring)."""
    key = _key(input_df, label)
    hit = _cache_get(key)
    if hit is not None:
        return hit
    durable = _durable_path(input_df, label)
    if durable is not None:
        out = _durable_read_or_write(
            input_df, durable, lambda: build(input_df)
        )
    else:
        out = build(input_df).localCheckpoint(eager=True)
    _cache_put(key, out)
    return out


def _sql_value(v, dt) -> str | None:
    """Exact SQL literal text for numeric/bool/array cells, or None when
    the type is outside the safe-exact set (strings need escaping,
    decimals/timestamps have render subtleties — those take the F.lit
    fallback)."""
    from pyspark.sql.types import (
        ArrayType,
        BooleanType,
        ByteType,
        DoubleType,
        FloatType,
        IntegerType,
        LongType,
        ShortType,
    )

    if v is None:
        return f"cast(null as {dt.simpleString()})"
    if isinstance(dt, ArrayType):
        parts = [_sql_value(x, dt.elementType) for x in v]
        if any(p is None for p in parts):
            return None
        return "array(" + ", ".join(parts) + ")"
    if isinstance(dt, DoubleType):
        return repr(float(v)) + "D"
    if isinstance(dt, FloatType):
        # the collected value is a float32 widened exactly to double;
        # cast back rounds-to-nearest onto the identical float32
        return f"cast({repr(float(v))}D as float)"
    if isinstance(dt, LongType):
        return f"{int(v)}L"
    if isinstance(dt, (IntegerType, ShortType, ByteType)):
        return f"cast({int(v)} as {dt.simpleString()})"
    if isinstance(dt, BooleanType):
        return "true" if v else "false"
    return None


def _render_local_relation_sql(rows, fields) -> str | None:
    """One VALUES statement for the whole collected relation — VALUES
    resolves to a genuine LocalRelation (the Generate/Range forms do
    not constant-fold to one) — or None if any cell/type falls outside
    the exact renderer."""
    if any("'" in f.name or "`" in f.name for f in fields):
        return None
    tuples = []
    for r in rows:
        cells = []
        for f in fields:
            lit = _sql_value(r[f.name], f.dataType)
            if lit is None:
                return None
            cells.append(lit)
        tuples.append("(" + ", ".join(cells) + ")")
    cols = ", ".join(f"`{f.name}`" for f in fields)
    return f"SELECT * FROM VALUES {', '.join(tuples)} AS t({cols})"


def relocalize(df: DataFrame) -> DataFrame:
    """Materialize a SMALL DataFrame (iteration state: a weight row, a
    centroid table, a merge list — never data-sized) and re-embed it as
    a LocalRelation with the same rows and schema.

    Why not localCheckpoint: an eager checkpoint of a k-row table costs
    a job, and every downstream broadcast of it costs ANOTHER job (the
    exchange reads checkpoint blocks through the scheduler). A
    LocalRelation's rows live in the plan itself: broadcasting it is
    driver-local (executeCollect on LocalTableScan launches no job), so
    a T-step iterative operator drops from ~3 scheduler round-trips per
    step to the single aggregation job that computes the step.

    Values are bit-identical: collect() returns the Spark-COMPUTED
    doubles/decimals and createDataFrame re-encodes them exactly — no
    arithmetic happens on the Python side.

    At cluster scale the same call works unchanged (iteration state is
    size-bounded by construction — k centroids, d weights); this is the
    standard driver-side loop of distributed iterative algorithms, not
    a .collect() of data rows.

    Implementation note: NOT createDataFrame(rows) — PySpark backs that
    with a parallelized RDD (defaultParallelism partitions, jobs to
    broadcast). Literal structs exploded from a 1-row range collapse to
    a genuine LocalRelation under constant folding.

    Supported field types: atomic scalars and (nested) arrays of them —
    the types F.lit() can re-embed exactly. MapType/StructType iteration
    state is refused up front with a clear error (ADVICE r13 #4) rather
    than failing downstream inside lit()."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import ArrayType, MapType, StructType

    for f in df.schema.fields:
        dt = f.dataType
        while isinstance(dt, ArrayType):
            dt = dt.elementType
        if isinstance(dt, (MapType, StructType)):
            raise TypeError(
                f"relocalize: field '{f.name}' has unsupported type "
                f"{f.dataType.simpleString()} — only atomic scalars and "
                "arrays of them can be re-embedded as literals; "
                "use localCheckpoint for map/struct iteration state"
            )

    rows = df.collect()
    spark = df.sparkSession
    fields = df.schema.fields
    if not rows:
        # Empty LocalRelation via range(0), NOT createDataFrame([], ...)
        # — the latter is RDD-backed and spawns jobs on broadcast, the
        # exact cost this helper exists to avoid (ADVICE r13 #4).
        return spark.range(0).select(
            *[
                F.lit(None).cast(f.dataType).alias(f.name)
                for f in fields
            ]
        )
    # Fast path: render the whole relation as ONE SQL expression string
    # (the litarrays precedent — the parser runs JVM-side in a single
    # py4j round-trip, vs one round-trip PER CELL for F.lit; measured
    # 0.8 s for 32 rows x 16-double arrays the literal-struct way).
    # repr() round-trips doubles exactly; ints/bools are exact by
    # construction. Falls back to the per-cell form for types the
    # renderer doesn't cover (strings, decimals, timestamps, ...).
    sql = _render_local_relation_sql(rows, fields)
    if sql is not None:
        return spark.sql(sql)
    structs = [
        F.struct(
            *[
                F.lit(r[f.name]).cast(f.dataType).alias(f.name)
                for f in fields
            ]
        )
        for r in rows
    ]
    return (
        spark.range(1)
        .select(F.explode(F.array(*structs)).alias("_s"))
        .select("_s.*")
    )


def relocalize_chain(df: DataFrame) -> DataFrame:
    """relocalize() an unrolled iteration-state chain with AQE off for
    just that collect: such chains are T small exchanges — AQE has
    nothing to coalesce or skew-split there, and its per-stage
    re-optimization latency (~0.1 s per stage, measured on the logreg
    trajectory) is the whole cost. The conf is toggled around the
    single driver-blocking collect and restored immediately; queries
    planned outside the window are untouched. Values are unaffected —
    AQE is a physical-planning concern only."""
    conf = df.sparkSession.conf
    prev = conf.get("spark.sql.adaptive.enabled")
    conf.set("spark.sql.adaptive.enabled", "false")
    try:
        return relocalize(df)
    finally:
        conf.set("spark.sql.adaptive.enabled", prev)


def clear() -> None:
    """Drop every memoized artifact reference (the ContextCleaner then
    reclaims the checkpoint blocks). For harnesses that sweep multiple
    datasets in one session (tools/scale_probe.py) — queries never need
    this; the LRU bound handles steady-state. Also clears the auto-dial
    count memo: a harness that re-points a path at new data must not
    dial band widths off the previous corpus's count (ADVICE r13 #3)."""
    with _LOCK:
        _CACHE.clear()
    from openrouter_batch_processor_spark.operators.neighbors import (
        clear_count_cache,
    )

    clear_count_cache()
