"""Query registry: name → (PySpark callable, DuckDB oracle SQL).

This is the correctness backbone. Every operator claimed in SURVEY.md §2 gets
one entry here; the driver runs the Spark callable and the oracle SQL
side-by-side at sf=0.01 and compares row count + schema + order-insensitive
value hash.

Conventions (critical for hash-matching):
- Alias EVERY computed/aggregate column identically in Spark and SQL.
- Round floating-point aggregates with ``round(x, 2)`` on BOTH sides —
  double summation order differs between engines; 2-decimal rounding
  absorbs the ~1e-9 accumulation error without (realistically) crossing a
  rounding boundary.
- Timestamps: Spark session tz is UTC, matching DuckDB's naive-UTC.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


@dataclass
class Query:
    name: str
    spark_fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None → driver records a weaker rows-only check
    doc: str = ""
    bench: bool = False  # include in bench.py headline set
    tags: tuple[str, ...] = field(default_factory=tuple)
    # When set, bench.py times THIS callable instead of spark_fn — used when
    # the oracle-checked query wraps the kernel in a verification shape
    # (e.g. _ann_recall_shape runs kernel + exact baseline) that would
    # distort the timing of the kernel itself. The correctness oracle
    # matches spark_fn, not bench_fn, so it can't be the DuckDB timing twin.
    bench_fn: Callable[[SparkSession, str], DataFrame] | None = None
    # DuckDB SQL timed (never hash-compared) as the ratio twin for
    # bench_fn entries — the same user-visible TASK on DuckDB's best
    # available plan. Round-11 addition: ann_ivf_topk regressed 2.9x in
    # BENCH_r10 and no ratio gate fired because bench_fn entries had no
    # twin (r10 verdict #3).
    bench_oracle: str | None = None


REGISTRY: dict[str, Query] = {}


def register(
    name: str,
    oracle: str | None = None,
    doc: str = "",
    bench: bool = False,
    tags: tuple[str, ...] = (),
    bench_fn: Callable[[SparkSession, str], DataFrame] | None = None,
    bench_oracle: str | None = None,
):
    """Decorator registering a query callable under ``name``."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = Query(
            name,
            fn,
            oracle,
            doc or (fn.__doc__ or ""),
            bench,
            tags,
            bench_fn,
            bench_oracle,
        )
        return fn

    return deco


# ---------------------------------------------------------------------------
# Table loading. Cached per (session, sf_dir) so repeated queries() calls
# don't re-plan the scans; temp views are (re-)registered so SQL-flavored
# queries resolve bare table names.
# ---------------------------------------------------------------------------

_loaded: dict[tuple[int, str], dict[str, DataFrame]] = {}

# r14 note: an input-bytes-keyed AQE gate (disable adaptive execution
# below ~1 GiB of scanned input) was implemented and A/B-measured here.
# A sequential A/B suggested 0.1-0.5 s/query wins, but a properly
# INTERLEAVED A/B (same session, alternating runs) showed the effect is
# net-neutral: AQE's per-stage job overhead on tiny inputs is offset by
# its partition coalescing collapsing 32-task reduce waves to 1 task
# (tumbling/ann were 0.1-0.17 s FASTER with AQE on). Reverted; AQE
# stays on unconditionally, as in every round since r1.


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    key = (id(spark), sf_dir)
    cached = _loaded.get(key)
    if cached is not None:
        return cached
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # round 8: TIME casts/extract need the feature flag (the driver
    # harness builds a plain session, so it must be set HERE)
    spark.conf.set("spark.sql.timeType.enabled", "true")
    # TIMESTAMP(MICROS) parquet reads natively as TIMESTAMP_NTZ, which
    # matches DuckDB's naive-UTC TIMESTAMP exactly AND keeps timestamp
    # predicates pushable to parquet row-group min/max pruning — the thing
    # that matters on a 100 TB time-ranged scan. Only genuinely-nanos files
    # (which Spark 4 refuses to read natively: PARQUET_TYPE_ILLEGAL) take
    # the legacy nanosAsLong + convert path; that conversion wraps the
    # column in an expression and forfeits pushdown, so it is strictly a
    # compatibility fallback, never the preferred route.
    ns_cols = {name: _nanos_timestamp_cols(f"{sf_dir}/{name}.parquet") for name in TABLES}
    any_ns = any(ns_cols.values())
    # STICKY conf policy: once any loaded dir needs nanosAsLong, leave it
    # on for the session's lifetime. Flipping it per-dir (round-3 code)
    # retroactively breaks cached DataFrames from earlier dirs — the conf
    # is read at SCAN time, so a cached ns-dir frame re-planned under
    # "false" raises PARQUET_TYPE_ILLEGAL. Sticky-true is safe for every
    # frame this loader builds: the ns→us wrapper is keyed on the parquet
    # FOOTER (pyarrow), not the conf, and micros files read identically
    # under either setting.
    if any_ns:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    tables: dict[str, DataFrame] = {}
    for name in TABLES:
        path = f"{sf_dir}/{name}.parquet"
        df = spark.read.parquet(path)
        for col in ns_cols[name]:
            # nanosAsLong surfaces ns-timestamps as epoch-nano longs;
            # integer `div 1000` truncates to micros exactly like DuckDB's
            # ns→us conversion (float division would lose precision at 1e18).
            df = df.withColumn(
                col, F.expr(f"timestamp_micros({col} div 1000)").cast("timestamp_ntz")
            )
        df.createOrReplaceTempView(name)
        tables[name] = df
    _loaded[key] = tables
    return tables


def _nanos_timestamp_cols(path: str) -> list[str]:
    """Columns stored as parquet timestamp[ns] (local paths only)."""
    try:
        import pyarrow.parquet as pq

        schema = pq.read_schema(path)
        return [
            f.name
            for f in schema
            if str(f.type).startswith("timestamp[ns")
        ]
    except Exception:
        return []
