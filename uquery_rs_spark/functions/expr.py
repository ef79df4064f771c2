"""Expression-building utilities for higher-order-function operators."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def spread(df: DataFrame) -> DataFrame:
    """Round-robin repartition up to the session default parallelism.

    Two jobs in one: (a) a small input (1-2 parquet splits) would pin
    CPU-bound interpreted-HOF projections to as many cores; (b) the
    exchange is a materialization barrier, so an expensive projection
    built on top of it can't be inlined by CollapseProject into a
    downstream join condition and re-evaluated per candidate pair. At
    real scale inputs already have enough splits and this approaches a
    no-op rebalance of narrow rows.

    The split count is ESTIMATED from optimizer plan statistics
    (parquet file bytes / maxPartitionBytes — driver-side, no job):
    the old `df.rdd.getNumPartitions()` probe ran the full
    plan→physical→RDD conversion, measured 71 ms per query build at
    bench scale vs 23 ms for the stats read — and at real scale the
    stats path is strictly cheaper (a 100 TB scan estimates far above
    the target and skips even that conversion). Inputs with unknown
    stats (RDD-backed frames report effectively Long.Max) fall back to
    the exact RDD probe.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    n = getattr(df, "_uq_num_parts", None)
    if n is None:
        try:
            size = int(
                df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
            )
        except Exception:
            size = 1 << 62
        if size < (1 << 60):
            try:
                mpb = int(
                    df.sparkSession._jsparkSession.sessionState()
                    .conf()
                    .filesMaxPartitionBytes()
                )
            except Exception:
                mpb = 128 << 20
            n = max(1, -(-size // mpb))
        else:
            # unknown stats: exact (slower) driver-side plan->RDD probe
            n = df.rdd.getNumPartitions()
        df._uq_num_parts = n
    return df.repartition(target) if n < target else df


# Column-expression memo (r14): a pyspark Column is an immutable JVM
# expression tree, and building a big one (nested higher-order lambdas)
# costs hundreds of py4j round trips — measured 104 ms for the 48-band
# minhash key expression, paid on EVERY query build. The tree depends
# only on column names and operator parameters, never on data, so one
# process-wide instance per parameter tuple is sound (Catalyst copies
# expressions into each plan during analysis; sharing a Column across
# DataFrames/queries is ordinary pyspark usage). Keyed additionally on
# the py4j gateway identity so a (hypothetical) JVM restart can't serve
# stale object handles.
_expr_memo: dict[tuple, Column] = {}


def cached_expr(key: tuple, build: Callable[[], Column]) -> Column:
    from pyspark import SparkContext

    k = (id(SparkContext._gateway) if SparkContext._gateway else 0, *key)
    col = _expr_memo.get(k)
    if col is None:
        col = build()
        _expr_memo[k] = col
    return col


def bind(expr: Column, fn: Callable[[Column], Column]) -> Column:
    """Evaluate ``expr`` once per row and pass it to ``fn`` as a bound
    lambda variable.

    Composing expressions through Python variables COPIES the
    sub-expression tree into every reference site, and Spark's interpreted
    higher-order lambdas re-evaluate each copy (no common-subexpression
    elimination, no codegen). An expression referenced k times inside a
    transform over m elements runs k*m times per row. Wrapping it as the
    element of a single-element array transform makes every reference a
    lambda-variable read: one evaluation per row, however many reads.

    Measured on this repo's operators: tokenizing inside a 48-gram shingle
    builder re-ran split() 144x per document; minhash base hashes re-ran
    per permutation (96x); l2 normalization re-ran the norm aggregate per
    vector element (64x). `bind` removes all three.
    """
    return F.element_at(F.transform(F.array(expr), fn), 1)
