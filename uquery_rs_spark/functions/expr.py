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
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    n = getattr(df, "_uq_num_parts", None)
    if n is None:
        # driver-side plan->RDD conversion, no job; memoized on the
        # instance so repeated spread() of the same frame skips it
        n = df.rdd.getNumPartitions()
        df._uq_num_parts = n
    return df.repartition(target) if n < target else df


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
