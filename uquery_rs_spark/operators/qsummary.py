"""Mergeable equi-rank quantile summaries — the quantile analog of the
materialized HLL day-sketches (events_q.py::events_hll_sketch_rollup).

A daily summary is the EXACT per-day quantile vector at k+1 equally
spaced ranks (fractions 0, 1/k, …, 1) plus the day's count — a few KB
regardless of day size, computed in one groupBy pass with Spark's
exact ``percentile`` (deterministic; no sampling, no randomness, so
the materialized summaries are re-checkable across runs). Rolling
windows then merge SUMMARIES, never raw rows: each day's k intervals
contribute weight n_d/k at their upper endpoints; the merged quantile
is the first crossing of the weighted cumulative sum — evaluated
entirely in Spark higher-order functions (transform/flatten/
array_sort/aggregate), zero Python in the plan.

Error bound (provable, checked by the caller's exact twin): snapping
an interval's mass to its upper endpoint shifts the day's empirical
CDF by at most n_d/k at any point, so the merged estimate's TRUE rank
is within Σ_d n_d/k = N_window/k of q·N_window (+1 per day for
endpoint rounding). With k=128 that is <1% of the window.

At 100 TB: raw events are scanned ONCE into ~#days summary rows; a
7-day rolling quantile over a year is a window over 365 rows of ~1 KB
each — the same composition story as the HLL rolling-uniques entry,
for quantiles, where Spark has no native mergeable-quantile sketch
column (approx_percentile cannot re-merge materialized state).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def daily_quantile_summaries(
    df: DataFrame,
    value_col: str,
    ts_col: str = "ts",
    k: int = 128,
) -> DataFrame:
    """Per-day (day, n, qs) summaries: n = non-null count, qs = exact
    quantiles at fractions i/k for i = 0..k (k+1 DOUBLE values)."""
    fracs = ", ".join(f"{i}D / {k}D" for i in range(k + 1))
    day = F.to_date(F.date_trunc("day", F.col(ts_col))).alias("day")
    return df.groupBy(day).agg(
        F.count(value_col).alias("n"),
        F.expr(
            f"percentile(CAST({value_col} AS DOUBLE), array({fracs}))"
        ).alias("qs"),
    )


def rolling_quantile(daily: DataFrame, q: float, days: int, k: int,
                     out_col: str) -> DataFrame:
    """Merge the day summaries in a RANGE window of ``days`` calendar
    days and read off quantile ``q``: weighted upper-endpoint points,
    sorted, first cumulative crossing of q·N. Adds ``out_col`` (the
    estimate) and ``{out_col}_n`` (the window's total count)."""
    win = (
        f"OVER (ORDER BY CAST(day AS TIMESTAMP) "
        f"RANGE BETWEEN INTERVAL {days - 1} DAYS PRECEDING AND CURRENT ROW)"
    )
    collected = f"collect_list(struct(n, qs)) {win}"
    n_tot = f"sum(n) {win}"
    # points: each day's k interval-upper-endpoints, weight n/k each
    points = (
        f"array_sort(flatten(transform(uq_days, uq_s -> "
        f"transform(sequence(2, {k + 1}), uq_i -> "
        f"struct(element_at(uq_s.qs, uq_i) AS v, "
        f"uq_s.n / CAST({k} AS DOUBLE) AS w)))), "
        f"(uq_l, uq_r) -> CASE WHEN uq_l.v < uq_r.v THEN -1 "
        f"WHEN uq_l.v > uq_r.v THEN 1 ELSE 0 END)"
    )
    # first v whose cumulative weight reaches q*N (fallback: last v)
    crossing = (
        f"aggregate({points}, "
        f"struct(CAST(0.0 AS DOUBLE) AS cum, CAST(NULL AS DOUBLE) AS val, "
        f"CAST(NULL AS DOUBLE) AS last), "
        f"(uq_a, uq_p) -> CASE WHEN uq_a.val IS NOT NULL THEN uq_a "
        f"WHEN uq_a.cum + uq_p.w >= {q}D * uq_n THEN "
        f"struct(uq_a.cum + uq_p.w AS cum, uq_p.v AS val, uq_p.v AS last) "
        f"ELSE struct(uq_a.cum + uq_p.w AS cum, "
        f"CAST(NULL AS DOUBLE) AS val, uq_p.v AS last) END, "
        f"uq_acc -> coalesce(uq_acc.val, uq_acc.last))"
    )
    # LET-bind the collected window list and total once (the r7
    # lambda-invariant lesson): zero/finish lambdas evaluate once each.
    expr = (
        f"aggregate(array(0), {collected}, (uq_a1, uq_i1) -> uq_a1, "
        f"uq_days -> aggregate(array(0), CAST({n_tot} AS DOUBLE), "
        f"(uq_a2, uq_i2) -> uq_a2, uq_n -> ({crossing})))"
    )
    return daily.selectExpr(
        "*",
        f"{expr} AS {out_col}",
        f"CAST({n_tot} AS BIGINT) AS {out_col}_n",
    )
