"""AS-OF join — DuckDB dialect form with no native Spark operator.

Reference context: DuckDB's `ASOF JOIN` is part of the admitted dialect
(SURVEY.md §2.B.3, "P3 hard" item §7.4); the reference itself never
exercises it, so semantics follow DuckDB docs: for each left row, match
the right row with the greatest right.ts <= left.ts (backward direction),
equal keys (`by`) required.

Spark-first implementation: the union + windowed last-non-null pattern —
one shuffle on (by-keys), no row explosion, no per-group Python:

    1. tag left rows 1, right rows 0; union aligned schemas
    2. window PARTITION BY by-keys ORDER BY (ts, tag) with
       last(right_payload, ignoreNulls) over rows UNBOUNDED PRECEDING..CURRENT
    3. keep left rows; matched payload rides along

Ordering (ts, tag) makes the match inclusive (right row at ts == left.ts
sorts first, so it's visible to the left row), matching ASOF's >=.

Scale: wall-clock is one sort-shuffle of |L|+|R| on the by-keys —
the same cost profile as a sort-merge join, with no skew-prone
range-expansion. Alternative rejected: per-group applyInPandas +
pd.merge_asof moves every row through Python/Arrow.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str] | str | None = None,
    right_cols: list[str] | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Backward as-of join: latest right row with right[on] <= left[on].

    Args:
        left/right: inputs sharing the ``on`` ordering column and ``by`` keys.
        on: ordering column name (present in both).
        by: equality key(s); None for a global as-of.
        right_cols: right payload columns to carry (default: all except
            ``on``/``by``).
        suffix: applied to right payload names colliding with left's.
    """
    by = [by] if isinstance(by, str) else (by or [])
    if right_cols is None:
        right_cols = [c for c in right.columns if c != on and c not in by]
    out_names = {c: (c + suffix if c in left.columns else c) for c in right_cols}

    lhs = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(1).alias("__tag"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(out_names[c]) for c in right_cols],
    )
    rhs = right.select(
        *[
            F.col(c) if c in by or c == on else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left.columns
        ],
        F.lit(0).alias("__tag"),
        *[F.col(c).alias(out_names[c]) for c in right_cols],
    )
    unioned = lhs.unionByName(rhs)

    w = (
        W.partitionBy(*by)
        .orderBy(F.col(on).asc(), F.col("__tag").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    matched: list[Column] = [
        F.last(out_names[c], ignorenulls=True).over(w).alias(out_names[c]) for c in right_cols
    ]
    return (
        unioned.select(*[c for c in left.columns], "__tag", *matched)
        .filter(F.col("__tag") == 1)
        .drop("__tag")
    )
