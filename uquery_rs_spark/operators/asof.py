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

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str] | str | None = None,
    right_cols: list[str] | None = None,
    suffix: str = "_right",
    direction: str = "backward",
) -> DataFrame:
    """As-of join in all three directions.

    - ``backward`` (DuckDB's default `ON l.on >= r.on`): latest right row
      with right[on] <= left[on].
    - ``forward`` (`ON l.on <= r.on`): earliest right row with
      right[on] >= left[on].
    - ``nearest``: whichever of the two is closer in ``on``; ties go
      backward (pandas merge_asof convention).

    Both directions are the same union + windowed pattern: backward is
    last-non-null over UNBOUNDED PRECEDING..CURRENT with right rows
    sorting BEFORE coincident left rows (inclusive >=); forward mirrors
    it — first-non-null over CURRENT..UNBOUNDED FOLLOWING with right
    rows sorting AFTER coincident left rows. ``nearest`` runs both
    window passes over the SAME sorted partition (one shuffle total, no
    re-exchange — the sort satisfies both frames) and picks per-row.

    Args:
        left/right: inputs sharing the ``on`` ordering column and ``by`` keys.
        on: ordering column name (present in both).
        by: equality key(s); None for a global as-of.
        right_cols: right payload columns to carry (default: all except
            ``on``/``by``).
        suffix: applied to right payload names colliding with left's.
        direction: "backward" | "forward" | "nearest".
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward/forward/nearest, got {direction}")
    by = [by] if isinstance(by, str) else (by or [])
    if right_cols is None:
        right_cols = [c for c in right.columns if c != on and c not in by]
    out_names = {c: (c + suffix if c in left.columns else c) for c in right_cols}

    # Right rows must sort before coincident left rows for the backward
    # frame (so an equal-ts right row is inside PRECEDING..CURRENT) and
    # after them for the forward frame. tag: left=1; right=0 (backward
    # visible) — the forward pass orders by tag DESC to get the mirror.
    lhs = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(1).alias("__tag"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(out_names[c]) for c in right_cols],
    )
    # NULL compares match nothing (ADVICE r5, verified vs DuckDB): a right
    # row with a NULL ordering key or NULL equality key can never be the
    # match — drop before the union so the window can't pick it up (NULLs
    # sort first under ASC and would otherwise be visible to every frame).
    null_free = F.col(on).isNotNull()
    for k in by:
        null_free = null_free & F.col(k).isNotNull()
    rhs = right.filter(null_free).select(
        *[
            F.col(c) if c in by or c == on else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left.columns
        ],
        F.lit(0).alias("__tag"),
        *[F.col(c).alias(out_names[c]) for c in right_cols],
    )
    unioned = lhs.unionByName(rhs)

    w_back = (
        W.partitionBy(*by)
        .orderBy(F.col(on).asc(), F.col("__tag").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    w_fwd = (
        W.partitionBy(*by)
        .orderBy(F.col(on).asc(), F.col("__tag").desc())
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )

    # Match on ONE struct per right row carrying (on, payloads). The struct
    # itself is non-null exactly for right rows, so last/first(ignorenulls)
    # lands on the nearest right ROW as a unit: a NULL payload on that row
    # stays NULL instead of being silently pulled from a farther right row
    # (the per-payload-column ignorenulls bug — timestamp and values must
    # come from the same matched row, pandas merge_asof semantics).
    unioned = unioned.withColumn(
        "__r_match",
        F.when(
            F.col("__tag") == 0,
            F.struct(F.col(on).alias("__on"), *[F.col(out_names[c]) for c in right_cols]),
        ),
    )
    b = F.last("__r_match", ignorenulls=True).over(w_back)
    f = F.first("__r_match", ignorenulls=True).over(w_fwd)
    if direction == "backward":
        chosen = b
    elif direction == "forward":
        chosen = f
    else:
        # Closer side wins; ties and a missing forward match go backward
        # (pandas merge_asof convention). Gap comparison uses the struct's
        # own ordering value so it always refers to the matched row.
        chosen = F.when(
            f.isNull()
            | (b.isNotNull() & ((F.col(on) - b["__on"]) <= (f["__on"] - F.col(on)))),
            b,
        ).otherwise(f)
    # a left row with a NULL ordering key never matches either
    chosen = F.when(F.col(on).isNull(), F.lit(None)).otherwise(chosen)
    matched = [chosen[out_names[c]].alias(out_names[c]) for c in right_cols]
    return (
        unioned.select(*[c for c in left.columns], "__tag", *matched)
        .filter(F.col("__tag") == 1)
        .drop("__tag")
    )
