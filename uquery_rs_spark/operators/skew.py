"""Skew-mitigation join strategies.

Spark's first line of defense is AQE skew-join splitting
(spark.sql.adaptive.skewJoin.enabled, on in session.py) — it splits
oversized sort-merge partitions at runtime and needs no query change.
Salting is the explicit fallback for cases AQE can't fix: shuffled-hash
paths, aggregate hot keys, or skew so extreme a single key exceeds one
executor's memory. At 100 TB a handful of hot join keys (null keys,
default ids, power-law users) otherwise pins the whole stage on one task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT = "uq_salt"


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the left side's hot keys spread across `salt` buckets.

    The left (skewed) side gets a deterministic per-row salt —
    xxhash64 over all columns, so identical rows still spread; the right
    side is replicated `salt` times so every (key, salt) bucket finds its
    match. Shuffle keys become (key, salt): a key holding p% of rows now
    caps any task at p/salt %. Result equals ``left.join(right, on, how)``
    row-for-row; cost is replicating the right side `salt`× (keep it the
    smaller input, or broadcast instead when it fits).
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left (skewed probe side)")
    salted_left = left.withColumn(
        SALT, F.pmod(F.xxhash64(*left.columns), F.lit(salt)).cast("int")
    )
    salted_right = right.withColumn(
        SALT, F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    return salted_left.join(salted_right, [on, SALT], how).drop(SALT)


def skew_stats(df: DataFrame, key: str, top: int = 10) -> DataFrame:
    """Key-frequency profile: the diagnosis step before choosing a
    strategy (broadcast < salting < AQE-only). Columns: key value,
    n_rows, pct_of_total."""
    total = df.count()
    return (
        df.groupBy(key)
        .agg(F.count("*").alias("n_rows"))
        .withColumn("pct_of_total", F.round(100.0 * F.col("n_rows") / total, 4))
        .orderBy(F.col("n_rows").desc(), key)
        .limit(top)
    )


def top_key_share(df: DataFrame, key: str, denom: int = 1000, min_sample: int = 200) -> float:
    """Estimated share (0-1) of the hottest key, from a seeded ~1/denom
    uniform row sample (seeded rand: stable for a fixed input
    partitioning — an estimate feeding a strategy choice, not a result).
    Returns 0.0 when the sample is too small to diagnose. One Spark job,
    narrow scan of the key column only.
    """
    s = (
        df.select(F.col(key).alias("k"))
        .filter(F.rand(42) < 1.0 / denom)
        .groupBy("k")
        .agg(F.count("*").alias("c"))
        .agg(F.max("c").alias("mx"), F.sum("c").alias("tot"))
        .first()
    )
    if s is None or s.tot is None or s.tot < min_sample:
        return 0.0
    return float(s.mx) / float(s.tot)


def plan_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    how: str = "inner",
    skew_threshold: float = 0.2,
    salt: int = 16,
    denom: int = 1000,
    min_sample: int = 200,
) -> DataFrame:
    """Adaptive equi-join: sample the probe side's key distribution and
    salt only when one key exceeds `skew_threshold` of rows.

    AQE's skew-join split handles moderate sort-merge skew with no query
    change; this helper covers the cases it can't — a single key so hot
    it exceeds one task's memory even after splitting, or shuffled-hash
    plans. The diagnosis is one narrow sampling job ahead of the join
    (the build-time analogue of AQE's runtime stats); result is
    row-for-row identical to ``left.join(right, on, how)`` either way.
    """
    share = top_key_share(left, on, denom=denom, min_sample=min_sample)
    if share >= skew_threshold:
        return salted_join(left, right, on, salt=salt, how=how)
    return left.join(right, on, how)
