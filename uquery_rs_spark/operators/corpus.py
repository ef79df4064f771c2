"""Corpus-composition operators for training-data pipelines.

Mixing a pretraining corpus means sampling each source at its own rate
(web 10%, books 100%, …). `stratified_sample` does it DETERMINISTICALLY:
membership is a pure function of the document key via an affine hash over
the Mersenne prime 2^31-1 (exact int64, same arithmetic as the minhash
permutations in dedup.py) — so the sample is reproducible across runs,
engines, and partitionings, needs no shuffling or state, and composes
with incremental ingestion (a re-run keeps the same documents). That
determinism is also what makes it oracle-checkable row-for-row, unlike
rand()-based sampling.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_P = 2_147_483_647
_A = 2_654_435_761


def sample_bucket(key: Column, buckets: int = 10_000) -> Column:
    """Deterministic per-key bucket in [0, buckets): (A*key mod p) mod
    buckets. Exact int64 (products < 2^62 for key < 2^31)."""
    return F.pmod(F.pmod(key * F.lit(_A), F.lit(_P)), F.lit(buckets))


def stratified_sample(
    docs: DataFrame,
    rates: dict[str, float],
    strata_col: str = "source",
    key_col: str = "doc_id",
    default_rate: float = 0.0,
    buckets: int = 10_000,
) -> DataFrame:
    """Keep each row iff its key's bucket falls under its stratum's rate.

    No shuffle, no state: a narrow filter whose pass-set is fixed by the
    key hash — the property that makes corpus mixes reproducible and
    unions of increments consistent.
    """
    b = sample_bucket(F.col(key_col).cast("long"), buckets)
    thresh = F.lit(int(default_rate * buckets))
    for s, r in rates.items():
        thresh = F.when(F.col(strata_col) == s, F.lit(int(r * buckets))).otherwise(thresh)
    return docs.filter(b < thresh)


def hash_split(
    docs: DataFrame,
    key_col: str = "doc_id",
    threshold_hex2: str = "f3",
    names: tuple[str, str] = ("train", "val"),
) -> DataFrame:
    """Deterministic train/val assignment from an md5 prefix of the key.

    A row lands in ``names[0]`` iff the first two hex chars of
    md5(key) sort below ``threshold_hex2`` — e.g. 'f3' keeps 243/256 ≈
    94.9% for training. md5 hex is identical across engines (the oracle
    runs the same expression in DuckDB), and unlike rand()-splits the
    assignment is a pure row function: reproducible across runs,
    engines, partitionings, and incremental ingestion, with no shuffle.
    """
    h2 = F.substring(F.md5(F.col(key_col).cast("string")), 1, 2)
    return docs.withColumn(
        "split", F.when(h2 < F.lit(threshold_hex2), names[0]).otherwise(F.lit(names[1]))
    )
