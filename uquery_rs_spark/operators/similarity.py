"""Similarity search over embedding columns (array<float>).

Beyond-reference surface (driver north star): brute-force cosine top-k as
the exact baseline, and an IVF (inverted-file) variant as the scale path.
Dot products run JVM-side via zip_with/aggregate — no Python, no UDF.

Scale design:
- brute force: queries × corpus crossJoin is O(|Q|·|C|·d). Correct and
  shuffle-free when the query side is broadcast; use for small query sets
  or as the verification oracle.
- IVF: k centroids chosen deterministically, corpus assigned to nearest
  centroid once (narrow pass), queries probe only `nprobe` nearest cells —
  compute drops by ~k/nprobe; the cell assignment is a broadcast join on
  centroid id, so no all-pairs shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from ..functions.expr import bind, spread


def _as_double(v: Column) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))


def with_unit_vector(df: DataFrame, vec_col: str, out_col: str = "unit") -> DataFrame:
    """Pre-normalize once so cosine becomes a plain dot product.

    Both the cast vector and its norm are bound once per row
    (functions.expr.bind); naively referencing the norm inside the
    division lambda would re-run the whole norm aggregate per element.
    """
    unit = bind(
        _as_double(F.col(vec_col)),
        lambda v: bind(l2_norm(v), lambda n: F.transform(v, lambda x: x / n)),
    )
    return df.withColumn(out_col, unit)


def cosine_topk_bruteforce(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: for each query vector, the k nearest corpus
    vectors (self excluded). Columns: query_id, neighbor_id, rank.

    Ties broken by neighbor_id; ranking on the raw double sim (stable for
    real-valued embeddings where gaps ≫ fp error).
    """
    q = with_unit_vector(queries, vec_col).select(
        F.col(id_col).alias("query_id"), F.col("unit").alias("qv")
    )
    # spread() = parallelism for the O(|Q|·|C|) scan + a barrier keeping
    # the normalization out of the per-pair join projection.
    c = spread(
        with_unit_vector(corpus, vec_col).select(
            F.col(id_col).alias("neighbor_id"), F.col("unit").alias("cv")
        )
    )
    sims = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", dot(F.col("qv"), F.col("cv")).alias("sim"))
    )
    w = W.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    n_cells: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate cosine top-k via IVF cells.

    Centroids = the `n_cells` lowest-id corpus vectors, unit-normalized
    (deterministic; a k-means refinement would slot in here unchanged).
    Corpus rows are assigned to their nearest centroid; each query probes
    its `nprobe` nearest cells only. Columns: query_id, neighbor_id, rank.
    """
    c = spread(
        with_unit_vector(corpus, vec_col).select(F.col(id_col).alias("cid"), F.col("unit").alias("cv"))
    )
    w_id = W.orderBy("cid")
    cents = (
        c.withColumn("rn", F.row_number().over(w_id))
        .filter(F.col("rn") <= n_cells)
        .select((F.col("rn") - 1).alias("cell"), F.col("cv").alias("centroid"))
    )
    # assign each corpus vector to its nearest centroid (broadcast pass)
    assigned = (
        c.crossJoin(F.broadcast(cents))
        .select("cid", "cv", "cell", dot(F.col("cv"), F.col("centroid")).alias("csim"))
        .withColumn("rk", F.row_number().over(W.partitionBy("cid").orderBy(F.col("csim").desc(), "cell")))
        .filter(F.col("rk") == 1)
        .select("cid", "cv", "cell")
    )
    q = with_unit_vector(queries, vec_col).select(F.col(id_col).alias("query_id"), F.col("unit").alias("qv"))
    probes = (
        q.crossJoin(F.broadcast(cents))
        .select("query_id", "qv", "cell", dot(F.col("qv"), F.col("centroid")).alias("csim"))
        .withColumn("rk", F.row_number().over(W.partitionBy("query_id").orderBy(F.col("csim").desc(), "cell")))
        .filter(F.col("rk") <= nprobe)
        .select("query_id", "qv", "cell")
    )
    sims = (
        probes.join(assigned, "cell")
        .filter(F.col("query_id") != F.col("cid"))
        .select("query_id", F.col("cid").alias("neighbor_id"), dot(F.col("qv"), F.col("cv")).alias("sim"))
    )
    w = W.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )
