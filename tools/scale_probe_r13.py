#!/usr/bin/env python
"""Round-13 single-box scale probes (r12 verdict #8): the two r12-new
entries that shipped without probe rows — ann_cosine_topk_int8 and
corpus_cross_source_dup_matrix — measured at 1x/8x/100x replicated
sf0.1, 64 partitions, warm JVM, same protocol as the NOTES-33 probes.

Replication protocol (caveats stated, mirroring NOTES 33):
- embeddings: vec_id remapped per replica (vec_id + i*N) so ids stay
  unique; the VECTORS repeat, which is fine for a brute-force matmul —
  the kernel's cost is rows x dims regardless of values.
- documents: doc_id remapped AND every WORD prefixed with a replica
  tag (r<i>_word) so 3-gram shingles never collide ACROSS replicas —
  without the tag every doc has R-1 exact twins and the pair count
  grows quadratically in R, which would measure duplicate blowup, not
  the operator's scan/shuffle shape. Prefixing (rather than inserting
  tag TOKENS between words — the first draft) preserves each doc's
  shingle count and selectivity exactly: the inserted-token variant
  created shingles like (tag, the, tag) shared by every doc of a
  replica, whose quadratic posting lists OOMed the probe at 8x.
  Intra-replica pair structure is identical to the original corpus,
  so the 1x row matches the registry entry's shape.
Inputs are materialized to parquet under .probe_tmp/ first so prep
cost never lands in the timed region; the directory is removed after.

Usage: python tools/scale_probe_r13.py [1 8 100]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from uquery_rs_spark import queries as Q  # noqa: E402
from uquery_rs_spark.operators import dedup as D  # noqa: E402
from uquery_rs_spark.operators import similarity as S  # noqa: E402
from uquery_rs_spark.session import get_spark  # noqa: E402

Q.load_all()

SF = "/root/testdata/sf0.1"
TMP = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   ".probe_tmp")


def _replicate_embeddings(spark, r: int) -> str:
    out = f"{TMP}/emb_{r}x"
    if not os.path.exists(out):
        emb = spark.read.parquet(f"{SF}/embeddings.parquet")
        n = emb.count()
        rep = spark.range(r).crossJoin(emb).select(
            (F.col("vec_id") + F.col("id") * n).alias("vec_id"),
            "embedding",
        )
        rep.repartition(64).write.mode("overwrite").parquet(out)
    return out

def _replicate_documents(spark, r: int) -> str:
    out = f"{TMP}/docs_{r}x"
    if not os.path.exists(out):
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        n = docs.count()
        rep = spark.range(r).crossJoin(docs).select(
            (F.col("doc_id") + F.col("id") * n).alias("doc_id"),
            "source",
            F.regexp_replace(
                "text",
                F.lit(r"(^|\s)"),
                F.concat(F.lit("$1r"), F.col("id"), F.lit("_")),
            ).alias("text"),
        )
        rep.repartition(64).write.mode("overwrite").parquet(out)
    return out


def _time(run, repeats: int = 3) -> float:
    run()  # warm
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        run()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    factors = [int(a) for a in sys.argv[1:]] or [1, 8, 100]
    # the dup-matrix probe explodes ~400 shingles/doc; 100x (500k docs,
    # ~200M posting rows) overflows the single local JVM's heap — cap
    # the matrix phase at 32x (the slope is established by 1x/8x/32x)
    doc_factors = [min(f, 32) for f in factors]
    spark = get_spark("scale-probe-r13")
    queries = spark.read.parquet(f"{SF}/embeddings.parquet").filter(
        F.col("vec_id") < 100
    )
    queries.count()
    for r in factors:
        path = _replicate_embeddings(spark, r)
        emb = spark.read.parquet(path)

        def run_ann():
            S.cosine_topk_bruteforce(queries, emb, k=5, int8=True).count()

        print(f"ann_cosine_topk_int8 {r}x: {_time(run_ann):.2f} s", flush=True)
    for r in dict.fromkeys(doc_factors):
        path = _replicate_documents(spark, r)
        docs = spark.read.parquet(path)
        src = docs.select("doc_id", "source")

        def run_matrix():
            pairs = D.jaccard_pairs_exact(docs, threshold=0.5).select("x", "y")
            sa = src.withColumnRenamed("doc_id", "x").withColumnRenamed(
                "source", "src_x")
            sb = src.withColumnRenamed("doc_id", "y").withColumnRenamed(
                "source", "src_y")
            (pairs.join(F.broadcast(sa), "x").join(F.broadcast(sb), "y")
             .groupBy(F.least("src_x", "src_y").alias("a"),
                      F.greatest("src_x", "src_y").alias("b"))
             .agg(F.count("*"), F.countDistinct("x")).count())

        print(f"corpus_cross_source_dup_matrix {r}x: {_time(run_matrix):.2f} s",
              flush=True)
    shutil.rmtree(TMP, ignore_errors=True)


if __name__ == "__main__":
    main()
