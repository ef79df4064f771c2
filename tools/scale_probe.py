"""Scaling probe: heavy ops at 1x and 8x the sf0.1 documents corpus.

8x corpus built by unioning id-shifted copies (distinct texts via a
per-copy token prefix so dedup structure stays realistic: planted
near-dup pairs replicate per copy, cross-copy pairs don't collide)."""
import sys, time
sys.path.insert(0, "/root/repo")
from uquery_rs_spark.session import get_spark
from pyspark.sql import functions as F
from uquery_rs_spark.operators import dedup as D
from uquery_rs_spark.operators import text as TX

spark = get_spark("scale-probe")
docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
n = docs.count()

def times_k(k):
    parts = [
        docs.select(
            (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
            F.concat(F.lit(f"c{i} "), F.col("text")).alias("text"),
            "lang", "source", "n_chars",
        )
        for i in range(k)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out.repartition(32).localCheckpoint()  # materialize once; probe timings exclude build

results = {}
for k in (1, 8):
    corpus = times_k(k)
    for name, fn in {
        "minhash_lsh": lambda c: D.minhash_lsh_pairs(c, threshold=0.5).count(),
        "exact_dedup": lambda c: D.exact_dedup_stats(c).count(),
        "language_id": lambda c: TX.with_tokens(c).select(TX.predicted_language(F.col(TX.TOKS))).count(),
        "repetition": lambda c: TX.repetition_stats(c).count(),
    }.items():
        fn(corpus)  # warm
        best = 1e9
        for _ in range(2):
            t0 = time.perf_counter(); fn(corpus); best = min(best, time.perf_counter() - t0)
        results[(name, k)] = best
        print(f"{name} x{k}: {best:.2f}s ({k*n} docs)", flush=True)

import math
print("\nscaling exponents (runtime ~ N^e):")
for name in ("minhash_lsh", "exact_dedup", "language_id", "repetition"):
    e = math.log(results[(name, 8)] / results[(name, 1)]) / math.log(8)
    print(f"  {name}: e = {e:.2f}")


def embedding_probe():
    """1x vs 4x embeddings: LSH pairs should scale subquadratically;
    blocked exact all-pairs is O(N^2) BY CONTRACT (run to document the
    contrast, not to pass a bound)."""
    from uquery_rs_spark.operators import similarity as S

    emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    n_emb = emb.count()

    def emb_k(k):
        parts = [
            emb.select((F.col("vec_id") + F.lit(i * 10_000_000)).alias("vec_id"),
                       "embedding", "label")
            for i in range(k)
        ]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionAll(p)
        return out.repartition(32).localCheckpoint()

    res = {}
    for k in (1, 4):
        corpus = emb_k(k)
        for name, fn in {
            "lsh_pairs_t09": lambda c: S.cosine_pairs_lsh(
                c, threshold=0.9, rows_per_band=16, dim=64).count(),
            "blocked_exact_t04": lambda c: S.cosine_pairs_blocked(
                c, threshold=0.4).count(),
        }.items():
            fn(corpus)
            t0 = time.perf_counter(); fn(corpus); res[(name, k)] = time.perf_counter() - t0
            print(f"{name} x{k}: {res[(name,k)]:.2f}s ({k*n_emb} vecs)", flush=True)
    import math
    for name in ("lsh_pairs_t09", "blocked_exact_t04"):
        e = math.log(res[(name, 4)] / res[(name, 1)]) / math.log(4)
        print(f"  {name}: e = {e:.2f}")


def round4_probe():
    """1x vs 8x scaling for the round-4 text operators: winnowing and
    containment ride the same inverted-index machinery as minhash (so
    should land near its exponent); LM perplexity is two narrow numpy
    passes and should scale ~linearly with docs."""
    res = {}
    ops = {
        "winnowing": lambda c: D.winnowing_pairs(c).count(),
        "containment": lambda c: D.containment_pairs_exact(c, threshold=0.6).count(),
        "lm_perplexity": lambda c: TX.lm_perplexity(
            c, ref_filter=F.col("lang") == "en"
        ).count(),
    }
    for k in (1, 8):
        corpus = times_k(k)
        for name, fn in ops.items():
            fn(corpus)
            best = 1e9
            for _ in range(2):
                t0 = time.perf_counter(); fn(corpus); best = min(best, time.perf_counter() - t0)
            res[(name, k)] = best
            print(f"{name} x{k}: {best:.2f}s ({k*n} docs)", flush=True)
    import math
    for name in ops:
        e = math.log(res[(name, 8)] / res[(name, 1)]) / math.log(8)
        print(f"  {name}: e = {e:.2f}")


if "--embeddings" in sys.argv:
    embedding_probe()
if "--round4" in sys.argv:
    round4_probe()


def bpe_probe():
    """Round 9: bpe_apply 1x/8x scaling row (r8 verdict item 6 'done'
    criterion). Merge table trained once at 1x (training cost is
    vocabulary-bound, excluded — it does not grow with corpus size);
    APPLY measured at both scales."""
    import math

    merges = TX.bpe_train(docs, n_merges=40)
    res = {}
    for k in (1, 8):
        corpus = times_k(k)
        fn = lambda c: TX.bpe_apply(c, merges).select(
            F.sum("n_tokens")
        ).collect()
        fn(corpus)
        best = 1e9
        for _ in range(2):
            t0 = time.perf_counter(); fn(corpus); best = min(best, time.perf_counter() - t0)
        res[k] = best
        print(f"bpe_apply x{k}: {best:.2f}s ({k*n} docs)", flush=True)
    e = math.log(res[8] / res[1]) / math.log(8)
    print(f"  bpe_apply: e = {e:.2f}")


if "--bpe" in sys.argv:
    bpe_probe()
