"""Text-analysis operators: language ID, quality scoring, token stats,
document fingerprinting.

Beyond-reference surface (driver north star). Every formula is a pure
SQL-expressible function of the text so the DuckDB oracle can replicate it
bit-for-bit — deliberately: these run inside whole-stage codegen, no UDFs.

Evaluation-count discipline: consumers project the token split ONCE
(``docs.withColumn(c, tokens(text))``) and pass the column to these
builders. A column alias referenced more than once is protected from
CollapseProject inlining, so the tokenizer runs once per row however many
statistics read it; passing raw text would copy the split into every
reference (see functions/expr.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.expr import bind

# Tiny per-language stopword lists (public common-word sets); the language
# score is the fraction of tokens found in each list — a classic n-gram/
# stopword heuristic. Order matters for deterministic argmax ties.
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "it", "that", "for"),
    "de": ("der", "die", "das", "und", "ist", "ein", "zu", "den", "mit", "von"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "es", "por", "con"),
    "fr": ("le", "la", "de", "et", "un", "est", "que", "pour", "dans", "sur"),
}

TOKS = "uq_toks"  # conventional name for the projected token column


def tokens(text: Column) -> Column:
    return F.split(text, " ")


def with_tokens(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Project the token split once; downstream stats reference it."""
    return docs.withColumn(TOKS, tokens(F.col(text_col)))


def stopword_ratio(toks: Column, words: tuple[str, ...]) -> Column:
    wl = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(wl, t))) / F.size(toks)


def language_scores(toks: Column) -> list[Column]:
    """One `<lang>_score` column per language (rounded 4). `toks` should be
    a projected column (with_tokens), not a raw split expression."""
    return [
        F.round(stopword_ratio(toks, words), 4).alias(f"{lang}_score")
        for lang, words in STOPWORDS.items()
    ]


LANG_ST = "uq_lang_st"  # conventional name for the projected score struct


def with_language_struct(docs: DataFrame, toks_col: str = TOKS) -> DataFrame:
    """Project ALL four stopword ratios once as a struct column.

    Selecting language_scores(toks) AND predicted_language(toks) in one
    projection evaluates every ratio twice (the argmax's bind() shares
    work inside itself, but not with the score columns) — 8 interpreted
    filter passes over the token array per row. A struct column referenced
    by several downstream field extractions is protected from
    CollapseProject inlining (same rule with_tokens relies on), so the 4
    ratios run exactly once per row and scores + argmax read the fields.
    """
    from ..functions.expr import cached_expr

    st = cached_expr(
        ("language_struct", toks_col),
        lambda: F.struct(
            *[
                stopword_ratio(F.col(toks_col), w).alias(lang)
                for lang, w in STOPWORDS.items()
            ]
        ),
    )
    return docs.withColumn(LANG_ST, st)


def language_struct_scores(st: Column) -> list[Column]:
    """`<lang>_score` columns (rounded 4) from a with_language_struct col."""
    return [F.round(st[lang], 4).alias(f"{lang}_score") for lang in STOPWORDS]


def language_struct_argmax(st: Column) -> Column:
    """argmax over a with_language_struct column; 'und' when all zero.
    Ties resolve in STOPWORDS iteration order — the oracle's CASE chain."""
    best = F.greatest(*[st[lang] for lang in STOPWORDS])
    expr = F.lit("und")
    for lang in reversed(list(STOPWORDS)):
        expr = F.when(st[lang] == best, F.lit(lang)).otherwise(expr)
    return F.when(best > 0, expr).otherwise(F.lit("und"))


def predicted_language(toks: Column) -> Column:
    """argmax over language scores; 'und' (undetermined) when all zero.

    Ties resolve in STOPWORDS iteration order — the same CASE chain the
    oracle uses. The four scores are bound once as a struct; the CASE
    chain reads fields instead of re-running each ratio per comparison.
    """

    def chain(st: Column) -> Column:
        best = F.greatest(*[st[lang] for lang in STOPWORDS])
        expr = F.lit("und")
        for lang in reversed(list(STOPWORDS)):
            expr = F.when(st[lang] == best, F.lit(lang)).otherwise(expr)
        return F.when(best > 0, expr).otherwise(F.lit("und"))

    return bind(
        F.struct(*[stopword_ratio(toks, w).alias(lang) for lang, w in STOPWORDS.items()]),
        chain,
    )


def quality_score(text: Column, toks: Column) -> Column:
    """Heuristic quality in [0,1]: length sweet-spot + short-token penalty
    + digit/punct penalty. Deterministic rational arithmetic, rounded 4."""
    n_toks = F.size(toks)
    n_chars = F.length(text)
    avg_tok_len = n_chars / n_toks
    digit_ratio = (n_chars - F.length(F.regexp_replace(text, "[0-9]", ""))) / n_chars
    len_component = F.least(n_toks / F.lit(50.0), F.lit(1.0))
    tok_component = F.least(avg_tok_len / F.lit(5.0), F.lit(1.0))
    return F.round(
        F.lit(0.5) * len_component + F.lit(0.4) * tok_component - F.lit(0.3) * digit_ratio, 4
    )


def token_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document token statistics (whitespace + BPE-ish subword count)."""
    t = F.col(TOKS)
    # BPE-ish proxy: ceil(len/4) subwords per token — a public rule-of-thumb
    # for byte-pair vocabularies (~4 chars/token English average).
    bpe = F.aggregate(
        F.transform(t, lambda x: F.ceil(F.length(x) / 4).cast("long")),
        F.lit(0).cast("long"),
        lambda a, b: a + b,
    )
    return with_tokens(docs, text_col).select(
        "doc_id",
        F.length(text_col).alias("n_chars"),
        F.size(t).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(t)).cast("long").alias("n_types"),
        F.round(F.size(F.array_distinct(t)) / F.size(t), 4).alias("type_token_ratio"),
        bpe.alias("n_bpe_subwords"),
    )


_FP_MOD = 1_000_000_007
_FP_MUL = 31


def fingerprint(text: Column) -> Column:
    """Order-sensitive rolling document fingerprint.

    fp = fold over tokens: (fp*31 + ascii(first char)*7 + len(token)) mod 1e9+7.
    Stays < 2^35 so int64 arithmetic is exact in both engines.
    """
    t = tokens(text)
    return F.aggregate(
        t,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * _FP_MUL + F.ascii(x) * 7 + F.length(x)) % _FP_MOD,
    )


def fingerprint_sql(text_expr: str) -> str:
    """The DuckDB twin of :func:`fingerprint` (kept adjacent for parity)."""
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(string_split({text_expr}, ' '), t -> CAST(unicode(t) * 7 + length(t) AS BIGINT))), "
        f"(acc, x) -> (acc * {_FP_MUL} + x) % {_FP_MOD})"
    )


# PII patterns restricted to the RE2 ∩ Java-regex common subset (no
# lookaround), so the DuckDB oracle runs the identical pattern.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\b\d{3}[-.]\d{3}[-.]\d{4}\b",
}


def pii_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document PII match counts (one column per pattern) plus a
    has_pii flag — the triage step before redaction; codegen'd
    regexp_count, no UDF."""
    counts = [
        F.regexp_count(F.col(text_col), F.lit(pat)).alias(f"n_{name}")
        for name, pat in PII_PATTERNS.items()
    ]
    out = docs.select("doc_id", *counts)
    flag = None
    for name in PII_PATTERNS:
        c = F.col(f"n_{name}") > 0
        flag = c if flag is None else (flag | c)
    return out.withColumn("has_pii", flag)


def pii_redact(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Replace each PII match with a typed placeholder (<EMAIL>, <PHONE>)
    — the standard pretraining scrub. Global replace in both engines
    (Spark always; DuckDB with the 'g' flag on its side)."""
    redacted = F.col(text_col)
    for name, pat in PII_PATTERNS.items():
        redacted = F.regexp_replace(redacted, pat, f"<{name.upper()}>")
    return docs.select("doc_id", redacted.alias("redacted"))


def lm_perplexity(
    docs: DataFrame,
    text_col: str = "text",
    ref_filter: Column | None = None,
) -> DataFrame:
    """CCNet-style LM quality scoring with a character-bigram model.

    Train a char-bigram language model on a clean reference subset
    (``ref_filter``, e.g. ``lang = 'en'``), then score EVERY document by
    the mean negative log-probability of its bigrams (cross-entropy) and
    its exponential (perplexity). Low perplexity ≈ looks like the
    reference corpus; the classic pretraining quality signal (CCNet uses
    a wiki-trained KenLM the same way).

    Probabilities are Laplace-smoothed over the observed bigram alphabet:
    p(g) = (c_g + 1) / (N + V); unseen bigrams get the c_g = 0 mass.

    Scale shape (100 TB): the LM table is at most |alphabet|² rows —
    KB-sized — so training explodes reference bigrams into a groupBy
    whose map-side combine collapses each partition to |alphabet|² rows
    before the (tiny) shuffle. Scoring never shuffles at all: the LM
    ships to executors as a broadcast numpy table and each document is
    scored in place by a vectorized codepoint-pair lookup
    (utf-32 view → key = c1·2²¹ + c2 → searchsorted), one Arrow batch at
    a time. Round 4 measured the pure-SQL alternative (explode every
    corpus bigram into a broadcast join + per-doc re-aggregation) at 6x
    this runtime on sf0.1 — the corpus-sized explode+shuffle is the
    whole cost, and this formulation deletes it.
    """
    import numpy as np
    import pandas as pd

    base = docs.filter(F.length(text_col) >= 2)
    ref = base.filter(ref_filter) if ref_filter is not None else base

    # Bigrams are keyed as codepoint pairs: c1*2^21 + c2 is collision-free
    # across all of Unicode and lets both training and scoring run as
    # numpy array ops over each batch's concatenated utf-32 view.
    def _pair_keys(texts: list[str]) -> tuple[np.ndarray, np.ndarray]:
        """(keys of every in-doc adjacent pair incl. boundary junk,
        doc start offsets); caller masks/segments as needed."""
        lens = np.array([len(t) for t in texts], dtype="int64")
        cp = np.frombuffer("".join(texts).encode("utf-32-le"), dtype="uint32").astype(
            "int64"
        )
        return (cp[:-1] << 21) | cp[1:], np.cumsum(lens) - lens

    def count_bigrams(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            k, starts = _pair_keys(list(pdf[text_col]))
            valid = np.ones(len(k), dtype=bool)
            valid[starts[1:] - 1] = False  # pairs straddling doc boundaries
            u, c = np.unique(k[valid], return_counts=True)
            yield pd.DataFrame({"k": u, "c": c})

    lm_pdf = (
        ref.select(text_col)
        .mapInPandas(count_bigrams, "k long, c long")
        .groupBy("k")
        .agg(F.sum("c").alias("c"))
        .toPandas()
    )
    keys = lm_pdf["k"].to_numpy().astype("int64")
    counts = lm_pdf["c"].to_numpy().astype("float64")
    order = np.argsort(keys)
    keys, counts = keys[order], counts[order]
    n, v = counts.sum(), float(len(counts))
    if not len(counts):  # empty reference: degenerate uniform model
        n, v = 0.0, 1.0
    logp_tab = np.log((counts + 1.0) / (n + v))
    logp_unseen = float(np.log(1.0 / (n + v)))
    bc = docs.sparkSession.sparkContext.broadcast((keys, logp_tab, logp_unseen))

    def score(batches):
        keys, logp_tab, logp_unseen = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            texts = list(pdf[text_col])
            lens = np.array([len(t) for t in texts], dtype="int64")
            # One lookup for every adjacent pair in the batch, then
            # per-doc segment sums via reduceat — minus the one pair
            # that straddles each document boundary.
            k, starts = _pair_keys(texts)
            if len(keys):
                pos = np.clip(np.searchsorted(keys, k), 0, len(keys) - 1)
                lp = np.where(keys[pos] == k, logp_tab[pos], logp_unseen)
            else:
                lp = np.full(len(k), logp_unseen)
            sums = np.add.reduceat(lp, starts)
            if len(starts) > 1:
                sums[:-1] -= lp[starts[1:] - 1]
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "ce": -(sums / (lens - 1))}
            )

    scored = base.select("doc_id", text_col).mapInPandas(score, "doc_id long, ce double")
    return scored.select(
        "doc_id",
        F.round("ce", 4).alias("cross_entropy"),
        F.round(F.exp("ce"), 2).alias("ppl"),
    )


def repetition_stats(
    docs: DataFrame,
    text_col: str = "text",
    min_frac: float = 0.05,
) -> DataFrame:
    """Gopher-style repetition signal: the fraction of a document's word
    bigrams taken by its single most frequent bigram. Docs above
    ``min_frac`` are the loop/boilerplate suspects a pretraining filter
    drops.

    Entirely per-row array expressions — a narrow projection with NO
    shuffle, so at 100 TB it streams at scan speed.

    r14 kernel: the max bigram count is computed as the LONGEST EQUAL
    RUN in the sorted gram array — O(n log n) per document instead of
    the old O(|distinct| * n) count-per-distinct scan (equal multisets,
    identical value; pinned by test_repetition_runs_kernel_equivalent).
    The over-threshold emission goes through explode_outer + a
    null-filter on the GENERATED column instead of a plain filter on
    the stats struct: a deterministic filter would be substituted
    through the projection and pushed below any upstream exchange,
    re-running the whole kernel serially on the unsplit scan (the same
    pushed-below-spread defect r13 fixed in the dedup shingle kernels;
    measured 6.8 s -> 0.75 s at sf0.1 with the combined fix).
    """
    from ..functions.expr import bind

    def stats(toks: Column) -> Column:
        idx = F.sequence(F.lit(1), F.size(toks) - 1)
        gram = lambda i: F.concat_ws(" ", F.element_at(toks, i), F.element_at(toks, i + 1))  # noqa: E731
        grams = F.when(F.size(toks) >= 2, F.transform(idx, gram)).otherwise(
            F.array().cast("array<string>")
        )

        def runs(sg: Column) -> Column:
            st0 = F.struct(F.lit(1).alias("run"), F.lit(1).alias("best"))
            step = lambda acc, i: bind(  # noqa: E731
                F.when(
                    F.element_at(sg, i) == F.element_at(sg, i - 1), acc["run"] + 1
                ).otherwise(F.lit(1)),
                lambda r: F.struct(
                    r.alias("run"), F.greatest(acc["best"], r).alias("best")
                ),
            )
            return F.when(
                F.size(sg) >= 2,
                F.aggregate(F.sequence(F.lit(2), F.size(sg)), st0, step)["best"],
            ).otherwise(F.least(F.size(sg), F.lit(1)))

        return bind(
            grams,
            lambda g: F.struct(
                bind(F.array_sort(g), runs).alias("top_c"),
                F.size(g).alias("total"),
            ),
        )

    frac = F.col("s.top_c") / F.col("s.total")
    return (
        with_tokens(docs, text_col)
        .select("doc_id", stats(F.col(TOKS)).alias("s"))
        .select(
            "doc_id",
            F.explode_outer(
                F.when(frac > min_frac, F.array(F.round(frac, 4)))
            ).alias("top_bigram_frac"),
        )
        .filter(F.col("top_bigram_frac").isNotNull())
    )


def tfidf_top_terms(
    docs: DataFrame,
    k: int = 3,
    text_col: str = "text",
    key_col: str = "doc_id",
) -> DataFrame:
    """Per-document top-``k`` TF-IDF terms — the classic relevance /
    keyword-extraction primitive behind corpus quality filters and
    topic-balanced sampling.

    idf = ln((N + 1) / (df + 1)) + 1 (smoothed, always positive);
    score = tf * idf rounded to 4 (ordering uses the ROUNDED score +
    term tie-break so cross-engine libm ulp differences in ln() cannot
    reorder the top-k).

    Scale shape: explode → per-(doc, term) counts [shuffle 1, map-side
    combined], term document-frequencies [shuffle 2 over the VOCABULARY,
    not the corpus], join back (AQE broadcasts the df side when the
    vocabulary is small), top-k window per doc [shuffle 3 — with
    Spark's WindowGroupLimit pruning to k rows per doc BEFORE the
    exchange]. Corpus size N is a 1-row aggregate broadcast via
    crossJoin — the same bounded pattern as every verdict-frame
    broadcast in this repo.

    The df aggregate deliberately also sums tf (surfaced as ``ttf``,
    corpus-wide term frequency — a useful diagnostic in its own right):
    without it Catalyst prunes the tf count out of the df branch,
    turning it into a DISTINCT whose subplan no longer matches the tf
    side, and ReuseExchange can't fire — the corpus would be exploded
    and shuffled TWICE (observed in the r5 plan audit). With ttf kept,
    both join branches share one exchange (ReusedExchange in the plan,
    asserted in tests/test_plans.py).
    """
    from pyspark.sql import Window as W

    tf = (
        docs.select(F.col(key_col), F.explode(tokens(F.col(text_col))).alias("term"))
        .groupBy(key_col, "term")
        .agg(F.count("*").alias("tf"))
    )
    df_ = tf.groupBy("term").agg(
        F.count("*").alias("df"), F.sum("tf").alias("ttf")
    )
    n = docs.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(df_, "term")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf")
                * (F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)) + 1.0),
                4,
            ),
        )
    )
    w = W.partitionBy(key_col).orderBy(F.col("tfidf").desc(), F.col("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(key_col, "rank", "term", "tf", "df", "ttf", "tfidf")
    )


def bm25_scores(
    docs: DataFrame,
    query_terms: tuple[str, ...],
    k1: float = 1.2,
    b: float = 0.75,
    top: int = 20,
    text_col: str = "text",
    key_col: str = "doc_id",
) -> DataFrame:
    """BM25 ranking of the corpus against a fixed query term set — the
    retrieval scorer behind RAG candidate selection and targeted corpus
    slicing ("find the docs about X").

    idf_t = ln(1 + (N - df_t + 0.5) / (df_t + 0.5)); per-doc term
    frequency saturates via tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl)).

    Scale shape: ONE corpus-wide aggregate row (N, avgdl, and one df per
    query term — |query| columns, computed with array_contains, no
    explode) broadcast back; scoring is then a pure per-row expression
    and the global top-``top`` is orderBy+limit = TakeOrdered (per-
    partition heaps + driver merge of |parts| * top rows, never a full
    sort shuffle). Entirely whole-stage-codegen, zero Python.
    """
    if not query_terms:
        raise ValueError("bm25_scores requires at least one query term")
    toked = with_tokens(docs, text_col).withColumn("dl", F.size(F.col(TOKS)))
    stats = toked.agg(
        F.count("*").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum(F.array_contains(F.col(TOKS), t).cast("long")).alias(f"df_{i}")
            for i, t in enumerate(query_terms)
        ],
    )
    scored = toked.crossJoin(F.broadcast(stats))

    def term_count(term: str) -> Column:
        # factory, not a default-arg lambda: pyspark would read a second
        # lambda parameter as the element INDEX of a 2-arg filter.
        return F.size(F.filter(F.col(TOKS), lambda x: x == F.lit(term)))

    parts = []
    for i, t in enumerate(query_terms):
        tf = term_count(t)
        idf = F.log(
            1.0
            + (F.col("n_docs") - F.col(f"df_{i}") + 0.5) / (F.col(f"df_{i}") + 0.5)
        )
        denom = tf + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
        parts.append(idf * (tf * (k1 + 1.0)) / denom)
    score = F.round(sum(parts[1:], parts[0]), 4)
    return (
        scored.select(key_col, F.col("dl").alias("doc_len"), score.alias("bm25"))
        .orderBy(F.col("bm25").desc(), F.col(key_col))
        .limit(top)
    )


def compression_ratio(
    docs: DataFrame, text_col: str = "text", key_col: str = "doc_id", level: int = 6
) -> DataFrame:
    """Per-doc zlib compression ratio (compressed/raw bytes) — the
    classic cheap boilerplate/repetition signal (highly repetitive or
    templated documents compress far below the corpus norm; pure noise
    compresses above it). Columns: key, n_bytes, n_compressed, ratio.

    Arrow-batched mapInPandas over stdlib zlib — Python is unavoidable
    here (no JVM-side codec exposure in Spark SQL), but the kernel is a
    narrow per-row map with NO shuffle: at 100 TB it streams at scan
    speed and the output is 3 ints + a double per doc. Determinism: zlib
    at a fixed level is deterministic within a build, and byte-identical
    texts always yield byte-identical compressed sizes — the invariant
    the registry oracle checks.
    """
    import pandas as pd
    import zlib

    def kernel(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            raw = [t.encode("utf-8") if t is not None else b"" for t in pdf[text_col]]
            nb = [len(b) for b in raw]
            nc = [len(zlib.compress(b, level)) for b in raw]
            yield pd.DataFrame(
                {
                    key_col: pdf[key_col],
                    "n_bytes": nb,
                    "n_compressed": nc,
                    "ratio": [
                        (c / b) if b else float("nan") for c, b in zip(nc, nb)
                    ],
                }
            )

    return docs.select(key_col, text_col).mapInPandas(
        kernel, f"{key_col} long, n_bytes long, n_compressed long, ratio double"
    )


def bpe_train(
    docs: DataFrame, n_merges: int = 50, text_col: str = "text"
) -> list[tuple[str, str]]:
    """Train a byte-pair-encoding merge table (Sennrich et al. 2016) on
    the corpus: repeatedly count adjacent symbol pairs over the word
    vocabulary and merge the most frequent (ties to the lexicographically
    smallest pair — deterministic, seed-free).

    Scale shape: training operates on the WORD VOCABULARY with counts,
    not the corpus — one corpus pass aggregates (word, count), which is
    orders of magnitude smaller and is collected once (the same
    driver-side footprint as any tokenizer trainer); the merge loop then
    runs driver-side on that vocabulary. Re-train cost does not grow
    with corpus size beyond the initial word count.
    """
    vocab_rows = (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").alias("c"))
        .collect()
    )
    vocab: dict[tuple[str, ...], int] = {
        tuple(r["w"]): r["c"] for r in vocab_rows
    }
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for syms, c in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + c
        if not pairs:
            break
        best = min(pairs, key=lambda p: (-pairs[p], p))
        merges.append(best)
        merged = best[0] + best[1]
        new_vocab: dict[tuple[str, ...], int] = {}
        for syms, c in vocab.items():
            out: list[str] = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == best:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


def bpe_encode_counts(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
) -> DataFrame:
    """Apply a BPE merge table (Sennrich order: each merge replaces all
    its left-to-right non-overlapping occurrences, in rank order) and
    report per-doc token counts. Columns: doc_id, n_words, n_bpe_tokens.

    Kernel caches encodings per UNIQUE word within each Arrow batch —
    natural text re-uses words heavily, so the merge loop runs once per
    distinct word, not once per occurrence. The merge table broadcasts;
    the pass is narrow and shuffle-free.
    """
    import numpy as np
    import pandas as pd

    bc = docs.sparkSession.sparkContext.broadcast(list(merges))

    def encode(batches):
        merge_list = bc.value

        def word_len(w: str, cache: dict) -> int:
            hit = cache.get(w)
            if hit is not None:
                return hit
            syms = list(w)
            for a, b in merge_list:
                out: list[str] = []
                i = 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                syms = out
            cache[w] = len(syms)
            return len(syms)

        for pdf in batches:
            cache: dict[str, int] = {}
            n_words, n_tok = [], []
            for text in pdf[text_col]:
                words = [w for w in text.split(" ") if w]
                n_words.append(len(words))
                n_tok.append(sum(word_len(w, cache) for w in words))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_words": np.array(n_words, dtype="int64"),
                    "n_bpe_tokens": np.array(n_tok, dtype="int64"),
                }
            )

    return docs.select("doc_id", text_col).mapInPandas(
        encode, "doc_id long, n_words long, n_bpe_tokens long"
    )


# Gopher document-quality rules (Rae et al. 2021, "Scaling Language
# Models: ... Gopher", App. A1.1 — public thresholds). The two
# line-based rules (bullet-start / ellipsis-end fractions) need
# multi-line text and are omitted on the single-line corpus; the
# remaining five are the word-shape core of the filter.
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document Gopher quality signals + the accept flag.

    All pure JVM expression trees over ONE projected token split (no
    UDF, no shuffle — evaluates at scan speed; at 100 TB this is a
    narrow map the optimizer fuses into the scan stage):

    - n_words in [50, 100_000]
    - mean word length in [3, 10]
    - symbol-to-word ratio ('#' or '...') <= 0.1
    - fraction of words containing an alphabetic char >= 0.80
    - at least 2 of the 8 Gopher stop words present
    """
    toks = F.col(TOKS)
    n_words = F.size(toks)
    # chars excluding the separators / words — Gopher's mean word length
    mean_wl = F.length(F.regexp_replace(F.col(text_col), " ", "")) / n_words
    n_hash = F.size(F.filter(toks, lambda t: t.contains("#")))
    n_ell = F.size(F.filter(toks, lambda t: t.contains("...")))
    sym_ratio = (n_hash + n_ell) / n_words
    alpha_frac = F.size(F.filter(toks, lambda t: t.rlike("[a-zA-Z]"))) / n_words
    stop_arr = F.array(*[F.lit(w) for w in GOPHER_STOPWORDS])
    stop_hits = F.size(F.filter(stop_arr, lambda w: F.array_contains(toks, w)))
    out = (
        with_tokens(docs, text_col)
        .select(
            "doc_id",
            n_words.alias("n_words"),
            F.round(mean_wl, 4).alias("mean_word_len"),
            F.round(sym_ratio, 4).alias("symbol_ratio"),
            F.round(alpha_frac, 4).alias("alpha_word_frac"),
            stop_hits.alias("stop_hits"),
        )
    )
    passed = (
        F.col("n_words").between(50, 100_000)
        & F.col("mean_word_len").between(3, 10)
        & (F.col("symbol_ratio") <= 0.1)
        & (F.col("alpha_word_frac") >= 0.8)
        & (F.col("stop_hits") >= 2)
    )
    return out.withColumn("gopher_pass", passed)


def boilerplate_removal(
    docs: DataFrame,
    min_docs: int,
    text_col: str = "text",
    key_col: str = "doc_id",
    sep: str = "\n",
) -> DataFrame:
    """Cross-document boilerplate unit removal (the CCNet/RefinedWeb
    line-dedup step): split each document on ``sep``, count the DISTINCT
    documents containing each exact unit, drop units appearing in >=
    ``min_docs`` documents, and reconstruct the text in original order.

    Columns: key, n_units, n_removed, cleaned_text.

    Scale shape: posexplode (fan-out = units/doc), one shuffle on the
    unit value for the distinct-doc count, a shuffle anti-join back, and
    one shuffle on the key for ordered reconstruction — the standard
    boilerplate-removal topology. The unit-frequency side is naturally
    heavy-tailed; only (unit, count) pairs shuffle, never whole
    documents, and the final aggregate carries (pos, unit) structs so
    reconstruction needs no second sort. In production ``sep`` is a
    newline; tests use the single-line corpus with ``sep=' '`` (word
    granularity) to exercise the identical machinery.
    """
    units = docs.select(
        key_col, F.posexplode(F.split(F.col(text_col), sep)).alias("pos", "unit")
    )
    common = (
        units.groupBy("unit")
        .agg(F.countDistinct(key_col).alias("nd"))
        .filter(F.col("nd") >= min_docs)
        .select("unit")
    )
    kept = units.join(common, "unit", "left_anti")
    n_total = units.groupBy(key_col).agg(F.count("*").alias("n_units"))
    recon = kept.groupBy(key_col).agg(
        F.count("*").alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "unit"))),
                lambda s: s["unit"],
            ),
            sep,
        ).alias("cleaned_text"),
    )
    return (
        n_total.join(recon, key_col, "left")
        .select(
            key_col,
            "n_units",
            (F.col("n_units") - F.coalesce(F.col("n_kept"), F.lit(0))).alias("n_removed"),
            F.coalesce(F.col("cleaned_text"), F.lit("")).alias("cleaned_text"),
        )
    )


def exact_substring_dedup(
    docs: DataFrame,
    k: int = 8,
    min_count: int = 2,
    text_col: str = "text",
    key_col: str = "doc_id",
) -> DataFrame:
    """ExactSubstr deduplication (Lee et al. 2022, arXiv:2107.06499 §4.1):
    remove every word position covered by a k-token gram that occurs >=
    ``min_count`` times in the corpus (within- OR cross-document — any
    repeat). Beyond-reference north-star operator; the reference gateway
    has no corpus ops (it delegates SQL verbatim, src/core/duckdb.rs:87).

    Columns: key, n_words, n_removed, cleaned_text.

    The paper builds a corpus suffix array; the Spark-native shape is a
    gram-digest shuffle — same duplicate set for fixed k, no O(corpus)
    single-node state:

    - gram digests are built ARRAY-SIDE (one ``transform`` over the token
      array per doc — scan-fused, no word-level explode for construction),
    - only (start, digest) pairs shuffle for the occurrence count
      (digests shuffle, not bodies — map-side partial aggregation),
    - duplicated-gram starts join back per doc (digest-keyed shuffle
      join; the duplicated set is corpus-sized at worst, never collected
      or broadcast),
    - duplicated-gram start intervals [s, s+k) MERGE per doc with the
      running-max-end island trick (the sessionization shape: a window
      ordered by start, same hash key as the per-doc groupBy so no
      extra exchange), and reconstruction slices the GAPS between
      merged intervals — O(words + intervals) per document. (Round 11:
      the previous per-position filter re-scanned every duplicated
      start for every word, O(words x dup-starts) — quadratic on
      pathological all-duplicate documents; r10 verdict #8.)

    md5 is the digest so the DuckDB oracle reproduces the duplicate set
    bit-for-bit (``dedup_exact_substring``); at 100 TB swap in xxhash64
    (8-byte shuffle keys; ~1e-9 collision odds at 10^10 grams make a
    false merge a single spurious removal, not a correctness cliff).
    Unlike the paper's remove-all-but-one this removes EVERY covered
    occurrence (deterministic without a global canonical-copy order);
    chain after :func:`boilerplate_removal`, which handles the
    keep-one-line case at unit granularity.
    """
    toks = F.split(F.col(text_col), " ")
    base = docs.select(F.col(key_col), toks.alias("w"))
    n = F.size(F.col("w"))
    gram = F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(0), n - k),
            lambda i: F.struct(
                i.alias("start"),
                F.md5(F.array_join(F.slice(F.col("w"), i + 1, k), "\x1f")).alias("gh"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<start:int,gh:string>>"))
    g = base.select(key_col, F.explode(gram).alias("sg")).select(
        key_col, F.col("sg.start").alias("start"), F.col("sg.gh").alias("gh")
    )
    dup = (
        g.groupBy("gh")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") >= min_count)
        .select("gh")
    )
    # Merge covered intervals [start, start+k) per doc: an interval
    # starts a new island iff start > max(prev start) + k (starts are
    # sorted in the window, so the running max end IS last_start + k).
    # HashPartitioning(key) from the window satisfies both downstream
    # groupBys — one exchange total for this stretch.
    from pyspark.sql import Window

    w_prev = (
        Window.partitionBy(key_col)
        .orderBy("start")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy(key_col)
        .orderBy("start")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    islands = (
        g.join(dup, "gh")
        .select(key_col, "start")
        .withColumn("prev_end", F.max(F.col("start") + F.lit(k)).over(w_prev))
        .withColumn(
            "island",
            F.sum(
                F.when(
                    F.col("prev_end").isNull()
                    | (F.col("start") > F.col("prev_end")),
                    1,
                ).otherwise(0)
            ).over(w_run),
        )
    )
    ds = (
        islands.groupBy(key_col, "island")
        .agg(F.min("start").alias("lo"), (F.max("start") + F.lit(k)).alias("hi"))
        .groupBy(key_col)
        .agg(F.array_sort(F.collect_list(F.struct("lo", "hi"))).alias("ivs"))
    )
    r = base.join(ds, key_col, "left").withColumn(
        "ivs",
        F.coalesce(F.col("ivs"), F.array().cast("array<struct<lo:int,hi:int>>")),
    )
    # Reconstruct from the GAPS between merged intervals: sentinel
    # bounds (hi=0 front, lo=n back) turn the kept text into
    # zip_with(bounds, bounds[1:]) slices — each kept word copied once.
    n_w = F.size(F.col("w"))
    bounds = F.concat(
        F.array(F.struct(F.lit(-1).alias("lo"), F.lit(0).alias("hi"))),
        F.col("ivs"),
        F.array(F.struct(n_w.alias("lo"), n_w.alias("hi"))),
    )
    kept = F.flatten(
        F.zip_with(
            F.slice(bounds, 1, F.size(bounds) - 1),
            F.slice(bounds, 2, F.size(bounds) - 1),
            lambda a, b: F.slice(
                F.col("w"), a["hi"] + 1, F.greatest(b["lo"] - a["hi"], F.lit(0))
            ),
        )
    )
    return r.select(
        F.col(key_col),
        F.size("w").alias("n_words"),
        (F.size("w") - F.size(kept)).alias("n_removed"),
        F.array_join(kept, " ").alias("cleaned_text"),
    )


def c4_quality_stats(
    docs: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    sep: str = "\n",
) -> DataFrame:
    """C4 line + page filtering signals (Raffel et al. 2020 §2.2 —
    public rules), as pure JVM expression trees over one line split
    (scan-fused, no shuffle, no UDF — the same 100 TB shape as
    gopher_quality_stats):

    line rules (kept lines):
    - ends in a terminal punctuation mark (. ! ? ") after rtrim
    - at least 5 whitespace-separated words
    - does not contain 'javascript' (case-insensitive)

    page rules (c4_pass):
    - at least 3 kept lines (C4's >=3-sentences proxy at line level)
    - no 'lorem ipsum' (case-insensitive), no '{' anywhere

    Columns: key, n_lines, n_kept_lines, has_lorem, has_brace,
    cleaned_text (kept lines re-joined on `sep`), c4_pass. The
    dirty-word blocklist step of the original is intentionally
    omitted (no list shipped); callers chain their own blocklist
    filter on cleaned_text.
    """
    import re as _re

    lines = F.split(F.col(text_col), _re.escape(sep))

    def _keep(line: Column) -> Column:
        return (
            F.rtrim(line).rlike('[.!?"]$')
            & (F.size(F.split(F.trim(line), " +")) >= 5)
            & ~F.lower(line).contains("javascript")
        )

    kept = F.filter(lines, _keep)
    out = docs.select(
        key_col,
        F.size(lines).alias("n_lines"),
        F.size(kept).alias("n_kept_lines"),
        F.lower(F.col(text_col)).contains("lorem ipsum").alias("has_lorem"),
        F.col(text_col).contains("{").alias("has_brace"),
        F.array_join(kept, sep).alias("cleaned_text"),
    )
    passed = (
        (F.col("n_kept_lines") >= 3)
        & ~F.col("has_lorem")
        & ~F.col("has_brace")
    )
    return out.withColumn("c4_pass", passed)


def quality_classifier(
    docs: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    n_buckets: int = 1048576,
) -> DataFrame:
    """Hashed-feature linear quality classifier — the fastText-filter
    shape every modern data pipeline runs (DCLM/phi-style quality
    filtering: hash word features into a fixed table, score with a
    linear model, threshold).

    The PLUMBING is the real thing and is what this operator
    demonstrates at scale: per-token feature hashing (31-polynomial
    rolling hash over codepoints, modulo ``n_buckets``), a weight
    lookup per bucket, mean-pooled linear score, threshold label —
    all pure JVM expression trees fused into the scan (no UDF, no
    shuffle, no model broadcast needed at this size; a real weight
    table would broadcast-join on the bucket id).

    The WEIGHTS are a deterministic stand-in (no pretrained model ships
    in this container): w(b) = ((b * 2654435761) % 1000003) / 1000003
    * 2 - 1 — a Knuth-hash pseudo-random in [-1, 1), integer-exact on
    any engine, which is what makes the operator oracle-checkable
    end-to-end on DuckDB. Swap in a broadcast weight table trained
    offline for production.

    Returns key, n_tokens, quality_score (round 4), quality_label.
    """
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != ""
    )
    bucket = lambda t: F.aggregate(  # noqa: E731
        F.split(t, ""),
        F.lit(0).cast("bigint"),
        lambda a, c: (a * 31 + F.ascii(c)) % n_buckets,
    )
    weight = lambda b: (  # noqa: E731
        ((b * 2654435761) % 1000003) / 1000003.0 * 2 - 1
    )
    total = F.aggregate(
        toks, F.lit(0.0), lambda s, t: s + weight(bucket(t))
    )
    n = F.size(toks)
    # + 0 normalizes IEEE -0.0 (a tiny negative sum rounding to zero) —
    # the repo rule since the r6 emb_dim_variance sf0.1 catch: any
    # round() of a possibly-tiny-negative aggregate needs it, or the
    # value hasher distinguishes the -0.0/0.0 reprs across engines
    score = F.round(total / F.greatest(n, F.lit(1)), 4) + F.lit(0.0)
    return docs.select(
        key_col,
        n.cast("bigint").alias("n_tokens"),
        score.alias("quality_score"),
        (score > 0).alias("quality_label"),
    )


def intra_doc_dedup(
    docs: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    sep: str = "\n",
) -> DataFrame:
    """WITHIN-document duplicate-unit removal (round 7): drop repeated
    lines/units inside each document, keeping the FIRST occurrence in
    order — the page-local companion to the cross-document
    :func:`boilerplate_removal` (navigation chrome and footer text
    typically repeat both within a page and across a site; training
    pipelines run both).

    Columns: key, n_units, n_dupes, deduped_text.

    Scale shape: a PURE per-row expression tree — split, indexed
    filter (keep unit i iff its first occurrence index is i), rejoin.
    NO shuffle, NO explode; fuses into the scan (the e≈0 flat class of
    the Gopher/C4 stats). The in-row cost is O(units² ) via
    array_position per element — bounded by page size, not corpus
    size. DuckDB oracle: the identical indexed list_filter (1-based in
    both engines' lambda index forms... Spark's filter index is
    0-based; the oracle compensates).
    """
    units = F.split(F.col(text_col), sep)
    kept = F.filter(
        units, lambda x, i: F.array_position(units, x) == i + F.lit(1)
    )
    return docs.select(
        key_col,
        F.size(units).cast("bigint").alias("n_units"),
        (F.size(units) - F.size(kept)).cast("bigint").alias("n_dupes"),
        F.array_join(kept, sep).alias("deduped_text"),
    )


def ngram_topk(
    docs: DataFrame,
    n: int = 2,
    k: int = 20,
    text_col: str = "text",
) -> DataFrame:
    """Corpus-wide top-k word n-grams (round 7): the vocabulary/phrase
    frequency table every corpus card and contamination audit starts
    from.

    Columns: gram, n_docs (distinct documents), n_total (occurrences),
    ordered by n_total desc, gram asc (deterministic ties), LIMIT k.

    Scale shape: per-row n-gram generation as an expression tree
    (transform over a sliced token array — no posexplode fan-out until
    after tokenization), then explode → ONE shuffle of (gram, doc_id)
    for the count(DISTINCT doc)/count(*) aggregate, then TakeOrdered k
    (no global sort). At 100 TB the gram space is heavy-tailed;
    partial map-side aggregation absorbs the head, and k rows return
    to the driver.
    """
    toks = F.split(F.col(text_col), " ")
    # guard: Spark's sequence(1, 0) generates DESCENDING [1, 0] — a
    # doc shorter than n must yield an empty gram list, not junk slices
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    exploded = docs.select(
        F.col("doc_id"), F.explode(grams).alias("gram")
    )
    return (
        exploded.groupBy("gram")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count("*").alias("n_total"),
        )
        .orderBy(F.col("n_total").desc(), F.col("gram"))
        .limit(k)
    )

def bpe_apply(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    key_col: str = "doc_id",
) -> DataFrame:
    """Apply a trained BPE merge table to every document and emit the
    full token-id sequence — the nightly 100 TB pipeline step (train
    once on the vocabulary, APPLY to the whole corpus each run).
    Columns: key, n_words, n_tokens, tokens array<long>.

    Token-id scheme (deterministic, corpus-pass-free): a single-char
    symbol's id is its Unicode codepoint; merge symbol ids are
    0x110000 + rank (codepoints end at 0x10FFFF, so the ranges never
    collide and a trained table is portable across corpora).

    Scale shape: the merge table broadcasts (tokenizer tables are
    KB-MB); the kernel is Arrow-batched mapInPandas with per-unique-
    word caching (natural text reuses words, so the merge loop runs
    once per distinct word per batch); the pass is narrow — zero
    shuffles, scan-fused, output partitioning inherits the scan.
    """
    import numpy as np
    import pandas as pd

    bc = docs.sparkSession.sparkContext.broadcast(list(merges))
    MERGE_BASE = 0x110000

    def encode(batches):
        merge_list = bc.value
        merge_id = {a + b: MERGE_BASE + r for r, (a, b) in enumerate(merge_list)}

        def sym_id(s: str) -> int:
            return merge_id[s] if len(s) > 1 else ord(s)

        def word_ids(w: str, cache: dict) -> list:
            hit = cache.get(w)
            if hit is not None:
                return hit
            syms = list(w)
            for a, b in merge_list:
                out: list[str] = []
                i = 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                syms = out
            ids = [sym_id(s) for s in syms]
            cache[w] = ids
            return ids

        for pdf in batches:
            cache: dict[str, list] = {}
            n_words, n_tok, toks = [], [], []
            for text in pdf[text_col]:
                words = [w for w in (text or "").split(" ") if w]
                ids: list[int] = []
                for w in words:
                    ids.extend(word_ids(w, cache))
                n_words.append(len(words))
                n_tok.append(len(ids))
                toks.append(np.array(ids, dtype="int64"))
            yield pd.DataFrame(
                {
                    key_col: pdf[key_col],
                    "n_words": np.array(n_words, dtype="int64"),
                    "n_tokens": np.array(n_tok, dtype="int64"),
                    "tokens": toks,
                }
            )

    return docs.select(key_col, text_col).mapInPandas(
        encode,
        f"{key_col} long, n_words long, n_tokens long, tokens array<long>",
    )


def heavy_hitters_mg(
    docs: DataFrame,
    k: int = 200,
    text_col: str = "text",
) -> DataFrame:
    """Frequent tokens via per-partition Misra-Gries summaries + one
    exact verification pass — the 100 TB alternative to a full-token
    groupBy. Beyond-reference operator (training-data pipelines use
    frequent-token tables for tokenizer vocab seeding and boilerplate
    detection).

    Scale shape: pass 1 streams each partition once through a
    k-counter Misra-Gries fold (vectorized: pandas value_counts per
    Arrow batch, summary-merge — combine, subtract the (k+1)-th
    largest, drop ≤0 — the Agarwal et al. 'mergeable summaries'
    construction, so any token with global frequency > N/(k+1) is
    GUARANTEED to survive some partition summary); pass 2 broadcasts
    the ≤ P·k candidate tokens and exact-counts only those (the
    shuffle carries ≤ P·k distinct keys instead of the full vocabulary;
    the heavy tail never shuffles). Result: EXACT counts for every
    token above total/k — candidates ⊇ truth makes the output
    deterministic, not approximate. Columns: tok, cnt.
    """
    toks = (
        docs.select(
            F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("tok")
        )
        .filter(F.col("tok") != "")
    )

    def mg_summaries(batches):
        import pandas as pd

        summary: pd.Series | None = None
        for pdf in batches:
            counts = pdf["tok"].value_counts()
            summary = counts if summary is None else summary.add(counts, fill_value=0)
            if len(summary) > k:
                cut = summary.nlargest(k + 1).iloc[-1]
                summary = (summary - cut)[lambda s: s > 0]
        if summary is not None and len(summary):
            yield pd.DataFrame({"tok": summary.index})

    candidates = toks.mapInPandas(mg_summaries, "tok string").distinct()
    total = toks.groupBy().agg(F.count("*").alias("n"))
    return (
        toks.join(F.broadcast(candidates), "tok")
        .groupBy("tok")
        .agg(F.count("*").alias("cnt"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("cnt") > F.col("n") / F.lit(float(k)))
        .select("tok", "cnt")
        .orderBy(F.desc("cnt"), "tok")
    )


def kn_bigram_score(
    docs: DataFrame,
    ref_filter: Column,
    key_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 2,
    discount: float = 0.75,
) -> DataFrame:
    """Interpolated Kneser-Ney word-bigram LM: train on a reference
    subset, score every document. The step up from lm_perplexity's
    char-bigram MLE: word-level, a real smoothing estimator (absolute
    discounting + continuation-probability backoff — the KenLM/SRILM
    formulation at order 2), closed-vocabulary OOV handling.

        P(w2|w1) = (max(c(w1w2) - D, 0) + D·N1+(w1·)·Pcont(w2)) / c(w1·)
        Pcont(w2) = (N1+(·w2) + 0.5) / (|bigrams| + 0.5·(V + 1))
        (w1 unseen → P = Pcont(w2); the +0.5/+0.5(V+1) add-half keeps
        Pcont > 0 for an '<unk>' that never occurs in training)

    Scale shape (100 TB): training is two groupBy passes over reference
    tokens (vocabulary, then bigram counts — partial aggregation
    collapses each partition map-side); the left-context totals
    c(w1·)/N1+(w1·) are ONE more aggregate of the bigram table, not the
    corpus. Scoring deliberately does NOT broadcast a model dict: a
    web-scale vocabulary is GBs, so score-side bigrams JOIN the count
    tables (AQE picks broadcast when the model is small, shuffle when
    it isn't) and re-aggregate per document — every operator stays
    JVM-side, no Python in the loop. Columns: key, n_bigrams,
    avg_logp (round 6, natural log), all reference-set rows scored too.
    """
    toks_expr = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != ""
    )

    def doc_bigrams(df: DataFrame) -> DataFrame:
        w = toks_expr
        pairs = F.zip_with(
            F.slice(w, 1, F.greatest(F.size(w) - 1, F.lit(0))),
            F.slice(w, 2, F.greatest(F.size(w) - 1, F.lit(0))),
            lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
        )
        return df.select(
            F.col(key_col), F.explode(pairs).alias("bg")
        ).select(key_col, F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))

    ref = docs.filter(ref_filter)
    vocab = (
        ref.select(F.explode(toks_expr).alias("w"))
        .groupBy("w")
        .count()
        .filter(F.col("count") >= min_count)
        .select("w")
    )

    def map_unk(bg: DataFrame) -> DataFrame:
        v1 = vocab.select(F.col("w").alias("w1"), F.lit(1).alias("w1_v"))
        v2 = vocab.select(F.col("w").alias("w2"), F.lit(1).alias("w2_v"))
        return (
            bg.join(v1, "w1", "left")
            .join(v2, "w2", "left")
            .select(
                key_col,
                F.when(F.col("w1_v").isNotNull(), F.col("w1"))
                .otherwise(F.lit("<unk>")).alias("w1"),
                F.when(F.col("w2_v").isNotNull(), F.col("w2"))
                .otherwise(F.lit("<unk>")).alias("w2"),
            )
        )

    train_bg = map_unk(doc_bigrams(ref)).groupBy("w1", "w2").agg(
        F.count("*").alias("cb")
    )
    left = train_bg.groupBy("w1").agg(
        F.sum("cb").alias("cw1"), F.count("*").alias("n1r")
    )
    right = train_bg.groupBy("w2").agg(F.count("*").alias("n1l"))
    totals = train_bg.groupBy().agg(F.count("*").alias("nb")).crossJoin(
        vocab.groupBy().agg((F.count("*") + 1).alias("v"))
    )

    score_bg = map_unk(doc_bigrams(docs))
    d = F.lit(float(discount))
    joined = (
        score_bg.join(train_bg, ["w1", "w2"], "left")
        .join(left, "w1", "left")
        .join(right, "w2", "left")
        .crossJoin(F.broadcast(totals))
    )
    pcont = (F.coalesce(F.col("n1l"), F.lit(0)) + F.lit(0.5)) / (
        F.col("nb") + F.lit(0.5) * F.col("v")
    )
    p = F.when(
        F.col("cw1").isNotNull(),
        (
            F.greatest(F.coalesce(F.col("cb"), F.lit(0)) - d, F.lit(0.0))
            + d * F.col("n1r") * pcont
        )
        / F.col("cw1"),
    ).otherwise(pcont)
    return (
        joined.select(F.col(key_col), F.log(p).alias("lp"))
        .groupBy(key_col)
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(F.avg("lp"), 6).alias("avg_logp"),
        )
        .orderBy(key_col)
    )
