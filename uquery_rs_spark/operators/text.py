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
    p(g) = (c_g + 1) / (N + V); unseen bigrams get c_g = 0 via the left
    join. Pure built-in expressions end-to-end.

    Scale shape (100 TB): the LM table is at most |alphabet|² rows —
    KB-sized — so training is a map-side partial count + tiny shuffle,
    and scoring is a BROADCAST join. The only corpus-sized shuffle is the
    per-doc avg, which partial-aggregates to one row per (doc, partition)
    before moving.
    """
    base = docs.filter(F.length(text_col) >= 2)
    idx = F.sequence(F.lit(1), F.length(text_col) - 1)
    bigrams = F.transform(idx, lambda i: F.col(text_col).substr(i, F.lit(2)))
    bg = base.select("doc_id", F.explode(bigrams).alias("g"))

    ref = base.filter(ref_filter) if ref_filter is not None else base
    ref_bg = ref.select(F.explode(bigrams).alias("g"))
    lm = ref_bg.groupBy("g").agg(F.count("*").alias("c"))
    tot = lm.agg(F.sum("c").alias("n"), F.count("*").alias("v"))

    logp = F.log((F.coalesce(F.col("c"), F.lit(0)) + F.lit(1.0)) / (F.col("n") + F.col("v")))
    return (
        bg.join(F.broadcast(lm), "g", "left")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.round(-F.avg(logp), 4).alias("cross_entropy"),
            F.round(F.exp(-F.avg(logp)), 2).alias("ppl"),
        )
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
    shuffle, so at 100 TB it streams at scan speed. The per-doc cost is
    O(|distinct bigrams| * |bigrams|), bounded by document length — the
    scale axis is docs, not doc size.
    """
    from ..functions.expr import bind

    def stats(toks: Column) -> Column:
        idx = F.sequence(F.lit(1), F.size(toks) - 1)
        gram = lambda i: F.concat_ws(" ", F.element_at(toks, i), F.element_at(toks, i + 1))  # noqa: E731
        grams = F.when(F.size(toks) >= 2, F.transform(idx, gram)).otherwise(
            F.array().cast("array<string>")
        )
        return bind(
            grams,
            lambda g: F.struct(
                F.array_max(
                    F.transform(
                        F.array_distinct(g),
                        lambda d: F.size(F.filter(g, lambda x: x == d)),
                    )
                ).alias("top_c"),
                F.size(g).alias("total"),
            ),
        )

    return (
        with_tokens(docs, text_col)
        .select("doc_id", stats(F.col(TOKS)).alias("s"))
        .filter(F.col("s.top_c") / F.col("s.total") > min_frac)
        .select(
            "doc_id",
            F.round(F.col("s.top_c") / F.col("s.total"), 4).alias("top_bigram_frac"),
        )
    )
