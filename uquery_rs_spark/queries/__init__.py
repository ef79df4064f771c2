"""Oracle-checked query corpus.

Each module registers queries into :mod:`registry`. Importing this package
loads them all; ``__spark_entry__`` then exports the registry to the driver.
"""

from __future__ import annotations

from .registry import REGISTRY, Query, register, load_tables  # noqa: F401


# Round-7 verification window (harnesses sample REGISTRY[:50]).
# Composition per the r6 verdict's rotation rule (new-entry share
# CAPPED at 15 so the rotation completes): the 4 entries ADDED this
# round (battery27 ÷0 parity, battery28 projected-IN 3VL, intra-doc
# dedup, ngram top-k — new entries go in the CURRENT window, round-4
# lesson), then ALL 20 entries whose
# freshest driver signal is round 2 (q2/q4/q7-q9/q16-q22, range join,
# rollup, scalar subquery, semi join, set ops, stats aggregates,
# union_all, values — the exact list from the r6 verdict), then 26 of
# the 41 round-3-signal entries (SQL-surface-exposed batteries, dedup,
# text, corpus, embeddings first). The 15 r3 entries NOT in this
# window (streaming_* operator-API, multimodal_*, events-derived
# cohort/funnel/daily/sliding/sessionization/tumbling,
# corpus_shuffle_order, corpus_stratified_mix) rotate in round 8 —
# after round 7 no entry's freshest signal is older than r3.
# Exactly 50 names.
_ROUND7_WINDOW = (
    # new this round (4 of a 15-slot cap)
    "dialect_gap_battery27",
    "dialect_gap_battery28",
    "text_intra_doc_dedup",
    "text_ngram_topk",
    # the 20 round-2-signal entries — all of them
    "q2_min_balance_supplier",
    "q4_order_priority",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_type_profit",
    "q16_supplier_count_by_part",
    "q17_small_quantity_revenue",
    "q18_large_volume_orders",
    "q19_discounted_revenue",
    "q20_potential_promotion",
    "q21_suppliers_kept_waiting",
    "q22_idle_rich_customers",
    "range_join_size_buckets",
    "rollup_order_status_priority",
    "scalar_subquery_above_avg_balance",
    "semi_join_active_customers",
    "set_ops_nation_membership",
    "stats_aggregates_prices",
    "union_all_price_tiers",
    "values_inline_table",
    # 28 round-3-signal entries
    "string_functions_battery",
    "array_functions",
    "datetime_functions",
    "math_functions",
    "regex_functions",
    "explode_unnest_series",
    "dedup_exact_stats",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_embedding_cosine",
    "dedup_embedding_lsh",
    "dedup_cluster_canonical",
    "dedup_incremental_delta",
    "decontaminate_benchmark_overlap",
    "ann_cosine_topk",
    "emb_label_cohesion",
    "emb_quantize_int8_error",
    "text_language_id",
    "text_quality_score",
    "text_token_stats",
    "text_fingerprint",
    "text_pii_scan",
    "text_repetition_stats",
    "corpus_filter_funnel",
    "corpus_hash_split",
    "corpus_length_buckets",
)


def load_all() -> None:
    """Import every query module so its ``@register`` calls run.

    Import order controls registry order, which external harnesses may use
    to window their correctness sampling.  After importing, the registry is
    reordered so :data:`_ROUND7_WINDOW` occupies the front — see that
    constant for the rationale.  Rotate the window each round so every
    entry eventually gets hard-signal verification.
    """
    from . import llm_q  # noqa: F401
    from . import events_q  # noqa: F401
    from . import streaming_q  # noqa: F401
    from . import functions_q  # noqa: F401
    from . import dialect_q  # noqa: F401
    from . import relational  # noqa: F401
    from . import tpch_q  # noqa: F401

    ordered = [n for n in _ROUND7_WINDOW if n in REGISTRY]
    ordered += [n for n in REGISTRY if n not in _ROUND7_WINDOW]
    snapshot = dict(REGISTRY)
    REGISTRY.clear()
    for _name in ordered:
        REGISTRY[_name] = snapshot[_name]
