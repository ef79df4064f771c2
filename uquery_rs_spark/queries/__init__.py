"""Oracle-checked query corpus.

Each module registers queries into :mod:`registry`. Importing this package
loads them all; ``__spark_entry__`` then exports the registry to the driver.
"""

from __future__ import annotations

from .registry import REGISTRY, Query, register, load_tables  # noqa: F401


# Round-8 verification window (harnesses sample REGISTRY[:50]).
# Composition per the r7 verdict's rotation rule: the entries ADDED
# this round first (battery29/30 — list()/array_agg NULL parity —
# and battery31/32 — EXCLUDE GROUP/TIES, nested-agg FILTER/DISTINCT; new
# entries go in the CURRENT window, round-4 lesson; share cap 15),
# then ALL 15 entries whose freshest driver signal is round 3
# (streaming_* operator-API, multimodal_*, events-derived windows/
# sessionization/cohort/funnel, corpus_shuffle_order,
# corpus_stratified_mix — the exact list from the r7 verdict, which
# counted 13 but the per-round JSONs show 15), then 28 of the 41
# round-4-signal entries (alphabetical). The 13 r4 entries deferred to
# round 9: regex_sort_escape_battery, salted_join_order_counts,
# sample_rows_count,
# select_exclude_group_by_all, star_replace_strftime,
# streaming_dedup, streaming_stateful_counter,
# struct_map_access, text_lm_perplexity, time_range_window_events,
# union_by_name_priorities, unpivot_part_measures,
# unpivot_statement_measures. After round 8 no entry's freshest
# signal is older than r4. Exactly 50 names.
_ROUND8_WINDOW = (
    "dialect_gap_battery29",
    "dialect_gap_battery30",
    "dialect_gap_battery31",
    "dialect_gap_battery32",
    "corpus_leakage_safe_split",
    "dialect_gap_battery33",
    "multimodal_gif_decode",
    "cohort_retention_daily",
    "corpus_shuffle_order",
    "corpus_stratified_mix",
    "daily_user_activity",
    "funnel_view_click_purchase",
    "multimodal_audio_stats",
    "multimodal_decode_stats",
    "multimodal_frame_sample",
    "multimodal_jpeg_decode",
    "multimodal_metadata",
    "sessionization_30min",
    "sliding_window_events",
    "streaming_sliding_window",
    "streaming_tumbling_window",
    "tumbling_window_events",
    "ann_cosine_topk_int8",
    "ann_ivf_persistent",
    "approx_percentile_prices",
    "columns_regex_battery",
    "corpus_quality_sample",
    "datetime_edge_battery",
    "dedup_semantic",
    "dedup_simhash",
    "distinct_on_latest_order",
    "escape_literal_battery",
    "events_anomaly_zscore",
    "except_all_priorities",
    "from_first_syntax",
    "ignore_nulls_window_battery",
    "int_div_price_buckets",
    "intersect_all_priorities",
    "json_extract_props",
    "len_slice_map_edge_battery",
    "macros_battery",
    "map_literal_ordered_agg",
    "multimodal_features",
    "multimodal_jpeg_progressive",
    "multimodal_pixel_dedup",
    "multimodal_resize",
    "percentile_battery",
    "planned_join_segment_revenue",
    "positional_join_rank_zip",
    "q10_returned_items",
)


def load_all() -> None:
    """Import every query module so its ``@register`` calls run.

    Import order controls registry order, which external harnesses may use
    to window their correctness sampling.  After importing, the registry is
    reordered so :data:`_ROUND8_WINDOW` occupies the front — see that
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

    ordered = [n for n in _ROUND8_WINDOW if n in REGISTRY]
    ordered += [n for n in REGISTRY if n not in _ROUND8_WINDOW]
    snapshot = dict(REGISTRY)
    REGISTRY.clear()
    for _name in ordered:
        REGISTRY[_name] = snapshot[_name]
