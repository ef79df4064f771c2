"""Oracle-checked query corpus.

Each module registers queries into :mod:`registry`. Importing this package
loads them all; ``__spark_entry__`` then exports the registry to the driver.
"""

from __future__ import annotations

from .registry import REGISTRY, Query, register, load_tables  # noqa: F401


def load_all() -> None:
    """Import every query module so its ``@register`` calls run.

    Import order controls registry order, which external harnesses may use
    to window their correctness sampling.  Rounds 1-2 verified the 50
    relational/TPC-H entries; they now load LAST so the llm / events /
    streaming / functions / dialect entries (unverified as of round 2)
    occupy the front of the registry and get hard-signal verification.
    Rotate again next round if any entries remain past the window.
    """
    from . import llm_q  # noqa: F401
    from . import events_q  # noqa: F401
    from . import streaming_q  # noqa: F401
    from . import functions_q  # noqa: F401
    from . import dialect_q  # noqa: F401
    from . import relational  # noqa: F401
    from . import tpch_q  # noqa: F401

    # These five dialect entries were already driver-verified in rounds 1-2
    # (they sat at positions 45-49).  Demote them behind the never-verified
    # dialect batteries so the front of the registry is all-fresh.
    for _name in (
        "qualify_top_orders_per_cust",
        "lateral_top_order_per_customer",
        "grouping_sets_revenue",
        "recursive_cte_monthly_orders",
        "using_join_nation_region",
    ):
        if _name in REGISTRY:
            REGISTRY[_name] = REGISTRY.pop(_name)
