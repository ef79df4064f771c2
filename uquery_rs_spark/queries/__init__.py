"""Oracle-checked query corpus.

Each module registers queries into :mod:`registry`. Importing this package
loads them all; ``__spark_entry__`` then exports the registry to the driver.
"""

from __future__ import annotations

from .registry import REGISTRY, Query, register, load_tables  # noqa: F401


def load_all() -> None:
    """Import every query module so its ``@register`` calls run."""
    from . import relational  # noqa: F401
    from . import tpch_q  # noqa: F401
    from . import dialect_q  # noqa: F401
    from . import functions_q  # noqa: F401
    from . import events_q  # noqa: F401
    from . import llm_q  # noqa: F401
    from . import streaming_q  # noqa: F401
