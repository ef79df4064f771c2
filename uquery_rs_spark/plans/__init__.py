"""Plan inspection helpers (explain / pushdown / broadcast checks)."""

from .inspect import formatted_plan, has_broadcast_join, pushed_filters  # noqa: F401
