"""File/table source resolution (path-as-table, read_* table functions)."""

from .files import FORMATS, resolve_path  # noqa: F401
