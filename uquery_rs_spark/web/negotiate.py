"""Accept-header content negotiation (reference src/web/routers.rs:191-205,
MIME constants src/web/mod.rs:1-6)."""

from __future__ import annotations

CONTENT_TYPE_CSV = "text/csv"
CONTENT_TYPE_JSON = "application/json"
CONTENT_TYPE_JSONLINES = "application/jsonlines"
CONTENT_TYPE_JSONL = "application/jsonl"
CONTENT_TYPE_ARROW = "application/vnd.apache.arrow.stream"
CONTENT_TYPE_ANY = "*/*"

_FORMATS = {
    CONTENT_TYPE_JSON: ("json", CONTENT_TYPE_JSON),
    CONTENT_TYPE_ANY: ("json", CONTENT_TYPE_JSON),
    CONTENT_TYPE_CSV: ("csv", CONTENT_TYPE_CSV),
    CONTENT_TYPE_ARROW: ("arrow", CONTENT_TYPE_ARROW),
    CONTENT_TYPE_JSONLINES: ("jsonl", CONTENT_TYPE_JSONLINES),
    CONTENT_TYPE_JSONL: ("jsonl", CONTENT_TYPE_JSONL),
}


def first_compatible_format(accept: str | None) -> tuple[str, str] | None:
    """First supported MIME in the Accept list wins; `*/*` → JSON; None if
    nothing matches. Missing Accept defaults to JSON (documented deviation:
    the reference 406s a missing header; most clients send `*/*`).

    Media-type parameters (`;q=...`) are stripped — a tolerance the
    reference doesn't have, accepted as a superset of its behavior.
    """
    if accept is None or not accept.strip():
        return _FORMATS[CONTENT_TYPE_ANY]
    for part in accept.lower().split(","):
        mime = part.split(";", 1)[0].strip()
        if mime in _FORMATS:
            return _FORMATS[mime]
    return None
