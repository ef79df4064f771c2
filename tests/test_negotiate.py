"""Content-negotiation table test — 1:1 port of the reference's
get_first_compatible_format cases (src/web/routers.rs:207-286)."""

from __future__ import annotations

import pytest

from uquery_rs_spark.web.negotiate import first_compatible_format


@pytest.mark.parametrize(
    "accept,expected_fmt",
    [
        ("application/json", "json"),
        ("*/*", "json"),
        ("text/csv", "csv"),
        ("application/vnd.apache.arrow.stream", "arrow"),
        ("application/jsonlines", "jsonl"),
        ("application/jsonl", "jsonl"),
        # first supported wins across a list
        ("text/html, text/csv", "csv"),
        ("text/csv, application/json", "csv"),
        ("application/json, text/csv", "json"),
        # unsupported-only → None (406 upstream)
        ("text/html", None),
        ("image/png, text/html", None),
        # q-params stripped
        ("text/csv;q=0.8, application/json", "csv"),
        # whitespace tolerated
        ("  application/jsonl  ", "jsonl"),
    ],
)
def test_negotiation_table(accept, expected_fmt):
    got = first_compatible_format(accept)
    assert (got[0] if got else None) == expected_fmt


def test_missing_accept_defaults_to_json():
    assert first_compatible_format(None)[0] == "json"
    assert first_compatible_format("")[0] == "json"
