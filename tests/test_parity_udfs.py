"""Differential tests for the batch-15 parity UDF kernels against DuckDB
in-process — the same translate-or-verify discipline as the dialect
sweep, at the Python-kernel level (no Spark session needed, so the
property sweep can afford hundreds of cases)."""

from __future__ import annotations

import math
import random

import duckdb
import pytest

from uquery_rs_spark.functions.parity_udfs import (
    _damerau,
    _gamma,
    _jaro,
    _jaro_winkler,
    _lgamma,
    _parse_dirname,
    _parse_dirpath,
    _path_components,
    _strip_accents,
)


@pytest.fixture(scope="module")
def duck():
    return duckdb.connect()


def _d1(duck, expr):
    return duck.execute(f"SELECT {expr}").fetchone()[0]


ALPHABET = "abcdeé日✓ ß"


def test_string_distances_differential(duck):
    rng = random.Random(42)
    pairs = [("", ""), ("", "abc"), ("abc", "abc"), ("CA", "ABC"),
             ("MARTHA", "MARHTA"), ("DIXON", "DICKSONX"), ("café", "cafe"),
             ("ab", "ba"), ("a cat", "an act")]
    for _ in range(150):
        a = "".join(rng.choice(ALPHABET) for _ in range(rng.randrange(0, 9)))
        b = "".join(rng.choice(ALPHABET) for _ in range(rng.randrange(0, 9)))
        pairs.append((a, b))
    for a, b in pairs:
        ab, bb = a.encode(), b.encode()
        qa, qb = a.replace("'", "''"), b.replace("'", "''")
        assert _jaro(ab, bb) == pytest.approx(
            _d1(duck, f"jaro_similarity('{qa}','{qb}')"), abs=1e-12
        ), (a, b)
        assert _jaro_winkler(ab, bb) == pytest.approx(
            _d1(duck, f"jaro_winkler_similarity('{qa}','{qb}')"), abs=1e-12
        ), (a, b)
        assert _damerau(ab, bb) == _d1(
            duck, f"damerau_levenshtein('{qa}','{qb}')"
        ), (a, b)


def test_strip_accents_differential(duck):
    cases = ["mühleisen", "Ångström", "Ḝẞ½ǅ", "héllo wörld ñ", "日本語",
             "ﬁ", "", "plain", "çà-và", "Ёё", "ậẫặ"]
    for s in cases:
        assert _strip_accents(s) == _d1(duck, f"strip_accents('{s}')"), s


def test_gamma_differential(duck):
    for x in [5, 0.5, -0.5, 2.5, 10.0, 171.9, 172, -1.5, 100.5]:
        want = _d1(duck, f"gamma({x})")
        got = _gamma(float(x))
        if math.isnan(want):
            assert math.isnan(got), x
        else:
            assert got == pytest.approx(want, rel=1e-12), x
        wantl = _d1(duck, f"lgamma({x})")
        gotl = _lgamma(float(x))
        assert gotl == pytest.approx(wantl, rel=1e-12) or (
            math.isinf(wantl) and math.isinf(gotl)
        ), x
    # poles: negative integers — gamma nan, lgamma +inf (DuckDB-verified)
    assert math.isnan(_gamma(-1.0)) and math.isinf(_lgamma(-1.0))
    # zero errors on both engines
    with pytest.raises(ValueError):
        _gamma(0.0)
    with pytest.raises(ValueError):
        _lgamma(0.0)


def test_parse_path_family_differential(duck):
    cases = ["/a/b/c.txt", "a/b/c.txt", "c.txt", "", "/a", "a/", "/",
             "a//", "//a", "//a//b", "/a/b/", "a\\b\\c", "a\\b/c",
             "/c.txt", "dir/", "x/y/z.txt", "/r/s.bin"]
    for s in cases:
        # DuckDB standard literals are escape-free — backslashes go in raw
        assert _parse_dirname(s) == _d1(duck, f"parse_dirname('{s}')"), s
        assert _parse_dirpath(s) == _d1(duck, f"parse_dirpath('{s}')"), s
        assert _path_components(s) == _d1(duck, f"parse_path('{s}')"), s
