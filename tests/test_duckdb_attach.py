"""--db-file attach: tables, views, macro tables, scalar macros from a
DuckDB database file (mirrors reference tests src/main.rs:231-259 `language`
table and :413-450 `test()` macro table)."""

from __future__ import annotations

import pytest

from uquery_rs_spark.rewrite import SqlRewriter

duckdb = pytest.importorskip("duckdb")


@pytest.fixture(scope="module")
def db_file(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("attach") / "test.db")
    con = duckdb.connect(path)
    con.execute(
        "CREATE TABLE language (id BIGINT, name VARCHAR, description VARCHAR)"
    )
    con.execute(
        "INSERT INTO language VALUES (1, 'Rust', 'systems'), (2, 'Python', 'glue'), "
        "(3, 'SQL', 'relational')"
    )
    con.execute("CREATE VIEW lang_names AS SELECT name FROM language")
    con.execute("CREATE MACRO double_it(x) AS x * 2")
    con.execute("CREATE MACRO test() AS TABLE SELECT id, name FROM language")
    con.execute(
        "CREATE MACRO top_langs(lim) AS TABLE "
        "SELECT name FROM language ORDER BY id DESC LIMIT lim"
    )
    con.execute(
        "CREATE MACRO lang_between(lo, hi) AS TABLE "
        "SELECT id, name FROM language WHERE id BETWEEN lo AND hi"
    )
    con.execute("CREATE TABLE shifts (id INT, start_t TIME)")
    con.execute(
        "INSERT INTO shifts VALUES (1, TIME '09:00:00'), "
        "(2, TIME '17:30:00.5')"
    )
    con.close()
    return path


@pytest.fixture
def rw(spark, db_file):
    rw = SqlRewriter(spark)
    rw.attach_db_file(db_file)
    return rw


def test_attached_table_query(spark, rw):
    # mirrors reference src/main.rs:231-259 (select from attached table)
    rows = spark.sql(rw.rewrite("SELECT name FROM language ORDER BY id")).collect()
    assert [r.name for r in rows] == ["Rust", "Python", "SQL"]


def test_attached_view(spark, rw):
    assert spark.sql(rw.rewrite("SELECT count(*) AS n FROM lang_names")).collect()[0].n == 3


def test_macro_table_call(spark, rw):
    # mirrors reference src/main.rs:413-450 (SELECT * FROM test())
    rows = spark.sql(rw.rewrite("SELECT * FROM test() ORDER BY id")).collect()
    assert [(r.id, r.name) for r in rows] == [(1, "Rust"), (2, "Python"), (3, "SQL")]


def test_scalar_macro_expansion(spark, rw):
    assert spark.sql(rw.rewrite("SELECT double_it(21) AS v")).collect()[0].v == 42


def test_scalar_macro_nested(spark, rw):
    assert spark.sql(rw.rewrite("SELECT double_it(double_it(10)) AS v")).collect()[0].v == 40


def test_macro_wrong_arity(rw):
    from uquery_rs_spark.errors import UQueryError

    with pytest.raises(UQueryError):
        rw.rewrite("SELECT double_it(1, 2) AS v")


def test_parameterized_table_macro(spark, rw):
    rows = spark.sql(rw.rewrite("SELECT * FROM top_langs(2)")).collect()
    assert [r.name for r in rows] == ["SQL", "Python"]


def test_parameterized_table_macro_two_args(spark, rw):
    rows = spark.sql(
        rw.rewrite("SELECT * FROM lang_between(2, 3) ORDER BY id")
    ).collect()
    assert [(r.id, r.name) for r in rows] == [(2, "Python"), (3, "SQL")]


def test_parameterized_table_macro_with_alias_and_scalar_nesting(spark, rw):
    rows = spark.sql(
        rw.rewrite(
            "SELECT t.id, double_it(t.id) AS d FROM lang_between(1, double_it(1)) t ORDER BY t.id"
        )
    ).collect()
    assert [(r.id, r.d) for r in rows] == [(1, 2), (2, 4)]


def test_in_session_parameterized_table_macro(spark, rw):
    """Round 8: CREATE MACRO name(p) AS TABLE — previously raised; now
    registers the same inline-at-bind expansion as the --db-file path
    (reference custom-database.md:8-46, main.rs:413-450)."""
    rw.rewrite(
        "CREATE MACRO uq_r8_firstn(n) AS TABLE "
        "SELECT * FROM (VALUES (1,'a'),(2,'b'),(3,'c')) v(id, s) "
        "WHERE id <= n"
    )
    rows = spark.sql(
        rw.rewrite("SELECT * FROM uq_r8_firstn(2) ORDER BY id")
    ).collect()
    assert [(r.id, r.s) for r in rows] == [(1, "a"), (2, "b")]
    # nested in a join, with an alias
    rows = spark.sql(
        rw.rewrite(
            "SELECT a.id, b.s FROM uq_r8_firstn(3) a "
            "JOIN uq_r8_firstn(1) b ON b.id = a.id"
        )
    ).collect()
    assert [(r.id, r.s) for r in rows] == [(1, "a")]
    rw.rewrite("DROP MACRO uq_r8_firstn")
    import pytest as _pytest
    from uquery_rs_spark.errors import UQueryError

    with _pytest.raises(UQueryError):
        rw.rewrite("DROP MACRO uq_r8_firstn")


def test_attached_time_column(spark, rw):
    """Round 8: TIME-typed columns survive the Arrow bridge and behave
    natively under the TIME graduation (comparison, canonical string)."""
    import datetime

    rows = spark.sql(
        rw.rewrite(
            "SELECT id, start_t, CAST(start_t AS VARCHAR) AS s, "
            "(start_t > TIME '12:00:00') AS pm FROM shifts ORDER BY id"
        )
    ).collect()
    assert [(r.id, r.start_t, r.s, r.pm) for r in rows] == [
        (1, datetime.time(9, 0), "09:00:00", False),
        (2, datetime.time(17, 30, 0, 500000), "17:30:00.5", True),
    ]


def test_attached_macro_body_gets_dialect_translation(spark, rw):
    """Round 11: macro expansion moved to the pipeline HEAD, so a macro
    BODY written in DuckDB dialect (as .db-attached macros are) now
    flows through the full translation pipeline. Under the old tail
    position these bodies were inserted after nearly every pass —
    list_unique() in a body reached Spark untranslated (loud), and a
    doubled-quote literal reached Spark in the wrong escape space
    (silent). DuckDB-verified expectations."""
    rw.add_scalar_macro("uq_r11_nuniq", ["l"], "list_unique(l)")
    got = spark.sql(rw.rewrite("SELECT uq_r11_nuniq([1, 1, NULL, 3]) AS v")).collect()
    assert got[0].v == 3  # 1.5.2 semantics: NULL counts once
    rw.add_scalar_macro("uq_r11_tag", ["s"], "s || ' it''s'")
    got = spark.sql(rw.rewrite("SELECT uq_r11_tag('x') AS v")).collect()
    assert got[0].v == "x it's"
    rw.add_scalar_macro("uq_r11_div", ["a", "b"], "a // b")
    got = spark.sql(rw.rewrite("SELECT uq_r11_div(7, 2) AS v")).collect()
    assert got[0].v == 3
    # macro calling another macro still expands to fixpoint
    rw.add_scalar_macro("uq_r11_outer", ["x"], "uq_r11_div(x, 2) + 1")
    got = spark.sql(rw.rewrite("SELECT uq_r11_outer(10) AS v")).collect()
    assert got[0].v == 6
