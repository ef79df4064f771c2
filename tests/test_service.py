"""HTTP service-contract tests — 1:1 port of the reference's integration
suite (src/main.rs:107-527 + tests/docker_smoke_test.sh), same SQL, same
golden bytes.
"""

from __future__ import annotations

import gzip
import io
import json
import threading
import urllib.error
import urllib.request

import pyarrow as pa
import pytest

from uquery_rs_spark.engine import Engine
from uquery_rs_spark.rewrite import SqlRewriter
from uquery_rs_spark.web.app import ServiceConfig, make_server

TEST_QUERY = (
    "SELECT * FROM (VALUES (1,'Rust','Safe, concurrent, performant systems language')) "
    "Language(Id,Name,Description)"
)
GOLDEN_JSON = (
    b'[{"Id":1,"Name":"Rust","Description":"Safe, concurrent, performant systems language"}]'
)
GOLDEN_CSV = b'Id,Name,Description\n1,Rust,"Safe, concurrent, performant systems language"\n'

FIXTURES = "/root/repo/tests/fixtures"


def _serve(spark, **cfg_kwargs):
    rewriter = SqlRewriter(spark, allowed_dirs=["/root/repo/tests"])
    engine = Engine(spark, pool_size=2, rewriter=rewriter)
    server = make_server("127.0.0.1", 0, ServiceConfig(engine, **cfg_kwargs))
    threading.Thread(target=server.serve_forever, daemon=True).start()
    return server, f"http://127.0.0.1:{server.server_address[1]}"


@pytest.fixture(scope="module")
def base_url(spark):
    server, url = _serve(spark, query_timeout_secs=30)
    yield url
    server.shutdown()


@pytest.fixture(scope="module")
def cors_url(spark):
    server, url = _serve(spark, query_timeout_secs=30, cors_enabled=True)
    yield url
    server.shutdown()


def post(url, body, content_type="application/json", accept="application/json", headers=None):
    data = json.dumps({"query": body}).encode() if content_type == "application/json" else body.encode()
    req = urllib.request.Request(url + "/", data=data, method="POST")
    req.add_header("Content-Type", content_type)
    req.add_header("Accept", accept)
    for k, v in (headers or {}).items():
        req.add_header(k, v)
    try:
        resp = urllib.request.urlopen(req, timeout=120)
        return resp.status, dict(resp.headers), resp.read()
    except urllib.error.HTTPError as e:
        return e.code, dict(e.headers), e.read()


# -- golden formats (main.rs:154-228) ---------------------------------------


def test_query_json(base_url):
    status, headers, body = post(base_url, TEST_QUERY)
    assert status == 200
    assert headers["Content-Type"] == "application/json"
    assert body == GOLDEN_JSON


def test_query_text_plain(base_url):
    status, _, body = post(base_url, TEST_QUERY, content_type="text/plain")
    assert status == 200 and body == GOLDEN_JSON


def test_query_csv(base_url):
    status, headers, body = post(base_url, TEST_QUERY, accept="text/csv")
    assert status == 200
    assert headers["Content-Type"] == "text/csv"
    assert body == GOLDEN_CSV


def test_query_arrow_roundtrip(base_url):
    status, headers, body = post(
        base_url, TEST_QUERY, accept="application/vnd.apache.arrow.stream"
    )
    assert status == 200
    table = pa.ipc.open_stream(io.BytesIO(body)).read_all()
    assert table.column("Id").to_pylist() == [1]
    assert table.column("Name").to_pylist() == ["Rust"]
    assert table.column("Description").to_pylist() == [
        "Safe, concurrent, performant systems language"
    ]
    # cross-library decode: DuckDB's own IPC reader, a different
    # implementation than the pyarrow writer (mirrors the reference
    # decoding with polars, src/main.rs:196-213)
    import duckdb

    con = duckdb.connect()
    try:
        con.install_extension("arrow")
        con.load_extension("arrow")
        (row,) = con.sql(
            "SELECT Id, Name FROM scan_arrow_ipc(?)", params=[[body]]
        ).fetchall()
        assert row == (1, "Rust")
    except duckdb.Error:
        # arrow extension unavailable offline → decode via the relational
        # bridge instead (still a second consumer of the same bytes)
        reader = pa.ipc.open_stream(io.BytesIO(body)).read_all()
        assert con.sql("SELECT Id, Name FROM reader").fetchall() == [(1, "Rust")]
    finally:
        con.close()


def test_query_jsonl(base_url):
    status, _, body = post(base_url, TEST_QUERY, accept="application/jsonl")
    assert status == 200
    lines = body.decode().splitlines()
    assert len(lines) == 1
    assert json.loads(lines[0])["Name"] == "Rust"


def test_query_gzip(base_url):
    status, headers, body = post(base_url, TEST_QUERY, headers={"Accept-Encoding": "gzip"})
    assert status == 200
    assert headers["Content-Encoding"] == "gzip"
    assert body[0] == 0x1F and body[1] == 0x8B  # main.rs:226-227
    assert gzip.decompress(body) == GOLDEN_JSON


# -- negotiation / errors (main.rs:289-302, routers.rs:191-205) -------------


def test_unsupported_accept_406(base_url):
    status, headers, body = post(base_url, TEST_QUERY, accept="text/html")
    assert status == 406
    assert headers["Content-Type"] == "application/problem+json"
    err = json.loads(body)
    assert err["title"] == "Unsupported response format"


def test_sql_error_400_problem_json(base_url):
    status, headers, body = post(base_url, "bad command")
    assert status == 400
    assert headers["Content-Type"] == "application/problem+json"
    err = json.loads(body)
    assert err["status"] == 400 and err["title"] == "SQL Error" and err["detail"]


def test_invalid_json_400(base_url):
    req = urllib.request.Request(base_url + "/", data=b"{not json", method="POST")
    req.add_header("Content-Type", "application/json")
    req.add_header("Accept", "application/json")
    try:
        resp = urllib.request.urlopen(req, timeout=30)
        status, body = resp.status, resp.read()
    except urllib.error.HTTPError as e:
        status, body = e.code, e.read()
    assert status == 400 and json.loads(body)["title"] == "Invalid JSON"


def test_body_too_large_400(base_url):
    status, _, body = post(base_url, "SELECT '" + "x" * (256 * 1024) + "'", content_type="text/plain")
    assert status == 400
    assert json.loads(body)["title"] == "Failed to read request body"


def test_forbidden_statement_400(base_url):
    status, _, body = post(base_url, "SET spark.sql.ansi.enabled=false")
    assert status == 400 and "locked" in json.loads(body)["detail"]


def test_sandbox_violation_400(base_url):
    status, _, body = post(base_url, "SELECT * FROM '/etc/passwd.csv'")
    assert status == 400 and "allowed directories" in json.loads(body)["detail"]


# -- health / CORS (main.rs:261-287, smoke :106) ----------------------------


def test_health(base_url):
    resp = urllib.request.urlopen(base_url + "/health", timeout=30)
    assert resp.status == 200


def test_cors_preflight(cors_url):
    req = urllib.request.Request(cors_url + "/", method="OPTIONS")
    req.add_header("Origin", "http://example.com")
    req.add_header("Access-Control-Request-Method", "POST")
    resp = urllib.request.urlopen(req, timeout=30)
    assert resp.status == 200
    assert resp.headers["Access-Control-Allow-Origin"] == "*"


def test_no_cors_headers_by_default(base_url):
    status, headers, _ = post(base_url, TEST_QUERY)
    assert status == 200 and "Access-Control-Allow-Origin" not in headers


# -- file scans (main.rs:304-368; same trio fixture) ------------------------


def test_scan_csv_path(base_url):
    status, _, body = post(
        base_url, f"SELECT * FROM '{FIXTURES}/test.csv' ORDER BY f_int"
    )
    assert status == 200
    rows = json.loads(body)
    assert rows[0] == {"f_str": "abc", "f_int": 123, "f_float": 4.56}


def test_scan_parquet_path(base_url):
    status, _, body = post(
        base_url, f"SELECT f_str, f_int, f_float FROM '{FIXTURES}/test.zstd.parquet' ORDER BY f_int"
    )
    assert status == 200
    rows = json.loads(body)
    assert [r["f_int"] for r in rows] == [123, 789]
    assert rows[1]["f_float"] == 10.12


def test_scan_jsonl_path(base_url):
    status, _, body = post(
        base_url,
        f"SELECT f_str, f_int, f_float FROM '{FIXTURES}/test.jsonl' ORDER BY f_int",
        accept="application/jsonl",
    )
    assert status == 200
    lines = [json.loads(l) for l in body.decode().splitlines()]
    assert len(lines) == 2 and lines[0]["f_str"] == "abc" and lines[0]["f_float"] == 4.56


def test_read_csv_tvf(base_url):
    status, _, body = post(
        base_url,
        f"SELECT count(*) AS n FROM read_csv('{FIXTURES}/test.csv', header=true)",
    )
    assert status == 200 and json.loads(body) == [{"n": 2}]


def test_format_equivalence_across_trio(base_url):
    results = []
    for f in ["test.csv", "test.jsonl", "test.zstd.parquet"]:
        status, _, body = post(
            base_url,
            f"SELECT f_str, CAST(f_int AS BIGINT) AS f_int, f_float FROM '{FIXTURES}/{f}' ORDER BY f_int",
        )
        assert status == 200
        results.append(json.loads(body))
    assert results[0] == results[1] == results[2]


# -- timeout (main.rs:452-469) ----------------------------------------------


def test_query_timeout_408(spark):
    server, url = _serve(spark, query_timeout_secs=0.05)
    try:
        # dialect-neutral slow query: since round 5 the gateway maps
        # FROM-position range() to DuckDB's column naming (`range`, not
        # Spark's `id`), so don't reference either by name here.
        slow = "SELECT count(*) AS n FROM range(3000000) a CROSS JOIN range(3000) b"
        status, _, body = post(url, slow)
        assert status == 408
        assert json.loads(body)["title"] == "Query Timeout"
    finally:
        server.shutdown()


def test_empty_result_streams_ok(base_url):
    status, _, body = post(base_url, "SELECT 1 AS x WHERE 1 = 0")
    assert status == 200 and body == b"[]"


# -- SELECT-shaped conveniences: DESCRIBE / SHOW / EXPLAIN (SURVEY §2.B.8) --


def test_describe_statement(base_url):
    status, _, body = post(
        base_url, f"DESCRIBE SELECT * FROM '{FIXTURES}/test.zstd.parquet'", "text/plain"
    )
    assert status == 200
    cols = {r["col_name"] for r in json.loads(body)}
    assert {"f_int", "f_float", "f_str"} <= cols


def test_show_functions_statement(base_url):
    status, _, body = post(base_url, "SHOW FUNCTIONS LIKE 'co*'", "text/plain")
    assert status == 200
    assert any("concat" in r["function"] for r in json.loads(body))


def test_explain_statement(base_url):
    status, _, body = post(base_url, "EXPLAIN SELECT 1 AS n", "text/plain")
    assert status == 200
    assert "Physical Plan" in json.loads(body)[0]["plan"]


# -- executor-side JSON serialization parity (engine fast path) -------------


def test_json_fast_path_byte_parity(spark):
    """engine.execute() serializes JSON rows executor-side (mapInArrow);
    the bytes must be IDENTICAL to feeding the same Arrow batches through
    the writer on the driver — across doubles, dates, timestamps, NULLs,
    unicode and quotes."""
    import io as _io

    from uquery_rs_spark.engine import Engine, _arrow_schema, _stream_arrow_batches
    from uquery_rs_spark.writers.consumers import JsonArrayWriter, JsonLinesWriter

    eng = Engine(spark, pool_size=2)
    sql = (
        "SELECT id, CAST(id AS DOUBLE)/7 AS frac, "
        "concat('n\"é', CAST(id AS STRING)) AS s, id % 2 = 0 AS b, "
        "DATE '2024-01-01' + CAST(id % 300 AS INT) AS d, "
        "TIMESTAMP_NTZ '2024-01-01 10:00:00' + make_interval(0,0,0,0,0,0,id % 86400) AS ts, "
        "IF(id % 10 = 0, NULL, id) AS nullable "
        "FROM range(5000) DISTRIBUTE BY id % 4"
    )
    for writer_cls in (JsonLinesWriter, JsonArrayWriter):
        fast_sink = _io.BytesIO()
        eng.prepare(sql).execute(writer_cls(fast_sink))
        df = spark.sql(sql)
        schema = _arrow_schema(df)
        slow_sink = _io.BytesIO()
        w = writer_cls(slow_sink)
        w.on_schema(schema)
        for b in _stream_arrow_batches(df, schema, 1024):
            w.on_batch(b)
        w.finish()
        assert fast_sink.getvalue() == slow_sink.getvalue()


def test_interval_results_render_duckdb_text(base_url):
    """Round-10: interval-typed RESULT columns render as DuckDB's
    display text (engine.py::PreparedQuery.dataframe +
    functions/interval_text.py). Spark cannot convert Calendar/
    YearMonth intervals to Arrow at all, so these queries previously
    400'd through the serving path where the reference serves them;
    DayTime intervals serialized as raw durations where DuckDB prints
    '1 day 01:30:00'. Every expected string DuckDB-verified."""
    cases = [
        ("SELECT to_days(14) AS v", "14 days"),
        ("SELECT to_hours(25) AS v", "25:00:00"),
        ("SELECT INTERVAL 14 MONTH AS v", "1 year 2 months"),
        ("SELECT -INTERVAL 3 MONTH AS v", "-3 months"),
        ("SELECT INTERVAL 90 MINUTE AS v", "01:30:00"),
        (
            "SELECT TIMESTAMP '2024-03-15 10:00:00' - "
            "TIMESTAMP '2024-03-14 08:30:00' AS v",
            "1 day 01:30:00",
        ),
        (
            "SELECT TIMESTAMP '2024-03-14 08:30:00' - "
            "TIMESTAMP '2024-03-15 10:00:00.5' AS v",
            "-1 day -01:30:00.5",
        ),
        ("SELECT to_days(1) - to_minutes(30) AS v", "1 day -00:30:00"),
        ("SELECT to_months(1) - to_days(1) AS v", "1 month -1 day"),
        ("SELECT to_months(-14) AS v", "-1 year -2 months"),
        ("SELECT INTERVAL 0 SECOND AS v", "00:00:00"),
        ("SELECT to_seconds(90061.5) AS v", "25:01:01.5"),
        ("SELECT to_milliseconds(250) AS v", "00:00:00.25"),
        ("SELECT to_days(1) + to_microseconds(1) AS v", "1 day 00:00:00.000001"),
        ("SELECT to_quarters(5) AS v", "1 year 3 months"),
        ("SELECT CAST(NULL AS TIMESTAMP) - TIMESTAMP '2024-01-01' AS v", None),
    ]
    for sql, want in cases:
        status, _, body = post(base_url, sql)
        assert status == 200, (sql, body[:200])
        rows = json.loads(body)
        assert rows[0]["v"] == want, (sql, rows, want)


def test_interval_results_with_duplicate_column_names(base_url):
    """Round-11 (r10 ADVICE low, found broader): duplicate result-column
    names (legal SQL) 400'd through the WHOLE Arrow serving path — not
    just the interval re-select the ADVICE flagged, because pyspark's
    own mapInArrow re-selects every column by NAME (map_ops.py
    self[col]). engine.execute() now ships duplicate-name results under
    unique temp names and the serializers rename batches back to the
    announced schema; the interval transform is positional (toDF)."""
    # the pre-existing broader case: no intervals at all
    status, _, body = post(base_url, "SELECT 1 AS x, 2 AS x")
    assert status == 200, body[:300]
    status, _, body = post(
        base_url,
        "SELECT 1 AS x, 2 AS x, INTERVAL 90 MINUTE AS v, "
        "INTERVAL 1 DAY AS v",
    )
    assert status == 200, body[:300]
    line = json.loads(body)[0]
    # JSON objects collapse duplicate keys (last wins) — the serving
    # contract here is only that the query SUCCEEDS and the interval
    # text renders; column multiplicity is asserted via CSV below.
    assert line["v"] == "1 day"
    status, headers, body = post(base_url,
        "SELECT 1 AS x, 2 AS x, INTERVAL 90 MINUTE AS v",
        accept="text/csv",
    )
    assert status == 200, body[:300]
    head, first = body.decode().splitlines()[:2]
    assert head.split(",") == ["x", "x", "v"]
    assert first.split(",") == ["1", "2", "01:30:00"]


def test_case_variant_duplicate_column_names(base_url):
    """Round-12 ADVICE: case-variant duplicates (SELECT 1 AS x, 2 AS X)
    hit the same AMBIGUOUS_REFERENCE under Spark's case-insensitive
    resolution — the duplicate check now keys on casefolded names."""
    status, headers, body = post(
        base_url, "SELECT 1 AS x, 2 AS X", accept="text/csv"
    )
    assert status == 200, body[:300]
    head, first = body.decode().splitlines()[:2]
    assert head.split(",") == ["x", "X"]
    assert first.split(",") == ["1", "2"]
