"""Iceberg REST catalog smoke (reference: ATTACH TYPE iceberg +
ENDPOINT/OAuth secret, src/cli/options.rs:175-181).

The conf mapping itself is unit-tested in test_cloud_conf.py; this module
goes one step further and boots Spark with the REAL Iceberg runtime
against a local REST mock — `SHOW NAMESPACES` must round-trip through the
catalog's /v1/config + /v1/namespaces endpoints. It requires
iceberg-spark-runtime on the classpath, which this container does not
ship (no network for ivy), so the whole module is skip-marked: point
UQ_ICEBERG_JAR at the jar (or drop it into pyspark/jars) to activate.
"""

from __future__ import annotations

import glob
import json
import os
import threading

import pytest


def _find_jar() -> str | None:
    env = os.environ.get("UQ_ICEBERG_JAR")
    if env and os.path.exists(env):
        return env
    import pyspark

    hits = glob.glob(os.path.join(os.path.dirname(pyspark.__file__), "jars", "*iceberg*.jar"))
    return hits[0] if hits else None


_JAR = _find_jar()

_needs_jar = pytest.mark.skipif(
    _JAR is None,
    reason="iceberg-spark-runtime jar not available (set UQ_ICEBERG_JAR)",
)


@pytest.fixture(scope="module")
def rest_mock():
    """Minimal Iceberg REST catalog: /v1/config + namespace listing."""
    import http.server
    import socketserver

    class Handler(http.server.BaseHTTPRequestHandler):
        hits: list[str] = []

        def log_message(self, *a):
            pass

        def do_GET(self):
            type(self).hits.append(self.path)
            if self.path.startswith("/v1/config"):
                body = {"defaults": {}, "overrides": {}}
            elif "namespaces" in self.path:
                body = {"namespaces": [["smoke"]]}
            else:
                body = {}
            data = json.dumps(body).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

    httpd = socketserver.TCPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}", Handler
    httpd.shutdown()


@_needs_jar
def test_rest_catalog_namespace_roundtrip(rest_mock):
    from pyspark.sql import SparkSession

    uri, handler = rest_mock
    spark = (
        SparkSession.builder.master("local[2]")
        .appName("uq-iceberg-smoke")
        .config("spark.jars", _JAR)
        .config("spark.sql.catalog.iceberg", "org.apache.iceberg.spark.SparkCatalog")
        .config("spark.sql.catalog.iceberg.type", "rest")
        .config("spark.sql.catalog.iceberg.uri", uri)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    try:
        rows = spark.sql("SHOW NAMESPACES IN iceberg").collect()
        assert ["smoke"] in [[r[0]] for r in rows]
        assert any(p.startswith("/v1/config") for p in handler.hits)
    finally:
        spark.stop()


def test_catalog_conf_reaches_spark_catalog_manager(spark):
    """Round 10 (jar still absent after probe #10 — maven DNS dead):
    e2e coverage for every NON-JAR layer of the Iceberg path. The
    reference's ATTACH conf (src/cli/options.rs:175-181) is built by
    build_catalog_conf, applied to a LIVE session, and a query against
    the catalog must be routed by Spark's catalog manager to our
    configured implementation class — failing precisely at the
    class-load boundary (the jar), not at conf parsing, catalog-name
    resolution, or plugin dispatch. When UQ_ICEBERG_JAR appears, the
    skip-gated REST round-trip above covers the final layer."""
    from uquery_rs_spark.sources.cloud import cloud_spark_conf

    conf = cloud_spark_conf(
        ic_catalog_endpoint="http://127.0.0.1:1/unreachable",
        ic_catalog_name="wh",
        ic_user="u",
        ic_secret="s",
    )
    pfx = "spark.sql.catalog.uq_r10_iceberg_probe"
    for k, v in conf.items():
        if k.startswith("spark.sql.catalog.iceberg"):
            spark.conf.set(k.replace("spark.sql.catalog.iceberg", pfx), v)
    try:
        for k in ("", ".type", ".uri", ".warehouse", ".credential"):
            assert spark.conf.get(f"{pfx}{k}")  # conf reached the session
        with pytest.raises(Exception) as ei:
            spark.sql("SHOW NAMESPACES IN uq_r10_iceberg_probe").collect()
        msg = str(ei.value)
        # the catalog manager resolved OUR catalog name and attempted to
        # instantiate OUR configured class: jar-missing is the only
        # acceptable failure mode (a name-resolution error would say
        # CATALOG_NOT_FOUND / "Catalog ... not found")
        assert "org.apache.iceberg.spark.SparkCatalog" in msg
        assert "CATALOG_NOT_FOUND" not in msg
    finally:
        for k in ("", ".type", ".uri", ".warehouse", ".credential"):
            spark.conf.unset(f"{pfx}{k}")
