"""Concurrent-serving benchmark: N clients against the HTTP service, pool=4.

The reference's core runtime contract is a pool of 4 connections with
queueing (reference src/cli/options.rs:100-102, src/core/duckdb.rs:9-45);
the rebuild's equivalent is the Engine semaphore + Spark FAIR scheduler.
This measures that contract under load: 8 concurrent clients × R rounds of
a mixed workload (light point queries, a TPC-H-style aggregation, a medium
JSON export) against the real HTTP server, recording per-request wall
latency.

Outputs one JSON line: p50/p95 per query class, total wall, and a fairness
check (max/min of per-client total time — near 1.0 = no starvation).

Usage: python tools/concurrency_bench.py [SF_DIR] [N_CLIENTS] [ROUNDS]
"""

from __future__ import annotations

import json
import sys
import threading
import time
import urllib.request

sys.path.insert(0, "/root/repo")

from uquery_rs_spark.engine import Engine
from uquery_rs_spark.rewrite import SqlRewriter
from uquery_rs_spark.session import get_spark
from uquery_rs_spark.web.app import ServiceConfig, make_server

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
N_CLIENTS = int(sys.argv[2]) if len(sys.argv) > 2 else 8
ROUNDS = int(sys.argv[3]) if len(sys.argv) > 3 else 5
POOL = 4

WORKLOAD = [
    # (class, accept, sql)
    ("light", "application/json", "SELECT 1 AS one"),
    (
        "light",
        "application/json",
        f"SELECT count(*) AS n FROM '{SF}/region.parquet'",
    ),
    (
        "agg",
        "application/json",
        "SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty, "
        "round(avg(l_extendedprice), 2) AS avg_price, count(*) AS n "
        f"FROM '{SF}/lineitem.parquet' "
        "WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00' "
        "GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus",
    ),
    (
        "join",
        "application/json",
        "SELECT n_name, count(*) AS n_cust "
        f"FROM '{SF}/customer.parquet' c JOIN '{SF}/nation.parquet' n "
        "ON c_nationkey = n_nationkey GROUP BY n_name ORDER BY n_name",
    ),
    (
        "export",
        "application/jsonl",
        f"SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate FROM '{SF}/orders.parquet' "
        "ORDER BY o_orderkey LIMIT 5000",
    ),
]


def post(url: str, sql: str, accept: str) -> int:
    req = urllib.request.Request(
        url + "/", data=sql.encode(), method="POST",
        headers={"Content-Type": "text/plain", "Accept": accept},
    )
    with urllib.request.urlopen(req, timeout=300) as resp:
        return len(resp.read())


def pct(xs: list[float], p: float) -> float:
    xs = sorted(xs)
    return xs[min(len(xs) - 1, int(p * len(xs)))]


def main() -> None:
    import os

    if os.environ.get("UQ_DISABLE_EXEC_JSON"):
        # A/B lever (round-7 verdict item 8): strip the executor-side
        # serialization factory so JSON/JSONL encode single-threaded on
        # the driver (the pre-round-6 path). Byte output is identical —
        # only the latency distribution moves.
        from uquery_rs_spark.writers import consumers as _c

        for cls in list(vars(_c).values()):
            if isinstance(cls, type) and hasattr(cls, "batch_bytes_serializer"):
                cls.batch_bytes_serializer = None
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    rewriter = SqlRewriter(spark, allowed_dirs=[SF])
    engine = Engine(spark, pool_size=POOL, rewriter=rewriter)
    server = make_server("127.0.0.1", 0, ServiceConfig(engine, query_timeout_secs=300))
    threading.Thread(target=server.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{server.server_address[1]}"

    # warm each query once (JVM/codegen ramp is not the contract under test)
    for _, accept, sql in WORKLOAD:
        post(url, sql, accept)

    lat: dict[str, list[float]] = {}
    client_total: list[float] = [0.0] * N_CLIENTS
    errors: list[str] = []
    lock = threading.Lock()

    def client(cid: int) -> None:
        tot = 0.0
        for r in range(ROUNDS):
            # rotate the workload so clients contend on different mixes
            for j in range(len(WORKLOAD)):
                cls, accept, sql = WORKLOAD[(cid + r + j) % len(WORKLOAD)]
                t0 = time.perf_counter()
                try:
                    post(url, sql, accept)
                except Exception as e:  # pragma: no cover
                    with lock:
                        errors.append(f"{cls}: {e}")
                    continue
                dt = time.perf_counter() - t0
                tot += dt
                with lock:
                    lat.setdefault(cls, []).append(dt)
        client_total[cid] = tot

    t0 = time.perf_counter()
    threads = [threading.Thread(target=client, args=(i,)) for i in range(N_CLIENTS)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0

    out = {
        "metric": "concurrent_serving",
        "clients": N_CLIENTS,
        "pool": POOL,
        "rounds": ROUNDS,
        "requests": sum(len(v) for v in lat.values()),
        "wall_sec": round(wall, 2),
        "rps": round(sum(len(v) for v in lat.values()) / wall, 1),
        "fairness_max_over_min": round(max(client_total) / max(min(client_total), 1e-9), 2),
        "errors": len(errors),
        "per_class": {
            cls: {
                "n": len(v),
                "p50_ms": round(pct(v, 0.50) * 1000, 1),
                "p95_ms": round(pct(v, 0.95) * 1000, 1),
                "max_ms": round(max(v) * 1000, 1),
            }
            for cls, v in sorted(lat.items())
        },
    }
    print(json.dumps(out))
    if errors:
        print("ERRORS:", errors[:5], file=sys.stderr)
    server.shutdown()
    spark.stop()


if __name__ == "__main__":
    main()
