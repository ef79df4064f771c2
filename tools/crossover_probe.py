"""Crossover probe: both engines at an EQUAL, data-smaller-than-data
memory budget — the 100 TB regime in miniature (round-7 verdict item 4).

The standing claim for the perf-weak set (q3/q5/q8/q21/tumbling) is that
their residual >2x-vs-DuckDB ratio is the per-row shuffle constant of a
scale-out architecture, which buys the ability to run when the working
set exceeds memory. On a 128 GiB host DuckDB never spills at any scale
we can generate, so the regime is emulated the only honest way: BOTH
engines get the SAME memory budget (default 2 GiB) on data whose
build-side/aggregation working set exceeds it — DuckDB via SET
memory_limit (its documented out-of-core path), Spark via driver-JVM
-Xmx in local mode (its external shuffle/spill machinery, the default
cluster posture). Same data, same queries, interleaved best-of-N after
a per-query warmup (floor_probe methodology).

Spark's memory conf must exist BEFORE the JVM starts: this script sets
spark.driver.memory via SparkSession.builder in a fresh process — run
it standalone, not from an existing Spark session.

Usage:
    python tools/crossover_probe.py SCALED_DIR [MEM] [CORES] [name ...]
    # MEM like '4g' (default); CORES per engine (default 8) — local
    # mode shares ONE heap across all concurrent tasks, so the
    # per-task memory is MEM/CORES; a real cluster gives each
    # executor its own heap, making this the conservative setting
    # for Spark. Names restrict the query set.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

QUERY_SET = [
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q8_market_share",
    "q21_suppliers_kept_waiting",
    "tumbling_window_events",
]


def best_of(run, n=3) -> float:
    run()  # untimed per-query warmup (JIT/codegen ramp)
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    return min(times)


def main() -> None:
    scaled = sys.argv[1]
    mem = sys.argv[2] if len(sys.argv) > 2 else "4g"
    cores = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    subset = sys.argv[4:]
    names = [n for n in QUERY_SET if n in subset] if subset else QUERY_SET

    import duckdb
    from pyspark.sql import SparkSession

    from uquery_rs_spark import queries as Q
    from uquery_rs_spark.oracle import oracle_connection

    Q.load_all()

    spark = (
        SparkSession.builder.master(f"local[{cores}]")
        .config("spark.driver.memory", mem)
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .appName("crossover-probe")
        .getOrCreate()
    )
    jvm_xmx = spark.sparkContext._conf.get("spark.driver.memory")
    con = oracle_connection(scaled)
    con.execute(f"SET memory_limit='{mem.upper().replace('G', 'GB')}'")
    con.execute(f"SET threads={cores}")
    con.execute("SET temp_directory='/tmp/duck_spill'")
    duck_lim = con.execute(
        "SELECT current_setting('memory_limit')"
    ).fetchone()[0]
    print(f"budget: spark driver {jvm_xmx}, duckdb {duck_lim}", flush=True)

    # warm session + parquet footers
    Q.REGISTRY[names[0]].spark_fn(spark, scaled).count()

    print(f"\n| query | spark@{mem} | duck@{mem} | ratio |")
    print("|---|---|---|---|")
    for name in names:
        q = Q.REGISTRY[name]
        s = best_of(lambda: q.spark_fn(spark, scaled).toArrow())
        try:
            d = best_of(lambda: con.execute(q.oracle).arrow())
            ratio = f"{s / max(d, 1e-9):.2f}x"
            dtxt = f"{d:.2f}"
        except Exception as e:
            dtxt = "ERR: " + str(e).split("\n")[0][:60]
            ratio = "-"
        print(f"| {name} | {s:.2f} | {dtxt} | {ratio} |", flush=True)


if __name__ == "__main__":
    main()
