"""Local mirror of the driver's t2 correctness gate.

Runs every registry query on Spark and its DuckDB oracle side-by-side,
compares row count, column names, and an order-insensitive value digest.
Usage:  python tools/oracle_check.py [sf_dir] [name ...]
"""

from __future__ import annotations

import math
import sys
from datetime import date, datetime
from decimal import Decimal

import duckdb

sys.path.insert(0, "/root/repo")

from uquery_rs_spark import queries as Q
from uquery_rs_spark.queries.registry import TABLES
from uquery_rs_spark.session import get_spark

Q.load_all()


def _norm(v):
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # quantize so sub-ulp engine differences don't flip the digest
        return f"{v:.6g}"
    if isinstance(v, (datetime, date)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{_norm(x)}" for k, x in sorted(v.items())) + "}"
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def digest(cols: list[str], rows: list[tuple]) -> tuple[int, str]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(_norm(r[i]) for i in order) for r in rows)
    import hashlib

    return len(rows), hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]


def main() -> int:
    args = sys.argv[1:]
    sf = args[0] if args and "/" in args[0] else "/root/testdata/sf0.01"
    names = [a for a in args if "/" not in a] or list(Q.REGISTRY)

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

    failures = []
    for name in names:
        q = Q.REGISTRY[name]
        try:
            sdf = q.spark_fn(spark, sf)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {str(e)[:300]}")
            continue
        if q.oracle is None:
            print(f"ok*   {name}: rows-only ({len(srows)} rows)")
            continue
        try:
            res = con.execute(q.oracle)
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: oracle error: {str(e)[:300]}")
            continue
        sn, sh = digest(scols, srows)
        on, oh = digest(ocols, orows)
        if sorted(scols) != sorted(ocols):
            failures.append(name)
            print(f"FAIL  {name}: columns spark={sorted(scols)} oracle={sorted(ocols)}")
        elif (sn, sh) != (on, oh):
            failures.append(name)
            print(f"FAIL  {name}: rows/hash spark=({sn},{sh}) oracle=({on},{oh})")
        else:
            print(f"ok    {name}: {sn} rows, hash {sh}")
    print(f"\n{len(names) - len(failures)}/{len(names)} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
