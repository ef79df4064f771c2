"""DuckDB-oracle comparison utilities (shared by tools/oracle_check.py and
the pytest suite).

Mirrors the driver's t2 gate: row count + column names + order-insensitive
value digest. Floats are quantized to 6 significant digits before hashing
so sub-ulp engine differences don't flip the digest — the queries
themselves round to fixed decimals, making the comparison deterministic.
"""

from __future__ import annotations

import hashlib
import math
from datetime import date, datetime
from decimal import Decimal

import duckdb
from pyspark.sql import SparkSession

from .queries.registry import TABLES, Query


def _norm(v) -> str:
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6g}"
    if isinstance(v, (datetime, date)):
        return v.isoformat()
    if hasattr(v, "asDict"):  # Spark Row (struct value) ↔ DuckDB dict
        return _norm(v.asDict())
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
    return len(rows), hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]


def oracle_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def compare_query(
    spark: SparkSession, con: duckdb.DuckDBPyConnection, q: Query, sf_dir: str
) -> tuple[bool, str]:
    """Run Spark + oracle sides; returns (passed, detail)."""
    sdf = q.spark_fn(spark, sf_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    if q.oracle is None:
        return True, f"rows-only ({len(srows)} rows)"
    res = con.execute(q.oracle)
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    if sorted(scols) != sorted(ocols):
        return False, f"columns spark={sorted(scols)} oracle={sorted(ocols)}"
    sn, sh = digest(scols, srows)
    on, oh = digest(ocols, orows)
    if (sn, sh) != (on, oh):
        return False, f"rows/hash spark=({sn},{sh}) oracle=({on},{oh})"
    return True, f"{sn} rows, hash {sh}"
