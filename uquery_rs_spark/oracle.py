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


def _arrow_kind(t) -> str:
    """Coarse type kind for a pyarrow DataType (the oracle side)."""
    import pyarrow as pa

    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_decimal(t):
        return "dec"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "str"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_timestamp(t):
        return "ts"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "bin"
    if pa.types.is_list(t) or pa.types.is_large_list(t) or pa.types.is_fixed_size_list(t):
        return "list"
    if pa.types.is_struct(t):
        return "struct"
    if pa.types.is_map(t):
        return "map"
    return "other"


def _spark_kind(dt) -> str:
    """Coarse type kind for a Spark DataType (mirror of _arrow_kind)."""
    from pyspark.sql import types as T

    if isinstance(dt, T.BooleanType):
        return "bool"
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "int"
    if isinstance(dt, T.DecimalType):
        return "dec"
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return "float"
    if isinstance(dt, T.StringType):
        return "str"
    if isinstance(dt, T.DateType):
        return "date"
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return "ts"
    if isinstance(dt, T.BinaryType):
        return "bin"
    if isinstance(dt, T.ArrayType):
        return "list"
    if isinstance(dt, T.StructType):
        return "struct"
    if isinstance(dt, T.MapType):
        return "map"
    return "other"


def type_kind_mismatches(sdf, arrow_schema) -> list[str]:
    """Columns whose coarse type KIND differs between Spark and the oracle.

    The driver's value hasher distinguishes Arrow decimal128 (DuckDB
    HUGEINT, e.g. sum() over integers) from int64 even when every value is
    identical (round-1 q12 failure). Same-kind width differences
    (int32/int64, float32/float64) are fine — both hashers normalize those.
    """
    okinds = {f.name: _arrow_kind(f.type) for f in arrow_schema}
    out = []
    for f in sdf.schema.fields:
        sk, ok = _spark_kind(f.dataType), okinds.get(f.name)
        if ok is not None and sk != ok:
            out.append(f"{f.name}: spark={sk} oracle={ok}")
    return out


def complex_result_columns(sdf) -> list[str]:
    """Top-level array/map/struct columns in a result schema.

    Registry convention (round-4 lesson): oracle-backed entries must
    return SCALAR columns only. The driver's canonicalizer hashes via
    pandas ``sort_values``, which raises ``unhashable type: 'list'`` on
    array cells — five dialect batteries sat green on the repo's own
    list-tolerant hasher and burned driver-window slots on first
    rotation. Serialize arrays with array_join/to_json instead.
    """
    return [
        f"{f.name} ({kind})"
        for f in sdf.schema.fields
        if (kind := _spark_kind(f.dataType)) in ("list", "struct", "map")
    ]


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
    if q.oracle is not None:
        # Lint BEFORE running: the driver's pandas-based hasher crashes on
        # non-scalar cells, so such an entry can never go driver-green.
        complex_cols = complex_result_columns(sdf)
        if complex_cols:
            return False, (
                "non-scalar result columns (driver hasher rejects): "
                + ", ".join(complex_cols)
            )
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    if q.oracle is None:
        return True, f"rows-only ({len(srows)} rows)"
    otbl = con.execute(q.oracle).arrow()
    ocols = otbl.column_names
    _cols_py = [c.to_pylist() for c in otbl.columns]
    orows = [tuple(r) for r in zip(*_cols_py)] if _cols_py else []
    if sorted(scols) != sorted(ocols):
        return False, f"columns spark={sorted(scols)} oracle={sorted(ocols)}"
    kind_mismatch = type_kind_mismatches(sdf, otbl.schema)
    if kind_mismatch:
        return False, "type-kind mismatch (driver hasher distinguishes): " + "; ".join(
            kind_mismatch
        )
    sn, sh = digest(scols, srows)
    on, oh = digest(ocols, orows)
    if (sn, sh) != (on, oh):
        return False, f"rows/hash spark=({sn},{sh}) oracle=({on},{oh})"
    return True, f"{sn} rows, hash {sh}"
