"""Attach a read-only DuckDB database file (reference ``--db-file``).

Reference semantics (src/cli/options.rs:63-64,183-186 and
src/core/duckdb.rs:19-22): the file is ATTACHed READ_ONLY as
``uquery_attached_db`` and made the default schema, so its tables, views,
scalar macros, and macro tables become the query surface
(src/main.rs:231-259 queries a ``language`` table; :413-450 a ``test()``
macro table).

Spark-side bootstrap: the ``duckdb`` library opens the file once at
startup —

- tables and views are bridged over Arrow into temp views (the attached
  db is a small lookup/macro catalog by design — the reference serves it
  from an embedded single-node engine, so driver-side materialization
  matches its scale envelope; large shared data belongs in parquet/
  Iceberg catalogs, not ``--db-file``);
- parameterless table macros are evaluated once and registered as views,
  with ``name()`` → ``name`` handled by the SQL rewriter;
- parameterized table macros keep their SELECT body and expand at rewrite
  time into a derived table ``(body with args substituted)`` — the same
  bind-time inlining DuckDB itself performs;
- scalar macros become textual expansions the rewriter applies before
  Catalyst (exactly DuckDB's own macro semantics — macros are inlined at
  bind time, not called).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import SparkSession

from ..errors import UQueryError


@dataclass
class ScalarMacro:
    name: str
    params: list[str]
    body: str


@dataclass
class AttachedCatalog:
    tables: list[str] = field(default_factory=list)
    table_macros: list[str] = field(default_factory=list)
    table_macro_defs: list[ScalarMacro] = field(default_factory=list)
    scalar_macros: list[ScalarMacro] = field(default_factory=list)


def attach_db(spark: SparkSession, path: str) -> AttachedCatalog:
    """Register every table/view/macro of a DuckDB file as Spark surface."""
    try:
        import duckdb
    except ImportError as e:  # pragma: no cover
        raise UQueryError.sql_error("--db-file requires the duckdb package") from e

    con = duckdb.connect(path, read_only=True)
    result = AttachedCatalog()
    try:
        for (name,) in con.execute(
            "SELECT table_name FROM duckdb_tables() WHERE NOT internal "
            "UNION ALL SELECT view_name FROM duckdb_views() WHERE NOT internal"
        ).fetchall():
            tbl = con.sql(f'SELECT * FROM "{name}"').arrow()
            spark.createDataFrame(tbl.to_pandas()).createOrReplaceTempView(name)
            result.tables.append(name)

        macros = con.execute(
            "SELECT function_name, function_type, parameters, macro_definition "
            "FROM duckdb_functions() WHERE function_type IN ('macro', 'table_macro') "
            "AND NOT internal"
        ).fetchall()
        for fname, ftype, params, definition in macros:
            if ftype == "table_macro":
                if params:  # parameterized: template-expanded per call
                    result.table_macro_defs.append(
                        ScalarMacro(fname, list(params), definition)
                    )
                    continue
                tbl = con.sql(f'SELECT * FROM "{fname}"()').arrow()
                spark.createDataFrame(tbl.to_pandas()).createOrReplaceTempView(fname)
                result.table_macros.append(fname)
            else:
                result.scalar_macros.append(
                    ScalarMacro(fname, list(params or []), definition)
                )
    finally:
        con.close()
    return result
