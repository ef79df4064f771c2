"""Reader dispatch: a file path (or URL) becomes a DataFrame.

Reference semantics: a quoted path is a table (`SELECT * FROM
'tests/test.zstd.parquet'`, src/main.rs:327; `.jsonl` at :350; `.csv` via
smoke test), remote URLs admitted by prefix (https/s3/gcs/gs —
src/cli/options.rs:24), formats inferred by extension with CSV sniffing
and JSON structure detection. Spark-side: spark.read.* with schema
inference, zstd/gzip handled natively by the parquet/csv readers.
"""

from __future__ import annotations

import os
import tempfile
import urllib.request

from pyspark.sql import DataFrame, SparkSession

from ..errors import UQueryError

# extension → (spark format, default reader options)
FORMATS: dict[str, tuple[str, dict[str, str]]] = {
    "parquet": ("parquet", {}),
    "csv": ("csv", {"header": "true", "inferSchema": "true"}),
    "tsv": ("csv", {"header": "true", "inferSchema": "true", "sep": "\t"}),
    "json": ("json", {}),
    "jsonl": ("json", {}),
    "ndjson": ("json", {}),
    # beyond-reference: Spark-native columnar formats a migrating corpus
    # may already sit in
    "orc": ("orc", {}),
    "avro": ("avro", {}),  # needs spark-avro on the classpath; clear error otherwise
}

REMOTE_SCHEMES = ("https://", "http://", "s3://", "gcs://", "gs://")


def detect_format(path: str) -> str | None:
    name = path.lower().rstrip("/")
    parts = name.rsplit("/", 1)[-1].split(".")
    for ext in reversed(parts[1:]):  # skip compression suffixes (x.zstd.parquet)
        if ext in FORMATS:
            return ext
    return None


def _fetch_https(url: str) -> str:
    """Driver-side download fallback for https tables whose server does
    not honor byte ranges (no Accept-Ranges / no Content-Length). The
    primary path is the executor-side ranged scan in http_scan.py."""
    suffix = "." + url.rsplit(".", 1)[-1] if "." in url.rsplit("/", 1)[-1] else ""
    fd, local = tempfile.mkstemp(prefix="uq_https_", suffix=suffix)
    os.close(fd)
    urllib.request.urlretrieve(url, local)  # noqa: S310
    return local


# Excel parses natively with no jar: .xlsx via zip+XML (sources/excel.py)
# and legacy .xls via OLE2+BIFF8 (sources/xls.py).
def resolve_path(
    spark: SparkSession,
    path: str,
    fmt: str | None = None,
    options: dict[str, str] | None = None,
) -> DataFrame:
    """Load `path` (local file/dir or URL) as a DataFrame."""
    ext = fmt or detect_format(path)
    tail = path.lower().rstrip("/").rsplit(".", 1)[-1]
    # tail keeps glob metachars so "*.xls*" (mixed-format dirs) routes here
    if (ext is None and tail.rstrip("*?") in ("xlsx", "xls")) or ext in ("xlsx", "xls"):
        from .excel import scan_excel

        return scan_excel(spark, path, options or {})
    if ext in ("text", "blob"):
        # read_text / read_blob TVFs (DuckDB schema: filename, content,
        # size, last_modified) → Spark's binaryFile source, which
        # distributes whole-file reads across executors and supports
        # globs. filename drops the file: URI scheme to match DuckDB's
        # raw-path output; last_modified is session-tz (width deviation,
        # like to_timestamp).
        from pyspark.sql import functions as F

        df = spark.read.format("binaryFile").load(path)
        content = (
            F.decode(F.col("content"), "UTF-8")
            if ext == "text"
            else F.col("content")
        )
        return df.select(
            F.regexp_replace(F.col("path"), "^file:", "").alias("filename"),
            content.alias("content"),
            F.col("length").alias("size"),
            F.col("modificationTime").alias("last_modified"),
        )
    if ext is None or ext not in FORMATS:
        raise UQueryError.sql_error(f"cannot infer table format for path: {path}")
    spark_fmt, defaults = FORMATS[ext]

    merged = {**defaults, **(options or {})}
    target = path
    if path.startswith(("https://", "http://")):
        # executor-side ranged scan (reference: httpfs ranged GETs);
        # driver download only when the server can't serve ranges
        from .http_scan import scan_http

        try:
            df = scan_http(spark, path, ext, merged)
        except Exception as e:
            raise UQueryError.sql_error(
                f"cannot read {path}: {str(e).splitlines()[0][:300]}"
            ) from e
        if df is not None:
            return df
        target = _fetch_https(path)
    elif path.startswith("s3://"):
        target = "s3a://" + path[len("s3://"):]
    elif path.startswith("gcs://"):
        target = "gs://" + path[len("gcs://"):]

    reader = spark.read
    for k, v in merged.items():
        reader = reader.option(k, v)
    try:
        return reader.format(spark_fmt).load(target)
    except Exception as e:
        raise UQueryError.sql_error(f"cannot read {path}: {str(e).splitlines()[0][:300]}") from e
