"""Engine facade: prepare/execute over one shared SparkSession.

Mirrors the reference's core dataflow contract (src/core/engine.rs:4-19):

    trait RecordBatchConsumer { on_schema; on_batch; finish }
    UQueryEngine::prepare(sql) -> ExecutableQuery
    ExecutableQuery::execute(&mut consumer)

Reference concurrency = a pool of N cloned DuckDB connections with a
condvar queue (src/core/duckdb.rs:9-45). Spark needs no per-connection
state — the scheduler multiplexes jobs — so the pool becomes a semaphore
bounding concurrent queries on one session (FAIR scheduler), and `Drop`-
based connection release becomes a context-managed permit.

Streaming: the reference pulls Arrow batches one at a time with bounded
memory (duckdb.rs:91-93). Here execute() walks toLocalIterator(
prefetchPartitions=True) — Spark runs partitions incrementally, the
driver holds one partition of rows at a time — and re-batches into Arrow
RecordBatches. Cancellation: every execution runs in a job group so a
timeout or client disconnect can cancelJobGroup mid-scan.
"""

from __future__ import annotations

import itertools
import threading
import uuid
from abc import ABC, abstractmethod

import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession

from .errors import UQueryError

DEFAULT_BATCH_ROWS = 8192


def _first_line(e: Exception) -> str:
    lines = [ln for ln in str(e).splitlines() if ln.strip()]
    return (lines[0] if lines else repr(e))[:500]


class RecordBatchConsumer(ABC):
    """Sink interface — schema once, then batches, then finish
    (reference: src/core/engine.rs:4-8)."""

    @abstractmethod
    def on_schema(self, schema: pa.Schema) -> None: ...

    @abstractmethod
    def on_batch(self, batch: pa.RecordBatch) -> None: ...

    @abstractmethod
    def finish(self) -> None: ...


def _arrow_schema(df: DataFrame) -> pa.Schema:
    from pyspark.sql.pandas.types import to_arrow_schema

    return to_arrow_schema(df.schema)


class PreparedQuery:
    """A staged query holding a concurrency permit until executed/closed
    (reference ExecutableQuery + Drop-release, duckdb.rs:59-81)."""

    def __init__(self, engine: "Engine", sql: str):
        self._engine = engine
        self._sql = sql
        self.job_group = f"uq-{uuid.uuid4().hex[:12]}"
        self._released = False

    def cancel(self) -> None:
        self._engine.spark.sparkContext.cancelJobGroup(self.job_group)

    def release(self) -> None:
        if not self._released:
            self._released = True
            self._engine._permits.release()

    def dataframe(self) -> DataFrame:
        """Analyze the (rewritten) SQL into a DataFrame — Spark's 'prepare'."""
        sql = self._engine.rewrite(self._sql)
        return self._engine.spark.sql(sql)

    def execute(self, consumer: RecordBatchConsumer, batch_rows: int = DEFAULT_BATCH_ROWS) -> None:
        """Run the query, pushing schema + Arrow batches into `consumer`.

        Raises UQueryError(400 "SQL Error") on analysis/execution failure —
        the web layer converts errors-before-first-batch into HTTP 400
        (reference routers.rs:166-173).
        """
        spark = self._engine.spark
        sc = spark.sparkContext
        try:
            try:
                df = self.dataframe()
                schema = _arrow_schema(df)
            except UQueryError:
                raise
            except Exception as e:  # AnalysisException etc.
                raise UQueryError.sql_error(_first_line(e)) from e
            consumer.on_schema(schema)
            sc.setJobGroup(self.job_group, f"uquery {self.job_group}", interruptOnCancel=True)
            try:
                rows = df.toLocalIterator(prefetchPartitions=True)
                while True:
                    chunk = list(itertools.islice(rows, batch_rows))
                    if not chunk:
                        break
                    batch = pa.RecordBatch.from_pylist(
                        [r.asDict(recursive=True) for r in chunk], schema=schema
                    )
                    consumer.on_batch(batch)
            except UQueryError:
                raise
            except Exception as e:
                raise UQueryError.sql_error(_first_line(e)) from e
            finally:
                sc.setJobGroup("", "")
            consumer.finish()
        finally:
            self.release()


class Engine:
    """prepare/execute facade with bounded concurrency
    (reference UQueryEngine + ConnectionPool; --pool-size → permits)."""

    def __init__(
        self,
        spark: SparkSession,
        pool_size: int = 4,
        rewriter=None,
    ):
        self.spark = spark
        self._permits = threading.Semaphore(pool_size)
        self._rewriter = rewriter

    def rewrite(self, sql: str) -> str:
        return self._rewriter.rewrite(sql) if self._rewriter is not None else sql

    def prepare(self, sql: str) -> PreparedQuery:
        """Stage a query, blocking for a permit if the pool is exhausted
        (reference: condvar wait in duckdb.rs:31-39). SQL parsing is
        deferred to execute() — single prepare (routers.rs:115-116)."""
        self._permits.acquire()
        return PreparedQuery(self, sql)
