"""The HTTP service: stdlib ThreadingHTTPServer implementation of the
reference's axum router (src/web/routers.rs).

Per-request pipeline (reference §3.1, re-expressed):
  parse body (≤256 KiB; JSON {"query"} or raw SQL)        request.rs:23-67
  → negotiate Accept (406 on no match)                    routers.rs:91-104
  → engine.prepare (blocks on pool permit)                duckdb.rs:31-39
  → worker thread executes into format writer             routers.rs:114-148
  → wait first batch with timeout: 408 / pre-stream error: 400
                                                          routers.rs:153-182
  → stream 200 chunked (gzip if requested), bounded queue routers.rs:108,184
"""

from __future__ import annotations

import json
import queue
import threading
import zlib
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pyarrow as pa

from ..engine import Engine, RecordBatchConsumer
from ..errors import PROBLEM_JSON, UQueryError
from ..writers import writer_for_format
from .negotiate import first_compatible_format

MAX_BODY_BYTES = 256 * 1024  # request.rs:41
QUEUE_CHUNKS = 64  # bounded backpressure buffer (≈ the 1 MiB duplex pipe)

_SENTINEL = object()


class _QueueSink:
    """write(bytes) → bounded chunk queue (worker side of the pipe).

    Implements the minimal file-object protocol pyarrow's IPC writer
    probes (`closed`, `flush`, `writable`).
    """

    closed = False

    def __init__(self) -> None:
        self.chunks: queue.Queue = queue.Queue(maxsize=QUEUE_CHUNKS)

    def write(self, data: bytes) -> int:
        if data:
            self.chunks.put(bytes(data))
        return len(data)

    def flush(self) -> None:
        pass

    def writable(self) -> bool:
        return True

    def seekable(self) -> bool:
        return False

    def close(self) -> None:
        self.chunks.put(_SENTINEL)


class _FirstBatchNotifier(RecordBatchConsumer):
    """Fires `ready` on the first batch — or on finish for empty results,
    or with an error before any batch (reference routers.rs:34-58)."""

    def __init__(self, inner: RecordBatchConsumer):
        self.inner = inner
        self.ready = threading.Event()
        self.error: UQueryError | None = None
        self._streaming = False

    def on_schema(self, schema: pa.Schema) -> None:
        self.inner.on_schema(schema)

    def on_batch(self, batch: pa.RecordBatch) -> None:
        self.inner.on_batch(batch)
        self._streaming = True
        self.ready.set()

    def batch_bytes_serializer(self, schema: pa.Schema):
        """Forward the engine's serialized fast path to the wrapped writer
        (None → engine falls back to the Arrow-batch path)."""
        f = getattr(self.inner, "batch_bytes_serializer", None)
        return f(schema) if f is not None else None

    def on_batch_bytes(self, payload: bytes) -> None:
        self.inner.on_batch_bytes(payload)
        self._streaming = True
        self.ready.set()

    def finish(self) -> None:
        self.inner.finish()
        self.ready.set()

    def fail(self, err: UQueryError) -> None:
        if not self._streaming:
            self.error = err
        self.ready.set()


class ServiceConfig:
    def __init__(
        self,
        engine: Engine,
        query_timeout_secs: float | None = 30.0,
        cors_enabled: bool = False,
    ):
        self.engine = engine
        # reference: 0 disables the timeout (options.rs:104-106)
        self.query_timeout = query_timeout_secs if query_timeout_secs else None
        self.cors_enabled = cors_enabled


class UQueryHandler(BaseHTTPRequestHandler):
    protocol_version = "HTTP/1.1"
    config: ServiceConfig  # injected by make_server

    # -- plumbing ---------------------------------------------------------

    def log_message(self, fmt, *args):  # quiet; reference logs at debug
        pass

    def _cors_headers(self) -> None:
        if self.config.cors_enabled:
            self.send_header("Access-Control-Allow-Origin", "*")
            self.send_header("Access-Control-Allow-Methods", "*")
            self.send_header("Access-Control-Allow-Headers", "*")

    def _send_problem(self, err: UQueryError) -> None:
        body = err.to_json()
        self.send_response(err.status)
        self.send_header("Content-Type", PROBLEM_JSON)
        self.send_header("Content-Length", str(len(body)))
        self._cors_headers()
        self.end_headers()
        self.wfile.write(body)

    # -- routes -----------------------------------------------------------

    def do_GET(self) -> None:
        if self.path == "/health":  # routers.rs:75
            self.send_response(200)
            self.send_header("Content-Length", "0")
            self._cors_headers()
            self.end_headers()
        else:
            self._send_problem(UQueryError(404, "Not Found", self.path))

    def do_OPTIONS(self) -> None:  # CORS preflight (main.rs:261-287)
        self.send_response(200)
        self._cors_headers()
        self.send_header("Content-Length", "0")
        self.end_headers()

    def do_POST(self) -> None:
        try:
            sql = self._read_sql()
            fmt = first_compatible_format(self.headers.get("Accept"))
            if fmt is None:
                raise UQueryError.not_acceptable(self.headers.get("Accept", "").lower())
            self._run_query(sql, *fmt)
        except UQueryError as e:
            self._send_problem(e)
        except (BrokenPipeError, ConnectionResetError):
            pass
        except Exception as e:  # noqa: BLE001
            self._send_problem(UQueryError.internal(str(e)[:300]))

    # -- request parsing (request.rs:23-67) -------------------------------

    def _read_sql(self) -> str:
        length = int(self.headers.get("Content-Length", 0))
        if length > MAX_BODY_BYTES:
            raise UQueryError.body_too_large(f"length limit exceeded ({length} > {MAX_BODY_BYTES})")
        body = self.rfile.read(length)
        ctype = self.headers.get("Content-Type", "")
        if "application/json" in ctype:
            try:
                payload = json.loads(body)
                return str(payload["query"])
            except (json.JSONDecodeError, KeyError, TypeError) as e:
                raise UQueryError.invalid_json(str(e)) from e
        try:
            return body.decode("utf-8")
        except UnicodeDecodeError as e:
            raise UQueryError.invalid_utf8(str(e)) from e

    # -- execution + streaming -------------------------------------------

    def _run_query(self, sql: str, fmt_key: str, content_type: str) -> None:
        cfg = self.config
        prepared = cfg.engine.prepare(sql)
        sink = _QueueSink()
        notifier = _FirstBatchNotifier(writer_for_format(fmt_key, sink))

        def work() -> None:
            try:
                prepared.execute(notifier)
            except UQueryError as e:
                notifier.fail(e)
            except Exception as e:  # noqa: BLE001
                notifier.fail(UQueryError.internal(str(e)[:300]))
            finally:
                sink.close()

        threading.Thread(target=work, daemon=True, name=f"uq-exec-{prepared.job_group}").start()

        if not notifier.ready.wait(cfg.query_timeout):
            prepared.cancel()  # job-group interrupt replaces Drop-based release
            raise UQueryError.query_timeout(cfg.query_timeout)
        if notifier.error is not None:
            raise notifier.error

        gzip_out = "gzip" in self.headers.get("Accept-Encoding", "")
        self.send_response(200)
        self.send_header("Content-Type", content_type)
        if gzip_out:
            self.send_header("Content-Encoding", "gzip")
        self.send_header("Transfer-Encoding", "chunked")
        self._cors_headers()
        self.end_headers()

        compressor = zlib.compressobj(wbits=31) if gzip_out else None
        try:
            while True:
                chunk = sink.chunks.get()
                if chunk is _SENTINEL:
                    break
                if compressor is not None:
                    chunk = compressor.compress(chunk)
                self._write_chunk(chunk)
            if compressor is not None:
                self._write_chunk(compressor.flush())
            self.wfile.write(b"0\r\n\r\n")
        except (BrokenPipeError, ConnectionResetError):
            prepared.cancel()  # client went away mid-stream

    def _write_chunk(self, data: bytes) -> None:
        if data:
            self.wfile.write(f"{len(data):x}\r\n".encode() + data + b"\r\n")


def make_server(host: str, port: int, config: ServiceConfig) -> ThreadingHTTPServer:
    handler = type("BoundHandler", (UQueryHandler,), {"config": config})
    return ThreadingHTTPServer((host, port), handler)
