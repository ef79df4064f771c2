"""Streaming result writers: Arrow batches → response bytes.

Four formats, mirroring the reference's consumers (src/web/consumers.rs,
src/web/routers.rs:137-148): JSON array, JSON Lines, CSV-with-header-once,
Arrow IPC stream. Each implements RecordBatchConsumer and writes
incrementally into any `write(bytes)` sink — a socket, a gzip wrapper, a
buffer — so server memory stays flat regardless of result size
(reference docs/docs/response-formats.md:97-104).
"""

from .consumers import (  # noqa: F401
    ArrowIpcWriter,
    CsvWriter,
    JsonArrayWriter,
    JsonLinesWriter,
    writer_for_format,
)
