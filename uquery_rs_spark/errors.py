"""RFC-7807 problem+json error envelope.

Mirrors the reference's UQueryError: {"status": u16, "title": str,
"detail": str} serialized as application/problem+json (reference:
src/core/error.rs:4-22, src/web/response.rs:27-40).
"""

from __future__ import annotations

import json

PROBLEM_JSON = "application/problem+json"


class UQueryError(Exception):
    def __init__(self, status: int, title: str, detail: str):
        super().__init__(f"{status} {title}: {detail}")
        self.status = status
        self.title = title
        self.detail = detail

    def to_json(self) -> bytes:
        return json.dumps(
            {"status": self.status, "title": self.title, "detail": self.detail}
        ).encode()

    # canonical constructors (titles match the reference byte-for-byte)

    @classmethod
    def sql_error(cls, detail: str) -> "UQueryError":
        return cls(400, "SQL Error", detail)  # routers.rs:171

    @classmethod
    def invalid_json(cls, detail: str) -> "UQueryError":
        return cls(400, "Invalid JSON", detail)  # request.rs:49

    @classmethod
    def invalid_utf8(cls, detail: str) -> "UQueryError":
        return cls(400, "Invalid UTF-8", detail)  # request.rs:60

    @classmethod
    def body_too_large(cls, detail: str) -> "UQueryError":
        return cls(400, "Failed to read request body", detail)  # request.rs:43

    @classmethod
    def not_acceptable(cls, accept: str) -> "UQueryError":
        return cls(
            406,
            "Unsupported response format",
            f"format [{accept}] is not supported",  # routers.rs:91-103
        )

    @classmethod
    def query_timeout(cls, timeout_secs: float) -> "UQueryError":
        return cls(408, "Query Timeout", f"no result within {timeout_secs}s")  # routers.rs:158

    @classmethod
    def internal(cls, detail: str) -> "UQueryError":
        return cls(500, "Internal Error", detail)  # routers.rs:176
