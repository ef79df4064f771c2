"""HTTP service layer — the reference's observable contract.

POST / (SQL in, negotiated format out, streamed) + GET /health, problem+
json errors, first-batch timeout, gzip, opt-in CORS
(reference: src/web/routers.rs).
"""

from .app import ServiceConfig, UQueryHandler, make_server  # noqa: F401
from .negotiate import first_compatible_format  # noqa: F401
