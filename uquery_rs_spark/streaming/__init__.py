"""Structured Streaming operators.

The reference needs none of this for parity — its "streaming" is
incremental HTTP result delivery (SURVEY.md §2.B.10). These are the
forward-looking stream-processing twins of the batch event analytics:
file-source streams, watermarked windowed aggregation, session windows,
and a custom stateful operator via applyInPandasWithState.
"""

from .jobs import (  # noqa: F401
    run_sessionized_stream,
    run_stateful_user_counter,
    run_tumbling_stream,
    streaming_events,
)
