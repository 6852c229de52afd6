"""Structured Streaming layer (SURVEY.md §2.9).

The reference is strictly batch; this package is the engine's streaming
extension over events-shaped data: watermarked tumbling/sliding/session
windows, streaming dedup, and rate/file sources. Every transformation is
expressed so the SAME function works on a batch DataFrame and a
streaming one (the unified DataFrame API) — tests assert
batch/stream equivalence on one file-source trigger.
"""

from .joins import interval_join, view_click_attribution  # noqa: F401
from .windows import (  # noqa: F401
    session_window_agg,
    sliding_window_agg,
    streaming_dedup,
    tumbling_window_agg,
)
