from .incremental import (
    IncrementalNearDup,
    streaming_event_window_counts,
    streaming_signatures,
)

__all__ = [
    "IncrementalNearDup",
    "streaming_event_window_counts",
    "streaming_signatures",
]
