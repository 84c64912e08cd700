from .windows import session_agg_stream, windowed_agg_stream
from .dedup import streaming_dedup
from .source import events_stream

__all__ = [
    "windowed_agg_stream",
    "session_agg_stream",
    "streaming_dedup",
    "events_stream",
]
