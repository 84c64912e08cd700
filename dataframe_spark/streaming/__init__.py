from .windows import session_agg_stream, windowed_agg_stream
from .dedup import streaming_bloom_screen, streaming_dedup
from .drift import psi_by_window, psi_stream, reference_bins
from .heavy import heavy_hitters_batch, heavy_hitters_stream
from .join import enrich_stream, interval_join_streams
from .source import events_stream
from .stateful import running_user_totals

__all__ = [
    "windowed_agg_stream",
    "session_agg_stream",
    "streaming_bloom_screen",
    "streaming_dedup",
    "events_stream",
    "enrich_stream",
    "interval_join_streams",
    "running_user_totals",
    "reference_bins",
    "psi_stream",
    "psi_by_window",
]
