from sparklead.streaming.pipeline import (
    stream_dedup,
    stream_route,
    stream_running_source_stats,
    stream_window_counts,
)

__all__ = ["stream_dedup", "stream_route", "stream_running_source_stats", "stream_window_counts"]
