from sparklead.streaming.pipeline import (
    load_latest_drain_templates,
    stream_dedup,
    stream_drain_templates,
    stream_route,
    stream_running_source_stats,
    stream_window_counts,
)

__all__ = [
    "load_latest_drain_templates",
    "stream_dedup",
    "stream_drain_templates",
    "stream_route",
    "stream_running_source_stats",
    "stream_window_counts",
]
