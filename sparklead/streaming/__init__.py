from sparklead.streaming.pipeline import stream_route, stream_window_counts

__all__ = ["stream_route", "stream_window_counts"]
