from sparklead.sources.raw import (
    backward_fill_timestamps,
    extract_seq_id,
    load_text,
    merge_multiline,
    parse_timestamp,
    split_and_unnest,
)
from sparklead.sources.hdfs import load_hdfs_events, attach_labels

__all__ = [
    "attach_labels",
    "backward_fill_timestamps",
    "extract_seq_id",
    "load_hdfs_events",
    "load_text",
    "merge_multiline",
    "parse_timestamp",
    "split_and_unnest",
]
