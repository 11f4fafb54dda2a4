from sparklead.enhancers.eventlog import (
    EventLogEnhancer,
    alphanumerics,
    event_id,
    item_cumsum,
    length,
    normalize,
    trigrams,
    words,
)
from sparklead.enhancers.sequence import SequenceEnhancer, aggregate_sequences

__all__ = [
    "EventLogEnhancer",
    "SequenceEnhancer",
    "aggregate_sequences",
    "alphanumerics",
    "event_id",
    "item_cumsum",
    "length",
    "normalize",
    "trigrams",
    "words",
]
