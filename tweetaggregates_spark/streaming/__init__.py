from tweetaggregates_spark.streaming.metrics import ThroughputListener
from tweetaggregates_spark.streaming.pipeline import (
    DISORDER_TOLERANCE_SECONDS,
    run_streaming_aggregates,
    run_streaming_aggregates_manual,
)
from tweetaggregates_spark.streaming.stateful import running_entity_totals

__all__ = [
    "DISORDER_TOLERANCE_SECONDS",
    "ThroughputListener",
    "run_streaming_aggregates",
    "run_streaming_aggregates_manual",
    "running_entity_totals",
]
