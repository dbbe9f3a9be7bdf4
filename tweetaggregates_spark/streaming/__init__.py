from tweetaggregates_spark.streaming.metrics import ThroughputListener
from tweetaggregates_spark.streaming.pipeline import (
    DISORDER_TOLERANCE_SECONDS,
    run_streaming_aggregates,
)
from tweetaggregates_spark.streaming.stateful import running_entity_totals

__all__ = [
    "DISORDER_TOLERANCE_SECONDS",
    "ThroughputListener",
    "run_streaming_aggregates",
    "running_entity_totals",
]
