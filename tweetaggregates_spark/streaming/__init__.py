from tweetaggregates_spark.streaming.pipeline import (
    DISORDER_TOLERANCE,
    run_streaming_aggregates,
)

__all__ = ["DISORDER_TOLERANCE", "run_streaming_aggregates"]
