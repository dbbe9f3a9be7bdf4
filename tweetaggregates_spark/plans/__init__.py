from tweetaggregates_spark.plans import events

__all__ = ["events"]
