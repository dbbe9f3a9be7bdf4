from tweetaggregates_spark.operators import aggregate, project, topk, window

__all__ = ["aggregate", "project", "topk", "window"]
