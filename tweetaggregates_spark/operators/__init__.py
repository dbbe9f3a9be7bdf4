from tweetaggregates_spark.operators import (
    aggregate,
    dedup,
    multimodal,
    project,
    similarity,
    text,
    topk,
    window,
)

__all__ = [
    "aggregate",
    "dedup",
    "multimodal",
    "project",
    "similarity",
    "text",
    "topk",
    "window",
]
