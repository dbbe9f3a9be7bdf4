from tweetaggregates_spark.functions.hashing import hash64, seeded_hash64
from tweetaggregates_spark.functions.textstats import tokens, word_shingles
from tweetaggregates_spark.functions.vectors import cosine_sim, dot, norm

__all__ = [
    "hash64",
    "seeded_hash64",
    "tokens",
    "word_shingles",
    "cosine_sim",
    "dot",
    "norm",
]
