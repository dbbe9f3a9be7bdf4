"""tweetaggregates_spark — a PySpark-native analytics engine with the
query surface of vigneshc/TweetAggregates (reference blueprint: SURVEY.md).

Layout:
  session      — SparkSession factory with scale-aware defaults
  schema       — input / canonical / output StructTypes (SURVEY §1)
  sources/     — tweet NDJSON/parquet readers, testdata table loaders (§2.1)
  functions/   — scalar helpers (§2.7), vector math, portable hashing
  operators/   — projections, windows, aggregations, top-k, dedup,
                 similarity, text analysis, multimodal plumbing (§2.2-2.6)
  plans/       — end-to-end query compositions (tweet pipeline, star
                 schema, LLM-data-pipeline)
  store        — aggregate table sink + REPL query surface (§2.8)
  streaming/   — Structured Streaming wrapper (watermark + foreachBatch),
                 streaming near-dup / ANN-index ingest loops
  pbshim/      — pure-Python google.protobuf wire-format fallback
                 (transformWithState state-server protocol; activate
                 with pbshim.ensure_protobuf() before the session)
"""

__version__ = "0.1.0"
