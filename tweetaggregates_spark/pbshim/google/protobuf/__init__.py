"""Minimal pure-Python protobuf runtime (shim) — see
tweetaggregates_spark.pbshim for scope and activation rules."""

__version__ = "0.0.0-shim"
