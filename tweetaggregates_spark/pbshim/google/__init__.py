# namespace holder for the pure-Python protobuf shim (see
# tweetaggregates_spark.pbshim). Real protobuf, when installed, is
# preferred by ensure_protobuf() and this package is never imported.
