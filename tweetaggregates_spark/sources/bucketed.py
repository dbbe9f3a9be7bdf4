"""Bucketed fact tables: co-located joins without a shuffle.

SCALE.md's posture for the orders <-> lineitem fact-fact join is "both
sides bucketed by orderkey in a real deployment". This module is that
deployment path: write once bucketed + sorted on the join key, and
every subsequent equi-join on that key runs with NO Exchange on either
side (the scan itself satisfies the join's distribution requirement —
each task reads matching bucket files from both tables) and no Sort
(sortBy pre-sorts within buckets). At 100 TB this converts the
recurring cost center of the star queries into a one-time write-side
cost, exactly like the reference's RocksDB key layout converts range
queries into sequential scans (RocksDBStore.cs put ordering).

Bucket count guidance: pick so each bucket file lands in the
100-200 MB parquet sweet spot at the target SF; bucket count is fixed
at write time, so size it for the LARGEST table generation expected
(more buckets than executors is fine — tasks process several buckets).

Requires a table catalog (``saveAsTable``): bucketing metadata lives in
the metastore, not in the parquet files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 32,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed + in-bucket-sorted catalog table on
    ``key`` — the write-side half of a shuffle-free equi-join."""
    (
        df.write.mode(mode)
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(table)
    )


def bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read back a bucketed table (plain catalog read — the bucket
    layout rides along via the metastore)."""
    return spark.table(table)
