"""SparkSession factory.

Defaults are chosen for the local[32] test harness but the knobs are the
ones that matter on a 1000-executor cluster too: AQE (runtime re-plan,
skew-join splitting, partition coalescing), explicit shuffle parallelism,
Arrow for any pandas exchange, and a broadcast threshold so star-schema
dims broadcast instead of shuffling the fact table.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "tweetaggregates-spark",
    shuffle_partitions: int | None = None,
    master: str | None = None,
) -> SparkSession:
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # AQE: coalesce tiny post-shuffle partitions, split skewed ones,
        # convert to broadcast join at runtime when a side turns out small.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Arrow-batched exchange for the few pandas-UDF operators.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # 64 MB broadcast ceiling: every dim table in the star schema
        # broadcasts; only fact-fact joins shuffle.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Session timezone pinned to UTC so window math matches the oracle.
        .config("spark.sql.session.timeZone", "UTC")
        # The driver testdata parquet stores TIMESTAMP(NANOS) which Spark
        # cannot read natively; read as long and convert in the loader
        # (sources.tables.load_table) — sub-microsecond parts are 0.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Write timestamps as INT64 micros, not legacy INT96: INT96 has
        # no parquet min/max statistics, which would silently disable
        # every footer-stat time-range skip on the store tables.
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()
