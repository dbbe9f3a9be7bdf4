"""Loaders for the driver testdata star schema (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet file each under an sf dir.

The testdata parquet uses TIMESTAMP(NANOS), which Spark's vectorized
reader rejects; with ``spark.sql.legacy.parquet.nanosAsLong=true`` those
columns arrive as LongType nanos. ``load_table`` inspects the parquet
footer (driver-side, via pyarrow — cheap: footer only) and converts each
``timestamp[ns]`` column back to TimestampType. Sub-microsecond parts in
the testdata are zero, so ``div 1000`` is lossless.
"""

from __future__ import annotations

import os
from functools import lru_cache

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


@lru_cache(maxsize=128)
def _nanos_timestamp_cols(path: str) -> tuple[str, ...]:
    import pyarrow.parquet as pq

    schema = pq.read_schema(path)
    out = []
    for field in schema:
        t = field.type
        if str(t).startswith("timestamp[ns"):
            out.append(field.name)
    return tuple(out)


def spread(df: DataFrame) -> DataFrame:
    """Repartition up to the cluster's parallelism when the source scan
    yields too few partitions to keep every core busy.

    The testdata is one single-row-group parquet file per table, so the
    scan produces 1-3 partitions and every map-side operator (shingle
    explode, hashing, window expansion) would run near-serially — 10x
    slower on local[32]. The condition makes this a NO-OP at real scale:
    a 100 TB table already scans as thousands of partitions, and an
    unconditional repartition there would be a catastrophic extra
    shuffle."""
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() * 2 <= target:
        return df.repartition(target)
    return df


# Tables with enough rows/compute to be worth spreading; dimension
# tables stay as-is — they broadcast in joins, and a repartition
# exchange ahead of a BroadcastExchange is pure waste.
_SPREAD_TABLES = frozenset(
    {"lineitem", "orders", "events", "documents", "embeddings"}
)


def load_table(
    spark: SparkSession, sf_dir: str, name: str, parallelize: bool | None = None
) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    # Runtime-settable; required for any session (incl. the driver's) to
    # read the nanos-timestamp testdata at all.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for c in _nanos_timestamp_cols(path):
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    if parallelize is None:
        parallelize = name in _SPREAD_TABLES
    return spread(df) if parallelize else df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}
