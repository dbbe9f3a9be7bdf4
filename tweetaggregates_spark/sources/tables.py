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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    # Runtime-settable; required for any session (incl. the driver's) to
    # read the nanos-timestamp testdata at all.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for c in _nanos_timestamp_cols(path):
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}
