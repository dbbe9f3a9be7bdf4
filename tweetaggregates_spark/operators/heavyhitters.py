"""Misra-Gries bounded-state heavy hitters (frequency candidates).

`plans/events.py`'s Count-Min family estimates frequencies for a GIVEN
candidate set; at 100 TB the candidate set itself cannot be "all
distinct keys" (that is the exact computation again). Misra-Gries
(Misra & Gries '82; merge analysis in Agarwal et al., "Mergeable
summaries", PODS'12) is the classic bounded-state discovery pass: each
partition keeps at most k counters, merge is counter addition, and any
key with true global count > n/(k+1) is GUARANTEED to survive, with
    est_low <= true <= est_low + err_total
where err_total is the sum of per-partition decrement totals.

Spark shape: one `mapInPandas` over whatever partitioning the scan
produced (MG is partitioning-agnostic), emitting <= k counter rows +
one error-marker row per partition, then a tiny groupBy over <= k x
n_partitions rows and a broadcast of the 1-row global error. No
shuffle touches raw events — the only full-data pass is the map.

Determinism note: the surviving CANDIDATE SET depends on partition
boundaries (any MG deployment's does), so this operator is pinned by
its mathematical guarantees in tests/test_heavyhitters.py rather than
a cross-engine oracle; the oracle-checked face of frequency sketching
is the CMS family, which consumes candidates like these at scale.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_partial(key_col: str, k: int):
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        err = 0
        for pdf in batches:
            for key, cnt in pdf[key_col].value_counts().items():
                counters[key] = counters.get(key, 0) + int(cnt)
            if len(counters) > k:
                # batched MG decrement: subtract the (k+1)-th largest
                # value from every counter, drop the non-positive —
                # size is back to <= k, error grows by delta
                delta = sorted(counters.values(), reverse=True)[k]
                counters = {
                    key: c - delta for key, c in counters.items() if c > delta
                }
                err += delta
        out = pd.DataFrame(
            {
                key_col: list(counters.keys()),
                "cnt": list(counters.values()),
                "err": [0] * len(counters),
            }
        )
        marker = pd.DataFrame({key_col: [None], "cnt": [0], "err": [err]})
        yield pd.concat([out, marker], ignore_index=True)

    return fn


def heavy_hitter_candidates(
    df: DataFrame, key_col: str, k: int = 256
) -> DataFrame:
    """<= k x n_partitions candidate keys with frequency bounds:
    (key, est_low, est_high) where est_low <= true count <= est_high
    and every key with true count > n/(k+1) is present."""
    from pyspark.sql.types import LongType, StructField, StructType

    # key column keeps its source type (string/int/...): the marker row's
    # None key is representable in any nullable Spark type
    schema = StructType(
        [
            StructField(key_col, df.schema[key_col].dataType, True),
            StructField("cnt", LongType(), True),
            StructField("err", LongType(), True),
        ]
    )
    partials = df.select(key_col).mapInPandas(_mg_partial(key_col, k), schema)
    # tiny: k counters + 1 marker per partition
    err_total = partials.agg(F.sum("err").alias("err_total"))
    cand = (
        partials.filter(F.col(key_col).isNotNull())
        .groupBy(key_col)
        .agg(F.sum("cnt").alias("est_low"))
    )
    return cand.crossJoin(F.broadcast(err_total)).select(
        key_col,
        "est_low",
        (F.col("est_low") + F.col("err_total")).alias("est_high"),
    )
