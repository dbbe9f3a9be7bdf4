"""As-of (time-travel) join — an operator Spark's API lacks natively,
built scalably from built-ins (no UDF, no cross join).

For each left row, attach the latest right row of the same key with
right_ts <= left_ts (inclusive). Implementation is the classic
union-scan: tag both inputs, sort each key's timeline once, and carry
the last-seen right payload forward with
``last(..., ignoreNulls=True)``:

  union -> Window.partitionBy(key).orderBy(ts, tag) -> filter left

Cost: ONE shuffle+sort on (key, ts) over |L|+|R| rows — contrast with
the naive range-join (L x R per key, quadratic in hot keys). Ties at
equal timestamps resolve right-before-left (tag order), matching the
inclusive >= of DuckDB's native ASOF JOIN, which is the test oracle.

At 100 TB: the single sort-shuffle partitions by key; skewed keys
split fine because the window is a running scan (AQE handles partition
sizing); if the right side is tiny and static, broadcast it and use a
max-by aggregation instead.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_payload: Sequence[str],
    payload_prefix: str = "matched_",
) -> DataFrame:
    """Left as-of join: every left row, plus the most recent right
    payload at-or-before its timestamp (NULLs when none). Right side
    should be pre-deduplicated per (key, right_ts) for determinism."""
    l_tag = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_tag"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_l"),
        F.lit(None)
        .cast(
            "struct<"
            + ",".join(
                f"{c}:{right.schema[c].dataType.simpleString()}"
                for c in [right_ts, *right_payload]
            )
            + ">"
        )
        .alias("_r"),
    )
    r_tag = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_tag"),
        F.lit(None).cast(l_tag.schema["_l"].dataType.simpleString()).alias("_l"),
        F.struct(F.col(right_ts), *[F.col(c) for c in right_payload]).alias("_r"),
    )
    u = l_tag.unionByName(r_tag)
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_t").asc(), F.col("_tag").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.withColumn("_m", F.last("_r", ignorenulls=True).over(w)).filter(
        F.col("_tag") == 1
    )
    out_cols: list[Column] = [F.col(f"_l.{c}").alias(c) for c in left.columns]
    out_cols.append(F.col(f"_m.{right_ts}").alias(f"{payload_prefix}{right_ts}"))
    out_cols += [
        F.col(f"_m.{c}").alias(f"{payload_prefix}{c}") for c in right_payload
    ]
    return carried.select(*out_cols)
