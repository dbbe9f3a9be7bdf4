"""Table profiling: per-column null / distinct / min / max statistics
in ONE pass over the table — the data-quality reconnaissance every
pipeline runs before trusting a new drop (schema drift, null storms,
cardinality explosions, out-of-range values).

One wide aggregate row (5 aggregates per column, all partial-aggregated
map-side) rotated into long (column, stats) form AFTER the aggregate —
the rotation touches |columns| rows, never the table. countDistinct is
exact here (one expand per column); swap in approx_count_distinct for
the 100 TB profile where +-2% is acceptable and the expand is not.

Numeric and timestamp columns report min/max as doubles (timestamps as
epoch seconds — NTZ-safe); string columns report lexicographic min/max.
Every emitted value is engine-portable: counts are exact integers,
numeric bounds are exact values already present in the data (no
aggregation arithmetic), so the DuckDB oracle reproduces the profile
bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_NUMERIC = {"tinyint", "smallint", "int", "bigint", "float", "double"}


def profile_table(df: DataFrame) -> DataFrame:
    """Profile every column of ``df``: (column, dtype, n_rows, n_nulls,
    n_distinct, min_num, max_num, min_str, max_str)."""
    aggs = [F.count(F.lit(1)).alias("__n_rows")]
    for name, dtype in df.dtypes:
        c = F.col(name)
        if dtype in _NUMERIC:
            num = c.cast("double")
        elif dtype.startswith("timestamp"):
            num = F.expr(
                "timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00',"
                f" cast(`{name}` as timestamp_ntz))"
            ).cast("double")
        else:
            num = F.lit(None).cast("double")
        s = c.cast("string") if dtype == "string" else F.lit(None).cast("string")
        aggs += [
            F.sum(F.when(c.isNull(), 1).otherwise(0)).alias(f"__nn_{name}"),
            F.countDistinct(c).alias(f"__nd_{name}"),
            F.min(num).alias(f"__mn_{name}"),
            F.max(num).alias(f"__mx_{name}"),
            F.min(s).alias(f"__ms_{name}"),
            F.max(s).alias(f"__xs_{name}"),
        ]
    wide = df.agg(*aggs)
    structs = [
        F.struct(
            F.lit(name).alias("column"),
            F.lit(dtype).alias("dtype"),
            F.col("__n_rows").alias("n_rows"),
            F.col(f"__nn_{name}").alias("n_nulls"),
            F.col(f"__nd_{name}").alias("n_distinct"),
            F.col(f"__mn_{name}").alias("min_num"),
            F.col(f"__mx_{name}").alias("max_num"),
            F.col(f"__ms_{name}").alias("min_str"),
            F.col(f"__xs_{name}").alias("max_str"),
        )
        for name, dtype in df.dtypes
    ]
    return wide.select(F.explode(F.array(*structs)).alias("p")).select("p.*")
