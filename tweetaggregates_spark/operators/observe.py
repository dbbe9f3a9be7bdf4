"""Observed filtering: drop rows AND account for the drops in the same
pass, via Spark's Observation API — no second scan, no extra action.

A curation pipeline that filters 100 TB cannot afford a separate
count() per stage to know what each stage discarded; Observation
attaches accumulator-style metrics to the plan itself, so the audit
numbers materialize as a side effect of whatever action the query
already runs. (The streaming pipeline gets the equivalent numbers from
its StreamingQueryListener, streaming/metrics.py.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


def filter_with_audit(
    df: DataFrame, cond: Column, name: str = "filter_audit"
) -> tuple[DataFrame, Observation]:
    """Filter ``df`` by ``cond``, observing (n_input, n_kept, n_dropped)
    in the same pass. Returns (filtered_df, observation); read
    ``observation.get`` AFTER an action has run on the filtered frame.
    """
    obs = Observation(name)
    observed = df.observe(
        obs,
        F.count(F.lit(1)).alias("n_input"),
        F.sum(F.when(cond, 1).otherwise(0)).alias("n_kept"),
        F.sum(F.when(cond, 0).otherwise(1)).alias("n_dropped"),
    )
    return observed.filter(cond), obs
