"""Runtime bloom-filter join pruning (plan-shape pin).

At 100 TB the classic fact-to-filtered-fact join (lineitem x urgent
orders) reads the full probe side unless something pushes the join's
selectivity into the scan. Spark's InjectRuntimeFilter does exactly
that: build a bloom filter over the filtered build side's join keys,
apply `might_contain` on the probe side BEFORE the shuffle — rows that
cannot join are dropped at the scan, shrinking the big side's exchange
by the build side's selectivity.

These tests pin (a) that injection actually fires for our join shape
once the size thresholds match the data (the defaults — 10 GB probe
scan — are tuned for real clusters, so tests lower them, production
keeps them), and (b) the documented gotcha that an extra exchange
(e.g. `spread()`'s repartition) between scan and join defeats the
rewrite — at scale `spread()` is a no-op, so the production plan keeps
the filter.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tweetaggregates_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture()
def bloom_confs(spark):
    keys = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    }
    saved = {k: spark.conf.get(k) for k in keys}
    for k, v in keys.items():
        spark.conf.set(k, v)
    yield
    for k, v in saved.items():
        spark.conf.set(k, v)


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_runtime_bloom_filter_injected(spark, bloom_confs):
    orders = load_table(spark, SF_DIR, "orders", parallelize=False).filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    li = load_table(spark, SF_DIR, "lineitem", parallelize=False)
    j = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    plan = _optimized(j)
    assert "bloom_filter_agg" in plan and "might_contain" in plan
    # and the filtered plan still returns the right answer
    expected = (
        load_table(spark, SF_DIR, "lineitem", parallelize=False)
        .join(
            load_table(spark, SF_DIR, "orders", parallelize=False),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .count()
    )
    got = j.collect()
    assert got[0].cnt == expected


def test_build_side_exchange_defeats_injection(spark, bloom_confs):
    """The documented caveat: an exchange on the CREATION (build) side
    between scan and join blocks InjectRuntimeFilter's pattern match —
    the filtered dimension must be a plain scan+filter subtree. A
    probe-side repartition is harmless (also pinned). `spread()` only
    repartitions fact tables at toy scale and is a no-op at real scale,
    but any future eager repartition of a filtered build side would
    silently turn the runtime filter off — this test makes that loud."""
    def shape(build_extra, probe_extra):
        orders = load_table(spark, SF_DIR, "orders", parallelize=False)
        orders = build_extra(orders).filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        li = probe_extra(load_table(spark, SF_DIR, "lineitem", parallelize=False))
        j = li.join(orders, li.l_orderkey == orders.o_orderkey).groupBy(
            "o_orderpriority"
        ).agg(F.count(F.lit(1)).alias("cnt"))
        return _optimized(j)

    ident = lambda df: df
    repart = lambda df: df.repartition(64)
    assert "might_contain" in shape(ident, repart)  # probe side: harmless
    assert "might_contain" not in shape(repart, ident)  # build side: blocks
