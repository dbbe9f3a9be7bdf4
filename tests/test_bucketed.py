"""Bucketed co-located join: after the one-time bucketed write, the
orders <-> lineitem equi-join must plan with NO Exchange on either side
— the write-side layout replaces the per-query shuffle (the 100 TB
fact-fact join posture in SCALE.md)."""

from __future__ import annotations

import contextlib
import io
import uuid

from pyspark.sql import functions as F

from tweetaggregates_spark.sources.bucketed import bucketed, write_bucketed
from tweetaggregates_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_has_no_exchange(spark):
    suffix = uuid.uuid4().hex[:8]
    t_orders, t_li = f"b_orders_{suffix}", f"b_li_{suffix}"
    write_bucketed(
        load_table(spark, SF, "orders"), t_orders, "o_orderkey", 8
    )
    write_bucketed(
        load_table(spark, SF, "lineitem"), t_li, "l_orderkey", 8
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force the shuffle-join path so the assertion is about
        # bucketing, not about broadcast hiding the exchange
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = (
            bucketed(spark, t_orders)
            .join(
                bucketed(spark, t_li),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = _plan(joined)
        join_section = plan.split("HashAggregate")[0]
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert "Exchange" not in join_section  # scans satisfy distribution
        # and the result is right: equals the unbucketed join
        want = {
            (r["o_orderpriority"], r["n"])
            for r in load_table(spark, SF, "orders")
            .join(
                load_table(spark, SF, "lineitem"),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        got = {(r["o_orderpriority"], r["n"]) for r in joined.collect()}
        assert got == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql(f"DROP TABLE IF EXISTS {t_orders}")
        spark.sql(f"DROP TABLE IF EXISTS {t_li}")
