"""Plan-shape contracts for the round-2 TPC-H additions (plans/star.py).

Correctness of values is covered by the oracle pairs in
__spark_entry__; these tests pin the PHYSICAL properties that make the
queries scale — which side broadcasts, what reaches the scan, and that
no accidental cartesian appears.
"""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_q7_broadcasts_all_dims(spark):
    """Q7's four dimension copies (supplier, customer, nation x2) must
    broadcast — the only shuffle exchange belongs to the fact-fact join
    and the final aggregate."""
    from tweetaggregates_spark.plans import star

    plan = _plan(star.q7_nation_volume(spark, SF))
    assert plan.count("BroadcastHashJoin") >= 4
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q15_scalar_max_broadcasts(spark):
    """Q15's global-max comparison must be a broadcast of the 1-row
    scalar, not a single-partition window over the aggregate."""
    from tweetaggregates_spark.plans import star

    plan = _plan(star.q15_top_supplier(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "Window" not in plan


def test_q17_per_part_agg_broadcasts_back(spark):
    """Q17's decorrelated per-part aggregate must broadcast back onto
    the brand's lineitems (both sides are brand-filtered first)."""
    from tweetaggregates_spark.plans import star

    plan = _plan(star.q17_small_quantity_revenue(spark, SF))
    assert plan.count("BroadcastHashJoin") >= 2
    # brand filter reaches the part scan
    assert "Brand#1" in plan


def test_q13_left_join_keeps_condition_in_join(spark):
    """Q13 keeps the priority exclusion inside the outer join (filter
    sits on the orders scan side), so zero-order customers survive."""
    from tweetaggregates_spark.plans import star

    df = star.q13_order_count_distribution(spark, SF)
    plan = _plan(df)
    assert "LeftOuter" in plan
    # zero-order customers exist in the result
    assert df.filter("c_count = 0").count() > 0


def test_q21_single_window_pass(spark):
    """Q21 computes the multi-supplier qualifier and the per-order
    argmax in window passes over ONE shuffle by l_orderkey — no
    groupBy-then-join-back on the fact table."""
    from tweetaggregates_spark.plans import star

    plan = _plan(star.q21_last_shipper(spark, SF))
    assert "Window" in plan
    assert "CartesianProduct" not in plan
    # exactly one exchange hashpartitions on l_orderkey
    assert plan.count("hashpartitioning(l_orderkey") == 1
