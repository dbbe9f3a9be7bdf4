"""Round-13 scale probes.

``hop``: plain x10-expansion hopping count vs the pane-decomposed path
(operators/window.hopping_paned) — wall time (median of 3, warm) AND
shuffle-write bytes/records per run, read from the Spark REST API
(stage totals delta around each run). The pane path's claim is a
structural one: the x(size/slide) row expansion applies to aggregated
PANES instead of raw events, so rows entering the x10 explode drop
from |events| to |panes|.

``oph``: the curated near-dup pipeline with the one-permutation
signature (registered, round 13) vs the 16-hash signature it replaced
— median of 3, warm, same session.

Usage: python tools/scale_r13.py [hop|oph] [--sf DIR]
"""

from __future__ import annotations

import json
import statistics
import sys
import time
import urllib.request

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.1"
UI_PORT = 4047


def get_spark_ui():
    return (
        SparkSession.builder.appName("scale_r13")
        .master("local[32]")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", str(UI_PORT))
        .getOrCreate()
    )


def _stage_totals():
    base = f"http://localhost:{UI_PORT}/api/v1"
    apps = json.load(urllib.request.urlopen(f"{base}/applications"))
    appid = apps[0]["id"]
    stages = json.load(
        urllib.request.urlopen(
            f"{base}/applications/{appid}/stages?status=complete"
        )
    )
    return (
        sum(s.get("shuffleWriteBytes", 0) for s in stages),
        sum(s.get("shuffleWriteRecords", 0) for s in stages),
        sum(s.get("inputRecords", 0) for s in stages),
    )


def _timed(fn, runs=3):
    ts = []
    for _ in range(runs):
        t0 = time.monotonic()
        fn()
        ts.append(time.monotonic() - t0)
    return statistics.median(ts)


def probe_hop(sf_dir: str) -> None:
    spark = get_spark_ui()
    spark.sparkContext.setLogLevel("ERROR")
    from tweetaggregates_spark.plans import events as ev

    plain = lambda: ev.hopping_counts(spark, sf_dir).write.format(  # noqa
        "noop"
    ).mode("overwrite").save()
    paned = lambda: ev.hopping_counts_paned(  # noqa
        spark, sf_dir
    ).write.format("noop").mode("overwrite").save()
    # warmup both paths
    plain()
    paned()
    n_events = ev.hopping_counts(spark, sf_dir)  # noqa: F841
    from tweetaggregates_spark.sources.tables import load_table

    events = load_table(spark, sf_dir, "events")
    n = events.count()
    panes = events.select(
        F.window("ts", "1 minute").alias("p")
    ).distinct().count()
    out = {"sf": sf_dir, "events": n, "panes": panes}
    for name, fn in (("plain", plain), ("paned", paned)):
        b0, r0, i0 = _stage_totals()
        sec = _timed(fn)
        b1, r1, i1 = _stage_totals()
        out[name] = {
            "sec_median3": round(sec, 3),
            "shuffle_bytes_3runs": b1 - b0,
            "shuffle_records_3runs": r1 - r0,
        }
    print(json.dumps(out, indent=1))


def probe_hopg(sf_dir: str) -> None:
    """The KEYED hopping agg (the reference's A2 production shape:
    per-entity per-window sums) — here the plain path's partial-agg
    state is |entities| x |windows| per task, so map-side combine
    stops absorbing the x10 explode and the shuffle carries it;
    the pane path's explode applies to already-combined (pane,
    entity) partials."""
    spark = get_spark_ui()
    spark.sparkContext.setLogLevel("ERROR")
    from tweetaggregates_spark.operators.window import hopping_paned
    from tweetaggregates_spark.sources.tables import load_table

    events = load_table(spark, sf_dir, "events")

    def plain():
        (
            events.groupBy(
                F.window("ts", "10 minutes", "1 minute").alias("w"),
                "user_id",
            )
            .agg(F.count(F.lit(1)).alias("cnt"))
            .select(F.col("w.end").alias("window_time"), "user_id", "cnt")
            .write.format("noop")
            .mode("overwrite")
            .save()
        )

    def paned():
        hopping_paned(
            events,
            "ts",
            [F.col("user_id")],
            {"cnt": (F.count(F.lit(1)), F.sum)},
        ).write.format("noop").mode("overwrite").save()

    plain()
    paned()
    n = events.count()
    nu = events.select("user_id").distinct().count()
    out = {"sf": sf_dir, "events": n, "users": nu}
    for name, fn in (("plain", plain), ("paned", paned)):
        b0, r0, _ = _stage_totals()
        sec = _timed(fn)
        b1, r1, _ = _stage_totals()
        out[name] = {
            "sec_median3": round(sec, 3),
            "shuffle_bytes_3runs": b1 - b0,
            "shuffle_records_3runs": r1 - r0,
        }
    print(json.dumps(out, indent=1))


def probe_oph(sf_dir: str) -> None:
    from tweetaggregates_spark.session import get_spark

    spark = get_spark("scale_r13_oph")
    spark.sparkContext.setLogLevel("ERROR")
    from tweetaggregates_spark.operators import cluster, dedup
    from tweetaggregates_spark.plans.llm import _curated_clean

    def run(pair_fn):
        clean = _curated_clean(spark, sf_dir).localCheckpoint(eager=False)
        pairs = pair_fn(clean)
        labeled = cluster.assign_clusters(
            clean.select("doc_id"), pairs
        ).select("doc_id", "cluster_id")
        sizes = labeled.groupBy("cluster_id").agg(
            F.count(F.lit(1)).alias("n_members")
        )
        (
            clean.join(labeled, "doc_id")
            .where(F.col("doc_id") == F.col("cluster_id"))
            .join(sizes, "cluster_id")
            .select("doc_id", "n_members")
            .write.format("noop")
            .mode("overwrite")
            .save()
        )

    # warmup
    run(dedup.minhash_lsh_pairs_oph)
    t_oph = _timed(lambda: run(dedup.minhash_lsh_pairs_oph))
    t_16 = _timed(lambda: run(dedup.minhash_lsh_pairs))
    print(
        json.dumps(
            {
                "sf": sf_dir,
                "curated_neardup_oph_sec_median3": round(t_oph, 3),
                "curated_neardup_16hash_sec_median3": round(t_16, 3),
                "speedup": round(t_16 / t_oph, 3),
            }
        )
    )


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "hop"
    sf = SF
    if "--sf" in sys.argv:
        sf = sys.argv[sys.argv.index("--sf") + 1]
    if which == "hop":
        probe_hop(sf)
    elif which == "hopg":
        probe_hopg(sf)
    else:
        probe_oph(sf)
