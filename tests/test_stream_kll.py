"""Streaming KLL ingest over the shared versioned store (round 8).

Contract: the folded index is a weighted-item BAG whose merge is
multiset union — so the streamed fold's estimates carry the SUM of the
per-batch bounds, and compaction (prune) adds its bookkept step. The
pins mirror the batch sketch's: every estimate's exact rank within the
carried bound, replay idempotence, inline compaction correctness.
"""

from __future__ import annotations

import json
import math
import os

from pyspark.sql import functions as F

from tweetaggregates_spark.operators.kllsketch import kll_estimates
from tweetaggregates_spark.sources.tables import load_table
from tweetaggregates_spark.streaming.sketch import (
    compact_kll_index,
    read_kll_index,
    run_streaming_kll_ingest,
)

SF = "/root/testdata/sf0.001"


def _ingest(spark, tmp_path, n_batches=3, **kw):
    ev = load_table(spark, SF, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    rows = sorted(ev.collect(), key=lambda r: r.event_id)
    in_dir = tmp_path / "in"
    in_dir.mkdir(exist_ok=True)
    n = len(rows)
    cuts = [i * n // n_batches for i in range(n_batches)] + [n]
    for i in range(n_batches):
        p = in_dir / f"{i}.ndjson"
        p.write_text(
            "\n".join(
                json.dumps(
                    {
                        "event_id": r.event_id,
                        "ts": r.ts.isoformat(sep=" "),
                        "user_id": r.user_id,
                        "event_type": r.event_type,
                        "value": r.value,
                    }
                )
                for r in rows[cuts[i] : cuts[i + 1]]
            )
        )
        os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))
    index_path = str(tmp_path / "kll_index")
    run_streaming_kll_ingest(
        spark,
        str(in_dir),
        index_path,
        str(tmp_path / "ckpt"),
        k=16,
        available_now=True,
        max_files_per_trigger=1,
        **kw,
    )
    return index_path, ev


def _check_bounds(spark, ev, items):
    """Every estimate's exact rank is within the carried bound."""
    est = kll_estimates(
        items, ["window_time"], "value", {"p50": 0.5, "p90": 0.9}
    ).collect()
    assert est
    exact = {}
    for r in (
        ev.select(
            F.window("ts", "1 day")["end"].alias("w"), "value"
        ).collect()
    ):
        exact.setdefault(r.w, []).append(r.value)
    for r in est:
        vals = sorted(exact[r.window_time])
        assert r.n_events == len(vals)
        for q, e in ((0.5, r.p50), (0.9, r.p90)):
            lo = sum(1 for v in vals if v < e) + 1
            hi = sum(1 for v in vals if v <= e)
            target = math.ceil(q * len(vals))
            dist = max(lo - target, target - hi, 0)
            assert dist <= r.err_bound_ranks, (r.window_time, q, dist)


def test_streamed_fold_estimates_within_bound(spark, tmp_path):
    index_path, ev = _ingest(spark, tmp_path)
    items = read_kll_index(spark, index_path)
    # the fold's total weight per window == the true row count
    w = items.groupBy("window_time").agg(
        F.sum("_w").alias("tw"), F.max("_n").alias("n")
    )
    assert all(r.tw == r.n for r in w.collect())
    _check_bounds(spark, ev, items)


def test_replay_overwrites_own_delta(spark, tmp_path):
    """A redelivered trigger must replace its own versioned delta, not
    duplicate it — re-running the whole availableNow drain with a
    FRESH checkpoint (every batch redelivered) leaves the fold
    identical."""
    index_path, ev = _ingest(spark, tmp_path)
    before = sorted(
        map(tuple, read_kll_index(spark, index_path).collect())
    )
    run_streaming_kll_ingest(
        spark,
        str(tmp_path / "in"),
        index_path,
        str(tmp_path / "ckpt_replay"),
        k=16,
        available_now=True,
        max_files_per_trigger=1,
    )
    after = sorted(
        map(tuple, read_kll_index(spark, index_path).collect())
    )
    assert after == before


def test_inline_compaction_preserves_bounds(spark, tmp_path):
    index_path, ev = _ingest(spark, tmp_path, compact_every=2)
    # the rebased tree: base committed, folded deltas gone
    from tweetaggregates_spark import versioned_store as vstore

    assert vstore.versions(f"{index_path}/items_base")
    items = read_kll_index(spark, index_path)
    _check_bounds(spark, ev, items)


def test_offline_compaction_bounds_state_and_bounds_hold(
    spark, tmp_path
):
    index_path, ev = _ingest(spark, tmp_path)
    compact_kll_index(spark, index_path, k=16)
    items = read_kll_index(spark, index_path)
    per_group = items.groupBy("window_time").count().collect()
    assert all(r["count"] <= 17 for r in per_group)  # k + 1
    w = items.groupBy("window_time").agg(
        F.sum("_w").alias("tw"), F.max("_n").alias("n")
    )
    assert all(r.tw == r.n for r in w.collect())
    _check_bounds(spark, ev, items)
