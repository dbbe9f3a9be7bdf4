"""W1 cross-batch Trill DisorderPolicy.Adjust (Query.cs:27-31; VERDICT
r9 #4): a straggler arriving a batch late must CLAMP forward to the
carried watermark (previous batches' max arrival ts − 5 s tolerance)
and be counted there — not dropped (the 'drop' policy) and not clamped
against its own batch's max (the whole-replay ``clamp_late``
approximation).

Hand-computed Trill trace for the replay below (tolerance 5 s, window
10 min):

* batch 1 arrivals 12:00:00 … 12:09:00 ascending — running max M ends
  at 12:09:00, nothing adjusts.
* batch 2: straggler ts 12:00:30 < M − 5 s -> Trill adjusts it to
  12:08:55; it lands in window [12:00, 12:10). Then 12:20:00 arrives,
  M = 12:20:00, watermark 12:19:55 closes [12:00, 12:10) with
  count 11 (ten on-time + the adjusted straggler).
* batch 3: 12:40:00 closes [12:20, 12:30) with count 1.

The drop policy on the same replay yields count 10 — both pinned.
"""

from __future__ import annotations

import datetime
import json
import os
import time

from tweetaggregates_spark.store import AggregateStore

BASE = datetime.datetime(2024, 5, 1, 12, 0, 0)


def _line(minutes: float, i: int) -> str:
    ts_ms = int((BASE + datetime.timedelta(minutes=minutes)).timestamp() * 1000)
    return json.dumps(
        {
            "id": 5_000_000 + i,
            "text": f"tweet {i}",
            "timestamp_ms": str(ts_ms),
            "user": {"screen_name": f"u{i}", "followers_count": 10},
            "entities": {"hashtags": [], "user_mentions": []},
        }
    )


def _write_batches(in_dir) -> None:
    batches = [
        [_line(m, m) for m in range(10)],          # 12:00 .. 12:09
        [_line(0.5, 90), _line(20, 91)],           # straggler + fresh
        [_line(40, 92)],                           # closes [12:20,12:30)
    ]
    now = time.time()
    for i, chunk in enumerate(batches):
        p = in_dir / f"{i:03d}.ndjson"
        p.write_text("\n".join(chunk) + "\n")
        os.utime(p, (now - 300 + i * 100,) * 2)


def _counts(spark, store_dir) -> dict:
    rows = AggregateStore(spark, str(store_dir)).read("counts").collect()
    return {r.window_time: r.cnt for r in rows}


def _run(spark, tmp_path, policy: str) -> dict:
    from tweetaggregates_spark.streaming.pipeline import (
        run_streaming_aggregates_manual,
    )

    in_dir = tmp_path / f"in_{policy}"
    in_dir.mkdir()
    _write_batches(in_dir)
    run_streaming_aggregates_manual(
        spark,
        str(in_dir),
        str(tmp_path / f"store_{policy}"),
        str(tmp_path / f"ckpt_{policy}"),
        available_now=True,
        max_files_per_trigger=1,
        disorder_policy=policy,
    )
    return _counts(spark, tmp_path / f"store_{policy}")


def test_adjust_clamps_cross_batch_straggler_like_trill(spark, tmp_path):
    counts = _run(spark, tmp_path, "adjust")
    assert counts[BASE + datetime.timedelta(minutes=10)] == 11
    assert counts[BASE + datetime.timedelta(minutes=30)] == 1
    # the 12:40 window never closes (watermark stops at 12:39:55)
    assert BASE + datetime.timedelta(minutes=50) not in counts


def test_drop_policy_discards_the_same_straggler(spark, tmp_path):
    counts = _run(spark, tmp_path, "drop")
    assert counts[BASE + datetime.timedelta(minutes=10)] == 10
    assert counts[BASE + datetime.timedelta(minutes=30)] == 1


def test_clamp_late_carried_unit(spark):
    from pyspark.sql import functions as F

    from tweetaggregates_spark.operators.window import clamp_late_carried

    wm = BASE + datetime.timedelta(minutes=8, seconds=55)
    df = spark.createDataFrame(
        [
            (1, BASE + datetime.timedelta(seconds=30)),   # late -> clamp
            (2, BASE + datetime.timedelta(minutes=20)),   # fresh -> keep
        ],
        "id long, ts timestamp",
    )
    out = {r.id: r.ts for r in clamp_late_carried(df, "ts", wm).collect()}
    assert out[1] == wm
    assert out[2] == BASE + datetime.timedelta(minutes=20)
    # first batch (no carry): unchanged frame
    out0 = {r.id: r.ts for r in clamp_late_carried(df, "ts", None).collect()}
    assert out0[1] == BASE + datetime.timedelta(seconds=30)


def test_adjust_replay_is_idempotent(spark, tmp_path):
    """The adjust policy rides the same commit-marker protocol as drop:
    re-running the drained stream over a fresh checkpoint (forcing full
    re-delivery) must leave the store unchanged — the clamped ts went
    INTO the carry, so a replayed batch re-reads its exact pre-batch
    state and overwrites the same outputs."""
    from tweetaggregates_spark.streaming.pipeline import (
        run_streaming_aggregates_manual,
    )

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    _write_batches(in_dir)
    store = tmp_path / "store"
    for ckpt in ("ckpt_a", "ckpt_b"):
        run_streaming_aggregates_manual(
            spark,
            str(in_dir),
            str(store),
            str(tmp_path / ckpt),
            available_now=True,
            max_files_per_trigger=1,
            disorder_policy="adjust",
        )
    counts = _counts(spark, store)
    assert counts[BASE + datetime.timedelta(minutes=10)] == 11
    assert counts[BASE + datetime.timedelta(minutes=30)] == 1
