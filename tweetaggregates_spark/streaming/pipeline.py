"""Structured Streaming wrapper (SURVEY.md §2.4 W1-W7, §3.1, §7 M3).

Single-pass dataflow, matching the reference's Multicast shape: the
reference evaluates the upstream tweet stream ONCE and fans out to the
five egress observables (TweetGateCore/Query.cs:42,55 Multicast;
Program.SaveAggregates.cs:61-107). Here that is ONE ``readStream`` ->
``parse_tweets`` -> ONE ``foreachBatch`` that persists the micro-batch
and computes all five aggregate families from it via the shared batch
plan ``plans.tweets.tweet_aggregates`` — every ingested byte is read and
JSON-parsed exactly once per micro-batch.

Windowing semantics are Trill's interval emission (W7), implemented
manually inside foreachBatch (Spark cannot branch one streaming
aggregation into five groupings within a single query):

* watermark = max event time seen so far − 5 s tolerance (DisOrderTicks,
  Query.cs:14). Rows older than the watermark at batch start DROP —
  Spark's default late policy, the documented delta from Trill's
  DisorderPolicy.Adjust (SURVEY §7).
* a window is FINAL and emitted exactly once, in the first batch whose
  watermark passes its end (prev_wm < window_end <= new_wm) — the exact
  append-mode contract of a native streaming aggregation, and Trill's
  CoalesceEndEdges interval emission.
* a ``carry`` of still-open-window events rides between batches: an
  event is retained while some window containing it is open
  (ts + window_size > watermark). Any window this batch closes therefore
  sees its COMPLETE event set (carry ∪ batch), so per-window top-k (A6)
  and array dedupe (D3) are computed over full windows.

Failure semantics: foreachBatch is at-least-once, so every write is a
deterministic overwrite keyed by batch_id — family rows land in
``family/batch_id=N/`` (AggregateStore.write_batch) and the carry in
``_state/carry/batch_id=N`` — and a commit marker
(``_state/commits/N.json``, atomic rename) is written LAST. A replayed
batch either short-circuits on the marker or recomputes byte-identical
output into the same directories. This restores the keyed-put
idempotence of the reference's RocksDB sink (RocksDBStore.cs:70-135).

State scale at 100 TB: the carry holds only events inside the open
window frontier (≤ window_size + tolerance of event time), written as
date-partitioned parquet — the same bound a native state store would
hold, but spillable and executor-count independent.
"""

from __future__ import annotations

import datetime
import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tweetaggregates_spark.plans.tweets import (
    WINDOW_SIZE,
    parse_tweets,
    tweet_aggregates,
)
from tweetaggregates_spark.store import AggregateStore

DISORDER_TOLERANCE_SECONDS = 5  # Query.cs:14 DisOrderTicks


# -- commit-marker protocol (idempotent foreachBatch) ------------------------


def _commit_path(commits_dir: str, batch_id: int) -> str:
    return os.path.join(commits_dir, f"{batch_id}.json")


def _is_committed(commits_dir: str, batch_id: int) -> bool:
    return os.path.exists(_commit_path(commits_dir, batch_id))


def _last_commit(commits_dir: str) -> tuple[int | None, datetime.datetime | None]:
    """Latest committed (batch_id, watermark); (None, None) if fresh."""
    ids = []
    for name in os.listdir(commits_dir):
        if name.endswith(".json"):
            try:
                ids.append(int(name[: -len(".json")]))
            except ValueError:
                continue
    if not ids:
        return None, None
    last = max(ids)
    with open(_commit_path(commits_dir, last)) as f:
        payload = json.load(f)
    wm = payload.get("watermark")
    return last, (datetime.datetime.fromisoformat(wm) if wm else None)


def _commit(
    commits_dir: str, batch_id: int, watermark: datetime.datetime | None
) -> None:
    """Atomic (write-tmp + rename) marker: the batch is durable only once
    this file exists, so a crash anywhere earlier replays harmlessly into
    the same overwrite-keyed directories."""
    tmp = _commit_path(commits_dir, batch_id) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(
            {"batch_id": batch_id,
             "watermark": watermark.isoformat() if watermark else None},
            f,
        )
    os.replace(tmp, _commit_path(commits_dir, batch_id))


# -- the single-pass pipeline ------------------------------------------------


def run_streaming_aggregates(
    spark: SparkSession,
    input_path: str,
    store_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
) -> list:
    """Run the full five-family pipeline over a stream of NDJSON files
    in a SINGLE streaming query (source read once per micro-batch).

    available_now=True drains existing files and stops (deterministic
    replay / tests); False runs continuously (micro-batch). Returns the
    (length-1) list of StreamingQuery handles (already awaited if
    available_now)."""
    store = AggregateStore(spark, store_dir)
    state_dir = os.path.join(store_dir, "_state")
    commits_dir = os.path.join(state_dir, "commits")
    carry_root = os.path.join(state_dir, "carry")
    os.makedirs(commits_dir, exist_ok=True)

    def _process(batch_lines: DataFrame, batch_id: int) -> None:
        if _is_committed(commits_dir, batch_id):
            return  # at-least-once replay of a fully committed batch
        last_id, prev_wm = _last_commit(commits_dir)

        flat = parse_tweets(batch_lines)
        if prev_wm is not None:
            # W1 drop policy: rows older than the watermark drop
            flat = flat.filter(F.col("ts") >= F.lit(prev_wm))
        carry_path = (
            os.path.join(carry_root, f"batch_id={last_id}")
            if last_id is not None
            else None
        )
        if carry_path is not None and os.path.exists(carry_path):
            carry = spark.read.schema(flat.schema).parquet(carry_path)
            events = flat.unionByName(carry)
        else:
            events = flat
        events = events.persist()
        try:
            max_ts = events.agg(F.max("ts")).collect()[0][0]
            if max_ts is None:  # empty batch: advance nothing, commit
                _commit(commits_dir, batch_id, prev_wm)
                return
            new_wm = max_ts - datetime.timedelta(
                seconds=DISORDER_TOLERANCE_SECONDS
            )
            if prev_wm is not None and new_wm < prev_wm:
                new_wm = prev_wm  # watermark is monotone

            # one cached upstream -> all five families (Multicast, P9)
            for family, df in tweet_aggregates(events).items():
                out = df.filter(F.col("window_time") <= F.lit(new_wm))
                if prev_wm is not None:
                    out = out.filter(F.col("window_time") > F.lit(prev_wm))
                if not out.isEmpty():
                    store.write_batch(family, out, batch_id)

            # retain events while any window containing them is open
            still_open = F.col("ts") + F.expr(f"INTERVAL {WINDOW_SIZE}") > F.lit(
                new_wm
            )
            events.filter(still_open).write.mode("overwrite").parquet(
                os.path.join(carry_root, f"batch_id={batch_id}")
            )
            _commit(commits_dir, batch_id, new_wm)
            if carry_path is not None and os.path.exists(carry_path):
                shutil.rmtree(carry_path, ignore_errors=True)
        finally:
            events.unpersist()

    reader = spark.readStream
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    lines = reader.text(input_path)

    writer = (
        lines.writeStream.queryName("tweet_aggregates_single_pass")
        .option("checkpointLocation", os.path.join(checkpoint_dir, "single_pass"))
        .foreachBatch(_process)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    query = writer.start()
    if available_now:
        query.awaitTermination()
    return [query]
