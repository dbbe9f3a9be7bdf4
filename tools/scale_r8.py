"""Round-8 scale-up measurements (best of 2, noop sinks) at
sf0.01 / sf0.1 / sf1 → per-decade exponents:

1. `dsir`    — DSIR importance scoring + executed keep (two B-key
   count aggregates + map-only literal-array fold; should track the
   scan).
2. `kll`     — deterministic-KLL daily sketch + monthly prune rollup
   over events (bucket-split rank + map-only keep predicate).
3. `qfilter` — domain_quality_filter_docs after the r8 rewrite
   (grouped_partitioned_rank: bucketed local row_number + offset
   join — the former per-source single-task window).
4. `kcenter` — batched Gonzalez k=100 (batch=16) vs sequential k=100:
   the driver-action amortization at production k.

Usage: python tools/scale_r8.py [dsir|kll|qfilter|kcenter ...]
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from tweetaggregates_spark.session import get_spark
from tweetaggregates_spark.sources.tables import load_table

SFS = [
    ("sf0.01", "/root/testdata/sf0.01"),
    ("sf0.1", "/root/testdata/sf0.1"),
    ("sf1", "/root/repo/testdata_sf1"),
]


def _exponents(label: str, r: dict[str, float]) -> None:
    e1 = math.log10(r["sf0.1"] / r["sf0.01"])
    e2 = math.log10(r["sf1"] / r["sf0.1"])
    print(
        f"{label:36s} "
        + "  ".join(f"{sf}:{r[sf]:7.2f}s" for sf, _ in SFS)
        + f"   0.01->0.1: {e1:+.2f}   0.1->1: {e2:+.2f}"
    )


def _noop_best2(build) -> float:
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        build().write.mode("overwrite").format("noop").save()
        best = min(best, time.perf_counter() - t0)
    return best


def run_dsir(spark) -> None:
    from tweetaggregates_spark.operators.sampling import dsir_select

    r = {}
    for sf, d in SFS:
        docs = load_table(spark, d, "documents").select(
            "doc_id", "lang", "text"
        )
        target = docs.filter(F.col("lang") == "en")
        r[sf] = _noop_best2(lambda: dsir_select(docs, target))
    _exponents("dsir_select (score + keep)", r)


def run_kll(spark) -> None:
    from tweetaggregates_spark.plans.events import (
        kll_value_daily,
        kll_value_monthly_rollup,
    )

    for name, fn in (
        ("kll_value_daily", kll_value_daily),
        ("kll_value_monthly_rollup", kll_value_monthly_rollup),
    ):
        r = {}
        for sf, d in SFS:
            r[sf] = _noop_best2(lambda: fn(spark, d))
        _exponents(name, r)


def run_qfilter(spark) -> None:
    from tweetaggregates_spark.plans.llm import domain_quality_filter_docs

    r = {}
    for sf, d in SFS:
        r[sf] = _noop_best2(lambda: domain_quality_filter_docs(spark, d))
    _exponents("domain_quality_filter (bucketed)", r)


def run_kcenter(spark) -> None:
    from tweetaggregates_spark.operators.cluster import (
        kcenter_coreset,
        kcenter_coreset_batched,
    )

    for name, fn in (
        ("kcenter_batched k=100 b=16",
         lambda emb: kcenter_coreset_batched(emb, k=100, batch=16)),
        ("kcenter_sequential k=100",
         lambda emb: kcenter_coreset(emb, k=100)),
    ):
        r = {}
        for sf, d in SFS:
            emb = load_table(spark, d, "embeddings").localCheckpoint(
                eager=True
            )
            t0 = time.perf_counter()
            fn(emb).write.mode("overwrite").format("noop").save()
            r[sf] = time.perf_counter() - t0  # single run: k jobs inside
        _exponents(name, r)


def run_skll(spark) -> None:
    """Streaming KLL ingest: a fixed 1000-event batch appended to a
    pre-ingested corpus spanning 100x — per-trigger wall time must
    track the BATCH (the item delta is O(batch sketch)), not the
    corpus."""
    import json
    import os
    import shutil
    import tempfile

    from tweetaggregates_spark.streaming.sketch import (
        run_streaming_kll_ingest,
    )

    for sf, sf_dir in SFS:
        ev = load_table(spark, sf_dir, "events").select(
            "event_id", "ts", "user_id", "event_type", "value"
        )
        rows = sorted(ev.collect(), key=lambda r: r.event_id)
        corpus, batch = rows[:-1000] or rows[: len(rows) // 2], rows[-1000:]
        root = tempfile.mkdtemp(prefix="scale_skll_")
        try:
            in_dir = os.path.join(root, "in")
            os.makedirs(in_dir)
            for i, chunk in enumerate((corpus, batch)):
                p = os.path.join(in_dir, f"{i}.ndjson")
                with open(p, "w") as f:
                    f.write(
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
                            for r in chunk
                        )
                    )
                os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))
            t0 = time.perf_counter()
            run_streaming_kll_ingest(
                spark,
                in_dir,
                os.path.join(root, "index"),
                os.path.join(root, "ckpt"),
                k=64,
                available_now=True,
                max_files_per_trigger=1,
            )
            wall = time.perf_counter() - t0
            print(
                f"stream_kll_ingest {sf}: corpus={len(corpus)} "
                f"batch={len(batch)} total_wall={wall:.2f}s"
            )
        finally:
            shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    which = sys.argv[1:] or ["dsir", "kll", "qfilter", "kcenter", "skll"]
    spark = get_spark()
    for w in which:
        {"dsir": run_dsir, "kll": run_kll, "qfilter": run_qfilter,
         "kcenter": run_kcenter, "skll": run_skll}[w](spark)
