"""Round-10 scale probes.

1. ``clf``: sampled-training quality classifier (VERDICT r9 #1) — wall
   time across sf0.001/0.01/0.1 and the split between the one
   sample-collect + driver GD and the map-only scoring pass. The
   full-batch baseline at the same sfs for the 8-pass comparison.
2. ``sneardup``: streaming near-dedup under hot-band skew (VERDICT r9
   #8) — pre-ingest a half-boilerplate corpus at 1x and 4x, then
   append ONE fixed 200-doc batch with the hot-band cap: per-trigger
   wall time must track the BATCH, not the accumulated hot bucket.

3. ``newops`` (continuation session): the five round-10-continuation
   entries (winnowing fingerprints/pairs, bigram LM, ppl buckets,
   curated pipeline) timed at sf0.001/0.01/0.1 with a collect-forcing
   action (count() alone lets column pruning skip the scored columns).

Usage: python tools/scale_r10.py [clf] [sneardup] [newops]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from tweetaggregates_spark.session import get_spark  # noqa: E402

SFS = [
    ("sf0.001", "/root/testdata/sf0.001"),
    ("sf0.01", "/root/testdata/sf0.01"),
    ("sf0.1", "/root/testdata/sf0.1"),
]


def _exponent(name: str, r: dict) -> None:
    import math

    keys = [k for k, _ in SFS if k in r]
    if len(keys) >= 2:
        a, b = r[keys[0]], r[keys[-1]]
        ratio = 10 ** (len(keys) - 1) * (
            float(keys[-1][2:]) / float(keys[0][2:]) / 10 ** (len(keys) - 1)
        )
        exp = math.log(b / a) / math.log(100 if len(keys) == 3 else 10)
        print(
            f"{name}: "
            + " ".join(f"{k}={r[k]:.2f}s" for k in keys)
            + f"  exponent~{exp:.2f}"
        )


def run_clf(spark) -> None:
    import __spark_entry__ as m

    qs = m.queries()
    for entry in ("quality_classifier_sampled_docs", "quality_classifier_docs"):
        r = {}
        for sf, d in SFS:
            qs[entry](spark, d).write.mode("overwrite").format("noop").save()
            t0 = time.perf_counter()
            qs[entry](spark, d).write.mode("overwrite").format("noop").save()
            r[sf] = time.perf_counter() - t0
        _exponent(entry, r)


def run_sneardup(spark) -> None:
    from tweetaggregates_spark.streaming.dedup import run_streaming_near_dedup

    boiler = (
        "subscribe to our newsletter accept all cookies all rights "
        "reserved terms of service privacy policy follow us on social"
    )

    def _lines(start: int, n: int) -> str:
        out = []
        for j in range(n):
            did = start + j
            text = (
                boiler
                if j % 2 == 0
                else f"unique document body {did} "
                + " ".join(f"tok{did}x{k}" for k in range(12))
            )
            out.append(json.dumps({"doc_id": did, "text": text}))
        return "\n".join(out)

    for scale, corpus_n in (("1x", 1000), ("4x", 4000)):
        root = tempfile.mkdtemp(prefix="scale_sneardup_")
        try:
            in_dir = os.path.join(root, "in")
            os.makedirs(in_dir)
            with open(os.path.join(in_dir, "0.ndjson"), "w") as f:
                f.write(_lines(1, corpus_n))
            with open(os.path.join(in_dir, "1.ndjson"), "w") as f:
                f.write(_lines(corpus_n + 1, 200))
            for i in range(2):
                os.utime(
                    os.path.join(in_dir, f"{i}.ndjson"),
                    (1700000000 + i, 1700000000 + i),
                )
            t0 = time.perf_counter()
            q = run_streaming_near_dedup(
                spark,
                in_dir,
                os.path.join(root, "index"),
                os.path.join(root, "out"),
                os.path.join(root, "ckpt"),
                available_now=True,
                max_files_per_trigger=1,
                max_bucket_size=16,
            )
            wall = time.perf_counter() - t0
            prog = [p for p in q.recentProgress if p.numInputRows > 0]
            durs = [round(p.batchDuration / 1000.0, 2) for p in prog]
            print(
                f"stream_near_dedup_skew {scale}: corpus={corpus_n} "
                f"batch=200 per_trigger_sec={durs} total={wall:.2f}s"
            )
        finally:
            shutil.rmtree(root, ignore_errors=True)


def run_newops(spark) -> None:
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    names = [
        "winnow_fingerprints_docs",
        "winnow_dup_pairs_docs",
        "winnow_dup_pairs_capped",
        "bigram_lm_quality_docs",
        "ppl_buckets_docs",
        "lsh_recall_docs",
        "curated_corpus_docs",
        "cdc_chunks_docs",
        "cdc_dup_chunks_docs",
        "cdc_trim_docs",
    ]
    for name in names:
        r = {}
        for sf_name, sf_dir in SFS:
            # force full evaluation of every output column — count()
            # alone lets pruning drop the score/hash computations
            def run():
                df = qs[name](spark, sf_dir)
                return df.select([df[c] for c in df.columns]).collect()

            run()
            t0 = time.perf_counter()
            rows = run()
            r[sf_name] = time.perf_counter() - t0
            print(f"{name} {sf_name}: {r[sf_name]:.2f}s rows={len(rows)}")
        _exponent(name, r)


if __name__ == "__main__":
    which = sys.argv[1:] or ["clf", "sneardup", "newops"]
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    for w in which:
        {"clf": run_clf, "sneardup": run_sneardup, "newops": run_newops}[w](spark)
