"""Round-6 scale-up measurements (best of 2, noop/parquet sinks):

1. `amortized` — the incremental near-dup STEADY-STATE: dedup the odd
   half against a PERSISTED index over the even half (fold-at-read +
   delta-graph CC + assignments; the build is untimed), at sf0.01 /
   sf0.1 / sf1 → per-decade exponents for the number production pays
   per ingest.
2. `append` — the O(batch) delta persistence (band rows + remap log)
   per batch row at each sf.
3. `fold_depth` — read-time cost of the remap-log fold vs version
   count at sf0.1: the corpus split into V in-order ingests, then one
   full folded read. Motivates the compact_every cadence with a
   number (fold cost grows with V; compaction resets it).
4. `refined ANN` — knn_ivf_pq_refined_embeddings exponents.

Usage: python tools/scale_r6.py [amortized|fold|refined ...]
"""

from __future__ import annotations

import math
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod
from pyspark.sql import functions as F
from tweetaggregates_spark.operators import dedup as dd
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
    print(f"{label:36s} 0.01->0.1: {e1:+.2f}   0.1->1: {e2:+.2f}")


def bench_amortized(spark) -> None:
    amort: dict[str, float] = {}
    appends: dict[str, float] = {}
    for sf, sf_dir in SFS:
        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id", "text"
        )
        b1 = docs.filter(F.col("doc_id") % 2 == 0)
        b2 = docs.filter(F.col("doc_id") % 2 == 1)
        n2 = b2.count()
        best, abest = float("inf"), float("inf")
        for _ in range(2):
            root = tempfile.mkdtemp(prefix="scale_incdedup_")
            try:
                path = os.path.join(root, "index")
                dd.append_band_index_delta(  # untimed one-time build
                    dd.build_band_index(b1),
                    spark.createDataFrame([], dd.REMAP_SCHEMA),
                    path,
                    0,
                )
                t0 = time.time()
                index = dd.read_band_index(spark, path, below=1)
                asg, new_rows, remap = dd.dedup_new_batch_delta(b2, index)
                asg.write.format("noop").mode("overwrite").save()
                best = min(best, time.time() - t0)
                t0 = time.time()
                dd.append_band_index_delta(new_rows, remap, path, 1)
                abest = min(abest, time.time() - t0)
            finally:
                shutil.rmtree(root, ignore_errors=True)
        amort[sf] = best
        appends[sf] = abest / max(n2, 1)
        print(
            f"{sf} amortized {best:.3f}s  append {abest:.3f}s "
            f"({1000 * appends[sf]:.3f} ms/row, n={n2})",
            flush=True,
        )
    _exponents("incremental_dedup_batch_amortized", amort)
    _exponents("append_sec_per_row", appends)


def bench_fold_depth(spark) -> None:
    sf_dir = "/root/testdata/sf0.1"
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    for n_batches in (1, 5, 10):
        root = tempfile.mkdtemp(prefix="scale_fold_")
        try:
            path = os.path.join(root, "index")
            for v in range(n_batches):
                batch = docs.filter(F.col("doc_id") % n_batches == v)
                if v == 0:
                    dd.append_band_index_delta(
                        dd.build_band_index(batch),
                        spark.createDataFrame([], dd.REMAP_SCHEMA),
                        path,
                        0,
                    )
                    continue
                index = dd.read_band_index(spark, path, below=v)
                _, new_rows, remap = dd.dedup_new_batch_delta(batch, index)
                dd.append_band_index_delta(new_rows, remap, path, v)
            best = float("inf")
            for _ in range(3):
                t0 = time.time()
                dd.read_band_index(spark, path).write.format("noop").mode(
                    "overwrite"
                ).save()
                best = min(best, time.time() - t0)
            n_remaps = len(
                [
                    d
                    for d in os.listdir(os.path.join(path, "remap"))
                    if d.startswith("v=")
                ]
            )
            print(
                f"fold over {n_batches:2d} versions "
                f"({n_remaps} remap dirs): {best:.3f}s",
                flush=True,
            )
            if n_batches == 10:
                dd.compact_band_index(spark, path)
                best = float("inf")
                for _ in range(3):
                    t0 = time.time()
                    dd.read_band_index(spark, path).write.format(
                        "noop"
                    ).mode("overwrite").save()
                    best = min(best, time.time() - t0)
                print(f"fold after compaction:        {best:.3f}s")
        finally:
            shutil.rmtree(root, ignore_errors=True)


def bench_fixed_batch(spark) -> None:
    """THE production question: a FIXED-size ingest batch against a
    GROWING corpus index — does per-ingest cost track the batch or the
    corpus? Times both discovery paths per index scale: the folded
    union (index side shuffles) and the bucketed-base parts path
    (zero-Exchange base side, remap folded onto edges)."""
    import uuid

    batch_src = load_table(
        spark, "/root/testdata/sf0.01", "documents"
    ).select("doc_id", "text")
    batch = batch_src.filter(F.col("doc_id") % 20 == 1).select(
        (F.col("doc_id") + 1_000_000_000).alias("doc_id"), "text"
    )
    nb = batch.count()
    print(f"fixed batch: {nb} docs", flush=True)
    for sf, sf_dir in SFS:
        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id", "text"
        )
        root = tempfile.mkdtemp(prefix="scale_fixed_")
        table = f"band_base_{uuid.uuid4().hex[:8]}"
        try:
            path = os.path.join(root, "index")
            dd.append_band_index_delta(  # untimed corpus index build
                dd.build_band_index(docs),
                spark.createDataFrame([], dd.REMAP_SCHEMA),
                path,
                0,
            )
            dd.compact_band_index(spark, path, bucketed_table=table)
            folded_best = float("inf")
            for _ in range(2):
                t0 = time.time()
                index = dd.read_band_index(spark, path)
                asg, _nr, _rm = dd.dedup_new_batch_delta(batch, index)
                asg.write.format("noop").mode("overwrite").save()
                folded_best = min(folded_best, time.time() - t0)
            parts_best = float("inf")
            for _ in range(2):
                t0 = time.time()
                parts, remap = dd.read_band_index_parts(
                    spark, path, base_table=table
                )
                asg, _nr, _rm = dd.dedup_new_batch_delta(
                    batch, None, index_parts=parts, index_remap=remap
                )
                asg.write.format("noop").mode("overwrite").save()
                parts_best = min(parts_best, time.time() - t0)
            print(
                f"{sf} fixed-batch ingest: folded {folded_best:.3f}s  "
                f"bucketed-parts {parts_best:.3f}s",
                flush=True,
            )
        finally:
            shutil.rmtree(root, ignore_errors=True)
            spark.sql(f"DROP TABLE IF EXISTS {table}")


def bench_refined(spark) -> None:
    qs = entry_mod.queries()
    r: dict[str, float] = {}
    for sf, sf_dir in SFS:
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            qs["knn_ivf_pq_refined_embeddings"](spark, sf_dir).write.format(
                "noop"
            ).mode("overwrite").save()
            best = min(best, time.time() - t0)
        r[sf] = best
        print(f"{sf} knn_ivf_pq_refined {best:.3f}s", flush=True)
    _exponents("knn_ivf_pq_refined_embeddings", r)


def main() -> int:
    which = set(sys.argv[1:]) or {"amortized", "fold", "refined", "fixed"}
    spark = get_spark("scale-r6")
    spark.sparkContext.setLogLevel("ERROR")
    if "amortized" in which:
        bench_amortized(spark)
    if "fold" in which:
        bench_fold_depth(spark)
    if "refined" in which:
        bench_refined(spark)
    if "fixed" in which:
        bench_fixed_batch(spark)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
