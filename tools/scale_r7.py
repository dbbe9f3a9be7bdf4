"""Round-7 scale-up measurements (best of 2, noop sinks) at
sf0.01 / sf0.1 / sf1 → per-decade exponents:

1. `bloom`  — bloom_dedup_new_docs (bloom build over the even half +
   prefiltered anti-join of the odd-half batch) and, separately, the
   STEADY-STATE probe (bloom prebuilt/untimed, batch tested+verified).
2. `rp`     — random_projection (map-only fold) and knn_rp_rescore.
3. `coreset`— greedy k-center (k=5): k-1 argmax actions over the
   corpus; cost should track the scan (exponent ~1 with tiny slope).
4. `fused`  — trained IVF-ADC paths after the grouped-kmeans fusion
   (knn_ivf_pq_trained / _refined exponents for the r7 SCALE table).
5. `sexact` — streaming exact-dedup ingest: per-trigger wall time for
   a FIXED 1000-doc batch against a corpus spanning 100x (the
   O(batch) claim: flat seconds as the index grows).

Usage: python tools/scale_r7.py [bloom|rp|coreset|fused|sexact ...]
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


def _noop_best2(dfs) -> float:
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        for df in dfs if isinstance(dfs, list) else [dfs]:
            df.write.mode("overwrite").format("noop").save()
        best = min(best, time.perf_counter() - t0)
    return best


def bench_bloom(spark) -> None:
    from tweetaggregates_spark.operators.dedup import (
        bloom_build,
        bloom_dedup_new_batch,
        bloom_might_contain,
        hash64,
    )

    full, probe = {}, {}
    for sf, sf_dir in SFS:
        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id", "text"
        )
        hist = docs.filter(F.col("doc_id") % 2 == 0)
        batch = docs.filter(F.col("doc_id") % 2 == 1)
        full[sf] = _noop_best2(bloom_dedup_new_batch(batch, hist))
        bloom = bloom_build(
            hist.select(hash64(F.col("text")).alias("h")), "h"
        ).localCheckpoint(eager=True)
        bh = batch.select(
            "doc_id", hash64(F.col("text")).alias("content_hash")
        )
        hh = hist.select(hash64(F.col("text")).alias("content_hash"))
        tested = bh.crossJoin(F.broadcast(bloom)).withColumn(
            "_might",
            bloom_might_contain(
                F.col("content_hash"), F.col("bloom"), 1 << 20, 5
            ),
        )
        out = tested.filter(~F.col("_might")).select(
            "doc_id", "content_hash"
        ).unionByName(
            tested.filter(F.col("_might"))
            .select("doc_id", "content_hash")
            .join(hh.hint("shuffle_hash"), "content_hash", "left_anti")
            .select("doc_id", "content_hash")
        )
        probe[sf] = _noop_best2(out)
    _exponents("bloom_dedup build+probe", full)
    _exponents("bloom_dedup probe-only", probe)


def bench_rp(spark) -> None:
    from tweetaggregates_spark.operators.similarity import (
        knn_rp_rescore,
        random_projection,
    )

    rp, knn = {}, {}
    for sf, sf_dir in SFS:
        emb = load_table(spark, sf_dir, "embeddings")
        rp[sf] = _noop_best2(random_projection(emb, out_dim=8))
        q = emb.filter(F.col("vec_id") < 10)
        knn[sf] = _noop_best2(
            knn_rp_rescore(emb, q, k=5, out_dim=16, shortlist_size=100)
        )
    _exponents("random_projection (map-only)", rp)
    _exponents("knn_rp_rescore", knn)


def bench_coreset(spark) -> None:
    from tweetaggregates_spark.operators.cluster import kcenter_coreset

    r = {}
    for sf, sf_dir in SFS:
        emb = load_table(spark, sf_dir, "embeddings")
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            kcenter_coreset(emb, k=5).collect()
            best = min(best, time.perf_counter() - t0)
        r[sf] = best
    _exponents("kcenter_coreset k=5", r)


def bench_fused(spark) -> None:
    qs = entry_mod.queries()
    for name in (
        "knn_ivf_pq_trained_embeddings",
        "knn_ivf_pq_refined_embeddings",
    ):
        r = {}
        for sf, sf_dir in SFS:
            r[sf] = _noop_best2(qs[name](spark, sf_dir))
        _exponents(name, r)


def bench_sexact(spark) -> None:
    """Fixed 1000-doc batch deduped against a pre-ingested corpus that
    spans 100x: per-ingest wall time must track the BATCH."""
    import json

    from tweetaggregates_spark.streaming.dedup import (
        run_streaming_exact_dedup,
    )

    for sf, sf_dir in SFS:
        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id", "text"
        )
        rows = sorted(docs.collect(), key=lambda r: r.doc_id)
        corpus, batch = rows[:-1000] or rows[: len(rows) // 2], rows[-1000:]
        root = tempfile.mkdtemp(prefix="scale_sexact_")
        try:
            in_dir = os.path.join(root, "in")
            os.makedirs(in_dir)
            for i, chunk in enumerate((corpus, batch)):
                p = os.path.join(in_dir, f"{i}.ndjson")
                with open(p, "w") as f:
                    f.write(
                        "\n".join(
                            json.dumps({"doc_id": r.doc_id, "text": r.text})
                            for r in chunk
                        )
                    )
                os.utime(p, (1700000000 + i, 1700000000 + i))
            t0 = time.perf_counter()
            run_streaming_exact_dedup(
                spark,
                in_dir,
                os.path.join(root, "index"),
                os.path.join(root, "out"),
                os.path.join(root, "ckpt"),
                available_now=True,
                max_files_per_trigger=1,
            )
            wall = time.perf_counter() - t0
            print(
                f"stream_exact_dedup {sf}: corpus={len(corpus)} "
                f"batch={len(batch)} total_wall={wall:.2f}s"
            )
        finally:
            shutil.rmtree(root, ignore_errors=True)


def main() -> None:
    which = set(sys.argv[1:]) or {"bloom", "rp", "coreset", "fused", "sexact"}
    spark = get_spark("scale_r7")
    spark.sparkContext.setLogLevel("ERROR")
    if "bloom" in which:
        bench_bloom(spark)
    if "rp" in which:
        bench_rp(spark)
    if "coreset" in which:
        bench_coreset(spark)
    if "fused" in which:
        bench_fused(spark)
    if "sexact" in which:
        bench_sexact(spark)


if __name__ == "__main__":
    main()
