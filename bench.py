"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints, in order: a one-line summary (total + calibration — short
enough to survive any stdout-tail truncation), the full verbose record
(also written in-repo as BENCH_LOCAL_r*.json), and LAST the contract
JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": "<dir>"}

Each query is forced with the noop sink (full computation, no driver
collect). One untimed warmup query initializes the JVM/codegen paths so
timings measure the plans, not session startup. Between entries the
harness drains stale block-manager state (_reset_state) OUTSIDE the
timing windows — per-entry isolation, VERDICT r15 #3.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry_mod
from tweetaggregates_spark.session import get_spark

HEADLINE = [
    "top_users_hopping",
    "hopping_counts",
    "top_users_with_examples",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "brand_supplier_stats",
    "top_orders_per_customer",
    "exact_dedup_docs",
    "minhash_lsh_docs",
    "ngram_jaccard_docs",
    "knn_cosine",
    "quality_docs",
    "purchase_asof_click",
    "session_windows",
    "value_quantiles_by_type",
    "simhash_docs",
    "lsh_verified_pairs",
    # round 2: the banded (non-cartesian) near-dup paths. The dataset's
    # only meaningful cosine threshold (0.4) is marginal, where sign-LSH
    # banding cannot prune (see cosine_near_dup_pairs_banded docstring) —
    # so the HEADLINE carries the matmul paths that are the right plan
    # there; the banded variant stays oracle-checked in CORRECTNESS but
    # is not a plan we'd ship at that threshold (11.9 s vs 1.3/1.7 s at
    # sf0.1 — measured, see SCALE.md).
    "simhash_pairs_banded",
    "cosine_near_dups_blocked",
    "cosine_near_dups_tiled",
    # round 2: dup-cluster resolution + packing (training-data ops)
    "dedup_clusters_docs",
    "pack_sequences_docs",
    # round 2: text-index family + adapted TPC-H shapes + CDC compaction
    "tfidf_docs",
    "inverted_index_docs",
    "q16_supplier_counts",
    "q19_disjunctive_revenue",
    "latest_events_snapshot",
    # round 2 batch 2: remaining TPC-H shapes, window family,
    # compressed-domain ANN
    "q7_nation_volume",
    "q13_order_count_distribution",
    "user_event_gaps",
    "knn_cosine_quantized",
    "repeated_ngrams_docs",
    # round 2 batch 3: product analytics, profiling, iterative graph
    "conversion_funnel",
    "retention_cohorts",
    "events_profile",
    "event_type_pagerank",
    "chunk_docs",
    # round 3 batch 2: the frequency sketch (counters + broadcast
    # estimation join; the rollup shares the daily counter plan)
    "cms_heavy_hitters_daily",
    # round 4: cross-document substring dedup (positional shingle
    # equi-join + gaps-and-islands longest run), PQ/ADC ANN, and
    # SemDeDup. Round 5: semantic_dup_embeddings is registered with
    # the adaptive-k production rule itself (VERDICT r4 #2), timed
    # below as `semantic_dup_adaptive` (name continuity with r4).
    "substring_dup_docs",
    "knn_pq_embeddings",
    "lm_quality_docs",
    "media_frames_docs",
    "bpe_merges_docs",
    # round 5: the incremental exact-dedup index fold and the composed
    # IVF-ADC ANN index. Round 6 (VERDICT r5 #2): the near-dup
    # incremental entry is SPLIT below into index_build /
    # batch_amortized / append-per-row — the combined
    # incremental_dedup_docs number deliberately timed two CC
    # pipelines in one entry and overstated the steady-state cost;
    # cross-round comparison uses the amortized entry.
    "incremental_exact_dedup_docs",
    "knn_ivf_pq_embeddings",
    # round 6: the newly oracle-registered refined (exact-rescore)
    # trained IVF-ADC path
    "knn_ivf_pq_refined_embeddings",
    # round 7: bloom-prefiltered incremental exact dedup, JL random
    # projection, per-source quality percentile curation, greedy
    # k-center coreset
    "bloom_dedup_new_docs",
    "random_projection_embeddings",
    "domain_quality_filter_docs",
    "coreset_embeddings",
    "knn_rp_embeddings",
    "temperature_sample_docs",
    "zipf_fit_docs",
    "gopher_rules_docs",
    "c4_filter_docs",
    # round 8: DSIR domain-matching weights + executed keep,
    # deterministic-KLL daily sketch and pruned monthly rollup
    "dsir_weights_docs",
    "kll_value_daily",
    "kll_value_monthly_rollup",
    # round 9: deterministic power-iteration PCA, corpus line dedup,
    # UniMax language-budget allocation
    "pca_embeddings",
    "line_dedup_docs",
    "unimax_mixture_docs",
    "quality_classifier_docs",
    "unimax_sample_docs",
    "decontaminated_docs",
    "quality_signals_docs",
    # round 10: sampled-training classifier (the production shape —
    # gradients from a 20% hash-sample, map-only full-corpus scoring)
    # and the fixed-size bottom-k variant (constant training cost at
    # any corpus size)
    "quality_classifier_sampled_docs",
    "quality_classifier_bottomk_docs",
    # round 10 (cont.): winnowing near-dup (positional sketch with the
    # >= w+k-1 shared-run detection guarantee), CCNet-shape bigram-LM
    # quality (reference-slice-trained), and the LSH candidate
    # recall/precision audit (composes the exact-Jaccard ground truth
    # with the banded candidates — at 100 TB the truth side runs on a
    # sampled audit slice; timed here at full sf for honesty)
    "winnow_dup_pairs_docs",
    "bigram_lm_quality_docs",
    # round 11: the broadcast-model scorer — exploded bigram rows never
    # shuffle; only the model tables ship (the KenLM production case)
    "bigram_lm_quality_bcast_docs",
    "lsh_recall_docs",
    # round 11: the 100 TB form of the audit — exact-Jaccard truth and
    # banded candidates both restricted to the deterministic 20% doc
    # sample, so the quadratic truth side tracks the SAMPLE (p^2 of
    # the pairs), not the corpus
    "lsh_recall_sampled_docs",
    # round 10 (cont.): the executed end-to-end curation pipeline —
    # fused signal scan -> calibrated rule filter -> exact dedup ->
    # decontamination, composed in one plan — and the CCNet
    # head/middle/tail perplexity buckets (global two-pass rank)
    "curated_corpus_docs",
    # round 11: the pipeline composed with fuzzy dedup — MinHash-LSH
    # cluster collapse (keep min-id canonical) over the curated corpus
    "curated_corpus_neardup_docs",
    "ppl_buckets_docs",
    # round 10 (cont.): content-defined chunking — sub-document exact
    # dedup; the chunk-hash groupBy moves span hashes, never text —
    # and its EXECUTED trim (one occurrence per chunk corpus-wide)
    "cdc_dup_chunks_docs",
    "cdc_trim_docs",
    # round 11: incremental chunk-level dedup — the odd batch trims
    # against the even batch's persisted-shape chunk index without
    # rechunking history; delta persistence is batch-bounded
    "incremental_cdc_trim_docs",
    # round 11: the streaming lifecycle of the same family — per
    # trigger trim-vs-index + O(batch) delta append, timed end to end
    "stream_cdc_trim_docs",
    # round 11: HTML main-content extraction (boilerplate removal) —
    # map-only regex + array HOFs, runs at scan speed
    "html_extract_docs",
    # round 12: exact-substring span trim — the CDC chunk table plus
    # two doc-bounded windows; nothing corpus-quadratic
    "substring_trim_docs",
    # round 12: URL canonicalization + keeper — map-only regexes, one
    # reused-exchange shuffle of URL-sized rows
    "url_canonical_docs",
    # round 12: LSH planner (planned-vs-measured recall on the 20%
    # audit sample) — sampled quadratic truth + pair-sized fold
    "lsh_plan_audit",
    # round 12: the IVF-PQ index lifecycle end to end (build even half,
    # append odd half, compact, probe) — timed with its disk round-trips
    "incremental_ann_ivf_embeddings",
    # round 12: metadata-filtered ANN — the pre-filtered exact truth
    # and the post-filter recall audit (bucket-local IVF candidates)
    "knn_filtered_embeddings",
    "ann_filtered_recall_embeddings",
    # round 12: per-segment language mixture (CCNet per-paragraph
    # pass) — posexplode + map-only lang-id + one count groupBy
    "lang_segments_docs",
    # round 12: the full BPE trainer (8 argmax rounds over the vocab
    # table, never the corpus) + broadcast-vocab tokenize
    "bpe_token_counts_docs",
    # round 12: one-permutation minhash — 1/16th the signature hash
    # cost, same single shuffle and banding join
    "oph_lsh_pairs_docs",
    "oph_lsh_recall_docs",
    # round 12: per-source quality calibration — skew-safe two-pass
    # rank, exact integer keep cut
    "quality_calibrated_docs",
    # round 12: snapshot diff for dataset versioning — hash map-side,
    # one full-outer id join
    "corpus_diff_docs",
    # round 12: diff-driven re-processing — only added+changed docs
    # fold into the persisted content-hash index
    "snapshot_ingest_docs",
    # round 12: one-row corpus datasheet — single-scan aggregate
    "dataset_card_docs",
    # round 13: the pane-decomposed hopping count (the production fix
    # for the x10 raw-row expansion — aggregate panes first, explode
    # the panes), vs the plain expansion already in HEADLINE
    "hopping_counts_paned",
    # round 13: leak-proof cluster-routed split (CC labels + map-side
    # hash routing) and BM25 ranked retrieval over the token index
    "cluster_split_docs",
    "bm25_topk_docs",
    # round 13: streaming near-dup lifecycle (drop-dir replay, folded
    # band index) and snapshot-diff-driven ANN ingest (tombstone +
    # append + compact + probe) — lifecycle proofs under the gate
    "stream_near_dedup_docs",
    "snapshot_ann_ingest_embeddings",
    # round 13: BM25 eval-contamination audit (train-side index stats)
    # and the asymmetric containment join (quadratic oracle baseline,
    # same single shingle self-join plan as ngram_jaccard_docs)
    "bm25_eval_contamination_docs",
    "ngram_containment_docs",
    # round 14: frozen incremental split routing (two closures + the
    # remap-folded routing table) and BM25 served from the PERSISTED
    # token index (build+append+compact+read lifecycle under the gate)
    "incremental_cluster_split_docs",
    "bm25_topk_indexed_docs",
    # round 14: banded containment (LSH discovery + exact verify — the
    # production form of ngram_containment's quadratic truth) and the
    # keyed pane path for the flagship hopping shape
    "containment_verified_pairs_docs",
    "top_users_hopping_paned",
    # round 14: quantizer-refresh lifecycle (retrain on survivors +
    # re-encode + recall audit) and the composed release datasheet
    "ann_refresh_recall_embeddings",
    "dataset_card_v2_docs",
    # round 14: streaming frozen-split lifecycle (30% sampled replay;
    # band delta + routes snapshot per trigger) and the probe-routed
    # hopping entry (the density probe picking its own physical path)
    "stream_cluster_split_docs",
    "hopping_counts_auto",
]

STREAM_TWEETS = 20_000  # single-pass streaming drain size


def bench_streaming_drain(spark) -> float:
    """Time the single-pass streaming pipeline (one foreachBatch, five
    aggregate families) draining a synthetic NDJSON replay — the
    reference's defining dataflow (Query.cs Multicast). Round-4 config:
    ONE availableNow trigger pair (data + append-mode finalize, the
    two-trigger floor of watermarked emission), source fan-out so parse
    isn't single-tasked, and the bounded-example cap ON (the
    production state-bounding path is what's measured)."""
    import shutil
    import tempfile

    from tests.fixtures import write_tweets_file
    from tweetaggregates_spark.streaming.pipeline import (
        run_streaming_aggregates,
    )

    root = tempfile.mkdtemp(prefix="bench_stream_")
    try:
        # untimed warmup drain (same policy as the query warmups):
        # initializes the streaming/state-store/codegen paths so the
        # timed run measures the pipeline, not first-use JIT
        warm_dir = os.path.join(root, "warm_in")
        os.makedirs(warm_dir)
        write_tweets_file(
            os.path.join(warm_dir, "tweets.ndjson"), 2_000, seed=9
        )
        run_streaming_aggregates(
            spark,
            warm_dir,
            os.path.join(root, "warm_store"),
            os.path.join(root, "warm_ckpt"),
            available_now=True,
            state_shuffle_partitions=8,
            source_parallelism=16,
        )

        in_dir = os.path.join(root, "in")
        os.makedirs(in_dir)
        write_tweets_file(
            os.path.join(in_dir, "tweets.ndjson"), STREAM_TWEETS, seed=7
        )
        t0 = time.perf_counter()
        run_streaming_aggregates(
            spark,
            in_dir,
            os.path.join(root, "store"),
            os.path.join(root, "ckpt"),
            available_now=True,
            # ~9k state rows for 20k tweets: one RocksDB instance per
            # core is pure overhead at this batch size
            state_shuffle_partitions=8,
            source_parallelism=16,
        )
        return time.perf_counter() - t0
    finally:
        shutil.rmtree(root, ignore_errors=True)


def bench_streaming_soak(
    spark, total_rows: int = 50_000, n_files: int = 10
) -> dict:
    """Sustained-rate soak (VERDICT r3 #3): drain an n_files drop dir
    one file per trigger and report steady-state throughput and state
    size from the query's own progress metrics — the numbers a
    capacity plan needs (rows/s per trigger cadence, state rows held
    at the open frontier). The default 5k-row triggers measure the
    per-trigger machinery floor; the large variant (VERDICT r4 #6,
    total_rows=100k / n_files=2 => 50k-row triggers) demonstrates the
    stated capacity rule that throughput scales with trigger size
    because per-trigger overhead amortizes."""
    import json as _json
    import shutil
    import tempfile

    from tests.fixtures import make_tweets
    from tweetaggregates_spark.streaming.pipeline import (
        run_streaming_aggregates,
    )

    root = tempfile.mkdtemp(prefix="bench_soak_")
    try:
        in_dir = os.path.join(root, "in")
        os.makedirs(in_dir)
        lines = sorted(
            make_tweets(total_rows, seed=13),
            key=lambda ln: _json.loads(ln).get("timestamp_ms", "0")
            if ln.startswith("{")
            else "0",
        )
        chunk = len(lines) // n_files
        for i in range(n_files):
            lo = i * chunk
            hi = (i + 1) * chunk if i < n_files - 1 else len(lines)
            with open(os.path.join(in_dir, f"{i:03d}.ndjson"), "w") as f:
                f.write("\n".join(lines[lo:hi]) + "\n")
        t0 = time.perf_counter()
        [q] = run_streaming_aggregates(
            spark,
            in_dir,
            os.path.join(root, "store"),
            os.path.join(root, "ckpt"),
            available_now=True,
            max_files_per_trigger=1,
            state_shuffle_partitions=8,
            source_parallelism=16,
        )
        wall = time.perf_counter() - t0
        progress = q.recentProgress
        rows = sum(p.numInputRows for p in progress)
        proc_ms = sum(p.durationMs["triggerExecution"] for p in progress)
        state_rows = max(
            (s.numRowsTotal for p in progress for s in p.stateOperators),
            default=0,
        )
        return {
            "rows": rows,
            "triggers": len(progress),
            "wall_sec": round(wall, 3),
            "rows_per_sec": round(rows / (proc_ms / 1000.0), 1),
            "max_state_rows": state_rows,
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)


def bench_incremental_dedup(spark, sf_dir: str) -> dict:
    """Split timing for incremental near-dup dedup (VERDICT r5 #2):

    * build_runs — one-time band-index build over the even half,
      persisted as the versioned base (amortized across every later
      ingest in production);
    * batch_runs — dedup of the odd half against the PERSISTED index
      (fold-at-read + delta-graph CC + assignments), the steady-state
      per-ingest number;
    * append_sec_per_row — the O(batch) delta persistence
      (append_band_index_delta: band rows + remap log) per batch doc.
    """
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from tweetaggregates_spark.operators import dedup as dd
    from tweetaggregates_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    b1 = docs.filter(F.col("doc_id") % 2 == 0)
    b2 = docs.filter(F.col("doc_id") % 2 == 1)
    n2 = b2.count()
    build_runs, batch_runs, append_secs = [], [], []
    for _ in range(3):
        root = tempfile.mkdtemp(prefix="bench_incdedup_")
        try:
            path = os.path.join(root, "index")
            t0 = time.perf_counter()
            dd.append_band_index_delta(
                dd.build_band_index(b1),
                spark.createDataFrame([], dd.REMAP_SCHEMA),
                path,
                0,
            )
            build_runs.append(time.perf_counter() - t0)

            t0 = time.perf_counter()
            index = dd.read_band_index(spark, path, below=1)
            assignments, new_rows, remap = dd.dedup_new_batch_delta(
                b2, index
            )
            assignments.write.mode("overwrite").format("noop").save()
            batch_runs.append(time.perf_counter() - t0)

            t0 = time.perf_counter()
            dd.append_band_index_delta(new_rows, remap, path, 1)
            append_secs.append(time.perf_counter() - t0)
        finally:
            shutil.rmtree(root, ignore_errors=True)
    import statistics

    return {
        "build_runs": build_runs,
        "batch_runs": batch_runs,
        "append_sec_per_row": round(
            statistics.median(append_secs) / max(n2, 1), 6
        ),
    }


def _reset_state(spark) -> None:
    """Per-entry measurement isolation (VERDICT r15 #3, explicitly
    sanctioned there): r15's five full runs showed 4-8 entries per run
    swinging 2-4x on UNTOUCHED code because the 116 entries run
    back-to-back in one session and inherit block-manager state from
    their neighbors — chiefly localCheckpoint RDD blocks whose Python
    wrappers are long garbage but whose JVM blocks wait on the
    weak-ref ContextCleaner. Collecting the Python side, then asking
    the JVM to GC, drains that queue so every entry starts from the
    same block-manager state. Runs OUTSIDE every timing window, so it
    changes isolation, not the measured work."""
    import gc

    gc.collect()
    spark.catalog.clearCache()
    try:
        spark.sparkContext._jvm.System.gc()
    except Exception:
        pass  # measurement hygiene only; never fail the bench


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()

    # warmup: run every headline query once at the smallest sf — warms
    # the JVM/codegen/parquet paths (results are NOT reused; each timed
    # run below recomputes at the target sf)
    warm_sf = "/root/testdata/sf0.001"
    if os.path.isdir(warm_sf):
        for name in HEADLINE:
            qs[name](spark, warm_sf).write.mode("overwrite").format("noop").save()

    import statistics

    # 3 runs per query; report the MEDIAN (headline number) and the
    # SPREAD (max-min) so a judge can tell machine drift from a plan
    # regression on any single query (VERDICT r3 #10)
    timings: dict[str, float] = {}
    stats: dict[str, dict] = {}

    def _record(name: str, runs: list[float]) -> None:
        med = statistics.median(runs)
        timings[name] = round(med, 3)
        stats[name] = {
            "median": round(med, 3),
            "spread": round(max(runs) - min(runs), 3),
        }

    for name in HEADLINE:
        _reset_state(spark)
        spark.sparkContext.setJobDescription(f"bench: {name}")
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
            runs.append(time.perf_counter() - t0)
        _record(name, runs)
    spark.sparkContext.setJobDescription(None)

    _reset_state(spark)
    _record(
        "streaming_drain_20k",
        [bench_streaming_drain(spark) for _ in range(3)],
    )
    # 3 runs each, report the MEDIAN-throughput run plus the observed
    # rows/s spread (VERDICT r10 #1): same-host same-session soak
    # throughput varies ~25-30% run to run, so a single-run soak
    # number cannot distinguish noise from a plan regression — the r10
    # "decline" reproduced as host drift once re-measured 5x on one
    # host against the r8 code (see SCALE.md, streaming calibration).
    def _soak_median(**kw) -> dict:
        runs = [bench_streaming_soak(spark, **kw) for _ in range(3)]
        runs.sort(key=lambda s: s["rows_per_sec"])
        med = dict(runs[1])
        med["rps_spread"] = round(
            runs[-1]["rows_per_sec"] - runs[0]["rows_per_sec"], 1
        )
        return med

    soak = _soak_median()
    # 50k-row triggers: the capacity-rule demonstration (r4 #6)
    soak_large = _soak_median(total_rows=100_000, n_files=2)

    # production-width simhash (bits=64, ~21-bit bands): the scale
    # configuration the bits=16 oracle-economy entry stands in for —
    # measured so the claimed banding behavior has a number
    # (test_simhash64_candidates_bounded_and_recall_one pins recall/
    # candidate bounds at sf0.001)
    from tweetaggregates_spark.operators.dedup import simhash_pairs_banded
    from tweetaggregates_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    _reset_state(spark)
    runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        simhash_pairs_banded(docs, bits=64, max_hamming=2).write.mode(
            "overwrite"
        ).format("noop").save()
        runs.append(time.perf_counter() - t0)
    _record("simhash64_pairs_banded", runs)

    # production-shaped SemDeDup: adaptive k pins cluster size (the
    # scale rule; since round 5 this IS the registered
    # semantic_dup_embeddings plan — timed under the r4 name for
    # cross-round comparability)
    from tweetaggregates_spark.operators.cluster import semantic_dup_pairs

    emb = load_table(spark, sf_dir, "embeddings")
    _reset_state(spark)
    runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        semantic_dup_pairs(
            emb, k=None, iters=2, threshold=0.4
        ).write.mode("overwrite").format("noop").save()
        runs.append(time.perf_counter() - t0)
    _record("semantic_dup_adaptive", runs)

    # batched Gonzalez k-center at production k (VERDICT r7 #8): the
    # O(k/batch) driver-action variant, output bit-identical to the
    # sequential greedy (pinned in tests/test_r8_ops.py); measured at
    # k=100 where the sequential loop's per-center job launch dominates
    # (sf0.1 local: 23.0 s sequential vs 7.9 s batched-16; round 9
    # bumps to batch=32 — 6.7-7.5 s, output verified identical — the
    # acceptance prefix on this corpus fills larger batches fine)
    from tweetaggregates_spark.operators.cluster import (
        kcenter_coreset_batched,
    )

    _reset_state(spark)
    runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        kcenter_coreset_batched(emb, k=100, batch=32).write.mode(
            "overwrite"
        ).format("noop").save()
        runs.append(time.perf_counter() - t0)
    _record("kcenter_batched_k100", runs)

    # incremental near-dup dedup, split into the production phases
    # (VERDICT r5 #2): a ONE-TIME index build, the per-batch dedup
    # against the persisted index (the steady-state number users see),
    # and the O(batch) delta append (reported per batch row)
    _reset_state(spark)
    inc = bench_incremental_dedup(spark, sf_dir)
    _record("incremental_dedup_index_build", inc["build_runs"])
    _record("incremental_dedup_batch_amortized", inc["batch_runs"])
    append_per_row = inc["append_sec_per_row"]

    total = round(sum(timings.values()), 3)
    # Two output lines (VERDICT r4 #8): the driver records only the
    # TAIL ~2000 chars of stdout, so the full verbose record prints
    # FIRST and the LAST line is a compact JSON carrying the complete
    # per-query dict — guaranteed to survive tail truncation and parse
    # on its own.
    calib = _calibrate(spark, sf_dir)
    # rps_x_scan kept for cross-round continuity, but KNOWN-UNRELIABLE
    # as a streaming normalizer (r11 finding, SCALE.md): the 5k-row
    # soak is bound by per-trigger fixed overhead, which tracks
    # NEITHER probe — on a host whose scan probe read 2.8x slower than
    # r8's, raw soak throughput was unchanged, so the product swung
    # 379-592 across identical-code runs. Cross-round streaming
    # comparisons need rps_spread (above) and, when in doubt, a
    # same-host A/B against the old code.
    for s in (soak, soak_large):
        s["rps_x_scan"] = round(
            s["rows_per_sec"] * calib["scan_count_sec"], 1
        )
    # Truncation-safe summary FIRST (VERDICT r15 #2): the driver's
    # stored record keeps only a ~2000-char stdout TAIL, which clips
    # the front of the (3.4 KB, 116-query) contract line — BENCH_r14's
    # stored tail could not be re-parsed and PERF_r15 lost its whole
    # round-over-round comparison. The full per-query record survives
    # in THREE places: this summary (total + calibration, short enough
    # to quote anywhere), the BENCH_LOCAL_r*.json artifact written
    # below (committed in-repo), and the contract line printed LAST
    # (unchanged; additions-only).
    print(
        json.dumps(
            {
                "bench_summary": {
                    "value": total,
                    "unit": "sec",
                    "n_queries": len(timings),
                    "calib": calib,
                    "sf": sf_dir,
                }
            },
            separators=(",", ":"),
        )
    )
    verbose = {
        "metric": "headline_queries_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "query_stats": stats,
        "streaming_soak": soak,
        "streaming_soak_large": soak_large,
        # O(batch) delta persistence cost (VERDICT r5 #1/#2):
        # band rows + remap log write per batch doc
        "index_append_sec_per_row": append_per_row,
        "sf": sf_dir,
        # machine calibration: the shared host's throughput
        # drifts 1.3-1.9x between sessions (SCALE.md caveat).
        # Divide query timings by (calib / its prior value)
        # before cross-round comparisons.
        "calib": calib,
    }
    print(json.dumps(verbose))
    # the driver keeps only the ~2000-char stdout TAIL, which drops
    # query_stats/spreads — without them a noisy median reads as a
    # regression (two r7 false alarms cost a judge re-measure). The
    # full record therefore also lands IN-REPO, round-stamped by the
    # next BENCH_r slot (BENCH_r{N-1}.json exists when round N runs).
    here = os.path.dirname(os.path.abspath(__file__))
    try:
        import glob as _glob
        import re as _re

        rounds = [
            int(m.group(1))
            for f in _glob.glob(os.path.join(here, "BENCH_r*.json"))
            if (m := _re.search(r"BENCH_r0*(\d+)\.json$", f))
        ]
        tag = f"r{max(rounds) + 1}" if rounds else "r1"
        with open(os.path.join(here, f"BENCH_LOCAL_{tag}.json"), "w") as fh:
            json.dump(verbose, fh, indent=1)
    except OSError:
        pass  # read-only checkout: stdout still carries the record
    compact = {
        "metric": "headline_queries_total_sec",
        "value": total,
        "unit": "sec",
        "queries": {k: round(v, 2) for k, v in timings.items()},
        "soak_rps": [soak["rows_per_sec"], soak_large["rows_per_sec"]],
        "append_spr": append_per_row,
        "sf": sf_dir,
        "calib": calib,
    }
    line = json.dumps(compact, separators=(",", ":"))
    for drop in ("calib", "sf", "soak_rps"):
        if len(line) <= 1900:
            break
        compact.pop(drop, None)
        line = json.dumps(compact, separators=(",", ":"))
    print(line)
    return 0


def _calibrate(spark, sf_dir: str) -> dict[str, float]:
    """Two fixed-work probes: a pure-interpreter loop (single-core CPU
    speed) and a best-of-3 full count of lineitem (JVM scan+reduce
    path). Neither depends on any code under benchmark."""
    t0 = time.perf_counter()
    s = 0
    for i in range(20_000_000):
        s += i & 7
    py_loop = time.perf_counter() - t0
    from tweetaggregates_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem", parallelize=False)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        li.count()
        best = min(best, time.perf_counter() - t0)
    return {"py_loop_sec": round(py_loop, 3), "scan_count_sec": round(best, 3)}


if __name__ == "__main__":
    raise SystemExit(main())
