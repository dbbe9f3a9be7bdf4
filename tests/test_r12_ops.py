"""Round-12 operator tests: URL canonicalization, LSH parameter
planner, exact-substring (span) trim, and the IVF-PQ index
append/compact lifecycle."""

import pyspark.sql.functions as F

SF = "/root/testdata/sf0.01"


def _canon(spark, urls):
    """Run canonical_urls over one-doc-per-url rows; return
    {doc_id: canonical_url}."""
    from tweetaggregates_spark.operators.text import canonical_urls

    df = spark.createDataFrame(
        [(i, f"see {u} end") for i, u in enumerate(urls)],
        "doc_id BIGINT, text STRING",
    )
    return {
        r["doc_id"]: r["canonical_url"]
        for r in canonical_urls(df).collect()
    }


def test_canonical_urls_edge_cases(spark):
    got = _canon(
        spark,
        [
            "https://WWW.Example.COM:443/Page/1/?utm_source=x&id=7#frag",
            "http://example.com:80/a",
            "http://example.com:8080/a",  # non-default port KEPT
            "https://example.com/a?b=2&a=1",  # params sorted
            "https://example.com/a/?utm_campaign=z",  # tracking-only query
            "https://example.com/",  # root trailing slash
            "https://sub.www.example.com/x",  # only LEADING www. strips
        ],
    )
    # case, default port, www, tracking param, fragment, trailing /
    assert got[0] == "https://example.com/Page/1?id=7"
    assert got[1] == "http://example.com/a"
    assert got[2] == "http://example.com:8080/a"
    assert got[3] == "https://example.com/a?a=1&b=2"
    assert got[4] == "https://example.com/a"
    assert got[5] == "https://example.com"
    assert got[6] == "https://sub.www.example.com/x"


def test_canonical_urls_keeper(spark):
    """Variants of one page share a canonical URL; keeper is the min
    doc_id; distinct pages keep themselves."""
    from tweetaggregates_spark.operators.text import canonical_urls

    df = spark.createDataFrame(
        [
            (10, "x https://example.com/p?id=1&utm_source=a y"),
            (11, "x https://EXAMPLE.com/p/?id=1 y"),
            (12, "x https://example.com/q y"),
        ],
        "doc_id BIGINT, text STRING",
    )
    rows = {r["doc_id"]: r for r in canonical_urls(df).collect()}
    assert rows[10]["canonical_url"] == rows[11]["canonical_url"]
    assert rows[10]["keeper_doc_id"] == 10
    assert rows[10]["is_keeper"] and not rows[11]["is_keeper"]
    assert rows[12]["is_keeper"] and rows[12]["keeper_doc_id"] == 12


def test_lsh_plan_audit_gap_bound(spark):
    """The planner's s-curve prediction must track the measured
    banding recall. At threshold 0.05 over full sf0.01 the truth set
    includes medium-similarity pairs the 16/4 banding genuinely
    misses (the curve is meaningfully < 1 there), so the bound is
    exercised on the interesting part of the curve, not the s~1
    plateau. 2-sigma binomial noise at n_truth~30 is ~0.13; the pin
    is 0.15."""
    from tweetaggregates_spark.operators import dedup
    from tweetaggregates_spark.plans import llm

    docs = llm._docs(spark, SF).select("doc_id", "text")
    row = dedup.lsh_plan_audit(docs, threshold=0.05).collect()[0]
    assert row["n_truth"] > 10
    # the banding must actually miss some medium-similarity pairs —
    # otherwise this pin is not testing the curve
    assert row["n_hit"] < row["n_truth"]
    assert 0.0 < row["planned_recall"] < 1.0
    assert abs(row["gap"]) < 0.15
    # sanity: gap is derived from the two rounded columns
    assert abs(
        row["measured_recall"] - row["planned_recall"] - row["gap"]
    ) < 2e-6


def test_lsh_plan_audit_registered_shape(spark):
    """The registered sampled entry: one row, consistent counts."""
    from tweetaggregates_spark.plans import llm

    rows = llm.lsh_plan_audit(spark, SF).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_bands"] == 4 and r["rows_per_band"] == 4
    assert 0 <= r["n_hit"] <= r["n_truth"]
    assert 0.0 <= r["planned_recall"] <= 1.0
    assert 0.0 <= r["measured_recall"] <= 1.0


def _codes_rows(idx):
    return sorted(tuple(r) for r in idx.codes.collect())


def test_ivf_pq_compact_lifecycle(spark):
    """Compaction is a pure layout rewrite: reads before and after are
    identical, the folded tree has a single build with only
    ingest=base partitions, and the below= read contract survives a
    partial (below=N) compaction — a replayed trigger still sees its
    exact pre-batch index."""
    import os
    import re
    import shutil
    import tempfile

    from tweetaggregates_spark.operators.similarity import (
        append_to_ivf_pq_index,
        build_ivf_pq_index,
        compact_ivf_pq_index,
        read_ivf_pq_index,
    )
    from tweetaggregates_spark.sources.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    b0 = emb.filter(F.col("vec_id") % 3 == 0)
    b1 = emb.filter(F.col("vec_id") % 3 == 1)
    b2 = emb.filter(F.col("vec_id") % 3 == 2)
    root = tempfile.mkdtemp(prefix="ivf_compact_")
    try:
        build_ivf_pq_index(
            b0, root, n_cells=4, m_subvectors=4, k_codes=16,
            coarse_iters=0, pq_iters=0, encode_residuals=False,
        )
        append_to_ivf_pq_index(b1, root, ingest_id="0")
        append_to_ivf_pq_index(b2, root, ingest_id="1")
        full_before = _codes_rows(read_ivf_pq_index(spark, root))
        pre1_before = _codes_rows(read_ivf_pq_index(spark, root, below=1))

        # partial compaction: fold base + ingest 0, carry ingest 1
        compact_ivf_pq_index(spark, root, below=1)
        assert _codes_rows(read_ivf_pq_index(spark, root)) == full_before
        assert (
            _codes_rows(read_ivf_pq_index(spark, root, below=1))
            == pre1_before
        )
        bid = spark.read.parquet(f"{root}/meta").first().build_id
        parts = sorted(os.listdir(f"{root}/codes_{bid}"))
        assert [p for p in parts if p.startswith("ingest=")] == [
            "ingest=1", "ingest=base",
        ]

        # full compaction: everything folds into base, one build left
        compact_ivf_pq_index(spark, root)
        assert _codes_rows(read_ivf_pq_index(spark, root)) == full_before
        bid = spark.read.parquet(f"{root}/meta").first().build_id
        parts = sorted(os.listdir(f"{root}/codes_{bid}"))
        assert [p for p in parts if p.startswith("ingest=")] == [
            "ingest=base",
        ]
        builds = [
            n for n in os.listdir(root)
            if re.fullmatch(r"codes(_[0-9a-f]{12})?", n)
        ]
        assert builds == [f"codes_{bid}"]  # stale builds pruned
        # quantizers carried unchanged through both compactions
        idx = read_ivf_pq_index(spark, root)
        assert idx.avg_assign_dist is not None
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_substring_trim_internal_consistency(spark):
    """Conservation pins over the full registered sf0.01 output:
    retokenizing text_deduped yields exactly n_tokens_kept tokens
    (tokens are alnum runs, so a space-join of kept slices
    retokenizes to itself), and kept counts never exceed totals."""
    from tweetaggregates_spark.functions.textstats import tokens
    from tweetaggregates_spark.plans import llm

    out = llm.substring_trim_docs(spark, SF)
    bad = out.filter(
        (F.size(tokens(F.col("text_deduped"))) != F.col("n_tokens_kept"))
        | (F.col("n_chunks_kept") > F.col("n_chunks"))
        | (F.col("n_tokens_kept") < 0)
    )
    assert bad.count() == 0


def test_quality_calibrated_keep_fraction_exact(spark):
    """The integer cut keeps exactly floor(4n/5) docs per source."""
    from tweetaggregates_spark.plans import llm

    per = (
        llm.quality_calibrated_docs(spark, SF)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("keep").cast("int")).alias("kept"),
        )
    )
    bad = per.filter(F.col("kept") != (4 * F.col("n") - (4 * F.col("n")) % 5) / 5)
    assert per.count() > 1
    assert bad.count() == 0


def test_canonical_urls_idempotent_randomized(spark):
    """Idempotence over a seeded generator of adversarial URLs (case
    soup, default and odd ports, tracking and real params in any
    order, fragments, trailing slashes): one pass reaches the
    fixpoint for every generated URL."""
    import random

    from tweetaggregates_spark.operators.text import canonical_urls

    rng = random.Random(12012)
    urls = []
    for i in range(200):
        scheme = rng.choice(["http", "https", "HTTP", "HtTpS"]).lower()
        # scheme case is synthesized lowercase: URL_RE only matches
        # lowercase schemes (documented extraction contract)
        host = rng.choice(
            ["Example.COM", "www.example.com", "sub.www.ex.org", "ex.net"]
        )
        port = rng.choice(["", ":80", ":443", ":8080"])
        path = rng.choice(["", "/", "/a", "/a/B/", "/x//"])
        params = rng.sample(
            ["utm_source=x", "b=2", "a=1", "fbclid=z", "ref=t", "q=hi"],
            k=rng.randint(0, 4),
        )
        query = "?" + "&".join(params) if params else ""
        frag = rng.choice(["", "#f", "#a>b"])
        urls.append((i, f"pre {scheme}://{host}{port}{path}{query}{frag} post"))
    df = spark.createDataFrame(urls, "doc_id BIGINT, text STRING")
    first = canonical_urls(df).select("doc_id", "canonical_url")
    again = canonical_urls(
        first.select(
            "doc_id",
            F.concat(F.lit("x "), F.col("canonical_url"), F.lit(" y"))
            .alias("text"),
        )
    )
    assert again.filter(F.col("url") != F.col("canonical_url")).count() == 0


def test_corpus_diff_statuses(spark):
    """Snapshot diff semantics on a hand-built pair of versions."""
    from tweetaggregates_spark.operators.dedup import corpus_diff

    old = spark.createDataFrame(
        [(1, "same text"), (2, "will change"), (3, "will vanish")],
        "doc_id BIGINT, text STRING",
    )
    new = spark.createDataFrame(
        [(1, "same text"), (2, "did change"), (4, "brand new")],
        "doc_id BIGINT, text STRING",
    )
    out = {r["doc_id"]: r for r in corpus_diff(old, new).collect()}
    assert len(out) == 4
    assert out[1]["status"] == "unchanged"
    assert out[2]["status"] == "changed"
    assert out[2]["old_hash"] != out[2]["new_hash"]
    assert out[3]["status"] == "removed" and out[3]["new_hash"] is None
    assert out[4]["status"] == "added" and out[4]["old_hash"] is None


def test_corpus_diff_docs_nonvacuous(spark):
    """The synthesized v1/v2 pair exercises all four statuses."""
    from tweetaggregates_spark.plans import llm

    counts = {
        r["status"]: r["n"]
        for r in llm.corpus_diff_docs(spark, SF)
        .groupBy("status").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert set(counts) == {"added", "removed", "changed", "unchanged"}
    assert all(v > 0 for v in counts.values())


def test_dataset_card_values(spark):
    """The datasheet row's arithmetic on a hand-built corpus: counts,
    totals, cardinalities, and the exact-dup rate."""
    from tweetaggregates_spark.operators.text import dataset_card

    df = spark.createDataFrame(
        [
            (1, "one two three", "web", "en"),
            (2, "one two three", "web", "en"),  # exact dup of 1
            (3, "quatre cinq", "books", "fr"),
            (4, "six", "web", "en"),
        ],
        "doc_id BIGINT, text STRING, source STRING, lang STRING",
    )
    r = dataset_card(df).collect()[0]
    assert r["n_docs"] == 4
    assert r["n_tokens"] == 3 + 3 + 2 + 1
    assert r["n_chars"] == 13 + 13 + 11 + 3
    assert r["mean_doc_tokens"] == 2.25
    assert r["n_sources"] == 2 and r["n_langs"] == 2
    assert r["dup_rate"] == 0.25  # 3 distinct hashes of 4 docs
    assert 0.0 < r["mean_quality"] <= 1.0


def test_snapshot_ingest_matches_oneshot(spark):
    """The diff-driven ingest (re-process ONLY added+changed) folds to
    the same index as a one-shot exact_dedup over v1 plus that slice,
    and the slice is strictly smaller than v2 — removed and unchanged
    docs never re-process."""
    from tweetaggregates_spark.operators import dedup
    from tweetaggregates_spark.plans import llm
    from tweetaggregates_spark.plans.llm import _docs, _docs_snapshot_v2

    docs = _docs(spark, SF).select("doc_id", "text")
    v2 = _docs_snapshot_v2(docs)
    diff = dedup.corpus_diff(docs, v2)
    n_batch = diff.filter(
        F.col("status").isin("added", "changed")
    ).count()
    assert 0 < n_batch < v2.count()

    updated = llm.snapshot_ingest_docs(spark, SF)
    oneshot = dedup.exact_dedup(
        docs.unionAll(
            diff.filter(F.col("status").isin("added", "changed"))
            .select("doc_id").join(v2, "doc_id").select("doc_id", "text")
        )
    )
    assert sorted(map(tuple, updated.collect())) == sorted(
        map(tuple, oneshot.collect())
    )


def test_oph_densification_no_nulls(spark):
    """A doc with ONE shingle (one non-empty bucket) densifies every
    other bucket by circular borrow + offset: the signature has no
    nulls, and each borrowed value is the base hash plus its borrow
    distance."""
    from tweetaggregates_spark.functions.hashing import hash64
    from tweetaggregates_spark.operators.dedup import (
        minhash_signatures_oph,
    )

    df = spark.createDataFrame(
        [(1, "alpha beta gamma")], "doc_id BIGINT, text STRING"
    )
    sig = minhash_signatures_oph(df).collect()[0]
    vals = [sig[f"mh{i}"] for i in range(16)]
    assert all(v is not None for v in vals)
    h = spark.range(1).select(
        hash64(F.lit("alpha beta gamma")).alias("h")
    ).first().h
    home = h % 16
    for i in range(16):
        assert vals[i] == h + (home - i) % 16


def test_oph_catches_planted_duplicates(spark):
    """Identical docs have identical OPH signatures, so every planted
    full copy in the duplicated crawl MUST band together — exact-dup
    recall of the banding is structurally 1."""
    from tweetaggregates_spark.plans import llm

    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in llm.oph_lsh_pairs_docs(spark, SF).collect()
    }
    docs = llm._docs(spark, SF)
    planted = {
        (d, d + 1_000_000)
        for (d,) in docs.filter(F.col("doc_id") % 5 == 0)
        .select("doc_id").collect()
    }
    assert planted <= pairs


def test_lang_segments_mixture(spark):
    """Per-segment language ID: an embedded second-language sentence
    flags the doc as mixed with the right per-language counts; a
    monolingual doc stays unmixed; a doc with no classifiable segment
    stays visible as (0 segments, 'unknown', unmixed)."""
    from tweetaggregates_spark.operators.text import lang_segments

    en = ("the and that have this with from they which were "
          "said each them many")
    es = "el que los se del las por con una su"
    df = spark.createDataFrame(
        [
            (1, f"{en}. {es}."),          # en doc + planted es segment
            (2, f"{en}. {en} also. {en}"),  # monolingual, 3 segments
            (3, "xy zq"),                  # too short to classify
        ],
        "doc_id BIGINT, text STRING",
    )
    out = {r["doc_id"]: r for r in lang_segments(df).collect()}
    assert out[1]["n_segments"] == 2
    assert out[1]["n_en"] == 1 and out[1]["n_es"] == 1
    assert out[1]["majority_lang"] == "en"  # tie order en > es
    assert out[1]["is_mixed"]
    assert out[2]["n_segments"] == 3 and out[2]["n_en"] == 3
    assert out[2]["majority_lang"] == "en" and not out[2]["is_mixed"]
    assert out[3]["n_segments"] == 0
    assert out[3]["majority_lang"] == "unknown" and not out[3]["is_mixed"]


def test_lang_segments_docs_nonvacuous(spark):
    """The registered mixed-language corpus must produce genuinely
    mixed documents (the planted foreign segments detected) and keep
    every doc visible."""
    from tweetaggregates_spark.plans import llm

    out = llm.lang_segments_docs(spark, SF)
    assert out.count() == 500
    mixed = out.filter(F.col("is_mixed"))
    assert mixed.count() > 0
    # the planted languages actually register
    assert out.agg(F.sum("n_es")).first()[0] > 0
    assert out.agg(F.sum("n_de")).first()[0] > 0


def test_filtered_ann_overfetch_recovery(spark):
    """Post-filter ANN collapses at low overfetch (survivors < k when
    selectivity ~10%) and recovers monotonically; with full probing
    and exhaustive overfetch it EQUALS the pre-filtered exact search
    — the structural correctness bound of the post-filter strategy."""
    from tweetaggregates_spark.operators import similarity as sim
    from tweetaggregates_spark.sources.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    queries = emb.filter(F.col("vec_id") < 20)
    pred = F.col("label") == 1
    exact = sim.knn_bruteforce(emb.filter(pred), queries)

    def mean_recall(n_probe, overfetch):
        ap = sim.knn_ivf_postfilter(
            emb, queries, pred, k=5, n_cells=8,
            n_probe=n_probe, overfetch=overfetch,
        )
        return sim.ann_recall(exact, ap, 5).agg(
            F.avg("recall").alias("m")
        ).first().m

    r_low = mean_recall(2, 2)
    r_mid = mean_recall(2, 8)
    r_full = mean_recall(8, 100)  # full probe + exhaustive over-fetch
    assert r_low < 0.5  # the documented collapse at ~10% selectivity
    assert r_low < r_mid < r_full
    assert r_full == 1.0

    # structural equality at the exhaustive setting, not just recall:
    rows_exact = sorted(
        tuple(r) for r in exact.select(
            "query_id", "neighbor_id", "cos_sim", "knn_rank"
        ).collect()
    )
    ap_full = sim.knn_ivf_postfilter(
        emb, queries, pred, k=5, n_cells=8, n_probe=8, overfetch=100,
    )
    rows_ap = sorted(tuple(r) for r in ap_full.collect())
    assert rows_exact == rows_ap


def _st_words(prefix, n):
    return " ".join(f"{prefix}{i}" for i in range(n))


def test_substring_trim_span_semantics(spark):
    """Long duplicated spans trim from the non-keeper occurrence only;
    short duplicates survive everywhere; unique text always stays."""
    from tweetaggregates_spark.operators.dedup import substring_trim

    shared = _st_words("shared", 60)
    short = _st_words("tiny", 8)
    df = spark.createDataFrame(
        [
            (1, _st_words("ua", 10) + " " + shared + " " + _st_words("va", 10)),
            (2, _st_words("wb", 10) + " " + shared + " " + _st_words("xb", 10)),
            (3, short),
            (4, short),
            (5, _st_words("uniq", 25)),
        ],
        "doc_id BIGINT, text STRING",
    )
    out = {
        r["doc_id"]: r
        for r in substring_trim(df, min_span_tokens=20).collect()
    }
    # doc 1 is the keeper occurrence of every shared chunk: fully kept
    assert out[1]["n_chunks_kept"] == out[1]["n_chunks"]
    assert out[1]["n_tokens_kept"] == 80
    # doc 2 loses the bulk of the 60-token shared span but keeps its
    # unique surroundings (edge chunks may straddle the boundary)
    kept2 = out[2]["text_deduped"].split()
    assert out[2]["n_tokens_kept"] < 80
    assert 80 - out[2]["n_tokens_kept"] >= 20  # a real span went
    assert all(w in kept2 for w in ("wb0", "wb9", "xb9"))
    # the 8-token whole-doc duplicate is below the span threshold:
    # BOTH copies keep it (cdc_trim would have emptied doc 4)
    assert out[3]["n_tokens_kept"] == 8
    assert out[4]["n_tokens_kept"] == 8
    # unique doc untouched
    assert out[5]["n_tokens_kept"] == 25
    assert out[5]["n_chunks_kept"] == out[5]["n_chunks"]


def test_substring_trim_identical_docs(spark):
    """A full duplicate above the threshold trims to empty text in the
    non-keeper copy — the whole doc is one maximal run."""
    from tweetaggregates_spark.operators.dedup import substring_trim

    body = _st_words("dup", 40)
    df = spark.createDataFrame(
        [(7, body), (8, body)], "doc_id BIGINT, text STRING"
    )
    out = {
        r["doc_id"]: r
        for r in substring_trim(df, min_span_tokens=20).collect()
    }
    assert out[7]["n_tokens_kept"] == 40
    assert out[8]["n_tokens_kept"] == 0
    assert out[8]["text_deduped"] == ""
    assert out[8]["n_chunks"] > 0  # doc stays visible with drop counts


def test_substring_trim_vs_cdc_trim_spares_short(spark):
    """On the plain sf0.01 corpus the span threshold must spare docs
    that cdc_trim would cut: strictly fewer trimmed docs."""
    from tweetaggregates_spark.operators.dedup import cdc_trim, substring_trim
    from tweetaggregates_spark.plans import llm

    docs = llm._docs(spark, SF)
    n_span = (
        substring_trim(docs)
        .filter(F.col("n_chunks_kept") < F.col("n_chunks"))
        .count()
    )
    n_cdc = (
        cdc_trim(docs)
        .filter(F.col("n_chunks_kept") < F.col("n_chunks"))
        .count()
    )
    assert 0 < n_span < n_cdc


def test_canonical_urls_idempotent(spark):
    """Canonicalization is a FIXPOINT: re-canonicalizing a canonical
    URL changes nothing. Checked over the registered entry's full
    sf0.01 output — every canonical_url, fed back through the
    operator, maps to itself."""
    from tweetaggregates_spark.operators.text import canonical_urls
    from tweetaggregates_spark.plans import llm

    first = llm.url_canonical_docs(spark, SF).select(
        F.col("doc_id"), F.col("canonical_url")
    )
    again = canonical_urls(
        first.select(
            "doc_id",
            F.concat(F.lit("see "), F.col("canonical_url"), F.lit(" end"))
            .alias("text"),
        )
    )
    diff = again.filter(F.col("url") != F.col("canonical_url")).count()
    assert diff == 0


def test_url_canonical_docs_nonvacuous(spark):
    """At sf0.01 the variant synthesis plants 3-way mergers: some rows
    must be non-keepers, and every 6-group's 0/1/2 variants share one
    canonical URL."""
    from tweetaggregates_spark.plans import llm

    out = llm.url_canonical_docs(spark, SF)
    n_urls = out.count()
    n_non_keeper = out.filter(~F.col("is_keeper")).count()
    assert n_urls > 0 and n_non_keeper > 0
    trio = (
        out.filter(F.col("doc_id") % 6 < 3)
        .groupBy((F.col("doc_id") - F.col("doc_id") % 6).alias("g"))
        .agg(F.countDistinct("canonical_url").alias("n"))
    )
    assert trio.filter(F.col("n") != 1).count() == 0
