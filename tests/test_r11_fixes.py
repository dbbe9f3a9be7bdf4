"""Round-11 regression pins for the round-10 ADVICE findings.

* parse_image_dims: ITU T.81 permits 0xFF fill bytes before any marker
  and length-less standalone markers (TEM 0x01, RSTn 0xD0-0xD7); the
  walker must skip both instead of misreading the next bytes as a
  segment length (ADVICE r10 low).
* entity_window_agg_bounded: carry_cols feed only the count/sum
  branch; they must NOT flow through the examples rank sort
  (ADVICE r10 low — shuffle-byte accounting).
* ann_recall: recall divides by the per-query exact-neighbor count,
  so a perfect index on a corpus smaller than k+1 scores 1.0
  (ADVICE r10 low).
* pair_recall: duplicate rows in either pair input must not multiply
  through the join (ADVICE r10 low).
"""

import pyspark.sql.functions as F

from tweetaggregates_spark.operators.multimodal import (
    _JPEG_POST,
    _JPEG_PRE,
    parse_image_dims,
)


def _sof(h, w):
    return (
        b"\xff\xc0\x00\x11\x08"
        + h.to_bytes(2, "big")
        + w.to_bytes(2, "big")
        + _JPEG_POST
    )


class TestJpegMarkerWalker:
    def test_fill_bytes_before_markers(self):
        # T.81 B.1.1.2: any number of 0xFF fill bytes may precede the
        # marker code byte.
        p = (
            b"\xff\xd8"
            + b"\xff\xff\xff"  # two fill bytes then the APP0 marker's FF
            + b"\xe0\x00\x10JFIF\x00\x01\x02\x00\x00\x48\x00\x48\x00\x00"
            + b"\xff\xff"  # one fill byte before SOF0
            + _sof(300, 400)[1:]
        )
        assert parse_image_dims(p) == ("image/jpeg", 400, 300)

    def test_standalone_tem_and_rst_markers(self):
        # TEM (0x01) and RSTn (0xD0-0xD7) carry no length field.
        p = b"\xff\xd8" + b"\xff\x01" + b"\xff\xd0" + b"\xff\xd7" + _sof(111, 222)
        assert parse_image_dims(p) == ("image/jpeg", 222, 111)

    def test_synthetic_layout_unchanged(self):
        p = _JPEG_PRE + (64).to_bytes(2, "big") + (128).to_bytes(2, "big") + _JPEG_POST
        assert parse_image_dims(p) == ("image/jpeg", 128, 64)

    def test_truncation_returns_none(self):
        assert parse_image_dims(b"\xff\xd8\xff\xff\xff\xff\xff\xff\xff\xff") is None
        assert parse_image_dims(b"\xff\xd8\xff\xc0\x00\x11\x08\x00\x01\x00") is None
        assert parse_image_dims(b"\xff\xd8\xff\xe0\x00\x01\x00\x00\x00\x00") is None


def test_bounded_agg_examples_branch_drops_carry_cols(spark):
    """The examples (rank-sort) subtree must not reference carry
    columns — they ride only the count/sum exchange."""
    from tweetaggregates_spark.operators.aggregate import (
        entity_window_agg_bounded,
    )

    df = spark.createDataFrame(
        [("2024-01-01 00:00:07", "u1", 10, "payload text", "carried text")],
        "ts_s string, user string, followers int, txt string, big string",
    ).select(F.to_timestamp("ts_s").alias("ts"), "user", "followers", "txt", "big")
    out = entity_window_agg_bounded(
        df,
        "user",
        "followers",
        [F.col("txt").alias("text")],
        carry_cols=["big"],
        extra_aggs=[F.max("big").alias("max_big")],
    )
    # correctness: carried agg still present and right
    row = out.collect()[0]
    assert row["max_big"] == "carried text"
    assert row["top_payloads"][0]["text"] == "payload text"
    # plan: no Window (rank) operator consumes the carry column
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    for line in plan.splitlines():
        if "row_number" in line.lower():
            assert "big" not in line


def test_ann_recall_small_corpus_reaches_one(spark):
    """Perfect index, corpus of 3 vectors, k=5: every query has only
    2 exact neighbors — recall must be 1.0, not 2/5."""
    from tweetaggregates_spark.operators.similarity import (
        ann_recall,
        knn_bruteforce_l2,
    )

    emb = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [1.0, 0.0]), (3, [0.0, 2.0])],
        "vec_id int, embedding array<double>",
    )
    exact = knn_bruteforce_l2(emb, emb, k=5)
    out = {r["query_id"]: r for r in ann_recall(exact, exact, k=5).collect()}
    assert len(out) == 3
    for r in out.values():
        assert r["n_hits"] == 2
        assert abs(r["recall"] - 1.0) < 1e-9


def test_pair_recall_duplicate_rows_do_not_inflate(spark):
    from tweetaggregates_spark.operators.dedup import pair_recall

    truth = spark.createDataFrame(
        [(1, 2), (1, 2), (3, 4)], "doc_a int, doc_b int"
    )
    cand = spark.createDataFrame(
        [(1, 2), (1, 2), (1, 2), (5, 6)], "doc_a int, doc_b int"
    )
    r = pair_recall(truth, cand).collect()[0]
    assert r["n_truth"] == 2
    assert r["n_cand"] == 2
    assert r["n_hit"] == 1
    assert abs(r["recall"] - 0.5) < 1e-9
    assert abs(r["precision"] - 0.5) < 1e-9


def test_kll_items_filter_precedes_weight_projection(spark):
    """r11 KLL plan-quality pin: the keep decision must be a cheap
    bit-predicate FILTER below the weight projection — the former
    compute-w-then-filter shape inlined the full lstar tree ~8x per
    input row under whole-stage codegen (and at 32 indicator terms
    overflowed janino's 64 KB method limit, silently dropping the
    stage to interpreted execution — the r10 bench instability)."""
    from tweetaggregates_spark.operators.kllsketch import kll_sketch_items

    df = spark.createDataFrame(
        [(g, i, float(i * 7 % 97)) for g in (1, 2) for i in range(200)],
        "g int, event_id int, value double",
    )
    items = kll_sketch_items(df, ["g"], "value", "event_id", k=16)
    plan = items._jdf.queryExecution().optimizedPlan().toString()
    # the keep predicate is the cheap bit-twiddle form, pushed into a
    # Filter or the rank join condition
    assert "bit_count" in plan
    # ... and the weight CASE expression rides only the survivors'
    # Project — never a Filter/Join condition (the old shape evaluated
    # the full weight tree per input row to test IS NOT NULL)
    for ln in plan.splitlines():
        node = ln.strip().lstrip("+:- ")
        if node.startswith(("Filter", "Join")):
            assert "CASE WHEN" not in ln, ln
    # and the per-group invariant: <= k + log2(n) + 1 items, weights sum to n
    import math

    rows = items.collect()
    by_g = {}
    for r in rows:
        by_g.setdefault(r["g"], []).append(r)
    for g, rs in by_g.items():
        n = rs[0]["_n"]
        assert len(rs) <= 16 + int(math.log2(n)) + 2
        assert sum(r["_w"] for r in rs) == n
