"""Round-10 regression pins for the round-9 ADVICE findings.

* kcenter_coreset_batched: a mid-loop zero min-dist in a FULL-fetch
  round (a duplicate of a just-accepted center) must NOT trigger the
  all-zero endgame — points outside the batch can still be far
  (ADVICE r9 high; exact reproduction case from the advice).
* line_dedup: NULL-text docs stay visible (behave like an empty doc)
  and a regex-special ``sep`` is treated literally (ADVICE r9 low).
* quality classifier labeling: a NULL-text doc labels 0 like the
  DuckDB twin's coalesce, never NULL (ADVICE r9 low).
"""

import pyspark.sql.functions as F

from tweetaggregates_spark.operators.cluster import (
    kcenter_coreset,
    kcenter_coreset_batched,
)
from tweetaggregates_spark.operators.text import line_dedup


def test_kcenter_batched_midloop_zero_does_not_end_run(spark):
    # ids 2 and 3 are duplicates; after accepting one of them its twin
    # pops with min-dist 0 mid-loop while id 4 (outside the batch of 2)
    # still sits at distance 16 from every chosen center.
    rows = [
        (1, [0.0, 0.0]),
        (2, [10.0, 0.0]),
        (3, [10.0, 0.0]),
        (4, [6.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    seq = sorted(
        kcenter_coreset(df, k=3).collect(), key=lambda r: r.center_rank
    )
    bat = sorted(
        kcenter_coreset_batched(df, k=3, batch=2).collect(),
        key=lambda r: r.center_rank,
    )
    assert [(r.center_rank, r.vec_id, r.min_dist) for r in bat] == [
        (r.center_rank, r.vec_id, r.min_dist) for r in seq
    ]
    # and specifically rank 2 is the outside point, not a 0.0 seed fill
    assert (bat[2].vec_id, bat[2].min_dist) == (4, 16.0)


def test_kcenter_batched_endgame_still_fills_on_true_exhaustion(spark):
    # duplicate-heavy corpus with k > n_distinct: after all distinct
    # points are chosen the global max min-dist IS 0 and the remaining
    # ranks fill with the seed at 0.0, matching the sequential path.
    rows = [(i, [float(i % 2), 0.0]) for i in range(1, 7)]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    seq = sorted(
        kcenter_coreset(df, k=5).collect(), key=lambda r: r.center_rank
    )
    bat = sorted(
        kcenter_coreset_batched(df, k=5, batch=3).collect(),
        key=lambda r: r.center_rank,
    )
    assert [(r.center_rank, r.vec_id, r.min_dist) for r in bat] == [
        (r.center_rank, r.vec_id, r.min_dist) for r in seq
    ]


def test_line_dedup_null_text_doc_stays_visible(spark):
    df = spark.createDataFrame(
        [(1, "a\nb"), (2, None), (3, "a\nc")],
        "doc_id int, text string",
    )
    out = {r.doc_id: r for r in line_dedup(df, max_occurrences=1).collect()}
    assert set(out) == {1, 2, 3}
    # NULL behaves like an empty doc: one (empty) line, which is unique
    # in this corpus so it survives
    assert out[2].n_lines == 1
    assert out[2].text == ""
    # boilerplate line 'a' (2 occurrences) dropped from both docs
    assert out[1].text == "b" and out[3].text == "c"


def test_line_dedup_literal_sep(spark):
    # '.' is a regex wildcard; un-escaped it would split on EVERY char
    df = spark.createDataFrame(
        [(1, "x.y"), (2, "x.z")], "doc_id int, text string"
    )
    out = {
        r.doc_id: r
        for r in line_dedup(df, max_occurrences=1, sep=".").collect()
    }
    assert out[1].n_lines == 2
    assert out[1].text == "y" and out[2].text == "z"


def test_quality_classifier_label_null_text_is_zero(spark, tmp_path):
    # replicate the labeling expression from plans/llm.quality_classifier_docs
    from tweetaggregates_spark.functions.textstats import tokens

    df = spark.createDataFrame(
        [(1, None), (2, "excellent considerable vocabulary")],
        "doc_id int, text string",
    )
    toks = tokens(F.col("text"))
    sum_len = F.aggregate(
        F.transform(toks, F.length), F.lit(0), lambda acc, x: acc + x
    )
    labeled = df.withColumn(
        "label",
        F.coalesce(
            (sum_len * 2 >= F.size(toks) * 9).cast("int"), F.lit(0)
        ),
    )
    got = {r.doc_id: r.label for r in labeled.collect()}
    assert got[1] == 0  # NULL text -> 0, matching the twin's coalesce
    assert got[2] == 1
