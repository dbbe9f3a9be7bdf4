"""Round-9 hardening pins (ADVICE r8):

* kcenter_coreset_batched at k >= n_rows (all-zero min-dist endgame)
  matches the sequential greedy / shared SQL oracle exactly instead of
  admitting batch leftovers (already-chosen centers) in corpus order;
* dsir_log_weights scores a NULL-text doc 0.0 (like an empty doc) so
  dsir_select keeps it at keep_prob 1.0 — matching the DuckDB twin's
  LEFT JOIN + coalesce — instead of silently dropping it;
* compact_band_index's no-op early return still creates/refreshes the
  bucketed_table catalog mirror (read_band_index_parts(base_table=...)
  relies on it; the pre-r8 path always wrote it);
* grouped_kmeans with an EMPTY dict k raises a clear ValueError, not
  AttributeError('NoneType' has no 'otherwise').
"""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F

from tweetaggregates_spark.operators import dedup
from tweetaggregates_spark.operators.cluster import (
    grouped_kmeans,
    kcenter_coreset,
    kcenter_coreset_batched,
)
from tweetaggregates_spark.operators.sampling import (
    dsir_log_weights,
    dsir_select,
)


def _vecs(spark, rows):
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


class TestKcenterBatchedKAboveCorpus:
    def test_k_at_and_above_n_rows_matches_sequential(self, spark):
        """k >= n: after every point is a center the sequential path
        re-picks the lowest corpus id (the seed) at min_dist 0.0 for
        every remaining rank; the batched path must emit the identical
        sequence (it previously admitted each already-chosen center
        once, in corpus order, under the short-fetch m_p=-inf rule)."""
        df = _vecs(
            spark,
            [
                (1, [0.0, 0.0]),
                (2, [3.0, 4.0]),
                (3, [6.0, 0.0]),
            ],
        )
        for k in (3, 5, 7):
            seq = [
                tuple(r)
                for r in kcenter_coreset(df, k=k).orderBy("center_rank").collect()
            ]
            for batch in (1, 2, 16):
                bat = [
                    tuple(r)
                    for r in kcenter_coreset_batched(df, k=k, batch=batch)
                    .orderBy("center_rank")
                    .collect()
                ]
                assert bat == seq, (k, batch)
            if k > 3:
                # the fill is the seed (lowest id), not batch leftovers
                assert [t[1] for t in seq[3:]] == [1] * (k - 3)
                assert all(t[2] == 0.0 for t in seq[3:])

    def test_duplicate_vectors_zero_endgame(self, spark):
        """Duplicate-heavy corpus: max min-dist hits 0 BEFORE ranks run
        out; both paths must fall back to the seed together."""
        df = _vecs(
            spark,
            [
                (10, [1.0, 1.0]),
                (11, [1.0, 1.0]),
                (12, [5.0, 5.0]),
                (13, [5.0, 5.0]),
            ],
        )
        seq = [
            tuple(r)
            for r in kcenter_coreset(df, k=4).orderBy("center_rank").collect()
        ]
        bat = [
            tuple(r)
            for r in kcenter_coreset_batched(df, k=4, batch=16)
            .orderBy("center_rank")
            .collect()
        ]
        assert bat == seq
        # ranks 2+ are all-zero: sequential picks the lowest corpus id
        assert [t[1] for t in seq[2:]] == [10, 10]


class TestDsirNullText:
    def test_null_text_scores_zero_and_is_kept(self, spark):
        docs = spark.createDataFrame(
            [
                (1, "the quick brown fox"),
                (2, None),
                (3, ""),
            ],
            ["doc_id", "text"],
        )
        target = spark.createDataFrame(
            [(100, "quick quick fox")], ["doc_id", "text"]
        )
        scored = {
            r.doc_id: r.log_weight
            for r in dsir_log_weights(docs, target).collect()
        }
        assert scored[2] == 0.0  # NULL text == empty text, not NULL
        assert scored[2] == scored[3]
        kept = {r.doc_id for r in dsir_select(docs, target).collect()}
        assert 2 in kept and 3 in kept  # keep_prob e^0 = 1.0


class TestCompactNoopMirror:
    def test_noop_recompaction_still_writes_mirror(self, spark, tmp_path):
        path = str(tmp_path / "band_index")
        table = f"band_mirror_{uuid.uuid4().hex[:8]}"
        try:
            b1 = spark.createDataFrame(
                [
                    (10, "apple banana cherry date elderberry fig grape"),
                    (20, "kiwi lemon mango nectarine orange papaya quince"),
                ],
                ["doc_id", "text"],
            )
            dedup.append_band_index_delta(
                dedup.build_band_index(b1),
                spark.createDataFrame([], dedup.REMAP_SCHEMA),
                path,
                0,
            )
            # first compaction WITHOUT a mirror: base exists, no deltas
            folded1 = dedup.compact_band_index(spark, path)
            # no-op recompaction WITH bucketed_table: the early return
            # must still create the catalog mirror
            dedup.compact_band_index(
                spark, path, bucketed_table=table, n_buckets=8
            )
            assert spark.catalog.tableExists(table)
            parts, remap = dedup.read_band_index_parts(
                spark, path, base_table=table
            )
            got = set()
            for p in parts:
                got |= {
                    (r.doc_id, r.band_id, r.band_key) for r in p.collect()
                }
            want = {
                (r.doc_id, r.band_id, r.band_key) for r in folded1.collect()
            }
            assert got == want
        finally:
            spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_grouped_kmeans_empty_dict_raises(spark):
    df = spark.createDataFrame(
        [("g", 1, [0.0, 1.0])], ["grp", "vec_id", "embedding"]
    )
    with pytest.raises(ValueError, match="empty k dict"):
        grouped_kmeans(
            df, group_col="grp", id_col="vec_id", vec_col="embedding", k={}
        )
