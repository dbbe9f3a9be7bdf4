"""Round-8 operator pins: DSIR importance weights (VERDICT r7 #5)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tweetaggregates_spark.operators.sampling import (
    dsir_log_weights,
    dsir_select,
)
from tweetaggregates_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


class TestDsir:
    def _frames(self, spark):
        docs = load_table(spark, SF, "documents").select(
            "doc_id", "lang", "text"
        )
        return docs, docs.filter(F.col("lang") == "en")

    def test_target_docs_score_higher(self, spark):
        """The defining DSIR property: target-domain docs get higher
        importance weights than off-domain docs on average (here the
        en/non-en token distributions differ by construction)."""
        docs, target = self._frames(spark)
        scored = dsir_log_weights(docs, target)
        means = dict(
            scored.withColumn("is_t", F.col("lang") == "en")
            .groupBy("is_t")
            .agg(F.avg("log_weight").alias("m"))
            .collect()
        )
        assert means[True] > means[False]

    def test_empty_doc_scores_zero(self, spark):
        docs = spark.createDataFrame(
            [(1, "en", "spark rows"), (2, "xx", ""), (3, "xx", "!!!")],
            "doc_id BIGINT, lang STRING, text STRING",
        )
        scored = dsir_log_weights(docs, docs.filter("lang = 'en'"))
        got = {r.doc_id: r.log_weight for r in scored.collect()}
        assert got[2] == 0.0 and got[3] == 0.0

    def test_scoring_pass_is_map_only(self, spark):
        """After the two count aggregates (driven at build time), the
        scoring projection itself has no exchange, join, or generate:
        the ratios ship as a literal array and each doc folds its own
        features."""
        docs, target = self._frames(spark)
        scored = dsir_log_weights(docs, target)
        plan = scored._jdf.queryExecution().executedPlan().toString()
        # load_table's round-robin repartition of the tiny testdata is
        # the one permitted exchange; the scoring adds none of its own
        for line in plan.splitlines():
            if "Exchange" in line:
                assert "RoundRobinPartitioning" in line, line
            for op in ("Join", "Generate"):
                assert op not in line, line

    def test_select_keep_matches_rule(self, spark):
        """dsir_select == filter(sample_bucket < keep_prob * BUCKETS)
        applied to the scored frame (weighted_sample equivalence)."""
        from tweetaggregates_spark.operators.sampling import (
            BUCKETS,
            sample_bucket,
        )

        docs, target = self._frames(spark)
        kept = {r.doc_id for r in dsir_select(docs, target).collect()}
        scored = dsir_log_weights(docs, target).withColumn(
            "keep_prob",
            F.round(F.exp(F.least(F.col("log_weight"), F.lit(0.0))), 6),
        )
        want = {
            r.doc_id
            for r in scored.filter(
                sample_bucket(F.col("doc_id"), "dsir").cast("double")
                < F.col("keep_prob") * BUCKETS
            ).collect()
        }
        assert kept == want
        assert 0 < len(kept) < docs.count()


class TestKllSketch:
    """Deterministic KLL-style rank sketch pins (VERDICT r7 #6)."""

    def _values(self, spark, n, seed=7):
        rows = [
            (i, float((i * 2654435761 + seed) % 100000) / 101.0)
            for i in range(1, n + 1)
        ]
        return spark.createDataFrame(rows, "event_id BIGINT, value DOUBLE")

    def test_closed_form_equals_sequential_cascade(self, spark):
        """The positions-mod-2^l closed form == an explicit batch
        compactor cascade (sort, promote even positions, odd-count
        remainder stays) run in plain Python on the same sorted
        order."""
        from tweetaggregates_spark.functions.hashing import hash64
        from tweetaggregates_spark.operators.kllsketch import (
            kll_sketch_items,
        )

        k = 16
        df = self._values(spark, 533).withColumn("g", F.lit(1))
        items = kll_sketch_items(df, ["g"], "value", "event_id", k=k)
        got = sorted(
            (r.value, r._w) for r in items.collect()
        )
        rows = sorted(
            df.select(
                "value", hash64(F.col("event_id").cast("string")).alias("h")
            ).collect(),
            key=lambda r: (r.value, r.h),
        )
        levels = {0: list(range(len(rows)))}
        lv = 0
        while len(levels.get(lv, [])) > k:
            arr = levels[lv]
            m = (len(arr) // 2) * 2
            levels[lv + 1] = sorted(
                levels.get(lv + 1, []) + [arr[i] for i in range(1, m, 2)]
            )
            levels[lv] = arr[m:]
            lv += 1
        want = sorted(
            (rows[i].value, 2 ** l)
            for l, arr in levels.items()
            for i in arr
        )
        assert got == want

    def test_weight_preserved_and_bound_holds(self, spark):
        """Total kept weight == n exactly, and the carried bound is
        honest: |est_rank(v) - true_rank(v)| <= err_bound_ranks for
        EVERY corpus value."""
        from tweetaggregates_spark.operators.kllsketch import (
            kll_sketch_items,
        )

        k = 32
        df = self._values(spark, 2001).withColumn("g", F.lit(1))
        items = kll_sketch_items(df, ["g"], "value", "event_id", k=k)
        rows = items.collect()
        n = rows[0]._n
        err = rows[0]._err
        assert sum(r._w for r in rows) == n == 2001
        sk = sorted((r.value, r._w) for r in rows)
        vals = sorted(r.value for r in df.collect())
        for q_idx, v in enumerate(vals, start=1):
            est = sum(w for (sv, w) in sk if sv <= v)
            assert abs(est - q_idx) <= err, (v, est, q_idx, err)

    def test_merge_is_associative_union(self, spark):
        """The mergeable state is a weighted-item bag: folding days in
        any grouping, then pruning, yields the identical result."""
        from tweetaggregates_spark.operators.kllsketch import (
            kll_prune,
        )
        from tweetaggregates_spark.plans.events import _kll_daily_items

        items = _kll_daily_items(spark, "/root/testdata/sf0.001")
        days = sorted(
            r.window_time
            for r in items.select("window_time").distinct().collect()
        )[:3]
        sub = items.filter(F.col("window_time").isin(days))
        meta = {
            r.window_time: (r._n, r._err)
            for r in sub.select("window_time", "_n", "_err")
            .distinct()
            .collect()
        }
        mn = sum(v[0] for v in meta.values())
        merr = sum(v[1] for v in meta.values())

        def fold(order):
            u = None
            for d in order:
                part = sub.filter(F.col("window_time") == d)
                u = part if u is None else u.unionByName(part)
            bag = u.select(
                F.lit(1).alias("g"), "value", "_h", "_w"
            ).withColumn("_n", F.lit(mn)).withColumn("_err", F.lit(merr))
            pruned = kll_prune(bag, ["g"], "value", k=16)
            return sorted(map(tuple, pruned.collect()))

        a = fold([days[0], days[1], days[2]])
        b = fold([days[2], days[0], days[1]])
        assert a == b
        assert 0 < len(a) <= 17  # k + 1

    def test_bound_vs_exact_at_sf01(self, spark):
        """The 'Done' pin: at sf0.1, for both the daily sketches and
        the monthly rollup, the exact rank of every estimate is within
        the CARRIED err_bound_ranks of its nearest-rank target."""
        import duckdb

        from tweetaggregates_spark.plans.events import (
            kll_value_daily,
            kll_value_monthly_rollup,
        )

        sf = "/root/testdata/sf0.1"
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS "
            f"SELECT * FROM read_parquet('{sf}/events.parquet')"
        )

        def rank_of(day_filter: str, v: float) -> tuple[int, int]:
            lo, hi = con.execute(
                f"SELECT count(*) FILTER (WHERE value < {v!r}), "
                f"count(*) FILTER (WHERE value <= {v!r}) "
                f"FROM events WHERE {day_filter}"
            ).fetchone()
            return lo + 1, hi  # the value occupies ranks [lo+1, hi]

        for r in kll_value_daily(spark, sf).collect():
            day = r.window_time
            flt = (
                f"time_bucket(INTERVAL '1 day', ts) + INTERVAL '1 day' "
                f"= TIMESTAMP '{day}'"
            )
            for q, est in ((0.5, r.p50_est), (0.9, r.p90_est)):
                target = -(-q * r.n_events // 1)
                lo, hi = rank_of(flt, est)
                dist = max(lo - target, target - hi, 0)
                assert dist <= r.err_bound_ranks, (day, q, est, dist)

        for r in kll_value_monthly_rollup(spark, sf).collect():
            flt = (
                f"date_trunc('month', time_bucket(INTERVAL '1 day', ts) "
                f"+ INTERVAL '1 day' - INTERVAL 1 second) "
                f"= TIMESTAMP '{r.month}'"
            )
            for q, est in ((0.5, r.p50_est), (0.9, r.p90_est)):
                target = -(-q * r.n_events // 1)
                lo, hi = rank_of(flt, est)
                dist = max(lo - target, target - hi, 0)
                assert dist <= r.err_bound_ranks, (q, est, dist)


class TestKcenterBatched:
    """Batched Gonzalez == sequential greedy, bit-for-bit (r7 #8)."""

    def test_radius_sequence_identical_sf0001(self, spark):
        from tweetaggregates_spark.operators.cluster import (
            kcenter_coreset,
            kcenter_coreset_batched,
        )

        emb = load_table(spark, SF, "embeddings")
        seq = kcenter_coreset(emb, k=12).collect()
        for batch in (1, 4, 16):
            bat = kcenter_coreset_batched(emb, k=12, batch=batch).collect()
            assert sorted(map(tuple, bat)) == sorted(map(tuple, seq)), batch

    def test_ties_resolved_like_sequential(self, spark):
        """A planted all-equidistant configuration (simplex corners +
        duplicates) forces m_p ties every round — the batch must defer
        them and still match the sequential order exactly."""
        from tweetaggregates_spark.operators.cluster import (
            kcenter_coreset,
            kcenter_coreset_batched,
        )

        rows = []
        for i in range(6):
            v = [0.0] * 6
            v[i] = 2.0
            rows.append((i, v))
            rows.append((10 + i, v))  # duplicate at a higher id
        df = spark.createDataFrame(
            rows, "vec_id BIGINT, embedding ARRAY<DOUBLE>"
        )
        seq = kcenter_coreset(df, k=8).collect()
        bat = kcenter_coreset_batched(df, k=8, batch=3).collect()
        assert sorted(map(tuple, bat)) == sorted(map(tuple, seq))

    def test_corpus_smaller_than_batch(self, spark):
        from tweetaggregates_spark.operators.cluster import (
            kcenter_coreset,
            kcenter_coreset_batched,
        )

        df = spark.createDataFrame(
            [(i, [float(i), 0.0]) for i in range(5)],
            "vec_id BIGINT, embedding ARRAY<DOUBLE>",
        )
        seq = kcenter_coreset(df, k=5).collect()
        bat = kcenter_coreset_batched(df, k=5, batch=64).collect()
        assert sorted(map(tuple, bat)) == sorted(map(tuple, seq))
