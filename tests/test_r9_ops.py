"""Round-9 operator pins: corpus line dedup and UniMax allocation.

(The PCA family has its own tests/test_pca.py; the oracle gate pins
cross-engine equality for all three registered queries.)
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tweetaggregates_spark.operators.sampling import unimax_plan
from tweetaggregates_spark.operators.text import line_dedup


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


class TestLineDedup:
    def test_boilerplate_dropped_content_kept_in_order(self, spark):
        df = _docs(
            spark,
            [
                (1, "BANNER\nalpha beta\ngamma delta\nBANNER2"),
                (2, "BANNER\nepsilon zeta\nBANNER2"),
                (3, "BANNER\nunique only here"),
            ],
        )
        out = {
            r.doc_id: r for r in line_dedup(df, max_occurrences=1).collect()
        }
        assert out[1].text == "alpha beta\ngamma delta"
        assert (out[1].n_lines, out[1].n_lines_kept) == (4, 2)
        assert out[2].text == "epsilon zeta"
        assert out[3].text == "unique only here"

    def test_all_boilerplate_doc_survives_empty(self, spark):
        df = _docs(spark, [(1, "SAME\nSAME2"), (2, "SAME\nSAME2")])
        out = {
            r.doc_id: r for r in line_dedup(df, max_occurrences=1).collect()
        }
        assert set(out) == {1, 2}  # docs stay visible for the funnel
        for r in out.values():
            assert r.text == "" and r.n_lines_kept == 0 and r.n_lines == 2

    def test_max_occurrences_threshold(self, spark):
        df = _docs(
            spark,
            [(1, "twice\na"), (2, "twice\nb"), (3, "thrice\nc"),
             (4, "thrice\nd"), (5, "thrice\ne")],
        )
        out = {
            r.doc_id: r.text
            for r in line_dedup(df, max_occurrences=2).collect()
        }
        # 'twice' (count 2) survives at threshold 2; 'thrice' doesn't
        assert out[1] == "twice\na"
        assert out[3] == "c"

    def test_duplicate_lines_within_one_doc_also_count(self, spark):
        # corpus-level count includes within-doc repeats (RefinedWeb
        # counts occurrences, not documents)
        df = _docs(spark, [(1, "loop\nloop\nbody")])
        r = line_dedup(df, max_occurrences=1).collect()[0]
        assert r.text == "body" and r.n_lines == 3 and r.n_lines_kept == 1

    def test_order_preserved_under_repartition(self, spark):
        lines = [f"unique line {i}" for i in range(40)]
        df = _docs(spark, [(1, "\n".join(lines))]).repartition(8)
        r = line_dedup(df).collect()[0]
        assert r.text == "\n".join(lines)


class TestUnimax:
    def _plan(self, spark, sizes, frac, epochs):
        df = spark.createDataFrame(
            [(g, int(s)) for g, s in sizes.items()], ["lang", "n_chars"]
        )
        return {
            r.lang: r
            for r in unimax_plan(
                df, "lang", "n_chars",
                budget_fraction=frac, max_epochs=epochs,
            ).collect()
        }

    def test_waterfill_caps_low_resource_first(self, spark):
        out = self._plan(
            spark, {"en": 1000, "de": 100, "zh": 50}, 1.0, 2
        )
        # B = 1150; caps: zh 100, de 200, en 2000.
        # zh: 100*3=300 <= 1150 -> capped; de: 200*2=400 <= 1050 ->
        # capped; en: 2000*1 > 850 -> theta = 850
        assert out["zh"].alloc_chars == 100.0
        assert out["de"].alloc_chars == 200.0
        assert out["en"].alloc_chars == 850.0
        assert out["zh"].epochs == 2.0 and out["en"].epochs == 0.85
        # budget conserved
        assert sum(r.alloc_chars for r in out.values()) == 1150.0

    def test_budget_above_all_caps_allocates_caps(self, spark):
        out = self._plan(spark, {"a": 10, "b": 20}, 5.0, 2)
        assert out["a"].alloc_chars == 20.0
        assert out["b"].alloc_chars == 40.0
        assert out["a"].epochs == 2.0 == out["b"].epochs

    def test_equal_groups_get_equal_shares(self, spark):
        out = self._plan(spark, {"a": 100, "b": 100, "c": 100}, 0.9, 2)
        # B = 270 < any cap*(rem): theta = 90 each
        assert {r.alloc_chars for r in out.values()} == {90.0}

    def test_partitioning_invariance(self, spark):
        rows = [(f"l{i % 7}", 10 + i) for i in range(200)]
        df = spark.createDataFrame(rows, ["lang", "n_chars"])
        a = sorted(
            map(tuple, unimax_plan(df, "lang", "n_chars").collect())
        )
        b = sorted(
            map(
                tuple,
                unimax_plan(
                    df.repartition(13), "lang", "n_chars"
                ).collect(),
            )
        )
        assert a == b


class TestQualityClassifier:
    def test_planted_lexical_signal_separates(self, spark):
        """Positive docs carry a distinctive vocabulary; 8 GD steps
        must separate the classes nearly perfectly."""
        from tweetaggregates_spark.operators.classifier import (
            logreg_quality_scores,
            logreg_quality_train,
        )

        rows = []
        for i in range(200):
            if i % 2 == 0:
                rows.append((i, 1, "excellent prose careful writing " * 4))
            else:
                rows.append((i, 0, "spam junk clickbait noise " * 4))
        df = spark.createDataFrame(rows, ["doc_id", "label", "text"])
        w = logreg_quality_train(df, "label", iters=8, lr=500.0)
        scored = logreg_quality_scores(df, w).collect()
        acc = sum(
            1 for r in scored if (r.quality_prob >= 0.5) == (r.label == 1)
        ) / len(scored)
        assert acc == 1.0
        pos = [r.quality_prob for r in scored if r.label == 1]
        neg = [r.quality_prob for r in scored if r.label == 0]
        assert min(pos) > 0.9 and max(neg) < 0.1

    def test_corpus_heuristic_distillation_accuracy(self, spark):
        """The registered query's framing: recover the mean-token-len
        rule from hashed BOW on the real corpus — accuracy must beat
        the base rate comfortably."""
        from tweetaggregates_spark.plans.llm import quality_classifier_docs

        rows = quality_classifier_docs(
            spark, "/root/testdata/sf0.001"
        ).collect()
        acc = sum(
            1 for r in rows if r.clf_keep == (r.label == 1)
        ) / len(rows)
        base = max(
            sum(1 for r in rows if r.label == 1),
            sum(1 for r in rows if r.label == 0),
        ) / len(rows)
        assert acc > base + 0.15, (acc, base)

    def test_training_is_partitioning_invariant(self, spark):
        from tweetaggregates_spark.operators.classifier import (
            logreg_quality_train,
        )
        from tweetaggregates_spark.sources.tables import load_table
        from pyspark.sql import functions as F2

        docs = load_table(
            spark, "/root/testdata/sf0.001", "documents"
        ).withColumn("label", (F2.col("doc_id") % 3 == 0).cast("int"))
        a = logreg_quality_train(docs, "label", iters=2, lr=100.0)
        b = logreg_quality_train(
            docs.repartition(11), "label", iters=2, lr=100.0
        )
        assert a == b  # decimal gradient sums are partitioning-free


class TestUnimaxSample:
    def test_executes_the_plan(self, spark):
        from tweetaggregates_spark.operators.sampling import (
            unimax_plan,
            unimax_sample,
        )

        rows = [(f"d{i}", "en" if i < 100 else "zh", 100) for i in range(150)]
        df = spark.createDataFrame(rows, ["doc_id", "lang", "n_chars"])
        plan = {
            r.lang: r
            for r in unimax_plan(
                df, "lang", "n_chars", budget_fraction=1.0, max_epochs=2
            ).collect()
        }
        out = unimax_sample(
            df, "lang", "n_chars", "doc_id",
            budget_fraction=1.0, max_epochs=2,
        ).collect()
        by_lang = {}
        for r in out:
            by_lang.setdefault(r.lang, []).append(r)
        for lang, rws in by_lang.items():
            e = plan[lang].epochs
            group_n = 100 if lang == "en" else 50
            full = sum(1 for r in rws if r.epoch <= int(e))
            assert full == int(e) * group_n
            extra = [r for r in rws if r.epoch == int(e) + 1]
            frac = e - int(e)
            if frac == 0:
                assert not extra
            else:
                # deterministic hash rate: within 15% of frac
                assert abs(len(extra) / group_n - frac) < 0.15
        # every (doc, epoch) pair unique
        assert len({(r.doc_id, r.epoch) for r in out}) == len(out)

    def test_deterministic_under_repartition(self, spark):
        from tweetaggregates_spark.operators.sampling import unimax_sample

        rows = [(i, f"l{i % 4}", 50 + i) for i in range(200)]
        df = spark.createDataFrame(rows, ["doc_id", "lang", "n_chars"])
        a = sorted(map(tuple, unimax_sample(df).collect()))
        b = sorted(
            map(tuple, unimax_sample(df.repartition(9)).collect())
        )
        assert a == b
