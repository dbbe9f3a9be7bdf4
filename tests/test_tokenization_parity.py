"""The tokenization contract (functions/textstats.py) must produce
identical token lists in Spark and DuckDB — every hash-based dedup
operator's cross-engine correctness rests on it. Includes unicode:
non-ASCII letters split consistently (ASCII token class) in BOTH
engines — a documented limitation, not a divergence."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F  # noqa: F401

from tweetaggregates_spark.functions.textstats import duck_tokens, tokens

SAMPLES = [
    "Héllo WÖRLD café 123",
    "emoji 🎉 test",
    "MiXeD CaSe-Punct!x2",
    "ñoño 中文 abc",
    "   leading trailing   ",
    "",
    "a",
    "ALL---SEPARATORS___",
    "tab\tand\nnewline mix",
]


@pytest.fixture(scope="module")
def engine_tokens(spark):
    sdf = (
        spark.createDataFrame([(s,) for s in SAMPLES], "text string")
        .select(tokens("text").alias("t"))
        .collect()
    )
    con = duckdb.connect()
    ddf = [
        r[0]
        for r in con.execute(
            f"SELECT {duck_tokens('text')} FROM (SELECT unnest(?) AS text)",
            [SAMPLES],
        ).fetchall()
    ]
    return [r.t for r in sdf], ddf


def test_tokens_identical_across_engines(engine_tokens):
    spark_toks, duck_toks = engine_tokens
    for s, a, b in zip(SAMPLES, spark_toks, duck_toks):
        assert a == b, f"tokenization diverged for {s!r}: {a} vs {b}"
