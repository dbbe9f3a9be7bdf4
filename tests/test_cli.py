"""CLI command parity tests (Program.cs:11-18 equivalents), driven
through the same functions `python -m tweetaggregates_spark.cli` uses."""

from __future__ import annotations

from tests.fixtures import write_tweets_file
from tweetaggregates_spark import cli
from tweetaggregates_spark.store import AggregateStore


def test_save_aggregates_and_print_db(spark, tmp_path, capsys):
    src = tmp_path / "in.ndjson"
    write_tweets_file(str(src), 400, seed=13)
    store_dir = str(tmp_path / "agg")
    cli.save_aggregates(str(src), store_dir)

    store = AggregateStore(spark, store_dir)
    assert store.read("counts").count() > 0
    assert store.read("mentions").count() > 0

    cli.print_db(store_dir, 2)
    out = capsys.readouterr().out
    assert "summary" in out and "counts" in out


def test_save_tweets_roundtrip(spark, tmp_path):
    src = tmp_path / "in.ndjson"
    n = write_tweets_file(str(src), 100, seed=3)
    out_dir = str(tmp_path / "raw")
    cli.save_tweets(str(src), out_dir)
    assert spark.read.text(out_dir).count() == n
