"""Store compaction: batch-accumulated trees fold into the canonical
layout with identical rows, fewer files, and a working read surface.
"""

from __future__ import annotations

import glob

import pytest
from pyspark.sql import functions as F

from tests.fixtures import make_tweets
from tweetaggregates_spark.plans import tweets as tp
from tweetaggregates_spark.store import AggregateStore


@pytest.fixture(scope="module")
def batchy_store(spark, tmp_path_factory):
    """A store fed through the STREAMING sink path: three micro-batch
    writes => three batch_id trees per family."""
    p = tmp_path_factory.mktemp("compact")
    lines = make_tweets(900, seed=21)
    st = AggregateStore(spark, str(p / "agg"))
    for batch_id in range(3):
        chunk = lines[batch_id * 300 : (batch_id + 1) * 300]
        f = p / f"in_{batch_id}.ndjson"
        f.write_text("\n".join(chunk) + "\n")
        flat = tp.parse_tweets(spark.read.text(str(f)))
        st.write_batch("counts", tp.tumbling_counts(flat), batch_id)
        st.write_batch(
            "mentions",
            tp.top_entities(flat, "mentions", "screen_name"),
            batch_id,
        )
    return st


def _n_files(root: str, family: str) -> int:
    return len(glob.glob(f"{root}/{family}/**/*.parquet", recursive=True))


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_compact_preserves_rows_and_reduces_files(batchy_store):
    st = batchy_store
    for family in ("counts", "mentions"):
        before_rows = _rows(st.read(family))
        before_files = _n_files(st.root, family)
        st.compact(family)
        after_files = _n_files(st.root, family)
        assert _rows(st.read(family)) == before_rows
        assert after_files < before_files
        # batch_id partition dirs are gone — canonical layout only
        assert not glob.glob(f"{st.root}/{family}/batch_id=*")


def test_cli_compact_all_families(batchy_store, capsys):
    from tweetaggregates_spark import cli

    cli.compact(batchy_store.root)
    out = capsys.readouterr().out
    assert "compacted counts" in out and "compacted mentions" in out
    assert not glob.glob(f"{batchy_store.root}/counts/batch_id=*")


def test_compact_refuses_concurrent_batch_arrivals(spark, tmp_path):
    """ADVICE r3: a micro-batch landing between compact()'s snapshot and
    its swap must abort the compaction with the original tree (including
    the late batch) untouched — never silently destroy it."""
    lines = make_tweets(300, seed=5)
    f = tmp_path / "in.ndjson"
    f.write_text("\n".join(lines) + "\n")
    flat = tp.parse_tweets(spark.read.text(str(f)))
    counts = tp.tumbling_counts(flat)
    st = AggregateStore(spark, str(tmp_path / "agg"))
    st.write_batch("counts", counts, 0)

    real_read = st.read

    def read_then_sneak(family):
        df = real_read(family)
        # simulates a non-quiesced streaming sink: batch 99 arrives
        # AFTER the entry snapshot but before the swap
        st.write_batch(family, counts, 99)
        return df

    st.read = read_then_sneak
    with pytest.raises(RuntimeError, match="not quiesced"):
        st.compact("counts")
    st.read = real_read
    # both batches still present and readable; no tmp/old litter
    assert glob.glob(f"{st.root}/counts/batch_id=0")
    assert glob.glob(f"{st.root}/counts/batch_id=99")
    assert not glob.glob(f"{st.root}/counts.__compact_*")
    assert st.read("counts").count() == 2 * counts.count()


def test_compact_rolls_back_when_batch_lands_during_swap(
    spark, tmp_path, monkeypatch
):
    """ADVICE r4 (TOCTOU): a micro-batch landing AFTER the final
    pre-swap check must still abort — the first rename moves the tree
    to .__compact_old, the late batch recreates the family path, the
    second rename fails, and the rollback folds the late batch back
    into the restored tree. Nothing is destroyed."""
    import os as _os

    lines = make_tweets(300, seed=8)
    f = tmp_path / "in.ndjson"
    f.write_text("\n".join(lines) + "\n")
    flat = tp.parse_tweets(spark.read.text(str(f)))
    counts = tp.tumbling_counts(flat)
    st = AggregateStore(spark, str(tmp_path / "agg"))
    st.write_batch("counts", counts, 0)

    real_rename = _os.rename
    sneaked = {"done": False}

    def sneaky_rename(src, dst):
        real_rename(src, dst)
        if str(dst).endswith(".__compact_old") and not sneaked["done"]:
            sneaked["done"] = True
            # non-quiesced sink: batch 99 lands right after the tree
            # moved aside, recreating the family path
            st.write_batch("counts", counts, 99)

    monkeypatch.setattr(_os, "rename", sneaky_rename)
    with pytest.raises(RuntimeError, match="rolled back"):
        st.compact("counts")
    monkeypatch.undo()
    # both batches present and readable; no tmp/old litter
    assert glob.glob(f"{st.root}/counts/batch_id=0")
    assert glob.glob(f"{st.root}/counts/batch_id=99")
    assert not glob.glob(f"{st.root}/counts.__compact_*")
    assert st.read("counts").count() == 2 * counts.count()


def test_compact_recovers_from_crash_between_renames(spark, tmp_path):
    """ADVICE r3: leftover .__compact_old trees from a crashed swap must
    not wedge every later compact. Roll FORWARD when the verified new
    tree (tmp) exists, roll BACK when it does not."""
    import os
    import shutil

    lines = make_tweets(300, seed=6)
    f = tmp_path / "in.ndjson"
    f.write_text("\n".join(lines) + "\n")
    flat = tp.parse_tweets(spark.read.text(str(f)))
    st = AggregateStore(spark, str(tmp_path / "agg"))
    st.write("counts", tp.tumbling_counts(flat))
    before = _rows(st.read("counts"))
    path = st._path("counts")

    # crash between rename(path, old) and rename(tmp, path), tmp written
    shutil.copytree(path, path + ".__compact_tmp")
    os.rename(path, path + ".__compact_old")
    st.compact("counts")  # rolls forward, then compacts normally
    assert _rows(st.read("counts")) == before
    assert not glob.glob(path + ".__compact_*")

    # crash right after rename(path, old), no tmp yet
    os.rename(path, path + ".__compact_old")
    st.compact("counts")  # rolls back, then compacts normally
    assert _rows(st.read("counts")) == before
    assert not glob.glob(path + ".__compact_*")


def test_read_surface_works_after_compact(batchy_store):
    st = batchy_store  # already compacted by the previous test order,
    st.compact("counts")  # but compaction must also be idempotent
    summary = st.get_summary().collect()[0]
    assert summary.number_of_tweets > 0
    recent = st.get_recent("counts", 3).collect()
    assert len(recent) == 3
    times = [r.window_time for r in recent]
    assert times == sorted(times, reverse=True)
