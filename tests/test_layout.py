"""Z-order layout effectiveness, proven from parquet FOOTER stats.

The claim a 100 TB table cares about: after `write_zordered`, a
selective predicate on ANY clustered column excludes most files by
min/max alone (what the scan's row-group skipping consults). A
single-column sort only skips on its own column. We verify with
pyarrow metadata reads — no data pages touched — exactly the
information the engine's skipping uses.
"""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from tweetaggregates_spark.operators.layout import (
    column_bounds,
    with_zorder,
    write_zordered,
    zorder_key,
)
from tweetaggregates_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"
N_FILES = 16


def _file_ranges(path: str, cols: list[str]):
    """Per-file [min, max] for cols, from footers only."""
    out = []
    for f in sorted(glob.glob(f"{path}/part-*.parquet")):
        md = pq.ParquetFile(f).metadata
        lo = {c: None for c in cols}
        hi = {c: None for c in cols}
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for i in range(g.num_columns):
                col = g.column(i)
                name = col.path_in_schema
                if name in cols and col.statistics is not None:
                    s = col.statistics
                    lo[name] = s.min if lo[name] is None else min(lo[name], s.min)
                    hi[name] = s.max if hi[name] is None else max(hi[name], s.max)
        out.append((lo, hi))
    return out


def _overlapping(ranges, box):
    n = 0
    for lo, hi in ranges:
        if all(hi[c] >= b_lo and lo[c] <= b_hi for c, (b_lo, b_hi) in box.items()):
            n += 1
    return n


def test_zorder_skips_files_on_both_dimensions(spark, tmp_path):
    ev = load_table(spark, SF_DIR, "events").select("user_id", "value", "ts")
    bounds = column_bounds(ev, ["user_id", "value"])
    (u_lo, u_hi), (v_lo, v_hi) = bounds["user_id"], bounds["value"]

    zpath = str(tmp_path / "zorder")
    spath = str(tmp_path / "sorted_value")
    write_zordered(ev, zpath, ["user_id", "value"], N_FILES)
    # baseline: classic single-key sort (perfect on value, blind on user)
    (
        ev.repartitionByRange(N_FILES, F.col("value"))
        .sortWithinPartitions("value")
        .write.mode("overwrite")
        .parquet(spath)
    )

    z_ranges = _file_ranges(zpath, ["user_id", "value"])
    s_ranges = _file_ranges(spath, ["user_id", "value"])
    assert len(z_ranges) == N_FILES and len(s_ranges) == N_FILES

    # a box selective in BOTH dimensions: middle eighth of each span
    u_span, v_span = u_hi - u_lo, v_hi - v_lo
    box = {
        "user_id": (u_lo + 0.45 * u_span, u_lo + 0.55 * u_span),
        "value": (v_lo + 0.45 * v_span, v_lo + 0.55 * v_span),
    }
    z_hit = _overlapping(z_ranges, box)
    s_hit = _overlapping(s_ranges, box)
    # single-key layout: value prunes to ~10% of files, but each kept
    # file spans all users. z-order must beat it AND prune on the user
    # dimension alone, where value-sorted files are blind.
    u_box = {"user_id": box["user_id"]}
    assert _overlapping(z_ranges, u_box) < N_FILES // 2
    assert _overlapping(s_ranges, u_box) > N_FILES // 2
    assert z_hit <= max(s_hit, 4)


def test_zorder_key_is_deterministic_and_bounded(spark):
    ev = load_table(spark, SF_DIR, "events").select("user_id", "value")
    keyed = with_zorder(ev, ["user_id", "value"], bits=8)
    stats = keyed.agg(
        F.min("__z").alias("lo"), F.max("__z").alias("hi")
    ).collect()[0]
    assert stats.lo >= 0 and stats.hi < (1 << 16)  # 2 cols x 8 bits
    # same input -> same keys (pure function of the bounds + values)
    again = with_zorder(ev, ["user_id", "value"], bits=8)
    assert keyed.exceptAll(again).count() == 0


def test_zorder_preserves_rows(spark, tmp_path):
    ev = load_table(spark, SF_DIR, "events").select("user_id", "value", "ts")
    path = str(tmp_path / "z2")
    write_zordered(ev, path, ["user_id", "value"], 8)
    back = spark.read.parquet(path)
    assert back.count() == ev.count()
    assert set(back.columns) == {"user_id", "value", "ts"}
