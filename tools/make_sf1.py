"""Derive an sf1 dataset (10x sf0.1) for scale-up measurement.

TESTDATA.md ships sf{0.001,0.01,0.1}; scaling exponents need one more
decade. This derives sf1 from the read-only sf0.1 by unioning 10
key-shifted copies, transformed so the data SCALES rather than
duplicates:

* all primary/foreign keys shift by copy * 1e9 consistently, so join
  fan-outs and group cardinalities grow 10x like real data would;
* region/nation stay fixed (TPC-H dimension semantics);
* document text is alphabet-rotated per copy (length/token structure
  preserved, so per-doc work is identical) — cross-copy shingle/
  fingerprint collisions break, keeping dup-pair output LINEAR in
  copies instead of an artificial quadratic clique blowup;
* embeddings get a per-copy dimension permutation (identity for copy
  0): an isometry, so intra-copy similarity structure is EXACTLY the
  original, while cross-copy cosines are ~random — near-dup output
  again scales linearly;
* events keep their time range (10x the rate, same span) — the
  realistic shape for windowed-aggregation scale-up.

Output: /root/repo/testdata_sf1/<table>.parquet (single file each, the
layout load_table expects). ~200 MB; NOT committed (gitignored).

Usage: python tools/make_sf1.py
"""

from __future__ import annotations

import os
import random
import shutil
import string
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tweetaggregates_spark.session import get_spark
from tweetaggregates_spark.sources.tables import load_table

SRC = "/root/testdata/sf0.1"
OUT = "/root/repo/testdata_sf1"
N_COPIES = 10
STRIDE = 1_000_000_000

KEY_SHIFTS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
FIXED_DIMS = ("region", "nation")


def _rotated_alphabet(i: int) -> tuple[str, str]:
    lo = string.ascii_lowercase
    hi = string.ascii_uppercase
    r = i % 26
    return lo + hi, lo[r:] + lo[:r] + hi[r:] + hi[:r]


def _copy(df: DataFrame, table: str, i: int, dim: int | None) -> DataFrame:
    out = df
    for k in KEY_SHIFTS.get(table, []):
        out = out.withColumn(k, F.col(k) + F.lit(i * STRIDE))
    if table == "documents" and i > 0:
        src, dst = _rotated_alphabet(i)
        out = out.withColumn("text", F.translate("text", src, dst))
    if table == "embeddings" and i > 0:
        perm = list(range(dim))
        random.Random(1000 + i).shuffle(perm)
        out = out.withColumn(
            "embedding",
            F.array(*[F.col("embedding")[p] for p in perm]),
        )
    return out


def _write_single(df: DataFrame, path: str) -> None:
    tmp = path + ".tmpdir"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = next(
        f for f in os.listdir(tmp)
        if f.startswith("part-") and f.endswith(".parquet")
    )
    shutil.move(os.path.join(tmp, part), path)
    shutil.rmtree(tmp, ignore_errors=True)


def main() -> int:
    spark = get_spark("make_sf1")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(OUT, exist_ok=True)
    dim = len(
        load_table(spark, SRC, "embeddings").select("embedding").first()[0]
    )
    for t in FIXED_DIMS:
        _write_single(
            load_table(spark, SRC, t, parallelize=False),
            os.path.join(OUT, f"{t}.parquet"),
        )
        print(f"{t}: copied (fixed dim)")
    for t in KEY_SHIFTS:
        base = load_table(spark, SRC, t, parallelize=False)
        full = None
        for i in range(N_COPIES):
            c = _copy(base, t, i, dim)
            full = c if full is None else full.unionByName(c)
        _write_single(full, os.path.join(OUT, f"{t}.parquet"))
        n = spark.read.parquet(os.path.join(OUT, f"{t}.parquet")).count()
        print(f"{t}: {n} rows")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
