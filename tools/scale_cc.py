"""Scale-up measurement: dup-cluster resolution end to end
(MinHash-LSH pairs -> connected components -> per-doc cluster id) on
salted blowups of the sf0.1 documents table.

Corpus construction mirrors the simhash measurement in SCALE.md: each
blowup factor-f unions f variants of the corpus; ids are offset per
variant, texts are mangled with a per-variant token so variants are NOT
trivial exact dups, and every 5th doc additionally gets an unmangled
twin (planted near-dup clusters for the pair graph).

Usage: python tools/scale_cc.py [factors ...]   (default 1 4 16)
Prints one line per factor: docs, pairs, clusters<n, seconds.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from tweetaggregates_spark.operators import cluster, dedup
from tweetaggregates_spark.session import get_spark
from tweetaggregates_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.1"


def blowup(docs, factor: int):
    parts = []
    for v in range(factor):
        var = docs.select(
            (F.col("doc_id") + 2_000_000 * v).alias("doc_id"),
            # per-variant mangle: prepend a variant token so variants of
            # the same doc are near- but not exact-dups
            F.concat(F.lit(f"variant{v} "), F.col("text")).alias("text"),
        )
        parts.append(var)
        twins = var.filter(F.col("doc_id") % 5 == 0).select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
        )
        parts.append(twins)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


def main() -> int:
    factors = [int(a) for a in sys.argv[1:]] or [1, 4, 16]
    spark = get_spark("scale-cc")
    spark.sparkContext.setLogLevel("ERROR")
    base = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    for f in factors:
        corpus = blowup(base, f).persist()
        n_docs = corpus.count()
        t0 = time.perf_counter()
        pairs = dedup.minhash_lsh_pairs(corpus).persist()
        n_pairs = pairs.count()
        labeled = cluster.assign_clusters(corpus.select("doc_id"), pairs)
        n_clusters = labeled.select("cluster_id").distinct().count()
        dt = time.perf_counter() - t0
        print(
            f"factor={f} docs={n_docs} pairs={n_pairs} "
            f"clusters={n_clusters} sec={dt:.1f}",
            flush=True,
        )
        pairs.unpersist()
        corpus.unpersist()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
