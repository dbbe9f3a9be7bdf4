"""Scale-up measurement for the round-3 Count-Min family: time the
daily heavy hitters and the counter-merge monthly rollup at sf0.1 and
the derived sf1 (10x) dataset (tools/make_sf1.py), best of 2, noop
sink. The expected behavior at 10x data: counter aggregation is a
fixed-keyspace count (|days| x d x w cells regardless of rows), so
runtime should scale with the SCAN, not with candidate-set quadratics
— near-linear, exponent ~<=1.1.

Usage: python tools/make_sf1.py && python tools/scale_cms.py
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod
from tweetaggregates_spark.session import get_spark

NAMES = ["cms_heavy_hitters_daily", "cms_heavy_hitters_monthly_rollup"]
SFS = [
    ("sf0.1", "/root/testdata/sf0.1"),
    ("sf1", "/root/repo/testdata_sf1"),
]


def main() -> int:
    spark = get_spark("scale-cms")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()
    timings: dict[str, dict[str, float]] = {n: {} for n in NAMES}
    # warmup at the smallest sf
    for name in NAMES:
        qs[name](spark, "/root/testdata/sf0.001").write.format("noop").mode(
            "overwrite"
        ).save()
    for sf, sf_dir in SFS:
        for name in NAMES:
            best = float("inf")
            for _ in range(2):
                t0 = time.time()
                qs[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                best = min(best, time.time() - t0)
            timings[name][sf] = best
            print(f"{sf} {name} {best:.3f}s", flush=True)
    for name in NAMES:
        a, b = timings[name]["sf0.1"], timings[name]["sf1"]
        print(f"{name} exponent: {math.log10(b / a):.2f} per 10x data")
    return 0


if __name__ == "__main__":
    sys.exit(main())
