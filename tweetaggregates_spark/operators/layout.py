"""Multi-dimensional data layout: Z-order (Morton) clustering.

At 100 TB the cheapest query is the one that never reads the file:
parquet scans skip whole files/row-groups whose footer min/max excludes
the predicate. Sorting on ONE column gives perfect skipping on that
column and none on any other; interleaving the bits of several columns
(Z-order / Morton curve — the same layout Delta's OPTIMIZE ZORDER BY
and space-filling-curve literature use) gives each clustered column a
min/max spread of roughly n_files^(1/k), so selective predicates on ANY
of the k columns skip most files.

Everything here is native Column expressions (shift/AND/OR chains inside
whole-stage codegen) plus one `repartitionByRange` — the standard
total-order shuffle (range-sampled boundaries, no driver collect of
data). The only driver-side values are the per-column [lo, hi] bounds
(one tiny agg; at 100 TB you'd read them from table-level stats
instead — the operator accepts precomputed bounds for exactly that).

Proof of effectiveness lives in tests/test_layout.py: it reads back the
parquet FOOTERS (pyarrow, metadata only) and counts how many files a
2-D box predicate could skip — z-ordered layout must skip most, the
single-key sort must not.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bucketize(col: Column, lo: float, hi: float, bits: int) -> Column:
    """Map a numeric column into integer cells [0, 2^bits) by min/max
    scaling — the per-dimension quantization step of the Morton key.
    Values at hi clamp into the top cell; constant columns (hi == lo)
    and all-NULL columns (bounds None — column_bounds on empty/NULL
    input) collapse to cell 0 (nothing to cluster on). NULL values in a
    clustered column land in cell 0 rather than poisoning the Morton key
    with NULL."""
    n = 1 << bits
    if lo is None or hi is None or hi <= lo:
        return F.lit(0).cast("long")
    scaled = (col.cast("double") - F.lit(float(lo))) / F.lit(float(hi - lo))
    cell = F.floor(scaled * F.lit(n)).cast("long")
    return F.coalesce(
        F.least(F.greatest(cell, F.lit(0)), F.lit(n - 1)), F.lit(0).cast("long")
    )


def string_order_key(col: Column, n_chars: int = 7) -> Column:
    """Order-respecting numeric key from a string's first `n_chars`
    characters (8 bits each, 56 bits total at the default): enough
    resolution to Morton-bucketize a string dimension. Code points are
    CLAMPED to [0, 255] — `ascii()` returns the full code point, so
    without the clamp a single CJK first character would overflow the
    signed long and scramble the clustering. Clamping keeps the key
    monotone wherever the deciding character is Latin-1 (any char >
    U+00FF sorts after all Latin-1, consistently); strings that tie on
    the clamped prefix collapse to one cell — both cases only coarsen
    skipping granularity, never correctness (footer min/max stats
    remain exact on the real column). NULL/empty strings key to 0."""
    key: Column = F.lit(0).cast("long")
    for i in range(n_chars):
        cp = F.coalesce(F.ascii(F.substring(col, i + 1, 1)), F.lit(0))
        byte = F.least(F.greatest(cp, F.lit(0)), F.lit(255))
        key = key + F.shiftleft(byte.cast("long"), 8 * (n_chars - 1 - i))
    return key


def zorder_key(cells: list[Column], bits: int) -> Column:
    """Interleave the low `bits` bits of each cell index into one Morton
    key: output bit (i * k + j) = bit i of cells[j]. Pure
    shiftleft/shiftright/AND/OR chain — stays in codegen, no UDF.
    k * bits must fit in 63 bits (signed long)."""
    k = len(cells)
    assert k >= 1 and k * bits <= 63, "morton key must fit a signed long"
    key: Column | None = None
    for i in range(bits):
        for j, cell in enumerate(cells):
            bit = F.shiftright(cell, i).bitwiseAND(F.lit(1)).cast("long")
            placed = F.shiftleft(bit, i * k + j)
            key = placed if key is None else key.bitwiseOR(placed)
    return key


def column_bounds(df: DataFrame, cols: list[str]) -> dict[str, tuple[float, float]]:
    """One aggregate pass for [min, max] per clustering column. Tiny
    result (2k values) — at 100 TB prefer catalog/footer statistics and
    pass the result straight to `write_zordered(bounds=...)`."""
    aggs = []
    for c in cols:
        aggs += [
            F.min(F.col(c).cast("double")).alias(f"__lo_{c}"),
            F.max(F.col(c).cast("double")).alias(f"__hi_{c}"),
        ]
    row = df.agg(*aggs).collect()[0]
    return {c: (row[f"__lo_{c}"], row[f"__hi_{c}"]) for c in cols}


def with_zorder(
    df: DataFrame,
    cols: list[str],
    bits: int = 12,
    bounds: dict[str, tuple[float, float]] | None = None,
    key_name: str = "__z",
) -> DataFrame:
    """Append the Morton key column for `cols` (timestamps allowed —
    cast to epoch seconds first by the caller or here via double cast)."""
    if bounds is None:
        bounds = column_bounds(df, cols)
    cells = [
        bucketize(F.col(c).cast("double"), bounds[c][0], bounds[c][1], bits)
        for c in cols
    ]
    return df.withColumn(key_name, zorder_key(cells, bits))


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int,
    bits: int = 12,
    bounds: dict[str, tuple[float, float]] | None = None,
) -> None:
    """Cluster `df` into `n_files` parquet files along the Morton curve
    of `cols`: range-partition on the key (total order over z), sort
    within each partition (row-group-level min/max tightness inside
    each file), drop the helper column, write.

    The shuffle is ONE range exchange — identical cost shape to a
    global sort, which any compaction job pays anyway; the payoff is
    footer-stat file skipping on every clustered column forever after."""
    keyed = with_zorder(df, cols, bits, bounds)
    (
        keyed.repartitionByRange(n_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
