"""Skew mitigation for hot-key equi-joins: deterministic salting.

First choice at runtime is AQE's skew-join split
(``spark.sql.adaptive.skewJoin.enabled``, on via session.py): it
splits oversized partitions after the map stage with no plan change.
Salting is the static fallback for the cases AQE cannot fix — a
build-side bucket that is hot because ONE key is hot (AQE can split
the partition, but every split still joins against the same single
build row: fine for broadcast, pathological for shuffle joins feeding
per-key aggregation state), or when a deterministic, planner-
independent layout matters (e.g. a reproducible benchmark).

Shape: fact rows get a content-derived salt in [0, n_salts); the
(small) dimension side is exploded into n_salts copies, and the join
key becomes (key, salt) — a hot key's rows now spread across n_salts
reducers. Cost: build side replicated n_salts x (choose n_salts ~ the
worst key's partition-to-median ratio, not more).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "_salt"


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``fact.key == dim.key`` with the shuffle spread over
    ``(key, salt)``. Result is identical to the plain join (salt only
    redistributes rows; the dim explosion guarantees every fact salt
    finds its dim row). Supported ``how``: inner / left joins (the
    fact side keeps its multiplicity; dim-side duplicates would be
    wrong for right/full)."""
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"salted_join supports inner/left, got {how}")
    # salt from the full fact row content: deterministic, and spreads a
    # hot key's rows even when every other column collides too
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(n_salts)
    ).cast("int")
    salted_fact = fact.withColumn(SALT_COL, salt)
    salted_dim = dim.withColumn(
        SALT_COL,
        F.explode(F.array(*[F.lit(i) for i in range(n_salts)])),
    )
    out = salted_fact.join(salted_dim, [key, SALT_COL], how)
    return out.drop(SALT_COL)
