"""Vector math over ``array<float|double>`` embedding columns — pure
built-in higher-order functions (JVM codegen, no Python UDF).

``dot`` is a sequential left fold, matching DuckDB's
``list_dot_product`` element order; results agree to the last bit in
practice, and similarity outputs are rounded to 6 decimals anyway.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine_sim(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))
