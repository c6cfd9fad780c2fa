"""Vector math over array<float> embedding columns (engine extension).

The reference has no vector operators; these support the similarity-search
surface (brute-force cosine top-k baseline + blocked/LSH scale paths in
``operators/similarity.py``). All pure higher-order array expressions —
JVM-evaluated, no Python. Elements are cast to double before arithmetic so
results match a double-precision oracle bit-for-bit (sequential left fold
in both engines).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a: Column | str, b: Column | str) -> Column:
    """Sequential-fold dot product: sum(a[i]*b[i]) left to right."""
    prods = F.zip_with(
        _c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double")
    )
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column | str, b: Column | str) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def sql_dot(a: str, b: str) -> str:
    """DuckDB mirror of :func:`dot` via positional unnest (order-preserving
    list_sum over the zipped element products)."""
    return (
        f"list_sum(list_transform(list_zip({a}, {b}), "
        f"p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))"
    )


def sql_cosine(a: str, b: str) -> str:
    return f"({sql_dot(a, b)} / (sqrt({sql_dot(a, a)}) * sqrt({sql_dot(b, b)})))"
