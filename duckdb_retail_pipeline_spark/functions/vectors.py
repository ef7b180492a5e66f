"""Vector math over ``array<float>`` embedding columns.

Everything here is built from Spark's higher-order functions
(``zip_with`` / ``aggregate`` / ``transform``) — JVM-side, no Python
in the row path, so brute-force similarity scans stay inside
whole-stage codegen and scale linearly with executors.

Elements are cast to double before any arithmetic so results match a
double-precision SQL oracle bit-for-bit (modulo summation order;
callers round before hashing).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _d(col: Column | str) -> Column:
    c = col if isinstance(col, Column) else F.col(col)
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column | str, b: Column | str) -> Column:
    """Dot product of two equal-length numeric arrays."""
    prods = F.zip_with(_d(a), _d(b), lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column | str) -> Column:
    """L2 norm."""
    return F.sqrt(dot(a, a))


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; NULL when either vector has zero norm."""
    return dot(a, b) / F.nullif(norm(a) * norm(b), F.lit(0.0))


def l2_distance(a: Column | str, b: Column | str) -> Column:
    diffs = F.zip_with(_d(a), _d(b), lambda x, y: (x - y) * (x - y))
    return F.sqrt(F.aggregate(diffs, F.lit(0.0), lambda acc, x: acc + x))
