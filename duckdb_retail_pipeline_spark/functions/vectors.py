"""Vector math over ``array<float>`` embedding columns.

Everything here is built from Spark's higher-order functions
(``zip_with`` / ``aggregate`` / ``transform``) — JVM-side, no Python
in the row path. HOF lambdas are CodegenFallback (interpreted per
element), which the r6 100× profile measured at ~23 µs per 64-dim
cosine; an unrolled per-element product chain was tried and was
SLOWER (the 384-term generated method trips the huge-method codegen
fallback), so the scaling lever is algebraic instead: batch scorers
hoist the per-SIDE norms out of the pair loop with
``cosine_from_parts`` (dot stays per-pair; norms are computed once
per row per side) — 2× measured on an 800k-pair scan, value-
identical because the same norm expression over the same array
yields the same double and the division structure is unchanged.

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


def cosine_from_parts(
    a: Column | str, b: Column | str, norm_a: Column, norm_b: Column
) -> Column:
    """Cosine with PRE-COMPUTED side norms — the batch-scoring form:
    computing ``cosine_similarity`` per (query, corpus) pair
    re-derives each side's norm once per PAIR (an 800k-pair scan at
    the 100× corpus spent 2/3 of its time on redundant norms);
    hoisting them to one norm per row per side before the join is
    value-identical (same expression over the same array → the same
    double; identical division structure) and 2× faster measured."""
    return dot(a, b) / F.nullif(norm_a * norm_b, F.lit(0.0))


def l2_distance(a: Column | str, b: Column | str) -> Column:
    diffs = F.zip_with(_d(a), _d(b), lambda x, y: (x - y) * (x - y))
    return F.sqrt(F.aggregate(diffs, F.lit(0.0), lambda acc, x: acc + x))


def rademacher_planes(n_planes: int, dim: int) -> list[list[float]]:
    """Deterministic ±1 ("Rademacher") hyperplanes derived from md5 —
    data-independent and seed-free, so the exact same constants can be
    embedded in a Spark plan and in an ANSI-SQL oracle. Sign-of-dot
    against such planes is the classic random-hyperplane LSH for
    cosine similarity (Charikar, STOC'02)."""
    import hashlib

    return [
        [
            1.0
            if int(hashlib.md5(f"plane:{p}:{d}".encode()).hexdigest()[0], 16) < 8
            else -1.0
            for d in range(dim)
        ]
        for p in range(n_planes)
    ]


def signed_sum(vec: Column | str, plane: list[float]) -> Column:
    """Dot product against a ±1 hyperplane as a compact
    zip_with/aggregate pair (an explicit per-element chain of adds
    would work too, but 32 planes × 64 dims of literal chains blow up
    codegen/driver memory). The fold is a plain left-to-right double
    accumulation starting at 0.0 — the same element order and IEEE op
    sequence as DuckDB's ``list_sum(list_transform(list_zip(...)))``,
    so the sign bit (which tolerates zero divergence) matches the SQL
    oracle bit-for-bit; tests/test_extensions.py re-verifies the full
    band keys across engines on real data."""
    p = F.array(*[F.lit(float(s)) for s in plane])
    return dot(vec, p)
