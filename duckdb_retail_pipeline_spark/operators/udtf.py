"""Python user-defined table functions (Spark 4 UDTF surface).

The engine needs zero UDFs for reference parity (SURVEY §2.11) and
prefers JVM column arithmetic everywhere (e.g. text chunking is
sequence+slice, not Python). This module exists to cover the UDTF
API itself: per-row table expansion with driver-declared schemas,
usable from SQL via LATERAL joins. Rule of thumb at scale: reach for
a UDTF only when the expansion logic is genuinely imperative —
otherwise explode() over a computed array stays in codegen and wins.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf


@udtf(returnType="pos int, token string")
class TokenizeUDTF:
    """One output row per whitespace token with its position —
    the UDTF twin of explode(tokens(text))."""

    def eval(self, text: str):  # noqa: D102 — UDTF contract method
        for i, t in enumerate((text or "").split()):
            yield i, t


@udtf(returnType="pair string, a bigint, b bigint")
class PairwiseUDTF:
    """All ordered adjacent pairs from a sorted id list — an example
    of expansion logic that is genuinely imperative (stateful over
    the row's array) rather than a map over elements."""

    def eval(self, ids: list):  # noqa: D102
        if not ids:
            return
        s = sorted(int(x) for x in ids)
        for x, y in zip(s, s[1:]):
            yield f"{x}-{y}", x, y


def register_udtfs(spark: SparkSession) -> None:
    """Register the UDTFs for SQL LATERAL use."""
    spark.udtf.register("tokenize", TokenizeUDTF)
    spark.udtf.register("adjacent_pairs", PairwiseUDTF)
