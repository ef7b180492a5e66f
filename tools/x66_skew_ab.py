"""x66 skew A/B (r13 verdict #2): exercise the §2.5 skew levers on a
corpus that needs them.

The registered x66 enumerates basket pairs with an order-keyed
self-join: a Zipf mega-basket of m items lands on ONE join task and
emits ~m^2/2 pair rows there (tools/zipf_baskets.py builds corpora
where one basket owns ~60% of all pair work). Variants measured:

  plain   — the registered exact query (baseline)
  salted  — adaptive salted self-join, EXACT semantics: each item
            gets a segment pmod(xxhash64(part), ceil(bsz/W)); the
            right side is replicated once per segment. A pair (x,y),
            part_x < part_y, matches exactly once — at x's segment.
            Mega baskets split into ceil(m/W) tasks of ~W*m
            comparisons each; small baskets (bsz <= W) have ONE
            segment, so the join degenerates to the plain self-join
            with no replication (guide §2.5 "salt the key / explode
            the small side", made size-adaptive).
  capped  — the opt-in _X66_MAX_BASKET cap (output-semantics change,
            stays opt-in; measured here so the at-scale lever's cost
            claim has a number on skewed data).

Every variant's full result (not just the top-25) is checksummed
against plain's on each corpus before any timing is trusted.

Usage:
    python tools/x66_skew_ab.py SF_DIR [SF_DIR ...] [--runs N]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402


def _score(items: DataFrame, pairs: DataFrame, topk: int = 25) -> DataFrame:
    """The shared scoring tail of x66 (supports -> confidence/lift ->
    top-k), over any exact pair-support frame."""
    n = items.agg(
        F.count_distinct("l_orderkey").cast("bigint").alias("n_orders")
    )
    ic = items.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("c_i")
    )
    scored = (
        pairs.join(
            ic.withColumnRenamed("l_partkey", "part_a").withColumnRenamed("c_i", "c_a"),
            "part_a",
        )
        .join(
            ic.withColumnRenamed("l_partkey", "part_b").withColumnRenamed("c_i", "c_b"),
            "part_b",
        )
        .crossJoin(F.broadcast(n))
        .select(
            "part_a",
            "part_b",
            "support",
            F.call_function("div", F.col("support") * 10000, F.col("c_a"))
            .cast("bigint")
            .alias("confidence_scaled"),
            F.call_function(
                "div",
                F.col("support") * F.col("n_orders") * 10000,
                F.col("c_a") * F.col("c_b"),
            )
            .cast("bigint")
            .alias("lift_scaled"),
        )
    )
    return scored.orderBy(
        F.col("lift_scaled").desc(), F.col("part_a").asc(), F.col("part_b").asc()
    ).limit(topk)


def pairs_plain(items: DataFrame) -> DataFrame:
    a = items.select("l_orderkey", F.col("l_partkey").alias("part_a"))
    b = items.select("l_orderkey", F.col("l_partkey").alias("part_b"))
    return (
        a.join(b, "l_orderkey")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("support"))
        .filter(F.col("support") >= 2)
    )


def pairs_salted(items: DataFrame, width: int = 512) -> DataFrame:
    segs = items.groupBy("l_orderkey").agg(
        F.ceil(F.count(F.lit(1)) / F.lit(width)).cast("int").alias("__nseg")
    )
    it = items.join(segs, "l_orderkey")
    a = it.select(
        "l_orderkey",
        F.col("l_partkey").alias("part_a"),
        F.pmod(F.xxhash64("l_partkey"), F.col("__nseg")).cast("int").alias("__seg"),
    )
    b = it.select(
        "l_orderkey",
        F.col("l_partkey").alias("part_b"),
        F.explode(F.sequence(F.lit(0), F.col("__nseg") - 1)).alias("__seg"),
    )
    return (
        a.join(b, ["l_orderkey", "__seg"])
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("support"))
        .filter(F.col("support") >= 2)
    )


def main() -> None:
    from duckdb_retail_pipeline_spark.operators.graph import cap_per_group
    from duckdb_retail_pipeline_spark.session import get_spark
    from tools._util import row_set_checksum

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    runs = 3
    if "--runs" in sys.argv:
        runs = int(sys.argv[sys.argv.index("--runs") + 1])
    spark = get_spark(app_name="x66-skew-ab")
    spark.sparkContext.setLogLevel("ERROR")

    def calibrate() -> float:
        t0 = time.perf_counter()
        s = 0
        for i in range(2_000_000):
            s += i
        assert s
        return round(time.perf_counter() - t0, 4)

    for sf_dir in args:
        items = (
            spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
            .select("l_orderkey", "l_partkey")
            .distinct()
        )
        variants = {
            "plain": lambda: _score(items, pairs_plain(items)),
            "salted": lambda: _score(items, pairs_salted(items)),
            "capped64": lambda: _score(
                cap_per_group(items, "l_orderkey", "l_partkey", 64),
                pairs_plain(cap_per_group(items, "l_orderkey", "l_partkey", 64)),
            ),
        }
        # value gate first: salted must be bit-equal to plain (full
        # row set); capped is EXPECTED to differ on capped corpora
        rows = {v: variants[v]().collect() for v in ("plain", "salted")}
        cks = {v: row_set_checksum(r) for v, r in rows.items()}
        same = cks["plain"] == cks["salted"]
        print(
            f"{sf_dir}: plain_rows={len(rows['plain'])} "
            f"salted_equal={same} checksum={cks['plain']}"
        )
        if not same:
            print("VALUE MISMATCH — timing aborted for this corpus")
            continue
        # interleaved timing, calibration-stamped (r13 box protocol)
        times: dict[str, list[float]] = {v: [] for v in variants}
        for _ in range(runs):
            for v, build in variants.items():
                spark.sparkContext.setJobDescription(f"x66-ab {v} {sf_dir}")
                t0 = time.perf_counter()
                build().count()
                times[v].append(round(time.perf_counter() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        cal = calibrate()
        for v, ts in times.items():
            print(f"  {v}: min={min(ts)} all={sorted(ts)} cal={cal}")


if __name__ == "__main__":
    main()
