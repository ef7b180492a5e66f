"""Advanced relational surface: operators the reference never uses
(SURVEY notes "no grouping sets / cube / rollup / approximate
aggregates appear", "no INTERSECT/EXCEPT") but that a complete
engine offers. Each gets the same oracle treatment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duckdb_retail_pipeline_spark.queries.base import (
    money_sum,
    register,
    sql_money_sum,
    tbl,
)


# ---------------------------------------------------------------- a01
@register(
    "a01_rollup",
    oracle=f"""
        SELECT r_name AS region, n_name AS nation,
               CAST(COUNT(*) AS BIGINT) AS n_customers,
               {sql_money_sum('c_acctbal')} AS total_balance
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY ROLLUP(r_name, n_name)
    """,
    doc="ROLLUP hierarchy totals (region → nation → grand total): "
    "subtotal rows carry NULL grouped-out keys in both engines.",
    tags=("agg", "grouping-sets"),
)
def a01_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = tbl(spark, sf_dir, "customer")
    nation = tbl(spark, sf_dir, "nation")
    region = tbl(spark, sf_dir, "region")
    base = customer.join(
        F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
    ).join(F.broadcast(region), F.col("n_regionkey") == region.r_regionkey)
    return base.rollup(
        F.col("r_name").alias("region"), F.col("n_name").alias("nation")
    ).agg(
        F.count(F.lit(1)).alias("n_customers"),
        money_sum(F.col("c_acctbal")).alias("total_balance"),
    )


# ---------------------------------------------------------------- a02
@register(
    "a02_cube",
    oracle="""
        SELECT o_orderstatus AS status, o_orderpriority AS priority,
               CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM orders
        GROUP BY CUBE(o_orderstatus, o_orderpriority)
    """,
    doc="CUBE: all 2^k grouping-set combinations of (status, "
    "priority).",
    tags=("agg", "grouping-sets"),
)
def a02_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = tbl(spark, sf_dir, "orders")
    return orders.cube(
        F.col("o_orderstatus").alias("status"),
        F.col("o_orderpriority").alias("priority"),
    ).agg(F.count(F.lit(1)).alias("n_orders"))


# ---------------------------------------------------------------- a03
@register(
    "a03_intersect_except",
    oracle="""
        SELECT 'both' AS cohort, c_custkey FROM (
            SELECT o_custkey AS c_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
            INTERSECT
            SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'
        )
        UNION ALL
        SELECT 'urgent_only', c_custkey FROM (
            SELECT o_custkey AS c_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
            EXCEPT
            SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'
        )
    """,
    doc="INTERSECT / EXCEPT (distinct set semantics) — absent from "
    "the reference (SURVEY §2.7), present in the engine.",
    tags=("setops",),
)
def a03_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = tbl(spark, sf_dir, "orders")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("c_custkey")
    )
    low = orders.filter(F.col("o_orderpriority") == "5-LOW").select(
        F.col("o_custkey").alias("c_custkey")
    )
    both = urgent.intersect(low).select(F.lit("both").alias("cohort"), "c_custkey")
    # subtract = ANSI EXCEPT (set semantics); exceptAll would keep
    # surplus multiplicity
    only = urgent.subtract(low).select(
        F.lit("urgent_only").alias("cohort"), "c_custkey"
    )
    return both.unionByName(only)


# ---------------------------------------------------------------- a04
@register(
    "a04_unpivot",
    oracle="""
        SELECT p_partkey, 'p_retailprice' AS metric, p_retailprice AS value
        FROM part
        UNION ALL
        SELECT p_partkey, 'p_size', CAST(p_size AS DOUBLE) FROM part
    """,
    doc="Unpivot/melt wide→long (DataFrame.unpivot; oracle as the "
    "equivalent UNION ALL).",
    tags=("reshape",),
)
def a04_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = tbl(spark, sf_dir, "part")
    return part.select(
        "p_partkey", F.col("p_retailprice"), F.col("p_size").cast("double")
    ).unpivot("p_partkey", ["p_retailprice", "p_size"], "metric", "value")


# ---------------------------------------------------------------- a05
@register(
    "a05_approx_aggregates",
    oracle=None,  # HLL/quantile-sketch internals are engine-specific;
    # tolerance vs exact values asserted in tests/test_advanced.py.
    doc="Approximate aggregates for 100 TB interactive work: "
    "approx_count_distinct (HyperLogLog++) and percentile_approx "
    "(KLL-style) — sketch-based, single-pass, mergeable across "
    "partitions.",
    tags=("agg", "approx"),
)
def a05_approx_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = tbl(spark, sf_dir, "lineitem")
    return li.agg(
        F.approx_count_distinct("l_orderkey").alias("approx_orders"),
        F.count_distinct("l_orderkey").alias("exact_orders"),
        F.percentile_approx("l_extendedprice", 0.5).alias("approx_median_price"),
        F.expr("percentile(l_extendedprice, 0.5)").alias("exact_median_price"),
    )


# ---------------------------------------------------------------- a06
@register(
    "a06_grouping_sets_sql",
    oracle="""
        SELECT o_orderstatus AS status,
               CAST(year(o_orderdate) AS BIGINT) AS year,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (year(o_orderdate)), ())
    """,
    doc="Explicit GROUPING SETS via Spark SQL text.",
    tags=("agg", "grouping-sets", "sql"),
)
def a06_grouping_sets_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    tbl(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderstatus AS status,
               CAST(year(o_orderdate) AS BIGINT) AS year,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (year(o_orderdate)), ())
        """
    )
