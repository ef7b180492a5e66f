"""Round-5 analytics/pipeline extensions: interval (range) joins,
text retrieval scoring, event funnels, cohort retention, PII
redaction, skew-proof joins under the oracle gate, and one-pass data
profiling.

Each query follows the engine conventions (queries/base.py): integer
cents for money, BIGINT casts for integer outputs, DATE casts for
dates, total ordering under LIMIT, dround only for values with no
probability mass at decimal ties.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duckdb_retail_pipeline_spark.functions import text as T
from duckdb_retail_pipeline_spark.operators import scale as SC
from duckdb_retail_pipeline_spark.queries.base import (
    dround,
    money_sum,
    register,
    sql_dround,
    sql_money_sum,
    tbl,
)
from duckdb_retail_pipeline_spark.queries.extensions import SQL_TOKS

# ---------------------------------------------------------------- x43
_X43_MIN_ERRORS = 3  # hourly error count that flags an incident window


@register(
    "x43_range_join_binned",
    oracle=f"""
        WITH ev AS (
            SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_type
            FROM events
        ), iv AS (
            SELECT user_id, CAST(ts AS DATE) AS day,
                   MIN(ts) AS s, MAX(ts) AS e
            FROM ev GROUP BY 1, 2
        ), win AS (
            SELECT date_trunc('hour', ts) AS w
            FROM ev WHERE event_type = 'error'
            GROUP BY 1 HAVING COUNT(*) >= {_X43_MIN_ERRORS}
        )
        SELECT iv.day,
               CAST(COUNT(*) AS BIGINT) AS n_pairs,
               CAST(COUNT(DISTINCT iv.user_id) AS BIGINT) AS n_users,
               CAST(SUM(
                   epoch_us(least(iv.e, win.w + INTERVAL 1 HOUR))
                   - epoch_us(greatest(iv.s, win.w))
               ) AS BIGINT) AS total_overlap_us
        FROM iv JOIN win
          ON iv.s < win.w + INTERVAL 1 HOUR AND iv.e >= win.w
        GROUP BY iv.day
    """,
    doc="Interval-overlap (range) join via BINNED equi-join — the "
    "scale path for a join Spark would otherwise plan as "
    "BroadcastNestedLoopJoin: per-user daily activity intervals "
    "[min ts, max ts] against hourly incident windows (hours with "
    ">= 3 error events). Each interval explodes into the hour bins "
    "it spans; each window occupies exactly its own bin, so the "
    "overlap join becomes a hash equi-join on the bin key with no "
    "per-pair predicate scan. Provably identical to the naive "
    "inequality join (a window overlaps [s, e] iff its hour lies in "
    "[hour(s), hour(e)] — that is the SQL oracle). Overlap durations "
    "are exact microsecond integers.",
    tags=("events", "range-join", "join"),
)
def x43_range_join_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tbl(spark, sf_dir, "events")
    iv = ev.groupBy(
        "user_id", F.to_date("ts").alias("day")
    ).agg(F.min("ts").alias("s"), F.max("ts").alias("e"))
    win = (
        ev.filter(F.col("event_type") == "error")
        .groupBy(F.date_trunc("hour", "ts").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= _X43_MIN_ERRORS)
        .select("w")
    )
    binned = iv.withColumn(
        "bin",
        F.explode(
            F.sequence(
                F.date_trunc("hour", "s"),
                F.date_trunc("hour", "e"),
                F.expr("INTERVAL 1 HOUR"),
            )
        ),
    )
    w_end = F.col("w") + F.expr("INTERVAL 1 HOUR")
    joined = binned.join(win, F.col("bin") == F.col("w")).filter(
        (F.col("s") < w_end) & (F.col("e") >= F.col("w"))  # defensive; always true
    )
    overlap_us = F.unix_micros(F.least(F.col("e"), w_end)) - F.unix_micros(
        F.greatest(F.col("s"), F.col("w"))
    )
    return joined.groupBy("day").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.count_distinct("user_id").cast("bigint").alias("n_users"),
        F.sum(overlap_us).cast("bigint").alias("total_overlap_us"),
    )


# ---------------------------------------------------------------- x44
_X44_TERMS = ("join", "vector", "slow")
_X44_K1 = 1.2
_X44_B = 0.75


def _x44_oracle() -> str:
    toks = SQL_TOKS.format(x="text")
    tf = {t: f"len(list_filter(toks, t -> t = '{t}'))" for t in _X44_TERMS}
    idf = {
        t: f"ln(1.0 + (CAST(n_docs AS DOUBLE) - df_{t} + 0.5) / (df_{t} + 0.5))"
        for t in _X44_TERMS
    }
    contrib = {
        t: (
            f"({idf[t]}) * (tf_{t} * {_X44_K1 + 1.0}) / "
            f"(tf_{t} + {_X44_K1} * (1.0 - {_X44_B} + {_X44_B} * "
            f"(CAST(dl AS DOUBLE) / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE)))))"
        )
        for t in _X44_TERMS
    }
    score = " + ".join(f"({contrib[t]})" for t in _X44_TERMS)
    return f"""
        WITH d AS (
            SELECT doc_id, {toks} AS toks FROM documents
        ), t AS (
            SELECT doc_id, len(toks) AS dl,
                   {", ".join(f"{tf[t]} AS tf_{t}" for t in _X44_TERMS)}
            FROM d
        ), stats AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(dl) AS BIGINT) AS sum_dl,
                   {", ".join(f"CAST(SUM(CASE WHEN tf_{t} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_{t}" for t in _X44_TERMS)}
            FROM t
        )
        SELECT doc_id,
               {sql_dround(score, 4)} AS bm25,
               {", ".join(f"CAST(tf_{t} AS BIGINT) AS tf_{t}" for t in _X44_TERMS)},
               CAST(dl AS BIGINT) AS dl
        FROM t, stats
        WHERE {" + ".join(f"tf_{t}" for t in _X44_TERMS)} > 0
        ORDER BY bm25 DESC, doc_id ASC
        LIMIT 20
    """


@register(
    "x44_bm25_search",
    oracle=_x44_oracle(),
    doc="BM25 keyword retrieval (Robertson/Sparck Jones; the "
    "Okapi/Lucene formula with the +1 idf floor) over the documents "
    "corpus for a fixed query term set: per-doc term frequencies via "
    "JVM array filters, corpus stats (N, total length, per-term "
    "document frequency) as ONE single-row aggregate broadcast back "
    "onto the corpus — no per-term shuffle, no UDF, scales as one "
    "scan + one 1-row cross join. Per-term contributions are summed "
    "in fixed literal order so the double result is bit-identical "
    "across engines; score compared after dround(4) (no probability "
    "mass at decimal ties for BM25 scores). Top-20 total-ordered by "
    "(rounded score, doc_id).",
    tags=("text", "search", "ranking"),
)
def x44_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tbl(spark, sf_dir, "documents")

    def tf_expr(term: str):
        return F.size(F.filter(F.col("toks"), lambda t: t == F.lit(term)))

    t = docs.select(
        "doc_id",
        T.tokens("text").alias("toks"),
    ).select(
        "doc_id",
        F.size("toks").alias("dl"),
        *[tf_expr(term).alias(f"tf_{term}") for term in _X44_TERMS],
    )
    stats = t.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("dl").cast("bigint").alias("sum_dl"),
        *[
            F.sum((F.col(f"tf_{term}") > 0).cast("int"))
            .cast("bigint")
            .alias(f"df_{term}")
            for term in _X44_TERMS
        ],
    )
    j = t.crossJoin(F.broadcast(stats))

    def contrib(term: str):
        tf = F.col(f"tf_{term}").cast("double")
        df = F.col(f"df_{term}").cast("double")
        n = F.col("n_docs").cast("double")
        avgdl = F.col("sum_dl").cast("double") / n
        idf = F.log(F.lit(1.0) + (n - df + F.lit(0.5)) / (df + F.lit(0.5)))
        return (idf * (tf * F.lit(_X44_K1 + 1.0))) / (
            tf
            + F.lit(_X44_K1)
            * (
                F.lit(1.0 - _X44_B)
                + F.lit(_X44_B) * (F.col("dl").cast("double") / avgdl)
            )
        )

    score = contrib(_X44_TERMS[0])
    for term in _X44_TERMS[1:]:
        score = score + contrib(term)
    hit = sum(
        (F.col(f"tf_{term}") for term in _X44_TERMS[1:]),
        F.col(f"tf_{_X44_TERMS[0]}"),
    )
    return (
        j.filter(hit > 0)
        .select(
            "doc_id",
            dround(score, 4).alias("bm25"),
            *[F.col(f"tf_{term}").cast("bigint").alias(f"tf_{term}") for term in _X44_TERMS],
            F.col("dl").cast("bigint").alias("dl"),
        )
        .orderBy(F.col("bm25").desc(), F.col("doc_id").asc())
        .limit(20)
    )


# ---------------------------------------------------------------- x45
@register(
    "x45_event_funnel",
    oracle="""
        WITH ev AS (
            SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts
            FROM events
        ), s1 AS (
            SELECT user_id, MIN(ts) AS t1 FROM ev
            WHERE event_type = 'view' GROUP BY 1
        ), s2 AS (
            SELECT ev.user_id, MIN(ev.ts) AS t2
            FROM ev JOIN s1 ON ev.user_id = s1.user_id
            WHERE ev.event_type = 'click'
              AND ev.ts > s1.t1 AND ev.ts <= s1.t1 + INTERVAL 1 HOUR
            GROUP BY 1
        ), s3 AS (
            SELECT ev.user_id, MIN(ev.ts) AS t3
            FROM ev JOIN s2 ON ev.user_id = s2.user_id
            WHERE ev.event_type = 'purchase'
              AND ev.ts > s2.t2 AND ev.ts <= s2.t2 + INTERVAL 1 HOUR
            GROUP BY 1
        )
        SELECT (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) FROM ev) AS n_users,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM s1) AS n_view,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM s2) AS n_click_1h,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM s3) AS n_purchase_1h
    """,
    doc="Three-step event funnel (view -> click within 1h -> "
    "purchase within 1h of the click), the classic product-analytics "
    "operator: each step is a per-user MIN-timestamp aggregation "
    "joined forward into the next step's filter — three narrow "
    "shuffles on user_id, no window over event history, no "
    "per-user event-list materialization (the shape that OOMs on "
    "power users at 100 TB). Timestamps are exact microseconds; all "
    "outputs integer.",
    tags=("events", "funnel"),
)
def x45_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tbl(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    hour = F.expr("INTERVAL 1 HOUR")
    s1 = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        ev.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter((F.col("ts") > F.col("t1")) & (F.col("ts") <= F.col("t1") + hour))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter((F.col("ts") > F.col("t2")) & (F.col("ts") <= F.col("t2") + hour))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    c0 = ev.agg(F.count_distinct("user_id").cast("bigint").alias("n_users"))
    c1 = s1.agg(F.count(F.lit(1)).cast("bigint").alias("n_view"))
    c2 = s2.agg(F.count(F.lit(1)).cast("bigint").alias("n_click_1h"))
    c3 = s3.agg(F.count(F.lit(1)).cast("bigint").alias("n_purchase_1h"))
    return c0.crossJoin(c1).crossJoin(c2).crossJoin(c3)


# ---------------------------------------------------------------- x46
@register(
    "x46_cohort_retention",
    oracle="""
        WITH days AS (
            SELECT DISTINCT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day
            FROM events
        ), first AS (
            SELECT user_id, MIN(day) AS cohort_day FROM days GROUP BY 1
        )
        SELECT f.cohort_day,
               CAST(COUNT(DISTINCT f.user_id) AS BIGINT) AS n_users,
               CAST(COUNT(DISTINCT CASE WHEN d.day = f.cohort_day + 1
                    THEN f.user_id END) AS BIGINT) AS n_day1,
               CAST(COUNT(DISTINCT CASE WHEN d.day = f.cohort_day + 7
                    THEN f.user_id END) AS BIGINT) AS n_day7
        FROM first f JOIN days d ON f.user_id = d.user_id
        GROUP BY 1
    """,
    doc="Cohort retention: users grouped by first-active day, with "
    "day-1 and day-7 return counts — the standard growth-analytics "
    "matrix. Two narrow shuffles (per-user distinct activity days, "
    "then a user-keyed join back), conditional COUNT DISTINCT per "
    "offset; no per-user day-list aggregation. All outputs "
    "DATE/BIGINT exact.",
    tags=("events", "cohort"),
)
def x46_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    days = (
        tbl(spark, sf_dir, "events")
        .select("user_id", F.to_date("ts").alias("day"))
        .distinct()
    )
    first = days.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    j = days.join(first, "user_id")
    return j.groupBy("cohort_day").agg(
        F.count_distinct("user_id").cast("bigint").alias("n_users"),
        F.count_distinct(
            F.when(F.col("day") == F.date_add(F.col("cohort_day"), 1), F.col("user_id"))
        )
        .cast("bigint")
        .alias("n_day1"),
        F.count_distinct(
            F.when(F.col("day") == F.date_add(F.col("cohort_day"), 7), F.col("user_id"))
        )
        .cast("bigint")
        .alias("n_day7"),
    )


# ---------------------------------------------------------------- x47
_X47_EMAIL_RE = "[a-z0-9]+@[a-z.]+"
_X47_PHONE_RE = "555-[0-9]{4}"


@register(
    "x47_pii_redaction",
    oracle=f"""
        WITH aug AS (
            SELECT doc_id,
                   text || ' reach user' || CAST(doc_id AS VARCHAR)
                        || '@mail.example or call 555-'
                        || CAST(1000 + doc_id % 9000 AS VARCHAR) AS t
            FROM documents
        ), red AS (
            SELECT doc_id, t,
                   regexp_replace(
                       regexp_replace(t, '{_X47_EMAIL_RE}', '<EMAIL>', 'g'),
                       '{_X47_PHONE_RE}', '<PHONE>', 'g') AS redacted
            FROM aug
        )
        SELECT doc_id,
               CAST(len(regexp_extract_all(t, '{_X47_EMAIL_RE}')) AS BIGINT) AS n_emails,
               CAST(len(regexp_extract_all(t, '{_X47_PHONE_RE}')) AS BIGINT) AS n_phones,
               CAST(length(redacted) AS BIGINT) AS red_len,
               md5(redacted) AS red_md5
        FROM red
    """,
    doc="PII scrubbing for training-data curation: detect and "
    "redact email/phone patterns (documents are augmented with "
    "synthetic PII derived from doc_id, since the corpus has none — "
    "pure column arithmetic, so both engines build the identical "
    "input). Counting via regexp_count and redaction via chained "
    "regexp_replace, all JVM-side; the regexes stay in the common "
    "Java-regex/RE2 subset so both engines match identically. The "
    "md5 of the redacted text pins the exact output string — a "
    "missed or over-eager redaction fails the hash. One scan, no "
    "shuffle, trivially row-parallel at any scale.",
    tags=("text", "pii", "curation"),
)
def x47_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tbl(spark, sf_dir, "documents")
    aug = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" reach user"),
            F.col("doc_id").cast("string"),
            F.lit("@mail.example or call 555-"),
            (F.lit(1000) + F.col("doc_id") % 9000).cast("string"),
        ).alias("t"),
    )
    red = aug.withColumn(
        "redacted",
        F.regexp_replace(
            F.regexp_replace(F.col("t"), _X47_EMAIL_RE, "<EMAIL>"),
            _X47_PHONE_RE,
            "<PHONE>",
        ),
    )
    return red.select(
        "doc_id",
        F.regexp_count(F.col("t"), F.lit(_X47_EMAIL_RE)).cast("bigint").alias("n_emails"),
        F.regexp_count(F.col("t"), F.lit(_X47_PHONE_RE)).cast("bigint").alias("n_phones"),
        F.length("redacted").cast("bigint").alias("red_len"),
        F.md5(F.col("redacted").cast("binary")).alias("red_md5"),
    )


# ---------------------------------------------------------------- x48
@register(
    "x48_salted_join",
    oracle=f"""
        SELECT p.p_brand,
               CAST(COUNT(*) AS BIGINT) AS n_items,
               {sql_money_sum('l.l_extendedprice')} AS revenue
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        GROUP BY 1
    """,
    doc="Skew-proof equi-join under the oracle gate: lineitem joined "
    "to part through operators/scale.py salted_join (hot keys spread "
    "over 8 salt sub-keys, right side replicated 8x) — the "
    "deterministic fallback when one key dominates and the right "
    "side is broadcast-resistant. The salt routes rows but never "
    "changes the join RESULT, so the plain-join SQL oracle pins "
    "row-level equality; the post-join aggregate uses integer cents "
    "so the hash is exact under any salt assignment or partition "
    "order. Complements x35 (salted aggregation) by gating the join "
    "variant.",
    tags=("join", "skew", "scale"),
)
def x48_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = tbl(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("partkey"), "l_extendedprice"
    )
    pt = tbl(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("partkey"), "p_brand"
    )
    joined = SC.salted_join(li, pt, on="partkey", salt=8)
    return joined.groupBy("p_brand").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_items"),
        money_sum(F.col("l_extendedprice")).alias("revenue"),
    )


# ---------------------------------------------------------------- x49
_X49_EPOCH = "1970-01-01"


def _x49_profile_sql(col: str, min_i: str, max_i: str) -> str:
    return f"""
        SELECT '{col}' AS col_name,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(CASE WHEN {col} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
               CAST(COUNT(DISTINCT {col}) AS BIGINT) AS n_distinct,
               CAST({min_i} AS BIGINT) AS min_i,
               CAST({max_i} AS BIGINT) AS max_i
        FROM orders
    """


@register(
    "x49_data_profiling",
    oracle=" UNION ALL ".join(
        [
            _x49_profile_sql("o_orderkey", "MIN(o_orderkey)", "MAX(o_orderkey)"),
            _x49_profile_sql("o_custkey", "MIN(o_custkey)", "MAX(o_custkey)"),
            _x49_profile_sql(
                "o_totalprice",
                "MIN(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))",
                "MAX(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))",
            ),
            _x49_profile_sql(
                "o_orderdate",
                f"MIN(CAST(o_orderdate AS DATE) - DATE '{_X49_EPOCH}')",
                f"MAX(CAST(o_orderdate AS DATE) - DATE '{_X49_EPOCH}')",
            ),
            _x49_profile_sql(
                "o_orderstatus", "MIN(length(o_orderstatus))", "MAX(length(o_orderstatus))"
            ),
        ]
    ),
    doc="One-pass data-quality profiling of a table (the ingest "
    "sanity report every pipeline needs): per-column row/null/"
    "distinct counts plus min/max, ALL encoded as exact BIGINTs "
    "(money as cents, dates as epoch days, strings by length) so no "
    "engine-specific double/str formatting enters the hash. Spark "
    "computes every metric in a SINGLE aggregate pass then unpivots "
    "with stack() — one scan regardless of column count (the "
    "oracle's UNION ALL per column is the naive 5-scan equivalent). "
    "Exact COUNT(DISTINCT) per column costs one Expand; at 100 TB "
    "swap to approx_count_distinct and drop the oracle's exactness "
    "(documented trade).",
    tags=("profiling", "quality"),
)
def x49_data_profiling(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = tbl(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("bigint")
    days = F.datediff(F.to_date("o_orderdate"), F.lit(_X49_EPOCH))
    slen = F.length("o_orderstatus")
    specs = [
        ("o_orderkey", F.col("o_orderkey"), F.col("o_orderkey")),
        ("o_custkey", F.col("o_custkey"), F.col("o_custkey")),
        ("o_totalprice", cents, F.col("o_totalprice")),
        ("o_orderdate", days, F.col("o_orderdate")),
        ("o_orderstatus", slen, F.col("o_orderstatus")),
    ]
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n_rows")]
    for name, enc, raw in specs:
        aggs += [
            F.sum(raw.isNull().cast("bigint")).cast("bigint").alias(f"nn_{name}"),
            F.count_distinct(raw).cast("bigint").alias(f"nd_{name}"),
            F.min(enc).cast("bigint").alias(f"mn_{name}"),
            F.max(enc).cast("bigint").alias(f"mx_{name}"),
        ]
    one = o.agg(*aggs)
    stack_args = []
    for name, _, _ in specs:
        stack_args += [
            f"'{name}'",
            "n_rows",
            f"nn_{name}",
            f"nd_{name}",
            f"mn_{name}",
            f"mx_{name}",
        ]
    return one.selectExpr(
        f"stack({len(specs)}, {', '.join(stack_args)}) AS "
        "(col_name, n_rows, n_null, n_distinct, min_i, max_i)"
    )
