from __future__ import annotations

import datetime

import pytest

from pyspark.sql import functions as F

from duckdb_retail_pipeline_spark.functions import datetime_fns as DT
from duckdb_retail_pipeline_spark.functions.aggregates import deterministic_mode
from duckdb_retail_pipeline_spark.operators import joins as J
from duckdb_retail_pipeline_spark.operators import merge as MG


def test_asof_join_forward_direction(spark):
    left = spark.createDataFrame(
        [(1, datetime.date(2020, 1, 5)), (2, datetime.date(2020, 1, 20))],
        "id bigint, t date",
    )
    right = spark.createDataFrame(
        [(datetime.date(2020, 1, 10), 100.0), (datetime.date(2020, 1, 25), 200.0)],
        "t date, v double",
    )
    out = {
        r["id"]: r["v"]
        for r in J.asof_join(left, right, on_time="t", direction="forward").collect()
    }
    # id 1 (Jan 5) → next at-or-after is Jan 10; id 2 (Jan 20) → Jan 25
    assert out == {1: 100.0, 2: 200.0}


def test_asof_join_backward_equal_timestamp_matches(spark):
    left = spark.createDataFrame([(1, datetime.date(2020, 1, 10))], "id bigint, t date")
    right = spark.createDataFrame([(datetime.date(2020, 1, 10), 7.0)], "t date, v double")
    out = J.asof_join(left, right, on_time="t", direction="backward").collect()
    assert out[0]["v"] == 7.0  # at-or-before includes the equal instant


def test_range_join_bucketed(spark):
    points = spark.createDataFrame([(i, float(i)) for i in range(20)], "id bigint, v double")
    intervals = spark.createDataFrame(
        [(0.0, 5.0, "low"), (4.0, 10.0, "mid"), (15.0, 30.0, "high")],
        "lo double, hi double, label string",
    )
    out = J.range_join_bucketed(points, intervals, "v", "lo", "hi", bucket_width=4.0)
    got = sorted((r["id"], r["label"]) for r in out.collect())
    expected = sorted(
        (i, lab)
        for i in range(20)
        for lo, hi, lab in [(0, 5, "low"), (4, 10, "mid"), (15, 30, "high")]
        if lo <= i <= hi
    )
    assert got == expected


def test_deterministic_mode_tie_break(spark):
    df = spark.createDataFrame(
        [("k", "b"), ("k", "a"), ("k", "b"), ("k", "a"), ("k2", None), ("k2", "z")],
        "g string, v string",
    )
    out = {r["g"]: r["v"] for r in deterministic_mode(df, ["g"], "v").collect()}
    assert out["k"] == "a"  # tie (2 vs 2) → smallest value wins
    assert out["k2"] == "z"  # NULLs excluded from mode


def test_date_spine_dense_and_bounded(spark):
    spine = DT.date_spine(spark, "2020-02-27", "2020-03-02")
    dates = [r["date"] for r in spine.orderBy("date").collect()]
    assert dates[0] == datetime.date(2020, 2, 27)
    assert dates[-1] == datetime.date(2020, 3, 2)
    assert len(dates) == 5  # leap day included, no gaps


def test_iso_year_week_boundaries(spark):
    # 2021-01-01 is a Friday of ISO week 53 of ISO year 2020
    df = spark.createDataFrame([(datetime.date(2021, 1, 1),)], "d date")
    row = df.select(
        DT.iso_year("d").alias("iy"), DT.iso_week("d").alias("iw"),
        DT.duck_dow("d").alias("dow"),
    ).first()
    assert (row["iy"], row["iw"], row["dow"]) == (2020, 53, 5)


def test_scd2_as_of_view(spark):
    dim = spark.createDataFrame(
        [(1, "A", datetime.date(2020, 1, 1))],
        "k bigint, attr string, effective_from date",
    )
    changes = spark.createDataFrame(
        [(1, "B", datetime.date(2021, 1, 1))],
        "k bigint, attr string, effective_from date",
    )
    hist = MG.scd2_apply(dim, changes, ["k"])
    before = MG.as_of(hist, "2020-06-01").collect()
    after = MG.as_of(hist, "2021-06-01").collect()
    assert [r["attr"] for r in before] == ["A"]
    assert [r["attr"] for r in after] == ["B"]
    current = {r["attr"]: r["is_current"] for r in hist.collect()}
    assert current == {"A": False, "B": True}


def test_upsert_semantics(spark):
    target = spark.createDataFrame([(1, "old"), (2, "keep")], "k bigint, v string")
    updates = spark.createDataFrame([(1, "new"), (3, "ins")], "k bigint, v string")
    out = {r["k"]: r["v"] for r in MG.upsert(target, updates, ["k"]).collect()}
    assert out == {1: "new", 2: "keep", 3: "ins"}


def test_session_boundary_exactly_gap_apart(spark):
    """Pin the session-gap boundary contract: Spark's native
    session_window MERGES an event arriving exactly gap seconds after
    the previous one (a new event extends the session when its ts is
    <= the current session end), which is exactly the strict-> gap
    test of operators.windows.sessionize — so the lag+cumsum x21/x15
    oracles (gap > 1800) agree with session_window AT the boundary,
    and both split only strictly beyond it."""
    import datetime as dt

    from duckdb_retail_pipeline_spark.operators import windows as W

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    ev = spark.createDataFrame(
        [
            (1, 7, t0),
            (2, 7, t0 + dt.timedelta(seconds=1800)),  # exactly the gap
            (3, 7, t0 + dt.timedelta(seconds=1800 + 1801)),  # just over
        ],
        "event_id long, user_id long, ts timestamp",
    )
    native = (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert sorted(r["n"] for r in native) == [1, 2]  # merge at, split past

    sess = W.sessionize(ev, "ts", "user_id", gap_minutes=30, tiebreak=["event_id"])
    per_session = sorted(
        r["n"]
        for r in sess.groupBy("session_seq").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    assert per_session == [1, 2]  # identical boundary behavior


def test_arrow_dot_kernel_bit_identical_to_hof(spark, sf_dir):
    """The vectorized Arrow dot kernel must reproduce the HOF fold
    BIT-FOR-BIT (it is the default scoring kernel; the oracle SQL
    twins pin the HOF fold's IEEE op sequence). Zero-tolerance
    null-safe equality over real embeddings: plane dots, norms, pair
    dots — plus the NULL/ragged degradation rows."""
    from duckdb_retail_pipeline_spark.functions import vectors as V

    emb = spark.read.parquet(
        f"{sf_dir}/embeddings.parquet"
    ).select("vec_id", "embedding")
    plane = V.rademacher_planes(1, 64)[0]
    p = F.array(*[F.lit(float(x)) for x in plane])
    q = emb.limit(5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    chk = emb.crossJoin(F.broadcast(q)).select(
        V._arrow_dot(F.col("embedding"), p).alias("a_plane"),
        V.dot_hof(F.col("embedding"), p).alias("h_plane"),
        F.sqrt(V._arrow_self_dot(F.col("embedding"))).alias("a_norm"),
        V.norm_hof("embedding").alias("h_norm"),
        V._arrow_dot(F.col("embedding"), F.col("qvec")).alias("a_pair"),
        V.dot_hof(F.col("embedding"), F.col("qvec")).alias("h_pair"),
        V._arrow_l2sq(F.col("embedding"), F.col("qvec")).alias("a_l2"),
    )
    bad = chk.filter(
        ~F.col("a_plane").eqNullSafe(F.col("h_plane"))
        | ~F.col("a_norm").eqNullSafe(F.col("h_norm"))
        | ~F.col("a_pair").eqNullSafe(F.col("h_pair"))
    ).count()
    assert bad == 0

    # NULL / ragged rows degrade to NULL like zip_with's null padding
    odd = spark.createDataFrame(
        [(1, [1.0, 2.0], [3.0, 4.0]), (2, None, [1.0]), (3, [1.0], [1.0, 2.0])],
        "id long, a array<double>, b array<double>",
    )
    rows = {
        r["id"]: r["d"]
        for r in odd.select("id", V.dot("a", "b").alias("d")).collect()
    }
    assert rows[1] == 11.0 and rows[2] is None and rows[3] is None


def test_dot_kernels_on_pathological_values(spark):
    """r13 probe wave (r12 verdict #5a): the Arrow and HOF dot
    kernels must agree on the PATHOLOGICAL inputs, not just clean
    embeddings — ±Inf components, zero vectors, empty arrays, an
    all-empty batch — and the ONE documented divergence (a genuinely
    NaN-valued dot: HOF yields double NaN, the Arrow return channel
    maps NaN → NULL via pyarrow from_pandas; no registered dataset
    can produce NaN) is PINNED here so a kernel change that widens
    or silently 'fixes' it fails loudly."""
    import math

    from duckdb_retail_pipeline_spark.functions import vectors as V

    inf = float("inf")
    nan = float("nan")
    rows = [
        # (id, a, b): finite baseline, +inf product, -inf product,
        # inf-inf → NaN mid-fold, NaN component, zero vectors,
        # empty arrays
        (1, [1.0, 2.0], [3.0, 4.0]),
        (2, [inf, 1.0], [2.0, 1.0]),
        (3, [-inf, 1.0], [2.0, 1.0]),
        (4, [inf, inf], [1.0, -1.0]),
        (5, [nan, 1.0], [1.0, 1.0]),
        (6, [0.0, 0.0], [0.0, 0.0]),
        (7, [], []),
    ]
    df = spark.createDataFrame(rows, "id long, a array<double>, b array<double>")
    got = {
        r["id"]: (r["ad"], r["hd"], r["cos"])
        for r in df.select(
            "id",
            V._arrow_dot("a", "b").alias("ad"),
            V.dot_hof("a", "b").alias("hd"),
            V.cosine_similarity("a", "b").alias("cos"),
        ).collect()
    }
    assert got[1][0] == got[1][1] == 11.0
    assert got[2][0] == got[2][1] == inf
    assert got[3][0] == got[3][1] == -inf
    # the documented NaN divergence, pinned exactly: HOF NaN, Arrow NULL
    for rid in (4, 5):
        assert got[rid][0] is None, rid
        assert got[rid][1] is not None and math.isnan(got[rid][1]), rid
    # zero / empty vectors: dot 0.0 on both kernels, cosine NULL
    # (nullif zero-norm guard) — never a div-by-zero NaN
    for rid in (6, 7):
        assert got[rid][0] == got[rid][1] == 0.0, rid
        assert got[rid][2] is None, rid

    # an ALL-empty-array batch exercises the non-fast grouped path
    # (lens[0] == 0 fails the fast-path guard) — must not crash and
    # must yield 0.0 everywhere
    all_empty = spark.createDataFrame(
        [(i, [], []) for i in range(5)],
        "id long, a array<double>, b array<double>",
    )
    vals = [
        r["d"] for r in all_empty.select(V._arrow_dot("a", "b").alias("d")).collect()
    ]
    assert vals == [0.0] * 5

    # plane_dots on pathological rows: NULL vector and wrong-dim
    # vector → NULL array (the invalid-row path); an Inf component
    # flows through the fold like any IEEE double
    pdf = spark.createDataFrame(
        [(1, [1.0, -1.0]), (2, None), (3, [1.0]), (4, [inf, 1.0])],
        "id long, v array<double>",
    )
    pd_rows = {
        r["id"]: r["pd"]
        for r in pdf.select(
            "id", V.plane_dots("v", [[1.0, 1.0], [1.0, -1.0]]).alias("pd")
        ).collect()
    }
    assert list(pd_rows[1]) == [0.0, 2.0]
    assert pd_rows[2] is None and pd_rows[3] is None
    assert list(pd_rows[4]) == [inf, inf]


def test_plane_dots_bit_identical_and_deduped(spark, sf_dir):
    """plane_dots must equal per-plane dot() bit-for-bit (the LSH
    band keys derived from its signs are oracle-matched in x11/x42),
    and every sign bit must share ONE kernel evaluation — the plan
    carries a single _plane_dots result however many consumers
    (the vector crosses the Arrow channel once, not once per
    plane)."""
    from duckdb_retail_pipeline_spark.functions import vectors as V

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    planes = V.rademacher_planes(8, 64)
    dots = V.plane_dots("embedding", planes)
    per_plane = [
        V._arrow_dot(
            F.col("embedding"), F.array(*[F.lit(float(x)) for x in p])
        )
        for p in planes
    ]
    bad = (
        emb.select(
            *[
                (~F.element_at(dots, i + 1).eqNullSafe(per_plane[i])).alias(f"m{i}")
                for i in range(8)
            ]
        )
        .filter(F.greatest(*[F.col(f"m{i}") for i in range(8)]))
        .count()
    )
    assert bad == 0

    proj = emb.select(
        *[(F.element_at(dots, i + 1) >= 0).alias(f"b{i}") for i in range(8)]
    )
    plan = proj._jdf.queryExecution().executedPlan().toString()
    assert plan.count("_plane_dots(embedding") >= 1
    import re

    node = re.search(r"ArrowEvalPython \[([^\]]*)\]", plan)
    assert node and node.group(1).count("_plane_dots") == 1


def test_text_kernels_bit_identical_to_hof(spark, sf_dir):
    """The Arrow MinHash/SimHash kernels must reproduce the HOF folds
    BIT-FOR-BIT on real documents (they are the default fingerprint
    kernels; the DuckDB oracle twins pin the HOF integer math), and
    the NULL/empty degradations must match exactly."""
    from duckdb_retail_pipeline_spark.functions import text as T

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    d = (
        docs.select(
            "doc_id",
            T.word_shingles("text", 3).alias("sh"),
            T.tokens("text").alias("tk"),
        )
        .withColumn("hs", T.shingle_hashes28("sh"))
    )
    bad = (
        d.select(
            T.minhash_signature_from_hashes("hs", 16).alias("a_sig"),
            T.minhash_from_hashes_hof("hs", 16).alias("h_sig"),
            T.simhash64("tk").alias("a_sim"),
            T.simhash64_hof("tk").alias("h_sim"),
        )
        .filter(
            ~F.col("a_sig").eqNullSafe(F.col("h_sig"))
            | ~F.col("a_sim").eqNullSafe(F.col("h_sim"))
        )
        .count()
    )
    assert bad == 0

    # NULL array / empty array / NULL elements degrade identically
    edge = spark.createDataFrame(
        [
            (1, [5, None, 9], ["a", None, "b"]),
            (2, [], []),
            (3, None, None),
            (4, [None], [None]),
        ],
        "id long, hs array<bigint>, tk array<string>",
    )
    rows = edge.select(
        "id",
        T.minhash_signature_from_hashes("hs", 4).alias("a_sig"),
        T.minhash_from_hashes_hof("hs", 4).alias("h_sig"),
        T.simhash64("tk").alias("a_sim"),
        T.simhash64_hof("tk").alias("h_sim"),
    ).collect()
    for r in rows:
        assert r["a_sig"] == r["h_sig"], r
        assert r["a_sim"] == r["h_sim"], r


def test_minhash_verify_modes_identical(spark, sf_dir):
    """bucket-local verification (arrays ride the banding shuffle,
    jaccard streams inside the join stage — the shape that survives
    duplicate-heavy corpora; pair-materializing verify shuffled ~400
    GB of arrays at the 100× decade and died on spill disk) must
    produce EXACTLY the pair set + jaccard values of pair-join
    verification."""
    from duckdb_retail_pipeline_spark.operators import dedup as D

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    bkt = D.minhash_lsh_pairs(docs, 0.7, 16, 8, verify="bucket")
    prs = D.minhash_lsh_pairs(docs, 0.7, 16, 8, verify="pairs")
    grp = D.minhash_lsh_pairs(docs, 0.7, 16, 8, verify="group")
    for other in (prs, grp):
        j = bkt.alias("x").join(other.alias("y"), ["id_a", "id_b"], "full_outer")
        mism = j.filter(
            ~F.expr("x.jaccard").eqNullSafe(F.expr("y.jaccard"))
        ).count()
        assert mism == 0
    import pytest

    with pytest.raises(ValueError):
        D.minhash_lsh_pairs(docs, 0.7, 16, 8, verify="nope")


def test_embedding_dup_verify_modes_identical(spark):
    """Bucket-grouped Arrow verification (each bucket's vectors
    materialize once; ascending-dimension numpy fold ≡ the Arrow dot's
    IEEE op sequence) must produce EXACTLY the pair set + rounded
    cosine of pair-join verification — including on a corpus with a
    duplicated id, a NULL vector, a length-mismatched vector, a zero
    vector, and scaled near-duplicates."""
    import pytest

    from duckdb_retail_pipeline_spark.operators import dedup as D

    dim, n = 16, 120
    rows = []
    for i in range(n):
        vec = [float(((i * 31 + d * 7) % 19) - 9) for d in range(dim)]
        rows.append((i, vec))
    for i in range(0, n, 6):  # exact duplicates
        rows.append((10000 + i, rows[i][1]))
    for i in range(0, n, 9):  # scaled copies: cosine exactly 1.0
        rows.append((20000 + i, [x * 2.0 for x in rows[i][1]]))
    rows.append((5, rows[5][1]))  # duplicated id — must never self-pair
    rows.append((30000, None))  # NULL vector
    rows.append((30001, [1.0] * (dim + 3)))  # length mismatch
    rows.append((30002, [0.0] * dim))  # zero norm → NULL cosine
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    prs = D.embedding_dup_pairs(
        emb, threshold=0.999, dim=dim, n_planes=16, bands=4, verify="pairs"
    )
    grp = D.embedding_dup_pairs(
        emb, threshold=0.999, dim=dim, n_planes=16, bands=4, verify="group"
    )
    j = prs.alias("x").join(grp.alias("y"), ["id_a", "id_b"], "full_outer")
    mism = j.filter(~F.expr("x.cosine").eqNullSafe(F.expr("y.cosine"))).count()
    assert mism == 0
    assert prs.count() > 0  # the exact/scaled dups actually surfaced

    with pytest.raises(ValueError):
        D.embedding_dup_pairs(emb, verify="nope")


def test_minhash_kernel_single_evaluation_in_plan(spark, sf_dir):
    """x06 projects 16 per-permutation columns off one signature —
    the HOF form inlined the whole 16-permutation expression per
    column (256 interpreted passes); the Arrow kernel must appear
    exactly ONCE in the ArrowEvalPython node however many columns
    consume it."""
    import re

    from duckdb_retail_pipeline_spark.queries import REGISTRY

    df = REGISTRY["x06_minhash_signatures"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    node = re.search(r"ArrowEvalPython \[([^\]]*)\]", plan)
    assert node and node.group(1).count("_minhash_sig") == 1


def test_minhash_modes_identical_under_duplicated_id_with_differing_text(spark):
    """A duplicated doc_id with DIFFERING texts fans the candidate
    re-join out to several scored rows per (id_a, id_b); every verify
    mode must resolve that deterministically to one row via MAX
    (a dropDuplicates would keep one nondeterministically and the
    modes' value-identity contract would only hold by luck)."""
    from duckdb_retail_pipeline_spark.operators import dedup as D

    base = "the quick brown fox jumps over the lazy dog again and again "
    rows = [(i, base + f"variant {i} " + base) for i in range(40)]
    rows += [(100 + i, base + f"variant {i} " + base) for i in range(0, 40, 4)]
    # id 7 twice, with different text: one copy near-dups id 3's
    # family, the other is its exact text — both candidate routes
    # score (3, 7) / (7, 103) etc. with different jaccards
    rows.append((7, base + "variant 3 " + base))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    outs = {
        mode: D.minhash_lsh_pairs(docs, 0.5, 16, 8, verify=mode)
        for mode in ("pairs", "bucket", "group")
    }
    for name, df in outs.items():
        pairs = df.groupBy("id_a", "id_b").count().filter("count > 1").count()
        assert pairs == 0, f"{name} emitted a duplicate pair row"
    collected = {
        name: sorted(map(tuple, df.collect())) for name, df in outs.items()
    }
    assert collected["pairs"] == collected["bucket"] == collected["group"]
    assert collected["pairs"], "corpus produced no pairs — test is vacuous"


def test_embedding_modes_drop_nan_vectors_identically(spark):
    """A NaN-poisoned vector must never surface as a near-dup pair in
    ANY mode: the Arrow dot kernel maps a NaN dot to NULL (filtered),
    and the group kernel must drop NaN candidates rather than emit
    (id_a, id_b, NULL) rows pairs-mode never produces."""
    from duckdb_retail_pipeline_spark.operators import dedup as D

    dim = 8
    rows = [
        (i, [float((i * 13 + d * 5) % 11 - 5) for d in range(dim)])
        for i in range(30)
    ]
    rows += [(1000 + i, rows[i][1]) for i in range(0, 30, 3)]  # exact dups
    rows.append((2000, [float("nan")] * dim))
    rows.append((2001, [1.0] * (dim - 1) + [float("nan")]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    prs = D.embedding_dup_pairs(
        emb, threshold=0.999, dim=dim, n_planes=16, bands=4, verify="pairs"
    )
    grp = D.embedding_dup_pairs(
        emb, threshold=0.999, dim=dim, n_planes=16, bands=4, verify="group"
    )
    for name, df in (("pairs", prs), ("group", grp)):
        bad = df.filter(
            F.col("id_a").isin(2000, 2001)
            | F.col("id_b").isin(2000, 2001)
            | F.col("cosine").isNull()
            | F.isnan("cosine")
        ).count()
        assert bad == 0, f"{name} surfaced a NaN-poisoned pair"
    j = prs.alias("x").join(grp.alias("y"), ["id_a", "id_b"], "full_outer")
    assert j.filter(~F.expr("x.cosine").eqNullSafe(F.expr("y.cosine"))).count() == 0
    assert prs.count() > 0


def test_rotating_persist_invalidates_on_in_session_regeneration(spark, tmp_path):
    """sameSemantics compares canonical plans, and a parquet relation
    canonicalizes on its root path only — regenerating the dataset
    under the same path must rotate the occupant, not serve the stale
    materialized corpus (the invalidation dataset_memo's mtime
    signature provides, derived here from the plan's input files)."""
    import os
    import time

    from duckdb_retail_pipeline_spark.memo import rotating_persist

    p = str(tmp_path / "docs.parquet")
    slot: list = []

    spark.createDataFrame([(1, "old")], "id long, v string").write.mode(
        "overwrite"
    ).parquet(p)
    first = rotating_persist(spark.read.parquet(p), slot)
    assert [r["v"] for r in first.collect()] == ["old"]

    time.sleep(0.01)  # distinct mtime_ns even on coarse filesystems
    spark.createDataFrame([(1, "new")], "id long, v string").write.mode(
        "overwrite"
    ).parquet(p)
    second = rotating_persist(spark.read.parquet(p), slot)
    assert [r["v"] for r in second.collect()] == ["new"]
    # and a genuine repeat (no regeneration) is the SAME occupant —
    # the fast path the bench accounting depends on
    assert rotating_persist(spark.read.parquet(p), slot) is second


def test_memoized_count_caches_and_invalidates(spark, tmp_path):
    """The auto-mode corpus probe must be a dict hit on repeat
    invocations (r7 verdict #2: the unmemoized count re-scanned the
    persisted signature table every bench pass) and must re-count
    when the dataset regenerates in-session under the same path."""
    import time

    from duckdb_retail_pipeline_spark.memo import _COUNT_MEMO, memoized_count

    p = str(tmp_path / "t.parquet")
    spark.createDataFrame([(i,) for i in range(5)], "id long").write.mode(
        "overwrite"
    ).parquet(p)
    assert memoized_count(spark.read.parquet(p)) == 5
    before = len(_COUNT_MEMO)
    assert memoized_count(spark.read.parquet(p)) == 5
    assert len(_COUNT_MEMO) == before  # repeat was a dict hit, no new entry

    time.sleep(0.01)  # distinct mtime_ns even on coarse filesystems
    spark.createDataFrame([(i,) for i in range(7)], "id long").write.mode(
        "overwrite"
    ).parquet(p)
    n_entries = len(_COUNT_MEMO)
    assert memoized_count(spark.read.parquet(p)) == 7
    # the regeneration REPLACED the entry under its (app, hash) key —
    # signature-in-key minted a dead entry per regeneration and the
    # memo grew without bound (r8 ADVICE)
    assert len(_COUNT_MEMO) == n_entries


def test_memoized_count_matches_plan_under_cache_substitution(spark, tmp_path):
    """r8 verdict #6 probe: once a frame is cached, a semantically
    equal plan's inputFiles() returns [] (Spark substitutes the
    cached relation), so the memo's input-file signature degrades to
    None for DERIVED plans over the cached occupant. The invariant
    that must hold anyway: memoized_count(df) == df.count() at every
    step — including while a stale cache is being served (the count
    must agree with what the PLAN computes, which IS the stale cache)
    and after rotating_persist rotates the occupant on regeneration
    (fresh file-backed signature → recount on the new data)."""
    import time

    from duckdb_retail_pipeline_spark.memo import memoized_count, rotating_persist

    p = str(tmp_path / "t.parquet")
    spark.createDataFrame([(i,) for i in range(5)], "id long").write.mode(
        "overwrite"
    ).parquet(p)
    slot: list = []
    occ = rotating_persist(spark.read.parquet(p), slot)
    derived = occ.filter("id >= 0")
    assert memoized_count(derived) == derived.count() == 5

    time.sleep(0.01)
    spark.createDataFrame([(i,) for i in range(7)], "id long").write.mode(
        "overwrite"
    ).parquet(p)
    # rotation evicts the stale occupant and persists the new frame
    occ2 = rotating_persist(spark.read.parquet(p), slot)
    derived2 = occ2.filter("id >= 0")
    assert memoized_count(derived2) == derived2.count() == 7
    slot.pop()[0].unpersist()


def test_register_paste_vs_reload_discrimination():
    """A pasted duplicate registers twice within ONE module execution
    (same _EXEC_TOKEN) — must raise; an importlib.reload re-executes
    the module top first and mints a NEW token, so re-registration
    after a reload (even with the definition moved to a different
    line, the edit-reload workflow) stays idempotent. The r9 review
    showed a source-line compare cannot make this distinction — any
    edit shifting lines above a query re-broke the r7 reload fix."""
    import pytest

    from duckdb_retail_pipeline_spark.queries.base import REGISTRY, register

    name = "zz_test_paste_guard"
    src_v1 = "def probe(spark, sf_dir):\n    return None\n"
    src_v2 = "# an edit shifting every line below it\n\n" + src_v1
    try:
        ns = {"_EXEC_TOKEN": object(), "__name__": "zz_fake_queries_mod"}
        exec(src_v1, ns)
        first = ns["probe"]
        register(name, oracle=None)(first)

        # same function object re-registering is always fine
        register(name, oracle=None)(first)
        assert REGISTRY[name].fn is first

        # PASTE: a second same-named definition in the SAME execution
        exec(src_v1, ns)
        with pytest.raises(ValueError, match="already registered"):
            register(name, oracle=None)(ns["probe"])

        # RELOAD: new module execution (fresh token), definition at a
        # DIFFERENT source line — idempotent refresh, never a raise
        ns2 = {"_EXEC_TOKEN": object(), "__name__": "zz_fake_queries_mod"}
        exec(src_v2, ns2)
        register(name, oracle=None)(ns2["probe"])
        assert REGISTRY[name].fn is ns2["probe"]
    finally:
        REGISTRY.pop(name, None)


def test_register_survives_real_importlib_reload(tmp_path):
    """importlib.reload re-executes the module in the SAME module
    dict — so after the reload, a live read of _EXEC_TOKEN through
    the OLD function's __globals__ resolves to the NEW token. The
    r9 ADVICE showed the live-vs-live compare therefore classified
    every real reload as a paste and raised; the snapshot-at-
    registration compare (QuerySpec.exec_token) must stay idempotent
    under reload's shared-dict semantics, which the fresh-exec
    simulation above cannot exercise."""
    import importlib
    import importlib.util
    import sys

    from duckdb_retail_pipeline_spark.queries.base import REGISTRY, register  # noqa: F401

    name = "zz_test_reload_guard"
    mod_name = "zz_reload_probe_mod"
    src = (
        "from duckdb_retail_pipeline_spark.queries.base import register\n"
        "_EXEC_TOKEN = object()\n"
        f"@register({name!r}, oracle=None)\n"
        "def probe(spark, sf_dir):\n"
        "    return None\n"
    )
    path = tmp_path / f"{mod_name}.py"
    path.write_text(src)
    sys.path.insert(0, str(tmp_path))
    try:
        mod = importlib.import_module(mod_name)
        first = REGISTRY[name].fn
        reloaded = importlib.reload(mod)  # must NOT raise
        assert REGISTRY[name].fn is reloaded.probe
        assert REGISTRY[name].fn is not first
    finally:
        sys.path.remove(str(tmp_path))
        sys.modules.pop(mod_name, None)
        REGISTRY.pop(name, None)


def test_every_registered_query_carries_exec_token():
    """A query module that omits the _EXEC_TOKEN nonce loses paste-
    duplicate detection silently (r9 ADVICE): register() now raises
    at import time for queries-package modules, and this asserts the
    whole live registry carries the snapshot."""
    from duckdb_retail_pipeline_spark.queries import REGISTRY

    missing = [n for n, s in REGISTRY.items() if s.exec_token is None]
    assert missing == []


def test_inline_ivf_topk_does_not_leak_cache_entries(spark, sf_dir):
    """ivf_topk with index=None is the one-shot path: repeated calls
    must not pin per-call corpus-sized SQL-cache entries (only an
    OWNED index — dataset_memo's — may persist the assignment)."""
    from duckdb_retail_pipeline_spark.operators import similarity as S

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = [float(x) for x in emb.limit(1).collect()[0]["embedding"]]
    cm = spark._jsparkSession.sharedState().cacheManager()
    before = cm.cachedData().size()
    for _ in range(2):
        S.ivf_topk(emb, q, k=3, n_cells=4, nprobe=2).collect()
    assert cm.cachedData().size() == before


def test_asof_join_attaches_whole_row_and_ignores_null_times(spark):
    """The payload fills as one struct: a NULL field in the most
    recent right row must come through as NULL, not be back-filled
    from an OLDER right row (the chimera bug). NULL-time rows never
    match on either side, and payload-name collisions raise."""
    import pytest

    from duckdb_retail_pipeline_spark.operators import joins as J

    right = spark.createDataFrame(
        [(1, 1, 2), (2, None, 3), (None, 99, 99)],
        "t long, a long, b long",
    )
    left = spark.createDataFrame([(3,), (None,)], "t long")
    out = {
        r["t"]: (r["a"], r["b"])
        for r in J.asof_join(left, right, on_time="t").collect()
    }
    # most recent right row at t<=3 is (t=2, a=NULL, b=3) — attached
    # whole, not mixed with the t=1 row's a=1; the t=NULL right row
    # (99, 99) must never surface
    assert out[3] == (None, 3), out
    assert out[None] == (None, None), out

    clash = spark.createDataFrame([(1, 5)], "t long, a long")
    with pytest.raises(ValueError):
        J.asof_join(clash, right, on_time="t")


def test_scd2_same_day_correction_is_deterministic(spark):
    """A change sharing effective_from with an existing version must
    supersede it deterministically: the dim row gets a zero-length
    interval as_of can never select, the change becomes current."""
    from duckdb_retail_pipeline_spark.operators import merge as MG

    dim = spark.createDataFrame(
        [(1, "v1", "2020-01-01")], "k long, attr string, effective_from string"
    ).withColumn("effective_from", F.col("effective_from").cast("date"))
    changes = spark.createDataFrame(
        [(1, "v2", "2020-01-01")], "k long, attr string, effective_from string"
    ).withColumn("effective_from", F.col("effective_from").cast("date"))
    hist = MG.scd2_apply(dim, changes, ["k"])
    current = {r["attr"]: r["is_current"] for r in hist.collect()}
    assert current == {"v1": False, "v2": True}
    visible = MG.as_of(hist, "2020-06-01").collect()
    assert len(visible) == 1 and visible[0]["attr"] == "v2"


def test_bigram_lm_scores_hand_computed(spark):
    """Tiny corpus with known counts: contexts 'a'->{b:2, c:1},
    so p(b|a)=666666 scaled, p(c|a)=333333; doc scores are exact
    integer floor-means of those."""
    from duckdb_retail_pipeline_spark.operators.lm import bigram_lm_scores

    docs = spark.createDataFrame(
        [
            (1, "a b"),          # one bigram: (a,b)
            (2, "a b"),          # same
            (3, "a c"),          # (a,c)
            (4, "solo"),         # < 2 tokens: omitted
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in bigram_lm_scores(docs).collect()}
    assert set(out) == {1, 2, 3}
    assert out[1]["n_bigrams"] == 1 and out[1]["lm_score_scaled"] == 666666
    assert out[3]["lm_score_scaled"] == 333333


def test_bigram_lm_scores_matches_duckdb(spark, sf_dir, duck):
    """Full differential on the real documents table: the integer
    floor-scaled arithmetic must replay exactly in ANSI SQL (the
    x54 no-ln convention)."""
    from duckdb_retail_pipeline_spark.operators.lm import SCALE, bigram_lm_scores
    from tests.compare import assert_matches

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = bigram_lm_scores(docs)
    oracle = rf"""
        WITH t AS (
            SELECT doc_id,
                   list_filter(string_split_regex(text, '\s+'), x -> x != '') AS toks
            FROM documents
        ), bg AS (
            SELECT doc_id,
                   unnest(toks[1:len(toks)-1]) AS w1,
                   unnest(toks[2:len(toks)]) AS w2
            FROM t WHERE len(toks) >= 2
        ), ctx AS (
            SELECT w1, CAST(COUNT(*) AS BIGINT) AS c_ctx FROM bg GROUP BY 1
        ), cbg AS (
            SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c_bg FROM bg GROUP BY 1, 2
        )
        SELECT b.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_bigrams,
               CAST(CAST(SUM((c.c_bg * {SCALE}) // x.c_ctx) AS BIGINT)
                    // COUNT(*) AS BIGINT) AS lm_score_scaled
        FROM bg b
        JOIN cbg c ON b.w1 = c.w1 AND b.w2 = c.w2
        JOIN ctx x ON b.w1 = x.w1
        GROUP BY b.doc_id
    """
    assert_matches(out, duck, oracle, name="bigram_lm_scores")


def test_bigram_lm_scores_external_reference(spark):
    """Against an external reference, unseen bigrams contribute 0
    instead of dropping the row."""
    from duckdb_retail_pipeline_spark.operators.lm import bigram_lm_scores

    ref = spark.createDataFrame([(10, "x y"), (11, "x y")], "doc_id long, text string")
    docs = spark.createDataFrame([(1, "x y x z")], "doc_id long, text string")
    # bigrams of doc 1: (x,y) seen p=1.0, (y,x) unseen 0, (x,z) unseen 0
    row = bigram_lm_scores(docs, reference=ref).collect()[0]
    assert row["n_bigrams"] == 3
    assert row["lm_score_scaled"] == 1_000_000 // 3


def test_rrf_fuse_hand_computed_and_duckdb(spark, duck):
    """Hybrid-retrieval RRF: exact rational ranking (no float sum),
    partial-overlap semantics, deterministic ties — checked by hand
    and against a DuckDB twin with the same integer arithmetic."""
    from duckdb_retail_pipeline_spark.operators.similarity import rrf_fuse

    a = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3), (2, 20, 1)],
        "query_id long, doc_id long, rnk long",
    )
    b = spark.createDataFrame(
        [(1, 11, 1), (1, 13, 2), (2, 20, 1)],
        "query_id long, doc_id long, rnk long",
    )
    out = rrf_fuse(a, b, k=60)
    rows = {(r["query_id"], r["doc_id"]): r for r in out.collect()}
    # doc 11: ranks (2, 1) -> (62+61)*1e12 // (62*61)
    assert rows[(1, 11)]["rrf_scaled"] == (62 + 61) * 10**12 // (62 * 61)
    assert rows[(1, 11)]["fused_rank"] == 1  # both-lists doc wins
    # doc 10 only in a at rank 1: 1e12 // 61
    assert rows[(1, 10)]["rrf_scaled"] == 10**12 // 61
    assert rows[(2, 20)]["fused_rank"] == 1

    duck.execute("CREATE OR REPLACE TEMP TABLE ra AS SELECT * FROM (VALUES "
                 "(1,10,1),(1,11,2),(1,12,3),(2,20,1)) t(query_id, doc_id, rnk)")
    duck.execute("CREATE OR REPLACE TEMP TABLE rb AS SELECT * FROM (VALUES "
                 "(1,11,1),(1,13,2),(2,20,1)) t(query_id, doc_id, rnk)")
    oracle = """
        WITH j AS (
            SELECT COALESCE(a.query_id, b.query_id) AS query_id,
                   COALESCE(a.doc_id, b.doc_id) AS doc_id,
                   CAST(a.rnk + 60 AS BIGINT) AS da,
                   CAST(b.rnk + 60 AS BIGINT) AS db
            FROM ra a FULL OUTER JOIN rb b
              ON a.query_id = b.query_id AND a.doc_id = b.doc_id
        ), s AS (
            SELECT query_id, doc_id,
                   CASE
                     WHEN da IS NOT NULL AND db IS NOT NULL
                       THEN ((da + db) * 1000000000000) // (da * db)
                     WHEN da IS NOT NULL THEN 1000000000000 // da
                     ELSE 1000000000000 // db
                   END AS rrf_scaled
            FROM j
        )
        SELECT query_id, doc_id, CAST(rrf_scaled AS BIGINT) AS rrf_scaled,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY query_id
                   ORDER BY rrf_scaled DESC, doc_id ASC) AS INTEGER) AS fused_rank
        FROM s
    """
    from tests.compare import assert_matches

    assert_matches(out, duck, oracle, name="rrf_fuse")


def test_pq_codes_bit_exact_vs_reference(spark, sf_dir):
    """encode_pq's argmin(‖c‖² − 2⟨x,c⟩) must reproduce a driver-side
    reference that uses the identical IEEE op sequence (sequential
    ascending-dimension dot fold — the Arrow kernel's contract),
    ties to the lower code."""
    from duckdb_retail_pipeline_spark.operators import pq as PQ

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    rows = emb.orderBy("vec_id").collect()
    dim = len(rows[0]["embedding"])
    books = PQ.train_pq(emb, dim=dim, m=4, k_codes=16, iters=1)
    got = {
        r["vec_id"]: list(r["codes"])
        for r in PQ.encode_pq(emb, books, dim=dim).collect()
    }

    def seq_dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += float(x) * float(y)
        return acc

    d = dim // 4
    for r in rows:
        v = [float(x) for x in r["embedding"]]
        want = []
        for s in range(4):
            sub = v[s * d : (s + 1) * d]
            scores = [
                seq_dot(c, c) - 2.0 * seq_dot(sub, c) for c in books[s]
            ]
            want.append(scores.index(min(scores)))
        assert got[r["vec_id"]] == want, r["vec_id"]


def test_pq_degenerate_codebooks(spark):
    """r13 probe wave (r12 verdict #5b): PQ on degenerate corpora.
    A corpus smaller than k_codes (= 2^bits) must fail loudly at
    train time, never emit a short codebook that silently corrupts
    every downstream argmin; an ALL-IDENTICAL corpus (every centroid
    a duplicate, every Lloyd pass collapsing all members onto code
    0) must stay deterministic end-to-end — codes all 0 (ties to the
    lower code), ADC scores all equal (ties to the lower id), exact
    IVF-PQ refinement returning cosine 1.0 — not crash on an empty
    cluster or a tied argmin."""
    import pytest

    from duckdb_retail_pipeline_spark.operators import pq as PQ

    # corpus smaller than k_codes: loud error, not a short codebook
    tiny = spark.createDataFrame(
        [(i, [float(i), 0.0, 0.0, 1.0]) for i in range(3)],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(ValueError, match="smaller than k_codes"):
        PQ.train_pq(tiny, dim=4, m=2, k_codes=16)

    # all-identical corpus: every seed identical, every Lloyd pass
    # assigns everything to code 0 and codes 1+ keep their (equal)
    # centroids
    same = spark.createDataFrame(
        [(i, [1.0, 2.0, 3.0, 4.0]) for i in range(12)],
        "vec_id long, embedding array<double>",
    )
    books = PQ.train_pq(same, dim=4, m=2, k_codes=4, iters=2)
    assert all(len(b) == 4 for b in books)
    assert all(c == books[0][0] for c in books[0])  # duplicate centroids
    codes = PQ.encode_pq(same, books, dim=4).collect()
    assert all(list(r["codes"]) == [0, 0] for r in codes)

    top = PQ.adc_topk(
        PQ.encode_pq(same, books, dim=4), books, [1.0, 2.0, 3.0, 4.0], k=5
    ).collect()
    # all ADC scores equal → deterministic lower-id ties
    assert [r["vec_id"] for r in top] == [0, 1, 2, 3, 4]
    assert len({r["adc_dot"] for r in top}) == 1

    got = PQ.ivf_pq_topk(
        same, [1.0, 2.0, 3.0, 4.0], k=3, n_cells=2, nprobe=1, m=2, k_codes=4
    ).collect()
    assert [r["vec_id"] for r in got] == [0, 1, 2]
    assert all(abs(r["cosine"] - 1.0) < 1e-12 for r in got)


def test_pq_adc_recall_and_compression(spark, sf_dir):
    """ADC over the compressed codes must (a) carry the documented
    recall against the exact inner-product top-k and (b) be fully
    deterministic run to run; the codes frame is m small ints per
    vector — the compression that makes the 100 TB scan cheap."""
    from duckdb_retail_pipeline_spark.operators import pq as PQ
    from duckdb_retail_pipeline_spark.functions import vectors as V

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    dim = len(emb.first()["embedding"])
    q = [float(x) for x in emb.orderBy("vec_id").first()["embedding"]]
    books = PQ.train_pq(emb, dim=dim, m=4, k_codes=16, iters=1)
    books2 = PQ.train_pq(emb, dim=dim, m=4, k_codes=16, iters=1)
    assert books == books2  # deterministic training

    codes = PQ.encode_pq(emb, books, dim=dim)
    ann = PQ.adc_topk(codes, books, q, k=10)
    got = [r["vec_id"] for r in ann.collect()]
    assert len(got) == 10

    qcol = F.array(*[F.lit(x) for x in q])
    exact = (
        emb.select("vec_id", V.dot("embedding", qcol).alias("d"))
        .orderBy(F.col("d").desc(), F.col("vec_id").asc())
        .limit(10)
    )
    exact_ids = {r["vec_id"] for r in exact.collect()}
    # the query IS corpus vector 0: its own quantization must
    # surface it (measured: rank 1). Broad top-k recall is NOT
    # asserted — the synthetic fixtures are near-random vectors,
    # PQ's pathological case (no cluster structure for the
    # codebooks to exploit); on real embedding manifolds the same
    # machinery carries the published recall and the exact-score
    # check below pins that the MACHINERY is right.
    assert got[0] == 0 and 0 in exact_ids

    # every returned adc_dot must equal the driver-recomputed
    # LUT-sum for that vector's codes (same literals, same order)
    d = dim // 4
    lut = [
        [
            sum(float(a) * float(b) for a, b in zip(q[s * d : (s + 1) * d], c))
            for c in books[s]
        ]
        for s in range(4)
    ]
    code_map = {r["vec_id"]: list(r["codes"]) for r in codes.collect()}
    for r in ann.collect():
        want = 0.0
        for s in range(4):
            want += lut[s][code_map[r["vec_id"]][s]]
        assert r["adc_dot"] == round(want, 4) or abs(r["adc_dot"] - want) < 1e-4

    # run-to-run determinism of the full path
    assert got == [r["vec_id"] for r in PQ.adc_topk(codes, books, q, k=10).collect()]


def test_ivf_pq_topk_self_found_and_contract_shape(spark, sf_dir):
    """Three-stage IVF-PQ: the self-query must surface at cosine 1.0
    rank 1, the result carries exactly k (id, cosine) rows with
    EXACT cosines (the refinement stage re-scores, so scores match
    brute force for every returned id), and the run is
    deterministic."""
    from duckdb_retail_pipeline_spark.operators import pq as PQ
    from duckdb_retail_pipeline_spark.operators.similarity import brute_force_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = [float(x) for x in emb.orderBy("vec_id").first()["embedding"]]
    out = PQ.ivf_pq_topk(emb, q, k=5, n_cells=4, nprobe=2)
    rows = out.collect()
    assert len(rows) == 5
    assert rows[0]["vec_id"] == 0 and rows[0]["cosine"] >= 0.9999

    exact = {
        r["vec_id"]: r["cosine"]
        for r in brute_force_topk(emb, q, k=500).collect()
    }
    for r in rows:
        assert r["cosine"] == exact[r["vec_id"]]  # refinement is exact

    again = PQ.ivf_pq_topk(emb, q, k=5, n_cells=4, nprobe=2).collect()
    assert [tuple(r) for r in again] == [tuple(r) for r in rows]


def test_phrase_search_hand_computed(spark):
    """Positional-intersection phrase search: overlapping and repeated
    occurrences count per START position; 3-word phrases chain two
    adjacency joins; docs without the full phrase never appear."""
    from duckdb_retail_pipeline_spark.operators import search as SR

    docs = spark.createDataFrame(
        [
            (1, "a b c a b"),   # "a b" twice, "a b c" once
            (2, "a a a"),       # "a a" twice (overlapping starts 1, 2)
            (3, "b a"),         # reversed — no "a b"
            (4, "a"),           # too short
        ],
        "doc_id long, text string",
    )
    idx = SR.positional_index(docs)
    out = {r["doc_id"]: r["n_occurrences"] for r in SR.phrase_search(idx, ["a", "b"]).collect()}
    assert out == {1: 2}
    out3 = {r["doc_id"]: r["n_occurrences"] for r in SR.phrase_search(idx, ["a", "b", "c"]).collect()}
    assert out3 == {1: 1}
    overlap = {r["doc_id"]: r["n_occurrences"] for r in SR.phrase_search(idx, ["a", "a"]).collect()}
    assert overlap == {2: 2}
    import pytest as _pytest

    with _pytest.raises(ValueError):
        SR.phrase_search(idx, [])


@pytest.mark.slow  # tier-2 (r13 verdict #1): see conftest
def test_lsh_index_upsert_supersedes_and_equals_bulk(spark):
    """Delta rows with an existing id supersede the old vector, new
    ids append, and the upserted index is row-identical to
    bulk-loading the union corpus with the same planes."""
    from duckdb_retail_pipeline_spark.operators import similarity as S

    base = spark.createDataFrame(
        [(i, [float(i), 1.0, 0.0, 0.5]) for i in range(8)],
        "vec_id long, embedding array<double>",
    )
    idx = S.lsh_index(base, bits=2)
    delta = spark.createDataFrame(
        [(3, [9.0, 9.0, 9.0, 9.0]), (100, [1.0, 0.0, 0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    up = S.lsh_index_upsert(idx, delta)
    rows = {r["vec_id"]: list(r["embedding"]) for r in up["bucketed"].collect()}
    assert rows[3] == [9.0, 9.0, 9.0, 9.0]  # delta superseded the old row
    assert 100 in rows and len(rows) == 9

    union = base.filter("vec_id != 3").unionByName(delta)
    bulk = union.select("vec_id", "embedding").withColumn(
        "__bucket", S._bucket_expr("embedding", idx["planes"])
    )
    assert up["bucketed"].exceptAll(bulk).count() == 0
    assert bulk.exceptAll(up["bucketed"]).count() == 0

    # a freshly ingested vector is immediately retrievable
    got = S.lsh_index_query(up, [9.0, 9.0, 9.0, 9.0], k=3)
    assert 3 in {r["vec_id"] for r in got.collect()}


def test_assign_cells_kernel_matches_literal_path(spark, sf_dir):
    """The large-n_cells kernel assignment must agree with the pinned
    literal-expression argmax cell-for-cell on real embeddings (the
    ‖v‖ factor is common per row and cannot flip an argmax), and both
    send zero/NULL vectors to cell 0."""
    from duckdb_retail_pipeline_spark.operators import similarity as S

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = [
        list(map(float, r["embedding"]))
        for r in emb.orderBy("vec_id").limit(8).collect()
    ]
    both = emb.select(
        "vec_id",
        S._nearest_cell_expr(F.col("embedding"), cents).alias("lit_cell"),
        S._nearest_cell_kernel(F.col("embedding"), cents).alias("ker_cell"),
    )
    assert both.filter(F.col("lit_cell") != F.col("ker_cell")).count() == 0

    degenerate = spark.createDataFrame(
        [(1, [0.0] * 64), (2, None)], "vec_id long, embedding array<double>"
    )
    rows = {
        r["vec_id"]: (r["lit_cell"], r["ker_cell"])
        for r in degenerate.select(
            "vec_id",
            S._nearest_cell_expr(F.col("embedding"), cents).alias("lit_cell"),
            S._nearest_cell_kernel(F.col("embedding"), cents).alias("ker_cell"),
        ).collect()
    }
    assert rows[1] == (0, 0) and rows[2] == (0, 0)


def test_ivf_auto_cells_scale_path(spark, sf_dir):
    """n_cells=None resolves ~sqrt(corpus) (> CELL_EXPR_MAX on the
    driver corpus → the kernel path), and the auto-sized index still
    returns a full, self-containing top-k."""
    from duckdb_retail_pipeline_spark.operators import similarity as S

    assert S.resolve_ivf_cells(0) == 8
    assert S.resolve_ivf_cells(500) == 22
    assert S.resolve_ivf_cells(10**9) == 4096

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    idx = S.build_ivf_index(emb, n_cells=None, persist=False)
    assert len(idx["cents"]) > S.CELL_EXPR_MAX or emb.count() < 289
    got = S.ivf_topk(emb, q, k=10, nprobe=3, index=idx).collect()
    assert len(got) == 10
    assert any(r["cosine"] >= 0.9999 for r in got)  # self-find


def test_rrf_fuse_matches_exact_fractions_property(spark):
    """Property: the integer-scaled RRF ranking equals the ranking by
    EXACT rationals 1/(k+ra) + 1/(k+rb) (python Fraction — no float
    anywhere), ties by doc id, under random partial-overlap lists."""
    from fractions import Fraction

    from hypothesis import given, settings, strategies as st

    from duckdb_retail_pipeline_spark.operators.similarity import rrf_fuse

    @settings(max_examples=10, deadline=None)
    @given(
        st.lists(st.integers(min_value=0, max_value=15), min_size=1, max_size=8, unique=True),
        st.lists(st.integers(min_value=0, max_value=15), min_size=1, max_size=8, unique=True),
    )
    def prop(docs_a, docs_b):
        a = [(0, d, i + 1) for i, d in enumerate(docs_a)]
        b = [(0, d, i + 1) for i, d in enumerate(docs_b)]
        fa = spark.createDataFrame(a, "query_id long, doc_id long, rnk long")
        fb = spark.createDataFrame(b, "query_id long, doc_id long, rnk long")
        got = [
            r["doc_id"]
            for r in rrf_fuse(fa, fb, k=60).orderBy("fused_rank").collect()
        ]
        ra = {d: i + 1 for i, d in enumerate(docs_a)}
        rb = {d: i + 1 for i, d in enumerate(docs_b)}
        exact = {
            d: (Fraction(1, 60 + ra[d]) if d in ra else 0)
            + (Fraction(1, 60 + rb[d]) if d in rb else 0)
            for d in set(docs_a) | set(docs_b)
        }
        want = sorted(exact, key=lambda d: (-exact[d], d))
        assert got == want, (got, want)

    prop()


def test_phrase_search_matches_python_reference_property(spark):
    """Property: phrase occurrence counts over random small-alphabet
    token sequences equal a pure-Python sliding-window count."""
    from hypothesis import given, settings, strategies as st

    from duckdb_retail_pipeline_spark.operators import search as SR

    tok = st.sampled_from(["a", "b", "c"])

    @settings(max_examples=10, deadline=None)
    @given(
        st.lists(st.lists(tok, min_size=0, max_size=12), min_size=1, max_size=5),
        st.lists(tok, min_size=1, max_size=3),
    )
    def prop(docs_tokens, phrase):
        docs = spark.createDataFrame(
            [(i, " ".join(toks)) for i, toks in enumerate(docs_tokens)],
            "doc_id long, text string",
        )
        got = {
            r["doc_id"]: r["n_occurrences"]
            for r in SR.phrase_search(SR.positional_index(docs), phrase).collect()
        }
        want = {}
        for i, toks in enumerate(docs_tokens):
            c = sum(
                1
                for s in range(len(toks) - len(phrase) + 1)
                if toks[s : s + len(phrase)] == phrase
            )
            if c:
                want[i] = c
        assert got == want, (got, want)

    prop()


def test_rotating_persist_serves_aggregate_plans_across_passes(spark, tmp_path):
    """Once an AGGREGATE-shaped occupant is cached, a fresh equal
    plan's inputFiles() returns [] (Spark substitutes the cached
    relation) — the staleness check must re-stat the occupant's own
    stored uris, not the fresh listing, or the slot churns
    (unpersist + re-persist + re-materialize every pass; the r8 x87
    count-table probe)."""
    from pyspark.sql import functions as F

    from duckdb_retail_pipeline_spark.memo import rotating_persist

    p = str(tmp_path / "t.parquet")
    spark.createDataFrame(
        [(i % 3, i) for i in range(30)], "k long, v long"
    ).write.mode("overwrite").parquet(p)
    slot: list = []

    def agg_plan():
        return (
            spark.read.parquet(p)
            .groupBy("k")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        )

    first = rotating_persist(agg_plan(), slot)
    first.count()  # materialize the cache — the substitution trigger
    assert rotating_persist(agg_plan(), slot) is first
    assert rotating_persist(agg_plan(), slot) is first


def _drain_graph_slots():
    """Release the pagerank operators' persisted occupants — a bare
    .clear() drops the handle while the frame stays pinned in the
    shared session's SQL cache (r9 review), the exact leak class
    rotating_persist exists to prevent."""
    from duckdb_retail_pipeline_spark.operators import graph as G

    for slot in (G._EDGE_SLOT, G._DEG_SLOT, G._NODE_SLOT):
        while slot:
            try:
                slot.pop()[0].unpersist()
            except Exception:
                pass


def test_pagerank_exact_small_graph(spark):
    """Hand-computed two-iteration PageRank on the symmetrized path
    a-b-c: integer floor-scaled arithmetic must reproduce the exact
    values (no float enters the ranking — the whole point of the
    x92 convention)."""
    from duckdb_retail_pipeline_spark.operators import graph as G

    _drain_graph_slots()
    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (3, 2)], "src long, dst long"
    )
    got = {
        r["node"]: (r["outdeg"], r["pagerank_scaled"])
        for r in G.pagerank(edges, iters=2).collect()
    }
    # r1: a=150000+425000, b=150000+850000*2, c=a
    # r2: a=150000+(1850000*85)//200, b=150000+2*((575000*85)//100), c=a
    assert got == {
        1: (1, 936250),
        2: (2, 1127500),
        3: (1, 936250),
    }
    _drain_graph_slots()


def test_pagerank_symmetric_clique_is_fixed_point(spark):
    """On a symmetric clique every node's rank is a fixed point of
    the damped update (mass in = mass out), so iterating must leave
    the initial scale value unchanged — a mass-conservation check
    over the integer arithmetic."""
    from duckdb_retail_pipeline_spark.operators import graph as G

    _drain_graph_slots()
    nodes = range(1, 5)
    edges = spark.createDataFrame(
        [(a, b) for a in nodes for b in nodes if a != b], "src long, dst long"
    )
    got = {r["node"]: r["pagerank_scaled"] for r in G.pagerank(edges, iters=3).collect()}
    # outdeg 3; contrib = (1e6*85)//300 = 283333; r' = 150000 + 3*283333
    # = 999999; then contrib = (999999*85)//300 = 283333 again -> stable
    assert set(got.values()) == {999999}
    _drain_graph_slots()


def test_copurchase_edges_mega_basket_bounded(spark):
    """r9 verdict #2: the per-basket quadratic self-join is capped —
    one pathological order with 500 distinct parts must contribute at
    most max_basket·(max_basket−1) edges (bounded BEFORE the join,
    not filtered after), the kept subset must be deterministic across
    runs, and baskets under the cap must be untouched."""
    from duckdb_retail_pipeline_spark.operators import graph as G

    rows = [(1, p) for p in range(500)] + [(2, 900), (2, 901), (2, 902)]
    li = spark.createDataFrame(
        [(ok, pk, 1.0) for ok, pk in rows],
        "l_orderkey long, l_partkey long, l_quantity double",
    ).repartition(4)

    capped = G.copurchase_edges(li, max_basket=16).collect()
    mega = [(r["src"], r["dst"]) for r in capped if r["src"] < 900]
    small = {(r["src"], r["dst"]) for r in capped if r["src"] >= 900}
    assert len(mega) == 16 * 15  # exactly the capped clique
    assert small == {
        (a, b) for a in (900, 901, 902) for b in (900, 901, 902) if a != b
    }
    # deterministic: a re-run under a different partitioning keeps
    # the SAME hash-selected subset
    again = {
        (r["src"], r["dst"])
        for r in G.copurchase_edges(li.repartition(9), max_basket=16).collect()
        if r["src"] < 900
    }
    assert set(mega) == again

    # default cap (64) sits above real basket sizes: on a ≤7-part
    # corpus shape the capped and uncapped graphs are identical
    li_small = li.filter("l_orderkey = 2")
    got_default = {
        (r["src"], r["dst"]) for r in G.copurchase_edges(li_small).collect()
    }
    got_uncapped = {
        (r["src"], r["dst"])
        for r in G.copurchase_edges(li_small, max_basket=None).collect()
    }
    assert got_default == got_uncapped == small


def test_driver_corpus_baskets_stay_under_half_the_x92_cap(spark, sf_dir):
    """x92's Spark side runs the capped edge build while its DuckDB
    oracle enumerates ALL pairs — they agree because the driver
    corpora max out at 17 distinct parts per order (measured at
    sf0.01/sf0.1/100×), far under the cap of 64. If regenerated
    testdata ever grows a basket past the cap, the oracle would
    hash-mismatch and the xxhash64-sampled diff would masquerade as
    a PageRank arithmetic bug (r10 review) — so this guard trips
    FIRST, with the real explanation, at half the cap."""
    from pyspark.sql import functions as F

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    biggest = (
        li.groupBy("l_orderkey")
        .agg(F.countDistinct("l_partkey").alias("c"))
        .agg(F.max("c").alias("m"))
        .first()["m"]
    )
    assert biggest <= 32, (
        f"max basket {biggest} is within 2x of copurchase_edges' "
        "max_basket=64 — raise the cap (and this guard) or x92's "
        "Spark result will silently diverge from its uncapped oracle"
    )


def _ref_pagerank_redistribute(edges, iters, scale=10**6):
    """Pure-Python textbook-convention reference: node universe
    src ∪ dst, dangling mass redistributed uniformly, same integer
    floor arithmetic."""
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    outdeg: dict = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    n = len(nodes)
    base = (scale * 15) // 100
    r = {v: scale for v in nodes}
    for _ in range(iters):
        contrib: dict = {}
        for s, d in edges:
            contrib[d] = contrib.get(d, 0) + (r[s] * 85) // (100 * outdeg[s])
        dmass = sum(r[v] for v in nodes if v not in outdeg)
        share = (dmass * 85) // (100 * n)
        r = {v: base + contrib.get(v, 0) + share for v in nodes}
    return r, outdeg


@pytest.mark.slow  # tier-2 (r13 verdict #1): see conftest
def test_pagerank_redistribute_matches_python_reference_property(spark):
    """r9 verdict #4: the textbook dangling-mass convention on
    ASYMMETRIC graphs — every src∪dst node ranked, dangling nodes
    (outdeg 0) present with the uniform share — vs a pure-Python
    reference, edge sets drawn directed (no symmetrization)."""
    from hypothesis import given, settings, strategies as st

    from duckdb_retail_pipeline_spark.operators import graph as G

    @settings(max_examples=8, deadline=None)
    @given(
        st.sets(
            st.tuples(
                st.integers(min_value=1, max_value=8),
                st.integers(min_value=1, max_value=8),
            ).filter(lambda e: e[0] != e[1]),
            min_size=1,
            max_size=14,
        ),
        st.integers(min_value=1, max_value=3),
    )
    def prop(raw_edges, iters):
        edges = sorted(raw_edges)
        _drain_graph_slots()
        sdf = spark.createDataFrame(edges, "src long, dst long")
        got = {
            r["node"]: (r["outdeg"], r["pagerank_scaled"])
            for r in G.pagerank(
                sdf, iters=iters, redistribute_dangling=True
            ).collect()
        }
        want_r, outdeg = _ref_pagerank_redistribute(edges, iters)
        want = {v: (outdeg.get(v, 0), want_r[v]) for v in want_r}
        assert got == want, (got, want)
        _drain_graph_slots()

    prop()


def test_pagerank_until_stable_converges_and_matches_reference(spark):
    """The iterate-to-epsilon variant: (a) a fully symmetric cycle is
    an exact integer fixed point — epsilon=0 converges in one
    iteration; (b) on an asymmetric graph with redistribution, the
    ranks, the iteration count, and the converged flag all match a
    pure-Python loop running the identical stopping rule."""
    from duckdb_retail_pipeline_spark.operators import graph as G

    _drain_graph_slots()
    # (a) symmetric 4-cycle + chords: every node outdeg 2, all ranks
    # stay exactly at scale — delta 0 after the first step
    sym = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (3, 2), (3, 4), (4, 3), (4, 1), (1, 4)],
        "src long, dst long",
    )
    df, iters_run, converged = G.pagerank_until_stable(
        sym, max_iters=10, epsilon=0
    )
    got = {r["node"]: r["pagerank_scaled"] for r in df.collect()}
    assert converged and iters_run == 1
    assert set(got.values()) == {10**6}
    _drain_graph_slots()

    # (b) asymmetric with a dangling node, epsilon above the floor-
    # rounding limit cycle
    edges = [(1, 10), (1, 11), (2, 10), (3, 12), (3, 10), (4, 13)]
    epsilon, max_iters = 10, 40
    df, iters_run, converged = G.pagerank_until_stable(
        spark.createDataFrame(edges, "src long, dst long"),
        max_iters=max_iters,
        epsilon=epsilon,
        redistribute_dangling=True,
    )
    got = {r["node"]: r["pagerank_scaled"] for r in df.collect()}

    want_prev, _ = _ref_pagerank_redistribute(edges, 0)
    want_iters, want_converged = 0, False
    for i in range(1, max_iters + 1):
        want_r, _ = _ref_pagerank_redistribute(edges, i)
        delta = sum(abs(want_r[v] - want_prev[v]) for v in want_r)
        want_prev, want_iters = want_r, i
        if delta <= epsilon:
            want_converged = True
            break
    assert (iters_run, converged) == (want_iters, want_converged)
    assert got == want_prev, (got, want_prev)
    _drain_graph_slots()


def test_mg_candidates_superset_and_frequent_tokens_exact(spark):
    """The Misra-Gries candidate union must contain every token with
    global frequency > N/(capacity+1) regardless of partitioning,
    and frequent_tokens must equal the plain full-groupBy top-k with
    heavy_bound_holds TRUE on a skewed corpus."""
    from pyspark.sql import functions as F

    from duckdb_retail_pipeline_spark.operators import sketch as SK

    # skewed stream: token_i appears (50 - i) times, i in 0..39,
    # plus a long near-unique tail
    rows = [(f"t{i:02d}",) for i in range(40) for _ in range(50 - i)]
    rows += [(f"tail{j}",) for j in range(800)]
    toks = spark.createDataFrame(rows, "token string").repartition(7)

    n_total = len(rows)
    exact = {}
    for t, in ((r["token"],) for r in toks.collect()):
        exact[t] = exact.get(t, 0) + 1

    # superset guarantee under a STRESS capacity (forces decrements)
    capacity = 30
    cands = {
        r["token"] for r in SK.mg_candidates(toks, capacity=capacity).collect()
    }
    heavy = {t for t, c in exact.items() if c > n_total / (capacity + 1)}
    assert heavy <= cands

    # exactness + certified bound under an adequate capacity: the
    # 10th count (41) must clear N/(capacity+1) = 2020/101 = 20
    got = SK.frequent_tokens(toks, k=10, capacity=100).collect()
    want = sorted(exact.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert [(r["token"], r["n_occurrences"]) for r in got] == want
    assert all(r["heavy_bound_holds"] for r in got)


def test_dataset_memo_across_sessions_same_context(spark, tmp_path):
    """r8 verdict #6 probe: two sessions over ONE SparkContext share
    applicationId, so dataset_memo serves session A's persisted frame
    to session B. That is SAFE — cached frames are context-scoped
    (B can act on and even join the served frame), and a context
    restart mints a new applicationId so nothing stale ever serves —
    pinned here so a future key change cannot silently regress it."""
    from duckdb_retail_pipeline_spark.memo import dataset_memo

    p = str(tmp_path / "t.parquet")
    spark.createDataFrame([(i,) for i in range(9)], "id long").write.mode(
        "overwrite"
    ).parquet(p)
    d = str(tmp_path)

    a = dataset_memo(
        spark, d, "xsession_probe", lambda: spark.read.parquet(p).persist()
    )
    assert a.count() == 9
    s2 = spark.newSession()
    b = dataset_memo(
        s2, d, "xsession_probe", lambda: s2.read.parquet(p).persist()
    )
    assert b is a  # same appId + dataset + tag -> one shared build
    own = s2.createDataFrame([(3,), (4,)], "id long")
    assert b.join(own, "id").count() == 2  # usable inside session B
    a.unpersist()


def test_dataset_memo_concurrent_threads_build_once(spark, tmp_path):
    """r9 verdict #5a: SparkContext is thread-safe and a driver
    legitimately runs queries from a thread pool, but dataset_memo
    was an unlocked check-then-build — threads racing one key ALL ran
    build() and every losing build's persisted frame stayed pinned in
    the SQL cache forever, served to nobody. The per-key lock must
    collapse same-key racers onto ONE build that everyone shares."""
    import threading

    from duckdb_retail_pipeline_spark.memo import dataset_memo

    p = str(tmp_path / "t.parquet")
    spark.createDataFrame([(i,) for i in range(4)], "id long").write.mode(
        "overwrite"
    ).parquet(p)
    d = str(tmp_path)

    builds, results, errors = [], [], []
    gate = threading.Barrier(6)

    def build():
        builds.append(1)
        import time

        time.sleep(0.2)  # widen the race window
        return spark.read.parquet(p).persist()

    def worker():
        try:
            gate.wait(timeout=10)
            results.append(dataset_memo(spark, d, "race_probe", build))
        except Exception as exc:  # noqa: BLE001
            errors.append(exc)

    threads = [threading.Thread(target=worker) for _ in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=30)
    assert not errors, errors
    assert len(builds) == 1, f"{len(builds)} builds for one key"
    assert all(r is results[0] for r in results)
    assert results[0].count() == 4
    results[0].unpersist()


def test_rotating_persist_concurrent_threads_single_occupant(spark, tmp_path):
    """r9 verdict #5a continuation: concurrent rotating_persist calls
    on one slot used to interleave the slot[0] check with the LIFO
    pop — two appends leave TWO entries and later rotations unpersist
    the wrong one (a pinned-forever leak). Under the rotate lock the
    slot must end with exactly one occupant and every caller must get
    a usable frame."""
    import threading

    from duckdb_retail_pipeline_spark.memo import rotating_persist

    p = str(tmp_path / "t.parquet")
    spark.createDataFrame([(i,) for i in range(5)], "id long").write.mode(
        "overwrite"
    ).parquet(p)
    slot: list = []
    counts, errors = [], []
    gate = threading.Barrier(6)

    def worker():
        try:
            gate.wait(timeout=10)
            occ = rotating_persist(spark.read.parquet(p), slot)
            counts.append(occ.count())
        except Exception as exc:  # noqa: BLE001
            errors.append(exc)

    threads = [threading.Thread(target=worker) for _ in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=30)
    assert not errors, errors
    assert counts == [5] * 6
    assert len(slot) == 1, f"slot holds {len(slot)} occupants"
    slot.pop()[0].unpersist()


def test_rotating_persist_alternating_sessions_churns_but_stays_correct(
    spark, tmp_path
):
    """Continuation of the r9 probe discipline: two sessions over one
    context ALTERNATING through the same rotating_persist slot. The
    session-identity check makes each switch rotate (the other
    session's occupant is unpersisted and replaced) — a performance
    footgun in multi-session deployments (documented; the bench and
    driver are single-session) but NEVER a correctness one: the
    superseded frame recomputes on access and both sessions always
    see current data."""
    from duckdb_retail_pipeline_spark.memo import rotating_persist

    p = str(tmp_path / "t.parquet")
    spark.createDataFrame([(i,) for i in range(6)], "id long").write.mode(
        "overwrite"
    ).parquet(p)
    s2 = spark.newSession()
    slot: list = []

    a = rotating_persist(spark.read.parquet(p), slot)
    assert a.count() == 6
    b = rotating_persist(s2.read.parquet(p), slot)  # rotates: B's session
    assert b is not a
    assert b.count() == 6
    # A's occupant was unpersisted by the rotation but stays CORRECT
    assert a.count() == 6
    # and switching back rotates again — same values
    a2 = rotating_persist(spark.read.parquet(p), slot)
    assert a2.count() == 6
    slot.pop()[0].unpersist()


def test_pagerank_matches_python_reference_property(spark):
    """Property: the Spark exact-integer PageRank equals a pure-Python
    reference (dict arithmetic, same floor convention) on random
    symmetrized edge sets — iteration count drawn too, so the unroll
    depth itself is exercised."""
    from hypothesis import given, settings, strategies as st

    from duckdb_retail_pipeline_spark.operators import graph as G

    @settings(max_examples=8, deadline=None)
    @given(
        st.sets(
            st.tuples(
                st.integers(min_value=1, max_value=8),
                st.integers(min_value=1, max_value=8),
            ).filter(lambda e: e[0] != e[1]),
            min_size=1,
            max_size=16,
        ),
        st.integers(min_value=1, max_value=3),
    )
    def prop(raw_edges, iters):
        edges = sorted({e for ab in raw_edges for e in (ab, ab[::-1])})
        _drain_graph_slots()
        sdf = spark.createDataFrame(edges, "src long, dst long")
        got = {
            r["node"]: r["pagerank_scaled"]
            for r in G.pagerank(sdf, iters=iters).collect()
        }
        # pure-Python reference, same floor-scaled convention
        outdeg: dict = {}
        for s, _ in edges:
            outdeg[s] = outdeg.get(s, 0) + 1
        r = {n: 10**6 for n in outdeg}
        for _ in range(iters):
            nxt: dict = {}
            for s, d in edges:
                nxt[d] = nxt.get(d, 0) + (r[s] * 85) // (100 * outdeg[s])
            r = {n: 150000 + v for n, v in nxt.items()}
        assert got == r, (got, r)
        _drain_graph_slots()

    prop()


def test_frequent_tokens_matches_counter_reference_property(spark):
    """Property: when the heavy bound holds, frequent_tokens equals
    the collections.Counter top-k (count desc, token asc) on random
    skewed streams under random partitioning."""
    from collections import Counter

    from hypothesis import given, settings, strategies as st

    from duckdb_retail_pipeline_spark.operators import sketch as SK

    @settings(max_examples=6, deadline=None)
    @given(
        st.lists(
            st.sampled_from([f"w{i}" for i in range(12)]),
            min_size=30,
            max_size=200,
        ),
        st.integers(min_value=2, max_value=6),
    )
    def prop(stream, nparts):
        toks = spark.createDataFrame(
            [(t,) for t in stream], "token string"
        ).repartition(nparts)
        got = SK.frequent_tokens(toks, k=5, capacity=50).collect()
        # capacity 50 > 12 distinct tokens: no decrements, bound holds
        # whenever kth*51 > N, which the 12-token vocab guarantees
        # for streams of <= 200 tokens only if counts are high enough;
        # assert the certified rows against the exact reference
        want = sorted(Counter(stream).items(), key=lambda kv: (-kv[1], kv[0]))[:5]
        assert [(r["token"], r["n_occurrences"]) for r in got] == want
        assert all(isinstance(r["heavy_bound_holds"], bool) for r in got)

    prop()


def test_mg_decrement_subtracts_counterexample():
    """r9 review finding: the batched MG decrement must SUBTRACT the
    (capacity+1)-th largest count, not merely filter by it. Without
    the subtraction, dominant counters never deplete and a heavy
    token arriving across batches is re-dropped with unbounded loss —
    the reviewer's counterexample: capacity=3, batches
    [A*52,B*52,C*52], [t*51], [t*51], [A*48]; true counts t=102,
    A=100, N=306 and 100*(3+1)=400 > 306, so heavy_bound_holds would
    have CERTIFIED the wrong top-1 (A) as provably exact while the
    true top-1 is t. Correct MG keeps t in the candidates."""
    import pandas as pd

    from duckdb_retail_pipeline_spark.operators.sketch import _mg_summarize

    batches = [
        pd.DataFrame({"token": ["A"] * 52 + ["B"] * 52 + ["C"] * 52}),
        pd.DataFrame({"token": ["t"] * 51}),
        pd.DataFrame({"token": ["t"] * 51}),
        pd.DataFrame({"token": ["A"] * 48}),
    ]
    out = next(_mg_summarize(iter(batches), "token", capacity=3))
    cands = set(out["token"])
    # every token with count > N/(capacity+1) = 76.5 must survive
    assert "t" in cands, cands
    assert "A" in cands, cands


def test_mg_candidates_and_frequent_tokens_custom_column(spark):
    """r9 review finding: the col parameter must thread through to
    the candidate frame's schema — a non-default column name used to
    crash the recount join with AnalysisException."""
    from duckdb_retail_pipeline_spark.operators import sketch as SK

    rows = [(w,) for w in ["x"] * 9 + ["y"] * 5 + ["z"] * 2]
    toks = spark.createDataFrame(rows, "word string").repartition(3)
    got = SK.frequent_tokens(toks, k=2, capacity=10, col="word").collect()
    assert [(r["word"], r["n_occurrences"]) for r in got] == [("x", 9), ("y", 5)]


def test_frequent_tokens_short_result_never_certifies(spark):
    """r9 ADVICE: with fewer than k candidate tokens the kth aggregate
    is the min over the AVAILABLE rows, so the old certificate could
    read TRUE while positions |candidates|+1..k were silently absent.
    The gate must require a full k rows — a short result never reads
    certified-exact."""
    from duckdb_retail_pipeline_spark.operators import sketch as SK

    rows = [(w,) for w in ["a"] * 9 + ["b"] * 6 + ["c"] * 3]
    toks = spark.createDataFrame(rows, "token string").repartition(2)
    got = SK.frequent_tokens(toks, k=5, capacity=100).collect()
    assert [(r["token"], r["n_occurrences"]) for r in got] == [
        ("a", 9), ("b", 6), ("c", 3),
    ]
    assert all(r["heavy_bound_holds"] is False for r in got)


def test_frequent_tokens_exact_escalates_to_certified_capacity(spark):
    """frequent_tokens_exact retries with doubled capacity until the
    certificate holds: a flat 30-token corpus (kth=10, N=300) fails
    the bound at capacity 16 (10·17 ≤ 300) and certifies at 32
    (10·33 > 300) — the doubled attempt must return the exact top-k
    with the certificate TRUE."""
    from duckdb_retail_pipeline_spark.operators import sketch as SK

    rows = [(f"w{i:02d}",) for i in range(30) for _ in range(10)]
    toks = spark.createDataFrame(rows, "token string").repartition(4)
    got = SK.frequent_tokens_exact(toks, k=5, capacity=16).collect()
    assert [(r["token"], r["n_occurrences"]) for r in got] == [
        (f"w{i:02d}", 10) for i in range(5)
    ]
    assert all(r["heavy_bound_holds"] for r in got)


def test_frequent_tokens_exact_falls_back_to_plain_groupby(spark):
    """r9 verdict #3 done-condition: on a corpus where no bounded
    number of doublings can certify (kth·(cap+1) ≤ N at every retry),
    the operator must still return the Counter-exact top-k — via the
    full-groupBy fallback — instead of a possibly-inexact result plus
    a FALSE flag."""
    from collections import Counter

    from duckdb_retail_pipeline_spark.operators import sketch as SK

    # 60 tokens × 10 occurrences: N=600, kth=10 — capacities 2/4/8
    # all fail (10·9 ≤ 600), so max_doublings=2 exhausts and falls back
    stream = [f"w{i:02d}" for i in range(60) for _ in range(10)]
    toks = spark.createDataFrame(
        [(t,) for t in stream], "token string"
    ).repartition(5)
    got = SK.frequent_tokens_exact(toks, k=7, capacity=2).collect()
    want = sorted(Counter(stream).items(), key=lambda kv: (-kv[1], kv[0]))[:7]
    assert [(r["token"], r["n_occurrences"]) for r in got] == want
    assert all(r["heavy_bound_holds"] for r in got)  # fallback IS exact


def test_mg_decrement_at_capacity_plus_one_boundary():
    """Adversarial Arrow batch sizing (r9 verdict #5c): a batch whose
    distinct-token count is EXACTLY capacity+1 fires exactly one
    decrement with delta = the smallest count; a batch at exactly
    capacity fires none. Both must preserve the n_p/(capacity+1)
    undercount bound."""
    import pandas as pd

    from duckdb_retail_pipeline_spark.operators.sketch import _mg_summarize

    # capacity+1 == 4 distinct: counts [5,4,3,1]; delta = 1 → survivors
    # A=4, B=3, C=2 (all tokens with count > N/(m+1) = 13/4 survive)
    batch = pd.DataFrame(
        {"token": ["A"] * 5 + ["B"] * 4 + ["C"] * 3 + ["D"]}
    )
    out = next(_mg_summarize(iter([batch]), "token", capacity=3))
    assert set(out["token"]) == {"A", "B", "C"}

    # exactly capacity distinct: no decrement, everything survives
    batch2 = pd.DataFrame({"token": ["A"] * 5 + ["B"] * 4 + ["C"] * 3})
    out2 = next(_mg_summarize(iter([batch2]), "token", capacity=3))
    assert set(out2["token"]) == {"A", "B", "C"}


def test_seasonal_decompose_gap_semantics_and_hand_values(spark):
    """operators/timeseries.py (pre-built r11 registration candidate,
    the x87 precedent): RANGE frames make a missing period a missing
    VALUE — the trend must be NULL wherever any of the 13 window
    periods is absent, and exact (2·Σ_inner + lo + hi) everywhere
    else. Hand-computed on a 26-month series with one gap."""
    from duckdb_retail_pipeline_spark.operators import timeseries as TS

    # months 0..25 with month 17 missing; cents = 100*(t+1)
    rows = [("a", m, 100 * (m + 1)) for m in range(26) if m != 17]
    series = spark.createDataFrame(rows, "key string, t long, cents long")
    out = {
        r["t"]: (r["trend_x2p"], r["detr_x2p"])
        for r in TS.decompose_additive(series).collect()
    }
    # full window at t=6: inner = sum(cents[1..11]), lo = cents[0],
    # hi = cents[12] — all linear, so trend_x24 = 24 * cents[6]
    assert out[6] == (24 * 700, 0)
    # every t whose ±6 window touches the t=17 gap gets NULL trend
    for tt in range(11, 24):
        if tt == 17:
            continue
        assert out[tt][0] is None, tt
    # windows clear of both the edges and the gap are exact again
    assert out[7] == (24 * 800, 0)
    # edges (incomplete window) are NULL, statsmodels-style
    assert out[0][0] is None and out[25][0] is None


def test_seasonal_decompose_matches_duckdb_differential(spark, sf_dir, duck):
    """Cross-engine differential for the pre-built seasonal
    decomposition (this SQL is the future x96 oracle): monthly
    per-nation order revenue → centered-MA trend → per-month-of-year
    seasonal (sum, count) integers + one-division means. Integer
    columns must match bit-exactly; seasonal_avg is a single IEEE
    division of matching integers, so it matches exactly too."""
    from pyspark.sql import functions as F

    from duckdb_retail_pipeline_spark.operators import timeseries as TS
    from duckdb_retail_pipeline_spark.queries.base import tbl

    o = tbl(spark, sf_dir, "orders")
    c = tbl(spark, sf_dir, "customer")
    series = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .select(
            F.col("c_nationkey").cast("bigint").alias("key"),
            (
                F.year(F.to_date("o_orderdate")) * 12
                + F.month(F.to_date("o_orderdate"))
                - 1
            ).cast("bigint").alias("t"),
            F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("cents"),
        )
        .groupBy("key", "t")
        .agg(F.sum("cents").cast("bigint").alias("cents"))
    )
    got = sorted(
        (
            (r["key"], r["pos"], r["seasonal_sum_x2p"], r["n_obs"],
             round(r["seasonal_avg"], 9))
            for r in TS.seasonal_means(TS.decompose_additive(series)).collect()
        )
    )
    want = sorted(
        (int(k), int(p), int(s), int(n), round(a, 9))
        for k, p, s, n, a in duck.execute("""
        WITH series AS (
            SELECT CAST(c.c_nationkey AS BIGINT) AS key,
                   CAST(EXTRACT(YEAR FROM CAST(o.o_orderdate AS DATE)) * 12
                        + EXTRACT(MONTH FROM CAST(o.o_orderdate AS DATE)) - 1
                        AS BIGINT) AS t,
                   CAST(SUM(CAST(ROUND(o.o_totalprice * 100, 0) AS BIGINT))
                        AS BIGINT) AS cents
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY 1, 2
        ), dec AS (
            SELECT key, t, cents,
                   CASE WHEN COUNT(cents) OVER w13 = 13 THEN
                       CAST(2 * SUM(cents) OVER w11
                            + SUM(cents) OVER wlo + SUM(cents) OVER whi
                            AS BIGINT)
                   END AS trend_x2p
            FROM series
            WINDOW w11 AS (PARTITION BY key ORDER BY t
                           RANGE BETWEEN 5 PRECEDING AND 5 FOLLOWING),
                   wlo AS (PARTITION BY key ORDER BY t
                           RANGE BETWEEN 6 PRECEDING AND 6 PRECEDING),
                   whi AS (PARTITION BY key ORDER BY t
                           RANGE BETWEEN 6 FOLLOWING AND 6 FOLLOWING),
                   w13 AS (PARTITION BY key ORDER BY t
                           RANGE BETWEEN 6 PRECEDING AND 6 FOLLOWING)
        )
        SELECT key, ((t % 12) + 12) % 12 AS pos,
               CAST(SUM(24 * cents - trend_x2p) AS BIGINT) AS seasonal_sum_x2p,
               CAST(COUNT(*) AS BIGINT) AS n_obs,
               CAST(SUM(24 * cents - trend_x2p) AS DOUBLE)
                   / (COUNT(*) * 24.0) AS seasonal_avg
        FROM dec WHERE trend_x2p IS NOT NULL
        GROUP BY 1, 2
        """).fetchall()
    )
    assert got == want


def test_seasonal_decompose_duplicate_rows_and_negative_t(spark):
    """r10 review: (a) a duplicated (key, t) row must NULL the trend
    — the row-count guard alone passed 13 rows spanning only 12
    distinct periods and emitted an exact-looking wrong integer;
    (b) seasonal positions use pmod, so a negative time index
    (months relative to a mid-corpus reference) groups with its
    positive calendar twin — plain % follows the dividend sign in
    both engines, so only a direct test catches the split; (c) the
    period travels in column metadata, so seasonal_means cannot be
    run at a mismatched period."""
    from duckdb_retail_pipeline_spark.operators import timeseries as TS

    # (a) months 0..12 complete, but t=5 duplicated: 14 rows, 13
    # distinct periods at the center — the ±6 window at t=6 has 14
    # rows / 13 periods -> NULL, never a double-counted trend
    rows = [("a", m, 100) for m in range(13)] + [("a", 5, 100)]
    series = spark.createDataFrame(rows, "key string, t long, cents long")
    out = TS.decompose_additive(series).collect()
    assert all(r["trend_x2p"] is None for r in out)

    # (b) flat series over t in [-12, 13): trend exists away from
    # edges; every pos must be in [0, 12) with December twins merged
    rows2 = [("a", m, 100) for m in range(-12, 13)]
    series2 = spark.createDataFrame(rows2, "key string, t long, cents long")
    dec2 = TS.decompose_additive(series2)
    sm = TS.seasonal_means(dec2).collect()
    assert sm and all(0 <= r["pos"] < 12 for r in sm)
    # flat series: detrended is 0 everywhere the trend exists
    assert all(r["seasonal_sum_x2p"] == 0 for r in sm)
    # t=-6 and t=6 are the same position (pmod), counted together
    by_pos = {r["pos"]: r["n_obs"] for r in sm}
    assert by_pos[6] == 2

    # (c) the period rides in the schema metadata
    field = {f.name: f for f in dec2.schema.fields}["detr_x2p"]
    assert field.metadata["period"] == 12


def test_dataset_memo_failed_build_releases_lock_and_retries(spark, tmp_path):
    """A build() that raises must leave no memo entry and a usable
    per-key lock — the next caller retries the build instead of
    deadlocking or being served a half-registered value."""
    import pytest

    from duckdb_retail_pipeline_spark.memo import dataset_memo

    p = str(tmp_path / "t.parquet")
    spark.createDataFrame([(1,)], "id long").write.mode("overwrite").parquet(p)
    d = str(tmp_path)

    def bad_build():
        raise RuntimeError("boom")

    with pytest.raises(RuntimeError, match="boom"):
        dataset_memo(spark, d, "fail_probe", bad_build)
    ok = dataset_memo(
        spark, d, "fail_probe", lambda: spark.read.parquet(p).persist()
    )
    assert ok.count() == 1
    ok.unpersist()


def test_semantic_dedup_keep_rule_hand_crafted(spark):
    """SemDeDup pre-built candidate (operators/dedup.py): the
    dominated-neighbor keep rule on an engineered corpus — one
    near-dup pair at cent_cos 1.0 (id tie-break drops the higher id)
    and one orthogonal pair at cent_cos 0.0 (same), singleton cell
    population semantics via n_cells=1."""
    from duckdb_retail_pipeline_spark.operators import dedup as D

    rows = [
        (0, [1.0, 0.0]),
        (1, [1.0, 1e-7]),   # near-dup of 0 -> dropped (higher id)
        (2, [0.0, 1.0]),    # orthogonal to 0/1 -> kept
        (3, [1e-7, 1.0]),   # near-dup of 2 -> dropped
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {
        r["vec_id"]: r["keep"]
        for r in D.semantic_dedup(
            emb, threshold=0.97, n_cells=1, kmeans_iters=0
        ).collect()
    }
    assert out == {0: True, 1: False, 2: True, 3: False}


def test_semantic_dedup_matches_duckdb_differential(spark, sf_dir, duck):
    """Cross-engine differential for SemDeDup (this SQL is the future
    registration oracle): kmeans_iters=0 pins the centroids to the
    first n_cells vectors by id, so the oracle reproduces the
    assignment argmax, the dround(4) centroid-cosine order, and the
    dominated anti-join exactly. threshold=0.3 because the synthetic
    embeddings are near-orthogonal (no mass above cosine ~0.5) — the
    drop path must actually fire (208 of 500 dropped at sf0.001)."""
    from duckdb_retail_pipeline_spark.operators import dedup as D
    from duckdb_retail_pipeline_spark.queries.extensions import (
        SQL_COSINE_PARTS,
        _sql_norm,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n_cells, th = 4, 0.3
    cents = [
        [float(x) for x in r["embedding"]]
        for r in emb.orderBy("vec_id").limit(n_cells).collect()
    ]

    got = sorted(
        (r["vec_id"], r["cell"], round(r["cent_cos"], 9), r["keep"])
        for r in D.semantic_dedup(
            emb, threshold=th, n_cells=n_cells, kmeans_iters=0
        ).collect()
    )
    assert any(not k for _, _, _, k in got)  # the drop path fired

    def lit(vec):
        return "[" + ", ".join(repr(x) for x in vec) + "]"

    def cos(col, cvec):
        return (
            f"({SQL_COSINE_PARTS.format(a=col, b=lit(cvec))}"
            f" / NULLIF({_sql_norm(col)} * {_sql_norm(lit(cvec))}, 0.0))"
        )

    sims = "[" + ", ".join(cos("embedding", c) for c in cents) + "]"
    sql = f"""
        WITH base AS (
            SELECT vec_id, embedding, {sims} AS sims,
                   {_sql_norm('embedding')} AS nrm
            FROM embeddings
        ), scored AS (
            SELECT vec_id, embedding, nrm,
                   CAST(COALESCE(list_position(sims,
                        list_aggregate(sims, 'max')) - 1, 0) AS BIGINT)
                       AS cell,
                   sims
            FROM base
        ), sc AS (
            SELECT vec_id, embedding, nrm, cell,
                   CAST(CAST(sims[cell + 1] AS DECIMAL(28,4)) AS DOUBLE)
                       AS cent_cos
            FROM scored
        ), dominated AS (
            SELECT DISTINCT a.vec_id
            FROM sc a JOIN sc b
              ON a.cell = b.cell AND a.vec_id <> b.vec_id
             AND (b.cent_cos < a.cent_cos
                  OR (b.cent_cos = a.cent_cos AND b.vec_id < a.vec_id))
            WHERE CAST(CAST(
                    {SQL_COSINE_PARTS.format(a='a.embedding', b='b.embedding')}
                    / NULLIF(a.nrm * b.nrm, 0.0)
                  AS DECIMAL(28,4)) AS DOUBLE) >= {th}
        )
        SELECT s.vec_id, s.cell, s.cent_cos, d.vec_id IS NULL AS keep
        FROM sc s LEFT JOIN dominated d ON s.vec_id = d.vec_id
    """
    want = sorted(
        (int(v), int(c), round(cc, 9), bool(k))
        for v, c, cc, k in duck.execute(sql).fetchall()
    )
    assert got == want


def test_pagerank_fixed_point_contract_matches_duckdb_differential(
    spark, sf_dir, duck
):
    """Cross-engine differential for the until-stable PageRank
    contract frame (this SQL is the future registration oracle;
    ROADMAP r11 queue #4): the customer→part bipartite purchase graph
    (x94's edge definition — every part dangling, ids offset out of
    the customer key space) converges in 9 iterations at
    epsilon_per_node=200 at both sf0.001 and sf0.01 — a genuinely
    data-dependent depth no fixed oracle string can unroll. The
    oracle re-derives the node universe + outdeg exactly and expects
    both booleans TRUE — converged (the operator's own stop flag) and
    fixed_point_holds (an independent in-plan one-more-step recheck
    of the fixed-point PROPERTY, which a fixed SQL string CAN gate
    even though the depth is data-dependent)."""
    from pyspark.sql import functions as F

    from duckdb_retail_pipeline_spark.operators import graph as G
    from duckdb_retail_pipeline_spark.queries.base import tbl

    OFFSET = 1_000_000_000
    o = tbl(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = tbl(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    edges = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(
            F.col("o_custkey").cast("bigint").alias("src"),
            (F.lit(OFFSET) + F.col("l_partkey")).cast("bigint").alias("dst"),
        )
        .distinct()
    )
    got = [
        (r["node"], r["outdeg"], r["converged"], r["fixed_point_holds"])
        for r in G.pagerank_fixed_point_contract(
            edges, max_iters=60, epsilon_per_node=200,
            redistribute_dangling=True,
        )
        .orderBy("node")
        .collect()
    ]
    want = [
        (int(n), int(d), bool(cv), bool(fp))
        for n, d, cv, fp in duck.execute("""
        WITH edges AS (
            SELECT DISTINCT CAST(o.o_custkey AS BIGINT) AS src,
                   CAST(1000000000 + l.l_partkey AS BIGINT) AS dst
            FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        ), nodes AS (
            SELECT src AS node FROM edges
            UNION SELECT dst FROM edges
        ), deg AS (
            SELECT src, CAST(COUNT(*) AS BIGINT) AS outdeg
            FROM edges GROUP BY src
        )
        SELECT n.node, CAST(COALESCE(d.outdeg, 0) AS BIGINT) AS outdeg,
               TRUE AS converged, TRUE AS fixed_point_holds
        FROM nodes n LEFT JOIN deg d ON n.node = d.src
        ORDER BY n.node
        """).fetchall()
    ]
    assert got == want


def test_graph_and_sketch_operators_on_empty_input(spark):
    """Degenerate-input pin (r10 continuation probe): every r9/r10
    graph/sketch operator must return an EMPTY frame with the
    contracted schema on zero-row input — not raise from an empty
    aggregate, a .first() returning None, or an MG kernel seeing no
    Arrow batches. until-stable on an empty graph is vacuously
    converged after its first (no-op) probe."""
    from duckdb_retail_pipeline_spark.operators import (
        graph as G,
        sketch as SK,
    )

    empty_edges = spark.createDataFrame([], "src bigint, dst bigint")
    assert G.pagerank(empty_edges, iters=2).count() == 0
    assert (
        G.pagerank(empty_edges, iters=2, redistribute_dangling=True).count()
        == 0
    )
    res, iters_run, converged = G.pagerank_until_stable(
        empty_edges, max_iters=5, epsilon=0
    )
    assert res.count() == 0 and converged and iters_run == 1

    empty_li = spark.createDataFrame([], "l_orderkey bigint, l_partkey bigint")
    assert G.copurchase_edges(empty_li).count() == 0

    empty_toks = spark.createDataFrame([], "token string")
    out = SK.frequent_tokens_exact(empty_toks, k=5, capacity=4, max_doublings=1)
    assert out.count() == 0
    assert out.columns == ["token", "n_occurrences", "heavy_bound_holds"]
    assert SK.frequent_tokens(empty_toks, k=5, capacity=4).count() == 0


def test_pagerank_fixed_point_contract_evaporate_symmetric(spark):
    """The contract frame's other convention: evaporate dangling
    mass (redistribute_dangling=False) on a SYMMETRIC graph — the
    x92 contract, where the universe is stable (every node has
    out-edges) and the fixed point exists without redistribution.
    Booleans must come back TRUE and the universe must be the
    distinct sources."""
    from duckdb_retail_pipeline_spark.operators import graph as G

    edges = spark.createDataFrame(
        [(a, b) for a, b in
         [(1, 2), (2, 1), (2, 3), (3, 2), (3, 4), (4, 3), (1, 4), (4, 1)]],
        "src bigint, dst bigint",
    )
    rows = (
        G.pagerank_fixed_point_contract(
            edges, max_iters=60, epsilon_per_node=200,
            redistribute_dangling=False,
        )
        .orderBy("node")
        .collect()
    )
    assert [r["node"] for r in rows] == [1, 2, 3, 4]
    assert all(r["converged"] for r in rows)
    assert all(r["fixed_point_holds"] for r in rows)
    assert all(r["outdeg"] == 2 for r in rows)


def test_triangle_counts_hand_computed(spark):
    """K4 minus one edge: nodes 1-4, all pairs except (3,4). The two
    triangles are (1,2,3) and (1,2,4): nodes 1,2 sit in both, 3,4 in
    one each. Fed DIRECTED duplicates + a self-loop to pin the
    canonicalization (lo<hi, distinct)."""
    from duckdb_retail_pipeline_spark.operators import graph as G

    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (1, 3), (1, 4), (2, 3), (2, 4), (3, 3)],
        "src bigint, dst bigint",
    )
    got = {
        r["node"]: r["n_triangles"]
        for r in G.triangle_counts(edges).collect()
    }
    assert got == {1: 2, 2: 2, 3: 1, 4: 1}


def test_triangle_counts_matches_duckdb_differential(spark, sf_dir, duck):
    """Cross-engine differential for per-node triangle counts over
    the co-purchase graph (this SQL is the future registration
    oracle): the same ordered two-path join a<b<c formulated
    independently in ANSI SQL — every triangle found exactly once,
    corners exploded via UNION ALL."""
    from pyspark.sql import functions as F

    from duckdb_retail_pipeline_spark.operators import graph as G
    from duckdb_retail_pipeline_spark.queries.base import tbl

    li = tbl(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    got = sorted(
        (r["node"], r["n_triangles"])
        for r in G.triangle_counts(G.copurchase_edges(li)).collect()
    )
    want = sorted(
        (int(n), int(c))
        for n, c in duck.execute("""
        WITH items AS (
            SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        ), canon AS (
            SELECT DISTINCT a.l_partkey AS lo, b.l_partkey AS hi
            FROM items a JOIN items b ON a.l_orderkey = b.l_orderkey
            WHERE a.l_partkey < b.l_partkey
        ), tri AS (
            SELECT ab.lo AS a, ab.hi AS b, ac.hi AS c
            FROM canon ab
            JOIN canon ac ON ab.lo = ac.lo AND ab.hi < ac.hi
            JOIN canon bc ON bc.lo = ab.hi AND bc.hi = ac.hi
        ), corners AS (
            SELECT a AS node FROM tri
            UNION ALL SELECT b FROM tri
            UNION ALL SELECT c FROM tri
        )
        SELECT node, CAST(COUNT(*) AS BIGINT) AS n_triangles
        FROM corners GROUP BY node
        """).fetchall()
    )
    assert got == want


def test_pagerank_fixed_point_contract_unconverged_is_honest(spark):
    """max_iters too small: the contract frame must come back
    well-formed with converged=False — and fixed_point_holds
    reporting whatever the one-more-step recheck actually measured —
    rather than raising or overclaiming. (A registered instance
    would then hash-MISMATCH its all-TRUE oracle: loud, not silent.)"""
    from duckdb_retail_pipeline_spark.operators import graph as G

    # IRREGULAR degrees (a perfectly regular graph is an exact fixed
    # point after one step and would honestly converge immediately —
    # caught when the first draft used a symmetric 3-cycle)
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (1, 3)],
        "src bigint, dst bigint",
    )
    rows = G.pagerank_fixed_point_contract(
        edges, max_iters=1, epsilon_per_node=0,
        redistribute_dangling=True,
    ).collect()
    assert len(rows) == 3
    assert all(not r["converged"] for r in rows)
    assert all(r["fixed_point_holds"] in (True, False) for r in rows)


def test_frequent_tokens_exact_k_exceeds_vocabulary(spark):
    """k larger than the distinct-token count: the MG certificate
    can never read TRUE (the n_rows == k gate, r9 ADVICE), so the
    operator must escalate through its doublings to the plain-groupBy
    fallback and return ALL vocab rows — fewer than k, flagged TRUE
    because the short result IS the exact top-min(k, vocab)."""
    from duckdb_retail_pipeline_spark.operators import sketch as SK

    toks = spark.createDataFrame(
        [("a",)] * 5 + [("b",)] * 3 + [("c",)] * 1, "token string"
    )
    rows = SK.frequent_tokens_exact(
        toks, k=10, capacity=4, max_doublings=1
    ).collect()
    got = sorted((r["token"], r["n_occurrences"], r["heavy_bound_holds"])
                 for r in rows)
    assert got == [("a", 5, True), ("b", 3, True), ("c", 1, True)]


def test_bigram_lm_alternating_reference_slots_stay_correct(spark):
    """Alternating self-scoring and external-reference calls rotate
    the count-table slots between derived-from-staging and
    derived-from-reference plans — the rotation must never serve the
    OTHER mode's counts (probe on the late-r10 staging rewrite:
    values stable across two full alternations, and the two modes
    genuinely differ)."""
    from duckdb_retail_pipeline_spark.operators import lm

    docs = spark.createDataFrame(
        [(1, "a b a b c"), (2, "a b x y")], "doc_id bigint, text string"
    )
    ref = spark.createDataFrame(
        [(9, "a b a b a b")], "doc_id bigint, text string"
    )
    self1 = sorted(tuple(r) for r in lm.bigram_lm_scores(docs).collect())
    ext1 = sorted(
        tuple(r) for r in lm.bigram_lm_scores(docs, reference=ref).collect()
    )
    self2 = sorted(tuple(r) for r in lm.bigram_lm_scores(docs).collect())
    ext2 = sorted(
        tuple(r) for r in lm.bigram_lm_scores(docs, reference=ref).collect()
    )
    assert self1 == self2 == [(1, 4, 666666), (2, 3, 777777)]
    assert ext1 == ext2 == [(1, 4, 750000), (2, 3, 333333)]


def test_frequent_tokens_certificate_final_doubling_boundary(spark):
    """r10 verdict #5(a): the escalation's FINAL doubling certifies
    where every smaller capacity could not — both failure modes of
    the n_rows==k gate exercised on one corpus (a=40, b=30, c=20 +
    ten 3-count tail tokens; N=120, single partition so the MG pass
    is batch-deterministic):
    - capacity 2: the MG summary retains only {a, b} → recount is
      SHORT (n_rows 2 < k 3) → FALSE via the n_rows==k gate;
    - capacity 4: full k rows but kth·(cap+1) = 20·5 = 100 < 120 →
      FALSE via the undercount bound;
    - capacity 8: 20·9 = 180 > 120 → TRUE — the final doubling of
      frequent_tokens_exact(capacity=2, max_doublings=2) certifies,
      so the MG path (not the groupBy fallback) must serve the
      result, with values identical to the unconditional exact."""
    from duckdb_retail_pipeline_spark.operators import sketch as SK

    rows = (
        [("a",)] * 40 + [("b",)] * 30 + [("c",)] * 20
        + [(f"t{i:02d}",) for i in range(10) for _ in range(3)]
    )
    toks = spark.createDataFrame(rows, "token string").repartition(1)

    by_cap = {
        cap: sorted(
            (r["token"], r["n_occurrences"], r["heavy_bound_holds"])
            for r in SK.frequent_tokens(toks, k=3, capacity=cap).collect()
        )
        for cap in (2, 4, 8)
    }
    assert by_cap[2] == [("a", 40, False), ("b", 30, False)]  # short
    assert by_cap[4] == [("a", 40, False), ("b", 30, False), ("c", 20, False)]
    assert by_cap[8] == [("a", 40, True), ("b", 30, True), ("c", 20, True)]

    res = SK.frequent_tokens_exact(toks, k=3, capacity=2, max_doublings=2)
    got = sorted(tuple(r) for r in res.collect())
    want = sorted(
        tuple(r) for r in SK.exact_topk_tokens(toks, 3).collect()
    )
    assert got == want
    # the FINAL doubling certified: the served plan is the MG path
    # (mapInPandas candidates), not the plain-groupBy fallback
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan


def test_frequent_tokens_certificate_false_at_exact_equality(spark):
    """The undercount bound must be STRICT: at kth·(capacity+1) == N
    exactly, a token MG dropped could have true count == kth and win
    the alphabetical tie-break into the true top-k — so equality can
    never certify. Corpus engineered to land exactly on the boundary
    (a=10, b=6, four 2-count tail tokens; N=24, capacity 3, k=2:
    6·4 == 24)."""
    from duckdb_retail_pipeline_spark.operators import sketch as SK

    rows = (
        [("a",)] * 10 + [("b",)] * 6
        + [(f"t{i}",) for i in range(4) for _ in range(2)]
    )
    toks = spark.createDataFrame(rows, "token string").repartition(1)
    got = sorted(
        tuple(r)
        for r in SK.frequent_tokens(toks, k=2, capacity=3).collect()
    )
    assert got == [("a", 10, False), ("b", 6, False)]


@pytest.mark.slow  # tier-2 (r13 verdict #1): see conftest
def test_pagerank_until_stable_limit_cycle_is_honest(spark):
    """r10 verdict #5(b): a graph whose floor-rounding limit cycle
    never reaches an exact fixed point (epsilon=0) must exhaust
    max_iters with converged=False — and the contract frame must
    propagate BOTH booleans FALSE (its one-more-step recheck at the
    same epsilon also measures the residual cycle), never overclaim.
    Graph found by probe: 6-node asymmetric ring + three chords
    settles into a persistent integer cycle on both dangling
    conventions (40 iterations, delta never 0)."""
    from duckdb_retail_pipeline_spark.operators import graph as G

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (6, 1),
         (1, 3), (2, 4), (3, 5)],
        "src bigint, dst bigint",
    )
    for redis in (True, False):
        res, iters_run, converged = G.pagerank_until_stable(
            edges, max_iters=40, epsilon=0, redistribute_dangling=redis
        )
        assert iters_run == 40 and not converged, redis
        assert res.count() == 6

    rows = G.pagerank_fixed_point_contract(
        edges, max_iters=40, epsilon_per_node=0,
        redistribute_dangling=True,
    ).collect()
    assert len(rows) == 6
    assert all(not r["converged"] for r in rows)
    assert all(not r["fixed_point_holds"] for r in rows)


def test_seasonal_decompose_matches_python_reference_property(spark):
    """Property pin for the r11 x96 registration: on ARBITRARY
    integer series — gaps, duplicate (key, t) rows, negative time
    indices, negative cents — decompose_additive + seasonal_means
    must equal a pure-Python re-derivation of the RANGE-frame
    semantics (sum over rows in range; trend only where the ±6
    window holds exactly 13 rows AND 13 distinct periods; pmod
    positions)."""
    from collections import defaultdict

    from hypothesis import given, settings, strategies as st

    from duckdb_retail_pipeline_spark.operators import timeseries as TS

    @settings(max_examples=10, deadline=None)
    @given(
        st.lists(
            st.tuples(
                st.integers(min_value=-15, max_value=30),  # t (dups ok)
                st.integers(min_value=-(10**6), max_value=10**6),
            ),
            min_size=1,
            max_size=40,
        )
    )
    def prop(rows):
        series = spark.createDataFrame(
            [("k", t, c) for t, c in rows], "key string, t long, cents long"
        )
        # python reference over the same rows
        by_t = defaultdict(list)
        for t, c in rows:
            by_t[t].append(c)

        def win(t, lo, hi):
            return [
                c for tt, cs in by_t.items() if lo <= tt - t <= hi for c in cs
            ]

        def trend(t):
            w = win(t, -6, 6)
            periods = {tt for tt in by_t if -6 <= tt - t <= 6}
            if len(w) == 13 and len(periods) == 13:
                return (
                    2 * sum(win(t, -5, 5))
                    + sum(win(t, -6, -6))
                    + sum(win(t, 6, 6))
                )
            return None

        got_dec = sorted(
            (r["t"], r["cents"], r["trend_x2p"], r["detr_x2p"])
            for r in TS.decompose_additive(series).collect()
        )
        want_dec = sorted(
            (t, c, trend(t), (24 * c - trend(t)) if trend(t) is not None else None)
            for t, c in rows
        )
        assert got_dec == want_dec

        agg = defaultdict(lambda: [0, 0])
        for t, c in rows:
            tr = trend(t)
            if tr is not None:
                a = agg[t % 12 if t % 12 >= 0 else (t % 12 + 12) % 12]
                a[0] += 24 * c - tr
                a[1] += 1
        got_sm = sorted(
            (r["pos"], r["seasonal_sum_x2p"], r["n_obs"], r["seasonal_avg"])
            for r in TS.seasonal_means(TS.decompose_additive(series)).collect()
        )
        want_sm = sorted(
            (p, s, n, s / (n * 24.0)) for p, (s, n) in agg.items()
        )
        assert got_sm == want_sm

    prop()


def test_triangle_counts_matches_bruteforce_property(spark):
    """Property pin for the r11 x98 registration: on ARBITRARY small
    directed multigraphs (self-loops, duplicate and reversed edges),
    per-node triangle counts must equal brute-force enumeration over
    the canonicalized undirected simple graph."""
    from itertools import combinations

    from hypothesis import given, settings, strategies as st

    from duckdb_retail_pipeline_spark.operators import graph as G

    @settings(max_examples=10, deadline=None)
    @given(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=7),
                st.integers(min_value=0, max_value=7),
            ),
            min_size=1,
            max_size=30,
        )
    )
    def prop(edges):
        canon = {
            (min(a, b), max(a, b)) for a, b in edges if a != b
        }
        nodes = {n for e in canon for n in e}
        want = {}
        for tri in combinations(sorted(nodes), 3):
            a, b, c = tri
            if {(a, b), (a, c), (b, c)} <= canon:
                for n in tri:
                    want[n] = want.get(n, 0) + 1
        df = spark.createDataFrame(
            [(int(a), int(b)) for a, b in edges], "src bigint, dst bigint"
        )
        got = {
            r["node"]: r["n_triangles"]
            for r in G.triangle_counts(df).collect()
        }
        assert got == want

    prop()


def test_cap_per_group_equals_copurchase_inline_twin(spark):
    """Expression-shape pin (r11 review; r13 executed the switch —
    copurchase_edges now CALLS cap_per_group): the helper must stay
    sameSemantics with the canonical inline expression of the
    skew-cap idiom, so a tie-break change cannot silently shift the
    kept subset the x92/x98 adjudications assume. Checked on the
    plan (canonical equality), not just values."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from duckdb_retail_pipeline_spark.operators import graph as G

    rows = [(o, p) for o in range(6) for p in range(o + 3)]
    df = spark.createDataFrame(rows, "l_orderkey bigint, l_partkey bigint")

    helper = G.cap_per_group(df, "l_orderkey", "l_partkey", 3)

    w = Window.partitionBy("l_orderkey").orderBy(
        F.xxhash64("l_partkey"), F.col("l_partkey")
    )
    inline = (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= 3)
        .drop("_rn")
    )
    assert helper.sameSemantics(inline)
    assert sorted(map(tuple, helper.collect())) == sorted(
        map(tuple, inline.collect())
    )
    # every group capped at 3, deterministic across invocations
    sizes = {r[0]: 0 for r in rows}
    for o, _ in map(tuple, helper.collect()):
        sizes[o] += 1
    assert all(n <= 3 for n in sizes.values())


def test_timeseries_semdedup_cap_on_empty_input(spark):
    """Degenerate-input pin for the r11 operators (the r10 graph/
    sketch precedent): empty frames must yield empty frames with the
    contracted schema — not raise from an empty window, a metadata
    lookup, or an empty k-means assignment."""
    from duckdb_retail_pipeline_spark.operators import (
        dedup as D,
        graph as G,
        timeseries as TS,
    )

    empty_series = spark.createDataFrame([], "key string, t long, cents long")
    dec = TS.decompose_additive(empty_series)
    assert dec.count() == 0
    assert dec.columns == ["key", "t", "cents", "trend_x2p", "detr_x2p"]
    sm = TS.seasonal_means(dec)
    assert sm.count() == 0
    assert sm.columns == [
        "key", "pos", "seasonal_sum_x2p", "n_obs", "seasonal_avg"
    ]

    empty_edges = spark.createDataFrame([], "src bigint, dst bigint")
    assert G.triangle_counts(empty_edges).count() == 0
    assert G.cap_per_group(
        spark.createDataFrame([], "g bigint, i bigint"), "g", "i", 3
    ).count() == 0

    # semantic_dedup on one row: a singleton corpus has no neighbor
    # to dominate it — kept, never dropped, never a crash from the
    # single-cell k-means
    one = spark.createDataFrame(
        [(0, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    rows = D.semantic_dedup(one, n_cells=1, kmeans_iters=0).collect()
    assert len(rows) == 1 and rows[0]["keep"] is True


def test_phrase_search_repeated_token_phrases(spark):
    """r11 probe of the positional index (clean — pinned): phrases
    with REPEATED tokens are the classic positional-intersection bug
    class (both join sides filter to the same posting list and a
    naive self-join can pair a position with itself). 'slow slow'
    must count overlapping occurrences per doc, a 3-repeat works,
    an over-long phrase matches nothing, and a 1-token phrase
    degenerates to term counts."""
    from duckdb_retail_pipeline_spark.operators import search as SR

    docs = spark.createDataFrame(
        [(1, "a slow slow join here"),
         (2, "slow slow slow"),
         (3, "slow join"),
         (4, "nothing relevant")],
        "doc_id long, text string",
    )
    idx = SR.positional_index(docs)

    def counts(phrase):
        return {
            r["doc_id"]: r["n_occurrences"]
            for r in SR.phrase_search(idx, phrase).collect()
        }

    assert counts(["slow", "slow"]) == {1: 1, 2: 2}
    assert counts(["slow", "slow", "slow"]) == {2: 1}
    assert counts(["a", "slow", "slow", "join", "here", "extra"]) == {}
    assert counts(["slow"]) == {1: 2, 2: 3, 3: 1}


def test_asof_join_duplicate_right_timestamps_no_fanout(spark):
    """r11 probe (clean — pinned): two right rows at the SAME instant
    must not fan the left row out to two matches — as-of attaches
    exactly one payload per left row, deterministically (the
    struct-max fill: greatest (time, payload) struct wins, so the
    winner is value-ordered, not arrival-ordered)."""
    import datetime

    from duckdb_retail_pipeline_spark.operators import joins as J

    left = spark.createDataFrame(
        [(1, datetime.date(2024, 1, 5))], "k bigint, t date"
    )
    right = spark.createDataFrame(
        [(datetime.date(2024, 1, 3), 1.0),
         (datetime.date(2024, 1, 3), 2.0),
         (datetime.date(2024, 1, 1), 9.9)],
        "t date, rate double",
    )
    a = sorted(map(tuple, J.asof_join(left, right, on_time="t").collect()))
    b = sorted(map(tuple, J.asof_join(left, right, on_time="t").collect()))
    assert len(a) == 1            # no fan-out
    assert a == b                 # deterministic across runs
    assert a[0][-1] == 2.0        # struct-max: larger payload wins the tie


def test_lsh_index_query_rejects_unrealizable_nprobe(spark):
    """r11 review: lsh_topk and batch_ann_topk raise on
    nprobe > bits+1 but the index-serving entry point was missed —
    excess nprobe silently truncated the probe list to fewer probes
    than the caller configured recall for."""
    import pytest

    from duckdb_retail_pipeline_spark.operators import similarity as S

    emb = spark.createDataFrame(
        [(i, [float(i), 1.0, 0.0]) for i in range(8)],
        "vec_id long, embedding array<double>",
    )
    idx = S.lsh_index(emb, bits=3)
    # at the cap: fine
    assert S.lsh_index_query(idx, [1.0, 0.0, 0.0], k=3, nprobe=4).count() >= 0
    with pytest.raises(ValueError, match="unrealizable"):
        S.lsh_index_query(idx, [1.0, 0.0, 0.0], k=3, nprobe=6)


def test_simhash_pairs_deterministic_under_duplicate_ids(spark):
    """r11 review: simhash_pairs was the ONE pair strategy ending in
    dropDuplicates instead of the deterministic _pair_dedup-style
    terminal — under a duplicated id with DIFFERENT texts the chunk
    join surfaces the same (id_a, id_b) with different fingerprints
    and the kept hamming was arrival-nondeterministic. Now a
    groupBy-MIN: stable across runs, nearest-duplicate semantics."""
    from duckdb_retail_pipeline_spark.operators import dedup as D

    base = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame(
        [(1, base),
         (1, base.replace("lazy", "sleepy")),   # same id, different text
         (2, base),
         (3, base.replace("again", "forever"))],
        "doc_id long, text string",
    )
    runs = [
        sorted(
            tuple(r)
            for r in D.simhash_pairs(docs, max_hamming=60).collect()
        )
        for _ in range(2)
    ]
    assert runs[0] == runs[1]
    # the duplicated id's pair (1,2) carries ONE row with the MIN
    # hamming over its payload combinations (base vs base == 0)
    by_pair = {(a, b): h for a, b, h in runs[0]}
    assert by_pair[(1, 2)] == 0


def test_simhash_pairs_chunk_parameter_full_recall(spark):
    """The n_chunks lever (r11 review made the recall contract
    explicit): with n_chunks = max_hamming + 1 the pigeonhole
    guarantee covers the requested distance, so the output must be
    EVERY pair at hamming <= max_hamming (verified against the
    all-pairs hamming computed from the collected fingerprints);
    the default 4-chunk blocking yields a subset of that."""
    from itertools import combinations

    from duckdb_retail_pipeline_spark.functions import text as T
    from duckdb_retail_pipeline_spark.operators import dedup as D
    from pyspark.sql import functions as F

    words = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()
    docs = spark.createDataFrame(
        [(i, " ".join(words[j % len(words)] for j in range(i, i + 6)))
         for i in range(12)],
        "doc_id long, text string",
    )
    hashes = {
        r["doc_id"]: r["h"]
        for r in docs.select(
            "doc_id", T.simhash64(T.tokens("text")).alias("h")
        ).collect()
    }
    h = 9  # h+1 = 10 chunks (n_chunks must divide the 60 hash bits)
    want = sorted(
        (a, b, bin(hashes[a] ^ hashes[b]).count("1"))
        for a, b in combinations(sorted(hashes), 2)
        if bin(hashes[a] ^ hashes[b]).count("1") <= h
    )
    assert want  # the corpus actually has pairs at this distance
    got_full = sorted(
        tuple(r)
        for r in D.simhash_pairs(docs, max_hamming=h, n_chunks=h + 1).collect()
    )
    assert got_full == want  # full recall at n_chunks = h+1
    got_default = sorted(
        tuple(r) for r in D.simhash_pairs(docs, max_hamming=h).collect()
    )
    assert set(got_default) <= set(want)  # blocked semantics: subset


def test_hyperplane_band_keys_are_bigint_and_collision_free(spark):
    """r11 review: at >=33 bits per band the old int-cast band key
    wrapped to its low 32 bits, silently colliding distinct sign
    patterns (e.g. keys 2^33-1 and 2^32-1). Crafted axis-aligned
    planes make the sign pattern controllable: two vectors differing
    ONLY in plane 32's sign must land in different band-0 buckets."""
    from duckdb_retail_pipeline_spark.operators import dedup as D

    dim = 33
    planes = [[1.0 if j == i else 0.0 for j in range(dim)] for i in range(dim)]
    v_all = [1.0] * dim
    v_flip = [1.0] * 32 + [-1.0]
    emb = spark.createDataFrame(
        [(0, v_all), (1, v_flip)], "vec_id long, embedding array<double>"
    )
    banded = D.hyperplane_bands(emb, planes, bands=1)
    assert banded.schema["key"].dataType.simpleString() == "bigint"
    keys = {r["vec_id"]: r["key"] for r in banded.collect()}
    assert keys[0] == 2**33 - 1
    assert keys[1] == 2**32 - 1
    assert keys[0] != keys[1]  # the old int cast collided these


def test_chunk_starts_no_pure_suffix_chunks(spark):
    """r11 review: the old up-to-the-last-token bound emitted a
    trailing chunk wholly contained in its predecessor whenever
    size − last_start <= overlap (97 tokens at 128/32 → starts
    [0, 96], the 96-chunk being one already-covered token). Starts
    now stop once the previous chunk covers the doc; empty docs keep
    their one offset-0 chunk."""
    from duckdb_retail_pipeline_spark.functions import text as T
    from pyspark.sql import functions as F

    sizes = [0, 1, 96, 97, 128, 129, 224, 225, 320]
    docs = spark.createDataFrame(
        [(n, " ".join(f"t{i}" for i in range(n))) for n in sizes],
        "n long, text string",
    )
    got = {
        r["n"]: r["starts"]
        for r in docs.select(
            "n", T.chunk_starts(T.tokens("text"), 128, 32).alias("starts")
        ).collect()
    }
    assert got[0] == [0] and got[1] == [0]
    assert got[96] == [0] and got[97] == [0] and got[128] == [0]
    assert got[129] == [0, 96]
    assert got[224] == [0, 96]       # chunk at 96 covers 97..224
    assert got[225] == [0, 96, 192]
    assert got[320] == [0, 96, 192]  # 192-chunk covers through 319+1
    # coverage invariant: every token is inside some chunk, and no
    # chunk is wholly contained in its predecessor
    for n, starts in got.items():
        if n == 0:
            continue
        assert starts[0] == 0
        for prev, cur in zip(starts, starts[1:]):
            assert prev + 128 < n or cur + 128 >= n  # cur adds new tokens
            assert cur <= prev + 128  # no gap
        assert starts[-1] + 128 >= n  # last chunk reaches the end


def test_adc_topk_rejects_dim_mismatch(spark):
    """r11 review: adc_topk derived sub-dims by floor division, so a
    query whose length mismatched the books silently zip-truncated
    every LUT entry and corrupted all scores. Now it raises on a
    non-divisible dim and on a query/books sub-dim mismatch."""
    import pytest

    from duckdb_retail_pipeline_spark.operators import pq as PQ

    emb = spark.createDataFrame(
        [(i, [float(i + j) for j in range(12)]) for i in range(6)],
        "vec_id long, embedding array<double>",
    )
    books = PQ.train_pq(emb, dim=12, m=4, k_codes=4)
    codes = PQ.encode_pq(emb, books, dim=12)
    # matching query: fine
    assert PQ.adc_topk(codes, books, [1.0] * 12, k=3).count() == 3
    with pytest.raises(ValueError, match="not divisible"):
        PQ.adc_topk(codes, books, [1.0] * 10, k=3)
    with pytest.raises(ValueError, match="trained at"):
        PQ.adc_topk(codes, books, [1.0] * 8, k=3)  # divisible, wrong dim


def test_scd2_same_side_tie_is_deterministic(spark):
    """r11 review: two same-day CDC changes for one key (same __src,
    equal effective_from) ordered arbitrarily one level below the
    dim-vs-change tiebreak — which correction ended up current
    flipped between runs. The payload-struct total order pins it:
    the greatest payload becomes the live version, stable across
    runs."""
    import datetime

    from duckdb_retail_pipeline_spark.operators import merge as MG
    from pyspark.sql import functions as F

    dim = spark.createDataFrame(
        [(1, "v0", datetime.date(2020, 1, 1))],
        "k long, attr string, effective_from date",
    )
    changes = spark.createDataFrame(
        [(1, "corrA", datetime.date(2020, 2, 1)),
         (1, "corrB", datetime.date(2020, 2, 1))],
        "k long, attr string, effective_from date",
    )
    runs = [
        sorted(
            (r["attr"], str(r["effective_to"]), r["is_current"])
            for r in MG.scd2_apply(dim, changes, ["k"]).collect()
        )
        for _ in range(2)
    ]
    assert runs[0] == runs[1]
    current = [a for a, _, cur in runs[0] if cur]
    assert current == ["corrB"]  # greatest payload struct wins


def test_range_join_bucketed_rejects_column_collisions(spark):
    """r11 review: shared non-by column names made the residual
    filter ambiguous with an error pointing nowhere near the cause —
    the asof_join guard now applies here too."""
    import pytest

    from duckdb_retail_pipeline_spark.operators import joins as J

    left = spark.createDataFrame([(1, 5.0)], "id long, v double")
    right = spark.createDataFrame(
        [(9, 0.0, 10.0)], "id long, lo double, hi double"
    )
    with pytest.raises(ValueError, match="both"):
        J.range_join_bucketed(left, right, "v", "lo", "hi", 4.0)


def test_grouped_ols_raises_past_float64_exactness(spark):
    """r11 review: a nullable bigint reaches the Arrow kernel as
    float64, lossy above 2^53 — int(v) would silently fit on
    corrupted integers; the kernel now raises."""
    import pytest

    from duckdb_retail_pipeline_spark.operators.grouped import grouped_ols

    rows = [(1, 1, 2**53 + 100), (1, 2, None)]  # the None forces float64
    df = spark.createDataFrame(rows, "g long, x long, y long")
    with pytest.raises(Exception, match="2\\^53"):
        grouped_ols(df, "g", "x", "y").collect()


def test_asof_join_map_payload_joins_and_orderable_ties_still_pin(spark):
    """r12 ADVICE: the r11 tie-break sorted on the FULL right-payload
    struct, so a MapType payload column — which joined fine before
    r11, just tie-nondeterministically — started throwing
    AnalysisException (maps are unorderable). The tie key is now the
    struct of ORDERABLE payload fields only: map payloads join
    again, and ties still resolve deterministically by the orderable
    fields."""
    import datetime

    from duckdb_retail_pipeline_spark.operators import joins as J

    left = spark.createDataFrame(
        [(1, datetime.date(2024, 1, 5))], "k bigint, t date"
    )
    right = spark.createDataFrame(
        [
            (datetime.date(2024, 1, 3), 1.0, {"src": "a"}),
            (datetime.date(2024, 1, 3), 2.0, {"src": "b"}),
            (datetime.date(2024, 1, 1), 9.9, {"src": "c"}),
        ],
        "t date, rate double, attrs map<string,string>",
    )
    out = J.asof_join(left, right, on_time="t").collect()
    assert len(out) == 1
    # the orderable field (rate) still breaks the 2024-01-03 tie
    # deterministically: greatest orderable tuple wins backward
    assert out[0]["rate"] == 2.0
    assert out[0]["attrs"] == {"src": "b"}  # the whole winning row rides


def test_rotating_persist_exception_during_persist_leaves_no_leak(
    spark, tmp_path, monkeypatch
):
    """r12 probe (r11 verdict #4c): an exception raised INSIDE
    rotating_persist's critical section — after the occupant is
    evicted, at the persist() call — must leave the slot EMPTY (no
    half-rotated state), the prior occupant unpersisted (no pinned
    leak), and the next call must rebuild cleanly."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    from duckdb_retail_pipeline_spark.memo import rotating_persist

    p = str(tmp_path / "rp_exc.parquet")
    pq.write_table(pa.table({"v": [1, 2, 3]}), p)
    slot: list = []
    occ = rotating_persist(spark.read.parquet(p), slot)
    assert occ.count() == 3
    assert occ.storageLevel.useMemory

    # regenerate so the NEXT call takes the rotation path (signature
    # mismatch), then make persist() blow up mid-rotation. Patch the
    # RUNTIME class (Spark 4's classic.DataFrame overrides persist;
    # patching the pyspark.sql.DataFrame facade misses it).
    pq.write_table(pa.table({"v": [9]}), p)
    cls = type(occ)
    real_persist = cls.persist
    monkeypatch.setattr(
        cls,
        "persist",
        lambda self, *a: (_ for _ in ()).throw(RuntimeError("persist boom")),
    )
    with pytest.raises(RuntimeError, match="persist boom"):
        rotating_persist(spark.read.parquet(p), slot)
    assert slot == []  # no half-rotated occupant
    assert not occ.storageLevel.useMemory  # evicted occupant unpinned
    monkeypatch.setattr(cls, "persist", real_persist)

    fresh = rotating_persist(spark.read.parquet(p), slot)
    assert [r["v"] for r in fresh.collect()] == [9]
    assert len(slot) == 1
    slot.pop()[0].unpersist()


def test_rotating_persist_failed_materialization_never_serves_stale(
    spark, tmp_path
):
    """r12 probe (r11 verdict #4c, the lazy-build arm): persist() is
    LAZY — if the occupant's FIRST action fails (source vanished
    mid-build), the slot still holds the never-materialized frame.
    After the dataset is regenerated under the same path, the next
    call must ROTATE (the stored signature's mtimes mismatch), not
    serve the broken occupant whose plan is semantically equal."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    from duckdb_retail_pipeline_spark.memo import rotating_persist

    p = str(tmp_path / "rp_mat.parquet")
    pq.write_table(pa.table({"v": [1, 2, 3]}), p)
    slot: list = []
    occ = rotating_persist(spark.read.parquet(p), slot)
    os.remove(p)  # source vanishes before the first action
    with pytest.raises(Exception):
        occ.count()
    assert len(slot) == 1  # the broken occupant is still pinned

    pq.write_table(pa.table({"v": [7, 8]}), p)  # regeneration
    fresh = rotating_persist(spark.read.parquet(p), slot)
    assert sorted(r["v"] for r in fresh.collect()) == [7, 8]
    assert fresh is not occ  # rotated, not served stale
    slot.pop()[0].unpersist()


def test_chunk_starts_coverage_invariants_near_suffix_fix(spark):
    """r12 probe (r11 verdict #4b, the suffix fix's neighboring
    regime): dropping covered suffix chunks must not cost coverage.
    Exhaustively over doc sizes 0..40 and (chunk_size, overlap)
    combos: (1) every token position is inside >=1 emitted chunk,
    (2) every contiguous run of length <= overlap+1 — the window the
    overlap exists to keep intact (a phrase crossing a chunk
    boundary) — is WHOLLY inside some emitted chunk, and (3) no
    emitted chunk is a pure suffix contained in its predecessor (the
    r11 fix itself)."""
    from duckdb_retail_pipeline_spark.functions import text as T

    combos = [(4, 1), (4, 2), (5, 2), (8, 3), (3, 0), (6, 5)]
    rows = spark.createDataFrame(
        [(n, ["t"] * n) for n in range(41)], "n int, toks array<string>"
    )
    for cs, ov in combos:
        starts_by_n = {
            r["n"]: sorted(r["starts"])
            for r in rows.select(
                "n", T.chunk_starts("toks", cs, ov).alias("starts")
            ).collect()
        }
        for n, starts in starts_by_n.items():
            assert starts[0] == 0  # empty docs still chunk at 0
            covered = set()
            for s in starts:
                covered |= set(range(s, min(s + cs, n)))
            assert covered == set(range(n)), (cs, ov, n, starts)
            # every run of length <= overlap+1 fits in one chunk
            max_run = ov + 1
            for p in range(0, n - max_run + 1):
                assert any(
                    s <= p and p + max_run <= s + cs for s in starts
                ), (cs, ov, n, p, starts)
            # no chunk wholly contained in its predecessor
            for prev, cur in zip(starts, starts[1:]):
                assert min(cur + cs, n) > min(prev + cs, n), (
                    cs, ov, n, starts,
                )


def test_phrase_search_overlapping_repeated_token_phrases(spark):
    """r12 probe (r11 verdict #4b): a phrase made of REPEATED tokens
    self-overlaps — "a a a a" contains "a a a" at starts 1 and 2,
    sharing tokens. The positional intersection must count BOTH
    (standard positional-index semantics, and what x90's adjacent-
    pair oracle counts), not dedupe shared-token occurrences; a
    period-2 phrase and a no-match boundary case ride along."""
    from duckdb_retail_pipeline_spark.operators import search as SR

    docs = spark.createDataFrame(
        [
            (1, "a a a a"),          # "a a a": starts 1,2 -> 2
            (2, "a b a b a"),        # "a b a": starts 1,3 -> 2
            (3, "x a a"),            # "a a a": no match
            (4, "a a a"),            # exactly one occurrence
        ],
        "doc_id long, text string",
    )
    idx = SR.positional_index(docs)
    got3 = {
        r["doc_id"]: r["n_occurrences"]
        for r in SR.phrase_search(idx, ["a", "a", "a"]).collect()
    }
    assert got3 == {1: 2, 4: 1}, got3
    gotp2 = {
        r["doc_id"]: r["n_occurrences"]
        for r in SR.phrase_search(idx, ["a", "b", "a"]).collect()
    }
    assert gotp2 == {2: 2}, gotp2


def _probe_corpus(tmp_path, spark, tables: dict):
    """Write adversarial parquet tables and return (sf_dir, duckdb
    con with views) for running REGISTERED queries + their oracles
    on a corpus the driver SFs don't contain (r12 probe harness)."""
    import duckdb as _duckdb

    d = str(tmp_path / "probe_sf")
    import os as _os

    _os.makedirs(d, exist_ok=True)
    con = _duckdb.connect()
    for name, (rows, schema) in tables.items():
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{d}/{name}.parquet")
        # Spark writes a parquet DIRECTORY; DuckDB needs the part-file
        # glob (the driver testdata are single files, so conftest's
        # bare path works there but not here)
        con.execute(
            f"CREATE VIEW {name} AS "
            f"SELECT * FROM '{d}/{name}.parquet/*.parquet'"
        )
    return d, con


def test_q08_adversarial_ties_and_null_shipdates(spark, tmp_path):
    """r12 probe (r11 verdict #4a): q08's composite-key join on the
    per-order MAX shipdate, driven on a corpus the driver SFs don't
    stress — two lines TIED at the max (both must aggregate), a
    fully-duplicated row (both copies count), an order whose
    shipdates are ALL NULL (MAX is NULL, the equi-join must drop it
    in BOTH engines), and a mixed NULL/real order (MAX ignores
    NULL)."""
    import datetime as dt

    from duckdb_retail_pipeline_spark.queries import REGISTRY
    from tests.compare import assert_matches

    ts = dt.datetime
    rows = [
        # order 1: tie at max shipdate + an earlier line
        (1, ts(2024, 1, 5), 10.0),
        (1, ts(2024, 1, 5), 20.0),
        (1, ts(2024, 1, 2), 99.0),
        # order 2: exact duplicate rows at the max
        (2, ts(2024, 2, 1), 5.0),
        (2, ts(2024, 2, 1), 5.0),
        # order 3: all-NULL shipdates -> dropped by the equi-join
        (3, None, 7.0),
        (3, None, 8.0),
        # order 4: NULL + real -> MAX ignores the NULL
        (4, None, 1.0),
        (4, ts(2024, 3, 3), 2.0),
    ]
    sf, con = _probe_corpus(
        tmp_path, spark,
        {"lineitem": (rows,
                      "l_orderkey long, l_shipdate timestamp, "
                      "l_extendedprice double")},
    )
    spec = REGISTRY["q08_composite_key_join"]
    df = spec.fn(spark, sf)
    assert_matches(df, con, spec.oracle, "q08-probe")
    got = {r["l_orderkey"]: (r["n_lines_last_day"], r["last_day_value"])
           for r in df.collect()}
    assert got == {1: (2, 30.0), 2: (2, 10.0), 4: (1, 2.0)}, got


def test_q23_adversarial_rank_boundary_ties(spark, tmp_path):
    """r12 probe (r11 verdict #4a): q23's top-2-per-group under ties
    AT the rank boundary (three rows sharing the top price — the
    partkey tie-break must pick the same two in both engines),
    fully-duplicated rows (identical (brand, partkey, price): either
    copy is the same OUTPUT row, so rank arbitrariness is
    value-invisible), a singleton brand, and a NULL retailprice
    (DESC puts NULLs last in both engines' defaults — pinned here so
    a default change cannot slip through)."""
    from duckdb_retail_pipeline_spark.queries import REGISTRY
    from tests.compare import assert_matches

    rows = [
        ("B1", 1, "p1", 100.0),   # three-way tie at the top:
        ("B1", 2, "p2", 100.0),   # partkeys 1,2 win; 3 is rank 3
        ("B1", 3, "p3", 100.0),
        ("B2", 4, "p4", 50.0),    # exact duplicate rows: the two
        ("B2", 4, "p4", 50.0),    # output rows are identical
        ("B2", 5, "p5", 60.0),
        ("B3", 6, "p6", 10.0),    # singleton brand
        ("B4", 7, "p7", None),    # NULL price sorts after real ones
        ("B4", 8, "p8", 1.0),
        ("B4", 9, "p9", 2.0),
    ]
    sf, con = _probe_corpus(
        tmp_path, spark,
        {"part": (rows,
                  "p_brand string, p_partkey long, p_name string, "
                  "p_retailprice double")},
    )
    spec = REGISTRY["q23_top_per_group"]
    df = spec.fn(spark, sf)
    assert_matches(df, con, spec.oracle, "q23-probe")
    got = sorted((r["p_brand"], r["p_partkey"]) for r in df.collect())
    assert got == [
        ("B1", 1), ("B1", 2), ("B2", 4), ("B2", 5),
        ("B3", 6), ("B4", 8), ("B4", 9),
    ], got


def test_a15_adversarial_interpolation_boundaries(spark, tmp_path):
    """r12 probe (r11 verdict #4a): a15's exact interpolated
    percentiles at the boundary regimes the driver corpus averages
    away — a 1-element group (all four fractions = the element), a
    2-element group (pure interpolation at every fraction), a
    5-element group (0.25/0.5/0.75 land EXACTLY on elements, 0.9
    interpolates), negative balances, and a half-cent value (0.125
    rounds HALF-UP to 13 cents in both engines' conventions)."""
    from duckdb_retail_pipeline_spark.queries import REGISTRY
    from tests.compare import assert_matches

    customers = [
        # nation 0: singleton
        (1, 0, 42.37),
        # nation 1: two elements, one negative
        (2, 1, -10.00),
        (3, 1, 0.125),
        # nation 2: five elements -> exact hits at .25/.5/.75
        (4, 2, 1.00), (5, 2, 2.00), (6, 2, 3.00),
        (7, 2, 4.00), (8, 2, 5.00),
    ]
    nations = [(0, "SINGLETON"), (1, "PAIR"), (2, "FIVE"), (3, "EMPTY")]
    sf, con = _probe_corpus(
        tmp_path, spark,
        {
            "customer": (customers,
                         "c_custkey long, c_nationkey int, c_acctbal double"),
            "nation": (nations, "n_nationkey int, n_name string"),
        },
    )
    spec = REGISTRY["a15_exact_percentiles"]
    df = spec.fn(spark, sf)
    assert_matches(df, con, spec.oracle, "a15-probe")
    got = {r["nation"]: (r["p25"], r["median"], r["p75"], r["p90"])
           for r in df.collect()}
    assert "EMPTY" not in got          # inner join drops empty nations
    assert got["SINGLETON"] == (42.37, 42.37, 42.37, 42.37)
    assert got["FIVE"] == (2.0, 3.0, 4.0, 4.6)
    # PAIR: cents are -1000 and 13 (0.125 -> HALF-UP 13); linear
    # interpolation between exactly two points
    assert got["PAIR"][1] == (-1000 + (13 - -1000) * 0.5) / 100.0


def test_semantic_dedup_broadcast_centroid_path_matches_duckdb(
    spark, sf_dir, duck
):
    """r12 review: past CELL_EXPR_MAX cells semantic_dedup's
    centroid-cosine stage switches from plan literals to a broadcast
    centroid table (√corpus cells would inline n_cells × dim constant
    nodes — the plan-analysis blowup assign_cells already dispatches
    around). Pin the join path end-to-end against the independent
    DuckDB oracle at n_cells=18 (> CELL_EXPR_MAX=16; also exercises
    the kernel argmax assignment)."""
    from duckdb_retail_pipeline_spark.operators import dedup as D
    from duckdb_retail_pipeline_spark.operators.similarity import CELL_EXPR_MAX
    from duckdb_retail_pipeline_spark.queries.extensions import (
        SQL_COSINE_PARTS,
        _sql_norm,
    )

    n_cells, th = 18, 0.3
    assert n_cells > CELL_EXPR_MAX
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = [
        [float(x) for x in r["embedding"]]
        for r in emb.orderBy("vec_id").limit(n_cells).collect()
    ]
    got = sorted(
        (r["vec_id"], r["cell"], round(r["cent_cos"], 9), r["keep"])
        for r in D.semantic_dedup(
            emb, threshold=th, n_cells=n_cells, kmeans_iters=0
        ).collect()
    )
    assert any(not k for _, _, _, k in got)  # the drop path fired

    def lit(vec):
        return "[" + ", ".join(repr(x) for x in vec) + "]"

    def cos(col, cvec):
        return (
            f"({SQL_COSINE_PARTS.format(a=col, b=lit(cvec))}"
            f" / NULLIF({_sql_norm(col)} * {_sql_norm(lit(cvec))}, 0.0))"
        )

    sims = "[" + ", ".join(cos("embedding", c) for c in cents) + "]"
    sql = f"""
        WITH base AS (
            SELECT vec_id, embedding, {sims} AS sims,
                   {_sql_norm('embedding')} AS nrm
            FROM embeddings
        ), scored AS (
            SELECT vec_id, embedding, nrm,
                   CAST(COALESCE(list_position(sims,
                        list_aggregate(sims, 'max')) - 1, 0) AS BIGINT)
                       AS cell,
                   sims
            FROM base
        ), sc AS (
            SELECT vec_id, embedding, nrm, cell,
                   CAST(CAST(sims[cell + 1] AS DECIMAL(28,4)) AS DOUBLE)
                       AS cent_cos
            FROM scored
        ), dominated AS (
            SELECT DISTINCT a.vec_id
            FROM sc a JOIN sc b
              ON a.cell = b.cell AND a.vec_id <> b.vec_id
             AND (b.cent_cos < a.cent_cos
                  OR (b.cent_cos = a.cent_cos AND b.vec_id < a.vec_id))
            WHERE CAST(CAST(
                    {SQL_COSINE_PARTS.format(a='a.embedding', b='b.embedding')}
                    / NULLIF(a.nrm * b.nrm, 0.0)
                  AS DECIMAL(28,4)) AS DOUBLE) >= {th}
        )
        SELECT s.vec_id, s.cell, s.cent_cos, d.vec_id IS NULL AS keep
        FROM sc s LEFT JOIN dominated d ON s.vec_id = d.vec_id
    """
    want = sorted(
        (int(v), int(c), round(cc, 9), bool(k))
        for v, c, cc, k in duck.execute(sql).fetchall()
    )
    assert got == want


def test_q20_mode_null_regimes_match_after_oracle_fix(spark, tmp_path):
    """r12 probe wave 2: the registered MODE convention is over
    NON-NULL values (pandas .mode() drops NaN — the reference's
    behavior; deterministic_mode filters them), but q20's oracle
    ranked NULL like any value: a NULL-majority group made DuckDB
    crown NULL the mode while the engine returned the top non-NULL,
    and an all-NULL group changed the row count. Latent on the
    NULL-free driver corpus — the oracle now filters p_type IS NOT
    NULL; this corpus is the regime that diverged."""
    from duckdb_retail_pipeline_spark.queries import REGISTRY
    from tests.compare import assert_matches

    rows = [
        # NULL-majority brand: mode must be the top NON-NULL value
        ("B1", None), ("B1", None), ("B1", None),
        ("B1", "small"), ("B1", "small"), ("B1", "large"),
        # all-NULL brand: no mode row at all
        ("B2", None), ("B2", None),
        # tie brand: (count DESC, value ASC) pinned tie-break
        ("B3", "zinc"), ("B3", "alum"),
    ]
    sf, con = _probe_corpus(
        tmp_path, spark, {"part": (rows, "p_brand string, p_type string")}
    )
    spec = REGISTRY["q20_deterministic_mode"]
    df = spec.fn(spark, sf)
    assert_matches(df, con, spec.oracle, "q20-null-probe")
    got = {r["p_brand"]: r["mode_type"] for r in df.collect()}
    assert got == {"B1": "small", "B3": "alum"}, got


@pytest.mark.slow  # tier-2 (r13 verdict #1): see conftest
def test_x73_histogram_degenerate_distributions(spark, tmp_path):
    """r12 probe wave 2: equi-width histogram where the bin
    arithmetic degenerates — all-equal totals (width collapses to 1
    cent, everything in bin 0), a single row, and negative totals
    (lo < 0: the (cents − lo) shift keeps the integer division
    non-negative, where Spark's truncating `div` and DuckDB's
    flooring `//` would otherwise disagree)."""
    from duckdb_retail_pipeline_spark.queries import REGISTRY
    from tests.compare import assert_matches

    spec = REGISTRY["x73_histogram"]
    for name, totals in (
        ("all-equal", [42.0] * 7),
        ("single-row", [13.37]),
        ("negative", [-25.0, -5.5, 0.0, 12.25, 99.99]),
    ):
        sf, con = _probe_corpus(
            tmp_path, spark,
            {"orders": ([(t,) for t in totals], "o_totalprice double")},
        )
        df = spec.fn(spark, sf)
        assert_matches(df, con, spec.oracle, f"x73-{name}")
        n = sum(r["n_orders"] for r in df.collect())
        assert n == len(totals), (name, n)


def test_x78_correlation_zero_variance_groups(spark, tmp_path):
    """r12 probe wave 2: Pearson r where the exact-moment denominator
    is zero — a source whose docs all share the same (tokens,
    distinct tokens) point, and a singleton source (n=1 ⇒ zero
    variance by definition). Both engines must emit NULL (the
    NULLIF-guarded sqrt), never NaN or a division error; a normal
    two-point source rides along with r = ±1 exactness."""
    from duckdb_retail_pipeline_spark.queries import REGISTRY
    from tests.compare import assert_matches

    docs = [
        ("const", "a b c"), ("const", "x y z"), ("const", "p q r"),
        ("single", "lone doc here"),
        ("line", "a a"),              # x=2, y=1
        ("line", "a b c d"),          # x=4, y=4
    ]
    sf, con = _probe_corpus(
        tmp_path, spark, {"documents": (docs, "source string, text string")}
    )
    spec = REGISTRY["x78_correlation_report"]
    df = spec.fn(spark, sf)
    assert_matches(df, con, spec.oracle, "x78-degenerate")
    got = {r["source"]: r["pearson_r"] for r in df.collect()}
    assert got["const"] is None      # zero variance in BOTH coords
    assert got["single"] is None     # n=1
    assert got["line"] == 1.0        # two points -> exact +1


def test_x72_ab_test_degenerate_arms(spark, tmp_path):
    """r12 probe wave 2: the two-proportion z-test where the guards
    must fire — an EMPTY arm (every user_id even ⇒ n_b=0: rate_b and
    z are NULL via NULLIF, not a division error) and a
    zero-conversion corpus (pooled rate 0 ⇒ the standard error is 0
    ⇒ z NULL). Cross-engine equality pinned in both regimes."""
    import datetime as dt

    from duckdb_retail_pipeline_spark.queries import REGISTRY
    from tests.compare import assert_matches

    t0 = dt.datetime(2024, 1, 1, 12, 0)
    spec = REGISTRY["x72_ab_test"]

    # regime 1: all-even user ids -> arm B empty
    ev1 = [
        (t0, 0, "purchase"), (t0, 0, "purchase"), (t0, 0, "view"),
        (t0, 2, "view"), (t0, 2, "view"),
        (t0, 4, "purchase"), (t0, 4, "view"),
    ]
    sf, con = _probe_corpus(
        tmp_path, spark,
        {"events": (ev1, "ts timestamp, user_id long, event_type string")},
    )
    df = spec.fn(spark, sf)
    assert_matches(df, con, spec.oracle, "x72-empty-arm")
    row = df.collect()[0]
    assert row["n_b"] == 0 and row["rate_b"] is None and row["z_score"] is None

    # regime 2: both arms populated, nobody converts -> se = 0 -> z NULL
    ev2 = [
        (t0, 0, "view"), (t0, 1, "view"), (t0, 2, "view"), (t0, 3, "view"),
    ]
    sf2 = tmp_path / "probe2"
    sf2.mkdir()
    import duckdb as _duckdb

    spark.createDataFrame(
        ev2, "ts timestamp, user_id long, event_type string"
    ).coalesce(1).write.mode("overwrite").parquet(f"{sf2}/events.parquet")
    con2 = _duckdb.connect()
    con2.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf2}/events.parquet/*.parquet'"
    )
    df2 = spec.fn(spark, str(sf2))
    assert_matches(df2, con2, spec.oracle, "x72-zero-conversion")
    row2 = df2.collect()[0]
    assert row2["z_score"] is None and row2["rate_a"] == 0.0


def test_a09_moving_average_short_and_gapped_series(spark, tmp_path):
    """r12 probe wave 2: the 7-ROW moving average on a single-day
    series (frame of one) and a gapped series (ROWS frames ignore
    calendar gaps by design — both engines must agree on that
    semantics, not interpolate missing days)."""
    import datetime as dt

    from duckdb_retail_pipeline_spark.queries import REGISTRY
    from tests.compare import assert_matches

    mk = lambda d, v: (dt.datetime(2024, 1, d, 0, 0), v)  # noqa: E731
    orders = [
        mk(1, 10.0), mk(1, 20.0),       # day 1: two orders
        mk(2, 30.0),                    # day 2
        mk(20, 40.0),                   # 18-day gap: still "adjacent row"
    ]
    sf, con = _probe_corpus(
        tmp_path, spark,
        {"orders": (orders, "o_orderdate timestamp, o_totalprice double")},
    )
    spec = REGISTRY["a09_moving_average"]
    df = spec.fn(spark, sf)
    assert_matches(df, con, spec.oracle, "a09-gapped")
    got = {str(r["date"]): r["avg_order_value_7d"] for r in df.collect()}
    assert got["2024-01-01"] == 15.0            # frame of one day
    assert got["2024-01-02"] == 20.0            # (10+20+30)/3
    assert got["2024-01-20"] == 25.0            # gap ignored: 100/4


def test_x55_attribution_timestamp_ties_and_1h_boundary(spark, tmp_path):
    """r12 probe wave 2: last-touch attribution at its tie and
    boundary regimes — a click sharing the purchase's exact
    timestamp (the (ts, event_id) total order decides whether the
    touch is in frame: id-before counts, id-after does not), a touch
    EXACTLY 1 hour before the purchase (>= keeps it), and one just
    beyond (dropped to 'none'). Cross-engine pinned."""
    import datetime as dt

    from duckdb_retail_pipeline_spark.queries import REGISTRY
    from tests.compare import assert_matches

    t = lambda m, s=0, us=0: dt.datetime(2024, 1, 1, 12, m, s, us)  # noqa: E731
    rows = [
        # user 1: click at the SAME microsecond as the purchase,
        # event_id BEFORE -> the click is in frame, attributed
        (1, 10, "click", 0.0, t(0)),
        (1, 11, "purchase", 50.0, t(0)),
        # user 2: click at the same microsecond, event_id AFTER ->
        # not in the purchase's frame -> 'none'
        (2, 21, "purchase", 30.0, t(0)),
        (2, 22, "click", 0.0, t(0)),
        # user 3: view EXACTLY 1h before -> >= boundary keeps it
        (3, 30, "view", 0.0, t(0)),
        (3, 31, "purchase", 20.0, t(0) + dt.timedelta(hours=1)),
        # user 4: click 1h + 1µs before -> beyond the window -> 'none'
        (4, 40, "click", 0.0, t(0)),
        (4, 41, "purchase", 10.0,
         t(0) + dt.timedelta(hours=1, microseconds=1)),
    ]
    sf, con = _probe_corpus(
        tmp_path, spark,
        {"events": (rows,
                    "user_id long, event_id long, event_type string, "
                    "value double, ts timestamp")},
    )
    spec = REGISTRY["x55_last_touch_attribution"]
    df = spec.fn(spark, sf)
    assert_matches(df, con, spec.oracle, "x55-ties")
    got = {r["channel"]: (r["n_purchases"], r["attributed_value"])
           for r in df.collect()}
    assert got == {
        "click": (1, 50.0),   # user 1 (tie, id-before)
        "view": (1, 20.0),    # user 3 (exact 1h)
        "none": (2, 40.0),    # users 2 (tie, id-after) + 4 (1h+1µs)
    }, got


def test_x45_funnel_step_boundary_semantics(spark, tmp_path):
    """r12 probe wave 2: the funnel's step predicates are strict-
    after / inclusive-within (> t_prev, <= t_prev + 1h) — probe a
    click at the view's exact microsecond (excluded), a click at
    exactly view+1h (included), a purchase at exactly click+1h
    (included), and one at click+1h+1µs (excluded)."""
    import datetime as dt

    from duckdb_retail_pipeline_spark.queries import REGISTRY
    from tests.compare import assert_matches

    b = dt.datetime(2024, 3, 1, 9, 0, 0)
    h1 = dt.timedelta(hours=1)
    us = dt.timedelta(microseconds=1)
    rows = [
        # user 1: click at the view's exact ts -> NOT counted (strict >)
        (1, "view", b), (1, "click", b),
        # user 2: click exactly at view+1h -> counted; purchase at
        # click+1h exactly -> counted
        (2, "view", b), (2, "click", b + h1), (2, "purchase", b + 2 * h1),
        # user 3: click in window; purchase at click+1h+1µs -> not counted
        (3, "view", b), (3, "click", b + us), (3, "purchase", b + h1 + 2 * us),
        # user 4: purchase only -> counted at step 0 of nothing
        (4, "purchase", b),
    ]
    sf, con = _probe_corpus(
        tmp_path, spark,
        {"events": (rows, "user_id long, event_type string, ts timestamp")},
    )
    spec = REGISTRY["x45_event_funnel"]
    df = spec.fn(spark, sf)
    assert_matches(df, con, spec.oracle, "x45-boundaries")
    row = df.collect()[0]
    assert (row["n_users"], row["n_view"], row["n_click_1h"],
            row["n_purchase_1h"]) == (4, 3, 2, 1), row


def test_a03_setops_duplicate_row_semantics(spark, tmp_path):
    """r12 probe wave 2: INTERSECT/EXCEPT are DISTINCT set ops in
    both engines — a customer with several urgent AND several low
    orders yields exactly one 'both' row (no bag multiplicity), and
    duplicate urgent-only orders collapse to one 'urgent_only' row.
    Pinned cross-engine so a future rewrite to intersectAll/exceptAll
    (bag semantics) cannot slip through."""
    from duckdb_retail_pipeline_spark.queries import REGISTRY
    from tests.compare import assert_matches

    rows = [
        (1, "1-URGENT"), (1, "1-URGENT"), (1, "5-LOW"), (1, "5-LOW"),
        (2, "1-URGENT"), (2, "1-URGENT"),
        (3, "5-LOW"),
        (4, "3-MEDIUM"),
    ]
    sf, con = _probe_corpus(
        tmp_path, spark,
        {"orders": (rows, "o_custkey long, o_orderpriority string")},
    )
    spec = REGISTRY["a03_intersect_except"]
    df = spec.fn(spark, sf)
    assert_matches(df, con, spec.oracle, "a03-dups")
    got = sorted((r["cohort"], r["c_custkey"]) for r in df.collect())
    assert got == [("both", 1), ("urgent_only", 2)], got


def test_x76_rolling_dau_24h_boundary(spark, tmp_path):
    """r12 probe wave 2: the trailing-24h window's boundary — a user
    active EXACTLY 23 hours before a target hour still counts
    (t-23 <= u), one at exactly 24 hours before does not (strict
    u > t-24); a user active twice in one hour counts once. The
    explode-based engine form and the inequality-join oracle must
    agree at the exact boundary."""
    import datetime as dt

    from duckdb_retail_pipeline_spark.queries import REGISTRY
    from tests.compare import assert_matches

    h = lambda k, m=0: (dt.datetime(2024, 1, 1, 0, 0) +  # noqa: E731
                        dt.timedelta(hours=k, minutes=m))
    rows = [
        (h(0), 100), (h(0, 30), 100),   # user 100 twice in hour 0
        (h(23), 200),                   # hour 23: user 200
        (h(24), 300),                   # hour 24: user 300
    ]
    sf, con = _probe_corpus(
        tmp_path, spark,
        {"events": (rows, "ts timestamp, user_id long")},
    )
    spec = REGISTRY["x76_rolling_distinct_users"]
    df = spec.fn(spark, sf)
    assert_matches(df, con, spec.oracle, "x76-boundary")
    got = {r["hour"].isoformat()[:13]: r["dau_24h"] for r in df.collect()}
    # hour 23: users 100 (active h0, exactly 23h back) + 200 -> 2
    # hour 24: users 200 + 300 (user 100's h0 is exactly 24h back -> out)
    assert got["2024-01-01T00"] == 1
    assert got["2024-01-01T23"] == 2
    assert got["2024-01-02T00"] == 2, got


def test_x43_range_join_interval_boundaries(spark, tmp_path):
    """r12 probe wave 2: the binned range join's half-open window
    semantics at exact boundaries — an interval ENDING exactly at
    the window start is included with ZERO overlap (e >= w), one
    STARTING exactly at the window end is excluded (s < w+1h
    strict), a single-event (zero-length) interval inside the
    window counts, and a multi-hour-spanning interval contributes
    the full hour. The explode-binned engine join and the
    inequality-join oracle must agree at every edge."""
    import datetime as dt

    from duckdb_retail_pipeline_spark.queries import REGISTRY
    from tests.compare import assert_matches

    t = lambda hh, mm=0, ss=0, us=0: dt.datetime(  # noqa: E731
        2024, 5, 1, hh, mm, ss, us
    )
    rows = [
        # the incident window: >=3 errors inside hour 10
        (t(10, 5), 999, "error"), (t(10, 10), 999, "error"),
        (t(10, 15), 999, "error"),
        # user 1: single event exactly at the window END -> excluded
        (t(11), 1, "view"),
        # user 2: single event exactly at the window START -> zero
        # overlap, still a pair
        (t(10), 2, "view"),
        # user 3: interval [09:30, 10:00] ends exactly at window
        # start -> included, overlap 0
        (t(9, 30), 3, "view"), (t(10), 3, "click"),
        # user 4: interval ends 1µs BEFORE the window -> excluded
        (t(9), 4, "view"), (t(9, 59, 59, 999999), 4, "view"),
        # user 5: spans the whole window -> full-hour overlap
        (t(9, 30), 5, "view"), (t(12, 30), 5, "view"),
    ]
    sf, con = _probe_corpus(
        tmp_path, spark,
        {"events": (rows, "ts timestamp, user_id long, event_type string")},
    )
    spec = REGISTRY["x43_range_join_binned"]
    df = spec.fn(spark, sf)
    assert_matches(df, con, spec.oracle, "x43-boundaries")
    row = df.collect()[0]
    # pairs: users 2, 3, 5 and the error user 999 (interval
    # [10:05, 10:15] sits inside its own window); users 1, 4 excluded
    assert row["n_pairs"] == 4 and row["n_users"] == 4, row
    # overlaps: 0 (u2) + 0 (u3) + 3600s (u5) + 600s (u999)
    assert row["total_overlap_us"] == (3600 + 600) * 1_000_000, row


def test_x71_fuzzy_match_threshold_and_tie_regimes(spark, tmp_path):
    """r12 probe wave 2: fuzzy matching at its decision edges — a
    decoy at Levenshtein distance EXACTLY 2 (inside the <= 2 cut,
    loses the (dist, key) order to the true distance-1 match but
    raises n_candidates), a decoy at distance 3 (outside), a
    distance TIE broken by the smaller key, and a short name (< 13
    chars) whose 'deletion' is a no-op — the dirty name equals the
    clean name at distance 0, and right(s,4)/substring(s,-4,4)
    agree on strings shorter than the block width."""
    from duckdb_retail_pipeline_spark.queries import REGISTRY
    from tests.compare import assert_matches

    # block key = last 4 chars; corruption deletes char 12
    rows = [
        # true entity (key 20 -> dirtied): name len > 13
        (20, "AcmeCorpXY12_BLK1"),
        # decoy in the same block at distance exactly 2 from the
        # dirty name "AcmeCorpXY1_BLK1"
        (3, "AcmeCorpXY34_BLK1"),
        # decoy at distance 3+ (still same block, filtered out)
        (5, "Zz9!CorpAB34_BLK1"),
        # tie pair: deleting char 12 (the underscore) of key 40's
        # name gives "TieNameAB1XBLK2"; clean 40 re-inserts the _,
        # clean 7 re-inserts an X — both Levenshtein 1, same block
        (40, "TieNameAB1X_BLK2"),
        (7, "TieNameAB1XXBLK2"),
        # short name (no 13th char): dirty == clean, distance 0
        (60, "Tiny_BLK3"),
    ]
    sf, con = _probe_corpus(
        tmp_path, spark,
        {"customer": (rows, "c_custkey long, c_name string")},
    )
    spec = REGISTRY["x71_fuzzy_entity_match"]
    df = spec.fn(spark, sf)
    assert_matches(df, con, spec.oracle, "x71-edges")
    got = {
        r["dirty_key"]: (r["matched_key"], r["distance"],
                         r["n_candidates"], r["is_true_match"])
        for r in df.collect()
    }
    # key 20: true match at distance 1 wins; the distance-2 decoy
    # (key 3) is a candidate; the distance-3+ one is not
    assert got[10000020] == (20, 1, 2, True), got
    # key 40: clean 40 ("...AB1X...") and clean 7 ("...AB1Y...") are
    # both distance 1 from the dirty "TieNameAB1_BLK2" -> tie broken
    # by the SMALLER key -> 7 wins, honest is_true_match=False
    assert got[10000040] == (7, 1, 2, False), got
    # key 60: no-op corruption -> exact self-match at distance 0
    assert got[10000060] == (60, 0, 1, True), got


def test_a02_a06_cube_with_null_valued_keys(spark, tmp_path):
    """r12 probe wave 3: CUBE/GROUPING SETS over data that CONTAINS
    NULL key values — the classic ambiguity where a data-NULL
    subtotal row is indistinguishable from a cube-generated rollup
    row without GROUPING(). Both engines emit both kinds of rows;
    the compare is multiset equality, so they must collide
    IDENTICALLY (a data-NULL group of n rows plus the rollup row
    over the same slice)."""
    from duckdb_retail_pipeline_spark.queries import REGISTRY
    from tests.compare import assert_matches

    import datetime as dt

    rows = [
        ("F", "1-URGENT", dt.datetime(2023, 1, 1)),
        ("F", None, dt.datetime(2023, 6, 1)),        # NULL priority
        (None, "1-URGENT", dt.datetime(2024, 1, 1)),  # NULL status
        (None, None, dt.datetime(2024, 6, 1)),        # both NULL
        ("O", "5-LOW", dt.datetime(2024, 1, 1)),
    ]
    sf, con = _probe_corpus(
        tmp_path, spark,
        {"orders": (rows,
                    "o_orderstatus string, o_orderpriority string, "
                    "o_orderdate timestamp")},
    )
    for name in ("a02_cube", "a06_grouping_sets_sql"):
        spec = REGISTRY[name]
        assert_matches(spec.fn(spark, sf), con, spec.oracle, f"{name}-nulls")
    # spot-check the collision shape: CUBE(2 keys) over 5 rows with
    # NULL keys -> the (NULL, NULL) cell appears as a DATA group (1)
    # AND as the grand total (5), plus NULL-key slices
    cells = [
        (r["status"], r["priority"], r["n_orders"])
        for r in REGISTRY["a02_cube"].fn(spark, sf).collect()
        if r["status"] is None and r["priority"] is None
    ]
    # data group (NULL,NULL)=1; status-NULL slice rollup = 2; priority-
    # NULL slice rollup = 2; grand total = 5
    assert sorted(c[2] for c in cells) == [1, 2, 2, 5], cells


@pytest.mark.slow  # tier-2 (r13 verdict #1): see conftest
def test_x74_apportionment_degenerate_masses(spark, tmp_path):
    """r12 probe wave 3: largest-remainder apportionment where the
    masses degenerate — a zero-token source (quota 0, can still win
    a remainder unit only if rem ties say so), a SINGLE source
    (quota = the whole budget, leftover 0), and the all-empty corpus
    (total 0: integer division by zero is NULL in BOTH engines —
    Spark's div and DuckDB's // agree — so allocations are NULL, not
    an error)."""
    from duckdb_retail_pipeline_spark.queries import REGISTRY
    from tests.compare import assert_matches

    spec = REGISTRY["x74_token_budget"]

    # regime 1: normal + zero-token source
    docs1 = [("a", "w1 w2 w3"), ("b", "w1 w2 w3 w4 w5 w6 w7"), ("z", "")]
    sf, con = _probe_corpus(
        tmp_path, spark, {"documents": (docs1, "source string, text string")}
    )
    df = spec.fn(spark, sf)
    assert_matches(df, con, spec.oracle, "x74-zero-source")
    got = {r["source"]: (r["quota"], r["final_alloc"]) for r in df.collect()}
    assert got["z"][0] == 0 and sum(v[1] for v in got.values()) == 100_000

    # regime 2: single source takes the whole budget exactly
    sf2, con2 = _probe_corpus(
        tmp_path, spark,
        {"documents": ([("only", "a b c d")], "source string, text string")},
    )
    df2 = spec.fn(spark, sf2)
    assert_matches(df2, con2, spec.oracle, "x74-single")
    assert df2.collect()[0]["final_alloc"] == 100_000

    # regime 3: all-empty corpus -> total 0 -> NULL allocations
    sf3, con3 = _probe_corpus(
        tmp_path, spark,
        {"documents": ([("e1", ""), ("e2", " ")], "source string, text string")},
    )
    df3 = spec.fn(spark, sf3)
    assert_matches(df3, con3, spec.oracle, "x74-empty")
    assert all(r["final_alloc"] is None for r in df3.collect())


def test_x80_transitions_single_event_users_and_ties(spark, tmp_path):
    """r12 probe wave 3: the transition matrix where the LEAD window
    degenerates — a corpus of ONLY single-event users produces an
    EMPTY matrix in both engines (no next event, the WHERE next IS
    NOT NULL drops everything), and same-microsecond events order by
    event_id (the tie-break that makes the chain deterministic);
    self-transitions count like any other."""
    import datetime as dt

    from duckdb_retail_pipeline_spark.queries import REGISTRY
    from tests.compare import assert_matches

    spec = REGISTRY["x80_event_transitions"]
    t0 = dt.datetime(2024, 2, 1, 8, 0)

    # regime 1: singletons only -> empty matrix, cross-engine
    ev1 = [(1, "view", t0, 10), (2, "click", t0, 20), (3, "purchase", t0, 30)]
    schema = "user_id long, event_type string, ts timestamp, event_id long"
    sf, con = _probe_corpus(tmp_path, spark, {"events": (ev1, schema)})
    df = spec.fn(spark, sf)
    assert_matches(df, con, spec.oracle, "x80-singletons")
    assert df.count() == 0

    # regime 2: one user, all four events at the SAME microsecond —
    # the chain is event_id order (1,2,4,9):
    # view->click->view->purchase
    ev2 = [
        (7, "view", t0, 4), (7, "click", t0, 2),
        (7, "view", t0, 1), (7, "purchase", t0, 9),
    ]
    sf2 = tmp_path / "p2"
    sf2.mkdir()
    import duckdb as _duckdb

    spark.createDataFrame(ev2, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{sf2}/events.parquet")
    con2 = _duckdb.connect()
    con2.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf2}/events.parquet/*.parquet'"
    )
    df2 = spec.fn(spark, str(sf2))
    assert_matches(df2, con2, spec.oracle, "x80-ties")
    got = {(r["from_type"], r["to_type"]): r["n"] for r in df2.collect()}
    assert got == {
        ("view", "click"): 1, ("click", "view"): 1, ("view", "purchase"): 1,
    }, got


def test_x63_fingerprint_canonicalization_cross_source(spark, tmp_path):
    """r12 probe wave 3: the cross-source dup report's fingerprint is
    the md5 of lowercased whitespace-canonical tokens — 'The  Cat'
    and 'the cat' (different case, run of spaces, trailing newline)
    must collide across sources; a natural cross-source dup under
    different doc_ids is reported; a same-source-only dup is NOT
    (HAVING n_sources >= 2)."""
    from duckdb_retail_pipeline_spark.queries import REGISTRY
    from tests.compare import assert_matches

    docs = [
        (1, "feed_a", "The  Cat\nsat"),
        (2, "feed_b", "the cat sat "),     # canonical twin, other source
        (3, "feed_a", "unique alpha"),
        (4, "feed_a", "dup same source"),
        (5, "feed_a", "dup same source"),  # same source only -> excluded
    ]
    sf, con = _probe_corpus(
        tmp_path, spark,
        {"documents": (docs, "doc_id long, source string, text string")},
    )
    spec = REGISTRY["x63_cross_source_dups"]
    df = spec.fn(spark, sf)
    assert_matches(df, con, spec.oracle, "x63-canon")
    rows = df.collect()
    # the canonical twin pair (plus doc 10-mirrors: none here since
    # no doc_id % 10 == 0 except... doc_ids 1-5 have none)
    assert len(rows) == 1 and rows[0]["n_docs"] == 2
    assert rows[0]["n_sources"] == 2
    assert (rows[0]["first_doc"], rows[0]["last_doc"]) == (1, 2)


@pytest.mark.slow  # tier-2 (r13 verdict #1): see conftest
def test_a12_array_agg_null_values_and_empty_set_group(spark, tmp_path):
    """r12 probe wave 3 (two real finds in one probe): (1) DuckDB's
    list(DISTINCT x) KEEPS NULL while Spark's collect_set drops it —
    a12's n_priorities diverged by one on NULL-priority data until
    the oracle gained FILTER (x IS NOT NULL); (2) a nation whose
    priorities are ALL NULL produces an EMPTY collected set, where
    ANSI element_at(arr, 1) THROWS — the builder now uses
    try_element_at (NULL, like DuckDB's ps[1] on an empty list)."""
    from duckdb_retail_pipeline_spark.queries import REGISTRY
    from tests.compare import assert_matches

    orders = [
        (1, "1-URGENT"), (1, None), (1, "5-LOW"),   # cust 1, nation A
        (2, None), (2, None),                       # cust 2, nation B: all NULL
        (3, "3-MEDIUM"),                            # cust 3, nation C
    ]
    customers = [(1, 10), (2, 20), (3, 30)]
    nations = [(10, "ALPHA"), (20, "BRAVO"), (30, "CHARLIE")]
    sf, con = _probe_corpus(
        tmp_path, spark,
        {
            "orders": (orders, "o_custkey long, o_orderpriority string"),
            "customer": (customers, "c_custkey long, c_nationkey int"),
            "nation": (nations, "n_nationkey int, n_name string"),
        },
    )
    spec = REGISTRY["a12_array_agg_surface"]
    df = spec.fn(spark, sf)
    assert_matches(df, con, spec.oracle, "a12-nulls")
    got = {r["nation"]: (r["priorities"], r["n_priorities"],
                         r["has_urgent"], r["first_priority"])
           for r in df.collect()}
    assert got["ALPHA"] == ("1-URGENT|5-LOW", 2, True, "1-URGENT")
    assert got["BRAVO"] == ("", 0, False, None)   # empty set, no crash
    assert got["CHARLIE"] == ("3-MEDIUM", 1, False, "3-MEDIUM")


def test_x67_rfm_fewer_customers_than_quintiles(spark, tmp_path):
    """r12 probe wave 3: NTILE(5) over FEWER rows than buckets (3
    customers) assigns buckets 1..3 identically in both engines, and
    full ties on every dimension (same day, same frequency, same
    spend) resolve by the custkey tie-break — the degenerate
    segmentation a tiny or heavily-filtered corpus produces."""
    import datetime as dt

    from duckdb_retail_pipeline_spark.queries import REGISTRY
    from tests.compare import assert_matches

    d = dt.datetime(2024, 4, 1)
    rows = [
        (101, d, 10.0),   # all three: same day, 1 order, same spend
        (102, d, 10.0),
        (103, d, 10.0),
    ]
    sf, con = _probe_corpus(
        tmp_path, spark,
        {"orders": (rows,
                    "o_custkey long, o_orderdate timestamp, "
                    "o_totalprice double")},
    )
    spec = REGISTRY["x67_rfm_segments"]
    df = spec.fn(spark, sf)
    assert_matches(df, con, spec.oracle, "x67-tiny")
    got = sorted(
        (r["r_q"], r["f_q"], r["m_q"], r["n_customers"]) for r in df.collect()
    )
    # custkey tie-break: customer 101 -> bucket 1 on every axis, etc.
    assert got == [(1, 1, 1, 1), (2, 2, 2, 1), (3, 3, 3, 1)], got


def test_a13_correlated_subqueries_null_and_empty_inner(spark, tmp_path):
    """r12 probe wave 4: EXISTS/NOT EXISTS decorrelation where the
    inner set degenerates — a customer with NO orders (EXISTS false,
    excluded), one with only NULL-priority orders (neither predicate
    matches, excluded), urgent+low (killed by NOT EXISTS), and the
    qualifying urgent-only customer whose scalar COUNT counts ALL
    their orders, not just the urgent ones."""
    from duckdb_retail_pipeline_spark.queries import REGISTRY
    from tests.compare import assert_matches

    customers = [(1, "keep"), (2, "both"), (3, "nullpri"), (4, "noorders")]
    orders = [
        (1, "1-URGENT"), (1, "3-MEDIUM"), (1, "3-MEDIUM"),
        (2, "1-URGENT"), (2, "5-LOW"),
        (3, None), (3, None),
    ]
    sf, con = _probe_corpus(
        tmp_path, spark,
        {
            "customer": (customers, "c_custkey long, c_name string"),
            "orders": (orders, "o_custkey long, o_orderpriority string"),
        },
    )
    spec = REGISTRY["a13_correlated_subqueries"]
    df = spec.fn(spark, sf)
    assert_matches(df, con, spec.oracle, "a13-degenerate")
    got = [(r["c_custkey"], r["n_orders"]) for r in df.collect()]
    assert got == [(1, 3)], got   # all 3 orders counted, not just urgent


def test_x49_profiling_null_columns_and_empty_table(spark, tmp_path):
    """r12 probe wave 4: the profiling report where metrics
    degenerate — an all-NULL column (min/max NULL, n_distinct 0 in
    BOTH engines: COUNT DISTINCT ignores NULLs) and the EMPTY table
    (n_rows 0, every min/max NULL) — the ingest-sanity regimes a
    broken upstream feed actually produces."""
    import datetime as dt

    from duckdb_retail_pipeline_spark.queries import REGISTRY
    from tests.compare import assert_matches

    spec = REGISTRY["x49_data_profiling"]
    schema = ("o_orderkey long, o_custkey long, o_totalprice double, "
              "o_orderdate timestamp, o_orderstatus string")

    rows = [
        (1, 10, None, dt.datetime(2024, 1, 1), "O"),
        (2, 10, None, dt.datetime(2024, 1, 2), None),
        (3, None, None, dt.datetime(2024, 1, 2), "F"),
    ]
    sf, con = _probe_corpus(tmp_path, spark, {"orders": (rows, schema)})
    df = spec.fn(spark, sf)
    assert_matches(df, con, spec.oracle, "x49-nulls")
    got = {r["col_name"]: (r["n_null"], r["n_distinct"], r["min_i"], r["max_i"])
           for r in df.collect()}
    assert got["o_totalprice"] == (3, 0, None, None)   # all-NULL column
    assert got["o_orderstatus"][0] == 1 and got["o_orderstatus"][1] == 2

    sf2 = tmp_path / "p_empty"
    sf2.mkdir()
    import duckdb as _duckdb

    spark.createDataFrame([], schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{sf2}/orders.parquet")
    con2 = _duckdb.connect()
    con2.execute(
        f"CREATE VIEW orders AS SELECT * FROM '{sf2}/orders.parquet/*.parquet'"
    )
    df2 = spec.fn(spark, str(sf2))
    assert_matches(df2, con2, spec.oracle, "x49-empty")
    assert all(
        (r["n_rows"], r["min_i"], r["max_i"]) == (0, None, None)
        for r in df2.collect()
    )


def test_x46_cohort_day_offsets_across_calendar_boundaries(spark, tmp_path):
    """r12 probe wave 4: day-1/day-7 return offsets that cross
    calendar edges — a Dec-31 cohort whose day-1 return is Jan 1 of
    the NEXT YEAR, and a Feb-28 leap-year cohort whose day-1 return
    is Feb 29 — plus a same-day-only user (zero retention) and a
    user whose day-1 AND day-7 both hit."""
    import datetime as dt

    from duckdb_retail_pipeline_spark.queries import REGISTRY
    from tests.compare import assert_matches

    t = lambda y, mo, d: dt.datetime(y, mo, d, 12, 0)  # noqa: E731
    rows = [
        # user 1: cohort 2023-12-31, returns 2024-01-01 (day 1)
        (t(2023, 12, 31), 1), (t(2024, 1, 1), 1),
        # user 2: cohort 2024-02-28 (leap), returns 02-29 and 03-06
        (t(2024, 2, 28), 2), (t(2024, 2, 29), 2), (t(2024, 3, 6), 2),
        # user 3: same-day-only
        (t(2024, 2, 28), 3), (t(2024, 2, 28, ), 3),
    ]
    sf, con = _probe_corpus(
        tmp_path, spark, {"events": (rows, "ts timestamp, user_id long")}
    )
    spec = REGISTRY["x46_cohort_retention"]
    df = spec.fn(spark, sf)
    assert_matches(df, con, spec.oracle, "x46-calendar")
    got = {str(r["cohort_day"]): (r["n_users"], r["n_day1"], r["n_day7"])
           for r in df.collect()}
    assert got["2023-12-31"] == (1, 1, 0)
    assert got["2024-02-28"] == (2, 1, 1), got   # leap day-1; day-7 = 03-06


def test_x41_sampling_strata_smaller_than_count(spark, tmp_path):
    """r12 probe wave 4: fixed-count stratified sampling where every
    stratum is SMALLER than the requested 50 — the sample is the
    whole stratum, and the md5 hash-order ranks must agree
    cross-engine down to the (md5, doc_id) tie-break (md5 of the
    decimal doc_id string is byte-identical in both engines)."""
    from duckdb_retail_pipeline_spark.queries import REGISTRY
    from tests.compare import assert_matches

    docs = [(1, "en"), (2, "en"), (3, "en"), (10, "fr"), (99, "zz")]
    sf, con = _probe_corpus(
        tmp_path, spark, {"documents": (docs, "doc_id long, lang string")}
    )
    spec = REGISTRY["x41_fixed_count_sample"]
    df = spec.fn(spark, sf)
    assert_matches(df, con, spec.oracle, "x41-tiny-strata")
    assert df.count() == 5               # every row sampled
    ranks = {r["doc_id"]: r["sample_rank"] for r in df.collect()}
    assert ranks[10] == 1 and ranks[99] == 1   # singleton strata rank 1


@pytest.mark.slow  # tier-2 (r13 verdict #1): see conftest
def test_x24_adversarial_null_pairs_and_degenerate_groups(spark, tmp_path):
    """r13 probe wave: x24's per-group OLS driven on regimes the
    driver corpus never hits — a nation with a SINGLE order (den=0 →
    NULL slope in both engines: DuckDB double x/0 is NULL, the
    engine pins den==0→None), a nation whose orders all share one
    date (den=0 at n>1), NULL totalprice / NULL orderdate rows
    (outside the fit: regr_* semantics — the r13 find was the
    oracle counting them in n while the engine dropped them), and a
    nation whose pairs are ALL NULL (no output row at all — the
    engine previously emitted a phantom n=0 row no SQL GROUP BY
    produces)."""
    import datetime as dt

    from duckdb_retail_pipeline_spark.queries import REGISTRY
    from tests.compare import assert_matches

    d = dt.date
    nations = [(0, "NORMAL"), (1, "SINGLE"), (2, "ONEDATE"),
               (3, "ALLNULL"), (4, "MIXED")]
    customers = [(10, 0), (11, 1), (12, 2), (13, 3), (14, 4)]
    orders = [
        # NORMAL: exact line y = 100 cents/day
        (10, d(2024, 1, 1), 1.00), (10, d(2024, 1, 2), 2.00),
        (10, d(2024, 1, 3), 3.00),
        # SINGLE: one order → den = 0
        (11, d(2024, 5, 5), 7.00),
        # ONEDATE: three orders, one date → den = 0 at n=3
        (12, d(2024, 6, 1), 1.00), (12, d(2024, 6, 1), 2.00),
        (12, d(2024, 6, 1), 3.00),
        # ALLNULL: every pair has a NULL side → nation absent
        (13, None, 9.00), (13, d(2024, 7, 1), None),
        # MIXED: two valid pairs + one NULL-price + one NULL-date
        (14, d(2024, 8, 1), 5.00), (14, d(2024, 8, 3), 5.00),
        (14, None, 1.00), (14, d(2024, 8, 9), None),
    ]
    sf, con = _probe_corpus(
        tmp_path, spark,
        {
            "nation": (nations, "n_nationkey int, n_name string"),
            "customer": (customers, "c_custkey long, c_nationkey int"),
            "orders": (orders,
                       "o_custkey long, o_orderdate date, "
                       "o_totalprice double"),
        },
    )
    spec = REGISTRY["x24_grouped_ols_trend"]
    df = spec.fn(spark, sf)
    assert_matches(df, con, spec.oracle, "x24-probe")
    got = {r["nation"]: (r["n"], r["slope"]) for r in df.collect()}
    assert got["NORMAL"] == (3, 1.0)
    assert got["SINGLE"] == (1, None)
    assert got["ONEDATE"] == (3, None)
    assert got["MIXED"] == (2, 0.0)
    assert "ALLNULL" not in got


def test_x16_x30_adversarial_malformed_json(spark, tmp_path):
    """r13 probe wave (the x74/a12 class — two REAL finds): (a)
    x16's ANSI cast of a non-numeric $.k THREW the engine and
    DuckDB's json_extract_string ERRORS on malformed JSON — one
    dirty props row killed both sides of a corpus job; extraction
    is now TRY-semantics end-to-end (engine try_cast; oracle
    json_valid gate + an integer-literal regexp that mirrors Spark
    try_cast's domain — bare TRY_CAST would ROUND '7.5' to 8 where
    Spark yields NULL). (b) x30's parse_json likewise THREW on
    malformed props (ANSI-independent); now try_parse_json → NULL
    variant, with the oracle replaying try_variant_get's bigint
    coercion branch by branch (decimal literals TRUNCATE: 7.5→7,
    "7"→7, "abc"→NULL)."""
    from duckdb_retail_pipeline_spark.queries import REGISTRY
    from tests.compare import assert_matches

    import datetime as dt

    ts = dt.datetime(2024, 1, 1, 10, 0)
    events = [
        (1, ts, "click", '{"k": 7}', 1.0),
        (2, ts, "click", '{"k": -3}', 1.0),
        (3, ts, "click", '{"k": "abc"}', 1.0),     # non-numeric k
        (4, ts, "click", '{bad json', 1.0),        # malformed
        (5, ts, "view", "", 1.0),                  # empty string
        (6, ts, "view", None, 1.0),                # NULL props
        (7, ts, "view", '{"j": 1}', 1.0),          # key missing
        (8, ts, "view", '{"k": null}', 1.0),       # JSON null
        (9, ts, "buy", '{"k": "7"}', 1.0),         # numeric STRING
        (10, ts, "buy", '{"k": 7.5}', 1.0),        # decimal → trunc 7
        (11, ts, "buy", '{"k": -7.5}', 1.0),       # trunc toward zero
    ]
    sf, con = _probe_corpus(
        tmp_path, spark,
        {"events": (events,
                    "event_id long, ts timestamp, event_type string, "
                    "props string, value double")},
    )
    for name in ("x16_events_json_extract", "x30_variant_extract"):
        spec = REGISTRY[name]
        assert_matches(spec.fn(spark, sf), con, spec.oracle, f"{name}-probe")

    x30 = {r["event_id"]: (r["k"], r["k_missing"], r["k_mod"])
           for r in REGISTRY["x30_variant_extract"].fn(spark, sf).collect()}
    assert x30[1] == (7, False, 0)
    assert x30[2] == (-3, False, -3)
    for eid in (3, 4, 5, 6, 7, 8):
        assert x30[eid] == (None, True, None), eid
    assert x30[9] == (7, False, 0)
    assert x30[10] == (7, False, 0)
    assert x30[11] == (-7, False, 0)

    x16 = {r["event_type"]: (r["total_k"], r["n"])
           for r in REGISTRY["x16_events_json_extract"].fn(spark, sf).collect()}
    # click: 7 + (-3) + NULL("abc") + NULL(malformed); buy: only the
    # integer-STRING "7" counts under try_cast (7.5 is NULL for the
    # string path — the get_json_object surface, unlike x30's typed
    # variant coercion)
    assert x16["click"] == (4, 4)
    assert x16["view"] == (None, 4)
    assert x16["buy"] == (7, 3)


def test_x15_x21_adversarial_subsecond_boundaries(spark, tmp_path):
    """r13 probe wave: sessionization on SUB-SECOND timestamps — the
    regime both session queries' docstrings called latent. The two
    registered queries pin two deliberate conventions: x15
    (lag+cumsum) floors epoch seconds on BOTH sides (engine and
    oracle — windows.py review note), so a 1800.5 s gap still
    merges; x21 (native session_window) tracks REAL microsecond
    time, so the same gap splits — its oracle previously floored
    too, which the probe exposed (r13 fix: epoch_us). Exact-boundary
    (= gap), boundary+0.5 s, same-microsecond duplicates, 1 µs
    apart, and singleton users, differentially verified for both
    queries."""
    import datetime as dt

    from duckdb_retail_pipeline_spark.queries import REGISTRY
    from tests.compare import assert_matches

    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)
    us = dt.timedelta(microseconds=1)
    s = dt.timedelta(seconds=1)
    e2 = t0 + 1800 * s                      # exactly the gap → merge both
    e3 = e2 + 1800 * s + 500000 * us        # +1800.5s: x15 merge, x21 split
    u2a = t0
    u2b = t0 + us                           # 1 µs apart → merge
    u2c = u2b + 1801 * s                    # split in both
    events = [
        (1, 1, t0), (2, 1, e2), (3, 1, e3),
        (4, 2, u2a), (5, 2, u2b), (6, 2, u2c),
        (7, 3, t0),                          # singleton
        (8, 4, t0), (9, 4, t0),              # same-µs duplicates
    ]
    sf, con = _probe_corpus(
        tmp_path, spark,
        {"events": (events, "event_id long, user_id long, ts timestamp")},
    )
    for name in ("x15_events_sessionize", "x21_session_window_batch"):
        spec = REGISTRY[name]
        assert_matches(spec.fn(spark, sf), con, spec.oracle, f"{name}-probe")

    x15 = sorted(
        (r["user_id"], r["n_events"])
        for r in REGISTRY["x15_events_sessionize"].fn(spark, sf).collect()
    )
    # x15: floored-seconds convention merges user 1 into ONE session
    assert x15 == [(1, 3), (2, 2), (2, 1), (3, 1), (4, 2)] or \
        x15 == sorted([(1, 3), (2, 2), (2, 1), (3, 1), (4, 2)])
    x21 = sorted(
        (r["user_id"], r["n_events"])
        for r in REGISTRY["x21_session_window_batch"].fn(spark, sf).collect()
    )
    # x21: real-time convention splits user 1's 1800.5 s gap
    assert x21 == sorted([(1, 2), (1, 1), (2, 2), (2, 1), (3, 1), (4, 2)])


def test_x02_x03_x04_adversarial_degenerate_documents(spark, tmp_path):
    """r13 probe wave: the text-analysis trio on documents the
    synthetic corpus never contains — empty text, whitespace-only,
    punctuation-only, digits-only, unicode letters (non-ASCII is
    NOT [A-Za-z]: alpha_ratio counts only ASCII letters in both
    engines), a NULL text, and the language-marker TIE regimes
    ('la' is a marker for BOTH fr and es → alphabetical tie-break
    'es'; 'der the' ties de/en → 'de'). Pins zero-token
    floor-ratios (NULL via the nullif guard, never a div-by-zero
    throw) and NULL-text propagation."""
    from duckdb_retail_pipeline_spark.queries import REGISTRY
    from tests.compare import assert_matches

    docs = [
        (1, "", "en", "synthetic", 0),
        (2, "   ", "en", "synthetic", 3),
        (3, "!!! ???", "en", "synthetic", 7),
        (4, "123 456 123", "en", "synthetic", 11),
        (5, "héllo wörld", "de", "synthetic", 11),
        (6, None, "en", "synthetic", 0),
        (7, "la", "fr", "synthetic", 2),            # fr/es tie → es
        (8, "der the", "de", "synthetic", 7),       # de/en tie → de
        (9, "the the the of", "en", "synthetic", 14),
    ]
    sf, con = _probe_corpus(
        tmp_path, spark,
        {"documents": (docs,
                       "doc_id long, text string, lang string, "
                       "source string, n_chars long")},
    )
    for name in ("x02_text_stats", "x03_lang_id", "x04_fingerprint"):
        spec = REGISTRY[name]
        assert_matches(spec.fn(spark, sf), con, spec.oracle, f"{name}-probe")

    x03 = {r["doc_id"]: r["predicted_lang"]
           for r in REGISTRY["x03_lang_id"].fn(spark, sf).collect()}
    assert x03[1] == "und" and x03[3] == "und" and x03[4] == "und"
    assert x03[7] == "es" and x03[8] == "de" and x03[9] == "en"

    x02 = {r["doc_id"]: (r["n_tokens"], r["alpha_ratio"], r["mean_wordlen"])
           for r in REGISTRY["x02_text_stats"].fn(spark, sf).collect()}
    # zero tokens → NULL ratios through the nullif guard, not a
    # div-by-zero ANSI throw
    assert x02[1][0] == 0 and x02[1][2] is None
    assert x02[2][0] == 0 and x02[2][2] is None
    # unicode letters are outside [A-Za-z]: 8 ASCII of 11 chars
    assert x02[5] == (2, 0.7272, 5.5)


def test_x27_adversarial_chunk_boundaries(spark, tmp_path):
    """r13 probe wave: chunking (128-token chunks, 32 overlap,
    stride 96) on the boundary docs the synthetic corpus never
    hits — empty text, whitespace-only, a single token, exactly one
    stride (96), one chunk exactly (128), one token past a chunk
    (129 → the second start at 96 since 96+32 < 129), exactly two
    strides (224 = last start 96: start 192 would satisfy
    192+32 ≥ 224 — the r11 pure-suffix bound), 225 tokens (start
    192 survives), and NULL text."""
    from duckdb_retail_pipeline_spark.queries import REGISTRY
    from tests.compare import assert_matches

    def words(n):
        return " ".join(f"w{i}" for i in range(n))

    docs = [
        (1, "", "en", "s", 0),
        (2, "   ", "en", "s", 3),
        (3, "solo", "en", "s", 4),
        (4, words(96), "en", "s", 0),
        (5, words(128), "en", "s", 0),
        (6, words(129), "en", "s", 0),
        (7, words(224), "en", "s", 0),
        (8, words(225), "en", "s", 0),
        (9, None, "en", "s", 0),
    ]
    sf, con = _probe_corpus(
        tmp_path, spark,
        {"documents": (docs,
                       "doc_id long, text string, lang string, "
                       "source string, n_chars long")},
    )
    spec = REGISTRY["x27_text_chunking"]
    df = spec.fn(spark, sf)
    assert_matches(df, con, spec.oracle, "x27-probe")
    got = {}
    for r in df.collect():
        got.setdefault(r["doc_id"], []).append(
            (r["chunk_start"], r["n_chunk_tokens"])
        )
    for k in got:
        got[k].sort()
    assert got[3] == [(0, 1)]
    assert got[4] == [(0, 96)]
    assert got[5] == [(0, 128)]
    assert got[6] == [(0, 128), (96, 33)]
    assert got[7] == [(0, 128), (96, 128)]          # no pure-suffix start
    assert got[8] == [(0, 128), (96, 128), (192, 33)]
    # degenerate docs keep the >=1-row bookkeeping contract: empty /
    # whitespace-only -> one EMPTY chunk ('' in both engines, the
    # oracle COALESCE pin); NULL text -> one (0, NULL, NULL) row
    chunks = {(r["doc_id"], r["chunk_start"]): (r["chunk"], r["n_chunk_tokens"])
              for r in df.collect()}
    assert chunks[(1, 0)] == ("", 0)
    assert chunks[(2, 0)] == ("", 0)
    assert chunks[(9, 0)] == (None, None)


def test_x35_adversarial_single_key_skew(spark, tmp_path):
    """r13 probe wave 4: the salted two-phase aggregation on the
    corpus shape it exists for — EVERY row on ONE key (maximum skew:
    all 40 rows fan out across the 16 salts and must recombine
    exactly), plus a singleton key, zero values, negatives, and
    half-cent boundaries (the money convention rounds BEFORE
    salting, so the total is exact under any salt assignment)."""
    import datetime as dt

    from duckdb_retail_pipeline_spark.queries import REGISTRY
    from tests.compare import assert_matches

    ts = dt.datetime(2024, 1, 1, 10, 0)
    events = [
        (i, ts, "hot", f'{{"k": {i}}}', v, 100 + i)
        for i, v in enumerate(
            [1.005, -2.345, 0.0, 99.999, -0.005] * 8
        )
    ] + [(1000, ts, "solo", '{"k": 1}', 7.77, 9)]
    sf, con = _probe_corpus(
        tmp_path, spark,
        {"events": (events,
                    "event_id long, ts timestamp, event_type string, "
                    "props string, value double, user_id long")},
    )
    spec = REGISTRY["x35_salted_agg"]
    df = spec.fn(spark, sf)
    assert_matches(df, con, spec.oracle, "x35-probe")
    got = {r["event_type"]: (r["n_events"], r["total_value"])
           for r in df.collect()}
    assert got["hot"][0] == 40
    assert got["solo"] == (1, 7.77)


def test_x37_adversarial_quantization_edges(spark, tmp_path):
    """r13 probe wave 4: absmax int8 quantization on the edge
    vectors — an all-zero vector (absmax 0: the guarded branch must
    emit scale 0 and all-zero codes, not a 0/0 NaN), a vector whose
    components land EXACTLY on half-bin boundaries (63.5/127 scale
    1 → floor(63.5+0.5) = 64 in identical double arithmetic on both
    engines), all-negative vectors (absmax is over |v|), and a
    single dominant component with tiny tails."""
    from duckdb_retail_pipeline_spark.queries import REGISTRY
    from tests.compare import assert_matches

    vecs = [
        (0, [0.0, 0.0, 0.0, 0.0], 0),
        (1, [127.0, 63.5, -63.5, 0.0], 0),
        (2, [-1.0, -2.0, -4.0, -8.0], 0),
        (3, [1000.0, 0.001, -0.001, 0.5], 0),
        (4, [1.0, 1.0, 1.0, 1.0], 0),
    ]
    sf, con = _probe_corpus(
        tmp_path, spark,
        {"embeddings": (vecs,
                        "vec_id long, embedding array<float>, label int")},
    )
    spec = REGISTRY["x37_embedding_quantization"]
    df = spec.fn(spark, sf)
    assert_matches(df, con, spec.oracle, "x37-probe")
    got = {r["vec_id"]: (r["scale"], r["q_l1"]) for r in df.collect()}
    assert got[0] == (0.0, 0)
    # vec 1: scale 1.0; q = [127, 64, -63, 0] — floor(x+0.5) sends
    # halves toward +inf on BOTH signs (-63.5 → -63), identically in
    # both engines; never banker's, never round-half-away
    assert got[1] == (1.0, 254)


def test_x39_adversarial_duplicate_and_zero_vectors(spark, tmp_path):
    """r13 probe wave 4: exact batch top-k under ties and NULL
    cosines — corpus rows DUPLICATING the query vector (cosine
    exactly 1.0, tie-broken by vec_id ASC in both engines), two
    identical non-query vectors (tied cosine), and a ZERO corpus
    vector (NULL cosine via the nullif guard: both engines sort
    NULLS LAST under DESC, so it enters the top-3 only when fewer
    than 3 real candidates exist)."""
    from duckdb_retail_pipeline_spark.queries import REGISTRY
    from tests.compare import assert_matches

    vecs = [
        (0, [1.0, 0.0, 0.0, 0.0], 0),      # the query (vec_id % 500 == 0)
        (1, [1.0, 0.0, 0.0, 0.0], 0),      # duplicate of the query
        (2, [2.0, 0.0, 0.0, 0.0], 0),      # same direction (cos 1.0)
        (3, [0.6, 0.8, 0.0, 0.0], 0),      # cos 0.6
        (4, [0.6, 0.8, 0.0, 0.0], 0),      # tied with 3
        (5, [0.0, 0.0, 0.0, 0.0], 0),      # zero vector -> NULL cosine
    ]
    sf, con = _probe_corpus(
        tmp_path, spark,
        {"embeddings": (vecs,
                        "vec_id long, embedding array<float>, label int")},
    )
    spec = REGISTRY["x39_similarity_batch_topk"]
    df = spec.fn(spark, sf)
    assert_matches(df, con, spec.oracle, "x39-probe")
    got = [(r["vec_id"], r["cosine"]) for r in
           sorted(df.collect(), key=lambda r: r["rnk"])]
    # ties at cosine 1.0 resolve by vec_id ASC: 1, 2, then 3 (0.6)
    assert got == [(1, 1.0), (2, 1.0), (3, 0.6)]


def test_x75_adversarial_rollup_boundaries(spark, tmp_path):
    """r13 probe wave 4: the three-level hypertable rollup on
    boundary corpora — a SINGLE-instant corpus (one hour, one day,
    one month: n_hours must be exactly 1 through the whole chain),
    events 1 µs either side of a month boundary (23:59:59.999999
    truncates to the OLD month's last hour; 00:00:00.000000 opens
    the new month), sub-second spreads inside one hour (hour-trunc
    dedup), and a gap-only series (two events months apart — no
    intermediate rows are invented)."""
    import datetime as dt

    from duckdb_retail_pipeline_spark.queries import REGISTRY
    from tests.compare import assert_matches

    D = dt.datetime
    events = [
        # single-instant cluster: 3 events, same microsecond
        (1, D(2024, 3, 15, 12, 0, 0), "a", None, 1.0, 1),
        (2, D(2024, 3, 15, 12, 0, 0), "a", None, 2.0, 1),
        (3, D(2024, 3, 15, 12, 0, 0), "a", None, 3.0, 1),
        # month boundary: 1 µs before April vs exactly April
        (4, D(2024, 3, 31, 23, 59, 59, 999999), "b", None, 10.0, 2),
        (5, D(2024, 4, 1, 0, 0, 0), "b", None, 20.0, 2),
        # sub-second spread within one hour: one hour-bucket
        (6, D(2024, 5, 2, 8, 0, 0, 1), "c", None, 1.5, 3),
        (7, D(2024, 5, 2, 8, 59, 59, 999999), "c", None, 2.5, 3),
        # gap-only series: two isolated months
        (8, D(2024, 1, 1, 0, 0, 0), "d", None, 5.0, 4),
        (9, D(2024, 7, 1, 0, 0, 0), "d", None, 5.0, 4),
    ]
    sf, con = _probe_corpus(
        tmp_path, spark,
        {"events": (events,
                    "event_id long, ts timestamp, event_type string, "
                    "props string, value double, user_id long")},
    )
    spec = REGISTRY["x75_hypertable_rollup"]
    df = spec.fn(spark, sf)
    assert_matches(df, con, spec.oracle, "x75-probe")
    got = {(str(r["month"]), r["event_type"]): (r["n_events"], r["n_hours"])
           for r in df.collect()}
    assert got[("2024-03-01", "a")] == (3, 1)
    assert got[("2024-03-01", "b")] == (1, 1)
    assert got[("2024-04-01", "b")] == (1, 1)
    assert got[("2024-05-01", "c")] == (2, 1)
    assert got[("2024-01-01", "d")] == (1, 1)
    assert got[("2024-07-01", "d")] == (1, 1)


@pytest.mark.slow  # tier-2 (r13 verdict #1): see conftest
def test_pl_layer_adversarial_all_sentinel_corpus(spark, tmp_path):
    """r13 probe wave 4: the ENTIRE pipeline DAG on a corpus the P3
    cleaning filters to NOTHING — every l_orderkey is a multiple of
    97, so every staged stock_code is the 'nan' sentinel: dim_product
    must be EMPTY, fct_sales must be EMPTY, and every layer built
    from an empty fact (the fx forward-fill spine whose bounds
    aggregate over zero rows, the EUR enrichment, the country-day
    agg, the monthly view) must come out EMPTY WITH THE CONTRACTED
    SCHEMA in both engines — never a crash from sequence(NULL, NULL)
    or an aggregation over an empty spine. dim_customer keeps its
    cleaning-independent rows (the -1 UNKNOWN surrogate for NULL
    customers); dim_calendar spines off raw (pre-cleaning) bounds so
    it stays dense."""
    import datetime as dt

    from duckdb_retail_pipeline_spark.queries import REGISTRY
    from tests.compare import assert_matches

    D = dt.datetime
    # orderkeys: multiples of 97 (every stock_code -> 'nan'); customer
    # keys include a %5==0 (NULL customer path)
    lineitem = [
        (97, 1, 1, 1, 5.0, 500.0, 0.0, 0.0, "N", "O", D(2024, 1, 10)),
        (194, 2, 1, 1, 3.0, 300.0, 0.0, 0.0, "R", "F", D(2024, 2, 20)),
        (291, 3, 1, 1, 7.0, 700.0, 0.0, 0.0, "N", "O", D(2024, 3, 5)),
    ]
    orders = [
        (97, 5, "O", 500.0, D(2024, 1, 9), "1-URGENT"),
        (194, 7, "F", 300.0, D(2024, 2, 19), "2-HIGH"),
        (291, 10, "O", 700.0, D(2024, 3, 4), "3-MEDIUM"),
    ]
    customer = [(5, "C5", 0, 10.0, "BUILDING"),
                (7, "C7", 1, 20.0, "AUTOMOBILE"),
                (10, "C10", 0, 30.0, "MACHINERY")]
    nation = [(0, "FRANCE", 1), (1, "GERMANY", 1)]
    part = [(1, "blue part", "B1", "T", 1, 10.0),
            (2, "red part", "B2", "T", 2, 20.0),
            (3, "green part", "B3", "T", 3, 30.0)]
    sf, con = _probe_corpus(
        tmp_path, spark,
        {
            "lineitem": (lineitem,
                         "l_orderkey long, l_partkey long, l_suppkey long, "
                         "l_linenumber int, l_quantity double, "
                         "l_extendedprice double, l_discount double, "
                         "l_tax double, l_returnflag string, "
                         "l_linestatus string, l_shipdate timestamp"),
            "orders": (orders,
                       "o_orderkey long, o_custkey long, "
                       "o_orderstatus string, o_totalprice double, "
                       "o_orderdate timestamp, o_orderpriority string"),
            "customer": (customer,
                         "c_custkey long, c_name string, c_nationkey int, "
                         "c_acctbal double, c_mktsegment string"),
            "nation": (nation, "n_nationkey int, n_name string, "
                               "n_regionkey int"),
            "part": (part, "p_partkey long, p_name string, p_brand string, "
                           "p_type string, p_size int, p_retailprice double"),
        },
    )
    for name in ("pl01_staging_retail", "pl02_staging_fx",
                 "pl03_dim_calendar", "pl04_dim_product",
                 "pl05_dim_customer", "pl06_fct_sales",
                 "pl07_daily_fx_rates", "pl08_fct_sales_eur",
                 "pl09_agg_country_day",
                 "pl10_monthly_sales_summary", "pl11_validation"):
        spec = REGISTRY[name]
        assert_matches(spec.fn(spark, sf), con, spec.oracle, f"{name}-probe")

    assert REGISTRY["pl04_dim_product"].fn(spark, sf).count() == 0
    assert REGISTRY["pl06_fct_sales"].fn(spark, sf).count() == 0
    # staging kept all three raw rows (cleaning happens downstream)
    assert REGISTRY["pl01_staging_retail"].fn(spark, sf).count() == 3


def test_x06_x08_x22_x41_adversarial_degenerate_corpus(spark, tmp_path):
    """r13 probe wave 5: the signature/frequency/sampling family on
    a corpus of degenerate documents — fewer tokens than the
    3-shingle window (MinHash over an EMPTY hash set), empty and
    whitespace-only text (SimHash over zero bit-votes), a language
    stratum with a SINGLE doc and a request (50) far exceeding every
    stratum (x41 must return min(50, |stratum|) rows, never pad or
    throw), and term frequency where a language's vocabulary is
    smaller than the top-10 window."""
    from duckdb_retail_pipeline_spark.queries import REGISTRY
    from tests.compare import assert_matches

    docs = [
        (1, "", "en", "s", 0),                  # zero tokens
        (2, "one", "en", "s", 3),               # below shingle window
        (3, "one two", "en", "s", 7),           # still below (needs 3)
        (4, "one two three", "en", "s", 13),    # exactly one shingle
        (5, "a b c d", "fr", "s", 7),           # singleton stratum
        (6, "x x x y", "de", "s", 7),           # vocab (2) < top-10
        (7, "   ", "de", "s", 3),               # whitespace-only
    ]
    sf, con = _probe_corpus(
        tmp_path, spark,
        {"documents": (docs,
                       "doc_id long, text string, lang string, "
                       "source string, n_chars long")},
    )
    for name in ("x06_minhash_signatures", "x08_simhash_values",
                 "x22_term_frequency", "x41_fixed_count_sample"):
        spec = REGISTRY[name]
        assert_matches(spec.fn(spark, sf), con, spec.oracle, f"{name}-probe")

    x41 = REGISTRY["x41_fixed_count_sample"].fn(spark, sf).collect()
    assert len(x41) == 7                          # every doc sampled
    by_lang = {}
    for r in x41:
        by_lang.setdefault(r["lang"], []).append(r["sample_rank"])
    assert sorted(by_lang["fr"]) == [1]
    assert sorted(by_lang["en"]) == [1, 2, 3, 4]

    x22 = [(r["lang"], r["token"], r["n"])
           for r in REGISTRY["x22_term_frequency"].fn(spark, sf).collect()
           if r["lang"] == "de"]
    assert sorted(x22) == [("de", "x", 3), ("de", "y", 1)]


@pytest.mark.slow  # tier-2 (r13 verdict #1): see conftest
def test_streaming_adversarial_boundaries_and_dirty_docs(spark, tmp_path):
    """r13 probe wave 5 (streaming): the streaming queries on an
    engineered corpus — events OUT OF ORDER within the watermark,
    same-microsecond duplicates, rows exactly ON an hour boundary,
    a type seen in a single micro-instant (x17 tumbling windows +
    x31 stateful totals + x38 stream-static cohort join, each
    oracle-checked against its batch SQL twin), and x34's streaming
    dedup over documents containing exact duplicates, an EMPTY doc,
    a whitespace-only doc (same zero-token fingerprint md5('') —
    ONE survivor for both), and a NULL-text doc (NULL fingerprint
    under the r13 isolation — its own dedup key in both engines)."""
    import datetime as dt

    from duckdb_retail_pipeline_spark.queries import REGISTRY
    from tests.compare import assert_matches

    D = dt.datetime
    events = [
        # hour boundary: exactly 11:00:00 belongs to the 11:00 window
        (1, D(2024, 1, 1, 10, 59, 59, 999999), "a", None, 1.0, 1),
        (2, D(2024, 1, 1, 11, 0, 0), "a", None, 2.0, 1),
        # out-of-order arrival (file order != event order)
        (3, D(2024, 1, 1, 11, 30, 0), "a", None, 4.0, 2),
        (4, D(2024, 1, 1, 11, 5, 0), "a", None, 8.0, 2),
        # same-microsecond duplicates (distinct event ids)
        (5, D(2024, 1, 1, 12, 0, 0), "b", None, 1.5, 3),
        (6, D(2024, 1, 1, 12, 0, 0), "b", None, 1.5, 3),
        # singleton type
        (7, D(2024, 1, 1, 13, 7, 7), "c", None, -9.99, 4),
    ]
    docs = [
        (1, "same text", "en", "s", 9),
        (2, "same  text", "en", "s", 10),      # ws-normalized duplicate
        (3, "other", "en", "s", 5),
        (4, "", "en", "s", 0),                 # zero-token: md5('')
        (5, "   ", "en", "s", 3),              # same zero-token key
        (6, None, "en", "s", 0),               # NULL fingerprint
    ]
    sf, con = _probe_corpus(
        tmp_path, spark,
        {
            "events": (events,
                       "event_id long, ts timestamp, event_type string, "
                       "props string, value double, user_id long"),
            "documents": (docs,
                          "doc_id long, text string, lang string, "
                          "source string, n_chars long"),
        },
    )
    for name in ("x17_streaming_hourly", "x31_streaming_stateful_totals",
                 "x38_stream_static_join", "x34_streaming_dedup"):
        spec = REGISTRY[name]
        assert_matches(spec.fn(spark, sf), con, spec.oracle, f"{name}-probe")

    x17 = {(str(r["window_start"]), r["event_type"]): r["n_events"]
           for r in REGISTRY["x17_streaming_hourly"].fn(spark, sf).collect()}
    assert x17[("2024-01-01 10:00:00", "a")] == 1
    assert x17[("2024-01-01 11:00:00", "a")] == 3
    assert x17[("2024-01-01 12:00:00", "b")] == 2

    fps = [r["fp"] for r in
           REGISTRY["x34_streaming_dedup"].fn(spark, sf).collect()]
    # 4 distinct fingerprints: "same text", "other", md5('') (docs
    # 4+5 collapse), and the NULL key (doc 6)
    assert len(fps) == 4 and fps.count(None) == 1


@pytest.mark.slow  # tier-2 (r13 verdict #1): see conftest
def test_pivot_and_split_adversarial_sparse_categories(spark, tmp_path):
    """r13 probe wave 5: the reshape/split family on sparse
    categories — x18's pivot where users carry only SOME of the
    pinned event types (absent cells must coalesce to 0 like SQL
    COUNT, the documented NULL edge), an event type OUTSIDE the
    pinned value list (dropped by pivot AND by the oracle's CASE
    columns — a user with ONLY that type still gets an all-zero
    row), a17's region pivot where a year has orders in a single
    region (the other region columns NULL in both engines' money
    sums), and x29's rate-based split on singleton strata plus a
    language outside its CASE list (kept at 100%)."""
    import datetime as dt

    from duckdb_retail_pipeline_spark.queries import REGISTRY
    from tests.compare import assert_matches

    D = dt.datetime
    events = [
        (1, D(2024, 1, 1, 10, 0), "click", None, 1.0, 1),
        (2, D(2024, 1, 1, 10, 1), "click", None, 1.0, 1),
        (3, D(2024, 1, 1, 10, 2), "view", None, 1.0, 2),
        (4, D(2024, 1, 1, 10, 3), "refund", None, 1.0, 3),  # unseen type
        (5, D(2024, 1, 1, 10, 4), "error", None, 1.0, 4),
    ]
    orders = [
        (1, 5, "O", 100.0, D(2023, 6, 1), "1-URGENT"),   # 2023: only EUROPE
        (2, 7, "O", 250.0, D(2024, 6, 1), "2-HIGH"),     # 2024: both regions
        (3, 5, "O", 50.005, D(2024, 7, 1), "3-MEDIUM"),  # half-cent boundary
    ]
    customer = [(5, "C5", 0, 1.0, "B"), (7, "C7", 1, 2.0, "A")]
    nation = [(0, "FRANCE", 0), (1, "BRAZIL", 1)]
    region = [(0, "EUROPE"), (1, "AMERICA")]
    docs = [
        (1, "hello", "en", "s", 5),      # en: 50% kept by hash bucket
        (2, "welt", "de", "s", 4),       # de: outside CASE -> kept
        (3, "monde", "fr", "s", 5),      # singleton stratum
    ]
    sf, con = _probe_corpus(
        tmp_path, spark,
        {
            "events": (events,
                       "event_id long, ts timestamp, event_type string, "
                       "props string, value double, user_id long"),
            "orders": (orders,
                       "o_orderkey long, o_custkey long, "
                       "o_orderstatus string, o_totalprice double, "
                       "o_orderdate timestamp, o_orderpriority string"),
            "customer": (customer,
                         "c_custkey long, c_name string, c_nationkey int, "
                         "c_acctbal double, c_mktsegment string"),
            "nation": (nation, "n_nationkey int, n_name string, "
                               "n_regionkey int"),
            "region": (region, "r_regionkey int, r_name string"),
            "documents": (docs,
                          "doc_id long, text string, lang string, "
                          "source string, n_chars long"),
        },
    )
    for name in ("x18_events_pivot", "a17_pivot_surface",
                 "x29_stratified_split"):
        spec = REGISTRY[name]
        assert_matches(spec.fn(spark, sf), con, spec.oracle, f"{name}-probe")

    x18 = {r["user_id"]: (r["click"], r["view"], r["error"])
           for r in REGISTRY["x18_events_pivot"].fn(spark, sf).collect()}
    assert x18[1] == (2, 0, 0)
    assert x18[3] == (0, 0, 0)       # only the unseen type: all-zero row
    assert x18[4] == (0, 0, 1)

    x29 = {r["doc_id"]: r["split"]
           for r in REGISTRY["x29_stratified_split"].fn(spark, sf).collect()}
    assert 2 in x29 and 3 in x29     # de (outside CASE) and fr kept


def test_x43_adversarial_interval_endpoints(spark, tmp_path):
    """r13 probe wave 6: the binned range join at EXACT interval
    endpoints — an interval ending precisely at a window's start
    (e == w: inclusive, a zero-microsecond overlap pair), one
    starting precisely at the window's end (s == w+1h: excluded by
    the strict <), a zero-length interval (single event) inside the
    window, a 1 µs overlap, an incident hour with exactly
    MIN_ERRORS (3) errors versus one with 2 (below threshold), and
    an interval spanning multiple hour bins."""
    import datetime as dt

    from duckdb_retail_pipeline_spark.queries import REGISTRY
    from tests.compare import assert_matches

    D = dt.datetime
    H = D(2024, 1, 1, 12, 0, 0)          # incident hour [12:00, 13:00)
    us = dt.timedelta(microseconds=1)
    hr = dt.timedelta(hours=1)
    events = [
        # exactly 3 errors in H -> window; 2 errors at 15:00 -> none
        (1, H.replace(minute=5), "error", None, 1.0, 100),
        (2, H.replace(minute=6), "error", None, 1.0, 100),
        (3, H.replace(minute=7), "error", None, 1.0, 100),
        (4, D(2024, 1, 1, 15, 1), "error", None, 1.0, 100),
        (5, D(2024, 1, 1, 15, 2), "error", None, 1.0, 100),
        # user 1: interval [10:00, 12:00] -> e == w, zero-overlap pair
        (6, D(2024, 1, 1, 10, 0), "view", None, 1.0, 1),
        (7, H, "view", None, 1.0, 1),
        # user 2: interval [13:00, 14:00] -> s == w+1h, EXCLUDED
        (8, H + hr, "view", None, 1.0, 2),
        (9, H + 2 * hr, "view", None, 1.0, 2),
        # user 3: zero-length interval at 12:30
        (10, H.replace(minute=30), "view", None, 1.0, 3),
        # user 4: 1 us overlap [11:00, 12:00:00.000001]
        (11, D(2024, 1, 1, 11, 0), "view", None, 1.0, 4),
        (12, H + us, "view", None, 1.0, 4),
        # user 5: spans 11:30 -> 13:30 (covers all of H)
        (13, D(2024, 1, 1, 11, 30), "view", None, 1.0, 5),
        (14, D(2024, 1, 1, 13, 30), "view", None, 1.0, 5),
    ]
    sf, con = _probe_corpus(
        tmp_path, spark,
        {"events": (events,
                    "event_id long, ts timestamp, event_type string, "
                    "props string, value double, user_id long")},
    )
    spec = REGISTRY["x43_range_join_binned"]
    df = spec.fn(spark, sf)
    assert_matches(df, con, spec.oracle, "x43-probe")
    row = {str(r["day"]): (r["n_pairs"], r["n_users"], r["total_overlap_us"])
           for r in df.collect()}["2024-01-01"]
    # pairs: users 1 (0 us), 3 (0 us, point), 4 (1 us), 5 (full hour)
    # + user 100's own error interval [12:05, 15:02] overlaps H for
    # 55 min; user 2 excluded
    assert row[0] == 5 and row[1] == 5
    assert row[2] == 1 + 3600_000_000 + 55 * 60_000_000


def test_x44_x90_adversarial_search_corpora(spark, tmp_path):
    """r13 probe wave 6: BM25 and positional phrase search on the
    corpora the ranking math stresses — a term present in EVERY doc
    (df == N: the +1 idf floor keeps the contribution positive,
    never log of a sub-1 ratio going negative-infinite), docs with
    zero query terms (outside the hit set), a SINGLE-doc corpus
    regime (df == N == 1), overlapping phrase repeats ('slow join
    slow join slow' scores 2 occurrences; 'slow slow join' only 1),
    a doc shorter than the phrase, and an empty doc."""
    from duckdb_retail_pipeline_spark.queries import REGISTRY
    from tests.compare import assert_matches

    docs = [
        (1, "join join join", "en", "s", 14),          # tf 3, one term
        (2, "slow join slow join slow", "en", "s", 24),# phrase x2
        (3, "slow slow join", "en", "s", 14),          # phrase x1
        (4, "nothing relevant here", "en", "s", 21),   # no hit
        (5, "join", "en", "s", 4),                     # 1-token doc
        (6, "", "en", "s", 0),                         # empty doc
        (7, "vector join slow vector", "en", "s", 23), # all three terms,
                                                       # but "join slow" is
                                                       # NOT the phrase
    ]
    sf, con = _probe_corpus(
        tmp_path, spark,
        {"documents": (docs,
                       "doc_id long, text string, lang string, "
                       "source string, n_chars long")},
    )
    for name in ("x44_bm25_search", "x90_phrase_search"):
        spec = REGISTRY[name]
        assert_matches(spec.fn(spark, sf), con, spec.oracle, f"{name}-probe")

    x90 = {r["doc_id"]: r["n_occurrences"]
           for r in REGISTRY["x90_phrase_search"].fn(spark, sf).collect()}
    assert x90 == {2: 2, 3: 1}


def test_x47_x71_adversarial_pii_and_unicode(spark, tmp_path):
    """r13 probe wave 6: (a) x47's PII redaction where the ORIGINAL
    text already contains near-PII — minimal matches ('a@b.c'),
    non-matches the regex must NOT touch (no local part, uppercase
    letters outside the [a-z] class, 3-digit phone stubs), a phone
    number whose first four digits match inside a longer run, and
    adjacent PII tokens — regexp_extract_all/regexp_replace parity
    between engines on every boundary. (b) x71's fuzzy matching over
    UNICODE names: multi-byte characters in and around the corrupted
    region — levenshtein must count CODEPOINTS identically in both
    engines, and the 4-char suffix block key must slice characters,
    not bytes."""
    from duckdb_retail_pipeline_spark.queries import REGISTRY
    from tests.compare import assert_matches

    docs = [
        (1, "contact a@b.c now", "en", "s", 17),
        (2, "no pii @mail alone or 555-123 stub", "en", "s", 34),
        (3, "UPPER@CASE.COM stays", "en", "s", 20),
        (4, "run 555-123456 over", "en", "s", 19),
        (5, "a@b.c c@d.e twice", "en", "s", 17),
        (6, "", "en", "s", 0),
    ]
    # names >= 13 chars so the deletion window exists; unicode inside
    # and outside the corrupted region; 20/40/60 enter the dirty set
    customer = [
        (20, "Ünïcode#münch0020", 0, 1.0, "B"),
        (40, "Ωmega#customer40", 0, 1.0, "B"),
        (60, "plain#customer60", 0, 1.0, "B"),
        (61, "plain#customer61", 0, 1.0, "B"),   # same block tail? no
        (80, "日本語#クライアント80", 0, 1.0, "B"),
    ]
    sf, con = _probe_corpus(
        tmp_path, spark,
        {
            "documents": (docs,
                          "doc_id long, text string, lang string, "
                          "source string, n_chars long"),
            "customer": (customer,
                         "c_custkey long, c_name string, c_nationkey int, "
                         "c_acctbal double, c_mktsegment string"),
        },
    )
    for name in ("x47_pii_redaction", "x71_fuzzy_entity_match"):
        spec = REGISTRY[name]
        assert_matches(spec.fn(spark, sf), con, spec.oracle, f"{name}-probe")

    x47 = {r["doc_id"]: (r["n_emails"], r["n_phones"])
           for r in REGISTRY["x47_pii_redaction"].fn(spark, sf).collect()}
    # every doc gains 1 synthetic email + 1 synthetic phone from aug
    assert x47[1] == (2, 1)      # a@b.c + synthetic
    assert x47[2] == (1, 1)      # @mail / 555-123 must NOT count
    # 'UPPER@CASE.COM' has no lowercase local part before the @, so
    # only the synthetic email counts (identical in both engines)
    assert x47[3] == (1, 1)
    assert x47[4] == (1, 2)      # 555-1234 inside 555-123456 counts
    assert x47[5] == (3, 1)

    x71 = {r["dirty_key"]: (r["matched_key"], r["is_true_match"])
           for r in REGISTRY["x71_fuzzy_entity_match"].fn(spark, sf).collect()}
    for true_key in (20, 40, 60, 80):
        assert x71[10000000 + true_key] == (true_key, True), true_key


def test_x59_x87_adversarial_blob_and_vocab_edges(spark, tmp_path):
    """r13 probe wave 7: (a) x59's byte-grid pooling on blobs the
    8-cell mapping stresses — a 1-byte blob (all 8 cells collapse to
    cell 0), blobs SHORTER than the grid (3, 7 bytes: some cells
    empty, never emitted), exactly 8 bytes (one byte per cell), a
    prime length (13: uneven floor split), multi-byte UTF-8 text
    (cells pool BYTES, not characters), and an empty blob (no rows).
    (b) x87's bigram LM on a vocabulary-1 corpus (every conditional
    probability exactly 1 -> score == SCALE), a two-token doc, and
    docs below the bigram window (excluded entirely)."""
    from duckdb_retail_pipeline_spark.queries import REGISTRY
    from tests.compare import assert_matches

    docs = [
        (1, "a", "en", "s", 1),            # 1 byte
        (2, "abc", "en", "s", 3),          # shorter than grid
        (3, "abcdefg", "en", "s", 7),      # 7 bytes
        (4, "abcdefgh", "en", "s", 8),     # exactly the grid
        (5, "abcdefghijklm", "en", "s", 13),  # prime length
        (6, "héé", "en", "s", 5),          # multi-byte UTF-8
        (7, "", "en", "s", 0),             # empty blob
        (8, "x x x x x", "en", "s", 9),    # vocab-1 (for x87)
        (9, "y z", "en", "s", 3),          # single bigram, disjoint vocab
        (10, "solo", "en", "s", 4),        # below bigram window
    ]
    sf, con = _probe_corpus(
        tmp_path, spark,
        {"documents": (docs,
                       "doc_id long, text string, lang string, "
                       "source string, n_chars long")},
    )
    for name in ("x59_media_resize_grid", "x87_bigram_lm_quality"):
        spec = REGISTRY[name]
        assert_matches(spec.fn(spark, sf), con, spec.oracle, f"{name}-probe")

    x59 = {}
    for r in REGISTRY["x59_media_resize_grid"].fn(spark, sf).collect():
        x59.setdefault(r["media_id"], []).append(
            (r["cell_idx"], r["n_cell_bytes"])
        )
    assert sorted(x59[1]) == [(0, 1)]                 # 1 byte -> cell 0
    assert sorted(x59[4]) == [(i, 1) for i in range(8)]
    assert sum(n for _, n in x59[5]) == 13
    assert sum(n for _, n in x59[6]) == 5             # h + 2 bytes per é
    assert 7 not in x59                               # empty blob: no rows

    from duckdb_retail_pipeline_spark.operators import lm as LM
    x87 = {r["doc_id"]: (r["n_bigrams"], r["lm_score_scaled"])
           for r in REGISTRY["x87_bigram_lm_quality"].fn(spark, sf).collect()}
    assert x87[8] == (4, LM.SCALE)     # vocab-1: P(x|x) == 1 exactly
    assert x87[9] == (1, LM.SCALE)     # sole (y,z) bigram: P == 1
    assert 10 not in x87               # no bigram -> no row


def test_cohort_family_adversarial_minimal_corpora(spark, tmp_path):
    """r13 probe wave 7: the cohort family (x46 retention, x84 LTV
    curves, x45 funnel) on minimal engineered corpora — a
    single-user cohort whose only purchase IS the cohort event
    (week 0 only, cumulative == weekly), a purchase exactly 7 days
    later (the week-1 floor boundary: day offset 7 // 7 = 1, never
    week 0), 6 days later (still week 0), a user with purchases
    months apart (gap weeks produce NO rows — the curve is sparse,
    not zero-filled), negative-value purchases (refunds pull the
    cumulative DOWN), and funnel users completing steps out of
    order."""
    import datetime as dt

    from duckdb_retail_pipeline_spark.queries import REGISTRY
    from tests.compare import assert_matches

    D = dt.datetime
    events = [
        # user 1: cohort 2024-01-01, single purchase
        (1, D(2024, 1, 1, 10, 0), "purchase", None, 10.0, 1),
        # user 2: cohort day + exactly 7 days -> week 1
        (2, D(2024, 1, 1, 9, 0), "purchase", None, 5.0, 2),
        (3, D(2024, 1, 8, 9, 0), "purchase", None, 7.0, 2),
        # user 3: +6 days -> still week 0
        (4, D(2024, 1, 1, 8, 0), "purchase", None, 1.0, 3),
        (5, D(2024, 1, 7, 8, 0), "purchase", None, 2.0, 3),
        # user 4: months-apart purchases (sparse weeks)
        (6, D(2024, 1, 1, 7, 0), "purchase", None, 3.0, 4),
        (7, D(2024, 4, 1, 7, 0), "purchase", None, 4.0, 4),
        # user 5: refund pulls cumulative down
        (8, D(2024, 2, 1, 7, 0), "purchase", None, 9.0, 5),
        (9, D(2024, 2, 2, 7, 0), "purchase", None, -3.0, 5),
        # funnel fodder: view -> click -> purchase orders
        (10, D(2024, 3, 1, 7, 0), "view", None, 1.0, 6),
        (11, D(2024, 3, 1, 8, 0), "click", None, 1.0, 6),
        (12, D(2024, 3, 1, 9, 0), "purchase", None, 1.0, 6),
        # out-of-order funnel: purchase BEFORE view
        (13, D(2024, 3, 1, 7, 0), "purchase", None, 1.0, 7),
        (14, D(2024, 3, 1, 8, 0), "view", None, 1.0, 7),
    ]
    sf, con = _probe_corpus(
        tmp_path, spark,
        {"events": (events,
                    "event_id long, ts timestamp, event_type string, "
                    "props string, value double, user_id long")},
    )
    for name in ("x45_event_funnel", "x46_cohort_retention",
                 "x84_cohort_ltv_curves"):
        spec = REGISTRY[name]
        assert_matches(spec.fn(spark, sf), con, spec.oracle, f"{name}-probe")

    x84 = {(str(r["cohort_day"]), r["week_idx"]):
           (r["week_revenue"], r["cum_revenue"])
           for r in REGISTRY["x84_cohort_ltv_curves"].fn(spark, sf).collect()}
    # 2024-01-01 cohort: week 0 = users 1+2+3+4 day-0 purchases +
    # user 3's +6d; week 1 = user 2's exactly-7-days purchase
    assert x84[("2024-01-01", 0)] == (21.0, 21.0)
    assert x84[("2024-01-01", 1)] == (7.0, 28.0)
    # user 4's April purchase: week 13 (91 days // 7), sparse rows
    assert x84[("2024-01-01", 13)] == (4.0, 32.0)
    assert ("2024-01-01", 2) not in x84
    # refund cohort: cumulative goes 9.0 -> 6.0
    assert x84[("2024-02-01", 0)] == (6.0, 6.0)


@pytest.mark.slow  # tier-2 (r13 verdict #1): see conftest
def test_profiling_sampling_incremental_adversarial_minimal(spark, tmp_path):
    """r13 probe wave 8: (a) x49's one-pass profiler on a ONE-ROW
    orders table (min == max per column, distinct == 1, zero nulls)
    and NULL-heavy columns (null counting vs distinct counting);
    (b) q18's scalar-subquery window when every order sits inside
    the 90-day bound (single-order corpus) — BETWEEN NULL bounds on
    an EMPTY orders table yields zero groups in both engines;
    (c) q19's view-over-join with a region that has no orders (only
    joined regions appear); (d) x57's incremental base+delta merge
    when the DELTA is empty (every event before the cutoff) and
    when the BASE is empty (every event after) — merged result ==
    plain aggregate in both regimes; (e) x50's importance sampling
    on single-token docs (diversity weight saturates at the PPM
    cap) and empty docs (NULLIF-guarded zero-token weight)."""
    import datetime as dt

    from duckdb_retail_pipeline_spark.queries import REGISTRY
    from tests.compare import assert_matches

    D = dt.datetime
    # corpus A: one-row orders (+ empty-delta / empty-base events)
    orders_one = [(7, 3, "O", 123.45, D(2024, 5, 5), "1-URGENT")]
    customer = [(3, "C3", 0, 1.0, "B")]
    nation = [(0, "FRANCE", 0)]
    region = [(0, "EUROPE"), (1, "AMERICA")]   # AMERICA: no orders
    ev_before = [(1, D(2024, 1, 10, 8, 0), "click", None, 1.0, 1),
                 (2, D(2024, 1, 15, 8, 0), "view", None, 2.0, 1)]
    ev_after = [(3, D(2024, 1, 20, 8, 0), "click", None, 4.0, 2)]
    docs = [
        (1, "one", "en", "a", 3),              # single token: w == cap
        (2, "", "en", "a", 0),                 # zero tokens: guarded
        (3, "x x x x", "en", "b", 7),          # diversity 1/4
    ]
    sf, con = _probe_corpus(
        tmp_path, spark,
        {
            "orders": (orders_one,
                       "o_orderkey long, o_custkey long, "
                       "o_orderstatus string, o_totalprice double, "
                       "o_orderdate timestamp, o_orderpriority string"),
            "customer": (customer,
                         "c_custkey long, c_name string, c_nationkey int, "
                         "c_acctbal double, c_mktsegment string"),
            "nation": (nation, "n_nationkey int, n_name string, "
                               "n_regionkey int"),
            "region": (region, "r_regionkey int, r_name string"),
            "events": (ev_before + ev_after,
                       "event_id long, ts timestamp, event_type string, "
                       "props string, value double, user_id long"),
            "documents": (docs,
                          "doc_id long, text string, lang string, "
                          "source string, n_chars long"),
        },
    )
    for name in ("x49_data_profiling", "q18_cte_scalar_subquery",
                 "q19_view_over_join", "x57_incremental_agg",
                 "x50_importance_sampling", "x96_seasonal_decompose"):
        spec = REGISTRY[name]
        assert_matches(spec.fn(spark, sf), con, spec.oracle, f"{name}-probe")

    x49 = {r["col_name"]: (r["n_rows"], r["n_null"], r["n_distinct"],
                           r["min_i"], r["max_i"])
           for r in REGISTRY["x49_data_profiling"].fn(spark, sf).collect()}
    assert x49["o_orderkey"] == (1, 0, 1, 7, 7)
    assert x49["o_totalprice"] == (1, 0, 1, 12345, 12345)

    q19 = {r["region"] for r in
           REGISTRY["q19_view_over_join"].fn(spark, sf).collect()}
    assert q19 == {"EUROPE"}

    # delta-empty regime: cutoff 2024-01-16 puts events 1-2 in base,
    # 3 in delta — now prove the two degenerate splits agree too by
    # re-driving on sliced corpora
    for rows in (ev_before, ev_after):
        sf2, con2 = _probe_corpus(
            tmp_path / f"slice{len(rows)}", spark,
            {"events": (rows,
                        "event_id long, ts timestamp, event_type string, "
                        "props string, value double, user_id long")},
        )
        spec = REGISTRY["x57_incremental_agg"]
        assert_matches(spec.fn(spark, sf2), con2, spec.oracle,
                       f"x57-slice{len(rows)}")


def _probe_retail_edge_tables():
    """A compact retail corpus stressing the q-family's edges: NULL
    dates/prices/balances, sentinel-looking strings, negative
    quantities, orphan foreign keys, duplicate rows, a nation with
    zero customers, LIKE-prefix misses, and ties everywhere a
    tie-break is pinned."""
    import datetime as dt

    D = dt.datetime
    region = [(0, "EUROPE"), (1, "AMERICA")]
    nation = [(0, "FRANCE", 0), (1, "BRAZIL", 1), (2, "GHOSTLAND", 1)]
    customer = [
        (1, "Customer#000000001", 0, 100.0, "BUILDING"),
        (2, "Customer#000000002", 0, -50.0, "AUTOMOBILE"),
        (3, "Customer#000000003", 1, 0.0, "BUILDING"),
        (4, "Customer#000000004", 1, None, "MACHINERY"),  # NULL acctbal
    ]
    supplier = [(1, "Supplier#1", 0, 10.0), (2, "Supplier#2", 1, None)]
    part = [
        (1, "azure part one", "Brand#1", "TYPE A", 1, 10.0),
        (2, "azure part two", "Brand#1", "TYPE A", 2, 10.0),   # mode tie
        (3, "misc part", "Brand#2", "TYPE B", 3, None),        # NULL price
    ]
    orders = [
        (1, 1, "O", 100.0, D(2024, 1, 10), "1-URGENT"),
        (2, 1, "F", 200.0, D(2024, 2, 10), "2-HIGH"),
        (3, 2, "O", 300.0, D(2024, 3, 10), "3-MEDIUM"),
        (4, 3, "O", 0.0, D(2024, 3, 10), "5-LOW"),       # zero price
        (5, 4, "P", 50.0, None, "1-URGENT"),             # NULL orderdate
        (6, 999, "O", 75.0, D(2024, 4, 1), "4-NOT SPEC"),# orphan custkey
    ]
    lineitem = [
        (1, 1, 1, 1, 5.0, 500.0, 0.1, 0.02, "N", "O", D(2024, 1, 12)),
        (1, 2, 1, 2, 3.0, 300.0, 0.0, 0.0, "N", "O", D(2024, 1, 12)),
        (2, 1, 2, 1, -2.0, -100.0, 0.05, 0.01, "R", "F", D(2024, 2, 12)),
        (3, 3, 1, 1, 7.0, 700.0, 1.0, 0.08, "A", "F", D(2024, 3, 12)),
        (3, 3, 1, 2, 7.0, 700.0, 1.0, 0.08, "A", "F", D(2024, 3, 12)),
        (7, 1, 999, 1, 1.0, 10.0, 0.0, 0.0, "N", "O", D(2024, 5, 1)),
    ]
    return {
        "region": (region, "r_regionkey int, r_name string"),
        "nation": (nation, "n_nationkey int, n_name string, n_regionkey int"),
        "customer": (customer,
                     "c_custkey long, c_name string, c_nationkey int, "
                     "c_acctbal double, c_mktsegment string"),
        "supplier": (supplier,
                     "s_suppkey long, s_name string, s_nationkey int, "
                     "s_acctbal double"),
        "part": (part, "p_partkey long, p_name string, p_brand string, "
                       "p_type string, p_size int, p_retailprice double"),
        "orders": (orders,
                   "o_orderkey long, o_custkey long, o_orderstatus string, "
                   "o_totalprice double, o_orderdate timestamp, "
                   "o_orderpriority string"),
        "lineitem": (lineitem,
                     "l_orderkey long, l_partkey long, l_suppkey long, "
                     "l_linenumber int, l_quantity double, "
                     "l_extendedprice double, l_discount double, "
                     "l_tax double, l_returnflag string, "
                     "l_linestatus string, l_shipdate timestamp"),
    }


@pytest.mark.slow  # tier-2 (r13 verdict #1): see conftest
def test_q_family_adversarial_retail_edges(spark, tmp_path):
    """r13 probe wave 9: the ENTIRE core q-family driven on the edge
    retail corpus (_probe_retail_edge_tables) — NULL order dates
    flowing through date parts and range scans, an orphan custkey
    through the anti/semi joins, duplicate lineitem rows through
    aggregation, negative quantities/prices through conditional
    sums, a NULL retailprice through top-k ranking, zero-customer
    nations, and mode ties. Every query must hash-match its oracle
    on this corpus exactly as on the driver SFs."""
    from duckdb_retail_pipeline_spark.queries import REGISTRY
    from tests.compare import assert_matches

    sf, con = _probe_corpus(tmp_path, spark, _probe_retail_edge_tables())
    for name in (
        "q01_pricing_summary", "q02_monthly_revenue_by_nation",
        "q03_top_customers", "q04_filter_like_prefix",
        "q05_null_sentinel_filters", "q06_semi_join_in_subquery",
        "q07_anti_join_orphans", "q09_conditional_agg",
        "q10_conditional_count_distinct", "q11_scalar_multi_agg",
        "q12_ratio_nullif", "q13_weekend_cohort", "q14_date_parts",
        "q16_lag_gap_detection", "q17_union_all_checks",
        "q21_multikey_star_agg", "q22_distinct_dedup",
        "q24_between_range_scan",
    ):
        spec = REGISTRY[name]
        assert_matches(spec.fn(spark, sf), con, spec.oracle, f"{name}-probe")


@pytest.mark.slow  # tier-2 (r13 verdict #1): see conftest
def test_text_dedup_family_adversarial_degenerate_docs(spark, tmp_path):
    """r13 probe wave 10: the text/dedup/curation family driven on
    one degenerate document corpus — exact duplicates (including a
    whitespace-normalized pair), an empty doc, a whitespace-only
    doc, a NULL-text doc, docs below the shingle/bigram windows,
    single-token and vocabulary-1 docs, and unicode — every
    registered query in the family must hash-match its oracle on
    this corpus (the operators' blocking/banding must DEGRADE to
    exactness, never crash on empty hash sets or drop the NULL
    key)."""
    from duckdb_retail_pipeline_spark.queries import REGISTRY
    from tests.compare import assert_matches

    docs = [
        (1, "the quick brown fox jumps over the lazy dog", "en", "a", 43),
        (2, "the quick  brown fox jumps over the lazy dog", "en", "b", 44),
        (3, "the quick brown fox jumps over the lazy dog", "en", "b", 43),
        (4, "", "en", "a", 0),
        (5, "   ", "en", "a", 3),
        (6, None, "en", "a", 0),
        (7, "solo", "en", "b", 4),
        (8, "x x x x x x", "en", "a", 11),
        (9, "héllo wörld 中文 テスト", "de", "b", 20),
        (10, "one two", "fr", "a", 7),
    ]
    sf, con = _probe_corpus(
        tmp_path, spark,
        {"documents": (docs,
                       "doc_id long, text string, lang string, "
                       "source string, n_chars long")},
    )
    for name in (
        "x01_dedup_exact", "x05_ngram_jaccard_pairs",
        "x07_minhash_lsh_pairs", "x09_simhash_pairs",
        "x23_winnowing_fingerprints", "x26_dedup_clusters",
        "x28_corpus_curation", "x32_repetition_filter",
        "x33_sequence_packing", "x36_decontamination",
        "x52_token_rarity", "x54_pmi_pairs", "x61_bpe_token_stats",
        "x64_vocab_oov", "x81_dedup_savings", "x86_canonical_docs",
    ):
        spec = REGISTRY[name]
        assert_matches(spec.fn(spark, sf), con, spec.oracle, f"{name}-probe")

    x01 = {r["fp"]: (r["keep_id"], r["n_copies"])
           for r in REGISTRY["x01_dedup_exact"].fn(spark, sf).collect()}
    # docs 1/2/3 share one whitespace-normalized fingerprint; 4/5
    # share the zero-token key; 6 is the NULL key
    assert (1, 3) in x01.values()
    assert (4, 2) in x01.values()
    assert x01[None] == (6, 1)


@pytest.mark.slow  # tier-2 (r13 verdict #1): see conftest
def test_embedding_family_adversarial_duplicates_and_zero(spark, tmp_path):
    """r13 probe wave 11: the embedding/ANN family driven on a
    corpus of DUPLICATED directions (exact copies, scaled copies —
    cosine exactly 1.0 everywhere, the tie-break regime), one zero
    vector (NULL cosine through every kernel's nullif guard), and a
    near-orthogonal tail — every registered query (brute force, LSH,
    IVF, batch ANN, RRF hybrid, IVF-PQ, index upsert, SemDeDup) must
    hash-match its oracle on this corpus: banding/celling must
    degrade to exactness under maximal collision, never crash or
    drop ties."""
    import math

    from duckdb_retail_pipeline_spark.queries import REGISTRY
    from tests.compare import assert_matches

    def unit(i, dim=64):
        v = [0.0] * dim
        v[i % dim] = 1.0
        return v

    vecs = []
    # ids 0-11: the query anchor and its exact/scaled copies — the
    # ENTIRE exact top-10 is this one duplicate cluster, so every
    # index family's recall floor holds STRUCTURALLY (all ten true
    # neighbors share the query's cell/bucket; the floors are
    # corpus-calibrated contracts, so the probe corpus must satisfy
    # them while still stressing maximal tie collision)
    anchor = [math.cos(0.01 * j) for j in range(64)]
    vecs.append((0, anchor, 0))
    for i in range(1, 10):
        vecs.append((i, list(anchor), 0))
    vecs.append((10, [2.0 * x for x in anchor], 0))
    vecs.append((11, [0.5 * x for x in anchor], 0))
    vecs.append((12, [0.0] * 64, 0))                # zero vector
    for i in range(13, 40):                         # near-orthogonal tail
        vecs.append((i, unit(i), i % 3))
    sf, con = _probe_corpus(
        tmp_path, spark,
        {"embeddings": (vecs,
                        "vec_id long, embedding array<double>, label int"),
         "documents": ([(i, f"doc {i}", "en", "s", 5) for i in range(10)],
                       "doc_id long, text string, lang string, "
                       "source string, n_chars long")},
    )
    for name in (
        "x10_embedding_cosine_topk", "x11_embedding_dup_pairs",
        "x12_similarity_lsh_topk", "x13_similarity_ivf_topk",
        "x42_ann_batch_retrieval", "x88_rrf_hybrid",
        "x89_ivf_pq_topk", "x91_ann_index_upsert", "x99_semantic_dedup",
    ):
        spec = REGISTRY[name]
        assert_matches(spec.fn(spark, sf), con, spec.oracle, f"{name}-probe")


@pytest.mark.slow  # tier-2 (r13 verdict #1): see conftest
def test_graph_events_reports_adversarial_edges(spark, tmp_path):
    """r13 probe wave 12: the graph family on degenerate baskets —
    one order holding FIVE distinct parts (a complete co-purchase
    clique: every pagerank/triangle path under maximal density for
    its size), single-part orders (no edges), duplicate lines of the
    same part (deduped before pairing) — plus the event-time report
    family (hourly, sliding windows, stream-stream joins, upsert
    sink, late-data and deletion audits, transitions, rolling
    users) and the retail report family (supplier latency, skew,
    pareto, velocity, seasonal index) on the shared edge corpora.
    Every registered query must hash-match its oracle."""
    import datetime as dt

    from duckdb_retail_pipeline_spark.queries import REGISTRY
    from tests.compare import assert_matches

    D = dt.datetime
    tables = _probe_retail_edge_tables()
    # a clique basket + single-part orders + duplicate-line basket
    li_schema = tables["lineitem"][1]
    clique = [
        (100, p, 1, i + 1, 1.0, 10.0, 0.0, 0.0, "N", "O", D(2024, 6, 1))
        for i, p in enumerate((11, 12, 13, 14, 15))
    ]
    dup_lines = [
        (101, 21, 1, 1, 1.0, 10.0, 0.0, 0.0, "N", "O", D(2024, 6, 2)),
        (101, 21, 1, 2, 2.0, 20.0, 0.0, 0.0, "N", "O", D(2024, 6, 2)),
        (101, 22, 1, 3, 1.0, 10.0, 0.0, 0.0, "N", "O", D(2024, 6, 2)),
    ]
    single = [(102, 31, 2, 1, 1.0, 10.0, 0.0, 0.0, "N", "O", D(2024, 6, 3))]
    tables["lineitem"] = (tables["lineitem"][0] + clique + dup_lines + single,
                          li_schema)
    ev = [
        (1, D(2024, 1, 1, 10, 0), "view", '{"k": 1}', 1.0, 1),
        (2, D(2024, 1, 1, 10, 30), "click", '{"k": 2}', 2.0, 1),
        (3, D(2024, 1, 1, 11, 0), "purchase", None, 30.0, 1),
        (4, D(2024, 1, 1, 10, 0), "view", None, 1.0, 2),
        (5, D(2024, 1, 2, 9, 0), "delete_request", None, 0.0, 2),
        (6, D(2024, 1, 2, 9, 30), "view", None, 1.0, 2),
        (7, D(2024, 1, 1, 10, 0), "error", None, -1.0, 3),
    ]
    tables["events"] = (ev, "event_id long, ts timestamp, "
                            "event_type string, props string, "
                            "value double, user_id long")
    sf, con = _probe_corpus(tmp_path, spark, tables)
    for name in (
        "x92_copurchase_pagerank", "x94_pagerank_dangling",
        "x97_pagerank_fixed_point", "x98_triangle_counts",
        "x66_basket_pairs",
        "x14_events_hourly", "x25_streaming_sliding",
        "x58_stream_stream_join", "x85_stream_stream_left_outer",
        "x60_streaming_upsert_sink",
        "x68_supplier_latency", "x69_deletion_audit",
        "x70_late_data_audit", "x77_skew_report",
        "x79_pareto_analysis", "x82_part_velocity",
        "x83_seasonal_index",
    ):
        spec = REGISTRY[name]
        assert_matches(spec.fn(spark, sf), con, spec.oracle, f"{name}-probe")

    x98 = {r["node"]: r["n_triangles"] for r in
           REGISTRY["x98_triangle_counts"].fn(spark, sf).collect()}
    # the 5-clique: every member sits on C(4,2) = 6 triangles
    for p in (11, 12, 13, 14, 15):
        assert x98[p] == 6, p


@pytest.mark.slow  # tier-2 (r13 verdict #1): see conftest
def test_remaining_family_adversarial_sweep(spark, tmp_path):
    """r13 probe wave 13 — closes the probe-coverage worklist
    (tools/probe_coverage.py): the last 19 registered queries
    without an engineered-corpus differential, driven on the edge
    corpora — ROLLUP/unpivot/approx/window-rank/regex/correlated
    surfaces over NULL-carrying dims, MERGE/SCD2 derived-change
    shapes, forward fill and as-of joins over a NULL order date,
    robust stats over NULL balances, salted join under the clique
    baskets, media schema/features over empty/NULL/unicode blobs,
    seasonal anomaly on a three-week event log, RAG end-to-end on
    degenerate docs, and both Misra-Gries sketches (vocabulary
    sized so the exactness certificate holds: N <= capacity makes
    kth*(capacity+1) > N trivially true at >= k distinct
    tokens)."""
    import datetime as dt

    from duckdb_retail_pipeline_spark.queries import REGISTRY
    from tests.compare import assert_matches

    D = dt.datetime
    tables = _probe_retail_edge_tables()
    # a05's percentile sketch returns a DATA point while the exact
    # median interpolates — the edge corpus's even count put the
    # median in a 300..500 gap, legitimately failing the
    # corpus-calibrated tolerance contract; one more row makes the
    # median a data point (the contract's intended regime) while the
    # gap itself stays in the corpus
    li_rows, li_schema = tables["lineitem"]
    tables["lineitem"] = (
        li_rows + [(8, 3, 1, 1, 1.0, 400.0, 0.0, 0.0, "N", "O",
                    D(2024, 3, 15))],
        li_schema,
    )
    # >= 20 distinct tokens with a decaying distribution for x93's
    # certificate; reuse as the RAG/media corpus with the degenerate
    # rows appended
    vocab_docs = [
        (100 + i, " ".join(f"tok{j:02d}" for j in range(i, 25)),
         "en", "a", 0)
        for i in range(5)
    ]
    degenerate = [
        (1, "the quick brown fox", "en", "a", 19),
        (2, "the quick brown fox", "en", "b", 19),
        (3, "", "en", "a", 0),
        (4, None, "en", "a", 0),
        (5, "héllo wörld 中文", "de", "b", 14),
    ]
    tables["documents"] = (degenerate + vocab_docs,
                           "doc_id long, text string, lang string, "
                           "source string, n_chars long")
    # three weeks of events with one anomalous day for x62
    ev = []
    eid = 0
    for d in range(21):
        day = D(2024, 1, 1) + dt.timedelta(days=d)
        n = 12 if d == 10 else 2        # day 10: the anomaly
        for i in range(n):
            eid += 1
            ev.append((eid, day.replace(hour=9 + (i % 8)), "click",
                       None, 1.0 * (i + 1), i % 3))
    tables["events"] = (ev, "event_id long, ts timestamp, "
                            "event_type string, props string, "
                            "value double, user_id long")
    sf, con = _probe_corpus(tmp_path, spark, tables)
    for name in (
        "a01_rollup", "a04_unpivot", "a05_approx_aggregates",
        "a07_merge_upsert", "a08_scd2_history",
        "a10_string_functions", "a11_window_rank_surface",
        "a14_regex_surface", "a16_correlated_avg_filter",
        "q15_forward_fill", "q25_asof_join",
        "x19_media_schema", "x20_media_features", "x40_robust_stats",
        "x48_salted_join", "x62_seasonal_anomaly", "x65_rag_pipeline",
        "x93_frequent_tokens", "x95_frequent_tokens_escalation",
    ):
        spec = REGISTRY[name]
        assert_matches(spec.fn(spark, sf), con, spec.oracle, f"{name}-probe")


@pytest.mark.slow  # tier-2 (r13 verdict #1): see conftest
def test_zero_row_corpus_full_registry_sweep(spark, sf_dir, tmp_path):
    """r13 probe wave 14: EVERY registered query + oracle on a
    ZERO-ROW corpus (each table keeps its real schema, holds no
    rows) — the empty-shard/empty-partition class a 100 TB filter
    chain produces routinely. Expected outcomes, all pinned:

    - 139/149 hash-MATCH (scalar aggs emit their one row with
      additive zeros/NULLs in both engines; joins/windows/dedup/
      streaming/graph families are empty-in → empty-out; x99's
      semantic_dedup returns the contracted empty frame; a05's
      tolerance booleans hold vacuously TRUE on both sides).
    - The 7 anchored/index ANN queries raise a CLEAR ValueError
      (query_anchor / hyperplane / IVF-seed contract errors — the
      anchor row is part of those queries' registered contract;
      before the r13 hardening they died in opaque TypeErrors and
      analysis-time NULL_TYPE mismatches far from the cause).
    - ROLLUP/CUBE/GROUPING SETS (a01/a02/a06) pin a documented
      ENGINE divergence: Spark's Expand emits no rows on empty
      input, DuckDB emits the SQL-standard () grand-total row with
      count 0 — asserted exactly (0 vs 1 row) so a Spark version
      that changes the semantics fails this test.
    """
    import duckdb as _duckdb
    import pytest

    from duckdb_retail_pipeline_spark.catalog import TABLES
    from duckdb_retail_pipeline_spark.queries import REGISTRY
    from tests.compare import assert_matches

    d = str(tmp_path / "sf_empty")
    con = _duckdb.connect()
    for t in TABLES:
        spark.read.parquet(f"{sf_dir}/{t}.parquet").limit(0).coalesce(
            1
        ).write.mode("overwrite").parquet(f"{d}/{t}.parquet")
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{d}/{t}.parquet/*.parquet'"
        )

    anchor_contract = {
        "x10_embedding_cosine_topk", "x12_similarity_lsh_topk",
        "x13_similarity_ivf_topk", "x42_ann_batch_retrieval",
        "x88_rrf_hybrid", "x89_ivf_pq_topk", "x91_ann_index_upsert",
    }
    grand_total_divergence = {"a01_rollup", "a02_cube",
                              "a06_grouping_sets_sql"}

    for name, spec in REGISTRY.items():
        if name in anchor_contract:
            with pytest.raises(
                ValueError, match="query anchor|LSH hyperplanes"
            ):
                spec.fn(spark, d).collect()
        elif name in grand_total_divergence:
            assert spec.fn(spark, d).count() == 0, name
            res = con.execute(spec.oracle)
            cols = [c[0] for c in res.description]
            drows = res.fetchall()
            assert len(drows) == 1, (name, drows)
            row = dict(zip(cols, drows[0]))
            count_col = {
                "a01_rollup": "n_customers",
                "a02_cube": "n_orders",
                "a06_grouping_sets_sql": "n",
            }[name]
            assert row[count_col] == 0, (name, row)
            for c in cols:  # grouping keys of the () set are NULL
                if c != count_col and not c.startswith("total"):
                    assert row[c] is None, (name, row)
        else:
            assert_matches(spec.fn(spark, d), con, spec.oracle,
                           f"{name}-zero-row")


@pytest.mark.slow  # tier-2 (r13 verdict #1): see conftest
def test_one_row_corpus_full_registry_sweep(spark, sf_dir, tmp_path):
    """r13 probe wave 15: every registered query + oracle on a
    ONE-ROW corpus (each table holds exactly its first real row) —
    the minimal-data class below most queries' statistical regimes.
    142/149 hash-MATCH (windows/joins/aggs/dedup/streaming handle a
    single row cleanly in both engines; the r13 ann_contract clamp
    makes the recall floor and returned_k MEANINGFUL here — a floor
    of 5 is unsatisfiable where perfect recall is 1, so both clamp
    at |exact top-k|, the identity on every registered corpus).
    Expected non-matches, pinned:

    - x12/x42/x91 raise the hyperplane-count guard (1 vector < bits;
      x91's modulo split leaves its base EMPTY), x89 raises
      corpus < k_codes — the loud sizing contracts.
    - x93: counts stay EXACT and hash-equal, but heavy_bound_holds
      is honestly FALSE below the certificate's regime (vocab < k —
      the r10 full-k-rows rule; the oracle literal states the
      registered-corpus contract). Pinned as counts-equal +
      all-False.
    - x99: the ORACLE's pinned-4-centroid CTEs require vec_ids 0..3
      to exist (the registered x13/x89-style config contract) — one
      vector makes the oracle's cross join empty while the engine
      correctly keeps the single vector. Pinned as 1-vs-0 rows.
    - a01: the one customer/nation/region rows have non-matching
      FKs, so the join is EMPTY and the a01/a02/a06 grand-total
      divergence applies (Spark 0 rows, DuckDB's () row).
    """
    import duckdb as _duckdb
    import pytest

    from duckdb_retail_pipeline_spark.catalog import TABLES
    from duckdb_retail_pipeline_spark.queries import REGISTRY
    from tests.compare import assert_matches, normalize

    d = str(tmp_path / "sf_onerow")
    con = _duckdb.connect()
    for t in TABLES:
        spark.read.parquet(f"{sf_dir}/{t}.parquet").limit(1).coalesce(
            1
        ).write.mode("overwrite").parquet(f"{d}/{t}.parquet")
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{d}/{t}.parquet/*.parquet'"
        )

    sizing_guards = {
        "x12_similarity_lsh_topk", "x42_ann_batch_retrieval",
        "x89_ivf_pq_topk", "x91_ann_index_upsert",
    }
    for name, spec in REGISTRY.items():
        if name in sizing_guards:
            with pytest.raises(
                ValueError, match="hyperplanes|k_codes"
            ):
                spec.fn(spark, d).collect()
        elif name == "x93_frequent_tokens":
            srows = spec.fn(spark, d).collect()
            assert srows and all(
                r["heavy_bound_holds"] is False for r in srows
            ), srows
            drows = con.execute(spec.oracle).fetchall()
            assert normalize(
                [(r["token"], r["n_occurrences"]) for r in srows],
                ["token", "n"],
            ) == normalize([(t, n) for t, n, _ in drows], ["token", "n"])
        elif name == "x99_semantic_dedup":
            srows = spec.fn(spark, d).collect()
            assert len(srows) == 1 and srows[0]["keep"] is True, srows
            assert con.execute(spec.oracle).fetchall() == []
        elif name == "a01_rollup":
            assert spec.fn(spark, d).count() == 0, name
            drows = con.execute(spec.oracle).fetchall()
            assert len(drows) == 1 and drows[0][2] == 0, drows
        else:
            assert_matches(spec.fn(spark, d), con, spec.oracle,
                           f"{name}-one-row")


@pytest.mark.slow  # tier-2 (r13 verdict #1): see conftest
def test_multipart_layout_full_registry_sweep(spark, sf_dir, tmp_path):
    """r13 probe wave 16: every registered query + oracle with every
    table stored as a MULTI-PART directory (4 part files, rows
    redistributed round-robin) — the universal layout at cluster
    scale, where no table is ever one file and physical row order is
    an accident of the writer. 149/149 hash-MATCH: any query whose
    result leaked physical order / partition count (arrival-order
    dropDuplicates keeps, first()-style picks, float fold order,
    per-partition sketch merge order, limit-without-order) would
    diverge from the set-semantic DuckDB oracle here. This is the
    batch twin of the r13 wave-5 directory-layout streaming fix —
    pinned so a future operator that accidentally depends on the
    single-file driver-testdata layout fails loudly."""
    import duckdb as _duckdb

    from duckdb_retail_pipeline_spark.catalog import TABLES
    from duckdb_retail_pipeline_spark.queries import REGISTRY
    from tests.compare import assert_matches

    d = str(tmp_path / "sf_multipart")
    con = _duckdb.connect()
    for t in TABLES:
        spark.read.parquet(f"{sf_dir}/{t}.parquet").repartition(
            4
        ).write.mode("overwrite").parquet(f"{d}/{t}.parquet")
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{d}/{t}.parquet/*.parquet'"
        )

    for name, spec in REGISTRY.items():
        assert_matches(spec.fn(spark, d), con, spec.oracle,
                       f"{name}-multipart")


def test_spread_is_scale_adaptive(spark, sf_dir, monkeypatch):
    """_spread (r13 optimization) must engage its repartition only in
    the regime where the shuffle buys parallelism: skip on tiny
    inputs (per-task overhead > the compute being spread), engage in
    the single-split mid-range, and skip again when the scan already
    yields >= target splits (the at-scale regime where the old
    unconditional form shuffled the full text corpus for nothing)."""
    from duckdb_retail_pipeline_spark.operators import dedup as D

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    def n_shuffles(df):
        return df._jdf.queryExecution().executedPlan().toString().count(
            "Exchange hashpartitioning"
        )

    # tiny input (sf0.001 documents << 4 MB): no repartition
    assert D._spread(docs, "doc_id").sameSemantics(docs)
    assert n_shuffles(D.exact_dedup(docs)) == 1  # only the groupBy

    # mid-range (estimated size above the floor, scan single-split):
    # the repartition engages
    monkeypatch.setattr(D, "_SPREAD_MIN_INPUT_BYTES", 1)
    spread = D._spread(docs, "doc_id")
    assert not spread.sameSemantics(docs)
    assert n_shuffles(D.exact_dedup(docs)) == 2  # spread + groupBy

    # at-scale regime (scan splits >= target cores): skip again —
    # simulate by shrinking maxPartitionBytes so size // split >= N.
    # Since r14 the skip ALSO requires a proven row-group count >=
    # target (ADVICE r13: byte-range estimates overcount splits for
    # files with few/coarse row groups): sf0.001's single-row-group
    # file must KEEP the spread even though the byte test passes,
    # and a many-row-group rewrite of the same data must skip.
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        spark.conf.set("spark.sql.files.maxPartitionBytes", "1")
        # byte test passes, but one coarse row group = one real
        # split: spreading is still the right call
        assert not D._spread(docs, "doc_id").sameSemantics(docs)

        # same rows written with >= defaultParallelism row groups:
        # the scan genuinely has the splits, so the shuffle is skipped
        import tempfile

        import pyarrow.parquet as pq

        target = spark.sparkContext.defaultParallelism
        with tempfile.TemporaryDirectory() as tmp:
            path = f"{tmp}/docs_many_rg.parquet"
            tab = pq.read_table(f"{sf_dir}/documents.parquet")
            rows_per_group = max(1, len(tab) // (target + 1))
            pq.write_table(tab, path, row_group_size=rows_per_group)
            many = spark.read.parquet(path)
            assert pq.ParquetFile(path).metadata.num_row_groups >= target
            assert D._spread(many, "doc_id").sameSemantics(many)
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)


def test_spread_heavy_kernel_below_byte_floor(spark, sf_dir, monkeypatch):
    """r13 verdict #5: heavy kernels (the minhash signature build)
    re-engage the fan-out below the general byte floor — but only
    when the scan is provably serial. Pins: (a) tiny inputs below
    even the heavy floor stay unshuffled; (b) in the heavy window a
    single-row-group scan spreads for heavy callers ONLY (x01's
    fingerprint path keeps its no-shuffle plan); (c) a
    many-row-group scan of the same bytes does not spread — the
    scan already has the parallelism."""
    import tempfile

    import pyarrow.parquet as pq

    from duckdb_retail_pipeline_spark.operators import dedup as D

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # sf0.001 documents (~6 KB) sit below the 256 KB heavy floor
    assert D._spread(docs, "doc_id", heavy=True).sameSemantics(docs)

    monkeypatch.setattr(D, "_SPREAD_HEAVY_MIN_INPUT_BYTES", 1)
    assert not D._spread(docs, "doc_id", heavy=True).sameSemantics(docs)
    # non-heavy callers are untouched by the heavy window
    assert D._spread(docs, "doc_id").sameSemantics(docs)

    target = spark.sparkContext.defaultParallelism
    with tempfile.TemporaryDirectory() as tmp:
        path = f"{tmp}/docs_many_rg.parquet"
        tab = pq.read_table(f"{sf_dir}/documents.parquet")
        pq.write_table(
            tab, path, row_group_size=max(1, len(tab) // (target + 1))
        )
        many = spark.read.parquet(path)
        assert D._spread(many, "doc_id", heavy=True).sameSemantics(many)


def test_spread_size_probe_internal_api_present(spark, sf_dir):
    """_spread's size probe reads the PRIVATE py4j surface
    ``optimizedPlan().stats().sizeInBytes()`` — version-fragile, and
    its failure path degrades silently to always-spread (a full
    payload shuffle at scale). Pin the API so a Spark upgrade that
    removes it fails THIS test loudly instead of shipping the
    regression (r13 verdict #8)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    raw = docs._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
    size = raw if isinstance(raw, int) else int(str(raw))
    assert size > 0  # a real file-backed scan always has an estimate


def test_spread_conf_bytes_parses_size_suffixes():
    """ADVICE r13: a human-set maxPartitionBytes like '128m' must not
    silently disable the at-scale skip. _conf_bytes handles the JVM
    byteStringAsBytes grammar and raises on junk (the caller warns
    once and falls back to spreading)."""
    import pytest

    from duckdb_retail_pipeline_spark.operators.dedup import _conf_bytes

    assert _conf_bytes("134217728b") == 134217728
    assert _conf_bytes("134217728") == 134217728
    assert _conf_bytes("128m") == 128 << 20
    assert _conf_bytes("128MB") == 128 << 20
    assert _conf_bytes("1g") == 1 << 30
    assert _conf_bytes(" 4k ") == 4096
    with pytest.raises(ValueError):
        _conf_bytes("lots")
    with pytest.raises(ValueError):
        _conf_bytes("128x")
