from __future__ import annotations

import math

from pyspark.sql import functions as F

from duckdb_retail_pipeline_spark.operators import multimodal as M
from duckdb_retail_pipeline_spark.operators import similarity as S
from duckdb_retail_pipeline_spark.queries.base import tbl


def _cos(a, b):
    dot = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(y * y for y in b))
    return dot / (na * nb)


def test_lsh_results_subset_of_bruteforce_scores(spark, sf_dir):
    """LSH probes one bucket: everything it returns must carry the
    same cosine the exact scan computes (scores are correct even if
    recall < 1)."""
    emb = tbl(spark, sf_dir, "embeddings")
    q = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    exact = {
        r["vec_id"]: r["cosine"]
        for r in S.brute_force_topk(emb, q, k=10000).collect()
    }
    approx = S.lsh_topk(emb, q, k=10, bits=4).collect()
    assert len(approx) > 0
    for r in approx:
        assert abs(exact[r["vec_id"]] - r["cosine"]) < 1e-9
    # the query vector itself hashes into its own bucket → recall@self
    assert approx[0]["vec_id"] == 0 and abs(approx[0]["cosine"] - 1.0) < 1e-6


def test_ivf_topk_recall(spark, sf_dir):
    emb = tbl(spark, sf_dir, "embeddings")
    q = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    exact_top = [r["vec_id"] for r in S.brute_force_topk(emb, q, k=10).collect()]
    ivf_top = [r["vec_id"] for r in S.ivf_topk(emb, q, k=10, n_cells=8, nprobe=2).collect()]
    # nprobe=2 of 8 cells: expect meaningful overlap with exact top-10
    overlap = len(set(exact_top) & set(ivf_top))
    assert overlap >= 3, f"IVF recall too low: {overlap}/10"
    # k-means refinement must not degrade recall below the seeded index
    refined = [
        r["vec_id"]
        for r in S.ivf_topk(
            emb, q, k=10, n_cells=8, nprobe=2, kmeans_iters=2
        ).collect()
    ]
    r_overlap = len(set(exact_top) & set(refined))
    assert r_overlap >= 3, f"refined IVF recall too low: {r_overlap}/10"


def test_media_features_match_python_reference(spark, sf_dir):
    docs = tbl(spark, sf_dir, "documents").limit(20)
    media = M.documents_as_media(docs)
    feats = {r["media_id"]: r for r in M.extract_features(media).collect()}
    for row in docs.collect():
        content = row["text"].encode("utf-8")
        ref = M.decode_image(content, fake=True)
        got = feats[row["doc_id"]]
        assert got["n_bytes"] == ref["n_bytes"]
        assert abs(got["mean_byte"] - round(ref["mean_byte"], 4)) < 1e-9
        assert abs(got["byte_entropy"] - round(ref["byte_entropy"], 4)) < 1e-9


def test_decode_image_real_path_is_stubbed():
    import pytest

    with pytest.raises(NotImplementedError):
        M.decode_image(b"\x89PNG", fake=False)


def test_frame_sample_plan(spark, sf_dir):
    media = M.documents_as_media(tbl(spark, sf_dir, "documents").limit(5))
    plan = M.frame_sample_plan(media, every_n=30)
    rows = plan.collect()
    assert len(rows) >= 5  # at least frame 0 per media
    assert all(r["frame_idx"] % 30 == 0 for r in rows)


def test_grouped_ols_exact_line(spark, sf_dir):
    """Points lying exactly on y = 300 + 50x (cents) must recover
    slope 0.5 and intercept 3.0 (GBP units) with zero residual."""
    from duckdb_retail_pipeline_spark.operators.grouped import grouped_ols

    rows = [("a", x, 300 + 50 * x) for x in range(1, 8)] + [
        ("b", x, 1000 - 100 * x) for x in range(1, 5)
    ]
    df = spark.createDataFrame(rows, "g string, x int, y long")
    out = {r["g"]: r for r in grouped_ols(df, "g", "x", "y").collect()}
    assert out["a"]["n"] == 7
    assert abs(out["a"]["slope"] - 0.5) < 1e-12
    assert abs(out["a"]["intercept"] - 3.0) < 1e-12
    assert abs(out["b"]["slope"] + 1.0) < 1e-12
    assert abs(out["b"]["intercept"] - 10.0) < 1e-12


def test_grouped_ols_degenerate_x(spark, sf_dir):
    """All-equal x within a group → undefined slope → NULLs, not a
    crash (den == 0 guard)."""
    from duckdb_retail_pipeline_spark.operators.grouped import grouped_ols

    df = spark.createDataFrame(
        [("a", 5, 100), ("a", 5, 200)], "g string, x int, y long"
    )
    row = grouped_ols(df, "g", "x", "y").collect()[0]
    assert row["n"] == 2 and row["slope"] is None and row["intercept"] is None


def test_connected_components_known_graph(spark, sf_dir):
    """Chain 1-2-3, pair 10-11, and the labels must be the component
    minima; convergence needs 2 rounds for the chain."""
    from duckdb_retail_pipeline_spark.operators.dedup import (
        connected_components,
        dedup_clusters,
    )

    pairs = spark.createDataFrame(
        [(2, 1), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    labels = {
        r["node"]: r["lbl"] for r in connected_components(pairs).collect()
    }
    assert labels == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}
    clusters = {
        r["doc_id"]: (r["cluster_id"], r["cluster_size"])
        for r in dedup_clusters(pairs).collect()
    }
    assert clusters[3] == (1, 3) and clusters[11] == (10, 2)


def test_udtf_lateral_tokenize(spark, sf_dir):
    """Python UDTF surface: SQL LATERAL expansion must agree with
    the JVM explode(tokens()) path on the same document."""
    from duckdb_retail_pipeline_spark.functions import text as T
    from duckdb_retail_pipeline_spark.operators.udtf import register_udtfs

    register_udtfs(spark)
    docs = tbl(spark, sf_dir, "documents").limit(5)
    docs.createOrReplaceTempView("udtf_docs")
    via_udtf = spark.sql(
        "SELECT d.doc_id, t.pos, t.token "
        "FROM udtf_docs d, LATERAL tokenize(d.text) t"
    ).collect()
    via_explode = (
        docs.select(
            "doc_id", F.posexplode(T.tokens("text")).alias("pos", "token")
        )
    ).collect()
    assert sorted(map(tuple, via_udtf)) == sorted(map(tuple, via_explode))
    pairs = spark.sql(
        "SELECT p.* FROM (SELECT array(3, 1, 2) AS ids) v, "
        "LATERAL adjacent_pairs(v.ids) p"
    ).collect()
    assert [tuple(r) for r in pairs] == [("1-2", 1, 2), ("2-3", 2, 3)]
