"""Product quantization (PQ) with asymmetric-distance (ADC) scoring
— the canonical billion-scale ANN compression (Jégou, Douze, Schmid,
"Product Quantization for Nearest Neighbor Search", TPAMI 2011).

A vector splits into ``m`` subvectors; each subspace gets its own
``k_codes``-entry codebook; a vector is stored as ``m`` small integer
codes (m·log2(k) bits instead of dim·32). Queries score candidates
WITHOUT decompressing: a per-query lookup table LUT[s][j] =
⟨query_sub_s, codebook_s[j]⟩ is built once (m·k_codes dots on the
driver — O(KB)), and a candidate's approximate inner product is the
sum of m table lookups over its codes.

Engine conventions, same discipline as the cosine family:

- Sub-assignment is exact-argmin by squared L2, computed through the
  expansion ‖c‖² − 2⟨x, c⟩ (the ‖x‖² term is constant per row and
  cannot change the argmin): the ⟨x, c⟩ terms come from ONE
  ``plane_dots`` Arrow-kernel call per subspace (the vectorized dot
  whose IEEE op sequence the oracle twins replay), ties break to the
  lower code index via first-occurrence ``array_position``.
- Codebooks are derived deterministically from data (seeds = the
  first ``k_codes`` vectors by id, optional Lloyd refinement with
  per-dimension means) — no RNG, reproducible run to run.
- ADC scores are sums of m LITERAL doubles in fixed subspace order —
  an oracle embeds the same literals and adds in the same order, so
  the 4-decimal rounded score is engine-stable.

At scale: codes are ~64× smaller than float32 vectors, so the scan
side of a top-k is bandwidth-bound on a few bytes per row; compose
with the IVF cells (``build_ivf_index``) for the classic IVF-PQ
pipeline — cells prune the corpus, ADC ranks the survivors, exact
re-scoring (``brute_force_topk`` over the shortlist) refines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from duckdb_retail_pipeline_spark.functions import vectors as V


def _sub_codes_expr(sub_col, codebook: list[list[float]]):
    """argmin_j ‖sub − codebook[j]‖² as a pure expression: one
    plane_dots kernel call for every ⟨sub, c_j⟩, then the ‖c_j‖² −
    2·dot expansion and a first-occurrence argmin (ties → lower
    code, the _nearest_cell_expr convention)."""
    dots = V.plane_dots(sub_col, codebook)
    c_sq = [sum(float(x) * float(x) for x in c) for c in codebook]
    scores = F.array(
        *[
            F.lit(c_sq[j]) - F.lit(2.0) * F.element_at(dots, j + 1)
            for j in range(len(codebook))
        ]
    )
    return F.coalesce(
        (F.array_position(scores, F.array_min(scores)) - F.lit(1)).cast("int"),
        F.lit(0),
    )


def _subspaces(dim: int, m: int) -> list[tuple[int, int]]:
    if dim % m:
        raise ValueError(f"dim={dim} not divisible into m={m} subspaces")
    d = dim // m
    return [(s * d + 1, d) for s in range(m)]  # (1-based slice start, len)


def train_pq(
    emb: DataFrame,
    dim: int,
    m: int = 4,
    k_codes: int = 16,
    iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """Per-subspace codebooks: deterministic seeds (subvectors of the
    first ``k_codes`` vectors by id), then ``iters`` Lloyd passes —
    each pass assigns every subvector to its nearest code (one
    distributed job per subspace) and recomputes codes as
    per-dimension means (posexplode + groupBy(code, pos): only
    k_codes × dsub floats reach the driver). Codes that lose all
    members keep their previous centroid."""
    seeds = [
        list(map(float, r[vec_col]))
        for r in emb.orderBy(id_col).limit(k_codes).collect()
    ]
    if len(seeds) < k_codes:
        raise ValueError(f"corpus smaller than k_codes={k_codes}")
    books: list[list[list[float]]] = []
    for start, d in _subspaces(dim, m):
        book = [s[start - 1 : start - 1 + d] for s in seeds]
        sub = emb.select(F.slice(vec_col, start, d).alias("__sub"))
        for _ in range(iters):
            assigned = sub.withColumn("__code", _sub_codes_expr(F.col("__sub"), book))
            stats = (
                assigned.select("__code", F.posexplode("__sub").alias("pos", "val"))
                .groupBy("__code", "pos")
                .agg(F.avg("val").alias("mv"))
                .collect()
            )
            by_code: dict[int, dict[int, float]] = {}
            for r in stats:
                by_code.setdefault(r["__code"], {})[r["pos"]] = float(r["mv"])
            book = [
                [by_code[j][p] for p in range(d)] if j in by_code else book[j]
                for j in range(k_codes)
            ]
        books.append(book)
    return books


def encode_pq(
    emb: DataFrame,
    books: list[list[list[float]]],
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes array<int>): the PQ compression of every vector —
    the frame an index would persist instead of the float vectors."""
    m = len(books)
    codes = [
        _sub_codes_expr(F.slice(vec_col, start, d), books[s])
        for s, (start, d) in enumerate(_subspaces(dim, m))
    ]
    return emb.select(F.col(id_col), F.array(*codes).alias("codes"))


def adc_topk(
    codes: DataFrame,
    books: list[list[list[float]]],
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """Asymmetric-distance top-k over the COMPRESSED corpus: the
    query stays exact, candidates are their codes; score =
    Σ_s LUT[s][code_s] where LUT[s][j] = ⟨query_sub_s, book_s[j]⟩
    (driver-computed literals), added in fixed subspace order. The
    scan touches only the integer codes — no float vectors move.
    Returns (id, adc_dot) ordered desc, ties to lower id."""
    m = len(books)
    # _subspaces, not floor division (r11 review): a query whose dim
    # is not divisible by m — or that mismatches the books' training
    # dim — would silently zip-truncate every LUT entry and corrupt
    # all scores with no error; _subspaces raises on non-divisible
    # dims and the sub-dim check below catches a dim/books mismatch
    subs = _subspaces(len(query_vec), m)
    d = subs[0][1]
    for s in range(m):
        if books[s] and len(books[s][0]) != d:
            raise ValueError(
                f"query dim {len(query_vec)} splits into {d}-dim "
                f"subspaces but books[{s}] was trained at "
                f"{len(books[s][0])} dims"
            )
    lut = [
        [
            sum(float(a) * float(b) for a, b in zip(query_vec[s * d : (s + 1) * d], c))
            for c in books[s]
        ]
        for s in range(m)
    ]
    score = None
    for s in range(m):
        term = F.element_at(
            F.array(*[F.lit(v) for v in lut[s]]),
            F.element_at("codes", s + 1) + 1,
        )
        score = term if score is None else score + term
    scored = codes.select(
        F.col(id_col), F.round(score, 4).alias("adc_dot")
    )
    return scored.orderBy(F.col("adc_dot").desc(), F.col(id_col).asc()).limit(k)


def ivf_pq_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_cells: int = 8,
    nprobe: int = 2,
    m: int = 4,
    k_codes: int = 16,
    refine_factor: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    index: dict | None = None,
) -> DataFrame:
    """The classic IVF-PQ pipeline in one call: coarse cells prune
    the corpus (probe the ``nprobe`` nearest of ``n_cells``), ADC
    ranks the survivors over their codes, and the top
    ``refine_factor × k`` shortlist is re-scored EXACTLY (cosine over
    the float vectors) before the final top-k — the standard
    three-stage shape (FAISS's IndexIVFPQ + refinement). Returns
    (id, cosine) like the other ANN entry points, so the a05/x12
    contract frame applies unchanged.

    ``index`` (optional) carries a prebuilt
    ``{"ivf": build_ivf_index(...), "books": train_pq(...),
    "codes": encode_pq(...)}`` — the dataset_memo pattern; built
    inline (unpersisted) for one-shot callers.

    At scale the three stages touch successively less data: the cell
    filter prunes to ~nprobe/n_cells of the corpus, ADC scans only
    integer codes for the survivors, and exact scoring reads float
    vectors for refine_factor × k rows — the only stage that touches
    them.

    Metric note (r11 review): the ADC shortlist ranks by approximate
    INNER PRODUCT while cell probing and the final stage rank by
    COSINE — on a corpus with widely varying norms a low-norm
    high-cosine vector can be out-scored on ADC dot and fall outside
    the refine_factor·k shortlist the exact stage re-scores. On the
    synthetic corpus norms are tightly clustered and the measured
    recall floor (x89's contract, refine_factor swept) absorbs the
    gap; a deployment on unnormalized embeddings should L2-normalize
    at ingest — dot then ≡ cosine and the three stages share one
    metric (the r12+ candidate is normalizing inside
    train_pq/encode_pq, which changes codes and therefore needs its
    own recall re-sweep before touching the registered x89)."""
    from duckdb_retail_pipeline_spark.operators.similarity import (
        build_ivf_index,
        probe_cos,
    )

    dim = len(query_vec)
    if index is None:
        ivf = build_ivf_index(
            emb, n_cells, id_col=id_col, vec_col=vec_col, persist=False
        )
        books = train_pq(
            emb, dim=dim, m=m, k_codes=k_codes, id_col=id_col, vec_col=vec_col
        )
        codes = encode_pq(emb, books, dim=dim, id_col=id_col, vec_col=vec_col)
    else:
        ivf, books, codes = index["ivf"], index["books"], index["codes"]

    cents = ivf["cents"]
    probe_cells = sorted(
        range(len(cents)), key=lambda i: -probe_cos(query_vec, cents[i])
    )[:nprobe]
    cand_ids = ivf["assigned"].filter(
        F.col("__cell").isin(*probe_cells)
    ).select(id_col)

    shortlist = adc_topk(
        codes.join(cand_ids, id_col, "left_semi"),
        books,
        query_vec,
        k=refine_factor * k,
        id_col=id_col,
    ).select(id_col)

    q = F.array(*[F.lit(float(x)) for x in query_vec])
    exact = emb.join(F.broadcast(shortlist), id_col, "left_semi").select(
        F.col(id_col),
        F.round(V.cosine_similarity(F.col(vec_col), q), 4).alias("cosine"),
    )
    return exact.orderBy(F.col("cosine").desc(), F.col(id_col).asc()).limit(k)
