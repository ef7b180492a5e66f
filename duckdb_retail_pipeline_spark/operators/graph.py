"""Fixed-iteration PageRank over an edge frame, exact-integer.

The iterative vertex-centric shape the engine already uses for
connected components (dedup.py: min-label propagation + pointer
doubling), applied to the other classic graph signal: stationary
importance under random walks (Page/Brin/Motwani/Winograd 1999). The
retail instance ranks parts by co-purchase centrality — the same
computation a web-corpus curation pipeline runs over a link graph to
quality-weight documents, which is why a training-data engine carries
it as a first-class operator.

Determinism: floating-point PageRank sums per-node contributions in
shuffle order — not reproducible across engines or runs. This
implementation keeps ranks as INTEGER floor-scaled rationals (the
x54/x66/x87 convention): ranks start at ``scale`` (10^6), each
iteration's contribution is ``(rank * damp_num) DIV (damp_den *
outdeg)`` (integer division, all values positive so trunc ≡ floor),
and the damped base is ``(scale * (damp_den - damp_num)) DIV
damp_den``. Integer sums are fold-order-independent, so the result is
bit-identical in ANSI SQL — the oracle unrolls the same iterations as
CTEs.

Scale shape: each iteration is one hash join (edges ⋈ ranks on src —
ranks are node-sized, edges edge-sized) and one groupBy(dst) with
map-side partial sums; the (src, dst, outdeg) frame is built once and
persisted (one slot rotation) because every iteration re-reads it and
Spark does not dedupe common subplans. ``iters`` is a fixed small
constant — the plan unrolls linearly, no driver-side loop over
collected data. int64 headroom: a node's rank is bounded by the total
mass n_nodes × scale; at 10^9 nodes × 10^6 scale × damp_num=85 the
worst single term is ~8.5e16, inside int64.

Dangling nodes: a node with no out-edges contributes nothing (its
rank mass evaporates, the zero-redistribution convention); callers
that need mass conservation pass a symmetrized edge frame — the
co-purchase graph is symmetric by construction, so every node there
has outdeg ≥ 1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from duckdb_retail_pipeline_spark.memo import rotating_persist

SCALE = 10**6

# one-entry rotations: the (src, dst, outdeg) contribution frame
# (edge-sized, re-read once per iteration within one plan and across
# bench's repeated invocations) and the node-sized degree frame —
# WITHOUT the latter, r0 and the final outdeg join re-derive the
# degree aggregate from the raw edge build (the expensive distinct
# self-join) on every warm pass
_EDGE_SLOT: list = []
_DEG_SLOT: list = []


def copurchase_edges(lineitem: DataFrame) -> DataFrame:
    """Directed co-purchase edges: (src part, dst part) for every
    pair of DISTINCT parts sharing an order, both directions — the
    same order-keyed self-join bound as x66's Apriori candidates
    (per-basket quadratic by construction, the measured-and-accepted
    x66 shape)."""
    items = lineitem.select("l_orderkey", "l_partkey").distinct()
    a = items.select("l_orderkey", F.col("l_partkey").alias("src"))
    b = items.select("l_orderkey", F.col("l_partkey").alias("dst"))
    return (
        a.join(b, "l_orderkey")
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
    )


def pagerank(
    edges: DataFrame,
    iters: int = 3,
    scale: int = SCALE,
    damp_num: int = 85,
    damp_den: int = 100,
) -> DataFrame:
    """(node, outdeg, pagerank_scaled) after ``iters`` exact-integer
    iterations (module docstring). Nodes are the edge frame's
    distinct sources; on a symmetrized graph that is every vertex."""
    deg = rotating_persist(
        edges.groupBy("src").agg(
            F.count(F.lit(1)).cast("bigint").alias("outdeg")
        ),
        _DEG_SLOT,
    )
    # persist the contribution frame PARTITIONED BY src (the Pregel
    # layout): every iteration joins on src, so the cached frame's
    # HashPartitioning(src) satisfies the join's distribution and
    # only the node-sized rank frame shuffles per iteration — without
    # it both sides re-exchange edge-sized data every iteration
    # (measured at the 100× decade: warm 18.4 s -> see ROADMAP)
    edges_deg = rotating_persist(
        edges.join(deg, "src").repartition("src"), _EDGE_SLOT
    )
    base = (scale * (damp_den - damp_num)) // damp_den

    ranks = deg.select(
        F.col("src").alias("node"), F.lit(scale).cast("bigint").alias("r")
    )
    for _ in range(iters):
        contrib = edges_deg.join(
            ranks, edges_deg["src"] == ranks["node"]
        ).select(
            F.col("dst"),
            F.call_function(
                "div",
                F.col("r") * F.lit(damp_num),
                F.lit(damp_den) * F.col("outdeg"),
            ).cast("bigint").alias("c"),
        )
        ranks = (
            contrib.groupBy("dst")
            .agg(F.sum("c").cast("bigint").alias("s"))
            .select(
                F.col("dst").alias("node"),
                (F.lit(base) + F.col("s")).cast("bigint").alias("r"),
            )
        )
    return (
        ranks.join(deg, ranks["node"] == deg["src"])
        .select("node", "outdeg", F.col("r").alias("pagerank_scaled"))
    )
