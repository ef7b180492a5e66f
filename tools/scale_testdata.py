"""Synthesize a larger scale factor from an existing testdata dir.

The driver ships sf{0.001,0.01,0.1}; the scaling contract ("would
this plan survive 100×?") needs at least one order-of-magnitude step
beyond the bench SF. This tool replicates the FACT tables of a source
SF k times with disjoint key ranges (dimension tables are copied
unchanged — dims stay fixed-size at any SF, which is exactly the
broadcast-join assumption the plans encode):

  orders     o_orderkey   += copy * stride  (o_custkey unchanged:
  lineitem   l_orderkey   += copy * stride   10x orders per customer)
  events     event_id     += copy * stride  (ts/user_id unchanged:
                                             10x events per hour/user)
  documents  doc_id       += copy * stride
  embeddings vec_id       += copy * stride  (copy 0 keeps vec_id 0 —
                                             the fixed ANN query vector)

Replication preserves value distributions and join fan-outs while
growing row counts linearly — good enough to measure whether a
per-query cost scales ~linearly in rows; it does NOT grow distinct
key cardinalities the way TPC-H dbgen would (documented caveat in
ROADMAP.md's scaling section).

With ``--grow-groups`` the replication also grows distinct-GROUP
cardinality ~k× (the r4 verdict's robustness ask: plain replication
keeps group counts flat, which flatters aggregation queries):

  orders/lineitem  every timestamp column += copy * retail_period
                   (one shared period = joint date span + 2 days, so
                   l_shipdate keeps its offset from o_orderdate) —
                   distinct dates/months/years grow k×, and the
                   calendar spine (pl03) genuinely widens k×
  events           ts += copy * events_period; user_id += copy *
                   stride — k× distinct hours AND k× distinct users
                   (sessionize/session-window group keys)
  documents        text gets a per-copy suffix token — k× distinct
                   contents, so content-keyed dedup/fingerprint/
                   repetition groups grow instead of collapsing into
                   10-copy duplicate clusters

  Dimension tables stay fixed (the broadcast assumption under test).
  embeddings       each copy's vectors get a deterministic ±0.05%
                   multiplicative perturbation (numpy PCG64 seeded
                   by copy index) — copies become DISTINCT vectors
                   that remain genuine near-duplicates (cosine to
                   the original ≈ 1-1e-7, far above every dup
                   threshold), so similarity queries stop seeing
                   bit-identical dups while near-dup structure and
                   LSH bucket stability survive.
  Plain (non-grow) mode replicates embeddings unchanged.

Usage:
    python tools/scale_testdata.py SRC_DIR DEST_DIR K [--grow-groups]
e.g.
    python tools/scale_testdata.py /root/testdata/sf0.1 /tmp/sf1_synth 10
    python tools/scale_testdata.py /root/testdata/sf0.1 /tmp/sf1_grow 10 --grow-groups
"""

from __future__ import annotations

import shutil
import sys
from pathlib import Path

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

DIM_TABLES = ("region", "nation", "customer", "supplier", "part")
FACT_KEYS: dict[str, tuple[str, ...]] = {
    "orders": ("o_orderkey",),
    "lineitem": ("l_orderkey",),
    "events": ("event_id",),
    "documents": ("doc_id",),
    "embeddings": ("vec_id",),
}
# one stride safely above every observed key range
STRIDE = 1_000_000_000


# group-growing extras: non-key columns strided per copy so distinct
# group-key cardinality scales with k (user ids share the key stride;
# they join to no dimension table)
GROW_ID_COLS: dict[str, tuple[str, ...]] = {"events": ("user_id",)}
_DAY_US = 86_400_000_000


def _ts_cols(table: pa.Table) -> list[str]:
    return [
        f.name for f in table.schema if pa.types.is_timestamp(f.type)
    ]


def _period_us(tables: list[pa.Table]) -> int:
    """One shift period for a family of tables: the joint span of all
    timestamp columns plus two days, so per-copy shifts never overlap
    and intra-family offsets (l_shipdate vs o_orderdate) survive."""
    lo, hi = None, None
    for t in tables:
        for c in _ts_cols(t):
            mm = pc.min_max(t.column(c)).as_py()
            lo = mm["min"] if lo is None else min(lo, mm["min"])
            hi = mm["max"] if hi is None else max(hi, mm["max"])
    span = int((hi - lo).total_seconds() * 1_000_000)
    return span + 2 * _DAY_US


def _perturb_vectors(col, seed: int):
    """Deterministic ±0.05% multiplicative noise per element (PCG64
    seeded by copy index): copies become distinct floats but stay
    near-duplicates of the original vector."""
    import numpy as np

    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if arr.null_count:
        # from_arrays(offsets, values) would DROP the validity bitmap,
        # silently turning null rows into empty lists — fail loudly
        # instead (shipped fixtures are null-free)
        raise ValueError("embeddings column contains nulls; perturbation would drop the null mask")
    # use the stored value dtype: a hardcoded float32 cast would
    # silently quantize float64 embeddings beyond the documented noise
    dtype = arr.type.value_type.to_pandas_dtype()
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(dtype)
    noise = np.random.default_rng(seed).uniform(-5e-4, 5e-4, size=flat.shape)
    perturbed = (flat * (1.0 + noise)).astype(dtype)
    return pa.ListArray.from_arrays(arr.offsets, pa.array(perturbed, type=arr.type.value_type))


def scale(src: Path, dest: Path, k: int, grow_groups: bool = False) -> None:
    dest.mkdir(parents=True, exist_ok=True)
    for t in DIM_TABLES:
        shutil.copy(src / f"{t}.parquet", dest / f"{t}.parquet")

    tables = {t: pq.read_table(src / f"{t}.parquet") for t in FACT_KEYS}
    periods: dict[str, int] = {}
    if grow_groups:
        retail = _period_us([tables["orders"], tables["lineitem"]])
        periods = {
            "orders": retail,
            "lineitem": retail,
            "events": _period_us([tables["events"]]),
        }

    for t, keys in FACT_KEYS.items():
        base = tables[t]
        grow_ids = GROW_ID_COLS.get(t, ()) if grow_groups else ()
        copies = []
        for i in range(k):
            if i == 0:
                copies.append(base)
                continue
            cols = {}
            for name in base.column_names:
                col = base.column(name)
                if name in keys or name in grow_ids:
                    col = pc.add(col, pa.scalar(i * STRIDE, type=pa.int64()))
                elif grow_groups and t in periods and pa.types.is_timestamp(col.type):
                    col = pc.add(
                        col, pa.scalar(i * periods[t], type=pa.duration("us"))
                    )
                elif grow_groups and t == "documents" and name == "text":
                    col = pc.binary_join_element_wise(
                        col, pa.scalar(f"gg{i}"), pa.scalar(" ")
                    )
                elif grow_groups and t == "documents" and name == "n_chars":
                    # keep the stored length in sync with the " ggN"
                    # suffix appended to text above — a stale n_chars
                    # breaks the n_chars == length(text) invariant
                    # every text-stats consumer relies on
                    col = pc.add(
                        col,
                        pa.scalar(len(f"gg{i}") + 1, type=pa.int64()),
                    )
                elif grow_groups and t == "embeddings" and name == "embedding":
                    col = _perturb_vectors(col, seed=i)
                cols[name] = col
            copies.append(pa.table(cols, schema=base.schema))
        out = pa.concat_tables(copies)
        pq.write_table(out, dest / f"{t}.parquet")
        print(f"{t}: {base.num_rows} -> {out.num_rows} rows")


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if a != "--grow-groups"]
    grow = "--grow-groups" in sys.argv[1:]
    if len(args) != 3:
        sys.exit(__doc__)
    scale(Path(args[0]), Path(args[1]), int(args[2]), grow_groups=grow)
