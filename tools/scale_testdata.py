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

Usage:
    python tools/scale_testdata.py SRC_DIR DEST_DIR K
e.g.
    python tools/scale_testdata.py /root/testdata/sf0.1 /tmp/sf1_synth 10
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


def scale(src: Path, dest: Path, k: int) -> None:
    dest.mkdir(parents=True, exist_ok=True)
    for t in DIM_TABLES:
        shutil.copy(src / f"{t}.parquet", dest / f"{t}.parquet")
    for t, keys in FACT_KEYS.items():
        base = pq.read_table(src / f"{t}.parquet")
        copies = []
        for i in range(k):
            if i == 0:
                copies.append(base)
                continue
            cols = {}
            for name in base.column_names:
                col = base.column(name)
                if name in keys:
                    col = pc.add(col, pa.scalar(i * STRIDE, type=pa.int64()))
                cols[name] = col
            copies.append(pa.table(cols, schema=base.schema))
        out = pa.concat_tables(copies)
        pq.write_table(out, dest / f"{t}.parquet")
        print(f"{t}: {base.num_rows} -> {out.num_rows} rows")


if __name__ == "__main__":
    if len(sys.argv) != 4:
        sys.exit(__doc__)
    scale(Path(sys.argv[1]), Path(sys.argv[2]), int(sys.argv[3]))
