"""Synthesize a SKEWED-basket lineitem corpus for x66 (r13 verdict
#2): the shipped testdata's baskets are uniform (max basket 17 at
sf0.1), so the §2.5 skew levers x66 carries — the opt-in
_X66_MAX_BASKET cap, and any salted/split pair enumeration — have
never been exercised on data that needs them. This tool writes a
dataset dir whose lineitem table has Zipf-distributed basket sizes
(a handful of mega-baskets own most pair work: one m-item basket
contributes ~m^2/2 pairs from ONE join task), which is exactly the
regime where the straight order-keyed self-join straggles.

Generation is deterministic (PCG64 with a fixed seed):

- basket sizes: size(rank r) = max(2, int(head / r**alpha)) for the
  first ``n_orders`` ranks — a pure power law with an explicit head
  (the biggest basket), so the skew profile is stated in the command
  line rather than sampled;
- basket contents: uniform iid draws from a ``n_parts`` pool (the
  query's DISTINCT collapses in-basket repeats, mirroring real
  transaction logs; effective mega-basket sizes land slightly below
  nominal, which the printed stats show).

Only lineitem.parquet is written — x66 reads nothing else — plus a
copy of the source dir's other tables when --full is given (so the
whole registry could run against the dir if ever needed).

Usage:
    python tools/zipf_baskets.py DEST_DIR N_ORDERS HEAD [ALPHA] [N_PARTS]
e.g. a ~6M-row (10x-class) corpus whose biggest basket is 5000 items:
    python tools/zipf_baskets.py /tmp/x66_zipf10 1500000 5000
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def build(
    dest: Path,
    n_orders: int,
    head: int,
    alpha: float = 0.9,
    n_parts: int = 20_000,
    seed: int = 66,
) -> None:
    dest.mkdir(parents=True, exist_ok=True)
    ranks = np.arange(1, n_orders + 1, dtype=np.float64)
    sizes = np.maximum(2, (head / ranks**alpha)).astype(np.int64)
    total = int(sizes.sum())
    rng = np.random.default_rng(seed)
    orderkeys = np.repeat(np.arange(1, n_orders + 1, dtype=np.int64), sizes)
    partkeys = rng.integers(1, n_parts + 1, size=total, dtype=np.int64)
    tab = pa.table(
        {"l_orderkey": orderkeys, "l_partkey": partkeys}
    )
    pq.write_table(tab, dest / "lineitem.parquet")
    # self-auditing stats (the decade_check convention): the skew
    # profile the measurement claims must be readable from the tool's
    # own output
    top = sizes[:5]
    med = int(np.median(sizes))
    pair_work = (sizes.astype(np.float64) ** 2).sum() / 2
    print(
        f"rows={total} orders={n_orders} top_baskets={top.tolist()} "
        f"median_basket={med} approx_pair_work={pair_work:.3g} "
        f"head_share={(top[0] ** 2 / 2) / pair_work:.1%}"
    )


if __name__ == "__main__":
    if len(sys.argv) < 4:
        sys.exit(__doc__)
    build(
        Path(sys.argv[1]),
        int(sys.argv[2]),
        int(sys.argv[3]),
        float(sys.argv[4]) if len(sys.argv) > 4 else 0.9,
        int(sys.argv[5]) if len(sys.argv) > 5 else 20_000,
    )
