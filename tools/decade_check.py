"""Decade-point harness for a registered query: timings that carry
their own evidence.

The pl09 record correction (ROADMAP r10 state #9) showed how a
decade measurement can silently run against the wrong directory —
"5.40 s at 100×" was a 10× number, and nothing in the recorded line
could have caught it. This harness prints, next to every timing,
the facts that make the measurement self-auditing:

- the RESOLVED data dir and its lineitem/documents row counts
  (5.8M vs 58M rows distinguishes 10× from 100× at a glance);
- result row count and a stable value checksum (first collect),
  so a re-measurement on supposedly-identical data can also
  confirm the VALUES reproduced, not just the speed.

Usage:
    python tools/decade_check.py QUERY_NAME SF_DIR [WARM_RUNS]
e.g.
    python tools/decade_check.py x94_pagerank_dangling /tmp/sf10_grow 3
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    name, sf_dir = sys.argv[1], os.path.abspath(sys.argv[2])
    warm_runs = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    from duckdb_retail_pipeline_spark.queries import REGISTRY
    from duckdb_retail_pipeline_spark.session import get_spark

    spec = REGISTRY[name]
    spark = get_spark(app_name=f"decade-{name}")
    spark.sparkContext.setLogLevel("ERROR")

    for t in ("lineitem", "documents"):
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            n = spark.read.parquet(p).count()
            print(f"dir={sf_dir} {t}_rows={n}")

    t0 = time.time()
    rows = spec.fn(spark, sf_dir).collect()
    cold = time.time() - t0
    # honesty guard (r11: an isolated x07 "re-measurement" read
    # 394 s cold where bench's count()-based number was 174 s — the
    # collect of its 34.7M result rows plus the per-row Python
    # checksum WAS most of the measurement): this tool times
    # collect-to-driver, which is the right witness only when the
    # result is small. Flag big results loudly instead of letting
    # the number masquerade as operator cost.
    if len(rows) > 1_000_000:
        print(
            f"WARNING: {name} returned {len(rows)} rows — this timing "
            "is dominated by the driver-side collect + checksum, NOT "
            "the operator; use bench.py's count()-based timing for "
            "large-output queries",
            flush=True,
        )
    # order-independent checksum over the row SET — a re-run on
    # identical data must reproduce it bit-for-bit; ONE shared
    # implementation (tools/_util.py) so this tool and
    # pl09_bucket_ab can never drift apart (r11 review)
    from tools._util import row_set_checksum

    checksum = row_set_checksum(rows)
    print(
        f"{name}: cold={cold:.2f}s result_rows={len(rows)} "
        f"checksum={checksum}"
    )

    ts = []
    for _ in range(warm_runs):
        t0 = time.time()
        spec.fn(spark, sf_dir).collect()
        ts.append(time.time() - t0)
    print(
        f"{name}: warm={[round(x, 2) for x in ts]} "
        f"median={statistics.median(ts):.2f}s dir={sf_dir}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
