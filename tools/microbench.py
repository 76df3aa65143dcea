"""Targeted per-query micro-bench: N isolated sequential reps per query.

The sandbox host shows ~25-30% same-code wall-clock spread on full
bench runs (round-14 CHANGELOG), which drowns per-query deltas. This
tool times ONLY the named queries, several reps each via the noop sink
(guide §1.4), and reports min/median/max — min-of-reps is the
noise-robust statistic for before/after comparisons of plan changes.

Usage: python tools/microbench.py [--reps N] [--sf-dir DIR] q1 [q2 ...]
Output: one JSON line per query + a trailing summary JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

# resolve the repo from the script location so the SAME tool runs
# against a before-worktree (PYTHONPATH-free A/B comparisons)
sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from datalake_backend_spark import get_spark  # noqa: E402
from datalake_backend_spark.queries import QUERIES  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    spark = get_spark("microbench")
    # warmup: JVM/codegen caches, parquet footers (mirrors bench.py)
    QUERIES["q01_pricing_summary"].fn(spark, args.sf_dir).write.format(
        "noop"
    ).mode("overwrite").save()

    out = {}
    for name in args.names:
        matches = [q for q in QUERIES if q == name or q.startswith(name)]
        if len(matches) != 1:
            print(f"skip {name}: matches {matches}", file=sys.stderr)
            continue
        qname = matches[0]
        times = []
        for i in range(args.reps):
            spark.sparkContext.setJobDescription(f"microbench {qname} #{i}")
            t0 = time.perf_counter()
            QUERIES[qname].fn(spark, args.sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            times.append(round(time.perf_counter() - t0, 3))
        rec = {
            "query": qname,
            "reps": times,
            "min": min(times),
            "median": round(statistics.median(times), 3),
            "max": max(times),
        }
        out[qname] = rec["min"]
        print(json.dumps(rec))
    print(json.dumps({"mins": out, "sum_min": round(sum(out.values()), 3)}))


if __name__ == "__main__":
    main()
