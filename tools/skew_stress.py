"""Skew-stress: the blocked/salted join rows on Zipf-hot keys
(round-11 VERDICT ask #6).

The sf generators draw join keys uniformly, so the per-round bench
never exercises the hot-key skew a 100 TB cluster actually sees. This
runs the flagged queries on two same-size sf0.1 datasets — uniform
keys vs ``--zipf 1.2`` keys (`tools/gen_sf.py`; at a=1.2 the hottest
customer carries ~21% of all orders) — and reports the skewed/uniform
time ratio. A blowup > 2× means the operator's blocking/salting does
NOT hold under skew and needs a fix (salting or AQE skew-join).

Prep:
  python tools/gen_sf.py 0.1 /tmp/sfgen/sf0.1-uni
  python tools/gen_sf.py 0.1 /tmp/sfgen/sf0.1-zipf --zipf 1.2
Usage:
  python tools/skew_stress.py [query ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from datalake_backend_spark import get_spark  # noqa: E402
from datalake_backend_spark.queries import QUERIES  # noqa: E402

UNI = "/tmp/sfgen/sf0.1-uni"
ZIPF = "/tmp/sfgen/sf0.1-zipf"

#: the rows whose candidate generation depends on key distribution:
#: skew-salted join, co-purchase graph (hot supplier fan-in), exact
#: set-similarity join (hot tokens), ER blocking, plus the heavy-agg
#: control rows whose map-side combine should make them skew-immune
DEFAULT_QUERIES = [
    "r88_salted_join",
    "r206_bounded_sssp",
    "r166_set_similarity_join",  # demoted to reserve in round 14
    "q178_entity_resolution",
    "q04_order_rollup",  # control: partial-agg should absorb skew
    "r40_salted_agg",  # control: explicitly salted aggregate
]


def main() -> int:
    names = sys.argv[1:] or DEFAULT_QUERIES
    spark = get_spark("skew-stress")
    print("| query | uniform s | zipf-1.2 s | skew ratio |")
    print("|---|---|---|---|")
    worst = 0.0
    for name in names:
        fn = QUERIES[name].fn
        fn(spark, "/root/testdata/sf0.01").count()  # warm plan path
        times = {}
        for tag, d in (("uni", UNI), ("zipf", ZIPF)):
            best = float("inf")
            for _ in range(2):  # best-of-2 damps cache warmth noise
                t0 = time.time()
                fn(spark, d).count()
                best = min(best, time.time() - t0)
            times[tag] = best
        ratio = times["zipf"] / times["uni"]
        worst = max(worst, ratio)
        print(
            f"| {name} | {times['uni']:.2f} | {times['zipf']:.2f} "
            f"| {ratio:.2f}x |",
            flush=True,
        )
    print(f"\nworst skew ratio: {worst:.2f}x (target: < 2x)")
    return 1 if worst > 2.0 else 0


if __name__ == "__main__":
    raise SystemExit(main())
