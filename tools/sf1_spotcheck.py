"""sf1.0 spot-sweep (round-11 ask #5): hash-check the most expensive
registry rows at sf1.0 and record 0.1→1.0 scaling exponents.

For each named query: run Spark at sf0.1 (driver data) and sf1.0
(tools/gen_sf.py data, same distribution family), time both, and
value-hash-compare the sf1.0 result against the DuckDB twin on the
same files — the exact check the driver performs at sf0.01, an order
of magnitude further up. Prints a markdown table ready for
BENCH_SCALING.md.

Usage: python tools/sf1_spotcheck.py [sf1_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time
from collections import Counter

import duckdb

sys.path.insert(0, "/root/repo")

from datalake_backend_spark import get_spark  # noqa: E402
from datalake_backend_spark.queries import QUERIES  # noqa: E402
from datalake_backend_spark.sources.readers import TESTDATA_TABLES  # noqa: E402

DEFAULT_QUERIES = [
    "q178_entity_resolution",
    "r126_leakage_safe_split",
    "r170_personalized_pagerank",
    "r187_kcore",
    "r84_stream_stream_join",
    "r148_semantic_dedup",
    "q74_stateful_slot_tracker",
    "r76_dedup_clusters",
    "r146_tf_cosine_pairs",
    "q175_item_cooccurrence",
]

SF01 = "/root/testdata/sf0.1"


def _rows(df):
    cols = sorted(df.columns)
    return Counter(tuple(repr(r[c]) for c in cols) for r in df.collect()), cols


def main() -> int:
    sf1_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfgen/sf1.0"
    names = sys.argv[2:] or DEFAULT_QUERIES
    spark = get_spark("sf1-spotcheck")
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf1_dir}/{t}.parquet'"
        )
    print("| query | sf0.1 s | sf1.0 s | ratio | exponent | sf1.0 hash |")
    print("|---|---|---|---|---|---|")
    failures = 0
    for name in names:
        spec = QUERIES[name]
        try:
            # warm the JVM/plan path once at the small SF
            spec.fn(spark, "/root/testdata/sf0.01").count()
            t0 = time.time()
            spec.fn(spark, SF01).count()
            t_01 = time.time() - t0
            t0 = time.time()
            sdf = spec.fn(spark, sf1_dir)
            s_rows, s_cols = _rows(sdf)
            t_10 = time.time() - t0
        except Exception as e:  # noqa: BLE001 — keep sweeping, fail loud
            failures += 1
            print(f"| {name} | — | — | — | — | SPARK-ERROR {type(e).__name__}: {e!s:.120} |")
            continue
        verdict = "rows-only"
        if spec.oracle is not None:
            try:
                # fetchall(), NEVER .df(): pandas coerces DATE →
                # Timestamp and nullable BIGINT → float64, which
                # false-positives the repr compare (bit us in round 12
                # on r207's lag NULLs); check_oracle.py's native-type
                # path is the reference comparator
                rel = con.sql(spec.oracle)
                o_cols_raw = rel.columns
                o_fetched = rel.fetchall()
            except Exception as e:  # noqa: BLE001 — twin infeasible at
                # this SF (e.g. r146's 80 GB DuckDB spill); the Spark
                # side's health is still reported, not counted a failure
                verdict = f"oracle-infeasible ({type(e).__name__}: {e!s:.80})"
                o_fetched = None
            if o_fetched is not None:
                o_cols = sorted(o_cols_raw)
                idx = [o_cols_raw.index(c) for c in o_cols]
                o_rows = Counter(
                    tuple(repr(row[i]) for i in idx) for row in o_fetched
                )
                if s_cols != o_cols:
                    verdict, failures = f"COLS {s_cols} vs {o_cols}", failures + 1
                elif s_rows == o_rows:
                    verdict = f"OK ({sum(s_rows.values())} rows)"
                else:
                    only_s = sum((s_rows - o_rows).values())
                    only_o = sum((o_rows - s_rows).values())
                    verdict = f"HASH-MISMATCH (spark-only {only_s}, duck-only {only_o})"
                    failures += 1
        ratio = t_10 / t_01 if t_01 > 0 else float("inf")
        expo = math.log10(ratio) if ratio > 0 else float("nan")
        print(
            f"| {name} | {t_01:.2f} | {t_10:.2f} | {ratio:.1f}x "
            f"| {expo:.2f} | {verdict} |",
            flush=True,
        )
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
