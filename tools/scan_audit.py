"""Repeated-scan audit: how many times does each query's physical plan
scan the same parquet table?

The round-14 association rework found q175/r197 scanning lineitem 2-4x
because structurally-identical DataFrame subtrees are NOT shared by
Spark unless an exchange canonicalizes equal (ReusedExchange) or the
builder shares one frame explicitly. A table scanned >= `--threshold`
times in one plan is the signature of that bug class — each extra scan
is a full pass over the input at 100 TB.

Usage: python tools/scan_audit.py [--sf-dir DIR] [--threshold N]
Prints one line per flagged query: scans-per-table and the reuse count.
"""

from __future__ import annotations

import argparse
import contextlib
import io
import os
import re
import sys
from collections import Counter

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from datalake_backend_spark import get_spark  # noqa: E402
from datalake_backend_spark.queries import QUERIES  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--threshold", type=int, default=3)
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    spark = get_spark("scan_audit")
    names = args.names or list(QUERIES)
    flagged = 0
    for name in names:
        try:
            df = QUERIES[name].fn(spark, args.sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
        except Exception as e:  # noqa: BLE001
            print(f"{name}: ERR {type(e).__name__}: {e}", file=sys.stderr)
            continue
        # the details section carries one "(n) Scan parquet" block per
        # scan with its Location path. Anchor on the Location lines of
        # those blocks directly (round-14 ADVICE: a bounded
        # Scan-to-Location span silently dropped scans whose
        # PushedFilters/ReadSchema ran long — undercounting exactly
        # the complex plans this audit targets). A block ends at the
        # next "(n) ..." header, so scope each scan block explicitly.
        scans: Counter = Counter()
        for block in re.split(r"^(?=\(\d+\) )", plan, flags=re.M):
            if not block.startswith("(") or "Scan parquet" not in block.split(
                "\n", 1
            )[0]:
                continue
            loc = re.search(
                r"^Location:[^\n]*?([a-zA-Z_0-9]+)\.parquet", block, re.M
            )
            if loc:
                scans[loc.group(1)] += 1
        header = plan.split("\n\n", 1)[0]
        reused = len(re.findall(r"ReusedExchange", header))
        hot = {t: n for t, n in scans.items() if n >= args.threshold}
        if hot:
            flagged += 1
            print(
                f"{name}: {hot} (total scans {sum(scans.values())},"
                f" reused_exchange {reused})"
            )
    print(f"-- flagged {flagged}/{len(names)}")


if __name__ == "__main__":
    main()
