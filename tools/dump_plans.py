"""Dump ``.explain("formatted")`` for named registry queries to files.

Usage: python tools/dump_plans.py OUTDIR SUFFIX q1 [q2 ...]

Writes ``OUTDIR/<query>_<SUFFIX>.txt`` for each query — the plan
evidence the optimization rounds commit under ``plans/r<N>/`` (run once
from the pre-change tree for ``before``, once from the changed tree for
``after``).
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datalake_backend_spark import get_spark  # noqa: E402
from datalake_backend_spark.queries import QUERIES  # noqa: E402


def main() -> None:
    outdir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark("dump_plans")
    for name in names:
        matches = [q for q in QUERIES if q == name or q.startswith(name)]
        if len(matches) != 1:
            print(f"skip {name}: matches {matches}", file=sys.stderr)
            continue
        qname = matches[0]
        df = QUERIES[qname].fn(spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(outdir, f"{qname}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
