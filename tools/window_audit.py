"""Audit every registry query's executed plan for UNPARTITIONED
window nodes — the single-task scale hazard class (round 14: q179's
final sweep was found exactly this way, via the WindowExec warning
during an sf1.0 spot-check).

A `Window` node prints as ``Window [exprs], [partitionSpec], [order]``
when partitioned and ``Window [exprs], [order]`` when global; this
tool builds each query's physical plan (no execution) and reports
every global window with a snippet of its CHILD node, so each hit can
be classified: bounded metadata rows (the two-phase prefix idiom —
fine) vs raw data (a bug).

Usage: python tools/window_audit.py [sf_dir]
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")

from datalake_backend_spark import get_spark  # noqa: E402
from datalake_backend_spark.queries import QUERIES  # noqa: E402


def bracket_groups(s: str) -> list[str]:
    """Top-level [...] groups of a Window node argument string."""
    groups, depth, cur = [], 0, []
    for ch in s:
        if ch == "[":
            depth += 1
            if depth == 1:
                cur = []
                continue
        elif ch == "]":
            depth -= 1
            if depth == 0:
                groups.append("".join(cur))
                continue
        if depth >= 1:
            cur.append(ch)
    return groups


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("window-audit")
    hits: dict[str, list[str]] = {}
    errors: list[str] = []
    for name, spec in QUERIES.items():
        try:
            plan = (
                spec.fn(spark, sf_dir)
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
        except Exception as e:  # noqa: BLE001
            errors.append(f"{name}: {type(e).__name__}")
            continue
        lines = plan.splitlines()
        for i, ln in enumerate(lines):
            m = re.search(r"\bWindow (\[.*)$", ln)
            if not m:
                continue
            groups = bracket_groups(m.group(1))
            # toString shapes: [exprs],[part],[order] (3 groups);
            # [exprs],[part] for partition-only (no order);
            # [exprs],[order] for GLOBAL ordered (order entries carry
            # ASC/DESC); [exprs] for global partition-less totals.
            if len(groups) >= 3:
                continue
            if len(groups) == 2 and not re.search(
                r"\b(ASC|DESC)\b", groups[1]
            ):
                continue  # partition-only window — partitioned, fine
            child = ""
            for nxt in lines[i + 1 : i + 4]:
                t = nxt.strip().lstrip(":+- *(0123456789)")
                if t and "WholeStageCodegen" not in t:
                    child = t[:60]
                    break
            hits.setdefault(name, []).append(
                f"order=[{groups[-1][:50]}] child={child}"
            )
    for name in sorted(hits):
        for h in sorted(set(hits[name])):
            print(f"{name}\t{h}")
    print(f"-- {len(hits)} queries with global windows; errors: {errors}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
