"""Driver-window breadth audit: per-family last-driver-green round.

The driver verifies the FIRST 50 registry rows per round
(CORRECTNESS_r{N}.json); everything else relies on the local/judge
oracle sweep. Rotations should maximize time-since-driver-coverage
per FAMILY, not per hand-picked row — this tool derives that table
from the committed correctness files plus the live registry, so each
round's shortlist is data, not curation.

Rows are tracked by name STEM (the part after the q/r prefix):
rotations rename q<->r but preserve the stem, so a stem's history
survives promotion/demotion.

Usage: python tools/driver_window_audit.py [--markdown]
"""

from __future__ import annotations

import glob
import json
import re
import sys

sys.path.insert(0, "/root/repo")

from datalake_backend_spark.queries import QUERIES  # noqa: E402

# Coarse family key: first dash-segment of the first survey_ops tag.
# Classic SURVEY §2 letter codes (J1, A13, W7...) collapse to their
# letter; pipeline-* rows keep the pipeline prefix.
_LETTER = re.compile(r"^([A-Z])[0-9]")


def family(survey_ops: str) -> str:
    first = survey_ops.split(",")[0].strip()
    m = _LETTER.match(first)
    if m:
        return f"core-{m.group(1)}"
    return first.split("-")[0] if "-" in first else first


def last_green_by_stem() -> dict[str, int]:
    last: dict[str, int] = {}
    for f in sorted(glob.glob("/root/repo/CORRECTNESS_r*.json")):
        rnd = int(re.search(r"r0*(\d+)", f).group(1))
        for k, v in json.load(open(f)).items():
            if v.get("rows_match") and v.get("err") is None:
                last[k[1:]] = rnd
    return last


def audit() -> list[tuple[str, int, int, int, str, str]]:
    """Per family: (family, n_rows, n_driver_green_ever,
    last_driver_green_round, freshest_row, stalest_reserve_row)."""
    last = last_green_by_stem()
    fams: dict[str, list[tuple[str, int]]] = {}
    for name, spec in QUERIES.items():
        fams.setdefault(family(spec.survey_ops), []).append(
            (name, last.get(name[1:], 0))
        )
    rows = []
    for fam, members in sorted(fams.items()):
        green = [m for m in members if m[1] > 0]
        last_rnd = max((r for _, r in members), default=0)
        freshest = max(members, key=lambda m: m[1])[0] if green else "—"
        reserve_never = [n for n, r in members if r == 0]
        rows.append(
            (
                fam,
                len(members),
                len(green),
                last_rnd,
                freshest,
                reserve_never[0] if reserve_never else "—",
            )
        )
    return sorted(rows, key=lambda r: (r[3], -r[1]))


def main() -> None:
    rows = audit()
    print(
        "| Family | Rows | Ever driver-green | Last driver round "
        "| Freshest row | Never-driver candidate |"
    )
    print("|---|---|---|---|---|---|")
    for fam, n, g, rnd, fresh, cand in rows:
        print(
            f"| {fam} | {n} | {g} | {rnd if rnd else 'never'} "
            f"| {fresh} | {cand} |"
        )


if __name__ == "__main__":
    main()
