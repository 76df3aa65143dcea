"""Per-stage empirical profile of one registry query (guide §1/§7).

Runs the named query once via the noop sink, then walks the local
Spark UI REST API (port from ``spark.ui.port``/4040) and prints every
job and stage of that run with wall duration, task count, shuffle
read/write bytes, and the first line of the stage's name — the
"where does the time actually go" view the optimization guide asks
for before touching anything.

Usage: python tools/stageprof.py [--sf-dir DIR] [--reps N] query
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from datalake_backend_spark import get_spark  # noqa: E402
from datalake_backend_spark.queries import QUERIES  # noqa: E402


def _api(base: str, path: str):
    with urllib.request.urlopen(base + path, timeout=10) as r:
        return json.load(r)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=1)
    ap.add_argument("name")
    args = ap.parse_args()

    spark = get_spark("stageprof")
    matches = [q for q in QUERIES if q == args.name or q.startswith(args.name)]
    if len(matches) != 1:
        raise SystemExit(f"{args.name}: matches {matches}")
    qname = matches[0]

    # warmup mirrors bench.py
    QUERIES["q01_pricing_summary"].fn(spark, args.sf_dir).write.format(
        "noop"
    ).mode("overwrite").save()

    sc = spark.sparkContext
    ui = sc.uiWebUrl  # e.g. http://host:4040
    app_id = sc.applicationId
    base = f"{ui}/api/v1/applications/{app_id}"

    for rep in range(args.reps):
        jobs_before = {j["jobId"] for j in _api(base, "/jobs")}
        sc.setJobDescription(f"stageprof {qname} #{rep}")
        t0 = time.perf_counter()
        QUERIES[qname].fn(spark, args.sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        wall = time.perf_counter() - t0
        sc.setJobDescription(None)

        jobs = [
            j for j in _api(base, "/jobs") if j["jobId"] not in jobs_before
        ]
        jobs.sort(key=lambda j: j["jobId"])
        print(f"\n=== {qname} rep {rep}: wall {wall:.3f}s, {len(jobs)} jobs ===")
        stage_meta = {s["stageId"]: s for s in _api(base, "/stages")}
        total_stage_ms = 0
        for j in jobs:
            jdur = ""
            print(
                f"job {j['jobId']}{jdur}: {j.get('description', '')[:60]!r} "
                f"stages={sorted(j['stageIds'])}"
            )
            for sid in sorted(j["stageIds"]):
                s = stage_meta.get(sid)
                if s is None or s.get("status") == "SKIPPED":
                    print(f"  stage {sid}: SKIPPED")
                    continue
                dur = (s.get("executorRunTime") or 0) / 1000.0
                first_sub = s.get("firstTaskLaunchedTime")
                comp = s.get("completionTime")
                wall_ms = ""
                try:
                    from datetime import datetime

                    fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
                    a = datetime.strptime(first_sub, fmt)
                    b = datetime.strptime(comp, fmt)
                    w = (b - a).total_seconds()
                    wall_ms = f" wall={w:.2f}s"
                    total_stage_ms += w
                except Exception:  # noqa: BLE001
                    pass
                print(
                    f"  stage {sid}: tasks={s['numCompleteTasks']}"
                    f" exec={dur:.2f}s{wall_ms}"
                    f" in={s.get('inputBytes', 0) >> 20}MB"
                    f" sr={s.get('shuffleReadBytes', 0) >> 20}MB"
                    f" sw={s.get('shuffleWriteBytes', 0) >> 20}MB"
                    f"  {s['name'].splitlines()[0][:70]}"
                )
        print(f"rep {rep}: sum(stage walls)={total_stage_ms:.2f}s vs query wall {wall:.3f}s")


if __name__ == "__main__":
    main()
