"""CLI entrypoint: ``python -m datalake_backend_spark <command>``.

The reference is operated as a set of driver scripts (upload a
document, rebuild a zone, export an index); this maps that workflow
onto the engine:

* ``process``  — run one document (or a glob) through bronze→silver→
  gold→splits for a domain, optionally into a versioned gold zone.
* ``query``    — run a registry query by name and print its rows
  (CSV to stdout) — the ad-hoc analytics path.
* ``views``    — register gold tables + serving views, then run an
  arbitrary ``spark.sql`` statement.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="datalake_backend_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    pp = sub.add_parser("process", help="ingest one raw document/glob")
    pp.add_argument("--path", required=True)
    pp.add_argument("--domain", required=True)
    pp.add_argument("--out", required=True)
    pp.add_argument("--versioned-gold", action="store_true")
    pp.add_argument("--export-index", action="store_true")

    qp = sub.add_parser("query", help="run a registry query")
    qp.add_argument("--name", required=True)
    qp.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    qp.add_argument("--limit", type=int, default=20)

    vp = sub.add_parser("views", help="run SQL over serving views")
    vp.add_argument("--sql", required=True)
    vp.add_argument("--limit", type=int, default=20)

    op = sub.add_parser("optimize", help="compact a versioned table")
    op.add_argument("--table", required=True)
    op.add_argument("--zorder", help="comma-separated columns (n >= 2)")
    op.add_argument("--target-mb", type=int, default=128)

    vc = sub.add_parser("vacuum", help="expire old versions' data")
    vc.add_argument("--table", required=True)
    vc.add_argument("--retain-last", type=int, default=2)
    vc.add_argument("--orphan-grace-hours", type=float)

    hp = sub.add_parser("history", help="print a versioned table's log")
    hp.add_argument("--table", required=True)

    rp = sub.add_parser("restore", help="RESTORE a versioned table")
    rp.add_argument("--table", required=True)
    rp.add_argument("--version", type=int, required=True)

    fp = sub.add_parser("fsck", help="manifest<->storage integrity check")
    fp.add_argument("--table", required=True)
    fp.add_argument("--version", type=int)

    mp = sub.add_parser(
        "process-media", help="ingest + dedup a media directory"
    )
    mp.add_argument("--path", required=True)
    mp.add_argument("--out", required=True)
    mp.add_argument("--no-perceptual", action="store_true")

    dp = sub.add_parser("delete", help="DELETE FROM a versioned table")
    dp.add_argument("--table", required=True)
    dp.add_argument("--where", required=True, help="SQL predicate")
    dp.add_argument(
        "--dv",
        action="store_true",
        help="merge-on-read deletion vectors (manifest-only commit) "
        "instead of copy-on-write",
    )

    sp = sub.add_parser(
        "sync-index", help="ship the gold table's CDF delta as bulk NDJSON"
    )
    sp.add_argument("--table", required=True)
    sp.add_argument("--cursor", required=True)
    sp.add_argument("--out", required=True)
    sp.add_argument("--index", required=True)
    sp.add_argument("--keys", required=True, help="comma-separated key columns")

    args = p.parse_args(argv)
    from datalake_backend_spark import get_spark

    spark = get_spark("cli")
    if args.cmd == "process":
        from datalake_backend_spark.engine import Engine

        res = Engine(spark).process_document(
            args.path,
            args.domain,
            args.out,
            export_index=args.export_index,
            versioned_gold=args.versioned_gold,
        )
        print(
            json.dumps(
                {
                    "status": res.status,
                    "domain": res.domain,
                    "silver_rows": res.silver_rows,
                    "gold_rows": res.gold_rows,
                    "corrupt_docs": res.corrupt_docs,
                    "outputs": res.outputs,
                }
            )
        )
        return 0 if res.status > 0 else 1
    if args.cmd == "query":
        from datalake_backend_spark.queries import QUERIES

        if args.name not in QUERIES:
            print(f"unknown query {args.name!r}", file=sys.stderr)
            return 2
        df = QUERIES[args.name].fn(spark, args.sf_dir).limit(args.limit)
        print(",".join(df.columns))
        for row in df.collect():
            print(",".join("" if v is None else str(v) for v in row))
        return 0
    if args.cmd == "views":
        df = spark.sql(args.sql).limit(args.limit)
        print(",".join(df.columns))
        for row in df.collect():
            print(",".join("" if v is None else str(v) for v in row))
        return 0
    if args.cmd == "sync-index":
        from datalake_backend_spark.serving.export import sync_index_incremental
        from datalake_backend_spark.sources.versioned import VersionedTable

        span = sync_index_incremental(
            spark,
            VersionedTable(args.table),
            args.cursor,
            args.out,
            args.index,
            args.keys.split(","),
        )
        print(json.dumps({"span": span}))
        return 0
    if args.cmd == "process-media":
        from datalake_backend_spark.engine import Engine

        print(
            json.dumps(
                Engine(spark).process_media_dir(
                    args.path, args.out, perceptual=not args.no_perceptual
                )
            )
        )
        return 0
    if args.cmd in ("optimize", "vacuum", "history", "restore", "fsck", "delete"):
        from datalake_backend_spark.sources.versioned import VersionedTable

        tbl = VersionedTable(args.table)
        if args.cmd == "delete":
            from pyspark.sql import functions as F

            before = tbl.manifest()["num_rows"]
            v = tbl.delete_where(
                spark, F.expr(args.where), mode="dv" if args.dv else "copy"
            )
            after = tbl.manifest(v)
            print(
                json.dumps(
                    {
                        "version": v,
                        "op": after["op"],
                        "rows_deleted": before - after["num_rows"],
                    }
                )
            )
        elif args.cmd == "restore":
            v = tbl.restore(args.version)
            print(json.dumps({"version": v, "restored_from": args.version}))
        elif args.cmd == "fsck":
            print(json.dumps(tbl.fsck(args.version)))
        elif args.cmd == "optimize":
            z = tuple(args.zorder.split(",")) if args.zorder else None
            v = tbl.compact(
                spark, target_bytes=args.target_mb << 20, zorder_by=z
            )
            print(json.dumps({"version": v, "files": tbl.file_count(v)}))
        elif args.cmd == "vacuum":
            grace = (
                args.orphan_grace_hours * 3600.0
                if args.orphan_grace_hours is not None
                else None
            )
            removed = tbl.vacuum(args.retain_last, orphan_grace_seconds=grace)
            print(json.dumps({"removed": removed}))
        else:
            for man in tbl.history():
                print(
                    json.dumps(
                        {
                            "version": man["version"],
                            "op": man["op"],
                            "num_rows": man["num_rows"],
                            "ts": man["ts"],
                        }
                    )
                )
        return 0
    return 2


if __name__ == "__main__":
    sys.exit(main())
