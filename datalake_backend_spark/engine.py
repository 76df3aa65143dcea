"""Engine facade — the reference's per-upload lifecycle, Spark-first.

A user of the reference drives it via ``POST /upload_2_<domain>``
(``Send_Data_To_DataLake/main.py:38-151``): land raw JSON → basic
preprocessing → write ``processed`` → advanced preprocessing → write
``refine`` → split feature files → index into the search tier. This
facade is that lifecycle with the same zone names and status protocol
(``1`` ok, ``-1`` empty/skip — ``Preprocess_Json_Data/main.py:70,147-149``)
— minus the anti-patterns: one long-lived session, no driver-side
enrichment, JSON document shapes rendered on the cluster, columnar gold
zone alongside the compatibility JSON.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from datalake_backend_spark.config import get_spark
from datalake_backend_spark.core.cleaning import non_empty
from datalake_backend_spark.operators.renest import renest_frames
from datalake_backend_spark.pipelines import get_pipeline
from datalake_backend_spark.pipelines.splitter import SPLIT_SPECS, run_splitter
from datalake_backend_spark.serving.export import write_bulk_export
from datalake_backend_spark.serving.views import (
    register_gold,
    register_serving_views,
    register_versioned_gold,
    serve_gold_where,
)
from datalake_backend_spark.sources.readers import read_raw_json, split_corrupt
from datalake_backend_spark.sources.writers import (
    json_array_document,
    write_json_document,
    write_table,
)

#: frame-level columns per domain for processed-zone re-nesting
FRAME_COLS: dict[str, list[str]] = {
    "vehicle": ["frame_number", "congestion_level", "traffic_light"],
    "people": ["frame_number", "timestamp"],
    "safety": ["frame_number"],
    "pose": ["frame_number"],
    "animal": ["frame_number_frame", "timestamp_frame"],
    "parking": ["video_source", "frame_number", "timestamp_sec"],
    "geolocation": ["frame_number"],
    "common": ["frame_number"],
    "school": ["frame_number", "frame_timestamp"],
    "retail": ["frame_number", "frame_timestamp"],
    "tracking": ["video_metadata", "processing_time", "summary"],
}

STATUS_OK = 1
STATUS_EMPTY = -1


@dataclass
class ProcessResult:
    status: int
    domain: str
    silver_rows: int = 0
    gold_rows: int = 0
    corrupt_docs: int = 0
    constraint_violations: int = 0
    outputs: dict[str, str] = field(default_factory=dict)


class Engine:
    """Long-lived engine instance over one SparkSession."""

    def __init__(self, spark: SparkSession | None = None):
        self.spark = spark or get_spark()

    def process_document(
        self,
        path: str,
        domain: str,
        out_dir: str,
        export_index: bool = False,
        versioned_gold: bool = False,
        constraints: list | None = None,
    ) -> ProcessResult:
        """Full lifecycle for one raw detection document (or a glob of
        them): bronze → silver parquet + processed JSON → gold parquet +
        refined JSON → feature splits → optional bulk index export.

        ``versioned_gold=True`` routes the gold zone through
        :class:`~datalake_backend_spark.sources.versioned.VersionedTable`:
        every upload commits a SNAPSHOT, so the upload history is a
        queryable commit log — re-uploads never tear concurrent readers
        (the reference gets coarse atomicity by overwriting whole MinIO
        objects and readers can observe the gap), old uploads stay
        time-travelable, and ``changes()`` diffs any two uploads.

        ``constraints`` (rule dicts from
        :mod:`~datalake_backend_spark.operators.constraints`) runs a
        declarative validation pass over the SILVER zone — one extra
        aggregate job for any number of row rules — and attaches the
        per-rule report to ``result.outputs["constraint_report"]`` /
        ``result.constraint_violations``. Validation REPORTS rather
        than aborts: the zones still land (quarantining is the
        corrupt-split's job); a gate that wants to block can check the
        count before serving.
        """
        pipe = get_pipeline(domain)
        raw = read_raw_json(self.spark, path, domain=domain)
        clean, corrupt = split_corrupt(raw)
        n_corrupt = corrupt.count()
        silver = pipe.silver(clean)
        if not non_empty(silver):
            return ProcessResult(STATUS_EMPTY, domain, corrupt_docs=n_corrupt)

        result = ProcessResult(STATUS_OK, domain, corrupt_docs=n_corrupt)
        zones = {
            "silver": os.path.join(out_dir, "silver", domain),
            "processed": os.path.join(out_dir, "processed", domain),
            "gold": os.path.join(out_dir, "gold", domain),
            "refine": os.path.join(out_dir, "refine", domain),
        }

        # zone layout at scale: partition by ingest date so time-bounded
        # reprocessing and retention prune at the directory level
        from pyspark.sql import Observation
        from pyspark.sql import functions as F

        # row counts ride the write job as observe() metrics — the
        # written parquet is not re-scanned just to count it
        obs_silver = Observation()
        write_table(
            silver.withColumn("ingest_date", F.current_date()).observe(
                obs_silver, F.count(F.lit(1)).alias("n")
            ),
            zones["silver"],
            partition_by=["ingest_date"],
        )
        result.silver_rows = int(obs_silver.get["n"])

        if constraints:
            from datalake_backend_spark.operators.constraints import (
                check_constraints,
            )

            report_path = os.path.join(out_dir, "constraints", domain)
            report = check_constraints(
                self.spark.read.parquet(zones["silver"]), constraints
            )
            write_table(report, report_path)
            report_df = self.spark.read.parquet(report_path)
            result.constraint_violations = int(
                report_df.agg(F.sum("violations")).first()[0] or 0
            )
            result.outputs["constraint_report"] = report_path

        # processed zone: re-nested frame JSON (the reference's shape)
        frame_cols = [c for c in FRAME_COLS[domain] if c in silver.columns]
        detail_cols = [c for c in silver.columns if c not in frame_cols]
        nested = renest_frames(
            silver, frame_cols, detail_cols, sort_cols=detail_cols[:1]
        )
        write_json_document(
            json_array_document(nested, sort_cols=frame_cols[:1]),
            zones["processed"],
        )

        gold = pipe.gold(silver)
        if versioned_gold:
            from datalake_backend_spark.sources.versioned import VersionedTable

            tbl = VersionedTable(zones["gold"])
            v = tbl.commit(gold, op="upload")
            result.gold_rows = int(tbl.manifest(v)["num_rows"])
            gold_df = tbl.read(self.spark, v)
            # selective serving reads route through footer-stats data
            # skipping (serve_gold_where / query_gold)
            register_versioned_gold(self.spark, domain, tbl, v)
        else:
            obs_gold = Observation()
            write_table(
                gold.observe(obs_gold, F.count(F.lit(1)).alias("n")),
                zones["gold"],
            )
            result.gold_rows = int(obs_gold.get["n"])
            # downstream consumers read the MATERIALIZED gold zone
            # (cheap columnar scan) instead of recomputing the gold
            # plan per sink
            gold_df = self.spark.read.parquet(zones["gold"])
        write_json_document(json_array_document(gold_df), zones["refine"])

        if domain in SPLIT_SPECS:
            for name, df in run_splitter(gold_df, domain).items():
                split_path = os.path.join(out_dir, "split", domain, name)
                write_table(df, split_path)
                result.outputs[f"split/{name}"] = split_path

        if export_index:
            idx_path = os.path.join(out_dir, "index", domain)
            id_col = gold_df.columns[0]
            write_bulk_export(gold_df, idx_path, f"datalake-{domain}-data", id_col)
            result.outputs["index"] = idx_path

        if not versioned_gold:
            register_gold(self.spark, domain, gold_df)
        result.outputs.update(zones)
        return result

    def refresh_serving_views(self) -> list[str]:
        """(Re)create dashboard views over every registered gold table."""
        return register_serving_views(self.spark)

    def sql(self, query: str) -> DataFrame:
        return self.spark.sql(query)

    def query_gold(
        self,
        domain: str,
        predicates: list[tuple],
        columns: list[str] | None = None,
    ) -> DataFrame:
        """Selective gold lookup: `[(col, op, val), ...]` routed
        through VersionedTable data skipping when the domain's gold is
        versioned (see serving.views.serve_gold_where)."""
        return serve_gold_where(self.spark, domain, predicates, columns)

    def process_media_dir(
        self,
        path: str,
        out_dir: str,
        perceptual: bool = True,
        versioned: bool = True,
    ) -> dict:
        """Media-ingest lifecycle, composing the multimodal tier end to
        end: a crawler-style DIRECTORY of media files → the
        ``mediafile`` DataSource (size-balanced partitions, header
        probing) → exact dedup (sha256 of payload bytes — byte-identical
        copies) → perceptual dedup (dHash for images, energy-gradient
        fingerprint for audio, frame-signature for video — re-encoded /
        container-swapped copies byte hashing misses; the keeper is the
        lowest surviving id per perceptual key) → a ``media`` zone,
        committed as a :class:`VersionedTable` snapshot so every ingest
        is time-travelable and concurrent readers never tear.

        Returns ``{"n_files", "n_exact_dups", "n_perceptual_dups",
        "n_kept", "version", "zone"}`` (``version`` None when
        ``versioned=False``). Dedup keys ride as columns
        (``content_sha``, ``phash_hi``/``phash_lo``/``vsig``) so
        downstream incremental ingests can probe them."""
        import os as _os

        from pyspark.sql import Window
        from pyspark.sql import functions as F

        from datalake_backend_spark.datapipe.multimodal import media_fingerprint
        from datalake_backend_spark.datapipe.phash import (
            audio_fingerprints,
            perceptual_hashes,
            video_phash_signature,
        )
        from datalake_backend_spark.sources.media_source import (
            register_media_source,
        )

        register_media_source(self.spark)
        media = (
            self.spark.read.format("mediafile").option("path", path).load()
        )

        # exact pass: byte-identical copies collapse on sha256. The
        # ranked frame is PERSISTED so the directory scan (the most
        # expensive stage at a 100 TB media dir: every payload read +
        # hashed) materializes exactly once; every later stage — the
        # perceptual hashers, the stat aggregates, the commit — replays
        # from cache, never from the source.
        hashed = media_fingerprint(media)
        w = Window.partitionBy("content_sha").orderBy("media_id")
        exact = hashed.withColumn("_rk", F.row_number().over(w)).persist()
        row = exact.agg(
            F.count("*").alias("n"),
            F.sum((F.col("_rk") > 1).cast("long")).alias("d"),
        ).first()
        n_files, n_exact_dups = int(row["n"]), int(row["d"] or 0)
        kept = exact.where(F.col("_rk") == 1).drop("_rk")

        n_perceptual_dups = 0
        n_kept = n_files - n_exact_dups
        if perceptual:
            # one perceptual key column per modality; NULL = no key
            # (undecodable / below-grid), which never collapses rows
            img_h = perceptual_hashes(kept).withColumnsRenamed(
                {"dhash_hi": "phash_hi", "dhash_lo": "phash_lo"}
            )
            aud_h = audio_fingerprints(kept).select(
                "media_id",
                F.col("dhash_hi").alias("afp_hi"),
                F.col("dhash_lo").alias("afp_lo"),
            )
            vid_h = video_phash_signature(kept).withColumnRenamed(
                "signature", "vsig"
            )
            keyed = (
                kept.join(img_h, "media_id", "left")
                .join(aud_h, "media_id", "left")
                .join(vid_h, "media_id", "left")
            )
            # concat_ws never returns NULL (NULL args -> ""), so each
            # branch must be gated on its key actually existing or
            # every keyless row would collapse into one "" group; the
            # modality prefix keeps an image hash from ever colliding
            # with a numerically-equal audio fingerprint
            pkey = F.coalesce(
                F.when(
                    F.col("phash_hi").isNotNull(),
                    F.concat_ws(":", F.lit("img"), "phash_hi", "phash_lo"),
                ),
                F.when(
                    F.col("afp_hi").isNotNull(),
                    F.concat_ws(":", F.lit("aud"), "afp_hi", "afp_lo"),
                ),
                F.when(
                    F.col("vsig").isNotNull(),
                    F.concat_ws(":", F.lit("vid"), "vsig"),
                ),
                F.concat(F.lit("id-"), F.col("media_id").cast("string")),
            )
            pw = Window.partitionBy(pkey).orderBy("media_id")
            # persisted: the count aggregate and the zone commit both
            # consume this frame — without the cache the second action
            # would re-decode every image/audio/video payload
            keyed = keyed.withColumn("_prk", F.row_number().over(pw)).persist()
            prow = keyed.agg(
                F.sum((F.col("_prk") > 1).cast("long")).alias("d"),
                F.sum((F.col("_prk") == 1).cast("long")).alias("k"),
            ).first()
            n_perceptual_dups = int(prow["d"] or 0)
            n_kept = int(prow["k"] or 0)
            kept = keyed.where(F.col("_prk") == 1).drop("_prk")

        zone = _os.path.join(out_dir, "media")
        version = None
        try:
            if versioned:
                from datalake_backend_spark.sources.versioned import (
                    VersionedTable,
                )

                version = VersionedTable(zone).commit(kept, op="media-ingest")
            else:
                kept.write.mode("overwrite").parquet(zone)
        finally:
            exact.unpersist()
            if perceptual:
                keyed.unpersist()
        return {
            "n_files": n_files,
            "n_exact_dups": n_exact_dups,
            "n_perceptual_dups": n_perceptual_dups,
            "n_kept": n_kept,
            "version": version,
            "zone": zone,
        }


# ---------------------------------------------------------------------------
# Silver graph tables: derive once, read many
# ---------------------------------------------------------------------------

_EDGE_TABLE_LOCK = __import__("threading").Lock()


def _sweep_stale_edge_tables(warehouse: str, prefix: str) -> None:
    """Remove pid-scoped edge-table dirs left by dead processes (same
    contract as the replay-fixture sweeper in ``queries.py``: each
    process owns exactly one dir, stale == pid no longer exists)."""
    import glob as globmod
    import shutil

    for d in globmod.glob(os.path.join(warehouse, prefix + "*")):
        pid = d.rsplit("_", 1)[-1]
        if not pid.isdigit() or int(pid) == os.getpid():
            continue
        try:
            os.kill(int(pid), 0)
        except ProcessLookupError:
            shutil.rmtree(d, ignore_errors=True)
        except OSError:
            pass  # alive but not ours (or unsupported) — leave it


def copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetrized customer↔supplier co-purchase edge table, served
    from a silver :class:`VersionedTable` that is derived ONCE per
    (process, sf_dir) and read by every graph query.

    At 100 TB nobody re-derives a graph per query: the distinct
    (custkey, suppkey) projection of orders⋈lineitem is a real
    shuffle+dedup over the two largest fact tables, and PageRank, BFS,
    and personalized PageRank all consume the SAME edges. The
    lakehouse answer is derive-once-into-a-versioned-silver-table,
    read-per-query — which also dogfoods the engine's own table layer
    (`VersionedTable`) in the hot analytic path. The stored table is
    the DIRECTED half (c → s, distinct); symmetrization is two cheap
    projections of the parquet scan, so storage stays halved and the
    read-side union preserves the exact row multiset the inline
    derivation produced (value hashes unchanged).

    Thread-safe under the bench runner's concurrent query threads
    (double-checked build under a module lock); pid-scoped dirs keep
    concurrent *processes* (driver correctness sweep vs local bench)
    isolated, and dirs from dead pids are swept on the next build.
    """
    from pyspark.sql import functions as F

    from datalake_backend_spark.sources.readers import table
    from datalake_backend_spark.sources.versioned import VersionedTable

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    warehouse = os.path.join(repo_root, "spark-warehouse")
    tag = f"{os.path.basename(sf_dir.rstrip('/'))}_{os.getpid()}"
    base = os.path.join(warehouse, f"graph_edges_{tag}")
    tbl = VersionedTable(base)
    with _EDGE_TABLE_LOCK:
        _sweep_stale_edge_tables(warehouse, "graph_edges_")
        if tbl.latest_version() is None:
            orders = table(spark, sf_dir, "orders")
            lineitem = table(spark, sf_dir, "lineitem")
            e0 = (
                orders.join(
                    lineitem, orders.o_orderkey == lineitem.l_orderkey
                )
                .select(
                    F.concat(F.lit("c"), F.col("o_custkey")).alias("c"),
                    F.concat(F.lit("s"), F.col("l_suppkey")).alias("s"),
                )
                .distinct()
            )
            # coalesce, not repartition: the distinct already shuffled,
            # so merging its output partitions is a narrow dependency —
            # no second full shuffle just to control file count
            tbl.commit(e0.coalesce(8), op="graph-edges-silver")
    e0 = tbl.read(spark)
    return e0.select(F.col("c").alias("src"), F.col("s").alias("dst")).union(
        e0.select(F.col("s").alias("src"), F.col("c").alias("dst"))
    )
