"""Versioned parquet tables: snapshot isolation, time travel, change
feed, and compaction WITHOUT a table-format jar.

The reference's stated production shape is "DataFrame API over
Delta/Iceberg tables" (BASELINE.json), but neither package ships in
this environment (COVERAGE.md) and its actual deployed code gets
atomicity by overwriting whole MinIO objects per upload
(``Preprocess_Json_Data/connectors/minio_connector.py:45-80``) — no
versions, no isolation, readers can observe half-written prefixes.
This module supplies the lakehouse substrate both of those imply, as
a log of immutable manifests over immutable parquet data directories —
the same core design as Delta's ``_delta_log`` / Iceberg's metadata
tree, reduced to what plain parquet + an atomic file create can carry:

* **Snapshot isolation** — a commit writes a NEW data directory, then
  publishes an immutable manifest ``_log/{version}.json`` listing every
  directory in that snapshot. Readers resolve a manifest once and read
  only directories it names; a concurrent commit can never make them
  see a torn table.
* **Optimistic concurrency** — the manifest is created with
  ``open(..., "x")`` (atomic create-exclusive on POSIX; on an object
  store this maps to a conditional PUT / If-None-Match, which is
  exactly how Delta commits to S3). A loser re-reads the head and
  retries against the next version; its already-written data directory
  is reused, so conflict cost is one small JSON retry, not a data
  rewrite.
* **Time travel** — ``read(spark, version=N)`` resolves the historical
  manifest. Old data directories are never mutated, only vacuumed.
* **MERGE / DELETE** — ``merge`` routes through
  :func:`datalake_backend_spark.operators.merge.upsert` and commits the
  result; ``delete_where`` commits the complement. Both are
  copy-on-write (like Delta's default): the new snapshot rewrites data,
  the old snapshot stays readable.
* **Change feed** — ``changes`` diffs two snapshots with
  :func:`~datalake_backend_spark.operators.merge.snapshot_diff`,
  yielding the minimal insert/update/delete changelog between versions.
* **OPTIMIZE / VACUUM** — ``compact`` bin-packs the current snapshot
  into ~target-size files as a new metadata-only-visible version (same
  rows, fewer files — small-file pressure is the #1 operational issue
  for streaming ingest at 100 TB); ``vacuum`` deletes data directories
  referenced only by expired versions, with a retention floor so
  in-flight readers of retained versions are never broken.

Scale notes: manifests carry directory names, not per-row state, so a
commit is O(files touched) regardless of table size; at 1000-executor
scale the only serial point is the single manifest create, identical to
Delta's LogStore. The single-writer-per-table-per-instant model (losers
retry) is the standard object-store lakehouse contract.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class CommitConflict(RuntimeError):
    """Another writer published this version first (after retries)."""


class VersionedTable:
    """A versioned parquet table rooted at ``path``.

    Layout::

        path/
          _log/00000001.json   # manifest per version (immutable)
          data/00000001-<uuid>/part-*.parquet   # immutable data dirs
    """

    MANIFEST_WIDTH = 8

    def __init__(self, path: str):
        self.path = path
        self.log_dir = os.path.join(path, "_log")
        self.data_dir = os.path.join(path, "data")

    # ---------------------------------------------------------- log
    def _manifest_path(self, version: int) -> str:
        return os.path.join(self.log_dir, f"{version:0{self.MANIFEST_WIDTH}d}.json")

    def _versions(self) -> list[int]:
        if not os.path.isdir(self.log_dir):
            return []
        out = []
        for f in os.listdir(self.log_dir):
            if f.endswith(".json"):
                try:
                    out.append(int(f[: -len(".json")]))
                except ValueError:
                    continue
        return sorted(out)

    def latest_version(self) -> int | None:
        vs = self._versions()
        return vs[-1] if vs else None

    def manifest(self, version: int | None = None) -> dict:
        if version is None:
            version = self.latest_version()
            if version is None:
                raise FileNotFoundError(f"no commits at {self.path}")
        p = self._manifest_path(version)
        if not os.path.exists(p):
            raise FileNotFoundError(f"version {version} not found at {self.path}")
        with open(p) as fh:
            return json.load(fh)

    def history(self) -> list[dict]:
        """All manifests, oldest first (version, op, num_rows, ts, dirs)."""
        return [self.manifest(v) for v in self._versions()]

    # ------------------------------------------------------- commit
    def commit(
        self,
        df: DataFrame,
        mode: str = "overwrite",
        op: str | None = None,
        max_retries: int = 5,
        metadata: dict | None = None,
        partition_by: list[str] | None = None,
    ) -> int:
        """Write ``df`` as a new snapshot and publish it atomically.

        ``mode='overwrite'`` → the new snapshot is exactly ``df``;
        ``mode='append'`` → the new snapshot is the previous snapshot's
        directories plus ``df``'s. Returns the committed version.

        ``partition_by`` writes the data directory hive-partitioned;
        the manifest records the scheme and reads recover the partition
        columns (and their directory-level pruning) via ``basePath``.
        An append must use the same scheme as the snapshot it extends.

        The data directory is written ONCE; only the tiny manifest
        create is retried on conflict.
        """
        if mode not in ("overwrite", "append"):
            raise ValueError(f"mode must be overwrite|append, got {mode!r}")
        os.makedirs(self.log_dir, exist_ok=True)
        dir_name = f"{uuid.uuid4().hex[:12]}"
        rel_dir = f"data/{dir_name}"
        abs_dir = os.path.join(self.path, rel_dir)
        writer = df.write.mode("error")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(abs_dir)
        # spark doesn't report written-row counts on save(); one count
        # over the just-written files is metadata-cheap (footer stats)
        num_rows = df.sparkSession.read.parquet(abs_dir).count()

        schema_json = json.loads(df.schema.json())
        for _ in range(max_retries):
            head = self.latest_version()
            version = (head or 0) + 1
            mixed = False
            if mode == "append" and head is not None:
                prev = self.manifest(head)
                if prev.get("partition_by", []) != (partition_by or []):
                    raise ValueError(
                        "append partition scheme "
                        f"{partition_by or []} != snapshot's "
                        f"{prev.get('partition_by', [])}"
                    )
                dirs = prev["dirs"] + [rel_dir]
                total = prev["num_rows"] + num_rows
                # schema evolution: appending a widened/changed schema
                # flags the snapshot so reads merge parquet footers
                mixed = prev.get("mixed_schema", False) or (
                    prev.get("schema") != schema_json
                )
            else:
                dirs = [rel_dir]
                total = num_rows
            man = {
                "version": version,
                "op": op or mode,
                "ts": time.time(),
                "dirs": dirs,
                "num_rows": total,
                "partition_by": partition_by or [],
                "schema": schema_json,
                # snapshot spans data dirs with differing schemas →
                # reads must merge footers (schema evolution)
                "mixed_schema": mixed,
                # caller-supplied commit tags (e.g. a streaming epoch id
                # for replay-idempotent sinks)
                "metadata": metadata or {},
            }
            # Atomic commit point: write the FULL manifest to a temp
            # file, then hard-link it to the final name — link() is
            # create-exclusive AND the content is complete the instant
            # the name appears (a bare open('x') would expose an empty
            # file mid-write; a concurrent reader caught exactly that
            # in the 8-writer stress test). On an object store this is
            # a conditional PUT of the whole object.
            tmp = self._manifest_path(version) + f".tmp-{uuid.uuid4().hex[:8]}"
            with open(tmp, "w") as fh:
                json.dump(man, fh)
            try:
                os.link(tmp, self._manifest_path(version))
                return version
            except FileExistsError:
                continue  # lost the race; retry against new head
            finally:
                os.unlink(tmp)
        raise CommitConflict(
            f"lost {max_retries} commit races at {self.path}; giving up"
        )

    # --------------------------------------------------------- read
    def read(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        """Snapshot read. ``version=None`` → latest; else time travel."""
        man = self.manifest(version)
        paths = [os.path.join(self.path, d) for d in man["dirs"]]
        missing = [p for p in paths if not os.path.isdir(p)]
        if missing:
            raise FileNotFoundError(
                f"version {man['version']} was vacuumed: missing {missing}"
            )
        def reader():
            r = spark.read
            if man.get("mixed_schema"):
                # only evolved snapshots pay the footer-merge cost; a
                # homogeneous table stays on the single-footer fast path
                r = r.option("mergeSchema", "true")
            return r

        if man.get("partition_by"):
            # hive-partitioned dirs: each data dir is its own partition
            # root (basePath), so partition columns are recovered and
            # directory pruning applies per branch; the union of a few
            # branches keeps pushdown and pruning on every one
            dfs = [
                reader().option("basePath", p).parquet(p) for p in paths
            ]
            out = dfs[0]
            for d in dfs[1:]:
                out = out.unionByName(d, allowMissingColumns=True)
            return out
        return reader().parquet(*paths)

    # ----------------------------------------------- table mutations
    def merge(
        self, spark: SparkSession, updates: DataFrame, key_cols: list[str]
    ) -> int:
        """MERGE INTO (upsert) as copy-on-write: last-writer-wins by
        key against the latest snapshot, committed as a new version."""
        from datalake_backend_spark.operators.merge import upsert

        base = self.read(spark)
        return self.commit(
            upsert(base, updates, key_cols),
            op="merge",
            # copy-on-write ops preserve the snapshot's partition scheme
            partition_by=self.manifest().get("partition_by") or None,
        )

    def delete_where(self, spark: SparkSession, predicate) -> int:
        """DELETE FROM ... WHERE: commits the complement snapshot."""
        base = self.read(spark)
        return self.commit(
            base.where(~predicate),
            op="delete",
            partition_by=self.manifest().get("partition_by") or None,
        )

    def changes(
        self,
        spark: SparkSession,
        v_from: int,
        v_to: int,
        key_cols: list[str],
        compare_cols: list[str] | None = None,
    ) -> DataFrame:
        """Change data feed between two committed versions: the minimal
        insert/update/delete changelog (one full-outer key join)."""
        from datalake_backend_spark.operators.merge import snapshot_diff

        return snapshot_diff(
            self.read(spark, v_from), self.read(spark, v_to), key_cols, compare_cols
        )

    def create_view(
        self, spark: SparkSession, name: str, version: int | None = None
    ) -> None:
        """Register a snapshot as a temp view so ``spark.sql`` can
        query it — ``create_view(spark, "orders_v3", version=3)`` is
        the plain-parquet spelling of ``SELECT ... FROM t VERSION AS
        OF 3``. The view binds the manifest resolved NOW: later
        commits don't leak in (re-register to follow the head)."""
        self.read(spark, version).createOrReplaceTempView(name)

    # ------------------------------------------------- maintenance
    def compact(
        self,
        spark: SparkSession,
        target_bytes: int = 128 << 20,
        zorder_by: tuple | None = None,
        zorder_bits: int = 16,
    ) -> int:
        """OPTIMIZE: rewrite the current snapshot into ~target-size
        files (metadata-identical rows). Partition count derives from
        on-disk bytes of the current snapshot's files, so a table built
        from thousands of streaming micro-batch files collapses to a
        scan-efficient layout.

        ``zorder_by=(x_col, y_col)`` additionally range-partitions and
        sorts the rewrite by the Morton interleave of the two (integer,
        pre-quantized) columns — ``OPTIMIZE ... ZORDER BY``: every
        output file covers a compact (x, y) rectangle, so parquet
        min/max statistics prune files for predicates on EITHER
        dimension. Verified by the clustering test, which checks that
        per-file min/max ranges of both dims shrink vs the unsorted
        layout."""
        man = self.manifest()
        total_bytes = 0
        for d in man["dirs"]:
            for root, _dirs, files in os.walk(os.path.join(self.path, d)):
                total_bytes += sum(
                    os.path.getsize(os.path.join(root, f))
                    for f in files
                    if f.endswith(".parquet")
                )
        n_parts = max(1, -(-total_bytes // target_bytes))  # ceil div
        df = self.read(spark)
        if zorder_by is not None:
            from datalake_backend_spark.core.geometry import zorder_key

            x, y = zorder_by
            df = (
                df.withColumn(
                    "_zkey",
                    zorder_key(F.col(x), F.col(y), bits=zorder_bits),
                )
                .repartitionByRange(int(n_parts), "_zkey")
                .sortWithinPartitions("_zkey")
                .drop("_zkey")
            )
        else:
            df = df.coalesce(int(n_parts))
        return self.commit(
            df, op="compact", partition_by=man.get("partition_by") or None
        )

    def vacuum(self, retain_last: int = 2) -> list[str]:
        """Delete data directories referenced ONLY by versions older
        than the ``retain_last`` most recent. Retained versions (and
        any reader holding one) stay fully readable; older manifests
        remain as history but their exclusive data is gone.

        Only directories that some EXPIRED manifest references are
        candidates. A directory referenced by NO manifest is never
        touched: it is most likely an in-flight commit that wrote data
        but hasn't published yet, and deleting it would corrupt that
        commit the instant its manifest lands. The cost is that debris
        from a crashed commit needs an operator to remove — the same
        safe trade Delta's VACUUM makes with its retention window."""
        vs = self._versions()
        if not vs:
            return []
        keep_versions = set(vs[-retain_last:]) if retain_last > 0 else set()
        live: set[str] = set()
        expired_refs: set[str] = set()
        for v in vs:
            dirs = self.manifest(v)["dirs"]
            if v in keep_versions:
                live.update(dirs)
            else:
                expired_refs.update(dirs)
        removed = []
        for rel in sorted(expired_refs - live):
            target = os.path.join(self.path, rel)
            if os.path.isdir(target):
                shutil.rmtree(target, ignore_errors=True)
                removed.append(rel)
        return removed
