"""Snapshot-versioned table storage — the Spark-side replacement for the
reference's MVCC store (/root/reference/src/storage/mvcc.rs).

Model: the database is a directory of immutable version manifests.
Each manifest (JSON) maps table name → {schema, data path}. A committed
transaction publishes manifest N+1 with an atomic rename; readers pin a
manifest version for their whole transaction, which gives:

- snapshot isolation for reads (the reference's is_visible() semantics,
  mvcc.rs:182-218, reduced to the serialized-writer case its single mutex
  enforces anyway — mvcc.rs:84-95);
- `BEGIN READ ONLY AS OF SYSTEM TIME n` = read manifest n (mvcc.rs:119-122);
- DML = read current snapshot → transform → write new parquet dir →
  publish. No in-place mutation anywhere, so concurrent readers are never
  torn and historical versions stay queryable.

Layout:
    base/
      manifests/v{N}.json     immutable manifests
      CURRENT                 text file: latest committed N (atomic replace)
      data/{table}/{uuid}/    immutable parquet snapshots

Scale notes: a manifest is O(#tables); data snapshots are full-table
rewrites here (correct + simple); the production evolution is delta files
with compaction, which changes only `write_snapshot`/`read_df` — the
manifest/commit protocol is already the Delta-style transaction-log shape.
"""

from __future__ import annotations

import json
import os
import uuid
from typing import Any, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from entangledb_spark.plans import ast

SPARK_TYPES = {
    "BOOLEAN": T.BooleanType(),
    "INTEGER": T.LongType(),
    "FLOAT": T.DoubleType(),
    "STRING": T.StringType(),
}

# engine datatype ← Spark simpleString (for ATTACH schema inference)
FROM_SPARK_TYPES = {
    "boolean": "BOOLEAN",
    "tinyint": "INTEGER",
    "smallint": "INTEGER",
    "int": "INTEGER",
    "bigint": "INTEGER",
    "float": "FLOAT",
    "double": "FLOAT",
    "string": "STRING",
}


class CatalogError(ValueError):
    pass


class ConflictError(CatalogError):
    """A concurrent commit published a newer version first (OCC failure)."""


def column_to_dict(c: ast.ColumnDef, default_value: Any = None, has_default: bool = False) -> dict:
    return {
        "name": c.name,
        "datatype": c.datatype,
        "primary_key": c.primary_key,
        "nullable": (not c.primary_key) if c.nullable is None else c.nullable,
        "has_default": has_default,
        "default": default_value,
        "unique": c.unique or c.primary_key,
        "references": c.references,
        "index": c.index or c.unique,
    }


def schema_of(columns: list[dict], physical: bool = False) -> T.StructType:
    """Schema for a column list. ``physical=True`` names fields by their
    STORED (file) name — after ALTER TABLE RENAME COLUMN the logical name
    diverges from what existing parquet files carry (the ``physical``
    entry pins the original), making rename a metadata-only operation:
    no file is rewritten, reads map stored → logical (the same idea as
    Iceberg's field-id indirection, done by pinned name)."""
    fields = []
    for c in columns:
        if c["datatype"] in SPARK_TYPES:
            t = SPARK_TYPES[c["datatype"]]
        else:
            # ATTACHed external column with a type outside the 4-type system
            # (timestamp, array, ...): carried through verbatim
            t = T._parse_datatype_string(c["spark_type"])
        name = c.get("physical", c["name"]) if physical else c["name"]
        fields.append(T.StructField(name, t, c["nullable"]))
    return T.StructType(fields)


def physical_name(c: dict) -> str:
    return c.get("physical", c["name"])


class SnapshotCatalog:
    def __init__(self, spark: SparkSession, base_dir: str):
        self.spark = spark
        self.base = base_dir
        os.makedirs(os.path.join(base_dir, "manifests"), exist_ok=True)
        os.makedirs(os.path.join(base_dir, "data"), exist_ok=True)
        if not os.path.exists(self._current_path()):
            self._write_manifest(0, {"tables": {}})
            self._publish_current(0)

    # ---- manifest plumbing -------------------------------------------------

    def _current_path(self) -> str:
        return os.path.join(self.base, "CURRENT")

    def _manifest_path(self, v: int) -> str:
        return os.path.join(self.base, "manifests", f"v{v}.json")

    def _write_manifest(self, v: int, manifest: dict) -> None:
        # per-call-unique tmp: concurrent bootstraps (two connections
        # opening a fresh db) must not share a tmp path; the v0 write is
        # idempotent so last-replace-wins is safe.
        tmp = self._manifest_path(v) + f".tmp-{os.getpid()}-{uuid.uuid4().hex[:6]}"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1)
        os.replace(tmp, self._manifest_path(v))

    def _write_manifest_excl(self, v: int, manifest: dict) -> None:
        """Atomically CREATE manifest v — fails with FileExistsError if a
        concurrent committer created it first. The hard-link is the commit
        point: creating v{N}.json IS the compare-and-swap, so the protocol
        is safe across OS processes, not just threads (os.replace alone
        would let two check-then-act writers both 'win')."""
        tmp = self._manifest_path(v) + f".tmp-{os.getpid()}-{uuid.uuid4().hex[:6]}"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1)
        try:
            os.link(tmp, self._manifest_path(v))  # atomic create-if-absent
        finally:
            os.unlink(tmp)

    def _publish_current(self, v: int) -> None:
        # tmp name must be unique per CALL, not per process: concurrent
        # threads (e.g. server connections) publishing through one catalog
        # would otherwise share a tmp path and race replace vs. write.
        # CURRENT itself is last-writer-wins — current_version self-heals
        # forward past any stale pointer by scanning the manifests.
        tmp = self._current_path() + f".tmp-{os.getpid()}-{uuid.uuid4().hex[:6]}"
        with open(tmp, "w") as f:
            f.write(str(v))
        os.replace(tmp, self._current_path())

    def current_version(self) -> int:
        """Latest committed version. CURRENT is a cache of the answer; the
        manifest files are the source of truth — if a committer crashed (or
        lost a race) between creating v{N}.json and updating CURRENT, the
        pointer self-heals by advancing past every existing manifest."""
        with open(self._current_path()) as f:
            v = int(f.read().strip())
        while os.path.exists(self._manifest_path(v + 1)):
            v += 1
        return v

    def manifest(self, v: Optional[int] = None) -> dict:
        v = self.current_version() if v is None else v
        path = self._manifest_path(v)
        if not os.path.exists(path):
            raise CatalogError(f"version {v} does not exist")
        with open(path) as f:
            return json.load(f)

    def publish(self, manifest: dict, expected_version: Optional[int] = None) -> int:
        """Commit: write manifest N+1, then atomically move CURRENT.

        Optimistic concurrency: when `expected_version` is given (the
        version the transaction read its state from), a concurrent commit
        in between raises ConflictError instead of silently losing the
        other writer's changes — the detect-and-retry analog of the
        reference's writer mutex (storage/mvcc.rs:84-95), and the same
        protocol a cluster deployment runs as a CAS on a metastore pointer.
        """
        while True:
            current = self.current_version()
            if expected_version is not None and current != expected_version:
                raise ConflictError(
                    f"transaction conflict: database is at version {current}, "
                    f"transaction started at {expected_version}; retry"
                )
            v = current + 1
            try:
                self._write_manifest_excl(v, manifest)
            except FileExistsError:
                if expected_version is not None:
                    raise ConflictError(
                        f"transaction conflict: version {v} was committed "
                        f"concurrently; transaction started at {expected_version}; retry"
                    ) from None
                continue  # unconditional publish: retry on the next version
            self._publish_current(v)
            return v

    # ---- table data (merge-on-read) ----------------------------------------
    #
    # A table version is a base snapshot plus an ordered list of delta
    # entries, each holding `upserts` (full rows) and/or `deletes` (PK
    # tombstones). Mutations write O(changed rows), not O(table) — the
    # property that makes DML viable on a 100 TB table. Reads resolve the
    # latest row per PK with one window pass (single shuffle on the PK);
    # after COMPACT_AFTER deltas the full view is rewritten as a new base
    # so read amplification stays bounded. This is the Delta-Lake /
    # Iceberg merge-on-read shape in miniature.

    COMPACT_AFTER = 8

    def _pk_of(self, meta: dict) -> str:
        return next(c["name"] for c in meta["columns"] if c["primary_key"])

    def _read_path(self, rel: str, columns: list[dict]) -> DataFrame:
        """Read a managed-table file set: scan with the PHYSICAL schema
        (what the files store), surface LOGICAL names, and fill columns
        ADDed after the files were written — a missing column reads as
        NULL, so a NOT NULL ADD COLUMN's ``initial_default`` coalesces it
        exactly (no genuine NULL can exist under the constraint). Rename
        aliases and the coalesce are narrow projections Catalyst pushes
        scans/filters through, so pruning is unaffected."""
        df = self.spark.read.schema(schema_of(columns, physical=True)).parquet(
            os.path.join(self.base, rel)
        )
        from pyspark.sql import functions as F

        # rename stored → logical BY NAME: a partitioned read emits the
        # partition column LAST regardless of the supplied schema order,
        # so a positional rename would scramble columns
        df = df.select(
            *[F.col(physical_name(c)).alias(c["name"]) for c in columns]
        )

        for c in columns:
            if c.get("initial_default") is not None:
                df = df.withColumn(
                    c["name"],
                    F.coalesce(
                        F.col(c["name"]),
                        F.lit(c["initial_default"]).cast(
                            SPARK_TYPES[c["datatype"]]
                        ),
                    ),
                )
        return df

    def _to_physical(self, df: DataFrame, columns: list[dict]) -> DataFrame:
        """Rename a logical-named frame to stored names before a file
        write; columns outside the table schema pass through."""
        from pyspark.sql import functions as F

        by_name = {c["name"]: c for c in columns}
        return df.select(
            *[
                F.col(n).alias(physical_name(by_name[n])) if n in by_name else F.col(n)
                for n in df.columns
            ]
        )

    def read_df(self, manifest: dict, name: str) -> DataFrame:
        t = manifest["tables"].get(name)
        if t is None:
            raise CatalogError(f"table {name} does not exist")
        if t.get("external"):
            # ATTACHed read-only parquet outside the snapshot store; the
            # scan stays a plain parquet source so pushdown/pruning work.
            from entangledb_spark.sources.parquet_io import read_parquet_any

            return read_parquet_any(self.spark, t["external"])
        cols_meta = t["columns"]
        schema = schema_of(cols_meta)
        deltas = t.get("deltas", [])
        if t["data"] is None and not deltas:
            return self.spark.createDataFrame([], schema)
        base = (
            self._read_path(t["data"], cols_meta)
            if t["data"] is not None
            else self.spark.createDataFrame([], schema)
        )
        if not deltas:
            return base
        from pyspark.sql import Window, functions as F

        pk = self._pk_of(t)
        pk_cols = [c for c in cols_meta if c["primary_key"]]
        parts = [base.withColumn("__rank", F.lit(0)).withColumn("__del", F.lit(False))]
        for i, d in enumerate(deltas, start=1):
            if d.get("upserts"):
                parts.append(
                    self._read_path(d["upserts"], cols_meta)
                    .withColumn("__rank", F.lit(i))
                    .withColumn("__del", F.lit(False))
                )
            if d.get("deletes"):
                tomb = self._read_path(d["deletes"], pk_cols)
                for c in schema.fieldNames():
                    if c != pk:
                        tomb = tomb.withColumn(c, F.lit(None).cast(schema[c].dataType))
                parts.append(
                    tomb.select(*schema.fieldNames())
                    .withColumn("__rank", F.lit(i))
                    .withColumn("__del", F.lit(True))
                )
        merged = parts[0]
        for p in parts[1:]:
            merged = merged.unionByName(p)
        # latest version of each PK wins; at equal rank an upsert beats a
        # tombstone (UPDATE pk=pk+1 writes both in one delta)
        w = Window.partitionBy(pk).orderBy(F.col("__rank").desc(), F.col("__del").asc())
        return (
            merged.withColumn("__rn", F.row_number().over(w))
            .filter((F.col("__rn") == 1) & (~F.col("__del")))
            .drop("__rank", "__del", "__rn")
        )

    def read_df_pruned(self, manifest: dict, name: str, predicate) -> DataFrame:
        """Merge-on-read view of ``name`` with ``predicate`` (a Column over
        the table's partition column(s)) applied to EVERY part — base and
        each delta — BEFORE the pk-version window, so partition pruning
        happens at the parquet source instead of being blocked above the
        window (Catalyst won't push a non-window-key filter through it).

        Sound only when the predicate's columns are functionally
        determined by the pk and every writer maintains them consistently
        (all versions of a pk live in the same partition) — exactly the
        contract of a declared ``partition_by`` column like the
        fp-prefix bucket in streaming/corpus_dedup.py. Parts that lack
        the predicate's columns (pk-only tombstones) are left unfiltered:
        a surviving tombstone for an unprobed pk deletes a row the caller
        wasn't asking about, which the merge semantics already handle."""
        t = manifest["tables"].get(name)
        if t is None:
            raise CatalogError(f"table {name} does not exist")
        if t.get("external"):
            # ATTACHed external parquet has no merge-on-read parts to
            # prune below a window; the plain scan pushes the predicate
            # down as an ordinary source filter, which is all "pruned"
            # can mean for a table we don't partition ourselves.
            from entangledb_spark.sources.parquet_io import read_parquet_any

            return read_parquet_any(self.spark, t["external"]).filter(predicate)
        cols_meta = t["columns"]
        schema = schema_of(cols_meta)
        deltas = t.get("deltas", [])
        if t["data"] is None and not deltas:
            return self.spark.createDataFrame([], schema)
        from pyspark.sql import Window, functions as F

        pk = self._pk_of(t)
        pk_cols = [c for c in cols_meta if c["primary_key"]]
        base = (
            self._read_path(t["data"], cols_meta).filter(predicate)
            if t["data"] is not None
            else self.spark.createDataFrame([], schema)
        )
        parts = [base.withColumn("__rank", F.lit(0)).withColumn("__del", F.lit(False))]
        for i, d in enumerate(deltas, start=1):
            if d.get("upserts"):
                parts.append(
                    self._read_path(d["upserts"], cols_meta)
                    .filter(predicate)
                    .withColumn("__rank", F.lit(i))
                    .withColumn("__del", F.lit(False))
                )
            if d.get("deletes"):
                tomb = self._read_path(d["deletes"], pk_cols)
                for c in schema.fieldNames():
                    if c != pk:
                        tomb = tomb.withColumn(c, F.lit(None).cast(schema[c].dataType))
                parts.append(
                    tomb.select(*schema.fieldNames())
                    .withColumn("__rank", F.lit(i))
                    .withColumn("__del", F.lit(True))
                )
        merged = parts[0]
        for p in parts[1:]:
            merged = merged.unionByName(p)
        w = Window.partitionBy(pk).orderBy(F.col("__rank").desc(), F.col("__del").asc())
        return (
            merged.withColumn("__rn", F.row_number().over(w))
            .filter((F.col("__rn") == 1) & (~F.col("__del")))
            .drop("__rank", "__del", "__rn")
        )

    def write_snapshot(
        self, name: str, df: DataFrame, partition_by: Optional[list] = None
    ) -> str:
        """Write an immutable parquet file set, return its manifest-relative
        path. Distributed write — no driver materialization.

        ``partition_by`` encodes those columns in the directory layout
        (Hive-style) so later reads can prune files by partition value —
        the ann_index.py recipe generalized to catalog tables. Callers
        writing a table whose meta declares ``partition_by`` must pass it
        so every snapshot/delta of the table shares one layout."""
        rel = os.path.join("data", name, uuid.uuid4().hex[:12])
        w = df.write.mode("overwrite")
        if partition_by:
            # route each partition's rows into one task first: without it
            # every input partition writes a file per value directory
            # (tiny-file explosion — same rationale as build_lsh_index)
            w = df.repartition(*partition_by).write.mode("overwrite").partitionBy(
                *partition_by
            )
        w.parquet(os.path.join(self.base, rel))
        return rel

    def stage_delta(
        self,
        manifest: dict,
        name: str,
        upserts: Optional[DataFrame] = None,
        deletes: Optional[DataFrame] = None,
    ) -> Optional[dict]:
        """Append a merge-on-read delta (O(changed rows) write), compacting
        into a fresh base when the delta chain gets long. Returns the delta
        entry ({'upserts': path, 'deletes': path}) so callers can report
        row counts from the written files' footers instead of re-running
        the matching job."""
        meta = manifest["tables"][name]
        cols_meta = meta["columns"]
        by_name = {c["name"]: c for c in cols_meta}
        part_by = meta.get("partition_by")
        if part_by:
            part_by = [physical_name(by_name.get(p, {"name": p})) for p in part_by]
        delta: dict = {}
        if upserts is not None:
            delta["upserts"] = self.write_snapshot(
                name, self._to_physical(upserts, cols_meta), part_by
            )
        if deletes is not None:
            # tombstones carry only the pk — never partition-encoded
            delta["deletes"] = self.write_snapshot(
                name, self._to_physical(deletes, cols_meta)
            )
        if not delta:
            return None
        meta.setdefault("deltas", []).append(delta)
        if len(meta["deltas"]) >= self.COMPACT_AFTER:
            self.compact(manifest, name)
        return delta

    def count_rows(self, rel: str) -> int:
        """Row count of a written snapshot from parquet footer statistics —
        a metadata-only read, no data scan."""
        import pyarrow.parquet as pq

        path = os.path.join(self.base, rel)
        # os.walk, not listdir: partitioned snapshots (partition_by) nest
        # their files under value directories
        return sum(
            pq.ParquetFile(os.path.join(d, f)).metadata.num_rows
            for d, _, fs in os.walk(path)
            for f in fs
            if f.endswith(".parquet")
        )

    def compact(self, manifest: dict, name: str, view: Optional[DataFrame] = None) -> None:
        """Materialize the current view as a new base and clear the delta
        chain — bounds read amplification; run out-of-band at scale.
        ``view`` lets OPTIMIZE pass a re-clustered frame (same rows,
        different layout) through the identical physical-write funnel."""
        meta = manifest["tables"][name]
        cols_meta = meta["columns"]
        by_name = {c["name"]: c for c in cols_meta}
        part_by = meta.get("partition_by")
        if part_by:
            part_by = [physical_name(by_name.get(p, {"name": p})) for p in part_by]
        if view is None:
            view = self.read_df(manifest, name)
        meta["data"] = self.write_snapshot(
            name, self._to_physical(view, cols_meta), part_by
        )
        meta["deltas"] = []

    def compact_small_files(
        self, manifest: dict, name: str, threshold: int
    ) -> Optional[dict]:
        """Delta-style scoped compaction (round 10): bin-pack ONLY parquet
        files under ``threshold`` bytes into one file per directory,
        HARD-LINKING every well-sized file into the new base unchanged —
        same inode, zero bytes read or rewritten (the local-filesystem
        equivalent of an object store's file-manifest reuse: at 100 TB
        this is the difference between OPTIMIZE costing O(small files)
        and O(table)). Partition directories pack independently (files
        under different partition values can never merge). The delta
        chain is PRESERVED — base rows stay base rows, so merge-on-read
        semantics and pending tombstones are untouched (unlike the full
        rewrite, which folds and resets the chain).

        Returns {"rewritten", "kept", "dirs"} after swapping meta["data"]
        to the new base, or None when no directory holds two small files
        (true no-op: the manifest is untouched, no version is wasted)."""
        import shutil

        meta = manifest["tables"][name]
        if meta.get("data") is None or meta.get("external"):
            return None
        base_dir = os.path.join(self.base, meta["data"])
        groups: dict[str, tuple[list, list]] = {}
        for root, _dirs, fnames in os.walk(base_dir):
            sub = os.path.relpath(root, base_dir)
            for fn in fnames:
                if not fn.endswith(".parquet"):
                    continue
                p = os.path.join(root, fn)
                g = groups.setdefault("" if sub == "." else sub, ([], []))
                (g[0] if os.path.getsize(p) < threshold else g[1]).append(p)
        if not any(len(small) >= 2 for small, _ in groups.values()):
            return None
        by_name = {c["name"]: c for c in meta["columns"]}
        phys_part = {
            physical_name(by_name.get(p, {"name": p}))
            for p in (meta.get("partition_by") or [])
        }
        # files inside a Hive layout do NOT store the partition columns —
        # read them with the file schema, the directory path keeps the
        # partition values
        file_cols = [
            c for c in meta["columns"] if physical_name(c) not in phys_part
        ]
        fschema = schema_of(file_cols, physical=True)
        new_rel = os.path.join("data", name, uuid.uuid4().hex[:12])
        new_dir = os.path.join(self.base, new_rel)
        n_rw = n_kept = 0
        for sub, (small, kept) in sorted(groups.items()):
            dst = os.path.join(new_dir, sub) if sub else new_dir
            os.makedirs(dst, exist_ok=True)
            if len(small) < 2:  # a lone small file isn't worth a rewrite
                kept = kept + small
                small = []
            for p in kept:
                os.link(p, os.path.join(dst, os.path.basename(p)))
                n_kept += 1
            if not small:
                continue
            tmp = os.path.join(self.base, "data", name, "_pack_" + uuid.uuid4().hex[:8])
            (
                self.spark.read.schema(fschema)
                .parquet(*sorted(small))
                .coalesce(1)
                .write.mode("overwrite")
                .parquet(tmp)
            )
            for fn in os.listdir(tmp):
                if fn.endswith(".parquet"):
                    os.link(
                        os.path.join(tmp, fn), os.path.join(dst, "packed-" + fn)
                    )
            shutil.rmtree(tmp, ignore_errors=True)
            n_rw += len(small)
        meta["data"] = new_rel
        return {"rewritten": n_rw, "kept": n_kept, "dirs": len(groups)}

    def compact_partitions(
        self,
        manifest: dict,
        name: str,
        equalities: dict,
        files: Optional[int] = None,
        zorder: Optional[list] = None,
    ) -> dict:
        """OPTIMIZE t [ZORDER BY (...)] WHERE <partition equalities>
        (round 10; ZORDER scope round 11): rewrite the MATCHING partition
        directories from the merged view (pending deltas for those rows
        fold in — re-applying them on read stays correct: a delta row
        outranks both base copies it may shadow, so the window-by-PK
        merge is unaffected) and HARD-LINK every other partition
        directory into the new base unchanged. The delta chain is
        preserved. Cost scales with the matched partitions, never the
        table — the scoped-OPTIMIZE contract at 100 TB (re-clustering a
        whole 100 TB table because one partition went stale is not
        viable; this re-clusters exactly the stale directories).

        ``zorder``: Z-order-cluster the REWRITTEN partitions on these
        (non-partition) columns — zorder_frame's range shuffle on the
        interleaved z-value replaces the plain repartition, so each
        rewritten directory's files cover small key-space rectangles and
        footer min/max pruning works inside the partition. Point-in-time
        and partition-scoped: untouched directories keep their existing
        layout (that is the point), so no table-level ``zorder`` marker
        is set.

        ``equalities``: {logical partition column: literal value}."""
        meta = manifest["tables"][name]
        part_by = meta.get("partition_by") or []
        by_name = {c["name"]: c for c in meta["columns"]}

        from pyspark.sql import functions as F

        pred = None
        for c, v in equalities.items():
            term = F.col(c).eqNullSafe(F.lit(v))
            pred = term if pred is None else (pred & term)
        view = self.read_df(manifest, name).filter(pred)
        phys_parts = [physical_name(by_name[p]) for p in part_by]
        if zorder:
            from entangledb_spark.sources.layout import zorder_frame

            # range-shuffle on the interleaved z-value; each task then
            # writes its z-range into the partition dirs it touches, so
            # files within a rewritten dir are z-clustered. May raise
            # ValueError (>63 interleaved bits) — caller maps it to a
            # statement error.
            view, _ = zorder_frame(view, list(zorder), files)
            w = self._to_physical(view, meta["columns"])
        elif files is not None:
            w = self._to_physical(view.repartition(files), meta["columns"])
        else:
            w = self._to_physical(view, meta["columns"]).repartition(*phys_parts)
        new_rel = os.path.join("data", name, uuid.uuid4().hex[:12])
        new_dir = os.path.join(self.base, new_rel)
        w.write.mode("overwrite").partitionBy(*phys_parts).parquet(new_dir)
        n_kept = 0
        if meta.get("data") is not None:
            old_dir = os.path.join(self.base, meta["data"])
            for root, _dirs, fnames in os.walk(old_dir):
                sub = os.path.relpath(root, old_dir)
                # Identity is decided by the rewrite's OWN output paths,
                # never by formatting Python literals into dir names:
                # Spark/Hive path encoding (booleans lowercase, special
                # chars percent-escaped, its own float formatting) is the
                # canonical form both old and new bases are written in, so
                # a partition the rewrite re-emitted exists under the same
                # relative path in the new base — linking it too would
                # duplicate every row of the partition (round-10 advice).
                # A matched partition the rewrite emitted NO rows for
                # (fully tombstoned) links back harmlessly: the preserved
                # delta chain still shadows those rows on read.
                if sub == "." or os.path.isdir(os.path.join(new_dir, sub)):
                    continue
                for fn in fnames:
                    if not fn.endswith(".parquet"):
                        continue
                    dst = os.path.join(new_dir, sub)
                    os.makedirs(dst, exist_ok=True)
                    os.link(os.path.join(root, fn), os.path.join(dst, fn))
                    n_kept += 1
        meta["data"] = new_rel
        return {"kept": n_kept}

    def vacuum(self, keep_last: int = 8) -> dict:
        """Retention GC: drop manifests older than the last `keep_last`
        versions and delete data directories no kept version references.

        Snapshot stores grow monotonically — every commit adds a manifest
        and (for compactions/full rewrites) a full data copy, so without
        GC a 100 TB table's history dwarfs the table. Vacuum trades
        time-travel depth for space, exactly like Delta/Iceberg retention:
        `AS OF` below the cutoff raises a clean version-does-not-exist
        error afterwards. Run it quiesced (or from the single writer):
        a concurrent uncommitted transaction's freshly staged files are
        unreferenced until publish and would be collected."""
        import shutil

        current = self.current_version()
        cutoff = max(0, current - max(1, keep_last) + 1)
        referenced: set[str] = set()
        for v in range(cutoff, current + 1):
            man = self.manifest(v)
            for t in man["tables"].values():
                if t.get("external"):
                    continue
                if t.get("data"):
                    referenced.add(t["data"])
                for d in t.get("deltas", []):
                    for k in ("upserts", "deletes"):
                        if d.get(k):
                            referenced.add(d[k])
            for mv in (man.get("matviews") or {}).values():
                if mv.get("data"):
                    referenced.add(mv["data"])
        removed_manifests = 0
        mdir = os.path.join(self.base, "manifests")
        for f in os.listdir(mdir):
            if f.startswith("v") and f.endswith(".json"):
                try:
                    v = int(f[1:-5])
                except ValueError:
                    continue
                if v < cutoff:
                    os.unlink(os.path.join(mdir, f))
                    removed_manifests += 1
        removed_dirs = 0
        ddir = os.path.join(self.base, "data")
        for tname in os.listdir(ddir):
            tdir = os.path.join(ddir, tname)
            if not os.path.isdir(tdir):
                continue
            for snap in os.listdir(tdir):
                rel = os.path.join("data", tname, snap)
                if rel not in referenced:
                    shutil.rmtree(os.path.join(tdir, snap), ignore_errors=True)
                    removed_dirs += 1
        return {
            "kept_from": cutoff,
            "current": current,
            "removed_manifests": removed_manifests,
            "removed_data_dirs": removed_dirs,
        }

    def changes_df(self, name: str, from_v: int, to_v: int) -> DataFrame:
        """Change data feed: net row-level changes to `name` between
        version `from_v` (exclusive) and `to_v` (inclusive), with a
        `_change_type` column in ('insert', 'update', 'delete') — the
        incremental-refresh primitive (recompute only what changed since
        the last run, instead of re-reading a 100 TB table).

        Fast path: when to_v's delta chain extends from_v's on the same
        base (the common no-compaction case), only the NEW delta files are
        read — O(changed rows) — resolved to one net row per PK, then one
        join against the from_v snapshot's PK column classifies
        insert-vs-update and fills delete pre-images. The changed set is
        small relative to the table, so this join broadcasts or shuffles
        only PKs. When compaction rewrote the base in between, falls back
        to a full snapshot diff: one null-safe full-outer join on PK.
        Deletes carry the pre-image row; inserts/updates the post-image.
        """
        from pyspark.sql import Window, functions as F

        if from_v > to_v:
            raise CatalogError(f"changes: from_version {from_v} > to_version {to_v}")
        man_old, man_new = self.manifest(from_v), self.manifest(to_v)
        t_new = man_new["tables"].get(name)
        if t_new is None:
            raise CatalogError(f"table {name} does not exist at version {to_v}")
        if t_new.get("external"):
            raise CatalogError("changes are not tracked for ATTACHed external tables")
        schema = schema_of(t_new["columns"])
        cols = schema.fieldNames()
        t_old = man_old["tables"].get(name)
        if t_old is None:  # created inside the range → everything is an insert
            return self.read_df(man_new, name).withColumn("_change_type", F.lit("insert"))
        if t_old.get("external"):
            raise CatalogError("changes are not tracked for ATTACHed external tables")
        if t_old["columns"] != t_new["columns"]:
            # ALTER TABLE inside the range: physical-name pinning makes the
            # OLD files readable under the NEW schema (renamed columns map
            # through `physical`, added ones fill NULL/initial_default,
            # dropped ones vanish), so the diff is expressed in the new
            # logical schema — patch the old entry's column list only.
            t_old = dict(t_old, columns=t_new["columns"])
            man_old = dict(man_old)
            man_old["tables"] = dict(man_old["tables"], **{name: t_old})
        pk = self._pk_of(t_new)
        old_deltas = t_old.get("deltas", [])
        new_deltas = t_new.get("deltas", [])

        def empty() -> DataFrame:
            return self.spark.createDataFrame([], schema).withColumn(
                "_change_type", F.lit("").cast("string")
            )

        if t_old["data"] == t_new["data"] and new_deltas[: len(old_deltas)] == old_deltas:
            tail = new_deltas[len(old_deltas):]
            if not tail:
                return empty()
            # resolve the tail to one net (row, __del) per PK — same
            # latest-wins window as read_df, over O(changed rows) only
            pk_cols = [c for c in t_new["columns"] if c["primary_key"]]
            parts = []
            for i, d in enumerate(tail, start=1):
                if d.get("upserts"):
                    parts.append(
                        self._read_path(d["upserts"], t_new["columns"])
                        .withColumn("__rank", F.lit(i))
                        .withColumn("__del", F.lit(False))
                    )
                if d.get("deletes"):
                    tomb = self._read_path(d["deletes"], pk_cols)
                    for c in cols:
                        if c != pk:
                            tomb = tomb.withColumn(c, F.lit(None).cast(schema[c].dataType))
                    parts.append(
                        tomb.select(*cols)
                        .withColumn("__rank", F.lit(i))
                        .withColumn("__del", F.lit(True))
                    )
            net = parts[0]
            for p in parts[1:]:
                net = net.unionByName(p)
            w = Window.partitionBy(pk).orderBy(F.col("__rank").desc(), F.col("__del").asc())
            net = (
                net.withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") == 1)
                .drop("__rank", "__rn")
            )
            old_view = self.read_df(man_old, name)
            existed = old_view.select(F.col(pk).alias("__opk")).withColumn(
                "__existed", F.lit(True)
            )
            marked = net.join(existed, net[pk] == existed["__opk"], "left").drop("__opk")
            ups = (
                marked.filter(~F.col("__del"))
                .withColumn(
                    "_change_type",
                    F.when(F.col("__existed").isNotNull(), "update").otherwise("insert"),
                )
                .select(*cols, "_change_type")
            )
            # tombstones of rows that never existed at from_v are no-ops;
            # real deletes carry the pre-image row from the old snapshot
            del_pks = marked.filter(F.col("__del") & F.col("__existed").isNotNull()).select(
                F.col(pk).alias("__dpk")
            )
            dels = (
                old_view.join(del_pks, old_view[pk] == del_pks["__dpk"], "left_semi")
                .withColumn("_change_type", F.lit("delete"))
                .select(*cols, "_change_type")
            )
            return ups.unionByName(dels)

        # compaction/rewrite inside the range → null-safe snapshot diff
        o = self.read_df(man_old, name).alias("o")
        n = self.read_df(man_new, name).alias("n")
        joined = o.join(n, F.col(f"o.{pk}") == F.col(f"n.{pk}"), "full_outer")
        o_row = F.struct(*[F.col(f"o.{c}") for c in cols])
        n_row = F.struct(*[F.col(f"n.{c}") for c in cols])
        ctype = (
            F.when(F.col(f"o.{pk}").isNull(), "insert")
            .when(F.col(f"n.{pk}").isNull(), "delete")
            .when(~o_row.eqNullSafe(n_row), "update")
        )
        side = [
            F.when(F.col(f"n.{pk}").isNull(), F.col(f"o.{c}")).otherwise(F.col(f"n.{c}")).alias(c)
            for c in cols
        ]
        return (
            joined.withColumn("_change_type", ctype)
            .filter(F.col("_change_type").isNotNull())
            .select(*side, "_change_type")
        )
