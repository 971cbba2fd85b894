"""DDL + layout-maintenance statement executors (a mixin of Engine):
CREATE/DROP TABLE, OPTIMIZE (full, small-file-scoped, and
partition-scoped), ALTER TABLE metadata-only evolution, and plain
views. Split out of engine.py in round 10 (pure refactor); see the
engine.py module docstring for the session/statement contract.
"""

from __future__ import annotations

import os
from typing import Any, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from entangledb_spark.engine_base import EngineError, Result, _fold_constant
from entangledb_spark.functions.expressions import CompileError, compile_expr
from entangledb_spark.plans import ast
from entangledb_spark.plans.compiler import (
    RECURSIVE_CTE_MAX_ITERS,
    _carry_versioned,
    compile_statement,
)
from entangledb_spark.plans.parser import parse
from entangledb_spark.sources import constraints as con
from entangledb_spark.sources.catalog import (
    SPARK_TYPES,
    CatalogError,
    column_to_dict,
    schema_of,
)


class DdlStatements:
    """CREATE/DROP/ALTER/OPTIMIZE/views — mixed into Engine."""


    # ---------------------------------------------------------- DDL

    def _create_table(self, manifest: dict, stmt: ast.CreateTable) -> Result:
        taken = self._name_taken(manifest, stmt.name)
        if taken:
            raise EngineError(f"{taken} {stmt.name} already exists")
        pks = [c for c in stmt.columns if c.primary_key]
        if len(pks) != 1:
            raise EngineError("exactly one primary key column is required")  # schema.rs:102-106
        cols = []
        for c in stmt.columns:
            if c.primary_key and c.nullable is True:
                raise EngineError("primary key column cannot be nullable")
            has_default = c.default is not None
            default_value = _fold_constant(c.default) if has_default else None
            nullable = (not c.primary_key) if c.nullable is None else c.nullable
            if nullable and not has_default:
                # nullable columns get an implicit NULL default (planner.rs:48-53)
                has_default, default_value = True, None
            if c.references is not None and c.references != stmt.name:
                if c.references not in manifest["tables"]:
                    raise EngineError(f"referenced table {c.references} does not exist")
            cols.append(column_to_dict(c, default_value, has_default))
        meta: dict = {"columns": cols, "data": None}
        if stmt.partition_by:
            names = [c["name"] for c in cols]
            for p in stmt.partition_by:
                if p not in names:
                    raise EngineError(f"unknown PARTITION BY column {p}")
            if len(set(stmt.partition_by)) != len(stmt.partition_by):
                raise EngineError("duplicate PARTITION BY column")
            if len(stmt.partition_by) >= len(cols):
                raise EngineError(
                    "PARTITION BY must leave at least one data column"
                )
            # Hive-style directory layout: every snapshot/delta write of
            # this table encodes these columns in the path (the catalog
            # write funnel reads this field), so reads prune files by
            # partition value
            meta["partition_by"] = list(stmt.partition_by)
        manifest["tables"][stmt.name] = meta
        part = (
            f" PARTITION BY ({', '.join(stmt.partition_by)})"
            if stmt.partition_by
            else ""
        )
        return Result(status=f"CREATE TABLE {stmt.name}{part}")

    def _drop_table(self, manifest: dict, stmt: ast.DropTable) -> Result:
        if stmt.name not in manifest["tables"]:
            raise EngineError(f"table {stmt.name} does not exist")
        for other, meta in manifest["tables"].items():
            if other == stmt.name:
                continue
            for c in meta["columns"]:
                if c["references"] == stmt.name:
                    raise EngineError(
                        f"table {stmt.name} is referenced by table {other} (column {c['name']})"
                    )
        for vname, v in (manifest.get("views") or {}).items():
            if stmt.name in v.get("deps", ()):
                raise EngineError(
                    f"table {stmt.name} is referenced by view {vname} "
                    "(drop the view first)"
                )
        for vname, v in (manifest.get("matviews") or {}).items():
            if stmt.name in v.get("deps", ()):
                raise EngineError(
                    f"table {stmt.name} is referenced by materialized view "
                    f"{vname} (drop it first)"
                )
        del manifest["tables"][stmt.name]
        return Result(status=f"DROP TABLE {stmt.name}")

    # ---------------------------------------------------------- OPTIMIZE

    # Small-file threshold for the scoped (bare) OPTIMIZE: files under
    # this size bin-pack, larger files hard-link into the new base
    # untouched. Delta's default minFileSize thinking at fixture scale;
    # tune per deployment.
    SMALL_FILE_BYTES = 32 * 1024 * 1024

    def _optimize(self, manifest: dict, stmt: ast.Optimize) -> Result:
        """OPTIMIZE t [ZORDER BY (...)] [FILES n] [WHERE <partition eq>]
        (extension — Delta's layout-maintenance contract), three scopes:

        - bare ``OPTIMIZE t``: SCOPED small-file compaction (round 10) —
          bin-pack only files under SMALL_FILE_BYTES, hard-link well-sized
          files unchanged, keep the delta chain. On a mostly-well-laid-out
          100 TB table this touches only the small-file tail, never the
          table (catalog.compact_small_files).
        - ``ZORDER BY (...)`` / ``FILES n``: FULL rewrite as one compacted
          base snapshot, optionally Z-order-clustered so parquet min/max
          statistics prune multi-dimensional predicates (sources/layout.py
          for the mechanism and its honest limits). Content-identical;
          the delta chain folds and resets. Point-in-time — later DML
          appends unclustered until the next OPTIMIZE.
        - ``WHERE col = lit [AND ...]`` on a partition_by table: rewrite
          ONLY the matching partition directories, hard-link the rest
          (catalog.compact_partitions); the delta chain is preserved.
          With ``ZORDER BY (...)`` (round 11) the rewritten partitions
          are additionally Z-order-clustered on non-partition columns —
          re-clustering scoped to the stale directories, the only shape
          that is viable at 100 TB (bare ZORDER on a partitioned table
          is rejected with guidance to scope it).
        """
        from entangledb_spark.sources.layout import zorder_frame

        meta = self._table_meta(manifest, stmt.table, writable=True)
        names = {c["name"] for c in meta["columns"]}
        for z in stmt.zorder:
            if z not in names:
                raise EngineError(f"unknown column {z} in table {stmt.table}")
        if stmt.zorder and meta.get("partition_by") and stmt.where is None:
            raise EngineError(
                "OPTIMIZE ZORDER on a partition_by table must be scoped — "
                "add WHERE <partition equalities> to re-cluster specific "
                "partition directories (the directory layout fixes file "
                "placement table-wide; within a partition, scoped ZORDER "
                "re-clusters files for footer-stat pruning)"
            )
        if stmt.where is not None:
            part_by = meta.get("partition_by") or []
            if not part_by:
                raise EngineError(
                    f"OPTIMIZE {stmt.table} WHERE requires a partition_by "
                    "table — there are no partition directories to scope to"
                )
            for z in stmt.zorder:
                if z in part_by:
                    raise EngineError(
                        f"ZORDER BY column {z} is a partition column — the "
                        "directory layout already fixes its placement"
                    )
            eq = _partition_equalities(stmt.where, part_by)
            try:
                stats = self.catalog.compact_partitions(
                    manifest, stmt.table, eq, files=stmt.files,
                    zorder=list(stmt.zorder) or None,
                )
            except ValueError as e:  # zvalue >63 interleaved bits
                raise EngineError(f"OPTIMIZE {stmt.table}: {e}") from None
            n = self.catalog.count_rows(meta["data"])
            scope = ", ".join(f"{c}={v}" for c, v in eq.items())
            zdetail = (
                f", zorder: {', '.join(stmt.zorder)}" if stmt.zorder else ""
            )
            return Result(
                status=(
                    f"OPTIMIZE {stmt.table} (partitions {scope} "
                    f"rewritten{zdetail}, {stats['kept']} file(s) kept by "
                    f"identity, {n} rows)"
                )
            )
        if not stmt.zorder and stmt.files is None:
            stats = self.catalog.compact_small_files(
                manifest, stmt.table, self.SMALL_FILE_BYTES
            )
            if stats is None:
                return Result(
                    status=f"OPTIMIZE {stmt.table} (nothing to compact)"
                )
            n = self.catalog.count_rows(meta["data"])
            return Result(
                status=(
                    f"OPTIMIZE {stmt.table} (small-file compaction: "
                    f"{stats['rewritten']} packed, {stats['kept']} kept by "
                    f"identity, {n} rows)"
                )
            )
        view = self.catalog.read_df(manifest, stmt.table)
        detail = "compacted"
        n_files = stmt.files
        if stmt.zorder:
            try:
                view, n_files = zorder_frame(view, list(stmt.zorder), n_files)
            except ValueError as e:  # e.g. > 63 interleaved bits (layout.zvalue)
                raise EngineError(f"OPTIMIZE {stmt.table}: {e}") from None
            meta["zorder"] = list(stmt.zorder)
            detail = f"zorder: {', '.join(stmt.zorder)}, {n_files} file(s)"
        else:
            view = view.repartition(n_files)
            detail = f"compacted, {n_files} file(s)"
        self.catalog.compact(manifest, stmt.table, view=view)
        n = self.catalog.count_rows(meta["data"])
        return Result(status=f"OPTIMIZE {stmt.table} ({detail}, {n} rows)")

    # ---------------------------------------------------------- ALTER TABLE

    def _alter_table(self, manifest: dict, stmt: ast.AlterTable) -> Result:
        """ALTER TABLE — schema evolution as METADATA-ONLY manifest edits
        (extension; the reference has no ALTER). No parquet file is ever
        rewritten, which is the only viable contract at 100 TB:

        - ADD COLUMN c T NULL: old files lack the column → reads yield
          NULL (schema-on-read). ADD COLUMN c T NOT NULL DEFAULT v: the
          default is pinned as ``initial_default`` and coalesced at read —
          EXACT under NOT NULL, since no genuine NULL can ever be written.
          The ambiguous middle (nullable + DEFAULT) is rejected with
          guidance: the backfill would be indistinguishable from later
          genuine NULLs. Every added column gets a fresh unique physical
          name so dropping and re-adding a name can never resurrect old
          file data.
        - DROP COLUMN: removed from the manifest; file data becomes
          invisible (and unreadable space until compaction rewrites).
          The primary key cannot be dropped.
        - RENAME COLUMN a TO b: pins the stored file name in the
          column's ``physical`` entry (catalog.schema_of maps stored →
          logical at every read, logical → stored at every write), so
          rename touches zero bytes of data — Iceberg's field-id
          indirection, done by pinned name.

        Dependent views/materialized views are REVALIDATED against the
        edited manifest by compiling their stored SQL — an ALTER that
        would break one is rejected naming it. Table stats are dropped
        (they describe the old schema)."""
        meta = self._table_meta(manifest, stmt.table, writable=True)
        cols = meta["columns"]
        by_name = {c["name"]: c for c in cols}
        if stmt.action == "add":
            c = stmt.column
            if c.name in by_name:
                raise EngineError(f"column {c.name} already exists in {stmt.table}")
            if c.primary_key:
                raise EngineError("cannot ADD a PRIMARY KEY column")
            nullable = True if c.nullable is None else c.nullable
            has_default = c.default is not None
            default_value = _fold_constant(c.default) if has_default else None
            if not nullable and not has_default:
                raise EngineError(
                    "ADD COLUMN NOT NULL requires a DEFAULT — existing rows "
                    "need a value"
                )
            if nullable and has_default:
                raise EngineError(
                    "ADD COLUMN with a DEFAULT must be NOT NULL: on a "
                    "nullable column the backfill could not be told apart "
                    "from later genuine NULLs — add it nullable and UPDATE, "
                    "or declare NOT NULL"
                )
            if c.unique and has_default:
                raise EngineError(
                    "ADD COLUMN UNIQUE with a DEFAULT backfill would "
                    "violate uniqueness on the first read — add it "
                    "nullable UNIQUE instead"
                )
            if c.references is not None and c.references != stmt.table:
                if c.references not in manifest["tables"]:
                    raise EngineError(
                        f"referenced table {c.references} does not exist"
                    )
            d = column_to_dict(c, default_value, True)  # nullable → NULL default
            if not nullable:
                d["initial_default"] = default_value
            import uuid as _uuid

            # fresh physical name: DROP then re-ADD of the same logical
            # name must never read the dropped column's old file data
            d["physical"] = f"{c.name}__a{_uuid.uuid4().hex[:8]}"
            cols.append(d)
            detail = f"ADD COLUMN {c.name}"
        elif stmt.action == "drop":
            col = by_name.get(stmt.name)
            if col is None:
                raise EngineError(f"column {stmt.name} does not exist in {stmt.table}")
            if col["primary_key"]:
                raise EngineError("cannot DROP the primary key column")
            pb = meta.get("partition_by") or []
            if stmt.name in pb:
                raise EngineError(
                    f"cannot DROP partition column {stmt.name} — the file "
                    "layout is keyed on it"
                )
            cols.remove(col)
            detail = f"DROP COLUMN {stmt.name}"
        elif stmt.action == "rename":
            col = by_name.get(stmt.name)
            if col is None:
                raise EngineError(f"column {stmt.name} does not exist in {stmt.table}")
            if stmt.new_name in by_name:
                raise EngineError(
                    f"column {stmt.new_name} already exists in {stmt.table}"
                )
            col.setdefault("physical", col["name"])  # pin the stored name ONCE
            col["name"] = stmt.new_name
            pb = meta.get("partition_by")
            if pb and stmt.name in pb:
                meta["partition_by"] = [
                    stmt.new_name if p == stmt.name else p for p in pb
                ]
            detail = f"RENAME COLUMN {stmt.name} TO {stmt.new_name}"
        else:  # pragma: no cover - parser guarantees the action set
            raise EngineError(f"unknown ALTER action {stmt.action!r}")
        meta.pop("stats", None)  # described the pre-ALTER schema
        self._revalidate_dependents(manifest, stmt.table, detail)
        return Result(status=f"ALTER TABLE {stmt.table} {detail}")

    def _revalidate_dependents(self, manifest: dict, table: str, detail: str) -> None:
        """Compile every view/materialized view that reads ``table``
        against the EDITED manifest — a schema change that would break one
        is rejected naming the dependent (the reference's FK reverse-check
        discipline, applied to schema evolution)."""
        reader = self._reader_for(manifest)
        for kind, coll in (
            ("view", manifest.get("views") or {}),
            ("materialized view", manifest.get("matviews") or {}),
        ):
            for vname, v in coll.items():
                if table not in v.get("deps", ()):
                    continue
                try:
                    compile_statement(parse(v["sql"]), self.spark, reader)
                except Exception as e:
                    raise EngineError(
                        f"ALTER TABLE {table} {detail} would break {kind} "
                        f"{vname}: {str(e).splitlines()[0]}"
                    ) from None

    # ---------------------------------------------------------- views

    def _create_view(self, manifest: dict, stmt: ast.CreateView) -> Result:
        """CREATE VIEW (extension — the reference has no views). The view's
        QUERY TEXT goes into the versioned manifest: views are therefore
        transactional, time-travel with AS OF SYSTEM TIME, and survive
        engine restarts as SQL. The query is validated NOW by compiling it
        against the same reader SELECT uses (unknown tables/columns fail
        here, not at first use), and the tables/views it reads are
        recorded as `deps` so DROP can protect them — the same guard
        discipline as the reference's FK reverse check (mutation.rs:
        129-155), applied to view dependencies."""
        taken = self._name_taken(manifest, stmt.name)
        if taken:
            raise EngineError(f"{taken} {stmt.name} already exists")
        views = manifest.setdefault("views", {})
        deps: set[str] = set()
        base = self._reader()

        def recording(name: str) -> DataFrame:
            deps.add(name)
            return base(name)

        _carry_versioned(recording, base)  # forward ALL reader capabilities

        try:
            df = compile_statement(stmt.query, self.spark, recording)
        except CompileError as e:
            raise EngineError(f"CREATE VIEW {stmt.name}: {e}") from None
        views[stmt.name] = {
            "sql": stmt.sql,
            "deps": sorted(deps),
            "columns": list(df.columns),
        }
        return Result(status=f"CREATE VIEW {stmt.name}")

    def _drop_view(self, manifest: dict, stmt: ast.DropView) -> Result:
        views = manifest.get("views") or {}
        if stmt.name not in views:
            raise EngineError(f"view {stmt.name} does not exist")
        for other, v in views.items():
            if other != stmt.name and stmt.name in v.get("deps", ()):
                raise EngineError(
                    f"view {stmt.name} is referenced by view {other} "
                    "(drop the view first)"
                )
        for other, v in (manifest.get("matviews") or {}).items():
            if stmt.name in v.get("deps", ()):
                raise EngineError(
                    f"view {stmt.name} is referenced by materialized view {other}"
                )
        del views[stmt.name]
        return Result(status=f"DROP VIEW {stmt.name}")

    def list_views(self) -> list[str]:
        return sorted(self._manifest_for_read().get("views") or {})

    def get_view(self, name: str) -> dict:
        v = (self._manifest_for_read().get("views") or {}).get(name)
        if v is None:
            raise EngineError(f"view {name} does not exist")
        return {"name": name, **{k: v[k] for k in ("sql", "deps", "columns")}}



def _partition_equalities(e: ast.Expr, part_by: list) -> dict:
    """Flatten an OPTIMIZE WHERE predicate — `col = literal [AND ...]` —
    into {partition column: value}. Anything else is rejected with the
    reason: partition scoping selects directory names, so only equality
    conjunctions on partition columns are expressible."""
    out: dict = {}

    def visit(x):
        if isinstance(x, ast.Op) and x.name == "AND":
            visit(x.args[0])
            visit(x.args[1])
            return
        if isinstance(x, ast.Op) and x.name == "EQ":
            a, b = x.args
            if isinstance(b, ast.Field) and isinstance(a, ast.Literal):
                a, b = b, a
            if (
                isinstance(a, ast.Field)
                and isinstance(b, ast.Literal)
                and b.value is not None
            ):
                if a.name not in part_by:
                    raise EngineError(
                        f"OPTIMIZE WHERE may reference only partition "
                        f"columns ({', '.join(part_by)}); {a.name} is not one"
                    )
                if a.name in out:
                    raise EngineError(
                        f"duplicate partition equality on {a.name}"
                    )
                out[a.name] = b.value
                return
        raise EngineError(
            "OPTIMIZE WHERE supports only `partition_col = literal` "
            "conjunctions (partition scoping selects directory names)"
        )

    visit(e)
    return out


