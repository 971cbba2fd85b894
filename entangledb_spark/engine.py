"""The entangleDB-on-Spark engine: session layer + statement execution.

Maps the reference's session semantics (/root/reference/src/sql/engine/
mod.rs:79-143) onto the snapshot catalog:

- `BEGIN [READ ONLY|READ WRITE] [AS OF SYSTEM TIME n]` pins a manifest
  version; read-write transactions stage changes in a pending manifest.
- `COMMIT` publishes the pending manifest as version N+1; `ROLLBACK`
  discards it. Both error without an open transaction (mod.rs:103-117).
- Statements outside a transaction auto-commit (mod.rs:124-143).
- `EXPLAIN stmt` returns our logical plan tree; physical detail is
  delegated to Spark's own explain (Catalyst is the optimizer — SURVEY
  §4.1 maps every reference rewrite rule onto a built-in Catalyst rule).
- `EXPLAIN ANALYZE query` (extension) EXECUTES the query cluster-side
  (rows never transfer to the driver) and returns the final adaptive
  physical plan annotated with per-operator RUNTIME metrics
  (numOutputRows, spill, shuffle bytes, pipeline time) plus the row
  count and wall time — queries only, DML is rejected.

DML is set-oriented and distributed end-to-end: INSERT/UPDATE/DELETE read
the pinned snapshot, transform declaratively, constraint-check with
aggregate/anti-join passes, and write a new immutable snapshot. No
driver-side row loops anywhere.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Any, Optional

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from entangledb_spark.functions.expressions import CompileError, compile_expr
from entangledb_spark.plans import ast
from entangledb_spark.plans.compiler import (
    RECURSIVE_CTE_MAX_ITERS,
    _carry_versioned,
    compile_statement,
)
from entangledb_spark.plans.lexer import LexError
from entangledb_spark.plans.parser import ParseError, parse
from entangledb_spark.sources import constraints as con
from entangledb_spark.sources.catalog import (
    SPARK_TYPES,
    CatalogError,
    SnapshotCatalog,
    column_to_dict,
    schema_of,
)


# ANALYZEd tables at or below this row count get a broadcast hint in the
# dialect compiler's scans (≈ a few MB — safely inside executor memory).
BROADCAST_ROW_THRESHOLD = 100_000


class EngineError(ValueError):
    pass


class Result:
    """Query/statement result. For SELECT the DataFrame is kept LAZY —
    `execute` launches no collection job; callers pull rows through
    `fetch(max_rows)` (O(max_rows) driver memory via toLocalIterator) or
    the `rows` property (full materialization, for small results/tests).
    Other statements carry a status string mirroring the reference's
    ResultSet variants."""

    def __init__(
        self,
        status: str,
        columns: Optional[list[str]] = None,
        rows: Optional[list[tuple]] = None,
        dataframe: Optional[DataFrame] = None,
        version: Optional[int] = None,
    ):
        self.status = status
        self.columns = columns
        self.dataframe = dataframe
        self.version = version
        self._rows = rows

    @property
    def rows(self) -> Optional[list[tuple]]:
        if self._rows is None and self.dataframe is not None:
            # partition-at-a-time pull — never a single giant collect
            self._rows = [tuple(r) for r in self.dataframe.toLocalIterator()]
        return self._rows

    def fetch(self, max_rows: Optional[int] = None) -> tuple[list[tuple], bool]:
        """First `max_rows` rows plus a truncated flag. Driver memory is
        O(max_rows) regardless of result size — the REPL path for
        `SELECT * FROM <100 TB table>`."""
        if self.dataframe is None or self._rows is not None:
            rows = self._rows or []
            if max_rows is not None and len(rows) > max_rows:
                return rows[:max_rows], True
            return rows, False
        if max_rows is None:
            return self.rows or [], False
        out: list[tuple] = []
        for r in self.dataframe.toLocalIterator():
            if len(out) >= max_rows:
                return out, True
            out.append(tuple(r))
        return out, False


def _fold_constant(e: ast.Expr) -> Any:
    """Constant-fold a literal-only expression (defaults are folded at plan
    time in the reference, planner.rs:49-53,635-638)."""
    if isinstance(e, ast.Literal):
        return e.value
    if isinstance(e, ast.Op) and e.name == "NEG":
        v = _fold_constant(e.args[0])
        if isinstance(v, (int, float)) and not isinstance(v, bool):
            return -v
    raise EngineError("default value must be a constant")


class Engine:
    def __init__(self, spark: SparkSession, base_dir: str):
        self.spark = spark
        self.catalog = SnapshotCatalog(spark, base_dir)
        self._txn: Optional[dict] = None  # pending manifest (read-write txn)
        self._txn_read_only = False
        self._txn_version: Optional[int] = None

    # ------------------------------------------------------------------ api

    def execute(self, sql: str) -> Result:
        from pyspark.errors import AnalysisException

        try:
            stmt = parse(sql)
            return self._execute_statement(stmt)
        except EngineError:
            raise
        except (
            LexError,
            ParseError,
            CompileError,
            CatalogError,
            con.ConstraintError,
            AnalysisException,  # Catalyst analyzer = our type checker of last resort
        ) as e:
            raise EngineError(str(e).split("\n")[0]) from e

    def explain(self, sql: str) -> str:
        stmt = parse(sql)
        if isinstance(stmt, ast.Explain):
            stmt = stmt.statement
        return self._explain(stmt)

    @property
    def in_transaction(self) -> bool:
        return self._txn is not None or self._txn_version is not None

    # ------------------------------------------------- transaction resume
    #
    # The reference's transaction state (version + active set) travels
    # inside each request so ANY node can resume the transaction
    # (/root/reference/src/storage/mvcc.rs:124-127; golden script
    # `src/storage/golden/mvcc/resume`). Our state is just as portable:
    # the pinned version plus the pending manifest, whose staged deltas
    # are already durable files — a plain JSON-able dict that can cross a
    # process or wire boundary.

    def txn_state(self) -> Optional[dict]:
        """Portable snapshot of the open transaction (None outside one)."""
        import copy

        if not self.in_transaction:
            return None
        return {
            "version": self._txn_version,
            "manifest": copy.deepcopy(self._txn),
        }

    def detach(self) -> dict:
        """Detach the open transaction from this session and return its
        portable state; the session returns to auto-commit mode without
        rolling back. The state can be `resume`d by any session on the
        same database — including over the wire on another connection."""
        state = self.txn_state()
        if state is None:
            raise EngineError("not in a transaction")
        self._txn = None
        self._txn_version = None
        return state

    def resume(self, state: dict) -> Result:
        """Adopt a transaction previously captured by txn_state/detach.
        Commit-time OCC still applies: if the same state is resumed twice,
        the second COMMIT conflicts (first-committer-wins), so a resumed
        transaction can never double-publish."""
        import copy

        if self.in_transaction:
            raise EngineError("already in a transaction")
        if not isinstance(state, dict) or "version" not in state:
            raise EngineError("invalid transaction state")
        version = state["version"]
        self.catalog.manifest(version)  # existence check (vacuum may have GC'd it)
        self._txn_version = version
        self._txn = copy.deepcopy(state.get("manifest"))
        kind = "READ ONLY " if self._txn is None else ""
        return Result(status=f"RESUME {kind}AT {version}", version=version)

    # catalog introspection — the reference's Request::ListTables/GetTable
    # (server.rs:215-220) and the REPL's !tables/!table backing calls

    def list_tables(self) -> list[str]:
        return sorted(self._manifest_for_read()["tables"])

    def analyze(self, name: str) -> Result:
        """ANALYZE (extension — the reference optimizer is rule-only with
        no statistics at all, src/sql/plan/optimizer.rs): compute table
        statistics in ONE distributed aggregate job — row count plus
        per-column approximate NDV and min/max — and store them in the
        table's manifest entry. The dialect compiler uses the row count to
        broadcast small analyzed tables even when Spark's size estimate
        can't see through the merge-on-read resolve plan; NDV/min/max are
        introspection surface (!table shows them).

        Stats are a snapshot of the analyzed version: later DML leaves
        them in place (still useful as estimates) until re-ANALYZEd."""
        if self._txn is not None or self._txn_version is not None:
            raise EngineError("ANALYZE is not allowed inside a transaction")
        base = self.catalog.current_version()
        manifest = self.catalog.manifest(base)
        t = manifest["tables"].get(name)
        if t is None:
            raise EngineError(f"table {name} does not exist")
        if t.get("external"):
            raise EngineError("ANALYZE is not supported for ATTACHed external tables")
        df = self.catalog.read_df(manifest, name)
        aggs: list = [F.count(F.lit(1)).alias("__n")]
        numeric = {"INTEGER", "FLOAT"}
        for c in t["columns"]:
            cn = c["name"]
            aggs.append(F.approx_count_distinct(cn).alias(f"__ndv_{cn}"))
            if c["datatype"] in numeric:
                aggs.append(F.min(cn).alias(f"__min_{cn}"))
                aggs.append(F.max(cn).alias(f"__max_{cn}"))
        row = df.agg(*aggs).first()
        cols = {}
        for c in t["columns"]:
            cn = c["name"]
            s: dict = {"ndv": row[f"__ndv_{cn}"]}
            if c["datatype"] in numeric:
                s["min"], s["max"] = row[f"__min_{cn}"], row[f"__max_{cn}"]
            cols[cn] = s
        t["stats"] = {"n_rows": row["__n"], "analyzed_version": base, "columns": cols}
        v = self.catalog.publish(manifest, expected_version=base)
        return Result(
            status=f"ANALYZE {name} ({row['__n']} rows, {len(cols)} columns)",
            version=v,
        )

    def vacuum(self, keep_last: int = 8) -> Result:
        """Retention GC on the snapshot store (extension): keep the last
        `keep_last` versions, delete older manifests and unreferenced data
        dirs. AS OF below the cutoff errors afterwards — the documented
        time-travel retention tradeoff. Not allowed inside a transaction
        (the pinned snapshot could be collected out from under it)."""
        if self._txn is not None or self._txn_version is not None:
            raise EngineError("VACUUM is not allowed inside a transaction")
        stats = self.catalog.vacuum(keep_last)
        return Result(
            status=(
                f"VACUUM kept v{stats['kept_from']}..v{stats['current']} "
                f"(removed {stats['removed_manifests']} manifests, "
                f"{stats['removed_data_dirs']} data dirs)"
            ),
            version=stats["current"],
        )

    def table_changes(self, name: str, from_version: int, to_version: Optional[int] = None) -> Result:
        """Change data feed between two committed versions (extension — the
        reference stores MVCC versions, storage/mvcc.rs:119-122, but has no
        changed-rows API). Returns the net row-level changes with a
        `_change_type` column ('insert'/'update'/'delete'); deletes carry
        the pre-image. Incremental consumers poll this instead of
        re-reading the table. Lazy like SELECT — rows pull via fetch()."""
        from entangledb_spark.sources.catalog import CatalogError

        if to_version is None:
            to_version = self.catalog.current_version()
        try:
            df = self.catalog.changes_df(name, from_version, to_version)
        except CatalogError as e:
            raise EngineError(str(e)) from None
        return Result(
            status=f"CHANGES {name} v{from_version}..v{to_version}",
            columns=list(df.columns),
            dataframe=df,
            version=to_version,
        )

    def attach_parquet(self, name: str, path: str) -> Result:
        """ATTACH an external parquet file/dir as a read-only table (schema
        inferred; types outside the 4-type system carried through verbatim).
        Lets a user point the SQL engine at existing data with zero copies —
        the scan stays a native parquet source with pushdown/pruning."""
        from entangledb_spark.sources.catalog import FROM_SPARK_TYPES
        from entangledb_spark.sources.parquet_io import read_parquet_any

        if self._txn is not None or self._txn_version is not None:
            raise EngineError("ATTACH is not allowed inside a transaction")
        path = os.path.abspath(path)
        df = read_parquet_any(self.spark, path)
        # OCC like _mutate: pin the version the manifest was read from so a
        # concurrent commit between read and publish conflicts instead of
        # being silently overwritten
        base = self.catalog.current_version()
        manifest = self.catalog.manifest(base)
        taken = self._name_taken(manifest, name)
        if taken:
            raise EngineError(f"{taken} {name} already exists")
        columns = [
            {
                "name": c,
                "datatype": FROM_SPARK_TYPES.get(t, f"EXT({t})"),
                "spark_type": t,
                "primary_key": False,
                "nullable": True,
                "has_default": False,
                "default": None,
                "unique": False,
                "references": None,
                "index": False,
            }
            for c, t in df.dtypes
        ]
        manifest["tables"][name] = {
            "columns": columns,
            "data": None,
            "external": path,
        }
        v = self.catalog.publish(manifest, expected_version=base)
        return Result(status=f"ATTACH {name}", version=v)

    def get_table(self, name: str) -> dict:
        t = self._manifest_for_read()["tables"].get(name)
        if t is None:
            raise EngineError(f"table {name} does not exist")
        return {"name": name, "columns": [dict(c) for c in t["columns"]]}

    # ---------------------------------------------------------- dispatch

    def _execute_statement(self, stmt: ast.Statement) -> Result:
        if isinstance(stmt, ast.Explain):
            if stmt.analyze:
                return Result(
                    status="EXPLAIN ANALYZE", columns=["plan"],
                    rows=[(line,) for line in
                          self._explain_analyze(stmt.statement).splitlines()],
                )
            return Result(status="EXPLAIN", columns=["plan"],
                          rows=[(line,) for line in self._explain(stmt.statement).splitlines()])
        if isinstance(stmt, ast.Begin):
            return self._begin(stmt)
        if isinstance(stmt, ast.Commit):
            return self._commit()
        if isinstance(stmt, ast.Rollback):
            return self._rollback()
        if isinstance(stmt, (ast.Select, ast.SetOp, ast.With)):
            df = compile_statement(stmt, self.spark, self._reader())
            if _is_constant_query(stmt):
                # FROM-less (Nothing-node) selects are a handful of constant
                # rows: materialize eagerly so expression runtime errors
                # (factorial domain, div-zero, overflow) surface here with
                # the engine's error type, like the reference.
                try:
                    rows = [tuple(r) for r in df.collect()]
                except Exception as e:  # Spark runtime error on constants
                    raise EngineError(str(e).splitlines()[0]) from e
                return Result(
                    status="SELECT", columns=list(df.columns), rows=rows, dataframe=df
                )
            # table-backed SELECT: the Result stays LAZY — no job here, rows
            # pull on demand (fetch(max_rows) is O(max_rows) driver memory)
            return Result(status="SELECT", columns=list(df.columns), dataframe=df)
        if isinstance(stmt, ast.Copy):
            # a READ: exports the session's pinned snapshot (READ ONLY
            # transactions may export — that is the consistent-dump shape)
            return self._copy(stmt)
        # mutations below
        if self._txn_version is not None and self._txn is None:
            raise EngineError("can't write in a read-only transaction")
        if isinstance(stmt, ast.CreateTable):
            return self._mutate(lambda m: self._create_table(m, stmt))
        if isinstance(stmt, ast.CreateTableAs):
            return self._mutate(lambda m: self._create_table_as(m, stmt))
        if isinstance(stmt, ast.DropTable):
            return self._mutate(lambda m: self._drop_table(m, stmt))
        if isinstance(stmt, ast.AlterTable):
            return self._mutate(lambda m: self._alter_table(m, stmt))
        if isinstance(stmt, ast.Optimize):
            return self._mutate(lambda m: self._optimize(m, stmt))
        if isinstance(stmt, ast.CreateView):
            return self._mutate(lambda m: self._create_view(m, stmt))
        if isinstance(stmt, ast.DropView):
            return self._mutate(lambda m: self._drop_view(m, stmt))
        if isinstance(stmt, ast.CreateMaterializedView):
            return self._mutate(lambda m: self._create_matview(m, stmt))
        if isinstance(stmt, ast.DropMaterializedView):
            return self._mutate(lambda m: self._drop_matview(m, stmt))
        if isinstance(stmt, ast.RefreshMaterializedView):
            if self.in_transaction:
                # REFRESH diffs committed VERSIONS via the change data
                # feed; a pending manifest has no version to diff against
                raise EngineError(
                    "REFRESH MATERIALIZED VIEW is not allowed inside a transaction"
                )
            return self._mutate(lambda m: self._refresh_matview(m, stmt))
        if isinstance(stmt, ast.Insert):
            return self._mutate(lambda m: self._insert(m, stmt))
        if isinstance(stmt, ast.Update):
            return self._mutate(lambda m: self._update(m, stmt))
        if isinstance(stmt, ast.Delete):
            return self._mutate(lambda m: self._delete(m, stmt))
        if isinstance(stmt, ast.Merge):
            return self._mutate(lambda m: self._merge(m, stmt))
        raise EngineError(f"unsupported statement {type(stmt).__name__}")

    # ---------------------------------------------------------- sessions

    def _begin(self, stmt: ast.Begin) -> Result:
        if self.in_transaction:
            raise EngineError("already in a transaction")
        if stmt.as_of is not None:
            self.catalog.manifest(stmt.as_of)  # existence check
            self._txn_version = stmt.as_of
            return Result(status=f"BEGIN READ ONLY AS OF {stmt.as_of}", version=stmt.as_of)
        v = self.catalog.current_version()
        self._txn_version = v
        if not stmt.read_only:
            self._txn = self.catalog.manifest(v)
        return Result(status="BEGIN", version=v)

    def _commit(self) -> Result:
        if not self.in_transaction:
            raise EngineError("not in a transaction")
        if self._txn is not None:
            v = self.catalog.publish(self._txn, expected_version=self._txn_version)
        else:
            v = self._txn_version
        self._txn = None
        self._txn_version = None
        return Result(status="COMMIT", version=v)

    def _rollback(self) -> Result:
        if not self.in_transaction:
            raise EngineError("not in a transaction")
        self._txn = None
        self._txn_version = None
        return Result(status="ROLLBACK")

    def _mutate(self, apply) -> Result:
        """Run a mutation against the active pending manifest, or auto-commit
        (implicit single-statement transaction, engine/mod.rs:124-143)."""
        if self._txn is not None:
            return apply(self._txn)
        base = self.catalog.current_version()
        manifest = self.catalog.manifest(base)
        result = apply(manifest)
        v = self.catalog.publish(manifest, expected_version=base)
        result.version = v
        return result

    def _reader(self):
        if self._txn is not None:
            manifest = self._txn
        else:
            manifest = self.catalog.manifest(self._txn_version)
        return self._reader_for(manifest)

    def _reader_for(self, manifest: dict):
        def versioned(name: str, version: int) -> DataFrame:
            # FROM t AS OF SYSTEM TIME n: resolve through the named
            # version's OWN reader, so views/matviews pinned there expand
            # with their era's definitions too
            return self._reader_for(self.catalog.manifest(version))(name)

        views = manifest.get("views") or {}
        matviews = manifest.get("matviews") or {}

        def relations() -> list[tuple]:
            # catalog introspection rows for the relations() TVF — built
            # from THIS manifest, so a pinned AS OF session lists its era
            out = []
            for name, t in manifest["tables"].items():
                kind = "external table" if t.get("external") else "table"
                cols = ", ".join(c["name"] for c in t["columns"])
                out.append((name, kind, len(t["columns"]), cols))
            for name, v in views.items():
                out.append((name, "view", len(v["columns"]), ", ".join(v["columns"])))
            for name, mv in matviews.items():
                out.append(
                    (name, "materialized view", len(mv["columns"]),
                     ", ".join(mv["columns"]))
                )
            return sorted(out)

        def make_read(stack: tuple = ()):
            def read(name: str) -> DataFrame:
                v = views.get(name)
                if v is not None:
                    # view: expand its stored SQL against THIS manifest's
                    # reader — nested views recurse with a cycle guard
                    # (cycles can't be created, deps forbid it; guard is
                    # defense-in-depth against a hand-edited manifest)
                    if name in stack:
                        raise EngineError(
                            "view dependency cycle: "
                            + " -> ".join(stack + (name,))
                        )
                    return compile_statement(
                        parse(v["sql"]), self.spark, make_read(stack + (name,))
                    )
                mv = matviews.get(name)
                if mv is not None:
                    # materialized: serve the stored snapshot — a plain
                    # pruned parquet scan, never a recompute
                    return self.spark.read.parquet(
                        os.path.join(self.catalog.base, mv["data"])
                    )
                return read_table(name)

            read.versioned = versioned
            read.relations = relations
            return read

        def read_table(name: str) -> DataFrame:
            df = self.catalog.read_df(manifest, name)
            # stats-informed broadcast hint (see analyze()): Spark's own
            # size estimate can't see through the merge-on-read resolve
            # plan (window over base ∪ deltas), so a small dim with deltas
            # may miss auto-broadcast. ANALYZEd row counts restore the
            # metastore-stats-driven first plan; AQE still re-plans big
            # misestimates at runtime.
            meta = manifest["tables"].get(name) or {}
            stats = meta.get("stats")
            if stats and stats.get("n_rows", 1 << 62) <= BROADCAST_ROW_THRESHOLD:
                df = F.broadcast(df)
            return df

        return make_read()

    def _manifest_for_read(self) -> dict:
        if self._txn is not None:
            return self._txn
        return self.catalog.manifest(self._txn_version)

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
        """
        from entangledb_spark.sources.layout import zorder_frame

        meta = self._table_meta(manifest, stmt.table, writable=True)
        names = {c["name"] for c in meta["columns"]}
        for z in stmt.zorder:
            if z not in names:
                raise EngineError(f"unknown column {z} in table {stmt.table}")
        if stmt.zorder and meta.get("partition_by"):
            raise EngineError(
                "OPTIMIZE ZORDER is not supported on a partition_by table — "
                "the directory layout already fixes file placement"
            )
        if stmt.where is not None:
            if stmt.zorder:
                raise EngineError(
                    "OPTIMIZE WHERE cannot combine with ZORDER BY "
                    "(Z-ordering is a whole-table layout)"
                )
            part_by = meta.get("partition_by") or []
            if not part_by:
                raise EngineError(
                    f"OPTIMIZE {stmt.table} WHERE requires a partition_by "
                    "table — there are no partition directories to scope to"
                )
            eq = _partition_equalities(stmt.where, part_by)
            stats = self.catalog.compact_partitions(
                manifest, stmt.table, eq, files=stmt.files
            )
            n = self.catalog.count_rows(meta["data"])
            scope = ", ".join(f"{c}={v}" for c, v in eq.items())
            return Result(
                status=(
                    f"OPTIMIZE {stmt.table} (partitions {scope} rewritten, "
                    f"{stats['kept']} file(s) kept by identity, {n} rows)"
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

    # ------------------------------------------------- materialized views

    # Incremental refresh recomputes only the groups the change data feed
    # touched; above this many distinct changed groups a full recompute is
    # cheaper than broadcasting the key set into two semi/anti joins.
    MV_INCREMENTAL_MAX_GROUPS = 100_000

    def _name_taken(self, manifest: dict, name: str) -> Optional[str]:
        if name in manifest["tables"]:
            return "table"
        if name in (manifest.get("views") or {}):
            return "view"
        if name in (manifest.get("matviews") or {}):
            return "materialized view"
        return None

    def _create_matview(self, manifest: dict, stmt: ast.CreateMaterializedView) -> Result:
        """CREATE MATERIALIZED VIEW (extension): compute the defining query
        ONCE, write the result as an immutable parquet snapshot, and serve
        reads from the snapshot — SELECTs against it are plain pruned
        parquet scans, zero recompute. The stored entry records the query
        text, dependencies (DROP protection, like plain views), the data
        pointer, and the catalog version the data reflects — the
        `base_version` REFRESH diffs from.

        `incremental` is decided by shape analysis at create time: a
        single-managed-table GROUP BY aggregate refreshes via the change
        data feed (see _refresh_matview); anything else refreshes by full
        recompute, honestly labeled in the status and !table output."""
        taken = self._name_taken(manifest, stmt.name)
        if taken:
            raise EngineError(f"{taken} {stmt.name} already exists")
        mvs = manifest.setdefault("matviews", {})
        deps: set[str] = set()
        base = self._reader()

        def recording(name: str) -> DataFrame:
            deps.add(name)
            return base(name)

        _carry_versioned(recording, base)  # forward ALL reader capabilities

        try:
            df = compile_statement(stmt.query, self.spark, recording)
        except CompileError as e:
            raise EngineError(f"CREATE MATERIALIZED VIEW {stmt.name}: {e}") from None
        shape = _matview_grouped_shape(stmt.query, deps)
        if shape is None:
            spj = _matview_spj_shape(stmt.query, deps)
            # the SPJ path merges on the base PK, so the OUTPUT must
            # carry it as a plain column — else full recompute
            if spj is not None:
                base_meta = manifest["tables"].get(spj["base"])
                pk = (
                    next(
                        (c["name"] for c in base_meta["columns"] if c["primary_key"]),
                        None,
                    )
                    if base_meta
                    else None
                )
                if pk is not None and pk in spj["fields"]:
                    shape = spj
        incremental = shape is not None and not (
            manifest["tables"].get(shape["base"], {}).get("external")
        ) and shape["base"] in manifest["tables"]
        rel = self.catalog.write_snapshot(f"__mv_{stmt.name}", df)
        n = self.catalog.count_rows(rel)
        mvs[stmt.name] = {
            "sql": stmt.sql,
            "deps": sorted(deps),
            "columns": list(df.columns),
            "data": rel,
            # the version whose DATA this snapshot reflects. Auto-commit:
            # this statement's own publish lands at current+1 and changes
            # nothing else, so the MV is born NON-stale. In a transaction:
            # the pinned start version — later statements of the same txn
            # may mutate the base, and affected-group recompute is
            # idempotent, so a conservative (older) watermark only costs
            # work, never correctness.
            "base_version": (
                self._txn_version
                if self._txn_version is not None
                else self.catalog.current_version() + 1
            ),
            "incremental": incremental,
        }
        return Result(
            status=(
                f"CREATE MATERIALIZED VIEW {stmt.name} ({n} rows, "
                f"{'incremental' if incremental else 'full'}-refresh)"
            )
        )

    def _drop_matview(self, manifest: dict, stmt: ast.DropMaterializedView) -> Result:
        mvs = manifest.get("matviews") or {}
        if stmt.name not in mvs:
            raise EngineError(f"materialized view {stmt.name} does not exist")
        for other, v in (manifest.get("views") or {}).items():
            if stmt.name in v.get("deps", ()):
                raise EngineError(
                    f"materialized view {stmt.name} is referenced by view {other}"
                )
        for other, v in mvs.items():
            if other != stmt.name and stmt.name in v.get("deps", ()):
                raise EngineError(
                    f"materialized view {stmt.name} is referenced by "
                    f"materialized view {other}"
                )
        del mvs[stmt.name]
        return Result(status=f"DROP MATERIALIZED VIEW {stmt.name}")

    def _refresh_matview(self, manifest: dict, stmt: ast.RefreshMaterializedView) -> Result:
        """REFRESH MATERIALIZED VIEW: bring the stored snapshot up to date.

        Incremental path (single-table GROUP BY shape): the change data
        feed between the MV's base_version and the current version yields
        the changed rows; their group keys — post-image keys PLUS the
        pre-image keys of the same PKs read from the OLD snapshot (a row
        UPDATEd into a different group stales BOTH groups) — form the
        affected-key set. Only those groups are re-aggregated, by
        compiling the stored query against a reader that semi-joins the
        base scan to the broadcast key set, and merged into the snapshot
        with a null-safe anti join (NULL is a legal group). Cost scales
        with data in CHANGED groups, not table size — the 100 TB design
        point. Joins are null-safe eqNullSafe throughout.

        Falls back to full recompute when: the shape isn't incremental,
        more than MV_INCREMENTAL_MAX_GROUPS groups changed, or the
        base_version manifest was vacuumed away. The status line names
        the path taken."""
        mvs = manifest.get("matviews") or {}
        mv = mvs.get(stmt.name)
        if mv is None:
            raise EngineError(f"materialized view {stmt.name} does not exist")
        current = self.catalog.current_version()
        if mv["base_version"] >= current:
            # _mutate still publishes a (no-op) version current+1 for this
            # statement — advance the watermark to match it, or the MV
            # would read as STALE immediately after its own refresh
            # (round-9 advice) and every idle refresh would ratchet
            # staleness one version further.
            mv["base_version"] = current + 1
            return Result(
                status=f"REFRESH MATERIALIZED VIEW {stmt.name} (already at v{current})"
            )
        # the refresh's own auto-commit publishes at current+1 and touches
        # no base table, so the snapshot reflects that version too —
        # without the +1 every refresh would mark itself stale
        post_version = current + 1
        parsed = parse(mv["sql"])
        mode, n_groups, new_df = "full", None, None
        if mv.get("incremental"):
            shape = _matview_grouped_shape(parsed, set(mv["deps"]))
            spj = (
                _matview_spj_shape(parsed, set(mv["deps"]))
                if shape is None
                else None
            )
            if shape is not None or spj is not None:
                try:
                    inc = (
                        self._incremental_mv_rows(mv, parsed, shape)
                        if shape is not None
                        else self._incremental_mv_spj_rows(mv, parsed, spj)
                    )
                except CatalogError:
                    inc = None  # e.g. base_version vacuumed → full recompute
                except AnalysisException:
                    # e.g. a column the MV does not reference was renamed
                    # between base_version and now, so old-snapshot names
                    # no longer resolve against the change feed (round-9
                    # advice): the incremental delta is unresolvable but
                    # the MV itself is fine — recompute fully rather than
                    # leave REFRESH permanently broken
                    inc = None
                if inc is not None:
                    new_df, n_groups = inc
                    mode = "incremental" if shape is not None else "incremental-spj"
                    if n_groups == 0:
                        # nothing changed in the base (e.g. only OTHER
                        # tables, or the MV's own last refresh, bumped the
                        # version): update the watermark, skip the rewrite
                        mv["base_version"] = post_version
                        return Result(
                            status=(
                                f"REFRESH MATERIALIZED VIEW {stmt.name} "
                                f"(no base changes; now at v{post_version})"
                            )
                        )
        if new_df is None:
            new_df = compile_statement(parsed, self.spark, self._reader())
        rel = self.catalog.write_snapshot(f"__mv_{stmt.name}", new_df)
        mv["data"] = rel
        mv["base_version"] = post_version
        n = self.catalog.count_rows(rel)
        unit = "changed pk(s) applied" if mode == "incremental-spj" else "group(s) recomputed"
        extra = f", {n_groups} {unit}" if n_groups is not None else ""
        return Result(
            status=(
                f"REFRESH MATERIALIZED VIEW {stmt.name} ({mode}{extra}, {n} rows)"
            )
        )

    def _incremental_mv_rows(self, mv: dict, parsed, shape: dict):
        """(merged DataFrame, affected-group count) for the incremental
        path, or None when the changed-group set is too large to beat a
        full recompute."""
        base_t = shape["base"]
        key_cols = shape["key_cols"]  # base-table column names
        out_cols = shape["out_cols"]  # their names in the MV output
        changes = self.catalog.changes_df(
            base_t, mv["base_version"], self.catalog.current_version()
        )
        new_keys = changes.select(*key_cols).distinct()
        old_man = self.catalog.manifest(mv["base_version"])
        if base_t in old_man["tables"]:
            # PK IDENTITY is stable across ALTER TABLE RENAME (physical-
            # name pinning) but its LOGICAL name may differ between the
            # two manifests: the change feed speaks the CURRENT name, the
            # base_version snapshot the OLD one (round-9 advice: resolving
            # both from the old manifest broke REFRESH after a rename of
            # a column the MV doesn't reference, e.g. the PK itself).
            cur_man = self.catalog.manifest(self.catalog.current_version())
            pk_new = next(
                c["name"]
                for c in cur_man["tables"][base_t]["columns"]
                if c["primary_key"]
            )
            pk_old = next(
                c["name"]
                for c in old_man["tables"][base_t]["columns"]
                if c["primary_key"]
            )
            old_keys = (
                self.catalog.read_df(old_man, base_t)
                .join(
                    changes.select(F.col(pk_new).alias(pk_old)).distinct(),
                    pk_old,
                    "left_semi",
                )
                .select(*key_cols)
                .distinct()
            )
            affected = new_keys.unionByName(old_keys).distinct()
        else:
            affected = new_keys
        affected = affected.localCheckpoint(eager=True)
        k = affected.count()
        if k == 0:
            return None, 0
        if k > self.MV_INCREMENTAL_MAX_GROUPS:
            return None
        base_read = self._reader()

        def _nullsafe_on(left: DataFrame, right: DataFrame, lcols, rcols):
            cond = None
            for lc, rc in zip(lcols, rcols):
                c = left[lc].eqNullSafe(right[rc])
                cond = c if cond is None else (cond & c)
            return cond

        aff_b = F.broadcast(affected)

        def refresh_reader(name: str) -> DataFrame:
            df = base_read(name)
            if name == base_t:
                df = df.join(
                    aff_b, _nullsafe_on(df, affected, key_cols, key_cols), "left_semi"
                )
            return df

        recomputed = compile_statement(parsed, self.spark, refresh_reader)
        old_mv = self.spark.read.parquet(os.path.join(self.catalog.base, mv["data"]))
        aff_out = F.broadcast(affected.toDF(*out_cols))
        kept = old_mv.join(
            aff_out, _nullsafe_on(old_mv, aff_out, out_cols, out_cols), "left_anti"
        )
        return kept.unionByName(recomputed), k

    def _incremental_mv_spj_rows(self, mv: dict, parsed, spj: dict):
        """(merged DataFrame, changed-pk count) for the SPJ (no-aggregate)
        incremental path (round 10): base rows map 1:1/1:0 to output rows,
        so the CDF slice applies DIRECTLY — anti-join the changed PKs'
        old output rows out of the snapshot, then append the post-images
        compiled through the stored query itself (the WHERE predicate and
        every select expression ride along for free). Cost scales with
        the delta, never the table. Returns None to request a full
        recompute (delta too large, or the output no longer carries the
        current PK name)."""
        base_t = spj["base"]
        cur_man = self.catalog.manifest(self.catalog.current_version())
        if base_t not in cur_man["tables"]:
            return None
        pk = next(
            c["name"]
            for c in cur_man["tables"][base_t]["columns"]
            if c["primary_key"]
        )
        pk_out = spj["fields"].get(pk)
        if pk_out is None:
            # e.g. the PK was renamed after CREATE: the stored SQL's
            # field map no longer names it — full recompute stays correct
            return None
        changes = self.catalog.changes_df(
            base_t, mv["base_version"], self.catalog.current_version()
        ).localCheckpoint(eager=True)
        k = changes.count()
        if k == 0:
            return None, 0
        if k > self.MV_INCREMENTAL_MAX_GROUPS:
            return None
        base_read = self._reader()
        post = changes.filter(F.col("_change_type") != "delete").drop(
            "_change_type"
        )

        def spj_reader(name: str) -> DataFrame:
            return post if name == base_t else base_read(name)

        new_rows = compile_statement(parsed, self.spark, spj_reader)
        old_mv = self.spark.read.parquet(
            os.path.join(self.catalog.base, mv["data"])
        )
        changed_pks = F.broadcast(
            changes.select(F.col(pk).alias(pk_out)).distinct()
        )
        kept = old_mv.join(changed_pks, pk_out, "left_anti")
        return kept.unionByName(new_rows), k

    def list_matviews(self) -> list[str]:
        return sorted(self._manifest_for_read().get("matviews") or {})

    def get_matview(self, name: str) -> dict:
        mv = (self._manifest_for_read().get("matviews") or {}).get(name)
        if mv is None:
            raise EngineError(f"materialized view {name} does not exist")
        out = {
            "name": name,
            **{k: mv[k] for k in ("sql", "deps", "columns", "base_version", "incremental")},
        }
        out["stale"] = mv["base_version"] < self.catalog.current_version()
        return out

    # ---------------------------------------------------------- DML helpers

    def _table_meta(self, manifest: dict, name: str, writable: bool = False) -> dict:
        t = manifest["tables"].get(name)
        if t is None:
            kind = self._name_taken(manifest, name)
            if kind in ("view", "materialized view"):
                raise EngineError(f"{name} is a {kind} — writes need a base table")
            raise EngineError(f"table {name} does not exist")
        if writable and t.get("external"):
            raise EngineError(f"table {name} is an attached external table (read-only)")
        return t

    def _pk_of(self, meta: dict) -> str:
        return next(c["name"] for c in meta["columns"] if c["primary_key"])

    def _validate_view(self, manifest: dict, name: str, candidate: DataFrame) -> None:
        """Run every constraint against the candidate full-table view (the
        state that WOULD be current if the mutation commits). The view is a
        lazy plan — checks are distributed jobs, the view itself is never
        materialized on the driver."""
        meta = self._table_meta(manifest, name)
        cols = meta["columns"]
        con.check_not_null_and_length(name, candidate, cols)
        con.check_unique(name, candidate, cols)

        def target_df_and_pk(tname: str):
            if tname == name:
                return candidate, self._pk_of(meta)
            tmeta = self._table_meta(manifest, tname)
            return self.catalog.read_df(manifest, tname), self._pk_of(tmeta)

        con.check_foreign_keys(name, candidate, cols, target_df_and_pk)

    # ---------------------------------------------------------- INSERT

    def _insert(self, manifest: dict, stmt: ast.Insert) -> Result:
        meta = self._table_meta(manifest, stmt.table, writable=True)
        cols = meta["columns"]
        col_names = [c["name"] for c in cols]
        by_name = {c["name"]: c for c in cols}

        if stmt.columns is not None:
            for cname in stmt.columns:
                if cname not in by_name:
                    raise EngineError(f"unknown column {cname} in table {stmt.table}")
            target_cols = list(stmt.columns)
        else:
            target_cols = None

        if stmt.query is not None:
            return self._insert_select(manifest, stmt, meta, target_cols)

        rows = []
        for values in stmt.values:
            named: dict[str, Any] = {}
            if target_cols is not None:
                if len(values) != len(target_cols):
                    raise EngineError(
                        f"column count {len(target_cols)} does not match value count {len(values)}"
                    )
                for cname, expr in zip(target_cols, values):
                    named[cname] = _eval_constant(expr)
            else:
                if len(values) > len(col_names):
                    raise EngineError(f"too many values for table {stmt.table}")
                for cname, expr in zip(col_names, values):
                    named[cname] = _eval_constant(expr)
            # pad with defaults (mutation.rs:24-56)
            for c in cols:
                if c["name"] not in named:
                    if not c["has_default"]:
                        raise EngineError(
                            f"no value given for column {c['name']} in table {stmt.table}"
                        )
                    named[c["name"]] = c["default"]
            rows.append(_coerce_row(named, cols, stmt.table))

        schema = schema_of(
            [dict(c, nullable=True) for c in cols]  # NULL checks run separately
        )
        new_rows = self.spark.createDataFrame(rows, schema)
        existing = self.catalog.read_df(manifest, stmt.table)
        combined = existing.unionByName(new_rows)
        self._validate_view(manifest, stmt.table, combined)
        # merge-on-read: only the new rows hit disk (O(inserted), not O(table))
        self.catalog.stage_delta(manifest, stmt.table, upserts=new_rows)
        return Result(status=f"INSERT {len(rows)}")

    def _insert_select(
        self, manifest: dict, stmt: ast.Insert, meta: dict, target_cols
    ) -> Result:
        """INSERT ... SELECT (extension): the source query stays a lazy
        distributed plan end-to-end — rows never touch the driver."""
        cols = meta["columns"]
        src_df = compile_statement(stmt.query, self.spark, self._reader())
        names = target_cols if target_cols is not None else [c["name"] for c in cols]
        if len(src_df.columns) != len(names):
            raise EngineError(
                f"INSERT SELECT column count {len(src_df.columns)} does not match {len(names)}"
            )
        src_df = src_df.toDF(*names)
        src_types = dict(src_df.dtypes)
        # strict write typing like the VALUES path (_coerce_row): a source
        # column must already have the target's type family (int widens to
        # float); no silent string/float→int casts
        compatible = {
            "BOOLEAN": {"boolean"},
            "INTEGER": {"tinyint", "smallint", "int", "bigint"},
            "FLOAT": {"tinyint", "smallint", "int", "bigint", "float", "double"},
            "STRING": {"string"},
        }
        by_name = {c["name"]: c for c in cols}
        for n in names:
            st = src_types[n]
            if st != "void" and st not in compatible[by_name[n]["datatype"]]:
                raise EngineError(
                    f"invalid value of type {st} for "
                    f"{by_name[n]['datatype'].lower()} column {n} in table {stmt.table}"
                )
        out_cols = []
        for c in cols:
            if c["name"] in names:
                out_cols.append(
                    F.col(c["name"]).cast(SPARK_TYPES[c["datatype"]]).alias(c["name"])
                )
            elif c["has_default"]:
                out_cols.append(
                    F.lit(c["default"]).cast(SPARK_TYPES[c["datatype"]]).alias(c["name"])
                )
            else:
                raise EngineError(
                    f"no value given for column {c['name']} in table {stmt.table}"
                )
        new_rows = src_df.select(*out_cols)
        existing = self.catalog.read_df(manifest, stmt.table)
        combined = existing.unionByName(new_rows)
        self._validate_view(manifest, stmt.table, combined)
        delta = self.catalog.stage_delta(manifest, stmt.table, upserts=new_rows)
        n_new = self.catalog.count_rows(delta["upserts"]) if delta else 0
        return Result(status=f"INSERT {n_new}")

    def _create_table_as(self, manifest: dict, stmt: ast.CreateTableAs) -> Result:
        """CREATE TABLE AS SELECT (extension): materialize a query as a new
        managed table; the first output column becomes the primary key and
        is validated unique + non-null like any other PK."""
        from entangledb_spark.sources.catalog import FROM_SPARK_TYPES

        taken = self._name_taken(manifest, stmt.name)
        if taken:
            raise EngineError(f"{taken} {stmt.name} already exists")
        df = compile_statement(stmt.query, self.spark, self._reader())
        cols = []
        for i, (cname, ctype) in enumerate(df.dtypes):
            dt = FROM_SPARK_TYPES.get(ctype)
            if dt is None:
                raise EngineError(
                    f"column {cname} has type {ctype}, outside the engine type system"
                )
            cols.append(
                {
                    "name": cname, "datatype": dt, "primary_key": i == 0,
                    "nullable": i != 0, "has_default": i != 0, "default": None,
                    "unique": i == 0, "references": None, "index": i == 0,
                }
            )
        manifest["tables"][stmt.name] = {"columns": cols, "data": None, "deltas": []}
        target_types = [SPARK_TYPES[c["datatype"]] for c in cols]
        casted = df.select(
            *[F.col(n).cast(t).alias(n) for (n, _), t in zip(df.dtypes, target_types)]
        )
        self._validate_view(manifest, stmt.name, casted)
        self.catalog.stage_delta(manifest, stmt.name, upserts=casted)
        n = casted.count()
        return Result(status=f"CREATE TABLE {stmt.name} AS ({n} rows)")

    # ---------------------------------------------------------- UPDATE

    def _update(self, manifest: dict, stmt: ast.Update) -> Result:
        from entangledb_spark.functions.expressions import static_type

        meta = self._table_meta(manifest, stmt.table, writable=True)
        by_name = {c["name"]: c for c in meta["columns"]}
        df = self.catalog.read_df(manifest, stmt.table).alias(stmt.table)
        scope_resolve, scope_type = _single_table_scope(stmt.table, df)
        for cname, expr in stmt.sets:
            if cname not in by_name:
                raise EngineError(f"unknown column {cname} in table {stmt.table}")
            # strict write typing like INSERT's _coerce_row (schema.rs value
            # validation): reject type-mismatched SET statically instead of
            # silently casting ('42'→INT, 2.7→truncated 2)
            st = static_type(expr, scope_type)
            want = {"BOOLEAN": "bool", "INTEGER": "int", "FLOAT": "float", "STRING": "str"}[
                by_name[cname]["datatype"]
            ]
            ok = st is None or st == want or (want == "float" and st == "int")
            if not ok:
                raise EngineError(
                    f"invalid value of type {st} for {by_name[cname]['datatype'].lower()} "
                    f"column {cname} in table {stmt.table}"
                )
        pred = (
            compile_expr(stmt.where, scope_resolve, scope_type)
            if stmt.where is not None
            else F.lit(True)
        )
        updates = {
            cname: compile_expr(expr, scope_resolve, scope_type)
            for cname, expr in stmt.sets
        }
        # Evaluate the predicate ONCE against pre-update values (a SET that
        # flips its own WHERE condition must not unselect the row), then
        # apply every SET expression against the old row values.
        flagged = df.withColumn("__upd", F.coalesce(pred, F.lit(False)))
        # one simultaneous select: every SET expression sees OLD values
        # (`SET a = 1, b = a` assigns the old a to b — mutation.rs evaluates
        # against the original row too)
        projected = []
        for c in [col["name"] for col in meta["columns"]]:
            if c in updates:
                ty = SPARK_TYPES[by_name[c]["datatype"]]
                projected.append(
                    F.when(F.col("__upd"), updates[c].cast(ty))
                    .otherwise(F.col(c))
                    .alias(c)
                )
            else:
                projected.append(F.col(c))
        out = flagged.select(*projected, F.col("__upd"))
        self._validate_view(manifest, stmt.table, out.drop("__upd"))
        # merge-on-read: write only the changed rows; if the PK itself was
        # assigned, tombstone the old keys in the same delta (upsert wins at
        # equal rank, so UPDATE pk=pk+1 overlaps resolve correctly)
        pk = self._pk_of(meta)
        changed = out.filter(F.col("__upd")).drop("__upd")
        old_keys = flagged.filter(F.col("__upd")).select(pk) if pk in updates else None
        delta = self.catalog.stage_delta(
            manifest, stmt.table, upserts=changed, deletes=old_keys
        )
        # matched count from the written delta's parquet footers (metadata
        # read) instead of a second full-table filter job
        n_matched = self.catalog.count_rows(delta["upserts"]) if delta else 0
        return Result(status=f"UPDATE {n_matched}")

    # ---------------------------------------------------------- COPY

    def _copy(self, stmt: ast.Copy) -> Result:
        """COPY ... TO (extension): export a table or query result to
        external parquet/csv — the matching half of ATTACH. A read, not a
        mutation: no manifest change, no version bump; the write respects
        the session's snapshot (inside a transaction it exports the
        pinned view). Distributed end-to-end — Spark writes the files
        from the executors; the row count rides an Observation on the
        same job (no second pass). Refuses an existing destination unless
        OVERWRITE is given (Spark save-mode semantics)."""
        from pyspark.sql import Observation

        if isinstance(stmt.source, str):
            df = self._reader()(stmt.source)
        else:
            df = compile_statement(stmt.source, self.spark, self._reader())
        obs = Observation()
        df = df.observe(obs, F.count(F.lit(1)).alias("n"))
        writer = df.write.mode("overwrite" if stmt.overwrite else "error")
        if stmt.fmt == "csv":
            writer = writer.option("header", "true")
        try:
            writer.format(stmt.fmt).save(stmt.path)
        except Exception as e:  # path exists without OVERWRITE, bad path, ...
            raise EngineError(str(e).splitlines()[0]) from e
        n = int(obs.get["n"])
        return Result(status=f"COPY {n} rows to {stmt.path}")

    # ---------------------------------------------------------- MERGE

    def _merge(self, manifest: dict, stmt: ast.Merge) -> Result:
        """MERGE INTO (extension — the reference has no upsert statement):
        one source pass decides update / delete / insert per row, staged as
        a single delta so the whole statement is one atomic snapshot
        version (or part of the surrounding transaction's manifest).

        Semantics (the SQL-standard core):
        - a target row matched by MORE THAN ONE source row is a
          cardinality violation whenever an UPDATE or DELETE clause
          exists — rejected up front (distributed groupBy count on the
          match keys, one bounded job);
        - WHEN MATCHED clauses apply in statement order (an UPDATE listed
          before a DELETE claims the rows both conditions accept);
        - UPDATE SET expressions see both tables' OLD values; the primary
          key cannot be assigned (use DELETE + INSERT);
        - WHEN NOT MATCHED INSERT values see the SOURCE row only; omitted
          target columns take their defaults, like INSERT.

        Distributed end-to-end: the decision join is one equi/theta join
        Catalyst plans like any other; updates/inserts land as upsert
        rows and deletes as key tombstones in ONE merge-on-read delta —
        no row loops, no driver materialization."""
        from entangledb_spark.functions.expressions import static_type

        meta = self._table_meta(manifest, stmt.target, writable=True)
        pk = self._pk_of(meta)
        by_name = {c["name"]: c for c in meta["columns"]}
        t_alias = stmt.target_alias or stmt.target
        if isinstance(stmt.source, str):
            s_alias = stmt.source_alias or stmt.source
            # through the session reader: ATTACHed parquet AND views are
            # legal USING sources (the reader expands views lazily)
            src_raw = self._reader()(stmt.source)
        else:
            s_alias = stmt.source_alias  # parser guarantees an alias
            src_raw = compile_statement(stmt.source, self.spark, self._reader())
        if t_alias == s_alias:
            raise EngineError("MERGE target and source need distinct names/aliases")
        tgt = self.catalog.read_df(manifest, stmt.target).alias(t_alias)
        src = src_raw.withColumn("__src_match", F.lit(True)).alias(s_alias)

        resolve, type_of = _merge_scope(
            {t_alias: tgt, s_alias: src_raw.alias(s_alias)}
        )
        s_resolve, s_type = _merge_scope({s_alias: src_raw.alias(s_alias)})
        on = compile_expr(stmt.on, resolve, type_of)

        upd = next((w for w in stmt.whens if w.action == "update"), None)
        dele = next((w for w in stmt.whens if w.action == "delete"), None)
        ins = next((w for w in stmt.whens if w.action == "insert"), None)

        if upd is not None:
            for cname, expr in upd.sets:
                if cname not in by_name:
                    raise EngineError(
                        f"unknown column {cname} in table {stmt.target}"
                    )
                if cname == pk:
                    raise EngineError(
                        "MERGE cannot assign the primary key — use "
                        "WHEN MATCHED THEN DELETE plus INSERT"
                    )
                st = static_type(expr, type_of)
                want = {
                    "BOOLEAN": "bool", "INTEGER": "int",
                    "FLOAT": "float", "STRING": "str",
                }[by_name[cname]["datatype"]]
                if not (st is None or st == want or (want == "float" and st == "int")):
                    raise EngineError(
                        f"invalid value of type {st} for "
                        f"{by_name[cname]['datatype'].lower()} column {cname} "
                        f"in table {stmt.target}"
                    )

        # cardinality violation: >1 source rows claiming one target row
        if upd is not None or dele is not None:
            dup = (
                tgt.join(src, on, "inner")
                .groupBy(F.col(f"{t_alias}.{pk}"))
                .agg(F.count(F.lit(1)).alias("__n"))
                .filter(F.col("__n") > 1)
            )
            if dup.limit(1).count() > 0:
                raise EngineError(
                    "MERGE: a target row matches more than one source row "
                    "(cardinality violation)"
                )

        joined = tgt.join(src, on, "left")
        matched = F.coalesce(F.col(f"{s_alias}.__src_match"), F.lit(False))

        def _cond(w):
            c = matched
            if w.condition is not None:
                c = c & F.coalesce(
                    compile_expr(w.condition, resolve, type_of), F.lit(False)
                )
            return c

        upd_c = _cond(upd) if upd is not None else F.lit(False)
        del_c = _cond(dele) if dele is not None else F.lit(False)
        # statement order decides which matched clause claims a row
        order = [w.action for w in stmt.whens if w.matched]
        if order == ["delete", "update"]:
            upd_c = upd_c & ~del_c
        else:
            del_c = del_c & ~upd_c

        updates = (
            {c: compile_expr(e, resolve, type_of) for c, e in upd.sets}
            if upd is not None
            else {}
        )
        projected = []
        for c in [col["name"] for col in meta["columns"]]:
            base = F.col(f"{t_alias}.{c}")
            if c in updates:
                ty = SPARK_TYPES[by_name[c]["datatype"]]
                projected.append(
                    F.when(upd_c, updates[c].cast(ty)).otherwise(base).alias(c)
                )
            else:
                projected.append(base.alias(c))
        survivors = joined.filter(~del_c).select(*projected, upd_c.alias("__upd"))

        insert_rows = None
        if ins is not None:
            not_matched = src_raw.alias(s_alias).join(tgt, on, "left_anti")
            if ins.condition is not None:
                not_matched = not_matched.filter(
                    F.coalesce(
                        compile_expr(ins.condition, s_resolve, s_type), F.lit(False)
                    )
                )
            names = list(ins.columns) if ins.columns is not None else [
                c["name"] for c in meta["columns"]
            ]
            unknown = [n for n in names if n not in by_name]
            if unknown:
                raise EngineError(
                    f"unknown column {unknown[0]} in table {stmt.target}"
                )
            if len(names) != len(ins.values):
                raise EngineError(
                    f"MERGE INSERT has {len(ins.values)} values for "
                    f"{len(names)} columns"
                )
            exprs = {}
            for n, e in zip(names, ins.values):
                st = static_type(e, s_type)
                want = {
                    "BOOLEAN": "bool", "INTEGER": "int",
                    "FLOAT": "float", "STRING": "str",
                }[by_name[n]["datatype"]]
                if not (st is None or st == want or (want == "float" and st == "int")):
                    raise EngineError(
                        f"invalid value of type {st} for "
                        f"{by_name[n]['datatype'].lower()} column {n} "
                        f"in table {stmt.target}"
                    )
                exprs[n] = compile_expr(e, s_resolve, s_type)
            out_cols = []
            for c in meta["columns"]:
                ty = SPARK_TYPES[c["datatype"]]
                if c["name"] in exprs:
                    out_cols.append(exprs[c["name"]].cast(ty).alias(c["name"]))
                elif c["has_default"]:
                    out_cols.append(F.lit(c["default"]).cast(ty).alias(c["name"]))
                else:
                    raise EngineError(
                        f"no value given for column {c['name']} in table "
                        f"{stmt.target}"
                    )
            insert_rows = not_matched.select(*out_cols)

        final_view = survivors.drop("__upd")
        if insert_rows is not None:
            final_view = final_view.unionByName(insert_rows)
        self._validate_view(manifest, stmt.target, final_view)

        changed = survivors.filter(F.col("__upd")).drop("__upd")
        n_upd = changed.count() if upd is not None else 0
        n_ins = insert_rows.count() if insert_rows is not None else 0
        del_keys = None
        n_del = 0
        if dele is not None:
            del_keys = joined.filter(del_c).select(F.col(f"{t_alias}.{pk}").alias(pk))
            n_del = del_keys.count()
        upserts = changed if upd is not None else None
        if insert_rows is not None:
            upserts = (
                upserts.unionByName(insert_rows)
                if upserts is not None
                else insert_rows
            )
        self.catalog.stage_delta(
            manifest, stmt.target, upserts=upserts, deletes=del_keys
        )
        return Result(
            status=f"MERGE {n_upd} updated, {n_ins} inserted, {n_del} deleted"
        )

    # ---------------------------------------------------------- DELETE

    def _delete(self, manifest: dict, stmt: ast.Delete) -> Result:
        meta = self._table_meta(manifest, stmt.table, writable=True)
        pk = self._pk_of(meta)
        df = self.catalog.read_df(manifest, stmt.table).alias(stmt.table)
        scope_resolve, scope_type = _single_table_scope(stmt.table, df)
        pred = (
            compile_expr(stmt.where, scope_resolve, scope_type)
            if stmt.where is not None
            else F.lit(True)
        )
        remaining = df.filter(~F.coalesce(pred, F.lit(False)))
        # delete-side FK: no surviving row may reference a removed key
        # (engine/kv.rs:157-176)
        referencing = []
        for other, ometa in manifest["tables"].items():
            for c in ometa["columns"]:
                if c["references"] == stmt.table:
                    odf = (
                        remaining
                        if other == stmt.table
                        else self.catalog.read_df(manifest, other)
                    )
                    referencing.append((other, c["name"], odf))
        con.check_delete_references(stmt.table, remaining, pk, referencing)
        # merge-on-read: write only the tombstoned keys; the matched count
        # comes from the written delta's parquet footers (no extra filter job)
        delta = self.catalog.stage_delta(
            manifest, stmt.table, deletes=df.filter(pred).select(pk)
        )
        n_matched = self.catalog.count_rows(delta["deletes"]) if delta else 0
        return Result(status=f"DELETE {n_matched}")

    # ---------------------------------------------------------- EXPLAIN

    def _explain(self, stmt: ast.Statement) -> str:
        """Our logical plan pretty-printer (plan shape mirrors plan/mod.rs:
        258-415) + Spark's physical plan for SELECTs."""
        lines = _format_plan(stmt)
        if isinstance(stmt, (ast.Select, ast.SetOp, ast.With)):
            import contextlib
            import io

            # "unroll1": EXPLAIN of WITH RECURSIVE must not run the
            # fixpoint (round-9 review: EXPLAIN was executing the query)
            # — the recursive CTE compiles as a lazy anchor ∪ first-step
            # plan instead, zero Spark jobs
            df = compile_statement(
                stmt, self.spark, self._reader(), recursive_cte_mode="unroll1"
            )
            if isinstance(stmt, ast.With) and stmt.recursive:
                lines += [
                    "",
                    "Note: recursive CTE(s) shown as anchor UNION first "
                    "step (EXPLAIN does not run the fixpoint; execution "
                    f"iterates to convergence, cap "
                    f"{RECURSIVE_CTE_MAX_ITERS} iterations)",
                ]
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            lines += ["", "Physical (Catalyst):", *buf.getvalue().splitlines()]
        return "\n".join(lines)

    def _explain_analyze(self, stmt: ast.Statement) -> str:
        """EXPLAIN ANALYZE (extension — the reference's EXPLAIN is static,
        plan/mod.rs:258-415): EXECUTE the query and render the FINAL
        adaptive physical plan annotated with Spark's per-operator
        RUNTIME metrics (numOutputRows, spillSize, shuffle bytes,
        pipelineTime, ...) — the ground truth a static EXPLAIN
        estimates. Queries only: DML under ANALYZE would conflate
        profiling with a write.

        Execution runs the compiled plan's own RDD and counts rows
        cluster-side (``executedPlan().execute().count()``) — results
        never transfer to the driver, so profiling a huge SELECT costs
        its compute, not its collect."""
        import time as _time

        if not isinstance(stmt, (ast.Select, ast.SetOp, ast.With)):
            raise EngineError(
                "EXPLAIN ANALYZE supports SELECT queries only (DML/DDL "
                "would execute the write while profiling it)"
            )
        df = compile_statement(stmt, self.spark, self._reader())
        jqe = df._jdf.queryExecution()
        t0 = _time.perf_counter()
        n_rows = jqe.executedPlan().execute().count()
        wall_ms = round((_time.perf_counter() - t0) * 1000.0, 1)
        lines = _format_plan(stmt)
        lines += [
            "",
            f"Executed: {n_rows} row(s) in {wall_ms} ms",
            "Physical (final adaptive plan, runtime metrics):",
        ]
        _walk_executed_plan(jqe.executedPlan(), 0, lines)
        return "\n".join(lines)


def _walk_executed_plan(node, depth: int, out: list) -> None:
    """Render an executed SparkPlan tree with its SQLMetric values —
    descending through AQE's stage wrappers (AdaptiveSparkPlan holds the
    final plan only post-execution; QueryStage nodes wrap their stage's
    plan) so every operator that actually ran appears exactly once."""
    name = node.nodeName()
    mets = node.metrics()
    it = mets.iterator()
    parts = []
    while it.hasNext():
        kv = it.next()
        parts.append(f"{kv._1()}={kv._2().value()}")
    out.append(
        "  " * depth + name + (f"  [{', '.join(sorted(parts))}]" if parts else "")
    )
    if name == "AdaptiveSparkPlan":
        _walk_executed_plan(node.executedPlan(), depth + 1, out)
        return
    if "QueryStage" in name:
        _walk_executed_plan(node.plan(), depth + 1, out)
        return
    ch = node.children()
    for i in range(ch.size()):
        _walk_executed_plan(ch.apply(i), depth + 1, out)


_MV_AGGS = {"count", "sum", "min", "max", "avg"}


def _matview_grouped_shape(stmt, deps: set) -> Optional[dict]:
    """Shape analysis for incremental materialized-view refresh: the query
    must be a single-SELECT GROUP BY aggregate over ONE managed table —
    `SELECT <group cols and aggregates> FROM base [WHERE ...] GROUP BY
    <plain columns>` with every group column present in the output.

    Why this shape: affected-group recompute needs (a) group-key values
    extractable from the change feed's rows (plain base columns), (b) a
    way to restrict the base scan to affected keys (single table), and
    (c) a key to merge recomputed rows into the snapshot (group cols in
    the output). Anything else — joins, HAVING, DISTINCT, window
    functions, expressions as group keys — refreshes by full recompute.

    Returns {"base", "key_cols", "out_cols"} or None."""
    if not isinstance(stmt, ast.Select):
        return None
    f = stmt.from_
    if not isinstance(f, ast.TableRef):
        return None
    if f.as_of is not None:
        return None  # a frozen AS OF base never changes incrementally
    if (
        stmt.distinct
        or stmt.having is not None
        or stmt.order_by
        or stmt.limit is not None
        or stmt.offset is not None
        or not stmt.group_by
        or stmt.group_mode != "plain"  # super-aggregate rows don't merge by key
    ):
        return None
    if any(not isinstance(g, ast.Field) for g in stmt.group_by):
        return None
    group_names = [g.name for g in stmt.group_by]
    key_cols: list[str] = []
    out_cols: list[str] = []
    for expr, alias in stmt.select:
        if isinstance(expr, ast.Field) and expr.name in group_names:
            key_cols.append(expr.name)
            out_cols.append(alias or expr.name)
        elif (
            isinstance(expr, ast.FuncCall)
            and expr.name.lower() in _MV_AGGS
            and not isinstance(expr, ast.WindowFunc)
        ):
            continue
        else:
            return None
    if sorted(key_cols) != sorted(set(group_names)) or len(key_cols) != len(
        set(key_cols)
    ):
        return None
    roots = [e for e, _ in stmt.select] + list(stmt.group_by)
    if stmt.where is not None:
        roots.append(stmt.where)
    for root in roots:
        for sub in ast.walk(root):
            if isinstance(sub, ast.Subquery) or (
                isinstance(sub, ast.Op) and sub.name in ("IN_SUBQ", "EXISTS")
            ):
                return None
    if deps != {f.name}:
        return None
    return {"base": f.name, "key_cols": key_cols, "out_cols": out_cols}


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


def _matview_spj_shape(stmt, deps: set) -> Optional[dict]:
    """Shape analysis for the SELECT-project-filter (no aggregate)
    incremental path (round 10): a single-SELECT over ONE managed table
    with arbitrary scalar expressions and an optional WHERE — no GROUP
    BY/aggregates/DISTINCT/windows/subqueries/ORDER/LIMIT.

    Why this shape refreshes by delta application alone: base rows map
    1:1 (or 1:0 through the WHERE) to output rows, so the CDF slice IS
    the refresh — anti-join out the changed PKs' old output rows, then
    append the post-images compiled through the stored query itself.
    The merge key is the base PK, so the OUTPUT must carry it as a plain
    column; the refresh path checks that against the CURRENT manifest
    (``fields`` maps base column → output alias for every plain-Field
    select item).

    Returns {"base", "fields"} or None."""
    if not isinstance(stmt, ast.Select):
        return None
    f = stmt.from_
    if not isinstance(f, ast.TableRef) or f.as_of is not None:
        return None
    if (
        stmt.distinct
        or stmt.group_by
        or stmt.having is not None
        or stmt.order_by
        or stmt.limit is not None
        or stmt.offset is not None
    ):
        return None
    roots = [e for e, _ in stmt.select]
    if stmt.where is not None:
        roots.append(stmt.where)
    for root in roots:
        for sub in ast.walk(root):
            if isinstance(sub, ast.WindowFunc):
                return None
            if isinstance(sub, ast.FuncCall) and sub.name.lower() in _MV_AGGS:
                return None
            if isinstance(sub, ast.Subquery) or (
                isinstance(sub, ast.Op) and sub.name in ("IN_SUBQ", "EXISTS")
            ):
                return None
    if deps != {f.name}:
        return None
    fields = {
        expr.name: (alias or expr.name)
        for expr, alias in stmt.select
        if isinstance(expr, ast.Field)
    }
    return {"base": f.name, "fields": fields}


def _is_constant_query(stmt: ast.Statement) -> bool:
    """True for FROM-less selects (and set-op chains of them) — results are
    O(1) constant rows, safe to materialize eagerly."""
    if isinstance(stmt, ast.Select):
        return stmt.from_ is None
    if isinstance(stmt, ast.SetOp):
        return _is_constant_query(stmt.left) and _is_constant_query(stmt.right)
    return False


def _merge_scope(tables: dict):
    """Resolve/type functions over one or more aliased DataFrames — the
    MERGE statement's expression scope (ON / WHEN conditions / SET values
    see both tables; INSERT values see the source only). Unqualified
    names resolve iff exactly one table owns them."""
    cols = {a: [c for c in df.columns if not c.startswith("__")] for a, df in tables.items()}
    dtypes = {a: dict(df.dtypes) for a, df in tables.items()}
    py_ty = {
        "bigint": "int", "int": "int", "double": "float",
        "float": "float", "string": "str", "boolean": "bool",
    }

    def _owner(f: ast.Field) -> str:
        if f.table is not None:
            if f.table not in cols:
                raise CompileError(f"unknown table {f.table}")
            if f.name not in cols[f.table]:
                raise CompileError(f"unknown column {f.name} in table {f.table}")
            return f.table
        owners = [a for a in cols if f.name in cols[a]]
        if not owners:
            raise CompileError(f"unknown column {f.name}")
        if len(owners) > 1:
            raise CompileError(
                f"ambiguous column {f.name} (qualify it: "
                f"{' or '.join(sorted(a + '.' + f.name for a in owners))})"
            )
        return owners[0]

    def resolve(f: ast.Field):
        return F.col(f"{_owner(f)}.{f.name}")

    def type_of(f: ast.Field):
        return py_ty.get(dtypes[_owner(f)].get(f.name))

    return resolve, type_of


def _single_table_scope(name: str, df: DataFrame):
    cols = set(df.columns)
    dtypes = dict(df.dtypes)

    def resolve(f: ast.Field):
        if f.table is not None and f.table != name:
            raise CompileError(f"unknown table {f.table}")
        if f.name not in cols:
            raise CompileError(f"unknown column {f.name} in table {name}")
        return F.col(f"{name}.{f.name}")

    def type_of(f: ast.Field):
        return {
            "bigint": "int", "int": "int", "double": "float",
            "float": "float", "string": "str", "boolean": "bool",
        }.get(dtypes.get(f.name))

    return resolve, type_of


def _eval_constant(e: ast.Expr) -> Any:
    """Evaluate a constant insert expression on the driver (insert rows are
    constants after constant folding in the reference, mutation.rs:20-23)."""
    if isinstance(e, ast.Literal):
        return e.value
    if isinstance(e, ast.Op):
        name = e.name
        if name in ("NEG", "POS"):
            v = _eval_constant(e.args[0])
            if v is None:
                return None
            if not isinstance(v, (int, float)) or isinstance(v, bool):
                raise EngineError("can't negate non-numeric value")
            return -v if name == "NEG" else v
        vals = [_eval_constant(a) for a in e.args]
        if any(v is None for v in vals):
            return None
        ops = {
            "ADD": lambda a, b: a + b,
            "SUB": lambda a, b: a - b,
            "MUL": lambda a, b: a * b,
        }
        if name in ops:
            return ops[name](*vals)
        if name == "DIV":
            if vals[1] == 0:
                raise EngineError("can't divide by zero")
            if isinstance(vals[0], int) and isinstance(vals[1], int):
                q = abs(vals[0]) // abs(vals[1])
                return q if (vals[0] >= 0) == (vals[1] >= 0) else -q
            return vals[0] / vals[1]
    raise EngineError("INSERT values must be constant expressions")


def _coerce_row(named: dict, cols: list[dict], table: str) -> tuple:
    out = []
    for c in cols:
        v = named[c["name"]]
        if v is None:
            out.append(None)
            continue
        dt = c["datatype"]
        if dt == "BOOLEAN":
            if not isinstance(v, bool):
                raise EngineError(f"invalid value {v!r} for boolean column {c['name']}")
        elif dt == "INTEGER":
            if isinstance(v, bool) or not isinstance(v, int):
                raise EngineError(f"invalid value {v!r} for integer column {c['name']}")
        elif dt == "FLOAT":
            if isinstance(v, bool) or not isinstance(v, (int, float)):
                raise EngineError(f"invalid value {v!r} for float column {c['name']}")
            v = float(v)
        elif dt == "STRING":
            if not isinstance(v, str):
                raise EngineError(f"invalid value {v!r} for string column {c['name']}")
        out.append(v)
    return tuple(out)


def _format_plan(stmt: ast.Statement, indent: int = 0) -> list[str]:
    pad = "  " * indent
    if isinstance(stmt, ast.With):
        kw = "With Recursive" if stmt.recursive else "With"
        lines = [f"{pad}{kw}"]
        for cte in stmt.ctes:
            cols = f"({', '.join(cte.columns)})" if cte.columns else ""
            lines.append(f"{pad}  CTE {cte.name}{cols}")
            lines += _format_plan(cte.query, indent + 2)
        lines += _format_plan(stmt.body, indent + 1)
        return lines
    if isinstance(stmt, ast.SetOp):
        label = stmt.kind.upper() + (" ALL" if stmt.all_rows else "")
        lines = [f"{pad}{label}"]
        lines += _format_plan(stmt.left, indent + 1)
        lines += _format_plan(stmt.right, indent + 1)
        return lines
    if isinstance(stmt, ast.Select):
        lines = [f"{pad}Select"]
        if stmt.limit is not None:
            lines.append(f"{pad}  Limit {stmt.limit}")
        if stmt.offset is not None:
            lines.append(f"{pad}  Offset {stmt.offset}")
        if stmt.order_by:
            dirs = [(o.expr, "desc" if o.desc else "asc") for o in stmt.order_by]
            lines.append(f"{pad}  Order {dirs}")
        lines.append(f"{pad}  Projection {[e for e, _ in stmt.select]}")
        if stmt.having is not None:
            lines.append(f"{pad}  Having {stmt.having}")
        if stmt.group_by:
            lines.append(f"{pad}  Aggregate group_by={list(stmt.group_by)}")
        if stmt.where is not None:
            lines.append(f"{pad}  Filter {stmt.where}")
        if stmt.from_ is not None:
            lines.extend(_format_from(stmt.from_, indent + 1))
        else:
            lines.append(f"{pad}  Nothing")
        return lines
    return [f"{pad}{type(stmt).__name__} {stmt}"]


def _format_from(item: ast.FromItem, indent: int) -> list[str]:
    pad = "  " * indent
    if isinstance(item, ast.TableRef):
        alias = f" as {item.alias}" if item.alias else ""
        return [f"{pad}Scan {item.name}{alias}"]
    if isinstance(item, ast.TableFunc):
        alias = f" as {item.alias}" if item.alias else ""
        args = ", ".join(repr(a.value) for a in item.args)
        return [f"{pad}TableFunction {item.name}({args}){alias}"]
    if isinstance(item, ast.DerivedTable):
        return [f"{pad}DerivedTable as {item.alias}"] + _format_plan(
            item.query, indent + 1
        )
    lines = [f"{pad}{item.join_type.value.title()}Join on={item.predicate}"]
    lines += _format_from(item.left, indent + 1)
    lines += _format_from(item.right, indent + 1)
    return lines
