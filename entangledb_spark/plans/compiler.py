"""SELECT → DataFrame compiler.

The reference plans SELECT by assembling FROM → WHERE → aggregate
extraction (with hidden columns for HAVING/ORDER references) → projection →
ORDER → OFFSET → LIMIT (planner.rs:120-253). We keep the same clause
semantics but lower directly onto DataFrame transformations and let
Catalyst do every optimizer pass the reference hand-rolls (SURVEY §4.1:
constant folding, filter pushdown, index-lookup conversion, noop cleaning,
hash-join selection are ALL built-in Catalyst rules).

Name resolution (the reference's Scope, planner.rs:642-819): each table
instance gets a user-visible alias; DataFrames are `.alias`ed so qualified
references compile to `F.col("alias.name")`; unqualified names are resolved
by ownership with ambiguity errors.

Aggregation (planner.rs:163-191 decomposition): aggregate calls and group
expressions are computed in a groupBy/agg with generated internal names,
then SELECT/HAVING/ORDER expressions are rewritten over those — the same
pre-projection → aggregate → post-projection shape as the reference, minus
the positional-index bookkeeping.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Callable, Optional

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from entangledb_spark.functions.expressions import CompileError, compile_expr
from entangledb_spark.plans import ast

@dataclass
class Scope:
    """alias → (DataFrame, [column names]); insertion-ordered.

    ``hidden`` holds internal relations joined onto the frame by the
    decorrelation pass (round 11): their columns resolve ONLY through an
    explicit qualifier (the compiler generates those references itself),
    never through `SELECT *` expansion or unqualified-name ownership —
    user-visible semantics are untouched."""

    tables: dict[str, tuple[DataFrame, list[str]]] = field(default_factory=dict)
    hidden: dict[str, tuple[DataFrame, list[str]]] = field(default_factory=dict)

    def add(self, alias: str, df: DataFrame) -> DataFrame:
        if alias in self.tables:
            raise CompileError(f"duplicate table name or alias: {alias}")
        aliased = df.alias(alias)
        self.tables[alias] = (aliased, list(df.columns))
        return aliased

    def add_hidden(self, alias: str, df: DataFrame) -> DataFrame:
        aliased = df.alias(alias)
        self.hidden[alias] = (aliased, list(df.columns))
        return aliased

    def resolve(self, f: ast.Field) -> Column:
        if f.table is not None:
            if f.table in self.hidden:
                return F.col(f"{f.table}.{f.name}")
            if f.table not in self.tables:
                raise CompileError(f"unknown table: {f.table}")
            if f.name not in self.tables[f.table][1]:
                raise CompileError(f"unknown column {f.name} in table {f.table}")
            return F.col(f"{f.table}.{f.name}")
        owners = [a for a, (_, cols) in self.tables.items() if f.name in cols]
        if not owners:
            raise CompileError(f"unknown column: {f.name}")
        if len(owners) > 1:
            raise CompileError(f"ambiguous column: {f.name} (in {', '.join(owners)})")
        return F.col(f"{owners[0]}.{f.name}")

    def dtype_of(self, f: ast.Field) -> Optional[str]:
        aliases = (
            [f.table]
            if f.table is not None
            else [a for a, (_, cols) in self.tables.items() if f.name in cols]
        )
        for a in aliases:
            if a in self.tables:
                df, cols = self.tables[a]
                if f.name in cols:
                    spark_t = dict(df.dtypes).get(f.name)
                    return {
                        "bigint": "int", "int": "int", "smallint": "int",
                        "tinyint": "int", "double": "float", "float": "float",
                        "string": "str", "boolean": "bool",
                    }.get(spark_t)
        return None

    def all_columns(self) -> list[tuple[str, str]]:
        out = []
        for a, (_, cols) in self.tables.items():
            out.extend((a, c) for c in cols)
        return out


TableReader = Callable[[str], DataFrame]


def compile_from(
    item: ast.FromItem, read: TableReader, scope: Scope, spark: SparkSession
) -> DataFrame:
    if isinstance(item, ast.TableRef):
        alias = item.alias or item.name
        if item.as_of is not None:
            versioned = getattr(read, "versioned", None)
            if versioned is None:
                raise CompileError(
                    "AS OF SYSTEM TIME is not supported in this context "
                    "(no versioned catalog behind the reader)"
                )
            return scope.add(alias, versioned(item.name, item.as_of))
        return scope.add(alias, read(item.name))
    if isinstance(item, ast.DerivedTable):
        # the subquery compiles against the SAME reader (so it sees CTEs,
        # views, snapshot pins) and lands in scope under its mandatory alias
        return scope.add(item.alias, compile_statement(item.query, spark, read))
    if isinstance(item, ast.TableFunc):
        from entangledb_spark.functions.table_functions import TABLE_FUNCS

        spec = TABLE_FUNCS.get(item.name)
        if spec is None:
            raise CompileError(f"unknown table function: {item.name}")
        n = len(item.args)
        if n < spec.min_arity or (
            spec.max_arity is not None and n > spec.max_arity
        ):
            arity = (
                str(spec.min_arity)
                if spec.max_arity == spec.min_arity
                else f"{spec.min_arity}..{spec.max_arity or '*'}"
            )
            raise CompileError(
                f"table function {item.name} takes {arity} arguments, got {n}"
            )
        args = [a.value for a in item.args]
        try:
            if spec.reads_tables:
                # the builder resolves session TABLE NAMES through the same
                # reader the FROM clause uses — snapshot semantics included
                df = spec.builder(spark, read, *args)
            else:
                df = spec.builder(spark, *args)
        except ValueError as e:  # builder-side argument validation
            raise CompileError(str(e)) from e
        return scope.add(item.alias or item.name, df)
    assert isinstance(item, ast.Join)
    left = compile_from(item.left, read, scope, spark)
    right = compile_from(item.right, read, scope, spark)
    if item.join_type == ast.JoinType.CROSS:
        return left.crossJoin(right)
    if item.predicate is not None and any(
        isinstance(sub, ast.Subquery)
        or (isinstance(sub, ast.Op) and sub.name in ("IN_SUBQ", "EXISTS"))
        for sub in ast.walk(item.predicate)
    ):
        raise CompileError("subqueries are not supported in join predicates")
    pred = (
        compile_expr(item.predicate, scope.resolve, scope.dtype_of)
        if item.predicate is not None
        else None
    )
    how = {
        ast.JoinType.INNER: "inner",
        ast.JoinType.LEFT: "left",
        ast.JoinType.RIGHT: "right",
        ast.JoinType.FULL: "full",
    }[item.join_type]
    return left.join(right, on=pred, how=how)


def _rewrite(e: ast.Expr, mapping: dict[ast.Expr, str]) -> ast.Expr:
    """Replace mapped subtrees with internal Field refs (post-agg rewrite)."""
    if e in mapping:
        return ast.Field(name=mapping[e])
    if isinstance(e, ast.Op):
        return ast.Op(e.name, tuple(_rewrite(a, mapping) for a in e.args))
    if isinstance(e, ast.FuncCall):
        if ast.is_aggregate(e):
            raise CompileError("unmapped aggregate (nested aggregates are not allowed)")
        return ast.FuncCall(e.name, tuple(_rewrite(a, mapping) for a in e.args), e.star)
    return e


def _agg_column(fc: ast.FuncCall, scope: Scope) -> Column:
    name = fc.name.lower()
    if ast.contains_aggregate(fc.args[0]):
        raise CompileError("aggregate functions can't be nested")  # planner.rs:391-396
    arg = compile_expr(fc.args[0], scope.resolve, scope.dtype_of)
    if fc.distinct:  # DISTINCT aggregates — extension (reference has none)
        if name == "count":
            return F.count_distinct(arg)
        if name == "sum":
            return F.sum_distinct(arg)
        if name == "avg":
            return F.sum_distinct(arg) / F.count_distinct(arg)
        if name in ("min", "max"):
            pass  # DISTINCT is a no-op for min/max
        else:
            raise CompileError(f"DISTINCT not supported for {name}")
    if name == "count":
        return F.count(arg)
    if name == "min":
        return F.min(arg)
    if name == "max":
        return F.max(arg)
    if name == "sum":
        return F.sum(arg)
    if name == "avg":
        # integer AVG = integer division in the reference (aggregation.rs:
        # 113-139); we follow the SQL standard / DuckDB oracle and return
        # double (SURVEY §2.4 divergence note).
        return F.avg(arg)
    raise CompileError(f"unknown function: {name}")


IN_SUBQUERY_LIMIT = 100_000  # max values folded into an IN list (non-conjunct positions)


def _split_semi_anti(
    where: Optional[ast.Expr],
) -> tuple[list[tuple[str, Optional[ast.Expr], ast.Subquery]], Optional[ast.Expr]]:
    """Split WHERE into ([(kind, lhs, subquery), ...], remaining-expr).

    Top-level `x IN (SELECT ...)` / `x NOT IN (SELECT ...)` /
    `[NOT] EXISTS (SELECT ...)` conjuncts are extracted as semi/anti join
    specs — the scale-safe plan (no driver round-trip, no value-count
    limit); conjunct-EXISTS and conjunct-IN support arbitrary theta
    correlation. Subqueries in any other position (inside OR, in the
    select list, ...) stay in the tree: correlated scalar and [NOT]
    EXISTS forms decorrelate into LEFT joins (_decorrelate, round 11),
    the rest go through the bounded uncorrelated fold."""
    if where is None:
        return [], None

    def conjuncts(e: ast.Expr):
        if isinstance(e, ast.Op) and e.name == "AND":
            for a in e.args:
                yield from conjuncts(a)
        else:
            yield e

    specs: list[tuple[str, ast.Expr, ast.Subquery]] = []
    rest: list[ast.Expr] = []
    for c in conjuncts(where):
        if isinstance(c, ast.Op) and c.name == "IN_SUBQ":
            sub = c.args[1]
            assert isinstance(sub, ast.Subquery)
            specs.append(("semi", c.args[0], sub))
        elif (
            isinstance(c, ast.Op)
            and c.name == "NOT"
            and isinstance(c.args[0], ast.Op)
            and c.args[0].name == "IN_SUBQ"
        ):
            sub = c.args[0].args[1]
            assert isinstance(sub, ast.Subquery)
            specs.append(("anti", c.args[0].args[0], sub))
        elif isinstance(c, ast.Op) and c.name == "EXISTS":
            sub = c.args[0]
            assert isinstance(sub, ast.Subquery)
            specs.append(("exists", None, sub))
        elif (
            isinstance(c, ast.Op)
            and c.name == "NOT"
            and isinstance(c.args[0], ast.Op)
            and c.args[0].name == "EXISTS"
        ):
            sub = c.args[0].args[0]
            assert isinstance(sub, ast.Subquery)
            specs.append(("not_exists", None, sub))
        else:
            rest.append(c)
    remaining: Optional[ast.Expr] = None
    for c in rest:
        remaining = c if remaining is None else ast.Op("AND", (remaining, c))
    return specs, remaining


def _apply_semi_anti(
    df: DataFrame,
    specs: list[tuple[str, Optional[ast.Expr], ast.Subquery]],
    scope: Scope,
    spark: SparkSession,
    read: TableReader,
) -> DataFrame:
    """Apply [NOT] IN-subquery conjuncts as left_semi / left_anti joins.

    IN → left_semi on equality: exact SQL semantics fall out (a NULL probe
    or no-match row is dropped, matching WHERE's treatment of NULL/FALSE).

    NOT IN → null-aware anti join, decomposed to stay hash-joinable: one
    tiny aggregate probe of the subquery (two scalars cross the driver —
    O(1), not O(values)) decides the degenerate cases (empty set → keep
    everything; any NULL value → nothing is ever TRUE), then the general
    case filters NULL probes and left_anti-joins on equality. A single
    disjunctive null-aware condition would force a nested-loop join."""
    for i, (kind, lhs, sub) in enumerate(specs):
        if kind in ("exists", "not_exists"):
            df = _apply_exists(df, kind, sub, scope, spark, read)
            continue
        info = _subquery_correlation(sub, scope, spark, read)
        if info is not None:
            # round 11: correlated [NOT] IN as a WHERE conjunct
            df = _apply_corr_in(df, kind, lhs, sub, info, scope, spark, read)
            continue
        lhs = _resolve_subqueries(lhs, spark, read)
        inner = compile_select(sub.select, spark, read)
        if len(inner.columns) != 1:
            raise CompileError("IN subquery must return exactly one column")
        incol = inner.columns[0]
        ialias = f"__in{i}"
        inner_a = inner.alias(ialias)
        lhs_col = compile_expr(lhs, scope.resolve, scope.dtype_of)
        cond = lhs_col == F.col(f"{ialias}.{incol}")
        if kind == "semi":
            df = df.join(inner_a, cond, "left_semi")
            continue
        probe = inner.agg(
            F.count(F.lit(1)).alias("n"), F.count(F.col(incol)).alias("n_nonnull")
        ).first()
        if probe["n"] == 0:
            continue  # NOT IN over the empty set is TRUE for every row
        if probe["n"] != probe["n_nonnull"]:
            df = df.filter(F.lit(False))  # a NULL value → NOT IN is never TRUE
            continue
        df = df.filter(lhs_col.isNotNull()).join(inner_a, cond, "left_anti")
    return df


def _apply_corr_in(
    df: DataFrame,
    kind: str,
    lhs: ast.Expr,
    sub: ast.Subquery,
    info: dict,
    outer: Scope,
    spark: SparkSession,
    read: TableReader,
) -> DataFrame:
    """Correlated `x IN (SELECT e FROM i WHERE ... outer refs ...)` as a
    WHERE conjunct (round 11): semantically EXISTS(i WHERE corr AND
    e = x), so it compiles to ONE left_semi join whose condition carries
    the value equality AND the correlated predicates (theta allowed —
    same strength as conjunct-EXISTS; no groupBy needed because IN is
    per-row). No driver round-trip, no value-count limit.

    Correlated NOT IN is rejected with guidance: its null-aware
    semantics need a per-outer-row NULL probe of the subquery result
    (any NULL value makes NOT IN never TRUE for that row), which has no
    single-join form — NOT EXISTS with an explicit equality expresses
    what users almost always mean."""
    if kind == "anti":
        raise CompileError(
            "correlated NOT IN is not supported (its null-aware semantics "
            "need a per-row NULL probe) — rewrite as NOT EXISTS with the "
            "equality in the subquery's WHERE"
        )
    sel = sub.select
    if sel.limit is not None or sel.offset is not None:
        raise CompileError("LIMIT/OFFSET in a correlated IN subquery is not supported")
    if sel.group_by or sel.having is not None or any(
        ast.contains_aggregate(e) for e, _ in sel.select
    ):
        raise CompileError(
            "aggregates in a correlated IN subquery are not supported — "
            "rewrite as a comparison with a correlated scalar subquery"
        )
    if len(sel.select) != 1 or isinstance(sel.select[0][0], ast.Star):
        raise CompileError("IN subquery must return exactly one column")
    inner_scope, inner_df = info["inner_scope"], info["inner_df"]
    inner_where: Optional[ast.Expr] = None
    for c in info["inner_conjs"]:
        inner_where = c if inner_where is None else ast.Op("AND", (inner_where, c))
    inner_where = _resolve_subqueries(inner_where, spark, read)
    if inner_where is not None:
        inner_df = inner_df.filter(
            compile_expr(inner_where, inner_scope.resolve, inner_scope.dtype_of)
        )

    def owner_scope(f: ast.Field) -> Optional[Scope]:
        if f.table is not None:
            if f.table in inner_scope.tables:
                return inner_scope if f.name in inner_scope.tables[f.table][1] else None
            if f.table in outer.tables:
                return outer if f.name in outer.tables[f.table][1] else None
            return None
        if any(f.name in cols for _, cols in inner_scope.tables.values()):
            return inner_scope
        if any(f.name in cols for _, cols in outer.tables.values()):
            return outer
        return None

    def dual_resolve(f: ast.Field) -> Column:
        s = owner_scope(f)
        if s is None:
            raise CompileError(f"unknown column: {f.name}")
        return s.resolve(f)

    def dual_dtype(f: ast.Field) -> Optional[str]:
        s = owner_scope(f)
        return s.dtype_of(f) if s is not None else None

    lhs = _resolve_subqueries(lhs, spark, read)
    lhs_col = compile_expr(lhs, outer.resolve, outer.dtype_of)
    inval = compile_expr(
        sel.select[0][0], inner_scope.resolve, inner_scope.dtype_of
    )
    cond = lhs_col == inval
    for c in info["corr_conjs"]:
        if any(isinstance(x, ast.Subquery) for x in ast.walk(c)):
            raise CompileError("nested subqueries in correlated IN predicates")
        cond = cond & compile_expr(c, dual_resolve, dual_dtype)
    return df.join(inner_df, cond, "left_semi")


def _apply_exists(
    df: DataFrame,
    kind: str,
    sub: ast.Subquery,
    outer: Scope,
    spark: SparkSession,
    read: TableReader,
) -> DataFrame:
    """[NOT] EXISTS as a WHERE conjunct — correlated or not (extension;
    the reference has no subqueries at all).

    Correlated form: conjuncts of the subquery's WHERE that reference
    outer columns become the join condition of a left_semi (EXISTS) /
    left_anti (NOT EXISTS) join against the subquery's filtered FROM
    frame — one distributed join, no per-row re-execution, no driver
    round-trip. NOT EXISTS needs no null-aware handling: an anti join
    keeps exactly the rows with no TRUE match, which IS its semantics.

    Uncorrelated form (no outer references): emptiness is probed with a
    LIMIT 1 job and the predicate folds to keep-all / drop-all.

    Name resolution follows standard SQL: innermost scope wins for
    unqualified names; qualified names pick whichever scope owns the
    alias; an alias used by BOTH scopes is rejected (rename one side)."""
    sel = sub.select
    if sel.offset is not None or sel.limit is not None:
        # LIMIT 0 / OFFSET n change emptiness per-group; anything else is a
        # no-op under EXISTS. Simpler and honest to reject the odd forms.
        raise CompileError("LIMIT/OFFSET inside [NOT] EXISTS is not supported")

    def probe(inner: DataFrame) -> DataFrame:
        nonempty = len(inner.limit(1).collect()) > 0
        keep = nonempty if kind == "exists" else not nonempty
        return df if keep else df.filter(F.lit(False))

    # aggregation in the subquery: a global aggregate always yields one
    # row, and grouped/HAVING forms can't be correlated here — compile the
    # whole subquery standalone and probe (correlated references inside it
    # surface as unknown-column errors, the accurate message).
    if sel.from_ is None or sel.group_by or sel.having is not None or any(
        ast.contains_aggregate(e) for e, _ in sel.select
    ):
        return probe(compile_select(sel, spark, read))

    inner_scope = Scope()
    inner_df = compile_from(sel.from_, read, inner_scope, spark)
    shared = set(inner_scope.tables) & set(outer.tables)
    if shared:
        raise CompileError(
            f"alias used in both outer query and EXISTS subquery: "
            f"{', '.join(sorted(shared))} (alias one of them)"
        )

    def owner_scope(f: ast.Field) -> Optional[Scope]:
        """innermost-first resolution; None = not resolvable here."""
        if f.table is not None:
            if f.table in inner_scope.tables:
                return inner_scope if f.name in inner_scope.tables[f.table][1] else None
            if f.table in outer.tables:
                return outer if f.name in outer.tables[f.table][1] else None
            return None
        if any(f.name in cols for _, cols in inner_scope.tables.values()):
            return inner_scope
        if any(f.name in cols for _, cols in outer.tables.values()):
            return outer
        return None

    def dual_resolve(f: ast.Field) -> Column:
        s = owner_scope(f)
        if s is None:
            raise CompileError(f"unknown column: {f.name}")
        return s.resolve(f)

    def dual_dtype(f: ast.Field) -> Optional[str]:
        s = owner_scope(f)
        return s.dtype_of(f) if s is not None else None

    def conjuncts(e: ast.Expr):
        if isinstance(e, ast.Op) and e.name == "AND":
            for a in e.args:
                yield from conjuncts(a)
        else:
            yield e

    inner_conjs: list[ast.Expr] = []
    corr_conjs: list[ast.Expr] = []
    if sel.where is not None:
        for c in conjuncts(sel.where):
            fields = [x for x in ast.walk(c) if isinstance(x, ast.Field)]
            if any(owner_scope(f) is outer for f in fields):
                corr_conjs.append(c)
            else:
                inner_conjs.append(c)

    if not corr_conjs:  # uncorrelated → emptiness probe, one tiny job
        return probe(compile_select(sel, spark, read))

    inner_where: Optional[ast.Expr] = None
    for c in inner_conjs:
        inner_where = c if inner_where is None else ast.Op("AND", (inner_where, c))
    inner_where = _resolve_subqueries(inner_where, spark, read)
    if inner_where is not None:
        inner_df = inner_df.filter(
            compile_expr(inner_where, inner_scope.resolve, inner_scope.dtype_of)
        )

    cond: Optional[Column] = None
    for c in corr_conjs:
        if any(isinstance(x, ast.Subquery) for x in ast.walk(c)):
            raise CompileError("nested subqueries in correlated EXISTS predicates")
        col = compile_expr(c, dual_resolve, dual_dtype)
        cond = col if cond is None else (cond & col)
    how = "left_semi" if kind == "exists" else "left_anti"
    return df.join(inner_df, cond, how)


def _resolve_subqueries(
    e: Optional[ast.Expr], spark: SparkSession, read: TableReader
) -> Optional[ast.Expr]:
    """Evaluate uncorrelated subqueries bottom-up, folding results into the
    outer expression tree:

    - scalar `(SELECT ...)` → its single value (errors on >1 row/column;
      0 rows → NULL) — the inner query runs as its own distributed job and
      only the scalar crosses to the driver, which then lets Catalyst push
      the comparison down into the outer scan;
    - `x IN (SELECT c ...)` → IN over the distinct result values (bounded
      by IN_SUBQUERY_LIMIT — beyond that, rewrite as a JOIN);
    - `EXISTS (SELECT ...)` → TRUE/FALSE via LIMIT 1.

    Only UNCORRELATED subqueries reach this fold: correlated scalar and
    EXISTS forms were decorrelated into LEFT joins earlier
    (_decorrelate), correlated conjunct-IN/EXISTS became semi/anti joins
    (_apply_semi_anti / _apply_exists / _apply_corr_in). A correlated
    reference that slips past those (e.g. two-level correlation) still
    surfaces here as an unknown-column error — the accurate message.
    """
    if e is None:
        return None
    if isinstance(e, ast.Subquery):
        df = compile_select(e.select, spark, read)
        if len(df.columns) != 1:
            raise CompileError("scalar subquery must return exactly one column")
        rows = df.limit(2).collect()
        if len(rows) > 1:
            raise CompileError("scalar subquery returned more than one row")
        return ast.Literal(rows[0][0] if rows else None)
    if isinstance(e, ast.Op):
        if e.name == "IN_SUBQ":
            lhs = _resolve_subqueries(e.args[0], spark, read)
            sub = e.args[1]
            assert isinstance(sub, ast.Subquery)
            df = compile_select(sub.select, spark, read)
            if len(df.columns) != 1:
                raise CompileError("IN subquery must return exactly one column")
            vals = df.distinct().limit(IN_SUBQUERY_LIMIT + 1).collect()
            if len(vals) > IN_SUBQUERY_LIMIT:
                raise CompileError(
                    f"IN subquery exceeds {IN_SUBQUERY_LIMIT} distinct values; "
                    "rewrite as a JOIN"
                )
            if not vals:
                return ast.Literal(False)
            return ast.Op("IN", (lhs, *[ast.Literal(r[0]) for r in vals]))
        if e.name == "EXISTS":
            sub = e.args[0]
            assert isinstance(sub, ast.Subquery)
            df = compile_select(sub.select, spark, read)
            return ast.Literal(len(df.limit(1).collect()) > 0)
        return ast.Op(e.name, tuple(_resolve_subqueries(a, spark, read) for a in e.args))
    if isinstance(e, ast.FuncCall):
        # dataclasses.replace keeps star/distinct (positional rebuild
        # silently dropped the distinct flag — round-11 fix)
        return dataclasses.replace(
            e, args=tuple(_resolve_subqueries(a, spark, read) for a in e.args)
        )
    return e


def _shallow_walk(e: ast.Expr):
    """ast.walk that does NOT descend into nested Subquery nodes — each
    subquery's fields belong to its own (deeper) resolution scope."""
    yield e
    if isinstance(e, ast.Subquery):
        return
    if isinstance(e, ast.Op):
        for a in e.args:
            if isinstance(a, ast.Expr):
                yield from _shallow_walk(a)
    elif isinstance(e, ast.FuncCall):
        for a in e.args:
            if isinstance(a, ast.Expr):
                yield from _shallow_walk(a)


def _subquery_correlation(sub: ast.Subquery, outer: Scope, spark, read):
    """Classify ``sub`` against the outer scope (round 11 decorrelation).

    Returns None when the subquery has no FROM or references nothing from
    the outer scope (→ the bounded uncorrelated fold applies), else
    {"inner_scope", "inner_df", "inner_conjs", "corr_conjs"} with the
    subquery's WHERE split into inner-only and correlated conjuncts.
    Correlated references anywhere OUTSIDE the WHERE (select list, GROUP
    BY, HAVING, ORDER BY) are rejected — same placement rule as
    correlated EXISTS. Aliases shared between the scopes are rejected
    (rename one side), as in _apply_exists."""
    sel = sub.select
    if sel.from_ is None:
        return None

    def outer_owns(f: ast.Field) -> bool:
        if f.table is not None:
            return f.table in outer.tables and f.name in outer.tables[f.table][1]
        return any(f.name in cols for _, cols in outer.tables.values())

    # cheap pre-pass: no field can possibly be an outer reference → skip
    # building the inner scope at all (the common uncorrelated case)
    roots = [e for e, _ in sel.select] + list(sel.group_by) + [
        x for x in (sel.where, sel.having) if x is not None
    ] + [o.expr for o in sel.order_by]
    if not any(
        isinstance(x, ast.Field) and outer_owns(x)
        for root in roots
        for x in _shallow_walk(root)
    ):
        return None

    inner_scope = Scope()
    inner_df = compile_from(sel.from_, read, inner_scope, spark)

    def inner_owns(f: ast.Field) -> bool:
        if f.table is not None:
            return (
                f.table in inner_scope.tables
                and f.name in inner_scope.tables[f.table][1]
            )
        return any(
            f.name in cols for _, cols in inner_scope.tables.values()
        )

    def is_corr_field(f: ast.Field) -> bool:
        # innermost scope wins for unqualified names (standard SQL)
        return not inner_owns(f) and outer_owns(f)

    non_where = [e for e, _ in sel.select] + list(sel.group_by) + [
        x for x in (sel.having,) if x is not None
    ] + [o.expr for o in sel.order_by]
    for root in non_where:
        for x in _shallow_walk(root):
            if isinstance(x, ast.Field) and is_corr_field(x):
                raise CompileError(
                    f"correlated reference {x.name} is only supported in "
                    "the subquery's WHERE clause"
                )

    inner_conjs: list[ast.Expr] = []
    corr_conjs: list[ast.Expr] = []
    if sel.where is not None:
        def conjuncts(e: ast.Expr):
            if isinstance(e, ast.Op) and e.name == "AND":
                for a in e.args:
                    yield from conjuncts(a)
            else:
                yield e

        for c in conjuncts(sel.where):
            fields = [
                x for x in _shallow_walk(c) if isinstance(x, ast.Field)
            ]
            if any(is_corr_field(f) for f in fields):
                corr_conjs.append(c)
            else:
                inner_conjs.append(c)
    if not corr_conjs:
        # genuinely uncorrelated — inner-first resolution means a table
        # (or alias) shared with the outer query shadows it entirely, the
        # ordinary self-referencing-subquery case
        return None
    shared = set(inner_scope.tables) & set(outer.tables)
    if shared:
        # correlated through OTHER fields while an alias is shared: the
        # decorrelation join would carry two frames under one alias
        raise CompileError(
            f"alias used in both outer query and subquery: "
            f"{', '.join(sorted(shared))} (alias one of them)"
        )
    return {
        "inner_scope": inner_scope,
        "inner_df": inner_df,
        "inner_conjs": inner_conjs,
        "corr_conjs": corr_conjs,
    }


def _split_corr_equalities(info, outer: Scope):
    """Split the correlated conjuncts of a groupBy-decorrelatable subquery
    into ([(inner_key_expr, outer_side_expr)], [outer-only conjunct]).

    A correlated conjunct must be either (a) an EQUALITY with one side
    built entirely from inner columns (the group key) and the other free
    of them, or (b) free of inner columns altogether (an outer-side
    filter that rides the join condition). Anything else — a non-equality
    predicate mixing inner and outer columns — would make the aggregate
    depend on WHICH rows match each outer row, which groupBy
    decorrelation cannot express; rejected with that explanation."""
    inner_scope = info["inner_scope"]

    def inner_owns(f: ast.Field) -> bool:
        if f.table is not None:
            return (
                f.table in inner_scope.tables
                and f.name in inner_scope.tables[f.table][1]
            )
        return any(f.name in cols for _, cols in inner_scope.tables.values())

    def has_inner(e: ast.Expr) -> bool:
        return any(
            isinstance(x, ast.Field) and inner_owns(x) for x in _shallow_walk(e)
        )

    keys: list[tuple[ast.Expr, ast.Expr]] = []
    outer_only: list[ast.Expr] = []
    for c in info["corr_conjs"]:
        if not has_inner(c):
            outer_only.append(c)
            continue
        if isinstance(c, ast.Op) and c.name == "EQ":
            a, b = c.args
            if has_inner(a) and not has_inner(b):
                keys.append((a, b))
                continue
            if has_inner(b) and not has_inner(a):
                keys.append((b, a))
                continue
        raise CompileError(
            "correlated predicates in a scalar subquery must be equalities "
            "between an inner expression and an outer expression (the "
            "aggregate would otherwise depend on which rows match each "
            "outer row, which groupBy decorrelation cannot express)"
        )
    return keys, outer_only


def _decorrelate(stmt: ast.Select, df: DataFrame, scope: Scope, spark, read):
    """Round 11: compile correlated scalar subqueries and non-conjunct
    correlated EXISTS as DECORRELATED LEFT JOINS instead of erroring
    through the bounded uncorrelated fold — the classic groupBy+join
    rewrite, executed as ONE distributed join per subquery (no per-row
    re-execution, no driver round-trip, cost scales with |outer| +
    |distinct correlation keys|, the 100 TB shape).

    - Scalar `(SELECT <agg expr> FROM i WHERE i.k = o.k AND ...)` in the
      select list, WHERE, HAVING or ORDER BY: the subquery recompiles as
      `SELECT k AS __ck, <agg expr> AS __scalar ... GROUP BY k` through
      compile_select itself (arbitrary aggregate expressions, e.g. TPC-H
      Q17's `0.2 * avg(l_quantity)`, ride along), LEFT-joins on the
      equality keys, and the node is replaced by a reference to the
      joined column — NULL for no-match outer rows, exactly the empty
      subquery's value. A bare count(...) top-level expression coalesces
      to 0 (SQL: COUNT over the empty set is 0, not NULL); count nested
      INSIDE a larger expression is rejected (its empty-group identity
      can't be recovered after the join).
    - `[NOT] EXISTS (...)` in any boolean position (inside OR, in a
      select list) with equality correlation: LEFT join against the
      DISTINCT correlation keys of the filtered inner frame plus a TRUE
      flag; EXISTS ⇔ the flag is non-NULL. (Top-level WHERE conjuncts
      keep the stronger semi/anti-join path, which supports arbitrary
      theta correlation.)
    - Correlated IN outside a WHERE conjunct is rejected with guidance
      (rewrite as EXISTS); correlated NOT IN likewise (its null-aware
      semantics need a per-group NULL probe).
    - In an AGGREGATING outer query, a correlated subquery in a
      POST-aggregation position (select list, HAVING, ORDER BY) rides
      when every correlation key is itself a GROUP BY column: the
      joined marker column is then functionally dependent on the group,
      so it is appended to the GROUP BY as a rider — group granularity
      is unchanged and the marker survives the aggregation. Keys outside
      the GROUP BY (or outer-only correlated predicates, which make the
      marker row-dependent) keep the clean rejection with guidance.

    Returns (rewritten stmt, joined df). Subqueries classified
    uncorrelated are left in place for _resolve_subqueries."""
    state = {"df": df, "n": 0}
    group_riders: list[ast.Expr] = []

    def _resolved_group_strs():
        """Resolved-column identities of the GROUP BY exprs (with the
        SELECT-alias substitution compile_select will apply)."""
        alias_of = {a: e for e, a in stmt.select if a is not None}
        out = set()
        for g in stmt.group_by:
            if isinstance(g, ast.Field) and g.table is None and g.name in alias_of:
                g = alias_of[g.name]
            try:
                out.add(str(compile_expr(g, scope.resolve, scope.dtype_of)))
            except CompileError:
                pass
        return out

    def _keys_are_grouped(keys, outer_only) -> bool:
        """True iff the marker will be functionally dependent on the
        group: every correlation key's outer side resolves to a GROUP BY
        column, and no outer-only predicate makes the join row-dependent
        beyond the keys."""
        if outer_only or not keys:
            return False
        gstrs = _resolved_group_strs()
        for _, outer_e in keys:
            try:
                s = str(compile_expr(outer_e, scope.resolve, scope.dtype_of))
            except CompileError:
                return False
            if s not in gstrs:
                return False
        return True

    def _post_agg_reject():
        raise CompileError(
            "in an aggregating query, a correlated subquery may "
            "appear in the WHERE clause, inside an aggregate "
            "function, or — when every correlation key is a GROUP BY "
            "column — in the select list / HAVING / ORDER BY; for "
            "other positions compute it in a derived table first"
        )

    def scalar_marker(sub: ast.Subquery, post_pos: bool = False) -> ast.Expr:
        info = _subquery_correlation(sub, scope, spark, read)
        if info is None:
            return sub  # uncorrelated → bounded fold
        sel = sub.select
        if len(sel.select) != 1:
            raise CompileError("scalar subquery must return exactly one column")
        for bad, what in (
            (sel.group_by, "GROUP BY"),
            (sel.having, "HAVING"),
            (sel.order_by, "ORDER BY"),
            (sel.limit, "LIMIT"),
            (sel.offset, "OFFSET"),
        ):
            if bad:
                raise CompileError(
                    f"{what} in a correlated scalar subquery is not supported"
                )
        expr, _alias = sel.select[0]
        if not ast.contains_aggregate(expr):
            raise CompileError(
                "a correlated scalar subquery must compute a global "
                "aggregate (a single-row guarantee for arbitrary rows "
                "cannot be enforced distributively)"
            )
        count_top = (
            isinstance(expr, ast.FuncCall)
            and ast.is_aggregate(expr)
            and expr.name.lower() == "count"
        )
        if not count_top and any(
            isinstance(x, ast.FuncCall)
            and ast.is_aggregate(x)
            and x.name.lower() == "count"
            for x in _shallow_walk(expr)
        ):
            raise CompileError(
                "count(...) nested inside a larger expression is not "
                "supported in a correlated scalar subquery (its empty-"
                "group value of 0 cannot be recovered after the join) — "
                "compute the count in its own subquery"
            )
        keys, outer_only = _split_corr_equalities(info, scope)
        if post_pos and not _keys_are_grouped(keys, outer_only):
            _post_agg_reject()
        inner_where: Optional[ast.Expr] = None
        for c in info["inner_conjs"]:
            inner_where = (
                c if inner_where is None else ast.Op("AND", (inner_where, c))
            )
        new_sel = dataclasses.replace(
            sel,
            select=tuple(
                (k, f"__ck{i}") for i, (k, _) in enumerate(keys)
            )
            + ((expr, "__scalar"),),
            where=inner_where,
            group_by=tuple(k for k, _ in keys),
            having=None,
            order_by=(),
            limit=None,
            offset=None,
            distinct=False,
        )
        gdf = compile_select(new_sel, spark, read)
        marker = f"__sq{state['n']}"
        state["n"] += 1
        aliased = scope.add_hidden(marker, gdf)
        cond = None
        for i, (_, outer_e) in enumerate(keys):
            term = F.col(f"{marker}.__ck{i}") == compile_expr(
                outer_e, scope.resolve, scope.dtype_of
            )
            cond = term if cond is None else (cond & term)
        for c in outer_only:
            term = compile_expr(c, scope.resolve, scope.dtype_of)
            cond = term if cond is None else (cond & term)
        if cond is None:  # unreachable: corr_conjs was non-empty
            cond = F.lit(True)
        state["df"] = state["df"].join(aliased, cond, "left")
        ref = ast.Field(name="__scalar", table=marker)
        out = (
            ast.FuncCall("coalesce", (ref, ast.Literal(0))) if count_top else ref
        )
        if post_pos:
            # post-aggregation position: the marker must survive the
            # groupBy — ride it as a functionally-dependent group key
            group_riders.append(out)
        return out

    def exists_marker(sub: ast.Subquery, post_pos: bool = False) -> ast.Expr:
        info = _subquery_correlation(sub, scope, spark, read)
        if info is None:
            return ast.Op("EXISTS", (sub,))  # uncorrelated → bounded fold
        sel = sub.select
        if sel.limit is not None or sel.offset is not None:
            raise CompileError(
                "LIMIT/OFFSET inside [NOT] EXISTS is not supported"
            )
        if sel.group_by or sel.having is not None or any(
            ast.contains_aggregate(e) for e, _ in sel.select
        ):
            raise CompileError(
                "aggregates in a correlated EXISTS outside a WHERE "
                "conjunct are not supported"
            )
        keys, outer_only = _split_corr_equalities(info, scope)
        if post_pos and not _keys_are_grouped(keys, outer_only):
            _post_agg_reject()
        inner_scope, inner_df = info["inner_scope"], info["inner_df"]
        inner_where = None
        for c in info["inner_conjs"]:
            inner_where = (
                c if inner_where is None else ast.Op("AND", (inner_where, c))
            )
        inner_where = _resolve_subqueries(inner_where, spark, read)
        if inner_where is not None:
            inner_df = inner_df.filter(
                compile_expr(
                    inner_where, inner_scope.resolve, inner_scope.dtype_of
                )
            )
        if keys:
            flag = inner_df.select(
                *[
                    compile_expr(k, inner_scope.resolve, inner_scope.dtype_of)
                    .alias(f"__ck{i}")
                    for i, (k, _) in enumerate(keys)
                ]
            ).distinct().withColumn("__flag", F.lit(True))
        else:
            # only outer-side filters correlate: emptiness of the inner
            # frame is the single fact needed — one-row flag relation
            flag = inner_df.select(F.lit(True).alias("__flag")).limit(1)
        marker = f"__sq{state['n']}"
        state["n"] += 1
        aliased = scope.add_hidden(marker, flag)
        cond = None
        for i, (_, outer_e) in enumerate(keys):
            term = F.col(f"{marker}.__ck{i}") == compile_expr(
                outer_e, scope.resolve, scope.dtype_of
            )
            cond = term if cond is None else (cond & term)
        for c in outer_only:
            term = compile_expr(c, scope.resolve, scope.dtype_of)
            cond = term if cond is None else (cond & term)
        if cond is None:
            cond = F.lit(True)
        state["df"] = state["df"].join(aliased, cond, "left")
        if post_pos:
            group_riders.append(ast.Field(name="__flag", table=marker))
        # EXISTS ⇔ a flag row matched; NOT folds naturally around it
        return ast.Op(
            "NOT",
            (ast.Op("IS_NULL", (ast.Field(name="__flag", table=marker),)),),
        )

    # In an AGGREGATING outer query the marker column exists only on the
    # pre-aggregation frame, so a correlated subquery can ride the WHERE
    # clause (pre-agg) or sit INSIDE an aggregate call (its argument
    # compiles pre-agg) — anywhere else the marker would not survive the
    # groupBy, and letting it through leaked an internal 'unknown table
    # __sqN' error. Reject those positions with guidance instead.
    outer_is_agg = bool(stmt.group_by) or stmt.having is not None or any(
        ast.contains_aggregate(e) for e, _ in stmt.select
    )

    def rewrite(
        e: Optional[ast.Expr], pre_agg: bool = True, in_agg: bool = False
    ) -> Optional[ast.Expr]:
        post_pos = outer_is_agg and not pre_agg and not in_agg
        if e is None:
            return None
        if isinstance(e, ast.Subquery):
            return scalar_marker(e, post_pos)
        if isinstance(e, ast.Op):
            if e.name == "EXISTS":
                sub = e.args[0]
                assert isinstance(sub, ast.Subquery)
                return exists_marker(sub, post_pos)
            if e.name == "IN_SUBQ":
                sub = e.args[1]
                assert isinstance(sub, ast.Subquery)
                if _subquery_correlation(sub, scope, spark, read) is not None:
                    raise CompileError(
                        "a correlated IN subquery is supported only as a "
                        "top-level WHERE conjunct — elsewhere rewrite it "
                        "as EXISTS"
                    )
                return ast.Op(
                    "IN_SUBQ", (rewrite(e.args[0], pre_agg, in_agg), sub)
                )
            return ast.Op(
                e.name, tuple(rewrite(a, pre_agg, in_agg) for a in e.args)
            )
        if isinstance(e, ast.FuncCall):
            inside = in_agg or ast.is_aggregate(e)
            # dataclasses.replace keeps star/distinct (and subclass type)
            return dataclasses.replace(
                e, args=tuple(rewrite(a, pre_agg, inside) for a in e.args)
            )
        return e

    has_subq = any(
        isinstance(x, ast.Subquery)
        for root in (
            [e for e, _ in stmt.select]
            + [x for x in (stmt.where, stmt.having) if x is not None]
            + list(stmt.group_by)
            + [o.expr for o in stmt.order_by]
        )
        for x in ast.walk(root)
    )
    if not has_subq:
        return stmt, df
    post = not outer_is_agg  # non-aggregate queries: every position rides
    stmt = dataclasses.replace(
        stmt,
        select=tuple((rewrite(e, pre_agg=post), a) for e, a in stmt.select),
        where=rewrite(stmt.where, pre_agg=True),
        group_by=tuple(rewrite(g, pre_agg=post) for g in stmt.group_by),
        having=rewrite(stmt.having, pre_agg=False),
        order_by=tuple(
            ast.OrderItem(rewrite(o.expr, pre_agg=post), o.desc)
            for o in stmt.order_by
        ),
    )
    if group_riders:
        fresh = tuple(r for r in group_riders if r not in stmt.group_by)
        stmt = dataclasses.replace(stmt, group_by=stmt.group_by + fresh)
    return stmt, state["df"]


def compile_select(
    stmt: ast.Select, spark: SparkSession, read: TableReader
) -> DataFrame:
    # WHERE-conjunct [NOT] IN subqueries become semi/anti joins (scale
    # path). FROM-less selects keep the literal fold — there is no frame
    # to join against.
    semi_specs: list[tuple[str, ast.Expr, ast.Subquery]] = []
    if stmt.from_ is not None:
        semi_specs, remaining_where = _split_semi_anti(stmt.where)
        if semi_specs:
            stmt = dataclasses.replace(stmt, where=remaining_where)

    scope = Scope()
    if stmt.from_ is not None:
        df = compile_from(stmt.from_, read, scope, spark)
        # round 11: correlated scalar / non-conjunct EXISTS subqueries
        # decorrelate into LEFT joins here — BEFORE the uncorrelated fold,
        # which cannot compile them (their fields resolve only against
        # this scope)
        stmt, df = _decorrelate(stmt, df, scope, spark, read)
    else:
        df = spark.range(1).drop("id")  # Nothing node: one empty row

    # fold remaining uncorrelated subqueries (no-op when none are present)
    def rs(x):
        return _resolve_subqueries(x, spark, read)

    if any(
        isinstance(sub, (ast.Subquery,)) or (isinstance(sub, ast.Op) and sub.name in ("IN_SUBQ", "EXISTS"))
        for root in (
            [e for e, _ in stmt.select]
            + [x for x in (stmt.where, stmt.having) if x is not None]
            + list(stmt.group_by)
            + [o.expr for o in stmt.order_by]
        )
        for sub in ast.walk(root)
    ):
        stmt = dataclasses.replace(
            stmt,
            select=tuple((rs(e), a) for e, a in stmt.select),
            where=rs(stmt.where),
            group_by=tuple(rs(g) for g in stmt.group_by),
            having=rs(stmt.having),
            order_by=tuple(ast.OrderItem(rs(o.expr), o.desc) for o in stmt.order_by),
        )

    if semi_specs:
        df = _apply_semi_anti(df, semi_specs, scope, spark, read)

    if stmt.where is not None:
        if ast.contains_aggregate(stmt.where):
            raise CompileError("aggregate functions are not allowed in WHERE")
        df = df.filter(compile_expr(stmt.where, scope.resolve, scope.dtype_of))

    # --- SELECT * expansion -----------------------------------------------
    select_items: list[tuple[ast.Expr, Optional[str]]] = []
    for expr, alias in stmt.select:
        if isinstance(expr, ast.Star):
            if not scope.tables:
                raise CompileError("SELECT * requires a FROM clause")
            for t_alias, col in scope.all_columns():
                select_items.append((ast.Field(name=col, table=t_alias), col))
        else:
            select_items.append((expr, alias))

    has_agg = (
        bool(stmt.group_by)
        or any(ast.contains_aggregate(e) for e, _ in select_items)
        or (stmt.having is not None)
    )

    if not has_agg:
        out_cols, hidden = [], 0
        names: list[str] = []
        for i, (expr, alias) in enumerate(select_items):
            name = alias or (expr.name if isinstance(expr, ast.Field) else f"col_{i}")
            names.append(name)
            out_cols.append(compile_expr(expr, scope.resolve, scope.dtype_of).alias(name))
        order_cols = []
        for item in stmt.order_by:
            e = item.expr
            # ORDER BY may reference select aliases or hidden source columns
            if isinstance(e, ast.Field) and e.table is None and e.name in names:
                c = F.col(e.name)
            else:
                if stmt.distinct:
                    raise CompileError(
                        "with SELECT DISTINCT, ORDER BY must reference the select list"
                    )
                c = compile_expr(e, scope.resolve, scope.dtype_of)
                out_cols.append(c.alias(f"__h{hidden}"))
                c = F.col(f"__h{hidden}")
                hidden += 1
            order_cols.append(c.desc_nulls_last() if item.desc else c.asc_nulls_first())
        df = df.select(*out_cols)
        if stmt.distinct:
            df = df.distinct()
        if order_cols:
            df = df.orderBy(*order_cols)
        if hidden:
            df = df.drop(*[f"__h{i}" for i in range(hidden)])
        return _offset_limit(df, stmt, scope)

    # --- aggregation path ---------------------------------------------------
    # hidden-column machinery of planner.rs:150-161,445-500, Spark-style.
    alias_of: dict[str, ast.Expr] = {
        a: e for e, a in select_items if a is not None
    }
    group_exprs: list[ast.Expr] = []
    for g in stmt.group_by:
        if ast.contains_aggregate(g):
            raise CompileError("group expression cannot contain aggregates")
        # GROUP BY may name a SELECT alias (planner.rs:399-443 form 1)
        if isinstance(g, ast.Field) and g.table is None and g.name in alias_of:
            group_exprs.append(alias_of[g.name])
        else:
            group_exprs.append(g)

    mapping: dict[ast.Expr, str] = {}
    group_cols: list[Column] = []
    for i, g in enumerate(group_exprs):
        mapping[g] = f"__g{i}"
        group_cols.append(compile_expr(g, scope.resolve, scope.dtype_of).alias(f"__g{i}"))

    # collect aggregate calls from select + having + order
    agg_calls: list[ast.FuncCall] = []

    def collect(e: Optional[ast.Expr]):
        if e is None:
            return
        for sub in ast.walk(e):
            if ast.is_aggregate(sub) and sub not in agg_calls:
                agg_calls.append(sub)

    for e, _ in select_items:
        collect(e)
    collect(stmt.having)
    for item in stmt.order_by:
        collect(item.expr)

    agg_cols = []
    for j, fc in enumerate(agg_calls):
        if fc in mapping:
            continue
        if fc.name.lower() == "grouping":
            # SQL-standard grouping(col): 1 on super-aggregate rows where
            # `col` was rolled away, 0 on regular rows — THE disambiguator
            # between a rolled-up NULL and a real NULL group key.
            if stmt.group_mode == "plain":
                raise CompileError(
                    "grouping() requires GROUP BY ROLLUP / CUBE / GROUPING SETS"
                )
            if len(fc.args) != 1 or fc.star:
                raise CompileError("grouping() takes exactly one grouping column")
            a = fc.args[0]
            if isinstance(a, ast.Field) and a.table is None and a.name in alias_of:
                a = alias_of[a.name]
            try:
                gi = group_exprs.index(a)
            except ValueError:
                raise CompileError(
                    "grouping() argument must appear in the GROUP BY list"
                ) from None
            mapping[fc] = f"__a{j}"
            agg_cols.append(
                F.grouping(F.col(f"__g{gi}")).cast("long").alias(f"__a{j}")
            )
            continue
        mapping[fc] = f"__a{j}"
        agg_cols.append(_agg_column(fc, scope).alias(f"__a{j}"))
    if not agg_cols:
        # GROUP BY with no aggregates: still a grouping (DISTINCT-like)
        agg_cols = [F.count(F.lit(1)).alias("__dummy")]

    if stmt.group_mode == "plain":
        grouped = (
            df.groupBy(*group_cols).agg(*agg_cols) if group_cols else df.agg(*agg_cols)
        )
    else:
        # ROLLUP/CUBE/GROUPING SETS compile onto Spark's native grouping
        # analytics (one Expand + one aggregate — the q90 DataFrame
        # machinery, now reachable from the dialect). Group expressions
        # are pre-projected as __gN columns so grouping(__gN) resolves
        # against real input columns.
        pre = df.select("*", *group_cols)
        gcols = [F.col(f"__g{i}") for i in range(len(group_exprs))]
        if stmt.group_mode == "rollup":
            gd = pre.rollup(*gcols)
        elif stmt.group_mode == "cube":
            gd = pre.cube(*gcols)
        else:
            sets = [[gcols[i] for i in idxs] for idxs in stmt.grouping_sets]
            gd = pre.groupingSets(sets, *gcols)
        grouped = gd.agg(*agg_cols)

    # post-aggregation scope: internal columns only
    post = Scope()
    post.tables["__agg"] = (grouped.alias("__agg"), list(grouped.columns))
    grouped = grouped.alias("__agg")

    def post_compile(e: ast.Expr) -> Column:
        rewritten = _rewrite(e, mapping)
        # a bare field that is neither a group expr nor inside an aggregate
        # is an error in the reference; Spark would also refuse — produce the
        # reference's message for unresolvable ones.
        for sub in ast.walk(rewritten):
            if isinstance(sub, ast.Field) and not sub.name.startswith("__"):
                raise CompileError(
                    f"column {sub.name} must appear in GROUP BY or an aggregate"
                )
        return compile_expr(rewritten, post.resolve, post.dtype_of)

    names = []
    out_cols = []
    for i, (expr, alias) in enumerate(select_items):
        name = alias or (expr.name if isinstance(expr, ast.Field) else f"col_{i}")
        names.append(name)
        out_cols.append(post_compile(expr).alias(name))

    if stmt.having is not None:
        having_rw = stmt.having
        # HAVING may reference select aliases (planner.rs:445-500)
        if isinstance(having_rw, ast.Field) and having_rw.name in alias_of:
            having_rw = alias_of[having_rw.name]
        grouped = grouped.filter(post_compile(having_rw))

    hidden = 0
    order_cols = []
    for item in stmt.order_by:
        e = item.expr
        if isinstance(e, ast.Field) and e.table is None and e.name in names:
            c = F.col(e.name)
        else:
            if isinstance(e, ast.Field) and e.table is None and e.name in alias_of:
                e = alias_of[e.name]
            c = post_compile(e)
            out_cols.append(c.alias(f"__h{hidden}"))
            c = F.col(f"__h{hidden}")
            hidden += 1
        order_cols.append(c.desc_nulls_last() if item.desc else c.asc_nulls_first())

    result = grouped.select(*out_cols)
    if stmt.distinct:
        result = result.distinct()
    if order_cols:
        result = result.orderBy(*order_cols)
    if hidden:
        result = result.drop(*[f"__h{i}" for i in range(hidden)])
    return _offset_limit(result, stmt, scope)


# Bounded fixpoint for WITH RECURSIVE: each iteration is one distributed
# step (localCheckpointed to keep lineage flat), so the cap bounds driver
# round-trips, not data volume. 200 handles any practical hierarchy /
# closure depth; genuinely deeper graphs want the dedicated operator
# (operators/dedup.py connected components, which doubles reach per pass).
RECURSIVE_CTE_MAX_ITERS = 200


class _RecursiveRef(Exception):
    """Raised by the probe reader when a CTE body reads its own name —
    routes the CTE to the fixpoint compiler (or to a clear error when
    RECURSIVE wasn't declared). Deliberately NOT a ValueError/CompileError
    so no intermediate handler can swallow it."""

    def __init__(self, name: str):
        self.name = name


# Optional capabilities the engine's catalog-backed reader exposes as
# attributes on the reader callable. EVERY wrapper reader must forward
# ALL of them: a wrapper that copies only one silently strips the others
# inside CTE/derived-table/view bodies (round-9 advice: `relations()`
# failed inside a CTE because only .versioned was carried).
READER_CAPABILITIES = ("versioned", "relations", "recursive_cte_mode")


def _carry_versioned(wrapper: TableReader, src: TableReader) -> TableReader:
    """Forward every optional reader capability (READER_CAPABILITIES —
    time-travel `versioned`, catalog-introspection `relations`, ...) from
    the wrapped reader onto the wrapper, so an AS OF or a relations() TVF
    inside a CTE/derived-table/view body sees the same catalog surface
    the top-level query does."""
    for cap in READER_CAPABILITIES:
        v = getattr(src, cap, None)
        if v is not None:
            setattr(wrapper, cap, v)
    return wrapper


def _probe_self(read: TableReader, undefined: frozenset) -> TableReader:
    """A reader that raises _RecursiveRef for any not-yet-defined CTE name
    (the CTE's own, or one declared later in the WITH clause) instead of
    falling through to the catalog — how self-reference is DETECTED
    without a separate resolution pass over the AST."""

    def probe(n: str) -> DataFrame:
        if n in undefined:
            raise _RecursiveRef(n)
        return read(n)

    return _carry_versioned(probe, read)


def _chain_reader(read: TableReader, name: str, df: DataFrame) -> TableReader:
    """A reader where ``name`` resolves to ``df`` (shadowing the catalog)
    and everything else falls through — the CTE scoping mechanism."""

    def chained(n: str) -> DataFrame:
        return df if n == name else read(n)

    return _carry_versioned(chained, read)


def _compile_recursive_cte(
    cte: ast.Cte, spark: SparkSession, read: TableReader,
    max_iters: Optional[int] = None,
    mode: str = "fixpoint",
) -> DataFrame:
    """WITH RECURSIVE evaluation: standard `base UNION [ALL] step`
    semantic-set iteration, run as a BOUNDED distributed fixpoint.

    Standard semantics (Postgres/DuckDB): the recursive reference sees the
    PREVIOUS iteration's new rows (the working table), not the whole
    accumulation; UNION dedupes globally (a row already produced never
    re-enters the working table — this is what terminates graph closures
    with cycles), UNION ALL appends blindly and terminates only when a
    step yields nothing.

    Spark-first shape: every iteration's increment is computed by the
    ordinary distributed compiler and `localCheckpoint`ed — lineage stays
    flat (the final result is a union of checkpointed increments, not an
    N-deep plan), each UNION-mode `subtract` is one shuffle on the full
    row, and the empty-frontier test is a cheap job against the
    checkpointed increment. The iteration itself is driver-coordinated
    (like every Spark iterative algorithm: Lloyd refinement in
    similarity.py, the CC loop in dedup.py) but all data movement is
    cluster-side. NOTE: this means a recursive query EXECUTES during
    compilation — which is why EXPLAIN must NOT take this path:
    ``mode="unroll1"`` (round 10) builds the LAZY plan `anchor UNION
    first-step` instead — no checkpoint, no emptiness probe, zero Spark
    jobs — a representative one-iteration plan preview for EXPLAIN.
    """
    if max_iters is None:
        # read the module attribute at CALL time (not def time) so tests
        # and callers can tune the cap
        max_iters = RECURSIVE_CTE_MAX_ITERS
    q = cte.query
    if not (isinstance(q, ast.SetOp) and q.kind == "union"):
        raise CompileError(
            f"recursive CTE {cte.name} must be 'base UNION [ALL] step' "
            "(the anchor term first, the self-referencing term second)"
        )
    if q.order_by or q.limit is not None or q.offset is not None:
        raise CompileError(
            f"recursive CTE {cte.name}: ORDER BY / LIMIT / OFFSET on the "
            "UNION are not supported (apply them in the outer query)"
        )

    def fail_on_self(n: str) -> DataFrame:
        if n == cte.name:
            raise CompileError(
                f"recursive CTE {cte.name} references itself in the anchor "
                "(non-recursive) term"
            )
        return read(n)

    acc = compile_statement(q.left, spark, _carry_versioned(fail_on_self, read))
    if cte.columns is not None:
        if len(cte.columns) != len(acc.columns):
            raise CompileError(
                f"CTE {cte.name} declares {len(cte.columns)} columns, "
                f"query returns {len(acc.columns)}"
            )
        acc = acc.toDF(*cte.columns)
    distinct = not q.all_rows
    if distinct:
        acc = acc.distinct()
    if mode == "unroll1":  # EXPLAIN: lazy anchor ∪ first step, no jobs
        step = compile_statement(
            q.right, spark, _chain_reader(read, cte.name, acc)
        )
        if len(step.columns) != len(acc.columns):
            raise CompileError(
                f"recursive CTE {cte.name}: step returns {len(step.columns)} "
                f"columns, anchor returned {len(acc.columns)}"
            )
        new = step.toDF(*acc.columns)
        if distinct:
            new = new.subtract(acc)
        return acc.unionByName(new)
    acc = acc.localCheckpoint(eager=True)
    frontier = acc
    result = acc
    for _ in range(max_iters):
        step = compile_statement(
            q.right, spark, _chain_reader(read, cte.name, frontier)
        )
        if len(step.columns) != len(result.columns):
            raise CompileError(
                f"recursive CTE {cte.name}: step returns {len(step.columns)} "
                f"columns, anchor returned {len(result.columns)}"
            )
        new = step.toDF(*result.columns)
        if distinct:
            new = new.subtract(result)  # EXCEPT DISTINCT = working-table rule
        new = new.localCheckpoint(eager=True)
        if new.isEmpty():
            return result
        result = result.unionByName(new)
        frontier = new
    raise CompileError(
        f"recursive CTE {cte.name} did not converge within "
        f"{max_iters} iterations"
    )


def compile_statement(
    stmt, spark: SparkSession, read: TableReader,
    recursive_cte_mode: str = "fixpoint",
) -> DataFrame:
    """Compile a query statement (Select, SetOp chain, or With) to a
    DataFrame. ``recursive_cte_mode``: "fixpoint" (execution — iterates
    to convergence, runs Spark jobs) or "unroll1" (EXPLAIN — lazy
    anchor ∪ first-step plan, zero jobs; see _compile_recursive_cte).

    The mode rides ON THE READER (a READER_CAPABILITIES attribute) for
    every nested compile — derived tables, CTE bodies, set-op arms, and
    the engine's view-expanding reader — so an EXPLAIN of a WITH
    RECURSIVE one nesting level down (inside a subquery or a stored
    view) still compiles job-free (round-10 advice: the top-level
    parameter alone left nested recursion in fixpoint mode)."""
    if recursive_cte_mode != "fixpoint":
        read.recursive_cte_mode = recursive_cte_mode
    else:
        recursive_cte_mode = getattr(read, "recursive_cte_mode", "fixpoint")
    if isinstance(stmt, ast.With):
        r = read
        for i, cte in enumerate(stmt.ctes):
            undefined = frozenset(c.name for c in stmt.ctes[i:])
            try:
                df = compile_statement(
                    cte.query, spark, _probe_self(r, undefined)
                )
                if cte.columns is not None:
                    if len(cte.columns) != len(df.columns):
                        raise CompileError(
                            f"CTE {cte.name} declares {len(cte.columns)} "
                            f"columns, query returns {len(df.columns)}"
                        )
                    df = df.toDF(*cte.columns)
            except _RecursiveRef as ref:
                if ref.name != cte.name:
                    raise CompileError(
                        f"CTE {cte.name} references {ref.name}, which is "
                        "declared later in the WITH clause"
                    ) from None
                if not stmt.recursive:
                    raise CompileError(
                        f"CTE {cte.name} references itself — use WITH RECURSIVE"
                    ) from None
                df = _compile_recursive_cte(cte, spark, r, mode=recursive_cte_mode)
            r = _chain_reader(r, cte.name, df)
        return compile_statement(stmt.body, spark, r)
    if isinstance(stmt, ast.SetOp):
        left = compile_statement(stmt.left, spark, read)
        right = compile_statement(stmt.right, spark, read)
        if len(left.columns) != len(right.columns):
            raise CompileError("set operation inputs must have the same column count")
        right = right.toDF(*left.columns)
        if stmt.kind == "union":
            out = left.unionByName(right)
            out = out if stmt.all_rows else out.distinct()
        elif stmt.kind == "intersect":
            out = left.intersect(right)
        else:
            out = left.subtract(right)  # EXCEPT (distinct semantics)
        # statement-level tail: ORDER BY may only name output columns
        order_cols = []
        for item in stmt.order_by:
            e = item.expr
            if not (isinstance(e, ast.Field) and e.table is None and e.name in out.columns):
                raise CompileError(
                    "ORDER BY on a set operation must reference output columns"
                )
            c = F.col(e.name)
            order_cols.append(c.desc_nulls_last() if item.desc else c.asc_nulls_first())
        if order_cols:
            out = out.orderBy(*order_cols)
        off = _const_int(stmt.offset, "OFFSET")
        lim = _const_int(stmt.limit, "LIMIT")
        if off is not None:
            out = out.offset(off)
        if lim is not None:
            out = out.limit(lim)
        return out
    return compile_select(stmt, spark, read)


def _const_int(e: Optional[ast.Expr], what: str) -> Optional[int]:
    if e is None:
        return None
    if isinstance(e, ast.Literal) and isinstance(e.value, int) and not isinstance(e.value, bool):
        return e.value
    raise CompileError(f"{what} must be an integer constant")


def _offset_limit(df: DataFrame, stmt: ast.Select, scope: Scope) -> DataFrame:
    off = _const_int(stmt.offset, "OFFSET")
    lim = _const_int(stmt.limit, "LIMIT")
    if off is not None:
        df = df.offset(off)
    if lim is not None:
        df = df.limit(lim)
    return df
