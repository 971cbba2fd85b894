"""AST for the entangleDB SQL dialect.

Mirrors the *surface grammar* of the reference
(/root/reference/src/sql/parser/ast.rs — statements, FROM join trees,
name-based expressions) as plain Python dataclasses. This is IR #1; the
compiler (functions/expressions.py + engine.py) lowers it straight onto
DataFrame operations — there is no positional-index IR #2 because Spark
resolves names itself (SURVEY §3.1 step 4 note).
"""

from __future__ import annotations

from dataclasses import dataclass
from enum import Enum
from typing import Optional, Union

# --------------------------------------------------------------------------
# Expressions
# --------------------------------------------------------------------------


@dataclass(frozen=True)
class Literal:
    value: Union[None, bool, int, float, str]


@dataclass(frozen=True)
class Star:
    """The bare `*` in a SELECT list. A dedicated node so a genuine string
    literal '*' (which the reference returns as-is) can never be confused
    with the all-columns sentinel."""


@dataclass(frozen=True)
class Field:
    """Column reference, optionally table-qualified."""

    name: str
    table: Optional[str] = None


@dataclass(frozen=True)
class Op:
    """Operator application. `name` is one of:
    AND OR NOT / EQ NE GT GTE LT LTE LIKE IS_NULL /
    ADD SUB MUL DIV MOD EXP NEG POS FACTORIAL."""

    name: str
    args: tuple["Expr", ...]


@dataclass(frozen=True)
class FuncCall:
    """Function-call syntax. The planner resolves the five aggregates
    (avg/count/max/min/sum — planner.rs:503-512) plus our scalar-function
    extension; anything else errors at plan time (planner.rs:538-540)."""

    name: str
    args: tuple["Expr", ...]
    star: bool = False  # COUNT(*) → count(TRUE) special case (parser/mod.rs:540-543)
    distinct: bool = False  # COUNT(DISTINCT x) etc. — extension


@dataclass(frozen=True)
class WindowFunc:
    """Window function application (extension — SURVEY §2.5: the reference
    has none): `fn(args) OVER (PARTITION BY ... ORDER BY ... [frame])`.
    Supported fns: row_number/rank/dense_rank, lag/lead, and the five
    aggregates. `frame`: None (default) or 'rows_unbounded_current'."""

    name: str
    args: tuple["Expr", ...]
    partition_by: tuple["Expr", ...] = ()
    order_by: tuple["OrderItem", ...] = ()
    frame: Optional[str] = None


@dataclass(frozen=True)
class Subquery:
    """Uncorrelated subquery in expression position (extension — the
    reference has no subqueries). Forms: scalar `(SELECT ...)`,
    `x IN (SELECT ...)` (Op "IN_SUBQ"), `EXISTS (SELECT ...)` (Op
    "EXISTS"). Resolved by the compiler before expression lowering."""

    select: "Select"


Expr = Union[Literal, Star, Field, Op, FuncCall, WindowFunc, Subquery]

AGGREGATES = ("avg", "count", "max", "min", "sum", "grouping")


def is_aggregate(e: Expr) -> bool:
    return isinstance(e, FuncCall) and e.name.lower() in AGGREGATES


def contains_aggregate(e: Expr) -> bool:
    if is_aggregate(e):
        return True
    if isinstance(e, WindowFunc):
        return False  # windowed aggregates are not grouping aggregates
    if isinstance(e, Op):
        return any(contains_aggregate(a) for a in e.args)
    if isinstance(e, FuncCall):
        return any(contains_aggregate(a) for a in e.args)
    return False


def walk(e: Expr):
    yield e
    if isinstance(e, (Op, FuncCall)):
        for a in e.args:
            yield from walk(a)
    elif isinstance(e, WindowFunc):
        for a in e.args:
            yield from walk(a)
        for p in e.partition_by:
            yield from walk(p)
        for o in e.order_by:
            yield from walk(o.expr)


# --------------------------------------------------------------------------
# FROM items
# --------------------------------------------------------------------------


class JoinType(str, Enum):
    CROSS = "cross"
    INNER = "inner"
    LEFT = "left"
    RIGHT = "right"
    FULL = "full"  # FULL [OUTER] JOIN (extension — the reference stops at RIGHT)


@dataclass(frozen=True)
class TableRef:
    name: str
    alias: Optional[str] = None
    # FROM t AS OF SYSTEM TIME n (extension): read THIS table (or view /
    # materialized view) at catalog version n — per-table time travel,
    # composable with current-version tables in the same query (the
    # statement-level form is BEGIN READ ONLY AS OF SYSTEM TIME).
    as_of: Optional[int] = None


@dataclass(frozen=True)
class TableFunc:
    """A table-valued function in FROM (extension; the reference's FROM
    accepts only table names — planner.rs:260-280). Arguments are literal
    constants: a TVF materializes before the query's frame exists, so
    column references could never resolve — the parser rejects them
    outright with that explanation."""

    name: str
    args: tuple[Literal, ...]
    alias: Optional[str] = None


@dataclass(frozen=True)
class DerivedTable:
    """A parenthesized subquery in FROM — `FROM (SELECT ...) AS t`
    (extension; the reference's FROM accepts only table names). The alias
    is mandatory, as in standard SQL: every FROM item must have a name
    for column references to resolve against."""

    query: "Statement"  # Select | SetOp | With
    alias: str


@dataclass(frozen=True)
class Join:
    left: "FromItem"
    right: "FromItem"
    join_type: JoinType
    predicate: Optional[Expr] = None


FromItem = Union[TableRef, TableFunc, DerivedTable, Join]


# --------------------------------------------------------------------------
# Statements
# --------------------------------------------------------------------------


@dataclass(frozen=True)
class ColumnDef:
    """CREATE TABLE column with the reference's options
    (/root/reference/src/sql/schema.rs:138-156)."""

    name: str
    datatype: str  # BOOLEAN | INTEGER | FLOAT | STRING
    primary_key: bool = False
    nullable: Optional[bool] = None  # None → default (non-PK: nullable)
    default: Optional[Expr] = None
    unique: bool = False
    references: Optional[str] = None
    index: bool = False


@dataclass(frozen=True)
class CreateTable:
    name: str
    columns: tuple[ColumnDef, ...]
    # CREATE TABLE ... PARTITION BY (c, ...) (extension): Hive-style
    # directory layout on the named columns — every snapshot/delta write
    # encodes them in the path so reads prune files by partition value.
    partition_by: tuple[str, ...] = ()


@dataclass(frozen=True)
class DropTable:
    name: str


@dataclass(frozen=True)
class Insert:
    table: str
    columns: Optional[tuple[str, ...]]
    values: tuple[tuple[Expr, ...], ...] = ()
    query: Optional["Statement"] = None  # INSERT ... SELECT — extension


@dataclass(frozen=True)
class CreateTableAs:
    """CREATE TABLE name AS SELECT ... (extension). The first output column
    becomes the primary key (validated non-null + unique on write)."""

    name: str
    query: "Statement"


@dataclass(frozen=True)
class Update:
    table: str
    sets: tuple[tuple[str, Expr], ...]
    where: Optional[Expr] = None


@dataclass(frozen=True)
class Delete:
    table: str
    where: Optional[Expr] = None


@dataclass(frozen=True)
class Copy:
    """COPY <table | (query)> TO 'path' [FORMAT PARQUET|CSV] [OVERWRITE]
    (extension) — the export complement of ATTACH."""
    source: object  # str table name, or a Select/SetOp statement
    path: str
    fmt: str = "parquet"
    overwrite: bool = False


@dataclass(frozen=True)
class MergeWhen:
    """One WHEN clause of a MERGE. ``matched`` selects the join side the
    clause applies to; ``action`` is 'update' | 'delete' (matched) or
    'insert' (not matched); ``condition`` is the optional AND filter."""
    matched: bool
    action: str
    condition: Optional[Expr] = None
    sets: tuple = ()  # update: ((col, Expr), ...)
    columns: Optional[tuple] = None  # insert: explicit column list
    values: tuple = ()  # insert: one Expr per column


@dataclass(frozen=True)
class Merge:
    """MERGE INTO target USING source ON cond WHEN ... (extension).
    ``source`` is a table/view name, or a query statement for the
    USING (SELECT ...) AS alias form (alias then mandatory)."""
    target: str
    source: object  # str name | Select/SetOp/With statement
    on: Expr
    whens: tuple
    target_alias: Optional[str] = None
    source_alias: Optional[str] = None


@dataclass(frozen=True)
class OrderItem:
    expr: Expr
    desc: bool = False


@dataclass(frozen=True)
class Select:
    select: tuple[tuple[Expr, Optional[str]], ...]  # (expr, alias)
    from_: Optional[FromItem] = None
    where: Optional[Expr] = None
    group_by: tuple[Expr, ...] = ()
    having: Optional[Expr] = None
    order_by: tuple[OrderItem, ...] = ()
    offset: Optional[Expr] = None
    limit: Optional[Expr] = None
    distinct: bool = False  # SELECT DISTINCT — extension
    # GROUP BY ROLLUP/CUBE/GROUPING SETS (extension): "plain" is ordinary
    # GROUP BY; for "sets", `group_by` holds the DISTINCT union of every
    # set's expressions (first-appearance order) and `grouping_sets` the
    # per-set index tuples into group_by. grouping(expr) aggregates
    # disambiguate super-aggregate NULLs, exactly SQL-standard.
    group_mode: str = "plain"  # plain | rollup | cube | sets
    grouping_sets: tuple[tuple[int, ...], ...] = ()


@dataclass(frozen=True)
class SetOp:
    """UNION / INTERSECT / EXCEPT between two selects (extension — SURVEY
    §2.7: the reference has no set operations). `all_rows` only for UNION.
    Trailing ORDER BY / LIMIT / OFFSET apply to the whole combined result
    (standard SQL binding); ORDER BY may only reference output columns."""

    kind: str  # union | intersect | except
    left: "Statement"
    right: "Statement"
    all_rows: bool = False
    order_by: tuple[OrderItem, ...] = ()
    offset: Optional[Expr] = None
    limit: Optional[Expr] = None


@dataclass(frozen=True)
class Cte:
    """One `name [(col, ...)] AS (query)` entry of a WITH clause."""

    name: str
    query: "Statement"  # Select | SetOp
    columns: Optional[tuple[str, ...]] = None  # WITH t(a, b) AS ... rename


@dataclass(frozen=True)
class With:
    """WITH [RECURSIVE] ctes... <query> (extension — the reference has no
    CTEs). Each CTE sees the ones declared before it; the body sees all of
    them; CTE names shadow catalog tables for the statement's duration.

    RECURSIVE requires each self-referencing CTE's query to be the
    standard `base UNION [ALL] step` shape and is evaluated by bounded
    fixpoint iteration (see compiler._compile_recursive_cte)."""

    ctes: tuple[Cte, ...]
    body: "Statement"  # Select | SetOp
    recursive: bool = False


@dataclass(frozen=True)
class CreateView:
    """CREATE VIEW name AS <query> (extension). The view's QUERY TEXT is
    stored in the versioned catalog manifest, so views are transactional
    and time-travel with AS OF SYSTEM TIME like tables; the parsed form
    here exists for create-time validation and dependency extraction."""

    name: str
    sql: str  # the query text as written (stored; re-parsed at use)
    query: "Statement"


@dataclass(frozen=True)
class DropView:
    name: str


@dataclass(frozen=True)
class Optimize:
    """OPTIMIZE t [ZORDER BY (c1, c2, ...)] (extension — Delta-style
    layout maintenance): rewrite the table's base as one compacted
    snapshot, optionally Z-ORDER-clustered on the named columns so
    parquet min/max row-group statistics prune multi-dimensional
    predicates. A point-in-time rewrite: later deltas append unclustered
    until the next OPTIMIZE — the standard contract."""

    table: str
    zorder: tuple[str, ...] = ()
    files: Optional[int] = None  # FILES n — explicit output file count
    # OPTIMIZE t WHERE <partition equalities> (extension): rewrite ONLY
    # the matching partition directories, hard-link the rest unchanged.
    where: Optional[Expr] = None


@dataclass(frozen=True)
class AlterTable:
    """ALTER TABLE t ADD COLUMN <def> | DROP COLUMN c | RENAME COLUMN a
    TO b (extension — the reference has no schema evolution). All three
    are metadata-only manifest edits: ADD fills pre-existing rows at read
    (NULL, or the NOT NULL DEFAULT via initial_default); RENAME pins the
    stored file name in the column's ``physical`` entry so no parquet is
    rewritten (catalog.schema_of)."""

    table: str
    action: str  # 'add' | 'drop' | 'rename'
    column: Optional[ColumnDef] = None  # add
    name: Optional[str] = None  # drop / rename source
    new_name: Optional[str] = None  # rename target


@dataclass(frozen=True)
class CreateMaterializedView:
    """CREATE MATERIALIZED VIEW name AS <query> (extension). Unlike a
    plain view, the result is MATERIALIZED to parquet at create time and
    reads serve the stored snapshot; REFRESH MATERIALIZED VIEW brings it
    up to date — incrementally via the change data feed when the defining
    query is a single-table GROUP BY aggregate (see engine._refresh_matview)."""

    name: str
    sql: str  # query text as written (stored; re-parsed at refresh)
    query: "Statement"


@dataclass(frozen=True)
class DropMaterializedView:
    name: str


@dataclass(frozen=True)
class RefreshMaterializedView:
    name: str


@dataclass(frozen=True)
class Begin:
    read_only: bool = False
    as_of: Optional[int] = None  # MVCC version number, not wall-clock


@dataclass(frozen=True)
class Commit:
    pass


@dataclass(frozen=True)
class Rollback:
    pass


@dataclass(frozen=True)
class Explain:
    statement: "Statement"
    analyze: bool = False  # EXPLAIN ANALYZE: execute + runtime metrics


Statement = Union[
    CreateTable, CreateTableAs, DropTable, Insert, Update, Delete, Merge,
    Copy, Select, SetOp, With, CreateView, DropView, AlterTable, Optimize,
    CreateMaterializedView, DropMaterializedView, RefreshMaterializedView,
    Begin, Commit, Rollback, Explain,
]
