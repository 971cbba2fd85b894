"""Recursive-descent / precedence-climbing parser for the entangleDB dialect.

Grammar per the reference's surface (statements: BEGIN/COMMIT/ROLLBACK/
EXPLAIN/CREATE TABLE/DROP TABLE/INSERT/UPDATE/DELETE/SELECT; FROM join
trees with CROSS/INNER/LEFT/RIGHT [OUTER]; precedence-climbed expressions
with ^ exponent, ! factorial, IS [NOT] NULL, LIKE, and INFINITY/NAN
literals — /root/reference/src/sql/parser/mod.rs). Fresh implementation in
Python; precedence table follows the documented dialect, not the Rust code.
"""

from __future__ import annotations

from typing import Optional

from entangledb_spark.plans import ast
from entangledb_spark.plans.lexer import Token, tokenize


class ParseError(ValueError):
    pass


# infix operator → (precedence, right_assoc, ast op name)
_INFIX = {
    "or": (1, False, "OR"),
    "and": (2, False, "AND"),
    "=": (4, False, "EQ"),
    "!=": (4, False, "NE"),
    "<>": (4, False, "NE"),
    ">": (4, False, "GT"),
    ">=": (4, False, "GTE"),
    "<": (4, False, "LT"),
    "<=": (4, False, "LTE"),
    "like": (4, False, "LIKE"),
    "+": (5, False, "ADD"),
    "-": (5, False, "SUB"),
    "*": (6, False, "MUL"),
    "/": (6, False, "DIV"),
    "%": (6, False, "MOD"),
    "^": (7, True, "EXP"),
}

_TYPE_KEYWORDS = {
    "bool": "BOOLEAN", "boolean": "BOOLEAN",
    "char": "STRING", "string": "STRING", "text": "STRING", "varchar": "STRING",
    "double": "FLOAT", "float": "FLOAT",
    "int": "INTEGER", "integer": "INTEGER",
}


class Parser:
    def __init__(self, sql: str):
        self.sql = sql  # kept for source slicing (CREATE VIEW stores text)
        self.tokens = list(tokenize(sql))
        self.i = 0

    # ---- token helpers ----------------------------------------------------

    def peek(self, ahead: int = 0) -> Token:
        j = min(self.i + ahead, len(self.tokens) - 1)  # clamp to EOF token
        return self.tokens[j]

    def next(self) -> Token:
        t = self.tokens[self.i]
        self.i += 1
        return t

    def accept(self, kind: str, text: Optional[str] = None) -> Optional[Token]:
        t = self.peek()
        if t.kind == kind and (text is None or t.text == text):
            return self.next()
        return None

    def expect(self, kind: str, text: Optional[str] = None) -> Token:
        t = self.accept(kind, text)
        if t is None:
            raise ParseError(f"expected {text or kind}, found {self.peek()}")
        return t

    def accept_word(self, word: str) -> bool:
        """CONTEXTUAL keyword: matches an identifier (or keyword) token
        spelled ``word``, case-insensitively — for statement options like
        MATCHED / ANALYZE / FORMAT / OVERWRITE that must not steal the
        word from user columns (see the lexer's reservation note)."""
        t = self.peek()
        if t.kind in ("ident", "keyword") and t.text.lower() == word:
            self.next()
            return True
        return False

    def expect_word(self, word: str) -> None:
        if not self.accept_word(word):
            raise ParseError(f"expected {word.upper()}, found {self.peek()}")

    # ---- entry ------------------------------------------------------------

    def parse(self) -> ast.Statement:
        stmt = self.parse_statement()
        self.accept("symbol", ";")
        self.expect("eof")
        return stmt

    def parse_statement(self) -> ast.Statement:
        t = self.peek()
        if t.kind == "ident" and t.text.lower() == "alter":
            return self.parse_alter_table()
        if t.kind == "ident" and t.text.lower() == "optimize":
            # OPTIMIZE t [ZORDER BY (c1, ...)] — contextual keywords
            self.next()
            table = self.expect("ident").text
            zorder: tuple = ()
            if self.accept_word("zorder"):
                self.expect("keyword", "by")
                self.expect("symbol", "(")
                cols = [self.expect("ident").text]
                while self.accept("symbol", ","):
                    cols.append(self.expect("ident").text)
                self.expect("symbol", ")")
                zorder = tuple(cols)
            files = None
            if self.accept_word("files"):
                files = int(self.expect("number").text)
                if files < 1:
                    raise ParseError("OPTIMIZE FILES must be >= 1")
            where = (
                self.parse_expr() if self.accept("keyword", "where") else None
            )
            return ast.Optimize(
                table=table, zorder=zorder, files=files, where=where
            )
        if t.kind == "ident" and t.text.lower() == "refresh":
            # REFRESH MATERIALIZED VIEW name (contextual — `refresh` stays
            # a legal identifier everywhere else)
            self.next()
            self.expect_word("materialized")
            self.expect_word("view")
            return ast.RefreshMaterializedView(self.expect("ident").text)
        if t.kind != "keyword":
            raise ParseError(f"unexpected token {t}")
        dispatch = {
            "begin": self.parse_begin,
            "commit": lambda: (self.next(), ast.Commit())[1],
            "rollback": lambda: (self.next(), ast.Rollback())[1],
            "explain": self.parse_explain,
            "create": self.parse_create_table,
            "drop": self.parse_drop_table,
            "insert": self.parse_insert,
            "update": self.parse_update,
            "delete": self.parse_delete,
            "merge": self.parse_merge,
            "copy": self.parse_copy,
            "select": self.parse_select_statement,
            "with": self.parse_with,
        }
        fn = dispatch.get(t.text)
        if fn is None:
            raise ParseError(f"unexpected keyword {t.text!r}")
        return fn()

    # ---- transactions -----------------------------------------------------

    def parse_begin(self) -> ast.Begin:
        self.expect("keyword", "begin")
        self.accept("keyword", "transaction")
        read_only = False
        if self.accept("keyword", "read"):
            if self.accept("keyword", "only"):
                read_only = True
            else:
                self.expect("keyword", "write")
        as_of = None
        if self.accept("keyword", "as"):
            self.expect("keyword", "of")
            self.expect("keyword", "system")
            self.expect("keyword", "time")
            as_of = int(self.expect("number").text)
            if not read_only:
                raise ParseError("AS OF SYSTEM TIME requires READ ONLY")
        return ast.Begin(read_only=read_only, as_of=as_of)

    def parse_explain(self) -> ast.Explain:
        self.expect("keyword", "explain")
        analyze = self.accept_word("analyze")
        return ast.Explain(self.parse_statement(), analyze=analyze)

    # ---- DDL --------------------------------------------------------------

    def parse_create_table(self) -> "ast.Statement":
        self.expect("keyword", "create")
        if self.accept_word("view"):
            return self.parse_create_view()
        if self.accept_word("materialized"):
            self.expect_word("view")
            return self.parse_create_view(materialized=True)
        self.expect("keyword", "table")
        name = self.expect("ident").text
        if self.accept("keyword", "as"):
            return ast.CreateTableAs(name=name, query=self.parse_query())
        self.expect("symbol", "(")
        cols = []
        while True:
            cols.append(self.parse_column_def())
            if not self.accept("symbol", ","):
                break
        self.expect("symbol", ")")
        partition_by: tuple = ()
        if self.accept("keyword", "partition"):
            self.expect("keyword", "by")
            self.expect("symbol", "(")
            pcols = [self.expect("ident").text]
            while self.accept("symbol", ","):
                pcols.append(self.expect("ident").text)
            self.expect("symbol", ")")
            partition_by = tuple(pcols)
        return ast.CreateTable(
            name=name, columns=tuple(cols), partition_by=partition_by
        )

    def parse_column_def(self) -> ast.ColumnDef:
        name = self.expect("ident").text
        ty = self.peek()
        if ty.kind != "keyword" or ty.text not in _TYPE_KEYWORDS:
            raise ParseError(f"expected datatype, found {ty}")
        self.next()
        col = dict(name=name, datatype=_TYPE_KEYWORDS[ty.text])
        while True:
            if self.accept("keyword", "primary"):
                self.expect("keyword", "key")
                col["primary_key"] = True
            elif self.accept("keyword", "not"):
                self.expect("keyword", "null")
                col["nullable"] = False
            elif self.accept("keyword", "null"):
                col["nullable"] = True
            elif self.accept("keyword", "default"):
                col["default"] = self.parse_expr()
            elif self.accept("keyword", "unique"):
                col["unique"] = True
            elif self.accept("keyword", "references"):
                col["references"] = self.expect("ident").text
            elif self.accept("keyword", "index"):
                col["index"] = True
            else:
                break
        return ast.ColumnDef(**col)

    def parse_drop_table(self) -> "ast.Statement":
        self.expect("keyword", "drop")
        if self.accept_word("view"):
            return ast.DropView(self.expect("ident").text)
        if self.accept_word("materialized"):
            self.expect_word("view")
            return ast.DropMaterializedView(self.expect("ident").text)
        self.expect("keyword", "table")
        return ast.DropTable(self.expect("ident").text)

    def parse_alter_table(self) -> "ast.AlterTable":
        """ALTER TABLE t ADD COLUMN <coldef> | DROP COLUMN c |
        RENAME COLUMN a TO b. ALTER/ADD/COLUMN/RENAME are contextual —
        they stay legal identifiers everywhere else."""
        self.expect_word("alter")
        self.expect("keyword", "table")
        table = self.expect("ident").text
        if self.accept_word("add"):
            self.expect_word("column")
            return ast.AlterTable(table=table, action="add", column=self.parse_column_def())
        if self.accept("keyword", "drop"):
            self.expect_word("column")
            return ast.AlterTable(table=table, action="drop", name=self.expect("ident").text)
        if self.accept_word("rename"):
            self.expect_word("column")
            old = self.expect("ident").text
            self.expect("keyword", "to")
            return ast.AlterTable(
                table=table, action="rename", name=old,
                new_name=self.expect("ident").text,
            )
        raise ParseError(
            f"expected ADD COLUMN, DROP COLUMN, or RENAME COLUMN, found {self.peek()}"
        )

    def parse_create_view(self, materialized: bool = False) -> "ast.Statement":
        """CREATE VIEW name AS <query> (extension). The query's SOURCE TEXT
        is captured by token-position slicing and stored verbatim in the
        catalog, so a view survives engine upgrades as SQL, not as a
        serialized plan — the parsed form is only used for create-time
        validation and dependency recording (engine._create_view)."""
        name = self.expect("ident").text
        self.expect("keyword", "as")
        start = self.peek().pos
        query = self.parse_query()
        end = self.peek().pos  # eof or ';' token start = end of query text
        sql = self.sql[start:end].strip()
        if materialized:
            return ast.CreateMaterializedView(name=name, sql=sql, query=query)
        return ast.CreateView(name=name, sql=sql, query=query)

    def parse_query(self) -> "ast.Statement":
        """A query: SELECT statement (incl. set-op chains) or WITH."""
        if self.peek().kind == "keyword" and self.peek().text == "with":
            return self.parse_with()
        return self.parse_select_statement()

    def parse_with(self) -> "ast.With":
        """WITH [RECURSIVE] name [(col, ...)] AS (query), ... <query>.
        RECURSIVE is contextual (a column named `recursive` keeps
        working); each CTE body may itself be a WITH (nested scopes)."""
        self.expect("keyword", "with")
        recursive = self.accept_word("recursive")
        ctes = []
        seen: set[str] = set()
        while True:
            name = self.expect("ident").text
            if name in seen:
                raise ParseError(f"duplicate CTE name {name!r} in WITH clause")
            seen.add(name)
            columns = None
            if self.accept("symbol", "("):
                cols = []
                while True:
                    cols.append(self.expect("ident").text)
                    if not self.accept("symbol", ","):
                        break
                self.expect("symbol", ")")
                columns = tuple(cols)
            self.expect("keyword", "as")
            self.expect("symbol", "(")
            q = self.parse_query()
            self.expect("symbol", ")")
            ctes.append(ast.Cte(name=name, query=q, columns=columns))
            if not self.accept("symbol", ","):
                break
        body = self.parse_query()
        return ast.With(ctes=tuple(ctes), body=body, recursive=recursive)

    # ---- DML --------------------------------------------------------------

    def parse_insert(self) -> ast.Insert:
        self.expect("keyword", "insert")
        self.expect("keyword", "into")
        table = self.expect("ident").text
        columns = None
        if self.accept("symbol", "("):
            columns = []
            while True:
                columns.append(self.expect("ident").text)
                if not self.accept("symbol", ","):
                    break
            self.expect("symbol", ")")
            columns = tuple(columns)
        if self.peek().kind == "keyword" and self.peek().text in ("select", "with"):
            return ast.Insert(
                table=table, columns=columns, query=self.parse_query()
            )
        self.expect("keyword", "values")
        rows = []
        while True:
            self.expect("symbol", "(")
            row = []
            while True:
                row.append(self.parse_expr())
                if not self.accept("symbol", ","):
                    break
            self.expect("symbol", ")")
            rows.append(tuple(row))
            if not self.accept("symbol", ","):
                break
        return ast.Insert(table=table, columns=columns, values=tuple(rows))

    def parse_update(self) -> ast.Update:
        self.expect("keyword", "update")
        table = self.expect("ident").text
        self.expect("keyword", "set")
        sets = []
        while True:
            col = self.expect("ident").text
            self.expect("symbol", "=")
            sets.append((col, self.parse_expr()))
            if not self.accept("symbol", ","):
                break
        where = self.parse_expr() if self.accept("keyword", "where") else None
        return ast.Update(table=table, sets=tuple(sets), where=where)

    def parse_delete(self) -> ast.Delete:
        self.expect("keyword", "delete")
        self.expect("keyword", "from")
        table = self.expect("ident").text
        where = self.parse_expr() if self.accept("keyword", "where") else None
        return ast.Delete(table=table, where=where)

    def parse_merge(self) -> "ast.Merge":
        """MERGE INTO target [[AS] alias] USING source [[AS] alias]
        ON cond { WHEN [NOT] MATCHED [AND cond] THEN action }+
        with action ∈ UPDATE SET c = e, ... | DELETE | INSERT [(cols)]
        VALUES (exprs). Extension — the reference has no MERGE."""
        self.expect("keyword", "merge")
        self.expect("keyword", "into")
        target = self.expect("ident").text
        target_alias = self._merge_alias()
        self.expect("keyword", "using")
        if self.peek().kind == "symbol" and self.peek().text == "(":
            # USING (query) alias — derived-table source
            self.next()
            source: object = self.parse_query()
            self.expect("symbol", ")")
            source_alias = self._merge_alias()
            if source_alias is None:
                raise ParseError(
                    "MERGE USING (query) requires an alias — USING (SELECT ...) AS name"
                )
        else:
            source = self.expect("ident").text
            source_alias = self._merge_alias()
        self.expect("keyword", "on")
        on = self.parse_expr()
        whens = []
        while self.accept("keyword", "when"):
            matched = self.accept("keyword", "not") is None
            self.expect_word("matched")
            cond = self.parse_expr() if self.accept("keyword", "and") else None
            self.expect("keyword", "then")
            if self.accept("keyword", "update"):
                if not matched:
                    raise ParseError("WHEN NOT MATCHED supports INSERT only")
                self.expect("keyword", "set")
                sets = []
                while True:
                    col = self.expect("ident").text
                    self.expect("symbol", "=")
                    sets.append((col, self.parse_expr()))
                    if not self.accept("symbol", ","):
                        break
                whens.append(
                    ast.MergeWhen(True, "update", condition=cond, sets=tuple(sets))
                )
            elif self.accept("keyword", "delete"):
                if not matched:
                    raise ParseError("WHEN NOT MATCHED supports INSERT only")
                whens.append(ast.MergeWhen(True, "delete", condition=cond))
            elif self.accept("keyword", "insert"):
                if matched:
                    raise ParseError("WHEN MATCHED supports UPDATE or DELETE only")
                cols = None
                if self.accept("symbol", "("):
                    cols = [self.expect("ident").text]
                    while self.accept("symbol", ","):
                        cols.append(self.expect("ident").text)
                    self.expect("symbol", ")")
                self.expect("keyword", "values")
                self.expect("symbol", "(")
                values = [self.parse_expr()]
                while self.accept("symbol", ","):
                    values.append(self.parse_expr())
                self.expect("symbol", ")")
                whens.append(
                    ast.MergeWhen(
                        False, "insert", condition=cond,
                        columns=tuple(cols) if cols is not None else None,
                        values=tuple(values),
                    )
                )
            else:
                raise ParseError(
                    "expected UPDATE, DELETE, or INSERT after THEN in MERGE"
                )
        if not whens:
            raise ParseError("MERGE requires at least one WHEN clause")
        for action in ("update", "delete", "insert"):
            if sum(1 for w in whens if w.action == action) > 1:
                raise ParseError(f"MERGE allows at most one {action.upper()} clause")
        return ast.Merge(
            target=target, source=source, on=on, whens=tuple(whens),
            target_alias=target_alias, source_alias=source_alias,
        )

    def parse_copy(self) -> "ast.Copy":
        """COPY <table | (query)> TO 'path' [FORMAT PARQUET|CSV]
        [OVERWRITE] — export to external files (extension; ATTACH is the
        matching import)."""
        self.expect("keyword", "copy")
        if self.accept("symbol", "("):
            source = self.parse_query()
            self.expect("symbol", ")")
        else:
            source = self.expect("ident").text
        self.expect("keyword", "to")
        path = self.expect("string").text
        fmt = "parquet"
        overwrite = False
        while True:
            if self.accept_word("format"):
                t = self.next()
                if t.kind not in ("ident", "keyword") or t.text.lower() not in (
                    "parquet", "csv",
                ):
                    raise ParseError(
                        f"COPY FORMAT must be PARQUET or CSV, got {t.text!r}"
                    )
                fmt = t.text.lower()
            elif self.accept_word("overwrite"):
                overwrite = True
            else:
                break
        return ast.Copy(source=source, path=path, fmt=fmt, overwrite=overwrite)

    def _merge_alias(self):
        if self.accept("keyword", "as"):
            return self.expect("ident").text
        t = self.peek()
        if t.kind == "ident":
            return self.next().text
        return None

    # ---- SELECT -----------------------------------------------------------

    def parse_select_statement(self) -> "ast.Statement":
        """SELECT possibly chained with UNION [ALL] / INTERSECT / EXCEPT
        (left-associative; extension — the reference has no set ops).
        Trailing ORDER BY / LIMIT / OFFSET bind to the whole chain."""
        left: ast.Statement = self.parse_select(include_tail=False)
        is_chain = False
        while True:
            kind = None
            for kw in ("union", "intersect", "except"):
                if self.accept("keyword", kw):
                    kind = kw
                    break
            if kind is None:
                break
            is_chain = True
            all_rows = kind == "union" and self.accept("keyword", "all") is not None
            right = self.parse_select(include_tail=False)
            left = ast.SetOp(kind=kind, left=left, right=right, all_rows=all_rows)
        from dataclasses import replace

        order_by, offset, limit = self._parse_tail()
        return replace(left, order_by=order_by, offset=offset, limit=limit)

    def _parse_tail(self):
        """ORDER BY / LIMIT / OFFSET (LIMIT and OFFSET in either order;
        OFFSET applies first — reference plan order, planner.rs:221-240)."""
        order_by: tuple = ()
        if self.accept("keyword", "order"):
            self.expect("keyword", "by")
            items = []
            while True:
                e = self.parse_expr()
                desc = False
                if self.accept("keyword", "desc"):
                    desc = True
                else:
                    self.accept("keyword", "asc")
                items.append(ast.OrderItem(e, desc))
                if not self.accept("symbol", ","):
                    break
            order_by = tuple(items)
        limit = offset = None
        for _ in range(2):
            if limit is None and self.accept("keyword", "limit"):
                limit = self.parse_expr()
            elif offset is None and self.accept("keyword", "offset"):
                offset = self.parse_expr()
        return order_by, offset, limit

    def parse_select(self, include_tail: bool = True) -> ast.Select:
        self.expect("keyword", "select")
        distinct = self.accept("keyword", "distinct") is not None
        select = []
        while True:
            if self.accept("symbol", "*"):
                select.append((ast.Star(), None))  # SELECT * sentinel
            else:
                expr = self.parse_expr()
                alias = None
                if self.accept("keyword", "as"):
                    t = self.peek()
                    if t.kind in ("ident", "string"):
                        alias = self.next().text
                    else:
                        raise ParseError(f"expected alias, found {t}")
                elif self.peek().kind == "ident":
                    alias = self.next().text
                select.append((expr, alias))
            if not self.accept("symbol", ","):
                break

        from_ = None
        if self.accept("keyword", "from"):
            from_ = self.parse_from_item()
            while self.accept("symbol", ","):  # comma = cross join
                from_ = ast.Join(from_, self.parse_from_item(), ast.JoinType.CROSS)

        where = self.parse_expr() if self.accept("keyword", "where") else None

        group_by: tuple = ()
        group_mode = "plain"
        grouping_sets: tuple = ()
        if self.accept("keyword", "group"):
            self.expect("keyword", "by")
            # ROLLUP / CUBE / GROUPING SETS are contextual words (a column
            # named `rollup` keeps working when not followed by '(')
            if self._peek_word_paren("rollup"):
                self.next()
                group_mode = "rollup"
                group_by = tuple(self._parse_paren_expr_list())
            elif self._peek_word_paren("cube"):
                self.next()
                group_mode = "cube"
                group_by = tuple(self._parse_paren_expr_list())
            elif (
                self.peek().kind == "ident"
                and self.peek().text.lower() == "grouping"
                and self.peek(1).kind == "ident"
                and self.peek(1).text.lower() == "sets"
            ):
                self.next()
                self.next()
                group_mode = "sets"
                group_by, grouping_sets = self._parse_grouping_sets()
            else:
                groups = [self.parse_expr()]
                while self.accept("symbol", ","):
                    groups.append(self.parse_expr())
                group_by = tuple(groups)

        having = self.parse_expr() if self.accept("keyword", "having") else None

        order_by: tuple = ()
        limit = offset = None
        if include_tail:
            order_by, offset, limit = self._parse_tail()
        return ast.Select(
            select=tuple(select), from_=from_, where=where, group_by=group_by,
            having=having, order_by=order_by, offset=offset, limit=limit,
            distinct=distinct, group_mode=group_mode,
            grouping_sets=grouping_sets,
        )

    def _peek_word_paren(self, word: str) -> bool:
        t, n = self.peek(), self.peek(1)
        return (
            t.kind == "ident"
            and t.text.lower() == word
            and n.kind == "symbol"
            and n.text == "("
        )

    def _parse_paren_expr_list(self) -> list:
        self.expect("symbol", "(")
        exprs = [self.parse_expr()]
        while self.accept("symbol", ","):
            exprs.append(self.parse_expr())
        self.expect("symbol", ")")
        return exprs

    def _parse_grouping_sets(self):
        """GROUPING SETS ( <set> [, <set>]... ) where <set> is `(e, ...)`,
        `()` (the grand total), or a bare expression. Returns (group_by,
        set index tuples): group_by is the distinct union of every set's
        expressions in first-appearance order; each set becomes a tuple
        of indexes into it (the ast.Select contract)."""
        self.expect("symbol", "(")
        union: list = []
        sets: list[tuple[int, ...]] = []

        def index_of(e) -> int:
            for i, u in enumerate(union):
                if u == e:
                    return i
            union.append(e)
            return len(union) - 1

        while True:
            if self.peek().kind == "symbol" and self.peek().text == "(":
                self.next()
                members: list = []
                if not (self.peek().kind == "symbol" and self.peek().text == ")"):
                    members.append(self.parse_expr())
                    while self.accept("symbol", ","):
                        members.append(self.parse_expr())
                self.expect("symbol", ")")
            else:
                members = [self.parse_expr()]
            sets.append(tuple(index_of(e) for e in members))
            if not self.accept("symbol", ","):
                break
        self.expect("symbol", ")")
        return tuple(union), tuple(sets)

    def parse_from_item(self) -> ast.FromItem:
        left: ast.FromItem = self.parse_table_ref()
        while True:
            jt = None
            if self.accept("keyword", "cross"):
                self.expect("keyword", "join")
                jt = ast.JoinType.CROSS
            elif self.accept("keyword", "inner"):
                self.expect("keyword", "join")
                jt = ast.JoinType.INNER
            elif self.accept("keyword", "left"):
                self.accept("keyword", "outer")
                self.expect("keyword", "join")
                jt = ast.JoinType.LEFT
            elif self.accept("keyword", "right"):
                self.accept("keyword", "outer")
                self.expect("keyword", "join")
                jt = ast.JoinType.RIGHT
            elif (
                self.peek().kind == "ident"
                and self.peek().text.lower() == "full"
                and (
                    (self.peek(1).kind == "keyword" and self.peek(1).text in ("outer", "join"))
                )
            ):
                self.next()
                self.accept("keyword", "outer")
                self.expect("keyword", "join")
                jt = ast.JoinType.FULL
            elif self.accept("keyword", "join"):
                jt = ast.JoinType.INNER
            else:
                return left
            right = self.parse_table_ref()
            predicate = None
            if jt != ast.JoinType.CROSS:
                self.expect("keyword", "on")
                predicate = self.parse_expr()
            left = ast.Join(left, right, jt, predicate)

    def parse_table_ref(self) -> "ast.FromItem":
        if self.peek().kind == "symbol" and self.peek().text == "(":
            # derived table: '(' query ')' alias (alias mandatory — standard
            # SQL; column references need a name to resolve against)
            self.next()
            query = self.parse_query()
            self.expect("symbol", ")")
            self.accept("keyword", "as")
            t = self.peek()
            if t.kind != "ident":
                raise ParseError(
                    f"derived table requires an alias — FROM (SELECT ...) AS name; found {t}"
                )
            return ast.DerivedTable(query=query, alias=self.next().text)
        name = self.expect("ident").text
        as_of = None
        if (
            self.peek().kind == "keyword"
            and self.peek().text == "as"
            and self.tokens[self.i + 1].kind == "keyword"
            and self.tokens[self.i + 1].text == "of"
        ):
            # FROM t AS OF SYSTEM TIME n — two-token lookahead keeps the
            # plain `t AS alias` form unambiguous
            self.next()
            self.next()
            self.expect("keyword", "system")
            self.expect("keyword", "time")
            as_of = int(self.expect("number").text)
        args: Optional[list[ast.Literal]] = None
        if self.peek().kind == "symbol" and self.peek().text == "(":
            # table-valued function: ident '(' literal, ... ')' (extension)
            self.next()
            args = []
            if not self.accept("symbol", ")"):
                while True:
                    e = self.parse_expr()
                    if not isinstance(e, ast.Literal):
                        raise ParseError(
                            f"table function {name} arguments must be literal "
                            "constants (a FROM-clause function materializes "
                            "before any row exists to reference)"
                        )
                    args.append(e)
                    if not self.accept("symbol", ","):
                        break
                self.expect("symbol", ")")
        alias = None
        if self.accept("keyword", "as"):
            alias = self.expect("ident").text
        elif self.peek().kind == "ident" and not (
            # `t FULL [OUTER] JOIN ...`: FULL introduces a join, not an
            # implicit alias (FULL is contextual — `t full` with no JOIN
            # after it still aliases; same treatment other dialects give)
            self.peek().text.lower() == "full"
            and self.peek(1).kind == "keyword"
            and self.peek(1).text in ("outer", "join")
        ):
            alias = self.next().text
        if args is not None:
            if as_of is not None:
                raise ParseError("AS OF SYSTEM TIME applies to tables, not table functions")
            return ast.TableFunc(name=name, args=tuple(args), alias=alias)
        return ast.TableRef(name=name, alias=alias, as_of=as_of)

    # ---- expressions (precedence climbing) --------------------------------

    def parse_expr(self, min_prec: int = 1) -> ast.Expr:
        lhs = self.parse_prefix()
        while True:
            lhs2 = self.parse_postfix(lhs)
            if lhs2 is not lhs:
                lhs = lhs2
                continue
            t = self.peek()
            key = t.text if t.kind in ("symbol", "keyword") else None
            if key not in _INFIX:
                return lhs
            prec, right_assoc, op = _INFIX[key]
            if prec < min_prec:
                return lhs
            self.next()
            rhs = self.parse_expr(prec if right_assoc else prec + 1)
            lhs = ast.Op(op, (lhs, rhs))

    def parse_prefix(self) -> ast.Expr:
        if self.accept("keyword", "exists"):
            self.expect("symbol", "(")
            sub = ast.Subquery(self.parse_select())
            self.expect("symbol", ")")
            return ast.Op("EXISTS", (sub,))
        if self.accept("keyword", "not"):
            # NOT binds tighter than AND/OR, looser than comparisons
            return ast.Op("NOT", (self.parse_expr(4),))
        if self.accept("symbol", "-"):
            return ast.Op("NEG", (self.parse_expr(8),))
        if self.accept("symbol", "+"):
            return ast.Op("POS", (self.parse_expr(8),))
        return self.parse_atom()

    def parse_postfix(self, lhs: ast.Expr) -> ast.Expr:
        if self.accept("symbol", "!"):
            return ast.Op("FACTORIAL", (lhs,))
        save = self.i
        if self.accept("keyword", "is"):
            negate = self.accept("keyword", "not") is not None
            if self.accept("keyword", "null"):
                e = ast.Op("IS_NULL", (lhs,))
                return ast.Op("NOT", (e,)) if negate else e
            self.i = save  # not IS [NOT] NULL → rewind
        # [NOT] IN (v1, v2, ...) — extension (the reference lacks IN; its
        # optimizer only synthesizes OR-chains, expression.rs:466-517)
        save = self.i
        negate = self.accept("keyword", "not") is not None
        if self.accept("keyword", "between"):
            # [NOT] BETWEEN lo AND hi — extension; desugared to the
            # conjunction. Operands parse at additive precedence so the
            # separating AND is never consumed as the logical operator.
            lo = self.parse_expr(5)
            self.expect("keyword", "and")
            hi = self.parse_expr(5)
            e = ast.Op("AND", (ast.Op("GTE", (lhs, lo)), ast.Op("LTE", (lhs, hi))))
            return ast.Op("NOT", (e,)) if negate else e
        if self.accept("keyword", "in"):
            self.expect("symbol", "(")
            if self.peek().kind == "keyword" and self.peek().text == "select":
                sub = ast.Subquery(self.parse_select())
                self.expect("symbol", ")")
                e: ast.Expr = ast.Op("IN_SUBQ", (lhs, sub))
            else:
                items = [self.parse_expr()]
                while self.accept("symbol", ","):
                    items.append(self.parse_expr())
                self.expect("symbol", ")")
                e = ast.Op("IN", (lhs, *items))
            return ast.Op("NOT", (e,)) if negate else e
        self.i = save
        return lhs

    def parse_atom(self) -> ast.Expr:
        t = self.peek()
        if t.kind == "number":
            self.next()
            text = t.text
            if "." in text or "e" in text or "E" in text:
                return ast.Literal(float(text))
            return ast.Literal(int(text))
        if t.kind == "string":
            self.next()
            return ast.Literal(t.text)
        if t.kind == "keyword":
            if self.accept("keyword", "true"):
                return ast.Literal(True)
            if self.accept("keyword", "false"):
                return ast.Literal(False)
            if self.accept("keyword", "null"):
                return ast.Literal(None)
            if self.accept("keyword", "infinity"):
                return ast.Literal(float("inf"))
            if self.accept("keyword", "nan"):
                return ast.Literal(float("nan"))
            if self.accept("keyword", "case"):
                return self.parse_case()
            if (
                t.text in ("left", "right")
                and self.tokens[self.i + 1].kind == "symbol"
                and self.tokens[self.i + 1].text == "("
            ):
                # left(s, n) / right(s, n) string functions — the words are
                # reserved for join syntax, but a directly following '('
                # can only be a call (joins spell LEFT/RIGHT [OUTER] JOIN)
                self.next()
                self.next()
                args = [self.parse_expr()]
                while self.accept("symbol", ","):
                    args.append(self.parse_expr())
                self.expect("symbol", ")")
                return ast.FuncCall(t.text, tuple(args))
            raise ParseError(f"unexpected keyword {t}")
        if t.kind == "ident":
            self.next()
            # DATE '...' / TIMESTAMP '...' typed literals (extension) —
            # only when directly followed by a string token, so `date` as a
            # plain column name keeps working.
            if t.text.lower() in ("date", "timestamp") and self.peek().kind == "string":
                s = self.next().text
                import datetime as _dt

                try:
                    if t.text.lower() == "date":
                        return ast.Literal(_dt.date.fromisoformat(s))
                    return ast.Literal(_dt.datetime.fromisoformat(s))
                except ValueError as ex:
                    raise ParseError(f"invalid {t.text.lower()} literal {s!r}") from ex
            if self.accept("symbol", "("):
                # function call; COUNT(*) → count(TRUE) (parser/mod.rs:540-543)
                if self.accept("symbol", "*"):
                    self.expect("symbol", ")")
                    return ast.FuncCall(t.text.lower(), (ast.Literal(True),), star=True)
                distinct = self.accept("keyword", "distinct") is not None
                args = []
                if not self.accept("symbol", ")"):
                    while True:
                        args.append(self.parse_expr())
                        if not self.accept("symbol", ","):
                            break
                    self.expect("symbol", ")")
                call = ast.FuncCall(t.text.lower(), tuple(args), distinct=distinct)
                if self.accept("keyword", "over"):
                    return self.parse_window(call)
                return call
            if self.accept("symbol", "."):
                col = self.expect("ident").text
                return ast.Field(name=col, table=t.text)
            return ast.Field(name=t.text)
        if self.accept("symbol", "("):
            if self.peek().kind == "keyword" and self.peek().text == "select":
                sub = ast.Subquery(self.parse_select())
                self.expect("symbol", ")")
                return sub  # scalar subquery
            e = self.parse_expr()
            self.expect("symbol", ")")
            return e
        raise ParseError(f"unexpected token {t}")

    def parse_window(self, call: ast.FuncCall) -> ast.Expr:
        """OVER ( [PARTITION BY e, ...] [ORDER BY item, ...]
        [ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW] ) — extension."""
        self.expect("symbol", "(")
        partition: list = []
        if self.accept("keyword", "partition"):
            self.expect("keyword", "by")
            partition.append(self.parse_expr())
            while self.accept("symbol", ","):
                partition.append(self.parse_expr())
        order: list = []
        if self.accept("keyword", "order"):
            self.expect("keyword", "by")
            while True:
                e = self.parse_expr()
                desc = False
                if self.accept("keyword", "desc"):
                    desc = True
                else:
                    self.accept("keyword", "asc")
                order.append(ast.OrderItem(e, desc))
                if not self.accept("symbol", ","):
                    break
        frame = None
        if self.accept("keyword", "rows"):
            self.expect("keyword", "between")
            self.expect("keyword", "unbounded")
            self.expect("keyword", "preceding")
            self.expect("keyword", "and")
            self.expect("keyword", "current")
            self.expect("keyword", "row")
            frame = "rows_unbounded_current"
        self.expect("symbol", ")")
        if call.distinct:
            raise ParseError("DISTINCT is not supported in window functions")
        return ast.WindowFunc(
            name=call.name,
            args=call.args if not call.star else (ast.Literal(True),),
            partition_by=tuple(partition),
            order_by=tuple(order),
            frame=frame,
        )

    def parse_case(self) -> ast.Expr:
        """CASE WHEN cond THEN val [...] [ELSE val] END (extension).
        Encoded as Op("CASE", (c1, v1, c2, v2, ..., else_val))."""
        parts: list[ast.Expr] = []
        while self.accept("keyword", "when"):
            parts.append(self.parse_expr())
            self.expect("keyword", "then")
            parts.append(self.parse_expr())
        if not parts:
            raise ParseError("CASE requires at least one WHEN branch")
        if self.accept("keyword", "else"):
            parts.append(self.parse_expr())
        else:
            parts.append(ast.Literal(None))
        self.expect("keyword", "end")
        return ast.Op("CASE", tuple(parts))


def parse(sql: str) -> ast.Statement:
    return Parser(sql).parse()
