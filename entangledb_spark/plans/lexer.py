"""Tokenizer for the entangleDB SQL dialect.

Token surface per /root/reference/src/sql/parser/lexer.rs: numbers, single-
quoted strings with '' escaping, identifiers/keywords (case-insensitive),
and the symbols  . = != <> > >= < <= + - * / % ^ ! ( ) , ;  plus the
keyword literals TRUE/FALSE/NULL/INFINITY/NAN. Implemented as a compiled
regex scanner — idiomatic Python, not a port.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Iterator


class LexError(ValueError):
    pass


# NOTE on reservations: only words that must be recognized at statement
# or clause heads are reserved (MERGE/COPY/USING/TO are reserved in
# PostgreSQL too). Words that merely introduce options inside an already
# -identified statement (MATCHED, ANALYZE, FORMAT, OVERWRITE, PARQUET,
# CSV) stay CONTEXTUAL — the parser matches them as bare identifiers
# (Parser.accept_word), so user columns may keep those names (q34's gate
# query aliases a column `matched`; reserving it broke the suite once).
KEYWORDS = {
    "all", "and", "as", "asc", "begin", "bool", "boolean", "by", "case", "char",
    "commit", "copy", "create", "cross", "default", "delete", "desc",
    "double",
    "distinct", "drop", "else", "end", "except", "exists", "explain", "false",
    "float", "from", "group",
    "having", "in", "index", "infinity", "inner", "insert", "int", "intersect",
    "integer", "into", "is", "join", "key", "left", "like", "limit",
    "merge", "nan",
    "not", "null", "of", "offset", "on", "only", "or", "order", "outer",
    "over",
    "partition", "preceding", "unbounded", "following", "between", "rows", "row", "current",
    "primary", "read", "references", "right", "rollback", "select", "set",
    "string", "system", "table", "text", "then", "time", "to", "transaction",
    "union",
    "true", "unique", "update", "using", "values", "varchar", "when", "where",
    "with", "write",
}

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<comment>--[^\n]*)
  | (?P<number>\d+(?:\.\d*)?(?:[eE][+-]?\d+)?|\.\d+)
  | (?P<string>'(?:[^']|'')*')
  | (?P<ident>[A-Za-z_][A-Za-z_0-9]*)
  | (?P<symbol>!=|<>|>=|<=|[.=<>+\-*/%^!(),;])
    """,
    re.VERBOSE,
)


@dataclass(frozen=True)
class Token:
    kind: str  # number | string | ident | keyword | symbol | eof
    text: str
    pos: int

    def __repr__(self) -> str:  # compact for parser error messages
        return f"{self.kind}:{self.text!r}@{self.pos}"


def tokenize(sql: str) -> Iterator[Token]:
    pos = 0
    while pos < len(sql):
        m = _TOKEN_RE.match(sql, pos)
        if not m:
            raise LexError(f"unexpected character {sql[pos]!r} at position {pos}")
        kind = m.lastgroup
        text = m.group()
        if kind not in ("ws", "comment"):
            if kind == "ident" and text.lower() in KEYWORDS:
                yield Token("keyword", text.lower(), pos)
            elif kind == "string":
                # strip quotes, collapse '' escapes
                yield Token("string", text[1:-1].replace("''", "'"), pos)
            else:
                yield Token(kind, text, pos)
        pos = m.end()
    yield Token("eof", "", pos)
