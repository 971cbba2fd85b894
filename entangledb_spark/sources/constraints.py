"""Constraint enforcement as distributed validation passes.

The reference validates row-at-a-time on every write
(/root/reference/src/sql/schema.rs:184-272: NOT NULL, DEFAULT typing,
1024-byte strings, UNIQUE via full scan, FK existence; delete-side FK via
reverse index scan, engine/kv.rs:157-176). Spark has no built-in
constraints, so the writer path runs these as set-oriented jobs over the
candidate table state — each check is a single aggregation or anti-join,
which is both correct under concurrency (checks run against the exact
snapshot being published) and scales to any table size:

- NOT NULL + string length: one aggregate pass over all columns at once;
- PRIMARY KEY / UNIQUE: groupBy(key) HAVING count>1 (NULLs exempt for
  UNIQUE, forbidden for PK);
- FOREIGN KEY: distinct referenced values anti-joined against the target
  PK snapshot (NaN skips the check, schema.rs:248);
- delete-side FK: remaining referencing values anti-joined against the
  remaining target keys — self-references that die with the delete pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_STRING_BYTES = 1024  # schema.rs:238-240


class ConstraintError(ValueError):
    pass


def check_not_null_and_length(name: str, df: DataFrame, columns: list[dict]) -> None:
    aggs = []
    for c in columns:
        if not c["nullable"]:
            aggs.append(
                F.count(F.when(F.col(c["name"]).isNull(), 1)).alias(f"null__{c['name']}")
            )
        if c["datatype"] == "STRING":
            aggs.append(F.max(F.octet_length(c["name"])).alias(f"len__{c['name']}"))
    if not aggs:
        return
    row = df.agg(*aggs).first().asDict()
    for k, v in row.items():
        kind, col = k.split("__", 1)
        if kind == "null" and v:
            raise ConstraintError(f"NULL value not allowed for column {col} in table {name}")
        if kind == "len" and v is not None and v > MAX_STRING_BYTES:
            raise ConstraintError(
                f"string value in column {col} of table {name} exceeds {MAX_STRING_BYTES} bytes"
            )


def check_unique(name: str, df: DataFrame, columns: list[dict]) -> None:
    """One aggregate job for ALL unique/PK columns: a column has duplicates
    iff count(col) > count(DISTINCT col) (both skip NULLs — NULLs are
    exempt for UNIQUE, caught by NOT NULL for PKs). Only on failure does a
    second (per-failing-column) job run to name the duplicate value."""
    unique_cols = [c for c in columns if c["primary_key"] or c["unique"]]
    if not unique_cols:
        return
    aggs = []
    for c in unique_cols:
        col = F.col(c["name"])
        aggs.append(F.count(col).alias(f"n__{c['name']}"))
        aggs.append(F.count_distinct(col).alias(f"d__{c['name']}"))
    row = df.agg(*aggs).first().asDict()
    for c in unique_cols:
        if row[f"n__{c['name']}"] > row[f"d__{c['name']}"]:
            col = F.col(c["name"])
            dupes = (
                df.filter(col.isNotNull())
                .groupBy(col)
                .count()
                .filter(F.col("count") > 1)
                .limit(1)
                .collect()
            )
            label = "primary key" if c["primary_key"] else "unique value"
            raise ConstraintError(
                f"duplicate {label} {dupes[0][0]!r} for column {c['name']} in table {name}"
            )


def check_foreign_keys(
    name: str,
    df: DataFrame,
    columns: list[dict],
    target_df_and_pk,
) -> None:
    """`target_df_and_pk(table) -> (DataFrame, pk_col)` within the pending
    snapshot. NaN reference values skip the check (schema.rs:248)."""
    for c in columns:
        if c["references"] is None:
            continue
        tdf, pk = target_df_and_pk(c["references"])
        vals = df.select(F.col(c["name"]).alias("__v")).filter(F.col("__v").isNotNull())
        if c["datatype"] == "FLOAT":
            vals = vals.filter(~F.isnan("__v"))
        missing = (
            vals.distinct()
            .join(tdf.select(F.col(pk).alias("__v")), on="__v", how="left_anti")
            .limit(1)
            .collect()
        )
        if missing:
            raise ConstraintError(
                f"referenced primary key {missing[0][0]!r} in table "
                f"{c['references']} does not exist (column {c['name']} of {name})"
            )


def check_delete_references(
    deleted_table: str,
    remaining_target: DataFrame,
    target_pk: str,
    referencing: list[tuple[str, str, DataFrame]],
) -> None:
    """After a delete, no surviving row anywhere may reference a removed key.
    `referencing` = [(table, fk_column, candidate DataFrame), ...] for every
    table whose schema references `deleted_table` (including itself)."""
    target_keys = remaining_target.select(F.col(target_pk).alias("__v"))
    for rtable, rcol, rdf in referencing:
        vals = rdf.select(F.col(rcol).alias("__v")).filter(F.col("__v").isNotNull())
        orphan = vals.join(target_keys, on="__v", how="left_anti").limit(1).collect()
        if orphan:
            raise ConstraintError(
                f"primary key {orphan[0][0]!r} referenced by table {rtable} "
                f"(column {rcol}) cannot be removed from {deleted_table}"
            )
