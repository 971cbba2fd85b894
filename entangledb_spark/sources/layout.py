"""Z-order data layout for multi-dimensional pruning (OPTIMIZE ZORDER).

Parquet scans prune on per-file / per-row-group min-max statistics, which
only bite when values are CLUSTERED: a table written in arrival order has
every file spanning nearly the full value range of every column, so a
selective predicate still reads everything. Sorting by one column fixes
that column and ruins the others; the Z-order (Morton) curve interleaves
the bits of ALL clustering keys so each output file covers a small
hyper-rectangle of the key space — a predicate on ANY subset of the keys
skips most files. This is Delta Lake's OPTIMIZE ZORDER contract, built
Spark-first:

1. each key column is rank-normalized to an equi-depth bucket id —
   numerics via ONE approxQuantile pass (Greenwald-Khanna, no sort;
   equi-depth is what makes skewed columns cluster as well as uniform
   ones); non-orderable-in-quantiles types (strings, booleans) with
   ≤ 2^bits distinct values get EXACT sorted-rank buckets scaled across
   the bucket range (one bounded distinct collect — true range
   locality for categorical keys, round 10), higher-NDV ones a uniform
   hash (equality predicates still cluster; range locality is not
   promised for them, and the docstring says so);
2. bucket bits interleave arithmetically into one long `z` —
   whole-stage-codegen'd shifts, no UDF;
3. `repartitionByRange(n_files, z)` + `sortWithinPartitions(z)` gives
   each output file a contiguous z-range: ONE range-shuffle of the
   data, the minimum any clustering rewrite can pay.

The rewrite is point-in-time: later deltas append unclustered until the
next OPTIMIZE (the standard maintenance loop).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ZORDER_BITS = 8  # 256 equi-depth buckets per key column
TARGET_ROWS_PER_FILE = 1_000_000  # default file sizing for the rewrite

_NUMERIC = {"bigint", "int", "smallint", "tinyint", "double", "float", "decimal"}


def _bucket_expr(df: DataFrame, col: str, bits: int) -> Column:
    """Equi-depth bucket id (0 .. 2^bits - 1) for one key column. NULLs
    take bucket 0 (they cluster together, exactly what pruning wants)."""
    n = 1 << bits
    dtype = dict(df.dtypes)[col].split("(")[0]
    if dtype in _NUMERIC:
        probs = [i / n for i in range(1, n)]
        cuts = df.stat.approxQuantile(col, probs, 0.001)
        cuts = sorted(set(cuts))  # constant plateaus collapse to one cut
        arr = F.array(*[F.lit(float(c)) for c in cuts])
        bucket = F.size(F.filter(arr, lambda cut: F.col(col).cast("double") >= cut))
    else:
        # non-numeric keys have no quantile support. Low-NDV columns
        # (≤ 2^bits distinct values — the common categorical/tag case)
        # get EXACT sorted-rank buckets SCALED across the full bucket
        # range, so the value order survives into the interleave's HIGH
        # bits and min/max footer pruning truly works (a hash bucket
        # only ever gave equality locality, and whether a range
        # boundary separated two values was luck — round-10 fix). The
        # distinct probe is a bounded collect (≤ 2^bits + 1 rows — at
        # 100 TB that is one shuffle whose output fits a driver page).
        # High-NDV columns keep the uniform-hash fallback: equal values
        # share a bucket (equality pruning works); range locality is
        # not promised.
        # NULLs are excluded BEFORE the limit: they map to bucket 0 via
        # the coalesce regardless, so eligibility is decided on non-null
        # NDV — counting NULL against the budget made a key with exactly
        # 2^bits values plus NULLs silently lose exact-rank locality
        # (round-10 advice), and an over-limit probe that happened to
        # include NULL could truncate the value set nondeterministically.
        vals = sorted(
            r[0]
            for r in df.select(F.col(col).cast("string"))
            .where(F.col(col).isNotNull())
            .distinct()
            .limit(n + 1)
            .collect()
        )
        if vals and len(vals) <= n:
            width = max(len(vals) - 1, 1)
            expr = None
            for i, v in enumerate(vals):
                b = i * (n - 1) // width if len(vals) > 1 else 0
                cond = F.col(col).cast("string") == F.lit(v)
                expr = (
                    F.when(cond, F.lit(b))
                    if expr is None
                    else expr.when(cond, F.lit(b))
                )
            bucket = expr.otherwise(F.lit(0))
        else:
            bucket = F.pmod(F.crc32(F.col(col).cast("string")), F.lit(n))
    return F.coalesce(bucket.cast("long"), F.lit(0))


def zvalue(buckets: list[Column], bits: int = ZORDER_BITS) -> Column:
    """Morton interleave: bit b of bucket i lands at position b*ncols+i.
    Pure shifts and masks — stays inside whole-stage codegen.

    The interleave must fit a signed 64-bit long: bits*ncols <= 63, or
    the top shift amounts would wrap mod 64 (Java shiftleft semantics)
    and silently collide bits — clustering quality would degrade with no
    error (round-9 advice). Rejected loudly instead; with the default 8
    bits that caps ZORDER at 7 columns, which is also past the point
    where Morton locality stops paying (each extra column halves the
    per-column resolution of every prefix)."""
    ncols = len(buckets)
    if bits * ncols > 63:
        raise ValueError(
            f"zvalue: {ncols} columns x {bits} bits = {bits * ncols} "
            "interleaved bits exceeds the 63 a signed long can hold — "
            "ZORDER BY fewer columns (or lower ZORDER_BITS)"
        )
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, col in enumerate(buckets):
            bit = F.shiftright(col, b).bitwiseAND(F.lit(1))
            z = z + F.shiftleft(bit, b * ncols + i)
    return z


def zorder_frame(
    df: DataFrame,
    cols: list[str],
    n_files: int | None = None,
    bits: int = ZORDER_BITS,
) -> tuple[DataFrame, int]:
    """Return (clustered frame, file count): rows range-partitioned and
    sorted by the interleaved z-value of ``cols``. ``n_files`` defaults to
    row_count / TARGET_ROWS_PER_FILE (bounded) — one count job, then one
    range shuffle."""
    if not cols:
        raise ValueError("zorder_frame: at least one clustering column")
    if n_files is None:
        n_rows = df.count()
        n_files = max(1, min(4096, math.ceil(n_rows / TARGET_ROWS_PER_FILE)))
    z = zvalue([_bucket_expr(df, c, bits) for c in cols], bits)
    out = (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )
    return out, n_files
