"""Numeric helpers with engine-portable semantics.

``r4`` exists because Spark's ROUND and DuckDB's ROUND disagree on doubles:
Spark rounds the shortest decimal representation (BigDecimal.valueOf →
HALF_UP), DuckDB rounds the true binary value — e.g. the double nearest
1132.17025 rounds to .1703 in Spark and .1702 in DuckDB. The explicit
``floor(x·10⁴ + 0.5)/10⁴`` formula is pure IEEE-double arithmetic, so both
engines compute bit-identical results (oracle side is expanded to the same
formula by registry._expand_r4). Valid for |x| < 2^53/10⁴ ≈ 9e11 — ample
for every rounded metric in the workload.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

R4_SQL = "floor(({expr}) * 10000 + 0.5) / 10000"


def r4(c: Column) -> Column:
    """Deterministic half-up rounding to 4 decimal places (see module doc)."""
    return (F.floor(c * 10000 + F.lit(0.5)) / 10000).cast("double")


def r6(c: Column) -> Column:
    """Deterministic half-up rounding to 6 decimal places — same formula as
    r4 at a finer grain. Used where an INTERMEDIATE float must land on a
    cross-engine-stable grid (e.g. Lloyd-refined centroid components,
    where distributed summation order perturbs the mean at ~1e-16 and the
    oracle must re-derive the identical centroid). Valid for |x| <
    2^53/10⁶ ≈ 9e9."""
    return (F.floor(c * 1000000 + F.lit(0.5)) / 1000000).cast("double")
