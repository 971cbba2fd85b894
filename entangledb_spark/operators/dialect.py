"""Dialect-engine queries in the correctness gate.

These entries execute entangleDB SQL text through the full front-end
(lexer → parser → AST → DataFrame compiler) against the fixture tables,
and are hash-compared against DuckDB oracles by the driver — proving the
dialect engine end-to-end, not just the hand-built DataFrame queries.

Float caution: only exact aggregates are exposed here (counts, min/max,
sums of integral-valued doubles — exact in IEEE754, hence summation-order
independent). Non-integral double sums live in the relational module where
both sides round via the shared r4 formula.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from entangledb_spark.plans import ast
from entangledb_spark.plans.compiler import compile_statement
from entangledb_spark.plans.parser import parse
from entangledb_spark.registry import query, table


def _read_dialect(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Fixture reader for the dialect engine: integer columns are upcast to
    long because the reference's INTEGER is i64 (types/mod.rs:36); this also
    keeps computed-int schema widths identical to the DuckDB oracle."""
    df = table(spark, sf_dir, name)
    casts = [
        (F.col(c).cast("long").alias(c) if t in ("int", "smallint", "tinyint") else F.col(c))
        for c, t in df.dtypes
    ]
    return df.select(*casts)


# Statement-plan cache for the READ-ONLY dialect gate queries (round 12,
# guide §5): the same SQL text recompiled per rep costs a full
# lexer→parser→compiler pass plus ~180 py4j round-trips of DataFrame
# assembly — a classic prepared-statement plan cache removes it. Keyed by
# (sql, sf_dir, session, per-table mtimes): a rewritten fixture or a new
# SparkSession recompiles, so the cached plan can never scan a stale file
# listing. This caches the PLAN only — every execution re-reads the
# parquet inputs (the cached DataFrame is lazy; each action re-runs the
# scan). DML/DDL and the engine session surface are untouched — this path
# serves the registry's SELECT-only dialect entries.
_PLAN_CACHE: dict = {}


def _catalog_state(sf_dir: str) -> tuple:
    import os

    from entangledb_spark.session import TABLE_NAMES

    out = []
    for n in TABLE_NAMES:
        p = os.path.join(sf_dir, f"{n}.parquet")
        try:
            out.append((n, os.path.getmtime(p)))
        except OSError:
            continue
    return tuple(out)


def _run(sql: str, spark: SparkSession, sf_dir: str) -> DataFrame:
    # the session object itself keys the cache (identity semantics — a
    # stopped/recreated session is a different object, so cached plans
    # can never outlive their gateway)
    key = (sql, sf_dir, spark, _catalog_state(sf_dir))
    df = _PLAN_CACHE.get(key)
    if df is not None:
        return df
    stmt = parse(sql)
    assert isinstance(stmt, (ast.Select, ast.SetOp, ast.With))
    df = compile_statement(
        stmt, spark, lambda name: _read_dialect(spark, sf_dir, name)
    )
    _PLAN_CACHE[key] = df
    return df


def dialect(name: str, sql: str, oracle: str):
    @query(name, oracle=oracle)
    def fn(spark: SparkSession, sf_dir: str, _sql=sql) -> DataFrame:
        return _run(_sql, spark, sf_dir)

    fn.__name__ = name
    fn.__doc__ = f"Dialect-engine execution of: {sql.strip()}"
    return fn


# Filter + aggregation (count/sum/min/max) + GROUP BY expression + ORDER BY
# through the dialect front-end in one statement (merged q32+q38 shapes:
# filter-agg on a predicate + the group-by-select-alias resolution form).
dialect(
    "q32_dialect_filter_agg",
    """
    SELECT p_size / 10 AS size_bucket, count(*) AS n, sum(p_size) AS sum_size,
           min(p_retailprice) AS lo, max(p_retailprice) AS hi
    FROM part WHERE p_size < 47 GROUP BY size_bucket ORDER BY size_bucket
    """,
    oracle="""
    SELECT CAST(p_size // 10 AS BIGINT) AS size_bucket, count(*) AS n,
           CAST(sum(p_size) AS BIGINT) AS sum_size,
           min(p_retailprice) AS lo, max(p_retailprice) AS hi
    FROM part WHERE p_size < 47 GROUP BY 1 ORDER BY 1
    """,
)

# Same result set as the pre-round-9 plain-join spelling (hash-stable),
# re-spelled through a CTE and a derived table so the driver gate
# exercises WITH + FROM-subquery compilation every round.
dialect(
    "q33_dialect_join_topk",
    """
    WITH bldg AS (
      SELECT c_custkey, c_name FROM customer WHERE c_mktsegment = 'BUILDING'
    )
    SELECT o.o_orderkey, c.c_name, o.o_totalprice
    FROM (SELECT o_orderkey, o_custkey, o_totalprice FROM orders) AS o
    JOIN bldg c ON o.o_custkey = c.c_custkey
    ORDER BY o.o_totalprice DESC, o.o_orderkey LIMIT 25
    """,
    oracle="""
    WITH bldg AS (
      SELECT c_custkey, c_name FROM customer WHERE c_mktsegment = 'BUILDING'
    )
    SELECT o.o_orderkey, c.c_name, o.o_totalprice
    FROM (SELECT o_orderkey, o_custkey, o_totalprice FROM orders) AS o
    JOIN bldg c ON o.o_custkey = c.c_custkey
    ORDER BY o.o_totalprice DESC, o.o_orderkey LIMIT 25
    """,
)

# Expression + scalar-function surface through the dialect in one projection
# (merged q34+q39 shapes: arithmetic/factorial/boolean exprs + CASE, IN,
# coalesce/nullif, upper, abs, substr).
dialect(
    "q34_dialect_expressions",
    """
    SELECT p_partkey, p_size * 2 + 1 AS dbl, p_size / 3 AS third,
           p_size % 5 AS m5, (p_size % 6)! AS fact,
           (p_size % 4) ^ 3 AS pow_int,
           2 ^ (-(p_size % 3)) AS pow_neg,
           -p_size AS neg_size,
           +p_size AS pos_size,
           p_size > 25 AND p_size < 40 AS in_range,
           p_name LIKE 'p%' OR p_brand = 'Brand#13' AS matched,
           upper(p_brand) AS brand_u,
           CASE WHEN p_size IN (1, 2, 3, 4, 5) THEN 'tiny'
                WHEN p_size < 25 THEN 'small'
                ELSE 'large' END AS size_class,
           coalesce(nullif(p_type, 'PROMO'), 'STANDARD') AS type_norm,
           abs(p_size - 25) AS dist_from_mid,
           substr(p_name, 1, 4) AS prefix,
           replace(p_type, 'PROMO', 'P') AS rep,
           split_part(p_type, ' ', 2) AS sp,
           lpad(substr(p_name, 1, 3), 6, '.') AS lp,
           rpad(substr(p_name, 1, 3), 6, '.') AS rp,
           left(p_name, 3) AS l3, right(p_name, 3) AS r3,
           reverse(p_brand) AS rev,
           strpos(p_name, 'a') AS pos,
           contains(p_name, 'an') AS has_an,
           starts_with(p_type, 'PROMO') AS sw,
           ends_with(p_name, 'e') AS ew,
           ltrim(lpad(substr(p_name, 1, 3), 6, ' ')) AS lt,
           rtrim(rpad(substr(p_name, 1, 3), 6, ' ')) AS rt,
           repeat(substr(p_brand, 1, 2), 2) AS rpt,
           md5(p_brand) AS h,
           regexp_extract(p_name, '([a-z]+) ([a-z]+)', 2) AS rex,
           sign(p_size - 25) AS sg,
           log2(2 ^ (p_size % 5 + 1)) AS lg2,
           log10(10 ^ (p_size % 3 + 1)) AS lg10
    FROM part WHERE p_partkey <= 500
    """,
    oracle="""
    SELECT p_partkey, CAST(p_size * 2 + 1 AS BIGINT) AS dbl,
           CAST(p_size // 3 AS BIGINT) AS third,
           CAST(p_size % 5 AS BIGINT) AS m5,
           CAST(factorial(p_size % 6) AS BIGINT) AS fact,
           CAST((p_size % 4) ^ 3 AS BIGINT) AS pow_int,
           CAST(2 ^ (-(p_size % 3)) AS DOUBLE) AS pow_neg,
           CAST(-p_size AS BIGINT) AS neg_size,
           CAST(p_size AS BIGINT) AS pos_size,
           (p_size > 25 AND p_size < 40) AS in_range,
           (p_name LIKE 'p%' OR p_brand = 'Brand#13') AS matched,
           upper(p_brand) AS brand_u,
           CASE WHEN p_size IN (1, 2, 3, 4, 5) THEN 'tiny'
                WHEN p_size < 25 THEN 'small'
                ELSE 'large' END AS size_class,
           coalesce(nullif(p_type, 'PROMO'), 'STANDARD') AS type_norm,
           CAST(abs(p_size - 25) AS BIGINT) AS dist_from_mid,
           substr(p_name, 1, 4) AS prefix,
           replace(p_type, 'PROMO', 'P') AS rep,
           split_part(p_type, ' ', 2) AS sp,
           lpad(substr(p_name, 1, 3), 6, '.') AS lp,
           rpad(substr(p_name, 1, 3), 6, '.') AS rp,
           left(p_name, 3) AS l3, right(p_name, 3) AS r3,
           reverse(p_brand) AS rev,
           CAST(strpos(p_name, 'a') AS BIGINT) AS pos,
           contains(p_name, 'an') AS has_an,
           starts_with(p_type, 'PROMO') AS sw,
           ends_with(p_name, 'e') AS ew,
           ltrim(lpad(substr(p_name, 1, 3), 6, ' ')) AS lt,
           rtrim(rpad(substr(p_name, 1, 3), 6, ' ')) AS rt,
           repeat(substr(p_brand, 1, 2), 2) AS rpt,
           md5(p_brand) AS h,
           regexp_extract(p_name, '([a-z]+) ([a-z]+)', 2) AS rex,
           CAST(sign(p_size - 25) AS BIGINT) AS sg,
           log2(2 ^ (p_size % 5 + 1)) AS lg2,
           log10(10 ^ (p_size % 3 + 1)) AS lg10
    FROM part WHERE p_partkey <= 500
    """,
)

# Round 11: the decorrelation surface rides this gate too — the second
# UNION arm computes a correlated scalar COUNT subquery in the select
# list (empty group → 0) and a correlated EXISTS inside an OR (the
# non-conjunct position), both compiled as decorrelated LEFT joins
# (plans/compiler._decorrelate) and hash-certified against DuckDB on
# identical SQL. Off-headline: zero bench cost.
dialect(
    "q35_dialect_having_hidden",
    """
    SELECT n_name, count(*) AS n_customers
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    HAVING count(*) > 2
    UNION ALL
    SELECT c_name AS n_name,
           (SELECT count(*) FROM orders WHERE o_custkey = c_custkey) AS n_customers
    FROM customer
    WHERE c_custkey <= 20
      AND (c_acctbal < 0 OR
           EXISTS (SELECT 1 FROM orders
                   WHERE o_custkey = c_custkey AND o_totalprice > 150000))
    """,
    oracle="""
    SELECT n_name, count(*) AS n_customers
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name HAVING count(*) > 2
    UNION ALL
    SELECT c_name AS n_name,
           (SELECT count(*) FROM orders WHERE o_custkey = c_custkey) AS n_customers
    FROM customer
    WHERE c_custkey <= 20
      AND (c_acctbal < 0 OR
           EXISTS (SELECT 1 FROM orders
                   WHERE o_custkey = c_custkey AND o_totalprice > 150000))
    """,
)

# LEFT and RIGHT outer joins through the dialect, tagged and unioned in a
# single statement (merged q36+q37 shapes) — also exercises the dialect's
# set-operation chaining between two grouped SELECTs with HAVING/WHERE.
dialect(
    "q36_dialect_outer_joins",
    """
    SELECT 'left' AS side, c.c_custkey AS k, count(o.o_orderkey) AS n
    FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey
    HAVING count(o.o_orderkey) = 0
    UNION ALL
    SELECT 'right' AS side, r.r_regionkey AS k, count(n.n_nationkey) AS n
    FROM nation n RIGHT JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA' OR r.r_name = 'EUROPE'
    GROUP BY r.r_regionkey
    """,
    oracle="""
    SELECT 'left' AS side, CAST(c.c_custkey AS BIGINT) AS k,
           count(o.o_orderkey) AS n
    FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey HAVING count(o.o_orderkey) = 0
    UNION ALL
    SELECT 'right' AS side, CAST(r.r_regionkey AS BIGINT) AS k,
           count(n.n_nationkey) AS n
    FROM nation n RIGHT JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA' OR r.r_name = 'EUROPE'
    GROUP BY r.r_regionkey
    """,
)


# Round-10: the round-9 window additions (ntile/percent_rank/cume_dist/
# first_value/last_value) ride the SAME gate query, so the driver's hash
# certifies them, not just the pytest parity tests. percent_rank and
# cume_dist are small-integer ratios ((rank-1)/(n-1), rank/n) — bit-exact
# on both engines, no rounding needed.
dialect(
    "q59_dialect_window",
    """
    SELECT o_custkey, o_orderkey,
           row_number() OVER (PARTITION BY o_custkey
                              ORDER BY o_totalprice DESC, o_orderkey) AS rn,
           lag(o_orderkey) OVER (PARTITION BY o_custkey
                                 ORDER BY o_totalprice DESC, o_orderkey) AS prev_ok,
           ntile(4) OVER (PARTITION BY o_custkey
                          ORDER BY o_totalprice DESC, o_orderkey) AS nt,
           percent_rank() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS pr,
           cume_dist() OVER (PARTITION BY o_custkey
                             ORDER BY o_totalprice DESC, o_orderkey) AS cd,
           first_value(o_orderkey) OVER (PARTITION BY o_custkey
                                         ORDER BY o_totalprice DESC, o_orderkey) AS fv,
           last_value(o_orderkey) OVER (PARTITION BY o_custkey
                                        ORDER BY o_totalprice DESC, o_orderkey) AS lv
    FROM orders WHERE o_custkey < 100
    """,
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(row_number() OVER (PARTITION BY o_custkey
                                   ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn,
           lag(o_orderkey) OVER (PARTITION BY o_custkey
                                 ORDER BY o_totalprice DESC, o_orderkey) AS prev_ok,
           CAST(ntile(4) OVER (PARTITION BY o_custkey
                               ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS nt,
           percent_rank() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS pr,
           cume_dist() OVER (PARTITION BY o_custkey
                             ORDER BY o_totalprice DESC, o_orderkey) AS cd,
           first_value(o_orderkey) OVER (PARTITION BY o_custkey
                                         ORDER BY o_totalprice DESC, o_orderkey) AS fv,
           last_value(o_orderkey) OVER (PARTITION BY o_custkey
                                        ORDER BY o_totalprice DESC, o_orderkey) AS lv
    FROM orders WHERE o_custkey < 100
    """,
)
