"""Core relational operators — the complete SURVEY.md §2 inventory, Spark-first.

Each query here exercises one (or a composition) of the reference's plan
nodes (/root/reference/src/sql/plan/mod.rs:51-127) re-expressed as declarative
DataFrame transformations. Catalyst supplies what the reference implements by
hand: predicate pushdown into the scan (engine/kv.rs:205-230 → Parquet
PushedFilters), index lookups (execution/source.rs:61-93 → isin + row-group
skipping), hash-join selection (plan/optimizer.rs:266-301 → broadcast /
shuffled-hash / sort-merge by stats), and constant folding.

Naming contract: every computed column is aliased identically here and in the
DuckDB oracle; float aggregates are rounded on both sides so parallel
summation order can't flip the value hash; computed integers are cast to
BIGINT on both sides so schema widths agree.

Scale notes are attached per query: which side broadcasts, where shuffles
land, and why the shape survives 1000 executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window
from pyspark.sql import functions as F

from entangledb_spark.functions.exprmemo import expr_template
from entangledb_spark.functions.numeric import r4
from entangledb_spark.registry import query, table

# ---------------------------------------------------------------------------
# Scan / Filter / Projection  (SURVEY §2.1-§2.2)
# ---------------------------------------------------------------------------


@query(
    "q01_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           r4(sum(l_quantity))                                        AS sum_qty,
           r4(sum(l_extendedprice))                                   AS sum_base_price,
           r4(sum(l_extendedprice * (1 - l_discount)))                AS sum_disc_price,
           r4(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)))  AS sum_charge,
           r4(avg(l_quantity))                                        AS avg_qty,
           r4(avg(l_extendedprice))                                   AS avg_price,
           r4(avg(l_discount))                                        AS avg_disc,
           count(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: TPC-H Q1 shape — Scan→Filter→Aggregation→(Order).

    Scale: single shuffle on a 6-value group key; partial aggregation
    (map-side combine) reduces each of the ~800k input partitions of a 100 TB
    lineitem to ≤6 rows before the exchange. Filter + column pruning reach
    the Parquet reader (PushedFilters: LessThanOrEqual(l_shipdate)).
    """
    l = table(spark, sf_dir, "lineitem")
    flt, aggs = _q01_templates()
    return l.filter(flt).groupBy("l_returnflag", "l_linestatus").agg(*aggs)


@expr_template
def _q01_templates() -> tuple:
    """Template: q01's shipdate filter + aggregate list (~250 py4j
    round-trips of fixed expression tree — built once per process)."""
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    flt = F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp")
    aggs = (
        r4(F.sum("l_quantity")).alias("sum_qty"),
        r4(F.sum("l_extendedprice")).alias("sum_base_price"),
        r4(F.sum(disc_price)).alias("sum_disc_price"),
        r4(F.sum(disc_price * (1 + F.col("l_tax")))).alias("sum_charge"),
        r4(F.avg("l_quantity")).alias("avg_qty"),
        r4(F.avg("l_extendedprice")).alias("avg_price"),
        r4(F.avg("l_discount")).alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )
    return flt, aggs


@query(
    "q02_scan_filter_project",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
    FROM lineitem WHERE l_quantity > 45 AND l_discount < 0.05
    """,
)
def q02_scan_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan + Filter + Projection nodes in one plan (plan/mod.rs:117-121,
    execution/query.rs:8-87). Both conjuncts reach the Parquet scan as
    PushedFilters; only 4 of 11 columns are read (ReadSchema pruning) —
    the plan shape every larger query builds on."""
    return (
        table(spark, sf_dir, "lineitem")
        .filter((F.col("l_quantity") > 45) & (F.col("l_discount") < 0.05))
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
    )


@query(
    "q04_lookups",
    oracle="""
    SELECT 'pk' AS kind, o_orderkey, o_custkey, o_totalprice FROM orders
    WHERE o_orderkey IN (1, 2, 3, 7, 32, 100, 101)
    UNION ALL
    SELECT 'idx' AS kind, o_orderkey, o_custkey, o_totalprice FROM orders
    WHERE o_orderpriority = '1-URGENT' AND o_orderkey <= 500
    """,
)
def q04_lookups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KeyLookup + IndexLookup nodes (execution/source.rs:31-93), tagged.

    'pk' branch: point lookups by primary key — Spark needs no index, the
    IN-list pushes to Parquet min/max row-group stats (the distributed
    analog of a PK point read). 'idx' branch: secondary-"index" probe on a
    non-key column — dictionary/stats-based row-group skipping at the scan
    (SURVEY §1.4 mapping). Both branches stay scan-local; the union is a
    no-shuffle concatenation."""
    o = table(spark, sf_dir, "orders")
    pk = o.filter(F.col("o_orderkey").isin(1, 2, 3, 7, 32, 100, 101)).select(
        F.lit("pk").alias("kind"), "o_orderkey", "o_custkey", "o_totalprice"
    )
    idx = o.filter(
        (F.col("o_orderpriority") == "1-URGENT") & (F.col("o_orderkey") <= 500)
    ).select(F.lit("idx").alias("kind"), "o_orderkey", "o_custkey", "o_totalprice")
    return pk.unionByName(idx)


# ---------------------------------------------------------------------------
# Expression language  (SURVEY §2.2, types/expression.rs)
# ---------------------------------------------------------------------------


@query(
    "q06_expr_suite",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           r4(l_extendedprice * (1 - l_discount))       AS net_price,
           r4(-l_discount)                              AS neg_disc,
           r4(l_quantity + l_tax * 10)                  AS q_plus,
           r4(l_extendedprice / (l_quantity + 1))       AS unit_ish,
           CAST(l_linenumber // 3 AS BIGINT)            AS int_div,
           CAST(CAST(l_quantity AS BIGINT) % 7 AS BIGINT) AS int_mod,
           CAST(pow(l_linenumber % 5 + 1, 3) AS BIGINT) AS cube_col,
           CAST(factorial(CAST(CAST(l_quantity AS BIGINT) % 6 AS INTEGER)) AS BIGINT) AS fact_col
    FROM lineitem WHERE l_orderkey <= 200
    """,
)
def q06_expr_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expression surface in one codegen'd projection (was q06+q07):

    - `+ - * /` float arithmetic and unary negate with NULL propagation
      (expression.rs:122-240);
    - truncating integer `/` (expression.rs:142-158, Integer/Integer→
      Integer — Spark `/` returns double, so the engine emits `div` for
      int/int, SURVEY §4.3) and `%` remainder (expression.rs:185-202);
    - `^` exponentiation (int^nonneg-int stays integral, expression.rs:
      159-176 — Spark's `^` is XOR, so the dialect compiles `^`→pow with
      an integral cast);
    - postfix `!` factorial (expression.rs:177-184, inputs kept ≤20,
      Spark's factorial domain).
    One narrow map over lineitem; zero shuffles."""
    l = table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 200)
    qint = F.col("l_quantity").cast("long")
    return l.select(
        "l_orderkey",
        "l_linenumber",
        r4(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net_price"),
        r4(-F.col("l_discount")).alias("neg_disc"),
        r4(F.col("l_quantity") + F.col("l_tax") * 10).alias("q_plus"),
        r4(F.col("l_extendedprice") / (F.col("l_quantity") + 1)).alias("unit_ish"),
        F.expr("l_linenumber div 3").cast("long").alias("int_div"),
        (qint % 7).cast("long").alias("int_mod"),
        F.pow(F.col("l_linenumber") % 5 + 1, F.lit(3)).cast("long").alias("cube_col"),
        F.factorial((qint % 6).cast("int")).cast("long").alias("fact_col"),
    )


@query(
    "q09_expr_predicates",
    oracle="""
    SELECT c_custkey,
           (c_name LIKE 'Customer#%')                     AS like_prefix,
           (c_name LIKE '_ustomer%1')                     AS like_mixed,
           (c_mktsegment LIKE '%ILD%')                    AS like_infix,
           (nullif(c_acctbal > 1000, false) AND c_acctbal > 0) AS and_col,
           (nullif(c_acctbal > 1000, false) OR  c_acctbal > 0) AS or_col,
           (NOT nullif(c_acctbal > 1000, false))          AS not_col,
           (nullif(c_acctbal > 1000, false) IS NULL)      AS isnull_col,
           (nullif(c_acctbal > 1000, false) IS NOT NULL)  AS isnotnull_col,
           (c_acctbal >  1000.0)                          AS gt_col,
           (c_acctbal <= 1000.0)                          AS le_col,
           (c_nationkey = 5)                              AS eq_col,
           (c_nationkey <> 5)                             AS ne_col,
           (c_name > c_mktsegment)                        AS str_cmp,
           (c_nationkey < c_acctbal)                      AS int_float_cmp
    FROM customer WHERE c_custkey <= 500
    """,
)
def q09_expr_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate expression surface in one projection:

    - LIKE with % and _ wildcards, anchored both ends (expression.rs:
      243-258; the reference's doubled-wildcard escapes %%→literal % are
      handled in the dialect translator, tested there).
    - 3-valued AND/OR/NOT truth tables (expression.rs:52-74) and IS [NOT]
      NULL (expression.rs:116-119): `nullif(c_acctbal>1000, false)`
      fabricates a TRUE/NULL column so `NULL AND true→NULL`,
      `NULL OR true→TRUE`, etc.
    - Comparisons (expression.rs:78-115): typed (in)equality, `>=`/`<=`
      desugaring (planner.rs:562-590), string lexicographic ordering, and
      int↔float cross-type numeric comparison.
    All codegen'd; zero shuffles."""
    c = table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 500)
    maybe = F.expr("nullif(c_acctbal > 1000, false)")
    b = F.col("c_acctbal") > 0
    return c.select(
        "c_custkey",
        F.col("c_name").like("Customer#%").alias("like_prefix"),
        F.col("c_name").like("_ustomer%1").alias("like_mixed"),
        F.col("c_mktsegment").like("%ILD%").alias("like_infix"),
        (maybe & b).alias("and_col"),
        (maybe | b).alias("or_col"),
        (~maybe).alias("not_col"),
        maybe.isNull().alias("isnull_col"),
        maybe.isNotNull().alias("isnotnull_col"),
        (F.col("c_acctbal") > 1000.0).alias("gt_col"),
        (F.col("c_acctbal") <= 1000.0).alias("le_col"),
        (F.col("c_nationkey") == 5).alias("eq_col"),
        (F.col("c_nationkey") != 5).alias("ne_col"),
        (F.col("c_name") > F.col("c_mktsegment")).alias("str_cmp"),
        (F.col("c_nationkey") < F.col("c_acctbal")).alias("int_float_cmp"),
    )


# ---------------------------------------------------------------------------
# Joins  (SURVEY §2.3, execution/join.rs)
# ---------------------------------------------------------------------------


@query(
    "q12_join_inner_hash",
    oracle="""
    SELECT c_mktsegment,
           count(*)                    AS order_cnt,
           r4(sum(o_totalprice)) AS revenue
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def q12_join_inner_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HashJoin equi-join (join.rs:143-202). Unlike the reference (which
    keeps ONE right row per key — a bug, SURVEY §2.3), SQL semantics apply.
    Scale: orders ⨝ customer shuffles on custkey; AQE picks broadcast when
    customer fits, else sort-merge. Aggregation reuses no join key →
    second shuffle on the 5-value segment key is map-side combined."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "inner")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("order_cnt"),
            r4(F.sum("o_totalprice")).alias("revenue"),
        )
    )


@query(
    "q13_join_outer",
    oracle="""
    SELECT 'left' AS side, c_custkey, count(o_orderkey) AS n_orders
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
    UNION ALL
    SELECT 'right' AS side, c_custkey, count(o_orderkey) AS n_orders
    FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
    GROUP BY c_custkey
    """,
)
def q13_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT and RIGHT OUTER joins (join.rs:10-141 outer flag; planner.rs:
    296-319 rewrites right→left with a column swap — Spark supports both
    natively). The two tagged branches compute the same aggregate through
    the two join types; the value-hash passing proves the swap equivalence
    the reference implements by hand. Unmatched customers appear with
    n_orders = 0 (count of a NULL-padded column)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    left = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
        .select(F.lit("left").alias("side"), "c_custkey", "n_orders")
    )
    right = (
        o.join(c, o.o_custkey == c.c_custkey, "right")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
        .select(F.lit("right").alias("side"), "c_custkey", "n_orders")
    )
    return left.unionByName(right)


@query(
    "q15_join_cross_theta",
    oracle="""
    SELECT 'cross' AS kind,
           CAST(n_nationkey AS BIGINT) AS k1, CAST(r_regionkey AS BIGINT) AS k2
    FROM nation CROSS JOIN region
    UNION ALL
    SELECT 'theta' AS kind,
           CAST(s_suppkey AS BIGINT) AS k1, CAST(c_custkey AS BIGINT) AS k2
    FROM supplier JOIN customer
      ON s_nationkey = c_nationkey AND s_acctbal < c_acctbal
    """,
)
def q15_join_cross_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CROSS JOIN (planner.rs:260-280 — NLJ with no predicate; both sides
    tiny dims, so the product is 25×5 regardless of scale factor) and
    NestedLoopJoin with an arbitrary theta predicate (join.rs:10-141). For
    the theta branch, the equi conjunct makes Catalyst hash-partition on
    nationkey and evaluate the inequality as a post-join residual — the
    same split the reference's FilterPushdown does by hand
    (optimizer.rs:98-157)."""
    n = table(spark, sf_dir, "nation").select("n_nationkey")
    r = table(spark, sf_dir, "region").select("r_regionkey")
    cross = n.crossJoin(r).select(
        F.lit("cross").alias("kind"),
        F.col("n_nationkey").cast("long").alias("k1"),
        F.col("r_regionkey").cast("long").alias("k2"),
    )
    s = table(spark, sf_dir, "supplier")
    c = table(spark, sf_dir, "customer")
    theta = (
        s.join(
            c,
            (s.s_nationkey == c.c_nationkey) & (s.s_acctbal < c.c_acctbal),
            "inner",
        )
        .select(
            F.lit("theta").alias("kind"),
            F.col("s_suppkey").cast("long").alias("k1"),
            F.col("c_custkey").cast("long").alias("k2"),
        )
    )
    return cross.unionByName(theta)


@query(
    "q17_join_star",
    oracle="""
    SELECT n_name, r4(sum(l_extendedprice * (1 - l_discount))) AS revenue
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    """,
)
def q17_join_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-table star join. Scale: nation/region are
    broadcast (tiny dims — no shuffle); customer⨝orders⨝lineitem shuffle
    on their keys; the region filter prunes via the broadcast before the
    big joins. AQE reorders/demotes as stats arrive."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    l = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = F.broadcast(table(spark, sf_dir, "nation"))
    r = F.broadcast(table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, (o.o_custkey == c.c_custkey))
        .join(s, (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(n, s.s_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .groupBy("n_name")
        .agg(
            r4(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue")
        )
    )


# ---------------------------------------------------------------------------
# Aggregation  (SURVEY §2.4, execution/aggregation.rs)
# ---------------------------------------------------------------------------


@query(
    "q18_agg_suite",
    oracle="""
    SELECT 'global' AS kind,
           count(*)                 AS n_rows,
           count(l_quantity)        AS n_nonnull,
           r4(sum(l_quantity))      AS sum_v,
           r4(avg(l_quantity))      AS avg_v,
           r4(min(l_extendedprice)) AS min_d,
           r4(max(l_extendedprice)) AS max_d,
           min(l_returnflag)        AS min_s,
           max(l_linestatus)        AS max_s
    FROM lineitem
    UNION ALL
    SELECT 'empty' AS kind,
           count(*), count(l_quantity),
           r4(sum(l_quantity)), r4(avg(l_quantity)),
           r4(min(l_extendedprice)), r4(max(l_extendedprice)),
           min(l_returnflag), max(l_linestatus)
    FROM lineitem WHERE 1 = 0
    UNION ALL
    SELECT concat('nullgrp:', coalesce(nullif(o_orderpriority, '1-URGENT'), '<null>')) AS kind,
           count(*),
           count(nullif(o_orderpriority, '1-URGENT')),
           CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
           CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
           CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)
    FROM orders GROUP BY nullif(o_orderpriority, '1-URGENT')
    """,
)
def q18_agg_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's aggregate surface (aggregation.rs) in three tagged
    branches with one schema:

    - 'global': all five aggregates COUNT/MIN/MAX/SUM/AVG, no GROUP BY
      (aggregation.rs:87-241). SUM follows SQL NULL-skip semantics per
      SURVEY §2.4 (diverging from the reference's NULL-poisoning SUM by
      design). Partial aggregation → single-row exchange.
    - 'empty': zero-row global aggregate returns one row of identities —
      COUNT=0, SUM/MIN/AVG=NULL (aggregation.rs:37-44).
    - 'nullgrp:*': NULL as a group key — all-NULL keys form one group
      (aggregation.rs:11-63), COUNT(expr) skips NULLs within the group;
      the group key is folded into the tag.
    """
    l = table(spark, sf_dir, "lineitem")

    def global_aggs(df: DataFrame, kind: str) -> DataFrame:
        return df.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count("l_quantity").alias("n_nonnull"),
            r4(F.sum("l_quantity")).alias("sum_v"),
            r4(F.avg("l_quantity")).alias("avg_v"),
            r4(F.min("l_extendedprice")).alias("min_d"),
            r4(F.max("l_extendedprice")).alias("max_d"),
            F.min("l_returnflag").alias("min_s"),
            F.max("l_linestatus").alias("max_s"),
        ).select(F.lit(kind).alias("kind"), "*")

    o = table(spark, sf_dir, "orders")
    prio = F.expr("nullif(o_orderpriority, '1-URGENT')")
    nullgrp = (
        o.groupBy(prio.alias("prio"))
        .agg(F.count(F.lit(1)).alias("n_rows"), F.count(prio).alias("n_nonnull"))
        .select(
            F.concat(F.lit("nullgrp:"), F.coalesce(F.col("prio"), F.lit("<null>"))).alias("kind"),
            "n_rows",
            "n_nonnull",
            F.lit(None).cast("double").alias("sum_v"),
            F.lit(None).cast("double").alias("avg_v"),
            F.lit(None).cast("double").alias("min_d"),
            F.lit(None).cast("double").alias("max_d"),
            F.lit(None).cast("string").alias("min_s"),
            F.lit(None).cast("string").alias("max_s"),
        )
    )
    return (
        global_aggs(l, "global")
        .unionByName(global_aggs(l.filter(F.lit(False)), "empty"))
        .unionByName(nullgrp)
    )


@query(
    "q19_agg_groupby_having",
    oracle="""
    SELECT CAST(year(o_orderdate) AS BIGINT) AS order_year,
           count(*)                          AS n_orders,
           r4(sum(o_totalprice))             AS total,
           r4(avg(o_totalprice))             AS avg_price
    FROM orders GROUP BY CAST(year(o_orderdate) AS BIGINT)
    HAVING count(*) >= 100 AND min(o_totalprice) < 50000
    """,
)
def q19_agg_groupby_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY arbitrary expression — the planner's hardest resolution
    case (planner.rs:399-443, `GROUP BY released - 2000`) — with a HAVING
    predicate over aggregates including one (min) referenced ONLY in the
    predicate: the reference injects hidden columns for this
    (planner.rs:445-500); here the hidden aggregate is computed, filtered
    on, and dropped — same mechanics, one shuffle."""
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy(F.year("o_orderdate").cast("long").alias("order_year"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            r4(F.sum("o_totalprice")).alias("total"),
            r4(F.avg("o_totalprice")).alias("avg_price"),
            F.min("o_totalprice").alias("_hidden_min"),
        )
        .filter((F.col("n_orders") >= 100) & (F.col("_hidden_min") < 50000))
        .drop("_hidden_min")
    )


# ---------------------------------------------------------------------------
# Sort / Limit / Offset  (SURVEY §2.6)
# ---------------------------------------------------------------------------


@query(
    "q23_order_limit_offset",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 20 OFFSET 10
    """,
)
def q23_order_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order (multi-key, desc/asc) + Limit + Offset in the reference's plan
    order (query.rs:90-169; planner.rs:221-240: OFFSET applies below
    LIMIT). Spark fuses sort+limit+offset into TakeOrderedAndProject —
    per-partition top-(k+offset) then a 30-row merge on the driver; no
    global sort materialization at any scale. Tie-broken by PK for
    determinism."""
    return (
        table(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .offset(10)
        .limit(20)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@query(
    "q25_fromless_select",
    oracle="""
    SELECT CAST(1 + 1 AS BIGINT)  AS two,
           r4(3.5 * 2.0)    AS seven,
           CAST(7 // 2 AS BIGINT) AS three,
           (1 < 2)                AS t,
           NOT (1 < 2)            AS f
    """,
)
def q25_fromless_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FROM-less SELECT — the Nothing node emits a single empty row
    (execution/source.rs:96-111); `spark.range(1)` is the Spark analog."""
    return spark.range(1).select(
        F.lit(2).cast("long").alias("two"),
        r4(F.lit(3.5) * 2.0).alias("seven"),
        F.expr("7 div 2").cast("long").alias("three"),
        (F.lit(1) < F.lit(2)).alias("t"),
        (~(F.lit(1) < F.lit(2))).alias("f"),
    )


# ---------------------------------------------------------------------------
# Beyond-parity relational extensions (reference lacks these — SURVEY §2.5,
# §2.7: no DISTINCT, set ops, or window functions exist there)
# ---------------------------------------------------------------------------


@query(
    "q26_distinct_setops",
    oracle="""
    SELECT 'distinct' AS op, concat(l_returnflag, '|', l_linestatus) AS val
    FROM (SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem) d
    UNION ALL
    SELECT 'union' AS op, CAST(nationkey AS VARCHAR) AS val FROM (
      SELECT c_nationkey AS nationkey FROM customer
      UNION
      SELECT s_nationkey AS nationkey FROM supplier
    ) u
    UNION ALL
    SELECT 'except' AS op, CAST(nationkey AS VARCHAR) AS val FROM (
      SELECT DISTINCT c_nationkey AS nationkey FROM customer
      EXCEPT
      SELECT s_nationkey AS nationkey FROM supplier
    ) e
    UNION ALL
    SELECT 'intersect' AS op, CAST(nationkey AS VARCHAR) AS val FROM (
      SELECT c_nationkey AS nationkey FROM customer
      INTERSECT
      SELECT s_nationkey AS nationkey FROM supplier
    ) i
    """,
)
def q26_distinct_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT + the three set operations (extensions — SURVEY §2.5/§2.7:
    the reference has none), tagged into one result:

    - 'distinct': hash-aggregate on all projected columns; partial
      aggregation makes the exchange carry ≤|distinct| rows per partition.
    - 'union': UNION with dedup.
    - 'except': `subtract` is EXCEPT DISTINCT — a value present on the
      right is fully excluded however many times it appears on the left.
    - 'intersect': INTERSECT DISTINCT.
    Each branch is its own partial-aggregated shuffle on the value key."""
    li = table(spark, sf_dir, "lineitem")
    distinct = (
        li.select("l_returnflag", "l_linestatus")
        .distinct()
        .select(
            F.lit("distinct").alias("op"),
            F.concat(F.col("l_returnflag"), F.lit("|"), F.col("l_linestatus")).alias("val"),
        )
    )
    c = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))

    def tag(df: DataFrame, op: str) -> DataFrame:
        return df.select(
            F.lit(op).alias("op"), F.col("nationkey").cast("string").alias("val")
        )

    return (
        distinct.unionByName(tag(c.union(s).distinct(), "union"))
        .unionByName(tag(c.subtract(s), "except"))
        .unionByName(tag(c.intersect(s), "intersect"))
    )


@query(
    "q30_windows",
    oracle="""
    SELECT o_custkey, o_orderkey, CAST(rn AS BIGINT) AS rn, r4(running_total) AS running_total
    FROM (
      SELECT o_custkey, o_orderkey,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn,
             sum(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_total
      FROM orders WHERE o_custkey <= 200
    ) t WHERE rn <= 3
    """,
)
def q30_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window functions (extension — SURVEY §2.5: the reference has none):
    ranking (row_number → top-3 per customer, rank filter pushed into the
    window sort via WindowGroupLimit) and a running-sum frame (ROWS
    UNBOUNDED PRECEDING..CURRENT ROW — the frame fixes accumulation order,
    so the double result is deterministic on both engines). Both windows
    share the o_custkey partitioning → one shuffle, two sorts."""
    rank_w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    run_w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") <= 200)
        .withColumn("rn", F.row_number().over(rank_w).cast("long"))
        .withColumn("running_total", r4(F.sum("o_totalprice").over(run_w)))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "rn", "running_total")
    )


@query(
    "q43_tpch_q3_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           r4(sum(l_extendedprice * (1 - l_discount))) AS revenue,
           CAST(year(o_orderdate) AS BIGINT) AS order_year,
           o_orderpriority
    FROM customer, orders, lineitem
    WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l_orderkey, CAST(year(o_orderdate) AS BIGINT), o_orderpriority
    ORDER BY revenue DESC, l_orderkey LIMIT 20
    """,
)
def q43_tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter → two shuffling joins → grouped
    top-k. Scale: customer filter prunes before the join (pushed to scan);
    the final ORDER+LIMIT becomes TakeOrderedAndProject — no global sort."""
    c = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    l = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, F.col("o_orderkey") == l.l_orderkey)
        .groupBy(
            "l_orderkey",
            F.year("o_orderdate").cast("long").alias("order_year"),
            "o_orderpriority",
        )
        .agg(
            r4(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
                "revenue"
            )
        )
        .select("l_orderkey", "revenue", "order_year", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(20)
    )


@query(
    "q44_tpch_q6_forecast_revenue",
    oracle="""
    SELECT r4(sum(l_extendedprice * l_discount)) AS revenue,
           count(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount >= 0.05 AND l_discount <= 0.07
      AND l_quantity < 24
    """,
)
def q44_tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure filter + global aggregate. Every predicate
    reaches the Parquet reader; the scan reads 4 columns of 11; partial
    aggregation leaves one row per partition before the single exchange."""
    l = table(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            r4(F.sum(F.col("l_extendedprice") * F.col("l_discount"))).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "q45_tpch_q10_returned_items",
    oracle="""
    SELECT c_custkey, c_name, n_name,
           r4(sum(l_extendedprice * (1 - l_discount))) AS revenue
    FROM customer, orders, lineitem, nation
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND c_nationkey = n_nationkey AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey LIMIT 20
    """,
)
def q45_tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: fact-fact join + broadcast dim + grouped top-k by
    revenue lost to returns."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    l = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = F.broadcast(table(spark, sf_dir, "nation"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            r4(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
                "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@query(
    "q46_stats_suite",
    oracle="""
    SELECT c_mktsegment,
           count(*) AS n_custs,
           CAST(count(DISTINCT c_nationkey) AS BIGINT) AS n_nations,
           CAST(count(DISTINCT c_custkey % 100) AS BIGINT) AS n_key_mod,
           r4(quantile_cont(c_acctbal, 0.5)) AS median_bal,
           r4(quantile_cont(c_acctbal, 0.9)) AS p90_bal,
           r4(min(c_acctbal)) AS min_bal,
           r4(max(c_acctbal)) AS max_bal,
           r4(stddev_samp(c_acctbal)) AS sd_bal,
           r4(var_samp(c_acctbal) / 1000) AS var_bal_k,
           r4(corr(c_acctbal, CAST(c_custkey AS DOUBLE))) AS corr_bal_key,
           r4(covar_samp(c_acctbal, CAST(c_custkey AS DOUBLE)) / 1000) AS cov_k
    FROM customer GROUP BY c_mktsegment
    """,
)
def q46_stats_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical-aggregate surface (extensions — the reference has none,
    SURVEY §2.4) in one grouped profile:

    - exact DISTINCT aggregates (two, incl. over an expression): Spark
      expands them into a two-phase partial-distinct plan; for very high
      cardinalities swap in approx_count_distinct (q49) to bound state.
    - exact interpolated percentiles (Spark `percentile` == DuckDB
      quantile_cont). At 100 TB use approx_percentile (t-digest, bounded
      state); exact is appropriate for bounded-cardinality groups.
    - second moments (stddev/variance/correlation/covariance):
      single-pass streaming moments, map-side combinable, skew-free.
    """
    c = table(spark, sf_dir, "customer")
    key_d = F.col("c_custkey").cast("double")
    return c.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_custs"),
        F.countDistinct("c_nationkey").cast("long").alias("n_nations"),
        F.countDistinct(F.col("c_custkey") % 100).cast("long").alias("n_key_mod"),
        r4(F.expr("percentile(c_acctbal, 0.5)")).alias("median_bal"),
        r4(F.expr("percentile(c_acctbal, 0.9)")).alias("p90_bal"),
        r4(F.min("c_acctbal")).alias("min_bal"),
        r4(F.max("c_acctbal")).alias("max_bal"),
        r4(F.stddev_samp("c_acctbal")).alias("sd_bal"),
        r4(F.var_samp("c_acctbal") / 1000).alias("var_bal_k"),
        r4(F.corr(F.col("c_acctbal"), key_d)).alias("corr_bal_key"),
        r4(F.covar_samp(F.col("c_acctbal"), key_d) / 1000).alias("cov_k"),
    )


@query(
    "q49_approx_distinct",
    oracle="""
    SELECT o_orderstatus,
           count(DISTINCT o_custkey) AS exact_custs,
           count(*)                  AS n_orders,
           TRUE                      AS approx_within_5pct
    FROM orders GROUP BY o_orderstatus
    """,
)
def q49_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ approximate distinct — THE scale path for cardinality
    at 100 TB (bounded sketch state vs unbounded exact-distinct hash sets).

    The HLL estimate itself is engine-specific, so the oracle can't match
    its value; instead the query emits the EXACT distinct count (oracle-
    matched) plus a deterministic error-bound check: Spark's HLL++ with
    rsd=0.02 must land within 5% of truth. The hash-compare then fails iff
    either the exact path or the sketch's error bound regresses — a
    quantitative gate on an approximate operator (HLL is deterministic
    for a given input, no RNG flake)."""
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("exact_custs"),
        F.count(F.lit(1)).alias("n_orders"),
        (
            F.abs(
                F.approx_count_distinct("o_custkey", rsd=0.02)
                - F.countDistinct("o_custkey")
            )
            <= 0.05 * F.countDistinct("o_custkey")
        ).alias("approx_within_5pct"),
    )


@query(
    "q90_rollup_cube",
    oracle="""
    SELECT 'rollup' AS gkind, l_returnflag, l_linestatus,
           count(*) AS n, r4(sum(l_quantity)) AS qty,
           CAST(grouping(l_returnflag) AS BIGINT) AS g_flag,
           CAST(grouping(l_linestatus) AS BIGINT) AS g_status
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    UNION ALL
    SELECT 'cube' AS gkind, l_returnflag, l_linestatus,
           count(*) AS n, r4(sum(l_quantity)) AS qty,
           CAST(grouping(l_returnflag) AS BIGINT) AS g_flag,
           CAST(grouping(l_linestatus) AS BIGINT) AS g_status
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def q90_rollup_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP and CUBE multi-level aggregation (extensions) — both are
    GROUPING SETS sugar, tagged into one result. ROLLUP: per-(flag,status),
    per-flag, and grand-total rows in one pass; CUBE: all 2^k levels.
    GROUPING() markers distinguish rollup NULLs from data NULLs — the
    standard OLAP summary shape. Spark expands each into a single
    partial-aggregated shuffle — same cost shape as a plain GROUP BY."""
    l = table(spark, sf_dir, "lineitem")

    def levels(grouped, gkind: str) -> DataFrame:
        return grouped.agg(
            F.count(F.lit(1)).alias("n"),
            r4(F.sum("l_quantity")).alias("qty"),
            F.grouping("l_returnflag").cast("long").alias("g_flag"),
            F.grouping("l_linestatus").cast("long").alias("g_status"),
        ).select(
            F.lit(gkind).alias("gkind"),
            "l_returnflag",
            "l_linestatus",
            "n",
            "qty",
            "g_flag",
            "g_status",
        )

    return levels(l.rollup("l_returnflag", "l_linestatus"), "rollup").unionByName(
        levels(l.cube("l_returnflag", "l_linestatus"), "cube")
    )
