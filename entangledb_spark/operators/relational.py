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
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            r4(F.sum("l_quantity")).alias("sum_qty"),
            r4(F.sum("l_extendedprice")).alias("sum_base_price"),
            r4(F.sum(disc_price)).alias("sum_disc_price"),
            r4(F.sum(disc_price * (1 + F.col("l_tax")))).alias("sum_charge"),
            r4(F.avg("l_quantity")).alias("avg_qty"),
            r4(F.avg("l_extendedprice")).alias("avg_price"),
            r4(F.avg("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "q02_scan_project",
    oracle="SELECT r_regionkey, r_name FROM region",
)
def q02_scan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan node (plan/mod.rs:117-121): full table scan with projection."""
    return table(spark, sf_dir, "region").select("r_regionkey", "r_name")


@query(
    "q03_filter_pushdown",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
    FROM lineitem WHERE l_quantity > 45 AND l_discount < 0.05
    """,
)
def q03_filter_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter node (execution/query.rs:8-42). Both conjuncts reach the
    Parquet scan as PushedFilters; only 4 of 11 columns are read."""
    return (
        table(spark, sf_dir, "lineitem")
        .filter((F.col("l_quantity") > 45) & (F.col("l_discount") < 0.05))
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
    )


@query(
    "q04_key_lookup",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice FROM orders
    WHERE o_orderkey IN (1, 2, 3, 7, 32, 100, 101)
    """,
)
def q04_key_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KeyLookup node (execution/source.rs:31-58): point lookups by PK.
    Spark needs no index — the IN-list pushes to Parquet min/max row-group
    stats, the distributed analog of a primary-key point read."""
    return (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey").isin(1, 2, 3, 7, 32, 100, 101))
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@query(
    "q05_index_lookup",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment FROM customer
    WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE')
    """,
)
def q05_index_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IndexLookup node (execution/source.rs:61-93): secondary-index probe.
    Same result set as `col IN values` with dictionary/stats-based row-group
    skipping at the scan (SURVEY §1.4 mapping)."""
    return (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment").isin("BUILDING", "AUTOMOBILE"))
        .select("c_custkey", "c_name", "c_mktsegment")
    )


# ---------------------------------------------------------------------------
# Expression language  (SURVEY §2.2, types/expression.rs)
# ---------------------------------------------------------------------------


@query(
    "q06_expr_arith",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           r4(l_extendedprice * (1 - l_discount))       AS net_price,
           r4(-l_discount)                              AS neg_disc,
           r4(l_quantity + l_tax * 10)                  AS q_plus,
           r4(l_extendedprice / (l_quantity + 1))       AS unit_ish
    FROM lineitem WHERE l_orderkey <= 200
    """,
)
def q06_expr_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arithmetic expression surface: + - * / unary-negate with NULL
    propagation (expression.rs:122-240). All stay in whole-stage codegen."""
    l = table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 200)
    return l.select(
        "l_orderkey",
        "l_linenumber",
        r4(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net_price"),
        r4(-F.col("l_discount")).alias("neg_disc"),
        r4(F.col("l_quantity") + F.col("l_tax") * 10).alias("q_plus"),
        r4(F.col("l_extendedprice") / (F.col("l_quantity") + 1)).alias("unit_ish"),
    )


@query(
    "q07_expr_intdiv_mod",
    oracle="""
    SELECT p_partkey,
           CAST(p_size // 7 AS BIGINT) AS size_div,
           CAST(p_size % 7 AS BIGINT)  AS size_mod
    FROM part
    """,
)
def q07_expr_intdiv_mod(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer division truncates (expression.rs:142-158): the reference's
    Integer/Integer→Integer. Spark `/` returns double, so the engine emits
    `div` for int/int (SURVEY §4.3); `%` is remainder (expression.rs:185-202)."""
    return table(spark, sf_dir, "part").select(
        "p_partkey",
        F.expr("p_size div 7").cast("long").alias("size_div"),
        (F.col("p_size") % 7).cast("long").alias("size_mod"),
    )


@query(
    "q08_expr_pow_factorial",
    oracle="""
    SELECT p_partkey,
           CAST(pow(p_size % 5 + 1, 3) AS BIGINT)  AS cube_col,
           CAST(factorial(p_size % 6) AS BIGINT)   AS fact_col
    FROM part
    """,
)
def q08_expr_pow_factorial(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`^` exponentiation (int^nonneg-int stays integral, expression.rs:
    159-176) and postfix `!` factorial (expression.rs:177-184). Spark's `^`
    is bitwise XOR, so the dialect compiles `^`→pow with an integral cast,
    and `!`→factorial (inputs kept ≤20, Spark's factorial domain)."""
    return table(spark, sf_dir, "part").select(
        "p_partkey",
        F.pow(F.col("p_size") % 5 + 1, F.lit(3)).cast("long").alias("cube_col"),
        F.factorial(F.col("p_size") % 6).cast("long").alias("fact_col"),
    )


@query(
    "q09_expr_like",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_name LIKE 'Customer#%' AND c_name LIKE '_ustomer%1' AND c_mktsegment LIKE '%ILD%'
    """,
)
def q09_expr_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE with % and _ wildcards, anchored both ends (expression.rs:
    243-258). The reference's doubled-wildcard escapes (%%→literal %) are
    handled in the dialect translator (plans/expressions), not here."""
    c = table(spark, sf_dir, "customer")
    return c.filter(
        F.col("c_name").like("Customer#%")
        & F.col("c_name").like("_ustomer%1")
        & F.col("c_mktsegment").like("%ILD%")
    ).select("c_custkey", "c_name")


@query(
    "q10_expr_three_valued_logic",
    oracle="""
    SELECT event_id,
           (nullif(value > 100, false) AND value > 50) AS and_col,
           (nullif(value > 100, false) OR  value > 50) AS or_col,
           (NOT nullif(value > 100, false))            AS not_col,
           (nullif(value > 100, false) IS NULL)        AS isnull_col,
           (nullif(value > 100, false) IS NOT NULL)    AS isnotnull_col
    FROM events WHERE event_id < 500
    """,
)
def q10_expr_three_valued_logic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-valued AND/OR/NOT truth tables (expression.rs:52-74) and IS [NOT]
    NULL (expression.rs:116-119). `nullif(value>100, false)` fabricates a
    TRUE/NULL column, so `NULL AND true→NULL`, `NULL OR true→TRUE`, etc.
    Spark's Boolean logic is identical to the reference's."""
    e = table(spark, sf_dir, "events").filter(F.col("event_id") < 500)
    maybe = F.expr("nullif(value > 100, false)")
    b = F.col("value") > 50
    return e.select(
        "event_id",
        (maybe & b).alias("and_col"),
        (maybe | b).alias("or_col"),
        (~maybe).alias("not_col"),
        maybe.isNull().alias("isnull_col"),
        maybe.isNotNull().alias("isnotnull_col"),
    )


@query(
    "q11_expr_comparisons",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           (l_quantity >  25.0)              AS gt_col,
           (l_quantity <= 25.0)              AS le_col,
           (l_linenumber = 1)                AS eq_col,
           (l_linenumber <> 1)               AS ne_col,
           (l_returnflag > l_linestatus)     AS str_cmp,
           (l_linenumber < l_quantity)       AS int_float_cmp
    FROM lineitem WHERE l_orderkey <= 100
    """,
)
def q11_expr_comparisons(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Comparison surface (expression.rs:78-115): typed equality, `>=`/`<=`
    desugaring (planner.rs:562-590 — same results), string lexicographic
    ordering, and int↔float cross-type numeric comparison."""
    l = table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 100)
    return l.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_quantity") > 25.0).alias("gt_col"),
        (F.col("l_quantity") <= 25.0).alias("le_col"),
        (F.col("l_linenumber") == 1).alias("eq_col"),
        (F.col("l_linenumber") != 1).alias("ne_col"),
        (F.col("l_returnflag") > F.col("l_linestatus")).alias("str_cmp"),
        (F.col("l_linenumber") < F.col("l_quantity")).alias("int_float_cmp"),
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
    "q13_join_left_outer",
    oracle="""
    SELECT c_custkey, count(o_orderkey) AS n_orders
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
    """,
)
def q13_join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join (join.rs:10-141, outer flag): unmatched left rows
    padded with NULLs; count(o_orderkey) counts non-null → 0 for them."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@query(
    "q14_join_right_outer",
    oracle="""
    SELECT c_custkey, c_acctbal, o_orderkey
    FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
    WHERE c_acctbal < 0
    """,
)
def q14_join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RIGHT OUTER join. The reference rewrites right→left with a column
    swap at plan time (planner.rs:296-319); Spark supports it natively."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "right")
        .filter(F.col("c_acctbal") < 0)
        .select("c_custkey", "c_acctbal", "o_orderkey")
    )


@query(
    "q15_join_cross",
    oracle="""
    SELECT r_name, o_orderstatus
    FROM region CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders) AS s
    """,
)
def q15_join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CROSS JOIN (planner.rs:260-280 — NLJ with no predicate). Both sides
    reduced first, so the product is 5×3 regardless of scale factor."""
    r = table(spark, sf_dir, "region").select("r_name")
    s = table(spark, sf_dir, "orders").select("o_orderstatus").distinct()
    return r.crossJoin(s)


@query(
    "q16_join_theta",
    oracle="""
    SELECT s_suppkey, c_custkey
    FROM supplier JOIN customer
      ON s_nationkey = c_nationkey AND s_acctbal < c_acctbal
    """,
)
def q16_join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NestedLoopJoin with arbitrary predicate (join.rs:10-141). The equi
    conjunct makes Catalyst hash-partition on nationkey and evaluate the
    inequality as a post-join residual — the same split the reference's
    FilterPushdown does by hand (optimizer.rs:98-157)."""
    s = table(spark, sf_dir, "supplier")
    c = table(spark, sf_dir, "customer")
    return s.join(
        c,
        (s.s_nationkey == c.c_nationkey) & (s.s_acctbal < c.c_acctbal),
        "inner",
    ).select("s_suppkey", "c_custkey")


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
    "q18_agg_five",
    oracle="""
    SELECT count(*)                     AS n_rows,
           count(l_quantity)            AS n_qty,
           r4(sum(l_quantity))    AS sum_qty,
           r4(avg(l_quantity))    AS avg_qty,
           r4(min(l_extendedprice)) AS min_price,
           r4(max(l_extendedprice)) AS max_price,
           min(l_returnflag)            AS min_flag,
           max(l_linestatus)            AS max_status
    FROM lineitem
    """,
)
def q18_agg_five(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All five aggregates (aggregation.rs:87-241): COUNT/MIN/MAX/SUM/AVG,
    global (no GROUP BY). SUM follows SQL NULL-skip semantics per the
    oracle, diverging from the reference's NULL-poisoning SUM by design
    (SURVEY §2.4). Partial aggregation → single-row exchange."""
    l = table(spark, sf_dir, "lineitem")
    return l.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("l_quantity").alias("n_qty"),
        r4(F.sum("l_quantity")).alias("sum_qty"),
        r4(F.avg("l_quantity")).alias("avg_qty"),
        r4(F.min("l_extendedprice")).alias("min_price"),
        r4(F.max("l_extendedprice")).alias("max_price"),
        F.min("l_returnflag").alias("min_flag"),
        F.max("l_linestatus").alias("max_status"),
    )


@query(
    "q19_agg_groupby_expr",
    oracle="""
    SELECT CAST(year(o_orderdate) AS BIGINT) AS order_year,
           count(*)                          AS n_orders,
           r4(sum(o_totalprice))       AS total,
           r4(avg(o_totalprice))       AS avg_price
    FROM orders GROUP BY CAST(year(o_orderdate) AS BIGINT)
    """,
)
def q19_agg_groupby_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY arbitrary expression — the planner's hardest resolution case
    (planner.rs:399-443, `GROUP BY released - 2000`). Spark resolves the
    expression natively; pre/post-projection decomposition not needed."""
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy(F.year("o_orderdate").cast("long").alias("order_year"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            r4(F.sum("o_totalprice")).alias("total"),
            r4(F.avg("o_totalprice")).alias("avg_price"),
        )
    )


@query(
    "q20_agg_having",
    oracle="""
    SELECT o_custkey, count(*) AS n, r4(max(o_totalprice)) AS max_price
    FROM orders GROUP BY o_custkey
    HAVING count(*) >= 12 AND max(o_totalprice) > 100
    """,
)
def q20_agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAVING over aggregates incl. ones referenced only in the predicate —
    the reference injects hidden columns for this (planner.rs:445-500);
    Spark's filter-after-agg resolves it directly."""
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n"),
            r4(F.max("o_totalprice")).alias("max_price"),
        )
        .filter((F.col("n") >= 12) & (F.col("max_price") > 100))
    )


@query(
    "q21_agg_empty_input",
    oracle="""
    SELECT count(*)          AS n_rows,
           sum(l_quantity)   AS sum_qty,
           min(l_returnflag) AS min_flag,
           avg(l_discount)   AS avg_disc
    FROM lineitem WHERE 1 = 0
    """,
)
def q21_agg_empty_input(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero-row global aggregate returns one row of identity values:
    COUNT=0, SUM/MIN/AVG=NULL (aggregation.rs:37-44). Spark matches."""
    l = table(spark, sf_dir, "lineitem").filter(F.lit(False))
    return l.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("l_quantity").alias("sum_qty"),
        F.min("l_returnflag").alias("min_flag"),
        F.avg("l_discount").alias("avg_disc"),
    )


@query(
    "q22_agg_null_group",
    oracle="""
    SELECT nullif(o_orderpriority, '1-URGENT') AS prio,
           count(*)  AS n,
           count(nullif(o_orderpriority, '1-URGENT')) AS n_nonnull
    FROM orders GROUP BY nullif(o_orderpriority, '1-URGENT')
    """,
)
def q22_agg_null_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL as a group key: all-NULL keys form one group (hash semantics,
    aggregation.rs:11-63 — NULL groups hash together there too), while
    COUNT(expr) skips NULLs within the group."""
    o = table(spark, sf_dir, "orders")
    prio = F.expr("nullif(o_orderpriority, '1-URGENT')")
    return o.groupBy(prio.alias("prio")).agg(
        F.count(F.lit(1)).alias("n"),
        F.count(prio).alias("n_nonnull"),
    )


# ---------------------------------------------------------------------------
# Sort / Limit / Offset  (SURVEY §2.6)
# ---------------------------------------------------------------------------


@query(
    "q23_order_limit_topk",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
    """,
)
def q23_order_limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order+Limit (query.rs:90-169). Spark fuses them into
    TakeOrderedAndProject — per-partition top-k then a k-row merge on the
    driver; no global sort materialization at any scale. Tie-broken by PK
    for determinism."""
    return (
        table(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@query(
    "q24_limit_offset",
    oracle="""
    SELECT o_orderkey, o_orderstatus FROM orders
    ORDER BY o_orderkey LIMIT 20 OFFSET 10
    """,
)
def q24_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offset below Limit, exactly the reference's plan order
    (planner.rs:221-240: OFFSET applies first)."""
    return (
        table(spark, sf_dir, "orders")
        .orderBy("o_orderkey")
        .offset(10)
        .limit(20)
        .select("o_orderkey", "o_orderstatus")
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
    "q26_distinct",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
)
def q26_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT (extension): hash-aggregate on all columns; partial
    aggregation makes the exchange carry ≤|distinct| rows per partition."""
    return table(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()


@query(
    "q27_union_distinct",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def q27_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION with dedup (extension — SURVEY §2.7: reference has none)."""
    c = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct()


@query(
    "q28_except",
    oracle="""
    SELECT DISTINCT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def q28_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (extension): nations with customers but no suppliers.
    `subtract` is EXCEPT DISTINCT — a value present on the right is fully
    excluded however many times it appears on the left."""
    c = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.subtract(s)


@query(
    "q29_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def q29_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (extension)."""
    c = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@query(
    "q30_window_rank",
    oracle="""
    SELECT o_custkey, o_orderkey, CAST(rn AS BIGINT) AS rn
    FROM (
      SELECT o_custkey, o_orderkey,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) t WHERE rn <= 3
    """,
)
def q30_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window row_number (extension — SURVEY §2.5: reference has no window
    functions). Top-3 orders per customer. Scale: one shuffle on custkey;
    rank filter is pushed into the window's sort (WindowGroupLimit)."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        table(spark, sf_dir, "orders")
        .withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "rn")
    )


@query(
    "q31_window_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey,
           r4(sum(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS running_total
    FROM orders WHERE o_custkey <= 50
    """,
)
def q31_window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running-sum window frame (extension). Deterministic double result:
    the frame fixes accumulation order on both engines."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") <= 50)
        .select(
            "o_custkey",
            "o_orderkey",
            r4(F.sum("o_totalprice").over(w)).alias("running_total"),
        )
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
    "q46_count_distinct",
    oracle="""
    SELECT o_orderstatus,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_custs,
           CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS n_prios,
           count(*) AS n_orders
    FROM orders GROUP BY o_orderstatus
    """,
)
def q46_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact DISTINCT aggregates (extension — the reference has none,
    SURVEY §2.4). Scale: Spark expands distinct aggs into a two-phase
    partial-distinct plan; for very high cardinalities swap in
    approx_count_distinct (q49) to keep state bounded."""
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").cast("long").alias("n_custs"),
        F.countDistinct("o_orderpriority").cast("long").alias("n_prios"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@query(
    "q47_percentiles",
    oracle="""
    SELECT c_mktsegment,
           r4(quantile_cont(c_acctbal, 0.5)) AS median_bal,
           r4(quantile_cont(c_acctbal, 0.9)) AS p90_bal,
           r4(min(c_acctbal)) AS min_bal,
           r4(max(c_acctbal)) AS max_bal
    FROM customer GROUP BY c_mktsegment
    """,
)
def q47_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (Spark `percentile` == DuckDB
    quantile_cont). Scale note: exact percentile materializes per-group
    values — at 100 TB use approx_percentile (t-digest, bounded state);
    exact is appropriate for bounded-cardinality groups like these."""
    c = table(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        r4(F.expr("percentile(c_acctbal, 0.5)")).alias("median_bal"),
        r4(F.expr("percentile(c_acctbal, 0.9)")).alias("p90_bal"),
        r4(F.min("c_acctbal")).alias("min_bal"),
        r4(F.max("c_acctbal")).alias("max_bal"),
    )


@query(
    "q48_stats_moments",
    oracle="""
    SELECT n_nationkey % 5 AS grp,
           r4(stddev_samp(c_acctbal)) AS sd_bal,
           r4(var_samp(c_acctbal) / 1000) AS var_bal_k,
           r4(corr(c_acctbal, CAST(c_custkey AS DOUBLE))) AS corr_bal_key,
           r4(covar_samp(c_acctbal, CAST(c_custkey AS DOUBLE)) / 1000) AS cov_k
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY 1
    """,
)
def q48_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-moment statistics (stddev/variance/correlation/covariance) —
    single-pass streaming moments, map-side combinable, skew-free."""
    c = table(spark, sf_dir, "customer")
    n = F.broadcast(table(spark, sf_dir, "nation"))
    key_d = F.col("c_custkey").cast("double")
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .groupBy((F.col("n_nationkey") % 5).alias("grp"))
        .agg(
            r4(F.stddev_samp("c_acctbal")).alias("sd_bal"),
            r4(F.var_samp("c_acctbal") / 1000).alias("var_bal_k"),
            r4(F.corr(F.col("c_acctbal"), key_d)).alias("corr_bal_key"),
            r4(F.covar_samp(F.col("c_acctbal"), key_d) / 1000).alias("cov_k"),
        )
    )


@query("q49_approx_distinct")  # approximate sketch → rows-only check
def q49_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ approximate distinct — THE scale path for cardinality
    at 100 TB (bounded sketch state vs unbounded exact-distinct hash sets).
    Not oracle-matched: sketch estimates are engine-specific by design."""
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("approx_custs"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@query(
    "q90_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           count(*) AS n, r4(sum(l_quantity)) AS qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q90_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (extension): per-(flag,status), per-flag, and
    grand-total rows in one pass. Spark expands rollup into a single
    partial-aggregated shuffle — same cost shape as a plain GROUP BY."""
    l = table(spark, sf_dir, "lineitem")
    return (
        l.rollup("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"), r4(F.sum("l_quantity")).alias("qty"))
    )


@query(
    "q93_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           count(*) AS n,
           CAST(grouping(l_returnflag) AS BIGINT) AS g_flag,
           CAST(grouping(l_linestatus) AS BIGINT) AS g_status
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def q93_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE with GROUPING() markers (extension): all 2^k aggregation levels
    in one pass, grouping flags distinguishing rollup NULLs from data NULLs
    — the standard OLAP summary shape. Single partial-aggregated shuffle."""
    l = table(spark, sf_dir, "lineitem")
    return (
        l.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.grouping("l_returnflag").cast("long").alias("g_flag"),
            F.grouping("l_linestatus").cast("long").alias("g_status"),
        )
    )
