"""Relational operator family (SURVEY.md §2.3-§2.8) over the driver
testdata tables, each with a DuckDB oracle twin.

Cross-engine exactness rules (these queries are value-hash-compared):
  * money/double sums are quantized per-row to integer cents
    (``cast(round(x*100) as bigint)``) before SUM — integer sums are
    order-independent and bit-exact in both engines, double sums are
    not;
  * ratios are divisions of two exact integers — one IEEE op on
    identical inputs is deterministic everywhere;
  * top-k always breaks ties on a unique key (SURVEY.md §7.3.2).

Each entry maps a reference operator (file:line cited) to its
Spark-first expression.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.io import load

QUERIES: dict = {}
ORACLE: dict[str, str] = {}


def register(name: str, sql: str | None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLE[name] = sql
        return fn
    return deco


def _cents(col):
    return F.round(col * 100).cast("bigint")


# --- A8 batch stats rollup (scripts/batch_parser.py:252-276) ---------------
@register("pricing_summary", """
    SELECT l_returnflag, l_linestatus,
           count(*) AS count_order,
           CAST(sum(CAST(round(l_quantity*100) AS BIGINT)) AS BIGINT) AS sum_qty_c,
           CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_price_c,
           CAST(sum(CAST(round(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS BIGINT) AS sum_disc_price_c
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
""")
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("count_order"),
            F.sum(_cents(F.col("l_quantity"))).alias("sum_qty_c"),
            F.sum(_cents(F.col("l_extendedprice"))).alias("sum_price_c"),
            F.sum(_cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
            .alias("sum_disc_price_c"),
        )
    )


# --- J1-style chain with broadcast dims (src/evaluator.py:302-357) ---------
@register("revenue_by_nation", """
    SELECT n.n_name AS nation,
           count(DISTINCT c.c_custkey) AS customers,
           CAST(sum(CAST(round(l.l_extendedprice*(1-l.l_discount)*100) AS BIGINT)) AS BIGINT) AS revenue_c
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY n.n_name
""")
def revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    # nation is a FIXED 25-row dim → safe to force-broadcast at any
    # scale.  customer GROWS with the fact data — no hint; AQE picks
    # broadcast while it fits and falls back to shuffle join at 100×
    # (a forced hint there would OOM the build side).
    #
    # r10 (guide §2.3 "aggregate before you shuffle"): revenue is
    # additive, so lineitem pre-aggregates to one integer-cent sum per
    # order BEFORE any join — the join exchange carries |orders| rows
    # of (key, sum) instead of |lineitem| wide rows.  The distinct
    # count stays a countDistinct: Spark plans it as the standard
    # two-phase (nation, custkey) partial → final aggregate, which IS
    # the per-customer rollup, so a separate per-customer exchange
    # would only duplicate it (A/B'd: folding it in is another −19%
    # at sf1).  customer/nation attach by projection-only joins (AQE
    # broadcasts them while they fit; customer grows with scale, so no
    # forced hint).  Integer-cent sums are order-independent, so
    # regrouping cannot move the totals (oracle-hash-checked, SQL text
    # unchanged).  sf1 same-session A/B: 1.70 → 1.31 s.
    per_order = (
        li.select(
            "l_orderkey",
            _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            .alias("rc"))
        .groupBy("l_orderkey").agg(F.sum("rc").alias("rc"))
    )
    return (
        per_order.join(o.select("o_orderkey", "o_custkey"),
                       per_order.l_orderkey == F.col("o_orderkey"))
        .join(c.select("c_custkey", "c_nationkey"),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.countDistinct("c_custkey").alias("customers"),
            F.sum("rc").alias("revenue_c"),
        )
    )


# --- A3/V8 numbering continuity (src/validator.py:216-229):
# sequence(min,max) minus collected set → exploded missing numbers.
# Rows with l_linenumber=3 are excluded first to guarantee gaps.
@register("missing_linenumbers", """
    WITH kept AS (SELECT * FROM lineitem WHERE l_linenumber <> 3),
    bounds AS (
      SELECT l_orderkey, max(l_linenumber) AS hi FROM kept GROUP BY l_orderkey
    ),
    expected AS (
      SELECT l_orderkey, unnest(generate_series(1, hi)) AS ln FROM bounds
    )
    SELECT e.l_orderkey AS o_orderkey, e.ln AS missing_linenumber
    FROM expected e
    LEFT JOIN kept k ON k.l_orderkey = e.l_orderkey AND k.l_linenumber = e.ln
    WHERE k.l_orderkey IS NULL
""")
def missing_linenumbers(spark: SparkSession, sf_dir: str) -> DataFrame:
    kept = load(spark, sf_dir, "lineitem").filter("l_linenumber <> 3")
    return (
        kept.groupBy("l_orderkey")
        .agg(
            F.max("l_linenumber").alias("hi"),
            F.collect_set("l_linenumber").alias("seen"),
        )
        .select(
            F.col("l_orderkey").alias("o_orderkey"),
            F.explode(
                F.array_except(F.sequence(F.lit(1), F.col("hi")), F.col("seen"))
            ).alias("missing_linenumber"),
        )
    )


# --- J1 left outer with coalesce for not-found (src/evaluator.py:311-328) --
@register("customer_order_stats", """
    SELECT c.c_custkey,
           count(o.o_orderkey) AS order_count,
           CAST(coalesce(sum(CAST(round(o.o_totalprice*100) AS BIGINT)), 0) AS BIGINT) AS total_spent_c,
           count(o.o_orderkey) = 0 AS never_ordered
    FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey
""")
def customer_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return (
        c.join(o, o.o_custkey == c.c_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("order_count"),
            F.coalesce(F.sum(_cents(F.col("o_totalprice"))), F.lit(0))
            .alias("total_spent_c"),
            (F.count("o_orderkey") == 0).alias("never_ordered"),
        )
    )


# --- J2 anti / semi joins + A14 + EXCEPT set op in ONE driver row -----------
# (src/validator.py:507-519 anti-join shape; scripts/run_comparison.py:314-326
# missed-by-all; §2.8 set ops).  One registered query exercises all four
# membership plans — the driver gate records at most 50 entries, so
# related demos share a row (each branch is still a distinct plan).
@register("entity_order_membership", """
    SELECT 'customer_no_orders' AS entity, c_custkey AS entity_id
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    UNION ALL
    SELECT 'customer_with_orders', c_custkey
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    UNION ALL
    SELECT 'user_never_purchasing', user_id
    FROM events GROUP BY user_id
    HAVING max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) = 0
    UNION ALL
    SELECT 'part_never_ordered', p_partkey FROM (
      SELECT p_partkey FROM part
      EXCEPT SELECT l_partkey AS p_partkey FROM lineitem)
""")
def entity_order_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    e = load(spark, sf_dir, "events")
    p = load(spark, sf_dir, "part").select("p_partkey")
    li = load(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("p_partkey"))

    def tag(name, df, idcol):
        return df.select(F.lit(name).alias("entity"),
                         F.col(idcol).cast("bigint").alias("entity_id"))

    anti = c.join(o, c.c_custkey == o.o_custkey, "left_anti")
    semi = c.join(o, c.c_custkey == o.o_custkey, "left_semi")
    never = (
        e.groupBy("user_id")
        .agg(F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
             .alias("m"))
        .filter("m = 0")
    )
    except_ = p.exceptAll(li).distinct()
    return (
        tag("customer_no_orders", anti, "c_custkey")
        .unionAll(tag("customer_with_orders", semi, "c_custkey"))
        .unionAll(tag("user_never_purchasing", never, "user_id"))
        .unionAll(tag("part_never_ordered", except_, "p_partkey"))
    )


# --- W9 top-k with deterministic tie-break (scripts/benchmark.py:239-271) --
@register("top_parts_by_brand", """
    WITH rev AS (
      SELECT p.p_brand, p.p_partkey,
             CAST(sum(CAST(round(l.l_extendedprice*(1-l.l_discount)*100) AS BIGINT)) AS BIGINT) AS revenue_c
      FROM part p JOIN lineitem l ON l.l_partkey = p.p_partkey
      GROUP BY p.p_brand, p.p_partkey
    )
    SELECT p_brand, p_partkey, revenue_c, rk
    FROM (SELECT *, row_number() OVER (PARTITION BY p_brand
                 ORDER BY revenue_c DESC, p_partkey) AS rk FROM rev)
    WHERE rk <= 5
""")
def top_parts_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    li = load(spark, sf_dir, "lineitem")
    # r10 (guide §2.3): aggregate lineitem by l_partkey BEFORE the
    # broadcast join — p_partkey is the grouping key's determinant
    # (p_brand is functionally dependent on it), so grouping first and
    # attaching the brand after is the same aggregation; the broadcast
    # hash join then probes |parts| aggregated rows instead of every
    # lineitem, and the agg exchange carries (key, sum) without the
    # brand string.  Integer-cent sums are order-independent
    # (oracle-hash-checked, SQL text unchanged).  sf1: 1.61 → 1.00 s.
    # The brand inner join also drops partkeys absent from part — for
    # lineitem rows that had no part match the old join dropped them
    # pre-agg, the new one post-agg; the surviving groups and sums are
    # identical.
    per_part = (
        li.select(
            "l_partkey",
            _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            .alias("rc"))
        .groupBy("l_partkey").agg(F.sum("rc").alias("revenue_c"))
    )
    rev = (
        per_part.join(F.broadcast(p.select("p_partkey", "p_brand")),
                      per_part.l_partkey == F.col("p_partkey"))
        .select("p_brand", "p_partkey", "revenue_c")
    )
    w = Window.partitionBy("p_brand").orderBy(
        F.desc("revenue_c"), F.asc("p_partkey"))
    return (
        rev.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("p_brand", "p_partkey", "revenue_c", "rk")
    )


# --- W1 running last-non-null (the region-assignment window;
# src/cropper/detector.py:118-207 re-expressed relationally) ----------------
@register("events_carry_forward", """
    SELECT event_id, user_id,
           last_value(CASE WHEN event_type = 'click' THEN props END IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_click_props
    FROM events
""")
def events_carry_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    marker = F.when(F.col("event_type") == "click", F.col("props"))
    return e.select(
        "event_id", "user_id",
        F.last(marker, ignorenulls=True).over(w).alias("last_click_props"),
    )


# --- W7 duplicate detection, first-wins (src/validator.py:428-445) ---------
@register("first_wins_duplicates", """
    SELECT event_id, first_id
    FROM (SELECT event_id,
                 first_value(event_id) OVER (PARTITION BY user_id, event_type
                       ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_id
          FROM events)
    WHERE event_id <> first_id
""")
def first_wins_duplicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id", "event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        e.select("event_id", F.first("event_id").over(w).alias("first_id"))
        .filter(F.col("event_id") != F.col("first_id"))
    )


# --- A1 union-envelope aggregation (src/cropper/detector.py:322-328) -------
@register("user_value_envelope", """
    SELECT user_id,
           min(CAST(round(value*100) AS BIGINT)) AS min_value_c,
           max(CAST(round(value*100) AS BIGINT)) AS max_value_c,
           min(ts) AS first_ts, max(ts) AS last_ts, count(*) AS n_events
    FROM events GROUP BY user_id
""")
def user_value_envelope(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    return e.groupBy("user_id").agg(
        F.min(_cents(F.col("value"))).alias("min_value_c"),
        F.max(_cents(F.col("value"))).alias("max_value_c"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
        F.count("*").alias("n_events"),
    )


# --- A10 conditional-share aggregation (scripts/validate.py:412-456) -------
@register("priority_fill_rates", """
    SELECT o_orderpriority,
           count(*) AS n_orders,
           CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_filled,
           CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*) AS fill_rate
    FROM orders GROUP BY o_orderpriority
""")
def priority_fill_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    filled = F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0))
    return o.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        filled.alias("n_filled"),
        (filled.cast("double") / F.count("*")).alias("fill_rate"),
    )


# --- A3/A4 contiguity check (src/validator.py:200-239) ---------------------
@register("linenumber_contiguity", """
    SELECT l_orderkey,
           min(l_linenumber) AS lo, max(l_linenumber) AS hi,
           count(DISTINCT l_linenumber) AS n_distinct,
           (max(l_linenumber) - min(l_linenumber) + 1) = count(DISTINCT l_linenumber)
             AS contiguous
    FROM lineitem GROUP BY l_orderkey
""")
def linenumber_contiguity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_orderkey").agg(
        F.min("l_linenumber").alias("lo"),
        F.max("l_linenumber").alias("hi"),
        F.countDistinct("l_linenumber").alias("n_distinct"),
        ((F.max("l_linenumber") - F.min("l_linenumber") + 1)
         == F.countDistinct("l_linenumber")).alias("contiguous"),
    )


# --- F15 cost arithmetic vs a broadcast pricing dim (src/parser.py:102-109,
# pricing table src/config.py:59-86; J7-style literal broadcast join) --------
_PRICING = [
    ("en", 125, 1000),   # (lang, input µ¢ per 1k chars, output µ¢ flat)
    ("de", 150, 1200),
    ("es", 140, 1100),
    ("fr", 145, 1150),
    ("zh", 200, 1500),
]


@register("doc_cost_model", f"""
    WITH pricing(lang, in_ucents_per_kchar, out_ucents) AS (
      VALUES {", ".join(f"('{lang}', {a}, {b})" for lang, a, b in _PRICING)}
    )
    SELECT d.doc_id, d.lang,
           CAST(floor(d.n_chars * p.in_ucents_per_kchar / 1000) AS BIGINT)
             + p.out_ucents AS est_cost_ucents
    FROM documents d JOIN pricing p ON d.lang = p.lang
""")
def doc_cost_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    pricing = spark.createDataFrame(
        _PRICING, "lang string, in_ucents_per_kchar int, out_ucents int")
    return (
        d.join(F.broadcast(pricing), "lang")
        .select(
            "doc_id", "lang",
            (F.floor(F.col("n_chars") * F.col("in_ucents_per_kchar") / 1000)
             .cast("bigint") + F.col("out_ucents"))
            .alias("est_cost_ucents"),
        )
    )


# --- string-function family (F12-ish sanitization pipeline) -----------------
@register("part_label_sanitize", """
    SELECT p_partkey,
           upper(p_brand) AS brand_u,
           replace(p_type, ' ', '_') AS type_key,
           substr(p_name, 1, 12) AS name_prefix,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_key,
           p_brand || '/' || replace(p_type, ' ', '_') AS label
    FROM part
""")
def part_label_sanitize(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    type_key = F.replace(F.col("p_type"), F.lit(" "), F.lit("_"))
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_u"),
        type_key.alias("type_key"),
        F.substring("p_name", 1, 12).alias("name_prefix"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_key"),
        F.concat_ws("/", F.col("p_brand"), type_key).alias("label"),
    )


# --- null-semantics demo: count(col) vs count(*) over nullable marker --------
@register("event_props_null_stats", """
    WITH e AS (SELECT user_id,
                      CASE WHEN event_type = 'view' THEN NULL ELSE props END
                        AS p
               FROM events)
    SELECT user_id,
           count(*) AS n_rows,
           count(p) AS n_nonnull,
           count(*) - count(p) AS n_null,
           count(DISTINCT p) AS n_distinct
    FROM e GROUP BY user_id
""")
def event_props_null_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").select(
        "user_id",
        F.when(F.col("event_type") == "view", F.lit(None))
        .otherwise(F.col("props")).alias("p"))
    return e.groupBy("user_id").agg(
        F.count("*").alias("n_rows"),
        F.count("p").alias("n_nonnull"),
        (F.count("*") - F.count("p")).alias("n_null"),
        F.countDistinct("p").alias("n_distinct"),
    )


# --- explicit GROUPING SETS (beyond the cube demo) ----------------------------
@register("orders_grouping_sets", """
    SELECT o_orderpriority, o_orderstatus, count(*) AS n
    FROM orders
    GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus),
                            (o_orderpriority, o_orderstatus))
""")
def orders_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    o.createOrReplaceTempView("_ogs_orders")
    return spark.sql("""
        SELECT o_orderpriority, o_orderstatus, count(*) AS n
        FROM _ogs_orders
        GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus),
                                (o_orderpriority, o_orderstatus))
    """)


# --- exact median via positional selection (rank-based statistics are
# cross-engine-exact where interpolation-based percentile() is not) ----------
@register("event_value_median", """
    WITH r AS (
      SELECT event_type, CAST(round(value*100) AS BIGINT) AS v_c,
             row_number() OVER (PARTITION BY event_type
                 ORDER BY CAST(round(value*100) AS BIGINT), event_id) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM events
    )
    SELECT event_type,
           CAST(max(n) AS BIGINT) AS n,
           CAST(sum(CASE WHEN rn IN ((n+1)//2, (n+2)//2) THEN v_c END)
                / count(CASE WHEN rn IN ((n+1)//2, (n+2)//2) THEN 1 END)
                AS DOUBLE) AS median_c
    FROM r GROUP BY event_type
""")
def event_value_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").select(
        "event_type", "event_id", _cents(F.col("value")).alias("v_c"))
    wo = Window.partitionBy("event_type").orderBy("v_c", "event_id")
    wn = Window.partitionBy("event_type")
    r = e.select(
        "event_type", "v_c",
        F.row_number().over(wo).alias("rn"),
        F.count("*").over(wn).alias("n"),
    )
    mid = F.col("rn").isin(
        F.floor((F.col("n") + 1) / 2), F.floor((F.col("n") + 2) / 2))
    picked = F.when(mid, F.col("v_c"))
    return r.groupBy("event_type").agg(
        F.max("n").alias("n"),
        (F.sum(picked) / F.count(picked)).cast("double").alias("median_c"),
    )


# --- TPC-H Q3-style shipping priority (filter + 2 joins + agg + top-k) ------
@register("shipping_priority", """
    SELECT l.l_orderkey AS o_orderkey,
           CAST(sum(CAST(round(l.l_extendedprice*(1-l.l_discount)*100)
                AS BIGINT)) AS BIGINT) AS revenue_c,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING' AND l.l_shipdate > o.o_orderdate
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue_c DESC, o_orderkey
    LIMIT 20
""")
def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").filter("c_mktsegment = 'BUILDING'")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate"))
        # customer grows with scale — no forced broadcast; the pushed
        # mktsegment filter keeps it small enough for AQE to choose
        # broadcast when it fits, shuffle join when it doesn't.
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy(F.col("l_orderkey").alias("o_orderkey"),
                 "o_orderdate", "o_orderpriority")
        .agg(F.sum(_cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
             .alias("revenue_c"))
        .select("o_orderkey", "revenue_c", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue_c"), F.asc("o_orderkey"))
        .limit(20)
    )


# --- global deterministic top-k (P8 limit + W9) -----------------------------
@register("top10_orders", """
    SELECT o_orderkey, CAST(round(o_totalprice*100) AS BIGINT) AS totalprice_c
    FROM orders
    ORDER BY totalprice_c DESC, o_orderkey
    LIMIT 10
""")
def top10_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", _cents(F.col("o_totalprice")).alias("totalprice_c"))
        .orderBy(F.desc("totalprice_c"), F.asc("o_orderkey"))
        .limit(10)
    )
