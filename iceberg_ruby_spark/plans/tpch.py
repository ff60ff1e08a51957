"""TPC-H-adapted query pack — SURVEY.md §2 Tier B depth.

The testdata is TPC-H-shaped but trimmed (no partsupp table, no
commit/receipt dates, no shipmode/phone/container columns), so each query
keeps its reference plan SHAPE — the join graph, aggregation pattern, and
subquery structure that make the original interesting — with predicates
adapted to the columns that exist.  Queries needing partsupp use lineitem
as the part↔supplier relation; q4's late-ship EXISTS uses shipdate vs
orderdate; q22's "no orders" window is date-bounded (every customer here
has at least one order all-time).

Determinism follows the house rules (plans/__init__): identical aliases
both sides, DECIMAL(18,6) accumulation for double sums, unique tie-break
keys under every LIMIT, and bigint casts where Spark/DuckDB widths differ.

Scale notes are per query; the common shape: dimension sides broadcast,
ONE shuffle on the fact table for the aggregate, filters pushed into every
parquet scan.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from iceberg_ruby_spark.plans.registry import query
from iceberg_ruby_spark.plans.relational import _davg_sql, _dsum_sql, davg, dsum
from iceberg_ruby_spark.plans.tables import load, register_views


@query(
    "q02_min_acctbal_supplier",
    oracle="""
    SELECT DISTINCT p.p_partkey, p.p_name, s.s_name, s.s_acctbal
    FROM part p
    JOIN lineitem l ON l.l_partkey = p.p_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    WHERE p.p_size = 15
      AND s.s_acctbal = (
        SELECT MIN(s2.s_acctbal)
        FROM lineitem l2 JOIN supplier s2 ON s2.s_suppkey = l2.l_suppkey
        WHERE l2.l_partkey = p.p_partkey)
    ORDER BY p.p_partkey, s.s_name LIMIT 100
    """,
)
def q02_min_acctbal_supplier(spark, sf_dir):
    """TPC-H Q2 shape (min-cost supplier per part; acctbal stands in for
    the absent ps_supplycost).  The correlated MIN becomes a window over
    the part key — one shuffle on l_partkey instead of a per-part
    subquery; the supplier dim broadcasts."""
    p = load(spark, sf_dir, "part").filter(F.col("p_size") == 15)
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    joined = li.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey")).join(
        F.broadcast(p), F.col("l_partkey") == F.col("p_partkey")
    )
    w = Window.partitionBy("l_partkey")
    return (
        joined.withColumn("__min_bal", F.min("s_acctbal").over(w))
        .filter(F.col("s_acctbal") == F.col("__min_bal"))
        .select("p_partkey", "p_name", "s_name", "s_acctbal")
        .dropDuplicates(["p_partkey", "s_name", "s_acctbal"])
        .orderBy("p_partkey", "s_name")
        .limit(100)
    )


@query(
    "q04_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def q04_order_priority(spark, sf_dir):
    """TPC-H Q4 shape: priority counts over orders with a late-shipping
    line (shipdate 60+ days past orderdate — the data has no commit/
    receipt dates).  EXISTS → LeftSemi; the date filter prunes the orders
    scan before the join."""
    register_views(spark, sf_dir, "orders", "lineitem")
    return spark.sql(
        """
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey
                        AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        GROUP BY o_orderpriority ORDER BY o_orderpriority
        """
    )


@query(
    "q06_forecast_revenue",
    oracle=f"""
    SELECT {_dsum_sql('l_extendedprice * l_discount')} AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
    """,
)
def q06_forecast_revenue(spark, sf_dir):
    """TPC-H Q6: pure scan-filter-aggregate — every predicate pushes into
    the parquet scan; the single-row result needs one SinglePartition
    exchange.  The plan to beat at 100 TB is exactly this one."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"))
    )


@query(
    "q07_nation_volume",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year,
           {_dsum_sql('volume')} AS revenue
    FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                 CAST(year(l_shipdate) AS BIGINT) AS l_year,
                 l_extendedprice * (1 - l_discount) AS volume
          FROM supplier s
          JOIN lineitem l ON s.s_suppkey = l.l_suppkey
          JOIN orders o ON o.o_orderkey = l.l_orderkey
          JOIN customer c ON c.c_custkey = o.o_custkey
          JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
          JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
          WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
             OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')) shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def q07_nation_volume(spark, sf_dir):
    """TPC-H Q7: bidirectional trade volume.  supplier/customer/nation
    broadcast; lineitem⋈orders is the one big join — both sides shuffle
    on orderkey once, then one agg shuffle on the 3-part key."""
    s = load(spark, sf_dir, "supplier")
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    n1 = n.select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
        .withColumn("l_year", F.year("l_shipdate").cast("bigint"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "q08_market_share",
    oracle=f"""
    SELECT o_year,
           {_dsum_sql("CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END")}
             / {_dsum_sql('volume')} AS mkt_share
    FROM (SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
                 l.l_extendedprice * (1 - l.l_discount) AS volume,
                 n2.n_name AS supp_nation
          FROM part p
          JOIN lineitem l ON p.p_partkey = l.l_partkey
          JOIN supplier s ON s.s_suppkey = l.l_suppkey
          JOIN orders o ON o.o_orderkey = l.l_orderkey
          JOIN customer c ON c.c_custkey = o.o_custkey
          JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
          JOIN region r ON n1.n_regionkey = r.r_regionkey
          JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
          WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO') all_nations
    GROUP BY o_year ORDER BY o_year
    """,
)
def q08_market_share(spark, sf_dir):
    """TPC-H Q8: one nation's share of PROMO-part volume sold into ASIA,
    by year.  Share = conditional sum / total sum in the SAME aggregate —
    one pass, no self-join; all dims broadcast."""
    p = load(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = n.select(F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region"))
    n2 = n.select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation"))
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_region") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .withColumn("o_year", F.year("o_orderdate").cast("bigint"))
        .groupBy("o_year")
        .agg(
            (
                dsum(F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(0.0))
                / dsum(vol)
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@query(
    "q09_product_profit",
    oracle=f"""
    SELECT nation, o_year, {_dsum_sql('amount')} AS sum_profit
    FROM (SELECT n.n_name AS nation,
                 CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
                 l.l_extendedprice * (1 - l.l_discount) AS amount
          FROM part p
          JOIN lineitem l ON p.p_partkey = l.l_partkey
          JOIN supplier s ON s.s_suppkey = l.l_suppkey
          JOIN orders o ON o.o_orderkey = l.l_orderkey
          JOIN nation n ON s.s_nationkey = n.n_nationkey
          WHERE p.p_name LIKE '%gear%') profit
    GROUP BY nation, o_year ORDER BY nation, o_year DESC
    """,
)
def q09_product_profit(spark, sf_dir):
    """TPC-H Q9 shape (profit by supplier nation × year; no ps_supplycost
    in the data, so amount is discounted revenue).  part/supplier/nation
    broadcast; lineitem⋈orders carries the fact weight."""
    p = load(spark, sf_dir, "part").filter(F.col("p_name").like("%gear%"))
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders")
    n = load(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(dsum("amount").alias("sum_profit"))
        .orderBy(F.col("nation"), F.col("o_year").desc())
    )


@query(
    "q10_returned_items",
    oracle=f"""
    SELECT c.c_custkey, c.c_name,
           {_dsum_sql('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
           c.c_acctbal, n.n_name
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c.c_custkey LIMIT 20
    """,
)
def q10_returned_items(spark, sf_dir):
    """TPC-H Q10: returned-item revenue by customer, top 20 (custkey
    tie-break).  Return-flag and date filters push to the scans; nation
    broadcasts; one agg shuffle on custkey."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@query(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
          FROM customer c
          LEFT JOIN orders o ON o.o_custkey = c.c_custkey
             AND o.o_orderpriority <> '1-URGENT'
          GROUP BY c.c_custkey) c_orders
    GROUP BY c_count ORDER BY custdist DESC, c_count DESC
    """,
)
def q13_customer_distribution(spark, sf_dir):
    """TPC-H Q13: order-count histogram over a filtered LEFT join (the
    join-condition filter keeps zero-order customers — a WHERE would drop
    them).  Two agg shuffles by design: custkey, then count."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@query(
    "q14_promo_revenue",
    oracle=f"""
    SELECT 100.00 * {_dsum_sql("CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0 END")}
           / {_dsum_sql('l_extendedprice * (1 - l_discount)')} AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1996-10-01 00:00:00'
    """,
)
def q14_promo_revenue(spark, sf_dir):
    """TPC-H Q14: promo share of one month's revenue — part broadcasts,
    conditional/total sums share one aggregate."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    p = load(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            (
                F.lit(100.0)
                * dsum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / dsum(rev)
            ).alias("promo_revenue")
        )
    )


@query(
    "q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             {_dsum_sql('l_extendedprice * (1 - l_discount)')} AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey)
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s.s_suppkey
    """,
)
def q15_top_supplier(spark, sf_dir):
    """TPC-H Q15: quarter's top supplier(s) by revenue.  The revenue CTE
    computes once; the scalar MAX broadcasts back as a one-row join —
    exact-decimal sums make the double equality deterministic across
    engines."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    s = load(spark, sf_dir, "supplier")
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("total_revenue")
    )
    mx = revenue.agg(F.max("total_revenue").alias("__mx"))
    return (
        revenue.join(F.broadcast(mx), F.col("total_revenue") == F.col("__mx"))
        .join(F.broadcast(s), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@query(
    "q16_part_supplier_counts",
    oracle="""
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM part JOIN lineitem ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#5' AND p_type <> 'MEDIUM'
      AND p_size IN (1, 4, 9, 16, 25, 36, 49)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def q16_part_supplier_counts(spark, sf_dir):
    """TPC-H Q16 shape (lineitem stands in for partsupp): distinct
    supplier counts per part bucket.  COUNT(DISTINCT) expands to a
    two-phase agg — dedup on (bucket, suppkey), then count."""
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "MEDIUM")
        & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
    )
    li = load(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


@query(
    "q17_small_quantity_revenue",
    oracle=f"""
    SELECT {_dsum_sql('l.l_extendedprice')} / 7.0 AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN (SELECT l_partkey AS pk,
                 0.2 * ({_davg_sql('l_quantity')}) AS qty_thresh
          FROM lineitem GROUP BY l_partkey) t ON t.pk = l.l_partkey
    WHERE p.p_brand = 'Brand#23' AND l.l_quantity < t.qty_thresh
    """,
)
def q17_small_quantity_revenue(spark, sf_dir):
    """TPC-H Q17: revenue from below-average-quantity orders of one
    brand.  The per-part average is a groupBy of the SAME lineitem scan
    joined back (Spark reuses the exchange); exact-decimal averages keep
    the threshold comparison engine-identical."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23")
    thresh = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (F.lit(0.2) * davg("l_quantity")).alias("qty_thresh")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(thresh, F.col("l_partkey") == F.col("pk"))
        .filter(F.col("l_quantity") < F.col("qty_thresh"))
        .agg((dsum("l_extendedprice") / 7.0).alias("avg_yearly"))
    )


@query(
    "q18_large_volume_customers",
    oracle=f"""
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
           {_dsum_sql('l.l_quantity')} AS total_qty
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(18,6))) > 250)
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    ORDER BY o.o_totalprice DESC, o.o_orderkey LIMIT 100
    """,
)
def q18_large_volume_customers(spark, sf_dir):
    """TPC-H Q18: customers behind >250-unit orders (top 100, orderkey
    tie-break).  The HAVING subquery is a semi-join of lineitem's own
    aggregate — one extra shuffle on orderkey, reused by the outer agg."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,6)")).alias("__q"))
        .filter(F.col("__q") > 250)
        .select("l_orderkey")
    )
    return (
        li.join(big.withColumnRenamed("l_orderkey", "__bok"), F.col("l_orderkey") == F.col("__bok"), "left_semi")
        .join(o, F.col("l_orderkey") == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(dsum("l_quantity").alias("total_qty"))
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


@query(
    "q19_bracketed_revenue",
    oracle=f"""
    SELECT {_dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity >= 1 AND l_quantity <= 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity >= 10 AND l_quantity <= 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 20 AND l_quantity <= 30)
    """,
)
def q19_bracketed_revenue(spark, sf_dir):
    """TPC-H Q19: three OR'd brand/size/quantity brackets over one
    broadcast join — the disjunction stays a single post-join filter
    (no union of three scans)."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    q = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5) & (q >= 1) & (q <= 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10) & (q >= 10) & (q <= 20))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 15) & (q >= 20) & (q <= 30))
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )


@query(
    "q20_forest_part_suppliers",
    oracle=f"""
    SELECT s.s_name, s.s_nationkey
    FROM supplier s
    WHERE s.s_suppkey IN (
      SELECT l_suppkey
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_name LIKE 'red%'
        AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY l_suppkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(18,6))) > 100)
    ORDER BY s.s_name, s.s_nationkey
    """,
)
def q20_forest_part_suppliers(spark, sf_dir):
    """TPC-H Q20 shape: suppliers who moved >100 units of 'red' parts in
    1996 (lineitem stands in for partsupp availability).  The inner agg
    produces a tiny key set — broadcast semi-join back to supplier."""
    s = load(spark, sf_dir, "supplier")
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    p = load(spark, sf_dir, "part").filter(F.col("p_name").like("red%"))
    keys = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,6)")).alias("__q"))
        .filter(F.col("__q") > 100)
        .select("l_suppkey")
    )
    return (
        s.join(F.broadcast(keys), s.s_suppkey == F.col("l_suppkey"), "left_semi")
        .select("s_name", "s_nationkey")
        .orderBy("s_name", "s_nationkey")
    )


@query(
    "q22_idle_rich_customers",
    oracle=f"""
    SELECT c_nationkey, COUNT(*) AS numcust,
           {_dsum_sql('c_acctbal')} AS totacctbal
    FROM customer c
    WHERE c_acctbal > (
        SELECT {_davg_sql('c_acctbal')} FROM customer WHERE c_acctbal > 0.0)
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
    GROUP BY c_nationkey ORDER BY c_nationkey
    """,
)
def q22_idle_rich_customers(spark, sf_dir):
    """TPC-H Q22 shape: above-average-balance customers with no RECENT
    orders (every customer here has some order all-time), bucketed by
    nation key.  The scalar average broadcasts; the NOT EXISTS is an
    anti-join against a date-pruned orders scan."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(davg("c_acctbal").alias("__avg"))
    return (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("__avg"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("numcust"), dsum("c_acctbal").alias("totacctbal"))
        .orderBy("c_nationkey")
    )


@query(
    "q11_important_parts",
    oracle=f"""
    WITH v AS (
      SELECT l.l_partkey,
             {_dsum_sql('l.l_extendedprice * (1 - l.l_discount)')} AS value
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      WHERE n.n_name = 'NATION_7'
      GROUP BY l.l_partkey
    )
    SELECT l_partkey, value FROM v
    WHERE value > (SELECT SUM(value) * 0.002 FROM v)
    """,
)
def q11_important_parts(spark, sf_dir):
    """TPC-H Q11 shape (important stock): per-part value within one
    nation's suppliers, kept where the part exceeds a fraction of the
    national total.  lineitem stands in for the absent partsupp.  Plan:
    dims broadcast into ONE fact aggregate; the national total is a
    scalar aggregate of that same result, broadcast back as a cross-join
    scalar — no correlated per-part subquery, no second fact scan."""
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    v = (
        li.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("l_partkey")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("value"))
    )
    total = v.agg((F.sum(F.col("value").cast("decimal(18,6)")).cast("double") * F.lit(0.002)).alias("__t"))
    return (
        v.crossJoin(F.broadcast(total))
        .filter(F.col("value") > F.col("__t"))
        .select("l_partkey", "value")
    )


@query(
    "q12_late_priority_lines",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
    GROUP BY l_returnflag
    """,
)
def q12_late_priority_lines(spark, sf_dir):
    """TPC-H Q12 shape (priority split over late shipments): the absent
    shipmode/commit/receipt columns become returnflag grouping and a
    ship-vs-order-date lateness predicate; the conditional-count pair
    over one fact join is the query's defining pattern.  Orders broadcast
    is wrong at scale (orders is a fact); the equality join shuffles both
    sides once and the counts partial-aggregate map-side."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
    )


@query(
    "q21_waiting_suppliers",
    oracle="""
    SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name LIMIT 100
    """,
)
def q21_waiting_suppliers(spark, sf_dir):
    """TPC-H Q21 shape (suppliers who kept orders waiting): multi-supplier
    orders where exactly this supplier shipped late.  The EXISTS / NOT
    EXISTS pair — the original's defining feature — decorrelates into two
    orderkey aggregates: distinct-supplier count ≥ 2 (EXISTS another
    supplier) and distinct LATE-supplier count = 1 (NOT EXISTS another
    late one; the late line's own supplier is that one by construction).
    Two semi-joins on the compact aggregates replace per-row subqueries —
    the only scale-safe decorrelation."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = load(spark, sf_dir, "lineitem")
    lo = li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
    late = lo.filter(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAY")
    )
    multi = (
        lo.groupBy("l_orderkey")
        .agg(F.countDistinct("l_suppkey").alias("__ns"))
        .filter(F.col("__ns") >= 2)
        .select("l_orderkey")
    )
    sole_late = (
        late.groupBy("l_orderkey")
        .agg(F.countDistinct("l_suppkey").alias("__nl"))
        .filter(F.col("__nl") == 1)
        .select("l_orderkey")
    )
    s = load(spark, sf_dir, "supplier")
    return (
        late.join(multi, "l_orderkey", "left_semi")
        .join(sole_late, "l_orderkey", "left_semi")
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(100)
    )
