"""Relational query library — SURVEY.md §2 Tier B coverage.

Each query is idiomatic DataFrame API (Catalyst plans it; AQE picks the
physical join/agg strategy) with a DuckDB oracle twin.  Queries that
exercise the SQL surface itself (grouping sets, CTEs, subqueries) go
through ``spark.sql`` over temp views — that *is* the product's
``catalog.sql`` path.

Float determinism: ``dsum``/``davg`` accumulate exactly in DECIMAL(18,6)
and cast back to double — see plans/__init__ docstring.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_ruby_spark.plans.registry import query
from iceberg_ruby_spark.plans.tables import load, register_views


def dsum(col) -> Column:
    """Order-independent double sum: exact decimal accumulation."""
    c = col if isinstance(col, Column) else F.col(col)
    return F.sum(c.cast("decimal(18,6)")).cast("double")


def davg(col) -> Column:
    """Order-independent double mean: exact decimal sum / count."""
    c = col if isinstance(col, Column) else F.col(col)
    return F.sum(c.cast("decimal(18,6)")).cast("double") / F.count(c)


def _dsum_sql(expr: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,6))) AS DOUBLE)"


def _davg_sql(expr: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,6))) AS DOUBLE) / COUNT({expr})"


# ---------------------------------------------------------------------------
# scans / filters / projections
# ---------------------------------------------------------------------------



def _q01_production(spark, sf_dir):
    """q01 in its PRODUCTION arithmetic: plain double sums/avgs (what the
    reference's engine computes).  The registered query's DECIMAL(18,6)
    accumulation exists only to make float summation order-independent for
    the DuckDB hash oracle — measured 4-5x the aggregate cost at sf0.1
    (1.3s vs 0.27s steady-state).  bench.py times THIS form."""
    li = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum("l_extendedprice").alias("sum_base_price"),
            F.sum(disc_price).alias("sum_disc_price"),
            F.sum(charge).alias("sum_charge"),
            F.avg("l_quantity").alias("avg_qty"),
            F.avg("l_extendedprice").alias("avg_price"),
            F.avg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "q01_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {_dsum_sql('l_quantity')} AS sum_qty,
           {_dsum_sql('l_extendedprice')} AS sum_base_price,
           {_dsum_sql('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
           {_dsum_sql('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
           {_davg_sql('l_quantity')} AS avg_qty,
           {_davg_sql('l_extendedprice')} AS avg_price,
           {_davg_sql('l_discount')} AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    bench=True,
    bench_fn=_q01_production,
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 adapted to the testdata schema — the flagship filter →
    groupBy → agg (reference SQL surface spec: test/sql_test.rb:10-114)."""
    li = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "scan_filter_project",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_shipdate
    FROM lineitem
    WHERE l_quantity > 45 AND l_shipdate >= TIMESTAMP '2000-01-01 00:00:00'
    """,
    bench=True,
)
def scan_filter_project(spark, sf_dir):
    """Predicate + projection pushed into the Parquet scan (verify with
    .explain: PushedFilters + pruned ReadSchema)."""
    return (
        load(spark, sf_dir, "lineitem")
        .filter((F.col("l_quantity") > 45) & (F.col("l_shipdate") >= F.lit("2000-01-01").cast("timestamp")))
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_shipdate")
    )


@query(
    "projection_rename",
    oracle="""
    SELECT p_partkey AS pk, upper(p_name) AS name_upper,
           CAST(round(p_retailprice * 1.1, 2) AS DOUBLE) AS adj_price
    FROM part
    """,
)
def projection_rename(spark, sf_dir):
    return load(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("pk"),
        F.upper("p_name").alias("name_upper"),
        F.round(F.col("p_retailprice") * 1.1, 2).cast("double").alias("adj_price"),
    )


@query(
    "topk_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
    """,
)
def topk_orders(spark, sf_dir):
    """orderBy+limit → TakeOrderedAndProject (no full sort at scale)."""
    return (
        load(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@query(
    "sort_limit_offset",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 100 OFFSET 50
    """,
)
def sort_limit_offset(spark, sf_dir):
    return (
        load(spark, sf_dir, "lineitem")
        .orderBy("l_orderkey", "l_linenumber")
        .offset(50)
        .limit(100)
        .select("l_orderkey", "l_linenumber", "l_quantity")
    )


@query("distinct_pairs", oracle="SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem")
def distinct_pairs(spark, sf_dir):
    return load(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()


# ---------------------------------------------------------------------------
# joins
# ---------------------------------------------------------------------------


@query(
    "join_inner_agg",
    oracle=f"""
    SELECT c.c_custkey, c.c_name, COUNT(*) AS n_orders,
           {_dsum_sql('o.o_totalprice')} AS total_spent
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey, c.c_name
    """,
    bench=True,
)
def join_inner_agg(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(F.count(F.lit(1)).alias("n_orders"), dsum("o_totalprice").alias("total_spent"))
    )


@query(
    "join_left_zero_counts",
    oracle="""
    SELECT c.c_custkey, COUNT(o.o_orderkey) AS n_orders
    FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey
    """,
)
def join_left_zero_counts(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@query(
    "join_right",
    oracle="""
    SELECT c.c_custkey, c.c_mktsegment, o.o_orderkey
    FROM orders o RIGHT JOIN customer c ON c.c_custkey = o.o_custkey
    WHERE c.c_acctbal < -900
    """,
)
def join_right(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return (
        o.join(c, c.c_custkey == o.o_custkey, "right")
        .filter(F.col("c_acctbal") < -900)
        .select("c_custkey", "c_mktsegment", "o_orderkey")
    )


@query(
    "join_full_outer",
    oracle="""
    WITH cn AS (SELECT c_nationkey AS nk, COUNT(*) AS n_cust FROM customer GROUP BY c_nationkey),
         sn AS (SELECT s_nationkey AS nk, COUNT(*) AS n_supp FROM supplier GROUP BY s_nationkey)
    SELECT COALESCE(cn.nk, sn.nk) AS nationkey,
           COALESCE(cn.n_cust, 0) AS n_cust, COALESCE(sn.n_supp, 0) AS n_supp
    FROM cn FULL OUTER JOIN sn ON cn.nk = sn.nk
    """,
)
def join_full_outer(spark, sf_dir):
    cn = (
        load(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    sn = (
        load(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return (
        cn.join(sn, "nk", "full")
        .select(
            F.col("nk").alias("nationkey"),
            F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
            F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
        )
    )


@query(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
    """,
)
def join_semi(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@query(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def join_anti(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@query(
    "join_cross",
    oracle="SELECT r.r_name, n.n_name FROM region r CROSS JOIN nation n",
)
def join_cross(spark, sf_dir):
    return load(spark, sf_dir, "region").crossJoin(load(spark, sf_dir, "nation")).select(
        "r_name", "n_name"
    )


@query(
    "join_broadcast_dim",
    oracle=f"""
    SELECT p.p_brand, COUNT(*) AS n, {_dsum_sql('l.l_extendedprice')} AS revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_size > 40
    GROUP BY p.p_brand
    """,
    bench=True,
)
def join_broadcast_dim(spark, sf_dir):
    """Fact⨝dim with an explicit broadcast hint — the 100 TB plan shape
    (dim replicated, fact never shuffled for the join)."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_size") > 40)
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n"), dsum("l_extendedprice").alias("revenue"))
    )


@query(
    "join_salted_skew",
    bench=True,
    oracle=f"""
    SELECT o.o_orderpriority,
           COUNT(*) AS n,
           {_dsum_sql('l.l_quantity')} AS sum_qty
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
)
def join_salted_skew(spark, sf_dir):
    """Skew-salted fact⨝fact (operators/skew.py ``salted_join``): the
    probe side spreads each hot join key over 8 deterministic sub-keys;
    the build side replicates 8× by an in-row explode (no shuffle for
    the replication itself), and the join hash-partitions on
    (key, salt) so one hot key lands on 8 reducers instead of one
    straggler.  Row-identical to the plain join by construction — the
    oracle IS the plain join."""
    from iceberg_ruby_spark.operators.skew import salted_join

    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    o = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    j = salted_join(li, o, on="l_orderkey", salt=8)
    return j.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"), dsum("l_quantity").alias("sum_qty")
    )


@query(
    "agg_salted_count_distinct",
    oracle="""
    SELECT user_id, COUNT(DISTINCT event_type) AS n_distinct
    FROM events
    GROUP BY user_id
    """,
)
def agg_salted_count_distinct(spark, sf_dir):
    """Hot-key COUNT(DISTINCT) (operators/skew.py
    ``salted_count_distinct``): the distinct set is bucketed by
    hash(value) % 16 so a dominant key's set is built on 16 reducers;
    value-disjoint buckets make the final integer sum exact — the oracle
    is the plain COUNT(DISTINCT)."""
    from iceberg_ruby_spark.operators.skew import salted_count_distinct

    ev = load(spark, sf_dir, "events")
    return salted_count_distinct(ev, "user_id", "event_type", salt=16)


@query(
    "join_range_theta",
    oracle="""
    SELECT s.s_suppkey, COUNT(*) AS n_close
    FROM supplier s JOIN customer c
      ON c.c_acctbal BETWEEN s.s_acctbal - 100 AND s.s_acctbal + 100
    GROUP BY s.s_suppkey
    """,
)
def join_range_theta(spark, sf_dir):
    """Non-equi (range) join → BroadcastNestedLoopJoin on the small side."""
    s = load(spark, sf_dir, "supplier")
    c = load(spark, sf_dir, "customer")
    cond = (c.c_acctbal >= s.s_acctbal - 100) & (c.c_acctbal <= s.s_acctbal + 100)
    return s.join(c, cond).groupBy("s_suppkey").agg(F.count(F.lit(1)).alias("n_close"))



def _q3_production(spark, sf_dir):
    """q3 with plain double revenue sum (see _q01_production)."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


@query(
    "q3_shipping_priority",
    oracle=f"""
    SELECT l.l_orderkey,
           {_dsum_sql('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l.l_orderkey LIMIT 10
    """,
    bench=True,
    bench_fn=_q3_production,
)
def q3_shipping_priority(spark, sf_dir):
    """TPC-H Q3 adapted: 3-way join, agg, top-k."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )



def _q5_production(spark, sf_dir):
    """q5 with plain double revenue sum (see _q01_production)."""
    r = load(spark, sf_dir, "region")
    n = load(spark, sf_dir, "nation")
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem")
    return (
        F.broadcast(r)
        .join(n, n.n_regionkey == r.r_regionkey)
        .join(c, c.c_nationkey == n.n_nationkey)
        .join(o, o.o_custkey == c.c_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("r_name", "n_name")
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )


@query(
    "q5_nation_revenue",
    oracle=f"""
    SELECT r.r_name, n.n_name,
           {_dsum_sql('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
    FROM region r
    JOIN nation n ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY r.r_name, n.n_name
    """,
    bench=True,
    bench_fn=_q5_production,
)
def q5_nation_revenue(spark, sf_dir):
    """TPC-H Q5 adapted: 5-way star join — dims broadcast, one fact shuffle."""
    r = load(spark, sf_dir, "region")
    n = load(spark, sf_dir, "nation")
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem")
    return (
        F.broadcast(r)
        .join(n, n.n_regionkey == r.r_regionkey)
        .join(c, c.c_nationkey == n.n_nationkey)
        .join(o, o.o_custkey == c.c_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("r_name", "n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )


# ---------------------------------------------------------------------------
# aggregation
# ---------------------------------------------------------------------------


@query(
    "agg_global",
    oracle=f"""
    SELECT COUNT(*) AS n_rows, COUNT(DISTINCT l_orderkey) AS n_orders,
           MIN(l_shipdate) AS first_ship, MAX(l_shipdate) AS last_ship,
           {_dsum_sql('l_extendedprice')} AS total_price,
           {_davg_sql('l_discount')} AS mean_discount
    FROM lineitem
    """,
)
def agg_global(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.min("l_shipdate").alias("first_ship"),
        F.max("l_shipdate").alias("last_ship"),
        dsum("l_extendedprice").alias("total_price"),
        davg("l_discount").alias("mean_discount"),
    )


@query(
    "agg_having",
    oracle=f"""
    SELECT o_orderpriority, COUNT(*) AS n, {_davg_sql('o_totalprice')} AS avg_price
    FROM orders GROUP BY o_orderpriority HAVING COUNT(*) > 100
    """,
)
def agg_having(spark, sf_dir):
    return (
        load(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), davg("o_totalprice").alias("avg_price"))
        .filter(F.col("n") > 100)
    )


@query(
    "count_distinct_by_group",
    oracle="""
    SELECT o_orderpriority, COUNT(DISTINCT o_custkey) AS n_custs FROM orders
    GROUP BY o_orderpriority
    """,
)
def count_distinct_by_group(spark, sf_dir):
    return (
        load(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(F.countDistinct("o_custkey").alias("n_custs"))
    )


@query(
    "approx_count_distinct",
    # The raw HLL++ estimate is engine-specific (DuckDB's HLL lands on a
    # different value), so the hash-checkable contract is the accuracy
    # envelope: the exact cardinality plus a boolean pinning the sketch
    # estimate within 3× the requested relative standard deviation (the
    # estimate itself is deterministic — HLL has no RNG — so the boolean
    # is stable; 3σ at rsd=0.05 makes flakiness astronomically unlikely).
    oracle="""
    SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
           TRUE AS approx_within_3rsd
    FROM lineitem
    """,
)
def approx_count_distinct(spark, sf_dir):
    rsd = 0.05
    return (
        load(spark, sf_dir, "lineitem")
        .agg(
            F.approx_count_distinct("l_orderkey", rsd).alias("approx_orders"),
            F.count_distinct("l_orderkey").alias("exact_orders"),
        )
        .select(
            "exact_orders",
            (
                F.abs(F.col("approx_orders") - F.col("exact_orders"))
                <= 3 * rsd * F.col("exact_orders")
            ).alias("approx_within_3rsd"),
        )
    )


@query(
    "grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """,
)
def grouping_sets(spark, sf_dir):
    """Via the SQL surface (GROUPING SETS has no DataFrame builder)."""
    register_views(spark, sf_dir, "lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        """
    )


@query(
    "rollup_counts",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def rollup_counts(spark, sf_dir):
    return (
        load(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "cube_counts",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def cube_counts(spark, sf_dir):
    return (
        load(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# ---------------------------------------------------------------------------
# window functions
# ---------------------------------------------------------------------------


@query(
    "window_ranking",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           CAST(rn AS INTEGER) AS rn, CAST(rk AS INTEGER) AS rk, CAST(drk AS INTEGER) AS drk
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER w AS rn, rank() OVER w AS rk, dense_rank() OVER w AS drk
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    ) WHERE rn <= 3
    """,
    bench=True,
)
def window_ranking(spark, sf_dir):
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        load(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rk"),
            F.dense_rank().over(w).alias("drk"),
        )
        .filter(F.col("rn") <= 3)
    )


@query(
    "window_lag_lead",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           lag(o_totalprice) OVER w AS prev_price,
           lead(o_totalprice) OVER w AS next_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def window_lag_lead(spark, sf_dir):
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return load(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
    )


@query(
    "window_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
    FROM orders
    """,
)
def window_running_sum(spark, sf_dir):
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return load(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(18,6)")).over(w).cast("double").alias("running_total"),
    )


@query(
    "window_range_frame",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber, l_quantity,
           COUNT(*) OVER (PARTITION BY l_suppkey ORDER BY l_quantity
                          RANGE BETWEEN 5 PRECEDING AND CURRENT ROW) AS n_similar
    FROM lineitem
    """,
)
def window_range_frame(spark, sf_dir):
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy("l_quantity")
        .rangeBetween(-5, Window.currentRow)
    )
    return load(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        F.count(F.lit(1)).over(w).alias("n_similar"),
    )


@query(
    "window_ntile",
    oracle="""
    SELECT tile, COUNT(*) AS n,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS bal_sum
    FROM (SELECT CAST(ntile(4) OVER (ORDER BY c_acctbal, c_custkey) AS INTEGER) AS tile,
                 c_acctbal
          FROM customer)
    GROUP BY tile
    """,
)
def window_ntile(spark, sf_dir):
    df = load(spark, sf_dir, "customer").select("c_acctbal", "c_custkey")
    tiled = distributed_ntile(df, 4, ["c_acctbal", "c_custkey"])
    return tiled.groupBy("tile").agg(
        F.count(F.lit(1)).alias("n"), dsum("c_acctbal").alias("bal_sum")
    )


def distributed_ntile(df: DataFrame, n_tiles: int, order_cols: list) -> DataFrame:
    """Exact ``ntile(n) OVER (ORDER BY ...)`` without a global single-task
    WindowExec (the one plan Spark warns "No Partition Defined ... serious
    performance degradation" about — at 100 TB it moves the whole table into
    ONE task).

    Scale-safe shape (the distributed zip-with-index-over-sort pattern):

    1. ``repartitionByRange`` on the sort key — Spark's range partitioner
       samples boundaries, so partitions hold disjoint, ordered key ranges.
    2. per-partition counts (ONE tiny agg: ≤ shuffle-partitions rows to the
       driver) → cumulative start offsets per partition.
    3. global position = partition offset + per-PARTITION row_number (a
       window partitioned by ``spark_partition_id`` — every task windows its
       own slice in parallel).
    4. the ntile bucket from its arithmetic definition: with ``q, r =
       divmod(N, n)``, the first ``r`` tiles take ``q+1`` rows, the rest
       ``q`` — a pure Column expression, no second pass.

    Cost: the counts agg is a separate job, so the 2-column projected input
    is scanned and range-shuffled twice (Spark reuses exchanges within a
    plan, not across actions).  Two parallel sort-shuffles of a pruned
    projection beat ONE task holding the whole table at any scale; callers
    tiling an expensive upstream should persist it first.  Adds ``tile``
    (1-based INT, exact ntile semantics)."""
    q_parts = max(int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")), 1)
    ranged = (
        df.repartitionByRange(q_parts, *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("_pid", F.spark_partition_id())
    )
    sizes = {r["_pid"]: r["cnt"] for r in ranged.groupBy("_pid").agg(
        F.count(F.lit(1)).alias("cnt")).collect()}
    total = sum(sizes.values())
    offsets, acc = {}, 0
    for pid in sorted(sizes):
        offsets[pid] = acc
        acc += sizes[pid]
    off_expr = F.element_at(
        F.create_map(*[F.lit(x) for kv in sorted(offsets.items()) for x in kv]),
        F.col("_pid"),
    ) if offsets else F.lit(0)
    w = Window.partitionBy("_pid").orderBy(*order_cols)
    pos = (off_expr + F.row_number().over(w) - F.lit(1)).cast("long")
    q, r = divmod(total, n_tiles)
    if q == 0:
        tile = pos + F.lit(1)  # fewer rows than tiles: one row per tile
    else:
        big = r * (q + 1)  # rows covered by the r larger tiles
        tile = (
            F.when(pos < F.lit(big), F.floor(pos / F.lit(q + 1)))
            .otherwise(F.lit(r) + F.floor((pos - F.lit(big)) / F.lit(q)))
            + F.lit(1)
        )
    return ranged.withColumn("tile", tile.cast("int")).drop("_pid")


# ---------------------------------------------------------------------------
# set operations
# ---------------------------------------------------------------------------


@query(
    "union_all_counts",
    oracle="""
    SELECT src, COUNT(*) AS n FROM (
      SELECT 'order' AS src, o_orderkey AS k FROM orders
      UNION ALL
      SELECT 'line' AS src, l_orderkey AS k FROM lineitem
    ) GROUP BY src
    """,
)
def union_all_counts(spark, sf_dir):
    o = load(spark, sf_dir, "orders").select(
        F.lit("order").alias("src"), F.col("o_orderkey").alias("k")
    )
    li = load(spark, sf_dir, "lineitem").select(
        F.lit("line").alias("src"), F.col("l_orderkey").alias("k")
    )
    return o.unionByName(li).groupBy("src").agg(F.count(F.lit(1)).alias("n"))


@query(
    "union_distinct",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_acctbal > 9000
    UNION
    SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 400000
    """,
)
def union_distinct(spark, sf_dir):
    a = load(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9000).select("c_custkey")
    b = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 400000)
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return a.union(b).distinct()


@query(
    "intersect_keys",
    oracle="""
    SELECT o_custkey AS k FROM orders WHERE o_orderdate < TIMESTAMP '1995-03-01 00:00:00'
    INTERSECT
    SELECT c_custkey AS k FROM customer WHERE c_acctbal > 0
    """,
)
def intersect_keys(spark, sf_dir):
    a = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") < F.lit("1995-03-01").cast("timestamp"))
        .select(F.col("o_custkey").alias("k"))
    )
    b = load(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 0).select(
        F.col("c_custkey").alias("k")
    )
    return a.intersect(b)


@query(
    "except_keys",
    oracle="""
    SELECT c_custkey AS k FROM customer
    EXCEPT
    SELECT o_custkey AS k FROM orders
    """,
)
def except_keys(spark, sf_dir):
    a = load(spark, sf_dir, "customer").select(F.col("c_custkey").alias("k"))
    b = load(spark, sf_dir, "orders").select(F.col("o_custkey").alias("k"))
    return a.exceptAll(b).distinct()


# ---------------------------------------------------------------------------
# scalar function groups
# ---------------------------------------------------------------------------


@query(
    "string_functions",
    oracle="""
    SELECT p_partkey,
           upper(p_name) AS up, lower(p_brand) AS lo,
           CAST(length(p_name) AS INTEGER) AS name_len,
           substr(p_name, 1, 5) AS prefix5,
           concat(p_brand, '-', p_type) AS brand_type,
           replace(p_type, ' ', '_') AS type_snake,
           reverse(p_brand) AS brand_rev,
           starts_with(p_type, 'a') AS is_a
    FROM part
    """,
)
def string_functions(spark, sf_dir):
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("up"),
        F.lower("p_brand").alias("lo"),
        F.length("p_name").alias("name_len"),
        F.substring("p_name", 1, 5).alias("prefix5"),
        F.concat_ws("-", "p_brand", "p_type").alias("brand_type"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
        F.reverse(F.col("p_brand")).alias("brand_rev"),
        F.startswith(F.col("p_type"), F.lit("a")).alias("is_a"),
    )


@query(
    "date_functions",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INTEGER) AS yr,
           CAST(month(o_orderdate) AS INTEGER) AS mo,
           CAST(day(o_orderdate) AS INTEGER) AS dom,
           CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(date_diff('day', o_orderdate, TIMESTAMP '2000-01-01 00:00:00') AS INTEGER) AS days_to_y2k
    FROM orders
    """,
)
def date_functions(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.quarter("o_orderdate").alias("qtr"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.datediff(F.lit("2000-01-01").cast("date"), F.col("o_orderdate").cast("date")).alias(
            "days_to_y2k"
        ),
    )


@query(
    "math_functions",
    oracle="""
    SELECT p_partkey,
           abs(p_retailprice - 1000) AS dist_1k,
           CAST(ceil(p_retailprice) AS DOUBLE) AS price_ceil,
           CAST(floor(p_retailprice) AS DOUBLE) AS price_floor,
           round(sqrt(p_retailprice), 6) AS price_sqrt,
           round(ln(p_retailprice + 1), 6) AS price_ln,
           round(power(CAST(p_size AS DOUBLE), 2.0), 6) AS size_sq,
           CAST(p_size % 7 AS INTEGER) AS size_mod7,
           CAST(sign(p_retailprice - 1000) AS DOUBLE) AS sign_1k
    FROM part
    """,
)
def math_functions(spark, sf_dir):
    p = load(spark, sf_dir, "part")
    price = F.col("p_retailprice")
    return p.select(
        "p_partkey",
        F.abs(price - 1000).alias("dist_1k"),
        F.ceil(price).cast("double").alias("price_ceil"),
        F.floor(price).cast("double").alias("price_floor"),
        F.round(F.sqrt(price), 6).alias("price_sqrt"),
        F.round(F.log(price + 1), 6).alias("price_ln"),
        F.round(F.pow(F.col("p_size").cast("double"), F.lit(2.0)), 6).alias("size_sq"),
        (F.col("p_size") % 7).alias("size_mod7"),
        F.signum(price - 1000).cast("double").alias("sign_1k"),
    )


@query(
    "case_cast_coalesce",
    oracle="""
    SELECT bucket, COUNT(*) AS n FROM (
      SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
                  WHEN o_totalprice < 200000 THEN 'medium'
                  ELSE 'large' END AS bucket
      FROM orders
    ) GROUP BY bucket
    """,
)
def case_cast_coalesce(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") < 50000, "small")
        .when(F.col("o_totalprice") < 200000, "medium")
        .otherwise("large")
        .alias("bucket")
    )
    return o.select(bucket).groupBy("bucket").agg(F.count(F.lit(1)).alias("n"))


@query(
    "cast_nullif",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(l_quantity AS INTEGER) AS qty_int,
           CAST(l_orderkey AS VARCHAR) AS key_str,
           COALESCE(NULLIF(l_returnflag, 'N'), 'X') AS flag_or_x
    FROM lineitem
    """,
)
def cast_nullif(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").cast("int").alias("qty_int"),
        F.col("l_orderkey").cast("string").alias("key_str"),
        F.coalesce(F.nullif(F.col("l_returnflag"), F.lit("N")), F.lit("X")).alias("flag_or_x"),
    )


@query(
    "array_functions",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split_regex(trim(text), '\\s+')) AS INTEGER) AS n_tokens,
           CAST(len(list_distinct(string_split_regex(trim(text), '\\s+'))) AS INTEGER) AS n_unique,
           list_contains(string_split_regex(trim(text), '\\s+'), 'spark') AS has_spark,
           array_to_string(string_split_regex(trim(text), '\\s+')[1:3], ' ') AS first3
    FROM documents
    """,
)
def array_functions(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_unique"),
        F.array_contains(toks, "spark").alias("has_spark"),
        F.array_join(F.slice(toks, 1, 3), " ").alias("first3"),
    )


@query(
    "json_functions",
    oracle=f"""
    SELECT event_type,
           COUNT(*) AS n,
           {_davg_sql("CAST(json_extract_string(props, '$.k') AS INTEGER)")} AS avg_k
    FROM events GROUP BY event_type
    """,
)
def json_functions(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), davg(k).alias("avg_k")
    )


# ---------------------------------------------------------------------------
# subqueries / CTEs (through the SQL surface)
# ---------------------------------------------------------------------------

_CTE_SQL = """
WITH big_orders AS (
  SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE o_totalprice > 300000
)
SELECT c.c_mktsegment, COUNT(*) AS n,
       CAST(SUM(CAST(b.o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total
FROM big_orders b JOIN customer c ON c.c_custkey = b.o_custkey
GROUP BY c.c_mktsegment
"""


@query("cte_join_agg", oracle=_CTE_SQL)
def cte_join_agg(spark, sf_dir):
    register_views(spark, sf_dir, "orders", "customer")
    return spark.sql(_CTE_SQL)


_SCALAR_SUBQ_SQL = """
SELECT o_orderkey, o_totalprice FROM orders
WHERE o_totalprice > 2 * (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
                                 / COUNT(*) FROM orders)
"""


@query("scalar_subquery", oracle=_SCALAR_SUBQ_SQL)
def scalar_subquery(spark, sf_dir):
    register_views(spark, sf_dir, "orders")
    return spark.sql(_SCALAR_SUBQ_SQL)


_IN_SUBQ_SQL = """
SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
WHERE l_orderkey IN (
  SELECT o_orderkey FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
)
"""


@query("in_subquery", oracle=_IN_SUBQ_SQL)
def in_subquery(spark, sf_dir):
    register_views(spark, sf_dir, "orders", "lineitem")
    return spark.sql(_IN_SUBQ_SQL)


_CORR_EXISTS_SQL = """
SELECT s_suppkey, s_name FROM supplier s
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity >= 50)
"""


@query("correlated_exists", oracle=_CORR_EXISTS_SQL)
def correlated_exists(spark, sf_dir):
    register_views(spark, sf_dir, "supplier", "lineitem")
    return spark.sql(_CORR_EXISTS_SQL)


# ---------------------------------------------------------------------------
# as-of join (extension operator — SURVEY §2 Tier B names it)
# ---------------------------------------------------------------------------


@query(
    "asof_join_events",
    oracle="""
    SELECT p.event_id, p.user_id, p.ts, p.value, v.value AS last_view_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON p.user_id = v.user_id AND v.ts <= p.ts
    """,
    bench=True,
)
def asof_join_events(spark, sf_dir):
    """As-of join: each purchase gets the latest preceding view's value per
    user — single-shuffle union+window plan (operators/asof.py)."""
    from iceberg_ruby_spark.operators.asof import asof_join

    e = load(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    views = e.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("value").alias("last_view_value")
    )
    return asof_join(purchases, views, on="ts", by=["user_id"])


@query(
    "asof_join_forward",
    oracle="""
    SELECT p.event_id, p.user_id, p.ts, p.value,
           v.value AS next_view_value, v.ts AS next_view_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * REPLACE (
                      CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END
                      AS value)
                    FROM events WHERE event_type = 'view') v
      ON p.user_id = v.user_id AND v.ts >= p.ts
    """,
)
def asof_join_forward(spark, sf_dir):
    """Forward as-of join (operators/asof.py direction='forward'): each
    purchase gets the EARLIEST following view per user — the mirror
    window of the backward plan, same single shuffle.  Every 7th view's
    value is nulled on BOTH sides and the matched ts rides along, so the
    oracle distinguishes wholesale-row attach (pandas/DuckDB ASOF) from
    per-column NULL back-fill — the VERDICT r8 #2 wrong-answer class."""
    from iceberg_ruby_spark.operators.asof import asof_join

    e = load(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    views = e.filter(F.col("event_type") == "view").select(
        "user_id",
        "ts",
        F.when(F.col("event_id") % 7 == 0, F.lit(None))
        .otherwise(F.col("value"))
        .alias("next_view_value"),
        F.col("ts").alias("next_view_ts"),
    )
    return asof_join(purchases, views, on="ts", by=["user_id"], direction="forward")


@query(
    "asof_join_nearest_tolerance",
    oracle="""
    WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
         v AS (SELECT * REPLACE (
                 CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END
                 AS value)
               FROM events WHERE event_type = 'view'),
         b AS (
           SELECT p.event_id, v.ts AS mts, v.value AS mval
           FROM p ASOF LEFT JOIN v
             ON p.user_id = v.user_id AND v.ts <= p.ts
         ),
         f AS (
           SELECT p.event_id, v.ts AS mts, v.value AS mval
           FROM p ASOF LEFT JOIN v
             ON p.user_id = v.user_id AND v.ts >= p.ts
         )
    SELECT p.event_id, p.user_id, p.ts, p.value,
           CASE WHEN pk.mts IS NOT NULL
                     AND abs(epoch(p.ts) - epoch(pk.mts)) <= 600
                THEN pk.mval END AS near_view_value,
           CASE WHEN pk.mts IS NOT NULL
                     AND abs(epoch(p.ts) - epoch(pk.mts)) <= 600
                THEN pk.mts END AS near_view_ts
    FROM p
    LEFT JOIN b ON b.event_id = p.event_id
    LEFT JOIN f ON f.event_id = p.event_id
    CROSS JOIN LATERAL (
      SELECT CASE WHEN f.mts IS NULL
                       OR (b.mts IS NOT NULL
                           AND epoch(p.ts) - epoch(b.mts)
                               <= epoch(f.mts) - epoch(p.ts))
                  THEN b.mts ELSE f.mts END AS mts,
             CASE WHEN f.mts IS NULL
                       OR (b.mts IS NOT NULL
                           AND epoch(p.ts) - epoch(b.mts)
                               <= epoch(f.mts) - epoch(p.ts))
                  THEN b.mval ELSE f.mval END AS mval
    ) pk
    """,
)
def asof_join_nearest_tolerance(spark, sf_dir):
    """Nearest as-of join with a 600 s tolerance (operators/asof.py
    direction='nearest', the pandas merge_asof surface): per purchase the
    closer of the preceding/following view (tie → backward), nulled when
    further than the tolerance.  Both directions fill inside ONE shuffle
    (two in-partition sorts over the same hash partitioning).  Every 7th
    view's value is nulled on BOTH sides and the masked match-ts rides
    along: a NULL-valued view inside tolerance must attach (NULL value,
    non-NULL ts) — wholesale-row semantics, not per-column back-fill."""
    from iceberg_ruby_spark.operators.asof import asof_join

    e = load(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    views = e.filter(F.col("event_type") == "view").select(
        "user_id",
        "ts",
        F.when(F.col("event_id") % 7 == 0, F.lit(None))
        .otherwise(F.col("value"))
        .alias("near_view_value"),
        F.col("ts").alias("near_view_ts"),
    )
    return asof_join(
        purchases, views, on="ts", by=["user_id"],
        direction="nearest", tolerance=600,
    )


@query(
    "pivot_order_status",
    oracle="""
    SELECT o_orderpriority,
           CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
           CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
           CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p
    FROM orders GROUP BY o_orderpriority
    """,
)
def pivot_order_status(spark, sf_dir):
    """PIVOT: order counts per priority, one column per status (explicit
    pivot values keep the plan to a single pass — no distinct-values job)."""
    return (
        load(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
        .select(
            "o_orderpriority",
            F.coalesce(F.col("F"), F.lit(0)).alias("n_f"),
            F.coalesce(F.col("O"), F.lit(0)).alias("n_o"),
            F.coalesce(F.col("P"), F.lit(0)).alias("n_p"),
        )
    )


@query(
    "unpivot_lineitem_metrics",
    oracle="""
    SELECT l_orderkey, l_linenumber, 'quantity' AS metric, l_quantity AS value
    FROM lineitem WHERE l_orderkey < 100
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'extendedprice', l_extendedprice
    FROM lineitem WHERE l_orderkey < 100
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'discount', l_discount
    FROM lineitem WHERE l_orderkey < 100
    """,
)
def unpivot_lineitem_metrics(spark, sf_dir):
    """UNPIVOT/melt: wide metric columns to (metric, value) rows."""
    return (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") < 100)
        .unpivot(
            ["l_orderkey", "l_linenumber"],
            ["l_quantity", "l_extendedprice", "l_discount"],
            "metric",
            "value",
        )
        .withColumn("metric", F.expr("substring(metric, 3)"))
    )


@query(
    "regexp_functions",
    oracle=r"""
    SELECT p_partkey,
           regexp_matches(p_name, '^[a-m]') AS starts_a_to_m,
           regexp_extract(p_name, '([a-z]+)', 1) AS first_word,
           regexp_replace(p_name, '[aeiou]', '*', 'g') AS devoweled,
           CAST(length(regexp_replace(p_name, '[^ ]', '', 'g')) + 1 AS INTEGER) AS n_words
    FROM part
    """,
)
def regexp_functions(spark, sf_dir):
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.col("p_name").rlike("^[a-m]").alias("starts_a_to_m"),
        F.regexp_extract("p_name", "([a-z]+)", 1).alias("first_word"),
        F.regexp_replace("p_name", "[aeiou]", "*").alias("devoweled"),
        (F.length(F.regexp_replace("p_name", "[^ ]", "")) + 1).alias("n_words"),
    )


@query(
    "explode_unnest",
    oracle="""
    SELECT p_partkey, unnest(string_split(p_name, ' ')) AS word
    FROM part WHERE p_partkey <= 200
    """,
)
def explode_unnest(spark, sf_dir):
    """LATERAL VIEW explode — one row per array element."""
    p = load(spark, sf_dir, "part").filter(F.col("p_partkey") <= 200)
    return p.select(
        "p_partkey", F.explode(F.split("p_name", " ")).alias("word")
    )


@query(
    "percentile_aggs",
    oracle="""
    SELECT o_orderpriority,
           round(quantile_cont(o_totalprice, 0.5), 6) AS p50,
           round(quantile_cont(o_totalprice, 0.9), 6) AS p90,
           round(min(o_totalprice), 6) AS lo,
           round(max(o_totalprice), 6) AS hi
    FROM orders GROUP BY o_orderpriority
    """,
)
def percentile_aggs(spark, sf_dir):
    """Exact percentiles (continuous interpolation) per group."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(o_totalprice, 0.9)"), 6).alias("p90"),
        F.round(F.min("o_totalprice"), 6).alias("lo"),
        F.round(F.max("o_totalprice"), 6).alias("hi"),
    )


@query(
    "stat_aggs",
    oracle="""
    SELECT n_nationkey,
           round(stddev_samp(price), 4) AS sd,
           round(var_samp(price), 2) AS var,
           round(corr(price, qty), 4) AS price_qty_corr
    FROM (
      SELECT c.c_nationkey AS n_nationkey, l.l_extendedprice AS price,
             l.l_quantity AS qty
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
    ) GROUP BY n_nationkey
    """,
)
def stat_aggs(spark, sf_dir):
    """Statistical aggregates (stddev/variance/correlation) per nation."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select(
            F.col("c_nationkey").alias("n_nationkey"),
            F.col("l_extendedprice").alias("price"),
            F.col("l_quantity").alias("qty"),
        )
    )
    return joined.groupBy("n_nationkey").agg(
        F.round(F.stddev_samp("price"), 4).alias("sd"),
        F.round(F.var_samp("price"), 2).alias("var"),
        F.round(F.corr("price", "qty"), 4).alias("price_qty_corr"),
    )


@query(
    "higher_order_array",
    oracle="""
    SELECT p_partkey,
           array_to_string(list_transform(string_split(p_name, ' '),
                                          w -> length(w)), ',') AS word_lens,
           len(list_filter(string_split(p_name, ' '), w -> length(w) > 4)) AS n_long,
           list_reduce(list_transform(string_split(p_name, ' '), w -> length(w)),
                       (a, b) -> a + b) AS total_chars
    FROM part WHERE p_partkey <= 200
    """,
)
def higher_order_array(spark, sf_dir):
    """Higher-order array functions: transform / filter / aggregate stay
    JVM-side (no Python) — the 100 TB-safe way to work on array columns.

    The per-word length array is serialized to a comma-joined string on
    BOTH sides (Spark array_join / DuckDB array_to_string): raw array
    cells are unhashable in the driver's pandas canonicalizer, and the
    serialized form compares identically across engines."""
    p = load(spark, sf_dir, "part").filter(F.col("p_partkey") <= 200)
    words = F.split("p_name", " ")
    lens = F.transform(words, lambda w: F.length(w))
    return p.select(
        "p_partkey",
        F.array_join(lens.cast("array<string>"), ",").alias("word_lens"),
        F.size(F.filter(words, lambda w: F.length(w) > 4)).alias("n_long"),
        F.aggregate(lens, F.lit(0), lambda a, b: a + b).alias("total_chars"),
    )


@query(
    "map_struct_functions",
    oracle="""
    SELECT n_nationkey,
           map_extract(MAP {'name': n_name, 'region': CAST(n_regionkey AS VARCHAR)},
                       'name')[1] AS m_name,
           CAST(cardinality(MAP {'name': n_name, 'region': CAST(n_regionkey AS VARCHAR)})
                AS INTEGER) AS m_size,
           struct_pack(key := n_nationkey, name := n_name).name AS s_name,
           CAST(struct_pack(key := n_nationkey, name := n_name).key AS INTEGER) AS s_key
    FROM nation
    """,
)
def map_struct_functions(spark, sf_dir):
    """Map + struct construction/access with scalar outputs (map/struct
    cells themselves hash differently across engines; extraction is the
    comparable surface)."""
    n = load(spark, sf_dir, "nation")
    m = F.create_map(
        F.lit("name"), F.col("n_name"),
        F.lit("region"), F.col("n_regionkey").cast("string"),
    )
    s = F.struct(F.col("n_nationkey").alias("key"), F.col("n_name").alias("name"))
    return n.select(
        "n_nationkey",
        F.element_at(m, "name").alias("m_name"),
        F.size(m).alias("m_size"),
        s.getField("name").alias("s_name"),
        s.getField("key").cast("int").alias("s_key"),
    )
