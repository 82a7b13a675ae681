"""Analytic query pack (TPC-H-shaped, adapted to the driver's synthetic
star schema) — exercises the host-engine relational surface the
reference delegates to Spark/DataFusion (SURVEY.md §2.5): multi-way
joins, broadcast dims, semi/anti joins, scalar subqueries, windows,
rollup, set ops, JSON extraction.

Each QUERIES[name](spark, sf_dir) has an exact ORACLES[name] DuckDB SQL.
Plans are kept broadcast-friendly: dimension tables (region, nation,
supplier, part at small SF; customer vs orders) flow through
``F.broadcast`` hints where a real cluster would want them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

QUERIES: dict = {}
ORACLES: dict[str, str] = {}


def _register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # normalize the fixture's ts to bigint epoch-nanos whatever the
        # parquet physical type: timestamp[ns] fixtures arrive as long
        # via nanosAsLong (the vectorized reader rejects NANOS), while
        # timestamp[us/ms] fixtures arrive as TIMESTAMP_NTZ and convert
        # exactly (session TZ is pinned UTC). Every downstream query and
        # DuckDB oracle (epoch_ns) does exact integer ns arithmetic.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if df.schema["ts"].dataType.typeName().startswith("timestamp"):
            df = df.withColumn(
                "ts",
                (F.unix_micros(F.col("ts").cast("timestamp")) * 1000).cast("long"),
            )
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def dsum(c: Column) -> Column:
    """Exact, order-insensitive money sum: double → decimal(18,6) per
    row, decimal addition, final double."""
    return F.sum(c.cast("decimal(18,6)")).cast("double")


# SQL-side twin of dsum
def _dsum(expr: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,6))) AS DOUBLE)"


# --------------------------------------------------------------------- q1

@_register(
    "q1_pricing_summary",
    f"""
    SELECT l_returnflag, l_linestatus,
           {_dsum('l_quantity')} AS sum_qty,
           {_dsum('l_extendedprice')} AS sum_base_price,
           {_dsum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
           {_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_qty,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp"))
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc * (1 + F.col("l_tax"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        dsum(F.col("l_quantity")).alias("sum_qty"),
        dsum(F.col("l_extendedprice")).alias("sum_base_price"),
        dsum(disc).alias("sum_disc_price"),
        dsum(charge).alias("sum_charge"),
        (dsum(F.col("l_quantity")) / F.count(F.lit(1))).alias("avg_qty"),
        F.count(F.lit(1)).alias("count_order"),
    )


# --------------------------------------------------------------------- q3

@_register(
    "q3_unshipped_revenue",
    f"""
    SELECT l_orderkey,
           {_dsum('l_extendedprice * (1 - l_discount)')} AS revenue,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-06-01'
      AND l_shipdate  > TIMESTAMP '1998-06-01'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey LIMIT 10
    """,
)
def q3(spark, sf_dir):
    cust = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < F.lit("1998-06-01").cast("timestamp"))
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > F.lit("1998-06-01").cast("timestamp"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


# --------------------------------------------------------------------- q4

@_register(
    "q4_order_priority",
    """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-07-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    """,
)
def q4(spark, sf_dir):
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem")
    hit = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > F.expr("o_orderdate + INTERVAL 60 DAYS")),
        "left_semi",
    )
    return hit.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


# --------------------------------------------------------------------- q5

@_register(
    "q5_local_supplier_volume",
    f"""
    SELECT n_name, {_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM customer JOIN orders   ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
                  JOIN supplier ON l_suppkey = s_suppkey
                  JOIN nation   ON c_nationkey = n_nationkey
                  JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA' AND s_nationkey = c_nationkey
      AND o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY n_name
    """,
)
def q5(spark, sf_dir):
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem")
    supp = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), (li.l_suppkey == supp.s_suppkey) & (supp.s_nationkey == cust.c_nationkey))
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )


# --------------------------------------------------------------------- q6

@_register(
    "q6_forecast_revenue",
    f"""
    SELECT {_dsum('l_extendedprice * l_discount')} AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
    """,
)
def q6(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"))


# --------------------------------------------------------------------- q9

@_register(
    "q9_profit_by_nation_year",
    f"""
    SELECT n_name AS nation, year(o_orderdate) AS o_year,
           {_dsum('l_extendedprice * (1 - l_discount) - p_retailprice * l_quantity * 0.6')} AS profit
    FROM lineitem JOIN part     ON p_partkey = l_partkey
                  JOIN supplier ON s_suppkey = l_suppkey
                  JOIN orders   ON o_orderkey = l_orderkey
                  JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_type = 'ECONOMY'
    GROUP BY n_name, year(o_orderdate)
    """,
)
def q9(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    supp = t(spark, sf_dir, "supplier")
    orders = t(spark, sf_dir, "orders")
    nation = t(spark, sf_dir, "nation")
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col(
        "p_retailprice"
    ) * F.col("l_quantity") * F.lit(0.6)
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(dsum(amount).alias("profit"))
    )


# -------------------------------------------------------------------- q10

@_register(
    "q10_returned_items",
    f"""
    SELECT c_custkey, c_name,
           {_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-07-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name
    ORDER BY revenue DESC, c_custkey LIMIT 20
    """,
)
def q10(spark, sf_dir):
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


# -------------------------------------------------------------------- q14

@_register(
    "q14_promo_revenue",
    f"""
    SELECT 100.0 * {_dsum("CASE WHEN p_type = 'PROMO' OR p_type = 'ECONOMY' THEN l_extendedprice * (1 - l_discount) ELSE 0 END")}
           / {_dsum('l_extendedprice * (1 - l_discount)')} AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-09-01' AND l_shipdate < TIMESTAMP '1997-10-01'
    """,
)
def q14(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    part = t(spark, sf_dir, "part")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").isin("PROMO", "ECONOMY"), disc).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg((F.lit(100.0) * dsum(promo) / dsum(disc)).alias("promo_revenue"))
    )


# -------------------------------------------------------------------- q18

@_register(
    "q18_large_volume_customer",
    f"""
    SELECT c_custkey, o_orderkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice,
           {_dsum('l_quantity')} AS total_qty
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
        HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) > 210)
    GROUP BY c_custkey, o_orderkey, o_totalprice
    """,
)
def q18(spark, sf_dir):
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(dsum(F.col("l_quantity")).alias("q"))
        .filter(F.col("q") > 210)
        .select("l_orderkey")
    )
    return (
        li.join(F.broadcast(big.withColumnRenamed("l_orderkey", "k")), li.l_orderkey == F.col("k"), "left_semi")
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "o_orderkey", F.col("o_totalprice").cast("double").alias("o_totalprice"))
        .agg(dsum(F.col("l_quantity")).alias("total_qty"))
    )


# -------------------------------------------------------------------- q19

@_register(
    "q19_disjunctive_predicates",
    f"""
    SELECT {_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity >= 1 AND l_quantity <= 21)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity >= 10 AND l_quantity <= 30)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35 AND l_quantity >= 20 AND l_quantity <= 40)
    """,
)
def q19(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    c1 = (F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(1, 21)
    c2 = (F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 25) & F.col("l_quantity").between(10, 30)
    c3 = (F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 35) & F.col("l_quantity").between(20, 40)
    return j.filter(c1 | c2 | c3).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
    )


# -------------------------------------------------------------------- q21

@_register(
    "q21_waiting_suppliers",
    """
    WITH fo AS (SELECT o_orderkey, o_orderdate FROM orders WHERE o_orderstatus = 'F'),
    late AS (
      SELECT DISTINCT l.l_orderkey, l.l_suppkey
      FROM lineitem l JOIN fo ON fo.o_orderkey = l.l_orderkey
      WHERE l.l_shipdate > fo.o_orderdate + INTERVAL 60 DAY),
    l1 AS (
      SELECT lt.l_orderkey, lt.l_suppkey FROM late lt
      WHERE EXISTS (SELECT 1 FROM lineitem l2
                    WHERE l2.l_orderkey = lt.l_orderkey AND l2.l_suppkey <> lt.l_suppkey)
        AND NOT EXISTS (SELECT 1 FROM late l3
                        WHERE l3.l_orderkey = lt.l_orderkey AND l3.l_suppkey <> lt.l_suppkey))
    SELECT s_name, n_name, COUNT(*) AS numwait
    FROM l1 JOIN supplier ON s_suppkey = l1.l_suppkey
         JOIN nation ON n_nationkey = s_nationkey
    GROUP BY s_name, n_name
    """,
)
def q21(spark, sf_dir):
    """Suppliers who were the ONLY late supplier on a finished
    multi-supplier order (TPC-H q21 adapted: the fixture has no
    l_receiptdate/l_commitdate, so "late" = shipped >60 days after the
    order date). Exercises EXISTS -> left_semi and NOT EXISTS ->
    left_anti with correlated inequality conditions; dims broadcast."""
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    fo = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    late = (
        li.join(fo, li["l_orderkey"] == fo["o_orderkey"])
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    pairs = li.select("l_orderkey", F.col("l_suppkey").alias("s2")).distinct()
    cand = late.alias("lt").join(
        pairs.alias("p2"),
        (F.col("lt.l_orderkey") == F.col("p2.l_orderkey"))
        & (F.col("lt.l_suppkey") != F.col("p2.s2")),
        "left_semi",
    )
    solo = cand.join(
        late.select(F.col("l_orderkey").alias("o3"), F.col("l_suppkey").alias("s3")),
        (F.col("l_orderkey") == F.col("o3")) & (F.col("l_suppkey") != F.col("s3")),
        "left_anti",
    )
    sup = t(spark, sf_dir, "supplier")
    nat = t(spark, sf_dir, "nation")
    return (
        solo.join(F.broadcast(sup), solo["l_suppkey"] == sup["s_suppkey"])
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("s_name", "n_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


# -------------------------------------------------------------------- q22

@_register(
    "q22_idle_customers",
    """
    SELECT c_nationkey, COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS totacctbal
    FROM customer
    WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)
                       FROM customer WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY c_nationkey
    """,
)
def q22(spark, sf_dir):
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    pos = cust.filter(F.col("c_acctbal") > 0.0).agg(
        (dsum(F.col("c_acctbal")) / F.count(F.lit(1))).alias("avg_bal")
    )
    # scalar subquery stays IN the plan (crossJoin of a broadcast
    # 1-row frame) — no driver collect, the 100x-safe idiom
    return (
        cust.crossJoin(F.broadcast(pos))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .drop("avg_bal")
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum(F.col("c_acctbal")).alias("totacctbal"),
        )
    )


# ----------------------------------------------------------------- windows

@_register(
    "w_top_orders_per_customer",
    """
    SELECT o_custkey, o_orderkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice, rk
    FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                 row_number() OVER (PARTITION BY o_custkey
                                    ORDER BY o_totalprice DESC, o_orderkey) AS rk
          FROM orders)
    WHERE rk <= 3
    """,
)
def w_top_orders(spark, sf_dir):
    from pyspark.sql import Window

    orders = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    return (
        orders.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("o_custkey", "o_orderkey", F.col("o_totalprice").cast("double").alias("o_totalprice"), "rk")
    )


@_register(
    "w_running_user_value",
    """
    SELECT user_id, event_id,
           SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_value
    FROM events WHERE event_type = 'purchase'
    """,
)
def w_running_value(spark, sf_dir):
    from pyspark.sql import Window

    ev = t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select("user_id", "event_id", F.sum("value").over(w).alias("running_value"))


@_register(
    "w_sessionization",
    """
    WITH g AS (
      SELECT user_id, ts, event_id,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE OR
                  lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
             THEN 1 ELSE 0 END AS new_session
      FROM events),
    s AS (SELECT user_id,
                 SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
          FROM g)
    SELECT user_id, CAST(session_id AS INT) AS session_id, COUNT(*) AS n_events
    FROM s GROUP BY user_id, session_id
    """,
)
def w_sessionize(spark, sf_dir):
    from pyspark.sql import Window

    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # ts is bigint epoch-nanos (nanosAsLong) → gap arithmetic is exact
    # and matches the oracle's INTERVAL comparison on timestamp_ns
    gap = F.col("ts") - F.lag(F.col("ts")).over(w)
    g = ev.withColumn(
        "new_session",
        F.when(gap > 1800 * 1_000_000_000, 1)
        .when(F.lag(F.col("ts")).over(w).isNull(), 1)
        .otherwise(0),
    )
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    s = g.withColumn("session_id", F.sum("new_session").over(wsum).cast("int"))
    return s.groupBy("user_id", "session_id").agg(F.count(F.lit(1)).alias("n_events"))


@_register(
    "w_asof_join",
    """
    WITH u AS (
      SELECT user_id, ts, 1 AS is_left, event_id, value,
             NULL::BIGINT AS v_id, NULL::TIMESTAMP AS v_ts
      FROM events WHERE event_type = 'purchase'
      UNION ALL
      SELECT user_id, ts, 0, NULL, NULL, event_id, ts
      FROM events WHERE event_type = 'view'),
    m AS (
      SELECT *,
             last_value(v_id IGNORE NULLS) OVER w AS mv_id,
             last_value(v_ts IGNORE NULLS) OVER w AS mv_ts
      FROM u
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, is_left, v_id
                   ROWS UNBOUNDED PRECEDING))
    SELECT user_id, event_id, epoch_ns(ts) AS ts_ns, value,
           CASE WHEN mv_ts IS NOT NULL AND ts - mv_ts <= INTERVAL 6 HOUR
                THEN mv_id END AS view_event_id,
           CASE WHEN mv_ts IS NOT NULL AND ts - mv_ts <= INTERVAL 6 HOUR
                THEN epoch_ns(mv_ts) END AS view_ts_ns,
           CASE WHEN mv_ts IS NOT NULL AND ts - mv_ts <= INTERVAL 6 HOUR
                THEN epoch_ns(ts) - epoch_ns(mv_ts) END AS gap_ns
    FROM m WHERE is_left = 1
    """,
)
def w_asof_join_q(spark, sf_dir):
    """As-of join: each purchase joined to the user's latest view in
    the preceding 6 hours (backward, ts-inclusive, event-id
    tie-break). Spark has no native ASOF JOIN; ``operators/joins.py
    asof_join`` re-expresses it as union-tag + ONE keyed window —
    no per-key cross product."""
    from lakesoul_spark.operators.joins import asof_join

    ev = t(spark, sf_dir, "events")
    purch = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", "event_id"
    )
    out = asof_join(
        purch, views, on="user_id", left_ts="ts",
        tolerance=21_600_000_000_000, tie_break="event_id",
    )
    return out.select(
        "user_id", "event_id", F.col("ts").alias("ts_ns"), "value",
        F.col("r_event_id").alias("view_event_id"),
        F.col("r_ts").alias("view_ts_ns"),
        (F.col("ts") - F.col("r_ts")).alias("gap_ns"),
    )


@_register(
    "w_interval_join",
    """
    WITH e AS (SELECT user_id, event_id, ts FROM events
               WHERE event_type = 'error'),
    c AS (SELECT user_id, ts AS c_ts FROM events WHERE event_type = 'click')
    SELECT e.user_id, e.event_id, epoch_ns(e.ts) AS error_ts_ns,
           COUNT(c.c_ts) AS n_clicks,
           min(epoch_ns(c.c_ts)) - epoch_ns(e.ts) AS first_click_gap_ns
    FROM e LEFT JOIN c ON c.user_id = e.user_id
         AND c.c_ts >= e.ts AND c.c_ts <= e.ts + INTERVAL 1 HOUR
    GROUP BY e.user_id, e.event_id, e.ts
    """,
)
def w_interval_join_q(spark, sf_dir):
    """Interval (range) join: clicks inside the 1-hour window after
    each error of the same user — ``operators/joins.py interval_join``
    (bucketized equi-join: points land in exactly one bucket,
    intervals explode to covered buckets, exact range filter after the
    equi-shuffle; never a theta cross product) — then a left join back
    so zero-click errors keep a row."""
    from lakesoul_spark.operators.joins import interval_join

    hour_ns = 3_600_000_000_000
    ev = t(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id", "event_id", F.col("ts").alias("s"),
        (F.col("ts") + hour_ns).alias("e"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("c_ts")
    )
    pairs = interval_join(
        clicks, errors, on="user_id", point_ts="c_ts",
        start_col="s", end_col="e", bucket=hour_ns,
    )
    agg = pairs.groupBy("user_id", "event_id", "s").agg(
        F.count(F.lit(1)).alias("n_clicks"),
        F.min("c_ts").alias("first_c"),
    )
    return errors.join(agg, ["user_id", "event_id", "s"], "left").select(
        "user_id", "event_id", F.col("s").alias("error_ts_ns"),
        F.coalesce("n_clicks", F.lit(0)).alias("n_clicks"),
        (F.col("first_c") - F.col("s")).alias("first_click_gap_ns"),
    )


# ------------------------------------------------------- rollup / set ops

@_register(
    "rollup_region_customers",
    """
    SELECT r_name, n_name, COUNT(*) AS n_cust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS bal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
                  JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
)
def rollup_region(spark, sf_dir):
    cust = t(spark, sf_dir, "customer")
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(F.count(F.lit(1)).alias("n_cust"), dsum(F.col("c_acctbal")).alias("bal"))
    )


@_register(
    "setop_repeat_customers",
    """
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
    INTERSECT
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997
    """,
)
def setop_repeat(spark, sf_dir):
    orders = t(spark, sf_dir, "orders")
    y96 = orders.filter(F.year("o_orderdate") == 1996).select("o_custkey")
    y97 = orders.filter(F.year("o_orderdate") == 1997).select("o_custkey")
    return y96.intersect(y97)


@_register(
    "json_event_props",
    """
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
           COUNT(*) AS n
    FROM events GROUP BY event_type
    """,
)
def json_props(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.sum(F.get_json_object("props", "$.k").cast("bigint")).alias("k_sum"),
        F.count(F.lit(1)).alias("n"),
    )


# ----------------------------------------------------- q2-adapted (min-cost)

@_register(
    "q2_min_cost_supplier",
    f"""
    WITH cost AS (
      SELECT l_partkey, l_suppkey,
             {_dsum('l_extendedprice')} AS supply_value
      FROM lineitem GROUP BY l_partkey, l_suppkey),
    best AS (SELECT l_partkey, MIN(supply_value) AS min_value
             FROM cost GROUP BY l_partkey)
    SELECT c.l_partkey AS p_partkey, s.s_name, c.supply_value
    FROM cost c JOIN best b ON c.l_partkey = b.l_partkey
                           AND c.supply_value = b.min_value
         JOIN supplier s ON c.l_suppkey = s.s_suppkey
         JOIN part p ON c.l_partkey = p.p_partkey
    WHERE p.p_size < 15
    """,
)
def q2_min_cost(spark, sf_dir):
    """Correlated-min rewrite (the classic q2 shape): per-part minimum
    supply value via a self-joined aggregate — Catalyst plans both aggs
    off one shuffle of lineitem."""
    li = t(spark, sf_dir, "lineitem")
    cost = li.groupBy("l_partkey", "l_suppkey").agg(
        dsum(F.col("l_extendedprice")).alias("supply_value")
    )
    best = cost.groupBy("l_partkey").agg(F.min("supply_value").alias("min_value")) \
        .withColumnRenamed("l_partkey", "b_partkey")
    sup = t(spark, sf_dir, "supplier")
    part = t(spark, sf_dir, "part").filter(F.col("p_size") < 15)
    return (
        cost.join(best, (F.col("l_partkey") == F.col("b_partkey"))
                  & (F.col("supply_value") == F.col("min_value")))
        .join(sup, F.col("l_suppkey") == sup.s_suppkey)
        .join(part, F.col("l_partkey") == part.p_partkey)
        .select(F.col("l_partkey").alias("p_partkey"), "s_name", "supply_value")
    )


# ------------------------------------------------------------- q7 volume

@_register(
    "q7_nation_volume",
    f"""
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           year(l_shipdate) AS l_year,
           {_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN nation cn ON c_nationkey = cn.n_nationkey
         JOIN nation sn ON s_nationkey = sn.n_nationkey
    WHERE sn.n_name <> cn.n_name AND year(l_shipdate) BETWEEN 1999 AND 2000
    GROUP BY sn.n_name, cn.n_name, year(l_shipdate)
    """,
)
def q7_volume(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem").filter(F.year("l_shipdate").between(1999, 2000))
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    cn = n.select(F.col("n_nationkey").alias("cnk"), F.col("n_name").alias("cust_nation"))
    sn = n.select(F.col("n_nationkey").alias("snk"), F.col("n_name").alias("supp_nation"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(cn), c.c_nationkey == F.col("cnk"))
        .join(F.broadcast(sn), s.s_nationkey == F.col("snk"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )


# --------------------------------------------------------- q8 market share

@_register(
    "q8_market_share",
    f"""
    WITH volumes AS (
      SELECT year(o_orderdate) AS o_year,
             CAST(l_extendedprice * (1 - l_discount) AS DOUBLE) AS volume,
             sn.n_name AS supp_nation
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           JOIN customer ON o_custkey = c_custkey
           JOIN nation cn ON c_nationkey = cn.n_nationkey
           JOIN region ON cn.n_regionkey = r_regionkey
           JOIN supplier ON l_suppkey = s_suppkey
           JOIN nation sn ON s_nationkey = sn.n_nationkey
           JOIN part ON l_partkey = p_partkey
      WHERE r_name = 'AMERICA' AND p_type LIKE '%PROMO%')
    SELECT o_year,
           CAST({_dsum("CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END")}
                / {_dsum('volume')} AS DOUBLE) AS mkt_share
    FROM volumes GROUP BY o_year
    """,
)
def q8_share(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    p = t(spark, sf_dir, "part").filter(F.col("p_type").like("%PROMO%"))
    cn = n.select(F.col("n_nationkey").alias("cnk"), F.col("n_regionkey").alias("crk"))
    sn = n.select(F.col("n_nationkey").alias("snk"), F.col("n_name").alias("supp_nation"))
    vol = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(cn), c.c_nationkey == F.col("cnk"))
        .join(F.broadcast(r), F.col("crk") == r.r_regionkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), s.s_nationkey == F.col("snk"))
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .select(
            F.year("o_orderdate").alias("o_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("double").alias("volume"),
            "supp_nation",
        )
    )
    brazil = F.when(F.col("supp_nation") == "NATION_3", F.col("volume")).otherwise(F.lit(0.0))
    return vol.groupBy("o_year").agg(
        (dsum(brazil) / dsum(F.col("volume"))).cast("double").alias("mkt_share")
    )


# -------------------------------------------------------- q11 important stock

@_register(
    "q11_important_parts",
    f"""
    WITH pv AS (
      SELECT l_partkey, {_dsum('l_extendedprice')} AS part_value
      FROM lineitem GROUP BY l_partkey)
    SELECT l_partkey AS p_partkey, part_value
    FROM pv WHERE part_value > (SELECT SUM(part_value) * 0.0006 FROM pv)
    """,
)
def q11_important(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    pv = li.groupBy("l_partkey").agg(dsum(F.col("l_extendedprice")).alias("part_value"))
    thresh = pv.agg((F.sum("part_value") * 0.0006).alias("th"))
    return (
        pv.join(F.broadcast(thresh))
        .filter(F.col("part_value") > F.col("th"))
        .select(F.col("l_partkey").alias("p_partkey"), "part_value")
    )


# ------------------------------------------------------------ q12 late ships

@_register(
    "q12_late_shipments",
    """
    SELECT o_orderpriority, COUNT(*) AS late_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) > 90
    GROUP BY o_orderpriority
    """,
)
def q12_late(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.datediff(F.col("l_shipdate").cast("date"),
                           F.col("o_orderdate").cast("date")) > 90)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("late_count"))
    )


# ------------------------------------------------------- q13 cust distribution

@_register(
    "q13_customer_distribution",
    """
    WITH c_orders AS (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey)
    SELECT c_count, COUNT(*) AS custdist
    FROM c_orders GROUP BY c_count
    """,
)
def q13_dist(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    co = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return co.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


# ----------------------------------------------------------- q15 top supplier

@_register(
    "q15_top_supplier",
    f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             {_dsum('l_extendedprice * (1 - l_discount)')} AS total_revenue
      FROM lineitem WHERE year(l_shipdate) = 2000
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
)
def q15_top(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem").filter(F.year("l_shipdate") == 2000)
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("total_revenue")
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    s = t(spark, sf_dir, "supplier")
    return (
        s.join(rev, s.s_suppkey == rev.supplier_no)
        .join(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("mx"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


# ------------------------------------------------------ q16 supplier variety

@_register(
    "q16_part_supplier_variety",
    """
    SELECT p_brand, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#1' AND p_size IN (1, 5, 9, 13, 17)
    GROUP BY p_brand, p_size
    """,
)
def q16_variety(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1") & F.col("p_size").isin(1, 5, 9, 13, 17)
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


# ------------------------------------------------------ q17 small-qty revenue

@_register(
    "q17_small_quantity_revenue",
    f"""
    WITH avgq AS (
      SELECT l_partkey AS ap, AVG(l_quantity) * 0.5 AS half_avg
      FROM lineitem GROUP BY l_partkey)
    SELECT CAST({_dsum('l_extendedprice')} / 7.0 AS DOUBLE) AS avg_yearly
    FROM lineitem JOIN avgq ON l_partkey = ap
    WHERE l_quantity < half_avg
    """,
)
def q17_small(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    avgq = li.groupBy(F.col("l_partkey").alias("ap")).agg(
        (F.avg("l_quantity") * 0.5).alias("half_avg")
    )
    return (
        li.join(avgq, li.l_partkey == F.col("ap"))
        .filter(F.col("l_quantity") < F.col("half_avg"))
        .agg((dsum(F.col("l_extendedprice")) / 7.0).cast("double").alias("avg_yearly"))
    )


# ------------------------------------------------------------ q20 semi chain

@_register(
    "q20_heavy_suppliers",
    f"""
    WITH pq AS (
      SELECT l_partkey, l_suppkey, {_dsum('l_quantity')} AS qty
      FROM lineitem WHERE year(l_shipdate) = 2000
      GROUP BY l_partkey, l_suppkey),
    tot AS (
      SELECT l_partkey, SUM(qty) AS total_qty FROM pq GROUP BY l_partkey)
    SELECT DISTINCT s_suppkey, s_name
    FROM supplier
    WHERE s_suppkey IN (
      SELECT pq.l_suppkey FROM pq JOIN tot ON pq.l_partkey = tot.l_partkey
      WHERE pq.qty > 0.5 * tot.total_qty)
    """,
)
def q20_heavy(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem").filter(F.year("l_shipdate") == 2000)
    pq = li.groupBy("l_partkey", "l_suppkey").agg(dsum(F.col("l_quantity")).alias("qty"))
    tot = pq.groupBy("l_partkey").agg(F.sum("qty").alias("total_qty"))
    heavy = (
        pq.join(tot, "l_partkey")
        .filter(F.col("qty") > 0.5 * F.col("total_qty"))
        .select(F.col("l_suppkey"))
        .distinct()
    )
    s = t(spark, sf_dir, "supplier")
    return (
        s.join(heavy, s.s_suppkey == heavy.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
        .distinct()
    )
