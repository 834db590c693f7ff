"""General-analytics queries over the TPC-H-ish star schema.

The reference has no joins (SURVEY §2.5: correlation only via
coalesce/project/by) — Spark gives the engine general joins for
free. These queries prove that path end-to-end with oracle parity:
broadcast joins for the small dimensions, decimal-exact money math,
and group-by rollups shaped like the classic TPC-H pricing/revenue
queries.

Scale notes: nation/region/supplier are broadcast (dimension-sized);
lineitem→orders is the one real shuffle join and AQE re-plans it at
runtime. Sums accumulate in DECIMAL(38,9) so parallelism never
changes a result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

QUERIES: dict = {}
ORACLES: dict[str, str] = {}

DEC = "decimal(38,9)"


def q(name: str, sql: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLES[name] = sql
        return fn

    return deco


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load a testdata table, normalizing TIMESTAMP(NANOS) columns to
    µs exactly like DuckDB does (see queries.events).

    The big fact table (lineitem) is rebalanced when the scan
    under-splits (r16): the local testdata files hold ONE parquet
    row group, so every decimal rollup and every broadcast-join
    probe side in this module executed on a single core regardless
    of the split-descriptor count. The rebalance HASH-partitions on
    l_orderkey instead of a keyless repartition — round-robin pays
    sort-before-repartition, a single-threaded sort of the whole
    table on the one real input split (measured at sf1: Q1 rollup
    13.7 s raw, 5.2 s round-robin, 4.2 s hash). Projection and
    filter pushdown pass through the repartition, and
    needs_rebalance makes it a no-op on a genuinely well-split
    table (the 100 TB case). orders stays as scanned: it is the
    broadcast/build side in every query here, and an exchange below
    a broadcast build is pure waste (measured in the revenue plan)."""
    from mirabelle_spark.queries import _normalize_ts
    from mirabelle_spark.scale import needs_rebalance

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    ts_cols = {"lineitem": ["l_shipdate"], "orders": ["o_orderdate"]}.get(name, [])
    for c in ts_cols:
        df = _normalize_ts(df, c)
    if name == "lineitem":
        target = spark.sparkContext.defaultParallelism
        if needs_rebalance(df, target):
            df = df.repartition(target, F.col("l_orderkey"))
    return df


def _dsum(col) -> F.Column:
    """Exact sum → double. Accepts decimal or double input; decimal
    products (price × (1−discount) with 2-dp inputs) are exact at
    8 dp, so no rounding rule is ever exercised — the HALF_UP vs
    HALF_EVEN divergence between engines only appears when a double
    PRODUCT is cast to decimal."""
    return F.sum(col.cast(DEC)).cast("double")


@q(
    "tpch_pricing_summary",
    """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS DECIMAL(38,9))) AS DOUBLE) AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(38,9))) AS DOUBLE) AS sum_base_price,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE)
         AS sum_disc_price,
       CAST(sum(CAST(l_quantity AS DECIMAL(38,9))) AS DOUBLE) / count(*) AS avg_qty,
       CAST(count(*) AS BIGINT) AS count_order
FROM lineitem
GROUP BY l_returnflag, l_linestatus
""",
)
def tpch_pricing_summary(spark, sf):
    """TPC-H Q1-shaped pricing summary: one scan, partial+final agg."""
    li = table(spark, sf, "lineitem")
    disc = F.col("l_extendedprice").cast("decimal(18,4)") * (
        F.lit(1).cast("decimal(18,4)") - F.col("l_discount").cast("decimal(18,4)")
    )
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        _dsum(F.col("l_quantity")).alias("sum_qty"),
        _dsum(F.col("l_extendedprice")).alias("sum_base_price"),
        _dsum(disc).alias("sum_disc_price"),
        (F.sum(F.col("l_quantity").cast(DEC)).cast("double") / F.count(F.lit(1))).alias(
            "avg_qty"
        ),
        F.count(F.lit(1)).alias("count_order"),
    )


@q(
    "revenue_by_nation",
    """
SELECT n_name,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE)
         AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY n_name
""",
)
def revenue_by_nation(spark, sf):
    """TPC-H Q5-shaped star join: dimensions broadcast, one shuffle
    join on orderkey, one on custkey; group on nation."""
    li = table(spark, sf, "lineitem")
    orders = table(spark, sf, "orders")
    cust = table(spark, sf, "customer")
    nation = table(spark, sf, "nation")
    region = table(spark, sf, "region")
    disc = F.col("l_extendedprice").cast("decimal(18,4)") * (
        F.lit(1).cast("decimal(18,4)") - F.col("l_discount").cast("decimal(18,4)")
    )
    j = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    return j.groupBy("n_name").agg(_dsum(disc).alias("revenue"))


@q(
    "top_suppliers",
    """
SELECT s_name, revenue, rank FROM (
  SELECT s_name, revenue,
         CAST(row_number() OVER (ORDER BY revenue DESC, s_name) AS INT) AS rank
  FROM (
    SELECT s_name,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE)
             AS revenue
    FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
    GROUP BY s_name
  )
) WHERE rank <= 10
""",
)
def top_suppliers(spark, sf):
    """Supplier revenue top-10: broadcast supplier dim, then
    orderBy+limit → TakeOrderedAndProject (distributed per-partition
    top-k + driver merge of 10-row candidates), NOT a global
    row_number() window — that would sort the whole aggregate on one
    task at scale. rank is attached after the limit, a window over
    ≤10 rows."""
    from pyspark.sql import Window as W

    li = table(spark, sf, "lineitem")
    supp = table(spark, sf, "supplier")
    disc = F.col("l_extendedprice").cast("decimal(18,4)") * (
        F.lit(1).cast("decimal(18,4)") - F.col("l_discount").cast("decimal(18,4)")
    )
    rev = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(_dsum(disc).alias("revenue"))
    )
    top = rev.orderBy(F.col("revenue").desc(), F.col("s_name")).limit(10)
    w = W.orderBy(F.col("revenue").desc(), F.col("s_name"))
    return top.withColumn("rank", F.row_number().over(w).cast("int"))


@q(
    "order_priority_counts",
    """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n
FROM orders
WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem WHERE l_discount > 0.05)
GROUP BY o_orderpriority
""",
)
def order_priority_counts(spark, sf):
    """Q4-shaped semi-join: orders with a discounted lineitem,
    counted per priority (left_semi — no row multiplication)."""
    orders = table(spark, sf, "orders")
    li = table(spark, sf, "lineitem").filter(F.col("l_discount") > 0.05)
    semi = orders.join(
        li.select("l_orderkey").distinct(),
        orders.o_orderkey == F.col("l_orderkey"),
        "left_semi",
    )
    return semi.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n"))


@q(
    "priority_conditional_counts",
    """
SELECT o_orderpriority,
       CAST(sum(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS BIGINT)
         AS high_disc,
       CAST(sum(CASE WHEN l_discount <= 0.05 THEN 1 ELSE 0 END) AS BIGINT)
         AS low_disc
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
""",
)
def priority_conditional_counts(spark, sf):
    """TPC-H Q12-shaped conditional rollup: one shuffle join, two
    conditional counts in ONE aggregate pass (no self-join, no second
    scan — the CASE-in-sum pattern every monitoring rollup needs)."""
    li = table(spark, sf, "lineitem")
    orders = table(spark, sf, "orders")
    hi = F.when(F.col("l_discount") > 0.05, 1).otherwise(0)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.sum(hi).cast("bigint").alias("high_disc"),
            F.sum(1 - hi).cast("bigint").alias("low_disc"),
        )
    )


@q(
    "brand_part_revenue",
    """
SELECT p_brand,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE)
         AS revenue,
       CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
""",
)
def brand_part_revenue(spark, sf):
    """Brand rollup with a distinct-count: part dim broadcast, revenue
    decimal-exact, countDistinct partial-aggregated by Catalyst."""
    li = table(spark, sf, "lineitem")
    part = table(spark, sf, "part")
    disc = F.col("l_extendedprice").cast("decimal(18,4)") * (
        F.lit(1).cast("decimal(18,4)") - F.col("l_discount").cast("decimal(18,4)")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            _dsum(disc).alias("revenue"),
            F.countDistinct("l_partkey").cast("bigint").alias("n_parts"),
        )
    )


@q(
    "segment_top_orders",
    """
SELECT o_orderkey, revenue FROM (
  SELECT o_orderkey,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE)
           AS revenue,
         row_number() OVER (
           ORDER BY CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) DESC,
                    o_orderkey) AS rn
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  WHERE c_mktsegment = 'BUILDING'
  GROUP BY o_orderkey
) WHERE rn <= 20
""",
)
def segment_top_orders(spark, sf):
    """Q3-shaped: filter pushdown through two joins, top-20 orders by
    revenue in one market segment. orderBy+limit →
    TakeOrderedAndProject: at sf100 the orders-grain aggregate is
    ~10⁸ rows, and a global row_number() window would sort all of it
    on a single task; per-partition top-k + driver merge is spill-free
    and distributed."""
    li = table(spark, sf, "lineitem")
    orders = table(spark, sf, "orders")
    cust = table(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    disc = F.col("l_extendedprice").cast("decimal(18,4)") * (
        F.lit(1).cast("decimal(18,4)") - F.col("l_discount").cast("decimal(18,4)")
    )
    rev = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("o_orderkey")
        .agg(_dsum(disc).alias("revenue"))
    )
    return (
        rev.orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(20)
        .select("o_orderkey", "revenue")
    )


@q(
    "returned_item_customers",
    """
SELECT c_custkey, c_name, n_name, revenue FROM (
  SELECT c_custkey, c_name, n_name,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE)
           AS revenue,
         row_number() OVER (
           ORDER BY CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) DESC,
                    c_custkey) AS rn
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation   ON c_nationkey = n_nationkey
  WHERE l_returnflag = 'R'
  GROUP BY c_custkey, c_name, n_name
) WHERE rn <= 20
""",
)
def returned_item_customers(spark, sf):
    """Q10-shaped (r10; hint policy fixed r11): customers who
    returned the most revenue — the returned-lineitem filter pushes
    into the fact scan, the customer-grain aggregate partial-
    combines map-side, and the global top-20 is orderBy+limit
    (TakeOrderedAndProject — per-partition heaps, never a global
    window sort). Broadcast policy: only NATION carries an explicit
    hint — it is schema-bounded (25 rows) at every SF. CUSTOMER is
    size-decided by the planner/AQE: at sf100 it is ~15M rows (GBs
    serialized), and a forced hint would bypass AQE's size check
    and OOM the driver instead of degrading to a shuffle join; at
    small SF the planner broadcasts it from parquet stats anyway
    (plan-pinned in test_plans). Relative size is not the broadcast
    criterion — absolute size is."""
    li = table(spark, sf, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = table(spark, sf, "orders")
    cust = table(spark, sf, "customer")
    nat = table(spark, sf, "nation")
    disc = F.col("l_extendedprice").cast("decimal(18,4)") * (
        F.lit(1).cast("decimal(18,4)") - F.col("l_discount").cast("decimal(18,4)")
    )
    rev = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(_dsum(disc).alias("revenue"))
    )
    return (
        rev.orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
        .select("c_custkey", "c_name", "n_name", "revenue")
    )


@q(
    "large_order_customers",
    """
SELECT c_custkey, o_orderkey, o_totalprice, total_qty
FROM (
  SELECT l_orderkey, CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS total_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING sum(CAST(l_quantity AS DECIMAL(18,4))) > 250
) big
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
""",
)
def large_order_customers(spark, sf):
    """Q18-shaped (r10; hint policy fixed r11): orders whose total
    quantity exceeds a rare-tail threshold (2% of orders here, like
    the spec's 312), with their customers. The HAVING aggregate runs
    FIRST at order grain (partial-combining, fact table touched
    once); only the surviving order keys join back. Broadcast
    policy: NO explicit hints — the survivor set is data-dependent
    (2% of orders is ~3M rows at sf100) and customer is ~15M rows
    there, so forcing either bypasses AQE's size check and risks a
    driver/executor OOM; AQE measures both at runtime and broadcasts
    exactly when they fit (it does at small SF — plan-pinned in
    test_plans with the fact side never the build side). Never a
    window, never a second fact scan."""
    li = table(spark, sf, "lineitem")
    orders = table(spark, sf, "orders")
    cust = table(spark, sf, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast(DEC)).alias("__q__"))
        .filter(F.col("__q__") > 250)
        .select("l_orderkey", F.col("__q__").cast("double").alias("total_qty"))
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select("c_custkey", "o_orderkey", "o_totalprice", "total_qty")
    )


@q(
    "volume_shipping",
    """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INT) AS l_year,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE)
         AS revenue
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE n1.n_name <> n2.n_name
GROUP BY n1.n_name, n2.n_name, year(l_shipdate)
""",
)
def volume_shipping(spark, sf):
    """TPC-H Q7-shaped volume shipping: cross-border revenue by
    (supplier nation, customer nation, ship year). Two fact-side
    shuffle joins (orderkey, custkey); both nation aliases carry
    F.broadcast hints (25 rows by schema), while supplier — ~1M
    rows at sf100 — is left to AQE's size check (the r10 broadcast-
    hint policy: hint only schema-bounded dims). Decimal-exact
    revenue.
    The ship YEAR comes from epoch-day arithmetic on the µs instant
    (date_add from 1970-01-01), NOT year(timestamp) — the latter is
    session-timezone dependent and the driver's session is not UTC;
    the oracle's naive TIMESTAMP_NS wall clock IS the UTC instant,
    so both engines see the same calendar."""
    li = table(spark, sf, "lineitem")
    supp = table(spark, sf, "supplier")
    orders = table(spark, sf, "orders")
    cust = table(spark, sf, "customer")
    nation = table(spark, sf, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    l_year = F.year(
        F.date_add(
            F.lit("1970-01-01").cast("date"),
            F.expr("CAST(unix_micros(l_shipdate) div 86400000000 AS INT)"),
        )
    ).cast("int")
    disc = F.col("l_extendedprice").cast("decimal(18,4)") * (
        F.lit(1).cast("decimal(18,4)") - F.col("l_discount").cast("decimal(18,4)")
    )
    j = (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
    )
    return j.groupBy("supp_nation", "cust_nation", l_year.alias("l_year")).agg(
        _dsum(disc).alias("revenue")
    )
