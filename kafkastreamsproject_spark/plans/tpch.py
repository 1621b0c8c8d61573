"""The remaining TPC-H query shapes (q2, q8, q9, q11, q16, q20, q21).

With this module every one of the 22 TPC-H queries has a named,
oracle-checked representative in the registry (the other 15 live in
``plans/relational.py`` / ``plans/shadow.py``, some under descriptive
names: q4 = ``priority_order_exists``, q12 = ``late_shipment_priority``,
q18 = ``large_orders``).  The fixtures have no ``partsupp`` table and
``lineitem`` carries only ``l_shipdate`` (no commit/receipt dates), so
four queries are ADAPTED — each docstring states the exact substitution:

- the part-supplier relation is derived from ``lineitem`` (the observed
  (l_partkey, l_suppkey) pairs, with unit cost = min extendedprice/qty);
- "late" means ``l_shipdate > o_orderdate + 60 days``.

The SHAPES — correlated min subquery, CASE-ratio market share, global
scalar-fraction HAVING, NOT-IN exclusion + distinct count, nested-IN
dominance, and the double EXISTS/NOT-EXISTS self-join — are preserved
verbatim; those are what the optimizer has to get right at 100 TB.

All money arithmetic runs in DECIMAL on both engines (exact, order-
independent), cast to DOUBLE and rounded only in the final projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafkastreamsproject_spark.plans.registry import register
from kafkastreamsproject_spark.sources.testdata import load_table


def _volume():
    """extendedprice * (1 - discount) as exact DECIMAL."""
    return F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1) - F.col("l_discount")
    ).cast("decimal(4,2)")


@register(
    "q2_min_cost_supplier",
    oracle="""
    WITH cost AS (
      SELECT l_partkey, l_suppkey,
             MIN(l_extendedprice / l_quantity) AS unit_cost
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    cand AS (
      SELECT c.l_partkey, c.l_suppkey, c.unit_cost,
             s.s_acctbal, s.s_name, n.n_name
      FROM cost c
      JOIN supplier s ON s.s_suppkey = c.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'EUROPE'
    ),
    best AS (
      SELECT l_partkey, MIN(unit_cost) AS min_cost
      FROM cand GROUP BY l_partkey
    )
    SELECT c.s_acctbal AS acctbal, c.s_name AS supp_name,
           c.n_name AS nation, c.l_partkey AS partkey,
           p.p_name AS part_name,
           ROUND(c.unit_cost, 6) AS min_unit_cost
    FROM cand c
    JOIN best b ON b.l_partkey = c.l_partkey AND c.unit_cost = b.min_cost
    JOIN part p ON p.p_partkey = c.l_partkey
    WHERE p.p_size = 15 AND p.p_type = 'STANDARD'
    """,
    tags=("relational", "tpch", "join"),
    tier="shadow",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (adapted: no partsupp table, so the part-supplier
    cost relation is derived from lineitem — unit cost = MIN
    extendedprice/quantity per observed (part, supplier) pair): for each
    qualifying part, the EUROPE supplier(s) offering the minimum cost.

    The correlated MIN subquery decorrelates into a per-part aggregate
    joined back on (partkey, cost-equality) — Spark's groupBy+join is
    exactly that plan.  At 100 TB the cost relation is |part×supp|-
    bounded (≪ lineitem) and the per-part min table smaller still;
    supplier/nation/region/part dims all broadcast.  Unit-cost division
    is IEEE double on identical inputs in both engines, so the equality
    join and 6-dp rounding are cross-engine deterministic.
    """
    li = load_table(spark, "lineitem", sf_dir)
    supp = load_table(spark, "supplier", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    region = load_table(spark, "region", sf_dir)
    part = load_table(spark, "part", sf_dir)

    cost = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost")
    )
    eur_supp = (
        supp.join(
            F.broadcast(nation), supp.s_nationkey == nation.n_nationkey
        )
        .join(
            F.broadcast(region.filter(F.col("r_name") == "EUROPE")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", "s_acctbal", "s_name", "n_name")
    )
    cand = cost.join(F.broadcast(eur_supp), cost.l_suppkey == F.col("s_suppkey"))
    best = cand.groupBy(F.col("l_partkey").alias("b_partkey")).agg(
        F.min("unit_cost").alias("min_cost")
    )
    sel_part = part.filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "STANDARD")
    ).select("p_partkey", "p_name")
    return (
        cand.join(
            best,
            (cand.l_partkey == best.b_partkey)
            & (cand.unit_cost == best.min_cost),
        )
        .join(F.broadcast(sel_part), cand.l_partkey == F.col("p_partkey"))
        .select(
            F.col("s_acctbal").alias("acctbal"),
            F.col("s_name").alias("supp_name"),
            F.col("n_name").alias("nation"),
            F.col("l_partkey").alias("partkey"),
            F.col("p_name").alias("part_name"),
            F.round("unit_cost", 6).alias("min_unit_cost"),
        )
    )


@register(
    "q8_market_share",
    oracle="""
    WITH vol AS (
      SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS INT) AS o_year,
             CAST(l.l_extendedprice AS DECIMAL(12,2))
               * CAST(1 - l.l_discount AS DECIMAL(4,2)) AS volume,
             n2.n_name AS supp_nation
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1 ON n1.n_nationkey = c.c_nationkey
      JOIN region r ON r.r_regionkey = n1.n_regionkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n2 ON n2.n_nationkey = s.s_nationkey
      WHERE r.r_name = 'ASIA' AND p.p_type = 'ECONOMY'
        AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    )
    SELECT o_year,
           ROUND(
             CAST(COALESCE(SUM(CASE WHEN supp_nation = 'NATION_5'
                                    THEN volume END), 0) AS DOUBLE)
             / CAST(SUM(volume) AS DOUBLE), 6) AS mkt_share
    FROM vol GROUP BY o_year
    """,
    tags=("relational", "tpch", "join"),
    tier="shadow",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: national market share — NATION_5's fraction of ASIA
    customers' ECONOMY-part order volume per year (p_type is a single
    word in these fixtures, so 'ECONOMY' stands in for 'ECONOMY
    ANODIZED STEEL').

    Seven-table star: lineitem is the only fact; part/orders/customer/
    nation×2/region/supplier all hash- or broadcast-join without
    shuffling the fact more than once (orders is the one co-keyed
    shuffle).  Numerator and denominator are exact DECIMAL sums; only
    the final ratio is double, so the 6-dp round is cross-engine safe.
    """
    li = load_table(spark, "lineitem", sf_dir)
    part = load_table(spark, "part", sf_dir).filter(
        F.col("p_type") == "ECONOMY"
    )
    orders = load_table(spark, "orders", sf_dir).filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    cust = load_table(spark, "customer", sf_dir)
    supp = load_table(spark, "supplier", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    region = load_table(spark, "region", sf_dir).filter(
        F.col("r_name") == "ASIA"
    )
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"),
        F.col("n_regionkey").alias("n1_region"),
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"),
        F.col("n_name").alias("supp_nation"),
    )
    vol = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(
            F.broadcast(region), F.col("n1_region") == F.col("r_regionkey")
        )
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            _volume().alias("volume"),
            "supp_nation",
        )
    )
    target = F.sum(F.when(F.col("supp_nation") == "NATION_5", F.col("volume")))
    return vol.groupBy("o_year").agg(
        F.round(
            F.coalesce(target, F.lit(0)).cast("double")
            / F.sum("volume").cast("double"),
            6,
        ).alias("mkt_share")
    )


@register(
    "q9_product_profit",
    oracle="""
    SELECT n.n_name AS nation,
           CAST(EXTRACT(year FROM o.o_orderdate) AS INT) AS o_year,
           ROUND(CAST(SUM(
             CAST(l.l_extendedprice AS DECIMAL(12,2))
               * CAST(1 - l.l_discount AS DECIMAL(4,2))
             - CAST(p.p_retailprice AS DECIMAL(12,2))
               * CAST(l.l_quantity AS DECIMAL(3,0))
               * CAST(0.2 AS DECIMAL(2,1))
           ) AS DOUBLE), 4) AS profit
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE p.p_name LIKE '%gear%'
    GROUP BY n.n_name, CAST(EXTRACT(year FROM o.o_orderdate) AS INT)
    """,
    tags=("relational", "tpch", "join"),
    tier="shadow",
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (adapted: no partsupp, so supply cost is proxied
    as 20% of p_retailprice per unit — the profit EXPRESSION keeps its
    revenue-minus-cost structure): profit by supplier nation × order
    year for parts whose name contains 'gear'.

    The LIKE filter prunes part before the broadcast; lineitem shuffles
    once (orders co-key).  Every term stays DECIMAL (quantity is
    integral ≤ 50, exact in DECIMAL(3,0)), so the aggregate is exact and
    order-independent on both engines; double + 4-dp only at the end.
    """
    li = load_table(spark, "lineitem", sf_dir)
    part = load_table(spark, "part", sf_dir).filter(
        F.col("p_name").like("%gear%")
    )
    supp = load_table(spark, "supplier", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    profit = _volume() - (
        F.col("p_retailprice").cast("decimal(12,2)")
        * F.col("l_quantity").cast("decimal(3,0)")
        * F.lit("0.2").cast("decimal(2,1)")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(F.round(F.sum(profit).cast("double"), 4).alias("profit"))
    )


@register(
    "q11_important_stock",
    oracle="""
    WITH nat_li AS (
      SELECT l.l_partkey,
             CAST(l.l_extendedprice AS DECIMAL(12,2)) AS val
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'EUROPE'
    )
    SELECT l_partkey AS partkey,
           ROUND(CAST(SUM(val) AS DOUBLE), 4) AS stock_value
    FROM nat_li
    GROUP BY l_partkey
    HAVING CAST(SUM(val) AS DOUBLE) >
           (SELECT CAST(SUM(val) AS DOUBLE) * 0.001 FROM nat_li)
    """,
    tags=("relational", "tpch", "scalar-subquery"),
    tier="shadow",
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (adapted: stock value is the summed extended
    price of a region's suppliers' shipments rather than
    supplycost×availqty, scoped to EUROPE so every scale factor has
    qualifying suppliers): parts holding more than 0.1% of the region's
    total value — a grouped HAVING against a GLOBAL scalar subquery.

    The scalar total is a one-row aggregate broadcast into the HAVING
    filter (BroadcastNestedLoopJoin with a 1-row side — the sanctioned
    scalar pattern; never a shuffle).  Per-part sums and the grand total
    are exact DECIMAL; the 0.001 fraction threshold is computed in
    double identically on both engines.
    """
    li = load_table(spark, "lineitem", sf_dir)
    supp = load_table(spark, "supplier", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    region = load_table(spark, "region", sf_dir).filter(
        F.col("r_name") == "EUROPE"
    )
    nat_li = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .join(
            F.broadcast(region), F.col("n_regionkey") == region.r_regionkey
        )
        .select(
            "l_partkey",
            F.col("l_extendedprice").cast("decimal(12,2)").alias("val"),
        )
    )
    per_part = nat_li.groupBy(F.col("l_partkey").alias("partkey")).agg(
        F.sum("val").alias("val_dec")
    )
    total = nat_li.agg(
        (F.sum("val").cast("double") * F.lit(0.001)).alias("threshold")
    )
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("val_dec").cast("double") > F.col("threshold"))
        .select(
            "partkey",
            F.round(F.col("val_dec").cast("double"), 4).alias("stock_value"),
        )
    )


@register(
    "q16_supplier_cnt",
    oracle="""
    SELECT p.p_brand AS brand, p.p_type AS ptype, p.p_size AS psize,
           CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM part p
    JOIN lineitem l ON l.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_type NOT LIKE 'PROMO%'
      AND p.p_size IN (1, 4, 7, 10, 14, 19, 23, 36, 45, 49)
      AND l.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
    tags=("relational", "tpch", "anti-join"),
    tier="shadow",
)
def q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (adapted: the part-supplier relation comes from
    lineitem, and the NOT-IN "complaints" exclusion becomes suppliers
    with negative account balance): distinct supplier counts per
    (brand, type, size) after a NOT-IN anti-join.

    NOT IN over a non-nullable key column plans as a broadcast left-anti
    join (the excluded-supplier set is tiny); the brand/type/size
    filters push to the part scan.  COUNT(DISTINCT) shuffles only
    (group-key, suppkey) pairs — bounded by |part-filter| × |suppliers|.
    """
    part = load_table(spark, "part", sf_dir).filter(
        (F.col("p_brand") != "Brand#1")
        & (~F.col("p_type").like("PROMO%"))
        & (F.col("p_size").isin(1, 4, 7, 10, 14, 19, 23, 36, 45, 49))
    )
    li = load_table(spark, "lineitem", sf_dir).select("l_partkey", "l_suppkey")
    bad = (
        load_table(spark, "supplier", sf_dir)
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        li.join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(part), F.col("l_partkey") == part.p_partkey)
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.col("p_type").alias("ptype"),
            F.col("p_size").alias("psize"),
        )
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q20_dominant_supplier",
    oracle="""
    WITH small_parts AS (
      SELECT p_partkey FROM part WHERE p_name LIKE 'small%'
    ),
    shipped AS (
      SELECT l.l_partkey, l.l_suppkey, SUM(l.l_quantity) AS qty
      FROM lineitem l
      JOIN small_parts sp ON sp.p_partkey = l.l_partkey
      WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY l.l_partkey, l.l_suppkey
    ),
    part_total AS (
      SELECT l_partkey, SUM(qty) AS total_qty FROM shipped GROUP BY l_partkey
    )
    SELECT DISTINCT s.s_name AS supp_name, n.n_name AS nation
    FROM shipped sh
    JOIN part_total pt ON pt.l_partkey = sh.l_partkey
    JOIN supplier s ON s.s_suppkey = sh.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE sh.qty > 0.3 * pt.total_qty
    """,
    tags=("relational", "tpch", "semi-join"),
    tier="shadow",
)
def q20_dominant_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (adapted: no partsupp availability, so "excess
    availability" becomes DOMINANCE — a supplier shipping more than 30%
    of a small-named part's 1997 volume; the nation filter is dropped to
    keep the result populated at every scale factor): the nested-IN
    pyramid part-filter → per-(part,supp) aggregate → per-part total →
    qualifying suppliers.

    Both aggregation layers key on partkey, so the second groupBy reuses
    the first's partitioning (no extra exchange under AQE); the part
    name-filter list broadcasts into the lineitem scan, and the final
    supplier/nation lookups broadcast.  Quantities are integral doubles
    (≤ 50, exact), so sums and the 0.3 comparison are deterministic.
    """
    part = (
        load_table(spark, "part", sf_dir)
        .filter(F.col("p_name").like("small%"))
        .select("p_partkey")
    )
    li = load_table(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    supp = load_table(spark, "supplier", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    shipped = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    part_total = shipped.groupBy(F.col("l_partkey").alias("pt_key")).agg(
        F.sum("qty").alias("total_qty")
    )
    return (
        shipped.join(part_total, shipped.l_partkey == F.col("pt_key"))
        .filter(F.col("qty") > F.lit(0.3) * F.col("total_qty"))
        .join(F.broadcast(supp), shipped.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .select(
            F.col("s_name").alias("supp_name"), F.col("n_name").alias("nation")
        )
        .distinct()
    )


@register(
    "q21_waiting_supplier",
    oracle="""
    SELECT s.s_name AS supp_name,
           CAST(COUNT(*) AS BIGINT) AS numwait
    FROM lineitem l1
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY s.s_name
    """,
    tags=("relational", "tpch", "anti-join"),
    tier="shadow",
)
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (adapted: "late" = shipped more than 60 days
    after the order date, since the fixtures carry no commit/receipt
    dates; the nation filter is dropped so every scale factor yields
    rows): suppliers who were the SOLE late supplier on a finished
    multi-supplier order — EXISTS plus NOT-EXISTS self-joins on the
    fact table with a supplier-inequality residual.

    The semi and anti joins both key on l_orderkey, the same key as the
    orders join, so all three resolve in one co-partitioned exchange of
    the fact (AQE coalesces); supplier broadcasts at the end.  COUNT(*)
    over l1 rows (not distinct orders) mirrors the TPC-H definition.
    """
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    orders = load_table(spark, "orders", sf_dir).filter(
        F.col("o_orderstatus") == "F"
    )
    supp = load_table(spark, "supplier", sf_dir)

    late1 = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")
        )
        .select("l_orderkey", "l_suppkey")
    )
    other = li.select(
        F.col("l_orderkey").alias("o2_key"), F.col("l_suppkey").alias("s2_key")
    )
    # EXISTS: some line of the same order from a different supplier.
    has_other = late1.join(
        other,
        (late1.l_orderkey == F.col("o2_key"))
        & (late1.l_suppkey != F.col("s2_key")),
        "left_semi",
    )
    # NOT EXISTS: no OTHER supplier was also late on that order.  The
    # late-line set is reused as the anti side (same derivation as l1).
    other_late = late1.select(
        F.col("l_orderkey").alias("o3_key"), F.col("l_suppkey").alias("s3_key")
    )
    sole_late = has_other.join(
        other_late,
        (has_other.l_orderkey == F.col("o3_key"))
        & (has_other.l_suppkey != F.col("s3_key")),
        "left_anti",
    )
    return (
        sole_late.join(F.broadcast(supp), sole_late.l_suppkey == supp.s_suppkey)
        .groupBy(F.col("s_name").alias("supp_name"))
        .agg(F.count(F.lit(1)).alias("numwait"))
    )
