"""TPC-H extension — the remaining query shapes (q2, q7, q8, q9, q11, q12,
q13, q15, q16, q17, q20, q21), adapted to the slim testdata schema.

The testdata star schema has no ``partsupp`` table and lineitem lacks
``l_shipmode``/``l_commitdate``/``l_receiptdate``, so queries that need them
are *adapted*: the join/aggregate/subquery SHAPE (what the optimizer has to
handle — correlated scalar subqueries, EXISTS/NOT-EXISTS pairs, HAVING over
a global scalar, left-join-with-residual-condition) is preserved while the
predicate constants are re-targeted at available columns. Each docstring
states the adaptation.

A derived ``partsupp`` stands in wherever the real one is required:
    ps_partkey, ps_suppkey   = distinct (l_partkey, l_suppkey)
    ps_supplycost            = min unit price ever charged (round 6dp)
    ps_availqty              = total quantity ever shipped (exact: integral
                               doubles summed as DECIMAL)
Deriving it is ONE lineitem shuffle; a production deployment would
materialize it as a bucketed table (bucketed by ps_partkey) so the q2/q11/
q16/q20 family never re-shuffles the fact table.

Numeric determinism follows the module convention in ``analytics.py``:
per-row DOUBLE arithmetic is identical IEEE work in Spark and DuckDB, so we
round per row, cast to DECIMAL, and let the *sum* be exact/order-independent;
final division/rounding happens once on the aggregated value.

Scale notes: dimension sides (part filters, supplier, nation, region,
per-part aggregates, per-order aggregates that follow a fact groupBy) are
broadcast explicitly; fact-fact joins shuffle on their natural keys;
correlated EXISTS pairs are rewritten as one aggregation over the
correlation key (q21) — one shuffle instead of two self-joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from timedb_spark.functions.rounding import floor6, floor6_sql
from timedb_spark.io.tables import load_table

_DEC = "decimal(18,2)"


def _d(col: str):
    return F.col(col).cast(_DEC)


def _ts(s: str):
    return F.lit(s).cast("timestamp")


# ---------------------------------------------------------------------------
# Derived partsupp (shared by q2 / q11 / q16 / q20)
# ---------------------------------------------------------------------------


def derived_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy(
        F.col("l_partkey").alias("ps_partkey"), F.col("l_suppkey").alias("ps_suppkey")
    ).agg(
        F.min(floor6(F.col("l_extendedprice") / F.col("l_quantity"))).alias("ps_supplycost"),
        F.sum(_d("l_quantity")).cast("double").alias("ps_availqty"),
    )


PS_SQL = f"""
    SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
           min({floor6_sql('l_extendedprice / l_quantity')}) AS ps_supplycost,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS ps_availqty
    FROM lineitem GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Q2 — minimum-cost supplier (correlated scalar-min subquery)
# ---------------------------------------------------------------------------


def tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adapted: partsupp is derived; ``p_type LIKE '%BRASS'`` becomes an
    equality on the flat p_type vocabulary. Shape kept: region-scoped
    (part, supplier) candidates filtered to the per-part minimum cost.
    Spark plan: the correlated min is a window-min over ps_partkey on the
    already-filtered candidate set — single pass, no re-scan of lineitem."""
    ps = derived_partsupp(spark, sf_dir)
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    parts = load_table(spark, sf_dir, "part").filter((F.col("p_size") == 15) & (F.col("p_type") == "STANDARD"))
    supp_eu = (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    cand = ps.join(F.broadcast(parts), ps.ps_partkey == parts.p_partkey).join(
        F.broadcast(supp_eu), ps.ps_suppkey == supp_eu.s_suppkey
    )
    w = Window.partitionBy("ps_partkey")
    return (
        cand.withColumn("min_cost", F.min("ps_supplycost").over(w))
        .filter(F.col("ps_supplycost") == F.col("min_cost"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_type", "ps_supplycost")
    )


TPCH_Q2_SQL = f"""
WITH ps AS ({PS_SQL})
SELECT s_acctbal, s_name, n_name, p_partkey, p_type, ps_supplycost
FROM part, ps, supplier, nation, region
WHERE p_partkey = ps_partkey AND s_suppkey = ps_suppkey
  AND p_size = 15 AND p_type = 'STANDARD'
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey AND r_name = 'EUROPE'
  AND ps_supplycost = (
      SELECT min(ps_supplycost)
      FROM ps ps2, supplier s2, nation n2, region r2
      WHERE ps2.ps_partkey = part.p_partkey AND s2.s_suppkey = ps2.ps_suppkey
        AND s2.s_nationkey = n2.n_nationkey AND n2.n_regionkey = r2.r_regionkey
        AND r2.r_name = 'EUROPE')
"""


# ---------------------------------------------------------------------------
# Q7 — volume shipping between two nations (dual-alias dimension join)
# ---------------------------------------------------------------------------


def tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1995-01-01")) & (F.col("l_shipdate") < _ts("1997-01-01"))
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    n2 = nation.select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation"))
    # Nation filters applied to the (tiny) dims BEFORE they broadcast onto the
    # facts — the fact-fact lineitem⋈orders shuffle only carries survivors.
    supp_n = supp.join(F.broadcast(n1), supp.s_nationkey == n1.n1_key).filter(
        F.col("supp_nation").isin("NATION_3", "NATION_7")
    )
    cust_n = cust.join(F.broadcast(n2), cust.c_nationkey == n2.n2_key).filter(
        F.col("cust_nation").isin("NATION_3", "NATION_7")
    )
    disc = F.lit(1).cast(_DEC) - _d("l_discount")
    return (
        li.join(F.broadcast(supp_n), li.l_suppkey == supp_n.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust_n), orders.o_custkey == cust_n.c_custkey)
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.round(F.sum(_d("l_extendedprice") * disc).cast("double"), 4).alias("revenue"))
    )


TPCH_Q7_SQL = """
SELECT supp_nation, cust_nation, l_year,
       round(CAST(sum(volume) AS DOUBLE), 4) AS revenue
FROM (
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           year(l_shipdate) AS l_year,
           CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS volume
    FROM supplier, lineitem, orders, customer, nation n1, nation n2
    WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey AND c_custkey = o_custkey
      AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
      AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
        OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
      AND l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
) shipping
GROUP BY supp_nation, cust_nation, l_year
"""


# ---------------------------------------------------------------------------
# Q8 — national market share (conditional share of a grouped sum)
# ---------------------------------------------------------------------------


def tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adapted: ``p_type = 'ECONOMY ANODIZED STEEL'`` → ``'ECONOMY'``."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1995-01-01")) & (F.col("o_orderdate") < _ts("1997-01-01"))
    )
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    parts = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    n1 = nation.select(F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region"))
    n2 = nation.select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation"))
    cust_am = (
        cust.join(F.broadcast(n1), cust.c_nationkey == n1.n1_key)
        .join(F.broadcast(region), F.col("n1_region") == region.r_regionkey)
        .select("c_custkey")
    )
    supp_n = supp.join(F.broadcast(n2), supp.s_nationkey == n2.n2_key).select("s_suppkey", "supp_nation")
    disc = F.lit(1).cast(_DEC) - _d("l_discount")
    vol = (
        li.join(F.broadcast(parts), li.l_partkey == parts.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust_am), orders.o_custkey == cust_am.c_custkey)
        .join(F.broadcast(supp_n), li.l_suppkey == supp_n.s_suppkey)
        .select(
            F.year("o_orderdate").alias("o_year"),
            (_d("l_extendedprice") * disc).alias("volume"),
            "supp_nation",
        )
    )
    target = F.when(F.col("supp_nation") == "NATION_8", F.col("volume")).otherwise(F.lit(0).cast(_DEC))
    return vol.groupBy("o_year").agg(
        F.round((F.sum(target).cast("double") / F.sum("volume").cast("double")), 6).alias("mkt_share")
    )


TPCH_Q8_SQL = """
SELECT o_year,
       round(CAST(sum(CASE WHEN supp_nation = 'NATION_8' THEN volume ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
             / CAST(sum(volume) AS DOUBLE), 6) AS mkt_share
FROM (
    SELECT year(o_orderdate) AS o_year,
           CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS volume,
           n2.n_name AS supp_nation
    FROM part, supplier, lineitem, orders, customer, nation n1, nation n2, region
    WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey AND l_orderkey = o_orderkey
      AND o_custkey = c_custkey AND c_nationkey = n1.n_nationkey
      AND n1.n_regionkey = r_regionkey AND r_name = 'AMERICA'
      AND s_nationkey = n2.n_nationkey
      AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND p_type = 'ECONOMY'
) all_nations
GROUP BY o_year
"""


# ---------------------------------------------------------------------------
# Q9 — product-type profit (adapted cost model)
# ---------------------------------------------------------------------------


def tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adapted: no ps_supplycost ⇒ unit cost proxied as 60% of
    p_retailprice. Profit is computed per row in DOUBLE (identical IEEE in
    both engines), rounded, then summed as DECIMAL for order-independence."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    parts = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%bolt%"))
    amount = F.round(
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
        - F.lit(0.6) * F.col("p_retailprice") * F.col("l_quantity"),
        4,
    ).cast("decimal(28,4)")
    return (
        li.join(F.broadcast(parts), li.l_partkey == parts.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(F.round(F.sum(amount).cast("double"), 4).alias("sum_profit"))
    )


TPCH_Q9_SQL = """
SELECT nation, o_year, round(CAST(sum(amount) AS DOUBLE), 4) AS sum_profit
FROM (
    SELECT n_name AS nation, year(o_orderdate) AS o_year,
           CAST(round(l_extendedprice * (1.0 - l_discount) - 0.6 * p_retailprice * l_quantity, 4) AS DECIMAL(28,4)) AS amount
    FROM part, supplier, lineitem, orders, nation
    WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey AND l_orderkey = o_orderkey
      AND s_nationkey = n_nationkey AND p_name LIKE '%bolt%'
) profit
GROUP BY nation, o_year
"""


# ---------------------------------------------------------------------------
# Q11 — important stock identification (HAVING over a global scalar)
# ---------------------------------------------------------------------------


def tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adapted: partsupp derived; GERMANY → NATION_1; value fraction 0.001.
    The global total is a 1-row aggregate broadcast back as a cross join —
    the fact path is aggregated once and reused for both sides."""
    ps = derived_partsupp(spark, sf_dir)
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_1")
    supp_n = supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey).select("s_suppkey")
    value = F.round(F.col("ps_supplycost") * F.col("ps_availqty"), 2).cast(_DEC)
    per_part = (
        ps.join(F.broadcast(supp_n), ps.ps_suppkey == supp_n.s_suppkey)
        .groupBy("ps_partkey")
        .agg(F.sum(value).alias("value_dec"))
    )
    total = per_part.agg(F.sum("value_dec").cast("double").alias("total_value"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("value_dec").cast("double") > F.col("total_value") * 0.001)
        .select("ps_partkey", F.round(F.col("value_dec").cast("double"), 2).alias("value"))
    )


TPCH_Q11_SQL = f"""
WITH ps AS ({PS_SQL}),
scoped AS (
    SELECT ps_partkey, CAST(round(ps_supplycost * ps_availqty, 2) AS DECIMAL(18,2)) AS v
    FROM ps, supplier, nation
    WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey AND n_name = 'NATION_1'
),
per_part AS (SELECT ps_partkey, sum(v) AS value_dec FROM scoped GROUP BY ps_partkey)
SELECT ps_partkey, round(CAST(value_dec AS DOUBLE), 2) AS value
FROM per_part
WHERE CAST(value_dec AS DOUBLE) > (SELECT CAST(sum(value_dec) AS DOUBLE) FROM per_part) * 0.001
"""


# ---------------------------------------------------------------------------
# Q12 — shipping-delay priority check (conditional counts per bucket)
# ---------------------------------------------------------------------------


def tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adapted: no l_shipmode/commitdate/receiptdate ⇒ the group key is a
    ship-delay bucket (days from order to ship), and "late" semantics live in
    the bucket itself. Priority split is the original's CASE aggregation."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01")) & (F.col("l_shipdate") < _ts("1998-01-01"))
    )
    orders = load_table(spark, sf_dir, "orders")
    delay = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    bucket = (
        F.when(delay < 30, "FAST").when(delay < 90, "NORMAL").otherwise("SLOW")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(bucket.alias("ship_bucket"))
        .agg(
            F.count(F.when(high, F.lit(1))).alias("high_line_count"),
            F.count(F.when(~high, F.lit(1))).alias("low_line_count"),
        )
    )


TPCH_Q12_SQL = """
SELECT CASE WHEN date_diff('day', o_orderdate, l_shipdate) < 30 THEN 'FAST'
            WHEN date_diff('day', o_orderdate, l_shipdate) < 90 THEN 'NORMAL'
            ELSE 'SLOW' END AS ship_bucket,
       count(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 END) AS high_line_count,
       count(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 END) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Q13 — customer order-count distribution (left join + residual condition)
# ---------------------------------------------------------------------------


def tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adapted: the o_comment NOT LIKE filter becomes an o_orderpriority
    exclusion — the point is the residual condition INSIDE the left join
    (customers whose only orders are excluded still count as zero)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    joined = cust.join(
        orders,
        (cust.c_custkey == orders.o_custkey) & (orders.o_orderpriority != "4-NOT SPECIFIED"),
        "left",
    )
    per_cust = joined.groupBy("c_custkey").agg(F.count("o_orderkey").alias("c_count"))
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


TPCH_Q13_SQL = """
SELECT c_count, count(*) AS custdist
FROM (
    SELECT c_custkey, count(o_orderkey) AS c_count
    FROM customer LEFT JOIN orders
      ON c_custkey = o_custkey AND o_orderpriority <> '4-NOT SPECIFIED'
    GROUP BY c_custkey
) c_orders
GROUP BY c_count
"""


# ---------------------------------------------------------------------------
# Q15 — top supplier (view + scalar-max subquery)
# ---------------------------------------------------------------------------


def tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01")) & (F.col("l_shipdate") < _ts("1997-04-01"))
    )
    supp = load_table(spark, sf_dir, "supplier")
    disc = F.lit(1).cast(_DEC) - _d("l_discount")
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_d("l_extendedprice") * disc).alias("total_revenue_dec")
    )
    top = revenue.agg(F.max("total_revenue_dec").alias("max_revenue"))
    return (
        revenue.crossJoin(F.broadcast(top))
        .filter(F.col("total_revenue_dec") == F.col("max_revenue"))
        .join(F.broadcast(supp), F.col("supplier_no") == supp.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.round(F.col("total_revenue_dec").cast("double"), 4).alias("total_revenue"),
        )
    )


TPCH_Q15_SQL = """
WITH revenue AS (
    SELECT l_suppkey AS supplier_no,
           sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS total_revenue_dec
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
    GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, round(CAST(total_revenue_dec AS DOUBLE), 4) AS total_revenue
FROM supplier, revenue
WHERE s_suppkey = supplier_no
  AND total_revenue_dec = (SELECT max(total_revenue_dec) FROM revenue)
"""


# ---------------------------------------------------------------------------
# Q16 — parts/supplier relationship (NOT IN anti-join + count distinct)
# ---------------------------------------------------------------------------


def tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adapted: partsupp derived; the "complaints" comment filter becomes a
    negative-balance supplier exclusion (same NOT IN → broadcast anti-join)."""
    ps = derived_partsupp(spark, sf_dir)
    parts = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#3")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 9, 14, 19, 23, 36, 45)
    )
    bad_supp = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        ps.join(F.broadcast(parts), ps.ps_partkey == parts.p_partkey)
        .join(F.broadcast(bad_supp), ps.ps_suppkey == bad_supp.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
    )


TPCH_Q16_SQL = f"""
WITH ps AS ({PS_SQL})
SELECT p_brand, p_type, p_size, count(DISTINCT ps_suppkey) AS supplier_cnt
FROM ps JOIN part ON p_partkey = ps_partkey
WHERE p_brand <> 'Brand#3' AND p_type <> 'PROMO'
  AND p_size IN (1, 5, 9, 14, 19, 23, 36, 45)
  AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
"""


# ---------------------------------------------------------------------------
# Q17 — small-quantity-order revenue (correlated avg subquery)
# ---------------------------------------------------------------------------


def tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adapted: container filter → p_type equality. The correlated per-part
    AVG becomes an aggregate over the part-filtered lineitem, broadcast back
    — the fact table is scanned once per side but never self-joined row-wise."""
    li = load_table(spark, sf_dir, "lineitem")
    parts = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#5") & (F.col("p_type") == "SMALL")
    ).select("p_partkey")
    li_p = li.join(F.broadcast(parts), li.l_partkey == parts.p_partkey)
    avg_qty = li_p.groupBy("l_partkey").agg(
        (F.sum(_d("l_quantity")).cast("double") / F.count(F.lit(1))).alias("avg_qty")
    ).select(F.col("l_partkey").alias("ap_partkey"), "avg_qty")
    return (
        li_p.join(F.broadcast(avg_qty), li_p.l_partkey == F.col("ap_partkey"))
        .filter(F.col("l_quantity") < F.lit(0.2) * F.col("avg_qty"))
        .agg(F.round(F.sum(_d("l_extendedprice")).cast("double") / F.lit(7.0), 6).alias("avg_yearly"))
    )


TPCH_Q17_SQL = """
SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0, 6) AS avg_yearly
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#5' AND p_type = 'SMALL'
  AND l_quantity < 0.2 * (
      SELECT CAST(sum(CAST(l2.l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*)
      FROM lineitem l2 WHERE l2.l_partkey = part.p_partkey)
"""


# ---------------------------------------------------------------------------
# Q20 — potential part promotion (nested semi-join chain)
# ---------------------------------------------------------------------------


def tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adapted: no stock-on-hand ⇒ "promotable" = (part, supplier) pairs on
    'small%' parts whose 1996 shipments exceeded 20% of their all-time
    shipments (1996 is ~1/7 of the time span, so this flags 1996
    over-indexers). Shape kept: part-name semi-join inside a correlated
    quantity threshold inside a supplier semi-join, nation-scoped."""
    li = load_table(spark, sf_dir, "lineitem")
    parts = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("small%")).select("p_partkey")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_5")
    in96 = (F.col("l_shipdate") >= _ts("1996-01-01")) & (F.col("l_shipdate") < _ts("1997-01-01"))
    per_ps = (
        li.join(F.broadcast(parts), li.l_partkey == parts.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.sum(_d("l_quantity")).cast("double").alias("q_all"),
            F.sum(F.when(in96, _d("l_quantity")).otherwise(F.lit(0).cast(_DEC))).cast("double").alias("q_96"),
        )
        .filter(F.col("q_96") > F.lit(0.2) * F.col("q_all"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(per_ps, supp.s_suppkey == per_ps.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
    )


TPCH_Q20_SQL = """
SELECT s_suppkey, s_name
FROM supplier, nation
WHERE s_nationkey = n_nationkey AND n_name = 'NATION_5'
  AND s_suppkey IN (
      SELECT l_suppkey FROM (
          SELECT l_suppkey, l_partkey,
                 CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS q_all,
                 CAST(sum(CASE WHEN l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
                                AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
                               THEN CAST(l_quantity AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS q_96
          FROM lineitem
          WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
          GROUP BY l_suppkey, l_partkey
      ) t WHERE q_96 > 0.2 * q_all)
"""


# ---------------------------------------------------------------------------
# Q21 — suppliers who kept orders waiting (EXISTS / NOT EXISTS pair)
# ---------------------------------------------------------------------------


def tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adapted: "late delivery" (receipt > commit) → returnflag = 'R'.
    Spark-first rewrite: the EXISTS (another supplier in the order) +
    NOT EXISTS (another supplier ALSO flagged) pair collapses into ONE
    per-order aggregation — n_suppliers > 1 AND n_flagged_suppliers == 1 —
    joined back to the flagged lines: one lineitem shuffle on l_orderkey
    instead of two correlated self-joins. The DuckDB oracle keeps the
    textbook EXISTS/NOT-EXISTS form, so parity proves the rewrite."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F").select("o_orderkey")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_2")
    per_order = li.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))).alias("n_flagged"),
    ).filter((F.col("n_supp") > 1) & (F.col("n_flagged") == 1)).select(F.col("l_orderkey").alias("po_orderkey"))
    flagged = li.filter(F.col("l_returnflag") == "R").select("l_orderkey", "l_suppkey")
    return (
        flagged.join(per_order, flagged.l_orderkey == F.col("po_orderkey"), "left_semi")
        .join(orders, flagged.l_orderkey == orders.o_orderkey, "left_semi")
        .join(F.broadcast(supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


TPCH_Q21_SQL = """
SELECT s_name, count(*) AS numwait
FROM supplier, lineitem l1, orders, nation
WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
  AND o_orderstatus = 'F' AND l1.l_returnflag = 'R'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
  AND s_nationkey = n_nationkey AND n_name = 'NATION_2'
GROUP BY s_name
"""
