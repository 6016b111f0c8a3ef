"""Supplier-analytics query corpus: the TPC-H subquery family (Q2 / Q9 /
Q11 / Q16 / Q20 shapes) adapted to the driver's schema.

The classic forms of these five queries all require ``partsupp``, which
the test corpus does not ship; each is re-grounded on the part-supplier
relationship *observable in lineitem* (DISTINCT (l_partkey, l_suppkey)
pairs), keeping the defining plan shape of the original:

- Q2   → correlated per-group MIN subquery joined back as a filter
- Q9   → 5-table star profit rollup by (nation, year)
- Q11  → aggregate filtered against a scalar fraction-of-global-total
- Q16  → null-aware NOT IN anti join + COUNT(DISTINCT) grouped profile
- Q20  → nested aggregate-over-aggregate HAVING (dominant-share suppliers)

Scale notes: the sp pair-dedup is one md5-uniform shuffle; every
supplier/part/nation dimension is broadcast (100 / 2 000 / 25 rows —
dimension-sized at any SF since they grow ~SF while lineitem grows
~6M·SF); the Q11/Q20 scalar totals are 1-row broadcasts. Decimal-exact
sums make every equality / threshold comparison engine-stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streaming_etl_pipeline_spark.plans.corpus import register
from streaming_etl_pipeline_spark.sources import read_table

_DISC_PRICE_SQL = (
    "CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(12,2))"
)


def _disc_price():
    return (
        F.col("l_extendedprice").cast("decimal(12,2)")
        * (F.lit(1) - F.col("l_discount")).cast("decimal(12,2)")
    )


def _sp_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT (l_partkey, l_suppkey) — the corpus' stand-in for partsupp.

    One shuffle on a two-key md5-uniform pair; output is bounded by
    |part| × |suppliers-per-part|, i.e. dimension-scale, so downstream
    consumers can broadcast it.
    """
    return (
        read_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )


@register(
    "q2_min_cost_supplier",
    """
    WITH sp AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
         mins AS (SELECT l_partkey, min(s_acctbal) AS min_bal
                  FROM sp JOIN supplier ON l_suppkey = s_suppkey
                  GROUP BY 1)
    SELECT p_partkey, p_brand, s_name, s_acctbal
    FROM part JOIN sp ON p_partkey = l_partkey
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN mins ON mins.l_partkey = p_partkey AND s_acctbal = min_bal
    WHERE p_size <= 5
    """,
)
def q_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for each small-size part, the supplier(s) with the
    minimum account balance among suppliers that have shipped it — the
    correlated per-group MIN computed once and joined back as an equality
    filter (min-bal stands in for ps_supplycost, which the corpus lacks).

    Plan: sp pairs (1 shuffle) → broadcast supplier join → per-part min
    (dimension-sized agg) → broadcast back. No fact re-scan.
    """
    sp = _sp_pairs(spark, sf_dir)
    supp = read_table(spark, sf_dir, "supplier")
    part = read_table(spark, sf_dir, "part").filter(F.col("p_size") <= 5)
    sp_bal = sp.join(F.broadcast(supp), sp.l_suppkey == supp.s_suppkey).select(
        "l_partkey", "s_name", "s_acctbal"
    )
    mins = sp_bal.groupBy("l_partkey").agg(F.min("s_acctbal").alias("min_bal"))
    return (
        sp_bal.join(
            F.broadcast(mins),
            (sp_bal.l_partkey == mins.l_partkey)
            & (sp_bal.s_acctbal == mins.min_bal),
        )
        .drop(mins.l_partkey)
        .join(F.broadcast(part), F.col("l_partkey") == part.p_partkey)
        .select("p_partkey", "p_brand", "s_name", "s_acctbal")
    )


@register(
    "q9_profit_by_nation",
    f"""
    SELECT n_name AS nation,
           CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
           CAST(sum({_DISC_PRICE_SQL}) AS DOUBLE) AS sum_profit
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN nation ON s_nationkey = n_nationkey
         JOIN part ON l_partkey = p_partkey
    WHERE p_name LIKE '%gear%'
    GROUP BY 1, 2
    """,
)
def q_q9_profit_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: product-line profit by supplier nation and order
    year — a 5-table star rollup where the part filter (name contains
    'gear') prunes the fact before the orders join (profit is the
    discounted price; the corpus has no ps_supplycost to subtract).

    Plan: one fact scan, three broadcast dims (part filtered first so the
    l_partkey semi-reduction happens before the big orders join), single
    shuffle on the 2-key (nation, year) rollup.
    """
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part").filter(F.col("p_name").contains("gear"))
    orders = read_table(spark, sf_dir, "orders")
    supp = read_table(spark, sf_dir, "supplier")
    nation = read_table(spark, sf_dir, "nation")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(F.sum(_disc_price()).cast("double").alias("sum_profit"))
    )


@register(
    "q11_important_parts",
    f"""
    WITH pv AS (SELECT l_partkey AS p_partkey, sum({_DISC_PRICE_SQL}) AS val
                FROM lineitem GROUP BY 1)
    SELECT p_partkey, CAST(val AS DOUBLE) AS value
    FROM pv
    WHERE val > (SELECT CAST(sum(val) AS DECIMAL(18,2)) * 0.0006 FROM pv)
    """,
)
def q_q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose traded value exceeds a fixed fraction
    of the global total — a grouped aggregate filtered against a scalar
    subquery over itself (value = discounted revenue standing in for
    supplycost × availqty).

    Plan: one shuffle for the per-part sums; the global total re-aggregates
    those partials (map-side combined) into 1 row and broadcasts back, so
    the fact is scanned once and nothing big moves twice.
    """
    from pyspark import StorageLevel

    li = read_table(spark, sf_dir, "lineitem")
    pv = (
        li.groupBy(F.col("l_partkey").alias("p_partkey"))
        .agg(F.sum(_disc_price()).alias("val"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    thresh = pv.agg(
        (F.sum("val").cast("decimal(18,2)") * F.lit(0.0006)).alias("_thresh")
    )
    return (
        pv.crossJoin(F.broadcast(thresh))
        .filter(F.col("val") > F.col("_thresh"))
        .select("p_partkey", F.col("val").cast("double").alias("value"))
    )


@register(
    "q16_supplier_variety",
    """
    SELECT p_brand, p_type, p_size,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#3' AND p_size IN (1, 5, 11, 17, 23, 31, 41, 47)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY 1, 2, 3
    """,
)
def q_q16_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: how many distinct suppliers ship each surviving
    (brand, type, size) bucket, excluding a complaint-list of suppliers —
    the NOT IN branch (negative-balance suppliers standing in for the
    complaint regex) exercises Spark's null-aware anti join.

    Plan: broadcast the filtered part dim, broadcast-anti the tiny
    exclusion list, one shuffle for the 3-key distinct count.
    """
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#3")
        & F.col("p_size").isin(1, 5, 11, 17, 23, 31, 41, 47)
    )
    bad = (
        read_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select(F.col("s_suppkey").alias("bad_suppkey"))
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(
            F.broadcast(bad),
            li.l_suppkey == F.col("bad_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").cast("long").alias("supplier_cnt"))
    )


@register(
    "q20_dominant_suppliers",
    """
    WITH shipped AS (
      SELECT l_partkey, l_suppkey, sum(CAST(l_quantity AS DECIMAL(12,2))) AS qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY 1, 2),
     tot AS (SELECT l_partkey, sum(qty) AS total_qty FROM shipped GROUP BY 1)
    SELECT s_suppkey, s_name, CAST(count(*) AS BIGINT) AS n_dominant
    FROM shipped JOIN tot USING (l_partkey)
         JOIN supplier ON l_suppkey = s_suppkey
    WHERE qty > CAST(total_qty * 0.5 AS DECIMAL(12,2)) AND total_qty >= 50
    GROUP BY 1, 2
    HAVING count(*) >= 5
    """,
)
def q_q20_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers who shipped the majority (>50%) of at
    least five parts' 1997 volume — the aggregate-over-aggregate HAVING
    pattern (per-pair quantity vs. per-part total standing in for
    0.5 × ps_availqty), with a volume floor so dominance over a trickle
    doesn't count.

    Plan: date-pruned fact scan → (part, supp) partial sums (1 shuffle) →
    per-part totals re-aggregate the partials (map-side combined, no fact
    re-scan) and broadcast back → supplier-grain count, dimension-sized.
    """
    from pyspark import StorageLevel

    li = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    shipped = (
        li.groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(12,2)")).alias("qty"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    tot = shipped.groupBy("l_partkey").agg(F.sum("qty").alias("total_qty"))
    supp = read_table(spark, sf_dir, "supplier")
    return (
        shipped.join(F.broadcast(tot), "l_partkey")
        .filter(
            (F.col("qty") > (F.col("total_qty") * 0.5).cast("decimal(12,2)"))
            & (F.col("total_qty") >= 50)
        )
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .groupBy("s_suppkey", "s_name")
        .agg(F.count(F.lit(1)).cast("long").alias("n_dominant"))
        .filter(F.col("n_dominant") >= 5)
    )
