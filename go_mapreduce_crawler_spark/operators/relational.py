"""Relational operator surface (SURVEY.md §2.2) over the TPC-H-ish tables.

The reference implements none of these (it is a map-reduce kernel); this
module supplies the full standard-category coverage the new engine adds:
scans/projection/filter, every join type, grouped/distinct/rollup/cube
aggregation, window functions, sorts/limits/top-k, set ops, scalar
string/date/math/json functions, and gap-based sessionization.

Every query is declarative DataFrame/SQL — Catalyst handles pushdown,
pruning, join selection; AQE handles runtime sizing.  Scale notes per
query are in docstrings.  Aggregates over money columns go through
exact decimals (functions.exact) so results are partitioning- and
engine-independent — required both for the DuckDB value-hash oracle and
for reproducible answers on a 1000-executor cluster.

Determinism rules used throughout:
 * every LIMIT/top-k has a total-order tie-break key;
 * window orderings use unique key suffixes;
 * timestamps leave the engine as epoch micros (unix_micros/epoch_us)
   or DATE, never raw timestamps (tz-attachment differs per engine);
 * no transcendental float funcs (ln/exp) in oracle-checked outputs —
   libm rounding differs across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..functions.exact import dec, money_sum, money_avg
from ..sources.tables import load_table

MONEY = "decimal(12,2)"   # prices, balances, quantities
RATE = "decimal(4,2)"     # discount/tax in [0,1]


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _disc_price():
    """l_extendedprice * (1 - l_discount) — exact decimal, scale 4."""
    return dec("l_extendedprice", MONEY) * (F.lit(1).cast(RATE) - dec("l_discount", RATE))


def _charge():
    """disc_price * (1 + l_tax) — exact decimal, scale 6 (fits DECIMAL38
    in both Spark and DuckDB: (12,2)x(5,2)->(18,4), x(5,2)->(24,6))."""
    return _disc_price() * (F.lit(1).cast(RATE) + dec("l_tax", RATE))


# ---------------------------------------------------------------- scans

def q_scan_filter_project(spark, sf_dir):
    """Projection + predicate, both pushed into the parquet scan.

    Plan check (tests/test_plans.py): ReadSchema carries only 3 columns,
    PushedFilters carries the shipdate/quantity predicates.  At 100 TB
    this is the difference between scanning 3 columns of a date range and
    scanning the world.
    """
    l = _t(spark, sf_dir, "lineitem")
    return (l.filter((F.col("l_shipdate") >= "1998-01-01")
                     & (F.col("l_shipdate") < "1998-02-01")
                     & (F.col("l_quantity") < 5.0))
             .select("l_orderkey", "l_linenumber", "l_quantity"))


# ----------------------------------------------------------- aggregates

def q1_pricing_summary(spark, sf_dir):
    """TPC-H Q1 analogue: grouped partial+final aggregation.

    The flagship grouped agg — Catalyst plans map-side partial
    HashAggregate (the reference's per-worker Accumulate, pool.go:102-121)
    then final after a 6-group shuffle (the Combine, crawler.go:75-91).
    """
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= "1998-09-02")
    return (l.groupBy("l_returnflag", "l_linestatus")
             .agg(money_sum("l_quantity", MONEY).alias("sum_qty"),
                  money_sum("l_extendedprice", MONEY).alias("sum_base_price"),
                  F.sum(_disc_price()).cast("double").alias("sum_disc_price"),
                  F.sum(_charge()).cast("double").alias("sum_charge"),
                  money_avg("l_quantity", MONEY).alias("avg_qty"),
                  money_avg("l_extendedprice", MONEY).alias("avg_price"),
                  (F.sum(dec("l_discount", RATE)).cast("double") / F.count(F.lit(1))).alias("avg_disc"),
                  F.count(F.lit(1)).alias("count_order")))


def q6_revenue_change(spark, sf_dir):
    """TPC-H Q6 analogue: selective filter -> single global aggregate.

    The whole reference pipeline shape (global monoid fold) in one query;
    scan-local partial sums, one row after shuffle.
    """
    l = _t(spark, sf_dir, "lineitem")
    return (l.filter((F.col("l_shipdate") >= "1996-01-01")
                     & (F.col("l_shipdate") < "1997-01-01")
                     & (F.col("l_discount") >= 0.03) & (F.col("l_discount") <= 0.07)
                     & (F.col("l_quantity") < 24.0))
             .agg(F.sum(dec("l_extendedprice", MONEY) * dec("l_discount", RATE))
                   .cast("double").alias("revenue"),
                  F.count(F.lit(1)).alias("n_items")))


def q_agg_distinct(spark, sf_dir):
    """Exact distinct aggregation (Expand + two-phase agg in the plan)."""
    o = _t(spark, sf_dir, "orders")
    return (o.groupBy("o_orderpriority")
             .agg(F.countDistinct("o_custkey").alias("n_customers"),
                  F.count(F.lit(1)).alias("n_orders"),
                  money_sum("o_totalprice", MONEY).alias("sum_price")))


def q_agg_argminmax(spark, sf_dir):
    """max_by/min_by (argmax/argmin) per nation: richest and poorest
    customer names.

    The ordering key is made UNIQUE by construction — acctbal in cents
    (exact: the doubles are 2-dp) times 1e7 plus custkey — because
    max_by's tie behavior is engine-defined; a unique key makes the
    answer a pure function of the data.  Same partial+final shape as
    min/max (the buffer is one (key, value) pair), so it scales like any
    algebraic aggregate.
    """
    c = _t(spark, sf_dir, "customer")
    key = (F.round(F.col("c_acctbal") * 100).cast("long") * 10000000
           + F.col("c_custkey"))
    return (c.groupBy("c_nationkey")
             .agg(F.max_by("c_name", key).alias("richest_customer"),
                  F.min_by("c_name", key).alias("poorest_customer"),
                  F.max(dec("c_acctbal", MONEY)).cast("double").alias("max_bal"),
                  F.min(dec("c_acctbal", MONEY)).cast("double").alias("min_bal")))


def q_rollup(spark, sf_dir):
    """ROLLUP over region -> nation with broadcast dims.

    nation/region are fixed-size (25/5 rows) at any SF — always broadcast;
    no shuffle for the join even at 100 TB of customers.
    """
    c = _t(spark, sf_dir, "customer")
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    r = F.broadcast(_t(spark, sf_dir, "region"))
    return (c.join(n, c.c_nationkey == n.n_nationkey)
             .join(r, n.n_regionkey == r.r_regionkey)
             .rollup("r_name", "n_name")
             .agg(F.count(F.lit(1)).alias("n_customers"),
                  money_sum("c_acctbal", MONEY).alias("sum_acctbal")))


def q_cube(spark, sf_dir):
    """CUBE over returnflag x linestatus."""
    l = _t(spark, sf_dir, "lineitem")
    return (l.cube("l_returnflag", "l_linestatus")
             .agg(money_sum("l_quantity", MONEY).alias("sum_qty"),
                  F.count(F.lit(1)).alias("n_rows")))


def q_grouping_sets(spark, sf_dir):
    """GROUPING SETS via SQL (no DataFrame-API equivalent)."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql("""
        SELECT o_orderstatus, o_orderpriority,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """)


def q_pivot(spark, sf_dir):
    """Pivot linestatus into columns (oracle: conditional aggregation)."""
    l = _t(spark, sf_dir, "lineitem")
    out = (l.groupBy("l_returnflag")
            .pivot("l_linestatus", ["O", "F"])
            .agg(money_sum("l_quantity", MONEY)))
    return out.select(F.col("l_returnflag"),
                      F.col("O").alias("qty_open"),
                      F.col("F").alias("qty_filled"))


# ---------------------------------------------------------------- joins

def q3_shipping_priority(spark, sf_dir):
    """TPC-H Q3 analogue: 3-way join + grouped agg + deterministic top-10.

    customer(filtered segment) joins orders joins lineitem — all three
    shuffle on their keys; AQE converts the customer side to broadcast
    when the filtered build side is small.  Top-k via exact-decimal
    revenue with o_orderkey tie-break.
    """
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1998-01-01")
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1998-01-01")
    return (l.join(o, l.l_orderkey == o.o_orderkey)
             .join(c, o.o_custkey == c.c_custkey)
             .groupBy("o_orderkey",
                      F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
                      "o_orderpriority")
             .agg(F.sum(_disc_price()).cast("double").alias("revenue"))
             .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
             .limit(10))


def q5_local_supplier(spark, sf_dir):
    """TPC-H Q5 analogue: 6-way star join, revenue per nation.

    region/nation broadcast; customer⋈orders⋈lineitem⋈supplier shuffle on
    keys; the c_nationkey = s_nationkey predicate is a join condition, not
    a post-filter, so Catalyst applies it during the supplier join.
    """
    r = F.broadcast(_t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA"))
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01"))
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    return (c.join(n, c.c_nationkey == n.n_nationkey)
             .join(r, n.n_regionkey == r.r_regionkey)
             .join(o, c.c_custkey == o.o_custkey)
             .join(l, o.o_orderkey == l.l_orderkey)
             .join(s, (l.l_suppkey == s.s_suppkey)
                      & (c.c_nationkey == s.s_nationkey))
             .groupBy("n_name")
             .agg(F.sum(_disc_price()).cast("double").alias("revenue")))


def q7_nation_volume(spark, sf_dir):
    """TPC-H Q7 analogue: bilateral trade volume between two nations by
    ship year.

    supplier⋈nation and customer⋈nation are broadcast (25-row dim at any
    SF); the nation-pair disjunction then prunes BEFORE the big
    lineitem⋈orders shuffle — at 100 TB the fact-fact join only sees the
    two nations' rows, not the world.
    """
    n1 = F.broadcast(_t(spark, sf_dir, "nation")
                     .select(F.col("n_nationkey").alias("s_nk"),
                             F.col("n_name").alias("supp_nation")))
    n2 = F.broadcast(_t(spark, sf_dir, "nation")
                     .select(F.col("n_nationkey").alias("c_nk"),
                             F.col("n_name").alias("cust_nation")))
    s = _t(spark, sf_dir, "supplier").join(n1, F.col("s_nationkey") == F.col("s_nk"))
    c = _t(spark, sf_dir, "customer").join(n2, F.col("c_nationkey") == F.col("c_nk"))
    pair = ((F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_8")) | \
           ((F.col("supp_nation") == "NATION_8") & (F.col("cust_nation") == "NATION_3"))
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01"))
    o = _t(spark, sf_dir, "orders")
    return (l.join(s, F.col("l_suppkey") == F.col("s_suppkey"))
             .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
             .join(c, F.col("o_custkey") == F.col("c_custkey"))
             .filter(pair)
             .groupBy("supp_nation", "cust_nation",
                      F.year("l_shipdate").alias("l_year"))
             .agg(F.sum(_disc_price()).cast("double").alias("revenue")))


def q10_returned_items(spark, sf_dir):
    """TPC-H Q10 analogue: top-20 customers by returned-item revenue.

    One quarter of orders joins its 'R' lineitems, aggregates per
    customer, THEN joins the 25-row nation broadcast — aggregate first so
    the dim join touches |customers|, not |lineitems|.  Deterministic
    top-20 via (revenue desc, c_custkey) total order; the plan collapses
    to TakeOrderedAndProject (no global sort at scale).
    """
    c = _t(spark, sf_dir, "customer")
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-04-01"))
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    per_cust = (l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
                 .groupBy("o_custkey")
                 .agg(F.sum(_disc_price()).cast("double").alias("revenue")))
    return (per_cust.join(c, F.col("o_custkey") == F.col("c_custkey"))
            .join(n, F.col("c_nationkey") == F.col("n_nationkey"))
            .select("c_custkey", "c_name", "revenue",
                    dec("c_acctbal", MONEY).cast("double").alias("c_acctbal"),
                    "n_name")
            .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
            .limit(20))


def q12_ship_delay_priority(spark, sf_dir):
    """TPC-H Q12 analogue (schema has no shipmode/commitdate): order
    priority mix by ship-delay bucket.

    CASE-conditional aggregation — both counters come out of ONE pass
    over the join (no union of two filtered scans).  The delay bucket is
    a pure projection; the only shuffles are the orderkey join and the
    3-group final agg.
    """
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    delay = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    bucket = (F.when(delay <= 30, "fast")
               .when(delay <= 90, "normal").otherwise("slow"))
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
             .groupBy(bucket.alias("delay_bucket"))
             .agg(F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
                  F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
                  F.count(F.lit(1)).alias("n_lines")))


def q14_promo_revenue(spark, sf_dir):
    """TPC-H Q14 analogue: promo revenue share for one ship month.

    part is the build side of a broadcast-eligible join (20k rows at
    sf0.1; at 100 TB part grows with SF so AQE decides broadcast vs
    shuffle — the query text doesn't change).  Ratio of two exact-decimal
    sums, one double division at the end.
    """
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-06-01") & (F.col("l_shipdate") < "1997-07-01"))
    p = _t(spark, sf_dir, "part")
    promo = F.col("p_type") == "PROMO"
    return (l.join(p, F.col("l_partkey") == F.col("p_partkey"))
             .agg(F.round(
                      F.lit(100.0)
                      * F.sum(F.when(promo, _disc_price())
                               .otherwise(F.lit(0).cast("decimal(18,4)"))).cast("double")
                      / F.sum(_disc_price()).cast("double"), 6)
                   .alias("promo_pct"),
                  F.count(F.lit(1)).alias("n_lines")))


def q19_disjunctive_predicates(spark, sf_dir):
    """TPC-H Q19 analogue: OR-of-ANDs predicate across both join sides.

    The classic disjunctive-pushdown test: Catalyst factors the common
    l_quantity/p_size bounds out of the disjunction and pushes them into
    both parquet scans (CNF conversion), so each side prunes before the
    join even though no single disjunct is side-local.
    """
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    j = l.join(p, F.col("l_partkey") == F.col("p_partkey"))
    d1 = ((F.col("p_brand") == "Brand#11") & (F.col("p_size").between(1, 15))
          & (F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 11))
    d2 = ((F.col("p_brand") == "Brand#12") & (F.col("p_size").between(1, 25))
          & (F.col("l_quantity") >= 10) & (F.col("l_quantity") <= 20))
    d3 = ((F.col("p_brand") == "Brand#13") & (F.col("p_size").between(1, 35))
          & (F.col("l_quantity") >= 20) & (F.col("l_quantity") <= 30))
    return (j.filter(d1 | d2 | d3)
             .agg(F.sum(_disc_price()).cast("double").alias("revenue"),
                  F.count(F.lit(1)).alias("n_lines")))


def q22_idle_customers(spark, sf_dir):
    """TPC-H Q22 analogue (no phone column): rich-but-idle customers per
    market segment — acctbal above the positive-balance average, no
    orders since 1999.

    The scalar average is a 1-row broadcast (never a driver collect);
    NOT EXISTS is a left-anti join against the date-filtered orders —
    the filter shrinks the anti build side before the shuffle.
    """
    c = _t(spark, sf_dir, "customer")
    avg_bal = (c.filter(F.col("c_acctbal") > 0.0)
                .agg((F.sum(dec("c_acctbal", MONEY)).cast("double")
                      / F.count(F.lit(1))).alias("avg_bal")))
    recent = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") >= "1999-01-01")
    return (c.crossJoin(F.broadcast(avg_bal))
             .filter(dec("c_acctbal", MONEY).cast("double") > F.col("avg_bal"))
             .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
             .groupBy("c_mktsegment")
             .agg(F.count(F.lit(1)).alias("n_custs"),
                  money_sum("c_acctbal", MONEY).alias("total_bal")))


def q2_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2 analogue (no partsupp table): cheapest EUROPE supplier
    per STANDARD part, offers derived from lineitem min-price.

    The correlated MIN subquery becomes aggregate-then-join: one
    groupBy(partkey) over the region-filtered offers, joined back on
    (partkey, price == best).  The price comparison stays in DECIMAL so
    the equality is exact on any engine/partitioning.  nation⋈region and
    part are broadcast dims, and the region filter applies BEFORE the
    offers aggregation — the one lineitem shuffle carries only the
    region's ~1/5 of rows, not the world (1.55s -> ~0.9s at sf0.1).
    """
    eu = F.broadcast(
        _t(spark, sf_dir, "supplier")
        .join(_t(spark, sf_dir, "nation"), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(_t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE"),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name"))
    eu_offers = (_t(spark, sf_dir, "lineitem")
                 .join(eu, F.col("l_suppkey") == F.col("s_suppkey"))
                 .groupBy(F.col("l_partkey").alias("partkey"),
                          F.col("l_suppkey").alias("suppkey"),
                          "s_name", "s_acctbal", "n_name")
                 .agg(F.min(dec("l_extendedprice", MONEY)).alias("price")))
    # per-part minimum via window, not a second aggregate + self-join —
    # one pass over eu_offers instead of computing its subtree twice
    best = F.min("price").over(W.partitionBy("partkey"))
    p = F.broadcast(_t(spark, sf_dir, "part")
                    .filter((F.col("p_size") <= 10) & (F.col("p_type") == "STANDARD")))
    return (eu_offers.withColumn("best", best)
            .filter(F.col("price") == F.col("best"))
            .join(p, F.col("partkey") == F.col("p_partkey"))
            .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name",
                    F.col("price").cast("double").alias("best_price"))
            .orderBy(F.col("s_acctbal").desc(), F.col("p_partkey"), F.col("s_name"))
            .limit(20))


def q8_market_share(spark, sf_dir):
    """TPC-H Q8 analogue: NATION_3's share of AMERICA's ECONOMY-part
    import volume per order year — ratio of conditional sum to sum.

    Both sums accumulate in exact DECIMAL; the single double division
    happens once per year row (IEEE division is engine-identical).
    part, supplier⋈nation, customer-side nation⋈region are all broadcast;
    the plan's only shuffles are lineitem⋈orders and the 3-row final agg.
    """
    p = F.broadcast(_t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY"))
    sn = F.broadcast(
        _t(spark, sf_dir, "supplier")
        .join(_t(spark, sf_dir, "nation"),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation")))
    cam = F.broadcast(
        _t(spark, sf_dir, "customer")
        .join(_t(spark, sf_dir, "nation").withColumnRenamed("n_name", "cust_nation"),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .join(_t(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA"),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey"))
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1995-01-01") & (F.col("o_orderdate") < "1998-01-01"))
    l = _t(spark, sf_dir, "lineitem")
    vol = l.join(p, F.col("l_partkey") == F.col("p_partkey")) \
           .join(sn, F.col("l_suppkey") == F.col("s_suppkey")) \
           .join(o, F.col("l_orderkey") == F.col("o_orderkey")) \
           .join(cam, F.col("o_custkey") == F.col("c_custkey")) \
           .select(F.year("o_orderdate").alias("o_year"),
                   _disc_price().alias("volume"), "supp_nation")
    zero = F.lit(0).cast("decimal(18,4)")
    return (vol.groupBy("o_year")
               .agg(F.sum(F.when(F.col("supp_nation") == "NATION_3",
                                 F.col("volume")).otherwise(zero)).alias("nat"),
                    F.sum("volume").alias("tot"))
               .select("o_year",
                       F.round(F.col("nat").cast("double")
                               / F.col("tot").cast("double"), 6).alias("mkt_share")))


def q9_product_profit(spark, sf_dir):
    """TPC-H Q9 analogue: per supplier-nation, per year, profit on
    widget parts — no ps_supplycost exists, so cost is proxied as
    half the part's retail price per unit.

    amount = disc_price − 0.5·p_retailprice·l_quantity, all DECIMAL, so
    the grouped sum is exact and order-independent.  part (filtered to
    '%widget%') and supplier⋈nation broadcast; lineitem aggregates after
    one shuffle on (nation, year).
    """
    p = F.broadcast(_t(spark, sf_dir, "part")
                    .filter(F.col("p_name").like("%widget%"))
                    .select("p_partkey", "p_retailprice"))
    sn = F.broadcast(
        _t(spark, sf_dir, "supplier")
        .join(_t(spark, sf_dir, "nation"),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("nation")))
    l = _t(spark, sf_dir, "lineitem")
    half = F.lit("0.5").cast("decimal(2,1)")
    amount = _disc_price() - half * dec("p_retailprice", MONEY) * dec("l_quantity", MONEY)
    return (l.join(p, F.col("l_partkey") == F.col("p_partkey"))
             .join(sn, F.col("l_suppkey") == F.col("s_suppkey"))
             .groupBy("nation", F.year("l_shipdate").alias("o_year"))
             .agg(F.sum(amount).cast("double").alias("sum_profit")))


def q11_important_parts(spark, sf_dir):
    """TPC-H Q11 analogue: parts whose NATION_1 flow value exceeds 2× the
    mean part value — HAVING against a scalar aggregate subquery.

    The real Q11 hard-codes a fraction that must shrink with SF; using
    2×mean keeps the predicate scale-invariant.  The comparison is
    cross-multiplied (value·cnt > 2·total) so it stays in exact integer/
    DECIMAL arithmetic — no division, no float threshold.  The scalar
    (total, cnt) row is a broadcast crossJoin, never a driver collect.
    """
    sn = F.broadcast(
        _t(spark, sf_dir, "supplier")
        .join(_t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3"),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey"))
    v = (_t(spark, sf_dir, "lineitem")
         .join(sn, F.col("l_suppkey") == F.col("s_suppkey"))
         .groupBy("l_partkey")
         .agg(F.sum(dec("l_extendedprice", MONEY) * dec("l_quantity", MONEY))
               .alias("val")))
    t = v.agg(F.sum("val").alias("total"), F.count(F.lit(1)).alias("cnt"))
    return (v.crossJoin(F.broadcast(t))
             .filter(F.col("val") * F.col("cnt") > F.lit(2) * F.col("total"))
             .select("l_partkey", F.col("val").cast("double").alias("value")))


def q15_top_supplier(spark, sf_dir):
    """TPC-H Q15 analogue: supplier(s) with maximum Q1-1997 revenue —
    the view + scalar MAX subquery pattern.

    Revenue accumulates in DECIMAL so the rev == max(rev) equality is
    exact (a double-sum tie here could differ per partitioning and drop
    the winner).  The 1-row max is a broadcast crossJoin against the
    per-supplier aggregate, and supplier is a broadcast dim.
    """
    rev = (_t(spark, sf_dir, "lineitem")
           .filter((F.col("l_shipdate") >= "1997-01-01")
                   & (F.col("l_shipdate") < "1997-04-01"))
           .groupBy("l_suppkey")
           .agg(F.sum(_disc_price()).alias("rev")))
    mx = rev.agg(F.max("rev").alias("max_rev"))
    s = F.broadcast(_t(spark, sf_dir, "supplier"))
    return (rev.crossJoin(F.broadcast(mx))
               .filter(F.col("rev") == F.col("max_rev"))
               .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
               .select("s_suppkey", "s_name",
                       F.col("rev").cast("double").alias("total_revenue"))
               .orderBy("s_suppkey"))


def q16_supplier_part_count(spark, sf_dir):
    """TPC-H Q16 analogue: distinct supplier count per (brand, type,
    size), excluding low-balance suppliers — NOT IN as anti-join.

    The distinct (partkey, suppkey) dedup happens BEFORE the part join
    and the count-distinct, shrinking lineitem to the pair universe
    first.  The NOT IN list (s_acctbal < 1000) is non-null-key, so
    left_anti is semantics-identical; part is broadcast.
    """
    pairs = (_t(spark, sf_dir, "lineitem")
             .select("l_partkey", "l_suppkey").distinct())
    bad = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 1000.0) \
                                       .select("s_suppkey")
    p = F.broadcast(_t(spark, sf_dir, "part")
                    .filter((F.col("p_brand") != "Brand#1")
                            & F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22)))
    return (pairs.join(F.broadcast(bad),
                       F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
                 .join(p, F.col("l_partkey") == F.col("p_partkey"))
                 .groupBy("p_brand", "p_type", "p_size")
                 .agg(F.count_distinct("l_suppkey").alias("supplier_cnt")))


def q20_part_promotion(spark, sf_dir):
    """TPC-H Q20 analogue: NATION_2 suppliers who shipped >1/4 of some
    cold part's 1997 flow — the nested IN-subquery chain as semi-joins.

    Both aggregates come from ONE scan-filter of lineitem (per-pair and
    per-part rollups); the dominance test sq·4 > tq is cross-multiplied
    DECIMAL, no division.  The qualifying-supplier set then semi-joins
    supplier — Catalyst keeps it a broadcast semi at any SF since the
    set is bounded by |supplier|.
    """
    p = F.broadcast(_t(spark, sf_dir, "part")
                    .filter(F.col("p_name").like("cold%"))
                    .select("p_partkey"))
    flow = (_t(spark, sf_dir, "lineitem")
            .filter((F.col("l_shipdate") >= "1997-01-01")
                    & (F.col("l_shipdate") < "1998-01-01"))
            .join(p, F.col("l_partkey") == F.col("p_partkey"))
            .groupBy("l_partkey", "l_suppkey")
            .agg(F.sum(dec("l_quantity", MONEY)).alias("sq")))
    ptot = flow.groupBy("l_partkey").agg(F.sum("sq").alias("tq"))
    qual = (flow.join(ptot, ["l_partkey"])
                .filter(F.col("sq") * F.lit(4) > F.col("tq"))
                .select("l_suppkey"))
    sn = (_t(spark, sf_dir, "supplier")
          .join(F.broadcast(_t(spark, sf_dir, "nation")
                            .filter(F.col("n_name") == "NATION_8")),
                F.col("s_nationkey") == F.col("n_nationkey")))
    return (sn.join(qual, F.col("s_suppkey") == F.col("l_suppkey"), "semi")
              .select("s_name", "s_acctbal")
              .orderBy("s_name"))


def q21_waiting_suppliers(spark, sf_dir):
    """TPC-H Q21 analogue (no receipt/commit dates): NATION_0 suppliers
    who were the sole returner on a multi-supplier failed order —
    correlated EXISTS + NOT EXISTS as semi/anti joins with inequality
    residuals.

    Both the EXISTS (another supplier on the order) and NOT EXISTS (no
    OTHER supplier returned) hash-join on l_orderkey with the suppkey
    inequality as a residual predicate — the idiomatic Spark shape for
    correlated existence tests; no row explosion, no driver loop.
    """
    l = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_returnflag")
    fo = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F") \
                                    .select("o_orderkey")
    sn = F.broadcast(
        _t(spark, sf_dir, "supplier")
        .join(_t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_12"),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name"))
    base = (l.filter(F.col("l_returnflag") == "R")
             .join(fo, F.col("l_orderkey") == F.col("o_orderkey"))
             .join(sn, F.col("l_suppkey") == F.col("s_suppkey")))
    others = l.select(F.col("l_orderkey").alias("o2"), F.col("l_suppkey").alias("s2"))
    other_returns = (l.filter(F.col("l_returnflag") == "R")
                      .select(F.col("l_orderkey").alias("o3"),
                              F.col("l_suppkey").alias("s3")))
    return (base
            .join(others, (F.col("o2") == F.col("l_orderkey"))
                  & (F.col("s2") != F.col("l_suppkey")), "semi")
            .join(other_returns, (F.col("o3") == F.col("l_orderkey"))
                  & (F.col("s3") != F.col("l_suppkey")), "anti")
            .groupBy("s_name")
            .agg(F.count(F.lit(1)).alias("numwait"))
            .orderBy(F.col("numwait").desc(), F.col("s_name"))
            .limit(100))


def q_join_left(spark, sf_dir):
    """Left outer join: every customer with order stats, zero-filled.

    Aggregate-then-join: orders pre-aggregated to one row per custkey
    BEFORE the join — at scale this shrinks the probe side from |orders|
    to |customers| and keeps the join 1:1.
    """
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    per_cust = (o.groupBy("o_custkey")
                 .agg(F.count(F.lit(1)).alias("n_orders"),
                      money_sum("o_totalprice", MONEY).alias("total_spent")))
    return (c.join(per_cust, c.c_custkey == per_cust.o_custkey, "left")
             .select("c_custkey", "c_name",
                     F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
                     F.coalesce("total_spent", F.lit(0.0)).alias("total_spent")))


def q_join_semi(spark, sf_dir):
    """Left-semi join (EXISTS): customers having a >490k order."""
    c = _t(spark, sf_dir, "customer")
    big = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 490000.0)
    return (c.join(big, c.c_custkey == big.o_custkey, "left_semi")
             .select("c_custkey", "c_name", "c_nationkey"))


def q_join_anti(spark, sf_dir):
    """Left-anti join (NOT EXISTS): customers with no orders at all."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (c.join(o, c.c_custkey == o.o_custkey, "left_anti")
             .select("c_custkey", "c_name", "c_acctbal"))


def q_join_fullouter(spark, sf_dir):
    """Full outer join of per-nation customer vs supplier account sums."""
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    ca = c.groupBy(F.col("c_nationkey").alias("nationkey")) \
          .agg(money_sum("c_acctbal", MONEY).alias("cust_bal"))
    sa = s.groupBy(F.col("s_nationkey").alias("nationkey")) \
          .agg(money_sum("s_acctbal", MONEY).alias("supp_bal"))
    return (ca.join(sa, "nationkey", "full_outer")
              .select("nationkey",
                      F.coalesce("cust_bal", F.lit(0.0)).alias("cust_bal"),
                      F.coalesce("supp_bal", F.lit(0.0)).alias("supp_bal")))


def q_join_range(spark, sf_dir):
    """Non-equi (range) join: price-band classification of parts.

    Bands are a tiny broadcast side, so the theta-join is a
    BroadcastNestedLoopJoin — the only sane physical plan for non-equi
    conditions; never shuffle-NLJ a big side at scale.
    """
    p = _t(spark, sf_dir, "part")
    bands = spark.createDataFrame(
        [(0.0, 500.0, "budget"), (500.0, 1200.0, "mid"),
         (1200.0, 1e9, "premium")],
        "lo double, hi double, band string")
    return (p.join(F.broadcast(bands),
                   (p.p_retailprice >= bands.lo) & (p.p_retailprice < bands.hi))
             .groupBy("band")
             .agg(F.count(F.lit(1)).alias("n_parts"),
                  money_sum("p_retailprice", MONEY).alias("sum_price")))


def q4_order_priority(spark, sf_dir):
    """TPC-H Q4 analogue: correlated EXISTS subquery -> left-semi join.

    Catalyst rewrites the EXISTS into a LeftSemi with the correlated
    predicate as the join condition — the decorrelation path; written in
    SQL to exercise it end-to-end (predicate adapted to this fixture's
    columns: an order counts if any line is discounted > 5%).
    """
    from ..sources.tables import register_views
    register_views(spark, sf_dir)
    return spark.sql("""
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-01-01'
          AND o_orderdate <  TIMESTAMP '1997-04-01'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_discount > 0.05)
        GROUP BY o_orderpriority
    """)


def q13_customer_distribution(spark, sf_dir):
    """TPC-H Q13 analogue: outer-join order counts -> count histogram.

    Two aggregations with different keys (custkey, then count value) —
    the second input is |customers| rows, the histogram fits anywhere.
    """
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    per_cust = (c.join(o, c.c_custkey == o.o_custkey, "left")
                 .groupBy("c_custkey")
                 .agg(F.count("o_orderkey").alias("c_count")))
    return (per_cust.groupBy("c_count")
                    .agg(F.count(F.lit(1)).alias("custdist")))


def q17_small_quantity_revenue(spark, sf_dir):
    """TPC-H Q17 analogue: correlated scalar subquery (per-part average).

    avg-per-part is aggregate-then-join (never a correlated rescan):
    one pass computes the per-key threshold, a self-join applies it.
    """
    l = _t(spark, sf_dir, "lineitem")
    thresholds = (l.groupBy(F.col("l_partkey").alias("t_partkey"))
                   .agg((F.lit(0.5) * F.sum(dec("l_quantity", MONEY)).cast("double")
                         / F.count(F.lit(1))).alias("half_avg_qty")))
    return (l.join(thresholds, l.l_partkey == thresholds.t_partkey)
             .filter(F.col("l_quantity") < F.col("half_avg_qty"))
             .agg((F.sum(dec("l_extendedprice", MONEY)).cast("double") / F.lit(7.0))
                  .alias("avg_yearly"),
                  F.count(F.lit(1)).alias("n_small")))


def q18_large_volume_customer(spark, sf_dir):
    """TPC-H Q18 analogue: IN (grouped HAVING subquery).

    Written as aggregate-once-join-the-aggregate: the textbook form
    semi-joins orders against the HAVING subquery and then re-joins +
    re-aggregates raw lineitem — scanning and shuffling the fact table
    twice for a sum the subquery already computed.  Since the final
    group keys are unique per order, total_qty IS the subquery's sum:
    one lineitem scan, one aggregation, then joins against the (small)
    qualifying set.  Same rows as the textbook form — the oracle runs
    the textbook SQL.
    """
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    big = (l.groupBy("l_orderkey")
            .agg(F.sum(dec("l_quantity", MONEY)).alias("sum_qty"))
            .filter(F.col("sum_qty") > 150)
            .select("l_orderkey", F.col("sum_qty").cast("double").alias("total_qty")))
    return (o.join(big, o.o_orderkey == big.l_orderkey)
             .join(c, o.o_custkey == c.c_custkey)
             .select("c_name", "c_custkey", "o_orderkey",
                     F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
                     "o_totalprice", "total_qty")
             .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
             .limit(100))


# -------------------------------------------------------------- windows

def q_window_topk(spark, sf_dir):
    """Top-3 parts per brand by retail price (rank window + filter).

    The canonical distributed top-k-per-group: one shuffle on the
    partition key, no global sort.
    """
    p = _t(spark, sf_dir, "part")
    w = W.partitionBy("p_brand").orderBy(F.col("p_retailprice").desc(), F.col("p_partkey"))
    return (p.withColumn("rk", F.row_number().over(w))
             .filter(F.col("rk") <= 3)
             .select("p_brand", "p_partkey", "p_retailprice", "rk"))


def q_window_running(spark, sf_dir):
    """Running sum + lag/lead over a unique ordering within each order."""
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 1000)
    w = W.partitionBy("l_orderkey").orderBy("l_linenumber")
    return l.select(
        "l_orderkey", "l_linenumber",
        F.sum(dec("l_quantity", MONEY)).over(
            w.rowsBetween(W.unboundedPreceding, W.currentRow))
         .cast("double").alias("running_qty"),
        F.lag("l_linenumber", 1).over(w).alias("prev_line"),
        F.lead("l_linenumber", 1).over(w).alias("next_line"),
        F.count(F.lit(1)).over(W.partitionBy("l_orderkey")).alias("n_lines"))


def q_window_rank_dense(spark, sf_dir):
    """rank/dense_rank/ntile over suppliers by balance within nation."""
    s = _t(spark, sf_dir, "supplier")
    w = W.partitionBy("s_nationkey").orderBy(F.col("s_acctbal").desc(), F.col("s_suppkey"))
    return s.select("s_nationkey", "s_suppkey",
                    F.rank().over(w).alias("rnk"),
                    F.dense_rank().over(w).alias("drnk"),
                    F.ntile(4).over(w).alias("quartile"))


def q_null_semantics(spark, sf_dir):
    """Three-valued logic surface: per customer, 1997-H1 vs 1997-H2 order
    counts (null when absent via outer joins), compared with both plain
    `=` (null-propagating) and null-safe `<=>` equality.

    Pins the engine's null semantics as data: eq3 is 'null' whenever
    either side is NULL (three-valued `=` rendered as a string so the
    nullable-boolean doesn't fall into engine-specific None/NaN
    normalization), eq_ns is always a real boolean.  Aggregate-then-join
    keeps both sides at |customers| cardinality.
    """
    c = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 500)
    o = _t(spark, sf_dir, "orders")

    def half(lo, hi, alias):
        return (o.filter((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi))
                 .groupBy(F.col("o_custkey").alias(f"k_{alias}"))
                 .agg(F.count(F.lit(1)).alias(alias)))

    h1 = half("1997-01-01", "1997-07-01", "cnt_h1")
    h2 = half("1997-07-01", "1998-01-01", "cnt_h2")
    return (c.join(h1, c.c_custkey == h1.k_cnt_h1, "left")
             .join(h2, c.c_custkey == h2.k_cnt_h2, "left")
             .select("c_custkey", "cnt_h1", "cnt_h2",
                     F.when((F.col("cnt_h1") == F.col("cnt_h2")).isNull(), "null")
                      .when(F.col("cnt_h1") == F.col("cnt_h2"), "true")
                      .otherwise("false").alias("eq3"),
                     F.col("cnt_h1").eqNullSafe(F.col("cnt_h2")).alias("eq_ns"),
                     F.coalesce("cnt_h1", F.lit(0)).alias("cnt_h1_zf")))


def q_window_percentiles(spark, sf_dir):
    """percent_rank / cume_dist over customers by balance within segment.

    Unique ordering (acctbal, custkey) makes both analytic values a pure
    function of the data.  Same single-shuffle shape as any partitioned
    window.
    """
    c = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 1000)
    w = W.partitionBy("c_mktsegment").orderBy(
        dec("c_acctbal", MONEY), F.col("c_custkey"))
    return c.select(
        "c_mktsegment", "c_custkey",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"))


def q_unpivot_balances(spark, sf_dir):
    """UNPIVOT (melt): per-nation customer/supplier balance sums from two
    wide columns to (nationkey, side, bal) long form.

    The inverse of pivot_linestatus — Spark's ``unpivot`` is an Expand
    (one output row per value column), a narrow op: zero extra shuffles
    beyond the two input aggregations.
    """
    ca = (_t(spark, sf_dir, "customer")
          .groupBy(F.col("c_nationkey").alias("nationkey"))
          .agg(money_sum("c_acctbal", MONEY).alias("cust_bal")))
    sa = (_t(spark, sf_dir, "supplier")
          .groupBy(F.col("s_nationkey").alias("nationkey"))
          .agg(money_sum("s_acctbal", MONEY).alias("supp_bal")))
    wide = (ca.join(sa, "nationkey", "full_outer")
            .select("nationkey",
                    F.coalesce("cust_bal", F.lit(0.0)).alias("cust_bal"),
                    F.coalesce("supp_bal", F.lit(0.0)).alias("supp_bal")))
    return wide.unpivot("nationkey", ["cust_bal", "supp_bal"], "side", "bal")


# ------------------------------------------------------- sorts & limits

def q_sort_limit(spark, sf_dir):
    """Global top-20 by totalprice (TakeOrderedAndProject — no full sort)."""
    o = _t(spark, sf_dir, "orders")
    return (o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
             .select("o_orderkey", "o_custkey", "o_totalprice")
             .limit(20))


# -------------------------------------------------------------- set ops

def q_set_ops(spark, sf_dir):
    """UNION / INTERSECT / EXCEPT over customer vs supplier nation keys."""
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    u = c.union(s).distinct().select("nationkey", F.lit("union").alias("op"))
    i = c.intersect(s).select("nationkey", F.lit("intersect").alias("op"))
    e = c.distinct().exceptAll(s.distinct()).select("nationkey", F.lit("except").alias("op"))
    return u.union(i).union(e)


def q_set_ops_multiset(spark, sf_dir):
    """The bag-semantics (ALL) set operators q_set_ops's distinct forms
    skip: INTERSECT ALL keeps min(n, m) copies per key, EXCEPT ALL
    keeps n - m, UNION ALL keeps n + m — summarized as per-key counts
    so the multiplicity arithmetic itself is what the oracle checks
    (the oracle derives the same counts from LEAST/GREATEST over the
    two sides' tallies, never running a multiset operator — two
    independent constructions).  Spark plans INTERSECT ALL / EXCEPT
    ALL as count-compacted anti/semi aggregates, so nothing here
    shuffles more than (key, count) rows at any scale.
    """
    c = _t(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey"))

    def tally(df, op):
        return (df.groupBy("nationkey")
                  .agg(F.count(F.lit(1)).alias("cnt"))
                  .select("nationkey", F.lit(op).alias("op"), "cnt"))

    return (tally(c.intersectAll(s), "intersect_all")
            .union(tally(c.exceptAll(s), "except_all"))
            .union(tally(c.unionAll(s), "union_all")))


# ----------------------------------------------------- scalar functions

def q_scalar_string(spark, sf_dir):
    """String functions: upper/substr/length/concat/replace/split/regexp."""
    p = _t(spark, sf_dir, "part").filter(F.col("p_partkey") <= 500)
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.length("p_name").alias("name_len"),
        F.substring("p_name", 1, 5).alias("name_pre"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.regexp_replace("p_name", " ", "_").alias("name_snake"),
        F.split(F.col("p_name"), " ").getItem(0).alias("first_word"),
        F.regexp_extract("p_brand", r"#(\d+)", 1).cast("int").alias("brand_num"))


def q_scalar_date(spark, sf_dir):
    """Date/time functions grouped to year-month."""
    o = _t(spark, sf_dir, "orders")
    return (o.groupBy(F.year("o_orderdate").alias("yr"),
                      F.month("o_orderdate").alias("mon"))
             .agg(F.count(F.lit(1)).alias("n_orders"),
                  F.min(F.date_format("o_orderdate", "yyyy-MM-dd")).alias("first_day"),
                  F.max(F.dayofmonth("o_orderdate")).alias("max_dom")))


def q_scalar_math(spark, sf_dir):
    """Math functions with engine-deterministic results (no libm)."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 500)
    return c.select(
        "c_custkey",
        F.abs("c_acctbal").alias("abs_bal"),
        F.round(F.col("c_acctbal"), 0).alias("round_bal"),
        F.floor("c_acctbal").cast("long").alias("floor_bal"),
        F.ceil("c_acctbal").cast("long").alias("ceil_bal"),
        F.sqrt(F.abs("c_acctbal")).alias("sqrt_bal"),
        (F.col("c_custkey") % 7).alias("mod7"),
        F.greatest("c_acctbal", F.lit(0.0)).alias("pos_bal"))


def q_scalar_json(spark, sf_dir):
    """JSON extraction from the events.props payload, grouped."""
    e = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (e.groupBy("event_type")
             .agg(F.count(F.lit(1)).alias("n_events"),
                  F.sum(k).alias("sum_k"),
                  F.min(k).alias("min_k"),
                  F.max(k).alias("max_k")))


def q_scalar_variant(spark, sf_dir):
    """Spark 4 VARIANT surface: parse the JSON payload into the native
    semi-structured type once, then do typed path extraction on the
    binary-encoded variant (`try_variant_get`) instead of re-parsing
    strings per access — the modern replacement for chained
    get_json_object calls (each of which re-parses the JSON text).

    At 100 TB the win is columnar: variant shredding keeps one parsed
    binary per row; N path extractions cost N binary probes, not N text
    parses.  Missing paths are NULL (try_ semantics), shown by the
    absent-path count.  Output is typed scalars only, so the oracle
    (DuckDB's JSON extraction — same values, different engine route)
    hashes identically.
    """
    e = _t(spark, sf_dir, "events")
    v = F.parse_json("props")
    k = F.try_variant_get(v, "$.k", "int")
    missing = F.try_variant_get(v, "$.absent", "int")
    return (e.select("event_type", k.alias("k"), missing.alias("m"))
             .groupBy("event_type")
             .agg(F.count(F.lit(1)).alias("n_events"),
                  F.sum("k").alias("sum_k"),
                  F.sum((F.col("k") % 10).cast("long")).alias("sum_k_mod"),
                  F.count("m").alias("n_absent_hits")))


def q_scalar_map(spark, sf_dir):
    """MapType surface: per-user event-type histogram as a map column.

    Built with map_from_entries over a sorted entry array (entry order is
    deterministic), consumed with map_keys/map_values/element_at.  The
    map itself never leaves the engine — output columns are arrays and
    scalars, which hash portably in the oracle compare.
    """
    e = _t(spark, sf_dir, "events")
    per = (e.groupBy("user_id", "event_type")
            .agg(F.count(F.lit(1)).alias("cnt")))
    m = (per.groupBy("user_id")
            .agg(F.map_from_entries(
                F.array_sort(F.collect_list(F.struct("event_type", "cnt"))))
                .alias("hist")))
    # Array outputs ride as comma-joined strings: the driver's oracle
    # canonicalizer can't hash list cells, and int→string is the one
    # rendering both engines agree on bit-for-bit.
    return m.select(
        "user_id",
        F.concat_ws(",", F.map_keys("hist")).alias("types"),
        F.concat_ws(",", F.transform(F.map_values("hist"),
                                     lambda c: c.cast("string"))).alias("counts"),
        F.coalesce(F.element_at("hist", F.lit("click")), F.lit(0)).alias("n_click"),
        F.size("hist").alias("n_types"))


def q_collect_sorted(spark, sf_dir):
    """Array aggregation: sorted distinct event types per user."""
    e = _t(spark, sf_dir, "events").filter(F.col("user_id") <= 50)
    return (e.groupBy("user_id")
             .agg(F.concat_ws(",", F.array_sort(F.collect_set("event_type")))
                   .alias("types"),
                  F.count(F.lit(1)).alias("n_events")))


def q_scalar_array_hof(spark, sf_dir):
    """Higher-order array functions: filter / aggregate (fold) /
    zip_with / transform over the embedding vectors.

    Spark's sequential fold starting at 0.0 is bit-identical to
    DuckDB's list_reduce seeded by list_prepend(0.0, ...) — IEEE
    0.0+x == x — so every output carries a full value oracle.  These
    HOFs are interpreted (not codegen'd); for hot-path vector math use
    the numpy kernels in similarity.py — this query is the
    correctness surface for the HOF API itself.
    """
    e = _t(spark, sf_dir, "embeddings")
    arr = F.col("embedding")
    pos = F.filter(arr, lambda x: x > 0)
    return e.select(
        "vec_id",
        F.size(pos).alias("n_pos"),
        F.round(F.aggregate(pos, F.lit(0.0),
                            lambda acc, x: acc + x.cast("double")), 6)
         .alias("sum_pos"),
        F.round(F.aggregate(
            F.zip_with(arr, F.reverse(arr),
                       lambda x, y: x.cast("double") * y.cast("double")),
            F.lit(0.0), lambda acc, x: acc + x), 6)
         .alias("dot_rev"),
        # decimal(18,6)→string renders identically in Spark and DuckDB
        # (fixed scale, no sci-notation, -0.0 normalized), so the array
        # hashes portably as one comma-joined string.
        F.concat_ws(",", F.transform(
            F.slice(arr, 1, 3),
            lambda x: F.round(x.cast("double") * 2, 6)
                       .cast("decimal(18,6)").cast("string")))
         .alias("first3_x2"))


def q_scd2_upsert(spark, sf_dir):
    """Slowly-changing-dimension (type 2) merge: apply a change set to a
    dimension snapshot, emitting versioned rows with a current flag.

    The MERGE pattern without a table format: changes pre-aggregate to
    one row per key, then ONE left join against the dimension and a
    union of (expired v1 | unchanged-current v1 | new-current v2) —
    never a per-row driver loop.  At scale the join broadcasts when the
    change set is small (the common case for dimension maintenance) and
    the output partitions by is_current so readers prune history.
    Balances stay in exact DECIMAL through the add.
    """
    c = _t(spark, sf_dir, "customer")
    delta = (_t(spark, sf_dir, "orders")
             .filter(F.col("o_orderdate") >= "2000-01-01")
             .groupBy("o_custkey")
             .agg(F.sum(dec("o_totalprice", MONEY)).alias("delta")))
    j = c.join(delta, c.c_custkey == delta.o_custkey, "left")
    v1 = j.select("c_custkey", F.lit(1).alias("version"),
                  dec("c_acctbal", MONEY).cast("double").alias("acctbal"),
                  F.col("delta").isNull().alias("is_current"))
    v2 = (j.filter(F.col("delta").isNotNull())
           .select("c_custkey", F.lit(2).alias("version"),
                   (dec("c_acctbal", MONEY) + F.col("delta"))
                   .cast("double").alias("acctbal"),
                   F.lit(True).alias("is_current")))
    return v1.unionByName(v2)


# ----------------------------------------------------------- statistics

def q_stats_moments(spark, sf_dir):
    """Mean / sample-variance / stddev / correlation from EXACT decimal
    power sums (Σx, Σx², Σxy are order-independent decimals; the float
    math happens once, on scalars, at the end — deterministic on any
    cluster size, unlike naive float sum-of-squares).
    """
    l = _t(spark, sf_dir, "lineitem")
    q = dec("l_quantity", MONEY)
    p = dec("l_extendedprice", MONEY)
    g = (l.groupBy("l_returnflag")
          .agg(F.count(F.lit(1)).alias("n"),
               F.sum(q).alias("sx"), F.sum(q * q).alias("sx2"),
               F.sum(p).alias("sy"), F.sum(p * p).alias("sy2"),
               F.sum(q * p).alias("sxy")))
    nd = F.col("n").cast("double")
    sxd, sx2d = F.col("sx").cast("double"), F.col("sx2").cast("double")
    syd, sy2d = F.col("sy").cast("double"), F.col("sy2").cast("double")
    sxyd = F.col("sxy").cast("double")
    var_x = (nd * sx2d - sxd * sxd) / (nd * (nd - F.lit(1.0)))
    var_y = (nd * sy2d - syd * syd) / (nd * (nd - F.lit(1.0)))
    corr = ((nd * sxyd - sxd * syd)
            / (F.sqrt(nd * sx2d - sxd * sxd) * F.sqrt(nd * sy2d - syd * syd)))
    return g.select(
        "l_returnflag", "n",
        F.round(sxd / nd, 6).alias("mean_qty"),
        F.round(var_x, 6).alias("var_qty"),
        F.round(F.sqrt(var_x), 6).alias("std_qty"),
        F.round(syd / nd, 6).alias("mean_price"),
        F.round(var_y, 6).alias("var_price"),
        F.round(corr, 6).alias("corr_qty_price"))


ABC_BUCKET = 10_000   # revenue-range bucket width for the two-level prefix


def q_abc_analysis(spark, sf_dir):
    """ABC (Pareto 80/15/5) classification of parts by revenue: rank
    parts by lineitem revenue descending, accumulate the revenue
    share, and classify A (first 80% of revenue), B (next 15%), C
    (tail) — the inventory-analysis classic.

    The global revenue-descending running sum is the classic
    single-partition-window scale-killer; this is the two-level prefix
    form KEYED BY THE ORDER COLUMN'S VALUE RANGE (unlike
    seq_packing/token_budget, which bucket an existing key): bucket =
    floor(revenue / 10k), contiguous in the sort order by
    construction, so intra-bucket cumulative sums partition on the
    bucket while the bucket summary (one row per occupied range)
    carries the offsets back by broadcast.  All sums in DECIMAL; one
    double division per row for the share.  The oracle deliberately
    uses the single global-window construction, so the two independent
    formulations must agree exactly.
    """
    l = _t(spark, sf_dir, "lineitem")
    rev = (l.groupBy("l_partkey")
            .agg(F.sum(dec("l_extendedprice", MONEY)
                       * (1 - dec("l_discount", "decimal(12,2)")))
                  .alias("revenue")))
    b = rev.withColumn("bkt", F.floor(F.col("revenue") / ABC_BUCKET))
    bsum = b.groupBy("bkt").agg(F.sum("revenue").alias("s"))
    w_off = (W.orderBy(F.desc("bkt"))
              .rowsBetween(W.unboundedPreceding, -1))
    offs = bsum.select("bkt",
                       F.coalesce(F.sum("s").over(w_off),
                                  F.lit(0).cast("decimal(38,4)")).alias("off"))
    total = rev.agg(F.sum("revenue").alias("total"))
    w_in = (W.partitionBy("bkt")
             .orderBy(F.desc("revenue"), F.asc("l_partkey"))
             .rowsBetween(W.unboundedPreceding, W.currentRow))
    cum = (b.join(F.broadcast(offs), "bkt")
            .withColumn("cum", F.col("off") + F.sum("revenue").over(w_in))
            .crossJoin(F.broadcast(total)))
    share = F.floor(F.col("cum").cast("double")
                    / F.col("total").cast("double") * 1e6).cast("long")
    return (cum.select("l_partkey",
                       F.col("revenue").cast("double").alias("revenue"),
                       share.alias("cum_share_ppm"))
               .withColumn("abc_class",
                           F.when(F.col("cum_share_ppm") <= 800_000, "A")
                            .when(F.col("cum_share_ppm") <= 950_000, "B")
                            .otherwise("C")))


def q_median_per_group(spark, sf_dir):
    """Exact lower-median per group via rank — the deterministic,
    engine-portable percentile (no interpolation-rule ambiguity).

    Scale-safe two-level form (r04): the fact table first compacts to
    (group, value, cnt) with a partial+final agg — map-side combine
    shrinks a 100-TB scan to |groups| x |distinct values| rows — and
    ONLY that compacted relation is ranked.  The window sort therefore
    touches ~50 distinct quantities per flag, not TBs of raw rows per
    group partition (the r03 single-task-sort-per-group skew).  The
    lower median is the smallest value whose cumulative count reaches
    ceil(n/2) — identical to ranking raw rows, because equal values
    are interchangeable at the rank boundary.  Pinned by
    tests/test_plans.py::test_median_family_ranks_compacted_relation.
    """
    l = _t(spark, sf_dir, "lineitem")
    vc = (l.groupBy("l_returnflag", "l_quantity")
           .agg(F.count(F.lit(1)).alias("cnt")))
    grp = W.partitionBy("l_returnflag")
    w = grp.orderBy("l_quantity")
    ranked = vc.select(
        "l_returnflag", "l_quantity", "cnt",
        F.sum("cnt").over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
         .alias("cum"),
        F.sum("cnt").over(grp).alias("n"))
    target = ((F.col("n") + 1) / 2).cast("long")
    return (ranked.filter((F.col("cum") >= target)
                          & (F.col("cum") - F.col("cnt") < target))
                  .select("l_returnflag",
                          F.col("l_quantity").alias("median_qty"),
                          "n"))


def q_percentile_cont(spark, sf_dir):
    """Exact linearly-interpolated percentiles (the SQL PERCENTILE_CONT
    semantics) per group — Spark's ``percentile`` and DuckDB's
    ``quantile_cont`` share the interpolation rule, so the values carry a
    full oracle (rounded 6 dp to absorb float division order).

    Scale: exact interpolated percentiles need the group's sorted values
    (Spark buffers per group in the SortAggregate) — right for bounded
    group cardinality x bounded group size; the sketch-based
    approx_quantiles_gk is the unbounded-scale twin (mergeable partials,
    rank error <= n/10000).
    """
    l = _t(spark, sf_dir, "lineitem")
    return (l.groupBy("l_returnflag")
             .agg(*[F.round(F.expr(f"percentile(l_quantity, {q})"), 6)
                     .alias(f"p{int(q * 100)}")
                    for q in (0.25, 0.5, 0.75, 0.9, 0.99)],
                  F.count(F.lit(1)).alias("n")))


# -------------------------------------------------------- sessionization

def q_sessionize(spark, sf_dir):
    """Gap-based sessionization (30-min inactivity) — batch form.

    lag + cumulative-sum-of-boundaries, the classic two-window formulation;
    one shuffle on user_id covers both windows.  The streaming twin lives
    in streaming/sessions.py (session_window / applyInPandasWithState).
    """
    e = _t(spark, sf_dir, "events")
    order = [F.col("ts"), F.col("event_id")]
    w_seq = W.partitionBy("user_id").orderBy(*order)
    gap = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts", 1).over(w_seq))
    tagged = e.withColumn(
        "new_sess",
        F.when(gap > 30 * 60 * 1_000_000, 1).otherwise(0))
    sess = tagged.withColumn(
        "session_id",
        F.sum("new_sess").over(w_seq.rowsBetween(W.unboundedPreceding, W.currentRow)))
    return (sess.groupBy("user_id", "session_id")
                .agg(F.count(F.lit(1)).alias("n_events"),
                     F.min(F.unix_micros("ts")).alias("start_us"),
                     F.max(F.unix_micros("ts")).alias("end_us"),
                     F.sum(dec("value", MONEY)).cast("double").alias("sum_value")))


def q_division_priorities(spark, sf_dir):
    """Relational division: customers who placed orders at EVERY order
    priority — "bought from all categories" / "active in all periods",
    the classic FORALL query SQL has no operator for (~half the
    customers qualify at any SF, so the result is selective but never
    vacuous).

    Division-by-counting: distinct (custkey, priority) compacts the
    fact table with a partial+final agg, then HAVING count = divisor
    cardinality, where the divisor cardinality is itself a 1-row
    aggregate broadcast into the filter — no double-NOT-EXISTS
    correlated subquery (the textbook form — quadratic probe work), no
    self-join: one shuffle on custkey.
    """
    o = load_table(spark, sf_dir, "orders")
    pairs = o.select("o_custkey", "o_orderpriority").distinct()
    divisor = (o.select("o_orderpriority").distinct()
                .agg(F.count(F.lit(1)).alias("n_prio")))
    return (pairs.groupBy("o_custkey")
                 .agg(F.count(F.lit(1)).alias("n_priorities"))
                 .join(F.broadcast(divisor),
                       F.col("n_priorities") == F.col("n_prio"))
                 .select("o_custkey", "n_priorities"))


def q_mode_per_group(spark, sf_dir):
    """Deterministic mode: each user's most frequent event type, ties
    broken by the smaller type string — the categorical summary
    statistic (MODE() itself is nondeterministic under ties in both
    engines, so the tie-break is part of the contract).

    Compact to (group, value, cnt) first — map-side combine does the
    heavy lifting — then a row_number over the tiny compacted relation
    picks the winner.  Same two-level shape as median_per_group: the
    window ranks |groups| x |distinct types| rows, never the fact
    table.
    """
    e = load_table(spark, sf_dir, "events")
    cnt = (e.groupBy("user_id", "event_type")
            .agg(F.count(F.lit(1)).alias("cnt")))
    w = (W.partitionBy("user_id")
          .orderBy(F.desc("cnt"), F.asc("event_type")))
    return (cnt.withColumn("rn", F.row_number().over(w))
               .filter(F.col("rn") == 1)
               .select("user_id",
                       F.col("event_type").alias("mode_event_type"),
                       F.col("cnt").alias("n_events")))


def q_weighted_median(spark, sf_dir):
    """Weighted lower median of l_extendedprice per return flag, with
    l_quantity as the weight — "the price at which half the UNITS (not
    half the line items) sell below" — the weighted-quantile operator
    plain median can't express.

    Same compacted two-level discipline as median_per_group: the fact
    table first collapses to (flag, price, total_weight) with a
    partial+final agg, the running weight ranks ONLY that compacted
    relation, and the answer is min(price | 2*cum_weight >= total) —
    the comparison in exact DECIMAL, no division.
    """
    l = _t(spark, sf_dir, "lineitem")
    cnts = (l.groupBy("l_returnflag",
                      F.col("l_extendedprice").alias("price"))
             .agg(F.sum(dec("l_quantity", MONEY)).alias("w")))
    wnd = (W.partitionBy("l_returnflag").orderBy("price")
            .rowsBetween(W.unboundedPreceding, W.currentRow))
    tot = W.partitionBy("l_returnflag")
    ranked = (cnts.withColumn("cum", F.sum("w").over(wnd))
                  .withColumn("tot", F.sum("w").over(tot)))
    return (ranked.filter(F.col("cum") * 2 >= F.col("tot"))
                  .groupBy("l_returnflag")
                  .agg(F.min("price").alias("weighted_median_price"),
                       F.first(F.col("tot").cast("double"))
                        .alias("total_weight")))


SNAPSHOT_AS_OF = "1996-06-30"


def q_snapshot_latest_as_of(spark, sf_dir):
    """Point-in-time reconstruction (time travel over a changelog):
    treating each order as its customer's latest state change, rebuild
    the per-customer state AS OF {d} — the latest order's key, date,
    status, and price at that date.

    ONE partial+final max(struct) aggregate after the date filter
    prunes at the scan: the struct's (date, orderkey) prefix is a
    total order per customer (orderkey is unique), so no window ranks
    the changelog and a hot customer costs one aggregation cell.  The
    oracle uses ROW_NUMBER over (date DESC, orderkey DESC) — the
    opposite construction.
    """.format(d=SNAPSHOT_AS_OF)
    o = load_table(spark, sf_dir, "orders")
    day = F.date_format("o_orderdate", "yyyy-MM-dd")
    best = F.max(F.struct(
        day.alias("d"), F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("st"),
        F.col("o_totalprice").alias("pr")))
    return (o.filter(F.col("o_orderdate") <= SNAPSHOT_AS_OF)
             .groupBy("o_custkey").agg(best.alias("b"))
             .select("o_custkey", F.col("b.k").alias("last_orderkey"),
                     F.col("b.d").alias("last_order_date"),
                     F.col("b.st").alias("last_status"),
                     F.col("b.pr").alias("last_price")))


QUERIES = {
    "scan_filter_project": q_scan_filter_project,
    "division_all_priorities": q_division_priorities,
    "agg_mode_per_group": q_mode_per_group,
    "snapshot_latest_as_of": q_snapshot_latest_as_of,
    "weighted_median_price": q_weighted_median,
    "q1_pricing_summary": q1_pricing_summary,
    "q6_revenue_change": q6_revenue_change,
    "agg_distinct": q_agg_distinct,
    "agg_argminmax": q_agg_argminmax,
    "rollup_region_nation": q_rollup,
    "cube_flag_status": q_cube,
    "grouping_sets": q_grouping_sets,
    "pivot_linestatus": q_pivot,
    "q3_shipping_priority": q3_shipping_priority,
    "q4_order_priority": q4_order_priority,
    "q5_local_supplier": q5_local_supplier,
    "q7_nation_volume": q7_nation_volume,
    "q10_returned_items": q10_returned_items,
    "q12_ship_delay_priority": q12_ship_delay_priority,
    "q14_promo_revenue": q14_promo_revenue,
    "q19_disjunctive_predicates": q19_disjunctive_predicates,
    "q22_idle_customers": q22_idle_customers,
    "q2_min_cost_supplier": q2_min_cost_supplier,
    "q8_market_share": q8_market_share,
    "q9_product_profit": q9_product_profit,
    "q11_important_parts": q11_important_parts,
    "q15_top_supplier": q15_top_supplier,
    "q16_supplier_part_count": q16_supplier_part_count,
    "q20_part_promotion": q20_part_promotion,
    "q21_waiting_suppliers": q21_waiting_suppliers,
    "q13_customer_distribution": q13_customer_distribution,
    "q17_small_quantity_revenue": q17_small_quantity_revenue,
    "q18_large_volume_customer": q18_large_volume_customer,
    "join_left_outer": q_join_left,
    "join_semi": q_join_semi,
    "join_anti": q_join_anti,
    "join_full_outer": q_join_fullouter,
    "join_range_bands": q_join_range,
    "window_topk_per_group": q_window_topk,
    "window_running_sum": q_window_running,
    "window_rank_dense_ntile": q_window_rank_dense,
    "window_percent_cume": q_window_percentiles,
    "null_semantics": q_null_semantics,
    "unpivot_balances": q_unpivot_balances,
    "sort_limit_top20": q_sort_limit,
    "set_ops": q_set_ops,
    "set_ops_multiset": q_set_ops_multiset,
    "scalar_string": q_scalar_string,
    "scalar_date": q_scalar_date,
    "scalar_math": q_scalar_math,
    "scalar_json": q_scalar_json,
    "scalar_variant": q_scalar_variant,
    "collect_sorted_arrays": q_collect_sorted,
    "scalar_array_hof": q_scalar_array_hof,
    "scd2_upsert": q_scd2_upsert,
    "scalar_map_histogram": q_scalar_map,
    "sessionize_events": q_sessionize,
    "stats_moments_exact": q_stats_moments,
    "median_per_group": q_median_per_group,
    "abc_analysis_parts": q_abc_analysis,
    "percentile_cont_exact": q_percentile_cont,
}


_DISC = "CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))"
_CHARGE = f"{_DISC} * (CAST(1 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2)))"

ORACLE = {
    "scan_filter_project": """
        SELECT l_orderkey, l_linenumber, l_quantity
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1998-01-01'
          AND l_shipdate <  TIMESTAMP '1998-02-01'
          AND l_quantity < 5.0
    """,
    "q1_pricing_summary": f"""
        SELECT l_returnflag, l_linestatus,
               SUM(CAST(l_quantity AS DECIMAL(12,2)))::DOUBLE AS sum_qty,
               SUM(CAST(l_extendedprice AS DECIMAL(12,2)))::DOUBLE AS sum_base_price,
               SUM({_DISC})::DOUBLE AS sum_disc_price,
               SUM({_CHARGE})::DOUBLE AS sum_charge,
               SUM(CAST(l_quantity AS DECIMAL(12,2)))::DOUBLE / COUNT(*) AS avg_qty,
               SUM(CAST(l_extendedprice AS DECIMAL(12,2)))::DOUBLE / COUNT(*) AS avg_price,
               SUM(CAST(l_discount AS DECIMAL(4,2)))::DOUBLE / COUNT(*) AS avg_disc,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
    """,
    "q6_revenue_change": """
        SELECT SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                   * CAST(l_discount AS DECIMAL(4,2)))::DOUBLE AS revenue,
               COUNT(*) AS n_items
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
          AND l_discount >= 0.03 AND l_discount <= 0.07
          AND l_quantity < 24.0
    """,
    "agg_distinct": """
        SELECT o_orderpriority,
               COUNT(DISTINCT o_custkey) AS n_customers,
               COUNT(*) AS n_orders,
               SUM(CAST(o_totalprice AS DECIMAL(12,2)))::DOUBLE AS sum_price
        FROM orders GROUP BY o_orderpriority
    """,
    "agg_argminmax": """
        SELECT c_nationkey,
               arg_max(c_name, CAST(round(c_acctbal * 100) AS BIGINT) * 10000000
                               + c_custkey) AS richest_customer,
               arg_min(c_name, CAST(round(c_acctbal * 100) AS BIGINT) * 10000000
                               + c_custkey) AS poorest_customer,
               MAX(CAST(c_acctbal AS DECIMAL(12,2)))::DOUBLE AS max_bal,
               MIN(CAST(c_acctbal AS DECIMAL(12,2)))::DOUBLE AS min_bal
        FROM customer GROUP BY c_nationkey
    """,
    "rollup_region_nation": """
        SELECT r_name, n_name, COUNT(*) AS n_customers,
               SUM(CAST(c_acctbal AS DECIMAL(12,2)))::DOUBLE AS sum_acctbal
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY ROLLUP (r_name, n_name)
    """,
    "cube_flag_status": """
        SELECT l_returnflag, l_linestatus,
               SUM(CAST(l_quantity AS DECIMAL(12,2)))::DOUBLE AS sum_qty,
               COUNT(*) AS n_rows
        FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    "grouping_sets": """
        SELECT o_orderstatus, o_orderpriority,
               COUNT(*) AS n_orders,
               SUM(CAST(o_totalprice AS DECIMAL(12,2)))::DOUBLE AS sum_price
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
    "pivot_linestatus": """
        SELECT l_returnflag,
               SUM(CASE WHEN l_linestatus = 'O'
                        THEN CAST(l_quantity AS DECIMAL(12,2)) END)::DOUBLE AS qty_open,
               SUM(CASE WHEN l_linestatus = 'F'
                        THEN CAST(l_quantity AS DECIMAL(12,2)) END)::DOUBLE AS qty_filled
        FROM lineitem GROUP BY l_returnflag
    """,
    "q3_shipping_priority": f"""
        SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
               o_orderpriority,
               SUM({_DISC})::DOUBLE AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-01-01'
          AND l_shipdate  > TIMESTAMP '1998-01-01'
        GROUP BY o_orderkey, strftime(o_orderdate, '%Y-%m-%d'), o_orderpriority
        ORDER BY revenue DESC, o_orderkey
        LIMIT 10
    """,
    "q7_nation_volume": f"""
        SELECT supp_nation, cust_nation, l_year,
               SUM({_DISC})::DOUBLE AS revenue
        FROM (
            SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                   EXTRACT(YEAR FROM l_shipdate) AS l_year,
                   l_extendedprice, l_discount
            FROM lineitem
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation n1 ON s_nationkey = n1.n_nationkey
            JOIN nation n2 ON c_nationkey = n2.n_nationkey
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate <  TIMESTAMP '1998-01-01'
              AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_8')
                OR (n1.n_name = 'NATION_8' AND n2.n_name = 'NATION_3')))
        GROUP BY supp_nation, cust_nation, l_year
    """,
    "q10_returned_items": f"""
        SELECT c_custkey, c_name, revenue,
               CAST(c_acctbal AS DECIMAL(12,2))::DOUBLE AS c_acctbal, n_name
        FROM (
            SELECT o_custkey, SUM({_DISC})::DOUBLE AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            WHERE o_orderdate >= TIMESTAMP '1997-01-01'
              AND o_orderdate <  TIMESTAMP '1997-04-01'
              AND l_returnflag = 'R'
            GROUP BY o_custkey)
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
    """,
    "q2_min_cost_supplier": """
        WITH offers AS (
            SELECT l_partkey AS partkey, l_suppkey AS suppkey,
                   MIN(CAST(l_extendedprice AS DECIMAL(12,2))) AS price
            FROM lineitem GROUP BY 1, 2
        ), eu AS (
            SELECT s_suppkey, s_name, s_acctbal, n_name
            FROM supplier
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'EUROPE'
        )
        SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
               price::DOUBLE AS best_price
        FROM offers o
        JOIN eu ON o.suppkey = eu.s_suppkey
        JOIN part ON p_partkey = o.partkey
        WHERE p_size <= 10 AND p_type = 'STANDARD'
          AND price = (SELECT MIN(o2.price) FROM offers o2
                       JOIN eu e2 ON o2.suppkey = e2.s_suppkey
                       WHERE o2.partkey = o.partkey)
        ORDER BY s_acctbal DESC, p_partkey, s_name
        LIMIT 20
    """,
    "q8_market_share": f"""
        SELECT o_year,
               ROUND(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume
                              ELSE CAST(0 AS DECIMAL(18,4)) END)::DOUBLE
                     / SUM(volume)::DOUBLE, 6) AS mkt_share
        FROM (
            SELECT EXTRACT(YEAR FROM o_orderdate) AS o_year,
                   {_DISC} AS volume,
                   n2.n_name AS supp_nation
            FROM lineitem
            JOIN part ON l_partkey = p_partkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation n1 ON c_nationkey = n1.n_nationkey
            JOIN region ON n1.n_regionkey = r_regionkey
            JOIN nation n2 ON s_nationkey = n2.n_nationkey
            WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
              AND o_orderdate >= TIMESTAMP '1995-01-01'
              AND o_orderdate <  TIMESTAMP '1998-01-01'
        ) GROUP BY o_year
    """,
    "q9_product_profit": f"""
        SELECT nation, o_year, SUM(amount)::DOUBLE AS sum_profit
        FROM (
            SELECT n_name AS nation,
                   EXTRACT(YEAR FROM l_shipdate) AS o_year,
                   {_DISC} - CAST(0.5 AS DECIMAL(2,1))
                             * CAST(p_retailprice AS DECIMAL(12,2))
                             * CAST(l_quantity AS DECIMAL(12,2)) AS amount
            FROM lineitem
            JOIN part ON l_partkey = p_partkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            WHERE p_name LIKE '%widget%'
        ) GROUP BY nation, o_year
    """,
    "q11_important_parts": """
        WITH v AS (
            SELECT l_partkey,
                   SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                       * CAST(l_quantity AS DECIMAL(12,2))) AS val
            FROM lineitem
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            WHERE n_name = 'NATION_3'
            GROUP BY l_partkey
        ), t AS (SELECT SUM(val) AS total, COUNT(*) AS cnt FROM v)
        SELECT l_partkey, val::DOUBLE AS value
        FROM v, t WHERE val * cnt > 2 * total
    """,
    "q15_top_supplier": f"""
        WITH rev AS (
            SELECT l_suppkey, SUM({_DISC}) AS rev
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1997-01-01'
              AND l_shipdate <  TIMESTAMP '1997-04-01'
            GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, rev::DOUBLE AS total_revenue
        FROM rev JOIN supplier ON l_suppkey = s_suppkey
        WHERE rev = (SELECT MAX(rev) FROM rev)
        ORDER BY s_suppkey
    """,
    "q16_supplier_part_count": """
        SELECT p_brand, p_type, p_size,
               COUNT(DISTINCT l_suppkey) AS supplier_cnt
        FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) pairs
        JOIN part ON l_partkey = p_partkey
        WHERE p_brand <> 'Brand#1'
          AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
          AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                                WHERE s_acctbal < 1000)
        GROUP BY p_brand, p_type, p_size
    """,
    "q20_part_promotion": """
        WITH flow AS (
            SELECT l_partkey, l_suppkey,
                   SUM(CAST(l_quantity AS DECIMAL(12,2))) AS sq
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE p_name LIKE 'cold%'
              AND l_shipdate >= TIMESTAMP '1997-01-01'
              AND l_shipdate <  TIMESTAMP '1998-01-01'
            GROUP BY 1, 2
        ), ptot AS (SELECT l_partkey, SUM(sq) AS tq FROM flow GROUP BY 1)
        SELECT s_name, s_acctbal
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_8'
          AND s_suppkey IN (SELECT f.l_suppkey
                            FROM flow f JOIN ptot p ON f.l_partkey = p.l_partkey
                            WHERE f.sq * 4 > p.tq)
        ORDER BY s_name
    """,
    "q21_waiting_suppliers": """
        SELECT s_name, COUNT(*) AS numwait
        FROM lineitem l1
        JOIN orders ON l1.l_orderkey = o_orderkey
        JOIN supplier ON l1.l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
          AND n_name = 'NATION_12'
          AND EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_returnflag = 'R')
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT 100
    """,
    "q12_ship_delay_priority": """
        SELECT CASE WHEN date_diff('day', o_orderdate, l_shipdate) <= 30 THEN 'fast'
                    WHEN date_diff('day', o_orderdate, l_shipdate) <= 90 THEN 'normal'
                    ELSE 'slow' END AS delay_bucket,
               SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
               SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 0 ELSE 1 END)::BIGINT AS low_line_count,
               COUNT(*) AS n_lines
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1
    """,
    "q14_promo_revenue": f"""
        SELECT ROUND(100.0 * SUM(CASE WHEN p_type = 'PROMO' THEN {_DISC}
                                      ELSE CAST(0 AS DECIMAL(18,4)) END)::DOUBLE
                     / SUM({_DISC})::DOUBLE, 6) AS promo_pct,
               COUNT(*) AS n_lines
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1997-06-01'
          AND l_shipdate <  TIMESTAMP '1997-07-01'
    """,
    "q19_disjunctive_predicates": f"""
        SELECT SUM({_DISC})::DOUBLE AS revenue, COUNT(*) AS n_lines
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15
               AND l_quantity >= 1 AND l_quantity <= 11)
           OR (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 25
               AND l_quantity >= 10 AND l_quantity <= 20)
           OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 35
               AND l_quantity >= 20 AND l_quantity <= 30)
    """,
    "q22_idle_customers": """
        WITH avg_bal AS (
            SELECT SUM(CAST(c_acctbal AS DECIMAL(12,2)))::DOUBLE / COUNT(*) AS avg_bal
            FROM customer WHERE c_acctbal > 0.0)
        SELECT c_mktsegment, COUNT(*) AS n_custs,
               SUM(CAST(c_acctbal AS DECIMAL(12,2)))::DOUBLE AS total_bal
        FROM customer CROSS JOIN avg_bal
        WHERE CAST(c_acctbal AS DECIMAL(12,2))::DOUBLE > avg_bal
          AND NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_orderdate >= TIMESTAMP '1999-01-01')
        GROUP BY c_mktsegment
    """,
    "q4_order_priority": """
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-01-01'
          AND o_orderdate <  TIMESTAMP '1997-04-01'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_discount > 0.05)
        GROUP BY o_orderpriority
    """,
    "q13_customer_distribution": """
        SELECT c_count, COUNT(*) AS custdist
        FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
              FROM customer LEFT JOIN orders ON c_custkey = o_custkey
              GROUP BY c_custkey)
        GROUP BY c_count
    """,
    "q17_small_quantity_revenue": """
        WITH t AS (
            SELECT l_partkey AS t_partkey,
                   0.5 * SUM(CAST(l_quantity AS DECIMAL(12,2)))::DOUBLE
                       / COUNT(*) AS half_avg_qty
            FROM lineitem GROUP BY l_partkey)
        SELECT SUM(CAST(l_extendedprice AS DECIMAL(12,2)))::DOUBLE / 7.0
                   AS avg_yearly,
               COUNT(*) AS n_small
        FROM lineitem JOIN t ON l_partkey = t_partkey
        WHERE l_quantity < half_avg_qty
    """,
    "q18_large_volume_customer": """
        SELECT c_name, c_custkey, o_orderkey,
               strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate, o_totalprice,
               SUM(CAST(l_quantity AS DECIMAL(12,2)))::DOUBLE AS total_qty
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        WHERE o_orderkey IN (
            SELECT l_orderkey FROM lineitem
            GROUP BY l_orderkey
            HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 150)
        GROUP BY c_name, c_custkey, o_orderkey,
                 strftime(o_orderdate, '%Y-%m-%d'), o_totalprice
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 100
    """,
    "q5_local_supplier": f"""
        SELECT n_name, SUM({_DISC})::DOUBLE AS revenue
        FROM customer
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1997-01-01'
        GROUP BY n_name
    """,
    "join_left_outer": """
        SELECT c_custkey, c_name,
               COALESCE(n_orders, 0) AS n_orders,
               COALESCE(total_spent, 0.0) AS total_spent
        FROM customer
        LEFT JOIN (
            SELECT o_custkey, COUNT(*) AS n_orders,
                   SUM(CAST(o_totalprice AS DECIMAL(12,2)))::DOUBLE AS total_spent
            FROM orders GROUP BY o_custkey
        ) ON c_custkey = o_custkey
    """,
    "join_semi": """
        SELECT c_custkey, c_name, c_nationkey FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 490000.0)
    """,
    "join_anti": """
        SELECT c_custkey, c_name, c_acctbal FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    "join_full_outer": """
        SELECT COALESCE(ca.nationkey, sa.nationkey) AS nationkey,
               COALESCE(cust_bal, 0.0) AS cust_bal,
               COALESCE(supp_bal, 0.0) AS supp_bal
        FROM (SELECT c_nationkey AS nationkey,
                     SUM(CAST(c_acctbal AS DECIMAL(12,2)))::DOUBLE AS cust_bal
              FROM customer GROUP BY c_nationkey) ca
        FULL OUTER JOIN
             (SELECT s_nationkey AS nationkey,
                     SUM(CAST(s_acctbal AS DECIMAL(12,2)))::DOUBLE AS supp_bal
              FROM supplier GROUP BY s_nationkey) sa
        USING (nationkey)
    """,
    "join_range_bands": """
        SELECT band, COUNT(*) AS n_parts,
               SUM(CAST(p_retailprice AS DECIMAL(12,2)))::DOUBLE AS sum_price
        FROM part
        JOIN (VALUES (0.0, 500.0, 'budget'), (500.0, 1200.0, 'mid'),
                     (1200.0, 1e9, 'premium')) bands(lo, hi, band)
          ON p_retailprice >= lo AND p_retailprice < hi
        GROUP BY band
    """,
    "window_topk_per_group": """
        SELECT p_brand, p_partkey, p_retailprice, rk FROM (
            SELECT p_brand, p_partkey, p_retailprice,
                   ROW_NUMBER() OVER (PARTITION BY p_brand
                                      ORDER BY p_retailprice DESC, p_partkey) AS rk
            FROM part) WHERE rk <= 3
    """,
    "window_running_sum": """
        SELECT l_orderkey, l_linenumber,
               SUM(CAST(l_quantity AS DECIMAL(12,2))) OVER (
                   PARTITION BY l_orderkey ORDER BY l_linenumber
                   ROWS UNBOUNDED PRECEDING)::DOUBLE AS running_qty,
               LAG(l_linenumber, 1) OVER (
                   PARTITION BY l_orderkey ORDER BY l_linenumber) AS prev_line,
               LEAD(l_linenumber, 1) OVER (
                   PARTITION BY l_orderkey ORDER BY l_linenumber) AS next_line,
               COUNT(*) OVER (PARTITION BY l_orderkey) AS n_lines
        FROM lineitem WHERE l_orderkey <= 1000
    """,
    "window_rank_dense_ntile": """
        SELECT s_nationkey, s_suppkey,
               RANK() OVER w AS rnk,
               DENSE_RANK() OVER w AS drnk,
               NTILE(4) OVER w AS quartile
        FROM supplier
        WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey)
    """,
    "null_semantics": """
        WITH h1 AS (SELECT o_custkey AS k1, COUNT(*) AS cnt_h1 FROM orders
                    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
                      AND o_orderdate <  TIMESTAMP '1997-07-01' GROUP BY 1),
        h2 AS (SELECT o_custkey AS k2, COUNT(*) AS cnt_h2 FROM orders
               WHERE o_orderdate >= TIMESTAMP '1997-07-01'
                 AND o_orderdate <  TIMESTAMP '1998-01-01' GROUP BY 1)
        SELECT c_custkey, cnt_h1, cnt_h2,
               CASE WHEN (cnt_h1 = cnt_h2) IS NULL THEN 'null'
                    WHEN cnt_h1 = cnt_h2 THEN 'true'
                    ELSE 'false' END AS eq3,
               cnt_h1 IS NOT DISTINCT FROM cnt_h2 AS eq_ns,
               COALESCE(cnt_h1, 0) AS cnt_h1_zf
        FROM customer
        LEFT JOIN h1 ON c_custkey = k1
        LEFT JOIN h2 ON c_custkey = k2
        WHERE c_custkey <= 500
    """,
    "window_percent_cume": """
        SELECT c_mktsegment, c_custkey,
               ROUND(percent_rank() OVER w, 6) AS pct_rank,
               ROUND(cume_dist() OVER w, 6) AS cume
        FROM customer
        WHERE c_custkey <= 1000
        WINDOW w AS (PARTITION BY c_mktsegment
                     ORDER BY CAST(c_acctbal AS DECIMAL(12,2)), c_custkey)
    """,
    "unpivot_balances": """
        WITH ca AS (SELECT c_nationkey AS nationkey,
                           SUM(CAST(c_acctbal AS DECIMAL(12,2)))::DOUBLE AS cust_bal
                    FROM customer GROUP BY 1),
        sa AS (SELECT s_nationkey AS nationkey,
                      SUM(CAST(s_acctbal AS DECIMAL(12,2)))::DOUBLE AS supp_bal
               FROM supplier GROUP BY 1),
        wide AS (
            SELECT COALESCE(ca.nationkey, sa.nationkey) AS nationkey,
                   COALESCE(cust_bal, 0.0) AS cust_bal,
                   COALESCE(supp_bal, 0.0) AS supp_bal
            FROM ca FULL OUTER JOIN sa USING (nationkey))
        SELECT nationkey, 'cust_bal' AS side, cust_bal AS bal FROM wide
        UNION ALL
        SELECT nationkey, 'supp_bal' AS side, supp_bal AS bal FROM wide
    """,
    "sort_limit_top20": """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 20
    """,
    "set_ops": """
        SELECT nationkey, 'union' AS op FROM (
            SELECT DISTINCT c_nationkey AS nationkey FROM customer
            UNION SELECT s_nationkey FROM supplier)
        UNION ALL
        SELECT nationkey, 'intersect' AS op FROM (
            SELECT DISTINCT c_nationkey AS nationkey FROM customer
            INTERSECT SELECT DISTINCT s_nationkey FROM supplier)
        UNION ALL
        SELECT nationkey, 'except' AS op FROM (
            SELECT DISTINCT c_nationkey AS nationkey FROM customer
            EXCEPT SELECT DISTINCT s_nationkey FROM supplier)
    """,
    # bag-semantics counts via LEAST/GREATEST tally arithmetic — never
    # a multiset operator, so the two constructions are independent
    "set_ops_multiset": """
        WITH cn AS (SELECT c_nationkey AS nationkey, COUNT(*)::BIGINT AS n
                    FROM customer GROUP BY 1),
             sn AS (SELECT s_nationkey AS nationkey, COUNT(*)::BIGINT AS n
                    FROM supplier GROUP BY 1)
        SELECT cn.nationkey, 'intersect_all' AS op,
               LEAST(cn.n, sn.n) AS cnt
        FROM cn JOIN sn USING (nationkey)
        WHERE LEAST(cn.n, sn.n) > 0
        UNION ALL
        SELECT cn.nationkey, 'except_all' AS op,
               cn.n - COALESCE(sn.n, 0) AS cnt
        FROM cn LEFT JOIN sn USING (nationkey)
        WHERE cn.n - COALESCE(sn.n, 0) > 0
        UNION ALL
        SELECT nationkey, 'union_all' AS op,
               COALESCE(cn.n, 0) + COALESCE(sn.n, 0) AS cnt
        FROM cn FULL JOIN sn USING (nationkey)
    """,
    "scalar_string": r"""
        SELECT p_partkey,
               UPPER(p_name) AS name_upper,
               LENGTH(p_name) AS name_len,
               SUBSTRING(p_name, 1, 5) AS name_pre,
               CONCAT_WS('|', p_brand, p_type) AS brand_type,
               REGEXP_REPLACE(p_name, ' ', '_', 'g') AS name_snake,
               STR_SPLIT(p_name, ' ')[1] AS first_word,
               CAST(REGEXP_EXTRACT(p_brand, '#(\d+)', 1) AS INT) AS brand_num
        FROM part WHERE p_partkey <= 500
    """,
    "scalar_date": """
        SELECT EXTRACT(YEAR FROM o_orderdate) AS yr,
               EXTRACT(MONTH FROM o_orderdate) AS mon,
               COUNT(*) AS n_orders,
               MIN(strftime(o_orderdate, '%Y-%m-%d')) AS first_day,
               MAX(EXTRACT(DAY FROM o_orderdate)) AS max_dom
        FROM orders GROUP BY 1, 2
    """,
    "scalar_math": """
        SELECT c_custkey,
               ABS(c_acctbal) AS abs_bal,
               ROUND(c_acctbal, 0) AS round_bal,
               CAST(FLOOR(c_acctbal) AS BIGINT) AS floor_bal,
               CAST(CEIL(c_acctbal) AS BIGINT) AS ceil_bal,
               SQRT(ABS(c_acctbal)) AS sqrt_bal,
               c_custkey % 7 AS mod7,
               GREATEST(c_acctbal, 0.0) AS pos_bal
        FROM customer WHERE c_custkey <= 500
    """,
    "scalar_variant": """
        SELECT event_type,
               COUNT(*) AS n_events,
               SUM(json_extract(props, '$.k')::INT)::BIGINT AS sum_k,
               SUM((json_extract(props, '$.k')::INT % 10)::BIGINT)::BIGINT
                   AS sum_k_mod,
               COUNT(json_extract(props, '$.absent')) AS n_absent_hits
        FROM events GROUP BY event_type
    """,
    "scalar_json": """
        SELECT event_type,
               COUNT(*) AS n_events,
               SUM(CAST(json_extract_string(props, '$.k') AS INT))::BIGINT AS sum_k,
               MIN(CAST(json_extract_string(props, '$.k') AS INT)) AS min_k,
               MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k
        FROM events GROUP BY event_type
    """,
    "collect_sorted_arrays": """
        SELECT user_id,
               array_to_string(list_sort(list(DISTINCT event_type)), ',') AS types,
               COUNT(*) AS n_events
        FROM events WHERE user_id <= 50 GROUP BY user_id
    """,
    "scalar_map_histogram": """
        WITH per AS (
            SELECT user_id, event_type, COUNT(*) AS cnt
            FROM events GROUP BY user_id, event_type),
        agg AS (
            SELECT user_id,
                   list_sort(list({'event_type': event_type, 'cnt': cnt})) AS l,
                   MAX(CASE WHEN event_type = 'click' THEN cnt END) AS click_cnt
            FROM per GROUP BY user_id)
        SELECT user_id,
               array_to_string(list_transform(l, x -> x.event_type), ',') AS types,
               array_to_string(list_transform(l, x -> CAST(x.cnt AS VARCHAR)), ',') AS counts,
               COALESCE(click_cnt, 0) AS n_click,
               len(l) AS n_types
        FROM agg
    """,
    "stats_moments_exact": """
        WITH g AS (
            SELECT l_returnflag, COUNT(*) AS n,
                   SUM(CAST(l_quantity AS DECIMAL(12,2)))::DOUBLE AS sx,
                   SUM(CAST(l_quantity AS DECIMAL(12,2))
                       * CAST(l_quantity AS DECIMAL(12,2)))::DOUBLE AS sx2,
                   SUM(CAST(l_extendedprice AS DECIMAL(12,2)))::DOUBLE AS sy,
                   SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                       * CAST(l_extendedprice AS DECIMAL(12,2)))::DOUBLE AS sy2,
                   SUM(CAST(l_quantity AS DECIMAL(12,2))
                       * CAST(l_extendedprice AS DECIMAL(12,2)))::DOUBLE AS sxy
            FROM lineitem GROUP BY l_returnflag)
        SELECT l_returnflag, n,
               ROUND(sx / n::DOUBLE, 6) AS mean_qty,
               ROUND((n::DOUBLE * sx2 - sx * sx)
                     / (n::DOUBLE * (n::DOUBLE - 1.0)), 6) AS var_qty,
               ROUND(SQRT((n::DOUBLE * sx2 - sx * sx)
                     / (n::DOUBLE * (n::DOUBLE - 1.0))), 6) AS std_qty,
               ROUND(sy / n::DOUBLE, 6) AS mean_price,
               ROUND((n::DOUBLE * sy2 - sy * sy)
                     / (n::DOUBLE * (n::DOUBLE - 1.0)), 6) AS var_price,
               ROUND((n::DOUBLE * sxy - sx * sy)
                     / (SQRT(n::DOUBLE * sx2 - sx * sx)
                        * SQRT(n::DOUBLE * sy2 - sy * sy)), 6) AS corr_qty_price
        FROM g
    """,
    "median_per_group": """
        WITH ranked AS (
            SELECT l_returnflag, l_quantity,
                   ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                      ORDER BY l_quantity, l_orderkey, l_linenumber) AS rn,
                   COUNT(*) OVER (PARTITION BY l_returnflag) AS n
            FROM lineitem)
        SELECT l_returnflag, l_quantity AS median_qty, n
        FROM ranked WHERE rn = CAST(FLOOR((n + 1) / 2) AS BIGINT)
    """,
    "percentile_cont_exact": """
        SELECT l_returnflag,
               ROUND(quantile_cont(l_quantity, 0.25), 6) AS p25,
               ROUND(quantile_cont(l_quantity, 0.50), 6) AS p50,
               ROUND(quantile_cont(l_quantity, 0.75), 6) AS p75,
               ROUND(quantile_cont(l_quantity, 0.90), 6) AS p90,
               ROUND(quantile_cont(l_quantity, 0.99), 6) AS p99,
               COUNT(*) AS n
        FROM lineitem GROUP BY l_returnflag
    """,
    "scalar_array_hof": """
        SELECT vec_id,
               len(list_filter(embedding, x -> x > 0)) AS n_pos,
               ROUND(list_reduce(
                   list_prepend(CAST(0.0 AS DOUBLE),
                       list_transform(list_filter(embedding, x -> x > 0),
                                      x -> CAST(x AS DOUBLE))),
                   (acc, x) -> acc + x), 6) AS sum_pos,
               ROUND(list_reduce(
                   list_prepend(CAST(0.0 AS DOUBLE),
                       list_transform(list_zip(embedding, list_reverse(embedding)),
                                      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))),
                   (acc, x) -> acc + x), 6) AS dot_rev,
               array_to_string(list_transform(embedding[1:3],
                   x -> CAST(CAST(ROUND(CAST(x AS DOUBLE) * 2, 6)
                             AS DECIMAL(18,6)) AS VARCHAR)), ',') AS first3_x2
        FROM embeddings
    """,
    "scd2_upsert": """
        WITH delta AS (
            SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS delta
            FROM orders WHERE o_orderdate >= TIMESTAMP '2000-01-01'
            GROUP BY o_custkey)
        SELECT c_custkey, 1 AS version,
               CAST(c_acctbal AS DECIMAL(12,2))::DOUBLE AS acctbal,
               (delta IS NULL) AS is_current
        FROM customer LEFT JOIN delta ON c_custkey = o_custkey
        UNION ALL
        SELECT c_custkey, 2 AS version,
               (CAST(c_acctbal AS DECIMAL(12,2)) + delta)::DOUBLE AS acctbal,
               TRUE AS is_current
        FROM customer JOIN delta ON c_custkey = o_custkey
    """,
    "sessionize_events": """
        WITH seq AS (
            SELECT user_id, event_id, ts, value,
                   CASE WHEN epoch_us(ts) - epoch_us(
                            LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
                          > 30 * 60 * 1000000
                        THEN 1 ELSE 0 END AS new_sess
            FROM events),
        sess AS (
            SELECT user_id, ts, value,
                   SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                       ROWS UNBOUNDED PRECEDING)::BIGINT AS session_id
            FROM seq)
        SELECT user_id, session_id,
               COUNT(*) AS n_events,
               MIN(epoch_us(ts)) AS start_us,
               MAX(epoch_us(ts)) AS end_us,
               SUM(CAST(value AS DECIMAL(12,2)))::DOUBLE AS sum_value
        FROM sess GROUP BY user_id, session_id
    """,
}


ORACLE["abc_analysis_parts"] = """
    WITH rev AS (
        SELECT l_partkey,
               SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                   * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS revenue
        FROM lineitem GROUP BY 1),
    t AS (SELECT SUM(revenue) AS total FROM rev),
    c AS (
        SELECT l_partkey, revenue,
               SUM(revenue) OVER (ORDER BY revenue DESC, l_partkey
                                  ROWS UNBOUNDED PRECEDING) AS cum
        FROM rev)
    SELECT l_partkey, CAST(revenue AS DOUBLE) AS revenue,
           CAST(FLOOR(CAST(cum AS DOUBLE) / CAST(total AS DOUBLE) * 1e6)
                AS BIGINT) AS cum_share_ppm,
           CASE WHEN FLOOR(CAST(cum AS DOUBLE) / CAST(total AS DOUBLE) * 1e6)
                     <= 800000 THEN 'A'
                WHEN FLOOR(CAST(cum AS DOUBLE) / CAST(total AS DOUBLE) * 1e6)
                     <= 950000 THEN 'B'
                ELSE 'C' END AS abc_class
    FROM c CROSS JOIN t
"""

ORACLE["division_all_priorities"] = """
    SELECT o_custkey, COUNT(*)::BIGINT AS n_priorities
    FROM (SELECT DISTINCT o_custkey, o_orderpriority FROM orders)
    GROUP BY 1
    HAVING COUNT(*) = (SELECT COUNT(DISTINCT o_orderpriority)
                       FROM orders)
"""

ORACLE["agg_mode_per_group"] = """
    WITH cnt AS (
        SELECT user_id, event_type, COUNT(*)::BIGINT AS cnt
        FROM events GROUP BY 1, 2),
    r AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                     ORDER BY cnt DESC, event_type) AS rn
        FROM cnt)
    SELECT user_id, event_type AS mode_event_type, cnt AS n_events
    FROM r WHERE rn = 1
"""

ORACLE["snapshot_latest_as_of"] = f"""
    WITH r AS (
        SELECT o_custkey, o_orderkey,
               strftime(o_orderdate, '%Y-%m-%d') AS d,
               o_orderstatus, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate DESC,
                                           o_orderkey DESC) AS rn
        FROM orders WHERE o_orderdate <= DATE '{SNAPSHOT_AS_OF}')
    SELECT o_custkey, o_orderkey AS last_orderkey, d AS last_order_date,
           o_orderstatus AS last_status, o_totalprice AS last_price
    FROM r WHERE rn = 1
"""

ORACLE["weighted_median_price"] = """
    WITH cnts AS (
        SELECT l_returnflag, l_extendedprice AS price,
               SUM(CAST(l_quantity AS DECIMAL(12,2))) AS w
        FROM lineitem GROUP BY 1, 2),
    ranked AS (
        SELECT l_returnflag, price,
               SUM(w) OVER (PARTITION BY l_returnflag
                            ORDER BY price) AS cum,
               SUM(w) OVER (PARTITION BY l_returnflag) AS tot
        FROM cnts)
    SELECT l_returnflag, MIN(price) AS weighted_median_price,
           CAST(MIN(tot) AS DOUBLE) AS total_weight
    FROM ranked WHERE cum * 2 >= tot
    GROUP BY 1
"""
