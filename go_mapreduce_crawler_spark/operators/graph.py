"""Market-basket and graph analytics over ``lineitem`` — association
rules and triangle counting on the co-purchase graph.

The reference engine has no relational surface at all (SURVEY.md §2.2);
these supply the classic MapReduce-era analytics workloads — frequent
pairs / association rules (a-priori size 2) and triangle enumeration —
re-expressed as declarative joins so Catalyst plans the physical
strategy.

Scale notes (100 TB of baskets):
- The pair self-join is keyed on the basket id, where cardinality per
  key is the ITEMS-PER-BASKET, not the table size: TPC-H orders carry
  <= 13 parts, so the join fans out ~C(13,2) rows per order worst
  case.  For corpora with huge baskets, a-priori pruning applies: drop
  items below min-support BEFORE pairing (the same plan shape with one
  extra broadcast semi-join), which bounds the fan-out.
- Item supports are |parts| rows — broadcast onto the pair counts;
  the basket total is a literal (computed once, the tfidf scalar
  pattern), so rule scoring adds NO shuffle beyond the pair count.
- Triangle counting runs on the THRESHOLDED edge list (support >= 2),
  the standard trick that keeps the two-hop join quadratic only in
  strong-edge degree.  Edges are oriented part_a < part_b, so each
  triangle is counted exactly once; at scale the orientation should be
  by degree (low->high) to bound skew — same plan, different sort key.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..sources.tables import load_table


def _items(spark, sf_dir):
    """Distinct (basket, item) pairs."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select("l_orderkey", "l_partkey").distinct()


def _pair_counts(items, min_support: int = 2):
    a = items.select(F.col("l_orderkey").alias("o"),
                     F.col("l_partkey").alias("pa"))
    b = items.select(F.col("l_orderkey").alias("o"),
                     F.col("l_partkey").alias("pb"))
    return (a.join(b, "o")
             .filter(F.col("pa") < F.col("pb"))
             .groupBy("pa", "pb")
             .agg(F.count(F.lit(1)).alias("n_ab"))
             .filter(F.col("n_ab") >= min_support))


def q_basket_rules(spark, sf_dir):
    """Size-2 association rules over order baskets: pair support,
    directional confidence, and lift, for pairs bought together >= 2
    times.  All scores are IEEE ratios of exact integer counts in the
    same expression shape as the oracle — bit-identical, no rounding.
    """
    items = _items(spark, sf_dir).cache()
    n_orders = items.select("l_orderkey").distinct().count()
    pairs = _pair_counts(items)
    supp = items.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n"))
    sa = supp.select(F.col("l_partkey").alias("pa"), F.col("n").alias("n_a"))
    sb = supp.select(F.col("l_partkey").alias("pb"), F.col("n").alias("n_b"))
    return (pairs
            .join(F.broadcast(sa), "pa")
            .join(F.broadcast(sb), "pb")
            .select(F.col("pa").alias("part_a"), F.col("pb").alias("part_b"),
                    "n_ab", "n_a", "n_b",
                    (F.col("n_ab") / F.col("n_a")).alias("conf_a_to_b"),
                    (F.col("n_ab") / F.col("n_b")).alias("conf_b_to_a"),
                    (F.col("n_ab") * F.lit(n_orders)
                     / (F.col("n_a") * F.col("n_b"))).alias("lift")))


def q_triangle_count(spark, sf_dir):
    """Triangles in the strong co-purchase graph (pair support >= 2):
    one row with node/edge/triangle totals.  Each triangle (a<b<c) is
    found once via the oriented two-hop join + closing-edge check.
    """
    edges = _pair_counts(_items(spark, sf_dir)).select("pa", "pb").cache()
    e1 = edges.select(F.col("pa").alias("a"), F.col("pb").alias("b"))
    e2 = edges.select(F.col("pa").alias("b"), F.col("pb").alias("c"))
    e3 = edges.select(F.col("pa").alias("a"), F.col("pb").alias("c"))
    tri = e1.join(e2, "b").join(e3, ["a", "c"])
    n_nodes = (edges.select(F.col("pa").alias("p"))
               .union(edges.select(F.col("pb").alias("p")))
               .distinct().count())
    return spark.createDataFrame(
        [(n_nodes, edges.count(), tri.count())],
        "n_nodes bigint, n_edges bigint, n_triangles bigint")


QUERIES = {
    "basket_rules": q_basket_rules,
    "triangle_count": q_triangle_count,
}

ORACLE = {
    "basket_rules": """
        WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
             supp AS (SELECT l_partkey, count(*) AS n FROM items GROUP BY 1),
             tot AS (SELECT count(DISTINCT l_orderkey) AS n_orders
                     FROM items),
             pairs AS (
                 SELECT a.l_partkey AS pa, b.l_partkey AS pb,
                        count(*) AS n_ab
                 FROM items a JOIN items b
                   ON a.l_orderkey = b.l_orderkey
                  AND a.l_partkey < b.l_partkey
                 GROUP BY 1, 2 HAVING count(*) >= 2)
        SELECT pairs.pa AS part_a, pairs.pb AS part_b, n_ab,
               sa.n AS n_a, sb.n AS n_b,
               n_ab / sa.n AS conf_a_to_b,
               n_ab / sb.n AS conf_b_to_a,
               n_ab * tot.n_orders / (sa.n * sb.n) AS lift
        FROM pairs
        JOIN supp sa ON sa.l_partkey = pairs.pa
        JOIN supp sb ON sb.l_partkey = pairs.pb
        CROSS JOIN tot
    """,
    "triangle_count": """
        WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
             edges AS (
                 SELECT a.l_partkey AS pa, b.l_partkey AS pb
                 FROM items a JOIN items b
                   ON a.l_orderkey = b.l_orderkey
                  AND a.l_partkey < b.l_partkey
                 GROUP BY 1, 2 HAVING count(*) >= 2)
        SELECT (SELECT count(DISTINCT p) FROM (
                    SELECT pa AS p FROM edges
                    UNION ALL SELECT pb FROM edges)) AS n_nodes,
               (SELECT count(*) FROM edges) AS n_edges,
               (SELECT count(*)
                FROM edges e1
                JOIN edges e2 ON e2.pa = e1.pb
                JOIN edges e3 ON e3.pa = e1.pa AND e3.pb = e2.pb)
                    AS n_triangles
    """,
}
