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

from pyspark.sql import Window as W
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


def _pr_step(adj_deg, pr, n_nodes: int, d: float):
    """One synchronous PageRank step: quantize each contribution
    rank/deg to a fixed-point long, exact order-independent F.sum,
    dequantize once.  Kept as a named helper so the plan suite can
    assert the aggregation is a partial+final hash agg of longs with no
    collect_list (no per-node neighborhood buffer)."""
    contribs = (adj_deg.join(pr, adj_deg.src == pr.node)
                .select("dst",
                        F.floor((F.col("rank") / F.col("deg"))
                                * F.lit(1e15)).alias("c_fp"))
                .groupBy("dst")
                .agg(F.sum("c_fp").alias("inflow_fp")))
    return contribs.select(
        F.col("dst").alias("node"),
        (F.lit(1.0 - d) / F.lit(n_nodes)
         + F.lit(d) * (F.col("inflow_fp").cast("double")
                       / F.lit(1e15))).alias("rank"))


def q_pagerank_copurchase(spark, sf_dir, n_iter: int = 5, d: float = 0.85):
    """PageRank (5 synchronous iterations, damping 0.85) over the
    undirected strong co-purchase graph — the canonical iterative
    workload, expressed as a driver-side loop of declarative
    join+aggregate steps (each iteration is one distributed job stage;
    only the LOOP CONTROL is on the driver, never the data).

    Ranks are emitted as floor(rank * 1e9) fixed-point.  The neighbor
    inflow stays bit-identical to the oracle WITHOUT materializing any
    neighborhood: each contribution rank/deg is quantized to a
    fixed-point long, floor(c * 1e15), and the longs are F.sum-med —
    integer addition is order-independent, so the partial+final
    HashAggregate gives the same result on any partitioning.  The sum
    converts back to double once per iteration (exact: per-node inflow
    < 1e15 < 2^53, and 1e15 is an exact double), and DuckDB's oracle
    applies the identical quantize-sum-dequantize, so after 5
    iterations the doubles still agree bit-for-bit.  The earlier
    sorted-fold formulation (collect_list + array_sort + F.aggregate)
    buffered a node's ENTIRE neighborhood in one aggregation row — a
    celebrity-node OOM at scale; this one never does.

    Scale: the degree-annotated adjacency list is cached once; each
    iteration shuffles only (node, contribution-long) pairs — the
    standard Pregel data movement — and localCheckpoint truncates the
    plan lineage so iteration N does not replan iterations 1..N-1.
    Convergence-by-delta would add one tiny agg per iteration; fixed
    iterations keep the oracle expressible.
    """
    edges = _pair_counts(_items(spark, sf_dir)).select("pa", "pb")
    adj = (edges.select(F.col("pa").alias("src"), F.col("pb").alias("dst"))
           .union(edges.select(F.col("pb").alias("src"),
                               F.col("pa").alias("dst")))
           .cache())
    deg = adj.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # LAZY checkpoints (the _substring_report convention): the loop has
    # no mid-round action, so eager=False keeps the lineage cut while
    # letting all rounds pipeline inside the final job instead of
    # running n_iter+1 serialized materialization jobs.
    adj_deg = adj.join(deg, "src").localCheckpoint(eager=False)
    n_nodes = deg.count()
    pr = deg.select(F.col("src").alias("node"),
                    (F.lit(1.0) / F.lit(n_nodes)).alias("rank"))
    for _ in range(n_iter):
        pr = _pr_step(adj_deg, pr, n_nodes, d).localCheckpoint(eager=False)
    return pr.select("node", F.floor(F.col("rank") * 1e9)
                     .cast("long").alias("rank_e9"))


def q_bfs_hops(spark, sf_dir, n_iter: int = 4):
    """Bounded-depth single-source BFS: exact hop distance (<= 4) from
    the smallest node of the strong co-purchase graph, via iterative
    relax-and-min (Bellman-Ford on unit weights).  Integer-only
    arithmetic, so unlike PageRank there is NO fp-ordering concern and
    the recursive-CTE oracle matches exactly.

    Scale: each iteration is one join keyed on the frontier + one
    min-agg — the Pregel message pattern again.  The dist relation only
    ever holds reached nodes, so early levels are tiny; at web scale
    you'd keep dist partitioned by node id so the per-level join is
    co-located (no repartition between iterations).  localCheckpoint
    per level truncates lineage so level N does not replan 1..N-1."""
    edges = _pair_counts(_items(spark, sf_dir)).select("pa", "pb")
    adj = (edges.select(F.col("pa").alias("src"), F.col("pb").alias("dst"))
           .union(edges.select(F.col("pb").alias("src"),
                               F.col("pa").alias("dst")))
           .cache())
    src_node = adj.agg(F.min("src")).collect()[0][0]
    dist = spark.createDataFrame([(src_node, 0)], "node bigint, hops int")
    for _ in range(n_iter):
        nxt = (adj.join(dist, adj.src == dist.node)
               .select(F.col("dst").alias("node"),
                       (F.col("hops") + F.lit(1)).alias("hops")))
        dist = (dist.union(nxt)
                .groupBy("node").agg(F.min("hops").alias("hops"))
                .localCheckpoint(eager=False))   # lazy: rounds pipeline
    return dist


LPA_ITERS = 3


def q_label_propagation(spark, sf_dir):
    """Synchronous label propagation (3 iterations) over the undirected
    strong co-purchase graph — the cheap community detector (Raghavan
    et al. 2007), made fully deterministic: every node adopts the most
    frequent label among its neighbors, ties broken by SMALLEST label.

    Each iteration is the Pregel message pattern: one join keyed on the
    edge source + one (node, label) count + one per-node argmax via
    row_number — all integer/rank arithmetic, so the unrolled-CTE
    oracle matches exactly (no fp concerns, like bfs_hops).  Scale: the
    adjacency is cached once; messages are (node, label) long pairs;
    the argmax window pushes a per-partition partial top-1
    (WindowGroupLimit) below the shuffle.  localCheckpoint per
    iteration truncates lineage.
    """
    edges = _pair_counts(_items(spark, sf_dir)).select("pa", "pb")
    adj = (edges.select(F.col("pa").alias("src"), F.col("pb").alias("dst"))
           .union(edges.select(F.col("pb").alias("src"),
                               F.col("pa").alias("dst")))
           .cache())
    lab = (adj.select(F.col("src").alias("node")).distinct()
              .select("node", F.col("node").alias("label")))
    w = W.partitionBy("node").orderBy(F.desc("cnt"), "label")
    for _ in range(LPA_ITERS):
        msgs = (adj.join(lab, adj.src == lab.node)
                   .select(F.col("dst").alias("node"), "label"))
        counts = (msgs.groupBy("node", "label")
                      .agg(F.count(F.lit(1)).alias("cnt")))
        lab = (counts.withColumn("rk", F.row_number().over(w))
                     .filter(F.col("rk") == 1)
                     .select("node", "label")
                     .localCheckpoint(eager=False))  # lazy: rounds pipeline
    return lab


def q_adamic_adar(spark, sf_dir):
    """Adamic-Adar link prediction over the strong co-purchase graph:
    for every NON-adjacent part pair sharing >= 1 neighbor, the score
    sum_z 1 / ln(deg(z)) over common neighbors z — the classic
    "products frequently bought with the same things" recommender
    signal.

    Scale shape: candidate pairs are generated by the two-hop join
    keyed on the shared neighbor z, so the fan-out is sum_z deg(z)^2 —
    bounded by thresholded-graph degree, the same cost model as
    triangle counting (at web scale, cap deg(z) first: high-degree
    hubs contribute ~0 anyway since 1/ln(deg) vanishes).  Existing
    edges leave via a LEFT ANTI join on the oriented pair; degrees
    broadcast.  Each z's contribution floor(1e12 / ln deg) is an exact
    long via the engine-portable _ln_det series (deg >= 2 so ln > 0),
    summed with the pagerank quantize-sum recipe — order-independent,
    bit-identical across engines and partitionings.
    """
    from .text import _ln_det, _lit_spark
    edges = _pair_counts(_items(spark, sf_dir)).select("pa", "pb").cache()
    adj = (edges.select(F.col("pa").alias("z"), F.col("pb").alias("x"))
           .union(edges.select(F.col("pb").alias("z"),
                               F.col("pa").alias("x"))))
    deg = adj.groupBy("z").agg(F.count(F.lit(1)).alias("deg"))
    a = adj.select("z", F.col("x").alias("na"))
    b = adj.select("z", F.col("x").alias("nb"))
    cand = (a.join(b, "z")
             .filter(F.col("na") < F.col("nb"))
             .join(edges,
                   (F.col("na") == F.col("pa")) & (F.col("nb") == F.col("pb")),
                   "left_anti"))
    contrib = (cand.join(F.broadcast(deg), "z")
               .selectExpr("na", "nb",
                           f"CAST(FLOOR(1000000000000.0 / "
                           f"{_ln_det('deg', _lit_spark)}) AS BIGINT)"
                           " AS c"))
    return (contrib.groupBy("na", "nb")
            .agg(F.count(F.lit(1)).alias("n_common"),
                 F.sum("c").alias("aa_e12"))
            .select(F.col("na").alias("part_a"), F.col("nb").alias("part_b"),
                    "n_common", "aa_e12"))


def q_degree_distribution(spark, sf_dir):
    """Degree distribution of the thresholded co-purchase graph: how
    many parts have each strong-edge degree — the skew profile that
    decides whether the pair/triangle joins need degree-orientation or
    salting (a heavy right tail here IS the scale warning).

    Edges come from the family's shared thresholded pair builder
    (items cached — the pair self-join reads it twice; the
    basket_rules idiom, measured 2x at sf0.1); the degree count
    re-aggregates the symmetrized edge list, and the histogram
    re-aggregates the |parts|-row degree relation — each a shrinking
    partial+final agg, no windows.
    """
    pairs = _pair_counts(_items(spark, sf_dir).cache())
    sym = (pairs.select(F.col("pa").alias("p"))
                .union(pairs.select(F.col("pb").alias("p"))))
    deg = sym.groupBy("p").agg(F.count(F.lit(1)).alias("degree"))
    return (deg.groupBy("degree")
               .agg(F.count(F.lit(1)).alias("n_parts")))


KCORE_K = 3
KCORE_ROUNDS = 5


def q_kcore_peel(spark, sf_dir):
    """Fixed-round k-core peeling (k=3, 5 synchronous rounds) of the
    strong co-purchase graph: iteratively drop nodes whose degree
    within the surviving subgraph is under k, then report the
    survivors with their core-subgraph degree — the standard dense-
    cluster extraction ahead of community detection (5 rounds reaches
    the fixpoint on every test SF; fixed rounds keep the oracle
    expressible, the pagerank convention).

    Each round is one semi-join pair (edges restricted to survivors)
    + one degree agg + one filter — Pregel data movement, driver-side
    LOOP CONTROL only, localCheckpoint truncating the lineage so round
    N does not replan rounds 1..N-1.
    """
    edges = _pair_counts(_items(spark, sf_dir)).select("pa", "pb")
    adj = (edges.select(F.col("pa").alias("src"), F.col("pb").alias("dst"))
           .union(edges.select(F.col("pb").alias("src"),
                               F.col("pa").alias("dst")))
           .localCheckpoint(eager=False))   # lazy: rounds pipeline
    alive = adj.select(F.col("src").alias("node")).distinct()
    live = None
    for _ in range(KCORE_ROUNDS):
        live = (adj.join(alive.select(F.col("node").alias("src")), "src")
                   .join(alive.select(F.col("node").alias("dst")), "dst"))
        deg = live.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
        alive = (deg.filter(F.col("deg") >= KCORE_K)
                    .select(F.col("src").alias("node"))
                    .localCheckpoint(eager=False))
    final = (adj.join(alive.select(F.col("node").alias("src")), "src")
                .join(alive.select(F.col("node").alias("dst")), "dst")
                .groupBy("src").agg(F.count(F.lit(1)).alias("core_degree")))
    return final.select(F.col("src").alias("node"), "core_degree")


RCTE_MAX_HOPS = 3


def q_recursive_reachability(spark, sf_dir):
    """Declarative BFS via Spark 4's WITH RECURSIVE: hop distance from
    the smallest part key to everything within 3 hops of it on the
    strong co-purchase graph — q_bfs_hops' driver-loop twin expressed
    as ONE recursive SQL query, the engine feature that turns
    iterative graph/hierarchy traversals into optimizer-visible plans.

    UNION ALL recursion enumerates paths, so the hop bound caps the
    blowup (bounded-diameter contract, like the BFS loop's n_iter);
    MIN(hops) collapses paths to distances.  DuckDB runs the textually
    identical recursive CTE — full value oracle.
    """
    edges = _pair_counts(_items(spark, sf_dir)).select("pa", "pb")
    sym = (edges.select(F.col("pa").alias("src"), F.col("pb").alias("dst"))
           .union(edges.select(F.col("pb").alias("src"),
                               F.col("pa").alias("dst"))))
    sym.createOrReplaceTempView("rcte_edges")
    return spark.sql(f"""
        WITH RECURSIVE reach(node, hops) AS (
            SELECT MIN(src), 0 FROM rcte_edges
            UNION ALL
            SELECT e.dst, r.hops + 1
            FROM reach r JOIN rcte_edges e ON e.src = r.node
            WHERE r.hops < {RCTE_MAX_HOPS})
        SELECT node, MIN(hops) AS dist, COUNT(*) AS n_paths
        FROM reach GROUP BY node
    """)


def q_clustering_coefficient(spark, sf_dir):
    """Local clustering coefficient per node on the strong co-purchase
    graph: triangles_at(v) / C(deg(v), 2) — how clique-like each
    part's neighborhood is (the community-structure signal Adamic-Adar
    and triangle counts summarize globally).

    The oriented two-hop triangle join runs ONCE over the cached edge
    list; each found triangle explodes to its three member nodes and
    one partial+final agg counts per-node incidences.  The coefficient
    is exact integer arithmetic emitted as floor(2*t*1e6 /
    (d*(d-1))); degree-1 nodes emit NULL (undefined denominator).
    """
    edges = (_pair_counts(_items(spark, sf_dir).cache())
             .select("pa", "pb").cache())
    e1 = edges.select(F.col("pa").alias("a"), F.col("pb").alias("b"))
    e2 = edges.select(F.col("pa").alias("b"), F.col("pb").alias("c"))
    e3 = edges.select(F.col("pa").alias("a"), F.col("pb").alias("c"))
    tri = (e1.join(e2, "b").join(e3, ["a", "c"])
             .select(F.explode(F.array("a", "b", "c")).alias("node"))
             .groupBy("node").agg(F.count(F.lit(1)).alias("t")))
    deg = (edges.select(F.col("pa").alias("node"))
                .union(edges.select(F.col("pb").alias("node")))
                .groupBy("node").agg(F.count(F.lit(1)).alias("deg")))
    j = deg.join(tri, "node", "left")            .withColumn("t", F.coalesce("t", F.lit(0)))
    coeff = F.floor(F.col("t").cast("double") * 2e6
                    / (F.col("deg").cast("double")
                       * (F.col("deg").cast("double") - 1.0)))
    return j.select("node", "deg", F.col("t").alias("n_triangles"),
                    F.when(F.col("deg") >= 2, coeff)
                     .cast("long").alias("clustering_ppm"))


PPR_N_SEEDS = 3


def q_ppr_seeded(spark, sf_dir, n_iter: int = 5, d: float = 0.85):
    """Personalized PageRank: random walks restart at a SEED SET (the
    3 smallest strong-graph nodes) instead of everywhere — "related
    items for THESE products", the recommendation form of PageRank.

    Same Pregel data movement and exact-arithmetic discipline as
    q_pagerank_copurchase (quantize contributions to floor(c*1e15)
    longs, exact SUM, one dequantize per iteration; localCheckpoint per
    round); only the teleport differs — (1-d)/|S| lands on seeds, 0
    elsewhere, via one broadcast membership join per iteration.  Seeds
    are a 3-row driver collect of ids (the bfs source-node pattern),
    never data.
    """
    edges = _pair_counts(_items(spark, sf_dir)).select("pa", "pb")
    adj = (edges.select(F.col("pa").alias("src"), F.col("pb").alias("dst"))
           .union(edges.select(F.col("pb").alias("src"),
                               F.col("pa").alias("dst")))
           .cache())
    deg = adj.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    adj_deg = adj.join(deg, "src").localCheckpoint(eager=False)  # lazy
    seeds = [r[0] for r in
             deg.select("src").orderBy("src").limit(PPR_N_SEEDS).collect()]
    seed_df = spark.createDataFrame([(s,) for s in seeds], "seed bigint")
    init = 1.0 / PPR_N_SEEDS
    restart = (1.0 - d) / PPR_N_SEEDS
    pr = (deg.select(F.col("src").alias("node"))
             .join(F.broadcast(seed_df), F.col("node") == F.col("seed"),
                   "left")
             .select("node",
                     F.when(F.col("seed").isNotNull(), F.lit(init))
                      .otherwise(F.lit(0.0)).alias("rank")))
    for _ in range(n_iter):
        contribs = (adj_deg.join(pr, adj_deg.src == pr.node)
                    .select("dst",
                            F.floor((F.col("rank") / F.col("deg"))
                                    * F.lit(1e15)).alias("c_fp"))
                    .groupBy("dst")
                    .agg(F.sum("c_fp").alias("inflow_fp")))
        pr = (contribs
              .join(F.broadcast(seed_df), F.col("dst") == F.col("seed"),
                    "left")
              .select(F.col("dst").alias("node"),
                      (F.when(F.col("seed").isNotNull(), F.lit(restart))
                        .otherwise(F.lit(0.0))
                       + F.lit(d) * (F.col("inflow_fp").cast("double")
                                     / F.lit(1e15))).alias("rank"))
              .localCheckpoint(eager=False))   # lazy: rounds pipeline
    return pr.select("node", F.floor(F.col("rank") * 1e9)
                     .cast("long").alias("rank_e9"))


def q_shortest_path_weighted(spark, sf_dir, n_iter: int = 4):
    """Bounded single-source WEIGHTED shortest path (Bellman-Ford,
    <= 4 edges) from the smallest node of the strong co-purchase
    graph.  Edge cost is an exact integer, floor(1e6 / n_ab) — the
    stronger the co-purchase tie, the cheaper the hop — so every
    relax-and-min round is integer arithmetic with NO fp-ordering
    concern, and the unrolled-level oracle matches bit-exactly (the
    bfs_hops recipe generalized from unit to weighted costs; the
    reference engine's only traversal is the crawl frontier itself,
    pool.go's worklist — it has no graph surface at all).

    Scale: identical Pregel shape to q_bfs_hops — per round one join
    keyed on the frontier plus one min-agg; dist holds only reached
    nodes.  At web scale keep dist hash-partitioned by node id so the
    per-round join is co-located, and localCheckpoint truncates
    lineage so round N does not replan rounds 1..N-1.
    """
    edges = _pair_counts(_items(spark, sf_dir))
    adj = (edges.select(F.col("pa").alias("src"), F.col("pb").alias("dst"),
                        "n_ab")
           .union(edges.select(F.col("pb").alias("src"),
                               F.col("pa").alias("dst"), "n_ab"))
           .select("src", "dst",
                   F.floor(F.lit(1000000) / F.col("n_ab"))
                    .cast("bigint").alias("ecost"))
           .cache())
    # Source = the highest-degree node (min id on ties): the hub's
    # component is the graph's core at every SF — the min-id node sat
    # in a 2-node component at sf0.1, a vacuous walk.
    src_node = (adj.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
                   .orderBy(F.desc("deg"), F.asc("src"))
                   .limit(1).collect()[0][0])
    dist = spark.createDataFrame([(src_node, 0)], "node bigint, cost bigint")
    for _ in range(n_iter):
        nxt = (adj.join(dist, adj.src == dist.node)
               .select(F.col("dst").alias("node"),
                       (F.col("cost") + F.col("ecost")).alias("cost")))
        # EAGER, deliberately: dist is referenced twice per round
        # (frontier join + union) — the markov lesson (behavior.py):
        # lazy checkpoints under AQE can recompute the unmaterialized
        # branch; this loop read +0.6 s in the full bench under lazy.
        dist = (dist.union(nxt)
                .groupBy("node").agg(F.min("cost").alias("min_cost"))
                .withColumnRenamed("min_cost", "cost")
                .localCheckpoint())
    return dist.select("node", F.col("cost").alias("min_cost"))


QUERIES = {
    "graph_degree_distribution": q_degree_distribution,
    "graph_kcore_3": q_kcore_peel,
    "graph_recursive_reachability": q_recursive_reachability,
    "graph_clustering_coefficient": q_clustering_coefficient,
    "basket_rules": q_basket_rules,
    "triangle_count": q_triangle_count,
    "pagerank_copurchase": q_pagerank_copurchase,
    "bfs_hops": q_bfs_hops,
    "label_propagation": q_label_propagation,
    "graph_adamic_adar": q_adamic_adar,
    "graph_shortest_path_weighted": q_shortest_path_weighted,
    "graph_ppr_seeded": q_ppr_seeded,
}

def _pagerank_oracle(n_iter: int = 5, d: float = 0.85) -> str:
    """Unrolled-CTE DuckDB twin of q_pagerank_copurchase.  Double
    literals go through CAST('…' AS DOUBLE) (string parse is
    correctly rounded; a bare decimal literal would take DuckDB's
    DECIMAL path), and the damping constants are the repr of the SAME
    Python doubles Spark embeds via F.lit.  The inflow applies the same
    quantize-sum-dequantize as the Spark side: floor(c*1e15) longs,
    exact integer SUM, one cast back to double — order-independent in
    both engines, so no ORDER BY fold is needed."""
    dd, omd = repr(float(d)), repr(1.0 - d)
    ctes = ["""
        items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        edges AS (
            SELECT a.l_partkey AS pa, b.l_partkey AS pb
            FROM items a JOIN items b
              ON a.l_orderkey = b.l_orderkey
             AND a.l_partkey < b.l_partkey
            GROUP BY 1, 2 HAVING count(*) >= 2),
        adj AS (SELECT pa AS src, pb AS dst FROM edges
                UNION ALL SELECT pb, pa FROM edges),
        deg AS (SELECT src, count(*) AS deg FROM adj GROUP BY 1),
        nn AS (SELECT count(*) AS n FROM deg),
        adjdeg AS (SELECT adj.src, adj.dst, deg.deg
                   FROM adj JOIN deg USING (src)),
        pr0 AS (SELECT src AS node,
                       CAST(1.0 AS DOUBLE) / (SELECT n FROM nn) AS rank
                FROM deg)"""]
    for i in range(1, n_iter + 1):
        ctes.append(f"""
        pr{i} AS (
            SELECT a.dst AS node,
                   CAST('{omd}' AS DOUBLE) / (SELECT n FROM nn)
                   + CAST('{dd}' AS DOUBLE)
                     * (CAST(SUM(CAST(floor(p.rank / a.deg * 1e15)
                                      AS BIGINT)) AS DOUBLE) / 1e15) AS rank
            FROM adjdeg a JOIN pr{i - 1} p ON p.node = a.src
            GROUP BY a.dst)""")
    return ("WITH" + ",".join(ctes)
            + f"""
        SELECT node, CAST(floor(rank * 1e9) AS BIGINT) AS rank_e9
        FROM pr{n_iter}""")


def _lpa_oracle(n_iter: int = LPA_ITERS) -> str:
    """Unrolled-CTE DuckDB twin of q_label_propagation — integer/rank
    arithmetic only, so it matches the Spark side exactly."""
    return (_lpa_ctes(n_iter)
            + f" SELECT node, label FROM l{n_iter}")


def _lpa_ctes(n_iter: int = LPA_ITERS) -> str:
    """The WITH-chain of _lpa_oracle without the final SELECT, so
    composing oracles (graph_modularity_score) can SPLICE it at top
    level and keep extending the same CTE list (the r10 mixture_cte
    recipe — nesting a WITH-chain as a derived table blocks DuckDB
    pushdown and re-runs it per reference)."""
    parts = ["""WITH items AS (
        SELECT DISTINCT l_orderkey AS o, l_partkey AS i FROM lineitem),
    e AS (SELECT a.i AS pa, b.i AS pb
          FROM items a JOIN items b ON a.o = b.o AND a.i < b.i
          GROUP BY 1, 2 HAVING COUNT(*) >= 2),
    adj AS (SELECT pa AS src, pb AS dst FROM e
            UNION ALL SELECT pb, pa FROM e),
    l0 AS (SELECT DISTINCT src AS node, src AS label FROM adj)"""]
    for i in range(n_iter):
        parts.append(f"""
    , l{i + 1} AS (SELECT node, label FROM (
        SELECT m.node, m.label,
               ROW_NUMBER() OVER (PARTITION BY m.node
                   ORDER BY m.cnt DESC, m.label) AS rk
        FROM (SELECT adj.dst AS node, l{i}.label, COUNT(*) AS cnt
              FROM adj JOIN l{i} ON adj.src = l{i}.node
              GROUP BY 1, 2) m) WHERE rk = 1)""")
    return "".join(parts)


ORACLE = {
    "label_propagation": _lpa_oracle(),
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
    "pagerank_copurchase": _pagerank_oracle(),
    "bfs_hops": """
        WITH RECURSIVE
        items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        edges AS (
            SELECT a.l_partkey AS pa, b.l_partkey AS pb
            FROM items a JOIN items b
              ON a.l_orderkey = b.l_orderkey
             AND a.l_partkey < b.l_partkey
            GROUP BY 1, 2 HAVING count(*) >= 2),
        adj AS (SELECT pa AS src, pb AS dst FROM edges
                UNION ALL SELECT pb, pa FROM edges),
        walk(node, hops) AS (
            SELECT (SELECT min(src) FROM adj), 0
            UNION
            SELECT a.dst, w.hops + 1
            FROM walk w JOIN adj a ON a.src = w.node
            WHERE w.hops < 4)
        SELECT node, min(hops) AS hops FROM walk GROUP BY 1
    """,
}


def _adamic_adar_oracle() -> str:
    from .text import _ln_det, _lit_duck
    contrib = (f"CAST(FLOOR(CAST('1000000000000.0' AS DOUBLE) / "
               f"{_ln_det('deg', _lit_duck)}) AS BIGINT)")
    return f"""
        WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        edges AS (
            SELECT a.l_partkey AS pa, b.l_partkey AS pb
            FROM items a JOIN items b
              ON a.l_orderkey = b.l_orderkey
             AND a.l_partkey < b.l_partkey
            GROUP BY 1, 2 HAVING count(*) >= 2),
        adj AS (SELECT pa AS z, pb AS x FROM edges
                UNION ALL SELECT pb, pa FROM edges),
        deg AS (SELECT z, count(*) AS deg FROM adj GROUP BY 1),
        cand AS (
            SELECT a.z, a.x AS na, b.x AS nb
            FROM adj a JOIN adj b ON a.z = b.z AND a.x < b.x
            WHERE NOT EXISTS (SELECT 1 FROM edges e
                              WHERE e.pa = a.x AND e.pb = b.x))
        SELECT c.na AS part_a, c.nb AS part_b,
               COUNT(*) AS n_common,
               SUM({contrib})::BIGINT AS aa_e12
        FROM cand c JOIN deg USING (z)
        GROUP BY 1, 2
    """


ORACLE["graph_adamic_adar"] = _adamic_adar_oracle()

ORACLE["graph_degree_distribution"] = """
    WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    pairs AS (
        SELECT a.l_partkey AS pa, b.l_partkey AS pb
        FROM items a JOIN items b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING COUNT(*) >= 2),
    sym AS (SELECT pa AS p FROM pairs UNION ALL SELECT pb FROM pairs),
    deg AS (SELECT p, COUNT(*)::BIGINT AS degree FROM sym GROUP BY 1)
    SELECT degree, COUNT(*)::BIGINT AS n_parts
    FROM deg GROUP BY 1
"""

ORACLE["graph_kcore_3"] = """
    WITH items AS MATERIALIZED (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    pairs AS MATERIALIZED (
        SELECT a.l_partkey AS pa, b.l_partkey AS pb
        FROM items a JOIN items b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING COUNT(*) >= 2),
    edges AS MATERIALIZED (
        SELECT pa AS src, pb AS dst FROM pairs
        UNION ALL SELECT pb, pa FROM pairs),
    a0 AS (SELECT DISTINCT src AS node FROM edges),
    e1 AS (SELECT e.src, e.dst FROM edges e
             JOIN a0 x ON x.node = e.src
             JOIN a0 y ON y.node = e.dst),
    d1 AS (SELECT src, COUNT(*)::BIGINT AS deg FROM e1 GROUP BY 1),
    a1 AS (SELECT src AS node FROM d1 WHERE deg >= 3),
    e2 AS (SELECT e.src, e.dst FROM edges e
             JOIN a1 x ON x.node = e.src
             JOIN a1 y ON y.node = e.dst),
    d2 AS (SELECT src, COUNT(*)::BIGINT AS deg FROM e2 GROUP BY 1),
    a2 AS (SELECT src AS node FROM d2 WHERE deg >= 3),
    e3 AS (SELECT e.src, e.dst FROM edges e
             JOIN a2 x ON x.node = e.src
             JOIN a2 y ON y.node = e.dst),
    d3 AS (SELECT src, COUNT(*)::BIGINT AS deg FROM e3 GROUP BY 1),
    a3 AS (SELECT src AS node FROM d3 WHERE deg >= 3),
    e4 AS (SELECT e.src, e.dst FROM edges e
             JOIN a3 x ON x.node = e.src
             JOIN a3 y ON y.node = e.dst),
    d4 AS (SELECT src, COUNT(*)::BIGINT AS deg FROM e4 GROUP BY 1),
    a4 AS (SELECT src AS node FROM d4 WHERE deg >= 3),
    e5 AS (SELECT e.src, e.dst FROM edges e
             JOIN a4 x ON x.node = e.src
             JOIN a4 y ON y.node = e.dst),
    d5 AS (SELECT src, COUNT(*)::BIGINT AS deg FROM e5 GROUP BY 1),
    a5 AS (SELECT src AS node FROM d5 WHERE deg >= 3)
    SELECT e.src AS node, COUNT(*)::BIGINT AS core_degree
    FROM edges e
    JOIN a5 x ON x.node = e.src JOIN a5 y ON y.node = e.dst
    GROUP BY 1
"""

ORACLE["graph_recursive_reachability"] = f"""
    WITH RECURSIVE items AS MATERIALIZED (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    pairs AS MATERIALIZED (
        SELECT a.l_partkey AS pa, b.l_partkey AS pb
        FROM items a JOIN items b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING COUNT(*) >= 2),
    edges AS MATERIALIZED (
        SELECT pa AS src, pb AS dst FROM pairs
        UNION ALL SELECT pb, pa FROM pairs),
    reach(node, hops) AS (
        SELECT (SELECT MIN(src) FROM edges), 0
        UNION ALL
        SELECT e.dst, r.hops + 1
        FROM reach r JOIN edges e ON e.src = r.node
        WHERE r.hops < {RCTE_MAX_HOPS})
    SELECT node, MIN(hops) AS dist, COUNT(*)::BIGINT AS n_paths
    FROM reach GROUP BY node
"""

ORACLE["graph_clustering_coefficient"] = """
    WITH items AS MATERIALIZED (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    pairs AS MATERIALIZED (
        SELECT a.l_partkey AS pa, b.l_partkey AS pb
        FROM items a JOIN items b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING COUNT(*) >= 2),
    tri AS (
        SELECT node, COUNT(*)::BIGINT AS t
        FROM (SELECT unnest([e1.pa, e1.pb, e2.pb]) AS node
              FROM pairs e1
              JOIN pairs e2 ON e2.pa = e1.pb
              JOIN pairs e3 ON e3.pa = e1.pa AND e3.pb = e2.pb)
        GROUP BY 1),
    deg AS (
        SELECT node, COUNT(*)::BIGINT AS deg
        FROM (SELECT pa AS node FROM pairs
              UNION ALL SELECT pb FROM pairs)
        GROUP BY 1)
    SELECT d.node, d.deg, COALESCE(t.t, 0)::BIGINT AS n_triangles,
           CASE WHEN d.deg >= 2 THEN
               CAST(FLOOR(CAST(COALESCE(t.t, 0) AS DOUBLE) * 2e6
                          / (CAST(d.deg AS DOUBLE)
                             * (CAST(d.deg AS DOUBLE) - 1.0))) AS BIGINT)
           END AS clustering_ppm
    FROM deg d LEFT JOIN tri t USING (node)
"""


def _shortest_path_oracle(n_iter: int = 4) -> str:
    """Unrolled relax-and-min levels — one CTE per Bellman-Ford round,
    each GROUP BY node, so level k holds <= |nodes| rows (a recursive
    CTE keyed on (node, cost, hops) would enumerate every distinct-cost
    path instead).  Integer costs make every level bit-exact."""
    ctes = ["""
        items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        edges AS (
            SELECT a.l_partkey AS pa, b.l_partkey AS pb,
                   count(*) AS n_ab
            FROM items a JOIN items b
              ON a.l_orderkey = b.l_orderkey
             AND a.l_partkey < b.l_partkey
            GROUP BY 1, 2 HAVING count(*) >= 2),
        adj AS (
            SELECT pa AS src, pb AS dst,
                   CAST(FLOOR(1000000 / n_ab) AS BIGINT) AS ecost
            FROM edges
            UNION ALL
            SELECT pb, pa, CAST(FLOOR(1000000 / n_ab) AS BIGINT)
            FROM edges),
        d0 AS (SELECT (SELECT src FROM adj
                       GROUP BY src
                       ORDER BY count(*) DESC, src LIMIT 1) AS node,
                      CAST(0 AS BIGINT) AS cost)"""]
    for k in range(1, n_iter + 1):
        ctes.append(f"""
        d{k} AS (
            SELECT node, min(cost) AS cost FROM (
                SELECT node, cost FROM d{k - 1}
                UNION ALL
                SELECT a.dst AS node, d.cost + a.ecost AS cost
                FROM d{k - 1} d JOIN adj a ON a.src = d.node)
            GROUP BY 1)""")
    return ("WITH " + ",".join(ctes)
            + f"\n        SELECT node, cost AS min_cost FROM d{n_iter}")


ORACLE["graph_shortest_path_weighted"] = _shortest_path_oracle()


def _ppr_oracle(n_iter: int = 5, d: float = 0.85) -> str:
    """Unrolled-CTE DuckDB twin of q_ppr_seeded — the _pagerank_oracle
    recipe with the teleport restricted to the seed set."""
    dd = repr(float(d))
    init = repr(1.0 / PPR_N_SEEDS)
    restart = repr((1.0 - d) / PPR_N_SEEDS)
    ctes = [f"""
        items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        edges AS (
            SELECT a.l_partkey AS pa, b.l_partkey AS pb
            FROM items a JOIN items b
              ON a.l_orderkey = b.l_orderkey
             AND a.l_partkey < b.l_partkey
            GROUP BY 1, 2 HAVING count(*) >= 2),
        adj AS (SELECT pa AS src, pb AS dst FROM edges
                UNION ALL SELECT pb, pa FROM edges),
        deg AS (SELECT src, count(*) AS deg FROM adj GROUP BY 1),
        seeds AS (SELECT src AS seed FROM deg
                  ORDER BY src LIMIT {PPR_N_SEEDS}),
        adjdeg AS (SELECT adj.src, adj.dst, deg.deg
                   FROM adj JOIN deg USING (src)),
        pr0 AS (SELECT d.src AS node,
                       CASE WHEN s.seed IS NOT NULL
                            THEN CAST('{init}' AS DOUBLE)
                            ELSE CAST(0.0 AS DOUBLE) END AS rank
                FROM deg d LEFT JOIN seeds s ON d.src = s.seed)"""]
    for i in range(1, n_iter + 1):
        ctes.append(f"""
        pr{i} AS (
            SELECT g.node,
                   CASE WHEN s.seed IS NOT NULL
                        THEN CAST('{restart}' AS DOUBLE)
                        ELSE CAST(0.0 AS DOUBLE) END
                   + CAST('{dd}' AS DOUBLE) * g.inflow AS rank
            FROM (SELECT a.dst AS node,
                         CAST(SUM(CAST(floor(p.rank / a.deg * 1e15)
                                       AS BIGINT)) AS DOUBLE) / 1e15
                             AS inflow
                  FROM adjdeg a JOIN pr{i - 1} p ON p.node = a.src
                  GROUP BY a.dst) g
            LEFT JOIN seeds s ON g.node = s.seed)""")
    return ("WITH" + ",".join(ctes)
            + f"""
        SELECT node, CAST(floor(rank * 1e9) AS BIGINT) AS rank_e9
        FROM pr{n_iter}""")


ORACLE["graph_ppr_seeded"] = _ppr_oracle()


# ------------------------------------------------ community quality

MOD_E9 = 1_000_000_000


def q_graph_modularity(spark, sf_dir):
    """Newman MODULARITY of the label-propagation communities over the
    strong co-purchase graph — the quality readout that closes the
    community-detection loop (LPA gives labels; this says whether the
    partition beats random: Q = sum_c [e_c/m - (d_c/2m)^2]).

    Per community: intra-edge count e_c (edges whose endpoints share
    the final label), degree mass d_c, node count, and the EXACT
    integer e9-quantized contribution — both division terms are exact
    integer floor-divisions (the d_c^2 * 1e9 numerator would overflow
    BIGINT at ~1e19, so it long-divides in two BIGINT-safe steps:
    floor(a*C1*C2/den) = (a*C1 DIV den)*C2 + ((a*C1) % den)*C2 DIV
    den with C1*C2 = 1e9 — every intermediate <= 4e17; DuckDB computes
    the same integers via HUGEINT //).  Total modularity = SUM(q_e9),
    order-independent by integer addition.

    Scale shape: two label-broadcast joins + |labels|-sized groupBys
    on top of the cached LPA adjacency; m is one bounded scalar
    collect.  Singleton/no-intra-edge communities keep their negative
    (d_c/2m)^2 term — dropping them would inflate Q.
    """
    edges = _pair_counts(_items(spark, sf_dir)).select("pa", "pb").cache()
    m = edges.count()
    if m == 0:
        raise ValueError("empty co-purchase graph — no modularity")
    lab = q_label_propagation(spark, sf_dir)
    la = lab.select(F.col("node").alias("pa"), F.col("label").alias("ca"))
    lb = lab.select(F.col("node").alias("pb"), F.col("label").alias("cb"))
    intra = (edges.join(la, "pa").join(lb, "pb")
             .filter(F.col("ca") == F.col("cb"))
             .groupBy(F.col("ca").alias("label"))
             .agg(F.count(F.lit(1)).alias("e_intra")))
    deg = (edges.select(F.col("pa").alias("node"))
           .union(edges.select(F.col("pb").alias("node")))
           .groupBy("node").agg(F.count(F.lit(1)).alias("deg")))
    comm = (deg.join(lab, "node").groupBy("label")
            .agg(F.sum("deg").alias("d_sum"),
                 F.count(F.lit(1)).alias("n_nodes"))
            .join(intra, "label", "left")
            .select("label", "n_nodes", "d_sum",
                    F.coalesce("e_intra", F.lit(0)).alias("e_intra")))
    den = 4 * m * m
    c1, c2 = 10_000, 100_000       # c1*c2 = 1e9; d2*c1 <= 1e14, rem*c2 <= 4e17
    return comm.selectExpr(
        "label", "n_nodes", "d_sum", "e_intra",
        f"CAST((e_intra * {MOD_E9}) DIV {m}"
        f" - ((d_sum * d_sum * {c1}) DIV {den}) * {c2}"
        f" - (((d_sum * d_sum * {c1}) % {den}) * {c2}) DIV {den}"
        " AS BIGINT) AS q_e9")


QUERIES["graph_modularity_score"] = q_graph_modularity


def _modularity_oracle(n_iter: int = LPA_ITERS) -> str:
    return (_lpa_ctes(n_iter) + f"""
    , lf AS MATERIALIZED (SELECT node, label FROM l{n_iter}),
    mm AS MATERIALIZED (SELECT COUNT(*)::BIGINT AS m FROM e),
    intra AS MATERIALIZED (
        SELECT la.label, COUNT(*)::BIGINT AS e_intra
        FROM e
        JOIN lf la ON la.node = e.pa
        JOIN lf lb ON lb.node = e.pb
        WHERE la.label = lb.label
        GROUP BY 1),
    deg AS MATERIALIZED (
        SELECT node, COUNT(*)::BIGINT AS deg FROM
        (SELECT pa AS node FROM e UNION ALL SELECT pb FROM e)
        GROUP BY 1),
    comm AS MATERIALIZED (
        SELECT lf.label, COUNT(*)::BIGINT AS n_nodes,
               SUM(d.deg)::BIGINT AS d_sum
        FROM deg d JOIN lf ON lf.node = d.node
        GROUP BY 1)
    SELECT c.label, c.n_nodes, c.d_sum,
           COALESCE(i.e_intra, 0)::BIGINT AS e_intra,
           ((COALESCE(i.e_intra, 0)::HUGEINT * {MOD_E9}) // mm.m
            - (c.d_sum::HUGEINT * c.d_sum * {MOD_E9})
              // (4::HUGEINT * mm.m * mm.m))::BIGINT AS q_e9
    FROM comm c LEFT JOIN intra i ON i.label = c.label, mm
    """)


ORACLE["graph_modularity_score"] = _modularity_oracle()
