"""Iterative ML on DataFrames: Lloyd's k-means over the embeddings
table, expressed entirely as declarative join/aggregate steps.

The reference engine has no iterative surface (its one entry point is a
single-pass fold, crawler.go:204-255); clustering is the canonical
workload that needs a driver-side LOOP of distributed steps — the same
shape as PageRank in operators/graph.py, but with float geometry, so
every arithmetic step is chosen for cross-engine bit-equality:

- distance: sequential fold of squared differences (F.aggregate over
  zip_with, seeded 0.0) == DuckDB list_reduce over list_transform —
  the repo's verified bit-identical fold pair (similarity.py:329).
- argmin: ROW_NUMBER ordered by (d2, cid) — total order, no fp ties to
  resolve ambiguously.
- centroid update: per-dimension mean via posexplode + exact
  DECIMAL(20,7) sums (float->DOUBLE->DECIMAL double hop — see
  q_embedding_centroids), then ONE double division.  Decimal addition
  is associative, so the update is partitioning-independent — which is
  also exactly what makes the result reproducible on a real cluster.

Scale: centroids are k rows — broadcast to the assignment join, never
shuffled.  Each iteration shuffles only the (cid, dim) partial sums
(k x 64 rows per task after map-side combine); the embeddings scan is
cached once.  Lineage grows linearly with iterations; a production
loop would checkpoint every ~10 rounds (n_iter=3 here).
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..sources.tables import load_table

_K, _N_ITER = 4, 3


def _d2(emb_col, cent_col):
    diff2 = F.zip_with(
        emb_col, cent_col,
        lambda x, c: (x.cast("double") - c) * (x.cast("double") - c))
    return F.aggregate(diff2, F.lit(0.0), lambda acc, x: acc + x)


def q_kmeans_embeddings(spark, sf_dir, k: int = _K, n_iter: int = _N_ITER):
    """k-means (k=4, 3 Lloyd iterations, seeded by the k lowest
    vec_ids) over the 64-dim embedding vectors; returns the final
    assignment with the squared distance as floor(d2 * 1e6) fixed
    point.  Cluster ids are the seed vectors' vec_ids (stable across
    engines without renumbering)."""
    e = (load_table(spark, sf_dir, "embeddings")
         .select("vec_id", "embedding").cache())
    cent = (e.orderBy("vec_id").limit(k)
            .select(F.col("vec_id").alias("cid"),
                    F.transform("embedding",
                                lambda x: x.cast("double")).alias("cvec")))

    def assign(cent_df):
        scored = (e.crossJoin(F.broadcast(cent_df))
                  .select("vec_id", "cid",
                          _d2(F.col("embedding"), F.col("cvec")).alias("d2")))
        rk = F.row_number().over(
            W.partitionBy("vec_id").orderBy("d2", "cid"))
        return (scored.withColumn("rk", rk)
                .filter(F.col("rk") == 1).select("vec_id", "cid", "d2"))

    for _ in range(n_iter):
        a = assign(cent)
        ex = (a.join(e, "vec_id")
              .select("cid", F.posexplode("embedding").alias("dim", "x")))
        sums = (ex.groupBy("cid", "dim")
                .agg(F.sum(F.col("x").cast("double").cast("decimal(20,7)"))
                     .alias("s"),
                     F.count(F.lit(1)).alias("n")))
        means = sums.select(
            "cid", "dim",
            (F.col("s").cast("double") / F.col("n").cast("double"))
            .alias("mean"))
        # NOT localCheckpoint-ed (unlike pagerank/bfs): measured 1.9s
        # lazy vs 2.4s checkpointed at sf0.01 — with only 3 iterations
        # and 4-row centroid states, per-iteration job barriers cost
        # more than the deep-but-single-action plan they avoid.
        cent = (means.groupBy("cid")
                .agg(F.transform(
                    F.array_sort(F.collect_list(F.struct("dim", "mean"))),
                    lambda p: p["mean"]).alias("cvec")))
    final = assign(cent)
    return final.select(
        "vec_id", "cid",
        F.floor(F.col("d2") * 1e6).cast("long").alias("d2_e6"))


def _kmeans_oracle(k: int = _K, n_iter: int = _N_ITER) -> str:
    """Unrolled DuckDB twin: cent0 -> (assign, sums, cent) x n_iter ->
    final assign.  Same fold shape, same decimal double-hop, same
    (d2, cid) total order."""
    d2 = ("list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
          "list_transform(list_zip(e.embedding, c.cvec), "
          "p -> (CAST(p[1] AS DOUBLE) - p[2]) * (CAST(p[1] AS DOUBLE) - p[2]))), "
          "(acc, x) -> acc + x)")
    ctes = [f"""
        cent0 AS (
            SELECT vec_id AS cid,
                   list_transform(embedding, v -> CAST(v AS DOUBLE)) AS cvec
            FROM embeddings ORDER BY vec_id LIMIT {k})"""]
    for i in range(1, n_iter + 1):
        ctes.append(f"""
        assign{i} AS (
            SELECT vec_id, cid, d2 FROM (
                SELECT e.vec_id, c.cid, {d2} AS d2,
                       ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                          ORDER BY {d2}, c.cid) AS rk
                FROM embeddings e CROSS JOIN cent{i - 1} c)
            WHERE rk = 1),
        sums{i} AS (
            SELECT a.cid, t.i AS dim,
                   SUM(CAST(CAST(e.embedding[t.i + 1] AS DOUBLE)
                            AS DECIMAL(20,7))) AS s,
                   COUNT(*) AS n
            FROM assign{i} a JOIN embeddings e USING (vec_id),
                 unnest(range(len(e.embedding))) AS t(i)
            GROUP BY 1, 2),
        cent{i} AS (
            SELECT cid,
                   list(CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
                        ORDER BY dim) AS cvec
            FROM sums{i} GROUP BY cid)""")
    return ("WITH" + ",".join(ctes) + f"""
        SELECT vec_id, cid, CAST(floor(d2 * 1e6) AS BIGINT) AS d2_e6
        FROM (
            SELECT e.vec_id, c.cid, {d2} AS d2,
                   ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                      ORDER BY {d2}, c.cid) AS rk
            FROM embeddings e CROSS JOIN cent{n_iter} c)
        WHERE rk = 1""")


QUERIES = {
    "kmeans_embeddings": q_kmeans_embeddings,
}

ORACLE = {
    "kmeans_embeddings": _kmeans_oracle(),
}
