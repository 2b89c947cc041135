"""Round-8 second-session operators: cluster-aware sampling weights,
GDPR delete cascade, join-strategy advisor, per-source adaptive quality
threshold.  Each op's oracle MATCH is the driver's job; these tests pin
the SEMANTIC contracts the hash can't express (mass conservation,
referential integrity after the cascade, the advisor's decision regimes
including BIGINT-overflow-proof skew arithmetic, the >= 75% per-source
keep guarantee).
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------- dedup

def test_cluster_weights_mass_conserved(spark):
    """SUM(weight) == |corpus| (fold one survivor per cluster, carry the
    cluster's mass) and every doc appears exactly once across
    survivors+singletons."""
    from go_mapreduce_crawler_spark.operators.dedup import (
        q_dedup_cluster_weights)

    out = q_dedup_cluster_weights(spark, SF).collect()
    n_docs = (spark.read.parquet(f"{SF}/documents.parquet").count())
    assert sum(r.weight for r in out) == n_docs
    assert len({r.doc_id for r in out}) == len(out)   # no doc twice
    assert all(r.weight >= 1 for r in out)
    assert any(r.weight >= 2 for r in out)            # fixture has dups


def test_cluster_weights_survivor_is_best(spark):
    """The survivor of every weight>=2 cluster is its longest member
    (ties -> lowest doc_id), per the dedup_keep_best policy."""
    from go_mapreduce_crawler_spark.operators.dedup import (
        _min_label_labels, q_dedup_cluster_weights, q_dedup_minhash_lsh)

    pairs = q_dedup_minhash_lsh(spark, SF).select("doc_a", "doc_b")
    labels = {r.node: r.lbl for r in _min_label_labels(pairs).collect()}
    chars = {r.doc_id: r.n_chars
             for r in spark.read.parquet(f"{SF}/documents.parquet")
                           .select("doc_id", "n_chars").collect()}
    best: dict[int, int] = {}
    size: dict[int, int] = {}
    for node, lbl in labels.items():
        size[lbl] = size.get(lbl, 0) + 1
        cur = best.get(lbl)
        if cur is None or (-chars[node], node) < (-chars[cur], cur):
            best[lbl] = node
    out = {r.doc_id: r.weight
           for r in q_dedup_cluster_weights(spark, SF).collect()
           if r.weight >= 2}
    assert out == {doc: size[lbl] for lbl, doc in best.items()}


# ----------------------------------------------------------- gdpr cascade

def test_gdpr_cascade_counts_and_referential_integrity(spark):
    from go_mapreduce_crawler_spark.operators.maintenance import (
        _FORGET, q_gdpr_delete_cascade)

    rep = {r.tbl: r for r in q_gdpr_delete_cascade(spark, SF).collect()}
    assert set(rep) == {"customer", "orders", "lineitem"}
    for r in rep.values():
        assert r.n_total == r.n_deleted + r.n_retained

    cust = spark.read.parquet(f"{SF}/customer.parquet")
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    n_forget_c = cust.filter(F.col("c_custkey") % _FORGET == 0).count()
    dead_o = orders.filter(F.col("o_custkey") % _FORGET == 0)
    n_dead_li = (li.join(dead_o.select(F.col("o_orderkey").alias("dk")),
                         li.l_orderkey == F.col("dk")).count())
    assert rep["customer"].n_deleted == n_forget_c
    assert rep["orders"].n_deleted == dead_o.count()
    assert rep["lineitem"].n_deleted == n_dead_li
    assert rep["customer"].n_deleted > 0          # the fixture exercises it

    # Referential integrity of the RETAINED set: no retained order
    # points at a deleted customer; no retained lineitem at a deleted
    # order (the cascade is closed).
    assert orders.filter((F.col("o_custkey") % _FORGET != 0)).join(
        cust.filter(F.col("c_custkey") % _FORGET == 0),
        orders.o_custkey == F.col("c_custkey")).count() == 0


# ----------------------------------------------------- join strategy advisor

def _stats(spark, side, rows, keys, maxfreq, nbytes):
    return spark.createDataFrame(
        [(rows, keys, maxfreq, nbytes)],
        f"{side}_rows long, {side}_keys long, "
        f"{side}_maxfreq long, {side}_bytes long")


@pytest.mark.parametrize(
    "probe,build,strategy,bcast,shuffle0",
    [
        # tiny dim under the 10 MB threshold -> broadcast, no shuffle
        ((10**9, 10**6, 2_000, 10**12),
         (10**5, 10**5, 1, 5 * 2**20), "broadcast", "build", True),
        # celebrity probe key, both sides too big -> shuffle-salt
        ((10**9, 10**6, 5 * 10**5, 10**12),
         (10**8, 10**8, 2, 10**11), "shuffle-salt", "none", False),
        # uniform keys, both sides big -> plain sort-merge
        ((10**9, 10**9, 2, 10**12),
         (10**8, 10**8, 2, 10**11), "sort-merge", "none", False),
        # BIGINT-overflow regime: maxfreq*keys*1e6 = 1e25 only fits the
        # DECIMAL(38,0) path; ratio 1e13 >= the salt bar
        ((10**12, 10**9, 10**10, 10**14),
         (10**8, 10**8, 2, 10**11), "shuffle-salt", "none", False),
    ])
def test_advise_join_regimes(spark, probe, build, strategy, bcast,
                             shuffle0):
    from go_mapreduce_crawler_spark.operators.scale import advise_join

    out = advise_join(_stats(spark, "probe", *probe),
                      _stats(spark, "build", *build)).collect()
    assert len(out) == 2
    assert {r.side for r in out} == {"probe", "build"}
    for r in out:
        assert r.strategy == strategy
        assert r.bcast_side == bcast
        if shuffle0:
            assert r.est_shuffle_bytes == 0
        else:
            assert r.est_shuffle_bytes == probe[3] + build[3]


def test_join_strategy_advisor_on_tpch(spark):
    """orders x customer at sf0.001: the dim side is tiny, so the
    advisor must say broadcast(build) with zero projected shuffle."""
    from go_mapreduce_crawler_spark.operators.scale import (
        q_join_strategy_advisor)

    out = {r.side: r for r in
           q_join_strategy_advisor(spark, SF).collect()}
    assert out["build"].strategy == "broadcast"
    assert out["build"].bcast_side == "build"
    assert out["build"].est_shuffle_bytes == 0
    assert out["probe"].n_rows > out["build"].n_rows
    # measured bytes are real: > 20 canon bytes per row on both sides
    for r in out.values():
        assert r.est_bytes > 20 * r.n_rows


# ------------------------------------------------- adaptive quality gate

def test_quality_adaptive_threshold_keeps_top_75pct(spark):
    """Per source: kept >= 75% of docs (P25 cutoff drops < 25%), the
    cutoff is an attained score, and totals cover the corpus."""
    from go_mapreduce_crawler_spark.operators.text import (
        q_quality_adaptive_threshold)

    out = q_quality_adaptive_threshold(spark, SF).collect()
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    totals = {r.source: r.cnt for r in
              docs.groupBy("source").agg(
                  F.count(F.lit(1)).alias("cnt")).collect()}
    assert {r.source for r in out} == set(totals)
    for r in out:
        assert r.n_total == totals[r.source]
        assert r.n_kept * 4 >= r.n_total * 3          # >= 75% kept
        assert r.n_kept <= r.n_total
        assert r.kept_ppm == r.n_kept * 1_000_000 // r.n_total
        assert 0 <= r.cutoff_e3 <= 1000               # milli-ratio domain
