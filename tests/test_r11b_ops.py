"""Ground-truth / property tests for the r11 second-session additions
(sorted-neighborhood blocking dedup; the stream-stream interval join
replay lives in tests/test_streaming.py-adjacent coverage below if
added this session)."""

from __future__ import annotations

from pyspark.sql import functions as F

from go_mapreduce_crawler_spark.operators.dedup import (JACCARD_T,
                                                        SN_KEY_CHARS,
                                                        SN_WINDOW, _docs)


def _py_sorted_neighborhood(spark, sf):
    """From-scratch Python replica: normalize key, globally sort,
    window-compare, exact word-set Jaccard."""
    import re

    rows = _docs(spark, sf).select("doc_id", "text").collect()
    keyed = sorted(
        ((re.sub(r"[^a-z0-9]", "", r.text[:64].lower())[:SN_KEY_CHARS],
          r.doc_id) for r in rows))
    words = {r.doc_id: set(r.text.split(" ")) for r in rows}
    out = set()
    for i, (_, a) in enumerate(keyed):
        for j in range(i + 1, min(i + 1 + SN_WINDOW, len(keyed))):
            b = keyed[j][1]
            inter = len(words[a] & words[b])
            union = len(words[a]) + len(words[b]) - inter
            if union and round(inter / union, 6) >= JACCARD_T:
                out.add((min(a, b), max(a, b), j - i,
                         round(inter / union, 6)))
    return out


def test_sorted_neighborhood_matches_python_replica(spark, sf_small):
    from __spark_entry__ import queries

    got = {(r.doc_a, r.doc_b, r.rank_gap, r.jaccard)
           for r in queries()["dedup_sorted_neighborhood"](
               spark, sf_small).collect()}
    assert got == _py_sorted_neighborhood(spark, sf_small)
    assert got, "fixture corpus must contain prefix-adjacent near-dups"


def test_sorted_neighborhood_pair_bound_and_properties(spark, sf_small):
    """Every pair respects the window bound and the verify threshold;
    exact duplicates (identical text) sort adjacent and surface with
    jaccard 1.0."""
    from __spark_entry__ import queries

    df = queries()["dedup_sorted_neighborhood"](spark, sf_small)
    rows = df.collect()
    assert all(1 <= r.rank_gap <= SN_WINDOW for r in rows)
    assert all(r.jaccard >= JACCARD_T for r in rows)
    assert all(r.doc_a < r.doc_b for r in rows)
    # candidate-count bound: emitted pairs <= N * SN_WINDOW
    n = _docs(spark, sf_small).count()
    assert len(rows) <= n * SN_WINDOW

    # an exact-dup group of size g (same text => same key, ranks
    # contiguous) must contribute its adjacent pairs at jaccard 1.0
    dup = (_docs(spark, sf_small)
           .groupBy("text").agg(F.count(F.lit(1)).alias("n"),
                                F.min("doc_id").alias("lo"),
                                F.max("doc_id").alias("hi"))
           .filter(F.col("n") == 2).limit(1).collect())
    if dup:
        lo, hi = dup[0].lo, dup[0].hi
        perfect = {(r.doc_a, r.doc_b) for r in rows if r.jaccard == 1.0}
        assert (lo, hi) in perfect
