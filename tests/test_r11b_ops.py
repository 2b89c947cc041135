"""Ground-truth / property tests for the r11 second-session additions
(sorted-neighborhood blocking dedup; the stream-stream interval join
replay lives in tests/test_streaming.py-adjacent coverage below if
added this session)."""

from __future__ import annotations

from pyspark.sql import functions as F

from go_mapreduce_crawler_spark.operators.dedup import (JACCARD_T,
                                                        SN_KEY_CHARS,
                                                        SN_WINDOW, _docs)


def test_stream_stream_join_matches_python_replica(spark, sf_small):
    """Append-mode output of the watermarked stream-stream interval
    join == a from-scratch Python interval join over the same events;
    exactly-once (no duplicate emitted pairs)."""
    from go_mapreduce_crawler_spark.operators.streaming_replay import (
        SSJOIN_WINDOW_H)
    from go_mapreduce_crawler_spark.sources.tables import load_table
    from __spark_entry__ import queries

    rows = queries()["stream_stream_join_replay"](
        spark, sf_small).collect()
    got = [(r.p_id, r.v_id, r.user_id, r.gap_us) for r in rows]
    assert len(got) == len(set(got)), "append sink emitted a pair twice"

    ev = [(r.event_id, r.user_id, r.event_type, r.us)
          for r in load_table(spark, sf_small, "events")
          .select("event_id", "user_id", "event_type",
                  F.unix_micros("ts").alias("us")).collect()]
    win_us = SSJOIN_WINDOW_H * 3_600_000_000
    purchases = [(i, u, t) for i, u, k, t in ev if k == "purchase"]
    views = [(i, u, t) for i, u, k, t in ev if k == "view"]
    want = {(pi, vi, pu, pt - vt)
            for pi, pu, pt in purchases
            for vi, vu, vt in views
            if vu == pu and vt <= pt and vt >= pt - win_us}
    assert set(got) == want and want


def test_stream_stream_join_state_spans_microbatches(spark, sf_medium):
    """At least one emitted pair must have its purchase and view in
    DIFFERENT replay files — proving the join buffered one side in
    state across a micro-batch boundary (otherwise the replay would
    pass even with a per-batch-only join).  sf0.01: the deterministic
    fixture has exactly one straddling pair; sf0.001's three pairs
    all land inside one ts-range split."""
    sf_small = sf_medium
    from go_mapreduce_crawler_spark.operators.streaming_replay import (
        REPLAY_SPLITS)
    from go_mapreduce_crawler_spark.sources.tables import load_table
    from __spark_entry__ import queries

    ev = {r.event_id: r.us
          for r in load_table(spark, sf_small, "events")
          .select("event_id", F.unix_micros("ts").alias("us")).collect()}
    lo, hi = min(ev.values()), max(ev.values()) + 1

    def split_of(us):
        return next(i for i in range(REPLAY_SPLITS)
                    if us < lo + (hi - lo) * (i + 1) // REPLAY_SPLITS)

    rows = queries()["stream_stream_join_replay"](
        spark, sf_small).collect()
    assert any(split_of(ev[r.p_id]) != split_of(ev[r.v_id])
               for r in rows), \
        "no emitted pair straddles a micro-batch boundary"


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


def test_conformal_coverage_matches_python_replica(spark, sf_small):
    """From-scratch Python split-conformal: same splits, same OLS,
    same order-statistic q_hat, same per-lang report."""
    import hashlib
    import math

    from go_mapreduce_crawler_spark.operators.features import (CONF_ALPHA_N,
                                                               CONF_SPLITS)
    from go_mapreduce_crawler_spark.sources.tables import load_table
    from __spark_entry__ import queries

    rows = (load_table(spark, sf_small, "documents")
            .select("doc_id", "lang", "n_chars", "text").collect())
    data = [(r.doc_id, r.lang, r.n_chars, len(r.text.split(" ")),
             int(hashlib.md5(str(r.doc_id).encode()).hexdigest()[:8], 16)
             % CONF_SPLITS) for r in rows]
    tr = [(x, y) for _, _, x, y, sp in data if sp in (0, 1)]
    n = len(tr)
    sx = sum(x for x, _ in tr); sy = sum(y for _, y in tr)
    sxx = sum(x * x for x, _ in tr); sxy = sum(x * y for x, y in tr)
    b = float(n * sxy - sx * sy) / float(n * sxx - sx * sx)
    a = (float(sy) - b * float(sx)) / float(n)

    def score(x, y):
        return abs(float(y) - (a + b * float(x)))

    cal = sorted((score(x, y), did)
                 for did, _, x, y, sp in data if sp == 2)
    k = ((CONF_ALPHA_N - 1) * (len(cal) + 1) + (CONF_ALPHA_N - 1)) \
        // CONF_ALPHA_N
    qhat = cal[k - 1][0]

    want = {}
    for did, lang, x, y, sp in data:
        if sp != 3:
            continue
        nt, nc = want.get(lang, (0, 0))
        want[lang] = (nt + 1, nc + (1 if score(x, y) <= qhat else 0))
    expect = {(lang, nt, nc, nc * 1000 // nt,
               math.floor(qhat * 1_000_000 + 0.5))
              for lang, (nt, nc) in want.items()}

    got = {(r.lang, r.n_test, r.n_covered, r.coverage_permille,
            r.q_hat_e6)
           for r in queries()["eval_conformal_coverage"](
               spark, sf_small).collect()}
    assert got == expect and got


def test_conformal_marginal_coverage_guarantee(spark, sf_medium):
    """Aggregate (marginal) coverage must sit near the 1 - alpha
    target: >= 85% observed at sf0.01 (the finite-sample guarantee is
    >= 90% in expectation over splits; this pins the realized draw)."""
    from __spark_entry__ import queries

    rows = queries()["eval_conformal_coverage"](
        spark, sf_medium).collect()
    n = sum(r.n_test for r in rows)
    c = sum(r.n_covered for r in rows)
    assert n > 0 and c * 1000 // n >= 850


def test_psi_drift_matches_python_replica(spark, sf_small):
    """From-scratch Python PSI: same midpoint split, same reference
    deciles + clamping, same add-1 smoothing, same deterministic-ln
    quantized sum."""
    import math

    from go_mapreduce_crawler_spark.operators.features import (PSI_ALERT_E9,
                                                               PSI_BUCKETS)
    from go_mapreduce_crawler_spark.operators.text import _ln_det_py
    from go_mapreduce_crawler_spark.sources.tables import load_table
    from __spark_entry__ import queries

    rows = (load_table(spark, sf_small, "events")
            .select("event_type", F.unix_micros("ts").alias("us"), "value")
            .collect())
    data = [(r.event_type, r.us, math.floor(r.value * 100 + 0.5))
            for r in rows]
    lo = min(u for _, u, _ in data); hi = max(u for _, u, _ in data)
    mid = lo + (hi - lo) // 2

    expect = set()
    for et in {t for t, _, _ in data}:
        ref = [c for t, u, c in data if t == et and u < mid]
        cur = [c for t, u, c in data if t == et and u >= mid]
        if not ref:
            continue
        lo_c, hi_c, w = min(ref), max(ref), max(ref) - min(ref) + 1

        def bucket(c):
            return min(PSI_BUCKETS - 1,
                       max(0, ((c - lo_c) * PSI_BUCKETS) // w))

        cp = [0] * PSI_BUCKETS; cq = [0] * PSI_BUCKETS
        for c in ref:
            cp[bucket(c)] += 1
        for c in cur:
            cq[bucket(c)] += 1
        tps, tqs = len(ref) + PSI_BUCKETS, len(cur) + PSI_BUCKETS
        psi = 0
        for b in range(PSI_BUCKETS):
            cps, cqs = cp[b] + 1, cq[b] + 1
            diff = cps / tps - cqs / tqs
            lnr = ((_ln_det_py(cps) + _ln_det_py(tqs))
                   - (_ln_det_py(cqs) + _ln_det_py(tps)))
            psi += math.floor(diff * lnr * 1e9 + 0.5)
        expect.add((et, len(ref), len(cur), psi,
                    1 if psi >= PSI_ALERT_E9 else 0))

    got = {(r.event_type, r.n_ref, r.n_cur, r.psi_e9, r.drifted)
           for r in queries()["feat_psi_drift"](spark, sf_small).collect()}
    assert got == expect and got


def test_psi_drift_zero_on_identical_halves(spark, sf_small):
    """Property: PSI of a distribution against itself is ~0 — feeding
    the SAME rows as both halves (every ref row duplicated into the
    current window) must score psi_e9 == 0 exactly for every type
    (identical smoothed bucket masses => every contribution is
    floor(0 * lnr + 0.5) = 0)."""
    import math

    from go_mapreduce_crawler_spark.operators.features import PSI_BUCKETS
    from go_mapreduce_crawler_spark.operators.text import _ln_det_py
    from go_mapreduce_crawler_spark.sources.tables import load_table

    rows = (load_table(spark, sf_small, "events")
            .select("event_type", "value").collect())
    for et in {r.event_type for r in rows}:
        vals = [math.floor(r.value * 100 + 0.5)
                for r in rows if r.event_type == et]
        lo_c, w = min(vals), max(vals) - min(vals) + 1
        cp = [0] * PSI_BUCKETS
        for c in vals:
            cp[min(PSI_BUCKETS - 1,
                   max(0, ((c - lo_c) * PSI_BUCKETS) // w))] += 1
        tps = len(vals) + PSI_BUCKETS
        psi = 0
        for b in range(PSI_BUCKETS):
            cps = cp[b] + 1
            diff = cps / tps - cps / tps
            lnr = ((_ln_det_py(cps) + _ln_det_py(tps))
                   - (_ln_det_py(cps) + _ln_det_py(tps)))
            psi += math.floor(diff * lnr * 1e9 + 0.5)
        assert psi == 0


def test_bucketed_join_plan_is_shuffle_free(spark, sf_small):
    """The layout claim of sink_bucketed_join: SortMergeJoin over two
    bucketed scans with ZERO Exchange on the join keys — the only
    exchange in the plan is the final tiny per-priority aggregate."""
    import re

    from __spark_entry__ import queries

    df = queries()["sink_bucketed_join"](spark, sf_small)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert plan.count("Bucketed: true") == 2
    exchanges = re.findall(r"Exchange hashpartitioning\(([^,]+)", plan)
    assert all("orderpriority" in e for e in exchanges), exchanges

    # layout must never change results: same rows as the plain join
    from go_mapreduce_crawler_spark.operators.maintenance import MONEY
    from go_mapreduce_crawler_spark.sources.tables import load_table
    from go_mapreduce_crawler_spark.functions.exact import dec

    o = load_table(spark, sf_small, "orders")
    l = load_table(spark, sf_small, "lineitem")
    want = {(r.o_orderpriority, r.n_items, r.revenue)
            for r in (o.join(l, F.col("o_orderkey") == F.col("l_orderkey"))
                      .groupBy("o_orderpriority")
                      .agg(F.count(F.lit(1)).alias("n_items"),
                           F.sum(dec("l_extendedprice", MONEY))
                           .cast("double").alias("revenue"))).collect()}
    got = {(r.o_orderpriority, r.n_items, r.revenue)
           for r in df.collect()}
    assert got == want and got


def test_stream_psi_drift_equals_batch_op(spark, sf_small):
    """The streaming PSI monitor (frozen reference bins + streamed
    current-window cell counts through the count-monoid state) must
    equal the batch recomputation row-for-row — the deploy-time
    contract of ingest-time drift monitoring."""
    from __spark_entry__ import queries

    q = queries()
    got = {tuple(r) for r in
           q["stream_psi_drift_replay"](spark, sf_small).collect()}
    want = {tuple(r) for r in
            q["feat_psi_drift"](spark, sf_small).collect()}
    assert got == want and got


def test_graph_modularity_matches_python_replica(spark, sf_small):
    """From-scratch Python modularity over the same strong co-purchase
    graph + LPA labels: same exact integer floor-divisions, and the
    total Q must land in the valid [-0.5, 1] range."""
    from collections import Counter, defaultdict

    from go_mapreduce_crawler_spark.operators.graph import (MOD_E9,
                                                            LPA_ITERS,
                                                            _items,
                                                            _pair_counts)
    from __spark_entry__ import queries

    edges = [(r.pa, r.pb) for r in _pair_counts(
        _items(spark, sf_small)).select("pa", "pb").collect()]
    m = len(edges)

    # python LPA replica (most-frequent neighbor label, ties smallest)
    adj = defaultdict(list)
    for a, b in edges:
        adj[a].append(b)
        adj[b].append(a)
    lab = {v: v for v in adj}
    for _ in range(LPA_ITERS):
        nxt = {}
        for v in adj:
            cnt = Counter(lab[u] for u in adj[v])
            best = max(cnt.items(), key=lambda kv: (kv[1], -kv[0]))
            nxt[v] = best[0]
        lab = nxt

    e_c = Counter()
    for a, b in edges:
        if lab[a] == lab[b]:
            e_c[lab[a]] += 1
    d_c = Counter(); n_c = Counter()
    deg = Counter()
    for a, b in edges:
        deg[a] += 1; deg[b] += 1
    for v in adj:
        d_c[lab[v]] += deg[v]
        n_c[lab[v]] += 1
    expect = {(c, n_c[c], d_c[c], e_c.get(c, 0),
               (e_c.get(c, 0) * MOD_E9) // m
               - (d_c[c] * d_c[c] * MOD_E9) // (4 * m * m))
              for c in n_c}

    rows = queries()["graph_modularity_score"](spark, sf_small).collect()
    got = {(r.label, r.n_nodes, r.d_sum, r.e_intra, r.q_e9) for r in rows}
    assert got == expect and got
    q_total = sum(r.q_e9 for r in rows) / MOD_E9
    assert -0.5 <= q_total <= 1.0
