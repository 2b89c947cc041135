"""Ground-truth / property tests for the r10 additions: the
ANN-backed hybrid retrieval (r09 verdict item 4) and its scale-path
plan pin.  (The streaming bloom decontamination replay's parity test
lives with its family in tests/test_streaming.py; the CEP skew bound
in tests/test_skew.py.)
"""

from __future__ import annotations

import re
from collections import defaultdict

from go_mapreduce_crawler_spark.operators import similarity


def _topk_sets(df, qcol, dcol):
    out = defaultdict(set)
    for r in df.collect():
        out[r[qcol]].add(r[dcol])
    return out


def test_hybrid_ivf_recall_vs_exact_hybrid(spark, sf_medium):
    """The IVF-backed hybrid must recover >= 70% of the exact hybrid's
    fused top-10 per query on average (the dense arm's 6-of-16 probes
    lose some exact-kNN candidates; the shared lexical arm and the
    RRF favoring both-arm candidates buy most of them back —
    measured 0.88 mean / 0.70 min at sf0.01)."""
    ex = _topk_sets(similarity.q_hybrid_retrieval_rrf(spark, sf_medium),
                    "q_doc", "doc_id")
    ap = _topk_sets(
        similarity.q_hybrid_retrieval_rrf_ivf(spark, sf_medium),
        "q_doc", "doc_id")
    assert set(ex) == set(ap)        # every seed query answered
    recalls = [len(ex[q] & ap[q]) / len(ex[q]) for q in ex]
    assert sum(recalls) / len(recalls) >= 0.7, recalls


def test_hybrid_ivf_plan_has_no_q_times_n_join(spark, sf_medium):
    """The scale pin the IVF variant exists for: the exact hybrid's
    dense arm scores |Q| x |corpus| pairs through a
    BroadcastNestedLoopJoin conditioned only on vec_id <> q_id; the
    IVF arm must plan the candidate join as an EQUI join on the cell
    key (BroadcastHashJoin), leaving only the unconditional one-row
    scalar cross-attaches as nested loops."""
    qn_join = re.compile(r"NestedLoopJoin.*NOT \(vec_id")
    plan_ex = (similarity.q_hybrid_retrieval_rrf(spark, sf_medium)
               ._jdf.queryExecution().executedPlan().toString())
    plan_ivf = (similarity.q_hybrid_retrieval_rrf_ivf(spark, sf_medium)
                ._jdf.queryExecution().executedPlan().toString())
    assert qn_join.search(plan_ex)          # the shape being avoided
    assert not qn_join.search(plan_ivf)     # ... is absent from IVF
    assert "CartesianProduct" not in plan_ivf


def test_rrf_both_arm_dominance(spark, sf_medium):
    """RRF invariant (shared with the exact hybrid, re-pinned on the
    IVF form): a candidate in BOTH arms' top-k strictly dominates any
    single-arm candidate — 2*floor(1e9/(60+10)) > floor(1e9/61)."""
    rows = similarity.q_hybrid_retrieval_rrf_ivf(
        spark, sf_medium).collect()
    both = [r for r in rows
            if r.lex_rk is not None and r.dense_rk is not None]
    single = [r for r in rows
              if r.lex_rk is None or r.dense_rk is None]
    if both and single:
        assert min(r.rrf_e9 for r in both) > max(
            r.rrf_e9 for r in single)


def test_pipeline_rag_index_matches_python_replica(spark, sf_small):
    """Full independent Python fold of the RAG index e2e chain
    (chunk -> hashed-3-gram projection -> IVF assign -> doc-vector
    probe -> integer-dot top-k -> doc->own-chunk NDCG@10) at sf0.001
    — same ground truth, no SQL in the reference path."""
    import hashlib
    from collections import defaultdict

    rows = (spark.read.parquet(f"{sf_small}/documents.parquet")
            .select("doc_id", "text").collect())

    def h32(s, lo, hi):
        return int(hashlib.md5(s.encode()).hexdigest()[lo:hi], 16)

    D, C, P, K, QM = (similarity.RAG_DIMS, similarity.RAG_CELLS,
                      similarity.RAG_PROBES, similarity.NDCG_K,
                      similarity.RAG_QMOD)
    vecs = {}
    for r in rows:
        text = r.text
        for ci, start in enumerate(range(0, max(len(text), 1), 400)):
            sub = text[start:start + 500]
            w = sub.split(" ")
            v = [0] * D
            for i in range(len(w) - 2):
                g = " ".join(w[i:i + 3])
                v[h32(g, 0, 8) % D] += h32(g, 8, 16) % 2001 - 1000
            vecs[(r.doc_id, ci)] = v
    order = sorted(vecs)
    cents = [vecs[k] for k in order[:C]]

    def dot(a, b):
        return sum(x * y for x, y in zip(a, b))

    def ranked_cells(v):
        return sorted(range(C), key=lambda c: (-dot(v, cents[c]), -c))

    assign = {k: ranked_cells(v)[0] for k, v in vecs.items()}
    docv, n_chunks = defaultdict(lambda: [0] * D), defaultdict(int)
    for (d, _), v in vecs.items():
        n_chunks[d] += 1
        for j in range(D):
            docv[d][j] += v[j]
    W_ = similarity.NDCG_W
    PRE = similarity.NDCG_PREFIX
    want = {}
    for d, dv in docv.items():
        if d % QM != 0:
            continue
        probes = set(ranked_cells(dv)[:P])
        cand = [k for k in vecs if assign[k] in probes]
        cand.sort(key=lambda k: (-dot(dv, vecs[k]), k[0], k[1]))
        top = cand[:K]
        rel = [1 if k[0] == d else 0 for k in top]
        dcg = sum(W_[i] * rel[i] for i in range(len(top)))
        idcg = PRE[min(n_chunks[d], K)]
        want[d] = (sum(rel), n_chunks[d], dcg, idcg,
                   dcg * 1_000_000 // idcg if idcg > 0 else 0)
    got = {r.q_doc: (r.n_rel_topk, r.r_total, r.dcg_w, r.idcg_w,
                     r.ndcg_ppm)
           for r in similarity.q_pipeline_rag_index(
               spark, sf_small).collect()}
    assert got == want and got
    # non-vacuous BOTH ways: most queries retrieve their own chunks
    # at top (the self-retrieval signal is real), and at least one
    # query shows an IVF probe miss or impostor (the readout
    # discriminates — it is not identically 1e6)
    hits = [v for v in want.values() if v[0] > 0]
    assert len(hits) >= len(want) * 2 // 3, (len(hits), len(want))
    assert any(v[4] < 1_000_000 for v in want.values())


def test_ivf_probe_sweep_advisor_properties(spark, sf_medium):
    """The sweep must be a real recall/cost frontier: recall and
    candidate cost monotone in nprobe, chosen = min point clearing
    the floor (else max), and the nprobe=6 row must agree with an
    independent intersection of ann_ivf_cosine (which runs at
    IVF_PROBES=6) against the exact kNN."""
    from collections import defaultdict

    rows = [q.asDict() for q in similarity.q_ivf_probe_sweep(
        spark, sf_medium).collect()]
    rows.sort(key=lambda r: r["nprobe"])
    assert [r["nprobe"] for r in rows] == list(similarity.IVF_ADV_PROBES)
    rec = [r["recall_ppm"] for r in rows]
    cand = [r["cand_pairs"] for r in rows]
    assert rec == sorted(rec)                    # recall monotone
    assert cand == sorted(cand) and len(set(cand)) == len(cand)
    meeting = [r["nprobe"] for r in rows
               if r["recall_ppm"] >= similarity.IVF_ADV_RECALL_FLOOR_PPM]
    want_chosen = min(meeting) if meeting else rows[-1]["nprobe"]
    assert [r["nprobe"] for r in rows if r["chosen"]] == [want_chosen]

    ex, ap = defaultdict(set), defaultdict(set)
    for r in similarity.q_knn_bruteforce(spark, sf_medium).collect():
        ex[r.q_id].add(r.neighbor_id)
    for r in similarity.q_ann_ivf(spark, sf_medium).collect():
        ap[r.q_id].add(r.neighbor_id)
    hits6 = sum(len(ex[q] & ap[q]) for q in ex)
    row6 = next(r for r in rows if r["nprobe"] == similarity.IVF_PROBES)
    assert row6["sum_hits"] == hits6
    assert row6["n_queries"] == len(ex)


def test_prf_expansion_properties(spark, sf_medium):
    """PRF must (a) answer every round-1 query, (b) rank by summed
    BM25 with deterministic ties (rk dense 1..10 per query), and
    (c) actually do its job — at least one query surfaces a document
    the original terms missed (r1_rk NULL), the recall the technique
    exists to buy."""
    from collections import defaultdict

    rows = similarity.q_retrieval_prf_expansion(
        spark, sf_medium).collect()
    by_q = defaultdict(list)
    for r in rows:
        by_q[r.q_doc].append(r)
    r1 = _topk_sets(similarity._lex_bm25_topk(spark, sf_medium),
                    "q_doc", "doc_id")
    assert set(by_q) == set(r1)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r.rk)
        assert [r.rk for r in rs] == list(range(1, len(rs) + 1))
        scores = [r.score_e6 for r in rs]
        assert scores == sorted(scores, reverse=True)
        # r1_rk agrees with the independent round-1 run
        for r in rs:
            assert (r.r1_rk is not None) == (r.doc_id in r1[q])
    assert any(r.r1_rk is None for r in rows)


def test_sink_partitioned_pruning_plan(spark, sf_small):
    """The partitioned-lake op's read must PRUNE: the scan's partition
    filters carry the lang predicate and no lang filter remains as a
    post-scan data filter (at 100 TB this is scanning one language
    directory vs the lake).  Also: the partition column round-trips
    out of the directory name with every value intact."""
    from pyspark.sql import functions as F

    from go_mapreduce_crawler_spark.operators.maintenance import (
        _session_tmp, q_sink_partitioned_pruning)

    q_sink_partitioned_pruning(spark, sf_small).collect()  # write side
    out = _session_tmp(spark, "partlang", sf_small)
    back = spark.read.parquet(out).filter(F.col("lang") == "en")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    import re
    pf = re.search(r"PartitionFilters: \[([^\]]*)\]", plan).group(1)
    assert "lang" in pf                      # pruned at the directory
    pushed = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    assert pushed is None or "lang" not in pushed.group(1)
    langs_back = {r.lang for r in
                  spark.read.parquet(out).select("lang").distinct()
                  .collect()}
    langs_src = {r.lang for r in
                 spark.read.parquet(f"{sf_small}/documents.parquet")
                 .select("lang").distinct().collect()}
    assert langs_back == langs_src


def test_stream_cdc_merge_replay_matches_batch(spark, sf_small):
    """The streamed per-key CDC winner must equal the batch MERGE
    exactly (max-struct is an idempotent commutative monoid over any
    batching), including delete suppression and insert keys."""
    from go_mapreduce_crawler_spark.operators.maintenance import (
        q_cdc_merge_apply)
    from go_mapreduce_crawler_spark.operators.streaming_replay import (
        q_stream_cdc_merge_replay)

    got = {(r.o_orderkey, r.price, r.status, r.src)
           for r in q_stream_cdc_merge_replay(spark, sf_small).collect()}
    want = {(r.o_orderkey, r.price, r.status, r.src)
            for r in q_cdc_merge_apply(spark, sf_small).collect()}
    assert got == want and got
    # the stress is non-vacuous: inserts present, and every
    # UNCONTESTED delete (k % 7 == 0 with no competing same-seq U at
    # % 5 or seq-2 U at % 15) is suppressed
    keys = {k for k, *_ in got}
    assert any(k >= 1_000_000_000_000 for k in keys)
    base = {r.o_orderkey for r in spark.read.parquet(
        f"{sf_small}/orders.parquet").select("o_orderkey").collect()}
    plain_deleted = [k for k in base
                     if k % 7 == 0 and k % 5 != 0 and k % 15 != 0]
    assert plain_deleted and not (set(plain_deleted) & keys)
