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
