"""User-behavior analytics over ``events`` — funnel, cohort retention,
transition matrix, event-mix entropy.

The reference engine has no multi-event sequencing surface at all (its
only aggregate is the user-supplied monoid fold, pool.go:8-12,
crawler.go:32); these are the standard product-analytics operators a
pipeline engine is expected to provide over an event log.

Scale notes (100 TB event log):
- Everything here shuffles on ``user_id`` exactly once (funnel /
  retention / entropy) or once for the window + once for a tiny
  re-agg (transitions).  Per-user state is bounded by that user's
  event count, never by the table.
- The funnel is a chain of conditional min-aggs over (user_id, ts)
  pairs — constant per-user aggregation state, monotonically
  shrinking frontier joins — NOT a per-user collect_list fold (a
  celebrity user with 10^7 events would hold its whole history in
  one aggregation buffer) and NOT an N-way self-join of full rows.
- Retention re-uses the user_id partitioning for the first-seen join
  (AQE plans it shuffle-free on the agg side), then re-aggregates to
  |cohorts| x |weeks| rows.
"""

from __future__ import annotations

import re as _re

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..functions.exact import dec, ts_day
from ..sources.tables import load_table

FUNNEL_STAGES = ("signup", "view", "click", "purchase")


def q_funnel_conversion(spark, sf_dir):
    """Ordered conversion funnel signup -> view -> click -> purchase.

    Semantics: stage k is reached at the earliest event of its type
    STRICTLY after the stage k-1 timestamp (first stage: earliest
    signup).  Strict ``>`` makes the result independent of tie order
    inside equal timestamps.

    Celebrity-safe by construction (r03-verdict fix, mirroring the
    pagerank hash-sum rewrite): computed as CHAINED CONDITIONAL
    MIN-AGGS — stage k is one partial+final min over (user_id, ts)
    pairs joined to the shrinking stage-(k-1) frontier — never a
    per-user ``collect_list`` of the event history.  A bot account
    with 10^7 events costs 10^7 tiny (user, ts) shuffle records that
    map-side-combine to ONE row per stage, not a single 10^7-element
    array in one aggregation buffer.  Per-user state is O(1); the
    frontier joins shrink monotonically.  Pinned by
    tests/test_plans.py::test_funnel_has_no_collect_list.
    """
    e = (load_table(spark, sf_dir, "events")
         .filter(F.col("event_type").isin(*FUNNEL_STAGES))
         .select("user_id", "ts", "event_type"))
    # Frontier chain: r[k] = (user_id, t{k}) for users who reached
    # stage k.  Each step is a join on user_id (frontier side shrinks)
    # + one conditional min agg — the exact algorithm the DuckDB oracle
    # states, so the two constructions are the same by design now; the
    # cross-check is in the old-fold-vs-chain pin in tests.
    frontier = (e.filter(F.col("event_type") == FUNNEL_STAGES[0])
                 .groupBy("user_id").agg(F.min("ts").alias("t1")))
    stages = [frontier]
    for i, stage in enumerate(FUNNEL_STAGES[1:], start=2):
        prev = stages[-1].select("user_id", F.col(f"t{i-1}").alias("_prev"))
        nxt = (e.filter(F.col("event_type") == stage)
                .join(prev, "user_id")
                .filter(F.col("ts") > F.col("_prev"))
                .groupBy("user_id").agg(F.min("ts").alias(f"t{i}")))
        stages.append(nxt)
    wide = stages[0]
    for nxt in stages[1:]:
        wide = wide.join(nxt, "user_id", "left")
    counts = wide.agg(*[F.count(f"t{i}").alias(stage)
                        for i, stage in enumerate(FUNNEL_STAGES, 1)])
    return (counts.select(F.explode(F.array(*[
                F.struct(F.lit(i).alias("stage_ord"),
                         F.lit(stage).alias("stage"),
                         F.col(stage).alias("users"))
                for i, stage in enumerate(FUNNEL_STAGES, 1)])).alias("r"))
             .select("r.*"))


def q_cohort_retention(spark, sf_dir):
    """Weekly cohort retention: users bucketed by the Monday week of
    their first event; distinct active users per (cohort, week offset).

    first-seen is a per-user min (partial+final agg); the join back is
    on the same key so the big side needs no extra exchange; the final
    agg is |cohorts| x |offsets| rows.
    """
    e = load_table(spark, sf_dir, "events").select("user_id", "ts")
    firsts = e.groupBy("user_id").agg(F.min("ts").alias("first_ts"))
    # Monday-start weeks as tz-free integer arithmetic (epoch day 4 =
    # 1970-01-05, a Monday): date_trunc("week", ...) renders in the
    # SESSION timezone and shifts buckets on a non-UTC driver.  The
    # cohort bucket leaves the engine as an ISO date STRING: pandas
    # materializes Spark timestamps as ns, DuckDB's as us, and Spark
    # dates as object — a temporal column hash-mismatches on dtype
    # alone, while yyyy-MM-dd renders identically in both engines
    # (date_from_unix_date is pure arithmetic, no timezone).
    fday = ts_day("first_ts")
    cw = fday - F.pmod(fday - F.lit(4), F.lit(7))
    eday = ts_day("ts")
    ew = eday - F.pmod(eday - F.lit(4), F.lit(7))
    return (e.join(firsts, "user_id")
             .groupBy(F.date_from_unix_date(cw).cast("string")
                       .alias("cohort_week"),
                      ((ew - cw) / 7).cast("int").alias("week_offset"))
             .agg(F.countDistinct("user_id").alias("users")))


def q_markov_transitions(spark, sf_dir):
    """First-order Markov transition matrix of event types per user:
    count and conditional probability of each (prev -> next) pair,
    ordered by (ts, event_id) within user.

    One window shuffle on user_id does the sequencing; the transition
    counts are a partial+final agg down to |types|^2 rows, and the
    row-probability normalization is a window over that tiny result.
    Probability is emitted as floor(p * 1e6) fixed-point — portable
    across engines' round() tie rules.
    """
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    t = (e.select("user_id", "ts", "event_id", "event_type")
          .withColumn("prev_type", F.lag("event_type").over(w))
          .filter(F.col("prev_type").isNotNull())
          .groupBy("prev_type", F.col("event_type").alias("next_type"))
          .agg(F.count(F.lit(1)).alias("n")))
    total = F.sum("n").over(W.partitionBy("prev_type"))
    return t.select("prev_type", "next_type", "n",
                    F.floor(F.col("n") / total * 1e6)
                     .cast("long").alias("p_ppm"))


MKV_SCALE = 10**12      # fixed-point scale for the stationary vector
MKV_ITERS = 5


def q_markov_stationary(spark, sf_dir):
    """Stationary distribution of the event-type Markov chain by POWER
    ITERATION — where user behavior settles long-run (the steady-state
    share of each event type), the quantity capacity planning and
    behavioral-drift monitors track on top of q_markov_transitions'
    one-step matrix.

    Integer fixed-point end to end (the pagerank quantize-sum-
    dequantize recipe): pi lives at 1e12 scale; each edge contribution
    is (pi_i * n_ij) DIV tot_i — quantized per edge BEFORE the sum, so
    the result is addition-order-independent and both engines agree
    bit-for-bit through all {it} unrolled iterations.  The matrix is a
    |types|^2 relation (one window shuffle on user_id to sequence,
    partial+final agg down); each iteration is a tiny join — at 100 TB
    the chain state never exceeds |types| rows regardless of event
    volume.  Oracle: the same {it} iterations as an unrolled CTE chain.
    """.format(it=MKV_ITERS)
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    t = (e.select("user_id", "ts", "event_id", "event_type")
          .withColumn("prev_type", F.lag("event_type").over(w))
          .filter(F.col("prev_type").isNotNull())
          .groupBy("prev_type", F.col("event_type").alias("next_type"))
          .agg(F.count(F.lit(1)).alias("n")))
    tot = t.groupBy("prev_type").agg(F.sum("n").alias("tot"))
    t = t.join(tot, "prev_type").cache()
    ntypes = (t.select(F.col("prev_type").alias("s")).distinct()
              .agg(F.count(F.lit(1)).alias("k")))
    pi = (t.select(F.col("prev_type").alias("s")).distinct()
          .crossJoin(F.broadcast(ntypes))
          .select("s", F.expr(f"CAST({MKV_SCALE} DIV k AS BIGINT)")
                  .alias("pi")))
    for _ in range(MKV_ITERS):
        pi = (t.join(pi, t.prev_type == pi.s)
              .select(F.col("next_type").alias("s2"),
                      F.expr("CAST((CAST(pi AS DECIMAL(38,0)) * n) DIV tot"
                             " AS BIGINT)")
                       .alias("c"))
              .groupBy(F.col("s2").alias("s"))
              .agg(F.sum("c").alias("pi")))
    return pi.select(F.col("s").alias("event_type"),
                     F.col("pi").alias("pi_e12"))


def q_entropy_event_mix(spark, sf_dir):
    """Shannon entropy (bits) of each user's event-type mix — a
    behavioral-diversity score.  Two cascading partial+final aggs:
    (user, type) counts, then the entropy fold per user.

    log2 of small rationals is bit-identical across engines for the
    SAME expression shape (IEEE divide + libm log2 on identical
    doubles); emitted as floor(H * 1e6) fixed-point so the hash
    compare never hits a rounding tie.
    """
    e = load_table(spark, sf_dir, "events")
    c = (e.groupBy("user_id", "event_type")
          .agg(F.count(F.lit(1)).alias("c")))
    tot = c.groupBy("user_id").agg(F.sum("c").alias("n_total"))
    p = F.col("c") / F.col("n_total")
    return (c.join(tot, "user_id")
             .groupBy("user_id", "n_total")
             .agg(F.floor(-F.sum(p * F.log2(p)) * 1e6)
                   .cast("long").alias("h_ppm"))
             .select("user_id",
                     F.col("n_total").alias("n_events"), "h_ppm"))


RFM_B = 5   # quintiles


def q_rfm_segmentation(spark, sf_dir):
    """RFM (recency / frequency / monetary) customer segmentation over
    orders: per customer the three raw metrics plus their quintile
    scores (1..5 by value; low recency-days = recently active = score
    1) and the combined RFM code — the classic retention-marketing
    segmentation.

    Quintile boundaries use the integer rank rule b_k = min v with
    5*cum >= k*n over the COMPACTED (value, cnt) relation (the
    median-family recipe — no raw-row NTILE, no tie-break dependence:
    equal values always share a score), collected into one 4-element
    array row per metric and cross-joined back broadcast, so scoring
    is a row-local array count.  Customer aggregation is one
    partial+final agg; everything after runs on |customers| rows.
    """
    o = load_table(spark, sf_dir, "orders")
    maxd = o.agg(F.max("o_orderdate").alias("maxd"))
    c = (o.crossJoin(F.broadcast(maxd))
          .groupBy("o_custkey")
          .agg(F.min(F.datediff("maxd", "o_orderdate")).alias("r_days"),
               F.count(F.lit(1)).alias("f_orders"),
               F.sum(dec("o_totalprice", "decimal(12,2)")).alias("m_total")))

    def thresholds(col):
        vc = c.groupBy(F.col(col).alias("v")).agg(F.count(F.lit(1)).alias("cnt"))
        cum = vc.select(
            "v", F.sum("cnt").over(W.orderBy("v").rowsBetween(
                W.unboundedPreceding, W.currentRow)).alias("cum"),
            F.sum("cnt").over(W.partitionBy()).alias("n"))
        b = (cum.crossJoin(F.broadcast(
                 spark.range(1, RFM_B).select(F.col("id").alias("k"))))
                .filter(F.col("cum") * RFM_B >= F.col("k") * F.col("n"))
                .groupBy("k").agg(F.min("v").alias("b")))
        return b.agg(F.array_sort(F.collect_list("b")).alias(f"thr_{col}"))

    scored = (c.crossJoin(F.broadcast(thresholds("r_days")))
               .crossJoin(F.broadcast(thresholds("f_orders")))
               .crossJoin(F.broadcast(thresholds("m_total"))))
    def score(col):
        return (F.lit(1) + F.size(F.filter(
            F.col(f"thr_{col}"), lambda t: t < F.col(col)))).cast("int")
    return scored.select(
        "o_custkey", "r_days", "f_orders",
        F.col("m_total").cast("double").alias("m_total"),
        score("r_days").alias("r_score"),
        score("f_orders").alias("f_score"),
        score("m_total").alias("m_score"),
        (score("r_days") * 100 + score("f_orders") * 10
         + score("m_total")).alias("rfm"))


ATTR_WINDOW_US = 7 * 86_400_000_000


def q_attribution_last_touch(spark, sf_dir):
    """Last-touch attribution: each purchase credits the user's most
    recent preceding view/click within 7 days — the standard marketing
    attribution join.

    ONE shuffle on user_id, O(1) window state: a running last-non-null
    over the totally ordered (us, event_id) event stream carries the
    latest touch's (us, id, type) forward; purchase rows read it and
    the 7-day recency filter applies after.  No per-user buffering, no
    self-join fan-out — the same constant-state shape as the funnel's
    chained min-aggs.  Three parallel last(ignorenulls) columns share
    one window frame (a struct-valued last would hit engine-specific
    struct ordering; three scalars from the SAME conditional are
    consistent by construction).  The oracle deliberately uses the
    opposite construction — a purchase x touch join with a rank-1 pick
    — so two independent formulations must agree.
    """
    e = load_table(spark, sf_dir, "events")
    base = e.select("event_id", "user_id", "event_type",
                    F.unix_micros("ts").alias("us"))
    is_touch = F.col("event_type").isin("view", "click")
    w = (W.partitionBy("user_id").orderBy("us", "event_id")
          .rowsBetween(W.unboundedPreceding, -1))
    lastc = [F.last(F.when(is_touch, F.col(c)), ignorenulls=True)
              .over(w).alias(f"touch_{a}")
             for c, a in (("us", "us"), ("event_id", "id"),
                          ("event_type", "type"))]
    attr = (base.select("event_id", "user_id", "event_type", "us", *lastc)
                .filter((F.col("event_type") == "purchase")
                        & F.col("touch_us").isNotNull()
                        & (F.col("touch_us") >= F.col("us") - ATTR_WINDOW_US)))
    return attr.select(
        "event_id", "user_id", F.col("us").alias("purchase_us"),
        F.col("touch_id").alias("touch_event_id"),
        F.col("touch_type").alias("touch_type"),
        "touch_us", (F.col("us") - F.col("touch_us")).alias("lag_us"))


def q_attribution_position(spark, sf_dir):
    """Position-based (U-shaped 40/20/40) attribution: every touch in
    the 7 days before a purchase gets credit — 40% to the first touch,
    40% to the last, the middle 20% split evenly across the rest
    (1 touch -> 100%, 2 touches -> 50/50) — last-touch's multi-credit
    sibling, and deliberately the OPPOSITE construction (purchase x
    touch join) so the two attribution operators cross-check the event
    stream two ways.

    The join key is (user_id, 7-day time bucket) with the purchase
    side exploding to its own and the preceding bucket — a 7-day
    lookback spans at most two buckets, and each touch carries exactly
    one bucket so no pair can match twice.  A ten-year bot history
    therefore never materializes against a purchase: only the +-1
    bucket neighborhood joins before the residual filter (the
    interval-join recipe of q_interval_overlap).  Per-purchase
    first/last/size come from one window over that bounded join result
    (partitioned by purchase event, never by user history).  Credits
    are exact integer ppm (floor division for the middle share), so
    every row hashes identically across engines; a consumer summing
    credit_ppm per purchase gets 1e6 minus only the floor remainder.
    """
    e = load_table(spark, sf_dir, "events")
    base = e.select("event_id", "user_id", "event_type",
                    F.unix_micros("ts").alias("us"))
    p = (base.filter(F.col("event_type") == "purchase")
             .select("user_id", F.col("event_id").alias("purchase_id"),
                     F.col("us").alias("pus"))
             .withColumn("wk", F.explode(F.array(
                 F.floor(F.col("pus") / ATTR_WINDOW_US) - 1,
                 F.floor(F.col("pus") / ATTR_WINDOW_US)))))
    t = (base.filter(F.col("event_type").isin("view", "click"))
             .select("user_id", F.col("event_id").alias("touch_id"),
                     F.col("event_type").alias("touch_type"),
                     F.col("us").alias("tus"))
             .withColumn("wk", F.floor(F.col("tus") / ATTR_WINDOW_US)))
    j = (p.join(t, ["user_id", "wk"])
          .filter((F.col("tus") < F.col("pus"))
                  & (F.col("tus") >= F.col("pus") - ATTR_WINDOW_US)))
    w = W.partitionBy("purchase_id").orderBy("tus", "touch_id")
    wall = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    r = (j.withColumn("pos", F.row_number().over(w))
          .withColumn("n", F.count(F.lit(1)).over(wall)))
    n = F.col("n")
    credit = (F.when(n == 1, F.lit(1_000_000))
               .when(n == 2, F.lit(500_000))
               .when(F.col("pos") == 1, F.lit(400_000))
               .when(F.col("pos") == n, F.lit(400_000))
               .otherwise(F.floor(200_000 / (n - 2))))
    return r.select("purchase_id", "user_id", "touch_id", "touch_type",
                    "pos", "n", credit.cast("long").alias("credit_ppm"))


FUNNEL_WINDOW_US = 72 * 3_600_000_000   # windowFunnel horizon


def q_funnel_windowed(spark, sf_dir):
    """Time-bounded conversion funnel (the ClickHouse ``windowFunnel``
    semantic): stage k counts only if it happens strictly after stage
    k-1 AND within 72 h of the user's FIRST signup — "did the user
    convert promptly", not "ever".

    Same celebrity-safe chained conditional min-agg construction as
    funnel_conversion (O(1) per-user aggregation state, shrinking
    frontier joins — never a collect_list of the history); the
    deadline t1 + 72h rides along the frontier as a column, so the
    added constraint costs zero extra shuffles.
    """
    e = (load_table(spark, sf_dir, "events")
         .filter(F.col("event_type").isin(*FUNNEL_STAGES))
         .select("user_id", F.unix_micros("ts").alias("us"), "event_type"))
    s1 = (e.filter(F.col("event_type") == FUNNEL_STAGES[0])
           .groupBy("user_id").agg(F.min("us").alias("t1")))
    s1 = s1.withColumn("dl", F.col("t1") + FUNNEL_WINDOW_US)
    stages = [s1]
    for i, stage in enumerate(FUNNEL_STAGES[1:], start=2):
        prev = stages[-1].select("user_id", F.col(f"t{i-1}").alias("_prev"),
                                 "dl")
        nxt = (e.filter(F.col("event_type") == stage)
                .join(prev, "user_id")
                .filter((F.col("us") > F.col("_prev"))
                        & (F.col("us") <= F.col("dl")))
                .groupBy("user_id", "dl").agg(F.min("us").alias(f"t{i}")))
        stages.append(nxt)
    rows = None
    for i, stage in enumerate(FUNNEL_STAGES, 1):
        r = stages[i - 1].agg(F.count(F.lit(1)).alias("users")).select(
            F.lit(i).alias("stage_ord"), F.lit(stage).alias("stage"),
            "users")
        rows = r if rows is None else rows.union(r)
    return rows


_FUNNEL_PCTS = (25, 50, 75, 90)


def q_funnel_latency_quantiles(spark, sf_dir):
    """Time-to-convert distribution: exact lower quantiles (p25/p50/
    p75/p90) of signup->purchase latency across fully-converting users
    — the "how fast do converters convert" companion to the stage
    counts.

    The latency relation is one row per converter (built by the same
    chained min-agg funnel); quantiles use the compacted
    (value, count) ranking of median_per_group — the window sorts
    |distinct latencies| rows, never events — and each requested
    percentile picks min(value | cum >= ceil(n*p/100)) with the rank
    arithmetic in exact integers.
    """
    e = (load_table(spark, sf_dir, "events")
         .filter(F.col("event_type").isin(*FUNNEL_STAGES))
         .select("user_id", F.unix_micros("ts").alias("us"), "event_type"))
    cur = (e.filter(F.col("event_type") == FUNNEL_STAGES[0])
            .groupBy("user_id").agg(F.min("us").alias("t1")))
    prev_col = "t1"
    for i, stage in enumerate(FUNNEL_STAGES[1:], start=2):
        prev = cur.select("user_id", F.col(prev_col).alias("_prev"),
                          F.col("t1").alias("t1_keep"))
        cur = (e.filter(F.col("event_type") == stage)
                .join(prev, "user_id")
                .filter(F.col("us") > F.col("_prev"))
                .groupBy("user_id", F.col("t1_keep").alias("t1"))
                .agg(F.min("us").alias(f"t{i}")))
        prev_col = f"t{i}"
    lat = cur.select((F.col("t4") - F.col("t1")).alias("latency_us"))
    cnts = lat.groupBy("latency_us").agg(F.count(F.lit(1)).alias("c"))
    w = W.orderBy("latency_us").rowsBetween(W.unboundedPreceding,
                                            W.currentRow)
    ranked = cnts.withColumn("cum", F.sum("c").over(w))
    n = lat.agg(F.count(F.lit(1)).alias("n"))
    rows = None
    for p in _FUNNEL_PCTS:
        tgt = F.expr(f"CAST(CEIL(n * {p} / 100.0) AS BIGINT)")
        r = (ranked.crossJoin(F.broadcast(n))
                   .filter(F.col("cum") >= tgt)
                   .agg(F.min("latency_us").alias("latency_us"))
                   # agg-over-empty yields one NULL row; the oracle's
                   # inner join yields zero — drop it so a converter-free
                   # replay emits 0 rows on both sides (ADVICE r04).
                   .filter(F.col("latency_us").isNotNull())
                   .select(F.lit(p).alias("pct"), "latency_us"))
        rows = r if rows is None else rows.union(r)
    return rows


def q_survival_kaplan_meier(spark, sf_dir):
    """Kaplan-Meier survival curve over the event log: per user,
    "failure" is the first 'error' event and the clock starts at the
    user's first event; users who never error are right-censored at
    their last observed day.  Output: one row per distinct duration
    with the risk-set size, failure count, and the cumulative KM
    log-survival — the churn/reliability curve, a family (survival
    analysis) none of the other statistics cover.

    Everything reduces to the compacted |distinct durations| relation:
    per-user (duration, event) is one agg, duration counts another,
    and the risk set is total minus a prefix sum over that tiny
    relation.  The product limit S(t) = prod(1 - d/n) leaves the
    engine in LOG domain as integer micro-nats via _ln_det
    (ln(n-d) - ln(n), quantized once per term, summed associatively —
    the unigram-LM determinism recipe), so no cross-engine libm or
    float-product-order hazard exists; consumers exp() it.  If a
    duration exhausts the risk set (n == d), survival is exactly 0 and
    the cumulative log is NULL from that point on (flagged, not
    -inf).

    r06 hardenings (the r05 driver hash-mismatch did not reproduce
    locally; all three suspect classes are closed defensively): the
    day index is tz-free integer arithmetic on unix micros (no
    session-timezone-sensitive to_date), the KM term is FLOOR-
    quantized (repo doctrine since the ewma fix — round() half-ties
    are engine bait), and the oracle BIGINT-casts its window-derived
    n_risk before it enters bin() (DuckDB window SUM is HUGEINT).
    """
    e = load_table(spark, sf_dir, "events")
    day = F.expr("CAST(unix_micros(ts) DIV 86400000000 AS INT)")
    per = (e.groupBy("user_id")
            .agg(F.min(day).alias("t0"),
                 F.min(F.when(F.col("event_type") == "error", day))
                  .alias("errd"),
                 F.max(day).alias("lastd")))
    dur = (per.select(
        F.coalesce(F.col("errd") - F.col("t0"),
                   F.col("lastd") - F.col("t0")).alias("duration_day"),
        F.col("errd").isNotNull().cast("int").alias("event")))
    cnts = (dur.groupBy("duration_day")
               .agg(F.count(F.lit(1)).alias("n_at"),
                    F.sum("event").alias("d")))
    total = cnts.agg(F.sum("n_at").alias("tot"))
    w_prev = W.orderBy("duration_day").rowsBetween(W.unboundedPreceding, -1)
    w_cum = W.orderBy("duration_day").rowsBetween(W.unboundedPreceding,
                                                  W.currentRow)
    from .text import _ln_det, _lit_spark
    term = ("CASE WHEN d = 0 THEN 0"
            " WHEN n_risk = d THEN NULL"
            f" ELSE CAST(floor(({_ln_det('(n_risk - d)', _lit_spark)}"
            f" - {_ln_det('n_risk', _lit_spark)}) * 1e6) AS BIGINT)"
            " END")
    base = (cnts.crossJoin(F.broadcast(total))
                .withColumn("n_risk",
                            F.col("tot") - F.coalesce(
                                F.sum("n_at").over(w_prev), F.lit(0)))
                .selectExpr("duration_day", "n_at", "d", "n_risk",
                            f"{term} AS term_e6"))
    died = F.max((F.col("term_e6").isNull()
                  & (F.col("d") > 0)).cast("int")).over(w_cum)
    cum = F.when(died == 1, F.lit(None))            .otherwise(F.sum("term_e6").over(w_cum))
    return base.select("duration_day", "n_risk",
                       F.col("d").alias("n_events"),
                       cum.cast("long").alias("cum_log_s_e6"))


def q_cohort_ltv_curve(spark, sf_dir):
    """Cohort LTV curves: customers grouped by the month of their first
    order; for each months-since-first offset, the cohort's revenue
    that month and the cumulative revenue per cohort customer — the
    payback-period chart next to cohort_retention's activity matrix.

    Months are integer month-since-epoch arithmetic (year*12 + month —
    no date intervals, no timezone).  first-order month is one
    partial+final agg joined back on the same key; the curve
    re-aggregates to |cohorts| x |offsets| rows and ONLY that tiny
    relation is windowed for the cumulative sum.  Revenue stays exact
    DECIMAL until the per-customer division.
    """
    o = load_table(spark, sf_dir, "orders")
    mse = (F.year("o_orderdate") * 12 + F.month("o_orderdate"))
    base = o.select("o_custkey", mse.alias("m"),
                    dec("o_totalprice", "decimal(12,2)").alias("v"))
    firsts = base.groupBy("o_custkey").agg(F.min("m").alias("m0"))
    sizes = firsts.groupBy("m0").agg(
        F.countDistinct("o_custkey").alias("n_customers"))
    cells = (base.join(firsts, "o_custkey")
                 .groupBy(F.col("m0").alias("cohort_m"),
                          (F.col("m") - F.col("m0")).alias("month_offset"))
                 .agg(F.sum("v").alias("rev")))
    w = (W.partitionBy("cohort_m").orderBy("month_offset")
          .rowsBetween(W.unboundedPreceding, W.currentRow))
    out = (cells.withColumn("cum", F.sum("rev").over(w))
                .join(F.broadcast(sizes.select(
                    F.col("m0").alias("cohort_m"), "n_customers")),
                    "cohort_m"))
    return out.select(
        "cohort_m", "month_offset", "n_customers",
        F.col("rev").cast("double").alias("revenue"),
        F.floor(F.col("cum").cast("double")
                / F.col("n_customers").cast("double") * 1e2)
         .cast("long").alias("cum_ltv_cents"))


MARKOV_ABSORB_ITERS = 8
MARKOV_CHANNELS = ("click", "error", "signup", "view")   # non-purchase


def _journey_transitions(spark, sf_dir):
    """(from_state, to_state, n) over all session journeys: START ->
    first channel, channel -> channel, channel -> CONV at the first
    purchase (journey ends there), last channel -> NULL if the session
    never converts.  One user_id window shuffle (the sessionize
    recipe), then a partial+final agg down to <= (|channels|+1)^2
    rows."""
    e = load_table(spark, sf_dir, "events")
    order = [F.col("ts"), F.col("event_id")]
    w_seq = W.partitionBy("user_id").orderBy(*order)
    gap = (F.unix_micros(F.col("ts"))
           - F.unix_micros(F.lag("ts", 1).over(w_seq)))
    sess = (e.withColumn("new_sess",
                         F.when(gap > 30 * 60 * 1_000_000, 1).otherwise(0))
             .withColumn("sid",
                         F.sum("new_sess").over(
                             w_seq.rowsBetween(W.unboundedPreceding,
                                               W.currentRow))))
    w_in = W.partitionBy("user_id", "sid").orderBy(*order)
    w_all = (W.partitionBy("user_id", "sid")
              .rowsBetween(W.unboundedPreceding, W.unboundedFollowing))
    rn = F.row_number().over(w_in)
    conv_rn = F.min(F.when(F.col("event_type") == "purchase",
                           F.col("rn"))).over(w_all)
    n_rows = F.count(F.lit(1)).over(w_all)
    j = (sess.withColumn("rn", rn)
             .withColumn("conv_rn", conv_rn)
             .withColumn("n_rows", n_rows)
             .filter(F.col("conv_rn").isNull()
                     | (F.col("rn") <= F.col("conv_rn")))
             .withColumn("state",
                         F.when(F.col("event_type") == "purchase",
                                F.lit("CONV"))
                          .otherwise(F.col("event_type"))))
    steps = (j.withColumn("prev",
                          F.coalesce(F.lag("state", 1).over(w_in),
                                     F.lit("START")))
              .select(F.col("prev").alias("s"),
                      F.col("state").alias("t")))
    last_rn = F.coalesce(F.col("conv_rn"), F.col("n_rows"))
    tails = (j.filter(F.col("conv_rn").isNull()
                      & (F.col("rn") == last_rn))
              .select(F.col("state").alias("s"), F.lit("NULL").alias("t")))
    return (steps.union(tails)
                 .groupBy("s", "t").agg(F.count(F.lit(1)).alias("n")))


def q_attribution_markov_removal(spark, sf_dir):
    """Markov removal-effect attribution — the data-driven alternative
    to last-touch/position rules: model session journeys as a Markov
    chain over channels with absorbing CONV/NULL states, compute the
    probability of converting within MARKOV_ABSORB_ITERS steps from
    START, then re-compute with each channel REMOVED (its inbound
    probability mass redirected to NULL — journeys through it fail);
    the channel's credit is 1 - p_removed/p_base (Anderl et al. 2014,
    the standard e-commerce attribution model no SQL dialect ships).

    Exactness: transition probabilities are IEEE ratios of exact
    counts in the same expression shape on both engines; every
    absorption iteration quantizes each p*v product to floor(x*1e15)
    longs and sums EXACTLY (the pagerank recipe), so after 8
    iterations x 5 scenarios the doubles still agree bit-for-bit.

    Scale: the journey extraction is the sessionize shuffle; the chain
    itself is a <= (|channels|+3)^2-row relation REPLICATED per
    scenario (base + one per removed channel) so ALL scenarios
    absorb in the SAME 8 tiny joins — scenario is a column, not a
    driver loop; at 100 TB the fact-table pass is one window + one
    agg, and the iterations are metadata-sized.
    """
    trans = _journey_transitions(spark, sf_dir).cache()
    tot = (trans.groupBy("s").agg(F.sum("n").alias("n_s")))
    base_p = (trans.join(tot, "s")
                   .select("s", "t", (F.col("n").cast("double")
                                      / F.col("n_s").cast("double"))
                           .alias("p")))
    scen = spark.createDataFrame(
        [("BASE",)] + [(c,) for c in MARKOV_CHANNELS],
        "removed string")
    # removal: drop the removed channel's outgoing rows; redirect its
    # inbound mass to NULL; merge parallel edges (at most 2 terms).
    redirected = (base_p.crossJoin(F.broadcast(scen))
                  .filter(F.col("s") != F.col("removed"))
                  .withColumn("t2",
                              F.when(F.col("t") == F.col("removed"),
                                     F.lit("NULL")).otherwise(F.col("t")))
                  .groupBy("removed", "s", "t2")
                  .agg(F.sum("p").alias("p"))
                  .withColumnRenamed("t2", "t")
                  .cache())
    v = (redirected.select("removed", F.col("s").alias("state"))
         .union(redirected.select("removed", F.col("t").alias("state")))
         .distinct()
         .select("removed", "state",
                 F.when(F.col("state") == "CONV", F.lit(1.0))
                  .otherwise(F.lit(0.0)).alias("v")))
    for _ in range(MARKOV_ABSORB_ITERS):
        nxt = (redirected.join(
                   v.select("removed", F.col("state").alias("t"), "v"),
                   ["removed", "t"])
               .select("removed", "s",
                       F.floor(F.col("p") * F.col("v") * F.lit(1e15))
                        .alias("pv_fp"))
               .groupBy("removed", F.col("s").alias("state"))
               .agg((F.sum("pv_fp").cast("double") / F.lit(1e15))
                    .alias("v")))
        # EAGER checkpoint, deliberately (r11-opt measured): v is
        # referenced TWICE per round (the join and the absorbing-state
        # union), and with eager=False AQE materializes independent
        # query stages concurrently — both branches can race to
        # compute the not-yet-persisted checkpoint, so the 8-level
        # chain re-executed whole prefixes (2.8 s -> 6.4 s in two full
        # bench runs; the single-reference loops in graph.py keep the
        # lazy form, where the same change measured 1.4-3.6x FASTER).
        v = (nxt.filter(~F.col("state").isin("CONV", "NULL"))
                .union(v.filter(F.col("state").isin("CONV", "NULL")))
                .localCheckpoint())
    starts = (v.filter(F.col("state") == "START")
               .select("removed", F.col("v").alias("p_conv")))
    base = (starts.filter(F.col("removed") == "BASE")
                  .select(F.col("p_conv").alias("p_base")))
    return (starts.filter(F.col("removed") != "BASE")
            .crossJoin(F.broadcast(base))
            .select(F.col("removed").alias("channel"),
                    F.floor(F.col("p_conv") * 1e9).cast("long")
                     .alias("p_removed_e9"),
                    F.floor(F.col("p_base") * 1e9).cast("long")
                     .alias("p_base_e9"),
                    F.floor((F.lit(1.0) - F.col("p_conv")
                             / F.col("p_base")) * 1e6).cast("long")
                     .alias("removal_effect_e6")))


DECAY_HALF_LIFE_DAYS = 7
DECAY_MAX_AGE_DAYS = 365
# floor(2^(-d/half_life) * 1e12), computed ONCE in Python and shared by
# both engines (Spark joins it broadcast; the DuckDB oracle inlines it
# as VALUES) — the repo's weight-table answer to libm pow not being a
# cross-engine contract.  Ages past the table decay to w < 1e-12*1e12
# = 0 anyway, so the left-join + COALESCE(w, 0) IS the true tail.
_DECAY_W = tuple(
    (d, int(2.0 ** (-d / float(DECAY_HALF_LIFE_DAYS)) * 1e12))
    for d in range(DECAY_MAX_AGE_DAYS + 1))


def q_decayed_engagement(spark, sf_dir):
    """Half-life-decayed engagement score per user: sum of event value
    weighted by 2^(-age_days/7), age measured from the corpus max day —
    the recency-weighted activity metric behind "active user" ranking
    (RFM's recency column made continuous).

    Exactness: value goes to integer CENTS, the decay weight is an
    integer from the shared 366-row table, so every term is one exact
    BIGINT multiply and the per-user fold is an order-independent
    DECIMAL(38,0) sum — floats appear exactly once, in the final
    floor(sum/1e12) descale of an identical exact input on both
    engines.  The corpus max day is an IN-PLAN broadcast aggregate
    (no driver collect), and the weight table joins broadcast, so the
    events table shuffles ONCE, on user_id, for the final agg.
    """
    e = load_table(spark, sf_dir, "events")
    day = ts_day()
    mx = e.agg(F.max(day).alias("max_day"))
    w = spark.createDataFrame(list(_DECAY_W), "age_d int, w_e12 long")
    cents = (dec("value", "decimal(12,2)") * 100).cast("long")
    base = (e.select("user_id", day.alias("day"), cents.alias("cents"))
             .crossJoin(F.broadcast(mx))
             .withColumn("age_d", F.col("max_day") - F.col("day"))
             .join(F.broadcast(w), "age_d", "left"))
    # cents is cast to decimal BEFORE the multiply (ADVICE r05): the
    # product of two BIGINTs (cents x w_e12, up to ~1e19) would wrap
    # silently in Spark while DuckDB raises — computing it in
    # decimal(38,0) keeps both engines exact at any event value.
    term = (F.col("cents").cast("decimal(38,0)")
            * F.coalesce("w_e12", F.lit(0)))
    return (base.groupBy("user_id")
                .agg(F.sum(term).alias("s"),
                     F.count(F.lit(1)).alias("n_events"))
                .select("user_id", "n_events",
                        F.floor(F.col("s").cast("double") / F.lit(1e12))
                         .cast("long").alias("score_cents")))


def q_session_paths(spark, sf_dir):
    """Top session paths: the first 3 event types of every 30-minute
    session (the sessionize_events recipe), concatenated 'a>b>c', with
    how many sessions took each path — the product-analytics "user
    journey" query (path cardinality <= |event_types|^3, tiny).

    Scale shape: ONE shuffle on user_id covers all three windows
    (session boundary lag, boundary cumsum, within-session rank); the
    per-session path is built from the <= 3 RANKED rows only — the
    collect_list buffers 3 structs max per session, never a celebrity
    user's history — and the path count is a partial+final hash agg on
    a low-cardinality key.
    """
    e = load_table(spark, sf_dir, "events")
    order = [F.col("ts"), F.col("event_id")]
    w_seq = W.partitionBy("user_id").orderBy(*order)
    gap = (F.unix_micros(F.col("ts"))
           - F.unix_micros(F.lag("ts", 1).over(w_seq)))
    sess = (e.withColumn("new_sess",
                         F.when(gap > 30 * 60 * 1_000_000, 1).otherwise(0))
             .withColumn("session_id",
                         F.sum("new_sess").over(
                             w_seq.rowsBetween(W.unboundedPreceding,
                                               W.currentRow))))
    w_in = W.partitionBy("user_id", "session_id").orderBy(*order)
    first3 = (sess.withColumn("rn", F.row_number().over(w_in))
                  .filter(F.col("rn") <= 3))
    paths = (first3.groupBy("user_id", "session_id")
             .agg(F.array_join(
                 F.transform(
                     F.array_sort(F.collect_list(
                         F.struct("rn", "event_type"))),
                     lambda s: s["event_type"]),
                 ">").alias("path")))
    return (paths.groupBy("path")
                 .agg(F.count(F.lit(1)).alias("n_sessions")))


CEP_FUNNEL = "v+c+p"   # views then clicks then purchase
CEP_ERRBURST = "ee+"   # 2+ consecutive errors
CEP_CHUNK = 4096       # events per (user, chunk) aggregation buffer
CEP_MAX_EVENTS = 1 << 25   # loud cap on one user's sequence length

# The pattern constants are format-injected into BOTH engines' SQL
# (java.util.regex on the Spark side, RE2 in DuckDB), so they must
# stay inside the shared backtracking-free semantics class: no
# backreferences (numeric \1 or named \k<name>), no lookaround, no
# atomic groups (?>...), no possessive quantifiers (a++/a*+/a?+/
# a{n,m}+) — RE2 rejects them; java.util.regex would silently accept
# and diverge (r10 advice item 2).
_RE2_UNSAFE = _re.compile(
    r"\\\d"             # numeric backreference
    r"|\\k<"            # named backreference
    r"|\(\?<?[=!]"      # lookahead / lookbehind
    r"|\(\?>"           # atomic group
    r"|[+*?}]\+"        # possessive quantifier
)


def _assert_re2_safe(pat: str) -> None:
    """Reject regexes outside the engine-portable (RE2-safe,
    backtracking-free) class — backreferences and lookaround match
    differently (or not at all) between java.util.regex and DuckDB's
    RE2, so a constant using them would silently diverge."""
    if _RE2_UNSAFE.search(pat):
        raise ValueError(
            f"CEP pattern {pat!r} uses backreferences/lookaround — "
            "outside the RE2-safe class shared by Spark and DuckDB")


def q_behavior_cep_pattern(spark, sf_dir):
    """Complex-event-processing PATTERN MATCH over per-user event-type
    sequences — the batch form of SQL MATCH_RECOGNIZE / Flink CEP
    (declare a regex over the event alphabet, count its occurrences
    per key): each user's history becomes a character string (one
    letter per event type, (ts, event_id)-ordered for a total order)
    and the patterns are counted with regexp_extract_all —
    `{f}` (the browse->click->buy funnel, counted non-overlapping) and
    `{e}` (error bursts: 2+ consecutive failures, the alerting
    pattern).  Both engines' regex engines agree on this
    backtracking-free pattern class (greedy, leftmost,
    non-overlapping scan; guarded by _assert_re2_safe).

    Celebrity-skew bound (r09 verdict item 2): no aggregation buffer
    ever holds a whole user's history.  The sequence builds in two
    stages — rank within user (row_number, a SPILLABLE sort, not an
    in-memory buffer), then collect per (user_id, rn DIV {c}) chunk
    (<= {c} structs per buffer) and concatenate the <= n/{c} chunk
    strings per user (1 byte/event, vs ~50 bytes/event for the struct
    form) — so the r04 funnel fixture's 300k-event bot costs a 300 KB
    string, not a 300k-struct buffer (tests/test_skew.py).  A user
    beyond {m} events (a {m}-byte row) raises loudly in-plan rather
    than degrading: past that, chunk the match itself per (user,
    time-bucket) with finite-width overlap stitching (both patterns
    are finite-overlap: 1 trailing char decides `{e}` continuation;
    `{f}` needs the open v+/c+ frontier carried, the
    funnel_conversion chained-min-agg form).

    Scale: ONE user-keyed shuffle — the row_number exchange on
    user_id satisfies both downstream groupBys (user_id ⊂ both keys);
    the regex is row-local.  At 100 TB: bucket by user_id and even
    the shuffle disappears.

    Output: (user_id, n_events, n_funnel, n_error_bursts).
    """.format(f=CEP_FUNNEL, e=CEP_ERRBURST, c=CEP_CHUNK,
               m=CEP_MAX_EVENTS)
    for p in (CEP_FUNNEL, CEP_ERRBURST):
        _assert_re2_safe(p)
    e = load_table(spark, sf_dir, "events")
    ch = F.substring("event_type", 1, 1)
    w_seq = W.partitionBy("user_id").orderBy("us", "event_id")
    ranked = (e.select("user_id", F.unix_micros("ts").alias("us"),
                       "event_id", ch.alias("ch"))
               .withColumn("rn", F.row_number().over(w_seq)))
    chunks = (ranked.groupBy("user_id",
                             F.expr(f"(rn - 1) DIV {CEP_CHUNK}")
                              .alias("chk"))
              .agg(F.count(F.lit(1)).alias("n"),
                   F.array_join(F.transform(
                       F.array_sort(F.collect_list(
                           F.struct("rn", "ch"))),
                       lambda s: s["ch"]), "").alias("part")))
    seq = (chunks.groupBy("user_id")
           .agg(F.sum("n").cast("long").alias("n_events"),
                F.array_join(F.transform(
                    F.array_sort(F.collect_list(
                        F.struct("chk", "part"))),
                    lambda s: s["part"]), "").alias("seq")))
    guarded = F.when(
        F.col("n_events") > CEP_MAX_EVENTS,
        F.raise_error(F.concat(
            F.lit("behavior_cep_pattern: user "),
            F.col("user_id").cast("string"),
            F.lit(f" exceeds CEP_MAX_EVENTS={CEP_MAX_EVENTS} events "
                  "— chunk the match per (user, time-bucket) with "
                  "overlap stitching before raising the cap")))
    ).otherwise(F.col("seq"))
    return seq.select(
        "user_id", "n_events", guarded.alias("seq")).select(
        "user_id", "n_events",
        F.size(F.expr(f"regexp_extract_all(seq, '{CEP_FUNNEL}', 0)"))
         .cast("long").alias("n_funnel"),
        F.size(F.expr(f"regexp_extract_all(seq, '{CEP_ERRBURST}', 0)"))
         .cast("long").alias("n_error_bursts"))


QUERIES = {
    "behavior_cep_pattern": q_behavior_cep_pattern,
    "events_markov_stationary": q_markov_stationary,
    "behavior_session_paths": q_session_paths,
    "events_decayed_engagement": q_decayed_engagement,
    "attribution_markov_removal": q_attribution_markov_removal,
    "rfm_segmentation": q_rfm_segmentation,
    "attribution_position_based": q_attribution_position,
    "funnel_windowed_72h": q_funnel_windowed,
    "funnel_latency_quantiles": q_funnel_latency_quantiles,
    "survival_kaplan_meier": q_survival_kaplan_meier,
    "cohort_ltv_curve": q_cohort_ltv_curve,
    "attribution_last_touch": q_attribution_last_touch,
    "funnel_conversion": q_funnel_conversion,
    "cohort_retention": q_cohort_retention,
    "markov_transitions": q_markov_transitions,
    "entropy_event_mix": q_entropy_event_mix,
}

ORACLE = {
    # per-user (ts, event_id)-ordered type-initial string; DuckDB's
    # ordered string_agg builds what Spark builds via array_sort
    "behavior_cep_pattern": f"""
        SELECT user_id, COUNT(*)::BIGINT AS n_events,
               len(regexp_extract_all(
                   string_agg(substr(event_type, 1, 1), ''
                              ORDER BY epoch_us(ts), event_id),
                   '{CEP_FUNNEL}'))::BIGINT AS n_funnel,
               len(regexp_extract_all(
                   string_agg(substr(event_type, 1, 1), ''
                              ORDER BY epoch_us(ts), event_id),
                   '{CEP_ERRBURST}'))::BIGINT AS n_error_bursts
        FROM events GROUP BY user_id
    """,
    # Chained min-join — since the r04 celebrity-safety rewrite the
    # Spark side uses the same algorithm; the independent cross-check
    # against the sorted-fold formulation lives in
    # tests/test_behavior.py (fold reference on a driver-local sample).
    "funnel_conversion": """
        WITH s1 AS (SELECT user_id, min(ts) AS t FROM events
                    WHERE event_type = 'signup' GROUP BY 1),
             s2 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
                    JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t
                    WHERE e.event_type = 'view' GROUP BY 1),
             s3 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
                    JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.t
                    WHERE e.event_type = 'click' GROUP BY 1),
             s4 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
                    JOIN s3 ON e.user_id = s3.user_id AND e.ts > s3.t
                    WHERE e.event_type = 'purchase' GROUP BY 1)
        SELECT 1 AS stage_ord, 'signup' AS stage, count(*) AS users FROM s1
        UNION ALL SELECT 2, 'view', count(*) FROM s2
        UNION ALL SELECT 3, 'click', count(*) FROM s3
        UNION ALL SELECT 4, 'purchase', count(*) FROM s4
    """,
    "cohort_retention": """
        WITH f AS (SELECT user_id, min(ts) AS first_ts
                   FROM events GROUP BY 1)
        SELECT strftime(date_trunc('week', f.first_ts), '%Y-%m-%d') AS cohort_week,
               CAST(date_diff('day', date_trunc('week', f.first_ts),
                              date_trunc('week', e.ts)) // 7 AS INT)
                   AS week_offset,
               count(DISTINCT e.user_id) AS users
        FROM events e JOIN f ON e.user_id = f.user_id
        GROUP BY 1, 2
    """,
    "markov_transitions": """
        WITH seq AS (
            SELECT LAG(event_type) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS prev_type,
                   event_type AS next_type
            FROM events),
        t AS (SELECT prev_type, next_type, count(*) AS n FROM seq
              WHERE prev_type IS NOT NULL GROUP BY 1, 2)
        SELECT prev_type, next_type, n,
               CAST(FLOOR(n / sum(n) OVER (PARTITION BY prev_type) * 1e6)
                    AS BIGINT) AS p_ppm
        FROM t
    """,
    "entropy_event_mix": """
        WITH c AS (SELECT user_id, event_type, count(*) AS c
                   FROM events GROUP BY 1, 2),
             tot AS (SELECT user_id, CAST(sum(c) AS BIGINT) AS n_total
                     FROM c GROUP BY 1)
        SELECT c.user_id, tot.n_total AS n_events,
               CAST(FLOOR(-sum((c / tot.n_total)
                               * log2(c / tot.n_total)) * 1e6)
                    AS BIGINT) AS h_ppm
        FROM c JOIN tot ON c.user_id = tot.user_id
        GROUP BY 1, 2
    """,
}

ORACLE["rfm_segmentation"] = """
    WITH mx AS (SELECT MAX(o_orderdate) AS maxd FROM orders),
    c AS (SELECT o_custkey,
                 MIN(date_diff('day', o_orderdate, maxd)) AS r_days,
                 COUNT(*) AS f_orders,
                 SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS m_total
          FROM orders CROSS JOIN mx GROUP BY 1),
    rt AS (
        SELECT k, MIN(v) AS b FROM
            (SELECT v, SUM(cnt) OVER (ORDER BY v) AS cum,
                    SUM(cnt) OVER () AS n
             FROM (SELECT r_days AS v, COUNT(*) AS cnt FROM c GROUP BY 1)),
            unnest([1, 2, 3, 4]) AS t(k)
        WHERE cum * 5 >= k * n GROUP BY k),
    ft AS (
        SELECT k, MIN(v) AS b FROM
            (SELECT v, SUM(cnt) OVER (ORDER BY v) AS cum,
                    SUM(cnt) OVER () AS n
             FROM (SELECT f_orders AS v, COUNT(*) AS cnt FROM c GROUP BY 1)),
            unnest([1, 2, 3, 4]) AS t(k)
        WHERE cum * 5 >= k * n GROUP BY k),
    mt AS (
        SELECT k, MIN(v) AS b FROM
            (SELECT v, SUM(cnt) OVER (ORDER BY v) AS cum,
                    SUM(cnt) OVER () AS n
             FROM (SELECT m_total AS v, COUNT(*) AS cnt FROM c GROUP BY 1)),
            unnest([1, 2, 3, 4]) AS t(k)
        WHERE cum * 5 >= k * n GROUP BY k),
    s AS (
        SELECT o_custkey, r_days, f_orders, m_total,
               CAST(1 + (SELECT COUNT(*) FROM rt WHERE b < c.r_days) AS INT)
                   AS r_score,
               CAST(1 + (SELECT COUNT(*) FROM ft WHERE b < c.f_orders) AS INT)
                   AS f_score,
               CAST(1 + (SELECT COUNT(*) FROM mt WHERE b < c.m_total) AS INT)
                   AS m_score
        FROM c)
    SELECT o_custkey, r_days, f_orders, CAST(m_total AS DOUBLE) AS m_total,
           r_score, f_score, m_score,
           r_score * 100 + f_score * 10 + m_score AS rfm
    FROM s
"""

ORACLE["attribution_last_touch"] = f"""
    WITH b AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS us
               FROM events),
    p AS (SELECT * FROM b WHERE event_type = 'purchase'),
    t AS (SELECT * FROM b WHERE event_type IN ('view', 'click')),
    j AS (
        SELECT p.event_id, p.user_id, p.us AS purchase_us,
               t.event_id AS touch_event_id, t.event_type AS touch_type,
               t.us AS touch_us,
               ROW_NUMBER() OVER (PARTITION BY p.event_id
                                  ORDER BY t.us DESC, t.event_id DESC) AS rk
        FROM p JOIN t ON t.user_id = p.user_id
         AND (t.us < p.us OR (t.us = p.us AND t.event_id < p.event_id)))
    SELECT event_id, user_id, purchase_us, touch_event_id, touch_type,
           touch_us, purchase_us - touch_us AS lag_us
    FROM j WHERE rk = 1 AND touch_us >= purchase_us - {ATTR_WINDOW_US}
"""

ORACLE["attribution_position_based"] = f"""
    WITH base AS (
        SELECT event_id, user_id, event_type, epoch_us(ts) AS us
        FROM events),
    p AS (SELECT user_id, event_id AS purchase_id, us AS pus
          FROM base WHERE event_type = 'purchase'),
    t AS (SELECT user_id, event_id AS touch_id, event_type AS touch_type,
                 us AS tus
          FROM base WHERE event_type IN ('view', 'click')),
    j AS (
        SELECT p.purchase_id, p.user_id, t.touch_id, t.touch_type, t.tus
        FROM p JOIN t USING (user_id)
        WHERE t.tus < p.pus AND t.tus >= p.pus - {ATTR_WINDOW_US}),
    r AS (
        SELECT *,
               ROW_NUMBER() OVER (PARTITION BY purchase_id
                                  ORDER BY tus, touch_id) AS pos,
               COUNT(*) OVER (PARTITION BY purchase_id) AS n
        FROM j)
    SELECT purchase_id, user_id, touch_id, touch_type,
           pos, n,
           CASE WHEN n = 1 THEN 1000000
                WHEN n = 2 THEN 500000
                WHEN pos = 1 THEN 400000
                WHEN pos = n THEN 400000
                ELSE CAST(FLOOR(200000 / (n - 2)) AS BIGINT)
           END AS credit_ppm
    FROM r
"""

ORACLE["funnel_windowed_72h"] = f"""
    WITH s1 AS (SELECT user_id, min(epoch_us(ts)) AS t,
                       min(epoch_us(ts)) + {FUNNEL_WINDOW_US} AS dl
                FROM events WHERE event_type = 'signup' GROUP BY 1),
         s2 AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t, s1.dl AS dl
                FROM events e JOIN s1 ON e.user_id = s1.user_id
                 AND epoch_us(e.ts) > s1.t AND epoch_us(e.ts) <= s1.dl
                WHERE e.event_type = 'view' GROUP BY 1, 3),
         s3 AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t, s2.dl AS dl
                FROM events e JOIN s2 ON e.user_id = s2.user_id
                 AND epoch_us(e.ts) > s2.t AND epoch_us(e.ts) <= s2.dl
                WHERE e.event_type = 'click' GROUP BY 1, 3),
         s4 AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t
                FROM events e JOIN s3 ON e.user_id = s3.user_id
                 AND epoch_us(e.ts) > s3.t AND epoch_us(e.ts) <= s3.dl
                WHERE e.event_type = 'purchase' GROUP BY 1)
    SELECT 1 AS stage_ord, 'signup' AS stage, count(*) AS users FROM s1
    UNION ALL SELECT 2, 'view', count(*) FROM s2
    UNION ALL SELECT 3, 'click', count(*) FROM s3
    UNION ALL SELECT 4, 'purchase', count(*) FROM s4
"""

ORACLE["funnel_latency_quantiles"] = """
    WITH s1 AS (SELECT user_id, min(epoch_us(ts)) AS t FROM events
                WHERE event_type = 'signup' GROUP BY 1),
         s2 AS (SELECT e.user_id, s1.t AS t1, min(epoch_us(e.ts)) AS t
                FROM events e JOIN s1 ON e.user_id = s1.user_id
                 AND epoch_us(e.ts) > s1.t
                WHERE e.event_type = 'view' GROUP BY 1, 2),
         s3 AS (SELECT e.user_id, s2.t1, min(epoch_us(e.ts)) AS t
                FROM events e JOIN s2 ON e.user_id = s2.user_id
                 AND epoch_us(e.ts) > s2.t
                WHERE e.event_type = 'click' GROUP BY 1, 2),
         s4 AS (SELECT e.user_id, s3.t1, min(epoch_us(e.ts)) AS t
                FROM events e JOIN s3 ON e.user_id = s3.user_id
                 AND epoch_us(e.ts) > s3.t
                WHERE e.event_type = 'purchase' GROUP BY 1, 2),
    lat AS (SELECT t - t1 AS latency_us FROM s4),
    cnts AS (SELECT latency_us, COUNT(*)::BIGINT AS c FROM lat GROUP BY 1),
    ranked AS (SELECT latency_us,
                      SUM(c) OVER (ORDER BY latency_us) AS cum
               FROM cnts),
    n AS (SELECT COUNT(*)::BIGINT AS n FROM lat),
    p(pct) AS (VALUES (25), (50), (75), (90))
    SELECT p.pct AS pct, MIN(r.latency_us) AS latency_us
    FROM p CROSS JOIN n JOIN ranked r
      ON r.cum >= CAST(CEIL(n.n * p.pct / 100.0) AS BIGINT)
    GROUP BY 1
"""

def _km_oracle() -> str:
    from .text import _ln_det, _lit_duck
    term = ("CASE WHEN d = 0 THEN 0"
            " WHEN n_risk = d THEN NULL"
            f" ELSE CAST(floor(({_ln_det('(n_risk - d)', _lit_duck)}"
            f" - {_ln_det('n_risk', _lit_duck)}) * 1e6) AS BIGINT)"
            " END")
    return f"""
    WITH per AS (
        SELECT user_id,
               MIN(CAST(epoch_us(ts) // 86400000000 AS INT)) AS t0,
               MIN(CASE WHEN event_type = 'error'
                        THEN CAST(epoch_us(ts) // 86400000000 AS INT)
                   END) AS errd,
               MAX(CAST(epoch_us(ts) // 86400000000 AS INT)) AS lastd
        FROM events GROUP BY 1),
    dur AS (
        SELECT COALESCE(errd - t0, lastd - t0) AS duration_day,
               CASE WHEN errd IS NOT NULL THEN 1 ELSE 0 END AS event
        FROM per),
    cnts AS (
        SELECT duration_day, COUNT(*)::BIGINT AS n_at,
               SUM(event)::BIGINT AS d
        FROM dur GROUP BY 1),
    tot AS (SELECT SUM(n_at)::BIGINT AS tot FROM cnts),
    base AS (
        SELECT duration_day, n_at, d,
               CAST(tot - COALESCE(SUM(n_at) OVER (
                   ORDER BY duration_day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS BIGINT) AS n_risk
        FROM cnts CROSS JOIN tot),
    terms AS (
        SELECT duration_day, n_risk, d, {term} AS term_e6
        FROM base)
    SELECT duration_day, n_risk, d AS n_events,
           CASE WHEN MAX(CASE WHEN term_e6 IS NULL AND d > 0
                              THEN 1 ELSE 0 END)
                     OVER (ORDER BY duration_day) = 1 THEN NULL
                ELSE SUM(term_e6) OVER (ORDER BY duration_day)
           END::BIGINT AS cum_log_s_e6
    FROM terms
"""


ORACLE["survival_kaplan_meier"] = _km_oracle()

ORACLE["cohort_ltv_curve"] = """
    WITH base AS (
        SELECT o_custkey,
               EXTRACT(year FROM o_orderdate) * 12
                   + EXTRACT(month FROM o_orderdate) AS m,
               CAST(o_totalprice AS DECIMAL(12,2)) AS v
        FROM orders),
    firsts AS (SELECT o_custkey, MIN(m) AS m0 FROM base GROUP BY 1),
    sizes AS (SELECT m0, COUNT(DISTINCT o_custkey) AS n_customers
              FROM firsts GROUP BY 1),
    cells AS (
        SELECT f.m0 AS cohort_m, b.m - f.m0 AS month_offset,
               SUM(b.v) AS rev
        FROM base b JOIN firsts f USING (o_custkey)
        GROUP BY 1, 2),
    cum AS (
        SELECT *, SUM(rev) OVER (PARTITION BY cohort_m
                                 ORDER BY month_offset) AS c
        FROM cells)
    SELECT cohort_m, month_offset, s.n_customers,
           CAST(rev AS DOUBLE) AS revenue,
           CAST(FLOOR(CAST(c AS DOUBLE) / CAST(s.n_customers AS DOUBLE)
                      * 1e2) AS BIGINT) AS cum_ltv_cents
    FROM cum JOIN sizes s ON s.m0 = cum.cohort_m
"""

ORACLE["behavior_session_paths"] = """
    WITH seq AS (
        SELECT user_id, event_id, ts, event_type,
               CASE WHEN epoch_us(ts) - epoch_us(
                        LAG(ts) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id))
                      > 30 * 60 * 1000000
                    THEN 1 ELSE 0 END AS new_sess
        FROM events),
    sess AS (
        SELECT user_id, event_id, ts, event_type,
               SUM(new_sess) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING)::BIGINT
                   AS session_id
        FROM seq),
    r AS (
        SELECT user_id, session_id, event_type,
               ROW_NUMBER() OVER (PARTITION BY user_id, session_id
                                  ORDER BY ts, event_id) AS rn
        FROM sess),
    p AS (
        SELECT user_id, session_id,
               string_agg(event_type, '>' ORDER BY rn) AS path
        FROM r WHERE rn <= 3 GROUP BY 1, 2)
    SELECT path, COUNT(*) AS n_sessions FROM p GROUP BY 1
"""


def _decayed_engagement_oracle() -> str:
    vals = ", ".join(f"({d}, {w})" for d, w in _DECAY_W)
    return f"""
    WITH w(age_d, w_e12) AS (VALUES {vals}),
    mx AS (SELECT MAX(datediff('day', DATE '1970-01-01', CAST(ts AS DATE)))
               AS max_day FROM events),
    base AS (
        SELECT user_id,
               CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents,
               (SELECT max_day FROM mx)
                   - datediff('day', DATE '1970-01-01', CAST(ts AS DATE))
                   AS age_d
        FROM events),
    t AS (
        SELECT user_id,
               CAST(cents * COALESCE(w.w_e12, 0) AS DECIMAL(38,0)) AS term
        FROM base LEFT JOIN w USING (age_d))
    SELECT user_id, COUNT(*) AS n_events,
           CAST(FLOOR(CAST(SUM(term) AS DOUBLE) / 1e12) AS BIGINT)
               AS score_cents
    FROM t GROUP BY 1
    """


ORACLE["events_decayed_engagement"] = _decayed_engagement_oracle()


def _markov_removal_oracle(k: int = MARKOV_ABSORB_ITERS) -> str:
    scen = ", ".join(f"('{c}')" for c in ("BASE",) + MARKOV_CHANNELS)
    ctes = [f"""
    seq AS (
        SELECT user_id, event_id, ts, event_type,
               CASE WHEN epoch_us(ts) - epoch_us(
                        LAG(ts) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id))
                      > 30 * 60 * 1000000
                    THEN 1 ELSE 0 END AS new_sess
        FROM events),
    sess AS (
        SELECT user_id, event_id, ts, event_type,
               SUM(new_sess) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING)::BIGINT
                   AS sid
        FROM seq),
    rn AS (
        SELECT user_id, sid, event_type,
               ROW_NUMBER() OVER (PARTITION BY user_id, sid
                                  ORDER BY ts, event_id) AS rn
        FROM sess),
    marked AS (
        SELECT user_id, sid, event_type, rn,
               MIN(CASE WHEN event_type = 'purchase' THEN rn END)
                   OVER (PARTITION BY user_id, sid) AS conv_rn,
               COUNT(*) OVER (PARTITION BY user_id, sid) AS n_rows
        FROM rn),
    j AS (
        SELECT user_id, sid, rn, conv_rn, n_rows,
               CASE WHEN event_type = 'purchase' THEN 'CONV'
                    ELSE event_type END AS state
        FROM marked
        WHERE conv_rn IS NULL OR rn <= conv_rn),
    steps AS (
        SELECT COALESCE(LAG(state) OVER (PARTITION BY user_id, sid
                                         ORDER BY rn), 'START') AS s,
               state AS t
        FROM j
        UNION ALL
        SELECT state AS s, 'NULL' AS t
        FROM j
        WHERE conv_rn IS NULL AND rn = COALESCE(conv_rn, n_rows)),
    trans AS (SELECT s, t, COUNT(*)::BIGINT AS n FROM steps GROUP BY 1, 2),
    tot AS (SELECT s, SUM(n)::BIGINT AS n_s FROM trans GROUP BY 1),
    base_p AS (
        SELECT trans.s, trans.t,
               CAST(trans.n AS DOUBLE) / CAST(tot.n_s AS DOUBLE) AS p
        FROM trans JOIN tot USING (s)),
    scen(removed) AS (VALUES {scen}),
    redirected AS MATERIALIZED (
        SELECT removed, s,
               CASE WHEN t = removed THEN 'NULL' ELSE t END AS t,
               SUM(p) AS p
        FROM base_p CROSS JOIN scen
        WHERE s <> removed
        GROUP BY 1, 2, 3),
    v0 AS MATERIALIZED (
        SELECT removed, state,
               CASE WHEN state = 'CONV' THEN CAST(1.0 AS DOUBLE)
                    ELSE CAST(0.0 AS DOUBLE) END AS v
        FROM (SELECT DISTINCT removed, s AS state FROM redirected
              UNION
              SELECT DISTINCT removed, t FROM redirected))"""]
    for i in range(1, k + 1):
        ctes.append(f"""
    v{i} AS MATERIALIZED (
        SELECT removed, state, v FROM (
            SELECT r.removed, r.s AS state,
                   CAST(SUM(CAST(FLOOR(r.p * v.v * 1e15) AS BIGINT))
                        AS DOUBLE) / 1e15 AS v
            FROM redirected r
            JOIN v{i - 1} v ON v.removed = r.removed AND v.state = r.t
            GROUP BY 1, 2)
        UNION ALL
        SELECT removed, state, v FROM v{i - 1}
        WHERE state IN ('CONV', 'NULL'))""")
    return ("WITH" + ",".join(ctes) + f"""
    SELECT s.removed AS channel,
           CAST(FLOOR(s.p_conv * 1e9) AS BIGINT) AS p_removed_e9,
           CAST(FLOOR(b.p_base * 1e9) AS BIGINT) AS p_base_e9,
           CAST(FLOOR((CAST(1.0 AS DOUBLE) - s.p_conv / b.p_base)
                      * 1e6) AS BIGINT) AS removal_effect_e6
    FROM (SELECT removed, v AS p_conv FROM v{k}
          WHERE state = 'START' AND removed <> 'BASE') s,
         (SELECT v AS p_base FROM v{k}
          WHERE state = 'START' AND removed = 'BASE') b""")


ORACLE["attribution_markov_removal"] = _markov_removal_oracle()

ORACLE["events_markov_stationary"] = """
    WITH seq AS (
        SELECT user_id, event_type, ts, event_id,
               LAG(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_type
        FROM events),
    t0 AS (SELECT prev_type, event_type AS next_type,
                  COUNT(*)::BIGINT AS n
           FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2),
    tt AS (SELECT prev_type, SUM(n)::BIGINT AS tot
           FROM t0 GROUP BY 1),
    t AS (SELECT t0.prev_type, t0.next_type, t0.n, tt.tot
          FROM t0 JOIN tt USING (prev_type)),
    k AS (SELECT COUNT(DISTINCT prev_type)::BIGINT AS k FROM t),
    p0 AS (SELECT DISTINCT prev_type AS s,
                  (1000000000000 // (SELECT k FROM k))::BIGINT AS pi
           FROM t),
    p1 AS (SELECT t.next_type AS s,
                  SUM((p0.pi::HUGEINT * t.n) // t.tot)::BIGINT AS pi
           FROM p0 JOIN t ON t.prev_type = p0.s
           GROUP BY 1),
    p2 AS (SELECT t.next_type AS s,
                  SUM((p1.pi::HUGEINT * t.n) // t.tot)::BIGINT AS pi
           FROM p1 JOIN t ON t.prev_type = p1.s
           GROUP BY 1),
    p3 AS (SELECT t.next_type AS s,
                  SUM((p2.pi::HUGEINT * t.n) // t.tot)::BIGINT AS pi
           FROM p2 JOIN t ON t.prev_type = p2.s
           GROUP BY 1),
    p4 AS (SELECT t.next_type AS s,
                  SUM((p3.pi::HUGEINT * t.n) // t.tot)::BIGINT AS pi
           FROM p3 JOIN t ON t.prev_type = p3.s
           GROUP BY 1),
    p5 AS (SELECT t.next_type AS s,
                  SUM((p4.pi::HUGEINT * t.n) // t.tot)::BIGINT AS pi
           FROM p4 JOIN t ON t.prev_type = p4.s
           GROUP BY 1)
    SELECT s AS event_type, pi AS pi_e12 FROM p5
"""
