"""Temporal window operators over ``events`` — batch forms.

The reference has no time semantics at all (SURVEY.md §2.2 streaming
row); these queries supply the standard event-time surface a pipeline
engine needs: tumbling and sliding windows (the batch twins of the
Structured Streaming queries in streaming/) and a RANGE-frame moving
aggregate.

Scale notes: tumbling/sliding aggregation shuffles once on
(window, key) with map-side partial aggregation absorbing the fan-in —
the word-count shape.  The sliding form multiplies input by
window/slide (here 2x) *before* the partial agg, which is the standard
cost model; for large ratios prefer tumbling sub-windows + rollup.
RANGE frames shuffle once on the partition key like any window.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..functions.exact import dec, ts_day, ts_hour, ts_day_str
from ..sources.tables import load_table

MONEY = "decimal(12,2)"


def q_window_tumbling(spark, sf_dir):
    """1-hour tumbling windows: event counts + exact value sums per type.

    ``F.window`` aligns bucket boundaries to the epoch, as does DuckDB's
    ``time_bucket`` for sub-day intervals — the oracle matches exactly.
    Window bounds leave the engine as epoch micros (determinism rules,
    relational.py module docstring).
    """
    e = load_table(spark, sf_dir, "events")
    return (e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
             .agg(F.count(F.lit(1)).alias("n_events"),
                  F.sum(dec("value", MONEY)).cast("double").alias("sum_value"))
             .select(F.unix_micros("w.start").alias("window_start_us"),
                     "event_type", "n_events", "sum_value"))


def q_window_sliding(spark, sf_dir):
    """1-hour windows sliding every 30 minutes (each event in 2 windows)."""
    e = load_table(spark, sf_dir, "events")
    return (e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
             .agg(F.count(F.lit(1)).alias("n_events"),
                  F.countDistinct("user_id").alias("n_users"),
                  F.sum(dec("value", MONEY)).cast("double").alias("sum_value"))
             .select(F.unix_micros("w.start").alias("window_start_us"),
                     "n_events", "n_users", "sum_value"))


def q_window_range_frame(spark, sf_dir):
    """Trailing-30-day moving spend per customer: a RANGE frame.

    RANGE (value-based) frames differ from ROWS frames on ties — all
    orders on the same day enter every peer row's frame, which makes the
    result deterministic without a unique tie-break.  Ordering key is an
    integer day (RANGE frames need numeric order in both engines).
    """
    o = load_table(spark, sf_dir, "orders")
    od = o.withColumn("day", F.datediff(F.col("o_orderdate"), F.lit("1970-01-01")))
    wr = (W.partitionBy("o_custkey").orderBy("day").rangeBetween(-30, 0))
    return od.select(
        "o_orderkey", "o_custkey", "day",
        F.sum(dec("o_totalprice", MONEY)).over(wr).cast("double").alias("spend_30d"),
        F.count(F.lit(1)).over(wr).alias("n_orders_30d"))


INTERVAL_OVERLAP_TOP_K = 5


def q_interval_overlap(spark, sf_dir):
    """Interval-overlap self-join: for each user, the TOP-K other users
    whose daily activity spans [min ts, max ts] overlap theirs the
    longest (k = INTERVAL_OVERLAP_TOP_K, ties broken by day then user).

    The classic interval join Spark lacks as a builtin, composed as
    equi-join on a coarse bucket (the day — exact here since intervals
    are built per day and cannot cross it) + the range residual
    sa<=eb AND sb<=ea.  Without the bucket key this is a cartesian
    BroadcastNestedLoopJoin; with it, a plain shuffled hash join whose
    per-key fan-out is bounded by users-per-day.  The raw pair relation
    is quadratic in users-per-day (17M rows at sf0.1 — measured in the
    r04 verdict), so the OUTPUT is bounded to k rows per user_a by a
    row_number window over (overlap_us DESC, day_us, user_b): the
    answer stays human/collect-sized at any scale while the unbounded
    pair set exists only as a pipeline-local intermediate.  At 100 TB:
    bucket by hour and dedupe pairs, same shape.  Day and overlap stay
    in integer epoch arithmetic — no timezone, no floats.
    """
    e = load_table(spark, sf_dir, "events")
    day_us = 86_400_000_000
    iv = (e.groupBy("user_id",
                    (F.unix_micros("ts") - (F.unix_micros("ts") % day_us))
                    .alias("day_us"))
           .agg(F.min(F.unix_micros("ts")).alias("s"),
                F.max(F.unix_micros("ts")).alias("e")))
    # Spread the probe side to full parallelism BEFORE the fan-out
    # join: the quadratic pair stream inherits its partition count
    # from this tiny (|users x days| rows) shuffle, so the phase-1
    # sort below parallelizes across every core instead of the
    # upstream reducer count — and the 17M-row intermediate itself
    # never re-shuffles.  Keyed on (day_us, user_a) so the phase-1
    # window's clustering is satisfied with no exchange.
    par = spark.sparkContext.defaultParallelism
    a = (iv.select("day_us", F.col("user_id").alias("user_a"),
                   F.col("s").alias("sa"), F.col("e").alias("ea"))
           .repartition(par, "day_us", "user_a"))
    b = iv.select("day_us", F.col("user_id").alias("user_b"),
                  F.col("s").alias("sb"), F.col("e").alias("eb"))
    pairs = (a.join(b, ["day_us"])
              .filter((F.col("user_a") < F.col("user_b"))
                      & (F.col("sa") <= F.col("eb"))
                      & (F.col("sb") <= F.col("ea")))
              .select("day_us", "user_a", "user_b",
                      (F.least("ea", "eb") - F.greatest("sa", "sb"))
                      .alias("overlap_us")))
    # Two-phase top-k so the quadratic pair relation never re-shuffles:
    # phase 1 ranks per (day_us, user_a) — the join output is already
    # hash-partitioned on day_us, which satisfies the clustered
    # distribution for (day_us, user_a), so this window adds NO
    # exchange (pinned in tests/test_plans.py) and cuts the relation to
    # <= k rows per (user, day); at most k global winners can share a
    # day, so phase 2's per-user rank over the reduced set is exact.
    order = (F.desc("overlap_us"), F.asc("day_us"), F.asc("user_b"))
    w1 = W.partitionBy("day_us", "user_a").orderBy(*order)
    reduced = (pairs.withColumn("rn", F.row_number().over(w1))
                    .filter(F.col("rn") <= INTERVAL_OVERLAP_TOP_K)
                    .drop("rn"))
    wk = W.partitionBy("user_a").orderBy(*order)
    return (reduced.withColumn("rn", F.row_number().over(wk))
                   .filter(F.col("rn") <= INTERVAL_OVERLAP_TOP_K)
                   .select("day_us", "user_a", "user_b", "overlap_us"))


def q_ts_resample_ffill(spark, sf_dir):
    """Hourly resample per user with forward-fill (last observation
    carried forward) — the standard gap-fill a feature/training pipeline
    runs before windowed statistics.

    Join-free single-shuffle design: instead of the textbook
    grid-LEFT-JOIN-observations + last(ignorenulls) window (which plans
    as TWO passes over events because the grid and the join probe both
    derive from the observation subplan), each observation looks at the
    NEXT observed bucket (``lead``) and emits itself plus its gap-fill
    copies directly via ``explode(sequence(bucket, next-1h, 1h))``.
    One scan, one repartition on ``user_id`` (both windows and the
    explode are satisfied by that partitioning — asserted in
    tests/test_plans.py), no join.  At 100 TB the explode fan-out is
    bounded by the observed time span per user and stays
    pipeline-local.  The oracle deliberately uses the OTHER formulation
    (grid + left join + last_value IGNORE NULLS) so two independent
    constructions must agree.

    Last observation per bucket is picked by ROW_NUMBER over the total
    order (ts DESC, event_id DESC) — deterministic under ts ties and
    expressible identically in DuckDB (arg_max cannot take a composite
    key there).  The filled value is an exact copy of an input double
    (no arithmetic), so the oracle hash matches bit-for-bit.
    """
    hour_us = 3_600_000_000
    e = load_table(spark, sf_dir, "events").repartition("user_id")
    us = F.unix_micros("ts")
    obs = (e.select("user_id", "event_id", us.alias("us"),
                    (us - us % hour_us).alias("obs_us"), "value")
            .withColumn("rn", F.row_number().over(
                W.partitionBy("user_id", "obs_us")
                 .orderBy(F.desc("us"), F.desc("event_id"))))
            .filter(F.col("rn") == 1)
            .select("user_id", "obs_us", F.col("value").alias("obs_value")))
    nxt = F.lead("obs_us", 1).over(W.partitionBy("user_id").orderBy("obs_us"))
    return (obs.withColumn("nxt", nxt)
               .select("user_id", "obs_us", "obs_value",
                       F.explode(F.sequence(
                           "obs_us",
                           F.coalesce(F.col("nxt") - hour_us, F.col("obs_us")),
                           F.lit(hour_us))).alias("bucket_us"))
               .select("user_id", "bucket_us",
                       F.col("obs_value").alias("value_ffill"),
                       (F.col("bucket_us") != F.col("obs_us")).cast("int")
                       .alias("is_gap")))


def q_ts_resample_interp(spark, sf_dir):
    """Hourly resample per user with LINEAR INTERPOLATION across gaps —
    the companion to q_ts_resample_ffill for continuous signals.

    Same join-free shape: lead() fetches the next observation's bucket
    AND value, explode(sequence) emits the gap grid, and the filled
    value is obs + (next - obs) * i/n computed identically in both
    engines.  IEEE +,-,*,/ in the same order give bit-identical
    doubles, but ROUND half-way ties do NOT agree across engines
    (65.4046875 rounded ...88 by Spark HALF_UP, ...87 by DuckDB), so
    the value leaves as fixed-point floor(x * 1e6) micros — floor of
    identical bits is identical.  One scan, one shuffle on user_id,
    no join — holds at any scale.
    """
    hour_us = 3_600_000_000
    e = load_table(spark, sf_dir, "events").repartition("user_id")
    us = F.unix_micros("ts")
    obs = (e.select("user_id", "event_id", us.alias("us"),
                    (us - us % hour_us).alias("obs_us"), "value")
            .withColumn("rn", F.row_number().over(
                W.partitionBy("user_id", "obs_us")
                 .orderBy(F.desc("us"), F.desc("event_id"))))
            .filter(F.col("rn") == 1)
            .select("user_id", "obs_us", F.col("value").alias("obs_value")))
    w = W.partitionBy("user_id").orderBy("obs_us")
    o2 = obs.select(
        "user_id", "obs_us", "obs_value",
        F.lead("obs_us", 1).over(w).alias("nxt_us"),
        F.lead("obs_value", 1).over(w).alias("nxt_value"))
    filled = (o2.select(
        "user_id", "obs_us", "obs_value", "nxt_us", "nxt_value",
        F.explode(F.sequence(
            "obs_us",
            F.coalesce(F.col("nxt_us") - hour_us, F.col("obs_us")),
            F.lit(hour_us))).alias("bucket_us"))
        .withColumn("i", F.expr(f"(bucket_us - obs_us) DIV {hour_us}"))
        .withColumn("nsteps", F.expr(f"(nxt_us - obs_us) DIV {hour_us}")))
    interp = (F.col("obs_value")
              + (F.col("nxt_value") - F.col("obs_value"))
              * (F.col("i").cast("double") / F.col("nsteps").cast("double")))
    val = F.when(F.col("i") == 0, F.col("obs_value")).otherwise(interp)
    return filled.select(
        "user_id", "bucket_us",
        F.floor(val * 1000000.0).alias("value_interp_e6"),
        (F.col("i") > 0).cast("int").alias("is_gap"))


def q_ohlc_hourly(spark, sf_dir):
    """Hourly OHLC (open/high/low/close) candles of event value per
    event type — the hypertable-rollup shape for market/telemetry data.

    ONE partial+final hash aggregate: open/close are min_by/max_by with
    a (ts, event_id) struct ordering key (total order — event_id breaks
    ts ties), so no window pass and no second shuffle.  The oracle uses
    the independent ROW_NUMBER-window construction, cross-checking the
    arg-min/max algorithm against a different plan.
    """
    e = load_table(spark, sf_dir, "events")
    v = dec("value", MONEY)
    key = F.struct("ts", "event_id")
    # Bucket leaves the engine as epoch micros (house determinism rule:
    # pandas materializes Spark timestamps as ns and DuckDB's as us, so
    # a raw timestamp column hash-mismatches on dtype alone).
    return (e.groupBy("event_type",
                      F.expr("(unix_micros(ts) DIV 3600000000) * 3600000000")
                       .alias("hr_us"))
             .agg(F.min_by(v, key).cast("double").alias("open"),
                  F.max(v).cast("double").alias("high"),
                  F.min(v).cast("double").alias("low"),
                  F.max_by(v, key).cast("double").alias("close"),
                  F.count(F.lit(1)).alias("n")))


SUBSEQ_M = 8      # query subsequence length
SUBSEQ_K = 10     # top-k windows returned


def q_ts_subsequence_search(spark, sf_dir):
    """Time-series subsequence similarity search: the SUBSEQ_K sliding
    windows (length 8, any user) closest in squared Euclidean distance
    to a fixed query subsequence (user 1's first window) — the
    whole-matching kernel of distributed data-series search engines
    (UCR-suite / MASS / Odyssey-style systems reduce to exactly this
    scan shape).

    Exactness: values quantize to DECIMAL(12,2) and every
    difference/square/sum stays in decimal — the distance is an exact
    rational, converted to double ONCE at output, so the DuckDB oracle
    matches bit-for-bit and no float-sum ordering enters.

    Scale shape: the window columns are lead() over one per-user sort
    shuffle (row-local after); scoring is a projection against the
    8-value broadcast query (collected driver-side — bounded like the
    IVF centroids); the global top-k compiles to
    TakeOrderedAndProject (per-partition partial top-k, never a full
    sort).  Total order (dist, user_id, start_us) makes the result set
    unique.
    """
    e = load_table(spark, sf_dir, "events")
    v = dec("value", MONEY)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    base = e.select(
        "user_id", F.unix_micros("ts").alias("start_us"), "event_id",
        *[F.lead(v, i).over(w).alias(f"v{i}") for i in range(SUBSEQ_M)])
    full = base.filter(F.col(f"v{SUBSEQ_M - 1}").isNotNull())
    qrows = (full.filter(F.col("user_id") == 1)
             .orderBy("start_us", "event_id").limit(1).collect())
    if not qrows:
        # query user has < M events at this SF: empty result, same schema
        return full.select("user_id", "start_us",
                           F.lit(0.0).alias("dist")).limit(0)
    qrow = qrows[0]
    dist = None
    for i in range(SUBSEQ_M):
        d = F.col(f"v{i}") - F.lit(qrow[f"v{i}"])
        term = d * d
        dist = term if dist is None else dist + term
    # event_id joins the sort as the final tie-break (two windows can
    # share (user, start_us) when events carry duplicate timestamps);
    # it is dropped from the output, so the oracle's column set matches.
    return (full.select("user_id", "start_us", "event_id",
                        dist.cast("double").alias("dist"))
            .orderBy("dist", "user_id", "start_us", "event_id")
            .limit(SUBSEQ_K)
            .select("user_id", "start_us", "dist"))


def q_rollup_time_hierarchy(spark, sf_dir):
    """Time-hierarchy ROLLUP over events: (day, hour) sub-totals, day
    totals, and the grand total in one pass — the hypertable/OLAP
    time rollup (continuous-aggregate shape).

    One aggregation with Expand (each input row feeds its 3 grouping
    sets); Catalyst still plans partial+final, so the shuffle carries
    at most 3x the distinct (day, hour) cardinality — tiny at any SF.
    At 100 TB the day-level rollup is what a materialized continuous
    aggregate stores; stream_mv_refresh is the incremental twin.
    """
    e = load_table(spark, sf_dir, "events")
    # day/hr ride as STRINGS: a nullable int column round-trips
    # through
    # pandas as float64 (rollup-row NULL -> NaN) on the Spark side
    # but stays None on DuckDB's, and DATE becomes midnight
    # datetime64 via DuckDB's pandas path — strings are lossless and
    # NULL-faithful in both engines.
    return (e.select(ts_day_str().alias("day"),
                     ts_hour().cast("string").alias("hr"),
                     dec("value", MONEY).alias("v"))
             .rollup("day", "hr")
             .agg(F.count(F.lit(1)).alias("n_events"),
                  F.sum("v").cast("double").alias("sum_value")))


EWMA_K = 8   # FIR taps; weights 0.5^j are exact binary fractions


def _ewma_exprs() -> tuple[str, str]:
    """Numerator/denominator of the truncated EWMA as ONE fixed-order
    expression string, shared verbatim by Spark SQL and DuckDB (both
    parse the same exact-binary weight literals and apply the same
    correctly-rounded IEEE ops in the same association order)."""
    num, den = "(v * 1.0)", "1.0"
    for j in range(1, EWMA_K):
        wj = repr(0.5 ** j)
        num = f"({num} + coalesce(l{j} * {wj}, 0.0))"
        den = (f"({den} + (CASE WHEN l{j} IS NOT NULL"
               f" THEN {wj} ELSE 0.0 END))")
    return num, den


def q_events_ewma(spark, sf_dir):
    """Per-user exponentially-weighted moving average of event value —
    the standard smoothing/drift signal — in TRUNCATED (FIR) form:
    ewma_t = sum_{j<8} 0.5^j v_{t-j} / sum_{j<8} 0.5^j over the taps
    that exist (fewer near a user's start).

    The truncation is what makes the operator both scale-safe and
    engine-exact: the recursive IIR form is a sequential scan per user
    (and accumulates float error in engine-specific order), while the
    FIR form is 7 LAGs in ONE bounded window frame — one shuffle on
    user_id, constant per-row state, and a fixed-order expression both
    engines evaluate bit-identically (weights 0.5^j are exact binary
    fractions).  Tail error of the truncation is 2^-8 of the weight
    mass, folded into the renormalizing denominator.
    """
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("obs_us", "event_id")
    base = e.select("user_id", "event_id",
                    F.unix_micros("ts").alias("obs_us"),
                    F.col("value").cast("double").alias("v"))
    lagged = base.select(
        "*", *[F.lag("v", j).over(w).alias(f"l{j}")
               for j in range(1, EWMA_K)])
    num, den = _ewma_exprs()
    # FLOOR-quantized micros, not round(x, 6): Spark rounds the double
    # via exact BigDecimal HALF_UP while DuckDB rounds in double, so
    # half-tie quotients near 5e-7 can diverge; FLOOR of bit-identical
    # doubles is bit-identical (the _corr_e6_expr convention, ADVICE r04).
    return lagged.selectExpr(
        "user_id", "obs_us", "event_id", "v AS value",
        f"CAST(floor(({num} / {den}) * 1e6) AS BIGINT) AS ewma_e6")


TREND_TOP = 5


def q_trending(spark, sf_dir):
    """Trending values: per hour, the top-5 ``props.k`` values by count
    GROWTH versus the previous hour — the period-over-period "what's
    rising" analytics shape (trending hashtags/queries/SKUs).

    Built the scale-correct way around: the fact table first compacts
    to (hour, k) counts with a partial+final agg, and every window
    (the per-k lag, the per-hour rank) runs over that tiny aggregated
    relation — |hours| x |k| rows — never over raw events.  First
    appearance counts as growth from zero (coalesce), matching the
    common product definition.  Rank ties break on (growth desc, k)
    for a total order.
    """
    e = load_table(spark, sf_dir, "events")
    hour_us = 3_600_000_000
    k = F.get_json_object("props", "$.k").cast("int")
    c = (e.select((F.unix_micros("ts") - F.unix_micros("ts") % hour_us)
                  .alias("hour_us"), k.alias("k"))
          .filter(F.col("k").isNotNull())
          .groupBy("hour_us", "k").agg(F.count(F.lit(1)).alias("n")))
    w_lag = W.partitionBy("k").orderBy("hour_us")
    g = (c.withColumn("prev_hour", F.lag("hour_us").over(w_lag))
          .withColumn("prev_n", F.lag("n").over(w_lag))
          .withColumn("growth", F.col("n") - F.coalesce(
              F.when(F.col("prev_hour") == F.col("hour_us") - hour_us,
                     F.col("prev_n")), F.lit(0))))
    w_rk = W.partitionBy("hour_us").orderBy(F.desc("growth"), "k")
    return (g.withColumn("rk", F.row_number().over(w_rk))
             .filter(F.col("rk") <= TREND_TOP)
             .select("hour_us", "k", "n", "growth", "rk"))


PEAK_MIN = 5   # a peak must have at least this many events


def q_peak_detection(spark, sf_dir):
    """Local-maximum peak detection over the hourly event-count series
    per type: hours whose count strictly exceeds both neighbors (and a
    noise floor) — the spike detector next to the MAD outlier test
    (value-level) and EWMA (smoothing) in the anomaly toolkit.

    Scale: the series is the COMPACTED (type, hour) count relation —
    one partial+final agg off the fact scan; the neighbor lags are a
    window over that tiny series (|types| x |hours| rows).  Missing
    hours break the neighbor chain (lag is the previous OBSERVED hour)
    — an absent neighbor counts as zero only when truly adjacent,
    integer comparisons throughout.
    """
    e = load_table(spark, sf_dir, "events")
    hour_us = 3_600_000_000
    c = (e.groupBy("event_type",
                   (F.unix_micros("ts") - F.unix_micros("ts") % hour_us)
                   .alias("hour_us"))
          .agg(F.count(F.lit(1)).alias("n")))
    w = W.partitionBy("event_type").orderBy("hour_us")
    g = (c.withColumn("prev_h", F.lag("hour_us").over(w))
          .withColumn("prev_n", F.lag("n").over(w))
          .withColumn("next_h", F.lead("hour_us").over(w))
          .withColumn("next_n", F.lead("n").over(w)))
    prev_adj = F.when(F.col("prev_h") == F.col("hour_us") - hour_us,
                      F.col("prev_n")).otherwise(0)
    next_adj = F.when(F.col("next_h") == F.col("hour_us") + hour_us,
                      F.col("next_n")).otherwise(0)
    return (g.filter((F.col("n") > prev_adj) & (F.col("n") > next_adj)
                     & (F.col("n") >= PEAK_MIN))
             .select("event_type", "hour_us", "n",
                     prev_adj.alias("prev_n"), next_adj.alias("next_n")))


ACF_MAX_LAG = 3
_HOUR_US = 3_600_000_000


def _corr_e6_expr(m, sx, sy, sxx, syy, sxy) -> str:
    """Pearson correlation from exact integer sufficient statistics as
    ONE fixed-order expression string shared verbatim by Spark SQL and
    DuckDB.  num/var terms stay in integer arithmetic (exact in both
    engines at these magnitudes), each is cast to DOUBLE once, and the
    single divide + sqrt are correctly-rounded IEEE ops — bit-identical
    everywhere.  The value leaves as floor(corr * 1e6) (FLOOR before the
    BIGINT cast: DuckDB's CAST(double AS BIGINT) rounds while Spark's
    truncates), sidestepping round()'s half-tie divergence entirely.
    Zero-variance groups yield NULL (den = 0)."""
    num = f"CAST({m} * {sxy} - {sx} * {sy} AS DOUBLE)"
    vx = f"CAST({m} * {sxx} - {sx} * {sx} AS DOUBLE)"
    vy = f"CAST({m} * {syy} - {sy} * {sy} AS DOUBLE)"
    return (f"CAST(FLOOR(CASE WHEN {vx} > 0 AND {vy} > 0 THEN "
            f"{num} / sqrt({vx} * {vy}) * 1000000.0 END) AS BIGINT)")


def _dense_hourly(spark, sf_dir):
    """Gap-filled hourly event-count series per type: (event_type,
    bucket_us, v) with v = 0 on hours inside the observed span that saw
    no events.

    Scale shape: the fact table compacts to (type, hour) counts with
    one partial+final agg FIRST; the gap fill is the join-free
    lead + explode(sequence) recipe of q_ts_resample_ffill over that
    compacted relation, so every window/generator touches |types| x
    |hours| rows — bounded by the time span, never by event volume.
    """
    e = load_table(spark, sf_dir, "events")
    c = (e.groupBy("event_type",
                   (F.unix_micros("ts") - F.unix_micros("ts") % _HOUR_US)
                   .alias("hour_us"))
          .agg(F.count(F.lit(1)).alias("n")))
    w = W.partitionBy("event_type").orderBy("hour_us")
    return (c.withColumn("nxt", F.lead("hour_us").over(w))
             .select("event_type", "hour_us", "n",
                     F.explode(F.sequence(
                         "hour_us",
                         F.coalesce(F.col("nxt") - _HOUR_US, F.col("hour_us")),
                         F.lit(_HOUR_US))).alias("bucket_us"))
             .select("event_type", "bucket_us",
                     F.when(F.col("bucket_us") == F.col("hour_us"),
                            F.col("n")).otherwise(F.lit(0)).alias("v")))


# DuckDB twin of _dense_hourly, shared by the ACF and changepoint
# oracles (same two CTEs, independent engine).
_DENSE_HOURLY_SQL = """
    c AS (
        SELECT event_type,
               epoch_us(ts) - epoch_us(ts) % 3600000000 AS hour_us,
               COUNT(*) AS n
        FROM events GROUP BY 1, 2),
    dense AS (
        SELECT event_type, bucket_us,
               CASE WHEN bucket_us = hour_us THEN n ELSE 0 END AS v
        FROM (
            SELECT event_type, hour_us, n,
                   unnest(generate_series(
                       hour_us,
                       COALESCE(LEAD(hour_us) OVER (
                           PARTITION BY event_type ORDER BY hour_us)
                           - 3600000000, hour_us),
                       3600000000)) AS bucket_us
            FROM c))
"""


def q_events_autocorrelation(spark, sf_dir):
    """Autocorrelation function (lags 1..3) of the hourly event-count
    series per type — the standard seasonality/burstiness diagnostic a
    telemetry pipeline runs before picking window sizes or forecast
    models.

    Definition: Pearson correlation between the gap-filled series and
    its lag-k shift, over the aligned pairs (missing hours count as 0,
    so a sparse bursty type reads differently from a steady one).  The
    dense series is the compacted relation of _dense_hourly; the k lags
    are one bounded window over it, unpivoted to long form by stack();
    the sufficient statistics (m, Σx, Σy, Σx², Σy², Σxy) accumulate as
    exact BIGINTs in one partial+final agg, and the only float ops are
    the final shared-expression divide + sqrt (_corr_e6_expr) — so the
    result is bit-identical across engines and partitionings.
    """
    dense = _dense_hourly(spark, sf_dir)
    w = W.partitionBy("event_type").orderBy("bucket_us")
    lagged = dense.select(
        "event_type", "v",
        *[F.lag("v", k).over(w).alias(f"l{k}")
          for k in range(1, ACF_MAX_LAG + 1)])
    stack_args = ", ".join(f"{k}, l{k}" for k in range(1, ACF_MAX_LAG + 1))
    pairs = (lagged.selectExpr(
                "event_type", "v",
                f"stack({ACF_MAX_LAG}, {stack_args}) AS (lag, y)")
             .filter(F.col("y").isNotNull()))
    stats = (pairs.groupBy("event_type", "lag")
             .agg(F.count(F.lit(1)).alias("m"),
                  F.sum("v").alias("sx"), F.sum("y").alias("sy"),
                  F.sum(F.col("v") * F.col("v")).alias("sxx"),
                  F.sum(F.col("y") * F.col("y")).alias("syy"),
                  F.sum(F.col("v") * F.col("y")).alias("sxy")))
    return stats.selectExpr(
        "event_type", "lag", "m",
        _corr_e6_expr("m", "sx", "sy", "sxx", "syy", "sxy")
        + " AS acf_e6")


XCORR_A, XCORR_B = "purchase", "click"
XCORR_MAX_LAG = 6


def q_events_crosscorr(spark, sf_dir):
    """Lagged cross-correlation between the hourly '{a}' and '{b}'
    count series (lags 0..{k} hours): "does a click surge lead a
    purchase surge, and by how many hours" — the lead-lag diagnostic
    behind attribution windows and forecast feature selection, and the
    two-series sibling of q_events_autocorrelation.

    Both series are the gap-filled compacted relations of
    _dense_hourly (|hours| rows, never event volume); each lag aligns
    x_t with y_(t+lag) by an equi-join on the shifted hour key (the
    {k}+1 probes ride ONE explode of the tiny series — no per-lag
    scan), and the sufficient statistics accumulate as exact BIGINTs
    in one partial+final agg.  The only float math is the shared
    _corr_e6_expr divide+sqrt — bit-identical across engines.  Pairs
    exist where BOTH series' spans cover the shifted hour (inner
    join), so m varies by lag and is emitted.
    """.format(a=XCORR_A, b=XCORR_B, k=XCORR_MAX_LAG)
    dense = _dense_hourly(spark, sf_dir)
    a = (dense.filter(F.col("event_type") == XCORR_A)
              .select(F.col("bucket_us").alias("t"), F.col("v").alias("x")))
    b = (dense.filter(F.col("event_type") == XCORR_B)
              .select(F.col("bucket_us").alias("tb"),
                      F.col("v").alias("y")))
    al = a.select(
        "t", "x",
        F.explode(F.sequence(F.lit(0), F.lit(XCORR_MAX_LAG))).alias("lag"))
    j = al.join(b, al["t"] + al["lag"] * _HOUR_US == b["tb"])
    stats = (j.groupBy("lag")
              .agg(F.count(F.lit(1)).alias("m"),
                   F.sum("x").alias("sx"), F.sum("y").alias("sy"),
                   F.sum(F.col("x") * F.col("x")).alias("sxx"),
                   F.sum(F.col("y") * F.col("y")).alias("syy"),
                   F.sum(F.col("x") * F.col("y")).alias("sxy")))
    return stats.selectExpr(
        "lag", "m",
        _corr_e6_expr("m", "sx", "sy", "sxx", "syy", "sxy")
        + " AS xcorr_e6")


def q_events_concurrency(spark, sf_dir):
    """Sweep-line concurrency: at every interval boundary, how many
    user-sessions are open — the classic "concurrent connections /
    active sessions over time" operator, done the scale-correct way.

    Intervals are each user's daily activity span [min ts, max ts]
    (q_interval_overlap's relation).  Each interval emits (+1 at s,
    -1 at e+1); simultaneous boundaries collapse with a groupBy (so no
    within-tie ordering exists to disagree on), and the running open
    count is a TWO-LEVEL prefix sum — per-day partial sums inside a
    window partitioned by the boundary's day, plus per-day offsets from
    a window over the tiny |days| relation (shard_assignment's recipe;
    ordering by (day, us) equals ordering by us since day = us div
    86400s).  No global single-task window ever sees the boundary
    stream; the oracle deliberately uses the opposite construction (one
    flat running sum) so two independent prefix-sum plans must agree.
    All integers, exact at any scale.
    """
    e = load_table(spark, sf_dir, "events")
    day_us = 86_400_000_000
    us = F.unix_micros("ts")
    iv = (e.groupBy("user_id", (us - us % day_us).alias("d"))
           .agg(F.min(us).alias("s"), F.max(us).alias("e")))
    bounds = (iv.select(F.col("s").alias("us"), F.lit(1).alias("delta"))
                .union(iv.select((F.col("e") + 1).alias("us"),
                                 F.lit(-1).alias("delta")))
                .groupBy("us").agg(F.sum("delta").alias("delta"))
                .withColumn("bucket", (F.col("us") - F.col("us") % day_us)))
    btot = bounds.groupBy("bucket").agg(F.sum("delta").alias("bsum"))
    w_off = W.orderBy("bucket").rowsBetween(W.unboundedPreceding, -1)
    offs = btot.select("bucket",
                       F.coalesce(F.sum("bsum").over(w_off), F.lit(0))
                        .alias("off"))
    w_in = (W.partitionBy("bucket").orderBy("us")
             .rowsBetween(W.unboundedPreceding, W.currentRow))
    return (bounds.join(F.broadcast(offs), "bucket")
                  .select("us", "delta",
                          (F.col("off") + F.sum("delta").over(w_in))
                          .alias("n_open")))


def q_events_changepoint(spark, sf_dir):
    """Single change-point detection per event type: the split of the
    hourly count series maximizing the standardized mean-shift
    statistic |mean(left) - mean(right)| * sqrt(t*(T-t)/T) — the
    CUSUM-family "where did the level change" diagnostic (binary
    segmentation's scoring step), over the gap-filled series.

    The recursive CUSUM clamp is deliberately avoided — this prefix-sum
    formulation gives the same argmax split for a single level change
    and is expressible as ONE bounded window pass: running sum + row
    number over the compacted dense series (|hours| rows per type),
    then a shared fixed-order IEEE expression on exact integers for the
    score and a rank-1 pick with (score desc, t) total order.  Ties in
    the double score break on t — and since both engines compute the
    identical bits, the tie-break agrees.
    """
    dense = _dense_hourly(spark, sf_dir)
    w = W.partitionBy("event_type").orderBy("bucket_us")
    grp = W.partitionBy("event_type")
    ranked = dense.select(
        "event_type", "bucket_us",
        F.row_number().over(w).alias("t"),
        F.sum("v").over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
         .alias("cum"),
        F.count(F.lit(1)).over(grp).alias("n_hours"),
        F.sum("v").over(grp).alias("s_total"))
    d = ("(CAST(cum AS DOUBLE) / CAST(t AS DOUBLE)"
         " - CAST(s_total - cum AS DOUBLE) / CAST(n_hours - t AS DOUBLE))")
    score = (f"abs({d}) * sqrt(CAST(t AS DOUBLE)"
             f" * CAST(n_hours - t AS DOUBLE) / CAST(n_hours AS DOUBLE))")
    scored = (ranked.filter(F.col("t") < F.col("n_hours"))
              .selectExpr("event_type", "bucket_us", "t", "n_hours",
                          f"CAST(FLOOR({score} * 1000000.0) AS BIGINT)"
                          " AS score_e6"))
    w_rk = W.partitionBy("event_type").orderBy(F.desc("score_e6"), "t")
    return (scored.withColumn("rk", F.row_number().over(w_rk))
                  .filter(F.col("rk") == 1)
                  .select("event_type", F.col("bucket_us").alias("split_us"),
                          "t", "n_hours", "score_e6"))


SLIDE_DAYS = 7


def q_sliding_distinct_7d(spark, sf_dir):
    """Trailing-7-day distinct active users (and event volume) per day —
    the rolling-DAU/WAU shape.  COUNT(DISTINCT) over a sliding frame is
    not a windowable aggregate in either engine, so the scale-correct
    form is: compact to (user, day) presence rows first (one
    partial+final agg), then each presence row covers days d..d+6 via
    explode(sequence) — a fixed x7 fan-out of the COMPACTED relation,
    not of raw events — and one final (day, user)-keyed dedup-count.
    The oracle uses the opposite construction (day grid x presence
    range join) so two independent window definitions must agree.
    Output days are clipped to the observed [min, max] day span (the
    trailing windows that extend past the last observed day are
    phantom periods a dashboard would not render).
    """
    e = load_table(spark, sf_dir, "events")
    pres = (e.groupBy("user_id", ts_day().alias("d"))
             .agg(F.count(F.lit(1)).alias("n_events")))
    # The max-day clip stays IN the plan (broadcast 1-row aggregate),
    # not a build-time collect — building the DataFrame must not run a
    # Spark job (ADVICE r04; every other queries() builder is lazy).
    hi = F.broadcast(pres.agg(F.max("d").alias("hi")))
    cover = (pres.crossJoin(hi)
                 .select(
                "user_id", "n_events",
                F.explode(F.sequence(
                    "d", F.least(F.col("d") + (SLIDE_DAYS - 1), F.col("hi"))))
                 .alias("day")))
    return (cover.groupBy("day")
                 .agg(F.countDistinct("user_id").alias("n_users_7d"),
                      F.sum("n_events").alias("n_events_7d")))


def q_cumulative_distinct_users(spark, sf_dir):
    """Cumulative unique users per day (the "total registered users"
    growth curve): distinct-so-far cannot window-aggregate, but it
    EQUALS the running sum of first-appearance counts — so the plan is
    min(day)-per-user (one partial+final agg), a |days|-row
    new-user-count relation, and one running sum over the observed-day
    grid.  The fact table shuffles once on user_id; every window
    touches at most |days| rows.  The oracle uses the independent
    range-join construction (count users with first day <= d) so two
    formulations must agree.  Days with no new users still appear
    (left join against the observed-day grid), carrying the running
    total forward.
    """
    e = load_table(spark, sf_dir, "events")
    day = ts_day()
    firsts = (e.groupBy("user_id").agg(F.min(day).alias("fday")))
    newc = firsts.groupBy(F.col("fday").alias("day")) \
                 .agg(F.count(F.lit(1)).alias("n_new_users"))
    grid = e.select(day.alias("day")).distinct()
    w = W.orderBy("day").rowsBetween(W.unboundedPreceding, W.currentRow)
    return (grid.join(newc, "day", "left")
                .select("day",
                        F.coalesce("n_new_users", F.lit(0))
                         .alias("n_new_users"))
                .withColumn("cum_users", F.sum("n_new_users").over(w)))


def q_streak_longest(spark, sf_dir):
    """Longest consecutive-day activity streak per user — the classic
    gaps-and-islands window composition (engagement metric; also the
    shape behind "N consecutive days above threshold" alerts).

    Events first compact to distinct (user_id, day) — the partial+final
    distinct shrinks the fact table to at most |users| x |days| rows
    before any window — then day - row_number() within the user labels
    each run of consecutive days with a constant island id, and two
    small aggs produce the longest run.  One shuffle on user_id; every
    window partition is bounded by one user's active-day count.
    """
    e = load_table(spark, sf_dir, "events")
    day = ts_day()
    days = e.select("user_id", day.alias("day")).distinct()
    w = W.partitionBy("user_id").orderBy("day")
    isl = days.withColumn("isl", F.col("day") - F.row_number().over(w))
    runs = (isl.groupBy("user_id", "isl")
               .agg(F.count(F.lit(1)).alias("run_len")))
    return (runs.groupBy("user_id")
                .agg(F.max("run_len").alias("longest_streak"),
                     F.sum("run_len").alias("n_active_days")))


def q_events_seasonality(spark, sf_dir):
    """Seasonal load profile: events per (type, day-of-week, hour) cell
    with the cell's load relative to the type's flat-profile baseline
    in exact ppm — the "when does traffic happen" heatmap, and the
    denominator a capacity planner or anomaly detector normalizes by.

    One partial+final agg to the 5x7x24 cell grid; the per-type totals
    re-aggregate that tiny relation and broadcast back.  load_ppm =
    floor(n*168e6 / total) uses the markov p_ppm fixed-point recipe
    (168 = cells per type): both engines evaluate the same fixed-order
    IEEE expression on exact integer inputs, so the floored value is
    identical.  Day-of-week is the portable epoch-day mod 7.
    """
    e = load_table(spark, sf_dir, "events")
    dow = F.pmod(ts_day(), F.lit(7))
    cells = (e.groupBy("event_type", dow.alias("dow"),
                       ts_hour().alias("hour"))
              .agg(F.count(F.lit(1)).alias("n_events")))
    tot = cells.groupBy("event_type").agg(F.sum("n_events").alias("t"))
    load = F.floor(F.col("n_events").cast("double") * 168_000_000.0
                   / F.col("t").cast("double")).cast("long")
    return (cells.join(F.broadcast(tot), "event_type")
                 .select("event_type", "dow", "hour", "n_events",
                         load.alias("load_ppm")))


ACTIVE_WINDOW_US = 10 * 60 * 1_000_000


def q_intervals_union(spark, sf_dir):
    """Merged-interval active time per user: each event opens a 10-min
    activity interval, overlapping intervals merge, and the user's
    total active time is the union's length — the classic
    merge-overlapping-intervals operator (billing minutes, machine
    uptime, "time actually engaged" vs raw event counts).

    Gaps-and-islands on the interval stream: a row starts a new island
    iff its start exceeds the running max end of all earlier intervals
    (one window, shuffled once on user_id); each island's union is
    contiguous by construction, so its length is max(end) - min(start)
    and two tiny aggs finish the job.  All arithmetic in integer epoch
    micros.
    """
    e = load_table(spark, sf_dir, "events")
    base = e.select("user_id", "event_id",
                    F.unix_micros("ts").alias("s"),
                    (F.unix_micros("ts") + ACTIVE_WINDOW_US).alias("en"))
    w = W.partitionBy("user_id").orderBy("s", "event_id")
    prevmax = F.max("en").over(w.rowsBetween(W.unboundedPreceding, -1))
    tagged = base.withColumn(
        "new_isl",
        F.when(prevmax.isNull() | (F.col("s") > prevmax), 1).otherwise(0))
    isl = tagged.withColumn(
        "isl", F.sum("new_isl").over(
            w.rowsBetween(W.unboundedPreceding, W.currentRow)))
    spans = (isl.groupBy("user_id", "isl")
                .agg(F.min("s").alias("lo"), F.max("en").alias("hi")))
    return (spans.groupBy("user_id")
                 .agg(F.sum(F.col("hi") - F.col("lo")).alias("active_us"),
                      F.count(F.lit(1)).alias("n_intervals")))


def q_rolling_zscore(spark, sf_dir):
    """Trailing-30-day rolling z-score of each order against the
    customer's own recent spend — "is THIS order unusual for THIS
    customer lately", the personalized-anomaly staple (global z-scores
    miss a whale's normal being another customer's outlier).

    One RANGE frame (value-based, so same-day orders are frame peers —
    deterministic without a tie-break) computes trailing count / sum /
    sum-of-squares in exact DECIMAL; mean, population variance, and
    the z-score are fixed-order IEEE expressions on those per-row
    scalars, floored at 1e-6.  Orders with <2 trailing peers emit a
    NULL z (variance undefined); zero-variance windows likewise.  One
    shuffle on o_custkey.
    """
    o = load_table(spark, sf_dir, "orders")
    od = o.withColumn("day",
                      F.datediff(F.col("o_orderdate"), F.lit("1970-01-01")))
    p = dec("o_totalprice", MONEY)
    wr = W.partitionBy("o_custkey").orderBy("day").rangeBetween(-30, 0)
    base = od.select(
        "o_orderkey", "o_custkey", "day", p.alias("price"),
        F.count(F.lit(1)).over(wr).alias("n"),
        F.sum(p).over(wr).alias("s"),
        F.sum(p * p).over(wr).alias("q"))
    nd = F.col("n").cast("double")
    sd, qd = F.col("s").cast("double"), F.col("q").cast("double")
    var = (nd * qd - sd * sd) / (nd * nd)
    z = (F.col("price").cast("double") - sd / nd) / F.sqrt(var)
    return base.select(
        "o_orderkey", "o_custkey", "day", "n",
        F.when((F.col("n") >= 2) & (var > 0), F.floor(z * 1e6))
         .cast("long").alias("z_e6"))


HOLT_ALPHA, HOLT_BETA = 0.5, 0.3
HOLT_MAX_LAG = 400


def _holt_weights():
    """Per-lag forecast coefficients for Holt's linear method.

    The recurrence l_t = a*y_t + (1-a)(l_{t-1}+b_{t-1}),
    b_t = a*b*y_t - a*b*l_{t-1} + (1-a*b)*b_{t-1} (init l_1=y_1,
    b_1=0) is LINEAR: state_T = M^(T-1) e1 y_1 + sum_{t>=2} M^(T-t) g
    y_t with constant M, so the one-step forecast l_T + b_T is a pure
    weighted sum of the series where each y_t's weight depends only on
    its lag from the end (plus a special column for the first point).
    That turns a sequential fold into ONE broadcast-join + exact
    integer aggregate — no recursion, no window scan over the series.
    Weights are computed once here, quantized to integer e6, and
    shared verbatim by the Spark plan and the DuckDB oracle (the
    decayed-engagement weight-table recipe): the operator's contract
    is quantized-weight Holt, identical in both engines.
    """
    import math
    a, b = HOLT_ALPHA, HOLT_BETA
    m = ((1.0 - a, 1.0 - a), (-a * b, 1.0 - a * b))
    p = ((1.0, 0.0), (0.0, 1.0))
    rows = []
    for lag in range(HOLT_MAX_LAG + 1):
        wf_g = (p[0][0] + p[1][0]) * a + (p[0][1] + p[1][1]) * a * b
        wf_e1 = p[0][0] + p[1][0]
        rows.append((lag, int(math.floor(wf_g * 1e6)),
                     int(math.floor(wf_e1 * 1e6))))
        p = (
            (m[0][0] * p[0][0] + m[0][1] * p[1][0],
             m[0][0] * p[0][1] + m[0][1] * p[1][1]),
            (m[1][0] * p[0][0] + m[1][1] * p[1][0],
             m[1][0] * p[0][1] + m[1][1] * p[1][1]),
        )
    return tuple(rows)


_HOLT_W = _holt_weights()


def q_events_holt_forecast(spark, sf_dir):
    """Holt double-exponential one-step forecast of daily revenue per
    event_type (level + trend smoothing, the EWMA upgrade that tracks
    a drifting series) — evaluated in closed form as a lag-weighted
    sum (see _holt_weights), so the "iterative" smoother costs one
    exact DECIMAL rollup + one broadcast join + one integer fold.

    The series is the daily-revenue rollup in integer cents; rank and
    length come from one window over that tiny (|types| x |days|)
    relation; every term is cents * weight_e6 in BIGINT (exact), the
    per-type sum is order-independent, and the only float op is the
    final descale.  Missing days per type compress ranks (position
    lag, not calendar lag) — robust to sparse types.
    """
    e = load_table(spark, sf_dir, "events")
    day = ts_day()
    daily = (e.groupBy("event_type", day.alias("day"))
              .agg((F.sum(dec("value", MONEY)) * 100)
                   .cast("long").alias("cents")))
    wt = W.partitionBy("event_type")
    ranked = (daily
              .withColumn("rn", F.row_number().over(wt.orderBy("day")))
              .withColumn("t_len", F.count(F.lit(1)).over(wt))
              .withColumn("lag", F.col("t_len") - F.col("rn")))
    w = spark.createDataFrame(
        list(_HOLT_W), "lag int, wf_g_e6 long, wf_e1_e6 long")
    # LEFT join + COALESCE(weight, 0) (ADVICE r05): the weight table
    # stops at HOLT_MAX_LAG, but the closed-form weights have floored
    # to 0 long before lag 400 — so points older than the table get
    # the weight an extended table would give them (exactly 0) instead
    # of being silently dropped while n_days still counts them.
    term = F.col("cents") * F.coalesce(
        F.when(F.col("rn") == 1, F.col("wf_e1_e6"))
         .otherwise(F.col("wf_g_e6")), F.lit(0))
    return (ranked.join(F.broadcast(w), "lag", "left")
            .groupBy("event_type")
            .agg(F.max("t_len").alias("n_days"),
                 F.sum(term).alias("s"))
            .select("event_type", "n_days",
                    F.floor(F.col("s").cast("double") / F.lit(1e6))
                     .cast("long").alias("forecast_cents")))


QUERIES = {
    "events_holt_forecast": q_events_holt_forecast,
    "events_ewma_smooth": q_events_ewma,
    "window_streak_longest": q_streak_longest,
    "events_seasonality_profile": q_events_seasonality,
    "intervals_union_active_time": q_intervals_union,
    "window_rolling_zscore_30d": q_rolling_zscore,
    "window_cumulative_distinct_users": q_cumulative_distinct_users,
    "events_autocorrelation": q_events_autocorrelation,
    "events_crosscorr_lagged": q_events_crosscorr,
    "events_concurrency_sweep": q_events_concurrency,
    "events_changepoint_meanshift": q_events_changepoint,
    "window_sliding_distinct_7d": q_sliding_distinct_7d,
    "events_trending_k": q_trending,
    "events_peak_detection": q_peak_detection,
    "rollup_time_hierarchy": q_rollup_time_hierarchy,
    "ts_subsequence_search": q_ts_subsequence_search,
    "window_tumbling_events": q_window_tumbling,
    "ohlc_hourly": q_ohlc_hourly,
    "window_sliding_events": q_window_sliding,
    "window_range_frame_30d": q_window_range_frame,
    "join_interval_overlap": q_interval_overlap,
    "ts_resample_ffill": q_ts_resample_ffill,
    "ts_resample_interp": q_ts_resample_interp,
}

_SUBSEQ_COLS = ",\n                   ".join(
    f"lead(CAST(value AS DECIMAL(12,2)), {i}) OVER "
    f"(PARTITION BY user_id ORDER BY ts, event_id) AS v{i}"
    for i in range(SUBSEQ_M))
_SUBSEQ_DIST = " + ".join(f"(w.v{i} - q.v{i}) * (w.v{i} - q.v{i})"
                          for i in range(SUBSEQ_M))

ORACLE = {
    "rollup_time_hierarchy": """
        SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day, EXTRACT(hour FROM ts)::VARCHAR AS hr,
               COUNT(*) AS n_events,
               SUM(CAST(value AS DECIMAL(12,2)))::DOUBLE AS sum_value
        FROM events GROUP BY ROLLUP (day, hr)
    """,
    "ts_subsequence_search": f"""
        WITH win AS (
            SELECT user_id, epoch_us(ts) AS start_us, event_id,
                   {_SUBSEQ_COLS}
            FROM events),
        full_win AS (SELECT * FROM win WHERE v{SUBSEQ_M - 1} IS NOT NULL),
        q AS (
            SELECT * FROM full_win WHERE user_id = 1
            ORDER BY start_us, event_id LIMIT 1)
        SELECT user_id, start_us, dist FROM (
            SELECT w.user_id, w.start_us, w.event_id,
                   CAST({_SUBSEQ_DIST} AS DOUBLE) AS dist
            FROM full_win w, q
            ORDER BY dist, w.user_id, w.start_us, w.event_id
            LIMIT {SUBSEQ_K})
    """,
    "ohlc_hourly": """
        WITH x AS (
            SELECT event_type, epoch_us(date_trunc('hour', ts)) AS hr_us,
                   CAST(value AS DECIMAL(12,2)) AS v,
                   ROW_NUMBER() OVER (PARTITION BY event_type,
                                                   date_trunc('hour', ts)
                                      ORDER BY ts, event_id) AS ra,
                   ROW_NUMBER() OVER (PARTITION BY event_type,
                                                   date_trunc('hour', ts)
                                      ORDER BY ts DESC, event_id DESC) AS rz
            FROM events)
        SELECT event_type, hr_us,
               CAST(max(CASE WHEN ra = 1 THEN v END) AS DOUBLE) AS "open",
               CAST(max(v) AS DOUBLE) AS high,
               CAST(min(v) AS DOUBLE) AS low,
               CAST(max(CASE WHEN rz = 1 THEN v END) AS DOUBLE) AS "close",
               count(*) AS n
        FROM x GROUP BY 1, 2
    """,
    "window_tumbling_events": """
        SELECT epoch_us(time_bucket(INTERVAL '1 hour', ts)) AS window_start_us,
               event_type,
               COUNT(*) AS n_events,
               SUM(CAST(value AS DECIMAL(12,2)))::DOUBLE AS sum_value
        FROM events GROUP BY 1, 2
    """,
    "window_sliding_events": """
        WITH exploded AS (
            SELECT unnest([time_bucket(INTERVAL '30 minutes', ts),
                           time_bucket(INTERVAL '30 minutes', ts)
                             - INTERVAL '30 minutes']) AS wstart,
                   user_id, value
            FROM events)
        SELECT epoch_us(wstart) AS window_start_us,
               COUNT(*) AS n_events,
               COUNT(DISTINCT user_id) AS n_users,
               SUM(CAST(value AS DECIMAL(12,2)))::DOUBLE AS sum_value
        FROM exploded GROUP BY 1
    """,
    "join_interval_overlap": """
        WITH iv AS (
            SELECT user_id,
                   epoch_us(ts) - (epoch_us(ts) % 86400000000) AS day_us,
                   MIN(epoch_us(ts)) AS s, MAX(epoch_us(ts)) AS e
            FROM events GROUP BY 1, 2),
        pairs AS (
            SELECT a.day_us AS day_us, a.user_id AS user_a,
                   b.user_id AS user_b,
                   LEAST(a.e, b.e) - GREATEST(a.s, b.s) AS overlap_us
            FROM iv a JOIN iv b
              ON a.day_us = b.day_us AND a.user_id < b.user_id
            WHERE a.s <= b.e AND b.s <= a.e)
        SELECT day_us, user_a, user_b, overlap_us
        FROM pairs
        QUALIFY ROW_NUMBER() OVER (
            PARTITION BY user_a
            ORDER BY overlap_us DESC, day_us ASC, user_b ASC) <= 5
    """,
    "ts_resample_ffill": """
        WITH obs AS (
            SELECT user_id, bucket_us, value AS obs_value
            FROM (
                SELECT user_id,
                       epoch_us(ts) - (epoch_us(ts) % 3600000000) AS bucket_us,
                       value,
                       ROW_NUMBER() OVER (
                           PARTITION BY user_id,
                                        epoch_us(ts) - (epoch_us(ts) % 3600000000)
                           ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
                FROM events)
            WHERE rn = 1),
        grid AS (
            SELECT user_id,
                   unnest(generate_series(lo, hi, 3600000000)) AS bucket_us
            FROM (SELECT user_id, MIN(bucket_us) AS lo, MAX(bucket_us) AS hi
                  FROM obs GROUP BY 1))
        SELECT g.user_id, g.bucket_us,
               last_value(o.obs_value IGNORE NULLS) OVER (
                   PARTITION BY g.user_id ORDER BY g.bucket_us
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS value_ffill,
               CASE WHEN o.obs_value IS NULL THEN 1 ELSE 0 END AS is_gap
        FROM grid g LEFT JOIN obs o USING (user_id, bucket_us)
    """,
    "ts_resample_interp": """
        WITH obs AS (
            SELECT user_id, obs_us, value AS obs_value
            FROM (
                SELECT user_id,
                       epoch_us(ts) - (epoch_us(ts) % 3600000000) AS obs_us,
                       value,
                       ROW_NUMBER() OVER (
                           PARTITION BY user_id,
                                        epoch_us(ts) - (epoch_us(ts) % 3600000000)
                           ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
                FROM events)
            WHERE rn = 1),
        o2 AS (
            SELECT user_id, obs_us, obs_value,
                   LEAD(obs_us) OVER (PARTITION BY user_id ORDER BY obs_us)
                       AS nxt_us,
                   LEAD(obs_value) OVER (PARTITION BY user_id ORDER BY obs_us)
                       AS nxt_value
            FROM obs),
        filled AS (
            SELECT user_id, obs_us, obs_value, nxt_us, nxt_value,
                   unnest(generate_series(
                       obs_us, COALESCE(nxt_us - 3600000000, obs_us),
                       3600000000)) AS bucket_us
            FROM o2)
        SELECT user_id, bucket_us,
               CAST(FLOOR((CASE WHEN (bucket_us - obs_us) // 3600000000 = 0
                    THEN obs_value
                    ELSE obs_value + (nxt_value - obs_value)
                         * (((bucket_us - obs_us) // 3600000000)::DOUBLE
                            / ((nxt_us - obs_us) // 3600000000)::DOUBLE)
               END) * 1000000.0) AS BIGINT) AS value_interp_e6,
               CASE WHEN (bucket_us - obs_us) // 3600000000 > 0
                    THEN 1 ELSE 0 END AS is_gap
        FROM filled
    """,
    "window_range_frame_30d": """
        WITH od AS (
            SELECT o_orderkey, o_custkey, o_totalprice,
                   datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS day
            FROM orders)
        SELECT o_orderkey, o_custkey, day,
               SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
                   PARTITION BY o_custkey ORDER BY day
                   RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)::DOUBLE AS spend_30d,
               COUNT(*) OVER (
                   PARTITION BY o_custkey ORDER BY day
                   RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS n_orders_30d
        FROM od
    """,
}

_EWMA_LAGS = ", ".join(
    f"LAG(v, {j}) OVER (PARTITION BY user_id ORDER BY obs_us, event_id)"
    f" AS l{j}" for j in range(1, EWMA_K))
_EWMA_NUM, _EWMA_DEN = _ewma_exprs()
ORACLE["events_ewma_smooth"] = f"""
    WITH b AS (SELECT user_id, event_id, epoch_us(ts) AS obs_us,
                      CAST(value AS DOUBLE) AS v
               FROM events),
    l AS (SELECT user_id, event_id, obs_us, v, {_EWMA_LAGS} FROM b)
    SELECT user_id, obs_us, event_id, v AS value,
           CAST(FLOOR(({_EWMA_NUM} / {_EWMA_DEN}) * 1e6) AS BIGINT) AS ewma_e6
    FROM l
"""

ORACLE["events_trending_k"] = f"""
    WITH c AS (
        SELECT epoch_us(ts) - epoch_us(ts) % 3600000000 AS hour_us,
               CAST(json_extract_string(props, '$.k') AS INT) AS k,
               COUNT(*) AS n
        FROM events
        WHERE json_extract_string(props, '$.k') IS NOT NULL
        GROUP BY 1, 2),
    g AS (
        SELECT hour_us, k, n,
               n - COALESCE(CASE WHEN LAG(hour_us) OVER w
                                     = hour_us - 3600000000
                                 THEN LAG(n) OVER w END, 0) AS growth
        FROM c WINDOW w AS (PARTITION BY k ORDER BY hour_us)),
    r AS (
        SELECT hour_us, k, n, growth,
               ROW_NUMBER() OVER (PARTITION BY hour_us
                                  ORDER BY growth DESC, k) AS rk
        FROM g)
    SELECT hour_us, k, n, growth, rk FROM r WHERE rk <= {TREND_TOP}
"""

_ACF_LAGS = ", ".join(
    f"LAG(v, {k}) OVER (PARTITION BY event_type ORDER BY bucket_us)"
    f" AS l{k}" for k in range(1, ACF_MAX_LAG + 1))
_ACF_PAIRS = "\n        UNION ALL ".join(
    f'SELECT event_type, {k} AS "lag", v, l{k} AS y'
    f" FROM lagged WHERE l{k} IS NOT NULL"
    for k in range(1, ACF_MAX_LAG + 1))
ORACLE["events_autocorrelation"] = f"""
    WITH {_DENSE_HOURLY_SQL},
    lagged AS (
        SELECT event_type, bucket_us, v, {_ACF_LAGS} FROM dense),
    pairs AS (
        {_ACF_PAIRS}),
    stats AS (
        SELECT event_type, "lag", COUNT(*)::BIGINT AS m,
               SUM(v)::BIGINT AS sx, SUM(y)::BIGINT AS sy,
               SUM(v * v)::BIGINT AS sxx, SUM(y * y)::BIGINT AS syy,
               SUM(v * y)::BIGINT AS sxy
        FROM pairs GROUP BY 1, 2)
    SELECT event_type, "lag", m,
           {_corr_e6_expr('m', 'sx', 'sy', 'sxx', 'syy', 'sxy')} AS acf_e6
    FROM stats
"""

ORACLE["events_crosscorr_lagged"] = f"""
    WITH {_DENSE_HOURLY_SQL},
    a AS (SELECT bucket_us AS t, v AS x FROM dense
          WHERE event_type = '{XCORR_A}'),
    b AS (SELECT bucket_us AS tb, v AS y FROM dense
          WHERE event_type = '{XCORR_B}'),
    al AS (
        SELECT t, x, "lag"
        FROM a, unnest(generate_series(0, {XCORR_MAX_LAG})) AS l("lag")),
    j AS (SELECT al."lag", al.x, b.y FROM al
          JOIN b ON al.t + al."lag" * 3600000000 = b.tb),
    stats AS (
        SELECT "lag", COUNT(*)::BIGINT AS m,
               SUM(x)::BIGINT AS sx, SUM(y)::BIGINT AS sy,
               SUM(x * x)::BIGINT AS sxx, SUM(y * y)::BIGINT AS syy,
               SUM(x * y)::BIGINT AS sxy
        FROM j GROUP BY 1)
    SELECT "lag", m,
           {_corr_e6_expr('m', 'sx', 'sy', 'sxx', 'syy', 'sxy')}
               AS xcorr_e6
    FROM stats
"""

ORACLE["events_concurrency_sweep"] = """
    WITH iv AS (
        SELECT user_id,
               epoch_us(ts) - epoch_us(ts) % 86400000000 AS d,
               MIN(epoch_us(ts)) AS s, MAX(epoch_us(ts)) AS e
        FROM events GROUP BY 1, 2),
    b AS (
        SELECT us, SUM(delta)::BIGINT AS delta FROM (
            SELECT s AS us, 1 AS delta FROM iv
            UNION ALL
            SELECT e + 1 AS us, -1 AS delta FROM iv)
        GROUP BY 1)
    SELECT us, delta,
           SUM(delta) OVER (ORDER BY us
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
               AS n_open
    FROM b
"""

_CP_D = ("(CAST(cum AS DOUBLE) / CAST(t AS DOUBLE)"
         " - CAST(s_total - cum AS DOUBLE) / CAST(n_hours - t AS DOUBLE))")
_CP_SCORE = (f"abs({_CP_D}) * sqrt(CAST(t AS DOUBLE)"
             f" * CAST(n_hours - t AS DOUBLE) / CAST(n_hours AS DOUBLE))")
ORACLE["events_changepoint_meanshift"] = f"""
    WITH {_DENSE_HOURLY_SQL},
    ranked AS (
        SELECT event_type, bucket_us,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY bucket_us) AS t,
               SUM(v) OVER (PARTITION BY event_type ORDER BY bucket_us
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
               COUNT(*) OVER (PARTITION BY event_type) AS n_hours,
               SUM(v) OVER (PARTITION BY event_type) AS s_total
        FROM dense),
    scored AS (
        SELECT event_type, bucket_us, t, n_hours,
               CAST(FLOOR({_CP_SCORE} * 1000000.0) AS BIGINT) AS score_e6
        FROM ranked WHERE t < n_hours),
    best AS (
        SELECT event_type, bucket_us AS split_us, t, n_hours, score_e6,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY score_e6 DESC, t) AS rk
        FROM scored)
    SELECT event_type, split_us, t, n_hours, score_e6 FROM best WHERE rk = 1
"""

ORACLE["window_sliding_distinct_7d"] = f"""
    WITH pres AS (
        SELECT user_id,
               datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
               COUNT(*) AS n_events
        FROM events GROUP BY 1, 2),
    grid AS (
        SELECT unnest(generate_series(
            (SELECT MIN(d) FROM pres), (SELECT MAX(d) FROM pres), 1))
            AS day)
    SELECT g.day AS day,
           COUNT(DISTINCT p.user_id) AS n_users_7d,
           SUM(p.n_events)::BIGINT AS n_events_7d
    FROM grid g JOIN pres p ON p.d BETWEEN g.day - {SLIDE_DAYS - 1} AND g.day
    GROUP BY 1
"""

ORACLE["events_peak_detection"] = f"""
    WITH c AS (
        SELECT event_type,
               epoch_us(ts) - epoch_us(ts) % 3600000000 AS hour_us,
               COUNT(*) AS n
        FROM events GROUP BY 1, 2),
    g AS (
        SELECT event_type, hour_us, n,
               CASE WHEN LAG(hour_us) OVER w = hour_us - 3600000000
                    THEN LAG(n) OVER w ELSE 0 END AS prev_n,
               CASE WHEN LEAD(hour_us) OVER w = hour_us + 3600000000
                    THEN LEAD(n) OVER w ELSE 0 END AS next_n
        FROM c WINDOW w AS (PARTITION BY event_type ORDER BY hour_us))
    SELECT event_type, hour_us, n, prev_n, next_n
    FROM g WHERE n > prev_n AND n > next_n AND n >= {PEAK_MIN}
"""

ORACLE["window_cumulative_distinct_users"] = """
    WITH firsts AS (
        SELECT user_id,
               MIN(datediff('day', DATE '1970-01-01', CAST(ts AS DATE)))
                   AS fday
        FROM events GROUP BY 1),
    grid AS (
        SELECT DISTINCT datediff('day', DATE '1970-01-01',
                                 CAST(ts AS DATE)) AS day
        FROM events)
    SELECT g.day AS day,
           COUNT(CASE WHEN f.fday = g.day THEN 1 END)::BIGINT
               AS n_new_users,
           COUNT(CASE WHEN f.fday <= g.day THEN 1 END)::BIGINT
               AS cum_users
    FROM grid g CROSS JOIN firsts f
    GROUP BY 1
"""

ORACLE["window_streak_longest"] = """
    WITH days AS (
        SELECT DISTINCT user_id,
               datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day
        FROM events),
    isl AS (
        SELECT user_id, day,
               day - ROW_NUMBER() OVER (PARTITION BY user_id
                                        ORDER BY day) AS isl
        FROM days),
    runs AS (
        SELECT user_id, isl, COUNT(*)::BIGINT AS run_len
        FROM isl GROUP BY 1, 2)
    SELECT user_id, MAX(run_len) AS longest_streak,
           SUM(run_len)::BIGINT AS n_active_days
    FROM runs GROUP BY 1
"""

ORACLE["events_seasonality_profile"] = """
    WITH cells AS (
        SELECT event_type,
               datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) % 7
                   AS dow,
               EXTRACT(hour FROM ts)::INT AS hour,
               COUNT(*)::BIGINT AS n_events
        FROM events GROUP BY 1, 2, 3),
    tot AS (SELECT event_type, SUM(n_events)::BIGINT AS t
            FROM cells GROUP BY 1)
    SELECT c.event_type, c.dow, c.hour, c.n_events,
           CAST(FLOOR(CAST(c.n_events AS DOUBLE) * 168000000.0
                      / CAST(t.t AS DOUBLE)) AS BIGINT) AS load_ppm
    FROM cells c JOIN tot t USING (event_type)
"""

ORACLE["intervals_union_active_time"] = """
    WITH base AS (
        SELECT user_id, event_id, epoch_us(ts) AS s,
               epoch_us(ts) + 600000000 AS en
        FROM events),
    tagged AS (
        SELECT *, CASE WHEN s > COALESCE(MAX(en) OVER (
                            PARTITION BY user_id ORDER BY s, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND 1 PRECEDING), -1)
                       THEN 1 ELSE 0 END AS new_isl
        FROM base),
    isl AS (
        SELECT *, SUM(new_isl) OVER (PARTITION BY user_id
                                     ORDER BY s, event_id) AS isl
        FROM tagged),
    spans AS (SELECT user_id, isl, MIN(s) AS lo, MAX(en) AS hi
              FROM isl GROUP BY 1, 2)
    SELECT user_id, SUM(hi - lo)::BIGINT AS active_us,
           COUNT(*)::BIGINT AS n_intervals
    FROM spans GROUP BY 1
"""

ORACLE["window_rolling_zscore_30d"] = """
    WITH base AS (
        SELECT o_orderkey, o_custkey,
               datediff('day', DATE '1970-01-01', o_orderdate) AS day,
               CAST(o_totalprice AS DECIMAL(12,2)) AS price
        FROM orders),
    wins AS (
        SELECT o_orderkey, o_custkey, day, price,
               COUNT(*) OVER w AS n,
               SUM(price) OVER w AS s,
               SUM(price * price) OVER w AS q
        FROM base
        WINDOW w AS (PARTITION BY o_custkey ORDER BY day
                     RANGE BETWEEN 30 PRECEDING AND CURRENT ROW))
    SELECT o_orderkey, o_custkey, day, n::BIGINT AS n,
           CASE WHEN n >= 2
                 AND (CAST(n AS DOUBLE) * CAST(q AS DOUBLE)
                      - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
                     / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) > 0
                THEN CAST(FLOOR(
                    (CAST(price AS DOUBLE)
                     - CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                    / sqrt((CAST(n AS DOUBLE) * CAST(q AS DOUBLE)
                            - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
                           / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
                    * 1e6) AS BIGINT)
           END AS z_e6
    FROM wins
"""


def _holt_oracle() -> str:
    vals = ", ".join(f"({lag}, {g}, {e1})" for lag, g, e1 in _HOLT_W)
    return f"""
    WITH w(lag, wf_g_e6, wf_e1_e6) AS (VALUES {vals}),
    daily AS (
        SELECT event_type,
               datediff('day', DATE '1970-01-01', CAST(ts AS DATE))
                   AS day,
               CAST(SUM(CAST(value AS DECIMAL(12,2))) * 100 AS BIGINT)
                   AS cents
        FROM events GROUP BY 1, 2),
    ranked AS (
        SELECT event_type, cents,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY day) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS t_len
        FROM daily)
    SELECT r.event_type, MAX(r.t_len) AS n_days,
           CAST(FLOOR(CAST(SUM(r.cents * COALESCE(CASE WHEN r.rn = 1
                                THEN w.wf_e1_e6
                                ELSE w.wf_g_e6 END, 0)) AS DOUBLE)
                      / 1e6) AS BIGINT) AS forecast_cents
    FROM ranked r LEFT JOIN w ON w.lag = r.t_len - r.rn
    GROUP BY 1
    """


ORACLE["events_holt_forecast"] = _holt_oracle()


LATE_DELAY_MOD = 600    # synthetic network delay: 0..599s per event
LATE_CANDS = (30, 60, 120, 300, 600)   # candidate watermark delays (s)
_LATE_BKT_US = 3600 * 1_000_000       # hourly arrival buckets


def q_stream_lateness_audit(spark, sf_dir):
    """WATERMARK-LATENESS AUDIT — the report an engineer reads before
    choosing ``withWatermark``'s delay: replay the event stream in
    arrival order and, for each candidate delay W, count the events a
    W-second watermark would DROP (events whose event-time trails the
    running max event-time seen at their arrival by more than W).
    The events fixture arrives in perfect event-time order, so arrival
    is modeled as ts + a deterministic per-event network delay
    (md5(event_id) % {m}s — the md5-jitter recipe); the watermark is
    the per-event running max, the standard event-level approximation
    of Spark's per-batch watermark advance (a batch watermark only
    drops FEWER events, so the audit is conservative).

    Scale: lateness needs a prefix max over the arrival order — done
    with the two-level bucketed prefix (the KS/median recipe): hourly
    arrival buckets, per-bucket running max windows (spillable sort,
    partitioned), and a |buckets|-row cumulative-max offset relation
    broadcast back.  No global single-partition sort at any scale;
    the candidate-delay fan-out joins a {c}-row literal relation.

    Output: one row per candidate delay —
    (delay_s, n_dropped, n_total, drop_ppm, max_late_s).
    """.format(m=LATE_DELAY_MOD, c=len(LATE_CANDS))
    e = load_table(spark, sf_dir, "events")
    base = e.selectExpr(
        "unix_micros(ts) AS ts_us",
        f"unix_micros(ts) + (CAST(conv(substring("
        f"md5(CAST(event_id AS STRING)), 1, 8), 16, 10) AS BIGINT)"
        f" % {LATE_DELAY_MOD}) * 1000000 AS arr_us",
        "event_id")
    pts = base.withColumn("bkt", F.expr(f"arr_us DIV {_LATE_BKT_US}"))
    bmax = pts.groupBy("bkt").agg(F.max("ts_us").alias("bm"))
    w_off = W.orderBy("bkt").rowsBetween(W.unboundedPreceding, -1)
    offs = bmax.select(
        "bkt", F.max("bm").over(w_off).alias("off_max"))
    w_in = (W.partitionBy("bkt").orderBy("arr_us", "event_id")
             .rowsBetween(W.unboundedPreceding, W.currentRow))
    run = (pts.join(F.broadcast(offs), "bkt")
              .withColumn("rmax", F.greatest(
                  F.max("ts_us").over(w_in),
                  F.coalesce("off_max", F.lit(0))))
              .selectExpr("(rmax - ts_us) DIV 1000000 AS late_s"))
    cands = spark.createDataFrame([(w,) for w in LATE_CANDS],
                                  "delay_s int")
    return (run.crossJoin(F.broadcast(cands))
               .groupBy("delay_s")
               .agg(F.sum(F.expr("CASE WHEN late_s > delay_s THEN 1"
                                 " ELSE 0 END")).alias("n_dropped"),
                    F.count(F.lit(1)).alias("n_total"),
                    F.max("late_s").alias("max_late_s"))
               .selectExpr("delay_s", "n_dropped", "n_total",
                           "(n_dropped * 1000000) DIV n_total"
                           " AS drop_ppm",
                           "max_late_s"))


QUERIES["stream_lateness_audit"] = q_stream_lateness_audit

ORACLE["stream_lateness_audit"] = f"""
    WITH base AS MATERIALIZED (
        SELECT epoch_us(ts) AS ts_us,
               epoch_us(ts)
               + (('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8))
                  ::BIGINT % {LATE_DELAY_MOD}) * 1000000 AS arr_us,
               event_id
        FROM events),
    run AS MATERIALIZED (
        SELECT (MAX(ts_us) OVER (ORDER BY arr_us, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) - ts_us)
               // 1000000 AS late_s
        FROM base),
    cands AS (SELECT unnest([{", ".join(str(w) for w in LATE_CANDS)}])
                  AS delay_s)
    SELECT CAST(delay_s AS INT) AS delay_s,
           SUM(CASE WHEN late_s > delay_s THEN 1 ELSE 0 END)::BIGINT
               AS n_dropped,
           COUNT(*)::BIGINT AS n_total,
           (SUM(CASE WHEN late_s > delay_s THEN 1 ELSE 0 END)
            * 1000000 // COUNT(*))::BIGINT AS drop_ppm,
           MAX(late_s)::BIGINT AS max_late_s
    FROM run, cands
    GROUP BY 1
"""
