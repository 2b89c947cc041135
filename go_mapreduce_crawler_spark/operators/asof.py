"""As-of join — point-in-time join Spark lacks as a builtin, composed
from existing DataFrame ops (the preferred custom-operator strategy:
composition first, Pandas UDF only if semantics demand it).

Semantics: for each left row, attach the single most recent right row
with the same key and right.ts <= left.ts (backward as-of, inclusive).

Implementation (scalable, one shuffle):
  union the two sides tagged -> window `last(right_payload, ignorenulls)`
  over (partition by key, order by ts with right-sorts-before-left on
  ties, then unique id) -> keep left rows.  Equivalent to sort-merge
  as-of; cost is one shuffle+sort of |L|+|R| — no range cross-product,
  no per-key materialization, so it survives 100 TB event streams.
  Skewed keys are AQE's problem (enabled in session.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from ..sources.tables import load_table


def asof_join(left: DataFrame, right: DataFrame, key: str,
              left_ts: str, right_ts: str,
              payload_cols: list[str],
              direction: str = "backward") -> DataFrame:
    """As-of join; returns left columns + asof_<payload> cols.

    direction="backward" (default): most recent right row with
    right.ts <= left.ts; ties on right.ts take the LARGEST payload id.
    direction="forward": first right row with right.ts >= left.ts;
    ties take the SMALLEST payload id.  Both are the same one-shuffle
    union+window plan, mirrored: on equal ts the right side sorts
    toward the frame (before left for backward, after left for
    forward) so the boundary is inclusive, and the fill is
    last(ignorenulls) over the trailing frame vs first(ignorenulls)
    over the leading frame.

    Both inputs need a unique id column `event_id`-like ordering
    tie-break inside equal timestamps.
    """
    lt = left.select(
        F.col(key).alias("_k"), F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        "*")
    rt = right.select(
        F.col(key).alias("_k"), F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"_p_{c}") for c in payload_cols])
    unioned = lt.unionByName(rt, allowMissingColumns=True)
    pid = F.coalesce(F.col(f"_p_{payload_cols[0]}"), F.lit(0))
    if direction == "backward":
        w = (W.partitionBy("_k").orderBy("_ts", "_side", pid)
              .rowsBetween(W.unboundedPreceding, W.currentRow))
        fill = [F.last(f"_p_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
                for c in payload_cols]
    elif direction == "forward":
        w = (W.partitionBy("_k").orderBy(F.asc("_ts"), F.desc("_side"), pid)
              .rowsBetween(W.currentRow, W.unboundedFollowing))
        fill = [F.first(f"_p_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
                for c in payload_cols]
    elif direction == "both":
        # Nearest-neighbor support: BOTH directions from one union —
        # same hash partitioning on _k, so the second window adds a
        # sort, not a shuffle.  Caller picks per row by gap.
        wb = (W.partitionBy("_k").orderBy("_ts", "_side", pid)
               .rowsBetween(W.unboundedPreceding, W.currentRow))
        wf = (W.partitionBy("_k").orderBy(F.asc("_ts"), F.desc("_side"), pid)
               .rowsBetween(W.currentRow, W.unboundedFollowing))
        fill = ([F.last(f"_p_{c}", ignorenulls=True).over(wb)
                  .alias(f"asof_b_{c}") for c in payload_cols]
                + [F.first(f"_p_{c}", ignorenulls=True).over(wf)
                    .alias(f"asof_f_{c}") for c in payload_cols])
    else:
        raise ValueError(f"unknown direction: {direction!r}")
    filled = unioned.select("*", *fill)
    return (filled.filter(F.col("_side") == 1)
                  .drop("_k", "_ts", "_side",
                        *[f"_p_{c}" for c in payload_cols]))


def q_asof_purchase_view(spark, sf_dir):
    """For each purchase event: the most recent prior-or-same view event
    by the same user, with the gap in microseconds."""
    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase") \
                 .select("event_id", "user_id", "ts")
    views = e.filter(F.col("event_type") == "view") \
             .select("user_id", "ts",
                     F.col("event_id").alias("view_event_id"),
                     F.unix_micros("ts").alias("view_ts_us"))
    joined = asof_join(purchases, views, key="user_id",
                       left_ts="ts", right_ts="ts",
                       payload_cols=["view_event_id", "view_ts_us"])
    return joined.select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.unix_micros("ts").alias("purchase_ts_us"),
        F.col("asof_view_event_id").alias("view_id"),
        (F.unix_micros("ts") - F.col("asof_view_ts_us")).alias("gap_us"))


def q_asof_next_error(spark, sf_dir):
    """Forward as-of: for each purchase, the FIRST error event at or
    after it by the same user (time-to-failure analysis).  Purchases
    with no later error keep null error columns.  The oracle uses the
    independent join+ROW_NUMBER formulation, so the union-window
    construction is cross-checked against a different algorithm.
    """
    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase") \
                 .select("event_id", "user_id", "ts")
    errors = e.filter(F.col("event_type") == "error") \
              .select("user_id", "ts",
                      F.col("event_id").alias("error_event_id"),
                      F.unix_micros("ts").alias("error_ts_us"))
    joined = asof_join(purchases, errors, key="user_id",
                       left_ts="ts", right_ts="ts",
                       payload_cols=["error_event_id", "error_ts_us"],
                       direction="forward")
    return joined.select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.unix_micros("ts").alias("purchase_ts_us"),
        F.col("asof_error_event_id").alias("error_id"),
        (F.col("asof_error_ts_us") - F.unix_micros("ts")).alias("ttf_us"))


def q_asof_nearest_error(spark, sf_dir):
    """NEAREST as-of: for each purchase, the closest error event by the
    same user in EITHER time direction (the "what was going on around
    this moment" join); ties on distance prefer the earlier (backward)
    event.  Both directions come from ONE union + two window passes
    over the same key partitioning — a single shuffle, not two as-of
    joins glued by a third join.

    The oracle is an independent correlated-subquery formulation
    (nearest by abs gap with the same side/id tie-break), so the
    union-window construction is cross-checked against a different
    algorithm, like asof_next_error.
    """
    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase") \
                 .select("event_id", "user_id", "ts")
    errors = e.filter(F.col("event_type") == "error") \
              .select("user_id", "ts",
                      F.col("event_id").alias("err_id"),
                      F.unix_micros("ts").alias("err_ts_us"))
    j = asof_join(purchases, errors, key="user_id",
                  left_ts="ts", right_ts="ts",
                  payload_cols=["err_id", "err_ts_us"],
                  direction="both")
    p_us = F.unix_micros("ts")
    gap_b = p_us - F.col("asof_b_err_ts_us")
    gap_f = F.col("asof_f_err_ts_us") - p_us
    take_b = (F.col("asof_f_err_id").isNull()
              | (F.col("asof_b_err_id").isNotNull() & (gap_b <= gap_f)))
    return j.select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        p_us.alias("purchase_ts_us"),
        F.when(take_b, F.col("asof_b_err_id"))
         .otherwise(F.col("asof_f_err_id")).alias("nearest_error_id"),
        F.when(take_b, gap_b).otherwise(gap_f).alias("abs_gap_us"),
        F.when(take_b & F.col("asof_b_err_id").isNotNull(), F.lit("backward"))
         .when(~take_b, F.lit("forward")).alias("side"))


ASOF_TOLERANCE_US = 3_600_000_000   # 1 hour


def q_asof_tolerance(spark, sf_dir):
    """Backward as-of with a MAX-GAP TOLERANCE (pandas merge_asof's
    ``tolerance=``): the most recent prior view within 1 hour of the
    purchase, else NO match — the sensor-fusion/quote-staleness rule
    (an old quote is worse than none).

    Applying the tolerance POST-asof is semantically exact: the as-of
    match is the most RECENT candidate, so if it is stale every other
    candidate is staler — one row-local CASE after the same one-shuffle
    union+window plan as q_asof_purchase_view, zero extra cost.
    """
    j = q_asof_purchase_view(spark, sf_dir)
    ok = F.col("gap_us") <= ASOF_TOLERANCE_US
    return j.select(
        "purchase_id", "user_id", "purchase_ts_us",
        F.when(ok, F.col("view_id")).alias("view_id"),
        F.when(ok, F.col("gap_us")).alias("gap_us"),
        F.coalesce(ok, F.lit(False)).alias("matched"))


QUERIES = {"asof_purchase_view": q_asof_purchase_view,
           "asof_next_error": q_asof_next_error,
           "asof_nearest_error": q_asof_nearest_error,
           "asof_tolerance_1h": q_asof_tolerance}

ORACLE = {
    "asof_nearest_error": """
        WITH p AS (SELECT event_id, user_id, ts FROM events
                   WHERE event_type = 'purchase'),
        er AS (SELECT event_id, user_id, ts FROM events
               WHERE event_type = 'error'),
        pick AS (
            SELECT p.event_id AS purchase_id, p.user_id,
                   epoch_us(p.ts) AS purchase_ts_us,
                   (SELECT e2.event_id FROM er e2
                    WHERE e2.user_id = p.user_id
                    ORDER BY ABS(epoch_us(e2.ts) - epoch_us(p.ts)),
                             CASE WHEN e2.ts <= p.ts THEN 0 ELSE 1 END,
                             CASE WHEN e2.ts <= p.ts THEN -e2.event_id
                                  ELSE e2.event_id END
                    LIMIT 1) AS nearest_error_id
            FROM p)
        SELECT pick.purchase_id, pick.user_id, pick.purchase_ts_us,
               pick.nearest_error_id,
               ABS(epoch_us(er.ts) - pick.purchase_ts_us) AS abs_gap_us,
               CASE WHEN er.event_id IS NULL THEN NULL
                    WHEN epoch_us(er.ts) <= pick.purchase_ts_us
                    THEN 'backward' ELSE 'forward' END AS side
        FROM pick LEFT JOIN er ON er.event_id = pick.nearest_error_id
    """,
    "asof_purchase_view": """
        WITH tagged AS (
            SELECT user_id, ts, event_id, event_type,
                   CASE WHEN event_type = 'view' THEN event_id END AS v_id,
                   CASE WHEN event_type = 'view' THEN epoch_us(ts) END AS v_ts
            FROM events WHERE event_type IN ('view', 'purchase')),
        filled AS (
            SELECT user_id, ts, event_id, event_type,
                   LAST_VALUE(v_id IGNORE NULLS) OVER w AS view_id,
                   LAST_VALUE(v_ts IGNORE NULLS) OVER w AS view_ts_us
            FROM tagged
            WINDOW w AS (PARTITION BY user_id
                         ORDER BY ts,
                                  CASE WHEN event_type = 'view' THEN 0 ELSE 1 END,
                                  COALESCE(v_id, 0)
                         ROWS UNBOUNDED PRECEDING))
        SELECT event_id AS purchase_id, user_id,
               epoch_us(ts) AS purchase_ts_us,
               view_id,
               epoch_us(ts) - view_ts_us AS gap_us
        FROM filled WHERE event_type = 'purchase'
    """,
    "asof_next_error": """
        SELECT purchase_id, user_id, purchase_ts_us, error_id, ttf_us
        FROM (
            SELECT p.event_id AS purchase_id, p.user_id,
                   epoch_us(p.ts) AS purchase_ts_us,
                   e.event_id AS error_id,
                   epoch_us(e.ts) - epoch_us(p.ts) AS ttf_us,
                   ROW_NUMBER() OVER (PARTITION BY p.event_id
                                      ORDER BY e.ts, e.event_id) AS rn
            FROM (SELECT * FROM events WHERE event_type = 'purchase') p
            LEFT JOIN (SELECT * FROM events WHERE event_type = 'error') e
              ON e.user_id = p.user_id AND e.ts >= p.ts)
        WHERE rn = 1
    """,
}

# Tolerance wraps the independent ROW_NUMBER construction of the base
# as-of oracle — one CASE around the same cross-check.
ORACLE["asof_tolerance_1h"] = f"""
    WITH base AS ({ORACLE["asof_purchase_view"]})
    SELECT purchase_id, user_id, purchase_ts_us,
           CASE WHEN gap_us <= {ASOF_TOLERANCE_US} THEN view_id END
               AS view_id,
           CASE WHEN gap_us <= {ASOF_TOLERANCE_US} THEN gap_us END
               AS gap_us,
           COALESCE(gap_us <= {ASOF_TOLERANCE_US}, FALSE) AS matched
    FROM base
"""
