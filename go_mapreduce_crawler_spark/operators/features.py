"""Feature-normalization operators — LLM-pipeline extensions
(SURVEY.md §2.3; the reference has no statistics surface at all, its
only aggregate is the user-supplied monoid fold, pool.go:8-12).

Normalization is the step between corpus curation and training: scale
per-group statistics are computed once, then applied row-wise.  The
scale-critical property is that the FACT TABLE NEVER SHUFFLES: group
statistics are a tiny partial+final aggregate, broadcast back onto the
events stream as a map-side hash join.  A window formulation would
shuffle all 100 TB on the group key to compute the same numbers.

Determinism follows the repo's exact-moments convention
(relational.q_stats_moments): power sums in DECIMAL (order-independent
over any partitioning), float math once on scalars at the end,
round(6) on the way out.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.exact import dec
from ..sources.tables import load_table

MONEY = "decimal(12,2)"


def q_feat_zscore(spark, sf_dir):
    """Population z-score of event value within its event_type.

    ``stats`` is |event_type| rows — broadcast; the join adds no
    exchange on the events side (asserted in tests/test_plans.py).
    """
    e = load_table(spark, sf_dir, "events")
    v = dec("value", MONEY)
    stats = (e.groupBy("event_type")
              .agg(F.count(F.lit(1)).alias("n"),
                   F.sum(v).alias("sx"),
                   F.sum(v * v).alias("sx2")))
    nd = F.col("n").cast("double")
    sxd, sx2d = F.col("sx").cast("double"), F.col("sx2").cast("double")
    z = ((v.cast("double") - sxd / nd)
         / F.sqrt((nd * sx2d - sxd * sxd) / (nd * nd)))
    return (e.join(F.broadcast(stats), "event_type")
             .select("event_id", "event_type", F.round(z, 6).alias("zscore")))


QUERIES = {
    "feat_zscore_per_type": q_feat_zscore,
}

ORACLE = {
    "feat_zscore_per_type": """
        WITH s AS (
            SELECT event_type, COUNT(*) AS n,
                   SUM(CAST(value AS DECIMAL(12,2)))::DOUBLE AS sx,
                   SUM(CAST(value AS DECIMAL(12,2))
                       * CAST(value AS DECIMAL(12,2)))::DOUBLE AS sx2
            FROM events GROUP BY 1)
        SELECT e.event_id, e.event_type,
               ROUND((CAST(e.value AS DECIMAL(12,2))::DOUBLE
                      - sx / n::DOUBLE)
                     / SQRT((n::DOUBLE * sx2 - sx * sx)
                            / (n::DOUBLE * n::DOUBLE)), 6) AS zscore
        FROM events e JOIN s USING (event_type)
    """,
}
