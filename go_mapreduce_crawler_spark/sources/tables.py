"""Loaders for the driver-generated TPC-H-ish parquet tables.

Parquet scans here are the engine's hot path at 100 TB: every query built
on these loaders keeps projection/filter declarative so Catalyst pushes
them into the scan (check ``PushedFilters`` / ``ReadSchema`` in explain).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = ("region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings")

# Small dimension tables that should always be broadcast in joins.
BROADCAST_TABLES = frozenset({"region", "nation"})


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        # events.ts must come out as session-TZ TIMESTAMP regardless of how
        # the parquet writer encoded it.  Branch on the loaded dtype:
        #   * timestamp[us]/[ms] → Spark loads TIMESTAMP_NTZ; cast to
        #     TIMESTAMP (session TZ is UTC in this engine, so values are
        #     unchanged and match DuckDB's reading of the same file).
        #   * timestamp[ns] → Spark's vectorized reader rejects NANOS unless
        #     nanosAsLong is set; read raw nanos and truncate to micros with
        #     integer DIV (never `/`: 1.7e18 nanos overflows double mantissa).
        # Downstream operators (unix_micros in temporal.py) require TIMESTAMP,
        # so a plain passthrough of TIMESTAMP_NTZ is not enough.
        df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        ts_type = df.schema["ts"].dataType.typeName()
        if ts_type == "long":
            return df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        if ts_type == "timestamp_ntz":
            # TZ-independent: the NTZ wall time IS UTC by contract, so
            # compute epoch micros from the wall-clock FIELDS directly —
            # date/hour/minute/extract(second) on NTZ never consult a
            # zone.  (A plain cast interprets the wall in the SESSION TZ:
            # -9h under Asia/Tokyo; the from_utc_timestamp round-trip
            # fixes the offset but still shifts inside a DST gap/overlap
            # of the session zone.  Field arithmetic has neither problem.)
            micros = (
                F.unix_date(F.col("ts").cast("date"))
                .cast("long") * F.lit(86_400_000_000)
                + F.hour("ts").cast("long") * F.lit(3_600_000_000)
                + F.minute("ts").cast("long") * F.lit(60_000_000)
                + (F.expr("extract(SECOND FROM ts)") * 1_000_000)
                  .cast("long"))
            return df.withColumn("ts", F.timestamp_micros(micros))
        return df
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def spread(df: DataFrame, *cols: str) -> DataFrame:
    """Repartition a narrow scan up to engine parallelism — gated.

    The test fixtures are single-split parquet files, so row-local CPU
    work (shingling, vector folds) would otherwise run in ONE task; the
    repartition spreads a few MB across all cores.  On a real corpus the
    scan already yields thousands of splits, and an unconditional
    repartition would be a gratuitous full shuffle of the table — so
    this is a no-op whenever the scan's split count already reaches the
    engine's parallelism (checked from the plan, no job is launched).
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target, *cols) if cols else df.repartition(target)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for spark.sql queries."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
