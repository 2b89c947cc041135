"""SparkSession factory.

Local test/bench sessions run on ``local[$SPARK_GRAFT_CPUS]`` (default 32)
with shuffle parallelism matched to core count — on a real cluster the same
code runs unchanged; only master/parallelism confs differ.  AQE is enabled
so runtime statistics re-plan joins (broadcast conversion, skew splitting,
partition coalescing) — at 100 TB that is the difference between a plan
that was sized for the estimate and one sized for the data.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "go-mapreduce-crawler-spark",
              cpus: int | str | None = None,
              shuffle_partitions: int | str | None = None,
              extra_conf: dict | None = None) -> SparkSession:
    cpus = cpus or os.environ.get("SPARK_GRAFT_CPUS", "32")
    # Reducer count tracks DATA volume, not core count: map-side
    # parallelism comes from input splits (and explicit spread
    # repartitions), while post-shuffle partitions should hold
    # ~64-128 MB each.  At bench SF that is single-digit partitions —
    # 32 reducers on kB-sized shuffles is pure task-scheduling overhead
    # (measured 3.5s of a 5s query).  On a real cluster, size it to
    # data/128MB and let AQE coalesce the long tail.
    shuffle_partitions = (shuffle_partitions
                          or os.environ.get("SPARK_GRAFT_SHUFFLE", "8"))
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(cpus))
        # NOTE: spark.sql.files.openCostInBytes stays at the 4 MiB
        # default deliberately — it keeps many-small-file scans (the
        # crawl workload) spread across tasks.  Packing 2,000 JSON files
        # into 1-2 partitions (lower cost values) serialized the opens:
        # 15s vs 1.3s in the full bench.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Runtime bloom-filter semi-join reduction: a selective build side
        # injects a bloom filter into the probe-side scan of shuffle
        # joins.  The default size thresholds (10 MB creation / 10 GB
        # application) keep it a no-op at test SF and let it fire on real
        # fact-fact joins at cluster scale; capability pinned by a plan
        # test with explicit thresholds.
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # Generated-SQL string literals (curation._sql_str, the BPE
        # rewrite fold) escape backslashes/quotes under Spark's DEFAULT
        # backslash-escape parsing; pin the conf so a deployment that
        # flips escapedStringLiterals=true cannot silently change what
        # the generated fold rewrites (r11 advice item 3).
        .config("spark.sql.parser.escapedStringLiterals", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Python data source filter pushdown (crawl_source.PushdownCrawlReader)
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        # Whole-stage codegen emits one large generated class per stage;
        # a full bench run compiles ~50 of them in one JVM.  The default
        # 240 MB ReservedCodeCacheSize can fill mid-run, at which point
        # the JIT stops compiling and codegen-heavy queries (the 32-fold
        # minhash signature) silently run INTERPRETED — observed as a
        # bimodal 1s-vs-4.6s bench mode.  512 MB held ~55 headline
        # queries; the 63-query headline refilled it (observed again as
        # 3x modes on early-list TPC-H joins), so 1 GB — the cache is
        # reserved virtual address space, not resident memory, so the
        # only cost is headroom.
        .config("spark.driver.extraJavaOptions",
                "-XX:ReservedCodeCacheSize=1g")
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
