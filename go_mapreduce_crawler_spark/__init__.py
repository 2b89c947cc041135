"""go_mapreduce_crawler_spark — a PySpark-native analytics engine with the
capabilities of MartinezGitHub/go-mapreduce-crawler, rebuilt Spark-first.

The reference (survey at /root/repo/SURVEY.md) is a generic map-reduce
kernel: recursive file enumeration (List), parallel map (Transform),
per-worker partial fold (Accumulate), and a single final reduce (Combine),
orchestrated by Collect.  Here each of those is re-expressed on Spark's
DataFrame engine, where Catalyst already provides parallel listing,
pipelined scan+map, and partial+final aggregation — plus a full relational
surface and the LLM-data-pipeline operators (dedup, similarity search,
text analysis, multimodal columns) designed for 100 TB scale.

Layout:
  session     — SparkSession factory tuned for this engine
  pool        — Pool API parity: list/transform/accumulate generics
  crawler     — Crawler.collect parity: crawl a JSON dir tree -> aggregate
  sources     — table loaders + distributed file enumeration
  operators   — relational queries, dedup, similarity, text, multimodal
  functions   — reusable column expression helpers
  plans       — plan-shape assertion helpers (explain() introspection)
  streaming   — Structured Streaming sessionization / windowed aggs
"""

__version__ = "0.1.0"
