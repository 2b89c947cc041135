"""ZIPF-vocabulary scale probe for dedup_substring_suffix_array
(VERDICT r07 item 3 "Done" criterion).

The r07 probe's 30-word UNIFORM vocabulary hid per-key concentration:
every token held ~3.3% of positions, so the (now removed)
``min().over(Window.partitionBy(token))`` naming never met the Zipf
head that motivated the de-skew.  This probe generates corpora from a
10k-word ZIPF(s=1.1) vocabulary — the top token carries ~7.5% of ALL
positions, the shape a real crawl has — at 5k docs (z0.1) and 50k
docs (z1), then measures:

  1. the DE-SKEWED plan (groupBy+join class-min, shipped) — wall,
     shuffle bytes, and the max/median task-time skew of every stage;
  2. the r07 WINDOW plan (reconstructed inline, verbatim) on the same
     fixtures — same metrics, so the single-task-per-class
     concentration is measured, not argued;
  3. an ORACLE MATCH of the shipped operator on the z0.1 Zipf fixture
     (the literal K-gram DuckDB twin — proving the de-skew preserved
     exactness on a corpus with real key concentration).

Run:  python tools/scale_probe_r08.py [out_json]
"""

from __future__ import annotations

import hashlib
import json
import os
import random
import statistics
import sys
import time
import urllib.error
import urllib.request

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)

Z01 = "/tmp/spark_graft_zipf_z01"
Z1 = "/tmp/spark_graft_zipf_z1"
VOCAB_N = 10_000
ZIPF_S = 1.1

from pyspark.sql import SparkSession, functions as F  # noqa: E402

spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.ui.enabled", "true")
         .config("spark.ui.port", "4059")
         .config("spark.driver.memory", "12g")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
sc = spark.sparkContext

_weights = [1.0 / (k ** ZIPF_S) for k in range(1, VOCAB_N + 1)]
_cum = []
_acc = 0.0
for w in _weights:
    _acc += w
    _cum.append(_acc)
_total_w = _cum[-1]


def _zipf_word(rng: random.Random) -> str:
    import bisect
    x = rng.random() * _total_w
    return f"w{bisect.bisect_left(_cum, x)}"


def gen_documents(n_docs: int):
    """Zipf corpus, deterministic per doc; ~5% verbatim near-dups and
    ~0.2% exact dups like the r07 generative process (so the
    substring-dedup output is non-trivial)."""
    rows = []
    for i in range(n_docs):
        rng = random.Random(int(
            hashlib.md5(f"zipf{i}".encode()).hexdigest()[:8], 16))
        r = rng.random()
        if i > 10 and r < 0.002:
            text = rows[rng.randrange(len(rows))][1]
        elif i > 10 and r < 0.052:
            words = rows[rng.randrange(len(rows))][1].split(" ")
            words.insert(rng.randrange(len(words) + 1), "dup")
            text = " ".join(words)
        else:
            n = rng.randint(10, 100)
            text = " ".join(_zipf_word(rng) for _ in range(n))
        rows.append((i, text, "en", f"src{rng.randrange(20)}",
                     len(text)))
    return rows


def build(path: str, n_docs: int):
    dst = os.path.join(path, "documents.parquet")
    if os.path.exists(dst):
        return
    os.makedirs(path, exist_ok=True)
    df = spark.createDataFrame(
        gen_documents(n_docs),
        "doc_id long, text string, lang string, source string,"
        " n_chars long")
    df.repartition(8).write.mode("overwrite").parquet(dst)


def _rest(path):
    url = (f"http://localhost:4059/api/v1/applications/"
           f"{sc.applicationId}{path}")
    with urllib.request.urlopen(url, timeout=20) as r:
        return json.load(r)


def group_metrics(group):
    """(shuffle_read, shuffle_write, worst stage task skew) for a job
    group: skew = max task runtime / median task runtime of the stage
    with the largest max task — the straggler measure a wall clock on
    a 32-thread box can hide."""
    jobs = [j for j in _rest("/jobs") if j.get("jobGroup") == group]
    stage_ids = sorted({s for j in jobs for s in j["stageIds"]})
    rd = wr = 0
    worst = {"stage": None, "max_task_s": 0.0, "median_task_s": 0.0,
             "skew": 1.0, "n_tasks": 0}
    for sid in stage_ids:
        try:
            atts = _rest(f"/stages/{sid}?details=true")
        except urllib.error.HTTPError:
            continue
        for att in atts:
            rd += att.get("shuffleReadBytes", 0)
            wr += att.get("shuffleWriteBytes", 0)
            durs = [t.get("duration", 0) / 1e3
                    for t in (att.get("tasks") or {}).values()]
            if len(durs) >= 2 and max(durs) > worst["max_task_s"]:
                med = statistics.median(durs)
                worst = {"stage": sid,
                         "max_task_s": round(max(durs), 2),
                         "median_task_s": round(med, 3),
                         "skew": round(max(durs) / max(med, 1e-3), 1),
                         "n_tasks": len(durs)}
    return rd, wr, worst


def window_plan_r07(spark, sf_dir):
    """The r07 WINDOW-based naming, verbatim (dedup.py@52b5684:872) —
    kept here ONLY as the probe's straggler baseline."""
    from pyspark.sql import Window as W

    from go_mapreduce_crawler_spark.operators.dedup import (SUBSTR_K,
                                                            _docs)

    d = _docs(spark, sf_dir)
    toks = d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "w"))
    pack = (F.col("doc_id").cast("long") * F.lit(1 << 22).cast("long")
            + F.col("pos"))
    cur = (toks.withColumn("r", F.min(pack).over(W.partitionBy("w")))
               .select("doc_id", "pos", "r"))
    wdoc = W.partitionBy("doc_id").orderBy("pos")
    step = 1
    while step < SUBSTR_K:
        paired = cur.withColumn(
            "r2", F.coalesce(F.lead("r", step).over(wdoc), F.lit(-1)))
        cur = (paired.withColumn(
                   "r", F.min(pack).over(W.partitionBy("r", "r2")))
                     .select("doc_id", "pos", "r"))
        step *= 2
    base = d.select("doc_id",
                    F.size(F.split("text", " ")).cast("long")
                     .alias("n_tokens"))
    starts = (cur.join(base, "doc_id")
                 .filter(F.col("pos") + 8 <= F.col("n_tokens")))
    dup = (starts.groupBy("r").agg(F.count(F.lit(1)).alias("n"))
                 .filter(F.col("n") >= 2))
    flags = (starts.join(dup, "r", "left_semi")
                   .select("doc_id", "pos", F.lit(1).alias("f")))
    covw = (W.partitionBy("doc_id").orderBy("pos")
             .rowsBetween(-7, 0))
    cov = (toks.join(flags, ["doc_id", "pos"], "left")
               .withColumn("covered",
                           F.max(F.coalesce("f", F.lit(0))).over(covw)))
    return (cov.filter(F.col("covered") == 0)
               .groupBy("doc_id").agg(F.count(F.lit(1)).alias("n")))


def probe(name, fn, sf_dir, tag):
    group = f"probe8-{name}-{tag}"
    sc.setJobGroup(group, name)
    t0 = time.time()
    n = fn(spark, sf_dir).count()
    sec = round(time.time() - t0, 2)
    sc.setJobGroup("idle", "idle")
    rd, wr, worst = group_metrics(group)
    return {"rows": n, "sec": sec,
            "shuffle_read_mb": round(rd / 1e6, 1),
            "shuffle_write_mb": round(wr / 1e6, 1),
            "worst_stage_task_skew": worst}


def main():
    build(Z01, 5_000)
    build(Z1, 50_000)
    from go_mapreduce_crawler_spark.operators import dedup

    # top-token concentration (the fixture property the probe exists
    # to exercise)
    top = (spark.read.parquet(os.path.join(Z1, "documents.parquet"))
           .select(F.explode(F.split("text", " ")).alias("w"))
           .groupBy("w").count().orderBy(F.desc("count")).limit(1)
           .collect()[0])
    total = (spark.read.parquet(os.path.join(Z1, "documents.parquet"))
             .select(F.explode(F.split("text", " "))).count())

    out = {"vocab": VOCAB_N, "zipf_s": ZIPF_S,
           "top_token": top.w,
           "top_token_share_pct": round(100 * top["count"] / total, 2),
           "results": {}}
    for tag, sf in (("z0.1", Z01), ("z1", Z1)):
        out["results"].setdefault("deskew_groupby_join", {})[tag] = \
            probe("suffix_new", dedup.q_dedup_substring_suffix, sf, tag)
        out["results"].setdefault("r07_window_plan", {})[tag] = \
            probe("suffix_old", window_plan_r07, sf, tag)

    # oracle MATCH on the Zipf fixture (literal K-gram twin)
    import duckdb
    sys.path.insert(0, os.path.join(repo, "tests"))
    from oracle_utils import compare
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM read_parquet("
        f"'{os.path.join(Z01, 'documents.parquet', '*.parquet')}')")
    from go_mapreduce_crawler_spark.operators.dedup import ORACLE
    problems = compare(
        dedup.q_dedup_substring_suffix(spark, Z01), con,
        ORACLE["dedup_substring_suffix_array"], "zipf-z0.1")
    out["zipf_oracle_match"] = not problems
    out["zipf_oracle_problems"] = problems[:3]

    dst = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        repo, "tools", "scale_probe_r08.json")
    with open(dst, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
