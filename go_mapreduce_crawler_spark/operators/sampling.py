"""Deterministic sampling operators over ``documents`` — LLM-pipeline
extensions (SURVEY.md §2.3: corpus preparation beyond the reference's
surface; reference has no sampling of any kind — verified in SURVEY §2.2).

Every operator here is **hash-deterministic**, never ``rand()``: the
split/sample decision for a row is a pure function of its key, so it is

* reproducible across runs, engines, and partitionings (the property a
  100 TB training-data pipeline actually needs — re-running the split
  after adding one shard must not reshuffle every document's fate);
* embarrassingly parallel — a narrow projection + filter, ZERO shuffles
  (contrast ``df.randomSplit``, which is seed-stable only for a fixed
  partitioning);
* oracle-checkable bit-for-bit (DuckDB computes the same md5).

The hash basis is the first 2 hex chars of ``md5(key)`` compared as
strings ('00'..'ff' = 256 uniform buckets) — portable between Spark and
DuckDB without bigint/hex conversion games.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..sources.tables import load_table


def _bucket(col):
    """First 2 hex chars of md5(col as string): 256 uniform buckets."""
    return F.substring(F.md5(F.encode(col.cast("string"), "UTF-8")), 1, 2)


def q_sample_split(spark, sf_dir):
    """Deterministic train/val/test split by hashed doc_id.

    test = bucket < '0d' (13/256 ~ 5.1%), val = next 13 buckets, train =
    the rest.  At 100 TB this is the only split that survives: a pure
    per-row projection (no shuffle, no global sort, no seed-partitioning
    coupling), and document membership is stable when the corpus grows.
    """
    d = load_table(spark, sf_dir, "documents")
    b = _bucket(F.col("doc_id"))
    return d.select(
        "doc_id", "lang", "source",
        F.when(b < "0d", "test").when(b < "1a", "val")
         .otherwise("train").alias("split"))


def q_sample_stratified(spark, sf_dir):
    """Stratified downsample: per-language keep-fraction via hash bucket.

    The corpus-rebalancing step (upweight low-resource languages by
    downsampling the head): en keeps 64/256 = 25%, de/fr/es keep 50%,
    everything else 75%.  Same zero-shuffle narrow-filter shape as the
    split — Spark's ``sampleBy`` does this with rand(); the hash variant
    is reproducible under repartitioning.
    """
    d = load_table(spark, sf_dir, "documents")
    b = _bucket(F.col("doc_id"))
    thr = (F.when(F.col("lang") == "en", "40")
            .when(F.col("lang").isin("de", "fr", "es"), "80")
            .otherwise("c0"))
    return d.filter(b < thr).select("doc_id", "lang", "source")


def q_sample_cap_per_source(spark, sf_dir):
    """Cap documents per source at 10, keeping a deterministic hash-random
    subset: row_number over (source, hash(doc_id)) <= 10.

    The per-domain cap from web-corpus curation (no single crawl domain
    may dominate training).  One shuffle keyed by ``source``; the hash
    order makes the kept subset unbiased yet reproducible.  At 100 TB a
    hot domain's partition is bounded by per-key top-k pushdown: since
    only 10 survive per key, a map-side partial top-10 per partition
    (groupBy + min_by-style) before the shuffle caps the shuffle volume
    at 10 x partitions x domains; the window form here is the clear
    statement of the semantics and AQE handles moderate skew.
    """
    d = load_table(spark, sf_dir, "documents")
    h = F.md5(F.encode(F.col("doc_id").cast("string"), "UTF-8"))
    w = Window.partitionBy("source").orderBy(h, "doc_id")
    return (d.select("doc_id", "source",
                     F.row_number().over(w).alias("rk"))
             .filter(F.col("rk") <= 10))


def q_sample_weighted(spark, sf_dir):
    """Weighted sampling without replacement, k=5 per language, weight =
    document length — Efraimidis-Spirakis A-Res with a HASH-derived
    uniform instead of rand(), so the sample is reproducible across
    runs, engines, and partitionings like every sampler in this module.

    key_i = u_i^(1/w_i) with u_i = (md5_24bit(doc_id)+0.5)/2^24; the
    top-k keys per stratum are an exact weighted sample (Efraimidis &
    Spirakis 2006, Inf. Proc. Letters).  The key stays internal (pow
    is libm-dependent at the last ulp, so it is not hash-comparable);
    the SELECTED ROWS and their ranks are, because distinct u values
    separate keys by far more than one ulp.  One shuffle on lang;
    rank<=k lets Spark push a per-partition partial top-k below the
    shuffle (WindowGroupLimit), so shuffle volume is k x partitions x
    strata — the 100 TB path.
    """
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(F.desc("ares_key"), "doc_id")
    return (d.select("doc_id", "lang", "n_chars",
                     _ares_key().alias("ares_key"))
             .withColumn("rk", F.row_number().over(w))
             .filter(F.col("rk") <= 5)
             .select("doc_id", "lang", "n_chars", "rk"))


def _ares_key():
    """The q_sample_weighted A-Res key, recomputable from row data."""
    u = ((F.conv(F.substring(
            F.md5(F.encode(F.col("doc_id").cast("string"), "UTF-8")),
            1, 6), 16, 10).cast("bigint").cast("double") + 0.5)
         / 16777216.0)
    return F.pow(u, F.lit(1.0) / F.col("n_chars").cast("double"))


def q_reservoir_delta(spark, sf_dir):
    """Weighted-reservoir MAINTENANCE under ingest — the IVM pattern
    applied to sampling: the base corpus's per-language top-5 A-Res
    reservoir absorbs an insert batch (doc_id % 10 == 0) by unioning
    the batch's OWN tiny reservoir and re-ranking the <= 10 rows per
    stratum — never rescanning the base corpus.  Correct because
    top-k-by-key is a monotone mergeable summary (Efraimidis-Spirakis
    keys are a pure function of each row, so merge-then-top-k ==
    top-k-over-union bit-for-bit), which is exactly what the oracle
    checks: it recomputes the reservoir over the POST-insert corpus
    directly.

    Scale: each side is the q_sample_weighted plan (WindowGroupLimit
    pushes the partial top-k below the shuffle — k x partitions x
    strata rows move); the merge re-ranks k*2 rows per stratum.  The
    A-Res key is RECOMPUTED row-locally from (doc_id, n_chars) at
    merge time — no libm-sensitive double is ever stored or compared
    across engines (the q_sample_weighted determinism contract).
    """
    d = load_table(spark, sf_dir, "documents")

    def reservoir(df):
        w = Window.partitionBy("lang").orderBy(
            F.desc("ares_key"), "doc_id")
        return (df.select("doc_id", "lang", "n_chars",
                          _ares_key().alias("ares_key"))
                .withColumn("rk", F.row_number().over(w))
                .filter(F.col("rk") <= 5)
                .select("doc_id", "lang", "n_chars"))

    base = reservoir(d.filter(F.col("doc_id") % 10 != 0))
    delta = reservoir(d.filter(F.col("doc_id") % 10 == 0))
    merged = base.unionAll(delta)
    w = Window.partitionBy("lang").orderBy(F.desc("ares_key"), "doc_id")
    return (merged.withColumn("ares_key", _ares_key())
            .withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= 5)
            .select("doc_id", "lang", "n_chars", "rk"))


MIX_TAU = 0.5     # temperature: weight_lang ∝ n_lang^tau


def q_sample_temperature_mix(spark, sf_dir):
    """Temperature-based source rebalancing (the multilingual-LM mixing
    rule, weight_s ∝ n_s^0.5 — upsample small sources, downsample big
    ones, corpus size preserved in expectation), with DETERMINISTIC
    replication: n_copies(doc) = floor(f_s) + [hash_bucket(doc) <
    frac(f_s)·256], so the mixed corpus is reproducible across runs,
    engines, and partitionings like every sampler in this module
    (granularity 1/256 per source).

    Determinism of f_s across engines: sqrt(n) is IEEE-correctly-rounded,
    quantized to DECIMAL(28,6) before the (exact, decimal) denominator
    sum — float addition order never enters; the remaining double ops
    replicate the oracle's operation order exactly.

    Scale shape: per-source counts are one tiny agg broadcast back to the
    corpus scan; replication is a row-local sequence explode — no extra
    shuffle anywhere.  Output: one row per COPY.
    """
    d = load_table(spark, sf_dir, "documents")
    counts = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    total = d.agg(F.count(F.lit(1)).alias("total"))
    sq = F.round(F.sqrt(F.col("n")), 6).cast("decimal(28,6)")
    stats = (counts.select("lang", "n", sq.alias("sq"))
             .crossJoin(F.broadcast(
                 counts.select(sq.alias("s2"))
                       .agg(F.sum("s2").alias("den"))))
             .crossJoin(F.broadcast(total))
             .select("lang", F.round(
                 F.col("total").cast("double") * F.col("sq").cast("double")
                 / F.col("den").cast("double") / F.col("n"), 6)
                 .alias("factor")))
    b = _bucket(F.col("doc_id"))
    thr = F.least(F.round((F.col("factor") - F.floor(F.col("factor"))) * 256, 0)
                  .cast("int"), F.lit(255))
    thr_hex = F.lpad(F.lower(F.hex(thr)), 2, "0")
    rep = (d.join(F.broadcast(stats), "lang")
           .select("doc_id", "lang", "factor",
                   (F.floor("factor")
                    + F.when(b < thr_hex, 1).otherwise(0)).alias("n_copies")))
    return (rep.filter(F.col("n_copies") > 0)
            .select("doc_id", "lang", "factor",
                    F.explode(F.sequence(F.lit(1), F.col("n_copies")))
                     .alias("copy")))


def q_sample_split_group(spark, sf_dir):
    """GROUP-holdout split: the split decision hashes the SOURCE, not
    the document, so every document of a source lands in the same fold
    — the leakage-safe split for near-duplicate-heavy corpora (random
    doc-level splits put near-copies of one crawl/source on both sides
    of the train/test fence, inflating eval; sklearn's
    GroupShuffleSplit is the same contract).

    Same scale properties as the doc-level split: a pure row-local
    projection, zero shuffles, membership stable as the corpus grows
    (a new source never moves an old one).  test/val get 64/256 buckets
    each (sources are few here; wider bands keep all three folds
    non-empty at every SF).
    """
    d = load_table(spark, sf_dir, "documents")
    b = _bucket(F.col("source"))
    return d.select(
        "doc_id", "source",
        F.when(b < "40", "test").when(b < "80", "val")
         .otherwise("train").alias("split"))


NEYMAN_BUDGET = 1000    # labeling budget to allocate across strata


def q_sample_neyman(spark, sf_dir):
    """Neyman-optimal stratified allocation: split a fixed labeling /
    eval budget B across strata (sources) proportional to n_h * s_h —
    the allocation minimizing the variance of the stratified mean
    (Neyman 1934), the design question behind every "which docs do we
    send to human raters" pass.  Proportional allocation oversamples
    big uniform strata; Neyman shifts budget to strata that are big
    AND internally diverse.

    All arithmetic is engine-exact: per-stratum (n, Σx, Σx²) from ONE
    partial+final agg over the fact table (DECIMAL(38,0) power sums —
    overflow-free at any corpus size); sample variance ×1e6 by integer
    DIV; s_e3 = floor(sqrt) — the sqrt argument stays < 2^53 (it is a
    per-doc-length variance, not a corpus aggregate), so the
    IEEE-exactly-rounded sqrt is deterministic in both engines.  The
    final largest-remainder apportionment (so ΣA alloc == B exactly, no
    floor dust) ranks the STRATA relation only — |sources| rows, never
    the corpus.

    Output per stratum: n_docs, s_e3 (length stddev, milli-units),
    alloc.  Pinned in tests: Σalloc == B and the allocation beats
    proportional on the fixture's variance-weighted objective.
    """
    d = load_table(spark, sf_dir, "documents")
    st = (d.groupBy("source")
          .agg(F.count(F.lit(1)).alias("n"),
               F.sum(F.col("n_chars").cast("decimal(38,0)")).alias("sx"),
               F.sum((F.col("n_chars") * F.col("n_chars"))
                     .cast("decimal(38,0)")).alias("sxx")))
    s2_e6 = F.expr(
        "CASE WHEN n < 2 THEN CAST(0 AS BIGINT) ELSE "
        "CAST(((n * sxx - sx * sx) * 1000000) DIV (n * (n - 1)) "
        "AS BIGINT) END")
    st = st.withColumn("s_e3", F.floor(F.sqrt(s2_e6)).cast("long"))
    # DECIMAL(38,0) weight (r08 advice item 2): n * s_e3 in BIGINT wraps
    # at large-corpus stratum sizes while DuckDB's SUM promotes to
    # HUGEINT — keep w (and thus tw) in 128-bit to match the oracle.
    st = st.withColumn("w", F.col("n").cast("decimal(38,0)")
                       * F.col("s_e3"))
    tot = st.agg(F.sum("w").cast("decimal(38,0)").alias("tw"))
    j = st.crossJoin(F.broadcast(tot))
    j = (j.withColumn("base", F.expr(
            f"CAST((CAST(w AS DECIMAL(38,0)) * {NEYMAN_BUDGET})"
            f" DIV tw AS BIGINT)"))
          .withColumn("rem", F.expr(
              f"(CAST(w AS DECIMAL(38,0)) * {NEYMAN_BUDGET}) % tw")))
    used = j.agg(F.sum("base").alias("used"))
    j = j.crossJoin(F.broadcast(used))
    # largest-remainder top-up over the |strata|-sized relation
    rk = F.row_number().over(
        Window.orderBy(F.col("rem").desc(), F.col("source")))
    return (j.withColumn("rk", rk)
            .select("source", F.col("n").alias("n_docs"), "s_e3",
                    (F.col("base")
                     + (F.col("rk") <= NEYMAN_BUDGET - F.col("used"))
                       .cast("long")).alias("alloc")))


KCENTER_K = 8    # coreset size (greedy farthest-point rounds)


def _d2_lit_sql(vec_col: str, values) -> str:
    """Squared-L2 distance of a vector column to a LITERAL center as
    one SQL string (the similarity._dot_sql pattern: repr round-trips
    float64 exactly, so both engines parse the identical doubles; the
    sequential fold matches DuckDB's list_reduce order)."""
    arr = "array(" + ",".join(repr(float(x)) + "D" for x in values) + ")"
    return (f"aggregate(zip_with({vec_col}, {arr},"
            " (x, y) -> (CAST(x AS DOUBLE) - y) * (CAST(x AS DOUBLE) - y)),"
            " 0D, (acc, x) -> acc + x)")


def q_sample_coreset_kcenter(spark, sf_dir):
    """CORESET selection by greedy k-center (farthest-point traversal,
    Gonzalez 1985) over the embedding table — the geometry-coverage
    data-pruning pass (pick the {k} most mutually-distant exemplars;
    the 2-approximation to the k-center cover) that complements the
    density-based passes (SemDeDup drops redundancy, k-center KEEPS
    spread).  Seed = min vec_id; each round selects the vector
    maximizing its min squared-L2 distance to the chosen set (floor-e6
    quantized BEFORE comparison; ties -> smaller vec_id).

    Exactly k bounded driver round-trips (the kmeans/BPE trainer
    contract): each round is ONE full-scan argmax agg carrying
    (mind2_e6, -vec_id, embedding) through max(struct(...)), then a
    row-local LEAST() update against the new center shipped back as a
    LITERAL expression — no window, no join, no driver-side data
    beyond one 64-float row per round.  At 100 TB the same k passes
    stream; sub-sampled or hybrid (cluster-then-kcenter) variants
    change the candidate relation, not this loop.

    Output: (rk, vec_id, sel_d2_e6) — sel_d2_e6 is the selection
    radius (0 for the seed), non-increasing in rk (pinned in tests).
    """.format(k=KCENTER_K)
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding")
    seed = e.orderBy("vec_id").first()
    out = [(1, int(seed.vec_id), 0)]
    center = seed.embedding
    cur = e.filter(F.col("vec_id") != int(seed.vec_id)).withColumn(
        "mind2", F.expr(
            f"CAST(FLOOR(({_d2_lit_sql('embedding', center)}) * 1e6)"
            " AS BIGINT)"))
    for rk in range(2, KCENTER_K + 1):
        best = cur.agg(F.max(F.struct(
            F.col("mind2").alias("d"),
            (-F.col("vec_id")).alias("negid"),
            F.col("embedding").alias("emb"))).alias("b")).collect()[0].b
        vid = -best.negid
        out.append((rk, int(vid), int(best.d)))
        # Lazy localCheckpoint per round (the KMR suffix-array recipe):
        # without it the chained LEAST folds stay in one lineage and
        # round r's argmax re-evaluates all r-1 prior distance folds
        # over the corpus — O(k^2) folds total vs the docstring's
        # one-bounded-pass-per-round contract (r09 advice item 1).
        cur = (cur.filter(F.col("vec_id") != int(vid))
               .withColumn("mind2", F.least("mind2", F.expr(
                   f"CAST(FLOOR(({_d2_lit_sql('embedding', best.emb)})"
                   " * 1e6) AS BIGINT)")))
               .localCheckpoint(eager=False))
    return spark.createDataFrame(
        out, "rk int, vec_id long, sel_d2_e6 long")


def _kcenter_oracle() -> str:
    d2 = ("list_reduce(list_transform(list_zip({a}, {b}),"
          " p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))"
          " * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))),"
          " (acc, x) -> acc + x)")

    def q6(a, b):
        return ("CAST(FLOOR((" + d2.format(a=a, b=b)
                + ") * 1e6) AS BIGINT)")

    steps, finals = [], ["SELECT 1 AS rk, vec_id, 0::BIGINT AS "
                         "sel_d2_e6 FROM c1"]
    for i in range(2, KCENTER_K + 1):
        p = i - 1
        steps.append(f"""
    c{i} AS MATERIALIZED (
        SELECT vec_id, embedding, mind2 FROM m{p}
        ORDER BY mind2 DESC, vec_id LIMIT 1),
    m{i} AS MATERIALIZED (
        SELECT m{p}.vec_id, m{p}.embedding,
               LEAST(m{p}.mind2,
                     {q6(f'm{p}.embedding', f'c{i}.embedding')}) AS mind2
        FROM m{p}, c{i} WHERE m{p}.vec_id <> c{i}.vec_id)""")
        finals.append(f"SELECT {i} AS rk, vec_id, mind2 AS sel_d2_e6"
                      f" FROM c{i}")
    return f"""
    WITH e AS MATERIALIZED (SELECT vec_id, embedding FROM embeddings),
    c1 AS MATERIALIZED (SELECT vec_id, embedding FROM e
                        ORDER BY vec_id LIMIT 1),
    m1 AS MATERIALIZED (
        SELECT e.vec_id, e.embedding,
               {q6('e.embedding', 'c1.embedding')} AS mind2
        FROM e, c1 WHERE e.vec_id <> c1.vec_id),{','.join(steps)}
    {' UNION ALL '.join(finals)}
    """


QUERIES = {
    "sample_coreset_kcenter": q_sample_coreset_kcenter,
    "sample_neyman_allocation": q_sample_neyman,
    "sample_split_deterministic": q_sample_split,
    "sample_split_group_holdout": q_sample_split_group,
    "sample_temperature_mix": q_sample_temperature_mix,
    "sample_stratified_by_lang": q_sample_stratified,
    "sample_cap_per_source": q_sample_cap_per_source,
    "sample_weighted_reservoir": q_sample_weighted,
}

_B = "substring(md5(CAST(doc_id AS VARCHAR)), 1, 2)"

ORACLE = {
    "sample_coreset_kcenter": _kcenter_oracle(),
    "sample_neyman_allocation": f"""
        WITH st AS (SELECT source, COUNT(*)::BIGINT AS n,
                           SUM(n_chars::HUGEINT) AS sx,
                           SUM((n_chars::HUGEINT * n_chars)) AS sxx
                    FROM documents GROUP BY 1),
        v AS (SELECT source, n,
                     CASE WHEN n < 2 THEN 0
                          ELSE ((n * sxx - sx * sx) * 1000000)
                               // (n * (n - 1)) END AS s2e6
              FROM st),
        s AS (SELECT source, n,
                     FLOOR(SQRT(s2e6::DOUBLE))::BIGINT AS s_e3
              FROM v),
        w AS (SELECT source, n, s_e3, n * s_e3 AS w FROM s),
        t AS (SELECT SUM(w) AS tw FROM w),
        j AS (SELECT source, n, s_e3,
                     ((w::HUGEINT) * {NEYMAN_BUDGET}) // tw AS base,
                     ((w::HUGEINT) * {NEYMAN_BUDGET}) % tw AS rem
              FROM w, t),
        u AS (SELECT SUM(base) AS used FROM j),
        r AS (SELECT *, ROW_NUMBER() OVER (ORDER BY rem DESC, source)
                            AS rk
              FROM j, u)
        SELECT source, n AS n_docs, s_e3,
               (base + CASE WHEN rk <= {NEYMAN_BUDGET} - used
                            THEN 1 ELSE 0 END)::BIGINT AS alloc
        FROM r
    """,
    "sample_temperature_mix": f"""
        WITH c AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY 1),
        t AS (SELECT COUNT(*) AS total FROM documents),
        s AS (SELECT lang, n,
                     CAST(ROUND(sqrt(n), 6) AS DECIMAL(28,6)) AS sq
              FROM c),
        den AS (SELECT SUM(sq) AS den FROM s),
        f AS (SELECT lang,
                     ROUND(CAST((SELECT total FROM t) AS DOUBLE)
                           * CAST(sq AS DOUBLE)
                           / CAST((SELECT den FROM den) AS DOUBLE)
                           / n, 6) AS factor
              FROM s),
        rep AS (
            SELECT d.doc_id, d.lang, f.factor,
                   CAST(FLOOR(f.factor) AS BIGINT)
                   + CASE WHEN {_B} < printf('%02x',
                              LEAST(CAST(ROUND((f.factor - FLOOR(f.factor))
                                               * 256, 0) AS INT), 255))
                          THEN 1 ELSE 0 END AS n_copies
            FROM documents d JOIN f USING (lang))
        SELECT doc_id, lang, factor,
               unnest(generate_series(1, n_copies)) AS copy
        FROM rep WHERE n_copies > 0
    """,
    "sample_split_deterministic": f"""
        SELECT doc_id, lang, source,
               CASE WHEN {_B} < '0d' THEN 'test'
                    WHEN {_B} < '1a' THEN 'val'
                    ELSE 'train' END AS split
        FROM documents
    """,
    "sample_stratified_by_lang": f"""
        SELECT doc_id, lang, source
        FROM documents
        WHERE {_B} < CASE WHEN lang = 'en' THEN '40'
                          WHEN lang IN ('de', 'fr', 'es') THEN '80'
                          ELSE 'c0' END
    """,
    "sample_weighted_reservoir": """
        SELECT doc_id, lang, n_chars, rk FROM (
            SELECT doc_id, lang, n_chars,
                   ROW_NUMBER() OVER (
                       PARTITION BY lang
                       ORDER BY POWER(
                           (('0x' || substring(md5(CAST(doc_id AS VARCHAR)),
                                               1, 6))::BIGINT::DOUBLE + 0.5)
                               / 16777216.0,
                           1.0 / n_chars::DOUBLE) DESC,
                           doc_id) AS rk
            FROM documents)
        WHERE rk <= 5
    """,
    "sample_cap_per_source": """
        SELECT doc_id, source, rk FROM (
            SELECT doc_id, source,
                   ROW_NUMBER() OVER (
                       PARTITION BY source
                       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
            FROM documents)
        WHERE rk <= 10
    """,
}

ORACLE["sample_split_group_holdout"] = """
    SELECT doc_id, source,
           CASE WHEN substring(md5(CAST(source AS VARCHAR)), 1, 2) < '40'
                    THEN 'test'
                WHEN substring(md5(CAST(source AS VARCHAR)), 1, 2) < '80'
                    THEN 'val'
                ELSE 'train' END AS split
    FROM documents
"""


BOOT_B = 8          # bootstrap replicates
_TWO52 = float(1 << 52)
# Cumulative Poisson(1) CDF thresholds P(X <= k), k = 0..5; weight 6
# beyond (P > 6 ~ 1e-4 truncated into the tail bucket).  Computed once
# here and embedded as shared repr literals in both dialects.
import math as _math

_POIS_CDF = []
_acc, _term = 0.0, _math.exp(-1.0)
for _k in range(6):
    _acc += _term
    _POIS_CDF.append(_acc)
    _term /= (_k + 1)


def _boot_weight(hash_sql: str, lit) -> str:
    """Poisson(1) bootstrap weight from a 52-bit portable hash: u =
    h / 2^52 (exact power-of-two division of identical integers), then
    the inverse-CDF CASE ladder over shared double literals — the
    deterministic multiplier every engine computes identically."""
    u = f"(CAST({hash_sql} AS DOUBLE) / {lit(_TWO52)})"
    cases = " ".join(
        f"WHEN {u} < {lit(t)} THEN {k}"
        for k, t in enumerate(_POIS_CDF))
    return f"(CASE {cases} ELSE 6 END)"


def q_stats_bootstrap(spark, sf_dir):
    """Poisson bootstrap of total revenue: B=8 deterministic resampling
    replicates of lineitem, each row drawn Poisson(1) times per
    replicate via a hash-derived uniform — the standard way to put a
    confidence interval on a 100 TB aggregate WITHOUT materializing
    resamples.

    All B replicates ride in ONE scan / ONE partial+final agg: per
    replicate a conditional weight column (md5(key, r) -> 52-bit
    uniform -> inverse-CDF ladder), then sum(w) and sum(w * price) —
    exact decimal x integer, order-independent — unpivoted to
    (replicate, n_sampled, sum_price) by stack().  No fan-out join, no
    shuffle of fact rows, reproducible across runs/partitionings by
    construction (hash-derived, no rand()).
    """
    li = load_table(spark, sf_dir, "lineitem")

    def lit_spark(x: float) -> str:
        return repr(float(x)) + "D"

    cols = []
    for r in range(1, BOOT_B + 1):
        h = (f"CAST(conv(substring(md5(concat_ws('-', "
             f"CAST(l_orderkey AS STRING), CAST(l_linenumber AS STRING), "
             f"'{r}')), 1, 13), 16, 10) AS BIGINT)")
        w = _boot_weight(h, lit_spark)
        cols.append(f"{w} AS w{r}")
    base = li.selectExpr("l_extendedprice", *cols)
    aggs = []
    for r in range(1, BOOT_B + 1):
        aggs += [F.sum(F.col(f"w{r}")).alias(f"n{r}"),
                 F.sum(F.col(f"w{r}")
                       * F.col("l_extendedprice").cast("decimal(12,2)"))
                  .cast("double").alias(f"s{r}")]
    one = base.agg(*aggs)
    stacked = ", ".join(f"{r}, n{r}, s{r}" for r in range(1, BOOT_B + 1))
    return one.selectExpr(
        f"stack({BOOT_B}, {stacked}) AS (replicate, n_sampled, sum_price)")


QUERIES["stats_bootstrap_poisson"] = q_stats_bootstrap


def _boot_oracle() -> str:
    def lit_duck(x: float) -> str:
        return f"CAST('{float(x)!r}' AS DOUBLE)"

    sels = []
    for r in range(1, BOOT_B + 1):
        h = (f"(('0x' || substr(md5(concat_ws('-', "
             f"CAST(l_orderkey AS VARCHAR), CAST(l_linenumber AS VARCHAR), "
             f"'{r}')), 1, 13))::BIGINT)")
        w = _boot_weight(h, lit_duck)
        sels.append(
            f"SELECT {r} AS replicate, SUM(w)::BIGINT AS n_sampled, "
            f"SUM(w * p)::DOUBLE AS sum_price FROM "
            f"(SELECT {w} AS w, CAST(l_extendedprice AS DECIMAL(12,2)) AS p"
            f" FROM lineitem)")
    return "\n    UNION ALL ".join(sels)


ORACLE["stats_bootstrap_poisson"] = _boot_oracle()


QUERIES["reservoir_delta_refresh"] = q_reservoir_delta

# direct reservoir over the POST-insert corpus: merged == rebuilt
ORACLE["reservoir_delta_refresh"] = ORACLE["sample_weighted_reservoir"]


AGB_MOD = 16        # deterministic 1/16 hash sample
AGB_Z_E6 = 1_959_964   # z_{0.975} in micro-units (shared literal)


def q_approx_groupby_sample_ci(spark, sf_dir):
    """APPROXIMATE GROUP BY from a deterministic hash sample with
    normal-approximation confidence intervals — the interactive-
    exploration primitive at 100 TB (BlinkDB's contract): scan only
    the 1/{m} sample (md5(orderkey, linenumber) % {m} == 0 — a
    deterministic, repeatable sample, not rand()), aggregate
    per-group integer-cent sums/squares, and report the estimated
    mean with a 95% CI half-width so the reader knows when the
    sample suffices and when to pay for the exact scan.

    Engine-exact: the sample predicate, n, sum(cents) and
    sum(cents^2) are exact integers (squares widen to DECIMAL(38,0)
    — cents^2 ~ 1e14 times millions of rows overflows BIGINT); the
    variance numerator n*ssq - s^2 stays exact DECIMAL and converts
    to double ONCE (correctly rounded from the same integer in both
    engines) before the single sqrt; mean and CI quantize to
    micro-cents.

    Scale: one narrow filter (16x scan reduction in rows touched;
    with a persisted sample table it is a 16x I/O reduction) + one
    partial+final agg to the |groups|-row grid.  Nothing else.

    Output: (l_returnflag, l_linestatus, n_sample, est_n_total,
    mean_e4, ci_half_e4).
    """.format(m=AGB_MOD)
    li = load_table(spark, sf_dir, "lineitem")
    base = (li.selectExpr(
        "l_returnflag", "l_linestatus",
        "CAST(FLOOR(CAST(l_extendedprice AS DOUBLE) * 100 + 0.5)"
        " AS BIGINT) AS cents",
        f"CAST(conv(substring(md5(concat_ws('-',"
        f" CAST(l_orderkey AS STRING),"
        f" CAST(l_linenumber AS STRING))), 1, 8), 16, 10) AS BIGINT)"
        f" % {AGB_MOD} AS sel")
        .filter(F.col("sel") == 0))
    g = (base.groupBy("l_returnflag", "l_linestatus")
             .agg(F.count(F.lit(1)).alias("n"),
                  F.sum("cents").alias("s"),
                  F.sum(F.expr(
                      "CAST(cents AS DECIMAL(38,0)) * cents"))
                   .alias("ssq"))
             .filter(F.col("n") > 1))   # a 1-row group has no variance
    return g.selectExpr(
        "l_returnflag", "l_linestatus",
        "n AS n_sample",
        f"n * {AGB_MOD} AS est_n_total",
        "CAST((CAST(s AS DECIMAL(38,0)) * 10000) DIV n AS BIGINT)"
        " AS mean_e4",
        # var = (n*ssq - s^2) / (n*(n-1)); ci = z * sqrt(var / n)
        f"CAST(FLOOR({AGB_Z_E6}E-6 * SQRT("
        " CAST(CAST(n AS DECIMAL(38,0)) * ssq"
        "      - CAST(s AS DECIMAL(38,0)) * s AS DOUBLE)"
        " / CAST(CAST(n AS DECIMAL(38,0)) * (n - 1) AS DOUBLE)"
        " / CAST(n AS DOUBLE)) * 10000) AS BIGINT) AS ci_half_e4")


QUERIES["approx_groupby_sample_ci"] = q_approx_groupby_sample_ci

ORACLE["approx_groupby_sample_ci"] = f"""
    WITH base AS (
        SELECT l_returnflag, l_linestatus,
               CAST(FLOOR(CAST(l_extendedprice AS DOUBLE) * 100 + 0.5)
                    AS BIGINT) AS cents
        FROM lineitem
        WHERE ('0x' || substr(md5(CAST(l_orderkey AS VARCHAR) || '-'
                   || CAST(l_linenumber AS VARCHAR)), 1, 8))::BIGINT
              % {AGB_MOD} = 0),
    g AS (
        SELECT l_returnflag, l_linestatus,
               COUNT(*)::BIGINT AS n,
               SUM(cents)::HUGEINT AS s,
               SUM(cents::HUGEINT * cents)::HUGEINT AS ssq
        FROM base GROUP BY 1, 2
        HAVING COUNT(*) > 1)
    SELECT l_returnflag, l_linestatus,
           n AS n_sample,
           (n * {AGB_MOD})::BIGINT AS est_n_total,
           (s * 10000 // n)::BIGINT AS mean_e4,
           CAST(FLOOR(0.000001 * {AGB_Z_E6} * SQRT(
               CAST(n::HUGEINT * ssq - s * s AS DOUBLE)
               / CAST(n::HUGEINT * (n - 1) AS DOUBLE)
               / CAST(n AS DOUBLE)) * 10000) AS BIGINT) AS ci_half_e4
    FROM g
"""
