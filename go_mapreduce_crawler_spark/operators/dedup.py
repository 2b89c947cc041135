"""Deduplication operators over the ``documents`` table — LLM-pipeline
extensions (BASELINE.json north_star; not in the reference, which has no
relational surface at all).

Five dedup families, each with the scale strategy stated:

* exact            — hash-groupBy on content digest.  One shuffle on the
                     digest; digests are uniform so no skew.  The 100 TB
                     path: shuffle 16-byte digests, never full texts.
* ngram jaccard    — exact all-pairs word-set Jaccard via token inverted
                     index (explode -> self-join on token -> count).
                     Exact but quadratic in colliding docs; the oracle-
                     checkable ground truth for the approximate methods
                     at test SF.  At 100 TB use minhash_lsh instead.
* minhash LSH      — shingle -> k minhashes -> band buckets -> bucket
                     join -> verify candidates with true Jaccard.  The
                     scale path: cost is O(docs x k) + bucket-local pairs,
                     no quadratic blowup; all JVM built-ins (one md5 per
                     shingle + Carter-Wegman integer rehashing,
                     aggregate), zero Python in the hot path.
* simhash          — 60-bit fingerprint from token-hash bit votes;
                     near-dup = Hamming distance <= 3 found via 4x15-bit
                     band buckets (pigeonhole: any pair within distance 3
                     shares at least one of 4 bands exactly).
* embedding cosine — near-dup = cosine >= threshold on the embeddings
                     table; brute self-join at test SF, LSH-bucketed in
                     similarity.py for scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.vectors import dot, l2_norm
from ..sources.tables import load_table, spread

MINHASH_K = 32        # minhash signature length
LSH_BANDS = 8         # bands of r = K/BANDS rows each
SHINGLE_N = 3         # words per shingle
JACCARD_T = 0.5       # near-dup threshold

# Carter-Wegman minhash family over the md5-derived 32-bit shingle hash:
# h_k(x) = (a_k*x + b_k) mod (2^31 - 1).  Fixed seeded constants so both
# engines (and every run) share the family; a_k < 2^31 keeps a*h < 2^63
# (no BIGINT overflow anywhere).
MH_P = 2_147_483_647
import random as _random
_mh_rng = _random.Random(11)
MH_AB = tuple((_mh_rng.randrange(1, MH_P), _mh_rng.randrange(0, MH_P))
              for _ in range(MINHASH_K))
del _mh_rng


def _docs(spark, sf_dir):
    """documents, spread to engine parallelism (gated — see tables.spread).

    The row-local fingerprint/shingle work here is CPU-bound
    (interpreted higher-order functions), so a single-split test file
    must be spread across cores; on a 100 TB corpus the scan already
    yields thousands of splits and spread() is a no-op — no shuffle.
    """
    return spread(load_table(spark, sf_dir, "documents"), "doc_id")


def _words(spark, sf_dir) -> DataFrame:
    """(doc_id, word) distinct pairs — the token inverted index."""
    d = _docs(spark, sf_dir)
    return (d.select("doc_id",
                     F.explode(F.split(F.col("text"), " ")).alias("word"))
             .distinct())


# The exact-pair diagnostics (Jaccard / containment ground truth) run
# an inverted-index SELF-JOIN with no df-cap: one stop-word common to n
# docs emits O(n^2) join rows before the groupBy.  That is the point —
# they are the EXACT calibration baseline the banded families are
# measured against — but it makes them corpus-killing past a sample.
# This bound ENFORCES the sample contract the docstrings promise
# (r08 verdict item 3; the EMBED_DEDUP_MAX_ROWS precedent): generous
# for any calibration sample, a hard refusal for a full 100 TB corpus.
JACCARD_EXACT_MAX_DOCS = 100_000
_PAIR_BOUND_PROBED: set = set()


def _enforce_exact_pair_bound(d: DataFrame, op: str,
                              max_docs: int | None = None,
                              corpus_key: str | None = None) -> None:
    """Refuse to run an exact all-pairs diagnostic on an oversized
    corpus.  limit(N+1).count() answers over/under without a full scan;
    callers pass the documents DF before any tokenization.  The bound
    is read at call time so deployments can retune the module constant.
    A passing probe is cached per (corpus_key, bound) — the
    similarity._GATE_PROBED pattern — so repeat calls on the same
    fixture (family_overlap, bench best-of-3) pay it once.

    IMMUTABILITY ASSUMPTION (r09 advice item 2): the cache key is the
    corpus PATH, so a fixture rewritten/grown in-process after a
    passing probe would skip the guard.  The driver/bench/test
    fixtures under /root/testdata are immutable by contract; callers
    pointing this at a mutable location must pass corpus_key=None
    (probe every call) or fold a content fingerprint (e.g. file
    mtimes) into corpus_key themselves."""
    if max_docs is None:
        max_docs = JACCARD_EXACT_MAX_DOCS
    cache = (corpus_key, max_docs) if corpus_key is not None else None
    if cache is not None and cache in _PAIR_BOUND_PROBED:
        return
    if d.limit(max_docs + 1).count() > max_docs:
        raise ValueError(
            f"{op} is an exact quadratic diagnostic (inverted-index "
            f"self-join, no df-cap); corpus exceeds the {max_docs}-doc "
            f"sample bound. Calibrate on a sample (df.sample/limit) — "
            f"the banded families (dedup_minhash_lsh, dedup_simhash, "
            f"dedup_components_lsh) are the production path.")
    if cache is not None:
        _PAIR_BOUND_PROBED.add(cache)


def q_dedup_exact(spark, sf_dir):
    """Exact duplicate groups by md5 digest of the raw text."""
    d = _docs(spark, sf_dir)
    return (d.groupBy(F.md5(F.encode(F.col("text"), "UTF-8")).alias("text_hash"))
             .agg(F.count(F.lit(1)).alias("n_copies"),
                  F.min("doc_id").alias("keep_doc_id"))
             .filter(F.col("n_copies") >= 1))


def q_dedup_exact_keep(spark, sf_dir):
    """dropDuplicates semantics with a deterministic survivor (min doc_id)."""
    d = _docs(spark, sf_dir)
    return (d.groupBy("text")
             .agg(F.min("doc_id").alias("doc_id"))
             .select("doc_id"))


def q_dedup_keep_best(spark, sf_dir):
    """Exact-dup survivorship by QUALITY policy: per duplicate group keep
    the longest copy (ties -> lowest doc_id) — the curation rule when
    near-identical crawls differ by truncation and you want the fullest
    text, not an arbitrary id.

    Scale shape: ONE partial+final aggregate on the text digest — the
    survivor rides in a min(struct(-n_chars, doc_id)) cell, so no window
    over the corpus and no second pass (the ROW_NUMBER formulation the
    oracle uses shuffles whole rows and sorts per group; the aggregate
    form shuffles 16-byte digests + one tiny struct).
    """
    d = _docs(spark, sf_dir)
    best = F.min(F.struct((-F.col("n_chars")).alias("negn"),
                          F.col("doc_id").alias("did")))
    return (d.groupBy(F.md5(F.encode("text", "UTF-8")).alias("text_hash"))
            .agg(F.count(F.lit(1)).alias("n_copies"), best.alias("b"))
            .select("text_hash", "n_copies",
                    F.col("b.did").alias("keep_doc_id"),
                    (-F.col("b.negn")).alias("keep_n_chars")))


def q_dedup_incremental(spark, sf_dir):
    """Incremental ingest dedup: an incoming batch (doc_id % 10 == 0
    stands in for "today's crawl") keeps only documents whose content
    digest appears NEITHER in the existing corpus NOR earlier in the
    batch itself — the per-ingest step of a continuously-growing corpus,
    where re-deduplicating 100 TB from scratch per day is not an option.

    Scale shape: one digest anti-join + one digest groupBy — 16-byte
    keys only, never text.  At full scale the base digest set lives as
    a bucketed table (or bloom filter for a first pass) so the anti-join
    is co-located; the plan shape is unchanged.
    """
    d = _docs(spark, sf_dir)
    dig = F.md5(F.encode(F.col("text"), "UTF-8"))
    base = d.filter(F.col("doc_id") % 10 != 0).select(dig.alias("h"))
    inc = d.filter(F.col("doc_id") % 10 == 0).select("doc_id", dig.alias("h"))
    return (inc.join(base, "h", "left_anti")
            .groupBy("h").agg(F.min("doc_id").alias("doc_id"))
            .select("doc_id", F.col("h").alias("text_hash")))


def q_dedup_jaccard_pairs(spark, sf_dir):
    """Exact word-set Jaccard >= 0.5 pairs via inverted-index self-join.

    jaccard = |A∩B| / (|A| + |B| - |A∩B|), integer counts -> one double
    division (engine-deterministic), rounded to 6 dp for the hash gate.

    Sample-contract ENFORCED: refuses corpora past
    JACCARD_EXACT_MAX_DOCS — this is the exact diagnostic baseline, not
    the production dedup pass (that is the banded MinHash family).
    """
    _enforce_exact_pair_bound(_docs(spark, sf_dir), "dedup_jaccard_pairs",
                              corpus_key=sf_dir)
    words = _words(spark, sf_dir)
    sizes = words.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_words"))
    a = words.alias("a")
    b = words.alias("b")
    common = (a.join(b, (F.col("a.word") == F.col("b.word"))
                      & (F.col("a.doc_id") < F.col("b.doc_id")))
               .groupBy(F.col("a.doc_id").alias("doc_a"),
                        F.col("b.doc_id").alias("doc_b"))
               .agg(F.count(F.lit(1)).alias("common")))
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_words").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_words").alias("nb"))
    return (common.join(sa, "doc_a").join(sb, "doc_b")
            .withColumn("jaccard", F.round(
                F.col("common") / (F.col("na") + F.col("nb") - F.col("common")), 6))
            .filter(F.col("jaccard") >= JACCARD_T)
            .select("doc_a", "doc_b", "jaccard"))


SN_WINDOW = 4         # sorted-neighborhood comparison window (ranks)
SN_KEY_CHARS = 32     # normalized sort-key prefix length


def q_dedup_sorted_neighborhood(spark, sf_dir):
    """Sorted-neighborhood blocking (Hernandez & Stolfo's merge/purge):
    sort the corpus by a normalized key prefix and compare each document
    only to its SN_WINDOW successors in sort order — the classic
    pre-LSH blocking family, and still the right tool when near-dups
    are PREFIX-agreeing (truncated crawls, boilerplate-led re-renders)
    because the sort puts them adjacent regardless of how much tail
    content diverged (token-bag LSH scores the whole document, so a
    short doc wholly contained in a long one can band apart).

    Key = first {SN_KEY_CHARS} chars of lower(alnum-only(text[:64])).
    Candidate pairs = rank gap in [1, SN_WINDOW]; verification = exact
    word-set Jaccard >= JACCARD_T (shared convention with
    dedup_jaccard_pairs).  Output: canonical (doc_a < doc_b) verified
    pairs with their rank gap.

    Scale shape (the point of SN at 100 TB): candidate count is exactly
    N x SN_WINDOW — linear, no quadratic blowup and no banding false
    positives.  The global rank is computed WITHOUT a global
    single-partition sort: order-preserving key-prefix buckets get
    per-bucket row_numbers (spillable sorts), and a |buckets|-row
    cumulative-offset relation broadcasts back (the two-level recipe
    shared with the temporal prefix-max family).  The rank-band join
    is EQUI (explode gap 1..W, join on rank) — shuffles (rank, id)
    pairs, never text.  Known limit, stated not hidden: a celebrity
    key prefix (shared boilerplate head) makes one bucket's sort big —
    that sort spills; it never changes the pair bound.
    """
    from pyspark.sql import Window as W

    d = _docs(spark, sf_dir)
    key = F.substring(
        F.regexp_replace(F.lower(F.substring(F.col("text"), 1, 64)),
                         "[^a-z0-9]", ""),
        1, SN_KEY_CHARS)
    keyed = d.select("doc_id", key.alias("k"))
    bucketed = keyed.withColumn("b", F.substring("k", 1, 2))
    rb = F.row_number().over(W.partitionBy("b").orderBy("k", "doc_id"))
    per = bucketed.withColumn("rb", rb)
    # |buckets|-row offsets: the only single-partition window is over
    # <= 36^2 rows (bucket ids), not the corpus.
    sizes = bucketed.groupBy("b").agg(F.count(F.lit(1)).alias("n"))
    w_off = (W.orderBy("b")
             .rowsBetween(W.unboundedPreceding, -1))
    offs = sizes.select(
        "b", F.coalesce(F.sum("n").over(w_off), F.lit(0)).alias("off"))
    ranked = (per.join(F.broadcast(offs), "b")
              .select("doc_id", (F.col("rb") + F.col("off")).alias("rk")))

    gaps = F.array(*[F.lit(i) for i in range(1, SN_WINDOW + 1)])
    cand = (ranked.select(F.col("doc_id").alias("id_lo"),
                          F.col("rk").alias("ra"))
            .withColumn("rank_gap", F.explode(gaps))
            .withColumn("rk", F.col("ra") + F.col("rank_gap"))
            .join(ranked.select(F.col("doc_id").alias("id_hi"), "rk"), "rk")
            .select("id_lo", "id_hi", "rank_gap"))

    words = _words(spark, sf_dir)
    sizes_w = words.groupBy("doc_id").agg(F.count(F.lit(1)).alias("nw"))
    wa = words.select(F.col("doc_id").alias("id_lo"), "word")
    wb = words.select(F.col("doc_id").alias("id_hi"), "word")
    common = (cand.join(wa, "id_lo").join(wb, ["id_hi", "word"])
              .groupBy("id_lo", "id_hi", "rank_gap")
              .agg(F.count(F.lit(1)).alias("common")))
    sa = sizes_w.select(F.col("doc_id").alias("id_lo"),
                        F.col("nw").alias("na"))
    sb = sizes_w.select(F.col("doc_id").alias("id_hi"),
                        F.col("nw").alias("nb"))
    jac = F.round(F.col("common")
                  / (F.col("na") + F.col("nb") - F.col("common")), 6)
    return (common.join(sa, "id_lo").join(sb, "id_hi")
            .withColumn("jaccard", jac)
            .filter(F.col("jaccard") >= JACCARD_T)
            .select(F.least("id_lo", "id_hi").alias("doc_a"),
                    F.greatest("id_lo", "id_hi").alias("doc_b"),
                    "rank_gap", "jaccard"))


CONTAIN_T = 0.9       # containment threshold (|A∩B| / |A|)


def q_dedup_containment(spark, sf_dir):
    """ASYMMETRIC containment near-dup pairs: |A∩B| / |A| >= 0.9 — the
    "document A is (almost) wholly inside document B" case that
    symmetric Jaccard misses (a short quote inside a long page has high
    containment but low Jaccard, so Jaccard-based dedup keeps both).

    Emits (inner_doc, outer_doc, containment) with inner != outer; both
    directions are checked (each side's own size is the denominator).
    Same inverted-index shape as dedup_jaccard_pairs — the exact
    quadratic ground truth at test SF; the scale path is the same
    MinHash machinery with containment-calibrated thresholds (Broder's
    containment sketches), documented not duplicated.  Sample-contract
    ENFORCED via the shared JACCARD_EXACT_MAX_DOCS bound.
    """
    _enforce_exact_pair_bound(_docs(spark, sf_dir), "dedup_containment",
                              corpus_key=sf_dir)
    words = _words(spark, sf_dir)
    sizes = words.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_words"))
    a = words.alias("a")
    b = words.alias("b")
    common = (a.join(b, (F.col("a.word") == F.col("b.word"))
                      & (F.col("a.doc_id") != F.col("b.doc_id")))
               .groupBy(F.col("a.doc_id").alias("inner_doc"),
                        F.col("b.doc_id").alias("outer_doc"))
               .agg(F.count(F.lit(1)).alias("common")))
    si = sizes.select(F.col("doc_id").alias("inner_doc"),
                      F.col("n_words").alias("n_inner"))
    return (common.join(si, "inner_doc")
            .withColumn("containment",
                        F.round(F.col("common") / F.col("n_inner"), 6))
            .filter(F.col("containment") >= CONTAIN_T)
            .select("inner_doc", "outer_doc", "containment"))


def _bucket_pairs(bands: DataFrame) -> DataFrame:
    """(doc_id, bb) -> distinct candidate pairs (doc_a < doc_b) per
    bucket, generated array-locally after one groupBy shuffle."""
    return (bands.groupBy("bb")
            .agg(F.sort_array(F.collect_set("doc_id")).alias("ids"))
            .filter(F.size("ids") >= 2)
            .select(F.explode(F.expr(
                "flatten(transform(sequence(1, size(ids) - 1),"
                " i -> transform(slice(ids, i + 1, size(ids) - i),"
                "      b -> struct(element_at(ids, i) AS doc_a, b AS doc_b))))"
            )).alias("p"))
            .select("p.doc_a", "p.doc_b")
            .distinct())


def _shingles(spark, sf_dir) -> DataFrame:
    """(doc_id, shingles array<string>) — distinct word 3-grams per doc.

    Built with sliced zip_with, NOT element_at indexing: higher-order
    lambdas are interpreted (no codegen), and an `element_at(split(text),
    i)` inside a transform re-evaluates the split per element — measured
    10x slower.  Slices reference the split result three times total.
    """
    d = _docs(spark, sf_dir)
    w = F.split(F.col("text"), " ")
    n = F.size(w)
    pair = F.zip_with(F.slice(w, 1, n - 2), F.slice(w, 2, n - 2),
                      lambda a, b: F.concat_ws(" ", a, b))
    tri = F.zip_with(pair, F.slice(w, 3, n - 2),
                     lambda ab, c_: F.concat_ws(" ", ab, c_))
    sh = F.when(n >= SHINGLE_N, tri).otherwise(F.array(F.col("text")))
    return d.select("doc_id", F.array_distinct(sh).alias("shingles"))


def _sig_agg_of(docs_df: DataFrame) -> DataFrame:
    """(doc_id, h0..h{k}) Carter-Wegman signatures for an ARBITRARY
    documents-shaped DataFrame, with the md5 shingle hash computed
    EXACTLY ONCE per shingle: the hash array is exploded (the
    Generate's input projection evaluates the transform once per row)
    and the {k} minima are one partial+final aggregation.  This is
    the cache-free alternative to _minhash_sig's barrier: HOFs are
    interpreted (no codegen subexpression elimination), so the
    transform/array_min form recomputes the md5 transform {k}x unless
    a cache blocks projection collapse — wrong for streaming batches
    (leaked cache per micro-batch) and for one-shot consumers like
    the banding advisor (two corpus-sized relations pinned for no
    reuse).  The agg costs one doc-keyed shuffle of (doc, h) rows,
    absorbed map-side.  Same shingle construction and hash family as
    the batch operators, so candidacy agrees bit-for-bit."""
    w = F.split(F.col("text"), " ")
    n = F.size(w)
    pair = F.zip_with(F.slice(w, 1, n - 2), F.slice(w, 2, n - 2),
                      lambda a, b: F.concat_ws(" ", a, b))
    tri = F.zip_with(pair, F.slice(w, 3, n - 2),
                     lambda ab, c_: F.concat_ws(" ", ab, c_))
    sh = F.when(n >= SHINGLE_N, tri).otherwise(F.array(F.col("text")))
    # explode_OUTER + null-filter (r12): plain explode's inferred
    # non-empty filter re-evaluates the collapsed shingle+md5
    # transform in a Filter below the Generate — a duplicate hash
    # pass per row (and, in the streaming merges, one that sinks
    # below the spread exchange into the serial scan task).  h is
    # never null (conv of md5), so rows match the inner explode.
    hs_rows = (docs_df
               .select("doc_id", F.array_distinct(sh).alias("shingles"))
               .select("doc_id", F.explode_outer(F.expr(
                   "transform(shingles, s -> cast(conv(substring("
                   "md5(s), 1, 8), 16, 10) as bigint))")).alias("h"))
               .filter(F.col("h").isNotNull()))
    return hs_rows.groupBy("doc_id").agg(*[
        F.min(F.expr(f"({a}L * h + {b}L) % {MH_P}L")).alias(f"h{k}")
        for k, (a, b) in enumerate(MH_AB)])


_sig_agg_of.__doc__ = _sig_agg_of.__doc__.replace("{k}", str(MINHASH_K))


def _band_buckets_of(docs_df: DataFrame) -> DataFrame:
    """(doc_id, band, bucket) LSH band-bucket keys for an ARBITRARY
    documents-shaped DataFrame — the per-batch form of _minhash_bands
    for the streaming family, built on _sig_agg_of (md5 once per
    shingle, no cache).  Same band keys as the batch operators, so
    streaming and batch candidacy agree bit-for-bit."""
    sig = _sig_agg_of(docs_df)
    r = MINHASH_K // LSH_BANDS
    return (sig.selectExpr(
                "doc_id",
                "explode(array(" + ",".join(
                    f"struct({b} AS band, md5(concat_ws(',',"
                    + ",".join(f"h{b * r + j}" for j in range(r))
                    + ")) AS bucket)"
                    for b in range(LSH_BANDS)) + ")) AS bb")
               .select("doc_id", "bb.band", "bb.bucket"))


def _minhash_sig(spark, sf_dir):
    """(shingles, k={k} Carter-Wegman signature) relations — the shared
    front of _minhash_bands and the banding advisor.  See
    _minhash_bands for the hashing rationale."""
    sh = _shingles(spark, sf_dir).cache()
    hs = sh.selectExpr(
        "doc_id",
        "transform(shingles, s ->"
        " cast(conv(substring(md5(s), 1, 8), 16, 10) as bigint)) AS hs"
    ).cache()
    sig = hs.selectExpr("doc_id", *[
        f"array_min(transform(hs, h -> ({a}L * h + {b}L) % {MH_P}L)) AS h{k}"
        for k, (a, b) in enumerate(MH_AB)])
    return sh, sig


_minhash_sig.__doc__ = _minhash_sig.__doc__.replace("{k}", str(MINHASH_K))


def _minhash_bands(spark, sf_dir):
    """Shared (shingles, band-bucket) pipeline for the minhash family.

    Signature + bands as generated SQL (one parse), not Column algebra
    (a py4j round-trip per node — 0.8s of driver-side construction for
    the 32 transform/fold trees; see similarity._dot_sql).

    Each shingle STRING is hashed exactly once (md5, first 8 hex chars
    -> 32-bit int); the k=32 minhash family then rehashes that value
    with a Carter-Wegman universal hash, (a*h + b) mod (2^31 - 1) —
    integer work instead of 32 string traversals per shingle, with
    a*h < 2^63 so the arithmetic is overflow-free in BOTH engines.
    This basis (vs the earlier xxhash64 + murmur3) makes the whole
    operator engine-portable: the driver value-hashes it against a
    full DuckDB oracle.  The cache() is a required optimizer barrier:
    without it Catalyst collapses the projections and inlines the md5
    transform into all 32 min-folds, recomputing the string hashing
    32x (the similarity.py `bits` lesson).
    """
    sh, sig = _minhash_sig(spark, sf_dir)
    r = MINHASH_K // LSH_BANDS
    bands = sig.selectExpr(
        "doc_id",
        "explode(array(" + ",".join(
            f"struct({b} AS band, md5(concat_ws(',',"
            + ",".join(f"h{b * r + j}" for j in range(r)) + ")) AS bucket)"
            for b in range(LSH_BANDS)) + ")) AS bb")
    return sh, bands


def q_dedup_minhash_lsh(spark, sf_dir):
    """MinHash-LSH near-dup pairs, verified with true shingle Jaccard.

    Pipeline (all JVM expressions): shingle -> per-seed minhash signature
    (k=32 via xxhash64(shingle, seed)) -> 8 bands of 4 -> candidates =
    docs sharing any band bucket -> verify true Jaccard >= 0.5 on the
    shingle sets.  Output ⊆ exact shingle-Jaccard pairs, recall governed
    by (b, r).

    Scale shape: the signature is computed ROW-LOCALLY
    (array_min over transform of the shingle array — no explode, no
    shuffle, whole-stage codegen), so the only shuffles are the band
    bucket join on (band, bucket) — signature bytes, not documents —
    and the candidate-verify join on doc_id.
    """
    sh, bands = _minhash_bands(spark, sf_dir)
    # Bucket-group instead of self-join: signatures are computed ONCE,
    # one shuffle groups (band, bucket) -> sorted doc list, pairs are
    # generated array-locally.  A pathological hot bucket (thousands of
    # near-identical docs) would emit k^2 pairs in one task — at that
    # point the docs are duplicates by construction and exact dedup
    # should have removed them first (pipeline ordering note).
    cand = _bucket_pairs(bands)
    va = sh.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a"))
    vb = sh.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    # shuffle_hash hint: without it Catalyst's size estimate can pick
    # the SHINGLE relation as the broadcast side of the verify join
    # (measured: driver OOM at the 10x replica scale on a default-heap
    # driver) — the one relation that must never broadcast; the hint
    # keeps the verify a shuffled hash join with the id-pair side as
    # build, so shingle arrays shuffle once on doc_id and nothing
    # collects on the driver.  Same fix at every cand-verify site.
    return (cand.hint("shuffle_hash").join(va, "doc_a")
            .hint("shuffle_hash").join(vb, "doc_b")
            .withColumn("jaccard", F.round(
                inter / (F.size("sh_a") + F.size("sh_b") - inter), 6))
            .filter(F.col("jaccard") >= JACCARD_T)
            .select("doc_a", "doc_b", "jaccard"))


# The fingerprint is computed ROW-LOCALLY in one aggregate expression —
# hash each shingle once, fold ±1 bit votes into a 60-long sums vector,
# finish by packing sign bits into the long.  Zero shuffles for
# fingerprinting (an earlier explode-to-(doc,bit,vote) formulation
# shuffled features x 64 rows and was 6x slower); the only shuffles left
# are the band bucketing and the pair joins.  Module-level so the
# pigeonhole-completeness test can recompute raw fingerprints.
SIMHASH_FP_EXPR = """
    aggregate(
        transform(shingles,
                  s -> cast(conv(substring(md5(s), 1, 15), 16, 10) as bigint)),
        array_repeat(0L, 60),
        (acc, h) -> zip_with(acc, sequence(0, 59),
                             (a, i) -> a + IF((shiftright(h, i) & 1L) = 1L, 1L, -1L)),
        sums -> aggregate(
            zip_with(sums, sequence(0, 59),
                     (s, i) -> IF(s > 0L, shiftleft(1L, i), 0L)),
            0L, (acc2, x) -> acc2 | x))
"""


def q_dedup_simhash(spark, sf_dir):
    """SimHash fingerprints + Hamming<=3 near-dup pairs via band buckets.

    Fingerprint: per-feature 60-bit hash (the first 15 hex chars of one
    md5 — 60 rather than 64 bits so the oracle's 1<<i packing never
    overflows DuckDB's checked BIGINT shift); bit i of the fingerprint
    is the sign of sum over features of (+1 if bit set else -1).  Pairs
    within Hamming distance 3 must agree exactly on one of 4 15-bit
    bands (pigeonhole — holds for any equal 4-way split).  The md5
    basis makes the operator engine-portable: the driver value-hashes
    it against a full DuckDB oracle.  Features are word 3-grams, not unigrams: this
    corpus draws from a ~30-word vocabulary, and unigram token sets
    collide so heavily that fingerprints degenerate (measured 98k
    Hamming-0 pairs); shingles restore discriminative power — the same
    choice production simhash (e.g. Google's) makes.
    """
    fps = (_shingles(spark, sf_dir)
           .select("doc_id", F.expr(SIMHASH_FP_EXPR).alias("fp"))
           .cache())
    bands = fps.select(
        "doc_id",
        F.explode(F.array(*[
            F.struct(F.lit(b).alias("band"),
                     F.shiftright("fp", b * 15).bitwiseAND(F.lit(0x7FFF)).alias("chunk"))
            for b in range(4)])).alias("bb"))
    fa = fps.select(F.col("doc_id").alias("doc_a"), F.col("fp").alias("fp_a"))
    fb = fps.select(F.col("doc_id").alias("doc_b"), F.col("fp").alias("fp_b"))
    return (_bucket_pairs(bands)
            .join(fa, "doc_a").join(fb, "doc_b")
            .withColumn("hamming", F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b"))))
            .filter(F.col("hamming") <= 3)
            .select("doc_a", "doc_b", "hamming"))


COSINE_DUP_T = 0.4    # the synthetic embeddings top out at cos ~0.51

# q_dedup_embedding ships the whole corpus in the kernel closure — exact
# all-pairs is only sane for corpora that fit an executor comfortably.
# 1M rows x 64 dims x 8 bytes = 512 MB of closure: refuse well before
# that instead of OOMing executors at 100x scale.
EMBED_DEDUP_MAX_ROWS = 250_000


def q_dedup_embedding(spark, sf_dir):
    """Embedding-cosine near-dup pairs (cosine >= 0.4), exact.

    Two phases so the n^2 work runs vectorized but the OUTPUT stays
    bit-identical to the DuckDB oracle:

    1. *Candidate discovery*: each Arrow batch multiplies its block of
       normalized vectors against the full corpus matrix (numpy matmul)
       and emits pairs with cosine >= T - 1e-6 — a superset of the true
       pair set (float64 matmul error for 64-dim dots is ~1e-15, six
       orders inside the margin).  This replaced the pure-JVM
       interpreted fold over all n^2/2 pairs: 20.3s -> ~1s at sf0.1.
    2. *Exact re-score*: survivors join their vectors back and compute
       the cosine with the SAME sequential JVM fold as before — Spark's
       fold is bit-identical to DuckDB's list_reduce (verified over all
       124,750 sf0.01 pairs), so the value oracle still holds exactly.

    The corpus matrix rides in the kernel closure — bounded at test SF
    (512 KB at sf0.1) and GATED at EMBED_DEDUP_MAX_ROWS: above that the
    closure would OOM executors, so the operator refuses and points at
    the LSH-bucketed path (similarity.q_ann_lsh / dedup_components_lsh)
    where candidates come from one bucket shuffle instead of a closure
    matrix.  This exact all-pairs form is inherently quadratic.
    """
    import numpy as np
    import pandas as pd

    e = (load_table(spark, sf_dir, "embeddings")
         .withColumn("nrm", l2_norm("embedding")))
    # Bounded probe: limit(N+1).count() answers over/under without the
    # full-table count job the plain count() would run per invocation.
    if e.limit(EMBED_DEDUP_MAX_ROWS + 1).count() > EMBED_DEDUP_MAX_ROWS:
        raise ValueError(
            f"dedup_embedding_cosine is exact all-pairs with the corpus in "
            f"the kernel closure; corpus exceeds the {EMBED_DEDUP_MAX_ROWS}-"
            f"row bound. Use dedup_components_lsh / ann_lsh_cosine at scale.")
    corpus = e.select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in corpus], dtype=np.int64)
    m = np.array([r.embedding for r in corpus], dtype=np.float64)
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)

    def kernel(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            bids = pdf["vec_id"].to_numpy()
            bm = np.array(list(pdf["embedding"]), dtype=np.float64)
            bmn = bm / np.linalg.norm(bm, axis=1, keepdims=True)
            s = bmn @ mn.T
            keep = (s >= COSINE_DUP_T - 1e-6) & (bids[:, None] < ids[None, :])
            ai, bj = np.nonzero(keep)
            yield pd.DataFrame({"id_a": bids[ai], "id_b": ids[bj]})

    cand = e.select("vec_id", "embedding").mapInPandas(
        kernel, schema="id_a long, id_b long")
    a = e.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"),
                 F.col("nrm").alias("na"))
    b = e.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"),
                 F.col("nrm").alias("nb"))
    # Norms folded once per row; each surviving pair costs one fold,
    # bit-identical to cosine_sim's operation order.
    return (cand.hint("shuffle_hash").join(a, "id_a")
             .hint("shuffle_hash").join(b, "id_b")
             .withColumn("cos", F.round(dot("va", "vb") / (F.col("na") * F.col("nb")), 6))
             .filter(F.col("cos") >= COSINE_DUP_T)
             .select("id_a", "id_b", "cos"))


def q_dedup_components(spark, sf_dir):
    """Duplicate clusters: connected components of the Jaccard>=0.5 pair
    graph via min-label propagation to a fixpoint.

    The step after pair generation in a real dedup pipeline — pairs say
    "a~b", clusters say "keep one of {a,b,c,...}".  Each iteration is
    one join + one aggregation (labels' partitioning on node is reused);
    the loop runs until no label changes (a driver-side count per
    iteration — a scalar action, not a collect).  Near-dup components
    are near-cliques, so the fixpoint lands in 2-4 iterations; at
    100 TB-scale graph diameters, switch to the large-star/small-star
    algorithm (Kiveris et al., SoCC'14) — same per-iteration shape.

    Output: (cluster_id = min doc_id of the component, n_members),
    duplicate-free clusters only (size >= 2).  Oracle: recursive-CTE
    transitive closure + min label in DuckDB.
    """
    pairs = q_dedup_jaccard_pairs(spark, sf_dir).select("doc_a", "doc_b")
    return _min_label_components(pairs)


def _min_label_components(pairs: DataFrame) -> DataFrame:
    """(cluster_id, n_members >= 2) summary of `_min_label_labels`."""
    labels = _min_label_labels(pairs)
    return (labels.groupBy(F.col("lbl").alias("cluster_id"))
            .agg(F.count(F.lit(1)).alias("n_members"))
            .filter(F.col("n_members") >= 2))


def _min_label_labels(pairs: DataFrame) -> DataFrame:
    """Min-label propagation to fixpoint over an undirected pair set.

    Returns the full (node, lbl) labelling — every node that appears in
    any pair, labelled with its component's minimum node id."""
    # Cache the pair source BEFORE mirroring: the union references the
    # (potentially expensive — LSH) pair subplan twice, and exchange
    # reuse across the two branches is not guaranteed (measured at the
    # 10x replica scale: the pipeline ran twice, tripling the query's
    # shuffle volume).  One cache fill, both branches read it.
    pairs = pairs.cache()
    edges = (pairs.union(pairs.select(F.col("doc_b").alias("doc_a"),
                                      F.col("doc_a").alias("doc_b")))
             .distinct().cache())
    # localCheckpoint (not cache) per iteration: caching truncates
    # COMPUTATION but the logical plan still grows linearly, and
    # re-analysis of the accumulated lineage dominated the loop
    # (35s -> 4s at sf0.001).  Checkpointing restarts the plan from the
    # materialized partitions every round.
    labels = (edges.select(F.col("doc_a").alias("node")).distinct()
              .withColumn("lbl", F.col("node"))
              .localCheckpoint(eager=False))
    # Convergence check: sum(lbl) strictly decreases every iteration
    # that changes any label (labels only move down), so one scalar
    # aggregate per iteration detects the fixpoint — no join-and-count.
    prev_sum = labels.agg(F.sum("lbl")).collect()[0][0]
    converged = False
    for _ in range(20):
        nbr_min = (edges.join(labels, edges.doc_b == labels.node)
                   .groupBy(F.col("doc_a").alias("node"))
                   .agg(F.min("lbl").alias("nbr_lbl")))
        # LAZY checkpoint: the round's sum-collect below materializes
        # it inside its own job — eager ran a separate job per round.
        labels = (labels.join(nbr_min, "node", "left")
                  .select("node", F.least(
                      "lbl", F.coalesce("nbr_lbl", "lbl")).alias("lbl"))
                  .localCheckpoint(eager=False))
        cur_sum = labels.agg(F.sum("lbl")).collect()[0][0]
        if cur_sum == prev_sum:
            converged = True
            break
        prev_sum = cur_sum
    if not converged:
        # Mirror _star_components: an unreached fixpoint means the
        # labels are WRONG (mid-propagation), never return them.
        # O(diameter) rounds ran out -> this graph needs the
        # O(log^2 n) star-contraction path.
        raise RuntimeError(
            "min-label propagation did not reach its fixpoint in 20 "
            "rounds (graph diameter > 20); use _star_components "
            "(dedup_components_bigstar) for high-diameter graphs.")
    return labels


def _canonical(e: DataFrame) -> DataFrame:
    """Undirected edge set in canonical (small, large) order, distinct."""
    return (e.select(F.least("a", "b").alias("a"),
                     F.greatest("a", "b").alias("b"))
            .filter(F.col("a") != F.col("b"))
            .distinct())


def _star_components(pairs: DataFrame) -> DataFrame:
    """Connected components via alternating large-star / small-star
    rounds (Kiveris et al., "Connected Components in MapReduce and
    Beyond", SoCC'14) — the high-diameter-safe algorithm.

    Min-label propagation (``_min_label_components``) needs O(diameter)
    rounds: fine for near-clique dedup components, ruinous for chain-
    shaped graphs at 100 TB.  Star contraction converges in O(log^2 n)
    rounds on ANY topology; each round is two groupBy-min + join passes
    over the edge set, which also SHRINKS monotonically toward the final
    star graphs (min-label keeps all |V| label rows live every round).

    large-star: every node u links its LARGER neighbors to
    m = min(N(u) ∪ {u}); small-star: u links its smaller-or-equal
    neighborhood (and itself) to its minimum.  Fixpoint = disjoint
    stars centered at component minima, so the final edge set IS the
    (member -> cluster_id) mapping.  Convergence detected by an
    order-free edge-set checksum (count + sum of pair hashes) — two
    scalar aggregates per round, no driver collect.

    Output schema and values are identical to ``q_dedup_components``
    (cluster_id = component min doc_id, members >= 2) — same full
    DuckDB oracle, plus a pinned-equality test.
    """
    edges = _canonical(pairs.select(F.col("doc_a").alias("a"),
                                    F.col("doc_b").alias("b"))
                       ).localCheckpoint(eager=False)

    def checksum(e: DataFrame):
        # hash sum in decimal(38,0): a long sum of 64-bit hashes
        # overflows (ANSI mode raises)
        row = e.agg(F.count(F.lit(1)).alias("n"),
                    F.sum(F.xxhash64("a", "b").cast("decimal(38,0)"))
                     .alias("h")).collect()[0]
        return row["n"], row["h"]

    prev = checksum(edges)
    converged = False
    for _ in range(20):
        nbrs = edges.union(edges.select(F.col("b").alias("a"),
                                        F.col("a").alias("b")))
        # large-star: (v, min(N(u) ∪ {u})) for v in N(u), v > u
        mins = (nbrs.groupBy("a")
                .agg(F.min("b").alias("mn"))
                .select("a", F.least("mn", "a").alias("m")))
        large = (nbrs.filter(F.col("b") > F.col("a"))
                 .join(mins, "a")
                 .select(F.col("b").alias("a"), F.col("m").alias("b")))
        edges = _canonical(large).localCheckpoint(eager=False)
        # small-star: (v, min(N⁻(u) ∪ {u})) for v in N⁻(u) ∪ {u}
        nbrs = edges.union(edges.select(F.col("b").alias("a"),
                                        F.col("a").alias("b")))
        down = nbrs.filter(F.col("b") < F.col("a"))
        mins = down.groupBy("a").agg(F.min("b").alias("m"))
        small = (down.join(mins, "a")
                 .select(F.col("b").alias("a"), F.col("m").alias("b"))
                 .union(mins.select(F.col("a"), F.col("m").alias("b"))))
        # lazy like the large-star cut: each round's checksum collect
        # materializes both cuts in one job instead of three
        edges = _canonical(small).localCheckpoint(eager=False)
        cur = checksum(edges)
        if cur == prev:
            converged = True
            break
        prev = cur
    if not converged:
        # O(log^2 n) convergence makes 20 rounds astronomically generous;
        # a silent non-fixpoint would emit WRONG clusters, so refuse.
        raise RuntimeError(
            "star contraction did not reach a fixpoint in 20 rounds")
    # Fixpoint stars: (member, cluster_id=component min) per non-root node.
    return (edges.groupBy(F.col("a").alias("cluster_id"))
            .agg((F.count(F.lit(1)) + 1).alias("n_members"))
            .filter(F.col("n_members") >= 2))


def q_dedup_components_bigstar(spark, sf_dir):
    """q_dedup_components' output via the star-contraction algorithm —
    the topology-robust 100 TB path, oracle-checked to the same values
    as the min-label formulation."""
    pairs = q_dedup_jaccard_pairs(spark, sf_dir).select("doc_a", "doc_b")
    return _star_components(pairs)


def q_dedup_components_lsh(spark, sf_dir):
    """The 100 TB clustering path: min-label components over the
    MinHash-LSH verified pair set instead of the exact-Jaccard pair set.

    Pair generation is the LSH pipeline's near-linear cost (vs the exact
    inverted-index self-join, which is quadratic in colliding docs —
    53s vs ~3s at sf0.1).  Because the LSH pipeline VERIFIES candidates
    with true Jaccard, its pairs are a subset of the exact pairs, so
    every cluster here is a sub-cluster of an exact component —
    tests/test_extensions.py pins that refinement invariant.  Approximate
    (hash-kernel pair source): driver records the rows-only check.
    """
    pairs = q_dedup_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b")
    return _min_label_components(pairs)


def q_dedup_incremental_lsh(spark, sf_dir):
    """Ingest-time NEAR-dup screening — the fuzzy sibling of
    q_dedup_incremental: today's batch (doc_id % 10 == 0) is probed
    against the BASE corpus's LSH band-bucket index, candidates
    verified with true shingle Jaccard, and every (new doc, base doc)
    near-duplicate pair is emitted — the continuously-growing-corpus
    step where re-banding 100 TB per day is not an option (the base
    bucket index is maintained incrementally like
    inverted_index_delta_refresh; here both sides are derived from the
    same table so the oracle can rebuild them).

    Scale shape: batch signatures are row-local (_band_buckets_of);
    the probe is an equi-join on (band, bucket) between the
    BATCH-sized bucket relation and the base index — signature bytes,
    never text; the verify join ships shingle arrays for candidate
    docs only (shuffle_hash-hinted at every cand-verify site — the
    shingle relation must never broadcast).  Candidates batch-vs-base
    agree bit-for-bit with the full-corpus banding (same bucket keys),
    so the oracle is the shared mh CTE restricted to mixed pairs.
    """
    d = _docs(spark, sf_dir)
    base = d.filter(F.col("doc_id") % 10 != 0)
    batch = d.filter(F.col("doc_id") % 10 == 0)
    bb_base = _band_buckets_of(base)
    bb_new = _band_buckets_of(batch)
    cand = (bb_new.select(F.col("doc_id").alias("doc_new"),
                          "band", "bucket")
            .join(bb_base.select(F.col("doc_id").alias("doc_base"),
                                 "band", "bucket"),
                  ["band", "bucket"])
            .select("doc_new", "doc_base").distinct())
    sh = _shingles(spark, sf_dir)
    va = sh.select(F.col("doc_id").alias("doc_new"),
                   F.col("shingles").alias("sh_a"))
    vb = sh.select(F.col("doc_id").alias("doc_base"),
                   F.col("shingles").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    return (cand.hint("shuffle_hash").join(va, "doc_new")
            .hint("shuffle_hash").join(vb, "doc_base")
            .withColumn("jaccard", F.round(
                inter / (F.size("sh_a") + F.size("sh_b") - inter), 6))
            .filter(F.col("jaccard") >= JACCARD_T)
            .select("doc_new", "doc_base", "jaccard"))


def q_dedup_cluster_weights(spark, sf_dir):
    """Cluster-aware sampling weights: fold every near-dup cluster into
    ONE survivor document carrying the cluster's mass as an integer
    weight — the "keep one, upweight" curation policy (dedup that
    preserves the corpus' empirical distribution for mixture/sampling
    math downstream, instead of silently down-weighting whatever was
    crawled most).  Survivor policy = the dedup_keep_best quality rule
    (longest member, ties -> lowest doc_id); docs in no cluster pass
    through with weight 1, so SUM(weight) == |corpus| exactly (the
    mass-conservation pin in tests/test_r08b_ops.py).

    Composition is the production pipeline's: banded MinHash-LSH pair
    generation (near-linear, never all-pairs) -> min-label components
    -> one partial+final agg per cluster.  Scale shape: labels and
    digests are the only wide shuffles; the survivor rides in a
    min(struct(-n_chars, doc_id)) aggregate cell (no corpus window);
    the weight-1 passthrough is a LEFT ANTI join on doc_id, which AQE
    plans as broadcast when the clustered-node set is small (near-dup
    graphs are sparse: nodes <= 2 * verified pairs) and as a plain
    shuffle join otherwise.

    Reference bar: the survivor fold is the Accumulate/Combine monoid
    contract (pool.go:102-121, crawler.go:75-91) keyed by cluster
    label.  Oracle: recursive-CTE components over the portable
    (md5 + Carter-Wegman) pair set + a ROW_NUMBER survivor — a
    different construction, same values.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    pairs = q_dedup_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b")
    labels = _min_label_labels(pairs)
    member = labels.join(docs, labels.node == docs.doc_id) \
                   .select("lbl", "doc_id", "n_chars")
    best = F.min(F.struct((-F.col("n_chars")).alias("negn"),
                          F.col("doc_id").alias("did")))
    surv = (member.groupBy("lbl")
            .agg(F.count(F.lit(1)).alias("weight"), best.alias("b"))
            .select(F.col("b.did").alias("doc_id"), "weight"))
    singles = (docs.join(labels, docs.doc_id == labels.node, "left_anti")
               .select("doc_id", F.lit(1).cast("long").alias("weight")))
    return surv.unionAll(singles)


def q_dedup_family_overlap(spark, sf_dir):
    """Cross-FAMILY dedup agreement report: pair-set sizes and
    pairwise overlaps between the exact-Jaccard ground truth, the
    MinHash-LSH family, and the SimHash family — the calibration
    readout a curation run logs to decide which fuzzy passes add
    recall and how much the families agree (the jaccard∩minhash row
    IS measured LSH recall; low minhash∩simhash overlap means the two
    catch DIFFERENT duplication modes — paraphrase-heavy vs
    boilerplate-heavy — and both passes earn their cost).

    The exact-Jaccard family is the diagnostic ground truth (its
    inverted-index self-join is quadratic in colliding docs — at
    100 TB you run it on a sample to calibrate, never the corpus; the
    banded families are the production path).  The sample contract is
    ENFORCED, not advisory: the embedded q_dedup_jaccard_pairs call
    refuses corpora past JACCARD_EXACT_MAX_DOCS, so this report cannot
    be pointed at a full-scale corpus by accident.  Overlaps are
    id-pair equi-joins; output is a 3-row summary.  The oracle composes
    the families' oracle constructions verbatim; minhash ⊆ jaccard (its
    verify IS true Jaccard at the same threshold) is pinned in tests.
    """
    jp = q_dedup_jaccard_pairs(spark, sf_dir).select("doc_a", "doc_b")
    mh = q_dedup_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b")
    sh = q_dedup_simhash(spark, sf_dir).select("doc_a", "doc_b")
    fams = {"jaccard": jp.cache(), "minhash": mh.cache(),
            "simhash": sh.cache()}

    def row(na, nb):
        fa, fb = fams[na], fams[nb]
        common = fa.join(fb, ["doc_a", "doc_b"])
        return (fa.agg(F.count(F.lit(1)).alias("n_a"))
                .crossJoin(fb.agg(F.count(F.lit(1)).alias("n_b")))
                .crossJoin(common.agg(
                    F.count(F.lit(1)).alias("n_common")))
                .select(F.lit(na).alias("family_a"),
                        F.lit(nb).alias("family_b"),
                        "n_a", "n_b", "n_common",
                        F.expr("CAST((CAST(n_common AS DECIMAL(38,0)) * 1000000)"
                               " DIV (n_a + n_b - n_common) AS BIGINT)")
                         .alias("pairset_jaccard_ppm")))

    return (row("jaccard", "minhash")
            .unionAll(row("jaccard", "simhash"))
            .unionAll(row("minhash", "simhash")))


def q_dedup_fuzzy_lev(spark, sf_dir):
    """Edit-distance near-dup pairs with prefix blocking: docs sharing a
    16-char normalized prefix, Levenshtein <= 10 on the 80-char prefix.

    The blocking-key pattern from record linkage: candidate pairs only
    form WITHIN a block, so the quadratic Levenshtein (O(80x80) per
    pair, interpreted JVM) touches |block|^2 pairs instead of |corpus|^2.
    One shuffle on the block key; blocks are prefix-groups, bounded in
    practice (and boundable by length cut).  At 100 TB use several
    independent blocking keys (prefix, suffix, sorted-token digest) and
    union candidates — same shape, better recall; Levenshtein itself
    stays pair-local either way.
    """
    d = _docs(spark, sf_dir)
    norm = F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")
    nd = d.select("doc_id", norm.alias("t"),
                  F.substring(norm, 1, 16).alias("pre"))
    a, b = nd.alias("a"), nd.alias("b")
    return (a.join(b, (F.col("a.pre") == F.col("b.pre"))
                    & (F.col("a.doc_id") < F.col("b.doc_id")))
             .select(F.col("a.doc_id").alias("doc_a"),
                     F.col("b.doc_id").alias("doc_b"),
                     F.levenshtein(F.substring(F.col("a.t"), 1, 80),
                                   F.substring(F.col("b.t"), 1, 80)).alias("lev"))
             .filter(F.col("lev") <= 10))


def q_corpus_clean(spark, sf_dir):
    """The composed LLM-corpus cleaning pipeline: exact dedup (keep min
    doc_id per text) -> quality gate (20..500 words, uniqueness > 0.2)
    -> language gate (stopword-identifiable).  One scan, two shuffles
    (dedup groupBy + survivor semi-join); the quality/language gates are
    row-local projections fused into the scan.  This is the production
    composition the individual dedup/text operators exist for.
    """
    from .text import STOPWORDS
    d = _docs(spark, sf_dir)
    survivors = (d.groupBy("text").agg(F.min("doc_id").alias("doc_id"))
                  .select("doc_id"))
    kept = d.join(survivors, "doc_id", "left_semi")
    words = F.split(F.col("text"), " ")
    n = F.size(words)
    uniq = F.size(F.array_distinct(words))
    any_stop = F.size(F.array_intersect(
        F.array_distinct(words),
        F.array(*[F.lit(w) for ws in STOPWORDS.values() for w in ws]))) > 0
    return (kept.filter(n.between(20, 500) & (uniq / n > 0.2) & any_stop)
                .select("doc_id", "lang", n.alias("n_words"),
                        F.round(uniq / n, 6).alias("uniq_ratio")))


SEMANTIC_K = 8        # cluster count for the semantic-dedup partition


def q_dedup_semantic(spark, sf_dir, k: int = SEMANTIC_K):
    """SemDeDup-style semantic dedup (Abbas et al. 2023, arXiv:2303.09540):
    partition the embedding space into k clusters, then search for
    near-duplicates (cosine >= COSINE_DUP_T) ONLY within each cluster.

    This is the third rung of the embedding-dedup ladder: exact all-pairs
    (q_dedup_embedding, gated quadratic ground truth) -> LSH buckets
    (similarity.q_ann_lsh, hash partition) -> SEMANTIC clusters (this op,
    geometry partition).  The cluster bound is what removes the global
    quadratic term: pair work is sum over clusters of |c|^2, and k is
    chosen so |corpus|/k rows fit one executor's pair loop.  At 100 TB:
    centroids come from q_kmeans_embeddings (the assignment join below is
    byte-identical), clusters are quota-capped, and the within-cluster
    pair scan runs bucket-locally after ONE shuffle on cid.

    Here centroids are the k lowest vec_ids (kmeans_embeddings' seeding,
    ml.py:53) so the whole operator stays deterministic and the oracle
    stays non-iterative.  Distances/cosines use the repo's verified
    bit-identical fold pairs (ml._d2 / functions.vectors.dot).

    Output: one row per DROPPED vector — it has a same-cluster neighbor
    with a lower vec_id and cosine >= threshold — with the strongest
    similarity that condemned it.
    """
    from .ml import _d2
    e = (load_table(spark, sf_dir, "embeddings")
         .select("vec_id", "embedding")
         .withColumn("nrm", l2_norm("embedding")))
    cent = (e.orderBy("vec_id").limit(k)
            .select(F.col("vec_id").alias("cid"),
                    F.transform("embedding",
                                lambda x: x.cast("double")).alias("cvec")))
    from pyspark.sql import Window as W
    rk = F.row_number().over(W.partitionBy("vec_id").orderBy("d2", "cid"))
    assigned = (e.crossJoin(F.broadcast(cent))
                .select("vec_id", "cid", "embedding", "nrm",
                        _d2(F.col("embedding"), F.col("cvec")).alias("d2"))
                .withColumn("rk", rk).filter(F.col("rk") == 1)
                # cached: both sides of the within-cluster self-join read
                # it; without the barrier the crossJoin+window runs twice
                .select("vec_id", "cid", "embedding", "nrm").cache())
    a, b = assigned.alias("a"), assigned.alias("b")
    cos = F.round(dot(F.col("a.embedding"), F.col("b.embedding"))
                  / (F.col("a.nrm") * F.col("b.nrm")), 6)
    return (a.join(b, (F.col("a.cid") == F.col("b.cid"))
                   & (F.col("a.vec_id") < F.col("b.vec_id")))
            .select(F.col("b.vec_id").alias("vec_id"),
                    F.col("b.cid").alias("cid"), cos.alias("cos"))
            .filter(F.col("cos") >= COSINE_DUP_T)
            .groupBy("vec_id", "cid")
            .agg(F.max("cos").alias("max_cos")))


def _semantic_oracle(k: int = SEMANTIC_K) -> str:
    # Same d2 fold as the kmeans oracle (ml.py:97), same cosine fold as
    # the dedup_embedding_cosine oracle — both verified bit-identical to
    # the Spark expressions they mirror.
    d2 = ("list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
          "list_transform(list_zip(e.embedding, c.cvec), "
          "p -> (CAST(p[1] AS DOUBLE) - p[2]) * (CAST(p[1] AS DOUBLE) - p[2]))), "
          "(acc, x) -> acc + x)")
    nrm = ("sqrt(list_reduce(list_transform({t}.embedding, "
           "v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)), (acc, x) -> acc + x))")
    return f"""
        WITH cent AS (
            SELECT vec_id AS cid,
                   list_transform(embedding, v -> CAST(v AS DOUBLE)) AS cvec
            FROM embeddings ORDER BY vec_id LIMIT {k}),
        assign AS (
            SELECT vec_id, cid FROM (
                SELECT e.vec_id, c.cid,
                       ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                          ORDER BY {d2}, c.cid) AS rk
                FROM embeddings e CROSS JOIN cent c)
            WHERE rk = 1),
        av AS (
            SELECT a.vec_id, a.cid, e.embedding, {nrm.format(t='e')} AS nrm
            FROM assign a JOIN embeddings e USING (vec_id)),
        scored AS (
            SELECT b.vec_id, b.cid,
                   ROUND(list_reduce(list_transform(
                             list_zip(a.embedding, b.embedding),
                             p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)),
                             (acc, x) -> acc + x)
                         / (a.nrm * b.nrm), 6) AS cos
            FROM av a JOIN av b
              ON a.cid = b.cid AND a.vec_id < b.vec_id)
        SELECT vec_id, cid, MAX(cos) AS max_cos
        FROM scored WHERE cos >= {COSINE_DUP_T}
        GROUP BY vec_id, cid"""


SPAN_N = 10          # words per span gram
SPAN_DUP_MAX = 0.2   # keep docs whose duplicated-span fraction is <= this


def q_dedup_spans(spark, sf_dir):
    """Span-level exact dedup at word-10-gram granularity — the n-gram
    approximation of suffix-array substring dedup (Lee et al., "Dedupli-
    cating Training Data Makes Language Models Better", ACL'22).  Doc-
    level dedup (exact/minhash above) misses the common web-corpus case
    of long repeated passages inside otherwise-distinct pages; this
    flags every 10-gram occurrence that is not the globally FIRST
    occurrence of that 10-gram (first = lowest doc_id; all later docs,
    and repeats inside the first doc, count as duplicated spans).

    Plan shape (the 100 TB story): gram generation is row-local
    (transform over a sequence, zero Python, zero shuffle); grams leave
    the row as md5 digests, never text, so shuffle volume is ~32 B x
    n_tokens independent of document size.  Then TWO partial-aggregated
    shuffles — (gram, doc) counts, then per-gram min(doc) — and one
    gram-keyed join back.  Hot grams (boilerplate that appears in
    millions of docs) collapse map-side in both aggregations, so the
    skew a popular passage creates is bounded by the partition count,
    not its occurrence count.  At production scale swap md5 for
    xxhash64 (8 B digests, same plan); md5 is used here because the
    DuckDB oracle can reproduce it.
    """
    d = _docs(spark, sf_dir)
    w = F.split(F.col("text"), " ")
    # sequence(0, size-N) would DESCEND for short docs (size < N) —
    # gate to an empty gram array instead.
    grams = F.when(
        F.size(w) >= SPAN_N,
        F.transform(
            F.sequence(F.lit(0), F.size(w) - SPAN_N),
            lambda i: F.md5(F.encode(
                F.array_join(F.slice(w, i + 1, SPAN_N), " "), "UTF-8"))),
    ).otherwise(F.array().cast("array<string>"))
    # explode_OUTER + null-filter (r12): plain explode's inferred
    # non-empty filter re-evaluates the whole md5 gram transform in a
    # Filter below the Generate — a full second hash pass over every
    # document.  gm is never null (md5), so the post-generate filter
    # reproduces inner-explode rows exactly.
    g1 = (d.select("doc_id", F.explode_outer(grams).alias("gm"))
            .filter(F.col("gm").isNotNull())
            .groupBy("gm", "doc_id")
            .agg(F.count(F.lit(1)).alias("n_in_doc")))
    firsts = g1.groupBy("gm").agg(F.min("doc_id").alias("first_doc"))
    per_doc = (g1.join(firsts, "gm")
                 .groupBy("doc_id")
                 .agg(F.sum("n_in_doc").alias("n_grams"),
                      F.sum(F.col("n_in_doc")
                            - F.when(F.col("doc_id") == F.col("first_doc"),
                                     F.lit(1)).otherwise(F.lit(0)))
                       .alias("n_dup_grams")))
    ratio = F.round(
        F.coalesce(F.col("n_dup_grams"), F.lit(0))
        / F.greatest(F.coalesce(F.col("n_grams"), F.lit(0)), F.lit(1)), 6)
    return (d.select("doc_id",
                     F.size(F.split(F.col("text"), " "))
                      .cast("long").alias("n_tokens"))
             .join(per_doc, "doc_id", "left")
             .select("doc_id", "n_tokens",
                     F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
                     F.coalesce("n_dup_grams", F.lit(0)).alias("n_dup_grams"),
                     ratio.alias("dup_span_ratio"))
             .withColumn("keep", F.col("dup_span_ratio") <= SPAN_DUP_MAX))


SUBSTR_K = 8   # duplicated-substring threshold (tokens; power of two)


def q_dedup_substring_suffix(spark, sf_dir):
    """EXACT substring dedup at >= {K} tokens with the APPLIED rewrite
    (Lee et al., ACL'22 "ExactSubstr": remove every token position
    covered by a substring of >= k tokens that occurs elsewhere in the
    corpus) — the production operator dedup_spans_ngram approximates.

    Method: distributed suffix RANKING by Karp-Miller-Rosenberg prefix
    doubling with LEADER naming — log2(k) rounds; each round pairs
    every position's name with the name k/2 ahead (a lead() over the
    doc-ordered window — no self-join) and renames each (name,
    next-name) class to its minimal packed position via
    groupBy(class).agg(min(pack)) + an equi-join back (skew-safe: the
    map-side partial agg absorbs Zipf-hot classes before the shuffle
    and AQE's skew-join can split the probe side — unlike a
    class-partitioned window, whose single task per class would
    straggle/OOM on a head token at 100x; no id generator, no
    non-deterministic naming).  After round log2(k) two positions
    carry the same name iff
    their next k tokens are IDENTICAL (exact equality end to end — the
    names are class leaders, not digests, so no hash collisions
    exist).  Names need only be injective, not rank-ordered: the dedup
    semantics consume the EQUIVALENCE CLASSES of k-token windows,
    never their lexicographic order, so the order-dense ranking a full
    suffix-array sort needs (and its global sort) is provably
    unnecessary — the plan contains no single-partition sort at any
    round.  A window start whose class has >= 2 members is a
    duplicated substring; the union of their [s, s+k) spans (a per-doc
    running window-max, bounded frame) is exactly the set of positions
    covered by SOME duplicated substring of length >= k, because any
    duplicated m >= k substring covers its positions with duplicated
    k-windows and every duplicated k-window IS a duplicated substring.

    Determinism + scale: leader naming is a pure function of the data
    (min packed position per class), so every round snapshot is
    recompute-safe on a fault-prone cluster.  Each round is three
    bounded shuffles of the N-position relation (doc-hash for the lead
    window, class-hash for the partial-agg'd min, class-hash for the
    join back) plus one lazy localCheckpoint of the compact
    (doc_id, pos, r) relation — the lineage cut that keeps the
    branched groupBy+join rounds from recomputing 2^rounds times (the
    standard external-memory suffix-array trade; see
    _substring_report).  k = {K} means 3 rounds; the rewrite adds one
    doc-keyed window and one doc-keyed agg.  The report is
    localCheckpoint'ed so the driver's count+collect pair computes the
    rounds once; production writes the rewritten corpus to a sink
    instead.  Packed position =
    doc_id * 2^22 + pos (docs up to 2^41, 4M tokens/doc — beyond
    that, switch the name column to a (doc_id, pos) struct, same
    plan).

    Output: (doc_id, n_tokens, n_removed, clean_md5) — the rewrite
    digest is what ships; the per-doc removal count is the curation
    report.
    """
    return _substring_report(spark, sf_dir).localCheckpoint(eager=True)


def _substring_report(spark, sf_dir, checkpoint_rounds: bool = True):
    """The plan behind q_dedup_substring_suffix (exposed so the plan
    pins can inspect it; ``checkpoint_rounds=False`` keeps the whole
    pipeline lazy so a test can read every naming round in ONE plan).

    Skew note (r07 verdict item 3): class-min naming is
    ``groupBy(key).agg(min(pack))`` + equi-join back, NEVER
    ``min().over(Window.partitionBy(key))`` — a window partition is one
    task and AQE cannot split it, so on a real Zipf vocabulary the top
    token (~5% of all positions) would serialize into a single
    straggler/OOM task at 100x.  The groupBy's map-side partial
    aggregation absorbs the hot key before the shuffle, and the join
    back is a plain equi-join AQE's skew-join can split.  The join
    branches the lineage (names + probe both read the round's pair
    relation), so each round localCheckpoints the compact
    (doc_id, pos, r) relation — without the cut, recompute doubles per
    round (2^rounds leaf scans).  LAZY checkpoints (eager=False)
    materialize inside the query's own first job, so the rounds
    pipeline instead of running as serialized eager jobs — measured
    9.3s vs 19.7s cold at the 50k-doc Zipf probe (tools/
    scale_probe_r08.py fixture) for identical results.  Per-round
    materialization of the position relation is the standard
    external-memory suffix-array trade; each round is still
    shuffle-linear in N."""
    from pyspark.sql import Window as W

    def _cut(df):
        return df.localCheckpoint(eager=False) if checkpoint_rounds \
            else df

    d = _docs(spark, sf_dir)
    toks = d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "w"))
    pack = (F.col("doc_id").cast("long") * F.lit(1 << 22).cast("long")
            + F.col("pos"))
    lead0 = toks.groupBy("w").agg(F.min(pack).alias("r"))
    cur = _cut(toks.join(lead0, "w").select("doc_id", "pos", "r"))
    wdoc = W.partitionBy("doc_id").orderBy("pos")
    step = 1
    while step < SUBSTR_K:
        paired = cur.withColumn(
            "r2", F.coalesce(F.lead("r", step).over(wdoc), F.lit(-1)))
        names = paired.groupBy("r", "r2").agg(F.min(pack).alias("rn"))
        cur = _cut(paired.join(names, ["r", "r2"])
                   .select("doc_id", "pos", F.col("rn").alias("r")))
        step *= 2
    base = d.select("doc_id",
                    F.size(F.split("text", " ")).cast("long")
                     .alias("n_tokens"))
    starts = (cur.join(base, "doc_id")
                 .filter(F.col("pos") + SUBSTR_K <= F.col("n_tokens")))
    dup = (starts.groupBy("r").agg(F.count(F.lit(1)).alias("n"))
                 .filter(F.col("n") >= 2))
    flags = (starts.join(dup, "r", "left_semi")
                   .select("doc_id", "pos", F.lit(1).alias("f")))
    covw = (W.partitionBy("doc_id").orderBy("pos")
             .rowsBetween(-(SUBSTR_K - 1), 0))
    cov = (toks.join(flags, ["doc_id", "pos"], "left")
               .withColumn("covered",
                           F.max(F.coalesce("f", F.lit(0))).over(covw)))
    kept = (cov.filter(F.col("covered") == 0)
               .groupBy("doc_id")
               .agg(F.count(F.lit(1)).alias("n_kept"),
                    F.md5(F.encode(F.concat_ws(" ", F.transform(
                        F.array_sort(F.collect_list(F.struct("pos", "w"))),
                        lambda s: s["w"])), "UTF-8")).alias("kept_md5")))
    empty_md5 = F.md5(F.encode(F.lit(""), "UTF-8"))
    return (base.join(kept, "doc_id", "left")
                .select("doc_id", "n_tokens",
                        (F.col("n_tokens")
                         - F.coalesce("n_kept", F.lit(0)))
                        .alias("n_removed"),
                        F.coalesce("kept_md5", empty_md5)
                         .alias("clean_md5")))


q_dedup_substring_suffix.__doc__ = \
    q_dedup_substring_suffix.__doc__.replace("{K}", str(SUBSTR_K))


SUBSTR_LEVELS = (8, 16, 32, 64)   # duplicated-window lengths profiled


def q_dedup_substring_len_profile(spark, sf_dir):
    """Duplicated-substring LENGTH PROFILE — how much of the corpus is
    covered by duplicated runs of 8 / 16 / 32 / 64 tokens (the
    decision input for choosing ExactSubstr's k: too small over-cuts
    boilerplate-adjacent text, too large misses near-verbatim reuse).
    One KMR prefix-doubling chain (the de-skewed groupBy+join naming
    of _substring_report) extended to 6 rounds names 64-token window
    classes; the 8/16/32-token profiles read the SAME chain at its
    intermediate rounds — 4 profiles for one doubling's work, which
    is the whole point of the doubling construction.

    Scale: identical per-round shape to dedup_substring_suffix_array
    (three bounded shuffles of the position relation + a lazy
    lineage cut per round); each profile level adds only
    digest-relation aggs on the checkpointed round output.  Exactness
    inherits from leader naming (classes, not hashes).

    Output: (k, n_dup_positions, n_docs_with_dup, n_dup_classes) —
    one row per profiled length.
    """
    from pyspark.sql import Window as W

    d = _docs(spark, sf_dir)
    toks = d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "w"))
    pack = (F.col("doc_id").cast("long") * F.lit(1 << 22).cast("long")
            + F.col("pos"))
    base = d.select("doc_id",
                    F.size(F.split("text", " ")).cast("long")
                     .alias("n_tokens"))
    lead0 = toks.groupBy("w").agg(F.min(pack).alias("r"))
    cur = (toks.join(lead0, "w").select("doc_id", "pos", "r")
               .localCheckpoint(eager=False))
    wdoc = W.partitionBy("doc_id").orderBy("pos")
    out = None
    step = 1
    while step * 2 <= max(SUBSTR_LEVELS):
        paired = cur.withColumn(
            "r2", F.coalesce(F.lead("r", step).over(wdoc), F.lit(-1)))
        names = paired.groupBy("r", "r2").agg(F.min(pack).alias("rn"))
        cur = (paired.join(names, ["r", "r2"])
                     .select("doc_id", "pos", F.col("rn").alias("r"))
                     .localCheckpoint(eager=False))
        step *= 2
        L = step
        if L not in SUBSTR_LEVELS:
            continue
        starts = (cur.join(base, "doc_id")
                     .filter(F.col("pos") + L <= F.col("n_tokens")))
        # dup is consumed by BOTH the flagged semi-join and the class
        # count — uncached, each reference re-ran the level's 1M-row
        # starts aggregation (r12; class relation is dup-class-sized,
        # metadata next to the position relation)
        dup = (starts.groupBy("r").agg(F.count(F.lit(1)).alias("n"))
                     .filter(F.col("n") >= 2).cache())
        flagged = starts.join(dup, "r", "left_semi")
        a = flagged.agg(
            F.count(F.lit(1)).alias("n_dup_positions"),
            F.countDistinct("doc_id").alias("n_docs_with_dup"))
        b = dup.agg(F.count(F.lit(1)).alias("n_dup_classes"))
        row = (a.crossJoin(b)
                .select(F.lit(L).alias("k"), "n_dup_positions",
                        "n_docs_with_dup", "n_dup_classes"))
        out = row if out is None else out.unionByName(row)
    return out


def _substring_len_profile_oracle() -> str:
    """Literal K-gram DuckDB twin per profiled length (independent
    construction — md5 gram strings, not prefix doubling)."""
    blocks, finals = [], []
    for L in SUBSTR_LEVELS:
        blocks.append(f"""
        gk{L} AS MATERIALIZED (
            SELECT doc_id, md5(array_to_string(w[i:i+{L - 1}], ' '))
                       AS gm
            FROM d, unnest(generate_series(1, len(w) - {L - 1}))
                     AS t{L}(i)
            WHERE len(w) >= {L}),
        dup{L} AS MATERIALIZED (
            SELECT gm FROM gk{L} GROUP BY gm HAVING COUNT(*) >= 2),
        st{L} AS (
            SELECT COUNT(*)::BIGINT AS n_dup_positions,
                   COUNT(DISTINCT doc_id)::BIGINT AS n_docs_with_dup
            FROM gk{L} WHERE gm IN (SELECT gm FROM dup{L})),
        cl{L} AS (SELECT COUNT(*)::BIGINT AS n_dup_classes
                  FROM dup{L})""")
        finals.append(
            f"SELECT {L} AS k, n_dup_positions, n_docs_with_dup,"
            f" n_dup_classes FROM st{L}, cl{L}")
    return ("WITH d AS (SELECT doc_id, string_split(text, ' ') AS w"
            " FROM documents)," + ",".join(blocks)
            + "\n        " + "\n        UNION ALL ".join(finals))


DECON_EVAL_MOD = 10   # doc_id % 10 == 0 stands in for the eval set


def q_decontaminate_fuzzy(spark, sf_dir):
    """FUZZY train/eval decontamination (the GPT-3-style step the exact
    3-gram and bloom decontaminators miss): flag training documents
    whose minhash-LSH candidacy against ANY eval document verifies at
    true shingle Jaccard >= 0.5 — paraphrased or lightly-edited leaks,
    not just verbatim ones.  doc_id % 10 == 0 stands in for the eval
    benchmark (the incremental-dedup split convention).

    Reuses the dedup family's row-local Carter-Wegman signatures
    (_minhash_bands); the only new shuffle is the CROSS-set band-bucket
    join, whose probe side (eval bands) is tiny by construction — at
    100 TB the eval set is a benchmark suite, so Spark broadcasts it
    and the training corpus never shuffles at all for candidacy; the
    verify join then touches only candidate docs' shingle sets.
    """
    sh, bands = _minhash_bands(spark, sf_dir)
    trn = (bands.filter(F.col("doc_id") % DECON_EVAL_MOD != 0)
                .select(F.col("doc_id").alias("train_doc_id"), "bb"))
    ev = (bands.filter(F.col("doc_id") % DECON_EVAL_MOD == 0)
               .select(F.col("doc_id").alias("eval_doc_id"), "bb"))
    cand = (trn.join(F.broadcast(ev), "bb")
               .select("train_doc_id", "eval_doc_id").distinct())
    va = sh.select(F.col("doc_id").alias("train_doc_id"),
                   F.col("shingles").alias("sh_a"))
    vb = sh.select(F.col("doc_id").alias("eval_doc_id"),
                   F.col("shingles").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    return (cand.hint("shuffle_hash").join(va, "train_doc_id")
            .hint("shuffle_hash").join(vb, "eval_doc_id")
            .withColumn("jaccard", F.round(
                inter / (F.size("sh_a") + F.size("sh_b") - inter), 6))
            .filter(F.col("jaccard") >= JACCARD_T)
            .select("train_doc_id", "eval_doc_id", "jaccard"))


def q_dedup_cluster_sizes(spark, sf_dir):
    """Duplicate-cluster size histogram: how many exact-dup clusters
    exist at each multiplicity — THE before/after health metric of a
    dedup run (total rows = sum(size*n), survivors = sum(n), and a fat
    tail here means a boilerplate page is flooding the corpus).

    Two nested tiny aggregations over digests: text hashes to md5
    row-locally, cluster sizes are one partial+final agg on the digest,
    and the histogram re-aggregates the |clusters|-row relation.  No
    text ever shuffles, output is |distinct sizes| rows.
    """
    d = _docs(spark, sf_dir)
    return (d.groupBy(F.md5(F.encode("text", "UTF-8")).alias("h"))
             .agg(F.count(F.lit(1)).alias("cluster_size"))
             .groupBy("cluster_size")
             .agg(F.count(F.lit(1)).alias("n_clusters"))
             .select("cluster_size", "n_clusters",
                     (F.col("cluster_size") * F.col("n_clusters"))
                     .alias("n_docs")))


def q_dedup_lsh_report(spark, sf_dir):
    """LSH tuning report: candidate-pair volume vs true-Jaccard-verified
    pairs and the resulting precision — the one-row summary that decides
    whether (bands, rows) needs retuning before a 100 TB run (precision
    collapsing means the bucket shuffle is doing quadratic work for
    nothing; candidates exploding means a hot band).

    Same band pipeline as dedup_minhash_lsh (shared _minhash_bands);
    the report is two counts and one fixed-point division over the
    candidate relation, so its cost is the candidacy shuffle alone.
    """
    sh, bands = _minhash_bands(spark, sf_dir)
    cand = _bucket_pairs(bands).cache()
    va = sh.select(F.col("doc_id").alias("doc_a"),
                   F.col("shingles").alias("sh_a"))
    vb = sh.select(F.col("doc_id").alias("doc_b"),
                   F.col("shingles").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    jac = F.round(inter / (F.size("sh_a") + F.size("sh_b") - inter), 6)
    ver = (cand.hint("shuffle_hash").join(va, "doc_a")
            .hint("shuffle_hash").join(vb, "doc_b")
               .filter(jac >= JACCARD_T)
               .agg(F.count(F.lit(1)).alias("n_verified")))
    tot = cand.agg(F.count(F.lit(1)).alias("n_candidates"))
    prec = F.floor(F.col("n_verified").cast("double") * 1e6
                   / F.col("n_candidates").cast("double")).cast("long")
    return (tot.crossJoin(ver)
               .select("n_candidates", "n_verified",
                       prec.alias("precision_ppm")))


# Every (b, r) factorization of the k=32 signature the advisor scores.
LSH_ADV_CONFIGS = tuple((MINHASH_K // r, r) for r in (1, 2, 4, 8, 16, 32))
LSH_ADV_RECALL_FLOOR_E6 = 950_000   # required recall at jaccard 0.9


def _lsh_recall_e6(s: float, b: int, r: int) -> int:
    """floor(1e6 * (1 - (1 - s^r)^b)) — the standard LSH S-curve.
    Computed ONCE in Python and emitted as the SAME literal into both
    the Spark plan and the DuckDB oracle, so engine-libm differences
    cannot exist by construction."""
    import math
    return math.floor((1.0 - (1.0 - s ** r) ** b) * 1e6)


def q_lsh_banding_advisor(spark, sf_dir):
    """LSH (b, r) AUTO-SCALING ADVISOR (r07 verdict item 8) — the
    banding sibling of scale.q_skew_salt_advisor: from the corpus's
    OWN k={k} minhash signatures it measures, for every (b, r)
    factorization of the signature, the candidate mass that banding
    would actually generate on THIS corpus (sum over real band buckets
    of C(m, 2), with multiplicity — the join work an LSH pass pays),
    alongside the analytic S-curve recall at the near-dup threshold
    (s=0.5) and at strong-dup similarity (s=0.9), and flags the
    CHOSEN config: the cheapest candidate mass among configs whose
    s=0.9 recall clears {floor}ppm (ties -> smaller b).  This closes
    the measured-probe loop for the whole LSH family the way the salt
    advisor closes it for join skew: parameters come from measured
    corpus statistics, not folklore defaults.

    Scale: signatures are computed once, row-locally; the only
    shuffle is ONE partial+final agg over the exploded
    (b, r, band, bucket) keys — sum(b)= {nbands} bucket rows per doc,
    a constant fan-out like the production band explode — followed by
    a 6-row config fold.  Hot buckets hurt nobody: the agg counts
    them, it never pairs them.  Recall columns are literals (see
    _lsh_recall_e6), so both engines agree bit-for-bit.

    Output: (b, r, recall50_e6, recall90_e6, n_buckets, n_hot_buckets,
    candidate_pairs, max_bucket, chosen).
    """
    # Invariant guard (review finding): if NO config cleared the
    # recall floor, the engine would emit chosen=NULL rows while the
    # oracle's empty `best` CTE returns ZERO rows — a confusing
    # hash-red far from the real defect.  The recalls are Python
    # literals, so make the divergence unreachable by construction.
    if not any(_lsh_recall_e6(0.9, b, r) >= LSH_ADV_RECALL_FLOOR_E6
               for b, r in LSH_ADV_CONFIGS):
        raise ValueError(
            "lsh_banding_advisor: no (b, r) config clears "
            f"LSH_ADV_RECALL_FLOOR_E6={LSH_ADV_RECALL_FLOOR_E6} — "
            "lower the floor or widen LSH_ADV_CONFIGS")
    # cache-free signature build: the advisor reads sig exactly once,
    # so _minhash_sig's pinned sh/hs caches would be pure waste here
    sig = _sig_agg_of(_docs(spark, sf_dir))
    entries = []
    for b, r in LSH_ADV_CONFIGS:
        for band in range(b):
            cols = ", ".join(f"h{band * r + j}" for j in range(r))
            entries.append(
                f"struct({b} AS b, {r} AS r, {band} AS band,"
                f" md5(concat_ws(',', {cols})) AS bucket)")
    bands = sig.selectExpr(
        "doc_id", "explode(array(" + ", ".join(entries) + ")) AS e")
    occ = (bands.groupBy("e.b", "e.r", "e.band", "e.bucket")
                .agg(F.count(F.lit(1)).alias("m")))
    per_cfg = (occ.groupBy("b", "r")
               .agg(F.sum(F.expr("m * (m - 1) DIV 2"))
                     .alias("candidate_pairs"),
                    F.count(F.lit(1)).alias("n_buckets"),
                    F.sum((F.col("m") >= 2).cast("long"))
                     .alias("n_hot_buckets"),
                    F.max("m").alias("max_bucket")))
    cfgs = spark.createDataFrame(
        [(b, r, _lsh_recall_e6(0.5, b, r), _lsh_recall_e6(0.9, b, r))
         for b, r in LSH_ADV_CONFIGS],
        "b int, r int, recall50_e6 long, recall90_e6 long")
    joined = per_cfg.join(F.broadcast(cfgs), ["b", "r"])
    best = (joined.filter(F.col("recall90_e6") >= LSH_ADV_RECALL_FLOOR_E6)
                  .agg(F.min(F.struct(
                      F.col("candidate_pairs").alias("cp"),
                      F.col("b").alias("b"))).alias("w")))
    chosen = ((F.col("recall90_e6") >= LSH_ADV_RECALL_FLOOR_E6)
              & (F.col("candidate_pairs") == F.col("w.cp"))
              & (F.col("b") == F.col("w.b"))).cast("int")
    return (joined.crossJoin(F.broadcast(best))
                  .select("b", "r", "recall50_e6", "recall90_e6",
                          "n_buckets", "n_hot_buckets",
                          "candidate_pairs", "max_bucket",
                          chosen.alias("chosen")))


q_lsh_banding_advisor.__doc__ = (q_lsh_banding_advisor.__doc__
                                 .replace("{k}", str(MINHASH_K))
                                 .replace("{floor}",
                                          str(LSH_ADV_RECALL_FLOOR_E6))
                                 .replace("{nbands}",
                                          str(sum(b for b, _ in
                                                  LSH_ADV_CONFIGS))))


QUERIES = {
    "dedup_incremental_lsh": q_dedup_incremental_lsh,
    "dedup_cluster_sampling_weights": q_dedup_cluster_weights,
    "lsh_banding_advisor": q_lsh_banding_advisor,
    "dedup_cluster_size_histogram": q_dedup_cluster_sizes,
    "decontaminate_fuzzy_minhash": q_decontaminate_fuzzy,
    "dedup_lsh_precision_report": q_dedup_lsh_report,
    "dedup_spans_ngram": q_dedup_spans,
    "dedup_substring_suffix_array": q_dedup_substring_suffix,
    "dedup_substring_len_profile": q_dedup_substring_len_profile,
    "dedup_sorted_neighborhood": q_dedup_sorted_neighborhood,
    "dedup_exact_groups": q_dedup_exact,
    "corpus_clean_pipeline": q_corpus_clean,
    "dedup_exact_keep_min": q_dedup_exact_keep,
    "dedup_keep_best": q_dedup_keep_best,
    "dedup_incremental": q_dedup_incremental,
    "dedup_jaccard_pairs": q_dedup_jaccard_pairs,
    "dedup_containment_pairs": q_dedup_containment,
    "dedup_fuzzy_levenshtein": q_dedup_fuzzy_lev,
    "dedup_components": q_dedup_components,
    "dedup_components_bigstar": q_dedup_components_bigstar,
    "dedup_components_lsh": q_dedup_components_lsh,
    "dedup_minhash_lsh": q_dedup_minhash_lsh,
    "dedup_simhash": q_dedup_simhash,
    "dedup_embedding_cosine": q_dedup_embedding,
    "dedup_semantic_clusters": q_dedup_semantic,
}

_ALL_STOP = ("['the','a','of','and','to','in','is','it','that','for',"
             "'der','die','das','und','ist','nicht','ein','zu','mit','auf',"
             "'le','la','les','et','est','un','une','pas','pour','dans',"
             "'el','los','las','es','una','no','por','para']")

def _minhash_pair_ctes() -> str:
    """Shared DuckDB CTE chain mirroring q_dedup_minhash_lsh: identical
    md5-derived shingle hashes, the same Carter-Wegman signature family
    (pure BIGINT arithmetic — overflow-free by construction), the same
    (band, bucket) keys, and the same true-Jaccard verify.  Ends with
    relation ``mh(doc_a, doc_b, jaccard)``."""
    r = MINHASH_K // LSH_BANDS
    sig_exprs = ", ".join(
        f"list_min(list_transform(hs, h -> ({a} * h + {b}) % {MH_P}))"
        f" AS h{k}"
        for k, (a, b) in enumerate(MH_AB))
    band_exprs = ", ".join(
        f"'{b}:' || md5(concat_ws(',', "
        + ", ".join(f"h{b * r + j}" for j in range(r)) + "))"
        for b in range(LSH_BANDS))
    return f"""
        d AS (SELECT doc_id, string_split(text, ' ') AS w, text
              FROM documents),
        sh AS (SELECT doc_id,
                      CASE WHEN len(w) >= {SHINGLE_N}
                           THEN list_distinct(list_transform(
                               generate_series(1, len(w) - 2),
                               i -> concat_ws(' ', w[i], w[i+1], w[i+2])))
                           ELSE [text] END AS shingles
               FROM d),
        hs AS (SELECT doc_id,
                      list_transform(shingles,
                          s -> ('0x' || substr(md5(s), 1, 8))::BIGINT) AS hs
               FROM sh),
        sig AS (SELECT doc_id, {sig_exprs} FROM hs),
        bands AS (SELECT doc_id, unnest([{band_exprs}]) AS bb FROM sig),
        cand AS (SELECT DISTINCT a.doc_id AS doc_a, b2.doc_id AS doc_b
                 FROM bands a JOIN bands b2
                   ON a.bb = b2.bb AND a.doc_id < b2.doc_id),
        v AS (SELECT c.doc_a, c.doc_b,
                     len(list_intersect(sa.shingles, sb.shingles)) AS inter,
                     len(sa.shingles) AS na, len(sb.shingles) AS nb
              FROM cand c
              JOIN sh sa ON sa.doc_id = c.doc_a
              JOIN sh sb ON sb.doc_id = c.doc_b),
        mh AS (SELECT doc_a, doc_b,
                      ROUND(inter / (na + nb - inter), 6) AS jaccard
               FROM v
               WHERE ROUND(inter / (na + nb - inter), 6) >= {JACCARD_T})"""


def _lsh_advisor_oracle() -> str:
    """DuckDB mirror of q_lsh_banding_advisor: same shingle/signature
    CTEs as _minhash_pair_ctes, the per-config band keys as a UNION ALL
    over the MATERIALIZED signature (struct-free — the struct_pack-in-
    lambda / unnest-struct paths are the known DuckDB segfault
    surface), and the same literal recall columns."""
    sig_exprs = ", ".join(
        f"list_min(list_transform(hs, h -> ({a} * h + {b}) % {MH_P}))"
        f" AS h{k}"
        for k, (a, b) in enumerate(MH_AB))
    branches = []
    for b, r in LSH_ADV_CONFIGS:
        for band in range(b):
            cols = ", ".join(f"h{band * r + j}" for j in range(r))
            branches.append(
                f"SELECT doc_id, {b} AS b, {r} AS r, {band} AS band,"
                f" md5(concat_ws(',', {cols})) AS bucket FROM sig")
    values = ", ".join(
        f"({b}, {r}, {_lsh_recall_e6(0.5, b, r)},"
        f" {_lsh_recall_e6(0.9, b, r)})"
        for b, r in LSH_ADV_CONFIGS)
    return f"""
        WITH d AS (SELECT doc_id, string_split(text, ' ') AS w, text
                   FROM documents),
        sh AS (SELECT doc_id,
                      CASE WHEN len(w) >= {SHINGLE_N}
                           THEN list_distinct(list_transform(
                               generate_series(1, len(w) - 2),
                               i -> concat_ws(' ', w[i], w[i+1], w[i+2])))
                           ELSE [text] END AS shingles
               FROM d),
        hs AS (SELECT doc_id,
                      list_transform(shingles,
                          s -> ('0x' || substr(md5(s), 1, 8))::BIGINT)
                          AS hs
               FROM sh),
        sig AS MATERIALIZED (SELECT doc_id, {sig_exprs} FROM hs),
        bands AS ({' UNION ALL '.join(branches)}),
        occ AS (SELECT b, r, band, bucket, COUNT(*) AS m
                FROM bands GROUP BY 1, 2, 3, 4),
        per_cfg AS (
            SELECT b, r,
                   SUM(m * (m - 1) // 2)::BIGINT AS candidate_pairs,
                   COUNT(*)::BIGINT AS n_buckets,
                   SUM(CASE WHEN m >= 2 THEN 1 ELSE 0 END)::BIGINT
                       AS n_hot_buckets,
                   MAX(m)::BIGINT AS max_bucket
            FROM occ GROUP BY 1, 2),
        cfgs(b, r, recall50_e6, recall90_e6) AS (VALUES {values}),
        joined AS (SELECT * FROM per_cfg JOIN cfgs USING (b, r)),
        best AS (SELECT candidate_pairs AS cp, b AS bb FROM joined
                 WHERE recall90_e6 >= {LSH_ADV_RECALL_FLOOR_E6}
                 ORDER BY candidate_pairs, b LIMIT 1)
        SELECT j.b::INT AS b, j.r::INT AS r,
               j.recall50_e6::BIGINT AS recall50_e6,
               j.recall90_e6::BIGINT AS recall90_e6,
               j.n_buckets, j.n_hot_buckets, j.candidate_pairs,
               j.max_bucket,
               (CASE WHEN j.recall90_e6 >= {LSH_ADV_RECALL_FLOOR_E6}
                      AND j.candidate_pairs = best.cp
                      AND j.b = best.bb
                     THEN 1 ELSE 0 END)::INT AS chosen
        FROM joined j, best
    """


ORACLE = {
    "lsh_banding_advisor": _lsh_advisor_oracle(),
    "dedup_substring_len_profile": _substring_len_profile_oracle(),
    "dedup_minhash_lsh":
        "WITH " + _minhash_pair_ctes() + " SELECT * FROM mh",
    # Batch-vs-base candidacy == full-corpus candidacy restricted to
    # mixed pairs (bucket keys are per-doc), so the shared mh CTE
    # filtered to exactly-one-side-in-batch is the exact oracle.
    "dedup_incremental_lsh":
        "WITH " + _minhash_pair_ctes() + """
        SELECT CASE WHEN doc_a % 10 = 0 THEN doc_a ELSE doc_b END
                   AS doc_new,
               CASE WHEN doc_a % 10 = 0 THEN doc_b ELSE doc_a END
                   AS doc_base,
               jaccard
        FROM mh WHERE (doc_a % 10 = 0) != (doc_b % 10 = 0)
    """,
    # (dedup_family_overlap's oracle is assigned below the dict — it
    # composes the minhash/simhash entries verbatim.)
    # Independent survivor construction: ROW_NUMBER over (n_chars DESC,
    # doc_id) per component vs the engine's min(struct) fold.
    "dedup_cluster_sampling_weights": f"""
        WITH RECURSIVE {_minhash_pair_ctes()},
        edges AS MATERIALIZED (
            SELECT doc_a, doc_b FROM mh
            UNION SELECT doc_b, doc_a FROM mh),
        cnodes AS (SELECT DISTINCT doc_a AS node FROM edges),
        reach(node, lbl) AS (
            SELECT node, node FROM cnodes
            UNION
            SELECT e.doc_a, r.lbl FROM edges e JOIN reach r
              ON r.node = e.doc_b),
        minlbl AS (SELECT node, MIN(lbl) AS cluster_id
                   FROM reach GROUP BY node),
        mem AS (SELECT m.cluster_id, d.doc_id, d.n_chars
                FROM minlbl m JOIN documents d ON d.doc_id = m.node),
        ranked AS (
            SELECT cluster_id, doc_id,
                   ROW_NUMBER() OVER (PARTITION BY cluster_id
                                      ORDER BY n_chars DESC, doc_id)
                       AS rn,
                   COUNT(*) OVER (PARTITION BY cluster_id) AS weight
            FROM mem)
        SELECT doc_id, weight::BIGINT AS weight FROM ranked WHERE rn = 1
        UNION ALL
        SELECT d.doc_id, 1::BIGINT AS weight
        FROM documents d
        WHERE d.doc_id NOT IN (SELECT node FROM minlbl)
    """,
    "dedup_components_lsh": f"""
        WITH RECURSIVE {_minhash_pair_ctes()},
        edges AS MATERIALIZED (
            SELECT doc_a, doc_b FROM mh
            UNION SELECT doc_b, doc_a FROM mh),
        nodes AS (SELECT DISTINCT doc_a AS node FROM edges),
        reach(node, lbl) AS (
            SELECT node, node FROM nodes
            UNION
            SELECT e.doc_a, r.lbl FROM edges e JOIN reach r
              ON r.node = e.doc_b),
        minlbl AS (SELECT node, MIN(lbl) AS cluster_id
                   FROM reach GROUP BY node)
        SELECT cluster_id, COUNT(*) AS n_members
        FROM minlbl GROUP BY cluster_id HAVING COUNT(*) >= 2
    """,
    # INDEPENDENT construction (not a prefix-doubling twin): a
    # duplicated >= K substring covers exactly the union of duplicated
    # EXACT K-token windows (no hashes), so the oracle counts literal
    # K-gram strings — stronger than mirroring the engine's rounds.
    "dedup_substring_suffix_array": f"""
        WITH ws AS (SELECT doc_id, string_split(text, ' ') AS a
                    FROM documents),
        tok AS (SELECT doc_id, j AS pos, a[j] AS w, len(a) AS n
                FROM ws, unnest(generate_series(1, len(a))) AS u(j)),
        k AS (SELECT doc_id, j AS pos,
                     array_to_string(a[j:j+{SUBSTR_K - 1}], ' ') AS g
              FROM ws,
                   unnest(generate_series(1, len(a) - {SUBSTR_K - 1}))
                       AS u(j)),
        dupg AS (SELECT g FROM k GROUP BY g HAVING COUNT(*) >= 2),
        ds AS (SELECT doc_id, pos, 1 AS f
               FROM k WHERE g IN (SELECT g FROM dupg)),
        cov AS (SELECT t.doc_id, t.pos, t.w, t.n,
                       MAX(COALESCE(d.f, 0)) OVER (
                           PARTITION BY t.doc_id ORDER BY t.pos
                           ROWS BETWEEN {SUBSTR_K - 1} PRECEDING
                                    AND CURRENT ROW) AS covered
                FROM tok t LEFT JOIN ds d USING (doc_id, pos)),
        kept AS (SELECT doc_id, COUNT(*) AS n_kept,
                        md5(string_agg(w, ' ' ORDER BY pos)) AS kept_md5
                 FROM cov WHERE covered = 0 GROUP BY doc_id),
        base AS (SELECT doc_id, MIN(n) AS n_tokens FROM tok GROUP BY 1)
        SELECT b.doc_id, CAST(b.n_tokens AS BIGINT) AS n_tokens,
               CAST(b.n_tokens - COALESCE(k2.n_kept, 0) AS BIGINT)
                   AS n_removed,
               COALESCE(k2.kept_md5, md5('')) AS clean_md5
        FROM base b LEFT JOIN kept k2 USING (doc_id)
    """,
    "dedup_spans_ngram": f"""
        WITH d AS (SELECT doc_id, string_split(text, ' ') AS w
                   FROM documents),
        g AS (SELECT doc_id,
                     md5(array_to_string(w[i:i+{SPAN_N - 1}], ' ')) AS gm
              FROM d, unnest(generate_series(1, len(w) - {SPAN_N - 1}))
                       AS t(i)
              WHERE len(w) >= {SPAN_N}),
        gd AS (SELECT gm, doc_id, COUNT(*) AS n_in_doc
               FROM g GROUP BY 1, 2),
        f AS (SELECT gm, MIN(doc_id) AS first_doc FROM gd GROUP BY 1),
        pd AS (SELECT gd.doc_id,
                      CAST(SUM(n_in_doc) AS BIGINT) AS n_grams,
                      CAST(SUM(n_in_doc
                               - CASE WHEN gd.doc_id = f.first_doc
                                      THEN 1 ELSE 0 END) AS BIGINT)
                          AS n_dup_grams
               FROM gd JOIN f USING (gm) GROUP BY 1)
        SELECT d.doc_id,
               CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens,
               COALESCE(pd.n_grams, 0) AS n_grams,
               COALESCE(pd.n_dup_grams, 0) AS n_dup_grams,
               ROUND(COALESCE(pd.n_dup_grams, 0)
                     / greatest(COALESCE(pd.n_grams, 0), 1), 6)
                   AS dup_span_ratio,
               ROUND(COALESCE(pd.n_dup_grams, 0)
                     / greatest(COALESCE(pd.n_grams, 0), 1), 6)
                   <= {SPAN_DUP_MAX} AS keep
        FROM documents d LEFT JOIN pd ON d.doc_id = pd.doc_id
    """,
    "corpus_clean_pipeline": f"""
        WITH survivors AS (
            SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY text),
        kept AS (
            SELECT d.* FROM documents d
            WHERE d.doc_id IN (SELECT doc_id FROM survivors))
        SELECT doc_id, lang,
               len(string_split(text, ' ')) AS n_words,
               ROUND(len(list_distinct(string_split(text, ' ')))
                     / len(string_split(text, ' ')), 6) AS uniq_ratio
        FROM kept
        WHERE len(string_split(text, ' ')) BETWEEN 20 AND 500
          AND len(list_distinct(string_split(text, ' ')))
              / len(string_split(text, ' ')) > 0.2
          AND len(list_intersect(list_distinct(string_split(text, ' ')),
                                 {_ALL_STOP})) > 0
    """,
    "dedup_exact_groups": """
        SELECT md5(text) AS text_hash, COUNT(*) AS n_copies,
               MIN(doc_id) AS keep_doc_id
        FROM documents GROUP BY md5(text)
    """,
    "dedup_exact_keep_min": """
        SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY text
    """,
    "dedup_incremental": """
        WITH inc AS (SELECT doc_id, md5(text) AS h FROM documents
                     WHERE doc_id % 10 = 0),
             base AS (SELECT DISTINCT md5(text) AS h FROM documents
                      WHERE doc_id % 10 <> 0)
        SELECT MIN(doc_id) AS doc_id, h AS text_hash
        FROM inc
        WHERE NOT EXISTS (SELECT 1 FROM base WHERE base.h = inc.h)
        GROUP BY h
    """,
    # Independent window formulation (ROW_NUMBER survivor) checks the
    # aggregate min(struct) form above.
    "dedup_keep_best": """
        WITH r AS (
            SELECT md5(text) AS text_hash, doc_id, n_chars,
                   ROW_NUMBER() OVER (PARTITION BY md5(text)
                                      ORDER BY n_chars DESC, doc_id) AS rk,
                   COUNT(*) OVER (PARTITION BY md5(text)) AS n_copies
            FROM documents)
        SELECT text_hash, n_copies,
               doc_id AS keep_doc_id,
               n_chars AS keep_n_chars
        FROM r WHERE rk = 1
    """,
    "dedup_containment_pairs": """
        WITH words AS (
            SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS word
            FROM documents),
        sizes AS (SELECT doc_id, COUNT(*) AS n FROM words GROUP BY doc_id),
        common AS (
            SELECT a.doc_id AS inner_doc, b.doc_id AS outer_doc,
                   COUNT(*) AS c
            FROM words a JOIN words b
              ON a.word = b.word AND a.doc_id <> b.doc_id
            GROUP BY 1, 2)
        SELECT inner_doc, outer_doc,
               ROUND(c / si.n, 6) AS containment
        FROM common JOIN sizes si ON si.doc_id = inner_doc
        WHERE ROUND(c / si.n, 6) >= 0.9
    """,
    "dedup_sorted_neighborhood": f"""
        WITH keyed AS MATERIALIZED (
            SELECT doc_id,
                   substring(regexp_replace(lower(substring(text, 1, 64)),
                                            '[^a-z0-9]', '', 'g'),
                             1, {SN_KEY_CHARS}) AS k
            FROM documents),
        ranked AS MATERIALIZED (
            SELECT doc_id, ROW_NUMBER() OVER (ORDER BY k, doc_id) AS rk
            FROM keyed),
        cand AS MATERIALIZED (
            SELECT a.doc_id AS id_lo, b.doc_id AS id_hi,
                   (b.rk - a.rk)::INT AS rank_gap
            FROM ranked a JOIN ranked b
              ON b.rk > a.rk AND b.rk <= a.rk + {SN_WINDOW}),
        words AS MATERIALIZED (
            SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS word
            FROM documents),
        sizes AS MATERIALIZED (
            SELECT doc_id, COUNT(*) AS n FROM words GROUP BY doc_id),
        common AS (
            SELECT c.id_lo, c.id_hi, c.rank_gap, COUNT(*) AS c
            FROM cand c
            JOIN words wa ON wa.doc_id = c.id_lo
            JOIN words wb ON wb.doc_id = c.id_hi AND wb.word = wa.word
            GROUP BY 1, 2, 3)
        SELECT LEAST(id_lo, id_hi) AS doc_a,
               GREATEST(id_lo, id_hi) AS doc_b,
               rank_gap,
               ROUND(c / (sa.n + sb.n - c), 6) AS jaccard
        FROM common
        JOIN sizes sa ON sa.doc_id = id_lo
        JOIN sizes sb ON sb.doc_id = id_hi
        WHERE ROUND(c / (sa.n + sb.n - c), 6) >= {JACCARD_T}
    """,
    "dedup_jaccard_pairs": """
        WITH words AS (
            SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS word
            FROM documents),
        sizes AS (SELECT doc_id, COUNT(*) AS n FROM words GROUP BY doc_id),
        common AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
            FROM words a JOIN words b
              ON a.word = b.word AND a.doc_id < b.doc_id
            GROUP BY 1, 2)
        SELECT doc_a, doc_b,
               ROUND(c / (sa.n + sb.n - c), 6) AS jaccard
        FROM common
        JOIN sizes sa ON sa.doc_id = doc_a
        JOIN sizes sb ON sb.doc_id = doc_b
        WHERE ROUND(c / (sa.n + sb.n - c), 6) >= 0.5
    """,
    "dedup_fuzzy_levenshtein": r"""
        WITH n AS (SELECT doc_id,
                          regexp_replace(lower(text), '\s+', ' ', 'g') AS t
                   FROM documents),
        p AS (SELECT doc_id, t, substr(t, 1, 16) AS pre FROM n)
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               levenshtein(substr(a.t, 1, 80), substr(b.t, 1, 80)) AS lev
        FROM p a JOIN p b ON a.pre = b.pre AND a.doc_id < b.doc_id
        WHERE levenshtein(substr(a.t, 1, 80), substr(b.t, 1, 80)) <= 10
    """,
    # MATERIALIZED: DuckDB inlines single-reference CTEs, so without it
    # the words self-join re-evaluates inside every recursive-CTE
    # iteration (measured 12.3s -> 3.9s at sf0.01).
    "dedup_components": """
        WITH RECURSIVE
        words AS MATERIALIZED (
            SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS word
            FROM documents),
        sizes AS (SELECT doc_id, COUNT(*) AS n FROM words GROUP BY doc_id),
        common AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
            FROM words a JOIN words b
              ON a.word = b.word AND a.doc_id < b.doc_id
            GROUP BY 1, 2),
        jp AS MATERIALIZED (
            SELECT doc_a, doc_b
            FROM common
            JOIN sizes sa ON sa.doc_id = doc_a
            JOIN sizes sb ON sb.doc_id = doc_b
            WHERE ROUND(c / (sa.n + sb.n - c), 6) >= 0.5),
        edges AS MATERIALIZED (SELECT doc_a, doc_b FROM jp
                  UNION SELECT doc_b, doc_a FROM jp),
        nodes AS (SELECT DISTINCT doc_a AS node FROM edges),
        reach(node, lbl) AS (
            SELECT node, node FROM nodes
            UNION
            SELECT e.doc_a, r.lbl FROM edges e JOIN reach r ON r.node = e.doc_b),
        minlbl AS (SELECT node, MIN(lbl) AS cluster_id FROM reach GROUP BY node)
        SELECT cluster_id, COUNT(*) AS n_members
        FROM minlbl GROUP BY cluster_id HAVING COUNT(*) >= 2
    """,
    # (minhash/simhash/components_lsh are md5-based since round 3 and
    # carry full oracles; tests/test_extensions.py additionally pins
    # their recall against the exact-Jaccard ground truth.)  The simhash
    # oracle recomputes fingerprints through the EXPLODED (doc, bit,
    # vote) formulation — a different algorithm than the engine's
    # row-local fold, same values.
    "dedup_simhash": f"""
        WITH d AS (SELECT doc_id, string_split(text, ' ') AS w, text
                   FROM documents),
        sh AS (SELECT doc_id,
                      CASE WHEN len(w) >= {SHINGLE_N}
                           THEN list_distinct(list_transform(
                               generate_series(1, len(w) - 2),
                               i -> concat_ws(' ', w[i], w[i+1], w[i+2])))
                           ELSE [text] END AS shingles
               FROM d),
        hsx AS (SELECT doc_id,
                       unnest(list_transform(shingles,
                           s -> ('0x' || substr(md5(s), 1, 15))::BIGINT))
                           AS h
                FROM sh),
        votes AS (
            SELECT doc_id, i,
                   SUM(CASE WHEN (h >> CAST(i AS INT)) & 1 = 1
                            THEN 1 ELSE -1 END) AS v
            FROM hsx, unnest(generate_series(0, 59)) AS t(i)
            GROUP BY 1, 2),
        fp AS (SELECT doc_id,
                      SUM(CASE WHEN v > 0
                               THEN 1::BIGINT << CAST(i AS INT)
                               ELSE 0 END)::BIGINT AS fp
               FROM votes GROUP BY 1),
        bands AS (
            SELECT doc_id, b,
                   (fp >> CAST(b * 15 AS INT)) & 32767 AS chunk
            FROM fp, unnest([0, 1, 2, 3]) AS t(b)),
        cand AS (SELECT DISTINCT a.doc_id AS doc_a, b2.doc_id AS doc_b
                 FROM bands a JOIN bands b2
                   ON a.b = b2.b AND a.chunk = b2.chunk
                      AND a.doc_id < b2.doc_id)
        SELECT c.doc_a, c.doc_b,
               bit_count(xor(fa.fp, fb.fp)) AS hamming
        FROM cand c
        JOIN fp fa ON fa.doc_id = c.doc_a
        JOIN fp fb ON fb.doc_id = c.doc_b
        WHERE bit_count(xor(fa.fp, fb.fp)) <= 3
    """,
    "dedup_embedding_cosine": """
        WITH scored AS (
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   ROUND(
                     list_reduce(list_transform(list_zip(a.embedding, b.embedding),
                                 p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)),
                                 (acc, x) -> acc + x)
                     / (sqrt(list_reduce(list_transform(a.embedding,
                              v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)),
                              (acc, x) -> acc + x))
                        * sqrt(list_reduce(list_transform(b.embedding,
                                v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)),
                                (acc, x) -> acc + x))), 6) AS cos
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id)
        SELECT id_a, id_b, cos FROM scored WHERE cos >= 0.4
    """,
}

# Star-contraction computes the identical (cluster_id, n_members) relation
# by a different algorithm — same ground truth, same oracle.
ORACLE["dedup_components_bigstar"] = ORACLE["dedup_components"]

ORACLE["dedup_semantic_clusters"] = _semantic_oracle()

ORACLE["dedup_cluster_size_histogram"] = """
    WITH c AS (SELECT md5(text) AS h, COUNT(*)::BIGINT AS cluster_size
               FROM documents GROUP BY 1)
    SELECT cluster_size, COUNT(*)::BIGINT AS n_clusters,
           (cluster_size * COUNT(*))::BIGINT AS n_docs
    FROM c GROUP BY 1
"""

ORACLE["decontaminate_fuzzy_minhash"] = "WITH " + _minhash_pair_ctes().replace(
    "cand AS (SELECT DISTINCT a.doc_id AS doc_a, b2.doc_id AS doc_b\n"
    "                 FROM bands a JOIN bands b2\n"
    "                   ON a.bb = b2.bb AND a.doc_id < b2.doc_id),",
    f"cand AS (SELECT DISTINCT a.doc_id AS doc_a, b2.doc_id AS doc_b\n"
    f"                 FROM bands a JOIN bands b2\n"
    f"                   ON a.bb = b2.bb AND a.doc_id % {DECON_EVAL_MOD} != 0"
    f" AND b2.doc_id % {DECON_EVAL_MOD} = 0),",
) + """
    SELECT doc_a AS train_doc_id, doc_b AS eval_doc_id, jaccard FROM mh
"""
assert "% 10 != 0" in ORACLE["decontaminate_fuzzy_minhash"], \
    "decon oracle CTE rewrite failed to apply"

ORACLE["dedup_lsh_precision_report"] = "WITH " + _minhash_pair_ctes() + """
    , tot AS (SELECT COUNT(*)::BIGINT AS n_candidates FROM cand),
    ver AS (SELECT COUNT(*)::BIGINT AS n_verified FROM mh)
    SELECT n_candidates, n_verified,
           CAST(FLOOR(CAST(n_verified AS DOUBLE) * 1e6
                      / CAST(n_candidates AS DOUBLE)) AS BIGINT)
               AS precision_ppm
    FROM tot CROSS JOIN ver
"""

QUERIES["dedup_family_overlap"] = q_dedup_family_overlap

_OVERLAP_ROW = """
    SELECT '{a}' AS family_a, '{b}' AS family_b,
           (SELECT COUNT(*) FROM {a}_p)::BIGINT AS n_a,
           (SELECT COUNT(*) FROM {b}_p)::BIGINT AS n_b,
           (SELECT COUNT(*) FROM {a}_p x JOIN {b}_p y
              ON x.doc_a = y.doc_a AND x.doc_b = y.doc_b)::BIGINT
               AS n_common,
           (((SELECT COUNT(*) FROM {a}_p x JOIN {b}_p y
                ON x.doc_a = y.doc_a AND x.doc_b = y.doc_b)::HUGEINT * 1000000)
            // ((SELECT COUNT(*) FROM {a}_p)
                + (SELECT COUNT(*) FROM {b}_p)
                - (SELECT COUNT(*) FROM {a}_p x JOIN {b}_p y
                     ON x.doc_a = y.doc_a AND x.doc_b = y.doc_b)))
               ::BIGINT AS pairset_jaccard_ppm
"""

ORACLE["dedup_family_overlap"] = (
    """
    WITH jaccard_p AS MATERIALIZED (
        SELECT doc_a, doc_b FROM ("""
    + ORACLE["dedup_jaccard_pairs"] + """)),
    minhash_p AS MATERIALIZED (
        SELECT doc_a, doc_b FROM ("""
    + ORACLE["dedup_minhash_lsh"] + """)),
    simhash_p AS MATERIALIZED (
        SELECT doc_a, doc_b FROM ("""
    + ORACLE["dedup_simhash"] + """))
    """
    + _OVERLAP_ROW.format(a="jaccard", b="minhash")
    + " UNION ALL " + _OVERLAP_ROW.format(a="jaccard", b="simhash")
    + " UNION ALL " + _OVERLAP_ROW.format(a="minhash", b="simhash"))


KMV_K = 32          # sketch size — small enough that BOTH the exact
                    # (unsaturated) and estimator (saturated) paths are
                    # exercised at the test SFs (25 distinct docs per
                    # source at sf0.01, 250 at sf0.1); production runs
                    # raise it (error ~ 1/sqrt(K))
KMV_SALT = 16       # phase-1 merge fan-in
_KMV_SPACE = 1 << 60   # hash space: 15 md5 hex chars, uniform [0, 2^60)


def q_kmv_theta_setops(spark, sf_dir):
    """KMV/THETA-SKETCH SET OPERATIONS across corpus sources — the
    dedup-planning estimator: for every source pair, estimate distinct
    document counts, union, intersection, and A-only/B-only
    differences from {k}-minimum-value sketches instead of exact
    distinct aggs.  This is the question a 100 TB multi-source ingest
    asks BEFORE running dedup ("how much does source B add beyond
    A?"), answerable from metadata-sized sketches; unlike HLL, the
    theta/KMV form supports intersection and difference (the
    Datasketches A-not-B primitive).

    Fully deterministic, unlike the engine-specific HLL rows: the
    "random" hash is md5's first 15 hex chars as a 60-bit integer —
    identical in both engines — and a KMV sketch is an order statistic
    (the K smallest values), not a sampled structure.  Estimators are
    the textbook theta forms with theta* = LEAST over the pair's
    per-source thresholds (theta_s = the K-th minimum when the source
    saturated its sketch, else the full hash space — which makes the
    same single formula exact when nothing saturated):
    est(pred) = |{{h in sketch-union : h < theta*, pred}}| * 2^60 DIV
    theta*.  All integer: the count widens to DECIMAL(38,0) before the
    2^60 multiply (counts <= {k} keep it far inside 38 digits).

    Scale: one distinct (source, h) agg over the corpus (the same
    shuffle any per-source dedup pass pays), then a salted two-phase
    K-smallest — ROW_NUMBER over (source, h % {s}) buckets (spillable
    sort, <= {k} rows kept per bucket), merged by a second window over
    the {s}x{k}-row survivors.  Everything downstream (pair cross of
    the ~|sources|-row sketch relation, flag union, estimates) is
    metadata-sized — no corpus-scale join anywhere.

    Output: (src_a, src_b, est_a, est_b, est_union, est_inter,
    est_a_only, est_b_only, jaccard_permille_est).
    """.format(k=KMV_K, s=KMV_SALT)
    from pyspark.sql import Window as W

    d = load_table(spark, sf_dir, "documents")
    h = "CAST(conv(substring(md5(text), 1, 15), 16, 10) AS BIGINT)"
    keys = d.selectExpr("source", f"{h} AS h").distinct()
    w1 = (W.partitionBy("source", F.pmod(F.col("h"), F.lit(KMV_SALT)))
           .orderBy("h"))
    p1 = (keys.withColumn("rn", F.row_number().over(w1))
              .filter(F.col("rn") <= KMV_K).drop("rn"))
    w2 = W.partitionBy("source").orderBy("h")
    sk = (p1.withColumn("rn", F.row_number().over(w2))
            .filter(F.col("rn") <= KMV_K))
    theta = (sk.groupBy("source")
               .agg(F.max("rn").alias("n_s"),
                    F.max(F.when(F.col("rn") == KMV_K, F.col("h")))
                     .alias("h_k"))
               .selectExpr(
                   "source",
                   f"CASE WHEN n_s = {KMV_K} THEN h_k"
                   f" ELSE {_KMV_SPACE}L END AS th"))
    scale = (f"CAST((CAST({{c}} AS DECIMAL(38,0)) * {_KMV_SPACE})"
             f" DIV {{t}} AS BIGINT)")
    est1 = (sk.join(theta, "source")
              .filter(F.col("h") < F.col("th"))
              .groupBy("source", "th")
              .agg(F.count(F.lit(1)).alias("c_s"))
              .selectExpr("source",
                          scale.format(c="c_s", t="th")
                          + " AS est_distinct"))
    srcs = sk.select("source").distinct()
    pairs = (srcs.selectExpr("source AS src_a")
                 .crossJoin(F.broadcast(srcs.selectExpr(
                     "source AS src_b")))
                 .filter(F.col("src_a") < F.col("src_b")))
    va = (pairs.join(sk.selectExpr("source AS src_a", "h"), "src_a")
               .select("src_a", "src_b", "h",
                       F.lit(1).alias("a"), F.lit(0).alias("b")))
    vb = (pairs.join(sk.selectExpr("source AS src_b", "h"), "src_b")
               .select("src_a", "src_b", "h",
                       F.lit(0).alias("a"), F.lit(1).alias("b")))
    u = (va.unionByName(vb)
           .groupBy("src_a", "src_b", "h")
           .agg(F.max("a").alias("in_a"), F.max("b").alias("in_b")))
    pth = (pairs
           .join(theta.selectExpr("source AS src_a", "th AS th_a"),
                 "src_a")
           .join(theta.selectExpr("source AS src_b", "th AS th_b"),
                 "src_b")
           .selectExpr("src_a", "src_b",
                       "LEAST(th_a, th_b) AS th"))
    cnt = (u.join(F.broadcast(pth), ["src_a", "src_b"])
            .filter(F.col("h") < F.col("th"))
            .groupBy("src_a", "src_b", "th")
            .agg(F.sum(F.expr("in_a * in_b")).alias("c_i"),
                 F.sum(F.expr("in_a * (1 - in_b)")).alias("c_a"),
                 F.sum(F.expr("(1 - in_a) * in_b")).alias("c_b")))
    return (cnt
            .join(est1.selectExpr("source AS src_a",
                                  "est_distinct AS est_a"), "src_a")
            .join(est1.selectExpr("source AS src_b",
                                  "est_distinct AS est_b"), "src_b")
            .selectExpr(
                "src_a", "src_b", "est_a", "est_b",
                scale.format(c="(c_i + c_a + c_b)", t="th")
                + " AS est_union",
                scale.format(c="c_i", t="th") + " AS est_inter",
                scale.format(c="c_a", t="th") + " AS est_a_only",
                scale.format(c="c_b", t="th") + " AS est_b_only",
                f"({scale.format(c='c_i', t='th')} * 1000)"
                f" DIV GREATEST({scale.format(c='(c_i + c_a + c_b)', t='th')}, 1)"
                " AS jaccard_permille_est"))


QUERIES["kmv_theta_setops"] = q_kmv_theta_setops

ORACLE["kmv_theta_setops"] = f"""
    WITH keys AS MATERIALIZED (
        SELECT DISTINCT source,
               ('0x' || substr(md5(text), 1, 15))::BIGINT AS h
        FROM documents),
    p1 AS (
        SELECT source, h FROM (
            SELECT source, h,
                   ROW_NUMBER() OVER (PARTITION BY source, h % {KMV_SALT}
                                      ORDER BY h) AS rn
            FROM keys)
        WHERE rn <= {KMV_K}),
    sk AS MATERIALIZED (
        SELECT source, h, rn FROM (
            SELECT source, h,
                   ROW_NUMBER() OVER (PARTITION BY source
                                      ORDER BY h) AS rn
            FROM p1)
        WHERE rn <= {KMV_K}),
    theta AS MATERIALIZED (
        SELECT source,
               CASE WHEN MAX(rn) = {KMV_K}
                    THEN MAX(CASE WHEN rn = {KMV_K} THEN h END)
                    ELSE {_KMV_SPACE} END AS th
        FROM sk GROUP BY 1),
    est1 AS MATERIALIZED (
        SELECT sk.source,
               (COUNT(*)::HUGEINT * {_KMV_SPACE} // MAX(th))::BIGINT
                   AS est_distinct
        FROM sk JOIN theta USING (source)
        WHERE sk.h < theta.th
        GROUP BY 1),
    pairs AS MATERIALIZED (
        SELECT a.source AS src_a, b.source AS src_b
        FROM (SELECT DISTINCT source FROM sk) a,
             (SELECT DISTINCT source FROM sk) b
        WHERE a.source < b.source),
    u AS MATERIALIZED (
        SELECT src_a, src_b, h,
               MAX(a)::BIGINT AS in_a, MAX(b)::BIGINT AS in_b
        FROM (
            SELECT p.src_a, p.src_b, s.h, 1 AS a, 0 AS b
            FROM pairs p JOIN sk s ON s.source = p.src_a
            UNION ALL
            SELECT p.src_a, p.src_b, s.h, 0 AS a, 1 AS b
            FROM pairs p JOIN sk s ON s.source = p.src_b)
        GROUP BY 1, 2, 3),
    pth AS MATERIALIZED (
        SELECT p.src_a, p.src_b, LEAST(ta.th, tb.th) AS th
        FROM pairs p JOIN theta ta ON ta.source = p.src_a
                     JOIN theta tb ON tb.source = p.src_b),
    cnt AS MATERIALIZED (
        SELECT u.src_a, u.src_b, MAX(pth.th) AS th,
               SUM(u.in_a * u.in_b)::BIGINT AS c_i,
               SUM(u.in_a * (1 - u.in_b))::BIGINT AS c_a,
               SUM((1 - u.in_a) * u.in_b)::BIGINT AS c_b
        FROM u JOIN pth USING (src_a, src_b)
        WHERE u.h < pth.th
        GROUP BY 1, 2)
    SELECT c.src_a, c.src_b,
           ea.est_distinct AS est_a, eb.est_distinct AS est_b,
           ((c.c_i + c.c_a + c.c_b)::HUGEINT * {_KMV_SPACE}
            // c.th)::BIGINT AS est_union,
           (c.c_i::HUGEINT * {_KMV_SPACE} // c.th)::BIGINT AS est_inter,
           (c.c_a::HUGEINT * {_KMV_SPACE} // c.th)::BIGINT AS est_a_only,
           (c.c_b::HUGEINT * {_KMV_SPACE} // c.th)::BIGINT AS est_b_only,
           ((c.c_i::HUGEINT * {_KMV_SPACE} // c.th) * 1000
            // GREATEST((c.c_i + c.c_a + c.c_b)::HUGEINT * {_KMV_SPACE}
                        // c.th, 1))::BIGINT AS jaccard_permille_est
    FROM cnt c
    JOIN est1 ea ON ea.source = c.src_a
    JOIN est1 eb ON eb.source = c.src_b
"""
