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
                     no quadratic blowup; all JVM built-ins (xxhash64,
                     aggregate), zero Python in the hot path.
* simhash          — 64-bit fingerprint from token-hash bit votes;
                     near-dup = Hamming distance <= 3 found via 4x16-bit
                     band buckets (pigeonhole: any pair within distance 3
                     shares at least one of 4 bands exactly).
* embedding cosine — near-dup = cosine >= threshold on the embeddings
                     table; brute self-join at test SF, LSH-bucketed in
                     similarity.py for scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.vectors import cosine_sim
from ..sources.tables import load_table

MINHASH_K = 32        # minhash signature length
LSH_BANDS = 8         # bands of r = K/BANDS rows each
SHINGLE_N = 3         # words per shingle
JACCARD_T = 0.5       # near-dup threshold


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


def _words(spark, sf_dir) -> DataFrame:
    """(doc_id, word) distinct pairs — the token inverted index."""
    d = _docs(spark, sf_dir)
    return (d.select("doc_id",
                     F.explode(F.split(F.col("text"), " ")).alias("word"))
             .distinct())


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


def q_dedup_jaccard_pairs(spark, sf_dir):
    """Exact word-set Jaccard >= 0.5 pairs via inverted-index self-join.

    jaccard = |A∩B| / (|A| + |B| - |A∩B|), integer counts -> one double
    division (engine-deterministic), rounded to 6 dp for the hash gate.
    """
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


def _shingles(spark, sf_dir) -> DataFrame:
    """(doc_id, shingles array<string>) — distinct word n-grams per doc."""
    d = _docs(spark, sf_dir)
    w = F.split(F.col("text"), " ")
    n = F.size(w)
    sh = F.when(n >= SHINGLE_N, F.transform(
        F.sequence(F.lit(0), n - SHINGLE_N),
        lambda i: F.concat_ws(" ", *[F.element_at(w, i + k + 1)
                                     for k in range(SHINGLE_N)]),
    )).otherwise(F.array(F.col("text")))
    return d.select("doc_id", F.array_distinct(sh).alias("shingles"))


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
    sh = _shingles(spark, sf_dir).cache()
    sig = sh.select("doc_id", *[
        F.array_min(F.transform(
            F.col("shingles"),
            lambda s, seed=seed: F.xxhash64(s, F.lit(seed))))
         .alias(f"h{seed}")
        for seed in range(MINHASH_K)])
    r = MINHASH_K // LSH_BANDS
    bands = sig.select(
        "doc_id",
        F.explode(F.array(*[
            F.struct(F.lit(b).alias("band"),
                     F.xxhash64(*[F.col(f"h{b * r + j}") for j in range(r)])
                      .alias("bucket"))
            for b in range(LSH_BANDS)])).alias("bb"))
    cand = (bands.alias("x").join(
                bands.alias("y"),
                (F.col("x.bb") == F.col("y.bb"))
                & (F.col("x.doc_id") < F.col("y.doc_id")))
            .select(F.col("x.doc_id").alias("doc_a"),
                    F.col("y.doc_id").alias("doc_b"))
            .distinct())
    va = sh.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a"))
    vb = sh.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    return (cand.join(va, "doc_a").join(vb, "doc_b")
            .withColumn("jaccard", F.round(
                inter / (F.size("sh_a") + F.size("sh_b") - inter), 6))
            .filter(F.col("jaccard") >= JACCARD_T)
            .select("doc_a", "doc_b", "jaccard"))


def q_dedup_simhash(spark, sf_dir):
    """SimHash fingerprints + Hamming<=3 near-dup pairs via band buckets.

    Fingerprint: per-token 64-bit xxhash64; bit i of the fingerprint is
    the sign of sum over tokens of (+1 if bit set else -1).  Pairs within
    Hamming distance 3 must agree exactly on one of 4 16-bit bands.
    """
    words = _words(spark, sf_dir)
    # Explode to (doc_id, bit, ±1 vote): two keyed shuffles, linear in
    # tokens x 64, no driver-side or per-group array materialization —
    # the shape that survives 100 TB of documents.
    votes = (words
             .withColumn("h", F.xxhash64("word"))
             .select("doc_id", F.posexplode(F.expr(
                 "transform(sequence(0, 63),"
                 " i -> IF((shiftright(h, i) & 1L) = 1L, 1, -1))"))
                 .alias("bit", "vote")))
    bit_sums = votes.groupBy("doc_id", "bit").agg(F.sum("vote").alias("s"))
    fps = (bit_sums.groupBy("doc_id")
           .agg(F.sum(F.expr("IF(s > 0, shiftleft(1L, bit), 0L)")).alias("fp"))
           .cache())
    bands = fps.select(
        "doc_id", "fp",
        F.explode(F.array(*[
            F.struct(F.lit(b).alias("band"),
                     F.shiftright("fp", b * 16).bitwiseAND(F.lit(0xFFFF)).alias("chunk"))
            for b in range(4)])).alias("bb"))
    pairs = (bands.alias("x").join(
                 bands.alias("y"),
                 (F.col("x.bb") == F.col("y.bb"))
                 & (F.col("x.doc_id") < F.col("y.doc_id")))
             .select(F.col("x.doc_id").alias("doc_a"), F.col("x.fp").alias("fp_a"),
                     F.col("y.doc_id").alias("doc_b"), F.col("y.fp").alias("fp_b"))
             .distinct())
    return (pairs.withColumn("hamming", F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b"))))
            .filter(F.col("hamming") <= 3)
            .select("doc_a", "doc_b", "hamming"))


COSINE_DUP_T = 0.4    # the synthetic embeddings top out at cos ~0.51


def q_dedup_embedding(spark, sf_dir):
    """Embedding-cosine near-dup pairs (cosine >= 0.4), brute self-join.

    Exact ground truth at test SF; the LSH-bucketed scale path is
    similarity.q_ann_lsh.  Score rounded to 6 dp.  Spark's sequential
    array fold is bit-identical to DuckDB's list_reduce (verified over
    all 124,750 sf0.01 pairs), so this carries a full value oracle.
    """
    e = load_table(spark, sf_dir, "embeddings")
    a = e.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
    b = e.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"))
    return (a.join(b, F.col("id_a") < F.col("id_b"))
             .withColumn("cos", F.round(cosine_sim("va", "vb"), 6))
             .filter(F.col("cos") >= COSINE_DUP_T)
             .select("id_a", "id_b", "cos"))


QUERIES = {
    "dedup_exact_groups": q_dedup_exact,
    "dedup_exact_keep_min": q_dedup_exact_keep,
    "dedup_jaccard_pairs": q_dedup_jaccard_pairs,
    "dedup_minhash_lsh": q_dedup_minhash_lsh,
    "dedup_simhash": q_dedup_simhash,
    "dedup_embedding_cosine": q_dedup_embedding,
}

ORACLE = {
    "dedup_exact_groups": """
        SELECT md5(text) AS text_hash, COUNT(*) AS n_copies,
               MIN(doc_id) AS keep_doc_id
        FROM documents GROUP BY md5(text)
    """,
    "dedup_exact_keep_min": """
        SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY text
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
    # dedup_minhash_lsh, dedup_simhash: xxhash64-based — not reproducible
    # in DuckDB; driver records rows-only checks.  Their correctness is
    # pinned by tests/test_dedup.py against the exact-Jaccard ground truth.
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
