"""Text-analysis operators over ``documents`` — LLM-pipeline extensions.

All hot paths are JVM built-ins (split/regexp/array functions) — no
Python UDFs, so these run at whole-stage-codegen speed and scale linearly
with document count (narrow transformations, zero shuffles except the
final stats aggregations).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..sources.tables import load_table

# Tiny deterministic stopword inventories for the language-ID heuristic.
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "auf"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "pas", "pour", "dans"],
    "es": ["el", "la", "los", "las", "es", "un", "una", "no", "por", "para"],
}

# A BPE-ish tokenizer regex: words, numbers, or single non-space symbols.
TOKEN_RE = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


def q_text_stats(spark, sf_dir):
    """Per-document token/char statistics + whitespace token count."""
    d = _docs(spark, sf_dir)
    words = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.length("text").alias("n_chars_computed"),
        F.size(words).alias("n_tokens_ws"),
        F.size(F.array_distinct(words)).alias("n_unique_tokens"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(TOKEN_RE), 0)).alias("n_tokens_re"),
    )


def q_text_quality(spark, sf_dir):
    """Quality score: stopword ratio, uniqueness, mean word length.

    The classic cheap-filter stack for pretraining corpora; every term is
    an integer ratio -> one double division, engine-deterministic,
    rounded to 6 dp.
    """
    d = _docs(spark, sf_dir)
    words = F.split(F.col("text"), " ")
    n = F.size(words)
    uniq = F.size(F.array_distinct(words))
    sw = F.size(F.array_intersect(
        F.array_distinct(words),
        F.array(*[F.lit(w) for w in STOPWORDS["en"]])))
    mean_wlen = (F.length("text") - (n - 1)) / n     # chars minus spaces
    return d.select(
        "doc_id",
        n.alias("n_words"),
        F.round(uniq / n, 6).alias("uniq_ratio"),
        sw.alias("n_stopword_types"),
        F.round(mean_wlen, 6).alias("mean_word_len"),
        (n.between(20, 500) & (uniq / n > 0.2)).alias("passes_quality"),
    )


def q_text_langid(spark, sf_dir):
    """Stopword-hit language ID with deterministic tie-break (en>de>fr>es).

    The heuristic from the survey plan: score = |distinct words ∩
    language stopword set|; argmax with fixed preference order.
    """
    d = _docs(spark, sf_dir)
    words = F.array_distinct(F.split(F.col("text"), " "))
    hits = {
        lang: F.size(F.array_intersect(
            words, F.array(*[F.lit(w) for w in sws])))
        for lang, sws in STOPWORDS.items()
    }
    best = F.greatest(*hits.values())
    pred = (F.when(hits["en"] == best, "en")
             .when(hits["de"] == best, "de")
             .when(hits["fr"] == best, "fr")
             .otherwise("es"))
    out = d.select("doc_id", "lang",
                   *[h.alias(f"hits_{lg}") for lg, h in hits.items()],
                   F.when(best == 0, "unknown").otherwise(pred).alias("pred_lang"))
    return out


def q_text_fingerprint(spark, sf_dir):
    """Document fingerprint: md5 over whitespace-normalized lowercase text."""
    d = _docs(spark, sf_dir)
    norm = F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")
    return d.select(
        "doc_id",
        F.md5(F.encode(norm, "UTF-8")).alias("fingerprint"),
        F.substring(F.md5(F.encode(norm, "UTF-8")), 1, 4).alias("fp_bucket"))


WINNOW_K = 8   # char k-gram length
WINNOW_W = 4   # winnowing window (guarantee: any match >= K+W-1 chars shares a fingerprint)


def q_text_winnow(spark, sf_dir):
    """Winnowing document fingerprints (Schleimer et al., SIGMOD'03).

    Per doc, row-locally: normalize whitespace/case -> char 8-gram hashes
    -> min hash of every 4-window -> distinct mins are the fingerprint
    set.  The hash basis is the first 16 hex chars of md5 (string order),
    chosen over xxhash64 so the oracle can reproduce it — the algorithm
    is hash-agnostic.  Zero shuffles: fingerprinting is a projection;
    only the (absent here) pair-matching phase would shuffle, keyed by
    fingerprint like minhash LSH bucket keys.
    """
    d = _docs(spark, sf_dir)
    norm = F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")
    nd = d.select("doc_id", norm.alias("norm"))
    n = F.length("norm")
    hs = F.transform(
        F.sequence(F.lit(1), F.greatest(n - (WINNOW_K - 1), F.lit(1))),
        lambda i: F.substring(
            F.md5(F.encode(F.col("norm").substr(i, F.lit(WINNOW_K)), "UTF-8")),
            1, 16))
    withg = nd.select("doc_id", hs.alias("hs"))
    fps = F.array_distinct(F.transform(
        F.sequence(F.lit(1), F.greatest(F.size("hs") - (WINNOW_W - 1), F.lit(1))),
        lambda j: F.array_min(F.slice("hs", j, WINNOW_W))))
    return (withg.select("doc_id", F.size("hs").alias("n_grams"), fps.alias("fps"))
                 .select("doc_id", "n_grams",
                         F.size("fps").alias("n_fps"),
                         F.array_min("fps").alias("min_fp"),
                         F.array_max("fps").alias("max_fp")))


def q_text_ngram_freq(spark, sf_dir):
    """Corpus-level bigram frequency (explode -> count), top by count.

    The shuffle key is the bigram itself; at 100 TB this is the word-count
    shape — map-side partial counts absorb the heavy hitters.
    """
    d = _docs(spark, sf_dir)
    w = F.split(F.col("text"), " ")
    n = F.size(w)
    # sliced zip_with, not element_at-in-transform: see dedup._shingles
    bigrams = F.when(n >= 2, F.zip_with(
        F.slice(w, 1, n - 1), F.slice(w, 2, n - 1),
        lambda a, b: F.concat_ws(" ", a, b),
    )).otherwise(F.array())
    return (d.select(F.explode(bigrams).alias("bigram"))
             .groupBy("bigram")
             .agg(F.count(F.lit(1)).alias("freq"))
             .filter(F.col("freq") >= 10))


def q_text_tfidf(spark, sf_dir):
    """Top-3 TF-IDF terms per document (tf * ln((N+1)/(df+1))).

    The classic keyword-extraction / relevance-weighting pass: explode
    words -> per-(doc, word) tf -> per-word df -> score -> window top-3.
    Two shuffles (word-count and doc-partitioned top-k); the corpus size
    N is an aggregated scalar broadcast-joined in (a broadcast of ONE
    row — never a driver collect).  Heavy-hitter words (stopwords) skew
    the df aggregation's key distribution, but partial aggregation
    absorbs them map-side; the per-doc window partitions on doc_id,
    which is uniform by construction.  Ties broken by (score desc, word
    asc) for a total order, so the oracle matches exactly.
    """
    d = _docs(spark, sf_dir)
    words = d.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
    # tf is already distinct on (doc_id, word), so df is a plain count
    # over it — no COUNT(DISTINCT) Expand shuffle, no second explode of
    # the corpus.  Cached because both the df branch and the final join
    # consume it (bounded: one row per (doc, distinct word)).
    tf = words.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("tf")).cache()
    df = tf.groupBy("word").agg(F.count(F.lit(1)).alias("df"))
    n = d.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (tf.join(df, "word").crossJoin(F.broadcast(n))
              .withColumn("tfidf", F.round(
                  F.col("tf") * F.log((F.col("n_docs") + 1) / (F.col("df") + 1)), 6)))
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("tfidf"), F.asc("word"))
    return (scored.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= 3)
            .select("doc_id", "word", "tf", "df", "tfidf", "rk"))


def q_text_inverted_index(spark, sf_dir):
    """Inverted index: word -> sorted posting list of doc_ids (df >= 2).

    The retrieval-side core of a dedup/search stack.  One shuffle keyed
    by word; ``collect_set`` + ``sort_array`` makes the posting list
    deterministic regardless of task arrival order.  At 100 TB the
    posting list for a head word is the classic reducer-OOM: real
    systems shard hot words by (word, doc_id range) — same salting
    shape as scale.q_agg_salted — and delta-encode the sorted ids;
    df-band filtering (drop stopword-frequency words) bounds state
    before the heavy groupBy when the downstream consumer allows it.
    """
    d = _docs(spark, sf_dir)
    words = d.select("doc_id", F.explode(
        F.array_distinct(F.split("text", " "))).alias("word"))
    # Posting list rides as a comma-joined string — the driver's oracle
    # canonicalizer can't hash list cells, and int→string renders
    # identically in both engines.
    return (words.groupBy("word")
            .agg(F.count(F.lit(1)).alias("df"),
                 F.concat_ws(",", F.transform(
                     F.sort_array(F.collect_set("doc_id")),
                     lambda x: x.cast("string"))).alias("postings"))
            .filter(F.col("df") >= 2))


PII_EMAIL = r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}"
PII_LONGNUM = r"\b[0-9]{6,}\b"


def q_text_scrub(spark, sf_dir):
    """PII scrubbing pass: mask email-shaped and long-digit-run spans,
    report per-document redaction counts.

    The standard pre-training scrub: two regexp passes, pure projection
    (zero shuffles, whole-stage codegen), linear in corpus bytes — the
    shape that matters at 100 TB since every byte flows through exactly
    once.  Counts are computed on the ORIGINAL text so the query also
    serves as a redaction audit.
    """
    d = _docs(spark, sf_dir)
    scrubbed = F.regexp_replace(
        F.regexp_replace(F.col("text"), PII_EMAIL, "<EMAIL>"),
        PII_LONGNUM, "<NUM>")
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all(F.col("text"), F.lit(PII_EMAIL), 0)).alias("n_emails"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(PII_LONGNUM), 0)).alias("n_longnums"),
        F.length(scrubbed).alias("n_chars_scrubbed"),
        F.md5(F.encode(scrubbed, "UTF-8")).alias("scrubbed_digest"))


def q_heavy_hitters(spark, sf_dir):
    """Corpus heavy hitters: words above 0.1% relative frequency.

    The frequent-items pass every curation pipeline runs (stopword
    discovery, boilerplate detection): one word-count shuffle whose
    skewed keys — the heavy hitters themselves — are absorbed map-side
    by partial aggregation, plus a 1-row total broadcast.  The
    threshold is cross-multiplied (cnt·1000 > total) so selection stays
    in exact integer arithmetic at any scale; only the reported
    rel_freq divides.
    """
    d = _docs(spark, sf_dir)
    words = d.select(F.explode(F.split("text", " ")).alias("word"))
    counts = words.groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))
    total = words.agg(F.count(F.lit(1)).alias("total"))
    return (counts.crossJoin(F.broadcast(total))
            .filter(F.col("cnt") * 1000 > F.col("total"))
            .select("word", "cnt",
                    F.round(F.col("cnt") / F.col("total"), 6).alias("rel_freq")))


QUERIES = {
    "text_stats": q_text_stats,
    "text_quality": q_text_quality,
    "text_langid": q_text_langid,
    "text_fingerprint": q_text_fingerprint,
    "text_winnow_fingerprints": q_text_winnow,
    "text_bigram_freq": q_text_ngram_freq,
    "text_tfidf_top_terms": q_text_tfidf,
    "text_inverted_index": q_text_inverted_index,
    "text_scrub_pii": q_text_scrub,
    "text_heavy_hitters": q_heavy_hitters,
}

_SW = {k: "[" + ", ".join(f"'{w}'" for w in v) + "]" for k, v in STOPWORDS.items()}
_HITS = {k: f"len(list_intersect(list_distinct(string_split(text, ' ')), {v}))"
         for k, v in _SW.items()}
_BEST = f"greatest({_HITS['en']}, {_HITS['de']}, {_HITS['fr']}, {_HITS['es']})"

ORACLE = {
    "text_heavy_hitters": """
        WITH w AS (SELECT unnest(string_split(text, ' ')) AS word
                   FROM documents),
        c AS (SELECT word, COUNT(*) AS cnt FROM w GROUP BY 1),
        t AS (SELECT COUNT(*) AS total FROM w)
        SELECT word, cnt, ROUND(cnt / total, 6) AS rel_freq
        FROM c, t WHERE cnt * 1000 > total
    """,
    "text_stats": r"""
        SELECT doc_id,
               LENGTH(text) AS n_chars_computed,
               len(string_split(text, ' ')) AS n_tokens_ws,
               len(list_distinct(string_split(text, ' '))) AS n_unique_tokens,
               len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]'))
                   AS n_tokens_re
        FROM documents
    """,
    "text_quality": f"""
        SELECT doc_id,
               len(string_split(text, ' ')) AS n_words,
               ROUND(len(list_distinct(string_split(text, ' ')))
                     / len(string_split(text, ' ')), 6) AS uniq_ratio,
               {_HITS['en']} AS n_stopword_types,
               ROUND((LENGTH(text) - (len(string_split(text, ' ')) - 1))
                     / len(string_split(text, ' ')), 6) AS mean_word_len,
               (len(string_split(text, ' ')) BETWEEN 20 AND 500
                AND len(list_distinct(string_split(text, ' ')))
                    / len(string_split(text, ' ')) > 0.2) AS passes_quality
        FROM documents
    """,
    "text_langid": f"""
        SELECT doc_id, lang,
               {_HITS['en']} AS hits_en,
               {_HITS['de']} AS hits_de,
               {_HITS['fr']} AS hits_fr,
               {_HITS['es']} AS hits_es,
               CASE WHEN {_BEST} = 0 THEN 'unknown'
                    WHEN {_HITS['en']} = {_BEST} THEN 'en'
                    WHEN {_HITS['de']} = {_BEST} THEN 'de'
                    WHEN {_HITS['fr']} = {_BEST} THEN 'fr'
                    ELSE 'es' END AS pred_lang
        FROM documents
    """,
    "text_fingerprint": r"""
        SELECT doc_id,
               md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS fingerprint,
               substring(md5(regexp_replace(lower(text), '\s+', ' ', 'g')), 1, 4)
                   AS fp_bucket
        FROM documents
    """,
    "text_winnow_fingerprints": r"""
        WITH d AS (SELECT doc_id,
                          regexp_replace(lower(text), '\s+', ' ', 'g') AS norm
                   FROM documents),
        g AS (SELECT doc_id,
                list_transform(generate_series(1, greatest(length(norm) - 8 + 1, 1)),
                    i -> substr(md5(substr(norm, i, 8)), 1, 16)) AS hs
              FROM d),
        w AS (SELECT doc_id, len(hs) AS n_grams,
                list_distinct(list_transform(
                    generate_series(1, greatest(len(hs) - 4 + 1, 1)),
                    j -> list_min(hs[j : j + 3]))) AS fps
              FROM g)
        SELECT doc_id, n_grams, len(fps) AS n_fps,
               list_min(fps) AS min_fp, list_max(fps) AS max_fp
        FROM w
    """,
    "text_scrub_pii": r"""
        WITH s AS (
            SELECT doc_id, text,
                   regexp_replace(
                       regexp_replace(text,
                           '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}',
                           '<EMAIL>', 'g'),
                       '\b[0-9]{6,}\b', '<NUM>', 'g') AS scrubbed
            FROM documents)
        SELECT doc_id,
               len(regexp_extract_all(text,
                   '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}')) AS n_emails,
               len(regexp_extract_all(text, '\b[0-9]{6,}\b')) AS n_longnums,
               LENGTH(scrubbed) AS n_chars_scrubbed,
               md5(scrubbed) AS scrubbed_digest
        FROM s
    """,
    "text_tfidf_top_terms": """
        WITH words AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS word
            FROM documents),
        tf AS (SELECT doc_id, word, COUNT(*) AS tf
               FROM words GROUP BY doc_id, word),
        df AS (SELECT word, COUNT(DISTINCT doc_id) AS df
               FROM words GROUP BY word),
        n AS (SELECT COUNT(*) AS n_docs FROM documents),
        scored AS (
            SELECT tf.doc_id, tf.word, tf.tf, df.df, n.n_docs,
                   ROUND(tf.tf * ln((n.n_docs + 1) / (df.df + 1.0)), 6) AS tfidf
            FROM tf JOIN df USING (word) CROSS JOIN n)
        SELECT doc_id, word, tf, df, tfidf, rk FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY doc_id ORDER BY tfidf DESC, word ASC) AS rk
            FROM scored)
        WHERE rk <= 3
    """,
    "text_inverted_index": """
        WITH words AS (
            SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS word
            FROM documents)
        SELECT word, COUNT(*) AS df,
               array_to_string(list_sort(list(doc_id)), ',') AS postings
        FROM words GROUP BY word
        HAVING COUNT(*) >= 2
    """,
    "text_bigram_freq": """
        WITH w AS (SELECT string_split(text, ' ') AS ws FROM documents),
        bg AS (
            SELECT unnest(list_transform(
                       generate_series(1, len(ws) - 1),
                       i -> ws[i] || ' ' || ws[i + 1])) AS bigram
            FROM w WHERE len(ws) >= 2)
        SELECT bigram, COUNT(*) AS freq FROM bg
        GROUP BY bigram HAVING COUNT(*) >= 10
    """,
}
