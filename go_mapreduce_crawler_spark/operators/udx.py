"""User-defined-extension surface: UDTF and grouped-map UDAF demos.

The reference's entire API is user-supplied functions (SURVEY.md §2.2
UDF/UDAF/UDTF row): ``Transformer`` (scalar UDF, pool.go:14-20),
``Accumulator``/``Combiner`` (UDAF halves, pool.go:8-12,
crawler.go:32), ``Searcher`` (one-row-in-many-out UDTF, pool.go:22-32).
The engine's equivalents elsewhere are Column expressions and
mapInPandas kernels (crawler.py, pool.py, multimodal.py); this module
adds the two remaining first-class Spark forms:

* a **Python UDTF** (`split_sentences`) — the Searcher shape as a real
  lateral table function;
* a **grouped-map applyInPandas** (`q_grouped_rank_pandas`) — arbitrary
  per-group Python with the group as a pandas DataFrame, the
  applyInPandas twin of the JVM window formulation (oracle:
  ROW_NUMBER over the same total order).

Both are the PYTHON path (BatchEvalPythonUDTF / FlatMapGroupsInPandas
in the plan) and deliberately so — they pin the API's semantics with a
full value oracle.  Hot paths stay JVM-side per the repo rule; outputs
here are integer ranks/counts so no float nondeterminism crosses the
Python boundary.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.functions import udtf

from ..sources.tables import load_table


@udtf(returnType="doc_id bigint, sentence string, n_words int",
      useArrow=True)
class SplitSentences:
    """One document row in, one row per '. '-delimited sentence out —
    the Searcher contract (parent -> children) as a lateral UDTF.
    Arrow-optimized (Spark 3.5+): rows cross the Python boundary as
    Arrow batches (ArrowEvalPythonUDTF), not pickled one at a time —
    the plan audit's no-BatchEvalPython rule holds for the whole
    surface, UDTFs included."""

    def eval(self, doc_id, text):
        for s in (text or "").split(". "):
            if s:
                yield doc_id, s, len(s.split(" "))


def q_udtf_sentences(spark, sf_dir):
    """Lateral Python UDTF over documents.

    At scale the UDTF runs once per input partition with rows streamed
    through — no shuffle is introduced; the explode-like fan-out stays
    pipeline-local exactly like the JVM explode.
    """
    d = load_table(spark, sf_dir, "documents")
    spark.udtf.register("split_sentences", SplitSentences)
    return spark.sql(
        """
        SELECT s.doc_id, s.sentence, s.n_words
        FROM {docs} d, LATERAL split_sentences(d.doc_id, d.text) s
        """,
        docs=d)


def q_grouped_rank_pandas(spark, sf_dir):
    """Per-language percentile rank of documents by length, computed as
    a grouped-map applyInPandas (the full-group-in-pandas UDAF shape).

    The kernel emits only INTEGER ranks over the total order
    (n_chars, doc_id); the single double division happens JVM-side so
    the Python boundary carries no float nondeterminism.  Each language
    group must fit one executor's memory — the documented applyInPandas
    contract; for unbounded groups use window functions instead
    (window_percent_cume is the JVM twin).
    """
    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")

    def rank_group(pdf):
        pdf = pdf.sort_values(["n_chars", "doc_id"]).reset_index(drop=True)
        pdf["rank_idx"] = pdf.index.astype("int64")
        pdf["group_n"] = len(pdf)
        return pdf

    ranked = d.groupBy("lang").applyInPandas(
        rank_group,
        schema="doc_id long, lang string, n_chars long, rank_idx long, group_n long")
    return ranked.select(
        "doc_id", "lang", "n_chars",
        F.when(F.col("group_n") > 1,
               F.round(F.col("rank_idx").cast("double")
                       / (F.col("group_n") - 1), 6))
         .otherwise(F.lit(0.0)).alias("pct_rank"))


QUERIES = {
    "udtf_sentences": q_udtf_sentences,
    "grouped_rank_pandas": q_grouped_rank_pandas,
}

ORACLE = {
    "udtf_sentences": """
        SELECT doc_id, sentence,
               len(string_split(sentence, ' ')) AS n_words
        FROM (
            SELECT doc_id, unnest(string_split(text, '. ')) AS sentence
            FROM documents)
        WHERE sentence <> ''
    """,
    "grouped_rank_pandas": """
        SELECT doc_id, lang, n_chars,
               CASE WHEN COUNT(*) OVER (PARTITION BY lang) > 1
                    THEN ROUND((ROW_NUMBER() OVER (PARTITION BY lang
                                    ORDER BY n_chars, doc_id) - 1)::DOUBLE
                               / (COUNT(*) OVER (PARTITION BY lang) - 1), 6)
                    ELSE 0.0 END AS pct_rank
        FROM documents
    """,
}
