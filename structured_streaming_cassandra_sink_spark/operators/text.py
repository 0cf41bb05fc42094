"""Text analysis operators — stats, token counting, language ID, quality
scoring, fingerprinting (north-star LLM-data ops, SURVEY.md §2.3).

Everything here is built-in Catalyst expressions over the `documents`
table: per-document maps are embarrassingly parallel (no shuffle at all —
the 100 TB-friendly shape), aggregations shuffle only tiny group keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.textfns import fingerprint, tokens
from ..plans.registry import query
from ..sources import load_table

# Shared token regex for "BPE-ish" counting: letter runs, digit runs, or
# single non-space symbols. ASCII-only so Java regex (Spark) and RE2
# (DuckDB) agree.
TOKEN_RE = "[a-z]+|[0-9]+|[^a-z0-9 ]"

# Tiny English stopword list for the language-ID heuristic.
EN_STOPWORDS = ["the", "a", "of", "to", "and", "in", "is", "it", "for", "on"]


@query(
    "text_stats",
    """
    SELECT doc_id,
           len(string_split(text, ' '))                       AS n_tokens,
           length(text)                                       AS n_chars_calc,
           len(list_distinct(string_split(text, ' ')))        AS n_distinct_tokens,
           round(length(replace(text, ' ', ''))::DOUBLE
                 / len(string_split(text, ' ')), 4)           AS avg_token_len
    FROM documents
    """,
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token/char statistics. Pure map — no shuffle."""
    d = load_table(spark, "documents", sf_dir)
    toks = tokens(F.col("text"))
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.length("text").alias("n_chars_calc"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        F.round(
            F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))).cast("double")
            / F.size(toks),
            4,
        ).alias("avg_token_len"),
    )


@query(
    "text_stats_by_lang",
    """
    SELECT lang,
           count(*)                                            AS n_docs,
           round(avg(len(string_split(text, ' '))), 4)         AS avg_tokens,
           sum(n_chars)                                        AS total_chars,
           count(DISTINCT source)                              AS n_sources
    FROM documents
    GROUP BY lang
    """,
)
def text_stats_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus rollup by language — the monitoring query of a training-data
    pipeline (token budget per language)."""
    d = load_table(spark, "documents", sf_dir)
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg(F.size(tokens(F.col("text")))), 4).alias("avg_tokens"),
        F.sum("n_chars").alias("total_chars"),
        F.countDistinct("source").alias("n_sources"),
    )


@query(
    "token_count",
    f"""
    SELECT source,
           sum(len(regexp_extract_all(text, '{TOKEN_RE}')))   AS total_tokens,
           round(avg(len(regexp_extract_all(text, '{TOKEN_RE}'))), 4) AS avg_tokens_per_doc
    FROM documents
    GROUP BY source
    """,
)
def token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex tokenizer (BPE-ish pre-tokenization shape: letter runs /
    digit runs / single symbols) aggregated per source — the "how many
    tokens am I buying from this source" query."""
    d = load_table(spark, "documents", sf_dir)
    n = F.size(F.regexp_extract_all(F.col("text"), F.lit(TOKEN_RE), F.lit(0)))
    return d.groupBy("source").agg(
        F.sum(n).alias("total_tokens"),
        F.round(F.avg(n), 4).alias("avg_tokens_per_doc"),
    )


_STOP_LIST_SQL = "[" + ", ".join(f"'{w}'" for w in EN_STOPWORDS) + "]"


@query(
    "lang_id_heuristic",
    f"""
    SELECT doc_id,
           round(len(list_intersect(list_distinct(string_split(text, ' ')),
                                    {_STOP_LIST_SQL}))::DOUBLE
                 / len(list_distinct(string_split(text, ' '))), 4) AS en_stopword_ratio,
           CASE WHEN len(list_intersect(list_distinct(string_split(text, ' ')),
                                        {_STOP_LIST_SQL}))::DOUBLE
                     / len(list_distinct(string_split(text, ' '))) >= 0.05
                THEN 'en' ELSE 'und' END                           AS pred_lang
    FROM documents
    """,
)
def lang_id_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram/stopword language-ID heuristic: ratio of distinct tokens
    that are English stopwords -> 'en' vs 'und'. (The testdata text is
    synthetic word salad, so this demonstrates the operator mechanism —
    the stopword table is where real per-language profiles plug in.)"""
    d = load_table(spark, "documents", sf_dir)
    toks = F.array_distinct(tokens(F.col("text")))
    stop = F.array(*[F.lit(w) for w in EN_STOPWORDS])
    ratio = F.size(F.array_intersect(toks, stop)).cast("double") / F.size(toks)
    return d.select(
        "doc_id",
        F.round(ratio, 4).alias("en_stopword_ratio"),
        F.when(ratio >= 0.05, F.lit("en")).otherwise(F.lit("und")).alias("pred_lang"),
    )


@query(
    "quality_score",
    """
    SELECT doc_id,
           length(text)                                              AS n_chars_calc,
           round(len(list_distinct(string_split(text, ' ')))::DOUBLE
                 / len(string_split(text, ' ')), 4)                  AS uniq_ratio,
           CASE WHEN length(text) BETWEEN 100 AND 2000 THEN 1 ELSE 0 END AS len_ok,
           round(0.5 * (CASE WHEN length(text) BETWEEN 100 AND 2000 THEN 1 ELSE 0 END)
                 + 0.5 * (len(list_distinct(string_split(text, ' ')))::DOUBLE
                          / len(string_split(text, ' '))), 4)        AS quality
    FROM documents
    """,
)
def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite quality score from cheap signals (length band + lexical
    diversity). Filters like `quality >= x` are sargable map-side
    predicates — the shape used to gate documents into a training set."""
    d = load_table(spark, "documents", sf_dir)
    toks = tokens(F.col("text"))
    uniq = F.size(F.array_distinct(toks)).cast("double") / F.size(toks)
    len_ok = F.when(F.length("text").between(100, 2000), 1).otherwise(0)
    return d.select(
        "doc_id",
        F.length("text").alias("n_chars_calc"),
        F.round(uniq, 4).alias("uniq_ratio"),
        len_ok.alias("len_ok"),
        F.round(0.5 * len_ok + 0.5 * uniq, 4).alias("quality"),
    )


@query(
    "doc_fingerprint",
    """
    SELECT doc_id,
           md5(lower(regexp_replace(text, '\\s+', ' ', 'g'))) AS fp
    FROM documents
    """,
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized md5 fingerprint per document — engine-portable identity
    for exact dedup and incremental-ingest dedup joins."""
    d = load_table(spark, "documents", sf_dir)
    return d.select("doc_id", fingerprint(F.col("text")).alias("fp"))
