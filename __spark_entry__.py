"""Driver contract for the spark-graft builder (PySpark target).

Every operator from SURVEY.md §2 implemented so far has a ``queries()``
entry; SQL-expressible ones also have an ``oracle_sql()`` entry verified
against DuckDB at sf0.01 (row-count + schema + value-hash).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from mklab_focused_crawler_spark.operators.spans import (
    build_spans,
    spans_stats,
    spans_stats_oracle_sql,
)
from mklab_focused_crawler_spark.operators.terms import top_terms_per_source
from mklab_focused_crawler_spark.operators import (
    dedup,
    multimodal,
    similarity,
    trending,
)
from mklab_focused_crawler_spark.functions import scoring, text, urls
from mklab_focused_crawler_spark.functions.text import (
    STOPWORDS,
    TOKEN_SPLIT_RE,
)
from mklab_focused_crawler_spark.sources.tables import load_table

from pyspark.sql import functions as F

_TOKS_SQL = (
    f"list_filter(string_split_regex(lower(text), '{TOKEN_SPLIT_RE}'), t -> t <> '')"
)
_STOPLIST_SQL = "[" + ", ".join(f"'{w}'" for w in STOPWORDS) + "]"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    return top_terms_per_source(build_spans(docs), k=10)


# --------------------------------------------------------------------------
# queries / oracles
# --------------------------------------------------------------------------


def _q_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return top_terms_per_source(build_spans(docs), k=10)


def _q_spans_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return spans_stats(build_spans(docs))


# Deterministic URL corpus derived from documents.doc_id — identical
# string construction on both engines so the URL ops themselves are the
# thing under test.
def _synth_url_col():
    d = F.col("doc_id").cast("string")
    return (
        F.when(
            F.col("doc_id") % 11 == 0,
            F.concat(F.lit("https://instagram.com/p/pic"), d, F.lit("/")),
        )
        .when(
            F.col("doc_id") % 13 == 0,
            F.concat(F.lit("https://www.youtube.com/watch?v=vid"), d),
        )
        .when(F.col("doc_id") % 17 == 0, F.concat(F.lit("https://vimeo.com/"), d))
        .when(
            F.col("doc_id") % 19 == 0,
            F.concat(
                F.lit("http://www.facebook.com/photo.php?fbid=f"), d, F.lit("&set=a.1")
            ),
        )
        .otherwise(
            F.concat(
                F.lit("HTTP://WWW.Site"),
                (F.col("doc_id") % 23).cast("string"),
                F.lit(".Example.COM:80/Articles/"),
                d,
                F.lit("/?utm=x&b="),
                (F.col("doc_id") % 3).cast("string"),
                F.lit("&a=1#frag"),
            )
        )
    )


_SYNTH_URL_SQL = """
    (CASE
      WHEN doc_id % 11 = 0 THEN 'https://instagram.com/p/pic' || CAST(doc_id AS VARCHAR) || '/'
      WHEN doc_id % 13 = 0 THEN 'https://www.youtube.com/watch?v=vid' || CAST(doc_id AS VARCHAR)
      WHEN doc_id % 17 = 0 THEN 'https://vimeo.com/' || CAST(doc_id AS VARCHAR)
      WHEN doc_id % 19 = 0 THEN 'http://www.facebook.com/photo.php?fbid=f' || CAST(doc_id AS VARCHAR) || '&set=a.1'
      ELSE 'HTTP://WWW.Site' || CAST(doc_id % 23 AS VARCHAR) || '.Example.COM:80/Articles/'
           || CAST(doc_id AS VARCHAR) || '/?utm=x&b=' || CAST(doc_id % 3 AS VARCHAR) || '&a=1#frag'
    END)
"""


def _q_url_layer(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    df = docs.withColumn("url", _synth_url_col())
    plat, mid = urls.platform_media_id(F.col("url"))
    return df.select(
        "doc_id",
        "url",
        urls.canonicalize_url("url").alias("canonical_url"),
        urls.url_host("url").alias("host"),
        urls.route("url").alias("route"),
        plat.alias("platform"),
        mid.alias("media_id"),
        (F.length("url") <= urls.MAX_URL_LENGTH).alias("url_ok"),
    ).orderBy("doc_id")


_NOW_MS = 1704240000000  # 2024-01-03T00:00:00Z, after every events.ts


def _q_page_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.round(
            scoring.page_score(
                F.col("user_id"), F.unix_millis(F.col("ts").cast("timestamp")), _NOW_MS
            ),
            9,
        ).alias("score"),
        F.round(scoring.shares_score(F.col("user_id")), 9).alias("shares_score"),
    ).orderBy("event_id")


# ---- dedup suite (operators/dedup.py) -----------------------------------


def _q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = dedup.augment_corpus(load_table(spark, sf_dir, "documents"))
    return dedup.exact_dedup(corpus)


def _q_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = dedup.augment_corpus(load_table(spark, sf_dir, "documents"))
    return dedup.lsh_pairs(corpus)


def _q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = dedup.augment_corpus(load_table(spark, sf_dir, "documents"))
    return dedup.simhash_pairs(corpus)


def _q_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = dedup.augment_corpus(load_table(spark, sf_dir, "documents"))
    return dedup.duplicate_clusters(spark, corpus)


# ---- similarity search (operators/similarity.py) -------------------------


def _q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.cosine_topk(load_table(spark, sf_dir, "embeddings"))


def _q_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.ann_topk(load_table(spark, sf_dir, "embeddings"))


def _q_embedding_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.embedding_near_dups(load_table(spark, sf_dir, "embeddings"))


# ---- text analysis (functions/text.py) -----------------------------------


def _q_text_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        text.token_count("text").cast("int").alias("n_tokens"),
        text.quality_score("text").alias("quality"),
        text.lang_id("text").alias("lang_pred"),
        text.fingerprint("text").alias("fingerprint"),
    ).orderBy("doc_id")


_TEXT_ANALYSIS_SQL = f"""
    SELECT doc_id,
           CAST(len({text.tokenize_sql("text")}) AS INT) AS n_tokens,
           {text.quality_score_sql("text")} AS quality,
           {text.lang_id_sql("text")} AS lang_pred,
           {text.fingerprint_sql("text")} AS fingerprint
    FROM documents ORDER BY doc_id
"""


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "top_terms_per_source": _q_top_terms,
    "spans_stats": _q_spans_stats,
    "url_layer": _q_url_layer,
    "page_score": _q_page_score,
    "dedup_exact": _q_dedup_exact,
    "minhash_lsh_pairs": _q_minhash_lsh,
    "simhash_pairs": _q_simhash,
    "duplicate_clusters": _q_dup_clusters,
    "cosine_topk": _q_cosine_topk,
    "ann_topk": _q_ann_topk,
    "embedding_near_dups": _q_embedding_near_dups,
    "text_analysis": _q_text_analysis,
    "rolling_top_events": lambda s, d: trending.rolling_top_events(
        load_table(s, d, "events")
    ),
    "contributor_counts": lambda s, d: trending.contributor_counts(
        load_table(s, d, "events")
    ),
    "idf_windows": lambda s, d: trending.idf_windows(load_table(s, d, "events")),
    "detect_events": lambda s, d: trending.detect_events(load_table(s, d, "events")),
    "media_pipeline": lambda s, d: multimodal.media_pipeline(
        build_spans(load_table(s, d, "documents"))
    ),
}

ORACLES: dict[str, str] = {
    "top_terms_per_source": f"""
        WITH toks AS (
            SELECT source,
                   unnest(list_filter({_TOKS_SQL},
                          t -> NOT list_contains({_STOPLIST_SQL}, t))) AS term
            FROM documents
        ), counts AS (
            SELECT source, term, count(*) AS term_count
            FROM toks GROUP BY source, term
        )
        SELECT source, term, term_count, rank FROM (
            SELECT source, term, term_count,
                   CAST(row_number() OVER (PARTITION BY source
                        ORDER BY term_count DESC, term ASC) AS INT) AS rank
            FROM counts
        ) WHERE rank <= 10
        ORDER BY source, rank
    """,
    "spans_stats": spans_stats_oracle_sql(),
    "url_layer": f"""
        WITH u AS (SELECT doc_id, {_SYNTH_URL_SQL} AS url FROM documents)
        SELECT doc_id, url,
               {urls.canonicalize_url_sql("url")} AS canonical_url,
               {urls.url_host_sql("url")} AS host,
               {urls.route_sql("url")} AS route,
               {urls.platform_media_id_sql("url")[0]} AS platform,
               {urls.platform_media_id_sql("url")[1]} AS media_id,
               (length(url) <= {urls.MAX_URL_LENGTH}) AS url_ok
        FROM u ORDER BY doc_id
    """,
    "page_score": f"""
        SELECT event_id,
               round({scoring.page_score_sql("user_id", "epoch_ms(ts)", _NOW_MS)}, 9) AS score,
               round({scoring.shares_score_sql("user_id")}, 9) AS shares_score
        FROM events ORDER BY event_id
    """,
    "dedup_exact": dedup.exact_dedup_sql(),
    "minhash_lsh_pairs": dedup.lsh_pairs_sql(),
    "simhash_pairs": dedup.simhash_pairs_sql(),
    "duplicate_clusters": dedup.duplicate_clusters_sql(),
    "cosine_topk": similarity.cosine_topk_sql(),
    "ann_topk": similarity.ann_topk_sql(),
    "embedding_near_dups": similarity.embedding_near_dups_sql(),
    "text_analysis": _TEXT_ANALYSIS_SQL,
    "rolling_top_events": trending.rolling_top_events_sql(),
    "contributor_counts": trending.contributor_counts_sql(),
    "idf_windows": trending.idf_windows_sql(),
    "detect_events": trending.detect_events_sql(),
    "media_pipeline": multimodal.media_pipeline_sql(),
}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
