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
from mklab_focused_crawler_spark.functions.text import (
    STOPWORDS,
    TOKEN_SPLIT_RE,
)
from mklab_focused_crawler_spark.sources.tables import load_table

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


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "top_terms_per_source": _q_top_terms,
    "spans_stats": _q_spans_stats,
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
}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
