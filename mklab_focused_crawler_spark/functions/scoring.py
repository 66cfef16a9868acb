"""Frontier/page/media scoring formulas.

Exact re-expression of the reference's score math as column arithmetic:

- RankerBolt.java:78-92 (web pages):
    sharesScore  = (1 - exp(-0.05 * shares) + 1) / 2
    pubTimeScore = (exp(-(now - publicationTime) / avgTimeDiff) + 1) / 2
    score        = sharesScore * pubTimeScore
  with avgTimeDiff = 10 min in ms (RankerBolt.java:30) and
  publicationTime = 0 when date is null (RankerBolt.java:81).
- MediaRankerBolt.java:38-50 / ItemsRankerBolt.java:39-51: sharesScore
  alone.

Determinism: the reference reads System.currentTimeMillis() per tuple —
nondeterministic. We take ``now_ms`` as an explicit parameter (one value
per batch/iteration) so runs are replayable and oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

AVG_TIME_DIFF_MS = 10 * 60 * 1000  # RankerBolt.java:30


def shares_score(shares: Column) -> Column:
    return (F.lit(1.0) - F.exp(F.lit(-0.05) * shares) + F.lit(1.0)) / F.lit(2.0)


def shares_score_sql(expr: str) -> str:
    return f"(1.0 - exp(-0.05 * {expr}) + 1.0) / 2.0"


def pubtime_score(pub_ms: Column, now_ms: int) -> Column:
    pub = F.coalesce(pub_ms, F.lit(0)).cast("double")
    return (
        F.exp(-(F.lit(float(now_ms)) - pub) / F.lit(float(AVG_TIME_DIFF_MS)))
        + F.lit(1.0)
    ) / F.lit(2.0)


def pubtime_score_sql(expr: str, now_ms: int) -> str:
    return (
        f"(exp(-({float(now_ms)} - CAST(coalesce({expr}, 0) AS DOUBLE)) / "
        f"{float(AVG_TIME_DIFF_MS)}) + 1.0) / 2.0"
    )


def page_score(shares: Column, pub_ms: Column, now_ms: int) -> Column:
    """RankerBolt getScore — the crawl-order definition."""
    return shares_score(shares) * pubtime_score(pub_ms, now_ms)


def page_score_sql(shares_expr: str, pub_expr: str, now_ms: int) -> str:
    return f"({shares_score_sql(shares_expr)}) * ({pubtime_score_sql(pub_expr, now_ms)})"
