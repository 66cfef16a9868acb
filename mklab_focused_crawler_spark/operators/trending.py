"""Windowed term statistics + rolling-count trending (event detection).

Reference parity (SURVEY §2.10):
- ``Vocabulary.java:36-107`` — per-window term df, ``getDf = df/N``,
  ``getIdf = log10(N/df)``, ``getShift(prev) = (idf_prev-idf_cur)/idf_cur``.
- ``EventDetectionBolt.java:103-141`` — tumbling windows (5 × 60 s as
  wired in SocialMediaMonitor.java:110); a term is a candidate event iff
  (a) present in all of the last 5 windows, (b) its idf is ≤ every
  previous window's idf (monotone df growth), (c) its idf-shift ≥ every
  previous shift (accelerating).
- ``ItemsCounterBolt.java:61-88`` / ``MediaCounterBolt.java:66-106`` —
  rolling tag/contributor/domain counters flushed per period, top-k via
  ``BoundedPQueue`` (utils/BoundedPQueue.java:28-47).

Spark shape: ``groupBy(window(ts, W), term)`` + sequence window
functions (``lag``/``min``/``max`` over *window-index* frames) — pure
SQL, no custom state, exactly the translation SURVEY §2.10 prescribes.
The reference's sleep-loop flusher threads disappear: a window IS a
group key.

Determinism note: condition (b) compares idf values. idf = log10(N/df)
is monotone in N/df, so the engine compares the exact integer cross
products ``N_cur·df_prev ≤ N_prev·df_cur`` instead of floating log10
outputs — no ulp-boundary flips between JVM and DuckDB. Shift values
are reported rounded; condition (c) compares shifts via the same
integer-ratio trick on (N/df) ratios.

Scale: one shuffle on (window, term) with map-side partial counts; the
window-sequence pass shuffles on term only. Head terms are absorbed by
partial aggregation; window count is bounded (time), so no skew issue.

The fixture mapping: events(event_id, ts, user_id, event_type) — the
"term" is event_type, the "document" is the event, contributors are
user_id (ItemsCounterBolt's mContributorsMap keys on user ids,
bolts/metrics/ItemsCounterBolt.java:80).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.scoring import det_log10_ratio, det_log10_ratio_sql

TOP_K = 3
COUNT_WINDOW = "10 minutes"
COUNT_WINDOW_MS = 10 * 60 * 1000
EVENT_WINDOW = "1 hour"
EVENT_WINDOW_MS = 60 * 60 * 1000
N_WINDOWS = 5  # EventDetectionBolt: candidate must span 5 windows


def _win_start_ms(ts_col, dur: str) -> F.Column:
    """Tumbling-window start in epoch ms via the native window().
    The parquet ts is TIMESTAMP_NTZ; unix_millis needs TIMESTAMP."""
    return F.unix_millis(F.window(ts_col, dur)["start"].cast("timestamp"))


def _win_start_ms_sql(ts_expr: str, ms: int) -> str:
    return f"(epoch_ms({ts_expr}) // {ms}) * {ms}"


# ---------------------------------------------------------------------------
# rolling top-k counts (ItemsCounterBolt + BoundedPQueue)
# ---------------------------------------------------------------------------


def rolling_top_events(events: DataFrame, k: int = TOP_K) -> DataFrame:
    """Top-k event types per tumbling 10-minute window."""
    counts = events.groupBy(
        _win_start_ms(F.col("ts"), COUNT_WINDOW).alias("window_start_ms"),
        "event_type",
    ).agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("window_start_ms").orderBy(
        F.desc("cnt"), F.asc("event_type")
    )
    return (
        counts.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
    )


def rolling_top_events_sql(k: int = TOP_K) -> str:
    ws = _win_start_ms_sql("ts", COUNT_WINDOW_MS)
    return f"""
        WITH counts AS (
            SELECT {ws} AS window_start_ms, event_type, count(*) AS cnt
            FROM events GROUP BY 1, 2
        )
        SELECT window_start_ms, event_type, cnt, rank FROM (
            SELECT *, CAST(row_number() OVER (PARTITION BY window_start_ms
                        ORDER BY cnt DESC, event_type ASC) AS INT) AS rank
            FROM counts
        ) WHERE rank <= {k}
        ORDER BY window_start_ms, rank
    """


# ---------------------------------------------------------------------------
# per-domain media counters (MediaCounterBolt.java:71-82: counts grouped
# by new URL(url).getHost() per flush period, top-k via BoundedPQueue)
# ---------------------------------------------------------------------------


def domain_counts(events_urls: DataFrame, k: int = TOP_K) -> DataFrame:
    """Top-k media domains per tumbling 10-minute window. Input carries
    (ts, url); the domain is the URL host (MediaCounterBolt extracts
    ``new URL(mediaUrl).getHost()``). One shuffle on (window, domain)
    with map-side partial counts; the per-window top-k window runs over
    the already-aggregated counts (bounded by distinct domains)."""
    from ..functions.urls import url_host

    counts = events_urls.groupBy(
        _win_start_ms(F.col("ts"), COUNT_WINDOW).alias("window_start_ms"),
        url_host("url").alias("domain"),
    ).agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("window_start_ms").orderBy(
        F.desc("cnt"), F.asc("domain")
    )
    return (
        counts.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
    )


def domain_counts_sql(url_expr: str, k: int = TOP_K) -> str:
    from ..functions.urls import url_host_sql

    ws = _win_start_ms_sql("ts", COUNT_WINDOW_MS)
    return f"""
        WITH u AS (SELECT ts, {url_expr} AS url FROM events),
        counts AS (
            SELECT {ws} AS window_start_ms, {url_host_sql("url")} AS domain,
                   count(*) AS cnt
            FROM u GROUP BY 1, 2
        )
        SELECT window_start_ms, domain, cnt, rank FROM (
            SELECT *, CAST(row_number() OVER (PARTITION BY window_start_ms
                        ORDER BY cnt DESC, domain ASC) AS INT) AS rank
            FROM counts
        ) WHERE rank <= {k}
        ORDER BY window_start_ms, rank
    """


# ---------------------------------------------------------------------------
# contributor counters (ItemsCounterBolt rolling $inc maps)
# ---------------------------------------------------------------------------


def contributor_counts(events: DataFrame) -> DataFrame:
    """Per-window per-contributor activity: count + value sum (the
    reference's in-memory HashMap flushed as Mongo $inc, expressed as a
    plain windowed aggregate)."""
    return (
        events.groupBy(
            _win_start_ms(F.col("ts"), EVENT_WINDOW).alias("window_start_ms"),
            "user_id",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # sum recovered integer micros, divide once: double summation
            # order differs between Spark's partial/merge aggregation and
            # DuckDB's scan order, so round(sum(double),6) can flip at a
            # rounding boundary; integer sums are order-independent and
            # the final /1e6 is one correctly-rounded IEEE division.
            # 10^6 scale (not 10^2): preserves the old round(sum,6)'s 6dp
            # semantics for any sub-cent data while staying lossless on
            # the 2dp generator values (identical exact rationals divide
            # to identical doubles); per-row micros ≤ ~1e9 so int64 sums
            # are safe to ~10^9 rows per group
            (
                F.sum(F.round(F.col("value") * 1000000).cast("long")).cast("double")
                / 1000000.0
            ).alias("value_sum"),
        )
    )


def contributor_counts_sql() -> str:
    ws = _win_start_ms_sql("ts", EVENT_WINDOW_MS)
    return f"""
        SELECT {ws} AS window_start_ms, user_id,
               count(*) AS n_events,
               CAST(sum(CAST(round(value * 1000000) AS BIGINT)) AS DOUBLE) / 1000000
                   AS value_sum
        FROM events GROUP BY 1, 2
        ORDER BY window_start_ms, user_id
    """


# ---------------------------------------------------------------------------
# idf / shift window table (Vocabulary)
# ---------------------------------------------------------------------------


def idf_windows(events: DataFrame) -> DataFrame:
    """(window_idx, term, df, n_docs, idf, shift): the Vocabulary +
    Snapshots ring buffer as a table. window_idx = epoch//W — integer
    index so sequence frames can check adjacency."""
    base = events.select(
        (F.unix_millis(F.col("ts").cast("timestamp")) / EVENT_WINDOW_MS)
        .cast("long")
        .alias("window_idx"),
        F.col("event_type").alias("term"),
    )
    df_t = base.groupBy("window_idx", "term").agg(F.count(F.lit(1)).alias("df"))
    totals = base.groupBy("window_idx").agg(F.count(F.lit(1)).alias("n_docs"))
    joined = df_t.join(totals, "window_idx")
    # det_log10_ratio, not F.log10: the shift column DIVIDES BY idf and
    # both are hash-compared at 9dp — per CLAUDE.md, raw libm log10
    # doubles must never be compared across engines
    idf = det_log10_ratio(F.col("n_docs"), F.col("df"))
    w = Window.partitionBy("term").orderBy("window_idx")
    out = joined.withColumn("idf", idf).withColumn(
        "prev_idf", F.lag("idf").over(w)
    ).withColumn("prev_window", F.lag("window_idx").over(w))
    shift = F.when(
        (F.col("prev_window") == F.col("window_idx") - 1) & (F.col("idf") != 0),
        (F.col("prev_idf") - F.col("idf")) / F.col("idf"),
    )
    return out.select(
        "window_idx",
        "term",
        "df",
        "n_docs",
        F.round("idf", 9).alias("idf"),
        F.round(shift, 9).alias("shift"),
    )


def idf_windows_sql() -> str:
    return f"""
        WITH base AS (
            SELECT epoch_ms(ts) // {EVENT_WINDOW_MS} AS window_idx,
                   event_type AS term
            FROM events
        ),
        df_t AS (
            SELECT window_idx, term, count(*) AS df FROM base GROUP BY 1, 2
        ),
        totals AS (
            SELECT window_idx, count(*) AS n_docs FROM base GROUP BY 1
        ),
        j AS (
            SELECT d.window_idx, d.term, d.df, t.n_docs,
                   {det_log10_ratio_sql("t.n_docs", "d.df")} AS idf
            FROM df_t d JOIN totals t USING (window_idx)
        ),
        seq AS (
            SELECT *,
                   lag(idf) OVER (PARTITION BY term ORDER BY window_idx) AS prev_idf,
                   lag(window_idx) OVER (PARTITION BY term ORDER BY window_idx) AS prev_window
            FROM j
        )
        SELECT window_idx, term, df, n_docs, round(idf, 9) AS idf,
               round(CASE WHEN prev_window = window_idx - 1 AND idf <> 0
                     THEN (prev_idf - idf) / idf END, 9) AS shift
        FROM seq ORDER BY window_idx, term
    """


# ---------------------------------------------------------------------------
# event detection (EventDetectionBolt conditions a/b/c)
# ---------------------------------------------------------------------------


def detect_events(events: DataFrame) -> DataFrame:
    """Candidate (window_idx, term) pairs per EventDetectionBolt.java:
    103-141. Monotone-idf checks use integer cross products of (n_docs,
    df) — log10 never enters a comparison."""
    base = events.select(
        (F.unix_millis(F.col("ts").cast("timestamp")) / EVENT_WINDOW_MS)
        .cast("long")
        .alias("window_idx"),
        F.col("event_type").alias("term"),
    )
    df_t = base.groupBy("window_idx", "term").agg(F.count(F.lit(1)).alias("df"))
    totals = base.groupBy("window_idx").agg(F.count(F.lit(1)).alias("n_docs"))
    # idf is a deterministic function of THIS row's (n_docs, df): evaluate
    # the det_log10_ratio Horner tree exactly ONCE per (window, term) row
    # and lag the resulting column. Round 2 expanded the degree-11 tree at
    # every lag depth (5 trees/row), which blew past the codegen threshold
    # and fell back to interpreted evaluation — 3.7× slower (VERDICT r2).
    # lag(idf) is bit-identical to recomputing idf from lagged (n, df).
    j = df_t.join(totals, "window_idx").withColumn(
        "_idf_0", det_log10_ratio(F.col("n_docs"), F.col("df"))
    )

    w = Window.partitionBy("term").orderBy("window_idx")
    # r = N/df as an exact rational (n_docs, df); idf monotone in r.
    cur = j
    for i in range(1, N_WINDOWS):
        cur = (
            cur.withColumn(f"df_{i}", F.lag("df", i).over(w))
            .withColumn(f"n_{i}", F.lag("n_docs", i).over(w))
            .withColumn(f"w_{i}", F.lag("window_idx", i).over(w))
            .withColumn(f"_idf_{i}", F.lag("_idf_0", i).over(w))
        )
    # (a) present in the 4 immediately-preceding windows (consecutive)
    present = F.lit(True)
    for i in range(1, N_WINDOWS):
        present = present & (F.col(f"w_{i}") == F.col("window_idx") - i)
    # (b) idf_cur <= idf_{w-i} ∀i  ⇔  n_cur*df_i <= n_i*df_cur
    monotone = F.lit(True)
    for i in range(1, N_WINDOWS):
        monotone = monotone & (
            F.col("n_docs") * F.col(f"df_{i}") <= F.col(f"n_{i}") * F.col("df")
        )
    # (c) shift accelerating: shift(w) >= shift(w-i) for i=1..3 where
    # shift(w) = (idf_{w-1}-idf_w)/idf_w. idf values come from
    # det_log10_ratio (NOT libm F.log10): the shifts divide by idf and
    # feed cross-engine >= comparisons and a 9dp hash-compared column —
    # with libm, a 1-ulp JVM-vs-DuckDB log10 skew landing on a rounding
    # boundary flips the predicate (CLAUDE.md: never compare raw
    # log/exp doubles across engines). det values are bit-identical, so
    # every downstream +,-,/ and round is too. _idf_{1..4} are lags of
    # _idf_0 (computed once per row above), not re-expanded trees.
    def idf_at(i: int) -> F.Column:
        return F.col(f"_idf_{i}")

    def shift_at(i: int) -> F.Column:  # shift of window w-i
        return F.round(
            F.when(idf_at(i) != 0, (idf_at(i + 1) - idf_at(i)) / idf_at(i)), 9
        )

    accel = F.lit(True)
    for i in range(1, N_WINDOWS - 1):
        accel = accel & (shift_at(0) >= shift_at(i))

    return (
        cur.withColumn("is_candidate", present & monotone & accel)
        .filter(F.col("is_candidate"))
        .select(
            "window_idx",
            "term",
            "df",
            "n_docs",
            F.round(F.col("_idf_0"), 9).alias("idf"),
            shift_at(0).alias("shift"),
        )
    )


def detect_events_sql() -> str:
    lags = []
    for i in range(1, N_WINDOWS):
        lags.append(
            f"lag(df, {i}) OVER (PARTITION BY term ORDER BY window_idx) AS df_{i},"
            f" lag(n_docs, {i}) OVER (PARTITION BY term ORDER BY window_idx) AS n_{i},"
            f" lag(window_idx, {i}) OVER (PARTITION BY term ORDER BY window_idx) AS w_{i},"
            f" lag(idf_0, {i}) OVER (PARTITION BY term ORDER BY window_idx) AS idf_{i}"
        )
    present = " AND ".join(
        f"w_{i} = window_idx - {i}" for i in range(1, N_WINDOWS)
    )
    monotone = " AND ".join(
        f"n_docs * df_{i} <= n_{i} * df" for i in range(1, N_WINDOWS)
    )

    # idf_0 is computed ONCE per (window, term) row in j (one ~10KB
    # deterministic-log expansion total) and LAGGED to idf_{1..4} — same
    # values, same bits, no per-depth tree re-expansion; mirrors the
    # Spark side's lag("_idf_0", i) exactly
    def shift_at(i: int) -> str:
        return (
            f"round(CASE WHEN idf_{i} <> 0 "
            f"THEN (idf_{i + 1} - idf_{i}) / idf_{i} END, 9)"
        )

    accel = " AND ".join(
        f"{shift_at(0)} >= {shift_at(i)}" for i in range(1, N_WINDOWS - 1)
    )
    return f"""
        WITH base AS (
            SELECT epoch_ms(ts) // {EVENT_WINDOW_MS} AS window_idx,
                   event_type AS term
            FROM events
        ),
        df_t AS (SELECT window_idx, term, count(*) AS df FROM base GROUP BY 1, 2),
        totals AS (SELECT window_idx, count(*) AS n_docs FROM base GROUP BY 1),
        j AS (SELECT d.*, t.n_docs,
                     {det_log10_ratio_sql("t.n_docs", "d.df")} AS idf_0
              FROM df_t d JOIN totals t USING (window_idx)),
        seq AS (SELECT *, {", ".join(lags)} FROM j)
        SELECT window_idx, term, df, n_docs,
               round(idf_0, 9) AS idf,
               {shift_at(0)} AS shift
        FROM seq
        WHERE ({present}) AND ({monotone}) AND ({accel})
        ORDER BY window_idx, term
    """
