"""Deterministic dataset mixing: per-source hash-based sampling rates —
the mixture-weights step of a training-data pipeline (cf. the public
Pile / C4 / Gopher data recipes: each source contributes a tuned
fraction of documents).

A document is kept iff ``hash64(doc_id) % 1e6 < rate_ppm(source)``.
Properties that matter at 100 TB:

- **One narrow pass, zero shuffles** — the mixture is a filter, not a
  groupBy-sample; no sampleBy() RDD machinery, no per-source scans.
- **Decision stability** — the draw is a pure function of the row key,
  so growing the corpus (or re-running after a crash) never re-samples
  previously kept/dropped documents; incremental ingestion keeps the
  mixture consistent across runs.
- **Exact cross-engine determinism** — the draw uses the portable
  60-bit md5 hash (functions/hashing.py) and integer comparison; the
  DuckDB twin reproduces every decision bit-for-bit.

Rates are parts-per-million integers (never float fractions — a float
rate times 1e6 could round differently across engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import hash64, hash64_sql

PPM = 1_000_000
# default mixture over the synthetic corpus's sources: deterministic,
# non-uniform (srcN is kept at (N+1)*45000 ppm = 4.5%..90%) so the
# sampled output exercises every rate band; unknown sources fall back
# to DEFAULT_RATE_PPM
DEFAULT_RATES: dict[str, int] = {f"src{i}": (i + 1) * 45_000 for i in range(20)}
DEFAULT_RATE_PPM = 100_000


def _draw(doc_id_col) -> F.Column:
    # hash the DECIMAL string form of the id (cross-engine canonical);
    # 60-bit non-negative, so % PPM is exact in both engines
    return F.pmod(hash64(doc_id_col.cast("string")), F.lit(PPM))


def dataset_mix(
    documents: DataFrame,
    rates: dict[str, int] | None = None,
    default_ppm: int = DEFAULT_RATE_PPM,
) -> DataFrame:
    """(doc_id, source, sample_key) — the sampled subset under the
    per-source ppm mixture. ``sample_key`` (the draw) is exposed so a
    downstream pass can subsample further WITHOUT re-hashing: keeping
    ``sample_key < r'`` for any r' < r is a consistent sub-mixture."""
    rates = DEFAULT_RATES if rates is None else rates
    rate = F.lit(default_ppm)
    for src, ppm in sorted(rates.items()):
        rate = F.when(F.col("source") == src, F.lit(int(ppm))).otherwise(rate)
    return (
        documents.select(
            "doc_id", "source", _draw(F.col("doc_id")).alias("sample_key")
        )
        .filter(F.col("sample_key") < rate)
    )


DOMAIN_QUOTA = 15
# stage-1 salt fan-out: bounds the per-task sort at corpus/(S*sources)
# rows and the survivor frame at S*quota rows per source
QUOTA_SALT = 8


def hashed_docs(documents: DataFrame) -> DataFrame:
    """(doc_id, source, h) — the shared projection both the batch quota
    and its streaming fold rank on; one definition so the draw and the
    tie-break can never drift between the two (their parity is pinned
    by test_streaming_domain_quota_matches_batch)."""
    return documents.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "source",
        hash64(F.col("doc_id").cast("string")).alias("h"),
    )


def quota_candidates(hashed: DataFrame, quota: int = DOMAIN_QUOTA) -> DataFrame:
    """Stage-1 salted partial top-k over a ``hashed_docs`` frame:
    ≤ QUOTA_SALT·quota rows per source, an exact superset of the true
    per-source top-quota (each salt lane keeps its own top-quota), with
    S× the parallelism of a plain PARTITION BY source sort."""
    from pyspark.sql import Window

    w = Window.partitionBy("source", F.pmod(F.col("h"), F.lit(QUOTA_SALT))).orderBy(
        "h", "doc_id"
    )
    return (
        hashed.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= quota)
        .drop("rn")
    )


def domain_quota(documents: DataFrame, quota: int = DOMAIN_QUOTA) -> DataFrame:
    """(doc_id, source, kept) — cap each source at ``quota`` documents,
    chosen by deterministic hash priority (the per-domain cap of public
    crawl recipes: no single host/domain dominates the training mix).

    kept == (row_number over (source) ordered by (h, doc_id)) <= quota,
    computed WITHOUT a per-source window: a handful of hot sources make
    `PARTITION BY source` the classic skewed low-parallelism sort at
    100 TB (parallelism = #sources, one task sorts the hottest domain).
    Instead:

    1. salted partial top-k — window over (source, pmod(h, S)): S× the
       parallelism, each task sorts 1/S of a source, keeps ``quota``;
    2. exact threshold — the quota-th smallest (h, doc_id) per source
       over the ≤ S·quota survivors (tiny);
    3. one broadcast join back onto (doc_id, source, h) decides every
       row: kept iff (h, doc_id) <= threshold, sources with < quota
       docs have no threshold row ⇒ all kept.

    The corpus is never globally sorted and never shuffled on the skew
    key alone; text is projected away before any exchange. The draw
    reuses the portable 60-bit hash so the DuckDB twin (a plain
    windowed row_number) reproduces every decision bit-for-bit.
    """
    from pyspark.sql import Window

    d = hashed_docs(documents)
    survivors = quota_candidates(d, quota)
    w2 = Window.partitionBy("source").orderBy("h", "doc_id")
    thresholds = (
        survivors.withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") == quota)
        .select(
            # renamed: the frame derives from d, so joining back on a
            # same-named column trips the ambiguous-self-join check
            F.col("source").alias("th_src"),
            F.col("h").alias("th_h"),
            F.col("doc_id").alias("th_id"),
        )
    )
    # null-safe on source: the windows group NULL sources as one
    # partition (both engines), so the decision join must match them
    # too — a plain equi-join would leave every null-source doc
    # thresholdless (kept) while the oracle's rank caps them
    return d.join(
        F.broadcast(thresholds),
        F.col("source").eqNullSafe(F.col("th_src")),
        "left",
    ).select(
        "doc_id",
        "source",
        (
            F.col("th_h").isNull()
            | (F.col("h") < F.col("th_h"))
            | ((F.col("h") == F.col("th_h")) & (F.col("doc_id") <= F.col("th_id")))
        ).alias("kept"),
    )


def domain_quota_sql(quota: int = DOMAIN_QUOTA, table: str = "documents") -> str:
    """DuckDB twin: the skew-free three-stage plan is exactly a
    windowed row_number at oracle scale."""
    h = hash64_sql("CAST(doc_id AS VARCHAR)")
    return f"""
        SELECT doc_id, source, (rn <= {quota}) AS kept FROM (
            SELECT doc_id, source,
                   row_number() OVER (PARTITION BY source
                                      ORDER BY {h}, doc_id) AS rn
            FROM {table}
        ) ORDER BY doc_id
    """


def dataset_mix_sql(
    rates: dict[str, int] | None = None,
    default_ppm: int = DEFAULT_RATE_PPM,
    table: str = "documents",
) -> str:
    rates = DEFAULT_RATES if rates is None else rates
    whens = " ".join(
        f"WHEN '{src}' THEN {int(ppm)}" for src, ppm in sorted(rates.items())
    )
    draw = f"{hash64_sql('CAST(doc_id AS VARCHAR)')} % {PPM}"
    return f"""
        SELECT doc_id, source, sample_key FROM (
            SELECT doc_id, source, {draw} AS sample_key,
                   CASE source {whens} ELSE {default_ppm} END AS rate_ppm
            FROM {table}
        ) WHERE sample_key < rate_ppm
        ORDER BY doc_id
    """


N_SHARDS = 16


def shard_shuffle(documents: DataFrame, n_shards: int = N_SHARDS) -> DataFrame:
    """(doc_id, shard_id, pos) — deterministic global shuffle into
    ``n_shards`` training-output shards: the write-side step of a data
    pipeline (a training run wants pseudo-random document order and
    fixed shard files, reproducibly).

    The shuffle IS the hash: shard = pmod(h, n_shards), within-shard
    position = rank of (h, doc_id). No global sort ever happens — at
    100 TB this is ONE hash exchange on shard_id (shards are
    hash-balanced, so no skewed reducer) followed by independent
    per-shard sorts; pick n_shards so a shard's ids sort in one task
    (the payload never moves here — this manifest is joined back or
    the production writer uses repartition(shard).sortWithinPartitions
    with the same keys). Re-running on a grown corpus re-shuffles (h
    is corpus-independent per doc, but positions shift) — shards are a
    WRITE artifact, not incremental state.

    The draw reuses the portable 60-bit hash with a domain-separation
    prefix ("shard:") so shard assignment is independent of
    dataset_mix's sample draw; DuckDB reproduces every bit.
    """
    d = documents.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        hash64(F.concat(F.lit("shard:"), F.col("doc_id").cast("string"))).alias(
            "h"
        ),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("shard_id").orderBy("h", "doc_id")
    return (
        d.withColumn("shard_id", F.pmod(F.col("h"), F.lit(n_shards)).cast("int"))
        .withColumn("pos", F.row_number().over(w))
        .select("doc_id", "shard_id", "pos")
    )


def shard_shuffle_sql(n_shards: int = N_SHARDS, table: str = "documents") -> str:
    h = hash64_sql("'shard:' || CAST(doc_id AS VARCHAR)")
    return f"""
        SELECT doc_id, shard_id,
               CAST(row_number() OVER (PARTITION BY shard_id
                    ORDER BY h, doc_id) AS INT) AS pos
        FROM (
            SELECT doc_id, {h} AS h,
                   CAST({h} % {n_shards} AS INT) AS shard_id
            FROM {table}
        ) ORDER BY doc_id
    """
