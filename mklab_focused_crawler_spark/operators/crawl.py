"""The batch-iterative crawl loop: claim → expand → seen-gate → fetch →
extract → discover → commit.

This is the Spark-native re-expression of the reference's whole
`FocusedCrawler` topology (FocusedCrawler.java:140-167): instead of an
always-on Storm graph pushing tuples through queues, each iteration is
one deterministic BSP super-step over snapshot-committed tables
(SURVEY §7 design stance). One iteration =

1. **claim**    — politeness-budgeted per-host top-k off the frontier
                  (operators/frontier.py; RankerBolt order semantics).
2. **expand**   — redirect-chain resolution, ≤4 hops
                  (URLExpansionBolt.java:30,110-134).
3. **fetch**    — equi-join against the page store (the synthetic web
                  stands in for HTTP; WebPageFetcherBolt.java). MIME
                  gate text/html (WebPageFetcherBolt.java:215-222).
4. **extract**  — vectorized boilerpipe-style span extraction
                  (operators/extraction.py; ArticleExtractionBolt).
5. **discover** — out-links → canonicalize → Bloom-pruned seen gate
                  (operators/seen.py; StatusCheckBolt first-seen-wins)
                  → batch dedup → score (RankerBolt formula) → schedule.
6. **commit**   — documents/seen/frontier/metrics snapshot commits
                  (storage/snapshot.py). Resume = re-read CURRENT.

Determinism: crawl order is the *defined* sort (score desc, url_hash
asc) per iteration — the reference's intended priority order minus its
thread races (SURVEY §3.4). ``now_ms`` is an explicit parameter.

Scale notes (10^10 frontier):
- The frontier is rewritten per iteration here (sandbox parquet); on a
  real cluster the table is Iceberg, partitioned by ``bucket``, and the
  claim/remainder split is a MERGE that touches only claimed partitions.
- Every join in the loop is keyed (url / url_hash / bucket); the pages
  store would be bucketed on url so fetch-join and redirect-joins are
  co-partitioned scans, not full shuffles.
- The seen gate never materializes the seen set on the driver: Bloom
  prune + exact anti-join, both executor-side (operators/seen.py).
- Per-iteration metrics carry per-partition lineage rows so a skewed or
  failed partition is attributable (north_rule lineage requirement).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import scoring
from ..functions.urls import canonicalize_url, url_host, url_path
from ..sources.synthetic_web import (
    BASE_MS,
    generate_pages,
    generate_robots,
    generate_seeds,
)
from ..storage.snapshot import SnapshotTable
from .extraction import extract_articles
from .frontier import claim_batch, expand_redirects
from .seen import (
    build_bloom,
    filter_unseen,
    first_seen_wins,
    merge_bloom,
    with_seen_key,
)

DEFAULT_NOW_MS = BASE_MS + 86_400_000  # fixed "now": 2024-01-02T00:00:00Z
N_BUCKETS_DEFAULT = 32
# Below this bloom size the per-bucket filters are collected+broadcast so
# the seen-prune never shuffles candidates; above it (≈10^9+ seen keys)
# the cogroup-by-bucket path takes over. See operators/seen.filter_unseen.
BROADCAST_BLOOM_MAX_BYTES = 256 << 20
# Below this seen-set size a fresh per-iteration bloom build (one scan
# of a small table) is cheaper than maintaining the filter table
# incrementally; above it, rebuild cost grows with the seen set while
# merge cost stays proportional to the new-key batch — switch to
# merge_bloom + rebuild-on-doubling.
BLOOM_INCREMENTAL_MIN_KEYS = 2_000_000


def prepare_candidates(
    urls_df: DataFrame,
    pages_meta: DataFrame,
    now_ms: int,
    n_buckets: int,
    priority_col: str = "priority",
) -> DataFrame:
    """URL rows → frontier-shaped rows: canonical key, host/path, score.

    ``pages_meta`` (url, shares, pub_ms) plays the role of the social
    metadata that rides along with WebPages in the reference's JSON
    ingress (RankerBolt.java:78-92 scores each page by its own
    shares/date). Unknown URLs score with shares=0, pub_ms=null.
    """
    cand = with_seen_key(urls_df, "url", n_buckets)
    cand = first_seen_wins(
        cand.withColumn("priority", F.col(priority_col).cast("long"))
    )
    cand = cand.join(pages_meta, "url", "left")
    return cand.select(
        "url",
        "canonical_url",
        "url_hash",
        "bucket",
        url_host("url").alias("host"),
        url_path("url").alias("path"),
        scoring.page_score(
            F.coalesce(F.col("shares"), F.lit(0)), F.col("pub_ms"), now_ms
        ).alias("score"),
    )


def _partition_lineage(df: DataFrame, iteration: int, stage: str) -> DataFrame:
    return (
        df.groupBy(F.spark_partition_id().alias("partition_id"))
        .agg(F.count(F.lit(1)).alias("rows"))
        .select(
            F.lit(iteration).alias("iteration"),
            F.lit(stage).alias("stage"),
            "partition_id",
            "rows",
        )
    )


def _lineage_rows(df: DataFrame, iteration: int, stage: str) -> tuple[list, int]:
    """Collect the per-partition lineage rows once and derive the stage
    row count from them — one job instead of a count() plus a lineage
    aggregation."""
    rows = _partition_lineage(df, iteration, stage).collect()
    return rows, sum(r["rows"] for r in rows)


class CrawlLoop:
    """Owns the iteration control Spark lacks natively (SURVEY §7 hard
    part #5) and the snapshot tables: frontier, seen, documents,
    metrics."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        n_buckets: int = N_BUCKETS_DEFAULT,
        now_ms: int = DEFAULT_NOW_MS,
        use_bloom: bool = True,
        window_ms: int = 1000,
    ):
        self.spark = spark
        self.now_ms = now_ms
        self.n_buckets = n_buckets
        self.use_bloom = use_bloom
        self.window_ms = window_ms  # politeness window per super-step
        self.frontier = SnapshotTable(root, "frontier")
        self.seen = SnapshotTable(root, "seen")
        self.documents = SnapshotTable(root, "documents")
        self.metrics = SnapshotTable(root, "metrics")
        self.bloom = SnapshotTable(root, "bloom")
        self._n_seen: int | None = None  # tracked to size the bloom strategy
        # keys in the bloom at its last from-scratch build; when the
        # incrementally-merged key count doubles it, the filters are
        # rebuilt at the new size (FPR creep guard)
        self._bloom_built_keys: int | None = None

    # ------------------------------------------------------------------
    def init(self, seeds: DataFrame, pages_meta: DataFrame) -> None:
        """Seed the frontier; seeds are marked seen at injection
        (StatusCheckBolt semantics: mark when scheduled, not when
        fetched)."""
        cand = prepare_candidates(
            seeds.select("url", F.col("rank").alias("priority")),
            pages_meta,
            self.now_ms,
            self.n_buckets,
        )
        self.frontier.overwrite(cand)
        self.seen.overwrite(
            self.frontier.read(self.spark).select(
                "url_hash", "bucket", "canonical_url", F.lit(0).alias("first_seen_iter")
            )
        )
        self._n_seen = self.seen.read(self.spark).count()
        if self.use_bloom:
            self.bloom.overwrite(build_bloom(self.seen.read(self.spark)))
            self._bloom_built_keys = self._n_seen

    def completed_iterations(self) -> int:
        if not self.metrics.exists():
            return 0
        df = self.metrics.read(self.spark)
        row = df.agg(F.max("iteration")).collect()[0][0]
        return int(row) + 1 if row is not None else 0

    # ------------------------------------------------------------------
    def run_iteration(
        self,
        pages: DataFrame,
        robots: DataFrame,
        redirects: DataFrame,
        iteration: int,
    ) -> dict:
        frontier = self.frontier.read(self.spark)
        seen = self.seen.read(self.spark)

        # 1. claim (politeness + robots + deterministic priority)
        claimed, remaining = claim_batch(frontier, robots, self.window_ms)
        claimed = claimed.persist()
        claimed_lineage, n_claimed = _lineage_rows(claimed, iteration, "claimed")
        if n_claimed == 0:
            claimed.unpersist()
            return {"iteration": iteration, "claimed": 0, "done": True}

        # 2. redirect expansion (≤4 hops), re-canonicalize the final URL
        expanded = expand_redirects(claimed, redirects).withColumn(
            "final_url", canonicalize_url(F.col("expanded_url"))
        )

        # 3. fetch = INNER join of the (small, broadcastable) claimed
        # batch against the page store on the expanded URL. Inner, not
        # left: a left join forces the page store to the build/shuffle
        # side — sort-merge-shuffling the whole web (html included)
        # every iteration. Inner lets AQE broadcast the claimed side and
        # stream the page scan in place; "missing" fetches fall out of
        # the row-count arithmetic instead.
        fetched = expanded.join(
            pages.select(
                F.col("url").alias("expanded_url"), "mime", "html", "out_links"
            ),
            "expanded_url",
        ).persist()
        ok = fetched.filter(F.col("mime") == "text/html")
        reject_row = fetched.agg(
            F.count(F.lit(1)).alias("n_fetched"),
            F.sum((F.col("mime") != "text/html").cast("int")).alias("mime_rejected"),
        ).collect()[0]
        n_mime_rejected = int(reject_row["mime_rejected"] or 0)
        # claimed but not in the page store (dangling link / >300-char
        # redirect target dropped by expand_redirects)
        n_missing = n_claimed - int(reject_row["n_fetched"] or 0)

        # 4. extract spans; rejoin crawl metadata by the *source* url_hash
        # (unique per claimed row — two claims can share a final_url when
        # a redirect source and its target are claimed together, so
        # final_url is not a safe join key)
        ok = ok.withColumn("row_key", F.col("url_hash").cast("string"))
        docs = extract_articles(ok, id_col="row_key", html_col="html")
        doc_rows = (
            docs.withColumnRenamed("doc_id", "row_key")
            .join(
                ok.select(
                    "row_key",
                    F.col("final_url").alias("doc_id"),
                    F.col("canonical_url").alias("source_url"),
                    "host",
                    "score",
                    "crawl_order",
                ),
                "row_key",
            )
            .drop("row_key")
            .withColumn("iteration", F.lit(iteration))
        )

        # 5. discover out-links → seen gate → schedule
        links = (
            ok.select(F.explode("out_links").alias("url"), "crawl_order")
            .groupBy("url")
            .agg(F.min("crawl_order").alias("priority"))
        )
        cand = prepare_candidates(
            links, pages.select("url", "shares", "pub_ms"), self.now_ms, self.n_buckets
        )
        if self._n_seen is None:
            self._n_seen = seen.count()  # resume path: one-time recount
        bloom = None
        incremental = self._n_seen >= BLOOM_INCREMENTAL_MIN_KEYS
        if self.use_bloom and not incremental:
            # small seen set: fresh build is one cheap scan
            bloom = build_bloom(seen)
        elif self.use_bloom:
            # incremental: read the maintained filter table; a
            # from-scratch rebuild (full seen scan) happens only on
            # resume or when the key count has doubled since sizing
            if (
                not self.bloom.exists()
                or self._bloom_built_keys is None
                or self._n_seen > 2 * self._bloom_built_keys
            ):
                self.bloom.overwrite(build_bloom(seen))
                self._bloom_built_keys = self._n_seen
            bloom = self.bloom.read(self.spark)
        use_broadcast = (
            self._n_seen * 1.2 * 12 / 8  # keys → approx filter bytes
        ) <= BROADCAST_BLOOM_MAX_BYTES
        new_urls = filter_unseen(
            cand, seen, bloom, broadcast_bloom=use_broadcast
        ).persist()
        new_lineage, n_new = _lineage_rows(new_urls, iteration, "scheduled")
        self._n_seen += n_new

        # 6. commit (documents → seen → frontier → metrics; a crash
        # between commits re-runs the iteration from the frontier
        # snapshot — idempotent because the seen gate re-filters)
        self.documents.append(doc_rows)
        self.seen.append(
            new_urls.select(
                "url_hash",
                "bucket",
                "canonical_url",
                F.lit(iteration + 1).alias("first_seen_iter"),
            )
        )
        self.frontier.overwrite(remaining.unionByName(new_urls))
        if self.use_bloom and incremental:
            self.bloom.overwrite(merge_bloom(bloom, new_urls))
        self.metrics.append(
            self.spark.createDataFrame(
                claimed_lineage + new_lineage,
                "iteration int, stage string, partition_id int, rows long",
            )
        )

        claimed.unpersist()
        fetched.unpersist()
        new_urls.unpersist()
        return {
            "iteration": iteration,
            "claimed": n_claimed,
            "mime_rejected": n_mime_rejected,
            "fetch_missing": n_missing,
            "scheduled": n_new,
            "done": False,
        }

    # ------------------------------------------------------------------
    def run(
        self,
        pages: DataFrame,
        robots: DataFrame,
        max_iterations: int = 10,
        start_iteration: int = 0,
    ) -> list[dict]:
        redirects = (
            pages.filter(F.col("redirect_to").isNotNull())
            .select(
                F.col("url").alias("src_url"), F.col("redirect_to").alias("dst_url")
            )
            .persist()  # read 4x/iteration by the hop joins
        )
        stats = []
        for it in range(start_iteration, start_iteration + max_iterations):
            s = self.run_iteration(pages, robots, redirects, it)
            stats.append(s)
            if s.get("done"):
                break
        redirects.unpersist()
        return stats

    # ------------------------------------------------------------------
    def crawl_log(self) -> DataFrame:
        """The defined crawl order: (iteration asc, crawl_order asc) over
        fetched documents — the parity artifact golden tests compare."""
        return self.documents.read(self.spark).select(
            "iteration", "crawl_order", "source_url", "doc_id", "score"
        ).orderBy("iteration", "crawl_order")


def scaling_workload(
    spark: SparkSession,
    n_pages: int = 2_000_000,
    n_hosts: int = 100_000,
    n_seeds: int = 800_000,
    warmup_iters: int = 1,
    timed_iters: int = 2,
    repeats: int = 2,
    min_blocks: int = 10,
    mod_blocks: int = 7,
) -> dict:
    """The north_rule scaling protocol workload: a compute-dominated
    crawl (≈100k politeness-budgeted claims/iteration so the extraction
    and join stages, not job-scheduling latency, set the pace). Run
    identically at two parallelism levels; efficiency =
    (throughput_hi / throughput_lo) / (cores_hi / cores_lo).

    The timed window repeats ``repeats`` times (web generated once) and
    the best run is reported — standard best-of-N to reject ambient
    noise from co-tenants; URL counts are asserted identical across
    repeats (the workload is deterministic)."""
    import tempfile

    pages = generate_pages(spark, n_pages, n_hosts, min_blocks, mod_blocks).persist()
    pages.count()  # materialize the web outside every timed window
    robots = generate_robots(spark, n_hosts)
    seeds = generate_seeds(spark, n_pages, n_seeds, n_hosts)
    runs = []
    for _ in range(repeats):
        with tempfile.TemporaryDirectory(prefix="crawl_scale_") as root:
            loop = CrawlLoop(spark, root, window_ms=10_000)
            loop.init(seeds, pages.select("url", "shares", "pub_ms"))
            loop.run(pages, robots, max_iterations=warmup_iters)
            t0 = time.perf_counter()
            stats = loop.run(
                pages,
                robots,
                max_iterations=timed_iters,
                start_iteration=warmup_iters,
            )
            dt = time.perf_counter() - t0
            urls = sum(s.get("claimed", 0) + s.get("scheduled", 0) for s in stats)
            runs.append((dt, urls, stats))
    assert len({u for _, u, _ in runs}) == 1, "nondeterministic URL count"
    dt, urls, stats = min(runs, key=lambda r: r[0])
    pages.unpersist()
    return {
        "urls": urls,
        "seconds": round(dt, 2),
        "all_seconds": [round(r[0], 2) for r in runs],
        "urls_per_sec": round(urls / max(dt, 1e-9), 1),
        "iterations": [
            {k: v for k, v in s.items() if k != "done"} for s in stats
        ],
    }


def bench_crawl_iteration(
    spark: SparkSession,
    n_pages: int = 100_000,
    n_hosts: int = 500,
    n_seeds: int = 2000,
    iterations: int = 3,
) -> dict:
    """north_rule throughput probe: run politeness-budgeted iterations
    over a generated n_pages web, report (fetched+scheduled) URLs/sec.

    n_hosts sets the politeness ceiling (≤ MAX_PER_ROUTE per host per
    iteration); 500 hosts ≈ up to 5k claims/iteration — enough to expose
    engine overhead rather than the (intentional) politeness wait."""
    import tempfile

    pages = generate_pages(spark, n_pages, n_hosts).persist()
    pages.count()  # materialize the web outside the timed window
    robots = generate_robots(spark, n_hosts)
    seeds = generate_seeds(spark, n_pages, n_seeds, n_hosts)
    with tempfile.TemporaryDirectory(prefix="crawl_bench_") as root:
        loop = CrawlLoop(spark, root)
        loop.init(seeds, pages.select("url", "shares", "pub_ms"))
        t0 = time.perf_counter()
        stats = loop.run(pages, robots, max_iterations=iterations)
        dt = time.perf_counter() - t0
        urls = sum(s.get("claimed", 0) + s.get("scheduled", 0) for s in stats)
    pages.unpersist()
    return {"urls": urls, "seconds": dt, "urls_per_sec": urls / max(dt, 1e-9)}
