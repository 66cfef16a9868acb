"""Injectable-transport fetch UDF (operators/fetch.py): per-host
politeness inside the batch, error columns, and full golden-crawl
parity when the loop's fetch join is swapped for the UDF path
(WebPageFetcherBolt.java:96-160 execution shape)."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from mklab_focused_crawler_spark.operators.crawl import CrawlLoop
from mklab_focused_crawler_spark.operators.fetch import (
    SyntheticTransport,
    fetch_with_transport,
)

from tests.test_crawl_loop import _setup, _simulate


def _make_clock_transport():
    """Returns a transport factory built from nested closures only —
    cloudpickle serializes those by value, so executors never need to
    import this test module. Records the monotonic call time in the
    html field so politeness spacing is observable from the result."""

    def factory():
        import time as _t

        def fetch(url: str):
            if url.endswith("boom"):
                raise OSError("connection reset")
            return 200, "text/html", repr(_t.monotonic()), ["x"]

        return fetch

    return factory


def test_politeness_delay_inside_batch(spark):
    _clock_transport = _make_clock_transport()
    rows = [
        (f"http://h{i % 2}.test/p/{i}", f"h{i % 2}.test", 40) for i in range(8)
    ]
    df = spark.createDataFrame(
        rows, "expanded_url string, host string, crawl_delay_ms int"
    ).repartition(2, "host")
    out = fetch_with_transport(df, _clock_transport).collect()
    assert len(out) == 8 and all(r["status"] == 200 for r in out)
    by_host: dict[str, list[float]] = {}
    for r in out:
        by_host.setdefault(r["host"], []).append(float(r["html"]))
    for host, ts in by_host.items():
        ts.sort()
        gaps = [b - a for a, b in zip(ts, ts[1:])]
        # 40ms delay honored between consecutive same-host requests
        assert all(g >= 0.038 for g in gaps), (host, gaps)


def test_transport_errors_become_columns(spark):
    df = spark.createDataFrame(
        [("http://h.test/ok", "h.test", 0), ("http://h.test/boom", "h.test", 0)],
        "expanded_url string, host string, crawl_delay_ms int",
    )
    _clock_transport = _make_clock_transport()
    got = {r["expanded_url"]: r for r in fetch_with_transport(df, _clock_transport).collect()}
    assert got["http://h.test/ok"]["status"] == 200
    bad = got["http://h.test/boom"]
    assert bad["status"] == -1 and "connection reset" in bad["fetch_error"]
    assert bad["html"] is None and bad["mime"] is None


def test_crawl_golden_parity_with_transport(spark, tmp_path):
    """The loop's fetch join swapped for the transport UDF must produce
    the identical crawl order and seen set."""
    pages, robots, seeds = _setup(spark)
    sim = _simulate(spark, pages, robots, seeds)

    table = {
        r["url"]: (r["mime"], r["html"], list(r["out_links"]))
        for r in pages.collect()
    }
    bc = spark.sparkContext.broadcast(table)
    loop = CrawlLoop(
        spark, str(tmp_path / "tr"), transport_factory=SyntheticTransport(bc)
    )
    loop.init(seeds, pages.select("url", "shares", "pub_ms"))
    stats = loop.run(pages, robots, max_iterations=5)

    log = loop.crawl_log().collect()
    got = [(r["iteration"], r["doc_id"], r["source_url"], r["crawl_order"]) for r in log]
    assert got == sim["order"]
    got_seen = {
        r["canonical_url"] for r in loop.seen_df().select("canonical_url").collect()
    }
    assert got_seen == sim["seen"]
    assert sum(s["claimed"] for s in stats) > 30
    pages.unpersist()
