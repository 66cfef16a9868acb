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


def test_redirect_following_inside_transport(spark):
    """Live redirect chains (URLExpansionBolt.java:30 max_redirects=4):
    3xx+location hops are followed inside the UDF, each hop politeness-
    gated against its own host, and chains past the cap keep their 3xx
    status so the caller's gate drops them."""

    def factory():
        # a.test/r0 -> a.test/r1 -> b.test/page (2 hops, cross-host);
        # loop.test/x -> loop.test/x forever (cap must bite)
        chain = {
            "http://a.test/r0": "http://a.test/r1",
            "http://a.test/r1": "http://b.test/page",
            "http://loop.test/x": "http://loop.test/x",
        }

        def fetch(url: str):
            loc = chain.get(url)
            if loc is not None:
                return 301, None, None, None, loc
            return 200, "text/html", f"<p>{url}</p>", [url + "/next"]

        return fetch

    df = spark.createDataFrame(
        [
            ("http://a.test/r0", "a.test", 0),
            ("http://plain.test/p", "plain.test", 0),
            ("http://loop.test/x", "loop.test", 0),
        ],
        "expanded_url string, host string, crawl_delay_ms int",
    )
    got = {
        r["expanded_url"]: r
        for r in fetch_with_transport(df, factory, max_redirects=4).collect()
    }
    hop2 = got["http://a.test/r0"]
    assert hop2["status"] == 200 and hop2["n_redirects"] == 2
    assert hop2["final_url"] == "http://b.test/page"
    assert hop2["html"] == "<p>http://b.test/page</p>"
    plain = got["http://plain.test/p"]
    assert plain["status"] == 200 and plain["n_redirects"] == 0
    assert plain["final_url"] == "http://plain.test/p"
    looped = got["http://loop.test/x"]
    assert looped["status"] == 301 and looped["n_redirects"] == 4


def test_redirect_hop_honors_target_host_clock(spark):
    """Every hop is a politeness-gated request: a redirect into a
    host must wait out that host's delay clock like any direct fetch."""

    def factory():
        import time as _t

        chain = {"http://a.test/r": "http://slow.test/target"}

        def fetch(url: str):
            loc = chain.get(url)
            if loc is not None:
                return 301, None, None, None, loc
            return 200, "text/html", repr(_t.monotonic()), []

        return fetch

    # both rows funnel into slow.test (one directly, one via redirect)
    # on ONE partition; 60ms delay must separate the two terminal hits
    df = spark.createDataFrame(
        [
            ("http://slow.test/direct", "slow.test", 60),
            ("http://a.test/r", "a.test", 60),
        ],
        "expanded_url string, host string, crawl_delay_ms int",
    ).coalesce(1)
    out = fetch_with_transport(df, factory, max_redirects=4).collect()
    times = sorted(float(r["html"]) for r in out)
    assert times[1] - times[0] >= 0.058, times


def test_relative_location_resolves_against_current_url(spark):
    """Location headers may be relative (RFC 7231 §7.1.2) — the hop
    must urljoin against the current URL, not request the bare path."""

    def factory():
        chain = {
            "http://a.test/dir/r": "/abs-path",  # absolute-path relative
            "http://a.test/abs-path": "sibling",  # relative reference
        }

        def fetch(url: str):
            loc = chain.get(url)
            if loc is not None:
                return 301, None, None, None, loc
            if not url.startswith("http://"):
                raise ValueError(f"transport got non-absolute url: {url}")
            return 200, "text/html", f"<p>{url}</p>", []

        return fetch

    df = spark.createDataFrame(
        [("http://a.test/dir/r", "a.test", 0)],
        "expanded_url string, host string, crawl_delay_ms int",
    )
    [r] = fetch_with_transport(df, factory, max_redirects=4).collect()
    assert r["status"] == 200 and r["n_redirects"] == 2
    assert r["final_url"] == "http://a.test/sibling"


def test_hop_host_key_matches_pipeline_url_host():
    """The worker's Python host extractor must agree with the pipeline's
    url_host column (robots keys, clock keys): port stripped, ASCII
    lowercase only, '' for relative/garbage."""
    from mklab_focused_crawler_spark.operators.fetch import _url_host

    assert _url_host("http://Slow.Test:8080/x") == "slow.test"
    assert _url_host("https://HOST.example/p?q#f") == "host.example"
    assert _url_host("http://İstanbul.test/") == "İstanbul.test".translate(
        str.maketrans("ABCDEFGHIJKLMNOPQRSTUVWXYZ", "abcdefghijklmnopqrstuvwxyz")
    )  # ASCII-only lowering, Unicode untouched — same as ascii_lower
    assert _url_host("/relative/path") == ""
    assert _url_host("") == "" and _url_host(None) == ""


def test_redirect_hop_uses_target_hosts_own_delay(spark):
    """The hop must stamp the target host's clock with the TARGET's
    robots delay, not the origin row's: a fast host redirecting into a
    slow host must still hold the slow host's clock for ITS delay (and
    conversely must not export the origin's big delay onto a fast
    target). Delays are heterogeneous here precisely because the
    equal-delay test above cannot distinguish the value's source."""

    def factory():
        import time as _t

        chain = {"http://fast.test/r": "http://slow.test/target"}

        def fetch(url: str):
            loc = chain.get(url)
            if loc is not None:
                return 301, None, None, None, loc
            return 200, "text/html", repr(_t.monotonic()), []

        return fetch

    # row order after host sort: fast.test/r first (hop hits slow.test,
    # stamping slow's 80ms delay), then the two direct slow.test rows —
    # consecutive slow.test hits must each be >=80ms apart even though
    # the ORIGIN row's delay (fast.test) is 0
    df = spark.createDataFrame(
        [
            ("http://fast.test/r", "fast.test", 0),
            ("http://slow.test/d1", "slow.test", 80),
            ("http://slow.test/d2", "slow.test", 80),
        ],
        "expanded_url string, host string, crawl_delay_ms int",
    ).coalesce(1)
    out = fetch_with_transport(
        df,
        factory,
        max_redirects=4,
        host_delays={"fast.test": 0.0, "slow.test": 80.0},
    ).collect()
    times = sorted(float(r["html"]) for r in out)
    gaps = [b - a for a, b in zip(times, times[1:])]
    assert all(g >= 0.078 for g in gaps), gaps


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


def test_crawl_golden_parity_with_live_redirect_transport(spark, tmp_path):
    """Redirect expansion done BY the transport — 3xx hops followed
    inside the fetch UDF (URLExpansionBolt's live-HTTP shape), with NO
    offline redirect map anywhere in the loop — must still reproduce the
    simulator's crawl order and seen set. Redirect URLs answer 301 and
    carry no content; the loop's fetch stage discovers the terminal URL
    itself."""
    pages, robots, seeds = _setup(spark)
    sim = _simulate(spark, pages, robots, seeds)

    rows = pages.collect()
    table = {
        r["url"]: (r["mime"], r["html"], list(r["out_links"]))
        for r in rows
        if not r["redirect_to"]
    }
    hops = {r["url"]: r["redirect_to"] for r in rows if r["redirect_to"]}
    bc = spark.sparkContext.broadcast(table)
    red_bc = spark.sparkContext.broadcast(hops)
    loop = CrawlLoop(
        spark,
        str(tmp_path / "live"),
        transport_factory=SyntheticTransport(bc, red_bc),
        transport_redirects=4,
    )
    loop.init(seeds, pages.select("url", "shares", "pub_ms"))
    loop.run(pages, robots, max_iterations=5)

    log = loop.crawl_log().collect()
    got = [(r["iteration"], r["doc_id"], r["source_url"], r["crawl_order"]) for r in log]
    assert got == sim["order"]
    got_seen = {
        r["canonical_url"] for r in loop.seen_df().select("canonical_url").collect()
    }
    assert got_seen == sim["seen"]
    # the synthetic web really contains redirects, so the parity is
    # non-vacuous: at least one crawled doc was reached through a hop
    assert any(u in hops for _, _, u, _ in got) or any(
        hops.get(u) for u in sim["seen"]
    )
    pages.unpersist()
