"""HttpTransport (operators/fetch.py) against a real loopback HTTP
server: the last gap between "transport shape" and "works against
sockets" (VERDICT r2 item 6 — WebPageFetcherBolt.java:82-160 knobs).

The server is a forward proxy (urllib's ProxyHandler sends the
absolute-form request line, so the synthetic web's fake hosts resolve
without DNS — the production fetch-proxy deployment shape) serving the
same deterministic web the golden simulator crawls: text/html pages
whose bodies carry the out_links as anchors, image/png pages that must
die at the MIME gate, 301 redirects with Location headers, 404 for
everything else. Full-loop parity = crawl order + seen set identical to
the simulator; politeness = server-observed same-host request spacing
>= the robots crawl delay.
"""

from __future__ import annotations

import threading
import time
from contextlib import contextmanager
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from mklab_focused_crawler_spark.operators.crawl import CrawlLoop
from mklab_focused_crawler_spark.operators.fetch import (
    HttpTransport,
    _url_host,
    fetch_with_transport,
)

from tests.test_crawl_loop import _setup, _simulate


def _page_body(out_links) -> str:
    anchors = "".join(f'<a href="{u}">x</a>' for u in out_links)
    return f"<html><body>{anchors}</body></html>"


@contextmanager
def _serve(pages: dict, redirects: dict):
    """Loopback forward proxy over {url: (mime, body)} + {url: location}.
    Yields (proxy_url, request_log) where request_log collects
    (monotonic_seconds, url) per request, lock-protected (executor
    partitions hit the threading server concurrently)."""
    log: list[tuple[float, str]] = []
    lock = threading.Lock()

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            url = self.path  # absolute-form: the logical URL
            with lock:
                log.append((time.monotonic(), url))
            loc = redirects.get(url)
            if loc is not None:
                self.send_response(301)
                self.send_header("Location", loc)
                self.send_header("Content-Length", "0")
                self.end_headers()
                return
            page = pages.get(url)
            if page is None:
                self.send_error(404)
                return
            mime, body = page
            data = body.encode("utf-8")
            self.send_response(200)
            self.send_header("Content-Type", f"{mime}; charset=utf-8")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def log_message(self, *args):  # silence stderr
            pass

    server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        yield f"http://127.0.0.1:{server.server_address[1]}", log
    finally:
        server.shutdown()
        server.server_close()


def test_http_transport_contract(spark):
    """Socket-level contract: 200+links, MIME gate (no body for
    image/*), 301 surfaces Location unfollowed, 404 is a result row,
    and a refused connection becomes status=-1 with the error string."""
    pages = {
        "http://a.test/p1": (
            "text/html",
            _page_body(["http://a.test/p2", "http://b.test/p9"]),
        ),
        "http://a.test/img": ("image/png", ""),
    }
    redirects = {"http://a.test/r": "http://a.test/p1"}
    with _serve(pages, redirects) as (proxy, _log):
        df = spark.createDataFrame(
            [
                ("http://a.test/p1", "a.test", 0),
                ("http://a.test/img", "a.test", 0),
                ("http://a.test/r", "a.test", 0),
                ("http://a.test/missing", "a.test", 0),
            ],
            "expanded_url string, host string, crawl_delay_ms int",
        )
        tr = HttpTransport(timeout_s=5, proxy=proxy)
        got = {r["expanded_url"]: r for r in fetch_with_transport(df, tr).collect()}

        ok = got["http://a.test/p1"]
        assert ok["status"] == 200 and ok["mime"] == "text/html"
        assert ok["out_links"] == ["http://a.test/p2", "http://b.test/p9"]
        img = got["http://a.test/img"]
        assert img["status"] == 200 and img["mime"] == "image/png"
        assert img["html"] is None and img["out_links"] is None
        red = got["http://a.test/r"]
        assert red["status"] == 301 and red["html"] is None
        miss = got["http://a.test/missing"]
        assert miss["status"] == 404 and miss["fetch_error"] is None

        # redirect FOLLOWED when the UDF owns the chain
        chain = fetch_with_transport(
            df.filter("expanded_url = 'http://a.test/r'"), tr, max_redirects=4
        ).collect()[0]
        assert chain["status"] == 200 and chain["n_redirects"] == 1
        assert chain["final_url"] == "http://a.test/p1"

    # server down -> transport exception -> error column, not a crash
    dead = HttpTransport(timeout_s=2, proxy=proxy)
    got = fetch_with_transport(
        df.filter("expanded_url = 'http://a.test/p1'"), dead
    ).collect()[0]
    assert got["status"] == -1 and got["fetch_error"]


def test_crawl_golden_parity_over_http(spark, tmp_path):
    """The full crawl loop with HttpTransport over the loopback proxy
    must reproduce the simulator's crawl order and seen set, and the
    server-observed request times must honor per-host crawl delays."""
    pages, robots, seeds = _setup(spark)
    sim = _simulate(spark, pages, robots, seeds)

    rows = pages.collect()
    page_map = {
        r["url"]: (r["mime"], _page_body(r["out_links"]))
        for r in rows
        if not r["redirect_to"]
    }
    hops = {r["url"]: r["redirect_to"] for r in rows if r["redirect_to"]}

    with _serve(page_map, hops) as (proxy, log):
        loop = CrawlLoop(
            spark,
            str(tmp_path / "http"),
            transport_factory=HttpTransport(timeout_s=10, proxy=proxy),
            transport_redirects=4,
        )
        loop.init(seeds, pages.select("url", "shares", "pub_ms"))
        loop.run(pages, robots, max_iterations=5)

    got = [
        (r["iteration"], r["doc_id"], r["source_url"], r["crawl_order"])
        for r in loop.crawl_log().collect()
    ]
    assert got == sim["order"]
    got_seen = {
        r["canonical_url"] for r in loop.seen_df().select("canonical_url").collect()
    }
    assert got_seen == sim["seen"]

    # politeness from the server's own timeline. Hosts that are
    # CROSS-host redirect targets are excluded: a hop runs on the
    # origin-host partition's clock (documented approximation in
    # fetch.py), so only hop-free hosts make a sound global assertion.
    delays = {r["host"]: r["crawl_delay_ms"] for r in robots.collect()}
    polluted = {
        _url_host(dst) for src, dst in hops.items() if _url_host(src) != _url_host(dst)
    }
    clean = [h for h, d in delays.items() if d > 0 and h not in polluted]
    assert clean, "fixture must leave some delayed, hop-free hosts"
    checked = 0
    for host in clean:
        ts = sorted(t for t, u in log if _url_host(u) == host)
        gaps = [b - a for a, b in zip(ts, ts[1:])]
        checked += len(gaps)
        floor = delays[host] * 0.9 / 1000.0
        assert all(g >= floor for g in gaps), (host, delays[host], gaps)
    assert checked > 0, "politeness assertion must see consecutive hits"
    pages.unpersist()
