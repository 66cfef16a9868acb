"""Fetch stage with an injectable transport — the real-HTTP shape of
WebPageFetcherBolt (WebPageFetcherBolt.java:96-160: 24-thread pool,
``maxPerRoute=10`` per-host cap, connect/read timeouts, MIME gate),
re-expressed as a ``mapInPandas`` stage over the claimed batch.

Design:

- **Transport is pluggable.** ``transport_factory`` is a picklable
  zero-arg callable, instantiated once per partition on the executor,
  returning a ``fetch(url) -> (status, mime, html, out_links)``
  callable. Tests inject a synthetic transport backed by a broadcast
  page dict; a production deployment injects an HTTP client (urllib /
  requests) — same plan, same politeness, same error columns. The
  sandbox has no network, so no HTTP transport is shipped here.
- **Politeness inside the batch.** Rows are processed host-grouped and
  the worker enforces ``crawl_delay_ms`` between consecutive requests
  to the same host with a monotonic clock (the reference's de-facto
  politeness is the pool's per-route cap; ours is the explicit delay
  from robots). The BSP claim already caps per-host volume per
  super-step; partition-by-host keeps one host's requests on one worker
  so the delay is globally honored.
- **Errors are data, not exceptions.** A failed fetch yields
  status=-1 + error string; a missing page is whatever status the
  transport reports (the synthetic transport returns 404). The loop's
  MIME gate and row-count arithmetic work unchanged.
- Per-request Python is inherent to a fetch stage (each row IS an I/O
  call); the batch framing is still Arrow (columns in, columns out),
  so no per-row serialization overhead beyond the requests themselves.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterator
from urllib.parse import urljoin

import pandas as pd
from pyspark.sql import DataFrame

# transport contract: factory() -> fetch(url) -> (status, mime, html,
# out_links) or, for redirect-aware transports, a 5-tuple with a trailing
# redirect ``location`` (non-None exactly when status is 3xx)
TransportFactory = Callable[[], Callable[[str], tuple[int, str, str, list[str]]]]

FETCH_RESULT_COLS = (
    "status int, mime string, html string, "
    "out_links array<string>, fetch_ms double, fetch_error string"
)
REDIRECT_RESULT_COLS = ", final_url string, n_redirects int"


_ASCII_LOWER = str.maketrans(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ", "abcdefghijklmnopqrstuvwxyz"
)
_HOST_RE = __import__("re").compile(r"^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]+)")


def _url_host(url: str) -> str:
    """EXACT Python mirror of ``functions.urls.url_host`` (same regex,
    same ASCII-only lowercase): hop hosts must hit the same keys as the
    pipeline's host column — the robots delay map and the politeness
    clock of the host's direct rows — or a redirect into
    ``http://Host:8080/x`` would silently run on a second clock with no
    delay."""
    m = _HOST_RE.match(url or "")
    return m.group(1).translate(_ASCII_LOWER) if m else ""


def fetch_with_transport(
    df: DataFrame,
    transport_factory: TransportFactory,
    url_col: str = "expanded_url",
    delay_col: str | None = "crawl_delay_ms",
    max_redirects: int = 0,
    host_delays=None,
) -> DataFrame:
    """claimed rows → + (status, mime, html, out_links, fetch_ms,
    fetch_error). Input should be partitioned by host (the loop
    repartitions by host before this stage) so same-host delays are
    enforced by a single worker.

    ``max_redirects`` > 0 enables live redirect following — the
    URLExpansionBolt shape (URLExpansionBolt.java:30 ``max_redirects=4``:
    expansion IS chained HTTP requests, not a lookup table): when the
    transport reports a 3xx status with a location (5-tuple contract),
    the worker re-requests the target, honoring the *target host's*
    politeness clock per hop, up to ``max_redirects`` hops. Two extra
    result columns: ``final_url`` (terminal URL of the chain) and
    ``n_redirects`` (hops actually taken). A chain still 3xx at the cap
    keeps its last 3xx status — the caller's status gate drops it, as
    the reference abandons over-long chains.

    ``host_delays``: optional Spark broadcast (or plain dict) of
    {host: crawl_delay_ms}. Redirect hops stamp the TARGET host's clock
    with the target's own delay from this map (a hop into a slow host
    must hold that host's clock for ITS delay, not the origin row's);
    hosts absent from the map get 0 — the same default the loop's
    robots left-join applies to direct rows. Without a map, hops fall
    back to the origin row's delay (delay-homogeneous test setups).

    Known approximation: the batch is partitioned by ORIGIN host, so a
    hop into host B from host A's partition runs on a different worker
    than B's own rows — each worker's clock is private, so a host that
    many OTHER hosts redirect into can see up to (1 + redirecting
    partitions) × its allowed rate within one super-step. The reference
    has the same shape (URLExpansionBolt follows redirects inline on
    whatever thread holds the tuple; its politeness is the pool's
    per-route cap, not a global clock). Exact cross-partition politeness
    would need a two-phase fetch (resolve 3xx → reshuffle by target
    host → fetch), which doubles the stage count for a rare case; the
    BSP claim quota still bounds total per-host volume per super-step."""
    in_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )
    schema = in_schema + ", " + FETCH_RESULT_COLS
    if max_redirects > 0:
        schema += REDIRECT_RESULT_COLS
    use_delay = delay_col is not None and delay_col in df.columns

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        fetch = transport_factory()
        dmap = (
            host_delays.value if hasattr(host_delays, "value") else host_delays
        )
        next_ok_ms: dict[str, float] = {}  # per-host monotonic deadline
        def one_request(url: str, host: str, delay: float):
            """Politeness-gated single request against ``host``'s clock.
            Returns (status, mime, html, out_links, location, error,
            fetch-only elapsed ms — the politeness wait is the
            scheduler's time, not the transport's, so it never lands in
            fetch_ms)."""
            wait = next_ok_ms.get(host, 0.0) - time.monotonic() * 1000.0
            if wait > 0:
                time.sleep(wait / 1000.0)
            t0 = time.monotonic()
            try:
                got = fetch(url)
                s, m, h, ls = got[:4]
                loc = got[4] if len(got) > 4 else None
                e = None
            except Exception as exc:  # transport error -> data
                s, m, h, ls, loc, e = -1, None, None, None, None, str(exc)
            now = time.monotonic()
            next_ok_ms[host] = now * 1000.0 + delay
            return s, m, h, ls, loc, e, (now - t0) * 1000.0

        empty_cols = dict(
            status=pd.Series([], dtype="int32"),
            mime=pd.Series([], dtype=object),
            html=pd.Series([], dtype=object),
            out_links=pd.Series([], dtype=object),
            fetch_ms=pd.Series([], dtype="float64"),
            fetch_error=pd.Series([], dtype=object),
        )
        if max_redirects > 0:
            empty_cols["final_url"] = pd.Series([], dtype=object)
            empty_cols["n_redirects"] = pd.Series([], dtype="int32")

        for pdf in batches:
            if len(pdf) == 0:
                yield pdf.assign(**empty_cols)
                continue
            # host-grouped order: consecutive same-host requests so the
            # delay bookkeeping touches each host's clock once per row
            pdf = pdf.sort_values("host", kind="stable").reset_index(drop=True)
            status, mime, html, links, ms, err = [], [], [], [], [], []
            finals, hops_col = [], []
            for row in pdf.itertuples(index=False):
                delay = float(getattr(row, delay_col) or 0) if use_delay else 0.0
                url, host = getattr(row, url_col), row.host
                s, m, h, ls, loc, e, dt = one_request(url, host, delay)
                hops = 0
                # live redirect chain: each hop is a politeness-gated
                # request to the hop target's own host. Location values
                # may be relative (RFC 7231 §7.1.2) — resolve against
                # the current URL before requesting.
                while (
                    hops < max_redirects and e is None and 300 <= s < 400 and loc
                ):
                    url = urljoin(url, loc)
                    host = _url_host(url) or host
                    # the hop target's OWN delay governs its clock
                    hop_delay = (
                        float(dmap.get(host, 0.0)) if dmap is not None else delay
                    )
                    s, m, h, ls, loc, e, hop_dt = one_request(url, host, hop_delay)
                    dt += hop_dt
                    hops += 1
                status.append(s)
                mime.append(m)
                html.append(h)
                links.append(ls)
                ms.append(dt)
                err.append(e)
                finals.append(url)
                hops_col.append(hops)
            out = dict(
                status=pd.Series(status, dtype="int32"),
                mime=mime,
                html=html,
                out_links=links,
                fetch_ms=ms,
                fetch_error=err,
            )
            if max_redirects > 0:
                out["final_url"] = finals
                out["n_redirects"] = pd.Series(hops_col, dtype="int32")
            yield pdf.assign(**out)

    return df.mapInPandas(run, schema)


class HttpTransport:
    """Production HTTP transport (urllib, stdlib-only): the knobs of
    WebPageFetcherBolt.java:82-94 — connect/read timeout (30 s default),
    User-Agent, and the MIME gate (non-HTML content types return headers
    only; the body is never downloaded, the reference's
    ``shouldFetch(contentType)`` behavior).

    Contract notes:

    - **Redirects are NOT followed here.** 3xx answers return the
      5-tuple ``(status, mime, None, None, location)`` so
      :func:`fetch_with_transport` owns the chain — every hop must pass
      through the politeness clocks, which only the UDF sees.
      HTTP 4xx/5xx are *results*, not errors (urllib raises HTTPError
      for them, but an HTTPError IS the response); only transport-level
      failures (DNS, refused, timeout) propagate as exceptions, which
      the UDF turns into status=-1 rows.
    - **out_links** are extracted from the fetched HTML with an href
      scan, absolutized against the final URL (RFC 3986 join) — the
      fetch-time link discovery a crawler needs before the heavyweight
      extraction stage runs downstream.
    - **proxy**: optional forward-proxy URL. Production crawl fleets
      front their egress with fetch proxies; the loopback test serves
      the synthetic web through one (the absolute-form request line
      carries the logical URL, so fake hosts resolve without DNS).
    - Picklable by attribute (primitives only); the opener is built
      once per partition in ``__call__``.
    """

    ALLOWED_MIME = ("text/html", "application/xhtml+xml")

    def __init__(
        self,
        timeout_s: float = 30.0,
        user_agent: str = "mklab-focused-crawler-spark/0.1",
        max_bytes: int = 1 << 22,
        proxy: str | None = None,
    ):
        self.timeout_s = timeout_s
        self.user_agent = user_agent
        self.max_bytes = max_bytes
        self.proxy = proxy

    def __call__(self):
        import re
        import urllib.error
        import urllib.request

        class _NoRedirect(urllib.request.HTTPRedirectHandler):
            def redirect_request(self, req, fp, code, msg, headers, newurl):
                return None  # surface the 3xx; the UDF follows it

        handlers: list = [_NoRedirect()]
        if self.proxy:
            handlers.append(
                urllib.request.ProxyHandler({"http": self.proxy, "https": self.proxy})
            )
        opener = urllib.request.build_opener(*handlers)
        href_re = re.compile(r"""<a\s[^>]*?href\s*=\s*["']([^"'#]+)["']""", re.I)
        timeout, ua, cap = self.timeout_s, self.user_agent, self.max_bytes

        def fetch(url: str):
            req = urllib.request.Request(url, headers={"User-Agent": ua})
            try:
                resp = opener.open(req, timeout=timeout)
            except urllib.error.HTTPError as e:
                resp = e  # 3xx/4xx/5xx: a response, not a failure
            with resp:
                status = resp.getcode()
                mime = resp.headers.get_content_type()  # params stripped
                if 300 <= status < 400:
                    return status, mime, None, None, resp.headers.get("Location")
                if mime not in HttpTransport.ALLOWED_MIME:
                    return status, mime, None, None  # MIME gate: no body
                body = resp.read(cap)
            charset = resp.headers.get_content_charset() or "utf-8"
            html = body.decode(charset, errors="replace")
            links = [urljoin(url, m) for m in href_re.findall(html)]
            return status, mime, html, links

        return fetch


class SyntheticTransport:
    """Offline transport over a broadcast {url: page-row} dict — the
    hermetic stand-in for HTTP. Picklable; ``bc`` is a Spark broadcast
    of {url: (mime, html, out_links)}. ``redirects_bc`` (optional) is a
    broadcast {src_url: location} single-hop map: those URLs answer
    ``301`` with a location, exercising the live redirect-following
    contract of :func:`fetch_with_transport`."""

    def __init__(self, bc, redirects_bc=None):
        self.bc = bc
        self.redirects_bc = redirects_bc

    def __call__(self):
        table = self.bc.value
        redirects = self.redirects_bc.value if self.redirects_bc else {}

        def fetch(url: str):
            loc = redirects.get(url)
            if loc is not None:
                return 301, None, None, None, loc
            page = table.get(url)
            if page is None:
                return 404, None, None, None
            mime, html, out_links = page
            return 200, mime, html, list(out_links)

        return fetch
