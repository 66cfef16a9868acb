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

import pandas as pd
from pyspark.sql import DataFrame

# transport contract: factory() -> fetch(url) -> (status, mime, html, out_links)
TransportFactory = Callable[[], Callable[[str], tuple[int, str, str, list[str]]]]

FETCH_RESULT_COLS = (
    "status int, mime string, html string, "
    "out_links array<string>, fetch_ms double, fetch_error string"
)


def fetch_with_transport(
    df: DataFrame,
    transport_factory: TransportFactory,
    url_col: str = "expanded_url",
    delay_col: str | None = "crawl_delay_ms",
) -> DataFrame:
    """claimed rows → + (status, mime, html, out_links, fetch_ms,
    fetch_error). Input should be partitioned by host (the loop
    repartitions by host before this stage) so same-host delays are
    enforced by a single worker."""
    in_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )
    schema = in_schema + ", " + FETCH_RESULT_COLS
    use_delay = delay_col is not None and delay_col in df.columns

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        fetch = transport_factory()
        next_ok_ms: dict[str, float] = {}  # per-host monotonic deadline
        for pdf in batches:
            if len(pdf) == 0:
                yield pdf.assign(
                    status=pd.Series([], dtype="int32"),
                    mime=pd.Series([], dtype=object),
                    html=pd.Series([], dtype=object),
                    out_links=pd.Series([], dtype=object),
                    fetch_ms=pd.Series([], dtype="float64"),
                    fetch_error=pd.Series([], dtype=object),
                )
                continue
            # host-grouped order: consecutive same-host requests so the
            # delay bookkeeping touches each host's clock once per row
            pdf = pdf.sort_values("host", kind="stable").reset_index(drop=True)
            status, mime, html, links, ms, err = [], [], [], [], [], []
            for row in pdf.itertuples(index=False):
                host = row.host
                delay = float(getattr(row, delay_col) or 0) if use_delay else 0.0
                now = time.monotonic() * 1000.0
                wait = next_ok_ms.get(host, 0.0) - now
                if wait > 0:
                    time.sleep(wait / 1000.0)
                t0 = time.monotonic()
                try:
                    s, m, h, ls = fetch(getattr(row, url_col))
                    e = None
                except Exception as exc:  # transport error -> data
                    s, m, h, ls, e = -1, None, None, None, str(exc)
                dt = (time.monotonic() - t0) * 1000.0
                next_ok_ms[host] = time.monotonic() * 1000.0 + delay
                status.append(s)
                mime.append(m)
                html.append(h)
                links.append(ls)
                ms.append(dt)
                err.append(e)
            yield pdf.assign(
                status=pd.Series(status, dtype="int32"),
                mime=mime,
                html=html,
                out_links=links,
                fetch_ms=ms,
                fetch_error=err,
            )

    return df.mapInPandas(run, schema)


class SyntheticTransport:
    """Offline transport over a broadcast {url: page-row} dict — the
    hermetic stand-in for HTTP. Picklable; ``bc`` is a Spark broadcast
    of {url: (mime, html, out_links)}."""

    def __init__(self, bc):
        self.bc = bc

    def __call__(self):
        table = self.bc.value

        def fetch(url: str):
            page = table.get(url)
            if page is None:
                return 404, None, None, None
            mime, html, out_links = page
            return 200, mime, html, list(out_links)

        return fetch
