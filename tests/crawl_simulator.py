"""Pure-Python single-threaded crawl simulator — the independent oracle
for CrawlLoop golden tests.

Implements the same *defined* semantics (claim quota, robots, redirect
hops, MIME gate, first-seen-wins, score order with url_hash tiebreak)
with plain dicts/lists over collected page rows. No Spark, no pandas —
an intentionally naive second implementation.

url_hash values (xxhash64 of canonical URL) are supplied by the caller
(computed once via Spark) since xxhash64 is not re-implemented here;
everything *about* the hashes (ordering, dedup, bucketing) is.
"""

from __future__ import annotations

import math

MAX_PER_ROUTE = 10
ITER_WINDOW_MS = 1000
MAX_REDIRECTS = 4
AVG_TIME_DIFF_MS = 10 * 60 * 1000


# Deterministic exp (the engine's *defined* score math, scoring.py):
# exp(x) = 2^k * Horner-Taylor(r), x = k*ln2 + r — only correctly-rounded
# IEEE primitives, so simulator and engine agree bit-for-bit. Written
# out independently here (no package imports).
_LN2 = 0.6931471805599453
_COEF = [1.0 / math.factorial(n) for n in range(18)]


def det_exp(x: float) -> float:
    x = min(float(x), 0.0)
    if x <= -40.0:
        return 0.0
    k = math.floor(x / _LN2)
    r = x - k * _LN2
    p = _COEF[17]
    for c in reversed(_COEF[:17]):
        p = p * r + c
    return p / float(1 << -k)


def page_score(shares: int, pub_ms: int | None, now_ms: int) -> float:
    ss = (1.0 - det_exp(-0.05 * shares) + 1.0) / 2.0
    pub = float(pub_ms) if pub_ms is not None else 0.0
    ps = (det_exp(-(float(now_ms) - pub) / AVG_TIME_DIFF_MS) + 1.0) / 2.0
    return ss * ps


def host_of(url: str) -> str:
    rest = url.split("://", 1)[1]
    return rest.split("/", 1)[0].split(":")[0].lower()


def path_of(url: str) -> str:
    rest = url.split("://", 1)[1]
    i = rest.find("/")
    return rest[i:] if i >= 0 else "/"


def simulate(
    pages: list[dict],
    robots: list[dict],
    seeds: list[str],
    url_hash: dict[str, int],
    now_ms: int,
    max_iterations: int,
) -> dict:
    """Returns {'order': [(iteration, url fetched as doc)...], 'seen': set,
    'claims': [(iteration, source_url)...]}."""
    by_url = {p["url"]: p for p in pages}
    rb = {r["host"]: r for r in robots}

    def quota(host: str) -> int:
        delay = rb.get(host, {}).get("crawl_delay_ms", 0) or 0
        return min(MAX_PER_ROUTE, max(1, ITER_WINDOW_MS // max(delay, 1)))

    def allowed(url: str) -> bool:
        prefixes = rb.get(host_of(url), {}).get("disallow_prefixes") or []
        p = path_of(url)
        return not any(p.startswith(x) for x in prefixes)

    def score_of(url: str) -> float:
        p = by_url.get(url)
        if p is None:
            return page_score(0, None, now_ms)
        return page_score(p["shares"], p["pub_ms"], now_ms)

    # synthetic-web URLs are already canonical: canonical(url) == url
    frontier: dict[str, float] = {u: score_of(u) for u in seeds}
    seen: set[str] = set(frontier)
    order: list[tuple[int, str]] = []
    claims: list[tuple[int, str]] = []

    for it in range(max_iterations):
        claimable = [u for u in frontier if allowed(u)]
        if not claimable:
            break
        per_host: dict[str, list[str]] = {}
        for u in claimable:
            per_host.setdefault(host_of(u), []).append(u)
        claimed: list[str] = []
        for h, us in per_host.items():
            us.sort(key=lambda u: (-frontier[u], url_hash[u]))
            claimed.extend(us[: quota(h)])
        if not claimed:
            break
        claimed.sort(key=lambda u: (-frontier[u], url_hash[u]))

        discovered: dict[str, int] = {}  # url -> min discovering claim rank
        doc_rank = 0  # ordinal over *fetched documents* (crawl_order)
        for rank, u in enumerate(claimed, start=1):
            claims.append((it, u))
            # redirect expansion
            final = u
            for _ in range(MAX_REDIRECTS):
                p = by_url.get(final)
                if p is None or not p.get("redirect_to"):
                    break
                final = p["redirect_to"]
            if len(final) > 300:
                continue
            p = by_url.get(final)
            if p is None or p["mime"] != "text/html":
                continue
            doc_rank += 1
            order.append((it, final, u, doc_rank))
            for link in p["out_links"]:
                if link not in discovered or rank < discovered[link]:
                    discovered[link] = rank

        new = [u for u in discovered if u not in seen]
        for u in new:
            seen.add(u)
            frontier[u] = score_of(u)
        for u in claimed:
            del frontier[u]

    return {"order": order, "seen": seen, "claims": claims}
