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

Determinism (two deliberate divergences from a naive translation):

1. The reference reads System.currentTimeMillis() per tuple —
   nondeterministic. We take ``now_ms`` as an explicit parameter (one
   value per batch/iteration) so runs are replayable and
   oracle-checkable.
2. ``exp`` itself is evaluated by a **deterministic fixed-polynomial
   kernel** (``det_exp`` below), not libm: libm/JVM ``exp`` are only
   ~1-ulp-accurate and the ulp patterns differ between engines, so raw
   ``exp`` doubles can never be value-hashed across Spark and DuckDB
   (CLAUDE.md determinism rule; bit-divergence observed in round 1 at
   114/10,000 rows). ``det_exp`` uses only IEEE-754 correctly-rounded
   primitives (+, -, *, /, floor, integer shift) in an identical
   evaluation order on both engines, so its output is bit-identical
   everywhere — Spark, DuckDB, and pure Python (the golden crawl
   simulator). Accuracy vs true exp is ~1e-15 relative (degree-17
   Taylor after range reduction), far inside the 9-dp rounding the
   queries emit.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

AVG_TIME_DIFF_MS = 10 * 60 * 1000  # RankerBolt.java:30

# --------------------------------------------------------------------------
# det_exp: deterministic exp(x) for x <= 0 (clamped), bit-identical across
# engines. exp(x) = 2^k * P(r) with k = floor(x/ln2), r = x - k*ln2 in
# [0, ln2), P = degree-17 Taylor of exp evaluated by Horner. 2^k is exact
# (integer shift + divide); every float op is a correctly-rounded IEEE
# primitive, so any engine that evaluates the same op sequence on doubles
# produces the same bits.
# --------------------------------------------------------------------------

_LN2 = 0.6931471805599453
_EXP_UNDERFLOW = -40.0  # exp(-40) ~ 4e-18: emit 0.0 below this
_EXP_DEGREE = 17
_EXP_COEFFS = [1.0 / math.factorial(n) for n in range(_EXP_DEGREE + 1)]


def det_exp(x: Column) -> Column:
    """Deterministic exp for non-positive arguments; positive args clamp
    to 0 (result 1.0) — scores never exceed their now==pub ceiling."""
    x = F.least(x.cast("double"), F.lit(0.0))
    k = F.floor(x / F.lit(_LN2))  # long, in [-58, 0] when x > -40
    r = x - k.cast("double") * F.lit(_LN2)
    p = F.lit(_EXP_COEFFS[_EXP_DEGREE])
    for c in reversed(_EXP_COEFFS[:_EXP_DEGREE]):
        p = p * r + F.lit(c)
    pow2 = F.call_function(
        "shiftleft", F.lit(1).cast("long"), (-k).cast("int")
    ).cast("double")
    return F.when(x <= F.lit(_EXP_UNDERFLOW), F.lit(0.0)).otherwise(p / pow2)


def det_exp_sql(expr: str) -> str:
    """DuckDB twin of det_exp — the same op sequence textually. ``expr``
    is substituted multiple times; keep it side-effect-free."""
    x = f"least(CAST({expr} AS DOUBLE), 0.0)"
    k = f"CAST(floor(({x}) / {_LN2!r}) AS BIGINT)"
    r = f"(({x}) - CAST({k} AS DOUBLE) * {_LN2!r})"
    p = repr(_EXP_COEFFS[_EXP_DEGREE])
    for c in reversed(_EXP_COEFFS[:_EXP_DEGREE]):
        p = f"(({p}) * {r} + {c!r})"
    pow2 = f"CAST((CAST(1 AS BIGINT) << CAST(-({k}) AS INT)) AS DOUBLE)"
    return (
        f"(CASE WHEN ({x}) <= {_EXP_UNDERFLOW!r} THEN 0.0 "
        f"ELSE ({p}) / {pow2} END)"
    )


def det_exp_py(x: float) -> float:
    """Pure-Python det_exp (same bits) — for driver-side score checks.
    The golden-test simulator re-implements this independently."""
    x = min(float(x), 0.0)
    if x <= _EXP_UNDERFLOW:
        return 0.0
    k = math.floor(x / _LN2)
    r = x - k * _LN2
    p = _EXP_COEFFS[_EXP_DEGREE]
    for c in reversed(_EXP_COEFFS[:_EXP_DEGREE]):
        p = p * r + c
    return p / float(1 << -k)


# --------------------------------------------------------------------------
# det_log10_ratio: deterministic log10(n/d) for integer n >= d >= 1,
# bit-identical across engines (the trending idf/shift formulas need a
# log10 whose OUTPUT doubles agree between Spark and DuckDB — libm
# log10 does not guarantee that; CLAUDE.md: never compare raw log/exp
# doubles across engines).
#   m = n/d            IEEE division of exactly-representable ints: exact
#   j = bit_length(floor(m)) - 1   via length(bin(...)) — exact integer
#   r = m / 2^j ∈ [1,2)            division by a power of two: exact
#   u = (r-1)/(r+1) ∈ [0, 1/3]
#   ln r = 2u · Σ u^{2k}/(2k+1), k = 0.._LOG_DEGREE (Horner)
#   log10(n/d) = (j·ln2 + ln r) / ln10
# Truncation < 3e-13 at u = 1/3 — far inside the 9dp rounding the
# consumers apply; cross-engine identity holds at ANY degree because
# both engines run the identical correctly-rounded op sequence.
# --------------------------------------------------------------------------

_LN10 = 2.302585092994046
_LOG_DEGREE = 11
_LOG_COEFFS = [1.0 / (2 * k + 1) for k in range(_LOG_DEGREE + 1)]


def det_log10_ratio(n: Column, d: Column) -> Column:
    """Deterministic log10(n/d) for integer columns n >= d >= 1 (the
    idf shape: total docs / docs-with-term). NULL-propagating."""
    m = n.cast("double") / d.cast("double")
    j = F.length(F.bin(F.floor(m).cast("long"))) - F.lit(1)
    pow2 = F.call_function("shiftleft", F.lit(1).cast("long"), j.cast("int")).cast(
        "double"
    )
    r = m / pow2
    u = (r - F.lit(1.0)) / (r + F.lit(1.0))
    u2 = u * u
    p = F.lit(_LOG_COEFFS[_LOG_DEGREE])
    for c in reversed(_LOG_COEFFS[:_LOG_DEGREE]):
        p = p * u2 + F.lit(c)
    return (j.cast("double") * F.lit(_LN2) + F.lit(2.0) * u * p) / F.lit(_LN10)


def det_log10_ratio_sql(n_expr: str, d_expr: str) -> str:
    """DuckDB twin — same op sequence textually. The expressions are
    substituted many times; pass short column names."""
    m = f"(CAST({n_expr} AS DOUBLE) / CAST({d_expr} AS DOUBLE))"
    j = f"(length(bin(CAST(floor({m}) AS BIGINT))) - 1)"
    pow2 = f"CAST((CAST(1 AS BIGINT) << CAST({j} AS INT)) AS DOUBLE)"
    r = f"({m} / {pow2})"
    u = f"(({r} - 1.0) / ({r} + 1.0))"
    u2 = f"({u} * {u})"
    p = repr(_LOG_COEFFS[_LOG_DEGREE])
    for c in reversed(_LOG_COEFFS[:_LOG_DEGREE]):
        p = f"(({p}) * {u2} + {c!r})"
    return f"((CAST({j} AS DOUBLE) * {_LN2!r} + 2.0 * {u} * ({p})) / {_LN10!r})"


def det_log10_ratio_py(n: int, d: int) -> float:
    """Pure-Python det_log10_ratio (same bits) — for tests."""
    # contract guard: for d > n, floor(m) = 0 gives j = 0 on Spark/DuckDB
    # (length of '0' is 1) but bit_length() - 1 = -1 here — fail loudly
    # instead of diverging three ways
    assert n >= d >= 1, f"det_log10_ratio requires n >= d >= 1, got {n=} {d=}"
    m = float(n) / float(d)
    j = int(math.floor(m)).bit_length() - 1
    r = m / float(1 << j)
    u = (r - 1.0) / (r + 1.0)
    u2 = u * u
    p = _LOG_COEFFS[_LOG_DEGREE]
    for c in reversed(_LOG_COEFFS[:_LOG_DEGREE]):
        p = p * u2 + c
    return (j * _LN2 + 2.0 * u * p) / _LN10


# --------------------------------------------------------------------------
# score formulas (RankerBolt / MediaRankerBolt / ItemsRankerBolt)
# --------------------------------------------------------------------------


def shares_score(shares: Column) -> Column:
    return (F.lit(1.0) - det_exp(F.lit(-0.05) * shares) + F.lit(1.0)) / F.lit(2.0)


def shares_score_sql(expr: str) -> str:
    # CAST before the multiply: a bare -0.05 * int_col would be exact
    # DECIMAL arithmetic in DuckDB (≠ double arithmetic in Spark)
    arg = f"CAST(-0.05 AS DOUBLE) * CAST({expr} AS DOUBLE)"
    return f"(1.0 - {det_exp_sql(arg)} + 1.0) / 2.0"


def pubtime_score(pub_ms: Column, now_ms: int) -> Column:
    pub = F.coalesce(pub_ms, F.lit(0)).cast("double")
    arg = -(F.lit(float(now_ms)) - pub) / F.lit(float(AVG_TIME_DIFF_MS))
    return (det_exp(arg) + F.lit(1.0)) / F.lit(2.0)


def pubtime_score_sql(expr: str, now_ms: int) -> str:
    arg = (
        f"-({float(now_ms)!r} - CAST(coalesce({expr}, 0) AS DOUBLE)) / "
        f"{float(AVG_TIME_DIFF_MS)!r}"
    )
    return f"({det_exp_sql(arg)} + 1.0) / 2.0"


def page_score(shares: Column, pub_ms: Column, now_ms: int) -> Column:
    """RankerBolt getScore — the crawl-order definition."""
    return shares_score(shares) * pubtime_score(pub_ms, now_ms)


def page_score_sql(shares_expr: str, pub_expr: str, now_ms: int) -> str:
    return f"({shares_score_sql(shares_expr)}) * ({pubtime_score_sql(pub_expr, now_ms)})"
