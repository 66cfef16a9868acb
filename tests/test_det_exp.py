"""Bit-identity of the deterministic exp kernel across all three
engines (Spark, DuckDB, pure Python) — the foundation of page_score's
oracle parity (functions/scoring.py)."""

from __future__ import annotations

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from mklab_focused_crawler_spark.functions import scoring

GRID = [
    0.0, -1e-12, -1e-9, -0.049999999, -0.3, -0.6931471805599453, -1.0,
    -2.5, -7.77, -12.000000001, -13.125, -25.0, -39.9, -39.999999,
    -40.0, -41.0, -1e6, 0.5, 2.0,
]


def test_det_exp_bit_identical_across_engines(spark):
    df = spark.createDataFrame([(x,) for x in GRID], "x double")
    got_spark = [
        r[0] for r in df.select(scoring.det_exp(F.col("x")).alias("y")).collect()
    ]
    con = duckdb.connect()
    got_duck = [
        con.execute(f"SELECT {scoring.det_exp_sql(repr(x))}").fetchone()[0]
        for x in GRID
    ]
    got_py = [scoring.det_exp_py(x) for x in GRID]
    for x, a, b, c in zip(GRID, got_spark, got_duck, got_py):
        assert a == b == c, (x, a.hex(), b.hex(), c.hex())


def test_det_exp_accuracy_vs_libm():
    """~1e-13 relative accuracy against libm in the supported range."""
    for x in GRID:
        xx = min(x, 0.0)
        if xx <= -40.0:
            assert scoring.det_exp_py(x) == 0.0
            continue
        rel = abs(scoring.det_exp_py(x) - math.exp(xx)) / math.exp(xx)
        assert rel < 1e-13, (x, rel)


RATIOS = [
    (1, 1), (2, 1), (3, 2), (7, 5), (10, 1), (99, 98), (1024, 1),
    (10**6, 1), (10**9 + 7, 12345), (2**52, 3), (5, 5), (617, 616),
    (123456789, 3), (10**12, 999_999_999_999),
]


def test_det_log10_ratio_bit_identical_across_engines(spark):
    """The trending idf/shift kernel: log10(n/d) for integer n >= d >= 1
    must be the SAME double on Spark, DuckDB, and Python — the shift
    predicates compare and divide by these values across engines."""
    df = spark.createDataFrame(RATIOS, "n long, d long")
    got_spark = [
        r[0]
        for r in df.select(
            scoring.det_log10_ratio(F.col("n"), F.col("d")).alias("y")
        ).collect()
    ]
    con = duckdb.connect()
    got_duck = [
        con.execute(
            f"SELECT {scoring.det_log10_ratio_sql(str(n), str(d))}"
        ).fetchone()[0]
        for n, d in RATIOS
    ]
    got_py = [scoring.det_log10_ratio_py(n, d) for n, d in RATIOS]
    for (n, d), a, b, c in zip(RATIOS, got_spark, got_duck, got_py):
        assert a == b == c, (n, d, a.hex(), b.hex(), c.hex())


def test_det_log10_ratio_accuracy_vs_libm():
    for n, d in RATIOS:
        err = abs(scoring.det_log10_ratio_py(n, d) - math.log10(n / d))
        assert err < 5e-12, (n, d, err)


def test_page_score_three_way_identity(spark):
    cases = [(0, None), (1, 1_704_067_200_000), (37, 1_706_659_165_261), (99, 0)]
    now = 1_706_745_600_000
    con = duckdb.connect()
    df = spark.createDataFrame(cases, "shares int, pub long")
    got = [
        r[0]
        for r in df.select(
            scoring.page_score(F.col("shares"), F.col("pub"), now).alias("s")
        ).collect()
    ]
    for (sh, pub), sv in zip(cases, got):
        duck = con.execute(
            f"SELECT {scoring.page_score_sql(str(sh), 'NULL' if pub is None else str(pub), now)}"
        ).fetchone()[0]
        assert sv == duck, (sh, pub, sv.hex(), duck.hex())
