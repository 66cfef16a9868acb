"""Shared test helpers: DuckDB-oracle comparison mirroring the driver's
row-count + schema + order-insensitive value-hash check."""

from __future__ import annotations

import duckdb
import pandas as pd

from mklab_focused_crawler_spark.sources.tables import TABLE_NAMES


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        else:
            # unify int32/int64 etc.
            try:
                df[c] = pd.to_numeric(df[c])
            except (ValueError, TypeError):
                pass
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def assert_matches_oracle(spark_df, sf_dir: str, sql: str) -> None:
    """Mirror of the grading driver: columns sorted by name, order-
    insensitive, values compared EXACTLY (bit-level for doubles — the
    round-1 rtol=1e-6 tolerance masked a real driver hash failure)."""
    got = _norm(spark_df.toPandas())
    con = duck_con(sf_dir)
    want = _norm(con.execute(sql).df())
    con.close()
    assert list(got.columns) == list(want.columns), (
        f"columns differ: {list(got.columns)} vs {list(want.columns)}"
    )
    assert len(got) == len(want), f"row count {len(got)} vs {len(want)}"
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)
