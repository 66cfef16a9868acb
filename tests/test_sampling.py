"""Unit tests for operators/sampling.py (deterministic dataset mixing):
decision stability, sub-mixture consistency, rate accuracy, defaults,
and the zero-shuffle plan contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from mklab_focused_crawler_spark.operators.sampling import (
    PPM,
    dataset_mix,
    dataset_mix_sql,
)


def _docs(spark, n=2000, sources=("a", "b", "c")):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit(""), F.element_at(F.lit(list(sources)), (F.col("id") % len(sources) + 1).cast("int"))
        ).alias("source"),
    )


def test_decisions_stable_under_corpus_growth(spark):
    """Hash sampling's defining property: a row's keep/drop decision is
    a pure function of the row — adding more data never resamples."""
    rates = {"a": 300_000, "b": 700_000, "c": 0}
    small = {r["doc_id"] for r in dataset_mix(_docs(spark, 500), rates).collect()}
    big = {r["doc_id"] for r in dataset_mix(_docs(spark, 2000), rates).collect()}
    assert small == {d for d in big if d < 500}


def test_sample_key_gives_consistent_submixture(spark):
    """Keeping sample_key < r' for r' < r is exactly the r' mixture —
    downstream subsampling without re-hashing."""
    hi = dataset_mix(_docs(spark), {"a": 600_000, "b": 600_000, "c": 600_000})
    lo = dataset_mix(_docs(spark), {"a": 200_000, "b": 200_000, "c": 200_000})
    sub = {r["doc_id"] for r in hi.filter(F.col("sample_key") < 200_000).collect()}
    assert sub == {r["doc_id"] for r in lo.collect()}


def test_rates_are_respected(spark):
    rates = {"a": 0, "b": 500_000, "c": PPM}
    got = dataset_mix(_docs(spark, 3000), rates).groupBy("source").count()
    counts = {r["source"]: r["count"] for r in got.collect()}
    assert "a" not in counts  # rate 0: nothing sampled
    assert counts["c"] == 1000  # rate 1.0: everything sampled
    assert 350 <= counts["b"] <= 650  # ~50% of 1000


def test_unknown_source_uses_default(spark):
    df = dataset_mix(_docs(spark, 900), {"a": PPM}, default_ppm=0)
    assert {r["source"] for r in df.collect()} == {"a"}


def test_plan_is_one_narrow_filter(spark):
    plan = (
        dataset_mix(_docs(spark))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan


def test_sql_twin_embeds_sorted_rates():
    sql = dataset_mix_sql({"z": 1, "a": 2})
    assert sql.index("'a' THEN 2") < sql.index("'z' THEN 1")
