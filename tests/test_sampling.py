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


def test_domain_quota_counts(spark):
    """Each source keeps exactly min(quota, |source|) documents."""
    from mklab_focused_crawler_spark.operators.sampling import domain_quota

    docs = _docs(spark, 100, sources=("a", "b"))  # 50 per source
    small = _docs(spark, 9, sources=("tiny",))  # below quota
    got = domain_quota(docs.union(small), quota=12)
    kept = (
        got.filter("kept").groupBy("source").count().collect()
    )
    assert {r["source"]: r["count"] for r in kept} == {"a": 12, "b": 12, "tiny": 9}
    assert got.count() == 109  # decision emitted for EVERY row


def test_domain_quota_matches_plain_rank(spark):
    """The salted two-phase threshold plan equals the straightforward
    per-source window rank it replaces (independent brute force)."""
    from mklab_focused_crawler_spark.operators.sampling import domain_quota
    from mklab_focused_crawler_spark.functions.hashing import hash64

    docs = _docs(spark, 400, sources=("a", "b", "c", "d", "e"))
    rows = docs.select(
        "doc_id", "source", hash64(F.col("doc_id").cast("string")).alias("h")
    ).collect()
    by_src: dict[str, list] = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append((r["h"], r["doc_id"]))
    expect = {}
    for src, keys in by_src.items():
        for rank, (_, doc) in enumerate(sorted(keys), start=1):
            expect[doc] = rank <= 7
    got = {r["doc_id"]: r["kept"] for r in domain_quota(docs, quota=7).collect()}
    assert got == expect


def test_domain_quota_broadcasts_thresholds(spark):
    """The decision join must broadcast the tiny threshold frame — a
    shuffle join on `source` would re-introduce the skew the operator
    exists to avoid."""
    from mklab_focused_crawler_spark.operators.sampling import domain_quota

    plan = (
        domain_quota(_docs(spark, 200))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan, plan


def test_domain_quota_null_source_is_one_group(spark):
    """NULL sources form one capped group, matching the oracle's
    window-over-null-partition semantics (needs the null-safe join —
    a plain equi-join would keep every null-source doc)."""
    from mklab_focused_crawler_spark.operators.sampling import domain_quota

    docs = spark.range(30).select(
        F.col("id").alias("doc_id"), F.lit(None).cast("string").alias("source")
    )
    got = domain_quota(docs, quota=4)
    assert got.filter("kept").count() == 4
    assert got.count() == 30
