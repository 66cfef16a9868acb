"""shard_shuffle + corpus_stats properties beyond the oracle hash."""

from __future__ import annotations

from pyspark.sql import functions as F

from mklab_focused_crawler_spark.operators.sampling import shard_shuffle
from mklab_focused_crawler_spark.operators.stats import corpus_stats

SF_DIR = "/root/testdata/sf0.001"


def test_shard_shuffle_is_a_permutation(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = shard_shuffle(docs, n_shards=8).collect()
    # every input doc appears exactly once
    assert sorted(r["doc_id"] for r in out) == sorted(
        r["doc_id"] for r in docs.select("doc_id").collect()
    )
    # positions are contiguous 1..n within each shard (a shard file can
    # be written by position with no gaps)
    by_shard: dict[int, list[int]] = {}
    for r in out:
        by_shard.setdefault(r["shard_id"], []).append(r["pos"])
    assert set(by_shard) == set(range(8))  # hash-balance: no empty shard
    for positions in by_shard.values():
        assert sorted(positions) == list(range(1, len(positions) + 1))
    # hash balance: no shard dominates (500 docs over 8 shards)
    sizes = [len(v) for v in by_shard.values()]
    assert max(sizes) < 2 * min(sizes)


def test_shard_shuffle_deterministic_across_parallelism(spark):
    """The assignment is a pure function of doc_id: independent of
    input partitioning (the property that makes shards reproducible
    on a 1000-executor cluster)."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    a = {tuple(r) for r in shard_shuffle(docs.repartition(17)).collect()}
    b = {tuple(r) for r in shard_shuffle(docs.coalesce(1)).collect()}
    assert a == b


def test_corpus_stats_subtotals_are_consistent(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    rows = corpus_stats(docs).collect()
    leaf = [r for r in rows if r["gid"] == 0]
    per_src = [r for r in rows if r["gid"] == 1]
    total = [r for r in rows if r["gid"] == 3]
    assert len(total) == 1
    n = docs.count()
    assert total[0]["n_docs"] == n == sum(r["n_docs"] for r in leaf)
    assert total[0]["n_tokens"] == sum(r["n_tokens"] for r in leaf) > 0
    # each source subtotal equals the sum of its leaves
    for s in per_src:
        mine = [r for r in leaf if r["source"] == s["source"]]
        assert s["n_docs"] == sum(r["n_docs"] for r in mine)
        assert s["n_chars"] == sum(r["n_chars"] for r in mine)


def test_corpus_stats_single_expand_aggregate_plan(spark):
    """Scale shape: the rollup must be ONE Expand + partial/final
    aggregate pair (one exchange carrying grouped partials), never one
    job per grouping set."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = corpus_stats(docs)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
    assert "Expand" in plan and "partial_count" in plan


def test_corpus_stats_empty_corpus_both_engines_empty(spark, tmp_path):
    """Empty-corpus contract: Spark's rollup emits no rows on empty
    input while ANSI ROLLUP emits a count-0 grand total — the twin's
    HAVING reconciles them, so both engines return 0 rows."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from mklab_focused_crawler_spark.operators.stats import corpus_stats_sql

    schema = pa.schema(
        [("doc_id", pa.int64()), ("text", pa.string()),
         ("lang", pa.string()), ("source", pa.string())]
    )
    path = str(tmp_path / "documents.parquet")
    pq.write_table(pa.Table.from_pylist([], schema=schema), path)
    assert corpus_stats(spark.read.parquet(path)).count() == 0
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{path}')")
    assert len(con.sql(corpus_stats_sql()).df()) == 0
    con.close()
