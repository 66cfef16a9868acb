"""The entry-layer LSH artifact cache (PLANS.md #31): the shared path
must equal the self-contained operator path row-for-row, the cache must
stay bounded under corpus churn, and clear_lsh_cache must leave the
next call rebuilding from scratch."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import __spark_entry__ as entry_mod
from mklab_focused_crawler_spark.operators import dedup


def _mk_corpus_dir(tmp_path, name: str, n: int, salt: str):
    d = tmp_path / name
    d.mkdir()
    texts = [
        f"{salt} alpha beta gamma delta {i % 7} common tail words here"
        for i in range(n)
    ]
    pdf = pd.DataFrame(
        {
            "doc_id": range(n),
            "text": pd.array(texts, dtype="string"),
            "lang": ["en"] * n,
            "source": [f"s{i % 3}" for i in range(n)],
            "n_chars": [len(t) for t in texts],
        }
    )
    pq.write_table(
        pa.Table.from_pandas(pdf, preserve_index=False),
        str(d / "documents.parquet"),
    )
    return str(d)


def test_shared_path_equals_operator_path(spark, tmp_path):
    d = _mk_corpus_dir(tmp_path, "c0", 40, "zero")
    corpus = dedup.augment_corpus(
        spark.read.parquet(f"{d}/documents.parquet")
    )

    def rows(df):
        return sorted(tuple(r) for r in df.collect())

    shared_pairs = rows(entry_mod.queries()["minhash_lsh_pairs"](spark, d))
    assert shared_pairs == rows(dedup.lsh_pairs(corpus))
    assert len(shared_pairs) > 0

    shared_clusters = rows(entry_mod.queries()["duplicate_clusters"](spark, d))
    assert shared_clusters == rows(dedup.duplicate_clusters(spark, corpus))

    shared_filter = rows(entry_mod.queries()["near_dup_filter"](spark, d))
    assert shared_filter == rows(dedup.near_dup_filter(spark, corpus))


def test_cache_bounded_and_clearable(spark, tmp_path):
    dirs = [
        _mk_corpus_dir(tmp_path, f"c{i}", 10, f"salt{i}") for i in range(3)
    ]
    for d in dirs:
        entry_mod.queries()["minhash_lsh_pairs"](spark, d).count()
    assert len(entry_mod._LSH_CACHE) <= 2  # eviction kept the cap

    entry_mod.clear_lsh_cache()
    assert len(entry_mod._LSH_CACHE) == 0
    # next call rebuilds and still answers correctly
    n = entry_mod.queries()["duplicate_clusters"](spark, dirs[-1]).count()
    assert len(entry_mod._LSH_CACHE) == 1 and n >= 0
