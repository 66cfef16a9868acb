"""Differential fuzzing: hypothesis-generated document corpora run
through the Spark queries AND their DuckDB oracles — unicode, empty
strings, NULLs, whitespace-only text; cases the fixed fixtures never
produce."""

from __future__ import annotations

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st

from tests.util import _norm

TEXT = st.one_of(
    st.none(),
    st.text(max_size=60),
    st.text(
        alphabet="abc ABC 123 äöü 中文 😀 .,;|#?&-_'\"\\\n\t", max_size=80
    ),
    st.just(""),
    st.just("   "),
)

CORPUS = st.lists(TEXT, min_size=1, max_size=12)

# pinned regressions: engine trim()/lower() are Unicode-divergent
# (NBSP-trim, İ→i+combining-dot vs i, final Σ→ς vs σ) — the queries must
# use the portable ascii_lower / trim(x, ' ') forms on both sides
NASTY = ["\xa0", "İstanbul Σ ΣΙΓΜΑΣ", "ẞIG ǅungla ﬃ ＡＢＣ", "\x0b x \x0b", "ı I µ Μ"]


def _mk_tables(spark, tmpdir, texts):
    pdf = pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": pd.array(texts, dtype="string"),
            "lang": ["en"] * len(texts),
            "source": [f"src{i % 3}" for i in range(len(texts))],
            "n_chars": [len(t) if t else 0 for t in texts],
        }
    )
    path = f"{tmpdir}/documents.parquet"
    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), path)
    sdf = spark.read.parquet(path)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{path}')")
    return sdf, con


def _compare(spark_df, con, sql):
    got = _norm(spark_df.toPandas())
    want = _norm(con.execute(sql).df())
    assert list(got.columns) == list(want.columns)
    pd.testing.assert_frame_equal(got, want, check_dtype=False, rtol=1e-6)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=CORPUS)
@example(texts=NASTY)
def test_fuzz_text_analysis(spark, tmp_path_factory, texts):
    import __spark_entry__ as m

    d = tmp_path_factory.mktemp("fuzz")
    sdf, con = _mk_tables(spark, d, texts)
    sdf.createOrReplaceTempView("documents")  # not used by query fn; path-based
    for q in ("text_analysis", "lexicon_filter"):
        df = m.queries()[q](spark, str(d))
        _compare(df, con, m.oracle_sql()[q])
    con.close()


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=CORPUS)
@example(texts=NASTY)
def test_fuzz_span_stats_and_sequences(spark, tmp_path_factory, texts):
    import __spark_entry__ as m

    d = tmp_path_factory.mktemp("fuzz")
    sdf, con = _mk_tables(spark, d, texts)
    for q in ["spans_stats", "span_sequences"]:
        df = m.queries()[q](spark, str(d))
        _compare(df, con, m.oracle_sql()[q])
    con.close()


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=CORPUS)
@example(texts=NASTY)
def test_fuzz_dedup_pairs(spark, tmp_path_factory, texts):
    import __spark_entry__ as m

    d = tmp_path_factory.mktemp("fuzz")
    sdf, con = _mk_tables(spark, d, texts)
    for q in ["dedup_exact", "minhash_lsh_pairs"]:
        df = m.queries()[q](spark, str(d))
        _compare(df, con, m.oracle_sql()[q])
    con.close()


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=CORPUS)
@example(texts=NASTY)
# corpus-SIZE sensitivity: jaccard's df cap is floor(n*0.10) — the
# round-1 fixture landed on a size where int-truncate vs round-half-away
# coincided (ADVICE r1); tiny fuzzed corpora sweep the cap through 1
def test_fuzz_jaccard_and_simhash(spark, tmp_path_factory, texts):
    import __spark_entry__ as m

    d = tmp_path_factory.mktemp("fuzz")
    sdf, con = _mk_tables(spark, d, texts)
    for q in ["jaccard_topk", "simhash_pairs"]:
        df = m.queries()[q](spark, str(d))
        _compare(df, con, m.oracle_sql()[q])
    con.close()


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=CORPUS)
@example(texts=NASTY)
# entity extraction runs through deterministic case restoration (hash-
# selected capitalization) then capitalized-run grouping; POS tagging is
# suffix rules — both pure string pipelines where Unicode/NULL/empty
# handling must agree between Spark and DuckDB
def test_fuzz_entities_and_pos(spark, tmp_path_factory, texts):
    import __spark_entry__ as m

    d = tmp_path_factory.mktemp("fuzz")
    sdf, con = _mk_tables(spark, d, texts)
    for q in ["entities", "pos_tags"]:
        df = m.queries()[q](spark, str(d))
        _compare(df, con, m.oracle_sql()[q])
    con.close()


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=CORPUS)
@example(texts=NASTY)
@example(texts=["a", "a b", "a b c", "x " * 200])  # n-gram length edges
def test_fuzz_doc_quality(spark, tmp_path_factory, texts):
    import __spark_entry__ as m

    d = tmp_path_factory.mktemp("fuzz")
    sdf, con = _mk_tables(spark, d, texts)
    df = m.queries()["doc_quality"](spark, str(d))
    _compare(df, con, m.oracle_sql()["doc_quality"])
    con.close()


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=CORPUS)
@example(texts=NASTY)
# dense-collision corpus: one token repeated past GRAM_N (within-doc
# overlapping duplicate grams) plus exact copies (cross-doc spans)
@example(texts=["z " * 40, "z " * 40, "z " * 15 + "q r s", None, ""])
def test_fuzz_substring_dedup(spark, tmp_path_factory, texts):
    import __spark_entry__ as m

    d = tmp_path_factory.mktemp("fuzz")
    sdf, con = _mk_tables(spark, d, texts)
    df = m.queries()["substring_dedup"](spark, str(d))
    _compare(df, con, m.oracle_sql()["substring_dedup"])
    con.close()


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=CORPUS)
@example(texts=NASTY)
# PII-shaped strings the planted fixture never produces: boundary
# digits, glued categories, unicode around matches
@example(
    texts=[
        "a@b.co 1.2.3.4x x1.2.3.4 999-99-9999 999-999-9999",
        "ü@例.com 😀 192.168.0.1😀 [555-123-4567]",
        None,
        "",
    ]
)
def test_fuzz_pii_dsir_packing(spark, tmp_path_factory, texts):
    """The round-4 pipeline family over adversarial corpora: regex
    dialect (pii), det-log weight math (dsir + ppl buckets — the
    empty-LM clamp and OOV path only fuzz corpora exercise), and
    window/cum-sum integer packing — all vs their DuckDB twins."""
    import __spark_entry__ as m

    d = tmp_path_factory.mktemp("fuzz")
    sdf, con = _mk_tables(spark, d, texts)
    for q in (
        "pii_redact",
        "dsir_weights",
        "ppl_buckets",
        "sequence_pack",
        "token_stats",
    ):
        df = m.queries()[q](spark, str(d))
        _compare(df, con, m.oracle_sql()[q])
    con.close()


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=CORPUS)
@example(texts=NASTY)
# the fuzz alphabet includes '\n', so fuzzed corpora exercise real
# multi-line splits UNDER the deterministic augmentation: literal-vs-
# regex newline split, trailing-empty-line retention, codepoint-length
# eligibility, and string_agg vs array_join reconstruction must all
# agree cross-engine
def test_fuzz_line_ops(spark, tmp_path_factory, texts):
    import __spark_entry__ as m

    d = tmp_path_factory.mktemp("fuzz")
    sdf, con = _mk_tables(spark, d, texts)
    for q in ["line_dedup", "repetition_signals"]:
        df = m.queries()[q](spark, str(d))
        _compare(df, con, m.oracle_sql()[q])
    con.close()


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=CORPUS)
@example(texts=NASTY)
def test_fuzz_vocab_and_quota(spark, tmp_path_factory, texts):
    """bpe_merges: substr runs on tokens, which tokenize restricts to
    ascii alnum — pinning that (Spark substr counts UTF-16 units,
    DuckDB counts codepoints; any non-ascii reaching substr would
    diverge on astral chars). domain_quota at quota=2 so tiny corpora
    still exercise both kept and dropped branches."""
    import __spark_entry__ as m
    from mklab_focused_crawler_spark.operators.sampling import (
        domain_quota,
        domain_quota_sql,
    )

    d = tmp_path_factory.mktemp("fuzz")
    sdf, con = _mk_tables(spark, d, texts)
    df = m.queries()["bpe_merges"](spark, str(d))
    _compare(df, con, m.oracle_sql()["bpe_merges"])
    _compare(domain_quota(sdf, quota=2), con, domain_quota_sql(quota=2))
    con.close()


@given(texts=CORPUS)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@example(texts=NASTY)
@example(texts=[None, "", "   "])
def test_fuzz_corpus_stats_and_shards(spark, tmp_path_factory, texts):
    """corpus_stats over NULL text AND NULL source/lang: the rollup's
    subtotal NULLs must stay distinguishable (gid) from genuinely-NULL
    group values in both engines; shard_shuffle must stay a
    permutation whatever the ids hash to."""
    import duckdb as _duck

    from mklab_focused_crawler_spark.operators.sampling import (
        shard_shuffle,
        shard_shuffle_sql,
    )
    from mklab_focused_crawler_spark.operators.stats import (
        corpus_stats,
        corpus_stats_sql,
    )

    d = tmp_path_factory.mktemp("fuzz_stats")
    n = len(texts)
    pdf = pd.DataFrame(
        {
            "doc_id": range(n),
            "text": pd.array(texts, dtype="string"),
            # NULL group values every 3rd/4th row: subtotal rows must
            # not collapse into them
            "lang": pd.array(
                [None if i % 3 == 0 else f"l{i % 2}" for i in range(n)],
                dtype="string",
            ),
            "source": pd.array(
                [None if i % 4 == 0 else f"s{i % 2}" for i in range(n)],
                dtype="string",
            ),
            "n_chars": [len(t) if t else 0 for t in texts],
        }
    )
    path = f"{d}/documents.parquet"
    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), path)
    sdf = spark.read.parquet(path)
    con = _duck.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{path}')")
    _compare(corpus_stats(sdf), con, corpus_stats_sql())
    _compare(shard_shuffle(sdf, n_shards=4), con, shard_shuffle_sql(n_shards=4))
    con.close()
