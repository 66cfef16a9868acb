"""Tokenizer-training support: BPE merge counting and the full
iterative training loop as corpus queries — adjacent symbol-pair frequencies weighted by word count
(Sennrich et al. 2016, "Neural Machine Translation of Rare Words with
Subword Units": merge candidates are ranked by total pair count over
the word-frequency table, not the raw corpus).

Shape at 100 TB:

- the only corpus-sized stage is explode(tokens) → groupBy(word) —
  one map-side-combined shuffle whose output is the VOCABULARY
  (distinct words ≪ corpus; Heaps' law keeps it sub-linear);
- char-pair enumeration runs per DISTINCT word (an interpreted HOF
  over vocab-sized data, never the corpus), weighted by the word
  count carried alongside;
- the pair table is ≤ |alphabet|² rows; top-k is TakeOrdered, not a
  global sort.

The reference's TokenizationBolt stops at words
(``TokenizationBolt.java``, SURVEY §2.10); subword induction is part
of the training-data tier this engine adds on top.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokenize, tokenize_sql

TOP_K = 50
# BPE trainers cap the word length they merge over (HF tokenizers'
# max_token_length): a single pathological unbroken token (minified
# JS, base64 blobs) must not allocate a len-sized position array per
# row here — or a max(len)-sized generate_series in the oracle.
MAX_WORD_LEN = 1024


def word_counts(documents: DataFrame) -> DataFrame:
    """(w, c) — the corpus word-frequency table: the only corpus-sized
    stage of merge counting (one map-side-combined shuffle). Split out
    so the streaming vocabulary store (streaming/vocab.py) can append
    per-batch partials of exactly this frame — counts are additive."""
    return (
        documents.select(
            F.explode(tokenize(F.coalesce(F.col("text"), F.lit("")))).alias("w")
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def merge_candidates_from_counts(
    word_freq: DataFrame, top_k: int = TOP_K
) -> DataFrame:
    """Pair ranking over an already-built (w, c) table — vocabulary-
    sized work, shared by the batch operator and the streamed store."""
    words = (
        word_freq
        # single-symbol words carry no pair; over-cap "words" are noise
        .filter(F.length("w").between(2, MAX_WORD_LEN))
    )

    def _pair(w):
        # closure factory keeps the HOF lambda unary (CLAUDE.md arity)
        def at(i):
            return F.struct(
                w.substr(i, F.lit(1)).alias("a"),
                w.substr(i + 1, F.lit(1)).alias("b"),
            )

        return at

    # length(w) >= 2 above guarantees sequence(1, len-1) is ascending
    # (the F.sequence(0,-1) descending-range trap — CLAUDE.md)
    pairs = words.select(
        "c",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("w") - 1), _pair(F.col("w"))
            )
        ).alias("p"),
    )
    return (
        pairs.groupBy(
            F.col("p.a").alias("pair_a"), F.col("p.b").alias("pair_b")
        )
        .agg(F.sum("c").alias("pair_count"))
        .orderBy(F.desc("pair_count"), "pair_a", "pair_b")
        .limit(top_k)
    )


def bpe_merge_candidates(documents: DataFrame, top_k: int = TOP_K) -> DataFrame:
    """(pair_a, pair_b, pair_count) — the ``top_k`` most frequent
    adjacent character pairs over the corpus word-frequency table,
    ties broken by (pair_a, pair_b) so the cut is deterministic."""
    return merge_candidates_from_counts(word_counts(documents), top_k)


# ---------------------------------------------------------------------------
# iterative BPE training (apply-merge + recount, Sennrich Algorithm 1)
# ---------------------------------------------------------------------------

MERGE_ROUNDS = 8


def _char_symbols(w):
    """word string → array of single-character symbols (the round-0
    symbolization). Mirrors the oracle's list_transform/substring so the
    two engines start from identical arrays."""

    def at(i):
        return w.substr(i, F.lit(1))

    return F.transform(F.sequence(F.lit(1), F.length(w)), at)


def _adjacent_pairs(s):
    """symbol array → array<struct<a,b>> of adjacent pairs. Caller must
    guarantee size(s) ≥ 2 (the F.sequence descending-range trap)."""

    def at(i):
        return F.struct(
            F.element_at(s, i).alias("a"),
            F.element_at(s, i + F.lit(1)).alias("b"),
        )

    return F.transform(F.sequence(F.lit(1), F.size(s) - 1), at)


def _apply_merge(s, a: str, b: str):
    """Greedy left-to-right non-overlapping replacement of the adjacent
    symbol pair (a, b) by their concatenation — the BPE apply-merge
    step, as a single ``F.aggregate`` fold so the vocabulary never
    explodes into per-position rows.

    The fold merges when the accumulator's LAST element equals ``a`` and
    the incoming symbol equals ``b``; that is exactly the greedy scan
    because a freshly merged element (``a||b``) can never re-trigger:
    ``a||b == a`` would need ``b`` empty, and symbols are never empty.
    In an equal-symbol run (a == b) the fold therefore merges the 1st,
    3rd, … occurrences — the same floor(run/2) merges the scan takes."""
    merged = F.lit(a + b)

    def step(acc, x):
        out = acc["out"]
        hit = (
            (F.size(out) > 0)
            & (F.element_at(out, F.lit(-1)) == F.lit(a))
            & (x == F.lit(b))
        )
        return F.struct(
            F.when(
                hit,
                F.concat(
                    F.slice(out, F.lit(1), F.size(out) - 1), F.array(merged)
                ),
            )
            .otherwise(F.concat(out, F.array(x)))
            .alias("out")
        )

    def finish(acc):
        return acc["out"]

    return F.aggregate(
        s,
        F.struct(F.expr("cast(array() as array<string>)").alias("out")),
        step,
        finish,
    )


def bpe_merges_iter(
    documents: DataFrame, rounds: int = MERGE_ROUNDS
) -> DataFrame:
    """Iterative BPE tokenizer training: ``rounds`` merge iterations,
    each picking the most frequent adjacent symbol pair over the
    word-frequency table (count desc, then (a, b) lexicographic — the
    deterministic tie-break), APPLYING it to the vocabulary, and
    recounting → (merge_rank, pair_a, pair_b, pair_count). This is the
    real Sennrich training loop; :func:`bpe_merge_candidates` is its
    first iteration's candidate list.

    Shape at 100 TB: the ONLY corpus-sized stage is ``word_counts``
    (one map-side-combined shuffle, run once). Every iteration after
    that is vocabulary-sized — pair counting explodes distinct words
    (Heaps-sublinear), apply-merge is a per-row HOF fold, and the
    per-round driver collect is exactly one (a, b, count) row. Round
    count is a bounded constant (a 50k-merge production run is 50k
    vocab-sized jobs — embarrassingly cheap next to the corpus scan).
    The vocabulary frame is persisted and swapped each round so lineage
    does not accumulate recomputation.

    Stops early when no pair remains (fully merged vocabulary) —
    emitting rows only for completed rounds, which the oracle twin
    mirrors by construction (empty-best rounds are no-ops contributing
    no output rows)."""
    spark = documents.sparkSession
    vocab = (
        word_counts(documents)
        .filter(F.length("w").between(2, MAX_WORD_LEN))
        .select("w", "c", _char_symbols(F.col("w")).alias("s"))
        .persist()
    )
    vocab.count()
    merges: list[tuple[int, str, str, int]] = []
    for r in range(rounds):
        best = (
            vocab.filter(F.size("s") >= 2)
            .select("c", F.explode(_adjacent_pairs(F.col("s"))).alias("p"))
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("c").alias("pc"))
            .orderBy(F.desc("pc"), "a", "b")
            .limit(1)
            .collect()
        )
        if not best:
            break
        a, b, pc = best[0]["a"], best[0]["b"], best[0]["pc"]
        merges.append((r + 1, a, b, pc))
        if r + 1 == rounds:
            break  # last round needs no apply pass
        nxt = vocab.select(
            "w", "c", _apply_merge(F.col("s"), a, b).alias("s")
        ).persist()
        nxt.count()
        vocab.unpersist()
        vocab = nxt
    vocab.unpersist()
    return spark.createDataFrame(
        merges, "merge_rank int, pair_a string, pair_b string, pair_count long"
    )


def bpe_merges_iter_sql(rounds: int = MERGE_ROUNDS) -> str:
    """DuckDB twin: the iteration count is a compile-time constant, so
    the loop UNROLLS into ``rounds`` CTE stages — each stage computes
    the round's best pair (same count-desc/(a,b)-asc tie-break) and
    rebuilds the vocabulary relationally. Apply-merge uses the
    gaps-and-islands formulation of the greedy scan: a matching
    position is merged iff its distance from its run of consecutive
    matches' start is even (for a ≠ b runs are singletons → every match
    merges; for a == b this is the scan's floor(run/2) rule — provably
    the same output as the Spark fold, see :func:`_apply_merge`).
    Out-of-range list indexes are NULL in DuckDB, so the last position's
    pair test coalesces to FALSE, and an empty best (fully merged
    vocabulary) makes its round a no-op emitting no rows — matching the
    Spark early-stop."""
    toks = tokenize_sql("coalesce(text, '')")
    parts = [
        f"""WITH toks AS (
            SELECT unnest({toks}) AS w FROM documents
        ), wc AS (
            SELECT w, count(*) AS c FROM toks GROUP BY w
            HAVING length(w) BETWEEN 2 AND {MAX_WORD_LEN}
        ), v0 AS MATERIALIZED (
            SELECT w, c,
                   list_transform(generate_series(1, length(w)),
                                  i -> substring(w, i, 1)) AS s
            FROM wc
        )"""
    ]
    for r in range(rounds):
        parts.append(f""", p{r} AS MATERIALIZED (
            SELECT s[i] AS a, s[i + 1] AS b, CAST(sum(c) AS BIGINT) AS pc
            FROM v{r}, unnest(generate_series(1, len(s) - 1)) AS u(i)
            GROUP BY 1, 2
        ), best{r} AS MATERIALIZED (
            SELECT a, b, pc FROM p{r} ORDER BY pc DESC, a, b LIMIT 1
        )""")
        if r + 1 < rounds:
            parts.append(f""", hit{r} AS MATERIALIZED (
            SELECT v.w, v.c, v.s, u.i,
                   coalesce(v.s[u.i] = (SELECT a FROM best{r})
                            AND v.s[u.i + 1] = (SELECT b FROM best{r}),
                            FALSE) AS hit
            FROM v{r} v, unnest(generate_series(1, len(v.s))) AS u(i)
        ), runs{r} AS MATERIALIZED (
            SELECT *, i - row_number() OVER (
                PARTITION BY w, hit ORDER BY i) AS rid
            FROM hit{r}
        ), keep{r} AS MATERIALIZED (
            SELECT *, hit AND ((i - min(i) OVER (
                PARTITION BY w, hit, rid)) % 2 = 0) AS kept
            FROM runs{r}
        ), emit{r} AS MATERIALIZED (
            SELECT w, c, i,
                   CASE WHEN kept THEN s[i] || s[i + 1] ELSE s[i] END AS sym,
                   coalesce(lag(kept) OVER (
                       PARTITION BY w ORDER BY i), FALSE) AS absorbed
            FROM keep{r}
        ), v{r + 1} AS MATERIALIZED (
            SELECT w, any_value(c) AS c, list(sym ORDER BY i) AS s
            FROM emit{r} WHERE NOT absorbed GROUP BY w
        )""")
    finals = " UNION ALL ".join(
        f"SELECT CAST({r + 1} AS INT) AS merge_rank, a AS pair_a, "
        f"b AS pair_b, pc AS pair_count FROM best{r}"
        for r in range(rounds)
    )
    parts.append(f" SELECT * FROM ({finals}) ORDER BY merge_rank")
    return "".join(parts)


def bpe_merge_candidates_sql(top_k: int = TOP_K) -> str:
    """DuckDB twin. No LATERAL-with-index: positions come from one
    generate_series up to the longest word, filtered per row
    (CLAUDE.md convention). sum(BIGINT) is HUGEINT in DuckDB — cast
    back so the column hash-compares against Spark's long."""
    toks = tokenize_sql("coalesce(text, '')")
    return f"""
        WITH toks AS (
            SELECT unnest({toks}) AS w FROM documents
        ), wc AS (
            SELECT w, count(*) AS c FROM toks GROUP BY w
            HAVING length(w) BETWEEN 2 AND {MAX_WORD_LEN}
        ), pos AS (
            SELECT w, c, i FROM wc
            CROSS JOIN (SELECT unnest(generate_series(
                1, (SELECT max(length(w)) FROM wc) - 1)) AS i)
            WHERE i <= length(w) - 1
        )
        SELECT substring(w, i, 1) AS pair_a,
               substring(w, i + 1, 1) AS pair_b,
               CAST(sum(c) AS BIGINT) AS pair_count
        FROM pos GROUP BY 1, 2
        ORDER BY pair_count DESC, pair_a, pair_b LIMIT {top_k}
    """
