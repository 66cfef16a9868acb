"""Unit tests for operators/vocab.py (BPE merge candidates): brute-force
pair counting on a hand corpus, word-frequency weighting, degenerate
inputs, and the deterministic top-k cut."""

from __future__ import annotations

from collections import Counter

from mklab_focused_crawler_spark.operators.vocab import bpe_merge_candidates


def _corpus(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _brute(texts):
    import re

    words = Counter()
    for t in texts:
        lowered = "".join(
            chr(ord(c) + 32) if "A" <= c <= "Z" else c for c in (t or "")
        )
        for w in re.split(r"[^a-z0-9]+", lowered):
            if w:
                words[w] += 1
    pairs = Counter()
    for w, c in words.items():
        for i in range(len(w) - 1):
            pairs[(w[i], w[i + 1])] += c
    return pairs


def test_pairs_match_brute_force(spark):
    texts = [
        "the theme of the theater",
        "banana bandana banana",
        "aaa abba a b",
        "",
    ]
    got = {
        (r["pair_a"], r["pair_b"]): r["pair_count"]
        for r in bpe_merge_candidates(_corpus(spark, texts), top_k=1000).collect()
    }
    assert got == dict(_brute(texts))


def test_weighting_uses_word_frequency(spark):
    # "zq" appears in 3 documents -> the (z, q) pair counts 3, and a
    # repeated pair INSIDE one word ("zzz" -> (z,z) twice) counts per
    # position, both per Sennrich's merge-count definition
    texts = ["zq", "zq", "zq zzz"]
    got = {
        (r["pair_a"], r["pair_b"]): r["pair_count"]
        for r in bpe_merge_candidates(_corpus(spark, texts), top_k=10).collect()
    }
    assert got == {("z", "q"): 3, ("z", "z"): 2}


def test_degenerate_corpus(spark):
    # nulls, single-char words and punctuation-only docs produce no pairs
    df = _corpus(spark, [None, "a b c", "!!! ???"])
    assert bpe_merge_candidates(df).count() == 0


def test_topk_cut_is_deterministic(spark):
    # ties at the boundary break on (pair_a, pair_b): corpus with four
    # count-1 pairs, k=2 must keep the lexicographically smallest two
    df = _corpus(spark, ["ab cd ef gh"])
    got = [
        (r["pair_a"], r["pair_b"])
        for r in bpe_merge_candidates(df, top_k=2).collect()
    ]
    assert got == [("a", "b"), ("c", "d")]


def test_overlong_words_are_capped(spark):
    """A pathological unbroken token (> MAX_WORD_LEN) contributes no
    pairs — mirrored in the SQL twin's HAVING."""
    from mklab_focused_crawler_spark.operators.vocab import MAX_WORD_LEN

    df = _corpus(spark, ["x" * (MAX_WORD_LEN + 1), "ok"])
    got = {
        (r["pair_a"], r["pair_b"]): r["pair_count"]
        for r in bpe_merge_candidates(df, top_k=10).collect()
    }
    assert got == {("o", "k"): 1}
