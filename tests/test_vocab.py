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


# ---------------------------------------------------------------------------
# iterative BPE training (bpe_merges_iter) vs a pure-Python re-derivation
# ---------------------------------------------------------------------------


def _word_counts(texts):
    import re

    words = Counter()
    for t in texts:
        lowered = "".join(
            chr(ord(c) + 32) if "A" <= c <= "Z" else c for c in (t or "")
        )
        for w in re.split(r"[^a-z0-9]+", lowered):
            if w:
                words[w] += 1
    return words


def _brute_bpe(texts, rounds):
    """Sennrich Algorithm 1, straight from the paper: count adjacent
    symbol pairs over the word-frequency table, take the max (count
    desc, (a, b) asc), apply it greedily left-to-right, repeat.
    Independent of the operator's HOF-fold formulation."""
    words = _word_counts(texts)
    vocab = {w: list(w) for w in words if 2 <= len(w) <= 1024}
    merges = []
    for r in range(rounds):
        pairs = Counter()
        for w, syms in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += words[w]
        if not pairs:
            break
        (a, b), pc = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((r + 1, a, b, pc))
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges


def _iter_rows(spark, texts, rounds):
    from mklab_focused_crawler_spark.operators.vocab import bpe_merges_iter

    return [
        (r["merge_rank"], r["pair_a"], r["pair_b"], r["pair_count"])
        for r in bpe_merges_iter(_corpus(spark, texts), rounds=rounds)
        .orderBy("merge_rank")
        .collect()
    ]


def test_bpe_iter_matches_paper_algorithm(spark):
    """R=6 rounds on a corpus engineered to exercise multi-char merges
    (a merged symbol wins a later round), equal-symbol runs (greedy
    floor(run/2)), and count ties broken on (a, b)."""
    texts = [
        "the theme of the theater thethe",
        "banana bandana banana",
        "aaaa aaa abab ababab",
        "low lower lowest low low",
        "",
    ]
    assert _iter_rows(spark, texts, 6) == _brute_bpe(texts, 6)


def test_bpe_iter_merged_symbols_pair_up(spark):
    """A corpus where round 2's winning pair contains round 1's merged
    symbol — the recount must run over the POST-merge vocabulary."""
    texts = ["abab abab abab"]
    got = _iter_rows(spark, texts, 3)
    assert got == _brute_bpe(texts, 3)
    # round 1 merges (a,b) everywhere; round 2 must see ("ab","ab")
    assert got[0][1:3] == ("a", "b")
    assert got[1][1:3] == ("ab", "ab")


def test_bpe_iter_stops_when_fully_merged(spark):
    """Early stop: once every word is a single symbol there is no pair
    left — rows are emitted only for completed rounds (the oracle twin
    mirrors this via empty-best no-op rounds)."""
    texts = ["ab ab ab"]
    got = _iter_rows(spark, texts, 5)
    assert got == _brute_bpe(texts, 5) == [(1, "a", "b", 3)]
