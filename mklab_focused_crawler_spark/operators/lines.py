"""Line-level corpus hygiene: cross-document duplicated-line removal
(the CCNet/Dolma paragraph-dedup step) and within-document line
repetition signals (the line-granular half of the Gopher repetition
battery that ``operators/quality.py`` covers at token/n-gram
granularity).

Published pipelines run line/paragraph dedup BEFORE document-level
near-dup: boilerplate ("all rights reserved…", nav bars, cookie
banners) repeats across millions of pages, inflates Jaccard
similarity between otherwise-unrelated documents, and survives
document-level dedup because the surrounding text differs. CCNet
(Wenzek et al. 2019) drops duplicated paragraphs by hash across
shards; Dolma and RefinedWeb keep the first occurrence. This module
implements the keep-first rule, order-free (minimum packed
``(doc_id, line_pos)`` wins — same convention as
``substr_dedup.substring_dedup``), so the operator is a well-defined
function of the corpus and distributes/replays trivially.

Shape at 100 TB (``line_dedup``): one explode to
(doc_id, pos, line-hash) — hashed AFTER the explode so md5 runs once
per occurrence (projection-collapse convention) — a map-side-combined
groupBy on the 8-byte hash keeping ``min(pack)``, an inner join of the
occurrence stream against the (much smaller, cnt≥2) duplicated-line
frame with the big side streaming, a per-doc groupBy of dropped
POSITIONS (8 bytes each, rows ∝ dropped lines), and one
broadcast-friendly left join back onto the corpus. The corpus text
crosses a shuffle zero times; reconstruction is a whole-stage-codegen
indexed ``filter`` HOF. A boilerplate line shared by 10^8 documents is
one hot join key, never a collect_list straggler row — each occurrence
row matches exactly one ``firsts`` row, so skew widens a partition
(AQE splits it) without any row blowup.

``repetition_signals`` is a pure narrow map (zero shuffles, no
Exchange in the plan): duplicate-line counts/chars come from
``array_distinct`` length/char deltas — occurrences after the first of
a value are exactly ``n - n_distinct`` — evaluated per row inside
codegen.

Reference analog: the reference dedups whole documents by content hash
(``WebPagesUpdaterBolt.java`` exists-then-insert) and has no
sub-document tier; this module is part of the LLM-pipeline layer the
north-star adds on top.

Because the fixture corpus is single-line and all-distinct, queries
run over a deterministically **augmented corpus**
(:func:`augment_lines`, mirrored in SQL) that plants per-source header
lines, per-``doc_id%5`` footer lines, a within-document repeated
footer on ``doc_id%4==0``, and a short always-kept ad line — so both
operators provably exercise cross-doc dedup, within-doc dedup, and the
eligibility gate on a known structure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import hash64, hash64_sql

# Lines shorter than this never dedup (CCNet keeps short lines: "OK",
# list bullets, and code indentation repeat legitimately). Raw length,
# not trimmed — mirrored exactly in SQL.
MIN_LINE_CHARS = 12
# position packing: doc_id * 2^20 + pos, exact int64 in both engines
# (shared convention with substr_dedup.POS_PACK).
POS_PACK = 1 << 20


def boilerplate_text(did, source, text):
    """The deterministic boilerplate-injection expression (header/
    footer/ad lines) — exposed so the composed pipeline's augment can
    plant the SAME line structure the line-dedup fixtures are tested
    on. header: repeats per source → cross-doc duplicate, eligible.
    footer: repeats per doc_id%5 class; doc_id%4==0 docs carry it twice
    → within-doc duplicate. ad line: 4-6 chars, repeats everywhere but
    is below MIN_LINE_CHARS → always kept (gate coverage)."""
    header = F.concat(
        F.lit("all rights reserved by "), F.coalesce(source, F.lit("unknown"))
    )
    footer = F.concat(
        F.lit("subscribe to the newsletter edition "),
        (did % 5).cast("string"),
    )
    ad = F.concat(F.lit("ad "), (did % 3).cast("string"))
    return F.concat_ws(
        "\n",
        header,
        F.coalesce(text, F.lit("")),
        footer,
        F.when(did % 4 == 0, footer),
        ad,
    )


def boilerplate_text_sql(
    id_expr: str = "doc_id",
    source_expr: str = "source",
    text_expr: str = "coalesce(text, '')",
) -> str:
    footer = (
        f"'subscribe to the newsletter edition ' || CAST({id_expr} % 5 AS VARCHAR)"
    )
    return f"""concat_ws(chr(10),
                   'all rights reserved by ' || coalesce({source_expr}, 'unknown'),
                   {text_expr},
                   {footer},
                   CASE WHEN {id_expr} % 4 = 0 THEN {footer} END,
                   'ad ' || CAST({id_expr} % 3 AS VARCHAR)
               )"""


def augment_lines(documents: DataFrame) -> DataFrame:
    """Deterministic multi-line corpus (twin: :func:`augment_lines_sql`);
    see :func:`boilerplate_text` for the injected line structure."""
    text2 = boilerplate_text(F.col("doc_id"), F.col("source"), F.col("text"))
    return documents.select("doc_id", "source", text2.alias("text"))


def augment_lines_sql() -> str:
    return f"""(
        SELECT doc_id, source, {boilerplate_text_sql()} AS text
        FROM documents
    )"""


def line_dedup(corpus: DataFrame) -> DataFrame:
    """(doc_id, n_lines, n_dropped, clean_text) — one row per document.

    A line occurrence (length ≥ MIN_LINE_CHARS) is dropped iff its line
    value occurs elsewhere in the corpus with a smaller packed
    (doc_id, pos); shorter lines always survive. ``clean_text`` is the
    kept lines re-joined with newlines.
    """
    docs = corpus.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.split(F.coalesce(F.col("text"), F.lit("")), "\n").alias("parts"),
    )
    occ = (
        docs.select("doc_id", F.posexplode("parts").alias("pos", "line"))
        .filter(F.length("line") >= MIN_LINE_CHARS)
        .select(
            "doc_id",
            "pos",
            hash64(F.col("line")).alias("lh"),
            (F.col("doc_id") * POS_PACK + F.col("pos")).alias("pack"),
        )
    )
    firsts = (
        occ.groupBy("lh")
        .agg(F.count(F.lit(1)).alias("cnt"), F.min("pack").alias("first_pack"))
        .filter(F.col("cnt") >= 2)
        .select("lh", "first_pack")
    )
    # big occurrence stream left / filtered dup frame right: AQE
    # broadcasts the small side at fixture scale, shuffle-hashes on the
    # 8-byte key at 100 TB (the substring_dedup join shape)
    dropped = (
        occ.join(firsts, "lh")
        .filter(F.col("pack") != F.col("first_pack"))
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_list("pos")).alias("dropped_pos"))
    )
    joined = docs.join(dropped, "doc_id", "left").select(
        "doc_id",
        "parts",
        F.coalesce(F.col("dropped_pos"), F.array().cast("array<int>")).alias(
            "dropped_pos"
        ),
    )
    kept = F.filter(
        F.col("parts"),
        lambda x, i: ~F.array_contains(F.col("dropped_pos"), i),
    )
    return joined.select(
        "doc_id",
        F.size("parts").cast("int").alias("n_lines"),
        F.size("dropped_pos").cast("int").alias("n_dropped"),
        F.array_join(kept, "\n").alias("clean_text"),
    )


def line_dedup_sql(corpus_src: str | None = None) -> str:
    """DuckDB twin over the same augmented corpus (zipped unnest for
    position+line alignment, string_agg ORDER BY for reconstruction —
    comparison-scale forms only). ``corpus_src`` re-points the corpus
    at another FROM-able source (the composed-pipeline twin)."""
    return f"""
        WITH corpus AS (SELECT * FROM {corpus_src or augment_lines_sql()}),
        d AS (
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   string_split(coalesce(text, ''), chr(10)) AS parts
            FROM corpus
        ),
        lines AS (
            SELECT doc_id,
                   CAST(unnest(range(0, len(parts))) AS INT) AS pos,
                   unnest(parts) AS line
            FROM d
        ),
        elig AS (
            SELECT doc_id, pos, {hash64_sql("line")} AS lh,
                   doc_id * {POS_PACK} + pos AS pack
            FROM lines WHERE length(line) >= {MIN_LINE_CHARS}
        ),
        firsts AS (
            SELECT lh, min(pack) AS first_pack
            FROM elig GROUP BY lh HAVING count(*) >= 2
        ),
        dropped AS (
            SELECT e.doc_id, e.pos
            FROM elig e JOIN firsts f USING (lh)
            WHERE e.pack <> f.first_pack
        ),
        kept AS (
            SELECT l.doc_id, l.pos, l.line
            FROM lines l LEFT JOIN dropped dr
              ON l.doc_id = dr.doc_id AND l.pos = dr.pos
            WHERE dr.pos IS NULL
        ),
        recon AS (
            SELECT doc_id,
                   string_agg(line, chr(10) ORDER BY pos) AS clean_text,
                   count(*) AS n_kept
            FROM kept GROUP BY doc_id
        )
        SELECT d.doc_id,
               CAST(len(d.parts) AS INT) AS n_lines,
               CAST(len(d.parts) - coalesce(r.n_kept, 0) AS INT) AS n_dropped,
               coalesce(r.clean_text, '') AS clean_text
        FROM d LEFT JOIN recon r USING (doc_id)
        ORDER BY d.doc_id
    """


def repetition_signals(corpus: DataFrame) -> DataFrame:
    """(doc_id, n_lines, dup_lines, dup_line_frac, dup_chars,
    dup_char_frac) — within-document line repetition, one row per doc.

    dup counts are occurrences AFTER the first of each line value:
    n - n_distinct lines, total_chars - distinct_chars characters
    (equal strings have equal length, so which occurrence
    array_distinct keeps is immaterial). Pure narrow map — no shuffle.
    """
    d = corpus.select(
        "doc_id",
        F.split(F.coalesce(F.col("text"), F.lit("")), "\n").alias("lines"),
    )

    def _chars(col: F.Column) -> F.Column:
        return F.aggregate(
            col, F.lit(0).cast("int"), lambda acc, x: acc + F.length(x)
        )

    base = d.select(
        "doc_id",
        F.size("lines").alias("n"),
        F.size(F.array_distinct("lines")).alias("nd"),
        _chars(F.col("lines")).alias("tc"),
        _chars(F.array_distinct("lines")).alias("dc"),
    )

    def _frac(num: F.Column, den: F.Column) -> F.Column:
        return F.round(
            F.when(
                den > 0, num.cast("double") / den.cast("double")
            ).otherwise(F.lit(0.0)),
            6,
        )

    n, nd = F.col("n"), F.col("nd")
    tc, dc = F.col("tc"), F.col("dc")
    return base.select(
        "doc_id",
        n.cast("int").alias("n_lines"),
        (n - nd).cast("int").alias("dup_lines"),
        _frac(n - nd, n).alias("dup_line_frac"),
        (tc - dc).cast("int").alias("dup_chars"),
        _frac(tc - dc, tc).alias("dup_char_frac"),
    )


def repetition_signals_sql() -> str:
    def frac(num: str, den: str) -> str:
        return (
            f"round(CASE WHEN {den} > 0 THEN CAST({num} AS DOUBLE) / "
            f"CAST({den} AS DOUBLE) ELSE 0.0 END, 6)"
        )

    chars = "coalesce(list_sum(list_transform({c}, x -> length(x))), 0)"
    tc = chars.format(c="lines")
    dc = chars.format(c="list_distinct(lines)")
    return f"""
        WITH corpus AS (SELECT * FROM {augment_lines_sql()}),
        d AS (
            SELECT doc_id,
                   string_split(coalesce(text, ''), chr(10)) AS lines
            FROM corpus
        ),
        base AS (
            SELECT doc_id,
                   len(lines) AS n,
                   len(list_distinct(lines)) AS nd,
                   {tc} AS tc,
                   {dc} AS dc
            FROM d
        )
        SELECT doc_id,
               CAST(n AS INT) AS n_lines,
               CAST(n - nd AS INT) AS dup_lines,
               {frac("n - nd", "n")} AS dup_line_frac,
               CAST(tc - dc AS INT) AS dup_chars,
               {frac("tc - dc", "tc")} AS dup_char_frac
        FROM base ORDER BY doc_id
    """
