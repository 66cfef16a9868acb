"""Sequence packing: concatenate documents (per source shard, in
doc_id order) into fixed-length training sequences and emit the
chunk→document-piece map — the "concat and chunk" step every public LM
training pipeline runs between curation and tokenizer output (GPT-2/3,
The Pile, C4 all train on fixed-length windows over concatenated
documents).

Output: one row per (document, chunk) incidence —

    (source, chunk_id, doc_id, piece_start, piece_len)

where ``piece_start`` is the 0-based token offset *within the
document* and the piece covers tokens ``[piece_start, piece_start +
piece_len)`` of that document, landing in training chunk ``chunk_id``
of that source. A document longer than SEQ_LEN spans several chunks;
every chunk except a source's last is exactly SEQ_LEN tokens of
pieces (asserted in tests).

Shape at 100 TB:

- The ONLY shuffle is the per-source window sort (cum-sum of token
  counts). That sort IS the operator's contract — packing is defined
  by a total order within a shard. ``source`` here is the shard key:
  a production corpus is already sharded (source × date × part), so
  each window partition is one shard, never the whole corpus, and the
  windows are all partitioned (the CLAUDE.md rule: no unpartitioned
  window anywhere).
- Everything else is integer column math + one explode; the text
  column itself never moves — only token COUNTS shuffle (8 bytes/doc),
  then the chunk map joins back to the corpus by doc_id downstream.
- Zero-token documents occupy no chunk and are dropped from the map
  (they'd emit empty pieces); ``F.sequence`` never sees an empty range
  (the sequence(0,-1) trap — first_chunk ≤ last_chunk holds whenever
  n_tokens ≥ 1).

Cross-engine: pure integer arithmetic over the portable tokenizer's
counts — exact by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import tokenize, tokenize_sql

SEQ_LEN = 128


def sequence_pack(documents: DataFrame, seq_len: int = SEQ_LEN) -> DataFrame:
    """(source, chunk_id, doc_id, piece_start, piece_len): the packing
    map at ``seq_len`` tokens per training sequence."""
    L = F.lit(int(seq_len))
    docs = documents.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.coalesce(F.col("source"), F.lit("")).alias("source"),
        F.size(tokenize(F.coalesce(F.col("text"), F.lit("")))).cast("long").alias(
            "n_tokens"
        ),
    )
    w = Window.partitionBy("source").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    docs = docs.withColumn(
        "cum_before", (F.sum("n_tokens").over(w) - F.col("n_tokens"))
    ).filter(F.col("n_tokens") > 0)
    docs = docs.select(
        "source",
        "doc_id",
        "n_tokens",
        "cum_before",
        F.floor(F.col("cum_before") / L).alias("first_chunk"),
        F.floor((F.col("cum_before") + F.col("n_tokens") - 1) / L).alias(
            "last_chunk"
        ),
    )
    pieces = docs.select(
        "source",
        "doc_id",
        "n_tokens",
        "cum_before",
        F.explode(
            F.sequence(F.col("first_chunk"), F.col("last_chunk"))
        ).alias("chunk_id"),
    )
    gstart = F.greatest(F.col("cum_before"), F.col("chunk_id") * L)
    gend = F.least(
        F.col("cum_before") + F.col("n_tokens"), (F.col("chunk_id") + 1) * L
    )
    return pieces.select(
        "source",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        "doc_id",
        (gstart - F.col("cum_before")).cast("int").alias("piece_start"),
        (gend - gstart).cast("int").alias("piece_len"),
    )


def sequence_pack_sql(seq_len: int = SEQ_LEN, table: str = "documents") -> str:
    L = int(seq_len)
    toks = tokenize_sql("coalesce(text, '')")
    return f"""
        WITH d AS (
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   COALESCE(source, '') AS source,
                   CAST(len({toks}) AS BIGINT) AS n_tokens
            FROM {table}
        ),
        c AS (
            -- DuckDB windowed sum(BIGINT) widens to HUGEINT; pin BIGINT
            SELECT source, doc_id, n_tokens,
                   CAST(sum(n_tokens) OVER (
                       PARTITION BY source ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) - n_tokens AS BIGINT) AS cum_before
            FROM d
        ),
        spans AS (
            SELECT source, doc_id, n_tokens, cum_before,
                   cum_before // {L} AS first_chunk,
                   (cum_before + n_tokens - 1) // {L} AS last_chunk
            FROM c WHERE n_tokens > 0
        ),
        pieces AS (
            SELECT source, doc_id, n_tokens, cum_before,
                   unnest(generate_series(first_chunk, last_chunk)) AS chunk_id
            FROM spans
        )
        SELECT source,
               CAST(chunk_id AS BIGINT) AS chunk_id,
               doc_id,
               CAST(greatest(cum_before, chunk_id * {L}) - cum_before AS INT)
                   AS piece_start,
               CAST(least(cum_before + n_tokens, (chunk_id + 1) * {L})
                    - greatest(cum_before, chunk_id * {L}) AS INT) AS piece_len
        FROM pieces
        ORDER BY source, chunk_id, doc_id
    """
