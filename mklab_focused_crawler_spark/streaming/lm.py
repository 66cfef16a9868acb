"""Streaming perplexity bucketing: score documents against the
INCREMENTAL word-frequency store instead of a batch-built LM.

The CCNet reference LM (operators/lm.py) is a unigram count table —
exactly what the streaming vocabulary ingest already maintains
(streaming/vocab.py: bucket-partitioned additive deltas, tagged
replay-safe appends, roll-up maintenance). So the streaming twin is a
thin composition, not new state machinery: feed the reference corpus
through ``run_streaming_vocab_ingest`` as it arrives, then score any
batch of documents against the accumulated counts with the SAME
``score_with_vocab`` kernel the batch operator uses.

Because word counts are additive and scoring is a pure function of the
final counts, the convergence contract is exact: once the ingested
batches cover the reference slice, ``streaming_ppl_buckets`` equals
batch ``ppl_buckets`` on the same documents, independent of how
arrival split the reference corpus (pinned over adversarial splits in
tests/test_streaming.py). Mid-stream scores are early estimates under
a partial LM — the CCNet deployment shape, where the cutoff file is
also trained once and applied to a rolling crawl.

Scale: the vocab read is one aggregate over the delta table (rows ∝
distinct words after roll-up, never ∝ batches); scoring inherits the
batch kernel's shape — map-combined per-(doc,word) counts, AQE
broadcast of the vocab while it fits, integer-micro sums.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.lm import score_with_vocab
from .vocab import vocab_counts


def streaming_ppl_buckets(
    spark: SparkSession, store_root: str, documents: DataFrame
) -> DataFrame:
    """(doc_id, n_tokens, nlp_micro, ppl_bucket) for ``documents``,
    scored against everything the vocabulary store at ``store_root``
    has ingested so far."""
    docs = documents.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.coalesce(F.col("text"), F.lit("")).alias("text"),
    )
    vocab = vocab_counts(spark, store_root).select(
        "w", F.col("c").alias("c_w")
    )
    return score_with_vocab(docs, vocab)
