"""sf1 scaling probe for the quadratic-sensitive queries (VERDICT r2
item 7): run each at sf0.1 and at a 10x deterministic sf1, report the
time ratio, and flag anything super-linear beyond its documented
candidate-volume model.

sf1 synthesis (deterministic, no external data; written to
BENCH/sf1_data/, regenerated on demand, never committed):

- ``documents`` (50,000 rows): the sf0.1 corpus replicated 10x with
  per-replica VOCABULARY NAMESPACING — replica k>0 suffixes every
  [A-Za-z0-9]+ token run with ``q9<k>`` (alphanumeric, so the engine's
  ``[^a-z0-9]+`` tokenizer keeps it attached). Replicas therefore share
  ZERO shingles: the corpus is 10 disjoint copies of the sf0.1
  similarity structure, each with its own vocabulary — exact-dup groups,
  near-dup pairs and band buckets all scale exactly 10x (more topics,
  same local density — how a larger web actually grows). Any
  super-linear time on this input is the ALGORITHM's, not the data's.
- ``embeddings`` (20,000 rows): fresh standard-normal 64-dim vectors
  (fixed-seed RandomState), the fixture's distribution shape. Bucket
  occupancy under fixed-width LSH/IVF grows linearly with n, so the
  probe-join families carry their documented O(n^2 / 2^b)-flavored
  candidate models (bounds below).

Expected-ratio model at 10x rows (flag when measured > bound):

- dedup family (minhash_lsh_pairs, simhash_pairs, jaccard_topk,
  duplicate_clusters): disjoint namespaces => linear work; bound 15x
  (10x + fixed-cost slack).
- probe-join ANN + brute force (cosine_topk, cosine_topk_gemm,
  ann_topk, ann_topk_multi, ivf_topk, embedding_near_dups): probes x
  per-probe candidates both scale ~10x => quadratic 100x candidate
  bound; fixed costs dominate at this absolute scale so measured ratios
  should land far below it — the bound only catches something worse
  than the model (an accidental full cross join, a lost pushdown).

Usage: python bench_sf1.py   (one JSON line + BENCH/SF1.md)
"""

from __future__ import annotations

import json
import os
import shutil
import time

import numpy as np

SF01_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
# per-query JIT warm-up input: without it the sf0.1 leg (always first)
# is charged each query's whole-stage-codegen compilation and the
# ratios read misleadingly SUB-linear (measured: minhash 20.7s cold at
# sf0.1 vs 17.0s warm at sf1 in the same JVM)
WARM_DIR = os.environ.get("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.01")
SF1_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH", "sf1_data")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

QUADRATIC = {
    # query -> documented ratio bound at 10x rows
    "minhash_lsh_pairs": 15.0,
    "simhash_pairs": 15.0,
    "jaccard_topk": 15.0,
    "duplicate_clusters": 15.0,
    "cosine_topk": 100.0,
    "cosine_topk_gemm": 100.0,
    "ann_topk": 100.0,
    "ann_topk_multi": 100.0,
    "ivf_topk": 100.0,
    "embedding_near_dups": 100.0,
    # r4 additions: semantic_dedup's within-cluster pair volume is the
    # quadratic risk (n^2/k with the codebook retrained per corpus);
    # the three corpus-hygiene maps are linear by construction and
    # carry the linear bound to catch a lost pushdown / accidental join
    "semantic_dedup": 100.0,
    "doc_quality": 15.0,
    "dataset_mix": 15.0,
    "decontaminate": 15.0,
    # substring dedup: dup-gram groupBy + occurrence join — candidate
    # volume ∝ duplicated-gram occurrences, linear on the namespaced
    # corpus (replicas share zero grams)
    "substring_dedup": 15.0,
    # round-4 pipeline maps: linear by construction; the bound catches
    # a lost pushdown, an accidental join, or a collapsed partition
    "pii_redact": 15.0,
    "dsir_weights": 15.0,
    "sequence_pack": 15.0,
    "token_stats": 15.0,
    # line-level hygiene: line_dedup's join candidate volume is ∝
    # duplicated-line occurrences (planted boilerplate repeats, so it
    # grows linearly with docs); repetition_signals is a narrow map;
    # near_dup_filter is duplicate_clusters + one id-only join
    "line_dedup": 15.0,
    "repetition_signals": 15.0,
    "near_dup_filter": 15.0,
    # domain_quota is two linear passes + a vocab-sized window;
    # bpe_merges' only corpus-sized stage is the word groupBy (pair
    # enumeration runs on the vocabulary, sub-linear by Heaps' law)
    "domain_quota": 15.0,
    "bpe_merges": 15.0,
    # shard_shuffle: one hash exchange + per-shard sorts (n log n / N
    # per task); corpus_stats: one Expand+aggregate pass — both linear
    "shard_shuffle": 15.0,
    "corpus_stats": 15.0,
    # ppl_buckets: on the namespaced corpus every replica carries a
    # disjoint vocabulary, so the LM counts, the per-(doc,word) frame
    # and the vocab join all grow 10x — linear by construction
    "ppl_buckets": 15.0,
    # lexicon_filter: zero-shuffle narrow map — the bound catches a
    # lost pushdown or collapsed partition
    "lexicon_filter": 15.0,
    # round-5 additions: bpe_merges_iter adds R vocabulary-sized rounds
    # on top of the linear word groupBy; ivf_pq_topk is the probe-join
    # family plus per-corpus driver training (derived k grows with n,
    # sample stays ~256·k); pipeline_e2e chains only linear stages plus
    # the LSH build on the namespaced corpus
    "bpe_merges_iter": 15.0,
    "ivf_pq_topk": 100.0,
    "pipeline_e2e": 15.0,
}

# The LSH family shares a per-corpus artifact cache at the entry layer
# (PLANS.md #31). The probe must measure the FULL self-contained
# pipeline per leg — a warm cache would reduce the ratio to the
# expansion stage and hide a build-stage blowup — so the cache is
# cleared before every timed pass of these queries.
_LSH_FAMILY = {"minhash_lsh_pairs", "duplicate_clusters", "near_dup_filter"}

N_EMB_SF1 = 20_000
EMB_DIM = 64
REPLICAS = 10
DOC_ID_STRIDE = 10_000_000


def build_sf1(spark) -> None:
    from pyspark.sql import functions as F

    if os.path.exists(os.path.join(SF1_DIR, "_DONE")):
        return
    shutil.rmtree(SF1_DIR, ignore_errors=True)
    os.makedirs(SF1_DIR, exist_ok=True)

    docs = spark.read.parquet(f"{SF01_DIR}/documents.parquet")
    parts = []
    for k in range(REPLICAS):
        d = docs
        if k:
            d = d.withColumn(
                "text", F.regexp_replace("text", "([A-Za-z0-9]+)", f"$1q9{k}")
            )
        parts.append(d.withColumn("doc_id", F.col("doc_id") + F.lit(k * DOC_ID_STRIDE)))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(32).write.mode("overwrite").parquet(
        os.path.join(SF1_DIR, "documents.parquet")
    )

    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.RandomState(12301)
    emb = rng.normal(size=(N_EMB_SF1, EMB_DIM)).astype(np.float32)
    table = pa.table(
        {
            "vec_id": pa.array(np.arange(N_EMB_SF1, dtype=np.int64)),
            "embedding": pa.array([row.tolist() for row in emb], pa.list_(pa.float32())),
            "label": pa.array((np.arange(N_EMB_SF1) % 10).astype(np.int32)),
        }
    )
    pq.write_table(table, os.path.join(SF1_DIR, "embeddings.parquet"))
    open(os.path.join(SF1_DIR, "_DONE"), "w").write("ok")


def _time(fn, spark, sf_dir) -> float:
    t0 = time.monotonic()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return round(time.monotonic() - t0, 3)


def main() -> None:
    import __spark_entry__ as entry
    from mklab_focused_crawler_spark.session import get_spark

    spark = get_spark(
        "bench-sf1", master=f"local[{CPUS}]", shuffle_partitions=int(CPUS)
    )
    build_sf1(spark)
    qs = entry.queries()
    rows = []
    def _timed(name, sf_dir):
        if name in _LSH_FAMILY:
            entry.clear_lsh_cache()
        if name == "pipeline_e2e":
            # same honesty rule: every timed leg pays the full build
            entry.clear_pipeline_cache()
        return _time(qs[name], spark, sf_dir)

    for name, bound in QUADRATIC.items():
        _time(qs[name], spark, WARM_DIR)  # untimed: JIT/codegen warm-up
        # min-of-2 per leg: same co-tenant rationale as bench.py
        t01 = min(_timed(name, SF01_DIR) for _ in range(2))
        t1 = min(_timed(name, SF1_DIR) for _ in range(2))
        ratio = round(t1 / t01, 2) if t01 > 0 else float("inf")
        rows.append(
            {
                "query": name,
                "sf0.1_s": t01,
                "sf1_s": t1,
                "ratio": ratio,
                "bound": bound,
                "super_linear": ratio > bound,
            }
        )
        print(f"{name}: {t01}s -> {t1}s (x{ratio}, bound x{bound})", flush=True)

    flagged = [r["query"] for r in rows if r["super_linear"]]
    with open("BENCH/SF1.md", "w") as f:
        f.write(
            "# BENCH/SF1 — 10x scaling probe (quadratic-sensitive queries)\n\n"
            "Input: sf1 = 10x sf0.1 (50k namespaced documents, 20k fresh\n"
            "embeddings — see bench_sf1.py header for the construction and\n"
            "why the dedup family's work is provably linear on it).\n"
            f"local[{CPUS}], per-query sf0.01 JIT warm-up, min-of-2 runs per "
            f"scale, noop sink.\n\n"
            "| query | sf0.1 s | sf1 s | ratio | model bound | flag |\n"
            "|---|---|---|---|---|---|\n"
        )
        for r in rows:
            flag = "**SUPER-LINEAR**" if r["super_linear"] else "ok"
            f.write(
                f"| {r['query']} | {r['sf0.1_s']} | {r['sf1_s']} "
                f"| x{r['ratio']} | x{r['bound']} | {flag} |\n"
            )
        f.write(
            f"\nFlagged: {flagged or 'none'}. Dedup-family bound 15x = linear\n"
            "10x + fixed-cost slack; probe-join families carry the documented\n"
            "candidate-volume model (L*n^2/2^b et al.) whose 100x bound only\n"
            "catches plans worse than the model.\n"
        )
    print(json.dumps({"metric": "sf1_quadratic_probe", "queries": rows, "flagged": flagged}))
    spark.stop()


if __name__ == "__main__":
    main()
