"""Similarity-operator unit tests beyond the oracle parity layer:
GEMM probe chunking (result must be chunk-boundary-independent) and the
deterministic IVF k-means training job (recall vs brute force)."""

from __future__ import annotations

from conftest import SF01_DIR

from mklab_focused_crawler_spark.operators import similarity as sim


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_gemm_chunking_forced(spark):
    """cosine_topk_gemm with chunk < probe count (forcing the multi-pass
    union) is bit-identical to the single-chunk run and to the zip_with
    brute force — the (dot desc, vec_id asc) comparator is total, so
    per-chunk top-k unions are exact."""
    emb = spark.read.parquet(f"{SF01_DIR}/embeddings.parquet")
    n_probes = emb.filter(f"vec_id % {sim.PROBE_MOD} = 0").count()
    assert n_probes > 3, "fixture must have enough probes to force chunks"
    chunked = _rows(sim.cosine_topk_gemm(emb, chunk=3))
    single = _rows(sim.cosine_topk_gemm(emb))
    brute = _rows(sim.cosine_topk(emb))
    assert chunked == single == brute
