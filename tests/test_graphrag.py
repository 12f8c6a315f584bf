"""Invariants for graph/RAG/robust-outlier queries (queries/graphrag.py).

The oracle harness proves value-equality vs DuckDB (including the
triangle count vs a naive i<j 3-way join — an independent algorithm);
these pin the structural contracts.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from chiv_spark.queries import REGISTRY
from chiv_spark.queries.graphrag import _CHUNK, _STRIDE

SF = "/root/testdata/sf0.001"


def test_triangle_count_shape(spark):
    row = REGISTRY["graph_triangle_count"].fn(spark, SF).collect()[0]
    assert row["n_nodes"] > 0 and row["n_edges"] > 0
    # clustering coefficient is a closed-wedge fraction
    assert 0.0 <= row["clustering_coeff"] <= 1.0
    # an undirected simple graph has at most C(n,2) edges and C(n,3) triangles
    n = row["n_nodes"]
    assert row["n_edges"] <= n * (n - 1) // 2
    assert row["n_triangles"] <= n * (n - 1) * (n - 2) // 6


def test_rag_chunks_cover_all_tokens(spark):
    out = REGISTRY["pipeline_rag_chunks"].fn(spark, SF).cache()
    try:
        assert out.filter(F.col("n_tokens") > _CHUNK).count() == 0
        # strided starts cover the whole doc: summed unique coverage
        # (chunk_idx*stride .. chunk_idx*stride+n_tokens) reaches the
        # doc's token count — check via per-doc max extent == doc tokens
        docs = (
            spark.read.parquet(f"{SF}/documents.parquet")
            .select(
                "doc_id",
                F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("n_tok"),
            )
        )
        extent = out.groupBy("doc_id").agg(
            F.max(F.col("chunk_idx") * _STRIDE + F.col("n_tokens")).alias("covered")
        )
        bad = extent.join(docs, "doc_id").filter(F.col("covered") != F.col("n_tok"))
        assert bad.count() == 0
        # consecutive chunks overlap by CHUNK - STRIDE when both are full
        assert _CHUNK > _STRIDE
    finally:
        out.unpersist()


def test_mad_outliers_bounded(spark):
    rows = REGISTRY["events_anomaly_mad"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["mad"] >= 0
        assert 0 <= r["n_outliers"] <= r["n_events"]
        # a 3-sigma-equivalent robust cutoff keeps outliers a small minority
        assert r["n_outliers"] < 0.5 * r["n_events"]
