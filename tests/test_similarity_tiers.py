"""Similarity-tier consistency: the LSH path must rank by the same
metric (cosine) as the brute-force tier."""

from __future__ import annotations

from exam_pdf_parser_spark.operators.similarity import (
    cosine_topk_pandas, lsh_bucketed_topk,
)
from exam_pdf_parser_spark.sources.io import load

SF = "/root/testdata/sf0.001"


def test_lsh_recall_against_brute_force(spark):
    emb = load(spark, SF, "embeddings").persist()
    queries = emb.filter("vec_id < 10")
    exact = cosine_topk_pandas(emb, queries, k=5).collect()
    approx = lsh_bucketed_topk(emb, queries, k=5, n_planes=8).collect()

    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    approx_sets = {}
    for r in approx:
        approx_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])

    # same metric → overlap should be substantial (recall of the
    # 1-bit-probe LSH at 8 planes); metric mismatch would tank this
    recalls = [
        len(exact_sets[q] & approx_sets.get(q, set())) / len(exact_sets[q])
        for q in exact_sets
    ]
    assert sum(recalls) / len(recalls) >= 0.4, recalls
    emb.unpersist()


def test_ivf_recall_against_brute_force(spark):
    from exam_pdf_parser_spark.operators.similarity import ivf_topk

    emb = load(spark, SF, "embeddings").persist()
    queries = emb.filter("vec_id < 10")
    exact = cosine_topk_pandas(emb, queries, k=5).collect()
    approx = ivf_topk(emb, queries, k=5, n_clusters=8, n_probe=3).collect()

    exact_sets, approx_sets = {}, {}
    for r in exact:
        exact_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    for r in approx:
        approx_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    recalls = [
        len(exact_sets[q] & approx_sets.get(q, set())) / len(exact_sets[q])
        for q in exact_sets
    ]
    # probing 3/8 clusters examines ~38% of the corpus; recall must be
    # well above that random-baseline share for a working index
    assert sum(recalls) / len(recalls) >= 0.5, recalls
    emb.unpersist()
