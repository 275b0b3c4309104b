"""Validate LSH duplicate-cluster connected components against a Python
union-find over the identical candidate-pair set."""

from __future__ import annotations

from python_etl_pipeline_spark.llm.dedup import minhash_lsh_pairs
from python_etl_pipeline_spark.queries import dd6_lsh_dup_clusters


def test_lsh_clusters_match_union_find(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = [(r["a"], r["b"]) for r in
             minhash_lsh_pairs(docs, "text", "doc_id").collect()]

    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in pairs:
        union(a, b)
    expected: dict[int, set[int]] = {}
    for node in parent:
        expected.setdefault(find(node), set()).add(node)

    got = {r["cluster_id"]: r for r in dd6_lsh_dup_clusters(spark, sf_dir).collect()}
    assert set(got) == set(expected)
    for root, members in expected.items():
        assert got[root]["cluster_size"] == len(members)
        assert got[root]["keep_id"] == min(members)
