"""Validate LSH duplicate-cluster connected components against a Python
union-find over the identical candidate-pair set."""

from __future__ import annotations

from python_etl_pipeline_spark.llm.dedup import (
    connected_components,
    minhash_lsh_pairs,
)
from python_etl_pipeline_spark.queries import dd6_lsh_dup_clusters


def test_long_chain_converges_to_one_cluster(spark):
    """A 7-hop duplicate chain 0-1-2-...-7 needs 7 propagation rounds; a
    fixed 5-round loop would return split clusters. Plus a disjoint
    2-node component to prove labels don't bleed across components."""
    edges = [(i, i + 1) for i in range(7)] + [(100, 101)]
    pairs = spark.createDataFrame(edges, "a bigint, b bigint")
    labels = {r["node"]: r["label"] for r in connected_components(pairs).collect()}
    assert all(labels[n] == 0 for n in range(8))
    assert labels[100] == 100 and labels[101] == 100
    assert len(labels) == 10


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
