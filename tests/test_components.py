"""Connected components / dedup groups vs a pure-Python union-find oracle."""

from __future__ import annotations

import random

import pytest

from pulsarfeatureextractor_spark.operators.components import (
    connected_components,
    dedup_groups,
)


def _union_find(n_vertices, edges):
    parent = {}

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

    for a, b in edges:
        union(a, b)
    return {v: find(v) for v in parent}


def _spark_edges(spark, edges):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in edges], "id_a long, id_b long"
    )


@pytest.mark.parametrize("algorithm", ["label", "star"])
def test_random_graphs_match_union_find(spark, algorithm):
    rng = random.Random(7)
    for trial in range(3):
        n = 60
        edges = [
            (rng.randrange(n), rng.randrange(n))
            for _ in range(rng.randrange(20, 80))
        ]
        edges = [(a, b) for a, b in edges if a != b]
        want = _union_find(n, edges)
        got = {
            r["id"]: r["comp"]
            for r in connected_components(
                _spark_edges(spark, edges), algorithm=algorithm
            ).collect()
        }
        assert got == want, f"trial {trial} ({algorithm})"


@pytest.mark.parametrize("algorithm,max_iter", [("label", 60), ("star", 25)])
def test_long_path_converges(spark, algorithm, max_iter):
    # Worst case for label propagation (rounds = diameter); star should
    # collapse it in O(log^2) rounds.
    edges = [(i, i + 1) for i in range(40)]
    got = {
        r["id"]: r["comp"]
        for r in connected_components(
            _spark_edges(spark, edges), algorithm=algorithm, max_iter=max_iter
        ).collect()
    }
    assert got == {i: 0 for i in range(41)}


def test_label_propagation_raises_without_fixpoint(spark):
    edges = [(i, i + 1) for i in range(30)]
    with pytest.raises(RuntimeError, match="no fixpoint"):
        connected_components(_spark_edges(spark, edges), algorithm="label", max_iter=3)


def test_dedup_groups_assigns_singletons_and_sizes(spark):
    docs = spark.createDataFrame([(i,) for i in range(10)], "doc_id long")
    # {0,1,2} one group, {5,6} another, rest singletons
    pairs = _spark_edges(spark, [(1, 0), (2, 1), (6, 5)])
    rows = {r["doc_id"]: r for r in dedup_groups(docs, pairs).collect()}
    assert len(rows) == 10
    for d in (0, 1, 2):
        assert rows[d]["group_id"] == 0 and rows[d]["group_size"] == 3
    for d in (5, 6):
        assert rows[d]["group_id"] == 5 and rows[d]["group_size"] == 2
    for d in (3, 4, 7, 8, 9):
        assert rows[d]["group_id"] == d and rows[d]["group_size"] == 1
    # canonical-keep filter drops exactly the non-minimal members
    keep = {d for d, r in rows.items() if r["group_id"] == d}
    assert keep == {0, 3, 4, 5, 7, 8, 9}


def test_empty_pairs_all_singletons(spark):
    docs = spark.createDataFrame([(i,) for i in range(4)], "doc_id long")
    pairs = spark.createDataFrame([], "id_a long, id_b long")
    rows = dedup_groups(docs, pairs).collect()
    assert {(r["doc_id"], r["group_id"], r["group_size"]) for r in rows} == {
        (i, i, 1) for i in range(4)
    }


def test_dedup_groups_over_minhash_pairs_production_path(spark, sf_correct):
    """The production composition: MinHash-LSH pair candidates (scale
    path) -> connected components -> canonical groups.  Every LSH pair
    must land in one group, and group_id must be the component min."""
    import os

    from pulsarfeatureextractor_spark.operators.dedup import minhash_lsh_pairs

    docs = spark.read.parquet(os.path.join(sf_correct, "documents.parquet"))
    pairs = minhash_lsh_pairs(docs, "text", "doc_id").localCheckpoint(eager=True)
    n_pairs = pairs.count()
    assert n_pairs > 0  # the fixtures plant near-dups
    groups = dedup_groups(docs, pairs, "doc_id")
    gid = {r["doc_id"]: r["group_id"] for r in groups.collect()}
    assert len(gid) == docs.count()
    want = _union_find(0, [(r["id_a"], r["id_b"]) for r in pairs.collect()])
    for d, g in want.items():
        assert gid[d] == g
    # docs never paired are their own singleton group
    paired = set(want)
    assert all(g == d for d, g in gid.items() if d not in paired)


def test_dedup_against_drops_known_texts(spark):
    from pulsarfeatureextractor_spark.operators.dedup import dedup_against, exact_dedup

    corpus = spark.createDataFrame(
        [(1, "known text one"), (2, "known text two")], "doc_id long, text string"
    )
    crawl = spark.createDataFrame(
        [(10, "known text one"), (11, "fresh text")], "doc_id long, text string"
    )
    # raw-text reference
    got = {r["doc_id"] for r in dedup_against(crawl, corpus, ref_col="text").collect()}
    assert got == {11}
    # digest-table reference (exact_dedup output)
    got2 = {
        r["doc_id"]
        for r in dedup_against(crawl, exact_dedup(corpus)).collect()
    }
    assert got2 == {11}
