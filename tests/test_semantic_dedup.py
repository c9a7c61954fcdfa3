"""SemDeDup-style semantic dedup (operators/similarity.semantic_dedup)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pulsarfeatureextractor_spark.operators.components import dedup_groups
from pulsarfeatureextractor_spark.operators.similarity import (
    embedding_neardup_pairs,
    semantic_dedup,
)


def _emb(spark):
    # two tight semantic clusters + one isolate
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.999, 0.04, 0.0, 0.0]),   # near-dup of 1
        (5, [0.0, 1.0, 0.0, 0.0]),
        (6, [0.04, 0.999, 0.0, 0.0]),   # near-dup of 5
        (9, [0.0, 0.0, 1.0, 0.0]),      # isolate
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_single_cell_matches_exact_grouping(spark):
    """n_centroids=1 => every pair is compared: the grouping must equal
    exact all-pairs near-dup + connected components."""
    emb = _emb(spark)
    got = {
        r["vec_id"]: (r["group_id"], r["group_size"])
        for r in semantic_dedup(emb, threshold=0.99, n_centroids=1).collect()
    }
    exact = dedup_groups(
        emb, embedding_neardup_pairs(emb, 0.99, exact=True), "vec_id"
    )
    want = {
        r["vec_id"]: (r["group_id"], r["group_size"]) for r in exact.collect()
    }
    assert got == want == {
        1: (1, 2), 2: (1, 2), 5: (5, 2), 6: (5, 2), 9: (9, 1),
    }


def test_keep_rule_retains_one_canonical_member(spark):
    emb = _emb(spark)
    out = semantic_dedup(emb, threshold=0.99, n_centroids=1)
    kept = out.where(F.col("group_id") == F.col("vec_id"))
    assert sorted(r["vec_id"] for r in kept.collect()) == [1, 5, 9]


def test_grouping_invariants_with_cells(spark):
    """With real cells, grouping is a REFINEMENT of the exact one:
    every within-group pair must also be an exact near-dup pair
    (no false merges), group_id = min member id, sizes consistent."""
    emb = _emb(spark)
    out = semantic_dedup(emb, threshold=0.99, n_centroids=2).collect()
    groups: dict = {}
    for r in out:
        groups.setdefault(r["group_id"], []).append(r["vec_id"])
    exact_pairs = {
        (r["id_a"], r["id_b"])
        for r in embedding_neardup_pairs(emb, 0.99, exact=True).collect()
    }
    for gid, members in groups.items():
        assert gid == min(members)
        sizes = {r["group_size"] for r in out if r["group_id"] == gid}
        assert sizes == {len(members)}
        if len(members) == 2:
            a, b = sorted(members)
            assert (a, b) in exact_pairs


def test_semantic_dedup_on_fixture_embeddings(spark, sf_correct):
    """The sf0.01 embeddings fixture plants near-dup vectors: the
    operator must find at least one multi-member group, and the total
    row count must be preserved (every vector gets a group)."""
    import os

    emb = spark.read.parquet(os.path.join(sf_correct, "embeddings.parquet"))
    out = semantic_dedup(emb, threshold=0.45, n_centroids=8)
    rows = out.collect()
    assert len(rows) == emb.count()
    assert any(r["group_size"] >= 2 for r in rows)
