"""Connected components & dedup-group resolution.

Near-dup detection (MinHash-LSH / SimHash / exact n-gram Jaccard,
operators/dedup.py) emits PAIRS.  A training-data pipeline needs
GROUPS: the transitive closure of the pair graph, one canonical
document per group, everything else dropped.  This module closes that
gap with a distributed connected-components operator and a
`dedup_groups` wrapper that assigns every document (paired or not) a
`group_id` = the minimum doc id of its component.

Two algorithms, selectable per call:

- ``algorithm="label"`` (default): neighbor-min label propagation.
  Each round every vertex takes the min component label over itself
  and its neighbors; converges in `diameter(G)` rounds.  Near-dup
  graphs are dense unions of tiny cliques (every member of a dup
  cluster pairs with most others), so the diameter is small — 2–3
  rounds in practice — and each round costs two shuffles (edge⋈label
  join + groupBy-min).  This is the production default for dedup.

- ``algorithm="star"``: alternating large-star / small-star
  (Kiveris et al. 2014, "Connected Components in MapReduce and
  Beyond").  Each round rewires edges toward per-neighborhood minima;
  converges in O(log^2 n) rounds even on adversarial long-path
  graphs, at the cost of rewriting the edge set every round.  Use it
  when the pair graph may contain long chains (e.g. threshold-graph
  transitive chains rather than clique-ish dup clusters).

Both are DataFrame-only — no RDDs, no driver-side graph: per round
the driver sees one scalar (the convergence signal).  Each round's
state is materialized with ``localCheckpoint`` — the convergence
action and the next round both reuse it, and the lineage is cut (an
iterative plan otherwise recomputes the whole chain per action).
Checkpoint blocks from superseded rounds are released by Spark's
ContextCleaner once the Python reference drops (each round rebinds
the variable), so peak storage is a small multiple of one round's
state — bounded, not rounds-linear, though the release is GC-deferred
rather than eager.  At 100 TB the state
per round is one (vertex, label) table shuffled on vertex id —
identical partitioning round to round, so AQE coalesces and the
shuffle stays the same size as the vertex set, not the edge set.

Scale notes (100 TB posture):
- The edge set from LSH banding is near-linear in corpus size (bucket
  sizes bounded by banding; see dedup.py).  Label propagation's
  per-round cost is O(|E|) shuffle on the neighbor join + O(|V|)
  groupBy — both hash-partitioned on ids, no skew beyond the dup
  clusters themselves (bounded by `max_df`-style caps upstream).
- Convergence checks use `changed == 0` where `changed` is computed
  as a count aggregate — one scalar action per round, no collect of
  vertex data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canon_edges(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Distinct undirected edge list with NULLs and self-loops dropped."""
    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .where(F.col("a").isNotNull() & F.col("b").isNotNull())
        .where(F.col("a") != F.col("b"))
    )
    return e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b"))).distinct()


def _cc_label_propagation(und: DataFrame, max_iter: int) -> DataFrame:
    """Neighbor-min label propagation over an undirected edge list.

    Rounds = diameter.  Each round: edge⋈label (shuffle on b), groupBy
    a (shuffle on a), left-join back onto labels (shuffle on id — same
    partitioning as the groupBy, so AQE reuses it).
    """
    labels = und.select(F.col("a").alias("id")).distinct().withColumn(
        "comp", F.col("id")
    )
    labels = labels.localCheckpoint(eager=True)
    for i in range(max_iter):
        nbr_min = (
            und.join(labels.withColumnRenamed("id", "b"), "b")
            .groupBy("a")
            .agg(F.min("comp").alias("nbr_comp"))
            .withColumnRenamed("a", "id")
        )
        new_labels = (
            labels.join(nbr_min, "id", "left")
            .select(
                "id",
                F.least(F.col("comp"), F.coalesce("nbr_comp", "comp")).alias("comp"),
                (F.col("comp") != F.least(F.col("comp"), F.coalesce("nbr_comp", "comp")))
                .cast("int")
                .alias("__chg"),
            )
        )
        # materialize each round: the convergence action and the next round
        # both reuse this result, and the lineage is cut (iterative plans
        # otherwise recompute the whole chain per action)
        new_labels = new_labels.localCheckpoint(eager=True)
        changed = new_labels.agg(F.sum("__chg")).first()[0] or 0
        labels = new_labels.drop("__chg")
        if changed == 0:
            break
    else:
        raise RuntimeError(f"connected_components: no fixpoint in {max_iter} rounds")
    return labels


def _cc_star(und: DataFrame, max_iter: int) -> DataFrame:
    """Alternating large-star / small-star (Kiveris et al. 2014).

    large-star: every node u links its strictly-larger neighbors to
    m(u) = min(N(u) ∪ {u}).  small-star: u links its ≤-neighbors and
    itself to m(u) computed over those.  Alternating the two
    converges to a star forest in O(log^2 n) rounds; the roots are
    the component minima.
    """
    def _sym(e: DataFrame) -> DataFrame:
        return e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b"))).distinct()

    # fixpoint signature = (count, xor of row hashes) — order-independent,
    # overflow-free; compared across CONSECUTIVE post-round edge sets (an
    # intra-round compare of large-star vs small-star output is spuriously
    # equal on path graphs)
    sig = [
        F.count(F.lit(1)).alias("n"),
        F.expr("bit_xor(xxhash64(a, b))").alias("h"),
    ]
    edges = und.localCheckpoint(eager=True)  # symmetric, deduped
    prev_sig = edges.agg(*sig).first()
    for i in range(max_iter):
        # -- large-star: link every neighbor v > u to m(u) = min(N(u) ∪ {u})
        m = edges.groupBy("a").agg(
            F.least(F.min("b"), F.first("a")).alias("m")
        )
        large = (
            edges.join(m, "a")
            .where(F.col("b") > F.col("a"))
            .select(F.col("b").alias("a"), F.col("m").alias("b"))
            .where(F.col("a") != F.col("b"))
        )
        edges = _sym(large)
        # -- small-star: on max-directed edges (a > b), link every smaller
        #    neighbor v and u itself to m(u) = min of the smaller neighbors
        directed = edges.select(
            F.greatest("a", "b").alias("a"), F.least("a", "b").alias("b")
        ).distinct()
        m2 = directed.groupBy("a").agg(F.min("b").alias("m"))
        small = (
            directed.join(m2, "a")
            .select(F.col("b").alias("a"), F.col("m").alias("b"))
            .where(F.col("a") != F.col("b"))
            .union(m2.select(F.col("a"), F.col("m").alias("b")))
        )
        # materialize each round (see _cc_label_propagation note)
        new_edges = _sym(small).localCheckpoint(eager=True)
        new_sig = new_edges.agg(*sig).first()
        edges = new_edges
        if (prev_sig["n"], prev_sig["h"]) == (new_sig["n"], new_sig["h"]):
            break
        prev_sig = new_sig
    else:
        raise RuntimeError(f"connected_components: no fixpoint in {max_iter} rounds")
    # star forest: every vertex's component is min(self, min neighbor)
    return (
        edges.groupBy("a")
        .agg(F.least(F.min("b"), F.first("a")).alias("comp"))
        .withColumnRenamed("a", "id")
    )


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    algorithm: str = "label",
    max_iter: int = 30,
) -> DataFrame:
    """(id, comp) for every vertex appearing in `edges`; comp = min id
    of the vertex's connected component.  See module docstring for the
    algorithm choice."""
    und = _canon_edges(edges, src, dst)
    if algorithm == "label":
        return _cc_label_propagation(und, max_iter)
    if algorithm == "star":
        return _cc_star(und, max_iter)
    raise ValueError(f"unknown connected-components algorithm {algorithm!r}")


def dedup_groups(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "id_a",
    dst: str = "id_b",
    algorithm: str = "label",
) -> DataFrame:
    """Assign every row of `df` a dedup group.

    Returns (id_col, group_id, group_size): group_id = min id of the
    row's near-dup component (its own id if it never paired);
    group_size = member count.  Downstream `keep = group_id == id`
    drops all but the canonical member of each group.

    The left join onto the component labels is a shuffle on id; the
    labels side is |paired vertices| ≪ |corpus|, so at 100 TB mark it
    broadcast-able when the pair graph is small, or let AQE decide.
    """
    comp = connected_components(pairs, src, dst, algorithm=algorithm)
    out = (
        df.select(F.col(id_col))
        .join(comp.withColumnRenamed("id", id_col), id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("comp", F.col(id_col)).alias("group_id"),
        )
    )
    sizes = out.groupBy("group_id").agg(F.count(F.lit(1)).alias("group_size"))
    return out.join(sizes, "group_id").select(id_col, "group_id", "group_size")
