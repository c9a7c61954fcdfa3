"""Approximate-nearest-neighbor search over an embedding column.

- ``cosine_topk``      : brute-force exact baseline — broadcast the
  query set, JVM-side dot product via zip_with/aggregate, per-query
  top-k via WindowGroupLimit.  Cost O(|corpus| * |queries|) — the
  exactness oracle and the right tool when |queries| is small.
- ``rp_lsh_topk``      : scale path — random-hyperplane LSH (Charikar
  2002).  Each vector gets `n_tables` bucket keys from `n_bits` signed
  projections; candidates = bucket collisions in any table; exact
  cosine re-rank on candidates only.  Shuffle is on bucket keys, and
  recall is tunable via (n_bits, n_tables).

Projections are seed-deterministic: a pure function of
(seed, n_bits, n_tables, dim), derived identically on every executor
(from the first Arrow batch's vector length when ``dim`` isn't given —
no driver-side probe job).  The projection dot products run in a
single Arrow-vectorized pandas UDF (one matmul per batch).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window


def _cosine_expr(a, b):
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                      F.lit(0.0), lambda acc, v: acc + v)
    na = F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                            F.lit(0.0), lambda acc, v: acc + v))
    nb = F.sqrt(F.aggregate(F.transform(b, lambda x: x * x),
                            F.lit(0.0), lambda acc, v: acc + v))
    return F.when((na > 0) & (nb > 0), dot / (na * nb)).otherwise(F.lit(0.0))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k cosine neighbors per query (excluding self-matches).

    queries: (query_id, embedding).  Physical plan: broadcast-nested-
    loop of corpus x queries (queries are broadcast — keep them small),
    then rank per query.  Row explosion |corpus|*|queries| — exact
    baseline only.
    """
    q = queries.select(
        F.col(query_id_col), F.col(vec_col).alias("__qvec")
    )
    cross = corpus.select(
        F.col(id_col), F.col(vec_col).alias("__cvec")
    ).crossJoin(F.broadcast(q))
    scored = cross.where(F.col(id_col) != F.col(query_id_col)).select(
        F.col(query_id_col),
        F.col(id_col),
        _cosine_expr(
            F.col("__cvec").cast("array<double>"),
            F.col("__qvec").cast("array<double>"),
        ).alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine", "rank")
    )


def _bucket_udf(dim: "int | None", n_bits: int, n_tables: int, seed: int = 777):
    """Arrow-vectorized: embedding -> array of n_tables bucket keys.

    The hyperplanes are a pure function of (seed, n_bits, n_tables, dim),
    so when ``dim`` is None each executor derives the identical matrices
    from its first Arrow batch's vector length — no driver-side one-row
    probe job, no broadcast payload.
    """
    weights = (1 << np.arange(n_bits, dtype=np.int64))
    cache: dict = {}
    if dim is not None:
        cache["planes"] = np.random.default_rng(seed).standard_normal(
            (n_tables, n_bits, dim))

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def buckets(vecs: pd.Series) -> pd.Series:
        mat = np.vstack([np.asarray(v, dtype=np.float64) for v in vecs])  # (b, dim)
        planes = cache.get("planes")
        if planes is None:
            planes = np.random.default_rng(seed).standard_normal(
                (n_tables, n_bits, mat.shape[1]))
            cache["planes"] = planes
        out = np.empty((mat.shape[0], n_tables), dtype=np.int64)
        for t in range(n_tables):
            proj = mat @ planes[t].T                 # (b, n_bits)
            bits = (proj > 0).astype(np.int64)
            out[:, t] = bits @ weights + (t << 48)   # disjoint keyspace per table
        return pd.Series(list(out))

    return buckets


def _train_spherical_centroids(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    n_centroids: int,
    seed: int,
    lloyd_iters: int,
    train_sample: int,
):
    """Spherical k-means centroids from a bounded deterministic sample.

    The sample is keyed on the ID hash (not on the Java string
    rendering of the vector — an id hash is just as uniform, skips the
    array→string cast, and is replicable by the pure-python XXH64
    oracle port).  Seed folded INTO the string: a second xxhash64
    argument is a hash-chain link, not a seed.  Lloyd rounds run
    DRIVER-SIDE on the bounded sample (O(sample × k) numpy, never the
    corpus).  Shared by ivf_topk and semantic_dedup — the oracle twins
    (tools/gen_value_oracles.py) replicate this exact arithmetic.
    """
    hashed = corpus.select(F.col(vec_col), F.col(id_col)).withColumn(
        "__h",
        F.pmod(
            F.xxhash64(
                F.concat(F.col(id_col).cast("string"), F.lit(f"|{seed}"))
            ),
            F.lit(1 << 31),
        ),
        # id as secondary key: two ids colliding in the same 2^31 bucket
        # must order deterministically (the pure-python oracle twin in
        # tools/gen_value_oracles.py applies the same (hash, id) key)
    ).orderBy("__h", id_col).drop(id_col)
    train = hashed.limit(max(n_centroids, min(train_sample, n_centroids * 256)))
    rows = train.collect()
    X = np.vstack([np.asarray(r[0], dtype=np.float64) for r in rows])
    X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    C = X[:n_centroids].copy()
    for _ in range(max(lloyd_iters, 0)):
        assign = np.argmax(X @ C.T, axis=1)            # spherical k-means
        for c in range(n_centroids):
            members = X[assign == c]
            if len(members):
                C[c] = members.mean(axis=0)
        C = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
    return C


def _make_assign_udf(C, top: int):
    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def assign(vecs: pd.Series) -> pd.Series:
        mat = np.vstack([np.asarray(v, dtype=np.float64) for v in vecs])
        mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        sims = mat @ C.T                              # (b, n_centroids)
        order = np.argsort(-sims, axis=1)[:, :top].astype(np.int32)
        return pd.Series(list(order))

    return assign


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    seed: int = 31,
    lloyd_iters: int = 5,
    train_sample: int = 20_000,
) -> DataFrame:
    """IVF-style ANN: coarse-quantize the corpus into inverted lists,
    probe the ``n_probe`` nearest cells per query, exact re-rank.

    Centroid training is the standard IVF recipe: a deterministic
    hash-sample of the corpus seeds k-means, then ``lloyd_iters``
    spherical Lloyd rounds run DRIVER-SIDE on a bounded training sample
    (``train_sample`` rows — O(sample x k) numpy, never the corpus).
    Balanced cells matter twice at scale: recall (queries probe the
    cells nearest to them) and skew (one fat inverted list is a hot
    shuffle key).  Cell assignment of the full corpus is one
    Arrow-batched matmul; the only shuffle is the equi-join on cell
    ids.  Rows per query may be < k when probes miss (recall tunable
    via n_probe / n_centroids; recall vs brute force is pytest-pinned).
    """
    import pyspark.sql.functions as SF

    C = _train_spherical_centroids(
        corpus, id_col, vec_col, n_centroids, seed, lloyd_iters, train_sample
    )
    c_cell = _make_assign_udf(C, 1)
    q_cells = _make_assign_udf(C, n_probe)
    c = corpus.select(F.col(id_col), F.col(vec_col).alias("__cvec")).withColumn(
        "__cell", F.element_at(c_cell(F.col("__cvec")), 1)
    )
    q = queries.select(F.col(query_id_col), F.col(vec_col).alias("__qvec")).withColumn(
        "__cell", F.explode(q_cells(F.col("__qvec")))
    )
    cand = (
        c.join(q, "__cell")
        .where(F.col(id_col) != F.col(query_id_col))
        .dropDuplicates([query_id_col, id_col])
    )
    scored = cand.select(
        F.col(query_id_col), F.col(id_col),
        _cosine_expr(
            F.col("__cvec").cast("array<double>"),
            F.col("__qvec").cast("array<double>"),
        ).alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        SF.col("cosine").desc(), SF.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine", "rank")
    )


def embedding_neardup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bits: int = 8,
    n_tables: int = 8,
    exact: bool = False,
    dim: "int | None" = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cos >= thr).

    ``exact=False`` (scale path): RP-LSH bucket collisions generate
    candidates, exact cosine filters them — shuffle on bucket keys only.
    ``exact=True`` (oracle path): full self-join — O(n^2), test scale
    only; used by the differential gate to certify the LSH path's
    output is a SUBSET-with-threshold of truth.
    """
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb"))
    if exact:
        cand = a.crossJoin(b).where(F.col("id_a") < F.col("id_b"))
    else:
        bucketize = _bucket_udf(dim, n_bits, n_tables, seed=555)
        ab = a.withColumn("__bucket", F.explode(bucketize(F.col("__va"))))
        bb = b.withColumn("__bucket", F.explode(bucketize(F.col("__vb"))))
        cand = (
            ab.join(bb, "__bucket")
            .where(F.col("id_a") < F.col("id_b"))
            .dropDuplicates(["id_a", "id_b"])
        )
    cos = _cosine_expr(
        F.col("__va").cast("array<double>"), F.col("__vb").cast("array<double>")
    )
    return (
        cand.withColumn("cosine", cos)
        .where(F.col("cosine") >= F.lit(float(threshold)))
        .select("id_a", "id_b", "cosine")
    )


def rp_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    dim: int | None = None,
    n_bits: int = 12,
    n_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """ANN: bucket-join candidates (any-table collision) + exact re-rank.

    Output schema matches cosine_topk; rows per query may be < k when
    recall misses (tunable).  Shuffles: corpus and queries each hashed
    once on the bucket key — no |corpus| x |queries| blowup.
    """
    bucketize = _bucket_udf(dim, n_bits, n_tables)

    c = corpus.select(F.col(id_col), F.col(vec_col).alias("__cvec")).withColumn(
        "__bucket", F.explode(bucketize(F.col("__cvec")))
    )
    q = queries.select(F.col(query_id_col), F.col(vec_col).alias("__qvec")).withColumn(
        "__bucket", F.explode(bucketize(F.col("__qvec")))
    )
    cand = (
        c.join(q, "__bucket")
        .where(F.col(id_col) != F.col(query_id_col))
        .dropDuplicates([query_id_col, id_col])
    )
    scored = cand.select(
        F.col(query_id_col),
        F.col(id_col),
        _cosine_expr(
            F.col("__cvec").cast("array<double>"),
            F.col("__qvec").cast("array<double>"),
        ).alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine", "rank")
    )


def semantic_dedup(
    df: DataFrame,
    threshold: float = 0.45,
    n_centroids: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 31,
    lloyd_iters: int = 5,
    train_sample: int = 20_000,
    algorithm: str = "label",
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023):
    cluster the embedding space, then prune cosine-near-duplicates
    WITHIN each cluster — the all-pairs comparison is bounded to cell
    populations, never the corpus, which is the whole point of the
    method at 100 TB.

    1. spherical k-means centroids from a bounded driver-side sample
       (shared trainer with ivf_topk);
    2. one Arrow-batched matmul assigns every row its top-1 cell;
    3. within-cell self-join generates candidate pairs (shuffle on
       cell id only; each row lives in exactly one cell so no pair
       dedup pass is needed), exact sequential-fold cosine filters at
       ``threshold``;
    4. connected components over the surviving pairs (diameter-bounded
       label propagation, operators/components.py) gives each row a
       group; ``keep = group_id == id`` retains one canonical member
       per semantic-duplicate set.

    Returns (id_col, group_id, group_size) — the dedup_groups
    contract.  Cross-cell near-duplicates are missed by design
    (SemDeDup's documented recall trade); raise n_centroids for
    tighter cells or lower it toward 1 for higher recall at higher
    pair cost.
    """
    from .components import dedup_groups

    C = _train_spherical_centroids(
        df, id_col, vec_col, n_centroids, seed, lloyd_iters, train_sample
    )
    cell = _make_assign_udf(C, 1)
    a = df.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va")
    ).withColumn("__cell", F.element_at(cell(F.col("__va")), 1))
    b = df.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb")
    ).withColumn("__cell", F.element_at(cell(F.col("__vb")), 1))
    pairs = (
        a.join(b, "__cell")
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cosine",
            _cosine_expr(
                F.col("__va").cast("array<double>"),
                F.col("__vb").cast("array<double>"),
            ),
        )
        .where(F.col("cosine") >= F.lit(float(threshold)))
        .select("id_a", "id_b")
    )
    return dedup_groups(df, pairs, id_col, algorithm=algorithm)
