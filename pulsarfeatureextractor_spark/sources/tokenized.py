"""Builders for the engine's authoritative input shape.

BASELINE.json input_hint: an (Iceberg) table of pre-tokenized training
sequences with EXACTLY (doc_id:string, tokens:array<int32>, n_tok:int32,
source:string).  Three builders:

- ``synthetic_sequences``    — seed-deterministic fixture (FIXTURES.md A1),
  generated driver-side with numpy then parallelized via Arrow; used by
  tests and the bench harness (scaled on the fly, never committed).
- ``synthetic_snapshots``    — point-in-time right side for the as-of
  join (FIXTURES.md A2).
- ``documents_to_sequences`` — recasts the driver's documents table
  into the hinted shape with a tokenizer that is also expressible in
  ANSI SQL (token = length(word) mod 256), so the DuckDB differential
  oracle can reproduce it bit-for-bit.

``with_event_time`` derives the point-in-time axis deterministically
from doc_id (the input table stays exactly the hinted 4-column shape;
SURVEY.md §1.2).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

SEQUENCES_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType(), False),
    T.StructField("tokens", T.ArrayType(T.IntegerType(), False), False),
    T.StructField("n_tok", T.IntegerType(), False),
    T.StructField("source", T.StringType(), False),
])

SNAPSHOTS_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType(), False),
    T.StructField("obs_time", T.TimestampType(), False),
    T.StructField("f_mean", T.DoubleType(), False),
    T.StructField("f_std", T.DoubleType(), False),
    T.StructField("f_skew", T.DoubleType(), False),
    T.StructField("f_kurt", T.DoubleType(), False),
    T.StructField("snapshot_id", T.LongType(), False),
])

_EPOCH = np.datetime64("2024-01-01T00:00:00")
_WINDOW_SECONDS = 30 * 24 * 3600  # 30-day observation window


def _sequences_pdf(n_rows: int, seed: int = 42, skew: bool = False) -> pd.DataFrame:
    """Deterministic pandas frame of A1-shaped rows (numpy RNG, seed-pinned)."""
    rng = np.random.default_rng(seed)
    if skew:
        # skew fixture: one hot doc_id owns ~50% of rows (FIXTURES.md A1)
        hot = rng.random(n_rows) < 0.5
        ids = rng.integers(0, max(n_rows // 2, 1), size=n_rows)
        doc_ids = np.where(hot, "cand_hot", None)
        doc_ids = [
            "cand_hot" if h else f"cand_{i:08d}" for h, i in zip(hot, ids)
        ]
        src_idx = rng.zipf(1.5, size=n_rows) % 20
    else:
        ids = rng.integers(0, max(int(n_rows * 0.99), 1), size=n_rows)
        doc_ids = [f"cand_{i:08d}" for i in ids]
        src_idx = rng.integers(0, 20, size=n_rows)
    lengths = rng.choice(np.array([64, 128], dtype=np.int32), size=n_rows)
    flat = rng.integers(0, 256, size=int(lengths.sum()), dtype=np.int32)
    offsets = np.concatenate([[0], np.cumsum(lengths)])
    tokens = [flat[offsets[i]: offsets[i + 1]] for i in range(n_rows)]
    return pd.DataFrame({
        "doc_id": doc_ids,
        "tokens": tokens,
        "n_tok": lengths.astype(np.int32),
        "source": [f"src{int(s)}" for s in src_idx],
    })


def synthetic_sequences(
    spark: SparkSession,
    n_rows: int = 1000,
    seed: int = 42,
    skew: bool = False,
    n_partitions: int | None = None,
) -> DataFrame:
    """Seed-deterministic sequences table in the exact hinted shape."""
    pdf = _sequences_pdf(n_rows, seed=seed, skew=skew)
    df = spark.createDataFrame(pdf, schema=SEQUENCES_SCHEMA)
    if n_partitions:
        df = df.repartition(n_partitions)
    return df


def synthetic_snapshots(
    spark: SparkSession, n_rows: int = 2000, n_docs: int = 300, seed: int = 43
) -> DataFrame:
    """A2 feature-snapshot table: irregular obs_time incl. exact ties."""
    rng = np.random.default_rng(seed)
    ids = rng.integers(0, n_docs, size=n_rows)
    secs = rng.integers(0, _WINDOW_SECONDS, size=n_rows)
    # inject exact-tie timestamps for ~5% of rows (as-of tie semantics)
    tie = rng.random(n_rows) < 0.05
    secs = np.where(tie, (secs // 3600) * 3600, secs)
    pdf = pd.DataFrame({
        "doc_id": [f"cand_{i:08d}" for i in ids],
        "obs_time": _EPOCH + secs.astype("timedelta64[s]"),
        "f_mean": rng.normal(100, 10, n_rows),
        "f_std": rng.uniform(1, 50, n_rows),
        "f_skew": rng.normal(0, 1, n_rows),
        "f_kurt": rng.normal(0, 2, n_rows),
        "snapshot_id": rng.integers(1, 5, size=n_rows).astype(np.int64),
    })
    return spark.createDataFrame(pdf, schema=SNAPSHOTS_SCHEMA)


def synthetic_sequences_distributed(
    spark: SparkSession,
    n_rows: int,
    seed: int = 42,
    n_partitions: int | None = None,
) -> DataFrame:
    """Scalable A1-shaped generator: pure JVM expressions, zero Python.

    ``spark.range`` gives a distributed id column; every other column is
    a deterministic hash of (id, seed) — so the SAME table materializes
    at any parallelism and any scale (10^12 rows on a cluster would be
    ``spark.range(n, numPartitions=10^5)`` with identical semantics).
    The driver-side pandas builder (``synthetic_sequences``) stays for
    small oracle fixtures; THIS is the bench/scale path — a driver-side
    generator is exactly the non-distributed bottleneck the engine bans.

    tokens[i] = xxhash64(id, seed, i) mod 256; n_tok in {64, 128}.
    """
    if n_partitions is None:
        n_partitions = max(int(spark.sparkContext.defaultParallelism) * 2, 8)
    base = spark.range(0, n_rows, numPartitions=n_partitions)
    h = lambda *cols: F.xxhash64(*cols, F.lit(seed))  # noqa: E731
    n_docs = max(int(n_rows * 0.99), 1)
    n_tok = F.when(F.pmod(h(F.col("id"), F.lit("len")), F.lit(2)) == 0, 64).otherwise(128)
    tokens = F.transform(
        F.sequence(F.lit(1), F.col("n_tok")),
        lambda i: F.pmod(h(F.col("id"), i), F.lit(256)).cast("int"),
    )
    return (
        base
        .withColumn("n_tok", n_tok.cast("int"))
        .select(
            F.format_string(
                "cand_%08d", F.pmod(h(F.col("id"), F.lit("doc")), F.lit(n_docs))
            ).alias("doc_id"),
            tokens.alias("tokens"),
            "n_tok",
            F.concat(
                F.lit("src"), F.pmod(h(F.col("id"), F.lit("src")), F.lit(20))
            ).alias("source"),
        )
    )


def synthetic_snapshots_distributed(
    spark: SparkSession,
    n_rows: int,
    n_docs: int,
    seed: int = 43,
    n_partitions: int | None = None,
) -> DataFrame:
    """Distributed A2-shaped feature-snapshot generator (JVM-only)."""
    if n_partitions is None:
        n_partitions = max(int(spark.sparkContext.defaultParallelism) * 2, 8)
    base = spark.range(0, n_rows, numPartitions=n_partitions)
    h = lambda *cols: F.xxhash64(*cols, F.lit(seed))  # noqa: E731
    unit = lambda tag: (  # deterministic uniform double in [0, 1)
        F.pmod(h(F.col("id"), F.lit(tag)), F.lit(1 << 30)) / F.lit(float(1 << 30))
    )
    epoch_2024 = 1704067200
    secs = F.pmod(h(F.col("id"), F.lit("obs")), F.lit(_WINDOW_SECONDS))
    return base.select(
        F.format_string(
            "cand_%08d", F.pmod(h(F.col("id"), F.lit("doc")), F.lit(n_docs))
        ).alias("doc_id"),
        F.timestamp_seconds(F.lit(epoch_2024) + secs).alias("obs_time"),
        (unit("m") * 20 + 90).alias("f_mean"),
        (unit("s") * 49 + 1).alias("f_std"),
        (unit("g") * 2 - 1).alias("f_skew"),
        (unit("k") * 4 - 2).alias("f_kurt"),
        (F.pmod(h(F.col("id"), F.lit("snap")), F.lit(4)) + 1).alias("snapshot_id"),
    )


def with_event_time(df: DataFrame, doc_id: str = "doc_id", mode: str = "xxhash") -> DataFrame:
    """Derive the deterministic point-in-time axis (SURVEY.md §1.2).

    mode="xxhash" (default): event_time = 2024-01-01 +
    (xxhash64(doc_id) mod 30 days) seconds — JVM-fast, works for any
    string id.  mode="portable": Knuth multiplicative hash on the id
    cast to bigint — chosen because ANSI engines (the DuckDB oracle)
    can compute the identical value, making pipelines built on it
    end-to-end differentially checkable.  Both are pure expressions
    (no Python), stable across runs, range-partitionable.  The stored
    table keeps the exact hinted shape; this is computed, never stored.
    """
    epoch_2024 = 1704067200  # 2024-01-01T00:00:00Z
    if mode == "xxhash":
        offset = F.pmod(F.xxhash64(F.col(doc_id)), F.lit(_WINDOW_SECONDS))
    elif mode == "portable":
        offset = F.pmod(
            F.col(doc_id).cast("long") * F.lit(2654435761),
            F.lit(_WINDOW_SECONDS),
        )
    else:
        raise ValueError(f"unknown event-time mode: {mode}")
    return df.withColumn(
        "event_time", F.timestamp_seconds(F.lit(epoch_2024) + offset)
    )


def vocab_tokenize(
    documents: DataFrame, text_col: str = "text", id_mode: str = "hash"
) -> DataFrame:
    """Tokenization into an integer id space, array order preserved.

    - ``id_mode="hash"`` (DEFAULT — the web-scale path): token id =
      xxhash64(word) folded into [1, 2^31).  A pure per-row expression:
      no vocabulary materialization, no shuffle, no global ordering —
      the plan is a single project over the scan, identical at 10^12
      rows.  Ids are stable across runs/clusters (xxhash64 is
      deterministic); collisions in the 2^31 space are the standard
      hash-vocab tradeoff.
    - ``id_mode="rank"`` (opt-in for SMALL vocabularies): token id =
      rank of the word in the sorted global vocabulary (1-based) — the
      classic contiguous-id space classifiers like.  Plan: posexplode
      words -> distinct vocab -> row_number over sorted vocab ->
      broadcast-join ids back -> ordered reassembly.  The global
      row_number window is a SINGLE-PARTITION exchange over the vocab;
      fine for bounded vocabularies, a scale-killer for open-ended
      ones — which is why it is not the default.
    """
    if id_mode == "hash":
        words = F.split(F.col(text_col), " ")
        tok = lambda w: (  # noqa: E731
            F.pmod(F.xxhash64(w), F.lit((1 << 31) - 1)) + F.lit(1)
        ).cast("int")
        return documents.select(
            F.col("doc_id").cast("string").alias("doc_id"),
            F.transform(words, tok).alias("tokens"),
            F.size(words).cast("int").alias("n_tok"),
        )
    if id_mode != "rank":
        raise ValueError(f"unknown id_mode {id_mode!r}: use 'hash' or 'rank'")
    words = documents.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "w"),
    )
    from pyspark.sql.window import Window

    vocab = (
        words.select("w").distinct()
        .withColumn("tok", F.row_number().over(Window.orderBy("w")).cast("int"))
    )
    joined = words.join(F.broadcast(vocab), "w")
    return (
        joined.groupBy("doc_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                lambda s: s["tok"],
            ).alias("tokens")
        )
        .withColumn("n_tok", F.size("tokens").cast("int"))
    )


def with_synthetic_subbands(
    df: DataFrame, tokens_col: str = "tokens", n_chan: int = 8,
    out_col: str = "sb_flat",
) -> DataFrame:
    """Derive a deterministic per-candidate sub-band cube from the 1-D
    token curve — the test-scale stand-in for real (frequency x phase)
    sub-band data, which the hinted input shape does not carry.

    Band b's bin i = (tokens[i] + (b+1) * (i mod 17)) mod 256 — each
    band is the profile plus a band-dependent, phase-dependent
    perturbation, so bands stay correlated with the integrated profile
    (as a real broadband pulse is) while per-band peaks jitter.  The
    cube is emitted FLAT band-major (``out_col``: n_chan * n_tok ints),
    the layout ``functions.scores.with_subband_scores`` consumes.

    All JVM expressions (transform with index + concat) — exactly
    reproducible in integer arithmetic by the VALUES-oracle generator.
    Real sub-band cubes would simply load into the same flat column.
    """
    def _band(b: int):
        # factory closure: a plain two-arg lambda (value, index) — a
        # default arg would change the arity PySpark infers
        return lambda x, i: (
            (x.cast("long") + F.lit(b + 1) * (i % F.lit(17))) % F.lit(256)
        ).cast("int")

    bands = [F.transform(F.col(tokens_col), _band(b)) for b in range(n_chan)]
    return df.withColumn(out_col, F.concat(*bands))


def with_synthetic_subints(
    df: DataFrame, tokens_col: str = "tokens", n_int: int = 6,
    out_col: str = "si_flat",
) -> DataFrame:
    """Deterministic per-candidate SUB-INTEGRATION (time x phase) cube
    from the 1-D token curve — the second cube axis of the reference's
    2-D score inputs (Thornton 2013: sub-band AND sub-int matrices).

    Sub-int s's bin i = (tokens[i] + (s+1) * (i mod 13) + 3*s) mod 256 —
    a different modulus and a per-row drift term than the sub-band
    stand-in, so the two synthetic axes are not trivially identical.
    Flat row-major (``out_col``: n_int * n_tok ints), consumed by the
    SAME kernel as the sub-band family
    (functions/scores.with_subband_scores — both cubes are
    (channels, bins)); real sub-int data would load into the same
    column.
    """
    def _subint(s: int):
        return lambda x, i: (
            (x.cast("long") + F.lit(s + 1) * (i % F.lit(13)) + F.lit(3 * s))
            % F.lit(256)
        ).cast("int")

    ints = [F.transform(F.col(tokens_col), _subint(s)) for s in range(n_int)]
    return df.withColumn(out_col, F.concat(*ints))


def documents_to_sequences(documents: DataFrame) -> DataFrame:
    """Recast the driver documents table into the hinted 4-column shape.

    Tokenizer: split on single space; token id = length(word) mod 256,
    cast int32.  Deliberately reproducible in ANSI SQL
    (``list_transform(string_split(text,' '), w -> length(w) % 256)``)
    so the DuckDB oracle computes identical token arrays — the
    differential gate then covers the whole pipeline including
    tokenization.  All JVM-side builtins; no Python.
    """
    words = F.split(F.col("text"), " ")
    tokens = F.transform(words, lambda w: (F.length(w) % F.lit(256)).cast("int"))
    return documents.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        tokens.alias("tokens"),
        F.size(words).cast("int").alias("n_tok"),
        F.col("source"),
    )
