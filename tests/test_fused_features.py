"""Fused single-pass feature extraction == the composed two-pass path.

The fusion exists for the Python-boundary traffic (one Arrow crossing
instead of two, tokens dropped at the boundary); it must change
NOTHING about the values: moments are bit-exact (same kernel, same
batches), scores allclose at 1e-12 (the lstsq kernel is batch-
composition-dependent at ~1e-16, see tools/gen_value_oracles.py).
"""

import numpy as np
import pytest

from pulsarfeatureextractor_spark.functions.featureset import fused_features_arrow
from pulsarfeatureextractor_spark.functions.moments import (
    LYON_FIELDS,
    with_lyon_features,
)
from pulsarfeatureextractor_spark.functions.scores import (
    SCORE_FIELDS,
    with_thornton_scores,
)
from pulsarfeatureextractor_spark.sources.tokenized import synthetic_sequences


@pytest.fixture(scope="module")
def seqs(spark):
    return synthetic_sequences(spark, 600, seed=21).cache()


def test_fused_equals_composed(spark, seqs):
    fused = fused_features_arrow(seqs, include_scores=True).toPandas()
    composed = with_thornton_scores(with_lyon_features(seqs)).toPandas()
    fused = fused.sort_values("doc_id", kind="mergesort").reset_index(drop=True)
    composed = composed.sort_values("doc_id", kind="mergesort").reset_index(drop=True)
    for c in LYON_FIELDS:
        assert np.array_equal(fused[c].to_numpy(), composed[c].to_numpy()), c
    for c in SCORE_FIELDS:
        assert np.allclose(
            fused[c].to_numpy(), composed[c].to_numpy(), rtol=1e-12, atol=1e-14
        ), c


def test_fused_drop_removes_tokens_at_boundary(spark, seqs):
    out = fused_features_arrow(seqs, include_scores=False, drop=("tokens",))
    assert "tokens" not in out.columns
    assert [f for f in LYON_FIELDS if f in out.columns] == list(LYON_FIELDS)
    assert out.count() == seqs.count()


def test_fused_single_python_crossing(spark, seqs):
    fused_plan = fused_features_arrow(
        seqs, include_scores=True, drop=("tokens",)
    )._jdf.queryExecution().executedPlan().toString()
    assert fused_plan.count("MapInArrow") == 1
    composed_plan = (
        with_thornton_scores(with_lyon_features(seqs))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert composed_plan.count("MapInArrow") == 2
