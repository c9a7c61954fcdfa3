"""Type-selectable feature extraction (reference -t switch analogue)."""

import numpy as np
import pytest

from pulsarfeatureextractor_spark.functions.featureset import (
    FEATURE_SETS,
    extract_features,
)
from pulsarfeatureextractor_spark.functions.moments import LYON_FIELDS
from pulsarfeatureextractor_spark.functions.scores import SCORE_FIELDS


@pytest.fixture(scope="module")
def seqs(spark):
    from pulsarfeatureextractor_spark.sources.tokenized import synthetic_sequences

    return synthetic_sequences(spark, 50, seed=21)


def test_each_set_appends_expected_columns(spark, seqs):
    base = set(seqs.columns)
    assert set(extract_features(seqs, "lyon").columns) == base | set(LYON_FIELDS)
    assert set(extract_features(seqs, "thornton").columns) == base | set(SCORE_FIELDS)
    assert set(extract_features(seqs, "stats").columns) == base | {"sn_ratio", "peak_offset"}
    assert set(extract_features(seqs, "raw").columns) == base | {"raw_bins"}
    assert set(extract_features(seqs, "widths").columns) == base | {
        "n_above_half", "n_above_q3", "peak_to_mean", "crest"}
    from pulsarfeatureextractor_spark.functions.scores import SUBBAND_FIELDS

    assert set(extract_features(seqs, "subband").columns) == base | (
        {"sb_flat"} | set(SUBBAND_FIELDS))
    allcols = set(extract_features(seqs, "all").columns)
    assert set(LYON_FIELDS) | {"sn_ratio_t", "peak_offset_t", "sn_ratio", "peak_offset"} <= allcols


def test_raw_passthrough_identity(spark, seqs):
    rows = extract_features(seqs, "raw").select("tokens", "raw_bins").collect()
    for r in rows:
        assert np.array_equal(np.asarray(r.tokens, dtype=float), np.asarray(r.raw_bins))


def test_all_set_consistent_stats(spark, seqs):
    """The JVM 'stats' slice agrees with the Arrow thornton columns."""
    pdf = extract_features(seqs, "all").select(
        "sn_ratio", "sn_ratio_t", "peak_offset", "peak_offset_t"
    ).toPandas()
    assert np.allclose(pdf["sn_ratio"], pdf["sn_ratio_t"], rtol=1e-9)
    assert np.allclose(pdf["peak_offset"], pdf["peak_offset_t"], rtol=1e-9)


def test_unknown_set_raises(spark, seqs):
    with pytest.raises(ValueError, match="unknown feature set"):
        extract_features(seqs, "nope")
    assert "all" in FEATURE_SETS
