"""Thornton-style scores: vectorized batch path vs a per-row oracle.

The oracle below is an intentionally naive, row-at-a-time numpy
transcription of the published score definitions — independent of the
shared-design-matrix vectorization under test.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from tests.oracle import thornton_oracle_row as _oracle_row
from pulsarfeatureextractor_spark.functions.scores import (
    SCORE_FIELDS,
    scores_matrix,
    with_profile_stats_sql,
    with_thornton_scores,
)




def test_scores_match_per_row_oracle():
    rng = np.random.default_rng(11)
    rows = []
    for _ in range(40):
        n = int(rng.choice([64, 128]))
        base = rng.integers(0, 256, n)
        if rng.random() < 0.5:  # inject pulsar-like Gaussian pulse
            c = rng.integers(0, n)
            w = n / rng.choice([32, 16, 8])
            d = (np.arange(n) - c + n // 2) % n - n // 2
            base = base + (200 * np.exp(-0.5 * (d / w) ** 2)).astype(np.int64)
        rows.append(base)
    for n in (64, 128):
        group = [r for r in rows if len(r) == n]
        got = scores_matrix(np.vstack(group))
        for i, r in enumerate(group):
            want = _oracle_row(np.asarray(r))
            for j, name in enumerate(SCORE_FIELDS):
                assert np.isclose(got[i, j], want[name], rtol=1e-9, atol=1e-12), (
                    name, i, got[i, j], want[name])


def test_scores_edge_cases():
    # constant array: sigma=0 -> sn 0, no peaks; short arrays -> all zero
    got = scores_matrix(np.full((1, 64), 7.0))
    d = dict(zip(SCORE_FIELDS, got[0]))
    assert d["sn_ratio"] == 0.0 and d["n_peaks"] == 0.0
    assert scores_matrix(np.ones((2, 3))).sum() == 0.0


@pytest.mark.spark
def test_with_thornton_scores_spark(spark):
    from pulsarfeatureextractor_spark.sources.tokenized import synthetic_sequences

    df = synthetic_sequences(spark, 100, seed=3)
    out = with_thornton_scores(df)
    pdf = out.toPandas()
    assert list(pdf.columns) == ["doc_id", "tokens", "n_tok", "source"] + SCORE_FIELDS
    for _, row in pdf.sample(10, random_state=0).iterrows():
        want = _oracle_row(np.asarray(row["tokens"]))
        for name in SCORE_FIELDS:
            assert np.isclose(row[name], want[name], rtol=1e-9), name
    # token invariant: the multiset of (doc_id, tokens) passes through unmutated
    orig = sorted((r.doc_id, tuple(r.tokens)) for r in df.collect())
    got = sorted((r["doc_id"], tuple(r["tokens"])) for _, r in pdf.iterrows())
    assert got == orig


@pytest.mark.spark
def test_profile_stats_sql_matches_arrow_path(spark):
    from pulsarfeatureextractor_spark.sources.tokenized import synthetic_sequences

    df = synthetic_sequences(spark, 200, seed=5)
    sql_pdf = (with_profile_stats_sql(df).select("doc_id", "sn_ratio", "peak_offset")
               .toPandas().set_index("doc_id").sort_index())
    arrow_pdf = (with_thornton_scores(df).select("doc_id", "sn_ratio", "peak_offset")
                 .toPandas().set_index("doc_id").sort_index())
    assert np.allclose(sql_pdf.to_numpy(), arrow_pdf.to_numpy(), rtol=1e-9)


# ---------------------------------------------------- sub-band scores

def test_subband_kernel_matches_per_row_oracle():
    import pyarrow as pa

    from pulsarfeatureextractor_spark.functions.scores import (
        SUBBAND_FIELDS,
        subband_scores_list_array,
    )
    from tests.oracle import subband_oracle_row

    rng = np.random.default_rng(99)
    n_chan = 8
    flats, mats = [], []
    for n_bins in (4, 17, 64, 64, 128, 3, 0):  # 3 and 0 -> zero rows
        mat = rng.integers(0, 256, size=(n_chan, n_bins))
        mats.append(mat)
        flats.append(mat.ravel().tolist())
    flats.append([1, 2, 3, 4, 5])  # length not divisible by n_chan -> zeros
    mats.append(None)
    got = subband_scores_list_array(
        pa.array(flats, type=pa.list_(pa.int32())), n_chan)
    for i, mat in enumerate(mats):
        if mat is None or mat.shape[1] < 4:
            assert np.all(got[i] == 0.0), (i, got[i])
            continue
        want = subband_oracle_row(mat)
        for j, name in enumerate(SUBBAND_FIELDS):
            assert np.isclose(got[i, j], want[name], rtol=1e-9, atol=1e-12), (
                i, name, got[i, j], want[name])


def test_subband_scores_discriminate_coherent_pulse():
    """A broadband pulse at a stable phase must score higher band-profile
    correlation and lower peak jitter than band-shuffled noise."""
    import pyarrow as pa

    from pulsarfeatureextractor_spark.functions.scores import (
        subband_scores_list_array,
    )

    rng = np.random.default_rng(5)
    n_chan, n_bins = 8, 64
    pulse = np.exp(-0.5 * ((np.arange(n_bins) - 20) / 2.5) ** 2) * 120
    coherent = np.clip(
        pulse[None, :] + rng.normal(0, 8, (n_chan, n_bins)), 0, 255
    ).astype(int)
    noise = rng.integers(0, 256, size=(n_chan, n_bins))
    got = subband_scores_list_array(
        pa.array([coherent.ravel().tolist(), noise.ravel().tolist()],
                 type=pa.list_(pa.int32())),
        n_chan,
    )
    corr_c, corr_n = got[0, 0], got[1, 0]
    jit_c, jit_n = got[0, 2], got[1, 2]
    assert corr_c > 0.9 > corr_n, (corr_c, corr_n)
    assert jit_c < 0.05 < jit_n, (jit_c, jit_n)


def test_with_subband_scores_spark(spark):
    from pulsarfeatureextractor_spark.functions.scores import (
        SUBBAND_FIELDS,
        subband_scores_list_array,
        with_subband_scores,
    )
    from pulsarfeatureextractor_spark.sources.tokenized import (
        with_synthetic_subbands,
    )
    import pyarrow as pa

    rows = [(str(i), [int(v) for v in np.random.default_rng(i).integers(
        0, 256, size=20 + i)]) for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id string, tokens array<int>")
    out = with_subband_scores(
        with_synthetic_subbands(df, n_chan=8), "sb_flat", n_chan=8
    ).select("doc_id", "sb_flat", *SUBBAND_FIELDS).toPandas()
    # distributed result == local kernel on the JVM-built flat cubes
    local = subband_scores_list_array(
        pa.array(list(out["sb_flat"]), type=pa.list_(pa.int32())), 8)
    got = out[SUBBAND_FIELDS].to_numpy()
    assert np.allclose(got, local, rtol=1e-12, atol=0)
    # and the JVM cube matches the python transcription of the formula
    toks = dict(rows)
    for did, flat in zip(out["doc_id"], out["sb_flat"]):
        t = toks[did]
        want = [(v + (b + 1) * (i % 17)) % 256
                for b in range(8) for i, v in enumerate(t)]
        assert list(flat) == want


def test_with_subint_scores_spark(spark):
    """Sub-integration (time-axis) cube: the JVM-built synthetic cube
    matches the python transcription, and the shared kernel scores it
    identically to the local call — the same contract as the sub-band
    test above, over the second cube axis."""
    from pulsarfeatureextractor_spark.functions.scores import (
        SUBBAND_FIELDS,
        subband_scores_list_array,
        with_subband_scores,
    )
    from pulsarfeatureextractor_spark.sources.tokenized import (
        with_synthetic_subints,
    )
    import pyarrow as pa

    rows = [(str(i), [int(v) for v in np.random.default_rng(100 + i).integers(
        0, 256, size=15 + i)]) for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id string, tokens array<int>")
    out = with_subband_scores(
        with_synthetic_subints(df, n_int=6), "si_flat", n_chan=6
    ).select("doc_id", "si_flat", *SUBBAND_FIELDS).toPandas()
    local = subband_scores_list_array(
        pa.array(list(out["si_flat"]), type=pa.list_(pa.int32())), 6)
    got = out[SUBBAND_FIELDS].to_numpy()
    assert np.allclose(got, local, rtol=1e-12, atol=0)
    toks = dict(rows)
    for did, flat in zip(out["doc_id"], out["si_flat"]):
        t = toks[did]
        want = [(v + (s + 1) * (i % 13) + 3 * s) % 256
                for s in range(6) for i, v in enumerate(t)]
        assert list(flat) == want
    # the two synthetic axes must not be trivially identical cubes
    from pulsarfeatureextractor_spark.sources.tokenized import (
        with_synthetic_subbands,
    )
    both = (with_synthetic_subbands(df, n_chan=6)
            .transform(lambda d: with_synthetic_subints(d, n_int=6)))
    row = both.select("sb_flat", "si_flat").first()
    assert list(row["sb_flat"]) != list(row["si_flat"])
