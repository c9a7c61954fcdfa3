"""Multimodal plumbing: schema, validation, stubbed decode, frame sampling."""

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from pulsarfeatureextractor_spark.functions.multimodal import (
    decode_and_featurize,
    frame_sample,
    synthetic_media,
    with_media_stats,
)


def make_fake_decoder():
    """Closure (pickled by value — the test module isn't importable on
    workers): deterministic stand-in for a real codec."""

    def fake_decoder(payload: bytes, width: int, height: int) -> np.ndarray:
        return np.frombuffer(payload, dtype=np.uint8).astype(np.float64)

    return fake_decoder


def test_media_table_shape(spark):
    df = synthetic_media(spark, 30)
    assert df.schema["payload"].dataType.typeName() == "binary"
    assert df.count() == 30
    # payload length == width*height*n_frames by construction
    bad = df.where(
        F.length("payload") != F.col("width") * F.col("height") * F.col("n_frames")
    )
    assert bad.count() == 0


def test_media_stats_jvm_only(spark):
    df = with_media_stats(synthetic_media(spark, 30))
    rows = df.select("n_bytes", "checksum", "aspect").collect()
    assert all(r.n_bytes > 0 and r.checksum is not None for r in rows)
    # no python in the plan: BatchEvalPython / ArrowEvalPython absent
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan


def test_decode_stub_raises_without_decoder(spark):
    df = synthetic_media(spark, 6)
    with pytest.raises(Exception, match="NotImplementedError|codec"):
        decode_and_featurize(df).collect()


def test_decode_with_injected_decoder(spark):
    fake = make_fake_decoder()
    df = synthetic_media(spark, 30)
    out = decode_and_featurize(df, decoder=fake).toPandas()
    assert out["valid"].all()
    # cross-check one row against a direct numpy computation
    row = out[out.media_id == "m_000000"].iloc[0]
    src = df.where(F.col("media_id") == "m_000000").collect()[0]
    px = fake(bytes(src.payload), src.width, src.height)
    assert np.isclose(row["mean_intensity"], px.mean())
    assert np.isclose(row["std_intensity"], px.std())


def test_decode_invalid_metadata_flagged_not_fatal(spark):
    fake = make_fake_decoder()
    df = synthetic_media(spark, 12).withColumn(
        "width",
        F.when(F.col("media_id") == "m_000000", F.lit(9999)).otherwise(F.col("width")),
    )
    out = decode_and_featurize(df, decoder=fake).toPandas()
    bad = out[out.media_id == "m_000000"].iloc[0]
    assert not bad["valid"] and np.isnan(bad["mean_intensity"])
    assert out[out.media_id != "m_000000"]["valid"].all()


def test_frame_sample_offsets(spark):
    df = synthetic_media(spark, 30)
    frames = frame_sample(df, every_k=2)
    pdf = frames.toPandas()
    vids = {r.media_id: r for r in df.where("kind = 'video'").collect()}
    assert set(pdf.media_id) == set(vids)
    for mid, grp in pdf.groupby("media_id"):
        v = vids[mid]
        expect_idx = list(range(0, v.n_frames, 2))
        assert sorted(grp.frame_idx) == expect_idx
        sz = v.width * v.height
        for _, fr in grp.iterrows():
            j = fr.frame_idx
            assert bytes(fr.frame_bytes) == bytes(v.payload)[j * sz:(j + 1) * sz]
