"""pack_sequences / contamination_ratio unit checks."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from pulsarfeatureextractor_spark.operators.contamination import contamination_ratio
from pulsarfeatureextractor_spark.operators.packing import pack_sequences


def test_pack_sequences_matches_serial_scan(spark):
    # 57 docs with varying token counts; small bucket_size to force
    # many buckets (exercises the two-level scan), seq_len 16
    rows = [(i, (i * 7) % 13 + 1) for i in range(57)]
    df = spark.createDataFrame(rows, "doc_id long, n_tok long")
    out = {
        r["doc_id"]: (r["tok_start"], r["pack_id"], r["pack_offset"])
        for r in pack_sequences(df, seq_len=16, bucket_size=5).collect()
    }
    start = 0
    for i, n in rows:
        assert out[i] == (start, start // 16, start % 16), f"doc {i}"
        start += n
    assert len(out) == 57


def test_pack_sequences_single_bucket_and_sparse_ids(spark):
    # non-contiguous ids: order is still by id; one giant bucket
    rows = [(100, 3), (205, 5), (999, 2)]
    df = spark.createDataFrame(rows, "doc_id long, n_tok long")
    out = {
        r["doc_id"]: (r["tok_start"], r["pack_id"], r["pack_offset"])
        for r in pack_sequences(df, seq_len=4, bucket_size=10**6).collect()
    }
    assert out == {100: (0, 0, 0), 205: (3, 0, 3), 999: (8, 2, 0)}


def test_pack_sequences_rejects_bad_seq_len(spark):
    df = spark.createDataFrame([(1, 2)], "doc_id long, n_tok long")
    with pytest.raises(ValueError):
        pack_sequences(df, seq_len=0)


def test_contamination_ratio_hand_computed(spark):
    train = spark.createDataFrame(
        [(1, "the cat sat on the mat")], "doc_id long, text string"
    )
    ev = spark.createDataFrame(
        [
            # shingles: "the cat sat","cat sat on","sat on the","on the mat"
            (10, "the cat sat on the mat"),  # 4/4 hit
            (11, "the cat sat somewhere else entirely"),  # 1/4 hit
            (12, "completely novel words here"),  # 0/2 hit
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_shingles"], r["n_hit"], r["ratio"])
        for r in contamination_ratio(train, ev).collect()
    }
    assert got[10] == (4, 4, 1.0)
    assert got[11] == (4, 1, 0.25)
    assert got[12] == (2, 0, 0.0)


def test_pack_sequences_property_random(spark):
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=8, deadline=None)
    @given(
        st.lists(st.integers(min_value=1, max_value=50), min_size=1, max_size=40),
        st.integers(min_value=1, max_value=64),
        st.integers(min_value=1, max_value=20),
    )
    def check(sizes, seq_len, bucket_size):
        rows = [(i * 3 + 1, n) for i, n in enumerate(sizes)]  # sparse ids
        df = spark.createDataFrame(rows, "doc_id long, n_tok long")
        got = {
            r["doc_id"]: (r["tok_start"], r["pack_id"], r["pack_offset"])
            for r in pack_sequences(
                df, seq_len=seq_len, bucket_size=bucket_size
            ).collect()
        }
        start = 0
        for i, n in rows:
            assert got[i] == (start, start // seq_len, start % seq_len)
            start += n

    check()


def test_pack_sequences_range_mode_matches_div_mode(spark):
    # sparse ids (the case div-mode's density contract excludes)
    rows = [(h, (h % 11) + 1) for h in (10**12 + 7 * i for i in range(200))]
    df = spark.createDataFrame(rows, "doc_id long, n_tok long")
    div = pack_sequences(df, 32, bucket_size=10**10)
    rng = pack_sequences(df, 32, bucket_mode="range", n_buckets=7)
    a = sorted((r["doc_id"], r["tok_start"], r["pack_id"], r["pack_offset"])
               for r in div.collect())
    b = sorted((r["doc_id"], r["tok_start"], r["pack_id"], r["pack_offset"])
               for r in rng.collect())
    assert a == b


def test_pack_sequences_range_mode_string_ids(spark):
    # range mode accepts ANY orderable key — here string ids
    rows = [(f"doc_{i:05d}", i % 5 + 1) for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id string, n_tok long")
    got = {
        r["doc_id"]: r["tok_start"]
        for r in pack_sequences(
            df, 16, bucket_mode="range", n_buckets=4
        ).collect()
    }
    start = 0
    for did, n in sorted(rows):
        assert got[did] == start
        start += n
