"""tfidf_topk and numeric_profile unit checks."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from pulsarfeatureextractor_spark.functions.profile import numeric_profile
from pulsarfeatureextractor_spark.functions.tfidf import tfidf_topk


def test_tfidf_hand_computed(spark):
    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "a c"), (3, "b b c c")], "doc_id long, text string"
    )
    out = tfidf_topk(docs, k=2).collect()
    idf = math.log(4 / 3) + 1  # every term appears in 2 of 3 docs
    got = {(r["doc_id"], r["term"]): (r["tfidf"], r["rk"]) for r in out}
    assert got == {
        (1, "a"): (round(2 * idf, 6), 1),
        (1, "b"): (round(1 * idf, 6), 2),
        (2, "a"): (round(1 * idf, 6), 1),  # tie with c → term asc
        (2, "c"): (round(1 * idf, 6), 2),
        (3, "b"): (round(2 * idf, 6), 1),
        (3, "c"): (round(2 * idf, 6), 2),
    }


def test_tfidf_idf_join_is_broadcast(spark):
    docs = spark.createDataFrame([(1, "x y")], "doc_id long, text string")
    plan = (
        tfidf_topk(docs)._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan


def test_numeric_profile_known_values(spark):
    df = spark.createDataFrame(
        [("g", v) for v in (1, 2, 3, 4)] + [("h", 10)], "src string, v long"
    )
    rows = {r["src"]: r for r in numeric_profile(df, "src", "v").collect()}
    g = rows["g"]
    assert (g["n"], g["v_min"], g["v_max"]) == (4, 1, 4)
    assert g["v_avg"] == 2.5
    assert g["v_median"] == 2.5
    assert g["v_stddev"] == round(math.sqrt(5 / 3), 6)
    h = rows["h"]
    assert (h["n"], h["v_min"], h["v_max"], h["v_avg"], h["v_median"]) == (
        1,
        10,
        10,
        10.0,
        10.0,
    )
    assert h["v_stddev"] is None  # stddev_samp of a single row


def test_numeric_profile_approx_mode_runs(spark):
    df = spark.createDataFrame([("g", v) for v in range(100)], "src string, v long")
    row = numeric_profile(df, "src", "v", exact_median=False).collect()[0]
    assert 40 <= row["v_median"] <= 60


def test_repetition_metrics_hand_computed(spark):
    from pulsarfeatureextractor_spark.functions.text import with_repetition_metrics

    df = spark.createDataFrame(
        [(1, "a a a b"), (2, "x y x y"), (3, "w")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["rep_1"], r["rep_2"], r["rep_3"])
        for r in with_repetition_metrics(df).collect()
    }
    assert got[1] == (0.75, 0.666667, 0.5)
    assert got[2] == (0.5, 0.666667, 0.5)
    # single word: every n-gram tier degenerates to the word itself
    assert got[3] == (1.0, 1.0, 1.0)


def test_chunk_documents_sliding_window(spark):
    from pulsarfeatureextractor_spark.functions.text import chunk_documents

    df = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(10))), (2, "a b")],
        "doc_id long, text string",
    )
    rows = chunk_documents(df, chunk_tokens=4, overlap=2).collect()
    got = {(r["doc_id"], r["chunk_id"]): (r["chunk_text"], r["chunk_len"]) for r in rows}
    assert got[(1, 0)] == ("t0 t1 t2 t3", 4)
    assert got[(1, 1)] == ("t2 t3 t4 t5", 4)
    assert got[(1, 3)] == ("t6 t7 t8 t9", 4)
    assert got[(2, 0)] == ("a b", 2)
    assert len(got) == 5
    # every token appears in at least one chunk
    covered = set()
    for (d, _), (txt, _) in got.items():
        if d == 1:
            covered.update(txt.split(" "))
    assert covered == {f"t{i}" for i in range(10)}


def test_chunk_documents_rejects_bad_overlap(spark):
    import pytest

    from pulsarfeatureextractor_spark.functions.text import chunk_documents

    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=4, overlap=4)


def test_redact_pii_counts_and_replaces(spark):
    from pulsarfeatureextractor_spark.functions.text import redact_pii

    df = spark.createDataFrame(
        [(1, "mail bob@example.com or 10.0.0.1 now"), (2, "clean text")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in redact_pii(df).collect()}
    assert rows[1]["n_email"] == 1 and rows[1]["n_ipv4"] == 1
    assert rows[1]["text_redacted"] == "mail <PII> or <PII> now"
    assert rows[2]["n_email"] == 0 and rows[2]["text_redacted"] == "clean text"
