"""Regression tests for the round-3 fixes (VERDICT/ADVICE r02):

1. -0.0 float discipline: Spark F.round never emits IEEE -0.0, and the
   driver_sim comparison is bit-exact so a -0.0/+0.0 disagreement FAILS
   locally (the round-2 escape class).
2. asof_bucketed_storage(elide_sort=True) no longer leaks
   spark.sql.legacy.bucketedTableScan.outputOrdering into the session.
3. prepare_bucketed_asof_table refuses a non-empty target path instead
   of silently mixing stale part files into the new layout.
4. merge_upsert maps _metadata.file_path to manifest paths through one
   URI parser and raises (rather than duplicating keys) when matched
   files map to zero manifest paths.
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from pulsarfeatureextractor_spark.operators.asof import (
    _ORDERING_CONF,
    asof_bucketed_storage,
    bucketed_scan_ordering,
    prepare_bucketed_asof_table,
)


def test_driver_sim_compare_is_bit_exact_on_signed_zero():
    import sys
    sys.path.insert(0, "tools")
    from driver_sim import compare

    a = pd.DataFrame({"k": [1, 2], "x": [0.0, 1.5]})
    b = pd.DataFrame({"k": [1, 2], "x": [-0.0, 1.5]})
    assert compare("t", a, a.copy()) == []
    problems = compare("t", a, b)
    assert problems and "x" in problems[0]


def test_spark_round_normalizes_negative_zero(spark):
    row = spark.range(1).select(
        F.round(F.lit(-1e-9), 6).alias("r"),
        (F.round(F.lit(-1e-9), 6) + F.lit(0.0)).alias("rn"),
    ).first()
    assert np.signbit(row["rn"]) == False  # noqa: E712
    # pin the engine-side convention the lyon8 oracle fix relies on:
    # Spark's F.round of a tiny negative does NOT carry the sign bit
    assert np.signbit(row["r"]) == False  # noqa: E712


def test_duckdb_round_plus_zero_normalizes():
    import duckdb

    r, rn = duckdb.sql(
        "SELECT ROUND(-1e-9, 6) AS r, ROUND(-1e-9, 6) + 0.0 AS rn"
    ).fetchone()
    assert np.signbit(r)  # DuckDB preserves the sign (the round-2 bug)
    assert not np.signbit(rn)  # the oracle-side normalization works


@pytest.fixture()
def small_sides(spark):
    left = spark.range(0, 200).select(
        (F.col("id") % 10).alias("doc_id"),
        F.timestamp_seconds(1700000000 + F.col("id") * 7).alias("ts"),
        F.col("id").alias("event_id"),
    )
    right = spark.range(0, 50).select(
        (F.col("id") % 10).alias("doc_id"),
        F.timestamp_seconds(1700000000 + F.col("id") * 29).alias("ts"),
        (F.col("id").cast("double") * 1.5).alias("v"),
    )
    return left, right


def test_elide_sort_restores_session_conf(spark, small_sides, tmp_path):
    left, right = small_sides
    name = "r3_conf_restore_tbl"
    prepare_bucketed_asof_table(
        left, right, name, str(tmp_path / "t"), on="ts", by="doc_id",
        value_cols=["v"], n_buckets=4,
    )
    assert spark.conf.get(_ORDERING_CONF, None) is None
    try:
        got = asof_bucketed_storage(spark, name, on="ts", by="doc_id",
                                    value_cols=["v"], elide_sort=True)
        # conf restored immediately after the call...
        assert spark.conf.get(_ORDERING_CONF, None) is None
        # ...yet the returned DataFrame keeps the elided plan (no Sort,
        # no Exchange) because planning was forced under the conf
        plan = got._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert plan.count("Sort ") == 0, plan
        assert got.count() == 200
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_elide_sort_respects_preexisting_conf(spark, small_sides, tmp_path):
    left, right = small_sides
    name = "r3_conf_prev_tbl"
    prepare_bucketed_asof_table(
        left, right, name, str(tmp_path / "t"), on="ts", by="doc_id",
        value_cols=["v"], n_buckets=4,
    )
    spark.conf.set(_ORDERING_CONF, "false")
    try:
        asof_bucketed_storage(spark, name, on="ts", by="doc_id",
                              value_cols=["v"], elide_sort=True)
        assert spark.conf.get(_ORDERING_CONF) == "false"
    finally:
        spark.conf.unset(_ORDERING_CONF)
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_bucketed_scan_ordering_context_manager(spark):
    assert spark.conf.get(_ORDERING_CONF, None) is None
    with bucketed_scan_ordering(spark):
        assert spark.conf.get(_ORDERING_CONF) == "true"
    assert spark.conf.get(_ORDERING_CONF, None) is None


def test_prepare_refuses_nonempty_path(spark, small_sides, tmp_path):
    left, right = small_sides
    stale = tmp_path / "t"
    stale.mkdir()
    (stale / "part-stale.parquet").write_bytes(b"junk")
    with pytest.raises(ValueError, match="non-empty"):
        prepare_bucketed_asof_table(
            left, right, "r3_refuse_tbl", str(stale), on="ts", by="doc_id",
            value_cols=["v"], n_buckets=4,
        )
    spark.sql("DROP TABLE IF EXISTS r3_refuse_tbl")


def test_merge_upsert_uri_normalization(spark, tmp_path):
    """Manifest paths stored WITH a file: scheme must still match the
    _metadata.file_path rendering — one URI parser on both sides."""
    import json
    import os

    from pulsarfeatureextractor_spark.sinks.manifest import (
        MANIFEST_DIR,
        IcebergLikeTable,
    )

    t = IcebergLikeTable(str(tmp_path / "tbl"))
    base = spark.range(0, 10).select(
        F.col("id").alias("k"), F.lit("old").alias("val")
    )
    t.write(base, mode="overwrite")
    # adversarial rewrite: prepend 'file:' to every manifest path, as a
    # different Hadoop FS rendering would
    man_dir = os.path.join(t.path, MANIFEST_DIR)
    for fn in os.listdir(man_dir):
        p = os.path.join(man_dir, fn)
        man = json.load(open(p))
        if "files" not in man:
            continue
        for f in man["files"]:
            f["path"] = "file:" + f["path"]
        json.dump(man, open(p, "w"))
    upd = spark.range(5, 12).select(
        F.col("id").alias("k"), F.lit("new").alias("val")
    )
    t.merge_upsert(upd, keys=["k"])
    out = t.read(spark).toPandas().sort_values("k").reset_index(drop=True)
    assert list(out["k"]) == list(range(12))  # no duplicate keys
    assert (out.loc[out["k"] >= 5, "val"] == "new").all()
    assert (out.loc[out["k"] < 5, "val"] == "old").all()


def test_infer_bucket_count(tmp_path, small_sides, spark):
    from pulsarfeatureextractor_spark.operators.asof import (
        infer_bucket_count,
    )

    left, right = small_sides
    name = "r3_infer_tbl"
    prepare_bucketed_asof_table(
        left, right, name, str(tmp_path / "t"), on="ts", by="doc_id",
        value_cols=["v"], n_buckets=4,
    )
    try:
        # the small fixture can legitimately leave a bucket empty (no
        # key hashes into it) — under the round-4 hardening a gapped
        # filename set alone is ambiguous, so the writer's count
        # disambiguates; a contiguous layout needs no expected=
        assert infer_bucket_count(str(tmp_path / "t"), expected=4) == 4
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
    with pytest.raises(ValueError, match="no bucketed part files"):
        empty = tmp_path / "empty"
        empty.mkdir()
        infer_bucket_count(str(empty))


def test_infer_bucket_count_gapped_raises(tmp_path):
    """Round-4 hardening (VERDICT r03 #6 / ADVICE r03 #3): collapsed or
    gapped bucket ids RAISE by default — max+1 can silently undercount
    when the highest bucket wrote no file; `expected=` disambiguates,
    `allow_collapsed=True` restores the old warning behavior."""
    from pulsarfeatureextractor_spark.operators.asof import (
        infer_bucket_count,
    )

    d = tmp_path / "gapped"
    d.mkdir()
    uuid = "0abc1de2-3f45-6789-abcd-ef0123456789"
    for b in (0, 2, 3):  # bucket 1 missing
        (d / f"part-00000-{uuid}_{b:05d}.snappy.parquet").touch()
    with pytest.raises(ValueError, match="gapped layout"):
        infer_bucket_count(str(d))
    with pytest.warns(UserWarning, match="gapped layout"):
        assert infer_bucket_count(str(d), allow_collapsed=True) == 4
    # expected >= observed max+1: trust the writer (empty top buckets)
    assert infer_bucket_count(str(d), expected=8) == 8
    # expected below an observed id: silent row-dropping class — refuse
    with pytest.raises(ValueError, match="refusing"):
        infer_bucket_count(str(d), expected=2)


def test_prepare_refuses_nonempty_and_overwrites(tmp_path, small_sides, spark):
    """Round-4: the stale-files guard goes through the Hadoop FS API
    (covers non-local URIs too) and overwrite=True clears in place."""
    left, right = small_sides
    name = "r4_overwrite_tbl"
    path = tmp_path / "t"
    path.mkdir()
    (path / "stale.parquet").write_bytes(b"junk")
    with pytest.raises(ValueError, match="non-empty"):
        prepare_bucketed_asof_table(
            left, right, name, str(path), on="ts", by="doc_id",
            value_cols=["v"], n_buckets=2,
        )
    try:
        prepare_bucketed_asof_table(
            left, right, name, str(path), on="ts", by="doc_id",
            value_cols=["v"], n_buckets=2, overwrite=True,
        )
        files = {p.name for p in path.iterdir()}
        assert "stale.parquet" not in files
        assert any(f.startswith("part-") for f in files)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_merge_upsert_mixed_rendering_raises(spark, tmp_path, monkeypatch):
    """ADVICE r03 #1: the rendering-mismatch guard must fire when ANY
    touched file fails to map to a manifest path, not only when ALL do
    — a mixed-rendering merge would otherwise duplicate the unmapped
    file's surviving rows silently."""
    import json
    import os

    from pulsarfeatureextractor_spark.sinks import manifest as manifest_mod
    from pulsarfeatureextractor_spark.sinks.manifest import (
        MANIFEST_DIR,
        IcebergLikeTable,
    )

    t = IcebergLikeTable(str(tmp_path / "tbl"))
    base = spark.range(0, 20).select(
        F.col("id").alias("k"), F.lit("old").alias("val")
    )
    t.write(base.repartition(2), mode="overwrite")
    man_dir = os.path.join(t.path, MANIFEST_DIR)
    data_files = []
    for fn in sorted(os.listdir(man_dir)):
        man = json.load(open(os.path.join(man_dir, fn)))
        if man.get("files"):
            data_files = [f["path"] for f in man["files"]]
    assert len(data_files) >= 2, "fixture must produce >= 2 data files"
    victim = os.path.basename(data_files[0])

    # simulate MIXED rendering: normalization fails for exactly one
    # touched file (stays in scheme form), succeeds for the rest
    real = manifest_mod._uri_local_path

    def mixed(p: str) -> str:
        if victim in p and p.startswith("file:"):
            return p
        return real(p)

    monkeypatch.setattr(manifest_mod, "_uri_local_path", mixed)
    upd = spark.range(0, 20).select(  # touches every file
        F.col("id").alias("k"), F.lit("new").alias("val")
    )
    with pytest.raises(RuntimeError, match="map to no manifest path"):
        t.merge_upsert(upd, keys=["k"])
