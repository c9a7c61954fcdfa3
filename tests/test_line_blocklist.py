"""RefinedWeb exact line-level dedup (operators/dedup.line_dedup) and
C4 blocklist gate (functions/text.blocklist_filter) — semantics pinned
against hand-computed fixtures, partitioning determinism, NULL/blank
discipline, and the scan-fused plan shape of the blocklist gate."""

from __future__ import annotations

from pulsarfeatureextractor_spark.functions.text import blocklist_filter
from pulsarfeatureextractor_spark.operators.dedup import line_dedup


def _rows(df, key="doc_id"):
    return {r[key]: r.asDict() for r in df.collect()}


FIX = [
    (1, "a b\nc d\n\na b"),   # 'a b' twice intra-doc; 'c d' cross-doc
    (2, "c d\nx y"),
    (3, None),                 # NULL text -> one '' line, kept
    (4, "  \nz z"),            # blank line never dedup-eligible
    (5, "x y\nx y\nq r"),      # 'x y' intra + cross with doc 2
]


def _fixture(spark, parts=2):
    return spark.createDataFrame(FIX, "doc_id long, text string").repartition(
        parts
    )


def test_line_dedup_hand_fixture(spark):
    out = _rows(line_dedup(_fixture(spark)))
    # 'a b' occurs 2x (intra), 'c d' 2x (cross), 'x y' 3x -> all removed
    assert out[1] == {
        "doc_id": 1, "clean_text": "", "n_lines": 4, "n_kept": 1,
        "n_removed": 3,
    }
    assert out[2]["clean_text"] == "" and out[2]["n_removed"] == 2
    # NULL text behaves as '' — one blank line, always kept
    assert out[3] == {
        "doc_id": 3, "clean_text": "", "n_lines": 1, "n_kept": 1,
        "n_removed": 0,
    }
    # blank lines are never dedup-eligible; unique lines survive in order
    assert out[4]["clean_text"] == "  \nz z" and out[4]["n_removed"] == 0
    assert out[5]["clean_text"] == "q r" and out[5]["n_kept"] == 1


def test_line_dedup_min_count_and_order(spark):
    df = spark.createDataFrame(
        [(1, "p q\nr s\np q\nt u"), (2, "r s")], "doc_id long, text string"
    )
    # min_count=3: nothing reaches 3 occurrences -> everything kept,
    # original order preserved through the reassembly
    out = _rows(line_dedup(df, min_count=3))
    assert out[1]["clean_text"] == "p q\nr s\np q\nt u"
    assert out[1]["n_removed"] == 0
    # min_count=2 removes both duplicated lines everywhere
    out2 = _rows(line_dedup(df, min_count=2))
    assert out2[1]["clean_text"] == "t u" and out2[1]["n_removed"] == 3
    assert out2[2]["clean_text"] == "" and out2[2]["n_kept"] == 0


def test_line_dedup_partitioning_determinism(spark):
    a = line_dedup(_fixture(spark, parts=1)).orderBy("doc_id").collect()
    b = line_dedup(_fixture(spark, parts=7)).orderBy("doc_id").collect()
    assert a == b


def test_line_dedup_no_python_in_plan(spark):
    plan = line_dedup(_fixture(spark))._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan  # pure JVM: posexplode/agg/anti-join


def test_blocklist_hand_fixture(spark):
    df = spark.createDataFrame(
        [(1, "the big slow cat big"), (2, "ok fine"), (3, None), (4, "")],
        "doc_id long, text string",
    )
    out = _rows(blocklist_filter(df, ["big", "slow"], max_distinct_hits=0))
    assert out[1]["n_blocked_distinct"] == 2
    assert out[1]["n_blocked_tokens"] == 3  # 'big' twice + 'slow'
    assert out[1]["blocklist_keep"] is False
    for d in (2, 3, 4):  # clean / NULL / empty all keep at tolerance 0
        assert out[d]["n_blocked_distinct"] == 0
        assert out[d]["blocklist_keep"] is True


def test_blocklist_tolerance_and_case(spark):
    df = spark.createDataFrame(
        [(1, "Big big"), (2, "big slow")], "doc_id long, text string"
    )
    out = _rows(blocklist_filter(df, ["big", "slow"], max_distinct_hits=1))
    # matching is exact/case-sensitive: 'Big' is not 'big'
    assert out[1]["n_blocked_distinct"] == 1 and out[1]["blocklist_keep"] is True
    assert out[2]["n_blocked_distinct"] == 2 and out[2]["blocklist_keep"] is False


def test_blocklist_scan_fused_plan(spark):
    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    plan = (
        blocklist_filter(df, ["a"])._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "Python" not in plan


def test_paragraph_dedup_via_sep(spark):
    """Dolma-style paragraph dedup is line_dedup with sep='\\n\\n' —
    the separator is a first-class parameter, so the same single
    -aggregate plan covers both granularities."""
    df = spark.createDataFrame(
        [
            (1, "para one\nwraps\n\nshared para"),
            (2, "shared para\n\nunique tail"),
        ],
        "doc_id long, text string",
    )
    out = _rows(line_dedup(df, sep="\n\n"))
    # 'shared para' appears in both docs -> removed from both; the
    # intra-paragraph newline is NOT a boundary at this granularity
    assert out[1]["clean_text"] == "para one\nwraps"
    assert out[2]["clean_text"] == "unique tail"
    assert out[1]["n_removed"] == 1 and out[2]["n_removed"] == 1


def test_line_dedup_regex_metachar_sep(spark):
    """sep is LITERAL on both the split and the rejoin: an unquoted
    '|' would regex-split between every character (review finding)."""
    df = spark.createDataFrame(
        [(1, "aa|bb|cc"), (2, "bb|dd")], "doc_id long, text string"
    )
    out = _rows(line_dedup(df, sep="|"))
    # only the 'bb' segment is duplicated corpus-wide
    assert out[1]["clean_text"] == "aa|cc" and out[1]["n_removed"] == 1
    assert out[2]["clean_text"] == "dd" and out[2]["n_lines"] == 2
