"""DSIR importance weights + Gumbel selection (functions/dsir.py) —
equivalence with an independent pure-python twin, partitioning
determinism, NULL/empty-text handling, selection semantics, and the
broadcast-model plan shape."""

from __future__ import annotations

import hashlib
import math
from collections import Counter
from decimal import ROUND_HALF_UP, Decimal

import pytest

from pulsarfeatureextractor_spark.functions.dsir import (
    N_BUCKETS,
    dsir_log_ratios,
    dsir_select,
    gram_table,
    with_dsir_logweight,
)

DOCS = [
    (0, "a b c a b c", "en", "s0"),
    (1, "a b x", "de", "s0"),
    (2, "x y z", "en", "s1"),
    (3, None, "en", "s1"),
    (4, "", "de", "s1"),
    (5, "a b c d e", "de", "s0"),
    (6, "c d e", "en", "s0"),
]
SCHEMA = "doc_id long, text string, lang string, source string"


def _docs(spark, rows=DOCS):
    return spark.createDataFrame(rows, SCHEMA)


# ---- independent twin (hashlib md5, Counter, Decimal half-up) ----

def _twin_bucket(s, seed):
    return int(hashlib.md5(f"{s}|{seed}".encode()).hexdigest()[:3], 16)


def _twin_grams(text):
    ws = [w for w in (text or "").split(" ") if w]
    return ws + [f"{a} {b}" for a, b in zip(ws, ws[1:])]


def _round9_dec(x):
    return Decimal(repr(x)).quantize(Decimal("1e-9"), ROUND_HALF_UP)


def _twin_weights(rows, target_lang="en", seed="dsir"):
    ct, cr = Counter(), Counter()
    for _, text, lang, _src in rows:
        for g in _twin_grams(text):
            b = _twin_bucket(g, seed)
            cr[b] += 1
            if lang == target_lang:
                ct[b] += 1
    tt, tr = sum(ct.values()), sum(cr.values())
    lr = {
        b: _round9_dec(
            math.log((ct.get(b, 0) + 1) / float(tt + N_BUCKETS))
            - math.log((c + 1) / float(tr + N_BUCKETS))
        )
        for b, c in cr.items()
    }
    out = {}
    for did, text, _lang, _src in rows:
        gs = _twin_grams(text)
        if not gs:
            out[did] = (0, None)
        else:
            s = sum(lr[_twin_bucket(g, seed)] for g in gs)
            out[did] = (len(gs), float(
                Decimal(repr(float(s))).quantize(
                    Decimal("1e-6"), ROUND_HALF_UP)
            ))
    return out


def _spark_weights(spark, rows=DOCS):
    d = _docs(spark, rows)
    lr = dsir_log_ratios(d.where("lang = 'en'"), d)
    return with_dsir_logweight(d, lr)


def test_gram_table_unigrams_then_bigrams(spark):
    got = sorted(
        (r["doc_id"], r["gram"])
        for r in gram_table(_docs(spark)).collect()
    )
    want = sorted(
        (did, g) for did, text, _l, _s in DOCS for g in _twin_grams(text)
    )
    assert got == want


def test_weights_match_twin(spark):
    got = {
        r["doc_id"]: (r["n_grams"], r["dsir_logw"])
        for r in _spark_weights(spark).collect()
    }
    assert got == _twin_weights(DOCS)
    # empty/NULL text: zero grams, NULL weight
    assert got[3] == (0, None) and got[4] == (0, None)


def test_weights_deterministic_across_partitionings(spark):
    d = _docs(spark)
    lr = dsir_log_ratios(d.where("lang = 'en'"), d)
    base = sorted(map(tuple, with_dsir_logweight(d, lr).collect()))
    d13 = d.repartition(13)
    lr13 = dsir_log_ratios(d13.where("lang = 'en'"), d13)
    assert sorted(map(tuple, with_dsir_logweight(d13, lr13).collect())) == base


def test_select_per_stratum_counts_and_gumbel(spark):
    w = _spark_weights(spark)
    sel = dsir_select(w, frac=0.5).collect()
    by_src = Counter(r["source"] for r in sel)
    # s0: 4 rows -> floor(2.0) = 2; s1: 3 rows -> floor(1.5) = 1
    assert by_src == {"s0": 2, "s1": 1}
    # twin: same keys, same winners
    tw = _twin_weights(DOCS)
    keys = {}
    for did, _t, _l, src in DOCS:
        lw = tw[did][1]
        if lw is None:
            keys[did] = (src, None)
        else:
            u = (_twin_bucket(did, "dsir-gumbel") + 0.5) / float(N_BUCKETS)
            k = float(Decimal(repr(lw + -math.log(-math.log(u)))).quantize(
                Decimal("1e-6"), ROUND_HALF_UP))
            keys[did] = (src, k)
    want = set()
    for src, k in (("s0", 2), ("s1", 1)):
        ranked = sorted(
            ((kk, did) for did, (s, kk) in keys.items()
             if s == src and kk is not None),
            key=lambda t: (-t[0], t[1]),
        )
        want |= {did for _kk, did in ranked[:k]}
    assert {r["doc_id"] for r in sel} == want
    got_keys = {r["doc_id"]: r["sel_key"] for r in sel}
    for did, kk in got_keys.items():
        assert kk == keys[did][1]


def test_select_null_weights_never_beat_scored_rows(spark):
    w = _spark_weights(spark)
    sel = dsir_select(w, frac=0.5).collect()
    assert all(r["sel_key"] is not None for r in sel)


def test_select_frac_validation(spark):
    w = _spark_weights(spark)
    for bad in (0.0, -0.1, 1.5):
        with pytest.raises(ValueError):
            dsir_select(w, frac=bad)


def test_model_is_broadcast_single_corpus_shuffle(spark):
    """The ≤4096-row log-ratio model must broadcast onto the gram
    stream — no shuffle of the corpus on the bucket key; the only
    corpus-scale exchanges are the doc aggregate + the join-back."""
    d = _docs(spark)
    lr = dsir_log_ratios(d.where("lang = 'en'"), d)
    plan = (
        with_dsir_logweight(d, lr)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the scoring join (corpus gram stream x model) builds the model side
    assert "BroadcastHashJoin [bucket" in plan
    # no sort-merge join anywhere on the bucket key: the tiny
    # model-building ct join broadcasts too
    assert "SortMergeJoin [bucket" not in plan


def test_xxhash_production_tier_matches_port_twin(spark):
    """hasher='xxhash' (the production tier: one JVM xxhash64 per gram
    instead of md5) must match a twin built on the from-spec python
    XXH64 port (tools/xxh64.py, itself JVM-pinned by test_xxh64)."""
    from tools.xxh64 import xxh64

    d = _docs(spark)
    lr = dsir_log_ratios(d.where("lang = 'en'"), d, hasher="xxhash")
    got = {
        r["doc_id"]: (r["n_grams"], r["dsir_logw"])
        for r in with_dsir_logweight(d, lr, hasher="xxhash").collect()
    }

    ct, cr = Counter(), Counter()
    for _, text, lang, _src in DOCS:
        for g in _twin_grams(text):
            b = xxh64(f"{g}|dsir") % N_BUCKETS
            cr[b] += 1
            if lang == "en":
                ct[b] += 1
    tt, tr = sum(ct.values()), sum(cr.values())
    lrm = {
        b: _round9_dec(
            math.log((ct.get(b, 0) + 1) / float(tt + N_BUCKETS))
            - math.log((c + 1) / float(tr + N_BUCKETS))
        )
        for b, c in cr.items()
    }
    for did, text, _lang, _src in DOCS:
        gs = _twin_grams(text)
        if not gs:
            assert got[did] == (0, None)
        else:
            s = sum(lrm[xxh64(f"{g}|dsir") % N_BUCKETS] for g in gs)
            want = float(Decimal(repr(float(s))).quantize(
                Decimal("1e-6"), ROUND_HALF_UP))
            assert got[did] == (len(gs), want)


def test_unknown_hasher_raises(spark):
    d = _docs(spark)
    try:
        dsir_log_ratios(d.where("lang = 'en'"), d, hasher="nope")
        # error surfaces at plan build time
        raise AssertionError("did not raise")
    except ValueError as e:
        assert "hasher" in str(e)
