"""Generate committed VALUES-literal DuckDB oracles (sf0.01).

For queries whose math is not ANSI-SQL-expressible (Thornton lstsq
curve fits) or whose hashing DuckDB lacks (Spark xxhash64), the driver
gate still gets an EXACT row+schema+hash check: this script recomputes
the expected sf0.01 output with implementations INDEPENDENT of the
Spark execution path and emits `SELECT * FROM (VALUES ...)` SQL into
tests/value_oracles_sf001.json, which __spark_entry__.oracle_sql()
merges at call time.

Independence per query:

- minhash_lsh_pairs_docs / simhash_pairs_docs / vocab_tokenize_docs /
  fingerprint_docs: re-derived from scratch in pure Python + numpy on
  top of tools/xxh64.py — a from-spec XXH64 port pinned bit-for-bit
  against the JVM by tests/test_xxh64.py.  These rows differentially
  check Spark's JVM hashing, array folds, and the Arrow UDF kernels
  against a second, non-Spark implementation.
- thornton_scores_docs: values come from the engine's numpy kernel run
  locally (single batch), but only AFTER this script asserts them
  allclose (rtol 1e-9) against the naive per-row transcription
  tests/oracle.thornton_oracle_row — the independence check happens
  here and in pytest; the committed literal then pins the Spark
  execution path exactly.  (The lstsq kernel is batch-composition-
  dependent at ~1e-16; measured rounding-boundary margin at sf0.01 is
  >=1.8e-10, five orders of magnitude of safety — verified below.)

Rounding: Spark's round(x, 6) is ROUND_HALF_UP over the shortest
decimal repr (BigDecimal.valueOf).  `spark_round6` reproduces it.

Usage: python tools/gen_value_oracles.py  (regenerate after any change
to the fixtures or the sketch parameters; commit the JSON).
"""

from __future__ import annotations

import json
import os
import sys
from decimal import ROUND_HALF_UP, Decimal

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.xxh64 import xxh64  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "value_oracles_sf001.json")
MERSENNE = (1 << 61) - 1


def spark_round6(x: float) -> float:
    d = Decimal(repr(float(x))).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP)
    return float(d)


def _sql_str(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def _values_sql(rows, cols) -> str:
    """rows: list of tuples of (sql_literal_strings); cols: [(name, type)]."""
    first = rows[0]
    head = ", ".join(
        f"CAST({v} AS {t})" for v, (_, t) in zip(first, cols)
    )
    body = [f"({head})"]
    for r in rows[1:]:
        body.append("(" + ", ".join(r) + ")")
    names = ", ".join(n for n, _ in cols)
    return (
        "SELECT * FROM (VALUES\n" + ",\n".join(body) + f"\n) AS t({names})"
    )


def _shingles(words, n):
    k = max(len(words) - n + 1, 1)
    return list(dict.fromkeys(" ".join(words[i:i + n]) for i in range(k)))


def load_docs():
    t = pq.read_table(os.path.join(SF_DIR, "documents.parquet"),
                      columns=["doc_id", "text"])
    # doc_id is int64 in the fixture; queries that run the documents
    # table through documents_to_sequences/vocab_tokenize cast it to
    # string, while the dedup/fingerprint queries keep the native type
    # (numeric ordering of id_a < id_b!) — each generator picks.
    ids = t.column("doc_id").to_pylist()
    texts = t.column("text").to_pylist()
    return ids, texts


def gen_thornton(ids, texts) -> str:
    from pulsarfeatureextractor_spark.functions.scores import (
        SCORE_FIELDS,
        scores_list_array,
    )
    from tests.oracle import thornton_oracle_row

    toks = [[len(w) % 256 for w in s.split(" ")] for s in texts]
    got = scores_list_array(pa.array(toks, type=pa.list_(pa.int32())))
    # independence check: engine kernel vs naive per-row transcription
    for i, tk in enumerate(toks):
        want = thornton_oracle_row(np.asarray(tk, dtype=np.float64))
        for j, name in enumerate(SCORE_FIELDS):
            assert np.isclose(got[i, j], want[name], rtol=1e-9, atol=1e-12), (
                ids[i], name, got[i, j], want[name])
    # rounding-boundary safety margin (see module docstring)
    v = got.flatten() * 1e6
    margin = np.abs((v - np.floor(v)) - 0.5).min()
    assert margin > 1e-6, f"value too close to a round-6 boundary: {margin}"

    rows = []
    for i, did in enumerate(ids):
        lits = [_sql_str(str(did))] + [repr(spark_round6(got[i, j]))
                                  for j in range(len(SCORE_FIELDS))]
        rows.append(tuple(lits))
    cols = [("doc_id", "VARCHAR")] + [(n, "DOUBLE") for n in SCORE_FIELDS]
    return _values_sql(rows, cols)


def _minhash_signatures(texts, num_perm=64, shingle_n=3, seed=12345):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, MERSENNE, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, MERSENNE, size=num_perm, dtype=np.uint64)
    sigs = []
    for s in texts:
        hs = np.array(
            [xxh64(sh) for sh in _shingles(s.split(" "), shingle_n)],
            dtype=np.int64,
        ).view(np.uint64)
        hv = (hs[:, None] * a + b) % MERSENNE  # uint64 wrap, like the UDF
        sigs.append(hv.min(axis=0).astype(np.int64))
    return sigs


def gen_minhash_pairs(ids, texts, num_perm=64, bands=16, threshold=0.7) -> str:
    sigs = _minhash_signatures(texts, num_perm=num_perm)
    rows_per = num_perm // bands
    buckets: dict = {}
    for i, sig in enumerate(sigs):
        for bnd in range(bands):
            key = (bnd, tuple(sig[bnd * rows_per:(bnd + 1) * rows_per]))
            buckets.setdefault(key, []).append(i)
    cand = set()
    for members in buckets.values():
        for x in range(len(members)):
            for y in range(x + 1, len(members)):
                i, j = members[x], members[y]
                ia, ib = (i, j) if ids[i] < ids[j] else (j, i)
                cand.add((ia, ib))
    out = []
    for i, j in cand:
        est = float((sigs[i] == sigs[j]).sum()) / num_perm
        if est >= threshold:
            out.append((ids[i], ids[j], est))
    out.sort()
    rows = [(str(a), str(b), repr(spark_round6(e))) for a, b, e in out]
    return _values_sql(
        rows, [("id_a", "BIGINT"), ("id_b", "BIGINT"), ("est_jaccard", "DOUBLE")]
    )


def gen_simhash_pairs(ids, texts, max_hamming=3, shingle_n=2) -> str:
    sigs = []
    for s in texts:
        hs = np.array(
            [xxh64(sh) for sh in _shingles(s.split(" "), shingle_n)],
            dtype=np.int64,
        ).view(np.uint64)
        bits = np.unpackbits(
            hs.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little"
        ).astype(np.int32)
        votes = (2 * bits - 1).sum(axis=0)
        weights = np.uint64(1) << np.arange(64, dtype=np.uint64)
        sigs.append(int(((votes > 0).astype(np.uint64) * weights).sum(
            dtype=np.uint64)))
    n_blocks = max_hamming + 1
    buckets: dict = {}
    for i, sig in enumerate(sigs):
        for blk in range(n_blocks):
            key = (blk, (sig >> (blk * 16)) & 0xFFFF)
            buckets.setdefault(key, []).append(i)
    cand = set()
    for members in buckets.values():
        for x in range(len(members)):
            for y in range(x + 1, len(members)):
                i, j = members[x], members[y]
                ia, ib = (i, j) if ids[i] < ids[j] else (j, i)
                cand.add((ia, ib))
    out = []
    for i, j in cand:
        ham = bin(sigs[i] ^ sigs[j]).count("1")
        if ham <= max_hamming:
            out.append((ids[i], ids[j], ham))
    out.sort()
    rows = [(str(a), str(b), str(h)) for a, b, h in out]
    return _values_sql(
        rows, [("id_a", "BIGINT"), ("id_b", "BIGINT"), ("hamming", "INT")]
    )


def gen_vocab_hash(ids, texts) -> str:
    rows = []
    for did, s in zip(ids, texts):
        words = s.split(" ")
        toks = " ".join(str(xxh64(w) % ((1 << 31) - 1) + 1) for w in words)
        rows.append((_sql_str(str(did)), _sql_str(toks), str(len(words))))
    return _values_sql(
        rows, [("doc_id", "VARCHAR"), ("tokens_str", "VARCHAR"), ("n_tok", "INT")]
    )


def gen_fingerprint(ids, texts) -> str:
    mod = 1 << 40
    rows = []
    for did, s in zip(ids, texts):
        acc = 0
        for w in s.split(" "):
            acc = (acc * 1000003 + (xxh64(w) % mod)) % mod
        rows.append((str(did), str(acc)))
    return _values_sql(rows, [("doc_id", "BIGINT"), ("fingerprint", "BIGINT")])


def gen_subband(ids, texts, n_chan=8) -> str:
    """Sub-band scores over the deterministic synthetic cube
    (sources/tokenized.with_synthetic_subbands): band b bin i =
    (tokens[i] + (b+1)*(i%17)) % 256, tokens = len(word)%256.  Cube
    rebuilt here in pure integer Python, scored by the engine kernel
    AFTER an allclose check against the naive per-row transcription
    tests/oracle.subband_oracle_row (same independence discipline as
    gen_thornton)."""
    from pulsarfeatureextractor_spark.functions.scores import (
        SUBBAND_FIELDS,
        subband_scores_list_array,
    )
    from tests.oracle import subband_oracle_row

    flats = []
    for s in texts:
        toks = [len(w) % 256 for w in s.split(" ")]
        flat = []
        for b in range(n_chan):
            flat.extend((t + (b + 1) * (i % 17)) % 256
                        for i, t in enumerate(toks))
        flats.append(flat)
    got = subband_scores_list_array(
        pa.array(flats, type=pa.list_(pa.int32())), n_chan)
    for i, flat in enumerate(flats):
        mat = np.asarray(flat, dtype=np.float64).reshape(n_chan, -1)
        want = subband_oracle_row(mat)
        for j, name in enumerate(SUBBAND_FIELDS):
            assert np.isclose(got[i, j], want[name], rtol=1e-9, atol=1e-12), (
                ids[i], name, got[i, j], want[name])
    v = got.flatten() * 1e6
    margin = np.abs((v - np.floor(v)) - 0.5).min()
    assert margin > 1e-6, f"value too close to a round-6 boundary: {margin}"

    rows = []
    for i, did in enumerate(ids):
        lits = [_sql_str(str(did))] + [repr(spark_round6(got[i, j]))
                                       for j in range(len(SUBBAND_FIELDS))]
        rows.append(tuple(lits))
    cols = [("doc_id", "VARCHAR")] + [(n, "DOUBLE") for n in SUBBAND_FIELDS]
    return _values_sql(rows, cols)


def main() -> None:
    ids, texts = load_docs()
    oracles = {
        "thornton_scores_docs": gen_thornton(ids, texts),
        "subband_scores_docs": gen_subband(ids, texts),
        "minhash_lsh_pairs_docs": gen_minhash_pairs(ids, texts),
        "simhash_pairs_docs": gen_simhash_pairs(ids, texts),
        "vocab_tokenize_docs": gen_vocab_hash(ids, texts),
        "fingerprint_docs": gen_fingerprint(ids, texts),
    }
    with open(OUT, "w") as f:
        json.dump(oracles, f, indent=1)
    sizes = {k: len(v) for k, v in oracles.items()}
    print(f"wrote {OUT}: {sizes}")


if __name__ == "__main__":
    main()
