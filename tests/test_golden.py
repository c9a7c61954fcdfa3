"""Frozen golden features (FIXTURES.md A3).

``tests/golden_features.json`` freezes the Lyon moments of the seed-42
synthetic table at 1000 rows, generated ONCE from the pure-numpy oracle
(tests/oracle.py) and committed.  Both the oracle and the engine are
checked against it — a regression in either implementation (or a silent
convention drift) breaks this test even if the two still agree with
each other.  Regenerate (only after an intentional convention change):

    python tests/test_golden.py --regenerate
"""

import json
import os

import numpy as np
import pytest

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "golden_features.json")
N_ROWS = 1000


def _golden_input():
    from pulsarfeatureextractor_spark.sources.tokenized import _sequences_pdf

    return _sequences_pdf(N_ROWS, seed=42)


def _oracle_rows(pdf):
    from oracle import lyon_moments_oracle

    out = []
    for i, row in pdf.iterrows():
        m = lyon_moments_oracle(np.asarray(row["tokens"]))
        out.append({"i": int(i), "doc_id": row["doc_id"],
                    "mean": m[0], "stdev": m[1], "skew": m[2], "kurt": m[3]})
    return out


def test_golden_exists_and_oracle_matches():
    assert os.path.exists(GOLDEN_PATH), "golden fixture missing — regenerate"
    golden = json.load(open(GOLDEN_PATH))
    assert len(golden) == N_ROWS
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    fresh = _oracle_rows(_golden_input())
    for g, f in zip(golden, fresh):
        assert g["doc_id"] == f["doc_id"]
        for k in ("mean", "stdev", "skew", "kurt"):
            assert np.isclose(g[k], f[k], rtol=1e-9, atol=1e-12), (g["i"], k)


@pytest.mark.spark
def test_engine_matches_golden(spark):
    from pulsarfeatureextractor_spark.functions.moments import with_lyon_features
    from pulsarfeatureextractor_spark.sources.tokenized import synthetic_sequences

    golden = json.load(open(GOLDEN_PATH))
    df = synthetic_sequences(spark, N_ROWS, seed=42)
    got = with_lyon_features(df).select(
        "doc_id", "mean", "stdev", "skew", "kurt"
    ).toPandas()
    # doc_ids repeat; compare multisets of rounded feature tuples per doc
    def keyed(rows):
        out = {}
        for r in rows:
            out.setdefault(r["doc_id"], []).append(
                tuple(round(float(r[k]), 9) for k in ("mean", "stdev", "skew", "kurt"))
            )
        return {k: sorted(v) for k, v in out.items()}

    gk = keyed(golden)
    ek = keyed(got.to_dict("records"))
    assert set(gk) == set(ek)
    for doc in gk:
        assert len(gk[doc]) == len(ek[doc])
        for a, b in zip(gk[doc], ek[doc]):
            assert np.allclose(a, b, rtol=1e-9, atol=1e-9), doc


if __name__ == "__main__":
    import sys

    if "--regenerate" in sys.argv:
        sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        sys.path.insert(0, os.path.dirname(__file__))
        rows = _oracle_rows(_golden_input())
        with open(GOLDEN_PATH, "w") as f:
            json.dump(rows, f)
        print(f"wrote {GOLDEN_PATH} ({len(rows)} rows)")
