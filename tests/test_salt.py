from __future__ import annotations

import numpy as np
import pandas as pd

from pulsarfeatureextractor_spark.operators.salt import salted_join
from pulsarfeatureextractor_spark.sources.tokenized import synthetic_sequences


def _canon(pdf, cols):
    return pdf[cols].sort_values(cols, kind="mergesort").reset_index(drop=True)


def test_salted_equals_unsalted_on_skew(spark):
    """Skew fixture: one doc_id owns ~50% of rows; salted join must
    produce exactly the unsalted result (FIXTURES.md operator map)."""
    big = synthetic_sequences(spark, n_rows=2000, seed=42, skew=True).select(
        "doc_id", "n_tok", "source"
    )
    dim_pdf = pd.DataFrame({
        "doc_id": ["cand_hot"] + [f"cand_{i:08d}" for i in range(200)],
        "label": np.arange(201) % 2,
    })
    dim = spark.createDataFrame(dim_pdf)

    cols = ["doc_id", "n_tok", "source", "label"]
    for how in ("inner", "left"):
        want = big.join(dim, "doc_id", how).toPandas()
        got = salted_join(big, dim, "doc_id", k=8, how=how).toPandas()
        pd.testing.assert_frame_equal(
            _canon(got, cols), _canon(want, cols), check_dtype=False
        )


def test_salt_does_not_leak_into_schema(spark):
    big = synthetic_sequences(spark, n_rows=100, seed=1).select("doc_id", "source")
    dim = spark.createDataFrame(pd.DataFrame({"doc_id": ["cand_00000001"], "x": [1]}))
    out = salted_join(big, dim, "doc_id", k=4)
    assert not any(c.startswith("__") for c in out.columns)
