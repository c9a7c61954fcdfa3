from pulsarfeatureextractor_spark.functions.moments import (
    LYON_STRUCT,
    lyon_moments_udf,
    moments_rows,
    with_lyon_features,
)

__all__ = [
    "LYON_STRUCT",
    "lyon_moments_udf",
    "moments_rows",
    "with_lyon_features",
]
