from pulsarfeatureextractor_spark.sources.readers import TESTDATA_SCHEMAS, load_table
from pulsarfeatureextractor_spark.sources.tokenized import (
    SEQUENCES_SCHEMA,
    documents_to_sequences,
    synthetic_sequences,
    with_event_time,
)

__all__ = [
    "TESTDATA_SCHEMAS",
    "load_table",
    "SEQUENCES_SCHEMA",
    "documents_to_sequences",
    "synthetic_sequences",
    "with_event_time",
]
