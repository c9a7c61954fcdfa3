"""pulsarfeatureextractor_spark — a from-scratch PySpark-native
point-in-time feature-engineering engine with the query and
data-processing capabilities of scienceguyrob/PulsarFeatureExtractor.

NOT a port: the reference is a single-process, per-candidate-file
statistical feature extractor (Lyon et al. 2016 profile/DM-curve
moments; Thornton 2013 candidate scores).  This engine recasts that
pipeline as a distributed, leakage-free point-in-time feature store
over tables of pre-tokenized candidate sequences
(doc_id, tokens:array<int32>, n_tok, source), per BASELINE.json.

Provenance note: /root/reference was mounted EMPTY this session
(SURVEY.md §0); correctness is pinned to BASELINE.json's named
contract (Lyon moments, exact token equality, zero temporal leakage)
and the published formulas, via the pure-numpy oracle in
tests/oracle.py.
"""

from pulsarfeatureextractor_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
