"""Frozen pure-Python reference extractor (the "pretrained backbone").

This package has NO Spark dependency.  It defines the exact extraction
semantics; the distributed pipeline (batukh_spark.kernels) imports these
functions and applies them over Arrow batches, so Spark output matches the
oracle byte-for-byte per turn by construction — mirroring how the reference
freezes a pretrained encoder and trains only the head against it
(/root/reference/batukh/torch/utils/models/segmentation_model.py:225-233).

All scoring constants live in `constants.py` and are FROZEN: changing them
invalidates the committed golden fixtures.
"""

from batukh_spark.oracle.extract import extract, ExtractResult, detect_family
from batukh_spark.oracle.canonical import canonicalize

__all__ = ["extract", "ExtractResult", "detect_family", "canonicalize"]
