"""Operator surface of the engine.

- ``validate``: rule-based row validation with OK/KO routing (SURVEY §2.2 P2-P8)
- ``add_fields``: computed-column extension (P1)
- ``consolidate``: window-function dedup / consolidation (W1, U1, §2.8)
- ``relational``: generalized filter/project/join/aggregate/window/sort/set-ops
- ``dedup``: exact + fuzzy document dedup (MinHash-LSH, SimHash, n-gram Jaccard,
  embedding-cosine) — LLM-pipeline extension surface
- ``similarity``: ANN / top-k cosine search over embedding columns
- ``text``: language-ID, quality scoring, token counts, fingerprinting
- ``multimodal``: binary-column decode/feature plumbing (decode stubbed)
"""

from metadata_driven_data_pipeline_spark.operators.validate import (
    ValidationResult,
    annotate_errors,
    split_ok_ko,
)
from metadata_driven_data_pipeline_spark.operators.add_fields import apply_add_fields
from metadata_driven_data_pipeline_spark.operators.consolidate import dedup_keep_latest

__all__ = [
    "ValidationResult",
    "annotate_errors",
    "split_ok_ko",
    "apply_add_fields",
    "dedup_keep_latest",
]
