"""Python UDAF / UDTF surface (SURVEY §2.10).

The reference registers no UDFs of any kind; the rebuilt engine's stance is
JVM-side built-ins everywhere (see every operator module), with the Python
lane reserved for logic Spark genuinely cannot express. This module
demonstrates that lane end-to-end so each API has a tested, idiomatic
template:

- ``centroid_udaf`` — Arrow-batched GROUPED_AGG pandas UDF (a "UDAF"):
  per-group embedding centroid via one numpy reduction per batch. The
  exact-decimal alternative (order-independent, oracle-able) is
  ``operators.clustering.kmeans_update``; use this form when float means
  are acceptable and the group payload is vectors.
- ``TopTokens`` — a Python UDTF (table function, Spark 4): one input row →
  many output rows with imperative per-row logic. The declarative
  equivalent (explode → groupBy) is preferred in pipelines; the UDTF form
  exists for logic with per-row state that doesn't decompose into
  built-ins.

Both are Arrow-transported; neither belongs in a hot path that a built-in
can express (10-100× slower than codegen).
"""

from __future__ import annotations

import collections

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udtf


@pandas_udf("array<double>")
def centroid_udaf(vectors: pd.Series) -> list:
    """GROUPED_AGG pandas UDF: mean vector of a group of embeddings.
    numpy reduces each Arrow batch; Spark merges per-group partials."""
    import numpy as np

    if len(vectors) == 0:
        return []
    mat = np.stack(vectors.to_numpy())
    return np.mean(mat, axis=0).tolist()


@udtf(returnType="token string, n int")
class TopTokens:
    """Python UDTF: emit the k most frequent whitespace tokens of a text,
    ties broken lexicographically — one input row fans out to ≤ k rows."""

    def eval(self, text: str, k: int):
        if not text:
            return
        counts = collections.Counter(text.split())
        top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        for token, n in top:
            yield token, n
