"""Custom stateful streaming operators (``applyInPandasWithState``).

SURVEY §2.9: the reference is batch-only; this is the extension surface for
operators whose semantics built-in streaming aggregations can't express —
arbitrary per-key state evolved across micro-batches. State lives in the
checkpoint (RocksDB/HDFS state store at scale); batches arrive as Arrow
record batches, so the Python crossing is vectorized.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def running_totals(
    events: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Per-key running (count, sum) maintained as explicit group state and
    re-emitted every micro-batch — the minimal custom stateful op: unlike a
    windowed agg, state never closes; unlike ``outputMode("complete")``,
    only keys seen in the current micro-batch are re-emitted, so output is
    proportional to activity, not cardinality.

    Output rows: (key, n_events, total_value) — the totals over *all*
    micro-batches so far for that key.
    """

    def update(
        key: tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        if state.exists:
            n, total = state.get
        else:
            n, total = 0, 0.0
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf[value_col].fillna(0.0).sum())
        state.update((int(n), float(total)))
        yield pd.DataFrame(
            {key_col: [key[0]], "n_events": [n], "total_value": [total]}
        )

    return events.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=f"{key_col} long, n_events long, total_value double",
        stateStructType="n long, total double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
