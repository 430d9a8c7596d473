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
    micro_units: bool = False,
) -> DataFrame:
    """Per-key running (count, sum) maintained as explicit group state and
    re-emitted every micro-batch — the minimal custom stateful op: unlike a
    windowed agg, state never closes; unlike ``outputMode("complete")``,
    only keys seen in the current micro-batch are re-emitted, so output is
    proportional to activity, not cardinality.

    Output rows: (key, n_events, total_value) — the totals over *all*
    micro-batches so far for that key.

    ``micro_units=True`` accumulates each value as an integer count of
    1e-6 units (HALF_UP, matching a DECIMAL(18,6) cast) instead of a
    float sum. Integer addition is exactly commutative, so the total is
    independent of batch/row order — required when the output must
    hash-match an exact-decimal SQL oracle. The float path is fine for
    monitoring-style totals.

    Exactness bound: the state slot is a double, which round-trips
    integers only below 2^53 micro-units (~9.0e9 in value units per key).
    Exceeding it would silently break the order-independence guarantee the
    mode exists for, so the update function RAISES ``OverflowError``
    (failing the streaming query loudly) instead of losing exactness;
    re-key or pre-aggregate upstream if a single key can legitimately
    accumulate past the bound.
    """
    import math

    _MAX_EXACT = 1 << 53  # doubles round-trip integers only below 2^53

    def _micros(x: float) -> int:
        return int(math.copysign(math.floor(abs(x) * 1e6 + 0.5), x))

    def update(
        key: tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        if state.exists:
            n, total = state.get
            # state schema stores total as double; micro counts < 2^53
            # round-trip exactly, so int() restores exact integer arithmetic
            if micro_units:
                total = int(total)
        else:
            n, total = 0, (0 if micro_units else 0.0)
        for pdf in pdfs:
            n += len(pdf)
            vals = pdf[value_col].fillna(0.0)
            if micro_units:
                total += int(sum(_micros(float(v)) for v in vals))
            else:
                total += float(vals.sum())
        if micro_units:
            if abs(total) >= _MAX_EXACT:
                raise OverflowError(
                    f"micro_units running total for key {key!r} reached "
                    f"{total} micro-units (>= 2^53): the double-typed state "
                    "slot can no longer store it exactly, which would "
                    "silently void the order-independence guarantee. "
                    "Re-key or pre-aggregate upstream."
                )
            state.update((int(n), int(total)))
            out_total = round(total / 1e6, 6)
        else:
            state.update((int(n), float(total)))
            out_total = total
        yield pd.DataFrame(
            {key_col: [key[0]], "n_events": [n], "total_value": [out_total]}
        )

    return events.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=f"{key_col} long, n_events long, total_value double",
        stateStructType="n long, total double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
