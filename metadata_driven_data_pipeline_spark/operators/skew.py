"""Skew-mitigation helpers (SURVEY §7.4 / 100 TB design notes).

AQE's skew-join splitting (``spark.sql.adaptive.skewJoin``) handles most
skew automatically; these helpers cover the two cases it can't:

- a *broadcast-ineligible* join against a hot key set (``salted_join``):
  the left side gets a deterministic salt, the right side is replicated
  once per salt value, and the join key becomes (key, salt) — the hot
  key's rows spread over ``n_salts`` tasks;
- a *keyed reduction* whose per-key groups dwarf a task
  (``two_phase_dedup_keep_latest``): reduce within (key, salt) first, then
  across salts — each phase's groups are 1/n_salts the size.

Measured caveat (BASELINE.md round-4 skew probe): for the keep-latest
shape specifically, Spark ≥3.5 plants a PARTIAL ``WindowGroupLimit``
before the shuffle (``rn = 1`` after ``row_number`` → top-1 per key per
map partition), so the plain ``dedup_keep_latest`` plan is ALREADY
skew-immune — at 87% single-key skew the plain window beat the two-phase
variant 2.8× (the salting pays an extra full shuffle for nothing). Use
``two_phase_*`` only on engines without WindowGroupLimit or for keyed
reductions that cannot partial-aggregate (full-sort windows, exact
medians); ``salted_join`` remains the win for broadcast-ineligible hot-key
joins (measured 1.33× vs skew-blind at the same skew, vs AQE's 1.06×).

Salts are content-derived (``xxhash64`` of the row's columns), not random:
results stay deterministic and re-runs produce identical partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from metadata_driven_data_pipeline_spark.operators.consolidate import dedup_keep_latest


def with_salt(df: DataFrame, n_salts: int, salt_col: str = "__salt") -> DataFrame:
    """Deterministic salt in [0, n_salts) from the full row content."""
    return df.withColumn(
        salt_col, F.pmod(F.xxhash64(*df.columns), F.lit(n_salts)).cast("int")
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the left side salted and the (small, but not
    broadcastable) right side replicated ``n_salts`` times, so a hot join
    key spreads over ``n_salts`` tasks instead of one straggler.

    Same semantics as ``left.join(right, on, how)`` for the supported join
    types (inner / left semi / left anti / left outer).
    """
    lt = with_salt(left, n_salts)
    rt = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = lt.join(rt, on + ["__salt"], how)
    return out.drop("__salt")


def two_phase_dedup_keep_latest(
    df: DataFrame,
    key_columns: list[str] | str,
    order_by: list[str] | str,
    order_direction: str = "DESC",
    n_salts: int = 8,
) -> DataFrame:
    """Keep-latest dedup (W1) in two phases for skewed keys: phase 1 picks
    the winner within (key, salt), phase 2 across the ≤ ``n_salts``
    survivors per key. Equivalent to ``dedup_keep_latest`` whenever
    ``order_by`` is a total order within each key group."""
    keys = [key_columns] if isinstance(key_columns, str) else list(key_columns)
    ob = [order_by] if isinstance(order_by, str) else list(order_by)
    salted = with_salt(df, n_salts)
    phase1 = dedup_keep_latest(salted, keys + ["__salt"], ob, order_direction)
    return dedup_keep_latest(phase1, keys, ob, order_direction).drop("__salt")
