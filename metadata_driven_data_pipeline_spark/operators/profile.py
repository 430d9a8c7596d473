"""Table profiling + snapshot drift — the data-quality observability
surface a production pipeline runs on every ingested batch.

Not in the reference (its only audit ops are row counts and the OK/KO
split, ``pipeline/validator.py:193-195``); this generalizes them to the
standard per-column profile (nulls, distincts, bounds) and a
profile-level drift report between two snapshots — what a 100 TB
ingestion monitors to catch upstream schema/content regressions before
they poison downstream training data (the corpus-level complement is
``token_kl_divergence``).

Scale shape: ``table_profile`` is ONE aggregate over the table — no
window, no join; the exact multi-column ``countDistinct`` lowers to
Catalyst's expand + single hash aggregate (k× the scan rows map-side,
one shuffle of partial states). ``profile_drift`` joins two k-row
profiles — driver-scale inputs, full-outer to catch added/dropped
columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def table_profile(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Per-column profile: ``(column, n_rows, n_nulls, n_distinct,
    min_value, max_value)`` with bounds rendered as strings so one schema
    covers every column type (casting, not formatting — deterministic and
    oracle-reproducible).

    All statistics are EXACT (countDistinct, not HLL) so two engines
    agree bit-for-bit; swap in ``approx_count_distinct`` at the 100 TB
    monitoring tier where a 2% sketch error is acceptable and the expand
    shuffle is not.
    """
    cols = columns or df.columns
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"columns not in DataFrame: {missing}")
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"__nulls_{c}"),
            F.countDistinct(F.col(c)).alias(f"__nd_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__mn_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__mx_{c}"),
        ]
    row = df.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("__n").alias("n_rows"),
                F.col(f"__nulls_{c}").alias("n_nulls"),
                F.col(f"__nd_{c}").alias("n_distinct"),
                F.col(f"__mn_{c}").alias("min_value"),
                F.col(f"__mx_{c}").alias("max_value"),
            )
            for c in cols
        ]
    )
    return row.select(F.explode(per_col).alias("p")).select("p.*")


def profile_drift(
    old_profile: DataFrame,
    new_profile: DataFrame,
    null_rate_tolerance: float = 0.01,
    distinct_ratio_tolerance: float = 0.5,
) -> DataFrame:
    """Compare two :func:`table_profile` outputs column-by-column.

    Returns one row per column present in either snapshot:
    ``(column, status, null_rate_old, null_rate_new, distinct_old,
    distinct_new, range_changed)`` where ``status`` is

    - ``column_added`` / ``column_removed``: present in only one snapshot;
    - ``null_rate_drift``: |null rate delta| > ``null_rate_tolerance``;
    - ``distinct_drift``: distinct count changed by more than
      ``distinct_ratio_tolerance`` (relative, against the old count);
    - ``ok`` otherwise. ``range_changed`` flags min/max movement
      independently (bounds moving is often benign growth, so it is a
      flag, not a status).

    Precedence: added/removed > null_rate_drift > distinct_drift > ok.
    """
    o = old_profile.select(
        F.col("column"),
        F.col("n_rows").alias("rows_old"),
        F.col("n_nulls").alias("nulls_old"),
        F.col("n_distinct").alias("distinct_old"),
        F.col("min_value").alias("min_old"),
        F.col("max_value").alias("max_old"),
    )
    n = new_profile.select(
        F.col("column"),
        F.col("n_rows").alias("rows_new"),
        F.col("n_nulls").alias("nulls_new"),
        F.col("n_distinct").alias("distinct_new"),
        F.col("min_value").alias("min_new"),
        F.col("max_value").alias("max_new"),
    )
    j = o.join(n, "column", "full_outer")
    nr_old = F.when(
        F.col("rows_old") > 0, F.col("nulls_old") / F.col("rows_old")
    ).otherwise(F.lit(0.0))
    nr_new = F.when(
        F.col("rows_new") > 0, F.col("nulls_new") / F.col("rows_new")
    ).otherwise(F.lit(0.0))
    distinct_rel = F.abs(
        F.col("distinct_new") - F.col("distinct_old")
    ) / F.greatest(F.col("distinct_old"), F.lit(1))
    status = (
        F.when(F.col("rows_old").isNull(), F.lit("column_added"))
        .when(F.col("rows_new").isNull(), F.lit("column_removed"))
        .when(
            F.abs(nr_new - nr_old) > null_rate_tolerance,
            F.lit("null_rate_drift"),
        )
        .when(
            distinct_rel > distinct_ratio_tolerance, F.lit("distinct_drift")
        )
        .otherwise(F.lit("ok"))
    )
    range_changed = F.coalesce(
        (F.col("min_old") != F.col("min_new"))
        | (F.col("max_old") != F.col("max_new")),
        F.lit(True),
    )
    return j.select(
        "column",
        status.alias("status"),
        F.round(nr_old, 6).alias("null_rate_old"),
        F.round(nr_new, 6).alias("null_rate_new"),
        "distinct_old",
        "distinct_new",
        range_changed.alias("range_changed"),
    )
