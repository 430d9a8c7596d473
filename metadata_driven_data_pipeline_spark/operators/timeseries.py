"""Time-series resampling: dense per-key time grids from sparse events.

Not in the reference (purely batch row pipeline, no time ops beyond
`to_date`); this is the standard gap-fill/resample shape analytics and
feature pipelines need over event streams: aggregate events to a
(key, bucket) grid, then densify so every key has a row for EVERY bucket
between its first and last activity, zero-filled where nothing happened.

Scale shape: one hash aggregate on (key, bucket), one tiny per-key bounds
aggregate, a `sequence` + `explode` that fans each key out to its own time
range (cost ∝ output rows, no shuffle beyond the join on (key, bucket)),
and a left join to place the observed values. The dense grid is generated,
never stored; skew follows the span of each key's activity, not data
volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_STEP_UNIT_SECONDS = {
    "second": 1,
    "minute": 60,
    "hour": 3600,
    "day": 86400,
    "week": 604800,
}


def step_seconds(step: str) -> int:
    """Parse a ``"<n> <unit>"`` step (``"15 minutes"``, ``"1 hour"``,
    ``"2 days"``) to seconds. Fixed-length units only — months/years vary
    in length and have no epoch-aligned grid."""
    parts = step.strip().lower().split()
    if len(parts) == 1:
        n, unit = 1, parts[0]
    elif len(parts) == 2:
        n, unit = int(parts[0]), parts[1]
    else:
        raise ValueError(f"unparseable step {step!r}; expected '<n> <unit>'")
    unit = unit.rstrip("s")
    if unit not in _STEP_UNIT_SECONDS:
        raise ValueError(
            f"unsupported step unit {unit!r}; "
            f"fixed-length units only: {sorted(_STEP_UNIT_SECONDS)}"
        )
    if n <= 0:
        raise ValueError(f"step must be positive, got {step!r}")
    return n * _STEP_UNIT_SECONDS[unit]


def gap_fill(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    step: str = "1 hour",
    agg: dict[str, F.Column] | None = None,
    max_buckets_per_key: int | None = 366 * 24,
) -> DataFrame:
    """Densify events into a contiguous per-key time grid.

    ``step`` is any fixed-length interval (``"15 minutes"``, ``"1 hour"``,
    ``"2 days"`` — see :func:`step_seconds`); buckets are epoch-aligned
    floors (``ts − epoch(ts) mod step``), which for whole-unit steps
    coincides with ``date_trunc``. ``agg`` maps output column name →
    aggregate expression evaluated per (key, bucket); defaults to
    ``{"n_events": count(*)}``. Missing buckets get 0 for counts/sums
    (``coalesce``). Returns ``(key_col, bucket_ts, *agg_cols)``.

    ``max_buckets_per_key`` bounds the generated grid: one key with a
    corrupt timestamp (epoch-0, ms-as-s) would otherwise explode into
    millions of rows. Keys whose span exceeds the cap keep ONLY their
    observed buckets (no fill) rather than failing the job — the
    degrade-don't-fail stance the reference takes for corrupt input.
    Pass ``None`` to disable. Default: 366·24 buckets (one year of hours).
    """
    if agg is None:
        agg = {"n_events": F.count(F.lit(1))}
    secs = step_seconds(step)
    ux = F.unix_timestamp(F.col(ts_col).cast("timestamp"))
    bucket = F.timestamp_seconds(ux - F.pmod(ux, F.lit(secs)))
    observed = (
        df.groupBy(F.col(key_col), bucket.alias("bucket_ts"))
        .agg(*[expr.alias(name) for name, expr in agg.items()])
    )
    bounds = df.groupBy(key_col).agg(
        F.min(bucket).alias("__lo"), F.max(bucket).alias("__hi")
    )
    if max_buckets_per_key is not None:
        span_ok = (
            F.unix_timestamp("__hi") - F.unix_timestamp("__lo")
        ) / secs < F.lit(max_buckets_per_key)
        bounds = bounds.withColumn(
            "__hi", F.when(span_ok, F.col("__hi")).otherwise(F.col("__lo"))
        ).withColumn("__capped", ~span_ok)
        # capped keys: grid collapses to the lone __lo bucket; their other
        # observed buckets are re-attached below so no data is lost
    grid = bounds.select(
        key_col,
        F.explode(
            F.sequence("__lo", "__hi", F.expr(f"interval {secs} second"))
        ).alias("bucket_ts"),
    )
    if max_buckets_per_key is not None:
        # union the observed buckets back in so capped keys lose fill, not data
        grid = grid.unionByName(
            observed.select(key_col, "bucket_ts")
        ).distinct()
    out = grid.join(observed, [key_col, "bucket_ts"], "left")
    return out.select(
        key_col,
        "bucket_ts",
        *[F.coalesce(F.col(n), F.lit(0)).alias(n) for n in agg],
    )
