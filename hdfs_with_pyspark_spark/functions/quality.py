"""In-flight data-quality metrics via Spark's Observation API.

The 100 TB pattern: quality counters (row counts, null counts, domain
violations) computed DURING a job's existing pass — `df.observe` attaches
aggregates to the plan and the listener collects them when the action
completes. Zero extra scans, zero extra shuffles; the alternative
(separate validation queries) doubles the I/O bill.

Usage:
    df, obs = observe_quality(df, null_cols=["lat"], domain={"value": (0, 1e9)})
    df.write.parquet(out)             # the real action
    stats = obs.get                   # {'n_rows': ..., 'n_null_lat': ..., ...}
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def observe_quality(df: DataFrame,
                    null_cols: list[str] | None = None,
                    domain: dict[str, tuple[float, float]] | None = None,
                    ) -> tuple[DataFrame, Observation]:
    """Attach row-count / null-count / domain-violation counters to ``df``.

    Returns the instrumented frame and the Observation; read ``obs.get``
    AFTER an action has materialized the frame. Counters are plain
    aggregates — map-side partial, merged by the listener, no extra job.
    """
    metrics = [F.count(F.lit(1)).alias("n_rows")]
    for c in null_cols or []:
        metrics.append(
            F.sum(F.col(c).isNull().cast("long")).alias(f"n_null_{c}"))
    for c, (lo, hi) in (domain or {}).items():
        metrics.append(
            F.sum(((F.col(c) < lo) | (F.col(c) > hi)).cast("long"))
             .alias(f"n_out_of_range_{c}"))
    obs = Observation()
    return df.observe(obs, *metrics), obs
