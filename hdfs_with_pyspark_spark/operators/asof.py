"""As-of join (nearest-earlier match) as a first-class operator.

Absent from the reference (SURVEY.md §2.3 "range/as-of joins absent") but
table stakes for a time-series-capable engine. The implementation is the
scalable union + last(ignorenulls) rewrite, NOT an inequality join:

  1. tag right rows 0, left rows 1; union on (key, t, tag),
  2. one shuffle: Window.partitionBy(key).orderBy(t, tag),
  3. last(right_payload, ignorenulls) over rows-unbounded-preceding —
     right rows sort before left rows at equal t, so the match is the
     latest right row with right_ts <= left_ts (inclusive),
  4. keep left rows, unpack payloads.

Cost at any scale: ONE shuffle of |left| + |right| rows and a per-key
sort-merge pass — no per-key fan-out, no theta-join blowup. The right
payload travels as a single struct so the matched columns always come
from the SAME right row (per-column last() could otherwise mix rows when
some right values are null).

Right rows must be unique per (key, ts) — pre-aggregate the right side
to make the pick well-defined (the haversine of as-of semantics: ties at
identical timestamps have no "latest"). The caller owns that contract;
``asof_join`` stays deterministic given it.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, on: Sequence[str],
              left_ts: str, right_ts: str,
              value_cols: Sequence[str]) -> DataFrame:
    """Left as-of join: for each left row, the latest right row with
    ``right_ts <= left_ts`` on the same key(s); NULL values when no
    earlier right row exists.

    Returns all left columns plus ``value_cols`` from the matched right
    row.
    """
    on = list(on)
    value_cols = list(value_cols)
    left_payload = [c for c in left.columns if c not in on]

    l_side = left.select(
        *on,
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__is_left"),
        F.struct(*left_payload).alias("__l"),
        F.lit(None).cast(
            right.select(F.struct(*value_cols).alias("s")).schema["s"].dataType
        ).alias("__r"),
    )
    r_side = right.select(
        *on,
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__is_left"),
        F.lit(None).cast(
            left.select(F.struct(*left_payload).alias("s")).schema["s"].dataType
        ).alias("__l"),
        F.struct(*value_cols).alias("__r"),
    )
    w = (Window.partitionBy(*on).orderBy("__t", "__is_left")
               .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    matched = (l_side.unionByName(r_side)
               .withColumn("__m", F.last("__r", ignorenulls=True).over(w))
               .where(F.col("__is_left") == 1))
    return matched.select(
        *on,
        *[F.col(f"__l.{c}").alias(c) for c in left_payload],
        *[F.col(f"__m.{c}").alias(c) for c in value_cols],
    )
