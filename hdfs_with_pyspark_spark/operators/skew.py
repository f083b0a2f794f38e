"""Skew mitigation for hot join keys (SURVEY.md §7.4.3).

The reference's channel self-join (src/scripts/project_step_3.py:63-69,
121-126) is quadratic in channel size and melts one reducer when a channel
is hot. First line of defense is AQE skew-join splitting (on by default in
session.py); this module is the explicit fallback for when the skewed side
must ALSO avoid a single-task hash build — the classic salt-and-replicate
rewrite, kept deterministic (salt = hash of the row, never rand()) so
results are reproducible and oracle-checkable.

``salted_join(left, right, on, n_salts)`` ==
``left.join(right, on, "inner")`` for any inputs; the rewrite only changes
the physical key distribution:

  * left rows get ``salt = pmod(xxhash64(*all left cols), n_salts)``,
  * right rows are replicated once per salt value (an ``explode`` of a
    literal range — n_salts x |right| rows, the price of the rewrite),
  * the join runs on (key..., salt), spreading each hot key over
    ``n_salts`` reducers.

Use when: right side is too big to broadcast AND specific keys dominate.
Don't use when: AQE's split already balances (it usually does), or the
right side fits a broadcast (then there's no shuffle to skew).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_join(left: DataFrame, right: DataFrame, on: Sequence[str],
                n_salts: int = 16, how: str = "inner") -> DataFrame:
    """Inner/left equi-join with the hot-key salt-and-replicate rewrite."""
    assert how in ("inner", "left"), "salting only preserves inner/left semantics"
    salted_left = left.withColumn(
        SALT_COL, F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]),
                         F.lit(n_salts)))
    replicated_right = right.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))))
    return (salted_left
            .join(replicated_right, [*on, SALT_COL], how)
            .drop(SALT_COL))
