"""User-pair relation helpers (SURVEY.md §2.7 U1, §2.2 P8).

The reference canonicalizes symmetric pairs by unioning the swapped edge
list and filtering ``u > v`` (src/scripts/project_step_3.py:76-80). The
standard ``greatest``/``least`` projection gets the same relation with no
union and no second pass over the data — half the rows ever materialized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def canonicalize_pair(df: DataFrame, left: str, right: str,
                      out_left: str = "user_left",
                      out_right: str = "user_right") -> DataFrame:
    """Orient each undirected pair as (max, min), drop self-pairs.

    Matches the reference's ``u > v`` orientation (project_step_3.py:80)
    without the union-swap shuffle.
    """
    other = [c for c in df.columns if c not in (left, right)]
    return (df.select(
                F.greatest(F.col(left), F.col(right)).alias(out_left),
                F.least(F.col(left), F.col(right)).alias(out_right),
                *other)
              .where(F.col(out_left) != F.col(out_right)))


def symmetrize_pairs(df: DataFrame, left: str, right: str) -> DataFrame:
    """Both orientations of each edge (reference project_step_3.py:76-79
    unionByName idiom) — for consumers that need a directed view."""
    swapped = df.select(*[
        F.col(right).alias(left) if c == left
        else F.col(left).alias(right) if c == right
        else F.col(c)
        for c in df.columns
    ])
    return df.unionByName(swapped)
