"""Table-maintenance operators: MERGE-style upsert and SCD type 2.

The reference pipeline only ever overwrites whole tables
(src/scripts/project_step_1.py:140 ``mode("overwrite")``); a production
mart needs in-place maintenance. Parquet has no transactional MERGE, so
these operators express the merge as a plain full-outer join the caller
then writes back (atomically via a staging path + rename, or through a
table format like Iceberg/Delta when available — the JOIN SHAPE is the
same either way; only the commit protocol differs).

Scale notes: an upsert is ONE shuffle of each side on the merge key —
the minimum possible. If the target is bucketed on the key
(sources/io bucketed writes), the target side's shuffle disappears and
only the (much smaller) update batch moves. Update batches are usually
tiny relative to the dimension: Spark broadcasts them automatically
under the AQE threshold, turning the merge into a map-side operation
over the target.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _check_unique_key(batch: DataFrame, key: str, op: str) -> None:
    """Enforce the at-most-one-row-per-key MERGE precondition eagerly.

    One groupBy on the (typically tiny) batch — cheap relative to the
    merge itself. Raises with sample offenders, mirroring ANSI MERGE's
    error-on-multiple-matches instead of fanning out silently.
    """
    dups = (batch.groupBy(key).count()
                 .where(F.col("count") > 1)
                 .limit(5).collect())
    if dups:
        sample = ", ".join(str(r[key]) for r in dups)
        raise ValueError(
            f"{op}: batch has multiple rows per key (e.g. {key} in "
            f"[{sample}]); deduplicate latest-per-key first "
            "(operators.windows.top1_per_key)")


def merge_upsert(target: DataFrame, source: DataFrame, key: str,
                 validate: bool = False) -> DataFrame:
    """SCD type 1 merge: source rows replace same-key target rows
    column-for-column (including legitimate NULLs — row presence, not
    per-column COALESCE, decides precedence); unmatched source rows
    insert; unmatched target rows carry over.

    Returns the merged frame with an ``updated`` flag (true where the
    source provided the row). Columns = target's columns; the source
    must provide the same set.

    PRECONDITION (same as ANSI MERGE, which errors on violation): at
    most one source row per key. A duplicate-key source fans out the
    full-outer join and yields duplicate merged rows — deduplicate the
    batch first (e.g. latest-per-key via operators.windows.top1_per_key)
    rather than letting this operator pick a winner silently.
    ``validate=True`` enforces it eagerly (one count job on the batch,
    error with sample keys) — the cheap belt for untrusted batches.
    """
    assert set(source.columns) == set(target.columns), \
        "source/target column sets must match"
    if validate:
        _check_unique_key(source, key, "merge_upsert")
    attrs = [c for c in target.columns if c != key]
    t = target.select(F.col(key).alias("__tk"),
                      *[F.col(c).alias(f"__t_{c}") for c in attrs])
    s = source.select(F.col(key).alias("__sk"),
                      *[F.col(c).alias(f"__s_{c}") for c in attrs])
    j = t.join(s, t["__tk"] == s["__sk"], "full_outer")
    present = F.col("__sk").isNotNull()
    return j.select(
        F.coalesce(F.col("__sk"), F.col("__tk")).alias(key),
        *[F.when(present, F.col(f"__s_{c}")).otherwise(F.col(f"__t_{c}"))
           .alias(c) for c in attrs],
        present.alias("updated"))


def scd2_apply(dim: DataFrame, updates: DataFrame, key: str,
               version_col: str = "version",
               current_col: str = "is_current",
               validate: bool = False) -> DataFrame:
    """SCD type 2: updated keys close their current version (flag flips)
    and append a new version = max(version)+1 row; history rows pass
    through untouched; brand-new keys insert at version 1.

    ``dim`` carries (key, attrs..., version, is_current); ``updates``
    carries (key, attrs...). One window over the key (per-key max
    version) + one left-semi-style join — two shuffles on the key total,
    both AQE-broadcastable when the batch is small.

    PRECONDITION: at most one updates row per key (as with ANSI MERGE).
    Duplicate keys would mint multiple rows at the same new version all
    flagged current, breaking the one-current-row invariant —
    deduplicate the batch (latest-per-key) before applying.
    ``validate=True`` enforces it eagerly (one count job on the batch).
    """
    if validate:
        _check_unique_key(updates, key, "scd2_apply")
    attrs = [c for c in updates.columns if c != key]
    upd_keys = updates.select(key).distinct()

    # Existing rows: flip is_current off where a newer version arrives.
    hit = dim.join(upd_keys.withColumn("__upd", F.lit(True)), key, "left")
    closed = hit.select(
        key, *attrs, version_col,
        (F.col(current_col) & F.col("__upd").isNull()).alias(current_col))

    # New versions: per-key max version + 1, or 1 for brand-new keys.
    base = (dim.select(key, F.col(version_col))
               .groupBy(key).agg(F.max(version_col).alias("__vmax")))
    fresh = (updates.join(base, key, "left")
             .select(key, *attrs,
                     (F.coalesce(F.col("__vmax"), F.lit(0)) + 1)
                      .cast("long").alias(version_col),
                     F.lit(True).alias(current_col)))
    return closed.unionByName(fresh)
