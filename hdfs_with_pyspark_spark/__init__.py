"""hdfs_with_pyspark_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the reference repo DimitryShR/HDFS-with-pyspark (a
geo-analytics pipeline over a messenger event log: user mart, zone mart,
friend-recommendation mart), extended with the operators a large-scale
LLM-training-data pipeline needs (dedup, similarity search, text analysis,
multimodal plumbing) and a Structured Streaming ingestion path.

Design principles (SURVEY.md §7):
  * DataFrame / SQL only — no RDDs, no row-at-a-time Python UDFs in hot paths.
  * The extension surface is *expression-builder functions* (pure functions
    Column -> Column / DataFrame -> DataFrame) that execute fully inside
    Catalyst/Tungsten, mirroring the reference's one good idiom
    (reference: src/scripts/common_func.py:4-25).
  * Explicit schemas on every source; no parquet-footer inference at scale.
  * Deterministic semantics everywhere the reference was nondeterministic
    (ties in argmin windows, `first()` after shuffle, `collect_list` order).
  * Every operator designed for 1000-executor / 100 TB execution: broadcast
    small dims, pre-aggregate before expensive joins, AQE + skew handling,
    grid-bucketed spatial join as the scale path for nearest-neighbor.
"""

__version__ = "0.1.0"
