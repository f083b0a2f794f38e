"""Named query plans: the engine's public query surface.

Every operator from SURVEY.md §2 is exposed as a named query over the
driver testdata, registered with a DuckDB-oracle SQL twin. The registry
feeds ``__spark_entry__.queries()`` / ``oracle_sql()``.
"""

from hdfs_with_pyspark_spark.plans.registry import QUERIES, ORACLES, register

__all__ = ["QUERIES", "ORACLES", "register"]
