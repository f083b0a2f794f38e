"""Query registry: name -> (Spark callable, DuckDB oracle SQL).

Contract (driver, /root/repo/__spark_entry__.py docstring):
  * the callable takes (spark, sf_dir) and returns a DataFrame,
  * the oracle is ANSI SQL DuckDB runs on the same parquet tables,
  * column names must match exactly (the comparator sorts columns by name),
  * float results are rounded in BOTH plans so parallel-vs-serial
    summation order can't flip the value hash.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, SparkQuery] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable[[SparkQuery], SparkQuery]:
    """Decorator: add a named query (and optionally its oracle SQL)."""
    def deco(fn: SparkQuery) -> SparkQuery:
        assert name not in QUERIES, f"duplicate query name {name!r}"
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn
    return deco


def ensure_session(spark: SparkSession) -> SparkSession:
    """Pin the runtime confs correctness depends on, whatever session the
    caller hands us (the driver builds its own SparkSession).

    All three are runtime-settable SQL confs.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.parallelismFirst",
                   "false")
    return spark


def _load_all() -> None:
    """Import every query module so registration side-effects run."""
    from hdfs_with_pyspark_spark.plans import (  # noqa: F401
        relational,
        geo_marts,
        temporal,
    )
    from hdfs_with_pyspark_spark.llm import (  # noqa: F401
        queries as llm_queries,
    )
    from hdfs_with_pyspark_spark.streaming import (  # noqa: F401
        ops as streaming_ops,
    )


_load_all()
