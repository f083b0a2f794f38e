"""Aggregates the LLM data-pipeline query modules for the registry.

Importing this module (registry._load_all) triggers every @register
side-effect in the llm/ package.
"""

from hdfs_with_pyspark_spark.llm import (  # noqa: F401
    bpe,
    dedup,
    multimodal,
    similarity,
    text,
)
