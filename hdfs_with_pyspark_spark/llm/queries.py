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
from hdfs_with_pyspark_spark.plans.registry import ORACLES as _ORACLES

# Cross-module composed oracle: corpus_pipeline_funnel chains the
# quality-filter (text), decontamination + dedup (dedup) oracle SQLs, so
# it can only be assembled after every llm module has registered.
_ORACLES["corpus_pipeline_funnel"] = dedup._funnel_oracle()
