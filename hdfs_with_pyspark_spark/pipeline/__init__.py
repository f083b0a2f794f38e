"""Orchestration: a minimal in-process DAG runner for Spark job chains."""

from hdfs_with_pyspark_spark.pipeline.dag import DAG, Task, TaskReport, TaskState

__all__ = ["DAG", "Task", "TaskReport", "TaskState"]
