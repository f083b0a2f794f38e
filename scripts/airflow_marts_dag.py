"""Cluster orchestration spec for the mart batch.

The reference ships an Airflow DAG of three SparkSubmitOperators on YARN
(reference: src/dags/project_dag.py:29-67, chaining
project_step_1 >> project_step_2 >> project_step_3). This module is that
artifact for this engine, in three layers so it works both on a real
Airflow deployment and in an airflow-less sandbox:

1. ``MART_TASKS`` — the pure-data spec: one spark-submit application per
   mart (task_id, application path, application_args, spark conf, deps).
   The reference chains its steps purely as an orchestration convention —
   no step reads another's output (SURVEY.md §3) — so the spec declares
   the marts dependency-FREE and lets the scheduler overlap them; set
   ``CHAIN_LIKE_REFERENCE = True`` to reproduce the reference's serial
   step_1 >> step_2 >> step_3 shape exactly.
2. ``build_airflow_dag()`` — materializes the spec as an Airflow DAG of
   SparkSubmitOperators (import-guarded: the sandbox has no airflow; on a
   deployment, drop this file in the dags folder and it registers
   itself, exactly like the reference's project_dag.py).
3. ``build_process_dag()`` — materializes the same spec on the repo's
   in-process runner (pipeline/dag.py): each task shells out to
   spark-submit, giving retries + failure isolation without Airflow.
   ``python scripts/airflow_marts_dag.py`` runs this path.

All three layers consume the one spec, so the wiring Airflow would see
is the wiring the sandbox smoke test proves.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.dirname(_HERE)
sys.path.insert(0, _REPO)

RUN_MARTS = os.path.join(_HERE, "run_marts.py")

#: Reproduce the reference's serial step chain (orchestration convention
#: only) instead of the dependency-true parallel schedule.
CHAIN_LIKE_REFERENCE = False

#: Per-job Spark conf. The reference pushes maxResultSize=20g to paper
#: over driver-side collects (project_dag.py:36); this engine has no
#: hot-path collects, so the conf budget goes to AQE instead (already the
#: session default — nothing to override here). Sizing stays with the
#: deployment: pass executor cores/memory via spark-submit args below.
SPARK_CONF: dict[str, str] = {}

# One spark-submit application per mart. ``args_template`` placeholders
# are filled from the environment by expand_args (paths differ per
# deployment; the reference hardcodes its HDFS paths in the DAG file —
# here they come from $MARTS_EVENTS/$MARTS_CITIES/$MARTS_OUT/$MARTS_DATE,
# empty meaning "self-contained demo fixture").
MART_TASKS: list[dict] = [
    {"task_id": "user_mart", "application": RUN_MARTS,
     "mart": "user", "deps": []},
    {"task_id": "zone_mart", "application": RUN_MARTS,
     "mart": "zone", "deps": []},
    {"task_id": "friend_recommendations", "application": RUN_MARTS,
     "mart": "friends", "deps": []},
]
if CHAIN_LIKE_REFERENCE:
    for prev, cur in zip(MART_TASKS, MART_TASKS[1:]):
        cur["deps"] = [prev["task_id"]]


def expand_args(task: dict) -> list[str]:
    """spark-submit application_args for one mart task."""
    args = ["--mart", task["mart"]]
    for flag, env in (("--events", "MARTS_EVENTS"), ("--cities", "MARTS_CITIES"),
                      ("--out", "MARTS_OUT"), ("--date", "MARTS_DATE")):
        val = os.environ.get(env)
        if val:
            args += [flag, val]
    return args


def build_airflow_dag():
    """Airflow deployment path: the spec as a DAG of SparkSubmitOperators
    (mirror of reference project_dag.py:29-67)."""
    from datetime import datetime

    from airflow import DAG
    from airflow.providers.apache.spark.operators.spark_submit import (
        SparkSubmitOperator,
    )

    dag = DAG(dag_id="hdfs_with_pyspark_spark_marts",
              default_args={"owner": "airflow",
                            "start_date": datetime(2024, 1, 1)},
              schedule_interval=None)
    ops = {}
    for t in MART_TASKS:
        ops[t["task_id"]] = SparkSubmitOperator(
            task_id=t["task_id"], dag=dag,
            application=t["application"],
            application_args=expand_args(t),
            conf=dict(SPARK_CONF))
    for t in MART_TASKS:
        for dep in t["deps"]:
            ops[dep] >> ops[t["task_id"]]
    return dag


# Register with Airflow's module scan iff airflow exists (a dags-folder
# deployment imports this file; the sandbox import must not require it).
try:  # pragma: no cover - exercised only on an Airflow deployment
    import airflow  # noqa: F401
    dag = build_airflow_dag()
except ImportError:
    dag = None


def _submit_cmd(task: dict) -> list[str]:
    submit = shutil.which("spark-submit")
    if submit:
        return [submit, "--master",
                os.environ.get("MARTS_MASTER", "local[8]"),
                task["application"], *expand_args(task)]
    # spark-submit missing (bare venv): same application, plain python —
    # run_marts.py builds its own local session in that case.
    return [sys.executable, task["application"], *expand_args(task)]


def build_process_dag(runner=None):
    """Sandbox/cron path: the same spec on pipeline/dag.py, one
    spark-submit subprocess per task. ``runner`` is injectable so tests
    can verify the graph wiring without launching JVMs.
    """
    from hdfs_with_pyspark_spark.pipeline import DAG, Task

    def default_runner(task: dict) -> None:
        subprocess.run(_submit_cmd(task), check=True)

    run = runner or default_runner
    dag = DAG("marts_submit")
    for t in MART_TASKS:
        dag.add(Task(t["task_id"],
                     (lambda t=t: run(t)),
                     deps=tuple(t["deps"]),
                     retries=1))
    return dag


if __name__ == "__main__":
    reports = build_process_dag().run(raise_on_failure=False)
    for name, rep in reports.items():
        print(f"{name}: {rep.state.value} ({rep.attempts} attempt(s), "
              f"{rep.seconds:.1f}s)" + (f" — {rep.error}" if rep.error else ""))
    sys.exit(0 if all(r.state.value == "success" for r in reports.values())
             else 1)
