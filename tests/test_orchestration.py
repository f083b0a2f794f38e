"""Orchestration artifacts: the spark-submit DAG spec and the
self-contained demo path of run_marts.py.

The Airflow layer itself can't run here (no airflow in the container);
what IS testable is the contract every layer shares: the one declarative
spec (scripts/airflow_marts_dag.py:MART_TASKS) and its wiring onto the
in-process runner. The subprocess spark-submit path is exercised by
injecting a recording runner — graph semantics without JVM cold-starts —
and the end-to-end `--mart` demo is driven in-process on the shared test
session (reference analog: src/dags/project_dag.py:29-67).
"""

from __future__ import annotations

import importlib.util
import os
import sys


def _load_script(name: str):
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scripts", f"{name}.py")
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def test_spec_covers_all_marts_and_airflow_is_optional():
    dagmod = _load_script("airflow_marts_dag")
    ids = [t["task_id"] for t in dagmod.MART_TASKS]
    assert ids == ["user_mart", "zone_mart", "friend_recommendations"]
    assert {t["mart"] for t in dagmod.MART_TASKS} == {"user", "zone", "friends"}
    # every application is the one spark-submit entry, and it exists
    for t in dagmod.MART_TASKS:
        assert os.path.exists(t["application"])
    # the module imports (and the Airflow hook degrades) without airflow
    assert dagmod.dag is None or dagmod.dag is not None


def test_process_dag_runs_spec_with_injected_runner():
    dagmod = _load_script("airflow_marts_dag")
    ran: list[str] = []
    dag = dagmod.build_process_dag(runner=lambda t: ran.append(t["mart"]))
    reports = dag.run(raise_on_failure=True)
    assert sorted(ran) == ["friends", "user", "zone"]
    assert all(r.state.value == "success" for r in reports.values())


def test_expand_args_threads_env_paths(monkeypatch):
    dagmod = _load_script("airflow_marts_dag")
    task = dagmod.MART_TASKS[0]
    assert dagmod.expand_args(task) == ["--mart", "user"]
    monkeypatch.setenv("MARTS_EVENTS", "/data/events")
    monkeypatch.setenv("MARTS_DATE", "2024-03-15")
    args = dagmod.expand_args(task)
    assert args[:2] == ["--mart", "user"]
    assert ("--events", "/data/events") == tuple(args[2:4])
    assert ("--date", "2024-03-15") == tuple(args[4:6])


def test_run_marts_demo_mode_builds_mart(spark, tmp_path):
    # The `spark-submit scripts/run_marts.py --mart user` demo path,
    # driven in-process on the shared session: no --events/--cities
    # materializes the deterministic fixture, builds the mart, writes
    # parquet under --out.
    runm = _load_script("run_marts")
    out = str(tmp_path / "marts")
    runm.main(["--mart", "user", "--out", out])
    mart = spark.read.parquet(os.path.join(out, "user_mart"))
    assert mart.count() == 6                      # one row per demo user
    assert {"user_id", "act_city", "home_city",
            "travel_count", "travel_array", "local_time"} <= set(mart.columns)
