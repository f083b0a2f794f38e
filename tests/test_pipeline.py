"""DAG runner: ordering, retries, failure isolation, validation.

Pure-Python tests (no Spark) — the runner is deliberately independent of
the session so orchestration logic is testable in milliseconds; the
Spark integration is scripts/run_marts.py, whose tasks are plain
thunks over one shared session.
"""

from __future__ import annotations

import threading
import time

import pytest

from hdfs_with_pyspark_spark.pipeline import DAG, Task, TaskState


def test_runs_in_dependency_order():
    order = []
    lock = threading.Lock()

    def mk(name):
        def fn():
            with lock:
                order.append(name)
        return fn

    dag = (DAG("t")
           .add("a", mk("a"))
           .add("b", mk("b"), deps=["a"])
           .add("c", mk("c"), deps=["a"])
           .add("d", mk("d"), deps=["b", "c"]))
    reports = dag.run()
    assert all(r.state is TaskState.SUCCESS for r in reports.values())
    assert order.index("a") < order.index("b")
    assert order.index("a") < order.index("c")
    assert order.index("d") == 3


def test_independent_tasks_overlap():
    # Two 0.15s sleeps in a 2-task graph must overlap — that is the whole
    # point of in-session orchestration vs the reference's serial chain.
    barrier = threading.Barrier(2, timeout=5)

    def task():
        barrier.wait()   # deadlocks (-> Barrier timeout) unless concurrent
        time.sleep(0.05)

    t0 = time.monotonic()
    DAG("t").add("x", task).add("y", task).run()
    assert time.monotonic() - t0 < 3


def test_retry_then_success_with_backoff():
    calls = {"n": 0}
    delays: list[float] = []

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise OSError("transient")

    dag = DAG("t").add(Task("f", flaky, retries=3, retry_delay=0.5))
    reports = dag.run(sleep=delays.append)
    assert reports["f"].state is TaskState.SUCCESS
    assert reports["f"].attempts == 3
    assert delays == [0.5, 1.0]          # exponential backoff, injectable
    assert reports["f"].error is None    # cleared on eventual success


def test_failure_skips_downstream_but_not_siblings():
    ran = []

    def boom():
        raise ValueError("nope")

    dag = (DAG("t")
           .add("bad", boom)
           .add("child", lambda: ran.append("child"), deps=["bad"])
           .add("grandchild", lambda: ran.append("gc"), deps=["child"])
           .add("independent", lambda: ran.append("ind")))
    with pytest.raises(RuntimeError) as ei:
        dag.run()
    assert "bad=failed" in str(ei.value)
    reports = dag.run(raise_on_failure=False)
    assert reports["bad"].state is TaskState.FAILED
    assert reports["child"].state is TaskState.SKIPPED
    assert reports["grandchild"].state is TaskState.SKIPPED
    assert reports["independent"].state is TaskState.SUCCESS
    assert "child" not in ran and "gc" not in ran and "ind" in ran


def test_validation_rejects_bad_graphs():
    with pytest.raises(ValueError, match="unknown"):
        DAG("t").add("a", lambda: None, deps=["ghost"]).run()
    with pytest.raises(ValueError, match="cycle"):
        (DAG("t")
         .add("a", lambda: None, deps=["b"])
         .add("b", lambda: None, deps=["a"])
         .run())
    with pytest.raises(ValueError, match="duplicate"):
        DAG("t").add("a", lambda: None).add("a", lambda: None)


def test_results_captured():
    dag = DAG("t").add("x", lambda: 42)
    assert dag.run()["x"].result == 42


# ------------------------------------------------------- property-based

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @st.composite
    def random_dag(draw):
        """Random DAG: each task may depend only on lower-numbered tasks
        (guarantees acyclicity); a random subset of tasks fail."""
        n = draw(st.integers(min_value=1, max_value=8))
        deps = {i: (sorted(draw(st.sets(st.integers(0, i - 1), max_size=3)))
                    if i else [])
                for i in range(n)}
        failing = draw(st.sets(st.integers(0, n - 1), max_size=3))
        return n, deps, failing

    @given(random_dag())
    @settings(max_examples=60, deadline=None)
    def test_random_dags_respect_deps_and_skip_cones(case):
        n, deps, failing = case
        started: list[int] = []
        lock = threading.Lock()

        def mk(i):
            def fn():
                with lock:
                    started.append(i)
                if i in failing:
                    raise ValueError(f"boom {i}")
            return fn

        dag = DAG("prop")
        for i in range(n):
            dag.add(str(i), mk(i), deps=[str(d) for d in deps[i]])
        reports = dag.run(raise_on_failure=False)

        # transitive downstream cone of the failures
        doomed: set[int] = set()
        for i in range(n):
            if any(d in failing or d in doomed for d in deps[i]):
                doomed.add(i)
        for i in range(n):
            st_ = reports[str(i)].state
            if i in doomed:
                assert st_ is TaskState.SKIPPED and i not in started
            elif i in failing:
                assert st_ is TaskState.FAILED
            else:
                assert st_ is TaskState.SUCCESS
        # no task ever started before all its deps completed successfully
        pos = {i: p for p, i in enumerate(started)}
        for i in started:
            for d in deps[i]:
                assert pos[d] < pos[i]
except ImportError:  # hypothesis absent: property test is optional
    pass
