"""In-process DAG runner for Spark job chains.

The orchestration analog of the reference's Airflow DAG
(reference src/dags/project_dag.py:23-69), re-thought for Spark's
execution model instead of translated. The reference chains three
spark-submit jobs sequentially (step_1 >> step_2 >> step_3) even though
no step reads another's output — three JVM cold-starts and zero overlap.
Here a task graph runs inside ONE SparkSession: every task whose
dependencies are satisfied is submitted concurrently from its own
thread, and Spark's scheduler interleaves their stages across the
executor pool (FAIR mode benefits, FIFO still overlaps I/O and compute).
On a 1000-executor cluster this is the difference between three
sequential cluster-wide barriers and one saturated schedule.

What it adds over a bare ThreadPoolExecutor:

  * dependencies — a task runs only after all its upstreams succeed;
  * retries — per-task attempt budget with exponential backoff, for
    the transient failures (executor loss, FS hiccups) that dominate
    long pipelines; tasks must therefore be idempotent, which every
    sink in this repo is (write_parquet overwrites);
  * failure isolation — a failed task SKIPs its downstream cone, but
    independent branches keep running to completion;
  * a run report — per-task state, attempts, wall seconds, error.

Deliberately NOT a scheduler: no cron, no cross-run state, no executor
management — that belongs to whatever submits the driver (Airflow,
cron, a notebook). This module is the *intra-application* dependency
layer those tools lack.
"""

from __future__ import annotations

import enum
import threading
import time
from collections import deque
from concurrent.futures import FIRST_COMPLETED, ThreadPoolExecutor, wait
from dataclasses import dataclass, field
from typing import Any, Callable


class TaskState(str, enum.Enum):
    PENDING = "pending"
    RUNNING = "running"
    SUCCESS = "success"
    FAILED = "failed"
    SKIPPED = "skipped"  # an upstream failed; this task never ran


@dataclass
class Task:
    """One node: ``fn()`` is the unit of work (typically: build a
    DataFrame and materialize it through an overwrite sink — idempotent,
    so a retry after a partial write converges)."""
    name: str
    fn: Callable[[], Any]
    deps: tuple[str, ...] = ()
    retries: int = 0            # additional attempts after the first
    retry_delay: float = 1.0    # seconds before attempt 2; doubles per attempt


@dataclass
class TaskReport:
    name: str
    state: TaskState = TaskState.PENDING
    attempts: int = 0
    seconds: float = 0.0
    error: str | None = None
    result: Any = None


class DAG:
    """Build with ``add(task)`` / ``add(name, fn, deps=...)``, then
    ``run()``. Validation (unknown deps, cycles, duplicate names) happens
    at add/run time, not mid-flight."""

    def __init__(self, name: str = "dag", max_workers: int | None = None):
        self.name = name
        self.max_workers = max_workers
        self._tasks: dict[str, Task] = {}

    def add(self, task: Task | str, fn: Callable[[], Any] | None = None,
            deps: tuple[str, ...] | list[str] = (), retries: int = 0,
            retry_delay: float = 1.0) -> "DAG":
        if not isinstance(task, Task):
            assert fn is not None, "add(name, fn, ...) requires fn"
            task = Task(task, fn, tuple(deps), retries, retry_delay)
        if task.name in self._tasks:
            raise ValueError(f"duplicate task name: {task.name!r}")
        self._tasks[task.name] = task
        return self

    # -------------------------------------------------------------- graph
    def _validate(self) -> None:
        for t in self._tasks.values():
            unknown = [d for d in t.deps if d not in self._tasks]
            if unknown:
                raise ValueError(f"task {t.name!r} depends on unknown {unknown}")
        # Kahn's algorithm; anything left over sits on a cycle.
        indeg = {n: len(t.deps) for n, t in self._tasks.items()}
        downstream: dict[str, list[str]] = {n: [] for n in self._tasks}
        for t in self._tasks.values():
            for d in t.deps:
                downstream[d].append(t.name)
        q = deque(n for n, d in indeg.items() if d == 0)
        seen = 0
        while q:
            n = q.popleft()
            seen += 1
            for m in downstream[n]:
                indeg[m] -= 1
                if indeg[m] == 0:
                    q.append(m)
        if seen != len(self._tasks):
            cyclic = sorted(n for n, d in indeg.items() if d > 0)
            raise ValueError(f"cycle among tasks: {cyclic}")

    # ---------------------------------------------------------------- run
    def run(self, raise_on_failure: bool = True,
            sleep: Callable[[float], None] = time.sleep) -> dict[str, TaskReport]:
        """Execute the graph; returns {task name: TaskReport}.

        ``sleep`` is injectable so retry backoff is testable without
        wall-clock waits.
        """
        self._validate()
        reports = {n: TaskReport(n) for n in self._tasks}
        lock = threading.Lock()  # guards reports + scheduling decisions

        def attempt(task: Task) -> None:
            rep = reports[task.name]
            delay = task.retry_delay
            for i in range(task.retries + 1):
                t0 = time.monotonic()
                try:
                    with lock:
                        rep.state = TaskState.RUNNING
                        rep.attempts = i + 1
                    rep.result = task.fn()
                    with lock:
                        rep.seconds += time.monotonic() - t0
                        rep.state = TaskState.SUCCESS
                        rep.error = None
                    return
                except Exception as e:  # noqa: BLE001 — report, don't mask
                    with lock:
                        rep.seconds += time.monotonic() - t0
                        rep.error = f"{type(e).__name__}: {e}"
                    if i < task.retries:
                        sleep(delay)
                        delay *= 2
            with lock:
                rep.state = TaskState.FAILED

        workers = self.max_workers or max(1, len(self._tasks))
        with ThreadPoolExecutor(max_workers=workers,
                                thread_name_prefix=f"dag-{self.name}") as pool:
            running: dict[Any, str] = {}

            def schedule_ready() -> None:
                # under lock: launch every PENDING task whose deps all
                # SUCCEEDed; SKIP those with a FAILED/SKIPPED upstream.
                # Iterates to fixpoint so a skip cascades through a whole
                # downstream chain in one call (order of examination
                # must not matter).
                changed = True
                while changed:
                    changed = False
                    for t in self._tasks.values():
                        rep = reports[t.name]
                        if rep.state is not TaskState.PENDING:
                            continue
                        dep_states = [reports[d].state for d in t.deps]
                        if any(s in (TaskState.FAILED, TaskState.SKIPPED)
                               for s in dep_states):
                            rep.state = TaskState.SKIPPED
                            rep.error = "upstream failed"
                            changed = True
                        elif all(s is TaskState.SUCCESS for s in dep_states):
                            rep.state = TaskState.RUNNING
                            running[pool.submit(attempt, t)] = t.name
                            changed = True

            with lock:
                schedule_ready()
            while running:
                done, _ = wait(list(running), return_when=FIRST_COMPLETED)
                for fut in done:
                    running.pop(fut)
                    fut.result()  # attempt() swallows task errors; this
                    #               surfaces only runner bugs
                with lock:
                    schedule_ready()

        failed = sorted(n for n, r in reports.items()
                        if r.state in (TaskState.FAILED, TaskState.SKIPPED))
        if failed and raise_on_failure:
            detail = "; ".join(
                f"{n}={reports[n].state.value}"
                + (f" ({reports[n].error})" if reports[n].error else "")
                for n in failed)
            raise RuntimeError(f"DAG {self.name!r} failed: {detail}")
        return reports
