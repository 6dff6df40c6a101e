"""Thin pipeline runner — the container-expressible analog of the
reference's Airflow orchestration (``airflow/dags/rewrite_delta_dag.py:11-13``
sets ``retries=1, retry_delay=2min``; ``:27-53`` sequences SparkSubmit
tasks with ``max_active_runs=1``).

Spark-first framing: orchestration here is NOT a scheduler — Catalyst owns
the intra-query plan; this only sequences coarse pipeline stages
(read → transform → validate → sink) with per-task retry/backoff, which is
the part of the reference's DAG semantics that survives outside Airflow.

No wall-clock sleeping in tests: the delay function is injectable.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Sequence
from dataclasses import dataclass, field
from typing import Any

Ctx = dict[str, Any]


@dataclass
class PipelineTask:
    """One named stage. ``fn(ctx)`` receives the shared context dict and its
    return value is stored under ``ctx[name]`` for downstream tasks —
    the XCom analog, without a metadata database."""

    name: str
    fn: Callable[[Ctx], Any]
    retries: int | None = None  # None → pipeline default


@dataclass
class TaskResult:
    name: str
    status: str  # "success" | "failed" | "skipped"
    attempts: int
    elapsed_sec: float
    error: str | None = None


class PipelineError(RuntimeError):
    """A task exhausted its retries; carries every task's outcome."""

    def __init__(self, message: str, results: list[TaskResult]):
        super().__init__(message)
        self.results = results


@dataclass
class PipelineRun:
    results: list[TaskResult] = field(default_factory=list)
    ctx: Ctx = field(default_factory=dict)

    @property
    def succeeded(self) -> bool:
        return all(r.status == "success" for r in self.results)


def run_pipeline(
    tasks: Sequence[PipelineTask | tuple[str, Callable[[Ctx], Any]]],
    *,
    retries: int = 1,
    retry_delay_sec: float = 0.0,
    sleep: Callable[[float], None] = time.sleep,
    ctx: Ctx | None = None,
) -> PipelineRun:
    """Run tasks sequentially with per-task retry, Airflow-default style.

    Mirrors the reference DAG's semantics: ``retries`` extra attempts per
    task with a fixed ``retry_delay`` between them
    (``rewrite_delta_dag.py:11-13``), strictly sequential execution
    (``max_active_runs=1``), and fail-the-run on exhaustion — downstream
    tasks are recorded as ``skipped``, and :class:`PipelineError` carries
    the full result list for the caller's alerting hook.
    """
    norm = [t if isinstance(t, PipelineTask) else PipelineTask(*t) for t in tasks]
    run = PipelineRun(ctx=ctx if ctx is not None else {})
    failed_at: int | None = None
    for i, task in enumerate(norm):
        max_attempts = 1 + (retries if task.retries is None else task.retries)
        t0 = time.time()
        err: str | None = None
        for attempt in range(1, max_attempts + 1):
            try:
                run.ctx[task.name] = task.fn(run.ctx)
                run.results.append(
                    TaskResult(task.name, "success", attempt, round(time.time() - t0, 3))
                )
                err = None
                break
            except Exception as e:  # noqa: BLE001 — any task failure is retryable
                err = f"{type(e).__name__}: {e}"
                if attempt < max_attempts:
                    sleep(retry_delay_sec)
        if err is not None:
            run.results.append(
                TaskResult(task.name, "failed", max_attempts, round(time.time() - t0, 3), err)
            )
            failed_at = i
            break
    if failed_at is not None:
        for task in norm[failed_at + 1 :]:
            run.results.append(TaskResult(task.name, "skipped", 0, 0.0))
        raise PipelineError(
            f"pipeline failed at task '{norm[failed_at].name}': {run.results[failed_at].error}",
            run.results,
        )
    return run
