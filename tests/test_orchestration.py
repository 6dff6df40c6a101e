"""Pipeline-runner semantics: retry, backoff injection, fail-the-run,
context passing — the Airflow-DAG analog (rewrite_delta_dag.py:11-13)."""

import pytest
from pyspark.sql import functions as F

from projet_data_infrastructure_spark.orchestration import (
    PipelineError,
    PipelineTask,
    run_pipeline,
)


class FlakySink:
    """Fails the first ``fail_n`` calls, then succeeds — the injected fault."""

    def __init__(self, fail_n: int):
        self.fail_n = fail_n
        self.calls = 0
        self.written = None

    def __call__(self, ctx):
        self.calls += 1
        if self.calls <= self.fail_n:
            raise IOError(f"sink unavailable (call {self.calls})")
        self.written = ctx["transform"]
        return "ok"


def test_success_after_retry():
    sink = FlakySink(fail_n=1)
    slept = []
    run = run_pipeline(
        [
            ("read", lambda ctx: [1, 2, 3]),
            ("transform", lambda ctx: [x * 2 for x in ctx["read"]]),
            ("sink", sink),
        ],
        retries=1,
        retry_delay_sec=120.0,
        sleep=slept.append,
    )
    assert run.succeeded
    assert sink.written == [2, 4, 6]
    assert [r.status for r in run.results] == ["success"] * 3
    assert run.results[2].attempts == 2  # one failure, one retry
    assert slept == [120.0]  # fixed retry_delay, Airflow-style, injectable


def test_fail_the_run_skips_downstream():
    sink = FlakySink(fail_n=10)  # never recovers within retries
    audit = []
    with pytest.raises(PipelineError) as exc:
        run_pipeline(
            [
                ("read", lambda ctx: 1),
                ("sink", sink),
                ("notify", lambda ctx: audit.append("ran")),
            ],
            retries=2,
            sleep=lambda s: None,
        )
    results = exc.value.results
    assert [r.status for r in results] == ["success", "failed", "skipped"]
    assert results[1].attempts == 3  # 1 + retries
    assert "OSError" in results[1].error  # IOError is an OSError alias in py3
    assert audit == []  # downstream never ran


def test_per_task_retry_override():
    stubborn = FlakySink(fail_n=3)
    run = run_pipeline(
        [
            ("transform", lambda ctx: "x"),
            PipelineTask("sink", stubborn, retries=3),
        ],
        retries=0,  # pipeline default would fail; task override wins
        sleep=lambda s: None,
    )
    assert run.succeeded and stubborn.calls == 4


def test_spark_pipeline_end_to_end(spark, tmp_path):
    # The real shape: read → transform → validate → sink over Spark, with a
    # first-write fault injected at the sink boundary.
    out = tmp_path / "out.parquet"
    state = {"fails": 1}

    def sink(ctx):
        if state["fails"] > 0:
            state["fails"] -= 1
            raise RuntimeError("transient FS error")
        ctx["validated"].write.mode("overwrite").parquet(str(out))
        return str(out)

    run = run_pipeline(
        [
            ("read", lambda ctx: spark.range(100).select(F.col("id"))),
            ("transform", lambda ctx: ctx["read"].withColumn("v", F.col("id") * 2)),
            (
                "validated",
                lambda ctx: ctx["transform"].filter(F.col("v") >= 0),
            ),
            ("sink", sink),
        ],
        retries=1,
        sleep=lambda s: None,
    )
    assert run.succeeded
    assert spark.read.parquet(str(out)).count() == 100
