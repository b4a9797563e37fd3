"""Orchestration layer: declarative job DAG + retry semantics +
spark-submit packaging (reference parity: the Airflow DAG at
``airflow_home/dags/spark_consumer_dag.py:17-46`` — owner/retries/
retry_delay default-args, a SparkSubmitOperator with packages, cores,
memory and conf).

Three scheduler-agnostic pieces instead of a hard Airflow dependency
(which does not exist in this environment and should not be a library
dependency of an engine):

- ``JobSpec`` / ``run_dag``: a tiny dependency-ordered runner with the
  DAG semantics that matter for pipelines — per-job retries with delay,
  fail-fast downstream skipping, attempt records. This is what ``run.py``
  subcommands plug into.
- ``SparkSubmitSpec.command()``: the spark-submit argv the reference's
  SparkSubmitOperator assembles (application, --packages, executor
  sizing, --conf pairs), as a testable pure function.
- ``airflow_dag_source``: emits an Airflow DAG *file* (text) from the
  same specs, so a deployment that does run Airflow gets the identical
  schedule/retry contract declaratively — generated, never imported.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Mapping, Sequence
from dataclasses import dataclass, field


@dataclass(frozen=True)
class RetryPolicy:
    """The reference DAG's default_args, minus Airflow
    (``spark_consumer_dag.py:10-15``: retries=1, retry_delay=5 min)."""

    retries: int = 1
    retry_delay_s: float = 300.0


@dataclass(frozen=True)
class JobSpec:
    """One node of the pipeline DAG. ``action`` is any zero-arg callable
    (a ``run.py`` subcommand closure, a spark-submit subprocess, ...);
    ``depends_on`` names upstream jobs that must SUCCEED first."""

    name: str
    action: Callable[[], None]
    depends_on: tuple[str, ...] = ()
    retry: RetryPolicy = field(default_factory=RetryPolicy)


@dataclass(frozen=True)
class JobResult:
    name: str
    state: str  # "success" | "failed" | "skipped"
    attempts: int
    error: str | None = None


def topological_order(jobs: Sequence[JobSpec]) -> list[JobSpec]:
    """Kahn's algorithm; raises on unknown dependencies and cycles so a
    malformed DAG fails at submission, not mid-run."""
    by_name = {j.name: j for j in jobs}
    if len(by_name) != len(jobs):
        raise ValueError("duplicate job names in DAG")
    for j in jobs:
        for dep in j.depends_on:
            if dep not in by_name:
                raise ValueError(f"job {j.name!r} depends on unknown job {dep!r}")
    remaining = {j.name: set(j.depends_on) for j in jobs}
    ordered: list[JobSpec] = []
    while remaining:
        ready = sorted(n for n, deps in remaining.items() if not deps)
        if not ready:
            raise ValueError(f"dependency cycle among: {sorted(remaining)}")
        for n in ready:
            ordered.append(by_name[n])
            del remaining[n]
        for deps in remaining.values():
            deps.difference_update(ready)
    return ordered


def run_dag(
    jobs: Sequence[JobSpec],
    *,
    sleep: Callable[[float], None] = time.sleep,
) -> dict[str, JobResult]:
    """Execute the DAG in dependency order with per-job retry.

    A job runs 1 + retries times at most, sleeping retry_delay_s between
    attempts (injectable ``sleep`` keeps tests instant). A failed job
    marks every transitive downstream job "skipped" — the fail-fast
    contract a scheduler gives you (Airflow's upstream_failed state).
    """
    results: dict[str, JobResult] = {}
    for job in topological_order(jobs):
        if any(results[d].state != "success" for d in job.depends_on):
            results[job.name] = JobResult(job.name, "skipped", 0)
            continue
        attempts = 0
        error: str | None = None
        while attempts <= job.retry.retries:
            attempts += 1
            try:
                job.action()
                error = None
                break
            except Exception as exc:  # noqa: BLE001 - retry boundary
                error = f"{type(exc).__name__}: {exc}"
                if attempts <= job.retry.retries:
                    sleep(job.retry.retry_delay_s)
        results[job.name] = JobResult(
            job.name,
            "success" if error is None else "failed",
            attempts,
            error,
        )
    return results


@dataclass(frozen=True)
class SparkSubmitSpec:
    """What the reference's SparkSubmitOperator carries
    (``spark_consumer_dag.py:26-46``), as data. ``command()`` is the
    argv — run it with subprocess, or feed it to a scheduler."""

    application: str
    application_args: tuple[str, ...] = ()
    packages: tuple[str, ...] = ()
    master: str | None = None
    deploy_mode: str | None = None
    total_executor_cores: int | None = None
    executor_cores: int | None = None
    executor_memory: str | None = None
    driver_memory: str | None = None
    num_executors: int | None = None
    conf: Mapping[str, str] = field(default_factory=dict)

    def command(self) -> list[str]:
        cmd = ["spark-submit"]
        if self.master:
            cmd += ["--master", self.master]
        if self.deploy_mode:
            cmd += ["--deploy-mode", self.deploy_mode]
        if self.packages:
            cmd += ["--packages", ",".join(self.packages)]
        if self.total_executor_cores is not None:
            cmd += ["--total-executor-cores", str(self.total_executor_cores)]
        if self.executor_cores is not None:
            cmd += ["--executor-cores", str(self.executor_cores)]
        if self.executor_memory:
            cmd += ["--executor-memory", self.executor_memory]
        if self.driver_memory:
            cmd += ["--driver-memory", self.driver_memory]
        if self.num_executors is not None:
            cmd += ["--num-executors", str(self.num_executors)]
        for k in sorted(self.conf):
            cmd += ["--conf", f"{k}={self.conf[k]}"]
        cmd.append(self.application)
        cmd += list(self.application_args)
        return cmd


def airflow_dag_source(
    dag_id: str,
    submits: Mapping[str, SparkSubmitSpec],
    *,
    description: str = "",
    schedule: str | None = None,
    retry: RetryPolicy = RetryPolicy(),
    depends: Mapping[str, Sequence[str]] | None = None,
    tags: Sequence[str] = (),
) -> str:
    """Generate an Airflow DAG file (source text) from the same specs —
    the deployment artifact the reference hand-writes. Generated so this
    library never imports Airflow; the output compiles standalone and is
    asserted compilable in tests.

    ``depends`` maps task_id -> upstream task_ids (set_upstream lines).
    """
    lines = [
        '"""Generated by data_pipeline_with_spark_kafka_spark.orchestration — do not hand-edit."""',
        "import pendulum",
        "from airflow.models.dag import DAG",
        "from airflow.providers.apache.spark.operators.spark_submit import SparkSubmitOperator",
        "",
        "default_args = {",
        "    'owner': 'pipeline',",
        f"    'retries': {retry.retries},",
        f"    'retry_delay': pendulum.duration(seconds={int(retry.retry_delay_s)}),",
        "}",
        "",
        "with DAG(",
        f"    dag_id={dag_id!r},",
        "    default_args=default_args,",
        f"    description={description!r},",
        f"    schedule={schedule!r},",
        f"    tags={list(tags)!r},",
        "    catchup=False,",
        ") as dag:",
    ]
    task_vars: dict[str, str] = {}
    for task_id, spec in submits.items():
        var = task_id.replace("-", "_")
        task_vars[task_id] = var
        lines += [
            f"    {var} = SparkSubmitOperator(",
            f"        task_id={task_id!r},",
            f"        application={spec.application!r},",
            "        conn_id='spark_default',",
        ]
        if spec.packages:
            lines.append(f"        packages={','.join(spec.packages)!r},")
        if spec.application_args:
            lines.append(f"        application_args={list(spec.application_args)!r},")
        for attr in (
            "total_executor_cores",
            "executor_cores",
            "executor_memory",
            "driver_memory",
            "num_executors",
        ):
            val = getattr(spec, attr)
            if val is not None:
                lines.append(f"        {attr}={val!r},")
        if spec.conf:
            lines.append(f"        conf={dict(spec.conf)!r},")
        lines.append("    )")
    for task_id, ups in (depends or {}).items():
        for up in ups:
            lines.append(f"    {task_vars[task_id]}.set_upstream({task_vars[up]})")
    return "\n".join(lines) + "\n"
