"""Orchestration layer: job-DAG runner retry/skip semantics, spark-submit
packaging, and Airflow DAG codegen (reference parity:
``airflow_home/dags/spark_consumer_dag.py:17-46`` — validated without an
Airflow install by compiling the generated source)."""

from __future__ import annotations

import pytest

from data_pipeline_with_spark_kafka_spark.orchestration import (
    JobSpec,
    RetryPolicy,
    SparkSubmitSpec,
    airflow_dag_source,
    run_dag,
    topological_order,
)

FAST = RetryPolicy(retries=2, retry_delay_s=7.0)


def test_run_dag_retries_until_success():
    attempts = {"n": 0}
    slept: list[float] = []

    def flaky():
        attempts["n"] += 1
        if attempts["n"] < 3:
            raise RuntimeError("transient")

    results = run_dag([JobSpec("j", flaky, retry=FAST)], sleep=slept.append)
    assert results["j"].state == "success"
    assert results["j"].attempts == 3
    assert slept == [7.0, 7.0]  # delay between attempts, not after success


def test_run_dag_exhausts_retries_and_skips_downstream():
    ran = []

    def always_fails():
        raise ValueError("boom")

    results = run_dag(
        [
            JobSpec("a", always_fails, retry=FAST),
            JobSpec("b", lambda: ran.append("b"), depends_on=("a",)),
            JobSpec("c", lambda: ran.append("c"), depends_on=("b",)),
            JobSpec("d", lambda: ran.append("d")),  # independent — still runs
        ],
        sleep=lambda _: None,
    )
    assert results["a"].state == "failed"
    assert results["a"].attempts == 3  # 1 + 2 retries
    assert "boom" in results["a"].error
    assert results["b"].state == "skipped" and results["c"].state == "skipped"
    assert results["d"].state == "success"
    assert ran == ["d"]  # downstream of the failure never executed


def test_topological_order_and_dag_validation():
    order = topological_order(
        [
            JobSpec("c", lambda: None, depends_on=("a", "b")),
            JobSpec("b", lambda: None, depends_on=("a",)),
            JobSpec("a", lambda: None),
        ]
    )
    assert [j.name for j in order] == ["a", "b", "c"]

    with pytest.raises(ValueError, match="unknown job"):
        topological_order([JobSpec("x", lambda: None, depends_on=("ghost",))])
    with pytest.raises(ValueError, match="cycle"):
        topological_order(
            [
                JobSpec("x", lambda: None, depends_on=("y",)),
                JobSpec("y", lambda: None, depends_on=("x",)),
            ]
        )


def test_spark_submit_command_matches_operator_fields():
    """Argv parity with the reference's SparkSubmitOperator
    (spark_consumer_dag.py:26-46): application last-before-args, packages
    comma-joined, sizing flags, sorted --conf pairs."""
    spec = SparkSubmitSpec(
        application="/opt/spark/app/run.py",
        application_args=("consume", "--topic", "covid_data"),
        packages=("org.apache.spark:spark-sql-kafka-0-10_2.13:4.1.2", "com.mysql:mysql-connector-j:8.4.0"),
        master="spark://master:7077",
        total_executor_cores=2,
        executor_cores=1,
        executor_memory="2g",
        driver_memory="1g",
        num_executors=2,
        conf={"spark.sql.shuffle.partitions": "200", "spark.sql.adaptive.enabled": "true"},
    )
    cmd = spec.command()
    assert cmd[:3] == ["spark-submit", "--master", "spark://master:7077"]
    i = cmd.index("--packages")
    assert cmd[i + 1] == (
        "org.apache.spark:spark-sql-kafka-0-10_2.13:4.1.2,com.mysql:mysql-connector-j:8.4.0"
    )
    assert cmd[cmd.index("--total-executor-cores") + 1] == "2"
    assert cmd[cmd.index("--executor-memory") + 1] == "2g"
    # conf pairs sorted and key=value shaped
    confs = [cmd[j + 1] for j, tok in enumerate(cmd) if tok == "--conf"]
    assert confs == [
        "spark.sql.adaptive.enabled=true",
        "spark.sql.shuffle.partitions=200",
    ]
    # application then its args, at the very end
    assert cmd[cmd.index("/opt/spark/app/run.py"):] == [
        "/opt/spark/app/run.py", "consume", "--topic", "covid_data",
    ]


def test_airflow_dag_source_compiles_and_carries_retry_contract():
    spec = SparkSubmitSpec(
        application="/opt/spark/app/run.py",
        application_args=("consume",),
        packages=("org.apache.spark:spark-sql-kafka-0-10_2.13:4.1.2",),
        executor_memory="2g",
        conf={"spark.sql.shuffle.partitions": "200"},
    )
    src = airflow_dag_source(
        "pipeline_dag",
        {"stage-events": spec, "submit_consumer": spec},
        description="test dag",
        schedule="@daily",
        retry=RetryPolicy(retries=3, retry_delay_s=60),
        depends={"submit_consumer": ["stage-events"]},
        tags=("spark",),
    )
    compile(src, "generated_dag.py", "exec")  # syntactically valid Airflow file
    assert "'retries': 3" in src
    assert "pendulum.duration(seconds=60)" in src
    assert "schedule='@daily'" in src
    assert "stage_events = SparkSubmitOperator(" in src  # dash -> identifier
    assert "submit_consumer.set_upstream(stage_events)" in src


def test_cli_dag_subcommand_emits_compilable_file(tmp_path, capsys):
    from data_pipeline_with_spark_kafka_spark.run import main

    out = tmp_path / "generated_dag.py"
    main(["dag", "--out", str(out)])
    src = out.read_text()
    compile(src, str(out), "exec")
    assert "spark-sql-kafka-0-10_2.13:4.1.2" in src
    assert "mysql-connector-j" in src
    assert "'retries': 1" in src


def test_cli_orchestrate_runs_pipeline_with_dag_semantics(spark, tmp_path):
    """The orchestrate subcommand lands the same rows as e2e, through the
    retry-DAG runner (attempt records printed per job)."""
    from data_pipeline_with_spark_kafka_spark.run import main

    events_csv = tmp_path / "events.csv"
    events_csv.write_text(
        "event_time,location,new_cases,total_cases\n"
        "2024-06-01 10:00:05,LOC_A,10,100\n"
        "2024-06-01 10:01:10,LOC_B,7,70\n"
    )
    dim_csv = tmp_path / "dim.csv"
    dim_csv.write_text(
        "location,population,continent\nLOC_A,100000,EU\nLOC_B,200000,AS\n"
    )
    target = tmp_path / "out"
    main(
        [
            "orchestrate",
            "--input", f"file://{events_csv}",
            "--stage-dir", str(tmp_path / "stage"),
            "--batches", "2",
            "--dim", str(dim_csv),
            "--target", str(target),
            "--checkpoint", str(tmp_path / "ckpt"),
            "--retries", "1",
            "--retry-delay", "0",
        ],
        spark=spark,
    )
    got = {(r.location, r.total_new_cases_in_window) for r in spark.read.parquet(str(target)).collect()}
    assert got == {("LOC_A", 10), ("LOC_B", 7)}
