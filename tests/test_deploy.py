"""Deployment packaging consistency: the compose file parses, and the ONE
version pin drives everything — Dockerfile defaults, compose build args,
the installed pyspark client, and the generated Airflow DAG's --packages.
This is the test that prevents re-introducing the reference's §4.3
cluster/client/packages version skew."""

from __future__ import annotations

import pathlib
import re

import yaml

DEPLOY = pathlib.Path(__file__).resolve().parent.parent / "deploy"


def _dockerfile_args(name: str) -> dict[str, str]:
    text = (DEPLOY / name).read_text()
    return dict(re.findall(r"^ARG (\w+)=(\S+)$", text, re.MULTILINE))


def test_compose_parses_and_has_reference_service_surface():
    compose = yaml.safe_load((DEPLOY / "docker-compose.yml").read_text())
    services = compose["services"]
    # the reference's deployment surface, minus zookeeper (KRaft)
    assert {"mysql", "kafka", "spark-master", "spark-worker",
            "airflow-webserver", "airflow-scheduler"} <= set(services)
    assert "zookeeper" not in services
    # durable checkpoint volume, not /tmp (reference wart)
    assert "spark-checkpoints" in compose["volumes"]
    assert "spark-checkpoints:/checkpoints" in services["spark-worker"]["volumes"]
    # health-gated startup ordering survives from the reference
    assert services["airflow-webserver"]["depends_on"]["mysql"]["condition"] == "service_healthy"
    # KRaft single-node: broker is its own controller
    env = services["kafka"]["environment"]
    assert env["KAFKA_CFG_PROCESS_ROLES"] == "broker,controller"


def test_single_version_pin_everywhere():
    import pyspark

    args = _dockerfile_args("Dockerfile.spark")
    spark_version, scala_bin = args["SPARK_VERSION"], args["SCALA_BIN"]
    mysql_version = args["MYSQL_CONNECTOR_VERSION"]

    # Dockerfile pin == the pyspark this repo actually develops against
    assert spark_version == pyspark.__version__

    # compose build args == Dockerfile defaults
    compose = yaml.safe_load((DEPLOY / "docker-compose.yml").read_text())
    build_args = compose["x-spark-build"]["args"]
    assert build_args["SPARK_VERSION"] == spark_version
    assert build_args["SCALA_BIN"] == scala_bin
    assert build_args["MYSQL_CONNECTOR_VERSION"] == mysql_version

    # generated DAG resolves the SAME coordinates (run.py `dag` defaults)
    from data_pipeline_with_spark_kafka_spark.run import main

    out = DEPLOY.parent / "deploy" / "dags"
    out.mkdir(exist_ok=True)
    dag_file = out / "_test_dag.py"
    try:
        main(["dag", "--out", str(dag_file), "--spark-version", spark_version])
        src = dag_file.read_text()
        assert f"spark-sql-kafka-0-10_{scala_bin}:{spark_version}" in src
        assert f"mysql-connector-j:{mysql_version}" in src
    finally:
        dag_file.unlink(missing_ok=True)


def test_spark_dockerfile_derives_jars_from_pins():
    """Connector jar URLs must be interpolated from the ARG pins — a
    hand-typed version in a URL is exactly how the reference's skew
    happened (its Dockerfile wgets 3.5.0 jars into a 3.5.6 cluster)."""
    text = (DEPLOY / "Dockerfile.spark").read_text()
    jar_urls = re.findall(r"https://repo1\.maven\.org/\S+\.jar", text)
    assert jar_urls, "expected connector jars baked from Maven Central"
    for url in jar_urls:
        assert "${" in url, f"hard-coded version in jar URL: {url}"
    assert 'pip3 install --no-cache-dir "pyspark==${SPARK_VERSION}"' in text
