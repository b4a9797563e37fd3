"""Bad-record policy contract: drop / dead_letter / fail."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import PythonException

from data_pipeline_with_spark_kafka_spark.sources.badrecords import parse_json_records

SCHEMA = "event_time string, location string, new_cases int"
ROWS = [
    ('{"event_time":"2024-01-01 00:00:00","location":"US","new_cases":5}',),
    ("not json",),
    ('{"event_time":"2024-01-02 00:00:00","new_cases":3}',),  # missing location
]


@pytest.fixture()
def raw(spark):
    return spark.createDataFrame(ROWS, "value string")


def test_drop_policy(raw):
    good = parse_json_records(raw, "value", SCHEMA, essential=["event_time", "location"])
    assert [r.location for r in good.collect()] == ["US"]


def test_dead_letter_policy(raw):
    good, bad = parse_json_records(
        raw, "value", SCHEMA, essential=["event_time", "location"], policy="dead_letter"
    )
    assert good.count() == 1
    quarantined = {r.reason for r in bad.collect()}
    assert quarantined == {"malformed_json", "missing_essential_field"}
    assert bad.columns == ["raw_payload", "reason", "quarantined_at"]


def test_fail_policy_raises_on_bad_record(spark, raw):
    strict = parse_json_records(
        raw, "value", SCHEMA, essential=["event_time", "location"], policy="fail"
    )
    with pytest.raises(Exception) as exc:
        strict.collect()
    assert "bad record" in str(exc.value)

    clean = spark.createDataFrame([ROWS[0]], "value string")
    ok = parse_json_records(
        clean, "value", SCHEMA, essential=["event_time", "location"], policy="fail"
    )
    assert ok.count() == 1
