"""JDBC source/sink round-trip against embedded Derby.

Spark bundles Apache Derby (an embeddable JDBC database) in its own jars,
so the JDBC read/write path — previously config-only because no external
database exists in this environment — is testable for real: write with
``jdbc_sink`` (bounded connection count), read back with ``jdbc_source``,
including the partitioned-scan quartet that makes a JDBC read
cluster-parallel (the 100 TB-relevant part).

Reference parity: the MySQL dim load (``spark_consumer_kafka.py:28-35``)
and aggregate write (``:138-146``) — same API surface, embedded engine.
"""

from __future__ import annotations

import pytest

from data_pipeline_with_spark_kafka_spark.sources.readers import jdbc_sink, jdbc_source

DERBY_PROPS = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}


@pytest.fixture()
def derby_url(tmp_path):
    return f"jdbc:derby:{tmp_path}/jdbc_rt;create=true"


def test_jdbc_roundtrip(spark, derby_url):
    df = spark.range(0, 100).selectExpr(
        "id", "CAST(id % 7 AS INT) AS grp", "CAST(id AS DOUBLE) * 1.5 AS val"
    )
    jdbc_sink(df, derby_url, "t_roundtrip", mode="append", properties=DERBY_PROPS, max_connections=2)

    back = jdbc_source(spark, derby_url, "t_roundtrip", properties=DERBY_PROPS)
    rows = {(r.id, r.grp, r.val) for r in back.collect()}  # Spark quotes identifiers, case survives
    assert rows == {(i, i % 7, i * 1.5) for i in range(100)}

    # append mode appends (and created the table on first write)
    jdbc_sink(df, derby_url, "t_roundtrip", mode="append", properties=DERBY_PROPS, max_connections=2)
    assert jdbc_source(spark, derby_url, "t_roundtrip", properties=DERBY_PROPS).count() == 200


def test_jdbc_partitioned_read(spark, derby_url):
    df = spark.range(0, 1000).selectExpr("id", "id * 2 AS doubled")
    jdbc_sink(df, derby_url, "t_part", mode="overwrite", properties=DERBY_PROPS)

    part = jdbc_source(
        spark,
        derby_url,
        "t_part",
        properties=DERBY_PROPS,
        partition_column="id",
        lower_bound=0,
        upper_bound=1000,
        num_partitions=4,
    )
    # the scan itself is split into 4 stride queries — cluster-parallel
    assert part.rdd.getNumPartitions() == 4
    assert part.count() == 1000
    assert part.agg({"doubled": "sum"}).collect()[0][0] == sum(2 * i for i in range(1000))


def test_jdbc_keyed_upsert_converges(spark, derby_url):
    """The MERGE-based JDBC upsert: re-emitted keys update in place,
    replays are idempotent — the contract the reference's append-under-
    update-mode sink violates against its MySQL primary key."""
    from data_pipeline_with_spark_kafka_spark.sources.readers import jdbc_keyed_upsert

    b1 = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (2, "b", 20.0)],  # in-batch dup key
        "k long, name string, total double",
    )
    jdbc_keyed_upsert(b1, derby_url, "t_upsert", ["k"], properties=DERBY_PROPS, max_connections=1)
    got = {(r.k, r.name, r.total) for r in jdbc_source(spark, derby_url, "t_upsert", properties=DERBY_PROPS).collect()}
    assert got == {(1, "a", 10.0), (2, "b", 20.0)}

    # batch 2: revises key 2, adds key 3
    b2 = spark.createDataFrame(
        [(2, "b", 25.0), (3, "c", 30.0)], "k long, name string, total double"
    )
    jdbc_keyed_upsert(b2, derby_url, "t_upsert", ["k"], properties=DERBY_PROPS, max_connections=1)
    got = {(r.k, r.name, r.total) for r in jdbc_source(spark, derby_url, "t_upsert", properties=DERBY_PROPS).collect()}
    assert got == {(1, "a", 10.0), (2, "b", 25.0), (3, "c", 30.0)}

    # replay batch 2 (at-least-once foreachBatch) — no change, no error
    jdbc_keyed_upsert(b2, derby_url, "t_upsert", ["k"], properties=DERBY_PROPS, max_connections=1)
    assert jdbc_source(spark, derby_url, "t_upsert", properties=DERBY_PROPS).count() == 3


def test_upsert_sql_mysql_dialect():
    """The MySQL branch (no MySQL server in env, so the generated SQL is
    the testable artifact): INSERT..SELECT + ON DUPLICATE KEY UPDATE with
    backtick-quoted columns (Spark's MySQLDialect quoting), SELECT-alias
    references (VALUES() is deprecated in MySQL 8.0.20+), unquoted table
    names — the reference's real target (spark_consumer_kafka.py:138-146,
    README.md DDL declares PRIMARY KEY = the upsert key)."""
    from data_pipeline_with_spark_kafka_spark.sources.readers import (
        build_upsert_sql,
        upsert_dialect_for_url,
    )

    assert upsert_dialect_for_url("jdbc:mysql://db:3306/covid") == "mysql"
    assert upsert_dialect_for_url("jdbc:derby:/tmp/x;create=true") == "merge"
    assert upsert_dialect_for_url("jdbc:postgresql://db/covid") == "merge"

    sql = build_upsert_sql(
        "covid_agg", "covid_agg_staging",
        ["location", "window_start", "total_cases"], ["location", "window_start"],
        dialect="mysql",
    )
    assert sql == (
        "INSERT INTO covid_agg (`location`, `window_start`, `total_cases`) "
        "SELECT s.`location`, s.`window_start`, s.`total_cases` FROM covid_agg_staging s "
        "ON DUPLICATE KEY UPDATE `total_cases` = s.`total_cases`"
    )
    # all-key schema: nothing to update -> INSERT IGNORE keeps existing rows
    sql_keys_only = build_upsert_sql("t", "t_staging", ["k"], ["k"], dialect="mysql")
    assert sql_keys_only == "INSERT IGNORE INTO t (`k`) SELECT s.`k` FROM t_staging s"

    # the MERGE branch is Derby-validated end-to-end above; pin its shape too
    merge = build_upsert_sql("t", "t_staging", ["k", "v"], ["k"], dialect="merge")
    assert merge == (
        'MERGE INTO t t USING t_staging s ON t."k" = s."k" '
        'WHEN MATCHED THEN UPDATE SET t."v" = s."v" '
        'WHEN NOT MATCHED THEN INSERT ("k", "v") VALUES (s."k", s."v")'
    )

    with pytest.raises(ValueError):
        build_upsert_sql("t", "s", ["k"], ["k"], dialect="oracleish")


def test_table_exists_probe_distinguishes_errors(spark, tmp_path):
    """Missing TABLE -> False (bootstrap append is correct). But a broken
    CONNECTION must raise, never read as "table missing" — that would
    silently demote the keyed MERGE upsert to a duplicate-inserting
    append on the next reachable moment."""
    from data_pipeline_with_spark_kafka_spark.sources.readers import (
        _jdbc_table_exists,
    )

    df = spark.range(1)
    good_url = f"jdbc:derby:{tmp_path}/probe_db;create=true"
    jdbc_sink(df, good_url, "t_present", mode="overwrite", properties=DERBY_PROPS)
    assert _jdbc_table_exists(df, good_url, "t_present", DERBY_PROPS) is True
    assert _jdbc_table_exists(df, good_url, "t_absent", DERBY_PROPS) is False

    # No ;create=true and no database at the path: Derby raises XJ004
    # (database not found) — a connection-class failure, must propagate.
    bad_url = f"jdbc:derby:{tmp_path}/no_such_db"
    with pytest.raises(Exception) as exc_info:
        _jdbc_table_exists(df, bad_url, "t_present", DERBY_PROPS)
    assert "XJ004" in str(exc_info.value) or "not found" in str(exc_info.value)


def test_jdbc_upsert_crash_between_staging_and_merge(spark, derby_url, monkeypatch):
    """Exactly-once under a mid-epoch crash: the writer dies AFTER the
    staging overwrite but BEFORE the MERGE commits. The target must be
    untouched by the half-finished epoch, and the foreachBatch replay of
    the same epoch must land it exactly once — the two-phase property the
    reference's direct append (spark_consumer_kafka.py:145 under
    outputMode("update"), vs its PRIMARY KEY DDL in README.md:81) cannot
    provide: a crash there leaves whatever prefix of rows the executors
    already inserted."""
    from data_pipeline_with_spark_kafka_spark.sources import readers

    b1 = spark.createDataFrame([(1, "a", 10.0), (2, "b", 20.0)], "k long, name string, total double")
    jdbc_keyed_upsert = readers.jdbc_keyed_upsert
    jdbc_keyed_upsert(b1, derby_url, "t_crash", ["k"], properties=DERBY_PROPS, max_connections=1)

    real_exec = readers._execute_jdbc_statement

    def crash_on_merge(df, url, sql, properties):
        if sql.lstrip().upper().startswith("MERGE"):
            raise RuntimeError("injected crash: process died before MERGE commit")
        return real_exec(df, url, sql, properties)

    b2 = spark.createDataFrame([(2, "b", 25.0), (3, "c", 30.0)], "k long, name string, total double")
    monkeypatch.setattr(readers, "_execute_jdbc_statement", crash_on_merge)
    with pytest.raises(RuntimeError, match="injected crash"):
        jdbc_keyed_upsert(b2, derby_url, "t_crash", ["k"], properties=DERBY_PROPS, max_connections=1)
    monkeypatch.setattr(readers, "_execute_jdbc_statement", real_exec)

    # The crashed epoch left the TARGET exactly as it was (staging holds
    # the orphan rows — invisible to readers of the target).
    got = {(r.k, r.name, r.total) for r in jdbc_source(spark, derby_url, "t_crash", properties=DERBY_PROPS).collect()}
    assert got == {(1, "a", 10.0), (2, "b", 20.0)}

    # Replay of the epoch (checkpoint re-delivers batch 2): staging is
    # overwritten from scratch, MERGE folds it once -> state equals one
    # clean run of batches 1+2.
    jdbc_keyed_upsert(b2, derby_url, "t_crash", ["k"], properties=DERBY_PROPS, max_connections=1)
    got = {(r.k, r.name, r.total) for r in jdbc_source(spark, derby_url, "t_crash", properties=DERBY_PROPS).collect()}
    assert got == {(1, "a", 10.0), (2, "b", 25.0), (3, "c", 30.0)}

    # And a second replay (at-least-once redelivery after success) still
    # converges to the same state.
    jdbc_keyed_upsert(b2, derby_url, "t_crash", ["k"], properties=DERBY_PROPS, max_connections=1)
    assert jdbc_source(spark, derby_url, "t_crash", properties=DERBY_PROPS).count() == 3
