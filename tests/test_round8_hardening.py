"""Round-8 hardening tests for the advice findings: erase-CLI crash
recovery + zero-match rewrite skip, two-phase-swap leftover repair, and
attribution-stream duration-spec validation."""

from __future__ import annotations

import os

import pytest

from tests.test_round7_queries import _write_erasure_universe


def test_recover_two_phase_leftovers_restores_missing_target(tmp_path):
    """Crash between _two_phase_swap's two renames: target absent, .old-
    backup present, completed .tmp sibling present -> the backup is
    restored and the tmp removed."""
    from data_pipeline_with_spark_kafka_spark.run import _recover_two_phase_leftovers

    target = tmp_path / "t.parquet"
    backup = tmp_path / "t.parquet.old-deadbeef"
    tmp = tmp_path / "t.parquet.tmp-deadbeef"
    backup.write_bytes(b"old snapshot")
    tmp.mkdir()
    (tmp / "part-0.parquet").write_bytes(b"new")

    notes = _recover_two_phase_leftovers(str(target))
    assert target.read_bytes() == b"old snapshot"
    assert not backup.exists() and not tmp.exists()
    assert any("restored" in n for n in notes)


def test_recover_two_phase_leftovers_cleans_stale_siblings(tmp_path):
    """Crash after the second rename (target intact): stale .old-/.tmp-
    siblings are deleted, the target untouched."""
    from data_pipeline_with_spark_kafka_spark.run import _recover_two_phase_leftovers

    target = tmp_path / "t.parquet"
    target.write_bytes(b"current")
    (tmp_path / "t.parquet.old-aa").write_bytes(b"stale")
    stale_tmp = tmp_path / "t.parquet.tmp-bb"
    stale_tmp.mkdir()

    notes = _recover_two_phase_leftovers(str(target))
    assert target.read_bytes() == b"current"
    assert not (tmp_path / "t.parquet.old-aa").exists()
    assert not stale_tmp.exists()
    assert len(notes) == 2


def test_recover_two_phase_leftovers_refuses_tmp_only_gap(tmp_path):
    """Target missing with ONLY a tmp sibling (no backup to restore):
    refuse loudly instead of guessing."""
    from data_pipeline_with_spark_kafka_spark.run import _recover_two_phase_leftovers

    (tmp_path / "t.parquet.tmp-cc").mkdir()
    with pytest.raises(RuntimeError, match="interrupted swap"):
        _recover_two_phase_leftovers(str(tmp_path / "t.parquet"))


def test_recover_two_phase_leftovers_noop_when_clean(tmp_path):
    from data_pipeline_with_spark_kafka_spark.run import _recover_two_phase_leftovers

    target = tmp_path / "t.parquet"
    target.write_bytes(b"current")
    assert _recover_two_phase_leftovers(str(target)) == []


def test_erase_cli_resumes_after_crash_between_renames(spark, tmp_path, capsys):
    """A hard crash between the two renames leaves `orders` absent with
    .old-/.tmp- siblings; the re-run must RESTORE the backup and complete
    the erase for every table — previously it silently skipped the missing
    table while reporting success for the others (round-8 advice)."""
    from data_pipeline_with_spark_kafka_spark.run import main

    sf = _write_erasure_universe(tmp_path)
    # Simulate the mid-swap crash on orders: backup made, tmp written,
    # target renamed away, second rename never happened.
    os.rename(tmp_path / "orders.parquet", tmp_path / "orders.parquet.old-ab12cd34")
    tmp = tmp_path / "orders.parquet.tmp-ab12cd34"
    tmp.mkdir()
    (tmp / "partial").write_bytes(b"")

    main(["erase", "--data-dir", sf, "--subject-ids", "97,194"], spark=spark)
    out = capsys.readouterr().out
    assert "restored" in out and "orders.parquet.old-ab12cd34" in out
    # The full cascade ran against the restored table.
    assert "orders: 2 erased, 1 surviving" in out
    assert "lineitem: 2 erased, 2 surviving" in out
    assert "customer: 2 erased, 1 surviving" in out
    assert not (tmp_path / "orders.parquet.tmp-ab12cd34").exists()
    assert not (tmp_path / "orders.parquet.old-ab12cd34").exists()
    assert sorted(
        r.o_custkey for r in spark.read.parquet(f"{sf}/orders.parquet").collect()
    ) == [98]


def test_erase_cli_zero_match_run_skips_rewrite(spark, tmp_path, capsys):
    """An erase run whose subjects match nothing must not rewrite any
    table: the single-file parquet fixtures stay FILES (no directory
    conversion side effect) and the output says the rewrite was skipped."""
    from data_pipeline_with_spark_kafka_spark.run import main

    sf = _write_erasure_universe(tmp_path)
    main(["erase", "--data-dir", sf, "--subject-ids", "424242"], spark=spark)
    out = capsys.readouterr().out
    for t in ("orders", "customer", "events"):
        assert f"{t}: 0 erased" in out
    assert out.count("rewrite skipped") >= 3
    for t in ("customer", "orders", "lineitem", "events"):
        assert os.path.isfile(tmp_path / f"{t}.parquet"), t


@pytest.mark.parametrize(
    "spec,ms",
    [("30 days", 30 * 86_400_000), ("2 hours", 7_200_000), ("1 minute", 60_000)],
)
def test_duration_ms_valid_specs(spec, ms):
    from data_pipeline_with_spark_kafka_spark.streaming.attribution_stream import (
        _duration_ms,
    )

    assert _duration_ms(spec) == ms


@pytest.mark.parametrize(
    "spec,msg",
    [
        ("1 week", "unsupported unit"),
        ("90 min", "unsupported unit"),
        ("soon", "expected '<count> <unit>'"),
        ("1 2 3", "expected '<count> <unit>'"),
        ("0 days", "positive integer"),
        ("-5 days", "positive integer"),
        ("1.5 hours", "positive integer"),
    ],
)
def test_duration_ms_invalid_specs_raise_descriptive(spec, msg):
    from data_pipeline_with_spark_kafka_spark.streaming.attribution_stream import (
        _duration_ms,
    )

    with pytest.raises(ValueError, match=msg):
        _duration_ms(spec)


def test_dow_group_key_exemption_is_query_scoped():
    """The 'dow' bounded-group-key exemption must apply ONLY to
    events_anomaly_dow — a hypothetical other query grouping an
    sf-proportional column named dow must still be flagged (round-8
    advice: no global whitelist by column name)."""
    from tests.test_plans import _QUERY_BOUNDED_GROUP_KEYS, _BOUNDED_GROUP_KEYS

    assert "dow" not in _BOUNDED_GROUP_KEYS
    assert _QUERY_BOUNDED_GROUP_KEYS == {"events_anomaly_dow": {"dow"}}
