"""Conf-derived adaptive gates (VERDICT r03 #7): the sim broadcast
gate must move with ``spark.sql.autoBroadcastJoinThreshold`` (the
cluster's one broadcast knob) and the block gates with the per-task
budget; env overrides always win (escalation tests force paths with
them)."""

from __future__ import annotations

import pytest

from events_to_db_spark.operators.llm_ops import (
    _dedup_ppr_max,
    _sim_broadcast_max,
)
from events_to_db_spark.operators.pipeline_ops import _editdist_block_max
from events_to_db_spark.plans.gates import (
    BROADCAST_MULT,
    block_rows_gate,
    broadcast_rows_gate,
    parse_byte_conf,
)


def test_parse_byte_conf():
    assert parse_byte_conf("10485760") == 10 * 1024 * 1024
    assert parse_byte_conf("10485760b") == 10 * 1024 * 1024
    assert parse_byte_conf("10m") == 10 * 1024 * 1024
    assert parse_byte_conf("10MB") == 10 * 1024 * 1024
    assert parse_byte_conf(" 1g ") == 1 << 30
    assert parse_byte_conf("2k") == 2048
    assert parse_byte_conf("-1") == -1
    with pytest.raises(ValueError):
        parse_byte_conf("10x")
    with pytest.raises(ValueError):
        parse_byte_conf("lots")


@pytest.fixture
def bcast_conf(spark):
    """Snapshot + restore the runtime-settable broadcast threshold."""
    key = "spark.sql.autoBroadcastJoinThreshold"
    old = spark.conf.get(key)
    yield key
    spark.conf.set(key, old)


def test_sim_gate_moves_with_broadcast_threshold(
    spark, bcast_conf, monkeypatch
):
    monkeypatch.delenv("SPARK_GRAFT_SIM_BROADCAST_MAX", raising=False)
    spark.conf.set(bcast_conf, "10485760b")  # the 10 MiB default
    assert _sim_broadcast_max() == BROADCAST_MULT * 10 * 1024 * 1024 // 512
    assert _sim_broadcast_max() == 2_048_000  # the proven r1-r3 default
    spark.conf.set(bcast_conf, "1m")
    assert _sim_broadcast_max() == 204_800
    spark.conf.set(bcast_conf, "100m")
    assert _sim_broadcast_max() == 20_480_000
    # Broadcast ban forces the distributed path everywhere.
    spark.conf.set(bcast_conf, "-1")
    assert _sim_broadcast_max() == 0


def test_env_override_wins(spark, bcast_conf, monkeypatch):
    spark.conf.set(bcast_conf, "100m")
    monkeypatch.setenv("SPARK_GRAFT_SIM_BROADCAST_MAX", "7")
    assert _sim_broadcast_max() == 7
    monkeypatch.setenv("SPARK_GRAFT_DEDUP_PPR_MAX", "9")
    assert _dedup_ppr_max() == 9.0
    monkeypatch.setenv("SPARK_GRAFT_EDITDIST_BLOCK_MAX", "11")
    assert _editdist_block_max() == 11


def test_block_gates_reproduce_proven_defaults(spark, monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_DEDUP_PPR_MAX", raising=False)
    monkeypatch.delenv("SPARK_GRAFT_EDITDIST_BLOCK_MAX", raising=False)
    # measured quad-vs-band crossover (PERF.md r4); sqrt(2 * 2e10)
    assert _dedup_ppr_max() == 80.0
    assert _editdist_block_max() == 200_000
    # the gate scales with per-task compute, not cluster size
    assert block_rows_gate("NO_SUCH_ENV", 5e11) == 1_000_000


def test_broadcast_gate_clamps(spark, bcast_conf):
    spark.conf.set(bcast_conf, "1t")
    assert broadcast_rows_gate("NO_SUCH_ENV", bytes_per_row=512) == 50_000_000


def test_chunk_rows_gate_tracks_partition_bytes(spark, monkeypatch):
    """VERDICT r04 #7: the blocked sim path's chunk size derives from
    spark.sql.files.maxPartitionBytes (half, over packed row bytes),
    env override wins, bounds clamp."""
    from events_to_db_spark.plans.gates import chunk_rows_gate

    key = "spark.sql.files.maxPartitionBytes"
    old = spark.conf.get(key, None)
    try:
        spark.conf.set(key, str(128 * 1024 * 1024))
        assert chunk_rows_gate("NO_SUCH_ENV", bytes_per_row=512) == 131_072
        spark.conf.set(key, "16m")
        assert chunk_rows_gate("NO_SUCH_ENV", bytes_per_row=512) == 16_384
        monkeypatch.setenv("SPARK_GRAFT_SIM_BLOCK_ROWS", "37")
        assert chunk_rows_gate("SPARK_GRAFT_SIM_BLOCK_ROWS", 512) == 37
        spark.conf.set(key, "1k")  # absurdly small: clamps at lo
        assert chunk_rows_gate("NO_SUCH_ENV", bytes_per_row=512) == 1_000
    finally:
        if old is not None:
            spark.conf.set(key, old)
