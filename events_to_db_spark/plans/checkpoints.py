"""Lineage truncation with a reliability switch (VERDICT r02 #3).

Iterative operators (label propagation, PageRank, k-core peeling, power
iteration, BFS, absorption chains) must truncate lineage every round or
the Catalyst plan grows geometrically.  Two ways to do that:

* ``localCheckpoint`` (default) — stores blocks on executors WITHOUT
  lineage.  Fast (no DFS round-trip), but losing an executor makes the
  checkpointed blocks unrecoverable and aborts the query: an
  *availability* trade, not a correctness one.  The right default for
  local mode and for clusters with stable executors.
* reliable ``checkpoint`` — writes blocks to a fault-tolerant directory
  (HDFS/object store on a real cluster).  Survives executor loss at the
  cost of a write+read per truncation.

Set ``SPARK_GRAFT_RELIABLE_CHECKPOINT=/some/dir`` to switch every
iterative operator onto reliable checkpoints — e.g. a long dedup run on
a cluster with spot executors.  Both modes produce identical results
(tests/test_checkpoints.py runs the iterative family under each).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

_ENV = "SPARK_GRAFT_RELIABLE_CHECKPOINT"


def reliable_dir() -> str | None:
    """The configured reliable-checkpoint directory, or None (default:
    executor-local truncation)."""
    return os.environ.get(_ENV) or None


def truncate_lineage(df: DataFrame, eager: bool = True) -> DataFrame:
    """Cut ``df``'s lineage: ``localCheckpoint`` by default, a reliable
    ``checkpoint`` into ``$SPARK_GRAFT_RELIABLE_CHECKPOINT`` when set.

    ``eager=False`` defers materialization to the first action — use it
    when the next loop round immediately consumes the frame anyway.
    """
    target = reliable_dir()
    if target is None:
        return df.localCheckpoint(eager=eager)
    sc = df.sparkSession.sparkContext
    # setCheckpointDir is idempotent for a fixed target; only touch it
    # when unset or pointed elsewhere (the Java side stores a URI).
    current = sc._jsc.sc().getCheckpointDir()
    current_str = current.get() if current.isDefined() else None
    if current_str is None or not current_str.rstrip("/").endswith(
        os.path.abspath(target).rstrip("/").lstrip("/")
    ):
        sc.setCheckpointDir(target)
    return df.checkpoint(eager=eager)
