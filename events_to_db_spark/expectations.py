"""Declarative data-quality expectations — rules as config, one scan.

The ETL runner (etl.py) copies events into tables; this module is the
check a pipeline runs on the result: a list of RULE dicts compiles to
ONE aggregation pass returning per-rule violation counts — the
Great-Expectations-style suite, reduced to its engine-shaped core
(everything is a conditional count inside a single hash aggregate, so
a 100-rule suite over 100 TB costs one scan, not 100).

Rule schema::

    {"id": "price_range", "type": "range", "col": "o_totalprice",
     "lo": 0, "hi": 600000}

Types: ``not_null`` | ``unique`` (over non-null values) | ``range``
(inclusive bounds; either side optional) | ``in_set`` | ``custom``
(a SQL boolean expression; NULL counts as a violation — SQL's
three-valued logic must not let an expectation pass by returning
NULL).  Unknown types and missing fields fail at COMPILE time, before
any job runs.

The result is a DataFrame (rule_id, n_rows, violations, ok) built by
unpivoting the single aggregate row — rule count never changes the
number of data passes.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_TYPES = ("not_null", "unique", "range", "in_set", "custom")

#: Rule ids are spliced into a ``stack(...)`` expression as string
#: literals — restrict them so an id can never break (or inject into)
#: the generated SQL.
_ID_RE = re.compile(r"^[A-Za-z0-9_.\-]+$")


def _violation_row_cond(rule: dict) -> Column:
    """Per-ROW violation predicate — the quarantine marker.  ``unique``
    has no per-row form (a duplicate is a property of the pair), so it
    is aggregate-only."""
    kind = rule.get("type")
    if kind == "not_null":
        return F.col(rule["col"]).isNull()
    if kind == "range":
        c = F.col(rule["col"])
        cond = F.lit(False)
        if "lo" in rule:
            cond = cond | (c < F.lit(rule["lo"]))
        if "hi" in rule:
            cond = cond | (c > F.lit(rule["hi"]))
        return cond
    if kind == "in_set":
        c = F.col(rule["col"])
        return ~c.isin(*rule["values"]) | c.isNull()
    if kind == "custom":
        return ~F.coalesce(F.expr(rule["expr"]), F.lit(False))
    raise ValueError(
        f"expectations: rule type {kind!r} has no per-row violation form"
    )


def _violation_count(rule: dict) -> Column:
    """The per-rule violation counter, as one aggregate expression."""
    kind = rule.get("type")
    if kind == "unique":
        col = rule["col"]
        return F.count(col) - F.countDistinct(col)
    return F.count(F.when(_violation_row_cond(rule), 1))


def validate_rules(rules: list[dict]) -> None:
    """Loud compile-time validation (no Spark job)."""
    if not rules:
        raise ValueError("expectations: empty rule list")
    seen: set[str] = set()
    for r in rules:
        rid = r.get("id")
        if not rid:
            raise ValueError("expectations: rule without 'id'")
        if not _ID_RE.match(rid):
            raise ValueError(
                f"expectations: rule id {rid!r} must match [A-Za-z0-9_.-]+"
            )
        if rid in seen:
            raise ValueError(f"expectations: duplicate rule id {rid!r}")
        seen.add(rid)
        kind = r.get("type")
        if kind not in _TYPES:
            raise ValueError(
                f"expectations: rule {rid!r} has unknown type {kind!r}"
            )
        if kind == "custom":
            if "expr" not in r:
                raise ValueError(f"expectations: rule {rid!r} needs 'expr'")
        elif "col" not in r:
            raise ValueError(f"expectations: rule {rid!r} needs 'col'")
        if kind == "range" and not ({"lo", "hi"} & r.keys()):
            raise ValueError(
                f"expectations: range rule {rid!r} needs 'lo' and/or 'hi'"
            )
        if kind == "in_set" and not r.get("values"):
            raise ValueError(
                f"expectations: in_set rule {rid!r} needs 'values'"
            )


def run_expectations(df: DataFrame, rules: list[dict]) -> DataFrame:
    """Compile the suite to ONE aggregate over ``df`` and unpivot to
    (rule_id, n_rows, violations, ok) rows — rule order preserved."""
    validate_rules(rules)
    one = df.agg(
        F.count(F.lit(1)).alias("__n"),
        *[
            _violation_count(r).cast("long").alias(f"__v{i}")
            for i, r in enumerate(rules)
        ],
    )
    stack = ", ".join(
        f"'{r['id']}', __v{i}" for i, r in enumerate(rules)
    )
    return one.selectExpr(
        f"stack({len(rules)}, {stack}) AS (rule_id, violations)", "__n"
    ).select(
        "rule_id",
        F.col("__n").alias("n_rows"),
        "violations",
        (F.col("violations") == 0).alias("ok"),
    )


def expectations_foreach_batch(
    db_path: str, table: str, rules: list[dict], quarantine: bool = False
):
    """Streaming data-quality monitor: fold each micro-batch's per-rule
    (n_rows, violations) into running totals, exactly once — the DQ
    counter a live events-to-db copy (etl.py) keeps beside the data.

    Per batch the suite costs its usual single aggregate (|rules| rows
    reach the driver, never events); the merge and the batch-id record
    commit in ONE transaction (the additive-sink idempotency pattern,
    streaming/sink.py), so redelivered batches are skipped and a crash
    between write and commit replays cleanly.

    ``quarantine=True`` (VERDICT r06 #5) additionally routes every
    VIOLATING ROW to ``<table>__quarantine`` — (batch_id, violated
    rule-id list, the row as JSON) — in the SAME transaction as the
    counter merge, so a DQ failure is inspectable, not just countable,
    and the batch-id guard gives the quarantine the same exactly-once
    posture (a redelivered batch re-quarantines nothing).  The row
    pass shares the persisted batch with the counter pass; quarantined
    rows are collected to the driver, which is the right bound for a
    DQ side-channel (violations are the exception, not the stream —
    a firehose of violations is a pipeline bug the counters surface).

    ``unique`` rules are REJECTED here: distinct counts are not
    additive across micro-batches (a cross-batch duplicate would never
    be seen) — uniqueness on a stream belongs to the keyed-upsert sink
    or a batch audit over the landed table, and a silently-wrong
    counter is worse than a loud error."""
    validate_rules(rules)
    for r in rules:
        if r["type"] == "unique":
            raise ValueError(
                f"expectations: rule {r['id']!r} is 'unique' — distinct "
                "counts are not additive across micro-batches; audit "
                "uniqueness on the landed table instead"
            )

    def write(batch_df, batch_id: int) -> None:
        from events_to_db_spark.streaming.sink import _connect

        if quarantine:
            batch_df.persist()
        try:
            part = run_expectations(batch_df, rules).collect()
            qrows = []
            if quarantine:
                marked = batch_df.withColumn(
                    "__viol",
                    F.array_compact(
                        F.array(
                            *[
                                F.when(
                                    _violation_row_cond(r), F.lit(r["id"])
                                )
                                for r in rules
                            ]
                        )
                    ),
                ).filter(F.size("__viol") > 0)
                qrows = marked.select(
                    F.array_join("__viol", ",").alias("violated"),
                    F.to_json(
                        F.struct(*[F.col(c) for c in batch_df.columns])
                    ).alias("row_json"),
                ).collect()
        finally:
            if quarantine:
                batch_df.unpersist()
        con = _connect(db_path)
        try:
            con.execute("BEGIN IMMEDIATE")
            con.execute(
                f'CREATE TABLE IF NOT EXISTS "{table}" '
                "(rule_id TEXT PRIMARY KEY, n_rows INTEGER, "
                "violations INTEGER)"
            )
            con.execute(
                f'CREATE TABLE IF NOT EXISTS "{table}__batches" '
                "(batch_id INTEGER PRIMARY KEY)"
            )
            if quarantine:
                con.execute(
                    f'CREATE TABLE IF NOT EXISTS "{table}__quarantine" '
                    "(batch_id INTEGER, violated TEXT, row_json TEXT)"
                )
            already = con.execute(
                f'SELECT 1 FROM "{table}__batches" WHERE batch_id = ?',
                (batch_id,),
            ).fetchone()
            if already is None:
                for row in part:
                    con.execute(
                        f'INSERT INTO "{table}" '
                        "(rule_id, n_rows, violations) VALUES (?, ?, ?) "
                        "ON CONFLICT (rule_id) DO UPDATE SET "
                        "n_rows = n_rows + excluded.n_rows, "
                        "violations = violations + excluded.violations",
                        (row["rule_id"], row["n_rows"], row["violations"]),
                    )
                if quarantine:
                    con.executemany(
                        f'INSERT INTO "{table}__quarantine" '
                        "(batch_id, violated, row_json) VALUES (?, ?, ?)",
                        [
                            (batch_id, r["violated"], r["row_json"])
                            for r in qrows
                        ],
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
