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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_TYPES = ("not_null", "unique", "range", "in_set", "custom")


def _violation_count(rule: dict) -> Column:
    """The per-rule violation counter, as one aggregate expression."""
    kind = rule.get("type")
    if kind == "not_null":
        return F.count(F.when(F.col(rule["col"]).isNull(), 1))
    if kind == "unique":
        col = rule["col"]
        return F.count(col) - F.countDistinct(col)
    if kind == "range":
        c = F.col(rule["col"])
        cond = F.lit(False)
        if "lo" in rule:
            cond = cond | (c < F.lit(rule["lo"]))
        if "hi" in rule:
            cond = cond | (c > F.lit(rule["hi"]))
        return F.count(F.when(cond, 1))
    if kind == "in_set":
        c = F.col(rule["col"])
        return F.count(F.when(~c.isin(*rule["values"]) | c.isNull(), 1))
    if kind == "custom":
        return F.count(F.when(~F.coalesce(F.expr(rule["expr"]), F.lit(False)), 1))
    raise ValueError(f"expectations: unknown rule type {kind!r}")


def validate_rules(rules: list[dict]) -> None:
    """Loud compile-time validation (no Spark job)."""
    if not rules:
        raise ValueError("expectations: empty rule list")
    seen: set[str] = set()
    for r in rules:
        rid = r.get("id")
        if not rid:
            raise ValueError("expectations: rule without 'id'")
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
