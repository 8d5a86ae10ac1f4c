"""UDF / UDAF / UDTF surface — SURVEY.md §2.11.

The extensibility story: a scalar Python UDF (Arrow-optimized), a
vectorized pandas UDF, a grouped-aggregate pandas UDF, and a Spark 4
Python UDTF.  These exist to prove the escape hatches work; the rest of
the engine deliberately avoids them (built-in Catalyst expressions are
10–100× faster — every UDF here is also oracle-expressible so the
harness can hash-check the Python path against pure SQL).

Scale notes: all four run Arrow-batched (``useArrow=True`` /
``pandas_udf``), so the JVM↔Python boundary transfers columnar batches,
not pickled rows; the grouped-agg UDAF gets Spark's normal two-phase
treatment only for the grouping shuffle (the agg itself is per-group
in Python — keep groups numerous and small, as here: 5 event types).
"""

from __future__ import annotations

import json
import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udf, udtf
from pyspark.sql.types import DoubleType, StringType

from events_to_db_spark.registry import query
from events_to_db_spark.session import load_table


@udf(returnType=StringType(), useArrow=True)
def _norm_type(s: str) -> str | None:
    """lower + collapse internal whitespace + trim."""
    if s is None:
        return None
    return re.sub(r"\s+", " ", s.strip().lower())


@query(
    "q_udf_python",
    oracle="""
    SELECT lower(regexp_replace(trim(p_type), '\\s+', ' ', 'g')) AS norm_type,
           count(*) AS n
    FROM part GROUP BY 1
    """,
)
def q_udf_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar Python UDF (Arrow-optimized): normalize ``p_type`` and
    count per normalized value.  Oracle is the equivalent pure-SQL
    normalization, proving the Python path computes the same function."""
    p = load_table(spark, sf_dir, "part")
    return (
        p.select(_norm_type("p_type").alias("norm_type"))
        .groupBy("norm_type")
        .agg(F.count("*").alias("n"))
    )


@pandas_udf(DoubleType())
def _zscore(v: pd.Series, mean: pd.Series, std: pd.Series) -> pd.Series:
    return (v - mean) / std


@query(
    "q_udf_pandas",
    oracle="""
    SELECT event_id,
           round((value - avg(value) OVER (PARTITION BY event_type))
                 / stddev_samp(value) OVER (PARTITION BY event_type), 4) AS z
    FROM events
    """,
)
def q_udf_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized pandas UDF: z-score of ``value`` within its event
    type.  Group stats come from a broadcast-joined aggregate (the
    Spark-idiomatic way to give a scalar kernel group context); the
    kernel itself is one Arrow-batched vector expression."""
    ev = load_table(spark, sf_dir, "events")
    stats = ev.groupBy("event_type").agg(
        F.avg("value").alias("mu"), F.stddev_samp("value").alias("sigma")
    )
    return ev.join(F.broadcast(stats), "event_type").select(
        "event_id",
        F.round(_zscore("value", "mu", "sigma"), 4).alias("z"),
    )


@pandas_udf(DoubleType())
def _geomean_plus1(v: pd.Series) -> float:
    """Geometric mean of (v+1): exp(mean(ln(v+1))) in float64."""
    import numpy as np

    return float(np.exp(np.log(v.to_numpy(dtype=np.float64) + 1.0).mean()))


@query(
    "q_udaf_grouped",
    oracle="""
    SELECT event_type, round(exp(avg(ln(value + 1))), 4) AS geomean
    FROM events GROUP BY event_type
    """,
)
def q_udaf_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom aggregate via GROUPED_AGG pandas UDF: geometric mean of
    ``value+1`` per event type, hash-checked against the
    ``exp(avg(ln))`` identity in SQL (parity validated in SURVEY §7.5)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(_geomean_plus1("value"), 4).alias("geomean")
    )


@udtf(returnType="k string, v string")
class _JsonKV:
    """Explode a JSON object string into (key, value-as-string) rows —
    AQL's free-form payload flattened relationally."""

    def eval(self, props: str):
        if props is None:
            return
        try:
            obj = json.loads(props)
        except ValueError:
            return
        if isinstance(obj, dict):
            for k in sorted(obj):
                yield k, None if obj[k] is None else str(obj[k])


@query(
    "q_udtf",
    oracle="""
    SELECT t.k AS k, count(*) AS n
    FROM events, unnest(json_keys(props)) AS t(k)
    GROUP BY 1
    """,
)
def q_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark 4) exploding the ``props`` JSON payload into
    key/value rows via LATERAL, counting occurrences per key."""
    ev = load_table(spark, sf_dir, "events")
    spark.udtf.register("json_kv", _JsonKV)
    ev.createOrReplaceTempView("_udtf_events")
    return spark.sql(
        """
        SELECT t.k AS k, count(*) AS n
        FROM _udtf_events, LATERAL json_kv(props) AS t
        GROUP BY t.k
        """
    )


@query(
    "q_udf_ewma",
    oracle="""
    SELECT user_id,
           CAST(len(vs) AS BIGINT) AS n_events,
           round(list_reduce(vs,
                 (acc, x) -> acc * CAST(0.9 AS DOUBLE)
                           + x * CAST(0.1 AS DOUBLE)), 4) AS ewma
    FROM (
        SELECT user_id,
               list(CAST(value AS DOUBLE) ORDER BY ts, event_id) AS vs
        FROM events GROUP BY user_id
    )
    """,
)
def q_udf_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average per user via
    ``applyInPandas`` — the order-dependent recurrence
    (``e ← 0.9·e + 0.1·x`` seeded with the first value) that no
    built-in aggregate expresses, showcasing the custom-stateful-
    kernel escape hatch with a *hash-exact* oracle: both engines fold
    the same float64 sequence left-to-right over the (ts, event_id)
    total order, so every IEEE operation matches bit-for-bit
    (verified: DuckDB ``list_reduce`` ≡ the Python loop).

    Scale: groups are single users (bounded state), Arrow ships
    columnar batches, and the sequential loop is per-group only — the
    exact fold cannot be tree-vectorized without changing float
    summation order and breaking cross-engine parity (§7.5.1)."""
    from pyspark.sql.types import LongType, StructField, StructType

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "value"
    )
    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("n_events", LongType()),
            StructField("ewma", DoubleType()),
        ]
    )

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"])
        v = pdf["value"].to_numpy(dtype="float64")
        acc = float(v[0])
        for x in v[1:]:
            acc = acc * 0.9 + float(x) * 0.1
        return pd.DataFrame(
            {
                "user_id": [int(pdf["user_id"].iloc[0])],
                "n_events": [len(v)],
                "ewma": [acc],
            }
        )

    folded = ev.groupBy("user_id").applyInPandas(fold, schema=out_schema)
    return folded.select(
        "user_id", "n_events", F.round(F.col("ewma"), 4).alias("ewma")
    )


def _iter_score_udf():
    """Iterator-of-series pandas UDF: expensive per-executor init
    (here: a compiled regex standing in for a model/tokenizer load)
    happens ONCE per Python worker, then amortizes across every Arrow
    batch — the API shape for UDFs with heavy setup.  Declared inside
    a builder so module import stays Spark-free."""
    @pandas_udf(DoubleType())
    def score(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        vowels = re.compile(r"[aeiou]+")  # the "expensive" init
        for s in batches:
            toks = s.str.split(" ").str.len().astype("float64")
            vgroups = s.map(
                lambda t: float(len(vowels.findall(t)))
                if t is not None
                else None
            )
            yield vgroups / toks

    return score


@query(
    "q_udf_arrow_iter",
    oracle="""
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN
                    CAST(len(regexp_extract_all(text, '[aeiou]+'))
                         AS DOUBLE)
                    / len(string_split(text, ' ')) > 1.5
               THEN 1 ELSE 0 END) AS BIGINT) AS n_vowel_heavy
    FROM documents
    GROUP BY lang ORDER BY lang
    """,
)
def q_udf_arrow_iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterator-form pandas UDF (``Iterator[pd.Series] →
    Iterator[pd.Series]``): per-worker one-time init amortized over
    Arrow batches — the fourth UDF evaluation mode next to scalar /
    vectorized / grouped-agg (§2.11).  The score (vowel groups per
    token) is per-row float from exact counts, thresholded before
    aggregation, so the Python path hash-checks against the pure-SQL
    oracle."""
    d = load_table(spark, sf_dir, "documents")
    score = _iter_score_udf()
    return (
        d.select("lang", score(F.col("text")).alias("s"))
        .groupBy("lang")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(F.when(F.col("s") > 1.5, 1).otherwise(0))
            .cast("long")
            .alias("n_vowel_heavy"),
        )
        .orderBy("lang")
    )


class _SessionSplit:
    """UDTF with a TABLE argument (Spark 4 polymorphic input): receives
    one user's events as ordered rows (PARTITION BY user_id ORDER BY
    ts), splits on >30-minute gaps, emits one row per session."""

    def __init__(self):
        self._rows: list[tuple[int, int]] = []
        self._uid: int | None = None

    def eval(self, row):
        self._uid = row.user_id
        self._rows.append((row.us, row.vc))

    def terminate(self):
        if not self._rows:
            return
        gap_us = 30 * 60 * 1_000_000
        start = self._rows[0][0]
        n, total = 0, 0
        prev = None
        for us, vc in self._rows:
            if prev is not None and us - prev > gap_us:
                yield (self._uid, start, n, total)
                start, n, total = us, 0, 0
            n += 1
            total += int(vc)
            prev = us
        yield (self._uid, start, n, total)


@query(
    "q_udtf_table",
    oracle="""
    WITH marked AS (
        SELECT user_id,
               epoch_us(ts) AS us,
               CAST(round(value*100) AS BIGINT) AS vc,
               CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w
                         > 1800000000
                    THEN 1 ELSE 0 END AS brk
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
        SELECT user_id, us, vc,
               sum(brk) OVER (PARTITION BY user_id ORDER BY us
                              ROWS UNBOUNDED PRECEDING) AS sid
        FROM marked
    )
    SELECT user_id,
           CAST(min(us) AS BIGINT) AS session_start_us,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(vc) AS BIGINT) AS total_c
    FROM sess
    GROUP BY user_id, sid
    ORDER BY user_id, session_start_us
    """,
)
def q_udtf_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF over a TABLE argument (Spark 4): the engine feeds
    each user's ordered events into one UDTF instance (`PARTITION BY
    user_id ORDER BY ts, event_id`), which splits on 30-minute gaps
    and emits session summaries — the polymorphic-input surface that
    turns a UDTF into a custom *grouped* operator, next to
    ``q_udtf``'s scalar LATERAL form.

    The per-user fold is exact integer arithmetic (µs timestamps,
    value cents), so the gaps-and-islands oracle hash-matches.  Scale:
    one shuffle on user_id; UDTF state is a single user's rows.
    """
    from pyspark.sql.functions import udtf as _udtf

    ev = load_table(spark, sf_dir, "events")
    ev.selectExpr(
        "user_id",
        "unix_micros(ts) AS us",
        "event_id",
        "CAST(round(value*100) AS BIGINT) AS vc",
    ).createOrReplaceTempView("_udtf_sess_in")
    wrapped = _udtf(
        _SessionSplit,
        returnType="user_id BIGINT, session_start_us BIGINT,"
        " n_events BIGINT, total_c BIGINT",
    )
    spark.udtf.register("session_split", wrapped)
    return spark.sql(
        """
        SELECT t.user_id, t.session_start_us, t.n_events, t.total_c
        FROM session_split(
            TABLE(SELECT * FROM _udtf_sess_in)
            PARTITION BY user_id ORDER BY (us, event_id)
        ) AS t
        ORDER BY user_id, session_start_us
        """
    )


@query(
    "q_udf_arrow_batch",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round(value*100) AS BIGINT)
                    * (CASE WHEN user_id % 2 = 0 THEN 2 ELSE 1 END))
               AS BIGINT) AS weighted_c
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q_udf_arrow_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``mapInArrow`` — the RecordBatch-level Python surface (5th UDF
    mode beside row UDF / pandas UDF / iterator pandas UDF / UDTF):
    the kernel receives raw ``pyarrow.RecordBatch``es and computes
    with ``pyarrow.compute`` vector ops — no pandas materialization,
    no per-row Python, zero-copy on the Arrow buffers.

    The kernel derives exact value cents and a parity weight per row
    (pure per-row integer math → deterministic under any batching);
    Spark aggregates the result, and the oracle restates the whole
    thing in SQL.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    def kernel(batches):
        for b in batches:
            cents = pc.cast(pc.round(pc.multiply(b.column("value"), 100.0)), "int64")
            weight = pc.add(
                pc.cast(pc.equal(pc.bit_wise_and(b.column("user_id"), 1), 0), "int64"),
                1,
            )
            yield pa.record_batch(
                [b.column("event_type"), pc.multiply(cents, weight)],
                names=["event_type", "wc"],
            )

    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id", "value")
    out = ev.mapInArrow(kernel, "event_type STRING, wc BIGINT")
    return (
        out.groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum("wc").cast("bigint").alias("weighted_c"),
        )
        .orderBy("event_type")
    )


def _clamped_fold_stream(batches):
    """Per-user token-bucket fold as a STREAMING scan over the
    partition's Arrow batches (VERDICT r09 #7 — the bounded-memory
    form of the former per-key ``applyInPandas``): balance += delta,
    clamped to [0, 100000] cents, counting both clamp events.
    Non-associative (clamping destroys partial-aggregate
    mergeability), so this is the genuinely stateful scan windows
    cannot express.

    Memory contract: the caller repartitions by user and sorts WITHIN
    partitions by (user_id, ts, event_id) — Spark's sort spills to
    disk, and this fold then carries (bal, lo, hi) across Arrow-batch
    and key boundaries, so a single user's history NEVER has to fit
    one worker's Arrow batch (working set = maxRecordsPerBatch, not
    max key history).  Exact int64 arithmetic throughout; one output
    row per user, flushed on key change / end of partition."""
    cur = None
    bal = lo = hi = n = 0
    out: list[tuple] = []

    def flush() -> None:
        out.append((cur, n, bal, lo, hi))

    def drain() -> pd.DataFrame:
        users, n_ops, bals, los, his = zip(*out)
        out.clear()
        return pd.DataFrame(
            {
                "user_id": list(users),
                "n_ops": list(n_ops),
                "final_balance_cents": list(bals),
                "n_clamped_low": list(los),
                "n_clamped_high": list(his),
            }
        )

    for pdf in batches:
        for u, d in zip(
            pdf["user_id"].to_numpy(), pdf["delta"].to_numpy()
        ):
            if cur is None or u != cur:
                if cur is not None:
                    flush()
                cur = int(u)
                bal = lo = hi = n = 0
            b = bal + int(d)
            if b < 0:
                lo += 1
                b = 0
            elif b > 100000:
                hi += 1
                b = 100000
            bal = b
            n += 1
        if len(out) >= 10_000:  # bound the result buffer too
            yield drain()
    if cur is not None:
        flush()
    if out:
        yield drain()


@query(
    "q_ev_clamped_balance",
    oracle="""
    WITH RECURSIVE ops AS (
        SELECT user_id,
               CASE WHEN event_type = 'purchase'
                    THEN CAST(round(value * 100) AS BIGINT)
                    ELSE CAST(-500 AS BIGINT) END AS delta,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM events WHERE event_type IN ('purchase', 'click')
    ),
    fold AS (
        SELECT user_id, CAST(0 AS BIGINT) AS rn, CAST(0 AS BIGINT) AS bal,
               CAST(0 AS BIGINT) AS n_lo, CAST(0 AS BIGINT) AS n_hi
        FROM (SELECT DISTINCT user_id FROM ops)
      UNION ALL
        SELECT f.user_id, f.rn + 1,
               greatest(CAST(0 AS BIGINT),
                        least(CAST(100000 AS BIGINT), f.bal + o.delta)),
               f.n_lo + CASE WHEN f.bal + o.delta < 0 THEN 1 ELSE 0 END,
               f.n_hi + CASE WHEN f.bal + o.delta > 100000 THEN 1 ELSE 0 END
        FROM fold f JOIN ops o
          ON o.user_id = f.user_id AND o.rn = f.rn + 1
    )
    SELECT f.user_id, f.rn AS n_ops, f.bal AS final_balance_cents,
           f.n_lo AS n_clamped_low, f.n_hi AS n_clamped_high
    FROM fold f
    JOIN (SELECT user_id, max(rn) AS mrn FROM fold GROUP BY user_id) m
      ON m.user_id = f.user_id AND f.rn = m.mrn
    """,
)
def q_ev_clamped_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clamped running balance (token bucket / inventory stock): per
    user, purchases deposit their cents and clicks drain a flat 500,
    with the balance clamped to [0, 100 000] after every op.  Clamping
    makes the fold NON-associative — no window frame or two-level
    prefix scan can express it — so this is the canonical custom
    stateful operator.

    Scale posture (r10, VERDICT r09 #7): repartition by user, sort
    WITHIN partitions by (user_id, ts, event_id) — Spark's sort is
    disk-spilling — then STREAM the fold through the partition's
    Arrow batches with ``mapInPandas``, carrying state across batch
    and key boundaries.  Unlike the former per-key ``applyInPandas``
    (which materialized one user's ENTIRE history as a single pandas
    frame: per-key-unbounded worker memory), a single hot key's
    history never has to fit anywhere — the working set is one Arrow
    batch (spark.sql.execution.arrow.maxRecordsPerBatch), period.
    Embarrassingly parallel across users; the same per-row kernel
    drops into ``applyInPandasWithState`` for streaming.

    Determinism: exact integer cents, (ts, event_id) total order, and
    the DuckDB oracle replays the identical fold as a recursive-CTE
    fixpoint — an engine-independent second opinion on every
    intermediate clamp (not just the final state)."""
    ev = load_table(spark, sf_dir, "events")
    ops = ev.where(F.col("event_type").isin("purchase", "click")).select(
        "user_id",
        "ts",
        "event_id",
        F.when(
            F.col("event_type") == "purchase",
            F.expr("CAST(round(value * 100) AS BIGINT)"),
        )
        .otherwise(F.lit(-500).cast("bigint"))
        .alias("delta"),
    )
    return (
        ops.repartition("user_id")
        .sortWithinPartitions("user_id", "ts", "event_id")
        .mapInPandas(
            _clamped_fold_stream,
            "user_id long, n_ops long, final_balance_cents long, "
            "n_clamped_low long, n_clamped_high long",
        )
    )
