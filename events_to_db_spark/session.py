"""SparkSession construction and table loading.

This is the single place that knows about:

* the runtime SQL confs every query needs (UTC session timezone for
  hash-parity with the DuckDB oracle, the ``nanosAsLong`` shim for the
  ns-resolution ``events.parquet``, AQE) — applied defensively via
  :func:`configure` on *any* session handed to us (the driver builds its
  own session; all confs used here are runtime-settable, verified on
  Spark 4.1.2);
* the testdata layout (``{sf_dir}/{table}.parquet``, TESTDATA.md);
* the events-table ingest shim: Parquet stores ``ts`` as
  TIMESTAMP(NANOS), which Spark 4.1's vectorized reader rejects
  ([PARQUET_TYPE_ILLEGAL]).  With ``spark.sql.legacy.parquet.nanosAsLong``
  the column arrives as a LONG of nanoseconds; the data's true
  resolution is microseconds (verified: ns digits are zero), so
  ``timestamp_micros(ns / 1000)`` is a lossless conversion and stays
  hash-compatible with DuckDB reading the same file natively.
  See SURVEY.md §1.2.

Scale posture (SURVEY.md §7.4): ``load_table`` returns a plain lazy
DataFrame over Parquet — no collect, no caching policy baked in — so the
same code runs unchanged on a 1000-executor cluster where each table is
thousands of splits.  Catalyst predicate pushdown / column pruning apply
to every downstream query because the scan is declared, not materialized.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: All tables the driver generates (TESTDATA.md) and registers as
#: DuckDB oracle views under the same names.
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Runtime-settable confs required for correctness / oracle hash-parity.
#: Applied idempotently to whatever session executes a query.
RUNTIME_CONFS = {
    # Hash parity for any date/time arithmetic vs DuckDB's UTC-naive ts.
    "spark.sql.session.timeZone": "UTC",
    # events.parquet stores TIMESTAMP(NANOS); read as long-of-ns.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Runtime re-planning: partition coalescing, skew-join splitting.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    # Arrow transfer for toPandas / pandas_udf kernels.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
}


def configure(spark: SparkSession) -> SparkSession:
    """Apply the runtime confs to an existing session (idempotent)."""
    for key, value in RUNTIME_CONFS.items():
        try:
            if spark.conf.get(key, None) != value:
                spark.conf.set(key, value)
        except Exception:
            # Conf not recognized / not settable on this build — queries
            # that don't need it still run.
            pass
    return spark


def get_spark(
    app_name: str = "events-to-db-spark",
    cpus: int | None = None,
    extra_confs: dict | None = None,
) -> SparkSession:
    """Build a local session for tests / bench.

    ``cpus`` defaults to ``$SPARK_GRAFT_CPUS`` (driver contract) else all
    cores.  On a real cluster the caller provides their own session and
    only :func:`configure` runs — nothing here assumes local mode.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", 0)) or os.cpu_count() or 4
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", str(max(int(cpus), 8)))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
    )
    for key, value in RUNTIME_CONFS.items():
        builder = builder.config(key, value)
    for key, value in (extra_confs or {}).items():
        builder = builder.config(key, value)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return configure(spark)


def normalize_events_ts(df: DataFrame) -> DataFrame:
    """The events ``ts`` ingest shim — normalize every physical flavor
    the driver's testdata has shipped to one LTZ µs timestamp."""
    ts_type = dict(df.dtypes).get("ts")
    if ts_type == "bigint":
        # TIMESTAMP(NANOS) parquet + nanosAsLong: ns-of-epoch long ->
        # microsecond timestamp (lossless; data is µs).  Integer
        # division is load-bearing: float division of ~1.7e18 ns
        # exceeds double's 53-bit mantissa and corrupts the µs digit.
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    elif ts_type == "timestamp_ntz":
        # TIMESTAMP(MICROS, isAdjustedToUTC=false) parquet arrives as
        # NTZ.  The engine-wide invariant (and what unix_micros &
        # friends require) is an LTZ timestamp; with the UTC session
        # timezone this cast is a lossless reinterpretation that
        # matches DuckDB's UTC-naive reading of the same file.
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table, applying the events ingest shim."""
    configure(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        df = normalize_events_ts(df)
    return df


def load_sf(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every table; also registers each as a temp view so queries
    can be written in either the DataFrame or SQL API."""
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
