"""Round-2 operator tests: the scale machinery behind the new contract
queries — two-level running max, SNM ranking, IVF recall — verified
against brute-force formulations on real testdata (the oracle parity
itself is covered by tests/test_contract.py + tools/check.py)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from events_to_db_spark.plans.prefix import bucketed_running_max, bucketed_running_sum
from events_to_db_spark.session import load_table
from tests.conftest import SF_SMOKE


def test_bucketed_running_max_matches_global_window(spark):
    """The two-level running max equals the single-partition global
    window on the real events table (1k rows at sf0.001), including
    the first-bucket no-carry edge."""
    ev = load_table(spark, SF_SMOKE, "events").select(
        "event_id", F.unix_micros("ts").alias("us")
    )
    # Shuffled order: hash of event_id, bucketed by its top bits.
    ak = F.expr(
        "cast(conv(substr(md5(cast(cast(event_id as string) as binary)),"
        " 1, 15), 16, 10) as bigint)"
    )
    d = ev.withColumn("ak", ak)
    fast = bucketed_running_max(
        d,
        bucket=F.shiftright(F.col("ak"), 55),
        order_cols=[F.col("ak")],
        value=F.col("us"),
        out="rmax",
    )
    w = Window.orderBy("ak").rowsBetween(Window.unboundedPreceding, 0)
    slow = d.withColumn("rmax", F.max("us").over(w))
    assert (
        fast.select("event_id", "rmax")
        .exceptAll(slow.select("event_id", "rmax"))
        .count()
        == 0
    )
    assert fast.count() == slow.count()


def test_bucketed_rank_is_dense_and_order_aligned(spark):
    """The SNM global rank (bucketed prefix sum of 1) is a permutation
    of 1..n consistent with the (lang, text, doc_id) sort order."""
    d = load_table(spark, SF_SMOKE, "documents").select(
        "doc_id", "lang", "text"
    )
    ranked = bucketed_running_sum(
        d,
        bucket=F.concat_ws("|", "lang", F.substring("text", 1, 2)),
        order_cols=[F.col("lang"), F.col("text"), F.col("doc_id")],
        sums={"rk": F.lit(1)},
    )
    rows = ranked.orderBy("lang", "text", "doc_id").select("rk").collect()
    assert [r.rk for r in rows] == list(range(1, len(rows) + 1))


def test_ivf_recall_vs_exact(spark):
    """IVF with nprobe=2 of 8 cells must beat the scanned fraction
    (2/8 = 25 %) by a clear margin against the brute-force integer-dot
    baseline.  Ceiling caveat: these embeddings are near-random (max
    pairwise cosine 0.513 — FIXTURES.md), so no coarse quantizer finds
    real cluster structure; measured ≈ 0.5 with one Lloyd iteration.
    On clustered data the same layout reaches the usual 0.9+."""
    from events_to_db_spark.operators.curation_ops import q_sim_ivf

    emb = load_table(spark, SF_SMOKE, "embeddings")
    q = emb.select(
        "vec_id",
        F.expr(
            "transform(embedding,"
            " x -> cast(round(cast(x as double) * 1000) as bigint))"
        ).alias("qv"),
    )
    a = q.select(F.col("vec_id").alias("a_id"), F.col("qv").alias("a_qv"))
    b = q.select(F.col("vec_id").alias("b_id"), F.col("qv").alias("b_qv"))
    dot = F.expr(
        "aggregate(zip_with(a_qv, b_qv, (x, y) -> x * y), 0L,"
        " (acc, v) -> acc + v)"
    )
    w = Window.partitionBy("a_id").orderBy(
        F.col("score").desc(), F.col("b_id")
    )
    exact = (
        a.crossJoin(b)
        .filter(F.col("a_id") != F.col("b_id"))
        .select("a_id", "b_id", dot.alias("score"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(F.col("a_id").alias("vec_id"), F.col("b_id").alias("true_nn"))
    )
    approx = q_sim_ivf(spark, SF_SMOKE).select("vec_id", "nn_id")
    joined = exact.join(approx, "vec_id")
    total = joined.count()
    hits = joined.filter(F.col("nn_id") == F.col("true_nn")).count()
    assert total > 0
    recall = hits / total
    assert recall >= 0.4, f"IVF recall {recall:.2f} below floor"


def test_compress_ratio_invariants(spark):
    """q_text_compress has no SQL oracle; pin the kernel's invariants:
    ratios are positive and near-or-below 1 (zlib's ~11-byte header can
    push very short docs slightly over), and a highly repetitive text
    compresses strictly better than the corpus average."""
    import zlib

    from events_to_db_spark.operators.curation_ops import q_text_compress

    rows = {r.lang: r for r in q_text_compress(spark, SF_SMOKE).collect()}
    assert rows, "no output"
    for r in rows.values():
        assert 0.0 < r.min_ratio <= r.avg_ratio <= r.max_ratio <= 1.2

    rep = ("key agg " * 200).encode()
    rep_ratio = len(zlib.compress(rep, 6)) / len(rep)
    assert all(rep_ratio < r.avg_ratio for r in rows.values())


def test_twap_bounded_by_min_max(spark):
    """TWAP is a convex combination of observed values, so it must lie
    within [min, max] of each user's values (checked on real data)."""
    from events_to_db_spark.operators.temporal_ops import q_ev_timeweighted

    ev = load_table(spark, SF_SMOKE, "events")
    bounds = ev.groupBy("user_id").agg(
        F.min("value").alias("lo"), F.max("value").alias("hi")
    )
    twap = q_ev_timeweighted(spark, SF_SMOKE)
    bad = (
        twap.join(bounds, "user_id")
        .filter(
            (F.col("twap") < F.col("lo") - 1e-9)
            | (F.col("twap") > F.col("hi") + 1e-9)
        )
        .count()
    )
    assert bad == 0


def test_psi_zero_on_identical_halves(spark):
    """PSI of a distribution against itself is exactly 0 — feed the
    drift query a symmetric split by duplicating one half."""
    from pyspark.sql import functions as SF

    ev = load_table(spark, SF_SMOKE, "events").limit(400)
    # Same rows in both periods: first half as-is (period a via ts),
    # plus a copy shifted past the cut (period b) — distributions equal.
    a = ev.withColumn("ts", SF.lit("2024-01-10 00:00:00").cast("timestamp"))
    b = ev.withColumn("ts", SF.lit("2024-01-20 00:00:00").cast("timestamp"))
    both = a.unionByName(b)
    both.createOrReplaceTempView("_psi_fixture")

    binned = both.select(
        "event_type",
        SF.least(SF.floor(SF.col("value") / 50).cast("long"), SF.lit(9)).alias("bin"),
        SF.when(SF.col("ts") < SF.lit("2024-01-16 00:00:00").cast("timestamp"), 1)
        .otherwise(0)
        .alias("in_a"),
    )
    counts = binned.groupBy("event_type", "bin").agg(
        SF.sum("in_a").alias("ca"), SF.sum(1 - SF.col("in_a")).alias("cb")
    )
    mism = counts.filter(SF.col("ca") != SF.col("cb")).count()
    assert mism == 0  # identical histograms => PSI term-by-term zero


def test_retention_day0_is_total(spark):
    """Every user is active on their own first day: k=0 retention must
    be exactly 1.0 and n_active must equal the user count."""
    from events_to_db_spark.operators.temporal_ops import q_ev_retention_curve

    ev = load_table(spark, SF_SMOKE, "events")
    n_users = ev.select("user_id").distinct().count()
    rows = {r.k: r for r in q_ev_retention_curve(spark, SF_SMOKE).collect()}
    assert rows[0].n_active == n_users
    assert abs(rows[0].retention - 1.0) < 1e-9


def _window_groups(line: str) -> list[str]:
    """Top-level [...] groups after the Window node name.  Partitioned+
    ordered windows print three ([exprs], [partition], [order]);
    partition-only print two ([exprs], [partition]); partition-less
    print two ([exprs], [order]) — the last group then contains an
    ASC/DESC sort direction."""
    idx = line.index("Window ") + len("Window ")
    depth = 0
    groups: list[str] = []
    buf: list[str] = []
    for ch in line[idx:]:
        if ch == "[":
            if depth == 0:
                buf = []
            depth += 1
            if depth == 1:
                continue
        elif ch == "]":
            depth -= 1
            if depth == 0:
                groups.append("".join(buf))
                continue
        if depth >= 1:
            buf.append(ch)
    return groups


def _is_unpartitioned_window(line: str) -> bool:
    groups = _window_groups(line)
    return len(groups) == 2 and (
        " ASC" in groups[-1] or " DESC" in groups[-1]
    )


def test_no_unpartitioned_window_in_round2_plans(spark):
    """The round-2 global-order operators (watermark sweep, SNM rank,
    LOCF/interp resampling) must not plan a single-partition
    WindowExec: every Window node in their physical plans carries a
    partition clause (three bracket groups, not two)."""
    from events_to_db_spark.operators.curation_ops import q_dedup_snm
    from events_to_db_spark.operators.temporal_ops import (
        q_ev_interpolate,
        q_ev_late,
        q_ev_resample,
    )

    for fn in (q_ev_late, q_dedup_snm, q_ev_resample, q_ev_interpolate):
        plan = fn(spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()
        win_lines = [
            ln for ln in plan.splitlines() if "Window [" in ln
        ]
        assert win_lines, f"{fn.__name__}: expected Window nodes in plan"
        for ln in win_lines:
            assert not _is_unpartitioned_window(ln), (
                f"unpartitioned window in {fn.__name__}: {ln.strip()[:160]}"
            )


def test_unpartitioned_windows_are_allowlisted(spark):
    """Whole-registry window-partitioning audit: a partition-less
    WindowExec funnels every row through ONE task, so it is allowed
    only where the window input is provably bounded (calendar days,
    the tokenizer vocabulary, a fixed grid, an ordered LIMIT's output).
    Any new query that plans a global window over an unbounded keyspace
    must either restructure (see plans/prefix.py) or justify itself
    here."""
    import __spark_entry__ as e

    # query id -> why a global window is bounded there.
    allowed = {
        "q_win_frame_rows": "window over per-day aggregate (calendar-bounded)",
        "q_win_movmedian": "window over per-day aggregate (calendar-bounded)",
        "q_ev_newusers": "running sum over per-day aggregate (calendar-bounded)",
        "q_text_zipf": "rank over token vocabulary (bounded dictionary)",
        "q_text_pmi": "argmax over vocabulary-pair aggregate (bounded)",
        "q_ev_replay": "row_number over TakeOrderedAndProject's 100 rows",
        "q_ev_rfm": "ntile over the 16-cell R×F grid (fixed)",
        "q_agg_gini": "rank within segment after per-segment aggregate; segment dimension fixed",
        "q_ev_pareto": "cumulative share over bucketed per-user prefix aggregate",
        "q_ev_concurrency": "per-day sweep re-aggregate (calendar-bounded)",
        "q_ev_survival": "KM curve over per-lifespan-day aggregate (calendar-bounded)",
        "q_stat_runs": "lag over per-day aggregate (calendar-bounded)",
        "q_stat_bootstrap": "row_number over the 64 bootstrap resample means (fixed B)",
        "q_win_rolling_corr": "rolling moments over per-day aggregate (calendar-bounded)",
        "q_sort_nulls": "NULL-placement ranks over the supplier dimension (bounded); fact-scale ranks go via plans/prefix.py",
        "q_sketch_kmv_union": "bottom-k over the threshold-filtered survivor set (expected ~4k = 128 rows by construction)",
        "q_ev_hazard": "suffix sum over the gap-bucket aggregate (capped at 13 rows by the least(...,12) bucket clamp)",
        "q_stat_fdr": "BH rank over the 35-cell type×dow aggregate (fixed m)",
        "q_text_stopword_curve": "rank + cumsum over TakeOrderedAndProject's 20 rows (k-bounded)",
        "q_ml_lift": "cumulative over the 10-row decile aggregate (fixed); user ranks go via plans/prefix.py",
        "q_sim_rrf": "row_number over each ordered LIMIT-20 signal window (k-bounded by _RRF_WINDOW)",
        "q_ml_isotonic": "prefix sums over the 11-row score-bucket aggregate (capped by least(...,10))",
        "q_ir_rbo": "row_number over each ordered LIMIT-10 term ranking (k-bounded)",
        "q_ir_tau": "row_number over each ordered LIMIT-10 term ranking (k-bounded)",
        "q_ml_smape": "lag windows over per-day revenue aggregate (calendar-bounded)",
        "q_stat_wilcoxon": "signed-rank over the ~23-row paired-day series (calendar-bounded)",
        "q_stat_page": "hypothesized-order rank over the k-row type aggregate (fixed dimension)",
        "q_ev_hill": "row_number over TakeOrderedAndProject's 101 rows (k-bounded)",
        "q_ord_newsvendor": "fractile rank over the per-day demand aggregate (calendar-bounded)",
        "q_ml_qini": "cumulative over the 10-row decile aggregate (fixed); user ranks go via plans/prefix.py",
        "q_stat_pettitt": "ranks + prefix over per-day aggregate (calendar-bounded)",
        "q_stat_coxstuart": "row_number over per-day aggregate (calendar-bounded)",
        "q_ev_logrank": "O-E/V prefixes over conversion-day aggregate (calendar-bounded)",
        "q_ev_nelson_aalen": "hazard prefix over per-lifespan-day aggregate (calendar-bounded)",
        "q_ev_rmst": "KM-area prefixes over per-lifespan-day aggregate (calendar-bounded)",
        "q_ord_croston": "dyadic-fold prefixes over the demand-day aggregate (calendar-bounded)",
        "q_win_sortino": "lag + running max over per-day aggregate (calendar-bounded)",
        "q_ev_bass": "cumulative-adopter prefix over per-day aggregate (calendar-bounded)",
        "q_stat_cmh": "E/V prefixes over the fixed 7-row dow stratum table",
        "q_ev_km_ci": "KM + Greenwood prefixes over per-lifespan-day aggregate (calendar-bounded)",
        "q_win_twr": "lag over per-day aggregate (calendar-bounded)",
        "q_stat_jackknife": "replicate prefixes over per-day aggregate (calendar-bounded)",
        "q_ml_davies_bouldin": "row_number over the 3-row seed LIMIT (k-bounded)",
        "q_ev_time_concentration": "revenue rank over per-day aggregate (calendar-bounded)",
        "q_alloc_apportion": "remainder rank over the bounded event-type dictionary",
        "q_stat_meta": "weighted-sum prefixes over the fixed 7-row dow stratum table",
    }
    offenders: dict[str, list[str]] = {}
    for name, fn in sorted(e.queries().items()):
        plan = fn(spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()
        bad = [
            ln.strip()[:120]
            for ln in plan.splitlines()
            if "Window [" in ln and _is_unpartitioned_window(ln)
        ]
        if bad and name not in allowed:
            offenders[name] = bad
    assert not offenders, f"unpartitioned windows outside allowlist: {offenders}"


def test_kmeans_partition_sizes_and_inertia(spark):
    """k-means invariants: sizes sum to N, every cluster id in [0, 8),
    avg_dist2 finite and non-negative, and the result is run-to-run
    deterministic (same seeds → same partition)."""
    from events_to_db_spark.registry import QUERIES

    out = QUERIES["q_ml_kmeans"](spark, SF_SMOKE).collect()
    n_total = sum(r.n_vecs for r in out)
    assert n_total == load_table(spark, SF_SMOKE, "embeddings").count()
    assert all(0 <= r.cluster_id < 8 for r in out)
    assert all(r.avg_dist2 >= 0 for r in out)
    again = QUERIES["q_ml_kmeans"](spark, SF_SMOKE).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_timezone_dst_spring_forward(spark):
    """q_fn_timezone's claim: from_utc_timestamp follows the IANA rule
    across the US 2024 spring-forward (2024-03-10 07:00 UTC is 02:00
    EST -> skips to 03:00 EDT), and Kathmandu is a constant +05:45."""
    df = spark.createDataFrame(
        [("2024-03-10 06:59:59",), ("2024-03-10 07:00:00",)], ["s"]
    ).select(F.to_timestamp("s").alias("ts"))
    got = df.select(
        F.date_format(
            F.from_utc_timestamp("ts", "America/New_York"),
            "yyyy-MM-dd HH:mm:ss",
        ).alias("ny"),
        F.date_format(
            F.from_utc_timestamp("ts", "Asia/Kathmandu"),
            "yyyy-MM-dd HH:mm:ss",
        ).alias("ktm"),
    ).collect()
    assert got[0]["ny"] == "2024-03-10 01:59:59"  # EST, UTC-5
    assert got[1]["ny"] == "2024-03-10 03:00:00"  # EDT, UTC-4: 02:xx never exists
    assert got[0]["ktm"] == "2024-03-10 12:44:59"
    assert got[1]["ktm"] == "2024-03-10 12:45:00"


def test_linreg_matches_lstsq(spark):
    """Closed-form OLS equals numpy's QR-based lstsq on the same rows
    (sf0.001, ~6k rows/group): coefficients to 1e-3 relative-or-abs,
    R^2 in [0,1].  The testdata's price~quantity correlation is ~0 by
    construction, so slopes are small — the check is numerical
    agreement, not sign."""
    import numpy as np

    from events_to_db_spark.operators.stats_ops import q_ml_linreg

    rows = {r["l_returnflag"]: r for r in q_ml_linreg(spark, SF_SMOKE).collect()}
    assert set(rows) == {"A", "N", "R"}
    li = (
        load_table(spark, SF_SMOKE, "lineitem")
        .select(
            "l_returnflag",
            F.col("l_quantity").cast("double").alias("x1"),
            (F.round(F.col("l_discount") * 100)).alias("x2"),
            (F.round(F.col("l_extendedprice") * 100)).alias("y"),
        )
        .toPandas()
    )
    for flag, r in rows.items():
        g = li[li.l_returnflag == flag]
        a = np.column_stack([np.ones(len(g)), g.x1, g.x2])
        beta, *_ = np.linalg.lstsq(a, g.y.to_numpy(), rcond=None)
        assert 0.0 <= r["r2"] <= 1.0
        for got, want in ((r["intercept"], beta[0]), (r["b_qty"], beta[1]),
                          (r["b_disc"], beta[2])):
            assert abs(got - want) <= 1e-3 * max(1.0, abs(want))


def test_hhi_bounds(spark):
    """HHI lies in [1/n, 1] and top_share in [1/n, 1] per region."""
    from events_to_db_spark.operators.aggregates import q_agg_hhi

    for r in q_agg_hhi(spark, SF_SMOKE).collect():
        n = r["n_suppliers"]
        assert n >= 1
        assert 1.0 / n - 1e-9 <= r["hhi"] <= 1.0
        assert 1.0 / n - 1e-9 <= r["top_share"] <= 1.0


def test_clamped_fold_stream_carries_state_across_arrow_batches(spark):
    """r10 bounded-memory fold (VERDICT r09 #7): with
    maxRecordsPerBatch squeezed to 7, every user's history spans MANY
    Arrow batches — the mapInPandas fold must carry (bal, lo, hi)
    across batch boundaries and key changes exactly.  Compared against
    a driver-side replay of the same (ts, event_id)-ordered fold over
    a seeded random history (200 ops × 5 users, deltas crafted to hit
    BOTH clamps repeatedly)."""
    import random

    import __spark_entry__ as e

    rng = random.Random(20260816)
    rows = []
    eid = 0
    for u in range(5):
        for i in range(200):
            # large swings so low/high clamps both fire often
            rows.append((u, i, eid, rng.randint(-60_000, 60_000)))
            eid += 1
    rng.shuffle(rows)  # input order must not matter (sort is internal)

    df = spark.createDataFrame(
        rows, "user_id long, seq long, event_id long, delta long"
    ).withColumn(
        "ts", F.expr("timestamp'2024-01-01' + make_interval(0,0,0,0,0,0,seq)")
    ).drop("seq")

    from events_to_db_spark.operators.udfs import _clamped_fold_stream

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
    try:
        got = {
            r["user_id"]: (
                r["n_ops"],
                r["final_balance_cents"],
                r["n_clamped_low"],
                r["n_clamped_high"],
            )
            for r in df.repartition("user_id")
            .sortWithinPartitions("user_id", "ts", "event_id")
            .mapInPandas(
                _clamped_fold_stream,
                "user_id long, n_ops long, final_balance_cents long, "
                "n_clamped_low long, n_clamped_high long",
            )
            .collect()
        }
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)

    # driver-side oracle: replay the fold in (ts, event_id) order
    want = {}
    for u in range(5):
        hist = sorted(
            (r for r in rows if r[0] == u), key=lambda r: (r[1], r[2])
        )
        bal = lo = hi = 0
        for _u, _seq, _eid, d in hist:
            b = bal + d
            if b < 0:
                lo += 1
                b = 0
            elif b > 100000:
                hi += 1
                b = 100000
            bal = b
        want[u] = (len(hist), bal, lo, hi)
    assert got == want
    assert any(v[2] > 0 for v in want.values())  # low clamps exercised
    assert any(v[3] > 0 for v in want.values())  # high clamps exercised
