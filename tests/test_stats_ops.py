

def test_portmanteau_covs_survive_overflow_scale(spark):
    """ADVICE r06: the centered co-moments must survive daily-count
    scales where the old BIGINT (n·c−s)² form overflows (n³·σ² class).
    Feeds the shared cov/DW expression strings moments from a 60-day
    series of ~1e9-count days (old form: (60·1e9)² ≈ 3.6e21 ≫ 2⁶³)
    and checks Spark ≡ DuckDB ≡ exact-integer reference."""
    import duckdb
    from pyspark.sql import functions as F

    from events_to_db_spark.operators.stats_ops import (
        _LB_COV0_SQL,
        _LB_DW_SQL,
        _lb_cov_sql,
    )

    rng = __import__("random").Random(7)
    # c chosen so the LINEAR moments (Σc², Σc·c_k) still fit BIGINT
    # (~8e18 < 2⁶³) while a single old-form term (n·c−s)² ≈ 2.5e19
    # already does not — exactly the regime the fix targets.
    c = [200_000_000 + rng.randrange(0, 200_000_000) for _ in range(50)]
    n = len(c)
    s = sum(c)
    ss = sum(x * x for x in c)
    dnum = sum((c[i] - c[i - 1]) ** 2 for i in range(1, n))
    k = 1
    valid = list(range(1, n))
    p1 = sum(c[i] * c[i - 1] for i in valid)
    a1 = sum(c[i] for i in valid)
    b1 = sum(c[i - 1] for i in valid)
    m1 = len(valid)
    # exact integer reference (Python ints are unbounded)
    cov0_exact = n * n * ss - n * s * s
    cov1_exact = n * n * p1 - n * s * a1 - n * s * b1 + m1 * s * s
    # the old BIGINT accumulator Σ(n·c−s)² would overflow here
    assert sum((n * x - s) ** 2 for x in c) > 2**63
    assert max(ss, p1) < 2**63  # while the linear moments still fit

    row = dict(n=n, s=s, ss=ss, dnum=dnum, p1=p1, a1=a1, b1=b1, m1=m1)
    sdf = spark.createDataFrame(
        [row], "n long, s long, ss long, dnum long, p1 long, a1 long,"
        " b1 long, m1 long"
    )
    got = sdf.select(
        F.expr(_LB_COV0_SQL).alias("cov0"),
        F.expr(_lb_cov_sql(1)).alias("cov1"),
        F.expr(_LB_DW_SQL).alias("dw"),
    ).collect()[0]
    # DuckDB evaluates the SAME strings on the same moments
    con = duckdb.connect()
    cols = ", ".join(f"{v} AS {kk}" for kk, v in row.items())
    duck = con.execute(
        f"SELECT {_LB_COV0_SQL} AS cov0, {_lb_cov_sql(1)} AS cov1,"
        f" {_LB_DW_SQL} AS dw FROM (SELECT {cols})"
    ).fetchone()
    assert got["cov0"] == duck[0] and got["cov1"] == duck[1]
    assert got["dw"] == duck[2]
    # and both agree with the exact reference to double precision
    assert abs(got["cov0"] - cov0_exact) <= 1e-12 * abs(cov0_exact)
    assert abs(got["cov1"] - cov1_exact) <= max(
        1e-9 * abs(cov0_exact), 1e-12 * abs(cov1_exact)
    )
