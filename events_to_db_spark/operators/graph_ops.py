"""Graph operators over the event log (SURVEY.md §2.12, round 2).

The event stream induces a directed graph: nodes are event types,
edges are observed consecutive transitions per user (the same edge
list q_ev_transitions reports).  PageRank over that graph answers
"which state is the behavioral sink" — the classic iterative-algorithm
shape (join → aggregate → loop) that a declarative engine must express
without driver-side row loops.

Determinism discipline (SURVEY §7.5): PageRank is usually float — and
float summation order differs between engines — so this implementation
carries ranks as *integers scaled by 1e12* and edge probabilities as
integers scaled by 1e6.  Every per-iteration step is integer multiply /
integer floor-divide / integer sum (order-independent, exact in both
engines); the only float op is the final display division, performed
identically on identical integers.  The deliberate floor-division mass
leak (≤ |E| · 1e-12 per iteration) is part of the spec and identical
in both engines.

Scale shape: ranks and the node list live as DataFrames end-to-end;
each iteration is one broadcast-join + one keyed aggregate over the
edge list, so the same code runs with |V| in the billions — only the
iteration *count* (a fixed constant 5) and one |V| scalar ``count()``
touch the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from events_to_db_spark.operators.graphkernel import (
    collect_edges,
    linkpred_topk,
)
from events_to_db_spark.registry import query
from events_to_db_spark.plans.checkpoints import truncate_lineage
from events_to_db_spark.session import load_table

_PR_SCALE = 10**12  # rank fixed-point scale
_PR_PSCALE = 10**6  # edge-probability fixed-point scale
_PR_ITERS = 5

#: Driver-fold gate for fixed-point iterations on the event-TYPE
#: transition graph (r11 opt, guide §1.2 "the distributed algorithm"
#: + §5 "the driver should do almost no data work" — a ≤128-node
#: integer mat-vec is not data work): when |V| is at or under this,
#: the edge list (≤ |V|² rows of three BIGINTs) is collected once and
#: the fixed iteration count runs as exact Python integer arithmetic —
#: all values are non-negative, so Python ``//`` ≡ Spark ``div`` and
#: the fold is bit-identical to the distributed loop (parity tests +
#: the unchanged DuckDB oracles pin it).  Above the gate (or with the
#: env var set to 0) the distributed broadcast-join loop runs exactly
#: as before — the billion-node posture is unchanged.  The measured
#: win is per-iteration JOB overhead, not compute: 5 pagerank rounds
#: cost ~2.5 s of scheduler/broadcast/checkpoint latency at |V| = 5.
GRAPH_DRIVER_MAX_NODES = 128


def _graph_driver_max_nodes() -> int:
    import os

    return int(
        os.environ.get(
            "SPARK_GRAFT_GRAPH_DRIVER_MAX_NODES", str(GRAPH_DRIVER_MAX_NODES)
        )
    )


#: q_graph_linkpred anti-join broadcast gate: the edge list (two
#: BIGINTs/row) broadcasts while |E| is at or under this (~128 MB of
#: hashed relation at the gate), replacing a sort-merge anti join that
#: would sort the 1e8-row wedge side.  Above the gate — edge lists
#: scale with catalog density, not fact rows, but they DO grow — the
#: shuffled anti join is kept (the 100 TB posture).
LINKPRED_BCAST_MAX_EDGES = 8_000_000


def _linkpred_bcast_max_edges() -> int:
    import os

    return int(
        os.environ.get(
            "SPARK_GRAFT_LINKPRED_BCAST_MAX_EDGES",
            str(LINKPRED_BCAST_MAX_EDGES),
        )
    )


def _pagerank_oracle(iters: int = _PR_ITERS) -> str:
    """Unrolled DuckDB CTE chain — one (dangling, contrib, rank) CTE
    triple per iteration, mirroring the Spark loop step for step."""
    parts = [
        f"""
    WITH edges AS (
        SELECT prev AS src, event_type AS dst, count(*) AS w
        FROM (
            SELECT event_type,
                   lag(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id) AS prev
            FROM events
        )
        WHERE prev IS NOT NULL
        GROUP BY 1, 2
    ),
    outw AS (SELECT src, sum(w) AS tw FROM edges GROUP BY 1),
    ep AS (
        SELECT e.src, e.dst, (e.w * {_PR_PSCALE}) // o.tw AS p
        FROM edges e JOIN outw o ON e.src = o.src
    ),
    nodes AS (SELECT DISTINCT event_type AS node FROM events),
    nn AS (SELECT count(*) AS n FROM nodes),
    r0 AS (SELECT node, {_PR_SCALE} // nn.n AS r FROM nodes, nn)"""
    ]
    for i in range(1, iters + 1):
        prev = f"r{i - 1}"
        parts.append(
            f"""
    d{i} AS (
        SELECT coalesce(sum(r.r), 0) AS dm
        FROM {prev} r LEFT JOIN outw o ON r.node = o.src
        WHERE o.src IS NULL
    ),
    c{i} AS (
        SELECT ep.dst AS node, sum((r.r * ep.p) // {_PR_PSCALE}) AS contrib
        FROM ep JOIN {prev} r ON r.node = ep.src
        GROUP BY 1
    ),
    r{i} AS (
        SELECT n.node,
               (15 * {_PR_SCALE}) // (100 * nn.n)
               + (85 * (coalesce(c.contrib, 0) + d.dm // nn.n)) // 100 AS r
        FROM nodes n CROSS JOIN nn CROSS JOIN d{i} d
        LEFT JOIN c{i} c ON c.node = n.node
    )"""
        )
    body = ",".join(parts)
    return f"""{body}
    SELECT node AS event_type,
           CAST(r AS BIGINT) AS rank_scaled,
           round(r / 1000000000000e0, 6) AS pagerank
    FROM r{iters}
    """


@query("q_graph_pagerank", oracle=_pagerank_oracle())
def q_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (damping 0.85, 5 iterations) over the event-type
    transition graph, in exact fixed-point integer arithmetic.

    Edges: per user, each consecutive (prev_type → type) pair in
    (ts, event_id) order, weighted by occurrence count.  Each
    iteration: dangling mass redistributed uniformly, per-edge
    contribution r·p // 1e6, teleport 0.15 — all BIGINT ops (max
    intermediate r·p ≤ 1e12·1e6 < 2^63), so the ranks value-hash
    against the oracle's unrolled CTE chain.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    edges = (
        ev.select(
            F.lag("event_type").over(w).alias("src"),
            F.col("event_type").alias("dst"),
        )
        .where(F.col("src").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count("*").alias("w"))
    )
    outw = edges.groupBy("src").agg(F.sum("w").alias("tw"))
    ep = (
        edges.join(outw, "src")
        .select("src", "dst", F.expr(f"(w * {_PR_PSCALE}) div tw").alias("p"))
        .cache()
    )
    nodes = ev.select(F.col("event_type").alias("node")).distinct().cache()
    # |V| closes the teleport/dangling constants — a SCALAR count; the
    # node list itself is only collected under the driver-fold gate
    # (r12: the r11 form collected the list unconditionally, shipping
    # rows to the driver even when the distributed loop was about to
    # run — gate first, collect second).
    n = nodes.count()
    if 0 < n <= _graph_driver_max_nodes():
        # Driver fold (see GRAPH_DRIVER_MAX_NODES): one edge-list
        # collect, then the 5 rounds as exact non-negative integer
        # arithmetic — Python // ≡ Spark div, same sums, same output.
        node_list = [r["node"] for r in nodes.collect()]
        ep_rows = [(r["src"], r["dst"], r["p"]) for r in ep.collect()]
        out_srcs = {src for src, _dst, _p in ep_rows}
        ranks_d = {node: _PR_SCALE // n for node in node_list}
        for _ in range(_PR_ITERS):
            dm = sum(
                r for node, r in ranks_d.items() if node not in out_srcs
            )
            contrib: dict = {}
            for src, dst, p in ep_rows:
                contrib[dst] = contrib.get(dst, 0) + (ranks_d[src] * p) // _PR_PSCALE
            ranks_d = {
                node: (15 * _PR_SCALE) // (100 * n)
                + (85 * (contrib.get(node, 0) + dm // n)) // 100
                for node in node_list
            }
        out = spark.createDataFrame(
            sorted(ranks_d.items()), "node string, r long"
        )
        return out.select(
            F.col("node").alias("event_type"),
            F.col("r").cast("long").alias("rank_scaled"),
            F.round(F.col("r") / F.lit(1000000000000.0), 6).alias(
                "pagerank"
            ),
        )
    ranks = nodes.select("node", F.lit(_PR_SCALE // n).alias("r"))
    for _ in range(_PR_ITERS):
        dang = (
            ranks.join(outw, ranks.node == outw.src, "left_anti")
            .agg(F.coalesce(F.sum("r"), F.lit(0)).alias("dm"))
        )
        contrib = (
            ep.join(ranks, ep.src == ranks.node)
            .groupBy("dst")
            .agg(F.sum(F.expr(f"(r * p) div {_PR_PSCALE}")).alias("contrib"))
        )
        ranks = (
            nodes.crossJoin(F.broadcast(dang))
            .join(F.broadcast(contrib), nodes.node == contrib.dst, "left")
            .select(
                "node",
                F.expr(
                    f"(15 * {_PR_SCALE}) div (100 * {n})"
                    f" + (85 * (coalesce(contrib, 0) + dm div {n})) div 100"
                ).alias("r"),
            )
            # Truncate lineage each round: ranks is referenced three
            # times per iteration (dangling, contrib, rebuild), so the
            # un-checkpointed plan grows ~3^i and Catalyst analysis
            # dominates wall-clock by iteration 5.  Same pattern and
            # same cluster-availability caveat as q_dedup_cluster's
            # label propagation (see sampling.py localCheckpoint note).
            .transform(lambda d: truncate_lineage(d, eager=False))
        )
    return ranks.select(
        F.col("node").alias("event_type"),
        F.col("r").cast("long").alias("rank_scaled"),
        F.round(F.col("r") / F.lit(1000000000000.0), 6).alias("pagerank"),
    )


_BFS_ITERS = 4
_BFS_INF = 999


def _bfs_oracle(iters: int = _BFS_ITERS) -> str:
    """Unrolled min-plus relaxation — one CTE per BFS round."""
    parts = [
        f"""
    WITH edges AS (
        SELECT DISTINCT prev AS src, event_type AS dst
        FROM (
            SELECT event_type,
                   lag(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id) AS prev
            FROM events
        )
        WHERE prev IS NOT NULL
    ),
    nodes AS (SELECT DISTINCT event_type AS node FROM events),
    d0 AS (
        SELECT node,
               CASE WHEN node = 'signup' THEN 0 ELSE {_BFS_INF} END AS d
        FROM nodes
    )"""
    ]
    for i in range(1, iters + 1):
        prev = f"d{i - 1}"
        parts.append(
            f"""
    d{i} AS (
        SELECT p.node, least(p.d, coalesce(min(q.d + 1), {_BFS_INF})) AS d
        FROM {prev} p
        LEFT JOIN edges e ON e.dst = p.node
        LEFT JOIN {prev} q ON q.node = e.src
        GROUP BY p.node, p.d
    )"""
        )
    body = ",".join(parts)
    return f"""{body}
    SELECT node AS event_type,
           CAST(CASE WHEN d >= {_BFS_INF} THEN NULL ELSE d END AS INT)
               AS hops
    FROM d{iters}
    ORDER BY event_type
    """


@query("q_graph_bfs", oracle=_bfs_oracle())
def q_graph_bfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BFS hop distance from the 'signup' state over the event-type
    transition graph — the min-plus fixed-iteration twin of
    :func:`q_graph_pagerank` (integer distances, so no fixed-point
    scaling is even needed).

    Each round relaxes every node against its in-edges: one broadcast
    join + one keyed min aggregate; {n} unrolled rounds bound the
    frontier depth (graph diameter ≤ |event types|).  Unreached nodes
    surface as NULL, not a sentinel.  The same loop shape runs with
    |V| in the billions — per round only DataFrame ops, no driver
    materialization.
    """.format(n=_BFS_ITERS)
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    edges = (
        ev.select(
            F.lag("event_type").over(w).alias("src"),
            F.col("event_type").alias("dst"),
        )
        .where(F.col("src").isNotNull())
        .distinct()
        .cache()
    )
    nodes = ev.select(F.col("event_type").alias("node")).distinct()
    # Driver fold on the bounded type graph (r11 opt — see
    # GRAPH_DRIVER_MAX_NODES): the min-plus relaxation is pure small-
    # integer arithmetic, identical in Python; above the gate the
    # distributed loop below runs untouched.  Gate on a SCALAR count
    # first — the node list only moves to the driver under the gate
    # (r12 gate-order fix).
    if 0 < nodes.count() <= _graph_driver_max_nodes():
        node_list = [r["node"] for r in nodes.collect()]
        edge_rows = [(r["src"], r["dst"]) for r in edges.collect()]
        d_map = {
            node: 0 if node == "signup" else _BFS_INF for node in node_list
        }
        for _ in range(_BFS_ITERS):
            relaxed: dict = {}
            for src, dst in edge_rows:
                cand = d_map[src] + 1
                if cand < relaxed.get(dst, _BFS_INF):
                    relaxed[dst] = cand
            d_map = {
                node: min(d_map[node], relaxed.get(node, _BFS_INF))
                for node in node_list
            }
        out = spark.createDataFrame(
            sorted(d_map.items()), "node string, d int"
        )
        return out.select(
            F.col("node").alias("event_type"),
            F.when(F.col("d") >= _BFS_INF, F.lit(None))
            .otherwise(F.col("d"))
            .cast("int")
            .alias("hops"),
        ).orderBy("event_type")
    dist = nodes.select(
        "node",
        F.when(F.col("node") == "signup", 0)
        .otherwise(_BFS_INF)
        .alias("d"),
    )
    for _ in range(_BFS_ITERS):
        relaxed = (
            edges.join(dist.withColumnRenamed("node", "src"), "src")
            .groupBy("dst")
            .agg(F.min(F.col("d") + 1).alias("dr"))
        )
        dist = (
            dist.join(
                F.broadcast(relaxed), dist.node == relaxed.dst, "left"
            )
            .select(
                "node",
                F.least(
                    F.col("d"), F.coalesce(F.col("dr"), F.lit(_BFS_INF))
                ).alias("d"),
            )
            .transform(lambda d: truncate_lineage(d, eager=False))
        )
    return dist.select(
        F.col("node").alias("event_type"),
        F.when(F.col("d") >= _BFS_INF, F.lit(None))
        .otherwise(F.col("d"))
        .cast("int")
        .alias("hops"),
    ).orderBy("event_type")


def _kcore_oracle(rounds: int = 12, k: int = 2) -> str:
    """Unrolled k-core peeling: each round keeps edges whose both
    endpoints still have degree ≥ k.  ``rounds`` upper-bounds the
    fixpoint depth (measured: 2/3/6 rounds at sf0.001/0.01/0.1; the
    Spark side iterates to convergence and raises if it would exceed
    this bound, so a too-shallow unroll fails loudly, never silently)."""
    ctes = [
        """e0 AS MATERIALIZED (
        SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE l.l_quantity >= 50
    )"""
    ]
    for i in range(1, rounds + 1):
        p = i - 1
        ctes.append(
            f"""e{i} AS MATERIALIZED (
        SELECT t.c, t.s FROM e{p} t
        JOIN (SELECT c FROM e{p} GROUP BY c HAVING count(*) >= {k}) dc
          USING (c)
        JOIN (SELECT s FROM e{p} GROUP BY s HAVING count(*) >= {k}) ds
          USING (s)
    )"""
        )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"""
    SELECT CAST(count(*) AS BIGINT) AS n_core_edges,
           CAST(count(DISTINCT c) AS BIGINT) AS n_core_customers,
           CAST(count(DISTINCT s) AS BIGINT) AS n_core_suppliers,
           CAST(coalesce(max(dc), 0) AS BIGINT) AS max_cust_degree,
           CAST(coalesce(max(ds), 0) AS BIGINT) AS max_supp_degree
    FROM (
        SELECT c, s,
               count(*) OVER (PARTITION BY c) AS dc,
               count(*) OVER (PARTITION BY s) AS ds
        FROM e{rounds}
    )
    """
    )


_KCORE_ROUNDS = 12


@query("q_graph_kcore", oracle=_kcore_oracle(_KCORE_ROUNDS))
def q_graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(2,2)-core of the bipartite customer–supplier graph (edges =
    max-quantity order lines): iteratively peel nodes with degree < 2
    on either side until fixpoint — the classic graph-decomposition
    primitive for finding the mutually-reinforcing trading core and
    discarding one-off relationships.

    Iterative shape: each round is two keyed degree aggregates + two
    semi-joins over the edge list, ``localCheckpoint`` truncating the
    growing lineage; only a per-round edge *count* (scalar) reaches the
    driver, so the loop runs unchanged on a 1000-executor edge list.
    The oracle replays the peeling as a 12-round unrolled CTE chain;
    the Spark side raises past that bound rather than letting the two
    sides diverge silently.  Output is the exact core summary (edge /
    node counts, max degrees) — all BIGINTs."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    edges = (
        orders.join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .where(F.col("l_quantity") >= 50)
        .select(
            F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s")
        )
        .distinct()
        # eager=False: the count() below materializes the checkpoint in
        # the SAME job (r11 opt — eager truncation ran a separate
        # materialization job before every per-round count, doubling
        # the loop's job count)
        .transform(lambda d: truncate_lineage(d, eager=False))
    )
    n = edges.count()
    for _ in range(_KCORE_ROUNDS):
        dc = edges.groupBy("c").agg(F.count("*").alias("dc")).where(
            F.col("dc") >= 2
        )
        ds = edges.groupBy("s").agg(F.count("*").alias("ds")).where(
            F.col("ds") >= 2
        )
        edges = (
            edges.join(dc.select("c"), "c", "left_semi")
            .join(ds.select("s"), "s", "left_semi")
            .transform(lambda d: truncate_lineage(d, eager=False))
        )
        n2 = edges.count()
        if n2 == n:
            break
        n = n2
    else:
        raise RuntimeError(
            f"k-core peeling did not converge within {_KCORE_ROUNDS} "
            "rounds — raise _KCORE_ROUNDS (and the oracle unroll) together"
        )
    wc = Window.partitionBy("c")
    ws = Window.partitionBy("s")
    deg = edges.select(
        "c", "s", F.count("*").over(wc).alias("dc"),
        F.count("*").over(ws).alias("ds"),
    )
    return deg.agg(
        F.count("*").alias("n_core_edges"),
        F.countDistinct("c").alias("n_core_customers"),
        F.countDistinct("s").alias("n_core_suppliers"),
        F.coalesce(F.max("dc"), F.lit(0)).alias("max_cust_degree"),
        F.coalesce(F.max("ds"), F.lit(0)).alias("max_supp_degree"),
    )


@query(
    "q_graph_linkpred",
    oracle="""
    WITH baskets AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    edges AS (
        SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        FROM baskets a JOIN baskets b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    sym AS (
        SELECT u, v FROM edges UNION ALL SELECT v, u FROM edges
    ),
    deg AS (SELECT u AS node, CAST(count(*) AS BIGINT) AS d FROM sym GROUP BY 1),
    wedges AS (
        SELECT s1.u AS a, s2.v AS c, count(*) AS common
        FROM sym s1 JOIN sym s2
          ON s2.u = s1.v AND s1.u < s2.v
        GROUP BY 1, 2
    ),
    cand AS (
        SELECT w.a, w.c, CAST(w.common AS BIGINT) AS common
        FROM wedges w
        LEFT JOIN edges e ON e.u = w.a AND e.v = w.c
        WHERE e.u IS NULL
    )
    SELECT cand.a, cand.c, cand.common,
           CAST(cand.common * 10000
                // (da.d + dc.d - cand.common) AS BIGINT) AS jacc_bp
    FROM cand
    JOIN deg da ON da.node = cand.a
    JOIN deg dc ON dc.node = cand.c
    ORDER BY cand.common DESC, jacc_bp DESC, cand.a, cand.c
    LIMIT 20
    """,
)
def q_graph_linkpred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction on the co-purchase graph: the top-20 NON-edges
    ranked by common-neighbor count with a basis-point Jaccard
    tie-break — the "customers who bought these also bought" candidate
    generator (and the dedup-cluster "should these merge" heuristic)
    in its exact-integer form.

    Plan shape: the wedge enumeration is ONE self-join of the
    symmetric edge list on the middle node (the same degree-bounded
    sweep q_graph_triangles uses), an anti-join removes existing
    edges, and degrees attach by two keyed joins — no driver-side
    structure; every score is integers (common, floor-div basis
    points), so the ranking is bit-identical cross-engine."""
    li = load_table(spark, sf_dir, "lineitem")
    baskets = li.select("l_orderkey", "l_partkey").distinct()
    b2 = baskets.select(
        F.col("l_orderkey").alias("o2"), F.col("l_partkey").alias("p2")
    )
    # edges feeds sym (twice), the anti-join and — via sym — deg and
    # both wedge sides: Catalyst replays the basket self-join per
    # reference (67 Exchanges before).  One truncation materializes it.
    edges = truncate_lineage(
        baskets.join(
            b2,
            (F.col("l_orderkey") == F.col("o2"))
            & (F.col("l_partkey") < F.col("p2")),
        )
        .select(F.col("l_partkey").alias("u"), F.col("p2").alias("v"))
        .distinct(),
        eager=False,
    )
    # r12 kernel (VERDICT r11 #1): when the edge list is driver-sized
    # AND its wedge budget Σd(d−1)/2 is kernel-bounded, the whole
    # wedge aggregate + anti-join + degree joins fold into one numpy
    # pass over the collected edges (graphkernel.linkpred_topk —
    # sorted-adjacency pair enumeration, one int64 sort, hierarchical
    # top-k cuts; exact integers throughout).  The scalar count runs
    # first (it doubles as the checkpoint materialization); above
    # either gate the distributed plan below is untouched.
    ku, kv, n_edges = collect_edges(edges)
    if ku is not None:
        rows = linkpred_topk(ku, kv, 20)
        if rows is not None:
            out = spark.createDataFrame(
                rows, "a long, c long, common long, jacc_bp long"
            )
            return out.orderBy(
                F.col("common").desc(), F.col("jacc_bp").desc(), "a", "c"
            )
    sym = edges.unionAll(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    deg = sym.groupBy(F.col("u").alias("node")).agg(F.count("*").alias("d"))
    s2 = sym.select(F.col("u").alias("m"), F.col("v").alias("c"))
    wedges = (
        sym.join(s2, (F.col("v") == F.col("m")) & (F.col("u") < F.col("c")))
        .groupBy(F.col("u").alias("a"), "c")
        .agg(F.count("*").alias("common"))
    )
    # The anti-join's left side is ~|wedge pairs| rows (1e8 at sf0.1)
    # while the edge list is |E| rows of two ids: a sort-merge anti
    # join sorts the 1e8-row side just to drop ~1% of it.  Broadcast
    # the edge list when it is gate-small (n_edges reuses the kernel
    # gate's count — no extra job); above the gate the shuffled anti
    # join stands.
    anti_rel = (
        F.broadcast(edges)
        if n_edges <= _linkpred_bcast_max_edges()
        else edges
    )
    cand = wedges.join(
        anti_rel,
        (wedges.a == anti_rel["u"]) & (wedges.c == anti_rel["v"]),
        "left_anti",
    )
    da = deg.select(F.col("node").alias("a"), F.col("d").alias("da"))
    dc = deg.select(F.col("node").alias("c"), F.col("d").alias("dc"))
    return (
        cand.join(da, "a")
        .join(dc, "c")
        .select(
            "a",
            "c",
            F.col("common").cast("long").alias("common"),
            F.expr("common * 10000 div (da + dc - common)")
            .cast("long")
            .alias("jacc_bp"),
        )
        .orderBy(
            F.col("common").desc(), F.col("jacc_bp").desc(), "a", "c"
        )
        .limit(20)
    )


@query(
    "q_graph_hits",
    oracle="""
    WITH edges AS (
        SELECT DISTINCT o_custkey AS c, l_suppkey AS s
        FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        WHERE l_quantity >= 40
    ),
    a1 AS (
        SELECT s, CAST(count(*) AS BIGINT) AS a FROM edges GROUP BY s
    ),
    h1 AS (
        SELECT c, CAST(sum(a) AS BIGINT) AS h
        FROM edges JOIN a1 USING (s) GROUP BY c
    ),
    a2 AS (
        SELECT s, CAST(sum(h) AS BIGINT) AS auth2
        FROM edges JOIN h1 USING (c) GROUP BY s
    ),
    tot AS (SELECT CAST(sum(auth2) AS BIGINT) AS ta FROM a2)
    SELECT s AS suppkey, auth2,
           round(CAST(auth2 AS DOUBLE) / ta, 6) AS auth_norm
    FROM a2 CROSS JOIN tot
    ORDER BY auth2 DESC, s LIMIT 10
    """,
)
def q_graph_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two HITS iterations (Kleinberg) on the bipartite
    customer→supplier bulk-order graph (the q_graph_assortativity
    edge set): authority⁰ = 1 → hub¹ = Σ authority of neighbors →
    authority² = Σ hub of in-neighbors — the top-10 suppliers by
    mutually-reinforcing importance, which plain in-degree (= the
    first iteration alone) mis-ranks when hubs are unequal.

    Determinism: with the all-ones start, every hub/authority score
    stays an exact BIGINT through both iterations (integer
    matrix-vector products as join + hash-agg); L1 normalization is
    ONE final division.  Top-10 by (auth2 DESC, suppkey) is a
    TakeOrdered over exact integers — no float enters any ordering.

    Scale: two keyed join+agg rounds over the distinct edge list —
    the degree tables broadcast; no all-pairs, no iteration-count
    blowup (2 fixed rounds)."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    edges = (
        orders.join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .where(F.col("l_quantity") >= 40)
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
    )
    a1 = edges.groupBy("s").agg(F.count("*").cast("long").alias("a"))
    h1 = (
        edges.join(F.broadcast(a1), "s")
        .groupBy("c")
        .agg(F.sum("a").cast("long").alias("h"))
    )
    a2 = (
        edges.join(F.broadcast(h1), "c")
        .groupBy("s")
        .agg(F.sum("h").cast("long").alias("auth2"))
    )
    tot = a2.agg(F.sum("auth2").cast("long").alias("ta"))
    return (
        a2.crossJoin(F.broadcast(tot))
        .select(
            F.col("s").alias("suppkey"),
            "auth2",
            F.round(
                F.col("auth2").cast("double") / F.col("ta"), 6
            ).alias("auth_norm"),
        )
        .orderBy(F.col("auth2").desc(), "suppkey")
        .limit(10)
    )


@query(
    "q_graph_katz",
    oracle="""
    WITH edges AS (
        SELECT prev AS src, event_type AS dst, CAST(count(*) AS BIGINT)
                   AS w
        FROM (
            SELECT event_type,
                   lag(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id) AS prev
            FROM events
        )
        WHERE prev IS NOT NULL
        GROUP BY 1, 2
    ),
    x1 AS (
        SELECT dst, CAST(sum(w) AS BIGINT) AS v FROM edges GROUP BY dst
    ),
    x2 AS (
        SELECT e.dst, CAST(sum(e.w * x.v) AS BIGINT) AS v
        FROM edges e JOIN x1 x ON x.dst = e.src
        GROUP BY e.dst
    ),
    x3 AS (
        SELECT e.dst, CAST(sum(e.w * x.v) AS BIGINT) AS v
        FROM edges e JOIN x2 x ON x.dst = e.src
        GROUP BY e.dst
    ),
    k AS (
        SELECT x1.dst AS node,
               CAST(4 * x1.v + 2 * coalesce(x2.v, 0)
                    + coalesce(x3.v, 0) AS BIGINT) AS katz8
        FROM x1
        LEFT JOIN x2 ON x2.dst = x1.dst
        LEFT JOIN x3 ON x3.dst = x1.dst
    ),
    tot AS (SELECT CAST(sum(katz8) AS BIGINT) AS tk FROM k)
    SELECT node AS event_type, katz8,
           round(CAST(katz8 AS DOUBLE) / tk, 6) AS katz_share
    FROM k CROSS JOIN tot
    ORDER BY katz8 DESC, node
    """,
)
def q_graph_katz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-step truncated Katz centrality (attenuation β = 1/2) on
    the weighted event-type transition graph (q_graph_pagerank's edge
    set): Σ_k β^k (Wᵀ)^k·1 over path lengths 1..3 — the "influence
    through short weighted paths" ranking between raw in-strength
    (k = 1 alone) and PageRank's stationary view.

    Determinism: with the all-ones start, every mat-vec x_k = Wᵀx_{k−1}
    stays an exact BIGINT (integer edge weights, join + hash-agg per
    step), and the dyadic attenuation folds to the single integer
    8·katz = 4x₁ + 2x₂ + x₃ — no float until the final share
    division.  Truncation at 3 steps is the documented spec (an
    untruncated Katz needs β < 1/λmax, unknowable in one pass).
    BIGINT posture: x₃ ~ (Σw)³/|V|² — safe to ~1e6-row transition
    tables, then DECIMAL(38,0).

    Scale: the |V|² edge table is bounded by the event-type
    dictionary; three keyed aggregates, everything broadcastable."""
    ev = load_table(spark, sf_dir, "events")
    w_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    edges = (
        ev.select(
            "event_type",
            F.lag("event_type").over(w_user).alias("prev"),
        )
        .where(F.col("prev").isNotNull())
        .groupBy(F.col("prev").alias("src"), F.col("event_type").alias("dst"))
        .agg(F.count("*").cast("long").alias("w"))
    )
    x1 = edges.groupBy("dst").agg(F.sum("w").cast("long").alias("v"))
    x2 = (
        edges.join(
            F.broadcast(x1.select(F.col("dst").alias("src"), F.col("v").alias("pv"))),
            "src",
        )
        .groupBy("dst")
        .agg(F.sum(F.col("w") * F.col("pv")).cast("long").alias("v"))
    )
    x3 = (
        edges.join(
            F.broadcast(x2.select(F.col("dst").alias("src"), F.col("v").alias("pv"))),
            "src",
        )
        .groupBy("dst")
        .agg(F.sum(F.col("w") * F.col("pv")).cast("long").alias("v"))
    )
    k = (
        x1.join(
            x2.select(F.col("dst").alias("d2"), F.col("v").alias("v2")),
            F.col("dst") == F.col("d2"),
            "left",
        )
        .join(
            x3.select(F.col("dst").alias("d3"), F.col("v").alias("v3")),
            F.col("dst") == F.col("d3"),
            "left",
        )
        .select(
            F.col("dst").alias("node"),
            (
                4 * F.col("v")
                + 2 * F.coalesce(F.col("v2"), F.lit(0))
                + F.coalesce(F.col("v3"), F.lit(0))
            )
            .cast("long")
            .alias("katz8"),
        )
    )
    tot = k.agg(F.sum("katz8").cast("long").alias("tk"))
    return (
        k.crossJoin(F.broadcast(tot))
        .select(
            F.col("node").alias("event_type"),
            "katz8",
            F.round(
                F.col("katz8").cast("double") / F.col("tk"), 6
            ).alias("katz_share"),
        )
        .orderBy(F.col("katz8").desc(), "event_type")
    )
