"""Iterative graph operators (SURVEY §2.11 scale family).

PageRank is THE canonical iterative-shuffle workload: each iteration is a
join (ranks × edges) plus a key-partitioned aggregation, repeated. The
implementation is pure DataFrame — Catalyst plans every iteration's join
and partial aggregation, and at cluster scale the edge table's hash
partitioning on ``src``/``dst`` is reused across iterations (AQE coalesces
the post-shuffle sides). Related: connected components / label propagation
lives in ext_pipeline.py (ext-dedup-cluster).

Determinism device: fixed-point integer arithmetic. Ranks are scaled to
10^15 and every operation is BIGINT add / multiply / integer-divide, so
the result is bit-identical in any engine and under any partitioning or
reduction order — float PageRank would diverge across engines in the sum
order. Total mass 10^15 bounds every intermediate below 8.5e16, far
inside BIGINT.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dbtwiz_spark.ops.common import views
from dbtwiz_spark.ops.registry import register

_SCALE = 1_000_000_000_000_000  # 10^15 fixed-point scale
_ITER = 3
_DAMP_NUM, _DAMP_DEN = 85, 100  # damping 0.85 as an exact ratio


def _pagerank_oracle() -> str:
    base = f"({_SCALE * 15 // 100} // nn.n)"
    sql = f"""
    WITH pairs AS (
        SELECT DISTINCT 'c' || CAST(o.o_custkey AS VARCHAR) AS c,
                        's' || CAST(l.l_suppkey AS VARCHAR) AS s
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
    edges AS (
        SELECT c AS src, s AS dst FROM pairs
        UNION ALL
        SELECT s AS src, c AS dst FROM pairs),
    deg AS (SELECT src AS node, COUNT(*) AS degree FROM edges GROUP BY 1),
    nn AS (SELECT COUNT(*) AS n FROM deg),
    r0 AS (
        SELECT node, degree, CAST({_SCALE} AS BIGINT) // nn.n AS rank
        FROM deg, nn)
    """
    prev = "r0"
    for i in range(1, _ITER + 1):
        sql += f""",
    r{i} AS (
        SELECT e.dst AS node, d.degree,
               {base} + ({_DAMP_NUM} * SUM(r.rank // r.degree)) // {_DAMP_DEN}
                 AS rank
        FROM edges e
        JOIN {prev} r ON e.src = r.node
        JOIN deg d ON e.dst = d.node, nn
        GROUP BY e.dst, d.degree, nn.n)
        """
        prev = f"r{i}"
    sql += f"""
    SELECT node, CAST(rank AS BIGINT) AS pagerank_fp
    FROM {prev} ORDER BY rank DESC, node LIMIT 20
    """
    return sql


@register("graph-pagerank", oracle=_pagerank_oracle())
def graph_pagerank(spark, sf_dir):
    """PageRank (3 iterations, damping 0.85) over the undirected
    customer–supplier purchase graph; top-20 nodes by rank. The analytics
    use: centrality over an interaction graph (which accounts/vendors
    anchor the network) — the reference models this domain as mart-layer
    SQL over BigQuery (dbtwiz/model/create.py marts layer); the engine
    runs the iteration natively.

    Fixed-point: ranks are BIGINT scaled by 1e15; each step is
    ``base + (85 * Σ(rank div degree)) div 100`` — exact integer ops,
    identical in any engine and any reduction order. Undirected edges
    mean no dangling mass (every node has out-degree ≥ 1) and the node
    set equals the degree-table keys on both sides.

    Scale: per iteration one equi-join (ranks joined to edges on src —
    both hash-partitioned on the join key, partitioning reused across
    iterations) and one partial-aggregated groupBy(dst). The edge list
    never moves through the driver; 3 fixed iterations keep the plan
    bounded (production loops checkpoint every ~5 iterations to cut
    lineage — documented, not needed at 3)."""
    cat = views(spark, sf_dir)
    o, li = cat.table("orders"), cat.table("lineitem")
    pairs = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("c"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("s"),
        )
        .distinct()
    )
    edges = pairs.select(F.col("c").alias("src"), F.col("s").alias("dst")).unionAll(
        pairs.select(F.col("s").alias("src"), F.col("c").alias("dst"))
    )
    deg = edges.groupBy("src").agg(F.count("*").alias("degree")).withColumnRenamed("src", "node")
    nn = deg.agg(F.count("*").alias("n"))
    base_expr = f"CAST({_SCALE * 15 // 100} AS BIGINT) div n"
    ranks = deg.crossJoin(F.broadcast(nn)).select(
        "node", "degree", F.expr(f"CAST({_SCALE} AS BIGINT) div n").alias("rank")
    )
    for _ in range(_ITER):
        contrib = edges.join(ranks, edges.src == ranks.node).select(
            F.col("dst"), F.expr("rank div degree").alias("contrib")
        )
        ranks = (
            contrib.groupBy("dst")
            .agg(F.sum("contrib").alias("s"))
            .join(deg, contrib.dst == deg.node)
            .crossJoin(F.broadcast(nn))
            .select(
                "node",
                "degree",
                (
                    F.expr(base_expr)
                    + F.expr(f"({_DAMP_NUM} * s) div {_DAMP_DEN}")
                ).alias("rank"),
            )
        )
    return (
        ranks.select("node", F.col("rank").alias("pagerank_fp"))
        .orderBy(F.desc("pagerank_fp"), "node")
        .limit(20)
    )


@register(
    "graph-triangle-count",
    oracle="""
    WITH cs AS (
        SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        WHERE l.l_suppkey <= 100),
    p AS (
        SELECT a.s AS sa, b.s AS sb, COUNT(*) AS shared
        FROM cs a JOIN cs b ON a.c = b.c AND a.s < b.s
        GROUP BY 1, 2),
    thr AS (SELECT CAST(SUM(shared) AS DOUBLE) / COUNT(*) * 1.05 AS t FROM p),
    e AS (SELECT sa, sb FROM p, thr WHERE shared > thr.t),
    tri AS (
        SELECT COUNT(*) AS n_triangles
        FROM e e1
        JOIN e e2 ON e1.sa = e2.sa AND e1.sb < e2.sb
        JOIN e e3 ON e3.sa = e1.sb AND e3.sb = e2.sb)
    SELECT (SELECT COUNT(*) FROM e) AS n_edges,
           tri.n_triangles
    FROM tri
    """,
)
def graph_triangle_count(spark, sf_dir):
    """Triangle count over the supplier co-purchase graph (edges between
    suppliers whose shared-customer count exceeds 1.05x the mean) -- the
    clustering/cohesion metric behind community detection and fraud-ring
    screens. The edge threshold is data-relative so the graph stays
    meaningful at every SF; all joins are on exact integers and the
    threshold compare is one double division on identical operands.

    The counting join uses ID-ORIENTATION: every edge is stored once as
    (lo, hi), and a triangle a<b<c is found as wedge (a,b)x(a,c), b<c,
    closed by probing (b,c) -- each triangle counted exactly once, no
    all-pairs step. At 100 TB the same plan holds with DEGREE-orientation
    (orient each edge toward the higher-degree endpoint) so wedge fan-out
    is bounded by the lighter endpoint's degree -- the standard skew
    device this bounded demo graph (supplier key <= 100 at any SF)
    doesn't need."""
    cat = views(spark, sf_dir)
    o, li = cat.table("orders"), cat.table("lineitem")
    cs = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .filter(F.col("l_suppkey") <= 100)
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
    )
    a = cs.select(F.col("c"), F.col("s").alias("sa"))
    b = cs.select(F.col("c"), F.col("s").alias("sb"))
    p = (
        a.join(b, "c")
        .filter(F.col("sa") < F.col("sb"))
        .groupBy("sa", "sb")
        .agg(F.count("*").alias("shared"))
    )
    thr = p.agg(
        (F.sum("shared").cast("double") / F.count("*") * 1.05).alias("t")
    )
    e = p.crossJoin(F.broadcast(thr)).filter(F.col("shared") > F.col("t")).select("sa", "sb")
    e1 = e.select(F.col("sa").alias("a"), F.col("sb").alias("b"))
    e2 = e.select(F.col("sa").alias("a"), F.col("sb").alias("c"))
    e3 = e.select(F.col("sa").alias("b"), F.col("sb").alias("c"))
    wedges = e1.join(e2, "a").filter(F.col("b") < F.col("c"))
    tri = wedges.join(e3, ["b", "c"]).agg(F.count("*").alias("n_triangles"))
    n_edges = e.agg(F.count("*").alias("n_edges"))
    return F.broadcast(n_edges).crossJoin(tri)
