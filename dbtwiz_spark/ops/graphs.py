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
