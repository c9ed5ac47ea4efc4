"""§2.6 Sorts / limits / top-k.

LIMIT-after-ORDER BY entries order by a unique key chain so the selected
row set is deterministic. Spark plans top-k as TakeOrderedAndProject (no
global sort), which is the 100 TB-relevant property.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dbtwiz_spark.ops.common import views
from dbtwiz_spark.ops.registry import register


@register(
    "sort-global",
    oracle="""
    SELECT s_suppkey, s_name, s_acctbal FROM supplier
    ORDER BY s_acctbal DESC, s_suppkey
    """,
)
def sort_global(spark, sf_dir):
    """Total-order output (sorted listings idiom, dbtwiz/admin/cleanup.py:354)."""
    s = views(spark, sf_dir).table("supplier")
    return s.select("s_suppkey", "s_name", "s_acctbal").orderBy(
        F.col("s_acctbal").desc(), "s_suppkey"
    )


@register(
    "sort-custom-key",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           CASE WHEN o_orderpriority = '1-URGENT' THEN 0
                WHEN o_orderpriority = '2-HIGH' THEN 1
                ELSE 2 END AS priority_class
    FROM orders
    ORDER BY priority_class, o_orderkey
    """,
)
def sort_custom_key(spark, sf_dir):
    """Sort by computed key (layer ordering stg→int→mrt,
    dbtwiz/dbt/manifest.py:331-338 model_ordering prefixes)."""
    o = views(spark, sf_dir).table("orders")
    cls = (
        F.when(F.col("o_orderpriority") == "1-URGENT", 0)
        .when(F.col("o_orderpriority") == "2-HIGH", 1)
        .otherwise(2)
    )
    return o.select(
        "o_orderkey", "o_orderpriority", cls.alias("priority_class")
    ).orderBy("priority_class", "o_orderkey")


@register(
    "limit",
    oracle="""
    SELECT o_orderkey, o_orderdate FROM orders
    ORDER BY o_orderdate, o_orderkey LIMIT 20
    """,
)
def limit(spark, sf_dir):
    """First-N with deterministic ordering (pageSize idiom,
    dbtwiz/admin/backfill.py:306)."""
    o = views(spark, sf_dir).table("orders")
    return o.select("o_orderkey", "o_orderdate").orderBy("o_orderdate", "o_orderkey").limit(20)


@register(
    "top-k",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal FROM customer
    ORDER BY c_acctbal DESC, c_custkey LIMIT 10
    """,
)
def top_k(spark, sf_dir):
    """Largest-K by key — Spark plans TakeOrderedAndProject: per-partition
    heaps, no global shuffle sort (dbtwiz/admin/backfill.py:151 max-by idiom)."""
    c = views(spark, sf_dir).table("customer")
    return (
        c.select("c_custkey", "c_name", "c_acctbal")
        .orderBy(F.col("c_acctbal").desc(), "c_custkey")
        .limit(10)
    )


@register("sort-within-partitions", oracle=None)
def sort_within_partitions(spark, sf_dir):
    """Clustering order inside partitions (dbtwiz/admin/clustering.py:29-48).

    Physical-layout op: repartition by the partition key, sort rows within
    each partition by the cluster columns — the write-path half of the
    clustered-table materialization (parquet min/max page stats then give
    block skipping). Output rows are the input rows (rows-only check);
    tests assert the intra-partition ordering.
    """
    li = views(spark, sf_dir).table("lineitem")
    return (
        li.repartition(8, "l_returnflag")
        .sortWithinPartitions("l_returnflag", "l_shipdate", "l_orderkey")
        .select("l_orderkey", "l_linenumber", "l_returnflag", "l_shipdate")
    )


@register(
    "sort-within-partitions-cert",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows, true AS sorted_ok
    FROM lineitem
    """,
)
def sort_within_partitions_cert(spark, sf_dir):
    """Certificate for the clustering order: after repartition +
    sortWithinPartitions, every partition must actually BE sorted on the
    cluster columns — verified by an Arrow-batched pass that checks each
    batch is lexicographically ordered and that batch boundaries do not
    regress. n_rows hash-pins that no row was lost or duplicated by the
    re-layout. Same certificate device as the ANN/sketch entries: the
    physical layout is engine-specific (hence sort-within-partitions is
    rows-only), but the layout CONTRACT is checkable and is exactly what
    parquet min/max block skipping depends on at 100 TB."""
    import pandas as pd

    # certify the SHIPPED entry's output, not a copy of its layout — if
    # sort_within_partitions changes partitioning or sort keys, this
    # certificate follows it instead of staying green on dead code
    cols = ["l_returnflag", "l_shipdate", "l_orderkey"]
    laid_out = sort_within_partitions(spark, sf_dir)

    def check(batches):
        rows, ok, last = 0, True, None
        for pdf in batches:
            rows += len(pdf)
            if not len(pdf):
                continue
            k = pdf[cols].reset_index(drop=True)
            if not k.equals(k.sort_values(cols, kind="stable").reset_index(drop=True)):
                ok = False
            first = tuple(k.iloc[0])
            if last is not None and first < last:
                ok = False
            last = tuple(k.iloc[-1])
        yield pd.DataFrame({"rows": [rows], "ok": [ok]})

    per_part = laid_out.mapInPandas(check, "rows long, ok boolean")
    return per_part.agg(
        F.sum("rows").cast("long").alias("n_rows"),
        F.min("ok").alias("sorted_ok"),
    )
