"""§2.7 Set operations.

The reference's desired-state diff engines are set algebra:
`needs_granting = desired - current` (dbtwiz/admin/grants.py:278-280),
manifest∪snapshot concatenation (dbtwiz/admin/cleanup.py:342).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dbtwiz_spark.ops.common import views
from dbtwiz_spark.ops.registry import register


@register(
    "set-union-all",
    oracle="""
    SELECT c_nationkey AS nationkey, 'customer' AS side FROM customer
    UNION ALL
    SELECT s_nationkey AS nationkey, 'supplier' AS side FROM supplier
    """,
)
def set_union_all(spark, sf_dir):
    """UNION ALL concatenation (dbtwiz/admin/cleanup.py:342)."""
    cat = views(spark, sf_dir)
    c = cat.table("customer").select(
        F.col("c_nationkey").alias("nationkey"), F.lit("customer").alias("side")
    )
    s = cat.table("supplier").select(
        F.col("s_nationkey").alias("nationkey"), F.lit("supplier").alias("side")
    )
    return c.unionByName(s)


@register(
    "set-union-distinct",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def set_union_distinct(spark, sf_dir):
    """UNION DISTINCT (set-union of grant sets, dbtwiz/admin/grants.py:71-95)."""
    cat = views(spark, sf_dir)
    c = cat.table("customer").select(F.col("c_nationkey").alias("nationkey"))
    s = cat.table("supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct()


@register(
    "set-intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def set_intersect(spark, sf_dir):
    """INTERSECT (team-membership idiom, dbtwiz/model/create.py:321)."""
    cat = views(spark, sf_dir)
    c = cat.table("customer").select(F.col("c_nationkey").alias("nationkey"))
    s = cat.table("supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@register(
    "set-except",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def set_except(spark, sf_dir):
    """EXCEPT — the grants diff (dbtwiz/admin/grants.py:278-280:
    desired − current / current − desired)."""
    cat = views(spark, sf_dir)
    c = cat.table("customer").select(F.col("c_nationkey").alias("nationkey"))
    s = cat.table("supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.subtract(s)  # EXCEPT DISTINCT semantics (exceptAll is the ALL form)


@register(
    "set-except-all",
    oracle="""
    SELECT o_custkey AS custkey FROM orders
    EXCEPT ALL
    SELECT c_custkey FROM customer
    """,
)
def set_except_all(spark, sf_dir):
    """EXCEPT ALL — multiset difference: each customer key cancels ONE of
    its order occurrences, leaving a row per surplus order (multiplicity
    arithmetic, not membership). Catalyst plans exceptAll as a
    count-per-key aggregate + generate, one shuffle on the key — same
    scale shape as a groupBy."""
    cat = views(spark, sf_dir)
    o = cat.table("orders").select(F.col("o_custkey").alias("custkey"))
    c = cat.table("customer").select(F.col("c_custkey").alias("custkey"))
    return o.exceptAll(c)


@register(
    "set-intersect-all",
    oracle="""
    SELECT o_custkey AS custkey FROM orders
    INTERSECT ALL
    SELECT c_custkey FROM customer
    """,
)
def set_intersect_all(spark, sf_dir):
    """INTERSECT ALL — multiset intersection: one row per matched
    occurrence pair, min(multiplicity) semantics. Same count-aggregate
    plan shape as set-except-all."""
    cat = views(spark, sf_dir)
    o = cat.table("orders").select(F.col("o_custkey").alias("custkey"))
    c = cat.table("customer").select(F.col("c_custkey").alias("custkey"))
    return o.intersectAll(c)


@register(
    "set-union-by-name",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice, NULL AS o_orderpriority
    FROM orders WHERE o_orderkey % 100 = 0
    UNION ALL BY NAME
    SELECT o_orderkey, o_orderstatus, NULL AS o_totalprice, o_orderpriority
    FROM orders WHERE o_orderkey % 100 = 50
    """,
)
def set_union_by_name(spark, sf_dir):
    """Schema-drift union — UNION ALL BY NAME: two relations with
    different column sets align by column NAME, null-filling what either
    side lacks (the schema-evolution read path every incremental table
    needs after a column is added; the same allowMissingColumns contract
    the merge materialization uses, materialize.py). A positional UNION
    would mis-align or reject these inputs.

    Zero-shuffle concatenation: unionByName is a plan-level operator, and
    both branches' filters reach their scans."""
    o = views(spark, sf_dir).table("orders")
    a = o.filter(F.col("o_orderkey") % 100 == 0).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    b = o.filter(F.col("o_orderkey") % 100 == 50).select(
        "o_orderkey", "o_orderstatus", "o_orderpriority"
    )
    return a.unionByName(b, allowMissingColumns=True)
