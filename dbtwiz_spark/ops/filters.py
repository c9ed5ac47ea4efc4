"""§2.2 Projections / filters / predicates.

Reference parity notes in each docstring; the reference generates these
predicate shapes in its catalog SQL (dbtwiz/admin/cleanup.py:64-77) and its
staging templates (dbtwiz/model/create.py:406-417).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dbtwiz_spark.ops.common import views
from dbtwiz_spark.ops.registry import register


@register("project-star", oracle="SELECT * FROM nation")
def project_star(spark, sf_dir):
    """SELECT * pass-through (staging template, dbtwiz/model/create.py:406)."""
    return views(spark, sf_dir).table("nation").select("*")


@register(
    "project-rename",
    oracle="""
    SELECT n_nationkey AS nation_key, n_name AS nation_name,
           n_regionkey AS region_key
    FROM nation
    """,
)
def project_rename(spark, sf_dir):
    """The `renamed` CTE pattern (dbtwiz/model/create.py:409-414)."""
    return views(spark, sf_dir).table("nation").select(
        F.col("n_nationkey").alias("nation_key"),
        F.col("n_name").alias("nation_name"),
        F.col("n_regionkey").alias("region_key"),
    )


@register(
    "project-computed",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS net_price,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge,
           strftime(l_shipdate, '%Y-%m-%d') AS ship_date
    FROM lineitem
    """,
)
def project_computed(spark, sf_dir):
    """Computed-column projection (cast/replace idiom, dbtwiz/admin/cleanup.py:73-74).

    Per-row double arithmetic is IEEE-deterministic, so no decimal guard is
    needed — only aggregations reorder additions.
    """
    li = views(spark, sf_dir).table("lineitem")
    net = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        net.alias("net_price"),
        (net * (1 + F.col("l_tax"))).alias("charge"),
        F.date_format("l_shipdate", "yyyy-MM-dd").alias("ship_date"),
    )


@register(
    "filter-predicate",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_discount
    FROM lineitem
    WHERE l_quantity > 30 AND (l_discount < 0.02 OR l_returnflag = 'R')
      AND NOT l_linestatus = 'O'
    """,
)
def filter_predicate(spark, sf_dir):
    """WHERE with boolean ops (generated SQL, dbtwiz/admin/cleanup.py:70-75)."""
    li = views(spark, sf_dir).table("lineitem")
    return li.filter(
        (F.col("l_quantity") > 30)
        & ((F.col("l_discount") < 0.02) | (F.col("l_returnflag") == "R"))
        & ~(F.col("l_linestatus") == "O")
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_discount")


@register(
    "filter-like",
    oracle="""
    SELECT p_partkey, p_name FROM part
    WHERE p_name LIKE '%widget%' AND p_name NOT LIKE 'small%'
    """,
)
def filter_like(spark, sf_dir):
    """LIKE pattern predicate (`not like '%__dbt_tmp_%'`, dbtwiz/admin/cleanup.py:71)."""
    p = views(spark, sf_dir).table("part")
    return p.filter(
        F.col("p_name").like("%widget%") & ~F.col("p_name").like("small%")
    ).select("p_partkey", "p_name")


@register(
    "filter-in",
    oracle="""
    SELECT o_orderkey, o_orderpriority FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
    """,
)
def filter_in(spark, sf_dir):
    """IN-list membership predicate."""
    o = views(spark, sf_dir).table("orders")
    return o.filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")).select(
        "o_orderkey", "o_orderpriority"
    )


@register(
    "filter-between",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    WHERE o_totalprice BETWEEN 1000 AND 5000
      AND o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
    """,
)
def filter_between(spark, sf_dir):
    """BETWEEN range predicate (expiry-window idiom, dbtwiz/admin/cleanup.py:72-75)."""
    o = views(spark, sf_dir).table("orders")
    return o.filter(
        F.col("o_totalprice").between(1000, 5000)
        & F.col("o_orderdate").between("1996-01-01", "1997-12-31")
    ).select("o_orderkey", "o_totalprice")


@register(
    "filter-null",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_orderstatus = 'P' THEN NULL ELSE o_orderstatus END AS st
    FROM orders
    WHERE (CASE WHEN o_orderstatus = 'P' THEN NULL ELSE o_orderstatus END) IS NOT NULL
    """,
)
def filter_null(spark, sf_dir):
    """NULL test (`{field} IS NOT NULL`, dbtwiz/admin/clustering.py:40).

    Testdata has no physical NULLs, so nulls are introduced via NULLIF-style
    CASE to exercise the predicate.
    """
    o = views(spark, sf_dir).table("orders")
    st = F.when(F.col("o_orderstatus") == "P", F.lit(None)).otherwise(
        F.col("o_orderstatus")
    )
    return o.select("o_orderkey", st.alias("st")).filter(F.col("st").isNotNull())


@register(
    "filter-partition-required",
    oracle="""
    SELECT date_trunc('day', ts) AS partitiondate, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS total_value
    FROM events
    WHERE date_trunc('day', ts) BETWEEN TIMESTAMP '2024-01-05' AND TIMESTAMP '2024-01-10'
    GROUP BY 1
    """,
)
def filter_partition_required(spark, sf_dir):
    """Partition-filter enforcement (dbtwiz/model/create.py:465 require_partition_filter).

    The engine-side pre-flight check is `plans.require_partition_filter`; this
    corpus entry runs a query that *passes* the check — a partition-pruned
    date-range scan over the events table (partition column: partitiondate =
    to_date(ts)).
    """
    from dbtwiz_spark.plans import require_partition_filter
    from dbtwiz_spark.ops.common import dsum

    ev = views(spark, sf_dir).table("events")
    df = (
        ev.withColumn("partitiondate", F.date_trunc("day", "ts"))
        .filter(
            F.col("partitiondate").between(
                F.lit("2024-01-05").cast("timestamp"),
                F.lit("2024-01-10").cast("timestamp"),
            )
        )
        .groupBy("partitiondate")
        .agg(F.count("*").alias("n"), dsum("value", "total_value"))
    )
    require_partition_filter(df, "partitiondate")
    return df


@register(
    "distinct",
    oracle="SELECT DISTINCT c_mktsegment, c_nationkey FROM customer",
)
def distinct(spark, sf_dir):
    """Duplicate elimination (also the base of the [EXT] dedup family)."""
    c = views(spark, sf_dir).table("customer")
    return c.select("c_mktsegment", "c_nationkey").distinct()


@register(
    "project-except-replace",
    oracle="""
    SELECT * EXCLUDE (o_orderdate, o_orderpriority)
           REPLACE (round(o_totalprice, 0) AS o_totalprice)
    FROM orders
    """,
)
def project_except_replace(spark, sf_dir):
    """SELECT * EXCEPT(...) REPLACE(...) (BigQuery surface; DuckDB spells it
    EXCLUDE): column pruning + in-place expression swap without enumerating
    the schema — on the DataFrame side, drop() + withColumn preserve column
    order exactly like the SQL form."""
    o = views(spark, sf_dir).table("orders")
    return o.drop("o_orderdate", "o_orderpriority").withColumn(
        "o_totalprice", F.round("o_totalprice", 0)
    )
