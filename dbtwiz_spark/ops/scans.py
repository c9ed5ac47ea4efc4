"""§2.1 Scans / sources / sinks (read-side corpus entries).

Write-side materializations (CTAS, insert_overwrite, merge, copy, delete,
time travel) live in ``dbtwiz_spark.materialize`` with their own tests; the
corpus entries here are the oracle-checkable read paths.

Reference parity: scan-table ≈ dbtwiz reading `project.dataset.table`
(dbtwiz/integrations/bigquery.py:995); scan-view ≈ view reads
(bigquery.py:700-711); scan-info-schema ≈ the INFORMATION_SCHEMA catalog
scan in orphan cleanup (dbtwiz/admin/cleanup.py:64-77).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dbtwiz_spark.ops.common import views
from dbtwiz_spark.ops.registry import register
from dbtwiz_spark.catalog import TABLES


@register("scan-table", oracle="SELECT r_regionkey, r_name FROM region")
def scan_table(spark, sf_dir):
    """Full scan of a table by name (dbtwiz/integrations/bigquery.py:995)."""
    cat = views(spark, sf_dir)
    return cat.table("region").select("r_regionkey", "r_name")


@register(
    "scan-view",
    oracle="""
    WITH open_orders AS (
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders WHERE o_orderstatus = 'O'
    )
    SELECT o_custkey, COUNT(*) AS n_open
    FROM open_orders GROUP BY o_custkey
    """,
)
def scan_view(spark, sf_dir):
    """Read through a logical view (dbtwiz/integrations/bigquery.py:700-711)."""
    views(spark, sf_dir)
    spark.sql(
        "CREATE OR REPLACE TEMP VIEW open_orders AS "
        "SELECT o_orderkey, o_custkey, o_totalprice FROM orders "
        "WHERE o_orderstatus = 'O'"
    )
    return spark.sql(
        "SELECT o_custkey, COUNT(*) AS n_open FROM open_orders GROUP BY o_custkey"
    )


@register(
    "scan-info-schema",
    oracle=" UNION ALL ".join(f"SELECT '{t}' AS table_name" for t in sorted(TABLES)),
)
def scan_info_schema(spark, sf_dir):
    """Catalog scan: list registered tables (dbtwiz/admin/cleanup.py:64-77).

    The engine's analog of INFORMATION_SCHEMA.TABLES: temp views registered
    from the warehouse directory, filtered to the standard tables (the
    reference filters out `__dbt_tmp_%` scratch tables the same way).
    """
    views(spark, sf_dir)
    rows = [
        (t.name,)
        for t in spark.catalog.listTables()
        if t.name in TABLES and "__dbt_tmp_" not in t.name
    ]
    return spark.createDataFrame(sorted(rows), "table_name: string")


@register(
    "file-format-parquet",
    oracle="""
    SELECT 'lineitem' AS tbl, COUNT(*) AS n FROM lineitem
    UNION ALL SELECT 'orders' AS tbl, COUNT(*) AS n FROM orders
    UNION ALL SELECT 'events' AS tbl, COUNT(*) AS n FROM events
    """,
)
def file_format_parquet(spark, sf_dir):
    """Native parquet reads across tables (TESTDATA.md I/O contract)."""
    cat = views(spark, sf_dir)
    out = None
    for t in ("lineitem", "orders", "events"):
        part = cat.table(t).agg(F.count("*").alias("n")).select(
            F.lit(t).alias("tbl"), F.col("n")
        )
        out = part if out is None else out.unionByName(part)
    return out
