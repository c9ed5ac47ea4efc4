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


def _roundtrip(df, fmt: str, schema: str, options: dict | None = None):
    """Write ``df`` in ``fmt`` to a throwaway dir and read it back with an
    explicit schema — the source/sink contract for non-parquet formats.
    The oracle reads the original table, so the entry passes only when the
    round trip is lossless."""
    from dbtwiz_spark.ops.common import scratch_dir

    path = scratch_dir(f"{fmt}_")
    opts = options or {}
    df.write.mode("overwrite").options(**opts).format(fmt).save(path)
    reader = df.sparkSession.read.options(**opts)
    if fmt != "orc":  # orc embeds its schema
        reader = reader.schema(schema)
    return reader.format(fmt).load(path)


@register(
    "file-format-csv",
    oracle="SELECT n_nationkey, n_name, n_regionkey FROM nation",
)
def file_format_csv(spark, sf_dir):
    """CSV source/sink round trip (header + explicit schema on read — the
    external-table CSV contract; BigQuery analog: CSV external tables)."""
    n = views(spark, sf_dir).table("nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    return _roundtrip(
        n, "csv", "n_nationkey INT, n_name STRING, n_regionkey INT",
        {"header": "true"},
    )


@register(
    "file-format-json",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice
    FROM orders WHERE o_orderkey % 100 = 0
    """,
)
def file_format_json(spark, sf_dir):
    """JSON-lines source/sink round trip (doubles survive via shortest
    round-trip representation; schema explicit on read — no inference at
    100 TB)."""
    o = views(spark, sf_dir).table("orders")
    sub = o.filter(F.col("o_orderkey") % 100 == 0).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    return _roundtrip(
        sub, "json", "o_orderkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE"
    )


@register(
    "file-format-orc",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(28,6))) AS DOUBLE) AS total_bal
    FROM customer GROUP BY 1
    """,
)
def file_format_orc(spark, sf_dir):
    """ORC source/sink round trip (columnar alternative; schema embedded),
    aggregated after re-read so the whole read path is exercised."""
    from dbtwiz_spark.ops.common import dsum

    c = views(spark, sf_dir).table("customer").select("c_mktsegment", "c_acctbal")
    back = _roundtrip(c, "orc", "")
    return back.groupBy("c_mktsegment").agg(
        F.count("*").alias("n"), dsum("c_acctbal", "total_bal")
    )


def _profile_oracle() -> str:
    cols = (
        "o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice", "o_orderdate", "o_orderpriority",
    )
    parts = [
        f"""SELECT '{c}' AS col_name,
               CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_nulls,
               CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct
        FROM orders"""
        for c in cols
    ]
    return "\nUNION ALL\n".join(parts)


@register("scan-profile-table", oracle=_profile_oracle())
def scan_profile_table(spark, sf_dir):
    """Column-level table profile (null count + exact distinct count per
    column) -- the inspection pass behind every warehouse catalog /
    data-quality UI, and the reference's freshness/partition inspection
    plane generalized to per-column stats. One row per column of
    ``orders``, exact integers only.

    Scale: a SINGLE scan computes all 12 aggregates at once (Spark
    rewrites multiple COUNT(DISTINCT) into one expand + two-level
    partial aggregation -- 6x fewer passes than the naive per-column
    loop the oracle spells out), then `stack` unpivots the 1-row result
    driver-side-free. Exact distinct at 100 TB is a real shuffle per
    distinct column by design; the cheap estimate variant is
    agg-approx-count-distinct."""
    o = views(spark, sf_dir).table("orders")
    cols = (
        "o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice", "o_orderdate", "o_orderpriority",
    )
    aggs = []
    for c in cols:
        aggs.append(
            F.sum(F.col(c).isNull().cast("long")).alias(f"nn_{c}")
        )
        aggs.append(F.countDistinct(c).alias(f"nd_{c}"))
    one = o.agg(*aggs)
    stack = ", ".join(f"'{c}', nn_{c}, nd_{c}" for c in cols)
    return one.select(
        F.expr(
            f"stack({len(cols)}, {stack}) AS (col_name, n_nulls, n_distinct)"
        )
    )
