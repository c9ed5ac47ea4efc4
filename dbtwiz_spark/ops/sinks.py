"""§2.1 write path as oracle-checked corpus entries.

Each entry exercises a Warehouse materialization end-to-end in a throwaway
directory and returns the resulting table state, which the DuckDB oracle
reproduces declaratively. The write path itself is the unit under test:
CTAS, view, incremental insert_overwrite, merge upsert, copy, delete, and
time travel (reference semantics: dbtwiz/model/create.py:455-470,
dbtwiz/integrations/bigquery.py:389-462,644-735).

Scale notes: every materialization here writes through
``Warehouse.write_table`` / ``insert_overwrite``, which are plain
distributed parquet writes (dynamic partition overwrite for incremental) —
the sf0.01 temp-dir run and a 100 TB cluster run execute the identical
plan shape; only file counts change.
"""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from dbtwiz_spark.materialize import Warehouse
from dbtwiz_spark.ops.common import hkey, hkey_sql, scratch_dir, views
from dbtwiz_spark.ops.registry import register


def _wh(spark) -> Warehouse:
    return Warehouse(spark, scratch_dir("sink_"))


@register(
    "sink-table-create",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
    FROM orders GROUP BY 1, 2
    """,
)
def sink_table_create(spark, sf_dir):
    """CTAS / full-table materialization (dbt `table`,
    dbtwiz/core/project.py:278, executed via dbtwiz/commands/build.py:97-124):
    write the aggregate, then read the published table back."""
    o = views(spark, sf_dir).table("orders")
    wh = _wh(spark)
    wh.write_table(
        "order_counts",
        o.groupBy("o_orderstatus", "o_orderpriority").agg(F.count("*").alias("n")),
        snapshot=False,
    )
    return wh.read("order_counts")


@register(
    "sink-view-create",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n_customers
    FROM customer WHERE c_acctbal > 0 GROUP BY 1
    """,
)
def sink_view_create(spark, sf_dir):
    """View materialization (dbtwiz/integrations/bigquery.py:700-711):
    store SQL, read through the registered view."""
    views(spark, sf_dir)
    wh = _wh(spark)
    wh.create_view(
        "active_by_segment",
        "SELECT c_mktsegment, COUNT(*) AS n_customers "
        "FROM customer WHERE c_acctbal > 0 GROUP BY c_mktsegment",
    )
    return wh.read("active_by_segment")


@register(
    "sink-insert-overwrite",
    oracle="""
    SELECT strftime(o_orderdate, '%Y-%m') AS o_month,
           o_orderstatus, COUNT(*) AS n
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1995-01-01'
      AND o_orderdate < TIMESTAMP '1995-05-01'
    GROUP BY 1, 2
    """,
)
def sink_insert_overwrite(spark, sf_dir):
    """Incremental insert_overwrite (dbtwiz/model/create.py:456-460): build
    Jan-Mar, then one incremental run that rewrites Feb-Mar (idempotent
    replay) and adds Apr. Final state == one-shot recompute of Jan-Apr —
    the idempotency contract the oracle checks."""
    o = views(spark, sf_dir).table("orders")

    def month_counts(lo: str, hi: str):
        return (
            o.filter((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi))
            .groupBy(
                F.date_format("o_orderdate", "yyyy-MM").alias("o_month"),
                "o_orderstatus",
            )
            .agg(F.count("*").alias("n"))
        )

    wh = _wh(spark)
    wh.insert_overwrite("daily", month_counts("1995-01-01", "1995-04-01"), "o_month")
    wh.insert_overwrite("daily", month_counts("1995-02-01", "1995-05-01"), "o_month")
    return wh.read("daily").select("o_month", "o_orderstatus", "n")


@register(
    "sink-merge",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_nationkey = 1 THEN c_acctbal + 100.0 ELSE c_acctbal END AS bal
    FROM customer
    UNION ALL
    SELECT c_custkey + 1000000 AS c_custkey, c_acctbal AS bal
    FROM customer WHERE c_nationkey = 2
    """,
)
def sink_merge(spark, sf_dir):
    """MERGE upsert by unique key (dbtwiz/model/create.py:467-470): matched
    keys replaced (nation-1 balance bump), unmatched inserted (synthetic
    keys from nation 2), everyone else survives."""
    c = views(spark, sf_dir).table("customer")
    wh = _wh(spark)
    wh.write_table("accounts", c.select("c_custkey", F.col("c_acctbal").alias("bal")), snapshot=False)
    updates = (
        c.filter(F.col("c_nationkey") == 1)
        .select("c_custkey", (F.col("c_acctbal") + 100.0).alias("bal"))
        .unionByName(
            c.filter(F.col("c_nationkey") == 2).select(
                (F.col("c_custkey") + 1_000_000).alias("c_custkey"),
                F.col("c_acctbal").alias("bal"),
            )
        )
    )
    wh.merge("accounts", updates, unique_key="c_custkey")
    return wh.read("accounts")


@register(
    "sink-copy-table",
    oracle="SELECT s_suppkey, s_name, s_acctbal FROM supplier",
)
def sink_copy_table(spark, sf_dir):
    """Table copy (dbtwiz/integrations/bigquery.py:644-735): write, copy to a
    new id, read the copy."""
    s = views(spark, sf_dir).table("supplier")
    wh = _wh(spark)
    wh.write_table("suppliers", s.select("s_suppkey", "s_name", "s_acctbal"), snapshot=False)
    wh.copy_table("suppliers", "suppliers_backup")
    return wh.read("suppliers_backup")


@register(
    "sink-delete-table",
    oracle="SELECT 'kept' AS table_name, COUNT(*) AS n FROM region",
)
def sink_delete_table(spark, sf_dir):
    """DROP TABLE (dbtwiz/integrations/bigquery.py:389-395; bulk dev wipe
    dbtwiz/admin/cleanup.py:15-43): after deleting one of two tables, only
    the survivor is readable."""
    r = views(spark, sf_dir).table("region")
    wh = _wh(spark)
    wh.write_table("kept", r, snapshot=False)
    wh.write_table("doomed", r, snapshot=False)
    wh.delete_table("doomed")
    assert not wh.exists("doomed") and wh.exists("kept")
    return (
        wh.read("kept")
        .groupBy(F.lit("kept").alias("table_name"))
        .agg(F.count("*").alias("n"))
    )


@register(
    "scan-time-travel",
    oracle="""
    SELECT n_nationkey, n_name, 1 AS version FROM nation
    """,
)
def scan_time_travel(spark, sf_dir):
    """Time-travel read (BigQuery `table@ms` decorator,
    dbtwiz/integrations/bigquery.py:412-462): v1 is snapshotted by the v2
    overwrite; reading at a pre-overwrite timestamp returns v1."""
    n = views(spark, sf_dir).table("nation")
    wh = _wh(spark)
    v1 = n.select("n_nationkey", "n_name", F.lit(1).alias("version"))
    v2 = n.select("n_nationkey", F.upper("n_name").alias("n_name"), F.lit(2).alias("version"))
    wh.write_table("dim_nation", v1, snapshot=False)
    wh.write_table("dim_nation", v2, snapshot=True)  # snapshots v1 first
    return wh.read_snapshot("dim_nation", at_ms=int(time.time() * 1000)).select(
        "n_nationkey", "n_name", "version"
    )


@register(
    "source-declare",
    oracle="""
    SELECT column_name, column_type AS data_type
    FROM (DESCRIBE SELECT * FROM customer)
    """,
)
def source_declare(spark, sf_dir):
    """Source registration with schema introspection
    (dbtwiz/source/create.py:326-404 + dbtwiz/integrations/bigquery.py:163-186):
    declare the external parquet as a source and emit its introspected
    schema through the engine's type vocabulary (types.py §1.2 map)."""
    from dbtwiz_spark.types import spark_type_to_sql

    cat = views(spark, sf_dir)
    schema = cat.table("customer").schema
    rows = [(f.name, spark_type_to_sql(f.dataType)) for f in schema.fields]
    return spark.createDataFrame(rows, "column_name string, data_type string")


@register(
    "sink-scd2",
    oracle="""
    WITH h AS (
        SELECT c_custkey, '2024-01-01' AS snap_date, c_acctbal AS bal
        FROM customer
        UNION ALL
        SELECT c_custkey, '2024-02-01', c_acctbal + 50.0
        FROM customer WHERE c_custkey % 10 = 0),
    r AS (
        SELECT *, LEAD(snap_date) OVER (PARTITION BY c_custkey
                                        ORDER BY snap_date) AS valid_to
        FROM h)
    SELECT c_custkey, snap_date, bal, snap_date AS valid_from, valid_to,
           valid_to IS NULL AS is_current
    FROM r
    """,
)
def sink_scd2(spark, sf_dir):
    """SCD2 materialization end-to-end (dbtwiz/model/create.py:418-429 scd2
    macro semantics: daily grain appended, validity intervals rebuilt with
    lead() over the partition date): an initial full snapshot, then an
    incremental run restating 10% of the keys at a later date. The engine
    path (materialize.scd2_apply) re-windows ONLY the affected keys'
    history and rewrites only their partitions; the oracle rebuilds the
    whole interval table declaratively — matching means the
    partition-scoped incremental path equals the from-scratch recompute,
    the same idempotency contract sink-insert-overwrite pins.

    Dates flow as 'yyyy-MM-dd' strings (hive partition columns read back
    as STRING engine-wide; lexicographic order == chronological)."""
    c = views(spark, sf_dir).table("customer")
    wh = _wh(spark)
    day1 = c.select(
        "c_custkey",
        F.lit("2024-01-01").alias("snap_date"),
        F.col("c_acctbal").alias("bal"),
    )
    wh.scd2_apply("cust_hist", day1, "c_custkey", "snap_date")
    day2 = c.filter(F.col("c_custkey") % 10 == 0).select(
        "c_custkey",
        F.lit("2024-02-01").alias("snap_date"),
        (F.col("c_acctbal") + 50.0).alias("bal"),
    )
    wh.scd2_apply("cust_hist", day2, "c_custkey", "snap_date")
    return wh.read("cust_hist").select(
        "c_custkey", "snap_date", "bal", "valid_from", "valid_to", "is_current"
    )


@register(
    "sink-sharded-export",
    oracle=f"""
    SELECT CAST(({hkey_sql('doc_id')}) % 8 AS BIGINT) AS shard,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents GROUP BY 1
    """,
)
def sink_sharded_export(spark, sf_dir):
    """Sharded training-data export: write the corpus as a fixed number of
    deterministic hash shards (the final step before a training job reads
    the data — fixed shard count lets the trainer assign shards to data
    loader workers, and the hash makes re-exports byte-stable so a resumed
    training run sees identical shards).

    The shard key is the same exact-BIGINT multiplicative hash the
    split/sample ops use (engine-portable, retry-stable — never
    ``rand()`` or Spark's partition-dependent ``monotonically_increasing_
    id``). The write path's own distribution policy
    (materialize._distribute_for_write) keys the pre-write exchange on the
    shard column — parallel writers into the 8 hive shard directories, one
    shuffle, REBALANCE-sized files above the small-output threshold.
    Returns the per-shard manifest read back from the published files —
    the oracle recomputes it declaratively from the hash definition."""
    d = views(spark, sf_dir).table("documents")
    shard = (hkey(F.col("doc_id")) % 8).cast("long")
    wh = _wh(spark)
    wh.write_table(
        "export_shards",
        d.withColumn("shard", shard),
        partition_by="shard",
        snapshot=False,
    )
    return (
        wh.read("export_shards")
        .groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
        .select(F.col("shard").cast("long").alias("shard"), "n_docs", "total_chars")
    )


@register(
    "sink-cdc-apply",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_nationkey = 1 THEN c_acctbal + 100.0
                WHEN c_nationkey = 5 THEN c_acctbal + 9.0
                ELSE c_acctbal END AS bal
    FROM customer WHERE c_nationkey NOT IN (2, 4)
    UNION ALL
    SELECT c_custkey + 1000000 AS c_custkey, c_acctbal AS bal
    FROM customer WHERE c_nationkey = 3
    """,
)
def sink_cdc_apply(spark, sf_dir):
    """CDC changelog application (Warehouse.apply_changes): a batch of
    (op, seq, key, row) change events — the Debezium-style ingest feed a
    warehouse sits downstream of — collapses to latest-event-per-key and
    applies in one rewrite: 'D' deletes the key, 'I'/'U' upsert.

    The changelog exercises every ordering case: nation-1 keys get TWO
    updates (seq 1 then 2 — the later one must win), nation-2 keys a
    delete, nation-3 keys an insert under new ids, nation-4 an update
    THEN a delete (net: gone), nation-5 a delete THEN an update (net:
    re-inserted). Scale shape: the per-key window runs over the CHANGES
    batch only, then the same anti-join + union rewrite as sink-merge —
    never a second scan of the base table."""
    c = views(spark, sf_dir).table("customer")
    wh = _wh(spark)
    wh.write_table(
        "accounts_cdc",
        c.select("c_custkey", F.col("c_acctbal").alias("bal")),
        snapshot=False,
    )

    def ev(pred, op, seq, bal_expr):
        return c.filter(pred).select(
            "c_custkey",
            F.lit(op).alias("op"),
            F.lit(seq).cast("int").alias("seq"),
            bal_expr.alias("bal"),
        )

    nat = F.col("c_nationkey")
    bal = F.col("c_acctbal")
    changes = (
        ev(nat == 1, "U", 1, bal + 50.0)
        .unionByName(ev(nat == 1, "U", 2, bal + 100.0))
        .unionByName(ev(nat == 2, "D", 1, F.lit(None).cast("double")))
        .unionByName(ev(nat == 4, "U", 1, bal + 7.0))
        .unionByName(ev(nat == 4, "D", 2, F.lit(None).cast("double")))
        .unionByName(ev(nat == 5, "D", 1, F.lit(None).cast("double")))
        .unionByName(ev(nat == 5, "U", 2, bal + 9.0))
        .unionByName(
            c.filter(nat == 3).select(
                (F.col("c_custkey") + 1_000_000).alias("c_custkey"),
                F.lit("I").alias("op"),
                F.lit(1).cast("int").alias("seq"),
                bal.alias("bal"),
            )
        )
    )
    wh.apply_changes("accounts_cdc", changes, unique_key="c_custkey")
    return wh.read("accounts_cdc")


@register(
    "sink-scd2-hard-delete",
    oracle="""
    SELECT c_custkey,
           '2024-01-01' AS valid_from,
           CASE WHEN c_custkey % 10 = 0 THEN '2024-02-01' END AS valid_to,
           c_custkey % 10 <> 0 AS is_current
    FROM customer
    """,
)
def sink_scd2_hard_delete(spark, sf_dir):
    """SCD2 hard-delete invalidation (dbt snapshot
    ``invalidate_hard_deletes``; the reference's scd2 models inherit dbt
    snapshot semantics): after the initial snapshot, 10% of the keys
    VANISH from the next source snapshot, and
    ``materialize.scd2_invalidate_deletes`` closes exactly their open
    intervals at the run date — a deleted upstream record must stop
    being current, not live forever. The oracle states the end condition
    declaratively; matching means the engine's anti-join + partition-
    scoped rewrite equals the from-scratch truth. Re-running is a no-op
    (already-closed keys aren't current, so the anti-join finds
    nothing).

    Scale: the gone-key detection is one anti-join bounded by CURRENT
    intervals (never history); only partitions holding a closed row
    rewrite."""
    c = views(spark, sf_dir).table("customer")
    wh = _wh(spark)
    day1 = c.select(
        "c_custkey",
        F.lit("2024-01-01").alias("snap_date"),
        F.col("c_acctbal").alias("bal"),
    )
    wh.scd2_apply("cust_hist_hd", day1, "c_custkey", "snap_date")
    still_there = c.filter(F.col("c_custkey") % 10 != 0).select("c_custkey")
    wh.scd2_invalidate_deletes(
        "cust_hist_hd", still_there, "c_custkey", "snap_date", "2024-02-01"
    )
    return wh.read("cust_hist_hd").select(
        "c_custkey", "valid_from", "valid_to", "is_current"
    )


@register(
    "scan-snapshot-diff",
    oracle="""
    WITH v1 AS (
        SELECT c_custkey, c_mktsegment FROM customer),
    v2 AS (
        SELECT c_custkey,
               CASE WHEN c_custkey % 7 = 0 THEN 'CHANGED'
                    ELSE c_mktsegment END AS c_mktsegment
        FROM customer WHERE c_custkey % 5 <> 0
        UNION ALL
        SELECT c_custkey + 1000000, 'NEWSEG' FROM customer
        WHERE c_custkey % 11 = 0)
    SELECT change_type, CAST(COUNT(*) AS BIGINT) AS n_rows FROM (
        SELECT 'added' AS change_type FROM v2
        LEFT JOIN v1 USING (c_custkey) WHERE v1.c_custkey IS NULL
        UNION ALL
        SELECT 'removed' FROM v1
        LEFT JOIN v2 USING (c_custkey) WHERE v2.c_custkey IS NULL
        UNION ALL
        SELECT 'changed' FROM v1 JOIN v2 USING (c_custkey)
        WHERE v1.c_mktsegment <> v2.c_mktsegment
        UNION ALL
        SELECT 'unchanged' FROM v1 JOIN v2 USING (c_custkey)
        WHERE v1.c_mktsegment = v2.c_mktsegment)
    GROUP BY 1
    """,
)
def scan_snapshot_diff(spark, sf_dir):
    """Snapshot diff: classify every key across two table versions as
    added / removed / changed / unchanged -- the audit a warehouse runs
    after any backfill or migration ("what did that run actually
    touch?"), and the read-side complement of sink-cdc-apply (CDC
    *applies* a changelog; this RECOVERS one from two snapshots). The
    engine path overwrites the table (auto-snapshotting v1), reads v1
    back through the SAME time-travel decorator as scan-time-travel,
    and full-outer-joins the two versions; the oracle states the diff
    declaratively from the base data. All counts exact.

    Scale: one full outer join keyed on the PK (co-partitioned if both
    versions are bucketed), one 4-key reduce. The diff never
    materializes row pairs beyond the join itself."""
    c = views(spark, sf_dir).table("customer")
    wh = _wh(spark)
    v1 = c.select("c_custkey", "c_mktsegment")
    v2 = (
        c.filter(F.col("c_custkey") % 5 != 0)
        .select(
            "c_custkey",
            F.when(F.col("c_custkey") % 7 == 0, F.lit("CHANGED"))
            .otherwise(F.col("c_mktsegment"))
            .alias("c_mktsegment"),
        )
        .unionAll(
            c.filter(F.col("c_custkey") % 11 == 0).select(
                (F.col("c_custkey") + 1000000).alias("c_custkey"),
                F.lit("NEWSEG").alias("c_mktsegment"),
            )
        )
    )
    wh.write_table("cust_snap_diff", v1, snapshot=False)
    wh.write_table("cust_snap_diff", v2, snapshot=True)  # snapshots v1
    old = wh.read_snapshot(
        "cust_snap_diff", at_ms=int(time.time() * 1000)
    ).select("c_custkey", F.col("c_mktsegment").alias("seg_old"))
    new = wh.read("cust_snap_diff").select(
        "c_custkey", F.col("c_mktsegment").alias("seg_new")
    )
    diff = old.join(new, "c_custkey", "full_outer").select(
        F.when(F.col("seg_old").isNull(), "added")
        .when(F.col("seg_new").isNull(), "removed")
        .when(F.col("seg_old") != F.col("seg_new"), "changed")
        .otherwise("unchanged")
        .alias("change_type")
    )
    return diff.groupBy("change_type").agg(F.count("*").alias("n_rows"))


@register(
    "join-scd2-point-in-time",
    oracle="""
    WITH h AS (
        SELECT c_custkey, '2024-01-01' AS snap_date, c_acctbal AS bal
        FROM customer
        UNION ALL
        SELECT c_custkey, '2024-02-01', c_acctbal + 50.0
        FROM customer WHERE c_custkey % 10 = 0),
    dim AS (
        SELECT *, snap_date AS valid_from,
               LEAD(snap_date) OVER (PARTITION BY c_custkey
                                     ORDER BY snap_date) AS valid_to
        FROM h),
    probes AS (
        SELECT c_custkey,
               CASE WHEN c_custkey % 2 = 0 THEN '2024-01-15'
                    ELSE '2024-02-15' END AS as_of
        FROM customer)
    SELECT p.c_custkey, p.as_of, d.bal,
           d.valid_from AS version_from
    FROM probes p JOIN dim d
      ON d.c_custkey = p.c_custkey
     AND d.valid_from <= p.as_of
     AND (d.valid_to IS NULL OR p.as_of < d.valid_to)
    """,
)
def join_scd2_point_in_time(spark, sf_dir):
    """Point-in-time dimension lookup against an SCD2 table: each probe
    (key, as-of date) joins to the ONE version whose validity interval
    covers it -- THE query every SCD2 dimension exists to answer
    ("what did this customer look like when the order shipped?"), and
    the consumption side of sink-scd2's write path. The dim builds
    through the REAL warehouse scd2 materialization, then the lookup is
    an equi-join on the key plus the interval predicate -- never a
    between-only range join (the key equi-join is what keeps it a hash
    join with a residual filter at any scale). Dates are 'yyyy-MM-dd'
    strings (lexicographic == chronological, the sink-scd2 convention);
    every probe matches exactly one version, pinned in tests.

    Scale: one co-keyed hash join; per-key version chains are short by
    construction (SCD2 grain = change events), so the residual interval
    filter touches a bounded set per probe."""
    c = views(spark, sf_dir).table("customer")
    wh = _wh(spark)
    day1 = c.select(
        "c_custkey",
        F.lit("2024-01-01").alias("snap_date"),
        F.col("c_acctbal").alias("bal"),
    )
    wh.scd2_apply("cust_hist_pit", day1, "c_custkey", "snap_date")
    day2 = c.filter(F.col("c_custkey") % 10 == 0).select(
        "c_custkey",
        F.lit("2024-02-01").alias("snap_date"),
        (F.col("c_acctbal") + 50.0).alias("bal"),
    )
    wh.scd2_apply("cust_hist_pit", day2, "c_custkey", "snap_date")
    dim = wh.read("cust_hist_pit")
    probes = c.select(
        "c_custkey",
        F.when(F.col("c_custkey") % 2 == 0, "2024-01-15")
        .otherwise("2024-02-15")
        .alias("as_of"),
    )
    d = dim.select(
        F.col("c_custkey").alias("dk"), "bal", "valid_from", "valid_to"
    )
    return (
        probes.join(d, probes.c_custkey == d.dk)
        .filter(
            (F.col("valid_from") <= F.col("as_of"))
            & (F.col("valid_to").isNull() | (F.col("as_of") < F.col("valid_to")))
        )
        .select(
            "c_custkey", "as_of", "bal", F.col("valid_from").alias("version_from")
        )
    )
