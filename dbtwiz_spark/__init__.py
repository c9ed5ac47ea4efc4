"""dbtwiz_spark — a PySpark-native analytics engine.

A brand-new engine providing the query and data-processing capabilities of
the reference orchestrator (amedia/dbtwiz, surveyed in SURVEY.md), rebuilt
Spark-first: the relational plane is Spark SQL / DataFrame + Catalyst, the
materialization plane is parquet writes with dynamic partition overwrite +
engine-managed snapshots, and the DAG/metadata plane is an engine-side model
registry executed in topological order.

Layout:
    session.py      SparkSession factory (AQE, dynamic partition overwrite)
    catalog.py      testdata/table loading, temp views, columnar cache prime
    types.py        BigQuery<->Spark type mapping (SURVEY §1.2)
    manifest.py     Model/Source registry, DAG closure, selectors
    project.py      on-disk project (models/*.sql + YAML) -> Manifest
    macros.py       Jinja macro layer (ref/source/var/interval_*/scd2)
    materialize.py  view | table | insert_overwrite | merge | scd2 writes
    runner.py       manifest -> macros -> Catalyst -> materializer
    backfill.py     date chunking + cost-based batch sizing + retry journal
    admin.py        orphan detection, partition expiry, restore, grants
    cli.py          build/test/manifest/backfill/admin command tree
    multimodal.py   binary payload columns + Arrow-batched decode plumbing
    plans.py        plan pre-flight checks (require_partition_filter)
    ops/            SURVEY §2 operator corpus (queries + DuckDB oracles)
    streaming/      Structured Streaming adapters over the events table

Scale design rationale: SCALING.md (plan audits in tests/test_plans.py).
"""

__version__ = "0.1.0"

from dbtwiz_spark.session import get_spark  # noqa: F401
from dbtwiz_spark.catalog import Catalog, TABLES  # noqa: F401
