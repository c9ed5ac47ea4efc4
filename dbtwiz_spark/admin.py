"""Admin plane: desired-state vs actual-state reconciliation (§3.3).

Every reference admin command is a diff-then-apply pipeline; here the
catalog is the warehouse directory plus the model manifest, and the diffs
are the set/anti-join operators from the corpus:

- orphaned:        catalog ∖ manifest (dbtwiz/admin/cleanup.py:46-101)
- cleandev:        drop all tables in a dev warehouse (cleanup.py:15-43)
- partition expiry: declared expiry vs partition ages → GC
                    (dbtwiz/integrations/bigquery.py:464-501,
                     dbtwiz/admin/partition.py:80-126)
- restore:         snapshot copy-back (dbtwiz/admin/restore.py)
- sync-descriptions: YAML descriptions → table/column metadata
                    (dbtwiz/admin/descriptions.py:217-251)
- grants:          desired − current / current − desired
                    (dbtwiz/admin/grants.py:278-280,369-419)
"""

from __future__ import annotations

import json
import shutil
from dataclasses import dataclass
from datetime import date, datetime
from pathlib import Path

from dbtwiz_spark.manifest import Manifest
from dbtwiz_spark.materialize import SNAPSHOT_DIRNAME, Warehouse

TMP_MARKER = "__tmp_"  # engine scratch tables (≈ BigQuery __dbt_tmp_%)


def list_catalog_tables(warehouse: Warehouse) -> list[str]:
    """The INFORMATION_SCHEMA analog: physical tables in the warehouse dir,
    excluding scratch tables (dbtwiz/admin/cleanup.py:71)."""
    root = Path(warehouse.root)
    if not root.exists():
        return []
    return sorted(
        p.name
        for p in root.iterdir()
        if p.is_dir() and TMP_MARKER not in p.name and p.name != SNAPSHOT_DIRNAME
    )


def find_orphaned(warehouse: Warehouse, manifest: Manifest) -> list[str]:
    """Tables in the warehouse but not in the manifest — the anti-join core
    (dbtwiz/admin/cleanup.py:89-101, incl. the empty-manifest guard)."""
    declared = {
        n for n, m in manifest.models.items() if m.materialized != "ephemeral"
    }
    if not declared:  # guard: never flag everything (cleanup.py:96-98)
        return []
    return [t for t in list_catalog_tables(warehouse) if t not in declared]


def cleandev(warehouse: Warehouse, dry_run: bool = True) -> list[str]:
    """Drop every table in a dev warehouse (dbtwiz/admin/cleanup.py:15-43)."""
    tables = list_catalog_tables(warehouse)
    if not dry_run:
        for t in tables:
            warehouse.delete_table(t)
    return tables


# -- partition expiry --------------------------------------------------------


def partition_ages(warehouse: Warehouse, table: str, partition_col: str) -> dict[str, int]:
    """Days since each partition's date value (hive-style dirs col=value)."""
    today = date.today()
    out = {}
    for p in Path(warehouse.path(table)).glob(f"{partition_col}=*"):
        val = p.name.split("=", 1)[1][:10]
        try:
            d = date.fromisoformat(val)
        except ValueError:
            continue
        out[p.name] = (today - d).days
    return out


def expire_partitions(
    warehouse: Warehouse, table: str, partition_col: str, expiration_days: int, dry_run: bool = True
) -> list[str]:
    """Delete partitions older than the declared expiry — the engine's
    partition-expiration (dbtwiz/integrations/bigquery.py:464-501)."""
    doomed = [
        name
        for name, age in partition_ages(warehouse, table, partition_col).items()
        if age > expiration_days
    ]
    if not dry_run:
        for name in doomed:
            shutil.rmtree(Path(warehouse.path(table)) / name)
    return sorted(doomed)


def expiry_mismatches(
    warehouse: Warehouse, manifest: Manifest, partition_col: str = "partitiondate"
) -> dict[str, tuple[int | None, int | None]]:
    """Declared expiry vs oldest live partition age, per incremental model
    (dbtwiz/admin/partition.py:80-126 mismatch report)."""
    out = {}
    for name, m in manifest.models.items():
        if m.materialized != "incremental" or not warehouse.exists(name):
            continue
        ages = partition_ages(warehouse, name, m.partition_by or partition_col)
        oldest = max(ages.values()) if ages else None
        if m.partition_expiration_days and oldest and oldest > m.partition_expiration_days:
            out[name] = (m.partition_expiration_days, oldest)
    return out


# -- descriptions ------------------------------------------------------------


@dataclass
class TableProperties:
    """Engine-side table metadata store (BigQuery table PATCH analog:
    dbtwiz/integrations/bigquery.py:503-568). Persisted as JSON next to the
    table data so it survives overwrites."""

    warehouse: Warehouse

    def _path(self, table: str) -> Path:
        return Path(self.warehouse.root) / f"{table}.properties.json"

    def get(self, table: str) -> dict:
        from dbtwiz_spark.fsutil import read_json_state

        # torn properties degrade to {} (descriptions re-sync next run)
        return read_json_state(self._path(table), "properties")

    def set(self, table: str, props: dict) -> None:
        from dbtwiz_spark.fsutil import atomic_write_text

        merged = self.get(table) | props
        atomic_write_text(
            self._path(table), json.dumps(merged, indent=1, sort_keys=True)
        )


def sync_descriptions(
    warehouse: Warehouse, manifest: Manifest, props: TableProperties | None = None
) -> dict[str, dict]:
    """Diff declared descriptions against stored ones, apply only changes
    (dbtwiz/admin/descriptions.py:147-172 diff, :206-214 apply)."""
    props = props or TableProperties(warehouse)
    applied = {}
    for name, m in manifest.models.items():
        desired = {"description": m.description, **{
            f"column.{c}": d for c, d in (m.meta.get("column_descriptions") or {}).items()
        }}
        desired = {k: v for k, v in desired.items() if v}
        current = props.get(name)
        delta = {k: v for k, v in desired.items() if current.get(k) != v}
        if delta:
            props.set(name, delta)
            applied[name] = delta
    return applied


# -- grants ------------------------------------------------------------------


@dataclass
class GrantStore:
    """Declarative ACLs as table properties (role -> set of principals)."""

    props: TableProperties
    key: str = "grants"

    def current(self, table: str) -> dict[str, list[str]]:
        return self.props.get(table).get(self.key, {})

    def apply(self, table: str, grants: dict[str, list[str]]) -> None:
        self.props.set(table, {self.key: {r: sorted(p) for r, p in grants.items()}})


def reconcile_grants(
    store: GrantStore, table: str, desired: dict[str, set[str]]
) -> tuple[dict[str, set[str]], dict[str, set[str]]]:
    """The grants diff (dbtwiz/admin/grants.py:278-280):
    returns (needs_granting, needs_revoking) and applies the result."""
    current = {r: set(p) for r, p in store.current(table).items()}
    roles = set(current) | set(desired)
    needs_granting = {
        r: desired.get(r, set()) - current.get(r, set()) for r in roles
    }
    needs_revoking = {
        r: current.get(r, set()) - desired.get(r, set()) for r in roles
    }
    needs_granting = {r: s for r, s in needs_granting.items() if s}
    needs_revoking = {r: s for r, s in needs_revoking.items() if s}
    store.apply(table, {r: sorted(s) for r, s in desired.items() if s})
    return needs_granting, needs_revoking


def update_grants(
    warehouse: Warehouse, manifest: Manifest, props: TableProperties | None = None
) -> dict[str, tuple[dict, dict]]:
    """Resolve desired grants from model meta (``meta.grants: {role:
    [principals]}`` — the reference resolves desired state from config,
    dbtwiz/admin/grants.py:109-179) and reconcile each table."""
    props = props or TableProperties(warehouse)
    store = GrantStore(props)
    out = {}
    for name, m in manifest.models.items():
        desired = {r: set(p) for r, p in (m.meta.get("grants") or {}).items()}
        if not desired and not store.current(name):
            continue
        granting, revoking = reconcile_grants(store, name, desired)
        if granting or revoking:
            out[name] = (granting, revoking)
    return out


# -- clustering (dbtwiz/admin/clustering.py:29-57) ---------------------------


def recluster(
    warehouse: Warehouse,
    table: str,
    partition_by: str | None,
    cluster_by: list[str],
) -> None:
    """Re-cluster an existing table: read → repartition(partition) →
    sortWithinPartitions(cluster cols) → overwrite. The engine analog of the
    reference's clustering-spec update + `UPDATE t SET c=c WHERE true`
    rewrite trigger; parquet min/max page stats then give block skipping."""
    df = warehouse.read(table)
    warehouse.write_table(table, df, partition_by, cluster_by, snapshot=False)


# -- freshness (docs/freshness.md capability) --------------------------------


def check_freshness(
    warehouse: Warehouse, table: str, loaded_at_column: str, max_age_hours: float
) -> tuple[bool, float]:
    """max(loaded_at) vs watermark (the documented-but-removed
    `dbtwiz freshness` command, docs/freshness.md:1-7)."""
    from pyspark.sql import functions as F

    latest = warehouse.read(table).agg(F.max(loaded_at_column).alias("m")).first().m
    return _age_ok(latest, max_age_hours)


def _age_ok(latest, max_age_hours: float) -> tuple[bool, float]:
    if latest is None:
        return False, float("inf")
    if isinstance(latest, str):
        latest = datetime.fromisoformat(latest)
    # compare in UTC on both sides: a tz-aware loaded_at converts to UTC
    # (stripping tzinfo without converting would skew the age by the host's
    # UTC offset); naive values are engine-written under the session's UTC
    # timezone already, and now() must then be UTC too, not host-local
    from datetime import timezone

    if latest.tzinfo is not None:
        latest = latest.astimezone(timezone.utc).replace(tzinfo=None)
    now = datetime.now(timezone.utc).replace(tzinfo=None)
    age_h = (now - latest).total_seconds() / 3600
    return age_h <= max_age_hours, age_h


def check_source_freshness(spark, manifest) -> list[tuple[str, str, float]]:
    """dbt-style source freshness sweep (docs/freshness.md surface): for
    every source declaring a ``freshness`` block, compare max(loaded_at)
    against the warn/error watermarks. Returns (source, status, age_hours)
    with status in {pass, warn, error}; sources without a block are skipped
    (dbt semantics)."""
    from pyspark.sql import functions as F

    out: list[tuple[str, str, float]] = []
    for name, src in manifest.sources.items():
        cfg = src.freshness or {}
        field = cfg.get("loaded_at_field")
        if not field:
            continue
        latest = (
            spark.read.parquet(src.path).agg(F.max(field).alias("m")).first().m
        )
        warn_h = float(cfg.get("warn_after_hours", float("inf")))
        err_h = float(cfg.get("error_after_hours", float("inf")))
        ok_err, age_h = _age_ok(latest, err_h)
        ok_warn, _ = _age_ok(latest, warn_h)
        # error watermark first: an error-only block (no warn_after) must
        # still fail — deriving from ok_warn alone would report 'pass'
        status = "error" if not ok_err else ("warn" if not ok_warn else "pass")
        out.append((name, status, age_h))
    return out
