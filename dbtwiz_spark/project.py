"""On-disk project layout → Manifest (§3.1 steps 3-4).

The reference's unit of work is a dbt project: model SQL files plus YAML
config, compiled into a manifest DAG (dbtwiz/dbt/manifest.py:42-47; model
YAML written by dbtwiz/model/create.py:430-474). The engine's project is the
same shape, minus dbt:

    project/
      project.yml          # name: ..., vars: {...}           (optional)
      sources.yml          # sources: [{name, path, description}]
      models/
        stg_orders.sql     # Jinja SQL: ref()/source()/var()/interval_*()
        stg_orders.yml     # config sidecar (materialized, partition_by, ...)

Dependencies are extracted statically from ref()/source() calls
(macros.extract_refs), mirroring dbt's manifest parent_map.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

import yaml

from dbtwiz_spark.manifest import Manifest, Model, Source

MODEL_CONFIG_KEYS = (
    "materialized",
    "incremental_strategy",
    "partition_by",
    "require_partition_filter",
    "partition_expiration_days",
    "cluster_by",
    "unique_key",
    "snapshot",
    "tags",
    "description",
    "meta",
    "columns",
)


def load_project(root: str | Path) -> tuple[Manifest, dict[str, Any]]:
    """Load a project directory; returns (manifest, project vars)."""
    root = Path(root)
    manifest = Manifest()
    variables: dict[str, Any] = {}

    proj_file = root / "project.yml"
    if proj_file.exists():
        proj = yaml.safe_load(proj_file.read_text()) or {}
        variables = dict(proj.get("vars") or {})

    src_file = root / "sources.yml"
    if src_file.exists():
        spec = yaml.safe_load(src_file.read_text()) or {}
        for s in spec.get("sources") or []:
            manifest.add_source(
                Source(
                    name=s["name"],
                    path=s["path"],
                    description=s.get("description", ""),
                    freshness=s.get("freshness"),
                )
            )

    models_dir = root / "models"
    if models_dir.exists():
        seen: dict[str, Path] = {}
        for sql_path in sorted(models_dir.rglob("*.sql")):
            name = sql_path.stem
            # model names are file stems: two daily.sql in different subdirs
            # would silently collapse into one manifest entry (dbt treats
            # duplicate model names as a hard parse error for this reason)
            if name in seen:
                raise ValueError(
                    f"duplicate model name {name!r}: {seen[name]} and {sql_path}"
                )
            seen[name] = sql_path
            cfg: dict[str, Any] = {}
            sidecar = sql_path.with_suffix(".yml")
            if sidecar.exists():
                raw = yaml.safe_load(sidecar.read_text()) or {}
                cfg = {k: raw[k] for k in MODEL_CONFIG_KEYS if k in raw}
            manifest.add_model(Model(name=name, sql=sql_path.read_text(), **cfg))

    return manifest, variables
