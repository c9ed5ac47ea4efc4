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

from dataclasses import dataclass, field
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
    "tests",
    "group",
    "access",
)

# Model-governance vocabulary (reference: dbtwiz/core/project.py
# access_choices :292-305, frequency_choices :308-317). Access levels are a
# fixed enum; groups/teams/service-consumers/access-policies are
# project-declared (Group at :9-48 reads models/model_groups.yml; teams()
# :177-182, service_consumers() :184-191, access_policies() :193-200 read
# project vars).
ACCESS_CHOICES: dict[str, str] = {
    "private": "Usable only by other models in the same group",
    "protected": "Usable by models outside the group",
    "public": "For marts models",
}
FREQUENCY_CHOICES: dict[str, str] = {
    "hourly": "Model needs to be updated every hour",
    "daily": "Model needs to be updated once a day",
}


class ProjectError(ValueError):
    """Malformed project configuration (project.yml and friends). A
    distinct type so the CLI can print it as a clean one-line error —
    a bare ValueError from config loading surfaced as a traceback."""


@dataclass
class Governance:
    """Project-declared governance vocabulary the create wizard and
    ``model validate`` check against."""

    groups: dict[str, str] = field(default_factory=dict)
    teams: dict[str, str] = field(default_factory=dict)
    service_consumers: dict[str, str] = field(default_factory=dict)
    access_policies: dict[str, str] = field(default_factory=dict)


def load_governance(root: str | Path) -> Governance:
    """Load the governance vocabulary: groups from
    ``models/model_groups.yml`` (reference Group.YAML_PATH), the rest from
    ``project.yml`` vars (reference keys ``teams`` /
    ``service-consumers`` / ``access-policies``)."""
    root = Path(root)
    gov = Governance()
    groups_file = root / "models" / "model_groups.yml"
    if groups_file.exists():
        data = yaml.safe_load(groups_file.read_text()) or {}
        gov.groups = {
            g["name"]: (
                ((g.get("config") or {}).get("meta") or {}).get(
                    "description", ""
                )
            )
            for g in data.get("groups") or []
        }
    proj_file = root / "project.yml"
    if proj_file.exists():
        proj = yaml.safe_load(proj_file.read_text()) or {}
        variables = proj.get("vars") or {}

        def _vocab(key: str) -> dict[str, str]:
            return {
                name: (spec or {}).get("description", "")
                for name, spec in (variables.get(key) or {}).items()
            }

        gov.teams = _vocab("teams")
        gov.service_consumers = _vocab("service-consumers")
        gov.access_policies = _vocab("access-policies")
    return gov


# Layer layout (reference: dbtwiz/config/project.py:184-204 — configurable
# via `[tool.dbtwiz.project.layers]`, defaulting to the historical layout;
# dbtwiz/core/model.py ModelBasePath derives folder + name prefix from it).
# The engine reads overrides from project.yml `layers:` with the same shape.
DEFAULT_LAYERS: dict[str, tuple[str, str]] = {
    "staging": ("1_staging", "stg"),
    "intermediate": ("2_intermediate", "int"),
    "marts": ("3_marts", "mrt"),
    "bespoke": ("4_bespoke", "bsp"),
}


def load_layers(root: str | Path) -> dict[str, tuple[str, str]]:
    """Layer name → (folder, abbreviation), with project.yml overrides."""
    root = Path(root)
    proj_file = root / "project.yml"
    if proj_file.exists():
        proj = yaml.safe_load(proj_file.read_text()) or {}
        declared = proj.get("layers") or {}
        if declared:
            return {
                name: (spec["folder"], spec["abbreviation"])
                for name, spec in declared.items()
            }
    return dict(DEFAULT_LAYERS)


def inherited_model_config(
    models_cfg: dict, project_name: str | None, layer_folder: str, domain: str
) -> dict[str, Any]:
    """Inherited group/access for a model path — the dbt_project.yml
    ``models:`` hierarchy (reference core/project.py:213-249): project →
    layer folder → domain, each level's ``+group`` / ``+access``
    overriding the previous. Returns {'group': ..., 'access': ...} with
    None where nothing is declared."""
    result: dict[str, Any] = {"group": None, "access": None}
    proj_level = (models_cfg or {}).get(project_name or "", {})
    for level in (
        proj_level,
        proj_level.get(layer_folder, {}) if isinstance(proj_level, dict) else {},
        (
            proj_level.get(layer_folder, {}).get(domain, {})
            if isinstance(proj_level, dict)
            and isinstance(proj_level.get(layer_folder, {}), dict)
            else {}
        ),
    ):
        if isinstance(level, dict):
            if "+group" in level:
                result["group"] = level["+group"]
            if "+access" in level:
                result["access"] = level["+access"]
    return result


def validate_name_conventions(
    root: str | Path, layers: dict[str, tuple[str, str]] | None = None
) -> list[tuple[str, str]]:
    """Check every model under a layer folder against the reference's
    ``<abbr>_<domain>__<identifier>`` naming convention
    (dbtwiz/model/validate.py:240-270: prefix must agree with the layer
    folder and domain folder the file lives in). Models outside a
    recognized layer folder (flat layouts) are exempt. Returns
    (model_name, error) pairs."""
    root = Path(root)
    layers = layers if layers is not None else load_layers(root)
    by_folder = {folder: (layer, abbr) for layer, (folder, abbr) in layers.items()}
    errors: list[tuple[str, str]] = []
    models_dir = root / "models"
    if not models_dir.exists():
        return errors
    for sql_path in sorted(models_dir.rglob("*.sql")):
        rel = sql_path.relative_to(models_dir).parts
        if len(rel) < 3 or rel[0] not in by_folder:
            continue
        layer, abbr = by_folder[rel[0]]
        domain = rel[1]
        expected = f"{abbr}_{domain}__"
        name = sql_path.stem
        if not name.startswith(expected):
            errors.append(
                (
                    name,
                    f"model in models/{rel[0]}/{domain}/ must be named "
                    f"{expected}<identifier> ({layer} layer convention)",
                )
            )
    return errors


def validate_governance(model: Model, gov: Governance) -> list[str]:
    """Governance checks mirroring the reference wizard's validation
    (dbtwiz/model/create.py:132-230: group/access/team values must come
    from the declared vocabulary). Unset keys pass — governance is
    opt-in per model; SET keys must resolve against the project's
    declarations."""
    errors: list[str] = []
    if model.access is not None and model.access not in ACCESS_CHOICES:
        errors.append(
            f"access {model.access!r} invalid (choose from "
            f"{sorted(ACCESS_CHOICES)})"
        )
    if model.group is not None and model.group not in gov.groups:
        errors.append(
            f"group {model.group!r} not declared in models/model_groups.yml "
            f"(declared: {sorted(gov.groups) or 'none'})"
        )
    meta = model.meta or {}
    for team in meta.get("teams") or []:
        if team not in gov.teams:
            errors.append(
                f"team {team!r} not declared in project.yml vars.teams "
                f"(declared: {sorted(gov.teams) or 'none'})"
            )
    policy = meta.get("access-policy")
    if policy is not None and policy not in gov.access_policies:
        errors.append(
            f"access-policy {policy!r} not declared in project.yml "
            f"vars.access-policies (declared: "
            f"{sorted(gov.access_policies) or 'none'})"
        )
    for consumer in meta.get("service-consumers") or []:
        if consumer not in gov.service_consumers:
            errors.append(
                f"service-consumer {consumer!r} not declared in project.yml "
                f"vars.service-consumers (declared: "
                f"{sorted(gov.service_consumers) or 'none'})"
            )
    return errors


def project_targets(root: str | Path) -> dict[str, dict[str, Any]]:
    """Named target environments from the ``targets:`` section of
    ``project.yml`` (reference: dbtwiz/dbt/target.py Target enum
    dev/build/prod/prod-ci; target choice drives warehouse selection and
    the no-selector default, commands/build.py:62-115). Each target maps
    to a ``warehouse`` root (relative paths resolve against the project
    directory at use time) and optionally a ``state`` fingerprint file
    enabling the reference's non-dev no-selector default of building
    ``state:modified+``::

        targets:
          dev:  {warehouse: ./wh_dev}
          prod: {warehouse: /data/wh_prod, state: .state/fingerprints.json}
    """
    proj_file = Path(root) / "project.yml"
    if not proj_file.exists():
        return {}
    proj = yaml.safe_load(proj_file.read_text()) or {}
    targets = proj.get("targets") or {}
    for name, cfg in targets.items():
        if not isinstance(cfg, dict) or not cfg.get("warehouse"):
            raise ProjectError(
                f"target {name!r} in project.yml must declare a warehouse path"
            )
    return targets


def load_project(root: str | Path) -> tuple[Manifest, dict[str, Any]]:
    """Load a project directory; returns (manifest, project vars)."""
    root = Path(root)
    manifest = Manifest()
    variables: dict[str, Any] = {}

    proj_file = root / "project.yml"
    proj: dict[str, Any] = {}
    if proj_file.exists():
        proj = yaml.safe_load(proj_file.read_text()) or {}
        variables = dict(proj.get("vars") or {})
    models_cfg = proj.get("models") or {}
    project_name = proj.get("name")

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
            # governance inheritance (reference core/project.py:213-249):
            # a layered model without its own group/access takes the
            # project.yml models-hierarchy value, so the EFFECTIVE config
            # is what build/validate see
            # each declared hierarchy level applies at ANY depth (the
            # dbt semantics the docstring cites): a depth-1 model gets
            # project-level values, depth-2 adds the layer level, etc.
            rel = sql_path.relative_to(models_dir).parts
            if models_cfg:
                inh = inherited_model_config(
                    models_cfg,
                    project_name,
                    rel[0] if len(rel) >= 2 else "",
                    rel[1] if len(rel) >= 3 else "",
                )
                for key in ("group", "access"):
                    if cfg.get(key) is None and inh[key] is not None:
                        cfg[key] = inh[key]
            manifest.add_model(Model(name=name, sql=sql_path.read_text(), **cfg))

    return manifest, variables
