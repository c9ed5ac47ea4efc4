"""Model registry, DAG, and selector resolution (SURVEY §3.1/§1.1).

The reference's only query IR is the dbt manifest: a DAG of named SQL
strings + configs with parent/child maps (dbtwiz/dbt/manifest.py:42-47) and
cached transitive closures (:340-370). The engine keeps the same shape:
``Model`` nodes with SQL + materialization config, adjacency maps, topo
order, and dbt-style selector grammar (name, ``+model``, ``model+``,
``tag:x``, ``state:modified`` via SQL fingerprints —
dbtwiz/dbt/manifest.py:201-210, dbtwiz/commands/build.py:108-111).
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import dataclass, field
from pathlib import Path


@dataclass
class Source:
    """External table declaration (dbtwiz/source/create.py:326-404).

    ``freshness`` mirrors dbt's source-level freshness block (the surface
    `dbtwiz freshness` runs, docs/freshness.md): loaded_at_field plus
    warn/error watermarks in hours."""

    name: str
    path: str  # parquet location
    description: str = ""
    freshness: dict | None = None  # {loaded_at_field, warn_after_hours, error_after_hours}


@dataclass
class Model:
    """A named query node (dbtwiz/dbt/manifest.py:281-309 models() shape)."""

    name: str
    sql: str  # Jinja-templated SQL (ref()/source()/var() calls)
    materialized: str = "view"  # view|table|incremental|scd2|ephemeral
    incremental_strategy: str | None = None  # insert_overwrite|merge
    partition_by: str | None = None  # e.g. "partitiondate"
    require_partition_filter: bool = False
    partition_expiration_days: int | None = None
    cluster_by: list[str] = field(default_factory=list)
    unique_key: str | None = None  # merge/scd2 key
    snapshot: bool = False  # incremental: hardlink-snapshot before overwrite
    tags: list[str] = field(default_factory=list)
    description: str = ""
    meta: dict = field(default_factory=dict)
    columns: list = field(default_factory=list)  # [{name, data_type, description}]
    # model-level data tests (dbt's singular/custom test surface, run by
    # `test` alongside the per-column generics): each entry is
    # {expression: "<row predicate that must hold>"} or
    # {sql: "<query returning VIOLATING rows>", name: "<label>"}
    tests: list = field(default_factory=list)
    # governance (dbtwiz/model/create.py get_config :440-497: access/group
    # top-level, teams/access-policy/service-consumers under meta)
    group: str | None = None
    access: str | None = None  # private|protected|public

    def fingerprint(self) -> str:
        """Stable hash of SQL + config — the state:modified basis
        (reference defers to dbt's state comparison; same idea)."""
        blob = json.dumps(
            {
                "sql": self.sql,
                "materialized": self.materialized,
                "strategy": self.incremental_strategy,
                "partition_by": self.partition_by,
                "cluster_by": self.cluster_by,
                "unique_key": self.unique_key,
            },
            sort_keys=True,
        )
        return hashlib.sha256(blob.encode()).hexdigest()[:16]


class Manifest:
    """DAG over models/sources with dbt-selector semantics."""

    def __init__(self) -> None:
        self.models: dict[str, Model] = {}
        self.sources: dict[str, Source] = {}
        self.parent_map: dict[str, set[str]] = {}
        self.child_map: dict[str, set[str]] = {}

    # -- registration -------------------------------------------------
    def add_source(self, source: Source) -> None:
        self.sources[source.name] = source

    def add_model(self, model: Model) -> None:
        from dbtwiz_spark.macros import extract_refs

        # re-adding (model edit, `model move` rewrite) must drop the OLD
        # edges first — stale child_map entries would corrupt downstream()
        # closures and let topo_order schedule a child before its real parent
        for old_parent in self.parent_map.get(model.name, ()):
            self.child_map.get(old_parent, set()).discard(model.name)
        self.models[model.name] = model
        parents = set(extract_refs(model.sql))  # ref()/source() targets
        self.parent_map[model.name] = parents
        for p in parents:
            self.child_map.setdefault(p, set()).add(model.name)

    # -- closures (dbtwiz/dbt/manifest.py:340-370) ----------------------
    def upstream(self, name: str) -> set[str]:
        out: set[str] = set()
        stack = [name]
        while stack:
            n = stack.pop()
            for p in self.parent_map.get(n, ()):
                if p not in out and p in self.models:
                    out.add(p)
                    stack.append(p)
        return out

    def downstream(self, name: str) -> set[str]:
        out: set[str] = set()
        stack = [name]
        while stack:
            n = stack.pop()
            for c in self.child_map.get(n, ()):
                if c not in out and c in self.models:
                    out.add(c)
                    stack.append(c)
        return out

    def topo_order(self, names: set[str] | None = None) -> list[str]:
        """Kahn topological order over (a subset of) the model DAG."""
        names = names if names is not None else set(self.models)
        indeg = {
            n: len([p for p in self.parent_map.get(n, ()) if p in names])
            for n in names
        }
        ready = sorted(n for n, d in indeg.items() if d == 0)
        out: list[str] = []
        while ready:
            n = ready.pop(0)
            out.append(n)
            for c in sorted(self.child_map.get(n, ())):
                if c in indeg and c in names:
                    indeg[c] -= 1
                    if indeg[c] == 0:
                        ready.append(c)
            ready.sort()
        if len(out) != len(names):
            cyc = names - set(out)
            raise ValueError(f"cycle in model DAG: {sorted(cyc)}")
        return out

    # -- selectors (dbtwiz/dbt/manifest.py:201-210 grammar) -------------
    def select(
        self,
        selector: str,
        state: dict[str, str] | None = None,
        exclude: str | None = None,
    ) -> list[str]:
        """Resolve a dbt-style selector to a topo-ordered model list.

        Grammar: ``name``, ``+name`` (upstream too), ``name+`` (downstream
        too), ``+name+``, ``tag:x``, ``state:modified`` (vs a fingerprint
        dict from a previous run), comma/space-separated unions. ``exclude``
        is a second selector subtracted from the result (the reference's
        ``exclude: tag:no_backfill``, dbtwiz/commands/build.py:101).
        """
        if exclude:
            excluded = set(self.select(exclude, state=state))
            return [
                n for n in self.select(selector, state=state) if n not in excluded
            ]
        picked: set[str] = set()
        for token in selector.replace(",", " ").split():
            up = token.startswith("+")
            down = token.endswith("+")
            core = token.strip("+")
            if core.startswith("tag:"):
                tag = core[4:]
                base = {n for n, m in self.models.items() if tag in m.tags}
            elif core == "state:modified":
                state = state or {}
                base = {
                    n
                    for n, m in self.models.items()
                    if state.get(n) != m.fingerprint()
                }
            elif core == "*":
                base = set(self.models)
            else:
                if core not in self.models:
                    raise KeyError(f"unknown model: {core}")
                base = {core}
            picked |= base
            for b in base:
                if up:
                    picked |= self.upstream(b)
                if down:
                    picked |= self.downstream(b)
        return self.topo_order(picked)

    # -- persistence ----------------------------------------------------
    def fingerprints(self) -> dict[str, str]:
        return {n: m.fingerprint() for n, m in self.models.items()}

    def save_state(self, path: str | Path) -> None:
        from dbtwiz_spark.fsutil import atomic_write_text

        atomic_write_text(path, json.dumps(self.fingerprints(), indent=1))

    @staticmethod
    def load_state(path: str | Path) -> dict[str, str]:
        from dbtwiz_spark.fsutil import read_json_state

        # torn state degrades to {} (everything reads as modified — a
        # rebuild, never a brick or a silent skip)
        return read_json_state(path, "state")
