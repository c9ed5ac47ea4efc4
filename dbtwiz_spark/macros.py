"""Jinja macro layer (SURVEY §2.10).

The reference's extension points are dbt macros expanded into SQL before
execution: ``ref()``/``source()`` rewriting (dbtwiz/model/validate.py:453-501),
``var()`` (dbtwiz/model/create.py:463), ``interval_start/interval_end``
(dbtwiz/commands/__init__.py:46-58), the scd2 table-function macro
(dbtwiz/model/create.py:418-429), and raw Jinja templates
(dbtwiz/admin/backfill.py:176-217). The engine renders model SQL with the
same binding set, then hands the result to ``spark.sql`` — Catalyst is the
compiler; this layer is pure text templating.
"""

from __future__ import annotations

import re
from typing import Any

import jinja2

_REF_RE = re.compile(
    r"""\{\{\s*(?:ref|source)\(\s*['"]([A-Za-z0-9_.]+)['"]\s*(?:,\s*['"]([A-Za-z0-9_.]+)['"]\s*)?\)\s*\}\}"""
)


def extract_refs(sql: str) -> list[str]:
    """Static dependency extraction: the names referenced via ref()/source().

    For two-argument source('dataset', 'table') calls the *last* argument is
    the table name (matching dbt's source semantics).
    """
    out = []
    for m in _REF_RE.finditer(sql):
        out.append(m.group(2) or m.group(1))
    return out


def render(
    sql: str,
    resolve: dict[str, str] | None = None,
    variables: dict[str, Any] | None = None,
    interval_start: str | None = None,
    interval_end: str | None = None,
) -> str:
    """Render model SQL: bind ref/source to physical table names, var() to
    values, interval_start/interval_end to the run's date window
    (``data_interval_start/end`` vars, dbtwiz/commands/build.py:100)."""
    resolve = resolve or {}
    variables = dict(variables or {})
    variables.setdefault("is_backfill", False)

    def _ref(name: str, table: str | None = None) -> str:
        key = table or name
        return resolve.get(key, key)

    def _var(name: str, default: Any = None) -> Any:
        return variables.get(name, default)

    def _interval_start() -> str:
        if interval_start is None:
            raise ValueError(
                "interval_start() used but data_interval_start is not set — "
                "pass --start (build) or run via backfill"
            )
        return f"TIMESTAMP '{interval_start}'"

    def _interval_end() -> str:
        if interval_end is None:
            raise ValueError(
                "interval_end() used but data_interval_end is not set — "
                "pass --start/--end (build) or run via backfill"
            )
        return f"TIMESTAMP '{interval_end}'"

    env = jinja2.Environment(undefined=jinja2.StrictUndefined)
    reserved = {"ref", "source", "var", "interval_start", "interval_end"}
    return env.from_string(sql).render(
        ref=_ref,
        source=_ref,
        var=_var,
        interval_start=_interval_start,
        interval_end=_interval_end,
        # macro names are reserved: a project var named e.g. interval_start
        # would otherwise raise "multiple values for keyword argument";
        # such vars stay reachable through var('interval_start')
        **{
            k: v
            for k, v in variables.items()
            if k.isidentifier() and k not in reserved
        },
    )


def scd2_sql(source_table: str, unique_key: str, partition_date_column: str) -> str:
    """The scd2 macro as SQL (dbtwiz/model/create.py:418-429): build validity
    intervals per key with lead() over the partition date — valid_from /
    valid_to (NULL = current) + is_current flag."""
    return f"""
    SELECT *,
           {partition_date_column} AS valid_from,
           LEAD({partition_date_column}) OVER (
               PARTITION BY {unique_key} ORDER BY {partition_date_column}
           ) AS valid_to,
           LEAD({partition_date_column}) OVER (
               PARTITION BY {unique_key} ORDER BY {partition_date_column}
           ) IS NULL AS is_current
    FROM {source_table}
    """
