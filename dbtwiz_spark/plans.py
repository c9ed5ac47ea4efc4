"""Plan-level pre-flight checks.

The reference enforces `require_partition_filter: True` on incremental
models (dbtwiz/model/create.py:465): BigQuery rejects queries on such tables
without a partition-column predicate. Spark/parquet has no such server-side
enforcement, so the engine checks the *analyzed logical plan* for a filter
referencing the partition column before executing — partition pruning itself
is Catalyst's job; this is only the guard rail.

At 100 TB a missing partition filter is the difference between scanning one
date directory and scanning the whole table, which is why the check refuses
rather than warns.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


class MissingPartitionFilter(Exception):
    """Raised when a plan on a partition-filter-required table has no
    predicate on the partition column."""


def plan_filters(df: DataFrame) -> list[str]:
    """Extract the Filter node condition strings from the analyzed plan."""
    plan = df._jdf.queryExecution().analyzed().toString()
    return re.findall(r"Filter \((.*)\)", plan) + re.findall(r"Filter (\S+#\d+.*)", plan)


def has_partition_filter(df: DataFrame, partition_col: str) -> bool:
    """True if the analyzed plan filters ``partition_col`` on EVERY base
    relation that carries it.

    The check matches attribute IDs, not just the column name: in a join
    where two relations both have the conventional ``partitiondate`` column,
    a filter on only the dimension's copy must not satisfy the guard for the
    fact table — that is precisely the full-scan this check exists to
    refuse."""
    pat = re.compile(rf"\b{re.escape(partition_col)}#(\d+)")
    plan = df._jdf.queryExecution().analyzed().toString()
    rel_ids: set[str] = set()
    filt_ids: set[str] = set()
    for line in plan.splitlines():
        stripped = line.strip().lstrip("+-: ")
        if stripped.startswith("Filter"):
            filt_ids.update(pat.findall(stripped))
        elif stripped.startswith(("Relation", "FileScan")):
            rel_ids.update(pat.findall(stripped))
    if not rel_ids:
        # column never read from a base relation (renamed/computed upstream)
        # — fall back to "some filter references it"
        return bool(filt_ids)
    return rel_ids <= filt_ids


def require_partition_filter(df: DataFrame, partition_col: str) -> DataFrame:
    """Pre-flight assert: refuse plans lacking a partition predicate."""
    if not has_partition_filter(df, partition_col):
        raise MissingPartitionFilter(
            f"query must filter on partition column {partition_col!r} "
            "(require_partition_filter is set for this table)"
        )
    return df
