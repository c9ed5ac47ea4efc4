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
    """True if any Filter in the analyzed plan references ``partition_col``."""
    pat = re.compile(rf"\b{re.escape(partition_col)}#\d+")
    plan = df._jdf.queryExecution().analyzed().toString()
    for line in plan.splitlines():
        stripped = line.strip().lstrip("+-: ")
        if stripped.startswith("Filter") and pat.search(stripped):
            return True
    return False


def require_partition_filter(df: DataFrame, partition_col: str) -> DataFrame:
    """Pre-flight assert: refuse plans lacking a partition predicate."""
    if not has_partition_filter(df, partition_col):
        raise MissingPartitionFilter(
            f"query must filter on partition column {partition_col!r} "
            "(require_partition_filter is set for this table)"
        )
    return df
