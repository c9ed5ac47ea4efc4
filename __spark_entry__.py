"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship query (revenue by nation) on sf0.001.
queries()      — one entry per implemented SURVEY §2 operator, backed by
                 dbtwiz_spark.ops (the corpus registry).
oracle_sql()   — matching DuckDB SQL for every SQL-expressible entry.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from dbtwiz_spark.ops import CORPUS  # noqa: E402
from dbtwiz_spark.session import _apply_runtime_confs  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: revenue by nation (lineitem⨝orders⨝customer⨝nation,
    group, sort — the SURVEY §7.2 end-to-end slice) on sf0.001."""
    from pyspark.sql import functions as F

    from dbtwiz_spark.catalog import Catalog
    from dbtwiz_spark.ops.common import dsum

    _apply_runtime_confs(spark, shuffle_partitions=8)
    cat = Catalog(spark, "/root/testdata/sf0.001")
    li, o = cat.table("lineitem"), cat.table("orders")
    c, n = cat.table("customer"), cat.table("nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"
            ),
            F.count("*").alias("n_lineitems"),
        )
        .orderBy(F.col("revenue").desc())
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """SURVEY §2 operator corpus (see dbtwiz_spark/ops/)."""

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _apply_runtime_confs(spark, shuffle_partitions=8)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(spec.fn) for name, spec in CORPUS.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracles for every SQL-expressible corpus entry."""
    return {name: spec.oracle for name, spec in CORPUS.items() if spec.oracle}
