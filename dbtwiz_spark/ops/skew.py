"""Skew mitigation (SURVEY §4 scale notes; BASELINE north-star mandate).

First line of defense is AQE (`spark.sql.adaptive.skewJoin.enabled`, on in
session.py): at runtime Spark splits oversized shuffle partitions for joins.
These helpers cover what AQE can't:

- **Aggregation skew**: a hot grouping key funnels into one reducer. AQE
  does not split a single aggregation key, so `salted_agg` two-phases it:
  partial-aggregate on (key, salt) — spreading the hot key over N reducers —
  then merge partials on key alone. Works for any algebraic aggregate
  (sum/count/min/max; avg = sum+count merged at the end).
- **Join skew without AQE** (e.g. a broadcast-ineligible dimension joined on
  a hot key under static planning): `salted_join` salts the big side and
  explodes the small side N ways, so the hot key's rows land on N reducers.

The salted plans return results identical to their unsalted forms — the
`agg-salted-skew` corpus entry proves it against the plain-SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dbtwiz_spark.ops.common import views
from dbtwiz_spark.ops.registry import register

#: merge function for each algebraic partial
_MERGE = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation spreading hot keys over ``salt_buckets`` reducers.

    ``aggs``: output name → (fn, column) with fn in sum|count|min|max.
    Phase 1 groups by (keys..., salt) where salt is a deterministic hash of
    the whole row spread (spark_partition_id + monotonic id), phase 2 merges
    partials by keys alone — N small rows per key instead of one huge one.
    """
    salt = F.pmod(F.xxhash64(F.spark_partition_id(), F.monotonically_increasing_id()),
                  F.lit(salt_buckets)).alias("_salt")
    phase1 = df.withColumn("_salt", salt).groupBy(*keys, "_salt").agg(
        *[
            (F.count(col) if fn == "count" else getattr(F, fn)(col)).alias(name)
            for name, (fn, col) in aggs.items()
        ]
    )
    return phase1.groupBy(*keys).agg(
        *[_MERGE[fn](name).alias(name) for name, (fn, _col) in aggs.items()]
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side salted and the small side replicated
    ``salt_buckets``× — the static-planning skew fix when the small side is
    too big to broadcast and one join key dominates.

    Only inner and left joins are supported: under right/full outer, an
    unmatched small-side key would surface once PER SALT REPLICA
    (salt_buckets duplicate null-padded rows) — those joins need a
    different construction (AQE skew-join handles them)."""
    if how not in ("inner", "left", "leftouter", "left_outer"):
        raise ValueError(
            f"salted_join supports inner/left joins only, got {how!r}: "
            "replicated unmatched small-side rows would duplicate under "
            f"{how}"
        )
    salted_big = big.withColumn(
        "_salt",
        F.pmod(
            F.xxhash64(F.spark_partition_id(), F.monotonically_increasing_id()),
            F.lit(salt_buckets),
        ),
    )
    replicated = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    return salted_big.join(replicated, on=[on, "_salt"], how=how).drop("_salt")


@register(
    "agg-salted-skew",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS sum_qty,
           COUNT(*) AS n,
           MAX(l_extendedprice) AS max_price
    FROM lineitem GROUP BY 1
    """,
)
def agg_salted_skew(spark, sf_dir):
    """Salted two-phase aggregation on a 3-value key (maximal skew: each key
    is ~1/3 of the table). Oracle is the plain GROUP BY — salting must be
    invisible in the result."""
    li = views(spark, sf_dir).table("lineitem")
    return salted_agg(
        li,
        keys=["l_returnflag"],
        aggs={
            "sum_qty": ("sum", F.col("l_quantity").cast("decimal(28,6)")),
            "n": ("count", F.lit(1)),
            "max_price": ("max", F.col("l_extendedprice")),
        },
    ).withColumn("sum_qty", F.col("sum_qty").cast("double"))
