"""Table catalog over the driver's parquet testdata (and engine warehouses).

The driver testdata (TESTDATA.md) ships ten tables as one parquet file each.
``Catalog`` loads them as DataFrames and registers temp views so operators
can be written either with the DataFrame API or ``spark.sql``.

Scale note: each table is a plain ``spark.read.parquet`` — at cluster scale
the same loader points at a partitioned directory tree and Catalyst handles
partition pruning / predicate pushdown from the same declarative plans. The
only per-table fix-up is ``events.ts`` (parquet TIMESTAMP(NANOS) → read as
long nanos via ``spark.sql.legacy.parquet.nanosAsLong`` → converted to a
microsecond TimestampType column here, truncating sub-microsecond digits the
same way DuckDB's ``CAST(ts_ns AS TIMESTAMP)`` does).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampNTZType

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


class Catalog:
    """Loads the standard tables from a scale-factor directory."""

    def __init__(self, spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR):
        self.spark = spark
        self.sf_dir = sf_dir
        self._cache: dict[str, DataFrame] = {}
        self._primed = False

    def table(self, name: str) -> DataFrame:
        if name not in self._cache:
            self._cache[name] = self._load(name)
        return self._cache[name]

    def _load(self, name: str) -> DataFrame:
        path = os.path.join(self.sf_dir, f"{name}.parquet")
        self.spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = self.spark.read.parquet(path)
        if name == "events" and isinstance(df.schema["ts"].dataType, LongType):
            # nanos since epoch -> TimestampType, truncating to microseconds
            # exactly like DuckDB's TIMESTAMP(NANOS) read path. Integer `div`,
            # not `/`: double division loses precision above 2^53 ns.
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif name == "events" and isinstance(
            df.schema["ts"].dataType, TimestampNTZType
        ):
            # parquet timestamp[us] without tz reads as TIMESTAMP_NTZ under
            # Spark 4's inferTimestampNTZ default. Normalize to the session
            # (UTC) TimestampType so epoch arithmetic (cast to long,
            # unix_timestamp, window()) stays legal downstream — wall-clock
            # values are unchanged because the session zone is pinned UTC,
            # and DuckDB reads the same file as a naive TIMESTAMP.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df

    def register_views(self, names: tuple[str, ...] = TABLES) -> None:
        """Register each table as a temp view named after itself."""
        for name in names:
            self.table(name).createOrReplaceTempView(name)

    def prime(self, names: tuple[str, ...] = TABLES, cpus: int | None = None) -> None:
        """Pin hot tables into Spark's in-memory columnar cache.

        The engine's deployment model is one long-lived session (BASELINE.md);
        a warehouse keeps hot tables in columnar storage rather than re-decoding
        source files per query. Two things make this matter here:

        - The testdata ships each table as a single parquet row group, so an
          uncached scan is one task no matter how many cores exist. Caching
          behind a `repartition` restores scan parallelism.
        - `persist()` defaults to MEMORY_AND_DISK: at cluster scale the cache
          is bounded by storage memory and spills, so priming degrades
          gracefully rather than OOMing — the 100 TB path caches what fits
          and streams the rest from parquet (where multi-row-group files give
          the scan its parallelism back anyway).
        """
        if self._primed:
            return  # idempotent: re-priming would re-persist identical plans
        self._primed = True
        if cpus is None:
            cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0") or 0) or (
                os.cpu_count() or 8
            )
        for name in names:
            path = os.path.join(self.sf_dir, f"{name}.parquet")
            try:
                size = os.path.getsize(path)
            except OSError:
                size = 0
            # ~128 KB compressed per cached partition, capped at core count:
            # compressed bytes badly underestimate compute density (embeddings
            # are 800 KB on disk but 128-dim float math per row), so the split
            # target is small and the core-count cap does the real bounding.
            parts = max(1, min(cpus, size // (128 * 1024) or 1))
            df = self.table(name)
            if parts > 1:
                df = df.repartition(parts)
            self._cache[name] = df.persist()
            self._cache[name].count()  # materialize eagerly

    @staticmethod
    def clear_memos() -> int:
        """Evict every session-lifetime operator memo (parallel-rank
        tables, graph edge artifacts, ANN indexes, pipeline derived
        tables): unpersists and drops all entries, returning the count.
        Call between sweeps in a long-lived service to bound executor
        storage at one sweep's working set; the next query transparently
        rebuilds what it needs. (Primed base tables are NOT touched —
        they are bounded by the table count and managed by `prime`.)"""
        from dbtwiz_spark.ops.common import clear_session_memos

        return clear_session_memos()

    def tables(self) -> dict[str, DataFrame]:
        return {name: self.table(name) for name in TABLES}


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Convenience: load all standard tables from ``sf_dir``."""
    return Catalog(spark, sf_dir).tables()
