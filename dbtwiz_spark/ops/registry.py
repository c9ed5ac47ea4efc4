"""Registry of corpus operators (SURVEY §2).

Each entry pairs a Spark implementation with a DuckDB oracle. The driver
hash-compares them at sf0.01 (order-insensitive value hash over columns
sorted by name), so:

- every computed column is aliased identically on both sides;
- aggregate sums/avgs over doubles go through an exact DECIMAL accumulator
  (see ``ops.common``) because float addition is order-dependent and the two
  engines aggregate in different orders;
- collected lists are sorted (``sort_array`` / ``list_sort``) since group
  collection order is nondeterministic.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None -> driver does a rows-only check
    doc: str = ""


CORPUS: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a corpus operator under its SURVEY §2 id."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in CORPUS:
            raise ValueError(f"duplicate corpus entry: {name}")
        CORPUS[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "")
        return fn

    return deco
