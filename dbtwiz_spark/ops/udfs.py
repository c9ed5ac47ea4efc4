"""§2.10 UDF / UDAF / UDTF / macro surface.

The reference's extension points are dbt macros — Jinja functions expanded
into SQL (scd2 macro dbtwiz/model/create.py:419-428, var()
dbtwiz/model/create.py:463, ref()/source() rewriting
dbtwiz/model/validate.py:453-501, interval_start/interval_end
dbtwiz/commands/__init__.py:46-58). The Spark engine exposes the same four
extension shapes:

- scalar UDF     → Arrow-vectorized ``pandas_udf`` (never row-at-a-time
                   Python: Arrow batch transfer is the only Python path that
                   survives 100 TB)
- UDAF           → GROUPED_AGG ``pandas_udf``
- UDTF           → ``mapInPandas`` (DataFrame → DataFrame relation function)
- macro template → Jinja render (dbtwiz_spark.macros) then ``spark.sql``

Every entry here is deliberately oracle-checkable: the pandas computations
are per-row/exact (no float accumulation ordering), so DuckDB reproduces
them bit-for-bit.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from dbtwiz_spark import macros
from dbtwiz_spark.ops.common import views
from dbtwiz_spark.ops.registry import register


@register(
    "udf-scalar",
    oracle="""
    SELECT doc_id,
           n_chars / (1.0 + len(string_split(text, ' '))) AS chars_per_token
    FROM documents
    """,
)
def udf_scalar(spark, sf_dir):
    """Vectorized scalar pandas_udf (Arrow batches): chars-per-token score.
    Per-row double math — deterministic across engines, unlike aggregated
    float sums. The macro-expansion analog is a scalar expression macro."""

    @F.pandas_udf("double")
    def chars_per_token(text: pd.Series, n_chars: pd.Series) -> pd.Series:
        return n_chars / (1.0 + text.str.split(" ").str.len())

    d = views(spark, sf_dir).table("documents")
    return d.select("doc_id", chars_per_token("text", "n_chars").alias("chars_per_token"))


@register(
    "udaf",
    oracle="""
    SELECT p_brand, MAX(p_retailprice) - MIN(p_retailprice) AS price_range
    FROM part GROUP BY 1
    """,
)
def udaf(spark, sf_dir):
    """GROUPED_AGG pandas_udf (custom aggregate macro analog): per-brand
    price range. max-min is exact in IEEE doubles (no accumulation order
    dependence), keeping the custom aggregate oracle-checkable."""

    @F.pandas_udf("double")
    def price_range(v: pd.Series) -> float:
        return float(v.max() - v.min())

    p = views(spark, sf_dir).table("part")
    return p.groupBy("p_brand").agg(price_range("p_retailprice").alias("price_range"))


@register(
    "udtf",
    oracle="""
    SELECT doc_id,
           unnest(generate_series(1, len(a))) AS pos,
           unnest(a) AS token
    FROM (SELECT doc_id, string_split(text, ' ') AS a FROM documents)
    """,
)
def udtf(spark, sf_dir):
    """Table function via mapInPandas (the scd2-macro shape: relation in →
    relation out): tokenizer emitting one row per (doc, position, token).
    Arrow-batched; each input batch yields its output frame, so the operator
    is embarrassingly parallel over document partitions at any scale."""

    def tokenize(batches):
        for pdf in batches:
            toks = pdf["text"].str.split(" ")
            n = toks.str.len()
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].repeat(n),
                    "pos": [i for m in n for i in range(1, m + 1)],
                    "token": [t for row in toks for t in row],
                }
            )

    d = views(spark, sf_dir).table("documents")
    return d.select("doc_id", "text").mapInPandas(
        tokenize, "doc_id long, pos long, token string"
    )


_MACRO_SQL = """
SELECT o_orderpriority, COUNT(*) AS n
FROM {{ ref('orders') }}
WHERE o_orderdate >= {{ interval_start() }}
  AND o_orderdate < {{ interval_end() }}
  AND o_totalprice > {{ var('min_total', 0) }}
GROUP BY o_orderpriority
"""

_MACRO_BINDINGS = dict(
    resolve={"orders": "orders"},
    variables={"min_total": 1000},
    interval_start="1995-01-01",
    interval_end="1996-01-01",
)


@register("macro-template", oracle=macros.render(_MACRO_SQL, **_MACRO_BINDINGS))
def macro_template(spark, sf_dir):
    """Jinja macro expansion then spark.sql (dbtwiz's whole query path:
    ref()/var()/interval_start()/interval_end() bound before the warehouse
    sees SQL — dbtwiz/commands/build.py:100, dbtwiz/dbt/run.py:38). The
    oracle IS the rendered template, so the render itself is under test."""
    views(spark, sf_dir)
    return spark.sql(macros.render(_MACRO_SQL, **_MACRO_BINDINGS))


@register(
    "udf-cogroup",
    oracle="""
    WITH o AS (
        SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6)) * 100)
                    AS BIGINT) AS revc
        FROM orders GROUP BY 1),
    l AS (
        SELECT o.o_custkey,
               CAST(COUNT(*) AS BIGINT) AS n_lines,
               CAST(SUM(CAST(li.l_quantity AS BIGINT)) AS BIGINT) AS qty
        FROM lineitem li JOIN orders o ON o.o_orderkey = li.l_orderkey
        GROUP BY 1)
    SELECT o.o_custkey, o.n_orders,
           COALESCE(l.n_lines, 0) AS n_lines,
           COALESCE(l.qty, 0) AS total_qty,
           CAST(o.revc AS DOUBLE)
               / CAST(COALESCE(l.n_lines, 0) + 1 AS DOUBLE) / 100
               AS rev_per_line
    FROM o LEFT JOIN l ON l.o_custkey = o.o_custkey
    """,
)
def udf_cogroup(spark, sf_dir):
    """Cogrouped-map pandas UDF (``groupBy().cogroup().applyInPandas``)
    -- the fourth Python extension shape next to scalar/UDAF/UDTF: both
    relations shuffle on the SAME key and each key's two pandas frames
    arrive together in one Python call, the Arrow path for per-entity
    reconciliation logic too imperative for SQL (here: order headers vs
    their line stream, reduced to exact per-customer counts and an
    exact-cents revenue-per-line ratio). Everything inside the UDF is
    integer pandas arithmetic plus one correctly-rounded double divide,
    so the oracle reproduces it as a plain aggregate-join -- proving
    the cogroup path computes exactly what the declarative plan would,
    the contract a user porting custom Python logic relies on.

    Scale: one co-partitioned shuffle per side keyed on the customer
    (the same exchange a join would pay), Arrow-batched transfer, and
    per-key output of ONE row -- state is bounded by the widest single
    key, never the corpus. Prefer built-in joins when SQL can express
    the logic; this entry pins the escape hatch's semantics."""
    cat = views(spark, sf_dir)
    o = cat.table("orders").select("o_custkey", "o_orderkey", "o_totalprice")
    # alias the line side's key: both cogroup inputs descend from the
    # SAME orders scan, and identical attribute ids trip the ambiguous
    # self-join analyzer
    okeys = cat.table("orders").select(
        F.col("o_orderkey").alias("ok"), F.col("o_custkey").alias("ck")
    )
    li = (
        cat.table("lineitem")
        .join(okeys, F.col("l_orderkey") == F.col("ok"))
        .select("ck", "l_quantity")
    )

    def merge(key, orders_pdf, lines_pdf):
        import pandas as _pd

        (ck,) = key
        n_orders = len(orders_pdf)
        # exact cents PER ROW before the sum (<= 2-decimal source, so
        # each x100 rounds to its exact integer): summing the floats
        # first would make exactness depend on the key's cardinality
        # and pandas' summation algorithm
        revc = int(
            (orders_pdf["o_totalprice"] * 100).round().astype("int64").sum()
        )
        n_lines = len(lines_pdf)
        qty = int(lines_pdf["l_quantity"].sum()) if n_lines else 0
        return _pd.DataFrame(
            {
                "o_custkey": [ck],
                "n_orders": [n_orders],
                "n_lines": [n_lines],
                "total_qty": [qty],
                "rev_per_line": [revc / (n_lines + 1) / 100],
            }
        )

    return (
        o.groupBy("o_custkey")
        .cogroup(li.groupBy("ck"))
        .applyInPandas(
            merge,
            "o_custkey long, n_orders long, n_lines long, "
            "total_qty long, rev_per_line double",
        )
    )
