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
