"""§2.8 Scalar function families.

One corpus entry per family; each exercises the representative ops the
reference uses (Python analogs and generated SQL cited per entry). All are
built-in `pyspark.sql.functions` — JVM-side, whole-stage-codegen'd; no
Python UDFs in this module.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dbtwiz_spark.ops.common import views, hkey, hkey_sql
from dbtwiz_spark.ops.registry import register


@register(
    "func-string",
    oracle="""
    SELECT p_partkey,
           lower(p_name) AS lname,
           upper(p_brand) AS ubrand,
           replace(p_name, ' ', '_') AS snake,
           substr(p_name, 1, 5) AS head5,
           trim(concat('  ', p_name, '  ')) AS trimmed,
           length(p_name) AS name_len,
           string_split(p_name, ' ')[1] AS first_word,
           regexp_extract(p_brand, '[0-9]+', 0) AS brand_num,
           starts_with(p_name, 'small') AS is_small,
           concat(p_brand, ':', p_type) AS brand_type
    FROM part
    """,
)
def func_string(spark, sf_dir):
    """String family (replace: dbtwiz/admin/backfill.py:146; split:
    dbtwiz/integrations/bigquery.py:360; regex: dbtwiz/model/validate.py:479;
    lower: dbtwiz/dbt/manifest.py:406-423)."""
    p = views(spark, sf_dir).table("part")
    return p.select(
        "p_partkey",
        F.lower("p_name").alias("lname"),
        F.upper("p_brand").alias("ubrand"),
        F.regexp_replace("p_name", " ", "_").alias("snake"),
        F.substring("p_name", 1, 5).alias("head5"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit("  "))).alias("trimmed"),
        F.length("p_name").alias("name_len"),
        F.split("p_name", " ").getItem(0).alias("first_word"),
        F.regexp_extract("p_brand", "[0-9]+", 0).alias("brand_num"),
        F.col("p_name").startswith("small").alias("is_small"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
    )


@register(
    "func-datetime",
    oracle="""
    SELECT o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS od,
           EXTRACT(year FROM o_orderdate) AS yr,
           EXTRACT(month FROM o_orderdate) AS mo,
           date_trunc('month', o_orderdate) AS month_start,
           o_orderdate + INTERVAL 30 DAY AS due_date,
           date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS days_to_2002,
           strftime(o_orderdate, '%Y-%m') AS ym,
           epoch_ms(o_orderdate) AS epoch_millis
    FROM orders
    """,
)
def func_datetime(spark, sf_dir):
    """Date/time family (timedelta chunking dbtwiz/admin/backfill.py:104-114;
    epoch-ms parse dbtwiz/admin/restore.py:12-57; `timestamp_add` generated
    SQL dbtwiz/admin/cleanup.py:75)."""
    o = views(spark, sf_dir).table("orders")
    return o.select(
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("od"),
        F.year("o_orderdate").cast("long").alias("yr"),
        F.month("o_orderdate").cast("long").alias("mo"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.expr("o_orderdate + INTERVAL 30 DAYS").alias("due_date"),
        F.datediff(F.lit("2002-01-01").cast("date"), F.to_date("o_orderdate"))
        .cast("long")
        .alias("days_to_2002"),
        F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
        # o_orderdate is TIMESTAMP_NTZ; unix_millis wants LTZ (session tz UTC)
        F.unix_millis(F.col("o_orderdate").cast("timestamp")).alias("epoch_millis"),
    )


@register(
    "func-math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           floor(l_extendedprice) AS price_floor,
           ceil(l_extendedprice) AS price_ceil,
           round(l_extendedprice, 1) AS price_round1,
           abs(l_extendedprice - 1000.0) AS dist_from_1k,
           least(l_quantity, 25.0) AS qty_capped,
           greatest(l_tax, l_discount) AS max_rate,
           CAST(l_quantity AS BIGINT) % 7 AS qty_mod7,
           sqrt(l_quantity) AS qty_sqrt
    FROM lineitem
    """,
)
def func_math(spark, sf_dir):
    """Math family (floor-div batch sizing dbtwiz/admin/backfill.py:85-88,
    min/max clamps, GB rounding). floor/ceil return DOUBLE in DuckDB —
    matched; sqrt is IEEE-correctly-rounded in both engines."""
    li = views(spark, sf_dir).table("lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.floor("l_extendedprice").cast("double").alias("price_floor"),
        F.ceil("l_extendedprice").cast("double").alias("price_ceil"),
        F.round("l_extendedprice", 1).alias("price_round1"),
        F.abs(F.col("l_extendedprice") - 1000.0).alias("dist_from_1k"),
        F.least("l_quantity", F.lit(25.0)).alias("qty_capped"),
        F.greatest("l_tax", "l_discount").alias("max_rate"),
        (F.col("l_quantity").cast("bigint") % 7).alias("qty_mod7"),
        F.sqrt("l_quantity").alias("qty_sqrt"),
    )


@register(
    "func-cast",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderkey AS VARCHAR) AS key_str,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price_rounded,
           CAST(strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS TIMESTAMP) AS parsed_ts,
           CAST(EXTRACT(year FROM o_orderdate) AS SMALLINT) AS yr_small
    FROM orders
    """,
)
def func_cast(spark, sf_dir):
    """Cast/convert family (`cast(... as timestamp)` generated SQL
    dbtwiz/admin/cleanup.py:74; type map dbtwiz/integrations/bigquery.py:570-602)."""
    o = views(spark, sf_dir).table("orders")
    return o.select(
        "o_orderkey",
        F.col("o_orderkey").cast("string").alias("key_str"),
        F.col("o_totalprice").cast("decimal(18,2)").cast("double").alias("price_rounded"),
        F.to_timestamp(
            F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss")
        ).alias("parsed_ts"),
        F.year("o_orderdate").cast("smallint").alias("yr_small"),
    )


@register(
    "func-conditional",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'overdrawn'
                WHEN c_acctbal < 1000 THEN 'low'
                ELSE 'high' END AS bal_class,
           IF(c_mktsegment = 'BUILDING', 1, 0) AS is_building,
           COALESCE(NULLIF(c_mktsegment, 'MACHINERY'), 'redacted') AS seg_masked,
           NULLIF(c_nationkey, 0) AS nationkey_nz
    FROM customer
    """,
)
def func_conditional(spark, sf_dir):
    """CASE/IF/COALESCE/NULLIF (ternary & or-default idioms,
    dbtwiz/admin/partition.py:58-65, dbtwiz/admin/grants.py:379-380)."""
    c = views(spark, sf_dir).table("customer")
    return c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "overdrawn")
        .when(F.col("c_acctbal") < 1000, "low")
        .otherwise("high")
        .alias("bal_class"),
        F.when(F.col("c_mktsegment") == "BUILDING", 1).otherwise(0).alias("is_building"),
        F.coalesce(
            F.nullif(F.col("c_mktsegment"), F.lit("MACHINERY")), F.lit("redacted")
        ).alias("seg_masked"),
        F.nullif(F.col("c_nationkey"), F.lit(0)).alias("nationkey_nz"),
    )


@register(
    "func-array",
    oracle="""
    WITH t AS (
        SELECT n_regionkey, list_sort(list(n_name)) AS names
        FROM nation GROUP BY n_regionkey)
    SELECT n_regionkey,
           len(names) AS n_names,
           names[1] AS first_name,
           list_contains(names, 'NATION_3') AS has_nation3,
           u.nm AS nm
    FROM t, UNNEST(names) AS u(nm)
    """,
)
def func_array(spark, sf_dir):
    """Array family: agg→array, size, index, contains, explode
    (array_agg dbtwiz/admin/cleanup.py:65; REPEATED→array
    dbtwiz/integrations/bigquery.py:627-629)."""
    n = views(spark, sf_dir).table("nation")
    t = n.groupBy("n_regionkey").agg(F.sort_array(F.collect_list("n_name")).alias("names"))
    return t.select(
        "n_regionkey",
        F.size("names").cast("long").alias("n_names"),
        F.element_at("names", 1).alias("first_name"),
        F.array_contains("names", "NATION_3").alias("has_nation3"),
        F.explode("names").alias("nm"),
    )


@register(
    "func-struct",
    oracle="""
    WITH s AS (
        SELECT c_custkey,
               {'name': c_name, 'geo': {'nation': c_nationkey}} AS info
        FROM customer)
    SELECT c_custkey,
           info.name AS cust_name,
           info.geo.nation AS cust_nation
    FROM s
    """,
)
def func_struct(spark, sf_dir):
    """Struct family: build + dotted-path access (nested-field flattening,
    dbtwiz/integrations/bigquery.py:619-624, dbtwiz/admin/descriptions.py:43-82)."""
    c = views(spark, sf_dir).table("customer")
    s = c.select(
        "c_custkey",
        F.struct(
            F.col("c_name").alias("name"),
            F.struct(F.col("c_nationkey").alias("nation")).alias("geo"),
        ).alias("info"),
    )
    return s.select(
        "c_custkey",
        F.col("info.name").alias("cust_name"),
        F.col("info.geo.nation").alias("cust_nation"),
    )


@register(
    "func-json",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
           json_extract_string(props, '$.missing') AS missing_val
    FROM events
    """,
)
def func_json(spark, sf_dir):
    """JSON family: extract from the events.props payload
    (JSON type, dbtwiz/integrations/bigquery.py:596)."""
    ev = views(spark, sf_dir).table("events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("bigint").alias("k_val"),
        F.get_json_object("props", "$.missing").alias("missing_val"),
    )


@register(
    "func-map",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_from_map,
           1 AS n_keys
    FROM events
    """,
)
def func_map(spark, sf_dir):
    """Map family: parse props into MapType, read keys/values
    (SURVEY §1.2: MapType needed for events.props)."""
    from pyspark.sql.types import MapType, StringType

    ev = views(spark, sf_dir).table("events")
    m = F.from_json("props", MapType(StringType(), StringType()))
    return ev.select(
        "event_id",
        m.getItem("k").cast("bigint").alias("k_from_map"),
        F.size(F.map_keys(m)).cast("long").alias("n_keys"),
    )


@register(
    "func-hash",
    oracle="""
    SELECT c_custkey,
           md5(c_name) AS name_md5,
           sha256(c_name) AS name_sha256,
           format('cust-{:06d}', c_custkey) AS padded_id
    FROM customer
    """,
)
def func_hash(spark, sf_dir):
    """Hash/format family: stable ids + name mangling
    (dbtwiz/admin/backfill.py:134-163). xxhash64 exists engine-side but is
    seed-specific, so the cross-engine oracle uses md5/sha256."""
    c = views(spark, sf_dir).table("customer")
    return c.select(
        "c_custkey",
        F.md5("c_name").alias("name_md5"),
        F.sha2(F.col("c_name"), 256).alias("name_sha256"),
        F.format_string("cust-%06d", "c_custkey").alias("padded_id"),
    )


@register(
    "func-url",
    oracle="""
    WITH u AS (
        SELECT doc_id,
               'https://' || source || '.example.com/docs/'
                 || CAST(doc_id AS VARCHAR) || '?lang=' || lang || '&q=a%20b'
                 AS url
        FROM documents)
    SELECT doc_id,
           regexp_extract(url, '^[a-z]+://([^/]+)/', 1) AS host,
           regexp_extract(url, '^[a-z]+://[^/]+(/[^?]*)', 1) AS path,
           regexp_extract(url, '\\?(.*)$', 1) AS query,
           regexp_extract(url, 'lang=([^&]*)', 1) AS lang_param,
           replace(regexp_extract(url, 'q=([^&]*)', 1), '%20', ' ') AS q_decoded
    FROM u
    """,
)
def func_url(spark, sf_dir):
    """URL parsing family ([SURF] BigQuery NET.HOST / web-data idiom; the
    training-pipeline use is domain-level filtering and per-host mixture
    caps on crawl data): parse_url HOST/PATH/QUERY, per-key query
    extraction, and percent-decoding. URLs are synthesized deterministically
    from (doc_id, source, lang) — the corpus has no URL column.

    Spark's parse_url/url_decode are JVM intrinsics (codegen, map-side);
    DuckDB has no URL family, so the oracle states the same extraction as
    anchored regexes — disagreement on any component breaks the hash."""
    d = views(spark, sf_dir).table("documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"),
        F.lit("?lang="),
        F.col("lang"),
        F.lit("&q=a%20b"),
    )
    u = d.select("doc_id", url.alias("url"))
    return u.select(
        "doc_id",
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY")).alias("query"),
        F.parse_url("url", F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
        F.url_decode(F.parse_url("url", F.lit("QUERY"), F.lit("q"))).alias(
            "q_decoded"
        ),
    )


@register(
    "func-bitwise",
    oracle="""
    SELECT o_orderkey,
           o_orderkey & 255 AS low_byte,
           o_orderkey | 4096 AS with_flag,
           xor(o_orderkey, 21845) AS xored,
           o_orderkey << 2 AS shifted_l,
           o_orderkey >> 3 AS shifted_r
    FROM orders
    """,
)
def func_bitwise(spark, sf_dir):
    """Bitwise family ([SURF] BigQuery SQL surface via dbtwiz/dbt/run.py:38:
    &, |, ^, <<, >> — the SimHash/LSH entries use these in anger; this entry
    pins the scalar semantics cross-engine)."""
    o = views(spark, sf_dir).table("orders")
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).alias("low_byte"),
        k.bitwiseOR(F.lit(4096)).alias("with_flag"),
        k.bitwiseXOR(F.lit(21845)).alias("xored"),
        F.shiftleft(k, 2).alias("shifted_l"),
        F.shiftright(k, 3).alias("shifted_r"),
    )


@register(
    "func-generate-series",
    oracle="""
    SELECT o_orderkey,
           unnest(generate_series(1, (o_orderkey % 5) + 1)) AS n
    FROM orders WHERE o_orderkey % 500 = 0
    """,
)
def func_generate_series(spark, sf_dir):
    """GENERATE_ARRAY / generate_series as a lateral table function
    (BigQuery GENERATE_ARRAY + UNNEST): sequence() + explode — map-side row
    expansion, no shuffle."""
    o = views(spark, sf_dir).table("orders")
    return (
        o.filter(F.col("o_orderkey") % 500 == 0)
        .select(
            "o_orderkey",
            F.explode(
                F.sequence(
                    F.lit(1).cast("long"), (F.col("o_orderkey") % 5) + 1
                )
            ).alias("n"),
        )
    )


@register(
    "func-generate-date-array",
    oracle="""
    SELECT CAST(d AS TIMESTAMP) AS day FROM (
        SELECT unnest(generate_series(DATE '2024-01-01', DATE '2024-01-31',
                                      INTERVAL 7 DAY)) AS d)
    """,
)
def func_generate_date_array(spark, sf_dir):
    """GENERATE_DATE_ARRAY (BigQuery surface): weekly date spine for
    calendar/backfill scaffolding — the date-chunking primitive behind the
    backfill plane, as an engine expression. Output cast to timestamp (raw
    DateType diverges in the pandas canonicalizer)."""
    views(spark, sf_dir)
    return spark.sql(
        """
        SELECT CAST(d AS TIMESTAMP) AS day FROM (
            SELECT explode(sequence(DATE '2024-01-01', DATE '2024-01-31',
                                    INTERVAL 7 DAY)) AS d)
        """
    )


def _zorder_terms_sql(xcol: str, ycol: str, bits: int = 16) -> str:
    terms = []
    for i in range(bits):
        terms.append(f"((({xcol} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({ycol} >> {i}) & 1) << {2 * i + 1})")
    return " | ".join(terms)


@register(
    "func-zorder",
    oracle=f"""
    SELECT o_orderkey,
           CAST({_zorder_terms_sql('(o_custkey & 65535)', '(o_orderkey & 65535)')}
                AS BIGINT) AS zval
    FROM orders
    """,
)
def func_zorder(spark, sf_dir):
    """Z-order (Morton) interleave of two key columns — the
    multi-dimensional clustering key behind Delta's OPTIMIZE ZORDER and
    BigQuery multi-column clustering: sorting by the interleaved bits
    places rows close in BOTH dimensions near each other, so parquet
    min/max stats can skip blocks for predicates on either column (a
    plain lexicographic sort only skips on the leading one).

    Pure bit arithmetic (16 bits per dimension -> 32-bit z-value), built
    as a balanced OR tree of shift/mask expressions — whole-stage codegen
    compiles it to straight-line JVM bit ops, and DuckDB evaluates the
    identical integer expression, so the entry is exactly
    hash-checkable. At scale this feeds
    ``sortWithinPartitions(zval)`` at write time (the clustering half of
    materialize.write_table) — data-skipping on two dimensions for the
    price of one sort."""
    o = views(spark, sf_dir).table("orders")
    x = F.col("o_custkey").bitwiseAND(F.lit(65535))
    y = F.col("o_orderkey").bitwiseAND(F.lit(65535))
    z = F.lit(0).cast("long")
    for i in range(16):
        z = z.bitwiseOR(
            F.shiftleft(x.bitwiseAND(F.lit(1 << i)).cast("long"), i)
        ).bitwiseOR(
            F.shiftleft(y.bitwiseAND(F.lit(1 << i)).cast("long"), i + 1)
        )
    return o.select("o_orderkey", z.alias("zval"))


@register(
    "func-higher-order",
    oracle="""
    WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
    SELECT doc_id,
           len(list_transform(toks, w -> upper(w))) AS n_upper,
           len(list_filter(toks, w -> length(w) >= 5)) AS n_long,
           list_reduce(list_transform(toks, w -> length(w)),
                       (a, b) -> a + b) AS total_len,
           CAST(list_transform(toks, w -> length(w))[1]
                AS BIGINT) AS first_len
    FROM t
    """,
)
def func_higher_order(spark, sf_dir):
    """Higher-order array functions — the lambda surface
    (transform / filter / aggregate / element access over arrays), the
    primitive family every shingle/similarity operator in this engine is
    built from, as an explicit entry: per-document token transforms,
    predicate filtering, and a fold (sum of token lengths) with no
    explode and no UDF.

    Everything is a map-side expression evaluated inside the row — zero
    shuffles, codegen where eligible; at 100 TB lambdas are what keep
    array-shaped work from becoming token-level explode+shuffle
    (shingles() in ext_llm.py is the production proof)."""
    d = views(spark, sf_dir).table("documents")
    toks = F.split("text", " ")
    lens = F.transform(toks, lambda w: F.length(w))
    return d.select(
        "doc_id",
        F.size(F.transform(toks, lambda w: F.upper(w))).cast("long").alias("n_upper"),
        F.size(F.filter(toks, lambda w: F.length(w) >= 5)).cast("long").alias("n_long"),
        F.aggregate(lens, F.lit(0), lambda a, b: a + b).cast("long").alias("total_len"),
        F.element_at(lens, 1).cast("long").alias("first_len"),
    )


@register(
    "func-from-json",
    oracle="""
    WITH t AS (
        SELECT event_id,
               CASE WHEN event_id % 10 = 0 THEN substr(props, 1, 3)
                    ELSE props END AS payload
        FROM events)
    SELECT event_id,
           CASE WHEN json_valid(payload)
                THEN CAST(json_extract_string(payload, '$.k') AS BIGINT)
           END AS k_val,
           json_valid(payload) AS parse_ok
    FROM t
    """,
)
def func_from_json(spark, sf_dir):
    """Schema-applied JSON parse (``from_json`` with a declared struct
    schema) including the malformed-input contract: unparseable payloads
    (10% truncated here, deterministically) yield NULL rather than
    failing the job — the property an ingest pipeline over dirty
    event streams depends on. Complements func-json's path extraction:
    this is the typed-columns parse surface.

    Map-side expression (Jackson parse inside codegen), no UDF; the
    parse_ok flag comes from PERMISSIVE mode's corrupt-record column —
    the per-row quality signal a pipeline aggregates into its
    dead-letter rate."""
    ev = views(spark, sf_dir).table("events")
    payload = F.when(
        F.col("event_id") % 10 == 0, F.substring("props", 1, 3)
    ).otherwise(F.col("props"))
    parsed = F.from_json(
        payload,
        "k BIGINT, _corrupt STRING",
        {"columnNameOfCorruptRecord": "_corrupt"},
    )
    return ev.select(
        "event_id",
        parsed["k"].alias("k_val"),
        parsed["_corrupt"].isNull().alias("parse_ok"),
    )


@register(
    "func-surrogate-key",
    oracle="""
    SELECT o_orderkey,
           md5(COALESCE(CAST(o_custkey AS VARCHAR), '_null_') || '-'
               || COALESCE(strftime(o_orderdate, '%Y-%m-%d'), '_null_')
               || '-'
               || COALESCE(o_orderpriority, '_null_')) AS sk
    FROM orders WHERE o_orderkey % 100 = 0
    """,
)
def func_surrogate_key(spark, sf_dir):
    """dbt-utils ``generate_surrogate_key`` parity: the md5-of-
    concatenated-columns hash key every dbt mart uses to mint stable
    grain ids (the reference's models inherit the macro). NULLs map to
    a sentinel BEFORE the concat — dbt's exact rule, because a bare
    concat would collide (a, NULL) with (aNULL, NULL-less) and make two
    different grains share a key; the '-' delimiter prevents
    ('ab','c')/('a','bc') collisions. Dates format explicitly
    ('yyyy-MM-dd' in Spark, strftime in DuckDB) — relying on each
    engine's default date->string cast is a silent cross-engine
    divergence. Output sampled (keyspace % 100) to keep the checked
    surface bounded; the expression is the same map-side codegen at any
    scale.

    Scale: pure scan-fused expression — no shuffle, no UDF."""
    o = views(spark, sf_dir).table("orders")
    sentinel = F.lit("_null_")
    parts = [
        F.coalesce(F.col("o_custkey").cast("string"), sentinel),
        F.coalesce(F.date_format("o_orderdate", "yyyy-MM-dd"), sentinel),
        F.coalesce(F.col("o_orderpriority"), sentinel),
    ]
    return o.filter(F.col("o_orderkey") % 100 == 0).select(
        "o_orderkey", F.md5(F.concat_ws("-", *parts)).alias("sk")
    )


@register(
    "func-column-masking",
    oracle=f"""
    SELECT c_custkey,
           'cust_' || CAST({hkey_sql('c_custkey')} AS VARCHAR) AS pseudonym,
           repeat('*', GREATEST(len(c_name) - 4, 0))
               || substr(c_name, GREATEST(len(c_name) - 3, 1)) AS name_masked,
           CASE WHEN c_acctbal < 0 THEN 'negative'
                WHEN c_acctbal < 5000 THEN 'low'
                ELSE 'high' END AS balance_band
    FROM customer WHERE c_custkey % 50 = 0
    """,
)
def func_column_masking(spark, sf_dir):
    """Column-level data masking for governed marts (the reference's
    access/policy plane -- authorized-view semantics,
    dbtwiz/model/create.py access_choices -- enforced at the DATA
    level): deterministic pseudonymization via the engine's portable
    Knuth hash (same entity -> same token across runs and tables, so
    joins still work on masked data), format-preserving last-4
    partial masking for display fields, and value banding for numeric
    fields (the k-anonymity coarsening). Sampled keyspace keeps the
    checked surface bounded; each mask is a scan-fused expression.

    Scale: pure map-side codegen -- no shuffle, no UDF; the masked view
    is a SELECT any engine pushes to the scan."""
    c = views(spark, sf_dir).table("customer")
    nlen = F.length("c_name")
    return c.filter(F.col("c_custkey") % 50 == 0).select(
        "c_custkey",
        F.concat(
            F.lit("cust_"), hkey(F.col("c_custkey")).cast("string")
        ).alias("pseudonym"),
        F.concat(
            F.expr("repeat('*', GREATEST(length(c_name) - 4, 0))"),
            F.substring(
                F.col("c_name"), F.greatest(nlen - 3, F.lit(1)), 4
            ),
        ).alias("name_masked"),
        F.when(F.col("c_acctbal") < 0, "negative")
        .when(F.col("c_acctbal") < 5000, "low")
        .otherwise("high")
        .alias("balance_band"),
    )
