"""Training-data pipeline operators (SURVEY §2.11 extension family §E).

The ops a 100 TB LLM data pipeline runs between raw crawl and tokenizer:
deterministic sampling/splitting, benchmark decontamination, sequence
packing, and domain-mixture computation. All are pure DataFrame expressions
(no UDFs, no collect) and every entry is oracle-checked — randomness is
replaced by an explicit multiplicative hash so Spark and DuckDB agree bit
for bit, and the same trick is what makes reruns reproducible at scale
(a sample/split must not change when the job is retried).

Reference analogs: the reference has no LLM ops (it is an orchestrator);
these extend the engine per the brief's training-pipeline mandate, reusing
the corpus conventions of ext_llm.py.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dbtwiz_spark.ops.common import views
from dbtwiz_spark.ops.registry import register

# Knuth multiplicative hash: deterministic pseudo-random ordering computable
# with exact BIGINT arithmetic in any engine (Spark and DuckDB produce the
# identical value, unlike engine-native hash()/xxhash64 which differ).
# The id is reduced mod 2^31 BEFORE the multiply: (2^31-1) × 2654435761
# ≈ 5.7e18 stays inside BIGINT, whereas a raw multiply overflows for ids
# ≳ 3.5e9 (silent wrap in Spark, error in DuckDB — both fatal to parity).
_KNUTH = 2654435761
_M31 = 2147483648
_M32 = 4294967296


def _hkey(col):
    return ((col % F.lit(_M31)) * F.lit(_KNUTH)) % F.lit(_M32)


def _hkey_sql(expr: str) -> str:
    return f"((({expr}) % {_M31}) * {_KNUTH}) % {_M32}"


@register(
    "ext-sample-stratified",
    oracle=f"""
    SELECT doc_id, lang FROM (
        SELECT doc_id, lang,
               ROW_NUMBER() OVER (PARTITION BY lang
                                  ORDER BY {_hkey_sql('doc_id')}, doc_id) AS rn
        FROM documents)
    WHERE rn <= 20
    """,
)
def ext_sample_stratified(spark, sf_dir):
    """Stratified sampling: a fixed-size (20 docs) uniform-without-replacement
    sample per language stratum.

    The multiplicative hash gives each doc a deterministic pseudo-random
    rank; row_number per stratum takes the sample. One shuffle on the
    stratum key; per-stratum top-K is what TakeOrdered does at scale, and
    the sample is stable across retries/engines (no rand())."""
    d = views(spark, sf_dir).table("documents")
    w = Window.partitionBy("lang").orderBy(_hkey(F.col("doc_id")), F.col("doc_id"))
    return (
        d.select("doc_id", "lang", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 20)
        .select("doc_id", "lang")
    )


@register(
    "ext-split-train-eval",
    oracle=f"""
    SELECT lang, split, COUNT(*) AS n_docs, SUM(n_chars) AS total_chars
    FROM (
        SELECT lang, n_chars,
               CASE WHEN {_hkey_sql('doc_id')} % 100 < 80 THEN 'train'
                    WHEN {_hkey_sql('doc_id')} % 100 < 90 THEN 'val'
                    ELSE 'test' END AS split
        FROM documents)
    GROUP BY 1, 2
    """,
)
def ext_split_train_eval(spark, sf_dir):
    """Deterministic 80/10/10 train/val/test split by hashed doc_id.

    Hash-based assignment is the scale-safe split: no global shuffle or
    sort, any engine reproduces the same membership, and a re-crawled doc
    lands in the same split forever (no eval leakage across runs). Output is
    the per-(lang, split) histogram — map-side partial agg, one shuffle."""
    d = views(spark, sf_dir).table("documents")
    bucket = _hkey(F.col("doc_id")) % 100
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    )
    return (
        d.select("lang", "n_chars", split.alias("split"))
        .groupBy("lang", "split")
        .agg(F.count("*").alias("n_docs"), F.sum("n_chars").alias("total_chars"))
    )


_DECONTAM_SQL = """
    WITH arrs AS (
        SELECT doc_id, string_split(text, ' ') AS a FROM documents),
    sh AS (
        SELECT DISTINCT doc_id,
               unnest(list_transform(generate_series(1, len(a) - 4),
                      i -> a[i] || ' ' || a[i+1] || ' ' || a[i+2] || ' '
                           || a[i+3] || ' ' || a[i+4])) AS shingle
        FROM arrs),
    bench AS (SELECT * FROM sh WHERE doc_id % 97 = 0),
    train AS (SELECT * FROM sh WHERE doc_id % 97 <> 0),
    contaminated AS (
        SELECT DISTINCT t.doc_id
        FROM train t JOIN bench b ON t.shingle = b.shingle)
    SELECT d.doc_id, d.lang FROM documents d
    WHERE d.doc_id % 97 <> 0
      AND d.doc_id NOT IN (SELECT doc_id FROM contaminated)
"""


@register("ext-decontaminate", oracle=_DECONTAM_SQL)
def ext_decontaminate(spark, sf_dir):
    """Benchmark decontamination: drop training docs sharing any 5-gram with
    the held-out benchmark set (doc_id % 97 == 0 stands in for the eval
    suite).

    Scale shape: the overlap test is a semi-join on the shingle key — the
    benchmark side is tiny (eval suites are thousands of docs), so at scale
    its shingle set broadcasts and contamination detection is map-side over
    the training corpus; never an all-pairs comparison."""
    from dbtwiz_spark.ops.ext_llm import shingles

    d = views(spark, sf_dir).table("documents")
    sh = shingles(d, 5)
    is_bench = F.col("doc_id") % 97 == 0
    bench_sh = sh.filter(is_bench).select("shingle").distinct()
    contaminated = (
        sh.filter(~is_bench)
        .join(F.broadcast(bench_sh), "shingle", "left_semi")
        .select("doc_id")
        .distinct()
    )
    return (
        d.filter(~is_bench)
        .join(contaminated, "doc_id", "left_anti")
        .select("doc_id", "lang")
    )


@register(
    "ext-pack-sequences",
    oracle="""
    WITH toks AS (
        SELECT doc_id, lang, len(string_split(text, ' ')) AS tok
        FROM documents),
    packed AS (
        SELECT lang, tok,
               (SUM(tok) OVER (PARTITION BY lang ORDER BY doc_id
                               ROWS UNBOUNDED PRECEDING) - tok) // 512 AS bin
        FROM toks)
    SELECT lang, bin, COUNT(*) AS n_docs, SUM(tok) AS total_tokens
    FROM packed GROUP BY 1, 2
    """,
)
def ext_pack_sequences(spark, sf_dir):
    """Sequence packing: assign docs to fixed 512-token training bins by
    running start-offset within each language stream (a doc starts in the
    bin where its cumulative offset lands).

    The cumulative sum is a per-stratum window (partitioned — parallel
    across languages/shards; at 100 TB the stream key would be
    (lang, shard)). Integer token counts make the result exact on both
    engines. Output: per-bin document and token counts."""
    d = views(spark, sf_dir).table("documents")
    toks = d.select(
        "doc_id", "lang", F.size(F.split("text", " ")).cast("long").alias("tok")
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    start = F.sum("tok").over(w) - F.col("tok")  # exclusive running offset
    packed = toks.select(
        "lang", "tok", F.floor(start / 512).cast("long").alias("bin")
    )
    return packed.groupBy("lang", "bin").agg(
        F.count("*").alias("n_docs"), F.sum("tok").alias("total_tokens")
    )


@register(
    "ext-mix-domains",
    oracle="""
    WITH per_src AS (
        SELECT source, COUNT(*) AS n_docs,
               SUM(len(string_split(text, ' '))) AS total_tokens
        FROM documents GROUP BY 1),
    tot AS (SELECT SUM(total_tokens) AS all_tokens, COUNT(*) AS n_src FROM per_src)
    SELECT source, n_docs, total_tokens,
           CAST(all_tokens AS DOUBLE) / (n_src * total_tokens) AS mix_weight
    FROM per_src, tot
    """,
)
def ext_mix_domains(spark, sf_dir):
    """Domain-mixture weights: per-source token counts plus the sampling
    weight that re-balances the mixture to a uniform token share per source
    (weight = target_share / actual_share, target uniform).

    Two aggregations — per-source (one shuffle) and the 1-row global total
    (broadcast back). Integer token totals keep the ratio exact; the final
    division is one double op, identical in both engines."""
    d = views(spark, sf_dir).table("documents")
    per_src = d.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(F.split("text", " ")).cast("long")).alias("total_tokens"),
    )
    tot = per_src.agg(
        F.sum("total_tokens").alias("all_tokens"), F.count("*").alias("n_src")
    )
    return per_src.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "total_tokens",
        (
            F.col("all_tokens").cast("double")
            / (F.col("n_src") * F.col("total_tokens"))
        ).alias("mix_weight"),
    )


@register(
    "ext-mix-temperature",
    oracle="""
    WITH per_src AS (
        SELECT source,
               SUM(len(string_split(text, ' '))) AS total_tokens
        FROM documents GROUP BY 1),
    scaled AS (
        SELECT source, total_tokens,
               CAST(SQRT(CAST(total_tokens AS DOUBLE)) AS DECIMAL(38, 12)) AS s
        FROM per_src),
    tot AS (SELECT SUM(CAST(total_tokens AS HUGEINT)) AS all_tokens,
                   SUM(s) AS all_s
            FROM scaled)
    SELECT source, total_tokens,
           CAST(total_tokens AS DOUBLE) / CAST(all_tokens AS DOUBLE) AS p_raw,
           CAST(s AS DOUBLE) / CAST(all_s AS DOUBLE) AS p_temp
    FROM scaled, tot
    """,
)
def ext_mix_temperature(spark, sf_dir):
    """Temperature-scaled domain sampling (multinomial alpha-sampling,
    alpha = 0.5): p_temp(s) = tokens_s^alpha / sum_t tokens_t^alpha —
    the standard rebalancing that up-samples small domains without
    flattening the mixture entirely (p_raw is the natural token share).

    alpha is fixed at 0.5 so the power is ``sqrt``, which IEEE requires to
    be correctly rounded — bit-identical in Spark and DuckDB, unlike
    ``pow(x, 0.7)``'s 1-ulp libm drift. The sqrt values are quantized to
    DECIMAL(38,12) before the sum so accumulation is exact and
    order-independent (same trick as ops.common.dsum). Shapes: one
    per-source aggregation (shuffle with partial agg), one 1-row total
    broadcast back — no second scan of documents."""
    d = views(spark, sf_dir).table("documents")
    dec = "decimal(38,12)"
    per_src = d.groupBy("source").agg(
        F.sum(F.size(F.split("text", " ")).cast("long")).alias("total_tokens"),
    )
    scaled = per_src.select(
        "source",
        "total_tokens",
        F.sqrt(F.col("total_tokens").cast("double")).cast(dec).alias("s"),
    )
    tot = scaled.agg(
        F.sum("total_tokens").alias("all_tokens"), F.sum("s").alias("all_s")
    )
    return scaled.crossJoin(F.broadcast(tot)).select(
        "source",
        "total_tokens",
        (F.col("total_tokens").cast("double") / F.col("all_tokens").cast("double")).alias(
            "p_raw"
        ),
        (F.col("s").cast("double") / F.col("all_s").cast("double")).alias("p_temp"),
    )


@register(
    "ext-quality-repetition",
    oracle="""
    WITH words AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
    counts AS (
        SELECT doc_id, w, COUNT(*) AS cnt FROM words GROUP BY 1, 2),
    per_doc AS (
        SELECT doc_id, SUM(cnt) AS n_words, COUNT(*) AS n_distinct,
               MAX(cnt) AS top_cnt
        FROM counts GROUP BY 1)
    SELECT doc_id, n_words, n_distinct,
           CAST(n_words - n_distinct AS DOUBLE) / n_words AS dup_word_frac,
           CAST(top_cnt AS DOUBLE) / n_words AS top_word_share
    FROM per_doc
    """,
)
def ext_quality_repetition(spark, sf_dir):
    """Repetition quality signals (the Gopher-rules family): per document,
    the duplicate-word fraction and the most-frequent-word share — high
    values flag boilerplate/spam for the quality filter that
    ext-quality-score's length/punctuation ratios alone miss.

    Shape: explode words -> count per (doc, word) -> reduce per doc. Both
    aggregations carry map-side partial aggregation, and the (doc_id, word)
    key is near-unique so the first shuffle is skew-free; at 100 TB this is
    the plain wordcount pattern sharded by document. Integer counts make
    every ratio a single exact-operand double division."""
    d = views(spark, sf_dir).table("documents")
    words = d.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
    counts = words.groupBy("doc_id", "w").agg(F.count("*").alias("cnt"))
    per_doc = counts.groupBy("doc_id").agg(
        F.sum("cnt").alias("n_words"),
        F.count("*").alias("n_distinct"),
        F.max("cnt").alias("top_cnt"),
    )
    return per_doc.select(
        "doc_id",
        "n_words",
        "n_distinct",
        (
            (F.col("n_words") - F.col("n_distinct")).cast("double")
            / F.col("n_words")
        ).alias("dup_word_frac"),
        (F.col("top_cnt").cast("double") / F.col("n_words")).alias(
            "top_word_share"
        ),
    )


_CLUSTER_PAIRS_SQL = """
        SELECT doc_a, doc_b FROM (
            WITH arrs AS (
                SELECT doc_id, string_split(text, ' ') AS a FROM documents),
            sh_all AS (
                SELECT DISTINCT doc_id,
                       unnest(list_transform(generate_series(1, len(a) - 2),
                              i -> a[i] || ' ' || a[i+1] || ' ' || a[i+2])) AS shingle
                FROM arrs),
            hot AS (
                SELECT shingle FROM sh_all GROUP BY shingle
                HAVING COUNT(*) > 0.25 * (SELECT COUNT(*) FROM documents)),
            sh AS (
                SELECT * FROM sh_all WHERE shingle NOT IN (SELECT shingle FROM hot)),
            sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
            pairs AS (
                SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
                FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                GROUP BY 1, 2)
            SELECT doc_a, doc_b,
                   CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) AS jaccard
            FROM pairs
            JOIN sizes sa ON sa.doc_id = doc_a
            JOIN sizes sb ON sb.doc_id = doc_b) j
        WHERE jaccard >= 0.5
"""


@register(
    "ext-dedup-cluster",
    oracle=f"""
    WITH RECURSIVE
    prs AS ({_CLUSTER_PAIRS_SQL}),
    edges AS (SELECT doc_a AS a, doc_b AS b FROM prs
              UNION SELECT doc_b, doc_a FROM prs),
    reach(doc_id, r) AS (
        SELECT DISTINCT a, a FROM edges
        UNION
        SELECT e.a, rc.r FROM edges e JOIN reach rc ON rc.doc_id = e.b)
    SELECT doc_id, MIN(r) AS cluster_id,
           doc_id = MIN(r) AS keep
    FROM reach GROUP BY doc_id
    """,
)
def ext_dedup_cluster(spark, sf_dir):
    """Near-duplicate CLUSTERING: connected components over the >=0.5
    n-gram-Jaccard pair graph, canonical representative = the minimum
    doc_id reachable from each node. Pairwise dedup alone under-deletes
    (A~B, B~C but A!~C leaves two of the three); the component view keeps
    exactly one doc per transitive cluster — the ``keep`` flag.

    Algorithm: iterative min-label propagation to a fixpoint — per round,
    every node takes the min of its own label and its neighbours' labels
    (one equi-join + one aggregation per round, both key-partitioned, no
    driver data). Rounds needed = graph diameter, logarithmic for the
    short near-dup chains dedup produces; capped at 20 with a convergence
    check (the per-round ``count`` is an aggregate action, not a
    driver-side collect). The oracle computes the same fixpoint as a
    recursive min-reachability CTE — both sides converge to the unique
    transitive answer, so the hash match is exact.

    At 100 TB the pair graph (post-LSH) is orders of magnitude smaller
    than the corpus; each round shuffles only (node, label) pairs, and the
    converged labels persist for the keep-join back to documents.
    """
    from dbtwiz_spark.ops.ext_llm import ext_ngram_jaccard

    pairs = (
        ext_ngram_jaccard(spark, sf_dir)
        .filter(F.col("jaccard") >= 0.5)
        .select("doc_a", "doc_b")
    )
    edges = (
        pairs.union(
            pairs.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))
        )
        .select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
        # persisted AND force-materialized: every propagation round joins
        # edges, and without the cache each round would recompute the whole
        # upstream shingle similarity join — the dominant cost at scale
        .persist()
    )
    edges.count()
    labels = (
        edges.select(F.col("a").alias("doc_id"))
        .distinct()
        .withColumn("lbl", F.col("doc_id"))
        .persist()
    )
    labels.count()
    for _ in range(20):
        neigh = (
            edges.join(labels, edges.b == labels.doc_id)
            .groupBy("a")
            .agg(F.min("lbl").alias("nl"))
        )
        nxt = (
            labels.join(neigh, labels.doc_id == neigh.a, "left")
            .select(
                labels.doc_id,
                F.least(labels.lbl, F.coalesce(neigh.nl, labels.lbl)).alias("lbl"),
            )
            .persist()
        )
        changed = (
            nxt.alias("n")
            .join(labels.alias("o"), F.col("n.doc_id") == F.col("o.doc_id"))
            .filter(F.col("n.lbl") != F.col("o.lbl"))
            .count()
        )
        labels.unpersist()
        labels = nxt
        if changed == 0:
            break
    return labels.select(
        "doc_id",
        F.col("lbl").alias("cluster_id"),
        (F.col("doc_id") == F.col("lbl")).alias("keep"),
    )
