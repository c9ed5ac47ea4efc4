"""Quality checks for the [EXT] ops whose driver check is rows-only:
the approximate algorithms are validated against their exact counterparts."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def test_minhash_lsh_recall_vs_exact_jaccard(spark):
    """LSH candidates must recover the high-similarity pairs the exact
    n-gram Jaccard join finds (8 bands × 4 rows ⇒ ≥99% @ j≥0.7)."""
    from dbtwiz_spark.ops.ext_llm import ext_dedup_near, ext_ngram_jaccard

    exact = {
        (r.doc_a, r.doc_b)
        for r in ext_ngram_jaccard(spark, SF_DIR).filter(F.col("jaccard") >= 0.7).collect()
    }
    lsh = {(r.doc_a, r.doc_b) for r in ext_dedup_near(spark, SF_DIR).collect()}
    assert exact, "fixture should contain near-duplicate documents"
    missed = exact - lsh
    assert len(missed) <= max(1, len(exact) // 10), f"LSH missed {missed}"
    # and LSH never reports a pair below the verification threshold
    assert all(r.jaccard >= 0.4 for r in ext_dedup_near(spark, SF_DIR).collect())


def test_simhash_pairs_are_near_duplicates(spark):
    """SimHash hashes the token multiset, so its pairs are validated against
    token-level (1-gram) Jaccard, not the 3-shingle join."""
    from dbtwiz_spark.catalog import Catalog
    from dbtwiz_spark.ops.ext_llm import ext_dedup_simhash

    sim = [(r.doc_a, r.doc_b) for r in ext_dedup_simhash(spark, SF_DIR).collect()]
    assert sim, "simhash should find the duplicated documents"
    toks = {
        r.doc_id: set(r.text.split(" "))
        for r in Catalog(spark, SF_DIR).table("documents").collect()
    }
    jac = [
        len(toks[a] & toks[b]) / len(toks[a] | toks[b]) for a, b in sim
    ]
    good = sum(1 for j in jac if j >= 0.5)
    assert good >= len(sim) * 0.8, f"low-precision pairs: {sorted(zip(jac, sim))[:5]}"


def test_approx_count_distinct_within_5pct(spark):
    # The entry now emits the error-bound contract itself
    # (|approx - exact| <= 5% * exact per group, as a boolean) so the
    # driver's DuckDB oracle can hash-match it; here we assert every
    # group honours the bound and the grouping is complete.
    from dbtwiz_spark.ops.aggregates import agg_approx_count_distinct

    rows = agg_approx_count_distinct(spark, SF_DIR).collect()
    assert len(rows) == 5  # one per o_orderpriority
    violations = [r.o_orderpriority for r in rows if not r.within_bound]
    assert not violations, f"HLL estimate outside 5% bound: {violations}"


def test_ann_lsh_buckets_partition_all_vectors(spark):
    from dbtwiz_spark.catalog import Catalog
    from dbtwiz_spark.ops.ext_llm import ext_ann_lsh_bucket

    buckets = ext_ann_lsh_bucket(spark, SF_DIR).collect()
    total = sum(r.n_vectors for r in buckets)
    n = Catalog(spark, SF_DIR).table("embeddings").count()
    assert total == n
    assert 1 < len(buckets) <= 256


def test_cosine_topk_fast_path_matches_exact(spark):
    """zip_with fast path must rank the same neighbors as the exact
    decimal-accumulated corpus entry (cosine may differ in low-order bits,
    ranking must not)."""
    from dbtwiz_spark.catalog import Catalog
    from dbtwiz_spark.ops.ext_llm import cosine_topk, ext_sim_cosine_topk

    exact = {
        (r.q_vec_id, r.rnk): r.c_vec_id
        for r in ext_sim_cosine_topk(spark, SF_DIR).collect()
    }
    emb = Catalog(spark, SF_DIR).table("embeddings")
    queries = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("q_vec_id"), F.col("embedding").alias("q_embedding")
    )
    fast = {
        (r.q_vec_id, r.rnk): r.c_vec_id for r in cosine_topk(emb, queries, 10).collect()
    }
    agree = sum(1 for k, v in exact.items() if fast.get(k) == v)
    assert agree >= len(exact) * 0.98


def test_ivf_recall_vs_exact_topk(spark):
    """IVF (16 cells, nprobe=4) must recover most of the exact top-10
    neighbors; measured deterministically (fixed seeds, no RNG)."""
    from dbtwiz_spark.ops.ext_llm import cosine_topk, ivf_topk
    from dbtwiz_spark.ops.common import views

    emb = views(spark, SF_DIR).table("embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("q_vec_id"), F.col("embedding").alias("q_embedding")
    )
    exact = {
        (r.q_vec_id, r.c_vec_id) for r in cosine_topk(emb, queries, k=10).collect()
    }
    ivf = {
        (r.q_vec_id, r.c_vec_id)
        for r in ivf_topk(emb, queries, k=10, n_cells=16, nprobe=4).collect()
    }
    assert exact
    recall = len(exact & ivf) / len(exact)
    assert recall >= 0.5, f"IVF recall {recall:.2f} too low"


def test_ivf_materialized_index_matches_in_memory(spark, tmp_path):
    """The warehouse-materialized IVF index (parquet partitioned by cell)
    returns the same top-k as the in-memory index, and the search scan is
    dynamically partition-pruned to the probed cells."""
    from pyspark.sql import functions as F

    from dbtwiz_spark.materialize import Warehouse
    from dbtwiz_spark.ops.ext_llm import (
        ivf_index_write,
        ivf_topk,
        ivf_topk_from_table,
    )
    from tests.conftest import SF_DIR

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("q_vec_id"), F.col("embedding").alias("q_embedding")
    )
    wh = Warehouse(spark, str(tmp_path / "annwh"))
    ivf_index_write(wh, "ivf_idx", emb, n_cells=8)
    # cell-partition dirs exist on disk
    assert (wh.path("ivf_idx") / "cell=1").exists()

    got = ivf_topk_from_table(wh, "ivf_idx", queries, k=5, nprobe=3)
    # the index scan is dynamically partition-pruned to the probed cells
    plan = got._jdf.queryExecution().explainString(
        got.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "dynamicpruningexpression(cast(cell" in plan
    want = ivf_topk(emb, queries, k=5, nprobe=3, n_cells=8)
    g = sorted((r.q_vec_id, r.rnk, r.c_vec_id) for r in got.collect())
    w = sorted((r.q_vec_id, r.rnk, r.c_vec_id) for r in want.collect())
    assert g == w and len(g) > 0


def test_resize_images_plumbing(spark):
    """resize_images: struct metadata rides through Arrow mapInPandas; the
    meta.width/height are rewritten, payload and other fields preserved."""
    from pyspark.sql import functions as F

    from dbtwiz_spark.multimodal import resize_images

    df = spark.createDataFrame(
        [(1, b"imgbytes", ("image/png", 640, 480, None)),
         (2, b"x", ("image/jpeg", 32, 32, None))],
        "doc_id LONG, payload BINARY, "
        "meta STRUCT<media_type STRING, width INT, height INT, duration_ms LONG>",
    )
    out = {r.doc_id: r for r in resize_images(df, 224, 224).collect()}
    assert out[1].meta.width == 224 and out[1].meta.height == 224
    assert out[1].meta.media_type == "image/png"
    assert bytes(out[1].payload) == b"imgbytes"
    assert out[2].meta.media_type == "image/jpeg"


def test_ann_lsh_topk_recall_vs_exact(spark):
    """Multi-table LSH top-k must recover >=0.9 of the exact top-10 while
    actually pruning the candidate space (mirrors the IVF recall floor).
    Deterministic: hyperplanes derive from xxhash64, no RNG."""
    from dbtwiz_spark.ops.common import views
    from dbtwiz_spark.ops.ext_llm import cosine_topk, lsh_topk

    emb = views(spark, SF_DIR).table("embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("q_vec_id"), F.col("embedding").alias("q_embedding")
    )
    exact = {
        (r.q_vec_id, r.c_vec_id) for r in cosine_topk(emb, queries, k=10).collect()
    }
    assert exact
    got = {
        (r.q_vec_id, r.c_vec_id)
        for r in lsh_topk(emb, queries, k=10, n_planes=3, n_tables=8).collect()
    }
    recall = len(exact & got) / len(exact)
    assert recall >= 0.9, f"LSH recall {recall:.2f} too low"


def test_ann_lsh_topk_prunes_candidates(spark):
    """The bucket join must be selective: candidate pairs well below the
    all-pairs count (otherwise LSH degenerated into brute force)."""
    from dbtwiz_spark.ops.common import views
    from dbtwiz_spark.ops.ext_llm import lsh_signatures

    emb = views(spark, SF_DIR).table("embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("q_vec_id"), F.col("embedding").alias("q_embedding")
    )
    cs = lsh_signatures(emb, "embedding", 3, 8)
    qs = lsh_signatures(queries, "q_embedding", 3, 8)
    n_cand = (
        cs.join(F.broadcast(qs), on=["t", "bucket"])
        .filter(F.col("q_vec_id") != F.col("vec_id"))
        .dropDuplicates(["q_vec_id", "vec_id"])
        .count()
    )
    n_all = emb.count() * queries.count()
    assert 0 < n_cand < 0.8 * n_all, f"candidates {n_cand} vs all-pairs {n_all}"


def test_heavy_hitters_candidate_superset_any_partitioning(spark):
    """The Misra-Gries candidate union must contain every n/30-frequent
    token REGARDLESS of how the token stream is partitioned (the deficit
    bound n/(K+1) < n/30 is partition-count-independent), and the final
    entry output must equal the exact SQL answer."""
    import pandas as pd

    from dbtwiz_spark.catalog import Catalog
    from dbtwiz_spark.ops.aggregates import agg_heavy_hitters

    d = Catalog(spark, SF_DIR).table("documents")
    toks = d.select(F.explode(F.split("text", " ")).alias("token"))
    exact = toks.groupBy("token").count().toPandas()
    n = int(exact["count"].sum())
    truth = set(exact[exact["count"] >= n / 30.0]["token"])
    assert truth, "fixture should contain heavy tokens"

    got = {r.token for r in agg_heavy_hitters(spark, SF_DIR).collect()}
    assert got == truth

    # candidate stage alone (the SHIPPED summarizer, not a copy), under
    # adversarial partitionings
    from dbtwiz_spark.ops.aggregates import mg_summarizer

    for parts in (1, 7, 32):
        cand = {
            r.token
            for r in toks.repartition(parts)
            .mapInPandas(mg_summarizer(64), "token string")
            .distinct()
            .collect()
        }
        assert truth <= cand, f"parts={parts}: lost {truth - cand}"


def test_containment_catches_embedded_document(spark, tmp_path):
    """A small document embedded verbatim inside a larger one must be
    flagged by the containment join (src=small, dst=big, containment 1.0)
    even when symmetric Jaccard sits below its 0.4 threshold — the case
    the asymmetric denominator exists for."""
    import shutil

    from pyspark.sql import functions as F

    from dbtwiz_spark.ops.ext_llm import ext_dedup_containment, ext_ngram_jaccard

    sf = tmp_path / "sf"
    sf.mkdir()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "embeddings"):
        shutil.copy(f"/root/testdata/sf0.001/{t}.parquet", sf / f"{t}.parquet")
    small = "alpha beta gamma delta epsilon zeta eta theta"
    filler = " ".join(f"w{i} x{i} y{i}" for i in range(40))
    big = f"{filler} {small} {filler}"
    # enough unrelated docs that the hot-shingle DF cap (df > 0.25×N) is
    # non-degenerate — at N=3 every df≥1 shingle would be "hot" and dropped
    others = [
        (10 + i,
         " ".join(f"d{i}t{j} d{i}u{j} d{i}v{j}" for j in range(20)),
         "en", "web", 10)
        for i in range(20)
    ]
    spark.createDataFrame(
        [(1, small, "en", "web", len(small)),
         (2, big, "en", "web", len(big))] + others,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(str(sf / "documents.parquet"))

    got = {(r.src, r.dst): r.containment
           for r in ext_dedup_containment(spark, str(sf)).collect()}
    assert got.get((1, 2)) == 1.0          # small fully inside big
    assert (2, 1) not in got               # big not inside small
    assert not any(k[0] >= 10 or k[1] >= 10 for k in got)  # others untouched
    # symmetric jaccard misses the pair (union-diluted below 0.4)
    jac = {(r.doc_a, r.doc_b)
           for r in ext_ngram_jaccard(spark, str(sf)).collect()}
    assert (1, 2) not in jac


def test_bm25_ranks_term_dense_docs_first(spark):
    """BM25 sanity on the real corpus: every returned score is positive,
    the list is sorted descending, and the top doc contains at least one
    query term more often than the corpus median document."""
    from dbtwiz_spark.ops.ext_pipeline import _BM25_TERMS, ext_bm25_search

    rows = ext_bm25_search(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 20
    scores = [r.score for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)
    from dbtwiz_spark.ops.common import views

    top_doc = (
        views(spark, "/root/testdata/sf0.001").table("documents")
        .filter(f"doc_id = {rows[0].doc_id}")
        .collect()[0]
        .text
    )
    assert any(t in top_doc.split() for t in _BM25_TERMS)


def test_dedup_near_rejoin_verification_parity(spark, monkeypatch):
    """The 100 TB verification switch (round-11): with
    spark.graft.dedupVerify=rejoin, ext-dedup-near verifies candidates
    by a shingle-level equi-join + partial-aggregated count instead of
    carrying each side's full shingle-set array onto every pair. The
    two paths must produce IDENTICAL (doc_a, doc_b, jaccard) rows —
    same candidate universe (shared memoized signature artifact), same
    capped shingle universe (the rejoin table explodes from the same
    per-doc artifact), so any divergence is a bug, not sampling. Also
    pins that the rejoin plan actually verifies at shingle level (a
    second join on the exploded shingle column, no array_intersect)."""
    from dbtwiz_spark.ops.ext_llm import ext_dedup_near

    # the env var outranks the conf for BOTH calls: if it leaked in from
    # the test environment, the 'carry' baseline would silently run the
    # rejoin path and the parity assertion would compare rejoin to itself
    monkeypatch.delenv("SPARK_GRAFT_DEDUP_VERIFY", raising=False)
    sf = "/root/testdata/sf0.001"
    carry = {
        (r.doc_a, r.doc_b, round(r.jaccard, 12))
        for r in ext_dedup_near(spark, sf).collect()
    }
    spark.conf.set("spark.graft.dedupVerify", "rejoin")
    try:
        rejoin_df = ext_dedup_near(spark, sf)
        plan = rejoin_df._jdf.queryExecution().optimizedPlan().toString()
        assert "array_intersect" not in plan, (
            "rejoin mode must not carry set arrays into verification"
        )
        rejoin = {
            (r.doc_a, r.doc_b, round(r.jaccard, 12))
            for r in rejoin_df.collect()
        }
    finally:
        spark.conf.unset("spark.graft.dedupVerify")
    assert rejoin == carry, (
        f"verification paths diverge: only-carry={carry - rejoin} "
        f"only-rejoin={rejoin - carry}"
    )
    assert carry, "parity is vacuous if no near-dup pairs exist at sf0.001"

    # unrecognized modes fail loudly — a silent carry fallback would run
    # the wide-array verification on exactly the job that switched it off
    import pytest as _pytest

    spark.conf.set("spark.graft.dedupVerify", "re-join")
    try:
        with _pytest.raises(ValueError, match="carry.*rejoin"):
            ext_dedup_near(spark, sf)
    finally:
        spark.conf.unset("spark.graft.dedupVerify")
