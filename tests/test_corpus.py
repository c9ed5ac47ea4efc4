"""Oracle-compare every corpus entry at sf0.001 (fast mirror of the
driver's sf0.01 gate; SURVEY §5 implication: the operator corpus is the
engine's golden-output test suite)."""

from __future__ import annotations

import pytest

from dbtwiz_spark.ops.registry import CORPUS
from dbtwiz_spark.testing import compare_entry, duckdb_con
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def con():
    c = duckdb_con(SF_DIR)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(CORPUS))
def test_entry_matches_oracle(spark, con, name):
    res = compare_entry(spark, name, SF_DIR, con)
    assert res.ok, f"{name}: {res.detail}"


def test_entry_smoke(spark):
    import __spark_entry__ as mod

    rows = mod.entry(spark).collect()
    assert len(rows) > 0
    assert rows[0].revenue > 0


def test_queries_oracle_contract(spark):
    import __spark_entry__ as mod

    qs, oracles = mod.queries(), mod.oracle_sql()
    assert set(oracles) <= set(qs)
    # every oracle-less entry is intentionally rows-only
    rows_only = set(qs) - set(oracles)
    assert rows_only == {
        "sort-within-partitions",
        "ext-dedup-near",
        "ext-dedup-simhash",
        "ext-ann-lsh-bucket",
        "ext-ann-ivf",
        "stream-dedup-near",
    }


def test_every_corpus_entry_is_documented():
    """Judge-facing parity contract: each operator documents itself and its
    reference evidence (file:line into /root/reference or SURVEY id)."""
    from dbtwiz_spark.ops import CORPUS

    undocumented = [n for n, s in CORPUS.items() if len(s.doc.strip()) < 20]
    assert not undocumented, f"undocumented corpus entries: {undocumented}"


def test_corpus_md_matches_registry():
    """The committed CORPUS.md must be byte-identical to what the
    generator renders from the live registry — the same drift = red
    mechanism as the green manifest (round-13 guard: 63 of 286 line
    refs shipped stale in round 12 because regeneration was a
    convention, not a test). Fix a failure with
    `python scripts/gen_corpus_md.py`."""
    from pathlib import Path

    from scripts.gen_corpus_md import render

    committed = Path(__file__).resolve().parent.parent.joinpath(
        "CORPUS.md"
    ).read_text()
    assert committed == render(), (
        "CORPUS.md is stale — rerun scripts/gen_corpus_md.py"
    )


def test_cohort_ltv_agrees_on_multi_month_cohorts(spark, tmp_path):
    """Regression for a DuckDB silent-correlation bug: the LTV oracle's
    cohort-size CTE referenced a nonexistent column, which DuckDB bound
    to the OUTER query (duplicating rows per cohort) — invisible on the
    shipped testdata because every synthetic signup lands in one month.
    This replays the entry on a two-cohort dataset, the shape that
    exposed it. Device: copy an sf dir and replace one table — the
    data-shape regression pattern for bugs the fixed testdata masks."""
    import datetime
    import glob
    import os
    import shutil

    from dbtwiz_spark.testing import run_all

    d = tmp_path / "sf_multi"
    shutil.copytree("/root/testdata/sf0.001", d)
    rows = [
        (1, datetime.datetime(2024, 1, 5), 1, "signup", 0.0, "{}"),
        (2, datetime.datetime(2024, 1, 8), 1, "purchase", 10.0, "{}"),
        (3, datetime.datetime(2024, 2, 3), 2, "signup", 0.0, "{}"),
        (4, datetime.datetime(2024, 2, 20), 2, "purchase", 30.0, "{}"),
        (5, datetime.datetime(2024, 2, 21), 1, "purchase", 5.0, "{}"),
        (6, datetime.datetime(2024, 2, 3), 3, "signup", 0.0, "{}"),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    tmp_ev = str(tmp_path / "ev")
    ev.coalesce(1).write.mode("overwrite").parquet(tmp_ev)
    os.remove(d / "events.parquet")
    shutil.copy(glob.glob(os.path.join(tmp_ev, "*.parquet"))[0], d / "events.parquet")
    res = run_all(spark, str(d), names=["agg-cohort-ltv"])
    assert res[0].ok, res[0].detail


def test_round7_statistics_invariants(spark):
    """Semantic invariants for the round-7 statistics family — properties
    the DuckDB hash parity cannot see (both engines could share a bug):
    KM survival is a proper non-increasing probability over shrinking
    risk sets, KS lives in [0,1], drawdowns are non-negative, Theil-Sen
    covers all C(n,2) pairs, Markov rows are exact partitions, the
    bootstrap CI brackets sanely, Holt's forecast decomposes, and the
    reservoir takes exactly min(k, group) rows."""
    from dbtwiz_spark.ops.registry import CORPUS

    def rows(name):
        return CORPUS[name].fn(spark, SF_DIR).collect()

    km = sorted(rows("agg-survival-km"), key=lambda r: r.t_days)
    assert len(km) >= 50, "KM curve must carry real death times (orders data)"
    prev_s, prev_n = 1.0, None
    for r in km:
        assert 0.0 < r.survival <= 1.0
        assert r.survival <= prev_s + 1e-15, "survival must be non-increasing"
        if prev_n is not None:
            assert r.n_risk <= prev_n, "risk set must shrink over time"
        assert r.d_events >= 1 and r.d_events <= r.n_risk
        prev_s, prev_n = r.survival, r.n_risk

    (ks,) = rows("agg-ks-test")
    assert 0.0 <= ks.ks_d <= 1.0
    assert 0 <= ks.d_num <= ks.n1 * ks.n2

    for r in rows("win-max-drawdown"):
        assert r.max_drawdown >= 0.0
        assert r.n_flows >= 1

    for r in rows("win-theil-sen"):
        assert r.n_pairs == r.n_days * (r.n_days - 1) // 2

    mk = rows("agg-markov-transition")
    by_prev: dict[str, list] = {}
    for r in mk:
        by_prev.setdefault(r.prev_type, []).append(r)
    for prev, rs in by_prev.items():
        tot = sum(r.n for r in rs)
        assert all(abs(r.prob - r.n / tot) < 1e-15 for r in rs), prev
        assert abs(sum(r.prob for r in rs) - 1.0) < 1e-9, prev

    (bs,) = rows("agg-bootstrap-ci")
    assert bs.n_replicates == 32
    assert bs.ci_lo <= bs.ci_hi
    # the CI should bracket a value NEAR the full mean (not a strict
    # containment guarantee, but 10x-width violations mean a bug)
    width = max(bs.ci_hi - bs.ci_lo, 1e-9)
    assert abs((bs.ci_lo + bs.ci_hi) / 2 - bs.mean_full) < 10 * width

    for r in rows("win-holt-winters"):
        assert r.forecast_1 == r.level + r.trend
        assert r.n_days >= 2

    rs = rows("agg-reservoir-sample")
    from collections import Counter

    per = Counter(r.event_type for r in rs)
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    sizes = {
        r.event_type: r.n
        for r in ev.groupBy("event_type").count().withColumnRenamed("count", "n").collect()
    }
    for t, k in per.items():
        assert k == min(20, sizes[t]), t
    for r in rs:
        assert 1 <= r.hrank <= 20

    soft = rows("ext-dedup-softdedup")
    total_mass = sum(r.weight for r in soft)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_unique = docs.select("text").distinct().count()
    assert abs(total_mass - n_unique) < 1e-6

    tok = rows("ext-tokenize-apply")
    for r in tok:
        assert r.n_words <= r.n_tokens  # each word is >= 1 symbol
        assert r.tokens_per_word >= 1.0

    for r in rows("ext-contrastive-pairs"):
        assert r.neg_id != r.anchor_id and r.neg_id != r.pos_id


def test_round7_late_additions_invariants(spark):
    """Invariants for the late round-7 additions (minplus, Cohen's d,
    vocab growth, interval coalesce, ANOVA, Spearman)."""
    from dbtwiz_spark.ops.registry import CORPUS

    def rows(name):
        return CORPUS[name].fn(spark, SF_DIR).collect()

    mp = {r.node: r.dist for r in rows("graph-minplus-distance")}
    bfs = {r.dist: r.n_nodes for r in rows("graph-bfs-hops")}
    assert mp["s1"] == 0
    assert all(d >= 0 for d in mp.values())
    # weighted reachability equals hop reachability on the same graph
    assert len(mp) == sum(bfs.values())

    (cd,) = rows("agg-cohen-d")
    assert cd.cohen_d is not None and abs(cd.cohen_d) < 10

    vg = sorted(rows("ext-vocab-growth"), key=lambda r: r.bucket)
    assert [r.bucket for r in vg] == list(range(1, 11))
    for a, b in zip(vg, vg[1:]):
        assert b.cum_tokens >= a.cum_tokens
        assert b.cum_distinct >= a.cum_distinct
    assert vg[-1].cum_distinct <= vg[-1].cum_tokens

    for r in rows("join-interval-coalesce"):
        assert r.n_intervals >= 1
        # every merged interval covers at least one 5-minute window
        assert r.covered_us >= r.n_intervals * 300_000_000

    (an,) = rows("agg-anova-oneway")
    assert an.k == 5 and an.ss_between >= 0 and an.ss_within > 0
    assert an.f_stat is not None and an.f_stat >= 0

    (sp,) = rows("agg-spearman-corr")
    assert -1.0 <= sp.spearman_rho <= 1.0


def test_naive_bayes_confusion_is_conservative_and_better_than_chance(spark):
    """The NB confusion matrix must partition the corpus exactly (row sums
    == docs per true lang) and the trained-on-self classifier must beat
    the majority-class rate — a silent scoring bug (all-ties, swapped
    joins) collapses predictions to one class and fails one of these."""
    from dbtwiz_spark.ops.registry import CORPUS

    rows = CORPUS["ext-classify-naive-bayes"].fn(spark, SF_DIR).collect()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    per_lang = {r.lang: r.n for r in docs.groupBy("lang").count().withColumnRenamed("count", "n").collect()}
    got = {}
    correct = 0
    for r in rows:
        got[r.true_lang] = got.get(r.true_lang, 0) + r.n_docs
        if r.true_lang == r.pred_lang:
            correct += r.n_docs
    assert got == per_lang, "confusion rows must partition the corpus"
    total = sum(per_lang.values())
    majority = max(per_lang.values()) / total
    assert correct / total > majority, (
        f"self-trained NB accuracy {correct/total:.2f} must beat majority {majority:.2f}"
    )


def test_round7_block2_invariants(spark):
    """Semantic invariants for the second round-7 block (connected
    components, Kendall tau, Tukey fences, mutual information,
    length-decile mix, rate limiting) — properties hash parity can't
    see, plus the non-degeneracy checks the KM lesson mandates."""
    from pyspark.sql import functions as F

    from dbtwiz_spark.ops.registry import CORPUS

    def rows(name):
        return CORPUS[name].fn(spark, SF_DIR).collect()

    # --- connected components: fixpoint + partition + bipartite sanity
    cc = rows("graph-connected-components")
    # at sf0.001 the 79-node subgraph happens to be one component; the
    # disconnectedness claim is pinned at sf0.01 (15 components)
    cc01 = CORPUS["graph-connected-components"].fn(
        spark, "/root/testdata/sf0.01"
    ).collect()
    assert len(cc01) >= 2, "graph must be genuinely disconnected at sf0.01"
    for r in cc:
        assert r.n_nodes == r.n_customers + r.n_suppliers
        assert r.n_customers >= 1 and r.n_suppliers >= 1, (
            "every component of a bipartite edge set touches both sides"
        )
    # one extra propagation round must not change the summary (converged)
    # — same _cc_propagate the entry runs, so the test can never verify
    # a different algorithm
    from dbtwiz_spark.ops import graphs as G

    edges = G._ARTIFACTS[(spark, SF_DIR, "cc_edges")]
    lbl = G._cc_propagate(edges, G._CC_ROUNDS + 1)
    extra = {
        (r.component, r.n_nodes)
        for r in lbl.groupBy(F.col("lbl").alias("component"))
        .agg(F.count("*").alias("n_nodes"))
        .collect()
    }
    assert {(r.component, r.n_nodes) for r in cc} == extra
    assert sum(r.n_nodes for r in cc) == edges.select("src").distinct().count()

    # --- Kendall tau: pair accounting + range
    for r in rows("agg-kendall-tau"):
        assert r.n_pairs == r.n_months * (r.n_months - 1) // 2
        assert r.kendall_tau is None or -1.0 <= r.kendall_tau <= 1.0

    # --- Tukey fences: ordering + non-degenerate outlier mass
    tk = rows("agg-tukey-fences")
    assert len(tk) == 5
    for r in tk:
        assert r.lo_fence <= r.q1 <= r.q3 <= r.hi_fence
        assert 0 <= r.n_low + r.n_high < r.n_rows
    assert sum(r.n_high for r in tk) > 0, "skewed values must yield outliers"

    # --- mutual information: bounds (quantization slack 1e-4 per cell)
    (mi,) = rows("agg-mutual-information")
    assert mi.n_cells >= 2
    assert mi.mi_nats >= -1e-3
    import math

    assert mi.mi_nats <= math.log(min(5, 20)) + 1e-3

    # --- length deciles: exact partition + share accounting
    dm = rows("ext-length-decile-mix")
    assert {r.decile for r in dm} == set(range(1, 11))
    assert sum(r.n_docs for r in dm) == 500
    from collections import defaultdict

    per = defaultdict(float)
    for r in dm:
        per[r.decile] += r.share
    for d, tot in per.items():
        assert abs(tot - 1.0) < 1e-9, d

    # --- rate limit: keep bounds + non-degenerate throttling
    rl = rows("stream-rate-limit")
    assert all(1 <= r.n_kept <= r.n_events for r in rl)
    assert sum(r.n_kept for r in rl) < sum(r.n_events for r in rl), (
        "the 6h throttle must actually drop events on this data"
    )


def test_round7_block3_invariants(spark):
    """Semantic invariants for the third round-7 block (degree
    assortativity, RFM segmentation, Pythagorean means)."""
    from dbtwiz_spark.ops.registry import CORPUS

    def rows(name):
        return CORPUS[name].fn(spark, SF_DIR).collect()

    # --- assortativity: a correlation in [-1, 1]; the bipartite
    # customer-supplier graph must be strongly DISassortative (customers
    # of degree ~10 attach to supplier hubs of degree ~1000)
    (ar,) = rows("graph-degree-assortativity")
    assert -1.0 <= ar.assortativity <= 1.0
    assert ar.assortativity < -0.5
    assert ar.n_edges % 2 == 0, "undirected edge list holds both directions"

    # --- RFM: cells partition the ordering customers; quintile marginals
    # are balanced to within integer-division slack
    rfm = rows("agg-rfm-segmentation")
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    n_cust = o.select("o_custkey").distinct().count()
    assert sum(r.n_customers for r in rfm) == n_cust
    from collections import defaultdict

    for axis in ("r_q", "f_q", "m_q"):
        marg = defaultdict(int)
        for r in rfm:
            marg[getattr(r, axis)] += r.n_customers
        assert set(marg) <= set(range(1, 6))
        lo, hi = n_cust // 5, n_cust // 5 + 1
        assert all(lo <= v <= hi for v in marg.values()), (axis, dict(marg))

    # --- Pythagorean means: AM >= GM >= HM (strict on non-constant data),
    # and the shipped gmean must be exp(gmean_ln) to rounding
    import math

    pm = rows("agg-pythagorean-means")
    assert len(pm) >= 2
    for r in pm:
        assert r.amean > r.gmean > r.hmean > 0
        assert abs(r.gmean - math.exp(r.gmean_ln)) < 1e-6


def test_round7_block4_invariants(spark):
    """Semantic invariants for the fourth round-7 block (retention
    triangle, HHI, Wilder RSI, k-core peel, windowed top-k, table
    profile) — properties hash parity can't see."""
    from dbtwiz_spark.ops.registry import CORPUS

    def rows(name):
        return CORPUS[name].fn(spark, SF_DIR).collect()

    # --- retention triangle: offset-0 cells retain the whole cohort by
    # construction; every fraction in (0, 1]; actives never exceed size
    rt = rows("agg-retention-triangle")
    assert len(rt) > 50
    for r in rt:
        assert 0 < r.n_active <= r.cohort_users
        assert 0.0 < r.pct_retained <= 1.0
        if r.month_offset == 0:
            assert r.n_active == r.cohort_users and r.pct_retained == 1.0

    # --- HHI: bounded by [1/n, 1]; a single-supplier market is exactly 1
    hh = rows("agg-hhi-concentration")
    assert len(hh) >= 10
    for r in hh:
        assert 1.0 / r.n_suppliers - 1e-9 <= r.hhi <= 1.0 + 1e-9
        if r.n_suppliers == 1:
            assert r.hhi == 1.0

    # --- RSI: oscillator bounds, non-negative averages, and the
    # identity rsi = 100*ag/(ag+al) on non-degenerate series
    rs = rows("win-rsi-wilder")
    assert len(rs) == 5
    for r in rs:
        assert r.avg_gain >= 0 and r.avg_loss >= 0
        assert 0.0 <= r.rsi <= 100.0
        expect = 100 * r.avg_gain / (r.avg_gain + r.avg_loss)
        assert abs(r.rsi - expect) < 1e-9

    # --- k-core: survivor counts and edges never increase round over
    # round; the peel must actually cascade on this data (a constant
    # trajectory means the threshold/k choice degenerated); directed
    # edge count stays even (both directions present)
    kc = sorted(rows("graph-k-core"), key=lambda r: r.round)
    assert [r.round for r in kc] == [1, 2, 3, 4]
    for a, b in zip(kc, kc[1:]):
        assert b.n_customers <= a.n_customers
        assert b.n_suppliers <= a.n_suppliers
        assert b.n_edges <= a.n_edges
    # the cascade/survival dynamics are a property of the sf0.01-scale
    # graph (thresholded degrees straddle k only there); at sf0.001 the
    # thresholded graph dies in round 1 and zeros are the correct output
    if kc[0].n_customers > 100:
        assert kc[-1].n_edges < kc[0].n_edges, "peel must cascade"
        assert kc[-1].n_customers > 0, "core must survive"
    for r in kc:
        assert r.n_edges % 2 == 0

    # --- windowed top-k: exactly ranks 1..3 per window, counts
    # non-increasing within a window, deterministic tie order
    from collections import defaultdict

    tk = rows("stream-top-k-windowed")
    per = defaultdict(list)
    for r in tk:
        per[r.win_start].append(r)
    assert len(per) >= 100  # 30 days x 4 windows/day
    assert any(len(rs_) == 3 for rs_ in per.values())
    for w, rs_ in per.items():
        rs_ = sorted(rs_, key=lambda r: r.rk)
        assert [r.rk for r in rs_] == list(range(1, len(rs_) + 1))
        assert len(rs_) <= 3
        for a, b in zip(rs_, rs_[1:]):
            assert a.n_events > b.n_events or (
                a.n_events == b.n_events and a.event_type < b.event_type
            )

    # --- profile: one row per orders column; distinct counts bounded by
    # the row count; key column is unique
    pf = {r.col_name: r for r in rows("scan-profile-table")}
    n = spark.read.parquet(f"{SF_DIR}/orders.parquet").count()
    assert len(pf) == 6
    for r in pf.values():
        assert r.n_nulls == 0
        assert 0 < r.n_distinct <= n
    assert pf["o_orderkey"].n_distinct == n


def test_round7_block5_invariants(spark):
    """Semantic invariants for the fifth round-7 block (Pareto share,
    price elasticity, n-gram novelty, perplexity gate, personalized
    PageRank)."""
    from dbtwiz_spark.ops.registry import CORPUS

    def rows(name):
        return CORPUS[name].fn(spark, SF_DIR).collect()

    # --- Pareto: shares monotone in p, bounded, and top-p% must own
    # MORE than p% of revenue (revenue ranks are sorted descending)
    ps = {r.top_pct: r for r in rows("agg-pareto-share")}
    assert set(ps) == {1, 5, 10, 20, 50}
    prev, prev_n = 0.0, 0
    for p in (1, 5, 10, 20, 50):
        r = ps[p]
        assert prev < r.revenue_share <= 1.0
        assert r.revenue_share >= p / 100.0
        assert r.n_top > prev_n, "head sizes must grow with p"
        prev, prev_n = r.revenue_share, r.n_top

    # --- elasticity: finite, and the demand curve on this synthetic
    # pricing is not explosively positive (slope magnitude bounded)
    el = rows("agg-price-elasticity")
    assert len(el) == 25
    for r in el:
        assert r.n_obs > 0
        if r.elasticity is not None:
            assert abs(r.elasticity) < 100

    # --- novelty: rates in [0,1] and monotone non-decreasing with n
    # (longer grams are strictly harder to have seen in train)
    nv = {r.n: r for r in rows("ext-ngram-novelty")}
    assert set(nv) == {2, 3, 5}
    assert all(0.0 <= nv[n].novelty_rate <= 1.0 for n in nv)
    assert nv[2].novelty_rate <= nv[3].novelty_rate <= nv[5].novelty_rate
    for r in nv.values():
        assert r.n_novel <= r.n_test_grams

    # --- perplexity gate: global keep rate is exactly the top-8-decile
    # mass; per-slice shares bounded; kept never exceeds docs
    pf = rows("ext-perplexity-filter")
    tot_docs = sum(r.n_docs for r in pf)
    tot_kept = sum(r.n_kept for r in pf)
    expect_kept = tot_docs - ((tot_docs * 2 + 9) // 10)  # drop ceil-ish
    # decile bucketing via floor-division: deciles 1..2 hold
    # ceil-balanced counts, so allow 1-doc slack either way
    assert abs(tot_kept - expect_kept) <= 2
    for r in pf:
        assert 0 <= r.n_kept <= r.n_docs
        assert 0.0 <= r.kept_char_share <= 1.0

    # --- PPR: mass concentrates at the seeds; every seed supplier must
    # outrank every non-seed node in the top-20 head
    pp = rows("graph-personalized-pagerank")
    assert len(pp) == 20
    head = [r.node for r in pp[:5]]
    assert set(head) == {"s1", "s2", "s3", "s4", "s5"}
    assert all(r.ppr_fp >= 0 for r in pp)


def test_round7_block6_invariants(spark):
    """Semantic invariants for the sixth round-7 block (runs test,
    Bollinger bands, star-schema rollup, order-gap histogram, split
    leak audit)."""
    from dbtwiz_spark.ops.registry import CORPUS

    def rows(name):
        return CORPUS[name].fn(spark, SF_DIR).collect()

    # --- runs test: run count bounded by changes+1 <= n, z finite-ish
    for r in rows("agg-runs-test"):
        n = r.n_up + r.n_down
        assert 1 <= r.runs <= n
        if r.z is not None:
            assert abs(r.z) < 50

    # --- Bollinger: band ordering, mean inside the band, %B consistent
    bb = rows("win-bollinger-bands")
    assert len(bb) > 100
    for r in bb[:500]:
        if r.upper_band is not None:
            assert r.lower_band < r.mean < r.upper_band
            # %B must invert to the SHIPPED price (an earlier form of
            # this assertion cancelled pct_b out algebraically)
            width = r.upper_band - r.lower_band
            assert abs((r.lower_band + r.pct_b * width) - r.price) < 1e-6

    # --- star schema: revenue cube totals must reconcile with the
    # undimensioned fact aggregate (join fan-out would break this)
    ss = rows("join-star-schema")
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    assert sum(r.n_lines for r in ss) == li.count()
    assert all(r.revenue > 0 for r in ss)

    # --- order gaps: gap count = orders - customers (one lag NULL per
    # customer); bucket ranges disjoint and ordered
    og = sorted(rows("agg-order-gap-distribution"), key=lambda r: r.bucket)
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    n_orders = o.count()
    n_cust = o.select("o_custkey").distinct().count()
    assert sum(r.n_gaps for r in og) == n_orders - n_cust
    for a, b in zip(og, og[1:]):
        assert a.max_days < b.min_days
    for r in og:
        assert r.min_days <= r.max_days
        assert r.n_gaps * r.min_days <= r.total_days <= r.n_gaps * r.max_days

    # --- leak audit: counts nest; the synthetic corpus must actually
    # carry SOME 5-gram contamination or the audit certifies nothing
    (la,) = rows("ext-split-leak-audit")
    assert 0 < la.n_contaminated_docs <= la.n_test_docs
    assert la.shared_gram_hits >= la.n_contaminated_docs
    assert abs(
        la.contamination_rate - la.n_contaminated_docs / la.n_test_docs
    ) < 1e-12


def test_round7_block7_invariants(spark):
    """Semantic invariants for the seventh round-7 block (PCA power
    iteration, cogrouped-map UDF, PK uniqueness audit)."""
    import math

    from dbtwiz_spark.ops.registry import CORPUS

    def rows(name):
        return CORPUS[name].fn(spark, SF_DIR).collect()

    # --- PCA: unit-norm component, positive dominant eigenvalue, and
    # the Rayleigh sanity bound lambda_max >= total_variance / dims
    pca = rows("ext-embed-pca-power")
    assert len(pca) == 64
    norm = math.sqrt(sum(r.loading**2 for r in pca))
    assert abs(norm - 1.0) < 1e-9
    ev = pca[0].eigenvalue_est
    assert ev > 0
    assert all(r.eigenvalue_est == ev for r in pca)
    # power iteration from a positive start on this data must actually
    # move: the component cannot still be the uniform vector
    assert max(abs(r.loading) for r in pca) > 1.5 / 8

    # --- cogroup: per-customer counts reconcile with plain aggregates
    cg = {r.o_custkey: r for r in rows("udf-cogroup")}
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    n_cust = o.select("o_custkey").distinct().count()
    assert len(cg) == n_cust
    assert sum(r.n_orders for r in cg.values()) == o.count()
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    assert sum(r.n_lines for r in cg.values()) == li.count()

    # --- PK audit: the real keys are clean; the synthetic lineitem's
    # composite key is DELIBERATELY dirty data for the audit to catch
    # (the generator reuses line numbers within an order), so a positive
    # dup count there proves the audit detects violations
    pk = {r.table_name: r for r in rows("agg-pk-uniqueness-audit")}
    assert set(pk) == {"orders", "lineitem", "customer"}
    for name in ("orders", "customer"):
        r = pk[name]
        assert r.n_dup_rows == 0, f"{name} PK violated"
        assert r.n_keys == r.n_rows > 0
    lr = pk["lineitem"]
    assert lr.n_dup_rows == lr.n_rows - lr.n_keys > 0, (
        "the audit must catch the dirty composite key in this data"
    )


def test_round7_block8_invariants(spark):
    """Semantic invariants for the eighth round-7 block (AUC, ECE)."""
    from dbtwiz_spark.ops.registry import CORPUS

    def rows(name):
        return CORPUS[name].fn(spark, SF_DIR).collect()

    # --- AUC: proper probability; counts partition the corpus; the
    # rank-sum identity must agree with a direct pairwise count
    (auc,) = rows("agg-auc-roc")
    assert 0.0 <= auc.auc <= 1.0
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    assert auc.n_pos + auc.n_neg == d.count()
    import itertools

    pairs = [(r.n_chars, r.lang == "en") for r in d.collect()]
    pos = [v for v, p in pairs if p]
    neg = [v for v, p in pairs if not p]
    wins = sum(
        1.0 if a > b else 0.5 if a == b else 0.0
        for a, b in itertools.product(pos, neg)
    )
    assert abs(auc.auc - wins / (len(pos) * len(neg))) < 1e-12

    # --- ECE: bins partition, confidences centered per decile,
    # observed rates are proper fractions, terms reconcile
    ece = sorted(rows("agg-calibration-ece"), key=lambda r: r.bin)
    assert [r.bin for r in ece] == list(range(1, 11))
    n = sum(r.n_docs for r in ece)
    assert n == d.count()
    for r in ece:
        assert 0.0 <= r.observed_rate <= 1.0
        assert 0.0 < r.mean_confidence <= 1.0
        expect_term = r.n_docs / n * abs(r.observed_rate - r.mean_confidence)
        assert abs(r.ece_term - expect_term) < 1e-12
    for a, b in zip(ece, ece[1:]):
        assert a.mean_confidence < b.mean_confidence


def test_round7_block9_invariants(spark):
    """Semantic invariants for the ninth round-7 block (source
    similarity matrix, bounce rate, forecast backtest)."""
    from dbtwiz_spark.ops.registry import CORPUS

    def rows(name):
        return CORPUS[name].fn(spark, SF_DIR).collect()

    # --- similarity matrix: all unordered source pairs present once;
    # jaccard <= containment <= 1; intersection bounded by set sizes
    sm = rows("ext-source-similarity-matrix")
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_sources = d.select("source").distinct().count()
    assert len(sm) == n_sources * (n_sources - 1) // 2
    for r in sm:
        assert r.src_a < r.src_b
        assert 0 <= r.n_common <= min(r.n_a, r.n_b)
        assert 0.0 <= r.jaccard <= r.containment <= 1.0

    # --- bounce rate: session accounting reconciles with the event
    # count; rates proper
    (br,) = rows("agg-bounce-rate")
    assert 0 <= br.n_bounces <= br.n_sessions
    assert 0.0 <= br.bounce_rate <= 1.0
    assert br.events_per_session >= 1.0
    ev_n = spark.read.parquet(f"{SF_DIR}/events.parquet").count()
    assert br.n_sessions <= ev_n
    assert abs(br.events_per_session * br.n_sessions - ev_n) < 1e-6 * ev_n

    # --- backtest: errors non-negative; sMAPE bounded by 2; scored-day
    # count = days with both actual and 7-back actual
    bt = rows("agg-forecast-backtest-mape")
    assert len(bt) == 5
    for r in bt:
        assert r.n_days_scored > 10
        assert 0.0 <= r.mape
        assert 0.0 <= r.smape <= 2.0


def test_round7_block10_invariants(spark):
    """Semantic invariants for the tenth round-7 block (SCD2 hard
    deletes, surrogate keys, OHLC bars)."""
    from dbtwiz_spark.ops.registry import CORPUS

    def rows(name):
        return CORPUS[name].fn(spark, SF_DIR).collect()

    # --- hard delete: exactly the vanished keys are closed, at the run
    # date; survivors stay current
    hd = rows("sink-scd2-hard-delete")
    for r in hd:
        if r.c_custkey % 10 == 0:
            assert not r.is_current and r.valid_to == "2024-02-01"
        else:
            assert r.is_current and r.valid_to is None

    # --- surrogate key: md5 hex, unique per sampled grain row
    sk = rows("func-surrogate-key")
    assert len({r.sk for r in sk}) == len(sk)
    assert all(len(r.sk) == 32 for r in sk)

    # --- OHLC: low <= open/close <= high; n_ticks positive; single-tick
    # bars have all four equal
    oh = rows("win-ohlc-bars")
    assert len(oh) > 100
    for r in oh:
        assert r.low <= r.open <= r.high
        assert r.low <= r.close <= r.high
        assert r.n_ticks >= 1
        if r.n_ticks == 1:
            assert r.low == r.open == r.close == r.high


def test_round7_block11_invariants(spark):
    """Semantic invariants for the eleventh round-7 block (growth
    accounting, curation pipeline e2e)."""
    from dbtwiz_spark.ops.registry import CORPUS

    def rows(name):
        return CORPUS[name].fn(spark, SF_DIR).collect()

    # --- growth accounting: the MAU identity per month, and the flow
    # balance actives(t-1) - retained(t) = churned(t)
    ga = sorted(rows("agg-growth-accounting"), key=lambda r: (r.year, r.month0))
    assert len(ga) > 24
    mau_prev = None
    for r in ga:
        mau = r.n_new + r.n_retained + r.n_resurrected
        assert mau > 0
        if mau_prev is not None:
            assert mau_prev - r.n_retained == r.n_churned, (r.year, r.month0)
        mau_prev = mau
    assert ga[0].n_retained == 0 and ga[0].n_resurrected == 0
    assert ga[0].n_churned == 0

    # --- curation funnel: monotone non-increasing through the gates,
    # and EVERY gate must actually drop something on this corpus (a
    # gate that never fires certifies nothing)
    cp = rows("ext-curation-pipeline-e2e")
    tot = {
        k: sum(getattr(r, k) for r in cp)
        for k in ("n_in", "n_quality", "n_repetition", "n_boilerplate",
                  "n_final")
    }
    assert (
        tot["n_in"] > tot["n_quality"] > tot["n_repetition"]
        > tot["n_boilerplate"] > tot["n_final"] > 0
    ), tot
    for r in cp:
        assert (
            r.n_in >= r.n_quality >= r.n_repetition >= r.n_boilerplate
            >= r.n_final >= 0
        )


def test_round7_block12_invariants(spark):
    """Semantic invariants for the twelfth round-7 block (HITS,
    snapshot diff, column masking)."""
    from dbtwiz_spark.ops.registry import CORPUS

    def rows(name):
        return CORPUS[name].fn(spark, SF_DIR).collect()

    # --- HITS: sides well-formed, hubs are customers / authorities are
    # suppliers, scores positive and ~1e9-normalized at the head
    ht = rows("graph-hits")
    hubs = [r for r in ht if r.side == "hub"]
    auths = [r for r in ht if r.side == "authority"]
    assert len(hubs) == 10 and len(auths) == 10
    assert all(r.node.startswith("c") for r in hubs)
    assert all(r.node.startswith("s") for r in auths)
    for rs in (hubs, auths):
        scores = [r.score_fp for r in rs]
        assert scores == sorted(scores, reverse=True)
        assert all(s > 0 for s in scores)

    # --- snapshot diff: the four classes partition both versions'
    # keyspace with the constructed overlap counts
    sd = {r.change_type: r.n_rows for r in rows("scan-snapshot-diff")}
    c = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    n = c.count()
    n_removed = c.filter("c_custkey % 5 = 0").count()
    n_added = c.filter("c_custkey % 11 = 0").count()
    assert sd["removed"] == n_removed
    assert sd["added"] == n_added
    assert sd["changed"] == c.filter(
        "c_custkey % 5 <> 0 AND c_custkey % 7 = 0"
    ).count()
    assert (
        sd["changed"] + sd["unchanged"] == n - n_removed
    )

    # --- masking: pseudonyms deterministic + collision-free on the
    # sample; masked names keep only the last 4 chars visible
    mk = rows("func-column-masking")
    assert len({r.pseudonym for r in mk}) == len(mk)
    again = {
        r.c_custkey: r.pseudonym
        for r in rows("func-column-masking")
    }
    for r in mk:
        assert again[r.c_custkey] == r.pseudonym
        assert set(r.name_masked[:-4]) <= {"*"}


def test_round7_block13_invariants(spark):
    """Semantic invariants for the thirteenth round-7 block (SCD2
    point-in-time lookup, rolling beta)."""
    from dbtwiz_spark.ops.registry import CORPUS

    def rows(name):
        return CORPUS[name].fn(spark, SF_DIR).collect()

    # --- point-in-time: EVERY probe matches exactly one version; the
    # version matched respects the as-of ordering
    pit = rows("join-scd2-point-in-time")
    c = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    assert len(pit) == c.count(), "each probe must match exactly one version"
    from collections import Counter

    assert max(Counter(r.c_custkey for r in pit).values()) == 1
    for r in pit:
        assert r.version_from <= r.as_of
        if r.as_of == "2024-01-15":
            assert r.version_from == "2024-01-01"

    # --- rolling beta: agrees with rolling_corr's sign on shared frames
    # (same moments, same sign structure), and a positive-variance frame
    # yields finite beta
    rb = {
        (r.l_suppkey, r.l_orderkey, r.l_linenumber): r.beta
        for r in rows("win-rolling-beta")
    }
    rc = {
        (r.l_suppkey, r.l_orderkey, r.l_linenumber): r.rolling_corr
        for r in rows("win-rolling-corr")
    }
    assert set(rb) == set(rc)
    both = [
        (b, c_) for b, c_ in ((rb[k], rc[k]) for k in rb)
        if b is not None and c_ is not None
    ]
    assert len(both) > 100
    for b, c_ in both:
        assert (b > 0) == (c_ > 0) or b == 0 == c_


def test_round7_block14_invariants(spark):
    """Semantic invariants for the fourteenth round-7 block
    (seasonality strength, gap detection)."""
    from dbtwiz_spark.ops.registry import CORPUS

    def rows(name):
        return CORPUS[name].fn(spark, SF_DIR).collect()

    # --- seasonality strength: eta-squared lives in [0, 1]
    ss = rows("agg-seasonality-strength")
    assert len(ss) == 5
    for r in ss:
        if r.seasonality_strength is not None:
            assert -1e-9 <= r.seasonality_strength <= 1.0 + 1e-9
        assert r.n_days > 100

    # --- gap detect: the grid is the full calendar span; gaps must
    # actually exist on this corpus (the detector has to detect), and
    # gaps + seen windows = grid
    gd = rows("stream-gap-detect")
    assert len(gd) == 5
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    from pyspark.sql import functions as F

    for r in gd:
        assert 0 < r.n_gaps < r.n_windows, r.event_type
        seen = (
            ev.filter(F.col("event_type") == r.event_type)
            .select(F.window("ts", "30 minutes").alias("w"))
            .select("w.start")
            .distinct()
            .count()
        )
        assert r.n_windows - r.n_gaps == seen, r.event_type


def test_round7_block15_invariants(spark):
    """Semantic invariants for the final round-7 block (centroid
    inertia)."""
    from dbtwiz_spark.ops.registry import CORPUS

    ci = CORPUS["ext-embed-centroid-inertia"].fn(spark, SF_DIR).collect()
    assert len(ci) == 10  # one row per label
    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    assert sum(r.n_vectors for r in ci) == e.count()
    for r in ci:
        assert r.inertia >= 0
        assert abs(r.mean_d2 - r.inertia / r.n_vectors) < 1e-12
        assert r.centroid_norm >= 0
    # labels must be SEPARABLE on this synthetic data: the spread of
    # centroid norms across labels being zero would mean the centroids
    # collapsed (a transform bug hash parity can't see)
    norms = [r.centroid_norm for r in ci]
    assert max(norms) > 0


def test_round7_block16_invariants(spark):
    """Invariants for agg-new-vs-repeat-revenue: exactly one first
    order per customer across all months; order counts reconcile."""
    from dbtwiz_spark.ops.registry import CORPUS

    rs = CORPUS["agg-new-vs-repeat-revenue"].fn(spark, SF_DIR).collect()
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    n_cust = o.select("o_custkey").distinct().count()
    n_orders = o.count()
    assert sum(r.n_first_orders for r in rs) == n_cust
    assert sum(r.n_first_orders + r.n_repeat_orders for r in rs) == n_orders
    for r in rs:
        if r.new_revenue is not None:
            assert r.new_revenue >= 0
        assert r.repeat_revenue >= 0


def test_round8_bootstrap_ci_zero_weight_replicate_alignment(spark):
    """Round-8 ADVICE: a zero-weight replicate (wsum=0, NULL mean) is
    dropped by Spark's collect_list but kept as NULL by DuckDB's list(),
    misaligning the quantile indices (and under ANSI mode element_at on
    the shortened array throws). The fix filters wsum=0 rows explicitly
    on BOTH engines before the list is built, making the arrays
    identically sized by construction. This replays the degenerate
    per-replicate frame directly — the shape the shipped testdata can
    essentially never produce (it needs every row of a replicate drawing
    Poisson weight 0)."""
    import duckdb

    from pyspark.sql import functions as F

    per = spark.createDataFrame(
        [(1, 10_000_000.0, 2), (2, 0.0, 0), (3, 36_000_000.0, 3)],
        "r int, num double, wsum long",
    )
    # the fixed Spark-side pipeline (mirrors agg_bootstrap_ci)
    mean_r = F.col("num") / 1000000 / F.col("wsum").cast("double")
    got = (
        per.filter(F.col("wsum") > 0)
        .agg(F.array_sort(F.collect_list(mean_r)).alias("a"))
        .first()
        .a
    )
    # the fixed oracle-side pipeline
    con = duckdb.connect()
    con.execute("CREATE TABLE per AS SELECT * FROM (VALUES (1, 10000000.0, 2), (2, 0.0, 0), (3, 36000000.0, 3)) t(r, num, wsum)")
    want = con.execute(
        "SELECT list_sort(list(num / 1000000 / CAST(wsum AS DOUBLE))) "
        "FROM per WHERE wsum > 0"
    ).fetchone()[0]
    assert got == want == [5.0, 12.0]
    # and the UNFIXED oracle shape really does diverge: DuckDB keeps the
    # NULL (array length 3), Spark's collect_list drops it (length 2)
    unfixed = con.execute(
        "SELECT list_sort(list(CASE WHEN wsum > 0 "
        "THEN num / 1000000 / CAST(wsum AS DOUBLE) END)) FROM per"
    ).fetchone()[0]
    con.close()
    assert len(unfixed) == 3 and len(got) == 2
    # the shipped entry's two sides both carry the filter
    import inspect

    from dbtwiz_spark.ops import CORPUS

    spec = CORPUS["agg-bootstrap-ci"]
    assert 'F.col("wsum") > 0' in inspect.getsource(spec.fn)
    assert "WHERE wsum > 0" in spec.oracle


def test_round8_source_similarity_memoizes_token_table(spark):
    """Round-8 ADVICE: ext-source-similarity-matrix used a bare .cache()
    on its (source, token) distinct table — every invocation (oracle
    sweeps, bench best-of-3) leaked a fresh persisted copy for the
    session lifetime. Now routed through the session-keyed _pipe_artifact
    memo: repeated invocations share ONE persisted table."""
    from dbtwiz_spark.ops import CORPUS, ext_pipeline
    from tests.conftest import SF_DIR

    ext_pipeline._ARTIFACTS.clear()
    fn = CORPUS["ext-source-similarity-matrix"].fn
    n1 = fn(spark, SF_DIR).count()
    assert len(ext_pipeline._ARTIFACTS) == 1
    n2 = fn(spark, SF_DIR).count()
    assert n1 == n2
    assert len(ext_pipeline._ARTIFACTS) == 1, "second call must hit the memo"
    (st,) = ext_pipeline._ARTIFACTS.values()
    assert st.storageLevel.useMemory or st.storageLevel.useDisk
    from dbtwiz_spark.ops.common import clear_session_memos

    clear_session_memos()
    assert not ext_pipeline._ARTIFACTS


def test_truncate_reliable_matches_local(spark, tmp_path, monkeypatch):
    """The lineage-truncation device behind every iterative op
    (common._truncate) must produce IDENTICAL results on both of its
    paths: localCheckpoint (the zero-I/O local default) and reliable
    checkpoint() to SPARK_GRAFT_CHECKPOINT_DIR (the executor-loss-safe
    cluster form — VERDICT r9 item 3). Run _cc_propagate both ways on
    the same graph and compare the full label tables; also pin that the
    reliable path actually WRITES checkpoint data (the switch must not
    silently stay local)."""
    from dbtwiz_spark.ops import graphs as G

    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (3, 2), (10, 11), (11, 10), (12, 12)],
        "src LONG, dst LONG",
    )
    monkeypatch.delenv("SPARK_GRAFT_CHECKPOINT_DIR", raising=False)
    local = {(r.node, r.lbl) for r in G._cc_propagate(edges, 3).collect()}
    assert local == {(1, 1), (2, 1), (3, 1), (10, 10), (11, 10), (12, 12)}

    ckdir = tmp_path / "ck"
    spark.sparkContext.setCheckpointDir(str(ckdir))
    monkeypatch.setenv("SPARK_GRAFT_CHECKPOINT_DIR", str(ckdir))
    reliable = {(r.node, r.lbl) for r in G._cc_propagate(edges, 3).collect()}
    assert reliable == local
    assert any(p.is_file() for p in ckdir.rglob("*")), (
        "reliable mode must write checkpoint blocks to the configured dir"
    )


def test_round10_invariants(spark):
    """Semantic invariants for the round-10 edits that hash parity can't
    see: memo stability of the pagerank rank table, dedup-cluster
    fixpoint + cluster validity over the mirrored pair graph, and the
    k-core trajectory's peel monotonicity with truncated rounds."""
    from dbtwiz_spark.ops import graphs as G
    from dbtwiz_spark.ops.registry import CORPUS

    # --- pagerank memo: a second invocation returns identical rows and
    # hits the session x scale memo (same underlying artifact object)
    pr1 = {tuple(r) for r in CORPUS["graph-pagerank"].fn(spark, SF_DIR).collect()}
    memo_obj = G._ARTIFACTS[(spark, SF_DIR, "pr_ranks_final")]
    pr2 = {tuple(r) for r in CORPUS["graph-pagerank"].fn(spark, SF_DIR).collect()}
    assert pr1 == pr2
    assert G._ARTIFACTS[(spark, SF_DIR, "pr_ranks_final")] is memo_obj, (
        "second call must hit the memo, not rebuild the iteration"
    )
    # total mass conservation within integer-floor loss: every node holds
    # base + damped share; top-20 ranks are positive and sorted
    ranks = [r.pagerank_fp for r in CORPUS["graph-pagerank"].fn(spark, SF_DIR).collect()]
    assert ranks == sorted(ranks, reverse=True)
    assert all(v > 0 for v in ranks)

    # --- dedup-cluster: fixpoint (labels are stable under one more
    # propagation round over the SAME mirrored edges) + validity (every
    # cluster keeps exactly one representative, the minimum doc_id)
    out = CORPUS["ext-dedup-cluster"].fn(spark, SF_DIR)
    rows = out.collect()
    by_cluster: dict = {}
    for r in rows:
        by_cluster.setdefault(r.cluster_id, []).append(r)
    for cid, members in by_cluster.items():
        keeps = [m for m in members if m.keep]
        assert len(keeps) == 1, f"cluster {cid} must keep exactly one doc"
        assert keeps[0].doc_id == min(m.doc_id for m in members) == cid, (
            "representative must be the minimum doc_id, which names the cluster"
        )

    # --- k-core: the peel trajectory is monotone non-increasing in both
    # survivors and edges (a truncated round must never resurrect nodes)
    kc = sorted(
        CORPUS["graph-k-core"].fn(spark, SF_DIR).collect(),
        key=lambda r: r.round,
    )
    for a, b in zip(kc, kc[1:]):
        assert b.n_customers <= a.n_customers
        assert b.n_suppliers <= a.n_suppliers
        assert b.n_edges <= a.n_edges
