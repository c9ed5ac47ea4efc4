"""Deterministic corpus ordering for the driver's correctness window.

The driver hash-checks the FIRST 50 ``queries()`` keys each round
(observed: CORRECTNESS_r01/r02 both stop at exactly 50 entries), and
``queries()`` order is ``CORPUS`` dict insertion order. This module makes
that order an explicit, reviewable artifact instead of an accident of
import order, so driver coverage can be *rotated* round by round until
every entry has a green row.

Round-8 window (positions 0-49) — the certification catch-up round
(VERDICT r7 item 1): 49 of the 54 entries that accumulated after the
round-7 window filled and therefore have ZERO driver evidence (all
local-oracle green at sf0.001/0.01; the round-7 judge additionally
swept all 54 at sf0.01 — 54/54 pass), plus one re-entry:

* 0-13 — the structurally riskiest first (the judge's front-load list):
  the graph family (connected-components, k-core, hits, assortativity,
  minplus-distance, personalized-pagerank), the SCD2 pair
  (sink-scd2-hard-delete, join-scd2-point-in-time), scan-snapshot-diff
  (time-travel diff over the snapshot store), ext-classify-naive-bayes,
  udf-cogroup (the cogrouped-applyInPandas boundary), scan-profile-table,
  ext-curation-pipeline-e2e (longest derivation chain), join-star-schema.
* 14-48 — the remaining never-checked entries: the statistics family
  (anova-oneway, spearman, kendall, tukey-fences, cohen-d, runs-test,
  mutual-information, auc-roc, calibration-ece), business analytics
  (rfm, retention-triangle, hhi, growth-accounting, price-elasticity,
  bounce-rate, new-vs-repeat-revenue, seasonality-strength,
  order-gap-distribution, forecast-backtest-mape, pk-uniqueness-audit),
  finance/TS windows (rsi-wilder, bollinger-bands, rolling-beta), the
  streaming batch forms (rate-limit, gap-detect, top-k-windowed), and
  the LLM-pipeline tail (vocab-growth, length-decile-mix, ngram-novelty,
  perplexity-filter, split-leak-audit, embed-pca-power,
  embed-centroid-inertia, source-similarity-matrix — whose .cache()
  leak was fixed this round, so its fresh code gets certified directly),
  plus join-interval-coalesce.
* 49 — agg-bootstrap-ci re-enters: round-8 ADVICE alignment of the
  zero-weight-replicate NULL handling (WHERE wsum > 0 before
  list()/collect_list on BOTH engines) changed its implementation and
  oracle, so the green-manifest guard requires driver re-certification.

Deferred to round 9 (the 5 structurally simplest of the 54 — single
scan + map-side expression shapes, each judge-verified at sf0.01 and
green in the repo's own parametrized oracle sweep): agg-pythagorean-means,
agg-pareto-share, func-surrogate-key, func-column-masking, win-ohlc-bars.
Front-load these five in the round-9 window, then cycle the oldest
remaining r3-era rows (macro-template, udf-scalar/udaf/udtf, file
formats, core filter/function/set/sort families) so no green row is
older than r6 by round 9 (VERDICT r7 item 3).

Round-8 additions policy: corpus growth is FROZEN this round (VERDICT r7
item 2 — the uncertified backlog must shrink faster than it grows); any
entry added mid-round must be listed here under "added AFTER the
round-8 window filled" for round-9 front-loading.
"""


from __future__ import annotations

DRIVER_WINDOW: tuple[str, ...] = (
    # structurally riskiest first — graphs, SCD2, the Python cogroup
    # boundary, the longest derivation chains
    "graph-connected-components",
    "graph-k-core",
    "graph-hits",
    "graph-degree-assortativity",
    "graph-minplus-distance",
    "graph-personalized-pagerank",
    "sink-scd2-hard-delete",
    "join-scd2-point-in-time",
    "scan-snapshot-diff",
    "ext-classify-naive-bayes",
    "udf-cogroup",
    "scan-profile-table",
    "ext-curation-pipeline-e2e",
    "join-star-schema",
    # statistics aggregates
    "agg-anova-oneway",
    "agg-spearman-corr",
    "agg-kendall-tau",
    "agg-tukey-fences",
    "agg-cohen-d",
    "agg-runs-test",
    "agg-mutual-information",
    "agg-auc-roc",
    "agg-calibration-ece",
    # business analytics
    "agg-rfm-segmentation",
    "agg-retention-triangle",
    "agg-hhi-concentration",
    "agg-growth-accounting",
    "agg-price-elasticity",
    "agg-bounce-rate",
    "agg-new-vs-repeat-revenue",
    "agg-seasonality-strength",
    "agg-order-gap-distribution",
    "agg-forecast-backtest-mape",
    "agg-pk-uniqueness-audit",
    # finance / time-series windows
    "win-rsi-wilder",
    "win-bollinger-bands",
    "win-rolling-beta",
    # streaming batch forms
    "stream-rate-limit",
    "stream-gap-detect",
    "stream-top-k-windowed",
    # LLM-pipeline tail
    "ext-vocab-growth",
    "ext-length-decile-mix",
    "ext-ngram-novelty",
    "ext-perplexity-filter",
    "ext-split-leak-audit",
    "ext-embed-pca-power",
    "ext-embed-centroid-inertia",
    "ext-source-similarity-matrix",
    "join-interval-coalesce",
    # re-entry: zero-weight-replicate NULL alignment changed fn + oracle
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
