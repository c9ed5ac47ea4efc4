"""Deterministic corpus ordering for the driver's correctness window.

The driver hash-checks the FIRST 50 ``queries()`` keys each round
(observed: CORRECTNESS_r01/r02 both stop at exactly 50 entries), and
``queries()`` order is ``CORPUS`` dict insertion order. This module makes
that order an explicit, reviewable artifact instead of an accident of
import order, so driver coverage can be *rotated* round by round until
every entry has a green row.

Round-4 window (positions 0-49): the 29 entries that have never had a
driver CORRECTNESS row (round-3 additions plus the ext-llm family the r3
window couldn't fit), the three round-3 hash-mismatch entries now fixed
(ext-split-train-eval / ext-pack-sequences / ext-mix-domains — their
oracles produced DuckDB HUGEINT sums that pandas renders as float64,
hashing differently from Spark's int64 even at equal values; all integer
aggregates are now CAST(... AS BIGINT)), ``join-range`` (reimplemented
for the TIMESTAMP_NTZ testdata, so its r1/r2 green rows certify dead
code), and the five r1-green entries rotated out in r2 (win-lag-lead,
win-first-last, win-running-agg, win-sliding-frame, sort-global — code
unchanged, closing the last stale r1 rows), every operator added during
round 4 (text-normalize through curriculum-order), and ext-dedup-near,
whose shingle universe changed this round. Exactly 50 entries. After this
round every corpus entry has a driver row from code identical to what
ships, EXCEPT the entries added after the window filled
(ext-dedup-simhash-recall, sort-within-partitions-cert, func-zorder,
stream-dedup-near, agg-mode-deterministic, agg-corr-covar,
set-except-all, set-intersect-all, win-gaps-islands,
agg-percentile-exact, join-null-safe, filter-exists-correlated,
set-union-by-name, func-higher-order, func-from-json,
ext-dataset-card — local-oracle green, slated for the round-5 window).
"""

from __future__ import annotations

# Order within the window is sweep order, cheapest families first so an
# early driver timeout still lands most rows.
DRIVER_WINDOW: tuple[str, ...] = (
    # round-3 hash mismatches, fixed (HUGEINT->float64 oracle dtype skew)
    "ext-split-train-eval",
    "ext-pack-sequences",
    "ext-mix-domains",
    # reimplemented for TIMESTAMP_NTZ testdata — r1/r2 rows are stale
    "join-range",
    # r1-green entries rotated out of the r2/r3 windows, code unchanged
    "win-lag-lead",
    "win-first-last",
    "win-running-agg",
    "win-sliding-frame",
    "sort-global",
    # never driver-tested: cheap scalar/agg entries first
    "func-url",
    "agg-hll-sketch-merge",
    "agg-salted-skew",
    # never driver-tested: text/quality family (map-side expressions)
    "ext-text-stats",
    "ext-token-count",
    "ext-lang-id",
    "ext-quality-score",
    "ext-fingerprint",
    "ext-quality-repetition",
    "ext-quality-gopher",
    "ext-pii-scrub",
    "ext-token-histogram",
    "ext-filter-length-outliers",
    "ext-filter-composite",
    "ext-mix-temperature",
    # never driver-tested: similarity / dedup / ANN family
    "ext-text-tfidf",
    "ext-ngram-jaccard",
    "ext-dedup-simhash",
    "ext-sim-threshold-join",
    "ext-dedup-embedding",
    "ext-knn-label",
    "ext-embed-stats",
    "ext-ann-lsh-bucket",
    "ext-ann-ivf",
    "ext-ann-lsh-recall",
    "ext-ann-ivf-recall",
    "ext-dedup-cluster",
    # never driver-tested: multimodal plumbing
    "ext-multimodal-column",
    "ext-multimodal-framesample",
    # new this round
    "ext-text-normalize",
    "ext-host-token-budget",
    "ext-dup-span",
    "ext-dedup-near-recall",
    "agg-heavy-hitters",
    "sink-sharded-export",
    "ext-vocab-build",
    "agg-quantile-digest",
    "ext-sample-importance",
    "ext-dedup-url",
    "ext-curriculum-order",
    # re-enters: its shingle universe changed this round (DF cap before
    # MinHash) — the r3 rows-only row certifies the uncapped code
    "ext-dedup-near",
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
