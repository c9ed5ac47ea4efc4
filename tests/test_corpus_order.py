"""Guards on the driver correctness-window rotation (VERDICT r2 item 1).

1. The window is at most 50 valid, distinct corpus names and CORPUS
   iteration starts with it (queries() order == CORPUS order); remaining
   driver slots fall through to registration order (already-green
   entries, free re-certification).
2. Green-manifest: any entry that already earned a driver-green row must
   either keep its implementation byte-identical or sit inside the current
   window so the driver re-certifies the new code. This is the regression
   pin for the round-2 ``win-percent`` failure mode (rewritten after its
   pass, leaving the green row certifying dead code).
"""

from __future__ import annotations

import json
from pathlib import Path

from dbtwiz_spark.ops import CORPUS
from dbtwiz_spark.ops.corpus_order import DRIVER_WINDOW

REPO = Path(__file__).resolve().parent.parent


def test_window_is_distinct_registered_names_within_50():
    # The driver checks the FIRST 50 queries() keys; the explicit window may
    # be shorter — remaining slots fall through to registration order
    # (already-green entries, free re-certification).
    assert 0 < len(DRIVER_WINDOW) <= 50
    assert len(set(DRIVER_WINDOW)) == len(DRIVER_WINDOW)
    unknown = [n for n in DRIVER_WINDOW if n not in CORPUS]
    assert not unknown, f"window names unregistered entries: {unknown}"


def test_corpus_iteration_starts_with_window():
    assert tuple(list(CORPUS)[: len(DRIVER_WINDOW)]) == DRIVER_WINDOW


def test_every_entry_still_registered_exactly_once():
    # reorder() must not drop or duplicate entries
    assert len(CORPUS) == len(set(CORPUS))
    assert len(CORPUS) >= 120


def test_green_entries_unchanged_or_in_window():
    from scripts.gen_green_manifest import entry_hash

    manifest = json.loads((REPO / "scripts" / "green_manifest.json").read_text())
    assert manifest, "green manifest missing/empty — run scripts/gen_green_manifest.py"
    stale = [
        name
        for name, pinned in manifest.items()
        if name in CORPUS
        and name not in DRIVER_WINDOW
        and entry_hash(name) != pinned
    ]
    assert not stale, (
        "implementation changed for driver-green entries outside the window "
        f"(driver would keep certifying the old code): {stale} — either put "
        "them in corpus_order.DRIVER_WINDOW or revert"
    )


# Which green entries certify THROUGH each pinned plane: predicates over
# (module, op source). Over-inclusion is safe (extra re-window), missing
# a referencer is not — keep these as broad as the plane's import shape.
_PLANE_AFFECTED = {
    "warehouse": lambda mod, src: (
        mod == "dbtwiz_spark.ops.sinks" or "Warehouse" in src
    ),
    "multimodal": lambda mod, src: "multimodal" in src,
}


def test_planes_unchanged_or_windowed():
    """Entries that certify THROUGH an engine plane (sink entries and
    stream-dedup-near-cert through materialize.Warehouse + fsutil; the
    ext-multimodal-* entries through multimodal.py) call code whose
    source never appears in their entry hash, so a behavioral plane edit
    would coast on green rows earned by the old code — the round-2
    win-percent failure mode, one indirection deeper. The plane manifest
    pins those files at file level; an edit requires every green entry
    certifying through the plane to re-enter the window (and the pin to
    be regenerated with the green manifest).

    Bootstrap caveat (stated, not hidden): each pin is first generated
    at the HEAD of the round that introduces it (warehouse + multimodal:
    round 11), AFTER that round's own edits to the plane — so the guard
    governs edits from the next round on, and the introducing round's
    edits are covered by the plane's direct test suite (staging-sweep
    property tests, the materialize suite, the decode round-trip tests)
    rather than a re-window. The entries rotate back through the window
    on their normal freshness schedule."""
    import inspect

    from scripts.gen_green_manifest import PLANES, plane_hashes

    pinned_all = json.loads(
        (REPO / "scripts" / "plane_manifest.json").read_text()
    )
    assert set(pinned_all) == set(PLANES) and set(_PLANE_AFFECTED) == set(
        PLANES
    ), "plane manifest / predicates out of sync with PLANES — rerun gen"
    green = set(
        json.loads((REPO / "scripts" / "green_manifest.json").read_text())
    )
    for plane, files in PLANES.items():
        pinned = pinned_all[plane]
        assert set(pinned) == set(files), (
            f"{plane} pin out of sync — rerun scripts/gen_green_manifest.py"
        )
        changed = [
            rel for rel, h in plane_hashes(plane).items() if pinned[rel] != h
        ]
        if not changed:
            continue
        affected = [
            name
            for name, spec in CORPUS.items()
            if name in green
            and _PLANE_AFFECTED[plane](
                spec.fn.__module__, inspect.getsource(spec.fn)
            )
        ]
        assert affected, f"{plane} affected-entry derivation came up empty"
        missing = [e for e in affected if e not in DRIVER_WINDOW]
        assert not missing, (
            f"{plane} plane changed ({changed}) but these green entries "
            f"certify through it and sit outside the window: {missing} — "
            "put them in corpus_order.DRIVER_WINDOW (and regenerate the "
            "manifests) or revert the plane edit"
        )


def test_freshness_report_agrees_with_green_manifest_semantics():
    """scripts/freshness_report.py is the rotation-planning aid; its green
    semantics must stay byte-for-byte those of gen_green_manifest (the
    guard's), or a rotation planned off the report would window the wrong
    cohort. Pins: every corpus entry has a green driver row (the 286/286
    certification), the entry sets agree across both scripts, and the
    projected next-round candidates never overlap the current window."""
    from scripts.freshness_report import latest_green_rounds
    from scripts.gen_green_manifest import green_entries

    latest = latest_green_rounds()
    assert set(latest) == set(CORPUS)
    never = sorted(n for n, r in latest.items() if r is None)
    assert not never, f"entries with no green driver row: {never}"
    assert {n for n, r in latest.items() if r is not None} == {
        n for n in green_entries() if n in CORPUS
    }
    oldest = min(r for r in latest.values() if r is not None)
    stale_outside = [
        n
        for n, r in latest.items()
        if r == oldest and n not in DRIVER_WINDOW
    ]
    assert not stale_outside, (
        f"oldest cohort (r{oldest}) entries outside the window — the "
        f"rotation should front-load them: {stale_outside}"
    )
