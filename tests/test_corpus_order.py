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


def test_warehouse_plane_unchanged_or_windowed():
    """The sink entries (and stream-dedup-near-cert) certify THROUGH
    Warehouse: their op functions call materialize.py methods whose
    source never appears in the entry hash, so a behavioral write-path
    edit would coast on green rows earned by the old code — the
    round-2 win-percent failure mode, one indirection deeper. The plane
    manifest pins materialize.py + fsutil.py at file level; an edit
    requires every green Warehouse-certified entry to re-enter the
    window (and the pin to be regenerated with the green manifest).

    Bootstrap caveat (stated, not hidden): the pin was first generated
    at round-11 HEAD, AFTER that round's own fsutil sweep rewrite — so
    the guard governs edits from round 12 on, and the round-11 rewrite
    itself is covered by the staging-sweep property test
    (tests/test_properties.py) and the materialize suite rather than a
    sink re-window. The sink entries rotate back through the window on
    their normal freshness schedule (r7-r10 cohort)."""
    import inspect

    from scripts.gen_green_manifest import PLANE_FILES, plane_hashes

    plane_path = REPO / "scripts" / "plane_manifest.json"
    pinned = json.loads(plane_path.read_text())["warehouse"]
    assert set(pinned) == set(PLANE_FILES), (
        "plane manifest out of sync with PLANE_FILES — rerun "
        "scripts/gen_green_manifest.py"
    )
    changed = [rel for rel, h in plane_hashes().items() if pinned[rel] != h]
    if not changed:
        return
    green = set(
        json.loads((REPO / "scripts" / "green_manifest.json").read_text())
    )
    affected = [
        name
        for name, spec in CORPUS.items()
        if name in green
        and (
            spec.fn.__module__ == "dbtwiz_spark.ops.sinks"
            or "Warehouse" in inspect.getsource(spec.fn)
        )
    ]
    assert affected, "Warehouse-certified entry derivation came up empty"
    missing = [e for e in affected if e not in DRIVER_WINDOW]
    assert not missing, (
        f"warehouse plane changed ({changed}) but these green entries "
        f"certify through it and sit outside the window: {missing} — put "
        "them in corpus_order.DRIVER_WINDOW (and regenerate the manifests) "
        "or revert the plane edit"
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
