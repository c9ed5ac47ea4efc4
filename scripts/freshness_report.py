"""Certification-freshness report for window-rotation planning.

Each driver round re-certifies only the first 50 ``queries()`` entries
(the DRIVER_WINDOW), so every other entry's newest CORRECTNESS row ages
by one round. The verdicts track this by hand ("r5 x 39 is the complete
oldest cohort"); this script computes it from the CORRECTNESS_r*.json
history so a rotation plan starts from the actual cohorts, not a
recollection of them.

Green semantics ARE scripts/gen_green_manifest.py's — the row-level
predicate (``row_green``) is imported, not reimplemented, so the
planner can never drift from the guard:
- oracle-carrying entries are green ONLY on hash_match (and never on a
  row recording a non-"no_oracle" err);
- rows-only entries (spec.oracle is None) are green when the driver
  RECORDED a rows-only check (err == "no_oracle" with spark_rows).

Usage:
    python scripts/freshness_report.py            # cohort histogram + plan aid
    python scripts/freshness_report.py --json     # machine-readable
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from dbtwiz_spark.ops import CORPUS  # noqa: E402
from dbtwiz_spark.ops.corpus_order import DRIVER_WINDOW  # noqa: E402
from scripts.gen_green_manifest import row_green as _row_green  # noqa: E402


def latest_green_rounds(before: int | None = None) -> dict[str, int | None]:
    """Entry -> newest round with a green driver row (None: never green).

    ``before`` bounds the history to rounds STRICTLY below it — the
    freshness test passes ``corpus_order.WINDOW_ROUND`` so its cohort
    computation sees exactly the history the window was planned against,
    and the driver dropping the CURRENT round's CORRECTNESS file cannot
    shift the oldest cohort mid-round (the r11 judge-time red)."""
    latest: dict[str, int | None] = {name: None for name in CORPUS}
    for path in sorted(REPO.glob("CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path.name)
        if m is None:
            continue  # e.g. a CORRECTNESS_r10_backup.json stray
        rnd = int(m.group(1))
        if before is not None and rnd >= before:
            continue
        for name, row in json.loads(path.read_text()).items():
            if name in latest and _row_green(name, row):
                cur = latest[name]
                latest[name] = rnd if cur is None else max(cur, rnd)
    return latest


def main() -> None:
    latest = latest_green_rounds()
    as_json = "--json" in sys.argv

    cohorts: dict[int | None, list[str]] = {}
    for name, rnd in latest.items():
        cohorts.setdefault(rnd, []).append(name)

    # assume a green current round for window members: the plan aid asks
    # "after THIS window goes green, what is the oldest cohort and which
    # of its entries are NOT already being re-certified?"
    rounds = [r for r in cohorts if r is not None]
    this_round = (max(rounds) if rounds else 0) + 1
    projected = {
        name: (this_round if name in DRIVER_WINDOW else rnd)
        for name, rnd in latest.items()
    }
    proj_rounds = sorted({r for r in projected.values() if r is not None})
    oldest = proj_rounds[0] if proj_rounds else None
    next_candidates = sorted(
        name
        for name, rnd in projected.items()
        if rnd == oldest and name not in DRIVER_WINDOW
    )

    if as_json:
        print(
            json.dumps(
                {
                    "latest_green_round": latest,
                    "window_round": this_round,
                    "projected_oldest_cohort": oldest,
                    "next_window_candidates": next_candidates,
                },
                indent=1,
                sort_keys=True,
            )
        )
        return

    print(f"corpus entries: {len(latest)}  window: {len(DRIVER_WINDOW)}")
    for rnd in sorted(cohorts, key=lambda r: (r is None, r)):
        names = cohorts[rnd]
        label = f"r{rnd}" if rnd is not None else "never-green"
        in_win = sum(1 for n in names if n in DRIVER_WINDOW)
        print(f"  {label:>11}: {len(names):3d} entries ({in_win} in window)")
    print(
        f"\nprojected after a green r{this_round} window: oldest cohort r{oldest}, "
        f"{len(next_candidates)} entries to front-load next round:"
    )
    for name in next_candidates:
        print(f"  {name}")


if __name__ == "__main__":
    main()
