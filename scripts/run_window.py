"""Run EXACTLY the driver's correctness window (the first 50 ``queries()``
entries) with per-entry timing and oracle comparison — the fast preflight
for a window rotation: confirms every row the driver will grade is green
and shows where the sweep time goes.

    python scripts/run_window.py [sf_dir]        # default sf0.01
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from dbtwiz_spark.ops import CORPUS  # noqa: E402
from dbtwiz_spark.ops.corpus_order import DRIVER_WINDOW  # noqa: E402
from dbtwiz_spark.session import get_spark  # noqa: E402
from dbtwiz_spark.testing import compare_entry, duckdb_con  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    window = list(CORPUS)[:50]
    # explicit check, not assert: `python -O` strips asserts, and a
    # preflight that silently rehearses the WRONG window is worse than
    # no preflight (same rationale as full_sweep's corpus-size check)
    if tuple(window) != DRIVER_WINDOW:
        print("corpus order != DRIVER_WINDOW — fix corpus_order.py first", file=sys.stderr)
        sys.exit(1)
    spark = get_spark(shuffle_partitions=8)
    con = duckdb_con(sf_dir)
    t_all = time.time()
    failures = []
    rows = []
    for i, name in enumerate(window):
        t0 = time.time()
        try:
            res = compare_entry(spark, name, sf_dir, con)
            ok, detail = res.ok, res.detail
        except Exception as e:  # noqa: BLE001 — a crash is a failure row
            ok, detail = False, f"EXCEPTION {type(e).__name__}: {e}"
        dt = time.time() - t0
        rows.append((dt, name, ok))
        print(f"{i:3d} {name:35s} {dt:6.2f}s ok={ok}")
        if not ok:
            failures.append((name, detail[:160]))
    total = time.time() - t_all
    print(f"\nWINDOW TOTAL {total:.1f}s for {len(window)} entries")
    for dt, name, _ok in sorted(rows, reverse=True)[:8]:
        print(f"  {dt:6.2f}s  {name}")
    if failures:
        print("\nFAILURES:")
        for name, detail in failures:
            print(f"  {name}: {detail}")
        sys.exit(1)
    print("window green")


if __name__ == "__main__":
    main()
