"""Profile the per-entry cost of the full corpus sweep at a given sf_dir.

Mirrors the driver's correctness loop: one SparkSession, entries in corpus
order, Spark query -> toPandas + DuckDB oracle per entry. Prints a sorted
cost table so we can see what would blow a wall-clock budget.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from dbtwiz_spark.ops import CORPUS  # noqa: E402
from dbtwiz_spark.session import get_spark  # noqa: E402
from dbtwiz_spark.testing import compare_entry, duckdb_con  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(shuffle_partitions=8)
    con = duckdb_con(sf_dir)
    t_start = time.time()
    rows = []
    for i, name in enumerate(CORPUS):
        t0 = time.time()
        # split timing comes from INSIDE compare_entry (one execution per
        # side — a separate timed pre-run would execute every Spark plan
        # twice, misattributing a full execution to the oracle side and
        # doubling the sweep wall-clock), so each side's number survives
        # even when the OTHER side raises.
        timings: dict = {}
        try:
            res = compare_entry(spark, name, sf_dir, con, timings=timings)
            ok, detail = res.ok, res.detail
        except Exception as e:  # noqa: BLE001
            ok, detail = False, f"EXC {type(e).__name__}: {e}"
        dt = time.time() - t0
        spark_s = timings.get("spark_s")
        oracle_s = timings.get("oracle_s")
        rows.append({"i": i, "name": name, "sec": round(dt, 3),
                     "spark_sec": None if spark_s is None else round(spark_s, 3),
                     "oracle_sec": None if oracle_s is None else round(oracle_s, 3),
                     "ok": ok, "detail": detail[:120]})
        spark_disp = "  n/a " if spark_s is None else f"{spark_s:6.2f}"
        print(f"{i:3d} {name:32s} {dt:7.2f}s (spark {spark_disp}s) "
              f"ok={ok} {detail[:80]}", flush=True)
    total = time.time() - t_start
    print(f"\nTOTAL {total:.1f}s for {len(rows)} entries")
    rows.sort(key=lambda r: -r["sec"])
    print("slowest 15:")
    for r in rows[:15]:
        print(f"  {r['sec']:7.2f}s  {r['name']}")
    Path("/tmp/sweep_profile.json").write_text(json.dumps(rows, indent=1))
    # bound session storage like testing.run_all does: a profiling session
    # that sweeps several scales would otherwise accumulate persisted
    # artifact memos without bound
    from dbtwiz_spark.ops.common import clear_session_memos

    clear_session_memos()


if __name__ == "__main__":
    main()
