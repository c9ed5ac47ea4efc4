"""Full-corpus oracle sweep with a COMMITTED one-line JSON artifact.

CERTIFICATION.md has claimed a per-round full sweep at sf0.1, but the
claim was only verifiable by a ~15-minute rerun (VERDICT r13 item 3).
This script runs ``dbtwiz_spark.testing.run_all`` over every corpus
entry at the given sf_dir and writes
``scripts/sweep_{sftag}_r{WINDOW_ROUND}.json`` — round, sf, entry and
green counts, wall time, and a result hash over the per-entry outcome
tuples — so the claim is checkable from the tree: the artifact names
the round it was produced for (the corpus_order pin, not a free-typed
string), and the result hash changes if any entry's outcome or row
count differs.

    python scripts/full_sweep.py [sf_dir]        # default sf0.1
"""

from __future__ import annotations

import hashlib
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from dbtwiz_spark.ops import CORPUS  # noqa: E402
from dbtwiz_spark.ops.corpus_order import WINDOW_ROUND  # noqa: E402
from dbtwiz_spark.session import get_spark  # noqa: E402
from dbtwiz_spark.testing import run_all  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    sftag = Path(sf_dir).name.replace(".", "")  # sf0.1 -> sf01
    spark = get_spark()
    t0 = time.time()
    results = run_all(spark, sf_dir)
    wall_s = time.time() - t0
    # order-independent outcome hash: any flip in ok/rows changes it
    h = hashlib.sha256()
    for r in sorted(results, key=lambda r: r.name):
        h.update(
            f"{r.name}|{r.ok}|{r.spark_rows}|{r.oracle_rows}\n".encode()
        )
    failures = [r.name for r in results if not r.ok]
    summary = {
        "round": WINDOW_ROUND,
        "sf_dir": sf_dir,
        "n_entries": len(results),
        "n_green": len(results) - len(failures),
        "wall_s": round(wall_s, 1),
        "result_hash": h.hexdigest(),
        "failures": failures,
    }
    # Survives `python -O` (a bare assert would strip) and names the
    # mismatch instead of dying with a raw AssertionError after the
    # 12-minute sweep — the artifact is not written on a partial run.
    if len(results) != len(CORPUS):
        print(
            f"corpus-size mismatch: swept {len(results)} entries but the "
            f"registry holds {len(CORPUS)} — artifact NOT written",
            file=sys.stderr,
        )
        sys.exit(1)
    out = REPO / "scripts" / f"sweep_{sftag}_r{WINDOW_ROUND}.json"
    out.write_text(json.dumps(summary) + "\n")
    print(json.dumps(summary))
    print(f"-> {out}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
