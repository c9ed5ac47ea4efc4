"""Regenerate CORPUS.md from the live registry (entry -> impl location,
check kind, one-line summary). Run after adding/renaming corpus entries."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from dbtwiz_spark.ops import CORPUS  # noqa: E402


def main() -> None:
    lines = [
        "# CORPUS — the oracle-checked operator inventory",
        "",
        "Generated from `dbtwiz_spark.ops.registry.CORPUS` (regenerate with",
        "`python scripts/gen_corpus_md.py`). Every entry is exposed through the",
        "driver contract (`__spark_entry__.queries()` / `oracle_sql()`); *rows-only*",
        "entries intentionally have no DuckDB oracle (engine-specific hashes or",
        "sketches) and are instead recall/quality-tested in `tests/`.",
        "",
        f"**{len(CORPUS)} entries, "
        f"{sum(1 for s in CORPUS.values() if s.oracle)} with DuckDB value-hash oracles.**",
        "",
        "| # | entry | check | impl | summary |",
        "|---|---|---|---|---|",
    ]
    for i, (name, spec) in enumerate(CORPUS.items()):
        code = spec.fn.__code__
        loc = f"{code.co_filename.split('/root/repo/')[-1]}:{code.co_firstlineno}"
        doc = (spec.doc or "").strip().splitlines()
        summary = (doc[0] if doc else "").rstrip(".")[:90]
        check = "oracle" if spec.oracle else "rows-only"
        lines.append(f"| {i} | `{name}` | {check} | `{loc}` | {summary} |")
    Path(__file__).resolve().parent.parent.joinpath("CORPUS.md").write_text(
        "\n".join(lines) + "\n"
    )
    print(f"wrote CORPUS.md with {len(CORPUS)} entries")


if __name__ == "__main__":
    main()
