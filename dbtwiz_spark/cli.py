"""CLI mirroring the reference's command tree (dbtwiz/cli/main.py:6-26:
build/test/manifest sub-apps + admin backfill/cleandev/orphaned/
partition-expiry/restore + freshness). argparse (stdlib) instead of typer —
same commands, same semantics, Spark underneath.

    python -m dbtwiz_spark build --project P --warehouse W --select my_model+
    python -m dbtwiz_spark backfill --project P --warehouse W \
        --select daily_orders --first 2024-01-01 --last 2024-03-31
    python -m dbtwiz_spark admin orphaned --project P --warehouse W
"""

from __future__ import annotations

import argparse
import json
import sys
from datetime import date


def _spark():
    from dbtwiz_spark.session import get_spark

    return get_spark("dbtwiz_spark-cli")


def _load(args):
    from dbtwiz_spark.materialize import Warehouse
    from dbtwiz_spark.project import load_project
    from dbtwiz_spark.runner import Runner

    manifest, variables = load_project(args.project)
    if getattr(args, "vars", None):
        variables.update(json.loads(args.vars))
    wh = Warehouse(_spark(), args.warehouse)
    return Runner(wh.spark, manifest, wh, variables=variables), manifest, wh


def cmd_build(args) -> int:
    runner, manifest, _ = _load(args)
    if args.start:
        runner.variables["data_interval_start"] = args.start
        runner.variables["data_interval_end"] = args.end or args.start
    state = None
    if args.state:
        from dbtwiz_spark.manifest import Manifest

        state = Manifest.load_state(args.state)
    results = runner.run(args.select, state=state)
    for r in results:
        line = f"{r.status:8s} {r.model}" + (f"  rows={r.rows}" if r.rows is not None else "")
        print(line + (f"  {r.error}" if r.error else ""))
    return 0 if all(r.status != "error" for r in results) else 1


def cmd_test(args) -> int:
    """Model checks: declared unique_key must actually be unique
    (the validate-pk check, SURVEY §1.3 / dbtwiz/model/validate.py:271-292)."""
    from pyspark.sql import functions as F

    runner, manifest, wh = _load(args)
    failures = 0
    for name in manifest.select(args.select):
        m = manifest.models[name]
        if not m.unique_key or not wh.exists(name):
            continue
        df = wh.read(name)
        total = df.count()
        distinct = df.select(m.unique_key).distinct().count()
        ok = total == distinct
        failures += 0 if ok else 1
        print(f"{'pass' if ok else 'FAIL':4s} {name}: pk {m.unique_key} "
              f"({distinct} distinct / {total} rows)")
    return 0 if failures == 0 else 1


def cmd_manifest(args) -> int:
    manifest, _ = _load_manifest_only(args)
    order = manifest.select(args.select)
    out = {
        name: {
            "materialized": manifest.models[name].materialized,
            "parents": sorted(manifest.parent_map.get(name, ())),
            "children": sorted(manifest.child_map.get(name, ())),
            "fingerprint": manifest.models[name].fingerprint(),
        }
        for name in order
    }
    print(json.dumps(out, indent=2))
    return 0


def _load_manifest_only(args):
    from dbtwiz_spark.project import load_project

    return load_project(args.project)


def cmd_backfill(args) -> int:
    from dbtwiz_spark.backfill import BackfillJournal, run_backfill

    runner, _, _ = _load(args)
    journal = BackfillJournal(args.journal) if args.journal else None
    results = run_backfill(
        runner,
        args.select,
        date.fromisoformat(args.first),
        date.fromisoformat(args.last),
        batch_size=args.batch_days,
        journal=journal,
        retry_failed_only=args.retry,
        serial=not args.parallel_safe,
    )
    for (lo, hi), status in results:
        print(f"{lo}..{hi}  {status}")
    return 0 if all(s == "success" for _, s in results) else 1


def cmd_orphaned(args) -> int:
    from dbtwiz_spark.admin import find_orphaned

    runner, manifest, wh = _load(args)
    orphans = find_orphaned(wh, manifest)
    for t in orphans:
        print(t)
        if args.delete:
            wh.delete_table(t)
    return 0


def cmd_cleandev(args) -> int:
    from dbtwiz_spark.admin import cleandev
    from dbtwiz_spark.materialize import Warehouse

    wh = Warehouse(_spark(), args.warehouse)
    for t in cleandev(wh, dry_run=not args.force):
        print(("deleted " if args.force else "would delete ") + t)
    return 0


def cmd_partition_expiry(args) -> int:
    from dbtwiz_spark.admin import expire_partitions, expiry_mismatches

    runner, manifest, wh = _load(args)
    mismatches = expiry_mismatches(wh, manifest)
    for name, (declared, oldest) in mismatches.items():
        print(f"{name}: declared {declared}d, oldest partition {oldest}d")
        if args.apply:
            m = manifest.models[name]
            doomed = expire_partitions(
                wh, name, m.partition_by or "partitiondate",
                m.partition_expiration_days, dry_run=False,
            )
            print(f"  expired {len(doomed)} partitions")
    return 0


def cmd_restore(args) -> int:
    from dbtwiz_spark.materialize import Warehouse

    wh = Warehouse(_spark(), args.warehouse)
    wh.restore(args.table, args.at_ms)
    print(f"restored {args.table} to snapshot <= {args.at_ms}")
    return 0


def cmd_freshness(args) -> int:
    from dbtwiz_spark.admin import check_freshness
    from dbtwiz_spark.materialize import Warehouse

    wh = Warehouse(_spark(), args.warehouse)
    ok, age_h = check_freshness(wh, args.table, args.column, args.max_age_hours)
    print(f"{'fresh' if ok else 'STALE'}: {args.table}.{args.column} age {age_h:.1f}h")
    return 0 if ok else 1


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="dbtwiz_spark")
    sub = p.add_subparsers(dest="command", required=True)

    def common(sp, warehouse=True):
        sp.add_argument("--project", required=True)
        if warehouse:
            sp.add_argument("--warehouse", required=True)
        sp.add_argument("--select", default="*")
        sp.add_argument("--vars", help="JSON dict of variable overrides")

    b = sub.add_parser("build", help="render + materialize selected models")
    common(b)
    b.add_argument("--start", help="data_interval_start (ISO date)")
    b.add_argument("--end", help="data_interval_end (ISO date)")
    b.add_argument("--state", help="fingerprint state file for state:modified")
    b.set_defaults(fn=cmd_build)

    t = sub.add_parser("test", help="model checks (pk uniqueness)")
    common(t)
    t.set_defaults(fn=cmd_test)

    m = sub.add_parser("manifest", help="print the model DAG")
    m.add_argument("--project", required=True)
    m.add_argument("--select", default="*")
    m.set_defaults(fn=cmd_manifest)

    bf = sub.add_parser("backfill", help="date-chunked re-run of a model range")
    common(bf)
    bf.add_argument("--first", required=True)
    bf.add_argument("--last", required=True)
    bf.add_argument("--batch-days", type=int, default=None)
    bf.add_argument("--journal", help="journal file; enables retry bookkeeping")
    bf.add_argument("--retry", action="store_true", help="re-run failed chunks only")
    bf.add_argument(
        "--parallel-safe", action="store_true",
        help="model does not depend on its own past data (continue past failures)",
    )
    bf.set_defaults(fn=cmd_backfill)

    admin = sub.add_parser("admin", help="warehouse administration")
    asub = admin.add_subparsers(dest="admin_command", required=True)

    o = asub.add_parser("orphaned", help="tables in warehouse but not manifest")
    common(o)
    o.add_argument("--delete", action="store_true")
    o.set_defaults(fn=cmd_orphaned)

    c = asub.add_parser("cleandev", help="drop every table in a dev warehouse")
    c.add_argument("--warehouse", required=True)
    c.add_argument("--force", action="store_true")
    c.set_defaults(fn=cmd_cleandev)

    pe = asub.add_parser("partition-expiry", help="declared vs live partition expiry")
    common(pe)
    pe.add_argument("--apply", action="store_true")
    pe.set_defaults(fn=cmd_partition_expiry)

    r = asub.add_parser("restore", help="time-travel restore from snapshot")
    r.add_argument("--warehouse", required=True)
    r.add_argument("--table", required=True)
    r.add_argument("--at-ms", type=int, required=True)
    r.set_defaults(fn=cmd_restore)

    f = asub.add_parser("freshness", help="max(loaded_at) vs watermark")
    f.add_argument("--warehouse", required=True)
    f.add_argument("--table", required=True)
    f.add_argument("--column", required=True)
    f.add_argument("--max-age-hours", type=float, required=True)
    f.set_defaults(fn=cmd_freshness)

    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
