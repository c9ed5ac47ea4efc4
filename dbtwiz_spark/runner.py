"""Model execution: manifest → macros → Catalyst → materializer (§3.1).

The reference's build path is: selector → manifest DAG → dbt compile
(Jinja→SQL) → warehouse jobs (dbtwiz/commands/build.py:46-124,
dbtwiz/dbt/run.py:8-44). Here the warehouse is Spark: each selected model's
SQL is rendered (ref() → physical table/view name), run through
``spark.sql`` — Catalyst owns optimization — and handed to the
materializer according to the model config, in topological order.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from dbtwiz_spark.macros import render
from dbtwiz_spark.manifest import Manifest, Model
from dbtwiz_spark.materialize import Warehouse
from dbtwiz_spark.plans import require_partition_filter


@dataclass
class RunResult:
    model: str
    status: str  # success | error | skipped
    rows: int | None = None
    error: str | None = None


@dataclass
class Runner:
    spark: SparkSession
    manifest: Manifest
    warehouse: Warehouse
    variables: dict = field(default_factory=dict)
    # dbt --defer: unbuilt parents fall back to this (e.g. prod) warehouse
    # when absent from the local one (reference sets defer+state for
    # state:modified builds, dbtwiz/commands/build.py:106-110)
    defer_warehouse: Warehouse | None = None
    # names already pre-registered by _register_unbuilt this process: a
    # backfill calls run() once per chunk, and re-reading every ancestor's
    # parquet schema + re-parsing every view SQL per chunk is pure waste —
    # unbuilt ancestors don't change between chunks, and ancestors built
    # mid-run refresh their own temp views at build time
    _preregistered: set = field(default_factory=set)

    def _resolve_map(self) -> dict[str, str]:
        """ref()/source() name → readable relation (temp view or path scan)."""
        out: dict[str, str] = {}
        for name, src in self.manifest.sources.items():
            self.spark.read.parquet(src.path).createOrReplaceTempView(name)
            out[name] = name
        for name, model in self.manifest.models.items():
            if model.materialized != "ephemeral":
                out[name] = name
        # ephemeral models inline as subqueries. Rendering one reads
        # self._resolve_cache, so publish the partial map FIRST (rendering
        # inside the dict-building loop crashed on the not-yet-assigned
        # attribute); topological order lets ephemerals reference other
        # ephemerals — parents are already inlined when a child renders.
        self._resolve_cache = out
        for name in self.manifest.topo_order():
            model = self.manifest.models[name]
            if model.materialized == "ephemeral":
                out[name] = f"({self._render(model)})"
        return out

    def _register_unbuilt(self, order: list[str]) -> None:
        """Make refs to models NOT built in this run resolvable: a partial
        selection (``--select child``, ``state:modified+``) must read
        parents built by a PREVIOUS invocation from the warehouse — in a
        fresh process there is no temp view left over from building them.
        Falls back to ``defer_warehouse`` when the local warehouse lacks
        the parent (dbt --defer: a dev build of modified models reads
        untouched parents from prod). Walks the ancestor closure in
        topological order so a persisted view's own parents are registered
        before its SQL is parsed."""
        selected = set(order)
        needed: set[str] = set()
        stack = [p for n in order for p in self.manifest.parent_map.get(n, ())]
        while stack:
            m = stack.pop()
            if m in needed or m in selected:
                continue
            needed.add(m)
            stack.extend(self.manifest.parent_map.get(m, ()))
        for name in self.manifest.topo_order():
            if name not in needed:
                continue
            model = self.manifest.models.get(name)
            if model is None or model.materialized == "ephemeral":
                continue  # sources register in _resolve_map; ephemerals inline
            if name in self._preregistered:
                continue
            for wh in (self.warehouse, self.defer_warehouse):
                if wh is None:
                    continue
                if name in wh.views or wh.exists(name):
                    try:
                        wh.read(name).createOrReplaceTempView(name)
                        if wh is self.warehouse:
                            # memoize LOCAL registrations only: a
                            # defer-warehouse (prod) fallback must re-resolve
                            # on the next run() — the local copy may have
                            # become readable mid-backfill, and pinning the
                            # prod snapshot would silently feed later chunks
                            # stale data
                            self._preregistered.add(name)
                        break
                    except Exception as e:  # noqa: BLE001 — a view whose own
                        # parent is mid-rebuild in THIS run can't parse yet;
                        # the failure will surface (with context) at the
                        # selected model that actually reads it. NO break:
                        # the defer warehouse may hold a readable copy
                        print(f"[runner] could not pre-register {name!r}: {e}")

    def _render(self, model: Model) -> str:
        return render(
            model.sql,
            resolve=self._resolve_cache,
            variables=self.variables,
            interval_start=self.variables.get("data_interval_start"),
            interval_end=self.variables.get("data_interval_end"),
        )

    def run(
        self,
        selector: str = "*",
        state: dict[str, str] | None = None,
        exclude: str | None = None,
        threads: int = 1,
        full_refresh: bool = False,
        fail_fast: bool = False,
    ) -> list[RunResult]:
        order = self.manifest.select(selector, state=state, exclude=exclude)
        self._resolve_cache = self._resolve_map()
        self._register_unbuilt(order)
        if threads > 1:
            return self._run_parallel(order, threads, full_refresh=full_refresh,
                                      fail_fast=fail_fast)
        results = []
        selected = set(order)
        failed_or_skipped: set[str] = set()
        for name in order:
            model = self.manifest.models[name]
            if any(
                p in failed_or_skipped
                for p in self.manifest.parent_map.get(name, ())
                if p in selected
            ):
                # dbt semantics, same as the parallel scheduler: a failed
                # model's downstream is SKIPPED, not attempted against a
                # missing table (which would surface as a confusing
                # unresolved-relation error). Pinned equal to the parallel
                # path by the random-DAG property test.
                failed_or_skipped.add(name)
                results.append(RunResult(name, "skipped", error="upstream failed"))
                continue
            try:
                results.append(self._run_model(model, full_refresh=full_refresh))
            except Exception as e:  # noqa: BLE001 — per-model isolation, like dbt
                failed_or_skipped.add(name)
                results.append(RunResult(name, "error", error=f"{type(e).__name__}: {e}"))
                if fail_fast:
                    # dbt --fail-fast: stop scheduling after the first
                    # error; everything not yet attempted reports skipped
                    done = {r.model for r in results}
                    results.extend(
                        RunResult(rest, "skipped", error="fail-fast")
                        for rest in order if rest not in done
                    )
                    break
        return results

    def _run_parallel(
        self, order: list[str], threads: int, full_refresh: bool = False,
        fail_fast: bool = False,
    ) -> list[RunResult]:
        """Dependency-aware thread-pooled execution (dbt's --threads):
        independent models run concurrently — on a cluster that is the
        difference between one job at a time and a saturated scheduler.
        Spark sessions are thread-safe for concurrent job submission; the
        FAIR-vs-FIFO choice stays a Spark conf. A failed model SKIPS its
        downstream models (dbt semantics) rather than building on top of a
        missing table."""
        from concurrent.futures import FIRST_COMPLETED, ThreadPoolExecutor, wait

        selected = set(order)
        pending = {
            n: {p for p in self.manifest.parent_map.get(n, ()) if p in selected}
            for n in order
        }
        results: dict[str, RunResult] = {}
        failed_or_skipped: set[str] = set()

        submitted: set[str] = set()

        def runnable() -> list[str]:
            return [
                n for n, deps in pending.items()
                if not deps and n not in results and n not in submitted
            ]

        def finish(name: str, res: RunResult) -> None:
            results[name] = res
            if res.status == "error":
                failed_or_skipped.add(name)
            for n, deps in pending.items():
                deps.discard(name)

        running: dict = {}
        halted = False
        with ThreadPoolExecutor(max_workers=threads) as pool:
            while len(results) < len(order):
                if halted and not running:
                    # fail-fast drain complete: everything unfinished skips
                    for n in order:
                        if n not in results:
                            finish(n, RunResult(n, "skipped",
                                                error="fail-fast"))
                    break
                # cascade skips: a model whose parent failed/was skipped
                for n in list(pending):
                    if n in results or n in submitted:
                        continue
                    parents = {
                        p
                        for p in self.manifest.parent_map.get(n, ())
                        if p in selected
                    }
                    if parents & failed_or_skipped:
                        failed_or_skipped.add(n)
                        finish(n, RunResult(n, "skipped",
                                            error="upstream failed"))
                for n in ([] if halted else runnable()):
                    submitted.add(n)
                    model = self.manifest.models[n]

                    def job(m=model):
                        try:
                            return self._run_model(m, full_refresh=full_refresh)
                        except Exception as e:  # noqa: BLE001
                            return RunResult(
                                m.name, "error", error=f"{type(e).__name__}: {e}"
                            )

                    running[pool.submit(job)] = n
                if not running:
                    if len(results) < len(order) and not runnable():
                        # acyclic selections always progress; guard anyway
                        for n in order:
                            if n not in results:
                                finish(n, RunResult(n, "error",
                                                    error="unschedulable"))
                    continue
                done, _ = wait(running, return_when=FIRST_COMPLETED)
                for fut in done:
                    res = fut.result()
                    finish(running.pop(fut), res)
                    if fail_fast and res.status == "error":
                        halted = True  # in-flight models drain, no new starts
        return [results[n] for n in order]

    def _run_model(self, model: Model, full_refresh: bool = False) -> RunResult:
        if model.materialized == "ephemeral":
            return RunResult(model.name, "skipped")  # inlined at use sites
        sql = self._render(model)
        df = self.spark.sql(sql)
        if model.materialized == "view":
            self.warehouse.create_view(model.name, sql)
            df.createOrReplaceTempView(model.name)
            return RunResult(model.name, "success")
        if model.require_partition_filter and model.partition_by:
            require_partition_filter(df, model.partition_by)
        if model.materialized == "incremental" and full_refresh:
            # dbt --full-refresh (reference: dbtwiz/commands/build.py:116 →
            # dbt's full-refresh flag): drop-and-recreate the incremental
            # table from this run's output alone — the recovery path when
            # the schema changed shape between runs. write_table's publish
            # swap keeps the old state readable until the new one lands;
            # snapshot honors the model's own config, exactly like the
            # incremental path it replaces. Falls through to the shared
            # temp-view registration so downstream refs resolve.
            self.warehouse.write_table(
                model.name,
                df,
                model.partition_by,
                model.cluster_by,
                snapshot=model.snapshot,
            )
        elif model.materialized == "table":
            self.warehouse.write_table(
                model.name, df, model.partition_by, model.cluster_by
            )
        elif model.materialized == "incremental":
            if model.incremental_strategy == "merge":
                if not model.unique_key:
                    raise ValueError(f"{model.name}: merge requires unique_key")
                self.warehouse.merge(
                    model.name, df, model.unique_key, model.partition_by
                )
            else:  # insert_overwrite (default, dbtwiz/model/create.py:456)
                if not model.partition_by:
                    raise ValueError(f"{model.name}: insert_overwrite requires partition_by")
                self.warehouse.insert_overwrite(
                    model.name,
                    df,
                    model.partition_by,
                    model.cluster_by,
                    snapshot=model.snapshot,
                )
        elif model.materialized == "scd2":
            if not (model.unique_key and model.partition_by):
                raise ValueError(f"{model.name}: scd2 requires unique_key and partition_by")
            self.warehouse.scd2_apply(
                model.name, df, model.unique_key, model.partition_by
            )
        else:
            raise ValueError(f"unknown materialization: {model.materialized}")
        # register the physical table as a view for downstream models
        out = self.warehouse.read(model.name)
        out.createOrReplaceTempView(model.name)
        return RunResult(model.name, "success", rows=out.count())


    # -- compile / explain (dry run) ------------------------------------
    def compiled_sql(self, name: str, _memo: dict[str, str] | None = None) -> str:
        """Fully-inlined SQL for one model: every upstream ref() becomes a
        subquery, sources resolve to registered path views — so a model can
        be compiled and explained WITHOUT building any parent (the dbt
        `compile` + BigQuery dry-run analog; reference estimates bytes via
        dry run in dbtwiz/admin/backfill.py)."""
        from dbtwiz_spark.macros import extract_refs

        memo = _memo
        if memo is None:
            memo = {}
            # register source views ONCE per compile, not per recursive call
            # (each registration is a parquet schema read + catalog RPC)
            for src_name, src in self.manifest.sources.items():
                self.spark.read.parquet(src.path).createOrReplaceTempView(src_name)
        if name in memo:
            return memo[name]
        model = self.manifest.models[name]
        resolve: dict[str, str] = {}
        for dep in extract_refs(model.sql):
            if dep in self.manifest.models:
                resolve[dep] = f"({self.compiled_sql(dep, memo)})"
            else:
                resolve[dep] = dep  # source view
        sql = render(
            model.sql,
            resolve=resolve,
            variables=self.variables,
            interval_start=self.variables.get("data_interval_start"),
            interval_end=self.variables.get("data_interval_end"),
        )
        memo[name] = sql
        return sql

    def explain(self, name: str) -> tuple[str, str, list[str]]:
        """(compiled SQL, formatted physical plan, audit notes) for a model.

        The audit surfaces the scale properties the engine cares about:
        filter pushdown reaching the scan, join strategies, shuffle count,
        and the red flags (cartesian product, single-partition window)."""
        sql = self.compiled_sql(name)
        df = self.spark.sql(sql)
        plan = df._jdf.queryExecution().explainString(
            self.spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        notes: list[str] = []
        n_ex = plan.count("Exchange")
        notes.append(f"{n_ex} exchange(s) (shuffles/broadcasts)")
        if "PushedFilters: [" in plan and "PushedFilters: []" not in plan:
            notes.append("filter pushdown reaches the scan")
        for join in ("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
                     "BroadcastNestedLoopJoin"):
            c = plan.count(f"{join} (")
            if c:
                notes.append(f"{c}x {join}")
        if "CartesianProduct" in plan:
            notes.append("WARNING: cartesian product — O(n*m) at scale")
        import re as _re

        for m in _re.finditer(r"windowspecdefinition\(([^)]*)\)", plan):
            first = m.group(1).split(",")[0]
            if " ASC" in first or " DESC" in first:
                notes.append(
                    "WARNING: window without partitioning — single task sorts everything"
                )
                break
        if "BatchEvalPython" in plan:
            notes.append(
                "WARNING: row-at-a-time Python UDF in the plan — 10-100x "
                "slower than built-ins / pandas_udf at scale"
            )
        elif "ArrowEvalPython" in plan or "MapInPandas" in plan:
            notes.append("Arrow-vectorized Python stage present (ok, but "
                         "built-in expressions beat it where possible)")
        if "HashAggregate" in plan and "partial_" not in plan:
            # plan-GLOBAL heuristic: one partial aggregate anywhere
            # suppresses this note even if a second aggregate in the same
            # plan lacks its partial phase — a per-node check would need
            # to parse each HashAggregate's function list
            notes.append(
                "note: no map-side partial aggregation anywhere in the "
                "plan — the full input stream shuffles (expected for some "
                "distinct/first-value shapes; worth a look on large inputs)"
            )
        # NOTE: no blanket "Exchange SinglePartition" warning — Spark plans
        # a global ORDER BY as a parallel rangepartitioning exchange, and
        # the SinglePartition exchanges that DO appear (global aggregates
        # after map-side combine) carry tiny streams; the harmful case
        # (unpartitioned window) is caught above.
        return sql, plan, notes


def read_model(spark: SparkSession, warehouse: Warehouse, name: str) -> DataFrame:
    return warehouse.read(name)
