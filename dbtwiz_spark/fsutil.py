"""Small filesystem helpers shared by the orchestration plane."""

from __future__ import annotations

import os
from pathlib import Path


def atomic_write_text(path: Path | str, text: str) -> None:
    """Replace ``path``'s content atomically (write temp sibling, then
    ``os.replace``). Every journal/state file the engine keeps —
    backfill journal, ``--last`` replay state, per-model results,
    manifest fingerprints, table properties — is read back by a LATER
    process to decide what work to redo or skip; a worker killed mid
    ``write_text`` would leave truncated JSON that bricks that decision.
    With replace, a reader sees the complete old or the complete new
    state, never a prefix. The temp name carries the pid so two
    concurrent writers (parallel backfill workers) cannot collide on
    the staging file; last-replace-wins on the target, which is the
    whole-file-registry semantic these stores already have."""
    p = Path(path)
    p.parent.mkdir(parents=True, exist_ok=True)
    tmp = p.with_name(f"{p.name}.tmp.{os.getpid()}")
    # fsync the temp's DATA before the rename: without it a journaling
    # fs (ext4 and friends) may commit the rename before the data
    # blocks land, so a power loss would resurface the prefix-torn file
    # the replace exists to prevent — process kills alone don't need
    # this, whole-system crashes do. These are small json state files;
    # one fsync is noise next to the work they journal.
    with open(tmp, "w") as f:
        f.write(text)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, p)
    # best-effort directory fsync so the rename itself survives a crash
    try:
        dfd = os.open(p.parent, os.O_RDONLY)
        try:
            os.fsync(dfd)
        finally:
            os.close(dfd)
    except OSError:
        pass  # not supported on this fs/platform — rename still atomic


def read_json_state(path: Path | str, label: str) -> dict:
    """Read a json state file with the tolerant semantics every engine
    state store shares: missing file → ``{}`` silently (fresh start);
    torn or unreadable file → ``{}`` with a printed warning naming the
    store, because these files are REDO-SKIP optimizations (table
    properties, fingerprint state) whose loss costs recomputation, never
    correctness. Stores whose content IS the work list (the backfill
    retry journal) must not use this — they need the strict/raising
    path so a torn file cannot read as "nothing to do"."""
    import json

    p = Path(path)
    try:
        return json.loads(p.read_text())
    except FileNotFoundError:
        return {}
    except (OSError, ValueError) as e:
        print(f"[{label}] state file {p} unreadable ({e}) — treating as empty")
        return {}


def atomic_rewrite_text(path: Path | str, text: str) -> None:
    """Atomic tmp+replace for USER source files (model .sql/.yml): never
    leaves a truncated file, RESOLVES symlinks first (the rewrite must
    land in the linked target — a bare replace would sever the link and
    orphan the real source), preserves the file's mode (a plain temp
    would reset group-writable sources to umask default), and skips
    ``atomic_write_text``'s fsyncs — git-tracked sources need
    never-truncated, not power-loss durability, and two fsyncs per file
    across a ref-rewrite loop over hundreds of models is real latency."""
    p = Path(path)
    real = p.resolve() if p.exists() else p
    mode = None
    try:
        mode = real.stat().st_mode
    except OSError:
        pass
    tmp = real.with_name(f"{real.name}.tmp.{os.getpid()}")
    tmp.write_text(text)
    if mode is not None:
        os.chmod(tmp, mode)
    os.replace(tmp, real)
