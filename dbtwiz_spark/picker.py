"""Interactive fuzzy model picker.

The reference lets the user pick models with fzf when the select string
is not directly resolvable (dbtwiz/dbt/manifest.py:173-199 choose_models,
:201-210 can_select_directly). It shells out to ``iterfzf``; this engine
ships a dependency-free equivalent: the same subsequence fuzzy filter fzf
applies, a ranked numbered candidate list, multi-select, and query
refinement — all driven through injectable IO so the flow is unit-testable
and degrades cleanly to an error on a non-TTY (CI, cron, driver runs).
"""

from __future__ import annotations

import re
import sys
from typing import Callable, Iterable

# select strings passed straight to the selector grammar: an exact model
# name, or anything with selector syntax (tag:, +graph, *, unions)
_DIRECT_RE = re.compile(r"[:+*, ]")


def can_select_directly(select: str, model_names: Iterable[str]) -> bool:
    """True when ``select`` should skip the picker (reference :201-210)."""
    return select in set(model_names) or _DIRECT_RE.search(select) is not None


def _subseq_spans(query: str, name: str) -> list[int] | None:
    """Positions where ``query``'s chars match in ``name`` as a subsequence
    (greedy left-to-right, case-insensitive), or None if no match."""
    q, n = query.lower(), name.lower()
    out, i = [], 0
    for ch in q:
        i = n.find(ch, i)
        if i < 0:
            return None
        out.append(i)
        i += 1
    return out


def fuzzy_rank(query: str, names: Iterable[str]) -> list[str]:
    """Filter to subsequence matches and rank fzf-style: fewer gaps first
    (contiguous matches beat scattered ones), then earlier first match,
    then shorter name, then lexicographic — fully deterministic."""
    if not query:
        return sorted(names)
    scored = []
    for name in names:
        spans = _subseq_spans(query, name)
        if spans is None:
            continue
        gaps = sum(1 for a, b in zip(spans, spans[1:]) if b != a + 1)
        scored.append(((gaps, spans[0], len(name), name), name))
    return [name for _, name in sorted(scored)]


def choose_models(
    model_names: Iterable[str],
    query: str = "",
    multi: bool = True,
    input_fn: Callable[[str], str] = input,
    print_fn: Callable[[str], None] = print,
    max_shown: int = 20,
) -> list[str] | None:
    """Interactive loop: show the fuzzy-ranked candidates, let the user
    either type numbers to pick (``1`` / ``1 3 5`` when ``multi``), press
    enter to take a sole remaining candidate, type new text to refine the
    query, or ``q`` to abort. Returns the chosen names, or None on abort /
    no match. Callers must gate on a TTY (see pick_interactively)."""
    names = list(model_names)
    while True:
        ranked = fuzzy_rank(query, names)
        if not ranked:
            print_fn(f"no models match {query!r} — type a new query or q to quit")
        for i, name in enumerate(ranked[:max_shown], 1):
            print_fn(f"{i:3d}  {name}")
        if len(ranked) > max_shown:
            print_fn(f"     … {len(ranked) - max_shown} more (refine the query)")
        try:
            raw = input_fn(f"select models [{query}] > ").strip()
        except (EOFError, KeyboardInterrupt):
            return None
        if raw.lower() == "q":
            return None
        if not raw:
            if len(ranked) == 1:
                return ranked[:1]
            continue
        tokens = raw.replace(",", " ").split()
        if all(t.isdigit() for t in tokens):
            picks = [ranked[int(t) - 1] for t in tokens if 0 < int(t) <= len(ranked)]
            if not picks:
                continue
            return picks if multi else picks[:1]
        query = raw


def pick_interactively(
    select: str, model_names: Iterable[str], multi: bool = True
) -> list[str] | None:
    """TTY-gated entry point used by the CLI: returns None when stdin is
    not a terminal (headless runs must fail fast on an unknown selector,
    never hang waiting for input)."""
    if not sys.stdin.isatty():
        return None
    return choose_models(model_names, query=select, multi=multi)


def select_from_choices(
    prompt: str,
    choices: dict[str, str],
    allow_none: bool = False,
    input_fn: Callable[[str], str] = input,
    print_fn: Callable[[str], None] = print,
) -> str | None:
    """Numbered single-select over a name→description vocabulary — the
    questionary ``select_from_list`` analog the governance wizard uses
    (reference UI: dbtwiz/ui/interact.py via model/create.py:132-230),
    driven through the same injectable IO as ``choose_models`` so the flow
    is unit-testable and never blocks a non-TTY. Enter on an empty line
    picks nothing when ``allow_none``; a typed name is accepted directly
    if it is a valid choice."""
    names = list(choices)
    while True:
        print_fn(prompt)
        for i, name in enumerate(names, 1):
            desc = choices[name]
            print_fn(f"{i:3d}  {name}" + (f" — {desc}" if desc else ""))
        try:
            raw = input_fn("> ").strip()
        except (EOFError, KeyboardInterrupt):
            return None
        if not raw:
            if allow_none:
                return None
            continue
        if raw.isdigit() and 0 < int(raw) <= len(names):
            return names[int(raw) - 1]
        if raw in choices:
            return raw
        print_fn(f"invalid choice {raw!r}")
