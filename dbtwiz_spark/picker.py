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


def name_validator() -> Callable[[str], bool | str]:
    """Identifier validator (reference ui: dbtwiz/ui/interact.py:8-14):
    lowercase/digits/underscores, starting with a letter and not ending
    with an underscore. Returns True or the error message — the
    questionary validator calling convention, kept so wizard code reads
    the same either side."""
    return lambda s: (
        re.match(r"^[a-z][a-z0-9_]*[a-z0-9]$", s) is not None
        or "use lowercase letters, digits and underscores; start with a "
        "letter and do not end with an underscore"
    )


def dataset_name_validator() -> Callable[[str], bool | str]:
    """Dataset-name validator (reference ui/interact.py:17-25): the
    identifier rule, with INFORMATION_SCHEMA explicitly allowed."""
    base = name_validator()
    return lambda s: True if s == "INFORMATION_SCHEMA" else base(s)


def table_name_validator(dataset_name: str) -> Callable[[str], bool | str]:
    """Table-name validator (reference ui/interact.py:28-41): tables
    inside INFORMATION_SCHEMA are UPPERCASE identifiers; everywhere else
    the lowercase identifier rule applies."""
    if dataset_name == "INFORMATION_SCHEMA":
        return lambda s: (
            re.match(r"^[A-Z][A-Z0-9_]*[A-Z0-9]$", s) is not None
            or "use uppercase letters, digits and underscores; start with "
            "a letter and do not end with an underscore"
        )
    return name_validator()


def description_validator() -> Callable[[str], bool | str]:
    """Description validator (reference ui/interact.py:44-49): must not
    start with whitespace (i.e. begins with a non-space character)."""
    return lambda s: (
        re.match(r"^\S+", s) is not None
        or "the description must not start with a space"
    )


def input_text(
    question: str,
    allow_blank: bool = False,
    validate: Callable[[str], bool | str] | None = None,
    input_fn: Callable[[str], str] = input,
    print_fn: Callable[[str], None] = print,
) -> str | None:
    """Validated free-text prompt — the questionary ``input_text`` analog
    (reference ui/interact.py:52-61) on the same injectable IO as the
    pickers. Loops until the validator returns True (its message is
    printed otherwise); blank input re-prompts unless ``allow_blank``.
    The value is validated and returned AS TYPED (questionary semantics
    — stripping first would make description_validator's
    no-leading-whitespace rule unfalsifiable). EOF/interrupt aborts
    with None instead of the reference's fatal()."""
    while True:
        try:
            value = input_fn(f"{question}: ")
        except (EOFError, KeyboardInterrupt):
            return None
        if not value.strip():
            if allow_blank:
                return ""
            continue
        if validate is not None:
            verdict = validate(value)
            if verdict is not True:
                print_fn(str(verdict))
                continue
        return value


def confirm(
    question: str,
    default: bool = True,
    input_fn: Callable[[str], str] = input,
    print_fn: Callable[[str], None] = print,
) -> bool:
    """y/n confirmation (reference ui/interact.py:152-163). Empty input
    takes the default; EOF/interrupt answers False (abort-safe — the
    reference fatal()s, but a non-TTY caller here must never hang or
    die, it just declines)."""
    suffix = "[Y/n]" if default else "[y/N]"
    while True:
        try:
            raw = input_fn(f"{question} {suffix} ").strip().lower()
        except (EOFError, KeyboardInterrupt):
            return False
        if not raw:
            return default
        if raw in ("y", "yes"):
            return True
        if raw in ("n", "no"):
            return False
        print_fn("answer y or n")


def multiselect_from_choices(
    prompt: str,
    choices: dict[str, str],
    allow_none: bool = False,
    input_fn: Callable[[str], str] = input,
    print_fn: Callable[[str], None] = print,
) -> list[str] | None:
    """Numbered multi-select over a name→description vocabulary — the
    questionary ``multiselect_from_list`` analog (reference
    ui/interact.py:110-127 with the :89-106 validators): at least one
    item must be chosen, and when ``allow_none`` an exclusive 'n/a' row
    is offered whose selection returns None (the reference's signal for
    'not relevant'). Picks are space/comma-separated numbers or names."""
    names = list(choices)
    rows = (["n/a"] if allow_none else []) + names
    descs = {**choices, "n/a": "Not relevant"}
    while True:
        print_fn(prompt)
        for i, name in enumerate(rows, 1):
            desc = descs.get(name, "")
            print_fn(f"{i:3d}  {name}" + (f" — {desc}" if desc else ""))
        try:
            raw = input_fn("> ").strip()
        except (EOFError, KeyboardInterrupt):
            return None
        tokens = raw.replace(",", " ").split()
        picks: list[str] = []
        invalid: list[str] = []
        for t in tokens:
            if t.isdigit() and 0 < int(t) <= len(rows):
                picks.append(rows[int(t) - 1])
            elif t in rows:
                picks.append(t)
            else:
                invalid.append(t)
        if invalid:
            # A typo must not silently drop an item from the selection
            # (e.g. a misspelled service consumer vanishing from the
            # model's governance): name the bad tokens and re-prompt.
            print_fn(
                "unrecognized selection(s): " + ", ".join(invalid)
                + " — enter row numbers or exact names"
            )
            continue
        picks = list(dict.fromkeys(picks))  # dedupe, keep order
        if not picks:
            print_fn("you must select at least one item")
            continue
        if "n/a" in picks:
            if len(picks) > 1:
                print_fn("'n/a' cannot be selected along with other options")
                continue
            return None
        return picks


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
