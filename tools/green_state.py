#!/usr/bin/env python
"""Machine-checked stale-green guard (PARITY.md "Correctness rotation").

The driver's correctness gate verifies the FIRST 50 entries of
``queries()`` each round. The round-5 verdict flagged the failure mode
this tool closes: operator or oracle code changes AFTER a query's last
driver-green row, and the rotation (ordered by green-row age alone)
leaves the changed query outside the next window — so its green row
predates the code it supposedly validates.

Mechanism: every declared query gets a SOURCE FINGERPRINT —
sha256 over (query function source, its oracle SQL, and the source of
every engine module transitively imported by any of those, resolved
from real import statements). ``green_state.json`` records each query's
fingerprint as of its last driver-green round. The guard (run as
``tests/test_green_state.py`` and ``python tools/green_state.py
--check``) fails when a query's CURRENT fingerprint differs from its
recorded one but the query is NOT scheduled in the first
``WINDOW_SIZE`` entries of ``QUERIES`` — i.e. "changed since last
green" MUST imply "verified next round".

After the driver records a new CORRECTNESS_r{N}.json, run
``python tools/green_state.py --update`` to fold the new green rows
(and the fingerprints they validated) into the state file.
"""

from __future__ import annotations

import glob
import hashlib
import importlib
import inspect
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
STATE_PATH = os.path.join(REPO, "tools", "green_state.json")
PKG = "ml_hadoop_experiment_spark"
WINDOW_SIZE = 50

_IMPORT_RE = re.compile(
    r"^\s*(?:from\s+([.\w]+)\s+import|import\s+([.\w]+))", re.MULTILINE
)


def _engine_modules_in_source(src: str, package: str) -> set:
    """Module names under the engine package imported by ``src``,
    resolving relative imports against ``package`` (the importing
    module's package)."""
    found = set()
    for m in _IMPORT_RE.finditer(src):
        name = m.group(1) or m.group(2)
        if name.startswith("."):
            dots = len(name) - len(name.lstrip("."))
            base = package.split(".")
            base = base[: len(base) - (dots - 1)] if dots > 1 else base
            rest = name.lstrip(".")
            name = ".".join(base + ([rest] if rest else []))
        if name.startswith(PKG):
            found.add(name)
    return found


def _module_source(modname: str):
    try:
        mod = importlib.import_module(modname)
        path = getattr(mod, "__file__", None)
        if path and path.endswith(".py"):
            with open(path, "r") as f:
                return f.read(), mod.__package__ or modname.rsplit(".", 1)[0]
    except Exception:
        pass
    return None, None


def _closure(seed_sources):
    """BFS the engine-module import closure. ``seed_sources`` is a list
    of (source_text, package_context) pairs; returns sorted module
    names reached plus their sources."""
    seen = {}
    frontier = []
    for src, pkg in seed_sources:
        frontier.extend((m, None) for m in _engine_modules_in_source(src, pkg))
    while frontier:
        modname, _ = frontier.pop()
        if modname in seen:
            continue
        src, pkg = _module_source(modname)
        if src is None:
            continue
        seen[modname] = src
        frontier.extend(
            (m, None) for m in _engine_modules_in_source(src, pkg)
        )
    return seen


def _referenced_engine_deps(fn):
    """(extra_module_names, helper_sources) for globals the query
    function references that were imported at MODULE level — a
    function-body-import scan alone misses ``simhash(...)`` when the
    name came from the queries package's top-level imports. Objects
    defined in the queries package itself (helpers like ``_t``)
    contribute their own source
    rather than the whole module (which would couple every query to
    every other)."""
    import types

    mods, helper_srcs = set(), []
    for name in fn.__code__.co_names:
        obj = fn.__globals__.get(name)
        if obj is None:
            continue
        if isinstance(obj, types.ModuleType):
            if obj.__name__.startswith(PKG):
                mods.add(obj.__name__)
            continue
        owner = getattr(obj, "__module__", None)
        if not owner or not owner.startswith(PKG):
            continue
        if owner == f"{PKG}.queries" or owner.startswith(
            f"{PKG}.queries."
        ):
            # helpers that live in the queries module/package contribute
            # their own SOURCE, not their whole module — otherwise every
            # query would couple to every other (and a pure
            # file-reorganization of the queries package would
            # re-fingerprint all of them)
            try:
                helper_srcs.append(inspect.getsource(obj))
            except (TypeError, OSError):
                pass
        else:
            mods.add(owner)
    return mods, helper_srcs


def fingerprints() -> dict:
    """{query_name: sha256 hex} over (fn source, oracle SQL, referenced
    queries-package helper sources, transitive engine-module sources —
    seeded from both function-body imports and module-level imports the
    function actually references)."""
    from ml_hadoop_experiment_spark.queries import ORACLE_SQL, QUERIES

    out = {}
    for name, fn in QUERIES.items():
        fn_src = inspect.getsource(fn)
        sql = ORACLE_SQL.get(name, "")
        ref_mods, helper_srcs = _referenced_engine_deps(fn)
        seeds = [(fn_src, f"{PKG}.queries")]
        seeds += [(src, f"{PKG}.queries") for src in helper_srcs]
        # seed the BFS with the module-level-imported deps too
        seeds += [
            (f"from {m} import _", f"{PKG}.queries") for m in sorted(ref_mods)
        ]
        mods = _closure(seeds)
        h = hashlib.sha256()
        h.update(fn_src.encode())
        h.update(sql.encode())
        for src in helper_srcs:
            h.update(src.encode())
        for modname in sorted(mods):
            h.update(modname.encode())
            h.update(mods[modname].encode())
        out[name] = h.hexdigest()
    return out


def _latest_green_rounds() -> dict:
    """{query: newest round number with a green row} from the
    CORRECTNESS_r*.json history."""
    greens = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"_r(\d+)", path).group(1))
        try:
            data = json.load(open(path))
        except Exception:
            continue
        for q, row in data.items():
            if (
                isinstance(row, dict)
                and row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match") is not False
                and not row.get("err")
            ):
                greens[q] = max(greens.get(q, 0), rnd)
    return greens


def load_state() -> dict:
    if os.path.exists(STATE_PATH):
        return json.load(open(STATE_PATH))
    return {}


def check(state=None, fps=None):
    """Violations of the rotation policy.

    - A CHANGED query (recorded green fingerprint differs from current)
      outside the next window is ALWAYS a violation: its green row
      predates its code.
    - A NEW query (no recorded green at all) outside the window is a
      violation only while the window still holds an unchanged,
      already-green query — i.e. new queries may overflow ONLY when the
      window is saturated by changed+new entries (changed rows are
      misleading evidence and outrank no-evidence; the local parity
      replica still gates every new query each round, and overflowed
      new queries sit first in line for the next window).
    """
    from ml_hadoop_experiment_spark.queries import QUERIES

    state = state if state is not None else load_state()
    fps = fps or fingerprints()
    names = list(QUERIES)
    window = set(names[:WINDOW_SIZE])
    window_has_unchanged = any(
        n in state and state[n].get("fingerprint") == fps.get(n)
        for n in names[:WINDOW_SIZE]
    )
    violations = []
    for name, fp in fps.items():
        rec = state.get(name)
        if rec is None:
            if name not in window and window_has_unchanged:
                violations.append(name)
        elif rec.get("fingerprint") != fp and name not in window:
            violations.append(name)
    return sorted(violations)


def update():
    """Fold the newest CORRECTNESS round's green rows into the state:
    a query green in round N with its CURRENT source is recorded at its
    current fingerprint. Only run this right after a driver round,
    before further code edits."""
    state = load_state()
    fps = fingerprints()
    greens = _latest_green_rounds()
    newest = max(greens.values(), default=0)
    for name, rnd in greens.items():
        if rnd == newest and name in fps:
            state[name] = {"fingerprint": fps[name], "round": rnd}
    with open(STATE_PATH, "w") as f:
        json.dump(dict(sorted(state.items())), f, indent=1, sort_keys=True)
    return state


def main() -> int:
    if "--update" in sys.argv:
        state = update()
        print(f"recorded {len(state)} query fingerprints -> {STATE_PATH}")
        return 0
    bad = check()
    if bad:
        print(
            "STALE-GREEN VIOLATION: these queries changed since their last "
            f"driver-green row but are NOT in the next {WINDOW_SIZE}-entry "
            "driver window (reorder QUERIES in "
            "ml_hadoop_experiment_spark/queries/__init__.py):"
        )
        for name in bad:
            print(f"  - {name}")
        return 1
    print("green-state check OK: every changed query is scheduled next round")
    return 0


if __name__ == "__main__":
    sys.path.insert(0, REPO)
    sys.exit(main())
