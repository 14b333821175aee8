"""Public API surface: one manifest, two gates (release compat + drift).

The engine's analogue of the reference's release gate
(/root/reference/check-compatibility.sh:50-108): crankshaft snapshots the
deployed release's function signatures (name, result type, argument list)
into ``release_function_signatures``, installs the dev version, and fails
if any released signature was DROPPED or CHANGED — new functions are fine.

Here the surface is ``tests/fixtures/api_surface.json``: every public
function and class in ``crankshaft_spark`` with its structured parameter
list.  ``tests/test_api_compat.py`` enforces TWO rules against it on every
test run:

1. **Release compatibility** (the check-compatibility.sh semantic,
   additive-only):

   * a recorded callable may not disappear;
   * a recorded parameter may not be removed or renamed;
   * positional parameter ORDER is frozen (old positional calls must work);
   * a parameter that had a default may not lose it;
   * NEW parameters must carry defaults (old call sites stay valid).

2. **Drift sync** (exact): the live tree must equal the manifest, so even a
   pure addition is a deliberate, reviewed diff of the manifest — regenerate
   with ``python tools/api_surface.py --write``.

(Consolidates the former tools/api_manifest.py exact-drift harness and this
additive-only checker into one tool over one manifest.)
"""

from __future__ import annotations

import importlib
import inspect
import json
import pkgutil
import sys
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
if str(_REPO) not in sys.path:  # runnable from any cwd, like the other tools
    sys.path.insert(0, str(_REPO))

MANIFEST = _REPO / "tests" / "fixtures" / "api_surface.json"

#: modules never part of the public surface: the spark-submit script has
#: import-time argparse wiring; the round-driver catalog's contract
#: (queries()/oracle_sql()) is exercised by the driver itself, not callers.
_SKIP = (
    "crankshaft_spark.__main__",
    "crankshaft_spark.plans.driver_queries",
)


def _iter_modules():
    import crankshaft_spark

    yield crankshaft_spark
    for info in pkgutil.walk_packages(crankshaft_spark.__path__, "crankshaft_spark."):
        if info.name in _SKIP:
            continue
        yield importlib.import_module(info.name)


def public_surface() -> dict:
    """{qualified_name: [[param, kind, has_default], ...]} for every public
    function and class defined in the package (not re-exported from
    elsewhere); a class is recorded by its constructor parameters."""
    surface = {}
    for mod in _iter_modules():
        for name, obj in sorted(vars(mod).items()):
            if name.startswith("_") or not (
                    inspect.isfunction(obj) or inspect.isclass(obj)):
                continue
            if obj.__module__ != mod.__name__:
                continue  # re-export; recorded under its defining module
            try:
                sig = inspect.signature(obj)
            except (TypeError, ValueError):  # pragma: no cover
                continue
            surface[f"{mod.__name__}.{name}"] = [
                [p.name, p.kind.name, p.default is not inspect.Parameter.empty]
                for p in sig.parameters.values()
            ]
    return surface


def drift(released: dict, current: dict) -> list[str]:
    """Exact-sync differences in both directions (empty = manifest current)."""
    lines = []
    for k in sorted(set(released) - set(current)):
        lines.append(f"REMOVED  {k}")
    for k in sorted(set(current) - set(released)):
        lines.append(f"ADDED    {k}")
    for k in sorted(set(released) & set(current)):
        if released[k] != current[k]:
            lines.append(f"CHANGED  {k}: {released[k]} -> {current[k]}")
    return lines


def compare(released: dict, current: dict) -> list[str]:
    """Backwards-incompatibilities of `current` vs `released` (empty = OK).

    Mirrors check-compatibility.sh's join on (name, arguments): dropped or
    signature-changed released functions fail; additions pass silently.
    """
    problems = []
    for fn, old_params in released.items():
        if fn not in current:
            problems.append(f"{fn}: dropped from the public surface")
            continue
        new_params = current[fn]
        new_by_name = {p[0]: p for p in new_params}
        for pname, _kind, had_default in old_params:
            if pname not in new_by_name:
                problems.append(f"{fn}: parameter '{pname}' removed/renamed")
            elif had_default and not new_by_name[pname][2]:
                problems.append(f"{fn}: parameter '{pname}' lost its default")
        old_names = {p[0] for p in old_params}
        old_pos = [p[0] for p in old_params if p[1] == "POSITIONAL_OR_KEYWORD"]
        new_pos = [p[0] for p in new_params if p[1] == "POSITIONAL_OR_KEYWORD"]
        shared_pos = [n for n in new_pos if n in old_names]
        if shared_pos != [n for n in old_pos if n in new_by_name]:
            problems.append(f"{fn}: positional parameter order changed "
                            f"({old_pos} -> {new_pos})")
        for pname, _kind, has_default in new_params:
            if pname not in old_names and not has_default and _kind not in (
                    "VAR_POSITIONAL", "VAR_KEYWORD"):
                problems.append(f"{fn}: new required parameter '{pname}' "
                                "breaks existing call sites (add a default)")
    return problems


def main(argv: list[str]) -> int:
    current = public_surface()
    if "--write" in argv:
        MANIFEST.write_text(json.dumps(current, indent=1, sort_keys=True) + "\n")
        print(f"wrote {len(current)} public callables -> {MANIFEST}")
        return 0
    released = json.loads(MANIFEST.read_text())
    problems = compare(released, current)
    drifts = drift(released, current)
    print(f"manifest surface: {len(released)} callables; "
          f"current: {len(current)}")
    for p in problems:
        print("INCOMPATIBLE:", p)
    for d in drifts:
        print("DRIFT:", d)
    return 1 if problems or drifts else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
