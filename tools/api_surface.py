"""Public API surface snapshot + additive-only compatibility check.

The engine's analogue of the reference's release gate
(/root/reference/check-compatibility.sh:50-108): crankshaft snapshots the
deployed release's function signatures (name, result type, argument list)
into ``release_function_signatures``, installs the dev version, and fails
if any released signature was DROPPED or CHANGED — new functions are fine.

Here the released surface is ``tests/fixtures/api_surface.json``: every
public function in ``crankshaft_spark`` with its parameter list.  Running
``python tools/api_surface.py --write`` regenerates the manifest (do this
when deliberately cutting a release); ``tests/test_api_compat.py`` enforces
the same additive-only rule against it on every test run:

  * a recorded function may not disappear;
  * a recorded parameter may not be removed or renamed;
  * positional parameter ORDER is frozen (old positional calls must work);
  * a parameter that had a default may not lose it;
  * NEW parameters must carry defaults (old call sites stay valid).
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
#: import-time argparse wiring, and pycache dirs aren't modules at all.
_SKIP = ("crankshaft_spark.__main__",)


def _iter_modules():
    import crankshaft_spark

    yield crankshaft_spark
    for info in pkgutil.walk_packages(crankshaft_spark.__path__, "crankshaft_spark."):
        if info.name in _SKIP:
            continue
        yield importlib.import_module(info.name)


def public_surface() -> dict:
    """{qualified_name: [[param, kind, has_default], ...]} for every public
    function defined in the package (not re-exported from elsewhere)."""
    surface = {}
    for mod in _iter_modules():
        for name, obj in sorted(vars(mod).items()):
            if name.startswith("_") or not inspect.isfunction(obj):
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
        print(f"wrote {len(current)} public functions -> {MANIFEST}")
        return 0
    released = json.loads(MANIFEST.read_text())
    problems = compare(released, current)
    added = sorted(set(current) - set(released))
    print(f"released surface: {len(released)} functions; "
          f"current: {len(current)} ({len(added)} new)")
    for p in problems:
        print("INCOMPATIBLE:", p)
    return 1 if problems else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
