"""Public API manifest: snapshot + diff of every public function signature.

The reference ships a compatibility harness that diffs its SQL function
signatures across versions so releases cannot silently break callers
(/root/reference/check-compatibility.sh:1-60).  This is the engine-native
analogue: every public (non-underscore) callable in the crankshaft_spark
packages is recorded as ``module.name(signature)`` in
``tools/api_manifest.json``; tests/test_api_stability.py fails when the
live tree drifts from the manifest, so an API change is always a
deliberate, reviewed diff of this file.

Usage:
  python tools/api_manifest.py           # print drift, exit 1 if any
  python tools/api_manifest.py --write   # regenerate the manifest
"""

from __future__ import annotations

import importlib
import inspect
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# walked from the package so a new module can never silently escape the
# gate; only deliberate non-API modules are excluded
EXCLUDE = {
    "crankshaft_spark.__main__",        # spark-submit entry, not a library
    "crankshaft_spark.plans.driver_queries",  # round-driver catalog: its
    # contract (queries()/oracle_sql()) is exercised by the driver itself
}


def _modules() -> list[str]:
    import pkgutil

    import crankshaft_spark

    names = ["crankshaft_spark"]
    for info in pkgutil.walk_packages(crankshaft_spark.__path__,
                                      prefix="crankshaft_spark."):
        names.append(info.name)
    return sorted(n for n in names if n not in EXCLUDE)

MANIFEST = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "api_manifest.json")


def snapshot() -> dict[str, str]:
    out: dict[str, str] = {}
    for modname in _modules():
        mod = importlib.import_module(modname)
        for name, obj in sorted(vars(mod).items()):
            if name.startswith("_"):
                continue
            if not (inspect.isfunction(obj) or inspect.isclass(obj)):
                continue
            if getattr(obj, "__module__", None) != modname:
                continue  # re-exports belong to their defining module
            try:
                sig = str(inspect.signature(obj))
            except (TypeError, ValueError):
                sig = "(...)"
            out[f"{modname}.{name}"] = sig
    return out


def diff(old: dict[str, str], new: dict[str, str]) -> list[str]:
    lines = []
    for k in sorted(set(old) - set(new)):
        lines.append(f"REMOVED  {k}{old[k]}")
    for k in sorted(set(new) - set(old)):
        lines.append(f"ADDED    {k}{new[k]}")
    for k in sorted(set(old) & set(new)):
        if old[k] != new[k]:
            lines.append(f"CHANGED  {k}: {old[k]} -> {new[k]}")
    return lines


def main() -> None:
    new = snapshot()
    if "--write" in sys.argv:
        with open(MANIFEST, "w") as fh:
            json.dump(new, fh, indent=1, sort_keys=True)
            fh.write("\n")
        print(f"wrote {MANIFEST} ({len(new)} symbols)")
        return
    with open(MANIFEST) as fh:
        old = json.load(fh)
    lines = diff(old, new)
    for ln in lines:
        print(ln)
    print(f"{len(lines)} drift(s) across {len(new)} public symbols")
    sys.exit(1 if lines else 0)


if __name__ == "__main__":
    main()
