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

MODULES = [
    "crankshaft_spark",
    "crankshaft_spark.functions.cells",
    "crankshaft_spark.functions.distance",
    "crankshaft_spark.functions.geom",
    "crankshaft_spark.functions.spread",
    "crankshaft_spark.operators.ann",
    "crankshaft_spark.operators.binning",
    "crankshaft_spark.operators.contour",
    "crankshaft_spark.operators.dedup",
    "crankshaft_spark.operators.geometry",
    "crankshaft_spark.operators.getis",
    "crankshaft_spark.operators.gravity",
    "crankshaft_spark.operators.grid",
    "crankshaft_spark.operators.gwr",
    "crankshaft_spark.operators.interpolation",
    "crankshaft_spark.operators.kmeans",
    "crankshaft_spark.operators.knn",
    "crankshaft_spark.operators.markov",
    "crankshaft_spark.operators.moran",
    "crankshaft_spark.operators.multimodal",
    "crankshaft_spark.operators.outliers",
    "crankshaft_spark.operators.pip",
    "crankshaft_spark.operators.segmentation",
    "crankshaft_spark.operators.skew",
    "crankshaft_spark.operators.text",
    "crankshaft_spark.operators.weighted_mean",
    "crankshaft_spark.operators.weights",
    "crankshaft_spark.plans.checkpoint",
    "crankshaft_spark.plans.pipeline",
    "crankshaft_spark.sources.admin",
    "crankshaft_spark.sources.derived",
    "crankshaft_spark.sources.webpages",
    "crankshaft_spark.streaming.ingest",
    "crankshaft_spark.streaming.sessions",
]

MANIFEST = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "api_manifest.json")


def snapshot() -> dict[str, str]:
    out: dict[str, str] = {}
    for modname in MODULES:
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
