"""Public-API gates: additive-only release compat + exact drift sync.

Analogue of the reference's release compatibility check
(/root/reference/check-compatibility.sh:50-108): the recorded callable
signatures live in tests/fixtures/api_surface.json; the dev tree may ADD
functions/parameters-with-defaults but never drop or reshape recorded ones
(release gate), and even additions must land as a reviewed manifest diff
(drift gate) — regenerate with ``python tools/api_surface.py --write``.
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

import api_surface  # noqa: E402


def test_surface_is_backwards_compatible():
    released = json.loads(api_surface.MANIFEST.read_text())
    current = api_surface.public_surface()
    assert released, "manifest missing/empty — run tools/api_surface.py --write"
    problems = api_surface.compare(released, current)
    assert not problems, "\n".join(problems)


def test_surface_is_in_sync():
    released = json.loads(api_surface.MANIFEST.read_text())
    drifts = api_surface.drift(released, api_surface.public_surface())
    assert not drifts, (
        "public API drifted from tests/fixtures/api_surface.json — if "
        "intended, run `python tools/api_surface.py --write`:\n"
        + "\n".join(drifts)
    )


def test_compare_flags_breaks():
    """The checker itself must catch each class of break it claims to."""
    old = {
        "m.f": [["df", "POSITIONAL_OR_KEYWORD", False],
                ["k", "POSITIONAL_OR_KEYWORD", True]],
        "m.g": [["x", "POSITIONAL_OR_KEYWORD", False]],
    }
    # identical -> clean
    assert api_surface.compare(old, json.loads(json.dumps(old))) == []
    # dropped function
    assert any("dropped" in p for p in api_surface.compare(old, {"m.f": old["m.f"]}))
    # removed parameter
    bad = {"m.f": [["df", "POSITIONAL_OR_KEYWORD", False]], "m.g": old["m.g"]}
    assert any("removed" in p for p in api_surface.compare(old, bad))
    # lost default
    bad = {"m.f": [["df", "POSITIONAL_OR_KEYWORD", False],
                   ["k", "POSITIONAL_OR_KEYWORD", False]], "m.g": old["m.g"]}
    assert any("lost its default" in p for p in api_surface.compare(old, bad))
    # new required parameter
    bad = {"m.f": old["m.f"],
           "m.g": [["x", "POSITIONAL_OR_KEYWORD", False],
                   ["y", "POSITIONAL_OR_KEYWORD", False]]}
    assert any("new required" in p for p in api_surface.compare(old, bad))
    # positional reorder
    bad = {"m.f": [["k", "POSITIONAL_OR_KEYWORD", True],
                   ["df", "POSITIONAL_OR_KEYWORD", False]], "m.g": old["m.g"]}
    assert any("order changed" in p for p in api_surface.compare(old, bad))
    # pure addition (new fn + new defaulted param) -> clean
    ok = {"m.f": old["m.f"] + [["mode", "KEYWORD_ONLY", True]],
          "m.g": old["m.g"], "m.h": [["z", "POSITIONAL_OR_KEYWORD", False]]}
    assert api_surface.compare(old, ok) == []
