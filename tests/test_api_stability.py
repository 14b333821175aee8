"""Public-API stability: the live tree must match tools/api_manifest.json.

Engine-native analogue of the reference's signature-compatibility harness
(/root/reference/check-compatibility.sh:1-60): any add/remove/signature
change of a public callable must come with a regenerated manifest
(`python tools/api_manifest.py --write`), making API drift a reviewed
diff instead of a silent break.
"""

from __future__ import annotations

import json
import os
import sys

TOOLS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "tools")


def test_public_api_matches_manifest():
    sys.path.insert(0, TOOLS)
    try:
        import api_manifest
    finally:
        sys.path.remove(TOOLS)
    with open(api_manifest.MANIFEST) as fh:
        recorded = json.load(fh)
    live = api_manifest.snapshot()
    drift = api_manifest.diff(recorded, live)
    assert not drift, (
        "public API drifted from tools/api_manifest.json — if intended, "
        "run `python tools/api_manifest.py --write`:\n" + "\n".join(drift)
    )
