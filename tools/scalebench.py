"""Two-parallelism scaling benchmark (the north rule's N vs 4N criterion).

Runs the flagship hotspot pipeline on IDENTICAL input at local[N] and
local[4N] (default N=2, i.e. 2 vs 8 cores at 10M pages — the CLAUDE.md
protocol) in separate processes (a JVM can't change its master), verifies
the two runs produce row-identical output (the north rule's
cross-cluster-size determinism requirement), and reports throughput
at both plus scaling efficiency (throughput_4N / throughput_N) / 4.

Usage:  python tools/scalebench.py [N] [sf_dir] [mult] [skew]
``skew`` = mild (default) or zipf (geometric hosts — top host ~50% of
pages; proves the salted/two-level cellagg holds efficiency under the
north rule's Zipf-hot-cell shape).
Appends nothing; prints one JSON line — paste/record into BASELINE.md §4.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

WORKER = r"""
import hashlib, json, os, sys, time
sys.path.insert(0, "/root/repo")
from crankshaft_spark import get_session
from crankshaft_spark.plans.pipeline import hotspot_pipeline
from crankshaft_spark.sources.webpages import synth_webpages

cpus = int(sys.argv[1]); sf_dir = sys.argv[2]; mult = int(sys.argv[3])
skew = sys.argv[4]
spark = get_session(master=f"local[{cpus}]", app_name=f"scale{cpus}",
                    shuffle_partitions=max(cpus, 16))
spark.sparkContext.setLogLevel("ERROR")
pages = synth_webpages(spark, sf_dir, multiplier=mult, skew=skew)
n = pages.count()
# steady-state measurement: one untimed full-size run (JIT/codegen/AQE
# warmup — a per-JVM constant, not throughput), then best-of-3 timed
# runs (min filters out noisy-neighbor interference on shared vCPUs);
# same protocol at both core counts
hotspot_pipeline(spark, sf_dir, pages=pages).count()
dt = float("inf")
for _ in range(3):
    t0 = time.time()
    rows = hotspot_pipeline(spark, sf_dir, pages=pages).collect()
    dt = min(dt, time.time() - t0)
# content digest, NOT Python hash(): hash(None) (and hash(nan)) is
# id-based on 3.11 and varies PER PROCESS even under PYTHONHASHSEED=0,
# so bit-identical outputs containing SQL NULLs (isolated cells emit
# NULL z_score) would spuriously report rows_identical=false
sig = hashlib.md5(
    "\n".join(sorted(repr(tuple(r)) for r in rows)).encode()
).hexdigest()
print(json.dumps({"cpus": cpus, "pages": n, "sec": round(dt, 3),
                  "pages_per_sec": round(n / dt, 1), "rows": len(rows),
                  "result_hash": sig}))
spark.stop()
"""


def run(cpus: int, sf_dir: str, mult: int, skew: str) -> dict:
    try:
        out = subprocess.run(
            [sys.executable, "-c", WORKER, str(cpus), sf_dir, str(mult),
             skew],
            capture_output=True, text=True, check=True,
        )
    except subprocess.CalledProcessError as e:
        # surface the worker's Spark traceback — the bare exit code is
        # undiagnosable
        sys.stderr.write(e.stderr or "")
        raise
    lines = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
    if not lines:
        sys.stderr.write(out.stderr or "")
        raise RuntimeError(f"worker local[{cpus}] printed no result JSON")
    return json.loads(lines[-1])


def main() -> None:
    # defaults follow the repo's measurement protocol (CLAUDE.md):
    # N=2 vs 8 — fully subscribing this VM's 32 contention-noisy vCPUs
    # invalidates the ratio — and mult=2000 (10M pages), because fixed
    # overhead dominates the 500k default and understates efficiency
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    mult = int(sys.argv[3]) if len(sys.argv) > 3 else 2000
    skew = sys.argv[4] if len(sys.argv) > 4 else "mild"
    small = run(n, sf_dir, mult, skew)
    big = run(4 * n, sf_dir, mult, skew)
    eff = (big["pages_per_sec"] / small["pages_per_sec"]) / 4.0
    print(json.dumps({
        "metric": "hotspot_pipeline_scaling",
        "n_cores": n, "4n_cores": 4 * n,
        "pages": small["pages"],
        "throughput_n": small["pages_per_sec"],
        "throughput_4n": big["pages_per_sec"],
        "sec_n": small["sec"], "sec_4n": big["sec"],
        "scaling_efficiency": round(eff, 3),
        "rows_identical": small["result_hash"] == big["result_hash"]
        and small["rows"] == big["rows"],
        "sf_dir": sf_dir, "mult": mult, "skew": skew,
    }))


if __name__ == "__main__":
    main()
