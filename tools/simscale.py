"""Permutation-sim scaling row: getis_gstar_sim at 10M rows, N vs 4N cores.

Evidences the round-4 bounded-pool redesign (VERDICT r3 item 3): with
``pool_size`` set, driver/broadcast state is O(pool) — the only collect is
the hash-ranked 512-value pool — so conditional-randomization inference
RUNS at 10M+ rows instead of OOMing on an O(n) value-vector broadcast, and
its exact output columns (gs, p_sim — integer-exact by construction) are
bit-identical across parallelism.

Protocol notes vs tools/scalebench.py: single timed run per core count
(runtimes are minutes, so the per-JVM warmup constant and this VM's
second-scale noise amortize away — unlike the second-scale flagship runs,
which need warmup + best-of-3), and the output digest is computed
DISTRIBUTED (bit_xor of xxhash64 over id/gs/p_sim) because collecting 10M
result rows to the driver would itself violate the point being proven.
z_sim is excluded from the digest: its pooled moments are corpus-wide
float sums, order-sensitive at the ulp (the catalog pins them at 6dp for
the oracle; across parallelism at 10M rows a boundary hit is possible and
meaningless).

Usage: python tools/simscale.py [N] [rows] [perms] [pool]
Prints one JSON line — record into BASELINE.md §4.
"""

from __future__ import annotations

import json
import subprocess
import sys

WORKER = r"""
import json, sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from crankshaft_spark import get_session
from crankshaft_spark.operators.getis import getis_gstar_sim

cpus = int(sys.argv[1]); rows = int(sys.argv[2])
perms = int(sys.argv[3]); pool = int(sys.argv[4])
spark = get_session(master=f"local[{cpus}]", app_name=f"simscale{cpus}",
                    shuffle_partitions=max(cpus, 16))
spark.sparkContext.setLogLevel("ERROR")
R = rows
ids = spark.range(1, R + 1).select(F.col("id"))
values = ids.select(
    "id", ((F.col("id") * 37) % 1000).cast("double").alias("value"))
# circular ring lattice, deg 4 — closed-form edges so the row count is the
# variable under test, not a kNN build (kNN scaling is its own bench row)
offs = [1, 2, R - 1, R - 2]
edges = ids.select("id", F.explode(F.array(
    *[(((F.col("id") - 1 + o) % R) + 1).alias("nbr") for o in offs]
)).alias("nbr"))
t0 = time.time()
res = getis_gstar_sim(values, edges, permutations=perms, seed=7,
                      pool_size=pool)
agg = res.agg(
    F.count("*").alias("n"),
    F.bit_xor(F.xxhash64(F.col("id"), F.round("gs", 9),
                         F.col("p_sim"))).alias("sig"),
).collect()[0]
dt = time.time() - t0
print(json.dumps({"cpus": cpus, "rows": int(agg["n"]),
                  "sec": round(dt, 3),
                  "rows_per_sec": round(int(agg["n"]) / dt, 1),
                  "sig": int(agg["sig"])}))
spark.stop()
"""


def run(cpus: int, rows: int, perms: int, pool: int) -> dict:
    try:
        out = subprocess.run(
            [sys.executable, "-c", WORKER, str(cpus), str(rows),
             str(perms), str(pool)],
            capture_output=True, text=True, check=True,
        )
    except subprocess.CalledProcessError as e:
        sys.stderr.write(e.stderr or "")
        raise
    lines = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
    if not lines:
        sys.stderr.write(out.stderr or "")
        raise RuntimeError(f"worker local[{cpus}] printed no result JSON")
    return json.loads(lines[-1])


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    rows = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000_000
    perms = int(sys.argv[3]) if len(sys.argv) > 3 else 9
    pool = int(sys.argv[4]) if len(sys.argv) > 4 else 512
    small = run(n, rows, perms, pool)
    big = run(4 * n, rows, perms, pool)
    eff = (big["rows_per_sec"] / small["rows_per_sec"]) / 4.0
    print(json.dumps({
        "metric": "getis_sim_scaling",
        "n_cores": n, "4n_cores": 4 * n,
        "rows": small["rows"], "permutations": perms, "pool": pool,
        "throughput_n": small["rows_per_sec"],
        "throughput_4n": big["rows_per_sec"],
        "sec_n": small["sec"], "sec_4n": big["sec"],
        "scaling_efficiency": round(eff, 3),
        "rows_identical": small["sig"] == big["sig"]
        and small["rows"] == big["rows"],
    }))


if __name__ == "__main__":
    main()
