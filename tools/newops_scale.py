"""Round-4 new-operator scaling rows: kde_grid / dbscan at 10M points,
N vs 4N cores.

Evidences the north rule's two-cluster-size criterion on the round-4
surface additions, same protocol as tools/simscale.py: closed-form
synthetic points from spark.range (the row count is the variable under
test), one FULL-SIZE UNTIMED WARMUP then one timed run per core count
(first measurement of the late-r4 fast ops showed the ~15-20 s per-JVM
cold constant — codegen JIT + shuffle infra — eating the ratio: dwithin
47.7 s cold vs 15 s warm on the same input; the round-2 warmup lesson
applies to every op whose timed run is under ~2 min), output digest
computed DISTRIBUTED (bit_xor of
xxhash64 over exact-integer output columns — collecting 10M rows to the
driver would violate the point), rows-identical asserted across the two
parallelism levels.

Coordinates are xxhash64-derived (uniform Poisson sprinkle): a linear
congruence pair like the catalog's (id*9973 % 30000, id*7919 % 20000)
has joint period lcm(30000,20000)=60k, so 10M rows would stack ~167
EXACT copies per location — degenerate density for dbscan and a trivial
agg for kde.  Hash coords keep the workload honest; determinism across
the two runs is all this tool needs (no DuckDB oracle here — the
catalog entry covers value parity).

kde: 3000x2000-cell frame (support ring R=1 — 9 exploded cells/point,
map-side combined); kde is seconds-cheap per 10M rows, so default it to
100M rows or overhead dominates the ratio (the round-2 input-size
lesson).
dbscan: eps=10, min_pts=3 on a 10000x6000-CELL frame (100000x60000
coordinate units) — ~0.17 points per eps-cell at 10M rows, i.e. BELOW
continuum-percolation density, the regime DBSCAN is used in (bounded
clusters + noise).  The first cut of this tool reused kde's 3000x2000
frame: 1.7 pts/cell is SUPER-critical — one giant spanning cluster,
~150M candidate pairs and a label-prop round count bounded by the
component diameter — a 50-minute 2-core wall that measures a workload
nobody runs.  Density, not row count, is dbscan's scale axis: hold
pts/cell fixed when varying rows.

Late-r4 ops (same protocol):
  dwithin: radius-5 pairs at sub-critical density (the dbscan frame) —
    the join+window shape under test, rank determinism asserted by sig.
  tileclip: hashed triangles (legs up to 40 units) cut into a 100-unit
    tile grid — the interpreted S-H fold is the per-row cost driver;
    sig hashes the exact-double areas (bit-identity across layouts).
  pagerank: 65536-host link graph from hashed page->host assignment,
    host_links(n_hosts=65536) + 5 fixed-point rounds — per-round
    shuffle O(edges); BIGINT ranks hash exactly.
  hits: the same 65536-host graph, 5 full auth/hub rounds with
    max-normalization — two O(edges) joins per round.
  bm25: hashed 20-token docs over a 1000-term vocabulary, 5 fixed
    queries — inverted-index join + per-query top-k at corpus scale.

Usage: python tools/newops_scale.py [op kde|dbscan|dwithin|tileclip|pagerank|hits|bm25] [N] [rows]
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

op = sys.argv[1]; cpus = int(sys.argv[2]); rows = int(sys.argv[3])
spark = get_session(master=f"local[{cpus}]", app_name=f"nos{op}{cpus}",
                    shuffle_partitions=max(cpus, 16))
spark.sparkContext.setLogLevel("ERROR")
W, H = (30000, 20000) if op == "kde" else (100000, 60000)
pts = spark.range(1, rows + 1).select(
    F.col("id"),
    F.pmod(F.xxhash64("id"), F.lit(W)).cast("double").alias("x"),
    F.pmod(F.xxhash64("id", F.lit(1)), F.lit(H)).cast("double").alias("y"))
def measure():
    t0 = time.time()
    agg = build()
    return agg, time.time() - t0

if op == "dwithin":
    from crankshaft_spark.operators.knn import within_distance
    def build():
        return within_distance(pts, 5.0).agg(
            F.count("*").alias("n"),
            F.bit_xor(F.xxhash64("id", "nbr", "rank", "d2")).alias("sig"),
        ).collect()[0]
elif op == "tileclip":
    from crankshaft_spark.operators.geometry import tile_clip
    tris = pts.select(
        F.col("id").alias("poly_id"),
        F.array(F.col("x"), F.col("x")
                + F.pmod(F.xxhash64("id", F.lit(2)), F.lit(40)).cast("double")
                + 1.0, F.col("x") + 7.0).alias("xs"),
        F.array(F.col("y"), F.col("y"), F.col("y")
                + F.pmod(F.xxhash64("id", F.lit(3)), F.lit(40)).cast("double")
                + 1.0).alias("ys"))
    def build():
        return tile_clip(tris, tile_size=100.0).agg(
            F.count("*").alias("n"),
            F.bit_xor(F.xxhash64("poly_id", "tx", "ty", "nvert", "area")).alias("sig"),
        ).collect()[0]
elif op == "pagerank":
    from crankshaft_spark.operators.graph import host_links, pagerank_fp
    pages = spark.range(1, rows + 1).select(
        F.col("id").alias("page_id"),
        F.pmod(F.xxhash64("id", F.lit(4)), F.lit(65536)).alias("host_id"))
    def build():
        return pagerank_fp(host_links(pages, n_hosts=65536), iters=5).agg(
            F.count("*").alias("n"),
            F.bit_xor(F.xxhash64("host", "rank_fp")).alias("sig"),
        ).collect()[0]
elif op == "hits":
    from crankshaft_spark.operators.graph import hits_fp, host_links
    pages = spark.range(1, rows + 1).select(
        F.col("id").alias("page_id"),
        F.pmod(F.xxhash64("id", F.lit(4)), F.lit(65536)).alias("host_id"))
    def build():
        return hits_fp(host_links(pages, n_hosts=65536), iters=5).agg(
            F.count("*").alias("n"),
            F.bit_xor(F.xxhash64("host", "auth_fp", "hub_fp")).alias("sig"),
        ).collect()[0]
elif op == "bm25":
    from crankshaft_spark.operators.text import bm25_topk
    docs = spark.range(1, rows + 1).select(
        F.col("id").alias("doc_id"),
        F.expr("array_join(transform(sequence(1, 20), j -> "
               "concat('t', pmod(xxhash64(id, j), 1000))), ' ')").alias("text"))
    queries = spark.createDataFrame(
        [(f"q{i}", " ".join(f"t{(i * 97 + j * 131) % 1000}" for j in range(4)))
         for i in range(5)], "qid string, qtext string")
    def build():
        return bm25_topk(docs, queries, topk=20).agg(
            F.count("*").alias("n"),
            F.bit_xor(F.xxhash64("qid", "rank", "doc_id", "score_fp")).alias("sig"),
        ).collect()[0]
elif op == "kde":
    from crankshaft_spark.operators.grid import kde_grid
    def build():
        return kde_grid(pts, cell_size=10.0, bandwidth=10.0).agg(
            F.count("*").alias("n"),
            F.bit_xor(F.xxhash64("cell", "n_pts", "kde_fp")).alias("sig"),
        ).collect()[0]
elif op == "dbscan":
    from crankshaft_spark.operators.dbscan import dbscan
    def build():
        return dbscan(pts, eps=10.0, min_pts=3).agg(
            F.count("*").alias("n"),
            F.bit_xor(F.xxhash64("id", F.coalesce("cluster", F.lit(-1)),
                                 "role")).alias("sig"),
        ).collect()[0]
else:
    sys.exit(f"unknown op {op!r}")
warm = build()  # full-size untimed warmup (JIT + shuffle infra)
agg, dt = measure()
assert (warm["n"], warm["sig"]) == (agg["n"], agg["sig"])
print(json.dumps({"cpus": cpus, "rows": rows, "sec": round(dt, 1),
                  "rows_per_sec": round(rows / dt),
                  "n_out": agg["n"], "sig": agg["sig"]}))
spark.stop()
"""


def run(op: str, cpus: int, rows: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", WORKER, op, str(cpus), str(rows)],
        capture_output=True, text=True, check=True)
    line = [l for l in out.stdout.replace("\r", "\n").splitlines()
            if l.startswith("{")][-1]
    return json.loads(line)


KNOWN_OPS = ("kde", "dbscan", "dwithin", "tileclip", "pagerank", "hits",
             "bm25")


def main() -> None:
    op = sys.argv[1] if len(sys.argv) > 1 else "kde"
    if op not in KNOWN_OPS:
        sys.exit(f"unknown op {op!r}; usage: python tools/newops_scale.py "
                 f"[op {'|'.join(KNOWN_OPS)}] [N] [rows]")
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    rows = int(sys.argv[3]) if len(sys.argv) > 3 else 10_000_000
    lo = run(op, n, rows)
    hi = run(op, 4 * n, rows)
    assert lo["n_out"] == hi["n_out"] and lo["sig"] == hi["sig"], (
        "outputs differ across parallelism", lo, hi)
    eff = (hi["rows_per_sec"] / lo["rows_per_sec"]) / 4
    print(json.dumps({
        "op": op, "rows": rows, "rows_identical": True,
        f"local[{n}]": lo, f"local[{4 * n}]": hi,
        "scaling_efficiency": round(eff, 3)}))


if __name__ == "__main__":
    main()
