"""Round benchmark: flagship hotspot pipeline + headline operator timings.

Prints ONE JSON line:
  {"metric": "hotspot_pipeline_pages_per_sec", "value": <pages/sec>,
   "unit": "pages/sec", "pipeline_sec": ..., "pages": ...,
   "queries": {<name>: sec, ...}, "sf": <sf>, "cpus": N}

Env:
  SPARK_GRAFT_SF_DIR  input dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS    local[] parallelism (default 32)
  BENCH_MULT          page-table replication factor (default 100 -> ~500k
                      pages at sf0.1), closed-form deterministic ids
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from crankshaft_spark import get_session  # noqa: E402
from crankshaft_spark.plans import driver_queries  # noqa: E402
from crankshaft_spark.plans.pipeline import hotspot_pipeline  # noqa: E402
from crankshaft_spark.sources.webpages import synth_webpages  # noqa: E402

HEADLINE = [
    "knn_edges", "moran_local", "moran_local_rate", "getis_z", "markov",
    "interp_nn_idw", "interp_bary", "gravity_h", "grid_density",
    "contour_equal", "overlap_sum", "queen_edges", "pip_assign",
    "page_extract", "dedup_exact", "text_stats", "ngram_jaccard",
    "minhash_lsh", "simhash_pairs", "fingerprints",
    "ann_cosine", "embed_neardup", "kmeans_spatial", "voronoi", "pia",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    mult = int(os.environ.get("BENCH_MULT", "100"))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    spark = get_session(master=f"local[{cpus}]", app_name="crankshaft_bench",
                        shuffle_partitions=max(cpus, 32))
    spark.sparkContext.setLogLevel("ERROR")

    # -- flagship: crawl table -> PIP -> cell rollup -> Gi* hotspots --------
    pages = synth_webpages(spark, sf_dir, multiplier=mult)
    n_pages = pages.count()
    # one untimed warmup run: JIT/codegen/Arrow startup are per-JVM
    # constants, not throughput (same protocol as tools/scalebench.py)
    hotspot_pipeline(spark, sf_dir, pages=pages).count()
    t0 = time.time()
    hotspot_pipeline(spark, sf_dir, pages=pages).count()
    pipeline_sec = time.time() - t0

    # -- headline operator queries ------------------------------------------
    # Per-query protocol (round 2+): best of 2 runs, caches cleared between
    # queries.  Rationale: (a) this VM's vCPUs are contention-noisy —
    # identical code swings ±3x between consecutive runs (same reason
    # tools/scalebench.py uses best-of-3); (b) clearCache keeps a late
    # query from measuring the heap pressure of 20 predecessors' leftover
    # persisted blocks.  Round-1 numbers were single cold runs — deltas vs
    # BENCH_r01 therefore mix protocol and code effects; BASELINE.md §4
    # documents this.
    qs = driver_queries.queries()
    timings: dict[str, float] = {}
    for name in HEADLINE:
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            qs[name](spark, sf_dir).count()
            best = min(best, time.time() - t0)
            spark.catalog.clearCache()
        timings[name] = round(best, 3)

    print(json.dumps({
        "metric": "hotspot_pipeline_pages_per_sec",
        "value": round(n_pages / pipeline_sec, 1),
        "unit": "pages/sec",
        "pipeline_sec": round(pipeline_sec, 3),
        "pages": n_pages,
        "queries": timings,
        "sf": sf,
        "cpus": cpus,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
