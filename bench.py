"""Round benchmark: flagship hotspot pipeline + headline operator timings.

Prints ONE JSON line:
  {"metric": "hotspot_pipeline_pages_per_sec", "value": <pages/sec>,
   "unit": "pages/sec", "pipeline_sec": ..., "pages": ...,
   "builds": {"knn_weights": sec}, "queries": {<name>: sec, ...},
   "arms": {<name>: {<arm>: sec, ...}, ...}, "sf": <sf>, "cpus": N}

"arms" are single-run per-arm attributions for the multi-arm entries
(ARM_COLS + the page_extract builders) — a regression in ONE arm is
visible without hand-audits; they re-pay shared builds and are noisier
than the best-of-2 "queries" numbers.

"builds" times the shared kNN weight-table build once; edge-consuming
queries (moran_local/_rate, getis_z, markov) are timed against the cached
table, so their numbers are operator-only and comparable across rounds.

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

from pyspark.sql import functions as F  # noqa: E402

from crankshaft_spark import get_session  # noqa: E402
from crankshaft_spark.plans import driver_queries  # noqa: E402
from crankshaft_spark.plans.pipeline import hotspot_pipeline  # noqa: E402
from crankshaft_spark.sources.webpages import synth_webpages  # noqa: E402


def materialize(df) -> None:
    """Force EVERY column of every row to be computed.

    .count() lets Catalyst prune aggregate values and unreferenced
    columns out of the timed plan (CLAUDE.md) — a flagship count was
    measuring the pipeline WITHOUT its quality/Gi* expression work.
    bit_xor of a row hash over all columns defeats pruning while keeping
    the driver-side result one row (no collect of large outputs)."""
    df.agg(F.bit_xor(F.xxhash64(F.struct(*[F.col(c) for c in df.columns])))
           ).collect()

HEADLINE = [
    "knn_edges", "moran_local", "moran_local_rate_bv", "getis_z", "markov",
    "interp_nn_idw", "interp_bary", "gravity_h", "grid_density",
    "contour_equal", "overlap_sum", "queen_edges", "pip_assign",
    "page_extract", "dedup_exact", "text_stats", "ngram_jaccard",
    "decontaminate", "corpus_select",
    "minhash_lsh", "simhash_pairs", "fingerprints",
    "ann_cosine", "embed_neardup", "kmeans_spatial", "voronoi", "pia",
    "media_decode", "media_real",
]

# Per-arm attribution (round 5): multi-arm entries hide single-arm
# regressions in their total, so each arm is timed once via a filter on
# the entry's discriminator column (Catalyst collapses the other union
# branches to empty under `lit(col) = value`, so only that arm's plan
# runs — shared builds are re-paid per arm and the timings are
# single-run, i.e. attribution, not a best-of protocol).  A tuple
# (label, [values]) times one isin() filter — for sibling rows that are
# one computation (the three join-counts stats share one aggregate and
# a NON-literal discriminator, so per-stat filters could not prune the
# branch anyway; review finding r5).  Caveat, same cause: that
# non-literal jc branch survives EVERY moran_global arm filter, so each
# of that entry's arm numbers also carries the jc aggregate — read them
# as arm + jc, not arm alone.  page_extract is special-cased
# below (its graph arms run eagerly at construction).  media_decode/
# media_real are NOT listed: they are single-pipeline entries — every
# kind decodes in one mapInPandas pass, so a kind filter cannot isolate
# anything and the numbers would misattribute (review finding r5).
ARM_COLS = {
    "knn_edges": ("grid", ["rect", "hex", "ripley", "dwithin"]),
    "moran_global": ("variant", ["value", "rate", "geary",
                                 ("jc", ["jc_bb", "jc_bw", "jc_ww"]),
                                 "quadrat_vmr", "clark_evans"]),
    "dedup_exact": ("method", ["text", "norm", "url", "para", "stream"]),
    "minhash_lsh": ("kind", ["pair", "member", "survivor"]),
    "fingerprints": ("arm", ["fp", "tfidf", "bm25"]),
    "embed_neardup": ("kind", ["pair", "member", "survivor"]),
    "overlap_sum": ("arm", ["overlap", "tileclip"]),
    "densify": ("arm", ["densify", "simplify", "interp"]),
    "tin_map": ("arm", ["tin", "alpha"]),
}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    mult = int(os.environ.get("BENCH_MULT", "100"))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    # load BEFORE the session spins up: >~1 means something else is on
    # the box and the per-query numbers ride the documented ±3x
    # contention band (r4 verdict item 9 — the driver bench read 2-3x
    # the idle best-of readings; make the condition visible in the JSON)
    load_start = round(os.getloadavg()[0], 1)

    spark = get_session(master=f"local[{cpus}]", app_name="crankshaft_bench",
                        shuffle_partitions=max(cpus, 32))
    spark.sparkContext.setLogLevel("ERROR")

    # -- flagship: crawl table -> PIP -> cell rollup -> Gi* hotspots --------
    pages = synth_webpages(spark, sf_dir, multiplier=mult)
    n_pages = pages.count()
    # one untimed warmup run: JIT/codegen/Arrow startup are per-JVM
    # constants, not throughput (same protocol as tools/scalebench.py);
    # timed action materializes all columns (scalebench's timed run
    # collect()s for the same reason — row-identity assertions)
    materialize(hotspot_pipeline(spark, sf_dir, pages=pages))
    # best-of-3 (r5): the single timed run sampled the ±3x VM band —
    # one r5 reading was 6.0 s against a 3.9-4.3 s steady state
    pipeline_sec = float("inf")
    for _ in range(3):
        t0 = time.time()
        materialize(hotspot_pipeline(spark, sf_dir, pages=pages))
        pipeline_sec = min(pipeline_sec, time.time() - t0)

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

    # Shared-input build timed ONCE (round 3+): moran_local/_rate, getis_z
    # and markov all consume the same row-standardized kNN weight table.
    # r1→r2 per-query deltas were unreadable because each query re-paid
    # that build (or rode a predecessor's cache).  Now: time the build
    # separately, then time edge consumers against the cached table via
    # driver_queries.set_edges_override.
    EDGE_CONSUMERS = {"moran_local", "moran_local_rate_bv", "getis_z",
                      "markov"}
    build_best = float("inf")
    edges = None
    for _ in range(2):
        if edges is not None:
            edges.unpersist()
        edges = driver_queries._edges_w(spark, sf_dir).persist()
        t0 = time.time()
        edges.count()
        build_best = min(build_best, time.time() - t0)
    builds = {"knn_weights": round(build_best, 3)}

    timings: dict[str, float] = {}
    for name in HEADLINE:
        cached = name in EDGE_CONSUMERS
        driver_queries.set_edges_override(edges if cached else None)
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            materialize(qs[name](spark, sf_dir))
            best = min(best, time.time() - t0)
            if cached:
                # clearCache drops the weight table too — re-pin it
                # (untimed) so the next run still reads the cached copy
                spark.catalog.clearCache()
                edges.persist().count()
            else:
                spark.catalog.clearCache()
        timings[name] = round(best, 3)
    driver_queries.set_edges_override(None)

    # -- per-arm attribution (single runs; see ARM_COLS note) ---------------
    arms: dict[str, dict[str, float]] = {}
    for name, (col, vals) in ARM_COLS.items():
        df = qs[name](spark, sf_dir)
        for v in vals:
            label, pred = (v, F.col(col) == v) if isinstance(v, str) \
                else (v[0], F.col(col).isin(*v[1]))
            t0 = time.time()
            materialize(df.where(pred))
            arms.setdefault(name, {})[label] = round(time.time() - t0, 3)
        spark.catalog.clearCache()
    # page_extract's iterative graph arms execute at construction, so
    # they get dedicated builders (shared link table built untimed)
    pe = driver_queries.page_extract_arm_builders(spark, sf_dir)
    for v, build in pe.items():
        t0 = time.time()
        materialize(build())
        arms.setdefault("page_extract", {})[v] = round(time.time() - t0, 3)
    spark.catalog.clearCache()

    print(json.dumps({
        "metric": "hotspot_pipeline_pages_per_sec",
        "value": round(n_pages / pipeline_sec, 1),
        "unit": "pages/sec",
        "pipeline_sec": round(pipeline_sec, 3),
        "pages": n_pages,
        "builds": builds,
        "queries": timings,
        "arms": arms,
        "sf": sf,
        "cpus": cpus,
        "loadavg_start": load_start,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
