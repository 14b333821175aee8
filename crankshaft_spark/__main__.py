"""spark-submit entry point for the flagship hotspot pipeline.

    spark-submit --master local[32] \
        --py-files crankshaft_spark.zip \
        -m crankshaft_spark  # or: path/to/crankshaft_spark/__main__.py
        --sf-dir /root/testdata/sf0.1 --multiplier 100 \
        --checkpoint-dir /tmp/ck --output /tmp/hotspots.parquet

Runs crawl-table synthesis (or a parquet/Iceberg input via --input) through
the geocode → PIP → cell-rollup → Gi* pipeline with per-stage checkpoint/
lineage manifests, writes the hotspot table, and prints one JSON metrics
line (per-stage rows/partitions/wall, from the lineage manifests).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="crankshaft_spark")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--input", default=None,
                    help="parquet path of an existing page table "
                         "(url, warc_ts, html, text, lang, ...); default "
                         "synthesises from sf-dir")
    ap.add_argument("--multiplier", type=int, default=1)
    ap.add_argument("--checkpoint-dir", default=None)
    ap.add_argument("--output", default=None)
    ap.add_argument("--cpus", type=int, default=None,
                    help="local[N] when no master is set by spark-submit")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    from crankshaft_spark.plans.checkpoint import StageRunner
    from crankshaft_spark.plans.pipeline import hotspot_pipeline
    from crankshaft_spark.session import session_conf
    from crankshaft_spark.sources.webpages import synth_webpages

    preexisting = SparkSession.getActiveSession() is not None
    builder = SparkSession.builder.appName("crankshaft_hotspots")
    if args.cpus:
        builder = builder.master(f"local[{args.cpus}]")
    spark = session_conf(builder).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    pages = (
        spark.read.parquet(args.input) if args.input
        else synth_webpages(spark, args.sf_dir, multiplier=args.multiplier)
    )
    runner = StageRunner(spark, args.checkpoint_dir)
    pages_token = args.input or f"mult={args.multiplier}"
    result = hotspot_pipeline(spark, args.sf_dir, runner=runner, pages=pages,
                              pages_token=pages_token)
    if args.output:
        result.write.mode("overwrite").parquet(args.output)
        n = spark.read.parquet(args.output).count()
    else:
        n = result.count()
    print(json.dumps({"hotspot_rows": n, "stages": runner.metrics}))
    if not preexisting:  # don't tear down a caller-owned session (tests)
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
