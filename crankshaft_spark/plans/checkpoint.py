"""Resumable pipeline stages: per-stage materialization + lineage manifest.

Each pipeline stage writes its result as parquet (Iceberg ``writeTo`` on a
real cluster — parquet is the sandbox stand-in, same layout semantics) next
to a ``_lineage.json`` manifest recording the stage id, an input token
(caller-supplied fingerprint of upstream config/snapshots), total and
*per-partition* row counts, output schema, and wall time.  A rerun whose
stage name + token match an existing manifest skips the compute and reads
the materialized table — the "resumable from checkpoint with per-partition
lineage + metrics" requirement of the BASELINE.json north rule.

The reference has no analogue (every crankshaft call recomputes inside one
PostgreSQL backend); this is new engine surface.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST = "_lineage.json"


class StageRunner:
    """Runs named stages with materialize-or-resume semantics.

    With ``base_dir=None`` checkpointing is disabled and stages run as plain
    lazy DataFrames (used by unit tests and the oracle harness).
    """

    def __init__(self, spark: SparkSession, base_dir: str | None = None,
                 pipeline_version: str = "v1"):
        self.spark = spark
        self.base_dir = base_dir
        self.version = pipeline_version
        self.metrics: dict[str, dict] = {}

    def stage(self, name: str, fn, token: str = "") -> DataFrame:
        if self.base_dir is None:
            return fn()
        path = os.path.join(self.base_dir, name)
        mpath = os.path.join(path, MANIFEST)
        full_token = f"{self.version}:{token}"
        if os.path.exists(mpath):
            # resume must DEGRADE to recompute on any mismatch — including
            # a manifest truncated by a crash mid-write; a JSONDecodeError
            # here would brick the stage until manual cleanup
            try:
                with open(mpath) as fh:
                    manifest = json.load(fh)
            except (json.JSONDecodeError, OSError):
                manifest = {}
            if manifest.get("token") == full_token:
                self.metrics[name] = {**manifest, "resumed": True}
                return self.spark.read.parquet(path)
        t0 = time.time()
        fn().write.mode("overwrite").parquet(path)
        out = self.spark.read.parquet(path)
        # per-partition row counts from the parquet FOOTERS (metadata-only)
        # — the written layout's true lineage, without re-scanning the data
        # (a groupBy(spark_partition_id) here would double every stage's IO
        # and record read-split counts, not the written files)
        import glob as _glob

        import pyarrow.parquet as pq

        parts = [
            {"pid": i, "file": os.path.basename(f),
             "rows": pq.ParquetFile(f).metadata.num_rows}
            for i, f in enumerate(
                sorted(_glob.glob(os.path.join(path, "part-*")))
            )
        ]
        manifest = {
            "stage": name,
            "token": full_token,
            "total_rows": sum(p["rows"] for p in parts),
            "partitions": parts,
            "schema": out.schema.simpleString(),
            "wall_s": round(time.time() - t0, 3),
        }
        # atomic publish: a crash mid-dump must leave either no manifest
        # (stage recomputes) or a complete one — never a truncated file
        tmp = mpath + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(manifest, fh)
        os.replace(tmp, mpath)
        self.metrics[name] = {**manifest, "resumed": False}
        return out
