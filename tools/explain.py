"""Dump formatted physical plans for headline operators (plan-quality audit).

Usage: python tools/explain.py [query ...] — writes /tmp/plans/<name>.txt
per query and prints a one-line summary of plan health markers:
codegen spans (distinct WholeStageCodegen ids), broadcast joins, SHUFFLE
exchanges (Broadcast/Reused excluded), Python UDF stages.
"""

from __future__ import annotations

import io
import re
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, "/root/repo")

DEFAULT = ["hotspot_pipeline", "knn_edges", "pip_assign", "minhash_lsh",
           "getis_z", "grid_density", "gravity_h", "embed_neardup"]


def main():
    from crankshaft_spark import get_session
    from crankshaft_spark.plans import driver_queries

    from pyspark.sql import SparkSession

    preexisting = SparkSession.getActiveSession() is not None
    names = sys.argv[1:] or DEFAULT
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_session(master="local[4]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs("/tmp/plans", exist_ok=True)
    qs = driver_queries.queries()
    for name in names:
        df = qs[name](spark, sf)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        with open(f"/tmp/plans/{name}.txt", "w") as fh:
            fh.write(plan)
        # distinct span ids, not per-operator annotations (one 6-operator
        # span carries 6 'codegen id' lines); shuffle exchanges only —
        # bare .count('Exchange') also matches BroadcastExchange (the
        # DESIRED join shape) and ReusedExchange, overcounting shuffles
        n_codegen = len(set(re.findall(r"codegen id : (\d+)", plan)))
        n_bhj = plan.count("BroadcastHashJoin")
        n_smj = plan.count("SortMergeJoin")
        n_ex = (plan.count("Exchange") - plan.count("BroadcastExchange")
                - plan.count("ReusedExchange"))
        n_py = plan.count("ArrowEvalPython") + plan.count("MapInPandas") \
            + plan.count("FlatMapGroupsInPandas") + plan.count("BatchEvalPython")
        print(f"{name}: codegen={n_codegen} bhj={n_bhj} smj={n_smj} "
              f"exchange={n_ex} python_stages={n_py}")
    if not preexisting:
        spark.stop()


if __name__ == "__main__":
    main()
