#!/usr/bin/env python
"""spark-submit entry point (north rule launch mode).

Launched by tools/run_spark_submit.sh with the engine shipped as
--py-files pfaedle_spark.zip — the same packaging a multi-executor
cluster launch uses (executors import the engine from the zip)."""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import SparkSession


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    lc_root = None
    for a in sys.argv[1:]:
        if a.startswith("--lifecycle="):
            lc_root = a.split("=", 1)[1]
    spark = SparkSession.builder.appName("pfaedle_spark_submit").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    # engine is importable from the --py-files zip
    from pfaedle_spark import datagen
    from pfaedle_spark.operators import candidates, cells, graph_ops, routing

    t0 = time.perf_counter()
    if lc_root:
        # the composed, CHECKPOINTED lifecycle: kill this submit at any
        # point and re-submitting resumes from the last durable stage —
        # the north rule's resumability exercised through the cluster
        # launch mode itself
        from pfaedle_spark.plans.lifecycle import checkpointed_lifecycle

        shapes, cp = checkpointed_lifecycle(spark, sf_dir, lc_root)
        print(
            json.dumps(
                {"launched_via": "spark-submit --py-files", "sf_dir": sf_dir,
                 "mode": "lifecycle", "shapes_rows": shapes.count(),
                 "stages_computed": cp.computed, "stages_resumed": cp.skipped,
                 "wall_s": round(time.perf_counter() - t0, 2)}
            )
        )
        spark.stop()
        return
    pts = datagen.points(spark, sf_dir)
    eds = datagen.edges(spark)
    cand = candidates.candidate_edges(pts, eds)
    aligned = routing.viterbi_align(cand, graph_ops.write_odir_edges(eds))
    tiles = cells.tile_assign(aligned.join(pts.select("image_id", "x", "y"), "image_id"))
    n = tiles.count()
    print(
        json.dumps(
            {"launched_via": "spark-submit --py-files", "sf_dir": sf_dir,
             "tiles_rows": n, "wall_s": round(time.perf_counter() - t0, 2)}
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
