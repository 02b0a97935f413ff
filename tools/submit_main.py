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
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = SparkSession.builder.appName("pfaedle_spark_submit").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    # engine is importable from the --py-files zip
    from pfaedle_spark import datagen
    from pfaedle_spark.operators import candidates, cells, graph_ops, routing

    t0 = time.perf_counter()
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
