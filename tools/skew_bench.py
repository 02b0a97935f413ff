#!/usr/bin/env python
"""Planted-skew evidence for J5 hot-cell salting (SURVEY §7 risk 5).

World: one "urban" cell holds ~67% of all edge-cell rows (20k short
edges inside a single 2000 m grid cell, the exact hot-cell shape of the
reference's edge grid, ``trgraph/edge_grid.cpp:21-41``), plus a uniform
background (10k edges, one cell row each, over a 100x100-cell area).
10,000 observation points sit inside the hot cell and 20,000 spread
uniformly — so the unsalted cell_id equi-join funnels a ~200M-pair
distance workload into the ONE shuffle task that owns the hot cell.
Broadcast is disabled in the children because at 100 TB the edge-cells
table is far beyond any broadcast budget — the shuffled join is the
honest shape whose hot key this measures; radius=100 keeps the
straggler the join task itself rather than a uniformly-partitioned
downstream dedup/window over the pair flood.

Measured per config (fresh JVM per run, local[8], event-log parsed for
per-task durations):
  - unsalted, AQE skew-join OFF  -> the straggler, unmitigated
  - unsalted, AQE skew-join ON   -> what the session default recovers
  - salted s=8, AQE OFF          -> the explicit lever, isolated
Output: wall seconds, max task seconds, result row count (must be
IDENTICAL across configs — the semantic guarantee is also pytest-gated
in tests/test_cells_candidates.py). Records go to SCALING.md.

Usage: python tools/skew_bench.py            # orchestrates all configs
       python tools/skew_bench.py --child X  # internal: one measured run
"""

from __future__ import annotations

import glob
import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

HOT_EDGES = 20_000
BG_EDGES = 10_000
HOT_PTS = 10_000
BG_PTS = 20_000
SALT = 8

CONFIGS = {
    "unsalted_noaqe": {"salt": 0, "skewjoin": "false"},
    "unsalted_aqe": {"salt": 0, "skewjoin": "true"},
    "salted8_noaqe": {"salt": SALT, "skewjoin": "false"},
}


def planted_world(spark):
    """(points, edges) with the hot cell at grid index (10, 10):
    x,y in [20000, 22000). All geometry is integer-lattice arithmetic on
    the row id, so every config sees bit-identical input."""
    from pyspark.sql import functions as F

    # hot edges: short horizontal segments packed inside the one cell
    hot_e = spark.range(HOT_EDGES).select(
        F.col("id").alias("edge_id"),
        (F.col("id") * 2).alias("src"),
        (F.col("id") * 2 + 1).alias("dst"),
        (20050.0 + (F.col("id") % 120) * 16.0).alias("x1"),
        (20050.0 + ((F.col("id") / 120).cast("long") % 120) * 16.0).alias("y1"),
        (20050.0 + (F.col("id") % 120) * 16.0 + 10.0).alias("x2"),
        (20050.0 + ((F.col("id") / 120).cast("long") % 120) * 16.0).alias("y2"),
        (F.col("id") % 8).cast("int").alias("level"),
        (F.col("id") % 7 == 0).alias("oneway"),
        F.lit(10.0).alias("length"),
    )
    # background edges: one per ~cell over a 100x100-cell field, away
    # from the hot cell's 3x3 padded neighborhood
    bg_e = spark.range(BG_EDGES).select(
        (F.col("id") + HOT_EDGES).alias("edge_id"),
        (F.col("id") * 2 + 2 * HOT_EDGES).alias("src"),
        (F.col("id") * 2 + 1 + 2 * HOT_EDGES).alias("dst"),
        (40000.0 + (F.col("id") % 100) * 2000.0).alias("x1"),
        (40000.0 + ((F.col("id") / 100).cast("long") % 100) * 2000.0).alias("y1"),
        (40000.0 + (F.col("id") % 100) * 2000.0 + 900.0).alias("x2"),
        (40000.0 + ((F.col("id") / 100).cast("long") % 100) * 2000.0 + 900.0).alias("y2"),
        (F.col("id") % 8).cast("int").alias("level"),
        (F.col("id") % 7 == 0).alias("oneway"),
        F.lit(900.0).alias("length"),
    )
    edges = hot_e.unionAll(bg_e)

    hot_p = spark.range(HOT_PTS).select(
        F.concat(F.lit("hot_"), "id").alias("image_id"),
        F.col("id").alias("doc_id"),
        F.concat(F.lit("t"), (F.col("id") % 50).cast("string")).alias("trip_id"),
        (F.col("id") % 20).alias("seq"),
        (20100.0 + (F.col("id") % 40) * 45.0).alias("x"),
        (20100.0 + ((F.col("id") / 40).cast("long") % 40) * 45.0).alias("y"),
    )
    bg_p = spark.range(BG_PTS).select(
        F.concat(F.lit("bg_"), "id").alias("image_id"),
        (F.col("id") + HOT_PTS).alias("doc_id"),
        F.concat(F.lit("bt"), (F.col("id") % 500).cast("string")).alias("trip_id"),
        (F.col("id") % 40).alias("seq"),
        (40000.0 + (F.col("id") % 450) * 440.0).alias("x"),
        (40000.0 + ((F.col("id") / 450).cast("long") % 450) * 440.0).alias("y"),
    )
    return hot_p.unionAll(bg_p), edges


def child(cfg_name: str, evlog_dir: str) -> None:
    cfg = CONFIGS[cfg_name]
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName(f"skew_{cfg_name}")
        .config("spark.sql.shuffle.partitions", "8")
        # at 100 TB the edge-cells table is far beyond any broadcast
        # budget; on this toy world Spark would otherwise broadcast the
        # 30k-edge side and hide the shuffle whose hot key we're measuring
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", cfg["skewjoin"])
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", f"file://{evlog_dir}")
        .config("spark.eventLog.compress", "false")
        .config("spark.eventLog.rolling.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from pfaedle_spark.operators.candidates import candidate_edges

    pts, eds = planted_world(spark)
    t0 = time.perf_counter()
    # radius 100 (the reference's mid snap radius): the hot task still
    # evaluates all ~20M planted pairs but emits only the ~2% within
    # radius, so the measured straggler is the join task itself, not a
    # uniformly-partitioned downstream dedup/window over the pair flood
    out = candidate_edges(pts, eds, radius=100.0, salt=cfg["salt"])
    n = out.count()
    wall = time.perf_counter() - t0
    spark.stop()  # flushes the event log

    max_task = 0.0
    n_tasks = 0
    # Spark 4 rolling event logs are DIRECTORIES (eventlog_v2_<app>/
    # events_*) — walk every regular file under the log dir
    paths = [
        os.path.join(root, name)
        for root, _dirs, names in os.walk(evlog_dir)
        for name in names
        if not name.startswith("appstatus_")
    ]
    for path in paths:
        with open(path) as f:
            for line in f:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if ev.get("Event") == "SparkListenerTaskEnd":
                    ti = ev.get("Task Info", {})
                    d = (ti.get("Finish Time", 0) - ti.get("Launch Time", 0)) / 1e3
                    max_task = max(max_task, d)
                    n_tasks += 1
    print(json.dumps({"config": cfg_name, "rows": n, "wall_s": round(wall, 3),
                      "max_task_s": round(max_task, 3), "n_tasks": n_tasks}))


def main() -> None:
    if len(sys.argv) > 2 and sys.argv[1] == "--child":
        child(sys.argv[2], sys.argv[3])
        return
    results = []
    for name in CONFIGS:
        with tempfile.TemporaryDirectory() as evlog:
            env = dict(os.environ)
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--child", name, evlog],
                capture_output=True, text=True, env=env, cwd=REPO,
            )
            line = [ln for ln in p.stdout.splitlines() if ln.startswith("{")]
            if not line:
                print(f"{name}: FAILED\n{p.stdout[-2000:]}\n{p.stderr[-2000:]}")
                continue
            r = json.loads(line[-1])
            results.append(r)
            print(json.dumps(r))
    rows = {r["rows"] for r in results}
    print(json.dumps({"summary": results, "rows_identical": len(rows) == 1}))


if __name__ == "__main__":
    main()
