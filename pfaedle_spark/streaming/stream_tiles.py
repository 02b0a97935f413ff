"""Structured Streaming surface: streaming tile assignment + windowed
cell rollups over the ``events`` table.

The reference is a single-shot batch CLI (no streaming —
``src/apps/pfaedle/main.cpp``); this is the engine's forward-looking
ingest path: observation events arrive continuously, each is assigned
its grid cell (stateless, identical logic to the batch
``cells.tile_assign``), and a watermarked sliding-window aggregation
maintains per-cell arrival counts for late-data-tolerant rollups.

Batch/stream parity: the transformation is THE SAME column expression
as the batch path, so `availableNow` processing of a static directory
must produce exactly the batch result — asserted in
tests/test_streaming.py.

Scale notes: stateless assignment has no state store; the windowed agg
keys on (cell_id, window) — bounded state via watermark; checkpoint
dir gives exactly-once file-sink semantics on a cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import constants as C
from ..operators.cells import cell_id_col

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def event_points(events: DataFrame) -> DataFrame:
    """Events -> observation points: the event id drives deterministic
    phash-style coordinates (same mix as datagen.points)."""
    phash = (F.col("event_id") * F.lit(C.PHASH_MULT)) % F.lit(C.PHASH_MOD)
    return events.select(
        "event_id",
        "ts",
        "event_type",
        (phash % C.COORD_MASK).cast("double").alias("x"),
        (F.shiftright(phash, 16) % C.COORD_MASK).cast("double").alias("y"),
    )


def assign_tiles(points: DataFrame) -> DataFrame:
    """Stateless streaming tile assignment (identical to batch)."""
    return points.withColumn("cell_id", cell_id_col(F.col("x"), F.col("y")))


def stream_tiles(spark: SparkSession, src_dir: str) -> DataFrame:
    """File-source stream of events -> tiled stream."""
    events = spark.readStream.schema(EVENTS_SCHEMA).parquet(src_dir)
    return assign_tiles(event_points(events))


def windowed_cell_counts(
    tiled: DataFrame, window: str = "1 hour", slide: str | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked per-cell arrival counts (late rows beyond the
    watermark are dropped; state is bounded)."""
    w = F.window("ts", window, slide) if slide else F.window("ts", window)
    return (
        tiled.withWatermark("ts", watermark)
        .groupBy(F.col("cell_id"), w.alias("win"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "cell_id",
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "n_events",
        )
    )


def run_available_now(
    out_df: DataFrame,
    checkpoint_dir: str,
    mode: str = "append",
    progress_acc: list | None = None,
):
    """Drain all currently-available input (batch-equivalent semantics),
    collecting every micro-batch via foreachBatch. Returns the rows.
    ``progress_acc`` (if given) receives the query's recentProgress
    dicts — e.g. for asserting state-store row counts after eviction."""
    acc: list = []

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        acc.extend(batch_df.collect())

    q = (
        out_df.writeStream.outputMode(mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .foreachBatch(sink)
        .start()
    )
    q.awaitTermination()
    if progress_acc is not None:
        progress_acc.extend(q.recentProgress)
    return acc


def stream_candidates(spark: SparkSession, src_dir: str, edges: DataFrame) -> DataFrame:
    """Streaming J5 — the core candidate spatial join on a LIVE stream of
    observation points: stream-static equi-join on the grid cell id.

    The static side (edge cells) is graph-sized and broadcast-able; the
    stream side explodes each arriving point to its padded cells exactly
    like the batch path (``cells.point_cells``), and the radius filter is
    the same map-side segment-distance predicate (``DIST_EXPR``). The
    whole operator is STATELESS — no state store, no watermark needed —
    so it scales to any arrival rate; the per-observation top-k rank is
    deliberately left to the (stateful or batch) consumer, mirroring how
    the reference separates candidate generation from selection
    (``osm_builder.cpp`` grid query vs ``router.cpp`` selection).

    Batch/stream parity is asserted in tests/test_streaming.py: an
    ``availableNow`` drain over a static directory must emit exactly the
    batch cell join's candidate set.
    """
    from ..operators import cells
    from ..operators.candidates import DIST_EXPR

    pts = event_points(spark.readStream.schema(EVENTS_SCHEMA).parquet(src_dir))
    pc = cells.point_cells(pts.select("event_id", "x", "y"), C.SNAP_RADIUS)
    ec = cells.edge_cells(edges)
    j = pc.join(ec, "cell_id")
    return (
        j.withColumn("dist", F.expr(DIST_EXPR))
        .filter(F.col("dist") <= C.SNAP_RADIUS)
        .select("event_id", "edge_id", "dist", "cell_id")
    )
