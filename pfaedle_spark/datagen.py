"""Deterministic synthetic tables (Spark side).

Everything derives from the driver-provided testdata parquet (seed=42)
plus pure integer arithmetic, so the DuckDB oracle (``sqlgen.py``) can
reproduce every value bit-identically. No external data, no RNG at
build time.

Tables produced:

* ``images``  — the Iceberg-shaped payload table of BASELINE.json
  input_hint: ``(image_id, bytes, w, h, fmt, caption, phash)``; one row
  per ``documents`` row, ``caption = text``, ``phash = mix(doc_id)``.
* ``points``  — observation rows: phash-derived ``(x, y)`` plus
  ``(trip_id, seq)`` — the GTFS stop_times analogue
  (reference ``src/libs/gtfs/include/gtfs/stop_time.h:15-37``).
* ``nodes`` / ``edges`` — OSM-analogue planar grid road graph with road
  levels, oneway flags and a two-component split (reference graph model
  ``include/pfaedle/trgraph/edge_payload.h:47-139``).
* ``stations`` — offset station points with noisy names (exercises the
  snap + name-similarity path, ``osm_builder.cpp:1363-1506``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import constants as C


def documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def dedup_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``documents`` plus deterministically planted duplicates, so the
    dedup operators have real work whose ground truth is known:

    * exact dup: every doc_id % 7 == 0 copied verbatim as doc_id+2e6
    * near dup:  every doc_id % 5 == 0 copied as doc_id+1e6 with the
      first token replaced by 'xdup' (Jaccard stays high)
    """
    docs = documents(spark, sf_dir).select("doc_id", "text")
    exact = docs.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 2_000_000).alias("doc_id"), "text"
    )
    near = docs.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat(F.lit("xdup"), F.expr("substring(text, instr(text, ' '))")).alias("text"),
    )
    return docs.unionByName(exact).unionByName(near)


# --------------------------------------------------------------------
# images / points
# --------------------------------------------------------------------

def _phash_col():
    return (F.col("doc_id") * F.lit(C.PHASH_MULT)) % F.lit(C.PHASH_MOD)


def images(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Payload table WITHOUT bytes (relational part — oracle-checkable).

    Use :func:`with_bytes` to attach the binary pixel payload.
    """
    docs = documents(spark, sf_dir)
    phash = _phash_col()
    return docs.select(
        F.concat(F.lit("img_"), F.col("doc_id").cast("string")).alias("image_id"),
        (F.lit(16) + (F.col("doc_id") % 17)).cast("int").alias("w"),
        (F.lit(16) + (F.col("doc_id") % 13)).cast("int").alias("h"),
        F.when(F.col("doc_id") % 3 == 0, "raw")
        .when(F.col("doc_id") % 3 == 1, "png")
        .otherwise("rawz")
        .alias("fmt"),
        F.col("text").alias("caption"),
        phash.alias("phash"),
        F.col("doc_id"),
    )


def with_bytes(images_df: DataFrame) -> DataFrame:
    """Attach the binary pixel payload, generated deterministically from
    phash with a per-pixel LCG (numpy, Arrow-batched — no per-row Python).

    fmt='raw'  : w*h uint8 pixels, exact round-trip.
    fmt='rawz' : same pixels quantized to 64 levels (>>2<<2) — the
                 "lossy" format; E[err^2] = 3.5 => PSNR ~ 42.7 dB,
                 satisfying the >=40 dB input_hint invariant (tests
                 measure it, they don't assume it).
    fmt='png'  : payload stubbed as raw bytes behind the same schema; the
                 real PNG codec is gated (not in this container) — see
                 operators/multimodal.py.
    """
    from pyspark.sql.types import BinaryType, StructField, StructType

    # copy the fields — StructType.add would mutate the df's cached schema
    schema = StructType(list(images_df.schema.fields) + [StructField("bytes", BinaryType())])

    def gen(batches):
        for pdf in batches:
            out = []
            for ph, w, h, fmt in zip(pdf["phash"], pdf["w"], pdf["h"], pdf["fmt"]):
                px = gen_pixels(int(ph), int(w), int(h))
                if fmt == "rawz":
                    px = (px >> 2) << 2
                out.append(px.tobytes())
            pdf = pdf.copy()
            pdf["bytes"] = out
            yield pdf

    return images_df.mapInPandas(gen, schema=schema)


def gen_pixels(phash: int, w: int, h: int) -> np.ndarray:
    """Deterministic grayscale pixels from phash (vectorized LCG)."""
    n = w * h
    idx = np.arange(n, dtype=np.uint64)
    state = (np.uint64(phash % (1 << 31)) + idx * np.uint64(2654435761)) & np.uint64(0xFFFFFFFF)
    state = (state * np.uint64(1103515245) + np.uint64(12345)) & np.uint64(0xFFFFFFFF)
    return ((state >> np.uint64(16)) & np.uint64(0xFF)).astype(np.uint8).reshape(h, w)


def points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Observation points: phash bits -> (x, y); doc_id -> (trip_id, seq)."""
    docs = documents(spark, sf_dir)
    phash = _phash_col()
    return docs.select(
        F.concat(F.lit("img_"), F.col("doc_id").cast("string")).alias("image_id"),
        F.col("doc_id"),
        phash.alias("phash"),
        (phash % C.COORD_MASK).cast("double").alias("x"),
        # phash may exceed 2^53 — use integer shift, not double division
        (F.shiftright(phash, 16) % C.COORD_MASK).cast("double").alias("y"),
        F.concat(F.lit("trip_"), F.floor(F.col("doc_id") / C.TRIP_LEN).cast("long").cast("string")).alias("trip_id"),
        (F.col("doc_id") % C.TRIP_LEN).cast("long").alias("seq"),
    )


# --------------------------------------------------------------------
# Fréchet staircase world (A6 per-hop oracle; constants.py FH_*)
# --------------------------------------------------------------------

def fh_stops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stops on the integer staircase plane: consecutive stops 23..35 m
    apart in x, |dy| <= 24 — every truth hop segment < 50 m, so the
    Fréchet densify grid is the identity and the whole per-hop DP is
    exact-integer + sqrt (bit-checkable in DuckDB). ``hx`` is the
    deterministic first x-step of the hop's detour staircase."""
    docs = documents(spark, sf_dir)
    phash = _phash_col()
    t = F.col("doc_id") % C.N_TRIPS
    k = F.floor(F.col("doc_id") / C.N_TRIPS).cast("long")
    return docs.select(
        F.concat(F.lit("trip_"), t.cast("string")).alias("trip_id"),
        k.alias("stop_seq"),
        (k * C.FH_XSTEP + phash % C.FH_AMOD).cast("double").alias("x"),
        (t * C.FH_YBASE
         + (F.shiftright(phash, 3) % C.FH_BMOD) * C.FH_BSCALE)
        .cast("double").alias("y"),
        (F.lit(C.FH_HXBASE) + F.shiftright(phash, 7) % C.FH_HXMOD)
        .cast("double").alias("hx"),
    )


def fh_aligned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The matched polyline through the staircase stops: per hop
    S_k -> (x_k+hx, y_k) -> (x_k+hx, y_{k+1}) -> S_{k+1} (the vertical
    vertex dropped when dy = 0). Axis-aligned integer segments < 50 m;
    each stop is an exact vertex, so the ordered projectOnAfter cuts
    (PolyLine.h:98-119) land on exact cumulative integer positions."""
    from pyspark.sql import Window

    s = fh_stops(spark, sf_dir)
    w = Window.partitionBy("trip_id").orderBy("stop_seq")
    nxt = s.select(
        "trip_id", "stop_seq", "x", "y", "hx",
        F.lead("x").over(w).alias("x2"),
        F.lead("y").over(w).alias("y2"),
    )
    stops_v = nxt.select(
        "trip_id", (F.col("stop_seq") * 3).alias("seq"), "x", "y"
    )
    v1 = nxt.filter(F.col("x2").isNotNull()).select(
        "trip_id",
        (F.col("stop_seq") * 3 + 1).alias("seq"),
        (F.col("x") + F.col("hx")).alias("x"),
        F.col("y"),
    )
    v2 = nxt.filter(
        F.col("x2").isNotNull() & (F.col("y2") != F.col("y"))
    ).select(
        "trip_id",
        (F.col("stop_seq") * 3 + 2).alias("seq"),
        (F.col("x") + F.col("hx")).alias("x"),
        F.col("y2").alias("y"),
    )
    return stops_v.unionByName(v1).unionByName(v2)


# --------------------------------------------------------------------
# road graph
# --------------------------------------------------------------------

def nodes(spark: SparkSession) -> DataFrame:
    g, s = C.GRID_N, C.GRID_SPACING
    # few partitions: the graph side is small (the scale axis is the
    # points/images side); 32-way ranges here would fan trivial rows into
    # hundreds of per-stage tasks downstream.
    n = spark.range(0, g * g, numPartitions=4).select(F.col("id").alias("node_id"))
    return n.select(
        "node_id",
        (F.col("node_id") % g).alias("col"),
        F.floor(F.col("node_id") / g).alias("row"),
        ((F.col("node_id") % g) * s).cast("double").alias("x"),
        (F.floor(F.col("node_id") / g) * s).cast("double").alias("y"),
        ((F.col("node_id") % g >= C.RIVER_COL).cast("int")).alias("component"),
        (((F.col("node_id") % g) + F.floor(F.col("node_id") / g)) % C.STATION_MOD == 0).alias(
            "is_station"
        ),
    )


def edges(spark: SparkSession) -> DataFrame:
    """Directed-ish edge list (stored once per undirected edge; see
    operators/graph_ops.write_odir_edges for the reverse copies —
    reference ``trgraph/graph.cpp:364-377``)."""
    g = C.GRID_N
    nd = nodes(spark).select("node_id", "col", "row", "x", "y")
    horiz = (
        nd.filter((F.col("col") < g - 1) & (F.col("col") != C.RIVER_COL - 1))
        .select(
            (F.col("node_id") * 2).alias("edge_id"),
            F.col("node_id").alias("src"),
            (F.col("node_id") + 1).alias("dst"),
            F.col("x").alias("x1"),
            F.col("y").alias("y1"),
            (F.col("x") + C.GRID_SPACING).alias("x2"),
            F.col("y").alias("y2"),
            (F.col("node_id") % C.N_LEVELS).cast("int").alias("level"),
            (F.col("node_id") % 7 == 0).alias("oneway"),
        )
    )
    vert = (
        nd.filter(F.col("row") < g - 1)
        .select(
            (F.col("node_id") * 2 + 1).alias("edge_id"),
            F.col("node_id").alias("src"),
            (F.col("node_id") + g).alias("dst"),
            F.col("x").alias("x1"),
            F.col("y").alias("y1"),
            F.col("x").alias("x2"),
            (F.col("y") + C.GRID_SPACING).alias("y2"),
            (F.col("node_id") % C.N_LEVELS).cast("int").alias("level"),
            F.lit(False).alias("oneway"),
        )
    )
    e = horiz.unionByName(vert)
    return e.withColumn(
        "length",
        F.sqrt(
            (F.col("x2") - F.col("x1")) * (F.col("x2") - F.col("x1"))
            + (F.col("y2") - F.col("y1")) * (F.col("y2") - F.col("y1"))
        ),
    )


def stations(spark: SparkSession) -> DataFrame:
    """GTFS-stop analogue: offset from their true node, names needing the
    normalizer chain ('St. 5' vs node name 'st 5')."""
    nd = nodes(spark).filter("is_station")
    return nd.select(
        F.concat(F.lit("stop_"), F.col("node_id").cast("string")).alias("stop_id"),
        F.concat(F.lit("St. "), F.col("node_id").cast("string")).alias("stop_name"),
        (F.col("x") + C.STATION_DX).alias("x"),
        (F.col("y") + C.STATION_DY).alias("y"),
        F.col("node_id").alias("true_node_id"),
    )


def station_nodes(spark: SparkSession) -> DataFrame:
    """OSM-side station nodes with normalized-ish names."""
    nd = nodes(spark).filter("is_station")
    return nd.select(
        "node_id",
        F.concat(F.lit("st "), F.col("node_id").cast("string")).alias("name"),
        "x",
        "y",
        "component",
    )


# --------------------------------------------------------------------
# corridor world (R10 shape-assembly oracle; constants.py COR_*)
# --------------------------------------------------------------------

def corridor_nodes(spark: SparkSession) -> DataFrame:
    """Path-graph nodes on the x axis: node i at (i*COR_SP, 0).
    Station flags exercise the pass-through-station punish; single
    component (a corridor has no river)."""
    n = spark.range(0, C.COR_EDGES + 1, numPartitions=2).select(
        F.col("id").alias("node_id")
    )
    return n.select(
        "node_id",
        (F.col("node_id") * C.COR_SP).cast("double").alias("x"),
        F.lit(0.0).alias("y"),
        F.lit(0).alias("component"),
        (F.col("node_id") % C.COR_STATION_MOD == 0).alias("is_station"),
    )


def corridor_edges(spark: SparkSession) -> DataFrame:
    """Corridor edge i: node i -> i+1, horizontal, length COR_SP.
    Levels 3..7 ONLY: level < 3 edges would serve synthetic lines
    (gtfs_ops.edge_lines) whose simi cost carries non-dyadic 1/3 terms;
    with no lines every a_cmp coalesces to 1.0 and every transition
    cost is an exact integer (see constants.py COR_* rationale).
    Oneway every 7th edge exercises the against-oneway punish."""
    nd = corridor_nodes(spark).filter(F.col("node_id") < C.COR_EDGES)
    return nd.select(
        F.col("node_id").alias("edge_id"),
        F.col("node_id").alias("src"),
        (F.col("node_id") + 1).alias("dst"),
        F.col("x").alias("x1"),
        F.lit(0.0).alias("y1"),
        (F.col("x") + C.COR_SP).alias("x2"),
        F.lit(0.0).alias("y2"),
        (F.col("node_id") % 5 + 3).cast("int").alias("level"),
        (F.col("node_id") % 7 == 0).alias("oneway"),
        F.lit(float(C.COR_SP)).alias("length"),
    )


def corridor_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Observations ON the corridor line (y = 0, x on the 128 m
    lattice): distToSegment is then an exact integer for every
    candidate (0 under the point, the axis gap for neighbours), so
    emissions and all DP totals stay integer-exact."""
    docs = documents(spark, sf_dir)
    return docs.select(
        F.concat(F.lit("cim_"), F.col("doc_id").cast("string")).alias("image_id"),
        F.col("doc_id"),
        ((F.col("doc_id") * C.COR_XSTEP) % C.COR_XMOD * C.COR_XCELL)
        .cast("double").alias("x"),
        F.lit(0.0).alias("y"),
        F.concat(F.lit("ctrip_"), (F.col("doc_id") % C.N_TRIPS).cast("string")).alias(
            "trip_id"
        ),
        F.floor(F.col("doc_id") / C.N_TRIPS).cast("long").alias("seq"),
    )
