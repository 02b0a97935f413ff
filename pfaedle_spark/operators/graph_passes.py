"""Bounded iterative graph passes (reference trgraph/graph.cpp).

* G4 delete_orphan_edges (``graph.cpp:335-363``): exactly 3 rounds of
  dangling-spur removal (degree-1 non-station endpoint) — round count
  mirrors the reference's fixed ``for (int i = 0; i < 3; ++i)``.
* G2 fix_gaps (``graph.cpp:212-268``): degree-1 node pairs within
  1 m merge (non-stations) — cell self-join + threshold.
* G5 collapse_edges (``graph.cpp:105-148``): contract degree-2
  non-station nodes whose two edges are mergeable (same oneway/level),
  looped to fixpoint with a bounded round count; geometries
  concatenate (the reference's 4 orientation cases collapse to
  endpoint bookkeeping here since geoms are endpoint pairs + length).
* G6 simplify_geometries (``graph.cpp:149-158``): Douglas-Peucker at
  0.5 m per edge polyline via an Arrow-batched UDF over vertex arrays.

Each round of each pass is one or two joins — no driver-side
collection; rounds are bounded constants, so lineage stays shallow
(plus localCheckpoint between collapse rounds).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.geo import douglas_peucker

ORPHAN_ROUNDS = 3
COLLAPSE_MAX_ROUNDS = 8
GAP_DIST = 1.0
SIMPLIFY_EPS = 0.5


def _endpoint_degrees(edges: DataFrame) -> DataFrame:
    ends = edges.select(F.col("src").alias("node_id")).unionAll(
        edges.select(F.col("dst").alias("node_id"))
    )
    return ends.groupBy("node_id").agg(F.count("*").cast("long").alias("deg"))


def delete_orphan_edges(
    edges: DataFrame, station_node_ids: DataFrame, rounds: int = ORPHAN_ROUNDS
) -> DataFrame:
    """Drop spur edges whose degree-1 endpoint is not a station;
    repeat `rounds` times (reference fixed 3)."""
    stations = station_node_ids.select(F.col("node_id").alias("st_id"))
    cur = edges
    for r in range(rounds):
        # materialize between rounds: `cur` feeds both the degree agg and
        # the two anti-joins, so without a cut each round re-embeds the
        # previous round's DAG ~4x (plan growth is exponential in rounds;
        # bounded rounds make the per-round materialization cheap)
        cur = cur.localCheckpoint(eager=True)
        deg = _endpoint_degrees(cur)
        hang = (
            deg.filter(F.col("deg") == 1)
            .join(stations, deg.node_id == stations.st_id, "left_anti")
            .select(F.col("node_id").alias("hang_id"))
        )
        cur = (
            cur.join(hang.withColumnRenamed("hang_id", "src"), "src", "left_anti")
            .join(hang.withColumnRenamed("hang_id", "dst"), "dst", "left_anti")
        )
    return cur


def delete_orphan_edges_sql(
    edges_cte: str, rounds: int = ORPHAN_ROUNDS, src_table: str = "edges"
) -> str:
    """Unrolled SQL mirror: `rounds` rounds of deg/spur CTEs."""
    sql = edges_cte + f",\ne0 AS (SELECT * FROM {src_table})"
    for r in range(rounds):
        sql += f""",
deg{r} AS (
  SELECT node_id, COUNT(*) AS deg FROM (
    SELECT src AS node_id FROM e{r} UNION ALL SELECT dst FROM e{r}
  ) GROUP BY node_id
),
hang{r} AS (
  SELECT d.node_id FROM deg{r} d
  LEFT JOIN (SELECT node_id FROM nodes WHERE is_station) s USING (node_id)
  WHERE d.deg = 1 AND s.node_id IS NULL
),
e{r + 1} AS MATERIALIZED (
  SELECT e.* FROM e{r} e
  WHERE e.src NOT IN (SELECT node_id FROM hang{r})
    AND e.dst NOT IN (SELECT node_id FROM hang{r})
)"""
    return sql + f"\nSELECT edge_id, src, dst, level, oneway, length FROM e{rounds}\n"


def fix_gaps(nodes: DataFrame, edges: DataFrame, max_dist: float = GAP_DIST) -> DataFrame:
    """G2: merge non-station degree-1 nodes within `max_dist`: rewrite
    the higher node id onto the lower in the edge list.

    Returns the edges with remapped endpoints. Cell join on a 1 m-padded
    bbox finds the pairs without an n^2 scan."""
    deg = _endpoint_degrees(edges)
    d1 = (
        nodes.join(deg, "node_id")
        .filter((F.col("deg") == 1) & (~F.col("is_station")))
        .select("node_id", "x", "y")
    )
    from . import cells

    # padded-cell equi-join (the same J5/J6 pattern): the degree-1 set
    # can be millions of rows on a continental graph, so no crossJoin —
    # only same/adjacent-cell pairs are ever compared.
    a = cells.point_cells(d1, max_dist).select(
        "cell_id",
        F.col("node_id").alias("na"), F.col("x").alias("xa"), F.col("y").alias("ya"),
    )
    b = cells.tile_assign(d1).select(
        "cell_id",
        F.col("node_id").alias("nb"), F.col("x").alias("xb"), F.col("y").alias("yb"),
    )
    pairs = (
        a.join(b, "cell_id")
        .dropDuplicates(["na", "nb"])
        .filter(
            (F.col("na") < F.col("nb"))
            & (
                (F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb"))
                + (F.col("ya") - F.col("yb")) * (F.col("ya") - F.col("yb"))
                <= max_dist * max_dist
            )
        )
        .select(F.col("nb").alias("from_id"), F.col("na").alias("to_id"))
    )
    remap = pairs.groupBy("from_id").agg(F.min("to_id").alias("to_id"))
    e = edges
    for col in ("src", "dst"):
        e = (
            e.join(remap.withColumnRenamed("from_id", col), col, "left")
            .withColumn(col, F.coalesce("to_id", F.col(col)))
            .drop("to_id")
        )
    return e


def collapse_edges(
    edges: DataFrame,
    station_node_ids: DataFrame,
    geoms: DataFrame | None = None,
) -> DataFrame:
    """G5: contract chains through degree-2 non-station nodes whose two
    incident edges agree on (level, oneway). Each round merges one layer
    of chain nodes; loops until fixpoint or COLLAPSE_MAX_ROUNDS.

    Merged edge: new endpoints are the two outer nodes, length sums,
    edge_id = min of the pair (deterministic).

    With ``geoms`` (edge_id, xs, ys polylines oriented src->dst), merged
    edges also CONCATENATE their polylines per the reference's 4
    orientation cases (graph.cpp:290-334): each side is reversed iff it
    does not already run toward/away from the contraction node, and the
    shared via point is dropped from the second side."""
    stations = station_node_ids.select(F.col("node_id").alias("st_id"))
    cur = edges.select("edge_id", "src", "dst", "level", "oneway", "length")
    geo_cols = []
    if geoms is not None:
        cur = cur.join(geoms, "edge_id")
        geo_cols = ["xs", "ys"]
    for _ in range(COLLAPSE_MAX_ROUNDS):
        deg = _endpoint_degrees(cur)
        mid = (
            deg.filter(F.col("deg") == 2)
            .join(stations, deg.node_id == stations.st_id, "left_anti")
            .select(F.col("node_id").alias("mid"))
        )
        # the two edges at each contraction node: explode endpoints so
        # the incident lookup is a hash equi-join on the node id (the
        # OR-form src==mid|dst==mid would be a nested-loop join — O(E*M)
        # comparisons, a scale-killer on a continental edge set). A
        # self-loop at mid yields two exploded rows with e1==e2, which
        # the e1<>e2 merge guard below discards — same outcome as the
        # OR-join's single row failing the n==2 guard.
        inc = (
            cur.select(
                "edge_id", "src", "dst", "level", "oneway", "length", *geo_cols,
                F.explode(F.array("src", "dst")).alias("end_pt"),
            )
            .join(mid, F.col("end_pt") == F.col("mid"))
            .select(
                "mid", "edge_id", "src", "dst", "level", "oneway", "length", *geo_cols,
                F.when(F.col("src") == F.col("mid"), F.col("dst"))
                .otherwise(F.col("src"))
                .alias("other"),
            )
        )
        pair_fields = ["other", "level", "oneway", "length", "src", *geo_cols]
        g = inc.groupBy("mid").agg(
            F.count("*").alias("n"),
            F.min("edge_id").alias("e1"),
            F.max("edge_id").alias("e2"),
            F.min_by(F.struct(*pair_fields), "edge_id").alias("a"),
            F.max_by(F.struct(*pair_fields), "edge_id").alias("b"),
        )
        merg = g.filter(
            (F.col("n") == 2)
            & (F.col("e1") != F.col("e2"))
            & (F.col("a.level") == F.col("b.level"))
            & (F.col("a.oneway") == F.col("b.oneway"))
            & (F.col("a.other") != F.col("b.other"))  # no self-loop creation
        )
        # one contraction per round per disjoint pair: a chain node whose
        # neighbor is also being contracted this round could race; keep
        # only nodes where neither neighbor is a (smaller-id) mid node.
        safe = (
            merg.join(
                merg.select(F.col("mid").alias("n_mid")),
                (F.col("a.other") == F.col("n_mid")) & (F.col("n_mid") < F.col("mid")),
                "left_anti",
            )
            .join(
                merg.select(F.col("mid").alias("n_mid2")),
                (F.col("b.other") == F.col("n_mid2")) & (F.col("n_mid2") < F.col("mid")),
                "left_anti",
            )
        )
        safe = safe.localCheckpoint(eager=True)  # reused 3x below; also
        # lets the fixpoint probe short-circuit without re-deriving
        if safe.isEmpty():
            break
        merged_cols = [
            F.col("e1").alias("edge_id"),
            F.col("a.other").alias("src"),
            F.col("b.other").alias("dst"),
            F.col("a.level").alias("level"),
            F.col("a.oneway").alias("oneway"),
            (F.col("a.length") + F.col("b.length")).alias("length"),
        ]
        if geoms is not None:
            # orientation cases: side a must END at mid (reverse if its
            # stored orientation starts there); side b must START at mid
            def _or_a(col):
                return F.when(F.col("a.src") != F.col("mid"), F.col(f"a.{col}"))                     .otherwise(F.reverse(F.col(f"a.{col}")))

            def _or_b(col):
                b = F.when(F.col("b.src") == F.col("mid"), F.col(f"b.{col}"))                     .otherwise(F.reverse(F.col(f"b.{col}")))
                return F.slice(b, 2, F.size(b))  # drop the shared via point

            merged_cols += [
                F.concat(_or_a("xs"), _or_b("xs")).alias("xs"),
                F.concat(_or_a("ys"), _or_b("ys")).alias("ys"),
            ]
        merged_edges = safe.select(*merged_cols)
        dead = safe.select(F.explode(F.array("e1", "e2")).alias("edge_id"))
        cur = (
            cur.join(dead, "edge_id", "left_anti")
            .unionByName(merged_edges)
            .localCheckpoint(eager=True)
        )
    return cur


def simplify_geometries(edge_geoms: DataFrame, eps: float = SIMPLIFY_EPS) -> DataFrame:
    """G6: Douglas-Peucker(0.5 m) per edge polyline.

    Input: (edge_id, xs: array<double>, ys: array<double>); output adds
    simplified arrays + point counts. Arrow-batched; per-edge numpy."""

    def gen(batches):
        for pdf in batches:
            out_xs, out_ys = [], []
            for xs, ys in zip(pdf["xs"], pdf["ys"]):
                xs = np.asarray(xs, dtype=float)
                ys = np.asarray(ys, dtype=float)
                keep = douglas_peucker(xs, ys, eps)
                out_xs.append(xs[keep].tolist())
                out_ys.append(ys[keep].tolist())
            yield pd.DataFrame(
                {
                    "edge_id": pdf["edge_id"],
                    "n_in": [len(x) for x in pdf["xs"]],
                    "xs": out_xs,
                    "ys": out_ys,
                    "n_out": [len(x) for x in out_xs],
                }
            )

    return edge_geoms.mapInPandas(
        gen,
        schema="edge_id long, n_in int, xs array<double>, ys array<double>, n_out int",
    )


def zigzag_geoms(edges: DataFrame, step: float = 256.0) -> DataFrame:
    """Deterministic dense polylines for the simplify pass: each edge
    densified every `step` m with a small deterministic perpendicular
    zigzag (sub-eps, so DP must remove exactly the interior points
    whose offset < eps and keep the larger kinks)."""
    n_seg = F.greatest((F.col("length") / step).cast("int"), F.lit(1))
    idx = F.sequence(F.lit(0), n_seg)
    t = F.transform(idx, lambda i: i.cast("double") / n_seg.cast("double"))
    # offset pattern: ((edge_id + i) % 5 - 2) * 0.3  -> within +-0.6 m
    off = F.transform(idx, lambda i: ((F.col("edge_id") + i) % 5 - 2).cast("double") * 0.3)
    dx = F.col("x2") - F.col("x1")
    dy = F.col("y2") - F.col("y1")
    ln = F.sqrt(dx * dx + dy * dy)
    return edges.select(
        "edge_id",
        F.zip_with(
            t, off, lambda ti, oi: F.col("x1") + ti * dx - oi * dy / ln
        ).alias("xs"),
        F.zip_with(
            t, off, lambda ti, oi: F.col("y1") + ti * dy + oi * dx / ln
        ).alias("ys"),
    )


def collapse_edges_sql(
    edges_cte: str,
    src_table: str = "edges",
    orphan_rounds: int = ORPHAN_ROUNDS,
    rounds: int = COLLAPSE_MAX_ROUNDS,
    with_geoms: bool = False,
    step: float = 256.0,
    station_src: str = "(SELECT node_id FROM nodes WHERE is_station)",
    final_select: bool = True,
) -> str:
    """Unrolled SQL mirror of delete_orphan_edges + collapse_edges.

    Each collapse round replays the engine's exact algebra: endpoint
    degrees, non-station degree-2 mids, explode+equi-join incidence
    (self-loops yield e1==e2 and fail the merge guard, as in the
    engine), ARG_MIN/ARG_MAX by edge_id for the deterministic edge
    pair, the race guard (neither neighbor a smaller-id mid), then
    tombstone + append.  Rounds past the fixpoint are no-ops, so the
    fixed unroll equals the engine's early-exit loop.  Merged lengths
    add in the same pairing order every round, so doubles stay
    bit-identical."""
    sql = edges_cte + f",\ne0 AS (SELECT * FROM {src_table})"
    for r in range(orphan_rounds):
        sql += f""",
deg{r} AS (
  SELECT node_id, COUNT(*) AS deg FROM (
    SELECT src AS node_id FROM e{r} UNION ALL SELECT dst FROM e{r}
  ) GROUP BY node_id
),
hang{r} AS (
  SELECT d.node_id FROM deg{r} d
  LEFT JOIN {station_src} s USING (node_id)
  WHERE d.deg = 1 AND s.node_id IS NULL
),
e{r + 1} AS MATERIALIZED (
  SELECT e.* FROM e{r} e
  WHERE e.src NOT IN (SELECT node_id FROM hang{r})
    AND e.dst NOT IN (SELECT node_id FROM hang{r})
)"""
    gsel = ", xs, ys" if with_geoms else ""
    if with_geoms:
        # zigzag polyline twin (zigzag_geoms): n_seg points every `step`
        # meters with the deterministic sub-eps perpendicular offset
        zz = f"""
zz AS (
  SELECT edge_id,
         LIST_TRANSFORM(RANGE(0, GREATEST(CAST(FLOOR(length/{step}) AS INT), 1) + 1),
           i -> x1 + (CAST(i AS DOUBLE)/GREATEST(CAST(FLOOR(length/{step}) AS INT), 1)) * (x2-x1)
                - (CAST((edge_id + i) %% 5 - 2 AS DOUBLE) * 0.3) * (y2-y1)
                  / SQRT((x2-x1)*(x2-x1) + (y2-y1)*(y2-y1))) AS xs,
         LIST_TRANSFORM(RANGE(0, GREATEST(CAST(FLOOR(length/{step}) AS INT), 1) + 1),
           i -> y1 + (CAST(i AS DOUBLE)/GREATEST(CAST(FLOOR(length/{step}) AS INT), 1)) * (y2-y1)
                + (CAST((edge_id + i) %% 5 - 2 AS DOUBLE) * 0.3) * (x2-x1)
                  / SQRT((x2-x1)*(x2-x1) + (y2-y1)*(y2-y1))) AS ys
  FROM e{orphan_rounds}
)""".replace("%%", "%")
        sql += "," + zz + f""",
c0 AS MATERIALIZED (
  SELECT e.edge_id, e.src, e.dst, e.level, e.oneway, e.length, z.xs, z.ys
  FROM e{orphan_rounds} e JOIN zz z USING (edge_id))"""
    else:
        sql += f""",
c0 AS MATERIALIZED (SELECT edge_id, src, dst, level, oneway, length FROM e{orphan_rounds})"""
    gagg = ""
    gmerge = ""
    if with_geoms:
        gagg = (
            ",\n         ARG_MIN(src, edge_id) AS a_src, ARG_MAX(src, edge_id) AS b_src"
            ",\n         ARG_MIN(xs, edge_id) AS a_xs, ARG_MAX(xs, edge_id) AS b_xs"
            ",\n         ARG_MIN(ys, edge_id) AS a_ys, ARG_MAX(ys, edge_id) AS b_ys"
        )
        # orientation cases (graph.cpp:290-334): side a must END at mid,
        # side b must START at mid; drop b's shared via point
        _a = lambda c: f"CASE WHEN a_src <> mid THEN a_{c} ELSE LIST_REVERSE(a_{c}) END"
        _b = lambda c: (
            f"LIST_SLICE(CASE WHEN b_src = mid THEN b_{c} ELSE LIST_REVERSE(b_{c}) END,"
            f" 2, 1000000)"
        )
        gmerge = f",\n         {_a('xs')} || {_b('xs')}, {_a('ys')} || {_b('ys')}"
    for r in range(rounds):
        sql += f""",
cdeg{r} AS (
  SELECT node_id, COUNT(*) AS deg FROM (
    SELECT src AS node_id FROM c{r} UNION ALL SELECT dst FROM c{r}
  ) GROUP BY node_id
),
cmid{r} AS (
  SELECT d.node_id AS mid FROM cdeg{r} d
  LEFT JOIN {station_src} s USING (node_id)
  WHERE d.deg = 2 AND s.node_id IS NULL
),
cinc{r} AS MATERIALIZED (
  SELECT m.mid, e.edge_id, e.src, e.dst, e.level, e.oneway, e.length{gsel},
         CASE WHEN e.src = m.mid THEN e.dst ELSE e.src END AS other
  FROM (SELECT edge_id, src, dst, level, oneway, length{gsel}, src AS end_pt FROM c{r}
        UNION ALL
        SELECT edge_id, src, dst, level, oneway, length{gsel}, dst AS end_pt FROM c{r}) e
  JOIN cmid{r} m ON e.end_pt = m.mid
),
cg{r} AS MATERIALIZED (
  SELECT mid, COUNT(*) AS n, MIN(edge_id) AS e1, MAX(edge_id) AS e2,
         ARG_MIN(other, edge_id) AS a_other, ARG_MAX(other, edge_id) AS b_other,
         ARG_MIN(level, edge_id) AS a_level, ARG_MAX(level, edge_id) AS b_level,
         ARG_MIN(oneway, edge_id) AS a_oneway, ARG_MAX(oneway, edge_id) AS b_oneway,
         ARG_MIN(length, edge_id) AS a_length, ARG_MAX(length, edge_id) AS b_length{gagg}
  FROM cinc{r} GROUP BY mid
),
csafe{r} AS MATERIALIZED (
  SELECT m.* FROM (
    SELECT * FROM cg{r}
    WHERE n = 2 AND e1 <> e2 AND a_level = b_level AND a_oneway = b_oneway
      AND a_other <> b_other
  ) m
  WHERE NOT EXISTS (
    SELECT 1 FROM (
      SELECT mid FROM cg{r}
      WHERE n = 2 AND e1 <> e2 AND a_level = b_level AND a_oneway = b_oneway
        AND a_other <> b_other
    ) x WHERE (x.mid = m.a_other OR x.mid = m.b_other) AND x.mid < m.mid)
),
c{r + 1} AS MATERIALIZED (
  SELECT e.edge_id, e.src, e.dst, e.level, e.oneway, e.length{gsel}
  FROM c{r} e
  WHERE NOT EXISTS (SELECT 1 FROM csafe{r} s
                    WHERE s.e1 = e.edge_id OR s.e2 = e.edge_id)
  UNION ALL
  SELECT e1, a_other, b_other, a_level, a_oneway, a_length + b_length{gmerge}
  FROM csafe{r}
)"""
    if not final_select:
        return sql  # composable: caller appends CTEs reading c{rounds}
    if with_geoms:
        return sql + f"""
SELECT edge_id, src, dst, level, oneway, length,
       UNNEST(RANGE(LEN(xs))) AS pt_seq, UNNEST(xs) AS x, UNNEST(ys) AS y
FROM c{rounds}
"""
    return sql + f"\nSELECT edge_id, src, dst, level, oneway, length FROM c{rounds}\n"
