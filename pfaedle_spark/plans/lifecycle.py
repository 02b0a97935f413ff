"""The composed §3.1 lifecycle — the reference's full ``pfaedle -x`` run
(``src/apps/pfaedle/app.cpp:286-398`` + ``osm_builder.cpp:116-238``)
re-expressed as one chained Spark plan:

    graph build (G1) -> fix_gaps (G2) -> snap + edge splitting (J7,
    split edges BECOME routing states) -> orphan prune (G4) ->
    collapse (G5) -> components (G7) -> candidate join (J5) ->
    full-model Viterbi (R7) -> shape assembly (R10/W2) -> GTFS sink (S5)

Two surfaces:

* :func:`composed_graph` — the relational prefix (through collapse),
  lazily composed; the ``lifecycle_graph`` driver query runs it against
  the round-unrolled DuckDB oracle in :func:`lifecycle_graph_sql`
  (fix-gaps remap + snap rounds + orphan/collapse rounds, every value
  bit-checkable).
* :func:`checkpointed_lifecycle` — the whole chain through the DP tail
  and the GTFS shapes sink, checkpointed per stage (kill + re-run
  resumes from the last durable stage; see tests/test_checkpoint.py).

Scale notes: every stage is the already-scaled operator (cell joins,
bounded unrolled rounds with per-round localCheckpoint, broadcast
graph-metadata sides); composition adds no new shuffle — each stage
reads the previous stage's parquet partition-parallel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import datagen, sqlgen
from ..operators import graph_ops, graph_passes, snap
from .checkpoint import CheckpointedPipeline


_COMPOSED_MEMO: dict[str, tuple[DataFrame, DataFrame, DataFrame]] = {}


def composed_graph(
    spark: SparkSession,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """fix_gaps -> snap_with_splits -> orphan prune -> collapse, with
    node/edge bookkeeping: snapped nodes become station nodes, split
    projection nodes join the node table, final edges re-acquire
    endpoint coordinates. Returns (final_nodes, final_edges, snaps).

    Memoized per session (same rationale as
    ``edge_routing.build_variant_transitions``): the prefix is a
    deterministic function of the static graph, and three consumers
    run it in one session (``lifecycle_graph``, ``lifecycle_candidates``,
    the checkpointed run) — re-paying the multi-round snap/collapse
    loops per invocation is pure waste. The returned frames end at
    eager localCheckpoints, so reuse is a metadata read; the memo dies
    with the context (keyed on applicationId + startTime)."""
    from ..operators.routing import session_token

    tok = session_token(spark)
    hit = _COMPOSED_MEMO.get(tok)
    if hit is not None:
        return hit
    nd = datagen.nodes(spark)
    e0 = datagen.edges(spark)
    # cut the remap-join lineage before the snap loop: each of the 3
    # snap rounds (and later every orphan/collapse round) would re-run
    # the fix_gaps joins otherwise
    e1 = graph_passes.fix_gaps(nd, e0).localCheckpoint(eager=True)
    snaps, e2 = snap.snap_with_splits(
        datagen.stations(spark), e1, return_edges=True
    )
    # every snapped node is a station node from here on (the reference
    # attaches the stop to the node, osm_builder.cpp:1363-1506); split
    # projections are NEW nodes at (qx, qy)
    snapped = snaps.select("node_id").distinct().withColumn("snapped", F.lit(True))
    base_nodes = (
        nd.select("node_id", "x", "y", "is_station")
        .join(snapped, "node_id", "left")
        .select(
            "node_id", "x", "y",
            (F.col("is_station") | F.coalesce(F.col("snapped"), F.lit(False)))
            .alias("is_station"),
        )
    )
    split_nodes = snaps.filter("kind = 'split'").select(
        "node_id",
        F.col("qx").alias("x"),
        F.col("qy").alias("y"),
        F.lit(True).alias("is_station"),
    )
    # nodes_f feeds every orphan/collapse round's station anti-join plus
    # the final coordinate re-join — one materialization, many readers
    nodes_f = base_nodes.unionByName(split_nodes).localCheckpoint(eager=True)
    st_ids = nodes_f.filter("is_station").select("node_id")
    pruned = graph_passes.delete_orphan_edges(e2, st_ids)
    collapsed = graph_passes.collapse_edges(pruned, st_ids)
    edges_f = (
        collapsed.join(
            nodes_f.select(
                F.col("node_id").alias("src"),
                F.col("x").alias("x1"),
                F.col("y").alias("y1"),
            ),
            "src",
        )
        .join(
            nodes_f.select(
                F.col("node_id").alias("dst"),
                F.col("x").alias("x2"),
                F.col("y").alias("y2"),
            ),
            "dst",
        )
        .select(
            "edge_id", "src", "dst", "x1", "y1", "x2", "y2",
            "level", "oneway", "length",
        )
        # cut the coordinate-re-join lineage too: every memo reader
        # (candidate join, router, sink) starts from materialized edges
        .localCheckpoint(eager=True)
    )
    _COMPOSED_MEMO[tok] = (nodes_f, edges_f, snaps)
    return _COMPOSED_MEMO[tok]


def lifecycle_graph_sql(final_select: bool = True) -> str:
    """Round-unrolled DuckDB oracle for the relational lifecycle prefix:
    fix-gaps remap, the three snap/split rounds, orphan + collapse
    rounds (station set = original stations + every snapped node), and
    the endpoint-coordinate re-join. With ``final_select=False`` the
    chain ends in an ``lcedges`` CTE so downstream composed oracles
    (the J5 candidate join in ``lifecycle_candidates``) can extend it."""
    g2 = graph_passes.GAP_DIST * graph_passes.GAP_DIST
    prefix = sqlgen.with_ctes("stations", "edges") + f""",
gdeg AS (
  SELECT node_id, COUNT(*) AS deg FROM (
    SELECT src AS node_id FROM edges UNION ALL SELECT dst FROM edges
  ) GROUP BY node_id
),
gd1 AS (
  SELECT n.node_id, n.x, n.y FROM nodes n JOIN gdeg USING (node_id)
  WHERE deg = 1 AND NOT is_station
),
gremap AS (
  -- engine side pairs via the padded-cell equi-join; the oracle pairs
  -- the (tiny by construction) degree-1 set directly — same pair set
  SELECT b.node_id AS from_id, MIN(a.node_id) AS to_id
  FROM gd1 a JOIN gd1 b
    ON a.node_id < b.node_id
   AND (a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y) <= {g2}
  GROUP BY b.node_id
),
gedges AS MATERIALIZED (
  SELECT e.edge_id, COALESCE(rs.to_id, e.src) AS src,
         COALESCE(rd.to_id, e.dst) AS dst,
         e.x1, e.y1, e.x2, e.y2, e.level, e.oneway, e.length
  FROM edges e
  LEFT JOIN gremap rs ON rs.from_id = e.src
  LEFT JOIN gremap rd ON rd.from_id = e.dst
)"""
    prefix += snap.snap_splits_ctes(edge_src="gedges")
    n_rounds = len(snap.SPLIT_RADII)
    prefix += f""",
stnodes AS MATERIALIZED (
  SELECT node_id FROM nodes WHERE is_station
  UNION
  SELECT node_id FROM snaps_all
)"""
    body = graph_passes.collapse_edges_sql(
        prefix,
        src_table=f"edges{n_rounds}",
        station_src="stnodes",
        final_select=False,
    )
    final = f"""SELECT c.edge_id, c.src, c.dst, ns.x AS x1, ns.y AS y1,
       nd.x AS x2, nd.y AS y2, c.level, c.oneway, c.length
FROM c{graph_passes.COLLAPSE_MAX_ROUNDS} c
JOIN nodesf ns ON ns.node_id = c.src
JOIN nodesf nd ON nd.node_id = c.dst"""
    body += f""",
nodesf AS MATERIALIZED (
  SELECT node_id, x, y FROM nodes
  UNION ALL
  SELECT node_id, qx AS x, qy AS y FROM snaps_all WHERE kind = 'split'
)"""
    if final_select:
        return body + "\n" + final + "\n"
    return body + f""",
lcedges AS MATERIALIZED (
  {final}
)"""


def checkpointed_lifecycle(
    spark: SparkSession, sf_dir: str, root: str
) -> tuple[DataFrame, CheckpointedPipeline]:
    """The full lifecycle, checkpointed per stage. Returns the assembled
    GTFS-shaped shape rows + the pipeline handle (manifest carries
    per-stage lineage, wall time and per-partition row/byte counts)."""
    from ..operators import candidates, edge_routing
    from ..sources import gtfs

    cp = CheckpointedPipeline(spark, root)

    nodes_f_l, edges_f_l, snaps_l = None, None, None

    def _graph():
        nonlocal nodes_f_l, edges_f_l, snaps_l
        if edges_f_l is None:
            nodes_f_l, edges_f_l, snaps_l = composed_graph(spark)
        return nodes_f_l, edges_f_l, snaps_l

    # the three graph outputs share one composition; _graph() is only
    # invoked when a stage actually recomputes, so a fully-checkpointed
    # resume never re-runs the (eager, multi-round) snap loop
    snaps = cp.stage("snaps", lambda: _graph()[2], inputs=["stations", "edges"])
    nodes_f = cp.stage("graph_nodes", lambda: _graph()[0], inputs=["snaps"])
    edges_f = cp.stage("graph_edges", lambda: _graph()[1], inputs=["snaps"])
    comps = cp.stage(
        "components",
        lambda: graph_ops.connected_components(nodes_f, edges_f),
        inputs=["graph_nodes", "graph_edges"],
    )
    cand = cp.stage(
        "candidates",
        lambda: candidates.candidate_edges(datagen.points(spark, sf_dir), edges_f),
        inputs=["graph_edges", "documents"],
    )
    # the transitions build (3 self-join jobs + Arrow collect) is
    # DEFERRED into the stage lambdas: it only runs when a DP stage
    # actually recomputes, so a fully-checkpointed resume never pays it
    # (it is session-memoized on edges_f's semantic hash, so the two
    # lambdas share one build when both recompute)
    def _tbv():
        return edge_routing.build_variant_transitions(
            spark, edges_f, nodes=nodes_f
        )

    aligned = cp.stage(
        "viterbi",
        lambda: edge_routing.viterbi_full(cand, _tbv()),
        inputs=["candidates", "graph_edges"],
    )
    shapes = cp.stage(
        "shapes",
        lambda: edge_routing.shape_assembly(
            cand, _tbv(), edge_routing.directed_full_pdf(spark, edges_f)
        ),
        inputs=["viterbi", "graph_edges"],
    )
    # S5: GTFS shapes rows (synthetic_feed's lat/lon convention)
    gtfs_shapes = cp.stage(
        "gtfs_shapes",
        lambda: shapes.select(
            F.concat(F.lit("shp_"), F.substring("trip_id", 6, 10)).alias("shape_id"),
            (F.col("y") / 100000.0).alias("shape_pt_lat"),
            (F.col("x") / 100000.0).alias("shape_pt_lon"),
            F.col("pt_seq").cast("long").alias("shape_pt_sequence"),
            F.col("cum_dist").alias("shape_dist_traveled"),
        ),
        inputs=["shapes"],
    )
    # distributed CSV sink — the COMPLETE output feed (what `pfaedle -x`
    # emits: the input feed's tables plus the matched shapes,
    # app.cpp:286-398); executors write, the driver never collects. Its
    # own checkpointed stage: a clean resume skips the full feed rewrite.
    import os

    feed_dir = os.path.join(root, "feed")

    def _write_feed() -> None:
        gtfs.write_table(gtfs_shapes, feed_dir, "shapes")
        for name, df in gtfs.synthetic_feed(spark, sf_dir).items():
            gtfs.write_table(df, feed_dir, name)

    cp.effect_stage(
        "gtfs_feed", _write_feed, inputs=["gtfs_shapes"], marker=feed_dir
    )
    _ = comps  # G7 runs for its manifest entry; routing reads the CSRs
    return gtfs_shapes, cp
