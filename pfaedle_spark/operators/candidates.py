"""J5 — the spatial radius/kNN join: observation point -> candidate edges.

Reference: ``trgraph/edge_grid.cpp:21-41`` (``get_edge_candidates``):
grid cells in a padded bbox -> exact ``distToSegment`` <= d -> heap
ordered by distance. This is the core operator of the whole engine.

Spark plan (scale-first):
  points ×cells  ⋈cell_id  edges ×cells      -- pure equi-join
    -> dropDuplicates(point, edge)           -- a pair can meet in >1 cell
    -> distToSegment (column math, codegen)  -- no UDF
    -> filter dist <= radius
    -> row_number over (point) order (dist, edge_id)  -- deterministic kNN
    -> rank <= k

Skew: dense "urban" cells put many edges in one cell. Two levers:
AQE skew-join (enabled in session.py) and explicit salting
(``salt`` param): point side gets salt = doc_id % s, edge side is
replicated s×, join key becomes (cell_id, salt) — same result rows,
s-way fan-out of the hot key. At 100 TB the edge side of one city cell
is still << executor memory, so replication is the right trade.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .. import constants as C
from .. import sqlgen
from . import cells


DIST_EXPR = sqlgen.dist_to_segment("x", "y", "x1", "y1", "x2", "y2")


def candidate_edges(
    points: DataFrame,
    edges: DataFrame,
    radius: float = C.SNAP_RADIUS,
    k: int = C.TOP_K,
    salt: int = 0,
    broadcast_edges: bool = False,
) -> DataFrame:
    """Top-k nearest edges within `radius` of each point.

    Output: (image_id, trip_id, seq, x, y, edge_id, src, dst, level,
    oneway, dist, rank) — rank 1..k ordered by (dist, edge_id); the
    explicit edge_id tie-break makes output deterministic across
    partitionings (reference PQ tie-break risk, SURVEY §7.1).
    """
    pts = points.select("image_id", "doc_id", "trip_id", "seq", "x", "y")
    # the heavy map side (cell explode + distToSegment) runs at the
    # input's partitioning; a small-file scan gives 1 partition and
    # serializes it — spread an under-partitioned input across cores.
    # (At cluster scale the ingest is already thousands of partitions
    # and this is a no-op.)
    par = points.sparkSession.sparkContext.defaultParallelism
    if pts.rdd.getNumPartitions() < par:
        pts = pts.repartition(par * 2)
    pc = cells.point_cells(pts, radius)
    ec = cells.edge_cells(edges)

    if broadcast_edges:
        ec = F.broadcast(ec)

    if salt > 1:
        pc = pc.withColumn("_salt", (F.col("doc_id") % salt).cast("int"))
        ec = ec.withColumn("_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1))))
        joined = pc.join(ec, ["cell_id", "_salt"]).drop("_salt")
    else:
        joined = pc.join(ec, "cell_id")

    # dist + radius filter + cand_node all run MAP-SIDE (before any
    # shuffle): the radius filter drops rows and the projection narrows
    # them, so the one shuffle below moves a fraction of the join output.
    # (The previous shape shuffled the full wide join twice — once for
    # dropDuplicates, once for the window — and shuffle serialization,
    # not the dist math, dominated the stage.)
    with_dist = joined.withColumn("dist", F.expr(DIST_EXPR)).filter(F.col("dist") <= radius)
    # cand_node: nearer edge endpoint — the routing state of this candidate
    # (reference promotes the projection to a node, osm_builder.cpp:1363-1506)
    near_src = (
        (F.col("x") - F.col("x1")) * (F.col("x") - F.col("x1"))
        + (F.col("y") - F.col("y1")) * (F.col("y") - F.col("y1"))
    ) <= (
        (F.col("x") - F.col("x2")) * (F.col("x") - F.col("x2"))
        + (F.col("y") - F.col("y2")) * (F.col("y") - F.col("y2"))
    )
    with_dist = with_dist.withColumn(
        "cand_node", F.when(near_src, F.col("src")).otherwise(F.col("dst"))
    ).select(
        "image_id", "trip_id", "seq", "x", "y",
        "edge_id", "src", "dst", "level", "oneway", "cand_node", "dist",
    )
    # ONE shuffle keyed by image_id serves BOTH the per-(image, edge)
    # dedup and the top-k window: HashPartitioning(image_id) satisfies
    # the clustered distribution of each (subset-key co-location), so
    # Catalyst inserts no further exchange.
    # no pinned partition count: spark.sql.shuffle.partitions sizes the
    # exchange and AQE coalesces the (post-filter, narrow) output —
    # pinning N here disables that coalesce and doubles task overhead
    # on small inputs for zero benefit at scale.
    with_dist = with_dist.repartition("image_id")
    dedup = with_dist.dropDuplicates(["image_id", "edge_id"])
    w = Window.partitionBy("image_id").orderBy(F.col("dist").asc(), F.col("edge_id").asc())
    return (
        dedup.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def candidates_oracle_sql(radius: float = C.SNAP_RADIUS, k: int = C.TOP_K) -> str:
    """DuckDB oracle for candidate_edges — same math, same tie-break."""
    return candidates_cte_sql(radius, k) + """
SELECT image_id, trip_id, seq, x, y, edge_id, src, dst, level, oneway, cand_node, dist, rank
FROM cand
"""


def candidates_cte_sql(
    radius: float = C.SNAP_RADIUS,
    k: int = C.TOP_K,
    edges_rel: str = "edges",
    head: str | None = None,
    n_ed: int | None = None,
) -> str:
    """Same oracle as a WITH-fragment ending in a ``cand`` CTE, so
    downstream oracles (hop costs, greedy assign, the composed
    lifecycle) can build on it. ``edges_rel``/``head`` let the J5 join
    run over a different edge CTE (e.g. the lifecycle's collapsed
    edges); ``n_ed`` sizes the static cell-offset list when edges can
    span more cells than one grid spacing (collapsed chains)."""
    dist = sqlgen.dist_to_segment("p.x", "p.y", "e.x1", "e.y1", "e.x2", "e.y2")
    import math

    # DuckDB's range() rejects correlated params; a bbox of span s covers at
    # most ceil(s/cell)+1 cells per axis, so expand via a static offset list.
    def offs(n: int) -> str:
        return "(VALUES " + ",".join(f"({i})" for i in range(n + 1)) + ")"

    n_pt = math.ceil(2 * radius / C.CELL) + 1
    if n_ed is None:
        n_ed = math.ceil(C.GRID_SPACING / C.CELL) + 1
    if head is None:
        head = sqlgen.with_ctes("points", "edges")
    pad_cells = f"""
point_cells AS (
  SELECT p.*,
         (CAST(FLOOR((p.x - {radius})/{C.CELL}) AS BIGINT) + ox.o) * {C.CELL_STRIDE}
         + CAST(FLOOR((p.y - {radius})/{C.CELL}) AS BIGINT) + oy.o AS cell_id
  FROM points p, {offs(n_pt)} ox(o), {offs(n_pt)} oy(o)
  WHERE CAST(FLOOR((p.x - {radius})/{C.CELL}) AS BIGINT) + ox.o
          <= CAST(FLOOR((p.x + {radius})/{C.CELL}) AS BIGINT)
    AND CAST(FLOOR((p.y - {radius})/{C.CELL}) AS BIGINT) + oy.o
          <= CAST(FLOOR((p.y + {radius})/{C.CELL}) AS BIGINT)
),
edge_cells AS (
  SELECT e.*,
         (CAST(FLOOR(LEAST(e.x1,e.x2)/{C.CELL}) AS BIGINT) + ox.o) * {C.CELL_STRIDE}
         + CAST(FLOOR(LEAST(e.y1,e.y2)/{C.CELL}) AS BIGINT) + oy.o AS cell_id
  FROM {edges_rel} e, {offs(n_ed)} ox(o), {offs(n_ed)} oy(o)
  WHERE CAST(FLOOR(LEAST(e.x1,e.x2)/{C.CELL}) AS BIGINT) + ox.o
          <= CAST(FLOOR(GREATEST(e.x1,e.x2)/{C.CELL}) AS BIGINT)
    AND CAST(FLOOR(LEAST(e.y1,e.y2)/{C.CELL}) AS BIGINT) + oy.o
          <= CAST(FLOOR(GREATEST(e.y1,e.y2)/{C.CELL}) AS BIGINT)
)"""
    return f"""{head},{pad_cells},
pairs AS (
  SELECT DISTINCT p.image_id, p.trip_id, p.seq, p.x, p.y,
         e.edge_id, e.src, e.dst, e.level, e.oneway,
         CASE WHEN (p.x-e.x1)*(p.x-e.x1)+(p.y-e.y1)*(p.y-e.y1)
                <= (p.x-e.x2)*(p.x-e.x2)+(p.y-e.y2)*(p.y-e.y2)
              THEN e.src ELSE e.dst END AS cand_node,
         {dist} AS dist
  FROM point_cells p JOIN edge_cells e USING (cell_id)
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY image_id ORDER BY dist ASC, edge_id ASC) AS rank
  FROM pairs WHERE dist <= {radius}
),
cand AS (
  SELECT image_id, trip_id, seq, x, y, edge_id, src, dst, level, oneway, cand_node, dist, rank
  FROM ranked WHERE rank <= {k}
)"""
