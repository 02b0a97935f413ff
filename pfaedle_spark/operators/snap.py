"""J6/J7 — station snapping: GTFS stop -> matching OSM station node.

Reference: ``trgraph/node_grid.cpp:22-73`` (grid range query +
name-similarity filter + argmin distance) and the snap loop
``osm_builder.cpp:1649-1785`` (escalating radii). The name comparison
runs both names through the order-sensitive regex normalizer chain
(``trgraph/normalizer.cpp:50-96``) and then ``statSimi``
(``include/pfaedle/router/comp.h:18-60``: exact => 1).

Spark plan: same cell-id equi-join as J5, names normalized with chained
``regexp_replace`` columns (JVM-side), exact-match similarity, then
``row_number`` argmin with (dist, node_id) tie-break. No UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .. import constants as C
from .. import sqlgen
from . import cells

# Order-sensitive normalizer chain (reference normalizer.cpp semantics,
# rules modeled on pfaedle.cfg:8-215): lowercase, strip punctuation,
# collapse whitespace, trim. MUST be applied sequentially.
NORM_RULES = [
    (r"[.,;:!?']", ""),
    (r"\s+", " "),
]


def normalize_name(col: Column) -> Column:
    out = F.lower(col)
    for pat, rep in NORM_RULES:
        out = F.regexp_replace(out, pat, rep)
    return F.trim(out)


def normalize_name_sql(expr: str) -> str:
    """DuckDB mirror — regexp_replace needs the explicit 'g' flag there."""
    out = f"LOWER({expr})"
    for pat, rep in NORM_RULES:
        p, r = pat.replace("'", "''"), rep.replace("'", "''")
        out = f"REGEXP_REPLACE({out}, '{p}', '{r}', 'g')"
    return f"TRIM({out})"


def snap_stations(
    stops: DataFrame,
    station_nodes: DataFrame,
    radius: float = C.STATION_RADIUS,
) -> DataFrame:
    """Best station node per stop: within `radius`, normalized-name
    equality, argmin (dist, node_id).

    Output: (stop_id, node_id, dist, component).
    At scale the node side is small after the station filter — Catalyst
    broadcasts it; the cell join prunes the cross product first.
    """
    sc = cells.point_cells(stops.select("stop_id", "stop_name", "x", "y"), radius)
    nc = cells.point_cells(
        station_nodes.select(
            F.col("node_id"),
            F.col("name"),
            F.col("x").alias("nx"),
            F.col("y").alias("ny"),
            F.col("component"),
        ).withColumnRenamed("nx", "x").withColumnRenamed("ny", "y"),
        0.0,
    ).select("cell_id", "node_id", "name", F.col("x").alias("nx"), F.col("y").alias("ny"), "component")

    j = sc.join(nc, "cell_id").dropDuplicates(["stop_id", "node_id"])
    j = j.withColumn(
        "dist",
        F.sqrt(
            (F.col("x") - F.col("nx")) * (F.col("x") - F.col("nx"))
            + (F.col("y") - F.col("ny")) * (F.col("y") - F.col("ny"))
        ),
    ).filter(F.col("dist") <= radius)
    j = j.filter(normalize_name(F.col("stop_name")) == normalize_name(F.col("name")))
    w = Window.partitionBy("stop_id").orderBy(F.col("dist").asc(), F.col("node_id").asc())
    return (
        j.withColumn("rank", F.row_number().over(w))
        .filter("rank = 1")
        .select("stop_id", "node_id", "dist", "component")
    )


def snap_oracle_sql(radius: float = C.STATION_RADIUS) -> str:
    import math

    n = math.ceil(2 * radius / C.CELL) + 1
    offs = "(VALUES " + ",".join(f"({i})" for i in range(n + 1)) + ")"
    return f"""{sqlgen.with_ctes("stations", "station_nodes")},
stop_cells AS (
  SELECT s.*,
         (CAST(FLOOR((s.x - {radius})/{C.CELL}) AS BIGINT) + ox.o) * {C.CELL_STRIDE}
         + CAST(FLOOR((s.y - {radius})/{C.CELL}) AS BIGINT) + oy.o AS cell_id
  FROM stations s, {offs} ox(o), {offs} oy(o)
  WHERE CAST(FLOOR((s.x - {radius})/{C.CELL}) AS BIGINT) + ox.o
          <= CAST(FLOOR((s.x + {radius})/{C.CELL}) AS BIGINT)
    AND CAST(FLOOR((s.y - {radius})/{C.CELL}) AS BIGINT) + oy.o
          <= CAST(FLOOR((s.y + {radius})/{C.CELL}) AS BIGINT)
),
node_cells AS (
  SELECT n.*, {sqlgen.cell_id('n.x', 'n.y')} AS cell_id FROM station_nodes n
),
matched AS (
  SELECT s.stop_id, n.node_id, n.component,
         SQRT((s.x-n.x)*(s.x-n.x)+(s.y-n.y)*(s.y-n.y)) AS dist
  FROM stop_cells s JOIN node_cells n USING (cell_id)
  WHERE SQRT((s.x-n.x)*(s.x-n.x)+(s.y-n.y)*(s.y-n.y)) <= {radius}
    AND {normalize_name_sql('s.stop_name')} = {normalize_name_sql('n.name')}
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY stop_id ORDER BY dist ASC, node_id ASC) AS r
  FROM (SELECT DISTINCT * FROM matched)
)
SELECT stop_id, node_id, dist, component FROM ranked WHERE r = 1
"""
