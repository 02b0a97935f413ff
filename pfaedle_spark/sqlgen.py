"""DuckDB-dialect SQL mirrors of datagen + operators, for the oracle.

Each function returns a CTE body string built from the SAME constants
as the Spark side (``constants.py``), so values match bit-identically.
Compose with ``with_ctes("points", "edges")`` and append a SELECT.
"""

from __future__ import annotations

from . import constants as C

PHASH = f"((doc_id * {C.PHASH_MULT}) % {C.PHASH_MOD})"


def points_cte() -> str:
    return f"""
points AS (
  SELECT 'img_' || CAST(doc_id AS VARCHAR)            AS image_id,
         doc_id,
         {PHASH}                                      AS phash,
         CAST({PHASH} % {C.COORD_MASK} AS DOUBLE)     AS x,
         CAST(({PHASH} >> 16) % {C.COORD_MASK} AS DOUBLE) AS y,
         'trip_' || CAST(doc_id // {C.TRIP_LEN} AS VARCHAR) AS trip_id,
         doc_id % {C.TRIP_LEN}                        AS seq
  FROM documents
)"""


def images_cte() -> str:
    return f"""
images AS (
  SELECT 'img_' || CAST(doc_id AS VARCHAR)       AS image_id,
         CAST(16 + doc_id % 17 AS INT)           AS w,
         CAST(16 + doc_id % 13 AS INT)           AS h,
         CASE doc_id % 3 WHEN 0 THEN 'raw' WHEN 1 THEN 'png' ELSE 'rawz' END AS fmt,
         text                                    AS caption,
         {PHASH}                                 AS phash,
         doc_id
  FROM documents
)"""


def nodes_cte() -> str:
    g, s = C.GRID_N, C.GRID_SPACING
    return f"""
nodes AS (
  SELECT range                                    AS node_id,
         range % {g}                              AS col,
         range // {g}                             AS row,
         CAST((range % {g}) * {s} AS DOUBLE)      AS x,
         CAST((range // {g}) * {s} AS DOUBLE)     AS y,
         CAST(range % {g} >= {C.RIVER_COL} AS INT) AS component,
         ((range % {g}) + (range // {g})) % {C.STATION_MOD} = 0 AS is_station
  FROM range({g * g})
)"""


def edges_cte() -> str:
    g, s = C.GRID_N, C.GRID_SPACING
    return f"""
edges AS (
  SELECT node_id * 2 AS edge_id, node_id AS src, node_id + 1 AS dst,
         x AS x1, y AS y1, x + {s} AS x2, y AS y2,
         CAST(node_id % {C.N_LEVELS} AS INT) AS level,
         node_id % 7 = 0 AS oneway,
         CAST({s} AS DOUBLE) AS length
  FROM nodes WHERE col < {g - 1} AND col <> {C.RIVER_COL - 1}
  UNION ALL
  SELECT node_id * 2 + 1, node_id, node_id + {g},
         x, y, x, y + {s},
         CAST(node_id % {C.N_LEVELS} AS INT), FALSE, CAST({s} AS DOUBLE)
  FROM nodes WHERE row < {g - 1}
)"""


def stations_cte() -> str:
    return f"""
stations AS (
  SELECT 'stop_' || CAST(node_id AS VARCHAR) AS stop_id,
         'St. ' || CAST(node_id AS VARCHAR)  AS stop_name,
         x + {C.STATION_DX} AS x, y + {C.STATION_DY} AS y,
         node_id AS true_node_id
  FROM nodes WHERE is_station
)"""


def station_nodes_cte() -> str:
    return """
station_nodes AS (
  SELECT node_id, 'st ' || CAST(node_id AS VARCHAR) AS name, x, y, component
  FROM nodes WHERE is_station
)"""


_CTES = {
    "points": (points_cte, []),
    "images": (images_cte, []),
    "nodes": (nodes_cte, []),
    "edges": (edges_cte, ["nodes"]),
    "stations": (stations_cte, ["nodes"]),
    "station_nodes": (station_nodes_cte, ["nodes"]),
}


def with_ctes(*names: str) -> str:
    """WITH-clause providing the named synthetic tables (deps resolved)."""
    ordered: list[str] = []

    def add(n: str) -> None:
        fn, deps = _CTES[n]
        for d in deps:
            add(d)
        if n not in ordered:
            ordered.append(n)

    for n in names:
        add(n)
    return "WITH " + ",".join(_CTES[n][0]() for n in ordered)


def dist_to_segment(px: str, py: str, x1: str, y1: str, x2: str, y2: str) -> str:
    """Point-to-segment distance as a SQL expression (both dialects).

    Mirrors the reference ``distToSegment`` (``util/geo/Geo.h:1077-1110``):
    project onto the segment, clamp t to [0,1], euclidean distance.
    """
    dx, dy = f"({x2}-{x1})", f"({y2}-{y1})"
    len2 = f"({dx}*{dx}+{dy}*{dy})"
    t_raw = f"((({px}-{x1})*{dx}+({py}-{y1})*{dy})/{len2})"
    t = f"(CASE WHEN {len2} <= 0 THEN 0.0 ELSE LEAST(1.0, GREATEST(0.0, {t_raw})) END)"
    qx = f"({x1}+{t}*{dx})"
    qy = f"({y1}+{t}*{dy})"
    return f"SQRT(({px}-{qx})*({px}-{qx})+({py}-{qy})*({py}-{qy}))"


def cell_id(x: str, y: str) -> str:
    """Uniform-grid cell id (reference Grid.h:269-280):
    (floor(x/w), floor(y/h)) packed into one BIGINT."""
    return (
        f"(CAST(FLOOR({x}/{C.CELL}) AS BIGINT) * {C.CELL_STRIDE}"
        f" + CAST(FLOOR({y}/{C.CELL}) AS BIGINT))"
    )
