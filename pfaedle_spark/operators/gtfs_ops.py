"""GTFS-side relational operators (SURVEY §2 A2 / J3 / F10).

* A2 shape refcount — ``shape_builder.cpp:207-216,298-310``: count
  trips per shape id; shapes that lose all users are dropped
  (groupBy + anti-join on survivors).
* J3 edge -> line names — ``osm_builder::get_lines``
  (``osm_builder.cpp:1544-1628``): way -> route-relation join,
  normalized (name, from, to) interned via dropDuplicates.
* F10 restriction extraction — ``osm_builder::read_restrictions``
  (``osm_builder.cpp:1070-1117``): type=restriction relations ->
  (via node, from way, to way, positive/negative) by pivoting member
  roles.

All three have DuckDB oracles over the same synthetic derivations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import sqlgen

SHAPE_MOD = 16


# --------------------------------------------------------------------
# A2 — shape usage refcount
# --------------------------------------------------------------------

def shape_refcount(points: DataFrame) -> DataFrame:
    """trips (from points) -> shape usage counts; shape_id is the
    synthetic trip->shape mapping (trip number mod SHAPE_MOD).

    Output: (shape_id, n_trips) for shapes still referenced."""
    trips = points.select("trip_id").distinct()
    with_shape = trips.select(
        "trip_id",
        F.concat(
            F.lit("shp_"),
            (F.substring("trip_id", 6, 10).cast("long") % SHAPE_MOD).cast("string"),
        ).alias("shape_id"),
    )
    return (
        with_shape.groupBy("shape_id")
        .agg(F.count("*").cast("long").alias("n_trips"))
        .filter(F.col("n_trips") > 0)
    )


def shape_refcount_sql() -> str:
    return f"""{sqlgen.with_ctes("points")},
trips AS (SELECT DISTINCT trip_id FROM points),
ws AS (
  SELECT trip_id,
         'shp_' || CAST(CAST(SUBSTRING(trip_id, 6, 10) AS BIGINT) % {SHAPE_MOD} AS VARCHAR)
           AS shape_id
  FROM trips
)
SELECT shape_id, COUNT(*) AS n_trips FROM ws GROUP BY shape_id HAVING COUNT(*) > 0
"""


# --------------------------------------------------------------------
# J3 — edge -> transit line names
# --------------------------------------------------------------------

def edge_lines(edges: DataFrame) -> DataFrame:
    """Synthetic route relations: every edge with level < 3 serves line
    'L<level*10>' from 'st <src%9>' to 'st <dst%9>'; names normalized
    (lower/trim) then interned with dropDuplicates (the reference's
    pointer-interning, osm_builder.cpp:1544-1628).

    Output: (edge_id, line_name, from_stop, to_stop)."""
    served = edges.filter(F.col("level") < 3)
    return (
        served.select(
            "edge_id",
            F.concat(F.lit("l"), (F.col("level") * 10).cast("string")).alias("line_name"),
            F.concat(F.lit("st "), (F.col("src") % 9).cast("string")).alias("from_stop"),
            F.concat(F.lit("st "), (F.col("dst") % 9).cast("string")).alias("to_stop"),
        )
        .dropDuplicates(["edge_id", "line_name", "from_stop", "to_stop"])
    )


def edge_lines_sql() -> str:
    return f"""{sqlgen.with_ctes("edges")}
SELECT DISTINCT edge_id,
       'l' || CAST(level * 10 AS VARCHAR) AS line_name,
       'st ' || CAST(src % 9 AS VARCHAR)  AS from_stop,
       'st ' || CAST(dst % 9 AS VARCHAR)  AS to_stop
FROM edges WHERE level < 3
"""


# --------------------------------------------------------------------
# netgraph — output overlay graph (edges annotated with usage)
# --------------------------------------------------------------------

def netgraph_usage(assigned: DataFrame) -> DataFrame:
    """Reference ``shape_builder.cpp:771-811``: the netgraph annotates
    every edge with the trips that use it. Input: per-observation chosen
    edge (greedy rank-1 or viterbi output). Output:
    (edge_id, n_trips, n_images)."""
    return assigned.groupBy("edge_id").agg(
        F.countDistinct("trip_id").alias("n_trips"),
        F.count("*").cast("long").alias("n_images"),
    )


def netgraph_usage_sql(cand_cte: str) -> str:
    """Builds on the candidates oracle CTE (rank-1 assignment)."""
    return f"""{cand_cte}
SELECT edge_id, COUNT(DISTINCT trip_id) AS n_trips, COUNT(*) AS n_images
FROM cand WHERE rank = 1
GROUP BY edge_id
"""


# --------------------------------------------------------------------
# F10 — restriction relations
# --------------------------------------------------------------------

def restriction_members(spark: SparkSession, edges: DataFrame) -> DataFrame:
    """Synthetic restriction relations as member arrays: for every node
    divisible by 11, a relation {via: node, from: some incident edge,
    to: another}, positive iff node % 22 == 0."""
    via = edges.filter(F.col("src") % 11 == 0).groupBy("src").agg(
        F.min("edge_id").alias("from_way"), F.max("edge_id").alias("to_way")
    ).filter(F.col("from_way") != F.col("to_way"))
    return via.select(
        (F.col("src") * 100).alias("rel_id"),
        F.array(
            F.struct(F.lit("node").alias("mtype"), F.col("src").alias("ref"), F.lit("via").alias("role")),
            F.struct(F.lit("way").alias("mtype"), F.col("from_way").alias("ref"), F.lit("from").alias("role")),
            F.struct(F.lit("way").alias("mtype"), F.col("to_way").alias("ref"), F.lit("to").alias("role")),
        ).alias("members"),
        F.when(F.col("src") % 22 == 0, "only_straight_on").otherwise("no_left_turn").alias(
            "restriction"
        ),
    )


def read_restrictions(rels: DataFrame) -> DataFrame:
    """F10: explode members, pivot roles -> (via, from_way, to_way, pos).
    (reference explodes the member list the same way, 1070-1117)."""
    m = rels.select(
        "rel_id", "restriction", F.explode("members").alias("mem")
    ).select(
        "rel_id",
        "restriction",
        F.col("mem.mtype").alias("mtype"),
        F.col("mem.ref").alias("ref"),
        F.col("mem.role").alias("role"),
    )
    piv = (
        m.groupBy("rel_id", "restriction")
        .pivot("role", ["via", "from", "to"])
        .agg(F.min("ref"))
    )
    return piv.select(
        "rel_id",
        F.col("via").alias("via_node"),
        F.col("from").alias("from_way"),
        F.col("to").alias("to_way"),
        F.col("restriction").startswith("only_").alias("positive"),
    ).filter(
        F.col("via_node").isNotNull()
        & F.col("from_way").isNotNull()
        & F.col("to_way").isNotNull()
    )


def restrictions_sql() -> str:
    return f"""{sqlgen.with_ctes("edges")},
via AS (
  SELECT src, MIN(edge_id) AS from_way, MAX(edge_id) AS to_way
  FROM edges WHERE src % 11 = 0
  GROUP BY src HAVING MIN(edge_id) <> MAX(edge_id)
)
SELECT src * 100 AS rel_id,
       src AS via_node, from_way, to_way,
       src % 22 = 0 AS positive
FROM via
"""
