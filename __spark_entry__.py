"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship pipeline smoke at sf0.001.
``queries()``   — one callable per implemented operator (SURVEY.md §2).
``oracle_sql()``— DuckDB-equivalent SQL per query (correctness gate).

The synthetic image+caption table (BASELINE.json input_hint) is derived
deterministically from the driver's ``documents`` parquet via pure
integer arithmetic (pfaedle_spark/datagen.py), so the DuckDB oracle
(pfaedle_spark/sqlgen.py) reproduces every value bit-identically.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from pfaedle_spark import constants as C
from pfaedle_spark import datagen, sqlgen
from pfaedle_spark.operators import candidates, cells


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: spatial candidate join + tile assignment at sf0.001."""
    sf_dir = "/root/testdata/sf0.001"
    pts = datagen.points(spark, sf_dir)
    eds = datagen.edges(spark)
    cand = candidates.candidate_edges(pts, eds)
    return cells.tile_assign(cand.filter("rank = 1").withColumnRenamed("dist", "snap_dist"))


# ---------------------------------------------------------------------------
# queries / oracles
# ---------------------------------------------------------------------------

def _q_tile_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cells.tile_assign(datagen.points(spark, sf_dir)).select(
        "image_id", "trip_id", "seq", "cell_id"
    )


def _q_points_derive(spark: SparkSession, sf_dir: str) -> DataFrame:
    return datagen.points(spark, sf_dir)


def _q_edge_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        cells.edge_cells(datagen.edges(spark))
        .select("cell_id", "edge_id")
        .dropDuplicates(["cell_id", "edge_id"])
    )


def _q_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    return candidates.candidate_edges(datagen.points(spark, sf_dir), datagen.edges(spark))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "points_derive": _q_points_derive,
        "tile_assign": _q_tile_assign,
        "edge_cells": _q_edge_cells,
        "candidates_knn": _q_candidates,
    }


def oracle_sql() -> dict[str, str]:
    import math

    n_ed = math.ceil(C.GRID_SPACING / C.CELL) + 1
    offs = "(VALUES " + ",".join(f"({i})" for i in range(n_ed + 1)) + ")"
    return {
        "points_derive": sqlgen.with_ctes("points") + " SELECT * FROM points",
        "tile_assign": (
            sqlgen.with_ctes("points")
            + f" SELECT image_id, trip_id, seq, {sqlgen.cell_id('x', 'y')} AS cell_id FROM points"
        ),
        "edge_cells": f"""{sqlgen.with_ctes("edges")}
SELECT DISTINCT
       (CAST(FLOOR(LEAST(e.x1,e.x2)/{C.CELL}) AS BIGINT) + ox.o) * {C.CELL_STRIDE}
       + CAST(FLOOR(LEAST(e.y1,e.y2)/{C.CELL}) AS BIGINT) + oy.o AS cell_id,
       e.edge_id
FROM edges e, {offs} ox(o), {offs} oy(o)
WHERE CAST(FLOOR(LEAST(e.x1,e.x2)/{C.CELL}) AS BIGINT) + ox.o
        <= CAST(FLOOR(GREATEST(e.x1,e.x2)/{C.CELL}) AS BIGINT)
  AND CAST(FLOOR(LEAST(e.y1,e.y2)/{C.CELL}) AS BIGINT) + oy.o
        <= CAST(FLOOR(GREATEST(e.y1,e.y2)/{C.CELL}) AS BIGINT)
""",
        "candidates_knn": candidates.candidates_oracle_sql(),
    }
