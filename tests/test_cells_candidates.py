"""Grid-cell index + spatial candidate join vs DuckDB oracle."""

import pyspark.sql.functions as F

from conftest import SF_DIR, assert_matches_oracle
from pfaedle_spark import constants as C
from pfaedle_spark import datagen, sqlgen
from pfaedle_spark.operators import candidates, cells


def test_points_derivation(spark):
    df = datagen.points(spark, SF_DIR)
    sql = sqlgen.with_ctes("points") + " SELECT * FROM points"
    assert_matches_oracle(df, sql)


def test_edges_derivation(spark):
    df = datagen.edges(spark)
    sql = sqlgen.with_ctes("edges") + " SELECT * FROM edges"
    assert_matches_oracle(df, sql)
    # two components: no horizontal edge crosses the river column
    bad = df.filter(
        (F.col("x1") != F.col("x2"))
        & (F.col("src") % C.GRID_N == C.RIVER_COL - 1)
    ).count()
    assert bad == 0


def test_tile_assign(spark):
    df = cells.tile_assign(datagen.points(spark, SF_DIR)).select(
        "image_id", "trip_id", "seq", "cell_id"
    )
    sql = (
        sqlgen.with_ctes("points")
        + f" SELECT image_id, trip_id, seq, {sqlgen.cell_id('x', 'y')} AS cell_id FROM points"
    )
    assert_matches_oracle(df, sql)


def test_candidate_edges_matches_oracle(spark):
    pts = datagen.points(spark, SF_DIR)
    eds = datagen.edges(spark)
    df = candidates.candidate_edges(pts, eds)
    assert_matches_oracle(df, candidates.candidates_oracle_sql())


def test_candidate_edges_salted_same_result(spark):
    pts = datagen.points(spark, SF_DIR)
    eds = datagen.edges(spark)
    plain = candidates.candidate_edges(pts, eds).toPandas()
    salted = candidates.candidate_edges(pts, eds, salt=4).toPandas()
    key = ["image_id", "rank"]
    p = plain.sort_values(key, ignore_index=True)
    s = salted.sort_values(key, ignore_index=True)
    assert p[["image_id", "edge_id", "rank"]].equals(s[["image_id", "edge_id", "rank"]])


def test_every_point_has_candidates(spark):
    pts = datagen.points(spark, SF_DIR)
    eds = datagen.edges(spark)
    cand = candidates.candidate_edges(pts, eds)
    n_pts = pts.count()
    n_with = cand.filter("rank = 1").count()
    # grid spacing 2048 m, radius 1500 m: nearly every in-grid point has a
    # candidate; points beyond the last grid row/col (y >= 63488+1500) may not.
    assert n_with >= 0.9 * n_pts


def test_salted_candidate_join_is_semantically_identical(spark):
    """North rule: explicit salting for hot cells. Salting s-ways
    replicates the edge side and splits each hot cell across s
    composite keys — the result rows must be EXACTLY the unsalted ones."""
    pts = datagen.points(spark, SF_DIR)
    eds = datagen.edges(spark)
    plain = candidates.candidate_edges(pts, eds).collect()
    salted = candidates.candidate_edges(pts, eds, salt=4).collect()
    key = lambda r: (r.image_id, r.rank)
    assert sorted(map(key, plain)) == sorted(map(key, salted))
    pv = {(r.image_id, r.rank): (r.edge_id, r.dist) for r in plain}
    sv = {(r.image_id, r.rank): (r.edge_id, r.dist) for r in salted}
    assert pv == sv
