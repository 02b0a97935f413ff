"""Station snapping, window ops, and graph topology passes."""

import pyspark.sql.functions as F

from conftest import SF_DIR, assert_matches_oracle
from pfaedle_spark import constants as C
from pfaedle_spark import datagen, sqlgen
from pfaedle_spark.operators import graph_ops, snap, windows


def test_snap_stations_matches_oracle(spark):
    df = snap.snap_stations(datagen.stations(spark), datagen.station_nodes(spark))
    assert_matches_oracle(df, snap.snap_oracle_sql())


def test_snap_finds_true_node(spark):
    """Every station should snap to its own offset node (name matches,
    dist = hypot(37, 23) ~= 43.6 m, well under the radius)."""
    got = snap.snap_stations(datagen.stations(spark), datagen.station_nodes(spark)).toPandas()
    st = datagen.stations(spark).toPandas()
    assert len(got) == len(st)
    merged = got.merge(
        st.assign(stop_node=st.true_node_id), left_on="stop_id", right_on="stop_id"
    )
    assert (merged.node_id == merged.stop_node).all()


def test_trip_hops(spark):
    df = windows.trip_hops(datagen.points(spark, SF_DIR))
    assert_matches_oracle(df, windows.trip_hops_oracle_sql())


def test_cumulative_dist(spark):
    df = windows.cumulative_dist(datagen.points(spark, SF_DIR))
    assert_matches_oracle(df, windows.cumulative_dist_oracle_sql())


def test_interpolate_times(spark):
    df = windows.interpolate_times(datagen.points(spark, SF_DIR))
    assert_matches_oracle(df, windows.interpolate_times_oracle_sql())


def test_degrees(spark):
    df = graph_ops.degrees(datagen.edges(spark))
    sql = f"""{sqlgen.with_ctes("edges")},
ends AS (SELECT src AS node_id FROM edges UNION ALL SELECT dst FROM edges)
SELECT node_id, COUNT(*) AS degree FROM ends GROUP BY node_id"""
    assert_matches_oracle(df, sql)


def test_odir_edges(spark):
    e = datagen.edges(spark)
    d = graph_ops.write_odir_edges(e)
    n_fwd = e.count()
    n_ow = e.filter("oneway").count()
    assert d.count() == 2 * n_fwd - n_ow
    # reverse rows swap endpoints
    rev = d.filter("reversed")
    bad = rev.join(
        e.select(
            (F.col("edge_id") + (1 << 40)).alias("edge_id"),
            F.col("src").alias("osrc"),
            F.col("dst").alias("odst"),
        ),
        "edge_id",
    ).filter((F.col("src") != F.col("odst")) | (F.col("dst") != F.col("osrc")))
    assert bad.count() == 0


def test_connected_components_closed_form(spark):
    """The river split gives exactly two components with min-ids 0 and
    RIVER_COL — a closed-form oracle for the iterative algorithm."""
    nd, ed = datagen.nodes(spark), datagen.edges(spark)
    labels = graph_ops.connected_components(nd, ed)
    sql = f"""{sqlgen.with_ctes("nodes")}
SELECT node_id, CASE WHEN col >= {C.RIVER_COL} THEN {C.RIVER_COL} ELSE 0 END AS label
FROM nodes"""
    assert_matches_oracle(labels, sql)


def test_component_min_level(spark):
    nd, ed = datagen.nodes(spark), datagen.edges(spark)
    labels = graph_ops.connected_components(nd, ed)
    ml = graph_ops.component_min_level(ed, labels).toPandas().sort_values("comp")
    assert set(ml.comp) == {0, C.RIVER_COL}
    assert (ml.min_level == 0).all()  # grid has level-0 edges in both halves


def test_delete_orphan_nodes(spark):
    nd, ed = datagen.nodes(spark), datagen.edges(spark)
    # all grid nodes touch an edge -> nothing dropped
    assert graph_ops.delete_orphan_nodes(nd, ed).count() == nd.count()
    # cut all edges -> only stations survive
    empty = ed.filter("edge_id < 0")
    survivors = graph_ops.delete_orphan_nodes(nd, empty)
    assert survivors.count() == nd.filter("is_station").count()
