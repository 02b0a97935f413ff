"""GTFS ops, greedy2, Fréchet eval, segmentize — oracle + reference tests."""

import numpy as np
import pyspark.sql.functions as F

import __spark_entry__ as entrymod
from conftest import SF_DIR, assert_matches_oracle
from pfaedle_spark import datagen
from pfaedle_spark.functions.geo import frechet_dist
from pfaedle_spark.operators import evalmetrics


def _entry(name, spark):
    return entrymod.queries()[name](spark, SF_DIR), entrymod.oracle_sql()[name]


def test_shape_refcount_oracle(spark):
    assert_matches_oracle(*_entry("shape_refcount", spark))


def test_edge_lines_oracle(spark):
    assert_matches_oracle(*_entry("edge_lines", spark))


def test_restrictions_oracle(spark):
    assert_matches_oracle(*_entry("restrictions", spark))


def test_greedy2_never_beats_viterbi(spark):
    """The global solve is optimal: greedy2's final accumulated cost is
    >= viterbi's on every trip (equality allowed)."""
    vit = entrymod.queries()["viterbi_align"](spark, SF_DIR)
    gre = entrymod.queries()["greedy2_align"](spark, SF_DIR)
    v_final = {
        r.trip_id: r.acc_cost
        for r in vit.groupBy("trip_id").agg(F.max("acc_cost").alias("acc_cost")).collect()
    }
    g_final = {
        r.trip_id: r.acc_cost
        for r in gre.groupBy("trip_id").agg(F.max("acc_cost").alias("acc_cost")).collect()
    }
    assert set(v_final) == set(g_final)
    for t in v_final:
        if np.isfinite(g_final[t]) and np.isfinite(v_final[t]):
            assert g_final[t] >= v_final[t] - 1e-6, t


def test_frechet_eval_matches_local_reference(spark):
    rows = entrymod.queries()["frechet_eval"](spark, SF_DIR).collect()
    assert rows
    aligned = entrymod._aligned_xy(spark, SF_DIR).collect()
    truth = datagen.points(spark, SF_DIR).select("trip_id", "seq", "x", "y").collect()
    by_trip_a, by_trip_t = {}, {}
    for r in aligned:
        by_trip_a.setdefault(r.trip_id, []).append((r.seq, r.x, r.y))
    for r in truth:
        by_trip_t.setdefault(r.trip_id, []).append((r.seq, r.x, r.y))
    for r in rows[:20]:
        a = sorted(by_trip_a[r.trip_id])
        t = sorted(by_trip_t[r.trip_id])
        want = frechet_dist(
            np.array([p[1] for p in a]), np.array([p[2] for p in a]),
            np.array([p[1] for p in t]), np.array([p[2] for p in t]),
        )
        assert abs(r.d_f - want) < 1e-9
        assert r.unmatched == (want >= evalmetrics.UNMATCHED_DF)


def test_df_histogram_counts(spark):
    ev = entrymod.queries()["frechet_eval"](spark, SF_DIR)
    hist = entrymod.queries()["df_histogram"](spark, SF_DIR).collect()
    total_in_bins = sum(r.n for r in hist)
    n_le_100 = ev.filter(F.col("d_f") <= 100.0).count()
    n_gt_100 = ev.filter(F.col("d_f") > 100.0).count()
    assert total_in_bins == n_le_100 + n_gt_100  # >100 rolls into null bin
    null_bin = [r for r in hist if r.bin is None]
    if n_gt_100:
        assert null_bin and null_bin[0].n == n_gt_100


def test_segmentize_positions_monotone(spark):
    rows = entrymod.queries()["segmentize"](spark, SF_DIR).collect()
    assert rows
    by_trip = {}
    for r in rows:
        by_trip.setdefault(r.trip_id, []).append(r)
    for t, rs in by_trip.items():
        rs.sort(key=lambda r: r.stop_seq)
        for r in rs:
            assert r.end_pos >= r.start_pos - 1e-9
            assert abs(r.seg_len - max(0.0, r.end_pos - r.start_pos)) < 1e-9
        # ordered projectOnAfter: positions never go backwards
        for a, b in zip(rs, rs[1:]):
            assert b.start_pos >= a.start_pos - 1e-9
