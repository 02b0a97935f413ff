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


def test_eval_summary_matches_duckdb_aggregate(spark, tmp_path):
    """A6 global shares (A_N/N, A_L/L, collector.cpp:389-439): the
    summary aggregate is ONE dialect-neutral SQL string — DuckDB runs it
    over the engine's own per-trip rows and every value must match."""
    import duckdb

    per_trip = entrymod.queries()["frechet_eval"](spark, SF_DIR)
    pdf = per_trip.toPandas()
    assert len(pdf) > 0 and pdf["len_m"].gt(0).all()
    got = evalmetrics.eval_summary(per_trip).toPandas()
    con = duckdb.connect()
    con.register("per_trip", pdf)
    want = con.execute(evalmetrics.eval_summary_sql("per_trip")).fetchdf()
    assert list(got.columns) == list(want.columns)
    for c in got.columns:
        assert np.allclose(
            got[c].astype(float), want[c].astype(float), rtol=1e-12
        ), c
    # shares are true ratios
    row = got.iloc[0]
    assert 0.0 <= row["an_share"] <= 1.0 and 0.0 <= row["al_share"] <= 1.0
    assert row["unmatched_len"] <= row["total_len"]

    # S7 sink round-trip: the d_f histogram lands as a CSV
    from pfaedle_spark.sources.osm import eval_csv_sink

    out = str(tmp_path / "eval-frechet.csv")
    eval_csv_sink(per_trip, "d_f", evalmetrics.DF_BINS, out)
    import pandas as pd

    hist = pd.read_csv(out)
    assert hist["n"].sum() <= len(pdf)  # > max(bin) rows fall outside


def test_df_histogram_matches_duckdb_aggregate(spark):
    """The d_f histogram aggregate (bins + unmatched counts) re-checked
    by DuckDB over the engine's own per-trip rows — same CASE-chain
    binning, same grouping."""
    import duckdb

    per_trip = entrymod.queries()["frechet_eval"](spark, SF_DIR)
    pdf = per_trip.toPandas()
    got = (
        evalmetrics.df_histogram(per_trip)
        .toPandas()
        .sort_values("bin", ignore_index=True)
    )
    case = "CASE "
    for e in evalmetrics.DF_BINS:
        case += f"WHEN d_f <= {e!r} THEN {float(e)!r} "
    case += "ELSE NULL END"
    con = duckdb.connect()
    con.register("per_trip", pdf)
    want = con.execute(
        f"""SELECT {case} AS bin, COUNT(*) AS n,
                   SUM(CASE WHEN unmatched THEN 1 ELSE 0 END) AS n_unmatched
            FROM per_trip GROUP BY 1 ORDER BY bin"""
    ).fetchdf()
    assert len(got) == len(want)
    g = got.fillna(-1.0)
    w = want.fillna(-1.0)
    for c in ["bin", "n", "n_unmatched"]:
        assert np.allclose(g[c].astype(float), w[c].astype(float)), c


def test_frechet_hops_matches_recursive_cte_oracle(spark):
    """The full per-hop kernel — ordered projectOnAfter cuts,
    sub-polyline extraction, densify, Eiter/Mannila DP — against the
    DuckDB recursive-CTE DP on the integer staircase world; values are
    designed bit-identical (exact integer geometry + correctly-rounded
    sqrt, DP is a pure selection)."""
    assert_matches_oracle(
        entrymod.queries()["frechet_hops"](spark, SF_DIR),
        entrymod.oracle_sql()["frechet_hops"],
    )


def test_acc_frechet_hops_matches_recursive_cte_oracle(spark):
    """The ACCUMULATED Fréchet kernel (Geo.h:1602-1627) per hop against
    its recursive-CTE oracle: the 25 m densify grid is identity on the
    staircase sub-polyline and inserts exactly one integer-half midpoint
    on >25 m truth segments (integer dx^2+dy^2 > 625 test), so the
    summed DP and the /max(p,q) normalization are bit-identical."""
    assert_matches_oracle(
        entrymod.queries()["acc_frechet_hops"](spark, SF_DIR),
        entrymod.oracle_sql()["acc_frechet_hops"],
    )


def test_segmentize_hops_matches_window_sum_oracle(spark):
    """W4 on the staircase world: ordered projectOnAfter cut positions
    are exact integer cumulative lengths, so the full projection-scan
    kernel checks bit-exactly against a window-SUM oracle."""
    assert_matches_oracle(
        entrymod.queries()["segmentize_hops"](spark, SF_DIR),
        entrymod.oracle_sql()["segmentize_hops"],
    )


def test_eval_hops_summary_matches_composed_oracle(spark):
    """print_stats composed over the per-hop DP: A_N/N, A_L/L and the
    d_f spread check bit-exactly (order-independent aggregates over
    exactly-representable values — see EVAL_HOPS_EXPRS)."""
    assert_matches_oracle(
        entrymod.queries()["eval_hops_summary"](spark, SF_DIR),
        entrymod.oracle_sql()["eval_hops_summary"],
    )


def test_df_histogram_hops_matches_composed_oracle(spark):
    """EVAL_DF_BINS histogram over the per-hop DP rows vs the CASE-chain
    oracle; also: shares reconcile with the summary row."""
    assert_matches_oracle(
        entrymod.queries()["df_histogram_hops"](spark, SF_DIR),
        entrymod.oracle_sql()["df_histogram_hops"],
    )
    hist = entrymod.queries()["df_histogram_hops"](spark, SF_DIR).toPandas()
    summ = entrymod.queries()["eval_hops_summary"](spark, SF_DIR).toPandas()
    assert hist["n"].sum() == summ["n_hops"].iloc[0]
    assert hist["n_unmatched"].sum() == summ["n_unmatched"].iloc[0]


def test_acc_frechet_hops_semantics(spark):
    """acc_d_f is a per-step AVERAGE coupling distance. Provable bound
    vs the max variant on the same hop: the acc-optimal sum <= the sum
    along the max-optimal coupling <= steps * d_f, and steps
    (p+q-1) < 2*max(p,q), so acc_d_f < 2*d_f. Note the naive
    acc <= d_f does NOT hold (the divisor is max(p,q), not the step
    count). Both variants see identical hop cuts (len_m equal)."""
    acc = entrymod.queries()["acc_frechet_hops"](spark, SF_DIR).toPandas()
    mx = entrymod.queries()["frechet_hops"](spark, SF_DIR).toPandas()
    assert len(acc) == len(mx) > 0
    m = acc.merge(mx, on=["trip_id", "hop_seq"])
    assert (m["acc_d_f"] >= 0).all()
    assert (m["len_m_x"] == m["len_m_y"]).all()
    assert (m["acc_d_f"] < 2.0 * m["d_f"] + 1e-9).all()


def test_frechet_hops_per_hop_semantics(spark):
    """Per-hop get_da granularity: hop lengths tile the clipped aligned
    polyline, d_f >= 0, unmatched <=> d_f >= 20; the A_N/A_L aggregate
    over hops re-checks in DuckDB with the same dialect-neutral string."""
    import duckdb

    hops = entrymod.queries()["frechet_hops"](spark, SF_DIR)
    pdf = hops.toPandas()
    assert len(pdf) > 0
    assert (pdf["d_f"] >= 0).all() and (pdf["len_m"] >= 0).all()
    assert (pdf["unmatched"] == (pdf["d_f"] >= evalmetrics.UNMATCHED_DF)).all()
    # hops per trip = stops - 1 (stops = the STAIRCASE world's stops;
    # an observation can drop from the ALIGNED side, never from stops)
    stops_per_trip = (
        datagen.fh_stops(spark, SF_DIR).groupBy("trip_id").count().toPandas()
    )
    hops_per_trip = pdf.groupby("trip_id").size()
    for _, r in stops_per_trip.iterrows():
        assert hops_per_trip.get(r["trip_id"], 0) == r["count"] - 1

    got = evalmetrics.eval_summary(hops).toPandas()
    con = duckdb.connect()
    con.register("hops", pdf)
    want = con.execute(evalmetrics.eval_summary_sql("hops")).fetchdf()
    for c in got.columns:
        assert np.allclose(got[c].astype(float), want[c].astype(float), rtol=1e-12), c


def test_simplify_staircase_matches_collinearity_oracle(spark):
    """G6 Douglas-Peucker bit-oracled on the staircase world: the REAL
    kernel's kept set must equal the direction-change filter (corners
    survive — every vertical-jump endpoint deviates > eps from any
    candidate chord; collinear stop/detour vertices drop)."""
    assert_matches_oracle(
        entrymod.queries()["simplify_staircase"](spark, SF_DIR),
        entrymod.oracle_sql()["simplify_staircase"],
    )
    df = entrymod.queries()["simplify_staircase"](spark, SF_DIR).toPandas()
    # the world is non-trivial both ways: real drops AND real keeps
    assert (df["n_out"] < df["n_in"]).all()
    assert (df["n_out"] >= 2).all()
