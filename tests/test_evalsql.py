"""Round-5 REAL-world eval oracles (operators/evalsql.py): the last
five formerly rows-only queries against their bit-exact DuckDB twins.

These mirror what the grading driver does (sf0.001 here for speed; the
worlds are identical to sf0.01 — both read the same 500-doc table), so
a kernel drift (hypot vs sqrt, pairwise vs sequential sums, argmin
tie-breaks) fails HERE before it fails a graded row.
"""

import numpy as np

import __spark_entry__ as entrymod
from conftest import SF_DIR, assert_matches_oracle
from pfaedle_spark import datagen
from pfaedle_spark.operators import evalsql


def _entry(name, spark):
    return entrymod.queries()[name](spark, SF_DIR), entrymod.oracle_sql()[name]


def test_simplify_geoms_real_oracle(spark):
    """DP on the zigzag world: exact n_in/n_out per edge, and the world
    is non-trivial (drops interior points, keeps some kinks)."""
    df, sql = _entry("simplify_geoms", spark)
    assert_matches_oracle(df, sql)
    pdf = df.toPandas()
    assert (pdf["n_out"] < pdf["n_in"]).all()
    assert (pdf["n_out"] > 2).any()  # some kinks survive > endpoints


def test_segmentize_real_oracle(spark):
    """The projectOnAfter cut scan on the viterbi-aligned polyline:
    monotone positions, hops per trip = stops - 1."""
    df, sql = _entry("segmentize", spark)
    assert_matches_oracle(df, sql)
    pdf = df.toPandas()
    assert (pdf["end_pos"] >= pdf["start_pos"]).all()
    stops = datagen.points(spark, SF_DIR).groupBy("trip_id").count().toPandas()
    hops = pdf.groupby("trip_id").size()
    for _, r in stops.iterrows():
        assert hops.get(r["trip_id"], 0) == r["count"] - 1


def test_frechet_eval_real_oracle(spark):
    """The full densify + wavefront DP chain: both variants bit-match,
    and the acc < 2*max bound holds on the real world too."""
    df, sql = _entry("frechet_eval", spark)
    assert_matches_oracle(df, sql)
    pdf = df.toPandas()
    n_trips = datagen.points(spark, SF_DIR).select("trip_id").distinct().count()
    assert len(pdf) == n_trips
    assert (pdf["d_f"] > 0).all() and (pdf["len_m"] > 0).all()
    assert (pdf["acc_d_f"] < 2.0 * pdf["d_f"] + 1e-9).all()


def test_eval_summary_real_oracle(spark):
    """The sequential print_stats accumulator: the single summary row
    bit-matches the recursive-accumulator oracle, and its fields are
    consistent with the per-trip rows."""
    df, sql = _entry("eval_summary", spark)
    assert_matches_oracle(df, sql)
    row = df.toPandas().iloc[0]
    per = entrymod.queries()["frechet_eval"](spark, SF_DIR).toPandas()
    assert row["n_trips"] == len(per)
    assert row["min_d_f"] == per["d_f"].min()
    assert row["max_d_f"] == per["d_f"].max()
    assert np.isclose(row["avg_d_f"], per["d_f"].mean(), rtol=1e-12)


def test_df_histogram_real_oracle(spark):
    """The DF_BINS first-match CASE over the real per-trip rows (every
    d_f on this world exceeds the last bin -> one NULL-bin row; the
    staircase twin df_histogram_hops exercises the populated bins)."""
    df, sql = _entry("df_histogram", spark)
    assert_matches_oracle(df, sql)


def test_densify_chain_counts_match_kernel(spark):
    """The oracle's recursive curd chain inserts EXACTLY the kernel's
    points: per-side densified counts (dims CTE) equal geo.densify's
    output lengths trip by trip."""
    import duckdb

    from pfaedle_spark.functions.geo import _eff_seg, densify

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    dims = con.execute(
        evalsql._evaled_ctes(include_acc=False)
        + "\nSELECT trip_id, p, q FROM dm_df"
    ).fetchdf().set_index("trip_id")

    aligned = entrymod._aligned_xy(spark, SF_DIR).toPandas()
    truth = datagen.points(spark, SF_DIR).toPandas()
    for trip, grp in aligned.groupby("trip_id"):
        ga = grp.sort_values("seq")
        gb = truth[truth["trip_id"] == trip].sort_values("seq")
        ax, ay = ga["x"].to_numpy(float), ga["y"].to_numpy(float)
        bx, by = gb["x"].to_numpy(float), gb["y"].to_numpy(float)
        seg = max(_eff_seg(ax, ay, 50.0), _eff_seg(bx, by, 50.0))
        dax, _ = densify(ax, ay, seg)
        dbx, _ = densify(bx, by, seg)
        assert dims.loc[trip, "p"] == len(dax), trip
        assert dims.loc[trip, "q"] == len(dbx), trip
