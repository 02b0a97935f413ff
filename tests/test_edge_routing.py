"""R2/R3/J4 gates: edge-based Dijkstra, full cost vector, restriction
enforcement. Brute-force python references plus the driver oracles."""

import itertools

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from conftest import assert_matches_oracle
from pfaedle_spark import datagen
from pfaedle_spark.operators import edge_routing as ER
from pfaedle_spark.operators import gtfs_ops


def brute_force_cost(trans: pd.DataFrame, src: int, dst: int, max_hops: int = 8):
    """All simple paths up to max_hops transitions (toy graphs only)."""
    adj = {}
    for f, t, c in zip(trans["from_edge"], trans["to_edge"], trans["cost"]):
        adj.setdefault(int(f), []).append((int(t), float(c)))
    best = None
    stack = [(src, 0.0, {src})]
    while stack:
        u, acc, seen = stack.pop()
        if u == dst and (best is None or acc < best):
            best = acc
        if len(seen) > max_hops:
            continue
        for v, c in adj.get(u, []):
            if v not in seen:
                stack.append((v, acc + c, seen | {v}))
    return best


def test_edge_dijkstra_matches_brute_force_on_toy_graph():
    rng = np.random.default_rng(7)
    edges = list(range(12))
    rows = []
    for f, t in itertools.permutations(edges, 2):
        if rng.random() < 0.25:
            rows.append((f, t, float(rng.integers(1, 100))))
    trans = pd.DataFrame(rows, columns=["from_edge", "to_edge", "cost"])
    csr = ER.build_edge_csr(trans)
    for src in [0, 3, 7]:
        d = ER.edge_dijkstra(csr, src)
        for dst in edges:
            want = 0.0 if dst == src else brute_force_cost(trans, src, dst, max_hops=12)
            got = d.get(dst)
            if want is None:
                assert got is None
            else:
                assert got == pytest.approx(want, abs=1e-12), (src, dst)


def _sub_setup(spark, opts):
    edges = ER._sub_edges(spark)
    restr = gtfs_ops.read_restrictions(gtfs_ops.restriction_members(spark, edges))
    trans = ER.turn_transitions(edges, restr, datagen.nodes(spark), opts=opts)
    return edges, restr, trans.toPandas()


def test_negative_restriction_forces_detour(spark):
    """Via node 33 carries no_left_turn (from way 66 to way 67). With a
    prohibitive violation punish the optimum must route AROUND the
    restricted turn instead of paying it — cost stays far below the
    punish, but above the unrestricted optimum."""
    hard = {**ER.OPTS, "oneway_punish_fac": 1e6}
    _, _, tp_hard = _sub_setup(spark, hard)
    _, _, tp_soft = _sub_setup(spark, ER.OPTS)

    # drop the restriction rows entirely for the unrestricted baseline
    edges = ER._sub_edges(spark)
    no_restr = gtfs_ops.read_restrictions(
        gtfs_ops.restriction_members(spark, edges)
    ).filter(F.lit(False))
    tp_free = ER.turn_transitions(
        edges, no_restr, datagen.nodes(spark), opts=ER.OPTS
    ).toPandas()

    src_state = 66 + ER.REV_OFF  # traveling way 66 backwards: 34 -> 33
    tgt_state = 67               # departing 33 -> 65 on way 67 (forbidden turn)
    d_hard = ER.edge_dijkstra(ER.build_edge_csr(tp_hard), src_state, {tgt_state})
    d_free = ER.edge_dijkstra(ER.build_edge_csr(tp_free), src_state, {tgt_state})
    got, free = d_hard[tgt_state], d_free[tgt_state]
    assert got < 1e6, "route paid the prohibitive restriction punish"
    assert got > free, "restriction did not change the optimum"
    # soft mode (reference default): violation = oneway-meter punish
    d_soft = ER.edge_dijkstra(ER.build_edge_csr(tp_soft), src_state, {tgt_state})
    assert free < d_soft[tgt_state] <= got


def test_positive_restriction_only_straight_on(spark):
    """Via node 66 carries only_straight_on (from way 132 must continue
    on way 133): any OTHER turn out of 66 after arriving on way 132 is a
    violation row in the transition table."""
    _, _, tp = _sub_setup(spark, {**ER.OPTS, "oneway_punish_fac": 1e6})
    arriving = tp[tp["from_edge"] % ER.REV_OFF == 132]
    arriving = arriving[arriving["via_node"] == 66]
    mandated = arriving[arriving["to_edge"] % ER.REV_OFF == 133]
    others = arriving[arriving["to_edge"] % ER.REV_OFF != 133]
    assert len(mandated) > 0 and len(others) > 0
    assert (mandated["cost"] < 1e6).all()
    assert (others["cost"] > 1e6).all()


def test_full_turn_and_level_terms(spark):
    """Spot-check the R3 terms on hand-computable transitions."""
    edges = ER._sub_edges(spark)
    restr = gtfs_ops.read_restrictions(
        gtfs_ops.restriction_members(spark, edges)
    ).filter(F.lit(False))
    tp = ER.turn_transitions(edges, restr, datagen.nodes(spark)).toPandas()
    lv = ER.OPTS["level_punish"]

    def one(f, t):
        r = tp[(tp["from_edge"] == f) & (tp["to_edge"] == t)]
        assert len(r) == 1, (f, t)
        return float(r["cost"].iloc[0])

    # edge 4 = h(2->3), level 2 % 8 = 2; via node 3 (deg 3, not station,
    # line level<3 present unmatched). U-turn 4 -> rev(4):
    # traverse 2048*lv[2] + line 2048*cmp + full turn 3000 + no station.
    # node 2: col 2 row 0 -> (2+0)%9 != 0, via node 3 not station.
    cmp_unmatched = 1.0 - 0.333333333  # to/from simi match 'st 3'/'st 5'? compute below
    # compute expected cmp from the line attached to edge 4: line 'l20',
    # from 'st 2', to 'st 3'; rattrs short 'l10' (no), to 'st 5' (no),
    # from 'st 3' (statSimi('st 2','st 3') = 0; lengths equal -> rel
    # edit dist 1/4 >= 0.05) -> cur = 1.0, cmp = 1.0
    direct = one(4, 4 + ER.REV_OFF)
    expected = 2048.0 * lv[2] + 2048.0 * 1.0 * 1.0 + 3000.0
    assert direct == pytest.approx(expected, abs=1e-9)

    # straight-through at a deg-4 interior node is NOT a full turn:
    # h(1->2) edge 2 -> h(2->3) edge 4, via node 2 (deg 4): angle 180.
    # edge 2 level 1, line 'l10' from 'st 1' to 'st 2': short matches
    # (1/3 off), to 'st 5' vs line to 'st 2': no; from 'st 3' vs line
    # from 'st 1': no -> cur = 1 - 1/3, cmp = 0.666666667
    straight = one(2, 4)
    exp2 = 2048.0 * lv[1] + 2048.0 * (1.0 - 0.333333333)
    assert straight == pytest.approx(exp2, abs=1e-6)

    # 90-degree turn at deg-4 node 2 IS a full turn at the cfg's 100-deg
    # threshold: h(1->2) -> v(2->34) edge 5
    turn = one(2, 5)
    assert turn == pytest.approx(exp2 + 3000.0, abs=1e-6)


def test_pass_thru_station_term(spark):
    """Transitions over a station via node carry the pass-thru punish."""
    edges = ER._sub_edges(spark)
    restr = gtfs_ops.read_restrictions(
        gtfs_ops.restriction_members(spark, edges)
    ).filter(F.lit(False))
    tp = ER.turn_transitions(edges, restr, datagen.nodes(spark)).toPandas()
    nd = datagen.nodes(spark).filter("is_station").select("node_id").toPandas()
    station_vias = set(nd["node_id"]) & set(tp["via_node"])
    assert station_vias, "no station via nodes in sub-grid"
    # same from-edge, station via vs non-station via of same geometry is
    # hard to pair exactly; instead verify the term via the oracle match
    # (driver) and check stations are never free relative to the
    # station-less recomputation:
    tp_nostation = ER.turn_transitions(
        edges, restr, datagen.nodes(spark).withColumn("is_station", F.lit(False))
    ).toPandas()
    m = tp.merge(tp_nostation, on=["from_edge", "to_edge"], suffixes=("", "_ns"))
    on_station = m[m["via_node"].isin(station_vias)]
    off_station = m[~m["via_node"].isin(station_vias)]
    assert (
        on_station["cost"] - on_station["cost_ns"]
        == ER.OPTS["pass_thru_station_punish"]
    ).all()
    assert (off_station["cost"] == off_station["cost_ns"]).all()


def test_turn_transitions_matches_oracle(spark):
    assert_matches_oracle(
        entrymod.queries()["turn_transitions"](spark, None),
        entrymod.oracle_sql()["turn_transitions"],
    )


def test_restricted_paths_matches_oracle(spark):
    assert_matches_oracle(
        entrymod.queries()["restricted_paths"](spark, None),
        entrymod.oracle_sql()["restricted_paths"],
    )


def _bf_state_cost(trans: pd.DataFrame, rounds: int = 220) -> dict:
    """Independent all-pairs shortest path: Bellman-Ford relaxation over
    the raw transition rows (no CSR/heap code shared with the engine)."""
    frm = trans["from_edge"].to_numpy(np.int64)
    to = trans["to_edge"].to_numpy(np.int64)
    c = trans["cost"].to_numpy(np.float64)
    states = sorted(set(frm) | set(to))
    idx = {s: i for i, s in enumerate(states)}
    n = len(states)
    d = np.full((n, n), np.inf)
    d[np.arange(n), np.arange(n)] = 0.0
    fi = np.array([idx[s] for s in frm])
    ti = np.array([idx[s] for s in to])
    for _ in range(rounds):
        nd = d.copy()
        for k in range(len(fi)):
            cand = d[:, fi[k]] + c[k]
            np.minimum(nd[:, ti[k]], cand, out=nd[:, ti[k]])
        if np.array_equal(nd, d, equal_nan=True):
            break
        d = nd
    return {"d": d, "idx": idx}


def _bf_viterbi(layers, apsp) -> float:
    """Brute-force DP over (state, emission) layers using the BF matrix;
    returns the optimal total cost."""
    d, idx = apsp["d"], apsp["idx"]
    costs = [em for _, em in layers[0]]
    prev = layers[0]
    for lay in layers[1:]:
        new = []
        for st, em in lay:
            best = np.inf
            for i, (pst, _) in enumerate(prev):
                if pst in idx and st in idx:
                    t = d[idx[pst], idx[st]]
                else:
                    t = np.inf
                cand = costs[i] + t + em
                if cand < best:
                    best = cand
            new.append(best)
        costs = new
        prev = lay
    return float(np.min(costs))


def test_viterbi_full_matches_brute_force(spark):
    """Engine viterbi_full vs an independent BF-matrix DP on two trips
    restricted to the 8x8 sub-grid world."""
    from pfaedle_spark.operators import candidates as cand_ops

    eds = ER._sub_edges(spark)
    pts = datagen.points(spark, "/root/testdata/sf0.001").filter(
        (F.col("x") < ER.SUB_N * 2048.0) & (F.col("y") < ER.SUB_N * 2048.0)
    )
    cand = cand_ops.candidate_edges(pts, eds)
    assert cand.count() > 0, "no sub-grid candidates at sf0.001"
    restr = gtfs_ops.read_restrictions(gtfs_ops.restriction_members(spark, eds))
    nodes = datagen.nodes(spark)
    tbv = {
        v: ER.turn_transitions(
            eds, restr, nodes, rattrs=ER.rattrs_for_variant(v)
        ).toPandas()
        for v in range(ER.N_RATTR_VARIANTS)
    }
    got = ER.viterbi_full(cand, tbv).toPandas()

    cand_pdf = cand.withColumn("emission", F.expr(ER.emission_expr())).toPandas()
    apsp = {v: _bf_state_cost(tbv[v]) for v in tbv}
    for trip_id, g in cand_pdf.groupby("trip_id"):
        variant = int(trip_id.split("_")[1]) % ER.N_RATTR_VARIANTS
        layers = []
        for seq in sorted(g["seq"].unique()):
            lay = g[g["seq"] == seq][["edge_id", "emission"]].drop_duplicates()
            states = []
            for e, em in zip(lay["edge_id"], lay["emission"]):
                states.append((int(e), float(em)))
                states.append((int(e) + ER.REV_OFF, float(em)))
            layers.append(sorted(states))
        total = _bf_viterbi(layers, apsp[variant])
        eng = got[got["trip_id"] == trip_id].sort_values("seq")
        assert len(eng) == len(layers), trip_id
        # compare the accumulated optimum (equal-cost ties may choose
        # different paths across independent implementations; the
        # optimal VALUE is unique)
        assert float(eng["acc_cost"].iloc[-1]) == pytest.approx(total, rel=1e-12), trip_id


def test_viterbi_full_echo_trips_identical(spark):
    """A1 property: an echoed (duplicate) trip gets the identical
    alignment, solved once via the shared fingerprint."""
    from pfaedle_spark.operators import candidates as cand_ops

    eds = ER._sub_edges(spark)
    pts = datagen.points(spark, "/root/testdata/sf0.001").filter(
        (F.col("x") < ER.SUB_N * 2048.0) & (F.col("y") < ER.SUB_N * 2048.0)
    )
    cand = ER.echo_candidates(cand_ops.candidate_edges(pts, eds))
    fpr = ER.trip_fingerprints(cand).toPandas()
    # every echoed trip must share its original's fingerprint
    orig = fpr[~fpr["trip_id"].str.startswith("e")].set_index("trip_id")["fingerprint"]
    echo = fpr[fpr["trip_id"].str.startswith("e")]
    for t, f in zip(echo["trip_id"], echo["fingerprint"]):
        assert orig[t[1:]] == f, t
    restr = gtfs_ops.read_restrictions(gtfs_ops.restriction_members(spark, eds))
    nodes = datagen.nodes(spark)
    tbv = {
        v: ER.turn_transitions(
            eds, restr, nodes, rattrs=ER.rattrs_for_variant(v)
        ).toPandas()
        for v in range(ER.N_RATTR_VARIANTS)
    }
    got = ER.viterbi_full(cand, tbv).toPandas()
    o = got[~got["trip_id"].str.startswith("e")].copy()
    e = got[got["trip_id"].str.startswith("e")].copy()
    e["trip_id"] = e["trip_id"].str[1:]
    e["image_id"] = e["image_id"].str[1:]
    m = o.merge(e, on=["trip_id", "seq"], suffixes=("", "_e"))
    assert len(m) == len(o) == len(e)
    assert (m["state_edge"] == m["state_edge_e"]).all()
    assert (m["acc_cost"] == m["acc_cost_e"]).all()


def test_shape_assembly_geometric_invariants(spark):
    """R10 gates: the assembled polyline is connected (every consecutive
    point pair is a directed edge of the graph, correctly oriented),
    cum_dist is the running sum of walked edge lengths, and the walk
    starts at the first chosen candidate state's source point."""
    from pfaedle_spark.operators import candidates as cand_ops

    eds = ER._sub_edges(spark)
    pts = datagen.points(spark, "/root/testdata/sf0.001").filter(
        (F.col("x") < ER.SUB_N * 2048.0) & (F.col("y") < ER.SUB_N * 2048.0)
    )
    cand = cand_ops.candidate_edges(pts, eds)
    restr = gtfs_ops.read_restrictions(gtfs_ops.restriction_members(spark, eds))
    nodes = datagen.nodes(spark)
    tbv = {
        v: ER.turn_transitions(
            eds, restr, nodes, rattrs=ER.rattrs_for_variant(v)
        ).toPandas()
        for v in range(ER.N_RATTR_VARIANTS)
    }
    dedges = ER.directed_full(eds).toPandas()
    got = ER.shape_assembly(cand, tbv, dedges).toPandas()
    assert len(got) > 0
    geo = dedges.set_index("edge_id")
    # stop coords per (trip, seq) for the projection-clipped endpoints —
    # from the CANDIDATES (a stop with no candidate edge contributes no
    # DP layer, so the engine's first/last layer is the first/last seq
    # with candidates, not the first/last raw point)
    stop_xy = (
        cand.select("trip_id", "seq", "x", "y").distinct().toPandas()
        .sort_values(["trip_id", "seq"]).groupby("trip_id")
    )

    def oriented(st):
        e = geo.loc[st % ER.REV_OFF]
        if st >= ER.REV_OFF:
            return e["x2"], e["y2"], e["x1"], e["y1"], e["length"]
        return e["x1"], e["y1"], e["x2"], e["y2"], e["length"]

    def proj_t(px, py, st):
        sx, sy, ex, ey, _ = oriented(st)
        len2 = (ex - sx) ** 2 + (ey - sy) ** 2
        t = ((px - sx) * (ex - sx) + (py - sy) * (ey - sy)) / len2
        return min(1.0, max(0.0, t))

    # clustered trips carry their representative's shape (the engine
    # solves once per fingerprint and copies, shape_builder.cpp:219) —
    # so the clipped endpoints are the REP trip's stop projections
    rep_of = (
        ER.trip_fingerprints(cand)
        .select("trip_id", "rep_trip").toPandas()
        .set_index("trip_id")["rep_trip"].to_dict()
    )
    for trip_id, g in got.groupby("trip_id"):
        g = g.sort_values("pt_seq").reset_index(drop=True)
        sxy = stop_xy.get_group(rep_of[trip_id])
        t0 = proj_t(sxy["x"].iloc[0], sxy["y"].iloc[0], int(g["edge_state"].iloc[0]))
        tL = proj_t(sxy["x"].iloc[-1], sxy["y"].iloc[-1], int(g["edge_state"].iloc[-1]))
        if len(g) == 2 and int(g["edge_state"].iloc[0]) == int(g["edge_state"].iloc[1]):
            tL = max(tL, t0)
        assert (g["cum_dist"].diff().dropna() >= 0).all(), trip_id
        n = len(g)
        for i in range(1, n):
            st = int(g["edge_state"].iloc[i])
            sx, sy, ex, ey, ln = oriented(st)
            frac = 1.0
            if i == 1:
                # head clipped at the first stop's projection
                sx = sx + t0 * (ex - sx)
                sy = sy + t0 * (ey - sy)
                frac -= t0
            if i == n - 1:
                # tail clipped at the last stop's projection
                sx0, sy0, ex0, ey0, _ = oriented(st)
                ex = sx0 + tL * (ex0 - sx0)
                ey = sy0 + tL * (ey0 - sy0)
                frac -= 1.0 - tL
            assert g["x"].iloc[i] == pytest.approx(ex, abs=1e-9), (trip_id, i)
            assert g["y"].iloc[i] == pytest.approx(ey, abs=1e-9), (trip_id, i)
            assert g["x"].iloc[i - 1] == pytest.approx(sx, abs=1e-9), (trip_id, i)
            assert g["y"].iloc[i - 1] == pytest.approx(sy, abs=1e-9), (trip_id, i)
            assert g["cum_dist"].iloc[i] - g["cum_dist"].iloc[i - 1] == pytest.approx(
                ln * max(frac, 0.0), rel=1e-9, abs=1e-9
            )
    # the viterbi choice and the walk agree: each trip's first walked
    # state is its first chosen candidate state
    vit = ER.viterbi_full(cand, tbv).toPandas()
    first_choice = (
        vit.sort_values("seq").groupby("trip_id").first()["state_edge"].to_dict()
    )
    first_walk = (
        got.sort_values("pt_seq").groupby("trip_id").first()["edge_state"].to_dict()
    )
    assert first_choice.keys() == first_walk.keys()
    for t in first_choice:
        assert first_choice[t] == first_walk[t], t


def test_trip_clusters_matches_oracle(spark):
    assert_matches_oracle(
        entrymod.queries()["trip_clusters"](spark, "/root/testdata/sf0.001"),
        entrymod.oracle_sql()["trip_clusters"],
    )


def test_turn_transitions_plan_stays_jvm_side(spark):
    import contextlib
    import io

    df = entrymod.queries()["turn_transitions"](spark, None)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "BatchEvalPython" not in plan
    assert "PythonUDF" not in plan


def test_hop_band_semantics(spark):
    """R5 (getHopBand, router.cpp:229-306): the band caps the search at
    max(pilot cost, pend*lvlPunish[2])*3 + turn/station pens. On the
    sub-grid every target's route cost sits inside that envelope, so
    the band must not change any result; on a toy chain whose route
    cost far exceeds both the pilot and the straight-line envelope, the
    beyond-band target reports inf (absent) while band=False reaches
    it."""
    eds = ER._sub_edges(spark)
    restr = gtfs_ops.read_restrictions(gtfs_ops.restriction_members(spark, eds))
    nodes = datagen.nodes(spark)
    tpdf = ER.turn_transitions(
        eds, restr, nodes, rattrs=ER.rattrs_for_variant(0)
    ).toPandas()
    csr = ER.build_edge_csr(tpdf)
    states = sorted(csr["idx"].keys())
    seed = states[0]
    targets = states[1:40:7]
    banded, ob = ER.edge_dijkstra_viterbi_step(csr, [(seed, 0.0)], targets)
    unbanded, ou = ER.edge_dijkstra_viterbi_step(
        csr, [(seed, 0.0)], targets, band=False
    )
    assert banded == unbanded and ob == ou  # band is invisible in-envelope

    # toy: A->B->C->D->E->F chain, each transition 10000, all states
    # within 200 m straight-line => band = max(10000, ~300)*3 + 3100;
    # F costs 50000 > band => pruned; B (the pilot) survives.
    toy = pd.DataFrame(
        {
            "from_edge": [0, 1, 2, 3, 4],
            "to_edge": [1, 2, 3, 4, 5],
            "cost": [10000.0] * 5,
            "fx": [0.0, 40.0, 80.0, 120.0, 160.0],
            "fy": [0.0] * 5,
            "tx": [40.0, 80.0, 120.0, 160.0, 200.0],
            "ty": [0.0] * 5,
        }
    )
    tcsr = ER.build_edge_csr(toy)
    b, _ = ER.edge_dijkstra_viterbi_step(tcsr, [(0, 0.0)], [1, 5])
    u, _ = ER.edge_dijkstra_viterbi_step(tcsr, [(0, 0.0)], [1, 5], band=False)
    assert b[1] == u[1] == 10000.0
    assert u[5] == 50000.0
    assert 5 not in b  # beyond the band => inf, as the reference prunes


def test_hop_band_no_shadowing_through_shared_state():
    """The combined multi-source search must match the reference's
    PAIRWISE hop banding (router.cpp:626-688) even when a low-dp seed
    settles a shared transit state first and its own continuation is
    out-of-band: the in-band higher-dp seed's pair must stay finite.

    Construction: seed A (dp 0) reaches transit u at hop 30000 and
    settles it (total 30000 < seed B's 26000+5000); A's delivery to T
    has hop 35000 > band_cap (= 3*pilot 10000 + 3100 = 33100), while
    pair (B, T) has hop 10000 — strictly in-band. The pairwise-exact
    answer is dp_B + hop_B = 36000 via B."""
    toy = pd.DataFrame(
        {
            "from_edge": [0, 0, 10, 50],
            "to_edge": [100, 50, 50, 60],
            "cost": [10000.0, 30000.0, 5000.0, 5000.0],
            "fx": [0.0, 0.0, 10.0, 20.0],
            "fy": [0.0] * 4,
            "tx": [5.0, 20.0, 20.0, 30.0],
            "ty": [0.0] * 4,
        }
    )
    tcsr = ER.build_edge_csr(toy)
    seeds = [(0, 0.0), (10, 26000.0)]
    banded, ob = ER.edge_dijkstra_viterbi_step(tcsr, seeds, [100, 60])
    assert banded[100] == 10000.0 and ob[100] == 0  # pilot via A
    # pair (A,T) hop 35000 is out-of-band => inf; pair (B,T) survives
    assert banded[60] == 36000.0 and ob[60] == 1
    unbanded, ou = ER.edge_dijkstra_viterbi_step(
        tcsr, seeds, [100, 60], band=False
    )
    assert unbanded[60] == 35000.0 and ou[60] == 0  # min TOTAL ignores band


def test_trip_debug_agrees_with_viterbi_full(spark, tmp_path):
    """-T debug layers: the chosen=true rows reproduce viterbi_full's
    (seq, state, cost) for the trip exactly; every layer exposes all its
    candidate states; the GeoJSON dump round-trips."""
    import json

    import __spark_entry__ as entrymod
    from conftest import SF_DIR
    from pfaedle_spark import datagen
    from pfaedle_spark.sources.osm import geojson_sink

    dbg = entrymod.queries()["trip_debug"](spark, SF_DIR).toPandas()
    assert len(dbg) > 0
    full = (
        entrymod.queries()["viterbi_full"](spark, SF_DIR)
        .filter("trip_id = 'trip_3'")
        .toPandas()
        .sort_values("seq", ignore_index=True)
    )
    chosen = dbg[dbg["chosen"]].sort_values("seq", ignore_index=True)
    assert list(chosen["seq"]) == list(full["seq"])
    assert list(chosen["state_edge"]) == list(full["state_edge"])
    assert np.allclose(chosen["acc_cost"], full["acc_cost"], rtol=1e-12)
    # every layer carries >1 state (fwd+rev per candidate edge)
    per_layer = dbg.groupby("seq").size()
    assert (per_layer >= 2).all()
    # exactly one chosen state per layer
    assert (dbg.groupby("seq")["chosen"].sum() == 1).all()

    # GeoJSON dump of the chosen states' candidate nodes
    nodes = datagen.nodes(spark)
    chosen_df = spark.createDataFrame(chosen[["seq", "edge_id", "acc_cost"]])
    eds = datagen.edges(spark).select("edge_id", "x1", "y1")
    pts = chosen_df.join(eds, "edge_id").select(
        "seq", "edge_id", "acc_cost", F.col("x1").alias("x"), F.col("y1").alias("y")
    )
    out = geojson_sink(pts, props=["seq", "edge_id", "acc_cost"])
    gj = json.loads(out)
    assert gj["type"] == "FeatureCollection" and len(gj["features"]) == len(chosen)
