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
