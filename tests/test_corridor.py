"""shapes_corridor — the R10 shape-assembly chain oracled end to end.

The corridor world (datagen.corridor_*, constants COR_*) makes the
full-cost edge-Viterbi + hop-path-capture + orient/concat/clip/cumdist
chain bit-checkable in DuckDB: unique optimal state paths on a path
graph, exact-integer arc costs/emissions (levels >= 3 only, points on
the line on a dyadic lattice). See operators/corridor.py.
"""

import duckdb
import pytest
from pyspark.sql import functions as F

from conftest import SF_DIR, SF_DIR_01, assert_matches_oracle, duck

from pfaedle_spark import constants as C, datagen
from pfaedle_spark.operators import candidates, corridor, edge_routing


def test_shapes_corridor_matches_oracle(spark):
    """Engine (real operators) == DuckDB oracle, exact (atol=0): every
    output coordinate and cumulative distance is a dyadic rational, so
    both engines compute identical bits."""
    df = corridor.shapes_corridor(spark, SF_DIR)
    assert_matches_oracle(df, corridor.shapes_corridor_sql(), atol=0.0)


def test_shapes_corridor_sf01(spark):
    df = corridor.shapes_corridor(spark, SF_DIR_01)
    assert_matches_oracle(
        df, corridor.shapes_corridor_sql(), sf_dir=SF_DIR_01, atol=0.0
    )


def test_corridor_band_binds(spark):
    """The R5 hop band must actually prune pairs on this world —
    otherwise the oracle's pilot/pend/cap arithmetic is dead weight.
    (The engine matching the oracle WITH pruning active is the
    cross-engine gate on the round-3 band-shadowing fix.)"""
    sql = corridor.shapes_corridor_sql()
    prefix = sql.split("dp AS MATERIALIZED")[0]
    probe = prefix + f"""
bpairs AS (
  SELECT p.fingerprint, p.seq, n.state, p.state AS seed_state, h.cost AS hopc,
         ABS({corridor._state_x('p.state')} - {corridor._state_x('n.state')}) AS sl
  FROM rstates p
  JOIN nxt x ON x.fingerprint = p.fingerprint AND x.seq = p.seq
            AND x.next_seq IS NOT NULL
  JOIN rstates n ON n.fingerprint = p.fingerprint AND n.seq = x.next_seq
  JOIN hop h ON h.seed = p.state AND h.state = n.state
),
wb AS (SELECT *, MAX(sl) OVER (PARTITION BY fingerprint, seq) AS pend FROM bpairs)
SELECT COUNT(*) AS total,
       SUM(CASE WHEN hopc > GREATEST(0, pend * 1.5) * 3.0 + 3100.0
                THEN 1 ELSE 0 END) AS pruned_lb
FROM wb
"""
    con = duck(SF_DIR)
    total, pruned = con.execute(probe).fetchone()
    con.close()
    assert total > 0
    # pruned_lb uses c0=0 (a LOWER bound on the cap => an UPPER bound
    # on pruning); assert the geometry makes pruning possible at all
    assert pruned > 0, "corridor world never stresses the hop band"


def test_corridor_walk_invariants(spark):
    """Engine-only invariants: per-trip pt_seq is dense from 0,
    cum_dist is non-decreasing, consecutive walk states chain head to
    tail (oriented end node == next oriented start node)."""
    pdf = corridor.shapes_corridor(spark, SF_DIR).toPandas()
    assert len(pdf) > 0
    rev = edge_routing.REV_OFF
    for trip, g in pdf.groupby("trip_id"):
        g = g.sort_values("pt_seq").reset_index(drop=True)
        assert g["pt_seq"].tolist() == list(range(len(g)))
        assert (g["cum_dist"].diff().dropna() >= -1e-9).all()
        states = g[g["hop_seq"] >= 0]["edge_state"].tolist()
        for a, b in zip(states, states[1:]):
            a_orig, a_rev = a % rev, a >= rev
            b_orig, b_rev = b % rev, b >= rev
            a_end = a_orig if a_rev else a_orig + 1
            b_start = b_orig + 1 if b_rev else b_orig
            assert a_end == b_start, (trip, a, b)


def test_corridor_hop_paths_unique_costs(spark):
    """Sanity for the uniqueness argument: no two distinct predecessors
    achieve the same optimal cost for any (seed, state) BF cell — i.e.
    the argmin the oracle takes is never a tie-break guess."""
    sql = corridor.shapes_corridor_sql()
    prefix = sql.split(",\nemis AS MATERIALIZED")[0]
    n = corridor.BF_ROUNDS
    probe = prefix + f""",
relaxed AS (
  SELECT seed, state, cost, pred FROM bf{n - 1}
  UNION ALL
  SELECT b.seed, t.to_edge, b.cost + t.cost, b.state
  FROM bf{n - 1} b JOIN trans t ON t.from_edge = b.state
),
best AS (SELECT seed, state, MIN(cost) AS mc FROM relaxed GROUP BY seed, state)
SELECT COUNT(*) FROM (
  SELECT r.seed, r.state
  FROM relaxed r JOIN best b ON b.seed = r.seed AND b.state = r.state AND r.cost = b.mc
  GROUP BY r.seed, r.state HAVING COUNT(DISTINCT r.pred) > 1
)
"""
    con = duck(SF_DIR)
    ties = con.execute(probe).fetchone()[0]
    con.close()
    assert ties == 0, f"{ties} BF cells have ambiguous optimal predecessors"


def test_corridor_bf_rounds_sufficient(spark):
    """BF_ROUNDS strictly dominates every optimal path: one more round
    changes nothing (costs at bf{N} are the fixpoint)."""
    sql = corridor.shapes_corridor_sql()
    prefix = sql.split(",\nemis AS MATERIALIZED")[0]
    n = corridor.BF_ROUNDS
    probe = prefix + f""",
more AS (
  SELECT seed, state, MIN(cost) AS cost FROM (
    SELECT seed, state, cost FROM bf{n}
    UNION ALL
    SELECT b.seed, t.to_edge, b.cost + t.cost
    FROM bf{n} b JOIN trans t ON t.from_edge = b.state
  ) GROUP BY seed, state
)
SELECT COUNT(*) FROM more m
JOIN bf{n} b ON b.seed = m.seed AND b.state = m.state
WHERE m.cost <> b.cost
"""
    con = duck(SF_DIR)
    changed = con.execute(probe).fetchone()[0]
    con.close()
    assert changed == 0


def test_viterbi_corridor_matches_oracle(spark):
    """viterbi_full (edge states, full cost, band, clustering) on the
    corridor == the shared DP chain's backtrack surface, exact."""
    df = corridor.viterbi_corridor(spark, SF_DIR)
    assert_matches_oracle(df, corridor.viterbi_corridor_sql(), atol=0.0)


def test_corridor_shapes_consistent_with_viterbi(spark):
    """Engine cross-check: the shape walk's first state per trip ==
    the Viterbi chain's first chosen state (layer-0 choice feeds R10)."""
    shp = corridor.shapes_corridor(spark, SF_DIR).toPandas()
    vit = corridor.viterbi_corridor(spark, SF_DIR).toPandas()
    first_walk = (
        shp[shp["hop_seq"] == 0]
        .set_index("trip_id")["edge_state"].to_dict()
    )
    first_choice = (
        vit.sort_values("seq").groupby("trip_id").first()["state_edge"].to_dict()
    )
    assert first_walk == first_choice


def test_trip_debug_corridor_matches_oracle(spark):
    """Full-cost -T debug surface: every state (incl. band-inf rows)
    with DP cost + chosen flag == the shared chain's dp/backtrack."""
    df = corridor.trip_debug_corridor(spark, SF_DIR)
    assert_matches_oracle(df, corridor.trip_debug_corridor_sql(), atol=0.0)
    pdf = df.toPandas()
    # exactly one chosen state per layer, and the debug surface carries
    # the complete candidate layers (> chosen rows)
    per_layer = pdf.groupby("seq")["chosen"].sum()
    assert (per_layer == 1).all()
    assert len(pdf) > pdf["chosen"].sum()
