"""R2/R3/J4 — edge-based routing with turn costs and enforced
turn restrictions.

Reference semantics (re-expressed, not ported):

* R2 edge-based Dijkstra — the reference settles *edges*, not nodes,
  precisely so that turn costs and (via, from, to) restrictions can be
  applied per transition (``util/graph/EDijkstra.h:190-418``).
* R3 full cost vector — per-meter level punish x8, full-turn punish
  (angle test via ``angSmaller``/``innerProd``, ``Geo.h:797-817`` +
  ``router/misc.h:140-151``), oneway-violation meters, line-similarity
  meters, no-lines meters, pass-through-station punish; collapsed to a
  scalar with the config weights (``router/misc.h:75-137``; shipped
  defaults ``pfaedle.cfg:377-419``).
* J4 restriction enforcement — a restricted (via, from, to) transition
  is penalized like a wrong-way oneway traversal
  (``router/router.cpp:105-115``, ``trgraph/restrictor.cpp:11-58``):
  soft by default (data robustness), optionally hard (+inf/absent).

Spark-first design: the *entire* cost model is a relational
``turn_transitions`` table — directed-edge self-join on the via node,
every cost term a JVM-side column expression built from ONE
dialect-neutral SQL string that both Spark (``F.expr``) and the DuckDB
oracle evaluate, so every term is bit-identically checkable. The
Dijkstra kernel then runs over the broadcast transition CSR inside
``applyInPandas`` groups — same axis the reference parallelizes with
OpenMP threads.

At 100 TB the transitions table is graph-sized (scales with geography,
not with the observation/image table), so broadcasting it follows the
same budget argument as the node CSR in ``routing.py``.
"""

from __future__ import annotations

import heapq
import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import sqlgen
from ..functions import strings
from . import gtfs_ops

# --- config weights (pfaedle.cfg:377-419 semantics; field names mirror
#     routing_options, router/misc.h:35-50). Parsed from the shipped MOT
#     config (S8), not hard-coded: motconfig.MotConfig.routing_opts().
from .. import motconfig as _MC

OPTS = _MC.load("rail").routing_opts()

THIRD = 0.333333333  # routing_attributes.h:40-47 uses this literal
SIMI_EPS = 0.0001    # router.cpp:116 "cur < 0.0001 => perfect match"


def _D(x: float) -> str:
    """A bare decimal literal in dialect-neutral SQL: Spark parses it as
    DECIMAL (so downstream arithmetic and the driver's value hash come
    back as decimal.Decimal), DuckDB as DOUBLE. Emit an explicit DOUBLE
    cast so both engines agree on the type."""
    return f"CAST({x!r} AS DOUBLE)"

# route attributes of the synthetic query trip (routing_attributes:
# short_name / from / to); matches the synthetic line l10 and a subset
# of the from/to stop names so every simi component is exercised.
RATTRS = {"short_name": "l10", "from": "st 3", "to": "st 5"}

REV_OFF = 1 << 40  # reverse-copy edge-id offset (same stride as graph_ops)

# restricted_paths query shape: sub-grid + source/target node sets
SUB_N = 8
SOURCE_NODES = [0, 33, 99, 132]   # includes restriction via nodes (s % 11 == 0)
TARGET_NODES = [231, 100, 66]
BF_ROUNDS = 170  # oracle Bellman-Ford unroll: provable upper bound on
                 # optimal path transitions in the 8x8 sub-grid — any
                 # optimum costs <= ~16 transitions x 21.5k (worst
                 # Manhattan route), every transition costs >= 2048, so
                 # >= 169 transitions can never be optimal


def _cos_full_turn(opts: dict) -> float:
    # theta < angle  <=>  cos(theta) > cos(angle)  for theta in [0, 180]:
    # lets the angle test run on dot products + sqrt only (bit-stable
    # across engines; acos is not).
    return math.cos(math.radians(opts["full_turn_angle"]))


# --------------------------------------------------------------------
# directed edge states
# --------------------------------------------------------------------

def directed_full(edges: DataFrame) -> DataFrame:
    """Reverse copy for EVERY edge (unlike graph_ops.write_odir_edges,
    which skips oneways): the reverse of a oneway is kept but flagged
    ``against_oneway`` and penalized — the reference models wrong-way
    travel as oneWay==2 with a per-meter punish, not as a missing edge
    (``edge_payload.h:47-139``, ``router.cpp:60``), for robustness
    against OSM data errors."""
    fwd = edges.select(
        "edge_id", "src", "dst", "x1", "y1", "x2", "y2", "level", "length",
        F.lit(False).alias("against_oneway"),
    )
    rev = edges.select(
        (F.col("edge_id") + REV_OFF).alias("edge_id"),
        F.col("dst").alias("src"),
        F.col("src").alias("dst"),
        F.col("x2").alias("x1"),
        F.col("y2").alias("y1"),
        F.col("x1").alias("x2"),
        F.col("y1").alias("y2"),
        "level",
        "length",
        F.col("oneway").alias("against_oneway"),
    )
    return fwd.unionByName(rev)


def _directed_full_cte(edge_src: str = "edges") -> str:
    return f"""
dedges AS (
  SELECT edge_id, src, dst, x1, y1, x2, y2, level, length,
         FALSE AS against_oneway
  FROM {edge_src}
  UNION ALL
  SELECT edge_id + {REV_OFF}, dst, src, x2, y2, x1, y1, level, length,
         oneway
  FROM {edge_src}
)"""


# --------------------------------------------------------------------
# transit-line match cost per edge (transitLineCmp, router.cpp:105-125)
# --------------------------------------------------------------------

def _line_cur_sql(rattrs: dict) -> str:
    """Per-line simi cost ``cur`` (routing_attributes.h:32-52): start at
    1, subtract 1/3 per matching component. Literal rattrs are folded at
    build time (empty component => unconditional subtract, as the
    reference short-circuits on ``short_name.empty()`` etc.)."""
    terms = []
    sn = rattrs["short_name"].replace("'", "''")
    if not rattrs["short_name"]:
        terms.append(_D(THIRD))
    else:
        simi = strings.line_simi_neutral_sql("line_name", f"'{sn}'")
        terms.append(f"CASE WHEN ({simi}) > 0.5 THEN {_D(THIRD)} ELSE 0.0 END")
    for attr, col in (("to", "to_stop"), ("from", "from_stop")):
        val = rattrs[attr].replace("'", "''")
        if not rattrs[attr]:
            terms.append(_D(THIRD))
        else:
            simi = strings.stat_simi_neutral_sql(col, f"'{val}'")
            terms.append(
                f"CASE WHEN LENGTH({col}) = 0 OR ({simi}) > 0.5"
                f" THEN {_D(THIRD)} ELSE 0.0 END"
            )
    return "CAST(1.0 AS DOUBLE) - " + " - ".join(terms)


_LINE_CMP_AGG = (
    f"CASE WHEN MIN(cur) < {_D(SIMI_EPS)} THEN 0.0 ELSE MIN(cur) END"
)  # == the reference's early-return-0 on a perfect line match


def line_cmp(edges: DataFrame, rattrs: dict = RATTRS) -> DataFrame:
    """(edge_id, cmp) per *undirected* edge: min over the edge's lines of
    the 3-component simi cost; clamped to 0 on perfect match. Edges
    without lines are absent (downstream coalesces to 1.0 — the
    reference's ``best = 1`` initial)."""
    lines = gtfs_ops.edge_lines(edges)
    cur = lines.withColumn("cur", F.expr(_line_cur_sql(rattrs)))
    return cur.groupBy("edge_id").agg(F.expr(_LINE_CMP_AGG).alias("cmp"))


def _line_cmp_cte(rattrs: dict, edge_src: str = "edges", suffix: str = "") -> str:
    """SQL twin of :func:`line_cmp` (builds the synthetic edge_lines
    inline, mirroring gtfs_ops.edge_lines_sql). ``suffix`` namespaces
    the CTEs so several rattr variants can coexist in one statement."""
    return f"""
elines{suffix} AS (
  SELECT DISTINCT edge_id,
         'l' || CAST(level * 10 AS VARCHAR) AS line_name,
         'st ' || CAST(src % 9 AS VARCHAR)  AS from_stop,
         'st ' || CAST(dst % 9 AS VARCHAR)  AS to_stop
  FROM {edge_src} WHERE level < 3
),
ecmp{suffix} AS (
  SELECT edge_id, {_LINE_CMP_AGG} AS cmp
  FROM (SELECT edge_id, {_line_cur_sql(rattrs)} AS cur FROM elines{suffix})
  GROUP BY edge_id
)"""


# --------------------------------------------------------------------
# the transition cost expression (shared, dialect-neutral)
# --------------------------------------------------------------------

def cost_expr(opts: dict = OPTS, has_rattrs: bool = True) -> str:
    """R3 collapsed cost of transition (a -> b) over via node a_dst, as
    ONE SQL string evaluated by Spark and DuckDB over identical column
    names. Mirrors edge_cost's weighted collapse (misc.h:85-108) and
    CostFunc::operator() term construction (router.cpp:53-117):

    traverse(a): length x level punish, oneway/restriction meters,
    line-unmatched meters, no-lines meters; turn terms at the via node:
    full-turn punish (trivial reverse, or angle < fullTurnAngle at
    deg>2 intersections), pass-through-station punish.
    """
    lv = opts["level_punish"]
    lvl = ("CASE a_level " +
           " ".join(f"WHEN {i} THEN {_D(lv[i])}" for i in range(8)) +
           " ELSE 1.0 END")
    viol = "(a_ow OR rneg OR (rpos_to IS NOT NULL AND rpos_to <> b_orig))"
    # angle test (angSmaller, misc.h:140-151): vectors via->backHop(a),
    # via->frontHop(b); straight segments => backHop = a's start point,
    # frontHop = b's end point.
    dot = "((a_x1 - a_x2) * (b_x2 - b_x1) + (a_y1 - a_y2) * (b_y2 - b_y1))"
    l2a = "((a_x1 - a_x2) * (a_x1 - a_x2) + (a_y1 - a_y2) * (a_y1 - a_y2))"
    l2b = "((b_x2 - b_x1) * (b_x2 - b_x1) + (b_y2 - b_y1) * (b_y2 - b_y1))"
    full_turn = (
        "((a_src = b_dst AND a_dst = b_src) OR "
        f"(deg > 2 AND {dot} > {_D(_cos_full_turn(opts))} * SQRT({l2a}) * SQRT({l2b})))"
    )
    no_lines = "0.0" if has_rattrs else (
        f"CASE WHEN a_cmp >= 1.0 THEN a_len * {_D(opts['no_lines_punish_fac'])} ELSE 0.0 END"
    )
    return (
        f"a_len * ({lvl})"
        f" + CASE WHEN {viol} THEN a_len * {_D(opts['oneway_punish_fac'])}"
        f" + {_D(opts['oneway_edge_punish'])} ELSE 0.0 END"
        f" + a_len * {_D(opts['line_unmatched_punish_fac'])} * a_cmp"
        f" + {no_lines}"
        f" + CASE WHEN {full_turn} THEN {_D(opts['full_turn_punish'])} ELSE 0.0 END"
        f" + CASE WHEN via_station THEN {_D(opts['pass_thru_station_punish'])} ELSE 0.0 END"
    )


def turn_transitions(
    edges: DataFrame,
    restrictions: DataFrame,
    nodes: DataFrame,
    rattrs: dict = RATTRS,
    opts: dict = OPTS,
) -> DataFrame:
    """The edge-graph: one row per legal directed-edge pair sharing the
    via node, with the full R3 transition cost.

    Output: (from_edge, to_edge, via_node, cost).

    Scale shape: dedges self-join on the via node (shuffle equi-join on
    node_id); degree / station / restriction / line-cmp sides are
    graph-metadata joins (broadcast). Everything is JVM column math —
    no Python rows.
    """
    de = directed_full(edges)
    a = de.select(
        F.col("edge_id").alias("a_edge"),
        F.col("src").alias("a_src"),
        F.col("dst").alias("a_dst"),
        F.col("x1").alias("a_x1"), F.col("y1").alias("a_y1"),
        F.col("x2").alias("a_x2"), F.col("y2").alias("a_y2"),
        F.col("level").alias("a_level"),
        F.col("length").alias("a_len"),
        F.col("against_oneway").alias("a_ow"),
        (F.col("edge_id") % REV_OFF).alias("a_orig"),
    )
    b = de.select(
        F.col("edge_id").alias("b_edge"),
        F.col("src").alias("b_src"),
        F.col("dst").alias("b_dst"),
        F.col("x1").alias("b_x1"), F.col("y1").alias("b_y1"),
        F.col("x2").alias("b_x2"), F.col("y2").alias("b_y2"),
        (F.col("edge_id") % REV_OFF).alias("b_orig"),
    )
    from . import graph_ops

    deg = graph_ops.degrees(edges).select(
        F.col("node_id").alias("a_dst"), F.col("degree").alias("deg")
    )
    st = nodes.select(F.col("node_id").alias("a_dst"), "is_station")
    rneg = (
        restrictions.filter(~F.col("positive"))
        .select(
            F.col("via_node").alias("a_dst"),
            F.col("from_way").alias("a_orig"),
            F.col("to_way").alias("b_orig"),
        )
        .distinct()
        .withColumn("rneg_hit", F.lit(True))
    )
    rpos = (
        restrictions.filter(F.col("positive"))
        .groupBy(
            F.col("via_node").alias("a_dst"), F.col("from_way").alias("a_orig")
        )
        .agg(F.min("to_way").alias("rpos_to"))
    )
    lc = line_cmp(edges, rattrs).select(
        F.col("edge_id").alias("a_orig"), "cmp"
    )
    j = (
        a.join(b, F.col("a_dst") == F.col("b_src"))
        .join(F.broadcast(deg), "a_dst")
        .join(F.broadcast(st), "a_dst", "left")
        .join(F.broadcast(rneg), ["a_dst", "a_orig", "b_orig"], "left")
        .join(F.broadcast(rpos), ["a_dst", "a_orig"], "left")
        .join(F.broadcast(lc), "a_orig", "left")
        .withColumn("via_station", F.coalesce(F.col("is_station"), F.lit(False)))
        .withColumn("rneg", F.coalesce(F.col("rneg_hit"), F.lit(False)))
        .withColumn("a_cmp", F.coalesce(F.col("cmp"), F.lit(1.0)))
    )
    return j.select(
        F.col("a_edge").alias("from_edge"),
        F.col("b_edge").alias("to_edge"),
        F.col("a_dst").alias("via_node"),
        F.expr(cost_expr(opts)).alias("cost"),
        # state start-node coords (A* heuristic: every transition cost
        # >= a_len >= displacement of the from-edge's start node, so
        # straight-line-to-target-start is admissible + consistent)
        F.col("a_x1").alias("fx"), F.col("a_y1").alias("fy"),
        F.col("b_x1").alias("tx"), F.col("b_y1").alias("ty"),
    )


def transitions_ctes(
    edge_filter: str | None = None,
    rattrs: dict = RATTRS,
    opts: dict = OPTS,
    head: str | None = None,
    edges_rel: str = "edges",
    nodes_rel: str = "nodes",
    suffix: str = "",
    emit_shared: bool = True,
) -> str:
    """DuckDB CTE chain ending in ``trans{suffix}(from_edge, to_edge,
    via_node, cost)`` — the bit-identical oracle twin of
    :func:`turn_transitions`. ``edge_filter`` restricts the edge set
    (sub-grid queries); ``head``/``edges_rel``/``nodes_rel`` let a
    different world (e.g. the corridor) supply its own relations while
    reusing the same cost SQL. ``suffix``/``emit_shared`` allow several
    rattr VARIANTS in one statement: the rattr-independent CTEs
    (dedges/deg/restr) are emitted once (emit_shared) and the
    rattr-folded ones (elines/ecmp/jt/trans) get per-variant names."""
    base = sqlgen.with_ctes("nodes", "edges") if head is None else head
    esrc = edges_rel
    shared = ""
    if edge_filter:
        shared += f""",
sub_edges AS (SELECT * FROM {edges_rel} WHERE {edge_filter})"""
        esrc = "sub_edges"
    if emit_shared:
        shared += f""",{_directed_full_cte(esrc)},
deg AS (
  SELECT node_id, COUNT(*) AS deg
  FROM (SELECT src AS node_id FROM {esrc} UNION ALL SELECT dst FROM {esrc})
  GROUP BY node_id
),
restr AS (
  SELECT src AS via_node, MIN(edge_id) AS from_way, MAX(edge_id) AS to_way,
         src % 22 = 0 AS positive
  FROM {esrc} WHERE src % 11 = 0
  GROUP BY src HAVING MIN(edge_id) <> MAX(edge_id)
)"""
    return f"""{base}{shared},{_line_cmp_cte(rattrs, esrc, suffix)},
jt{suffix} AS MATERIALIZED (
  SELECT a.edge_id AS a_edge, a.src AS a_src, a.dst AS a_dst,
         a.x1 AS a_x1, a.y1 AS a_y1, a.x2 AS a_x2, a.y2 AS a_y2,
         a.level AS a_level, a.length AS a_len, a.against_oneway AS a_ow,
         a.edge_id % {REV_OFF} AS a_orig,
         b.edge_id AS b_edge, b.src AS b_src, b.dst AS b_dst,
         b.x1 AS b_x1, b.y1 AS b_y1, b.x2 AS b_x2, b.y2 AS b_y2,
         b.edge_id % {REV_OFF} AS b_orig,
         d.deg AS deg,
         COALESCE(n.is_station, FALSE) AS via_station,
         (rn.via_node IS NOT NULL) AS rneg,
         rp.rpos_to AS rpos_to,
         COALESCE(c.cmp, 1.0) AS a_cmp
  FROM dedges a
  JOIN dedges b ON a.dst = b.src
  JOIN deg d ON d.node_id = a.dst
  LEFT JOIN {nodes_rel} n ON n.node_id = a.dst
  LEFT JOIN (SELECT DISTINCT via_node, from_way, to_way FROM restr WHERE NOT positive) rn
         ON rn.via_node = a.dst AND rn.from_way = a.edge_id % {REV_OFF}
        AND rn.to_way = b.edge_id % {REV_OFF}
  LEFT JOIN (SELECT via_node, from_way, MIN(to_way) AS rpos_to FROM restr
             WHERE positive GROUP BY via_node, from_way) rp
         ON rp.via_node = a.dst AND rp.from_way = a.edge_id % {REV_OFF}
  LEFT JOIN ecmp{suffix} c ON c.edge_id = a.edge_id % {REV_OFF}
),
trans{suffix} AS MATERIALIZED (
  SELECT a_edge AS from_edge, b_edge AS to_edge, a_dst AS via_node,
         {cost_expr(opts)} AS cost
  FROM jt{suffix}
)"""


def turn_transitions_sql() -> str:
    return transitions_ctes() + """
SELECT from_edge, to_edge, via_node, cost FROM trans
"""


# --------------------------------------------------------------------
# R2 — Dijkstra over edge states
# --------------------------------------------------------------------

def build_edge_csr(trans_pdf: pd.DataFrame) -> dict:
    """CSR over directed-edge states from a transitions table. State ids
    are the (sparse, offset-bearing) edge ids, index-mapped."""
    frm = trans_pdf["from_edge"].to_numpy(np.int64)
    to = trans_pdf["to_edge"].to_numpy(np.int64)
    cost = trans_pdf["cost"].to_numpy(np.float64)
    states = np.unique(np.concatenate([frm, to]))
    idx = {int(e): i for i, e in enumerate(states)}
    fi = np.array([idx[int(e)] for e in frm], dtype=np.int64)
    ti = np.array([idx[int(e)] for e in to], dtype=np.int64)
    order = np.lexsort((to, ti, fi))  # (from, to-edge-id) deterministic
    fi, ti, cost = fi[order], ti[order], cost[order]
    n = len(states)
    indptr = np.zeros(n + 1, dtype=np.int64)
    np.add.at(indptr, fi + 1, 1)
    indptr = np.cumsum(indptr)
    csr = {"indptr": indptr, "dst": ti, "cost": cost, "states": states, "idx": idx}
    # per-state start-node coords for the A* heuristic (see
    # turn_transitions fx/fy/tx/ty)
    if {"fx", "fy", "tx", "ty"} <= set(trans_pdf.columns):
        xy = np.full((n, 2), np.nan)
        all_fi = np.array([idx[int(e)] for e in frm], dtype=np.int64)
        all_ti = np.array([idx[int(e)] for e in to], dtype=np.int64)
        xy[all_fi, 0] = trans_pdf["fx"].to_numpy(np.float64)
        xy[all_fi, 1] = trans_pdf["fy"].to_numpy(np.float64)
        xy[all_ti, 0] = trans_pdf["tx"].to_numpy(np.float64)
        xy[all_ti, 1] = trans_pdf["ty"].to_numpy(np.float64)
        # admissibility gate (same invariant as routing._heuristic_admissible):
        # an editable config with a level factor < 1 would make A* inexact.
        from .routing import _heuristic_admissible

        if _heuristic_admissible(csr, xy):
            csr["xy"] = xy
    # weak-component labels over the state graph: the R6 shortcut
    # (router.cpp:598-599 — different component => cost inf). Without
    # it, ONE cross-component target in a Viterbi layer makes the A*
    # exhaust the whole reachable graph before concluding "unreachable".
    parent = np.arange(n, dtype=np.int64)

    def find(a: int) -> int:
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = int(parent[a])
        return a

    for a, b in zip(fi.tolist(), ti.tolist()):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[ra] = rb
    csr["comp"] = np.array([find(i) for i in range(n)], dtype=np.int64)
    return csr


def edge_dijkstra(csr: dict, source_edge: int, target_edges=None) -> dict[int, float]:
    """Deterministic (d, state-edge-id) PQ order (EDijkstra.h:50-53 uses
    (h, d) — with targets and state coords this IS A*: h = min straight
    line to a target start node, admissible because every transition
    cost >= a_len >= that displacement). Early exit once all targets
    settle. Keys/values in raw edge ids; distances are exact either way.
    """
    idx = csr["idx"]
    if source_edge not in idx:
        return {}
    indptr, dsts, cost, states = csr["indptr"], csr["dst"], csr["cost"], csr["states"]
    src = idx[source_edge]
    remaining = (
        {idx[t] for t in target_edges if t in idx} if target_edges is not None else None
    )
    # R6 component shortcut: cross-component targets are inf — drop them
    # so early exit still fires instead of sweeping the reachable graph
    comp = csr.get("comp")
    if comp is not None and remaining:
        sc = int(comp[src])
        remaining = {t for t in remaining if int(comp[t]) == sc}
        if not remaining:
            return {}
    xy = csr.get("xy")
    if xy is not None and remaining:
        # whole-table heuristic in ONE vectorized pass (n x |targets|
        # flops), cached per target set — every source of a DP layer
        # shares the same targets, so pay the table once per layer
        hkey = frozenset(remaining)
        hcache = csr.setdefault("_hcache", {})
        harr = hcache.get(hkey)
        if harr is None:
            if len(hcache) > 4096:
                hcache.clear()
            txy = xy[np.fromiter(remaining, dtype=np.int64)]
            dx = xy[:, 0:1] - txy[None, :, 0].reshape(1, -1)
            dy = xy[:, 1:2] - txy[None, :, 1].reshape(1, -1)
            harr = np.nan_to_num(np.sqrt(dx * dx + dy * dy), nan=0.0).min(axis=1)
            hcache[hkey] = harr
    else:
        harr = None

    dist: dict[int, float] = {}
    h0 = float(harr[src]) if harr is not None else 0.0
    pq: list[tuple[float, float, int, int]] = [(h0, 0.0, int(states[src]), src)]
    while pq:
        _, d, _, u = heapq.heappop(pq)
        if u in dist:
            continue
        dist[u] = d
        if remaining is not None:
            remaining.discard(u)
            if not remaining:
                break
        if harr is None:
            for i in range(indptr[u], indptr[u + 1]):
                v = int(dsts[i])
                if v not in dist:
                    d2 = d + float(cost[i])
                    heapq.heappush(pq, (d2, d2, int(states[v]), v))
        else:
            for i in range(indptr[u], indptr[u + 1]):
                v = int(dsts[i])
                if v not in dist:
                    d2 = d + float(cost[i])
                    heapq.heappush(pq, (d2 + float(harr[v]), d2, int(states[v]), v))
    return {int(states[u]): d for u, d in dist.items()}


def edge_dijkstra_path(csr: dict, source_edge: int, target_edge: int) -> list[int] | None:
    """1x1 edge Dijkstra with predecessor capture: the state sequence
    source..target, or None if unreachable (R10 needs the actual walked
    edges — reference ``EDijkstra`` per-target path capture,
    ``EDijkstra.h:190-418``)."""
    idx = csr["idx"]
    if source_edge not in idx or target_edge not in idx:
        return None
    indptr, dsts, cost, states = csr["indptr"], csr["dst"], csr["cost"], csr["states"]
    src, tgt = idx[source_edge], idx[target_edge]
    comp = csr.get("comp")
    if comp is not None and int(comp[src]) != int(comp[tgt]):
        return None  # R6: cross-component => unreachable, skip the sweep
    xy = csr.get("xy")
    if xy is not None:  # 1x1 A*: the heuristic's best case
        # cache per target: shape assembly walks MANY consecutive state
        # pairs against the same graph, and a fresh |states| table (let
        # alone a tolist) per call dominates the search itself
        hcache = csr.setdefault("_hcache_1x1", {})
        harr = hcache.get(tgt)
        if harr is None:
            if len(hcache) > 4096:
                hcache.clear()
            harr = np.nan_to_num(
                np.hypot(xy[:, 0] - xy[tgt, 0], xy[:, 1] - xy[tgt, 1]), nan=0.0
            )
            hcache[tgt] = harr
    else:
        harr = None

    dist: dict[int, float] = {}
    prev: dict[int, int] = {}
    h0 = float(harr[src]) if harr is not None else 0.0
    pq: list[tuple[float, float, int, int, int]] = [(h0, 0.0, int(states[src]), src, -1)]
    while pq:
        _, d, _, u, p = heapq.heappop(pq)
        if u in dist:
            continue
        dist[u] = d
        prev[u] = p
        if u == tgt:
            break
        for i in range(indptr[u], indptr[u + 1]):
            v = int(dsts[i])
            if v not in dist:
                d2 = d + float(cost[i])
                hv = float(harr[v]) if harr is not None else 0.0
                heapq.heappush(pq, (d2 + hv, d2, int(states[v]), v, u))
    if tgt not in dist:
        return None
    path = []
    cur = tgt
    while cur != -1:
        path.append(int(states[cur]))
        cur = prev[cur]
    return path[::-1]


def shape_assembly(
    cand: DataFrame,
    transitions_by_variant: dict[int, pd.DataFrame],
    dedges_pdf: pd.DataFrame,
) -> DataFrame:
    """R10 + W2: assemble the aligned trip polyline from the walked
    directed edges and emit cumulative distance along it.

    Reference ``get_shape_line`` (shape_builder.cpp:80-119): walk hop
    edge lists, orient each edge geometry by node identity ⊕ reversed
    flag, concatenate; then the W2 running distance (:380-526). Directed
    states already carry oriented coordinates, so orientation is the
    state itself; hop paths come from per-winning-pair Dijkstra path
    capture (the N×M matrix never materializes paths — only the
    backtracked optimum re-runs 1×1 with predecessors, like the
    reference's per-target path capture).

    Output: (trip_id, pt_seq, x, y, cum_dist, hop_seq, edge_state).
    """
    spark = cand.sparkSession
    # the candidate spatial join feeds THREE branches (fingerprints,
    # keyed, trips) — materialize it once
    cand = cand.localCheckpoint(eager=False)
    fingerprints = trip_fingerprints(cand)
    bc = spark.sparkContext.broadcast(tag_transitions(transitions_by_variant))
    bc_edges = spark.sparkContext.broadcast(
        dedges_pdf.set_index("edge_id")[["x1", "y1", "x2", "y2", "length"]]
    )

    with_emis = cand.withColumn("emission", F.expr(emission_expr()))
    keyed = with_emis.join(
        fingerprints.select("trip_id", "fingerprint", "rep_trip", "variant"), "trip_id"
    )
    # see viterbi_full: materialize before fan-out to reps + trips join
    keyed = keyed.localCheckpoint(eager=False)
    reps = keyed.filter(F.col("trip_id") == F.col("rep_trip")).select(
        "fingerprint", "variant", "seq", "edge_id", "cand_node", "emission", "rank",
        "x", "y",
    )

    def solve(pdf: pd.DataFrame) -> pd.DataFrame:
        chosen = _viterbi_full_one(pdf, bc.value)
        variant = int(pdf["variant"].iloc[0])
        csr = _vf_csr(bc.value, variant)
        geo = bc_edges.value
        fpr = chosen["fingerprint"].iloc[0]
        states = chosen.sort_values("seq")["state_edge"].tolist()
        # stop coords per layer (constant within a seq group): the
        # cluster representative's coords stand in for every member,
        # exactly as the reference copies the rep's shape to the
        # cluster (shape_builder.cpp:219)
        stop_xy = pdf.groupby("seq")[["x", "y"]].first().sort_index()
        walk: list[int] = []
        for i in range(len(states) - 1):
            p = edge_dijkstra_path(csr, int(states[i]), int(states[i + 1]))
            if p is None:
                continue
            walk.extend(p[:-1])  # target re-enters as next hop's source
        if states:
            walk.append(int(states[-1]))

        def oriented(st: int):
            e = geo.loc[st % REV_OFF]
            if st >= REV_OFF:
                return float(e["x2"]), float(e["y2"]), float(e["x1"]), float(e["y1"]), float(e["length"])
            return float(e["x1"]), float(e["y1"]), float(e["x2"]), float(e["y2"]), float(e["length"])

        def proj_t(px: float, py: float, st: int) -> float:
            """Clamped projection parameter of the stop onto the state's
            oriented segment (Geo.h projectOn:1113-1146)."""
            sx, sy, ex, ey, _ = oriented(st)
            len2 = (ex - sx) * (ex - sx) + (ey - sy) * (ey - sy)
            if len2 <= 0.0:
                return 0.0
            t = ((px - sx) * (ex - sx) + (py - sy) * (ey - sy)) / len2
            return min(1.0, max(0.0, t))

        # R10 endpoint clipping (get_gtfs_shape, shape_builder.cpp:
        # 404-518): the shape starts at the FIRST stop's projection onto
        # the first chosen edge and ends at the LAST stop's projection
        # onto the last chosen edge — not at the raw edge endpoints.
        if walk:
            fx, fy = float(stop_xy["x"].iloc[0]), float(stop_xy["y"].iloc[0])
            lx, ly = float(stop_xy["x"].iloc[-1]), float(stop_xy["y"].iloc[-1])
            t0 = proj_t(fx, fy, walk[0])
            tL = proj_t(lx, ly, walk[-1])
            if len(walk) == 1 and tL < t0:
                tL = t0  # degenerate single-edge trip: monotone along travel
        rows = []
        cum = 0.0
        for hop_seq, st in enumerate(walk):
            sx, sy, ex, ey, ln = oriented(st)
            frac = 1.0
            if hop_seq == 0:
                # clip the head: start at the projection point
                sx = sx + t0 * (ex - sx)
                sy = sy + t0 * (ey - sy)
                frac -= t0
                rows.append((fpr, 0, sx, sy, 0.0, -1, int(st)))
            if hop_seq == len(walk) - 1:
                # clip the tail: end at the projection point
                ex0, ey0 = ex, ey
                sx0, sy0, _, _, _ = oriented(st)
                ex = sx0 + tL * (ex0 - sx0)
                ey = sy0 + tL * (ey0 - sy0)
                frac -= 1.0 - tL
            cum += ln * max(frac, 0.0)
            rows.append((fpr, len(rows), ex, ey, cum, hop_seq, int(st)))
        return pd.DataFrame(
            rows,
            columns=[
                "fingerprint", "pt_seq", "x", "y", "cum_dist", "hop_seq", "edge_state",
            ],
        )

    from .routing import dp_partitions

    n_part = dp_partitions(spark)

    # bucketed like viterbi_full: loop reps inside one pandas call so
    # the per-group Arrow constant amortizes over distinct fingerprints
    def solve_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        out = [solve(g) for _, g in pdf.groupby("fingerprint", sort=False)]
        return pd.concat(out, ignore_index=True)

    solved = (
        reps.withColumn("_bucket", F.pmod(F.hash("fingerprint"), F.lit(n_part)))
        .repartition(n_part, "_bucket")
        .groupBy("_bucket")
        .applyInPandas(
            solve_bucket,
            schema=(
                "fingerprint string, pt_seq long, x double, y double, "
                "cum_dist double, hop_seq long, edge_state long"
            ),
        )
    )
    trips = fingerprints.select("trip_id", "fingerprint").distinct()
    return trips.join(solved, "fingerprint").select(
        "trip_id", "pt_seq", "x", "y", "cum_dist", "hop_seq", "edge_state"
    )


# --------------------------------------------------------------------
# restricted_paths — the oracled query
# --------------------------------------------------------------------

SUB_FILTER = (
    f"src % 32 < {SUB_N} AND src // 32 < {SUB_N} "
    f"AND dst % 32 < {SUB_N} AND dst // 32 < {SUB_N}"
)


def _sub_edges(spark: SparkSession) -> DataFrame:
    from .. import datagen

    g = 32
    return datagen.edges(spark).filter(
        (F.col("src") % g < SUB_N)
        & (F.floor(F.col("src") / g) < SUB_N)
        & (F.col("dst") % g < SUB_N)
        & (F.floor(F.col("dst") / g) < SUB_N)
    )


def restricted_paths(spark: SparkSession) -> DataFrame:
    """Shortest restricted-path cost between every (source-state,
    target-state) pair on the 8x8 sub-grid, under the full R3 cost
    model with restrictions enforced.

    Source states: directed edges leaving SOURCE_NODES; target states:
    directed edges entering TARGET_NODES. Unreachable => NULL.

    Distribution: one applyInPandas group per source state over the
    broadcast transition CSR (graph-sized — see module docstring).
    """
    from .. import datagen

    edges = _sub_edges(spark)
    restr = gtfs_ops.read_restrictions(gtfs_ops.restriction_members(spark, edges))
    trans = turn_transitions(edges, restr, datagen.nodes(spark))
    de = directed_full(edges)
    sources = de.filter(F.col("src").isin(SOURCE_NODES)).select(
        F.col("edge_id").alias("from_edge"), F.col("src").alias("src_node")
    )
    targets = [
        (int(r["edge_id"]), int(r["dst"]))
        for r in de.filter(F.col("dst").isin(TARGET_NODES))
        .select("edge_id", "dst")
        .collect()
    ]
    trans_pdf = trans.toPandas()
    bc = spark.sparkContext.broadcast(trans_pdf)
    tgt_states = sorted(t for t, _ in targets)
    tgt_nodes = dict(targets)

    def solve(pdf: pd.DataFrame) -> pd.DataFrame:
        csr = build_edge_csr(bc.value)
        out = []
        for fe, sn in zip(pdf["from_edge"], pdf["src_node"]):
            d = edge_dijkstra(csr, int(fe), tgt_states)
            for t in tgt_states:
                out.append((int(fe), int(sn), t, tgt_nodes[t], d.get(t)))
        return pd.DataFrame(
            out, columns=["from_edge", "src_node", "to_edge", "dst_node", "path_cost"]
        )

    n_part = spark.sparkContext.defaultParallelism
    return (
        sources.repartition(n_part, "from_edge")
        .groupBy("from_edge")
        .applyInPandas(
            solve,
            schema="from_edge long, src_node long, to_edge long, dst_node long, path_cost double",
        )
    )


def restricted_paths_cogrouped(
    spark: SparkSession, n_buckets: int = 4
) -> DataFrame:
    """:func:`restricted_paths` WITHOUT the driver-side transitions
    collect — the broadcast-free continental fallback for the FULL R3
    cost model (the edge-state twin of routing.hop_shortest_paths_
    cogrouped): source states and the transitions table are cogrouped
    on the via-node component label, so each task receives exactly its
    component's transition subgraph through the shuffle. Bucket salting
    replicates the (graph-side) transitions n_buckets x so one
    component does not collapse to one task.

    Output, semantics and the driver oracle are identical to
    restricted_paths; only the physical plan differs.
    """
    from .. import datagen

    edges = _sub_edges(spark)
    restr = gtfs_ops.read_restrictions(gtfs_ops.restriction_members(spark, edges))
    nodes = datagen.nodes(spark)
    trans = turn_transitions(edges, restr, nodes)
    comp = nodes.select("node_id", "component")
    trans_c = (
        trans.join(comp.withColumnRenamed("node_id", "via_node"), "via_node")
        .withColumn("bucket", F.explode(F.sequence(F.lit(0), F.lit(n_buckets - 1))))
    )
    de = directed_full(edges)
    sources = (
        de.filter(F.col("src").isin(SOURCE_NODES))
        .select(F.col("edge_id").alias("from_edge"), F.col("src").alias("src_node"))
        .join(comp.withColumnRenamed("node_id", "src_node"), "src_node")
        .withColumn("bucket", F.pmod(F.hash("from_edge"), F.lit(n_buckets)))
    )
    targets = [
        (int(r["edge_id"]), int(r["dst"]))
        for r in de.filter(F.col("dst").isin(TARGET_NODES))
        .select("edge_id", "dst")
        .collect()
    ]  # target STATES are query constants (tiny), not graph data
    tgt_states = sorted(t for t, _ in targets)
    tgt_nodes = dict(targets)

    def solve(src_pdf: pd.DataFrame, trans_pdf: pd.DataFrame) -> pd.DataFrame:
        cols = ["from_edge", "src_node", "to_edge", "dst_node", "path_cost"]
        out = []
        if len(src_pdf) == 0:
            return pd.DataFrame(columns=cols)
        csr = build_edge_csr(trans_pdf) if len(trans_pdf) else None
        for fe, sn in zip(src_pdf["from_edge"], src_pdf["src_node"]):
            d = edge_dijkstra(csr, int(fe), tgt_states) if csr else {}
            for t in tgt_states:
                out.append((int(fe), int(sn), t, tgt_nodes[t], d.get(t)))
        return pd.DataFrame(out, columns=cols)

    return (
        sources.groupBy("component", "bucket")
        .cogroup(trans_c.groupBy("component", "bucket"))
        .applyInPandas(
            solve,
            schema="from_edge long, src_node long, to_edge long, dst_node long, path_cost double",
        )
    )


# --------------------------------------------------------------------
# A1 trip clustering + R7 full-cost Viterbi over edge states
# --------------------------------------------------------------------

N_RATTR_VARIANTS = 3  # per-trip route attrs: short_name = 'l' + (trip%3)*10


def rattrs_for_variant(v: int) -> dict:
    return {"short_name": f"l{v * 10}", "from": "st 3", "to": "st 5"}


_DOCNUM = "CAST(REGEXP_EXTRACT(image_id, '([0-9]+)', 1) AS BIGINT)"
_TRIPNUM = "CAST(REGEXP_EXTRACT(trip_id, '([0-9]+)', 1) AS BIGINT)"

# A5 emission — station_group::get_penalty (station_group.cpp:56-93):
# pen = dist * distPenFac + trackPen (0 on platform/track match) +
# nonOsmPen (0 for OSM-sourced nodes). Track-match / osm flags derive
# deterministically from the candidate row (same parity derivations as
# stations.candidate_penalties).
_EMISSION = (
    "dist * {fac!r}"
    " + CASE WHEN {doc} % 3 = 1 THEN {track!r} ELSE 0.0 END"
    " + CASE WHEN cand_node % 2 = 1 THEN {nonosm!r} ELSE 0.0 END"
)


def emission_expr() -> str:
    from . import stations
    from .. import constants as C

    return _EMISSION.format(
        fac=C.CAND_PEN_FAC, doc=_DOCNUM,
        track=stations.TRACK_PEN, nonosm=stations.NON_OSM_PEN,
    )


def echo_candidates(cand: DataFrame) -> DataFrame:
    """Candidates ∪ an echoed copy of every trip ('e' id prefix) — the
    duplicate-trip workload that makes A1 clustering measurable: the
    echoed trip is routing-equal to the original, so the cluster solves
    once (reference ``shape_builder::cluster_trips``,
    ``shape_builder.cpp:676-722``)."""
    echo = cand.withColumn("image_id", F.concat(F.lit("e"), F.col("image_id"))).withColumn(
        "trip_id", F.concat(F.lit("e"), F.col("trip_id"))
    )
    return cand.unionByName(echo)


_FPR_STRUCT = (
    "CAST(seq AS STRING) || ':' || CAST(rank AS STRING) || ':' || "
    "CAST(edge_id AS STRING) || ':' || CAST(cand_node AS STRING) || ':' || "
    "CAST(CAST(FLOOR(emission * 1024 + 0.5) AS BIGINT) AS STRING)"
)


def trip_fingerprints(cand: DataFrame) -> DataFrame:
    """(trip_id, fingerprint, rep_trip): the A1 cluster key.

    The fingerprint hashes EVERYTHING the per-trip solve depends on —
    route-attr variant plus the ordered (seq, rank, edge, node,
    quantized emission) candidate structure (the reference refines its
    (first, last)-stop grouping with ``routingEqual``,
    ``shape_builder.cpp:724-767``; an exact groupBy on the full
    structure hash achieves the same partition without the O(n^2)
    scan). rep = min trip_id per fingerprint."""
    rows = cand.withColumn("emission", F.expr(emission_expr())).select(
        "trip_id",
        "seq",
        "rank",
        F.expr(f"{_TRIPNUM} % {N_RATTR_VARIANTS}").alias("variant"),
        F.expr(f"({_FPR_STRUCT})").alias("s"),
    )
    per_trip = rows.groupBy("trip_id", "variant").agg(
        F.md5(
            F.concat(
                F.col("variant").cast("string"),
                F.lit("#"),
                F.array_join(
                    F.transform(
                        F.sort_array(F.collect_list(F.struct("seq", "rank", "s"))),
                        lambda x: x["s"],
                    ),
                    "|",
                ),
            )
        ).alias("fingerprint"),
    )
    reps = per_trip.groupBy("fingerprint").agg(F.min("trip_id").alias("rep_trip"))
    return per_trip.join(reps, "fingerprint").select(
        "trip_id", "fingerprint", "rep_trip", "variant"
    )


def trip_clusters_sql() -> str:
    from . import candidates as cand_ops

    emis = emission_expr()
    return (
        cand_ops.candidates_cte_sql()
        + f""",
cand_all AS (
  SELECT * FROM cand
  UNION ALL
  SELECT 'e' || image_id, 'e' || trip_id, seq, x, y, edge_id, src, dst,
         level, oneway, cand_node, dist, rank
  FROM cand
),
rows_e AS (
  SELECT trip_id, seq, rank,
         {_TRIPNUM} % {N_RATTR_VARIANTS} AS variant,
         {_FPR_STRUCT.replace('emission', f'({emis})')} AS s
  FROM cand_all
),
per_trip AS (
  SELECT trip_id,
         MD5(CAST(variant AS VARCHAR) || '#' ||
             STRING_AGG(s, '|' ORDER BY seq, rank)) AS fingerprint
  FROM rows_e GROUP BY trip_id, variant
)
SELECT trip_id, fingerprint,
       MIN(trip_id) OVER (PARTITION BY fingerprint) AS rep_trip
FROM per_trip
"""
    )


def viterbi_full(
    cand: DataFrame,
    transitions_by_variant: dict[int, pd.DataFrame],
    fingerprints: DataFrame | None = None,
) -> DataFrame:
    """R7 with the COMPLETE model: candidate states are *directed edges*
    (router/misc.h:23-33 edge_candidate), emission = A5 penalty
    (dist-fac + track + nonOsm), transition = edge-based Dijkstra under
    the full R3 cost (turn restrictions enforced) with the trip's route
    attrs selecting the line-match costs.

    A1 clustering: only cluster representatives are solved; results
    broadcast-join back to members via the fingerprint. Output one row
    per (trip, seq): chosen directed edge state + costs.
    """
    spark = cand.sparkSession
    # candidate join feeds both the fingerprint and emission branches —
    # materialize once
    cand = cand.localCheckpoint(eager=False)
    if fingerprints is None:
        fingerprints = trip_fingerprints(cand)
    bc = spark.sparkContext.broadcast(tag_transitions(transitions_by_variant))

    with_emis = cand.withColumn("emission", F.expr(emission_expr()))
    keyed = with_emis.join(
        fingerprints.select("trip_id", "fingerprint", "rep_trip", "variant"), "trip_id"
    )
    # both the reps (DP input) and members (join-back) branches read
    # `keyed`; without materialization each branch re-runs the whole
    # candidate spatial join — at any scale that is the dominant cost
    keyed = keyed.localCheckpoint(eager=False)
    reps = keyed.filter(F.col("trip_id") == F.col("rep_trip")).select(
        "fingerprint", "variant", "seq", "edge_id", "cand_node", "emission", "rank"
    )

    from .routing import dp_partitions

    n_part = dp_partitions(spark)

    # one pandas group per fingerprint pays the Arrow+pandas per-group
    # constant once per REPRESENTATIVE — fine when clustering collapses
    # many trips per rep, but the main grid's structural trips are all
    # distinct, so the constant dominated (625 groups ~ +1.5 s at
    # sf0.1). Group a hash BUCKET of fingerprints per call instead and
    # loop the per-rep DP inside; buckets stay the distributed axis.
    def solve(pdf: pd.DataFrame) -> pd.DataFrame:
        out = [
            _viterbi_full_one(g, bc.value)
            for _, g in pdf.groupby("fingerprint", sort=False)
        ]
        return pd.concat(out, ignore_index=True)

    solved = (
        reps.withColumn("_bucket", F.pmod(F.hash("fingerprint"), F.lit(n_part)))
        .repartition(n_part, "_bucket")
        .groupBy("_bucket")
        .applyInPandas(
            solve,
            schema=(
                "fingerprint string, seq long, state_edge long, edge_id long, "
                "emission double, acc_cost double"
            ),
        )
    )
    members = keyed.select("trip_id", "fingerprint", "seq", "image_id").distinct()
    return members.join(solved, ["fingerprint", "seq"]).select(
        "trip_id", "seq", "image_id", "state_edge", "edge_id", "emission", "acc_cost"
    )


def viterbi_trip_debug(
    cand: DataFrame,
    transitions_by_variant: dict[int, pd.DataFrame],
    trip_id: str,
) -> DataFrame:
    """The ``pfaedle -T <trip>`` debug surface (app.cpp:206-224 +
    shape_builder.cpp:136-144): ONE trip's complete candidate layers —
    every directed-edge state per observation with its emission, the
    layer's DP cost through the full R3 transition model, and whether
    the backtrack chose it. Rows with chosen=true reproduce
    :func:`viterbi_full` for the trip exactly (asserted in
    tests/test_edge_routing.py); the GeoJSON dump goes through
    sources.osm.geojson_sink."""
    spark = cand.sparkSession
    one = cand.filter(F.col("trip_id") == trip_id).localCheckpoint(eager=False)
    fps = trip_fingerprints(one)
    bc = spark.sparkContext.broadcast(tag_transitions(transitions_by_variant))
    keyed = (
        one.withColumn("emission", F.expr(emission_expr()))
        .join(fps.select("trip_id", "fingerprint", "variant"), "trip_id")
        .select("fingerprint", "variant", "seq", "edge_id", "cand_node", "emission", "rank")
    )

    def solve(pdf: pd.DataFrame) -> pd.DataFrame:
        return _viterbi_full_one(pdf, bc.value, debug=True)

    return keyed.groupBy("fingerprint").applyInPandas(
        solve,
        schema=(
            "fingerprint string, seq long, state_edge long, edge_id long, "
            "emission double, acc_cost double, chosen boolean"
        ),
    )


_VF_CSR_CACHE: dict = {}

# driver-side token generator: two DIFFERENT transition tables must never
# share a cache slot (same hazard class as routing._ROUTE_CACHE keying on
# id(csr) — a dead object's address can be reused). The token is minted
# once per transitions dict on the driver and travels inside the
# broadcast, so executor-side cache keys are collision-free by
# construction.
_VF_TOKEN_COUNTER = __import__("itertools").count(1)


class TransitionSet(dict):
    """Transitions-by-variant mapping + an identity token (a plain dict
    subclass: keys/iteration unchanged, the token rides as an instance
    attribute and survives pickling into the broadcast)."""

    _vf_token: tuple | None = None


def tag_transitions(tbv: dict) -> "TransitionSet":
    """Return a token-carrying view of a transitions-by-variant dict
    (idempotent on already-tagged sets). All executor cache keys derive
    from the token."""
    if getattr(tbv, "_vf_token", None) is not None:
        return tbv  # type: ignore[return-value]
    out = TransitionSet(tbv)
    out._vf_token = (id(tbv), next(_VF_TOKEN_COUNTER))
    return out


def _vf_csr(bc_value: dict, variant: int) -> dict:
    key = (getattr(bc_value, "_vf_token", None), variant)
    if key not in _VF_CSR_CACHE:
        if len(_VF_CSR_CACHE) > 8:
            _VF_CSR_CACHE.clear()
        csr = build_edge_csr(bc_value[variant])
        csr["cache_key"] = key
        _VF_CSR_CACHE[key] = csr
    return _VF_CSR_CACHE[key]


def _layer_heuristic(csr: dict, tgt_idx: frozenset) -> list | None:
    """Admissible per-state A* heuristic (min straight-line displacement
    to any target's start node), cached per target set — all seeds of a
    DP layer share one table."""
    xy = csr.get("xy")
    if xy is None or not tgt_idx:
        return None
    hcache = csr.setdefault("_hcache", {})
    harr = hcache.get(tgt_idx)
    if harr is None:
        if len(hcache) > 4096:
            hcache.clear()
        txy = xy[np.fromiter(tgt_idx, dtype=np.int64)]
        dx = xy[:, 0:1] - txy[None, :, 0].reshape(1, -1)
        dy = xy[:, 1:2] - txy[None, :, 1].reshape(1, -1)
        harr = np.nan_to_num(np.sqrt(dx * dx + dy * dy), nan=0.0).min(axis=1)
        # keep the ndarray: a tolist() here allocates |states| python
        # floats per distinct layer target set, while A* only ever reads
        # the states it explores
        hcache[tgt_idx] = harr
    return harr


def edge_dijkstra_viterbi_step(
    csr: dict,
    seeds: list[tuple[int, float]],
    targets: list[int],
    band: bool = True,
) -> tuple[dict[int, float], dict[int, int]]:
    """ONE multi-source A* for a whole Viterbi layer transition.

    ``seeds`` are (state edge id, accumulated DP cost) for the previous
    layer; the heap is seeded with those costs, so a settled target t
    directly carries min_i(dp_i + dist(i -> t)) — the min-plus product
    the DP needs — without ever materializing the |prev| x |cur| matrix
    or running |prev| separate searches (the reference pays the full
    N x M hop matrix per layer, router.cpp:626-688; the combined
    frontier here explores each region once).

    Returns ({target edge id: min total cost}, {target edge id: seed
    ORDINAL that won}). Deterministic: heap ties break on (cost, state
    edge id, seed ordinal).
    """
    idx = csr["idx"]
    indptr, dsts, cost, states = csr["indptr"], csr["dst"], csr["cost"], csr["states"]
    remaining = {idx[t] for t in targets if t in idx}

    live_seeds = []
    for ordn, (s, c) in enumerate(seeds):
        si = idx.get(int(s))
        if si is not None and math.isfinite(c):
            live_seeds.append((ordn, si, c))
    # R6 component shortcut (router.cpp:598-599): a target in a weak
    # component no seed can reach is inf by construction — drop it up
    # front, or the A* exhausts the reachable graph before giving up
    comp = csr.get("comp")
    if comp is not None and remaining:
        seed_comps = {int(comp[si]) for _, si, _ in live_seeds}
        remaining = {t for t in remaining if int(comp[t]) in seed_comps}
    tgt_idx = frozenset(remaining)
    harr = _layer_heuristic(csr, tgt_idx)

    pq: list[tuple[float, float, int, int, int]] = []
    for ordn, si, c in live_seeds:
        h0 = float(harr[si]) if harr is not None else 0.0
        pq.append((c + h0, c, int(states[si]), ordn, si))
    heapq.heapify(pq)

    # R5 hop band (router::getHopBand, router.cpp:229-306): once the
    # pilot (the first settled target, reusing THIS search instead of a
    # separate pilot Dijkstra) fixes the min hop cost c0, cap the search
    # at max(c0, pend*levelPunish[2])*3 + turn + station pens, where
    # pend is the max straight-line seed->target distance. The band is
    # on the PURE HOP cost (d minus the winning seed's dp), as the
    # reference bands each pairwise hop — NOT on the combined DP total:
    # a target whose hop is in-band must stay reachable even when its
    # best seed carries dp far above the layer minimum. An entry whose
    # hop exceeds the cap is discarded (that seed-pair is inf); the
    # state can still settle later via an in-band seed.
    band_cap: float | None = None
    relax_cap: float | None = None
    pend = 0.0
    seed_dp = {ordn: c for ordn, _, c in live_seeds}
    # dp SPREAD across the layer's seeds: settle-once keys states by min
    # TOTAL (dp + hop), while the reference bands each PAIRWISE hop
    # (router.cpp:229-306). A low-dp seed can settle a shared transit
    # state first and then get band-pruned en route, shadowing an
    # in-band higher-dp seed. Expansion therefore prunes at
    # band_cap + spread: if pair (B, T) is strictly in-band, every state
    # x on B's shortest path settles at total <= dp_B + hop_B(x), so the
    # settling seed s has hop(x) = total - dp_s <= spread + band_cap —
    # never pruned — and T provably receives a delivery with
    # total <= dp_B + hop_B(T). A target RESOLVES only on a strictly
    # in-band first settle (then its value equals the pairwise banded
    # min — any strict pop witnesses an in-band pair, so first-pop total
    # == min in-band pair total); a target whose first settle is only
    # relax-band goes to the exact pairwise repair pass below.
    spread = 0.0
    if live_seeds:
        dps = [c for _, _, c in live_seeds]
        spread = max(dps) - min(dps)
    if band and live_seeds and remaining:
        xy = csr.get("xy")
        if xy is not None:
            sxy = xy[[si for _, si, _ in live_seeds]]
            txy = xy[np.fromiter(remaining, dtype=np.int64)]
            dx = sxy[:, 0:1] - txy[None, :, 0].reshape(1, -1)
            dy = sxy[:, 1:2] - txy[None, :, 1].reshape(1, -1)
            pend = float(np.nan_to_num(np.sqrt(dx * dx + dy * dy), nan=0.0).max())

    dist: dict[int, float] = {}
    origin: dict[int, int] = {}
    suspects: set[int] = set()  # targets settled only via out-of-band pops
    tgt_set = tgt_idx
    while pq and remaining:
        _, d, _, ordn, u = heapq.heappop(pq)
        if u in dist:
            continue
        hop = d - seed_dp[ordn]
        if relax_cap is not None and hop > relax_cap:
            continue  # beyond the band for EVERY seed => truly inf
        strict = band_cap is None or hop <= band_cap
        dist[u] = d  # transit settle: min TOTAL, proven sufficient above
        origin[u] = ordn
        if u in remaining:
            remaining.discard(u)
            if not strict:
                suspects.add(u)  # pairwise-banded value uncertain
            if not remaining:
                break
            if band and band_cap is None:
                c0 = hop  # the pilot's pure hop cost
                band_cap = max(c0, pend * OPTS["level_punish"][2]) * 3.0 + \
                    OPTS["full_turn_punish"] + OPTS["pass_thru_station_punish"]
                relax_cap = band_cap + spread
        for i in range(indptr[u], indptr[u + 1]):
            v = int(dsts[i])
            if v not in dist:
                d2 = d + float(cost[i])
                if relax_cap is not None and d2 - seed_dp[ordn] > relax_cap:
                    continue  # prune pushes beyond every seed's hop band
                hv = float(harr[v]) if harr is not None else 0.0
                heapq.heappush(pq, (d2 + hv, d2, int(states[v]), ordn, v))
    out_d: dict[int, float] = {}
    out_o: dict[int, int] = {}
    if suspects and band_cap is not None:
        rd, ro = _pairwise_band_step(csr, live_seeds, suspects, band_cap, harr)
        for ti, dv in rd.items():
            dist[ti] = dv
            origin[ti] = ro[ti]
        for ti in suspects - rd.keys():
            dist.pop(ti, None)  # no strictly in-band pair => inf
    for t in targets:
        ti = idx.get(t)
        if ti is not None and ti in dist:
            out_d[t] = dist[ti]
            out_o[t] = origin[ti]
    return out_d, out_o


def _pairwise_band_step(
    csr: dict,
    live_seeds: list[tuple[int, int, float]],
    tgt_idx: set[int],
    band_cap: float,
    harr,
) -> tuple[dict[int, float], dict[int, int]]:
    """Exact pairwise-banded repair: settlement keyed by (state, seed)
    — the reference's N x M granularity (router.cpp:626-688) — with the
    strict per-seed hop cap, run only for the rare targets the combined
    search could not resolve strictly in-band. First pop at a target is
    the min total over strictly in-band pairs; a target never popped
    has no in-band pair and stays inf."""
    indptr, dsts = csr["indptr"], csr["dst"]
    cost, states = csr["cost"], csr["states"]
    seed_dp = {ordn: c for ordn, _, c in live_seeds}
    remaining = set(tgt_idx)
    pq: list[tuple[float, float, int, int, int]] = []
    for ordn, si, c in live_seeds:
        h0 = float(harr[si]) if harr is not None else 0.0
        pq.append((c + h0, c, int(states[si]), ordn, si))
    heapq.heapify(pq)
    seen: set[tuple[int, int]] = set()
    out_d: dict[int, float] = {}
    out_o: dict[int, int] = {}
    while pq and remaining:
        _, d, _, ordn, u = heapq.heappop(pq)
        if (u, ordn) in seen:
            continue
        if d - seed_dp[ordn] > band_cap:
            continue
        seen.add((u, ordn))
        if u in remaining:
            remaining.discard(u)
            out_d[u] = d
            out_o[u] = ordn
            if not remaining:
                break
        for i in range(indptr[u], indptr[u + 1]):
            v = int(dsts[i])
            if (v, ordn) not in seen:
                d2 = d + float(cost[i])
                if d2 - seed_dp[ordn] > band_cap:
                    continue
                hv = float(harr[v]) if harr is not None else 0.0
                heapq.heappush(pq, (d2 + hv, d2, int(states[v]), ordn, v))
    return out_d, out_o


def _viterbi_full_one(
    pdf: pd.DataFrame, trans_by_variant: dict, debug: bool = False
) -> pd.DataFrame:
    """Layered min-plus DP over directed-edge candidate states; ties
    break toward the smaller state id (rows pre-sorted). With ``debug``,
    emits every candidate state per layer (DP cost + chosen flag)
    instead of the winners only."""
    fpr = pdf["fingerprint"].iloc[0]
    variant = int(pdf["variant"].iloc[0])
    csr = _vf_csr(trans_by_variant, variant)

    # Layer prep in flat numpy (the pandas slice/concat/iloc version
    # cost ~2-3 ms PER TRIP of pure scaffolding — the dominant term on
    # short-trip worlds). The DP arithmetic below is untouched: same
    # d.get lookups, same emission add, same argmin tie-break.
    seq = pdf["seq"].to_numpy(np.int64)
    eid = pdf["edge_id"].to_numpy(np.int64)
    emi = pdf["emission"].to_numpy(np.float64)
    # drop_duplicates (seq, edge_id, emission), first occurrence
    o1 = np.lexsort((np.arange(len(seq)), emi, eid, seq))
    sq1, ei1, em1 = seq[o1], eid[o1], emi[o1]
    keep = np.ones(len(sq1), bool)
    keep[1:] = (
        (sq1[1:] != sq1[:-1]) | (ei1[1:] != ei1[:-1]) | (em1[1:] != em1[:-1])
    )
    first_idx = np.sort(o1[keep])
    bsq, bei, bem = seq[first_idx], eid[first_idx], emi[first_idx]
    nb = len(bsq)
    # directed states: fwd block then rev block, sorted by (seq, state)
    # with the block order as the stable tie-break (REV_OFF > any edge
    # id, so within a seq all fwd states precede all rev states)
    s_seq = np.concatenate([bsq, bsq])
    s_state = np.concatenate([bei, bei + REV_OFF])
    s_eid = np.concatenate([bei, bei])
    s_em = np.concatenate([bem, bem])
    o2 = np.lexsort((np.arange(2 * nb), s_state, s_seq))
    s_seq, s_state, s_eid, s_em = s_seq[o2], s_state[o2], s_eid[o2], s_em[o2]
    seqs = np.unique(s_seq)
    bounds = np.append(np.searchsorted(s_seq, seqs), 2 * nb)
    lay = [slice(int(bounds[i]), int(bounds[i + 1])) for i in range(len(seqs))]

    dp_cost: list[np.ndarray] = []
    dp_prev: list[np.ndarray] = []
    dp_cost.append(s_em[lay[0]].copy())
    dp_prev.append(np.full(bounds[1] - bounds[0], -1, dtype=np.int64))
    for li in range(1, len(seqs)):
        prev_states = s_state[lay[li - 1]]
        cur_states = [int(t) for t in s_state[lay[li]]]
        seeds = list(zip((int(s) for s in prev_states), dp_cost[-1].tolist()))
        d, o = edge_dijkstra_viterbi_step(csr, seeds, cur_states)
        emission = s_em[lay[li]]
        dp_cost.append(np.array([d.get(t, np.inf) for t in cur_states]) + emission)
        dp_prev.append(np.array([o.get(t, 0) for t in cur_states], dtype=np.int64))

    choice = np.zeros(len(seqs), dtype=np.int64)
    choice[-1] = int(np.argmin(dp_cost[-1]))
    for li in range(len(seqs) - 1, 0, -1):
        choice[li - 1] = dp_prev[li][choice[li]]

    if debug:
        # -T surface: EVERY candidate state per layer with its DP cost
        # and whether the backtrack chose it (app.cpp:206-224)
        acc = np.concatenate(dp_cost)
        chosen = np.zeros(2 * nb, dtype=bool)
        chosen[bounds[:-1] + choice] = True
        return pd.DataFrame(
            {
                "fingerprint": fpr, "seq": s_seq, "state_edge": s_state,
                "edge_id": s_eid, "emission": s_em, "acc_cost": acc,
                "chosen": chosen,
            }
        )

    pick = bounds[:-1] + choice
    return pd.DataFrame(
        {
            "fingerprint": fpr,
            "seq": s_seq[pick],
            "state_edge": s_state[pick],
            "edge_id": s_eid[pick],
            "emission": s_em[pick],
            "acc_cost": np.array(
                [float(dp_cost[li][int(choice[li])]) for li in range(len(seqs))]
            ),
        }
    )


_DEDGES_PDF_CACHE: dict = {}


def directed_full_pdf(spark: SparkSession, edges: DataFrame) -> pd.DataFrame:
    """Driver-side memo of the directed-edge collect (graph-sized,
    static across queries) — same Amdahl argument as
    routing.edges_broadcast: re-collecting per invocation is serial
    driver time that does not shrink with cluster size."""
    from .routing import session_token

    key = (session_token(spark), edges.semanticHash())
    if key not in _DEDGES_PDF_CACHE:
        if len(_DEDGES_PDF_CACHE) > 4:
            _DEDGES_PDF_CACHE.clear()
        _DEDGES_PDF_CACHE[key] = directed_full(edges).toPandas()
    return _DEDGES_PDF_CACHE[key]


_VARIANT_TRANS_CACHE: dict = {}


def build_variant_transitions(
    spark: SparkSession, edges: DataFrame, nodes: DataFrame | None = None
) -> dict[int, pd.DataFrame]:
    """One transition table per route-attr variant (the reference keys
    its route cache by rAttrs the same way, router.cpp:626-688).

    Memoized per (session, edge-plan): the tables are deterministic
    functions of the graph, and both viterbi_full and shape_assembly
    need them — rebuilding 3 self-join jobs per query invocation is
    pure waste (driver-side cache, graph-sized, same budget as the CSR
    broadcast). The composed lifecycle passes a DIFFERENT edge set than
    the standalone queries, so the key carries the plan hash."""
    from .. import datagen

    from .routing import session_token

    key = (
        session_token(spark),
        edges.semanticHash(),
        nodes.semanticHash() if nodes is not None else None,
    )
    if key not in _VARIANT_TRANS_CACHE:
        restr = gtfs_ops.read_restrictions(gtfs_ops.restriction_members(spark, edges))
        if nodes is None:
            nodes = datagen.nodes(spark)
        if len(_VARIANT_TRANS_CACHE) > 4:
            _VARIANT_TRANS_CACHE.clear()
        _VARIANT_TRANS_CACHE[key] = tag_transitions({
            v: pdf.drop(columns="__variant__").reset_index(drop=True)
            for v, pdf in _all_variant_transitions(edges, restr, nodes)
        })
    return _VARIANT_TRANS_CACHE[key]


def _all_variant_transitions(edges, restr, nodes):
    """All variants' transition tables in ONE Spark job (union with a
    variant tag + single Arrow collect) instead of N sequential
    build+collect jobs — the per-variant branches differ only in folded
    rattr literals, so they parallelize perfectly inside one job."""
    from functools import reduce

    dfs = [
        turn_transitions(edges, restr, nodes, rattrs=rattrs_for_variant(v))
        .withColumn("__variant__", F.lit(v))
        for v in range(N_RATTR_VARIANTS)
    ]
    allpdf = reduce(lambda a, b: a.unionByName(b), dfs).toPandas()
    return [
        (v, allpdf[allpdf["__variant__"] == v])
        for v in range(N_RATTR_VARIANTS)
    ]


def restricted_paths_sql() -> str:
    """Oracle: unrolled Bellman-Ford over the transitions CTE.

    Left-to-right accumulation (d_prev + cost) matches the Dijkstra's
    float addition order exactly, so costs are bit-identical. BF_ROUNDS
    bounds optimal-path transitions: any optimum is cheaper than the
    worst Manhattan route (<= 15 transitions x max-cost ~21.5k) and
    every transition costs >= 2048, so > ~160 transitions can never be
    optimal."""
    in_src = ",".join(str(s) for s in SOURCE_NODES)
    in_tgt = ",".join(str(t) for t in TARGET_NODES)
    parts = [transitions_ctes(edge_filter=SUB_FILTER)]
    parts.append(f""",
sources AS (SELECT edge_id AS from_edge, src AS src_node FROM dedges WHERE src IN ({in_src})),
targets AS (SELECT edge_id AS to_edge, dst AS dst_node FROM dedges WHERE dst IN ({in_tgt})),
d0 AS MATERIALIZED (SELECT from_edge AS src_e, from_edge AS state, 0.0 AS cost FROM sources)""")
    for i in range(1, BF_ROUNDS + 1):
        parts.append(f""",
d{i} AS MATERIALIZED (
  SELECT src_e, state, MIN(cost) AS cost FROM (
    SELECT src_e, state, cost FROM d{i - 1}
    UNION ALL
    SELECT d.src_e, t.to_edge, d.cost + t.cost
    FROM d{i - 1} d JOIN trans t ON t.from_edge = d.state
  ) GROUP BY src_e, state
)""")
    parts.append(f"""
SELECT s.from_edge, s.src_node, t.to_edge, t.dst_node, d.cost AS path_cost
FROM sources s
CROSS JOIN targets t
LEFT JOIN d{BF_ROUNDS} d ON d.src_e = s.from_edge AND d.state = t.to_edge
""")
    return "".join(parts)
