"""R10 shape assembly, SQL-oracled end to end on the corridor world.

``shape_geoms`` (the R10 + W2 + endpoint-clip chain over the full-cost
edge Viterbi, reference ``shape_builder.cpp:80-119,404-518``) was the
largest remaining rows-only surface: its hop paths come from per-pair
edge-state Dijkstras, which have no closed form on the grid world. On a
PATH GRAPH they do: between any two directed-edge states of a corridor
the optimal state path is UNIQUE (any excursion on a line strictly adds
cost — every traverse term is > 0 and each extra reversal adds the full
turn punish), so the whole chain

  J5 candidates -> A1 fingerprint clustering -> R7 edge-state Viterbi
  (WITH the R5 hop band: pilot c0, pend, in-band pair min) -> per-hop
  path capture -> orient/concat (graph.cpp:290-334) -> endpoint clip
  (get_gtfs_shape) -> W2 cumulative distance

is expressible in DuckDB as: the shared candidates CTE, the
bit-identical transitions CTE (`transitions_ctes` with the corridor
head), an unrolled Bellman-Ford with predecessor capture (same exact
left-to-right float accumulation as the engine's Dijkstra — and on this
world every arc cost, emission, DP total and clip fraction is an exact
integer/dyadic, so addition is exact at ANY order), a recursive
forward-DP with the band's pilot/pend/cap arithmetic, a recursive
backtrack, recursive per-pair path reconstruction, and window-sum
geometry emission.

The Spark side runs the REAL operators (candidate_edges,
build_variant_transitions, shape_assembly) — nothing is special-cased
for the corridor; only the input world is.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import datagen
from . import candidates, edge_routing
from .edge_routing import (
    OPTS,
    REV_OFF,
    _FPR_STRUCT,
    _TRIPNUM,
    N_RATTR_VARIANTS,
    emission_expr,
    transitions_ctes,
)
from .. import constants as C

# strictly more rounds than the longest optimal state path on the
# corridor (<= COR_EDGES + 3 transitions: one monotone run plus at most
# two reversals at the ends)
BF_ROUNDS = C.COR_EDGES + 10


_CAND_MEMO: dict = {}


def _corridor_inputs(spark: SparkSession, sf_dir: str):
    """Session-memoized shared prefix of the three corridor queries:
    the J5 candidate join (eager localCheckpoint — shapes_corridor,
    viterbi_corridor and trip_debug_corridor would otherwise each
    re-run the cell join) plus the transition tables (already memoized
    per (session, plan) inside build_variant_transitions)."""
    from .routing import session_token

    eds = datagen.corridor_edges(spark)
    nds = datagen.corridor_nodes(spark)
    key = (session_token(spark), sf_dir)
    cand = _CAND_MEMO.get(key)
    if cand is None:
        if len(_CAND_MEMO) > 4:
            # release evicted checkpoint blocks, don't just drop the refs
            for old in _CAND_MEMO.values():
                try:
                    old.unpersist()
                except Exception:
                    pass
            _CAND_MEMO.clear()
        cand = candidates.candidate_edges(
            datagen.corridor_points(spark, sf_dir), eds
        ).localCheckpoint(eager=True)
        _CAND_MEMO[key] = cand
    tbv = edge_routing.build_variant_transitions(spark, eds, nodes=nds)
    return eds, cand, tbv


def shapes_corridor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full R10 pipeline over the corridor world, via the real
    operators (no corridor-specific engine code)."""
    eds, cand, tbv = _corridor_inputs(spark, sf_dir)
    return edge_routing.shape_assembly(
        cand, tbv, edge_routing.directed_full_pdf(spark, eds)
    )


def _corridor_head() -> str:
    """WITH-head defining the corridor world's points/edges/nodes —
    the SQL twins of datagen.corridor_* (exactly those derivations)."""
    ne, sp = C.COR_EDGES, C.COR_SP
    return f"""WITH points AS (
  SELECT 'cim_' || CAST(doc_id AS VARCHAR) AS image_id,
         doc_id,
         CAST(((doc_id * {C.COR_XSTEP}) % {C.COR_XMOD}) * {C.COR_XCELL!r} AS DOUBLE) AS x,
         CAST(0.0 AS DOUBLE) AS y,
         'ctrip_' || CAST(doc_id % {C.N_TRIPS} AS VARCHAR) AS trip_id,
         doc_id // {C.N_TRIPS} AS seq
  FROM documents
),
edges AS (
  SELECT i AS edge_id, i AS src, i + 1 AS dst,
         CAST(i * {sp!r} AS DOUBLE) AS x1, CAST(0.0 AS DOUBLE) AS y1,
         CAST((i + 1) * {sp!r} AS DOUBLE) AS x2, CAST(0.0 AS DOUBLE) AS y2,
         CAST(i % 5 + 3 AS INT) AS level,
         (i % 7 = 0) AS oneway,
         CAST({sp!r} AS DOUBLE) AS length
  FROM range(0, {ne}) t(i)
),
nodes AS (
  SELECT i AS node_id, CAST(i * {sp!r} AS DOUBLE) AS x,
         CAST(0.0 AS DOUBLE) AS y, 0 AS component,
         (i % {C.COR_STATION_MOD} = 0) AS is_station
  FROM range(0, {ne + 1}) t(i)
)"""


def _bf_hop_ctes() -> str:
    """Unrolled Bellman-Ford over the corridor's edge-state transitions
    with predecessor capture — ends in ``hop(seed, state, cost, pred)``.

    Left-to-right accumulation (b.cost + t.cost) is the engine
    Dijkstra's float addition order; with the corridor's integer arc
    costs both are exact. pred is unambiguous because the optimal path
    per (seed, state) is unique on a path graph."""
    parts = ["""
allst AS (SELECT edge_id AS state FROM dedges),
bf0 AS MATERIALIZED (
  SELECT state AS seed, state, CAST(0.0 AS DOUBLE) AS cost,
         CAST(-1 AS BIGINT) AS pred
  FROM allst
)"""]
    for i in range(1, BF_ROUNDS + 1):
        parts.append(f""",
bf{i} AS MATERIALIZED (
  SELECT seed, state, cost, pred FROM (
    SELECT seed, state, cost, pred,
           ROW_NUMBER() OVER (PARTITION BY seed, state
                              ORDER BY cost ASC, pred ASC) AS rk
    FROM (
      SELECT seed, state, cost, pred FROM bf{i - 1}
      UNION ALL
      SELECT b.seed, t.to_edge, b.cost + t.cost, b.state
      FROM bf{i - 1} b JOIN trans t ON t.from_edge = b.state
    )
  ) WHERE rk = 1
)""")
    parts.append(f""",
hop AS MATERIALIZED (SELECT * FROM bf{BF_ROUNDS})""")
    return "".join(parts)


def _state_x(col: str) -> str:
    """Start-node x of a directed state (the A*/band xy of the engine:
    turn_transitions ships a_x1/a_y1 per state; corridor y = 0)."""
    sp = C.COR_SP
    return (
        f"CASE WHEN {col} >= {REV_OFF} THEN ({col} - {REV_OFF} + 1) * {sp!r} "
        f"ELSE {col} * {sp!r} END"
    )


def viterbi_corridor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R7 with the COMPLETE model (viterbi_full: edge states, A5
    emission, full R3 transition cost, R5 band, A1 clustering) over the
    corridor world — the SQL-oracled twin of the rows-only
    ``viterbi_full`` query, sharing the corridor DP oracle's CTE chain
    up through the backtrack."""
    _, cand, tbv = _corridor_inputs(spark, sf_dir)
    return edge_routing.viterbi_full(cand, tbv)


def viterbi_corridor_sql() -> str:
    """Chosen-state surface from the shared corridor DP chain: the
    backtracked (seq, state) per fingerprint joined to every member
    trip's own (trip_id, image_id) — exactly viterbi_full's member
    join-back."""
    return _corridor_dp_ctes() + """,
members AS (
  SELECT DISTINCT f.fingerprint, e.trip_id, e.seq, e.image_id
  FROM emis e JOIN fpr f ON f.trip_id = e.trip_id
)
SELECT m.trip_id, d.seq, m.image_id, d.state AS state_edge, d.edge_id,
       d.em AS emission, d.dp AS acc_cost
FROM back b
JOIN dp d ON d.fingerprint = b.fingerprint AND d.seq = b.seq
         AND d.state = b.state
JOIN members m ON m.fingerprint = d.fingerprint AND m.seq = d.seq
"""


def _corridor_dp_ctes() -> str:
    """Shared oracle chain: corridor world -> candidates CTE ->
    bit-identical transitions CTE -> Bellman-Ford hop table (pred
    capture) -> A1 fingerprints/reps -> recursive band DP -> recursive
    backtrack; ends in ``back(fingerprint, seq, state)``.
    ``viterbi_corridor_sql`` and ``shapes_corridor_sql`` both build on
    it."""
    turn_station_pens = OPTS["full_turn_punish"] + OPTS["pass_thru_station_punish"]
    lvl2 = OPTS["level_punish"][2]
    emis = emission_expr()
    cand_fragment = candidates.candidates_cte_sql(head=_corridor_head())
    trans_fragment = transitions_ctes(head="", edges_rel="edges", nodes_rel="nodes")
    return f"""{cand_fragment}{trans_fragment},{_bf_hop_ctes()},
emis AS MATERIALIZED (
  SELECT trip_id, seq, image_id, x, y, edge_id, cand_node, dist, rank,
         {emis} AS emission
  FROM cand
),
fpr AS MATERIALIZED (
  SELECT trip_id, variant,
         MD5(CAST(variant AS VARCHAR) || '#' ||
             STRING_AGG(s, '|' ORDER BY seq, rank)) AS fingerprint
  FROM (
    SELECT trip_id, seq, rank,
           {_TRIPNUM} % {N_RATTR_VARIANTS} AS variant,
           {_FPR_STRUCT} AS s
    FROM emis
  )
  GROUP BY trip_id, variant
),
reps AS (SELECT fingerprint, MIN(trip_id) AS rep_trip FROM fpr GROUP BY fingerprint),
rcand AS MATERIALIZED (
  SELECT r.fingerprint, e.*
  FROM emis e
  JOIN fpr f ON f.trip_id = e.trip_id
  JOIN reps r ON r.fingerprint = f.fingerprint AND r.rep_trip = e.trip_id
),
rbase AS (SELECT DISTINCT fingerprint, seq, edge_id, emission FROM rcand),
rstates AS MATERIALIZED (
  SELECT fingerprint, seq, edge_id, emission, edge_id AS state FROM rbase
  UNION ALL
  SELECT fingerprint, seq, edge_id, emission, edge_id + {REV_OFF} FROM rbase
),
layers AS (SELECT DISTINCT fingerprint, seq FROM rstates),
nxt AS (
  SELECT fingerprint, seq,
         LEAD(seq) OVER (PARTITION BY fingerprint ORDER BY seq) AS next_seq
  FROM layers
),
first_layer AS (SELECT fingerprint, MIN(seq) AS seq FROM layers GROUP BY fingerprint),
last_layer AS (SELECT fingerprint, MAX(seq) AS seq FROM layers GROUP BY fingerprint),
dp AS MATERIALIZED (
  WITH RECURSIVE fwd(fingerprint, seq, state, edge_id, em, dp, prev_state) AS (
    SELECT s.fingerprint, s.seq, s.state, s.edge_id, s.emission, s.emission,
           CAST(-1 AS BIGINT)
    FROM rstates s
    JOIN first_layer f ON f.fingerprint = s.fingerprint AND f.seq = s.seq
    UNION ALL
    SELECT fingerprint, seq, state, edge_id, em, best + em, prev_state FROM (
      -- R5 band per layer transition: pilot c0 = hop of the
      -- (total, target-state, seed-state)-first pair; pend = max
      -- straight-line seed->target start-node distance; in-band pairs
      -- (hop <= cap) only; per-target argmin (total, seed-state)
      SELECT fingerprint, seq, state, edge_id, em, total AS best,
             seed_state AS prev_state,
             ROW_NUMBER() OVER (PARTITION BY fingerprint, state
                                ORDER BY total ASC, seed_state ASC) AS rk
      FROM (
        SELECT *,
               GREATEST(c0, pend * {lvl2!r}) * 3.0 + {turn_station_pens!r} AS cap
        FROM (
          SELECT *,
                 MAX(sl) OVER (PARTITION BY fingerprint) AS pend,
                 FIRST_VALUE(hopc) OVER (
                   PARTITION BY fingerprint
                   ORDER BY total ASC, state ASC, seed_state ASC) AS c0
          FROM (
            SELECT p.fingerprint, n.seq, n.state, n.edge_id,
                   n.emission AS em, p.state AS seed_state,
                   p.dp + h.cost AS total, h.cost AS hopc,
                   ABS({_state_x('p.state')} - {_state_x('n.state')}) AS sl
            FROM fwd p
            JOIN nxt x ON x.fingerprint = p.fingerprint AND x.seq = p.seq
                      AND x.next_seq IS NOT NULL
            JOIN rstates n ON n.fingerprint = p.fingerprint AND n.seq = x.next_seq
            JOIN hop h ON h.seed = p.state AND h.state = n.state
          )
        )
      ) WHERE hopc <= cap
    ) WHERE rk = 1
  )
  SELECT * FROM fwd
),
prv AS (
  SELECT fingerprint, seq,
         LAG(seq) OVER (PARTITION BY fingerprint ORDER BY seq) AS prev_seq
  FROM layers
),
back AS MATERIALIZED (
  WITH RECURSIVE bk(fingerprint, seq, state) AS (
    SELECT fingerprint, seq, state FROM (
      SELECT d.fingerprint, d.seq, d.state,
             ROW_NUMBER() OVER (PARTITION BY d.fingerprint
                                ORDER BY d.dp ASC, d.state ASC) AS rk
      FROM dp d JOIN last_layer l ON l.fingerprint = d.fingerprint AND l.seq = d.seq
    ) WHERE rk = 1
    UNION ALL
    SELECT d.fingerprint, p.prev_seq, d.prev_state
    FROM bk b
    JOIN dp d ON d.fingerprint = b.fingerprint AND d.seq = b.seq
             AND d.state = b.state
    JOIN prv p ON p.fingerprint = b.fingerprint AND p.seq = b.seq
    WHERE p.prev_seq IS NOT NULL
  )
  SELECT * FROM bk
)"""


def shapes_corridor_sql() -> str:
    """The end-to-end R10 oracle; see module docstring."""
    sp = C.COR_SP
    return _corridor_dp_ctes() + f""",
chosen AS MATERIALIZED (
  SELECT fingerprint, seq, state,
         ROW_NUMBER() OVER (PARTITION BY fingerprint ORDER BY seq) - 1 AS k
  FROM back
),
wpairs AS (
  SELECT c1.fingerprint, c1.k, c1.state AS a_state, c2.state AS b_state
  FROM chosen c1
  JOIN chosen c2 ON c2.fingerprint = c1.fingerprint AND c2.k = c1.k + 1
),
wpath AS MATERIALIZED (
  -- per-hop path capture: predecessor backtrack from target to source
  -- (engine: edge_dijkstra_path; unique optimum => identical walk)
  WITH RECURSIVE pw(fingerprint, k, a_state, pos, state) AS (
    SELECT fingerprint, k, a_state, 0, b_state FROM wpairs
    UNION ALL
    SELECT p.fingerprint, p.k, p.a_state, p.pos + 1, h.pred
    FROM pw p JOIN hop h ON h.seed = p.a_state AND h.state = p.state
    WHERE h.pred <> -1
  )
  SELECT * FROM pw
),
walk AS MATERIALIZED (
  -- engine walk: per pair, path[:-1] source-first; then the final
  -- chosen state appended once
  SELECT fingerprint, state,
         ROW_NUMBER() OVER (PARTITION BY fingerprint ORDER BY ord1, ord2) - 1
           AS hop_seq
  FROM (
    SELECT fingerprint, k AS ord1, -pos AS ord2, state
    FROM wpath WHERE pos > 0
    UNION ALL
    SELECT c.fingerprint, 1000000000, 0, c.state
    FROM chosen c
    JOIN (SELECT fingerprint, MAX(k) AS mk FROM chosen GROUP BY fingerprint) m
      ON m.fingerprint = c.fingerprint AND c.k = m.mk
  )
),
stopxy AS (
  SELECT fingerprint,
         MIN(CASE WHEN seq = fseq THEN x END) AS fx0,
         MIN(CASE WHEN seq = lseq THEN x END) AS lx0
  FROM (
    SELECT r.fingerprint, r.seq, r.x, f.seq AS fseq, l.seq AS lseq
    FROM (SELECT DISTINCT fingerprint, seq, x FROM rcand) r
    JOIN first_layer f USING (fingerprint)
    JOIN last_layer l USING (fingerprint)
  )
  GROUP BY fingerprint
),
wseg AS (
  SELECT w.fingerprint, w.hop_seq, w.state,
         CASE WHEN w.state >= {REV_OFF}
              THEN ((w.state - {REV_OFF}) + 1) * {sp!r}
              ELSE (w.state % {REV_OFF}) * {sp!r} END AS sx,
         CASE WHEN w.state >= {REV_OFF}
              THEN (w.state - {REV_OFF}) * {sp!r}
              ELSE ((w.state % {REV_OFF}) + 1) * {sp!r} END AS ex
  FROM walk w
),
wmeta AS (
  SELECT s.fingerprint, COUNT(*) AS nwalk FROM wseg s GROUP BY s.fingerprint
),
tclip AS (
  -- endpoint clip parameters (get_gtfs_shape): first/last stop
  -- projected (clamped) onto the first/last walked oriented segment;
  -- degenerate single-edge trips keep tl >= t0 (monotone along travel)
  SELECT m.fingerprint, m.nwalk,
         t0, CASE WHEN m.nwalk = 1 AND tl < t0 THEN t0 ELSE tl END AS tl
  FROM wmeta m
  JOIN (
    SELECT s.fingerprint,
           LEAST(1.0, GREATEST(0.0,
             ((p.fx0 - s.sx) * (s.ex - s.sx)) / ((s.ex - s.sx) * (s.ex - s.sx))
           )) AS t0
    FROM wseg s JOIN stopxy p USING (fingerprint) WHERE s.hop_seq = 0
  ) h0 ON h0.fingerprint = m.fingerprint
  JOIN (
    SELECT s.fingerprint,
           LEAST(1.0, GREATEST(0.0,
             ((p.lx0 - s.sx) * (s.ex - s.sx)) / ((s.ex - s.sx) * (s.ex - s.sx))
           )) AS tl
    FROM wseg s
    JOIN wmeta m2 USING (fingerprint)
    JOIN stopxy p USING (fingerprint)
    WHERE s.hop_seq = m2.nwalk - 1
  ) hl ON hl.fingerprint = m.fingerprint
),
wfrac AS (
  SELECT s.fingerprint, s.hop_seq, s.state, s.sx, s.ex, c.t0, c.tl, c.nwalk,
         1.0 - CASE WHEN s.hop_seq = 0 THEN c.t0 ELSE 0.0 END
             - CASE WHEN s.hop_seq = c.nwalk - 1 THEN 1.0 - c.tl ELSE 0.0 END
           AS frac,
         CASE WHEN s.hop_seq = c.nwalk - 1
              THEN s.sx + c.tl * (s.ex - s.sx) ELSE s.ex END AS out_x
  FROM wseg s JOIN tclip c USING (fingerprint)
),
rows_out AS (
  SELECT fingerprint, CAST(0 AS BIGINT) AS pt_seq,
         sx + t0 * (ex - sx) AS x, CAST(0.0 AS DOUBLE) AS y,
         CAST(0.0 AS DOUBLE) AS cum_dist, CAST(-1 AS BIGINT) AS hop_seq,
         state AS edge_state
  FROM wfrac WHERE hop_seq = 0
  UNION ALL
  SELECT fingerprint, CAST(hop_seq + 1 AS BIGINT), out_x, CAST(0.0 AS DOUBLE),
         cum, CAST(hop_seq AS BIGINT), state
  FROM (
    SELECT *,
           SUM({sp!r} * GREATEST(frac, 0.0)) OVER (
             PARTITION BY fingerprint ORDER BY hop_seq) AS cum
    FROM wfrac
  )
)
SELECT t.trip_id, r.pt_seq, r.x, r.y, r.cum_dist, r.hop_seq,
       CAST(r.edge_state AS BIGINT) AS edge_state
FROM rows_out r
JOIN (SELECT DISTINCT trip_id, fingerprint FROM fpr) t USING (fingerprint)
"""


DEBUG_TRIP = "ctrip_3"


def trip_debug_corridor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ``pfaedle -T`` debug surface under the FULL cost model on the
    corridor: every directed-edge candidate state of one trip with its
    banded-DP layer cost and the backtrack's chosen flag — the
    full-cost twin of ``trip_debug_manhattan`` (which runs unpunished).
    Inf acc_cost rows are real: they are the states every seed pair
    reaches only outside the R5 hop band."""
    _, cand, tbv = _corridor_inputs(spark, sf_dir)
    # filtering the MEMOIZED candidate join is equivalent to joining the
    # pre-filtered points: the J5 join/rank are per-image
    return edge_routing.viterbi_trip_debug(
        cand.filter(F.col("trip_id") == DEBUG_TRIP), tbv, DEBUG_TRIP
    )


def trip_debug_corridor_sql() -> str:
    """All states (incl. band-inf ones, COALESCEd to +infinity) of the
    debug trip's fingerprint, chosen = backtrack membership."""
    return _corridor_dp_ctes() + f""",
dbg_f AS (SELECT DISTINCT fingerprint FROM fpr WHERE trip_id = '{DEBUG_TRIP}')
SELECT s.fingerprint, s.seq, s.state AS state_edge, s.edge_id,
       s.emission, COALESCE(d.dp, CAST('infinity' AS DOUBLE)) AS acc_cost,
       (b.state IS NOT NULL) AS chosen
FROM rstates s
JOIN dbg_f USING (fingerprint)
LEFT JOIN dp d ON d.fingerprint = s.fingerprint AND d.seq = s.seq
              AND d.state = s.state
LEFT JOIN back b ON b.fingerprint = s.fingerprint AND b.seq = s.seq
                AND b.state = s.state
"""
