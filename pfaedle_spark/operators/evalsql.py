"""DuckDB oracles for the REAL-WORLD eval surfaces — the last five
rows-only queries become bit-exact SQL twins:

* ``segmentize``   — W4 cut of the viterbi-aligned polyline at the
  ordered stop projections (collector::segmentize, collector.cpp:
  194-259), on the MAIN grid's chosen-node path.
* ``frechet_eval`` — A6 per-trip Fréchet d_f + accumulated variant
  (Geo.h:1560-1627) between the aligned path and the observation
  truth, densify included, as an anti-diagonal wavefront DP.
* ``df_histogram`` / ``eval_summary`` — the print_stats aggregates
  (collector.cpp:389-439) over those per-trip rows.
* ``simplify_geoms`` — G6 Douglas-Peucker 0.5 m (Geo.h:1041-1075) on
  the zigzag edge geometries, as an interval-splitting recursion.

Exactness contract (every clause mirrors a kernel decision):

1. The aligned polyline comes from ``nodedp.viterbi_align_grid_sql``
   — already bit-oracled, so its ``valigned`` vertex path equals the
   engine's chosen nodes exactly; vertex coords are exact lattice
   integers, observation coords exact integers (datagen).
2. All distances are ``SQRT(dx*dx + dy*dy)`` — the kernels were moved
   off np.hypot (different rounding on ~0.6% of inputs) to this exact
   expression tree (evalmetrics._cut_positions, geo._eff_seg,
   geo._dp_dist_to_chord), so each engine evaluates the identical
   correctly-rounded op sequence.
3. Sequential float sums: per-trip cumulative positions / totals have
   <= 7 terms, below DuckDB's window-sum tree-leaf size (probed:
   sequential through 24, tree-split at 32), so window SUMs here equal
   the kernels' explicit left-to-right loops; the 64-trip summary uses
   a recursive accumulator instead (evalmetrics.eval_summary_seq_sql).
4. Densify replays geo.densify's exact tree: step chain
   ``curd += seg`` is a recursive CTE (c1 = seg, c_{k+1} = c_k + seg),
   inserted points are ``x1 + ((dx / sl) * curd)``, original vertices
   pass through verbatim.
5. DP recurrences are pure selections (max/min) plus at most one add
   per cell — order-free given identical operands — evaluated as an
   anti-diagonal wavefront (cells of diagonal n need diagonals n-1 and
   n-2, carried one extra iteration via a fresh/stale flag).
6. Tie-breaks: np.argmin/argmax take the FIRST extremum, replayed as
   lexicographic (value, index) ROW_NUMBER / NOT-EXISTS predicates.
"""

from __future__ import annotations

from .. import constants as C
from ..sqlgen import with_ctes
from . import nodedp
from .evalmetrics import UNMATCHED_DF, df_histogram_sql, eval_summary_seq_sql
from .gridviterbi import N_LAYERS

_INF = "CAST('infinity' AS DOUBLE)"

# geo.MAX_DENSIFY_PTS — the densify cap that bounds the DP size
_MAX_PTS = 256


def _aligned_world() -> str:
    """CTE chain ending in ``valigned`` (trip_id, seq, x, y): the
    engine's chosen-node polyline (bit-oracled viterbi_align) plus the
    ``points`` observation table from the shared head."""
    return nodedp.viterbi_align_grid_sql(final_select=False)


def _verts_and_segs(side: str, src_sql: str) -> str:
    """Vertex index + segment table for one polyline side.

    ``{side}verts``: (trip_id, vi, x, y); ``{side}segs``: per segment
    (si = start vertex index) the start point, delta, and
    ``sl = SQRT(dx*dx + dy*dy)`` — the kernel's exact distance tree;
    ``{side}cum``: left-to-right cumulative start positions (<= 7
    terms: DuckDB's window SUM is sequential at this size)."""
    return f""",
{side}verts AS MATERIALIZED (
  SELECT trip_id,
         ROW_NUMBER() OVER (PARTITION BY trip_id ORDER BY seq) - 1 AS vi,
         x, y
  FROM {src_sql}
),
{side}segs AS MATERIALIZED (
  SELECT trip_id, vi AS si, x AS x1, y AS y1,
         nx - x AS dx, ny - y AS dy,
         SQRT((nx - x) * (nx - x) + (ny - y) * (ny - y)) AS sl
  FROM (
    SELECT trip_id, vi, x, y,
           LEAD(x) OVER (PARTITION BY trip_id ORDER BY vi) AS nx,
           LEAD(y) OVER (PARTITION BY trip_id ORDER BY vi) AS ny
    FROM {side}verts)
  WHERE nx IS NOT NULL
),
{side}cum AS MATERIALIZED (
  SELECT trip_id, si, x1, y1, dx, dy, sl,
         COALESCE(SUM(sl) OVER (PARTITION BY trip_id ORDER BY si
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0.0) AS cum
  FROM {side}segs
)"""


def segmentize_grid_sql(n_stops: int = N_LAYERS) -> str:
    """W4 on the REAL aligned world: the ordered projectOnAfter scan
    (PolyLine.h:98-119) unrolled over the stop sequence.

    Replays evalmetrics._cut_positions exactly: per stop, argmin over
    segments si >= previous best segment (zero-length skipped) of the
    clamped-projection distance, first-min (min si) tie-break; the cut
    position is ``cum[si] + t*sl`` clamped monotone by a running max;
    start_seg advances to the UNCLAMPED argmin segment. Stops whose
    suffix holds no nonzero segment keep the previous position
    (best_pos = 0.0 -> max() = last_pos), the LEFT-JOIN COALESCE arm."""
    parts = [_aligned_world(), _verts_and_segs("a", "valigned")]
    parts.append(f""",
stops AS MATERIALIZED (
  SELECT trip_id, seq AS k, x AS px, y AS py FROM points
),
st_seed AS MATERIALIZED (
  -- kernel guard: trips need >= 2 polyline vertices and >= 2 stops
  SELECT v.trip_id, 0 AS bseg, CAST(0.0 AS DOUBLE) AS pos
  FROM (SELECT trip_id FROM averts GROUP BY trip_id HAVING COUNT(*) >= 2) v
  JOIN (SELECT trip_id FROM stops GROUP BY trip_id HAVING COUNT(*) >= 2) s
    ON s.trip_id = v.trip_id
)""")
    for k in range(n_stops):
        prev = "st_seed" if k == 0 else f"st{k - 1}"
        parts.append(f""",
u{k} AS MATERIALIZED (
  SELECT q.trip_id, q.si, q.cum + q.t_cl * q.sl AS bpos,
         SQRT((q.px - (q.x1 + q.t_cl * q.dx)) * (q.px - (q.x1 + q.t_cl * q.dx))
            + (q.py - (q.y1 + q.t_cl * q.dy)) * (q.py - (q.y1 + q.t_cl * q.dy))) AS d
  FROM (
    SELECT p.trip_id, a.si, a.cum, a.sl, a.x1, a.y1, a.dx, a.dy, s.px, s.py,
           LEAST(1.0, GREATEST(0.0,
             ((s.px - a.x1) * a.dx + (s.py - a.y1) * a.dy) / (a.sl * a.sl))) AS t_cl
    FROM {prev} p
    JOIN stops s ON s.trip_id = p.trip_id AND s.k = {k}
    JOIN acum a ON a.trip_id = p.trip_id AND a.si >= p.bseg AND a.sl <> 0
  ) q
),
w{k} AS MATERIALIZED (
  SELECT trip_id, si, bpos FROM u{k}
  QUALIFY ROW_NUMBER() OVER (PARTITION BY trip_id ORDER BY d ASC, si ASC) = 1
),
st{k} AS MATERIALIZED (
  SELECT p.trip_id, {k} AS k,
         COALESCE(w.si, p.bseg) AS bseg,
         COALESCE(GREATEST(w.bpos, p.pos), p.pos) AS pos
  FROM {prev} p
  JOIN (SELECT DISTINCT trip_id FROM stops WHERE k = {k}) ex
    ON ex.trip_id = p.trip_id
  LEFT JOIN w{k} w ON w.trip_id = p.trip_id
)""")
    union = "\n  UNION ALL\n".join(
        f"  SELECT trip_id, k, pos FROM st{k}" for k in range(n_stops)
    )
    parts.append(f""",
allst AS (
{union}
)
SELECT trip_id, CAST(k AS BIGINT) AS stop_seq,
       pos AS start_pos, npos AS end_pos,
       GREATEST(0.0, npos - pos) AS seg_len
FROM (
  SELECT trip_id, k, pos,
         LEAD(pos) OVER (PARTITION BY trip_id ORDER BY k) AS npos
  FROM allst)
WHERE npos IS NOT NULL
""")
    return "".join(parts)


def _tots_ctes() -> str:
    """Per-trip pre-densify stats for both sides: original vertex
    counts, left-to-right polyline totals (<= 7 window-sum terms:
    sequential in both engines), and the longest segment (bounds the
    densify step chain). ``segv`` applies the kernel guard (>= 2
    vertices both sides) and computes the shared densify steps —
    ``max(max(base, totA/256), max(base, totB/256))`` is the same
    selection as the 3-arg GREATEST."""
    side = lambda s: f"""(
    SELECT trip_id, MAX(c) AS total, MAX(sl) AS mx
    FROM (SELECT trip_id, sl,
                 SUM(sl) OVER (PARTITION BY trip_id ORDER BY si
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
          FROM {s}segs)
    GROUP BY trip_id
  )"""
    return f""",
tots AS MATERIALIZED (
  SELECT av.trip_id, av.n AS na_orig, bv.n AS nb_orig,
         COALESCE(aseg.total, 0.0) AS atot, COALESCE(bseg.total, 0.0) AS btot,
         GREATEST(COALESCE(aseg.mx, 0.0), COALESCE(bseg.mx, 0.0)) AS maxsl
  FROM (SELECT trip_id, COUNT(*) AS n FROM averts GROUP BY trip_id) av
  JOIN (SELECT trip_id, COUNT(*) AS n FROM bverts GROUP BY trip_id) bv USING (trip_id)
  LEFT JOIN {side('a')} aseg USING (trip_id)
  LEFT JOIN {side('b')} bseg USING (trip_id)
),
segv AS MATERIALIZED (
  SELECT trip_id,
         GREATEST(50.0, atot / {_MAX_PTS}.0, btot / {_MAX_PTS}.0) AS seg_df,
         GREATEST(25.0, atot / {_MAX_PTS}.0, btot / {_MAX_PTS}.0) AS seg_ac,
         maxsl
  FROM tots
  WHERE na_orig >= 2 AND nb_orig >= 2
)"""


def _densify_ctes(var: str) -> str:
    """Densify both sides with the variant's step (geo.densify's exact
    tree): the step chain is the kernel's sequential ``curd += seg``
    (recursive accumulator — k*seg would round differently), inserted
    points are ``x1 + ((dx / sl) * curd)`` emitted while
    ``curd < sl`` strict, original vertices pass through verbatim and
    sort AFTER their segment's inserts (sort key (si+1, 0, k) vs
    (vi, 1, 0))."""
    out = [f""",
ch_{var} AS MATERIALIZED (
  WITH RECURSIVE c(trip_id, k, curd) AS (
    SELECT s.trip_id, CAST(1 AS BIGINT) AS k, s.seg_{var} AS curd
    FROM segv s WHERE s.seg_{var} < s.maxsl
    UNION ALL
    SELECT c.trip_id, c.k + 1, c.curd + s.seg_{var}
    FROM c JOIN segv s ON s.trip_id = c.trip_id
    WHERE c.curd + s.seg_{var} < s.maxsl
  )
  SELECT * FROM c
)"""]
    for sd in ("a", "b"):
        out.append(f""",
d{sd}_{var} AS MATERIALIZED (
  SELECT trip_id,
         ROW_NUMBER() OVER (PARTITION BY trip_id ORDER BY a, b, k) - 1 AS pi,
         x, y
  FROM (
    SELECT v.trip_id, v.vi AS a, 1 AS b, CAST(0 AS BIGINT) AS k, v.x, v.y
    FROM {sd}verts v JOIN segv USING (trip_id)
    UNION ALL
    SELECT s.trip_id, s.si + 1 AS a, 0 AS b, c.k,
           s.x1 + ((s.dx / s.sl) * c.curd) AS x,
           s.y1 + ((s.dy / s.sl) * c.curd) AS y
    FROM {sd}segs s JOIN ch_{var} c ON c.trip_id = s.trip_id AND c.curd < s.sl
  )
)""")
    out.append(f""",
dm_{var} AS MATERIALIZED (
  SELECT a.trip_id, a.n AS p, b.n AS q
  FROM (SELECT trip_id, COUNT(*) AS n FROM da_{var} GROUP BY trip_id) a
  JOIN (SELECT trip_id, COUNT(*) AS n FROM db_{var} GROUP BY trip_id) b USING (trip_id)
)""")
    return "".join(out)


def _wavefront_cte(var: str, acc: bool) -> str:
    """The Eiter/Mannila DP as an anti-diagonal wavefront recursion:
    cells of diagonal n read fresh diagonal n-1 and the once-carried
    stale diagonal n-2; max variant is a pure selection, acc adds one
    ``LEAST(...) + d`` per cell — both evaluate the kernel's exact
    per-cell expression tree, so accumulation order is pinned.

    Shape: targets are PROPOSED by the working set (each fresh cell
    feeds its right/down neighbors, each stale cell its diagonal
    neighbor; one MIN(CASE) group per target), and d(i, j) is computed
    inline from the two densified point tables — the recursion never
    scans an O(p*q) distance matrix per iteration (an earlier draft
    did, and spent 290 s at sf0.01; this shape runs in seconds)."""
    d_expr = "SQRT((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y))"
    val = (
        f"LEAST(COALESCE(t.cval, {_INF}), COALESCE(t.bval, {_INF}), "
        f"COALESCE(t.aval, {_INF})) + {d_expr}"
        if acc
        else f"GREATEST({d_expr}, LEAST(COALESCE(t.cval, {_INF}), "
             f"COALESCE(t.bval, {_INF}), COALESCE(t.aval, {_INF})))"
    )
    return f""",
dp_{var} AS MATERIALIZED (
  WITH RECURSIVE r(trip_id, diag, i, val, fresh) AS (
    SELECT a.trip_id, 0, 0, {d_expr}, TRUE
    FROM da_{var} a JOIN db_{var} b ON b.trip_id = a.trip_id AND b.pi = 0
    WHERE a.pi = 0
    UNION ALL
    SELECT * FROM (
      SELECT t.trip_id, t.diag, t.i, {val} AS val, TRUE AS fresh
      FROM (
        SELECT trip_id, diag, i,
               MIN(CASE WHEN role = 2 THEN val END) AS bval,
               MIN(CASE WHEN role = 1 THEN val END) AS aval,
               MIN(CASE WHEN role = 0 THEN val END) AS cval
        FROM (
          SELECT trip_id, diag + 1 AS diag, i, val, 2 AS role
          FROM r WHERE fresh
          UNION ALL
          SELECT trip_id, diag + 1, i + 1, val, 1 FROM r WHERE fresh
          UNION ALL
          SELECT trip_id, diag + 2, i + 1, val, 0 FROM r WHERE NOT fresh
        )
        GROUP BY trip_id, diag, i
        HAVING MAX(CASE WHEN role >= 1 THEN 1 ELSE 0 END) = 1
      ) t
      JOIN da_{var} a ON a.trip_id = t.trip_id AND a.pi = t.i
      JOIN db_{var} b ON b.trip_id = t.trip_id AND b.pi = t.diag - t.i
      UNION ALL
      SELECT trip_id, diag, i, val, FALSE FROM r WHERE fresh
    )
  )
  SELECT trip_id, diag, i, val FROM r
  WHERE fresh AND diag IN (SELECT p + q - 2 FROM dm_{var} m
                           WHERE m.trip_id = r.trip_id)
)"""


def _evaled_ctes(include_acc: bool) -> str:
    """Chain ending in ``evaled`` — the per-trip frechet_eval rows
    (trip_id, n_pts, d_f[, acc_d_f], unmatched, len_m)."""
    parts = [
        _aligned_world(),
        _verts_and_segs("a", "valigned"),
        _verts_and_segs("b", "points"),
        _tots_ctes(),
        _densify_ctes("df"),
        _wavefront_cte("df", acc=False),
    ]
    if include_acc:
        parts.append(_densify_ctes("ac"))
        parts.append(_wavefront_cte("ac", acc=True))
    acc_col = (
        ",\n         a.val / GREATEST(ma.p, ma.q) AS acc_d_f" if include_acc else ""
    )
    acc_join = (
        """
  JOIN dm_ac ma ON ma.trip_id = t.trip_id
  JOIN dp_ac a ON a.trip_id = t.trip_id AND a.i = ma.p - 1"""
        if include_acc
        else ""
    )
    parts.append(f""",
evaled AS MATERIALIZED (
  SELECT t.trip_id,
         CAST(t.na_orig AS BIGINT) AS n_pts,
         f.val AS d_f{acc_col},
         f.val >= {UNMATCHED_DF!r} AS unmatched,
         t.atot AS len_m
  FROM tots t
  JOIN dm_df m ON m.trip_id = t.trip_id
  JOIN dp_df f ON f.trip_id = t.trip_id AND f.i = m.p - 1{acc_join}
  WHERE t.na_orig >= 2 AND t.nb_orig >= 2
)""")
    return "".join(parts)


def frechet_eval_grid_sql() -> str:
    """Oracle for the REAL-world ``frechet_eval``: per-trip d_f and
    accumulated-d_f between the bit-oracled viterbi-aligned node path
    and the observation truth path, with geo.frechet_dist's exact
    densify + DP semantics."""
    return _evaled_ctes(include_acc=True) + """
SELECT trip_id, n_pts, d_f, acc_d_f, unmatched, len_m FROM evaled
"""


def df_histogram_grid_sql() -> str:
    """Oracle for the REAL-world ``df_histogram``: the DF_BINS
    first-match binning over the per-trip d_f rows (only the max
    variant feeds it)."""
    return _evaled_ctes(include_acc=False) + "\n" + df_histogram_sql("evaled")


def eval_summary_grid_sql() -> str:
    """Oracle for the REAL-world ``eval_summary``: the print_stats row
    over the per-trip rows, accumulated left-to-right by trip_id with
    a recursive accumulator (64 rows exceed DuckDB's sequential
    window-sum leaf), mirroring the engine's running-frame rewrite."""
    inner = eval_summary_seq_sql("evaled").strip()
    assert inner.startswith("WITH RECURSIVE")
    # splice into the outer chain: wrap the recursive accumulator in a
    # nested-WITH CTE (the vback pattern) referencing the outer evaled
    return _evaled_ctes(include_acc=False) + f""",
summary AS MATERIALIZED (
  {inner}
)
SELECT * FROM summary
"""


def _chord_dist(p: str, lo: str, hi: str) -> str:
    """geo._dp_dist_to_chord as a SQL expression: clamped projection of
    point alias ``p`` onto the chord between point aliases ``lo`` and
    ``hi`` (columns px/py), final distance in SQRT(dx*dx+dy*dy) form —
    the kernel's exact tree (len2 stays UNrooted, unlike the
    _cut_positions scan which divides by sl*sl)."""
    dx, dy = f"({hi}.px - {lo}.px)", f"({hi}.py - {lo}.py)"
    len2 = f"({dx} * {dx} + {dy} * {dy})"
    t = (
        f"LEAST(1.0, GREATEST(0.0, "
        f"(({p}.px - {lo}.px) * {dx} + ({p}.py - {lo}.py) * {dy}) / {len2}))"
    )
    rx = f"({p}.px - ({lo}.px + {t} * {dx}))"
    ry = f"({p}.py - ({lo}.py + {t} * {dy}))"
    return f"SQRT({rx} * {rx} + {ry} * {ry})"


def simplify_geoms_sql(eps: float = 0.5, step: float = 256.0) -> str:
    """Oracle for the REAL ``simplify_geoms``: Douglas-Peucker
    (Geo.h:1041-1075, graph_passes.SIMPLIFY_EPS) on the zigzag edge
    geometries, as an interval-splitting recursion.

    The zigzag world (graph_passes.zigzag_geoms) is replayed with the
    Spark expression tree verbatim — ti = i/n_seg, the (edge_id+i)%5
    offset pattern, ``x1 + ti*dx - oi*dy/ln`` with left-associative
    * / before + - — so every vertex double is bit-identical. The DP
    recursion splits each interval at its first-argmax interior vertex
    while that deviation exceeds eps (kernel: np.argmax first max +
    strict ``> eps``); the kept set is the distinct interval endpoints
    — order-independent, exactly the stack algorithm's keeps."""
    import math

    n_seg_max = max(int(C.GRID_SPACING / step), 1)
    offs = ",".join(f"({i})" for i in range(n_seg_max + 1))
    d_p = _chord_dist("p", "a", "b")
    d_p2 = _chord_dist("p2", "a", "b")
    return (
        with_ctes("edges")
        + f""",
zz AS MATERIALIZED (
  SELECT e.edge_id,
         GREATEST(CAST(TRUNC(e.length / {step!r}) AS INTEGER), 1) AS n_seg,
         e.x1, e.y1, e.x2 - e.x1 AS dx, e.y2 - e.y1 AS dy,
         SQRT((e.x2 - e.x1) * (e.x2 - e.x1)
            + (e.y2 - e.y1) * (e.y2 - e.y1)) AS ln
  FROM edges e
),
pts AS MATERIALIZED (
  -- zigzag_geoms verbatim: x1 + ti*dx - oi*dy/ln / y1 + ti*dy + oi*dx/ln
  SELECT z.edge_id, o.i,
         (z.x1 + (CAST(o.i AS DOUBLE) / CAST(z.n_seg AS DOUBLE)) * z.dx)
           - ((CAST((z.edge_id + o.i) % 5 - 2 AS DOUBLE) * 0.3) * z.dy) / z.ln
           AS px,
         (z.y1 + (CAST(o.i AS DOUBLE) / CAST(z.n_seg AS DOUBLE)) * z.dy)
           + ((CAST((z.edge_id + o.i) % 5 - 2 AS DOUBLE) * 0.3) * z.dx) / z.ln
           AS py
  FROM zz z JOIN (VALUES {offs}) o(i) ON o.i <= z.n_seg
),
sp AS MATERIALIZED (
  WITH RECURSIVE r(edge_id, lo, hi) AS (
    SELECT edge_id, 0, n_seg FROM zz
    UNION ALL
    SELECT s.edge_id,
           CASE WHEN v.c = 0 THEN s.lo ELSE s.m END AS lo,
           CASE WHEN v.c = 0 THEN s.m ELSE s.hi END AS hi
    FROM (
      SELECT r.edge_id, r.lo, r.hi, p.i AS m
      FROM r
      JOIN pts a ON a.edge_id = r.edge_id AND a.i = r.lo
      JOIN pts b ON b.edge_id = r.edge_id AND b.i = r.hi
      JOIN pts p ON p.edge_id = r.edge_id AND p.i > r.lo AND p.i < r.hi
      WHERE r.hi > r.lo + 1
        AND {d_p} > {eps!r}
        AND NOT EXISTS (
          SELECT 1 FROM pts p2
          WHERE p2.edge_id = r.edge_id AND p2.i > r.lo AND p2.i < r.hi
            AND ({d_p2} > {d_p}
                 OR ({d_p2} = {d_p} AND p2.i < p.i))
        )
    ) s, (VALUES (0), (1)) v(c)
  )
  SELECT * FROM r
),
kept AS (
  SELECT edge_id, lo AS v FROM sp
  UNION
  SELECT edge_id, hi FROM sp
)
SELECT z.edge_id,
       CAST(z.n_seg + 1 AS INT) AS n_in,
       CAST(k.n AS INT) AS n_out
FROM zz z
JOIN (SELECT edge_id, COUNT(DISTINCT v) AS n FROM kept GROUP BY edge_id) k
  USING (edge_id)
"""
    )
