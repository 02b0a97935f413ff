"""R1-R10 — the routing/alignment query engine.

Reference:
* R1/R2 Dijkstra / edge-Dijkstra — ``util/graph/Dijkstra.h:118-304``,
  ``util/graph/EDijkstra.h:190-418`` (PQ ordered by (h, d), tie-broken
  deterministically).
* R3 cost function — per-meter level punish
  (``router/router.cpp:53-117``; defaults ``pfaedle.cfg:377-419``).
* R6 N×M hop matrix + component-infinity shortcut (``router.cpp:580-624``,
  ``:598-599``).
* R7 layered Viterbi global solve (``router.cpp:408-549``) — source →
  candidate layers → sink; optimum == HMM/Viterbi on candidate states.
* R10 path → geometry assembly (``shape_builder.cpp:80-119``).

Spark strategy: the per-trip DP is `applyInPandas` over trip groups —
the same axis the reference parallelizes with OpenMP
(``shape_builder.cpp:234``). The road graph ships to executors as a
broadcast of flat numpy arrays (CSR adjacency): one city-scale
component is a few MB, far under broadcast limits even at 10^12
observation rows, because graph size scales with geography, not with
the image table. For continent-scale graphs the plan is a per-component
subgraph equi-join instead; candidates carry their component label so
that join prunes precisely.
"""

from __future__ import annotations

import heapq

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import constants as C


def dp_partitions(spark) -> int:
    """Bucket count for the grouped-DP stages: the session's FIXED
    shuffle-partition setting (floored at 2x the core count for wide
    hosts). Deriving it from defaultParallelism alone made the bucket
    count scale with cores, so a bigger executor count paid
    proportionally MORE per-group Arrow constants for the same data —
    measured as a scaling-efficiency leak on the 2->8 pinned lifecycle
    pair. A cores-independent count keeps per-group overhead constant
    across cluster sizes, which is also how a real job behaves
    (spark.sql.shuffle.partitions is a job setting, not a cluster
    property)."""
    fixed = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    return max(fixed, spark.sparkContext.defaultParallelism * 2)


def bucketed_apply(df: DataFrame, key: str, n_part: int, solve, schema: str) -> DataFrame:
    """``groupBy(key).applyInPandas(solve)`` with the per-group Arrow
    constant amortized: groups a hash BUCKET of keys per pandas call
    and loops ``solve`` over the real groups inside. One group per trip
    was the right axis when trips were few and long; the structural
    main grid has many short trips, where ~2-3 ms of per-group
    scaffolding × thousands of groups dominated the DP stages. Output
    is identical — ``solve`` still sees exactly one key's rows."""
    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.concat(
            [solve(g) for _, g in pdf.groupby(key, sort=False)], ignore_index=True
        )

    return (
        df.withColumn("_bucket", F.pmod(F.hash(key), F.lit(n_part)))
        .repartition(n_part, "_bucket")
        .groupBy("_bucket")
        .applyInPandas(run, schema=schema)
    )


# ---------------------------------------------------------------------------
# graph representation: CSR adjacency over flat numpy arrays
# ---------------------------------------------------------------------------

def build_csr(edges_pdf: pd.DataFrame, level_punish: bool = True) -> dict:
    """Directed CSR adjacency from an edge list (after write_odir_edges,
    so oneway is already honored by the reverse-copy pass).

    cost = length * LEVEL_PUNISH[level]  (R3, router.cpp:53-117)
    """
    src = edges_pdf["src"].to_numpy(np.int64)
    dst = edges_pdf["dst"].to_numpy(np.int64)
    length = edges_pdf["length"].to_numpy(np.float64)
    level = edges_pdf["level"].to_numpy(np.int64)
    cost = length * (np.array(C.LEVEL_PUNISH)[level] if level_punish else 1.0)
    n = int(max(src.max(), dst.max())) + 1 if len(src) else 0
    order = np.lexsort((dst, src))
    src, dst, cost = src[order], dst[order], cost[order]
    indptr = np.zeros(n + 1, dtype=np.int64)
    np.add.at(indptr, src + 1, 1)
    indptr = np.cumsum(indptr)
    # component labels (undirected): the reference's component-infinity
    # shortcut (router.cpp:598-599) — a cross-component target is +inf
    # WITHOUT exploring the whole component first.
    comp = np.arange(n, dtype=np.int64)

    def find(i: int) -> int:
        while comp[i] != i:
            comp[i] = comp[comp[i]]
            i = comp[i]
        return i

    for u, v in zip(src, dst):
        ru, rv = find(int(u)), find(int(v))
        if ru != rv:
            comp[max(ru, rv)] = min(ru, rv)
    comp = np.array([find(i) for i in range(n)], dtype=np.int64)
    csr = {"indptr": indptr, "dst": dst, "cost": cost, "n": n, "comp": comp}
    # node coordinates (for the A* heuristic, R4): recoverable from the
    # edge endpoints when the edge list carries them. Admissible because
    # cost = length * punish >= length >= straight-line distance
    # (min LEVEL_PUNISH factor is 1.0).
    if {"x1", "y1", "x2", "y2"} <= set(edges_pdf.columns):
        xy = np.full((n, 2), np.nan)
        s_all = edges_pdf["src"].to_numpy(np.int64)
        d_all = edges_pdf["dst"].to_numpy(np.int64)
        xy[s_all, 0] = edges_pdf["x1"].to_numpy(np.float64)
        xy[s_all, 1] = edges_pdf["y1"].to_numpy(np.float64)
        xy[d_all, 0] = edges_pdf["x2"].to_numpy(np.float64)
        xy[d_all, 1] = edges_pdf["y2"].to_numpy(np.float64)
        if _heuristic_admissible(csr, xy):
            csr["xy"] = xy  # else: plain Dijkstra (exact, just unpruned)
    return csr


def _heuristic_admissible(csr: dict, xy: np.ndarray) -> bool:
    """A* exactness needs cost(u->v) >= straight-line |u - v| for EVERY
    arc — true for the shipped config (all level factors >= 1, punish
    terms >= 0) but silently broken by an editable config with a factor
    < 1. Check the invariant on the data itself (one vectorized pass)
    instead of trusting config semantics; on violation the caller keeps
    the CSR heuristic-free and every search degrades to exact Dijkstra."""
    u, indptr = csr["dst"], csr["indptr"]
    src_of = np.repeat(np.arange(len(indptr) - 1), np.diff(indptr))
    d = xy[u] - xy[src_of]
    disp = np.sqrt(d[:, 0] ** 2 + d[:, 1] ** 2)
    with np.errstate(invalid="ignore"):
        bad = csr["cost"] + 1e-6 < disp  # NaN coords compare False: admissible (h=0)
    return not bool(bad.any())


# R9 route cache (reference ``router::cache``/``getCachedHops``,
# ``router.cpp:626-688`` — per-THREAD there, per-python-WORKER here).
# Pure memoization: results are identical with or without it. Keys
# carry the CSR identity so different graphs never collide; bounded
# size with whole-cache eviction (the reference clears per run).
_CSR_CACHE: dict = {}
_ROUTE_CACHE: dict = {}
_ROUTE_CACHE_MAX = 200_000

_EDGES_BC_CACHE: dict = {}


def session_token(spark) -> str:
    """A per-SparkSession key that cannot alias across sessions the way
    ``id(spark)`` can (a new session allocated at a freed session's
    address would be handed a broadcast from a *stopped* SparkContext).
    applicationId + startTime is unique per context lifetime."""
    sc = spark.sparkContext
    return f"{sc.applicationId}:{sc.startTime}"


def edges_broadcast(spark, edges_directed: DataFrame):
    """Driver-side memo: ONE toPandas + broadcast per distinct edge plan
    per session. The graph is static across queries, and a fresh collect
    per invocation is pure serial driver time — at N->4N parallelism it
    is the Amdahl term that caps scaling efficiency (the collect costs
    the same at every cluster size)."""
    key = (session_token(spark), edges_directed.semanticHash())
    if key not in _EDGES_BC_CACHE:
        if len(_EDGES_BC_CACHE) > 8:
            _EDGES_BC_CACHE.clear()
        pdf = edges_directed.select(
            "src", "dst", "length", "level", "x1", "y1", "x2", "y2"
        ).toPandas()
        _EDGES_BC_CACHE[key] = spark.sparkContext.broadcast(pdf)
    return _EDGES_BC_CACHE[key]

_CSR_TOKEN = 0  # monotonically increasing: route-cache keys carry this
                # token, NOT id(csr) — a dict freed after eviction can be
                # re-allocated at the same address, aliasing stale entries.


def csr_for_broadcast(bc, level_punish: bool = True) -> dict:
    """Build (or reuse) the CSR for a broadcast edge table — once per
    python worker, not once per group."""
    global _CSR_TOKEN
    # worker-side Broadcasts carry a stable spill path; fall back to the
    # driver-side object id (stable for the lifetime of the broadcast
    # because the Broadcast handle itself is kept alive by the closure)
    bkey = getattr(bc, "_path", None) or id(bc)
    key = (bkey, level_punish)
    if key not in _CSR_CACHE:
        if len(_CSR_CACHE) > 4:
            _CSR_CACHE.clear()
            _ROUTE_CACHE.clear()  # route entries reference evicted CSRs
        csr = build_csr(bc.value, level_punish=level_punish)
        _CSR_TOKEN += 1
        csr["token"] = _CSR_TOKEN
        _CSR_CACHE[key] = csr
    return _CSR_CACHE[key]


def cached_dijkstra(csr: dict, source: int, targets: set[int]) -> dict[int, float]:
    """Memoized multi-target Dijkstra (exact-key memo)."""
    comp = csr.get("comp")
    if comp is not None:  # component-infinity shortcut (R6)
        sc = comp[source]
        targets = {t for t in targets if comp[t] == sc}
        if not targets:
            return {}
    key = (csr.get("token", id(csr)), source, tuple(sorted(targets)))
    hit = _ROUTE_CACHE.get(key)
    if hit is None:
        if len(_ROUTE_CACHE) > _ROUTE_CACHE_MAX:
            _ROUTE_CACHE.clear()
        if "xy" in csr and targets:
            res = astar(csr, source, targets)  # R4: same distances, fewer pops
        else:
            res = dijkstra(csr, source, targets=targets)
        # store ONLY the target distances: callers read targets and
        # nothing else, and full settled-set dicts at the cache cap are
        # gigabytes per worker (measured: 16 workers swapped the box and
        # scaling efficiency fell off a cliff)
        hit = {t: res[t] for t in targets if t in res}
        _ROUTE_CACHE[key] = hit
    return hit


def dijkstra(
    csr: dict,
    source: int,
    targets: set[int] | None = None,
    max_cost: float | None = None,
) -> dict[int, float]:
    """Single-source shortest path with deterministic (d, node)
    tie-break (reference PQ order, EDijkstra.h:50-53). Early exit once
    all targets are settled; `max_cost` is the R5 hop-band cost cap —
    nodes beyond the cap stay unreached (=> +inf at the caller)."""
    indptr, dst, cost = csr["indptr"], csr["dst"], csr["cost"]
    dist: dict[int, float] = {}
    remaining = set(targets) if targets is not None else None
    pq: list[tuple[float, int]] = [(0.0, source)]
    while pq:
        d, u = heapq.heappop(pq)
        if u in dist:
            continue
        if max_cost is not None and d > max_cost:
            break  # pq is sorted: everything else is farther
        dist[u] = d
        if remaining is not None:
            remaining.discard(u)
            if not remaining:
                break
        for i in range(indptr[u], indptr[u + 1]):
            v = int(dst[i])
            if v not in dist:
                heapq.heappush(pq, (d + float(cost[i]), v))
    return dist


def astar(
    csr: dict,
    source: int,
    targets: set[int],
    max_cost: float | None = None,
) -> dict[int, float]:
    """R4 — multi-target A*: h(u) = min over targets of the straight-line
    distance (admissible + consistent, so popped == settled exactly like
    Dijkstra; reference heuristic ``router/router.h`` DistHeur /
    ``router.cpp:119-145``). Returns exact distances for every settled
    node, including all reachable targets."""
    indptr, dst, cost, xy = csr["indptr"], csr["dst"], csr["cost"], csr["xy"]
    # whole-table heuristic in one vectorized pass (isolated nodes carry
    # NaN coords -> 0, still admissible); per-push python math would
    # cost more than the pruning saves
    txy = xy[np.fromiter(targets, dtype=np.int64)]
    dx = xy[:, 0:1] - txy[None, :, 0].reshape(1, -1)
    dy = xy[:, 1:2] - txy[None, :, 1].reshape(1, -1)
    harr = np.nan_to_num(np.sqrt(dx * dx + dy * dy), nan=0.0).min(axis=1).tolist()

    dist: dict[int, float] = {}
    remaining = set(targets)
    pq: list[tuple[float, float, int]] = [(harr[source], 0.0, source)]
    while pq:
        f, g, u = heapq.heappop(pq)
        if u in dist:
            continue
        dist[u] = g
        remaining.discard(u)
        if not remaining:
            break
        for i in range(indptr[u], indptr[u + 1]):
            v = int(dst[i])
            if v not in dist:
                g2 = g + float(cost[i])
                if max_cost is not None and g2 > max_cost:
                    continue  # R5 cap: prune pushes beyond the band
                heapq.heappush(pq, (g2 + harr[v], g2, v))
    return dist


# ---------------------------------------------------------------------------
# distributed hop matrix + Viterbi
# ---------------------------------------------------------------------------

_ALIGN_SCHEMA = (
    "trip_id string, seq long, image_id string, edge_id long, cand_node long, "
    "emission double, acc_cost double"
)
_DEBUG_SCHEMA = _ALIGN_SCHEMA + ", chosen boolean"


def viterbi_align(
    candidates: DataFrame,
    edges_directed: DataFrame,
    level_punish: bool = True,
    debug: bool = False,
) -> DataFrame:
    """R7: per-trip global optimum over candidate layers.

    emission(cand)   = dist * CAND_PEN_FAC   (A5, station_group.cpp:56-93)
    transition(a, b) = Dijkstra cost cand_node(a) -> cand_node(b)
                       (R6; cross-component => +inf, router.cpp:598-599)

    Tie-break at every argmin: smaller (cost, edge_id) — deterministic
    across partitionings (SURVEY §7 risk 1).

    Output one row per (trip, seq): the chosen candidate and the
    accumulated optimal cost at that layer. With ``debug=True``, the
    ``pfaedle -T``-style surface instead: EVERY candidate state with its
    layer DP cost and a ``chosen`` flag (the chosen=true subset equals
    the default output).
    """
    spark = candidates.sparkSession
    bc = edges_broadcast(spark, edges_directed)

    def solve(pdf: pd.DataFrame) -> pd.DataFrame:
        return _viterbi_one_trip(
            pdf, csr_for_broadcast(bc, level_punish=level_punish), debug=debug
        )

    cols = ["trip_id", "seq", "image_id", "edge_id", "cand_node", "dist"]
    # explicit hash repartition by the group key: AQE's byte-based
    # coalescing would collapse this tiny-by-bytes but CPU-heavy Python
    # stage onto one task; an explicit repartition is never coalesced,
    # and HashPartitioning satisfies the grouping distribution, so no
    # second shuffle is inserted.
    n_part = dp_partitions(candidates.sparkSession)
    return bucketed_apply(
        candidates.select(*cols), "trip_id", n_part, solve,
        _DEBUG_SCHEMA if debug else _ALIGN_SCHEMA,
    )


def _viterbi_one_trip(pdf: pd.DataFrame, csr: dict, debug: bool = False) -> pd.DataFrame:
    """Forward DP + backtrack for one trip. Pure function — unit-testable
    against the brute-force oracle without Spark."""
    # flat-numpy layer prep (same shape as edge_routing._viterbi_full_one:
    # the pandas slice/iloc version cost ~2-3 ms of scaffolding per trip);
    # (seq, edge_id) is unique per candidate set, so this lexsort IS the
    # old sort_values order and argmin tie-breaks are unchanged
    seq0 = pdf["seq"].to_numpy(np.int64)
    eid0 = pdf["edge_id"].to_numpy(np.int64)
    order = np.lexsort((eid0, seq0))
    seq, eid = seq0[order], eid0[order]
    node = pdf["cand_node"].to_numpy(np.int64)[order]
    dist = pdf["dist"].to_numpy(np.float64)[order]
    tid = pdf["trip_id"].to_numpy()[order]
    iid = pdf["image_id"].to_numpy()[order]
    seqs = np.unique(seq)
    bounds = np.append(np.searchsorted(seq, seqs), len(seq))
    lay = [slice(int(bounds[i]), int(bounds[i + 1])) for i in range(len(seqs))]

    # forward pass
    dp_cost: list[np.ndarray] = []
    dp_prev: list[np.ndarray] = []
    dp_cost.append(dist[lay[0]] * C.CAND_PEN_FAC)
    dp_prev.append(np.full(bounds[1] - bounds[0], -1, dtype=np.int64))
    for li in range(1, len(seqs)):
        prev_nodes = node[lay[li - 1]]
        cur_nodes = node[lay[li]]
        # hop matrix: one Dijkstra per distinct source node (R6)
        trans = np.full((len(prev_nodes), len(cur_nodes)), np.inf)
        tgt = set(int(t) for t in np.unique(cur_nodes))
        for un in np.unique(prev_nodes):
            d = cached_dijkstra(csr, int(un), tgt)
            row = np.array([d.get(int(cn), np.inf) for cn in cur_nodes])
            trans[prev_nodes == un, :] = row
        emission = dist[lay[li]] * C.CAND_PEN_FAC
        total = dp_cost[-1][:, None] + trans + emission[None, :]
        # deterministic argmin: np.argmin returns first minimum; rows are
        # pre-sorted by edge_id so ties break toward the smaller edge_id
        best_prev = np.argmin(total, axis=0)
        dp_cost.append(total[best_prev, np.arange(total.shape[1])])
        dp_prev.append(best_prev)

    # backtrack (argmin over final layer, first-min tie-break)
    choice = np.zeros(len(seqs), dtype=np.int64)
    choice[-1] = int(np.argmin(dp_cost[-1]))
    for li in range(len(seqs) - 1, 0, -1):
        choice[li - 1] = dp_prev[li][choice[li]]

    if debug:
        # -T surface: every state of every layer with its forward-DP
        # cost; chosen marks the backtracked path (== the default output)
        chosen = np.zeros(len(seq), dtype=bool)
        chosen[bounds[:-1] + choice] = True
        return pd.DataFrame(
            {
                "trip_id": tid, "seq": seq, "image_id": iid, "edge_id": eid,
                "cand_node": node, "emission": dist * C.CAND_PEN_FAC,
                "acc_cost": np.concatenate(dp_cost), "chosen": chosen,
            }
        )

    pick = bounds[:-1] + choice
    return pd.DataFrame(
        {
            "trip_id": tid[pick], "seq": seq[pick], "image_id": iid[pick],
            "edge_id": eid[pick], "cand_node": node[pick],
            "emission": dist[pick] * C.CAND_PEN_FAC,
            "acc_cost": np.array(
                [float(dp_cost[li][int(choice[li])]) for li in range(len(seqs))]
            ),
        }
    )


def greedy2_align(
    candidates: DataFrame,
    edges_directed: DataFrame,
    level_punish: bool = True,
) -> DataFrame:
    """R8 routeGreedy2 (``router.cpp:352-398``): chain from the previous
    chosen candidate — layer 0 takes its min-emission candidate, each
    later layer takes argmin(transition from previous choice + emission).
    Cheaper than the global solve (one Dijkstra per layer), same output
    schema as viterbi_align minus acc optimality.

    ``level_punish=False`` makes edge cost = raw length, the variant the
    closed-form Manhattan SQL oracle checks (greedy2_manhattan)."""
    spark = candidates.sparkSession
    bc = edges_broadcast(spark, edges_directed)

    def solve(pdf: pd.DataFrame) -> pd.DataFrame:
        csr = csr_for_broadcast(bc, level_punish=level_punish)
        pdf = pdf.sort_values(["seq", "edge_id"], ignore_index=True)
        seqs = sorted(pdf["seq"].unique())
        layers = [pdf[pdf["seq"] == s].reset_index(drop=True) for s in seqs]
        out = []
        prev_node = None
        acc = 0.0
        for lay in layers:
            em = lay["dist"].to_numpy(np.float64) * C.CAND_PEN_FAC
            if prev_node is None:
                score = em
            else:
                nodes = lay["cand_node"].to_numpy(np.int64)
                d = cached_dijkstra(csr, int(prev_node), set(int(n) for n in np.unique(nodes)))
                score = em + np.array([d.get(int(n), np.inf) for n in nodes])
            i = int(np.argmin(score))  # rows pre-sorted by edge_id: ties
            # break toward the smaller edge_id (deterministic)
            r = lay.iloc[i]
            acc = acc + float(score[i]) if np.isfinite(score[i]) else float("inf")
            out.append(
                (r["trip_id"], int(r["seq"]), r["image_id"], int(r["edge_id"]),
                 int(r["cand_node"]), float(em[i]), float(acc))
            )
            prev_node = int(r["cand_node"])
        return pd.DataFrame(
            out,
            columns=["trip_id", "seq", "image_id", "edge_id", "cand_node", "emission", "acc_cost"],
        )

    cols = ["trip_id", "seq", "image_id", "edge_id", "cand_node", "dist"]
    n_part = dp_partitions(spark)
    return bucketed_apply(candidates.select(*cols), "trip_id", n_part, solve, _ALIGN_SCHEMA)


def hop_shortest_paths_cogrouped(
    candidates: DataFrame,
    edges_bidir: DataFrame,
    components: DataFrame,
    n_buckets: int = 8,
) -> DataFrame:
    """R6 WITHOUT any driver-side graph broadcast — the continental-scale
    fallback SCALING.md designs: hops and edges are cogrouped on the
    component label, so each task receives exactly its component's
    subgraph through the shuffle. Cross-component hops short-circuit to
    NULL before routing (the component-infinity rule, router.cpp:598-599).

    Output and semantics are identical to :func:`hop_shortest_paths`
    (the driver oracle is shared), only the physical plan differs:
    broadcast-CSR -> component-keyed subgraph join.
    """
    from pyspark.sql import Window

    comp_from = components.select(
        F.col("node_id").alias("cand_node"), F.col("label").alias("comp")
    )
    comp_to = components.select(
        F.col("node_id").alias("to_node"), F.col("label").alias("to_comp")
    )
    w = Window.partitionBy("trip_id").orderBy("seq")
    hops = (
        candidates.filter("rank = 1")
        .select("trip_id", "seq", "image_id", "cand_node")
        .withColumn("to_node", F.lead("cand_node").over(w))
        .withColumn("to_image", F.lead("image_id").over(w))
        .filter(F.col("to_node").isNotNull())
        .join(comp_from, "cand_node")
        .join(comp_to, "to_node")
    )
    cross = hops.filter(F.col("comp") != F.col("to_comp")).select(
        "trip_id", "seq", "image_id", "to_image", "cand_node", "to_node",
        F.lit(None).cast("double").alias("path_cost"),
    )
    # trip-bucket salting: one component would otherwise be ONE task;
    # replicating the (small, graph-side) edge set n_buckets x restores
    # task parallelism while hops still never leave their subgraph.
    within = hops.filter(F.col("comp") == F.col("to_comp")).withColumn(
        "bucket", F.pmod(F.hash("trip_id"), F.lit(n_buckets))
    )
    comp_src = components.select(
        F.col("node_id").alias("src"), F.col("label").alias("comp")
    )
    edges_comp = (
        edges_bidir.join(comp_src, "src")
        .select("comp", "src", "dst", "length", "level")
        .withColumn(
            "bucket", F.explode(F.sequence(F.lit(0), F.lit(n_buckets - 1)))
        )
    )

    def solve(hops_pdf: pd.DataFrame, edges_pdf: pd.DataFrame) -> pd.DataFrame:
        cols = ["trip_id", "seq", "image_id", "to_image", "cand_node", "to_node"]
        if len(hops_pdf) == 0 or len(edges_pdf) == 0:
            out = hops_pdf[cols].copy() if len(hops_pdf) else pd.DataFrame(columns=cols)
            out["path_cost"] = np.nan
            return out
        csr = build_csr(
            edges_pdf[["src", "dst", "length", "level"]], level_punish=False
        )
        us = hops_pdf["cand_node"].to_numpy(np.int64)
        vs = hops_pdf["to_node"].to_numpy(np.int64)
        costs = np.full(len(hops_pdf), np.nan)
        for u in np.unique(us):
            mask = us == u
            d = dijkstra(csr, int(u), set(int(v) for v in np.unique(vs[mask])))
            costs[mask] = [d.get(int(v), np.nan) for v in vs[mask]]
        out = hops_pdf[cols].copy()
        out["path_cost"] = costs
        return out

    schema = (
        "trip_id string, seq long, image_id string, to_image string, "
        "cand_node long, to_node long, path_cost double"
    )
    solved = (
        within.groupBy("comp", "bucket")
        .cogroup(edges_comp.groupBy("comp", "bucket"))
        .applyInPandas(solve, schema=schema)
    )
    out = solved.unionByName(cross)
    return out.withColumn(
        "path_cost",
        F.when(F.isnan("path_cost"), F.lit(None)).otherwise(F.col("path_cost")),
    )


def hop_shortest_paths(candidates: DataFrame, edges_bidir: DataFrame) -> DataFrame:
    """R6 exposed as its own operator: cost of the shortest path between
    consecutive rank-1 candidate nodes of each trip, uniform weights.

    Uniform weights on the synthetic full grid admit a closed-form
    oracle (Manhattan distance), giving a CONFIRMED correctness gate
    for the Dijkstra kernel. Cross-component hops report +inf as NULL.
    """
    from pyspark.sql import Window

    spark = candidates.sparkSession
    bc = edges_broadcast(spark, edges_bidir)

    w = Window.partitionBy("trip_id").orderBy("seq")
    hops = (
        candidates.filter("rank = 1")
        .select("trip_id", "seq", "image_id", "cand_node")
        .withColumn("to_node", F.lead("cand_node").over(w))
        .withColumn("to_image", F.lead("image_id").over(w))
        .filter(F.col("to_node").isNotNull())
    )

    def solve(pdf: pd.DataFrame) -> pd.DataFrame:
        csr = csr_for_broadcast(bc, level_punish=False)
        us = pdf["cand_node"].to_numpy(np.int64)
        vs = pdf["to_node"].to_numpy(np.int64)
        costs = np.full(len(pdf), np.nan)
        for u in np.unique(us):  # one multi-target Dijkstra per source
            mask = us == u
            d = cached_dijkstra(csr, int(u), set(int(v) for v in np.unique(vs[mask])))
            costs[mask] = [d.get(int(v), np.nan) for v in vs[mask]]
        out = pdf[["trip_id", "seq", "image_id", "to_image", "cand_node", "to_node"]].copy()
        out["path_cost"] = costs
        return out

    schema = (
        "trip_id string, seq long, image_id string, to_image string, "
        "cand_node long, to_node long, path_cost double"
    )
    n_part = dp_partitions(candidates.sparkSession)
    out = bucketed_apply(hops, "trip_id", n_part, solve, schema)
    # unreachable (cross-component) hops: surface as SQL NULL, not NaN
    return out.withColumn(
        "path_cost",
        F.when(F.isnan("path_cost"), F.lit(None)).otherwise(F.col("path_cost")),
    )
