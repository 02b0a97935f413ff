"""Shared deterministic constants.

Every derivation here must be computable identically by Spark SQL and
DuckDB SQL (the correctness oracle), so only integer arithmetic, md5,
and float64 math are used — no engine-specific hash functions.

The synthetic plane plays the role of the reference's web-mercator
meter plane (reference ``src/libs/pfaedle/include/pfaedle/definitions.h:18-26``);
the uniform grid-cell index mirrors ``util/geo/Grid.h:87-153`` with the
reference CLI default cell size of 2000 m
(``src/libs/pfaedle/src/config/config_reader.cpp:112``).
"""

# --- synthetic world -------------------------------------------------
WORLD = 65536.0          # plane is [0, WORLD) x [0, WORLD) meters
CELL = 2000.0            # grid-cell width/height (reference default 2000 m)
CELL_STRIDE = 1 << 20    # cell_id = ix * CELL_STRIDE + iy (collision-free)

# --- phash -> observation coordinates (BASELINE.json input_hint) -----
# phash is a deterministic mix of doc_id; low 16 bits -> x, next 16 -> y.
PHASH_MULT = 2654435761          # Knuth multiplicative-hash constant (public)
PHASH_MOD = 1 << 62              # keep BIGINT-safe in both engines
COORD_MASK = 65536               # x = phash % COORD_MASK, y = (phash//COORD_MASK) % COORD_MASK

# --- trips (observation sequences; GTFS stop_times analogue) ---------
# MAIN grid: corpus growth adds TRIPS, not stops — trip length is a
# property of the route, not of the fleet size, so layers per trip are
# constant at every sf and the DP oracles' layer unroll is scale-free
# (the trip count is the embarrassingly-parallel axis).
TRIP_LEN = 8                     # trip_id = doc_id // TRIP_LEN, seq = doc_id % TRIP_LEN
# Corridor + staircase worlds keep the transposed derivation (trip_id =
# doc_id % N_TRIPS): their oracles recurse per hop, so longer trips at
# bigger sf are themselves part of the scale evidence there.
N_TRIPS = 64

# --- Fréchet staircase world (A6 per-hop oracle) ----------------------
# Integer Manhattan detours keep every intermediate float EXACT (integer
# deltas, axis-aligned segment lengths, sums < 2^53), so the discrete
# Eiter/Mannila DP (Geo.h:1560-1600) selects among correctly-rounded
# sqrt values and is bit-identical between Spark/numpy and DuckDB.
# All hop segments stay < 50 m so the reference's densify grid
# (Geo.h:1533-1558, 50 m) is the identity on both engines.
FH_XSTEP = 29                    # stop k at x = k*29 + phash%7 (dx in 23..35)
FH_AMOD = 7
FH_YBASE = 53                    # trip t baseline y = t*53
FH_BMOD = 9                      # y jitter 3*((phash>>3)%9) (|dy| <= 24)
FH_BSCALE = 3
FH_HXBASE = 11                   # staircase first x-step 11..15 (< min dx 23)
FH_HXMOD = 5

# --- synthetic road graph (OSM-analogue planar grid) ------------------
GRID_N = 32                      # GRID_N x GRID_N nodes
GRID_SPACING = 2048.0            # meters between adjacent nodes
RIVER_COL = 20                   # horizontal edges crossing col 19->20 removed
                                 # => two connected components (exercises the
                                 # reference's component-infinity shortcut,
                                 # router.cpp:598-599)
N_LEVELS = 8                     # road classes 0..7 (edge_payload.h:47-139)

# --- candidate search (J5, edge_grid.cpp:21-41) ----------------------
SNAP_RADIUS = 1500.0             # max point->edge distance
TOP_K = 3                        # candidates kept per observation

# --- station snapping (J6, node_grid.cpp:22-73) ----------------------
STATION_MOD = 9                  # node is a station iff (row+col) % STATION_MOD == 0
STATION_DX = 37.0                # station offset from its node (exercises snap)
STATION_DY = -23.0
STATION_RADIUS = 600.0           # snap search radius

# --- cost model (router.cpp:53-117 defaults, simplified) -------------
LEVEL_PUNISH = [1.0, 1.0, 1.5, 2.0, 3.0, 4.0, 6.0, 8.0]
CAND_PEN_FAC = 1.0               # penalty = dist * fac (station_group.cpp:56-93)

# --- corridor world (R10 shape-assembly oracle) -----------------------
# A path graph (single corridor of COR_EDGES collinear edges) makes the
# full-cost edge-Viterbi + hop-path-capture + shape-assembly chain
# SQL-checkable: between any two directed-edge states the optimal state
# path is UNIQUE (any excursion on a line strictly adds cost), and with
# points ON the line (y = 0), positions on a 128 m lattice, spacing
# 2048 m and levels >= 3 (no synthetic lines => line-cmp coalesces to
# 1.0) every arc cost, emission, DP total and clip fraction is an exact
# integer/dyadic — float addition is exact at any order, so the
# DuckDB Bellman-Ford + recursive DP reproduces the engine bit-for-bit.
COR_EDGES = 24                   # corridor edges; nodes 0..COR_EDGES
COR_SP = 2048.0                  # corridor spacing (dyadic)
COR_XSTEP = 13                   # point k at x = ((doc_id*13) % 384) * 128
COR_XMOD = 384                   # = COR_EDGES * COR_SP / 128 lattice positions
COR_XCELL = 128.0                # position lattice (dyadic)
COR_STATION_MOD = 5              # corridor node i is a station iff i % 5 == 0
