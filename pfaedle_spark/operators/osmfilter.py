"""S8/F2/F5/F7/W5 driver queries — config-driven OSM tag filtering over
a map-typed tags column, plus the cfg normalizer chains.

Reference: ``osm/osm_filter.cpp`` (rule matching, oneway exception
list, first-match level), ``config/mot_config_reader.cpp`` (dialect),
``pfaedle.cfg`` (shipped rules), ``trgraph/normalizer.cpp`` (chains).

Synthetic input: ``way_tags`` derives a deterministic tag set per
``documents`` row via pure integer arithmetic, so the DuckDB oracle
reproduces every value bit-identically. The Spark side folds the
scalars into a real ``map<string,string>`` column and evaluates the
compiled rules through ``element_at`` lookups — proving the map-typed
input path the OSM scan produces (``sources/osm.py``) — while the
oracle evaluates the same rules over the scalar twin columns.

Scale: everything here is a narrow projection with zero shuffles; the
rule sets are compiled into whole-stage-codegen boolean expressions
(no rule-table join, no UDF).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import motconfig as MC

# (map key, output column, Spark/SQL value expression)  — the expression
# must be valid in BOTH engines (pure CASE/concat/substring arithmetic).
_TAG_EXPRS: list[tuple[str, str, str]] = [
    (
        "railway",
        "t_railway",
        "CASE doc_id % 11 WHEN 0 THEN 'rail' WHEN 1 THEN 'tram' "
        "WHEN 2 THEN 'light_rail' WHEN 3 THEN 'abandoned' "
        "WHEN 4 THEN 'station' WHEN 5 THEN 'halt' WHEN 6 THEN 'platform' "
        "WHEN 7 THEN 'narrow_gauge' WHEN 8 THEN 'railway_crossing' "
        "ELSE NULL END",
    ),
    (
        "service",
        "t_service",
        "CASE doc_id % 7 WHEN 0 THEN 'siding' WHEN 1 THEN 'yard' "
        "WHEN 2 THEN 'spur' WHEN 3 THEN 'crossover' ELSE NULL END",
    ),
    (
        "usage",
        "t_usage",
        "CASE doc_id % 13 WHEN 0 THEN 'branch' WHEN 1 THEN 'industrial' "
        "WHEN 2 THEN 'military' ELSE NULL END",
    ),
    (
        "oneway",
        "t_oneway",
        "CASE doc_id % 5 WHEN 0 THEN 'yes' WHEN 1 THEN 'no' "
        "WHEN 2 THEN '-1' ELSE NULL END",
    ),
    (
        "railway:preferred_direction",
        "t_prefdir",
        "CASE doc_id % 6 WHEN 0 THEN 'forward' WHEN 1 THEN 'backward' "
        "WHEN 2 THEN 'both' ELSE NULL END",
    ),
    ("area", "t_area", "CASE WHEN doc_id % 17 = 0 THEN 'yes' ELSE NULL END"),
    (
        "building",
        "t_building",
        "CASE WHEN doc_id % 19 = 0 THEN 'roof' ELSE NULL END",
    ),
    (
        "public_transport",
        "t_pt",
        "CASE doc_id % 23 WHEN 0 THEN 'stop_position' WHEN 1 THEN 'platform' "
        "WHEN 2 THEN 'stop_area' ELSE NULL END",
    ),
    (
        "route",
        "t_route",
        "CASE doc_id % 29 WHEN 0 THEN 'train' WHEN 1 THEN 'rail' "
        "ELSE NULL END",
    ),
    (
        "stop",
        "t_stop",
        "CASE WHEN doc_id % 31 = 0 THEN 'yes' ELSE NULL END",
    ),
    (
        "ref",
        "t_ref",
        "CASE WHEN doc_id % 4 = 0 THEN concat('T ', CAST(doc_id % 37 AS STRING)) "
        "ELSE NULL END",
    ),
    (
        "name",
        "t_name",
        "CASE doc_id % 8 "
        "WHEN 0 THEN concat('Hbf. ', substring(text, 1, 12)) "
        "WHEN 1 THEN concat(substring(text, 1, 12), ' Strasse') "
        "WHEN 2 THEN concat('Gare ', substring(text, 1, 12)) "
        "WHEN 3 THEN concat(substring(text, 1, 12), ' (Gleis 3)') "
        "WHEN 4 THEN concat('Sankt ', substring(text, 1, 10), ' und Süd') "
        "WHEN 5 THEN concat(substring(text, 1, 12), '-Ost/Bf') "
        "WHEN 6 THEN concat('Bahnhof ', substring(text, 1, 12)) "
        "ELSE concat(substring(text, 1, 12), ' Str.') END",
    ),
    (
        "from",
        "t_from",
        "CASE WHEN doc_id % 3 = 0 THEN concat('Zob ', substring(text, 3, 9)) "
        "ELSE NULL END",
    ),
    (
        "to",
        "t_to",
        "concat(substring(text, 5, 9), ' Bhf.')",
    ),
    (
        "local_ref",
        "t_local_ref",
        "CASE WHEN doc_id % 9 = 0 THEN concat('Gleis ', CAST(doc_id % 12 AS STRING)) "
        "ELSE NULL END",
    ),
]

# DuckDB uses VARCHAR casts; Spark accepts STRING — CAST(x AS STRING)
# parses in Spark too (alias), so one expression string serves both.


def way_tags(docs: DataFrame) -> DataFrame:
    """Synthetic per-way tag map derived from `documents` — scalar twin
    columns plus the folded map<string,string>."""
    cols = [F.col("doc_id").alias("way_id")]
    entries = []
    for key, out_name, expr in _TAG_EXPRS:
        c = F.expr(expr)
        cols.append(c.alias(out_name))
        entries.append(
            F.struct(F.lit(key).alias("key"), c.alias("value"))
        )
    tags = F.map_from_entries(
        F.filter(F.array(*entries), lambda e: e.getField("value").isNotNull())
    )
    return docs.select(*cols, tags.alias("tags"))


def way_tags_cte(docs_rel: str = "documents") -> str:
    parts = ["doc_id AS way_id"]
    for _, out_name, expr in _TAG_EXPRS:
        parts.append(f"{expr} AS {out_name}")
    return f"way_tags AS (SELECT {', '.join(parts)} FROM {docs_rel})"


def _tag_expr(key: str) -> str:
    for k, out_name, _ in _TAG_EXPRS:
        if k == key:
            return out_name
    return "NULL"


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

def filter_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per way: keep/drop/kept booleans, oneway class, nohup, station —
    the full osm_filter surface evaluated through the tags map."""
    from .. import datagen

    cfg = MC.load("rail")
    wt = way_tags(datagen.documents(spark, sf_dir))
    tags = F.col("tags")
    keep = MC.match_col(cfg.filters["osm_filter_keep"], tags, MC.WAY)
    drop = MC.match_col(cfg.filters["osm_filter_drop"], tags, MC.WAY)
    return wt.select(
        "way_id",
        keep.alias("keep_flag"),
        drop.alias("drop_flag"),
        (keep & ~drop).alias("kept"),
        MC.oneway_class_col(cfg, tags).alias("oneway_cls"),
        MC.match_col(cfg.filters["osm_filter_nohup"], tags, MC.NODE).alias("nohup"),
        MC.match_col(cfg.filters["osm_filter_station"], tags, MC.NODE).alias(
            "station_flag"
        ),
    ).orderBy("way_id")


def filter_flags_sql() -> str:
    cfg = MC.load("rail")
    keep = MC.match_sql(cfg.filters["osm_filter_keep"], _tag_expr, MC.WAY)
    drop = MC.match_sql(cfg.filters["osm_filter_drop"], _tag_expr, MC.WAY)
    return f"""
WITH {way_tags_cte()}
SELECT way_id,
       {keep} AS keep_flag,
       {drop} AS drop_flag,
       ({keep}) AND NOT ({drop}) AS kept,
       {MC.oneway_class_sql(cfg, _tag_expr)} AS oneway_cls,
       {MC.match_sql(cfg.filters["osm_filter_nohup"], _tag_expr, MC.NODE)} AS nohup,
       {MC.match_sql(cfg.filters["osm_filter_station"], _tag_expr, MC.NODE)} AS station_flag
FROM way_tags ORDER BY way_id
"""


def way_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7 first-match road level + the routing punish factor it maps to
    (cfg routing_lvl{i}_fac)."""
    from .. import datagen

    cfg = MC.load("rail")
    wt = way_tags(datagen.documents(spark, sf_dir))
    lvl = MC.level_col(cfg, F.col("tags"))
    punish = F.element_at(
        F.array(*[F.lit(p) for p in cfg.routing_opts()["level_punish"]]),
        lvl + 1,
    )
    return wt.select(
        "way_id", lvl.alias("level"), punish.cast("double").alias("punish_fac")
    ).orderBy("way_id")


def way_levels_sql() -> str:
    cfg = MC.load("rail")
    lvl = MC.level_sql(cfg, _tag_expr)
    pl = cfg.routing_opts()["level_punish"]
    arr = ", ".join(str(p) for p in pl)
    return f"""
WITH {way_tags_cte()}
SELECT way_id,
       {lvl} AS level,
       CAST(([{arr}])[({lvl}) + 1] AS DOUBLE) AS punish_fac
FROM way_tags ORDER BY way_id
"""


def normalize_chains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The three cfg normalizer chains applied to the synthetic messy
    names (station chain on `name`, line chain on `ref`, track chain on
    `local_ref`)."""
    from .. import datagen

    cfg = MC.load("rail")
    wt = way_tags(datagen.documents(spark, sf_dir))
    return wt.select(
        "way_id",
        MC.norm_col(cfg.chains["station_normalize_chain"], F.col("t_name")).alias(
            "station_norm"
        ),
        MC.norm_col(cfg.chains["line_normalize_chain"], F.col("t_ref")).alias(
            "line_norm"
        ),
        MC.norm_col(cfg.chains["track_normalize_chain"], F.col("t_local_ref")).alias(
            "track_norm"
        ),
    ).orderBy("way_id")


def normalize_chains_sql() -> str:
    cfg = MC.load("rail")
    return f"""
WITH {way_tags_cte()}
SELECT way_id,
       {MC.norm_sql(cfg.chains["station_normalize_chain"], "t_name")} AS station_norm,
       {MC.norm_sql(cfg.chains["line_normalize_chain"], "t_ref")} AS line_norm,
       {MC.norm_sql(cfg.chains["track_normalize_chain"], "t_local_ref")} AS track_norm
FROM way_tags ORDER BY way_id
"""


def edge_tracks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G10 — ``osm_builder::write_edge_tracks`` (osm_builder.cpp:185 +
    1631-1646): the way's track tag (osm_edge_track_number_tags,
    normalized through the track chain) propagates to the way's edge's
    endpoint STATION nodes; each node keeps one track. The reference
    writes first-wins over unordered-map iteration (unspecified order);
    here the node deterministically keeps the min-way_id incident tagged
    edge's track — order-independent, so it is cluster-safe.

    Output: (node_id, track, way_id). Scale: tagged ways join edges on
    the id (hash equi-join), endpoints explode 2x, station filter is a
    broadcast semi-join, argmin is one window — one shuffle total.
    """
    from pyspark.sql import Window

    from .. import datagen

    cfg = MC.load("rail")
    wt = way_tags(datagen.documents(spark, sf_dir))
    tagged = wt.filter(F.col("t_local_ref").isNotNull()).select(
        "way_id",
        MC.norm_col(cfg.chains["track_normalize_chain"], F.col("t_local_ref")).alias(
            "track"
        ),
    ).filter(F.length("track") > 0)
    eds = datagen.edges(spark).select("edge_id", "src", "dst")
    je = tagged.join(eds, tagged.way_id == eds.edge_id).select(
        "way_id", "track", "src", "dst"
    )
    ends = je.select(
        "way_id", "track", F.explode(F.array("src", "dst")).alias("node_id")
    )
    st = datagen.nodes(spark).filter("is_station").select("node_id")
    w = Window.partitionBy("node_id").orderBy("way_id")
    return (
        ends.join(st, "node_id")
        .withColumn("rk", F.row_number().over(w))
        .filter("rk = 1")
        .select("node_id", "track", "way_id")
    )


def edge_tracks_sql() -> str:
    from .. import sqlgen

    cfg = MC.load("rail")
    norm = MC.norm_sql(cfg.chains["track_normalize_chain"], "t_local_ref")
    return f"""{sqlgen.with_ctes("nodes", "edges")},
{way_tags_cte()},
tagged AS (
  SELECT way_id, {norm} AS track FROM way_tags
  WHERE t_local_ref IS NOT NULL
),
je AS (
  SELECT t.way_id, t.track, e.src, e.dst
  FROM tagged t JOIN edges e ON e.edge_id = t.way_id
  WHERE LENGTH(t.track) > 0
)
SELECT node_id, track, way_id FROM (
  SELECT x.node_id, x.track, x.way_id,
         ROW_NUMBER() OVER (PARTITION BY x.node_id ORDER BY x.way_id) AS rk
  FROM (SELECT way_id, track, src AS node_id FROM je
        UNION ALL SELECT way_id, track, dst FROM je) x
  JOIN (SELECT node_id FROM nodes WHERE is_station) s USING (node_id)
) WHERE rk = 1
"""


def line_first_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W5 — osm_line_relation_tags: first non-empty normalized value per
    priority list (line via line chain, from/to via station chain), plus
    the first-match track tag (osm_edge_track_number_tags).

    Scale design — normalize DISTINCT values, not rows: tag values
    repeat massively in OSM, and inlining attrs x chain-rules
    regexp_replaces per output column into one projection blows janino's
    64 KB method limit (whole-stage falls back to interpreted eval).
    Here candidates explode long-form, each chain runs once over the
    tiny distinct value set, and a broadcast join + min-priority agg
    recovers the per-way first match — regex work is O(distinct values)
    instead of O(rows x attrs)."""
    from .. import datagen

    cfg = MC.load("rail")
    wt = way_tags(datagen.documents(spark, sf_dir))
    chains = {
        "line": cfg.chains["line_normalize_chain"],
        "station": cfg.chains["station_normalize_chain"],
        "track": cfg.chains["track_normalize_chain"],
    }
    outputs = [
        ("line_name", "line", cfg.rel_tags["line_name"]),
        ("from_name", "station", cfg.rel_tags["from_name"]),
        ("to_name", "station", cfg.rel_tags["to_name"]),
        ("track", "track", cfg.attr_lists["osm_edge_track_number_tags"]),
    ]
    # reference the scalar twin columns (same source exprs as the tags
    # map, and exactly what the oracle's _tag_expr reads) — going through
    # element_at(tags, k) would inline the whole map construction into
    # every candidate after project collapse
    def _raw(key: str):
        col = _tag_expr(key)
        return F.col(col) if col != "NULL" else F.lit(None).cast("string")

    cand = F.array(
        *[
            F.struct(
                F.lit(out).alias("out"),
                F.lit(ci).alias("chain"),
                F.lit(prio).alias("prio"),
                _raw(a).alias("raw"),
            )
            for out, ci, attrs in outputs
            for prio, a in enumerate(attrs)
        ]
    )
    long = (
        wt.select("way_id", F.explode(cand).alias("c"))
        .select("way_id", "c.*")
        .filter(F.col("raw").isNotNull())
    )
    norms = None
    for ci, chain in chains.items():
        vals = long.filter(F.col("chain") == ci).select("raw").distinct()
        nd = vals.select(
            F.lit(ci).alias("chain"),
            "raw",
            F.nullif(MC.norm_col(chain, F.col("raw")), F.lit("")).alias("norm"),
        )
        norms = nd if norms is None else norms.unionByName(nd)
    # inner equi-join; the null guard lives INSIDE the agg's when() — a
    # top-level filter(norm IS NOT NULL) makes Catalyst infer the
    # constraint through the join and duplicate the full regex chain
    # into a Filter on the norms branch (a 192-matcher method janino
    # refuses to compile)
    best = (
        long.join(F.broadcast(norms), ["chain", "raw"])
        .groupBy("way_id")
        .agg(
            *[
                F.min(
                    F.when(
                        (F.col("out") == out) & F.col("norm").isNotNull(),
                        F.struct("prio", "norm"),
                    )
                )
                .getField("norm")
                .alias(out)
                for out, _, _ in outputs
            ]
        )
    )
    return (
        wt.select("way_id")
        .join(best, "way_id", "left")
        .select("way_id", "line_name", "from_name", "to_name", "track")
        .orderBy("way_id")
    )


def line_first_match_sql() -> str:
    cfg = MC.load("rail")
    line_c = cfg.chains["line_normalize_chain"]
    stat_c = cfg.chains["station_normalize_chain"]
    track_c = cfg.chains["track_normalize_chain"]
    return f"""
WITH {way_tags_cte()}
SELECT way_id,
       {MC.first_match_sql(cfg.rel_tags["line_name"], line_c, _tag_expr)} AS line_name,
       {MC.first_match_sql(cfg.rel_tags["from_name"], stat_c, _tag_expr)} AS from_name,
       {MC.first_match_sql(cfg.rel_tags["to_name"], stat_c, _tag_expr)} AS to_name,
       {MC.first_match_sql(cfg.attr_lists["osm_edge_track_number_tags"], track_c, _tag_expr)} AS track
FROM way_tags ORDER BY way_id
"""
