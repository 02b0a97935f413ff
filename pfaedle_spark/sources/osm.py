"""S2/S3/S6 — OSM XML scan, filtered sink, GeoJSON sink.

Reference: 4-pass memory-frugal XML scan
(``src/libs/pfaedle/src/osm/osm_builder.cpp:116-238``). Spark holds
columnar tables, so ONE parse into ``nodes/ways/relations`` DataFrames
replaces the re-scans — the passes become joins (SURVEY §2.1 S2).

Parse strategy: file shards are the parallelism unit — the task set is
a DataFrame of shard paths, and each task STREAMS its shard through
``ET.iterparse`` (constant memory per element, mirroring the
reference's SAX-style pass, ``osm_builder.cpp:151-163``) instead of
materializing the whole file as one string. A ``max_shard_bytes``
guard rejects oversized shards with an actionable error instead of an
executor OOM: a planet-scale ingest must pre-shard the XML/PBF into
bounded pieces (same rule as every distributed XML reader). Tags
become a ``map<string,string>`` column, way node refs an
``array<long>``, relation members an array of (type, ref, role)
structs.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

NODES_SCHEMA = "node_id long, lat double, lon double, tags map<string,string>"
WAYS_SCHEMA = "way_id long, nds array<long>, tags map<string,string>"
RELS_SCHEMA = (
    "rel_id long, members array<struct<mtype:string,ref:long,role:string>>, "
    "tags map<string,string>"
)

# default shard ceiling: a 256 MiB XML shard parses in bounded memory
# and stays a sane task size at 1000 executors; planet.osm (~2 TB XML)
# must arrive pre-sharded — this guard turns the silent one-task OOM
# into an immediate, explained failure.
MAX_SHARD_BYTES = 256 << 20


def _iterparse_shard(path: str, max_shard_bytes: int):
    """Stream one XML shard: yields ('node'|'way'|'relation', row).
    Constant memory — every parsed top-level element is cleared from
    the tree before the next one is read."""
    import os

    size = os.path.getsize(path)
    if size > max_shard_bytes:
        raise ValueError(
            f"OSM shard {path} is {size} bytes (> max_shard_bytes="
            f"{max_shard_bytes}). Pre-shard the input: a planet-scale "
            "ingest splits the XML/PBF into bounded shards so each task "
            "streams one piece (reference runs memory-frugal passes for "
            "the same reason, osm_builder.cpp:151-163). Raise "
            "max_shard_bytes only with executor memory to match."
        )
    ctx = ET.iterparse(path, events=("start", "end"))
    _, root = next(ctx)  # the <osm> root element
    for ev, el in ctx:
        if ev != "end" or el.tag not in ("node", "way", "relation"):
            continue
        tags = {t.get("k"): t.get("v") for t in el.findall("tag")}
        if el.tag == "node":
            yield "node", (
                int(el.get("id")), float(el.get("lat")),
                float(el.get("lon")), tags,
            )
        elif el.tag == "way":
            nds = [int(nd.get("ref")) for nd in el.findall("nd")]
            yield "way", (int(el.get("id")), nds, tags)
        else:
            members = [
                (m.get("type"), int(m.get("ref")), m.get("role") or "")
                for m in el.findall("member")
            ]
            yield "relation", (int(el.get("id")), members, tags)
        root.clear()  # drop the finished element (and any text siblings)


_KINDS = ("node", "way", "relation")


def _mk_reader(kind: int, schema_cols: list[str], max_shard_bytes: int):
    want = _KINDS[kind]

    def reader(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for path in pdf["path"]:
                rows = [
                    r for k, r in _iterparse_shard(path, max_shard_bytes)
                    if k == want
                ]
                yield pd.DataFrame(rows, columns=schema_cols)

    return reader


def _shard_paths(path: str) -> list[str]:
    import glob as _glob
    import os

    if os.path.isdir(path):
        return sorted(
            os.path.join(path, f) for f in os.listdir(path)
            if not f.startswith(".")
        )
    hits = sorted(_glob.glob(path))
    if not hits:
        raise FileNotFoundError(f"no OSM shards match {path}")
    return hits


def read_osm(
    spark: SparkSession,
    path: str,
    max_shard_bytes: int = MAX_SHARD_BYTES,
) -> dict[str, DataFrame]:
    """One streamed scan -> three DataFrames. ``path`` may be a single
    file, a directory, or a glob of XML shards; shards are distributed
    one-per-task and each streams through iterparse (shared-filesystem
    paths, as on any cluster ingest from HDFS/S3/NFS)."""
    files = _shard_paths(path)
    par = spark.sparkContext.defaultParallelism
    paths_df = spark.createDataFrame(
        [(f,) for f in files], "path string"
    ).repartition(min(len(files), par * 2))
    return {
        "nodes": paths_df.mapInPandas(
            _mk_reader(0, ["node_id", "lat", "lon", "tags"], max_shard_bytes),
            schema=NODES_SCHEMA,
        ),
        "ways": paths_df.mapInPandas(
            _mk_reader(1, ["way_id", "nds", "tags"], max_shard_bytes),
            schema=WAYS_SCHEMA,
        ),
        "relations": paths_df.mapInPandas(
            _mk_reader(2, ["rel_id", "members", "tags"], max_shard_bytes),
            schema=RELS_SCHEMA,
        ),
    }


def keep_filter(df: DataFrame, rules: dict[str, list[str]]) -> DataFrame:
    """F2 tag keep filter: keep rows whose tag map matches any
    (key, value) rule; '*' matches any value
    (reference ``osm_filter.cpp:85-115``)."""
    conds = []
    for k, vals in rules.items():
        has = F.map_contains_key(F.col("tags"), F.lit(k))
        if "*" in vals:
            conds.append(has)
        else:
            conds.append(has & F.col("tags").getItem(k).isin(*vals))
    keep = conds[0]
    for c in conds[1:]:
        keep = keep | c
    return df.filter(keep)


def filtered_osm_sink(
    nodes: DataFrame, ways: DataFrame, rules: dict[str, list[str]], out_dir: str
) -> None:
    """S3 (-X): minimized output containing kept ways + their nodes
    (semi-join), as parquet (XML fidelity out of scope per SURVEY)."""
    kept_ways = keep_filter(ways, rules)
    need_nodes = kept_ways.select(F.explode("nds").alias("node_id")).distinct()
    kept_nodes = nodes.join(need_nodes, "node_id", "left_semi")
    kept_ways.write.mode("overwrite").parquet(f"{out_dir}/ways")
    kept_nodes.write.mode("overwrite").parquet(f"{out_dir}/nodes")


def overpass_query_xml(
    cfgs, boxes: list[tuple[float, float, float, float]]
) -> str:
    """S4 (-X variant): emit an Overpass-API ``osm-script`` query that
    fetches exactly the entities the merged MOT keep-filters match
    inside the given lat/lng boxes (reference
    ``osm_builder::overpass_query_write``, ``osm_builder.cpp:241-327``).

    Semantics mirrored from the reference:

    - keep rules of all configs MERGE per key into a (val, flags) set
      (``osm_filter::merge``, ``osm_filter.cpp:218-246``);
    - one ``<query type=t><has-kv .../><bbox-query .../></query>`` per
      (box leaf x type x rule), with ``v`` omitted for wildcard rules;
    - a rule flagged ``no_match_ways``/``no_match_nds``/
      ``no_match_rels`` emits NO query of that type (the reference's
      ``val.second & WAY/NODE/REL`` skip — NO_WAYS==WAY==8 etc.,
      ``osm_read_options.h:52-54``);
    - degenerate boxes (west > east) are dropped;
    - the trailing ``<union><item/><recurse type=down/></union>``
      closure pulls each matched way/relation's members, then
      ``<print/>``.

    ``boxes`` are (south, west, north, east) in lat/lng. Driver-side
    string emit, like the reference (a query FILE is the output — there
    is nothing to distribute).
    """
    from ..motconfig import _KIND_FLAG, NODE, RELATION, WAY

    merged: dict[str, set] = {}
    for cfg in cfgs:
        for r in cfg.filters.get("osm_filter_keep", []):
            merged.setdefault(r.key, set()).add((r.val, frozenset(r.flags)))

    def esc(s: str) -> str:
        return (
            str(s)
            .replace("&", "&amp;")
            .replace("<", "&lt;")
            .replace('"', "&quot;")
        )

    out = ['<?xml version="1.0" encoding="UTF-8"?>']
    out.append("<!-- - written by pfaedle-spark - -->")
    out.append("<osm-script>")
    out.append("    <union>")
    c = 0
    for s, w, n, e in boxes:
        if w > e:
            continue
        c += 1
        out.append(f"        <!-- Bounding box #{c} ({s}, {w}, {n}, {e}) -->")
        for t in (WAY, NODE, RELATION):
            for key in sorted(merged):
                for val, flags in sorted(merged[key]):
                    if _KIND_FLAG[t] in flags:
                        continue
                    out.append(f'        <query type="{t}">')
                    kv = f'k="{esc(key)}"' if val == "*" else f'k="{esc(key)}" v="{esc(val)}"'
                    out.append(f"            <has-kv {kv}/>")
                    out.append(
                        f'            <bbox-query s="{s}" w="{w}" n="{n}" e="{e}"/>'
                    )
                    out.append("        </query>")
    out.append("    </union>")
    out.append("    <union>")
    out.append("        <item/>")
    out.append('        <recurse type="down"/>')
    out.append("    </union>")
    out.append("    <print/>")
    out.append("</osm-script>")
    return "\n".join(out) + "\n"


def write_overpass_query(
    path: str, cfgs, boxes: list[tuple[float, float, float, float]]
) -> None:
    """S4 sink: write the Overpass query file (``pfaedle -X`` mode)."""
    with open(path, "w", encoding="utf-8") as f:
        f.write(overpass_query_xml(cfgs, boxes))


def geojson_sink(df: DataFrame, x: str = "x", y: str = "y", props: list[str] | None = None) -> str:
    """S6: small driver-side GeoJSON FeatureCollection (debug output,
    reference ``GeoGraphJsonOutput.h:31-117``)."""
    import json

    feats = []
    for r in df.collect():
        feats.append(
            {
                "type": "Feature",
                "geometry": {"type": "Point", "coordinates": [r[x], r[y]]},
                "properties": {p: r[p] for p in (props or []) if p in r.__fields__},
            }
        )
    return json.dumps({"type": "FeatureCollection", "features": feats})


def eval_csv_sink(df: DataFrame, bin_col: str, bins: list[float], out_path: str) -> None:
    """S7: histogram CSV (reference ``collector::print_csv``,
    ``eval/collector.cpp:357-387``): count per bin edge."""
    b = df.select(F.col(bin_col).alias("v"))
    edges = sorted(bins)
    bucket = F.lit(None).cast("double")
    for e in reversed(edges):
        bucket = F.when(F.col("v") <= e, F.lit(float(e))).otherwise(bucket)
    hist = (
        b.withColumn("bin", bucket)
        .groupBy("bin")
        .agg(F.count("*").alias("n"))
        .orderBy("bin")
        .toPandas()
    )
    hist.to_csv(out_path, index=False)
