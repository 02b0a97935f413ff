"""S2/S3/S6 — OSM XML scan, filtered sink, GeoJSON sink.

Reference: 4-pass memory-frugal XML scan
(``src/libs/pfaedle/src/osm/osm_builder.cpp:116-238``). Spark holds
columnar tables, so ONE parse into ``nodes/ways/relations`` DataFrames
replaces the re-scans — the passes become joins (SURVEY §2.1 S2).

Parse strategy: ``spark.read.text(wholetext)`` per file +
``mapInPandas`` running the stdlib XML parser per file — files are the
parallelism unit (a planet-scale ingest splits the PBF/XML into file
shards first; same plan shape). Tags become a ``map<string,string>``
column, way node refs an ``array<long>``, relation members an array of
(type, ref, role) structs.
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


def _parse(xml_text: str):
    root = ET.fromstring(xml_text)
    nodes, ways, rels = [], [], []
    for el in root:
        tags = {t.get("k"): t.get("v") for t in el.findall("tag")}
        if el.tag == "node":
            nodes.append(
                (int(el.get("id")), float(el.get("lat")), float(el.get("lon")), tags)
            )
        elif el.tag == "way":
            nds = [int(nd.get("ref")) for nd in el.findall("nd")]
            ways.append((int(el.get("id")), nds, tags))
        elif el.tag == "relation":
            members = [
                (m.get("type"), int(m.get("ref")), m.get("role") or "")
                for m in el.findall("member")
            ]
            rels.append((int(el.get("id")), members, tags))
    return nodes, ways, rels


def _mk_reader(kind: int, schema_cols: list[str]):
    def reader(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for txt in pdf["value"]:
                rows.extend(_parse(txt)[kind])
            yield pd.DataFrame(rows, columns=schema_cols)

    return reader


def read_osm(spark: SparkSession, path: str) -> dict[str, DataFrame]:
    """One scan -> three DataFrames. `path` may be a glob of XML shards."""
    raw = spark.read.text(path, wholetext=True)
    return {
        "nodes": raw.mapInPandas(
            _mk_reader(0, ["node_id", "lat", "lon", "tags"]), schema=NODES_SCHEMA
        ),
        "ways": raw.mapInPandas(
            _mk_reader(1, ["way_id", "nds", "tags"]), schema=WAYS_SCHEMA
        ),
        "relations": raw.mapInPandas(
            _mk_reader(2, ["rel_id", "members", "tags"]), schema=RELS_SCHEMA
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
