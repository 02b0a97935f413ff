"""MOT config system: parser + compiled filter/normalizer evaluators
vs the DuckDB oracle (S8/F2/F5/F7/W5)."""

import pytest

from pfaedle_spark import motconfig as MC
from pfaedle_spark.operators import osmfilter
from tests.conftest import SF_DIR, assert_matches_oracle


def test_parse_sections_and_merge():
    cfgs = MC.parse_cfg()
    assert set(cfgs) >= {"rail", "bus", "tram"}
    rail = cfgs["rail"]
    # chains from the all-MOT section reach every mot
    assert len(cfgs["bus"].chains["station_normalize_chain"]) > 50
    # filters only in [rail]
    assert cfgs["bus"].filters == {}
    assert rail.filters["osm_filter_keep"][-1].flags == {"rel_flat"}
    assert rail.snap_distances() == [10.0, 100.0, 200.0]
    assert rail.routing_opts()["level_punish"][1] == 1.25
    assert rail.rel_tags["line_name"] == ["ref", "name"]
    # group-attr rules keep priority order; [k=v]-prefixed rules carry scope
    assert rail.group_attrs[0] == (None, "uic_ref", 500.0)
    assert rail.group_attrs[2] == ("public_transport=stop_area", "uic_ref", 500.0)
    assert rail.group_attrs[-1] == (None, "name", 100.0)


def test_chain_rule_parsing():
    rail = MC.load("rail")
    chain = rail.chains["station_normalize_chain"]
    # quoted rules keep their spaces; backslash-group replacements survive
    assert (r"(^| )hbf\.($| )", r"\1hauptbahnhof\2") in chain
    assert ("^hauptbahnhof (.+)$", r"\1 hauptbahnhof") in chain


def test_filter_flags_oracle(spark):
    assert_matches_oracle(
        osmfilter.filter_flags(spark, SF_DIR), osmfilter.filter_flags_sql()
    )


def test_way_levels_oracle(spark):
    assert_matches_oracle(
        osmfilter.way_levels(spark, SF_DIR), osmfilter.way_levels_sql()
    )


def test_normalize_chains_oracle(spark):
    assert_matches_oracle(
        osmfilter.normalize_chains(spark, SF_DIR), osmfilter.normalize_chains_sql()
    )


def test_line_first_match_oracle(spark):
    assert_matches_oracle(
        osmfilter.line_first_match(spark, SF_DIR), osmfilter.line_first_match_sql()
    )


def test_normalizer_semantics(spark):
    """Spot-check chain behavior end-to-end on known inputs."""
    import pandas as pd
    from pyspark.sql import functions as F

    cfg = MC.load("rail")
    chain = cfg.chains["station_normalize_chain"]
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "s": [
                    "Hbf. Nord",
                    "Hauptbahnhof Freiburg",
                    "Müller-Straße 5",
                    "Foo (Gleis 12)",
                    "Sankt Georgen und Süd",
                ]
            }
        )
    )
    out = [r[0] for r in df.select(MC.norm_col(chain, F.col("s"))).collect()]
    # hbf. expands BEFORE the leading-identifier reorder, so it reorders too
    assert out[0] == "nord hauptbahnhof"
    assert out[1] == "freiburg hauptbahnhof"
    # umlaut fold + '-'->' ' + standalone strasse -> street
    assert out[2] == "mueller street 5"
    assert out[3] == "foo"  # track info deleted
    # und->'+', umlaut fold, sankt->'st. '
    assert out[4] == "st. georgen + sued"


def test_group_attr_rules_oracle(spark):
    """cfg osm_station_group_attrs first-match chain over platform sets."""
    from pfaedle_spark import datagen
    from pfaedle_spark.operators import stations

    df = stations.group_attr_rules(datagen.station_nodes(spark))
    pdf = df.toPandas()
    # all three unshadowed rules fire somewhere; scoped rule 2 is
    # first-match-shadowed by rule 0 (same attr, earlier)
    assert set(pdf["rule_idx"].unique()) == {0, 1, 3}
    assert_matches_oracle(df, stations.group_attr_rules_sql())


def test_oneway_exception_list(spark):
    """undirected beats both oneway directions (osm_filter.cpp:58-69)."""
    import pandas as pd
    from pyspark.sql import functions as F

    cfg = MC.load("rail")
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "oneway": ["yes", "no", None, "yes"],
                "prefdir": [None, "backward", "backward", None],
                "bidir": [None, None, None, "regular"],
            }
        )
    )
    tags = F.map_filter(
        F.map_from_arrays(
            F.array(
                F.lit("oneway"),
                F.lit("railway:preferred_direction"),
                F.lit("railway:bidirectional"),
            ),
            F.array(F.col("oneway"), F.col("prefdir"), F.col("bidir")),
        ),
        lambda k, v: v.isNotNull(),
    )
    out = [r[0] for r in df.select(MC.oneway_class_col(cfg, tags)).collect()]
    assert out == [1, 0, -1, 0]
