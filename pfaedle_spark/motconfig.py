"""S8/F5/F7/W5 — MOT configuration system: parser for the reference's
config dialect plus compiled, Catalyst-native rule evaluators.

Reference semantics (re-expressed, not ported):

* config dialect — ``[mot,...]`` sections, ``key:`` blocks with
  indented entries, ``pattern -> replacement;`` normalizer rules,
  ``k=v|flag`` filter rules with the flag tokens ``rel_flat``,
  ``no_match_nds|ways|rels`` and ``mult_val_match``
  (``src/libs/pfaedle/src/config/mot_config_reader.cpp:560-640``).
* filter matching — a rule set matches an entity iff ANY tag matches
  ANY rule; ``*`` matches any value; ``mult_val_match`` also matches a
  member of a ``;``-separated value list
  (``src/libs/pfaedle/src/osm/osm_filter.cpp:85-160``).
* oneway classification (F5) — the ``undirected`` set is an exception
  list that overrides both oneway directions
  (``osm_filter.cpp:58-69``).
* road level (F7) — first level ``i`` in 0..7 whose filter matches
  wins; default 0 (``osm_filter.cpp:118-137``).
* first-match attribute lists (W5) — line relation tags / station name
  attrs: first non-empty normalized value in priority order
  (``pfaedle.cfg osm_line_relation_tags``, ``osm_builder.cpp``
  relation catching).
* normalizer chains — ORDER-SENSITIVE regex replace chains applied
  case-insensitively (``trgraph/normalizer.cpp:50-96``; rules modeled
  on ``pfaedle.cfg:8-215``).

Spark-first design: rules are parsed ONCE on the driver and compiled
into pure JVM-side column expressions — chained ``regexp_replace`` for
the normalizers, boolean combinations of ``map`` lookups for the
filters. No UDFs, no joins against rule tables (rule sets are tiny and
static — a compiled expression beats a broadcast join: it inlines into
whole-stage codegen and adds zero plan nodes). Every compiler has a
DuckDB SQL twin so the driver oracle can check rule semantics
bit-identically; the twins translate Java ``$1`` group references to
RE2 ``\\1`` and add RE2's explicit global flag.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import Column
from pyspark.sql import functions as F

from . import motcfg_data

# entity kinds (mirror osm::Type usage in osm_filter::contained)
NODE, WAY, RELATION = "node", "way", "relation"
_KIND_FLAG = {NODE: "no_match_nds", WAY: "no_match_ways", RELATION: "no_match_rels"}


@dataclass
class FilterRule:
    key: str
    val: str  # '*' = any value
    flags: set[str] = field(default_factory=set)


@dataclass
class MotConfig:
    mots: tuple[str, ...] = ()
    chains: dict[str, list[tuple[str, str]]] = field(default_factory=dict)
    filters: dict[str, list[FilterRule]] = field(default_factory=dict)
    attr_lists: dict[str, list[str]] = field(default_factory=dict)
    rel_tags: dict[str, list[str]] = field(default_factory=dict)
    # (relation-scope "k=v" prefix or None, attr, max group distance m)
    group_attrs: list[tuple[str | None, str, float]] = field(default_factory=list)
    scalars: dict[str, str] = field(default_factory=dict)

    # -- derived accessors ------------------------------------------------
    def level_filters(self) -> list[list[FilterRule]]:
        return [self.filters.get(f"osm_filter_lvl{i}", []) for i in range(8)]

    def snap_distances(self) -> list[float]:
        raw = self.scalars.get("osm_max_snap_distance", "10, 100, 200")
        return [float(x) for x in raw.split(",")]

    def routing_opts(self) -> dict:
        s = self.scalars
        return {
            "level_punish": [
                float(s.get(f"routing_lvl{i}_fac", "1")) for i in range(8)
            ],
            "full_turn_punish": float(s.get("routing_full_turn_punish", "3000")),
            "full_turn_angle": float(s.get("routing_full_turn_angle", "100")),
            "pass_thru_station_punish": float(
                s.get("routing_pass_thru_station_punish", "100")
            ),
            "oneway_punish_fac": float(
                s.get("routing_one_way_meter_punish_fac", "1")
            ),
            "oneway_edge_punish": 0.0,
            "line_unmatched_punish_fac": float(
                s.get("routing_line_unmatched_punish_fac", "1")
            ),
            "no_lines_punish_fac": float(s.get("routing_no_lines_punish_fac", "0")),
        }


_CHAIN_KEYS = {
    "station_normalize_chain",
    "line_normalize_chain",
    "track_normalize_chain",
}
_ATTR_LIST_KEYS = {
    "osm_station_name_attrs",
    "osm_edge_track_number_tags",
    "osm_track_number_tags",
}


def _unquote(s: str) -> str:
    s = s.strip()
    if len(s) >= 2 and s[0] == "'" and s[-1] == "'":
        return s[1:-1]
    return s


def _parse_chain_rule(line: str) -> tuple[str, str] | None:
    # "pattern -> replacement;"  (either side may be single-quoted)
    line = line.rstrip(";").strip()
    if "->" not in line:
        return None
    pat, rep = line.split("->", 1)
    return _unquote(pat), _unquote(rep)


def _parse_filter_rule(line: str) -> FilterRule:
    parts = [p.strip() for p in line.split("|")]
    kv = parts[0]
    k, _, v = kv.partition("=")
    return FilterRule(key=k.strip(), val=v.strip() or "*", flags=set(parts[1:]))


def parse_cfg(text: str = motcfg_data.CFG_TEXT) -> dict[str, MotConfig]:
    """Parse config text into per-MOT configs (later sections override
    earlier keys for the MOTs they name, mirroring the reference's
    section merge)."""
    per_mot: dict[str, MotConfig] = {}
    cur_mots: tuple[str, ...] = ()
    cur_key: str | None = None

    def targets() -> list[MotConfig]:
        out = []
        for m in cur_mots:
            if m not in per_mot:
                per_mot[m] = MotConfig(mots=(m,))
            out.append(per_mot[m])
        return out

    def start_key(key: str) -> None:
        for c in targets():
            if key in _CHAIN_KEYS:
                c.chains[key] = []
            elif key.startswith("osm_filter"):
                c.filters[key] = []
            elif key in _ATTR_LIST_KEYS:
                c.attr_lists[key] = []
            elif key == "osm_line_relation_tags":
                c.rel_tags = {}
            elif key == "osm_station_group_attrs":
                c.group_attrs = []

    for raw in text.splitlines():
        line = raw.split("#", 1)[0].rstrip()  # no quoted '#' in the dialect
        if not line.strip():
            continue
        if line.lstrip().startswith("[") and line.rstrip().endswith("]") and "=" not in line:
            cur_mots = tuple(
                m.strip() for m in line.strip()[1:-1].split(",") if m.strip()
            )
            cur_key = None
            continue
        indented = line[0] in (" ", "\t")
        body = line.strip()
        if not indented and ":" in body:
            key, _, rest = body.partition(":")
            key = key.strip()
            rest = rest.strip()
            cur_key = key
            start_key(key)
            if rest:  # single-line scalar
                for c in targets():
                    c.scalars[key] = rest
                cur_key = None
            continue
        if indented and cur_key:
            _dispatch_entry(targets(), cur_key, body)
    return per_mot


def _dispatch_entry(cfgs: list[MotConfig], key: str, body: str) -> None:
    if key in _CHAIN_KEYS:
        rule = _parse_chain_rule(body)
        if rule:
            for c in cfgs:
                c.chains[key].append(rule)
    elif key == "osm_line_relation_tags":
        name, _, attrs = body.partition("=")
        for c in cfgs:
            c.rel_tags[name.strip()] = [a.strip() for a in attrs.split(",")]
    elif key == "osm_station_group_attrs":
        # optional relation-scope prefix: [k=v]attr=dist
        prefix = ""
        rest = body
        if body.startswith("["):
            end = body.index("]")
            prefix = body[1:end]
            rest = body[end + 1 :]
        attr, _, dist = rest.partition("=")
        for c in cfgs:
            c.group_attrs.append((prefix or None, attr.strip(), float(dist)))
    elif key in _ATTR_LIST_KEYS:
        for c in cfgs:
            c.attr_lists[key].append(body.strip())
    elif key.startswith("osm_filter"):
        r = _parse_filter_rule(body)
        for c in cfgs:
            c.filters[key].append(r)


def load(mot: str = "rail") -> MotConfig:
    return parse_cfg()[mot]


# ---------------------------------------------------------------------------
# compiled normalizer chains (Spark + DuckDB twins)
# ---------------------------------------------------------------------------

def norm_col(chain: list[tuple[str, str]], col: Column) -> Column:
    """Order-sensitive regexp_replace chain after lower() — the chain is
    authored lowercase; lowering first gives the reference's icase
    semantics with a canonical-case output."""
    out = F.lower(col)
    for pat, rep in chain:
        out = F.regexp_replace(out, pat, re.sub(r"\\(\d)", r"$\1", rep))
    return out


def norm_sql(chain: list[tuple[str, str]], expr: str) -> str:
    out = f"LOWER({expr})"
    for pat, rep in chain:
        p = pat.replace("'", "''")
        r = rep.replace("'", "''")
        out = f"REGEXP_REPLACE({out}, '{p}', '{r}', 'g')"
    return out


# ---------------------------------------------------------------------------
# compiled filter evaluators (Spark map-column + DuckDB scalar twins)
# ---------------------------------------------------------------------------

def _val_match_col(v: Column, rule: FilterRule) -> Column:
    """valMatches (osm_filter.cpp:139-160): '*' wildcard, exact, and the
    mult_val_match ';'-list variants."""
    if rule.val == "*":
        return v.isNotNull()
    eq = v == rule.val
    if "mult_val_match" in rule.flags:
        return (
            eq
            | v.contains(";" + rule.val)
            | v.contains(rule.val + ";")
            | v.contains("; " + rule.val)
            | v.contains(rule.val + " ;")
        )
    return eq


def match_col(rules: list[FilterRule], tags: Column, kind: str = WAY) -> Column:
    """True iff any tag matches any rule applicable to `kind`."""
    conds = []
    for r in rules:
        if _KIND_FLAG[kind] in r.flags:
            continue
        conds.append(_val_match_col(F.element_at(tags, r.key), r))
    if not conds:
        return F.lit(False)
    out = conds[0]
    for c in conds[1:]:
        out = out | c
    # absent tag -> NULL comparison; the reference's "no rule matched"
    # is plain false (osm_filter.cpp:85-103)
    return F.coalesce(out, F.lit(False))


def _val_match_sql(vexpr: str, rule: FilterRule) -> str:
    if rule.val == "*":
        return f"{vexpr} IS NOT NULL"
    v = rule.val.replace("'", "''")
    eq = f"{vexpr} = '{v}'"
    if "mult_val_match" in rule.flags:
        return (
            f"({eq} OR contains({vexpr}, ';{v}') OR contains({vexpr}, '{v};')"
            f" OR contains({vexpr}, '; {v}') OR contains({vexpr}, '{v} ;'))"
        )
    return f"({eq})"


def match_sql(rules: list[FilterRule], tag_expr, kind: str = WAY) -> str:
    """DuckDB twin of match_col. `tag_expr(key) -> SQL` maps a tag key to
    the expression holding that tag's value (NULL = absent)."""
    conds = [
        _val_match_sql(tag_expr(r.key), r)
        for r in rules
        if _KIND_FLAG[kind] not in r.flags
    ]
    if not conds:
        return "FALSE"
    return "COALESCE(" + " OR ".join(conds) + ", FALSE)"


def oneway_class_col(cfg: MotConfig, tags: Column) -> Column:
    """F5: 0 = bidirectional, 1 = forward oneway, -1 = reverse oneway.
    The `undirected` exception list wins (osm_filter.cpp:58-69)."""
    two = match_col(cfg.filters.get("osm_filter_undirected", []), tags, WAY)
    fwd = match_col(cfg.filters.get("osm_filter_oneway", []), tags, WAY)
    rev = match_col(cfg.filters.get("osm_filter_oneway_reverse", []), tags, WAY)
    return (
        F.when(two, F.lit(0))
        .when(rev, F.lit(-1))
        .when(fwd, F.lit(1))
        .otherwise(F.lit(0))
    )


def oneway_class_sql(cfg: MotConfig, tag_expr) -> str:
    two = match_sql(cfg.filters.get("osm_filter_undirected", []), tag_expr, WAY)
    fwd = match_sql(cfg.filters.get("osm_filter_oneway", []), tag_expr, WAY)
    rev = match_sql(cfg.filters.get("osm_filter_oneway_reverse", []), tag_expr, WAY)
    return (
        f"CASE WHEN {two} THEN 0 WHEN {rev} THEN -1 "
        f"WHEN {fwd} THEN 1 ELSE 0 END"
    )


def level_col(cfg: MotConfig, tags: Column) -> Column:
    """F7: first level i in 0..7 whose filter matches; default 0
    (osm_filter.cpp:118-137)."""
    out = F.lit(0)
    for i in reversed(range(8)):
        rules = cfg.level_filters()[i]
        if rules:
            out = F.when(match_col(rules, tags, WAY), F.lit(i)).otherwise(out)
    return out


def level_sql(cfg: MotConfig, tag_expr) -> str:
    whens = []
    for i in range(8):
        rules = cfg.level_filters()[i]
        if rules:
            whens.append(f"WHEN {match_sql(rules, tag_expr, WAY)} THEN {i}")
    if not whens:
        return "0"
    return "CASE " + " ".join(whens) + " ELSE 0 END"


def first_match_col(attrs: list[str], chain: list[tuple[str, str]], tags: Column) -> Column:
    """W5: first non-empty normalized tag value in priority order."""
    cands = [
        F.nullif(norm_col(chain, F.element_at(tags, a)), F.lit(""))
        for a in attrs
    ]
    return F.coalesce(*cands) if cands else F.lit(None).cast("string")


def first_match_sql(attrs: list[str], chain: list[tuple[str, str]], tag_expr) -> str:
    cands = [f"NULLIF({norm_sql(chain, tag_expr(a))}, '')" for a in attrs]
    return "COALESCE(" + ", ".join(cands) + ")" if cands else "NULL"
