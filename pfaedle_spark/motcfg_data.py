"""Shipped MOT configuration (data, not code).

Format re-expresses the reference's config dialect
(``src/libs/pfaedle/src/config/mot_config_reader.cpp:560-640``:
sections ``[mot,...]``, ``key:`` blocks with tab-indented entries,
``pattern -> replacement;`` normalizer rules, ``k=v|flag`` filter rules,
``[k=v]attr=num`` prefixed group rules). The rule CONTENT below is
authored for this engine — it covers the same semantic categories the
reference ships (``pfaedle.cfg:8-419``): punctuation stripping,
diacritic folding, abbreviation expansion, leading-identifier
reordering, mode-token canonicalisation, track-info deletion and
whitespace collapse for the normalizers; keep/drop/level/oneway/
station/nohup tag filters and the routing weight block.

Every regex is written lowercase (the chain is applied after ``lower()``
— the reference compiles its rules with ``std::regex::icase``,
``trgraph/normalizer.cpp:76-96``) and restricted to constructs with
identical semantics in Java regex (Spark) and RE2 (DuckDB): character
classes, ``(^| )``/``($| )`` groups, greedy ``.+``, ``{m,n}`` and
numbered-group replacements.
"""

CFG_TEXT = r"""
# engine-shipped MOT configuration (format per the reference dialect)

[tram, bus, coach, subway, rail, gondola, funicular, ferry, trolleybus]

station_normalize_chain:
	, -> ' ';
	- -> ' ';
	_ -> ' ';
	/ -> ' ';
	\( -> ' ';
	\) -> ' ';
	\[ -> ' ';
	\] -> ' ';
	" -> '';
	' -> '';
	` -> '';
	& -> '+';
	ä -> ae;
	ö -> oe;
	ü -> ue;
	ß -> ss;
	é -> e;
	è -> e;
	ê -> e;
	ë -> e;
	á -> a;
	à -> a;
	â -> a;
	ó -> o;
	ò -> o;
	ô -> o;
	í -> i;
	ï -> i;
	ú -> u;
	ù -> u;
	å -> ae;
	ø -> oe;
	œ -> oe;
	ç -> c;
	str\. -> strasse;
	av\. -> avenue;
	'([a-z])strasse($| )' -> '\1 strasse\2';
	'([a-z])street($| )' -> '\1 street\2';
	'(^| )strasse($| )' -> '\1street\2';
	'(^| )avenida($| )' -> '\1avenue\2';
	'(^| )hauptbf\.($| )' -> '\1hauptbahnhof\2';
	'(^| )hauptbf($| )' -> '\1hauptbahnhof\2';
	'(^| )hbf\.($| )' -> '\1hauptbahnhof\2';
	'(^| )hbf($| )' -> '\1hauptbahnhof\2';
	'(^| )busbf($| )' -> '\1busbahnhof\2';
	'(^| )zob($| )' -> '\1busbahnhof\2';
	'(^| )bf\.($| )' -> '\1bahnhof\2';
	'(^| )bf($| )' -> '\1bahnhof\2';
	'(^| )bhf\.($| )' -> '\1bahnhof\2';
	'(^| )bhf($| )' -> '\1bahnhof\2';
	'(^| )gare de($| )' -> '\1gare\2';
	'^hauptbahnhof (.+)$' -> \1 hauptbahnhof;
	'^busbahnhof (.+)$' -> \1 busbahnhof;
	'^bahnhof (.+)$' -> \1 bahnhof;
	'^gare (.+)$' -> \1 gare;
	'^station (.+)$' -> \1 station;
	'(^| )u bahn($| )' -> '\1ubahn\2';
	'(^| )metro($| )' -> '\1ubahn\2';
	'(^| )subway($| )' -> '\1ubahn\2';
	'(^| )ubahn($| )' -> '\1u\2';
	'(^| )s bahn($| )' -> '\1sbahn\2';
	'(^| )sbahn($| )' -> '\1s\2';
	'(^| )tramway($| )' -> '\1tram\2';
	'(^| )strassenbahn($| )' -> '\1tram\2';
	'(^| )streetcar($| )' -> '\1tram\2';
	'(^| )tram($| )' -> '\1t\2';
	'(^| )gleis [a-z0-9]{1,2}($| )' -> ' ';
	'(^| )track [a-z0-9]{1,2}($| )' -> ' ';
	'(^| )voie [a-z0-9]{1,2}($| )' -> ' ';
	'(^| )kante [a-z0-9]{1,2}($| )' -> ' ';
	'(^| )und($| )' -> '\1+\2';
	'(^| )and($| )' -> '\1+\2';
	'(^| )et($| )' -> '\1+\2';
	'(^| )saint ' -> '\1st. ';
	'(^| )sankt ' -> '\1st. ';
	\s+ -> ' ';
	^\s -> '';
	\s$ -> '';

line_normalize_chain:
	, -> ' ';
	- -> ' ';
	_ -> ' ';
	/ -> ' ';
	" -> '';
	' -> '';
	` -> '';
	& -> '+';
	ä -> ae;
	ö -> oe;
	ü -> ue;
	ß -> ss;
	é -> e;
	è -> e;
	á -> a;
	à -> a;
	ó -> o;
	ò -> o;
	í -> i;
	ú -> u;
	ç -> c;
	^linie -> '';
	^line -> '';
	^metro -> '';
	^tram -> '';
	^bus -> '';
	\(.+\) -> ' ';
	\[.+\] -> ' ';
	\s+ -> ' ';
	^\s -> '';
	\s$ -> '';
	^([a-z]+) ([0-9]+)$ -> \1\2;

track_normalize_chain:
	'(^| )gleis($| )' -> '';
	'(^| )gl\.($| )' -> '';
	'(^| )platform($| )' -> '';
	'(^| )track($| )' -> '';
	'(^| )voie($| )' -> '';
	^([a-z]+) ([0-9]+)$ -> \1\2;
	^([0-9]+) ([a-z]+)$ -> \1\2;
	^[0-9]{4,}$ -> '';

[rail]

osm_filter_keep:
	railway=rail
	railway=light_rail
	railway=tram
	railway=narrow_gauge
	route=rail
	route=train
	public_transport=stop_area|rel_flat

osm_filter_lvl1:
	usage=branch

osm_filter_lvl2:
	railway=tram
	service=siding

osm_filter_lvl3:
	service=crossover
	service=yard

osm_filter_lvl4:

osm_filter_lvl5:
	usage=industrial
	usage=military
	service=spur

osm_filter_drop:
	railway=abandoned
	railway=construction
	railway=disused
	railway=razed
	railway=proposed
	railway=platform
	public_transport=platform
	area=yes
	building=*

osm_filter_nohup:
	railway:switch=no
	railway=railway_crossing

osm_filter_oneway:
	oneway=yes
	railway:preferred_direction=forward

osm_filter_oneway_reverse:
	railway:preferred_direction=backward

osm_filter_undirected:
	oneway=no
	oneway=false
	oneway=-1
	railway:preferred_direction=both
	railway:bidirectional=regular

osm_filter_station:
	public_transport=stop_position
	railway=stop
	railway=halt
	railway=station
	stop=*

osm_line_relation_tags:
	line_name=ref,name
	from_name=from
	to_name=to

osm_station_name_attrs:
	name
	uic_name

osm_station_group_attrs:
	uic_ref=500
	wikidata=500
	[public_transport=stop_area]uic_ref=500
	name=100

osm_edge_track_number_tags:
	railway:track_ref
	local_ref
	ref

osm_max_snap_distance: 10, 100, 200
osm_max_snap_level: 2

routing_lvl0_fac: 1
routing_lvl1_fac: 1.25
routing_lvl2_fac: 1.5
routing_lvl3_fac: 2
routing_lvl4_fac: 2.5
routing_lvl5_fac: 3.5
routing_lvl6_fac: 5
routing_lvl7_fac: 7
routing_full_turn_punish: 3000
routing_full_turn_angle: 100
routing_pass_thru_station_punish: 100
routing_one_way_meter_punish_fac: 1
routing_line_unmatched_punish_fac: 1
"""
