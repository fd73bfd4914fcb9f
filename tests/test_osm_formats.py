"""osmio format fidelity: XML writer golden output (xml/mod.rs:565-597),
XML/OPL roundtrips (E2 read→write→read equality), tag ops, escaping goldens."""

from pyspark.sql import functions as F

from osmgraft.operators.osm import (
    is_area,
    is_closed,
    num_tags,
    set_tag,
    strip_metadata,
    tags_json,
    unset_tag,
)
from osmgraft.sources.opl import node_to_opl, opl_escape, parse_node_opl
from osmgraft.sources.osm_xml import node_to_xml, osc_wrap, parse_node_xml, xml_escape
from osmgraft.synth import osm_nodes_df, osm_ways_df


def test_xml_escape_goldens(spark):
    # osmio xml/mod.rs:552-563 macro cases
    cases = [
        ("foo", "foo"),
        ('foo & bar " \' <whoop>', "foo &amp; bar &quot; &apos; &lt;whoop&gt;"),
        ("&&&", "&amp;&amp;&amp;"),
    ]
    df = spark.createDataFrame([(a,) for a, _ in cases], "s string")
    got = [r.e for r in df.select(xml_escape(F.col("s")).alias("e")).collect()]
    assert got == [b for _, b in cases]


def test_xml_writer_golden_node(spark):
    """Golden element mirroring xml/mod.rs:565-597: escaped user '&foo',
    epoch 700 → 1970-01-01T00:11:40Z, 7-decimal fixed-point coords."""
    nodes = osm_nodes_df(spark)
    lines = {r.id: r.line for r in node_to_xml(nodes).collect()}
    assert lines[1] == (
        '<node id="1" visible="true" version="1" user="&amp;foo" uid="1"'
        ' changeset="1" timestamp="1970-01-01T00:11:40Z" lat="1.2300000" lon="-4.5600000" />'
    )
    # tagged golden node 197801 (opl/test.rs:22-38): child <tag> element form
    assert lines[197801].startswith(
        '<node id="197801" visible="true" version="6" user="mikefalzon" uid="20673"'
        ' changeset="10009832" timestamp="2011-12-01T17:03:42Z"'
        ' lat="36.0292900" lon="14.2741628">'
    )
    assert '\t<tag k="created_by" v="JOSM"/>' in lines[197801]
    assert lines[197801].endswith("</node>")
    # deleted node with all-null metadata: minimal attrs, self-closing
    assert lines[2] == '<node id="2" visible="false" />'


def test_xml_roundtrip(spark):
    nodes = osm_nodes_df(spark)
    lines = node_to_xml(nodes).select("line")
    parsed = parse_node_xml(lines)

    def key(r):
        d = r.asDict()
        d["tags"] = tuple(sorted((d["tags"] or {}).items()))
        return tuple(d[f] for f in sorted(d))

    assert {key(r) for r in parsed.collect()} == {key(r) for r in nodes.collect()}


def test_opl_roundtrip_with_escaping(spark):
    import datetime as dt

    rows = [
        (1, 2, False, 3, dt.datetime(2020, 1, 1), 4, "user with spaces",
         {"key space": "value,comma", "plain": "x"}, 12_300_000, -45_600_000),
        (2, None, True, None, None, None, None, {}, None, None),
    ]
    from osmgraft.schema import OSM_NODE_SCHEMA

    nodes = spark.createDataFrame(rows, OSM_NODE_SCHEMA)
    lines = node_to_opl(nodes)
    # escaping golden: space → %0020%
    l1 = {r.id: r.line for r in lines.collect()}[1]
    assert " uuser%0020%with%0020%spaces " in l1
    assert "key%0020%space=value%002c%comma" in l1
    parsed = parse_node_opl(lines.select("line"))
    got = {r.id: r for r in parsed.collect()}
    assert got[1].user == "user with spaces"
    assert got[1].tags == {"key space": "value,comma", "plain": "x"}
    assert got[1].lat7 == 12_300_000 and got[1].lon7 == -45_600_000
    assert got[2].deleted is True and got[2].user is None


def test_opl_escape_safe_identity(spark):
    df = spark.createDataFrame([("abc.:_#-019",), ("a;b,c",)], "s string")
    got = [r.e for r in df.select(opl_escape(F.col("s")).alias("e")).collect()]
    assert got[0] == "abc.:_#-019"  # safe chars pass through
    assert got[1] == "a%003b%b%002c%c"  # separators are escaped


def test_tag_ops(spark):
    nodes = osm_nodes_df(spark)
    r = nodes.filter(F.col("id") == 197801).select(
        num_tags(F.col("tags")).alias("n"),
        set_tag(F.col("tags"), "created_by", "other")["created_by"].alias("upserted"),
        num_tags(set_tag(F.col("tags"), "new", "v")).alias("n_after_set"),
        num_tags(unset_tag(F.col("tags"), "created_by")).alias("n_after_unset"),
        tags_json(F.col("tags")).alias("js"),
    ).first()
    assert (r.n, r.upserted, r.n_after_set, r.n_after_unset) == (1, "other", 2, 0)
    assert r.js == '{"created_by":"JOSM"}'


def test_strip_metadata(spark):
    nodes = strip_metadata(osm_nodes_df(spark))
    r = nodes.filter(F.col("id") == 197801).first()
    assert r.uid is None and r.user is None and r.changeset_id is None
    assert r.version == 6  # version survives (lib.rs:364-368 strips only 3 fields)


def test_area_golden_table(spark):
    """tests.rs:90-165 semantics."""
    got = {
        r.id: (r.closed, r.area)
        for r in osm_ways_df(spark)
        .select(
            "id",
            is_closed(F.col("nodes")).alias("closed"),
            is_area(F.col("nodes"), F.col("tags")).alias("area"),
        )
        .collect()
    }
    assert got == {100: (False, False), 101: (True, True), 102: (True, False), 103: (True, True)}


def test_osc_wrap(spark):
    nodes = osm_nodes_df(spark).filter(F.col("id") == 1)
    doc = [r.line for r in osc_wrap(node_to_xml(nodes)).orderBy("ord").collect()]
    assert doc[0].startswith("<?xml") and doc[1] == "<osmChange>" and doc[2] == "<modify>"
    assert doc[-2] == "</modify>" and doc[-1] == "</osmChange>"


def test_snapshot_diff_roundtrip_and_semantics(spark):
    """snapshot_diff is the exact inverse of osc_apply: applying the
    derived change set to old reproduces new bit-for-bit, including
    NULL-value transitions (NULL-safe compares)."""
    from osmgraft.operators.osm import osc_apply, snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", None), (3, "c", 30), (4, "d", 40)],
        "id long, t string, v long",
    )
    new = spark.createDataFrame(
        [(1, "a", 10),      # unchanged -> absent from diff
         (2, "b", 20),      # NULL -> 20: modify (NULL-safe)
         (3, "c", None),    # 30 -> NULL: modify
         (5, "e", 50)],     # created; id 4 deleted
        "id long, t string, v long",
    )
    diff = snapshot_diff(old, new, ["id"], ["t", "v"])
    got = {r.id: (r.op, r.t, r.v) for r in diff.collect()}
    assert got == {
        2: ("modify", "b", 20),
        3: ("modify", "c", None),
        4: ("delete", "d", 40),
        5: ("create", "e", 50),
    }
    applied = osc_apply(
        old, diff.withColumn("version", F.lit(2)), key_cols=["id"]
    )
    assert sorted(map(tuple, applied.collect())) == sorted(map(tuple, new.collect()))


def test_expire_tiles_semantics(spark):
    """delete/modify dirty the OLD tile, create/modify the NEW tile; nulls
    never emit; output is the distinct union."""
    from osmgraft.operators.osm import expire_tiles

    # z=1 tiles: lon sign picks tx, lat sign picks ty (simple quadrants)
    E, W, N, S = 900_000_000, -900_000_000, 600_000_000, -600_000_000
    rows = [
        ("modify", N, W, N, E),   # dirties (W,N) and (E,N)
        ("delete", S, W, None, None),  # dirties (W,S) only
        ("create", None, None, S, E),  # dirties (E,S) only
        ("modify", N, W, N, W),   # duplicate of (W,N) twice -> distinct
    ]
    df = spark.createDataFrame(
        rows, "op string, old_lat7 int, old_lon7 int, new_lat7 int, new_lon7 int"
    )
    got = {(r.tx, r.ty) for r in expire_tiles(df, z=1).collect()}
    assert got == {(0, 0), (1, 0), (0, 1), (1, 1)}
    assert expire_tiles(df, z=1).count() == 4
