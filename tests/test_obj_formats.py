"""Full object-stream codecs: XML/OPL way+relation lines, file-level XML/OSC/
changeset readers (osmio xml/mod.rs:279-357,436-506; opl/mod.rs:146-260;
osc/mod.rs:31-91; changesets.rs:82-309)."""

import datetime as dt

import pytest

from osmgraft.schema import OSM_OBJ_SCHEMA
from osmgraft.sources import xml_files
from osmgraft.sources.opl import node_to_opl, obj_to_opl, parse_obj_opl
from osmgraft.sources.osm_xml import node_to_xml, obj_to_xml, parse_obj_xml


def _objs():
    ts = dt.datetime(2011, 12, 1, 17, 3, 42)
    return [
        # node, tagged, escaping-needing strings
        ("n", 197801, 6, False, 10009832, ts, 20673, 'mike&<f>"',
         {"created_by": "JO&SM"}, 360_292_900, 142_741_628, None, None),
        # node, untagged, minimal
        ("n", 2, None, True, None, None, None, None, {}, None, None, None, None),
        # way
        ("w", 22, 3, False, 55, ts, 9, "wayne", {"highway": "tertiary"},
         None, None, [197801, 2, 197801], None),
        # way, empty nodes + no tags
        ("w", 23, 1, False, None, None, None, None, {}, None, None, [], None),
        # relation with all member types + role escaping
        ("r", 31, 2, False, 77, ts, 9, "rel", {"type": "route"},
         None, None, None,
         [{"type": "n", "ref": 197801, "role": "admin<&>centre"},
          {"type": "w", "ref": 22, "role": "outer"},
          {"type": "r", "ref": 31, "role": ""}]),
    ]


@pytest.fixture(scope="module")
def objs_df(spark):
    return spark.createDataFrame(_objs(), OSM_OBJ_SCHEMA)


def _key(r):
    d = r.asDict(recursive=True)
    d["tags"] = tuple(sorted((d["tags"] or {}).items()))
    if d["members"] is not None:
        d["members"] = tuple((m["type"], m["ref"], m["role"]) for m in d["members"])
    if d["nodes"] is not None:
        d["nodes"] = tuple(d["nodes"])
    return tuple((f, d[f]) for f in sorted(d))


# --- XML ---------------------------------------------------------------------


def test_obj_xml_node_byte_compat(spark, objs_df):
    """obj_to_xml must emit byte-identical node lines to the round-1 golden
    node serializer."""
    nodes = objs_df.filter("obj_type = 'n'").drop("obj_type", "nodes", "members")
    want = {r.id: r.line for r in node_to_xml(nodes).collect()}
    got = {r.id: r.line for r in obj_to_xml(objs_df.filter("obj_type = 'n'")).collect()}
    assert got == want


def test_obj_xml_goldens(spark, objs_df):
    lines = {r.id: r.line for r in obj_to_xml(objs_df).collect()}
    assert lines[22] == (
        '<way id="22" visible="true" version="3" user="wayne" uid="9" changeset="55"'
        ' timestamp="2011-12-01T17:03:42Z">\n'
        '\t<nd ref="197801"/>\n\t<nd ref="2"/>\n\t<nd ref="197801"/>\n'
        '\t<tag k="highway" v="tertiary"/>\n</way>'
    )
    assert lines[31].startswith('<relation id="31" visible="true" version="2"')
    assert '\t<member type="node" ref="197801" role="admin&lt;&amp;&gt;centre"/>' in lines[31]
    assert '\t<member type="way" ref="22" role="outer"/>' in lines[31]
    assert '\t<member type="relation" ref="31" role=""/>' in lines[31]
    assert lines[31].endswith("</relation>")
    # childless way self-closes like an untagged node
    assert lines[23] == '<way id="23" visible="true" version="1" />'


def test_obj_xml_roundtrip(spark, objs_df):
    parsed = parse_obj_xml(obj_to_xml(objs_df).select("line"))
    assert {_key(r) for r in parsed.collect()} == {_key(r) for r in objs_df.collect()}


# --- OPL ---------------------------------------------------------------------


def test_obj_opl_node_byte_compat(spark, objs_df):
    nodes = objs_df.filter("obj_type = 'n'").drop("obj_type", "nodes", "members")
    want = {r.id: r.line for r in node_to_opl(nodes).collect()}
    got = {r.id: r.line for r in obj_to_opl(objs_df.filter("obj_type = 'n'")).collect()}
    assert got == want


def test_obj_opl_goldens(spark, objs_df):
    lines = {r.id: r.line for r in obj_to_opl(objs_df).collect()}
    assert lines[22] == (
        "w22 v3 dV c55 t2011-12-01T17:03:42Z i9 uwayne"
        " Thighway=tertiary Nn197801,n2,n197801"
    )
    assert lines[31] == (
        "r31 v2 dV c77 t2011-12-01T17:03:42Z i9 urel Ttype=route"
        " Mn197801@admin%003c%%0026%%003e%centre,w22@outer,r31@"
    )
    assert lines[23] == "w23 v1 dV c t i u T N"


def test_obj_opl_roundtrip(spark, objs_df):
    parsed = parse_obj_opl(obj_to_opl(objs_df).select("line"))
    got = {r.id: r.asDict(recursive=True) for r in parsed.collect()}
    for r in objs_df.collect():
        d = r.asDict(recursive=True)
        g = got[d["id"]]
        for f in ("obj_type", "id", "version", "changeset_id", "uid", "lat7", "lon7"):
            # OPL writes empty fields for null version/changeset/uid; parse → null
            assert g[f] == d[f], (f, d["id"])
        assert g["deleted"] == bool(d["deleted"])
        assert (g["tags"] or {}) == (d["tags"] or {})
        assert g["nodes"] == d["nodes"]
        if d["members"] is None:
            assert g["members"] is None
        else:
            assert [tuple(m.values()) for m in g["members"]] == [
                (m["type"], m["ref"], m["role"]) for m in d["members"]
            ]
        # null user serializes as '' and parses back as '' (reference keeps
        # Some("") too — opl/mod.rs:196-260 has no null-user form)
        assert (g["user"] or "") == (d["user"] or "")


# --- file-level readers ------------------------------------------------------


def _dicts():
    out = []
    for o in _objs():
        (t, i, v, dl, cs, ts, uid, user, tags, lat7, lon7, nodes, members) = o
        out.append(
            {
                "obj_type": t, "id": i, "version": v, "deleted": dl,
                "changeset_id": cs,
                "ts": int(ts.replace(tzinfo=dt.timezone.utc).timestamp()) if ts else None,
                "uid": uid, "user": user, "tags": tags, "lat7": lat7, "lon7": lon7,
                "nodes": nodes, "members": members,
            }
        )
    return out


def test_read_xml_file(spark, tmp_path, objs_df):
    p = tmp_path / "f.osm"
    xml_files.write_xml_file(_dicts(), str(p))
    got = xml_files.read_xml(spark, str(p))
    assert {_key(r) for r in got.collect()} == {_key(r) for r in objs_df.collect()}


def test_read_xml_bz2(spark, tmp_path, objs_df):
    import bz2

    p = tmp_path / "f.osm"
    xml_files.write_xml_file(_dicts(), str(p))
    pz = tmp_path / "f.osm.bz2"
    pz.write_bytes(bz2.compress(p.read_bytes()))
    got = xml_files.read_xml(spark, str(pz))
    assert {_key(r) for r in got.collect()} == {_key(r) for r in objs_df.collect()}


def test_read_osc(spark, tmp_path):
    d = _dicts()
    p = tmp_path / "c.osc"
    xml_files.write_osc_file(
        {"create": [d[0]], "modify": [d[2]], "delete": [d[1]]}, str(p)
    )
    got = {r.id: r for r in xml_files.read_osc(spark, str(p)).collect()}
    assert got[197801].op == "create"
    assert got[22].op == "modify"
    assert got[2].op == "delete" and got[2].deleted is True


def test_read_changesets(spark, tmp_path):
    rows = [
        {"id": 1, "created": 1_500_000_000, "closed": 1_500_003_600, "open": False,
         "uid": 42, "user": "cs&user", "tags": {"comment": "fix <roads>"},
         "num_changes": 12, "comments_count": 3},
        {"id": 2, "created": 1_500_100_000, "closed": None, "open": True,
         "uid": None, "user": None, "tags": {}, "num_changes": None,
         "comments_count": None},
    ]
    p = tmp_path / "changesets-latest.osm"
    xml_files.write_changesets_file(rows, str(p))
    got = {r.id: r.asDict() for r in xml_files.read_changesets(spark, str(p)).collect()}
    assert len(got) == 2
    g = got[1]
    assert g["user"] == "cs&user"
    assert g["tags"] == {"comment": "fix <roads>"}
    assert g["num_changes"] == 12 and g["comments_count"] == 3
    assert int(g["created"].replace(tzinfo=dt.timezone.utc).timestamp()) == 1_500_000_000
    assert int(g["closed"].replace(tzinfo=dt.timezone.utc).timestamp()) == 1_500_003_600
    assert g["open"] is False
    g2 = got[2]
    assert g2["open"] is True and g2["closed"] is None and g2["uid"] is None


def test_unicode_roundtrip_all_formats(spark, tmp_path):
    """Non-ASCII users/tags/roles (the OSM norm, not the exception) survive
    XML, OPL, and PBF roundtrips byte-exactly: UTF-8 string tables, XML
    entity escaping, and OPL %HEX% escaping all compose with multibyte
    codepoints."""
    import datetime as dt

    from osmgraft.schema import OSM_OBJ_SCHEMA
    from osmgraft.sources import pbf
    from osmgraft.sources.opl import obj_to_opl, parse_obj_opl
    from osmgraft.sources.osm_xml import obj_to_xml, parse_obj_xml

    ts = dt.datetime(2020, 5, 4, 3, 2, 1)
    user = "café 日本 עברית & <quoted> \"rôle\""
    rows = [
        ("n", 1, 1, False, 5, ts, 7, user,
         {"name:ja": "東京", "addr": "øster allé 12, münchen", "emoji": "ok 😀🗾"},
         515_000_000, 100_000_000, None, None),
        ("w", 2, 1, False, 5, ts, 7, "naïve user",
         {"note": "comma,separated %20 already"}, None, None, [1, 1], None),
        ("r", 3, 1, False, 5, ts, 7, user, {"type": "multipolygon"},
         None, None, None, [{"type": "n", "ref": 1, "role": "centré @role"}]),
    ]
    df = spark.createDataFrame(rows, OSM_OBJ_SCHEMA)
    want = sorted(_key(r) for r in df.collect())

    got_xml = sorted(_key(r) for r in parse_obj_xml(obj_to_xml(df).select("line")).collect())
    assert got_xml == want
    got_opl = sorted(_key(r) for r in parse_obj_opl(obj_to_opl(df).select("line")).collect())
    assert got_opl == want

    p = str(tmp_path / "uni.osm.pbf")
    dicts = []
    for r in df.collect():
        d = r.asDict(recursive=True)
        d["ts"] = int(d.pop("timestamp").replace(tzinfo=dt.timezone.utc).timestamp())
        dicts.append(d)
    pbf.write_pbf(dicts, p)
    got_pbf = sorted(_key(r) for r in pbf.read_pbf(spark, p).collect())
    assert got_pbf == want


def test_wkt_fmt_parse_inverse_and_corruption(spark):
    """fmt_e7/parse_e7 are exact inverses on sign/zero/extreme E7 values;
    a corrupted coordinate flips the polygon roundtrip equality."""
    from pyspark.sql import functions as F

    from osmgraft.functions.wkt import fmt_e7, parse_e7, parse_wkt_polygon

    vals = [0, 1, -1, 9_999_999, -9_999_999, 10_000_000, -1_800_000_000,
            1_800_000_000, -900_000_000, 123_456_789]
    df = spark.createDataFrame([(v,) for v in vals], "c int")
    out = df.select("c", fmt_e7(F.col("c")).alias("t")).select(
        "c", "t", parse_e7(F.col("t")).alias("back")
    )
    for r in out.collect():
        assert r["back"] == r["c"], r
        ip, fp = r["t"].lstrip("-").split(".")
        assert len(fp) == 7
    # corruption: swap one digit in the text -> parsed ring != source ring
    poly = "POLYGON ((0.0000000 1.0000000, 2.0000000 1.0000000, 0.0000000 1.0000000))"
    bad = poly.replace("2.0000000", "2.0000001")
    rings = (
        spark.createDataFrame([(poly,), (bad,)], "w string")
        .select(parse_wkt_polygon(F.col("w")).alias("r"))
        .collect()
    )
    assert rings[0]["r"] != rings[1]["r"]
    assert rings[0]["r"][0][1]["lon7"] == 20_000_000
    assert rings[1]["r"][0][1]["lon7"] == 20_000_001


def test_gpx_parse_recovers_exact_values(spark):
    """Writer→parser inversion on hand values incl. negative coords and a
    midnight-boundary time; pt_idx preserves segment order."""
    from pyspark.sql import functions as F

    from osmgraft.functions.gpx import gpx_trk, gpx_trkpt, parse_gpx_trkpts

    rows = [
        (0, -900_000_000, 1_799_999_999, 1_500_000_000),
        (1, 450_000_001, -7, 1_500_000_000 + 86_399),  # 23:59:59 boundary
    ]
    df = spark.createDataFrame(rows, "i long, lat7 int, lon7 int, ep long")
    pts = df.select(
        "i", gpx_trkpt(F.col("lat7"), F.col("lon7"), F.col("ep")).alias("p")
    )
    body = pts.groupBy().agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("i", "p"))), lambda e: e["p"]
            ),
            "",
        ).alias("b")
    ).select(gpx_trk(F.lit("t"), F.col("b")).alias("gpx"))
    got = parse_gpx_trkpts(body, "gpx").orderBy("pt_idx").collect()
    assert [(r["lat7"], r["lon7"], r["epoch"]) for r in got] == [
        (-900_000_000, 1_799_999_999, 1_500_000_000),
        (450_000_001, -7, 1_500_000_000 + 86_399),
    ]
    assert "<time>2017-07-14T02:40:00Z</time>" in body.collect()[0]["gpx"]
