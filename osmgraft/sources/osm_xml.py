"""OSM XML sink/source (osmio xml/mod.rs).

The writer pins the reference's golden serialization (xml/mod.rs:436-506,
tests :565-597): fixed attribute order id, visible, version, user, uid,
changeset, timestamp, lat, lon; self-closing element for untagged nodes;
``<tag k= v=/>`` children otherwise; XML-escaping of ``& " ' < >``
(xml/mod.rs:59-71). Timestamps render RFC3339 with 'Z' (epoch 700 →
``1970-01-01T00:11:40Z``, xml/mod.rs:594).

Everything is built from JVM Column expressions (concat/when/regexp_replace) —
the whole serialization stays in whole-stage codegen; the parser is a
regexp-based projection (attribute extraction like the reference's SAX
attribute map, xml/mod.rs:162-171).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def xml_escape(col: Column) -> Column:
    """osmio write_xml_escaped (xml/mod.rs:59-71): & first, then " ' < >."""
    c = F.regexp_replace(col, "&", "&amp;")
    c = F.regexp_replace(c, '"', "&quot;")
    c = F.regexp_replace(c, "'", "&apos;")
    c = F.regexp_replace(c, "<", "&lt;")
    c = F.regexp_replace(c, ">", "&gt;")
    return c


def sql_xml_escape(expr: str) -> str:
    c = f"replace({expr}, '&', '&amp;')"
    c = f"replace({c}, '\"', '&quot;')"
    c = f"replace({c}, '''', '&apos;')"
    c = f"replace({c}, '<', '&lt;')"
    c = f"replace({c}, '>', '&gt;')"
    return c


def _iso(ts: Column) -> Column:
    return F.date_format(ts, "yyyy-MM-dd'T'HH:mm:ss'Z'")


def _attr(name: str, value: Column) -> Column:
    """Render ` name="value"` or empty string when value is null."""
    return F.coalesce(
        F.concat(F.lit(f' {name}="'), value, F.lit('"')), F.lit("")
    )


def _fixed7(col: Column) -> Column:
    """Fixed-point int → decimal string with exactly 7 places (osmio writes
    lat/lon via its Lat Display impl — 1.23 prints as 1.2300000)."""
    sign = F.when(col < 0, F.lit("-")).otherwise(F.lit(""))
    a = F.abs(col.cast("long"))
    return F.concat(
        sign,
        (a / F.lit(10_000_000)).cast("long").cast("string"),
        F.lit("."),
        F.lpad(F.pmod(a, F.lit(10_000_000)).cast("string"), 7, "0"),
    )


def node_to_xml(nodes: DataFrame) -> DataFrame:
    """(OSM_NODE_SCHEMA columns) → (id, line) with the golden element form."""
    tags_inner = F.aggregate(
        F.map_entries(F.coalesce(F.col("tags"), F.map_from_arrays(F.array(), F.array()))),
        F.lit(""),
        lambda acc, e: F.concat(
            acc,
            F.lit('\t<tag k="'),
            xml_escape(e["key"]),
            F.lit('" v="'),
            xml_escape(e["value"]),
            F.lit('"/>\n'),
        ),
    )
    head = F.concat(
        F.lit("<node"),
        _attr("id", F.col("id").cast("string")),
        _attr(
            "visible",
            F.when(F.col("deleted").isNotNull(), (~F.col("deleted")).cast("string")),
        ),
        _attr("version", F.col("version").cast("string")),
        _attr("user", xml_escape(F.col("user"))),
        _attr("uid", F.col("uid").cast("string")),
        _attr("changeset", F.col("changeset_id").cast("string")),
        _attr("timestamp", _iso(F.col("timestamp"))),
        _attr("lat", F.when(F.col("lat7").isNotNull(), _fixed7(F.col("lat7")))),
        _attr("lon", F.when(F.col("lon7").isNotNull(), _fixed7(F.col("lon7")))),
    )
    line = F.when(
        F.size(F.coalesce(F.map_keys("tags"), F.array())) == 0,
        F.concat(head, F.lit(" />")),  # self-closing untagged (xml/mod.rs:474-477)
    ).otherwise(F.concat(head, F.lit(">\n"), tags_inner, F.lit("</node>")))
    return nodes.select(F.col("id"), line.alias("line"))


def parse_node_xml(lines: DataFrame, line_col: str = "line") -> DataFrame:
    """Inverse projection: extract the attributes back (SAX-attribute style).
    Returns OSM_NODE_SCHEMA minus tags-order fidelity (map rebuild)."""
    c = F.col(line_col)

    def attr(name):
        return F.nullif(F.regexp_extract(c, f'{name}="([^"]*)"', 1), F.lit(""))

    def unescape(col):
        x = F.regexp_replace(col, "&quot;", '"')
        x = F.regexp_replace(x, "&apos;", "'")
        x = F.regexp_replace(x, "&lt;", "<")
        x = F.regexp_replace(x, "&gt;", ">")
        return F.regexp_replace(x, "&amp;", "&")

    tag_pairs = F.expr(
        r"""transform(regexp_extract_all(line, '<tag k="([^"]*)" v="[^"]*"/>', 1), x -> x)"""
    )
    tag_vals = F.expr(
        r"""transform(regexp_extract_all(line, '<tag k="[^"]*" v="([^"]*)"/>', 1), x -> x)"""
    )
    from osmgraft.functions.coords import deg_to_fixed

    return lines.select(
        attr("id").cast("long").alias("id"),
        attr("version").cast("int").alias("version"),
        F.when(attr("visible").isNotNull(), attr("visible") == "false").alias("deleted"),
        attr("changeset").cast("int").alias("changeset_id"),
        F.to_timestamp_ntz(attr("timestamp"), F.lit("yyyy-MM-dd'T'HH:mm:ss'Z'")).alias("timestamp"),
        attr("uid").cast("int").alias("uid"),
        unescape(attr("user")).alias("user"),
        F.map_from_arrays(
            F.transform(tag_pairs, unescape), F.transform(tag_vals, unescape)
        ).alias("tags"),
        F.when(
            attr("lat").isNotNull(), deg_to_fixed(attr("lat").cast("double")).cast("int")
        ).alias("lat7"),
        F.when(
            attr("lon").isNotNull(), deg_to_fixed(attr("lon").cast("double")).cast("int")
        ).alias("lon7"),
    )


_TYPE_WORD = {"n": "node", "w": "way", "r": "relation"}


def obj_to_xml(objs: DataFrame) -> DataFrame:
    """OSM_OBJ_SCHEMA (nodes+ways+relations union) → (obj_type, id, line).

    Generalizes node_to_xml to the full object stream (osmio xml/mod.rs
    write_obj :436-506): same head-attribute order (id, visible, version,
    user, uid, changeset, timestamp, then lat/lon for nodes), ``<nd
    ref=""/>`` children for ways, ``<member type="" ref="" role=""/>`` with
    full-word types for relations, ``<tag/>`` children last. Node output is
    byte-identical to node_to_xml. All Column expressions — the whole
    serialization stays in whole-stage codegen."""
    t = F.col("obj_type")
    elem = F.when(t == "n", F.lit("node")).when(t == "w", F.lit("way")).otherwise(
        F.lit("relation")
    )
    tags_inner = F.aggregate(
        F.map_entries(F.coalesce(F.col("tags"), F.map_from_arrays(F.array(), F.array()))),
        F.lit(""),
        lambda acc, e: F.concat(
            acc,
            F.lit('\t<tag k="'),
            xml_escape(e["key"]),
            F.lit('" v="'),
            xml_escape(e["value"]),
            F.lit('"/>\n'),
        ),
    )
    nd_inner = F.aggregate(
        F.coalesce(F.col("nodes"), F.array().cast("array<long>")),
        F.lit(""),
        lambda acc, r: F.concat(
            acc, F.lit('\t<nd ref="'), r.cast("string"), F.lit('"/>\n')
        ),
    )
    member_inner = F.aggregate(
        F.coalesce(
            F.col("members"),
            F.array().cast("array<struct<type:string,ref:long,role:string>>"),
        ),
        F.lit(""),
        lambda acc, m: F.concat(
            acc,
            F.lit('\t<member type="'),
            F.when(m["type"] == "n", F.lit("node"))
            .when(m["type"] == "w", F.lit("way"))
            .otherwise(F.lit("relation")),
            F.lit('" ref="'),
            m["ref"].cast("string"),
            F.lit('" role="'),
            F.coalesce(xml_escape(m["role"]), F.lit("")),
            F.lit('"/>\n'),
        ),
    )
    head = F.concat(
        F.lit("<"),
        elem,
        _attr("id", F.col("id").cast("string")),
        _attr(
            "visible",
            F.when(F.col("deleted").isNotNull(), (~F.col("deleted")).cast("string")),
        ),
        _attr("version", F.col("version").cast("string")),
        _attr("user", xml_escape(F.col("user"))),
        _attr("uid", F.col("uid").cast("string")),
        _attr("changeset", F.col("changeset_id").cast("string")),
        _attr("timestamp", _iso(F.col("timestamp"))),
        _attr("lat", F.when((t == "n") & F.col("lat7").isNotNull(), _fixed7(F.col("lat7")))),
        _attr("lon", F.when((t == "n") & F.col("lon7").isNotNull(), _fixed7(F.col("lon7")))),
    )
    children = F.concat(nd_inner, member_inner, tags_inner)
    line = F.when(
        children == "", F.concat(head, F.lit(" />"))  # untagged childless self-close
    ).otherwise(
        F.concat(head, F.lit(">\n"), children, F.lit("</"), elem, F.lit(">"))
    )
    return objs.select("obj_type", F.col("id"), line.alias("line"))


def parse_obj_xml(lines: DataFrame, line_col: str = "line") -> DataFrame:
    """Full-element strings (node/way/relation) → OSM_OBJ_SCHEMA projection.
    Generalizes parse_node_xml: nd refs and member triples come back via
    regexp_extract_all over the child lines (attribute order as written by
    obj_to_xml / the reference writer). Accepts both full-word and char
    member types (osmio OSMObjectType parses both)."""
    c = F.col(line_col)

    def attr(name):
        return F.nullif(F.regexp_extract(c, f'{name}="([^"]*)"', 1), F.lit(""))

    def unescape(col):
        x = F.regexp_replace(col, "&quot;", '"')
        x = F.regexp_replace(x, "&apos;", "'")
        x = F.regexp_replace(x, "&lt;", "<")
        x = F.regexp_replace(x, "&gt;", ">")
        return F.regexp_replace(x, "&amp;", "&")

    from osmgraft.functions.coords import deg_to_fixed

    elem = F.regexp_extract(c, r"^<(node|way|relation)\b", 1)
    obj_type = F.when(elem == "node", F.lit("n")).when(elem == "way", F.lit("w")).otherwise(
        F.lit("r")
    )
    tag_keys = F.expr(
        rf"""transform(regexp_extract_all({line_col}, '<tag k="([^"]*)" v="[^"]*"/>', 1), x -> x)"""
    )
    tag_vals = F.expr(
        rf"""transform(regexp_extract_all({line_col}, '<tag k="[^"]*" v="([^"]*)"/>', 1), x -> x)"""
    )
    nds = F.expr(
        rf"""transform(regexp_extract_all({line_col}, '<nd ref="([0-9]+)"/>', 1),
             x -> CAST(x AS BIGINT))"""
    )
    mem_types = F.expr(
        rf"""regexp_extract_all({line_col}, '<member type="([a-z]+)" ref="[0-9]+"', 1)"""
    )
    mem_refs = F.expr(
        rf"""regexp_extract_all({line_col}, '<member type="[a-z]+" ref="([0-9]+)"', 1)"""
    )
    mem_roles = F.expr(
        rf"""regexp_extract_all({line_col},
             '<member type="[a-z]+" ref="[0-9]+" role="([^"]*)"', 1)"""
    )
    members = F.zip_with(
        F.zip_with(
            mem_types,
            mem_refs,
            lambda mt, mr: F.struct(
                F.substring(mt, 1, 1).alias("type"), mr.cast("long").alias("ref")
            ),
        ),
        mem_roles,
        lambda tr, role: F.struct(
            tr["type"].alias("type"), tr["ref"].alias("ref"), unescape(role).alias("role")
        ),
    )
    is_node = obj_type == "n"
    return lines.select(
        obj_type.alias("obj_type"),
        attr("id").cast("long").alias("id"),
        attr("version").cast("int").alias("version"),
        F.when(attr("visible").isNotNull(), attr("visible") == "false").alias("deleted"),
        attr("changeset").cast("int").alias("changeset_id"),
        F.to_timestamp_ntz(attr("timestamp"), F.lit("yyyy-MM-dd'T'HH:mm:ss'Z'")).alias("timestamp"),
        attr("uid").cast("int").alias("uid"),
        unescape(attr("user")).alias("user"),
        F.map_from_arrays(
            F.transform(tag_keys, unescape), F.transform(tag_vals, unescape)
        ).alias("tags"),
        F.when(
            is_node & attr("lat").isNotNull(),
            deg_to_fixed(attr("lat").cast("double")).cast("int"),
        ).alias("lat7"),
        F.when(
            is_node & attr("lon").isNotNull(),
            deg_to_fixed(attr("lon").cast("double")).cast("int"),
        ).alias("lon7"),
        F.when(obj_type == "w", nds).alias("nodes"),
        F.when(obj_type == "r", members).alias("members"),
    )


def osc_wrap(lines: DataFrame, line_col: str = "line") -> DataFrame:
    """OSC sink framing: single <modify> block (osmio's documented
    simplification, osc/mod.rs:109)."""
    spark = lines.sparkSession
    header = spark.createDataFrame(
        [(0, '<?xml version="1.0" encoding="UTF-8"?>'), (1, "<osmChange>"), (2, "<modify>")],
        "ord int, line string",
    )
    footer = spark.createDataFrame(
        [(4, "</modify>"), (5, "</osmChange>")], "ord int, line string"
    )
    body = lines.select(F.lit(3).alias("ord"), F.col(line_col).alias("line"))
    return header.unionByName(body).unionByName(footer)
