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
        F.to_timestamp(attr("timestamp"), "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("timestamp"),
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
