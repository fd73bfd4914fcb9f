"""OPL (object-per-line) codec (osmio opl/mod.rs — dead in the reference
crate, lib.rs:51, but part of its format surface; we implement it live).

Line form for nodes (opl/mod.rs:196-260):
    n<id> v<version> d<V|D> c<changeset> t<iso> i<uid> u<user> T<k=v,...> x<lon> y<lat>
Escaping: characters outside [0-9a-zA-Z.;,:_#-] become %XXXX% (lowercase hex
codepoint, opl/mod.rs:87-122). Tags join as k=v pairs with ','.

Encode is pure Column expressions; decode is regexp/split projections — both
stay JVM-side. The DuckDB twin of the encoder makes opl_encode an
oracle-checked query.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SAFE = "0-9a-zA-Z.:_#-"  # safe-set for %-escaping (',' '=' ' ' etc. escape)


def _cp_hex(ch: Column) -> Column:
    """Lowercase hex of a char's full Unicode codepoint, min-width 4.
    lpad alone would TRUNCATE 5-digit astral codepoints (e.g. U+1F600)."""
    h = F.lower(F.hex(F.ascii(ch)))
    return F.when(F.length(h) < 4, F.lpad(h, 4, "0")).otherwise(h)


def opl_escape(col: Column) -> Column:
    """%XXXX%-escape every char outside the safe set (hex of the full
    codepoint, lowercase, zero-padded to width ≥4). DECODE-compatible with
    the reference (both parsers accept any %hex% run) but NOT byte-identical
    to its writer: the reference escapes only {space, newline, ',', '=', '@'}
    as uppercase unpadded %XX% (opl/mod.rs:87-122), while this writer escapes
    every char outside [0-9a-zA-Z.:_#-]. Byte-level golden comparison against
    reference OPL output would fail; roundtrip through either parser agrees.
    Per-character JVM lambda."""
    chars = F.split(col, "")
    esc = F.transform(
        chars,
        lambda ch: F.when(ch.rlike(f"^[{_SAFE}]$"), ch).otherwise(
            F.concat(F.lit("%"), _cp_hex(ch), F.lit("%"))
        ),
    )
    # split('', '') yields [''] — guard or the empty string escapes to %0000%
    return F.when(col == "", F.lit("")).otherwise(F.array_join(esc, ""))


def opl_unescape(col: Column) -> Column:
    """Inverse of :func:`opl_escape`: %HEX% runs → characters. Spark's
    char()/chr() reduce modulo 256, so codepoints are rebuilt as UTF-16BE
    bytes instead — BMP directly, astral via an arithmetic surrogate pair
    (both JVM expressions, no Python)."""
    parts = F.split(col, "%")

    def cp_to_str(p: Column) -> Column:
        cp = F.conv(p, 16, 10).cast("long")
        bmp = F.decode(F.unhex(F.lpad(F.hex(cp), 4, "0")), "UTF-16BE")
        hi = F.shiftright(cp - F.lit(0x10000), 10) + F.lit(0xD800)
        lo = (cp - F.lit(0x10000)).bitwiseAND(F.lit(0x3FF)) + F.lit(0xDC00)
        pair = F.decode(
            F.unhex(F.concat(F.lpad(F.hex(hi), 4, "0"), F.lpad(F.hex(lo), 4, "0"))),
            "UTF-16BE",
        )
        return F.when(cp < 0x10000, bmp).otherwise(pair)

    return F.array_join(
        F.transform(
            parts,
            lambda p, i: F.when(i % 2 == 1, cp_to_str(p)).otherwise(p),
        ),
        "",
    )


def sql_opl_escape(expr: str) -> str:
    """DuckDB twin (ascii() = codepoint in duckdb too); same empty-string
    guard as the engine side."""
    # min-width-4 pad WITHOUT truncating 5-digit astral codepoints (matches
    # the engine-side _cp_hex)
    pad = (
        "CASE WHEN length(lower(hex(ascii(ch)))) < 4 "
        "THEN lpad(lower(hex(ascii(ch))), 4, '0') ELSE lower(hex(ascii(ch))) END"
    )
    return (
        f"CASE WHEN {expr} = '' THEN '' ELSE "
        f"list_aggregate(list_transform(string_split_regex({expr}, ''), "
        f"ch -> CASE WHEN regexp_matches(ch, '^[{_SAFE}]$') THEN ch "
        f"ELSE '%' || {pad} || '%' END), 'string_agg', '') END"
    )


def _fixed7_str(col: Column) -> Column:
    from osmgraft.sources.osm_xml import _fixed7

    return _fixed7(col)


def node_to_opl(nodes: DataFrame) -> DataFrame:
    """OSM_NODE_SCHEMA → (id, line)."""
    tags_part = F.array_join(
        F.transform(
            F.map_entries(F.coalesce(F.col("tags"), F.map_from_arrays(F.array(), F.array()))),
            lambda e: F.concat(opl_escape(e["key"]), F.lit("="), opl_escape(e["value"])),
        ),
        ",",
    )
    line = F.concat(
        F.lit("n"), F.col("id").cast("string"),
        F.lit(" v"), F.coalesce(F.col("version").cast("string"), F.lit("")),
        F.lit(" d"), F.when(F.coalesce(F.col("deleted"), F.lit(False)), F.lit("D")).otherwise(F.lit("V")),
        F.lit(" c"), F.coalesce(F.col("changeset_id").cast("string"), F.lit("")),
        F.lit(" t"), F.coalesce(F.date_format("timestamp", "yyyy-MM-dd'T'HH:mm:ss'Z'"), F.lit("")),
        F.lit(" i"), F.coalesce(F.col("uid").cast("string"), F.lit("")),
        F.lit(" u"), F.coalesce(opl_escape(F.col("user")), F.lit("")),
        F.lit(" T"), tags_part,
        F.lit(" x"), F.when(F.col("lon7").isNotNull(), _fixed7_str(F.col("lon7"))).otherwise(F.lit("")),
        F.lit(" y"), F.when(F.col("lat7").isNotNull(), _fixed7_str(F.col("lat7"))).otherwise(F.lit("")),
    )
    return nodes.select(F.col("id"), line.alias("line"))


def parse_node_opl(lines: DataFrame, line_col: str = "line") -> DataFrame:
    """Inverse: split on single spaces, 1-char key prefix (opl/mod.rs:176-193)."""
    c = F.col(line_col)

    def field(prefix):
        return F.nullif(F.regexp_extract(c, f" {prefix}([^ ]*)", 1), F.lit(""))

    unescape = opl_unescape

    from osmgraft.functions.coords import deg_to_fixed

    tags_kv = F.when(
        field("T").isNotNull(),
        F.map_from_arrays(
            F.transform(F.split(field("T"), ","), lambda kv: unescape(F.split(kv, "=")[0])),
            F.transform(F.split(field("T"), ","), lambda kv: unescape(F.split(kv, "=")[1])),
        ),
    ).otherwise(F.map_from_arrays(F.array(), F.array()))
    return lines.select(
        F.regexp_extract(c, r"^n(\d+)", 1).cast("long").alias("id"),
        field("v").cast("int").alias("version"),
        (field("d") == "D").alias("deleted"),
        field("c").cast("int").alias("changeset_id"),
        F.to_timestamp_ntz(field("t"), F.lit("yyyy-MM-dd'T'HH:mm:ss'Z'")).alias("timestamp"),
        field("i").cast("int").alias("uid"),
        unescape(field("u")).alias("user"),
        tags_kv.alias("tags"),
        F.when(field("y").isNotNull(), deg_to_fixed(field("y").cast("double")).cast("int")).alias("lat7"),
        F.when(field("x").isNotNull(), deg_to_fixed(field("x").cast("double")).cast("int")).alias("lon7"),
    )


def obj_to_opl(objs: DataFrame) -> DataFrame:
    """OSM_OBJ_SCHEMA → (obj_type, id, line): generalizes node_to_opl to ways
    (``N`` field, each ref 'n'-prefixed, comma-joined — opl/mod.rs:154-157)
    and relations (``M`` field, ``<t><id>@<role>`` — opl/mod.rs:172-174).
    Node lines are byte-identical to node_to_opl. Pure Column expressions."""
    t = F.col("obj_type")
    tags_part = F.array_join(
        F.transform(
            F.map_entries(F.coalesce(F.col("tags"), F.map_from_arrays(F.array(), F.array()))),
            lambda e: F.concat(opl_escape(e["key"]), F.lit("="), opl_escape(e["value"])),
        ),
        ",",
    )
    meta = F.concat(
        t, F.col("id").cast("string"),
        F.lit(" v"), F.coalesce(F.col("version").cast("string"), F.lit("")),
        F.lit(" d"), F.when(F.coalesce(F.col("deleted"), F.lit(False)), F.lit("D")).otherwise(F.lit("V")),
        F.lit(" c"), F.coalesce(F.col("changeset_id").cast("string"), F.lit("")),
        F.lit(" t"), F.coalesce(F.date_format("timestamp", "yyyy-MM-dd'T'HH:mm:ss'Z'"), F.lit("")),
        F.lit(" i"), F.coalesce(F.col("uid").cast("string"), F.lit("")),
        F.lit(" u"), F.coalesce(opl_escape(F.col("user")), F.lit("")),
        F.lit(" T"), tags_part,
    )
    node_tail = F.concat(
        F.lit(" x"),
        F.when(F.col("lon7").isNotNull(), _fixed7_str(F.col("lon7"))).otherwise(F.lit("")),
        F.lit(" y"),
        F.when(F.col("lat7").isNotNull(), _fixed7_str(F.col("lat7"))).otherwise(F.lit("")),
    )
    way_tail = F.concat(
        F.lit(" N"),
        F.array_join(
            F.transform(
                F.coalesce(F.col("nodes"), F.array().cast("array<long>")),
                lambda r: F.concat(F.lit("n"), r.cast("string")),
            ),
            ",",
        ),
    )
    rel_tail = F.concat(
        F.lit(" M"),
        F.array_join(
            F.transform(
                F.coalesce(
                    F.col("members"),
                    F.array().cast("array<struct<type:string,ref:long,role:string>>"),
                ),
                lambda m: F.concat(
                    m["type"], m["ref"].cast("string"), F.lit("@"), opl_escape(m["role"])
                ),
            ),
            ",",
        ),
    )
    line = F.concat(
        meta,
        F.when(t == "n", node_tail).when(t == "w", way_tail).otherwise(rel_tail),
    )
    return objs.select("obj_type", F.col("id"), line.alias("line"))


def parse_obj_opl(lines: DataFrame, line_col: str = "line") -> DataFrame:
    """Inverse of obj_to_opl for the full object stream (opl/mod.rs
    decode_line:196-260): 1-char key prefixes, N/M/x/y tails by type."""
    c = F.col(line_col)

    def field(prefix):
        return F.nullif(F.regexp_extract(c, f" {prefix}([^ ]*)", 1), F.lit(""))

    unescape = opl_unescape

    from osmgraft.functions.coords import deg_to_fixed

    obj_type = F.substring(c, 1, 1)
    tags_kv = F.when(
        field("T").isNotNull(),
        F.map_from_arrays(
            F.transform(F.split(field("T"), ","), lambda kv: unescape(F.split(kv, "=")[0])),
            F.transform(F.split(field("T"), ","), lambda kv: unescape(F.split(kv, "=")[1])),
        ),
    ).otherwise(F.map_from_arrays(F.array(), F.array()))
    nds = F.when(
        (obj_type == "w") & field("N").isNotNull(),
        F.transform(
            F.split(field("N"), ","),
            lambda x: F.regexp_extract(x, r"n(\d+)", 1).cast("long"),
        ),
    ).otherwise(F.when(obj_type == "w", F.array().cast("array<long>")))
    members = F.when(
        (obj_type == "r") & field("M").isNotNull(),
        F.transform(
            F.split(field("M"), ","),
            lambda x: F.struct(
                F.substring(x, 1, 1).alias("type"),
                F.regexp_extract(x, r"^.(\d+)@", 1).cast("long").alias("ref"),
                unescape(F.regexp_extract(x, r"@(.*)$", 1)).alias("role"),
            ),
        ),
    ).otherwise(
        F.when(obj_type == "r", F.array().cast("array<struct<type:string,ref:long,role:string>>"))
    )
    return lines.select(
        obj_type.alias("obj_type"),
        F.regexp_extract(c, r"^[nwr](\d+)", 1).cast("long").alias("id"),
        field("v").cast("int").alias("version"),
        (field("d") == "D").alias("deleted"),
        field("c").cast("int").alias("changeset_id"),
        F.to_timestamp_ntz(field("t"), F.lit("yyyy-MM-dd'T'HH:mm:ss'Z'")).alias("timestamp"),
        field("i").cast("int").alias("uid"),
        unescape(field("u")).alias("user"),
        tags_kv.alias("tags"),
        F.when(
            (obj_type == "n") & field("y").isNotNull(),
            deg_to_fixed(field("y").cast("double")).cast("int"),
        ).alias("lat7"),
        F.when(
            (obj_type == "n") & field("x").isNotNull(),
            deg_to_fixed(field("x").cast("double")).cast("int"),
        ).alias("lon7"),
        nds.alias("nodes"),
        members.alias("members"),
    )
