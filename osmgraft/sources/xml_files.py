"""File-level OSM XML readers: `.osm` dumps, `.osc` change files, changeset
dumps — with transparent .bz2/.gz (S11, Hadoop-codec analogue done Python-side
because these files are parsed per-file anyway).

Scan model (matches the reference's execution shape): osmio parses XML as a
single-threaded SAX stream per file (xml/mod.rs:379-420 pull reader); the
Spark-native form distributes ACROSS files — one task per file, each task
streaming ``xml.etree.iterparse`` with O(1) memory and emitting Arrow
RecordBatches. A lake of daily diffs / regional extracts parallelizes
naturally; a single planet.osm is a single stream in both engines (the PBF
source is the splittable path, sources/pbf.py).

Fragment-level (DataFrame string column) codecs live in sources/osm_xml.py;
this module is the path for REAL files on disk.
"""

from __future__ import annotations

import bz2
import gzip
import os
from collections.abc import Iterator

_BATCH = 4096

_TYPE_CHAR = {"node": "n", "way": "w", "relation": "r", "n": "n", "w": "w", "r": "r"}


def _open_stream(path: str):
    if path.endswith(".bz2"):
        return bz2.open(path, "rb")
    if path.endswith(".gz"):
        return gzip.open(path, "rb")
    return open(path, "rb")


def _parse_iso(s: str | None) -> int | None:
    """ISO 'YYYY-MM-DDTHH:MM:SSZ' → epoch seconds (osmio TimestampFormat)."""
    if not s:
        return None
    import calendar
    import time

    return calendar.timegm(time.strptime(s, "%Y-%m-%dT%H:%M:%SZ"))


def _obj_from_elem(elem) -> dict:
    a = elem.attrib
    visible = a.get("visible")
    tags = {}
    nodes, members = [], []
    for ch in elem:
        if ch.tag == "tag":
            tags[ch.attrib["k"]] = ch.attrib["v"]
        elif ch.tag == "nd":
            nodes.append(int(ch.attrib["ref"]))
        elif ch.tag == "member":
            members.append(
                {
                    "type": _TYPE_CHAR[ch.attrib["type"]],
                    "ref": int(ch.attrib["ref"]),
                    "role": ch.attrib.get("role", ""),
                }
            )
    return {
        "obj_type": _TYPE_CHAR[elem.tag],
        "id": int(a["id"]),
        "version": int(a["version"]) if a.get("version") else None,
        "deleted": (visible == "false") if visible is not None else None,
        "changeset_id": int(a["changeset"]) if a.get("changeset") else None,
        "ts": _parse_iso(a.get("timestamp")),
        "uid": int(a["uid"]) if a.get("uid") else None,
        "user": a.get("user"),
        "tags": tags,
        "lat7": _deg7(a.get("lat")),
        "lon7": _deg7(a.get("lon")),
        "nodes": nodes if elem.tag == "way" else None,
        "members": members if elem.tag == "relation" else None,
    }


def _deg7(s: str | None) -> int | None:
    """Decimal-degree string → fixed-point 1e7 (half-away-from-zero, the
    osmio Lat codec — lib.rs:82-84); string-arithmetic exact, no float."""
    if s is None or s == "":
        return None
    neg = s.startswith("-")
    if neg:
        s = s[1:]
    if "." in s:
        whole, frac = s.split(".", 1)
    else:
        whole, frac = s, ""
    frac = (frac + "0000000")[:7]
    rest = s.split(".", 1)[1][7:] if "." in s and len(s.split(".", 1)[1]) > 7 else ""
    v = int(whole or "0") * 10_000_000 + int(frac or "0")
    if rest and rest[0] >= "5":
        v += 1
    return -v if neg else v


def iter_osm_objs(path: str, ops: bool = False) -> Iterator[dict]:
    """Stream one file's OSM objects. ops=True additionally tracks the OSC
    ``<create>/<modify>/<delete>`` section each object sits in (osmio
    osc/mod.rs:31-91) as an ``op`` field."""
    from xml.etree.ElementTree import iterparse

    section = None
    with _open_stream(path) as fh:
        for event, elem in iterparse(fh, events=("start", "end")):
            if event == "start":
                if elem.tag in ("create", "modify", "delete"):
                    section = elem.tag
                continue
            if elem.tag in ("node", "way", "relation"):
                o = _obj_from_elem(elem)
                if ops:
                    o["op"] = section or "create"
                    if section == "delete":
                        o["deleted"] = True
                yield o
                elem.clear()
            elif elem.tag in ("create", "modify", "delete"):
                section = None
                elem.clear()


def _objs_schema_arrow(ops: bool):
    import pyarrow as pa

    fields = [
        ("obj_type", pa.string()),
        ("id", pa.int64()),
        ("version", pa.int32()),
        ("deleted", pa.bool_()),
        ("changeset_id", pa.int32()),
        ("ts", pa.int64()),
        ("uid", pa.int32()),
        ("user", pa.string()),
        ("tags", pa.map_(pa.string(), pa.string())),
        ("lat7", pa.int32()),
        ("lon7", pa.int32()),
        ("nodes", pa.list_(pa.int64())),
        (
            "members",
            pa.list_(
                pa.struct([("type", pa.string()), ("ref", pa.int64()), ("role", pa.string())])
            ),
        ),
    ]
    if ops:
        fields.append(("op", pa.string()))
    return pa.schema(fields)


_OBJ_DDL = (
    "obj_type string, id long, version int, deleted boolean, changeset_id int, "
    "ts long, uid int, user string, tags map<string,string>, lat7 int, lon7 int, "
    "nodes array<long>, members array<struct<type:string,ref:long,role:string>>"
)


def _paths_df(spark, path: str, exts: tuple[str, ...]):
    import glob as _glob

    if os.path.isdir(path):
        paths = sorted(
            p
            for p in _glob.glob(os.path.join(path, "*"))
            if p.endswith(exts) or any(p.endswith(e + c) for e in exts for c in (".bz2", ".gz"))
        )
    else:
        paths = [path]
    # one task per file: the file is the split unit for stream-parsed XML
    return spark.createDataFrame([(p,) for p in paths], "path string").repartition(
        max(len(paths), 1)
    )


def _scan(spark, path: str, exts: tuple[str, ...], ops: bool):
    import pyarrow as pa

    schema = _objs_schema_arrow(ops)

    def kernel(batches) -> Iterator["pa.RecordBatch"]:
        for rb in batches:
            for p in rb.column(0).to_pylist():
                buf: list[dict] = []
                for o in iter_osm_objs(p, ops=ops):
                    buf.append(o)
                    if len(buf) >= _BATCH:
                        yield _to_batch(buf, schema)
                        buf = []
                if buf:
                    yield _to_batch(buf, schema)

    ddl = _OBJ_DDL + (", op string" if ops else "")
    from pyspark.sql import functions as F

    from osmgraft.functions.timestamps import ntz_from_epoch

    raw = _paths_df(spark, path, exts).mapInArrow(kernel, schema=ddl)
    cols = [
        "obj_type",
        "id",
        "version",
        "deleted",
        "changeset_id",
        ntz_from_epoch(F.col("ts")).alias("timestamp"),
        "uid",
        "user",
        "tags",
        "lat7",
        "lon7",
        "nodes",
        "members",
    ]
    if ops:
        cols.append("op")
    return raw.select(*cols)


def _to_batch(objs: list[dict], schema) -> "pa.RecordBatch":
    import pyarrow as pa

    return pa.RecordBatch.from_pydict(
        {f: [o.get(f) for o in objs] for f in schema.names}, schema=schema
    )


def read_xml(spark, path: str):
    """`.osm`(.bz2/.gz) file or directory → OSM_OBJ_SCHEMA DataFrame (S10,
    xml/mod.rs:279-357 — all three element types with nd/member children)."""
    return _scan(spark, path, (".osm", ".xml"), ops=False)


def read_osc(spark, path: str):
    """`.osc`(.bz2/.gz) change file(s) → OSM_OBJ_SCHEMA + ``op`` column in
    ('create','modify','delete') (S12, osc/mod.rs:31-91). Objects inside a
    ``<delete>`` section are marked deleted=true like the reference does."""
    return _scan(spark, path, (".osc",), ops=True)


# --- changeset dumps (osmio changesets.rs:82-309) ---------------------------


def iter_changesets(path: str) -> Iterator[dict]:
    from xml.etree.ElementTree import iterparse

    with _open_stream(path) as fh:
        for event, elem in iterparse(fh, events=("end",)):
            if elem.tag != "changeset":
                continue
            a = elem.attrib
            tags = {c.attrib["k"]: c.attrib["v"] for c in elem if c.tag == "tag"}
            yield {
                "id": int(a["id"]),
                "created": _parse_iso(a.get("created_at")),
                "closed": _parse_iso(a.get("closed_at")),
                "open": a.get("open") == "true" if a.get("open") else None,
                "uid": int(a["uid"]) if a.get("uid") else None,
                "user": a.get("user"),
                "tags": tags,
                "num_changes": int(a["num_changes"]) if a.get("num_changes") else None,
                "comments_count": int(a["comments_count"]) if a.get("comments_count") else None,
            }
            elem.clear()


def read_changesets(spark, path: str):
    """Changeset-dump XML (`changesets-latest.osm`(.bz2)) → CHANGESET_SCHEMA
    (S13, changesets.rs:82-309: id/created_at/closed_at/open/num_changes/
    comments_count attrs + tag children)."""
    import pyarrow as pa

    schema = pa.schema(
        [
            ("id", pa.int32()),
            ("created", pa.int64()),
            ("closed", pa.int64()),
            ("open", pa.bool_()),
            ("uid", pa.int64()),
            ("user", pa.string()),
            ("tags", pa.map_(pa.string(), pa.string())),
            ("num_changes", pa.int64()),
            ("comments_count", pa.int64()),
        ]
    )

    def kernel(batches) -> Iterator["pa.RecordBatch"]:
        for rb in batches:
            for p in rb.column(0).to_pylist():
                buf: list[dict] = []
                for c in iter_changesets(p):
                    buf.append(c)
                    if len(buf) >= _BATCH:
                        yield _to_batch(buf, schema)
                        buf = []
                if buf:
                    yield _to_batch(buf, schema)

    from pyspark.sql import functions as F

    from osmgraft.functions.timestamps import ntz_from_epoch

    raw = _paths_df(spark, path, (".osm", ".xml")).mapInArrow(
        kernel,
        schema=(
            "id int, created long, closed long, open boolean, uid long, user string, "
            "tags map<string,string>, num_changes long, comments_count long"
        ),
    )
    return raw.select(
        "id",
        ntz_from_epoch(F.col("created")).alias("created"),
        ntz_from_epoch(F.col("closed")).alias("closed"),
        "open",
        "uid",
        "user",
        "tags",
        "num_changes",
        "comments_count",
    )


# --- driver-side fixture writers (bounded; format parity, not bulk export) --


def _xml_escape_py(s: str) -> str:
    return (
        s.replace("&", "&amp;")
        .replace('"', "&quot;")
        .replace("'", "&apos;")
        .replace("<", "&lt;")
        .replace(">", "&gt;")
    )


def _iso_py(ts: int) -> str:
    import datetime as dt

    return dt.datetime.fromtimestamp(ts, dt.timezone.utc).strftime("%Y-%m-%dT%H:%M:%SZ")


def _obj_xml_py(o: dict) -> str:
    t = {"n": "node", "w": "way", "r": "relation"}[o.get("obj_type", "n")]
    parts = [f'<{t} id="{o["id"]}"']
    if o.get("deleted") is not None:
        parts.append(f' visible="{"false" if o["deleted"] else "true"}"')
    if o.get("version") is not None:
        parts.append(f' version="{o["version"]}"')
    if o.get("user") is not None:
        parts.append(f' user="{_xml_escape_py(o["user"])}"')
    if o.get("uid") is not None:
        parts.append(f' uid="{o["uid"]}"')
    if o.get("changeset_id") is not None:
        parts.append(f' changeset="{o["changeset_id"]}"')
    if o.get("ts") is not None:
        parts.append(f' timestamp="{_iso_py(o["ts"])}"')
    if t == "node" and o.get("lat7") is not None:
        parts.append(f' lat="{o["lat7"] / 1e7:.7f}" lon="{o["lon7"] / 1e7:.7f}"')
    children = []
    for r in o.get("nodes") or []:
        children.append(f'\t<nd ref="{r}"/>')
    for m in o.get("members") or []:
        w = {"n": "node", "w": "way", "r": "relation"}[m["type"]]
        children.append(
            f'\t<member type="{w}" ref="{m["ref"]}" role="{_xml_escape_py(m["role"])}"/>'
        )
    for k, v in (o.get("tags") or {}).items():
        children.append(f'\t<tag k="{_xml_escape_py(k)}" v="{_xml_escape_py(v)}"/>')
    if not children:
        return "".join(parts) + " />"
    return "".join(parts) + ">\n" + "\n".join(children) + f"\n</{t}>"


def write_xml_file(objs: list[dict], path: str) -> None:
    with open(path, "w", encoding="utf-8") as fh:
        fh.write('<?xml version="1.0" encoding="UTF-8"?>\n<osm version="0.6">\n')
        for o in objs:
            fh.write(_obj_xml_py(o) + "\n")
        fh.write("</osm>\n")


def write_osc_file(sections: dict[str, list[dict]], path: str) -> None:
    """sections: op → objects (op ∈ create/modify/delete)."""
    with open(path, "w", encoding="utf-8") as fh:
        fh.write('<?xml version="1.0" encoding="UTF-8"?>\n<osmChange version="0.6">\n')
        for op in ("create", "modify", "delete"):
            if sections.get(op):
                fh.write(f"<{op}>\n")
                for o in sections[op]:
                    fh.write(_obj_xml_py(o) + "\n")
                fh.write(f"</{op}>\n")
        fh.write("</osmChange>\n")


def write_changesets_file(rows: list[dict], path: str) -> None:
    with open(path, "w", encoding="utf-8") as fh:
        fh.write('<?xml version="1.0" encoding="UTF-8"?>\n<osm version="0.6">\n')
        for c in rows:
            parts = [f'<changeset id="{c["id"]}"']
            if c.get("created") is not None:
                parts.append(f' created_at="{_iso_py(c["created"])}"')
            if c.get("closed") is not None:
                parts.append(f' closed_at="{_iso_py(c["closed"])}"')
            if c.get("open") is not None:
                parts.append(f' open="{"true" if c["open"] else "false"}"')
            if c.get("uid") is not None:
                parts.append(f' uid="{c["uid"]}"')
            if c.get("user") is not None:
                parts.append(f' user="{_xml_escape_py(c["user"])}"')
            if c.get("num_changes") is not None:
                parts.append(f' num_changes="{c["num_changes"]}"')
            if c.get("comments_count") is not None:
                parts.append(f' comments_count="{c["comments_count"]}"')
            tags = c.get("tags") or {}
            if not tags:
                fh.write("".join(parts) + "/>\n")
            else:
                fh.write("".join(parts) + ">\n")
                for k, v in tags.items():
                    fh.write(f'\t<tag k="{_xml_escape_py(k)}" v="{_xml_escape_py(v)}"/>\n')
                fh.write("</changeset>\n")
        fh.write("</osm>\n")
