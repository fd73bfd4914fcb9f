"""Mapbox Vector Tile (MVT 2.1) point-layer codec — pure python protobuf.

Public knowledge only: the MVT 2.1 specification (Mapbox, CC-BY) and the
protobuf wire format (the same varint/length-delimited framing this repo
already hand-decodes for .osm.pbf — sources/pbf.py). Scope: POINT layers
(counts per cell become point features at cell centers), LINESTRING
layers (clipped way segments from operators/clip.py), and POLYGON layers
(contour rings from operators/contour.py), all with integer
attributes — the tile-server products of the pipeline. The decoders
are generic over the wire format (parse any spec-conformant layer, not
just this encoder's output), so roundtrip tests exercise real parsing,
not a memorized inverse.

Wire shapes used (spec §4):
  Tile: repeated Layer = field 3 (len-delimited)
  Layer: name=1 (string), Feature=2, keys=3 (string), values=4 (Value),
         extent=5 (varint), version=15 (varint, =2)
  Feature: id=1 (varint), tags=2 (packed varint, alternating key/value
           indexes), type=3 (varint, 1=POINT), geometry=4 (packed varint
           commands: MoveTo=(count<<3)|1 then zigzag dx,dy pairs; the
           cursor starts at (0,0) per feature)
  Value: int_value=4 (varint int64)
"""

from __future__ import annotations


def _varint(v: int) -> bytes:
    if v < 0:
        v &= (1 << 64) - 1  # protobuf negative varints are 10-byte two's complement
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _unzigzag(z: int) -> int:
    return (z >> 1) ^ -(z & 1)


def _field(num: int, wire: int) -> bytes:
    return _varint((num << 3) | wire)


def _len_delim(num: int, payload: bytes) -> bytes:
    return _field(num, 2) + _varint(len(payload)) + payload


def encode_point_layer(
    name: str,
    points: list[tuple[int, int, dict[str, int]]],
    extent: int = 4096,
) -> bytes:
    """One MVT Tile containing one point layer.

    points: (x, y, attrs) with 0 <= x, y < extent and int attr values.
    Key/value tables are deduplicated in first-seen order (spec §4.4);
    feature ids are the point's position (stable, deterministic)."""
    keys: list[str] = []
    vals: list[int] = []
    kidx: dict[str, int] = {}
    vidx: dict[int, int] = {}
    feats = bytearray()
    for fid, (x, y, attrs) in enumerate(points):
        if not (0 <= x < extent and 0 <= y < extent):
            raise ValueError(f"point ({x}, {y}) outside extent {extent}")
        tags = bytearray()
        for k, v in attrs.items():
            if k not in kidx:
                kidx[k] = len(keys)
                keys.append(k)
            if v not in vidx:
                vidx[v] = len(vals)
                vals.append(int(v))
            tags += _varint(kidx[k]) + _varint(vidx[v])
        geom = _varint((1 << 3) | 1) + _varint(_zigzag(x)) + _varint(_zigzag(y))
        body = (
            _field(1, 0) + _varint(fid)
            + _len_delim(2, bytes(tags))
            + _field(3, 0) + _varint(1)  # POINT
            + _len_delim(4, geom)
        )
        feats += _len_delim(2, body)
    layer = bytearray()
    layer += _len_delim(1, name.encode("utf-8"))
    layer += feats
    for k in keys:
        layer += _len_delim(3, k.encode("utf-8"))
    for v in vals:
        layer += _len_delim(4, _field(4, 0) + _varint(v))  # Value{int_value}
    layer += _field(5, 0) + _varint(extent)
    layer += _field(15, 0) + _varint(2)
    return _len_delim(3, bytes(layer))


def encode_line_layer(
    name: str,
    lines: list[tuple[list[tuple[int, int]], dict[str, int]]],
    extent: int = 4096,
) -> bytes:
    """One MVT Tile containing one LINESTRING layer.

    lines: (points, attrs) with >= 2 points each; consecutive duplicate
    points are rejected (the spec forbids zero-length LineTo) — callers
    drop degenerate clipped segments first. Coordinates may lie on or
    beyond the extent boundary (spec-permitted buffer geometry); key/value
    tables dedupe in first-seen order, feature ids are positional."""
    keys: list[str] = []
    vals: list[int] = []
    kidx: dict[str, int] = {}
    vidx: dict[int, int] = {}
    feats = bytearray()
    for fid, (pts, attrs) in enumerate(lines):
        if len(pts) < 2:
            raise ValueError(f"linestring {fid} has < 2 points")
        tags = bytearray()
        for k, v in attrs.items():
            if k not in kidx:
                kidx[k] = len(keys)
                keys.append(k)
            if v not in vidx:
                vidx[v] = len(vals)
                vals.append(int(v))
            tags += _varint(kidx[k]) + _varint(vidx[v])
        geom = bytearray()
        geom += _varint((1 << 3) | 1)  # MoveTo x1
        geom += _varint(_zigzag(pts[0][0])) + _varint(_zigzag(pts[0][1]))
        geom += _varint(((len(pts) - 1) << 3) | 2)  # LineTo x(n-1)
        cx, cy = pts[0]
        for x, y in pts[1:]:
            if x == cx and y == cy:
                raise ValueError("zero-length LineTo (spec §4.3.3.3)")
            geom += _varint(_zigzag(x - cx)) + _varint(_zigzag(y - cy))
            cx, cy = x, y
        body = (
            _field(1, 0) + _varint(fid)
            + _len_delim(2, bytes(tags))
            + _field(3, 0) + _varint(2)  # LINESTRING
            + _len_delim(4, bytes(geom))
        )
        feats += _len_delim(2, body)
    layer = bytearray()
    layer += _len_delim(1, name.encode("utf-8"))
    layer += feats
    for k in keys:
        layer += _len_delim(3, k.encode("utf-8"))
    for v in vals:
        layer += _len_delim(4, _field(4, 0) + _varint(v))
    layer += _field(5, 0) + _varint(extent)
    layer += _field(15, 0) + _varint(2)
    return _len_delim(3, bytes(layer))


def encode_line_layer_fast(
    name: str,
    way_id,
    seg_idx,
    px0,
    py0,
    px1,
    py1,
    extent: int = 4096,
) -> bytes:
    """Specialized 2-point-linestring encoder over parallel int sequences —
    BIT-IDENTICAL output to ``encode_line_layer`` with
    lines=[([(px0,py0),(px1,py1)], {"way_id": w, "seg_idx": s}), …] (pinned
    by test), but ~20× faster: no per-feature dict/struct objects, one local
    bytearray, attribute keys fixed to the (way_id, seg_idx) schema. The
    hot path of the tile-server LINE sink (operators/raster)."""
    vals: list[int] = []
    vidx: dict[int, int] = {}
    feats = bytearray()
    varint = _varint
    for fid in range(len(way_id)):
        w, s = int(way_id[fid]), int(seg_idx[fid])
        x0, y0 = int(px0[fid]), int(py0[fid])
        dx, dy = int(px1[fid]) - x0, int(py1[fid]) - y0
        if dx == 0 and dy == 0:
            raise ValueError("zero-length LineTo (spec §4.3.3.3)")
        wv = vidx.get(w)
        if wv is None:
            wv = vidx[w] = len(vals)
            vals.append(w)
        sv = vidx.get(s)
        if sv is None:
            sv = vidx[s] = len(vals)
            vals.append(s)
        tags = b"\x00" + varint(wv) + b"\x01" + varint(sv)
        geom = (
            b"\x09"
            + varint(_zigzag(x0))
            + varint(_zigzag(y0))
            + b"\x0a"
            + varint(_zigzag(dx))
            + varint(_zigzag(dy))
        )
        body = (
            b"\x08" + varint(fid)
            + b"\x12" + varint(len(tags)) + tags
            + b"\x18\x02"
            + b"\x22" + varint(len(geom)) + geom
        )
        feats += b"\x12" + varint(len(body)) + body
    layer = bytearray()
    layer += _len_delim(1, name.encode("utf-8"))
    layer += feats
    if len(way_id):  # the generic encoder emits key strings first-seen only
        layer += _len_delim(3, b"way_id") + _len_delim(3, b"seg_idx")
    for v in vals:
        layer += _len_delim(4, b"\x20" + varint(v))
    layer += b"\x28" + varint(extent)
    layer += b"\x78\x02"
    return _len_delim(3, bytes(layer))


def encode_polygon_layer(
    name: str,
    polys: list[tuple[list[list[tuple[int, int]]], dict[str, int]]],
    extent: int = 4096,
) -> bytes:
    """One MVT Tile containing one POLYGON layer.

    polys: (rings, attrs) per feature; each ring is a vertex list WITHOUT
    the closing point (ClosePath implies it, spec §4.3.3.3).  Ring order is
    the caller's exterior-then-interiors sequence; the FIRST ring must have
    a positive surveyor sum Σ(x_i·y_{i+1} − x_{i+1}·y_i) in tile coords
    (y down) — the spec's exterior-ring condition — and that is validated
    here so a wrong orientation fails at encode time, not in a renderer.
    Rings need ≥ 3 distinct vertices; zero-length LineTo is rejected.
    Coordinates may lie beyond the extent (spec-permitted buffer geometry).
    Key/value tables dedupe in first-seen order, feature ids positional."""
    keys: list[str] = []
    vals: list[int] = []
    kidx: dict[str, int] = {}
    vidx: dict[int, int] = {}
    feats = bytearray()
    for fid, (rings, attrs) in enumerate(polys):
        tags = bytearray()
        for k, v in attrs.items():
            if k not in kidx:
                kidx[k] = len(keys)
                keys.append(k)
            if v not in vidx:
                vidx[v] = len(vals)
                vals.append(int(v))
            tags += _varint(kidx[k]) + _varint(vidx[v])
        geom = bytearray()
        cx, cy = 0, 0  # the cursor persists ACROSS rings (spec §4.3.4.4)
        for ri, pts in enumerate(rings):
            if len(pts) < 3:
                raise ValueError(f"polygon {fid} ring {ri} has < 3 points")
            area2 = sum(
                a[0] * b[1] - b[0] * a[1]
                for a, b in zip(pts, pts[1:] + pts[:1])
            )
            if ri == 0 and area2 <= 0:
                raise ValueError(
                    f"polygon {fid}: first ring must be exterior "
                    f"(positive surveyor sum, got {area2})"
                )
            geom += _varint((1 << 3) | 1)  # MoveTo x1
            geom += _varint(_zigzag(pts[0][0] - cx)) + _varint(_zigzag(pts[0][1] - cy))
            geom += _varint(((len(pts) - 1) << 3) | 2)  # LineTo x(n-1)
            cx, cy = pts[0]
            for x, y in pts[1:]:
                if x == cx and y == cy:
                    raise ValueError("zero-length LineTo (spec §4.3.3.3)")
                geom += _varint(_zigzag(x - cx)) + _varint(_zigzag(y - cy))
                cx, cy = x, y
            geom += _varint((1 << 3) | 7)  # ClosePath x1
        body = (
            _field(1, 0) + _varint(fid)
            + _len_delim(2, bytes(tags))
            + _field(3, 0) + _varint(3)  # POLYGON
            + _len_delim(4, bytes(geom))
        )
        feats += _len_delim(2, body)
    layer = bytearray()
    layer += _len_delim(1, name.encode("utf-8"))
    layer += feats
    for k in keys:
        layer += _len_delim(3, k.encode("utf-8"))
    for v in vals:
        layer += _len_delim(4, _field(4, 0) + _varint(v))
    layer += _field(5, 0) + _varint(extent)
    layer += _field(15, 0) + _varint(2)
    return _len_delim(3, bytes(layer))


def decode_polygon_layers(
    data: bytes,
) -> dict[str, tuple[int, list[tuple[list[list[tuple[int, int]]], dict[str, int]]]]]:
    """Tile bytes → {layer name: (extent, [(rings, attrs), …])}.

    Generic parse of POLYGON features: each MoveTo/LineTo/ClosePath run is
    one ring (closing vertex NOT materialized — the inverse of
    encode_polygon_layer); rejects non-POLYGON types, missing ClosePath,
    and malformed command streams."""
    out: dict[str, tuple[int, list]] = {}
    for num, wire, layer_buf in _fields(data):
        if num != 3:
            continue
        name, extent, version = "", 4096, None
        keys: list[str] = []
        vals: list[int] = []
        raw_feats: list[bytes] = []
        for fn, fw, fv in _fields(layer_buf):
            if fn == 1:
                name = fv.decode("utf-8")
            elif fn == 2:
                raw_feats.append(fv)
            elif fn == 3:
                keys.append(fv.decode("utf-8"))
            elif fn == 4:
                iv = None
                for vn, vw, vv in _fields(fv):
                    if vn == 4:
                        iv = vv if vw == 0 else None
                if iv is None:
                    raise ValueError("only int_value Values supported")
                vals.append(iv)
            elif fn == 5:
                extent = fv
            elif fn == 15:
                version = fv
        if version != 2:
            raise ValueError(f"unsupported MVT version {version}")
        feats: list[tuple[list[list[tuple[int, int]]], dict[str, int]]] = []
        for fbuf in raw_feats:
            gtype, geom, tags = None, b"", b""
            for fn, fw, fv in _fields(fbuf):
                if fn == 3:
                    gtype = fv
                elif fn == 4:
                    geom = fv
                elif fn == 2:
                    tags = fv
            if gtype != 3:
                raise ValueError(f"not a POLYGON feature: type {gtype}")
            attrs: dict[str, int] = {}
            i = 0
            while i < len(tags):
                ki, i = _read_varint(tags, i)
                vi, i = _read_varint(tags, i)
                attrs[keys[ki]] = int(vals[vi])
            i, cx, cy = 0, 0, 0
            rings: list[list[tuple[int, int]]] = []
            while i < len(geom):
                cmd, i = _read_varint(geom, i)
                if cmd & 7 != 1 or cmd >> 3 != 1:
                    raise ValueError("polygon ring must start with MoveTo x1")
                zx, i = _read_varint(geom, i)
                zy, i = _read_varint(geom, i)
                cx += _unzigzag(zx)
                cy += _unzigzag(zy)
                pts = [(cx, cy)]
                cmd, i = _read_varint(geom, i)
                if cmd & 7 != 2 or cmd >> 3 < 2:
                    raise ValueError("MoveTo must be followed by LineTo x(n>=2)")
                for _ in range(cmd >> 3):
                    zx, i = _read_varint(geom, i)
                    zy, i = _read_varint(geom, i)
                    cx += _unzigzag(zx)
                    cy += _unzigzag(zy)
                    pts.append((cx, cy))
                cmd, i = _read_varint(geom, i)
                if cmd & 7 != 7 or cmd >> 3 != 1:
                    raise ValueError("polygon ring must end with ClosePath x1")
                rings.append(pts)
            if not rings:
                raise ValueError("POLYGON feature with no rings")
            feats.append((rings, attrs))
        out[name] = (extent, feats)
    return out


def decode_line_layers(
    data: bytes,
) -> dict[str, tuple[int, list[tuple[list[tuple[int, int]], dict[str, int]]]]]:
    """Tile bytes → {layer name: (extent, [(points, attrs), …])}.

    Generic parse of LINESTRING features (multi-linestrings yield one entry
    per MoveTo/LineTo run, spec-conformant); rejects non-LINESTRING types
    and malformed command streams."""
    out: dict[str, tuple[int, list]] = {}
    for num, wire, layer_buf in _fields(data):
        if num != 3:
            continue
        name, extent, version = "", 4096, None
        keys: list[str] = []
        vals: list[int] = []
        raw_feats: list[bytes] = []
        for fn, fw, fv in _fields(layer_buf):
            if fn == 1:
                name = fv.decode("utf-8")
            elif fn == 2:
                raw_feats.append(fv)
            elif fn == 3:
                keys.append(fv.decode("utf-8"))
            elif fn == 4:
                iv = None
                for vn, vw, vv in _fields(fv):
                    if vn == 4:
                        iv = vv if vw == 0 else None
                if iv is None:
                    raise ValueError("only int_value Values supported")
                vals.append(iv)
            elif fn == 5:
                extent = fv
            elif fn == 15:
                version = fv
        if version != 2:
            raise ValueError(f"unsupported MVT version {version}")
        feats: list[tuple[list[tuple[int, int]], dict[str, int]]] = []
        for fbuf in raw_feats:
            gtype, geom, tags = None, b"", b""
            for fn, fw, fv in _fields(fbuf):
                if fn == 3:
                    gtype = fv
                elif fn == 4:
                    geom = fv
                elif fn == 2:
                    tags = fv
            if gtype != 2:
                raise ValueError(f"not a LINESTRING feature: type {gtype}")
            attrs: dict[str, int] = {}
            i = 0
            while i < len(tags):
                ki, i = _read_varint(tags, i)
                vi, i = _read_varint(tags, i)
                attrs[keys[ki]] = int(vals[vi])
            i, cx, cy = 0, 0, 0
            while i < len(geom):
                cmd, i = _read_varint(geom, i)
                if cmd & 7 != 1 or cmd >> 3 != 1:
                    raise ValueError("linestring must start with MoveTo x1")
                zx, i = _read_varint(geom, i)
                zy, i = _read_varint(geom, i)
                cx += _unzigzag(zx)
                cy += _unzigzag(zy)
                pts = [(cx, cy)]
                cmd, i = _read_varint(geom, i)
                if cmd & 7 != 2 or cmd >> 3 < 1:
                    raise ValueError("MoveTo must be followed by LineTo x(n>=1)")
                for _ in range(cmd >> 3):
                    zx, i = _read_varint(geom, i)
                    zy, i = _read_varint(geom, i)
                    cx += _unzigzag(zx)
                    cy += _unzigzag(zy)
                    pts.append((cx, cy))
                feats.append((pts, attrs))
        out[name] = (extent, feats)
    return out


def _read_varint(buf: bytes, i: int) -> tuple[int, int]:
    v = s = 0
    while True:
        b = buf[i]
        i += 1
        v |= (b & 0x7F) << s
        if not b & 0x80:
            return v, i
        s += 7
        if s > 70:
            raise ValueError("varint overflow")


def _fields(buf: bytes):
    """Generic protobuf field iterator: yields (field_num, wire, value)."""
    i = 0
    while i < len(buf):
        tag, i = _read_varint(buf, i)
        num, wire = tag >> 3, tag & 7
        if wire == 0:
            v, i = _read_varint(buf, i)
        elif wire == 2:
            ln, i = _read_varint(buf, i)
            v = buf[i : i + ln]
            if len(v) != ln:
                raise ValueError("truncated length-delimited field")
            i += ln
        else:
            raise ValueError(f"unsupported wire type {wire}")
        yield num, wire, v


def decode_point_layers(
    data: bytes,
) -> dict[str, tuple[int, list[tuple[int, int, dict[str, int]]]]]:
    """Tile bytes → {layer name: (extent, [(x, y, attrs), …])}.

    Generic parse: field order independent, multi-point features supported,
    rejects non-POINT geometry and malformed command streams."""
    out: dict[str, tuple[int, list]] = {}
    for num, wire, layer_buf in _fields(data):
        if num != 3:
            continue
        name, extent, version = "", 4096, None
        keys: list[str] = []
        vals: list[int] = []
        raw_feats: list[bytes] = []
        for fn, fw, fv in _fields(layer_buf):
            if fn == 1:
                name = fv.decode("utf-8")
            elif fn == 2:
                raw_feats.append(fv)
            elif fn == 3:
                keys.append(fv.decode("utf-8"))
            elif fn == 4:
                iv = None
                for vn, vw, vv in _fields(fv):
                    if vn == 4:
                        iv = vv if vw == 0 else None
                if iv is None:
                    raise ValueError("only int_value Values supported")
                vals.append(iv)
            elif fn == 5:
                extent = fv
            elif fn == 15:
                version = fv
        if version != 2:
            raise ValueError(f"unsupported MVT version {version}")
        pts: list[tuple[int, int, dict[str, int]]] = []
        for fbuf in raw_feats:
            gtype, geom, tags = None, b"", b""
            for fn, fw, fv in _fields(fbuf):
                if fn == 3:
                    gtype = fv
                elif fn == 4:
                    geom = fv
                elif fn == 2:
                    tags = fv
            if gtype != 1:
                raise ValueError(f"not a POINT feature: type {gtype}")
            attrs: dict[str, int] = {}
            i = 0
            while i < len(tags):
                ki, i = _read_varint(tags, i)
                vi, i = _read_varint(tags, i)
                attrs[keys[ki]] = int(vals[vi])
            i, cx, cy = 0, 0, 0
            while i < len(geom):
                cmd, i = _read_varint(geom, i)
                if cmd & 7 != 1:
                    raise ValueError("point geometry must be MoveTo only")
                for _ in range(cmd >> 3):
                    zx, i = _read_varint(geom, i)
                    zy, i = _read_varint(geom, i)
                    cx += _unzigzag(zx)
                    cy += _unzigzag(zy)
                    pts.append((cx, cy, attrs))
        out[name] = (extent, pts)
    return out
