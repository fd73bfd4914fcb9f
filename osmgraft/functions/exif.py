"""EXIF GPS metadata codec: write and parse APP1/TIFF GPS IFDs.

The north star (BASELINE.json) says image rows "carry lon/lat (from image
metadata/captions geo-tagged like OSM nodes)".  The caption leg exists
(`image_geo_tiles`); this module is the METADATA leg: a real Exif 2.3 / TIFF
6.0 GPS writer + parser, so a JPEG's embedded GPSLatitude/GPSLongitude
rationals become the engine's (lat7, lon7) fixed-point columns — the same
7-decimal integer convention the reference stores for OSM nodes
(osmio lib.rs:159-164 fixed-point codec; this module reuses its
half-away-from-zero rounding at the rational→int boundary).

Wire format (public specs — Exif 2.3 §4.6, TIFF 6.0 §2):
  APP1 marker 0xFFE1, u16 BE length, payload "Exif\\0\\0" + TIFF stream.
  TIFF: "II"/"MM" byte order, magic 42, u32 offset to IFD0 (relative to the
  TIFF header).  Each IFD: u16 entry count, 12-byte entries
  (tag u16, type u16, count u32, value-or-offset u32), u32 next-IFD offset.
  Values wider than 4 bytes live at their offset.  IFD0 tag 0x8825 points at
  the GPS IFD; GPS tags 1-4 are LatitudeRef/Latitude/LongitudeRef/Longitude,
  latitude/longitude each 3 RATIONALs (deg, min, sec).

Exactness: a lat7 value (1e-7-degree integer) is encoded as
  deg=(d,1), min=(m,1), sec=((rem*60) mod 1e7 * 60, 1e7)
where d = a//1e7, rem = a%1e7, m = (rem*60)//1e7.  Then
  1e7*(d + m/60 + sec/3600) = d*1e7 + ((m60//1e7)*1e7 + m60%1e7)/60
                            = d*1e7 + rem            (m60 = rem*60)
so the roundtrip is EXACT for every representable coordinate — no float
anywhere.  The parser accepts arbitrary rationals (foreign writers) and
rounds half-away-from-zero in unbounded integer arithmetic.

Scale: parsing walks only the header segment stream (a few hundred bytes per
row, never the pixel payload) inside an Arrow batch kernel — cost is
O(IFD entries), independent of image size.
"""

from __future__ import annotations

import struct

_TEN7 = 10**7


# --------------------------------------------------------------------------
# writer
# --------------------------------------------------------------------------

def _dms_rationals(a7: int) -> list[tuple[int, int]]:
    """abs fixed-point 1e-7 deg -> [(deg,1),(min,1),(sec_num,1e7)], exact."""
    d, rem = divmod(a7, _TEN7)
    m60 = rem * 60
    m, m_rem = divmod(m60, _TEN7)
    return [(d, 1), (m, 1), (m_rem * 60, _TEN7)]


def gps_tiff(lat7: int, lon7: int, endian: str = "MM", orientation: int = 1) -> bytes:
    """TIFF stream (no APP1 framing) with IFD0 -> GPS IFD carrying the
    coordinate as exact DMS rationals.  ``endian`` is 'MM' (big) or 'II';
    ``orientation`` is the Exif 2.3 tag 0x0112 value (1..8)."""
    if not 1 <= orientation <= 8:
        raise ValueError("orientation must be 1..8")
    e = ">" if endian == "MM" else "<"
    u16 = lambda v: struct.pack(e + "H", v)  # noqa: E731
    u32 = lambda v: struct.pack(e + "I", v)  # noqa: E731

    # fixed layout: header(8) IFD0(2+2*12+4=30) GPS(2+5*12+4=66) lat(24) lon(24)
    gps_off = 8 + 30
    lat_off = gps_off + 66
    lon_off = lat_off + 24

    def entry(tag: int, typ: int, cnt: int, val: bytes) -> bytes:
        return u16(tag) + u16(typ) + u32(cnt) + val.ljust(4, b"\x00")

    hdr = (b"MM" if endian == "MM" else b"II") + u16(42) + u32(8)
    ifd0 = (
        u16(2)
        + entry(0x0112, 3, 1, u16(orientation))  # Orientation SHORT
        + entry(0x8825, 4, 1, u32(gps_off))    # GPSInfo IFD pointer
        + u32(0)
    )
    rat = lambda pairs: b"".join(u32(n) + u32(dn) for n, dn in pairs)  # noqa: E731
    gps = (
        u16(5)
        + entry(0x0000, 1, 4, bytes([2, 3, 0, 0]))                     # GPSVersionID
        + entry(0x0001, 2, 2, (b"N" if lat7 >= 0 else b"S") + b"\x00")  # LatRef
        + entry(0x0002, 5, 3, u32(lat_off))                            # Latitude
        + entry(0x0003, 2, 2, (b"E" if lon7 >= 0 else b"W") + b"\x00")  # LonRef
        + entry(0x0004, 5, 3, u32(lon_off))                            # Longitude
        + u32(0)
    )
    return hdr + ifd0 + gps + rat(_dms_rationals(abs(lat7))) + rat(_dms_rationals(abs(lon7)))


def gps_app1(lat7: int, lon7: int, endian: str = "MM", orientation: int = 1) -> bytes:
    """Full APP1 segment: marker + length + "Exif\\0\\0" + TIFF stream."""
    payload = b"Exif\x00\x00" + gps_tiff(lat7, lon7, endian, orientation)
    return b"\xff\xe1" + struct.pack(">H", len(payload) + 2) + payload


def jpeg_with_gps(lat7: int, lon7: int, endian: str = "MM",
                  pre_segments: bytes = b"", orientation: int = 1) -> bytes:
    """Minimal JPEG segment stream carrying the GPS APP1: SOI, any caller
    segments (decoy APP1s / comments — real files front-load JFIF/XMP), the
    Exif APP1, EOI.  Enough container for any segment-walking metadata
    extractor; splice-ready after the SOI of a full ``jpeg_encode`` stream."""
    return (b"\xff\xd8" + pre_segments
            + gps_app1(lat7, lon7, endian, orientation) + b"\xff\xd9")


def com_segment(text: bytes) -> bytes:
    """JPEG COM segment (decoy for parser tests/fixtures)."""
    return b"\xff\xfe" + struct.pack(">H", len(text) + 2) + text


def xmp_app1(text: bytes = b"http://ns.adobe.com/xap/1.0/\x00junk") -> bytes:
    """A non-Exif APP1 (XMP-style) — a correct parser must skip it."""
    return b"\xff\xe1" + struct.pack(">H", len(text) + 2) + text


# --------------------------------------------------------------------------
# parser
# --------------------------------------------------------------------------

def _ifd_entries(buf: bytes, e: str, off: int) -> dict[int, tuple[int, int, bytes]]:
    """tag -> (type, count, 12-byte entry tail).  Bounds-checked; raises on
    truncation (caller converts to None)."""
    (n,) = struct.unpack_from(e + "H", buf, off)
    out = {}
    for i in range(n):
        base = off + 2 + 12 * i
        tag, typ, cnt = struct.unpack_from(e + "HHI", buf, base)
        out[tag] = (typ, cnt, buf[base + 8 : base + 12])
    end = off + 2 + 12 * n + 4
    if end > len(buf):
        raise ValueError("truncated IFD")
    return out


_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 7: 1, 9: 4, 10: 8}


def _value_bytes(buf: bytes, e: str, typ: int, cnt: int, tail: bytes) -> bytes:
    size = _TYPE_SIZE.get(typ, 1) * cnt
    if size <= 4:
        return tail[:size]
    (off,) = struct.unpack(e + "I", tail)
    if off + size > len(buf):
        raise ValueError("value offset out of range")
    return buf[off : off + size]


def _rationals(buf: bytes, e: str, typ: int, cnt: int, tail: bytes) -> list[tuple[int, int]]:
    if typ != 5:
        raise ValueError("expected RATIONAL")
    raw = _value_bytes(buf, e, typ, cnt, tail)
    vals = struct.unpack(e + "%dI" % (2 * cnt), raw)
    return [(vals[2 * i], vals[2 * i + 1]) for i in range(cnt)]


def _dms_to_fixed(dms: list[tuple[int, int]], sign: int) -> int:
    """[(dn,dd),(mn,md),(sn,sd)] -> signed 1e-7-degree int, exact rational
    arithmetic + half-away-from-zero rounding (osmio lib.rs:159-164)."""
    while len(dms) < 3:
        dms.append((0, 1))
    (dn, dd), (mn, md), (sn, sd) = dms[:3]
    if dd == 0 or md == 0 or sd == 0:
        raise ValueError("zero denominator")
    num = _TEN7 * (dn * 3600 * md * sd + mn * 60 * dd * sd + sn * dd * md)
    den = 3600 * dd * md * sd
    return sign * ((num + den // 2) // den)


def parse_gps_tiff(buf: bytes) -> tuple[int, int] | None:
    """TIFF stream -> (lat7, lon7) or None when no/invalid GPS IFD."""
    try:
        bo = buf[:2]
        if bo == b"MM":
            e = ">"
        elif bo == b"II":
            e = "<"
        else:
            return None
        magic, ifd0 = struct.unpack_from(e + "HI", buf, 2)
        if magic != 42:
            return None
        gps_ptr = _ifd_entries(buf, e, ifd0).get(0x8825)
        if gps_ptr is None:
            return None
        typ, cnt, tail = gps_ptr
        (gps_off,) = struct.unpack(e + "I", _value_bytes(buf, e, typ, cnt, tail).ljust(4, b"\x00"))
        gps = _ifd_entries(buf, e, gps_off)
        if not (0x0002 in gps and 0x0004 in gps):
            return None
        lat_sign = 1
        if 0x0001 in gps and _value_bytes(buf, e, *gps[0x0001])[:1] == b"S":
            lat_sign = -1
        lon_sign = 1
        if 0x0003 in gps and _value_bytes(buf, e, *gps[0x0003])[:1] == b"W":
            lon_sign = -1
        lat7 = _dms_to_fixed(_rationals(buf, e, *gps[0x0002]), lat_sign)
        lon7 = _dms_to_fixed(_rationals(buf, e, *gps[0x0004]), lon_sign)
        if abs(lat7) > 90 * _TEN7 or abs(lon7) > 180 * _TEN7:
            return None
        return lat7, lon7
    except (struct.error, ValueError, IndexError):
        return None


def find_exif_tiff(data: bytes) -> bytes | None:
    """JPEG bytes -> the TIFF payload of the first Exif APP1, or None.

    Walks the segment stream from SOI (the reference's frame-before-payload
    discipline, stringpbf/mod.rs:61-87: validate framing, then decode) and
    stops at SOS/EOI — entropy-coded data is never touched."""
    if data is None or len(data) < 4 or data[:2] != b"\xff\xd8":
        return None
    pos = 2
    n = len(data)
    while pos + 4 <= n:
        if data[pos] != 0xFF:
            return None
        marker = data[pos + 1]
        if marker in (0xD9, 0xDA):  # EOI / SOS: no metadata past here
            return None
        (seg_len,) = struct.unpack_from(">H", data, pos + 2)
        if seg_len < 2 or pos + 2 + seg_len > n:
            return None
        if marker == 0xE1 and data[pos + 4 : pos + 10] == b"Exif\x00\x00":
            # the one copy per row: the <=64 KiB APP1 payload (the outer
            # ``data`` may be a zero-copy memoryview of the Arrow buffer)
            return bytes(data[pos + 10 : pos + 2 + seg_len])
        pos += 2 + seg_len
    return None


def parse_gps(data: bytes) -> tuple[int, int] | None:
    """JPEG bytes -> (lat7, lon7) from the first Exif APP1, or None."""
    tiff = find_exif_tiff(data)
    return None if tiff is None else parse_gps_tiff(tiff)


def parse_orientation_tiff(buf: bytes) -> int | None:
    """TIFF stream -> IFD0 Orientation (tag 0x0112, 1..8) or None."""
    try:
        bo = buf[:2]
        if bo == b"MM":
            e = ">"
        elif bo == b"II":
            e = "<"
        else:
            return None
        magic, ifd0 = struct.unpack_from(e + "HI", buf, 2)
        if magic != 42:
            return None
        ent = _ifd_entries(buf, e, ifd0).get(0x0112)
        if ent is None:
            return None
        typ, cnt, tail = ent
        vb = _value_bytes(buf, e, typ, cnt, tail)
        if typ == 3 and len(vb) >= 2:
            (o,) = struct.unpack(e + "H", vb[:2])
        elif typ == 4 and len(vb) >= 4:
            (o,) = struct.unpack(e + "I", vb[:4])
        else:
            return None
        return o if 1 <= o <= 8 else None
    except (struct.error, ValueError, IndexError):
        return None


def parse_orientation(data: bytes) -> int | None:
    """JPEG bytes -> Exif Orientation (1..8) or None."""
    tiff = find_exif_tiff(data)
    return None if tiff is None else parse_orientation_tiff(tiff)
