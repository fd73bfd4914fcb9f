"""`.osm.pbf` source: wire-format kernels + write→read roundtrips.

Mirrors the reference's PBF surface (osmio stringpbf/mod.rs): blob framing,
DenseNodes delta/dict decode, Way/Relation decode, object filter block-skip,
node-position fast scan. The fixture writer is osmgraft's own (the reference
cannot write PBF — stringpbf/mod.rs:3), so roundtrips prove reader ⊗ writer
consistency and the hand-built granularity block proves spec math directly.
"""

import datetime as dt

import numpy as np
import pytest

from osmgraft.sources import pbf


# ---------------------------------------------------------------------------
# wire primitives
# ---------------------------------------------------------------------------


def test_varint_kernel_roundtrip():
    vals = [0, 1, 127, 128, 300, 2**32 - 1, 2**63, 2**64 - 1]
    rng = np.random.default_rng(7)
    vals += [int(x) for x in rng.integers(0, 2**63, 200, dtype=np.int64)]
    buf = b"".join(pbf._enc_varint(v) for v in vals)
    got = pbf.decode_packed_varints(buf)
    assert got.dtype == np.uint64
    assert [int(v) for v in got] == vals


def test_zigzag_roundtrip():
    vals = [0, -1, 1, -2, 2, -(2**31), 2**31, -(2**62), 2**62]
    buf = b"".join(pbf._enc_varint(pbf._zigzag(v)) for v in vals)
    got = pbf._unzigzag(pbf.decode_packed_varints(buf))
    assert [int(v) for v in got] == vals


def test_empty_packed():
    assert pbf.decode_packed_varints(b"").size == 0


# ---------------------------------------------------------------------------
# fixtures
# ---------------------------------------------------------------------------

_TS0 = int(dt.datetime(2020, 1, 2, 3, 4, 5, tzinfo=dt.timezone.utc).timestamp())


def _nodes(n=50):
    out = []
    for i in range(1, n + 1):
        out.append(
            {
                "obj_type": "n",
                "id": i * 3,
                "version": 1 + i % 4,
                "deleted": i % 7 == 0,
                "changeset_id": 1000 + i,
                "ts": _TS0 + i * 61,
                "uid": 10 + i % 5,
                "user": f"ユーザー{i % 5}" if i % 3 == 0 else f"user{i % 5}",
                "tags": {"name": f"n<&>{i}", "ref": str(i)} if i % 2 == 0 else {},
                "lat7": (i - n // 2) * 1_000_000,
                "lon7": (i * 7 - n) * 1_000_000,
            }
        )
    return out


def _ways(n=10):
    out = []
    for i in range(1, n + 1):
        out.append(
            {
                "obj_type": "w",
                "id": 500 + i,
                "version": 2,
                "deleted": False,
                "changeset_id": 2000 + i,
                "ts": _TS0 + i,
                "uid": 99,
                "user": "mapper",
                "tags": {"highway": "residential"} if i % 2 else {},
                "nodes": [j * 3 for j in range(1, 2 + i)],
            }
        )
    return out


def _rels(n=5):
    out = []
    for i in range(1, n + 1):
        out.append(
            {
                "obj_type": "r",
                "id": 900 + i,
                "version": 1,
                "deleted": i == 3,
                "changeset_id": 3000 + i,
                "ts": _TS0 - i * 17,
                "uid": 7,
                "user": "rel-editor",
                "tags": {"type": "multipolygon"},
                "members": [
                    {"type": "n", "ref": 3 * i, "role": "admin_centre"},
                    {"type": "w", "ref": 500 + i, "role": "outer"},
                    {"type": "r", "ref": 900 + (i % n) + 1, "role": ""},
                ],
            }
        )
    return out


@pytest.fixture(scope="module")
def pbf_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("pbf") / "fixture.osm.pbf"
    pbf.write_pbf(_nodes() + _ways() + _rels(), str(p), block_size=16)
    return str(p)


# ---------------------------------------------------------------------------
# framing
# ---------------------------------------------------------------------------


def test_blob_index(pbf_file):
    idx = pbf.pbf_blob_index(pbf_file)
    assert idx[0][3] == "OSMHeader"
    data = [e for e in idx if e[3] == "OSMData"]
    # 50 nodes / 16 per block = 4 blobs, +1 way blob +1 rel blob
    assert len(data) == 6
    # offsets strictly increasing, sizes positive
    offs = [e[1] for e in idx]
    assert offs == sorted(offs)
    assert all(e[2] > 0 for e in idx)


# ---------------------------------------------------------------------------
# roundtrips through Spark
# ---------------------------------------------------------------------------


def _by_id(rows):
    return {(r["obj_type"], r["id"]): r for r in rows}


def test_node_roundtrip(spark, pbf_file):
    got = _by_id(
        [r.asDict(recursive=True) for r in pbf.read_pbf(spark, pbf_file).filter("obj_type = 'n'").collect()]
    )
    want = _nodes()
    assert len(got) == len(want)
    for o in want:
        g = got[("n", o["id"])]
        assert g["version"] == o["version"]
        assert g["deleted"] == o["deleted"]
        assert g["changeset_id"] == o["changeset_id"]
        assert g["uid"] == o["uid"]
        assert g["user"] == o["user"]
        assert (g["tags"] or {}) == o["tags"]
        assert g["lat7"] == o["lat7"]
        assert g["lon7"] == o["lon7"]
        assert int(g["timestamp"].replace(tzinfo=dt.timezone.utc).timestamp()) == o["ts"]
        assert g["nodes"] is None and g["members"] is None


def test_way_roundtrip(spark, pbf_file):
    got = _by_id(
        [r.asDict(recursive=True) for r in pbf.read_pbf(spark, pbf_file).filter("obj_type = 'w'").collect()]
    )
    for o in _ways():
        g = got[("w", o["id"])]
        assert g["nodes"] == o["nodes"]
        assert (g["tags"] or {}) == o["tags"]
        assert g["user"] == o["user"]
        assert g["changeset_id"] == o["changeset_id"]
        assert g["lat7"] is None and g["lon7"] is None


def test_relation_roundtrip(spark, pbf_file):
    got = _by_id(
        [r.asDict(recursive=True) for r in pbf.read_pbf(spark, pbf_file).filter("obj_type = 'r'").collect()]
    )
    for o in _rels():
        g = got[("r", o["id"])]
        assert g["members"] == o["members"]
        assert g["deleted"] == o["deleted"]
        assert (g["tags"] or {}) == o["tags"]


def test_object_filter_block_skip(spark, pbf_file):
    """ObjectFilter skips primitive groups before decode (stringpbf/mod.rs:375-439)."""
    ways_only = pbf.read_pbf(spark, pbf_file, object_filter=(False, True, False))
    types = {r.obj_type for r in ways_only.select("obj_type").distinct().collect()}
    assert types == {"w"}
    assert ways_only.count() == len(_ways())


def test_node_position_fast_scan(spark, pbf_file):
    df = pbf.read_pbf_node_positions(spark, pbf_file)
    assert df.columns == ["id", "lat7", "lon7"]
    rows = {r.id: (r.lat7, r.lon7) for r in df.collect()}
    for o in _nodes():
        assert rows[o["id"]] == (o["lat7"], o["lon7"])


# ---------------------------------------------------------------------------
# spec math: granularity / offsets (hand-built block, not via our writer)
# ---------------------------------------------------------------------------


def test_granularity_and_offsets():
    """lat7 = (lat_offset + granularity·raw) / 100 nanodeg — osmformat.proto
    semantics with non-default granularity=1000, offsets set."""
    st = pbf._enc_bytes(1, pbf._enc_bytes(1, b""))
    # two nodes: raw lat deltas [5, -2] → raw [5, 3]; granularity 1000 →
    # nano lat [100000+5000, 100000+3000] → lat7 [1050, 1030];
    # lon raw [10, 20] → nano [200000+10000, 200000+20000] → lon7 [2100, 2200]
    dense = (
        pbf._enc_packed(1, [1, 1], zigzag=True)  # ids 1, 2
        + pbf._enc_packed(8, [5, -2], zigzag=True)
        + pbf._enc_packed(9, [10, 10], zigzag=True)  # lon raw [10, 20]
    )
    block = (
        st
        + pbf._enc_bytes(2, pbf._enc_bytes(2, dense))
        + pbf._enc_int(17, 1000)  # granularity
        + pbf._enc_int(19, 100_000)  # lat_offset (nanodeg)
        + pbf._enc_int(20, 200_000)  # lon_offset
    )
    cols = pbf.decode_block(block)
    assert len(cols) == 1
    c = cols[0]
    assert list(c["id"]) == [1, 2]
    assert list(c["lat7"]) == [1050, 1030]
    assert list(c["lon7"]) == [2100, 2200]


def test_raw_uncompressed_blob():
    """Blob.raw (field 1) path — no zlib (blob_raw_data, stringpbf/mod.rs:35-46)."""
    body = b"hello-block"
    raw = pbf._enc_int(2, len(body)) + pbf._enc_bytes(1, body)
    assert pbf._blob_payload(raw) == body


def test_write_is_deterministic(tmp_path):
    a, b = tmp_path / "a.pbf", tmp_path / "b.pbf"
    objs = _nodes(20) + _ways(5) + _rels(3)
    pbf.write_pbf(objs, str(a))
    pbf.write_pbf(objs, str(b))
    assert a.read_bytes() == b.read_bytes()
