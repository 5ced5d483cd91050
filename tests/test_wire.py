"""Wire-codec tests: golden counts from the reference fixture + round trips.

Golden contract: sample.osm.pbf = 339 entities
(/root/reference/decoder_test.go:32).
"""

import io

import numpy as np
import pytest

from pbf_spark.wire import frame, osmformat
from pbf_spark.wire.osmformat import (
    Header,
    StringTable,
    build_dense_nodes_group,
    build_header_block,
    build_primitive_block,
    build_relations_group,
    build_ways_group,
    parse_header_block,
    parse_primitive_block,
)

from pbf_spark.wire.proto import MessageBuilder

from .conftest import SAMPLE_PBF


def _decode_file(path):
    counts = {"node": 0, "way": 0, "relation": 0}
    blocks = []
    with open(path, "rb") as f:
        for btype, blob in frame.iter_blob_frames(f):
            if btype != "OSMData":
                continue
            blk = parse_primitive_block(frame.unpack_blob(blob))
            counts["node"] += len(blk.nodes)
            counts["way"] += len(blk.ways)
            counts["relation"] += len(blk.relations)
            blocks.append(blk)
    return counts, blocks


def test_sample_golden_counts():
    counts, _ = _decode_file(SAMPLE_PBF)
    assert sum(counts.values()) == 339  # decoder_test.go:32
    assert counts == {"node": 290, "way": 44, "relation": 5}


def test_sample_header():
    with open(SAMPLE_PBF, "rb") as f:
        btype, blob = next(frame.iter_blob_frames(f))
    assert btype == "OSMHeader"
    h = parse_header_block(frame.unpack_blob(blob))
    assert "OsmSchema-V0.6" in h.required_features
    assert "DenseNodes" in h.required_features
    bb = h.bbox_degrees
    assert bb["bottom"] == pytest.approx(51.7648407, abs=1e-9)
    assert bb["left"] == pytest.approx(-0.2353761, abs=1e-9)


def test_sample_tags_resolved():
    _, blocks = _decode_file(SAMPLE_PBF)
    n = blocks[0].nodes
    tagged = np.flatnonzero(np.diff(n.tag_off) > 0)
    assert tagged.size > 0
    s, e = n.tag_off[tagged[0]], n.tag_off[tagged[0] + 1]
    keys = list(blocks[0].strings[n.tag_key[s:e]])
    assert all(isinstance(k, str) and k for k in keys)


def test_unsupported_required_feature_rejected():
    raw = build_header_block(Header(required_features=("NotAThing",)))
    with pytest.raises(ValueError, match="NotAThing"):
        parse_header_block(raw)


def test_primitive_block_roundtrip():
    st = StringTable()
    st.add("highway", "primary", "name", "Test St", "alice", "outer", "")
    table, sid = st.build()
    assert table[0] == ""  # reserved index (encoder/table.go:44-46)
    assert table == sorted(table)
    ids = np.array([10, 25, 30])
    lat = np.array([51_500_000_000, 51_500_001_000, -8_000_000_100])
    lon = np.array([-100_000_000, -99_999_000, 179_999_999_900])
    tags = [[("highway", "primary")], [], [("name", "Test St"), ("highway", "primary")]]
    info = dict(
        version=[1, 2, 3],
        ts_ms=[1_000_000, 2_000_000, 3_000_000],
        changeset=[5, 6, 7],
        uid=[42, 42, 43],
        user=["alice", "alice", "alice"],
        visible=[1, 0, 1],
    )
    g1 = build_dense_nodes_group(ids, lat, lon, tags, sid, info=info)
    g2 = build_ways_group(
        [dict(id=7, refs=[10, 25, 30, 25], tags=[("highway", "primary")])], sid
    )
    g3 = build_relations_group(
        [
            dict(
                id=99,
                tags=[("name", "Test St")],
                members=[
                    dict(ref=7, type=1, role="outer"),
                    dict(ref=10, type=0, role=""),
                    dict(ref=99, type=2, role="outer"),
                ],
            )
        ],
        sid,
    )
    blk = parse_primitive_block(build_primitive_block([g1, g2, g3], table))

    nodes = blk.nodes
    assert (nodes.id == ids).all()
    assert (osmformat.nano_degrees(nodes.lat_coord, blk.lat_offset, blk.granularity) == lat).all()
    assert (osmformat.nano_degrees(nodes.lon_coord, blk.lon_offset, blk.granularity) == lon).all()
    got_tags = [
        list(
            zip(
                blk.strings[nodes.tag_key[nodes.tag_off[i] : nodes.tag_off[i + 1]]],
                blk.strings[nodes.tag_val[nodes.tag_off[i] : nodes.tag_off[i + 1]]],
            )
        )
        for i in range(3)
    ]
    assert got_tags == [sorted(t) for t in tags]
    assert list(nodes.info.visible) == [True, False, True]
    assert list(nodes.info.ts_ms) == info["ts_ms"]
    assert list(nodes.info.version) == [1, 2, 3]
    assert list(blk.strings[nodes.info.user_sid]) == ["alice"] * 3

    ways = blk.ways
    assert ways.id[0] == 7 and list(ways.refs) == [10, 25, 30, 25]
    assert ways.info is None

    rels = blk.relations
    assert rels.id[0] == 99
    assert list(rels.mem_ref) == [7, 10, 99]
    assert list(rels.mem_type) == [1, 0, 2]
    assert list(blk.strings[rels.mem_role]) == ["outer", "", "outer"]


def test_locations_on_ways_roundtrip():
    """LocationsOnWays (osm.proto:228-235): optional delta-coded lat/lon
    parallel to refs. Parity-plus vs the reference — its decoder never
    reads fields 9/10 (model/entities.go Way has no coordinates)."""
    st = StringTable()
    st.add("")
    table, sid = st.build()
    lat1 = [51_500_000_000, 51_500_001_000, 51_499_999_000]
    lon1 = [-100_000_000, -99_999_000, -99_998_000]
    lat2 = [10_000_000_000, 10_000_000_100]
    lon2 = [20_000_000_000, 19_999_999_900]
    g = build_ways_group(
        [
            dict(id=7, refs=[10, 25, 30], lat_nanos=lat1, lon_nanos=lon1),
            dict(id=8, refs=[30, 10], lat_nanos=lat2, lon_nanos=lon2),
        ],
        sid,
    )
    blk = parse_primitive_block(build_primitive_block([g], table))
    ways = blk.ways
    assert list(ways.ref_off) == [0, 3, 5]
    got_lat = osmformat.nano_degrees(ways.way_lat_coord, blk.lat_offset, blk.granularity)
    got_lon = osmformat.nano_degrees(ways.way_lon_coord, blk.lon_offset, blk.granularity)
    assert list(got_lat) == lat1 + lat2
    assert list(got_lon) == lon1 + lon2

    # ways WITHOUT locations keep None (no phantom columns downstream)
    g_plain = build_ways_group([dict(id=9, refs=[1, 2])], sid)
    blk2 = parse_primitive_block(build_primitive_block([g_plain], table))
    assert blk2.ways.way_lat_coord is None

    # count-mismatch must be rejected on both ends
    import pytest as _pytest

    with _pytest.raises(ValueError, match="match refs"):
        build_ways_group([dict(id=1, refs=[1, 2], lat_nanos=[0], lon_nanos=[0])], sid)


def test_degrees_fixed_point_roundtrip():
    """Coordinate grid round-trip matrix (model/types_test.go:60-131 analogue)."""
    for gran in (100, 1000):
        for offset in (0, -50, 125):
            coords = np.array([-1_000_000, 0, 777, 123_456_789], dtype=np.int64)
            nano = osmformat.nano_degrees(coords, offset, gran)
            deg = osmformat.to_degrees(nano)
            back = np.round((deg * 1e9 - offset) / gran).astype(np.int64)
            assert (back == coords).all()


def test_blob_codecs_roundtrip():
    raw = b"primitive block bytes" * 100
    for codec in ("raw", "zlib", "lzma"):
        blob = frame.pack_blob(raw, codec)
        got_codec, raw_size, payload = frame.split_blob(blob)
        assert got_codec == codec
        assert raw_size == len(raw)
        assert frame.unpack_blob(blob) == raw


def test_frame_roundtrip():
    blob = frame.pack_blob(b"x" * 50)
    stream = io.BytesIO(frame.frame_blob("OSMData", blob) * 3)
    frames = list(frame.iter_blob_frames(stream))
    assert len(frames) == 3
    assert all(t == "OSMData" and b == blob for t, b in frames)


def test_truncated_stream_rejected():
    blob = frame.pack_blob(b"x" * 50)
    data = frame.frame_blob("OSMData", blob)
    with pytest.raises(ValueError):
        list(frame.iter_blob_frames(io.BytesIO(data[:-10])))


def _packed_sint64_delta(vals):
    from pbf_spark.wire.varint import encode_varints, zigzag_encode

    deltas = np.diff(np.asarray(vals, np.int64), prepend=np.int64(0))
    return encode_varints(zigzag_encode(deltas).view(np.uint64))


def test_way_unknown_fixed_width_fields_skipped():
    """Spec-legal unknown fixed64/fixed32 fields must be skipped, not crash
    (proto2 forward compat; reference skips via gogoproto generated code)."""
    from pbf_spark.wire.proto import WT_I32, WT_I64
    from pbf_spark.wire.varint import encode_varint

    b = MessageBuilder()
    b.varint(1, 7)  # id
    b.bytes_field(8, _packed_sint64_delta([10, 25, 30]))  # refs
    raw = (
        b.tobytes()
        + encode_varint(99 << 3 | WT_I64)
        + b"\x01\x02\x03\x04\x05\x06\x07\x08"
        + encode_varint(98 << 3 | WT_I32)
        + b"\x01\x02\x03\x04"
    )
    soa = osmformat._decode_ways([memoryview(raw)], 1000)
    assert soa.id[0] == 7
    assert list(soa.refs) == [10, 25, 30]


def test_way_refs_split_across_packed_chunks():
    """A packed sint64 field split across repeated occurrences (legal
    protobuf) must delta-decode as ONE run, not reset per chunk."""
    full = _packed_sint64_delta([10, 25, 30, 40])
    # split the encoded run between values 2 and 3: re-encode as two
    # occurrences of field 8 carrying [d(10),d(15)] then [d(5),d(10)]
    from pbf_spark.wire.varint import encode_varints, zigzag_encode

    d = np.array([10, 15, 5, 10], np.int64)  # deltas of 10,25,30,40
    part1 = encode_varints(zigzag_encode(d[:2]).view(np.uint64))
    part2 = encode_varints(zigzag_encode(d[2:]).view(np.uint64))
    b = MessageBuilder()
    b.varint(1, 11)
    b.bytes_field(8, part1)
    b.bytes_field(8, part2)
    soa = osmformat._decode_ways([memoryview(b.tobytes())], 1000)
    assert list(soa.refs) == [10, 25, 30, 40]
    # and a two-message batch where only one message is split
    b2 = MessageBuilder()
    b2.varint(1, 12)
    b2.bytes_field(8, _packed_sint64_delta([100, 90]))
    soa2 = osmformat._decode_ways([memoryview(b.tobytes()), memoryview(b2.tobytes())], 1000)
    assert list(soa2.refs[soa2.ref_off[0] : soa2.ref_off[1]]) == [10, 25, 30, 40]
    assert list(soa2.refs[soa2.ref_off[1] : soa2.ref_off[2]]) == [100, 90]


@pytest.mark.parametrize("codec,mod", [("lz4", "lz4.frame"), ("zstd", "zstandard")])
def test_optional_codec_roundtrip(codec, mod):
    """Full reference codec matrix (unpacker.go:38-81): exercised on any
    deployment image that ships the libs; skipped where absent (this
    sandbox). The import-gated seams raise NotImplementedError otherwise."""
    import importlib

    try:
        importlib.import_module(mod)
    except ImportError:
        with pytest.raises(NotImplementedError):
            frame.pack_blob(b"x" * 100, codec)
        pytest.skip(f"{mod} not installed")
    raw = bytes(range(256)) * 40
    blob = frame.pack_blob(raw, codec)
    got_codec, _, _ = frame.split_blob(blob)
    assert got_codec == codec
    assert frame.unpack_blob(blob) == raw


def test_info_render_golden():
    """pbf-info text/JSON render parity (cmd/pbf/info/info.go:174-206) on
    the reference sample fixture."""
    import json as _json

    from pbf_spark.sources import info

    i = info.read_info(SAMPLE_PBF, extended=True)
    txt = info.render_txt(i)
    assert txt.splitlines() == [
        "BoundingBox: [(51.7668597, -0.2353761) (51.7648407, -0.2285134)]",
        "RequiredFeatures: OsmSchema-V0.6, DenseNodes",
        "OptionalFeatures: Sort.Type_then_ID",
        "WritingProgram: osmconvert 0.7G",
        "Source: http://www.openstreetmap.org/api/0.6",
        "OsmosisReplicationTimestamp: 0001-01-01T00:00:00Z",
        "OsmosisReplicationSequenceNumber: 0",
        "OsmosisReplicationBaseURL: ",
        "NodeCount: 290",
        "WayCount: 44",
        "RelationCount: 5",
    ]
    j = _json.loads(info.render_json(i))
    assert j["node_count"] == 290 and j["way_count"] == 44 and j["relation_count"] == 5
    assert j["bounding_box"]["top"] == 51.7668597


def test_cli_info(capsys):
    """python -m pbf_spark info [-e] [-j] — the reference binary's
    command surface (cmd/pbf/info/info.go:52-55)."""
    import json as _json

    from pbf_spark.__main__ import main

    assert main(["info", str(SAMPLE_PBF)]) == 0
    out = capsys.readouterr().out
    assert out.startswith("BoundingBox: [(51.7668597, -0.2353761)")
    assert "NodeCount" not in out  # not extended
    assert main(["info", "-e", "-j", str(SAMPLE_PBF)]) == 0
    j = _json.loads(capsys.readouterr().out)
    assert j["node_count"] == 290
    assert main(["info", "/nonexistent.osm.pbf"]) == 1


def test_scan_spans_vec_rejects_varint_crossing_message_boundary():
    """A varint truncated at its message boundary must raise, not
    resolve its terminator inside the NEXT message's bytes (round-5
    ADVICE: the buffer-global terminator index made this silent)."""
    import numpy as np
    import pytest

    from pbf_spark.wire.osmformat import _scan_spans_vec

    # message 1 = [0x08, 0x96, 0x81] — field 1 varint whose bytes all
    # carry the continuation bit up to the message end (truncated);
    # message 2 = [0x01, 0x08, 0x05] — starts with the byte that would
    # "complete" message 1's varint if the scan ignored the boundary
    b = np.frombuffer(bytes([0x08, 0x96, 0x81, 0x01, 0x08, 0x05]), dtype=np.uint8)
    starts = np.array([0, 3], dtype=np.int64)
    ends = np.array([3, 6], dtype=np.int64)
    with pytest.raises(ValueError, match="boundary|truncated"):
        _scan_spans_vec(b, starts, ends, packed_fields=(), varint_fields=(1,), msg_fields=())

    # sanity: the same bytes split at the true varint end parse fine
    starts_ok = np.array([0, 4], dtype=np.int64)
    ends_ok = np.array([4, 6], dtype=np.int64)
    vals, present, _ = _scan_spans_vec(
        b, starts_ok, ends_ok, packed_fields=(), varint_fields=(1,), msg_fields=()
    )
    assert present[1].all()
    assert vals[1][1] == 5
