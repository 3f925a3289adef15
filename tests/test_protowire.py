"""Protobuf wire codec tests — hand-built wire bytes decoded against the
spec (varint / zigzag / length-delimited / fixed), round-trips, the
reference's alias + blob-strip semantics, and the distributed parse stage."""

import numpy as np
import pytest

from logcrawler_ray.codecs import protowire as pw


def test_varint_roundtrip_and_bounds():
    for v in [0, 1, 127, 128, 300, 2**32 - 1, 2**63, 2**64 - 1]:
        enc = pw.encode_varint(v)
        got, pos = pw.read_varint(enc, 0)
        assert got == v and pos == len(enc)
    with pytest.raises(pw.WireError):
        pw.read_varint(b"\xff" * 11, 0)
    with pytest.raises(pw.WireError):
        pw.read_varint(b"\x80", 0)  # truncated continuation


def test_hand_built_frameinfo_bytes():
    # field 1 (frameNumber) = 150 -> tag 0x08, varint 0x96 0x01
    # field 2 (time) = 1        -> tag 0x10, varint 0x01
    buf = bytes([0x08, 0x96, 0x01, 0x10, 0x01])
    msg = pw.decode_message(buf, pw.FRAMEINFO)
    assert msg == {"frame_number": 150, "frame_time": 1}
    # encoder must reproduce the canonical bytes
    assert pw.encode_message(msg, pw.FRAMEINFO) == buf


def test_unknown_fields_skipped():
    # add an unknown field 9 (varint) and 7 (length-delimited) around known ones
    buf = (pw.encode_varint(9 << 3 | 0) + pw.encode_varint(5)
           + bytes([0x08, 0x2A])
           + pw.encode_varint(7 << 3 | 2) + pw.encode_varint(3) + b"abc"
           + bytes([0x10, 0x07]))
    assert pw.decode_message(buf, pw.FRAMEINFO) == {"frame_number": 42, "frame_time": 7}


def test_scalar_kinds_roundtrip():
    schema = {1: ("a", "sint64"), 2: ("b", "double"), 3: ("c", "string"),
              4: ("d", "bool"), 5: ("e", "fixed32"), 6: ("f", "int32")}
    vals = {"a": -12345, "b": 3.5, "c": "héllo", "d": True, "e": 7, "f": -2}
    assert pw.decode_message(pw.encode_message(vals, schema), schema) == vals


def test_nested_repeated_message_roundtrip():
    vals = {"patches": [
        {"min_x": 1, "min_y": 2, "max_x": 3, "max_y": 4, "data": b"\x01\x02"},
        {"min_x": -5, "min_y": 0, "max_x": 9, "max_y": 9, "data": b""},
    ]}
    got = pw.decode_message(pw.encode_message(vals, pw.BALLCANDIDATES),
                            pw.BALLCANDIDATES)
    assert got == vals


def test_alias_and_blob_strip():
    img = pw.encode_message({"width": 4, "height": 2, "data": b"x" * 8}, pw.IMAGE)
    assert pw.parse("ImageTop", img)["width"] == 4  # 07:217-221 aliasing
    bc = {"patches": [{"min_x": 0, "min_y": 0, "max_x": 1, "max_y": 1,
                       "data": b"zz"}]}
    stripped = pw.strip_blobs(
        "BallCandidatesTop",
        pw.parse("BallCandidatesTop", pw.encode_message(bc, pw.BALLCANDIDATES)))
    assert stripped["patches"] == [{"min_x": 0, "min_y": 0, "max_x": 1, "max_y": 1}]


def test_truncated_payload_raises():
    buf = pw.encode_varint(4 << 3 | 2) + pw.encode_varint(100) + b"short"
    with pytest.raises(pw.WireError):
        pw.decode_message(buf, pw.IMAGE)


def test_wire_type_mismatch_raises_wireerror():
    """A payload whose field carries the WRONG wire type for its declared
    kind must raise WireError (never TypeError/AttributeError) so the
    parse sites' skip-corrupt handlers catch it (round-2 advice)."""
    # varint where a string is declared (IMAGE field 4 = data: bytes;
    # build a schema with a string field at 1 and feed it a varint)
    sch = {1: ("s", "string")}
    buf = pw.encode_varint(1 << 3 | 0) + pw.encode_varint(42)  # varint wire
    with pytest.raises(pw.WireError):
        pw.decode_message(buf, sch)
    # varint where a nested message is declared
    sch_m = {1: ("m", ("message", {1: ("x", "uint32")}))}
    with pytest.raises(pw.WireError):
        pw.decode_message(buf, sch_m)
    # varint where a repeated message is declared
    sch_r = {1: ("r", ("repeated", ("message", {1: ("x", "uint32")})))}
    with pytest.raises(pw.WireError):
        pw.decode_message(buf, sch_r)
    # LEN bytes where a double is declared
    sch_d = {1: ("d", "double")}
    s = pw.encode_varint(1 << 3 | 2) + pw.encode_varint(3) + b"abc"
    with pytest.raises(pw.WireError):
        pw.decode_message(s, sch_d)
    # invalid utf-8 inside a declared string is WireError too
    bad = pw.encode_varint(1 << 3 | 2) + pw.encode_varint(2) + b"\xff\xfe"
    with pytest.raises(pw.WireError):
        pw.decode_message(bad, sch)


def test_parse_log_skips_wire_type_mismatch(ray_session):
    """End-to-end: a record whose payload decodes structurally but with a
    mismatched wire type is SKIPPED by parse_log, not a task crash."""
    from logcrawler_ray.sources.naoth import write_records
    from logcrawler_ray.stages.protoparse import parse_log

    # FrameInfo.frame_number is uint32 (varint); send a LEN-typed field 1
    evil = pw.encode_varint(1 << 3 | 2) + pw.encode_varint(2) + b"xx"
    data = write_records([
        (1, [("FrameInfo", pw.encode_message(
            {"frame_number": 1, "frame_time": 500}, pw.FRAMEINFO))]),
        (2, [("FrameInfo", evil)]),
    ])
    out = parse_log(3, data).to_pandas()
    assert out[out["name"] == "FrameInfo"]["frame_time"].tolist() == [500]


def test_parse_log_skips_corrupt_and_strips(ray_session):
    """End-to-end on a hand-decodable log: frame 1 FrameInfo parses, the
    corrupt payload is skipped, BallCandidates report n_patches only."""
    from logcrawler_ray.sources.naoth import write_records
    from logcrawler_ray.stages.protoparse import parse_log

    data = write_records([
        (1, [("FrameInfo", pw.encode_message({"frame_number": 1, "frame_time": 500},
                                             pw.FRAMEINFO))]),
        (2, [("FrameInfo", pw.encode_message({"frame_number": 2, "frame_time": 533},
                                             pw.FRAMEINFO)),
             ("BallCandidates", pw.encode_message(
                 {"patches": [{"min_x": 0, "min_y": 0, "max_x": 8, "max_y": 8,
                               "data": b"p" * 64}]}, pw.BALLCANDIDATES)),
             ("Garbage", b"\xff" * 11),  # no schema -> ignored
             ("Image", b"\xff" * 11)],   # schema but corrupt -> skipped
        ),
    ])
    out = parse_log(7, data).to_pandas()
    fi = out[out["name"] == "FrameInfo"].sort_values("frame_number")
    assert fi["frame_time"].tolist() == [500, 533]
    assert (out["log_no"] == 7).all()
    bc = out[out["name"] == "BallCandidates"]
    assert bc["n_patches"].tolist() == [1]
    assert "Image" not in set(out["name"])  # corrupt payload skipped


def test_q54_naoth_closest_vs_bruteforce(ray_session):
    """q54's parse -> FrameInfo -> closest-image-frame chain must equal a
    brute-force O(n^2) nearest scan over the same fixture (the reference's
    14_calculate_closest_frames.py:7-34 oracle), ties to smaller frame."""
    from logcrawler_ray import queries as q

    got = q.QUERIES["q54_naoth_closest"]("unused")
    # brute-force oracle straight from the fixture definition: frames 1..15
    # (frame 9's second FrameInfo payload is corrupt and skipped, but the
    # first one parses), images on even frames
    img_frames = [fn for fn in range(1, 16) if fn % 2 == 0 or fn % 4 == 0]
    for log_no in range(3):
        times = {fn: 1000 + 33 * fn + 7 * log_no for fn in range(1, 16)}
        sub = got[got["log_no"] == log_no]
        assert list(sub["frame_number"]) == list(range(1, 16))
        for _, row in sub.iterrows():
            t = times[row["frame_number"]]
            best = min(img_frames,
                       key=lambda f: (abs(times[f] - t), f))
            assert row["closest_image_frame"] == best, (log_no, row.to_dict())


def test_q43_deterministic(ray_session):
    from logcrawler_ray import queries as q

    a = q.QUERIES["q43_naoth_proto"]("/root/testdata/sf0.001")
    b = q.QUERIES["q43_naoth_proto"]("/root/testdata/sf0.001")
    assert a.equals(b)
    assert len(a) > 40
    # FrameInfo times follow the fixture's formula
    fi = a[(a["log_no"] == 1) & (a["name"] == "FrameInfo")]
    assert np.array_equal(fi["frame_time"].to_numpy(),
                          1000 + 33 * fi["frame_number"].to_numpy() + 7)

# ---------------------------------------------------------- property tests
from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=0, max_value=2**64 - 1))
def test_prop_varint_roundtrip(v):
    got, pos = pw.read_varint(pw.encode_varint(v), 0)
    assert got == v


@settings(max_examples=100, deadline=None)
@given(st.integers(min_value=-(2**63), max_value=2**63 - 1),
       st.floats(allow_nan=False, allow_infinity=False, width=64),
       st.text(max_size=40), st.binary(max_size=40), st.booleans())
def test_prop_message_roundtrip(i, d, s, b, flag):
    schema = {1: ("i", "sint64"), 2: ("d", "double"), 3: ("s", "string"),
              4: ("b", "bytes"), 5: ("f", "bool")}
    vals = {"i": i, "d": d, "s": s, "b": b, "f": flag}
    assert pw.decode_message(pw.encode_message(vals, schema), schema) == vals


@settings(max_examples=60, deadline=None)
@given(st.binary(max_size=64))
def test_prop_decode_never_hangs_on_garbage(data):
    """Arbitrary bytes either decode (skipping unknowns) or raise WireError —
    never crash differently or loop forever."""
    try:
        pw.decode_message(data, pw.FRAMEINFO)
    except pw.WireError:
        pass


# ------------------------------------------------- option-tree walk (J7/M9)
def test_option_tree_walk_dfs_order():
    from logcrawler_ray.stages.behavior import build_option_map, walk_option_tree

    omap = build_option_map([
        {"option_internal": 1, "option_global": 101, "state_internal": 0,
         "state_global": 900},
        {"option_internal": 2, "option_global": 102, "state_internal": 5,
         "state_global": 905},
    ])
    root = {"id": 1, "active_state": 0, "active_sub_actions": [
        {"type": 0, "option": {"id": 2, "active_state": 5,
                               "active_sub_actions": []}},
        {"type": 2},                      # SymbolAssignment -> skipped
        {"type": 0, "option": {"id": 9, "active_state": 9,
                               "active_sub_actions": []}},  # unmapped -> -1
    ]}
    rows = walk_option_tree(root, omap, frame_number=7)
    assert rows == [
        (7, 0, 0, 101, 900),
        (7, 1, 1, 102, 905),
        (7, 2, 1, -1, -1),
    ]


def test_option_tree_wire_roundtrip_and_explode(ray_session):
    import ray.data as rd

    from logcrawler_ray.stages.behavior import (XABSL_TREE, build_option_map,
                                                explode_option_trees)

    omap = build_option_map([
        {"option_internal": 0, "option_global": 50, "state_internal": 1,
         "state_global": 51}])
    root = {"id": 0, "active_state": 1, "active_sub_actions": [
        {"type": 0, "option": {"id": 0, "active_state": 1,
                               "active_sub_actions": []}}]}
    blob = pw.encode_message({"root": root, "frame_number": 3}, XABSL_TREE)
    ds = rd.from_items([{"log_id": 1, "payload": blob},
                        {"log_id": 2, "payload": b"\xff" * 11}])  # corrupt
    out = explode_option_trees(ds, omap).to_pandas()
    assert len(out) == 2  # corrupt log contributed nothing
    assert out["options_id"].tolist() == [50, 50]
    assert out["depth"].tolist() == [0, 1]
    assert out["frame_number"].tolist() == [3, 3]


def test_q46_deterministic(ray_session):
    from logcrawler_ray import queries as q

    a = q.QUERIES["q46_behavior_tree"]("/root/testdata/sf0.001")
    b = q.QUERIES["q46_behavior_tree"]("/root/testdata/sf0.001")
    assert a.equals(b)
    # every frame walks 4 options (root + 2 children + grandchild)
    assert len(a) == 2 * 10 * 4
