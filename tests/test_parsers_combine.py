"""Name parsers (M1-M3) and the combine pipeline (S5, J1/J2 over binary)."""

import numpy as np
import pytest

from logcrawler_ray.functions import parsers
from logcrawler_ray.pipelines import combine
from logcrawler_ray.sources import naoth


# ---------------------------------------------------------------- parsers
def test_parse_game_folder():
    out = parsers.parse_game_folder("2023-03-15_14-30-00_TeamA_vs_TeamB_half1")
    assert out["ok"]
    assert out["start_time"] == "2023-03-15T14:30:00Z"
    assert out["team1"] == "TeamA"
    assert out["team2"] == "TeamB"
    assert out["half"] == "half1"


def test_parse_game_folder_team_with_underscore():
    out = parsers.parse_game_folder("2023-03-15_14-30-00_A_vs_B_United_half2")
    assert out["ok"] and out["team2"] == "B_United"


def test_parse_game_folder_bad():
    assert not parsers.parse_game_folder("not_a_game")["ok"]
    assert not parsers.parse_game_folder("2023-99-99_14-30-00_A_vs_B_half1")["ok"]


def test_robot_version_rule():
    assert parsers.robot_version(95) == "v5"
    assert parsers.robot_version(12) == "v6"
    assert parsers.robot_version(50) is None  # reference asserts; we flag


def test_parse_robot_folder():
    out = parsers.parse_robot_folder("3_95_extra")
    assert out == {"ok": True, "player_number": 3, "head_number": 95,
                   "robot_version": "v5"}
    assert not parsers.parse_robot_folder("garbage")["ok"]


def test_parse_nao_info():
    text = 'BODY123\nx\nHEAD456\nRevision number: "abc123def"\n'
    out = parsers.parse_nao_info(text)
    assert out == {"body_serial": "BODY123", "head_serial": "HEAD456",
                   "git_hash": "abc123def"}


def test_is_testgame():
    assert parsers.is_testgame("/logs/TestGame_2023/x")
    assert not parsers.is_testgame("/logs/RoboCup_2023/x")


def test_normalize_log_path():
    assert parsers.normalize_log_path("/root/logs/e/g/r/", "/root/logs") == "e/g/r"


# ---------------------------------------------------------------- combine
def _game_log():
    return naoth.write_records([
        (1, [("FrameInfo", b"f1"), ("CameraMatrix", b"cm1")]),
        (2, [("FrameInfo", b"f2")]),
        (3, [("FrameInfo", b"f3")]),
    ])


def _images_log():
    # frames 1 and 3 have images (two records each: alternate cameras)
    rec = lambda fn: np.int32(fn).tobytes() + bytes([fn]) * naoth.IMAGE_DATA_SIZE
    return rec(1) + rec(1) + rec(3) + rec(3)


def test_combine_raw_inner_join_semantics():
    out = combine.combine_raw(_game_log(), _images_log(), first_top=True)
    idx = naoth.scan_records(out)
    fns = idx["frame_number"].to_pylist()
    names = idx["name"].to_pylist()
    # frame 2 (no image) dropped entirely — 02_combine_logs.py:118-136
    assert 2 not in fns
    by_frame = {}
    for fn, name in zip(fns, names):
        by_frame.setdefault(fn, []).append(name)
    assert by_frame[1] == ["FrameInfo", "CameraMatrix", "Image", "ImageTop"]
    assert by_frame[3] == ["FrameInfo", "Image", "ImageTop"]
    # image payloads are the source bytes
    rows = idx.to_pylist()
    img_row = next(r for r in rows if r["frame_number"] == 1 and r["name"] == "Image")
    assert naoth.payload(out, img_row["offset"], img_row["size"]) == bytes([1]) * naoth.IMAGE_DATA_SIZE


def test_combine_jpeg_left_join_semantics():
    jpeg_log = naoth.write_records([
        (1, [("ImageJPEG", b"jpegdata1"), ("ImageJPEGTop", b"jpegtop1")]),
        (3, [("ImageJPEG", b"jpegdata3")]),
    ])
    out = combine.combine_jpeg(_game_log(), jpeg_log)
    idx = naoth.scan_records(out)
    by_frame = {}
    for r in idx.to_pylist():
        by_frame.setdefault(r["frame_number"], []).append(r["name"])
    # frame 2 kept unmodified — 02_combine_logs.py:165-177
    assert by_frame[2] == ["FrameInfo"]
    assert by_frame[1] == ["FrameInfo", "CameraMatrix", "ImageJPEG", "ImageJPEGTop"]
    assert by_frame[3] == ["FrameInfo", "ImageJPEG"]


def test_combine_roundtrip_rescannable():
    out = combine.combine_raw(_game_log(), _images_log(), first_top=False)
    idx = naoth.scan_records(out)
    # camera parity flipped: first record of each image pair is BOTTOM ->
    # repr "Image" first in sorted order either way; just confirm both present
    names = set(idx["name"].to_pylist())
    assert {"Image", "ImageTop"} <= names


def test_combine_files_dataset(ray_session, tmp_path):
    g = tmp_path / "game.log"
    g.write_bytes(_game_log())
    im = tmp_path / "images.log"
    im.write_bytes(_images_log())
    out = combine.combine_files_dataset([(str(g), str(im), True)]).to_pandas()
    assert len(out) == 1
    combined = out["combined"].iloc[0]
    assert naoth.scan_records(combined).num_rows > 0
