"""Entity-name parsers (SURVEY.md §2.2 M1-M4, §1.1 directory model).

Pure functions mirroring the reference's directory-tree entity extraction:

- ``parse_game_folder``: ``date_time_team1_vs_team2_half`` ->
  (timestamp ISO+Z, team1, team2, half) (reference:
  01_input_game_data.py:17-38 — split on "_", strptime
  "%Y-%m-%d_%H-%M-%S", isoformat + "Z").
- ``parse_robot_folder``: ``player_head_body``-style robot log folder ->
  (player_number, head_number) plus the head-number -> robot-version rule
  (head > 90 => v5, head < 40 => v6, else invalid;
  01_input_game_data.py:58-66, :100-105). The reference asserts; we return
  an error-channel value instead.
- ``parse_nao_info``: line 1 = body serial, line 3 = head serial
  (01_input_game_data.py:107-115); ``Revision number: "<hash>"`` ->
  git hash (15_add_git_hash.py:9-16).
- ``is_testgame``: "test" in path, case-insensitive
  (01_input_game_data.py:151-156).
"""

from __future__ import annotations

import re
from datetime import datetime


def parse_game_folder(name: str) -> dict:
    """'2023-03-15_14-30-00_TeamA_vs_TeamB_half1' -> fields.

    Unparseable names return {"ok": False, ...} (error channel, the
    reference would crash on strptime)."""
    parts = name.split("_")
    if len(parts) < 6 or parts[3] != "vs":
        return {"ok": False, "name": name, "start_time": None, "team1": None,
                "team2": None, "half": None}
    try:
        ts = datetime.strptime(parts[0] + "_" + parts[1], "%Y-%m-%d_%H-%M-%S")
    except ValueError:
        return {"ok": False, "name": name, "start_time": None, "team1": None,
                "team2": None, "half": None}
    return {
        "ok": True,
        "name": name,
        "start_time": ts.isoformat() + "Z",
        "team1": parts[2],
        "team2": "_".join(parts[4:-1]),
        "half": parts[-1],
    }


def robot_version(head_number: int) -> str | None:
    """head > 90 => v5, head < 40 => v6 (01_input_game_data.py:58-66)."""
    if head_number > 90:
        return "v5"
    if head_number < 40:
        return "v6"
    return None  # the reference asserts here; we flag instead


def parse_robot_folder(name: str) -> dict:
    """'<player>_<head>...' robot log folder -> numbers + version."""
    parts = name.split("_")
    try:
        player = int(parts[0])
        head = int(parts[1])
    except (IndexError, ValueError):
        return {"ok": False, "player_number": None, "head_number": None,
                "robot_version": None}
    ver = robot_version(head)
    return {"ok": ver is not None, "player_number": player, "head_number": head,
            "robot_version": ver}


_REVISION_RE = re.compile(r'Revision number:\s*"?([0-9a-fA-F]+)"?')


def parse_nao_info(text: str) -> dict:
    """nao.info lines: [0] body serial, [2] head serial; revision line."""
    lines = text.splitlines()
    body = lines[0].strip() if len(lines) > 0 else None
    head = lines[2].strip() if len(lines) > 2 else None
    m = _REVISION_RE.search(text)
    return {"body_serial": body or None, "head_serial": head or None,
            "git_hash": m.group(1) if m else None}


def is_testgame(path: str) -> bool:
    return "test" in path.lower()


def normalize_log_path(path: str, root: str) -> str:
    """str(p).removeprefix(root).strip('/') (01_input_game_data.py:117-131)."""
    return path.removeprefix(root).strip("/")
