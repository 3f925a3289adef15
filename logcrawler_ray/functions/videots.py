"""Raspberry-Pi video timestamp-file normalization (SURVEY.md §2.2 M16).

Mirrors scripts/combine_pi_videos.py:8-25 ``update_timestamps_file``: the
mkvmerge timecode file must start with the v2 header line; the normalized
copy is written under the name with "timestamp" -> "recording". Pure
functions of text/paths — usable inside map_batches over a file listing.
"""

from __future__ import annotations

TIMESTAMP_HEADER = "# timestamp format v2"


def normalize_timestamp_text(text: str) -> str:
    """Prepend the v2 header iff the first line isn't already it
    (combine_pi_videos.py:10-25); existing content is preserved verbatim."""
    lines = text.splitlines(keepends=True)
    first = lines[0].strip() if lines else ""
    if first == TIMESTAMP_HEADER:
        return text
    return TIMESTAMP_HEADER + "\n" + text


def recording_name(timestamp_path: str) -> str:
    """timestamp file -> normalized 'recording' twin (combine:12)."""
    return timestamp_path.replace("timestamp", "recording")


def sibling_names(video_path: str) -> dict:
    """.h264 video -> its timestamp/mkv/mp4 sibling paths
    (combine_pi_videos.py:31-34)."""
    return {
        "timestamps": video_path.replace("h264", "txt"),
        "mkv": video_path.replace("h264", "mkv"),
        "mp4": video_path.replace("h264", "mp4"),
    }
