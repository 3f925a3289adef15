"""NaoTH-style binary log scanning as pure functions over bytes.

Wire format (reference: src/reader.rs:11-68, src/scanner.rs:17-56):
repeated records ``[frame_number: i32 LE][name: NUL-terminated ascii]
[message_size: i32 LE][payload]``; consecutive records sharing a
frame_number form one frame. The scanner builds the reference's lazy index
— (frame_number, name, offset, size) pointers into the buffer, never the
payloads (the Frame{fields: name->(offset,size)} model of src/frame.rs:2-7
and the motion-data offsets-only load of src/lib.rs:109-134).

Corruption policy, matched bit-for-bit:
- a parse error mid-file keeps the prefix scanned so far
  (src/reader.rs:13-47 breaks the loop);
- a final frame whose last payload extends past EOF is dropped WHOLE
  (src/reader.rs:72-78);
- downstream, a frame missing FrameInfo truncates the rest of the stream
  (prefix semantics, 06_extract_images.py:376-386 /
  10_input_behavior_frames.py:170-179) — ``truncate_at_missing_frameinfo``.

images.log raw scan (reference: 02_combine_logs.py:19-68): fixed-stride
records ``[frame_number: 4B LE][640*480*2 bytes YUV422]`` with the camera
alternating per record; which camera comes first depends on the log year
(<2023 => top first, 02_combine_logs.py:198-209). The alternation is a pure
function of record index, so the scan splits perfectly: any byte-range
shard knows its starting parity from ``offset // stride``.

Everything is stateless -> usable inside ``map_batches`` over
``read_binary_files`` batches (one task per file / byte range).
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

INDEX_SCHEMA = pa.schema([
    ("frame_number", pa.int64()),
    ("name", pa.string()),
    ("offset", pa.int64()),
    ("size", pa.int64()),
])

IMAGE_DATA_SIZE = 640 * 480 * 2  # 02_combine_logs.py:24-27
IMAGE_RECORD = 4 + IMAGE_DATA_SIZE


def scan_records(data: bytes) -> pa.Table:
    """Bytes -> index table; applies the prefix-keep + drop-torn-tail rules."""
    pos = 0
    n = len(data)
    frames: list[tuple[int, str, int, int]] = []
    last_frame_start = 0  # index into `frames` where the current frame began
    cur_frame: int | None = None
    torn_tail = False
    while pos < n:
        if pos + 4 > n:
            torn_tail = True
            break
        (fn,) = struct.unpack_from("<i", data, pos)
        pos += 4
        nul = data.find(b"\x00", pos)
        if nul < 0 or nul - pos > 255:  # unterminated / absurd name -> corrupt
            torn_tail = True
            break
        try:
            name = data[pos:nul].decode("ascii")
        except UnicodeDecodeError:
            torn_tail = True
            break
        pos = nul + 1
        if pos + 4 > n:
            torn_tail = True
            break
        (size,) = struct.unpack_from("<i", data, pos)
        pos += 4
        if size < 0:
            torn_tail = True
            break
        if fn != cur_frame:
            cur_frame = fn
            last_frame_start = len(frames)
        if pos + size > n:  # payload extends past EOF -> drop whole frame
            torn_tail = True
            break
        frames.append((fn, name, pos, size))
        pos += size
    if torn_tail:
        frames = frames[:last_frame_start]
    if not frames:
        return INDEX_SCHEMA.empty_table()
    fn_a, name_a, off_a, size_a = zip(*frames)
    return pa.table({
        "frame_number": pa.array(fn_a, pa.int64()),
        "name": pa.array(name_a, pa.string()),
        "offset": pa.array(off_a, pa.int64()),
        "size": pa.array(size_a, pa.int64()),
    }, schema=INDEX_SCHEMA)


def write_records(frames: list[tuple[int, list[tuple[str, bytes]]]]) -> bytes:
    """Fixture helper: [(frame_number, [(name, payload), ...])] -> bytes."""
    out = bytearray()
    for fn, fields in frames:
        for name, payload in fields:
            out += struct.pack("<i", fn)
            out += name.encode("ascii") + b"\x00"
            out += struct.pack("<i", len(payload))
            out += payload
    return bytes(out)


def truncate_at_missing_frameinfo(index: pa.Table, guard: str = "FrameInfo") -> pa.Table:
    """Prefix truncation: keep frames up to (excluding) the first frame that
    lacks the guard representation (06_extract_images.py:376-386)."""
    fns = index["frame_number"].to_numpy()
    names = index["name"].to_pylist()
    if not len(fns):
        return index
    # frame boundaries = positions where frame_number changes
    change = np.nonzero(np.diff(fns))[0] + 1
    starts = np.concatenate([[0], change])
    ends = np.concatenate([change, [len(fns)]])
    keep_until = 0
    for s, e in zip(starts, ends):
        if guard not in names[s:e]:
            break
        keep_until = e
    return index.slice(0, keep_until)


def payload(data: bytes, offset: int, size: int) -> bytes:
    """Lazy payload fetch by stored offset (mmap pattern, tests/mmap_test.py:58-72)."""
    return data[offset : offset + size]


def scan_images_log(data: bytes, first_top: bool) -> pa.Table:
    """Raw images.log -> (frame_number, camera, offset, size); truncated
    trailing image is dropped (02_combine_logs.py:50-57)."""
    n_rec = len(data) // IMAGE_RECORD
    if n_rec == 0:
        return pa.schema([
            ("frame_number", pa.int64()), ("camera", pa.string()),
            ("offset", pa.int64()), ("size", pa.int64()),
        ]).empty_table()
    raw = np.frombuffer(data[: n_rec * IMAGE_RECORD], dtype=np.uint8)
    recs = raw.reshape(n_rec, IMAGE_RECORD)
    fns = recs[:, :4].copy().view("<i4").reshape(-1).astype(np.int64)
    idx = np.arange(n_rec)
    # parity of the record index decides the camera (02:36-66)
    is_top = (idx % 2 == 0) if first_top else (idx % 2 == 1)
    cameras = np.where(is_top, "TOP", "BOTTOM")
    offsets = idx * IMAGE_RECORD + 4
    return pa.table({
        "frame_number": fns,
        "camera": pa.array(cameras.tolist(), pa.string()),
        "offset": offsets.astype(np.int64),
        "size": np.full(n_rec, IMAGE_DATA_SIZE, dtype=np.int64),
    })


def first_image_is_top(log_year: int) -> bool:
    """Camera order flips at 2023 (02_combine_logs.py:198-209)."""
    return log_year < 2023


def scan_files_dataset(paths: list[str]):
    """Ray wrapper: files -> index rows with a log_path column (one scan task
    per file; pure function of bytes, stateless)."""
    import ray.data as rd

    ds = rd.read_binary_files(paths, include_paths=True)

    def scan(batch: pa.Table) -> pa.Table:
        out = []
        for path, data in zip(batch["path"].to_pylist(), batch["bytes"].to_pylist()):
            idx = scan_records(data)
            out.append(idx.append_column("log_path", pa.array([path] * idx.num_rows)))
        return pa.concat_tables(out) if out else (
            INDEX_SCHEMA.append(pa.field("log_path", pa.string())).empty_table())

    return ds.map_batches(scan, batch_format="pyarrow")
