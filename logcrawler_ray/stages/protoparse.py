"""Distributed NaoTH representation parsing (S3/M9 closure).

Scans each binary log (sources/naoth.py wire format), then decodes every
payload whose representation name has a registered wire schema
(codecs/protowire.py) — the Ray-side analog of the reference's
per-representation parse loops (07_input_cognition_data_rust.py:90-96 for
FrameInfo, :126-145 for the MessageToDict + blob-strip path). One task per
log; pure function of bytes.

Output is a long-form typed table (one row per parsed representation
payload) with the union of the interesting fields, null where a field does
not apply — stable schema for downstream joins and the driver's rows-only
determinism check.
"""

from __future__ import annotations

import pyarrow as pa

from ..codecs import protowire
from ..sources.naoth import scan_records, truncate_at_missing_frameinfo

PARSED_SCHEMA = pa.schema([
    ("log_no", pa.int64()),
    ("frame_number", pa.int64()),
    ("name", pa.string()),
    ("frame_time", pa.int64()),     # FrameInfo
    ("width", pa.int64()),          # Image / ImageTop
    ("height", pa.int64()),
    ("data_len", pa.int64()),
    ("n_patches", pa.int64()),      # BallCandidates (blob-stripped)
])


def parse_log(log_no: int, data: bytes) -> pa.Table:
    """One log's bytes -> parsed long-form rows (guard-truncated prefix)."""
    idx = truncate_at_missing_frameinfo(scan_records(data))
    cols: dict[str, list] = {f.name: [] for f in PARSED_SCHEMA}
    for fn, name, off, size in zip(idx["frame_number"].to_pylist(),
                                   idx["name"].to_pylist(),
                                   idx["offset"].to_pylist(),
                                   idx["size"].to_pylist()):
        if name not in protowire.PARSERS:
            continue
        try:
            msg = protowire.parse(name, data[off : off + size])
        except protowire.WireError:
            continue  # corrupt payload -> skipped, never crashes the task
        msg = protowire.strip_blobs(name, msg)
        cols["log_no"].append(log_no)
        cols["frame_number"].append(fn)
        cols["name"].append(name)
        cols["frame_time"].append(msg.get("frame_time"))
        cols["width"].append(msg.get("width"))
        cols["height"].append(msg.get("height"))
        d = msg.get("data")
        cols["data_len"].append(len(d) if d is not None else None)
        p = msg.get("patches")
        cols["n_patches"].append(len(p) if p is not None else None)
    return pa.table(cols, schema=PARSED_SCHEMA)


def parse_logs_dataset(logs_ds):
    """Dataset of (log_no, bytes) rows -> Dataset of parsed rows; one scan +
    parse task per input block, stateless."""

    def batch_parse(t: pa.Table) -> pa.Table:
        parts = [parse_log(n, d) for n, d in
                 zip(t["log_no"].to_pylist(), t["bytes"].to_pylist())]
        return pa.concat_tables(parts) if parts else PARSED_SCHEMA.empty_table()

    return logs_ds.map_batches(batch_parse, batch_format="pyarrow")
