"""Frame-number joins (SURVEY.md §2.4 J1/J2/J3) and representation stats.

- ``frame_join``: per-log hash join of game frames to an image index on
  frame_number. ``how="inner"`` drops frames without images — the
  combined.log rule "only write frames which have corresponding images"
  (reference: 02_combine_logs.py:118-136); ``how="left"`` keeps them, the
  images_jpeg variant (02_combine_logs.py:165-190). Implemented as the
  tag-union-cogroup pattern: one shuffle on log_id, pandas merge inside.

- ``broadcast_lookup``: the frame_number -> frame_id dict probe
  (07_input_cognition_data_rust.py:119-124, 12_input_images.py:39-59) as a
  broadcast ray.put map. ``miss`` policy: "null" (07's None) or "error"
  (12 quits; here the row goes to an error-channel column instead).

- ``representation_stats``: per-log distinct representation names + counts
  of non-empty payloads (src/lib.rs:43-81 A1/A2) as one groupby.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def frame_join(game_ds, image_ds, how: str = "inner", by: str = "log_id",
               on: str = "frame_number"):
    """Join image-index rows onto game-frame rows per log. Image columns
    arrive suffixed ``_img``; inner drops game frames with no image."""
    if how not in ("inner", "left"):
        raise ValueError(how)

    # explicit per-side column lists (round-1 hygiene: dropna(axis=1) on a
    # group empty on one side silently dropped ALL that side's columns)
    g_names = list(game_ds.schema().names)
    i_names = list(image_ds.schema().names)

    tag_g = game_ds.map_batches(
        lambda t: t.append_column("__side", pa.array(np.zeros(t.num_rows, np.int8))),
        batch_format="pyarrow")
    tag_i = image_ds.map_batches(
        lambda t: t.append_column("__side", pa.array(np.ones(t.num_rows, np.int8))),
        batch_format="pyarrow")

    # canonical output schema + per-column null dtypes across ALL groups
    # (Arrow-output blocks must agree; a no-image group otherwise fills
    # the img columns with float64 NaN and fails unification when the
    # image side has string columns)
    def _img_dtype(t):
        """Pandas output dtype for an image column. ``left`` mode must be
        null-capable (missed rows) -> numerics widen to float64; ``inner``
        keeps native dtypes (no misses within a group)."""
        if isinstance(t, pa.DataType):
            if pa.types.is_timestamp(t):
                return "datetime64[us]"
            if pa.types.is_integer(t):
                if how == "left":
                    return "float64"
                # inner: keep the NATIVE width (int32 stays int32)
                return pa.schema([("c", t)]).empty_table().to_pandas().dtypes["c"]
            if pa.types.is_floating(t):
                return "float64"
            return object
        if pd.api.types.is_datetime64_any_dtype(t):
            return "datetime64[us]"
        if pd.api.types.is_integer_dtype(t):
            return "float64" if how == "left" else t
        if pd.api.types.is_float_dtype(t):
            return "float64"
        return object

    i_sch = image_ds.schema()
    img_dtypes = {
        (n if n not in g_names else n + "_img"): _img_dtype(t)
        for n, t in zip(i_sch.names, i_sch.types) if n not in (by, on)}
    out_cols = g_names + list(img_dtypes)

    def per_log(df: pd.DataFrame) -> pa.Table:
        game = df.loc[df["__side"] == 0, g_names]
        img = df.loc[df["__side"] == 1, i_names]
        if img.empty:
            merged = game.iloc[0:0] if how == "inner" else game.copy()
        else:
            merged = game.merge(img.drop(columns=[by]), on=on, how=how,
                                suffixes=("", "_img"))
        merged = merged.reindex(columns=out_cols)
        for c, dt in img_dtypes.items():
            if merged[c].dtype != dt and not (dt == object and
                                              merged[c].notna().any()):
                merged[c] = merged[c].astype(dt)
        # Arrow output (pandas block builder is ~20-40x slower for
        # multi-row map_groups outputs, see queries.py q31)
        return pa.Table.from_pandas(merged, preserve_index=False)

    return tag_g.union(tag_i).groupby(by).map_groups(per_log, batch_format="pandas")


def broadcast_lookup(ds, mapping: dict, key: str, out_col: str, miss: str = "null"):
    """Broadcast dict probe: adds ``out_col``; misses -> null (07's policy)
    or flagged via ``{out_col}_ok`` = False (12's quit() becomes a channel).
    The dict ships once as an Arrow (keys, vals) pair and is probed
    vectorized (pc.index_in + take) — size-guarded, never a per-row loop."""
    import pyarrow.compute as pc
    import ray

    from .broadcast import broadcast_map_from_dict, probe_values

    ref = broadcast_map_from_dict(mapping)

    def probe(t: pa.Table) -> pa.Table:
        keys, vals = ray.get(ref)
        matched = probe_values(t[key], keys, vals)
        t = t.append_column(out_col, matched)
        if miss == "error":
            t = t.append_column(f"{out_col}_ok", pc.is_valid(matched))
        return t

    return ds.map_batches(probe, batch_format="pyarrow")


def representation_stats(index_ds, by: str = "log_path"):
    """(log, name) -> frames-with-payload count (size>0) + total count —
    the A1/A2 aggregates of src/lib.rs:43-81, partial-aggregated per batch."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        df = t.select([by, "name", "size"]).to_pandas()
        df["non_empty"] = (df["size"] > 0).astype(np.int64)
        df["n"] = 1
        g = df.groupby([by, "name"], as_index=False)[["non_empty", "n"]].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    return (index_ds.map_batches(partial, batch_format="pyarrow")
            .groupby([by, "name"])
            .aggregate(Sum("non_empty", alias_name="non_empty"),
                       Sum("n", alias_name="n")))
