"""Similarity search over an embedding column (list<float>).

- ``topk_cosine``: brute-force baseline — the query matrix is broadcast
  once with ``ray.put`` and every batch does one float64 matmul; per-batch
  local top-k candidates are merged into the global top-k (only
  n_queries x k x n_blocks candidate rows ever reach the merge, never the
  corpus).
- ``lsh_topk_cosine``: the scale path — random-hyperplane LSH buckets
  (signed projections -> b-bit code); probing only buckets within Hamming
  radius of the query's code bounds the scanned fraction.
- ``cosine_neardup_pairs``: all pairs above a cosine threshold (embedding
  near-dup), blocked matmul.

All math in float64 (cast from the stored float32) so results are
deterministic and match the DuckDB ``list_cosine_similarity`` oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _to_matrix(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(arr)
    return flat.reshape(n, -1)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def topk_cosine(ds, queries: np.ndarray, query_ids: np.ndarray, k: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding") -> pd.DataFrame:
    """Global top-k cosine neighbours per query vector.

    Returns columns (q_id, vec_id, rank) with rank 1..k ordered by
    (similarity desc, vec_id asc) — the deterministic tie rule.
    """
    import ray

    qn = _normalize(np.asarray(queries, dtype=np.float64))
    qref = ray.put(qn)

    def local_topk(batch: pa.Table) -> pa.Table:
        q = ray.get(qref)
        m = _normalize(_to_matrix(batch[vec_col]))
        ids = batch[id_col].to_numpy()
        sims = q @ m.T  # (nq, nb)
        take = min(k, sims.shape[1])
        out_q, out_id, out_sim = [], [], []
        for qi in range(sims.shape[0]):
            s = sims[qi]
            # partial select then exact ordering with the tie rule
            cand = np.argpartition(-s, take - 1)[:take] if take < len(s) else np.arange(len(s))
            order = np.lexsort((ids[cand], -s[cand]))
            sel = cand[order]
            out_q.extend([int(query_ids[qi])] * len(sel))
            out_id.extend(ids[sel].tolist())
            out_sim.extend(s[sel].tolist())
        return pa.table({"q_id": pa.array(out_q, pa.int64()),
                         id_col: pa.array(out_id, pa.int64()),
                         "sim": pa.array(out_sim, pa.float64())})

    cands = ds.map_batches(local_topk, batch_format="pyarrow").to_pandas()
    return _merge_topk(cands, k, id_col)


def _merge_topk(cands: pd.DataFrame, k: int, id_col: str) -> pd.DataFrame:
    """Merge per-block candidate rows into the global top-k per query —
    vectorized (sort + groupby head + cumcount), no per-query Python."""
    if cands.empty:
        return pd.DataFrame({"q_id": [], id_col: [], "rank": []}).astype(np.int64)
    top = (cands.sort_values(["q_id", "sim", id_col],
                             ascending=[True, False, True], kind="mergesort")
           .groupby("q_id", sort=True).head(k).copy())
    top["rank"] = top.groupby("q_id").cumcount() + 1
    return top[["q_id", id_col, "rank"]].astype(np.int64).reset_index(drop=True)


def cosine_neardup_pairs(ds, threshold: float = 0.9, id_col: str = "vec_id",
                         vec_col: str = "embedding",
                         block_rows: int = 8192) -> pd.DataFrame:
    """All (a < b) pairs with cosine >= threshold — EXACT, distributed as a
    block-pair self-join.

    The corpus is packed into ~N/block_rows normalized (ids, matrix) blocks
    living in the OBJECT STORE (the driver streams one batch at a time while
    packing — it never holds the corpus, the round-1 scale-killer); one Ray
    task per block pair (i <= j) does the block-vs-block matmul and returns
    only the found id pairs. O(B^2) tasks is inherent to exact low-threshold
    pair generation; for high thresholds the LSH banding variants bound the
    candidate set instead.
    """
    import ray

    packed = []
    for batch in ds.select_columns([id_col, vec_col]).iter_batches(
            batch_size=block_rows, batch_format="pyarrow"):
        ids = batch[id_col].to_numpy().astype(np.int64)
        m = _normalize(_to_matrix(batch[vec_col]))
        packed.append(ray.put((ids, m)))

    @ray.remote(num_cpus=1)
    def compare(a_blk, b_blk, same: bool):
        ids_a, m_a = a_blk
        ids_b, m_b = b_blk
        sims = m_a @ m_b.T
        ai, bi = np.nonzero(sims >= threshold)
        lo = np.minimum(ids_a[ai], ids_b[bi])
        hi = np.maximum(ids_a[ai], ids_b[bi])
        keep = lo < hi  # drops self-pairs; dedupe below for same-block
        if same:
            keep &= ids_a[ai] < ids_b[bi]  # count each unordered pair once
        return lo[keep], hi[keep]

    tasks = [compare.remote(packed[i], packed[j], i == j)
             for i in range(len(packed)) for j in range(i, len(packed))]
    parts = ray.get(tasks)
    if not parts:
        return pd.DataFrame({"a": pd.Series(dtype=np.int64),
                             "b": pd.Series(dtype=np.int64)})
    a = np.concatenate([p[0] for p in parts])
    b = np.concatenate([p[1] for p in parts])
    out = pd.DataFrame({"a": a, "b": b})
    return out.sort_values(["a", "b"]).reset_index(drop=True)


# ------------------------------------------------------------------ IVF
def kmeans_fit(m: np.ndarray, k: int, n_iter: int = 10, seed: int = 11) -> np.ndarray:
    """Deterministic Lloyd's k-means on normalized vectors -> (k, d) centroids.

    Fits on a sample driver-side (centroid count is small); assignment is
    distributed. Empty clusters are re-seeded deterministically."""
    rng = np.random.default_rng(seed)
    n = len(m)
    centroids = m[rng.choice(n, size=min(k, n), replace=False)].copy()
    for _ in range(n_iter):
        sims = m @ centroids.T
        assign = sims.argmax(axis=1)
        for c in range(len(centroids)):
            members = m[assign == c]
            if len(members):
                v = members.mean(axis=0)
                nv = np.linalg.norm(v)
                if nv > 0:
                    centroids[c] = v / nv
            else:
                centroids[c] = m[int(rng.integers(0, n))]
    return centroids


def ivf_topk_cosine(ds, queries: np.ndarray, query_ids: np.ndarray, k: int = 10,
                    n_clusters: int = 16, n_probe: int = 4, seed: int = 11,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    train_sample: int = 10_000) -> pd.DataFrame:
    """IVF approximate top-k: rows are bucketed by nearest centroid; each
    query scans only its ``n_probe`` closest clusters. Same output schema
    as ``topk_cosine``. The scanned fraction is ~n_probe/n_clusters.

    Training samples ~``train_sample`` rows via DETERMINISTIC hash-based
    row sampling (splitmix of the id column modulo a rate computed from a
    cheap count) — a distributed filter pass, not a head-of-dataset
    ``limit`` whose sample would be one storage shard's rows; only the
    sampled rows reach the driver (centroids are tiny)."""
    import ray

    from ..functions.hashing import splitmix64

    # ONE upstream execution: materialize the skinny projection, then the
    # count is metadata and both the sampling scan and the query scan read
    # the materialized blocks (a lazy ds would re-execute its whole
    # pipeline three times — CLAUDE.md lazy-double-execution lesson)
    ds = ds.select_columns([id_col, vec_col]).materialize()
    n_total = ds.count()
    rate = max(1, n_total // max(1, train_sample))

    def pick(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy().astype(np.uint64)
        keep = (splitmix64(ids ^ np.uint64(seed)) % np.uint64(rate)) == 0
        return t.filter(pa.array(keep))

    sample = ds.map_batches(pick, batch_format="pyarrow").to_pandas()
    if len(sample) == 0:
        sample = ds.limit(min(train_sample, n_total)).to_pandas()
    m_train = _normalize(
        np.stack([np.asarray(v, dtype=np.float64) for v in sample[vec_col]]))
    centroids = kmeans_fit(m_train, n_clusters, seed=seed)

    qn = _normalize(np.asarray(queries, dtype=np.float64))
    q_clusters = np.argsort(-(qn @ centroids.T), axis=1)[:, :n_probe]
    ref = ray.put((qn, q_clusters, centroids))

    def local(batch: pa.Table) -> pa.Table:
        q, qc, cents = ray.get(ref)
        m = _normalize(_to_matrix(batch[vec_col]))
        ids = batch[id_col].to_numpy()
        assign = (m @ cents.T).argmax(axis=1)
        out_q, out_id, out_sim = [], [], []
        for qi in range(len(q)):
            mask = np.isin(assign, qc[qi])
            if not mask.any():
                continue
            s = q[qi] @ m[mask].T
            sub_ids = ids[mask]
            take = min(k, len(s))
            cand = np.argpartition(-s, take - 1)[:take] if take < len(s) else np.arange(len(s))
            order = np.lexsort((sub_ids[cand], -s[cand]))
            sel = cand[order]
            out_q.extend([int(query_ids[qi])] * len(sel))
            out_id.extend(sub_ids[sel].tolist())
            out_sim.extend(s[sel].tolist())
        return pa.table({"q_id": pa.array(out_q, pa.int64()),
                         id_col: pa.array(out_id, pa.int64()),
                         "sim": pa.array(out_sim, pa.float64())})

    cands = ds.map_batches(local, batch_format="pyarrow").to_pandas()
    return _merge_topk(cands, k, id_col)


# ------------------------------------------------------------------ LSH
def hyperplane_codes(m: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """(N, d) vectors x (b, d) hyperplanes -> (N,) uint64 sign codes."""
    signs = (m @ planes.T) > 0
    bits = (np.uint64(1) << np.arange(planes.shape[0], dtype=np.uint64))
    return (signs.astype(np.uint64) * bits[None, :]).sum(axis=1)


def lsh_topk_cosine(ds, queries: np.ndarray, query_ids: np.ndarray, k: int = 10,
                    n_planes: int = 12, probe_hamming: int = 2, seed: int = 7,
                    id_col: str = "vec_id", vec_col: str = "embedding") -> pd.DataFrame:
    """Approximate top-k: scan only rows whose LSH code is within
    ``probe_hamming`` of the query's code. Same output schema as
    ``topk_cosine`` (q_id, vec_id, rank)."""
    import ray

    d = np.asarray(queries).shape[1]
    rng = np.random.default_rng(seed)
    planes = rng.normal(size=(n_planes, d))
    qn = _normalize(np.asarray(queries, dtype=np.float64))
    qcodes = hyperplane_codes(qn, planes)
    ref = ray.put((qn, qcodes, planes))

    from ..functions.phash import hamming_batch

    def local(batch: pa.Table) -> pa.Table:
        q, qc, pl = ray.get(ref)
        m = _normalize(_to_matrix(batch[vec_col]))
        ids = batch[id_col].to_numpy()
        codes = hyperplane_codes(m, pl)
        out_q, out_id, out_sim = [], [], []
        for qi in range(len(q)):
            mask = hamming_batch(codes, np.full_like(codes, qc[qi])) <= probe_hamming
            if not mask.any():
                continue
            s = q[qi] @ m[mask].T
            sub_ids = ids[mask]
            take = min(k, len(s))
            cand = np.argpartition(-s, take - 1)[:take] if take < len(s) else np.arange(len(s))
            order = np.lexsort((sub_ids[cand], -s[cand]))
            sel = cand[order]
            out_q.extend([int(query_ids[qi])] * len(sel))
            out_id.extend(sub_ids[sel].tolist())
            out_sim.extend(s[sel].tolist())
        return pa.table({"q_id": pa.array(out_q, pa.int64()),
                         id_col: pa.array(out_id, pa.int64()),
                         "sim": pa.array(out_sim, pa.float64())})

    cands = ds.map_batches(local, batch_format="pyarrow").to_pandas()
    return _merge_topk(cands, k, id_col)
