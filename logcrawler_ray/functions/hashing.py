"""Deterministic 64-bit hashing helpers (no xxhash in this container).

- ``hash64_str`` / ``hash64_str_array``: ONE word-folded splitmix hash with
  two bit-identical forms — a pure-int scalar and a numpy column-fold over
  Arrow UTF-8 buffers (zero-copy from a ``pa.Array``; tens of M strs/s).
  Used for URL fingerprints, host/shard routing, priorities — the serial
  executor (scalar) and the Ray engine (vector) MUST agree byte-for-byte,
  so the two forms share one spec (``_fold_words``) and a property test
  pins their equality (tests/test_functions.py).
- ``hash64_bytes``: the same word-fold over raw bytes (scalar).
- ``splitmix64``: vectorized numpy mixer for integer columns (used to derive
  per-row RNG streams and salted bucket ids without Python loops).

All hashes are seed-stable across processes and platforms (unlike Python's
``hash``), which is what checkpoint/resume equivalence requires.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_U64 = np.uint64
_M64 = (1 << 64) - 1
_SEED0 = 0x9E3779B97F4A7C15  # folded into the initial state with the seed

# word-hash spec (both forms implement exactly this):
#   b = s.encode("utf-8", "surrogatepass"); n = len(b)
#   words = little-endian uint64 of b zero-padded to 8-byte multiples
#   h = mix(seed ^ _SEED0)
#   for w in words: h = mix(h ^ w)
#   return mix(h ^ (2n + 1))        # length fold disambiguates \0 padding


def _mix_int(z: int) -> int:
    """splitmix64 finalizer on plain ints — bit-identical to splitmix64."""
    z = (z + 0x9E3779B97F4A7C15) & _M64
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & _M64
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & _M64
    return z ^ (z >> 31)


def hash64_bytes(data: bytes, seed: int = 0) -> int:
    """Word-folded hash of a byte string (shared spec above)."""
    h = _mix_int(seed ^ _SEED0)
    n = len(data)
    if n % 8:
        data = data + bytes(8 - n % 8)
    fb = int.from_bytes
    for j in range(0, len(data), 8):
        h = _mix_int(h ^ fb(data[j:j + 8], "little"))
    return _mix_int(h ^ (2 * n + 1))


def hash64_str(s: str, seed: int = 0) -> int:
    return hash64_bytes(s.encode("utf-8", "surrogatepass"), seed)


def _utf8_view(values) -> tuple[np.ndarray, np.ndarray]:
    """values (pa.Array / pa.ChunkedArray / iterable of str) ->
    (flat uint8 data, int64 offsets) — zero-copy for Arrow string input."""
    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    if not isinstance(values, pa.Array):
        vals = values if isinstance(values, list) else list(values)
        try:
            values = pa.array(vals, pa.string())
        except (UnicodeEncodeError, pa.ArrowInvalid):  # lone surrogates
            values = pa.array(
                [s.encode("utf-8", "surrogatepass") for s in vals], pa.binary())
    if pa.types.is_large_string(values.type) or pa.types.is_large_binary(values.type):
        off_dt = np.int64
    elif pa.types.is_string(values.type) or pa.types.is_binary(values.type):
        off_dt = np.int32
    else:  # dictionary / string_view etc: normalize
        values = values.cast(pa.string())
        off_dt = np.int32
    n = len(values)
    buf_off = np.frombuffer(values.buffers()[1], dtype=off_dt,
                            count=values.offset + n + 1)[values.offset:]
    offsets = buf_off.astype(np.int64)
    dbuf = values.buffers()[2]
    if dbuf is None or (n and int(offsets[-1]) == 0):
        return np.empty(0, dtype=np.uint8), offsets
    data = np.frombuffer(dbuf, dtype=np.uint8, count=int(offsets[-1]) if n else 0)
    return data, offsets


def hash64_str_array(values, seed: int = 0) -> np.ndarray:
    """Strings -> uint64 ndarray, vectorized (shared spec above).

    Accepts a ``pa.Array``/``pa.ChunkedArray`` (zero-copy over the UTF-8
    buffer — the crawl path hands Arrow columns straight in) or any iterable
    of ``str``. Column-fold: strings are length-bucketed, scattered into a
    zero-padded (n, max_words*8) uint8 block per bucket, viewed as uint64
    words, and folded one vectorized splitmix step per word column —
    O(max_words) numpy passes instead of a Python loop per string."""
    data, offsets = _utf8_view(values)
    n = len(offsets) - 1
    if n == 0:
        return np.empty(0, dtype=_U64)
    lens = np.diff(offsets)
    h0 = _U64(_mix_int(seed ^ _SEED0))

    # length-sort so each word column updates a CONTIGUOUS SUFFIX (cheap
    # slices, no boolean masks); 8 guard bytes let the tail-word gather read
    # a full 8 bytes unconditionally, masked down to the real remainder.
    order = np.argsort(lens, kind="stable")
    slens = lens[order]
    snwords = (slens + 7) >> 3
    sstarts = offsets[order]
    data = np.concatenate([data, np.zeros(8, dtype=np.uint8)])
    _col8 = np.arange(8, dtype=np.int64)

    # strings beyond 2 KB would serialize the column fold (one tiny numpy
    # pass per 8 bytes) — hash those few scalar instead
    n_vec = int(np.searchsorted(slens, 2049))
    out = np.empty(n, dtype=_U64)
    for i in range(n_vec, n):
        s, ln = int(sstarts[i]), int(slens[i])
        out[order[i]] = _U64(hash64_bytes(data[s:s + ln].tobytes(), seed))
    slens, snwords, sstarts, order = (
        slens[:n_vec], snwords[:n_vec], sstarts[:n_vec], order[:n_vec])
    n = n_vec
    if n == 0:
        return out

    h = np.full(n, h0, dtype=_U64)
    max_words = int(snwords[-1]) if n else 0
    j = 0
    while j < max_words:
        k = int(np.searchsorted(snwords, j + 1))
        w = data[(sstarts[k:] + 8 * j)[:, None] + _col8].view("<u8").ravel()
        rem = slens[k:] - 8 * j  # 1..8 for each string's LAST word
        tail = rem < 8
        if tail.any():
            keep = np.zeros_like(w)
            r = rem[tail].astype(_U64)
            keep[tail] = (_U64(1) << (_U64(8) * r)) - _U64(1)
            keep[~tail] = _U64(0xFFFFFFFFFFFFFFFF)
            w &= keep
        h[k:] = splitmix64(h[k:] ^ w)
        j += 1
    out[order] = splitmix64(h ^ (_U64(2) * slens.astype(_U64) + _U64(1)))
    return out


def md5_hash64(s: str) -> int:
    """First 8 bytes of md5, little-endian — bit-identical to DuckDB 1.0's
    ``md5_number_upper(s)``, so hashes built on this are replayable inside
    a SQL oracle (q21's minhash/simhash gate)."""
    from hashlib import md5

    return int.from_bytes(
        md5(s.encode("utf-8", "surrogatepass")).digest()[:8], "little")


def md5_hash64_array(values) -> np.ndarray:
    """Iterable of str -> uint64 ndarray of :func:`md5_hash64`."""
    from hashlib import md5

    out = np.empty(len(values), dtype=_U64)
    fb = int.from_bytes
    for i, s in enumerate(values):
        out[i] = fb(md5(s.encode("utf-8", "surrogatepass")).digest()[:8],
                    "little")
    return out


def splitmix64(x: np.ndarray | int) -> np.ndarray | int:
    """SplitMix64 finalizer — a strong, vectorizable integer mixer."""
    scalar = not isinstance(x, np.ndarray)
    z = np.asarray(x, dtype=_U64) + _U64(0x9E3779B97F4A7C15)
    with np.errstate(over="ignore"):
        z = (z ^ (z >> _U64(30))) * _U64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> _U64(27))) * _U64(0x94D049BB133111EB)
        z = z ^ (z >> _U64(31))
    return int(z) if scalar else z


def to_int64(u: np.ndarray | int):
    """Reinterpret uint64 as signed int64 (Arrow/parquet-friendly)."""
    if isinstance(u, np.ndarray):
        return u.view(np.int64) if u.dtype == _U64 else u.astype(_U64).view(np.int64)
    return int(np.uint64(u).astype(np.int64))


def to_uint64(i: np.ndarray | int):
    if isinstance(i, np.ndarray):
        return i.view(_U64)
    return int(np.int64(i).astype(_U64))
