"""Deterministic 64-bit hashing helpers (no xxhash in this container).

- ``hash64_bytes`` / ``hash64_str``: blake2b-8 digest -> uint64. C-speed per
  call; used for content hashes, host hashes, URL fingerprints.
- ``splitmix64``: vectorized numpy mixer for integer columns (used to derive
  per-row RNG streams and salted bucket ids without Python loops).
- ``hash64_str_array``: vectorized-ish hashing of a string column (single
  Python loop over a numpy object array calling C blake2b; ~1M rows/s).

All hashes are seed-stable across processes and platforms (unlike Python's
``hash``), which is what checkpoint/resume equivalence requires.
"""

from __future__ import annotations

from hashlib import blake2b

import numpy as np

_U64 = np.uint64


def hash64_bytes(data: bytes, seed: int = 0) -> int:
    key = seed.to_bytes(8, "little") if seed else b""
    return int.from_bytes(blake2b(data, digest_size=8, key=key).digest(), "little")


def hash64_str(s: str, seed: int = 0) -> int:
    return hash64_bytes(s.encode("utf-8", "surrogatepass"), seed)


def hash64_str_array(values, seed: int = 0) -> np.ndarray:
    """Iterable of str -> uint64 ndarray."""
    key = seed.to_bytes(8, "little") if seed else b""
    out = np.empty(len(values), dtype=_U64)
    fb = int.from_bytes
    for i, s in enumerate(values):
        out[i] = fb(blake2b(s.encode("utf-8", "surrogatepass"), digest_size=8, key=key).digest(), "little")
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
