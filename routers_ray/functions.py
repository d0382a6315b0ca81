"""Stable hashing + bit-math scalar functions (vectorized).

The fleet-wide stable hashing contract of the reference
(``routers_realtime/src/partition.rs:18-45``): FNV-1a 64 of the upstream
string id, splitmix64 finalizer before any modulo. Pinned to the reference's
published test vectors (``partition.rs:48-76``) by ``tests/test_functions.py``.

Plus the tile-side bit math: zig-zag encoding
(``routers_tiles/src/primitives/layer.rs:78-80``) and quadkey packing
(covered in :mod:`routers_ray.cells`).
"""

from __future__ import annotations

import numpy as np

PARTITIONS = 1024  # partition.rs:13

_FNV_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x00000100000001B3)


def fnv1a(data: bytes | str) -> int:
    """FNV-1a 64 of one byte string (partition.rs:18-26)."""
    if isinstance(data, str):
        data = data.encode("utf-8")
    h = 0xCBF29CE484222325
    for b in data:
        h ^= b
        h = (h * 0x00000100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def fnv1a_array(strings) -> np.ndarray:
    """Vectorized FNV-1a 64 over an array of strings.

    Processes byte-position-at-a-time over a padded byte matrix — O(max_len)
    numpy passes instead of a per-row Python loop.
    """
    s = [x.encode("utf-8") if isinstance(x, str) else bytes(x) for x in strings]
    n = len(s)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    lens = np.fromiter((len(x) for x in s), dtype=np.int64, count=n)
    maxlen = int(lens.max()) if n else 0
    mat = np.zeros((n, maxlen), dtype=np.uint8)
    for i, b in enumerate(s):  # packing loop only; hashing below is vectorized
        mat[i, : len(b)] = np.frombuffer(b, dtype=np.uint8)
    h = np.full(n, _FNV_OFFSET, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(maxlen):
            active = lens > j
            h[active] = (h[active] ^ mat[active, j].astype(np.uint64)) * _FNV_PRIME
    return h


def splitmix64(x) -> np.ndarray:
    """splitmix64 finalizer (partition.rs:28-37), vectorized."""
    x = np.asarray(x, dtype=np.uint64).copy()
    with np.errstate(over="ignore"):
        x ^= x >> np.uint64(30)
        x *= np.uint64(0xBF58476D1CE4E5B9)
        x ^= x >> np.uint64(27)
        x *= np.uint64(0x94D049BB133111EB)
        x ^= x >> np.uint64(31)
    return x


def partition_of(vehicle_id, partitions: int = PARTITIONS) -> np.ndarray:
    """``splitmix64(id) % partitions`` (partition.rs:39-45)."""
    return splitmix64(vehicle_id) % np.uint64(partitions)


def doc_salt(doc_ids, n_salt) -> np.ndarray:
    """Per-doc salt within a hot cell: ``splitmix64(fnv1a(doc_id)) % n_salt``.

    The explicit skew-handling key demanded by the north rule — documents
    split across salts, the cell's map replicated per salt (SURVEY §4 skew).
    """
    h = splitmix64(fnv1a_array(doc_ids))
    n = np.asarray(n_salt, dtype=np.uint64)
    return (h % np.maximum(n, np.uint64(1))).astype(np.int32)


def zigzag_encode(v) -> np.ndarray:
    """MVT zig-zag ``(v << 1) ^ (v >> 31)`` (layer.rs:78-80)."""
    v = np.asarray(v, dtype=np.int32)
    return ((v.astype(np.int64) << 1) ^ (v.astype(np.int64) >> 31)).astype(np.uint32)


def zigzag_decode(v) -> np.ndarray:
    v = np.asarray(v, dtype=np.uint32).astype(np.int64)
    return ((v >> 1) ^ -(v & 1)).astype(np.int32)
