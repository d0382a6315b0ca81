"""Stable-hash contract pinned to the reference's published vectors
(``routers_realtime/src/partition.rs:48-76``)."""

import numpy as np

from routers_ray.functions import (
    PARTITIONS,
    doc_salt,
    fnv1a,
    fnv1a_array,
    partition_of,
    splitmix64,
    zigzag_decode,
    zigzag_encode,
)


def test_fnv1a_reference_vectors():
    assert fnv1a(b"") == 0xCBF29CE484222325
    assert fnv1a(b"a") == 0xAF63DC4C8601EC8C
    assert fnv1a(b"vehicle-42") == 0xF4DCEA256EDE2C6C


def test_fnv1a_array_matches_scalar():
    strs = ["", "a", "vehicle-42", "doc-42-000123"]
    arr = fnv1a_array(strs)
    assert arr.tolist() == [fnv1a(s) for s in strs]


def test_splitmix_reference_vectors():
    assert int(splitmix64(0)) == 0
    assert int(splitmix64(1)) == 0x5692161D100B05E5
    assert int(splitmix64(0xDEADBEEF)) == 0x4E062702EC929EEA
    assert int(splitmix64(0xFFFFFFFFFFFFFFFF)) == 0xB4D055FCF2CBBD7B


def test_partition_reference_vectors():
    assert int(partition_of(1)) == 485
    assert int(partition_of(0xDEADBEEF)) == 746
    assert int(partition_of(0xFFFFFFFFFFFFFFFF)) == 379


def test_sequential_ids_spread():
    """partition.rs:69-90: sequential ids spread across partitions."""
    ids = np.arange(PARTITIONS * 20, dtype=np.uint64)
    counts = np.bincount(partition_of(ids).astype(np.int64), minlength=PARTITIONS)
    assert counts.min() >= 5 and counts.max() <= 80


def test_doc_salt_range_and_determinism():
    ids = [f"doc-{i}" for i in range(100)]
    s1 = doc_salt(ids, np.full(100, 4))
    s2 = doc_salt(ids, np.full(100, 4))
    assert (s1 == s2).all()
    assert s1.min() >= 0 and s1.max() < 4
    assert len(set(s1.tolist())) == 4  # all salts used


def test_zigzag_roundtrip():
    v = np.array([0, -1, 1, -2, 2, 2**30, -(2**30)], dtype=np.int32)
    assert (zigzag_decode(zigzag_encode(v)) == v).all()
    assert zigzag_encode(np.array([0, -1, 1, -2, 2])).tolist() == [0, 1, 2, 3, 4]
