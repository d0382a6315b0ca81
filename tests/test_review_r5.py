"""Regression tests for the round-5 review findings.

Each test pins one fixed defect:
- ``parse_trajectories`` on a SLICED batch (zero-copy Table.slice) pairs
  the un-rebased ListArray offsets with flatten()'s rebased values;
- ``sim._stack_embeddings`` reshaped the FULL child array of a sliced
  list column (wrong rows + wrong row count);
- the incremental-match epoch stamp silently replayed the wrong batch
  when an epoch was reused, regressed the stamp on out-of-order
  submission, and collided its -1 sentinel with legitimate epochs.
"""

import numpy as np
import pyarrow as pa
import pytest

from routers_ray.checkpoint import incremental_match
from routers_ray.network import build_network_store, synth_network
from routers_ray.spans import parse_trajectories
from routers_ray.synth import synth_corpus


@pytest.fixture(scope="module")
def world(tmp_path_factory, ray_session):
    root = tmp_path_factory.mktemp("r5rev")
    nodes, edges = synth_network(seed=52, n_cities=2, grid=(8, 8))
    store_dir = str(root / "netstore")
    build_network_store(nodes, edges, store_dir, use_ray=False)
    docs = synth_corpus(n_docs=24, seed=53, network=(nodes, edges))
    return {"root": root, "store": store_dir, "docs": docs}


def test_parse_trajectories_sliced_batch(world):
    """A zero-copy slice of a docs table (offsets[0] != 0 on the spans
    ListArray) must parse identically to the same rows parsed in full."""
    docs = world["docs"].combine_chunks()
    full = parse_trajectories(docs)
    lo, n = 7, 11
    sliced = docs.slice(lo, n)
    # precondition: the zero-copy slice carries a shifted base at the chunk
    # level (combine_chunks inside _spans_chunks currently rebases it — the
    # in-function offsets rebase keeps this safe if that ever changes)
    assert sliced["spans"].chunk(0).offsets[0].as_py() != 0
    part = parse_trajectories(sliced)
    assert part.num_rows == n
    for col in ("doc_id", "pts_lon", "pts_lat", "pts_ts", "n_pts"):
        assert part[col].to_pylist() == full[col].to_pylist()[lo : lo + n], col


def test_stack_embeddings_sliced():
    from routers_ray.sim import _stack_embeddings

    dim = 4
    vals = np.arange(10 * dim, dtype=np.float64)
    offsets = pa.array(np.arange(0, (10 + 1) * dim, dim, dtype=np.int32))
    lst = pa.ListArray.from_arrays(offsets, pa.array(vals))
    full = _stack_embeddings(lst)
    assert full.shape == (10, dim)
    sl = lst.slice(3, 5)
    mat = _stack_embeddings(sl)
    assert mat.shape == (5, dim)
    np.testing.assert_array_equal(mat, full[3:8])


def _ids(tbl):
    return tbl["doc_id"].to_pylist()


def test_epoch_reuse_with_different_batch_raises(world, tmp_path):
    docs = world["docs"].combine_chunks()
    a, b = docs.slice(0, 12), docs.slice(12, 12)
    state_dir = str(tmp_path / "reuse")
    out = incremental_match(a, world["store"], state_dir, revision_epoch=1,
                            n_state_shards=1)
    assert out.num_rows > 0
    with pytest.raises(Exception, match="reused with a different"):
        incremental_match(b, world["store"], state_dir, revision_epoch=1,
                          n_state_shards=1)


def test_out_of_order_epoch_raises(world, tmp_path):
    docs = world["docs"].combine_chunks()
    state_dir = str(tmp_path / "ooo")
    incremental_match(docs.slice(0, 12), world["store"], state_dir,
                      revision_epoch=2, n_state_shards=1)
    with pytest.raises(Exception, match="stale revision_epoch"):
        incremental_match(docs.slice(0, 12), world["store"], state_dir,
                          revision_epoch=1, n_state_shards=1)


def test_negative_epoch_rejected(world, tmp_path):
    with pytest.raises(ValueError, match="must be >= 0"):
        incremental_match(world["docs"], world["store"],
                          str(tmp_path / "neg"), revision_epoch=-1)


def test_same_epoch_same_batch_still_replays(world, tmp_path):
    """The retry-idempotency contract survives the fingerprint addition:
    an identical (epoch, batch) replays byte-identical emissions."""
    docs = world["docs"].combine_chunks()
    state_dir = str(tmp_path / "replay")
    e1 = incremental_match(docs, world["store"], state_dir, revision_epoch=1,
                           n_state_shards=2)
    e2 = incremental_match(docs, world["store"], state_dir, revision_epoch=1,
                           n_state_shards=2)
    cols = ["doc_id", "seq", "status", "edge_id", "action", "revision"]
    a = e1.select(cols).to_pandas().sort_values(cols).reset_index(drop=True)
    b = e2.select(cols).to_pandas().sort_values(cols).reset_index(drop=True)
    import pandas as pd

    pd.testing.assert_frame_equal(a, b)
