"""Adaptive candidate reduction (MatchOptions.max_candidates)."""

import numpy as np
import pyarrow as pa

from routers_ray.matcher import MatchOptions, _cap_candidates


def _flat(layers_sizes, seed=3):
    rng = np.random.default_rng(seed)
    offsets = np.concatenate(([0], np.cumsum(layers_sizes))).astype(np.int64)
    n = int(offsets[-1])
    rows = np.arange(n, dtype=np.int64)
    frac = rng.random(n)
    px = rng.random(n)
    py = rng.random(n)
    dist = np.round(rng.random(n) * 10, 1)  # coarse: forces ties
    return offsets, rows, frac, px, py, dist


def test_cap_none_and_loose_are_identity():
    args = _flat([3, 5, 1, 8])
    for cap in (None, 8, 100):
        out = _cap_candidates(*args, cap)
        for a, b in zip(out, args):
            assert np.array_equal(a, b)


def test_cap_keeps_k_nearest_with_stable_ties():
    sizes = [7, 12, 2, 9, 16]
    offsets, rows, frac, px, py, dist = _flat(sizes, seed=11)
    cap = 4
    no, nr, nf, npx, npy, nd = _cap_candidates(offsets, rows, frac, px, py, dist, cap)
    assert list(np.diff(no)) == [min(s, cap) for s in sizes]
    for i, s in enumerate(sizes):
        lo, hi = offsets[i], offsets[i + 1]
        want = sorted(
            range(lo, hi), key=lambda j: (dist[j], j)
        )[: min(s, cap)]
        got = nr[no[i] : no[i + 1]]
        assert list(got) == sorted(want)  # k nearest, original order kept
        assert np.array_equal(nd[no[i] : no[i + 1]], dist[sorted(want)])


def test_cap_empty_layers_survive():
    offsets = np.array([0, 0, 3, 3], dtype=np.int64)
    rows = np.arange(3, dtype=np.int64)
    e = np.array([2.0, 1.0, 3.0])
    no, nr, *_ = _cap_candidates(offsets, rows, e, e, e, np.array([2.0, 1.0, 3.0]), 2)
    assert list(np.diff(no)) == [0, 2, 0]
    assert list(nr) == [0, 1]


def test_match_trajectories_capped_equals_per_doc(ray_session):
    """Batched kernel and per-doc path agree under the cap (same layer
    subsets feed both)."""
    from routers_ray.pipelines.queries import _match_world
    from routers_ray.matcher import MatchError, match_trajectories, match_trajectory
    from routers_ray.network import NetworkStore
    from routers_ray.oracle_match import _parse_doc_points
    import pyarrow.parquet as pq

    w = _match_world()
    store = NetworkStore(w["store"])
    docs = pq.read_table(w["paths"]["parquet"]).to_pylist()[:40]
    opts = MatchOptions(max_candidates=6)
    buffer_m = opts.threshold_cm / 100.0 + opts.search_distance_m
    pts, nets = [], []
    for d in docs:
        lons, lats = _parse_doc_points(d["spans"])
        if not lons:
            continue
        pts.append((np.asarray(lons), np.asarray(lats)))
        nets.append(
            store.network_for_bbox(
                min(lons), min(lats), max(lons), max(lats),
                buffer_m=buffer_m, search_radius_m=opts.search_distance_m,
            )
        )
    # group by identical network object (the fused path's shape)
    assert pts
    net = nets[0]
    group = [p for p, nn in zip(pts, nets) if nn is net]
    batched = match_trajectories(net, group, opts)
    for p, r in zip(group, batched):
        try:
            single = match_trajectory(net, p[0], p[1], opts)
        except MatchError as e:
            assert isinstance(r, MatchError) and r.kind == e.kind
            continue
        assert not isinstance(r, MatchError)
        assert r.cost == single.cost
        assert [(m.seq, m.edge_id, m.direction) for m in r.layers] == [
            (m.seq, m.edge_id, m.direction) for m in single.layers
        ]
