"""Regression tests for the round-1 ADVICE findings.

Each test pins one fixed divergence:
- adjacent-edge routed hops price the reference's EMPTY map_path heading
  chain (``map_path/entity.rs:246-267``), not a phantom corner at the
  shared node;
- ``match_trajectories``' per-doc fallback keeps global seq numbering
  under ``max_layers`` windowing;
- tab-separated point-lookalike spans are inert (regex and splitter agree);
- candidate queries beyond the bin build radius fail loudly;
- the shard/predicate caches are true LRUs (hits refresh recency).
"""

import math

import numpy as np
import pytest

from routers_ray.geo import angular_complexity, bearing_deg, haversine_m
from routers_ray.matcher import (
    MatchOptions,
    MatchedLayer,
    _predicates,
    _TrajectoryContext,
    generate_layers,
    match_trajectories,
    match_trajectory,
)
from routers_ray.trellis import MAX_WEIGHT

from test_mock_scenarios import mock_net


def _l_corner():
    """Two one-way edges meeting at a right angle: A 1→2 east, B 2→3 north.
    Long enough (~1.1 km) that a point near one edge's middle is far outside
    the other's 50 m search radius."""
    return mock_net(
        {1: (0.0, 0.0), 2: (0.01, 0.0), 3: (0.01, 0.01)},
        [(1, 2, False), (2, 3, False)],
    )


def test_adjacent_edge_hop_uses_direct_heading_chain():
    """source.edge.target == target.edge.source ⇒ the reference's routed
    path has zero edges and ``path_nodes()`` is empty, so the heading chain
    is [h_s, bearing(s_pos→t_pos), h_t] — NOT the s_pos→node / node→t_pos
    legs (ADVICE round 1, matcher.py:434)."""
    net = _l_corner()
    lons = [0.003, 0.0102]
    lats = [0.0002, 0.007]
    opts = MatchOptions()
    layers = generate_layers(net, lons, lats, opts)
    assert [ly.edge_rows.size for ly in layers] == [1, 1]

    ctx = _TrajectoryContext(net, layers, opts)
    t = ctx.weigh_all()
    got = int(t.boundaries[0][0, 0])

    # expected cost from the reference chain, recomputed from first principles
    s_row = int(layers[0].edge_rows[0])
    t_row = int(layers[1].edge_rows[0])
    s_lon, s_lat = float(layers[0].pos_lon[0]), float(layers[0].pos_lat[0])
    t_lon, t_lat = float(layers[1].pos_lon[0]), float(layers[1].pos_lat[0])
    h_s = float(net.heading[s_row])
    h_t = float(net.heading[t_row])
    straight = float(haversine_m(s_lon, s_lat, t_lon, t_lat))
    # shared node 2
    n_lon, n_lat = 0.01, 0.0
    tail_s = float(haversine_m(s_lon, s_lat, n_lon, n_lat))
    tail_t = float(haversine_m(n_lon, n_lat, t_lon, t_lat))
    route_len = tail_s + tail_t  # empty interior path
    dev = straight / route_len
    turn = angular_complexity(
        np.array([s_lon, t_lon]), np.array([s_lat, t_lat]),
        start_heading=h_s, end_heading=h_t,
    )
    cont = 1.0  # equal weights
    score = math.sqrt(
        min(max(dev, 1e-6), 1.0) * min(max(turn, 1e-6), 1.0) * cont
    )
    expected = min(int(100.0 / min(max(score, 1e-6), 1.0)), MAX_WEIGHT)
    assert got == expected

    # and it differs from the buggy corner-pricing chain (the corner at the
    # shared node adds a ~90° delta the reference never sees)
    bad_turn = angular_complexity(
        np.array([s_lon, n_lon, t_lon]), np.array([s_lat, n_lat, t_lat]),
        start_heading=h_s, end_heading=h_t,
    )
    assert bad_turn != pytest.approx(turn)


def test_fallback_seq_numbering_stays_global():
    """A doc with an unanchored point + max_layers takes the per-doc
    fallback inside match_trajectories; its seqs must be global indices,
    identical to a direct match_trajectory call on the full arrays."""
    net = mock_net(
        {1: (-118.15, 34.15), 2: (-118.16, 34.15), 3: (-118.17, 34.15)},
        [(1, 2, False), (2, 3, False)],
    )
    lons = [-118.151, -118.153, -118.50, -118.157, -118.160, -118.163, -118.166]
    lats = [34.1502] * 7
    lats[2] = 35.0  # far off-network → unanchored
    opts = MatchOptions(max_layers=5, drop_unanchored=True)

    direct = match_trajectory(net, lons, lats, opts)
    [batched] = match_trajectories(net, [(lons, lats)], opts)
    assert not isinstance(batched, Exception)
    assert [ml.seq for ml in batched.layers] == [ml.seq for ml in direct.layers]
    assert batched.dropped_seqs == direct.dropped_seqs
    # seqs are global (window covers the tail of the 7-point doc)
    assert [ml.seq for ml in direct.layers] == [3, 4, 5, 6]


def test_tab_separated_point_lookalike_is_inert():
    """spans regex uses literal spaces like the splitter — a tab-separated
    lookalike is an ordinary text span, not a batch-killing poison pill."""
    import pyarrow as pa

    from routers_ray.spans import DOCS_SCHEMA, parse_trajectories

    docs = pa.table(
        {
            "doc_id": ["a"],
            "spans": [
                [
                    {"kind": "text", "text": "-118.0\t34.0\t1", "media_ref": "", "offset": 0},
                    {"kind": "text", "text": "-118.0 34.0 2", "media_ref": "", "offset": 1},
                ]
            ],
        },
        schema=DOCS_SCHEMA,
    )
    out = parse_trajectories(docs)
    assert out["n_pts"].to_pylist() == [1]  # only the space-separated span


def test_distance_beyond_bin_radius_raises():
    net = _l_corner()  # built with the default 50 m radius
    with pytest.raises(ValueError):
        net.candidates_at(0.003, 0.0002, distance_m=500.0)
    with pytest.raises(ValueError):
        net.candidates_batch(np.array([0.003]), np.array([0.0002]), 500.0)


def test_predicate_cache_is_true_lru():
    net = _l_corner()
    net._pred_cache.clear()
    _predicates(net, 0, 2_000_0 * 100)
    _predicates(net, 1, 2_000_0 * 100)
    _predicates(net, 0, 2_000_0 * 100)  # hit → refresh recency
    assert list(net._pred_cache) == [1, 0]


def test_network_store_caches_are_true_lru(tmp_path):
    import pyarrow as pa

    from routers_ray.network import NetworkStore, build_network_store

    # tiny 2-cell network store
    nodes = {1: (0.0, 0.0), 2: (0.01, 0.0), 3: (0.01, 0.01), 4: (40.0, 40.0), 5: (40.01, 40.0)}
    edges = [(1, 2), (2, 3), (4, 5)]
    nodes_tbl = pa.table(
        {
            "node_id": pa.array(list(nodes), pa.int64()),
            "lon": pa.array([v[0] for v in nodes.values()], pa.float64()),
            "lat": pa.array([v[1] for v in nodes.values()], pa.float64()),
        }
    )
    edges_tbl = pa.table(
        {
            "edge_id": pa.array(range(len(edges)), pa.int64()),
            "src": pa.array([a for a, _ in edges], pa.int64()),
            "dst": pa.array([b for _, b in edges], pa.int64()),
            "weight": pa.array([1] * len(edges), pa.uint32()),
            "dir": pa.array([0] * len(edges), pa.uint8()),
            "accessible": pa.array([True] * len(edges), pa.bool_()),
        }
    )
    store_dir = str(tmp_path / "store")
    build_network_store(nodes_tbl, edges_tbl, store_dir, use_ray=False)
    store = NetworkStore(store_dir)
    cells = sorted(store._known)
    assert len(cells) >= 2
    a, b = cells[0], cells[1]
    store._load_cell(a)
    store._load_cell(b)
    store._load_cell(a)  # hit → refresh
    order = list(store._cells)
    assert order[-1] == a

    store.network_for_cells((a,))
    store.network_for_cells((b,))
    store.network_for_cells((a,))
    net_order = list(store._networks)
    assert net_order[-1][0] == (a,)


def test_window_network_keying_shares_cache_and_preserves_results():
    """network_for_doc keys docs by their anchor cell's 9-cell window: docs
    with different bboxes in one cell share a cache entry; a long
    trajectory falls back to its exact bbox cell set; results are identical
    to explicit bbox keying."""
    import pyarrow as pa

    from routers_ray.matcher import MatchOptions, match_trajectory
    from routers_ray.network import NetworkStore, build_network_store, synth_network
    from routers_ray.synth import synth_corpus  # noqa: F401 (world helpers)
    import tempfile

    nodes, edges = synth_network(seed=3, n_cities=1, grid=(6, 6))
    store_dir = tempfile.mkdtemp(prefix="winkey_store_")
    build_network_store(nodes, edges, store_dir, use_ray=False)
    store = NetworkStore(store_dir)

    lon0 = float(np.asarray(nodes["lon"]).mean())
    lat0 = float(np.asarray(nodes["lat"]).mean())
    opts = MatchOptions()
    buffer_m = opts.threshold_cm / 100.0 + opts.search_distance_m

    # two short docs with DIFFERENT bboxes inside the same anchor window
    d1 = (np.array([lon0, lon0 + 1e-4]), np.array([lat0, lat0]))
    d2 = (np.array([lon0 + 2e-4, lon0 + 3e-4]), np.array([lat0 + 1e-4, lat0 + 1e-4]))
    n1 = store.network_for_doc(*d1, buffer_m=buffer_m)
    hits0 = store.net_cache_hits
    n2 = store.network_for_doc(*d2, buffer_m=buffer_m)
    assert n2 is n1, "same-window docs must share one cached network"
    assert store.net_cache_hits == hits0 + 1

    # results identical to bbox keying
    for ll, la in (d1, d2):
        bbox_net = store.network_for_bbox(
            ll.min(), la.min(), ll.max(), la.max(), buffer_m=buffer_m
        )
        a = match_trajectory(n1, ll, la, opts)
        b = match_trajectory(bbox_net, ll, la, opts)
        assert [(m.edge_id, m.direction) for m in a.layers] == [
            (m.edge_id, m.direction) for m in b.layers
        ]
        assert a.cost == b.cost

    # a corridor-crossing doc (wider than the window) falls back to bbox keys
    span = 0.2  # degrees — far beyond one partition cell + window
    dl = (np.array([lon0, lon0 + span]), np.array([lat0, lat0]))
    before = dict(store._networks)
    try:
        store.network_for_doc(*dl, buffer_m=buffer_m)
    except ValueError:
        pass  # bbox may exceed the covering cap — fallback path still taken
    assert any(k not in before for k in store._networks), "fallback entry expected"


# ---------------------------------------------------------------------------
# round-2 ADVICE regressions (dated-tile key packing, yy pivot, C overflow)
# ---------------------------------------------------------------------------


def test_dated_tiles_survive_post_2027_dates(ray_session):
    """materialize_dated_tiles used a hand-packed u64 giving the yymmdd
    date only 18 bits — any date >= 2027-01-01 lost its top bits. The
    lexsort rewrite must group and order such dates correctly."""
    import pyarrow as pa
    import ray.data as rd

    from routers_ray.tiles import DatedRange, materialize_dated_tiles

    def us(day_iso):
        import datetime as dt

        d = dt.datetime.fromisoformat(day_iso + "T12:00:00")
        return int(d.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)

    pts = pa.table(
        {
            "lon": pa.array([10.0, 10.0, 10.0, 150.0]),
            "lat": pa.array([20.0, 20.0, 20.0, -30.0]),
            "ts_us": pa.array(
                [us("2027-01-01"), us("2027-01-01"), us("2030-06-15"), us("2027-01-01")],
                pa.int64(),
            ),
        }
    )
    r = DatedRange.parse("2026-12-31", "2031-01-01", "0-1-2-3-4-5-6")
    t = materialize_dated_tiles(rd.from_arrow(pts), [7], [r])
    rows = sorted(
        zip(t["date"].to_pylist(), t["x"].to_pylist(), t["n_points"].to_pylist())
    )
    # three distinct (tile, date) groups with exact counts
    assert [d for d, _, _ in rows] == [270101, 270101, 300615]
    assert [n for _, _, n in rows] == [1, 2, 1] or [n for _, _, n in rows] == [2, 1, 1]
    # final order is (z, hilbert, date)
    import numpy as np

    zz = np.asarray(t["z"], dtype=np.int64)
    hh = np.asarray(t["hilbert"]).astype(np.uint64)
    dd = np.asarray(t["date"], dtype=np.int64)
    order = np.lexsort((dd, hh, zz))
    assert (order == np.arange(len(t))).all()


def test_dated_tiles_shuffle_matches_driver(ray_session):
    """merge="shuffle" (groupby + distributed sort) returns the same rows
    in the same (z, hilbert, date) order as the driver merge."""
    import pyarrow as pa
    import ray.data as rd

    from routers_ray.tiles import DatedRange, materialize_dated_tiles

    rng = np.random.default_rng(11)
    n = 400
    base = 1704067200000000  # 2024-01-01
    pts = pa.table(
        {
            "lon": pa.array(rng.uniform(-10, 10, n)),
            "lat": pa.array(rng.uniform(-10, 10, n)),
            "ts_us": pa.array(
                base + rng.integers(0, 40, n) * 86_400_000_000, pa.int64()
            ),
        }
    )
    r = DatedRange.parse("2024-01-01", "2024-02-29", "0-1-2-3-4-5-6")
    drv = materialize_dated_tiles(rd.from_arrow(pts), [5, 7], [r], merge="driver")
    shf = materialize_dated_tiles(rd.from_arrow(pts), [5, 7], [r], merge="shuffle")
    import pyarrow as pa2

    shf_t = pa2.concat_tables(
        [b for b in shf.iter_batches(batch_format="pyarrow")]
    ).select(drv.column_names)
    assert drv.num_rows == shf_t.num_rows
    for col in drv.column_names:
        assert drv[col].to_pylist() == shf_t[col].to_pylist(), col


def test_scan_dated_tiles_pre2000_roundtrip(ray_session):
    """yymmdd 70..99 must decode as 1970-1999 (strftime '%y' pivot), so a
    1975 point survives a 1975 DatedRange scan."""
    import pyarrow as pa
    import ray.data as rd

    from routers_ray.tiles import (
        DatedRange,
        lonlat_to_tile,
        materialize_dated_tiles,
        scan_dated_tiles,
    )

    import datetime as dt

    ts = int(
        dt.datetime(1975, 1, 15, 12, tzinfo=dt.timezone.utc).timestamp() * 1_000_000
    )
    pts = pa.table(
        {
            "lon": pa.array([10.0]),
            "lat": pa.array([20.0]),
            "ts_us": pa.array([ts], pa.int64()),
        }
    )
    r = DatedRange.parse("1975-01-01", "1975-01-31", "0-1-2-3-4-5-6")
    t = materialize_dated_tiles(rd.from_arrow(pts), [7], [r])
    assert t.num_rows == 1 and t["date"].to_pylist() == [750115]
    x7, y7 = (int(v) for v in lonlat_to_tile(10.0, 20.0, 7))
    hit = scan_dated_tiles(t, 5, x7 >> 2, y7 >> 2, [r], storage_zoom=7)
    assert hit.num_rows == 1


def test_dated_partials_zoom_bound():
    """x/y get 20 bits in the partial group key — deeper zooms must fail
    loudly instead of aliasing tiles."""
    import pyarrow as pa

    from routers_ray.tiles import dated_tile_partials

    pts = pa.table(
        {
            "lon": pa.array([10.0]),
            "lat": pa.array([20.0]),
            "ts_us": pa.array([1704187200000000], pa.int64()),
        }
    )
    # ValueError, not AssertionError: the guard must survive python -O
    with pytest.raises(ValueError):
        dated_tile_partials(pts, [21])


# ---------------------------------------------------------------------------
# round-4 ADVICE fixes
# ---------------------------------------------------------------------------


def test_kmeans_more_centroids_than_sample():
    """n_centroids > sample rows collapses to one centroid per row instead
    of IndexError-ing in the empty-cluster reseed loop (ADVICE r03 #1)."""
    from routers_ray.sim import kmeans_fit

    sample = np.asarray([[1.0, 0.0], [0.0, 1.0], [1.0, 1.0]])
    cents = kmeans_fit(sample, n_centroids=16, seed=1)
    assert cents.shape == (3, 2) and np.isfinite(cents).all()
    with pytest.raises(ValueError):
        kmeans_fit(np.empty((0, 2)), n_centroids=4)


def test_opening_hours_point_at_midnight_wrap():
    """'Mo 23:00' spans 23:00-24:00 as an overnight range ending at 00:00,
    so the end-inclusive check also matches minute 0 of the same weekday
    (opening_hours.rs:276-283; ADVICE r03 #3)."""
    from routers_ray.access import parse_opening_hours

    oh = parse_opening_hours("Mo 23:00")
    jan6_mon_2025 = 20094  # days since epoch, a Monday
    us = 86_400_000_000

    def ts(day, minute):
        return np.int64(day) * us + np.int64(minute) * 60_000_000

    out = oh.is_open_at(
        np.array([ts(jan6_mon_2025, 23 * 60 + 30),  # Mo 23:30 — open
                  ts(jan6_mon_2025, 0),             # Mo 00:00 — minute 0 matches
                  ts(jan6_mon_2025, 22 * 60),       # Mo 22:00 — closed
                  ts(jan6_mon_2025 + 1, 0)])        # Tu 00:00 — wrong weekday
    )
    assert out.tolist() == [True, True, False, False]


def test_c_kernel_huge_weights_match_python():
    """Edge weights near uint32 max made the old int64 avg*avg overflow
    (UB); the double-squared form must stay bit-equal to the Python path."""
    from routers_ray._ckernels import bounded_dijkstra_c, have_ckernel
    from routers_ray.csr import bounded_dijkstra_py, build_csr

    if not have_ckernel():
        pytest.skip("no C toolchain")
    rng = np.random.default_rng(23)
    n, m = 40, 160
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    w = rng.integers(2**31, 2**32 - 1, m, dtype=np.int64).astype(np.uint32)
    acc = np.ones(m, dtype=bool)
    lon = rng.uniform(-118.6, -118.4, n)
    lat = rng.uniform(33.9, 34.1, n)
    csr = build_csr(np.arange(n), lon, lat, src, dst, w,
                    np.zeros(m, np.uint8), np.arange(m), acc)
    for root in range(6):
        pp, dp = bounded_dijkstra_py(csr, root, 1e12)
        pc_, dc = bounded_dijkstra_c(csr, root, 1e12)
        assert dp == dc
        assert pp == pc_


def test_c_weigh_cost_matches_numpy():
    """The compiled per-pair cost kernel produces BIT-IDENTICAL match
    results (edges, costs, hop geometry) to the NumPy fold across random
    synth worlds — libm's cos/sqrt/fmod equal numpy's float64 ufuncs on
    this platform and the accumulation order is preserved."""
    import tempfile

    import routers_ray.matcher as M
    from routers_ray._ckernels import have_ckernel
    from routers_ray.network import NetworkStore, build_network_store
    from routers_ray.synth import synth_corpus, synth_network

    if not have_ckernel():
        pytest.skip("no C toolchain")
    nodes, edges = synth_network(seed=33, n_cities=2, grid=(10, 10))
    corpus = synth_corpus(n_docs=40, seed=33, network=(nodes, edges))
    sd = tempfile.mkdtemp(prefix="weighc_store_")
    build_network_store(nodes, edges, sd, use_ray=False)
    from routers_ray.spans import parse_trajectories

    parsed = parse_trajectories(corpus)
    opts = M.MatchOptions()
    buffer_m = opts.threshold_cm / 100.0 + opts.search_distance_m

    def run_all():
        store = NetworkStore(sd)
        out = []
        for i in range(parsed.num_rows):
            lons = np.asarray(parsed["pts_lon"][i].as_py(), dtype=np.float64)
            lats = np.asarray(parsed["pts_lat"][i].as_py(), dtype=np.float64)
            if lons.size < 2:
                continue
            net = store.network_for_doc(lons, lats, buffer_m=buffer_m)
            try:
                r = M.match_trajectory(net, lons, lats, opts)
                out.append(
                    (
                        r.cost,
                        [(m.edge_id, m.direction, m.snap_lon, m.snap_lat,
                          m.hop_lons.tolist()) for m in r.layers],
                    )
                )
            except M.MatchError as e:
                out.append(("err", e.kind))
        return out

    old = M._USE_WEIGH_CKERNEL
    try:
        M._USE_WEIGH_CKERNEL = True
        a = run_all()
        M._USE_WEIGH_CKERNEL = False
        b = run_all()
    finally:
        M._USE_WEIGH_CKERNEL = old
    assert a == b


def test_hops_for_chosen_matches_per_hop_geometry():
    """The r04 vectorized hop assembly must equal one hop_geometry call per
    hop (values, lengths and dedup) on real matched paths."""
    import numpy as np

    from routers_ray.matcher import (
        MatchOptions,
        _TrajectoryContext,
        _chosen_arrays,
        generate_layers,
    )
    from routers_ray.network import synth_network
    from routers_ray.network import CellNetwork
    from routers_ray.synth import synth_corpus
    from routers_ray.spans import parse_trajectories
    import pyarrow as pa

    from routers_ray.network import fatten_edges

    nodes, edges = synth_network(seed=7, n_cities=1, grid=(8, 8))
    net = CellNetwork.from_edge_rows(fatten_edges(nodes, edges))
    docs = synth_corpus(n_docs=24, seed=7, network=(nodes, edges))
    parsed = parse_trajectories(docs)
    opts = MatchOptions()
    from routers_ray.matcher import match_trajectory, MatchError
    from routers_ray.trellis import viterbi_solve

    checked = 0
    for i in range(parsed.num_rows):
        ll = np.asarray(parsed["pts_lon"][i].as_py())
        la = np.asarray(parsed["pts_lat"][i].as_py())
        if ll.size < 3:
            continue
        layers = generate_layers(net, ll, la, opts)
        if any(ly.edge_rows.size == 0 for ly in layers):
            continue
        ctx = _TrajectoryContext(net, layers, opts)
        t = ctx.weigh_all()
        if t.pending_boundaries():
            continue
        path, _cost = viterbi_solve(t)
        rows, frac, lons, lats = _chosen_arrays(layers, path)
        fl, fa, lens = ctx.hops_for_chosen(rows, frac, lons, lats)
        offs = np.concatenate(([0], np.cumsum(lens)))
        assert lens.size == len(layers) - 1
        for k in range(1, len(layers)):
            exp_lons, exp_lats = ctx.hop_geometry(
                k - 1, int(path[k - 1]), k, int(path[k])
            )
            a, b = offs[k - 1], offs[k]
            assert np.array_equal(fl[a:b], exp_lons), (i, k)
            assert np.array_equal(fa[a:b], exp_lats), (i, k)
            checked += 1
    assert checked > 50  # the corpus must actually exercise the path
