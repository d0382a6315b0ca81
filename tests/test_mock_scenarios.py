"""Mock-network matching scenarios — ports of the reference integration
tests with the same coordinates
(``routers_transition/tests/matching.rs``, ``tests/streaming.rs``)."""

import numpy as np
import pyarrow as pa
import pytest

from routers_ray.matcher import MatchError, MatchOptions, match_trajectory
from routers_ray.network import CellNetwork


def mock_net(nodes: dict, edges: list, weights=None) -> CellNetwork:
    """nodes: {id: (lon, lat)}; edges: [(src, dst, bidirectional)]."""
    eid, src, dst, w, dr = [], [], [], [], []
    for k, (a, b, bidi) in enumerate(edges):
        wt = 1 if weights is None else weights[k]
        eid.append(k), src.append(a), dst.append(b), w.append(wt), dr.append(0)
        if bidi:
            eid.append(k), src.append(b), dst.append(a), w.append(wt), dr.append(1)
    n = len(eid)
    tbl = pa.table(
        {
            "edge_id": pa.array(eid, pa.int64()),
            "src": pa.array(src, pa.int64()),
            "dst": pa.array(dst, pa.int64()),
            "weight": pa.array(w, pa.uint32()),
            "dir": pa.array(dr, pa.uint8()),
            "accessible": pa.array([True] * n, pa.bool_()),
            "ax": pa.array([nodes[s][0] for s in src], pa.float64()),
            "ay": pa.array([nodes[s][1] for s in src], pa.float64()),
            "bx": pa.array([nodes[d][0] for d in dst], pa.float64()),
            "by": pa.array([nodes[d][1] for d in dst], pa.float64()),
        }
    )
    return CellNetwork.from_edge_rows(tbl)


def straight_road() -> CellNetwork:
    # matching.rs:12-19: 1→2→3 along lat 34.15
    return mock_net(
        {1: (-118.15, 34.15), 2: (-118.16, 34.15), 3: (-118.17, 34.15)},
        [(1, 2, False), (2, 3, False)],
    )


def test_straight_road_one_element_per_point():
    """matching.rs:33-57: 4 pts drifted +0.0003° north snap to the road."""
    net = straight_road()
    lons = [-118.151, -118.155, -118.160, -118.165]
    lats = [34.1503] * 4
    res = match_trajectory(net, lons, lats)
    assert len(res.layers) == 4
    # all matched edges belong to the road
    for ml in res.layers:
        assert (ml.src, ml.dst) in {(1, 2), (2, 3)}
    # snapped onto lat 34.15 (within noise of the projection)
    for ml in res.layers:
        assert ml.snap_lat == pytest.approx(34.15, abs=1e-6)


def test_intermediate_edge_traversal():
    """matching.rs:61-84: two points on non-adjacent edges traverse the
    middle edge — hop geometry covers nodes 2 and 3."""
    net = mock_net(
        {1: (-118.14, 34.15), 2: (-118.15, 34.15), 3: (-118.16, 34.15), 4: (-118.17, 34.15)},
        [(1, 2, False), (2, 3, False), (3, 4, False)],
    )
    res = match_trajectory(net, [-118.141, -118.169], [34.1503, 34.1503])
    assert len(res.layers) == 2
    hop = res.layers[1]
    assert hop.hop_lons.size >= 3  # src pos + ≥1 interior node + tgt pos
    # interior nodes 2 (-118.15) and 3 (-118.16) appear in the hop geometry
    assert any(abs(x - -118.15) < 1e-9 for x in hop.hop_lons)
    assert any(abs(x - -118.16) < 1e-9 for x in hop.hop_lons)


def test_t_junction_no_south_dip():
    """matching.rs:87-120: straight-west track never touches node 4."""
    net = mock_net(
        {1: (-118.10, 34.15), 2: (-118.13, 34.15), 3: (-118.16, 34.15), 4: (-118.13, 34.12)},
        [(1, 2, True), (2, 3, True), (2, 4, True)],
    )
    lons = [-118.101, -118.111, -118.121, -118.131, -118.141, -118.151, -118.158]
    lats = [34.1503] * 7
    res = match_trajectory(net, lons, lats)
    assert res.layers
    for ml in res.layers:
        assert 4 not in (ml.src, ml.dst)


def bent_road() -> CellNetwork:
    """streaming.rs:17-29: 5-node bent road (west, south, west) — exact
    reference coordinates."""
    return mock_net(
        {
            1: (-118.15, 34.15),
            2: (-118.16, 34.15),
            3: (-118.17, 34.15),
            4: (-118.17, 34.14),
            5: (-118.18, 34.14),
        },
        [(1, 2, True), (2, 3, True), (3, 4, True), (4, 5, True)],
    )


# streaming.rs:31-39 trajectory
BENT_LONS = [-118.151, -118.155, -118.165, -118.170, -118.172, -118.179]
BENT_LATS = [34.1503, 34.1503, 34.1503, 34.1490, 34.1403, 34.1403]


def test_bent_road_full_match():
    net = bent_road()
    res = match_trajectory(net, BENT_LONS, BENT_LATS)
    assert len(res.layers) == 6
    seq_edges = [(ml.src, ml.dst) for ml in res.layers]
    # follows the bent road in order
    assert seq_edges[0] in {(1, 2), (2, 1)}
    assert seq_edges[-1] in {(4, 5), (5, 4)}


def test_highway_preferred_over_offramp():
    """matching.rs:120-152: the shorter direct highway beats a longer
    offramp detour — node 5 never appears in the hop geometry."""
    net = mock_net(
        {
            1: (-118.100, 34.150),
            2: (-118.105, 34.150),
            3: (-118.109, 34.149),
            4: (-118.113, 34.148),
            5: (-118.107, 34.146),
        },
        [(1, 2, True), (2, 3, True), (3, 4, True), (2, 5, False), (5, 4, False)],
    )
    res = match_trajectory(net, [-118.102, -118.111], [34.1503, 34.1488])
    assert res.layers
    # interpolated geometry must not pass through node 5's position
    for ml in res.layers:
        for x, y in zip(ml.hop_lons, ml.hop_lats):
            assert not (abs(x - -118.107) < 1e-9 and abs(y - 34.146) < 1e-9), (
                "offramp detour node (5) must not appear"
            )
        assert 5 not in (ml.src, ml.dst)


def test_follows_turn_at_junction():
    """matching.rs:155-186: trip momentum beats the closer straight
    candidate when the GPS turns north at the junction."""
    net = mock_net(
        {1: (-118.10, 34.15), 2: (-118.13, 34.15), 3: (-118.13, 34.18), 4: (-118.16, 34.15)},
        [(1, 2, True), (2, 3, True), (2, 4, True)],
    )
    lons = [-118.101, -118.111, -118.121, -118.1297, -118.1297, -118.1297]
    lats = [34.1503, 34.1503, 34.1503, 34.1503, 34.153, 34.163]
    res = match_trajectory(net, lons, lats)
    # the final points ride the north branch (2↔3), not the west one
    assert (res.layers[-1].src, res.layers[-1].dst) in {(2, 3), (3, 2)}
    assert 4 not in (res.layers[-1].src, res.layers[-1].dst)


def test_unanchored_batch_reject_lists_layers():
    """entity.rs:166-193: batch mode rejects listing every unanchored point."""
    net = straight_road()
    with pytest.raises(MatchError) as ei:
        match_trajectory(net, [-118.151, -100.0, -99.0], [34.1503, 0.0, 0.0])
    assert ei.value.kind == "unanchored"
    assert ei.value.layers == [1, 2]


def test_unanchored_streaming_drop():
    """realtime/bin/matcher.rs:143-157: streaming mode drops the point."""
    net = straight_road()
    opts = MatchOptions(drop_unanchored=True)
    res = match_trajectory(net, [-118.151, -100.0, -118.155], [34.1503, 0.0, 34.1503], opts)
    assert res.dropped_seqs == [1]
    assert [ml.seq for ml in res.layers] == [0, 2]


def test_disconnected_reports_break():
    """Two anchored points with no route between them → disconnected with
    the break boundary listed (weigh/mod.rs:160-163, entity.rs:221-226)."""
    net = mock_net(
        {1: (-118.10, 34.15), 2: (-118.11, 34.15), 3: (-118.30, 34.15), 4: (-118.31, 34.15)},
        [(1, 2, False), (3, 4, False)],
    )
    with pytest.raises(MatchError) as ei:
        match_trajectory(net, [-118.105, -118.305], [34.1501, 34.1501])
    assert ei.value.kind == "disconnected"
    assert ei.value.layers == [0]


def test_deterministic_rerun():
    net = bent_road()
    r1 = match_trajectory(net, BENT_LONS, BENT_LATS)
    r2 = match_trajectory(net, BENT_LONS, BENT_LATS)
    assert r1.cost == r2.cost
    assert [(m.edge_id, m.direction, m.snap_lon, m.snap_lat) for m in r1.layers] == [
        (m.edge_id, m.direction, m.snap_lon, m.snap_lat) for m in r2.layers
    ]


def test_selective_matches_allcompute_on_small_nets():
    """Selective (k=16) equals AllCompute when layers are narrow
    (selective.rs:20-89 is exact when width ≤ fanout)."""
    net = bent_road()
    full = match_trajectory(net, BENT_LONS, BENT_LATS, MatchOptions(fanout=None))
    sel = match_trajectory(net, BENT_LONS, BENT_LATS, MatchOptions(fanout=16))
    assert full.cost == sel.cost
    assert [(m.src, m.dst) for m in full.layers] == [(m.src, m.dst) for m in sel.layers]


def test_oneway_respected():
    """A one-way street against the direction of travel must route around
    (or fail) rather than traverse backwards."""
    # one-way 1→2 only; travelling 2→1 has no route
    net = mock_net({1: (-118.10, 34.15), 2: (-118.13, 34.15)}, [(1, 2, False)])
    with pytest.raises(MatchError) as ei:
        # points move east→west along the road = from node2 side to node1 side,
        # but the only edge runs west→east… direction matters:
        match_trajectory(net, [-118.128, -118.102], [34.1503, 34.1503])
    assert ei.value.kind == "disconnected"


def test_streaming_equals_batch():
    """streaming.rs:66-86: append-stable trellis — matching the full
    trajectory equals matching any prefix then extending (our batch matcher
    recomputes, so equality is over the final result)."""
    net = bent_road()
    full = match_trajectory(net, BENT_LONS, BENT_LATS)
    prefix = match_trajectory(net, BENT_LONS[:3], BENT_LATS[:3])
    # prefix choice agrees with the full match on converged layers (first 2)
    assert [(m.src, m.dst) for m in prefix.layers[:2]] == [
        (m.src, m.dst) for m in full.layers[:2]
    ]


def test_convergence_reported():
    """viterbi.rs:164-247 via MatchOptions.compute_convergence: the bent
    road's unambiguous trajectory converges at (or before) the last layer."""
    net = bent_road()
    res = match_trajectory(
        net, BENT_LONS, BENT_LATS, MatchOptions(compute_convergence=True)
    )
    assert res.converged_layer is not None
    assert 0 <= res.converged_layer <= len(BENT_LONS) - 1


def test_interpolated_path_seams_deduped():
    """route.rs:129: concatenated hop geometry has no duplicate seam
    points and traverses the bent road's interior nodes."""
    from routers_ray.matcher import interpolated_path

    net = bent_road()
    res = match_trajectory(net, BENT_LONS, BENT_LATS)
    lons, lats = interpolated_path(res)
    assert lons.size >= 6
    d = np.abs(np.diff(lons)) + np.abs(np.diff(lats))
    assert (d > 0).all(), "consecutive duplicate points must be deduped"
    # passes through interior bend nodes 3 (-118.17, 34.15→34.14 corner)
    assert any(abs(x - -118.17) < 1e-9 for x in lons)


def test_match_trajectories_batch_parity():
    """The batched kernel API (match_trajectories) produces identical
    results to per-doc match_trajectory."""
    from routers_ray.matcher import match_trajectories

    net = bent_road()
    docs = [
        (BENT_LONS, BENT_LATS),
        (BENT_LONS[:4], BENT_LATS[:4]),
        ([-100.0], [0.0]),  # unanchored
        (BENT_LONS[2:], BENT_LATS[2:]),
    ]
    batch = match_trajectories(net, docs, MatchOptions())
    for (ll, la), r in zip(docs, batch):
        try:
            single = match_trajectory(net, ll, la)
        except MatchError as e:
            assert isinstance(r, MatchError) and r.kind == e.kind
            continue
        assert not isinstance(r, MatchError)
        assert r.cost == single.cost
        assert [(m.seq, m.edge_id, m.direction, m.snap_lon, m.snap_lat) for m in r.layers] == [
            (m.seq, m.edge_id, m.direction, m.snap_lon, m.snap_lat) for m in single.layers
        ]
        for a, b in zip(r.layers, single.layers):
            assert np.array_equal(a.hop_lons, b.hop_lons)
