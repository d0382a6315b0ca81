"""User-extension surface (SURVEY §2.11): injected generator / emission /
weigher / solver callables mirror the reference's ``LayerGeneration`` /
``Strategy`` / ``Weigher`` / ``Solve`` traits
(``layer/generation/mod.rs:27-45``, ``costing/mod.rs:23-61``,
``weigh/mod.rs:35-50``, ``solver/mod.rs:13-15``)."""

import numpy as np
import pytest

from routers_ray.matcher import (
    Layer,
    MatchOptions,
    _TrajectoryContext,
    generate_layers,
    match_trajectories,
    match_trajectory,
)

from test_mock_scenarios import bent_road, mock_net, straight_road


def flat_emission(dist_m, opts):
    """Distance-blind emission: every candidate costs 100."""
    return np.full(np.asarray(dist_m).shape, 100, dtype=np.uint32)


def nearest_only_generator(net, lons, lats, opts):
    """Keep only each point's single nearest candidate (snap semantics)."""
    layers = generate_layers(
        net, lons, lats, MatchOptions(search_distance_m=opts.search_distance_m)
    )
    out = []
    for ly in layers:
        if ly.edge_rows.size <= 1:
            out.append(ly)
            continue
        k = int(np.argmin(ly.dist_m))
        sl = slice(k, k + 1)
        out.append(
            Layer(ly.edge_rows[sl], ly.frac[sl], ly.pos_lon[sl], ly.pos_lat[sl],
                  ly.dist_m[sl], ly.emission[sl])
        )
    return out


def shifted_weigher(ctx):
    """Default weigh pass + a constant shift on every resolved boundary."""
    t = ctx.weigh_all()
    for i, b in enumerate(t.boundaries):
        if b is not None:
            from routers_ray.trellis import INF_W

            t.boundaries[i] = np.where(b < INF_W, b + 7, b)
    return t


TRACE = ([-118.151, -118.155, -118.160, -118.165], [34.1503] * 4)


def test_custom_emission_changes_costs_not_crashes():
    net = straight_road()
    base = match_trajectory(net, *TRACE)
    flat = match_trajectory(net, *TRACE, MatchOptions(emission=flat_emission))
    assert [m.seq for m in flat.layers] == [m.seq for m in base.layers]
    assert flat.cost != base.cost  # 4 × 100 flat emissions replace decayed ones


def test_custom_generator_snaps_to_nearest():
    net = bent_road()
    lons = [-118.151, -118.1535, -118.156]
    lats = [34.1502, 34.1502, 34.1502]
    res = match_trajectory(net, lons, lats, MatchOptions(generator=nearest_only_generator))
    # every layer had exactly one candidate — the nearest edge IS the match
    base_layers = generate_layers(net, np.asarray(lons), np.asarray(lats), MatchOptions())
    for ml, ly in zip(res.layers, base_layers):
        nearest_row = int(ly.edge_rows[np.argmin(ly.dist_m)])
        assert (ml.edge_id, ml.direction) == (
            int(net.edge_id[nearest_row]), int(net.dir[nearest_row])
        )


def test_brute_solver_matches_viterbi():
    net = bent_road()
    lons = [-118.151, -118.1535, -118.156]
    lats = [34.1502, 34.1502, 34.1502]
    v = match_trajectory(net, lons, lats, MatchOptions(solver="viterbi"))
    b = match_trajectory(net, lons, lats, MatchOptions(solver="brute"))
    assert [(m.edge_id, m.direction) for m in v.layers] == [
        (m.edge_id, m.direction) for m in b.layers
    ]
    assert v.cost == b.cost


def test_custom_weigher_shifts_cost():
    net = straight_road()
    base = match_trajectory(net, *TRACE)
    shifted = match_trajectory(net, *TRACE, MatchOptions(weigher=shifted_weigher))
    assert [m.edge_id for m in shifted.layers] == [m.edge_id for m in base.layers]
    assert shifted.cost == base.cost + 7 * 3  # one shift per boundary


def test_batched_path_honors_injections():
    net = straight_road()
    opts = MatchOptions(weigher=shifted_weigher)
    [batched] = match_trajectories(net, [TRACE], opts)
    direct = match_trajectory(net, *TRACE, opts)
    assert batched.cost == direct.cost
