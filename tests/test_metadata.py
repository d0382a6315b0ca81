"""Edge-metadata breadth: per-mode access resolution, maxspeed parsing,
speed-derived weights — and the runtime-config scenario the reference
supports (``OsmEdgeMetadata`` + ``OsmTripConfiguration``): a bus and a car
matching DIFFERENTLY on the same trace."""

import numpy as np
import pyarrow as pa
import pytest

from routers_ray.costing import speed_weight
from routers_ray.matcher import MatchOptions, match_trajectory
from routers_ray.metadata import (
    DIR_BOTH,
    DIR_FORWARD,
    ROAD_CLASS_WEIGHT,
    access_columns,
    parse_maxspeed,
    resolve_access,
)
from routers_ray.network import CellNetwork


def test_resolve_access_most_specific_wins():
    # busway: motor_vehicle=no but bus=yes — bus chain is deeper, bus wins
    tags = [("motor_vehicle", DIR_BOTH, "no"), ("bus", DIR_BOTH, "yes")]
    assert resolve_access(tags, "bus", 0) is True
    assert resolve_access(tags, "motorcar", 0) is False
    assert resolve_access(tags, "hgv", 0) is False
    assert resolve_access(tags, "foot", 0) is True  # no applicable tag → allow
    assert resolve_access(tags, "bicycle", 0) is True  # not a motor_vehicle

    # private roads gated by the runtime flag (osm/mod.rs:224-227)
    priv = [("all", DIR_BOTH, "private")]
    assert resolve_access(priv, "motorcar", 0) is False
    assert resolve_access(priv, "motorcar", 0, allow_private=True) is True

    # directionality: forward-only restriction hits only the outgoing twin
    fwd = [("vehicle", DIR_FORWARD, "no")]
    assert resolve_access(fwd, "motorcar", 0) is False
    assert resolve_access(fwd, "motorcar", 1) is True

    assert resolve_access([], "bus", 0) is True
    assert resolve_access(None, "bus", 0) is True


def test_parse_maxspeed_units():
    assert parse_maxspeed("50") == 50.0
    assert parse_maxspeed("30 mph") == pytest.approx(48.28032)
    assert parse_maxspeed("10 knots") == pytest.approx(18.52)
    assert parse_maxspeed("none") == 200.0
    assert parse_maxspeed("walk") == 5.0
    assert parse_maxspeed("60 @ (Mo-Fr 06:00-19:00)") == 60.0
    assert parse_maxspeed("fast") is None
    assert parse_maxspeed(None) is None
    assert parse_maxspeed("") is None


def test_road_class_weights_pinned():
    # road_class.rs:118-146
    assert ROAD_CLASS_WEIGHT["motorway"] == 1
    assert ROAD_CLASS_WEIGHT["primary"] == 5
    assert ROAD_CLASS_WEIGHT["residential"] == 10
    assert ROAD_CLASS_WEIGHT["service"] == 50
    assert ROAD_CLASS_WEIGHT["pedestrian"] == 100


def test_speed_weight_decay():
    # cost(v) = ζ·(1/v)^β·100 with v = speed/130 (costing/util.rs:29-39)
    w = speed_weight(np.array([130.0, 13.0, np.nan]), np.array([7.0, 7.0, 7.0]))
    assert w[0] == 100  # full-speed road: v=1 → 100
    assert w[1] == 1000  # 13 km/h: v=0.1 → 1000
    assert w[2] == 700  # unparsed → fallback class weight × PRECISION


def _busway_world():
    """A-B-C-D straight road whose B→C segment is a busway
    (motor_vehicle=no, bus=yes), plus an accessible detour B→E→C."""
    nodes = {
        1: (0.0, 0.0), 2: (0.001, 0.0), 3: (0.002, 0.0), 4: (0.003, 0.0),
        5: (0.0015, 0.0004),  # detour apex
    }
    edges = [
        # (eid, src, dst, tags)
        (0, 1, 2, None),
        (1, 2, 3, [("motor_vehicle", DIR_BOTH, "no"), ("bus", DIR_BOTH, "yes")]),
        (2, 3, 4, None),
        (3, 2, 5, None),
        (4, 5, 3, None),
    ]
    eid, src, dst, dr, tags = [], [], [], [], []
    for e, a, b, t in edges:
        for d, (x, y) in enumerate(((a, b), (b, a))):
            eid.append(e), src.append(x), dst.append(y), dr.append(d), tags.append(
                [{"mode": m, "dir": td, "value": v} for m, td, v in t] if t else []
            )
    n = len(eid)
    tbl = pa.table(
        {
            "edge_id": pa.array(eid, pa.int64()),
            "src": pa.array(src, pa.int64()),
            "dst": pa.array(dst, pa.int64()),
            "weight": pa.array([10] * n, pa.uint32()),
            "dir": pa.array(dr, pa.uint8()),
            "accessible": pa.array([True] * n, pa.bool_()),
            "ax": pa.array([nodes[s][0] for s in src], pa.float64()),
            "ay": pa.array([nodes[s][1] for s in src], pa.float64()),
            "bx": pa.array([nodes[d][0] for d in dst], pa.float64()),
            "by": pa.array([nodes[d][1] for d in dst], pa.float64()),
        }
    )
    cols = access_columns(pa.array(tags), tbl["dir"])
    for m, arr in cols.items():
        tbl = tbl.append_column(f"acc_{m}", pa.array(arr, pa.bool_()))
    return tbl


def test_bus_and_car_match_differently():
    """Same trace, different runtime transport mode → different driven
    geometry: the bus rides the busway B→C; the car's bounded Dijkstra
    (successors masked by acc_motorcar) must route via the detour apex."""
    tbl = _busway_world()
    bus_net = CellNetwork.from_edge_rows(tbl, mode="bus")
    car_net = CellNetwork.from_edge_rows(tbl, mode="motorcar")

    lons = [0.0005, 0.0025]  # one point on A-B, one on C-D
    lats = [0.00003, 0.00003]
    opts = MatchOptions()

    bus = match_trajectory(bus_net, lons, lats, opts)
    car = match_trajectory(car_net, lons, lats, opts)

    # both anchor on the same edges…
    assert [m.edge_id for m in bus.layers] == [0, 2]
    assert [m.edge_id for m in car.layers] == [0, 2]
    # …but the hop geometry differs: bus goes straight through the busway,
    # car detours through the apex (node 5 at lat 0.0004)
    bus_hop_lat = np.max(np.abs(bus.layers[1].hop_lats))
    car_hop_lat = np.max(np.abs(car.layers[1].hop_lats))
    assert bus_hop_lat < 1e-9  # straight along lat 0
    assert car_hop_lat == pytest.approx(0.0004)
    assert car.cost > bus.cost  # longer detour prices higher


def test_speed_weights_change_route_preference():
    """use_speed=True sources Dijkstra weights from parsed limits: a fast
    long road beats a slow short one; without speed both weigh equally."""
    nodes = {
        1: (0.0, 0.0), 2: (0.004, 0.0),  # endpoints
        3: (0.002, 0.0002),   # short slow middle
        4: (0.002, -0.002),   # long fast middle
    }
    rows = [
        (0, 1, 3, "10"), (1, 3, 2, "10"),     # slow path (short)
        (2, 1, 4, "110"), (3, 4, 2, "110"),   # fast path (long)
    ]
    eid, src, dst, ms = zip(*rows)
    n = len(rows)
    tbl = pa.table(
        {
            "edge_id": pa.array(eid, pa.int64()),
            "src": pa.array(src, pa.int64()),
            "dst": pa.array(dst, pa.int64()),
            "weight": pa.array([10] * n, pa.uint32()),
            "dir": pa.array([0] * n, pa.uint8()),
            "accessible": pa.array([True] * n, pa.bool_()),
            "ax": pa.array([nodes[s][0] for s in src], pa.float64()),
            "ay": pa.array([nodes[s][1] for s in src], pa.float64()),
            "bx": pa.array([nodes[d][0] for d in dst], pa.float64()),
            "by": pa.array([nodes[d][1] for d in dst], pa.float64()),
            "speed_kmh": pa.array([10.0, 10.0, 110.0, 110.0], pa.float64()),
        }
    )
    plain = CellNetwork.from_edge_rows(tbl)
    fast = CellNetwork.from_edge_rows(tbl, use_speed=True)
    assert np.array_equal(np.unique(plain.weight), [10])
    # decay: v=10/130 → 1300; v=110/130 → 118
    assert set(np.unique(fast.weight).tolist()) == {118, 1300}

    from routers_ray.csr import route_nodes

    # route endpoint→endpoint: plain weights pick the short slow path,
    # speed weights pick the long fast one
    def middle(net):
        r = route_nodes(net.csr, net.csr.node_index(np.array([1]))[0],
                        net.csr.node_index(np.array([2]))[0])
        return [int(net.csr.node_ids[i]) for i in r[1]] if r else None

    assert middle(plain) == [1, 3, 2]
    assert middle(fast) == [1, 4, 2]
