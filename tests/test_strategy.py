"""ShardingStrategy interchangeability (``strategy/mod.rs:38-56``):
quadkey / geohash / S2 all satisfy the same locate/bounds/neighbours/
contains contract, property-tested on the same point set."""

import numpy as np
import pytest

from routers_ray.strategy import GeohashStrategy, QuadkeyStrategy, S2Strategy

STRATEGIES = [
    QuadkeyStrategy(zoom=10),
    GeohashStrategy(precision=4),
    S2Strategy(level=10),
]

RNG = np.random.default_rng(5)
LONS = RNG.uniform(-179.0, 179.0, 64)
LATS = RNG.uniform(-80.0, 80.0, 64)


@pytest.mark.parametrize("strat", STRATEGIES, ids=lambda s: type(s).__name__)
def test_locate_is_deterministic_uint64(strat):
    a = strat.locate(LONS, LATS)
    b = strat.locate(LONS, LATS)
    assert a.dtype == np.uint64
    assert np.array_equal(a, b)


@pytest.mark.parametrize("strat", STRATEGIES, ids=lambda s: type(s).__name__)
def test_contains_matches_locate(strat):
    cells = strat.locate(LONS, LATS)
    c0 = cells[0]
    m = strat.contains(c0, LONS, LATS)
    assert np.array_equal(m, cells == c0)
    assert m[0]


@pytest.mark.parametrize("strat", STRATEGIES, ids=lambda s: type(s).__name__)
def test_bounds_cover_the_point(strat):
    cells = strat.locate(LONS, LATS)
    for i in range(0, 64, 8):
        w, s, e, n = strat.bounds(cells[i])
        # the located point sits inside (or within float noise of) its
        # cell's lon/lat bounds — S2 bounds are a corner bbox, so allow eps
        eps = 1e-6
        assert w - eps <= LONS[i] <= e + eps
        assert s - eps <= LATS[i] <= n + eps


@pytest.mark.parametrize("strat", STRATEGIES, ids=lambda s: type(s).__name__)
def test_neighbours_exclude_self_and_are_adjacent(strat):
    cells = strat.locate(LONS, LATS)
    c0 = cells[0]
    nb = strat.neighbours(c0)
    assert c0 not in nb
    assert 3 <= nb.size <= 8
    # a point nudged slightly across the cell edge lands in a neighbour
    w, s, e, n = strat.bounds(c0)
    step = (e - w) * 0.75
    nudged = strat.locate(np.asarray([min(LONS[0] + step, 179.9)]), np.asarray([LATS[0]]))[0]
    if nudged != c0:
        assert nudged in nb or nudged in np.concatenate(
            [strat.neighbours(x) for x in nb]
        )


def test_s2_hierarchy_and_roundtrip():
    s2 = S2Strategy(level=12)
    cells = s2.locate(LONS, LATS)
    # parent containment: a point's level-12 cell's parent equals its
    # level-10 cell
    s2_10 = S2Strategy(level=10)
    parents = s2.parent(cells, steps=2)
    assert np.array_equal(parents, s2_10.locate(LONS, LATS))
    # center round-trip: the cell's center locates to the cell itself
    for i in range(0, 64, 16):
        lon, lat = s2.center(cells[i])
        assert int(s2.locate(np.asarray([lon]), np.asarray([lat]))[0]) == int(cells[i])
    # six faces reachable
    f_lons = np.asarray([0.0, 90.0, 0.0, 180.0, -90.0, 0.0])
    f_lats = np.asarray([0.0, 0.0, 89.9, 0.0, 0.0, -89.9])
    faces = (s2.locate(f_lons, f_lats) >> np.uint64(61)).astype(np.int64)
    assert set(faces.tolist()) == {0, 1, 2, 3, 4, 5}


def test_s2_valid_id_shape():
    s2 = S2Strategy(level=12)
    cells = s2.locate(LONS, LATS)
    # trailing bit structure: lsb at 2*(30-level)
    lsb = cells & (~cells + np.uint64(1))
    assert np.all(lsb == np.uint64(1) << np.uint64(2 * (30 - 12)))
    # face bits < 6
    assert np.all((cells >> np.uint64(61)) < np.uint64(6))


def test_s2_cross_face_neighbours():
    """A cell at a face boundary reports neighbours on the adjacent face."""
    s2 = S2Strategy(level=8)
    # lon=44.9°, lat=0 sits near the face-0/face-1 boundary (u = tan(45°))
    c = s2.locate(np.asarray([44.9]), np.asarray([0.0]))[0]
    nb = s2.neighbours(c)
    faces = set(int(x >> np.uint64(61)) for x in nb)
    assert len(faces) >= 2, f"expected cross-face neighbours, got faces {faces}"
    # and a point just across the boundary lands in one of them
    across = s2.locate(np.asarray([45.5]), np.asarray([0.0]))[0]
    assert int(across >> np.uint64(61)) != int(c >> np.uint64(61))
