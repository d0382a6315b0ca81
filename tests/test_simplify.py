"""Douglas-Peucker simplification: invariants + scalar-oracle parity."""

import numpy as np

from routers_ray.simplify import simplify_mask


def test_endpoints_always_kept():
    rng = np.random.default_rng(2)
    lon, lat = rng.uniform(-1, 1, 20), rng.uniform(-1, 1, 20)
    for eps in (1e-9, 1e-3, 10.0):
        k = simplify_mask(lon, lat, eps)
        assert k[0] and k[-1]


def test_collinear_collapses_to_endpoints():
    lon = np.linspace(0.0, 0.1, 15)
    lat = np.full(15, 34.0)
    k = simplify_mask(lon, lat, 1e-9)
    assert k.sum() == 2 and k[0] and k[-1]


def test_zero_eps_keeps_everything_offline():
    rng = np.random.default_rng(5)
    lon = np.cumsum(rng.uniform(0.001, 0.002, 12))
    lat = 34.0 + np.cumsum(rng.uniform(-0.002, 0.002, 12))
    k = simplify_mask(lon, lat, 0.0)
    # every interior vertex off the chord must survive at eps=0
    assert k.sum() >= 10


def test_tiny_and_degenerate_inputs():
    assert simplify_mask(np.array([]), np.array([]), 1e-4).tolist() == []
    assert simplify_mask(np.array([1.0]), np.array([2.0]), 1e-4).tolist() == [True]
    assert simplify_mask(np.array([1.0, 1.0]), np.array([2.0, 2.0]), 1e-4).tolist() == [True, True]
    # closed loop (a == b): distance falls back to point distance
    lon = np.array([0.0, 0.05, 0.0])
    lat = np.array([34.0, 34.0, 34.0])
    k = simplify_mask(lon, lat, 1e-4)
    assert k.tolist() == [True, True, True]


def test_matches_scalar_oracle_exactly():
    from routers_ray.oracle_match import _scalar_simplify_keep

    rng = np.random.default_rng(9)
    for _ in range(60):
        n = int(rng.integers(3, 40))
        lon = np.cumsum(rng.uniform(-0.002, 0.003, n)) - 118.0
        lat = 34.0 + np.cumsum(rng.uniform(-0.002, 0.002, n))
        eps = float(rng.choice([1e-5, 1e-4, 2e-4, 1e-3]))
        got = simplify_mask(lon, lat, eps).tolist()
        want = _scalar_simplify_keep(lon.tolist(), lat.tolist(), eps)
        assert got == want


def test_removed_points_within_eps_of_kept_chain():
    """DP guarantee: every dropped vertex is within eps of the segment of
    the kept chain that spans it (checked in the same anchored plane)."""
    rng = np.random.default_rng(13)
    lon = np.cumsum(rng.uniform(-0.001, 0.0015, 50)) - 118.0
    lat = 34.0 + np.cumsum(rng.uniform(-0.001, 0.001, 50))
    eps = 2e-4
    k = simplify_mask(lon, lat, eps)
    kept = np.flatnonzero(k)
    for a, b in zip(kept[:-1], kept[1:]):
        ca = np.cos(np.radians(lat[a]))
        dx, dy = (lon[b] - lon[a]) * ca, lat[b] - lat[a]
        den = dx * dx + dy * dy
        for m in range(a + 1, b):
            x, y = (lon[m] - lon[a]) * ca, lat[m] - lat[a]
            t = 0.0 if den == 0 else min(max((x * dx + y * dy) / den, 0.0), 1.0)
            d2 = (x - t * dx) ** 2 + (y - t * dy) ** 2
            assert d2 <= eps * eps + 1e-18
