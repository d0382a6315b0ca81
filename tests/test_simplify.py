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


def test_resample_invariants():
    from routers_ray.simplify import resample_track

    lon = np.array([0.0, 1.0, 3.0])
    lat = np.array([10.0, 11.0, 13.0])
    ts = np.array([0, 10, 30])
    j, rl, rt = resample_track(lon, lat, ts, k=4)
    # evenly spaced times 0,10,20,30 -> exact endpoints + midpoint of 2nd leg
    assert list(j) == [0, 1, 2, 3]
    assert rl[0] == 0.0 and rt[0] == 10.0
    assert rl[1] == 1.0 and rt[1] == 11.0
    assert rl[2] == 2.0 and rt[2] == 12.0
    assert rl[3] == 3.0 and rt[3] == 13.0
    # unsorted + duplicate ts: first occurrence wins, order restored
    j2, rl2, rt2 = resample_track(
        np.array([3.0, 0.0, 99.0, 1.0]),
        np.array([13.0, 10.0, 99.0, 11.0]),
        np.array([30, 0, 0, 10]),
        k=4,
    )
    assert np.array_equal(rl, rl2) and np.array_equal(rt, rt2)
    # single point -> j=0 only
    j3, rl3, _ = resample_track(np.array([5.0]), np.array([6.0]), np.array([7]), k=4)
    assert list(j3) == [0] and rl3[0] == 5.0


def test_resample_matches_scalar_oracle():
    from routers_ray.oracle_match import _scalar_resample
    from routers_ray.simplify import resample_track

    rng = np.random.default_rng(21)
    for _ in range(50):
        n = int(rng.integers(1, 25))
        lon = rng.uniform(-118.2, -118.1, n)
        lat = rng.uniform(34.1, 34.2, n)
        ts = rng.integers(0, 10**9, n)
        j, rl, rt = resample_track(lon, lat, ts, k=8)
        want = _scalar_resample(lon.tolist(), lat.tolist(), ts.tolist(), k=8)
        assert len(j) == len(want)
        for a, (wj, wl, wt) in zip(range(len(want)), want):
            assert j[a] == wj and rl[a] == wl and rt[a] == wt
