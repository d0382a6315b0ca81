"""Discrete Fréchet kernel tests: the vectorized DP against an
independent memoized recursion, metric properties vs Hausdorff, and the
batched/scalar agreement. The registry-level oracle row (`frechet_pairs`
vs the anti-diagonal SQL DP unroll) lives in test_queries_oracle.py."""

from functools import lru_cache

import numpy as np
import pytest

from routers_ray.pipelines.queries import (
    frechet_dp_batch,
    frechet_m,
    hausdorff_m,
    hav_m,
)


def _brute_frechet(d: np.ndarray) -> float:
    """Independent reference: the textbook Eiter–Mannila recursion,
    memoized top-down (the repo kernel is bottom-up vectorized)."""

    @lru_cache(maxsize=None)
    def c(i: int, j: int) -> float:
        if i == 0 and j == 0:
            return float(d[0, 0])
        if i == 0:
            return max(c(0, j - 1), float(d[0, j]))
        if j == 0:
            return max(c(i - 1, 0), float(d[i, 0]))
        return max(min(c(i - 1, j), c(i, j - 1), c(i - 1, j - 1)), float(d[i, j]))

    return c(d.shape[0] - 1, d.shape[1] - 1)


@pytest.mark.parametrize("seed", range(8))
def test_frechet_matches_brute_recursion(seed):
    rng = np.random.default_rng(seed)
    n, m = int(rng.integers(1, 12)), int(rng.integers(1, 12))
    lon_a, lat_a = rng.uniform(-170, 170, n), rng.uniform(-80, 80, n)
    lon_b, lat_b = rng.uniform(-170, 170, m), rng.uniform(-80, 80, m)
    d = hav_m(lon_a[:, None], lat_a[:, None], lon_b[None, :], lat_b[None, :])
    assert frechet_m(lon_a, lat_a, lon_b, lat_b) == _brute_frechet(d)


def test_frechet_batch_equals_scalar():
    rng = np.random.default_rng(3)
    tracks = rng.uniform(-80, 80, size=(6, 2, 8))  # (track, lon/lat, pt)
    iu, ju = np.triu_indices(6, 1)
    d = hav_m(
        tracks[iu, 0][:, :, None],
        tracks[iu, 1][:, :, None],
        tracks[ju, 0][:, None, :],
        tracks[ju, 1][:, None, :],
    )
    batched = frechet_dp_batch(d)
    for p in range(iu.size):
        a, b = tracks[iu[p]], tracks[ju[p]]
        assert batched[p] == frechet_m(a[0], a[1], b[0], b[1])


def test_frechet_dominates_hausdorff_and_is_order_sensitive():
    rng = np.random.default_rng(11)
    for _ in range(10):
        n = int(rng.integers(2, 10))
        lon_a, lat_a = rng.uniform(-90, 90, n), rng.uniform(-60, 60, n)
        lon_b, lat_b = rng.uniform(-90, 90, n), rng.uniform(-60, 60, n)
        fd = frechet_m(lon_a, lat_a, lon_b, lat_b)
        hd = hausdorff_m(lon_a, lat_a, lon_b, lat_b)
        assert fd >= hd  # every coupling bounds both directed Hausdorffs
        # reversal leaves Hausdorff (a set metric) fixed; Fréchet may grow
        fd_rev = frechet_m(lon_a, lat_a, lon_b[::-1], lat_b[::-1])
        assert hausdorff_m(lon_a, lat_a, lon_b[::-1], lat_b[::-1]) == hd
        assert fd_rev >= hd


def test_frechet_pure_lat_translation_is_exact():
    # B = A shifted north by a constant Δlat: the diagonal coupling is
    # optimal and every coupling contains (0, 0) → F == hav(Δlat) exactly
    lon = np.array([10.0, 11.0, 12.5, 13.0])
    lat = np.array([5.0, 5.5, 6.0, 6.5])
    dlat = 2.0
    fd = frechet_m(lon, lat, lon, lat + dlat)
    want = float(hav_m(lon[:1], lat[:1], lon[:1], lat[:1] + dlat)[0])
    assert fd == pytest.approx(want, rel=1e-12)


def test_frechet_pairs_query_excludes_short_tracks(ray_session):
    """Users with < 8 events never appear on either side of a pair."""
    import duckdb

    from routers_ray.pipelines.queries import q_frechet_pairs

    sf = "/root/testdata/sf0.001"
    got = q_frechet_pairs(sf).to_pandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')")
    ok = set(
        con.sql(
            "SELECT user_id FROM events GROUP BY user_id HAVING COUNT(*) >= 8"
        ).df()["user_id"]
    )
    assert set(got["ua"]) | set(got["ub"]) <= ok
    assert (got["ua"] < got["ub"]).all()
