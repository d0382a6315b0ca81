"""Radius self-join: brute parity, exactly-once owner emission,
partitioning invariance."""

import numpy as np
import pyarrow as pa

from routers_ray.spatialjoin import radius_self_join


def _world(n=800, seed=3):
    rng = np.random.default_rng(seed)
    return pa.table(
        {
            "id": pa.array(np.arange(n, dtype=np.int64), pa.int64()),
            "lon": pa.array(rng.uniform(-30.0, 30.0, n), pa.float64()),
            "lat": pa.array(rng.uniform(-20.0, 20.0, n), pa.float64()),
        }
    )


def _brute(tbl, r):
    ids = tbl["id"].to_numpy()
    lon = tbl["lon"].to_numpy()
    lat = tbl["lat"].to_numpy()
    d2 = (lon[:, None] - lon[None, :]) ** 2 + (lat[:, None] - lat[None, :]) ** 2
    i, j = np.nonzero((d2 <= r * r) & (ids[:, None] < ids[None, :]))
    return {(int(ids[a]), int(ids[b])) for a, b in zip(i, j)}


def test_radius_join_matches_brute_exactly_once(ray_session):
    import ray.data as rd

    tbl = _world()
    r = 1.5
    out = radius_self_join(rd.from_arrow(tbl), r, "id").to_pandas()
    got = list(zip(out["a"], out["b"]))
    assert len(got) == len(set(got))  # exactly once — no duplicate emissions
    assert set(got) == _brute(tbl, r)
    assert (out["dist2"] <= r * r).all()


def test_radius_join_partitioning_invariant(ray_session):
    import ray.data as rd

    tbl = _world(n=500, seed=9)
    r = 2.0
    one = radius_self_join(rd.from_arrow(tbl), r, "id").to_pandas()
    many = radius_self_join(rd.from_arrow(tbl).repartition(11), r, "id").to_pandas()
    key = ["a", "b"]
    one = one.sort_values(key).reset_index(drop=True)
    many = many.sort_values(key).reset_index(drop=True)
    assert one.equals(many) and len(one) > 0


def test_radius_join_boundary_pairs_cross_buckets(ray_session):
    import ray.data as rd

    # two points straddling a bucket boundary, one pair exactly at r
    tbl = pa.table(
        {
            "id": pa.array([1, 2, 3], pa.int64()),
            "lon": pa.array([0.999, 1.001, 50.0], pa.float64()),
            "lat": pa.array([0.0, 0.0, 0.0], pa.float64()),
        }
    )
    out = radius_self_join(rd.from_arrow(tbl), 1.0, "id").to_pandas()
    assert set(zip(out["a"], out["b"])) == {(1, 2)}


def test_radius_join_property_fuzz(ray_session):
    """Randomized worlds: distributed result == brute force, for random
    radii, point counts and clusters (hypothesis-style seeded fuzz kept
    deterministic for CI)."""
    import ray.data as rd

    rng = np.random.default_rng(77)
    for trial in range(6):
        n = int(rng.integers(20, 300))
        # clustered points: adjacency-heavy worlds stress the owner rule
        centers = rng.uniform(-50, 50, (max(1, n // 40), 2))
        pick = rng.integers(0, len(centers), n)
        lon = centers[pick, 0] + rng.normal(0, 1.5, n)
        lat = centers[pick, 1] + rng.normal(0, 1.5, n)
        r = float(rng.choice([0.5, 1.0, 2.5, 4.0]))
        tbl = pa.table(
            {
                "id": pa.array(np.arange(n, dtype=np.int64), pa.int64()),
                "lon": pa.array(lon, pa.float64()),
                "lat": pa.array(lat, pa.float64()),
            }
        )
        out = radius_self_join(rd.from_arrow(tbl).repartition(5), r, "id").to_pandas()
        got = list(zip(out["a"], out["b"]))
        assert len(got) == len(set(got)), (trial, r)
        assert set(got) == _brute(tbl, r), (trial, r)
