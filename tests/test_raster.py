"""Raster↔vector stages: brute-force parity, round-trips, partitioning
invariance, component labeling vs an independent flood fill."""

import numpy as np
import pyarrow as pa
import pytest

from routers_ray.raster import (
    assemble_raster_tiles,
    component_stats,
    decode_grid,
    grid_blob_of_tile,
    pixel_partials,
    rasterize_points,
    runs_of_tile,
    sum_tile_pixels,
    vectorize_runs,
)

GRID = 16
Z = 2


def _world(n=4000, seed=7):
    rng = np.random.default_rng(seed)
    lon = rng.uniform(-170.0, 170.0, n)
    lat = rng.uniform(-80.0, 80.0, n)
    return lon, lat


def _brute_pixels(lon, lat, z, grid):
    """Independent dense histogram: dict of (x, y) -> grid×grid counts."""
    n = float(1 << z)
    fx = (lon + 180.0) / 360.0 * n
    lat_r = np.radians(lat)
    fy = (1.0 - np.log(np.tan(lat_r) + 1.0 / np.cos(lat_r)) / np.pi) / 2.0 * n
    x, y = np.floor(fx).astype(int), np.floor(fy).astype(int)
    px = np.floor((fx - x) * grid).astype(int)
    py = np.floor((fy - y) * grid).astype(int)
    tiles = {}
    for i in range(len(lon)):
        g = tiles.setdefault((x[i], y[i]), np.zeros((grid, grid), dtype=np.int64))
        g[py[i], px[i]] += 1
    return tiles


def test_pixel_partials_match_brute():
    lon, lat = _world()
    t = pixel_partials(lon, lat, Z, GRID)
    tiles = _brute_pixels(lon, lat, Z, GRID)
    assert int(pa.compute.sum(t["n"]).as_py()) == len(lon)
    for x, y, px, py, n in zip(*(t[c].to_pylist() for c in ("x", "y", "px", "py", "n"))):
        assert tiles[(x, y)][py, px] == n


def test_rasterize_points_partitioning_invariant(ray_session):
    import ray.data as rd

    lon, lat = _world()
    tbl = pa.table({"lon": lon, "lat": lat})
    one = rasterize_points(rd.from_arrow(tbl), Z, GRID).to_pandas()
    many = rasterize_points(
        rd.from_arrow(tbl).repartition(13), Z, GRID
    ).to_pandas()
    key = ["x", "y", "px", "py"]
    one = one.sort_values(key).reset_index(drop=True)
    many = many.sort_values(key).reset_index(drop=True)
    assert one.equals(many)
    assert one["n"].sum() == len(lon)


def test_dense_grid_roundtrip(ray_session):
    import ray.data as rd

    lon, lat = _world()
    tiles = _brute_pixels(lon, lat, Z, GRID)
    out = assemble_raster_tiles(
        rd.from_arrow(pa.table({"lon": lon, "lat": lat})).repartition(7), Z, GRID
    ).to_pandas()
    assert len(out) == len(tiles)
    for _, row in out.iterrows():
        dense = decode_grid(row["grid"], GRID)
        brute = tiles[(row["x"], row["y"])]
        assert np.array_equal(dense, brute.astype(np.uint32))
        assert row["occupied"] == int((brute > 0).sum())
        assert row["total"] == int(brute.sum())


def test_runs_roundtrip_thresholded_pixels():
    """Expanding the emitted runs reproduces exactly the thresholded
    pixel set, with totals preserved."""
    lon, lat = _world(n=6000)
    t = pixel_partials(lon, lat, 1, 8)  # coarse: guarantees adjacency
    # fake a single-tile group per (x, y)
    import pandas as pd

    df = t.to_pandas()
    for (x, y), g in df.groupby(["x", "y"]):
        group = pa.Table.from_pandas(g, preserve_index=False)
        runs = runs_of_tile(group, threshold=2).to_pandas()
        got = set()
        tot = 0
        for _, r in runs.iterrows():
            assert r["px1"] >= r["px0"] and r["npix"] == r["px1"] - r["px0"] + 1
            for p in range(r["px0"], r["px1"] + 1):
                got.add((r["py"], p))
            tot += r["total"]
        want = {
            (row["py"], row["px"]) for _, row in g.iterrows() if row["n"] >= 2
        }
        assert got == want
        assert tot == int(g.loc[g["n"] >= 2, "n"].sum())
        # maximality: no two runs on one row touch or overlap
        for py_val, rg in runs.groupby("py"):
            s = rg.sort_values("px0")
            assert (s["px0"].values[1:] > s["px1"].values[:-1] + 1).all()


def test_vectorize_runs_distributed_equals_local(ray_session):
    import ray.data as rd

    lon, lat = _world(n=6000)
    tbl = pa.table({"lon": lon, "lat": lat})
    dist = (
        vectorize_runs(rd.from_arrow(tbl).repartition(9), 1, 8, threshold=2)
        .to_pandas()
        .sort_values(["x", "y", "py", "px0"])
        .reset_index(drop=True)
    )
    local = (
        vectorize_runs(rd.from_arrow(tbl), 1, 8, threshold=2)
        .to_pandas()
        .sort_values(["x", "y", "py", "px0"])
        .reset_index(drop=True)
    )
    assert len(dist) > 0 and (dist["npix"] > 1).any()  # real multi-pixel runs
    assert dist.equals(local)


def _flood_components(occ: np.ndarray):
    """Independent check: BFS flood fill over the dense boolean grid."""
    seen = np.zeros_like(occ, dtype=bool)
    sizes = []
    g = occ.shape[0]
    for sy in range(g):
        for sx in range(g):
            if not occ[sy, sx] or seen[sy, sx]:
                continue
            stack, size = [(sy, sx)], 0
            seen[sy, sx] = True
            while stack:
                cy, cx = stack.pop()
                size += 1
                for dy, dx in ((0, 1), (0, -1), (1, 0), (-1, 0)):
                    ny, nx = cy + dy, cx + dx
                    if 0 <= ny < g and 0 <= nx < g and occ[ny, nx] and not seen[ny, nx]:
                        seen[ny, nx] = True
                        stack.append((ny, nx))
            sizes.append(size)
    return len(sizes), (max(sizes) if sizes else 0)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_component_stats_vs_flood_fill(seed):
    rng = np.random.default_rng(seed)
    occ = rng.random((GRID, GRID)) < 0.35
    py, px = np.nonzero(occ)
    got = component_stats(px, py, GRID)
    want = _flood_components(occ)
    assert got == want


def test_component_stats_no_row_wrap():
    # (15, 0) and (0, 1) are NOT neighbours: runs must not wrap rows
    px = np.array([GRID - 1, 0])
    py = np.array([0, 1])
    assert component_stats(px, py, GRID) == (2, 1)


def test_sum_tile_pixels_merges_partials():
    g = pa.table(
        {
            "x": pa.array([3, 3, 3], pa.int64()),
            "y": pa.array([1, 1, 1], pa.int64()),
            "px": pa.array([5, 5, 6], pa.int64()),
            "py": pa.array([2, 2, 2], pa.int64()),
            "n": pa.array([4, 3, 1], pa.int64()),
        }
    )
    px, py, n = sum_tile_pixels(g)
    assert list(px) == [5, 6] and list(py) == [2, 2] and list(n) == [7, 1]
    blob = grid_blob_of_tile(g, 8)
    dense = decode_grid(blob["grid"][0].as_py(), 8)
    assert dense[2, 5] == 7 and dense[2, 6] == 1 and dense.sum() == 8


def test_pip_even_odd_known_points():
    from routers_ray.pipelines.queries import _pip_even_odd

    # concave polygon: square with a triangular notch cut into the LEFT
    # side (vertices (0,0.1)-(0,3.9)-(2,2) are carved out)
    verts = np.array(
        [(0.0, 0.1), (4.0, -0.1), (4.0, 4.1), (0.0, 3.9), (2.0, 2.0)],
        dtype=np.float64,
    )
    lon = np.array([1.0, 3.5, 2.0, 0.5, -1.0, 5.0])
    lat = np.array([3.0, 2.0, 3.5, 2.0, 2.0, 2.0])
    # (0.5, 2.0) sits inside the notch triangle: outside the polygon
    got = _pip_even_odd(lon, lat, verts)
    assert list(got) == [True, True, True, False, False, False]


def test_components_of_tile_body():
    from routers_ray.raster import components_of_tile

    g = pa.table(
        {
            "x": pa.array([1] * 5, pa.int64()),
            "y": pa.array([2] * 5, pa.int64()),
            # L-shape (2 px row + 1 below) passes thr=2; two isolated
            # singletons fall below it
            "px": pa.array([3, 4, 3, 9, 0], pa.int64()),
            "py": pa.array([0, 0, 1, 9, 5], pa.int64()),
            "n": pa.array([2, 3, 2, 1, 1], pa.int64()),
        }
    )
    out = components_of_tile(g, GRID, threshold=2).to_pandas()
    assert out.iloc[0]["n_components"] == 1 and out.iloc[0]["largest"] == 3
    empty = components_of_tile(g, GRID, threshold=99)
    assert empty.num_rows == 0 and empty.schema.names == ["x", "y", "n_components", "largest"]
