"""Raster↔vector stages over the slippy-tile pyramid.

Vector→raster: points are binned into per-tile pixel grids — per-batch
sparse partials (one row per touched ``(tile, pixel)`` per batch, the
combiner pattern) → ``groupby`` merge → a sparse raster table; dense
``uint32`` grid blobs are assembled per tile with ``map_groups`` (the
servable raster tile, one bounded-size row per tile).

Raster→vector: horizontal run-length vectorization — thresholded pixels
grouped per ``(tile, row)``, gaps-and-islands over the pixel column —
emitting vector run segments; plus per-tile 4-connected component stats
(the polygon-count view of the raster).

Scale shape: the only exchange is keyed on the tile ``(x, y)``; a tile's
pixels are bounded (``grid²`` rows), so ``map_groups`` state is
O(grid²) regardless of input size, and a skewed tile costs at most
``grid²`` distinct rows after the per-batch combiner. At cluster scale
the tile key is the same partitioning key the MVT / tile-rollup stages
use, so raster and vector materialization share one shuffle.

The reference is a vector map-matcher with no raster surface; these
stages extend its tile pyramid (``routers_tiles/src/primitives/
fragment.rs:35-71`` — zoom compaction, Hilbert ordering) to raster
grids, the north-rule's raster↔vector requirement. The projection is
the reference's slippy formula (``routers_geo/src/project.rs:38-74``)
with a ``grid``-sized in-tile quantization instead of MVT_EXTENT.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = [
    "pixel_partials",
    "rasterize_points",
    "sum_tile_pixels",
    "runs_of_tile",
    "vectorize_runs",
    "grid_blob_of_tile",
    "assemble_raster_tiles",
    "decode_grid",
    "component_stats",
]


def pixel_partials(lon, lat, z: int, grid: int) -> pa.Table:
    """Per-batch sparse pixel partials: one row per touched (x, y, px, py).

    The formula is textually identical to the SQL oracle (floor on raw
    doubles, no latitude clamp — callers feed in-domain latitudes):
    ``fx = (lon+180)/360*2^z; x = floor(fx); px = floor((fx-x)*grid)``.
    """
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    n = np.float64(1 << z)
    fx = (lon + 180.0) / 360.0 * n
    lat_r = np.radians(lat)
    fy = (1.0 - np.log(np.tan(lat_r) + 1.0 / np.cos(lat_r)) / np.pi) / 2.0 * n
    x = np.floor(fx)
    y = np.floor(fy)
    px = np.floor((fx - x) * grid).astype(np.int64)
    py = np.floor((fy - y) * grid).astype(np.int64)
    # pack (x, y, py, px) into one int64 key for a single np.unique pass;
    # slippy x/y at z≤20 fit in 21 bits each, grid indices in 11 bits
    key = (
        (x.astype(np.int64) << np.int64(43))
        | (y.astype(np.int64) << np.int64(22))
        | (py << np.int64(11))
        | px
    )
    uniq, counts = np.unique(key, return_counts=True)
    return pa.table(
        {
            "x": pa.array(uniq >> np.int64(43), pa.int64()),
            "y": pa.array((uniq >> np.int64(22)) & np.int64(0x1FFFFF), pa.int64()),
            "px": pa.array(uniq & np.int64(0x7FF), pa.int64()),
            "py": pa.array((uniq >> np.int64(11)) & np.int64(0x7FF), pa.int64()),
            "n": pa.array(counts.astype(np.int64), pa.int64()),
        }
    )


def rasterize_points(ds, z: int, grid: int, lon_col: str = "lon", lat_col: str = "lat"):
    """Vector→raster sparse rollup: Dataset of points → Dataset of
    (x, y, px, py, n) pixel rows.

    Combiner-form: the exchange moves one row per (batch, pixel), never
    one per point.
    """

    def _partials(b: pa.Table) -> pa.Table:
        return pixel_partials(
            b[lon_col].to_numpy(zero_copy_only=False),
            b[lat_col].to_numpy(zero_copy_only=False),
            z,
            grid,
        )

    out = (
        ds.map_batches(_partials, batch_format="pyarrow")
        .groupby(["x", "y", "px", "py"])
        .sum("n")
    )
    return out.map_batches(
        lambda t: t.rename_columns(["x", "y", "px", "py", "n"]), batch_format="pyarrow"
    )


def sum_tile_pixels(group: pa.Table) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Merge a tile group's pixel partials: (px, py, n) with unique pixels."""
    px = group["px"].to_numpy(zero_copy_only=False).astype(np.int64)
    py = group["py"].to_numpy(zero_copy_only=False).astype(np.int64)
    n = group["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    key = (py << np.int64(32)) | px
    order = np.argsort(key, kind="stable")
    key, n = key[order], n[order]
    uniq, start = np.unique(key, return_index=True)
    sums = np.add.reduceat(n, start) if len(n) else n
    return (uniq & np.int64(0xFFFFFFFF)), (uniq >> np.int64(32)), sums


_RUNS_SCHEMA = pa.schema(
    [
        ("x", pa.int64()),
        ("y", pa.int64()),
        ("py", pa.int64()),
        ("px0", pa.int64()),
        ("px1", pa.int64()),
        ("npix", pa.int64()),
        ("total", pa.int64()),
    ]
)


def runs_of_tile(group: pa.Table, threshold: int = 1) -> pa.Table:
    """``groupby(x, y).map_groups`` body: gaps-and-islands vectorization.

    Pixels with count ≥ threshold, grouped per raster row (py), split
    into maximal horizontal runs — each run one vector segment row
    (x, y, py, px0, px1, npix, total). Fully vectorized (lexsort +
    boundary diff); no per-pixel Python loop.
    """
    px, py, n = sum_tile_pixels(group)
    keep = n >= threshold
    px, py, n = px[keep], py[keep], n[keep]
    if len(px) == 0:
        return _RUNS_SCHEMA.empty_table()
    # sum_tile_pixels returns (py, px)-sorted order already
    brk = (np.diff(py) != 0) | (np.diff(px) != 1)
    starts = np.concatenate(([0], np.flatnonzero(brk) + 1))
    ends = np.concatenate((np.flatnonzero(brk), [len(px) - 1]))
    x0 = int(group["x"][0].as_py())
    y0 = int(group["y"][0].as_py())
    return pa.table(
        {
            "x": pa.array(np.full(len(starts), x0, dtype=np.int64), pa.int64()),
            "y": pa.array(np.full(len(starts), y0, dtype=np.int64), pa.int64()),
            "py": pa.array(py[starts], pa.int64()),
            "px0": pa.array(px[starts], pa.int64()),
            "px1": pa.array(px[ends], pa.int64()),
            "npix": pa.array((ends - starts + 1).astype(np.int64), pa.int64()),
            "total": pa.array(np.add.reduceat(n, starts).astype(np.int64), pa.int64()),
        }
    )


def vectorize_runs(
    ds,
    z: int,
    grid: int,
    threshold: int = 1,
    lon_col: str = "lon",
    lat_col: str = "lat",
):
    """Raster→vector in ONE tile-keyed exchange: per-batch pixel partials
    → ``groupby(x, y).map_groups(runs_of_tile)``.

    The rasterization is implicit (partials merge inside the group), so
    points → vector segments without a second shuffle.
    """

    def _partials(b: pa.Table) -> pa.Table:
        return pixel_partials(
            b[lon_col].to_numpy(zero_copy_only=False),
            b[lat_col].to_numpy(zero_copy_only=False),
            z,
            grid,
        )

    return (
        ds.map_batches(_partials, batch_format="pyarrow")
        .groupby(["x", "y"])
        .map_groups(lambda g: runs_of_tile(g, threshold), batch_format="pyarrow")
    )


def grid_blob_of_tile(group: pa.Table, grid: int) -> pa.Table:
    """``map_groups`` body: the servable dense raster tile — a
    little-endian ``uint32[grid*grid]`` blob (row-major, [py, px]) plus
    occupancy stats. One bounded-size row per tile."""
    px, py, n = sum_tile_pixels(group)
    dense = np.zeros(grid * grid, dtype="<u4")
    dense[py * grid + px] = np.minimum(n, np.int64(0xFFFFFFFF)).astype("<u4")
    return pa.table(
        {
            "x": pa.array([int(group["x"][0].as_py())], pa.int64()),
            "y": pa.array([int(group["y"][0].as_py())], pa.int64()),
            "grid": pa.array([dense.tobytes()], pa.binary()),
            "occupied": pa.array([int(len(px))], pa.int64()),
            "total": pa.array([int(n.sum())], pa.int64()),
        }
    )


def assemble_raster_tiles(ds, z: int, grid: int, lon_col: str = "lon", lat_col: str = "lat"):
    """Vector→raster dense tiles in one tile-keyed exchange: pixel
    partials → ``groupby(x, y).map_groups(grid_blob_of_tile)``."""

    def _partials(b: pa.Table) -> pa.Table:
        return pixel_partials(
            b[lon_col].to_numpy(zero_copy_only=False),
            b[lat_col].to_numpy(zero_copy_only=False),
            z,
            grid,
        )

    return (
        ds.map_batches(_partials, batch_format="pyarrow")
        .groupby(["x", "y"])
        .map_groups(lambda g: grid_blob_of_tile(g, grid), batch_format="pyarrow")
    )


_COMP_SCHEMA = pa.schema(
    [
        ("x", pa.int64()),
        ("y", pa.int64()),
        ("n_components", pa.int64()),
        ("largest", pa.int64()),
    ]
)


def components_of_tile(group: pa.Table, grid: int, threshold: int = 1) -> pa.Table:
    """``groupby(x, y).map_groups`` body: 4-connected component stats of
    the thresholded tile raster — one row per tile."""
    px, py, n = sum_tile_pixels(group)
    keep = n >= threshold
    px, py = px[keep], py[keep]
    if len(px) == 0:
        return _COMP_SCHEMA.empty_table()
    n_comp, largest = component_stats(px, py, grid)
    return pa.table(
        {
            "x": pa.array([int(group["x"][0].as_py())], pa.int64()),
            "y": pa.array([int(group["y"][0].as_py())], pa.int64()),
            "n_components": pa.array([n_comp], pa.int64()),
            "largest": pa.array([largest], pa.int64()),
        }
    )


def decode_grid(blob: bytes, grid: int) -> np.ndarray:
    """Inverse of ``grid_blob_of_tile``: blob → (grid, grid) uint32 array."""
    return np.frombuffer(blob, dtype="<u4").reshape(grid, grid).copy()


def component_stats(px: np.ndarray, py: np.ndarray, grid: int) -> tuple[int, int]:
    """(n_components, largest_size) of the occupied pixels under
    4-connectivity — union-find over at most grid² bounded cells (tile
    state is O(grid²) by construction, so the loop is bounded, not
    data-sized)."""
    px = np.asarray(px, dtype=np.int64)
    py = np.asarray(py, dtype=np.int64)
    if len(px) == 0:
        return 0, 0
    idx = py * grid + px
    pos = {int(i): k for k, i in enumerate(idx)}
    parent = np.arange(len(idx), dtype=np.int64)

    def find(a: int) -> int:
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for k in range(len(idx)):
        i = int(idx[k])
        # right neighbour shares the row iff px+1 < grid (no wrap)
        if px[k] + 1 < grid and (i + 1) in pos:
            j = pos[i + 1]
            ra, rb = find(k), find(j)
            if ra != rb:
                parent[rb] = ra
        if (i + grid) in pos:
            j = pos[i + grid]
            ra, rb = find(k), find(j)
            if ra != rb:
                parent[rb] = ra
    roots = np.array([find(k) for k in range(len(idx))])
    _, sizes = np.unique(roots, return_counts=True)
    return int(len(sizes)), int(sizes.max())
