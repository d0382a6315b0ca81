"""Cell-grouped DBSCAN clustering (port of ``routers_geo/src/cluster.rs``).

Reference semantics (``cluster.rs:100-130,202-317``): points are grouped by
geohash cell; groups holding ≥ ``min_points`` (3) cluster; each cluster
carries its convex hull, centroid, and a packed geohash-u64 id; points in
sparse cells are noise.

Ray shape: ``groupby(cell).map_groups(dbscan_cell)`` — grouped aggregation
where the per-group body runs plain NumPy DBSCAN (groups are cell-local, so
the quadratic neighbor scan is bounded by the cell's population).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .cells import geohash_encode, geohash_to_u64
from .geo import haversine_m

DEFAULT_EPS_M = 200.0
MIN_POINTS = 3  # cluster.rs min cluster size


def dbscan_labels(lons: np.ndarray, lats: np.ndarray, eps_m: float, min_points: int) -> np.ndarray:
    """Classic DBSCAN over haversine distances; -1 = noise. O(n²) per group
    (cell-local populations keep n small)."""
    n = lons.size
    labels = np.full(n, -1, dtype=np.int64)
    if n == 0:
        return labels
    d = haversine_m(lons[:, None], lats[:, None], lons[None, :], lats[None, :])
    neighbors = d <= eps_m
    core = neighbors.sum(axis=1) >= min_points
    cluster = 0
    visited = np.zeros(n, dtype=bool)
    for i in range(n):
        if visited[i] or not core[i]:
            continue
        # BFS expand
        stack = [i]
        visited[i] = True
        labels[i] = cluster
        while stack:
            j = stack.pop()
            for k in np.flatnonzero(neighbors[j]):
                if labels[k] == -1:
                    labels[k] = cluster
                if not visited[k]:
                    visited[k] = True
                    if core[k]:
                        stack.append(k)
        cluster += 1
    return labels


def convex_hull(lons: np.ndarray, lats: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Andrew's monotone chain hull over lon/lat (planar, like the
    reference's geo::ConvexHull). Returns hull vertices CCW."""
    pts = np.unique(np.stack([lons, lats], axis=1), axis=0)
    n = pts.shape[0]
    if n <= 2:
        return pts[:, 0], pts[:, 1]
    order = np.lexsort((pts[:, 1], pts[:, 0]))
    pts = pts[order]

    def cross(o, a, b):
        return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])

    lower: list = []
    for p in pts:
        while len(lower) >= 2 and cross(lower[-2], lower[-1], p) <= 0:
            lower.pop()
        lower.append(p)
    upper: list = []
    for p in pts[::-1]:
        while len(upper) >= 2 and cross(upper[-2], upper[-1], p) <= 0:
            upper.pop()
        upper.append(p)
    hull = np.asarray(lower[:-1] + upper[:-1])
    return hull[:, 0], hull[:, 1]


def dbscan_cell_group(
    group, eps_m: float = DEFAULT_EPS_M, min_points: int = MIN_POINTS, geohash_precision: int = 6
) -> pa.Table:
    """``groupby(cell).map_groups`` body: one row per cluster found in the
    cell — centroid, size, hull, geohash-u64 cluster id."""
    import pandas as pd

    if isinstance(group, pd.DataFrame):
        lons = group["lon"].to_numpy(dtype=np.float64)
        lats = group["lat"].to_numpy(dtype=np.float64)
    else:
        lons = np.asarray(group["lon"], dtype=np.float64)
        lats = np.asarray(group["lat"], dtype=np.float64)
    labels = dbscan_labels(lons, lats, eps_m, min_points)
    out_id, out_n, out_clon, out_clat, out_hull = [], [], [], [], []
    for c in np.unique(labels[labels >= 0]):
        m = labels == c
        if m.sum() < min_points:
            continue
        clon, clat = float(lons[m].mean()), float(lats[m].mean())
        hx, hy = convex_hull(lons[m], lats[m])
        gh = geohash_encode([clon], [clat], geohash_precision)[0]
        out_id.append(int(geohash_to_u64([gh])[0]))
        out_n.append(int(m.sum()))
        out_clon.append(clon)
        out_clat.append(clat)
        out_hull.append([{"lon": float(x), "lat": float(y)} for x, y in zip(hx, hy)])
    return pa.table(
        {
            "cluster_id": pa.array(out_id, pa.uint64()),
            "n_points": pa.array(out_n, pa.int64()),
            "centroid_lon": pa.array(out_clon, pa.float64()),
            "centroid_lat": pa.array(out_clat, pa.float64()),
            "hull": pa.array(
                out_hull, pa.list_(pa.struct([("lon", pa.float64()), ("lat", pa.float64())]))
            ),
        }
    )


def cluster_points(ds, cell_zoom: int = 10, eps_m: float = DEFAULT_EPS_M):
    """Dataset pipeline: points(lon, lat) → clusters per cell.

    The groupby moves only (cell, lon, lat) rows; DBSCAN runs cell-local
    (the reference's geohash-grouped clustering shape)."""
    from .cells import lonlat_to_cell

    def _key(b: pa.Table) -> pa.Table:
        lon = np.asarray(b["lon"], dtype=np.float64)
        lat = np.asarray(b["lat"], dtype=np.float64)
        return pa.table(
            {
                "cell": pa.array(lonlat_to_cell(lon, lat, cell_zoom).astype(np.int64), pa.int64()),
                "lon": pa.array(lon, pa.float64()),
                "lat": pa.array(lat, pa.float64()),
            }
        )

    keyed = ds.map_batches(_key, batch_format="pyarrow")
    return keyed.groupby("cell").map_groups(
        lambda g: dbscan_cell_group(g, eps_m), batch_format="pyarrow"
    )
