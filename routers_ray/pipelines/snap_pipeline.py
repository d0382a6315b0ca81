"""Snap / Scan pipelines — the RPC surface re-expressed as Dataset ops.

Reference: ConnectRPC ``Snap`` (nearest projected point), ``Scan{Point,
PointSnapped,Edge}`` (all candidates within a radius)
(``schema/proto/routers/api/{match,scan}/v1/service.proto:6-36``, impls
``routers_rpc/src/services/{matcher,proximity}.rs``). Here a user calls
``snap_points(ds, store)`` / ``scan_edges(ds, store)`` and gets a Dataset
back — the service boundary becomes a stage boundary.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..costing import DEFAULT_SEARCH_DISTANCE_M
from .match_pipeline import get_store


class _SnapActor:
    """Stateful 1-NN snap stage (actor pool): nearest projected candidate
    per point, NaN/null when nothing lies within the search square."""

    def __init__(self, store_path: str, radius_m: float = DEFAULT_SEARCH_DISTANCE_M):
        self.store = get_store(store_path)
        self.radius = radius_m

    def __call__(self, batch: pa.Table) -> pa.Table:
        lon = np.asarray(batch["lon"], dtype=np.float64)
        lat = np.asarray(batch["lat"], dtype=np.float64)
        n = lon.size
        eid = np.full(n, -1, dtype=np.int64)
        dr = np.zeros(n, dtype=np.uint8)
        sx = np.full(n, np.nan)
        sy = np.full(n, np.nan)
        dist = np.full(n, np.nan)
        # group points by padded-bbox network to amortize store lookups
        buffer_m = self.radius * 2
        net = None
        if n:
            net = self.store.network_for_bbox(
                float(lon.min()), float(lat.min()), float(lon.max()), float(lat.max()),
                buffer_m=buffer_m, search_radius_m=self.radius,
            )
            offsets, rows, frac, px, py, d = net.candidates_batch(lon, lat, self.radius)
            for i in range(n):
                lo, hi = offsets[i], offsets[i + 1]
                if hi > lo:
                    j = lo + int(np.argmin(d[lo:hi]))
                    eid[i] = net.edge_id[rows[j]]
                    dr[i] = net.dir[rows[j]]
                    sx[i] = px[j]
                    sy[i] = py[j]
                    dist[i] = d[j]
        out = batch.append_column("edge_id", pa.array(eid, pa.int64()))
        out = out.append_column("dir", pa.array(dr, pa.uint8()))
        out = out.append_column("snap_lon", pa.array(sx, pa.float64()))
        out = out.append_column("snap_lat", pa.array(sy, pa.float64()))
        out = out.append_column("dist_m", pa.array(dist, pa.float64()))
        return out


def snap_points(ds, store_path: str, radius_m: float = DEFAULT_SEARCH_DISTANCE_M, concurrency=2):
    """Snap service: ``ds(lon, lat, …)`` → same rows + nearest-edge columns
    (edge_id = -1 when unsnappable)."""
    return ds.map_batches(
        _SnapActor,
        fn_constructor_kwargs={"store_path": store_path, "radius_m": radius_m},
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=concurrency,
        num_cpus=1,
    )


class _ScanActor:
    """Scan service: every candidate edge within the search square, one
    output row per (point, candidate) — the flat-map expansion."""

    def __init__(self, store_path: str, radius_m: float = DEFAULT_SEARCH_DISTANCE_M):
        self.store = get_store(store_path)
        self.radius = radius_m

    def __call__(self, batch: pa.Table) -> pa.Table:
        lon = np.asarray(batch["lon"], dtype=np.float64)
        lat = np.asarray(batch["lat"], dtype=np.float64)
        if lon.size == 0:
            return pa.table(
                {
                    "point_idx": pa.array([], pa.int64()),
                    "edge_id": pa.array([], pa.int64()),
                    "dir": pa.array([], pa.uint8()),
                    "proj_lon": pa.array([], pa.float64()),
                    "proj_lat": pa.array([], pa.float64()),
                    "dist_m": pa.array([], pa.float64()),
                }
            )
        net = self.store.network_for_bbox(
            float(lon.min()), float(lat.min()), float(lon.max()), float(lat.max()),
            buffer_m=self.radius * 2, search_radius_m=self.radius,
        )
        offsets, rows, frac, px, py, d = net.candidates_batch(lon, lat, self.radius)
        counts = np.diff(offsets)
        pt = np.repeat(np.arange(lon.size), counts)
        idx_col = batch["point_idx"] if "point_idx" in batch.column_names else None
        point_idx = (
            np.asarray(idx_col, dtype=np.int64)[pt] if idx_col is not None else pt.astype(np.int64)
        )
        return pa.table(
            {
                "point_idx": pa.array(point_idx, pa.int64()),
                "edge_id": pa.array(net.edge_id[rows], pa.int64()),
                "dir": pa.array(net.dir[rows], pa.uint8()),
                "proj_lon": pa.array(px, pa.float64()),
                "proj_lat": pa.array(py, pa.float64()),
                "dist_m": pa.array(d, pa.float64()),
            }
        )


def scan_edges(ds, store_path: str, radius_m: float = DEFAULT_SEARCH_DISTANCE_M, concurrency=2):
    """ScanService::Edge: all candidates within the square per point."""
    return ds.map_batches(
        _ScanActor,
        fn_constructor_kwargs={"store_path": store_path, "radius_m": radius_m},
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=concurrency,
        num_cpus=1,
    )
