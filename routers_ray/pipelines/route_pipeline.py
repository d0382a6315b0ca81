"""Optimise/Route service: point-to-point routing as a Dataset stage.

Reference: ``OptimiseService::Route`` — start/end coordinates → nearest
nodes → minimum road-class-weight route (A* with zero heuristic) → cost +
shape (``routers_rpc/src/services/optimise.rs``, ``osm/graph.rs:365-384``).
Each input row carries (start_lon, start_lat, end_lon, end_lat); output adds
cost, n_hops, and the route shape.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .match_pipeline import HOP_TYPE, get_store


class _RouteActor:
    def __init__(self, store_path: str, buffer_m: float = 5_000.0):
        self.store = get_store(store_path)
        self.buffer_m = buffer_m

    def __call__(self, batch: pa.Table) -> pa.Table:
        s_lon = np.asarray(batch["start_lon"], dtype=np.float64)
        s_lat = np.asarray(batch["start_lat"], dtype=np.float64)
        t_lon = np.asarray(batch["end_lon"], dtype=np.float64)
        t_lat = np.asarray(batch["end_lat"], dtype=np.float64)
        costs, hops, shapes = [], [], []
        for i in range(len(batch)):
            lo_x = min(s_lon[i], t_lon[i])
            hi_x = max(s_lon[i], t_lon[i])
            lo_y = min(s_lat[i], t_lat[i])
            hi_y = max(s_lat[i], t_lat[i])
            net = self.store.network_for_bbox(lo_x, lo_y, hi_x, hi_y, buffer_m=self.buffer_m)
            hit = net.route_points(float(s_lon[i]), float(s_lat[i]), float(t_lon[i]), float(t_lat[i]))
            if hit is None:
                costs.append(None), hops.append(0), shapes.append(None)
            else:
                cost, lons, lats, _ids = hit
                costs.append(int(cost))
                hops.append(int(lons.size))
                shapes.append([{"lon": float(x), "lat": float(y)} for x, y in zip(lons, lats)])
        out = batch.append_column("cost", pa.array(costs, pa.uint32()))
        out = out.append_column("n_hops", pa.array(hops, pa.int32()))
        return out.append_column("shape", pa.array(shapes, HOP_TYPE))


def route_pairs(ds, store_path: str, concurrency=2, buffer_m: float = 5_000.0):
    return ds.map_batches(
        _RouteActor,
        fn_constructor_kwargs={"store_path": store_path, "buffer_m": buffer_m},
        batch_format="pyarrow",
        batch_size=1024,
        concurrency=concurrency,
        num_cpus=1,
    )
