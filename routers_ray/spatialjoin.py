"""Distributed radius self-join (co-location pairs).

The canonical spatial self-join shape for a 10^12-row table: each point
is REPLICATED into its 3×3 neighborhood of ``r``-sized degree buckets,
buckets become groups (one tile-keyed exchange), pairs are found with a
vectorized in-group distance matrix, and each qualifying pair is
emitted EXACTLY ONCE by its owner bucket — the elementwise minimum of
the two points' home buckets, which both replicas are guaranteed to
reach (each coordinate of the min differs from either home by ≤ 1).

Distance semantics are Euclidean in degree space (``Δlon² + Δlat² ≤
r²``) — pure IEEE ``+,-,*`` so the DuckDB oracle's self-join predicate
is bit-identical; a metric radius join composes this with a per-pair
haversine refine (same replication bound as long as the bucket edge in
meters ≥ the radius at every latitude of the data).

Reference: the cell-join candidate generation of the matcher
(``routers_network`` R-tree scan, SURVEY §2.4) generalized to a
point↔point join; the replication + owner-dedup is the same
padded-shard first-wins idea as ``network.edge_partition_rows``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["radius_self_join"]

_PAIRS_SCHEMA = pa.schema(
    [
        ("a", pa.int64()),
        ("b", pa.int64()),
        ("dist2", pa.float64()),
    ]
)


def _replicate(batch: pa.Table, r: float, id_col: str, lon_col: str, lat_col: str) -> pa.Table:
    ids = np.asarray(batch[id_col], dtype=np.int64)
    lon = batch[lon_col].to_numpy(zero_copy_only=False).astype(np.float64)
    lat = batch[lat_col].to_numpy(zero_copy_only=False).astype(np.float64)
    hx = np.floor(lon / r).astype(np.int64)
    hy = np.floor(lat / r).astype(np.int64)
    n = ids.size
    reps = 9
    off = np.array([(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)], dtype=np.int64)
    return pa.table(
        {
            "bx": pa.array(np.repeat(hx, reps) + np.tile(off[:, 0], n), pa.int64()),
            "by": pa.array(np.repeat(hy, reps) + np.tile(off[:, 1], n), pa.int64()),
            "id": pa.array(np.repeat(ids, reps), pa.int64()),
            "lon": pa.array(np.repeat(lon, reps), pa.float64()),
            "lat": pa.array(np.repeat(lat, reps), pa.float64()),
            "hx": pa.array(np.repeat(hx, reps), pa.int64()),
            "hy": pa.array(np.repeat(hy, reps), pa.int64()),
        }
    )


def _pairs_of_bucket(group: pa.Table, r: float, metric=None, metric_max: float | None = None) -> pa.Table:
    ids = group["id"].to_numpy(zero_copy_only=False).astype(np.int64)
    if ids.size < 2:
        return _PAIRS_SCHEMA.empty_table()
    lon = group["lon"].to_numpy(zero_copy_only=False)
    lat = group["lat"].to_numpy(zero_copy_only=False)
    hx = group["hx"].to_numpy(zero_copy_only=False).astype(np.int64)
    hy = group["hy"].to_numpy(zero_copy_only=False).astype(np.int64)
    bx = int(group["bx"][0].as_py())
    by = int(group["by"][0].as_py())
    dlon = lon[:, None] - lon[None, :]
    dlat = lat[:, None] - lat[None, :]
    d2 = dlon * dlon + dlat * dlat
    within = d2 <= r * r
    lower = ids[:, None] < ids[None, :]
    # owner bucket: elementwise min of the two HOME buckets — exactly one
    # of the 9² replica meetings satisfies this, so each pair emits once
    owner = (np.minimum(hx[:, None], hx[None, :]) == bx) & (
        np.minimum(hy[:, None], hy[None, :]) == by
    )
    i, j = np.nonzero(within & lower & owner)
    if i.size == 0:
        return _PAIRS_SCHEMA.empty_table()
    if metric is not None:
        # metric refine: the degree radius is the over-covering prefilter
        # (caller guarantees r_deg covers metric_max at the data's
        # latitudes); the emitted distance is the metric one
        m = metric(lon[i], lat[i], lon[j], lat[j])
        keep = m <= metric_max
        i, j, m = i[keep], j[keep], m[keep]
        if i.size == 0:
            return _PAIRS_SCHEMA.empty_table()
        return pa.table(
            {
                "a": pa.array(ids[i], pa.int64()),
                "b": pa.array(ids[j], pa.int64()),
                "dist2": pa.array(np.asarray(m, dtype=np.float64), pa.float64()),
            }
        )
    return pa.table(
        {
            "a": pa.array(ids[i], pa.int64()),
            "b": pa.array(ids[j], pa.int64()),
            "dist2": pa.array(d2[i, j], pa.float64()),
        }
    )


def radius_self_join(
    ds,
    r_deg: float,
    id_col: str,
    lon_col: str = "lon",
    lat_col: str = "lat",
    metric=None,
    metric_max: float | None = None,
):
    """Dataset of points → Dataset of (a, b, dist2) pairs with
    ``Δlon² + Δlat² ≤ r²`` and ``a < b`` — one bucket-keyed exchange,
    9× replication, exactly-once owner emission.

    Metric variant: pass ``metric(lon_a, lat_a, lon_b, lat_b) -> dist``
    (e.g. haversine meters) and ``metric_max`` — pairs with metric ≤
    metric_max, with the degree radius acting as the over-covering
    replication prefilter. The REPLICATION BOUND is the caller's
    contract: ``r_deg ≥ metric_max / (111195 · cos(max |lat|))`` (E-W
    shrinks with latitude; filter or band the input accordingly)."""
    rep = ds.map_batches(
        lambda b: _replicate(b, r_deg, id_col, lon_col, lat_col), batch_format="pyarrow"
    )
    return rep.groupby(["bx", "by"]).map_groups(
        lambda g: _pairs_of_bucket(g, r_deg, metric, metric_max), batch_format="pyarrow"
    )
