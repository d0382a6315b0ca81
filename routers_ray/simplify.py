"""Polyline simplification (Douglas-Peucker) as a per-doc batch stage.

The tile-rendering staple: collapse a trajectory to the minimal vertex
set whose deviation from the original stays under a tolerance. Runs
inside ``map_batches`` with NO shuffle — each doc's points are already
co-resident in its row (the interleaved-doc layout), so simplification
is embarrassingly parallel and the output is strictly smaller (the
right shape ahead of tile binning / MVT encoding at 100 TB).

Geometry: equirectangular plane anchored at each segment's start
(``x = (lon-lon_a)·cos(radians(lat_a))``, ``y = lat-lat_a``), squared
point-to-segment distance with endpoint clamp, tolerance in degrees².
Pure ``+,-,*,/`` plus one ``cos`` per segment — the independent scalar
oracle (``oracle_match.simplify_expected_path``) reproduces the exact
float decisions, so the kept set is bit-deterministic.

Reference scope: the reference emits raw hop geometry and leaves
simplification to the viewer; this stage is part of the north-rule's
vector-tile materialization surface (``fragment.rs`` pyramid feeds
MVT encoding; simplification bounds feature bytes per tile).
"""

from __future__ import annotations

import numpy as np

__all__ = ["simplify_mask", "resample_track"]


def resample_track(
    lons: np.ndarray, lats: np.ndarray, ts: np.ndarray, k: int = 8
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Resample one trajectory at ``k`` evenly spaced times between its
    first and last timestamp (linear interpolation between bracketing
    points) → (j, lon, lat) arrays.

    Deterministic float contract (the scalar oracle mirrors it exactly):
    points sorted by (ts, original index), duplicate timestamps keep the
    first; ``t_j = ts0 + (tsN - ts0) * j / (k - 1)`` evaluated in that
    order; bracket via ``searchsorted(side='right') - 1`` clamped to the
    last segment; ``f = (t - ts_i) / (ts_{i+1} - ts_i)``. A one-point
    track emits only j=0.
    """
    lons = np.asarray(lons, dtype=np.float64)
    lats = np.asarray(lats, dtype=np.float64)
    ts = np.asarray(ts, dtype=np.int64)
    n = ts.size
    if n == 0:
        e = np.empty(0)
        return np.empty(0, np.int64), e, e
    order = np.lexsort((np.arange(n), ts))
    ts_s = ts[order]
    first = np.concatenate(([True], np.diff(ts_s) != 0))
    order = order[first]
    ts_s = ts_s[first].astype(np.float64)
    lon_s, lat_s = lons[order], lats[order]
    m = ts_s.size
    if m == 1:
        return np.zeros(1, np.int64), lon_s[:1], lat_s[:1]
    js = np.arange(k, dtype=np.float64)
    t = ts_s[0] + (ts_s[-1] - ts_s[0]) * js / (k - 1.0)
    i = np.clip(np.searchsorted(ts_s, t, side="right") - 1, 0, m - 2)
    f = (t - ts_s[i]) / (ts_s[i + 1] - ts_s[i])
    return (
        np.arange(k, dtype=np.int64),
        lon_s[i] + f * (lon_s[i + 1] - lon_s[i]),
        lat_s[i] + f * (lat_s[i + 1] - lat_s[i]),
    )


def simplify_mask(lons: np.ndarray, lats: np.ndarray, eps_deg: float) -> np.ndarray:
    """Boolean keep-mask over the polyline's vertices (endpoints always
    kept). Iterative stack, vectorized distance per interval; max picks
    the FIRST farthest vertex (np.argmax first occurrence) — the scalar
    oracle mirrors that tie-break."""
    lons = np.asarray(lons, dtype=np.float64)
    lats = np.asarray(lats, dtype=np.float64)
    n = lons.size
    keep = np.zeros(n, dtype=bool)
    if n == 0:
        return keep
    keep[0] = keep[-1] = True
    if n <= 2:
        return keep
    eps2 = float(eps_deg) * float(eps_deg)
    stack = [(0, n - 1)]
    while stack:
        a, b = stack.pop()
        if b - a < 2:
            continue
        lon_a, lat_a = lons[a], lats[a]
        ca = np.cos(np.radians(lat_a))
        x = (lons[a + 1 : b] - lon_a) * ca
        y = lats[a + 1 : b] - lat_a
        dx = (lons[b] - lon_a) * ca
        dy = lats[b] - lat_a
        den = dx * dx + dy * dy
        if den == 0.0:
            d2 = x * x + y * y
        else:
            t = np.clip((x * dx + y * dy) / den, 0.0, 1.0)
            ex = x - t * dx
            ey = y - t * dy
            d2 = ex * ex + ey * ey
        i = int(np.argmax(d2))
        if d2[i] > eps2:
            m = a + 1 + i
            keep[m] = True
            stack.append((a, m))
            stack.append((m, b))
    return keep
