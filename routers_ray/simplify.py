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

__all__ = ["simplify_mask"]


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
