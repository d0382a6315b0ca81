"""Vectorized geodesy kernels (NumPy).

Reproduces the geo-math the reference leans on (the Rust ``geo`` crate's
``Haversine`` metric space) — haversine distance/bearing/destination,
point-on-segment projection, heading deltas, and the angular-complexity
heuristic (reference ``libs/routers_transition/src/map_path/entity.rs:103-296``).

All functions accept scalars or NumPy arrays (broadcasting) of WGS-84
lon/lat degrees and return SI meters / degrees.
"""

from __future__ import annotations

import numpy as np

# Mean earth radius used by the Rust `geo` crate's Haversine implementation.
MEAN_EARTH_RADIUS_M = 6_371_008.8


def haversine_m(lon1, lat1, lon2, lat2):
    """Great-circle distance in meters (geo crate ``Haversine.distance``)."""
    lon1, lat1, lon2, lat2 = (np.radians(np.asarray(a, dtype=np.float64)) for a in (lon1, lat1, lon2, lat2))
    dlat = lat2 - lat1
    dlon = lon2 - lon1
    h = np.sin(dlat * 0.5) ** 2 + np.cos(lat1) * np.cos(lat2) * np.sin(dlon * 0.5) ** 2
    return 2.0 * MEAN_EARTH_RADIUS_M * np.arcsin(np.minimum(1.0, np.sqrt(h)))


def bearing_deg(lon1, lat1, lon2, lat2):
    """Initial great-circle bearing in degrees [0, 360) (geo ``Haversine.bearing``)."""
    lon1, lat1, lon2, lat2 = (np.radians(np.asarray(a, dtype=np.float64)) for a in (lon1, lat1, lon2, lat2))
    dlon = lon2 - lon1
    y = np.sin(dlon) * np.cos(lat2)
    x = np.cos(lat1) * np.sin(lat2) - np.sin(lat1) * np.cos(lat2) * np.cos(dlon)
    return np.mod(np.degrees(np.arctan2(y, x)), 360.0)


def destination(lon, lat, bearing, distance_m):
    """Point reached travelling ``distance_m`` on ``bearing`` (spherical).

    The reference uses geodesic destination only to build the square search
    box around a point (``routers_network/src/primitive/node.rs:33-37``);
    spherical destination differs by <0.5% which only perturbs the (already
    inexact) square-scan boundary.
    """
    lon, lat, bearing = (np.radians(np.asarray(a, dtype=np.float64)) for a in (lon, lat, bearing))
    d = np.asarray(distance_m, dtype=np.float64) / MEAN_EARTH_RADIUS_M
    lat2 = np.arcsin(np.sin(lat) * np.cos(d) + np.cos(lat) * np.sin(d) * np.cos(bearing))
    lon2 = lon + np.arctan2(
        np.sin(bearing) * np.sin(d) * np.cos(lat),
        np.cos(d) - np.sin(lat) * np.sin(lat2),
    )
    return np.degrees(lon2), np.degrees(lat2)


def segment_locate_fraction(px, py, ax, ay, bx, by):
    """Fraction along segment A→B of the closest point to P, clamped [0, 1].

    Computed in raw lon/lat coordinate space exactly as the reference does —
    ``geo``'s planar ``Line::line_locate_point``
    (used at ``routers_network/src/traits/scan.rs:36-41``) operates on the
    raw coordinates, not on projected meters. Degenerate (zero-length)
    segments return NaN (the reference returns ``None``).
    """
    px, py, ax, ay, bx, by = (np.asarray(a, dtype=np.float64) for a in (px, py, ax, ay, bx, by))
    dx, dy = bx - ax, by - ay
    den = dx * dx + dy * dy
    with np.errstate(invalid="ignore", divide="ignore"):
        t = ((px - ax) * dx + (py - ay) * dy) / den
    t = np.clip(t, 0.0, 1.0)
    return np.where(den > 0.0, t, np.nan)


def point_at_fraction(ax, ay, bx, by, frac):
    """Linear interpolation along A→B at ``frac``.

    The reference interpolates the located fraction along the great circle
    (``point_at_ratio_from_start(&Haversine, frac)``,
    ``routers_network/src/traits/scan.rs:39``); for the ≤ a-few-hundred-meter
    edges a matcher sees, linear interpolation in lon/lat agrees to well
    under 1e-6 degrees.
    """
    frac = np.asarray(frac, dtype=np.float64)
    return ax + (bx - ax) * frac, ay + (by - ay) * frac


def wrap_delta_deg(delta):
    """Heading delta wrapped to (-180, 180].

    Reference ``map_path/entity.rs:97-115`` (``deltas_from_headings``):
    ``delta = (curr - prev) % 360`` then shift into (-180, 180].
    Rust ``f64::rem`` keeps the dividend's sign; replicate with fmod.
    """
    delta = np.fmod(np.asarray(delta, dtype=np.float64), 360.0)
    delta = np.where(delta > 180.0, delta - 360.0, delta)
    delta = np.where(delta <= -180.0, delta + 360.0, delta)
    return delta


def headings_from_positions(lons, lats):
    """Bearings of consecutive position pairs ≥ 1 m apart.

    Pairs closer than 1 m are dropped (bearing undefined) — reference
    ``map_path/entity.rs:155-167``.
    """
    lons = np.asarray(lons, dtype=np.float64)
    lats = np.asarray(lats, dtype=np.float64)
    if lons.size < 2:
        return np.empty(0, dtype=np.float64)
    d = haversine_m(lons[:-1], lats[:-1], lons[1:], lats[1:])
    keep = d >= 1.0
    return bearing_deg(lons[:-1][keep], lats[:-1][keep], lons[1:][keep], lats[1:][keep])


def complexity_from_deltas(deltas):
    """Angular-complexity score in [0, 1] from heading deltas.

    Reference ``map_path/entity.rs:269-296`` (``complexity_from_deltas``):
    per-delta cost = clamp(cos(angle·π/180·0.8), 0, 1); any zero (turn ≥
    112.5°) zeroes the path; otherwise the harmonic mean, clamped to [0,1].
    Empty input scores 1.0.
    """
    deltas = np.asarray(deltas, dtype=np.float64)
    n = deltas.size
    if n == 0:
        return 1.0
    a = np.clip(deltas, -180.0, 180.0)
    costs = np.clip(np.cos(a * np.pi / 180.0 * 0.8), 0.0, 1.0)
    if np.any(costs <= 0.0):
        return 0.0
    return float(min(1.0, max(0.0, n / np.sum(1.0 / costs))))


def angular_complexity(lons, lats, start_heading=None, end_heading=None):
    """Angular complexity of a point path with optional endpoint headings.

    Reference ``map_path/entity.rs:241-262``
    (``angular_complexity_with_headings``): headings = [start?] +
    pairwise-position headings + [end?]; deltas of that sequence scored by
    :func:`complexity_from_deltas`.
    """
    hs = headings_from_positions(lons, lats)
    parts = []
    if start_heading is not None:
        parts.append(np.asarray([start_heading], dtype=np.float64))
    parts.append(hs)
    if end_heading is not None:
        parts.append(np.asarray([end_heading], dtype=np.float64))
    headings = np.concatenate(parts) if parts else hs
    if headings.size < 2:
        return 1.0
    return complexity_from_deltas(wrap_delta_deg(headings[1:] - headings[:-1]))


def path_length_m(lons, lats):
    """Cumulative haversine length of a point path (``entity.rs:303-313``)."""
    lons = np.asarray(lons, dtype=np.float64)
    lats = np.asarray(lats, dtype=np.float64)
    if lons.size < 2:
        return 0.0
    return float(np.sum(haversine_m(lons[:-1], lats[:-1], lons[1:], lats[1:])))
