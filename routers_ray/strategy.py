"""Interchangeable cell systems behind one ``ShardingStrategy`` interface.

The reference makes its sharding cell system pluggable — ``ShardingStrategy
{ locate, bounds, neighbours, contains }`` (``routers_shard/src/strategy/
mod.rs:38-56``) — with geohash (``strategy/geohash.rs``), quadtree/QuadKey
(``strategy/quadtree.rs``) implementations, S2 cells backing the timezone
index (``routers_tz/build/impl/s2cell.rs:13-100``) and slippy/Hilbert keys
backing tiles. This module is the engine's formal version of that
interface with three interchangeable implementations:

- :class:`QuadkeyStrategy` — the engine's default zoom-tagged Morton
  quadkey (wraps :mod:`routers_ray.cells`);
- :class:`GeohashStrategy` — base-32 geohash at a precision (the
  reference's shard default is precision 4);
- :class:`S2Strategy` — real S2 cell ids (face + quadratic ST projection
  + Hilbert position, the public s2geometry construction), built from the
  standard 4-bit lookup tables.

All ``locate`` outputs are uint64 ids; any strategy can key the network
store / routing shuffle (property-tested interchangeability in
``tests/test_strategy.py``).
"""

from __future__ import annotations

import numpy as np

from . import cells as _cells

__all__ = ["QuadkeyStrategy", "GeohashStrategy", "S2Strategy"]


class QuadkeyStrategy:
    """Zoom-tagged Morton quadkey cells (``strategy/quadtree.rs:30-34``)."""

    def __init__(self, zoom: int = 12):
        self.zoom = zoom

    def locate(self, lons, lats) -> np.ndarray:
        return _cells.lonlat_to_cell(lons, lats, self.zoom)

    def bounds(self, cell):
        x, y, z = _cells.cell_decode(cell)
        return _cells.tile_bounds(x, y, int(np.atleast_1d(z)[0]))

    def neighbours(self, cell) -> np.ndarray:
        disk = _cells.cell_disk(cell, 1)[0]
        c = int(np.atleast_1d(np.asarray(cell, dtype=np.uint64))[0])
        return np.unique(disk[disk != c])

    def contains(self, cell, lons, lats) -> np.ndarray:
        c = np.atleast_1d(np.asarray(cell, dtype=np.uint64))[0]
        return self.locate(lons, lats) == c


class GeohashStrategy:
    """Base-32 geohash cells packed to u64 (``strategy/geohash.rs:15-23,
    85-137``; u64 packing ``cluster.rs:79-98``)."""

    def __init__(self, precision: int = 4):
        self.precision = precision

    def locate(self, lons, lats) -> np.ndarray:
        return _cells.geohash_to_u64(_cells.geohash_encode(lons, lats, self.precision))

    def _cell_size(self) -> tuple[float, float]:
        bits = self.precision * 5
        lon_bits = (bits + 1) // 2
        lat_bits = bits // 2
        return 360.0 / (1 << lon_bits), 180.0 / (1 << lat_bits)

    def _decode_u64(self, cell) -> tuple[float, float]:
        """u64 → center lon/lat (inverse of the 5-bit packing)."""
        c = int(np.atleast_1d(np.asarray(cell, dtype=np.uint64))[0])
        chars = []
        length = c & 0xF  # length tag (cluster.rs packing)
        v = c >> 4
        for i in range(length):
            chars.append((v >> (5 * (length - 1 - i))) & 0x1F)
        alphabet = "0123456789bcdefghjkmnpqrstuvwxyz"
        gh = "".join(alphabet[x] for x in chars)
        lon, lat = _cells.geohash_decode([gh])
        return float(lon[0]), float(lat[0])

    def bounds(self, cell):
        lon, lat = self._decode_u64(cell)
        dlon, dlat = self._cell_size()
        return lon - dlon / 2, lat - dlat / 2, lon + dlon / 2, lat + dlat / 2

    def neighbours(self, cell) -> np.ndarray:
        lon, lat = self._decode_u64(cell)
        dlon, dlat = self._cell_size()
        out = []
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dx == 0 and dy == 0:
                    continue
                nlon = ((lon + dx * dlon + 180.0) % 360.0) - 180.0
                nlat = min(max(lat + dy * dlat, -90.0 + 1e-9), 90.0 - 1e-9)
                out.append(int(self.locate(np.asarray([nlon]), np.asarray([nlat]))[0]))
        c = int(np.atleast_1d(np.asarray(cell, dtype=np.uint64))[0])
        return np.unique(np.asarray([o for o in out if o != c], dtype=np.uint64))

    def contains(self, cell, lons, lats) -> np.ndarray:
        c = np.atleast_1d(np.asarray(cell, dtype=np.uint64))[0]
        return self.locate(lons, lats) == c


# ---------------------------------------------------------------------------
# S2 (public s2geometry cell-id construction)

_SWAP, _INVERT = 1, 2
_POS_TO_IJ = ((0, 1, 3, 2), (0, 2, 3, 1), (3, 2, 0, 1), (3, 1, 0, 2))
_POS_TO_ORIENT = (_SWAP, 0, 0, _INVERT | _SWAP)
_LOOKUP_BITS = 4
_MAX_LEVEL = 30


def _build_lookups():
    lookup_pos = np.zeros(1 << (2 * _LOOKUP_BITS + 2), dtype=np.uint64)
    lookup_ij = np.zeros(1 << (2 * _LOOKUP_BITS + 2), dtype=np.uint64)

    def rec(level, i, j, orig, pos, orient):
        if level == _LOOKUP_BITS:
            ij = (i << _LOOKUP_BITS) | j
            lookup_pos[(ij << 2) | orig] = (pos << 2) | orient
            lookup_ij[(pos << 2) | orig] = (ij << 2) | orient
            return
        for index in range(4):
            d = _POS_TO_IJ[orient][index]
            rec(
                level + 1,
                (i << 1) | (d >> 1),
                (j << 1) | (d & 1),
                orig,
                (pos << 2) | index,
                orient ^ _POS_TO_ORIENT[index],
            )

    for o in range(4):
        rec(0, 0, 0, o, 0, o)
    return lookup_pos, lookup_ij


_LOOKUP_POS, _LOOKUP_IJ = _build_lookups()


def _st_from_uv(u: np.ndarray) -> np.ndarray:
    """Quadratic UV→ST projection (s2geometry's default)."""
    with np.errstate(invalid="ignore"):  # np.where evaluates both branches
        return np.where(
            u >= 0.0, 0.5 * np.sqrt(1.0 + 3.0 * u), 1.0 - 0.5 * np.sqrt(1.0 - 3.0 * u)
        )


def _uv_from_st(s: np.ndarray) -> np.ndarray:
    return np.where(
        s >= 0.5, (1.0 / 3.0) * (4.0 * s * s - 1.0), (1.0 / 3.0) * (1.0 - 4.0 * (1.0 - s) ** 2)
    )


def _face_uv(lons, lats):
    lon = np.radians(np.asarray(lons, dtype=np.float64))
    lat = np.radians(np.asarray(lats, dtype=np.float64))
    x = np.cos(lat) * np.cos(lon)
    y = np.cos(lat) * np.sin(lon)
    z = np.sin(lat)
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    face = np.where(ax >= ay, np.where(ax >= az, 0, 2), np.where(ay >= az, 1, 2))
    face = face + np.where(
        (face == 0) & (x < 0), 3, np.where((face == 1) & (y < 0), 3, np.where((face == 2) & (z < 0), 3, 0))
    )
    u = np.empty_like(x)
    v = np.empty_like(x)
    for f, (ue, ve, de) in enumerate(
        [
            (lambda: y / x, lambda: z / x, None),
            (lambda: -x / y, lambda: z / y, None),
            (lambda: -x / z, lambda: -y / z, None),
            (lambda: z / x, lambda: y / x, None),
            (lambda: z / y, lambda: -x / y, None),
            (lambda: -y / z, lambda: -x / z, None),
        ]
    ):
        m = face == f
        if m.any():
            with np.errstate(divide="ignore", invalid="ignore"):
                u[m] = ue()[m]
                v[m] = ve()[m]
    return face.astype(np.int64), u, v


class S2Strategy:
    """S2 cell ids at a fixed level — face (3 bits) + Hilbert position
    (2·level bits) + trailing 1, the s2geometry construction the reference
    timezone index keys on (``routers_tz/build/impl/s2cell.rs:13-100``)."""

    def __init__(self, level: int = 12):
        if not 0 <= level <= _MAX_LEVEL:
            raise ValueError("level out of range")
        self.level = level

    # -- core id math ------------------------------------------------------

    def _leaf_from_face_ij(self, face: np.ndarray, i: np.ndarray, j: np.ndarray) -> np.ndarray:
        n = face.astype(np.uint64) << np.uint64(60)
        bits = (face & _SWAP).astype(np.uint64)
        mask = np.uint64((1 << _LOOKUP_BITS) - 1)
        for k in range(7, -1, -1):
            kk = np.uint64(k * _LOOKUP_BITS)
            bits += ((i.astype(np.uint64) >> kk) & mask) << np.uint64(_LOOKUP_BITS + 2)
            bits += ((j.astype(np.uint64) >> kk) & mask) << np.uint64(2)
            bits = _LOOKUP_POS[bits.astype(np.int64)]
            n |= (bits >> np.uint64(2)) << np.uint64(k * 2 * _LOOKUP_BITS)
            bits &= np.uint64(_SWAP | _INVERT)
        return n * np.uint64(2) + np.uint64(1)

    def locate(self, lons, lats) -> np.ndarray:
        face, u, v = _face_uv(lons, lats)
        s = _st_from_uv(u)
        t = _st_from_uv(v)
        lim = (1 << _MAX_LEVEL) - 1
        i = np.clip((s * (1 << _MAX_LEVEL)).astype(np.int64), 0, lim)
        j = np.clip((t * (1 << _MAX_LEVEL)).astype(np.int64), 0, lim)
        leaf = self._leaf_from_face_ij(face, i, j)
        lsb = np.uint64(1) << np.uint64(2 * (_MAX_LEVEL - self.level))
        return (leaf & ~(lsb - np.uint64(1)) & ~lsb) | lsb

    def parent(self, cell, steps: int = 1) -> np.ndarray:
        c = np.asarray(cell, dtype=np.uint64)
        lsb = c & (~c + np.uint64(1))
        nlsb = lsb << np.uint64(2 * steps)
        return (c & ~(nlsb - np.uint64(1)) & ~nlsb) | nlsb

    def _face_ij_level(self, cell: int) -> tuple[int, int, int, int]:
        c = int(cell)
        face = c >> 61
        lsb = c & -c
        level = _MAX_LEVEL - (lsb.bit_length() - 1) // 2
        # walk the position nibbles back to (i, j)
        pos = (c >> 1) & ((1 << 60) - 1)
        i = j = 0
        bits = face & _SWAP
        for k in range(7, -1, -1):
            nbits = _LOOKUP_BITS
            bits += int((pos >> (k * 2 * _LOOKUP_BITS)) & ((1 << (2 * nbits)) - 1)) << 2
            bits = int(_LOOKUP_IJ[bits])
            i += (bits >> (_LOOKUP_BITS + 2)) << (k * _LOOKUP_BITS)
            j += ((bits >> 2) & ((1 << _LOOKUP_BITS) - 1)) << (k * _LOOKUP_BITS)
            bits &= _SWAP | _INVERT
        # align to the cell's base corner (bits below the level are
        # sentinel artifacts of the non-leaf id)
        size = 1 << (_MAX_LEVEL - level)
        i &= ~(size - 1)
        j &= ~(size - 1)
        return face, i, j, level

    def center(self, cell) -> tuple[float, float]:
        """Cell-center lon/lat (via the leaf at the cell's center ij)."""
        c = int(np.atleast_1d(np.asarray(cell, dtype=np.uint64))[0])
        face, i, j, level = self._face_ij_level(c)
        size = 1 << (_MAX_LEVEL - level)
        si = i + size // 2
        tj = j + size // 2
        s = si / (1 << _MAX_LEVEL)
        t = tj / (1 << _MAX_LEVEL)
        u = _uv_from_st(np.asarray([s]))[0]
        v = _uv_from_st(np.asarray([t]))[0]
        xyz = {
            0: (1.0, u, v), 1: (-u, 1.0, v), 2: (-u, -v, 1.0),
            3: (-1.0, -v, -u), 4: (v, -1.0, -u), 5: (v, u, -1.0),
        }[face]
        x, y, z = xyz
        lon = float(np.degrees(np.arctan2(y, x)))
        lat = float(np.degrees(np.arctan2(z, np.hypot(x, y))))
        return lon, lat

    def bounds(self, cell):
        """Lon/lat bbox of the cell's 4 corners (S2 cells are spherical
        quadrilaterals — the bbox is a covering approximation, documented)."""
        c = int(np.atleast_1d(np.asarray(cell, dtype=np.uint64))[0])
        face, i, j, level = self._face_ij_level(c)
        size = 1 << (_MAX_LEVEL - level)
        lons, lats = [], []
        for di, dj in ((0, 0), (size, 0), (0, size), (size, size)):
            s = (i + di) / (1 << _MAX_LEVEL)
            t = (j + dj) / (1 << _MAX_LEVEL)
            u = _uv_from_st(np.asarray([s]))[0]
            v = _uv_from_st(np.asarray([t]))[0]
            xyz = {
                0: (1.0, u, v), 1: (-u, 1.0, v), 2: (-u, -v, 1.0),
                3: (-1.0, -v, -u), 4: (v, -1.0, -u), 5: (v, u, -1.0),
            }[face]
            x, y, z = xyz
            lons.append(float(np.degrees(np.arctan2(y, x))))
            lats.append(float(np.degrees(np.arctan2(z, np.hypot(x, y)))))
        return min(lons), min(lats), max(lons), max(lats)

    def neighbours(self, cell) -> np.ndarray:
        """Edge/corner neighbours: exact same-face ij±size steps, UNIONED
        with geometric center-steps past the face boundary (a point nudged
        one cell-extent beyond the edge lands on the adjacent face via
        ``locate`` — covering the cross-face adjacency the raw ij
        arithmetic cannot express)."""
        c = int(np.atleast_1d(np.asarray(cell, dtype=np.uint64))[0])
        face, i, j, level = self._face_ij_level(c)
        size = 1 << (_MAX_LEVEL - level)
        lim = 1 << _MAX_LEVEL
        out = []
        at_edge = False
        for di in (-size, 0, size):
            for dj in (-size, 0, size):
                if di == 0 and dj == 0:
                    continue
                ni, nj = i + di, j + dj
                if 0 <= ni < lim and 0 <= nj < lim:
                    leaf = self._leaf_from_face_ij(
                        np.asarray([face]), np.asarray([ni]), np.asarray([nj])
                    )
                    lsb = np.uint64(1) << np.uint64(2 * (_MAX_LEVEL - level))
                    out.append(int((leaf[0] & ~(lsb - np.uint64(1)) & ~lsb) | lsb))
                else:
                    at_edge = True
        if at_edge:
            # cross-face: step the center by ~1.5 cell extents in 8
            # directions and locate the landing cells
            lon0, lat0 = self.center(c)
            w, s, e, n = self.bounds(c)
            dlon = max((e - w), 1e-9) * 1.5
            dlat = max((n - s), 1e-9) * 1.5
            steps_lon, steps_lat = [], []
            for dx in (-1, 0, 1):
                for dy in (-1, 0, 1):
                    if dx == 0 and dy == 0:
                        continue
                    steps_lon.append(((lon0 + dx * dlon + 180.0) % 360.0) - 180.0)
                    steps_lat.append(min(max(lat0 + dy * dlat, -89.999), 89.999))
            out.extend(int(x) for x in self.locate(np.asarray(steps_lon), np.asarray(steps_lat)))
        return np.unique(np.asarray([o for o in out if o != c], dtype=np.uint64))

    def contains(self, cell, lons, lats) -> np.ndarray:
        c = np.atleast_1d(np.asarray(cell, dtype=np.uint64))[0]
        return self.locate(lons, lats) == c
