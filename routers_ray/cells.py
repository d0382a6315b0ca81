"""Cell systems: slippy tiles, Morton-packed quadkey cell ids, Hilbert keys.

The reference treats cell systems as interchangeable sharding strategies —
geohash (``routers_shard/src/strategy/geohash.rs``), quadtree/QuadKey
(``strategy/quadtree.rs:30-34,85-124``, 2 bits per level packed into a u64),
S2 and slippy/Hilbert tiles (``routers_tiles/src/primitives/fragment.rs``).
This engine standardizes on the quadkey family: a cell is a slippy tile
(z, x, y) packed into a single ``uint64``; the tile pyramid gives parent /
children / zoom-compaction for free, and Hilbert packing gives the
spatially-local sort key the tile sink orders by
(``fragment.rs:69-71`` ``to_hilbert``).

Packing: ``cell = (1 << 2z) | morton(x, y)``. The sentinel bit encodes the
zoom, so ``parent(cell) == cell >> 2`` works without carrying (z) separately
— the same trick as the reference's normalized quadkeys.

Everything is vectorized over NumPy uint64/int64 arrays.
"""

from __future__ import annotations

import numpy as np

MAX_ZOOM = 29  # 2*29 + 1 = 59 bits < 64


def lonlat_to_tile(lon, lat, z: int):
    """Slippy tile (x, y) at zoom ``z`` for WGS-84 lon/lat.

    Standard WebMercator tiling, identical to the reference's
    ``SlippyTile::project`` (``routers_geo/src/project.rs:47-74``).
    Latitude is clamped to the WebMercator domain.
    """
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.clip(np.asarray(lat, dtype=np.float64), -85.05112878, 85.05112878)
    n = np.float64(1 << z)
    x = np.floor((lon + 180.0) / 360.0 * n)
    lat_r = np.radians(lat)
    y = np.floor((1.0 - np.log(np.tan(lat_r) + 1.0 / np.cos(lat_r)) / np.pi) / 2.0 * n)
    x = np.clip(x, 0, n - 1).astype(np.uint64)
    y = np.clip(y, 0, n - 1).astype(np.uint64)
    return x, y


def tile_bounds(x, y, z: int):
    """(lon_w, lat_s, lon_e, lat_n) bounds of slippy tile(s)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    n = np.float64(1 << z)

    def _lat(yy):
        return np.degrees(np.arctan(np.sinh(np.pi * (1.0 - 2.0 * yy / n))))

    lon_w = x / n * 360.0 - 180.0
    lon_e = (x + 1) / n * 360.0 - 180.0
    return lon_w, _lat(y + 1), lon_e, _lat(y)


def _part1by1(v):
    """Interleave: spread the low 32 bits of v into even bit positions."""
    v = v.astype(np.uint64) & np.uint64(0xFFFFFFFF)
    v = (v | (v << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
    v = (v | (v << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
    v = (v | (v << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    v = (v | (v << np.uint64(2))) & np.uint64(0x3333333333333333)
    v = (v | (v << np.uint64(1))) & np.uint64(0x5555555555555555)
    return v


def _unpart1by1(v):
    v = v.astype(np.uint64) & np.uint64(0x5555555555555555)
    v = (v | (v >> np.uint64(1))) & np.uint64(0x3333333333333333)
    v = (v | (v >> np.uint64(2))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    v = (v | (v >> np.uint64(4))) & np.uint64(0x00FF00FF00FF00FF)
    v = (v | (v >> np.uint64(8))) & np.uint64(0x0000FFFF0000FFFF)
    v = (v | (v >> np.uint64(16))) & np.uint64(0x00000000FFFFFFFF)
    return v


def morton(x, y):
    """Z-order interleave of (x, y) — x in even bits, y in odd bits."""
    return _part1by1(np.asarray(x, dtype=np.uint64)) | (_part1by1(np.asarray(y, dtype=np.uint64)) << np.uint64(1))


def unmorton(m):
    m = np.asarray(m, dtype=np.uint64)
    return _unpart1by1(m), _unpart1by1(m >> np.uint64(1))


def cell_id(x, y, z: int):
    """Pack tile (x, y, z) into a zoom-tagged uint64 quadkey cell id."""
    if z > MAX_ZOOM:
        raise ValueError(f"zoom {z} exceeds MAX_ZOOM={MAX_ZOOM}")
    return morton(x, y) | (np.uint64(1) << np.uint64(2 * z))


def cell_decode(cell):
    """Inverse of :func:`cell_id` → (x, y, z) with per-element zoom."""
    cell = np.asarray(cell, dtype=np.uint64)
    # zoom = floor(log2(cell)) / 2 — the sentinel is the highest set bit
    nbits = np.zeros(cell.shape, dtype=np.uint64)
    v = cell.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        s = np.uint64(shift)
        big = v >= (np.uint64(1) << s)
        nbits = np.where(big, nbits + s, nbits)
        v = np.where(big, v >> s, v)
    z = (nbits // np.uint64(2)).astype(np.int64)
    mort = cell ^ (np.uint64(1) << (np.uint64(2) * z.astype(np.uint64)))
    x, y = unmorton(mort)
    return x, y, z


def lonlat_to_cell(lon, lat, z: int):
    x, y = lonlat_to_tile(lon, lat, z)
    return cell_id(x, y, z)


def cell_parent(cell, steps: int = 1):
    """Parent cell ``steps`` zoom levels up — zoom compaction / tile roll-up
    (reference ``fragment.rs:35-47`` ``detail``/``segment``)."""
    return np.asarray(cell, dtype=np.uint64) >> np.uint64(2 * steps)


def cell_zoom(cell) -> np.ndarray:
    return cell_decode(cell)[2]


def cell_disk(cell, k: int = 1):
    """The (2k+1)² square neighborhood of each cell (clamped at the y edges,
    wrapped in x) — the analogue of the reference's 9-cell shard window
    (``routers_shard/src/loader/window.rs:90-108``) and of H3 ``grid_disk``.

    Returns an array of shape ``(n, (2k+1)**2)``; out-of-range rows are
    clamped (duplicates possible — dedup at use site).
    """
    cell = np.atleast_1d(np.asarray(cell, dtype=np.uint64))
    x, y, z = cell_decode(cell)
    n_side = (np.uint64(1) << z.astype(np.uint64))
    offs = np.arange(-k, k + 1, dtype=np.int64)
    ox, oy = np.meshgrid(offs, offs, indexing="ij")
    ox = ox.ravel()[None, :]
    oy = oy.ravel()[None, :]
    xs = (x.astype(np.int64)[:, None] + ox) % n_side.astype(np.int64)[:, None]
    ys = np.clip(y.astype(np.int64)[:, None] + oy, 0, (n_side.astype(np.int64) - 1)[:, None])
    sent = (np.uint64(1) << (np.uint64(2) * z.astype(np.uint64)))[:, None]
    return morton(xs.astype(np.uint64), ys.astype(np.uint64)) | sent


def cells_covering_bbox(lon_w, lat_s, lon_e, lat_n, z: int, cap: int = 4096):
    """All cells at zoom ``z`` intersecting a lon/lat bbox (scalar inputs).

    Used to key edge segments by every cell their envelope (plus search
    buffer) touches — the cell-join superset of the reference's square
    R-tree scan (``routers_network/src/primitive/index.rs:73-79``).
    """
    x0, y1 = lonlat_to_tile(lon_w, lat_s, z)  # south-west → max y
    x1, y0 = lonlat_to_tile(lon_e, lat_n, z)
    xs = np.arange(int(x0), int(x1) + 1, dtype=np.uint64)
    ys = np.arange(int(y0), int(y1) + 1, dtype=np.uint64)
    if xs.size * ys.size > cap:
        raise ValueError(f"bbox covers {xs.size * ys.size} cells at z{z} (> cap {cap})")
    gx, gy = np.meshgrid(xs, ys, indexing="ij")
    return cell_id(gx.ravel(), gy.ravel(), z)


def segment_covering_cells(ax, ay, bx, by, z: int, buffer_deg_x, buffer_deg_y):
    """Vectorized per-segment covering cells.

    For each segment (a→b) returns the cells at zoom ``z`` whose tiles
    intersect the segment's *line* expanded by the buffer (degrees). Output
    is a flat (row_index, cell) pair of arrays — ready to explode an edge
    table into its (cell, edge) index rows.

    Long diagonal segments are chopped into sub-segments roughly one tile
    long before bbox-covering, so the cover is O(length/tile) cells — a
    whole-bbox cover of a 30 km motorway at a street-level zoom would be
    O(area) and blow the index up quadratically. The union of sub-segment
    bbox covers is still a superset of the buffered line (every point of
    the segment lies inside its own sub-bbox).
    """
    ax, ay, bx, by = (np.asarray(v, dtype=np.float64) for v in (ax, ay, bx, by))

    # split segments spanning more than ~2 tiles on either axis
    tile_deg = 360.0 / float(1 << z)
    span = np.maximum(np.abs(bx - ax), np.abs(by - ay))
    n_sub = np.maximum(1, np.ceil(span / (2.0 * tile_deg)).astype(np.int64))
    if int(n_sub.max(initial=1)) > 1:
        reps = n_sub
        seg_row = np.repeat(np.arange(ax.size, dtype=np.int64), reps)
        starts = np.concatenate(([0], np.cumsum(reps)[:-1]))
        local = np.arange(int(reps.sum()), dtype=np.int64) - np.repeat(starts, reps)
        denom = np.repeat(n_sub, reps).astype(np.float64)
        t0 = local / denom
        t1 = (local + 1) / denom
        sub_ax = ax[seg_row] + (bx[seg_row] - ax[seg_row]) * t0
        sub_bx = ax[seg_row] + (bx[seg_row] - ax[seg_row]) * t1
        sub_ay = ay[seg_row] + (by[seg_row] - ay[seg_row]) * t0
        sub_by = ay[seg_row] + (by[seg_row] - ay[seg_row]) * t1
        rows_sub, cells_sub = _bbox_cover(
            sub_ax, sub_ay, sub_bx, sub_by, z, buffer_deg_x, buffer_deg_y
        )
        rows = seg_row[rows_sub]
        # sub-bbox covers of one segment overlap at joints — dedup (row, cell)
        order = np.lexsort((cells_sub, rows))
        rows, cells_sub = rows[order], cells_sub[order]
        keep = np.ones(rows.size, dtype=bool)
        if rows.size:
            keep[1:] = (rows[1:] != rows[:-1]) | (cells_sub[1:] != cells_sub[:-1])
        return rows[keep], cells_sub[keep]
    return _bbox_cover(ax, ay, bx, by, z, buffer_deg_x, buffer_deg_y)


def _bbox_cover(ax, ay, bx, by, z: int, buffer_deg_x, buffer_deg_y):
    lo_x = np.minimum(ax, bx) - buffer_deg_x
    hi_x = np.maximum(ax, bx) + buffer_deg_x
    lo_y = np.minimum(ay, by) - buffer_deg_y
    hi_y = np.maximum(ay, by) + buffer_deg_y
    tx0, ty1 = lonlat_to_tile(lo_x, lo_y, z)
    tx1, ty0 = lonlat_to_tile(hi_x, hi_y, z)
    nx = (tx1 - tx0 + np.uint64(1)).astype(np.int64)
    ny = (ty1 - ty0 + np.uint64(1)).astype(np.int64)
    counts = nx * ny
    total = int(counts.sum())
    rows = np.repeat(np.arange(ax.size, dtype=np.int64), counts)
    # per-row local index 0..count-1
    starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
    local = np.arange(total, dtype=np.int64) - np.repeat(starts, counts)
    r_nx = np.repeat(nx, counts)
    dx = local % r_nx
    dy = local // r_nx
    xs = np.repeat(tx0.astype(np.int64), counts) + dx
    ys = np.repeat(ty0.astype(np.int64), counts) + dy
    return rows, cell_id(xs.astype(np.uint64), ys.astype(np.uint64), z)


def hilbert_xy2d(x, y, z: int):
    """Hilbert curve index of tile (x, y) at order ``z`` — the reference's
    ``xy2h`` row-key component (``routers_tiles/src/primitives/fragment.rs:69-71``).

    Classic bit-wise rotation algorithm, vectorized.
    """
    x = np.asarray(x, dtype=np.uint64).copy()
    y = np.asarray(y, dtype=np.uint64).copy()
    d = np.zeros_like(x, dtype=np.uint64)
    s = np.uint64(1) << np.uint64(max(z - 1, 0))
    one = np.uint64(1)
    zero = np.uint64(0)
    while s > zero:
        rx = np.where((x & s) > zero, one, zero)
        ry = np.where((y & s) > zero, one, zero)
        d += s * s * ((np.uint64(3) * rx) ^ ry)
        # rotate
        swap = ry == zero
        flip = swap & (rx == one)
        x_f = np.where(flip, s - one - x, x)
        y_f = np.where(flip, s - one - y, y)
        x, y = np.where(swap, y_f, x_f), np.where(swap, x_f, y_f)
        s >>= one
    return d


_GH32 = "0123456789bcdefghjkmnpqrstuvwxyz"
_GH32_INV = {c: i for i, c in enumerate(_GH32)}


def geohash_encode(lon, lat, precision: int = 4):
    """Base-32 geohash strings, vectorized (reference sharding cell system,
    ``routers_shard/src/strategy/geohash.rs:15-23,85-137``; precision 4 is
    the shard default, ``routers_realtime/src/event.rs:245``).

    Geohash interleaves lon/lat bisections starting with longitude; each
    character encodes 5 bits.
    """
    lon = np.atleast_1d(np.asarray(lon, dtype=np.float64))
    lat = np.atleast_1d(np.asarray(lat, dtype=np.float64))
    nbits = precision * 5
    # bit i (from the MSB) alternates lon (even) / lat (odd)
    n_lon = (nbits + 1) // 2
    n_lat = nbits // 2
    lon_q = np.clip(((lon + 180.0) / 360.0 * (1 << n_lon)).astype(np.uint64), 0, (1 << n_lon) - 1)
    lat_q = np.clip(((lat + 90.0) / 180.0 * (1 << n_lat)).astype(np.uint64), 0, (1 << n_lat) - 1)
    # interleave: lon bits at even positions (MSB first)
    val = np.zeros(lon.shape, dtype=np.uint64)
    li, bi = n_lon, n_lat
    for i in range(nbits):
        if i % 2 == 0:
            li -= 1
            bit = (lon_q >> np.uint64(li)) & np.uint64(1)
        else:
            bi -= 1
            bit = (lat_q >> np.uint64(bi)) & np.uint64(1)
        val = (val << np.uint64(1)) | bit
    chars = []
    for i in range(precision):
        shift = np.uint64(5 * (precision - 1 - i))
        chars.append((val >> shift) & np.uint64(31))
    out = ["".join(_GH32[int(c[j])] for c in chars) for j in range(lon.size)]
    return out


def geohash_decode(hashes) -> tuple[np.ndarray, np.ndarray]:
    """Center (lon, lat) of geohash cells (``strategy/geohash.rs:43-64``)."""
    lons = np.empty(len(hashes))
    lats = np.empty(len(hashes))
    for j, h in enumerate(hashes):
        lon_lo, lon_hi, lat_lo, lat_hi = -180.0, 180.0, -90.0, 90.0
        even = True
        for ch in h:
            v = _GH32_INV[ch]
            for b in (16, 8, 4, 2, 1):
                if even:
                    mid = (lon_lo + lon_hi) / 2.0
                    if v & b:
                        lon_lo = mid
                    else:
                        lon_hi = mid
                else:
                    mid = (lat_lo + lat_hi) / 2.0
                    if v & b:
                        lat_lo = mid
                    else:
                        lat_hi = mid
                even = not even
        lons[j] = (lon_lo + lon_hi) / 2.0
        lats[j] = (lat_lo + lat_hi) / 2.0
    return lons, lats


def geohash_to_u64(hashes) -> np.ndarray:
    """Pack geohash strings into u64 ids — 5 bits per char, length tag in
    the low bits (reference packing ``routers_geo/src/cluster.rs:79-98``)."""
    out = np.zeros(len(hashes), dtype=np.uint64)
    for j, h in enumerate(hashes):
        v = np.uint64(0)
        for ch in h:
            v = (v << np.uint64(5)) | np.uint64(_GH32_INV[ch])
        out[j] = (v << np.uint64(4)) | np.uint64(len(h) & 0xF)
    return out


def compact_xy(x, y, zoom: int, floor: int):
    """Mixed-resolution compaction of a set of (x, y) tiles at ``zoom``:
    every complete 4-sibling quad is replaced by its parent, recursively,
    until ``floor`` — the minimal multi-zoom cover (H3 ``compact_cells`` /
    the reference's zoom-compaction walk, ``fragment.rs:35-47``).

    Pure per-subtree kernel: dedups its input, vectorized per level.
    Returns (zoom, x, y) int64 arrays. Callers shard by the ``floor``
    ancestor — promotions never cross it, so the global compact is the
    union of independent per-ancestor compacts."""
    if floor > zoom:
        raise ValueError(f"floor {floor} above zoom {zoom}")
    key = np.unique(
        (np.asarray(x, dtype=np.int64) << np.int64(32)) | np.asarray(y, dtype=np.int64)
    )
    x = key >> np.int64(32)
    y = key & np.int64(0xFFFFFFFF)
    out_z, out_x, out_y = [], [], []
    for z in range(zoom, floor, -1):
        pk = ((x >> 1) << np.int64(32)) | (y >> 1)
        uniq, counts = np.unique(pk, return_counts=True)
        complete = uniq[counts == 4]
        final = ~np.isin(pk, complete)
        out_z.append(np.full(int(final.sum()), z, dtype=np.int64))
        out_x.append(x[final])
        out_y.append(y[final])
        x, y = complete >> np.int64(32), complete & np.int64(0xFFFFFFFF)
        if x.size == 0:
            break
    out_z.append(np.full(x.size, floor, dtype=np.int64))
    out_x.append(x)
    out_y.append(y)
    return np.concatenate(out_z), np.concatenate(out_x), np.concatenate(out_y)


def meters_to_deg(lat, meters):
    """Conservative meter→degree conversion at a latitude (for buffers)."""
    lat = np.asarray(lat, dtype=np.float64)
    dlat = meters / 111_320.0
    dlon = meters / (111_320.0 * np.maximum(0.05, np.cos(np.radians(lat))))
    return dlon, dlat
