"""Tile materialization: slippy projection, zoom roll-up, Hilbert-ordered
tile aggregation — the streaming sort-shuffle stage of the north rule.

Reference semantics: ``SlippyTile::project`` maps a point to a tile plus an
in-tile 0..4096 offset (``routers_geo/src/project.rs:38-74``,
``MVT_EXTENT=4096``); tiles are keyed by Hilbert index
(``routers_tiles/src/primitives/fragment.rs:69-71``); zoom-leveled
compaction walks tiles up the pyramid (``fragment.rs:35-47``); geometry is
zig-zag encoded (``primitives/layer.rs:78-90``).

Ray shape: per-batch partial aggregation (one row per touched tile per
batch) → small ``groupby(z, x, y)`` merge → ``sort(z, hilbert)`` — the
pre-aggregate-then-shuffle pattern, so the all-to-all moves tile partials,
not points.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa

from .cells import hilbert_xy2d, lonlat_to_tile
from .functions import fnv1a_array, splitmix64

MVT_EXTENT = 4096  # routers_geo/src/lib.rs MVT_EXTENT


def project_to_tile(lon, lat, z: int):
    """(tile_x, tile_y, px, py) with px/py the in-tile 0..4096 offsets."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.clip(np.asarray(lat, dtype=np.float64), -85.05112878, 85.05112878)
    n = np.float64(1 << z)
    fx = (lon + 180.0) / 360.0 * n
    lat_r = np.radians(lat)
    fy = (1.0 - np.log(np.tan(lat_r) + 1.0 / np.cos(lat_r)) / np.pi) / 2.0 * n
    x = np.clip(np.floor(fx), 0, n - 1)
    y = np.clip(np.floor(fy), 0, n - 1)
    px = np.clip(((fx - x) * MVT_EXTENT).astype(np.int32), 0, MVT_EXTENT - 1)
    py = np.clip(((fy - y) * MVT_EXTENT).astype(np.int32), 0, MVT_EXTENT - 1)
    return x.astype(np.uint32), y.astype(np.uint32), px, py


def _point_digest(doc_ids, seqs) -> np.ndarray:
    """Order-independent per-point digest: splitmix64(fnv1a(doc_id) ^ seq).

    Summed (mod 2^64) per tile it forms the tile's content digest
    (``doc_ids_hash``) — byte-stable across run order and partitioning.
    """
    h = fnv1a_array(doc_ids)
    with np.errstate(over="ignore"):
        return splitmix64(h ^ np.asarray(seqs, dtype=np.uint64))


def tile_partials(batch: pa.Table, zooms: list[int], lon_col="snap_lon", lat_col="snap_lat") -> pa.Table:
    """Per-batch partial tile aggregation: one output row per (z, x, y)
    touched by the batch, carrying count + digest-sum partials."""
    lon = np.asarray(batch[lon_col], dtype=np.float64)
    lat = np.asarray(batch[lat_col], dtype=np.float64)
    doc_ids = batch["doc_id"].to_pylist()
    seqs = np.asarray(batch["seq"], dtype=np.int64)
    digest = _point_digest(doc_ids, seqs)

    zs, xs, ys, ns, ds_ = [], [], [], [], []
    for z in zooms:
        x, y = lonlat_to_tile(lon, lat, z)
        key = (x.astype(np.uint64) << np.uint64(32)) | y.astype(np.uint64)
        order = np.argsort(key, kind="stable")
        key_s = key[order]
        bounds = np.flatnonzero(np.concatenate(([True], key_s[1:] != key_s[:-1])))
        counts = np.diff(np.append(bounds, key_s.size))
        with np.errstate(over="ignore"):
            dsum = np.add.reduceat(digest[order], bounds) if key_s.size else np.empty(0, np.uint64)
        zs.append(np.full(bounds.size, z, dtype=np.uint8))
        xs.append((key_s[bounds] >> np.uint64(32)).astype(np.uint32))
        ys.append((key_s[bounds] & np.uint64(0xFFFFFFFF)).astype(np.uint32))
        ns.append(counts.astype(np.int64))
        ds_.append(dsum)

    return pa.table(
        {
            "z": pa.array(np.concatenate(zs), pa.uint8()),
            "x": pa.array(np.concatenate(xs), pa.uint32()),
            "y": pa.array(np.concatenate(ys), pa.uint32()),
            "n_points": pa.array(np.concatenate(ns), pa.int64()),
            "doc_ids_hash": pa.array(np.concatenate(ds_), pa.uint64()),
        }
    )


def merge_tile_partials(group: pa.Table) -> pa.Table:
    """Combine partial rows of one tile (groupby(z,x,y).map_groups body)."""
    n = int(np.asarray(group["n_points"], dtype=np.int64).sum())
    with np.errstate(over="ignore"):
        d = np.asarray(group["doc_ids_hash"]).astype(np.uint64).sum(dtype=np.uint64)
    return pa.table(
        {
            "z": group["z"][:1],
            "x": group["x"][:1],
            "y": group["y"][:1],
            "n_points": pa.array([n], pa.int64()),
            "doc_ids_hash": pa.array([d], pa.uint64()),
        }
    )


def add_hilbert(batch: pa.Table) -> pa.Table:
    """Append the Hilbert sort key per tile row (fragment.rs ``to_hilbert``)."""
    z = np.asarray(batch["z"], dtype=np.int64)
    x = np.asarray(batch["x"], dtype=np.uint64)
    y = np.asarray(batch["y"], dtype=np.uint64)
    h = np.empty(z.size, dtype=np.uint64)
    for zz in np.unique(z):
        m = z == zz
        h[m] = hilbert_xy2d(x[m], y[m], int(zz))
    return batch.append_column("hilbert", pa.array(h, pa.uint64()))


def encode_mvt_features(batch: pa.Table, z: int, lon_col="snap_lon", lat_col="snap_lat") -> pa.Table:
    """Per-point MVT feature rows: tile key + zig-zag-encoded in-tile
    geometry (``MVTFeature`` with extent 4096 and the ``(v<<1)^(v>>31)``
    coordinate coding, ``routers_tiles/src/primitives/layer.rs:10-13,78-90``)."""
    from .functions import zigzag_encode

    lon = np.asarray(batch[lon_col], dtype=np.float64)
    lat = np.asarray(batch[lat_col], dtype=np.float64)
    x, y, px, py = project_to_tile(lon, lat, z)
    return pa.table(
        {
            "z": pa.array(np.full(lon.size, z, dtype=np.uint8), pa.uint8()),
            "x": pa.array(x, pa.uint32()),
            "y": pa.array(y, pa.uint32()),
            "zz_x": pa.array(zigzag_encode(px), pa.uint32()),
            "zz_y": pa.array(zigzag_encode(py), pa.uint32()),
        }
    )


def materialize_tiles(matched_ds, zooms: list[int], merge: str = "driver"):
    """Matched rows → tile table sorted by (z, hilbert).

    ``matched_ds`` must carry doc_id/seq/snap_lon/snap_lat columns (ok rows
    only). The per-batch partial aggregation runs distributed either way —
    the all-to-all only ever moves one row per (batch, tile), never points.

    ``merge="driver"`` (default): the partials — bounded by the tile count,
    not the point count — stream to the driver and merge in one NumPy pass
    (the "small result" case; right up to millions of tiles).
    ``merge="shuffle"``: ``groupby(z,x,y).map_groups`` + distributed sort —
    the path for tile spaces too large to merge on one machine.
    """
    partials = matched_ds.map_batches(
        lambda b: tile_partials(b, zooms), batch_format="pyarrow"
    )
    if merge == "shuffle":
        merged = partials.groupby(["z", "x", "y"]).map_groups(
            merge_tile_partials, batch_format="pyarrow"
        )
        return merged.map_batches(add_hilbert, batch_format="pyarrow").sort(["z", "hilbert"])

    tabs = [
        b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        for b in partials.iter_batches(batch_format="pyarrow")
    ]
    if not tabs:
        return pa.table(
            {
                "z": pa.array([], pa.uint8()),
                "x": pa.array([], pa.uint32()),
                "y": pa.array([], pa.uint32()),
                "n_points": pa.array([], pa.int64()),
                "doc_ids_hash": pa.array([], pa.uint64()),
                "hilbert": pa.array([], pa.uint64()),
            }
        )
    t = pa.concat_tables(tabs)
    z = np.asarray(t["z"], dtype=np.int64)
    x = np.asarray(t["x"]).astype(np.uint64)
    y = np.asarray(t["y"]).astype(np.uint64)
    key = (z.astype(np.uint64) << np.uint64(58)) | (x << np.uint64(29)) | y
    order = np.argsort(key, kind="stable")
    key_s = key[order]
    bounds = np.flatnonzero(np.concatenate(([True], key_s[1:] != key_s[:-1])))
    n = np.asarray(t["n_points"], dtype=np.int64)[order]
    d = np.asarray(t["doc_ids_hash"]).astype(np.uint64)[order]
    with np.errstate(over="ignore"):
        n_m = np.add.reduceat(n, bounds)
        d_m = np.add.reduceat(d, bounds)
    sel = order[bounds]
    out = pa.table(
        {
            "z": pa.array(np.asarray(t["z"], dtype=np.uint8)[sel], pa.uint8()),
            "x": pa.array(np.asarray(t["x"]).astype(np.uint32)[sel], pa.uint32()),
            "y": pa.array(np.asarray(t["y"]).astype(np.uint32)[sel], pa.uint32()),
            "n_points": pa.array(n_m, pa.int64()),
            "doc_ids_hash": pa.array(d_m, pa.uint64()),
        }
    )
    out = add_hilbert(out)
    zz = np.asarray(out["z"], dtype=np.int64)
    hh = np.asarray(out["hilbert"]).astype(np.uint64)
    final_order = np.lexsort((hh, zz))
    return out.take(pa.array(final_order))


# ---------------------------------------------------------------------------
# date-keyed tiles (``{hilbert:012}/{prefix}/{yymmdd}`` row keys scanned by
# date-range + weekday-set — example/tile.rs:111-146, query/range.rs)

US_PER_DAY = 86_400_000_000


@dataclass(frozen=True)
class DatedRange:
    """``DatedRange.within`` port (``query/range.rs:93-104``): timestamp ∈
    [start-day 00:00, end-day 00:00] (per the reference's midnight-boundary
    Range<UtcDate> compare) ∧ weekday ∈ set (Mon=0 … Sun=6,
    ``range.rs:64-88``)."""

    start_day: int  # days since epoch (UTC)
    end_day: int
    weekdays: frozenset
    exclusive: bool = False

    @classmethod
    def parse(cls, start: str, end: str, weekdays: str, exclusive: bool = False) -> "DatedRange":
        """REQUEST_FORMAT dates ('%Y-%m-%d', date.rs:6) + '0-2-4'-style
        weekday string (range.rs:70)."""
        import datetime as dt

        epoch = dt.date(1970, 1, 1)
        return cls(
            (dt.date.fromisoformat(start) - epoch).days,
            (dt.date.fromisoformat(end) - epoch).days,
            frozenset(int(x) for x in weekdays.split("-")),
            exclusive,
        )

    def within_us(self, ts_us) -> np.ndarray:
        ts = np.asarray(ts_us, dtype=np.int64)
        start = self.start_day * US_PER_DAY
        end = self.end_day * US_PER_DAY
        if self.exclusive:
            m = (ts > start) & (ts < end)
        else:
            m = (ts >= start) & (ts <= end)
        wd = ((ts // US_PER_DAY) + 3) % 7  # 1970-01-01 = Thursday; Mon=0
        return m & np.isin(wd, np.asarray(sorted(self.weekdays), dtype=np.int64))


def yymmdd_of_days(days: np.ndarray) -> np.ndarray:
    """days-since-epoch → yymmdd int32 (STORAGE_FORMAT '%y%m%d',
    date.rs:5). Converts per DISTINCT day — tile tables span few days."""
    import datetime as dt

    days = np.asarray(days, dtype=np.int64)
    uniq, inv = np.unique(days, return_inverse=True)
    conv = np.asarray(
        [
            int((dt.date(1970, 1, 1) + dt.timedelta(days=int(d))).strftime("%y%m%d"))
            for d in uniq.tolist()
        ],
        dtype=np.int32,
    )
    return conv[inv]


def dated_tile_partials(
    batch: pa.Table, zooms: list[int], lon_col="lon", lat_col="lat", ts_col="ts_us"
) -> pa.Table:
    """Per-batch partials keyed (date, z, x, y) — the dated row-key
    dimension added to :func:`tile_partials`' count aggregation."""
    lon = np.asarray(batch[lon_col], dtype=np.float64)
    lat = np.asarray(batch[lat_col], dtype=np.float64)
    if lon.size == 0:
        return pa.table(
            {
                "date": pa.array([], pa.int32()),
                "z": pa.array([], pa.uint8()),
                "x": pa.array([], pa.uint32()),
                "y": pa.array([], pa.uint32()),
                "n_points": pa.array([], pa.int64()),
            }
        )
    day = np.asarray(batch[ts_col], dtype=np.int64) // US_PER_DAY
    date = yymmdd_of_days(day).astype(np.int64)

    ds_, zs, xs, ys, ns = [], [], [], [], []
    for z in zooms:
        # x/y get 20 bits each in the packed group key below; deeper zooms
        # would silently alias tiles (date occupies bits 40..63: 24 bits,
        # enough for any yymmdd < 2^20)
        if z > 20:  # not an assert: -O must not strip the aliasing guard
            raise ValueError(f"dated_tile_partials supports zoom <= 20, got {z}")
        x, y = lonlat_to_tile(lon, lat, z)
        key = (
            (date.astype(np.uint64) << np.uint64(40))
            | (x.astype(np.uint64) << np.uint64(20))
            | y.astype(np.uint64)
        )
        order = np.argsort(key, kind="stable")
        key_s = key[order]
        bounds = np.flatnonzero(np.concatenate(([True], key_s[1:] != key_s[:-1])))
        counts = np.diff(np.append(bounds, key_s.size))
        ds_.append((key_s[bounds] >> np.uint64(40)).astype(np.int32))
        xs.append(((key_s[bounds] >> np.uint64(20)) & np.uint64(0xFFFFF)).astype(np.uint32))
        ys.append((key_s[bounds] & np.uint64(0xFFFFF)).astype(np.uint32))
        zs.append(np.full(bounds.size, z, dtype=np.uint8))
        ns.append(counts.astype(np.int64))
    return pa.table(
        {
            "date": pa.array(np.concatenate(ds_), pa.int32()),
            "z": pa.array(np.concatenate(zs), pa.uint8()),
            "x": pa.array(np.concatenate(xs), pa.uint32()),
            "y": pa.array(np.concatenate(ys), pa.uint32()),
            "n_points": pa.array(np.concatenate(ns), pa.int64()),
        }
    )


def merge_dated_tile_partials(group: pa.Table) -> pa.Table:
    """Final merge of one (date, z, x, y) group — sums the partial counts."""
    n = int(np.asarray(group["n_points"], dtype=np.int64).sum())
    return pa.table(
        {
            "date": group["date"][:1],
            "z": group["z"][:1],
            "x": group["x"][:1],
            "y": group["y"][:1],
            "n_points": pa.array([n], pa.int64()),
        }
    )


def materialize_dated_tiles(
    pts_ds, zooms: list[int], ranges: list[DatedRange],
    lon_col="lon", lat_col="lat", ts_col="ts_us", merge: str = "driver",
):
    """Dated tile rollup: filter to the union of the DatedRanges (the
    reference's flat_map over row ranges), per-batch partials keyed
    (date, z, x, y), Hilbert key, ordered by the row key
    (hilbert, date — example/tile.rs:115-117).

    ``merge="driver"`` (default): partials — bounded by dates × tiles —
    merge in one NumPy pass on the driver and return a ``pa.Table``.
    ``merge="shuffle"``: ``groupby(date,z,x,y).map_groups`` + distributed
    sort, the path for deep zooms × long date ranges that exceed one
    machine; returns a Dataset."""

    def _part(b: pa.Table) -> pa.Table:
        ts = np.asarray(b[ts_col], dtype=np.int64)
        m = np.zeros(ts.size, dtype=bool)
        for r in ranges:
            m |= r.within_us(ts)
        return dated_tile_partials(
            b.filter(pa.array(m)), zooms, lon_col, lat_col, ts_col
        )

    partials = pts_ds.map_batches(_part, batch_format="pyarrow")
    if merge == "shuffle":
        merged = partials.groupby(["date", "z", "x", "y"]).map_groups(
            merge_dated_tile_partials, batch_format="pyarrow"
        )
        return merged.map_batches(add_hilbert, batch_format="pyarrow").sort(
            ["z", "hilbert", "date"]
        )
    tabs = [
        b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        for b in partials.iter_batches(batch_format="pyarrow")
    ]
    empty = pa.table(
        {
            "date": pa.array([], pa.int32()),
            "z": pa.array([], pa.uint8()),
            "x": pa.array([], pa.uint32()),
            "y": pa.array([], pa.uint32()),
            "n_points": pa.array([], pa.int64()),
            "hilbert": pa.array([], pa.uint64()),
        }
    )
    if not tabs:
        return empty
    t = pa.concat_tables(tabs)
    if len(t) == 0:
        return empty
    date = np.asarray(t["date"], dtype=np.int64)
    z = np.asarray(t["z"], dtype=np.int64)
    x = np.asarray(t["x"]).astype(np.uint64)
    y = np.asarray(t["y"]).astype(np.uint64)
    # lexsort, not a hand-packed u64: yymmdd needs 20 bits and a packed key
    # would silently truncate dates >= 2027-01-01 (and cap zoom at 20)
    order = np.lexsort((y, x, z, date))
    ds_ = date[order]
    zs_ = z[order]
    xs_ = x[order]
    ys_ = y[order]
    same = (
        (ds_[1:] == ds_[:-1]) & (zs_[1:] == zs_[:-1])
        & (xs_[1:] == xs_[:-1]) & (ys_[1:] == ys_[:-1])
    )
    bounds = np.flatnonzero(np.concatenate(([True], ~same)))
    n = np.asarray(t["n_points"], dtype=np.int64)[order]
    n_m = np.add.reduceat(n, bounds)
    sel = order[bounds]
    out = pa.table(
        {
            "date": pa.array(date[sel].astype(np.int32), pa.int32()),
            "z": pa.array(z[sel].astype(np.uint8), pa.uint8()),
            "x": pa.array(x[sel].astype(np.uint32), pa.uint32()),
            "y": pa.array(y[sel].astype(np.uint32), pa.uint32()),
            "n_points": pa.array(n_m, pa.int64()),
        }
    )
    out = add_hilbert(out)
    zz = np.asarray(out["z"], dtype=np.int64)
    hh = np.asarray(out["hilbert"]).astype(np.uint64)
    dd = np.asarray(out["date"], dtype=np.int64)
    final = np.lexsort((dd, hh, zz))
    return out.take(pa.array(final))


def fragment_children(z: int, x: int, y: int, storage_zoom: int) -> tuple[np.ndarray, np.ndarray]:
    """The (x, y) tiles covering fragment (z, x, y) at ``storage_zoom`` —
    ``Fragment::detail`` (``fragment.rs:35-47``): the 4^(dz) descendants
    (or the single ancestor when storage_zoom < z)."""
    if storage_zoom >= z:
        dz = storage_zoom - z
        n = 1 << dz
        xs = (x << dz) + np.arange(n, dtype=np.int64)
        ys = (y << dz) + np.arange(n, dtype=np.int64)
        gx, gy = np.meshgrid(xs, ys, indexing="ij")
        return gx.ravel(), gy.ravel()
    dz = z - storage_zoom
    return np.asarray([x >> dz], dtype=np.int64), np.asarray([y >> dz], dtype=np.int64)


def scan_dated_tiles(
    tile_tbl: pa.Table, z: int, x: int, y: int, ranges: list[DatedRange], storage_zoom: int
) -> pa.Table:
    """Row-range scan of a dated tile table for one requested fragment —
    the ``TileQuery::batch`` shape (``example/tile.rs:111-146``): the
    fragment's ``detail(storage_zoom)`` children × each DatedRange become
    (hilbert, date) key ranges; here they resolve as a partition-key
    filter over the (z, x, y, date) columns (the engine's stand-in for the
    Bigtable row-range reader)."""
    cx, cy = fragment_children(z, x, y, storage_zoom)
    want = set(zip(cx.tolist(), cy.tolist()))
    tx = np.asarray(tile_tbl["x"], dtype=np.int64)
    ty = np.asarray(tile_tbl["y"], dtype=np.int64)
    tz = np.asarray(tile_tbl["z"], dtype=np.int64)
    date = np.asarray(tile_tbl["date"], dtype=np.int64)
    # date (yymmdd) back to days-since-epoch for the range check
    import datetime as dt

    uniq, inv = np.unique(date, return_inverse=True)
    # same pivot as strftime('%y') used by yymmdd_of_days: 70..99 are
    # 1970-1999, 00..69 are 2000-2069 — not unconditionally 2000+yy
    days_u = np.asarray(
        [
            (
                dt.date(
                    (1900 if d // 10000 >= 70 else 2000) + d // 10000,
                    (d // 100) % 100,
                    d % 100,
                )
                - dt.date(1970, 1, 1)
            ).days
            for d in uniq.tolist()
        ],
        dtype=np.int64,
    )
    days = days_u[inv]
    in_range = np.zeros(len(tile_tbl), dtype=bool)
    for r in ranges:
        # date-key granularity: the day is in range if its midnight is
        # (weekday from the day number, Mon=0)
        m = (days >= r.start_day) & (days <= r.end_day)
        wd = (days + 3) % 7
        in_range |= m & np.isin(wd, np.asarray(sorted(r.weekdays), dtype=np.int64))
    keep = (tz == storage_zoom) & in_range
    if want:
        pair_ok = np.asarray([(a, b) in want for a, b in zip(tx.tolist(), ty.tolist())])
        keep &= pair_ok
    return tile_tbl.filter(pa.array(keep))
