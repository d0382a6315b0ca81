"""Point → timezone lookup via a prebuilt cell table.

Port of the reference's S2-cell timezone index shape
(``routers_tz/build/impl/s2cell.rs:13-15,44-124``): a build step covers
each timezone's polygon with cells at a chosen level (≤1000 cells per tz,
center-containment resolving conflicts), the runtime binary-searches the
sorted cell table. Here the "polygons" are the Etc/GMT 15°-longitude bands
(derivable with no external data), the cells are quadkey tiles, and the
stage is an actor holding the sorted table in memory.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .cells import cell_id, lonlat_to_cell, tile_bounds

BUILD_ZOOM = 7  # 128×128 cells ≈ the l1-l13 S2 coverage compromise


def build_tz_cell_table(zoom: int = BUILD_ZOOM) -> tuple[np.ndarray, np.ndarray]:
    """(sorted_cell_ids, tz_band) — every cell at ``zoom`` mapped to the
    Etc/GMT band containing its center (center-containment conflict rule,
    ``s2cell.rs:101-124``). Band b covers [b·15−187.5, b·15−172.5)°."""
    n = 1 << zoom
    xs, ys = np.meshgrid(np.arange(n, dtype=np.uint64), np.arange(n, dtype=np.uint64), indexing="ij")
    xs, ys = xs.ravel(), ys.ravel()
    w, s, e, nn = tile_bounds(xs, ys, zoom)
    center_lon = (np.asarray(w) + np.asarray(e)) / 2.0
    band = np.floor((center_lon + 187.5) / 15.0).astype(np.int64) % 24
    cells_ = cell_id(xs, ys, zoom)
    order = np.argsort(cells_)
    return cells_[order], band[order]


class TimezoneLookup:
    """Actor-pool stage: point → tz band via binary search on the prebuilt
    cell table (built once per actor in ``__init__`` — the include_bytes!
    asset-load analogue, ``routers_tz/src/lib.rs:5-76``)."""

    def __init__(self, zoom: int = BUILD_ZOOM):
        self.zoom = zoom
        self.cells, self.bands = build_tz_cell_table(zoom)

    def __call__(self, batch: pa.Table) -> pa.Table:
        lon = np.asarray(batch["lon"], dtype=np.float64)
        lat = np.asarray(batch["lat"], dtype=np.float64)
        cc = lonlat_to_cell(lon, lat, self.zoom)
        pos = np.searchsorted(self.cells, cc)
        pos = np.clip(pos, 0, self.cells.size - 1)
        band = np.where(self.cells[pos] == cc, self.bands[pos], -1)
        # Etc/GMT sign convention is inverted: band 12 = GMT+0 … name by offset
        offset = band - 12
        names = np.asarray([f"Etc/GMT{int(-o):+d}" if o != 0 else "Etc/GMT" for o in offset])
        out = batch.append_column("tz_band", pa.array(band, pa.int64()))
        return out.append_column("tz_name", pa.array(names, pa.string()))


def timezone_of(ds, zoom: int = BUILD_ZOOM, concurrency=2):
    return ds.map_batches(
        TimezoneLookup,
        fn_constructor_kwargs={"zoom": zoom},
        batch_format="pyarrow",
        batch_size=8192,
        concurrency=concurrency,
        num_cpus=1,
    )
