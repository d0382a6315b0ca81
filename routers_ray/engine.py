"""The user-facing engine facade — the reference's service surface
(`Match`, `Snap`, `Scan`, `Timezone` ConnectRPC services,
``schema/proto/routers/api/**``) re-expressed as Dataset→Dataset calls.

A user of the reference switches like so::

    eng = Engine(store_path)               # ≙ matcher service boot w/ shard
    matched = eng.match(docs_ds)           # ≙ MatchService::Match
    snapped = eng.snap(points_ds)          # ≙ MatchService::Snap
    cands   = eng.scan(points_ds)          # ≙ ScanService::Edge
    tz      = eng.timezone(points_ds)      # ≙ TimezoneService
    tiles   = eng.tiles(matched_ok_ds)     # tile materialization
    clusters= eng.cluster(points_ds)       # DBSCAN clustering

Every call is lazy (returns a Dataset or a small Arrow table) and safe to
compose with further Dataset ops; stateful stages run as actor pools sized
by ``concurrency``.
"""

from __future__ import annotations

from .matcher import MatchOptions


class Engine:
    def __init__(self, store_path: str, options: MatchOptions | None = None, concurrency=4):
        self.store_path = store_path
        self.options = options or MatchOptions()
        self.concurrency = concurrency

    def match(self, docs_ds, **kwargs):
        """Viterbi map-match of interleaved docs (status column carries the
        MatchError taxonomy)."""
        from .pipelines.match_pipeline import match_documents

        kwargs.setdefault("concurrency", self.concurrency)
        return match_documents(docs_ds, self.store_path, self.options, **kwargs)

    def match_ok(self, docs_ds, **kwargs):
        from .pipelines.match_pipeline import matched_ok

        return matched_ok(self.match(docs_ds, **kwargs))

    def snap(self, points_ds, radius_m: float | None = None):
        from .pipelines.snap_pipeline import snap_points

        return snap_points(
            points_ds,
            self.store_path,
            radius_m or self.options.search_distance_m,
            concurrency=self.concurrency,
        )

    def scan(self, points_ds, radius_m: float | None = None):
        from .pipelines.snap_pipeline import scan_edges

        return scan_edges(
            points_ds,
            self.store_path,
            radius_m or self.options.search_distance_m,
            concurrency=self.concurrency,
        )

    def route(self, pairs_ds, buffer_m: float = 5_000.0):
        """OptimiseService::Route: per-row (start_lon, start_lat, end_lon,
        end_lat) → cost + shape."""
        from .pipelines.route_pipeline import route_pairs

        return route_pairs(pairs_ds, self.store_path, concurrency=self.concurrency, buffer_m=buffer_m)

    def timezone(self, points_ds):
        from .timezone import timezone_of

        return timezone_of(points_ds, concurrency=self.concurrency)

    def tiles(self, matched_ok_ds, zooms=(10, 13, 15), merge: str = "driver"):
        from .tiles import materialize_tiles

        return materialize_tiles(matched_ok_ds, list(zooms), merge=merge)

    def cluster(self, points_ds, cell_zoom: int = 10, eps_m: float = 200.0):
        from .cluster import cluster_points

        return cluster_points(points_ds, cell_zoom=cell_zoom, eps_m=eps_m)

    def run_checkpointed(self, docs_ds, out_dir: str, **kwargs):
        from .checkpoint import run_checkpointed

        return run_checkpointed(docs_ds, self.store_path, out_dir, self.options, **kwargs)

    def tiles_dated(self, pts_ds, zooms, ranges, lon_col="lon", lat_col="lat", ts_col="ts_us"):
        """Dated tile rollup filtered by :class:`~routers_ray.tiles.DatedRange`s."""
        from .tiles import materialize_dated_tiles

        return materialize_dated_tiles(pts_ds, list(zooms), ranges, lon_col, lat_col, ts_col)

    def rasterize(self, points_ds, z: int, grid: int = 64, lon_col="lon", lat_col="lat"):
        """Vector→raster sparse pixel rollup (see :mod:`routers_ray.raster`)."""
        from .raster import rasterize_points

        return rasterize_points(points_ds, z, grid, lon_col, lat_col)

    def raster_tiles(self, points_ds, z: int, grid: int = 64, lon_col="lon", lat_col="lat"):
        """Dense uint32 grid-blob raster tiles (one bounded row per tile)."""
        from .raster import assemble_raster_tiles

        return assemble_raster_tiles(points_ds, z, grid, lon_col, lat_col)

    def vectorize(self, points_ds, z: int, grid: int = 64, threshold: int = 1,
                  lon_col="lon", lat_col="lat"):
        """Raster→vector run-length segments in one tile-keyed exchange."""
        from .raster import vectorize_runs

        return vectorize_runs(points_ds, z, grid, threshold, lon_col, lat_col)

    def count_distinct(self, ds, value_fn, p: int = 10):
        """Mergeable HyperLogLog sketch Dataset (reg, rho)."""
        from .sketch import hll_sketch

        return hll_sketch(ds, value_fn, p)

    def frequencies(self, ds, value_fn, depth: int = 4, width: int = 1024):
        """Mergeable Count-Min counter Dataset (j, col, n)."""
        from .sketch import cms_sketch

        return cms_sketch(ds, value_fn, depth, width)

    def mvt(self, matched_ok_ds, zoom: int, layer_name: str = "matched"):
        """Servable MVT blobs per touched tile (one binary row per tile)."""
        from .mvt import mvt_tiles

        return mvt_tiles(matched_ok_ds, zoom, layer_name)

    def hausdorff(self, points_ds, key_col: str, cell_deg: float = 60.0, **kw):
        """Track-pair symmetric Hausdorff join (anchor-cell pairing)."""
        from .trackops import hausdorff_pairs

        return hausdorff_pairs(points_ds, key_col=key_col, cell_deg=cell_deg, **kw)

    def crossings(self, points_ds, key_col: str, **kw):
        """Per-track proper self-intersection counts."""
        from .trackops import track_crossings

        return track_crossings(points_ds, key_col=key_col, **kw)

    def dwell(self, points_ds, polygons, key_col: str, **kw):
        """Per (track, fence) dwell time over broadcast polygons."""
        from .trackops import geofence_dwell

        return geofence_dwell(points_ds, polygons, key_col=key_col, **kw)

    def extent(self, points_ds, z: int, **kw):
        """Per-cell bounding-box aggregate (ST_Extent analogue)."""
        from .trackops import extent_cells

        return extent_cells(points_ds, z=z, **kw)

    def transitions(self, points_ds, z: int, key_col: str, **kw):
        """Consecutive-hop cell flow matrix per track."""
        from .trackops import cell_transitions

        return cell_transitions(points_ds, z=z, key_col=key_col, **kw)

    def heavy_hitters(self, ds, value_fn, theta: float, k: int | None = None):
        """Exact frequent items via MG prefilter + broadcast recount."""
        from .sketch import heavy_hitters

        return heavy_hitters(ds, value_fn, theta, k)

    def radius_join(self, points_ds, r_deg: float, id_col: str, **kw):
        """Distributed radius self-join (co-location pairs); see
        :func:`routers_ray.spatialjoin.radius_self_join` for the metric
        variant and the replication-bound contract."""
        from .spatialjoin import radius_self_join

        return radius_self_join(points_ds, r_deg, id_col, **kw)

    def anchor_pairs(self, points_ds, key_col: str, r_deg: float, **kw):
        """Track pairs whose first points are within ``r_deg`` — the
        radius-join prefilter companion to :meth:`hausdorff` (candidate
        bounding by geometry instead of grid cell; see
        :func:`routers_ray.trackops.anchor_radius_pairs` for the
        semantics caveat)."""
        from .trackops import anchor_radius_pairs

        return anchor_radius_pairs(points_ds, key_col=key_col, r_deg=r_deg, **kw)

    def track_clusters(self, points_ds, key_col: str, max_hd_m: float, **kw):
        """Single-link trajectory clustering via Hausdorff-threshold
        edges and per-cell connected components."""
        from .trackops import track_clusters

        return track_clusters(points_ds, key_col=key_col, max_hd_m=max_hd_m, **kw)
