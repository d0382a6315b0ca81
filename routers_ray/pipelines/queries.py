"""The query registry: every operator surfaced as a ``queries()`` entry with
(where SQL-expressible) a DuckDB oracle — the driver's correctness gate.

Conventions that make the value-hash comparison exact:

- all derived coordinates come from *integer* arithmetic on key columns
  (``lon = ((id*7919) % 360000)/1000 - 180``) so both engines see identical
  doubles;
- money/quantity aggregates are summed as exact integers
  (``floor(x*100 + 0.5)``) — float-sum ordering differences can never flip
  a digit;
- float outputs are rounded via ``floor(x*1e6+0.5)/1e6`` (identical
  half-up semantics in NumPy and DuckDB — plain ROUND differs: banker's
  vs half-away);
- haversine inside query kernels uses the byte-identical formula the SQL
  text uses (see :func:`hav_m`) rather than :mod:`routers_ray.geo`'s
  (they agree to ~1e-9 m; the oracle demands bit-level agreement).

Column names match the SQL aliases exactly (driver sorts by name).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as papq

R_EARTH = 6371008.8
Z_CELL = 12
Z_TILE = 15
Z_EXTENT = 4  # extent-aggregate zoom: coarse boxes with real multi-point extents
Z_CLUSTER = 5
Z_RASTER = 2  # coarse zoom so the synthetic points actually share pixels
RASTER_GRID = 32
RUNS_GRID = 16
RUNS_THRESHOLD = 2


# ---------------------------------------------------------------------------
# shared derivations


def _pq(sf_dir: str, table: str) -> str:
    return f"{sf_dir}/{table}.parquet"


def event_lonlat(event_id: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic event coordinates from integer arithmetic (exact in
    both engines)."""
    eid = np.asarray(event_id, dtype=np.int64)
    lon = ((eid * 7919) % 360000) / 1000.0 - 180.0
    lat = ((eid * 104729) % 170000) / 1000.0 - 85.0
    return lon, lat


SQL_EVENT_PTS = """
    SELECT event_id, user_id, ts, event_type, value,
           ((event_id * 7919) % 360000)/1000.0 - 180.0 AS lon,
           ((event_id * 104729) % 170000)/1000.0 - 85.0 AS lat
    FROM events
"""


def hav_m(lon1, lat1, lon2, lat2):
    """Haversine with the exact operation order of the SQL fragment below —
    ``radians`` applied to coordinate *differences* (unlike geo.haversine_m,
    which converts first; the two agree to ~1e-9 m but the oracle hash needs
    bit-equality)."""
    lon1, lat1, lon2, lat2 = (np.asarray(v, dtype=np.float64) for v in (lon1, lat1, lon2, lat2))
    a = (
        np.sin(np.radians(lat2 - lat1) / 2.0) ** 2
        + np.cos(np.radians(lat1)) * np.cos(np.radians(lat2)) * np.sin(np.radians(lon2 - lon1) / 2.0) ** 2
    )
    return 2.0 * R_EARTH * np.arcsin(np.minimum(1.0, np.sqrt(a)))


def SQL_HAV(lon1, lat1, lon2, lat2) -> str:
    return (
        f"2.0*{R_EARTH}*asin(least(1.0, sqrt("
        f"pow(sin(radians({lat2}-{lat1})/2.0),2) + "
        f"cos(radians({lat1}))*cos(radians({lat2}))*pow(sin(radians({lon2}-{lon1})/2.0),2))))"
    )


def r6(x: np.ndarray) -> np.ndarray:
    return np.floor(np.asarray(x, dtype=np.float64) * 1e6 + 0.5) / 1e6


def r3(x: np.ndarray) -> np.ndarray:
    return np.floor(np.asarray(x, dtype=np.float64) * 1e3 + 0.5) / 1e3


def _slippy_xy(lon, lat, z: int):
    """floor-based slippy tiling on raw doubles — textually identical to the
    SQL expression (no latitude clamp: derived lats stay in-domain)."""
    n = float(1 << z)
    x = np.floor((lon + 180.0) / 360.0 * n).astype(np.int64)
    lat_r = np.radians(lat)
    y = np.floor((1.0 - np.log(np.tan(lat_r) + 1.0 / np.cos(lat_r)) / np.pi) / 2.0 * n).astype(np.int64)
    return x, y


def SQL_SLIPPY(z: int) -> tuple[str, str]:
    n = float(1 << z)
    x = f"CAST(floor((lon + 180.0)/360.0*{n}) AS BIGINT)"
    y = f"CAST(floor((1.0 - ln(tan(radians(lat)) + 1.0/cos(radians(lat)))/pi())/2.0*{n}) AS BIGINT)"
    return x, y


# ---------------------------------------------------------------------------
# geospatial queries


def q_cell_assign(sf_dir: str):
    """Point→cell assignment + per-cell counts at zoom 12 (the cell-join
    keying primitive, reference quadtree strategy ``strategy/quadtree.rs``)."""
    import ray.data as rd

    ds = rd.read_parquet(_pq(sf_dir, "events"), columns=["event_id"])

    def _cells(b: pa.Table) -> pa.Table:
        # partial combiner: the shuffle moves one row per (batch, cell),
        # not one per event (r02 bench pinned the unaggregated groupby at
        # a stable 4.4 s for 1.5M events / 32 CPUs; this is the fix)
        lon, lat = event_lonlat(np.asarray(b["event_id"]))
        x, y = _slippy_xy(lon, lat, Z_CELL)
        key = (x.astype(np.int64) << np.int64(32)) | y.astype(np.int64)
        uniq, counts = np.unique(key, return_counts=True)
        return pa.table(
            {
                "x": pa.array(uniq >> np.int64(32), pa.int64()),
                "y": pa.array(uniq & np.int64(0xFFFFFFFF), pa.int64()),
                "n": pa.array(counts.astype(np.int64), pa.int64()),
            }
        )

    out = ds.map_batches(_cells, batch_format="pyarrow").groupby(["x", "y"]).sum("n")
    return out.map_batches(
        lambda t: t.rename_columns(["x", "y", "n"]), batch_format="pyarrow"
    )


def sql_cell_assign() -> str:
    x, y = SQL_SLIPPY(Z_CELL)
    return f"WITH pts AS ({SQL_EVENT_PTS}) SELECT {x} AS x, {y} AS y, COUNT(*) AS n FROM pts GROUP BY 1, 2"


def q_tile_rollup(sf_dir: str):
    """Zoom compaction: z12 cells rolled up to z8 parents
    (``fragment.rs:35-47`` ``detail``/H3 ``cell_to_parent`` analogue)."""
    import ray.data as rd

    ds = rd.read_parquet(_pq(sf_dir, "events"), columns=["event_id"])

    def _cells(b: pa.Table) -> pa.Table:
        lon, lat = event_lonlat(np.asarray(b["event_id"]))
        x, y = _slippy_xy(lon, lat, Z_CELL)
        key = ((x >> 4).astype(np.int64) << np.int64(32)) | (y >> 4).astype(np.int64)
        uniq, counts = np.unique(key, return_counts=True)
        return pa.table(
            {
                "x8": pa.array(uniq >> np.int64(32), pa.int64()),
                "y8": pa.array(uniq & np.int64(0xFFFFFFFF), pa.int64()),
                "n": pa.array(counts.astype(np.int64), pa.int64()),
            }
        )

    out = ds.map_batches(_cells, batch_format="pyarrow").groupby(["x8", "y8"]).sum("n")
    return out.map_batches(lambda t: t.rename_columns(["x8", "y8", "n"]), batch_format="pyarrow")


def sql_tile_rollup() -> str:
    x, y = SQL_SLIPPY(Z_CELL)
    return (
        f"WITH pts AS ({SQL_EVENT_PTS}), cells AS (SELECT {x} AS x, {y} AS y FROM pts) "
        f"SELECT CAST(floor(x/16) AS BIGINT) AS x8, CAST(floor(y/16) AS BIGINT) AS y8, COUNT(*) AS n "
        f"FROM cells GROUP BY 1, 2"
    )


def q_rasterize(sf_dir: str):
    """Vector→raster: events binned into per-tile 32×32 pixel grids at
    z=2 — the sparse raster rollup (per-batch pixel partials, one
    groupby-sum; ``raster.rasterize_points``)."""
    import ray.data as rd

    from ..raster import pixel_partials

    ds = rd.read_parquet(_pq(sf_dir, "events"), columns=["event_id"])

    def _partials(b: pa.Table) -> pa.Table:
        lon, lat = event_lonlat(np.asarray(b["event_id"]))
        return pixel_partials(lon, lat, Z_RASTER, RASTER_GRID)

    out = (
        ds.map_batches(_partials, batch_format="pyarrow")
        .groupby(["x", "y", "px", "py"])
        .sum("n")
    )
    return out.map_batches(
        lambda t: t.rename_columns(["x", "y", "px", "py", "n"]), batch_format="pyarrow"
    )


def _sql_raster_pixels(z: int, grid: int) -> str:
    n = float(1 << z)
    g = float(grid)
    fx = f"((lon + 180.0)/360.0*{n})"
    fy = f"((1.0 - ln(tan(radians(lat)) + 1.0/cos(radians(lat)))/pi())/2.0*{n})"
    return (
        f"SELECT CAST(floor({fx}) AS BIGINT) AS x, CAST(floor({fy}) AS BIGINT) AS y, "
        f"CAST(floor(({fx} - floor({fx}))*{g}) AS BIGINT) AS px, "
        f"CAST(floor(({fy} - floor({fy}))*{g}) AS BIGINT) AS py, "
        f"COUNT(*) AS n FROM pts GROUP BY 1, 2, 3, 4"
    )


def sql_rasterize() -> str:
    return f"WITH pts AS ({SQL_EVENT_PTS}) {_sql_raster_pixels(Z_RASTER, RASTER_GRID)}"


def q_raster_runs(sf_dir: str):
    """Raster→vector: horizontal run-length vectorization of the
    thresholded z=2 / 16×16 raster — gaps-and-islands per (tile, row),
    ONE tile-keyed exchange (``raster.vectorize_runs``: partials merge
    inside the group, runs emitted as vector segments)."""
    import ray.data as rd

    from ..raster import pixel_partials, runs_of_tile

    ds = rd.read_parquet(_pq(sf_dir, "events"), columns=["event_id"])

    def _partials(b: pa.Table) -> pa.Table:
        lon, lat = event_lonlat(np.asarray(b["event_id"]))
        return pixel_partials(lon, lat, Z_RASTER, RUNS_GRID)

    return (
        ds.map_batches(_partials, batch_format="pyarrow")
        .groupby(["x", "y"])
        .map_groups(lambda g: runs_of_tile(g, RUNS_THRESHOLD), batch_format="pyarrow")
    )


def sql_raster_runs() -> str:
    return (
        f"WITH pts AS ({SQL_EVENT_PTS}), "
        f"pix AS ({_sql_raster_pixels(Z_RASTER, RUNS_GRID)}), "
        f"thr AS (SELECT * FROM pix WHERE n >= {RUNS_THRESHOLD}), "
        f"isl AS (SELECT x, y, py, px, n, "
        f"px - ROW_NUMBER() OVER (PARTITION BY x, y, py ORDER BY px) AS island FROM thr) "
        f"SELECT x, y, py, MIN(px) AS px0, MAX(px) AS px1, "
        f"COUNT(*) AS npix, CAST(SUM(n) AS BIGINT) AS total "
        f"FROM isl GROUP BY x, y, py, island"
    )


def q_raster_components(sf_dir: str):
    """Raster→vector connected components: 4-connected component count +
    largest size per tile over the thresholded z=2 / 16×16 raster —
    union-find inside ``map_groups`` (bounded O(grid²) per tile), the
    polygon-count view of the raster. Oracled against a recursive-CTE
    min-label propagation in DuckDB."""
    import ray.data as rd

    from ..raster import components_of_tile, pixel_partials

    ds = rd.read_parquet(_pq(sf_dir, "events"), columns=["event_id"])

    def _partials(b: pa.Table) -> pa.Table:
        lon, lat = event_lonlat(np.asarray(b["event_id"]))
        return pixel_partials(lon, lat, Z_RASTER, RUNS_GRID)

    return (
        ds.map_batches(_partials, batch_format="pyarrow")
        .groupby(["x", "y"])
        .map_groups(
            lambda g: components_of_tile(g, RUNS_GRID, RUNS_THRESHOLD),
            batch_format="pyarrow",
        )
    )


def sql_raster_components() -> str:
    g = RUNS_GRID
    return (
        f"WITH RECURSIVE pts AS ({SQL_EVENT_PTS}), "
        f"pix AS ({_sql_raster_pixels(Z_RASTER, RUNS_GRID)}), "
        f"thr AS (SELECT x, y, py*{g}+px AS id, px, py FROM pix WHERE n >= {RUNS_THRESHOLD}), "
        f"e AS (SELECT a.x, a.y, a.id AS u, b.id AS v FROM thr a JOIN thr b "
        f"ON a.x=b.x AND a.y=b.y WHERE (abs(a.px-b.px) + abs(a.py-b.py)) = 1), "
        f"reach(x, y, id, lab) AS ("
        f"  SELECT x, y, id, id FROM thr"
        f"  UNION"
        f"  SELECT e.x, e.y, e.u, r.lab FROM e JOIN reach r ON r.x=e.x AND r.y=e.y AND r.id=e.v), "
        f"comp AS (SELECT x, y, id, MIN(lab) AS comp_id FROM reach GROUP BY x, y, id), "
        f"sizes AS (SELECT x, y, comp_id, COUNT(*) AS sz FROM comp GROUP BY x, y, comp_id) "
        f"SELECT x, y, COUNT(*) AS n_components, MAX(sz) AS largest FROM sizes GROUP BY x, y"
    )


def q_raster_pyramid(sf_dir: str):
    """Raster zoom-pyramid: the z=2 raster sum-pooled 2×2 into its z=1
    parent tiles — compaction up the pyramid in GLOBAL pixel space
    (X = x·grid + px; parent X = X>>1), the raster analogue of
    ``tile_rollup`` / ``fragment.rs:35-47``."""
    import ray.data as rd

    from ..raster import pixel_partials

    ds = rd.read_parquet(_pq(sf_dir, "events"), columns=["event_id"])

    def _partials(b: pa.Table) -> pa.Table:
        lon, lat = event_lonlat(np.asarray(b["event_id"]))
        t = pixel_partials(lon, lat, Z_RASTER, RASTER_GRID)
        gx = t["x"].to_numpy() * RASTER_GRID + t["px"].to_numpy()
        gy = t["y"].to_numpy() * RASTER_GRID + t["py"].to_numpy()
        pgx, pgy = gx >> 1, gy >> 1
        return pa.table(
            {
                "x": pa.array(pgx // RASTER_GRID, pa.int64()),
                "y": pa.array(pgy // RASTER_GRID, pa.int64()),
                "px": pa.array(pgx % RASTER_GRID, pa.int64()),
                "py": pa.array(pgy % RASTER_GRID, pa.int64()),
                "n": pa.array(t["n"].to_numpy(), pa.int64()),
            }
        )

    out = (
        ds.map_batches(_partials, batch_format="pyarrow")
        .groupby(["x", "y", "px", "py"])
        .sum("n")
    )
    return out.map_batches(
        lambda t: t.rename_columns(["x", "y", "px", "py", "n"]), batch_format="pyarrow"
    )


def sql_raster_pyramid() -> str:
    g = RASTER_GRID
    return (
        f"WITH pts AS ({SQL_EVENT_PTS}), "
        f"pix AS ({_sql_raster_pixels(Z_RASTER, RASTER_GRID)}), "
        f"gpix AS (SELECT (x*{g} + px)//2 AS pgx, (y*{g} + py)//2 AS pgy, n FROM pix) "
        f"SELECT pgx//{g} AS x, pgy//{g} AS y, pgx%{g} AS px, pgy%{g} AS py, "
        f"CAST(SUM(n) AS BIGINT) AS n FROM gpix GROUP BY 1, 2, 3, 4"
    )


def q_tile_project(sf_dir: str):
    """Slippy tile + in-tile MVT offset + zig-zag encoding per point
    (``project.rs:47-74``, ``layer.rs:78-80``)."""
    import ray.data as rd

    from ..functions import zigzag_encode

    ds = rd.read_parquet(_pq(sf_dir, "events"), columns=["event_id"])

    def _proj(b: pa.Table) -> pa.Table:
        eid = np.asarray(b["event_id"], dtype=np.int64)
        lon, lat = event_lonlat(eid)
        x, y = _slippy_xy(lon, lat, Z_TILE)
        n = float(1 << Z_TILE)
        fx = (lon + 180.0) / 360.0 * n
        lat_r = np.radians(lat)
        fy = (1.0 - np.log(np.tan(lat_r) + 1.0 / np.cos(lat_r)) / np.pi) / 2.0 * n
        px = np.floor((fx - x) * 4096.0).astype(np.int64)
        py = np.floor((fy - y) * 4096.0).astype(np.int64)
        return pa.table(
            {
                "event_id": pa.array(eid, pa.int64()),
                "x": pa.array(x, pa.int64()),
                "y": pa.array(y, pa.int64()),
                "px": pa.array(px, pa.int64()),
                "py": pa.array(py, pa.int64()),
                "zz_px": pa.array(zigzag_encode(px.astype(np.int32)).astype(np.int64), pa.int64()),
            }
        )

    return ds.map_batches(_proj, batch_format="pyarrow")


def sql_tile_project() -> str:
    n = float(1 << Z_TILE)
    fx = f"((lon + 180.0)/360.0*{n})"
    fy = f"((1.0 - ln(tan(radians(lat)) + 1.0/cos(radians(lat)))/pi())/2.0*{n})"
    x = f"CAST(floor({fx}) AS BIGINT)"
    y = f"CAST(floor({fy}) AS BIGINT)"
    px = f"CAST(floor(({fx} - floor({fx}))*4096.0) AS BIGINT)"
    py = f"CAST(floor(({fy} - floor({fy}))*4096.0) AS BIGINT)"
    # zigzag on int32: (v<<1)^(v>>31); px ≥ 0 so this is just 2*px
    return (
        f"WITH pts AS ({SQL_EVENT_PTS}) SELECT event_id, {x} AS x, {y} AS y, "
        f"{px} AS px, {py} AS py, {px}*2 AS zz_px FROM pts"
    )


def q_haversine_track(sf_dir: str):
    """Per-user track length: sort by (ts, event_id) within user, sum
    consecutive haversine hops — the per-key ordered-window pattern."""
    import ray.data as rd

    ds = rd.read_parquet(_pq(sf_dir, "events"), columns=["event_id", "user_id", "ts"])

    def _track(g: pa.Table) -> pa.Table:
        eid = g["event_id"].to_numpy(zero_copy_only=False)
        ts = g["ts"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts))
        lon, lat = event_lonlat(eid[order])
        d = hav_m(lon[:-1], lat[:-1], lon[1:], lat[1:]).sum() if len(g) > 1 else 0.0
        return pa.table(
            {
                "user_id": g["user_id"].slice(0, 1).combine_chunks(),
                "total_m": pa.array([float(r3(d))], pa.float64()),
            }
        )

    return ds.groupby("user_id").map_groups(_track, batch_format="pyarrow")


def sql_haversine_track() -> str:
    hav = SQL_HAV("plon", "plat", "lon", "lat")
    return f"""
    WITH pts AS ({SQL_EVENT_PTS}),
    seq AS (
      SELECT user_id, lon, lat,
             lag(lon) OVER w AS plon, lag(lat) OVER w AS plat
      FROM pts WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id,
           floor(COALESCE(SUM(CASE WHEN plon IS NULL THEN NULL ELSE {hav} END), 0.0)*1000 + 0.5)/1000 AS total_m
    FROM seq GROUP BY user_id
    """


def _station_coords(sf_dir: str) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """The planted station layout (key, lon, lat) — must stay bit-identical
    to the `st` CTE of sql_nn_station / sql_knn_station; shared by the
    broadcast and R-tree twins so the formulas cannot drift apart."""
    nation = papq.read_table(_pq(sf_dir, "nation"), columns=["n_nationkey"])
    skey = np.sort(np.asarray(nation["n_nationkey"], dtype=np.int64))
    s_lon = ((skey * 131) % 360 - 180 + 0.5).astype(np.float64)
    s_lat = ((skey * 37) % 160 - 80 + 0.5).astype(np.float64)
    return skey, s_lon, s_lat


def _region_boxes(sf_dir: str) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """The planted region rectangles (key, w, e, s, n) — must stay
    bit-identical to sql_pip_region's box CTE; shared by the broadcast
    and R-tree twins."""
    region = papq.read_table(_pq(sf_dir, "region"), columns=["r_regionkey"])
    rkey = np.sort(np.asarray(region["r_regionkey"], dtype=np.int64))
    lon_w = (rkey * 60 - 170).astype(np.float64)
    lat_s = (rkey * 25 - 70).astype(np.float64)
    return rkey, lon_w, lon_w + 55.0, lat_s, lat_s + 48.0


def q_nn_station(sf_dir: str):
    """1-NN broadcast join: each event point snapped to the nearest of 25
    nation-derived stations (the ``Snap``/proximity-service pattern —
    small side broadcast, no shuffle; ``routers_rpc`` ScanService)."""
    import ray.data as rd

    skey, s_lon, s_lat = _station_coords(sf_dir)

    ds = rd.read_parquet(_pq(sf_dir, "events"), columns=["event_id"])

    def _nn(b: pa.Table) -> pa.Table:
        eid = np.asarray(b["event_id"], dtype=np.int64)
        lon, lat = event_lonlat(eid)
        d = hav_m(lon[:, None], lat[:, None], s_lon[None, :], s_lat[None, :])
        best = np.argmin(d, axis=1)  # first occurrence = lowest station key
        return pa.table(
            {
                "event_id": pa.array(eid, pa.int64()),
                "station_id": pa.array(skey[best], pa.int64()),
                "dist_m": pa.array(r3(d[np.arange(eid.size), best]), pa.float64()),
            }
        )

    return ds.map_batches(_nn, batch_format="pyarrow")


def sql_nn_station() -> str:
    hav = SQL_HAV("s.slon", "s.slat", "p.lon", "p.lat")
    return f"""
    WITH pts AS ({SQL_EVENT_PTS}),
    st AS (
      SELECT n_nationkey AS station_id,
             CAST((n_nationkey*131) % 360 - 180 AS DOUBLE) + 0.5 AS slon,
             CAST((n_nationkey*37) % 160 - 80 AS DOUBLE) + 0.5 AS slat
      FROM nation
    ),
    ranked AS (
      SELECT p.event_id, s.station_id, {hav} AS d,
             row_number() OVER (PARTITION BY p.event_id ORDER BY {hav}, s.station_id) AS rk
      FROM pts p CROSS JOIN st s
    )
    SELECT event_id, station_id, floor(d*1000 + 0.5)/1000 AS dist_m FROM ranked WHERE rk = 1
    """


def q_knn_station(sf_dir: str):
    """k-NN broadcast join (k=3): the kNN candidate-search pattern —
    small side broadcast, per-batch vectorized distance matrix, stable
    partial top-k per point, no shuffle (``routers_network``
    ``edges_at_distance`` k-candidate scan generalized to k-NN)."""
    import ray.data as rd

    K = 3
    skey, s_lon, s_lat = _station_coords(sf_dir)

    ds = rd.read_parquet(_pq(sf_dir, "events"), columns=["event_id"])

    def _knn(b: pa.Table) -> pa.Table:
        eid = np.asarray(b["event_id"], dtype=np.int64)
        lon, lat = event_lonlat(eid)
        d = hav_m(lon[:, None], lat[:, None], s_lon[None, :], s_lat[None, :])
        # stations are key-ascending columns, so a stable sort breaks
        # distance ties on the lowest station_id — the SQL's (d, id) order
        top = np.argsort(d, axis=1, kind="stable")[:, :K]
        rows = np.repeat(eid, K)
        rk = np.tile(np.arange(1, K + 1, dtype=np.int64), eid.size)
        flat = top.ravel()
        return pa.table(
            {
                "event_id": pa.array(rows, pa.int64()),
                "rk": pa.array(rk, pa.int64()),
                "station_id": pa.array(skey[flat], pa.int64()),
                "dist_m": pa.array(
                    r3(d[np.repeat(np.arange(eid.size), K), flat]), pa.float64()
                ),
            }
        )

    return ds.map_batches(_knn, batch_format="pyarrow")


def sql_knn_station() -> str:
    hav = SQL_HAV("s.slon", "s.slat", "p.lon", "p.lat")
    return f"""
    WITH pts AS ({SQL_EVENT_PTS}),
    st AS (
      SELECT n_nationkey AS station_id,
             CAST((n_nationkey*131) % 360 - 180 AS DOUBLE) + 0.5 AS slon,
             CAST((n_nationkey*37) % 160 - 80 AS DOUBLE) + 0.5 AS slat
      FROM nation
    ),
    ranked AS (
      SELECT p.event_id, s.station_id, {hav} AS d,
             row_number() OVER (PARTITION BY p.event_id ORDER BY {hav}, s.station_id) AS rk
      FROM pts p CROSS JOIN st s
    )
    SELECT event_id, rk, station_id, floor(d*1000 + 0.5)/1000 AS dist_m FROM ranked WHERE rk <= 3
    """


def q_knn_rtree(sf_dir: str):
    """k-NN (k=3) via the STR-packed R-tree candidate path — the north
    rule's literal "R-tree-backed kNN candidate search inside
    map_batches": the station tree builds once on the driver, the batch
    closure captures it (object store, once per task), each batch gathers
    candidates with the metric-safe expanding-radius traversal
    (:func:`routers_ray.rtree.knn_candidates`) and refines with the exact
    haversine + (dist, id) tie order. Must equal ``q_knn_station``'s
    brute-force broadcast join row-for-row (same SQL oracle)."""
    import ray.data as rd

    from ..rtree import STRtree, knn_candidates

    K = 3
    skey, s_lon, s_lat = _station_coords(sf_dir)
    tree = STRtree(np.column_stack([s_lon, s_lat, s_lon, s_lat]))

    ds = rd.read_parquet(_pq(sf_dir, "events"), columns=["event_id"])

    def _knn(b: pa.Table) -> pa.Table:
        eid = np.asarray(b["event_id"], dtype=np.int64)
        lon, lat = event_lonlat(eid)
        qi, ii = knn_candidates(
            tree, lon, lat, K,
            dist_m=lambda a, b2: hav_m(lon[a], lat[a], s_lon[b2], s_lat[b2]),
        )
        d = hav_m(lon[qi], lat[qi], s_lon[ii], s_lat[ii])
        order = np.lexsort((ii, d, qi))  # per-point (d, station_id) ascending
        qs, is_, ds_ = qi[order], ii[order], d[order]
        rank = np.arange(qs.size) - np.searchsorted(qs, qs, side="left")
        keep = rank < K
        return pa.table(
            {
                "event_id": pa.array(eid[qs[keep]], pa.int64()),
                "rk": pa.array(rank[keep] + 1, pa.int64()),
                "station_id": pa.array(skey[is_[keep]], pa.int64()),
                "dist_m": pa.array(r3(ds_[keep]), pa.float64()),
            }
        )

    return ds.map_batches(_knn, batch_format="pyarrow")


def q_pip_rtree(sf_dir: str):
    """Point-in-polygon (rectangle) join via the STR-packed R-tree — the
    north rule's literal "R-tree-backed point-in-polygon": region boxes
    load the tree once, each batch runs the vectorized containment
    traversal (closed-box candidates) and refines with the exact
    half-open predicate. Must equal ``q_pip_region``'s broadcast mask
    row-for-row (same SQL oracle)."""
    import ray.data as rd

    from ..rtree import STRtree

    rkey, lon_w, lon_e, lat_s, lat_n = _region_boxes(sf_dir)
    tree = STRtree(np.column_stack([lon_w, lat_s, lon_e, lat_n]))

    ds = rd.read_parquet(_pq(sf_dir, "events"), columns=["event_id"])

    def _pip(b: pa.Table) -> pa.Table:
        lon, lat = event_lonlat(np.asarray(b["event_id"]))
        qi, ii = tree.query_points(lon, lat)
        # exact half-open refine (tree candidates are closed-box)
        keep = (lon[qi] < lon_e[ii]) & (lat[qi] < lat_n[ii])
        counts = np.bincount(ii[keep], minlength=rkey.size).astype(np.int64)
        nz = counts > 0
        return pa.table(
            {"region": pa.array(rkey[nz], pa.int64()), "n": pa.array(counts[nz], pa.int64())}
        )

    partial = ds.map_batches(_pip, batch_format="pyarrow")
    out = partial.groupby("region").sum("n")
    return out.map_batches(lambda t: t.rename_columns(["region", "n"]), batch_format="pyarrow")


def q_hll_users(sf_dir: str):
    """HyperLogLog register sketch of distinct users (p=10): per-batch
    bounded register partials → one tiny ``groupby(reg).max(rho)`` — the
    approximate-COUNT-DISTINCT shape for 10^12 rows. The register table
    is exact in both engines (md5-u64 + trailing-zero rank, see
    :mod:`routers_ray.sketch`); the float estimate is checked in pytest
    against exact distinct within the theoretical error."""
    import ray.data as rd

    from ..sketch import hll_sketch

    ds = rd.read_parquet(_pq(sf_dir, "events"), columns=["user_id"])
    return hll_sketch(ds, lambda b: [str(u) for u in b["user_id"].to_pylist()], p=10)


def sql_hll_users() -> str:
    # (~w) + 1 NEEDS the parens: DuckDB binds ~ looser than +, so the
    # bare ~w + 1 parses as ~(w + 1) and isolates the wrong bit
    return """
    WITH h AS (SELECT md5_number_upper(CAST(user_id AS VARCHAR)) AS hv FROM events),
    r AS (SELECT CAST(hv & 1023 AS BIGINT) AS reg, hv >> 10 AS w FROM h)
    SELECT reg,
           MAX(CASE WHEN w = 0 THEN 55
               ELSE CAST(log2(CAST(greatest(w & ((~w) + 1), 1) AS DOUBLE)) AS BIGINT) + 1 END) AS rho
    FROM r GROUP BY reg
    """


COLOC_R_DEG = 4.0  # lattice-derived points: min pair distance 2.1 deg at sf0.001


def q_coloc_pairs(sf_dir: str):
    """Distributed radius SELF-JOIN (co-location pairs): events within
    4° grid distance of each other — 9× bucket replication, one
    bucket-keyed exchange, exactly-once owner emission
    (:mod:`routers_ray.spatialjoin`). Oracled against the naive DuckDB
    self-join carrying the identical IEEE distance predicate."""
    import ray.data as rd

    from ..spatialjoin import radius_self_join

    ds = rd.read_parquet(_pq(sf_dir, "events"), columns=["event_id"])

    def _pts(b: pa.Table) -> pa.Table:
        eid = np.asarray(b["event_id"], dtype=np.int64)
        lon, lat = event_lonlat(eid)
        return pa.table(
            {
                "event_id": pa.array(eid, pa.int64()),
                "lon": pa.array(lon, pa.float64()),
                "lat": pa.array(lat, pa.float64()),
            }
        )

    pairs = radius_self_join(
        ds.map_batches(_pts, batch_format="pyarrow"), COLOC_R_DEG, "event_id"
    )
    return pairs.map_batches(
        lambda t: pa.table(
            {
                "a": t["a"],
                "b": t["b"],
                "dist2": pa.array(r6(np.asarray(t["dist2"])), pa.float64()),
            }
        ),
        batch_format="pyarrow",
    )


def sql_coloc_pairs() -> str:
    r = COLOC_R_DEG
    return f"""
    WITH pts AS ({SQL_EVENT_PTS})
    SELECT a.event_id AS a, b.event_id AS b,
           floor(((a.lon - b.lon)*(a.lon - b.lon) + (a.lat - b.lat)*(a.lat - b.lat))*1e6 + 0.5)/1e6 AS dist2
    FROM pts a JOIN pts b
      ON a.event_id < b.event_id
     AND b.lon BETWEEN a.lon - {r} AND a.lon + {r}
     AND b.lat BETWEEN a.lat - {r} AND a.lat + {r}
     AND (a.lon - b.lon)*(a.lon - b.lon) + (a.lat - b.lat)*(a.lat - b.lat) <= {r * r}
    """


COLOC_D_M = 300_000.0  # metric variant: 300 km
COLOC_LAT_MAX = 60.0  # band the input so 6 deg buckets over-cover 300 km
COLOC_R_M_DEG = 6.0


def q_coloc_pairs_m(sf_dir: str):
    """METRIC radius self-join: event pairs within 300 km haversine, on
    the |lat| ≤ 60 band (bucket contract: 6° ≥ 300 km / (111.195 km·
    cos 60°) = 5.39°). Same replication + owner-dedup machinery; the
    degree buckets are the over-covering prefilter, haversine the exact
    emitted distance (r3, the repo's SQL_HAV bit-parity convention)."""
    import ray.data as rd

    from ..spatialjoin import radius_self_join

    ds = rd.read_parquet(_pq(sf_dir, "events"), columns=["event_id"])

    def _pts(b: pa.Table) -> pa.Table:
        eid = np.asarray(b["event_id"], dtype=np.int64)
        lon, lat = event_lonlat(eid)
        keep = np.abs(lat) <= COLOC_LAT_MAX
        return pa.table(
            {
                "event_id": pa.array(eid[keep], pa.int64()),
                "lon": pa.array(lon[keep], pa.float64()),
                "lat": pa.array(lat[keep], pa.float64()),
            }
        )

    def _hav(lon_a, lat_a, lon_b, lat_b):
        return hav_m(lon_a, lat_a, lon_b, lat_b)

    pairs = radius_self_join(
        ds.map_batches(_pts, batch_format="pyarrow"),
        COLOC_R_M_DEG,
        "event_id",
        metric=_hav,
        metric_max=COLOC_D_M,
    )
    return pairs.map_batches(
        lambda t: pa.table(
            {
                "a": t["a"],
                "b": t["b"],
                "dist_m": pa.array(r3(np.asarray(t["dist2"])), pa.float64()),
            }
        ),
        batch_format="pyarrow",
    )


def sql_coloc_pairs_m() -> str:
    hav = SQL_HAV("a.lon", "a.lat", "b.lon", "b.lat")
    return f"""
    WITH pts AS (
      SELECT * FROM ({SQL_EVENT_PTS}) WHERE abs(lat) <= {COLOC_LAT_MAX}
    )
    SELECT a.event_id AS a, b.event_id AS b,
           floor({hav}*1000 + 0.5)/1000 AS dist_m
    FROM pts a JOIN pts b
      ON a.event_id < b.event_id
     AND b.lat BETWEEN a.lat - 3.0 AND a.lat + 3.0
     AND b.lon BETWEEN a.lon - 6.0 AND a.lon + 6.0
     AND {hav} <= {COLOC_D_M}
    """


HAUS_CELL_DEG = 60.0  # default anchor-cell pairing grid for the track-pair join


def _check_haus_grid(cell_deg: float) -> None:
    # the decimal x*100+y packing (kept because the SQL oracles spell it
    # out textually) requires y = floor(170/deg) < 100 — refuse silent
    # aliasing if a caller tunes the grid below ~1.8 deg. Sizing rule
    # (100-TB note): pick cell_deg so expected tracks-per-cell ≈
    # sqrt(2·target_pairs_per_task); below the packing floor switch to
    # the trackops facade's (cx<<32)|cy pack, which is deg-unbounded.
    if 170.0 / cell_deg >= 100.0:
        raise ValueError(f"cell_deg={cell_deg} too fine for the x*100+y cell packing")


_check_haus_grid(HAUS_CELL_DEG)


def _anchor_cell(lon0: float, lat0: float, cell_deg: float = HAUS_CELL_DEG) -> int:
    """Coarse pairing cell of a track's first point — packed x*100+y
    (x ∈ [0,6), y ∈ [0,3) on the derived-coordinate domain at the 60°
    default)."""
    x = int(np.floor((lon0 + 180.0) / cell_deg))
    y = int(np.floor((lat0 + 85.0) / cell_deg))
    return x * 100 + y


def hausdorff_m(lon_a, lat_a, lon_b, lat_b) -> float:
    """Symmetric Hausdorff distance between two point sets in meters —
    ``max(max_a min_b d, max_b min_a d)`` with both direction matrices
    evaluated explicitly (no float-symmetry assumption)."""
    d_ab = hav_m(lon_a[:, None], lat_a[:, None], lon_b[None, :], lat_b[None, :])
    d_ba = hav_m(lon_b[:, None], lat_b[:, None], lon_a[None, :], lat_a[None, :])
    return max(d_ab.min(axis=1).max(), d_ba.min(axis=1).max())


def od_first_last(uid: np.ndarray, eid: np.ndarray, ts: np.ndarray):
    """Per-user first/last row indices by ascending ``(ts, eid)`` within an
    arbitrary batch — the associative partial behind :func:`q_od_flows`
    (any batch split merges to the same global first/last)."""
    if uid.size == 0:
        z = np.empty(0, dtype=np.int64)
        return z, z
    order = np.lexsort((eid, ts))  # ascending (ts, eid)
    g = order[np.argsort(uid[order], kind="stable")]  # group by uid, keep order
    starts = np.flatnonzero(np.r_[True, uid[g][1:] != uid[g][:-1]])
    ends = np.r_[starts[1:], uid.size] - 1
    return g[starts], g[ends]


def _event_tracks(sf_dir: str, cell_deg: float = HAUS_CELL_DEG,
                  prefix_len: int | None = None):
    """Per-user ordered tracks as packed float64 blobs keyed by the first
    point's anchor cell — one groupby builds each track ONCE; shared by
    the Hausdorff join, the track-clustering query and (via
    ``prefix_len``) the fixed-length Fréchet join: ``prefix_len=L`` keeps
    only each user's first L points and DROPS users with fewer."""
    import ray.data as rd

    _check_haus_grid(cell_deg)
    ds = rd.read_parquet(_pq(sf_dir, "events"), columns=["event_id", "user_id", "ts"])
    L = None if prefix_len is None else int(prefix_len)

    def _track(g: pa.Table) -> pa.Table:
        eid = g["event_id"].to_numpy(zero_copy_only=False)
        ts = g["ts"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts))
        if L is not None:
            if order.size < L:
                return pa.table(
                    {
                        "user_id": pa.array([], pa.int64()),
                        "cell": pa.array([], pa.int64()),
                        "pts": pa.array([], pa.binary()),
                    }
                )
            order = order[:L]
        lon, lat = event_lonlat(eid[order])
        return pa.table(
            {
                "user_id": pc.cast(g["user_id"].slice(0, 1), pa.int64()).combine_chunks(),
                "cell": pa.array([_anchor_cell(lon[0], lat[0], cell_deg)], pa.int64()),
                "pts": pa.array([np.concatenate([lon, lat]).tobytes()], pa.binary()),
            }
        )

    return ds.groupby("user_id").map_groups(_track, batch_format="pyarrow")


def q_hausdorff_pairs(sf_dir: str, *, cell_deg: float = HAUS_CELL_DEG,
                      n_pair_buckets: int = 1):
    """Symmetric Hausdorff distance between user-track pairs sharing an
    anchor cell (track-similarity / geofence-family join,
    ``max(max_a min_b d, max_b min_a d)``).

    Distributed shape: one ``groupby(user_id)`` builds each track ONCE
    (points packed as a float64 blob — nested columns don't survive
    exchanges, NOTES), keyed by the first point's 60° anchor cell; one
    ``groupby(cell)`` then pairs tracks within the cell. The shuffle moves
    one row per TRACK, never per point-pair; the per-pair min/max kernel
    is a vectorized haversine matrix. Both haversine directions are
    evaluated explicitly (hav(A_i,B_j) AND hav(B_j,A_i)) so the engine
    makes no float-symmetry assumption the SQL oracle doesn't.

    Partitioning assumption (100-TB note): pair count is quadratic in
    tracks-per-cell BY SEMANTICS. Two knobs bound it: ``cell_deg``
    shrinks the SEMANTIC pair set (size so expected tracks-per-cell ≈
    sqrt(2·target_pairs_per_task)); ``n_pair_buckets`` decomposes a
    cell's fixed pair set into B·(B+1)/2 bounded bucket-pair tasks via
    the blocked self-join in :func:`routers_ray.trackops
    .hausdorff_pair_rows` (exact — parity-tested vs the single-group
    path). Oversized groups are logged, never truncated. The 60° default
    matches the synthetic corpus's density, not a scale recommendation."""
    tracks = _event_tracks(sf_dir, cell_deg)

    if int(n_pair_buckets) > 1:
        from ..trackops import hausdorff_pair_rows

        rows = hausdorff_pair_rows(tracks, "user_id", n_pair_buckets=n_pair_buckets)
        return rows.map_batches(
            lambda t: t.drop_columns(["cell"]).rename_columns(["ua", "ub", "hd_m"]),
            batch_format="pyarrow",
        )

    def _pairs(g: pa.Table) -> pa.Table:
        uid = np.asarray(g["user_id"], dtype=np.int64)
        blobs = g["pts"].to_pylist()
        order = np.argsort(uid, kind="stable")
        uid = uid[order]
        pts = []
        for i in order.tolist():
            v = np.frombuffer(blobs[i], dtype=np.float64)
            pts.append((v[: v.size // 2], v[v.size // 2 :]))
        ua, ub, hd = [], [], []
        for i in range(uid.size):
            lon_a, lat_a = pts[i]
            for j in range(i + 1, uid.size):
                lon_b, lat_b = pts[j]
                h = hausdorff_m(lon_a, lat_a, lon_b, lat_b)
                ua.append(int(uid[i])), ub.append(int(uid[j])), hd.append(h)
        return pa.table(
            {
                "ua": pa.array(ua, pa.int64()),
                "ub": pa.array(ub, pa.int64()),
                "hd_m": pa.array(r3(np.asarray(hd, dtype=np.float64)), pa.float64()),
            }
        )

    return tracks.groupby("cell").map_groups(_pairs, batch_format="pyarrow")


def sql_hausdorff_pairs(cell_deg: float = HAUS_CELL_DEG) -> str:
    hav = SQL_HAV("pa.lon", "pa.lat", "pb.lon", "pb.lat")
    _check_haus_grid(cell_deg)
    c = cell_deg
    return f"""
    WITH pts AS ({SQL_EVENT_PTS}),
    rk AS (
      SELECT user_id, lon, lat,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM pts
    ),
    anchor AS (
      SELECT user_id,
             CAST(floor((lon + 180.0)/{c}) AS BIGINT)*100
             + CAST(floor((lat + 85.0)/{c}) AS BIGINT) AS cell
      FROM rk WHERE rn = 1
    ),
    pr AS (
      SELECT a.user_id AS ua, b.user_id AS ub
      FROM anchor a JOIN anchor b ON a.cell = b.cell AND a.user_id < b.user_id
    ),
    dirs AS (
      SELECT ua, ub, ua AS s, ub AS t FROM pr
      UNION ALL
      SELECT ua, ub, ub AS s, ua AS t FROM pr
    ),
    dmin AS (
      SELECT d.ua, d.ub, pa.event_id AS src_ev, MIN({hav}) AS md
      FROM dirs d
      JOIN pts pa ON pa.user_id = d.s
      JOIN pts pb ON pb.user_id = d.t
      GROUP BY d.ua, d.ub, pa.event_id
    )
    SELECT ua, ub, floor(MAX(md)*1000 + 0.5)/1000 AS hd_m
    FROM dmin GROUP BY ua, ub
    """


CLUSTER_HD_M = 3_500_000.0  # track-clustering edge threshold (on r3(hd))


def q_track_clusters(sf_dir: str, *, cell_deg: float = HAUS_CELL_DEG,
                     n_pair_buckets: int = 1):
    """Trajectory clustering: tracks whose symmetric Hausdorff distance is
    ≤ 3,500 km form edges; connected components over those edges are the
    clusters (single-link track clustering — the trajectory analogue of
    the cell DBSCAN). Edges exist only WITHIN an anchor cell by
    construction, so the component computation is a per-cell union-find
    inside the same group that prices the pairs — no global graph pass.
    Emits (user_id, cluster_id = min member, cluster_size); singletons
    included. Threshold compares the r3-rounded distance so the edge
    predicate is bit-identical to the SQL's.

    ``n_pair_buckets > 1`` bounds the quadratic pair pricing with the
    blocked decomposition of :func:`routers_ray.trackops
    .hausdorff_pair_rows`, then runs the per-cell union-find over the
    resulting EDGE list (+ roster self-loops so singletons survive) —
    exact, parity-tested; see ``q_hausdorff_pairs`` for the sizing rule."""
    tracks = _event_tracks(sf_dir, cell_deg)

    if int(n_pair_buckets) > 1:
        from ..trackops import components_from_edges, hausdorff_pair_rows

        # two consumers below (pair pricing + roster self-loops): pin the
        # built tracks (one small row per track) so the events scan +
        # per-user groupby doesn't re-execute per consumer
        tracks = tracks.materialize()
        pairs = hausdorff_pair_rows(tracks, "user_id", n_pair_buckets=n_pair_buckets)

        def _edges(t: pa.Table) -> pa.Table:
            keep = t.filter(pc.less_equal(t["hd_m"], CLUSTER_HD_M))
            return keep.select(["cell", "a", "b"])

        def _roster(t: pa.Table) -> pa.Table:
            return pa.table({"cell": t["cell"], "a": t["user_id"], "b": t["user_id"]})

        edges = pairs.map_batches(_edges, batch_format="pyarrow")
        roster = tracks.map_batches(_roster, batch_format="pyarrow")
        return components_from_edges(edges.union(roster), key_col="user_id")

    def _clusters(g: pa.Table) -> pa.Table:
        uid = np.asarray(g["user_id"], dtype=np.int64)
        blobs = g["pts"].to_pylist()
        order = np.argsort(uid, kind="stable")
        uid = uid[order]
        pts = []
        for i in order.tolist():
            v = np.frombuffer(blobs[i], dtype=np.float64)
            pts.append((v[: v.size // 2], v[v.size // 2 :]))
        n = uid.size
        parent = list(range(n))

        def find(a: int) -> int:
            while parent[a] != a:
                parent[a] = parent[parent[a]]
                a = parent[a]
            return a

        for i in range(n):
            lon_a, lat_a = pts[i]
            for j in range(i + 1, n):
                ra, rb = find(i), find(j)
                if ra == rb:
                    continue  # already connected — the edge is redundant
                lon_b, lat_b = pts[j]
                h = hausdorff_m(lon_a, lat_a, lon_b, lat_b)
                if float(r3(np.asarray([h]))[0]) <= CLUSTER_HD_M:
                    parent[max(ra, rb)] = min(ra, rb)
        roots = np.asarray([find(i) for i in range(n)])
        cluster_id = uid[roots]  # uid ascending → root idx = min member
        _, inv, counts = np.unique(roots, return_inverse=True, return_counts=True)
        return pa.table(
            {
                "user_id": pa.array(uid, pa.int64()),
                "cluster_id": pa.array(cluster_id, pa.int64()),
                "cluster_size": pa.array(counts[inv].astype(np.int64), pa.int64()),
            }
        )

    return tracks.groupby("cell").map_groups(_clusters, batch_format="pyarrow")


def sql_track_clusters(cell_deg: float = HAUS_CELL_DEG) -> str:
    hav = SQL_HAV("pa.lon", "pa.lat", "pb.lon", "pb.lat")
    _check_haus_grid(cell_deg)
    c = cell_deg
    return f"""
    WITH RECURSIVE pts AS ({SQL_EVENT_PTS}),
    rk AS (
      SELECT user_id, lon, lat,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM pts
    ),
    anchor AS (
      SELECT user_id,
             CAST(floor((lon + 180.0)/{c}) AS BIGINT)*100
             + CAST(floor((lat + 85.0)/{c}) AS BIGINT) AS cell
      FROM rk WHERE rn = 1
    ),
    pr AS (
      SELECT a.user_id AS ua, b.user_id AS ub
      FROM anchor a JOIN anchor b ON a.cell = b.cell AND a.user_id < b.user_id
    ),
    dirs AS (
      SELECT ua, ub, ua AS s, ub AS t FROM pr
      UNION ALL
      SELECT ua, ub, ub AS s, ua AS t FROM pr
    ),
    dmin AS (
      SELECT d.ua, d.ub, pa.event_id AS src_ev, MIN({hav}) AS md
      FROM dirs d
      JOIN pts pa ON pa.user_id = d.s
      JOIN pts pb ON pb.user_id = d.t
      GROUP BY d.ua, d.ub, pa.event_id
    ),
    hd AS (
      SELECT ua, ub FROM (
        SELECT ua, ub, floor(MAX(md)*1000 + 0.5)/1000 AS hd_m
        FROM dmin GROUP BY ua, ub
      ) WHERE hd_m <= {CLUSTER_HD_M}
    ),
    e AS (SELECT ua AS u, ub AS v FROM hd UNION ALL SELECT ub, ua FROM hd),
    reach(u, lab) AS (
      SELECT user_id, user_id FROM anchor
      UNION
      SELECT e.u, r.lab FROM e JOIN reach r ON r.u = e.v
    ),
    comp AS (SELECT u AS user_id, MIN(lab) AS cluster_id FROM reach GROUP BY u),
    sizes AS (SELECT cluster_id, COUNT(*) AS sz FROM comp GROUP BY cluster_id)
    SELECT c2.user_id, c2.cluster_id, s.sz AS cluster_size
    FROM comp c2 JOIN sizes s USING (cluster_id)
    """


FRECHET_L = 8  # fixed track prefix length: the L×L DP unrolls exactly in SQL


def frechet_dp_batch(d: np.ndarray) -> np.ndarray:
    """Discrete Fréchet distance for a BATCH of pairs: ``d`` is the
    (P, L, M) pointwise distance tensor; returns (P,) coupling distances.
    Vectorized across pairs — the i/j loops are over the FIXED track
    length, every op is a length-P vector kernel. max/min are exact, so
    the result is bit-identical to any evaluation order the SQL oracle
    picks (Eiter–Mannila DP: dp[i,j] = max(d[i,j], min(dp[i-1,j],
    dp[i,j-1], dp[i-1,j-1])))."""
    P, n, m = d.shape
    dp = np.empty_like(d)
    dp[:, 0, 0] = d[:, 0, 0]
    for i in range(1, n):
        dp[:, i, 0] = np.maximum(dp[:, i - 1, 0], d[:, i, 0])
    for j in range(1, m):
        dp[:, 0, j] = np.maximum(dp[:, 0, j - 1], d[:, 0, j])
    for i in range(1, n):
        for j in range(1, m):
            dp[:, i, j] = np.maximum(
                d[:, i, j],
                np.minimum(
                    np.minimum(dp[:, i - 1, j], dp[:, i, j - 1]), dp[:, i - 1, j - 1]
                ),
            )
    return dp[:, -1, -1]


def frechet_m(lon_a, lat_a, lon_b, lat_b) -> float:
    """Discrete Fréchet distance (meters) between two ordered tracks —
    the order-sensitive sibling of :func:`hausdorff_m` (a leash metric:
    both walkers advance monotonically)."""
    d = hav_m(lon_a[:, None], lat_a[:, None], lon_b[None, :], lat_b[None, :])
    return float(frechet_dp_batch(d[None, :, :])[0])


def q_frechet_pairs(sf_dir: str, *, cell_deg: float = HAUS_CELL_DEG):
    """Discrete Fréchet distance between user-track pairs sharing an
    anchor cell — the ORDER-SENSITIVE track-similarity join next to the
    set-based Hausdorff (two parallel commutes far apart in time order
    are Fréchet-near but a there-and-back loop is not).

    Tracks are the first FRECHET_L=8 points per user (users with fewer
    are excluded) — the fixed length is what lets the 8×8 DP unroll into
    a closed-form SQL oracle (64 haversine columns + 15 anti-diagonal DP
    layers) AND keeps the per-pair kernel a fixed-shape tensor op.
    Distributed shape mirrors ``q_hausdorff_pairs``: one groupby builds
    each 8-point track once, one groupby(cell) prices pairs with a single
    (P, 8, 8) haversine tensor + vectorized DP per cell; the same
    cell_deg sizing rule / blocked-decomposition caveat applies."""
    L = FRECHET_L
    tracks = _event_tracks(sf_dir, cell_deg, prefix_len=L)

    def _pairs(g: pa.Table) -> pa.Table:
        uid = np.asarray(g["user_id"], dtype=np.int64)
        order = np.argsort(uid, kind="stable")
        uid = uid[order]
        blobs = g["pts"].to_pylist()
        pts = np.stack(
            [np.frombuffer(blobs[i], dtype=np.float64) for i in order.tolist()]
        )  # (T, 2L): lon×L then lat×L
        iu, ju = np.triu_indices(uid.size, 1)
        if iu.size == 0:
            return pa.table(
                {
                    "ua": pa.array([], pa.int64()),
                    "ub": pa.array([], pa.int64()),
                    "fd_m": pa.array([], pa.float64()),
                }
            )
        # a = smaller uid (uid ascending) — matches the SQL join orientation
        lon_a, lat_a = pts[iu, :L], pts[iu, L:]
        lon_b, lat_b = pts[ju, :L], pts[ju, L:]
        d = hav_m(
            lon_a[:, :, None], lat_a[:, :, None], lon_b[:, None, :], lat_b[:, None, :]
        )
        fd = frechet_dp_batch(d)
        return pa.table(
            {
                "ua": pa.array(uid[iu], pa.int64()),
                "ub": pa.array(uid[ju], pa.int64()),
                "fd_m": pa.array(r3(fd), pa.float64()),
            }
        )

    return tracks.groupby("cell").map_groups(_pairs, batch_format="pyarrow")


def sql_frechet_pairs(cell_deg: float = HAUS_CELL_DEG) -> str:
    """Closed-form DP unroll: 64 pointwise haversine columns, then one CTE
    layer per anti-diagonal (dp cells only depend on earlier diagonals)."""
    _check_haus_grid(cell_deg)
    c = cell_deg
    L = FRECHET_L
    pivot = ", ".join(
        f"MAX(CASE WHEN rn={k+1} THEN lon END) AS lon{k}, "
        f"MAX(CASE WHEN rn={k+1} THEN lat END) AS lat{k}"
        for k in range(L)
    )
    d_cols = ", ".join(
        f"{SQL_HAV(f'a.lon{i}', f'a.lat{i}', f'b.lon{j}', f'b.lat{j}')} AS d_{i}_{j}"
        for i in range(L)
        for j in range(L)
    )
    layers = []
    prev = "d"
    for s in range(2 * L - 1):
        exprs = []
        for i in range(L):
            j = s - i
            if not 0 <= j < L:
                continue
            if i == 0 and j == 0:
                e = "d_0_0"
            elif i == 0:
                e = f"greatest(dp_0_{j-1}, d_0_{j})"
            elif j == 0:
                e = f"greatest(dp_{i-1}_0, d_{i}_0)"
            else:
                e = (
                    f"greatest(d_{i}_{j}, least(dp_{i-1}_{j}, dp_{i}_{j-1},"
                    f" dp_{i-1}_{j-1}))"
                )
            exprs.append(f"{e} AS dp_{i}_{j}")
        layers.append(f", l{s} AS (SELECT *, {', '.join(exprs)} FROM {prev})")
        prev = f"l{s}"
    return f"""
    WITH pts AS ({SQL_EVENT_PTS}),
    rk AS (
      SELECT user_id, lon, lat,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM pts
    ),
    full8 AS (
      SELECT user_id FROM rk WHERE rn <= {L}
      GROUP BY user_id HAVING COUNT(*) = {L}
    ),
    t8 AS (
      SELECT user_id, {pivot}
      FROM rk WHERE rn <= {L} AND user_id IN (SELECT user_id FROM full8)
      GROUP BY user_id
    ),
    anchor AS (
      SELECT r.user_id,
             CAST(floor((lon + 180.0)/{c}) AS BIGINT)*100
             + CAST(floor((lat + 85.0)/{c}) AS BIGINT) AS cell
      FROM rk r JOIN full8 f USING (user_id) WHERE rn = 1
    ),
    pr AS (
      SELECT a.user_id AS ua, b.user_id AS ub
      FROM anchor a JOIN anchor b ON a.cell = b.cell AND a.user_id < b.user_id
    ),
    d AS (
      SELECT pr.ua, pr.ub, {d_cols}
      FROM pr JOIN t8 a ON a.user_id = pr.ua JOIN t8 b ON b.user_id = pr.ub
    )
    {''.join(layers)}
    SELECT ua, ub, floor(dp_{L-1}_{L-1}*1000 + 0.5)/1000 AS fd_m FROM {prev}
    """


def q_od_flows(sf_dir: str):
    """Origin→destination flow matrix: each user's first and last point
    (by ``(ts, event_id)``) assigned to the 60° grid, flows counted per
    (o_cell, d_cell). Distributed shape: per-batch associative first/last
    partials (one row per (batch, user) — the min/max key reduction is
    order-free) → ``groupby(user_id)`` merge → per-batch partial flow
    counts → tiny ``groupby((o,d)).sum`` (the two-level combiner)."""
    import ray.data as rd

    ds = rd.read_parquet(_pq(sf_dir, "events"), columns=["event_id", "user_id", "ts"])

    def _partials(b: pa.Table) -> pa.Table:
        uid = np.asarray(b["user_id"], dtype=np.int64)
        eid = np.asarray(b["event_id"], dtype=np.int64)
        ts = b["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").view(np.int64)
        f, l = od_first_last(uid, eid, ts)
        return pa.table(
            {
                "user_id": pa.array(uid[f], pa.int64()),
                "f_ts": pa.array(ts[f], pa.int64()),
                "f_eid": pa.array(eid[f], pa.int64()),
                "l_ts": pa.array(ts[l], pa.int64()),
                "l_eid": pa.array(eid[l], pa.int64()),
            }
        )

    def _merge(g: pa.Table) -> pa.Table:
        f_ts = np.asarray(g["f_ts"], dtype=np.int64)
        f_eid = np.asarray(g["f_eid"], dtype=np.int64)
        l_ts = np.asarray(g["l_ts"], dtype=np.int64)
        l_eid = np.asarray(g["l_eid"], dtype=np.int64)
        fi = np.lexsort((f_eid, f_ts))[0]
        li = np.lexsort((l_eid, l_ts))[-1]
        o_lon, o_lat = event_lonlat(f_eid[fi : fi + 1])
        d_lon, d_lat = event_lonlat(l_eid[li : li + 1])
        return pa.table(
            {
                "o_cell": pa.array([_anchor_cell(o_lon[0], o_lat[0])], pa.int64()),
                "d_cell": pa.array([_anchor_cell(d_lon[0], d_lat[0])], pa.int64()),
            }
        )

    def _flow_partials(b: pa.Table) -> pa.Table:
        # one row per user arrives here; partial-count per (o,d) so the
        # final exchange moves one row per (batch, flow), not per user
        key = np.asarray(b["o_cell"], np.int64) * 10000 + np.asarray(b["d_cell"], np.int64)
        uniq, counts = np.unique(key, return_counts=True)
        return pa.table(
            {
                "o_cell": pa.array(uniq // 10000, pa.int64()),
                "d_cell": pa.array(uniq % 10000, pa.int64()),
                "n": pa.array(counts.astype(np.int64), pa.int64()),
            }
        )

    od = ds.map_batches(_partials, batch_format="pyarrow").groupby("user_id").map_groups(
        _merge, batch_format="pyarrow"
    )
    out = od.map_batches(_flow_partials, batch_format="pyarrow").groupby(
        ["o_cell", "d_cell"]
    ).sum("n")
    return out.map_batches(
        lambda t: t.rename_columns(["o_cell", "d_cell", "n_users"]),
        batch_format="pyarrow",
    )


def sql_od_flows() -> str:
    c = HAUS_CELL_DEG
    return f"""
    WITH pts AS ({SQL_EVENT_PTS}),
    rk AS (
      SELECT user_id, lon, lat,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
             count(*) OVER (PARTITION BY user_id) AS cnt
      FROM pts
    ),
    od AS (
      SELECT f.user_id,
             CAST(floor((f.lon + 180.0)/{c}) AS BIGINT)*100
             + CAST(floor((f.lat + 85.0)/{c}) AS BIGINT) AS o_cell,
             CAST(floor((l.lon + 180.0)/{c}) AS BIGINT)*100
             + CAST(floor((l.lat + 85.0)/{c}) AS BIGINT) AS d_cell
      FROM rk f JOIN rk l ON f.user_id = l.user_id AND f.rn = 1 AND l.rn = l.cnt
    )
    SELECT o_cell, d_cell, CAST(count(*) AS BIGINT) AS n_users
    FROM od GROUP BY o_cell, d_cell
    """


def crossing_count(lon: np.ndarray, lat: np.ndarray) -> int:
    """Count PROPER self-crossings of the polyline (strict orientation-sign
    test on non-adjacent segment pairs; touching/collinear contacts are not
    counted). Signs come from ±* arithmetic on the raw doubles, so the SQL
    twin is bit-identical by IEEE determinism."""
    m = lon.size - 1  # segments
    if m < 3:
        return 0
    i, j = np.triu_indices(m, k=2)
    x1, y1, x2, y2 = lon[i], lat[i], lon[i + 1], lat[i + 1]
    bx1, by1, bx2, by2 = lon[j], lat[j], lon[j + 1], lat[j + 1]
    d1 = (x2 - x1) * (by1 - y1) - (y2 - y1) * (bx1 - x1)
    d2 = (x2 - x1) * (by2 - y1) - (y2 - y1) * (bx2 - x1)
    d3 = (bx2 - bx1) * (y1 - by1) - (by2 - by1) * (x1 - bx1)
    d4 = (bx2 - bx1) * (y2 - by1) - (by2 - by1) * (x2 - bx1)
    return int(np.count_nonzero((d1 * d2 < 0) & (d3 * d4 < 0)))


def q_track_crossings(sf_dir: str):
    """Per-user track self-intersection count (geometry-validation
    primitive — the segment-intersection kernel behind any
    vector-geometry cleanup stage). One ``groupby(user_id)`` builds the
    ordered track and runs the vectorized all-non-adjacent-pair
    orientation test in-group; only (user, count) rows move."""
    import ray.data as rd

    ds = rd.read_parquet(_pq(sf_dir, "events"), columns=["event_id", "user_id", "ts"])

    def _cross(g: pa.Table) -> pa.Table:
        eid = g["event_id"].to_numpy(zero_copy_only=False)
        ts = g["ts"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts))
        lon, lat = event_lonlat(eid[order])
        return pa.table(
            {
                "user_id": g["user_id"].slice(0, 1).combine_chunks(),
                "n_cross": pa.array([crossing_count(lon, lat)], pa.int64()),
            }
        )

    return ds.groupby("user_id").map_groups(_cross, batch_format="pyarrow")


def sql_track_crossings() -> str:
    return f"""
    WITH pts AS ({SQL_EVENT_PTS}),
    rk AS (
      SELECT user_id, lon, lat,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM pts
    ),
    seg AS (
      SELECT user_id, rn, lon AS x1, lat AS y1,
             lead(lon) OVER w AS x2, lead(lat) OVER w AS y2
      FROM rk WINDOW w AS (PARTITION BY user_id ORDER BY rn)
    ),
    pr AS (
      SELECT a.user_id,
             (a.x2-a.x1)*(b.y1-a.y1) - (a.y2-a.y1)*(b.x1-a.x1) AS d1,
             (a.x2-a.x1)*(b.y2-a.y1) - (a.y2-a.y1)*(b.x2-a.x1) AS d2,
             (b.x2-b.x1)*(a.y1-b.y1) - (b.y2-b.y1)*(a.x1-b.x1) AS d3,
             (b.x2-b.x1)*(a.y2-b.y1) - (b.y2-b.y1)*(a.x2-b.x1) AS d4
      FROM seg a JOIN seg b
        ON a.user_id = b.user_id AND b.rn >= a.rn + 2
       AND a.x2 IS NOT NULL AND b.x2 IS NOT NULL
    ),
    cnt AS (
      SELECT user_id,
             CAST(SUM(CASE WHEN d1*d2 < 0 AND d3*d4 < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_cross
      FROM pr GROUP BY user_id
    )
    SELECT u.user_id, COALESCE(c.n_cross, 0) AS n_cross
    FROM (SELECT DISTINCT user_id FROM pts) u LEFT JOIN cnt c USING (user_id)
    """


def q_polygon_area(sf_dir: str):
    """Planar shoelace area + vertex centroid per nation polygon (the
    vector-geometry scalar kernel family; exact ±*/ arithmetic in both
    engines). Tiny input — the point is the oracled kernel, reused by
    any geofence-sizing stage."""
    import ray.data as rd

    polys = _nation_polygons(sf_dir)

    def _area(b: pa.Table) -> pa.Table:
        keys = np.asarray(b["n_nationkey"], dtype=np.int64)
        area, cx, cy = [], [], []
        for k in keys:
            v = polys[int(k)]
            x1, y1 = v[:, 0], v[:, 1]
            x2, y2 = np.roll(v[:, 0], -1), np.roll(v[:, 1], -1)
            area.append(np.sum(x1 * y2 - x2 * y1) / 2.0)
            cx.append(np.sum(x1) / len(x1))
            cy.append(np.sum(y1) / len(y1))
        return pa.table(
            {
                "poly": pa.array(keys, pa.int64()),
                "area": pa.array(r6(np.asarray(area)), pa.float64()),
                "cx": pa.array(r6(np.asarray(cx)), pa.float64()),
                "cy": pa.array(r6(np.asarray(cy)), pa.float64()),
            }
        )

    ds = rd.read_parquet(_pq(sf_dir, "nation"), columns=["n_nationkey"])
    return ds.map_batches(_area, batch_format="pyarrow")


def sql_polygon_area(sf_dir: str = "/root/testdata/sf0.001") -> str:
    polys = _nation_polygons(sf_dir)
    rows = []
    for k, verts in polys.items():
        x2 = np.roll(verts[:, 0], -1)
        y2 = np.roll(verts[:, 1], -1)
        for (vx, vy), ex, ey in zip(verts, x2, y2):
            # explicit DOUBLE: bare decimal literals parse as DECIMAL and
            # the shoelace product overflows DECIMAL(38)
            rows.append(
                f"({k}, CAST({vx!r} AS DOUBLE), CAST({vy!r} AS DOUBLE), "
                f"CAST({ex!r} AS DOUBLE), CAST({ey!r} AS DOUBLE))"
            )
    edges = ", ".join(rows)
    return f"""
    WITH edges(poly, x1, y1, x2, y2) AS (VALUES {edges})
    SELECT poly,
           floor((SUM(x1*y2 - x2*y1)/2.0)*1e6 + 0.5)/1e6 AS area,
           floor((SUM(x1)/COUNT(*))*1e6 + 0.5)/1e6 AS cx,
           floor((SUM(y1)/COUNT(*))*1e6 + 0.5)/1e6 AS cy
    FROM edges GROUP BY poly
    """


Z_COVER = 6


def q_cover_cells(sf_dir: str):
    """Cell covering: each region box expanded to its covering slippy
    cells at z=6 (the S2/H3 ``coverer`` analogue — the cover is what a
    spatial join broadcasts instead of raw geometry). flat_map shape:
    one small input row fans out to its cover cells; integer-exact."""
    import ray.data as rd

    ds = rd.read_parquet(_pq(sf_dir, "region"), columns=["r_regionkey"])
    n = 1 << Z_COVER

    def _lat_y(lat: float) -> int:
        # same formula as SQL_SLIPPY, scalar (region count is tiny)
        lat_r = np.radians(lat)
        return int(np.floor((1.0 - np.log(np.tan(lat_r) + 1.0 / np.cos(lat_r)) / np.pi) / 2.0 * n))

    def _cover(b: pa.Table) -> pa.Table:
        rkey = np.asarray(b["r_regionkey"], dtype=np.int64)
        o_r, o_x, o_y = [], [], []
        for k in rkey:
            lon_w = float(k * 60 - 170)
            lon_e = lon_w + 55.0
            lat_s = float(k * 25 - 70)
            lat_n = lat_s + 48.0
            x0 = int(np.floor((lon_w + 180.0) / 360.0 * n))
            x1 = int(np.floor((lon_e + 180.0) / 360.0 * n))
            # slippy y grows southward: north edge gives the smaller y
            y0 = _lat_y(lat_n)
            y1 = _lat_y(lat_s)
            xs = np.arange(x0, x1 + 1, dtype=np.int64)
            ys = np.arange(y0, y1 + 1, dtype=np.int64)
            gx, gy = np.meshgrid(xs, ys)
            o_r.append(np.full(gx.size, k, dtype=np.int64))
            o_x.append(gx.ravel())
            o_y.append(gy.ravel())
        return pa.table(
            {
                "region": pa.array(np.concatenate(o_r), pa.int64()),
                "x": pa.array(np.concatenate(o_x), pa.int64()),
                "y": pa.array(np.concatenate(o_y), pa.int64()),
            }
        )

    return ds.map_batches(_cover, batch_format="pyarrow")


def sql_cover_cells() -> str:
    n = float(1 << Z_COVER)
    y_of = (
        lambda lat: f"CAST(floor((1.0 - ln(tan(radians({lat})) + 1.0/cos(radians({lat})))/pi())/2.0*{n}) AS BIGINT)"
    )
    return f"""
    WITH boxes AS (
      SELECT r_regionkey AS region,
             CAST(r_regionkey*60 - 170 AS DOUBLE) AS lon_w,
             CAST(r_regionkey*60 - 170 AS DOUBLE) + 55.0 AS lon_e,
             CAST(r_regionkey*25 - 70 AS DOUBLE) AS lat_s,
             CAST(r_regionkey*25 - 70 AS DOUBLE) + 48.0 AS lat_n
      FROM region
    ),
    rng AS (
      SELECT region,
             CAST(floor((lon_w + 180.0)/360.0*{n}) AS BIGINT) AS x0,
             CAST(floor((lon_e + 180.0)/360.0*{n}) AS BIGINT) AS x1,
             {y_of('lat_n')} AS y0,
             {y_of('lat_s')} AS y1
      FROM boxes
    )
    SELECT region, xs.x, ys.y
    FROM rng,
         LATERAL (SELECT unnest(generate_series(x0, x1)) AS x) xs,
         LATERAL (SELECT unnest(generate_series(y0, y1)) AS y) ys
    """


Z_COMPACT = 6  # compaction leaf zoom (89% occupied at sf0.01 — real promotions)
Z_COMPACT_FLOOR = 3  # promotions stop here; a whole-floor subtree emits the floor cell


def q_compact_cells(sf_dir: str):
    """Mixed-resolution cell compaction: the minimal multi-zoom cover of
    the occupied z=6 cells — every complete 4-sibling quad is replaced by
    its parent, recursively down to z=3 (H3 ``compact_cells`` / the
    reference's zoom-compaction walk, ``fragment.rs:35-47``, generalized
    from the fixed-level roll-up of ``q_tile_rollup`` to the true
    minimal cover).

    Distributed shape: promotions never cross a floor-ancestor boundary
    (a parent's 4 children share every coarser ancestor), so ONE
    groupby on the z=3 ancestor makes each subtree's full multi-level
    compaction local — group size is bounded by 4**(Z_COMPACT -
    Z_COMPACT_FLOOR) = 64 distinct leaves regardless of input size, and
    the shuffle moves only per-batch-distinct cell rows (combiner
    pre-pass), never events."""
    import pandas as pd
    import ray.data as rd

    ds = rd.read_parquet(_pq(sf_dir, "events"), columns=["event_id"])
    steps = Z_COMPACT - Z_COMPACT_FLOOR

    def _leaves(b: pa.Table) -> pa.Table:
        lon, lat = event_lonlat(np.asarray(b["event_id"]))
        x, y = _slippy_xy(lon, lat, Z_COMPACT)
        key = np.unique((x << np.int64(32)) | y)
        x = key >> np.int64(32)
        y = key & np.int64(0xFFFFFFFF)
        return pa.table(
            {
                "anchor": pa.array(
                    ((x >> steps) << np.int64(32)) | (y >> steps), pa.int64()
                ),
                "x": pa.array(x, pa.int64()),
                "y": pa.array(y, pa.int64()),
            }
        )

    def _compact(g: pd.DataFrame) -> pd.DataFrame:
        # one z=3 subtree: ≤ 4**steps distinct leaves after dedup
        from ..cells import compact_xy

        z, x, y = compact_xy(
            g["x"].to_numpy(np.int64),
            g["y"].to_numpy(np.int64),
            Z_COMPACT,
            Z_COMPACT_FLOOR,
        )
        return pd.DataFrame({"zoom": z, "x": x, "y": y})

    return (
        ds.map_batches(_leaves, batch_format="pyarrow")
        .groupby("anchor")
        .map_groups(_compact, batch_format="pandas")
    )


def sql_compact_cells() -> str:
    x, y = SQL_SLIPPY(Z_COMPACT)
    parts = [
        f"WITH pts AS ({SQL_EVENT_PTS}), "
        f"l{Z_COMPACT} AS (SELECT DISTINCT {x} AS x, {y} AS y FROM pts)"
    ]
    finals = []
    for z in range(Z_COMPACT, Z_COMPACT_FLOOR, -1):
        p = z - 1
        parts.append(
            f", p{p} AS (SELECT CAST(floor(x/2.0) AS BIGINT) AS x,"
            f" CAST(floor(y/2.0) AS BIGINT) AS y FROM l{z}"
            f" GROUP BY 1, 2 HAVING COUNT(*) = 4)"
        )
        parts.append(
            f", f{z} AS (SELECT {z} AS zoom, a.x, a.y FROM l{z} a"
            f" ANTI JOIN p{p} b ON CAST(floor(a.x/2.0) AS BIGINT) = b.x"
            f" AND CAST(floor(a.y/2.0) AS BIGINT) = b.y)"
        )
        parts.append(f", l{p} AS (SELECT x, y FROM p{p})")
        finals.append(f"SELECT zoom, x, y FROM f{z}")
    finals.append(f"SELECT {Z_COMPACT_FLOOR} AS zoom, x, y FROM l{Z_COMPACT_FLOOR}")
    return " ".join(parts) + " " + " UNION ALL ".join(finals)


def q_uncompact_cells(sf_dir: str):
    """Uncompaction: the mixed-zoom compact cover fanned back out to its
    z=6 leaf set (H3 ``uncompact_cells``). flat_map shape — each cover
    cell expands to 4**(6-zoom) children locally, no shuffle after the
    compact's own; by compact/uncompact duality the result is EXACTLY the
    distinct occupied leaf set, which is what the oracle checks."""
    cover = q_compact_cells(sf_dir)

    def _expand(b: pa.Table) -> pa.Table:
        z = b["zoom"].to_numpy(zero_copy_only=False)
        x = b["x"].to_numpy(zero_copy_only=False)
        y = b["y"].to_numpy(zero_copy_only=False)
        s = (Z_COMPACT - z).astype(np.int64)
        n = (np.int64(1) << s).astype(np.int64)
        reps = (n * n).astype(np.int64)
        rows = np.repeat(np.arange(z.size, dtype=np.int64), reps)
        # per-cell local (dx, dy) ranks inside each expanded block
        offs = np.concatenate([np.zeros(1, np.int64), np.cumsum(reps)[:-1]])
        rank = np.arange(rows.size, dtype=np.int64) - offs[rows]
        side = n[rows]
        out_x = (x[rows] << s[rows]) + rank // side
        out_y = (y[rows] << s[rows]) + rank % side
        return pa.table(
            {
                "x": pa.array(out_x, pa.int64()),
                "y": pa.array(out_y, pa.int64()),
            }
        )

    return cover.map_batches(_expand, batch_format="pyarrow")


def sql_uncompact_cells() -> str:
    x, y = SQL_SLIPPY(Z_COMPACT)
    return f"WITH pts AS ({SQL_EVENT_PTS}) SELECT DISTINCT {x} AS x, {y} AS y FROM pts"


HEAVY_THETA = 0.02  # frequent-item threshold (k = 50 counters)


def _heavy_items_of(b: pa.Table) -> np.ndarray:
    """Geometric-skew item stream derived from hashed event ids: the item
    is the trailing-zero count of the md5-u64 hash (P(item=i) = 2^-(i+1)),
    integer-exact in both engines via log2 of the isolated low bit — the
    HLL rho observable reused as a skewed domain."""
    from ..sketch import md5_u64

    h = md5_u64([str(e) for e in b["event_id"].to_pylist()])
    low = h & ((~h) + np.uint64(1))
    item = np.where(
        h == 0, np.int64(64),
        np.log2(np.maximum(low, np.uint64(1)).astype(np.float64)).astype(np.int64),
    )
    return item.astype(np.int64)


def q_heavy_items(sf_dir: str):
    """EXACT heavy hitters (count ≥ 2% of N) over a skewed item stream —
    the Misra-Gries prefilter + exact-recount two-pass
    (:func:`routers_ray.sketch.heavy_hitters`): bounded per-batch
    summaries, ≤ k candidate keys on the driver, one broadcast recount.
    The shape that replaces a full value-domain groupby at 10^12 rows;
    the final table is exact, so the SQL oracle is a plain
    GROUP BY ... HAVING."""
    import ray.data as rd

    from ..sketch import heavy_hitters

    ds = rd.read_parquet(_pq(sf_dir, "events"), columns=["event_id"])
    return heavy_hitters(ds, _heavy_items_of, HEAVY_THETA)


def sql_heavy_items() -> str:
    return f"""
    WITH h AS (
      SELECT md5_number_upper(CAST(event_id AS VARCHAR)) AS hv FROM events
    ),
    items AS (
      SELECT CASE WHEN hv = 0 THEN 64
             ELSE CAST(log2(CAST(greatest(hv & ((~hv) + 1), 1) AS DOUBLE)) AS BIGINT)
             END AS item
      FROM h
    )
    SELECT item, CAST(COUNT(*) AS BIGINT) AS n
    FROM items GROUP BY item
    HAVING COUNT(*) >= {HEAVY_THETA} * (SELECT COUNT(*) FROM items)
    """


def q_cms_users(sf_dir: str):
    """Count-Min sketch of per-user event counts (depth 4 × width 1024):
    per-batch unique-key combiner → bounded counter partials → one tiny
    ``groupby(j, col).sum`` — the heavy-hitter / frequency-estimate
    shape for 10^12 rows. Counters merge by addition (partitioning-
    invariant); the table is exactly oracled (depth-prefixed md5 column
    hash), the point-query bound pytest-checked."""
    import ray.data as rd

    from ..sketch import cms_sketch

    ds = rd.read_parquet(_pq(sf_dir, "events"), columns=["user_id"])
    return cms_sketch(ds, lambda b: [str(u) for u in b["user_id"].to_pylist()])


def sql_cms_users() -> str:
    return """
    WITH k AS (SELECT CAST(user_id AS VARCHAR) AS key, COUNT(*) AS n FROM events GROUP BY 1),
    d AS (SELECT unnest(generate_series(0, 3)) AS j)
    SELECT j,
           CAST(md5_number_upper(CAST(j AS VARCHAR) || ':' || key) % 1024 AS BIGINT) AS col,
           CAST(SUM(n) AS BIGINT) AS n
    FROM k CROSS JOIN d GROUP BY 1, 2
    """


def q_pip_region(sf_dir: str):
    """Point-in-polygon (rectangle) join: events counted per region box —
    broadcast ranges + vectorized mask (no shuffle)."""
    import ray.data as rd

    rkey, lon_w, lon_e, lat_s, lat_n = _region_boxes(sf_dir)

    ds = rd.read_parquet(_pq(sf_dir, "events"), columns=["event_id"])

    def _pip(b: pa.Table) -> pa.Table:
        lon, lat = event_lonlat(np.asarray(b["event_id"]))
        inside = (
            (lon[:, None] >= lon_w[None, :])
            & (lon[:, None] < lon_e[None, :])
            & (lat[:, None] >= lat_s[None, :])
            & (lat[:, None] < lat_n[None, :])
        )
        counts = inside.sum(axis=0).astype(np.int64)
        keep = counts > 0
        return pa.table(
            {"region": pa.array(rkey[keep], pa.int64()), "n": pa.array(counts[keep], pa.int64())}
        )

    partial = ds.map_batches(_pip, batch_format="pyarrow")
    out = partial.groupby("region").sum("n")
    return out.map_batches(lambda t: t.rename_columns(["region", "n"]), batch_format="pyarrow")


def sql_pip_region() -> str:
    return f"""
    WITH pts AS ({SQL_EVENT_PTS}),
    boxes AS (
      SELECT r_regionkey AS region,
             CAST(r_regionkey*60 - 170 AS DOUBLE) AS lon_w,
             CAST(r_regionkey*60 - 170 AS DOUBLE) + 55.0 AS lon_e,
             CAST(r_regionkey*25 - 70 AS DOUBLE) AS lat_s,
             CAST(r_regionkey*25 - 70 AS DOUBLE) + 48.0 AS lat_n
      FROM region
    )
    SELECT b.region, COUNT(*) AS n
    FROM pts p JOIN boxes b
      ON p.lon >= b.lon_w AND p.lon < b.lon_e AND p.lat >= b.lat_s AND p.lat < b.lat_n
    GROUP BY b.region
    """


def _nation_polygons(sf_dir: str) -> dict[int, np.ndarray]:
    """Deterministic simple (non-self-intersecting, concave, no
    horizontal edge) heptagon per nation — integer-arithmetic vertices
    so both engines hold bit-identical doubles. The 0.0005 offset keeps
    the 3-decimal event grid off every vertex/edge lattice point."""
    nation = papq.read_table(_pq(sf_dir, "nation"), columns=["n_nationkey"])
    nkey = np.sort(np.asarray(nation["n_nationkey"], dtype=np.int64))
    base = np.array(
        [(0, -8), (2, -7), (7, -3), (5, 6), (0, 9), (-6, 5), (-7, -4)], dtype=np.float64
    )
    polys = {}
    for k in nkey:
        s = float(1 + k % 3)
        cx = float(k * 14 - 168) + 0.0005
        cy = float((k * 6) % 140 - 70) + 0.0005
        polys[int(k)] = np.column_stack((cx + base[:, 0] * s, cy + base[:, 1] * s))
    return polys


def _pip_even_odd(lon: np.ndarray, lat: np.ndarray, verts: np.ndarray) -> np.ndarray:
    """Vectorized even-odd (crossing-number) containment — the formula is
    textually identical to the SQL join predicate so the parity decision
    is bit-exact in both engines (pure IEEE +,-,*,/ — no transcendentals)."""
    inside = np.zeros(len(lon), dtype=np.int64)
    x1s, y1s = verts[:, 0], verts[:, 1]
    x2s, y2s = np.roll(verts[:, 0], -1), np.roll(verts[:, 1], -1)
    for x1, y1, x2, y2 in zip(x1s, y1s, x2s, y2s):
        crosses = (y1 > lat) != (y2 > lat)
        # horizontal edges (y1 == y2) divide by zero but can never
        # satisfy `crosses`; silence the spurious warning — the inf/nan
        # never reaches the parity decision
        with np.errstate(divide="ignore", invalid="ignore"):
            xs = (x2 - x1) * (lat - y1) / (y2 - y1) + x1
        inside += (crosses & (lon < xs)).astype(np.int64)
    return (inside % 2) == 1


def q_pip_polygon(sf_dir: str):
    """Point-in-POLYGON join (even-odd ray casting): events counted per
    nation heptagon — broadcast polygon list, per-batch envelope
    prefilter (the cell/R-tree stand-in) then the exact crossing test,
    partial counts → one small groupby. Reference: the tz polygon
    backends' R-tree + containment (``libs/routers_tz``, SURVEY §2.2)."""
    import ray.data as rd

    polys = _nation_polygons(sf_dir)
    boxes = {k: (v[:, 0].min(), v[:, 0].max(), v[:, 1].min(), v[:, 1].max()) for k, v in polys.items()}

    ds = rd.read_parquet(_pq(sf_dir, "events"), columns=["event_id"])

    def _pip(b: pa.Table) -> pa.Table:
        lon, lat = event_lonlat(np.asarray(b["event_id"]))
        keys, counts = [], []
        for k, verts in polys.items():
            w, e, s, n = boxes[k]
            env = (lon >= w) & (lon <= e) & (lat >= s) & (lat <= n)
            if not env.any():
                continue
            m = int(_pip_even_odd(lon[env], lat[env], verts).sum())
            if m:
                keys.append(k)
                counts.append(m)
        return pa.table(
            {
                "poly": pa.array(np.asarray(keys, dtype=np.int64), pa.int64()),
                "n": pa.array(np.asarray(counts, dtype=np.int64), pa.int64()),
            }
        )

    out = ds.map_batches(_pip, batch_format="pyarrow").groupby("poly").sum("n")
    return out.map_batches(lambda t: t.rename_columns(["poly", "n"]), batch_format="pyarrow")


def sql_pip_polygon(sf_dir: str = "/root/testdata/sf0.001") -> str:
    polys = _nation_polygons(sf_dir)
    rows = []
    for k, verts in polys.items():
        x2 = np.roll(verts[:, 0], -1)
        y2 = np.roll(verts[:, 1], -1)
        for (vx, vy), ex, ey in zip(verts, x2, y2):
            rows.append(f"({k}, {vx!r}, {vy!r}, {ex!r}, {ey!r})")
    edges = ", ".join(rows)
    return f"""
    WITH pts AS ({SQL_EVENT_PTS}),
    edges(poly, x1, y1, x2, y2) AS (VALUES {edges}),
    hits AS (
      SELECT p.event_id, e.poly
      FROM pts p JOIN edges e
        ON ((e.y1 > p.lat) != (e.y2 > p.lat))
       AND (p.lon < (e.x2 - e.x1) * (p.lat - e.y1) / (e.y2 - e.y1) + e.x1)
      GROUP BY p.event_id, e.poly
      HAVING COUNT(*) % 2 = 1
    )
    SELECT poly, COUNT(*) AS n FROM hits GROUP BY poly
    """


def extent_boxes_of(lon: np.ndarray, lat: np.ndarray, z: int) -> pa.Table:
    """Per-batch partial extent boxes at zoom z (shared by the registry
    query and the generic trackops stage)."""
    if lon.size == 0:
        e64, ef = pa.array([], pa.int64()), pa.array([], pa.float64())
        return pa.table({"x": e64, "y": e64, "min_lon": ef, "max_lon": ef,
                         "min_lat": ef, "max_lat": ef, "n": e64})
    x, y = _slippy_xy(lon, lat, z)
    key = (x.astype(np.int64) << np.int64(32)) | y.astype(np.int64)
    order = np.argsort(key, kind="stable")
    k = key[order]
    starts = np.flatnonzero(np.r_[True, k[1:] != k[:-1]])
    ends = np.r_[starts[1:], k.size]
    lo, la = lon[order], lat[order]
    return pa.table(
        {
            "x": pa.array(k[starts] >> np.int64(32), pa.int64()),
            "y": pa.array(k[starts] & np.int64(0xFFFFFFFF), pa.int64()),
            "min_lon": pa.array(np.minimum.reduceat(lo, starts), pa.float64()),
            "max_lon": pa.array(np.maximum.reduceat(lo, starts), pa.float64()),
            "min_lat": pa.array(np.minimum.reduceat(la, starts), pa.float64()),
            "max_lat": pa.array(np.maximum.reduceat(la, starts), pa.float64()),
            "n": pa.array((ends - starts).astype(np.int64), pa.int64()),
        }
    )


def transition_partials_of(lon: np.ndarray, lat: np.ndarray, z: int) -> pa.Table:
    """Ordered track points → partial (src, dst) hop counts at zoom z,
    self-loops excluded (shared by the registry query and trackops)."""
    x, y = _slippy_xy(lon, lat, z)
    cell = (x << np.int64(32)) | y
    src, dst = cell[:-1], cell[1:]
    keep = src != dst
    pairs = np.stack([src[keep], dst[keep]], axis=1)
    if pairs.size == 0:
        e = pa.array([], pa.int64())
        return pa.table({"src_x": e, "src_y": e, "dst_x": e, "dst_y": e, "n": e})
    uniq, counts = np.unique(pairs, axis=0, return_counts=True)
    return pa.table(
        {
            "src_x": pa.array(uniq[:, 0] >> np.int64(32), pa.int64()),
            "src_y": pa.array(uniq[:, 0] & np.int64(0xFFFFFFFF), pa.int64()),
            "dst_x": pa.array(uniq[:, 1] >> np.int64(32), pa.int64()),
            "dst_y": pa.array(uniq[:, 1] & np.int64(0xFFFFFFFF), pa.int64()),
            "n": pa.array(counts.astype(np.int64), pa.int64()),
        }
    )


def q_cell_transitions(sf_dir: str):
    """Cell-transition (flow-map) matrix: consecutive-hop counts between
    z4 tiles over each user's ordered track — od_flows' endpoint view
    generalized to every hop. One ``groupby(user_id)`` orders the track
    and emits per-user partial transition counts; a tiny
    ``groupby((src,dst)).sum`` finishes (self-loops excluded — the
    within-cell dwell case is q_dwell_polygon's job)."""
    import ray.data as rd

    ds = rd.read_parquet(_pq(sf_dir, "events"), columns=["event_id", "user_id", "ts"])

    def _hops(g: pa.Table) -> pa.Table:
        eid = g["event_id"].to_numpy(zero_copy_only=False)
        ts = g["ts"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts))
        lon, lat = event_lonlat(eid[order])
        return transition_partials_of(lon, lat, Z_EXTENT)

    out = (
        ds.groupby("user_id")
        .map_groups(_hops, batch_format="pyarrow")
        .groupby(["src_x", "src_y", "dst_x", "dst_y"])
        .sum("n")
    )
    return out.map_batches(
        lambda t: t.rename_columns(["src_x", "src_y", "dst_x", "dst_y", "n"]),
        batch_format="pyarrow",
    )


def sql_cell_transitions() -> str:
    x, y = SQL_SLIPPY(Z_EXTENT)
    return f"""
    WITH pts AS ({SQL_EVENT_PTS}),
    cells AS (
      SELECT user_id, ts, event_id, {x} AS cx, {y} AS cy FROM pts
    ),
    hops AS (
      SELECT user_id, cx AS dst_x, cy AS dst_y,
             lag(cx) OVER w AS src_x, lag(cy) OVER w AS src_y
      FROM cells WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT src_x, src_y, dst_x, dst_y, CAST(COUNT(*) AS BIGINT) AS n
    FROM hops
    WHERE src_x IS NOT NULL AND (src_x != dst_x OR src_y != dst_y)
    GROUP BY src_x, src_y, dst_x, dst_y
    """


def q_extent_cells(sf_dir: str):
    """Per-cell extent aggregate (the ST_Extent analogue): bounding box +
    point count per z4 tile. Min/max are pure selection (no arithmetic),
    so the oracle is bit-exact; per-batch partial boxes mean the exchange
    moves one row per (batch, cell)."""
    import ray.data as rd
    from ray.data.aggregate import Max, Min, Sum

    ds = rd.read_parquet(_pq(sf_dir, "events"), columns=["event_id"])

    def _boxes(b: pa.Table) -> pa.Table:
        lon, lat = event_lonlat(np.asarray(b["event_id"]))
        return extent_boxes_of(lon, lat, Z_EXTENT)

    agg = (
        ds.map_batches(_boxes, batch_format="pyarrow")
        .groupby(["x", "y"])
        .aggregate(
            Min("min_lon"), Max("max_lon"), Min("min_lat"), Max("max_lat"), Sum("n"),
        )
    )
    return agg.map_batches(
        lambda t: t.rename_columns(
            ["x", "y", "min_lon", "max_lon", "min_lat", "max_lat", "n"]
        ),
        batch_format="pyarrow",
    )


def sql_extent_cells() -> str:
    x, y = SQL_SLIPPY(Z_EXTENT)
    return f"""
    WITH pts AS ({SQL_EVENT_PTS})
    SELECT {x} AS x, {y} AS y,
           MIN(lon) AS min_lon, MAX(lon) AS max_lon,
           MIN(lat) AS min_lat, MAX(lat) AS max_lat,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM pts GROUP BY 1, 2
    """


def q_dwell_polygon(sf_dir: str):
    """Geofence dwell time: per (user, nation polygon), the total time and
    hop count spent on track segments whose BOTH endpoints are inside the
    polygon (even-odd containment; integer-microsecond sums — exact in
    both engines). The PIP + sessionize composition every geofence
    analytics stage needs; polygons broadcast, one ``groupby(user_id)``
    moves the points once for all 25 fences."""
    import ray.data as rd

    polys = _nation_polygons(sf_dir)
    boxes = {k: (v[:, 0].min(), v[:, 0].max(), v[:, 1].min(), v[:, 1].max()) for k, v in polys.items()}

    ds = rd.read_parquet(_pq(sf_dir, "events"), columns=["event_id", "user_id", "ts"])

    def _dwell(g: pa.Table) -> pa.Table:
        eid = g["event_id"].to_numpy(zero_copy_only=False)
        ts = g["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").view(np.int64)
        order = np.lexsort((eid, ts))
        ts = ts[order]
        lon, lat = event_lonlat(eid[order])
        dt = ts[1:] - ts[:-1]
        uid, polz, npairs, dwell = [], [], [], []
        u = int(np.asarray(g["user_id"], dtype=np.int64)[0])
        for k, verts in polys.items():
            w, e, s, n = boxes[k]
            env = (lon >= w) & (lon <= e) & (lat >= s) & (lat <= n)
            if not env.any():
                continue
            ins = np.zeros(lon.size, dtype=bool)
            ins[env] = _pip_even_odd(lon[env], lat[env], verts)
            both = ins[:-1] & ins[1:]
            c = int(both.sum())
            if c:
                uid.append(u), polz.append(k)
                npairs.append(c), dwell.append(int(dt[both].sum()))
        return pa.table(
            {
                "user_id": pa.array(uid, pa.int64()),
                "poly": pa.array(polz, pa.int64()),
                "n_pairs": pa.array(npairs, pa.int64()),
                "dwell_us": pa.array(dwell, pa.int64()),
            }
        )

    return ds.groupby("user_id").map_groups(_dwell, batch_format="pyarrow")


def sql_dwell_polygon(sf_dir: str = "/root/testdata/sf0.001") -> str:
    polys = _nation_polygons(sf_dir)
    rows = []
    for k, verts in polys.items():
        x2 = np.roll(verts[:, 0], -1)
        y2 = np.roll(verts[:, 1], -1)
        for (vx, vy), ex, ey in zip(verts, x2, y2):
            rows.append(f"({k}, {vx!r}, {vy!r}, {ex!r}, {ey!r})")
    edges = ", ".join(rows)
    return f"""
    WITH pts AS ({SQL_EVENT_PTS}),
    edges(poly, x1, y1, x2, y2) AS (VALUES {edges}),
    ins AS (
      SELECT p.event_id, e.poly
      FROM pts p JOIN edges e
        ON ((e.y1 > p.lat) != (e.y2 > p.lat))
       AND (p.lon < (e.x2 - e.x1) * (p.lat - e.y1) / (e.y2 - e.y1) + e.x1)
      GROUP BY p.event_id, e.poly
      HAVING COUNT(*) % 2 = 1
    ),
    seq AS (
      SELECT p.user_id, p.ts, p.event_id, pl.poly,
             CASE WHEN i.event_id IS NOT NULL THEN 1 ELSE 0 END AS inside
      FROM pts p
      CROSS JOIN (SELECT DISTINCT poly FROM edges) pl
      LEFT JOIN ins i ON i.event_id = p.event_id AND i.poly = pl.poly
    ),
    w AS (
      SELECT user_id, poly, inside,
             lag(inside) OVER w2 AS pinside,
             epoch_us(ts) - lag(epoch_us(ts)) OVER w2 AS dt
      FROM seq WINDOW w2 AS (PARTITION BY user_id, poly ORDER BY ts, event_id)
    )
    SELECT user_id, poly,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(dt) AS BIGINT) AS dwell_us
    FROM w WHERE inside = 1 AND pinside = 1
    GROUP BY user_id, poly
    """


def q_cluster_cells(sf_dir: str):
    """Cell-grouped clustering: cells (z10) holding ≥3 points become a
    cluster row with exact-integer centroid sums — the reference's
    geohash-grouped DBSCAN shape (``routers_geo/src/cluster.rs:100-130``)."""
    import ray.data as rd

    ds = rd.read_parquet(_pq(sf_dir, "events"), columns=["event_id"])

    def _cells(b: pa.Table) -> pa.Table:
        lon, lat = event_lonlat(np.asarray(b["event_id"]))
        x, y = _slippy_xy(lon, lat, Z_CLUSTER)
        return pa.table(
            {
                "cx": pa.array(x, pa.int64()),
                "cy": pa.array(y, pa.int64()),
                "n": pa.array(np.ones(lon.size, dtype=np.int64), pa.int64()),
                "sum_lon_e3": pa.array(np.floor(lon * 1000 + 0.5).astype(np.int64), pa.int64()),
                "sum_lat_e3": pa.array(np.floor(lat * 1000 + 0.5).astype(np.int64), pa.int64()),
            }
        )

    cells = ds.map_batches(_cells, batch_format="pyarrow")
    agg = cells.groupby(["cx", "cy"]).sum(["n", "sum_lon_e3", "sum_lat_e3"])

    def _final(t: pa.Table) -> pa.Table:
        t = t.rename_columns(["cx", "cy", "n", "sum_lon_e3", "sum_lat_e3"])
        return t.filter(pc.greater_equal(t["n"], 3))

    out = agg.map_batches(_final, batch_format="pyarrow")
    # materialize driver-side with the schema pinned: an all-filtered result
    # must still present its columns to the comparator
    schema = pa.schema(
        [("cx", pa.int64()), ("cy", pa.int64()), ("n", pa.int64()),
         ("sum_lon_e3", pa.int64()), ("sum_lat_e3", pa.int64())]
    )
    tables = [
        b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        for b in out.iter_batches(batch_format="pyarrow")
    ]
    tables = [t.select(schema.names).cast(schema) for t in tables if t.num_rows]
    return pa.concat_tables(tables) if tables else schema.empty_table()


def sql_cluster_cells() -> str:
    x, y = SQL_SLIPPY(Z_CLUSTER)
    return f"""
    WITH pts AS ({SQL_EVENT_PTS}),
    cells AS (
      SELECT {x} AS cx, {y} AS cy,
             CAST(floor(lon*1000 + 0.5) AS BIGINT) AS lon_e3,
             CAST(floor(lat*1000 + 0.5) AS BIGINT) AS lat_e3
      FROM pts
    )
    SELECT cx, cy, COUNT(*) AS n,
           CAST(SUM(lon_e3) AS BIGINT) AS sum_lon_e3,
           CAST(SUM(lat_e3) AS BIGINT) AS sum_lat_e3
    FROM cells GROUP BY cx, cy HAVING COUNT(*) >= 3
    """


# ---------------------------------------------------------------------------
# relational / streaming-shaped


def q_agg_pricing(sf_dir: str):
    """TPC-H-Q1-shaped grouped aggregate with per-batch partial aggregation
    (combine-before-shuffle) and exact integer money sums."""
    import ray.data as rd

    ds = rd.read_parquet(
        _pq(sf_dir, "lineitem"),
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def _partial(b: pa.Table) -> pa.Table:
        import pandas as pd

        qty = np.floor(np.asarray(b["l_quantity"], dtype=np.float64) * 100 + 0.5).astype(np.int64)
        base = np.floor(np.asarray(b["l_extendedprice"], dtype=np.float64) * 100 + 0.5).astype(np.int64)
        disc = np.floor(
            np.asarray(b["l_extendedprice"], dtype=np.float64)
            * (1.0 - np.asarray(b["l_discount"], dtype=np.float64))
            * 10000
            + 0.5
        ).astype(np.int64)
        df = pd.DataFrame(
            {
                "l_returnflag": b["l_returnflag"].to_pylist(),
                "l_linestatus": b["l_linestatus"].to_pylist(),
                "sum_qty_c": qty,
                "sum_base_c": base,
                "sum_disc_e4": disc,
                "n": np.ones(len(b), dtype=np.int64),
            }
        )
        g = df.groupby(["l_returnflag", "l_linestatus"], as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    partial = ds.map_batches(_partial, batch_format="pyarrow")
    out = partial.groupby(["l_returnflag", "l_linestatus"]).sum(
        ["sum_qty_c", "sum_base_c", "sum_disc_e4", "n"]
    )
    return out.map_batches(
        lambda t: t.rename_columns(
            ["l_returnflag", "l_linestatus", "sum_qty_c", "sum_base_c", "sum_disc_e4", "n"]
        ),
        batch_format="pyarrow",
    )


def sql_agg_pricing() -> str:
    return """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(floor(l_quantity*100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_qty_c,
           CAST(SUM(CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_base_c,
           CAST(SUM(CAST(floor(l_extendedprice*(1.0 - l_discount)*10000 + 0.5) AS BIGINT)) AS BIGINT) AS sum_disc_e4,
           COUNT(*) AS n
    FROM lineitem GROUP BY l_returnflag, l_linestatus
    """


def q_top_customers(sf_dir: str):
    """Join + top-k: orders joined to customers (broadcast small side),
    top 10 by exact-integer revenue, ties to lowest key."""
    import pandas as pd
    import ray.data as rd

    cust = papq.read_table(_pq(sf_dir, "customer"), columns=["c_custkey", "c_name"])
    name_of = dict(zip(cust["c_custkey"].to_pylist(), cust["c_name"].to_pylist()))

    ds = rd.read_parquet(_pq(sf_dir, "orders"), columns=["o_custkey", "o_totalprice"])

    def _partial(b: pa.Table) -> pa.Table:
        import pandas as pd

        cents = np.floor(np.asarray(b["o_totalprice"], dtype=np.float64) * 100 + 0.5).astype(np.int64)
        df = pd.DataFrame({"c_custkey": np.asarray(b["o_custkey"], dtype=np.int64), "revenue_c": cents})
        g = df.groupby("c_custkey", as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    partial = ds.map_batches(_partial, batch_format="pyarrow")
    agg = partial.groupby("c_custkey").sum("revenue_c")

    # Distributed top-k finish: post-groupby blocks hold disjoint customers
    # with final revenue, so per-block top-10 then a blocks×10-row driver
    # merge is exact — no full-cardinality gather.
    def _block_top(b: pa.Table) -> pa.Table:
        b = b.rename_columns(["c_custkey", "revenue_c"])
        idx = pc.sort_indices(
            b, sort_keys=[("revenue_c", "descending"), ("c_custkey", "ascending")]
        )[:10]
        return b.take(idx)

    small = agg.map_batches(_block_top, batch_format="pyarrow").to_pandas()
    top = small.sort_values(["revenue_c", "c_custkey"], ascending=[False, True]).head(10)
    top["c_name"] = top["c_custkey"].map(name_of)
    return pa.Table.from_pandas(top[["c_custkey", "c_name", "revenue_c"]], preserve_index=False)


def sql_top_customers() -> str:
    return """
    SELECT o.o_custkey AS c_custkey, c.c_name,
           CAST(SUM(CAST(floor(o.o_totalprice*100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_c
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY o.o_custkey, c.c_name
    ORDER BY revenue_c DESC, c_custkey
    LIMIT 10
    """


def q_events_window(sf_dir: str):
    """Tumbling hourly window per event type (streaming-shaped groupby):
    counts + exact value sums per (event_type, hour bucket)."""
    import ray.data as rd

    ds = rd.read_parquet(_pq(sf_dir, "events"), columns=["event_type", "ts", "value"])

    def _bucket(b: pa.Table) -> pa.Table:
        ts_us = pc.cast(b["ts"], pa.int64()).to_numpy()
        hour = ts_us // 3_600_000_000
        val_c = np.floor(np.asarray(b["value"], dtype=np.float64) * 100 + 0.5).astype(np.int64)
        return pa.table(
            {
                "event_type": b["event_type"],
                "hour": pa.array(hour, pa.int64()),
                "value_c": pa.array(val_c, pa.int64()),
                "one": pa.array(np.ones(len(b), dtype=np.int64), pa.int64()),
            }
        )

    out = (
        ds.map_batches(_bucket, batch_format="pyarrow")
        .groupby(["event_type", "hour"])
        .sum(["value_c", "one"])
    )
    return out.map_batches(
        lambda t: t.rename_columns(["event_type", "hour", "sum_value_c", "n"]),
        batch_format="pyarrow",
    )


def sql_events_window() -> str:
    return """
    SELECT event_type, CAST(floor(epoch_us(ts)/3600000000) AS BIGINT) AS hour,
           CAST(SUM(CAST(floor(value*100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_value_c,
           COUNT(*) AS n
    FROM events GROUP BY event_type, hour
    """


def q_distinct_users(sf_dir: str):
    """Distinct aggregation: unique users per event type."""
    import ray.data as rd

    ds = rd.read_parquet(_pq(sf_dir, "events"), columns=["event_type", "user_id"])

    def _distinct(g: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": g["event_type"].slice(0, 1).combine_chunks(),
                "n_users": pa.array(
                    [pc.count_distinct(g["user_id"]).as_py()], pa.int64()
                ),
            }
        )

    return ds.groupby("event_type").map_groups(_distinct, batch_format="pyarrow")


def sql_distinct_users() -> str:
    return "SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users FROM events GROUP BY event_type"


# ---------------------------------------------------------------------------
# text suite (documents)


def q_dedup_exact(sf_dir: str):
    """Exact dedup: md5 content hash → keep the lowest doc_id per hash."""
    import ray.data as rd

    from ..text import dedup_exact

    ds = rd.read_parquet(_pq(sf_dir, "documents"), columns=["doc_id", "text"])
    return dedup_exact(ds)


def sql_dedup_exact() -> str:
    return "SELECT md5(text) AS content_md5, CAST(MIN(doc_id) AS BIGINT) AS doc_id FROM documents GROUP BY md5(text)"


def q_token_stats(sf_dir: str):
    """Token counting rolled up per language."""
    import ray.data as rd

    from ..text import token_count_batch

    ds = rd.read_parquet(_pq(sf_dir, "documents"), columns=["lang", "text", "n_chars"])
    counted = ds.map_batches(lambda b: token_count_batch(b), batch_format="pyarrow")

    def _partial(b: pa.Table) -> pa.Table:
        import pandas as pd

        df = pd.DataFrame(
            {
                "lang": b["lang"].to_pylist(),
                "sum_tokens": np.asarray(b["n_tokens"], dtype=np.int64),
                "sum_chars": np.asarray(b["n_chars"], dtype=np.int64),
                "n_docs": np.ones(len(b), dtype=np.int64),
            }
        )
        return pa.Table.from_pandas(
            df.groupby("lang", as_index=False).sum(), preserve_index=False
        )

    out = counted.map_batches(_partial, batch_format="pyarrow").groupby("lang").sum(
        ["sum_tokens", "sum_chars", "n_docs"]
    )
    return out.map_batches(
        lambda t: t.rename_columns(["lang", "sum_tokens", "sum_chars", "n_docs"]),
        batch_format="pyarrow",
    )


def sql_token_stats() -> str:
    return r"""
    SELECT lang,
           CAST(SUM(array_length(string_split_regex(text, '\s+'))) AS BIGINT) AS sum_tokens,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           COUNT(*) AS n_docs
    FROM documents GROUP BY lang
    """


def q_quality(sf_dir: str):
    """Per-doc quality scoring: token/punct counts + stopword ratio."""
    import ray.data as rd

    from ..text import quality_batch

    ds = rd.read_parquet(_pq(sf_dir, "documents"), columns=["doc_id", "text"])

    def _q(b: pa.Table) -> pa.Table:
        out = quality_batch(b)
        return pa.table(
            {
                "doc_id": pc.cast(out["doc_id"], pa.int64()),
                "n_tokens": out["n_tokens"],
                "n_punct": out["n_punct"],
                "stop_ratio": pa.array(r6(np.asarray(out["stop_ratio"])), pa.float64()),
            }
        )

    return ds.map_batches(_q, batch_format="pyarrow")


def sql_quality() -> str:
    stop = "','".join(
        sorted(
            "the a an and or of to in is are was were be been on at by for with as it this that".split()
        )
    )
    return rf"""
    SELECT doc_id,
           CAST(array_length(string_split_regex(text, '\s+')) AS BIGINT) AS n_tokens,
           CAST(length(regexp_replace(text, '[^.!?,;:]', '', 'g')) AS BIGINT) AS n_punct,
           floor(CAST(len(list_filter(string_split_regex(lower(text), '\s+'),
                                      t -> list_contains(['{stop}'], t))) AS DOUBLE)
                 / CAST(array_length(string_split_regex(text, '\s+')) AS DOUBLE) * 1000000 + 0.5)/1000000
             AS stop_ratio
    FROM documents
    """


def q_lang_source_stats(sf_dir: str):
    """Two-key grouped distribution (lang × source)."""
    import ray.data as rd

    ds = rd.read_parquet(_pq(sf_dir, "documents"), columns=["lang", "source"])
    out = ds.groupby(["lang", "source"]).count()
    return out.map_batches(
        lambda t: t.rename_columns(["lang", "source", "n"]), batch_format="pyarrow"
    )


def sql_lang_source_stats() -> str:
    return "SELECT lang, source, COUNT(*) AS n FROM documents GROUP BY lang, source"


def q_fingerprint(sf_dir: str):
    """Order-insensitive document fingerprint (sorted distinct tokens → md5)."""
    import ray.data as rd

    from ..text import fingerprint_batch

    ds = rd.read_parquet(_pq(sf_dir, "documents"), columns=["doc_id", "text"])

    def _fp(b: pa.Table) -> pa.Table:
        out = fingerprint_batch(b)
        return pa.table(
            {"doc_id": pc.cast(out["doc_id"], pa.int64()), "fingerprint": out["fingerprint"]}
        )

    return ds.map_batches(_fp, batch_format="pyarrow")


def sql_fingerprint() -> str:
    return r"""
    SELECT doc_id,
           md5(array_to_string(list_sort(list_distinct(string_split_regex(text, '\s+'))), ' ')) AS fingerprint
    FROM documents
    """


def q_minhash_pairs(sf_dir: str):
    """MinHash-LSH near-duplicate pairs verified by exact Jaccard ≥ 0.8
    (shingle → minhash → band → bucket groupby). Non-SQL (rows-only)."""
    import ray.data as rd

    from ..text import dedup_minhash

    ds = rd.read_parquet(_pq(sf_dir, "documents"), columns=["doc_id", "text"])
    return dedup_minhash(ds)


def q_minhash_planted(sf_dir: str):
    """MinHash-LSH near-dup pipeline over the deterministic planted-dup
    corpus — the fully-oracled variant: the driver compares the distributed
    band-shuffle + pair-join + in-batch verify against an independent
    scalar recomputation (``oracle_match._scalar_minhash_pairs``)."""
    import ray.data as rd

    from ..oracle_match import planted_dup_corpus
    from ..text import dedup_minhash

    ds = rd.from_arrow(planted_dup_corpus())
    out = dedup_minhash(ds)
    return out.map_batches(
        lambda t: pa.table(
            {
                "doc_a": t["doc_a"],
                "doc_b": t["doc_b"],
                "jaccard": t["jaccard"],
            }
        ),
        batch_format="pyarrow",
    )


def sql_minhash_planted() -> str:
    from ..oracle_match import planted_minhash_expected_path

    return (
        "SELECT doc_a, doc_b, jaccard FROM "
        f"read_parquet('{planted_minhash_expected_path()}')"
    )


def q_simhash(sf_dir: str):
    """64-bit SimHash fingerprints (bit-majority over token hashes).
    Emits the signature as int64 (two's-complement view) so both engines
    compare a signed column."""
    import ray.data as rd

    from ..text import simhash_batch

    ds = rd.read_parquet(_pq(sf_dir, "documents"), columns=["doc_id", "text"])

    def _s(b: pa.Table) -> pa.Table:
        out = simhash_batch(b)
        sh = np.asarray(out["simhash"]).astype(np.uint64).view(np.int64)
        return pa.table(
            {
                "doc_id": pc.cast(out["doc_id"], pa.int64()),
                "simhash": pa.array(sh, pa.int64()),
            }
        )

    return ds.map_batches(_s, batch_format="pyarrow")


def sql_simhash() -> str:
    # DuckDB md5_number_upper(t) == first 8 md5 digest bytes little-endian ==
    # our token_hashes_64 convention (verified); bit-majority vote per bit
    # via a 64-row generate_series cross join, then wrap to signed
    return r"""
    WITH toks AS (
      SELECT doc_id, md5_number_upper(tok) AS h
      FROM (
        SELECT doc_id, unnest(string_split_regex(coalesce(text, ''), '\s+')) AS tok
        FROM documents
      )
      WHERE tok <> ''
    ),
    votes AS (
      SELECT doc_id, b,
             SUM(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS vote
      FROM toks, (SELECT unnest(generate_series(0, 63)) AS b)
      GROUP BY doc_id, b
    ),
    sigs AS (
      SELECT doc_id,
             SUM(CASE WHEN vote > 0 THEN CAST(CAST(1 AS UBIGINT) << b AS HUGEINT) ELSE 0 END) AS s
      FROM votes GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(CASE WHEN coalesce(s.s, 0) >= 9223372036854775808
                     THEN coalesce(s.s, 0) - 18446744073709551616
                     ELSE coalesce(s.s, 0) END AS BIGINT) AS simhash
    FROM documents d LEFT JOIN sigs s USING (doc_id)
    """


def q_langid(sf_dir: str):
    """Heuristic language id (stopword-profile n-gram-free variant).
    Non-SQL (rows-only)."""
    import ray.data as rd

    from ..text import langid_batch

    ds = rd.read_parquet(_pq(sf_dir, "documents"), columns=["doc_id", "text"])

    def _l(b: pa.Table) -> pa.Table:
        out = langid_batch(b)
        return pa.table(
            {
                "doc_id": pc.cast(out["doc_id"], pa.int64()),
                "lang_pred": out["lang_pred"],
                "lang_conf": pa.array(r6(np.asarray(out["lang_conf"])), pa.float64()),
            }
        )

    return ds.map_batches(_l, batch_format="pyarrow")


def sql_langid() -> str:
    from ..text import LANG_PROFILES

    score_cols = ",\n      ".join(
        "len(list_intersect(toks, ["
        + ", ".join(f"'{w}'" for w in prof)
        + f"])) AS s_{lang}"
        for lang, prof in LANG_PROFILES
    )
    langs = [lang for lang, _ in LANG_PROFILES]
    m_expr = "greatest(" + ", ".join(f"s_{x}" for x in langs) + ")"
    # earlier profile wins ties — CASE order mirrors the Python scan order
    pred_cases = " ".join(f"WHEN s_{x} = m THEN '{x}'" for x in langs)
    return rf"""
    WITH t AS (
      SELECT doc_id,
             list_distinct(string_split_regex(lower(coalesce(text, '')), '\s+')) AS toks
      FROM documents
    ),
    s AS (
      SELECT doc_id,
      {score_cols}
      FROM t
    ),
    p AS (SELECT doc_id, s.*, {m_expr} AS m FROM s)
    SELECT doc_id,
           CASE WHEN m = 0 THEN 'unk' {pred_cases} END AS lang_pred,
           floor(m / 6.0 * 1e6 + 0.5) / 1e6 AS lang_conf
    FROM p
    """


# ---------------------------------------------------------------------------
# embeddings


def q_ann_topk(sf_dir: str):
    """Exact cosine top-10 for the first 5 vectors as queries — brute-force
    baseline (broadcast query matrix, per-batch matmul partial top-k)."""
    import ray.data as rd

    from ..sim import _stack_embeddings, ann_brute_topk

    head = papq.read_table(_pq(sf_dir, "embeddings"))
    mask = pc.less(head["vec_id"], 5)
    qtbl = head.filter(mask)
    queries = _stack_embeddings(qtbl["embedding"])
    qids = np.asarray(qtbl["vec_id"], dtype=np.int64)
    order = np.argsort(qids)
    queries, qids = queries[order], qids[order]

    ds = rd.read_parquet(_pq(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    return ann_brute_topk(ds, queries, qids, k=10)


def sql_ann_topk() -> str:
    return """
    WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 5),
    sims AS (
      SELECT q.query_id, e.vec_id,
             floor(list_cosine_similarity(CAST(q.qe AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))*1000000 + 0.5)/1000000 AS sim
      FROM q CROSS JOIN embeddings e WHERE e.vec_id != q.query_id
    ),
    ranked AS (
      SELECT query_id, vec_id, sim,
             row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rk
      FROM sims
    )
    SELECT query_id, vec_id, sim FROM ranked WHERE rk <= 10
    """


def q_ann_lsh(sf_dir: str):
    """LSH-bucketed approximate cosine top-10 (the scale path).
    Non-SQL (rows-only — approximate by design)."""
    import ray.data as rd

    from ..sim import _stack_embeddings, ann_lsh_topk

    head = papq.read_table(_pq(sf_dir, "embeddings"))
    qtbl = head.filter(pc.less(head["vec_id"], 5))
    queries = _stack_embeddings(qtbl["embedding"])
    qids = np.asarray(qtbl["vec_id"], dtype=np.int64)
    order = np.argsort(qids)
    ds = rd.read_parquet(_pq(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    return ann_lsh_topk(ds, queries[order], qids[order], k=10)


def q_ann_lsh_planted(sf_dir: str):
    """Multi-table multi-probe sign-LSH top-10 over the planted
    separable-cluster embedding world — the fully-oracled ANN variant:
    intra-cluster cosine ≈ 0.999 vs inter-cluster ≲ 0.6, so every table
    co-buckets a query with its whole cluster and the LSH result EQUALS
    the exact top-k, compared against an independent scalar recomputation
    (``oracle_match._scalar_cosine_topk``)."""
    import ray.data as rd

    from ..oracle_match import planted_embedding_corpus
    from ..sim import ann_lsh_topk

    tbl, mat = planted_embedding_corpus()
    n_q = 5
    queries = mat[:n_q]
    qids = np.arange(n_q, dtype=np.int64)
    ds = rd.from_arrow(tbl)
    return ann_lsh_topk(ds, queries, qids, k=10)


def sql_ann_lsh_planted() -> str:
    from ..oracle_match import planted_ann_expected_path

    return (
        "SELECT query_id, vec_id, sim FROM "
        f"read_parquet('{planted_ann_expected_path()}')"
    )


def q_embed_dups_lsh(sf_dir: str):
    """LSH-bucketed embedding near-dup pairs (the scale path of
    ``embed_dups`` — co-bucket then verify, no all-pairs broadcast) over
    the planted cluster world, oracled against a scalar all-pairs
    recomputation (``oracle_match.planted_embed_dups_expected_path``)."""
    import ray.data as rd

    from ..oracle_match import planted_embedding_corpus
    from ..sim import embed_dups_lsh

    tbl, _ = planted_embedding_corpus()
    # 8 tables × 4 planes: wider buckets + more independent chances — on
    # the planted clusters the per-pair miss probability is ~1e-6, i.e.
    # recall 1.0 deterministically under this seed
    out = embed_dups_lsh(rd.from_arrow(tbl), threshold=0.95, n_planes=4, n_tables=8)
    schema = pa.schema([("id_a", pa.int64()), ("id_b", pa.int64()), ("sim", pa.float64())])
    tabs = [
        t if isinstance(t, pa.Table) else pa.Table.from_batches([t])
        for t in out.iter_batches(batch_format="pyarrow")
    ]
    tabs = [t.cast(schema) for t in tabs if t.num_rows]
    return pa.concat_tables(tabs) if tabs else schema.empty_table()


def sql_embed_dups_lsh() -> str:
    from ..oracle_match import planted_embed_dups_expected_path

    return (
        "SELECT id_a, id_b, sim FROM "
        f"read_parquet('{planted_embed_dups_expected_path()}')"
    )


def q_ann_ivf_planted(sf_dir: str):
    """IVF-Flat approximate top-10 (coarse k-means quantizer + nprobe
    inverted-list search — the second scale path next to LSH) over the
    planted cluster world; probing the true cluster's centroid recovers
    the exact top-k, so the result equals the independent scalar
    recomputation behind ``ann_lsh_planted``."""
    import ray.data as rd

    from ..oracle_match import planted_embedding_corpus
    from ..sim import ann_ivf_topk

    tbl, mat = planted_embedding_corpus()
    n_q = 5
    return ann_ivf_topk(
        rd.from_arrow(tbl), mat[:n_q], np.arange(n_q, dtype=np.int64),
        k=10, n_centroids=24, nprobe=6,
    )


def sql_ann_ivf_planted() -> str:
    from ..oracle_match import planted_ann_expected_path

    return (
        "SELECT query_id, vec_id, sim FROM "
        f"read_parquet('{planted_ann_expected_path()}')"
    )


def q_range_join(sf_dir: str):
    """Interval/range self-join: per event, the number of the SAME user's
    events in the following hour (ts, ts + 1 h] — the inequality-join
    shape a relational engine needs beyond equi-joins. One bucket-hash
    shuffle (the ``asof_orders`` pattern); inside each bucket the range
    count is two C-speed ``merge_asof`` rank lookups (per-key cumulative
    event index at the window's endpoints), never a nested loop."""
    import pandas as pd
    import ray.data as rd

    n_buckets = 32
    hour_us = 3_600_000_000
    ev = rd.read_parquet(_pq(sf_dir, "events"), columns=["event_id", "user_id", "ts"])

    def _ev(b: pa.Table) -> pa.Table:
        key = pc.cast(b["user_id"], pa.int64())
        return pa.table(
            {
                "key": key,
                "t": pc.cast(b["ts"], pa.int64()),
                "event_id": pc.cast(b["event_id"], pa.int64()),
                "bucket": pa.array(
                    (np.asarray(key, dtype=np.int64) % n_buckets), pa.int64()
                ),
            }
        )

    def _merge(g: pd.DataFrame) -> pd.DataFrame:
        e = g[["key", "t", "event_id"]].sort_values(
            ["key", "t"], kind="mergesort"
        ).reset_index(drop=True)
        e["cum"] = e.groupby("key", sort=False).cumcount() + 1
        er = (
            e[["key", "t", "cum"]]
            .rename(columns={"t": "q"})
            .sort_values("q", kind="mergesort")
        )
        # rank(≤ endpoint): backward asof with exact matches allowed
        lo = e.assign(q=e["t"]).sort_values("q", kind="mergesort")
        hi = e.assign(q=e["t"] + hour_us).sort_values("q", kind="mergesort")
        m_lo = pd.merge_asof(
            lo, er, on="q", by="key", direction="backward", allow_exact_matches=True
        )
        m_hi = pd.merge_asof(
            hi, er, on="q", by="key", direction="backward", allow_exact_matches=True
        )
        n = (
            m_hi.set_index("event_id")["cum_y"].fillna(0)
            - m_lo.set_index("event_id")["cum_y"].fillna(0)
        )
        return pd.DataFrame(
            {
                "event_id": n.index.astype("int64"),
                "n_next_hour": n.to_numpy().astype(np.int64),
            }
        )

    return (
        ev.map_batches(_ev, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(_merge, batch_format="pandas")
    )


def sql_range_join() -> str:
    return """
    SELECT a.event_id,
           CAST(COUNT(b.event_id) AS BIGINT) AS n_next_hour
    FROM events a LEFT JOIN events b
      ON b.user_id = a.user_id
     AND CAST(epoch_us(b.ts) AS BIGINT) > CAST(epoch_us(a.ts) AS BIGINT)
     AND CAST(epoch_us(b.ts) AS BIGINT) <= CAST(epoch_us(a.ts) AS BIGINT) + 3600000000
    GROUP BY a.event_id
    """


def q_sample_stratified(sf_dir: str):
    """Deterministic stratified sampling — the dataset-curation primitive:
    per-language keep rates applied by content hash (md5 of doc_id, the
    engine-portable hash both sides share), so the sample is exactly
    reproducible across engines, runs and partitionings. Per-batch filter
    + partial counts; only (lang, n) rows shuffle."""
    import hashlib

    import ray.data as rd

    rates = {"en": 40, "de": 80, "fr": 20}  # percent kept per stratum
    default_rate = 60
    ds = rd.read_parquet(_pq(sf_dir, "documents"), columns=["doc_id", "lang"])

    def _partial(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_pylist()
        langs = b["lang"].to_pylist()
        h = np.asarray(
            [
                int.from_bytes(hashlib.md5(str(i).encode()).digest()[:8], "little") % 100
                for i in ids
            ],
            dtype=np.int64,
        )
        th = np.asarray([rates.get(l, default_rate) for l in langs], dtype=np.int64)
        keep = h < th
        kl = [l for l, k in zip(langs, keep.tolist()) if k]
        if not kl:
            return pa.table(
                {"lang": pa.array([], pa.string()), "n_sampled": pa.array([], pa.int64())}
            )
        uniq, counts = np.unique(np.asarray(kl, dtype=object), return_counts=True)
        return pa.table(
            {
                "lang": pa.array([str(u) for u in uniq], pa.string()),
                "n_sampled": pa.array(counts.astype(np.int64), pa.int64()),
            }
        )

    out = ds.map_batches(_partial, batch_format="pyarrow").groupby("lang").sum("n_sampled")
    return out.map_batches(
        lambda t: t.rename_columns(["lang", "n_sampled"]), batch_format="pyarrow"
    )


def sql_sample_stratified() -> str:
    # md5_number_upper == little-endian first 8 digest bytes as u64 (the
    # repo-wide token-hash convention, NOTES.md) — matches
    # int.from_bytes(d[:8], "little") on the engine side
    return """
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_sampled
    FROM documents
    WHERE md5_number_upper(CAST(doc_id AS VARCHAR)) % 100 <
          CASE lang WHEN 'en' THEN 40 WHEN 'de' THEN 80 WHEN 'fr' THEN 20 ELSE 60 END
    GROUP BY lang
    """


def q_group_topk(sf_dir: str):
    """Grouped top-k: each customer's 2 highest-price orders (ties to the
    lowest orderkey) — per-batch partial top-2 per customer bounds the
    shuffle at 2 rows/customer/batch, bucket-hash groupby + one vectorized
    pandas pass finishes (no per-customer Python bodies)."""
    import pandas as pd
    import ray.data as rd

    k = 2
    n_buckets = 16
    ds = rd.read_parquet(
        _pq(sf_dir, "orders"), columns=["o_orderkey", "o_custkey", "o_totalprice"]
    )

    def _partial(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        df = df.sort_values(
            ["o_custkey", "o_totalprice", "o_orderkey"],
            ascending=[True, False, True],
            kind="mergesort",
        )
        df = df.groupby("o_custkey", sort=False).head(k)
        df["bucket"] = (df["o_custkey"].to_numpy() % n_buckets).astype(np.int64)
        return pa.Table.from_pandas(df, preserve_index=False)

    def _final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["o_custkey", "o_totalprice", "o_orderkey"],
            ascending=[True, False, True],
            kind="mergesort",
        )
        out = g.groupby("o_custkey", sort=False).head(k).copy()
        out["rk"] = out.groupby("o_custkey", sort=False).cumcount() + 1
        return out[["o_custkey", "o_orderkey", "o_totalprice", "rk"]].astype(
            {"o_custkey": "int64", "o_orderkey": "int64", "rk": "int64"}
        )

    return (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(_final, batch_format="pandas")
    )


def sql_group_topk() -> str:
    return """
    SELECT o_custkey, o_orderkey, o_totalprice, CAST(rk AS BIGINT) AS rk FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rk
      FROM orders
    ) WHERE rk <= 2
    """


def q_value_percentiles(sf_dir: str):
    """Per-event-type nearest-rank percentiles (p50/p95 of value) — the
    conformance-metrics selection rule (``metrics.rs:30-74``) as a grouped
    aggregate; nearest-rank picks an EXACT element so the oracle compare
    is exact."""
    import ray.data as rd

    ds = rd.read_parquet(_pq(sf_dir, "events"), columns=["event_type", "value"])

    def _grp(g: pa.Table) -> pa.Table:
        v = np.sort(g["value"].to_numpy(zero_copy_only=False))
        n = v.size

        def nr(q):
            return float(v[max(int(np.ceil(q * n)) - 1, 0)])

        return pa.table(
            {
                "event_type": g["event_type"].slice(0, 1).combine_chunks(),
                "p50": pa.array([nr(0.5)], pa.float64()),
                "p95": pa.array([nr(0.95)], pa.float64()),
                "n": pa.array([n], pa.int64()),
            }
        )

    return ds.groupby("event_type").map_groups(_grp, batch_format="pyarrow")


def sql_value_percentiles() -> str:
    return """
    SELECT event_type,
           quantile_disc(value, 0.5) AS p50,
           quantile_disc(value, 0.95) AS p95,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events GROUP BY event_type
    """


def q_asof_orders(sf_dir: str):
    """Distributed as-of join: each event joins the LATEST order of its
    user at-or-before the event time (the reference-free custom operator
    the task calls out — composed as union + bucket-hash groupby +
    vectorized per-bucket ``merge_asof``; one shuffle, C-speed merge).

    Ties on (user, date) are broken deterministically (max o_orderkey)
    on both engines."""
    import pandas as pd
    import ray.data as rd

    n_buckets = 32
    ev = rd.read_parquet(_pq(sf_dir, "events"), columns=["event_id", "user_id", "ts"])
    od = rd.read_parquet(
        _pq(sf_dir, "orders"), columns=["o_orderkey", "o_custkey", "o_orderdate"]
    )

    def _ev(b: pa.Table) -> pa.Table:
        key = pc.cast(b["user_id"], pa.int64())
        return pa.table(
            {
                "key": key,
                "t": pc.cast(b["ts"], pa.int64()),
                "event_id": pc.cast(b["event_id"], pa.int64()),
                "o_orderkey": pa.nulls(len(b), pa.int64()),
                "side": pa.array(np.zeros(len(b), dtype=np.int8), pa.int8()),
                "bucket": pa.array(
                    (np.asarray(key, dtype=np.int64) % n_buckets), pa.int64()
                ),
            }
        )

    def _od(b: pa.Table) -> pa.Table:
        key = pc.cast(b["o_custkey"], pa.int64())
        return pa.table(
            {
                "key": key,
                "t": pc.cast(b["o_orderdate"], pa.int64()),
                "event_id": pa.nulls(len(b), pa.int64()),
                "o_orderkey": pc.cast(b["o_orderkey"], pa.int64()),
                "side": pa.array(np.ones(len(b), dtype=np.int8), pa.int8()),
                "bucket": pa.array(
                    (np.asarray(key, dtype=np.int64) % n_buckets), pa.int64()
                ),
            }
        )

    both = ev.map_batches(_ev, batch_format="pyarrow").union(
        od.map_batches(_od, batch_format="pyarrow")
    )

    def _merge(g: pd.DataFrame) -> pd.DataFrame:
        e = g[g["side"] == 0][["key", "t", "event_id"]]
        o = g[g["side"] == 1][["key", "t", "o_orderkey"]]
        empty = pd.DataFrame(
            {
                "event_id": pd.Series([], dtype="int64"),
                "o_orderkey": pd.Series([], dtype="int64"),
                "order_ts": pd.Series([], dtype="int64"),
            }
        )
        if e.empty or o.empty:
            return empty
        # all orders for a key co-locate in its bucket, so the per-(key, t)
        # max-orderkey tie-break is globally correct here
        o = o.groupby(["key", "t"], as_index=False)["o_orderkey"].max()
        o["order_ts"] = o["t"]  # survive the asof (merge consumes `t`)
        e = e.sort_values("t", kind="mergesort")
        o = o.sort_values("t", kind="mergesort")
        m = pd.merge_asof(e, o, on="t", by="key", direction="backward")
        m = m.dropna(subset=["o_orderkey"])
        if m.empty:
            return empty
        return pd.DataFrame(
            {
                "event_id": m["event_id"].astype("int64"),
                "o_orderkey": m["o_orderkey"].astype("int64"),
                "order_ts": m["order_ts"].astype("int64"),
            }
        )

    out = both.groupby("bucket").map_groups(_merge, batch_format="pandas")
    return out


def sql_asof_orders() -> str:
    return """
    WITH o AS (
      SELECT o_custkey AS key, CAST(epoch_us(o_orderdate) AS BIGINT) AS ots,
             MAX(o_orderkey) AS o_orderkey
      FROM orders GROUP BY 1, 2
    ),
    e AS (
      SELECT event_id, user_id AS key, CAST(epoch_us(ts) AS BIGINT) AS ets
      FROM events
    )
    SELECT e.event_id, o.o_orderkey, o.ots AS order_ts
    FROM e ASOF JOIN o ON e.key = o.key AND e.ets >= o.ots
    """


def q_embed_norms(sf_dir: str):
    """Per-label embedding count + exact-integer L2-norm sums."""
    import ray.data as rd

    from ..sim import _stack_embeddings

    ds = rd.read_parquet(_pq(sf_dir, "embeddings"), columns=["label", "embedding"])

    def _partial(b: pa.Table) -> pa.Table:
        import pandas as pd

        vecs = _stack_embeddings(b["embedding"])
        norms = np.sqrt((vecs * vecs).sum(axis=1))
        df = pd.DataFrame(
            {
                "label": np.asarray(b["label"], dtype=np.int64),
                "sum_norm_e6": np.floor(norms * 1e6 + 0.5).astype(np.int64),
                "n": np.ones(len(b), dtype=np.int64),
            }
        )
        return pa.Table.from_pandas(df.groupby("label", as_index=False).sum(), preserve_index=False)

    out = ds.map_batches(_partial, batch_format="pyarrow").groupby("label").sum(["sum_norm_e6", "n"])
    return out.map_batches(
        lambda t: t.rename_columns(["label", "sum_norm_e6", "n"]), batch_format="pyarrow"
    )


def sql_embed_norms() -> str:
    return """
    SELECT CAST(label AS BIGINT) AS label,
           CAST(SUM(CAST(floor(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])))*1000000 + 0.5) AS BIGINT)) AS BIGINT) AS sum_norm_e6,
           COUNT(*) AS n
    FROM embeddings GROUP BY label
    """


# ---------------------------------------------------------------------------
# multimodal + map-matching (rows-only entries)


def q_media_features(sf_dir: str):
    """Multimodal plumbing: synth media rows for each document → actor-pool
    feature extraction (stub decode) → per-doc rollup. Non-SQL (rows-only)."""
    import ray.data as rd

    from ..media import MediaFeatureExtractor, resize_plan_batch, synth_media_rows

    docs = papq.read_table(_pq(sf_dir, "documents"), columns=["doc_id"])
    doc_ids = [f"d{int(x)}" for x in docs["doc_id"].to_pylist()]
    media = synth_media_rows(doc_ids, refs_per_doc=2)
    ds = rd.from_arrow(media)
    feats = ds.map_batches(
        MediaFeatureExtractor, batch_format="pyarrow", batch_size=512, concurrency=2, num_cpus=1
    ).map_batches(resize_plan_batch, batch_format="pyarrow")

    def _rollup(b: pa.Table) -> pa.Table:
        # per-batch partial rollup in numpy (sorted-group reduceat —
        # no pandas in the hot path)
        doc = np.asarray(b["doc_id"].to_pylist(), dtype=object)
        order = np.argsort(doc, kind="stable")
        doc_s = doc[order]
        bounds = np.flatnonzero(
            np.concatenate(([True], doc_s[1:] != doc_s[:-1]))
        )
        pay = np.asarray(b["payload_bytes"], dtype=np.int64)[order]
        rw = np.asarray(b["resize_w"], dtype=np.int64)[order]
        counts = np.diff(np.append(bounds, doc_s.size))
        return pa.table(
            {
                "doc_id": pa.array(doc_s[bounds].tolist(), pa.string()),
                "n_media": pa.array(counts.astype(np.int64), pa.int64()),
                "sum_payload_bytes": pa.array(np.add.reduceat(pay, bounds), pa.int64()),
                "sum_resize_w": pa.array(np.add.reduceat(rw, bounds), pa.int64()),
            }
        )

    out = feats.map_batches(_rollup, batch_format="pyarrow").groupby("doc_id").sum(
        ["n_media", "sum_payload_bytes", "sum_resize_w"]
    )
    return out.map_batches(
        lambda t: t.rename_columns(["doc_id", "n_media", "sum_payload_bytes", "sum_resize_w"]),
        batch_format="pyarrow",
    )


def sql_media_features() -> str:
    # synth_media_rows derives metadata from md5("media://d{doc_id}/{k}"):
    # byte i of the digest == (md5_number_upper >> 8*i) & 255 (little-endian
    # first-8-bytes convention, same as the token hashes); payload_len 256;
    # resize scale = 224/min(w,h), half-up rounding — all exact in SQL
    return r"""
    WITH refs AS (
      SELECT 'd' || CAST(doc_id AS VARCHAR) AS doc_id,
             'media://d' || CAST(doc_id AS VARCHAR) || '/' || CAST(k AS VARCHAR) AS ref
      FROM documents, (SELECT unnest([0, 1]) AS k)
    ),
    m AS (
      SELECT doc_id,
             64 + CAST((md5_number_upper(ref) >> 8) & 255 AS BIGINT) % 192 AS w,
             64 + CAST((md5_number_upper(ref) >> 16) & 255 AS BIGINT) % 192 AS h
      FROM refs
    )
    SELECT doc_id,
           COUNT(*) AS n_media,
           CAST(SUM(256) AS BIGINT) AS sum_payload_bytes,
           CAST(SUM(floor(w * (224.0 / least(w, h)) + 0.5)) AS BIGINT) AS sum_resize_w
    FROM m GROUP BY doc_id
    """


def q_token_bpe(sf_dir: str):
    """BPE-ish sub-word token counts per (lang, source): count + sum —
    token budgeting over the corpus with the regex pre-tokenizer."""
    import ray.data as rd

    from ..text import bpe_token_count_batch

    ds = rd.read_parquet(_pq(sf_dir, "documents"), columns=["doc_id", "text", "lang", "source"])

    def _partial(b: pa.Table) -> pa.Table:
        out = bpe_token_count_batch(b)
        import pandas as pd

        df = pd.DataFrame(
            {
                "lang": out["lang"].to_pylist(),
                "source": out["source"].to_pylist(),
                "n_docs": np.ones(len(out), dtype=np.int64),
                "sum_bpe_tokens": np.asarray(out["n_bpe_tokens"], dtype=np.int64),
            }
        )
        agg = df.groupby(["lang", "source"], as_index=False).sum()
        return pa.Table.from_pandas(agg, preserve_index=False)

    out = ds.map_batches(_partial, batch_format="pyarrow").groupby(["lang", "source"]).sum(
        ["n_docs", "sum_bpe_tokens"]
    )
    return out.map_batches(
        lambda t: t.rename_columns(["lang", "source", "n_docs", "sum_bpe_tokens"]),
        batch_format="pyarrow",
    )


def sql_token_bpe() -> str:
    from ..text import BPE_RE

    pat = BPE_RE.replace("'", "''")
    return f"""
    SELECT lang, source, COUNT(*) AS n_docs,
           CAST(SUM(len(regexp_extract_all(coalesce(text, ''), '{pat}'))) AS BIGINT) AS sum_bpe_tokens
    FROM documents GROUP BY lang, source
    """


Z_DATED = 7
_DATED_RANGES = (
    # Mon-Fri of the first three January 2024 weeks, inclusive boundaries
    ("2024-01-02", "2024-01-19", "0-1-2-3-4"),
    # weekends of February 2024
    ("2024-02-01", "2024-02-25", "5-6"),
)


def q_tiles_dated(sf_dir: str):
    """Date-keyed tile scan: events filtered by DatedRanges (date-range ∧
    weekday-set, ``query/range.rs``), rolled up per (date, z, x, y) with
    the Hilbert row-key component (``example/tile.rs:111-146``)."""
    import ray.data as rd

    from ..tiles import DatedRange, materialize_dated_tiles

    ds = rd.read_parquet(_pq(sf_dir, "events"), columns=["event_id", "ts"])

    def _pts(b: pa.Table) -> pa.Table:
        eid = np.asarray(b["event_id"], dtype=np.int64)
        lon, lat = event_lonlat(eid)
        ts = np.asarray(pc.cast(b["ts"], pa.int64()))  # µs epoch
        return pa.table(
            {
                "lon": pa.array(lon, pa.float64()),
                "lat": pa.array(lat, pa.float64()),
                "ts_us": pa.array(ts, pa.int64()),
            }
        )

    ranges = [DatedRange.parse(s, e, w) for s, e, w in _DATED_RANGES]
    t = materialize_dated_tiles(ds.map_batches(_pts, batch_format="pyarrow"), [Z_DATED], ranges)
    return pa.table(
        {
            "date": pc.cast(t["date"], pa.int64()),
            "z": pc.cast(t["z"], pa.int64()),
            "x": pc.cast(t["x"], pa.int64()),
            "y": pc.cast(t["y"], pa.int64()),
            "n_points": t["n_points"],
            "hilbert": pa.array(np.asarray(t["hilbert"]).astype(np.uint64).view(np.int64), pa.int64()),
        }
    )


def sql_tiles_dated() -> str:
    from ..oracle_match import hilbert_lookup_path

    x, y = SQL_SLIPPY(Z_DATED)
    lookup = hilbert_lookup_path(Z_DATED)
    conds = []
    for s, e, w in _DATED_RANGES:
        import datetime as dt

        epoch = dt.date(1970, 1, 1)
        sd = (dt.date.fromisoformat(s) - epoch).days
        ed = (dt.date.fromisoformat(e) - epoch).days
        days = ",".join(w.split("-"))
        conds.append(
            f"(us >= {sd * 86_400_000_000} AND us <= {ed * 86_400_000_000} "
            f"AND ((us // 86400000000) + 3) % 7 IN ({days}))"
        )
    cond = " OR ".join(conds)
    return f"""
    WITH pts AS ({SQL_EVENT_PTS}),
    f AS (
      SELECT lon, lat, epoch_us(ts) AS us FROM pts
      WHERE {cond}
    ),
    cells AS (
      SELECT CAST(strftime(to_timestamp((us // 86400000000) * 86400), '%y%m%d') AS BIGINT) AS date,
             {x} AS x, {y} AS y
      FROM f
    ),
    agg AS (
      SELECT date, {Z_DATED} AS z, x, y, COUNT(*) AS n_points
      FROM cells GROUP BY date, x, y
    )
    SELECT a.date, a.z, a.x, a.y, a.n_points, h.hilbert
    FROM agg a JOIN read_parquet('{lookup}') h ON h.x = a.x AND h.y = a.y
    """


def q_access_windows(sf_dir: str):
    """Time-conditional edge accessibility over the planted conditional
    world — months, rule chaining, wrapping nights, comma time lists
    (``condition.rs``/``opening_hours.rs`` grammar). Per-batch vectorized
    evaluation (``access.access_mask_batch``, compile-once-per-condition)
    → per-probe open-edge counts as a distributed partial aggregation,
    oracled against an independent per-timestamp datetime recomputation."""
    import ray.data as rd

    from ..access import access_mask_batch
    from ..oracle_match import ACCESS_PROBES_US, planted_access_world

    probes = np.asarray(ACCESS_PROBES_US, dtype=np.int64)
    ds = rd.read_parquet(planted_access_world())

    def _partial(b: pa.Table) -> pa.Table:
        mask = access_mask_batch(b["condition"].to_pylist(), probes)
        return pa.table(
            {
                "ts_us": pa.array(probes, pa.int64()),
                "n_open": pa.array(mask.sum(axis=0).astype(np.int64), pa.int64()),
            }
        )

    agg = ds.map_batches(_partial, batch_format="pyarrow").groupby("ts_us").sum("n_open")
    return agg.map_batches(
        lambda t: t.rename_columns(["ts_us", "n_open"]), batch_format="pyarrow"
    )


def sql_access_windows() -> str:
    from ..oracle_match import planted_access_expected_path

    return (
        "SELECT ts_us, n_open FROM "
        f"read_parquet('{planted_access_expected_path()}')"
    )


def q_holiday_access(sf_dir: str):
    """Stacked conditional access with OSM holiday tokens over the planted
    holiday world — multi-clause values ("no @ (Mo-Fr 07:00-19:00);
    yes @ (PH)", paren-aware top-level split, last match wins) and PH/SH
    day tokens resolved against a broadcast public/school holiday table
    (the long tail past the reference's single-clause ``condition.rs``
    grammar). Same distributed shape as ``q_access_windows``: compile
    once per distinct condition, vectorized probe evaluation per batch,
    per-probe open-edge counts as a partial aggregation; oracled against
    an independent per-timestamp datetime+set recomputation."""
    import ray.data as rd

    from ..access import access_mask_batch_stacked, holiday_days
    from ..oracle_match import (
        HOLIDAY_PROBES_US,
        PUBLIC_HOLIDAYS_2024,
        SCHOOL_HOLIDAYS_2024,
        planted_holiday_world,
    )

    probes = np.asarray(HOLIDAY_PROBES_US, dtype=np.int64)
    ph = holiday_days(PUBLIC_HOLIDAYS_2024)
    sh = holiday_days(SCHOOL_HOLIDAYS_2024)
    ds = rd.read_parquet(planted_holiday_world())

    def _partial(b: pa.Table) -> pa.Table:
        mask = access_mask_batch_stacked(b["condition"].to_pylist(), probes, ph, sh)
        return pa.table(
            {
                "ts_us": pa.array(probes, pa.int64()),
                "n_open": pa.array(mask.sum(axis=0).astype(np.int64), pa.int64()),
            }
        )

    agg = ds.map_batches(_partial, batch_format="pyarrow").groupby("ts_us").sum("n_open")
    return agg.map_batches(
        lambda t: t.rename_columns(["ts_us", "n_open"]), batch_format="pyarrow"
    )


def sql_holiday_access() -> str:
    from ..oracle_match import planted_holiday_expected_path

    return (
        "SELECT ts_us, n_open FROM "
        f"read_parquet('{planted_holiday_expected_path()}')"
    )


def q_speed_limits(sf_dir: str):
    """Effective speed limits over the planted maxspeed world — the full
    parser family (blanket / per-lane / mph-knots units / mode + direction
    restricted labels / conditional values incl. AND-OR combined,
    ``speed_limit/{limit,restriction,collection}.rs`` +
    ``condition.rs``) resolved per probe context. Per-batch: each DISTINCT
    tag-set parses once, conditions evaluate vectorized over the probe
    timestamps; per-(mode, probe) limited-edge counts + km/h sums leave
    each batch pre-aggregated (combiner before the groupby shuffle).
    Oracled against an independent scalar datetime recomputation."""
    import ray.data as rd

    from ..oracle_match import (
        ACCESS_PROBES_US,
        SPEED_PROBE_MODES,
        planted_speed_world,
    )
    from ..speed_limit import effective_limit_kmh, parse_collection

    probes = np.asarray(ACCESS_PROBES_US, dtype=np.int64)
    ds = rd.read_parquet(planted_speed_world())

    def _partial(b: pa.Table) -> pa.Table:
        tags_col = b["tags"].to_pylist()
        dirs = b["dir"].to_pylist()
        lanes = b["probe_lane"].to_numpy(zero_copy_only=False)
        parsed: dict[tuple, list] = {}
        n_lim = {m: np.zeros(probes.size, dtype=np.int64) for m in SPEED_PROBE_MODES}
        s_kmh = {m: np.zeros(probes.size, dtype=np.int64) for m in SPEED_PROBE_MODES}
        for tags, dirn, lane in zip(tags_col, dirs, lanes):
            key = tuple((t["key"], t["value"]) for t in tags)
            entries = parsed.get(key)
            if entries is None:
                entries = parse_collection(list(key))
                parsed[key] = entries
            lane_ctx = None if lane < 0 else int(lane)
            for m in SPEED_PROBE_MODES:
                kmh = effective_limit_kmh(entries, m, dirn, lane_ctx, probes)
                lim = ~np.isnan(kmh)
                n_lim[m] += lim
                s_kmh[m] += np.where(lim, kmh, 0.0).astype(np.int64)
        return pa.table(
            {
                "mode": pa.array(
                    [m for m in SPEED_PROBE_MODES for _ in range(probes.size)],
                    pa.string(),
                ),
                "ts_us": pa.array(
                    np.tile(probes, len(SPEED_PROBE_MODES)), pa.int64()
                ),
                "n_limited": pa.array(
                    np.concatenate([n_lim[m] for m in SPEED_PROBE_MODES]), pa.int64()
                ),
                "sum_kmh": pa.array(
                    np.concatenate([s_kmh[m] for m in SPEED_PROBE_MODES]), pa.int64()
                ),
            }
        )

    agg = (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby(["mode", "ts_us"])
        .sum(["n_limited", "sum_kmh"])
    )
    return agg.map_batches(
        lambda t: t.rename_columns(["mode", "ts_us", "n_limited", "sum_kmh"]),
        batch_format="pyarrow",
    )


def sql_speed_limits() -> str:
    from ..oracle_match import planted_speed_expected_path

    return (
        "SELECT mode, ts_us, n_limited, sum_kmh FROM "
        f"read_parquet('{planted_speed_expected_path()}')"
    )


def q_transport_access(sf_dir: str):
    """Per-transport-mode edge accessibility + speed/class metadata over
    the planted metadata world — the precomputed-access-column path
    (``metadata.access_columns`` most-specific-wins resolution) as a
    distributed partial aggregation."""
    import ray.data as rd

    from ..metadata import (
        ACCESS_MODES,
        access_columns,
        class_weight_column,
        parse_maxspeed_column,
    )
    from ..oracle_match import planted_metadata_world

    path = planted_metadata_world()
    ds = rd.read_parquet(path)

    def _partial(b: pa.Table) -> pa.Table:
        cols = access_columns(b["access_tags"], b["dir"])
        speed = parse_maxspeed_column(b["maxspeed"])
        cw = class_weight_column(b["road_class"]).astype(np.int64)
        has_speed = ~np.isnan(speed)
        sx100 = np.floor(np.where(has_speed, speed, 0.0) * 100.0 + 0.5).astype(np.int64)
        modes, n_acc, s_cw, n_sp, s_sp = [], [], [], [], []
        for m in ACCESS_MODES:
            acc = cols[m]
            modes.append(m)
            n_acc.append(int(acc.sum()))
            s_cw.append(int(cw[acc].sum()))
            n_sp.append(int(has_speed.sum()))
            s_sp.append(int(sx100.sum()))
        return pa.table(
            {
                "mode": pa.array(modes, pa.string()),
                "n_accessible": pa.array(n_acc, pa.int64()),
                "sum_class_weight": pa.array(s_cw, pa.int64()),
                "n_speed": pa.array(n_sp, pa.int64()),
                "sum_speed_x100": pa.array(s_sp, pa.int64()),
            }
        )

    agg = ds.map_batches(_partial, batch_format="pyarrow").groupby("mode").sum(
        ["n_accessible", "sum_class_weight", "n_speed", "sum_speed_x100"]
    )
    return agg.map_batches(
        lambda t: t.rename_columns(
            ["mode", "n_accessible", "sum_class_weight", "n_speed", "sum_speed_x100"]
        ),
        batch_format="pyarrow",
    )


def sql_transport_access() -> str:
    """Independent SQL re-derivation: hierarchy-chain join + max-specificity
    window (``osm/mod.rs:200-235``) + regex speed parse + class CASE."""
    from ..metadata import ROAD_CLASS_WEIGHT, SPECIFICITY, TRANSPORT_CHAIN
    from ..oracle_match import planted_metadata_world

    path = planted_metadata_world()
    query_modes = ("foot", "bicycle", "motorcar", "bus", "hgv")
    chain_rows = ", ".join(
        f"('{m}', '{anc}')" for m in query_modes for anc in TRANSPORT_CHAIN[m]
    )
    spec_rows = ", ".join(f"('{t}', {s})" for t, s in SPECIFICITY.items())
    class_cases = " ".join(
        f"WHEN '{k}' THEN {v}" for k, v in ROAD_CLASS_WEIGHT.items()
    )
    return rf"""
    WITH e AS (SELECT * FROM read_parquet('{path}')),
    modes(mode) AS (VALUES {', '.join(f"('{m}')" for m in query_modes)}),
    chain(mode, anc) AS (VALUES {chain_rows}),
    spec(tmode, s) AS (VALUES {spec_rows}),
    exploded AS (SELECT edge_id, dir, unnest(access_tags) AS tag FROM e),
    flat AS (
      SELECT edge_id, dir, tag['mode'] AS tmode, tag['dir'] AS tdir, tag['value'] AS tval
      FROM exploded
    ),
    applicable AS (
      SELECT f.edge_id, m.mode, f.tval, s.s
      FROM flat f
      JOIN modes m ON TRUE
      JOIN chain c ON c.mode = m.mode AND c.anc = f.tmode
      JOIN spec s ON s.tmode = f.tmode
      WHERE f.tdir = 2 OR (f.tdir = 0 AND f.dir = 0) OR (f.tdir = 1 AND f.dir = 1)
    ),
    win AS (
      SELECT edge_id, mode, tval,
             row_number() OVER (PARTITION BY edge_id, mode ORDER BY s DESC) AS rn
      FROM applicable
    ),
    em AS (SELECT e.edge_id, e.road_class, e.maxspeed, m.mode FROM e, modes m),
    decided AS (
      SELECT em.edge_id, em.mode, em.road_class, em.maxspeed,
             CASE WHEN w.tval IS NULL THEN TRUE  -- default allow
                  WHEN w.tval = 'yes' THEN TRUE
                  ELSE FALSE END AS acc
      FROM em
      LEFT JOIN (SELECT edge_id, mode, tval FROM win WHERE rn = 1) w
        ON w.edge_id = em.edge_id AND w.mode = em.mode
    ),
    scored AS (
      SELECT mode, acc,
             CASE road_class {class_cases} ELSE 50 END AS cw,
             CASE WHEN maxspeed IS NULL THEN NULL
                  WHEN lower(trim(maxspeed)) = 'none' THEN 200.0
                  WHEN lower(trim(maxspeed)) = 'walk' THEN 5.0
                  ELSE CAST(regexp_extract(lower(split_part(maxspeed, '@', 1)),
                                           '(\d+(?:\.\d+)?)', 1) AS DOUBLE)
                       * (CASE WHEN lower(split_part(maxspeed, '@', 1)) LIKE '%mph%'
                               THEN 1.609344
                               WHEN lower(split_part(maxspeed, '@', 1)) LIKE '%knots%'
                               THEN 1.852 ELSE 1.0 END)
             END AS kmh
      FROM decided
    )
    SELECT mode,
           CAST(SUM(CASE WHEN acc THEN 1 ELSE 0 END) AS BIGINT) AS n_accessible,
           CAST(SUM(CASE WHEN acc THEN cw ELSE 0 END) AS BIGINT) AS sum_class_weight,
           CAST(SUM(CASE WHEN kmh IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_speed,
           CAST(SUM(CASE WHEN kmh IS NOT NULL THEN CAST(floor(kmh * 100 + 0.5) AS BIGINT)
                    ELSE 0 END) AS BIGINT) AS sum_speed_x100
    FROM scored GROUP BY mode
    """


_MATCH_WORLD: dict = {}


def _match_world(n_docs: int = 120):
    """Deterministic matching world (network store + corpus), built once per
    process under /tmp — the flagship's fixture for correctness runs."""
    key = n_docs
    if key not in _MATCH_WORLD:
        import tempfile

        from ..network import build_network_store, synth_network
        from ..synth import synth_corpus, write_corpus

        root = tempfile.mkdtemp(prefix="routers_ray_world_")
        nodes, edges = synth_network(seed=42, n_cities=2, grid=(8, 8))
        store = f"{root}/netstore"
        build_network_store(nodes, edges, store, use_ray=False)
        docs = synth_corpus(n_docs=n_docs, seed=42, network=(nodes, edges))
        paths = write_corpus(docs, f"{root}/corpus")
        _MATCH_WORLD[key] = {"store": store, "paths": paths}
    return _MATCH_WORLD[key]


def q_span_integrity(sf_dir: str):
    """Per-row span-sequence equality — THE input-contract invariant: the
    match pipeline's OUTPUT must carry every doc's span sequence (kind,
    text, media_ref, order) byte-identical to the INPUT corpus, through
    the salt pre-pass, the routing exchange and the spans strip/rejoin.

    Ray side: full ``match_documents`` run with spans kept; one canonical
    md5 signature row per doc computed FROM THE OUTPUT (vectorized Arrow
    canonical form, one md5 per doc). Oracle side: DuckDB reads the INPUT
    parquet and recomputes the identical canonical form — any dropped,
    reordered or corrupted span anywhere in the pipeline flips the hash,
    so the driver's value-hash check IS the invariant."""
    import hashlib

    import ray.data as rd

    from .match_pipeline import match_documents

    w = _match_world()
    out = match_documents(
        rd.read_parquet(w["paths"]["parquet"]), w["store"], concurrency=2, batch_size=64
    )

    def _sig(b: pa.Table) -> pa.Table:
        ids = np.asarray(b["doc_id"].to_pylist(), dtype=object)
        _, first = np.unique(ids, return_index=True)
        sub = b.take(pa.array(np.sort(first)))
        col = sub["spans"].combine_chunks()
        if isinstance(col, pa.ChunkedArray):
            col = (
                pa.concat_arrays(col.chunks)
                if col.num_chunks
                else pa.array([], col.type)
            )
        offs = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        offs = offs - offs[0]
        flat = col.flatten()
        nul = "\x00"
        per_span = pc.binary_join_element_wise(
            pc.struct_field(flat, "kind"),
            pc.fill_null(pc.struct_field(flat, "text"), nul),
            pc.fill_null(pc.struct_field(flat, "media_ref"), nul),
            "\x1f",
        )
        lists = pa.ListArray.from_arrays(pa.array(offs, pa.int32()), per_span)
        canon = pc.binary_join(lists, "\x1e").to_pylist()
        sigs = [hashlib.md5((c or "").encode()).hexdigest() for c in canon]
        return pa.table(
            {
                "doc_id": sub["doc_id"],
                "n_spans": pa.array(np.diff(offs), pa.int64()),
                "span_sig": pa.array(sigs, pa.string()),
            }
        )

    return (
        out.map_batches(_sig, batch_format="pyarrow")
        .groupby("doc_id")
        .map_groups(lambda g: g.head(1), batch_format="pandas")
    )


def sql_span_integrity() -> str:
    w = _match_world()
    return f"""
    WITH docs AS (SELECT * FROM read_parquet('{w["paths"]["parquet"]}')),
    s AS (
      SELECT doc_id, i,
             spans[i].kind AS kind,
             coalesce(spans[i].text, chr(0)) AS text,
             coalesce(spans[i].media_ref, chr(0)) AS media_ref
      FROM docs, UNNEST(generate_series(1, len(spans))) AS r(i)
    ),
    sig AS (
      SELECT doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_spans,
             md5(string_agg(kind || chr(31) || text || chr(31) || media_ref,
                            chr(30) ORDER BY i)) AS span_sig
      FROM s GROUP BY doc_id
    )
    SELECT doc_id, n_spans, span_sig FROM sig
    UNION ALL
    SELECT doc_id, CAST(0 AS BIGINT), md5('') FROM docs WHERE len(spans) = 0
    """


def q_match(sf_dir: str):
    """FLAGSHIP: Viterbi map-match of the interleaved-doc corpus (synth
    world, deterministic). Returns per-point matched rows. Non-SQL."""
    import ray.data as rd

    from .match_pipeline import match_documents, matched_ok

    w = _match_world()
    ds = rd.read_parquet(w["paths"]["parquet"])
    matched = match_documents(ds, w["store"], concurrency=2, batch_size=64, keep_spans=False)
    ok = matched_ok(matched)
    return ok.map_batches(
        lambda t: pa.table(
            {
                "doc_id": t["doc_id"],
                "seq": pc.cast(t["seq"], pa.int64()),
                "edge_id": t["edge_id"],
                "dir": pc.cast(t["dir"], pa.int64()),
                "src": t["src"],
                "dst": t["dst"],
                "snap_lon": pa.array(r6(np.asarray(t["snap_lon"])), pa.float64()),
                "snap_lat": pa.array(r6(np.asarray(t["snap_lat"])), pa.float64()),
                "cost": pc.cast(t["cost"], pa.int64()),
                "cell": pc.cast(t["cell"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def sql_match() -> str:
    """Oracle SQL for the flagship match: selects the driver-side expected
    rows recomputed WITHOUT the Ray pipeline (independent span parse +
    pure-Python Viterbi + scalar assembly — see
    :mod:`routers_ray.oracle_match` for the stated independence boundary).
    Lazy: generating the expected parquet costs a couple of seconds, so the
    registry stores this callable and resolvers call it on demand."""
    from ..oracle_match import expected_parquet_paths

    p = expected_parquet_paths(_match_world(), 120)
    return (
        "SELECT doc_id, seq, edge_id, dir, src, dst, snap_lon, snap_lat, "
        f"cost, cell FROM read_parquet('{p['match']}')"
    )


SIMPLIFY_EPS_DEG = 2e-4  # ~22 m: above GPS noise, below block length


def q_simplify_tracks(sf_dir: str):
    """Douglas-Peucker polyline simplification per doc (vectorized
    intervals, NO shuffle — a doc's points live in its row). Emits the
    kept vertices (doc_id, seq, r6 lon/lat); the oracle recomputes the
    keep set with an independent recursive scalar DP."""
    import ray.data as rd

    from ..simplify import simplify_mask
    from ..spans import parse_trajectories

    w = _match_world()
    ds = rd.read_parquet(w["paths"]["parquet"])

    def _simp(b: pa.Table) -> pa.Table:
        t = parse_trajectories(b)
        doc_ids = t["doc_id"].to_pylist()
        lon_l = t["pts_lon"].combine_chunks() if isinstance(t["pts_lon"], pa.ChunkedArray) else t["pts_lon"]
        lat_l = t["pts_lat"].combine_chunks() if isinstance(t["pts_lat"], pa.ChunkedArray) else t["pts_lat"]
        offs = lon_l.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        offs = offs - offs[0]  # flatten() rebases; slice-proof the pairing
        lon = lon_l.flatten().to_numpy(zero_copy_only=False)
        lat = lat_l.flatten().to_numpy(zero_copy_only=False)
        o_doc, o_seq, o_lon, o_lat = [], [], [], []
        for i, d in enumerate(doc_ids):
            lo, hi = offs[i], offs[i + 1]
            if hi == lo:
                continue
            keep = simplify_mask(lon[lo:hi], lat[lo:hi], SIMPLIFY_EPS_DEG)
            ks = np.flatnonzero(keep)
            o_doc.extend([d] * len(ks))
            o_seq.append(ks.astype(np.int64))
            o_lon.append(lon[lo:hi][ks])
            o_lat.append(lat[lo:hi][ks])
        if not o_doc:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.string()),
                    "seq": pa.array([], pa.int64()),
                    "lon": pa.array([], pa.float64()),
                    "lat": pa.array([], pa.float64()),
                }
            )
        return pa.table(
            {
                "doc_id": pa.array(o_doc, pa.string()),
                "seq": pa.array(np.concatenate(o_seq), pa.int64()),
                "lon": pa.array(r6(np.concatenate(o_lon)), pa.float64()),
                "lat": pa.array(r6(np.concatenate(o_lat)), pa.float64()),
            }
        )

    return ds.map_batches(_simp, batch_format="pyarrow")


def sql_simplify_tracks() -> str:
    """Lazy oracle: SELECTs the independent scalar-DP expected parquet."""
    from ..oracle_match import simplify_expected_path

    p = simplify_expected_path(_match_world(), SIMPLIFY_EPS_DEG)
    return f"SELECT doc_id, seq, lon, lat FROM read_parquet('{p}')"


RESAMPLE_K = 8


def q_resample_tracks(sf_dir: str):
    """Fixed-count trajectory resampling: each doc linearly interpolated
    at 8 evenly spaced times between its first and last timestamp —
    per-doc, NO shuffle (the streaming uniform-rate re-emission shape).
    Oracled against an independent bisect/plain-float scalar recompute."""
    import ray.data as rd

    from ..simplify import resample_track
    from ..spans import parse_trajectories

    w = _match_world()
    ds = rd.read_parquet(w["paths"]["parquet"])

    def _res(b: pa.Table) -> pa.Table:
        t = parse_trajectories(b)
        doc_ids = t["doc_id"].to_pylist()
        cols = {}
        for c in ("pts_lon", "pts_lat", "pts_ts"):
            arr = t[c].combine_chunks() if isinstance(t[c], pa.ChunkedArray) else t[c]
            cols[c] = arr
        offs = cols["pts_lon"].offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        offs = offs - offs[0]  # flatten() rebases; slice-proof the pairing
        lon = cols["pts_lon"].flatten().to_numpy(zero_copy_only=False)
        lat = cols["pts_lat"].flatten().to_numpy(zero_copy_only=False)
        tss = cols["pts_ts"].flatten().to_numpy(zero_copy_only=False)
        o_doc, o_j, o_lon, o_lat = [], [], [], []
        for i, d in enumerate(doc_ids):
            lo, hi = offs[i], offs[i + 1]
            if hi == lo:
                continue
            j, rl, rt = resample_track(lon[lo:hi], lat[lo:hi], tss[lo:hi], RESAMPLE_K)
            o_doc.extend([d] * len(j))
            o_j.append(j)
            o_lon.append(rl)
            o_lat.append(rt)
        if not o_doc:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.string()),
                    "j": pa.array([], pa.int64()),
                    "lon": pa.array([], pa.float64()),
                    "lat": pa.array([], pa.float64()),
                }
            )
        return pa.table(
            {
                "doc_id": pa.array(o_doc, pa.string()),
                "j": pa.array(np.concatenate(o_j), pa.int64()),
                "lon": pa.array(r6(np.concatenate(o_lon)), pa.float64()),
                "lat": pa.array(r6(np.concatenate(o_lat)), pa.float64()),
            }
        )

    return ds.map_batches(_res, batch_format="pyarrow")


def sql_resample_tracks() -> str:
    from ..oracle_match import resample_expected_path

    p = resample_expected_path(_match_world(), RESAMPLE_K)
    return f"SELECT doc_id, j, lon, lat FROM read_parquet('{p}')"


CAPPED_K = 6  # binding on the match world (layer sizes: p50 8, max 16)


def q_match_capped(sf_dir: str):
    """Adaptive candidate reduction: the flagship match with
    ``MatchOptions(max_candidates=6)`` — only the 6 nearest candidates
    per point enter the trellis (the dense-city "adaptive radius" lever;
    pair work drops ~quadratically). OPT-IN semantics, so it carries its
    own oracle; the default `match` stays uncapped."""
    import ray.data as rd

    from ..matcher import MatchOptions
    from .match_pipeline import match_documents, matched_ok

    w = _match_world()
    ds = rd.read_parquet(w["paths"]["parquet"])
    matched = match_documents(
        ds,
        w["store"],
        options=MatchOptions(max_candidates=CAPPED_K),
        concurrency=2,
        batch_size=64,
        keep_spans=False,
    )
    ok = matched_ok(matched)
    return ok.map_batches(
        lambda t: pa.table(
            {
                "doc_id": t["doc_id"],
                "seq": pc.cast(t["seq"], pa.int64()),
                "edge_id": t["edge_id"],
                "dir": pc.cast(t["dir"], pa.int64()),
                "src": t["src"],
                "dst": t["dst"],
                "snap_lon": pa.array(r6(np.asarray(t["snap_lon"])), pa.float64()),
                "snap_lat": pa.array(r6(np.asarray(t["snap_lat"])), pa.float64()),
                "cost": pc.cast(t["cost"], pa.int64()),
                "cell": pc.cast(t["cell"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def sql_match_capped() -> str:
    """Expected rows recomputed with the INDEPENDENT scalar cap (pure-
    Python (dist, index) sort per layer in oracle_match) + pure-Python
    Viterbi — lazy like sql_match."""
    from ..oracle_match import expected_parquet_paths

    p = expected_parquet_paths(_match_world(), 120, max_candidates=CAPPED_K)
    return (
        "SELECT doc_id, seq, edge_id, dir, src, dst, snap_lon, snap_lat, "
        f"cost, cell FROM read_parquet('{p['match']}')"
    )


def sql_match_tiles() -> str:
    """Oracle SQL for the tile materialization — expected tiles built by an
    independent scalar slippy/FNV-1a/splitmix64/Hilbert path over the
    expected match rows."""
    from ..oracle_match import expected_parquet_paths

    p = expected_parquet_paths(_match_world(), 120)
    return (
        "SELECT z, x, y, n_points, doc_ids_hash, hilbert "
        f"FROM read_parquet('{p['match_tiles']}')"
    )


def q_match_tiles(sf_dir: str):
    """Tile materialization over the flagship match output. Non-SQL."""
    from .match_pipeline import match_documents, matched_ok
    from ..tiles import materialize_tiles
    import ray.data as rd

    w = _match_world()
    ds = rd.read_parquet(w["paths"]["parquet"])
    matched = match_documents(ds, w["store"], concurrency=2, batch_size=64, keep_spans=False)
    t = materialize_tiles(matched_ok(matched), zooms=[10, 13])
    return pa.table(
        {
            "z": pc.cast(t["z"], pa.int64()),
            "x": pc.cast(t["x"], pa.int64()),
            "y": pc.cast(t["y"], pa.int64()),
            "n_points": t["n_points"],
            "doc_ids_hash": pa.array(np.asarray(t["doc_ids_hash"]).astype(np.uint64).view(np.int64), pa.int64()),
            "hilbert": pc.cast(t["hilbert"], pa.int64()),
        }
    )




# ---------------------------------------------------------------------------
# round-1 additions: timezone, sessionization, embedding dups, n-gram jaccard


def q_timezone(sf_dir: str):
    """Point→timezone via the prebuilt cell table (actor-pool lookup,
    ``routers_tz`` S2-cell index shape): per-band event counts."""
    import ray.data as rd

    from ..timezone import timezone_of

    ds = rd.read_parquet(_pq(sf_dir, "events"), columns=["event_id"])

    def _pts(b: pa.Table) -> pa.Table:
        lon, lat = event_lonlat(np.asarray(b["event_id"]))
        return pa.table({"lon": pa.array(lon, pa.float64()), "lat": pa.array(lat, pa.float64())})

    tz = timezone_of(ds.map_batches(_pts, batch_format="pyarrow"))
    out = tz.groupby(["tz_band", "tz_name"]).count()
    return out.map_batches(
        lambda t: t.rename_columns(["tz_band", "tz_name", "n"]), batch_format="pyarrow"
    )


def sql_timezone() -> str:
    # band from the zoom-7 cell center longitude — exactly the table the
    # actor builds (both formulas are exact dyadic arithmetic)
    return f"""
    WITH pts AS ({SQL_EVENT_PTS}),
    c AS (
      SELECT CAST(floor((lon + 180.0)/360.0*128.0) AS BIGINT) AS x FROM pts
    ),
    b AS (
      SELECT CAST(floor((((CAST(x AS DOUBLE)+0.5)/128.0*360.0 - 180.0) + 187.5)/15.0) AS BIGINT) % 24 AS tz_band
      FROM c
    )
    SELECT tz_band,
           CASE WHEN tz_band = 12 THEN 'Etc/GMT'
                WHEN tz_band > 12 THEN concat('Etc/GMT-', CAST(tz_band - 12 AS VARCHAR))
                ELSE concat('Etc/GMT+', CAST(12 - tz_band AS VARCHAR)) END AS tz_name,
           COUNT(*) AS n
    FROM b GROUP BY 1, 2
    """


def q_sessionize(sf_dir: str):
    """Gap-based session windows per user (30 min), the streaming-shaped
    per-key ordered aggregation: (user, session) → count + duration."""
    import pandas as pd
    import ray.data as rd

    GAP_US = 30 * 60 * 1_000_000

    ds = rd.read_parquet(_pq(sf_dir, "events"), columns=["event_id", "user_id", "ts"])

    def _sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        ts = g["ts"].astype("int64").to_numpy()
        newsess = np.concatenate(([1], (np.diff(ts) > GAP_US).astype(np.int64)))
        sid = np.cumsum(newsess)
        df = pd.DataFrame({"user_id": g["user_id"].to_numpy(), "session": sid, "ts": ts})
        agg = df.groupby(["user_id", "session"], as_index=False).agg(
            n_events=("ts", "size"), dur_us=("ts", lambda x: int(x.max() - x.min()))
        )
        return agg

    return ds.groupby("user_id").map_groups(_sessions, batch_format="pandas")


def sql_sessionize() -> str:
    return """
    WITH seq AS (
      SELECT user_id, event_id, epoch_us(ts) AS ts_us,
             lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
      FROM events
    ),
    marked AS (
      SELECT user_id, ts_us,
             CASE WHEN prev_us IS NULL OR ts_us - prev_us > 1800000000 THEN 1 ELSE 0 END AS new_s
      FROM seq
    ),
    sess AS (
      SELECT user_id, ts_us,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts_us ROWS UNBOUNDED PRECEDING) AS session
      FROM marked
    )
    SELECT user_id, CAST(session AS BIGINT) AS session, COUNT(*) AS n_events,
           CAST(MAX(ts_us) - MIN(ts_us) AS BIGINT) AS dur_us
    FROM sess GROUP BY user_id, session
    """


def q_embed_dups(sf_dir: str):
    """Embedding-cosine near-duplicate pairs (threshold 0.95, a < b) — the
    embedding leg of the dedup suite. Partial pairs per batch against the
    broadcast full matrix (upper triangle by id).

    This is the SMALL-SIDE EXACT ORACLE variant — O(N²) compute with the
    full matrix broadcast into every batch; fine at sf scale, not a
    corpus-scale path. The scale route is ``embed_dups_lsh`` (bucketed
    co-bucket → verify, oracled on the planted cluster world)."""
    import ray.data as rd

    from ..sim import _stack_embeddings

    full = papq.read_table(_pq(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    all_ids = np.asarray(full["vec_id"], dtype=np.int64)
    order = np.argsort(all_ids)
    all_ids = all_ids[order]
    all_vecs = _stack_embeddings(full["embedding"])[order]
    norms = np.linalg.norm(all_vecs, axis=1)

    ds = rd.read_parquet(_pq(sf_dir, "embeddings"), columns=["vec_id", "embedding"])

    def _pairs(b: pa.Table) -> pa.Table:
        ids = np.asarray(b["vec_id"], dtype=np.int64)
        vecs = _stack_embeddings(b["embedding"])
        if vecs.size == 0:
            return pa.table({"id_a": pa.array([], pa.int64()),
                             "id_b": pa.array([], pa.int64()),
                             "sim": pa.array([], pa.float64())})
        vn = np.linalg.norm(vecs, axis=1)
        sims = (vecs @ all_vecs.T) / np.maximum(vn[:, None] * norms[None, :], 1e-300)
        sims = np.floor(sims * 1e6 + 0.5) / 1e6
        aa, bb = np.nonzero((sims >= 0.95) & (ids[:, None] < all_ids[None, :]))
        return pa.table(
            {
                "id_a": pa.array(ids[aa], pa.int64()),
                "id_b": pa.array(all_ids[bb], pa.int64()),
                "sim": pa.array(sims[aa, bb], pa.float64()),
            }
        )

    out = ds.map_batches(_pairs, batch_format="pyarrow")
    # collect with the schema pinned: an empty pair set must still present
    # its columns to the comparator
    schema = pa.schema([("id_a", pa.int64()), ("id_b", pa.int64()), ("sim", pa.float64())])
    tabs = [
        t if isinstance(t, pa.Table) else pa.Table.from_batches([t])
        for t in out.iter_batches(batch_format="pyarrow")
    ]
    tabs = [t.cast(schema) for t in tabs if t.num_rows]
    return pa.concat_tables(tabs) if tabs else schema.empty_table()


def sql_embed_dups() -> str:
    return """
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           floor(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))*1000000 + 0.5)/1000000 AS sim
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE floor(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))*1000000 + 0.5)/1000000 >= 0.95
    """


def q_ngram_jaccard(sf_dir: str):
    """Token-set Jaccard of consecutive doc pairs (id, id+1) — the exact
    n-gram-overlap verification kernel of the near-dup suite, SQL-checkable.

    Distributed shape (``dedup_minhash``'s verify tail): each doc emits a
    (doc_a=id, doc_b=id+1, text_a) pair seed; one hash join against the
    (doc_id, text) projection lands the partner text in the same batch,
    where the token-set Jaccard is computed — no driver gather, only pair
    rows + referenced texts ride the exchange."""
    import ray.data as rd

    ds = rd.read_parquet(_pq(sf_dir, "documents"), columns=["doc_id", "text"])
    if ds.count() == 0:  # Ray's hash join rejects a 0-row left side
        return pa.table(
            {"doc_id": pa.array([], pa.int64()), "jaccard": pa.array([], pa.float64())}
        )

    def _seed(b: pa.Table) -> pa.Table:
        ids = pc.cast(b["doc_id"], pa.int64())
        return pa.table(
            {
                "doc_a": ids,
                "doc_b": pc.add(ids, pa.scalar(1, pa.int64())),
                "text_a": b["text"],
            }
        )

    def _proj(b: pa.Table) -> pa.Table:
        return pa.table({"doc_id": pc.cast(b["doc_id"], pa.int64()), "text": b["text"]})

    seeds = ds.map_batches(_seed, batch_format="pyarrow")
    docs_proj = ds.map_batches(_proj, batch_format="pyarrow")
    joined = seeds.join(
        docs_proj, "inner", 8, on=("doc_b",), right_on=("doc_id",)
    )

    def _jac(b: pa.Table) -> pa.Table:
        # vectorized token-set Jaccard (single-space split = SQL
        # string_split): dictionary-encode ALL tokens of the batch into one
        # int code space, distinct per (row, side) via np.unique on a
        # packed (row<<32|code) key, intersect per row — no Python loop
        n = b.num_rows
        ta = pc.fill_null(b["text_a"], "")
        tb = pc.fill_null(b["text"], "")
        la = pc.split_pattern(ta, " ")
        lb = pc.split_pattern(tb, " ")
        flat = pa.chunked_array(
            [pc.list_flatten(la), pc.list_flatten(lb)]
        ).combine_chunks()
        codes_all = pc.dictionary_encode(flat).indices.to_numpy(zero_copy_only=False)
        counts_a = pc.list_value_length(la).cast(pa.int64()).to_numpy(zero_copy_only=False)
        counts_b = pc.list_value_length(lb).cast(pa.int64()).to_numpy(zero_copy_only=False)
        na_flat = int(counts_a.sum())
        rows_a = np.repeat(np.arange(n, dtype=np.int64), counts_a)
        rows_b = np.repeat(np.arange(n, dtype=np.int64), counts_b)
        key_a = np.unique((rows_a << np.int64(32)) | codes_all[:na_flat])
        key_b = np.unique((rows_b << np.int64(32)) | codes_all[na_flat:])
        n_a = np.bincount(key_a >> np.int64(32), minlength=n)
        n_b = np.bincount(key_b >> np.int64(32), minlength=n)
        both = np.intersect1d(key_a, key_b, assume_unique=True)
        inter = np.bincount(both >> np.int64(32), minlength=n)
        union = n_a + n_b - inter
        with np.errstate(invalid="ignore", divide="ignore"):
            jac = np.where(union > 0, inter / np.maximum(union, 1), 1.0)
        out = np.floor(jac * 1e6 + 0.5) / 1e6
        return pa.table(
            {
                "doc_id": pc.cast(b["doc_a"], pa.int64()),
                "jaccard": pa.array(out, pa.float64()),
            }
        )

    return joined.map_batches(_jac, batch_format="pyarrow")


def sql_ngram_jaccard() -> str:
    return r"""
    WITH toks AS (
      SELECT doc_id, list_distinct(string_split(text, ' ')) AS t FROM documents
    )
    SELECT a.doc_id AS doc_id,
           floor(CAST(len(list_intersect(a.t, b.t)) AS DOUBLE)
                 / CAST(len(a.t) + len(b.t) - len(list_intersect(a.t, b.t)) AS DOUBLE) * 1000000 + 0.5)/1000000 AS jaccard
    FROM toks a JOIN toks b ON b.doc_id = a.doc_id + 1
    """


DECON_N = 3  # word n-gram order for the contamination scan
DECON_MOD = 50  # benchmark subset: doc_id % DECON_MOD == 0


def q_decontaminate(sf_dir: str):
    """Benchmark decontamination: corpus docs sharing any word 3-gram with
    the benchmark subset (doc_id % 50 == 0), with the distinct-hit count —
    the eval-leakage scan run before a pretraining cut. Broadcast-small-
    side shape (``text.decontaminate``): the benchmark n-gram set gathers
    once, the corpus pass is a single shuffle-free map_batches."""
    import ray.data as rd

    from ..text import decontaminate

    ds = rd.read_parquet(_pq(sf_dir, "documents"), columns=["doc_id", "text"])
    return decontaminate(ds, n=DECON_N, benchmark_mod=DECON_MOD)


def sql_decontaminate() -> str:
    return f"""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    ng AS (
      SELECT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS g
      FROM toks, UNNEST(generate_series(1, len(t)-{DECON_N - 1})) AS r(i)
      WHERE len(t) >= {DECON_N}
    ),
    block AS (SELECT DISTINCT g FROM ng WHERE doc_id % {DECON_MOD} = 0),
    d AS (SELECT DISTINCT doc_id, g FROM ng WHERE doc_id % {DECON_MOD} <> 0)
    SELECT d.doc_id AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_hits
    FROM d JOIN block USING (g) GROUP BY 1
    """


def q_top_tokens(sf_dir: str):
    """Distributed word count with exact top-k: per-batch partial token
    counts → groupby sum → top 20 (ties to the lexicographically smallest
    token) — the canonical pre-aggregate-before-shuffle wordcount."""
    import pandas as pd
    import ray.data as rd

    ds = rd.read_parquet(_pq(sf_dir, "documents"), columns=["text"])

    def _partial(b: pa.Table) -> pa.Table:
        toks = pc.list_flatten(pc.split_pattern(b["text"], " "))
        vc = toks.value_counts()
        return pa.table(
            {
                "token": vc.field("values"),
                "n": pc.cast(vc.field("counts"), pa.int64()),
            }
        )

    agg = ds.map_batches(_partial, batch_format="pyarrow").groupby("token").sum("n")

    # Distributed top-k finish: groupby output blocks hold DISJOINT tokens
    # with their FINAL counts, so a per-block top-20 (same total order) can
    # never drop a global top-20 token.  Only blocks×20 rows reach the
    # driver — never the full vocabulary.
    def _block_top(b: pa.Table) -> pa.Table:
        b = b.rename_columns(["token", "n"])
        idx = pc.sort_indices(
            b, sort_keys=[("n", "descending"), ("token", "ascending")]
        )[:20]
        return b.take(idx)

    small = agg.map_batches(_block_top, batch_format="pyarrow").to_pandas()
    top = small.sort_values(["n", "token"], ascending=[False, True]).head(20)
    return pa.table(
        {"token": pa.array(top["token"].astype(str), pa.string()), "n": pa.array(top["n"].astype("int64"), pa.int64())}
    )


def sql_top_tokens() -> str:
    return """
    WITH toks AS (
      SELECT unnest(string_split(text, ' ')) AS token FROM documents
    )
    SELECT token, COUNT(*) AS n FROM toks GROUP BY token
    ORDER BY n DESC, token LIMIT 20
    """


# ---------------------------------------------------------------------------
# registry


def registry() -> dict[str, tuple]:
    """name → (ray_fn, oracle_sql | None).

    ORDER MATTERS: the correctness driver verifies only the FIRST 50
    entries.  Policy (round-5): (1) the flagship match family and any
    query that has never had a driver row come first; (2) queries whose
    last green row is oldest come next; (3) the tail holds the
    most-recently-verified, lowest-risk scalar aggregations, rotated
    back into the window on subsequent rounds so every query regains a
    driver row within two rounds.
    """
    return {
        # --- flagship + never-driver-checked (r5 window priority 1) ---
        # sql side of the match family is a LAZY callable
        # (expected-parquet generation is paid only when an oracle
        # consumer resolves it)
        "match": (q_match, sql_match),
        # r5-new: the input-contract invariant (span-sequence equality
        # through the full match pipeline), never driver-checked before
        "span_integrity": (q_span_integrity, sql_span_integrity),
        "match_tiles": (q_match_tiles, sql_match_tiles),
        "match_capped": (q_match_capped, sql_match_capped),
        "simplify_tracks": (q_simplify_tracks, sql_simplify_tracks),
        "resample_tracks": (q_resample_tracks, sql_resample_tracks),
        "speed_limits": (q_speed_limits, sql_speed_limits),
        # --- green in r03 but outside the r04 window (priority 2) ---
        "timezone": (q_timezone, sql_timezone()),
        "sessionize": (q_sessionize, sql_sessionize()),
        "tiles_dated": (q_tiles_dated, sql_tiles_dated()),
        "transport_access": (q_transport_access, sql_transport_access()),
        "access_windows": (q_access_windows, sql_access_windows),
        # r5-new: stacked clauses + PH/SH holiday tokens (never checked)
        "holiday_access": (q_holiday_access, sql_holiday_access),
        "embed_dups": (q_embed_dups, sql_embed_dups()),
        "embed_norms": (q_embed_norms, sql_embed_norms()),
        "media_features": (q_media_features, sql_media_features()),
        "ngram_jaccard": (q_ngram_jaccard, sql_ngram_jaccard()),
        "top_tokens": (q_top_tokens, sql_top_tokens()),
        "value_percentiles": (q_value_percentiles, sql_value_percentiles()),
        # --- r04-green core geo / raster / join / sketch families ---
        "cell_assign": (q_cell_assign, sql_cell_assign()),
        "tile_rollup": (q_tile_rollup, sql_tile_rollup()),
        "rasterize": (q_rasterize, sql_rasterize()),
        "raster_runs": (q_raster_runs, sql_raster_runs()),
        "raster_pyramid": (q_raster_pyramid, sql_raster_pyramid()),
        "raster_components": (q_raster_components, sql_raster_components()),
        "nn_station": (q_nn_station, sql_nn_station()),
        "knn_station": (q_knn_station, sql_knn_station()),
        # r5-new: the R-tree-backed candidate paths (never checked); must
        # reproduce their broadcast twins exactly (same SQL oracles)
        "knn_rtree": (q_knn_rtree, sql_knn_station()),
        "pip_region": (q_pip_region, sql_pip_region()),
        "pip_rtree": (q_pip_rtree, sql_pip_region()),
        # nation is the fixed 25-row TPC-H table at every sf, so the
        # polygon VALUES literal is sf-invariant
        "pip_polygon": (q_pip_polygon, sql_pip_polygon()),
        "coloc_pairs": (q_coloc_pairs, sql_coloc_pairs()),
        "hausdorff_pairs": (q_hausdorff_pairs, sql_hausdorff_pairs()),
        "frechet_pairs": (q_frechet_pairs, sql_frechet_pairs()),
        "track_clusters": (q_track_clusters, sql_track_clusters()),
        "od_flows": (q_od_flows, sql_od_flows()),
        "track_crossings": (q_track_crossings, sql_track_crossings()),
        "dwell_polygon": (q_dwell_polygon, sql_dwell_polygon()),
        "extent_cells": (q_extent_cells, sql_extent_cells()),
        "cell_transitions": (q_cell_transitions, sql_cell_transitions()),
        "cluster_cells": (q_cluster_cells, sql_cluster_cells()),
        "top_customers": (q_top_customers, sql_top_customers()),
        "hll_users": (q_hll_users, sql_hll_users()),
        # r5: compact/uncompact duality both in-window (both never
        # driver-checked before r5); cms_users (r4-green, sketch pytests)
        # rotates to the tail
        "uncompact_cells": (q_uncompact_cells, sql_uncompact_cells()),
        # r5-new fully-oracled ops take the window slots of the two
        # rows-only entries (whose oracled planted siblings stay in-window)
        "compact_cells": (q_compact_cells, sql_compact_cells()),
        "decontaminate": (q_decontaminate, sql_decontaminate()),
        "minhash_planted": (q_minhash_planted, sql_minhash_planted),
        "ann_topk": (q_ann_topk, sql_ann_topk()),
        "ann_lsh_planted": (q_ann_lsh_planted, sql_ann_lsh_planted),
        "ann_ivf_planted": (q_ann_ivf_planted, sql_ann_ivf_planted),
        # --- tail (entries 51+): r04-green low-risk scalar queries,
        # rotated back into the window next round ---
        "tile_project": (q_tile_project, sql_tile_project()),
        "haversine_track": (q_haversine_track, sql_haversine_track()),
        "agg_pricing": (q_agg_pricing, sql_agg_pricing()),
        "events_window": (q_events_window, sql_events_window()),
        "distinct_users": (q_distinct_users, sql_distinct_users()),
        "dedup_exact": (q_dedup_exact, sql_dedup_exact()),
        "token_stats": (q_token_stats, sql_token_stats()),
        "token_bpe": (q_token_bpe, sql_token_bpe()),
        "quality": (q_quality, sql_quality()),
        "lang_source_stats": (q_lang_source_stats, sql_lang_source_stats()),
        "fingerprint": (q_fingerprint, sql_fingerprint()),
        "simhash": (q_simhash, sql_simhash()),
        "langid": (q_langid, sql_langid()),
        "asof_orders": (q_asof_orders, sql_asof_orders()),
        "range_join": (q_range_join, sql_range_join()),
        "sample_stratified": (q_sample_stratified, sql_sample_stratified()),
        "group_topk": (q_group_topk, sql_group_topk()),
        # r4-green; displaced by the in-window r5 `frechet_pairs` (its
        # exact twin `embed_dups` keeps a current row in-window)
        "embed_dups_lsh": (q_embed_dups_lsh, sql_embed_dups_lsh),
        # r4-green scalar sketches rotated out for the never-checked
        # uncompact_cells / holiday_access (policy: never-checked queries
        # take the window)
        "cms_users": (q_cms_users, sql_cms_users()),
        "heavy_items": (q_heavy_items, sql_heavy_items()),
        "polygon_area": (q_polygon_area, sql_polygon_area()),
        "cover_cells": (q_cover_cells, sql_cover_cells()),
        "coloc_pairs_m": (q_coloc_pairs_m, sql_coloc_pairs_m()),
        # rows-only by design (approximate pipelines over the sf corpus);
        # their oracled planted siblings + precision pytests stay in-window
        "minhash_pairs": (q_minhash_pairs, None),
        "ann_lsh": (q_ann_lsh, None),
    }
