"""Generic track-analytics stages over point Datasets with explicit
``(key, lon, lat, order)`` columns — the reusable-facade form of the
fused event-table queries in :mod:`routers_ray.pipelines.queries`
(which derive coordinates from ids inside groups to keep exchange
bytes down; these take real columns so any table can use them).

All heavy math is shared with the query registry: the symmetric
Hausdorff matrix kernel, the orientation-sign crossing counter, the
even-odd containment test and the associative first/last partial, so
both surfaces stay bit-identical by construction. Shapes follow the
registry versions (reference semantics cited there): per-track rows
move exactly once; finishes are small groupbys.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _ordered(g: pa.Table, lon_col: str, lat_col: str, order_cols: tuple[str, ...]):
    keys = [g[c].to_numpy(zero_copy_only=False) for c in reversed(order_cols)]
    order = np.lexsort(tuple(keys))
    lon = g[lon_col].to_numpy(zero_copy_only=False).astype(np.float64)[order]
    lat = g[lat_col].to_numpy(zero_copy_only=False).astype(np.float64)[order]
    return lon, lat, order


def _ts_us(col) -> np.ndarray:
    v = col.to_numpy(zero_copy_only=False)
    if np.issubdtype(v.dtype, np.datetime64):
        return v.astype("datetime64[us]").view(np.int64)
    return v.astype(np.int64)


def _track_blobs(points_ds, key_col, lon_col, lat_col, order_cols, cell_deg):
    """One row per track: (key, anchor cell, packed float64 blob). The
    anchor packs (cx << 32) | cy — collision-free at ANY cell_deg (the
    earlier decimal packing aliased cells once 180/cell_deg ≥ 1000)."""

    def _track(g: pa.Table) -> pa.Table:
        lon, lat, _ = _ordered(g, lon_col, lat_col, order_cols)
        cx = np.int64(np.floor((lon[0] + 180.0) / cell_deg))
        cy = np.int64(np.floor((lat[0] + 90.0) / cell_deg))
        return pa.table(
            {
                key_col: g[key_col].slice(0, 1).combine_chunks(),
                "cell": pa.array([int((cx << np.int64(32)) | cy)], pa.int64()),
                "pts": pa.array([np.concatenate([lon, lat]).tobytes()], pa.binary()),
            }
        )

    return points_ds.groupby(key_col).map_groups(_track, batch_format="pyarrow")


def _sorted_tracks(g: pa.Table, key_col: str):
    """Group rows → (key array sorted ascending, [(lon, lat)] per track,
    the key's Arrow type for schema-stable empty outputs)."""
    kid = np.asarray(g[key_col])
    blobs = g["pts"].to_pylist()
    order = np.argsort(kid, kind="stable")
    kid = kid[order]
    pts = []
    for i in order.tolist():
        v = np.frombuffer(blobs[i], dtype=np.float64)
        pts.append((v[: v.size // 2], v[v.size // 2:]))
    kt = g[key_col].type if hasattr(g[key_col], "type") else g[key_col].chunk(0).type
    return kid, pts, kt


# Warn when a single pair group exceeds this many tracks — the pair count
# is quadratic, so a group this size is ~8.4M haversine-matrix kernels.
HAUS_GROUP_WARN = 4096


def _log_pair_group(kind: str, n_tracks: int, n_buckets: int) -> None:
    import logging

    logging.getLogger(__name__).warning(
        "%s pair group holds %d tracks (~%d pairs — quadratic by semantics). "
        "Sizing rule: pick cell_deg so expected tracks-per-cell ≈ "
        "sqrt(2·target_pairs_per_task), and/or raise n_pair_buckets to "
        "ceil(tracks_per_cell / target_tracks_per_task) (currently %d) so "
        "each bucket-pair task stays bounded.",
        kind, n_tracks, n_tracks * (n_tracks - 1) // 2, n_buckets,
    )


def _bucket_of(kid: np.ndarray, n_buckets: int) -> np.ndarray:
    """Deterministic track→bucket assignment for the blocked pair join
    (splitmix64 of the key, fnv1a first for string keys)."""
    from .functions import fnv1a_array, splitmix64

    if kid.dtype.kind in "iu":
        return (splitmix64(kid.astype(np.int64)) % np.uint64(n_buckets)).astype(np.int64)
    return (
        splitmix64(fnv1a_array([str(x) for x in kid.tolist()]))
        % np.uint64(n_buckets)
    ).astype(np.int64)


def hausdorff_pair_rows(tracks, key_col: str, *, n_pair_buckets: int = 1):
    """All within-cell track pairs with symmetric Hausdorff distance →
    Dataset ``(cell, a, b, hd_m)`` (``a < b`` in key order, hd r3-rounded).

    ``n_pair_buckets=1`` runs one task per anchor cell (quadratic in the
    cell's track count). ``n_pair_buckets=B > 1`` decomposes each cell's
    pair set into the B·(B+1)/2 bucket-pair tasks of a blocked self-join:
    every track is replicated to the B groups ``(cell, min(b,k), max(b,k))``
    for k in 0..B-1, a diagonal group (i==i) prices its within-bucket
    pairs, an off-diagonal group (i<j) prices only cross-bucket pairs —
    each pair is computed exactly once and no single Ray group exceeds
    ~2·tracks_per_cell/B tracks. Total work is unchanged (the pair set is
    quadratic BY SEMANTICS); what the decomposition buys at scale is
    bounded task memory/runtime and parallelism across the quadratic.

    Sizing rule (100-TB note): with C = expected tracks per anchor cell
    and a per-task budget of P pairs, use n_pair_buckets ≈ C / sqrt(2P);
    shrink cell_deg first — it reduces the SEMANTIC pair count, while
    buckets only spread a fixed pair count across tasks. Oversized groups
    are logged (HAUS_GROUP_WARN), never silently truncated — dropping
    pairs would change results.
    """
    from .pipelines.queries import hausdorff_m, r3

    B = max(1, int(n_pair_buckets))

    def _pairs(g: pa.Table) -> pa.Table:
        kid, pts, kt = _sorted_tracks(g, key_col)
        if kid.size > HAUS_GROUP_WARN:
            _log_pair_group("hausdorff", int(kid.size), B)
        if B > 1:
            order = np.argsort(np.asarray(g[key_col]), kind="stable")
            bk = np.asarray(g["bk"], dtype=np.int64)[order]
            diag = bool(g["bi"][0].as_py() == g["bj"][0].as_py())
        cell0 = int(g["cell"][0].as_py())
        ka, kb, hd = [], [], []
        for i in range(kid.size):
            for j in range(i + 1, kid.size):
                if B > 1 and not diag and bk[i] == bk[j]:
                    continue  # within-bucket pair — owned by the diagonal group
                ka.append(kid[i]), kb.append(kid[j])
                hd.append(hausdorff_m(pts[i][0], pts[i][1], pts[j][0], pts[j][1]))
        # explicit Arrow type so single-track groups (zero pairs) keep the
        # schema for ANY key type (numeric or string) instead of null cols
        return pa.table(
            {
                "cell": pa.array([cell0] * len(ka), pa.int64()),
                "a": pa.array(ka, type=kt),
                "b": pa.array(kb, type=kt),
                "hd_m": pa.array(r3(np.asarray(hd, dtype=np.float64)), pa.float64()),
            }
        )

    if B == 1:
        return tracks.groupby("cell").map_groups(_pairs, batch_format="pyarrow")

    def _replicate(b: pa.Table) -> pa.Table:
        kid = np.asarray(b[key_col])
        bk = _bucket_of(kid, B)
        n = len(b)
        rep = np.repeat(np.arange(n, dtype=np.int64), B)
        k = np.tile(np.arange(B, dtype=np.int64), n)
        bkr = bk[rep]
        out = b.take(pa.array(rep))
        out = out.append_column("bk", pa.array(bkr, pa.int64()))
        out = out.append_column("bi", pa.array(np.minimum(bkr, k), pa.int64()))
        out = out.append_column("bj", pa.array(np.maximum(bkr, k), pa.int64()))
        return out

    return (
        tracks.map_batches(_replicate, batch_format="pyarrow")
        .groupby(["cell", "bi", "bj"])
        .map_groups(_pairs, batch_format="pyarrow")
    )


def components_from_edges(edges_and_roster, key_col: str = "a"):
    """Per-cell connected components over an edge list: input Dataset with
    columns ``(cell, a, b)`` where a==b rows are roster self-loops (every
    track appears once, so singletons survive) and a!=b rows are edges.
    Returns ``(key, cluster_id = min member, cluster_size)`` — union-find
    over EDGES, linear in edges+nodes, never quadratic in tracks."""

    def _components(g: pa.Table) -> pa.Table:
        a = np.asarray(g["a"])
        b = np.asarray(g["b"])
        nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
        ia, ib = inv[: a.size], inv[a.size:]
        parent = np.arange(nodes.size, dtype=np.int64)

        def find(x: int) -> int:
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for i in range(a.size):
            ra, rb = find(int(ia[i])), find(int(ib[i]))
            if ra != rb:
                # nodes sorted ascending → lower index = lower key
                parent[max(ra, rb)] = min(ra, rb)
        roots = np.asarray([find(i) for i in range(nodes.size)])
        _, rinv, counts = np.unique(roots, return_inverse=True, return_counts=True)
        kt = g["a"].type if hasattr(g["a"], "type") else g["a"].chunk(0).type
        return pa.table(
            {
                key_col: pa.array(nodes.tolist(), type=kt),
                "cluster_id": pa.array(nodes[roots].tolist(), type=kt),
                "cluster_size": pa.array(counts[rinv].astype(np.int64), pa.int64()),
            }
        )

    return edges_and_roster.groupby("cell").map_groups(_components, batch_format="pyarrow")


def hausdorff_pairs(points_ds, *, key_col: str, lon_col: str = "lon",
                    lat_col: str = "lat", order_cols: tuple[str, ...] = ("ts",),
                    cell_deg: float = 60.0, n_pair_buckets: int = 1):
    """Symmetric Hausdorff distance between track pairs sharing the
    anchor cell of their first point (see ``hausdorff_pair_rows`` for the
    blocked decomposition and the quadratic-per-cell sizing rule)."""
    tracks = _track_blobs(points_ds, key_col, lon_col, lat_col, order_cols, cell_deg)
    rows = hausdorff_pair_rows(tracks, key_col, n_pair_buckets=n_pair_buckets)
    return rows.drop_columns(["cell"])


def track_crossings(points_ds, *, key_col: str, lon_col: str = "lon",
                    lat_col: str = "lat", order_cols: tuple[str, ...] = ("ts",)):
    """Per-track proper self-intersection count (see ``q_track_crossings``)."""
    from .pipelines.queries import crossing_count

    def _cross(g: pa.Table) -> pa.Table:
        lon, lat, _ = _ordered(g, lon_col, lat_col, order_cols)
        return pa.table(
            {
                key_col: g[key_col].slice(0, 1).combine_chunks(),
                "n_cross": pa.array([crossing_count(lon, lat)], pa.int64()),
            }
        )

    return points_ds.groupby(key_col).map_groups(_cross, batch_format="pyarrow")


def geofence_dwell(points_ds, polygons: dict[int, np.ndarray], *, key_col: str,
                   lon_col: str = "lon", lat_col: str = "lat", ts_col: str = "ts",
                   order_cols: tuple[str, ...] | None = None):
    """Per (track, polygon) both-endpoints-inside segment count and total
    dwell microseconds (see ``q_dwell_polygon``). ``polygons`` maps an
    int id to an (n,2) vertex array (broadcast — keep the dict small or
    ship it via ``ray.put`` at the call site)."""
    from .pipelines.queries import _pip_even_odd

    order_cols = order_cols or (ts_col,)
    boxes = {k: (v[:, 0].min(), v[:, 0].max(), v[:, 1].min(), v[:, 1].max())
             for k, v in polygons.items()}

    def _dwell(g: pa.Table) -> pa.Table:
        lon, lat, order = _ordered(g, lon_col, lat_col, order_cols)
        ts = _ts_us(g[ts_col])[order]
        dt = ts[1:] - ts[:-1]
        key0 = g[key_col].slice(0, 1).combine_chunks()
        kid, polz, npairs, dwell = [], [], [], []
        for k, verts in polygons.items():
            w, e, s, n = boxes[k]
            env = (lon >= w) & (lon <= e) & (lat >= s) & (lat <= n)
            if not env.any():
                continue
            ins = np.zeros(lon.size, dtype=bool)
            ins[env] = _pip_even_odd(lon[env], lat[env], verts)
            both = ins[:-1] & ins[1:]
            c = int(both.sum())
            if c:
                kid.append(key0[0].as_py()), polz.append(k)
                npairs.append(c), dwell.append(int(dt[both].sum()))
        return pa.table(
            {
                key_col: pa.array(kid, key0.type),
                "poly": pa.array(polz, pa.int64()),
                "n_pairs": pa.array(npairs, pa.int64()),
                "dwell_us": pa.array(dwell, pa.int64()),
            }
        )

    return points_ds.groupby(key_col).map_groups(_dwell, batch_format="pyarrow")


def anchor_radius_pairs(points_ds, *, key_col: str, r_deg: float,
                        lon_col: str = "lon", lat_col: str = "lat",
                        order_cols: tuple[str, ...] = ("ts",),
                        metric=None, metric_max: float | None = None):
    """Candidate track pairs whose FIRST points lie within ``r_deg`` of
    each other — the radius-join (`spatialjoin.radius_self_join`) over one
    anchor row per track. A cheap prefilter companion to the quadratic
    Hausdorff join when the deployment accepts anchor-proximity candidate
    semantics (it bounds candidates by geometry, not by grid cell); NOT a
    lower bound on Hausdorff distance — two tracks with distant first
    points can still be Hausdorff-close, so use it only where the anchor
    convention is the pairing contract (as it is for the cell grid)."""
    from .spatialjoin import radius_self_join

    def _first(g: pa.Table) -> pa.Table:
        lon, lat, _ = _ordered(g, lon_col, lat_col, order_cols)
        return pa.table(
            {
                key_col: g[key_col].slice(0, 1).combine_chunks(),
                "lon": pa.array([lon[0]], pa.float64()),
                "lat": pa.array([lat[0]], pa.float64()),
            }
        )

    anchors = points_ds.groupby(key_col).map_groups(_first, batch_format="pyarrow")
    return radius_self_join(
        anchors, r_deg, key_col, metric=metric, metric_max=metric_max
    )


def _hilbert_ordered(ds, xy_cols: tuple[str, str], z: int):
    """Append a Hilbert-d key over ``xy_cols`` at order ``z`` and sort by
    it — locality-preserving output ordering (neighbouring cells land in
    neighbouring blocks, so a downstream tile writer/scanner touches
    contiguous ranges). One distributed sort; opt-in."""
    from .cells import hilbert_xy2d

    def _key(t: pa.Table) -> pa.Table:
        x = t[xy_cols[0]].to_numpy(zero_copy_only=False).astype(np.int64)
        y = t[xy_cols[1]].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column("hilbert", pa.array(hilbert_xy2d(x, y, z), pa.int64()))

    return ds.map_batches(_key, batch_format="pyarrow").sort("hilbert")


def extent_cells(points_ds, *, z: int, lon_col: str = "lon", lat_col: str = "lat",
                 order: str | None = None):
    """Per-cell bounding box + count at slippy zoom ``z`` (see
    ``q_extent_cells``): per-batch partial boxes, Min/Max/Sum finish.
    ``order="hilbert"`` sorts the output along the zoom-``z`` Hilbert
    curve (locality-preserving block layout; one extra sort)."""
    from ray.data.aggregate import Max, Min, Sum

    from .pipelines.queries import extent_boxes_of

    def _boxes(b: pa.Table) -> pa.Table:
        lon = b[lon_col].to_numpy(zero_copy_only=False).astype(np.float64)
        lat = b[lat_col].to_numpy(zero_copy_only=False).astype(np.float64)
        return extent_boxes_of(lon, lat, z)

    agg = (
        points_ds.map_batches(_boxes, batch_format="pyarrow")
        .groupby(["x", "y"])
        .aggregate(Min("min_lon"), Max("max_lon"), Min("min_lat"), Max("max_lat"), Sum("n"))
    )
    out = agg.map_batches(
        lambda t: t.rename_columns(["x", "y", "min_lon", "max_lon", "min_lat", "max_lat", "n"]),
        batch_format="pyarrow",
    )
    if order == "hilbert":
        return _hilbert_ordered(out, ("x", "y"), z)
    return out


def cell_transitions(points_ds, *, z: int, key_col: str, lon_col: str = "lon",
                     lat_col: str = "lat", order_cols: tuple[str, ...] = ("ts",),
                     order: str | None = None):
    """Consecutive-hop flow matrix between zoom-``z`` cells (see
    ``q_cell_transitions``; self-loops excluded). ``order="hilbert"``
    sorts by the SOURCE cell's Hilbert-d (locality-preserving layout)."""
    from .pipelines.queries import transition_partials_of

    def _hops(g: pa.Table) -> pa.Table:
        lon, lat, _ = _ordered(g, lon_col, lat_col, order_cols)
        return transition_partials_of(lon, lat, z)

    out = (
        points_ds.groupby(key_col)
        .map_groups(_hops, batch_format="pyarrow")
        .groupby(["src_x", "src_y", "dst_x", "dst_y"])
        .sum("n")
    )
    out = out.map_batches(
        lambda t: t.rename_columns(["src_x", "src_y", "dst_x", "dst_y", "n"]),
        batch_format="pyarrow",
    )
    if order == "hilbert":
        return _hilbert_ordered(out, ("src_x", "src_y"), z)
    return out


def track_clusters(points_ds, *, key_col: str, max_hd_m: float,
                   lon_col: str = "lon", lat_col: str = "lat",
                   order_cols: tuple[str, ...] = ("ts",), cell_deg: float = 60.0,
                   n_pair_buckets: int = 1):
    """Single-link trajectory clustering: tracks within ``max_hd_m``
    symmetric Hausdorff distance form edges; connected components are
    clusters (see ``q_track_clusters``). Components never span anchor
    cells by construction, so the union-find runs per cell.

    With ``n_pair_buckets > 1`` the quadratic pair pricing is decomposed
    into bounded bucket-pair tasks (``hausdorff_pair_rows``) and the
    union-find runs over the resulting EDGE list per cell — linear in
    edges+tracks, so no single Ray group is quadratic-unbounded."""
    from .pipelines.queries import hausdorff_m, r3

    tracks = _track_blobs(points_ds, key_col, lon_col, lat_col, order_cols, cell_deg)

    if int(n_pair_buckets) > 1:
        # two consumers (pair pricing + roster): pin the built tracks so
        # the points scan + per-key groupby doesn't re-execute per consumer
        tracks = tracks.materialize()
        pairs = hausdorff_pair_rows(tracks, key_col, n_pair_buckets=n_pair_buckets)

        def _edges(t: pa.Table) -> pa.Table:
            keep = t.filter(pa.compute.less_equal(t["hd_m"], max_hd_m))
            return keep.select(["cell", "a", "b"])

        def _roster(t: pa.Table) -> pa.Table:
            return pa.table({"cell": t["cell"], "a": t[key_col], "b": t[key_col]})

        edges = pairs.map_batches(_edges, batch_format="pyarrow")
        roster = tracks.map_batches(_roster, batch_format="pyarrow")
        comp = components_from_edges(edges.union(roster), key_col=key_col)
        return comp

    def _clusters(g: pa.Table) -> pa.Table:
        kid, pts, _ = _sorted_tracks(g, key_col)
        n = kid.size
        parent = list(range(n))

        def find(a: int) -> int:
            while parent[a] != a:
                parent[a] = parent[parent[a]]
                a = parent[a]
            return a

        for i in range(n):
            for j in range(i + 1, n):
                ra, rb = find(i), find(j)
                if ra == rb:
                    continue  # already connected — skip the O(|A||B|) kernel
                h = hausdorff_m(pts[i][0], pts[i][1], pts[j][0], pts[j][1])
                if float(r3(np.asarray([h]))[0]) <= max_hd_m:
                    parent[max(ra, rb)] = min(ra, rb)
        roots = np.asarray([find(i) for i in range(n)])
        _, inv, counts = np.unique(roots, return_inverse=True, return_counts=True)
        return pa.table(
            {
                key_col: pa.array(kid),
                "cluster_id": pa.array(kid[roots]),
                "cluster_size": pa.array(counts[inv].astype(np.int64), pa.int64()),
            }
        )

    return tracks.groupby("cell").map_groups(_clusters, batch_format="pyarrow")
