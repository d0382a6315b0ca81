"""Generic trackops stages (explicit lon/lat/key columns) agree with the
fused event-table registry queries on the same world — both surfaces run
the shared kernels, so equality must be exact."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as papq
import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def points_table():
    from routers_ray.pipelines.queries import event_lonlat

    t = papq.read_table(f"{SF_DIR}/events.parquet", columns=["event_id", "user_id", "ts"])
    eid = np.asarray(t["event_id"], dtype=np.int64)
    lon, lat = event_lonlat(eid)
    return pa.table(
        {
            "user_id": t["user_id"],
            "event_id": t["event_id"],
            "ts": t["ts"],
            "lon": pa.array(lon, pa.float64()),
            "lat": pa.array(lat, pa.float64()),
        }
    )


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_trackops_crossings_equals_query(ray_session, points_table):
    import ray.data as rd

    from routers_ray.pipelines.queries import q_track_crossings
    from routers_ray.trackops import track_crossings

    got = track_crossings(
        rd.from_arrow(points_table), key_col="user_id", order_cols=("ts", "event_id")
    ).to_pandas()
    want = q_track_crossings(SF_DIR).to_pandas()
    pd.testing.assert_frame_equal(_canon(got), _canon(want), check_dtype=False)


def test_trackops_dwell_equals_query(ray_session, points_table):
    import ray.data as rd

    from routers_ray.pipelines.queries import _nation_polygons, q_dwell_polygon
    from routers_ray.trackops import geofence_dwell

    got = geofence_dwell(
        rd.from_arrow(points_table), _nation_polygons(SF_DIR),
        key_col="user_id", ts_col="ts", order_cols=("ts", "event_id"),
    ).to_pandas()
    want = q_dwell_polygon(SF_DIR).to_pandas()
    pd.testing.assert_frame_equal(_canon(got), _canon(want), check_dtype=False)


def test_trackops_extent_equals_query(ray_session, points_table):
    import ray.data as rd

    from routers_ray.pipelines.queries import Z_EXTENT, q_extent_cells
    from routers_ray.trackops import extent_cells

    got = extent_cells(rd.from_arrow(points_table), z=Z_EXTENT).to_pandas()
    want = q_extent_cells(SF_DIR).to_pandas()
    pd.testing.assert_frame_equal(_canon(got), _canon(want), check_dtype=False)


def test_trackops_transitions_equals_query(ray_session, points_table):
    import ray.data as rd

    from routers_ray.pipelines.queries import Z_EXTENT, q_cell_transitions
    from routers_ray.trackops import cell_transitions

    got = cell_transitions(
        rd.from_arrow(points_table), z=Z_EXTENT, key_col="user_id",
        order_cols=("ts", "event_id"),
    ).to_pandas()
    want = q_cell_transitions(SF_DIR).to_pandas()
    pd.testing.assert_frame_equal(_canon(got), _canon(want), check_dtype=False)


def test_trackops_hausdorff_matches_brute(ray_session, points_table):
    """The generic Hausdorff join (lat+90 anchor domain) against a full
    driver-side brute recomputation of the same pairing rule."""
    import ray.data as rd

    from routers_ray.pipelines.queries import hausdorff_m, r3
    from routers_ray.trackops import hausdorff_pairs

    got = (
        hausdorff_pairs(
            rd.from_arrow(points_table), key_col="user_id",
            order_cols=("ts", "event_id"), cell_deg=60.0,
        )
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )

    df = points_table.to_pandas()
    df["ts_us"] = df["ts"].astype("datetime64[us]").astype(np.int64)
    tracks, anchors = {}, {}
    for u, g in df.groupby("user_id"):
        g = g.sort_values(["ts_us", "event_id"])
        lon, lat = g["lon"].to_numpy(), g["lat"].to_numpy()
        tracks[u] = (lon, lat)
        anchors[u] = (
            int(np.floor((lon[0] + 180.0) / 60.0)) * 1000
            + int(np.floor((lat[0] + 90.0) / 60.0))
        )
    rows = []
    users = sorted(tracks)
    for i, ua in enumerate(users):
        for ub in users[i + 1:]:
            if anchors[ua] != anchors[ub]:
                continue
            h = hausdorff_m(*tracks[ua], *tracks[ub])
            rows.append((ua, ub, float(r3(np.asarray([h]))[0])))
    want = pd.DataFrame(rows, columns=["a", "b", "hd_m"]).sort_values(["a", "b"]).reset_index(drop=True)
    assert len(got) == len(want) > 0
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_engine_facade_geo_methods_run(ray_session, points_table):
    """The Engine facade's geo methods are callable without a network
    store (pure Dataset stages) and produce the expected shapes."""
    import ray.data as rd

    from routers_ray.engine import Engine

    eng = Engine.__new__(Engine)  # geo ops don't touch matcher state
    ds = rd.from_arrow(points_table)
    assert eng.extent(ds, z=4).count() > 0
    assert eng.transitions(ds, z=4, key_col="user_id", order_cols=("ts", "event_id")).count() > 0
    pairs = eng.radius_join(ds, 4.0, "event_id").to_pandas()
    assert set(["a", "b", "dist2"]) <= set(pairs.columns) and len(pairs) > 0

    from routers_ray.pipelines.queries import _heavy_items_of

    hh = eng.heavy_hitters(ds, _heavy_items_of, 0.02).to_pandas()
    assert list(hh.columns) == ["item", "n"] and len(hh) > 0


def test_trackops_clusters_match_pairs(ray_session, points_table):
    """Generic track_clusters is consistent with the generic Hausdorff
    pairs: two tracks share a cluster iff they are connected through
    edges with hd ≤ threshold."""
    import ray.data as rd

    from routers_ray.trackops import hausdorff_pairs, track_clusters

    D = 3_500_000.0
    ds = rd.from_arrow(points_table)
    pairs = hausdorff_pairs(
        ds, key_col="user_id", order_cols=("ts", "event_id")
    ).to_pandas()
    clusters = track_clusters(
        ds, key_col="user_id", max_hd_m=D, order_cols=("ts", "event_id")
    ).to_pandas()

    # union-find over the edge list, driver-side
    lab = {int(u): int(u) for u in clusters["user_id"]}

    def find(a):
        while lab[a] != a:
            lab[a] = lab[lab[a]]
            a = lab[a]
        return a

    for _, r in pairs[pairs["hd_m"] <= D].iterrows():
        ra, rb = find(int(r["a"])), find(int(r["b"]))
        if ra != rb:
            lab[max(ra, rb)] = min(ra, rb)
    want = {u: find(u) for u in lab}
    got = dict(zip(clusters["user_id"].astype(int), clusters["cluster_id"].astype(int)))
    assert got == want
    sizes = clusters.groupby("cluster_id")["user_id"].count().to_dict()
    assert all(
        int(r["cluster_size"]) == sizes[int(r["cluster_id"])]
        for _, r in clusters.iterrows()
    )


def test_hausdorff_blocked_buckets_exact(ray_session, points_table):
    """Verdict-r4 #4: the blocked bucket-pair decomposition (B× finer
    PHYSICAL grouping via track replication) reproduces the single-group
    60° result EXACTLY, and no bucket-pair group holds a cell's full
    track set — the quadratic is spread across bounded tasks."""
    import ray.data as rd

    from routers_ray.trackops import _bucket_of, hausdorff_pairs

    ds = rd.from_arrow(points_table)
    base = (
        hausdorff_pairs(ds, key_col="user_id", order_cols=("ts", "event_id"))
        .to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
    )
    assert len(base) > 0
    for B in (2, 3):
        got = (
            hausdorff_pairs(
                ds, key_col="user_id", order_cols=("ts", "event_id"),
                n_pair_buckets=B,
            )
            .to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, base, check_dtype=False)

    # bounded-group evidence on a DENSE synthetic cell (the sf0.001 corpus
    # has no cell with 10+ tracks): 24 two-point tracks sharing one 60°
    # anchor cell; every (bi, bj) bucket-pair group holds c_i + c_j (or
    # c_i on the diagonal) tracks — strictly fewer than the full roster —
    # and the blocked result still equals the single-group one exactly
    n_tracks, B = 24, 3
    uid = np.repeat(np.arange(n_tracks, dtype=np.int64), 2)
    rng = np.arange(2 * n_tracks, dtype=np.float64)
    dense = pa.table(
        {
            "user_id": pa.array(uid),
            "event_id": pa.array(np.arange(2 * n_tracks, dtype=np.int64)),
            "ts": pa.array(np.arange(2 * n_tracks, dtype=np.int64)),
            "lon": pa.array(10.0 + rng * 0.37 % 40.0),
            "lat": pa.array(5.0 + rng * 0.23 % 30.0),
        }
    )
    dds = rd.from_arrow(dense)
    dbase = (
        hausdorff_pairs(dds, key_col="user_id", order_cols=("ts", "event_id"))
        .to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
    )
    assert len(dbase) == n_tracks * (n_tracks - 1) // 2
    dgot = (
        hausdorff_pairs(
            dds, key_col="user_id", order_cols=("ts", "event_id"), n_pair_buckets=B
        )
        .to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(dgot, dbase, check_dtype=False)
    counts = np.bincount(_bucket_of(np.arange(n_tracks, dtype=np.int64), B), minlength=B)
    worst = max(
        int(counts[i] + (counts[j] if j != i else 0))
        for i in range(B) for j in range(i, B)
    )
    assert worst < n_tracks, f"largest bucket-pair group {worst} ≥ roster {n_tracks}"


def test_track_clusters_blocked_exact(ray_session, points_table):
    """Blocked pricing + edge-list union-find (components_from_edges)
    reproduces the quadratic in-group clustering exactly, singletons
    included."""
    import ray.data as rd

    from routers_ray.trackops import track_clusters

    ds = rd.from_arrow(points_table)
    kw = dict(key_col="user_id", max_hd_m=3_500_000.0, order_cols=("ts", "event_id"))
    base = (
        track_clusters(ds, **kw)
        .to_pandas().sort_values("user_id").reset_index(drop=True)
    )
    got = (
        track_clusters(ds, n_pair_buckets=3, **kw)
        .to_pandas().sort_values("user_id").reset_index(drop=True)
    )
    assert len(base) > 0
    pd.testing.assert_frame_equal(
        got[["user_id", "cluster_id", "cluster_size"]].astype("int64"),
        base[["user_id", "cluster_id", "cluster_size"]].astype("int64"),
    )


def test_query_buckets_and_finer_grid_oracle(ray_session):
    """Registry surface: q_hausdorff_pairs / q_track_clusters with
    n_pair_buckets > 1 equal their defaults, and a FINER anchor grid
    (cell_deg=30) with buckets still matches the DuckDB oracle built at
    the same grid — the grid is a parameter, not a constant."""
    import duckdb

    from routers_ray.pipelines.queries import (
        q_hausdorff_pairs,
        q_track_clusters,
        sql_hausdorff_pairs,
    )

    base = q_hausdorff_pairs(SF_DIR).to_pandas().sort_values(["ua", "ub"]).reset_index(drop=True)
    got = (
        q_hausdorff_pairs(SF_DIR, n_pair_buckets=4)
        .to_pandas().sort_values(["ua", "ub"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, base, check_dtype=False)

    cbase = q_track_clusters(SF_DIR).to_pandas().sort_values("user_id").reset_index(drop=True)
    cgot = (
        q_track_clusters(SF_DIR, n_pair_buckets=4)
        .to_pandas().sort_values("user_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        cgot[["user_id", "cluster_id", "cluster_size"]].astype("int64"),
        cbase[["user_id", "cluster_id", "cluster_size"]].astype("int64"),
    )

    # 45° is the finest grid at which the sf0.001 corpus still has pairs
    # (30° leaves none — every track alone in its cell)
    fine = (
        q_hausdorff_pairs(SF_DIR, cell_deg=45.0, n_pair_buckets=2)
        .to_pandas().sort_values(["ua", "ub"]).reset_index(drop=True)
    )
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF_DIR}/events.parquet')"
    )
    want = (
        con.sql(sql_hausdorff_pairs(cell_deg=45.0)).df()
        .sort_values(["ua", "ub"]).reset_index(drop=True)
    )
    assert len(fine) == len(want) > 0
    pd.testing.assert_frame_equal(fine, want, check_dtype=False, check_exact=True)
    # finer grid ⇒ a (strict, on this corpus) subset of the 60° pair set
    assert len(fine) < len(base)


def test_anchor_radius_pairs_vs_brute(ray_session, points_table):
    """anchor_radius_pairs == brute first-point radius join."""
    import ray.data as rd

    from routers_ray.trackops import anchor_radius_pairs

    df = points_table.to_pandas()
    df["ts_us"] = df["ts"].astype("datetime64[us]").astype(np.int64)
    first = df.sort_values(["ts_us", "event_id"]).groupby("user_id").first()
    uid = first.index.to_numpy(dtype=np.int64)
    lon = first["lon"].to_numpy()
    lat = first["lat"].to_numpy()
    d2 = (lon[:, None] - lon[None, :]) ** 2 + (lat[:, None] - lat[None, :]) ** 2
    iu = np.triu_indices(uid.size, k=1)
    # radius that captures the 5 closest first-point pairs (the sf0.001
    # corpus has only ~15 users spread globally — a fixed radius is
    # either empty or all-pairs)
    R = float(np.sqrt(np.sort(d2[iu])[4])) + 1e-9
    rows = []
    for i in range(uid.size):
        for j in range(i + 1, uid.size):
            if d2[i, j] <= R * R:
                a, b = sorted((int(uid[i]), int(uid[j])))
                rows.append((a, b))
    want = sorted(rows)

    got = (
        anchor_radius_pairs(
            rd.from_arrow(points_table), key_col="user_id", r_deg=R,
            order_cols=("ts", "event_id"),
        )
        .to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
    )
    assert len(got) == len(want) > 0
    assert list(zip(got["a"].astype(int), got["b"].astype(int))) == want


def test_hilbert_ordered_variants(ray_session, points_table):
    """order="hilbert" returns the SAME rows as the default, sorted along
    the zoom-z Hilbert curve."""
    import ray.data as rd

    from routers_ray.cells import hilbert_xy2d
    from routers_ray.trackops import cell_transitions, extent_cells

    Z = 4
    ds = rd.from_arrow(points_table)
    plain = extent_cells(ds, z=Z).to_pandas()
    ordered = extent_cells(ds, z=Z, order="hilbert").to_pandas()
    assert "hilbert" in ordered.columns
    h = hilbert_xy2d(ordered["x"].to_numpy(), ordered["y"].to_numpy(), Z)
    assert (ordered["hilbert"].to_numpy() == h.astype(np.int64)).all()
    assert (np.diff(ordered["hilbert"].to_numpy()) >= 0).all()
    key = ["x", "y", "min_lon", "max_lon", "min_lat", "max_lat", "n"]
    pd.testing.assert_frame_equal(
        ordered[key].sort_values(key).reset_index(drop=True),
        plain[key].sort_values(key).reset_index(drop=True),
        check_dtype=False,
    )

    tplain = cell_transitions(
        ds, z=Z, key_col="user_id", order_cols=("ts", "event_id")
    ).to_pandas()
    tordered = cell_transitions(
        ds, z=Z, key_col="user_id", order_cols=("ts", "event_id"), order="hilbert"
    ).to_pandas()
    assert (np.diff(tordered["hilbert"].to_numpy()) >= 0).all()
    tkey = ["src_x", "src_y", "dst_x", "dst_y", "n"]
    pd.testing.assert_frame_equal(
        tordered[tkey].sort_values(tkey).reset_index(drop=True),
        tplain[tkey].sort_values(tkey).reset_index(drop=True),
        check_dtype=False,
    )


def test_hausdorff_blocked_string_keys(ray_session):
    """Blocked decomposition with STRING track keys (fnv1a→splitmix64
    bucket branch): parity vs the single-group path, schema preserved."""
    import ray.data as rd

    from routers_ray.trackops import hausdorff_pairs

    n_tracks = 12
    uid = np.repeat([f"trk-{i:03d}" for i in range(n_tracks)], 3)
    rng = np.arange(3 * n_tracks, dtype=np.float64)
    pt = pa.table(
        {
            "tid": pa.array(uid),
            "ts": pa.array(np.arange(3 * n_tracks, dtype=np.int64)),
            "lon": pa.array(20.0 + rng * 0.91 % 25.0),
            "lat": pa.array(10.0 + rng * 0.53 % 20.0),
        }
    )
    ds = rd.from_arrow(pt)
    base = (
        hausdorff_pairs(ds, key_col="tid", order_cols=("ts",))
        .to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
    )
    assert len(base) == n_tracks * (n_tracks - 1) // 2
    assert base["a"].dtype == object  # string keys survive
    got = (
        hausdorff_pairs(ds, key_col="tid", order_cols=("ts",), n_pair_buckets=4)
        .to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, base, check_dtype=False)
