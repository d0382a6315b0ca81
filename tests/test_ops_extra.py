"""Tests for the auxiliary operators: geohash, metrics percentiles, DBSCAN
clustering, snap/scan pipelines, Trip::tail windowing, media plumbing."""

import numpy as np
import pyarrow as pa
import pytest

from routers_ray import cells
from routers_ray.cluster import cluster_points, convex_hull, dbscan_labels
from routers_ray.matcher import MatchOptions, match_trajectory
from routers_ray.metrics import nearest_rank, summarize


class TestGeohash:
    def test_known_values(self):
        # canonical geohash examples (public test vectors)
        assert cells.geohash_encode([-5.6], [42.6], 5)[0] == "ezs42"
        assert cells.geohash_encode([-74.0060], [40.7128], 7)[0] == "dr5regw"

    def test_roundtrip_center(self):
        lons = np.array([151.2, -118.3, 2.35])
        lats = np.array([-33.86, 34.05, 48.85])
        hs = cells.geohash_encode(lons, lats, 7)
        dl, db = cells.geohash_decode(hs)
        assert np.allclose(dl, lons, atol=0.001)
        assert np.allclose(db, lats, atol=0.001)

    def test_u64_packing_distinct(self):
        hs = ["ezs4", "ezs5", "ezs42"]
        ids = cells.geohash_to_u64(hs)
        assert len(set(ids.tolist())) == 3
        assert int(ids[0]) & 0xF == 4  # length tag
        assert int(ids[2]) & 0xF == 5


class TestMetrics:
    def test_nearest_rank(self):
        v = np.arange(1, 101, dtype=np.float64)  # 1..100
        assert nearest_rank(v, 0.50) == 50.0
        assert nearest_rank(v, 0.15) == 15.0
        assert nearest_rank(v, 0.85) == 85.0

    def test_summary(self):
        s = summarize([3.0, 1.0, 2.0], wall_s=2.0, points=100)
        assert s["min"] == 1.0 and s["max"] == 3.0 and s["n"] == 3
        assert s["p50"] == 2.0
        assert s["throughput_pts_per_s"] == 50.0


class TestDBSCAN:
    def test_labels_two_clusters(self):
        lon = np.array([0.0, 0.0001, 0.0002, 1.0, 1.0001, 1.0002, 5.0])
        lat = np.zeros(7)
        labels = dbscan_labels(lon, lat, eps_m=50.0, min_points=3)
        assert labels[6] == -1  # isolated noise
        assert len(set(labels[:3])) == 1 and labels[0] >= 0
        assert len(set(labels[3:6])) == 1 and labels[3] >= 0
        assert labels[0] != labels[3]

    def test_hull_square(self):
        lon = np.array([0.0, 0.0, 1.0, 1.0, 0.5])
        lat = np.array([0.0, 1.0, 0.0, 1.0, 0.5])
        hx, hy = convex_hull(lon, lat)
        assert hx.size == 4  # interior point excluded

    def test_cluster_pipeline(self, ray_session):
        import ray.data as rd

        rng = np.random.default_rng(0)
        # one dense blob + scattered noise
        blob_lon = 10.0 + rng.normal(0, 0.0005, 20)
        blob_lat = 10.0 + rng.normal(0, 0.0005, 20)
        noise_lon = rng.uniform(-170, 170, 10)
        noise_lat = rng.uniform(-80, 80, 10)
        tbl = pa.table(
            {
                "lon": pa.array(np.concatenate([blob_lon, noise_lon])),
                "lat": pa.array(np.concatenate([blob_lat, noise_lat])),
            }
        )
        out = cluster_points(rd.from_arrow(tbl), cell_zoom=8, eps_m=300.0).to_pandas()
        assert len(out) >= 1
        big = out.sort_values("n_points", ascending=False).iloc[0]
        assert big["n_points"] == 20
        assert abs(big["centroid_lon"] - 10.0) < 0.01


class TestTailWindow:
    def test_max_layers_bounds_output(self):
        from tests.test_mock_scenarios import BENT_LATS, BENT_LONS, bent_road

        net = bent_road()
        full = match_trajectory(net, BENT_LONS, BENT_LATS)
        tail = match_trajectory(net, BENT_LONS, BENT_LATS, MatchOptions(max_layers=3))
        assert len(tail.layers) == 3
        assert [m.seq for m in tail.layers] == [3, 4, 5]
        # tail result agrees with the full match on the common suffix edges
        assert [(m.src, m.dst) for m in tail.layers] == [
            (m.src, m.dst) for m in full.layers[3:]
        ]


class TestSnapScan:
    @pytest.fixture(scope="class")
    def store(self, tmp_path_factory, ray_session):
        from routers_ray.network import build_network_store, synth_network

        d = str(tmp_path_factory.mktemp("snapstore"))
        nodes, edges = synth_network(seed=42, n_cities=1, grid=(6, 6))
        build_network_store(nodes, edges, d, use_ray=False)
        return {"dir": d, "nodes": nodes, "edges": edges}

    def test_snap_matches_bruteforce(self, store, ray_session):
        import ray.data as rd

        from routers_ray.geo import haversine_m, point_at_fraction, segment_locate_fraction
        from routers_ray.network import fatten_edges
        from routers_ray.pipelines.snap_pipeline import snap_points

        nodes = store["nodes"]
        lon0 = float(np.asarray(nodes["lon"]).mean())
        lat0 = float(np.asarray(nodes["lat"]).mean())
        rng = np.random.default_rng(1)
        qlon = lon0 + rng.normal(0, 0.002, 25)
        qlat = lat0 + rng.normal(0, 0.002, 25)
        ds = rd.from_arrow(pa.table({"lon": pa.array(qlon), "lat": pa.array(qlat)}))
        out = snap_points(ds, store["dir"], radius_m=100.0).to_pandas().sort_values(["lon", "lat"]).reset_index(drop=True)

        # NumPy brute oracle: project every query onto EVERY edge
        fat = fatten_edges(nodes, store["edges"])
        ax, ay = np.asarray(fat["ax"]), np.asarray(fat["ay"])
        bx, by = np.asarray(fat["bx"]), np.asarray(fat["by"])
        order = np.argsort(np.asarray(qlon) + np.asarray(qlat) * 0)  # align by lon sort below
        df = out  # snapped results
        for _, row in df.iterrows():
            frac = segment_locate_fraction(row.lon, row.lat, ax, ay, bx, by)
            px, py = point_at_fraction(ax, ay, bx, by, frac)
            d = haversine_m(px, py, row.lon, row.lat)
            d = np.where(np.isnan(frac), np.inf, d)
            best = float(np.min(d))
            if row.edge_id >= 0:
                assert row.dist_m == pytest.approx(best, abs=1e-6)
            else:
                assert best > 100.0 * 0.7  # nothing within the search square

    def test_scan_expands_candidates(self, store, ray_session):
        import ray.data as rd

        from routers_ray.pipelines.snap_pipeline import scan_edges

        nodes = store["nodes"]
        lon0 = float(np.asarray(nodes["lon"]).mean())
        lat0 = float(np.asarray(nodes["lat"]).mean())
        ds = rd.from_arrow(
            pa.table({"lon": pa.array([lon0]), "lat": pa.array([lat0]), "point_idx": pa.array([7], pa.int64())})
        )
        out = scan_edges(ds, store["dir"], radius_m=150.0).to_pandas()
        assert len(out) >= 2  # grid center sees several edges
        assert (out["point_idx"] == 7).all()
        assert (out["dist_m"] <= 250.0).all()


class TestMedia:
    def test_feature_extractor_plumbing(self, ray_session):
        import ray.data as rd

        from routers_ray.media import (
            MediaFeatureExtractor,
            frame_sample_plan_batch,
            resize_plan_batch,
            synth_media_rows,
        )

        media = synth_media_rows([f"doc{i}" for i in range(10)], refs_per_doc=3)
        ds = rd.from_arrow(media)
        out = (
            ds.map_batches(MediaFeatureExtractor, batch_format="pyarrow", batch_size=8, concurrency=2, num_cpus=1)
            .map_batches(resize_plan_batch, batch_format="pyarrow")
            .map_batches(frame_sample_plan_batch, batch_format="pyarrow")
            .to_pandas()
        )
        assert len(out) == 30
        assert (out["decoded"] == False).all()  # noqa: E712 — stub decode
        assert out["features"].map(len).eq(16).all()
        assert (out[["resize_w", "resize_h"]].min(axis=1) == 224).all()
        # deterministic: same ref → same features
        out2 = MediaFeatureExtractor()(media)
        f1 = np.asarray(out2["features"].to_pylist())
        out3 = MediaFeatureExtractor()(media)
        assert np.array_equal(f1, np.asarray(out3["features"].to_pylist()))


class TestMVT:
    def test_feature_encoding_roundtrip(self):
        from routers_ray.functions import zigzag_decode
        from routers_ray.tiles import MVT_EXTENT, encode_mvt_features, project_to_tile

        t = pa.table(
            {
                "snap_lon": pa.array([151.2094, -118.25]),
                "snap_lat": pa.array([-33.8688, 34.05]),
            }
        )
        out = encode_mvt_features(t, z=14)
        assert out["z"].to_pylist() == [14, 14]
        px = zigzag_decode(np.asarray(out["zz_x"]).astype(np.uint32))
        py = zigzag_decode(np.asarray(out["zz_y"]).astype(np.uint32))
        assert ((0 <= px) & (px < MVT_EXTENT)).all()
        assert ((0 <= py) & (py < MVT_EXTENT)).all()
        ex, ey, epx, epy = project_to_tile([151.2094, -118.25], [-33.8688, 34.05], 14)
        assert (px == epx).all() and (py == epy).all()
        assert (np.asarray(out["x"]) == ex).all()


class TestRoute:
    def test_route_points_structural(self, ray_session, tmp_path_factory):
        """Route service: weight-cost Dijkstra (osm/graph.rs:365-384) —
        endpoints snap to nearest nodes, consecutive hops are real edges,
        reported cost equals the sum of traversed edge weights."""
        import ray.data as rd

        from routers_ray.csr import route_nodes
        from routers_ray.network import build_network_store, synth_network
        from routers_ray.pipelines.match_pipeline import get_store
        from routers_ray.pipelines.route_pipeline import route_pairs

        d = str(tmp_path_factory.mktemp("routestore"))
        nodes, edges = synth_network(seed=42, n_cities=1, grid=(8, 8))
        build_network_store(nodes, edges, d, use_ray=False)
        lons = np.asarray(nodes["lon"])
        lats = np.asarray(nodes["lat"])
        i_a, i_b = 0, len(lons) - 1  # opposite grid corners
        ds = rd.from_arrow(
            pa.table(
                {
                    "start_lon": pa.array([lons[i_a]]),
                    "start_lat": pa.array([lats[i_a]]),
                    "end_lon": pa.array([lons[i_b]]),
                    "end_lat": pa.array([lats[i_b]]),
                }
            )
        )
        out = route_pairs(ds, d).to_pandas()
        assert out["cost"].notna().all()
        shape = out["shape"].iloc[0]
        assert len(shape) == out["n_hops"].iloc[0] >= 2
        # endpoints are the snapped nodes
        assert abs(shape[0]["lon"] - lons[i_a]) < 1e-9
        assert abs(shape[-1]["lon"] - lons[i_b]) < 1e-9

        # cost consistency against the in-memory kernel
        store = get_store(d)
        net = store.network_for_bbox(lons.min(), lats.min(), lons.max(), lats.max(), buffer_m=3000)
        a = net.nearest_node(float(lons[i_a]), float(lats[i_a]))
        b = net.nearest_node(float(lons[i_b]), float(lats[i_b]))
        cost, path = route_nodes(net.csr, a, b)
        assert cost == out["cost"].iloc[0]
        # recompute cost by walking the path edges
        total = 0
        for u, v in zip(path[:-1], path[1:]):
            e = net.csr.edge_between(u, v)
            assert e >= 0, "route hop must be a real directed edge"
            total += int(net.csr.edge_weight[e])
        assert total == cost

    def test_route_unreachable_is_null(self, ray_session, tmp_path_factory):
        import ray.data as rd

        from routers_ray.network import build_network_store, synth_network
        from routers_ray.pipelines.route_pipeline import route_pairs

        d = str(tmp_path_factory.mktemp("routestore2"))
        nodes, edges = synth_network(seed=42, n_cities=1, grid=(4, 4))
        build_network_store(nodes, edges, d, use_ray=False)
        ds = rd.from_arrow(
            pa.table(
                {
                    "start_lon": pa.array([0.0]),  # far from any network cell
                    "start_lat": pa.array([0.0]),
                    "end_lon": pa.array([1.0]),
                    "end_lat": pa.array([1.0]),
                }
            )
        )
        out = route_pairs(ds, d).to_pandas()
        assert out["cost"].isna().all() or (out["n_hops"] == 0).all()


def test_ann_lsh_multiprobe_recall(ray_session):
    """Multi-probe LSH recall@10 vs exact brute force ≥ 0.9 on the
    synthetic embeddings (VERDICT round-1 item 10)."""
    import pyarrow.parquet as papq
    import ray.data as rd

    from routers_ray.sim import _stack_embeddings, ann_recall_at_k

    tbl = papq.read_table("/root/testdata/sf0.001/embeddings.parquet")
    qtbl = tbl.filter(pa.compute.less(tbl["vec_id"], 8))
    queries = _stack_embeddings(qtbl["embedding"])
    qids = np.asarray(qtbl["vec_id"], dtype=np.int64)
    ds = rd.read_parquet(
        "/root/testdata/sf0.001/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    recall = ann_recall_at_k(ds, queries, qids, k=10, probe_hamming=1)
    assert recall >= 0.9, f"multi-probe recall {recall}"
    recall0 = ann_recall_at_k(ds, queries, qids, k=10, probe_hamming=0)
    assert recall0 <= recall  # probes can only add candidates


def test_conformance_sweep_runner():
    """Multi-config sweep harness (conformance/src/runner.rs analogue):
    every (config, trace) pair yields a full percentile row."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "conformance", "tools/conformance.py"
    )
    conf = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(conf)
    nets = {"grid12": conf.NETWORKS["grid12"]}
    metrics = conf.run_sweep(iters=3, warmup=1, networks=nets)
    assert len(metrics) == len(conf.CONFIGS) * 4
    for key, m in metrics.items():
        assert m["n"] == 3
        assert m["p50"] >= m["p15"] >= 0
        assert m["throughput_pts_per_s"] > 0


def test_lance_flip_readiness(tmp_path, ray_session):
    """When the container gains the ``lance`` package, write_corpus must
    emit a Lance dataset and read_corpus must round-trip it with exact
    span-sequence equality — so the storage flip is a zero-diff event.
    Skipped (not failed) while lance is absent."""
    pytest.importorskip("lance")
    import pyarrow as pa

    from routers_ray.synth import read_corpus, synth_corpus, write_corpus

    tbl = synth_corpus(n_docs=20, seed=5)
    paths = write_corpus(tbl, str(tmp_path), name="docs")
    assert "lance" in paths, "lance installed but write_corpus skipped it"
    back = read_corpus(paths["lance"])
    got = pa.concat_tables(
        b for b in back.iter_batches(batch_format="pyarrow")
    ).sort_by("doc_id")
    want = tbl.sort_by("doc_id")
    assert got["doc_id"].to_pylist() == want["doc_id"].to_pylist()
    # per-row span-sequence equality (kind, text, media_ref, offset)
    assert got["spans"].to_pylist() == want["spans"].to_pylist()


def test_dated_tiles_shuffle_empty_input(ray_session):
    """merge='shuffle' on a dataset whose DatedRange filter drops every
    row yields an empty, well-typed Dataset (no schema loss)."""
    import pyarrow as pa
    import ray.data as rd

    from routers_ray.tiles import DatedRange, materialize_dated_tiles

    pts = pa.table(
        {
            "lon": pa.array([10.0]),
            "lat": pa.array([20.0]),
            "ts_us": pa.array([1704187200000000], pa.int64()),  # 2024-01-02
        }
    )
    r = DatedRange.parse("1999-01-01", "1999-01-31", "0-1-2-3-4-5-6")
    out = materialize_dated_tiles(rd.from_arrow(pts), [7], [r], merge="shuffle")
    assert out.count() == 0


def test_kmeans_fit_degenerate_sample():
    """n_centroids >= sample size collapses gracefully (no crash, finite
    centroids) — the IVF quantizer on tiny corpora."""
    from routers_ray.sim import kmeans_fit

    sample = np.asarray([[1.0, 0.0], [0.0, 1.0], [1.0, 1.0]])
    cents = kmeans_fit(sample, n_centroids=3, seed=1)
    assert cents.shape == (3, 2) and np.isfinite(cents).all()


def test_embed_dups_lsh_empty_dataset(ray_session):
    """No vectors → no pairs, schema intact through the join chain."""
    import pyarrow as pa
    import ray.data as rd

    from routers_ray.sim import embed_dups_lsh

    tbl = pa.table(
        {
            "vec_id": pa.array([7], pa.int64()),
            "embedding": pa.array([[1.0, 0.0, 0.0]], pa.list_(pa.float64())),
        }
    )
    out = embed_dups_lsh(rd.from_arrow(tbl), threshold=0.95)
    assert out.count() == 0


def test_dedup_minhash_no_candidate_pairs(ray_session):
    """A corpus with no co-bucketed docs yields zero pairs without killing
    the join chain on a schema-less empty block."""
    import pyarrow as pa
    import ray.data as rd

    from routers_ray.text import dedup_minhash

    tbl = pa.table(
        {
            "doc_id": pa.array([1], pa.int64()),
            "text": pa.array(["only one document here"], pa.string()),
        }
    )
    assert dedup_minhash(rd.from_arrow(tbl)).count() == 0
