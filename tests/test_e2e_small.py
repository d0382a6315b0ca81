"""End-to-end: synth corpus → network store build (Ray job) → match
pipeline (Ray actor pool) → matched rows == single-process golden; span
sequence preserved; tiles aggregate correctly."""

import numpy as np
import pyarrow as pa
import pytest

from routers_ray.matcher import MatchOptions
from routers_ray.network import build_network_store, synth_network
from routers_ray.pipelines.match_pipeline import (
    anchor_batch,
    match_batch,
    match_documents,
    matched_errors,
    matched_ok,
    get_store,
)
from routers_ray.spans import parse_trajectories, span_signature
from routers_ray.synth import synth_corpus, write_corpus
from routers_ray.tiles import materialize_tiles


@pytest.fixture(scope="module")
def world(tmp_path_factory, ray_session):
    root = tmp_path_factory.mktemp("world")
    nodes, edges = synth_network(seed=42, n_cities=2, grid=(8, 8))
    store_dir = str(root / "netstore")
    build_network_store(nodes, edges, store_dir, use_ray=True)
    docs = synth_corpus(n_docs=40, seed=42, network=(nodes, edges))
    paths = write_corpus(docs, str(root / "corpus"))
    return {"nodes": nodes, "edges": edges, "store": store_dir, "docs": docs, "paths": paths}


@pytest.fixture(scope="module")
def golden(world) -> pa.Table:
    """Single-process reference run (no Ray) — the golden oracle."""
    store = get_store(world["store"])
    parsed = parse_trajectories(world["docs"])
    parsed = anchor_batch(parsed, store.partition_zoom, None)
    return match_batch(parsed, store, MatchOptions())


def test_store_manifest(world):
    import json, os

    with open(os.path.join(world["store"], "manifest.json")) as f:
        man = json.load(f)
    assert man["n_cells"] >= 1
    assert all(v > 0 for v in man["cells"].values())


def test_golden_has_matches(world, golden):
    ok = golden.filter(pa.compute.equal(golden["status"], "ok"))
    assert len(ok) > 100
    # cost present and bounded on every ok row
    assert pa.compute.min(ok["cost"]).as_py() >= 0


def test_ray_pipeline_equals_golden(world, golden):
    import ray.data as rd

    ds = rd.read_parquet(world["paths"]["parquet"])
    matched = match_documents(ds, world["store"], concurrency=2, batch_size=16)
    batches = [b for b in matched.iter_batches(batch_format="pyarrow", batch_size=4096)]
    result = pa.concat_tables(batches)

    cols = ["doc_id", "seq", "status", "edge_id", "dir", "src", "dst", "snap_lon", "snap_lat", "cost", "cell"]

    def canon(t):
        t = t.select(cols)
        import pandas as pd

        df = t.to_pandas().sort_values(["doc_id", "seq", "status"]).reset_index(drop=True)
        for c in ("snap_lon", "snap_lat"):
            df[c] = df[c].round(6)  # 1e-6 snapshot rounding (src/test.rs:27-33)
        return df

    g, r = canon(golden), canon(result)
    assert len(g) == len(r)
    import pandas as pd

    pd.testing.assert_frame_equal(g, r)


def test_span_sequence_invariant(world, golden):
    """North-rule invariant: output rows carry the input span sequence
    byte-for-byte (per doc)."""
    in_sig = {d: s for d, s in zip(world["docs"]["doc_id"].to_pylist(), span_signature(world["docs"]["spans"]))}
    out_docs = golden["doc_id"].to_pylist()
    out_sig = span_signature(golden["spans"])
    assert len(out_docs) > 0
    for d, s in zip(out_docs, out_sig):
        assert s == in_sig[d], f"span sequence mutated for {d}"


def test_every_doc_accounted(world, golden):
    in_ids = set(world["docs"]["doc_id"].to_pylist())
    out_ids = set(golden["doc_id"].to_pylist())
    assert out_ids == in_ids


def test_errors_have_reasons(world, golden):
    errs = golden.filter(pa.compute.not_equal(golden["status"], "ok"))
    for kind in errs["status"].to_pylist():
        assert kind in {"unanchored", "disconnected", "internal"}


def test_tiles_aggregate(world, golden, ray_session):
    import ray.data as rd

    ok = golden.filter(pa.compute.equal(golden["status"], "ok"))
    ds = rd.from_arrow(ok.select(["doc_id", "seq", "snap_lon", "snap_lat"]))
    tiles = materialize_tiles(ds, zooms=[12, 15]).to_pandas()
    assert tiles["n_points"].sum() == 2 * len(ok)  # each point lands in 1 tile per zoom
    assert set(tiles["z"].unique()) == {12, 15}
    # hilbert ordering within zoom
    for z in (12, 15):
        h = tiles[tiles["z"] == z]["hilbert"].to_numpy()
        assert (np.diff(h.astype(np.int64)) >= 0).all()
    # roll-up: zoom-12 totals equal zoom-15 totals
    assert tiles[tiles.z == 12]["n_points"].sum() == tiles[tiles.z == 15]["n_points"].sum()


def test_salting_splits_hot_cell(world, ray_session):
    import ray.data as rd

    ds = rd.read_parquet(world["paths"]["parquet"])
    matched = match_documents(
        ds, world["store"], concurrency=2, batch_size=16, target_docs_per_salt=5
    )
    ok = matched_ok(matched)
    assert ok.count() > 0
    err = matched_errors(matched).count()
    assert err < matched.count()


@pytest.mark.parametrize("exec_mode", ["tasks", "actors"])
def test_hash_route_equals_unrouted(world, ray_session, exec_mode):
    """The multi-node routing exchange (repartition(keys=[route_key]) under
    HASH_SHUFFLE with bounded aggregators) produces the same matched rows
    as the unrouted path — whether the exchange is consumed by plain tasks
    (the r04 default: block-local, process-cached) or a MatchDocs pool."""
    import ray.data as rd

    try:
        from ray.data.context import ShuffleStrategy
    except ImportError:
        pytest.skip("no shuffle strategy API")
    ctx = rd.DataContext.get_current()
    old_strategy = ctx.shuffle_strategy
    old_aggs = ctx.max_hash_shuffle_aggregators
    ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    ctx.max_hash_shuffle_aggregators = 2
    try:
        ds = rd.read_parquet(world["paths"]["parquet"])
        routed = match_documents(
            ds, world["store"], concurrency=2, batch_size=16, keep_spans=False,
            route="hash", route_blocks=4, exec_mode=exec_mode,
        )
        ds2 = rd.read_parquet(world["paths"]["parquet"])
        plain = match_documents(
            ds2, world["store"], concurrency=2, batch_size=16, keep_spans=False,
            route="none", salt=False,
        )
        cols = ["doc_id", "seq", "status", "edge_id", "src", "dst", "cost"]
        a = routed.to_pandas()[cols].sort_values(cols).reset_index(drop=True)
        b = plain.to_pandas()[cols].sort_values(cols).reset_index(drop=True)
        import pandas as pd

        pd.testing.assert_frame_equal(a, b)
    finally:
        ctx.shuffle_strategy = old_strategy
        ctx.max_hash_shuffle_aggregators = old_aggs


def test_adversarial_docs_survive_pipeline(world, ray_session):
    """Hostile inputs ride the REAL pipeline without killing any batch:
    out-of-range coordinates, a single-point doc, a doc of duplicate
    timestamps, an empty span list, and a 1500-point monster (bounded by
    Trip::tail windowing)."""
    import ray.data as rd

    from routers_ray.spans import DOCS_SCHEMA

    def pt(lon, lat, ts):
        return {"kind": "text", "text": f"{lon} {lat} {ts}", "media_ref": "", "offset": 0}

    # inside city 0 of the 2-city 8x8 world (origin -118.5, 34.0, pitch 0.001)
    lat0 = 34.0031
    lon0 = -118.4985
    monster = [pt(round(lon0 + 0.000004 * i, 6), lat0, i + 1) for i in range(1500)]
    rows = [
        {"doc_id": "bad-coords", "spans": [pt(500.0, 95.0, 1), pt(-500.0, -95.0, 2)]},
        {"doc_id": "single", "spans": [pt(lon0, lat0, 1)]},
        {"doc_id": "dup-ts", "spans": [pt(lon0, lat0, 5), pt(lon0 + 0.0001, lat0, 5)]},
        {"doc_id": "no-spans", "spans": []},
        {"doc_id": "monster", "spans": monster},
    ]
    docs = pa.Table.from_pylist(rows, schema=DOCS_SCHEMA)
    matched = match_documents(
        rd.from_arrow(docs), world["store"],
        MatchOptions(max_layers=64, drop_unanchored=True),
        concurrency=2, batch_size=4, keep_spans=True,
    )
    # collect as Arrow: ragged error_layers lists break Ray's automatic
    # pandas TensorArray casting (a conversion quirk, not a pipeline issue)
    tabs = [
        t if isinstance(t, pa.Table) else pa.Table.from_batches([t])
        for t in matched.iter_batches(batch_format="pyarrow")
    ]
    out = pa.concat_tables(tabs).to_pandas(ignore_metadata=True)
    by_doc = {d: g for d, g in out.groupby("doc_id")}
    assert set(by_doc) == {"bad-coords", "single", "dup-ts", "no-spans", "monster"}
    # every doc yields either ok rows or exactly one error row
    assert (by_doc["bad-coords"]["status"] != "ok").all()
    assert by_doc["no-spans"]["status"].tolist() == ["unanchored"]
    ok_monster = by_doc["monster"][by_doc["monster"]["status"] == "ok"]
    assert 0 < len(ok_monster) <= 64  # windowed, not 1500 rows
    # seqs stay global under windowing
    assert ok_monster["seq"].max() == 1499
    # spans rejoined per row (north-rule invariant under the rejoin path)
    assert by_doc["single"]["spans"].iloc[0] is not None


def test_sort_route_equals_unrouted(world, ray_session):
    """route='sort' (global route_key sort, the ordered-output path)
    produces the same matched rows as the unrouted path."""
    import pandas as pd
    import ray.data as rd

    ds = rd.read_parquet(world["paths"]["parquet"])
    sorted_r = match_documents(
        ds, world["store"], concurrency=2, batch_size=16, keep_spans=False,
        route="sort", salt=False,
    )
    ds2 = rd.read_parquet(world["paths"]["parquet"])
    plain = match_documents(
        ds2, world["store"], concurrency=2, batch_size=16, keep_spans=False,
        route="none", salt=False,
    )
    cols = ["doc_id", "seq", "status", "edge_id", "src", "dst", "cost"]
    a = sorted_r.to_pandas()[cols].sort_values(cols).reset_index(drop=True)
    b = plain.to_pandas()[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_salt_map_reuse_matches_pre_pass(ray_session):
    """A precomputed salt_map skips the counting pre-pass and yields the
    same matched rows (partitioning-invariance) — the incremental-run path
    where the hotspot map is persisted across micro-batches."""
    import ray.data as rd

    from routers_ray.pipelines.match_pipeline import (
        compute_salts,
        first_point_cells,
        match_documents,
        matched_ok,
    )
    from routers_ray.network import build_network_store
    from routers_ray.synth import synth_corpus, synth_network
    import tempfile

    nodes, edges = synth_network(seed=21, n_cities=2, grid=(8, 8))
    docs = synth_corpus(n_docs=60, seed=21, network=(nodes, edges))
    sd = tempfile.mkdtemp(prefix="saltmap_store_")
    build_network_store(nodes, edges, sd, use_ray=False)

    ds = rd.from_arrow(docs)
    from routers_ray.network import NetworkStore

    zoom = NetworkStore(sd).partition_zoom
    pre = ds.map_batches(lambda b: first_point_cells(b, zoom), batch_format="pyarrow")
    salt_map = compute_salts(pre, target_docs_per_salt=10)

    a = matched_ok(
        match_documents(rd.from_arrow(docs), sd, salt=True, target_docs_per_salt=10,
                        route="none", concurrency=2)
    ).to_pandas()
    b = matched_ok(
        match_documents(rd.from_arrow(docs), sd, salt=True, salt_map=salt_map,
                        route="none", concurrency=2)
    ).to_pandas()
    key = ["doc_id", "seq"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    assert a["edge_id"].tolist() == b["edge_id"].tolist()
    assert a["cost"].tolist() == b["cost"].tolist()


def test_combiner_salt_map_equals_per_doc_count(ray_session):
    """compute_salt_map's per-batch combiner (anchor_cell_counts → sum)
    yields exactly the per-doc groupby-count salts, at every batch split —
    the pre-aggregation only changes what moves through the exchange."""
    import ray.data as rd

    from routers_ray.network import NetworkStore, build_network_store
    from routers_ray.pipelines.match_pipeline import (
        compute_salt_map,
        compute_salts,
        first_point_cells,
    )
    from routers_ray.synth import synth_corpus, synth_network
    import tempfile

    nodes, edges = synth_network(seed=33, n_cities=2, grid=(8, 8))
    docs = synth_corpus(n_docs=80, seed=33, network=(nodes, edges))
    sd = tempfile.mkdtemp(prefix="saltcomb_store_")
    build_network_store(nodes, edges, sd, use_ray=False)
    zoom = NetworkStore(sd).partition_zoom

    per_doc = rd.from_arrow(docs).map_batches(
        lambda b: first_point_cells(b, zoom), batch_format="pyarrow"
    )
    want = compute_salts(per_doc, target_docs_per_salt=7)

    for n_blocks in (1, 3, 16):
        ds = rd.from_arrow(docs).repartition(n_blocks)
        got = compute_salt_map(ds, zoom, target_docs_per_salt=7)
        assert got == want, f"n_blocks={n_blocks}"
