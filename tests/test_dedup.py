"""Dedup suite behavior tests with planted duplicates: exact, MinHash-LSH,
SimHash Hamming pairs, timezone stage, engine facade, poison tolerance."""

import numpy as np
import pyarrow as pa
import pytest

from routers_ray.text import (
    dedup_exact,
    dedup_minhash,
    jaccard,
    minhash_signature,
    simhash64,
    simhash_pairs,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the rain falls softly on rooftops "
    "and the city sleeps under a gray morning sky with distant traffic humming along"
)


def docs_with_dups():
    near = BASE.replace("gray morning", "pale morning")  # tiny edit
    far = "completely different content about database engines and shuffle strategies"
    rows = [
        {"doc_id": 1, "text": BASE},
        {"doc_id": 2, "text": BASE},  # exact dup of 1
        {"doc_id": 3, "text": near},  # near dup of 1
        {"doc_id": 4, "text": far},
        {"doc_id": 5, "text": far + " with extra trailing words"},
    ]
    return pa.Table.from_pylist(rows)


def test_exact_dedup_keeps_min_id(ray_session):
    import ray.data as rd

    out = dedup_exact(rd.from_arrow(docs_with_dups())).to_pandas()
    assert len(out) == 4  # 1&2 collapse
    kept = set(out["doc_id"])
    assert 1 in kept and 2 not in kept


def test_minhash_finds_planted_near_dup(ray_session):
    import ray.data as rd

    out = dedup_minhash(rd.from_arrow(docs_with_dups()), threshold=0.5).to_pandas()
    pairs = set(map(tuple, out[["doc_a", "doc_b"]].itertuples(index=False)))
    assert (1, 2) in pairs  # exact dup
    assert (1, 3) in pairs or (2, 3) in pairs  # near dup
    assert (1, 4) not in pairs and (3, 4) not in pairs


def test_minhash_similarity_estimate():
    s1 = minhash_signature(BASE)
    s2 = minhash_signature(BASE.replace("gray morning", "pale morning"))
    s3 = minhash_signature("unrelated words entirely disjoint content")
    est12 = (s1 == s2).mean()
    est13 = (s1 == s3).mean()
    true12 = jaccard(BASE, BASE.replace("gray morning", "pale morning"))
    assert abs(est12 - true12) < 0.25
    assert est13 < 0.1 < est12


def test_simhash_locality():
    h1 = simhash64(BASE)
    h2 = simhash64(BASE.replace("gray morning", "pale morning"))
    h3 = simhash64("unrelated words entirely disjoint content")
    ham12 = bin(h1 ^ h2).count("1")
    ham13 = bin(h1 ^ h3).count("1")
    assert ham12 < ham13
    assert ham12 <= 10


def test_simhash_pairs_pipeline(ray_session):
    import ray.data as rd

    rows = [
        {"doc_id": 1, "text": BASE},
        {"doc_id": 2, "text": BASE},  # hamming 0
        {"doc_id": 3, "text": "totally different text about nothing similar at all"},
    ]
    out = simhash_pairs(rd.from_arrow(pa.Table.from_pylist(rows)), max_hamming=3).to_pandas()
    pairs = set(map(tuple, out[["doc_a", "doc_b"]].itertuples(index=False)))
    assert (1, 2) in pairs
    assert (1, 3) not in pairs


def test_timezone_bands(ray_session):
    import ray.data as rd

    from routers_ray.timezone import timezone_of

    t = pa.table(
        {
            "lon": pa.array([0.5, -74.0, 151.2]),  # GMT, New York-ish, Sydney-ish
            "lat": pa.array([51.5, 40.7, -33.9]),
        }
    )
    out = timezone_of(rd.from_arrow(t)).to_pandas()
    assert out["tz_name"].tolist()[0] == "Etc/GMT"
    # -74° → band floor((-74+187.5)/15)=7 → GMT+5; 151.2° → band 22 → GMT-10
    assert out["tz_name"].tolist()[1] == "Etc/GMT+5"
    assert out["tz_name"].tolist()[2] == "Etc/GMT-10"


def test_engine_facade(tmp_path, ray_session):
    import ray.data as rd

    from routers_ray.engine import Engine
    from routers_ray.network import build_network_store, synth_network
    from routers_ray.synth import synth_corpus, write_corpus

    nodes, edges = synth_network(seed=42, n_cities=1, grid=(6, 6))
    store = str(tmp_path / "store")
    build_network_store(nodes, edges, store, use_ray=False)
    docs = synth_corpus(n_docs=10, seed=42, network=(nodes, edges))
    paths = write_corpus(docs, str(tmp_path / "corpus"))

    eng = Engine(store, concurrency=2)
    ok = eng.match_ok(rd.read_parquet(paths["parquet"]), batch_size=8)
    n_ok = ok.count()
    assert n_ok > 0
    tiles = eng.tiles(ok, zooms=(10,))
    assert tiles.num_rows >= 1
    pts = rd.from_arrow(
        pa.table({"lon": pa.array([float(np.asarray(nodes["lon"]).mean())]),
                  "lat": pa.array([float(np.asarray(nodes["lat"]).mean())])})
    )
    snapped = eng.snap(pts).to_pandas()
    assert snapped["edge_id"].iloc[0] >= 0
    tz = eng.timezone(pts).to_pandas()
    assert tz["tz_band"].iloc[0] >= 0

    # round-2 facade surface: servable MVT blobs + dated tiles
    from routers_ray.mvt import decode_tile
    from routers_ray.tiles import DatedRange

    mvt_out = eng.mvt(ok, zoom=12).to_pandas()
    assert mvt_out["n_features"].sum() == n_ok
    [layer] = decode_tile(bytes(mvt_out["tile"].iloc[0]))
    assert layer["extent"] == 4096

    ev = rd.from_arrow(
        pa.table({"lon": pa.array([0.0, 1.0]), "lat": pa.array([0.0, 1.0]),
                  "ts_us": pa.array([1704153600000000, 1706918400000000], pa.int64())})
    )
    dated = eng.tiles_dated(
        ev, zooms=(7,), ranges=[DatedRange.parse("2024-01-01", "2024-02-28", "0-1-2-3-4-5-6")]
    )
    assert dated.num_rows == 2

    # round-4 facade surface: raster↔vector + sketches
    snaps = ok.to_pandas()
    pts_ds = rd.from_arrow(
        pa.table({"lon": pa.array(snaps["snap_lon"]), "lat": pa.array(snaps["snap_lat"])})
    )
    sparse = eng.rasterize(pts_ds, z=4, grid=16).to_pandas()
    assert sparse["n"].sum() == n_ok
    rtiles = eng.raster_tiles(pts_ds, z=4, grid=16).to_pandas()
    assert rtiles["total"].sum() == n_ok
    runs = eng.vectorize(pts_ds, z=4, grid=16, threshold=1).to_pandas()
    assert runs["total"].sum() == n_ok
    hll = eng.count_distinct(ok, lambda b: [str(d) for d in b["doc_id"].to_pylist()]).to_pandas()
    from routers_ray.sketch import hll_estimate, hll_merge

    est = hll_estimate(hll_merge([pa.Table.from_pandas(hll)]))
    n_docs_ok = snaps["doc_id"].nunique()
    assert abs(est - n_docs_ok) / n_docs_ok < 0.35  # tiny-cardinality LC regime
    cms = eng.frequencies(ok, lambda b: [str(d) for d in b["doc_id"].to_pylist()]).to_pandas()
    assert cms["n"].sum() == n_ok * 4  # depth rows each count every row


def test_internal_error_rows_do_not_kill_batch(monkeypatch):
    """Poison-pill tolerance: an unexpected exception in one doc surfaces as
    an 'internal' error row; the rest of the batch still matches."""
    import routers_ray.pipelines.match_pipeline as mp
    from routers_ray.matcher import MatchOptions
    from routers_ray.network import build_network_store, synth_network
    from routers_ray.spans import parse_trajectories
    from routers_ray.synth import synth_corpus
    import tempfile

    nodes, edges = synth_network(seed=42, n_cities=1, grid=(6, 6))
    d = tempfile.mkdtemp()
    build_network_store(nodes, edges, d, use_ray=False)
    docs = synth_corpus(n_docs=4, seed=42, network=(nodes, edges))
    store = mp.get_store(d)
    parsed = parse_trajectories(docs)

    import routers_ray.matcher as matcher_mod

    real = matcher_mod.match_trajectory
    victim = docs["doc_id"][1].as_py()
    calls = {"n": 0}

    def group_boom(net, dd, opts):
        raise RuntimeError("group poison")  # force the per-doc retry path

    def boom(net, ll, la, opts):
        calls["n"] += 1
        if calls["n"] == 2:  # second doc explodes
            raise RuntimeError("poison")
        return real(net, ll, la, opts)

    monkeypatch.setattr(mp, "match_trajectories", group_boom)
    monkeypatch.setattr(mp, "match_trajectory", boom)
    out = mp.match_batch(parsed, store, MatchOptions(), keep_spans=False).to_pandas()
    internal = out[out["status"] == "internal"]
    assert len(internal) == 1 and internal["doc_id"].iloc[0] == victim
    assert (out["status"] == "ok").sum() > 0


def test_minhash_batched_signatures_match_per_doc():
    """The vectorized signature matrix equals the per-doc reference path,
    including whitespace/short/empty edge cases."""
    import pyarrow as pa

    from routers_ray.text import minhash_signature, minhash_signatures_batch

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "", "one", "one two", "one two three",
        "  padded   whitespace\ttokens  ",
        "x " * 200,
    ]
    sig = minhash_signatures_batch(pa.array(texts))
    for i, t in enumerate(texts):
        assert np.array_equal(sig[:, i], minhash_signature(t)), t[:30]


def test_embed_dups_lsh_parity_with_broadcast(ray_session):
    """The bucketed LSH near-dup path agrees with the exact all-pairs
    broadcast on both the sf corpus (no pairs at 0.95) and the planted
    cluster world (1320 pairs) — the scale route is a drop-in for the
    oracle route."""
    import pyarrow as pa
    import ray.data as rd

    from routers_ray.oracle_match import planted_embedding_corpus
    from routers_ray.pipelines.queries import q_embed_dups
    from routers_ray.sim import embed_dups_lsh

    # sf corpus: exact broadcast finds nothing >= 0.95; LSH must agree
    exact = q_embed_dups("/root/testdata/sf0.001")
    ds = rd.read_parquet(
        "/root/testdata/sf0.001/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    lsh = pa.concat_tables(
        [b for b in embed_dups_lsh(ds, threshold=0.95).iter_batches(batch_format="pyarrow")]
        or [pa.table({"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64()),
                      "sim": pa.array([], pa.float64())})]
    )
    assert exact.num_rows == lsh.num_rows == 0

    # planted world: pair sets identical
    tbl, _ = planted_embedding_corpus()
    got = pa.concat_tables(
        b for b in embed_dups_lsh(
            rd.from_arrow(tbl), threshold=0.95, n_planes=4, n_tables=8
        ).iter_batches(batch_format="pyarrow")
    )
    pairs = sorted(zip(got["id_a"].to_pylist(), got["id_b"].to_pylist()))
    from routers_ray.oracle_match import planted_embed_dups_expected_path
    import pyarrow.parquet as pq

    exp = pq.read_table(planted_embed_dups_expected_path())
    exp_pairs = sorted(zip(exp["id_a"].to_pylist(), exp["id_b"].to_pylist()))
    assert pairs == exp_pairs
