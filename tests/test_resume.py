"""Checkpoint / resume / lineage tests (FIXTURES.md §6):
(a) completed partitions are skipped on rerun, (b) interrupted + resumed
output equals the uninterrupted run, (c) Continuation.reconcile semantics,
(d) revisioned incremental runs merge correctly."""

import json

import numpy as np
import pyarrow as pa
import pytest

from routers_ray.checkpoint import (
    append_manifest,
    incremental_match,
    manifest_path,
    merge_revisions,
    read_manifest,
    read_matched,
    reconcile,
    run_checkpointed,
)
from routers_ray.network import build_network_store, synth_network
from routers_ray.spans import DOCS_SCHEMA
from routers_ray.synth import synth_corpus, write_corpus


@pytest.fixture(scope="module")
def world(tmp_path_factory, ray_session):
    root = tmp_path_factory.mktemp("ckpt")
    nodes, edges = synth_network(seed=42, n_cities=2, grid=(8, 8))
    store_dir = str(root / "netstore")
    build_network_store(nodes, edges, store_dir, use_ray=False)
    docs = synth_corpus(n_docs=30, seed=43, network=(nodes, edges))
    paths = write_corpus(docs, str(root / "corpus"))
    return {"root": root, "store": store_dir, "docs": docs, "paths": paths}


class TestReconcile:
    def test_skip_when_identical(self):
        assert reconcile([1, 2, 3], [1, 2, 3]) == ("skip", 3)

    def test_resume_on_overlap(self):
        # stored window slid past point 1; new points arrived
        assert reconcile([2, 3, 4], [2, 3, 4, 5, 6]) == ("resume", 3)
        assert reconcile([1, 2, 3, 4], [3, 4, 5]) == ("resume", 2)

    def test_restart_on_mismatch(self):
        assert reconcile([1, 2, 3], [7, 8, 9]) == ("restart", 0)
        assert reconcile([], [1, 2]) == ("restart", 0)

    def test_suffix_must_be_prefix(self):
        # overlap exists but not as suffix-of-stored == prefix-of-incoming
        assert reconcile([1, 2, 3], [2, 3]) == ("resume", 2)
        assert reconcile([5, 1, 2], [1, 2, 3]) == ("resume", 2)


def _run(world, out_dir, target=5):
    import ray.data as rd

    ds = rd.read_parquet(world["paths"]["parquet"])
    return run_checkpointed(ds, world["store"], out_dir, target_docs_per_salt=target)


def test_full_run_writes_manifest(world, tmp_path):
    out = str(tmp_path / "out_full")
    stats = _run(world, out)
    man = read_manifest(out)
    assert stats["computed"] == len(man) >= 2
    for row in man:
        assert row["rows_out"] > 0 and row["t_ms"] > 0
        assert row["partition_id"].startswith("cell=")
        # error taxonomy: ok rows + one row per failed doc == rows_out,
        # and the per-kind breakdown sums back to the aggregate
        assert row["rows_ok"] + row["docs_err"] == row["rows_out"]
        import json as _json

        kinds = _json.loads(row["err_kinds"])
        assert all(k != "ok" and n > 0 for k, n in kinds.items())
        assert sum(kinds.values()) == row["docs_err"]
    full = read_matched(out)
    assert len(full) > 0


def test_rerun_skips_everything(world, tmp_path):
    out = str(tmp_path / "out_skip")
    _run(world, out)
    stats2 = _run(world, out)
    assert stats2["computed"] == 0
    assert stats2["skipped"] == len(read_manifest(out))


def test_interrupted_resume_equals_full(world, tmp_path):
    import os
    import shutil

    out_a = str(tmp_path / "out_a")  # uninterrupted
    out_b = str(tmp_path / "out_b")  # interrupted + resumed
    _run(world, out_a)
    _run(world, out_b)
    # simulate a crash that also lost some partition dirs entirely: drop
    # the last manifest rows AND their parts (the recompute path)
    man = read_manifest(out_b)
    keep = man[: len(man) // 2]
    with open(manifest_path(out_b), "w") as f:
        for r in keep:
            f.write(json.dumps(r) + "\n")
    for r in man[len(man) // 2:]:
        shutil.rmtree(os.path.join(out_b, "parts", r["partition_id"]))
    stats = _run(world, out_b)
    assert stats["computed"] == len(man) - len(keep)
    assert stats["skipped"] == len(keep)

    a = read_matched(out_a).to_pandas()
    b = read_matched(out_b).to_pandas()
    cols = ["doc_id", "seq", "status", "edge_id", "src", "dst", "cost"]
    a = a[cols].sort_values(cols).reset_index(drop=True)
    b = b[cols].sort_values(cols).reset_index(drop=True)
    import pandas as pd

    pd.testing.assert_frame_equal(a, b)


def _truncate_docs(docs: pa.Table, n_points: int) -> pa.Table:
    """First n_points trajectory points per doc (media/prose spans kept up
    to the cut)."""
    rows = docs.to_pylist()
    out = []
    for r in rows:
        spans, seen = [], 0
        for s in r["spans"]:
            if s["kind"] == "text" and len(s["text"].split()) == 3 and not s["media_ref"]:
                if seen >= n_points:
                    break
                seen += 1
            spans.append(s)
        out.append({"doc_id": r["doc_id"], "spans": spans})
    return pa.Table.from_pylist(out, schema=DOCS_SCHEMA)


def test_incremental_revisions(world, tmp_path):
    state_dir = str(tmp_path / "state")
    v1 = _truncate_docs(world["docs"], 6)
    e1 = incremental_match(v1, world["store"], state_dir, revision_epoch=1)
    assert len(e1) > 0
    assert set(e1["action"].to_pylist()) == {"restart"}

    # same data again → everything skipped
    e1b = incremental_match(v1, world["store"], state_dir, revision_epoch=2)
    assert len(e1b) == 0

    # full trajectories arrive → resumed docs emit only new seqs
    # (new = beyond that doc's v1 point count, which caps at 6)
    from routers_ray.spans import parse_trajectories

    v1_n = dict(
        zip(
            parse_trajectories(v1)["doc_id"].to_pylist(),
            parse_trajectories(v1)["n_pts"].to_pylist(),
        )
    )
    e2 = incremental_match(world["docs"], world["store"], state_dir, revision_epoch=3)
    ok2 = e2.filter(pa.compute.equal(e2["status"], "ok")).to_pandas()
    from routers_ray.checkpoint import CONTEXT_WINDOW

    resumed = ok2[ok2["action"] == "resume"]
    # re-emitted layers start no earlier than the tail-cut window
    floor = (resumed["doc_id"].map(v1_n) - CONTEXT_WINDOW).clip(lower=0).to_numpy()
    assert (resumed["seq"].to_numpy() >= floor).all()
    assert len(ok2) > 0

    merged = merge_revisions(pa.concat_tables([e1, e2])).to_pandas()
    ok1 = e1.filter(pa.compute.equal(e1["status"], "ok")).to_pandas()
    # merged covers the union of emitted (doc, seq) pairs exactly once
    want = set(map(tuple, ok1[["doc_id", "seq"]].itertuples(index=False))) | set(
        map(tuple, ok2[["doc_id", "seq"]].itertuples(index=False))
    )
    got_ok = merged[merged["status"] == "ok"]
    got = set(map(tuple, got_ok[["doc_id", "seq"]].itertuples(index=False)))
    assert got == want
    assert got_ok.groupby(["doc_id", "seq"]).size().max() == 1


def test_streaming_equals_batch(world, tmp_path):
    """Reference ``tests/streaming.rs:66-86``: feeding points incrementally
    and merging revisioned emissions equals the one-shot batch match, when
    the context window covers the whole trajectory."""
    import pandas as pd

    import routers_ray.checkpoint as ck
    from routers_ray.pipelines.match_pipeline import anchor_batch, get_store, match_batch
    from routers_ray.matcher import MatchOptions
    from routers_ray.spans import parse_trajectories

    docs = world["docs"].slice(0, 6)
    parsed = parse_trajectories(docs)
    max_pts = max(parsed["n_pts"].to_pylist())

    old_window = ck.CONTEXT_WINDOW
    ck.CONTEXT_WINDOW = max_pts + 1
    try:
        state_dir = str(tmp_path / "stream_state")
        emissions = []
        for k in range(1, max_pts + 1):
            vk = _truncate_docs(docs, k)
            e = incremental_match(vk, world["store"], state_dir, revision_epoch=k)
            if e is not None and len(e):
                emissions.append(e)
        merged = merge_revisions(pa.concat_tables(emissions)).to_pandas()
    finally:
        ck.CONTEXT_WINDOW = old_window

    store = get_store(world["store"])
    batch_in = anchor_batch(parsed, store.partition_zoom, None)
    batch = match_batch(batch_in, store, MatchOptions(), keep_spans=False).to_pandas()

    cols = ["doc_id", "seq", "edge_id", "dir", "src", "dst"]
    a = merged[merged["status"] == "ok"][cols].sort_values(cols).reset_index(drop=True)
    b = batch[batch["status"] == "ok"][cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a.astype("int64", errors="ignore"), b.astype("int64", errors="ignore"), check_dtype=False)


def test_manifest_append_atomic(world, tmp_path):
    out = str(tmp_path / "out_m")
    import os

    os.makedirs(out, exist_ok=True)
    append_manifest(out, [{"partition_id": "p1"}])
    append_manifest(out, [{"partition_id": "p2"}])
    assert [r["partition_id"] for r in read_manifest(out)] == ["p1", "p2"]


def test_incremental_poison_doc_becomes_internal_row(world, tmp_path):
    """A doc with absurd coordinates in the incremental path yields ITS
    'internal' error row (network build inside the per-doc guard), and the
    other docs in the same batch still match."""
    from routers_ray.spans import DOCS_SCHEMA

    good = world["docs"].slice(0, 3)
    bad = pa.Table.from_pylist(
        [{
            "doc_id": "poison",
            "spans": [
                {"kind": "text", "text": "500.0 95.0 1", "media_ref": "", "offset": 0},
                {"kind": "text", "text": "-500.0 -95.0 2", "media_ref": "", "offset": 1},
            ],
        }],
        schema=DOCS_SCHEMA,
    )
    docs = pa.concat_tables([good.select(["doc_id", "spans"]), bad])
    out = incremental_match(docs, world["store"], str(tmp_path / "state"), revision_epoch=1)
    df = out.to_pandas()
    poison = df[df["doc_id"] == "poison"]
    assert poison["status"].tolist() == ["internal"]
    assert (df[df["doc_id"] != "poison"]["status"] == "ok").any()


def test_lean_memory_bound_measured(tmp_path, ray_session):
    """The lean route's worst-case actor memory is computed from the
    manifest, calibrated from real network bytes once one is built, and
    surfaced through match_documents' route decision + checkpoint
    lineage."""
    import ray.data as rd

    from routers_ray.matcher import MatchOptions
    from routers_ray.network import NetworkStore, build_network_store
    from routers_ray.pipelines import match_pipeline
    from routers_ray.synth import synth_corpus, synth_network

    nodes, edges = synth_network(seed=9, n_cities=1, grid=(8, 8))
    sd = str(tmp_path / "store")
    build_network_store(nodes, edges, sd, use_ray=False)
    store = NetworkStore(sd)

    b0 = store.lean_memory_bound()
    assert b0["bound_bytes"] > 0 and not b0["calibrated"]
    assert b0["max_window_rows"] > 0
    assert b0["bound_bytes"] == int(
        store.max_networks * b0["max_window_rows"] * b0["bytes_per_edge_row"]
    )

    # build one network → calibration flips to measured bytes/row
    opts = MatchOptions()
    buffer_m = opts.threshold_cm / 100.0 + opts.search_distance_m
    lon0 = float(np.asarray(nodes["lon"]).mean())
    lat0 = float(np.asarray(nodes["lat"]).mean())
    net = store.network_for_doc(
        np.array([lon0, lon0 + 1e-4]), np.array([lat0, lat0]), buffer_m=buffer_m
    )
    assert net.nbytes() > 0
    b1 = store.lean_memory_bound()
    assert b1["calibrated"]
    assert 16 < b1["bytes_per_edge_row"] < 4096  # sane per-row cost

    # match_documents(route="none") records the decision
    docs = synth_corpus(n_docs=10, seed=9, network=(nodes, edges))
    out = match_pipeline.match_documents(
        rd.from_arrow(docs), sd, route="none", salt=False, concurrency=2
    )
    out.count()
    dec = match_pipeline.last_route_decision
    assert dec is not None and dec["route"] == "none" and dec["bound_bytes"] > 0


def test_incremental_state_is_sharded(world, tmp_path):
    """The streaming trip state must be per-shard Parquet files (loaded
    only inside each shard's map_groups task), never one whole-state
    driver-side JSON — the 10^12-doc scaling requirement from VERDICT r03
    wrong #2."""
    import os

    from routers_ray.checkpoint import _load_state_shard, _state_shard_path

    state_dir = str(tmp_path / "sharded_state")
    out = incremental_match(
        world["docs"], world["store"], state_dir, revision_epoch=1, n_state_shards=4
    )
    assert out.num_rows > 0
    files = sorted(os.listdir(state_dir))
    assert "trips.json" not in files
    shard_files = [f for f in files if f.startswith("shard=") and f.endswith(".parquet")]
    assert len(shard_files) >= 2  # 30 docs over 4 shards → multiple shards touched
    # every doc's state lives in exactly the shard its hash routes to
    from routers_ray.functions import fnv1a_array, partition_of

    total_docs = 0
    for f in shard_files:
        shard = int(f.split("=")[1].split(".")[0])
        st = _load_state_shard(state_dir, shard)
        total_docs += len(st)
        ids = list(st)
        routed = partition_of(fnv1a_array(ids), 4)
        assert all(int(r) == shard for r in routed)
    assert total_docs == world["docs"].num_rows
    # second identical batch: docs whose full history fits in the stored
    # tail (CONTEXT_WINDOW*3 points) reconcile as "skip" and emit nothing;
    # longer docs restart (the bounded-tail contract, orchestrator.rs:501)
    from routers_ray.checkpoint import CONTEXT_WINDOW

    from routers_ray.spans import parse_trajectories

    parsed = parse_trajectories(world["docs"])
    npts = pa.compute.list_value_length(parsed["pts_ts"]).to_pylist()
    short = {d for d, n in zip(parsed["doc_id"].to_pylist(), npts) if n <= CONTEXT_WINDOW * 3}
    out2 = incremental_match(
        world["docs"], world["store"], state_dir, revision_epoch=2, n_state_shards=4
    )
    emitted2 = set(out2["doc_id"].to_pylist())
    assert not (emitted2 & short)  # every short doc skipped


def test_killed_run_resumes_from_sidecars(world, tmp_path):
    """A run killed BEFORE its end-of-run manifest append (manifest.jsonl
    empty/truncated, partition dirs present with their `_manifest.json`
    sidecars) must skip every finished partition and consolidate the
    recovered rows back into manifest.jsonl."""
    import os

    out = str(tmp_path / "out_kill")
    _run(world, out)
    man = read_manifest(out)
    # simulate the kill: the jsonl append never happened
    os.remove(manifest_path(out))
    before = read_matched(out).to_pandas()

    stats = _run(world, out)
    assert stats["computed"] == 0
    assert stats["skipped"] == len(man)
    # consolidation restored every sidecar row into the jsonl
    restored = read_manifest(out)
    assert {r["partition_id"] for r in restored} == {r["partition_id"] for r in man}

    after = read_matched(out).to_pandas()
    cols = ["doc_id", "seq", "status", "edge_id", "src", "dst", "cost"]
    import pandas as pd

    pd.testing.assert_frame_equal(
        before[cols].sort_values(cols).reset_index(drop=True),
        after[cols].sort_values(cols).reset_index(drop=True),
    )


def test_tmp_partition_with_sidecar_is_recomputed(world, tmp_path):
    """A kill between the sidecar dump and the dir rename leaves a .tmp
    dir containing _manifest.json; that partition must NOT count as
    complete (read_matched ignores .tmp dirs — counting it would lose
    its rows permanently)."""
    import os
    import shutil

    out = str(tmp_path / "out_tmpwin")
    _run(world, out)
    man = read_manifest(out)
    victim = man[-1]["partition_id"]
    pdir = os.path.join(out, "parts", victim)
    shutil.move(pdir, pdir + ".tmp")  # un-rename: the kill window state
    with open(manifest_path(out), "w") as f:
        for r in man[:-1]:
            f.write(json.dumps(r) + "\n")

    stats = _run(world, out)
    assert stats["computed"] == 1 and stats["skipped"] == len(man) - 1
    # the partition is back, with its rows present in the merged output
    assert os.path.isdir(pdir)
    got = read_matched(out).to_pandas()
    assert {r["partition_id"] for r in read_manifest(out)} == {
        r["partition_id"] for r in man
    }
    assert len(got) > 0


def test_shard_task_retry_is_idempotent(world, tmp_path):
    """ADVICE r04: a shard task re-executed AFTER its durable state write
    landed (Ray retry / lineage reconstruction) must re-emit the same rows,
    not reconcile everything as 'skip' and silently drop the shard's
    emissions. Replaying the same epoch is exactly that scenario."""
    state_dir = str(tmp_path / "retry_state")
    e1 = incremental_match(world["docs"], world["store"], state_dir, revision_epoch=1)
    assert e1.num_rows > 0

    # same epoch again == the retry: must replay identical emissions
    e1_retry = incremental_match(world["docs"], world["store"], state_dir, revision_epoch=1)
    cols = ["doc_id", "seq", "status", "edge_id", "dir", "action", "revision"]
    a = e1.select(cols).to_pandas().sort_values(cols).reset_index(drop=True)
    b = e1_retry.select(cols).to_pandas().sort_values(cols).reset_index(drop=True)
    import pandas as pd

    pd.testing.assert_frame_equal(a, b)

    # a genuinely NEW epoch with the same data still skips (the replay
    # guard keys on epoch, not on input equality)
    e2 = incremental_match(world["docs"], world["store"], state_dir, revision_epoch=2)
    from routers_ray.checkpoint import CONTEXT_WINDOW
    from routers_ray.spans import parse_trajectories

    parsed = parse_trajectories(world["docs"])
    npts = pa.compute.list_value_length(parsed["pts_ts"]).to_pylist()
    short = {d for d, n in zip(parsed["doc_id"].to_pylist(), npts) if n <= CONTEXT_WINDOW * 3}
    assert not (set(e2["doc_id"].to_pylist()) & short)


def test_merge_revisions_tiebreak_deterministic(ray_session):
    """Duplicate (doc_id, seq, revision) rows: the winner is pinned by a
    full-column descending lexsort, independent of input row order."""
    from routers_ray.checkpoint import _emit_schema

    def _row(edge, action):
        return {
            "doc_id": "d",
            "seq": 0,
            "status": "ok",
            "edge_id": edge,
            "dir": 0,
            "src": 1,
            "dst": 2,
            "snap_lon": 0.0,
            "snap_lat": 0.0,
            "cost": 5,
            "cell": 9,
            "action": action,
            "revision": 7,
        }

    rows = [_row(10, "restart"), _row(99, "resume"), _row(50, "restart")]
    t_fwd = pa.Table.from_pylist(rows, schema=_emit_schema())
    t_rev = pa.Table.from_pylist(rows[::-1], schema=_emit_schema())
    a = merge_revisions(t_fwd).to_pandas()
    b = merge_revisions(t_rev).to_pandas()
    assert len(a) == 1 and len(b) == 1
    assert a.iloc[0].to_dict() == b.iloc[0].to_dict()
    # descending lexsort on (doc_id, seq, status, edge_id, ...): all rows
    # share doc/seq/status, so the max edge_id (99) wins
    assert a.iloc[0]["edge_id"] == 99 and a.iloc[0]["action"] == "resume"
