"""Checkpoint / resume / lineage: partitioned output with a manifest, the
``Continuation::reconcile`` port, and revisioned incremental runs.

North-rule requirement: every partition carries lineage + row-count/latency
metrics and jobs resume from checkpoint without recomputing matched
trajectories. Reference semantics ported:

- per-partition atomic output + manifest (the ``.shard.rt`` + manifest.txt
  build discipline, ``routers_shard/bin/generate-shards.rs:92-130``; write
  to temp, rename);
- ``Continuation::reconcile``: the longest suffix of the stored trip's
  origins that is a prefix of the incoming history → Resume (tail-cut),
  else Restart (``routers_transition/src/matcher/continuation.rs:31-63``);
  exact equality of (ts) ids, like the reference's exact Origin equality;
- revisioned emissions: merge key (doc_id, seq), resolve by max revision
  (``routers_realtime/src/event.rs:81-112``); revision = run epoch;
- context-window tail: a resumed doc re-matches only the last
  ``CONTEXT_WINDOW`` known points plus the new ones
  (``orchestrator.rs:133-135``, ``Trip::tail`` ``trip.rs:122-148``).

Partition key = (anchor_cell, salt) — the same routing key the matcher
shuffle uses, so a failed run skips completed partitions by manifest lookup.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .matcher import MatchOptions
from .pipelines.match_pipeline import anchor_batch, get_store, match_batch
from .spans import parse_trajectories

CONTEXT_WINDOW = 10  # orchestrator.rs:133-135


# ---------------------------------------------------------------------------
# manifest


def manifest_path(out_dir: str) -> str:
    return os.path.join(out_dir, "manifest.jsonl")


def read_manifest(out_dir: str) -> list[dict]:
    p = manifest_path(out_dir)
    if not os.path.exists(p):
        return []
    with open(p) as f:
        return [json.loads(line) for line in f if line.strip()]


def append_manifest(out_dir: str, rows: list[dict]) -> None:
    """Atomic append: rewrite old+new to a temp file, rename over."""
    old = read_manifest(out_dir)
    tmp = manifest_path(out_dir) + ".tmp"
    with open(tmp, "w") as f:
        for r in old + rows:
            f.write(json.dumps(r) + "\n")
    os.replace(tmp, manifest_path(out_dir))


# lineage-row column types, keyed by name so adding/reordering a metric
# can never silently mispair a column with another column's Arrow type
_MANIFEST_TYPES = {
    "partition_id": pa.string(),
    "cell": pa.int64(),
    "salt": pa.int32(),
    "rows_in": pa.int64(),
    "rows_out": pa.int64(),
    "rows_ok": pa.int64(),
    "docs_err": pa.int64(),
    # JSON {error_kind: doc_count} — the doc-level taxonomy behind
    # docs_err, so ops can see WHICH failure clusters where without
    # re-reading partition data (kinds are matcher statuses:
    # disconnected / unreachable / parse kinds, status != "ok")
    "err_kinds": pa.string(),
    "max_ts": pa.int64(),
    "t_ms": pa.float64(),
    "revision_epoch": pa.int64(),
    "net_cache_hits": pa.int64(),
    "net_cache_misses": pa.int64(),
    "lean_bound_bytes": pa.int64(),
}


def partition_manifest_rows(out_dir: str) -> list[dict]:
    """Lineage rows from the per-partition ``_manifest.json`` sidecars —
    written INSIDE each partition dir before its atomic rename, so a run
    killed before the end-of-run manifest append still leaves every
    finished partition's row durable next to its data."""
    import glob

    rows = []
    for p in glob.glob(os.path.join(out_dir, "parts", "*", "_manifest.json")):
        d = os.path.basename(os.path.dirname(p))
        if d.endswith(".tmp"):
            # a kill between the sidecar dump and the dir rename leaves the
            # row inside a .tmp dir that read_matched() ignores — counting
            # it as complete would silently drop the partition's data
            continue
        try:
            with open(p) as f:
                row = json.load(f)
        except (OSError, json.JSONDecodeError):
            continue  # unreadable sidecar → treat the partition as not done
        if row.get("partition_id") == d:
            rows.append(row)
    return rows


def all_manifest_rows(out_dir: str) -> list[dict]:
    """Union of manifest.jsonl and partition sidecars (jsonl wins on id)."""
    rows = {r["partition_id"]: r for r in partition_manifest_rows(out_dir)}
    rows.update({r["partition_id"]: r for r in read_manifest(out_dir)})
    return list(rows.values())


def completed_partitions(out_dir: str) -> set[str]:
    return {r["partition_id"] for r in all_manifest_rows(out_dir)}


# ---------------------------------------------------------------------------
# checkpointed run


def run_checkpointed(
    docs_ds,
    store_path: str,
    out_dir: str,
    options: MatchOptions | None = None,
    revision_epoch: int = 0,
    target_docs_per_salt: int = 2000,
    keep_spans: bool = True,
) -> dict:
    """Match all docs, writing one parquet dir per (anchor_cell, salt)
    partition atomically + a lineage manifest row per partition. A rerun
    skips partitions already in the manifest.

    Returns ``{"computed": n, "skipped": n, "partitions": [...]}``.
    """
    import pyarrow.compute as pc

    opts = options or MatchOptions()
    store = get_store(store_path)
    os.makedirs(os.path.join(out_dir, "parts"), exist_ok=True)
    done = completed_partitions(out_dir)

    parsed = docs_ds.map_batches(parse_trajectories, batch_format="pyarrow")
    zoom = store.partition_zoom

    from .pipelines.match_pipeline import compute_salt_map

    # first-point-only combiner pre-pass over the RAW docs (one split per
    # doc, partial counts per batch) — same anchors as anchor_batch (both
    # key on the first point), without paying a second full parse
    salt_of_cell = compute_salt_map(docs_ds, zoom, target_docs_per_salt) or {}
    anchored = parsed.map_batches(
        lambda b: anchor_batch(b, zoom, salt_of_cell), batch_format="pyarrow"
    )

    # skip completed partitions before the shuffle (broadcast of the small
    # done-set — the manifest is one row per partition)
    done_list = sorted(done)

    def _filter_done(b: pa.Table) -> pa.Table:
        if not done_list:
            return b
        pid = [
            f"cell={c}_salt={s}"
            for c, s in zip(b["anchor_cell"].to_pylist(), b["salt"].to_pylist())
        ]
        keep = ~np.isin(np.asarray(pid), np.asarray(done_list))
        return b.filter(pa.array(keep))

    todo = anchored.map_batches(_filter_done, batch_format="pyarrow")

    opts_dict = {
        "search_distance_m": opts.search_distance_m,
        "emission_error_m": opts.emission_error_m,
        "threshold_cm": opts.threshold_cm,
        "fanout": opts.fanout,
        "drop_unanchored": opts.drop_unanchored,
    }

    def _write_partition(group: pa.Table) -> pa.Table:
        """groupby((cell, salt)).map_groups body: match + atomic write +
        manifest row. Uses the per-process store cache (works under both
        task and actor execution)."""
        t0 = time.perf_counter()
        cell = int(group["anchor_cell"][0].as_py())
        salt = int(group["salt"][0].as_py())
        pid = f"cell={cell}_salt={salt}"
        if pid in done:
            return pa.table({"partition_id": pa.array([], pa.string())})
        st = get_store(store_path)
        h0, m0 = st.net_cache_hits, st.net_cache_misses
        matched = match_batch(group, st, MatchOptions(**opts_dict), keep_spans=keep_spans)
        matched = matched.append_column(
            "revision", pa.array([revision_epoch] * len(matched), pa.uint64())
        )
        pdir = os.path.join(out_dir, "parts", pid)
        tmp = pdir + ".tmp"
        os.makedirs(tmp, exist_ok=True)
        pq.write_table(matched, os.path.join(tmp, "part.parquet"))
        ts_col = group["pts_ts"]
        flat_ts = (
            ts_col.combine_chunks().flatten() if isinstance(ts_col, pa.ChunkedArray) else ts_col.flatten()
        )
        max_ts = pc.max(flat_ts).as_py() if len(flat_ts) else None
        row = {
            "partition_id": pid,
            "cell": cell,
            "salt": salt,
            "rows_in": len(group),
            "rows_out": len(matched),
            # error taxonomy: ok span rows vs failed docs (a non-ok status
            # is one row per doc) — lineage shows WHERE failures cluster
            "rows_ok": int(pc.sum(pc.cast(pc.equal(matched["status"], "ok"), pa.int64())).as_py() or 0),
            "docs_err": int(pc.sum(pc.cast(pc.invert(pc.equal(matched["status"], "ok")), pa.int64())).as_py() or 0),
            "err_kinds": json.dumps(
                {
                    str(kv["values"]): int(kv["counts"])
                    for kv in pc.value_counts(
                        matched.filter(pc.not_equal(matched["status"], "ok"))["status"]
                    ).to_pylist()
                },
                sort_keys=True,
            ),
            "max_ts": int(max_ts) if max_ts is not None else -1,
            "t_ms": (time.perf_counter() - t0) * 1000.0,
            "revision_epoch": revision_epoch,
            # window-network cache effectiveness while matching this
            # partition (anchor-cell keying, network.py network_for_doc)
            "net_cache_hits": st.net_cache_hits - h0,
            "net_cache_misses": st.net_cache_misses - m0,
            # worst-case resident bytes of this worker's network LRU
            # (max_networks x heaviest window x bytes/row) — the
            # measured criterion the lean-vs-hash route choice uses
            "lean_bound_bytes": st.lean_memory_bound()["bound_bytes"],
        }
        # the lineage row rides INSIDE the partition's atomic rename — a
        # killed run leaves no manifest.jsonl entry, but every finished
        # partition stays skippable via its sidecar
        with open(os.path.join(tmp, "_manifest.json"), "w") as f:
            json.dump(row, f)
        if os.path.exists(pdir):
            import shutil

            shutil.rmtree(pdir)
        os.replace(tmp, pdir)
        return pa.table({k: pa.array([row[k]], t) for k, t in _MANIFEST_TYPES.items()})

    result = todo.groupby(["anchor_cell", "salt"]).map_groups(
        _write_partition, batch_format="pyarrow"
    )
    rows = result.to_pandas()
    rows = rows[rows["partition_id"] != ""] if len(rows) else rows
    new_rows = rows.to_dict("records") if len(rows) else []
    # consolidate: new rows + sidecar rows a crashed predecessor wrote but
    # never reached its manifest append (their partitions were skipped)
    in_jsonl = {r["partition_id"] for r in read_manifest(out_dir)}
    new_ids = {r["partition_id"] for r in new_rows}
    recovered = [
        r for r in partition_manifest_rows(out_dir)
        if r["partition_id"] not in in_jsonl and r["partition_id"] not in new_ids
    ]
    append_manifest(out_dir, new_rows + recovered)
    return {
        "computed": len(new_rows),
        "skipped": len(done),
        "partitions": [r["partition_id"] for r in new_rows],
    }


def read_matched(out_dir: str) -> pa.Table:
    """All partition outputs as one Arrow table."""
    parts_dir = os.path.join(out_dir, "parts")
    tables = []
    for d in sorted(os.listdir(parts_dir)):
        if d.endswith(".tmp"):
            continue
        p = os.path.join(parts_dir, d, "part.parquet")
        if os.path.exists(p):
            tables.append(pq.read_table(p))
    return pa.concat_tables(tables) if tables else pa.table({})


# ---------------------------------------------------------------------------
# reconcile + incremental runs


def reconcile(stored_ts: list[int], incoming_ts: list[int]) -> tuple[str, int]:
    """Port of ``Continuation::reconcile`` (``continuation.rs:31-63``).

    Returns ``("skip", n)`` when the incoming history IS the stored one,
    ``("resume", n_overlap)`` when some suffix of the stored trip equals a
    prefix of the incoming history (n_overlap = its length), else
    ``("restart", 0)``.
    """
    if stored_ts and stored_ts == incoming_ts:
        return ("skip", len(stored_ts))
    for start in range(len(stored_ts)):
        suffix = stored_ts[start:]
        if suffix == incoming_ts[: len(suffix)]:
            if len(suffix) > 0:
                return ("resume", len(suffix))
    return ("restart", 0)


N_STATE_SHARDS = 16  # default key-group count for the sharded trip state


def _emit_schema() -> pa.Schema:
    return pa.schema(
        [
            ("doc_id", pa.string()),
            ("seq", pa.int32()),
            ("status", pa.string()),
            ("edge_id", pa.int64()),
            ("dir", pa.uint8()),
            ("src", pa.int64()),
            ("dst", pa.int64()),
            ("snap_lon", pa.float64()),
            ("snap_lat", pa.float64()),
            ("cost", pa.uint32()),
            ("cell", pa.uint64()),
            ("action", pa.string()),
            ("revision", pa.uint64()),
        ]
    )


def _state_shard_path(state_dir: str, shard: int) -> str:
    return os.path.join(state_dir, f"shard={int(shard):05d}.parquet")


def _emit_shard_path(state_dir: str, shard: int) -> str:
    return os.path.join(state_dir, f"emit-shard={int(shard):05d}.parquet")


def _shard_stamp(path: str) -> tuple[int, str] | None:
    """(epoch, batch fingerprint) stamped in a shard file's schema
    metadata; ``None`` for a missing or legacy-unstamped file (both mean
    "no completed write to compare against" — no sentinel value that a
    real epoch could collide with)."""
    if not os.path.exists(path):
        return None
    md = pq.read_schema(path).metadata or {}
    if b"revision_epoch" not in md:
        return None
    return int(md[b"revision_epoch"]), md.get(b"batch_fp", b"").decode()


def _load_state_shard(state_dir: str, shard: int) -> dict[str, list[int]]:
    p = _state_shard_path(state_dir, shard)
    if not os.path.exists(p):
        return {}
    tbl = pq.read_table(p)
    return dict(zip(tbl["doc_id"].to_pylist(), tbl["ts"].to_pylist()))


def _stamp_md(revision_epoch: int, batch_fp: str) -> dict[bytes, bytes]:
    return {
        b"revision_epoch": str(int(revision_epoch)).encode(),
        b"batch_fp": batch_fp.encode(),
    }


def _write_state_shard(
    state_dir: str,
    shard: int,
    state: dict[str, list[int]],
    revision_epoch: int,
    batch_fp: str = "",
) -> None:
    """Atomic per-shard state write (temp + rename, like the partition
    outputs), stamped with the writing epoch + batch fingerprint for
    retry idempotency."""
    docs = sorted(state)
    tbl = pa.table(
        {
            "doc_id": pa.array(docs, pa.string()),
            "ts": pa.array([state[d] for d in docs], pa.list_(pa.int64())),
        }
    )
    tbl = tbl.replace_schema_metadata(_stamp_md(revision_epoch, batch_fp))
    p = _state_shard_path(state_dir, shard)
    tmp = p + ".tmp"
    pq.write_table(tbl, tmp)
    os.replace(tmp, p)


def _write_emit_shard(
    state_dir: str, shard: int, out: pa.Table, revision_epoch: int, batch_fp: str = ""
) -> None:
    """Persist a shard's emissions BEFORE the state rewrite so a task retry
    after the state write lands can replay them instead of reconciling
    every doc as 'skip' and silently emitting nothing."""
    out = out.replace_schema_metadata(_stamp_md(revision_epoch, batch_fp))
    p = _emit_shard_path(state_dir, shard)
    tmp = p + ".tmp"
    pq.write_table(out, tmp)
    os.replace(tmp, p)


def _match_shard_docs(
    parsed: pa.Table,
    store,
    opts: MatchOptions,
    state: dict[str, list[int]],
    revision_epoch: int,
    context_window: int,
) -> pa.Table:
    """Per-shard incremental core: reconcile each doc against its stored
    trip ts-list, match, emit new layers, update ``state`` in place."""
    from .cells import lonlat_to_cell
    from .matcher import MatchError, match_trajectory

    def _flat(name):
        col = parsed[name]
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        return arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64), np.asarray(arr.values)

    offs, flat_ts = _flat("pts_ts")
    _, flat_lon = _flat("pts_lon")
    _, flat_lat = _flat("pts_lat")
    doc_ids = parsed["doc_id"].to_pylist()

    o_doc, o_seq, o_status, o_eid, o_dir, o_src, o_dst = [], [], [], [], [], [], []
    o_slon, o_slat, o_cost, o_cell, o_action = [], [], [], [], []
    for i, doc in enumerate(doc_ids):
        lo, hi = offs[i], offs[i + 1]
        ts = flat_ts[lo:hi].astype(np.int64).tolist()
        action, n_overlap = reconcile(state.get(doc, []), ts)
        if action == "skip":
            continue
        if action == "resume":
            # tail-cut: re-match only the known-overlap window + new points
            # (Trip::tail, trip.rs:122-148). ALL re-matched layers are
            # re-emitted — the MatchedDiff contract (event.rs:81-112): later
            # solves may revise earlier window layers, and the revision
            # merge keeps the newest per (doc, seq)
            first_new = n_overlap
            window_start = max(0, first_new - context_window)
            emit_from = window_start
        else:
            window_start = 0
            emit_from = 0
        ll = flat_lon[lo + window_start : hi].astype(np.float64)
        la = flat_lat[lo + window_start : hi].astype(np.float64)
        if ll.size == 0:
            continue
        buffer_m = opts.threshold_cm / 100.0 + opts.search_distance_m
        try:
            # network build inside the guard: absurd per-doc coordinates
            # become this doc's error row, not a partition failure
            net = store.network_for_doc(
                ll, la, buffer_m=buffer_m, search_radius_m=opts.search_distance_m
            )
            res = match_trajectory(net, ll, la, opts)
        except Exception as exc:
            e = exc if isinstance(exc, MatchError) else MatchError("internal", [])
            o_doc.append(doc), o_seq.append(-1), o_status.append(e.kind)
            o_eid.append(None), o_dir.append(None), o_src.append(None), o_dst.append(None)
            o_slon.append(None), o_slat.append(None), o_cost.append(None), o_cell.append(None)
            o_action.append(action)
            state[doc] = ts[-context_window * 3 :]
            continue
        for m in res.layers:
            seq = m.seq + window_start  # global layer index
            if seq < emit_from:
                continue  # already-emitted prefix (converged layers)
            o_doc.append(doc), o_seq.append(seq), o_status.append("ok")
            o_eid.append(m.edge_id), o_dir.append(m.direction)
            o_src.append(m.src), o_dst.append(m.dst)
            o_slon.append(m.snap_lon), o_slat.append(m.snap_lat)
            o_cost.append(res.cost)
            o_cell.append(int(lonlat_to_cell(m.snap_lon, m.snap_lat, 15)))
            o_action.append(action)
        state[doc] = ts[-context_window * 3 :]  # history tail ×3 (orchestrator.rs:501)

    n = len(o_doc)
    return pa.table(
        {
            "doc_id": pa.array(o_doc, pa.string()),
            "seq": pa.array(o_seq, pa.int32()),
            "status": pa.array(o_status, pa.string()),
            "edge_id": pa.array(o_eid, pa.int64()),
            "dir": pa.array(o_dir, pa.uint8()),
            "src": pa.array(o_src, pa.int64()),
            "dst": pa.array(o_dst, pa.int64()),
            "snap_lon": pa.array(o_slon, pa.float64()),
            "snap_lat": pa.array(o_slat, pa.float64()),
            "cost": pa.array(o_cost, pa.uint32()),
            "cell": pa.array(o_cell, pa.uint64()),
            "action": pa.array(o_action, pa.string()),
            "revision": pa.array([revision_epoch] * n, pa.uint64()),
        },
        schema=_emit_schema(),
    )


def incremental_match(
    docs_tbl,
    store_path: str,
    state_dir: str,
    revision_epoch: int,
    options: MatchOptions | None = None,
    n_state_shards: int = N_STATE_SHARDS,
    lazy: bool = False,
):
    """Micro-batch incremental matching with SHARDED per-doc trip state.

    State = per-doc matched ts-list (bounded to the last CONTEXT_WINDOW
    points — the ``Trip::tail`` window), sharded into ``n_state_shards``
    key groups by ``splitmix64(fnv1a(doc_id)) % shards`` — the reference's
    own vehicle→partition scheme (``partition.rs:39-45``). The key is
    geometry-independent on purpose: a trajectory's anchor cell drifts as
    points arrive (resume batches start mid-history), so (cell, salt)
    keying would orphan trip state whenever a doc crosses a cell boundary
    between micro-batches. Each shard's Parquet state file is loaded and
    atomically rewritten ONLY inside that shard's ``map_groups`` task —
    the driver never holds the whole state, so the streaming path scales
    with shards like the batch checkpoint path does with partitions.

    New arrivals reconcile against stored state: skip / resume (re-match
    the overlap window + new points, emit only new seqs) / restart
    (re-match everything). Emitted rows carry ``revision =
    revision_epoch``; merge with :func:`merge_revisions`.

    Shard tasks are retry-idempotent: each state shard (and a per-shard
    emissions sidecar) is stamped with (writing epoch, micro-batch
    fingerprint), so a Ray task retry / lineage reconstruction after the
    durable state write replays the persisted emissions instead of
    reconciling every doc as 'skip'. The fingerprint distinguishes a
    retry of the SAME batch (replayed) from a contract violation: epochs
    must be unique per micro-batch and strictly increasing per state_dir
    — reusing an epoch with different docs, or running an older epoch
    after a newer one has advanced the state, raises instead of silently
    emitting wrong (empty) results.

    Accepts a pyarrow Table (micro-batch) or a ray.data.Dataset. Returns
    a Table bounded by the micro-batch size; pass ``lazy=True`` to get the
    emissions back as a Dataset (no driver-side materialization) for
    write-through at streaming scale (consume it before submitting the
    next epoch — the epoch ordering check is enforced at task runtime).
    """
    import ray.data as rd

    opts = options or MatchOptions()
    os.makedirs(state_dir, exist_ok=True)
    ds = docs_tbl if hasattr(docs_tbl, "map_batches") else rd.from_arrow(docs_tbl)
    # capture at call time so a caller-adjusted CONTEXT_WINDOW reaches the
    # shard tasks (module globals re-import fresh in workers)
    window = CONTEXT_WINDOW
    opts_dict = {
        "search_distance_m": opts.search_distance_m,
        "emission_error_m": opts.emission_error_m,
        "threshold_cm": opts.threshold_cm,
        "fanout": opts.fanout,
        "drop_unanchored": opts.drop_unanchored,
    }
    shards = int(n_state_shards)

    from .functions import fnv1a_array, partition_of

    def _prep(b: pa.Table) -> pa.Table:
        parsed = parse_trajectories(b)
        shard = partition_of(fnv1a_array(parsed["doc_id"].to_pylist()), shards)
        return parsed.append_column(
            "state_shard", pa.array(shard.astype(np.int32), pa.int32())
        )

    epoch = int(revision_epoch)
    if epoch < 0:
        raise ValueError(f"revision_epoch must be >= 0, got {epoch}")

    def _batch_fp(group: pa.Table) -> str:
        """Deterministic content fingerprint of one shard's micro-batch
        slice: doc ids + their raw point timestamps, order-independent.
        A Ray retry re-runs the task on the identical group → identical
        fingerprint; a different batch at the same epoch differs."""
        import hashlib

        ids = group["doc_id"].to_pylist()
        ts = group["pts_ts"].to_pylist()
        rows = sorted(
            (ids[i].encode() + b"\x00" + np.asarray(ts[i] or [], dtype=np.int64).tobytes())
            for i in range(len(ids))
        )  # full-row sort: duplicate doc_ids stay order-independent too
        h = hashlib.md5()
        for r in rows:
            h.update(r)
            h.update(b"\x01")
        return h.hexdigest()

    def _shard_group(group: pa.Table) -> pa.Table:
        shard = int(group["state_shard"][0].as_py())
        state_p = _state_shard_path(state_dir, shard)
        fp = _batch_fp(group)
        # Retry idempotency (object-store lineage reconstruction can rerun
        # this task after its durable state write landed): if the state
        # shard is already stamped with THIS (epoch, batch), the first
        # attempt finished — replay its persisted emissions instead of
        # reconciling every doc as 'skip' and silently dropping rows.
        stamp = _shard_stamp(state_p)
        if stamp is not None:
            st_epoch, st_fp = stamp
            if st_epoch > epoch:
                raise ValueError(
                    f"stale revision_epoch {epoch} for state shard {shard}: "
                    f"state already advanced to epoch {st_epoch} (out-of-order "
                    "submission or a lazy dataset consumed after a newer epoch)"
                )
            if st_epoch == epoch:
                if st_fp != fp:
                    raise ValueError(
                        f"revision_epoch {epoch} reused with a different "
                        f"micro-batch on state shard {shard}: epochs must be "
                        "unique per micro-batch"
                    )
                emit_p = _emit_shard_path(state_dir, shard)
                if _shard_stamp(emit_p) == (epoch, fp):
                    return pq.read_table(emit_p).replace_schema_metadata(None)
                # emit-first write order makes this unreachable short of
                # external file deletion — fail loudly, never emit nothing
                raise RuntimeError(
                    f"state shard {shard} is stamped epoch {epoch} but its "
                    "emissions sidecar is missing — refusing to silently "
                    "drop the shard's rows"
                )
        state = _load_state_shard(state_dir, shard)
        st = get_store(store_path)
        out = _match_shard_docs(
            group, st, MatchOptions(**opts_dict), state, epoch, window
        )
        # emissions first, state last: a crash in between leaves the state
        # un-stamped, so the retry recomputes (deterministically) and
        # overwrites; once the state stamp lands, replay is pure read.
        _write_emit_shard(state_dir, shard, out, epoch, fp)
        _write_state_shard(state_dir, shard, state, epoch, fp)
        return out

    res = ds.map_batches(_prep, batch_format="pyarrow").groupby("state_shard").map_groups(
        _shard_group, batch_format="pyarrow"
    )
    if lazy:
        # streaming-scale path: hand the emissions back as a Dataset so the
        # caller can write-through / merge without a driver-side gather
        return res
    tables = [
        b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        for b in res.iter_batches(batch_format="pyarrow")
    ]
    tables = [t for t in tables if t.num_rows]
    if not tables:
        return _emit_schema().empty_table()
    return pa.concat_tables(tables).combine_chunks()


def merge_revisions(tbl):
    """Emission merge: per (doc_id, seq) keep the max-revision row
    (``event.rs:100-112``), as a distributed
    ``groupby([doc_id, seq]).map_groups(max revision)`` — SURVEY §2.7's
    shape — so the merge never gathers the emission table on the driver.

    Accepts a pyarrow Table or a ray.data.Dataset; returns a **Dataset**
    (the whole-log merge is the unbounded step at streaming scale —
    consume with ``write_parquet`` / ``iter_batches`` / ``to_pandas``
    as appropriate to the result size).

    Tie-break: among rows sharing the max revision the winner is chosen
    by a full-column descending lexsort — deterministic regardless of the
    nondeterministic row order inside a Ray group. (Duplicate
    (doc_id, seq, revision) emissions are a caller-contract violation;
    this just pins the outcome when it happens.)
    """
    import pyarrow.compute as pc
    import ray.data as rd

    ds = tbl if hasattr(tbl, "map_batches") else rd.from_arrow(tbl)

    def _newest(group: pa.Table) -> pa.Table:
        rev = group["revision"].to_numpy(zero_copy_only=False)
        mx = rev.max()
        n_max = int((rev == mx).sum())
        if n_max == 1:
            return group.slice(int(np.argmax(rev)), 1)
        cand = group.filter(pa.array(rev == mx))
        idx = pc.sort_indices(
            cand, sort_keys=[(c, "descending") for c in cand.column_names]
        )
        return cand.take(idx[:1])

    return ds.groupby(["doc_id", "seq"]).map_groups(_newest, batch_format="pyarrow")
