"""Interleaved text+media document spans: parse, normalize, invariant check.

The north-rule corpus (BASELINE.json ``input_hint``) is a table of
``(doc_id: string, spans: list<struct{kind, text, media_ref, offset}>)``
rows. The ordered ``kind="text"`` spans whose text parses as
``"<lon> <lat> <ts_us>"`` form the document's trajectory — the analogue of
the reference's ``Origin { point, timestamp µs }``
(``routers_transition/src/matcher/origin.rs:16-22``). Media and prose spans
pass through every stage untouched, and the per-row span sequence
(kind, text, media_ref, order) must be byte-equal end to end.

All parsing is vectorized over the flattened Arrow child arrays — no
per-row Python in the hot path.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

SPAN_STRUCT = pa.struct(
    [
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("offset", pa.int32()),
    ]
)
DOCS_SCHEMA = pa.schema([("doc_id", pa.string()), ("spans", pa.list_(SPAN_STRUCT))])

# "<lon> <lat> <ts_us>" — fixed-point decimals, integer timestamp. Literal
# spaces (not \s): the payload is split with pc.split_pattern(text, " "), so
# the matcher and splitter must agree — a tab-separated lookalike must NOT
# match the regex and then fail the float cast (poison-pill isolation).
_POINT_RE = r"^-?\d+(\.\d+)? -?\d+(\.\d+)? \d+$"


def _spans_chunks(spans_col) -> pa.ListArray:
    arr = spans_col.combine_chunks() if isinstance(spans_col, pa.ChunkedArray) else spans_col
    if isinstance(arr, pa.ChunkedArray):  # zero-chunk edge
        arr = pa.concat_arrays(arr.chunks) if arr.num_chunks else pa.array([], arr.type)
    return arr


def parse_trajectories(batch: pa.Table) -> pa.Table:
    """Append packed trajectory columns to a docs batch.

    Adds ``pts_lon/pts_lat`` (``list<float64>``), ``pts_ts``
    (``list<int64>``) and ``n_pts`` (int32), leaving ``doc_id``/``spans``
    untouched. Points keep span order; timestamps are NOT sorted here (see
    :func:`normalize_points` for the gate/sort stage).
    """
    spans = _spans_chunks(batch["spans"])
    n_rows = len(batch)
    offsets = spans.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    # A sliced ListArray's offsets don't start at 0 while flatten() rebases
    # its values — rebase so span indices and flat arrays share one base.
    offsets = offsets - offsets[0]
    flat = spans.flatten()  # StructArray of all spans
    kind = pc.struct_field(flat, "kind")
    text = pc.struct_field(flat, "text")

    is_text = pc.equal(kind, "text")
    is_point = pc.fill_null(
        pc.and_kleene(is_text, pc.match_substring_regex(text, _POINT_RE)), False
    )
    is_point_np = is_point.to_numpy(zero_copy_only=False).astype(bool)

    # split the point payloads (only the matching spans → small flat arrays)
    idx = np.flatnonzero(is_point_np)
    payload = pc.split_pattern(text.take(pa.array(idx)), " ")
    parts = payload.flatten()
    vals = np.asarray(pc.cast(parts, pa.float64()))
    lon = vals[0::3]
    lat = vals[1::3]
    ts = vals[2::3].astype(np.int64)

    # rebuild list offsets: number of points per row
    row_of_span = np.searchsorted(offsets, np.arange(offsets[-1]), side="right") - 1 if offsets[-1] else np.empty(0, np.int64)
    pts_per_row = np.bincount(row_of_span[idx], minlength=n_rows) if idx.size else np.zeros(n_rows, np.int64)
    new_offsets = np.concatenate(([0], np.cumsum(pts_per_row))).astype(np.int32)

    off = pa.array(new_offsets, pa.int32())
    out = batch.append_column("pts_lon", pa.ListArray.from_arrays(off, pa.array(lon, pa.float64())))
    out = out.append_column("pts_lat", pa.ListArray.from_arrays(off, pa.array(lat, pa.float64())))
    out = out.append_column("pts_ts", pa.ListArray.from_arrays(off, pa.array(ts, pa.int64())))
    out = out.append_column("n_pts", pa.array(pts_per_row.astype(np.int32), pa.int32()))
    return out


def normalize_points(
    batch: pa.Table,
    gap_us: int = 120_000_000,
    teleport_m: float = 2_000.0,
    context_window: int | None = None,
) -> pa.Table:
    """Per-doc trace normalization + gap/teleport gate.

    Reference orchestrator semantics (``realtime/bin/orchestrator.rs:626-669``):
    sort by timestamp, drop duplicate timestamps, cut history at a >120 s
    gap or >2 km jump (keep the suffix after the last cut), and optionally
    truncate to the last ``context_window`` points. Rewrites the packed
    point columns in place.
    """
    from .geo import haversine_m

    lons_l = batch["pts_lon"].combine_chunks() if isinstance(batch["pts_lon"], pa.ChunkedArray) else batch["pts_lon"]
    lats_l = batch["pts_lat"].combine_chunks() if isinstance(batch["pts_lat"], pa.ChunkedArray) else batch["pts_lat"]
    ts_l = batch["pts_ts"].combine_chunks() if isinstance(batch["pts_ts"], pa.ChunkedArray) else batch["pts_ts"]

    offs = lons_l.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    lon = np.asarray(lons_l.values, dtype=np.float64)
    lat = np.asarray(lats_l.values, dtype=np.float64)
    ts = np.asarray(ts_l.values, dtype=np.int64)

    out_lon, out_lat, out_ts, counts = [], [], [], []
    for i in range(len(batch)):
        lo, hi = offs[i], offs[i + 1]
        ll, la, tt = lon[lo:hi], lat[lo:hi], ts[lo:hi]
        if tt.size:
            order = np.argsort(tt, kind="stable")
            ll, la, tt = ll[order], la[order], tt[order]
            keep = np.concatenate(([True], tt[1:] != tt[:-1]))
            ll, la, tt = ll[keep], la[keep], tt[keep]
            if tt.size > 1:
                dt = np.diff(tt)
                dd = haversine_m(ll[:-1], la[:-1], ll[1:], la[1:])
                cuts = np.flatnonzero((dt > gap_us) | (dd > teleport_m))
                if cuts.size:
                    start = cuts[-1] + 1
                    ll, la, tt = ll[start:], la[start:], tt[start:]
            if context_window is not None and tt.size > context_window:
                ll, la, tt = ll[-context_window:], la[-context_window:], tt[-context_window:]
        out_lon.append(ll), out_lat.append(la), out_ts.append(tt)
        counts.append(tt.size)

    new_off = pa.array(np.concatenate(([0], np.cumsum(counts))).astype(np.int32), pa.int32())
    lon_v = pa.array(np.concatenate(out_lon) if counts else [], pa.float64())
    lat_v = pa.array(np.concatenate(out_lat) if counts else [], pa.float64())
    ts_v = pa.array(np.concatenate(out_ts) if counts else [], pa.int64())

    def _replace(tbl, name, arr):
        i = tbl.schema.get_field_index(name)
        return tbl.set_column(i, name, arr)

    out = _replace(batch, "pts_lon", pa.ListArray.from_arrays(new_off, lon_v))
    out = _replace(out, "pts_lat", pa.ListArray.from_arrays(new_off, lat_v))
    out = _replace(out, "pts_ts", pa.ListArray.from_arrays(new_off, ts_v))
    out = _replace(out, "n_pts", pa.array(np.asarray(counts, dtype=np.int32), pa.int32()))
    return out


def span_signature(spans_col) -> list[tuple]:
    """Canonical per-row span sequence [(kind, text, media_ref), ...] — the
    byte-equality invariant checked by test_span_invariant."""
    arr = _spans_chunks(spans_col)
    return [
        [(s["kind"], s["text"], s["media_ref"]) for s in row] if row is not None else None
        for row in arr.to_pylist()
    ]


# ---------------------------------------------------------------------------
# GeoJSON trace loader (conformance/src/trace/loader.rs:29-56)


def load_geojson_trace(path_or_obj) -> tuple[str, np.ndarray, np.ndarray]:
    """One GeoJSON Feature file (or parsed dict) → (id, lons, lats).

    The file must hold a single Feature with LineString geometry; each
    coordinate is [longitude, latitude] per the GeoJSON spec — the
    reference's ``GpsTrace`` loader contract."""
    import json

    if isinstance(path_or_obj, (str, bytes)):
        with open(path_or_obj) as f:
            feature = json.load(f)
    else:
        feature = path_or_obj
    geom = feature.get("geometry") or {}
    if geom.get("type") != "LineString":
        raise ValueError(f"expected LineString geometry, got {geom.get('type')!r}")
    coords = np.asarray(geom["coordinates"], dtype=np.float64)
    trace_id = str((feature.get("properties") or {}).get("id", ""))
    return trace_id, coords[:, 0], coords[:, 1]


def traces_to_docs(traces, ts_step_us: int = 1_000_000) -> pa.Table:
    """GeoJSON traces → the interleaved-doc table shape (input_hint): each
    point becomes a '<lon> <lat> <ts>' text span — so external traces enter
    the same pipeline as the synthetic corpus."""
    doc_ids, spans_col = [], []
    for trace_id, lons, lats in traces:
        spans = [
            {
                "kind": "text",
                "text": f"{lons[i]} {lats[i]} {(i + 1) * ts_step_us}",
                "media_ref": "",
                "offset": i,
            }
            for i in range(len(lons))
        ]
        doc_ids.append(trace_id)
        spans_col.append(spans)
    return pa.table({"doc_id": doc_ids, "spans": spans_col}, schema=DOCS_SCHEMA)
