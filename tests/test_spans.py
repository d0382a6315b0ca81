"""Span parsing and trace-normalization tests (orchestrator gate semantics,
``realtime/bin/orchestrator.rs:626-669``)."""

import numpy as np
import pytest
import pyarrow as pa

from routers_ray.spans import DOCS_SCHEMA, normalize_points, parse_trajectories, span_signature


def make_doc(doc_id, spans):
    return pa.Table.from_pylist([{"doc_id": doc_id, "spans": spans}], schema=DOCS_SCHEMA)


def text_span(text, offset):
    return {"kind": "text", "text": text, "media_ref": "", "offset": offset}


def media_span(ref, offset):
    return {"kind": "media", "text": "", "media_ref": ref, "offset": offset}


def test_parse_extracts_points_in_span_order():
    t = make_doc(
        "d1",
        [
            text_span("-118.1000000 34.1000000 1000", 0),
            media_span("media://d1/0", 1),
            text_span("some prose note", 2),
            text_span("-118.2000000 34.2000000 2000", 3),
        ],
    )
    out = parse_trajectories(t)
    assert out["n_pts"].to_pylist() == [2]
    assert out["pts_lon"].to_pylist() == [[-118.1, -118.2]]
    assert out["pts_ts"].to_pylist() == [[1000, 2000]]
    # spans untouched
    assert span_signature(out["spans"]) == span_signature(t["spans"])


def test_parse_handles_empty_and_prose_only():
    t = pa.Table.from_pylist(
        [
            {"doc_id": "a", "spans": [text_span("hello world", 0)]},
            {"doc_id": "b", "spans": []},
            {"doc_id": "c", "spans": [text_span("1.5 2.5 99", 0)]},
        ],
        schema=DOCS_SCHEMA,
    )
    out = parse_trajectories(t)
    assert out["n_pts"].to_pylist() == [0, 0, 1]


def test_normalize_sorts_and_dedups_ts():
    t = make_doc(
        "d",
        [
            text_span("0.0002 0.0 3000", 0),
            text_span("0.0000 0.0 1000", 1),
            text_span("0.0001 0.0 2000", 2),
            text_span("0.0009 0.0 2000", 3),  # duplicate ts → dropped (first kept)
        ],
    )
    out = normalize_points(parse_trajectories(t))
    assert out["pts_ts"].to_pylist() == [[1000, 2000, 3000]]
    lons = out["pts_lon"].to_pylist()[0]
    assert lons == [0.0, 0.0001, 0.0002]


def test_normalize_gap_cut_keeps_suffix():
    # >120 s gap between 2nd and 3rd point → only the suffix survives
    t = make_doc(
        "d",
        [
            text_span("0.0 0.0 0", 0),
            text_span("0.0001 0.0 5000000", 1),
            text_span("0.0002 0.0 999000000", 2),
            text_span("0.0003 0.0 1004000000", 3),
        ],
    )
    out = normalize_points(parse_trajectories(t))
    assert out["pts_ts"].to_pylist() == [[999000000, 1004000000]]


def test_normalize_teleport_cut():
    # >2 km jump → history cut at the jump
    t = make_doc(
        "d",
        [
            text_span("0.0 0.0 0", 0),
            text_span("0.5 0.0 5000000", 1),  # ~55 km jump
            text_span("0.5001 0.0 10000000", 2),
        ],
    )
    out = normalize_points(parse_trajectories(t))
    assert out["pts_ts"].to_pylist() == [[5000000, 10000000]]


def test_normalize_context_window():
    spans = [text_span(f"0.000{i} 0.0 {1000 + i * 1000}", i) for i in range(9)]
    t = make_doc("d", spans)
    out = normalize_points(parse_trajectories(t), context_window=4)
    assert out["n_pts"].to_pylist() == [4]
    assert out["pts_ts"].to_pylist()[0][-1] == 9000


def test_parse_is_vectorized_over_many_rows():
    rows = []
    for i in range(500):
        rows.append(
            {
                "doc_id": f"d{i}",
                "spans": [
                    text_span(f"{i * 0.001:.7f} {i * 0.0005:.7f} {i}", 0),
                    media_span(f"media://d{i}/0", 1),
                ],
            }
        )
    t = pa.Table.from_pylist(rows, schema=DOCS_SCHEMA)
    out = parse_trajectories(t)
    assert out["n_pts"].to_pylist() == [1] * 500
    lons = np.asarray([x[0] for x in out["pts_lon"].to_pylist()])
    assert np.allclose(lons, np.arange(500) * 0.001)


def test_geojson_trace_loader(tmp_path):
    """conformance/src/trace/loader.rs:29-56 contract: single Feature with
    LineString geometry; [lon, lat] coordinate order; id from properties."""
    import json

    from routers_ray.spans import load_geojson_trace, parse_trajectories, traces_to_docs

    feature = {
        "type": "Feature",
        "properties": {"id": "trip-1"},
        "geometry": {
            "type": "LineString",
            "coordinates": [[-118.151, 34.15], [-118.155, 34.1502]],
        },
    }
    p = tmp_path / "trace.geojson"
    p.write_text(json.dumps(feature))
    tid, lons, lats = load_geojson_trace(str(p))
    assert tid == "trip-1"
    assert lons.tolist() == [-118.151, -118.155]
    assert lats.tolist() == [34.15, 34.1502]

    with pytest.raises(ValueError):
        load_geojson_trace({"geometry": {"type": "Point", "coordinates": [0, 0]}})

    docs = traces_to_docs([(tid, lons, lats)])
    parsed = parse_trajectories(docs)
    assert parsed["n_pts"].to_pylist() == [2]
    assert np.asarray(parsed["pts_lon"].to_pylist()[0]).tolist() == lons.tolist()


def test_write_corpus_sharded_roundtrip(tmp_path, ray_session):
    """n_files > 1 writes a directory of part files whose union equals the
    single-blob corpus row-for-row (the parallel-read layout bench uses)."""
    import pyarrow as pa
    import ray.data as rd

    from routers_ray.synth import synth_corpus, write_corpus

    tbl = synth_corpus(n_docs=50, seed=4)
    p1 = write_corpus(tbl, str(tmp_path / "one"))["parquet"]
    pN = write_corpus(tbl, str(tmp_path / "many"), n_files=8)["parquet"]
    import os

    assert os.path.isdir(pN) and len(os.listdir(pN)) == 8
    a = pa.concat_tables(
        b for b in rd.read_parquet(p1).iter_batches(batch_format="pyarrow")
    ).sort_by("doc_id")
    b = pa.concat_tables(
        t for t in rd.read_parquet(pN).iter_batches(batch_format="pyarrow")
    ).sort_by("doc_id")
    assert a["doc_id"].to_pylist() == b["doc_id"].to_pylist()
    assert a["spans"].to_pylist() == b["spans"].to_pylist()
