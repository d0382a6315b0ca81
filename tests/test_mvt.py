"""MVT layer assembly round-trips (``layer.rs:10-90`` port) + the dated
tile range semantics (``query/range.rs``)."""

import numpy as np
import pyarrow as pa
import pytest

from routers_ray.mvt import (
    MVT_EXTENT,
    MVT_VERSION,
    decode_tile,
    encode_point_layer,
    encode_tile,
    mvt_tiles,
    unzigzag32,
    zigzag32,
)
from routers_ray.tiles import DatedRange


def test_zigzag_round_trip():
    for v in [0, 1, 2, 4095, 4096, 2**31 - 1]:
        assert unzigzag32(zigzag32(v)) == v
    # layer.rs:78-80 pinned shape
    assert zigzag32(1) == 2
    assert zigzag32(4095) == 8190


def test_point_layer_round_trip():
    ids = np.array([7, 8])
    px = np.array([100, 4095])
    py = np.array([0, 2048])
    layer = encode_point_layer(
        "pts", ids, px, py, props={"kind": np.array(["a", "b"], dtype=object),
                                   "n": np.array([3, 4], dtype=np.int64)}
    )
    [dec] = decode_tile(encode_tile([layer]))
    assert dec["name"] == "pts"
    assert dec["extent"] == MVT_EXTENT
    assert dec["version"] == MVT_VERSION
    assert dec["keys"] == ["kind", "n"]
    # value pool is feature-major: [kind_0, n_0, kind_1, n_1]
    assert dec["values"] == ["a", 3, "b", 4]
    assert len(dec["features"]) == 2
    f0, f1 = dec["features"]
    assert f0["id"] == 7 and f1["id"] == 8
    assert f0["type"] == 1  # POINT
    # tags pair (key_idx, feature_idx*key_len + key_idx) — layer.rs:84-87
    assert f0["tags"] == [0, 0, 1, 1]
    assert f1["tags"] == [0, 2, 1, 3]
    # geometry: MoveTo(1) + zig-zag offsets
    assert f0["geometry"][0] == 9
    assert unzigzag32(f0["geometry"][1]) == 100
    assert unzigzag32(f0["geometry"][2]) == 0
    assert unzigzag32(f1["geometry"][1]) == 4095
    assert unzigzag32(f1["geometry"][2]) == 2048


def test_mvt_tiles_pipeline(ray_session):
    import ray.data as rd

    rows = pa.table(
        {
            "doc_id": pa.array(["a", "a", "b"], pa.string()),
            "seq": pa.array([0, 1, 0], pa.int32()),
            "snap_lon": pa.array([-118.15, -118.15001, 10.0], pa.float64()),
            "snap_lat": pa.array([34.15, 34.15001, 10.0], pa.float64()),
        }
    )
    out = mvt_tiles(rd.from_arrow(rows), zoom=12).to_pandas().sort_values("x")
    assert len(out) == 2  # two distinct tiles
    assert out["n_features"].sum() == 3
    for _, r in out.iterrows():
        [layer] = decode_tile(bytes(r["tile"]))
        assert layer["extent"] == 4096
        assert len(layer["features"]) == r["n_features"]
        for f in layer["features"]:
            assert f["geometry"][0] == 9
            assert 0 <= unzigzag32(f["geometry"][1]) < 4096
            assert 0 <= unzigzag32(f["geometry"][2]) < 4096


def test_dated_range_within():
    # 2024-01-02 is a Tuesday; weekdays Mon-Fri
    r = DatedRange.parse("2024-01-02", "2024-01-19", "0-1-2-3-4")
    import datetime as dt

    def us(s):
        return int(dt.datetime.fromisoformat(s + "+00:00").timestamp() * 1e6)

    assert r.within_us(np.array([us("2024-01-02T10:00")]))[0]
    assert not r.within_us(np.array([us("2024-01-06T10:00")]))[0]  # Saturday
    assert not r.within_us(np.array([us("2024-01-20T10:00")]))[0]  # past end
    # end boundary: midnight of end day is inclusive, later that day is not
    assert r.within_us(np.array([us("2024-01-19T00:00")]))[0]
    assert not r.within_us(np.array([us("2024-01-19T00:00:01")]))[0]
    # weekend-only range
    w = DatedRange.parse("2024-02-01", "2024-02-25", "5-6")
    assert w.within_us(np.array([us("2024-02-03T12:00")]))[0]  # Saturday
    assert not w.within_us(np.array([us("2024-02-05T12:00")]))[0]  # Monday


def test_fragment_scan_dated_tiles(ray_session):
    """TileQuery::batch shape: one requested fragment expands to its
    storage-zoom children x dated ranges, filtering the dated tile table."""
    import ray.data as rd

    from routers_ray.tiles import fragment_children, materialize_dated_tiles, scan_dated_tiles

    cx, cy = fragment_children(5, 10, 10, 7)
    assert cx.size == 16 and set(cx.tolist()) == {40, 41, 42, 43}

    # build a dated tile table from two points on different days/tiles
    pts = pa.table(
        {
            "lon": pa.array([10.0, 10.0, 150.0]),
            "lat": pa.array([20.0, 20.0, -30.0]),
            # Tue 2024-01-02, Sat 2024-01-06, Tue 2024-01-02
            "ts_us": pa.array([1704187200000000, 1704542400000000, 1704187200000000], pa.int64()),
        }
    )
    r_all = DatedRange.parse("2024-01-01", "2024-01-31", "0-1-2-3-4-5-6")
    tiles = materialize_dated_tiles(rd.from_arrow(pts), [7], [r_all])
    assert tiles.num_rows == 3  # (tile, date) combos

    # scan the fragment containing lon=10/lat=20 at z5, weekdays only
    from routers_ray.tiles import lonlat_to_tile

    x7, y7 = (int(v) for v in lonlat_to_tile(10.0, 20.0, 7))
    frag = (5, x7 >> 2, y7 >> 2)
    wk = DatedRange.parse("2024-01-01", "2024-01-31", "0-1-2-3-4")
    hit = scan_dated_tiles(tiles, *frag, [wk], storage_zoom=7)
    assert hit.num_rows == 1  # only the Tuesday row at that tile
    assert hit["date"].to_pylist() == [240102]
