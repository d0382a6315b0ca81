"""MVT (Mapbox Vector Tile) layer assembly — servable tile blobs.

Port of ``MVTLayer``/``MVTFeature`` (``routers_tiles/src/primitives/
layer.rs:10-90``): extent-4096 point features with zig-zag-encoded in-tile
geometry (``(v<<1)^(v>>31)``, layer.rs:78-80), a shared key pool
(``T::keys()``) and a flattened value pool where feature ``i``'s values
live at indices ``i*key_len .. (i+1)*key_len`` and tags pair
``[key_idx, i*key_len + key_idx]``.

The wire format is the actual vector_tile protobuf shape (Tile → repeated
Layer(3); Layer{version=15, name=1, features=2, keys=3, values=4,
extent=5}; Feature{id=1, tags=2, type=3, geometry=4}; Value{string=1,
double=3, int64=4}) written by a dependency-free varint encoder — the
container has no protobuf library, and the messages involved are simple
enough that a 60-line writer is the honest port. A minimal decoder backs
the round-trip tests.
"""

from __future__ import annotations

import numpy as np

MVT_VERSION = 2
MVT_EXTENT = 4096  # routers_geo MVT_EXTENT

# Feature geometry command: MoveTo (id 1) with count 1 (layer.rs:88)
_MOVETO_1 = (1 & 0x7) | (1 << 3)


def zigzag32(v: int) -> int:
    return ((v << 1) ^ (v >> 31)) & 0xFFFFFFFF


def unzigzag32(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


# ---------------------------------------------------------------------------
# protobuf primitives


def _varint(n: int) -> bytes:
    out = bytearray()
    n &= (1 << 64) - 1
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _field(num: int, wire: int) -> bytes:
    return _varint((num << 3) | wire)


def _len_delim(num: int, payload: bytes) -> bytes:
    return _field(num, 2) + _varint(len(payload)) + payload


def _packed(num: int, values) -> bytes:
    return _len_delim(num, b"".join(_varint(int(v)) for v in values))


def _value_msg(v) -> bytes:
    """MVT Value: string(1) / double(3) / int64(4)."""
    if isinstance(v, str):
        return _len_delim(1, v.encode("utf-8"))
    if isinstance(v, (int, np.integer)):
        return _field(4, 0) + _varint(int(v) & ((1 << 64) - 1))
    import struct

    return _field(3, 1) + struct.pack("<d", float(v))


# ---------------------------------------------------------------------------
# layer assembly


def encode_point_layer(
    name: str,
    ids: np.ndarray,
    px: np.ndarray,
    py: np.ndarray,
    props: dict[str, np.ndarray] | None = None,
) -> bytes:
    """One MVT layer of point features from in-tile 0..4096 offsets.

    ``props``: column name → per-feature values; the column names form the
    key pool and the flattened column-major-by-feature values the value
    pool, with tags pairing exactly like the reference
    (``layer.rs:84-87``).
    """
    props = props or {}
    keys = list(props)
    key_len = len(keys)
    n = int(np.asarray(ids).size)

    feats = bytearray()
    for i in range(n):
        f = bytearray()
        f += _field(1, 0) + _varint(int(ids[i]))
        if key_len:
            tags = []
            for k in range(key_len):
                tags += [k, i * key_len + k]
            f += _packed(2, tags)
        f += _field(3, 0) + _varint(1)  # GeomType::POINT
        f += _packed(4, [_MOVETO_1, zigzag32(int(px[i])), zigzag32(int(py[i]))])
        feats += _len_delim(2, bytes(f))

    layer = bytearray()
    layer += _field(15, 0) + _varint(MVT_VERSION)
    layer += _len_delim(1, name.encode("utf-8"))
    layer += bytes(feats)
    for k in keys:
        layer += _len_delim(3, k.encode("utf-8"))
    for i in range(n):  # value pool: feature-major (layer.rs:19)
        for k in keys:
            layer += _len_delim(4, _value_msg(props[k][i]))
    layer += _field(5, 0) + _varint(MVT_EXTENT)
    return bytes(layer)


def encode_tile(layers: list[bytes]) -> bytes:
    """Tile message: repeated Layer field 3."""
    return b"".join(_len_delim(3, l) for l in layers)


# ---------------------------------------------------------------------------
# minimal decoder (round-trip tests)


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    out = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, pos
        shift += 7


def _fields(buf: bytes):
    pos = 0
    while pos < len(buf):
        tag, pos = _read_varint(buf, pos)
        num, wire = tag >> 3, tag & 0x7
        if wire == 0:
            v, pos = _read_varint(buf, pos)
            yield num, v
        elif wire == 2:
            ln, pos = _read_varint(buf, pos)
            yield num, buf[pos : pos + ln]
            pos += ln
        elif wire == 1:
            yield num, buf[pos : pos + 8]
            pos += 8
        else:  # pragma: no cover
            raise ValueError(f"unsupported wire type {wire}")


def decode_tile(buf: bytes) -> list[dict]:
    """Parse a Tile → list of layer dicts (enough for assertions)."""
    import struct

    layers = []
    for num, payload in _fields(buf):
        if num != 3:
            continue
        layer = {"features": [], "keys": [], "values": [], "name": None,
                 "extent": None, "version": None}
        for lnum, lval in _fields(payload):
            if lnum == 15:
                layer["version"] = lval
            elif lnum == 1:
                layer["name"] = lval.decode("utf-8")
            elif lnum == 5:
                layer["extent"] = lval
            elif lnum == 3:
                layer["keys"].append(lval.decode("utf-8"))
            elif lnum == 4:
                for vnum, vval in _fields(lval):
                    if vnum == 1:
                        layer["values"].append(vval.decode("utf-8"))
                    elif vnum == 3:
                        layer["values"].append(struct.unpack("<d", vval)[0])
                    elif vnum == 4:
                        layer["values"].append(int(vval))
            elif lnum == 2:
                feat = {"id": None, "tags": [], "type": None, "geometry": []}
                for fnum, fval in _fields(lval):
                    if fnum == 1:
                        feat["id"] = fval
                    elif fnum == 3:
                        feat["type"] = fval
                    elif fnum == 2:
                        pos = 0
                        while pos < len(fval):
                            v, pos = _read_varint(fval, pos)
                            feat["tags"].append(v)
                    elif fnum == 4:
                        pos = 0
                        while pos < len(fval):
                            v, pos = _read_varint(fval, pos)
                            feat["geometry"].append(v)
                layer["features"].append(feat)
        layers.append(layer)
    return layers


# ---------------------------------------------------------------------------
# pipeline stage


def mvt_tiles(matched_ds, zoom: int, layer_name: str = "matched"):
    """Matched rows → one servable MVT blob per touched tile:
    per-batch tile binning (in-tile offsets via ``project_to_tile``) →
    ``groupby(x, y).map_groups`` layer assembly. Returns a Dataset of
    (z, x, y, n_features, tile: binary)."""
    import pyarrow as pa

    from .tiles import project_to_tile

    def _bin(b: pa.Table) -> pa.Table:
        lon = np.asarray(b["snap_lon"], dtype=np.float64)
        lat = np.asarray(b["snap_lat"], dtype=np.float64)
        x, y, px, py = project_to_tile(lon, lat, zoom)
        return pa.table(
            {
                "x": pa.array(x.astype(np.int64), pa.int64()),
                "y": pa.array(y.astype(np.int64), pa.int64()),
                "px": pa.array(px.astype(np.int64), pa.int64()),
                "py": pa.array(py.astype(np.int64), pa.int64()),
                "seq": pa.array(np.asarray(b["seq"], dtype=np.int64), pa.int64()),
                "doc_id": b["doc_id"],
            }
        )

    def _assemble(g: pa.Table) -> pa.Table:
        # deterministic feature order: (doc_id, seq)
        import pyarrow.compute as pc

        order = pc.sort_indices(
            g, sort_keys=[("doc_id", "ascending"), ("seq", "ascending")]
        )
        g = g.take(order)
        ids = np.arange(len(g), dtype=np.int64)
        layer = encode_point_layer(
            layer_name,
            ids,
            np.asarray(g["px"], dtype=np.int64),
            np.asarray(g["py"], dtype=np.int64),
            props={"doc_id": np.asarray(g["doc_id"].to_pylist(), dtype=object),
                   "seq": np.asarray(g["seq"], dtype=np.int64)},
        )
        return pa.table(
            {
                "z": pa.array([zoom], pa.int64()),
                "x": g["x"][:1],
                "y": g["y"][:1],
                "n_features": pa.array([len(g)], pa.int64()),
                "tile": pa.array([encode_tile([layer])], pa.binary()),
            }
        )

    return (
        matched_ds.map_batches(_bin, batch_format="pyarrow")
        .groupby(["x", "y"])
        .map_groups(_assemble, batch_format="pyarrow")
    )
