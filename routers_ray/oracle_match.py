"""Driver-side expected values for the flagship ``match`` / ``match_tiles``
queries — the independent side of the driver's DuckDB oracle check.

The reference pins its matcher with golden node-id sequences asserted in
benches (``routers_fixtures/src/lib.rs:32-227``, ``benches/map_match.rs:60-70``)
and a Viterbi-vs-brute-force solver A/B (``solver/brute.rs:21-95``). This
module is our driver-visible analogue: it recomputes the expected matched
rows for the deterministic synth world WITHOUT the Ray pipeline, writes
them to Parquet, and the registered oracle SQL simply selects them — so the
driver's rows+schema+hash compare becomes a real independent check of the
distributed pipeline.

Independence boundary (stated, not hidden):

* **independent** — span parsing (Python ``re`` over row objects, not the
  Arrow kernel), trellis solving (pure-Python Viterbi loops with the
  reference tie-breaks, not the vectorized solver), result assembly
  (scalar, not the pipeline's Arrow writer), slippy/Morton cell packing,
  FNV-1a / splitmix64 / Hilbert (plain-int reimplementations), rounding.
* **shared** — candidate generation + the weigh kernel (both carry their
  own brute-force oracles in tests/test_kernels.py and
  tests/test_trellis_oracle.py; duplicating float kernels would make the
  comparison flaky at the last bit without adding verification power).

What the driver check therefore proves end-to-end: pipeline plumbing
(parse → anchor/salt → route → actor pool → Arrow assembly), the
vectorized Viterbi, seq numbering, snap/cell emission, and the whole tile
materialization path (partial agg → merge → hilbert → sort).
"""

from __future__ import annotations

import math
import os
import re
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

_POINT_RE = re.compile(r"-?\d+(\.\d+)? -?\d+(\.\d+)? \d+")

_U64 = (1 << 64) - 1


# ---------------------------------------------------------------------------
# independent scalar kernels (plain Python ints / math module)


def _fnv1a64(s: str) -> int:
    h = 0xCBF29CE484222325
    for b in s.encode("utf-8"):
        h ^= b
        h = (h * 0x100000001B3) & _U64
    return h


def _splitmix64(x: int) -> int:
    x &= _U64
    x ^= x >> 30
    x = (x * 0xBF58476D1CE4E5B9) & _U64
    x ^= x >> 27
    x = (x * 0x94D049BB133111EB) & _U64
    x ^= x >> 31
    return x


def _tile_xy(lon: float, lat: float, z: int) -> tuple[int, int]:
    lat = min(max(lat, -85.05112878), 85.05112878)
    n = 1 << z
    x = math.floor((lon + 180.0) / 360.0 * n)
    lat_r = math.radians(lat)
    y = math.floor((1.0 - math.log(math.tan(lat_r) + 1.0 / math.cos(lat_r)) / math.pi) / 2.0 * n)
    return int(min(max(x, 0), n - 1)), int(min(max(y, 0), n - 1))


def _morton(x: int, y: int) -> int:
    def part(v: int) -> int:
        r = 0
        for i in range(32):
            r |= ((v >> i) & 1) << (2 * i)
        return r

    return part(x) | (part(y) << 1)


def _cell_id(lon: float, lat: float, z: int) -> int:
    x, y = _tile_xy(lon, lat, z)
    return _morton(x, y) | (1 << (2 * z))


def _hilbert_xy2d(x: int, y: int, z: int) -> int:
    d = 0
    s = 1 << max(z - 1, 0)
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s //= 2
    return d


def _r6(x: float) -> float:
    return math.floor(x * 1e6 + 0.5) / 1e6


def _viterbi_scalar(node_weights, boundaries, inf):
    """Pure-Python forward DP + backtrack; reference tie-breaks (min cost,
    lowest node — ``viterbi.rs:105-162``). Independent of the vectorized
    solver in :mod:`routers_ray.trellis`."""
    L = len(node_weights)
    dist = [[int(w) for w in node_weights[0]]]
    for b in range(L - 1):
        mat = boundaries[b]
        cur = dist[-1]
        nxt = []
        for j in range(len(node_weights[b + 1])):
            best = inf
            for i in range(len(cur)):
                if cur[i] >= inf:
                    continue
                c = cur[i] + int(mat[i][j])
                if c < best:
                    best = c
            if best < inf:
                best += int(node_weights[b + 1][j])
            nxt.append(best)
        dist.append(nxt)
    last = dist[-1]
    best_cost, final = inf, -1
    for j, c in enumerate(last):
        if c < best_cost:  # strict < keeps the LOWEST node on ties
            best_cost, final = c, j
    if final < 0 or best_cost >= inf:
        return None
    nodes = [0] * L
    nodes[-1] = final
    chosen = final
    for b in range(L - 2, -1, -1):
        mat = boundaries[b]
        cur = dist[b]
        bc, bi = None, -1
        for i in range(len(cur)):
            c = cur[i] + int(mat[i][chosen])
            if bc is None or c < bc:
                bc, bi = c, i
        chosen = bi
        nodes[b] = chosen
    return nodes, int(best_cost)


# ---------------------------------------------------------------------------
# expected match rows


def _parse_doc_points(spans) -> tuple[list[float], list[float]]:
    """Span list (python objects) → point lists; independent re-based parse
    mirroring the '<lon> <lat> <ts>' text-span contract."""
    lons, lats = [], []
    for s in spans:
        if s["kind"] == "text" and s["text"] is not None and _POINT_RE.fullmatch(s["text"]):
            a, b, _ = s["text"].split(" ")
            lons.append(float(a))
            lats.append(float(b))
    return lons, lats


def expected_match_table(
    world: dict, out_zoom: int = 15, max_candidates: int | None = None
) -> tuple[pa.Table, pa.Table]:
    """(rounded q_match-shaped table, unrounded snap table for tiles).

    Matches the q_match contract: ok rows only, columns (doc_id, seq,
    edge_id, dir, src, dst, snap_lon, snap_lat, cost, cell) with r6 snaps
    and int64 casts.

    ``max_candidates`` applies the adaptive candidate cap with an
    INDEPENDENT scalar selection (pure-Python sort by (dist, index) per
    layer) — it does not reuse ``matcher._cap_candidates``.
    """
    from .matcher import MatchOptions, _TrajectoryContext, generate_layers
    from .network import NetworkStore
    from .trellis import INF_W

    store = NetworkStore(world["store"])
    docs = pq.read_table(world["paths"]["parquet"]).to_pylist()
    opts = MatchOptions()
    buffer_m = opts.threshold_cm / 100.0 + opts.search_distance_m

    o_doc, o_seq, o_eid, o_dir, o_src, o_dst = [], [], [], [], [], []
    o_slon, o_slat, o_cost, o_cell = [], [], [], []
    u_lon, u_lat = [], []
    for doc in docs:
        lons, lats = _parse_doc_points(doc["spans"])
        if not lons:
            continue  # unanchored → no ok rows
        net = store.network_for_bbox(
            min(lons), min(lats), max(lons), max(lats),
            buffer_m=buffer_m, search_radius_m=opts.search_distance_m,
        )
        layers = generate_layers(net, np.asarray(lons), np.asarray(lats), opts)
        if max_candidates is not None:
            from .matcher import Layer

            capped = []
            for ly in layers:
                if ly.edge_rows.size <= max_candidates:
                    capped.append(ly)
                    continue
                nearest = sorted(
                    range(ly.edge_rows.size),
                    key=lambda i: (float(ly.dist_m[i]), i),
                )[:max_candidates]
                keep = sorted(nearest)  # original (edge_id, dir) order
                capped.append(
                    Layer(
                        edge_rows=ly.edge_rows[keep],
                        frac=ly.frac[keep],
                        pos_lon=ly.pos_lon[keep],
                        pos_lat=ly.pos_lat[keep],
                        dist_m=ly.dist_m[keep],
                        emission=ly.emission[keep],
                    )
                )
            layers = capped
        if any(ly.edge_rows.size == 0 for ly in layers):
            continue  # batch-mode unanchored reject → error row only
        ctx = _TrajectoryContext(net, layers, opts)
        trellis = ctx.weigh_all()
        if trellis.pending_boundaries():
            continue  # disconnected
        solved = _viterbi_scalar(
            trellis.node_weights, [b for b in trellis.boundaries], INF_W
        )
        if solved is None:
            continue  # unreachable
        nodes, cost = solved
        for k, c in enumerate(nodes):
            row = int(layers[k].edge_rows[c])
            slon = float(layers[k].pos_lon[c])
            slat = float(layers[k].pos_lat[c])
            o_doc.append(doc["doc_id"])
            o_seq.append(k)
            o_eid.append(int(net.edge_id[row]))
            o_dir.append(int(net.dir[row]))
            o_src.append(int(net.src[row]))
            o_dst.append(int(net.dst[row]))
            o_slon.append(_r6(slon))
            o_slat.append(_r6(slat))
            o_cost.append(cost)
            o_cell.append(_cell_id(slon, slat, out_zoom))
            u_lon.append(slon)
            u_lat.append(slat)

    rounded = pa.table(
        {
            "doc_id": pa.array(o_doc, pa.string()),
            "seq": pa.array(o_seq, pa.int64()),
            "edge_id": pa.array(o_eid, pa.int64()),
            "dir": pa.array(o_dir, pa.int64()),
            "src": pa.array(o_src, pa.int64()),
            "dst": pa.array(o_dst, pa.int64()),
            "snap_lon": pa.array(o_slon, pa.float64()),
            "snap_lat": pa.array(o_slat, pa.float64()),
            "cost": pa.array(o_cost, pa.int64()),
            "cell": pa.array(np.asarray(o_cell, dtype=np.uint64).view(np.int64), pa.int64()),
        }
    )
    unrounded = pa.table(
        {
            "doc_id": pa.array(o_doc, pa.string()),
            "seq": pa.array(o_seq, pa.int64()),
            "snap_lon": pa.array(u_lon, pa.float64()),
            "snap_lat": pa.array(u_lat, pa.float64()),
        }
    )
    return rounded, unrounded


def expected_tiles_table(unrounded: pa.Table, zooms: list[int]) -> pa.Table:
    """q_match_tiles-shaped expected table from the unrounded snap rows —
    fully independent scalar slippy/digest/hilbert math."""
    agg: dict[tuple[int, int, int], list[int]] = {}
    doc_ids = unrounded["doc_id"].to_pylist()
    seqs = unrounded["seq"].to_pylist()
    lons = unrounded["snap_lon"].to_pylist()
    lats = unrounded["snap_lat"].to_pylist()
    for d, s, lon, lat in zip(doc_ids, seqs, lons, lats):
        digest = _splitmix64(_fnv1a64(d) ^ (int(s) & _U64))
        for z in zooms:
            x, y = _tile_xy(lon, lat, z)
            k = (z, x, y)
            if k in agg:
                agg[k][0] += 1
                agg[k][1] = (agg[k][1] + digest) & _U64
            else:
                agg[k] = [1, digest]
    rows = []
    for (z, x, y), (n, dsum) in agg.items():
        rows.append((z, x, y, n, dsum, _hilbert_xy2d(x, y, z)))
    rows.sort(key=lambda r: (r[0], r[5]))
    return pa.table(
        {
            "z": pa.array([r[0] for r in rows], pa.int64()),
            "x": pa.array([r[1] for r in rows], pa.int64()),
            "y": pa.array([r[2] for r in rows], pa.int64()),
            "n_points": pa.array([r[3] for r in rows], pa.int64()),
            "doc_ids_hash": pa.array(
                np.asarray([r[4] for r in rows], dtype=np.uint64).view(np.int64), pa.int64()
            ),
            "hilbert": pa.array([r[5] for r in rows], pa.int64()),
        }
    )


_EXPECTED_PATHS: dict[tuple[int, int | None], dict[str, str]] = {}


def expected_parquet_paths(
    world: dict, n_docs: int, zooms=(10, 13), max_candidates: int | None = None
) -> dict[str, str]:
    """Compute + write the expected match/tiles parquet once per process;
    returns {'match': path, 'match_tiles': path} for the oracle SQL."""
    hit = _EXPECTED_PATHS.get((n_docs, max_candidates))
    if hit is not None:
        return hit
    rounded, unrounded = expected_match_table(world, max_candidates=max_candidates)
    tiles = expected_tiles_table(unrounded, list(zooms))
    out = tempfile.mkdtemp(prefix="routers_ray_oracle_")
    paths = {
        "match": os.path.join(out, "match_expected.parquet"),
        "match_tiles": os.path.join(out, "match_tiles_expected.parquet"),
    }
    pq.write_table(rounded, paths["match"])
    pq.write_table(tiles, paths["match_tiles"])
    _EXPECTED_PATHS[(n_docs, max_candidates)] = paths
    return paths


# ---------------------------------------------------------------------------
# planted near-dup world: the minhash oracle
#
# The driver's documents table is sf-dependent, but oracle SQL strings are
# resolved without an sf context — so the oracled MinHash query runs over a
# DETERMINISTIC planted corpus (like the match world), and this module
# recomputes the expected verified pairs with an independent scalar
# implementation (pure-Python md5/splitmix64/min — no numpy, no Arrow).

_PLANTED: dict[str, object] = {}


def planted_dup_corpus(n_docs: int = 240, seed: int = 7):
    """Deterministic corpus with planted exact + near duplicates.

    ~1/6 of docs are near-copies of an earlier doc (one token changed),
    ~1/12 exact copies; the rest independent. Cached per process."""
    import pyarrow as pa

    if "corpus" in _PLANTED:
        return _PLANTED["corpus"]
    rng = np.random.default_rng(seed)
    vocab = [f"w{i:03d}" for i in range(400)]
    texts: list[str] = []
    for i in range(n_docs):
        if i >= 10 and i % 12 == 0:
            texts.append(texts[i - 10])  # exact dup
        elif i >= 7 and i % 6 == 0:
            words = texts[i - 7].split()
            j = int(rng.integers(0, len(words)))
            words[j] = vocab[int(rng.integers(0, len(vocab)))]
            texts.append(" ".join(words))  # near dup
        else:
            k = int(rng.integers(30, 60))
            texts.append(" ".join(vocab[int(x)] for x in rng.integers(0, len(vocab), k)))
    tbl = pa.table(
        {"doc_id": pa.array(np.arange(n_docs, dtype=np.int64), pa.int64()),
         "text": pa.array(texts, pa.string())}
    )
    _PLANTED["corpus"] = tbl
    return tbl


def _scalar_minhash_pairs(
    tbl, threshold: float = 0.8, n_perm: int = 64, bands: int = 16, shingle_k: int = 3
):
    """Independent scalar MinHash-LSH + Jaccard verify (pure-Python ints +
    hashlib; mirrors the published algorithm, not the repo's numpy path)."""
    import hashlib

    GOLD = 0x9E3779B97F4A7C15
    docs = list(zip(tbl["doc_id"].to_pylist(), tbl["text"].to_pylist()))
    r = n_perm // bands
    sigs = {}
    shingle_sets = {}
    for did, text in docs:
        toks = (text or "").split()
        if len(toks) < shingle_k:
            sh = [" ".join(toks)] if toks else []
        else:
            sh = [" ".join(toks[i : i + shingle_k]) for i in range(len(toks) - shingle_k + 1)]
        shingle_sets[did] = set(sh)
        ids = [
            int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:8], "little") for s in sh
        ]
        sig = []
        for p in range(1, n_perm + 1):
            seed_mul = (p * GOLD) & _U64
            if ids:
                sig.append(min(_splitmix64(h ^ seed_mul) for h in ids))
            else:
                sig.append(_U64)
        sigs[did] = sig

    buckets: dict[tuple[int, bytes], list[int]] = {}
    for did, sig in sigs.items():
        for b in range(bands):
            block = b"".join(v.to_bytes(8, "little") for v in sig[b * r : (b + 1) * r])
            key = (b, hashlib.md5(block).digest()[:8])
            buckets.setdefault(key, []).append(did)

    pairs = set()
    for ids in buckets.values():
        ids = sorted(set(ids))
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                pairs.add((ids[i], ids[j]))

    out = []
    for a, b in sorted(pairs):
        sa, sb = shingle_sets[a], shingle_sets[b]
        if not sa and not sb:
            jac = 1.0
        elif not sa or not sb:
            jac = 0.0
        else:
            jac = len(sa & sb) / len(sa | sb)
        if jac >= threshold:
            out.append((a, b, jac))
    return out


def planted_minhash_expected_path() -> str:
    """Expected verified pairs of the planted corpus, written once."""
    hit = _PLANTED.get("expected_path")
    if hit is not None:
        return hit
    tbl = planted_dup_corpus()
    rows = _scalar_minhash_pairs(tbl)
    out_dir = tempfile.mkdtemp(prefix="routers_ray_oracle_minhash_")
    path = os.path.join(out_dir, "minhash_expected.parquet")
    pq.write_table(
        pa.table(
            {
                "doc_a": pa.array([r[0] for r in rows], pa.int64()),
                "doc_b": pa.array([r[1] for r in rows], pa.int64()),
                "jaccard": pa.array([r[2] for r in rows], pa.float64()),
            }
        ),
        path,
    )
    _PLANTED["expected_path"] = path
    return path


# ---------------------------------------------------------------------------
# planted edge-metadata world: the transport-access oracle
#
# Deterministic edge table with access-tag combos, road classes and raw
# maxspeed strings. The Ray query resolves per-mode access via the
# precomputed-column path (metadata.access_columns); the oracle SQL
# re-derives it INDEPENDENTLY inside DuckDB: hierarchy-chain join +
# max-specificity window + value CASE + regex speed parse. Tag templates
# keep per-(edge, mode) applicable specificities DISTINCT so both engines'
# argmax is unambiguous.

def planted_metadata_world(n_edges: int = 480, seed: int = 11) -> str:
    """Write (and cache) the planted metadata edge parquet; returns path."""
    hit = _PLANTED.get("meta_path")
    if hit is not None:
        return hit
    from .metadata import DIR_BOTH, DIR_FORWARD

    templates = [
        [],
        [("all", DIR_BOTH, "private")],
        [("motor_vehicle", DIR_BOTH, "no"), ("bus", DIR_BOTH, "yes")],
        [("vehicle", DIR_FORWARD, "no")],
        [("foot", DIR_BOTH, "no")],
        [("hgv", DIR_BOTH, "no")],
        [("bicycle", DIR_BOTH, "yes"), ("vehicle", DIR_BOTH, "no")],
        [("psv", DIR_BOTH, "yes"), ("motor_vehicle", DIR_BOTH, "no")],
    ]
    classes = ["motorway", "primary", "residential", "service", "track", None]
    speeds = ["50", "30 mph", "none", None, "60 @ (Mo-Fr 06:00-19:00)", "walk", "80", "5 knots"]
    rng = np.random.default_rng(seed)
    rows = {
        "edge_id": [], "dir": [], "road_class": [], "lane_count": [],
        "maxspeed": [], "access_tags": [],
    }
    for e in range(n_edges):
        t = templates[int(rng.integers(0, len(templates)))]
        rows["edge_id"].append(e)
        rows["dir"].append(int(rng.integers(0, 2)))
        rows["road_class"].append(classes[int(rng.integers(0, len(classes)))])
        rows["lane_count"].append(int(rng.integers(1, 5)))
        rows["maxspeed"].append(speeds[int(rng.integers(0, len(speeds)))])
        rows["access_tags"].append(
            [{"mode": m, "dir": d, "value": v} for m, d, v in t]
        )
    from .metadata import ACCESS_TAG_TYPE

    tbl = pa.table(
        {
            "edge_id": pa.array(rows["edge_id"], pa.int64()),
            "dir": pa.array(rows["dir"], pa.uint8()),
            "road_class": pa.array(rows["road_class"], pa.string()),
            "lane_count": pa.array(rows["lane_count"], pa.int32()),
            "maxspeed": pa.array(rows["maxspeed"], pa.string()),
            "access_tags": pa.array(rows["access_tags"], ACCESS_TAG_TYPE),
        }
    )
    out_dir = tempfile.mkdtemp(prefix="routers_ray_oracle_meta_")
    path = os.path.join(out_dir, "planted_edges.parquet")
    pq.write_table(tbl, path)
    _PLANTED["meta_path"] = path
    return path


def hilbert_lookup_path(z: int) -> str:
    """(x, y, hilbert) lookup parquet at order ``z`` computed by the
    independent scalar Hilbert implementation — lets DuckDB oracles join a
    hilbert column they cannot express natively. Cached per process."""
    key = f"hilbert_{z}"
    hit = _PLANTED.get(key)
    if hit is not None:
        return hit
    n = 1 << z
    xs, ys, hs = [], [], []
    for x in range(n):
        for y in range(n):
            xs.append(x)
            ys.append(y)
            hs.append(_hilbert_xy2d(x, y, z))
    out_dir = tempfile.mkdtemp(prefix="routers_ray_oracle_hilbert_")
    path = os.path.join(out_dir, f"hilbert_z{z}.parquet")
    pq.write_table(
        pa.table(
            {
                "x": pa.array(xs, pa.int64()),
                "y": pa.array(ys, pa.int64()),
                "hilbert": pa.array(hs, pa.int64()),
            }
        ),
        path,
    )
    _PLANTED[key] = path
    return path


# ---------------------------------------------------------------------------
# planted embedding world: the ANN-LSH + embedding-near-dup oracles
# ---------------------------------------------------------------------------


def planted_embedding_corpus(
    n_clusters: int = 20, cluster_size: int = 12, n_noise: int = 60,
    dim: int = 32, seed: int = 13,
):
    """Deterministic embedding table with SEPARABLE planted clusters.

    Each cluster is a unit direction plus tiny (0.02) member jitter —
    intra-cluster cosine ≈ 0.999, inter-cluster cosine ≲ 0.6 (random
    directions in R^32) — so (a) every query's exact top-k is its own
    cluster and multi-table sign-LSH provably co-buckets it (the planted
    world where LSH recall is 1.0 by construction), and (b) near-dup
    pairs at the 0.95 threshold are exactly the intra-cluster pairs.
    ``n_noise`` isolated vectors exercise the no-pair path. Cached per
    process."""
    key = f"emb_{n_clusters}_{cluster_size}_{n_noise}_{dim}_{seed}"
    hit = _PLANTED.get(key)
    if hit is not None:
        return hit
    rng = np.random.default_rng(seed)
    vecs = []
    for _ in range(n_clusters):
        c = rng.normal(size=dim)
        c /= np.linalg.norm(c)
        for _ in range(cluster_size):
            v = c + 0.02 * rng.normal(size=dim)
            vecs.append(v / np.linalg.norm(v))
    for _ in range(n_noise):
        v = rng.normal(size=dim)
        vecs.append(v / np.linalg.norm(v))
    mat = np.asarray(vecs, dtype=np.float64)
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(mat.shape[0], dtype=np.int64), pa.int64()),
            "embedding": pa.array(list(mat), pa.list_(pa.float64())),
        }
    )
    _PLANTED[key] = (tbl, mat)
    return tbl, mat


def _scalar_cosine_topk(mat: np.ndarray, query_ids: list[int], k: int = 10):
    """Independent exact top-k: plain loops + the (sim_r desc, id asc)
    tie-break, 1e-6 half-up rounding — no shared code with sim.py."""
    rows = []
    norms = [math.sqrt(sum(x * x for x in v)) for v in mat.tolist()]
    for qid in query_ids:
        q = mat[qid].tolist()
        sims = []
        for vid in range(mat.shape[0]):
            if vid == qid:
                continue
            dot = sum(a * b for a, b in zip(q, mat[vid].tolist()))
            s = dot / max(norms[qid] * norms[vid], 1e-300)
            sims.append((math.floor(s * 1e6 + 0.5) / 1e6, vid))
        sims.sort(key=lambda t: (-t[0], t[1]))
        for s, vid in sims[:k]:
            rows.append((qid, vid, s))
    return rows


def planted_ann_expected_path(k: int = 10, n_queries: int = 5) -> str:
    """Exact top-k of the planted embedding world for the first
    ``n_queries`` vec_ids, written once."""
    key = f"ann_expected_{k}_{n_queries}"
    hit = _PLANTED.get(key)
    if hit is not None:
        return hit
    _, mat = planted_embedding_corpus()
    rows = _scalar_cosine_topk(mat, list(range(n_queries)), k)
    out_dir = tempfile.mkdtemp(prefix="routers_ray_oracle_ann_")
    path = os.path.join(out_dir, "ann_expected.parquet")
    pq.write_table(
        pa.table(
            {
                "query_id": pa.array([r[0] for r in rows], pa.int64()),
                "vec_id": pa.array([r[1] for r in rows], pa.int64()),
                "sim": pa.array([r[2] for r in rows], pa.float64()),
            }
        ),
        path,
    )
    _PLANTED[key] = path
    return path


def planted_embed_dups_expected_path(threshold: float = 0.95) -> str:
    """All (a < b) pairs of the planted world with rounded cosine >=
    threshold — scalar all-pairs recomputation, written once."""
    key = f"embdup_expected_{threshold}"
    hit = _PLANTED.get(key)
    if hit is not None:
        return hit
    _, mat = planted_embedding_corpus()
    n = mat.shape[0]
    norms = [math.sqrt(sum(x * x for x in v)) for v in mat.tolist()]
    rows = []
    for a in range(n):
        va = mat[a].tolist()
        for b in range(a + 1, n):
            dot = sum(x * y for x, y in zip(va, mat[b].tolist()))
            s = dot / max(norms[a] * norms[b], 1e-300)
            s = math.floor(s * 1e6 + 0.5) / 1e6
            if s >= threshold:
                rows.append((a, b, s))
    out_dir = tempfile.mkdtemp(prefix="routers_ray_oracle_embdup_")
    path = os.path.join(out_dir, "embed_dups_expected.parquet")
    pq.write_table(
        pa.table(
            {
                "id_a": pa.array([r[0] for r in rows], pa.int64()),
                "id_b": pa.array([r[1] for r in rows], pa.int64()),
                "sim": pa.array([r[2] for r in rows], pa.float64()),
            }
        ),
        path,
    )
    _PLANTED[key] = path
    return path


# ---------------------------------------------------------------------------
# planted conditional-access world: the opening-hours/condition oracle
# ---------------------------------------------------------------------------

ACCESS_PROBES_US = [
    # (label chosen to span months / weekdays / hours, µs epoch UTC)
    1704708000000000,   # 2024-01-08 Mon 10:00 — Jan, weekday, daytime
    1704747600000000,   # 2024-01-08 Mon 21:00 — Jan, weekday, evening
    1705154400000000,   # 2024-01-13 Sat 14:00 — Jan, weekend
    1707904800000000,   # 2024-02-14 Wed 10:00 — Feb
    1719482400000000,   # 2024-06-27 Thu 10:00 — Jun
    1721008800000000,   # 2024-07-15 Mon 02:00 — Jul, night
    1732615200000000,   # 2024-11-26 Tue 10:00 — Nov
    1735292400000000,   # 2024-12-27 Fri 09:30 — Dec
]

_ACCESS_CONDITIONS = [
    None,
    "yes",
    "no",
    "no @ (Mo-Fr 07:00-19:00)",
    "yes @ (Sa,Su)",
    "no @ (22:00-06:00)",
    "no @ (Jan-Mar)",
    "no @ (Nov-Feb Mo-Fr 07:00-19:00)",
    "no @ (Jul)",
    "no @ (Sa; Su 10:00-14:00)",
    "no @ (Mo-Fr 07:00-09:00,16:00-19:00)",
    "designated @ sunrise-sunset",  # unparseable → default allow
]


def planted_access_world(n_edges: int = 600, seed: int = 29) -> str:
    """Edge table with conditional-access expressions drawn from the
    supported grammar (months, chaining, wrapping nights, comma lists,
    unparseable fallbacks). Cached per process; returns parquet path."""
    hit = _PLANTED.get("access_path")
    if hit is not None:
        return hit
    rng = np.random.default_rng(seed)
    conds = [
        _ACCESS_CONDITIONS[int(rng.integers(0, len(_ACCESS_CONDITIONS)))]
        for _ in range(n_edges)
    ]
    tbl = pa.table(
        {
            "edge_id": pa.array(np.arange(n_edges, dtype=np.int64), pa.int64()),
            "condition": pa.array(conds, pa.string()),
        }
    )
    out_dir = tempfile.mkdtemp(prefix="routers_ray_oracle_access_")
    path = os.path.join(out_dir, "planted_access.parquet")
    pq.write_table(tbl, path)
    _PLANTED["access_path"] = path
    return path


def _scalar_access_open(cond, ts_us: int) -> bool:
    """Independent per-timestamp evaluation via the datetime module —
    reimplements the conditional grammar without touching access.py."""
    import datetime as dt

    if cond is None or cond.strip() in ("", "yes"):
        return True
    cond = cond.strip()
    if cond == "no":
        return False
    m = re.match(r"^(yes|no)\s*@\s*\((.*)\)$", cond)
    if not m:
        return True  # default allow
    value = m.group(1) == "yes"
    d = dt.datetime.fromtimestamp(ts_us / 1e6, tz=dt.timezone.utc)
    day_names = ["Mo", "Tu", "We", "Th", "Fr", "Sa", "Su"]
    mon_names = ["Jan", "Feb", "Mar", "Apr", "May", "Jun",
                 "Jul", "Aug", "Sep", "Oct", "Nov", "Dec"]

    def expand(names, tok):
        out = set()
        for part in tok.split(","):
            if "-" in part:
                a, b = part.split("-", 1)
                if a not in names or b not in names:
                    raise ValueError(tok)
                i = names.index(a)
                while True:
                    out.add(i)
                    if i == names.index(b):
                        break
                    i = (i + 1) % len(names)
            elif part:
                if part not in names:
                    raise ValueError(tok)
                out.add(names.index(part))
        return out

    matched = False
    try:
        for group in m.group(2).split(";"):
            days, months, windows = None, None, None
            for tok in group.split():
                if tok[0].isdigit():
                    windows = windows or []
                    for rp in tok.split(","):
                        a, b = rp.split("-", 1)

                        def mins(t):
                            bits = t.split(":")
                            return int(bits[0]) * 60 + (int(bits[1]) if len(bits) > 1 else 0)

                        windows.append((mins(a), mins(b)))
                elif tok.split(",")[0].split("-")[0] in mon_names:
                    months = (months or set()) | expand(mon_names, tok)
                else:
                    days = (days or set()) | expand(day_names, tok)
            minute = d.hour * 60 + d.minute
            ok = (days is None or d.weekday() in days) and (
                months is None or (d.month - 1) in months
            )
            if ok and windows is not None:
                t_ok = False
                for s, e in windows:
                    t_ok |= (s <= minute < e) if e >= s else (minute >= s or minute < e)
                ok = t_ok
            matched |= ok
    except ValueError:
        return True  # unparseable → default allow
    return value if matched else not value


def planted_access_expected_path() -> str:
    """Per-probe open-edge counts of the planted access world, via the
    scalar datetime recomputation. Written once."""
    hit = _PLANTED.get("access_expected")
    if hit is not None:
        return hit
    import pyarrow.parquet as papq

    tbl = papq.read_table(planted_access_world())
    conds = tbl["condition"].to_pylist()
    rows = []
    for ts_us in ACCESS_PROBES_US:
        n_open = sum(1 for c in conds if _scalar_access_open(c, ts_us))
        rows.append((ts_us, n_open))
    out_dir = tempfile.mkdtemp(prefix="routers_ray_oracle_accessx_")
    path = os.path.join(out_dir, "access_expected.parquet")
    pq.write_table(
        pa.table(
            {
                "ts_us": pa.array([r[0] for r in rows], pa.int64()),
                "n_open": pa.array([r[1] for r in rows], pa.int64()),
            }
        ),
        path,
    )
    _PLANTED["access_expected"] = path
    return path


# ---------------------------------------------------------------------------
# planted holiday/stacked-conditional world: PH/SH tokens + multi-clause
# conditional values ("no @ (Mo-Fr 07:00-19:00); yes @ (PH)") — the OSM
# conditional-restrictions stacking the reference's single-clause grammar
# (condition.rs:321-390) leaves on the table. The scalar twin below
# re-derives every probe with datetime + date-string sets, independent of
# access.py's bitmask/vectorized path.
# ---------------------------------------------------------------------------

PUBLIC_HOLIDAYS_2024 = [
    "2024-01-01", "2024-03-29", "2024-05-01", "2024-12-25", "2024-12-26",
]

# Jul 1 - Aug 31 summer break (inclusive)
SCHOOL_HOLIDAYS_2024 = [
    str(d) for d in np.arange(
        np.datetime64("2024-07-01"), np.datetime64("2024-09-01")
    )
]

HOLIDAY_PROBES_US = [
    1735120800000000,  # 2024-12-25 Wed 10:00 - PH, weekday, daytime
    1735167600000000,  # 2024-12-25 Wed 23:00 - PH, night
    1704103200000000,  # 2024-01-01 Mon 10:00 - PH on a Monday
    1704708000000000,  # 2024-01-08 Mon 10:00 - plain weekday
    1721037600000000,  # 2024-07-15 Mon 10:00 - SH weekday
    1723298400000000,  # 2024-08-10 Sat 14:00 - SH weekend
    1711699200000000,  # 2024-03-29 Fri 08:00 - PH on a Friday morning
    1714788000000000,  # 2024-05-04 Sat 02:00 - weekend night
    1735232400000000,  # 2024-12-26 Thu 17:00 - PH, rush hour
]

_HOLIDAY_CONDITIONS = [
    None,
    "yes",
    "no",
    "no @ (PH)",
    "yes @ (SH)",
    "no @ (Mo-Fr,PH 08:00-18:00)",
    "no @ (SH Mo-Fr)",
    "no @ (Dec PH)",
    "no @ (Mo-Fr 07:00-19:00); yes @ (PH)",
    "no @ (22:00-06:00); no @ (PH)",
    "yes @ (Sa,Su); yes @ (PH)",
    "no @ (Mo-Fr 07:00-09:00,16:00-19:00); yes @ (SH Sa,Su)",
    "no @ (PH 10:00)",  # bare time point = one-hour window, on holidays
    "designated @ sunrise-sunset",  # unparseable clause -> asserts nothing
]


def planted_holiday_world(n_edges: int = 500, seed: int = 31) -> str:
    """Edge table with stacked/holiday conditional-access expressions.
    Cached per process; returns parquet path."""
    hit = _PLANTED.get("holiday_path")
    if hit is not None:
        return hit
    rng = np.random.default_rng(seed)
    conds = [
        _HOLIDAY_CONDITIONS[int(rng.integers(0, len(_HOLIDAY_CONDITIONS)))]
        for _ in range(n_edges)
    ]
    tbl = pa.table(
        {
            "edge_id": pa.array(np.arange(n_edges, dtype=np.int64), pa.int64()),
            "condition": pa.array(conds, pa.string()),
        }
    )
    out_dir = tempfile.mkdtemp(prefix="routers_ray_oracle_holiday_")
    path = os.path.join(out_dir, "planted_holiday.parquet")
    pq.write_table(tbl, path)
    _PLANTED["holiday_path"] = path
    return path


def _scalar_group_match(group: str, d, date_str: str,
                        ph_dates: set, sh_dates: set) -> bool:
    """One parenthesized group at one instant — datetime/set based."""
    day_names = ["Mo", "Tu", "We", "Th", "Fr", "Sa", "Su"]
    mon_names = ["Jan", "Feb", "Mar", "Apr", "May", "Jun",
                 "Jul", "Aug", "Sep", "Oct", "Nov", "Dec"]

    def expand(names, toks):
        out = set()
        for part in toks:
            if "-" in part:
                a, b = part.split("-", 1)
                if a not in names or b not in names:
                    raise ValueError(part)
                i = names.index(a)
                while True:
                    out.add(i)
                    if i == names.index(b):
                        break
                    i = (i + 1) % len(names)
            elif part:
                if part not in names:
                    raise ValueError(part)
                out.add(names.index(part))
        return out

    days, months, windows = None, None, None
    ph = sh = False
    for tok in group.split():
        if tok[0].isdigit():
            windows = windows or []
            for rp in tok.split(","):

                def mins(t):
                    bits = t.split(":")
                    return int(bits[0]) * 60 + (int(bits[1]) if len(bits) > 1 else 0)

                if "-" in rp:
                    a, b = rp.split("-", 1)
                    windows.append((mins(a), mins(b)))
                else:
                    # bare time point = one-hour window, matching the
                    # engine's _parse_times (opening_hours.rs:276-283)
                    m0 = mins(rp)
                    windows.append((m0, (m0 + 60) % 1440))
        elif tok.split(",")[0].split("-")[0] in mon_names:
            months = (months or set()) | expand(mon_names, tok.split(","))
        else:
            parts = [p for p in tok.split(",") if p]
            ph |= "PH" in parts
            sh |= "SH" in parts
            rest = [p for p in parts if p not in ("PH", "SH")]
            if rest:
                days = (days or set()) | expand(day_names, rest)
            elif days is None:
                days = set()  # holiday-token-only day predicate
    if days is None and not ph and not sh:
        day_ok = True
    else:
        day_ok = d.weekday() in (days or set())
        if ph and date_str in ph_dates:
            day_ok = True
        if sh and date_str in sh_dates:
            day_ok = True
    ok = day_ok and (months is None or (d.month - 1) in months)
    if ok and windows is not None:
        minute = d.hour * 60 + d.minute
        t_ok = False
        for s, e in windows:
            t_ok |= (s <= minute < e) if e >= s else (minute >= s or minute < e)
        ok = t_ok
    return ok


def _scalar_stacked_open(cond, ts_us: int) -> bool:
    """Independent stacked-clause evaluation: paren-aware top-level ';'
    split, per-clause group match, last matching clause wins over a base
    inferred as the first clause's complement (or a bare yes/no)."""
    import datetime as dt

    if cond is None or not cond.strip():
        return True
    s = cond.strip()
    pieces, depth, start = [], 0, 0
    for i, ch in enumerate(s):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth = max(0, depth - 1)
        elif ch == ";" and depth == 0:
            pieces.append(s[start:i])
            start = i + 1
    pieces.append(s[start:])
    pieces = [p.strip() for p in pieces if p.strip()]

    d = dt.datetime.fromtimestamp(ts_us / 1e6, tz=dt.timezone.utc)
    date_str = d.strftime("%Y-%m-%d")
    ph_dates, sh_dates = set(PUBLIC_HOLIDAYS_2024), set(SCHOOL_HOLIDAYS_2024)

    base = None
    clauses = []
    for p in pieces:
        if p in ("yes", "no"):
            base = p == "yes"
            continue
        m = re.match(r"^(yes|no)\s*@\s*\((.*)\)$", p, re.S)
        if not m:
            continue
        try:
            matched = any(
                _scalar_group_match(g.strip(), d, date_str, ph_dates, sh_dates)
                for g in m.group(2).split(";")
                if g.strip()
            )
        except ValueError:
            continue
        clauses.append((m.group(1) == "yes", matched))
    if base is None:
        base = (not clauses[0][0]) if clauses else True
    out = base
    for v, matched in clauses:
        if matched:
            out = v
    return out


def planted_holiday_expected_path() -> str:
    """Per-probe open-edge counts of the planted holiday world, via the
    scalar datetime recomputation. Written once."""
    hit = _PLANTED.get("holiday_expected")
    if hit is not None:
        return hit
    import pyarrow.parquet as papq

    tbl = papq.read_table(planted_holiday_world())
    conds = tbl["condition"].to_pylist()
    rows = []
    for ts_us in HOLIDAY_PROBES_US:
        n_open = sum(1 for c in conds if _scalar_stacked_open(c, ts_us))
        rows.append((ts_us, n_open))
    out_dir = tempfile.mkdtemp(prefix="routers_ray_oracle_holidayx_")
    path = os.path.join(out_dir, "holiday_expected.parquet")
    pq.write_table(
        pa.table(
            {
                "ts_us": pa.array([r[0] for r in rows], pa.int64()),
                "n_open": pa.array([r[1] for r in rows], pa.int64()),
            }
        ),
        path,
    )
    _PLANTED["holiday_expected"] = path
    return path


# ---------------------------------------------------------------------------
# planted speed-limit world: the maxspeed parser-family oracle
# ---------------------------------------------------------------------------

# tag templates spanning the reference's speed_limit/test.rs surface:
# blanket, units, mode/direction restrictions, per-lane (incl. missing
# slots), conditional (time, road, property, AND/OR combined), sentinels
_SPEED_TAGSETS: list[list[tuple[str, str]]] = [
    [("maxspeed", "50")],
    [("maxspeed", "30 mph")],
    [("maxspeed", "none")],  # fails VALUE_PATTERN → entry dropped
    [("maxspeed", "130 @ (19:00-06:00)")],
    [("maxspeed", "100"), ("maxspeed:conditional", "60 @ (Mo-Fr 07:00-19:00)")],
    [("maxspeed:lanes", "100|80|80")],
    [("maxspeed:lanes", "|50")],
    [("maxspeed:lanes:conditional",
      "100 @ (22:00-06:00)|40 @ (Mo-Fr 07:00-9:00,16:00-20:00)|60")],
    [("maxspeed", "100"), ("maxspeed:hgv", "20 mph")],
    [("maxspeed", "90"), ("maxspeed:bus:backward", "70")],
    [("maxspeed:forward", "80")],
    [("maxspeed", "110"), ("maxspeed:conditional", "80 @ wet")],
    [("maxspeed:hgv:conditional", "60 @ (weight>7.5)")],
    [("maxspeed", "120"), ("maxspeed:conditional", "90 @ (22:00-06:00 AND wet)")],
    [("maxspeed", "120"), ("maxspeed:conditional", "90 @ (22:00-06:00 OR wet)")],
    [("maxspeed", "5 knots")],
    [("maxspeed:conditional", "30 @ (Sa,Su; 22:00-06:00)")],
    [("maxspeed:lanes:forward", "65 mph|65 mph|25 mph")],
]

SPEED_PROBE_MODES = ("motorcar", "hgv", "bus")

_SPEED_TAG_TYPE = pa.list_(
    pa.struct([("key", pa.string()), ("value", pa.string())])
)


def _scalar_simplify_keep(lons: list, lats: list, eps_deg: float) -> list:
    """Recursive scalar Douglas-Peucker — independent of the vectorized
    ``routers_ray.simplify.simplify_mask`` (plain-float arithmetic; the
    cos/radians kernel is shared via numpy scalars, same as the stated
    oracle boundary for float kernels). First-farthest tie-break via
    strict ``>`` mirrors np.argmax's first occurrence."""
    n = len(lons)
    keep = [False] * n
    if n == 0:
        return keep
    keep[0] = keep[-1] = True
    if n <= 2:
        return keep
    eps2 = eps_deg * eps_deg

    def rec(a: int, b: int) -> None:
        if b - a < 2:
            return
        ca = float(np.cos(np.radians(lats[a])))
        dx = (lons[b] - lons[a]) * ca
        dy = lats[b] - lats[a]
        den = dx * dx + dy * dy
        best, bi = -1.0, -1
        for k in range(a + 1, b):
            x = (lons[k] - lons[a]) * ca
            y = lats[k] - lats[a]
            if den == 0.0:
                d2 = x * x + y * y
            else:
                t = (x * dx + y * dy) / den
                if t < 0.0:
                    t = 0.0
                elif t > 1.0:
                    t = 1.0
                ex = x - t * dx
                ey = y - t * dy
                d2 = ex * ex + ey * ey
            if d2 > best:
                best, bi = d2, k
        if best > eps2:
            keep[bi] = True
            rec(a, bi)
            rec(bi, b)

    rec(0, n - 1)
    return keep


def _parse_doc_points_ts(spans) -> tuple[list[float], list[float], list[int]]:
    """Like :func:`_parse_doc_points` but also returns the timestamps."""
    lons, lats, tss = [], [], []
    for s in spans:
        if s["kind"] == "text" and s["text"] is not None and _POINT_RE.fullmatch(s["text"]):
            a, b, c = s["text"].split(" ")
            lons.append(float(a))
            lats.append(float(b))
            tss.append(int(c))
    return lons, lats, tss


def _scalar_resample(lons: list, lats: list, tss: list, k: int = 8):
    """Scalar mirror of ``simplify.resample_track`` (bisect + plain
    floats, identical expression order)."""
    import bisect

    n = len(tss)
    if n == 0:
        return []
    order = sorted(range(n), key=lambda i: (tss[i], i))
    seen, o = set(), []
    for i in order:
        if tss[i] not in seen:
            seen.add(tss[i])
            o.append(i)
    ts_s = [float(tss[i]) for i in o]
    lon_s = [lons[i] for i in o]
    lat_s = [lats[i] for i in o]
    m = len(ts_s)
    if m == 1:
        return [(0, lon_s[0], lat_s[0])]
    out = []
    for j in range(k):
        t = ts_s[0] + (ts_s[-1] - ts_s[0]) * float(j) / (k - 1.0)
        i = min(max(bisect.bisect_right(ts_s, t) - 1, 0), m - 2)
        f = (t - ts_s[i]) / (ts_s[i + 1] - ts_s[i])
        out.append(
            (j, lon_s[i] + f * (lon_s[i + 1] - lon_s[i]), lat_s[i] + f * (lat_s[i + 1] - lat_s[i]))
        )
    return out


def resample_expected_path(world: dict, k: int) -> str:
    """Expected resampled rows (doc_id, j, r6 lon/lat) — cached per process."""
    key = f"resample_{k}"
    hit = _PLANTED.get(key)
    if hit is not None:
        return hit
    docs = pq.read_table(world["paths"]["parquet"]).to_pylist()
    o_doc, o_j, o_lon, o_lat = [], [], [], []
    for doc in docs:
        lons, lats, tss = _parse_doc_points_ts(doc["spans"])
        for j, lon, lat in _scalar_resample(lons, lats, tss, k):
            o_doc.append(doc["doc_id"])
            o_j.append(j)
            o_lon.append(_r6(lon))
            o_lat.append(_r6(lat))
    out = tempfile.mkdtemp(prefix="routers_ray_oracle_")
    path = os.path.join(out, "resample_expected.parquet")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(o_doc, pa.string()),
                "j": pa.array(o_j, pa.int64()),
                "lon": pa.array(o_lon, pa.float64()),
                "lat": pa.array(o_lat, pa.float64()),
            }
        ),
        path,
    )
    _PLANTED[key] = path
    return path


def simplify_expected_path(world: dict, eps_deg: float) -> str:
    """Expected kept vertices (doc_id, seq, r6 lon/lat) for the match
    world under the scalar Douglas-Peucker — cached per process."""
    key = f"simplify_{eps_deg}"
    hit = _PLANTED.get(key)
    if hit is not None:
        return hit
    docs = pq.read_table(world["paths"]["parquet"]).to_pylist()
    o_doc, o_seq, o_lon, o_lat = [], [], [], []
    for doc in docs:
        lons, lats = _parse_doc_points(doc["spans"])
        keep = _scalar_simplify_keep(lons, lats, eps_deg)
        for k, kp in enumerate(keep):
            if kp:
                o_doc.append(doc["doc_id"])
                o_seq.append(k)
                o_lon.append(_r6(lons[k]))
                o_lat.append(_r6(lats[k]))
    out = tempfile.mkdtemp(prefix="routers_ray_oracle_")
    path = os.path.join(out, "simplify_expected.parquet")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(o_doc, pa.string()),
                "seq": pa.array(o_seq, pa.int64()),
                "lon": pa.array(o_lon, pa.float64()),
                "lat": pa.array(o_lat, pa.float64()),
            }
        ),
        path,
    )
    _PLANTED[key] = path
    return path


def planted_speed_world(n_edges: int = 500, seed: int = 37) -> str:
    """Edge table with maxspeed tag-sets, a travel direction and a probe
    lane (−1 = no lane context). Cached per process; returns parquet path."""
    hit = _PLANTED.get("speed_path")
    if hit is not None:
        return hit
    rng = np.random.default_rng(seed)
    tagsets, dirs, lanes = [], [], []
    for _ in range(n_edges):
        tagsets.append(_SPEED_TAGSETS[int(rng.integers(0, len(_SPEED_TAGSETS)))])
        dirs.append("forward" if rng.integers(0, 2) == 0 else "backward")
        # NonZeroU8 lane semantics: valid probe lanes are 1.. (slot 0
        # unreachable in the reference); −1 = no lane context
        lanes.append(int(rng.choice([-1, 1, 2])))
    tbl = pa.table(
        {
            "edge_id": pa.array(np.arange(n_edges, dtype=np.int64), pa.int64()),
            "dir": pa.array(dirs, pa.string()),
            "probe_lane": pa.array(lanes, pa.int32()),
            "tags": pa.array(
                [[{"key": k, "value": v} for k, v in ts] for ts in tagsets],
                _SPEED_TAG_TYPE,
            ),
        }
    )
    out_dir = tempfile.mkdtemp(prefix="routers_ray_oracle_speed_")
    path = os.path.join(out_dir, "planted_speed.parquet")
    pq.write_table(tbl, path)
    _PLANTED["speed_path"] = path
    return path


# --- independent scalar recompute (datetime-based; no speed_limit.py) ---

_SL_MODE_WORDS = frozenset(
    "access foot dog horse bicycle mtb vehicle motor_vehicle motorcycle moped "
    "motorcar goods hgv agricultural psv bus taxi minibus emergency hazmat "
    "disabled coach trailer caravan".split()
)
_SL_DAYS = {"Mo": 0, "Tu": 1, "We": 2, "Th": 3, "Fr": 4, "Sa": 5, "Su": 6,
            "monday": 0, "tuesday": 1, "wednesday": 2, "thursday": 3,
            "friday": 4, "saturday": 5, "sunday": 6}


def _sl_minutes(tok: str) -> int:
    bits = tok.split(":")
    h = int(bits[0])
    m = int(bits[1]) if len(bits) > 1 else 0
    if h > 24 or m > 59:
        raise ValueError(tok)
    return h * 60 + m


def _sl_open_at(spec: str, ts_us: int) -> bool:
    """Scalar opening-hours evaluation via datetime (independent of
    access.py): '24/7', ';'-rules, weekday tokens, end-inclusive time
    ranges, overnight wrap, single point = one hour (midnight → 0)."""
    import datetime as dt

    spec = spec.strip()
    if not spec:
        raise ValueError("empty")
    d = dt.datetime.fromtimestamp(ts_us / 1e6, tz=dt.timezone.utc)
    minute = d.hour * 60 + d.minute
    if spec == "24/7":
        return True
    matched = False
    saw_rule = False
    for rule in spec.split(";"):
        rule = rule.strip()
        if not rule:
            continue
        saw_rule = True
        if rule.lower() in ("closed", "off"):
            continue
        days: set[int] | None = None
        windows: list[tuple[int, int]] = []
        for tok in rule.split():
            if tok[0].isdigit():
                for part in tok.split(","):
                    if not part:
                        continue
                    if "-" in part:
                        a, b = part.split("-", 1)
                        windows.append((_sl_minutes(a), _sl_minutes(b)))
                    else:
                        s = _sl_minutes(part)
                        windows.append((s, (s + 60) % 1440))
            else:
                days = days or set()
                for part in tok.split(","):
                    if not part:
                        continue
                    if "-" in part:
                        a, b = part.split("-", 1)
                        if a not in _SL_DAYS or b not in _SL_DAYS:
                            raise ValueError(tok)
                        i = _SL_DAYS[a]
                        while True:
                            days.add(i)
                            if i == _SL_DAYS[b]:
                                break
                            i = (i + 1) % 7
                    else:
                        if part not in _SL_DAYS and part.lower() not in _SL_DAYS:
                            raise ValueError(tok)
                        days.add(_SL_DAYS.get(part, _SL_DAYS.get(part.lower())))
        day_ok = days is None or d.weekday() in days
        if not windows:
            windows = [(0, 1440)]
        t_ok = False
        for s, e in windows:
            t_ok |= (s <= minute <= e) if s <= e else (minute >= s or minute <= e)
        matched |= day_ok and t_ok
    if not saw_rule:
        raise ValueError("no rules")
    return matched


def _sl_cond_applies(cond: str, ts_us: int) -> bool:
    """Scalar condition evaluation: AND/OR recursion; time-date rules via
    _sl_open_at; any non-time condition kind → False (no runtime env)."""
    t = cond.strip()
    if t.startswith("(") and t.endswith(")"):
        t = t[1:-1]
    upper = t.upper()
    for token, op in ((" AND ", all), (" OR ", any)):
        pos = upper.find(token)
        if pos >= 0:
            return op(
                (_sl_cond_applies(t[:pos], ts_us),
                 _sl_cond_applies(t[pos + len(token):], ts_us))
            )
    q = t.find('"')
    hours = t[:q].strip() if q >= 0 else t
    try:
        return _sl_open_at(hours, ts_us)
    except (ValueError, IndexError):
        return False  # season/road/property/usage: no env signal at probes


def _sl_value(val: str):
    """Scalar conditional-speed parse: (kmh:int, cond:str|None) or None."""
    m = re.match(r"^\s*(\d+)(?:\s*([^\s(]+))?", val)
    if not m:
        return None
    n = int(m.group(1))
    if not (1 <= n <= 0xFFFF):
        return None
    unit = (m.group(2) or "").lower()
    if unit == "mph":
        kmh = int(n * 1.609344)
    elif unit == "knots":
        kmh = int(n * 1.852)
    elif unit in ("none", "walk", "variable", "inherited"):
        return None
    else:
        kmh = n
    if kmh == 0:
        return None
    cm = re.search(r"\(([^)]+)\)", val)
    return kmh, (cm.group(1) if cm else None)


def _scalar_speed_kmh(tags, mode: str, direction: str, lane, ts_us: int):
    """Effective km/h for one edge context, or None. Independent of
    speed_limit.py: conditional-applies overrides unconditional, min wins."""
    uncond, cond_open = [], []
    for k, v in sorted((t["key"], t["value"]) for t in tags):
        if not k.startswith("maxspeed"):
            continue
        secs = k.split(":")
        tmode = next((s for s in secs if s in _SL_MODE_WORDS), None)
        tdir = next(
            (s for s in secs if s in ("forward", "backward", "both_ways")), None
        )
        if tmode is not None and tmode != mode:
            continue
        if tdir is not None and tdir != direction:
            continue
        if "lanes" in k:
            slots = v.split("|")
            if slots and slots[-1] == "":
                slots.pop()
            if lane is None or lane < 0 or lane >= len(slots):
                continue
            val = slots[lane]
        else:
            val = v
        parsed = _sl_value(val)
        if parsed is None:
            continue
        kmh, cond = parsed
        if cond is None:
            uncond.append(kmh)
        elif _sl_cond_applies(cond, ts_us):
            cond_open.append(kmh)
    if cond_open:
        return min(cond_open)
    if uncond:
        return min(uncond)
    return None


def planted_speed_expected_path() -> str:
    """Per-(mode, probe) limited-edge counts + km/h sums of the planted
    speed world via the scalar recompute. Written once per process."""
    hit = _PLANTED.get("speed_expected")
    if hit is not None:
        return hit
    import pyarrow.parquet as papq

    tbl = papq.read_table(planted_speed_world())
    tags_col = tbl["tags"].to_pylist()
    dir_col = tbl["dir"].to_pylist()
    lane_col = tbl["probe_lane"].to_pylist()
    rows = []
    for mode in SPEED_PROBE_MODES:
        for ts_us in ACCESS_PROBES_US:
            n_limited, s_kmh = 0, 0
            for tags, dirn, lane in zip(tags_col, dir_col, lane_col):
                kmh = _scalar_speed_kmh(
                    tags, mode, dirn, None if lane < 0 else lane, ts_us
                )
                if kmh is not None:
                    n_limited += 1
                    s_kmh += kmh
            rows.append((mode, ts_us, n_limited, s_kmh))
    out_dir = tempfile.mkdtemp(prefix="routers_ray_oracle_speedx_")
    path = os.path.join(out_dir, "speed_expected.parquet")
    pq.write_table(
        pa.table(
            {
                "mode": pa.array([r[0] for r in rows], pa.string()),
                "ts_us": pa.array([r[1] for r in rows], pa.int64()),
                "n_limited": pa.array([r[2] for r in rows], pa.int64()),
                "sum_kmh": pa.array([r[3] for r in rows], pa.int64()),
            }
        ),
        path,
    )
    _PLANTED["speed_expected"] = path
    return path
