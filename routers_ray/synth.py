"""Deterministic synthetic corpus: interleaved text+media docs whose text
spans encode trajectories walked on the synthetic road network.

Generator knobs per FIXTURES.md §1 (seed fixed): points-per-doc ~ U[5, 60],
GPS noise σ≈15 m off a ground-truth walk, media-span insertion rate
0.3/point, prose spans sprinkled in, and hotspot skew — 70% of docs anchored
in the first city (the urban hotspot that exercises salting).

Everything is derived from ``numpy.default_rng(seed)`` — no external data.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .network import CellNetwork, fatten_edges, synth_network
from .spans import DOCS_SCHEMA

NOISE_SIGMA_M = 15.0
MEDIA_RATE = 0.3
PROSE_RATE = 0.05
TS_BASE_US = 1_775_000_000_000_000  # matched_diff.rs:16-70 fixture epoch
TS_STEP_US = 5_000_000

_PROSE = [
    "waypoint note",
    "traffic ahead",
    "sunny and clear",
    "stopped for fuel",
    "arrived at depot",
]


def synth_corpus(
    n_docs: int = 200,
    seed: int = 42,
    network: tuple[pa.Table, pa.Table] | None = None,
    hotspot_frac: float = 0.7,
    min_pts: int = 5,
    max_pts: int = 60,
) -> pa.Table:
    """Build the interleaved-doc table. Returns an Arrow table with the
    ``input_hint`` schema exactly."""
    rng = np.random.default_rng(seed)
    nodes, edges = network if network is not None else synth_network(seed=seed)
    fat = fatten_edges(nodes, edges)
    net = CellNetwork.from_edge_rows(fat)
    csr = net.csr

    # city anchor nodes: group node ids by city prefix (base // 1_000_000)
    city_of = np.asarray(nodes["node_id"], dtype=np.int64) // 1_000_000
    city_of = np.where(city_of >= 90, 0, city_of)  # spine midpoints → hotspot
    cities = np.unique(city_of)
    n_cities = cities.size

    doc_ids, spans_rows = [], []
    for d in range(n_docs):
        # hotspot skew: most docs anchor in city 0
        if rng.random() < hotspot_frac or n_cities == 1:
            city = cities[0]
        else:
            city = cities[1 + int(rng.integers(0, n_cities - 1))]
        cand = np.flatnonzero(city_of == city)
        start_ext = int(np.asarray(nodes["node_id"])[cand[int(rng.integers(0, cand.size))]])
        start = int(csr.node_index(start_ext))
        if start < 0:
            continue

        n_pts = int(rng.integers(min_pts, max_pts + 1))
        # ground-truth walk: follow random successors, sample a point per edge
        lons, lats = [], []
        cur = start
        guard = 0
        while len(lons) < n_pts and guard < n_pts * 8:
            guard += 1
            lo, hi = int(csr.indptr[cur]), int(csr.indptr[cur + 1])
            if hi == lo:
                break
            e = lo + int(rng.integers(0, hi - lo))
            nxt = int(csr.nbr[e])
            f = rng.uniform(0.2, 0.9)
            lons.append(csr.node_lon[cur] + (csr.node_lon[nxt] - csr.node_lon[cur]) * f)
            lats.append(csr.node_lat[cur] + (csr.node_lat[nxt] - csr.node_lat[cur]) * f)
            cur = nxt
        if len(lons) < min_pts:
            continue
        lons = np.asarray(lons)
        lats = np.asarray(lats)
        # GPS noise σ 15 m
        lats_noise = lats + rng.normal(0, NOISE_SIGMA_M / 111_320.0, lats.size)
        lons_noise = lons + rng.normal(
            0, NOISE_SIGMA_M / (111_320.0 * np.cos(np.radians(lats))), lons.size
        )
        ts = TS_BASE_US + d * 1_000_000_000 + np.arange(lons.size) * TS_STEP_US

        doc_id = f"doc-{seed}-{d:06d}"
        spans = []
        offset = 0
        media_k = 0
        for i in range(lons.size):
            spans.append(
                {
                    "kind": "text",
                    "text": f"{lons_noise[i]:.7f} {lats_noise[i]:.7f} {ts[i]}",
                    "media_ref": "",
                    "offset": offset,
                }
            )
            offset += 1
            while rng.random() < MEDIA_RATE:
                spans.append(
                    {
                        "kind": "media",
                        "text": "",
                        "media_ref": f"media://{doc_id}/{media_k}",
                        "offset": offset,
                    }
                )
                offset += 1
                media_k += 1
                if rng.random() > 0.25:
                    break
            if rng.random() < PROSE_RATE:
                spans.append(
                    {
                        "kind": "text",
                        "text": _PROSE[int(rng.integers(0, len(_PROSE)))],
                        "media_ref": "",
                        "offset": offset,
                    }
                )
                offset += 1
        doc_ids.append(doc_id)
        spans_rows.append(spans)

    return pa.Table.from_pydict({"doc_id": doc_ids, "spans": spans_rows}, schema=DOCS_SCHEMA)


def write_corpus(
    tbl: pa.Table, out_dir: str, name: str = "documents", n_files: int = 1
) -> dict[str, str]:
    """Write the corpus as Parquet (always) and Lance (when available —
    the north rule names Lance tables; this container lacks the lance
    package, so Parquet is the storage mirror and Lance is gated).

    ``n_files > 1`` writes a DIRECTORY of part files instead of one blob —
    a single-file corpus decodes in ONE read task and serially gates every
    downstream stage (measured: 17 s of a 52 s pipeline at 32 CPUs);
    sharded parquet is also the resumable-output layout the north rule
    asks for."""
    os.makedirs(out_dir, exist_ok=True)
    paths = {}
    pq_path = os.path.join(out_dir, f"{name}.parquet")
    if n_files <= 1:
        pq.write_table(tbl, pq_path)
    else:
        os.makedirs(pq_path, exist_ok=True)
        n = tbl.num_rows
        step = (n + n_files - 1) // n_files
        for i in range(0, n_files):
            part = tbl.slice(i * step, step)
            if part.num_rows == 0:
                break
            pq.write_table(part, os.path.join(pq_path, f"part-{i:05d}.parquet"))
    paths["parquet"] = pq_path
    try:  # pragma: no cover — lance not installed in this container
        import lance

        lance_path = os.path.join(out_dir, f"{name}.lance")
        lance.write_dataset(tbl, lance_path, mode="overwrite")
        paths["lance"] = lance_path
    except ImportError:
        pass
    return paths


def read_corpus(path_or_dir: str):
    """ray.data reader for the corpus — Lance if present, else Parquet."""
    import ray.data as rd

    if path_or_dir.endswith(".lance"):
        return rd.read_lance(path_or_dir)
    return rd.read_parquet(path_or_dir)
