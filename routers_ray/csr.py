"""CSR-packed routing graph + bounded Dijkstra (the in-actor road map).

Replaces the reference's per-process ``DiGraphMap`` + hashmaps + R-trees
(``routers_codec/src/osm/graph.rs:41-52``) with flat NumPy arrays built once
per actor from the partitioned network store:

- nodes: ``node_ids`` (sorted int64) + lon/lat arrays;
- directed edges in CSR layout sorted by (src, dst, edge_id) — the engine's
  deterministic successor order (the reference's hashmap order is
  unspecified; determinism is part of this engine's spec);
- ``SuccessorsCache`` (``primitives/cache.rs:178-222``) is simply the CSR
  adjacency with precomputed per-edge haversine length in centimeters;
- the bounded Dijkstra reproduces ``primitives/algorithms/dijkstra.rs:70-160``
  ordered by ``WeightAndDistance.repr() = (Σw // n)² · Σdist_cm`` (running
  *integer-division* average road-class weight, squared, times cumulative
  centimeters — ``primitives/weight_and_distance.rs:15-44``), cut at the
  2 km threshold via take-while on settled distance
  (``primitives/cache.rs:289-327``), successors filtered by accessibility.
"""

from __future__ import annotations

from dataclasses import dataclass
from heapq import heappop, heappush

import numpy as np

from .geo import haversine_m

DEFAULT_THRESHOLD_CM = 200_000.0  # 2 km in cm (primitives/cache.rs:230)
U32_MAX = 0xFFFFFFFF


@dataclass
class CSRGraph:
    node_ids: np.ndarray  # int64, sorted ascending
    node_lon: np.ndarray  # float64
    node_lat: np.ndarray
    indptr: np.ndarray  # int64, len = n_nodes + 1
    nbr: np.ndarray  # int32 — target node index per directed edge
    edge_weight: np.ndarray  # uint32 road-class weight 1..100
    edge_dist_cm: np.ndarray  # uint32 haversine length in centimeters
    edge_id: np.ndarray  # int64 undirected way id
    edge_dir: np.ndarray  # uint8 0=forward 1=reverse twin
    edge_accessible: np.ndarray  # bool

    # Python-list mirrors of the hot arrays (built lazily): list indexing
    # beats NumPy scalar indexing ~3× inside the Dijkstra loop
    _l_indptr: list | None = None
    _l_nbr: list | None = None
    _l_w: list | None = None
    _l_d: list | None = None
    _l_acc: list | None = None
    # C-kernel scratch (see routers_ray._ckernels; lazily built)
    _c_scratch: object | None = None
    _acc_u8: object | None = None

    def _lists(self):
        if self._l_indptr is None:
            self._l_indptr = self.indptr.tolist()
            self._l_nbr = self.nbr.tolist()
            self._l_w = self.edge_weight.tolist()
            self._l_d = self.edge_dist_cm.tolist()
            self._l_acc = self.edge_accessible.tolist()
        return self._l_indptr, self._l_nbr, self._l_w, self._l_d, self._l_acc

    def n_nodes(self) -> int:
        return int(self.node_ids.size)

    def node_index(self, node_id) -> np.ndarray:
        """Map external node ids to CSR indices (-1 when absent)."""
        ids = np.asarray(node_id, dtype=np.int64)
        pos = np.searchsorted(self.node_ids, ids)
        pos = np.clip(pos, 0, self.node_ids.size - 1)
        ok = self.node_ids[pos] == ids
        return np.where(ok, pos, -1).astype(np.int64)

    def edge_between(self, src_idx: int, dst_idx: int) -> int:
        """CSR position of the directed edge src→dst, or -1.

        The reference's ``edge(a, b)`` hash lookup
        (``routers_codec/src/osm/graph.rs:346-355``); with multiple parallel
        edges the lowest (edge_id, dir) wins (successor sort order).
        """
        lo, hi = int(self.indptr[src_idx]), int(self.indptr[src_idx + 1])
        sl = self.nbr[lo:hi]
        hits = np.flatnonzero(sl == dst_idx)
        return int(lo + hits[0]) if hits.size else -1


def build_csr(
    node_ids, node_lon, node_lat, e_src, e_dst, e_weight, e_dir, e_edge_id, e_accessible
) -> CSRGraph:
    """Pack node/edge tables into a CSR graph.

    Edges whose endpoints are missing from the node set are dropped (shard
    padding guarantees interior completeness — ``routers_shard/src/network.rs:110-169``).
    """
    node_ids = np.asarray(node_ids, dtype=np.int64)
    order = np.argsort(node_ids, kind="stable")
    node_ids = node_ids[order]
    node_lon = np.asarray(node_lon, dtype=np.float64)[order]
    node_lat = np.asarray(node_lat, dtype=np.float64)[order]

    e_src = np.asarray(e_src, dtype=np.int64)
    e_dst = np.asarray(e_dst, dtype=np.int64)
    si = np.searchsorted(node_ids, e_src)
    di = np.searchsorted(node_ids, e_dst)
    si = np.clip(si, 0, node_ids.size - 1)
    di = np.clip(di, 0, node_ids.size - 1)
    ok = (node_ids[si] == e_src) & (node_ids[di] == e_dst)

    si, di = si[ok], di[ok]
    w = np.asarray(e_weight, dtype=np.uint32)[ok]
    dr = np.asarray(e_dir, dtype=np.uint8)[ok]
    eid = np.asarray(e_edge_id, dtype=np.int64)[ok]
    acc = np.asarray(e_accessible, dtype=bool)[ok]

    # deterministic successor order: (src, dst, edge_id, dir)
    order = np.lexsort((dr, eid, di, si))
    si, di, w, dr, eid, acc = si[order], di[order], w[order], dr[order], eid[order], acc[order]

    dist_m = haversine_m(node_lon[si], node_lat[si], node_lon[di], node_lat[di])
    dist_cm = np.minimum(dist_m * 100.0, U32_MAX).astype(np.uint32)

    indptr = np.zeros(node_ids.size + 1, dtype=np.int64)
    np.add.at(indptr, si + 1, 1)
    indptr = np.cumsum(indptr)

    return CSRGraph(
        node_ids=node_ids,
        node_lon=node_lon,
        node_lat=node_lat,
        indptr=indptr,
        nbr=di.astype(np.int32),
        edge_weight=w,
        edge_dist_cm=dist_cm,
        edge_id=eid,
        edge_dir=dr,
        edge_accessible=acc,
    )


def _repr_u32(num: int, den: int, dist_cm: int) -> int:
    """``WeightAndDistance::repr`` — integer-average weight squared × distance,
    computed in f64 and saturating-cast to u32 (``weight_and_distance.rs:36-44``)."""
    avg = num // den if den else 0
    v = float(avg * avg) * float(dist_cm)
    return U32_MAX if v >= U32_MAX else int(v)


def bounded_dijkstra(csr: CSRGraph, root: int, threshold_cm: float = DEFAULT_THRESHOLD_CM):
    """Bounded Dijkstra dispatch: the gcc-compiled kernel when available
    AND the graph is dense enough to pay for the call overhead (measured:
    11.3× on a 3600-node urban grid with ~1550-node settle sets, neutral
    to slightly slower on sub-1k-node test worlds where the predicate
    cache absorbs most calls) — else the pure-Python reference loop.
    Exact bit-equality A/B in tests/test_dijkstra.py."""
    if _CK is not None and _CK.have_ckernel() and csr.n_nodes() >= 1024:
        return _CK.bounded_dijkstra_c(csr, root, threshold_cm)
    return bounded_dijkstra_py(csr, root, threshold_cm)


try:  # the kernel is optional: no gcc → pure-Python path
    from . import _ckernels as _CK
except Exception:  # pragma: no cover
    _CK = None


def bounded_dijkstra_py(csr: CSRGraph, root: int, threshold_cm: float = DEFAULT_THRESHOLD_CM):
    """Parent-pointer map of the bounded Dijkstra rooted at ``root``.

    Returns ``(parents, dists_cm)`` dicts keyed by node index. Semantics per
    ``dijkstra.rs:70-160`` + ``cache.rs:289-327``: settle order by
    ``WeightAndDistance.repr()`` (ties by insertion order), inaccessible
    edges skipped, and the iteration *stops entirely* at the first settled
    node whose cumulative distance reaches the threshold (Rust
    ``take_while`` over the settle stream — later nodes are discarded even
    if nearer)."""
    parents: dict[int, int] = {}
    dists: dict[int, int] = {}
    # node -> (repr, num, den, dist) best known
    best: dict[int, tuple[int, int, int, int]] = {root: (0, 0, 0, 0)}
    seen: set[int] = set()
    counter = 0
    heap: list[tuple[int, int, int]] = [(0, counter, root)]
    indptr, nbr, e_w, e_d, e_acc = csr._lists()
    umax = U32_MAX
    push = heappush
    pop = heappop
    best_get = best.get

    while heap:
        rep, _, node = pop(heap)
        if node in seen:
            continue
        seen.add(node)
        _, num, den, dist = best[node]
        if dist >= threshold_cm:
            break  # take_while: cut the whole stream
        dists[node] = dist
        for e in range(indptr[node], indptr[node + 1]):
            if not e_acc[e]:
                continue
            nxt = nbr[e]
            if nxt in seen:
                # parent pointers are captured at settle time (the reference
                # collects the emitted item stream, dijkstra.rs:84-92) —
                # never rewrite a settled node's parent
                continue
            n_num = num + e_w[e]
            n_den = den + 1
            n_dist = dist + e_d[e]
            # inline WeightAndDistance::repr (weight_and_distance.rs:36-44)
            avg = n_num // n_den
            v = float(avg * avg) * float(n_dist)
            n_rep = umax if v >= umax else int(v)
            old = best_get(nxt)
            if old is None or old[0] > n_rep:
                best[nxt] = (n_rep, n_num, n_den, n_dist)
                parents[nxt] = node
                counter += 1
                push(heap, (n_rep, counter, nxt))
    # keep only settled nodes (matches the reference's emitted stream)
    parents = {k: v for k, v in parents.items() if k in dists}
    return parents, dists


def route_nodes(csr: CSRGraph, start: int, finish: int) -> tuple[int, list[int]] | None:
    """Minimum edge-weight route start→finish (node indices) — the
    reference's ``route_nodes``: A* with a zero heuristic over the
    road-class ``Weight`` (``osm/graph.rs:365-384``). Returns
    (total_weight, node index path) or None when unreachable. Inaccessible
    edges are skipped."""
    if start == finish:
        return 0, [start]
    indptr, nbr, e_w, _e_d, e_acc = csr._lists()
    best = {start: 0}
    parents: dict[int, int] = {}
    seen: set[int] = set()
    counter = 0
    heap = [(0, 0, start)]
    while heap:
        cost, _, node = heappop(heap)
        if node in seen:
            continue
        seen.add(node)
        if node == finish:
            path = [node]
            while node != start:
                node = parents[node]
                path.append(node)
            path.reverse()
            return cost, path
        for e in range(indptr[node], indptr[node + 1]):
            if not e_acc[e]:
                continue
            nxt = nbr[e]
            if nxt in seen:
                continue
            nc = cost + e_w[e]
            old = best.get(nxt)
            if old is None or old > nc:
                best[nxt] = nc
                parents[nxt] = node
                counter += 1
                heappush(heap, (nc, counter, nxt))
    return None


def parent_path(parents: dict[int, int], root: int, leaf: int) -> list[int] | None:
    """Nodes root→leaf inclusive via parent pointers, or None if unreachable
    (``weigh/expansion.rs:17-39``)."""
    if leaf == root:
        return [root]
    nodes = [leaf]
    cursor = leaf
    while cursor != root:
        parent = parents.get(cursor)
        if parent is None:
            return None
        nodes.append(parent)
        cursor = parent
    nodes.reverse()
    return nodes
