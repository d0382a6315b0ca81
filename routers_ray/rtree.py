"""STR-packed R-tree over bounding boxes — the literal "R-tree-backed
point-in-polygon and kNN candidate search" strategy, built to run INSIDE
``map_batches``: the tree is built once on the driver from the broadcast
small side (region boxes, polygon envelopes, station points), captured by
the batch closure (Ray ships it through the object store once per task),
and every batch traverses it VECTORIZED — a frontier of (query, node)
pairs expands level by level with pure-numpy bbox tests, no per-point
Python recursion.

Reference semantics: the tz polygon backends' R-tree + containment
lookup (``libs/routers_tz``, SURVEY §2.2) and the candidate-scan shape of
``routers_network``'s ``edges_at_distance``; the packing is the classic
Sort-Tile-Recursive bulk load (Leutenegger et al., ICDE'97) — public
knowledge, implemented from the paper's description.

The tree stores each level as flat numpy arrays (boxes + contiguous
child ranges, a property of STR packing), so traversal state is three
int arrays and the structure is cheaply picklable for the closure
capture. This is a FILTER stage: callers refine candidates with their
exact predicate (half-open containment, even-odd crossing, haversine
top-k) — the tree only guarantees a superset.
"""

from __future__ import annotations

import numpy as np


class STRtree:
    """Bulk-loaded R-tree over (n, 4) boxes ``[w, s, e, n]``.

    Contract: item boxes must be NON-WRAPPING (w ≤ e); a box crossing the
    antimeridian must be split into its two [-180, e] / [w, 180] halves by
    the caller before loading (query-side lon wrap IS handled — see
    :meth:`query_radius_deg`)."""

    def __init__(self, boxes: np.ndarray, capacity: int = 16):
        boxes = np.asarray(boxes, dtype=np.float64).reshape(-1, 4)
        if capacity < 2:
            raise ValueError("capacity must be >= 2")
        self.capacity = int(capacity)
        self.n_items = boxes.shape[0]
        # item level: STR-order the items once; leaves reference contiguous
        # runs of this permutation
        order = self._str_order(boxes)
        self.item_order = order
        self.item_boxes = boxes[order]
        # build levels bottom-up; each level is (boxes, child_start, child_end)
        # with child ranges indexing the level BELOW (items for leaves)
        self.levels: list[tuple[np.ndarray, np.ndarray, np.ndarray]] = []
        child_boxes = self.item_boxes
        if self.n_items == 0:
            # inverted box: no point/box test can ever pass
            self.levels = [(
                np.array([[np.inf, np.inf, -np.inf, -np.inf]]),
                np.zeros(1, np.int64),
                np.zeros(1, np.int64),
            )]
            return
        while child_boxes.shape[0] > 1 or not self.levels:
            m = child_boxes.shape[0]
            n_nodes = -(-m // self.capacity)
            # children arrive already STR-ordered; group contiguous chunks
            starts = np.arange(n_nodes, dtype=np.int64) * self.capacity
            ends = np.minimum(starts + self.capacity, m)
            node_boxes = np.column_stack(
                [
                    np.minimum.reduceat(child_boxes[:, 0], starts),
                    np.minimum.reduceat(child_boxes[:, 1], starts),
                    np.maximum.reduceat(child_boxes[:, 2], starts),
                    np.maximum.reduceat(child_boxes[:, 3], starts),
                ]
            )
            self.levels.append((node_boxes, starts, ends))
            if n_nodes == 1:
                break
            child_boxes = self._str_reorder_level(node_boxes)
        self.levels.reverse()  # root first

    def _str_order(self, boxes: np.ndarray) -> np.ndarray:
        """Sort-Tile-Recursive permutation: vertical slices by x-center,
        y-center within each slice."""
        n = boxes.shape[0]
        if n == 0:
            return np.empty(0, np.int64)
        cx = (boxes[:, 0] + boxes[:, 2]) * 0.5
        cy = (boxes[:, 1] + boxes[:, 3]) * 0.5
        n_leaves = max(1, -(-n // self.capacity))
        n_slices = max(1, int(np.ceil(np.sqrt(n_leaves))))
        slice_sz = n_slices * self.capacity
        by_x = np.argsort(cx, kind="stable")
        out = np.empty(n, np.int64)
        for s in range(0, n, slice_sz):  # bounded: ≤ sqrt(n/B) slices
            idx = by_x[s : s + slice_sz]
            out[s : s + idx.size] = idx[np.argsort(cy[idx], kind="stable")]
        return out

    def _str_reorder_level(self, node_boxes: np.ndarray) -> np.ndarray:
        """Upper levels re-pack their nodes in STR order too; child ranges
        must stay contiguous, so instead of permuting (which would break
        the ranges) we keep insertion order — STR leaf order is already
        x-slice/y-sorted, and parents of contiguous children inherit that
        locality. Returns the boxes unchanged."""
        return node_boxes

    # -- traversal ---------------------------------------------------------

    def _descend(self, qi: np.ndarray, test) -> tuple[np.ndarray, np.ndarray]:
        """Run the vectorized frontier descent. ``test(level_boxes, qi,
        nodes) -> bool mask`` prunes (query, node) pairs per level.
        Returns (query_idx, item_pos) candidate pairs at the ITEM level
        (item_pos indexes item_boxes / item_order)."""
        nodes = np.zeros(qi.size, np.int64)  # everyone starts at the root
        for boxes, starts, ends in self.levels:
            keep = test(boxes, qi, nodes)
            qi, nodes = qi[keep], nodes[keep]
            if qi.size == 0:
                return qi, nodes
            cnt = ends[nodes] - starts[nodes]
            base = np.repeat(starts[nodes], cnt)
            within = np.arange(int(cnt.sum()), dtype=np.int64) - np.repeat(
                np.cumsum(cnt) - cnt, cnt
            )
            qi = np.repeat(qi, cnt)
            nodes = base + within
        return qi, nodes

    def query_points(self, lons: np.ndarray, lats: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Candidate (point_idx, item_idx) pairs whose item bbox contains
        the point (CLOSED bbox test — refine half-open semantics at the
        caller). Fully vectorized frontier traversal."""
        lons = np.asarray(lons, np.float64)
        lats = np.asarray(lats, np.float64)

        def test(boxes, qi, nodes):
            return (
                (lons[qi] >= boxes[nodes, 0])
                & (lons[qi] <= boxes[nodes, 2])
                & (lats[qi] >= boxes[nodes, 1])
                & (lats[qi] <= boxes[nodes, 3])
            )

        qi, pos = self._descend(np.arange(lons.size, dtype=np.int64), test)
        keep = (
            (lons[qi] >= self.item_boxes[pos, 0])
            & (lons[qi] <= self.item_boxes[pos, 2])
            & (lats[qi] >= self.item_boxes[pos, 1])
            & (lats[qi] <= self.item_boxes[pos, 3])
        )
        return qi[keep], self.item_order[pos[keep]]

    def query_radius_deg(
        self, lons: np.ndarray, lats: np.ndarray, r_deg: float
    ) -> tuple[np.ndarray, np.ndarray]:
        """Candidate (point_idx, item_idx) pairs whose item bbox intersects
        the point's ±r_deg box. Longitude WRAPS: the metric is periodic in
        lon but the boxes are not, so each point is also probed at
        lon±360 — without this, a query near the antimeridian misses
        metrically-near items on the other side and the kNN early stop
        returns wrong neighbors."""
        lons = np.asarray(lons, np.float64)
        lats = np.asarray(lats, np.float64)
        r = float(r_deg)

        def hit(qlon, boxes, qi, nodes):
            return (
                (qlon[qi] + r >= boxes[nodes, 0])
                & (qlon[qi] - r <= boxes[nodes, 2])
                & (lats[qi] + r >= boxes[nodes, 1])
                & (lats[qi] - r <= boxes[nodes, 3])
            )

        out_q: list[np.ndarray] = []
        out_i: list[np.ndarray] = []
        for shift in (0.0, -360.0, 360.0):
            ql = lons + shift

            def test(boxes, qi, nodes, ql=ql):
                return hit(ql, boxes, qi, nodes)

            qi, pos = self._descend(np.arange(lons.size, dtype=np.int64), test)
            keep = hit(ql, self.item_boxes, qi, pos)
            out_q.append(qi[keep])
            out_i.append(self.item_order[pos[keep]])
        qi = np.concatenate(out_q)
        ii = np.concatenate(out_i)
        # a pair can match both the 0 and ±360 probes when r ≥ ~180°
        key = np.unique(qi * np.int64(max(self.n_items, 1)) + ii)
        return key // np.int64(max(self.n_items, 1)), key % np.int64(max(self.n_items, 1))


_R_EARTH = 6_371_000.0  # must stay ≤ every caller's haversine radius


def knn_candidates(
    tree: STRtree,
    lons: np.ndarray,
    lats: np.ndarray,
    k: int,
    dist_m,
    r0_deg: float = 1.0,
    max_doublings: int = 12,
) -> tuple[np.ndarray, np.ndarray]:
    """Expanding-radius kNN candidate gather with a METRIC-SAFE stop: a
    degree box is not a haversine ball (lon degrees shrink with
    latitude), so holding ≥ k candidates is not enough — the k-th
    candidate's metric distance must also fit inside the box's
    guaranteed-covered ball ``2R·asin(cos(|lat|+r)·sin(r/2))`` (every
    point OUTSIDE the box is at least that far: a lon-excluded point's
    haversine is ≥ that term with both latitudes within ±(|lat|+r), and
    a lat-excluded point's is ≥ R·r, which is larger). The box doubles
    until both hold; stragglers after ``max_doublings`` fall back to all
    items (correct, never silent-wrong). ``dist_m(q_idx, item_idx) ->
    meters`` is the caller's exact metric. Returns (point_idx, item_idx)
    candidate pairs that are a guaranteed superset of the true kNN."""
    lons = np.asarray(lons, np.float64)
    lats = np.asarray(lats, np.float64)
    need = np.arange(lons.size, dtype=np.int64)
    out_q: list[np.ndarray] = []
    out_i: list[np.ndarray] = []
    r = float(r0_deg)
    for _ in range(max_doublings):
        if need.size == 0:
            break
        qi, ii = tree.query_radius_deg(lons[need], lats[need], r)
        counts = np.bincount(qi, minlength=need.size)
        enough = counts >= k
        done = np.zeros(need.size, dtype=bool)
        if enough.any():
            # the ball the box PROVABLY covers at each point's latitude
            lat_edge = np.minimum(np.abs(lats[need]) + r, 90.0)
            safe_m = (
                2.0
                * _R_EARTH
                * np.arcsin(
                    np.cos(np.radians(lat_edge)) * np.sin(np.radians(r) / 2.0)
                )
            )
            d = dist_m(need[qi], ii)
            order = np.lexsort((ii, d, qi))  # per-point (d, id) ascending
            qs, ds = qi[order], d[order]
            rank = np.arange(qs.size) - np.searchsorted(qs, qs, side="left")
            kth = np.full(need.size, np.inf)
            at_k = rank == k - 1
            kth[qs[at_k]] = ds[at_k]
            # strict: an OUTSIDE point could tie kth exactly and win the
            # (d, id) tie-break — only stop when the ball strictly covers
            done = enough & (kth < safe_m)
        if done.any():
            sel = done[qi]
            out_q.append(need[qi[sel]])
            out_i.append(ii[sel])
        need = need[~done]
        r *= 2.0
    if need.size:
        all_items = np.arange(tree.n_items, dtype=np.int64)
        out_q.append(np.repeat(need, tree.n_items))
        out_i.append(np.tile(all_items, need.size))
    if not out_q:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    return np.concatenate(out_q), np.concatenate(out_i)
