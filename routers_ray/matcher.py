"""Per-trajectory HMM map matching: candidates → trellis → weigh → Viterbi
→ collapse.

Pure-Python/NumPy port of the reference matching core
(``routers_transition/src/{matcher,weigh,candidate}``), designed to run
inside a ``map_batches`` actor: one trajectory never crosses a block
boundary, so all trellis state is function-local (SURVEY §7 hard parts).

Semantics reproduced (file:line in the reference):

- layer generation: every edge in the square search box contributes the
  point's projection, priced by emission cost
  (``layer/generation/impls/standard.rs:64-82``);
- whole-batch unanchored reject listing every empty layer
  (``matcher/entity.rs:143-193``);
- weighing: per boundary a dense |from|×|to| matrix; per pair ``reach`` =
  same-directed-edge direct hop or parent-path walk of the bounded Dijkstra
  rooted at ``source.edge.target`` (``weigh/expansion.rs:41-98``); cost =
  ``sqrt(deviance · turn · class-continuity)`` decayed to u32
  (``costing/default.rs:137-173``); all-NO_EDGE boundaries stay pending = a
  gap (``weigh/mod.rs:160-163``);
- Viterbi solve with lowest-node tie-breaks (``solver/viterbi.rs``);
- collapse: chosen candidate per layer, hop geometry re-derived from the
  warm predicate/path caches, consecutive-duplicate point dedup
  (``candidate/route.rs:46-139``, ``collapse.rs:71-116``).

Physically the weigher is organized for batch throughput: the regular
per-pair quantities (straightline, virtual tails, endpoint bearings,
class continuity) are computed as whole-boundary NumPy arrays; the routed
path per (root, leaf) node pair is memoized across boundaries (trajectories
revisit the same hops); only the ragged angular-complexity fold runs as a
tight scalar loop.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np

from .costing import (
    DEFAULT_EMISSION_ERROR_M,
    DEFAULT_SEARCH_DISTANCE_M,
    emission_cost,
)
from .csr import DEFAULT_THRESHOLD_CM, bounded_dijkstra, parent_path
from .geo import bearing_deg, haversine_m
from .network import CellNetwork
from .trellis import (
    MAX_WEIGHT,
    NO_EDGE,
    Trellis,
    UnreachableError,
    frontier_collapse,
    viterbi_solve,
)

DEFAULT_FANOUT = 16  # weigh/selective.rs:20
_COS_K = math.pi / 180.0 * 0.8  # COST_DAMPING compression (entity.rs:271-276)


@dataclass
class MatchOptions:
    search_distance_m: float = DEFAULT_SEARCH_DISTANCE_M
    emission_error_m: float = DEFAULT_EMISSION_ERROR_M
    threshold_cm: float = DEFAULT_THRESHOLD_CM
    fanout: int | None = None  # None = AllCompute; k = Selective (selective.rs:20-89)
    drop_unanchored: bool = False  # streaming mode drops, batch mode rejects
    max_layers: int | None = None  # Trip::tail windowing bound


@dataclass
class Layer:
    """One observation's candidate set (columns over candidates)."""

    edge_rows: np.ndarray  # indices into the CellNetwork edge arrays
    frac: np.ndarray
    pos_lon: np.ndarray
    pos_lat: np.ndarray
    dist_m: np.ndarray
    emission: np.ndarray  # uint32


@dataclass
class MatchError(Exception):
    kind: str  # "unanchored" | "disconnected" | "internal"
    layers: list[int] = field(default_factory=list)

    def __str__(self) -> str:
        return f"{self.kind}: layers={self.layers}"


@dataclass
class MatchedLayer:
    seq: int
    edge_id: int
    direction: int
    src: int
    dst: int
    snap_lon: float
    snap_lat: float
    hop_lons: np.ndarray  # geometry of the hop *into* this layer ([] for seq 0)
    hop_lats: np.ndarray


@dataclass
class MatchResult:
    layers: list[MatchedLayer]
    cost: int
    dropped_seqs: list[int] = field(default_factory=list)  # streaming-mode drops


def generate_layers(net: CellNetwork, lons, lats, opts: MatchOptions) -> list[Layer]:
    """Candidate layers for every trajectory point (standard generator)."""
    out = []
    for lon, lat in zip(np.asarray(lons, dtype=np.float64), np.asarray(lats, dtype=np.float64)):
        rows, frac, px, py, dist = net.candidates_at(float(lon), float(lat), opts.search_distance_m)
        out.append(
            Layer(
                edge_rows=rows,
                frac=frac,
                pos_lon=np.asarray(px, dtype=np.float64),
                pos_lat=np.asarray(py, dtype=np.float64),
                dist_m=np.asarray(dist, dtype=np.float64),
                emission=emission_cost(dist, opts.emission_error_m) if rows.size else np.empty(0, np.uint32),
            )
        )
    return out


def _predicates(net: CellNetwork, root_idx: int, threshold_cm: float):
    """Predicate-cache lookup: bounded Dijkstra parent map per root, computed
    once and shared across boundaries/trajectories on the same network
    (``primitives/cache.rs:224-327``; bound 8192 entries, ``cache.rs:19``)."""
    hit = net._pred_cache.get(root_idx)
    if hit is None:
        hit = bounded_dijkstra(net.csr, root_idx, threshold_cm)
        if len(net._pred_cache) >= 8192:
            net._pred_cache.pop(next(iter(net._pred_cache)))
        net._pred_cache[root_idx] = hit
    return hit


@dataclass
class _PathInfo:
    """Memoized routed hop between a (root, leaf) node-index pair: the
    parent-pointer walk plus precomputed interior geometry."""

    nodes: np.ndarray  # node idx path root..leaf inclusive
    lons: np.ndarray
    lats: np.ndarray
    length_m: float  # Σ pairwise haversine over the path nodes
    headings: list  # interior pair headings, <1 m pairs dropped (entity.rs:155-167)


class _TrajectoryContext:
    """Per-trajectory weigher state: candidate layers + the (root, leaf)
    path cache shared by weighing and collapse-time hop re-derivation."""

    def __init__(self, net: CellNetwork, layers: list[Layer], opts: MatchOptions):
        self.net = net
        self.layers = layers
        self.opts = opts
        self.paths: dict[tuple[int, int], _PathInfo | None] = {}

    def path_info(self, root: int, leaf: int) -> _PathInfo | None:
        key = (root, leaf)
        if key in self.paths:
            return self.paths[key]
        parents, _ = _predicates(self.net, root, self.opts.threshold_cm)
        p = parent_path(parents, root, leaf)
        if p is None:
            info = None
        else:
            nodes = np.asarray(p, dtype=np.int64)
            lons = self.net.csr.node_lon[nodes]
            lats = self.net.csr.node_lat[nodes]
            if nodes.size > 1:
                d = haversine_m(lons[:-1], lats[:-1], lons[1:], lats[1:])
                length = float(d.sum())
                hb = bearing_deg(lons[:-1], lats[:-1], lons[1:], lats[1:])
                headings = hb[d >= 1.0].tolist()
            else:
                length = 0.0
                headings = []
            info = _PathInfo(nodes, lons, lats, length, headings)
        self.paths[key] = info
        return info

    # -- boundary weighing ------------------------------------------------

    def _pair_indices(self, b: int) -> tuple[np.ndarray, np.ndarray]:
        """(fi, ti) pair index arrays — full grid (AllCompute) or the k
        nearest targets per source (Selective, ``selective.rs:69-88``)."""
        F, T = self.layers[b], self.layers[b + 1]
        nF, nT = F.edge_rows.size, T.edge_rows.size
        k = self.opts.fanout
        if k is None or nT <= k:
            return np.repeat(np.arange(nF), nT), np.tile(np.arange(nT), nF)
        fis, tis = [], []
        for si in range(nF):
            d = haversine_m(F.pos_lon[si], F.pos_lat[si], T.pos_lon, T.pos_lat)
            sel = np.sort(np.argpartition(d, k)[:k])
            fis.append(np.full(sel.size, si))
            tis.append(sel)
        return np.concatenate(fis), np.concatenate(tis)

    def weigh_boundary(self, b: int) -> np.ndarray:
        net = self.net
        F, T = self.layers[b], self.layers[b + 1]
        fi, ti = self._pair_indices(b)
        s_row = F.edge_rows[fi]
        t_row = T.edge_rows[ti]
        s_lon, s_lat = F.pos_lon[fi], F.pos_lat[fi]
        t_lon, t_lat = T.pos_lon[ti], T.pos_lat[ti]

        straight = haversine_m(s_lon, s_lat, t_lon, t_lat)
        direct = (s_row == t_row) & (F.frac[fi] <= T.frac[ti])

        root = net.dst_idx[s_row]
        leaf = net.src_idx[t_row]
        root_lon, root_lat = net.csr.node_lon[root], net.csr.node_lat[root]
        leaf_lon, leaf_lat = net.csr.node_lon[leaf], net.csr.node_lat[leaf]
        tail_s = haversine_m(s_lon, s_lat, root_lon, root_lat)
        tail_t = haversine_m(leaf_lon, leaf_lat, t_lon, t_lat)
        b_sp = bearing_deg(s_lon, s_lat, root_lon, root_lat)  # s_pos → path[0]
        b_pt = bearing_deg(leaf_lon, leaf_lat, t_lon, t_lat)  # path[-1] → t_pos
        b_st = bearing_deg(s_lon, s_lat, t_lon, t_lat)  # direct mid heading

        h_s = net.heading[s_row]
        h_t = net.heading[t_row]
        cont = net.weight[s_row].astype(np.float64) / net.weight[t_row].astype(np.float64)

        # resolve paths (memoized across boundaries)
        n_pairs = fi.size
        infos: list[_PathInfo | None] = [None] * n_pairs
        direct_l = direct.tolist()
        for p in range(n_pairs):
            if not direct_l[p]:
                infos[p] = self.path_info(int(root[p]), int(leaf[p]))

        # scalar fold for the ragged angular-complexity term
        hs_l, ht_l = h_s.tolist(), h_t.tolist()
        bsp_l, bpt_l, bst_l = b_sp.tolist(), b_pt.tolist(), b_st.tolist()
        ts_l, tt_l, st_l = tail_s.tolist(), tail_t.tolist(), straight.tolist()
        turn = np.ones(n_pairs, dtype=np.float64)
        reachable = np.zeros(n_pairs, dtype=bool)
        for p in range(n_pairs):
            headings = []
            if direct_l[p]:
                if not math.isnan(hs_l[p]):
                    headings.append(hs_l[p])
                if st_l[p] >= 1.0:
                    headings.append(bst_l[p])
                if not math.isnan(ht_l[p]):
                    headings.append(ht_l[p])
            else:
                info = infos[p]
                if info is None:
                    continue
                if not math.isnan(hs_l[p]):
                    headings.append(hs_l[p])
                if ts_l[p] >= 1.0:
                    headings.append(bsp_l[p])
                headings.extend(info.headings)
                if tt_l[p] >= 1.0:
                    headings.append(bpt_l[p])
                if not math.isnan(ht_l[p]):
                    headings.append(ht_l[p])
            reachable[p] = True
            turn[p] = _complexity(headings)

        # route length + deviance (transition.rs:200-238)
        i_len = np.asarray([inf.length_m if inf is not None else 0.0 for inf in infos])
        route_len = np.where(direct, straight, i_len + tail_s + tail_t)
        with np.errstate(divide="ignore", invalid="ignore"):
            dev = np.where(route_len > 0.0, straight / route_len, 1.0)

        # combined score → u32 cost (costing/default.rs:137-173, util.rs:29-39)
        score = np.sqrt(
            np.clip(dev, 1e-6, 1.0) * np.clip(turn, 1e-6, 1.0) * np.clip(cont, 1e-6, 1.0)
        )
        cost = np.minimum((100.0 / np.clip(score, 1e-6, 1.0)).astype(np.int64), MAX_WEIGHT)

        mat = np.full((F.edge_rows.size, T.edge_rows.size), int(NO_EDGE), dtype=np.int64)
        mat[fi[reachable], ti[reachable]] = cost[reachable]
        return mat

    def hop_geometry(self, li: int, si: int, lj: int, ti: int):
        """Interpolated geometry of one hop: source position, path nodes,
        target position — consecutive duplicates removed
        (``candidate/route.rs:46-139``)."""
        net = self.net
        F, T = self.layers[li], self.layers[lj]
        s_row, t_row = int(F.edge_rows[si]), int(T.edge_rows[ti])
        s_lon, s_lat = float(F.pos_lon[si]), float(F.pos_lat[si])
        t_lon, t_lat = float(T.pos_lon[ti]), float(T.pos_lat[ti])
        direct = s_row == t_row and F.frac[si] <= T.frac[ti]
        if direct:
            lons = np.array([s_lon, t_lon])
            lats = np.array([s_lat, t_lat])
        else:
            info = self.path_info(int(net.dst_idx[s_row]), int(net.src_idx[t_row]))
            if info is None:
                lons = np.array([s_lon, t_lon])
                lats = np.array([s_lat, t_lat])
            else:
                lons = np.concatenate(([s_lon], info.lons, [t_lon]))
                lats = np.concatenate(([s_lat], info.lats, [t_lat]))
        if lons.size > 1:
            keep = np.concatenate(([True], (np.diff(lons) != 0) | (np.diff(lats) != 0)))
            lons, lats = lons[keep], lats[keep]
        return lons, lats


def _complexity(headings: list) -> float:
    """Harmonic-mean turn score over a heading sequence — scalar port of
    ``complexity_from_deltas`` (``map_path/entity.rs:269-296``): wrap deltas
    to (-180, 180], cost = clamp(cos(delta·π/180·0.8), 0, 1), any zero
    (≥112.5° turn) zeroes the path, else harmonic mean clamped to [0, 1]."""
    n = len(headings)
    if n < 2:
        return 1.0
    inv_sum = 0.0
    prev = headings[0]
    for i in range(1, n):
        h = headings[i]
        d = math.fmod(h - prev, 360.0)
        if d > 180.0:
            d -= 360.0
        elif d <= -180.0:
            d += 360.0
        c = math.cos(d * _COS_K)
        if c <= 0.0:
            return 0.0
        if c > 1.0:
            c = 1.0
        inv_sum += 1.0 / c
        prev = h
    v = (n - 1) / inv_sum
    return 1.0 if v > 1.0 else (0.0 if v < 0.0 else v)


def weigh_trellis(net: CellNetwork, layers: list[Layer], opts: MatchOptions) -> Trellis:
    """Build the trellis: emissions as node weights, transitions as boundary
    matrices; all-NO_EDGE boundaries left pending (the gap record)."""
    ctx = _TrajectoryContext(net, layers, opts)
    t = _weigh(ctx)
    return t


def _weigh(ctx: _TrajectoryContext) -> Trellis:
    layers = ctx.layers
    t = Trellis.new([ly.edge_rows.size for ly in layers])
    for i, ly in enumerate(layers):
        t.fill_nodes(i, np.minimum(ly.emission.astype(np.int64), MAX_WEIGHT))
    for b in range(len(layers) - 1):
        mat = ctx.weigh_boundary(b)
        if (mat != int(NO_EDGE)).any():
            t.fill_transition(b, mat)
    return t


def match_trajectory(net: CellNetwork, lons, lats, opts: MatchOptions | None = None) -> MatchResult:
    """Match one trajectory against a network. Raises :class:`MatchError`
    for unanchored (batch mode) / disconnected / unreachable trips."""
    opts = opts or MatchOptions()
    lons = np.asarray(lons, dtype=np.float64)
    lats = np.asarray(lats, dtype=np.float64)
    seqs = np.arange(lons.size)

    layers = generate_layers(net, lons, lats, opts)
    empty = [i for i, ly in enumerate(layers) if ly.edge_rows.size == 0]
    dropped: list[int] = []
    if empty:
        if opts.drop_unanchored:
            # streaming mode: drop unanchored points (realtime/bin/matcher.rs:143-157)
            dropped = empty
            keep = [i for i in range(len(layers)) if i not in set(empty)]
            layers = [layers[i] for i in keep]
            seqs = seqs[keep]
            if not layers:
                raise MatchError("unanchored", empty)
        else:
            # batch mode: whole-batch reject listing every unanchored point
            # (matcher/entity.rs:166-193)
            raise MatchError("unanchored", empty)

    ctx = _TrajectoryContext(net, layers, opts)
    trellis = _weigh(ctx)
    pending = trellis.pending_boundaries()
    if pending:
        raise MatchError("disconnected", frontier_collapse(trellis))
    try:
        nodes, cost = viterbi_solve(trellis)
    except UnreachableError:
        raise MatchError("disconnected", frontier_collapse(trellis)) from None

    out: list[MatchedLayer] = []
    for k, (ly, ni) in enumerate(zip(layers, nodes)):
        row = int(ly.edge_rows[ni])
        if k == 0:
            hop_lons = np.empty(0)
            hop_lats = np.empty(0)
        else:
            hop_lons, hop_lats = ctx.hop_geometry(k - 1, int(nodes[k - 1]), k, int(ni))
        out.append(
            MatchedLayer(
                seq=int(seqs[k]),
                edge_id=int(net.edge_id[row]),
                direction=int(net.dir[row]),
                src=int(net.src[row]),
                dst=int(net.dst[row]),
                snap_lon=float(ly.pos_lon[ni]),
                snap_lat=float(ly.pos_lat[ni]),
                hop_lons=hop_lons,
                hop_lats=hop_lats,
            )
        )
    return MatchResult(layers=out, cost=int(cost), dropped_seqs=dropped)
