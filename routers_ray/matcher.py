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

Physical layout (decoupled from the semantics above): all candidate layers
of a trajectory live in flat arrays; every boundary's pairs are weighed in
ONE vectorized pass (straightline, virtual tails, bearings, continuity and
the optional-heading angular-complexity fold are whole-trajectory NumPy);
routed (root, leaf) paths are resolved once, geometry batched, and memoized
across boundaries — trajectories revisit the same hops.
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
    INF_W,
    MAX_WEIGHT,
    NO_EDGE,
    Trellis,
    UnreachableError,
    frontier_collapse,
    viterbi_solve,
)

DEFAULT_FANOUT = 16  # weigh/selective.rs:20
_COS_K = math.pi / 180.0 * 0.8  # COST_DAMPING compression (entity.rs:271-276)

# dispatch flag for the compiled per-pair cost kernel (tests force the
# NumPy path by flipping this to A/B the two)
_USE_WEIGH_CKERNEL = True


@dataclass
class MatchOptions:
    search_distance_m: float = DEFAULT_SEARCH_DISTANCE_M
    emission_error_m: float = DEFAULT_EMISSION_ERROR_M
    threshold_cm: float = DEFAULT_THRESHOLD_CM
    fanout: int | None = None  # None = AllCompute; k = Selective (selective.rs:20-89)
    # adaptive candidate reduction: keep only the k nearest candidates per
    # point (ties on original (edge_id, dir) order). OPT-IN — it changes
    # results, so it ships with its own oracled query (`match_capped`),
    # never as a default. Cuts the weigh kernel's pair count ~quadratically
    # in dense-city layers (the NOTES "adaptive radius" lever).
    max_candidates: int | None = None
    drop_unanchored: bool = False  # streaming mode drops, batch mode rejects
    max_layers: int | None = None  # Trip::tail windowing bound
    compute_convergence: bool = False  # report the safe stream-emit cut layer
    # runtime transport config (OsmTripConfiguration analogue): picks the
    # precomputed per-mode access mask and, optionally, speed-limit-derived
    # edge weights (metadata.py / costing.speed_weight)
    transport_mode: str | None = None
    use_speed: bool = False
    # --- user-extension surface (the reference's injection traits) -------
    # generator(net, lons, lats, opts) -> list[Layer]   (LayerGeneration,
    #   layer/generation/mod.rs:27-45)
    # emission(dist_m, opts) -> uint32 costs            (EmissionStrategy,
    #   costing/mod.rs:23-61)
    # weigher(ctx) -> Trellis                           (Weigher,
    #   weigh/mod.rs:35-50; the built-in Selective variant is the `fanout`
    #   knob — variant.rs:19-33)
    # solver: "viterbi" | "brute" | callable(trellis) -> (nodes, cost)
    #   (Solve, solver/mod.rs:13-15)
    # Callables must be module-level (they ride pickled actor kwargs).
    generator: object = None
    emission: object = None
    weigher: object = None
    solver: object = "viterbi"


@dataclass
class Layer:
    """One observation's candidate set (views into the trajectory's flat
    candidate arrays)."""

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
    converged_layer: int | None = None  # latest prefix-stable layer (viterbi.rs:164-247)


def _cap_candidates(offsets, rows, frac, px, py, dist, cap: int | None):
    """Keep the ``cap`` nearest candidates per layer (stable (dist,
    original-order) selection, kept elements stay in original ascending
    (edge_id, dir) order). Fully vectorized: one lexsort over all
    candidates, no per-layer Python loop."""
    sizes = np.diff(offsets)
    if cap is None or sizes.size == 0 or (sizes.size and sizes.max() <= cap):
        return offsets, rows, frac, px, py, dist
    n = rows.size
    layer_of = np.repeat(np.arange(sizes.size, dtype=np.int64), sizes)
    idx = np.arange(n, dtype=np.int64)
    perm = np.lexsort((idx, dist, layer_of))  # layer, then dist, then order
    # rank within the layer along the sorted permutation (layer blocks in
    # perm are contiguous and keep their sizes)
    starts = np.concatenate(([0], np.cumsum(sizes)))
    rank_sorted = np.arange(n, dtype=np.int64) - np.repeat(starts[:-1], sizes)
    keep = np.ones(n, dtype=bool)
    keep[perm[rank_sorted >= cap]] = False
    new_sizes = np.minimum(sizes, cap)
    new_offsets = np.concatenate(([0], np.cumsum(new_sizes))).astype(np.int64)
    return new_offsets, rows[keep], frac[keep], px[keep], py[keep], dist[keep]


def generate_layers(net: CellNetwork, lons, lats, opts: MatchOptions) -> list[Layer]:
    """Candidate layers for every trajectory point (standard generator) —
    one batched geometric pass for the whole trajectory. A custom
    ``opts.generator`` replaces the whole stage; a custom ``opts.emission``
    replaces only the cost kernel."""
    if opts.generator is not None:
        return opts.generator(net, lons, lats, opts)
    lons = np.asarray(lons, dtype=np.float64)
    lats = np.asarray(lats, dtype=np.float64)
    offsets, rows, frac, px, py, dist = net.candidates_batch(lons, lats, opts.search_distance_m)
    offsets, rows, frac, px, py, dist = _cap_candidates(
        offsets, rows, frac, px, py, dist, opts.max_candidates
    )
    emis_fn = opts.emission if opts.emission is not None else (
        lambda d, o: emission_cost(d, o.emission_error_m)
    )
    emis = np.asarray(emis_fn(dist, opts), dtype=np.uint32) if rows.size else np.empty(0, np.uint32)
    out = []
    for i in range(lons.size):
        lo, hi = offsets[i], offsets[i + 1]
        out.append(
            Layer(
                edge_rows=rows[lo:hi],
                frac=frac[lo:hi],
                pos_lon=px[lo:hi],
                pos_lat=py[lo:hi],
                dist_m=dist[lo:hi],
                emission=emis[lo:hi],
            )
        )
    return out


def _solve(trellis, opts: MatchOptions):
    """Solver dispatch — the ``Solve`` injection point (solver/mod.rs)."""
    if callable(opts.solver):
        return opts.solver(trellis)
    if opts.solver == "brute":
        from .trellis import brute_force_solve

        nodes, cost = brute_force_solve(trellis)
        return np.asarray(nodes, dtype=np.int64), cost
    return viterbi_solve(trellis)


def _predicates(net: CellNetwork, root_idx: int, threshold_cm: float):
    """Predicate-cache lookup: bounded Dijkstra parent map per root, computed
    once and shared across boundaries/trajectories on the same network
    (``primitives/cache.rs:224-327``; bound 8192 entries, ``cache.rs:19``)."""
    hit = net._pred_cache.get(root_idx)
    if hit is not None:
        # true LRU: refresh recency on hit so hot roots survive eviction
        net._pred_cache[root_idx] = net._pred_cache.pop(root_idx)
    else:
        hit = bounded_dijkstra(net.csr, root_idx, threshold_cm)
        if len(net._pred_cache) >= 8192:
            net._pred_cache.pop(next(iter(net._pred_cache)))
        net._pred_cache[root_idx] = hit
    return hit


@dataclass
class _PathInfo:
    """Memoized routed hop between a (root, leaf) node-index pair: the
    parent-pointer walk, interior geometry, and the precomputed
    angular-complexity partials of the interior heading chain."""

    nodes: np.ndarray  # node idx path root..leaf inclusive
    lons: np.ndarray
    lats: np.ndarray
    length_m: float  # Σ pairwise haversine over the path nodes
    h_first: float  # first interior heading (NaN if none ≥1 m apart)
    h_last: float
    h_invsum: float  # Σ 1/cos over interior deltas
    h_zero: bool  # any interior turn ≥ 112.5°
    h_cnt: int  # number of interior deltas


class _TrajectoryContext:
    """Per-trajectory weigher state: candidate layers + the (root, leaf)
    path cache shared by weighing and collapse-time hop re-derivation."""

    def __init__(self, net: CellNetwork, layers: list[Layer], opts: MatchOptions):
        self.net = net
        self.layers = layers
        self.opts = opts
        # shared across trajectories on the same network (routed paths are
        # position-independent); bounded like the predicate cache
        if len(net._path_cache) > 65536:
            net._path_cache.clear()
        self.paths: dict[int, _PathInfo | None] = net._path_cache

    # -- batched path resolution ------------------------------------------

    def _resolve_new(self, keys: list[int]) -> None:
        """Resolve a batch of new (root<<32|leaf) keys: parent walks per
        root, then ONE geometry pass over the concatenated path nodes."""
        net = self.net
        paths = self.paths
        walks: list[tuple[int, list[int] | None]] = []
        by_root: dict[int, list[int]] = {}
        for k in keys:
            by_root.setdefault(k >> 32, []).append(k & 0xFFFFFFFF)
        for root, leaves in by_root.items():
            parents, _ = _predicates(net, root, self.opts.threshold_cm)
            for leaf in leaves:
                walks.append(((root << 32) | leaf, parent_path(parents, root, leaf)))

        flat_nodes: list[int] = []
        spans: list[tuple[int, int, int]] = []  # (key, start, stop) for found walks
        for k, p in walks:
            if p is None:
                paths[k] = None
            else:
                spans.append((k, len(flat_nodes), len(flat_nodes) + len(p)))
                flat_nodes.extend(p)
        if not spans:
            return
        nodes_arr = np.asarray(flat_nodes, dtype=np.int64)
        f_lon = net.csr.node_lon[nodes_arr]
        f_lat = net.csr.node_lat[nodes_arr]
        # segment metrics over the whole flat array; per-path slices below
        seg_d = haversine_m(f_lon[:-1], f_lat[:-1], f_lon[1:], f_lat[1:]) if nodes_arr.size > 1 else np.empty(0)
        seg_b = bearing_deg(f_lon[:-1], f_lat[:-1], f_lon[1:], f_lat[1:]) if nodes_arr.size > 1 else np.empty(0)
        for k, lo, hi in spans:
            nn = hi - lo
            nodes = nodes_arr[lo:hi]
            lons = f_lon[lo:hi]
            lats = f_lat[lo:hi]
            if nn > 1:
                d = seg_d[lo : hi - 1]
                hb = seg_b[lo : hi - 1]
                length = float(d.sum())
                headings = hb[d >= 1.0].tolist()
            else:
                length = 0.0
                headings = []
            h_invsum, h_zero, h_cnt = 0.0, False, 0
            for i in range(1, len(headings)):
                dd = math.fmod(headings[i] - headings[i - 1], 360.0)
                if dd > 180.0:
                    dd -= 360.0
                elif dd <= -180.0:
                    dd += 360.0
                c = math.cos(dd * _COS_K)
                if c <= 0.0:
                    h_zero = True
                else:
                    h_invsum += 1.0 / min(c, 1.0)
                h_cnt += 1
            paths[k] = _PathInfo(
                nodes,
                lons,
                lats,
                length,
                headings[0] if headings else float("nan"),
                headings[-1] if headings else float("nan"),
                h_invsum,
                h_zero,
                h_cnt,
            )

    def path_info(self, root: int, leaf: int) -> _PathInfo | None:
        key = (root << 32) | leaf
        if key not in self.paths:
            self._resolve_new([key])
        return self.paths[key]

    # -- whole-trajectory weighing ----------------------------------------

    def weigh_all(self) -> Trellis:
        layers = self.layers
        L = len(layers)
        widths = [ly.edge_rows.size for ly in layers]
        t = Trellis.new(widths)
        for i, ly in enumerate(layers):
            # emissions already clamped to MAX_WEIGHT by the minimum
            t.fill_nodes(i, np.minimum(ly.emission.astype(np.int64), MAX_WEIGHT), validate=False)
        if L < 2:
            return t
        loff = np.concatenate(([0], np.cumsum(widths))).astype(np.int64)
        c_row = np.concatenate([ly.edge_rows for ly in layers])
        c_frac = np.concatenate([ly.frac for ly in layers])
        c_lon = np.concatenate([ly.pos_lon for ly in layers])
        c_lat = np.concatenate([ly.pos_lat for ly in layers])
        bf = np.arange(L - 1, dtype=np.int64)
        mats = _weigh_kernel(self, c_row, c_frac, c_lon, c_lat, loff, bf)
        for b, mat in mats.items():
            t.set_resolved(int(b), mat)  # already INF_W-normalized int64
        return t

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
        info = None
        if not direct:
            info = self.path_info(int(net.dst_idx[s_row]), int(net.src_idx[t_row]))
        if info is None:
            # direct / unroutable hop: two points (one if coincident)
            if s_lon == t_lon and s_lat == t_lat:
                return np.array([s_lon]), np.array([s_lat])
            return np.array([s_lon, t_lon]), np.array([s_lat, t_lat])
        lons = np.concatenate(([s_lon], info.lons, [t_lon]))
        lats = np.concatenate(([s_lat], info.lats, [t_lat]))
        # consecutive-duplicate seam dedup (route.rs:129) — sliced ufunc
        # compares, not np.diff wrappers (hot path: one call per hop)
        keep = np.empty(lons.size, dtype=bool)
        keep[0] = True
        np.logical_or(lons[1:] != lons[:-1], lats[1:] != lats[:-1], out=keep[1:])
        return lons[keep], lats[keep]

    def hops_for_chosen(self, rows, frac, lons, lats):
        """Vectorized :meth:`hop_geometry` over a whole chosen path.

        ``rows/frac/lons/lats`` are the chosen candidate per layer; returns
        ``(flat_lons, flat_lats, lengths)`` covering the ``L-1`` hops in
        order — identical values to per-hop calls (pure gathers + the same
        consecutive-duplicate dedup with each hop's first point forced
        kept), assembled with one allocation instead of one call per hop.
        """
        H = rows.size - 1
        if H <= 0:
            return np.empty(0), np.empty(0), np.empty(0, dtype=np.int64)
        net = self.net
        s_row, t_row = rows[:-1], rows[1:]
        direct = (s_row == t_row) & (frac[:-1] <= frac[1:])
        s_lon, s_lat = lons[:-1], lats[:-1]
        t_lon, t_lat = lons[1:], lats[1:]
        infos = [None] * H
        for h in np.flatnonzero(~direct).tolist():
            infos[h] = self.path_info(
                int(net.dst_idx[s_row[h]]), int(net.src_idx[t_row[h]])
            )
        lens = np.full(H, 2, dtype=np.int64)
        coincident = (s_lon == t_lon) & (s_lat == t_lat)
        for h, info in enumerate(infos):
            if info is not None:
                lens[h] = 2 + info.lons.size
            elif coincident[h]:
                lens[h] = 1
        offs = np.concatenate(([0], np.cumsum(lens)))
        total = int(offs[-1])
        fl = np.empty(total)
        fa = np.empty(total)
        starts = offs[:-1]
        fl[starts] = s_lon
        fa[starts] = s_lat
        multi = lens >= 2
        ends = offs[1:] - 1
        fl[ends[multi]] = t_lon[multi]
        fa[ends[multi]] = t_lat[multi]
        for h, info in enumerate(infos):
            if info is not None and info.lons.size:
                a = int(starts[h]) + 1
                fl[a : a + info.lons.size] = info.lons
                fa[a : a + info.lons.size] = info.lats
        # consecutive-duplicate seam dedup (route.rs:129): one global
        # compare; forcing hop starts kept makes it exactly the per-hop
        # dedup (cross-hop comparisons can only affect forced positions)
        keep = np.empty(total, dtype=bool)
        keep[0] = True
        np.logical_or(fl[1:] != fl[:-1], fa[1:] != fa[:-1], out=keep[1:])
        keep[starts] = True
        new_lens = np.add.reduceat(keep.astype(np.int64), starts)
        return fl[keep], fa[keep], new_lens


def _chosen_arrays(layers, nodes):
    """Per-layer chosen candidate gathers → (rows, frac, lons, lats)."""
    L = len(layers)
    rows = np.empty(L, dtype=np.int64)
    frac = np.empty(L)
    lons = np.empty(L)
    lats = np.empty(L)
    for k, (ly, ni) in enumerate(zip(layers, nodes)):
        rows[k] = ly.edge_rows[ni]
        frac[k] = ly.frac[ni]
        lons[k] = ly.pos_lon[ni]
        lats[k] = ly.pos_lat[ni]
    return rows, frac, lons, lats


def _weigh_kernel(ctx: "_TrajectoryContext", c_row, c_frac, c_lon, c_lat, loff, bf):
    """The vectorized weigher over an explicit boundary map.

    ``loff`` positions each global layer inside the flat candidate arrays;
    ``bf[i]`` is the from-layer of boundary i (its to-layer is ``bf[i]+1`` —
    per-doc layers are contiguous, boundaries never cross doc junctions).
    Returns {boundary_index_in_bf → dense int64 matrix} for boundaries with
    at least one reachable pair (all-NO_EDGE boundaries stay pending — the
    gap record, weigh/mod.rs:160-163). Semantics identical to the per-pair
    reference path (see module docstring); this is purely the physical form
    that lets one call weigh every boundary of every doc in a batch.
    """
    net = ctx.net
    opts = ctx.opts
    n_bounds = bf.size
    w = np.diff(loff)
    nF_b = w[bf]
    nT_b = w[bf + 1]

    k = opts.fanout
    complete = k is None or int(nT_b.max(initial=0)) <= k
    if complete:
        counts = nF_b * nT_b
        total = int(counts.sum())
        BB = np.repeat(np.arange(n_bounds, dtype=np.int64), counts)
        pstart = np.concatenate(([0], np.cumsum(counts)[:-1]))
        local = np.arange(total, dtype=np.int64) - pstart[BB]
        r_nT = nT_b[BB]
        FI = loff[bf[BB]] + local // r_nT
        TI = loff[bf[BB] + 1] + local % r_nT
    else:
        FI_l, TI_l, BB_l = [], [], []
        for i in range(n_bounds):
            b = int(bf[i])
            nF, nT = int(w[b]), int(w[b + 1])
            if nT <= k:
                fi = np.repeat(np.arange(nF), nT)
                ti = np.tile(np.arange(nT), nF)
            else:
                # Selective: k nearest targets per source by candidate
                # position haversine (selective.rs:69-88)
                flo, fhi = loff[b], loff[b + 1]
                tlo, thi = loff[b + 1], loff[b + 2]
                d = haversine_m(
                    c_lon[flo:fhi, None], c_lat[flo:fhi, None],
                    c_lon[None, tlo:thi], c_lat[None, tlo:thi],
                )
                sel = np.sort(np.argpartition(d, k - 1, axis=1)[:, :k], axis=1)
                fi = np.repeat(np.arange(nF), k)
                ti = sel.ravel()
            FI_l.append(fi + loff[b])
            TI_l.append(ti + loff[b + 1])
            BB_l.append(np.full(fi.size, i, dtype=np.int64))
        FI = np.concatenate(FI_l)
        TI = np.concatenate(TI_l)
        BB = np.concatenate(BB_l)

    s_row, t_row = c_row[FI], c_row[TI]
    s_lon, s_lat = c_lon[FI], c_lat[FI]
    t_lon, t_lat = c_lon[TI], c_lat[TI]

    straight = haversine_m(s_lon, s_lat, t_lon, t_lat)
    direct = (s_row == t_row) & (c_frac[FI] <= c_frac[TI])

    root = net.dst_idx[s_row]
    leaf = net.src_idx[t_row]
    n_pairs = FI.size
    # tails feed route_len for every routed pair; the bearing legs only
    # for routed NON-adjacent pairs; the direct mid-heading only for
    # direct/adjacent — compute each on its subset (identical ufunc values
    # on identical inputs, just gathered) instead of three full-width
    # passes that are mostly thrown away
    adjacent = (~direct) & (root == leaf)
    r_idx = np.flatnonzero(~direct)  # routed (incl. adjacent): tails
    ra_idx = np.flatnonzero(~direct & ~adjacent)  # routed legs
    da_idx = np.flatnonzero(direct | adjacent)  # direct-style mid
    tail_s = np.zeros(n_pairs, dtype=np.float64)
    tail_t = np.zeros(n_pairs, dtype=np.float64)
    if r_idx.size:
        rr = root[r_idx]
        ll = leaf[r_idx]
        tail_s[r_idx] = haversine_m(
            s_lon[r_idx], s_lat[r_idx], net.csr.node_lon[rr], net.csr.node_lat[rr]
        )
        tail_t[r_idx] = haversine_m(
            net.csr.node_lon[ll], net.csr.node_lat[ll], t_lon[r_idx], t_lat[r_idx]
        )
    b_sp = np.full(n_pairs, np.nan)
    b_pt = np.full(n_pairs, np.nan)
    if ra_idx.size:
        rr = root[ra_idx]
        ll = leaf[ra_idx]
        b_sp[ra_idx] = bearing_deg(
            s_lon[ra_idx], s_lat[ra_idx], net.csr.node_lon[rr], net.csr.node_lat[rr]
        )  # s_pos → path[0]
        b_pt[ra_idx] = bearing_deg(
            net.csr.node_lon[ll], net.csr.node_lat[ll], t_lon[ra_idx], t_lat[ra_idx]
        )  # path[-1] → t_pos
    b_st = np.full(n_pairs, np.nan)
    if da_idx.size:
        b_st[da_idx] = bearing_deg(
            s_lon[da_idx], s_lat[da_idx], t_lon[da_idx], t_lat[da_idx]
        )  # direct mid heading

    h_s = net.heading[s_row]
    h_t = net.heading[t_row]
    cont = net.weight[s_row].astype(np.float64) / net.weight[t_row].astype(np.float64)

    # resolve routed paths once per unique (root, leaf)
    key = (root.astype(np.int64) << np.int64(32)) | leaf.astype(np.int64)
    routed_idx = r_idx
    ukeys, inv = np.unique(key[routed_idx], return_inverse=True)
    paths = ctx.paths
    new = [int(kk) for kk in ukeys.tolist() if kk not in paths]
    if new:
        ctx._resolve_new(new)

    nu = ukeys.size
    u_ok = np.zeros(nu, dtype=bool)
    u_len = np.zeros(nu, dtype=np.float64)
    u_hf = np.full(nu, np.nan)
    u_hl = np.full(nu, np.nan)
    u_hinv = np.zeros(nu, dtype=np.float64)
    u_hzero = np.zeros(nu, dtype=bool)
    u_hcnt = np.zeros(nu, dtype=np.int64)
    for j, kk in enumerate(ukeys.tolist()):
        info = paths[kk]
        if info is not None:
            u_ok[j] = True
            u_len[j] = info.length_m
            u_hf[j] = info.h_first
            u_hl[j] = info.h_last
            u_hinv[j] = info.h_invsum
            u_hzero[j] = info.h_zero
            u_hcnt[j] = info.h_cnt

    ok_r = np.zeros(n_pairs, dtype=bool)
    i_len = np.zeros(n_pairs, dtype=np.float64)
    blk_hf = np.full(n_pairs, np.nan)
    blk_hl = np.full(n_pairs, np.nan)
    blk_inv = np.zeros(n_pairs, dtype=np.float64)
    blk_zero = np.zeros(n_pairs, dtype=bool)
    blk_cnt = np.zeros(n_pairs, dtype=np.int64)
    if routed_idx.size:
        ok_r[routed_idx] = u_ok[inv]
        i_len[routed_idx] = u_len[inv]
        blk_hf[routed_idx] = u_hf[inv]
        blk_hl[routed_idx] = u_hl[inv]
        blk_inv[routed_idx] = u_hinv[inv]
        blk_zero[routed_idx] = u_hzero[inv]
        blk_cnt[routed_idx] = u_hcnt[inv]
    reachable = direct | ok_r

    # vectorized angular-complexity fold over the optional-heading chain
    # [h_s?, mid?, interior-block?, b_pt?, h_t?] (entity.rs:241-296).
    # Adjacent-edge routed hops (source.edge.target == target.edge.source)
    # have an EMPTY reference map_path (resolve.rs path_nodes on a zero-edge
    # walk), so their chain is the direct-style [h_s, b_st?, h_t] — NOT
    # s_pos→root / leaf→t_pos legs, which would price a corner turn at the
    # shared node the reference never sees.
    if _USE_WEIGH_CKERNEL:
        from . import _ckernels as _ck

        if _ck.have_ckernel():
            # compiled per-pair fold+combine — bit-identical (libm ufuncs
            # verified == numpy's on this platform; A/B-pinned in
            # tests/test_advice_fixes.py::test_c_weigh_cost_matches_numpy)
            cost = _ck.weigh_cost_c(
                h_s, b_st, b_sp, b_pt, blk_hf, blk_hl, blk_inv,
                blk_zero.astype(np.uint8), blk_cnt, h_t,
                straight, i_len, tail_s, tail_t,
                direct.astype(np.uint8), adjacent.astype(np.uint8),
                np.ascontiguousarray(cont), int(MAX_WEIGHT), _COS_K,
            )
            return _pack_boundary_mats(
                cost, reachable, complete, BB, FI, TI, bf, w, loff, n_bounds
            )
    mid = np.where(
        direct | adjacent,
        np.where(straight >= 1.0, b_st, np.nan),
        np.where(tail_s >= 1.0, b_sp, np.nan),
    )
    c_pt = np.where(direct | adjacent, np.nan, np.where(tail_t >= 1.0, b_pt, np.nan))
    prev = np.full(n_pairs, np.nan)
    inv_sum = np.zeros(n_pairs, dtype=np.float64)
    cnt = np.zeros(n_pairs, dtype=np.int64)
    zero = np.zeros(n_pairs, dtype=bool)

    def _step(x):
        # gather/scatter on the valid subset: A/B'd against full-width
        # masked ops (2.01 s vs 1.17 s per 300 docs — the masked variant
        # loses; deltas are sparse because block headings are often NaN).
        # prev's NaN check runs on the gathered subset (h_s is NaN only
        # for degenerate <1 m edges), not full width.
        idx = np.flatnonzero(~np.isnan(x))
        if idx.size:
            pv = prev[idx]
            ok = ~np.isnan(pv)
            didx = idx[ok]
            if didx.size:
                d = np.fmod(x[didx] - pv[ok], 360.0)
                d = np.where(d > 180.0, d - 360.0, d)
                d = np.where(d <= -180.0, d + 360.0, d)
                c = np.cos(d * _COS_K)
                bad = c <= 0.0
                zero[didx[bad]] = True
                good = ~bad
                inv_sum[didx[good]] += 1.0 / np.minimum(c[good], 1.0)
                cnt[didx] += 1
            prev[idx] = x[idx]

    prev[:] = h_s  # first chain entry (NaN only for degenerate edges)
    _step(mid)
    has_blk = ~np.isnan(blk_hf)
    _step(blk_hf)  # NaN outside blocks already
    inv_sum += blk_inv
    cnt += blk_cnt
    zero |= blk_zero
    prev = np.where(has_blk, blk_hl, prev)
    _step(c_pt)
    _step(h_t)

    with np.errstate(divide="ignore", invalid="ignore"):
        turn = np.where(cnt == 0, 1.0, np.clip(cnt / np.maximum(inv_sum, 1e-300), 0.0, 1.0))
    turn = np.where(zero, 0.0, turn)

    # route length + deviance (transition.rs:200-238)
    route_len = np.where(direct, straight, i_len + tail_s + tail_t)
    with np.errstate(divide="ignore", invalid="ignore"):
        dev = np.where(route_len > 0.0, straight / route_len, 1.0)

    # combined score → u32 cost (costing/default.rs:137-173, util.rs:29-39)
    score = np.sqrt(
        np.clip(dev, 1e-6, 1.0) * np.clip(turn, 1e-6, 1.0) * np.clip(cont, 1e-6, 1.0)
    )
    cost = np.minimum((100.0 / np.clip(score, 1e-6, 1.0)).astype(np.int64), MAX_WEIGHT)
    return _pack_boundary_mats(cost, reachable, complete, BB, FI, TI, bf, w, loff, n_bounds)


def _pack_boundary_mats(cost, reachable, complete, BB, FI, TI, bf, w, loff, n_bounds):
    """Flat per-pair costs → {boundary → dense int64 matrix} (BB sorted
    by construction; all-unreachable boundaries stay pending)."""
    bounds = np.searchsorted(BB, np.arange(n_bounds), side="left")
    bounds = np.append(bounds, BB.size)
    mats: dict[int, np.ndarray] = {}
    # matrices are emitted ALREADY INF_W-normalized (the fill_transition
    # NO_EDGE→INF_W convention applied once on the flat array) so the
    # trellis can adopt them via set_resolved with no per-boundary copy
    if complete:
        # AllCompute pairs are the full fi-major cross product — the dense
        # matrix IS a reshape of the flat cost with INF_W holes (one
        # vectorized where instead of a per-boundary allocate + scatter)
        full_cost = np.where(reachable, cost, np.int64(INF_W))
        # per-boundary reachability via one flat segment reduce (complete
        # boundaries are never empty: counts = nF*nT >= 1), replacing a
        # per-boundary .any() slice scan
        any_reach = np.add.reduceat(reachable.astype(np.int64), bounds[:-1]) > 0
        for i in range(n_bounds):
            if any_reach[i]:
                b = int(bf[i])
                mats[i] = full_cost[bounds[i]:bounds[i + 1]].reshape(
                    int(w[b]), int(w[b + 1])
                )
        return mats
    for i in range(n_bounds):
        lo, hi = bounds[i], bounds[i + 1]
        r = np.flatnonzero(reachable[lo:hi]) + lo
        if r.size:
            b = int(bf[i])
            mat = np.full((int(w[b]), int(w[b + 1])), int(INF_W), dtype=np.int64)
            mat[FI[r] - loff[b], TI[r] - loff[b + 1]] = cost[r]
            mats[i] = mat
    return mats


def _complexity(headings: list) -> float:
    """Harmonic-mean turn score over a heading sequence — scalar port of
    ``complexity_from_deltas`` (``map_path/entity.rs:269-296``). Kept as the
    reference implementation for the vectorized fold's unit tests."""
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
    return _TrajectoryContext(net, layers, opts).weigh_all()


def match_trajectory(net: CellNetwork, lons, lats, opts: MatchOptions | None = None) -> MatchResult:
    """Match one trajectory against a network. Raises :class:`MatchError`
    for unanchored (batch mode) / disconnected / unreachable trips."""
    opts = opts or MatchOptions()
    lons = np.asarray(lons, dtype=np.float64)
    lats = np.asarray(lats, dtype=np.float64)
    seqs = np.arange(lons.size)

    if opts.max_layers is not None and lons.size > opts.max_layers:
        # Trip::tail windowing: bound memory by keeping the last n layers
        # (trip.rs:122-148); seq numbering keeps the global indices
        lons = lons[-opts.max_layers :]
        lats = lats[-opts.max_layers :]
        seqs = seqs[-opts.max_layers :]

    layers = generate_layers(net, lons, lats, opts)
    empty = [i for i, ly in enumerate(layers) if ly.edge_rows.size == 0]
    empty_seqs = [int(seqs[i]) for i in empty]
    dropped: list[int] = []
    if empty:
        if opts.drop_unanchored:
            # streaming mode: drop unanchored points (realtime/bin/matcher.rs:143-157)
            dropped = empty_seqs
            keep = [i for i in range(len(layers)) if i not in set(empty)]
            layers = [layers[i] for i in keep]
            seqs = seqs[keep]
            if not layers:
                raise MatchError("unanchored", empty_seqs)
        else:
            # batch mode: whole-batch reject listing every unanchored point
            # (matcher/entity.rs:166-193)
            raise MatchError("unanchored", empty_seqs)

    ctx = _TrajectoryContext(net, layers, opts)
    trellis = opts.weigher(ctx) if opts.weigher is not None else ctx.weigh_all()
    pending = trellis.pending_boundaries()
    if pending:
        raise MatchError("disconnected", frontier_collapse(trellis))
    try:
        nodes, cost = _solve(trellis, opts)
    except UnreachableError:
        raise MatchError("disconnected", frontier_collapse(trellis)) from None

    conv: int | None = None
    if opts.compute_convergence:
        # the safe streaming emit/cut point — one extra forward pass
        # (viterbi.rs:164-247; used at realtime/bin/matcher.rs:200-207)
        from .trellis import convergence as _convergence

        conv = _convergence(trellis)

    ch_rows, ch_frac, ch_lons, ch_lats = _chosen_arrays(layers, nodes)
    fl, fa, hop_lens = ctx.hops_for_chosen(ch_rows, ch_frac, ch_lons, ch_lats)
    hoffs = np.concatenate(([0], np.cumsum(hop_lens)))
    hl = [fl[hoffs[i]:hoffs[i + 1]] for i in range(hop_lens.size)]
    ha = [fa[hoffs[i]:hoffs[i + 1]] for i in range(hop_lens.size)]
    _E = np.empty(0)
    out: list[MatchedLayer] = []
    for k in range(len(layers)):
        row = int(ch_rows[k])
        out.append(
            MatchedLayer(
                seq=int(seqs[k]),
                edge_id=int(net.edge_id[row]),
                direction=int(net.dir[row]),
                src=int(net.src[row]),
                dst=int(net.dst[row]),
                snap_lon=float(ch_lons[k]),
                snap_lat=float(ch_lats[k]),
                hop_lons=_E if k == 0 else hl[k - 1],
                hop_lats=_E if k == 0 else ha[k - 1],
            )
        )
    return MatchResult(layers=out, cost=int(cost), dropped_seqs=dropped, converged_layer=conv)


def interpolated_path(result: MatchResult) -> tuple[np.ndarray, np.ndarray]:
    """The full driven geometry of a match — ``RoutedPath.interpolated``
    (``candidate/route.rs:21-39,181-190``): hop geometries concatenated in
    layer order with consecutive-duplicate seam points removed
    (``route.rs:129``, ``collapse.rs:88-97``)."""
    lons_parts = [ml.hop_lons for ml in result.layers if ml.hop_lons.size]
    lats_parts = [ml.hop_lats for ml in result.layers if ml.hop_lats.size]
    if not lons_parts:
        if result.layers:
            return (
                np.asarray([result.layers[0].snap_lon]),
                np.asarray([result.layers[0].snap_lat]),
            )
        return np.empty(0), np.empty(0)
    lons = np.concatenate(lons_parts)
    lats = np.concatenate(lats_parts)
    keep = np.concatenate(([True], (np.diff(lons) != 0) | (np.diff(lats) != 0)))
    return lons[keep], lats[keep]


def match_trajectories(
    net: CellNetwork, docs: list, opts: MatchOptions | None = None
) -> list:
    """Match many trajectories against ONE network in a single weigh pass.

    ``docs`` is a list of (lons, lats) array pairs. Returns a list aligned
    with the input: :class:`MatchResult` per matched doc or
    :class:`MatchError` per failed doc. Semantics are identical to calling
    :func:`match_trajectory` per doc (same kernel, same caches); the batch
    form exists so one actor call amortizes candidate generation and the
    weigh kernel across every doc in a batch — docs with unanchored points
    or streaming drops fall back to the per-doc path.
    """
    opts = opts or MatchOptions()
    n_docs = len(docs)
    results: list = [None] * n_docs

    if (
        opts.generator is not None
        or opts.emission is not None
        or opts.weigher is not None
        or opts.solver != "viterbi"
    ):
        # injected stages → the per-doc path honors them directly; the
        # batched kernel is an optimization of the DEFAULT stages only
        for d, (ll, la) in enumerate(docs):
            try:
                results[d] = match_trajectory(net, ll, la, opts)
            except MatchError as e:
                results[d] = e
        return results

    # one candidate pass over every point of every doc
    all_lons = [np.asarray(d[0], dtype=np.float64) for d in docs]
    all_lats = [np.asarray(d[1], dtype=np.float64) for d in docs]
    if opts.max_layers is not None:
        all_lons = [a[-opts.max_layers :] for a in all_lons]
        all_lats = [a[-opts.max_layers :] for a in all_lats]
    counts = np.asarray([a.size for a in all_lons], dtype=np.int64)
    if counts.sum() == 0:
        return [MatchError("unanchored", []) for _ in docs]
    flat_lon = np.concatenate(all_lons)
    flat_lat = np.concatenate(all_lats)
    offsets, rows, frac, px, py, dist = net.candidates_batch(
        flat_lon, flat_lat, opts.search_distance_m
    )
    offsets, rows, frac, px, py, dist = _cap_candidates(
        offsets, rows, frac, px, py, dist, opts.max_candidates
    )
    emis = (
        emission_cost(dist, opts.emission_error_m).astype(np.int64)
        if rows.size
        else np.empty(0, np.int64)
    )
    np.minimum(emis, MAX_WEIGHT, out=emis) if emis.size else None

    doc_start = np.concatenate(([0], np.cumsum(counts)))
    layer_sizes = np.diff(offsets)

    # simple docs: every layer anchored → the batched kernel path;
    # everything else → per-doc fallback (identical semantics)
    simple: list[int] = []
    for d in range(n_docs):
        lo, hi = doc_start[d], doc_start[d + 1]
        if hi == lo:
            results[d] = MatchError("unanchored", [])
        elif (layer_sizes[lo:hi] > 0).all():
            simple.append(d)
        else:
            try:
                # pass the ORIGINAL (untruncated) arrays: match_trajectory
                # applies its own max_layers windowing while keeping global
                # seq numbering — feeding it the pre-truncated window would
                # emit window-relative seqs, breaking the (doc_id, seq) key
                results[d] = match_trajectory(
                    net,
                    np.asarray(docs[d][0], dtype=np.float64),
                    np.asarray(docs[d][1], dtype=np.float64),
                    opts,
                )
            except MatchError as e:
                results[d] = e

    if not simple:
        return results

    # chunk the batched kernel: pair arrays beyond ~10^5 elements fall out
    # of cache and the vector fold turns memory-bound (measured 17x slower
    # per element) — the r04 sweep over the bench corpus (8/16/24/32/48/
    # 64/96/128 → 309/278/335/346/355/359/360/337 docs/s) plateaus at
    # 64-96 docs (~60k pairs) per kernel call
    CHUNK = 64
    if len(simple) > CHUNK:
        for s in range(0, len(simple), CHUNK):
            part = simple[s : s + CHUNK]
            sub = match_trajectories(
                net, [docs[d] for d in part], opts
            )
            for d, r in zip(part, sub):
                results[d] = r
        return results

    # global flat candidate arrays for the simple docs (layers stay in order)
    sel_layers = np.concatenate(
        [np.arange(doc_start[d], doc_start[d + 1]) for d in simple]
    )
    sel_sizes = layer_sizes[sel_layers]
    loff = np.concatenate(([0], np.cumsum(sel_sizes))).astype(np.int64)
    take = np.concatenate(
        [np.arange(offsets[g], offsets[g + 1]) for g in sel_layers]
    ) if sel_sizes.sum() else np.empty(0, np.int64)
    c_row = rows[take]
    c_frac = frac[take]
    c_lon = px[take]
    c_lat = py[take]
    c_emis = emis[take]

    # boundary map: consecutive global layers within the same doc
    bf_l = []
    pos = 0
    doc_layer_range = {}
    for d in simple:
        L = int(counts[d])
        doc_layer_range[d] = (pos, pos + L)
        bf_l.append(np.arange(pos, pos + L - 1, dtype=np.int64))
        pos += L
    bf = np.concatenate(bf_l) if bf_l else np.empty(0, np.int64)

    ctx = _TrajectoryContext(net, [], opts)
    mats = _weigh_kernel(ctx, c_row, c_frac, c_lon, c_lat, loff, bf) if bf.size else {}

    # map kernel boundary index → (doc, local boundary)
    b_owner = []
    for d in simple:
        L = int(counts[d])
        b_owner.extend((d, j) for j in range(L - 1))

    per_doc_mats: dict[int, dict[int, np.ndarray]] = {d: {} for d in simple}
    for i, mat in mats.items():
        d, j = b_owner[i]
        per_doc_mats[d][j] = mat

    for d in simple:
        glo, ghi = doc_layer_range[d]
        L = ghi - glo
        layers = []
        for g in range(glo, ghi):
            a, b = loff[g], loff[g + 1]
            layers.append(
                Layer(
                    edge_rows=c_row[a:b],
                    frac=c_frac[a:b],
                    pos_lon=c_lon[a:b],
                    pos_lat=c_lat[a:b],
                    dist_m=np.empty(0),
                    emission=c_emis[a:b].astype(np.uint32),
                )
            )
        t = Trellis.new([ly.edge_rows.size for ly in layers])
        for i, g in enumerate(range(glo, ghi)):
            # c_emis is already clamped int64 — skip the validate scan
            t.fill_nodes(i, c_emis[loff[g]:loff[g + 1]], validate=False)
        for j, mat in per_doc_mats[d].items():
            t.set_resolved(j, mat)  # already INF_W-normalized int64
        if t.pending_boundaries():
            results[d] = MatchError("disconnected", frontier_collapse(t))
            continue
        try:
            nodes, cost = viterbi_solve(t)
        except UnreachableError:
            results[d] = MatchError("disconnected", frontier_collapse(t))
            continue
        conv = None
        if opts.compute_convergence:
            from .trellis import convergence as _convergence

            conv = _convergence(t)
        ctx.layers = layers
        out = []
        total_pts = int(counts[d])
        seq0 = 0 if opts.max_layers is None else max(
            0, len(np.asarray(docs[d][0])) - opts.max_layers
        )
        ch_rows, ch_frac, ch_lons, ch_lats = _chosen_arrays(layers, nodes)
        fl, fa, hop_lens = ctx.hops_for_chosen(ch_rows, ch_frac, ch_lons, ch_lats)
        hoffs = np.concatenate(([0], np.cumsum(hop_lens)))
        hl = [fl[hoffs[i]:hoffs[i + 1]] for i in range(hop_lens.size)]
        ha = [fa[hoffs[i]:hoffs[i + 1]] for i in range(hop_lens.size)]
        _E = np.empty(0)
        for k in range(len(layers)):
            row = int(ch_rows[k])
            out.append(
                MatchedLayer(
                    seq=seq0 + k,
                    edge_id=int(net.edge_id[row]),
                    direction=int(net.dir[row]),
                    src=int(net.src[row]),
                    dst=int(net.dst[row]),
                    snap_lon=float(ch_lons[k]),
                    snap_lat=float(ch_lats[k]),
                    hop_lons=_E if k == 0 else hl[k - 1],
                    hop_lats=_E if k == 0 else ha[k - 1],
                )
            )
        results[d] = MatchResult(layers=out, cost=int(cost), converged_layer=conv)
    return results
