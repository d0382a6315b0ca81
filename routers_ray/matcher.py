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
  warm predicate cache, consecutive-duplicate point dedup
  (``candidate/route.rs:46-139``, ``collapse.rs:71-116``).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from .costing import (
    DEFAULT_EMISSION_ERROR_M,
    DEFAULT_SEARCH_DISTANCE_M,
    emission_cost,
    transition_cost,
)
from .csr import DEFAULT_THRESHOLD_CM, bounded_dijkstra, parent_path
from .geo import angular_complexity, bearing_deg, haversine_m, path_length_m
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


def _reach(net, layers, opts, li, si, lj, ti):
    """How target candidate (lj, ti) is reached from source (li, si):
    ``('direct', None)``, ``('routed', node_idx_path)`` or ``None``.

    Port of ``Expansion::reach`` (``weigh/expansion.rs:60-98``) +
    ``Candidate::directly_reachable`` (``candidate/entry.rs:92-106``).
    """
    s_row = int(layers[li].edge_rows[si])
    t_row = int(layers[lj].edge_rows[ti])
    same_id = net.edge_id[s_row] == net.edge_id[t_row]
    if same_id:
        same_dir = (net.src[s_row] == net.src[t_row]) and (net.dst[s_row] == net.dst[t_row])
        if same_dir and layers[li].frac[si] <= layers[lj].frac[ti]:
            return ("direct", None)
    # routed: Dijkstra rooted at source edge target → target edge source
    root = net.csr.node_index(int(net.dst[s_row]))
    leaf = net.csr.node_index(int(net.src[t_row]))
    if root < 0 or leaf < 0:
        return None
    parents, _ = _predicates(net, int(root), opts.threshold_cm)
    path = parent_path(parents, int(root), int(leaf))
    if path is None:
        return None
    return ("routed", path)


def _transition_cost(net, layers, opts, li, si, lj, ti, reach) -> int:
    """TransitionContext costing (``costing/default.rs:137-173``,
    ``costing/transition.rs:200-238``)."""
    kind, path = reach
    s_row = int(layers[li].edge_rows[si])
    t_row = int(layers[lj].edge_rows[ti])
    s_lon, s_lat = float(layers[li].pos_lon[si]), float(layers[li].pos_lat[si])
    t_lon, t_lat = float(layers[lj].pos_lon[ti]), float(layers[lj].pos_lat[ti])

    straight = float(haversine_m(s_lon, s_lat, t_lon, t_lat))

    if kind == "direct":
        # ResolutionMethod::DistanceOnly: offset = straightline, empty path
        path_lons = np.empty(0)
        path_lats = np.empty(0)
        route_len = straight
    else:
        path_lons = net.csr.node_lon[path]
        path_lats = net.csr.node_lat[path]
        # Standard: virtual tails — source position→edge target + edge
        # source→target position (transition.rs:214-223, entry.rs:124-139)
        d_src = net.csr.node_index(int(net.dst[s_row]))
        d_tgt = net.csr.node_index(int(net.src[t_row]))
        tail_s = float(
            haversine_m(s_lon, s_lat, net.csr.node_lon[d_src], net.csr.node_lat[d_src])
        )
        tail_t = float(
            haversine_m(net.csr.node_lon[d_tgt], net.csr.node_lat[d_tgt], t_lon, t_lat)
        )
        route_len = path_length_m(path_lons, path_lats) + tail_s + tail_t

    dev = 1.0 if route_len <= 0.0 else straight / route_len

    # edge headings; None when degenerate (<1 m) (entry.rs:109-122)
    def _heading(row):
        a = haversine_m(net.ax[row], net.ay[row], net.bx[row], net.by[row])
        if a < 1.0:
            return None
        return float(bearing_deg(net.ax[row], net.ay[row], net.bx[row], net.by[row]))

    lons = np.concatenate(([s_lon], path_lons, [t_lon]))
    lats = np.concatenate(([s_lat], path_lats, [t_lat]))
    turn = angular_complexity(lons, lats, _heading(s_row), _heading(t_row))

    continuity = float(net.weight[s_row]) / float(net.weight[t_row])
    return min(transition_cost(dev, turn, continuity), MAX_WEIGHT)


def _select_targets(layers, opts, li, si, lj) -> np.ndarray:
    """Which next-layer candidates to weigh: all (AllCompute,
    ``all_compute.rs:17-63``) or the k nearest by haversine between candidate
    positions (Selective, ``selective.rs:20,69-88``)."""
    n = layers[lj].edge_rows.size
    if opts.fanout is None or n <= opts.fanout:
        return np.arange(n)
    d = haversine_m(
        layers[li].pos_lon[si], layers[li].pos_lat[si], layers[lj].pos_lon, layers[lj].pos_lat
    )
    return np.sort(np.argpartition(d, opts.fanout)[: opts.fanout])


def weigh_trellis(net: CellNetwork, layers: list[Layer], opts: MatchOptions) -> Trellis:
    """Build the trellis: emissions as node weights, transitions as boundary
    matrices; all-NO_EDGE boundaries left pending (the gap record)."""
    t = Trellis.new([ly.edge_rows.size for ly in layers])
    for i, ly in enumerate(layers):
        t.fill_nodes(i, np.minimum(ly.emission.astype(np.int64), MAX_WEIGHT))
    for b in range(len(layers) - 1):
        n_from = layers[b].edge_rows.size
        n_to = layers[b + 1].edge_rows.size
        mat = np.full((n_from, n_to), int(NO_EDGE), dtype=np.int64)
        for si in range(n_from):
            for ti in _select_targets(layers, opts, b, si, b + 1):
                r = _reach(net, layers, opts, b, si, b + 1, int(ti))
                if r is None:
                    continue
                mat[si, ti] = _transition_cost(net, layers, opts, b, si, b + 1, int(ti), r)
        if (mat != int(NO_EDGE)).any():
            t.fill_transition(b, mat)
    return t


def _hop_geometry(net, layers, opts, li, si, lj, ti):
    """Interpolated geometry of one hop: source position, interior path
    nodes, target position — consecutive duplicates removed
    (``candidate/route.rs:46-139``)."""
    r = _reach(net, layers, opts, li, si, lj, ti)
    s_lon, s_lat = float(layers[li].pos_lon[si]), float(layers[li].pos_lat[si])
    t_lon, t_lat = float(layers[lj].pos_lon[ti]), float(layers[lj].pos_lat[ti])
    if r is None or r[0] == "direct":
        lons = np.array([s_lon, t_lon])
        lats = np.array([s_lat, t_lat])
    else:
        path = r[1]
        lons = np.concatenate(([s_lon], net.csr.node_lon[path], [t_lon]))
        lats = np.concatenate(([s_lat], net.csr.node_lat[path], [t_lat]))
    if lons.size > 1:
        keep = np.concatenate(([True], (np.diff(lons) != 0) | (np.diff(lats) != 0)))
        lons, lats = lons[keep], lats[keep]
    return lons, lats


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

    trellis = weigh_trellis(net, layers, opts)
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
            hop_lons, hop_lats = _hop_geometry(net, layers, opts, k - 1, int(nodes[k - 1]), k, int(ni))
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
