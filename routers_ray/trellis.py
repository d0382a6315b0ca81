"""Layered-DAG trellis and solvers (NumPy port of ``routers_trellis``).

Semantics reproduced from the reference:

- sentinels ``NO_EDGE = u32::MAX`` (API) stored internally as ``INF_W = 1<<30``
  (``libs/routers_trellis/src/trellis.rs:10-19,274-282``);
- forward DP: first layer starts at its node weights; each boundary fills the
  next layer with ``min(cost + edge)`` over sources with ``cost < INF_W``,
  then adds the entered node's weight (``solver/viterbi.rs:61-95``);
- backtrack: best final node = min (cost, node) — ties to the lowest node;
  predecessor = argmin of ``dist[cur] + edge`` into the chosen node, ties to
  the lowest node (``viterbi.rs:105-120,124-162``);
- convergence: the latest layer where the live final frontier fuses through
  one node (``viterbi.rs:164-247``);
- pending (all-``NO_EDGE``) boundaries are how a gap is recorded; the
  frontier-collapse walk lists the break boundaries
  (``weigh/mod.rs:160-163,182-214``);
- ``tail(n)`` keeps the last n layers with interior boundaries intact
  (``trellis.rs:358-382``).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

NO_EDGE = np.uint32(0xFFFFFFFF)
INF_W = 1 << 30
MAX_WEIGHT = INF_W - 1


class TrellisError(Exception):
    pass


class UnreachableError(TrellisError):
    """No live path reaches the final layer (``SolveError::Unreachable``)."""


class NotResolvedError(TrellisError):
    """A boundary is still pending (``SolveError::NotResolved``)."""

    def __init__(self, boundary: int):
        self.boundary = boundary
        super().__init__(f"boundary {boundary} not resolved")


@dataclass
class Trellis:
    """Widths + per-layer node weights + per-boundary dense weight matrices.

    ``boundaries[i]`` is ``None`` while pending, else an int64 array of shape
    ``(widths[i], widths[i+1])`` holding weights with ``INF_W`` for absent
    edges (the ``fill_transition`` normalization, ``trellis.rs:274-284``).
    """

    widths: list[int] = field(default_factory=list)
    node_weights: list[np.ndarray] = field(default_factory=list)  # int64 per layer
    boundaries: list[np.ndarray | None] = field(default_factory=list)

    @classmethod
    def new(cls, widths: list[int]) -> "Trellis":
        if not widths:
            raise TrellisError("trellis is empty")
        if any(w == 0 for w in widths):
            raise TrellisError("zero width layer")
        return cls(
            widths=list(widths),
            node_weights=[np.zeros(w, dtype=np.int64) for w in widths],
            boundaries=[None] * (len(widths) - 1),
        )

    def append_layer(self, width: int, node_weights=None) -> None:
        if width == 0:
            raise TrellisError("zero width layer")
        self.widths.append(width)
        nw = np.zeros(width, dtype=np.int64) if node_weights is None else np.asarray(node_weights, dtype=np.int64)
        if nw.size != width:
            raise TrellisError("node weight length mismatch")
        self.node_weights.append(nw)
        if len(self.widths) > 1:
            self.boundaries.append(None)

    def fill_nodes(self, layer: int, weights, validate: bool = True) -> None:
        w = np.asarray(weights, dtype=np.int64)
        if w.size != self.widths[layer]:
            raise TrellisError("node weight length mismatch")
        if validate and (np.any(w > MAX_WEIGHT) or np.any(w < 0)):
            raise TrellisError("weight too large")
        self.node_weights[layer] = w

    def fill_transition(self, boundary: int, matrix, validate: bool = True) -> None:
        m = np.asarray(matrix, dtype=np.int64).reshape(self.widths[boundary], self.widths[boundary + 1])
        # only NO_EDGE may exceed MAX_WEIGHT (trellis.rs:274-276); the
        # weigher's internal path skips the check (its costs are clamped)
        if validate and (np.any((m > MAX_WEIGHT) & (m != np.int64(int(NO_EDGE)))) or np.any(m < 0)):
            raise TrellisError("weight too large")
        out = np.where(m == np.int64(int(NO_EDGE)), np.int64(INF_W), m)
        self.boundaries[boundary] = out

    def set_resolved(self, boundary: int, matrix: np.ndarray) -> None:
        """Internal fast path for the weigher: ``matrix`` is already int64,
        already ``(widths[b], widths[b+1])``-shaped and already
        ``INF_W``-normalized (no ``NO_EDGE`` sentinels) — skip
        :meth:`fill_transition`'s copy + normalization."""
        self.boundaries[boundary] = matrix

    def is_resolved(self, boundary: int) -> bool:
        return self.boundaries[boundary] is not None

    def layers(self) -> int:
        return len(self.widths)

    def pending_boundaries(self) -> list[int]:
        return [i for i, b in enumerate(self.boundaries) if b is None]

    def tail(self, n: int) -> "Trellis":
        """Last ``n`` layers as a new trellis (``trellis.rs:358-382``)."""
        start = max(len(self.widths) - n, 0)
        return Trellis(
            widths=list(self.widths[start:]),
            node_weights=[w.copy() for w in self.node_weights[start:]],
            boundaries=[None if b is None else b.copy() for b in self.boundaries[start:]],
        )


def _forward(trellis: Trellis) -> list[np.ndarray]:
    """DP table per layer; raises on pending boundaries (``viterbi.rs:38-55``)."""
    for i, b in enumerate(trellis.boundaries):
        if b is None:
            raise NotResolvedError(i)
    dist = [trellis.node_weights[0].astype(np.int64)]
    for i, mat in enumerate(trellis.boundaries):
        cur = dist[-1]
        # no live-row mask: a dead row's sum is ≥ INF_W (cur ≥ INF_W,
        # edge ≥ 0) so it can never beat a live sum (< INF_W) nor change
        # the ≥ INF_W unreachable classification — dropping the mask
        # removes a np.any + two fancy-index copies per boundary
        nxt = (cur[:, None] + mat).min(axis=0)
        nw = trellis.node_weights[i + 1]
        nxt = np.where(nxt < INF_W, nxt + nw, nxt)
        dist.append(nxt)
    return dist


def _predecessor(mat: np.ndarray, dist_cur: np.ndarray, chosen: int) -> int:
    """Argmin of ``dist + edge`` into ``chosen``; ties to the lowest node
    (``viterbi.rs:105-120``). Saturating add is irrelevant in int64."""
    costs = dist_cur + mat[:, chosen]
    return int(np.argmin(costs))  # first occurrence == lowest node id


def viterbi_solve(trellis: Trellis) -> tuple[np.ndarray, int]:
    """Minimum-cost path through the trellis → (node-per-layer, cost).

    Tie-breaks replicate the reference exactly: lowest final node, lowest
    predecessor node (``viterbi.rs:124-162``).

    Dispatches to the compiled integer min-plus kernel when the optional
    C toolchain is present — bit-identical (pure int64 arithmetic, same
    first-occurrence argmins; A/B-pinned in tests) — else the NumPy path.
    """
    if len(trellis.widths) > 0:
        from ._ckernels import have_ckernel, viterbi_solve_c

        if have_ckernel():
            return viterbi_solve_c(trellis)
    return viterbi_solve_py(trellis)


def viterbi_solve_py(trellis: Trellis) -> tuple[np.ndarray, int]:
    """The NumPy reference implementation (kernel A/B partner)."""
    dist = _forward(trellis)
    last = dist[-1]
    final_node = int(np.argmin(last))
    best_cost = int(last[final_node])
    if best_cost >= INF_W:
        raise UnreachableError()
    nodes = np.empty(trellis.layers(), dtype=np.int64)
    nodes[-1] = final_node
    chosen = final_node
    for i in range(len(trellis.boundaries) - 1, -1, -1):
        chosen = _predecessor(trellis.boundaries[i], dist[i], chosen)
        nodes[i] = chosen
    return nodes, best_cost


def convergence(trellis: Trellis) -> int | None:
    """Latest layer where all live final paths fuse through one node, or
    ``None`` if they never fuse (``viterbi.rs:164-247``). Raises
    :class:`UnreachableError` exactly where :func:`viterbi_solve` would."""
    dist = _forward(trellis)
    last = dist[-1]
    frontier = np.flatnonzero(last < INF_W)
    if frontier.size == 0:
        raise UnreachableError()
    if frontier.size == 1:
        return len(trellis.boundaries)
    for i in range(len(trellis.boundaries) - 1, -1, -1):
        mat = trellis.boundaries[i]
        preds = {_predecessor(mat, dist[i], int(n)) for n in frontier}
        frontier = np.array(sorted(preds), dtype=np.int64)
        if frontier.size == 1:
            return i
    return None


def brute_force_solve(trellis: Trellis) -> tuple[list[int], int]:
    """Exhaustive minimum-cost path — the conformance oracle
    (``solver/brute.rs:21-95``). Exponential; tests only."""
    for i, b in enumerate(trellis.boundaries):
        if b is None:
            raise NotResolvedError(i)

    best_cost = None
    best_path: list[int] | None = None

    def rec(layer: int, node: int, cost: int, path: list[int]):
        nonlocal best_cost, best_path
        if cost >= INF_W:
            return
        if layer == trellis.layers() - 1:
            key = (cost, path)
            if best_cost is None or key < (best_cost, best_path):
                best_cost, best_path = cost, list(path)
            return
        mat = trellis.boundaries[layer]
        for nxt in range(trellis.widths[layer + 1]):
            e = int(mat[node, nxt])
            if e >= INF_W:
                continue
            path.append(nxt)
            rec(layer + 1, nxt, cost + e + int(trellis.node_weights[layer + 1][nxt]), path)
            path.pop()

    for n0 in range(trellis.widths[0]):
        rec(0, n0, int(trellis.node_weights[0][n0]), [n0])
    if best_cost is None:
        raise UnreachableError()
    return best_path, best_cost


def path_cost(trellis: Trellis, nodes) -> int:
    """Recompute the cost of a node-per-layer path (``trellis.rs:339-353``)."""
    nodes = list(nodes)
    cost = int(trellis.node_weights[0][nodes[0]])
    for i in range(len(nodes) - 1):
        mat = trellis.boundaries[i]
        edge = int(mat[nodes[i], nodes[i + 1]]) if mat is not None else INF_W
        cost = min(cost + edge + int(trellis.node_weights[i + 1][nodes[i + 1]]), 2**62)
    return cost


def frontier_collapse(trellis: Trellis) -> list[int]:
    """Boundaries nothing could bridge — the gap report backing
    ``DisconnectedError`` (``weigh/mod.rs:182-214``). Pending boundaries are
    breaks by definition."""
    reachable = np.arange(trellis.widths[0])
    breaks: list[int] = []
    for i in range(len(trellis.boundaries)):
        to_w = trellis.widths[i + 1]
        mat = trellis.boundaries[i]
        if mat is None:
            nxt = np.empty(0, dtype=np.int64)
        else:
            ok = (mat[reachable, :] <= MAX_WEIGHT).any(axis=0)
            nxt = np.flatnonzero(ok)
        if nxt.size == 0:
            breaks.append(i)
            reachable = np.arange(to_w)
        else:
            reachable = nxt
    return breaks
