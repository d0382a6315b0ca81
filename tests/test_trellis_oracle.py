"""Viterbi vs brute-force oracle — mirrors the reference's solver A/B
conformance (``routers_trellis/tests/trellis.rs:365-430``): line graphs,
single layer, dense, disconnected, partial, random with node weights."""

import numpy as np
import pytest

from routers_ray.trellis import (
    INF_W,
    MAX_WEIGHT,
    NO_EDGE,
    NotResolvedError,
    Trellis,
    UnreachableError,
    brute_force_solve,
    convergence,
    frontier_collapse,
    path_cost,
    viterbi_solve,
)


def make(widths, mats=None, node_weights=None):
    t = Trellis.new(widths)
    if node_weights is not None:
        for i, w in enumerate(node_weights):
            t.fill_nodes(i, w)
    if mats is not None:
        for i, m in enumerate(mats):
            if m is not None:
                t.fill_transition(i, m)
    return t


def test_line_graph():
    t = make([1, 1, 1], [[[3]], [[4]]])
    nodes, cost = viterbi_solve(t)
    assert cost == 7
    assert list(nodes) == [0, 0, 0]


def test_single_layer():
    t = make([3], node_weights=[[5, 2, 9]])
    nodes, cost = viterbi_solve(t)
    assert cost == 2 and list(nodes) == [1]


def test_dense_two_layer():
    t = make([2, 2], [[[1, 5], [2, 1]]])
    nodes, cost = viterbi_solve(t)
    assert cost == 1
    assert list(nodes) == [0, 0]  # tie (0→0)=1 vs (1→1)=1 → lowest final node


def test_disconnected_unreachable():
    t = make([2, 2], [np.full((2, 2), int(NO_EDGE))])
    with pytest.raises(UnreachableError):
        viterbi_solve(t)


def test_pending_boundary_errors():
    t = make([2, 2])
    with pytest.raises(NotResolvedError):
        viterbi_solve(t)
    assert frontier_collapse(t) == [0]


def test_node_weights_first_layer_paid():
    t = make([2, 1], [[[0], [0]]], node_weights=[[7, 3], [10]])
    nodes, cost = viterbi_solve(t)
    assert cost == 3 + 10
    assert list(nodes) == [1, 0]


def test_tie_break_lowest_node():
    # two equal-cost paths; backtrack must choose the lowest predecessor
    t = make([2, 1], [[[4], [4]]])
    nodes, _ = viterbi_solve(t)
    assert list(nodes) == [0, 0]


def test_no_edge_sentinel_not_a_weight():
    t = make([1, 1], [[[int(NO_EDGE)]]])
    with pytest.raises(UnreachableError):
        viterbi_solve(t)


@pytest.mark.parametrize("seed", range(8))
def test_random_vs_brute(seed):
    rng = np.random.default_rng(seed)
    layers = int(rng.integers(2, 5))
    widths = [int(rng.integers(1, 5)) for _ in range(layers)]
    t = Trellis.new(widths)
    for i, w in enumerate(widths):
        t.fill_nodes(i, rng.integers(0, 50, size=w))
    solvable = True
    for i in range(layers - 1):
        m = rng.integers(0, 100, size=(widths[i], widths[i + 1])).astype(np.int64)
        mask = rng.random((widths[i], widths[i + 1])) < 0.3
        m[mask] = int(NO_EDGE)
        if (m == int(NO_EDGE)).all():
            solvable = False
        t.fill_transition(i, m)
    try:
        nodes, cost = viterbi_solve(t)
    except UnreachableError:
        with pytest.raises(UnreachableError):
            brute_force_solve(t)
        return
    _, brute_cost = brute_force_solve(t)
    assert cost == brute_cost
    assert path_cost(t, nodes) == cost


def test_convergence_single_final():
    t = make([2, 1], [[[1], [2]]])
    assert convergence(t) == 1


def test_convergence_fused_earlier():
    # layer0 (2 nodes) → layer1 (1 node) → layer2 (2 nodes): paths fuse at layer 1
    t = make([2, 1, 2], [[[1], [2]], [[1, 1]]])
    assert convergence(t) == 1


def test_convergence_never():
    # two disjoint parallel tracks
    m = [[0, int(NO_EDGE)], [int(NO_EDGE), 0]]
    t = make([2, 2, 2], [m, m])
    assert convergence(t) is None


def test_tail_keeps_resolved_interior():
    t = make([1, 1, 1], [[[3]], [[4]]])
    tl = t.tail(2)
    assert tl.layers() == 2 and tl.is_resolved(0)
    nodes, cost = viterbi_solve(tl)
    assert cost == 4


def test_weight_ceiling():
    t = Trellis.new([1, 1])
    with pytest.raises(Exception):
        t.fill_transition(0, [[MAX_WEIGHT + 1]])
    t.fill_transition(0, [[MAX_WEIGHT]])
    _, cost = viterbi_solve(t)
    assert cost == MAX_WEIGHT


def test_inf_does_not_propagate():
    # a path whose prefix hits INF must not contaminate later layers
    t = make([2, 2, 1], [[[1, int(NO_EDGE)], [int(NO_EDGE), int(NO_EDGE)]], [[5], [int(NO_EDGE)]]])
    nodes, cost = viterbi_solve(t)
    assert list(nodes) == [0, 0, 0] and cost == 6
    assert INF_W > MAX_WEIGHT


def test_c_viterbi_exactly_matches_python():
    """The compiled min-plus kernel equals the NumPy Viterbi bit-for-bit
    (nodes + cost + Unreachable) over random trellises with ties, gaps
    and single-layer cases."""
    import pytest

    from routers_ray._ckernels import have_ckernel, viterbi_solve_c
    from routers_ray.trellis import (
        INF_W,
        MAX_WEIGHT,
        NO_EDGE,
        Trellis,
        UnreachableError,
        viterbi_solve_py,
    )

    if not have_ckernel():
        pytest.skip("no C toolchain")
    rng = np.random.default_rng(41)
    for trial in range(60):
        L = int(rng.integers(1, 9))
        widths = [int(rng.integers(1, 7)) for _ in range(L)]
        t = Trellis.new(widths)
        for i, w in enumerate(widths):
            t.fill_nodes(i, rng.integers(0, 50, w))
        for b in range(L - 1):
            mat = rng.integers(0, 40, (widths[b], widths[b + 1])).astype(np.int64)
            # ties + unreachable holes
            mat[rng.random(mat.shape) < 0.3] = mat.min() if mat.size else 0
            mat[rng.random(mat.shape) < 0.2] = int(NO_EDGE)
            t.fill_transition(b, mat)
        try:
            pn, pc_ = viterbi_solve_py(t)
            perr = None
        except UnreachableError:
            pn = pc_ = perr = "unreachable"
        try:
            cn, cc = viterbi_solve_c(t)
            cerr = None
        except UnreachableError:
            cn = cc = cerr = "unreachable"
        assert perr == cerr, f"trial {trial}"
        if perr is None:
            assert pn.tolist() == cn.tolist(), f"trial {trial}"
            assert pc_ == cc, f"trial {trial}"
