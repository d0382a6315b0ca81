"""Optional C kernel for the bounded Dijkstra hot loop.

The container ships gcc + ctypes (stdlib), so the one genuinely
loop-bound kernel — ``csr.bounded_dijkstra``'s heap walk — compiles once
per machine to a tiny shared object (cached under /tmp by source hash)
and loads via the C ABI. Everything else stays NumPy. If compilation
fails for any reason the caller falls back to the pure-Python loop, so
the engine never *requires* a toolchain.

Semantics are bit-identical to the Python implementation (same
WeightAndDistance repr, same (repr, insertion-counter) settle order, same
take-while threshold cut, same strict-improvement parent capture) —
pinned by an exact A/B test over random graphs in
``tests/test_dijkstra.py``.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

_SRC = r"""
#include <stdint.h>
#include <stdlib.h>
#include <string.h>

/* binary min-heap over (key = repr<<32 | counter, node) */
typedef struct { uint64_t *keys; int32_t *nodes; int64_t n; } heap_t;

static inline void heap_push(heap_t *h, uint64_t key, int32_t node) {
    int64_t i = h->n++;
    while (i > 0) {
        int64_t p = (i - 1) >> 1;
        if (h->keys[p] <= key) break;
        h->keys[i] = h->keys[p]; h->nodes[i] = h->nodes[p];
        i = p;
    }
    h->keys[i] = key; h->nodes[i] = node;
}

static inline int32_t heap_pop(heap_t *h, uint64_t *key_out) {
    int32_t top = h->nodes[0];
    *key_out = h->keys[0];
    uint64_t key = h->keys[--h->n];
    int32_t node = h->nodes[h->n];
    int64_t i = 0;
    for (;;) {
        int64_t l = 2 * i + 1, r = l + 1, m = i;
        uint64_t mk = key;
        if (l < h->n && h->keys[l] < mk) { m = l; mk = h->keys[l]; }
        if (r < h->n && h->keys[r] < mk) { m = r; }
        if (m == i) break;
        h->keys[i] = h->keys[m]; h->nodes[i] = h->nodes[m];
        i = m;
    }
    h->keys[i] = key; h->nodes[i] = node;
    return top;
}

/* returns number of settled nodes; outputs parallel arrays
   settled[k] = node, set_par[k] = parent (-1 for root), set_dist[k] = cm */
int64_t bounded_dijkstra_c(
    const int64_t *indptr, const int32_t *nbr,
    const uint32_t *ew, const uint32_t *ed, const uint8_t *acc,
    int64_t n_nodes, int64_t n_edges, int64_t root, double threshold_cm,
    /* scratch, length n_nodes, caller-owned; stamp/epoch avoid memsets */
    int32_t *stamp, int32_t epoch,
    uint64_t *best_rep, int64_t *best_num, int32_t *best_den, int64_t *best_dist,
    int32_t *parent, uint8_t *seen_arr,
    /* heap scratch, length n_edges + 1 */
    uint64_t *hkeys, int32_t *hnodes,
    /* outputs, length n_nodes */
    int32_t *settled, int32_t *set_par, int64_t *set_dist)
{
    heap_t h = { hkeys, hnodes, 0 };
    uint32_t counter = 0;
    const uint64_t U32 = 0xFFFFFFFFULL;

    stamp[root] = epoch;
    best_rep[root] = 0; best_num[root] = 0; best_den[root] = 0; best_dist[root] = 0;
    parent[root] = -1; seen_arr[root] = 0;
    heap_push(&h, 0, (int32_t)root);

    int64_t n_settled = 0;
    while (h.n > 0) {
        uint64_t key;
        int32_t node = heap_pop(&h, &key);
        if (stamp[node] == epoch && seen_arr[node]) continue;
        stamp[node] = epoch;
        seen_arr[node] = 1;
        int64_t num = best_num[node];
        int32_t den = best_den[node];
        int64_t dist = best_dist[node];
        if ((double)dist >= threshold_cm) break;  /* take_while cut */
        settled[n_settled] = node;
        set_par[n_settled] = parent[node];
        set_dist[n_settled] = dist;
        n_settled++;
        for (int64_t e = indptr[node]; e < indptr[node + 1]; e++) {
            if (!acc[e]) continue;
            int32_t nxt = nbr[e];
            if (stamp[nxt] == epoch && seen_arr[nxt]) continue;
            int64_t n_num = num + (int64_t)ew[e];
            int32_t n_den = den + 1;
            int64_t n_dist = dist + (int64_t)ed[e];
            int64_t avg = n_num / n_den;
            /* square in double: avg*avg in int64 overflows (UB) for avg
               > ~3.04e9; in the non-saturated range avg*avg < 2^32 so the
               double product is still exact, matching the Python path */
            double v = (double)avg * (double)avg * (double)n_dist;
            uint64_t n_rep = (v >= (double)U32) ? U32 : (uint64_t)v;
            int fresh = (stamp[nxt] != epoch);
            if (fresh || best_rep[nxt] > n_rep) {
                if (fresh) { seen_arr[nxt] = 0; stamp[nxt] = epoch; }
                best_rep[nxt] = n_rep;
                best_num[nxt] = n_num;
                best_den[nxt] = n_den;
                best_dist[nxt] = n_dist;
                parent[nxt] = node;
                counter++;
                heap_push(&h, (n_rep << 32) | (uint64_t)counter, nxt);
            }
        }
    }
    return n_settled;
}

/* Viterbi forward + backtrack over dense int64 boundary matrices
   (INF_W-substituted, row-major |from| x |to|). Pure integer arithmetic —
   bit-identical to the NumPy path by construction (same first-occurrence
   argmin tie-breaks). Returns best cost, or -1 if the last layer is all
   >= inf_w. */
int64_t viterbi_c(
    const int64_t *widths, int64_t L,
    const int64_t *mats, const int64_t *mat_offs,
    const int64_t *node_w, const int64_t *nw_offs,
    int64_t inf_w,
    int64_t *out_nodes, int64_t *dist /* scratch, sum(widths) */
) {
    /* forward */
    const int64_t w0 = widths[0];
    for (int64_t j = 0; j < w0; j++) dist[j] = node_w[j];
    for (int64_t i = 0; i + 1 < L; i++) {
        const int64_t nF = widths[i], nT = widths[i + 1];
        const int64_t *mat = mats + mat_offs[i];
        const int64_t *cur = dist + nw_offs[i];
        const int64_t *nw = node_w + nw_offs[i + 1];
        int64_t *nxt = dist + nw_offs[i + 1];
        for (int64_t j = 0; j < nT; j++) {
            int64_t best = cur[0] + mat[j];
            for (int64_t k = 1; k < nF; k++) {
                int64_t v = cur[k] + mat[k * nT + j];
                if (v < best) best = v;
            }
            nxt[j] = (best < inf_w) ? best + nw[j] : best;
        }
    }
    /* backtrack */
    const int64_t wl = widths[L - 1];
    const int64_t *last = dist + nw_offs[L - 1];
    int64_t chosen = 0;
    for (int64_t j = 1; j < wl; j++) if (last[j] < last[chosen]) chosen = j;
    int64_t best_cost = last[chosen];
    if (best_cost >= inf_w) return -1;
    out_nodes[L - 1] = chosen;
    for (int64_t i = L - 2; i >= 0; i--) {
        const int64_t nF = widths[i], nT = widths[i + 1];
        const int64_t *mat = mats + mat_offs[i];
        const int64_t *cur = dist + nw_offs[i];
        int64_t bi = 0;
        int64_t bv = cur[0] + mat[chosen];
        for (int64_t k = 1; k < nF; k++) {
            int64_t v = cur[k] + mat[k * nT + chosen];
            if (v < bv) { bv = v; bi = k; }
        }
        chosen = bi;
        out_nodes[i] = chosen;
    }
    return best_cost;
}

/* Per-pair transition cost: optional-heading chain fold + deviance +
   class-continuity combine (matcher._weigh_kernel's tail). Bit-identical
   to the NumPy path: libm cos/sqrt/fmod match numpy's float64 ufuncs
   bitwise on this platform (verified over 2.1M samples incl. boundary
   values), additions run in the same order, clips are fmin(fmax(.)),
   and the int cast truncates like .astype(int64). */
#include <math.h>
void weigh_cost_c(
    const double *h_s, const double *b_st, const double *b_sp, const double *b_pt,
    const double *blk_hf, const double *blk_hl, const double *blk_inv,
    const uint8_t *blk_zero, const int64_t *blk_cnt,
    const double *h_t, const double *straight, const double *i_len,
    const double *tail_s, const double *tail_t,
    const uint8_t *direct, const uint8_t *adjacent, const double *cont,
    int64_t n, int64_t max_weight, double cos_k, int64_t *cost_out)
{
    for (int64_t i = 0; i < n; i++) {
        double prev = h_s[i];
        double inv_sum = 0.0;
        int64_t cnt = 0;
        int da = direct[i] || adjacent[i];
        int zero = 0;
        double mid = da ? (straight[i] >= 1.0 ? b_st[i] : NAN)
                        : (tail_s[i] >= 1.0 ? b_sp[i] : NAN);
        double cpt = da ? NAN : (tail_t[i] >= 1.0 ? b_pt[i] : NAN);

        #define STEP(x) do { double _x = (x); if (!isnan(_x)) { \
            if (!isnan(prev)) { \
                double d = fmod(_x - prev, 360.0); \
                if (d > 180.0) d -= 360.0; else if (d <= -180.0) d += 360.0; \
                double c = cos(d * cos_k); \
                if (c <= 0.0) zero = 1; \
                else inv_sum += 1.0 / fmin(c, 1.0); \
                cnt++; \
            } \
            prev = _x; } } while (0)

        STEP(mid);
        STEP(blk_hf[i]);
        inv_sum += blk_inv[i];
        cnt += blk_cnt[i];
        zero |= blk_zero[i];
        if (!isnan(blk_hf[i])) prev = blk_hl[i];
        STEP(cpt);
        STEP(h_t[i]);
        #undef STEP

        double turn;
        if (cnt == 0) turn = 1.0;
        else {
            double denom = fmax(inv_sum, 1e-300);
            turn = fmin(fmax((double)cnt / denom, 0.0), 1.0);
        }
        if (zero) turn = 0.0;
        double route_len = direct[i] ? straight[i] : i_len[i] + tail_s[i] + tail_t[i];
        double dev = route_len > 0.0 ? straight[i] / route_len : 1.0;
        double score = sqrt(
            fmin(fmax(dev, 1e-6), 1.0) * fmin(fmax(turn, 1e-6), 1.0)
            * fmin(fmax(cont[i], 1e-6), 1.0));
        int64_t cost = (int64_t)(100.0 / fmin(fmax(score, 1e-6), 1.0));
        cost_out[i] = cost < max_weight ? cost : max_weight;
    }
}
"""


def _build() -> ctypes.CDLL | None:
    try:
        tag = hashlib.md5(_SRC.encode()).hexdigest()[:16]
        so = os.path.join(tempfile.gettempdir(), f"routers_ray_ck_{tag}.so")
        if not os.path.exists(so):
            src = so + ".c"
            with open(src, "w") as f:
                f.write(_SRC)
            tmp_so = so + f".tmp{os.getpid()}"
            subprocess.run(
                ["gcc", "-O2", "-shared", "-fPIC", "-o", tmp_so, src, "-lm"],
                check=True, capture_output=True, timeout=120,
            )
            os.replace(tmp_so, so)  # atomic: concurrent actors race safely
        lib = ctypes.CDLL(so)
        fn = lib.bounded_dijkstra_c
        fn.restype = ctypes.c_int64
        fn.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_double, ctypes.c_void_p, ctypes.c_int32,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ]
        fv = lib.viterbi_c
        fv.restype = ctypes.c_int64
        fv.argtypes = [
            ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p,
        ]
        fw = lib.weigh_cost_c
        fw.restype = None
        fw.argtypes = [ctypes.c_void_p] * 14 + [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_double, ctypes.c_void_p,
        ]
        return lib
    except Exception:
        return None


_LIB = _build()


def have_ckernel() -> bool:
    return _LIB is not None


class DijkstraScratch:
    """Per-CSR scratch buffers (epoch-stamped — no per-call memset)."""

    def __init__(self, n_nodes: int, n_edges: int):
        import numpy as np

        self.epoch = 0
        self.stamp = np.zeros(max(n_nodes, 1), dtype=np.int32)
        self.best_rep = np.empty(max(n_nodes, 1), dtype=np.uint64)
        self.best_num = np.empty(max(n_nodes, 1), dtype=np.int64)
        self.best_den = np.empty(max(n_nodes, 1), dtype=np.int32)
        self.best_dist = np.empty(max(n_nodes, 1), dtype=np.int64)
        self.parent = np.empty(max(n_nodes, 1), dtype=np.int32)
        self.seen = np.zeros(max(n_nodes, 1), dtype=np.uint8)
        self.hkeys = np.empty(max(n_edges, 1) + 1, dtype=np.uint64)
        self.hnodes = np.empty(max(n_edges, 1) + 1, dtype=np.int32)
        self.settled = np.empty(max(n_nodes, 1), dtype=np.int32)
        self.set_par = np.empty(max(n_nodes, 1), dtype=np.int32)
        self.set_dist = np.empty(max(n_nodes, 1), dtype=np.int64)


def bounded_dijkstra_c(csr, root: int, threshold_cm: float):
    """C-kernel bounded Dijkstra; returns (parents, dists) dicts identical
    to :func:`routers_ray.csr.bounded_dijkstra`."""
    import numpy as np

    scratch = csr._c_scratch
    if scratch is None:
        scratch = DijkstraScratch(csr.n_nodes(), int(csr.nbr.size))
        csr._c_scratch = scratch
    scratch.epoch += 1
    if scratch.epoch >= 2**31 - 1:
        scratch.stamp[:] = 0
        scratch.epoch = 1
    acc8 = csr._acc_u8
    if acc8 is None:
        acc8 = csr.edge_accessible.astype(np.uint8)
        csr._acc_u8 = acc8

    def p(a):
        return a.ctypes.data_as(ctypes.c_void_p)

    n = _LIB.bounded_dijkstra_c(
        p(csr.indptr), p(csr.nbr), p(csr.edge_weight), p(csr.edge_dist_cm),
        p(acc8), csr.n_nodes(), int(csr.nbr.size), int(root),
        float(threshold_cm), p(scratch.stamp), scratch.epoch,
        p(scratch.best_rep), p(scratch.best_num), p(scratch.best_den),
        p(scratch.best_dist), p(scratch.parent), p(scratch.seen),
        p(scratch.hkeys), p(scratch.hnodes),
        p(scratch.settled), p(scratch.set_par), p(scratch.set_dist),
    )
    nodes = scratch.settled[:n].tolist()
    pars = scratch.set_par[:n].tolist()
    ds = scratch.set_dist[:n].tolist()
    dists = dict(zip(nodes, ds))
    parents = {k: v for k, v in zip(nodes, pars) if v >= 0}
    return parents, dists


def _flat_view(arrs):
    """If ``arrs`` are consecutive C-contiguous int64 views of ONE base
    buffer (the weigher's flat-array layout: boundary matrices are
    reshaped slices of the kernel's flat cost array, node weights are
    slices of the batched emission array), return the single flat view
    spanning them — zero copies. Returns ``None`` when the layout doesn't
    hold (scatter-packed incomplete matrices, fill_transition copies,
    tail() copies) so the caller falls back to a concatenate."""
    import numpy as np

    if not arrs:
        return None
    base = arrs[0].base
    if not isinstance(base, np.ndarray):
        return None
    if base.dtype != np.int64 or not base.flags.c_contiguous:
        return None
    base_ptr = base.__array_interface__["data"][0]
    expect = arrs[0].__array_interface__["data"][0]
    start = expect - base_ptr
    if start < 0 or start % 8:
        return None
    total = 0
    for a in arrs:
        if (
            a.base is not base
            or a.dtype != np.int64
            or not a.flags.c_contiguous
            or a.__array_interface__["data"][0] != expect
        ):
            return None
        expect += a.size * 8
        total += a.size
    return base.reshape(-1)[start // 8 : start // 8 + total]


def viterbi_solve_c(trellis):
    """C-kernel Viterbi (forward min-plus + backtrack) — bit-identical to
    :func:`routers_ray.trellis.viterbi_solve` (integer arithmetic, same
    first-occurrence argmin tie-breaks). Returns (nodes, cost); raises the
    same errors. Caller guarantees all boundaries resolved.

    Flat hand-off: when the weigher's matrices/emissions are consecutive
    views of one flat buffer (the complete-mode pack), the kernel reads
    them in place — the per-doc ``concatenate`` copy only runs for
    scatter-packed or externally-filled trellises."""
    import numpy as np

    from .trellis import INF_W, NotResolvedError, UnreachableError

    for i, b in enumerate(trellis.boundaries):
        if b is None:
            raise NotResolvedError(i)
    widths = np.asarray(trellis.widths, dtype=np.int64)
    L = widths.size
    nw_offs = np.concatenate(([0], np.cumsum(widths))).astype(np.int64)
    node_w = _flat_view(trellis.node_weights) if L else None
    if node_w is None:
        node_w = (
            np.concatenate(trellis.node_weights).astype(np.int64)
            if L
            else np.empty(0, np.int64)
        )
    if L > 1:
        mat_offs = np.concatenate(
            ([0], np.cumsum([b.size for b in trellis.boundaries]))
        ).astype(np.int64)
        mats = _flat_view(trellis.boundaries)
        if mats is None:
            mats = np.concatenate(
                [b.ravel() for b in trellis.boundaries]
            ).astype(np.int64)
    else:
        mats = np.empty(0, np.int64)
        mat_offs = np.zeros(1, np.int64)
    out_nodes = np.empty(L, dtype=np.int64)
    dist = np.empty(int(nw_offs[-1]), dtype=np.int64)

    def p(a):
        return a.ctypes.data_as(ctypes.c_void_p)

    cost = _LIB.viterbi_c(
        p(widths), L, p(mats), p(mat_offs), p(node_w), p(nw_offs),
        int(INF_W), p(out_nodes), p(dist),
    )
    if cost < 0:
        raise UnreachableError()
    return out_nodes, int(cost)


def weigh_cost_c(h_s, b_st, b_sp, b_pt, blk_hf, blk_hl, blk_inv, blk_zero,
                 blk_cnt, h_t, straight, i_len, tail_s, tail_t, direct,
                 adjacent, cont, max_weight: int, cos_k: float):
    """C per-pair transition-cost kernel; returns int64 cost array.
    All float inputs float64 C-contiguous; direct/adjacent/blk_zero uint8."""
    import numpy as np

    n = int(h_s.size)
    out = np.empty(n, dtype=np.int64)

    def p(a):
        return a.ctypes.data_as(ctypes.c_void_p)

    _LIB.weigh_cost_c(
        p(h_s), p(b_st), p(b_sp), p(b_pt), p(blk_hf), p(blk_hl), p(blk_inv),
        p(blk_zero), p(blk_cnt), p(h_t), p(straight), p(i_len), p(tail_s),
        p(tail_t), p(direct), p(adjacent), p(cont),
        n, int(max_weight), float(cos_k), p(out),
    )
    return out
