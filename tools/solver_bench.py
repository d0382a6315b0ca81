#!/usr/bin/env python
"""Trellis solver micro-benchmark — the (layers, width) grid of the
reference's criterion bench (``libs/routers_trellis/benches/solver.rs:
44-62``: (L, W) ∈ {(10,30), (16,64), (64,128), (256,256)}), plus the
batch-of-1000-solves shape. Prints one row per config with per-solve µs
and solves/s.

Usage: python tools/solver_bench.py [--iters 30]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from routers_ray.trellis import MAX_WEIGHT, Trellis, viterbi_solve  # noqa: E402

GRID = [(10, 30), (16, 64), (64, 128), (256, 256)]


def random_trellis(L: int, W: int, seed: int) -> Trellis:
    rng = np.random.default_rng(seed)
    t = Trellis.new([W] * L)
    for i in range(L):
        t.fill_nodes(i, rng.integers(0, 1000, W).astype(np.int64))
    for b in range(L - 1):
        t.fill_transition(b, rng.integers(0, min(100000, MAX_WEIGHT), (W, W)).astype(np.int64))
    return t


def main(iters: int) -> None:
    print(f"{'L x W':>10} {'per-solve µs':>14} {'solves/s':>10}")
    for L, W in GRID:
        t = random_trellis(L, W, seed=L * 1000 + W)
        viterbi_solve(t)  # warm
        t0 = time.perf_counter()
        for _ in range(iters):
            viterbi_solve(t)
        dt = time.perf_counter() - t0
        print(f"{L:>5}x{W:<4} {dt / iters * 1e6:14.1f} {iters / dt:10.1f}")
    # batch-of-1000 small solves (benches/solver.rs batch shape)
    small = [random_trellis(10, 30, seed=s) for s in range(50)]
    t0 = time.perf_counter()
    n = 0
    while n < 1000:
        for t in small:
            viterbi_solve(t)
            n += 1
            if n >= 1000:
                break
    dt = time.perf_counter() - t0
    print(f"{'1000x(10x30)':>10} {dt * 1000:14.1f} ms total {1000 / dt:10.1f} solves/s")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    main(ap.parse_args().iters)
