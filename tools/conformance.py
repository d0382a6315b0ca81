#!/usr/bin/env python
"""Conformance/throughput sweep harness — the multi-config runner analogue
of ``conformance/src/runner.rs:24-91`` + ``metrics.rs:30-74``: each
(matcher-config, trace) pair runs ``warmup`` untimed + ``iters`` timed
iterations; per-pair latency percentiles (nearest-rank p15/p25/p50/p75/
p85) and pts/s throughput are reported as a table and a merged JSON map
(later configs win on key collisions, ``conformance/src/main.rs:33-54``).

Usage:
    python tools/conformance.py [--iters 50] [--warmup 5] [--json out.json]

Runs driver-side (no Ray session needed — the matcher kernels are plain
NumPy; the distributed form is the match pipeline, benched by bench.py).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from routers_ray.matcher import MatchOptions, match_trajectory  # noqa: E402
from routers_ray.metrics import summarize  # noqa: E402
from routers_ray.network import CellNetwork, fatten_edges, synth_network  # noqa: E402


def fixture_traces(net: CellNetwork, n_traces: int = 4, seed: int = 9):
    """Deterministic trips along the synthetic grid (the GeoJSON-trace
    loader stand-in, ``conformance/src/trace/loader.rs:29-56``)."""
    rng = np.random.default_rng(seed)
    traces = []
    lon_lo = float(np.min(net.ax)) + 0.001
    lon_hi = float(np.max(net.ax)) - 0.001
    lat0 = float(np.median(net.ay))
    for t in range(n_traces):
        n_pts = 10 + 5 * t
        xs = np.clip(lon_lo + np.cumsum(rng.uniform(0.0002, 0.0006, n_pts)), lon_lo, lon_hi)
        ys = np.full(n_pts, lat0) + rng.normal(0, 0.00005, n_pts)
        traces.append((f"trace{t}", xs, ys))
    return traces


CONFIGS = {
    "allcompute": MatchOptions(),
    "selective16": MatchOptions(fanout=16),
    "selective8": MatchOptions(fanout=8),
    "windowed": MatchOptions(max_layers=12, drop_unanchored=True),
    # r04 adaptive candidate reduction (opt-in; own oracle `match_capped`)
    "capped6": MatchOptions(max_candidates=6),
}


NETWORKS = {
    # small grid: the pure-Python Dijkstra path (predicate-cache-warm regime)
    "grid12": dict(seed=9, n_cities=1, grid=(12, 12)),
    # dense city: >=1024 nodes, exercises the compiled Dijkstra kernel
    "dense36": dict(seed=9, n_cities=1, grid=(36, 36)),
}


def run_sweep(iters: int = 50, warmup: int = 5, configs=None, networks=None) -> dict:
    configs = configs or CONFIGS
    networks = networks or NETWORKS

    merged: dict = {}
    for net_name, net_kw in networks.items():
        nodes, edges = synth_network(**net_kw)
        net = CellNetwork.from_edge_rows(fatten_edges(nodes, edges))
        traces = fixture_traces(net)
        for cfg_name, opts in configs.items():
            for trace_name, xs, ys in traces:
                for _ in range(warmup):
                    match_trajectory(net, xs, ys, opts)
                samples = []
                for _ in range(iters):
                    t0 = time.perf_counter()
                    match_trajectory(net, xs, ys, opts)
                    samples.append((time.perf_counter() - t0) * 1000.0)
                stats = summarize(samples, wall_s=sum(samples) / 1000.0, points=xs.size * iters)
                # later configs win on collisions (main.rs:33-54 merge rule)
                merged[f"{net_name}/{cfg_name}/{trace_name}"] = stats
    return merged


def print_table(metrics: dict) -> None:
    cols = ["n", "min", "p15", "p25", "p50", "p75", "p85", "max", "mean", "throughput_pts_per_s"]
    print(f"{'net/config/trace':34} " + " ".join(f"{c:>9}" for c in cols))
    for key, m in metrics.items():
        vals = [m.get(c, float('nan')) for c in cols]
        print(f"{key:34} " + " ".join(f"{v:9.2f}" if isinstance(v, float) else f"{v:9d}" for v in vals))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--warmup", type=int, default=5)
    ap.add_argument("--json", type=str, default=None)
    args = ap.parse_args()
    metrics = run_sweep(args.iters, args.warmup)
    print_table(metrics)
    if args.json:
        with open(args.json, "w") as f:
            json.dump(metrics, f, indent=1)
        print(f"wrote {args.json}")
