"""Conformance-style metrics: nearest-rank percentiles + throughput.

Port of the reference harness's metric semantics
(``conformance/src/metrics.rs:30-74``): percentiles p15/p25/p50/p75/p85 by
the nearest-rank method (ceil(p·n) − 1 index into the sorted sample),
min/max/mean, and throughput = points / wall-seconds. Used by ``bench.py``
and available as a per-partition aggregation for pipeline lineage rows.
"""

from __future__ import annotations

import numpy as np

PERCENTILES = (0.15, 0.25, 0.50, 0.75, 0.85)


def nearest_rank(sorted_vals: np.ndarray, p: float) -> float:
    """Nearest-rank percentile: the ceil(p·n)-th smallest value."""
    n = sorted_vals.size
    if n == 0:
        return float("nan")
    idx = max(0, min(n - 1, int(np.ceil(p * n)) - 1))
    return float(sorted_vals[idx])


def summarize(samples, wall_s: float | None = None, points: int | None = None) -> dict:
    """Metric summary dict matching the reference's table columns."""
    v = np.sort(np.asarray(samples, dtype=np.float64))
    out = {
        "n": int(v.size),
        "min": float(v[0]) if v.size else float("nan"),
        "max": float(v[-1]) if v.size else float("nan"),
        "mean": float(v.mean()) if v.size else float("nan"),
    }
    for p in PERCENTILES:
        out[f"p{int(p * 100)}"] = nearest_rank(v, p)
    if wall_s is not None and points is not None and wall_s > 0:
        out["throughput_pts_per_s"] = points / wall_s
    return out
