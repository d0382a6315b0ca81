"""Emission / transition costing (NumPy port of ``routers_transition/src/costing``).

- decay: ``cost(v) = ζ · (1/clamp(v, 1e-6, 1))^β · 100`` truncated to u32
  (``costing/util.rs:29-39``, PRECISION=100);
- emission: ``v = exp(-sqrt(distance / emission_error))`` with the 25 m
  default error radius (``costing/default.rs:39-65``);
- transition: ``v = sqrt(deviance · turn_cost · class_continuity)`` with each
  factor clamped to [1e-6, 1] (``costing/default.rs:137-173``);
  deviance = straightline / route_length (1.0 when route_length ≤ 0,
  ``costing/transition.rs:119-126``); class continuity =
  src_weight / tgt_weight.
"""

from __future__ import annotations

import numpy as np

PRECISION = 100.0
EPSILON = 1e-6
DEFAULT_EMISSION_ERROR_M = 25.0  # costing/default.rs:7
DEFAULT_SEARCH_DISTANCE_M = 50.0  # match/definition.rs:12


def decay_cost(v, zeta: float = 1.0, beta: float = 1.0):
    """``Strategy::cost`` — [0,1] score → u32 cost (util.rs:29-39)."""
    v = np.clip(np.asarray(v, dtype=np.float64), EPSILON, 1.0)
    return (PRECISION * zeta * (1.0 / v) ** beta).astype(np.uint32)


def emission_cost(distance_m, emission_error_m: float = DEFAULT_EMISSION_ERROR_M):
    """Vectorized emission cost of candidate-to-observation distances."""
    d = np.asarray(distance_m, dtype=np.float64)
    v = np.exp(-np.sqrt(d / emission_error_m))
    return decay_cost(v)


def transition_score(deviance, turn_cost, class_continuity) -> float:
    """[0,1] transition score (default.rs:137-173)."""
    d = min(max(float(deviance), EPSILON), 1.0)
    t = min(max(float(turn_cost), EPSILON), 1.0)
    c = min(max(float(class_continuity), EPSILON), 1.0)
    return float(np.sqrt(d * t * c))


def transition_cost(deviance, turn_cost, class_continuity) -> int:
    return int(decay_cost(transition_score(deviance, turn_cost, class_continuity)))


def deviance(straightline_m: float, route_length_m: float) -> float:
    """Straightline/route ratio; 1.0 on degenerate routes (transition.rs:119-126)."""
    if route_length_m <= 0.0:
        return 1.0
    return straightline_m / route_length_m


SPEED_REF_KMH = 130.0  # normalization ceiling for the speed decay


def speed_weight(speed_kmh, fallback_weight, zeta: float = 1.0, beta: float = 1.0) -> np.ndarray:
    """Per-edge Dijkstra weight from parsed speed limits — the real ``v``
    source for the reference decay ``cost(v) = ζ·(1/v)^β·100``
    (``costing/util.rs:29-39``), with ``v = clamp(speed/130 km/h, ε, 1)``.

    Edges without a parsed limit (NaN) keep their class-derived
    ``fallback_weight``; a 130 km/h motorway costs 100, a 13 km/h lane
    costs 1000 — same scale family as ``RoadClass::weighting``×100.
    """
    s = np.asarray(speed_kmh, dtype=np.float64)
    v = np.clip(s / SPEED_REF_KMH, EPSILON, 1.0)
    w = (PRECISION * zeta * (1.0 / v) ** beta)
    fb = np.asarray(fallback_weight, dtype=np.float64) * PRECISION
    out = np.where(np.isnan(s), fb, w)
    return np.minimum(out, np.float64(2**31 - 1)).astype(np.uint32)
