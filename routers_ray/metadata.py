"""Edge metadata breadth: road class, lane count, speed limits, and
per-transport-mode access resolution.

Table-native port of the reference's ``OsmEdgeMetadata { lane_count,
speed_limit, access: Vec<AccessTag>, road_class }``
(``routers_codec/src/osm/mod.rs:76-81``) with:

- the transport-mode hierarchy chains (most-general → most-specific,
  ``osm/parsers/primitives/transport.rs:428-530``) — a mode is restricted
  by any tag whose mode appears in the mode's own chain, and the MOST
  specific matching tag wins (``osm/mod.rs:200-235``, default-allow);
- ``RoadClass::weighting`` Motorway=1 … Pedestrian=100
  (``osm/parsers/primitives/road_class.rs:118-146``);
- a ``maxspeed`` value parser (number + unit; ``mph``/``knots``
  conversion; ``none``→unlimited sentinel; conditional suffixes ignored
  here — the opening-hours evaluator in :mod:`routers_ray.access` handles
  time conditions), the unconditional core of the reference's ~600-LoC
  ``speed_limit`` parser family (``osm/parsers/speed_limit/limit.rs``).

Physical shape: access tags live on the edge table as parallel flat
columns; per-mode boolean access columns are PRECOMPUTED at network-build
time so the runtime config just picks a column (SURVEY §2.2 mapping) — no
per-row tag walking in any hot path.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

# mode → hierarchy chain, most general first (transport.rs:428-530; land
# subset — the modes a road-matching runtime actually selects)
TRANSPORT_CHAIN: dict[str, tuple[str, ...]] = {
    "all": ("all",),
    "foot": ("all", "foot"),
    "horse": ("all", "horse"),
    "vehicle": ("all", "vehicle"),
    "bicycle": ("all", "vehicle", "bicycle"),
    "motor_vehicle": ("all", "vehicle", "motor_vehicle"),
    "motorcar": ("all", "vehicle", "motor_vehicle", "motorcar"),
    "goods": ("all", "vehicle", "motor_vehicle", "goods"),
    "hgv": ("all", "vehicle", "motor_vehicle", "goods", "hgv"),
    "psv": ("all", "vehicle", "motor_vehicle", "psv"),
    "bus": ("all", "vehicle", "motor_vehicle", "psv", "bus"),
    "taxi": ("all", "vehicle", "motor_vehicle", "taxi"),
    "emergency": ("all", "vehicle", "motor_vehicle", "emergency"),
}

# specificity = chain length (transport.rs:428-431)
SPECIFICITY = {m: len(c) for m, c in TRANSPORT_CHAIN.items()}

# RoadClass::weighting (road_class.rs:118-146)
ROAD_CLASS_WEIGHT: dict[str, int] = {
    "motorway": 1, "motorway_link": 2,
    "trunk": 3, "trunk_link": 4,
    "primary": 5, "primary_link": 6,
    "secondary": 7, "secondary_link": 8,
    "tertiary": 9, "tertiary_link": 10,
    "residential": 10, "busway": 10, "bus_guideway": 10, "unclassified": 10,
    "living_street": 50, "service": 50, "road": 50,
    "raceway": 100, "escape": 100, "track": 100, "pedestrian": 100,
}

DIR_FORWARD, DIR_BACKWARD, DIR_BOTH = 0, 1, 2

_SPEED_RE = re.compile(r"^\s*(\d+(?:\.\d+)?)\s*(mph|knots|km/h|kmh)?\s*$")
SPEED_NONE_KMH = 200.0  # "maxspeed=none" sentinel (autobahn-style)


def parse_maxspeed(value: str | None) -> float | None:
    """One unconditional maxspeed value → km/h (``speed_limit/limit.rs``
    VALUE_PATTERN core). Conditional suffixes (``50 @ (...)``) resolve to
    their unconditional speed; unparseable → None (no limit known)."""
    if value is None:
        return None
    v = value.strip().lower()
    if not v:
        return None
    if v == "none":
        return SPEED_NONE_KMH
    if v == "walk":
        return 5.0
    # strip a conditional suffix: "50 @ (Mo-Fr 06:00-19:00)"
    if "@" in v:
        v = v.split("@", 1)[0]
    m = _SPEED_RE.match(v)
    if not m:
        return None
    speed = float(m.group(1))
    unit = m.group(2)
    if unit == "mph":
        speed *= 1.609344
    elif unit == "knots":
        speed *= 1.852
    return speed


def parse_maxspeed_column(values) -> np.ndarray:
    """Vectorized-enough maxspeed parse: one parse per DISTINCT string."""
    vals = values.to_pylist() if hasattr(values, "to_pylist") else list(values)
    cache: dict[str | None, float] = {}
    out = np.full(len(vals), np.nan)
    for i, v in enumerate(vals):
        if v not in cache:
            p = parse_maxspeed(v)
            cache[v] = np.nan if p is None else p
        out[i] = cache[v]
    return out


def resolve_access(
    tags: list[tuple[str, int, str]] | None,
    mode: str,
    direction: int,
    allow_private: bool = False,
) -> bool:
    """Most-specific-wins access resolution for ONE edge direction —
    ``OsmEdgeMetadata::accessible`` (``osm/mod.rs:200-235``).

    ``tags`` is [(tag_mode, directionality, value)]; a tag applies when the
    runtime ``mode``'s hierarchy chain contains ``tag_mode`` (the runtime
    is restricted by its ancestors) and the directionality matches. The
    most specific applicable tag decides; default allow.
    """
    if not tags:
        return True
    chain = TRANSPORT_CHAIN.get(mode)
    if chain is None:
        raise ValueError(f"unknown transport mode {mode!r}")
    chain_set = set(chain)
    best_spec = -1
    best_value: str | None = None
    for tag_mode, tag_dir, value in tags:
        if tag_mode not in chain_set:
            continue
        if tag_dir == DIR_FORWARD and direction != 0:
            continue
        if tag_dir == DIR_BACKWARD and direction != 1:
            continue
        spec = SPECIFICITY.get(tag_mode, 1)
        if spec > best_spec:
            best_spec = spec
            best_value = value
    if best_value is None:
        return True
    if best_value == "yes":
        return True
    if best_value == "private":
        return allow_private
    return False


ACCESS_TAG_TYPE = pa.list_(
    pa.struct([("mode", pa.string()), ("dir", pa.uint8()), ("value", pa.string())])
)

# modes precomputed as boolean columns on the edge table
ACCESS_MODES = ("foot", "bicycle", "motorcar", "bus", "hgv")


def access_columns(
    access_tags, dir_col, modes: tuple[str, ...] = ACCESS_MODES, allow_private: bool = False
) -> dict[str, np.ndarray]:
    """Per-mode accessible columns for an edge table.

    ``access_tags``: Arrow list<struct{mode,dir,value}> (None → no tags);
    ``dir_col``: per-row direction (0 outgoing / 1 incoming twin).
    Resolution runs once per DISTINCT (tag-list, dir) pair — edge tables
    repeat a handful of tag shapes, so this is build-time cheap.
    """
    tag_lists = access_tags.to_pylist() if hasattr(access_tags, "to_pylist") else list(access_tags)
    dirs = np.asarray(dir_col, dtype=np.int64)
    out = {m: np.ones(len(tag_lists), dtype=bool) for m in modes}
    cache: dict[tuple, dict[str, bool]] = {}
    for i, (tl, d) in enumerate(zip(tag_lists, dirs)):
        tl_t = (
            tuple((t["mode"], int(t["dir"]), t["value"]) for t in tl) if tl else ()
        )
        key = (tl_t, int(d))
        hit = cache.get(key)
        if hit is None:
            hit = {
                m: resolve_access(list(tl_t), m, int(d), allow_private) for m in modes
            }
            cache[key] = hit
        for m in modes:
            out[m][i] = hit[m]
    return out


def class_weight_column(road_class) -> np.ndarray:
    """road_class strings → uint32 Dijkstra weights (unknown → 50)."""
    vals = road_class.to_pylist() if hasattr(road_class, "to_pylist") else list(road_class)
    return np.asarray(
        [ROAD_CLASS_WEIGHT.get(v, 50) if v is not None else 50 for v in vals],
        dtype=np.uint32,
    )
