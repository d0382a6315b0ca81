"""Speed-limit parser family: blanket / per-lane / conditional /
transport-mode-restricted ``maxspeed*`` tags → effective km/h at a probe
context, vectorized over probe timestamps.

Port of the reference's speed-limit parser family
(``routers_codec/src/osm/parsers/speed_limit/{limit,restriction,collection}.rs``
and ``parsers/primitives/{speed,condition}.rs``), faithful to its quirks:

- ``CONDITION_PATTERN = \\(([^)]+)\\)`` / ``VALUE_PATTERN =
  ^\\s*(\\d+)(?:\\s*([^\\s(]+))?`` (``speed_limit/mod.rs:20-21``): the value
  must START with digits, so bare ``maxspeed=none``/``walk``/``variable``
  fail the value regex and the whole entry is DROPPED
  (``limit.rs:79-89`` returns None) — the non-numeric SpeedValue variants
  are only reachable via an explicit unit suffix (``speed.rs:56-66``);
- unit conversion TRUNCATES to u16 (``speed.rs:28-40`` ``as u16``):
  20 mph → 32 km/h, 65 mph → 104, 5 knots → 9;
- restriction labels fold over ``label.split(':')`` with FIRST-match-wins
  for both transport mode and directionality (``restriction.rs:52-66``,
  ``acc.or(parse(section))``);
- per-lane variant whenever the label CONTAINS ``lanes``
  (``limit.rs:125-140``); empty lane slots (``20||20``) → None
  (``limit.rs:79-84``); ``conditions.lane`` is a NonZeroU8 used DIRECTLY
  as the vector index (``collection.rs:45-50``), so lane 1 selects the
  second slot and slot 0 is unreachable — mirrored as-is;
- ``relevant_limits`` filters on EXACT transport-mode equality (not the
  access hierarchy chain) and exact directionality
  (``collection.rs:31-43``);
- condition strings go through ``Condition::parse``
  (``condition.rs:321-390``): combined AND/OR first, then opening-hours
  TimeDate (with a quoted-comment strip, ``condition.rs:430-446``),
  season, road condition, vehicle property (operator longest-first:
  <=, >=, <, >, =), then vehicle usage whose ``Load(s)`` catch-all always
  succeeds (``condition.rs:484-508``) — making the reference's
  UserGroup/Purpose/StayDuration/Raw branches unreachable from
  ``parse()``; we mirror that reachability.

Evaluation (this engine's runtime surface — the reference stops at the
parse): TimeDate conditions evaluate against probe timestamps via the
ported ``OpeningHours.is_open_at`` (:mod:`routers_ray.access`); other
condition kinds evaluate against an optional ``env`` dict of runtime
signals (road state, season, vehicle properties, occupants, load);
a signal the env does not carry makes the condition False (the limit is
not known to apply). Combined nodes evaluate AND/OR element-wise.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import numpy as np

from .access import OpeningHours, parse_opening_hours

CONDITION_RE = re.compile(r"\(([^)]+)\)")
VALUE_RE = re.compile(r"^\s*(\d+)(?:\s*([^\s(]+))?")

# transport.rs strum serializations (land + water + rail; full list)
TRANSPORT_MODES = frozenset(
    (
        "access", "foot", "dog", "ski", "ski:nordic", "ski:alpine",
        "ski:telemark", "inline_skates", "horse", "portage", "bicycle",
        "electric_bicycle", "mtb", "cargo_bike", "kick_scooter", "carriage",
        "cycle_rickshaw", "hand_cart", "trailer", "caravan", "vehicle",
        "motor_vehicle", "motorcycle", "moped", "speed_pedelec", "mofa",
        "small_electric_vehicle", "motorcar", "motorhome", "tourist_bus",
        "coach", "goods", "hgv", "hgv_articulated", "bdouble",
        "agricultural", "auto_rickshaw", "nev", "golf_cart", "microcar",
        "atv", "ohv", "snowmobile", "psv", "bus", "taxi", "minibus",
        "share_taxi", "hov", "carpool", "car_sharing", "emergency",
        "hazmat", "hazmat:water", "school_bus", "disabled", "water_access",
        "swimming", "ice_skates", "boat", "motorboat", "sailboat", "canoe",
        "fishing_vessel", "ship", "passenger", "cargo", "bulk", "tanker",
        "tanker:gas", "tanker:oil", "tanker:chemical", "tanker:singlehull",
        "container", "imdg", "isps", "rail_access", "train", "tram", "metro",
    )
)

# direction.rs serializations relevant to speed-limit labels
DIRECTIONALITIES = frozenset(("both_ways", "forward", "backward"))

_SEASONS = frozenset(("winter", "summer", "spring", "autumn"))
_ROAD_CONDITIONS = frozenset(("wet", "dry", "snow", "ice", "rain", "fog"))
_VEHICLE_PROPS = frozenset(
    ("weight", "axleload", "length", "width", "height", "wheels", "draught")
)
_OPERATORS = ("<=", ">=", "<", ">", "=")  # condition.rs:457 search order


# ---------------------------------------------------------------------------
# SpeedValue (speed.rs)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class SpeedValue:
    """``SpeedValue`` (speed.rs:9-24): ``unit`` is one of kmh/mph/knots
    (numeric) or none/variable/inherited/walk (sentinels, value=None)."""

    unit: str
    value: int | None = None

    def in_kmh(self) -> int | None:
        """km/h with u16 TRUNCATION (speed.rs:28-40); sentinels → None."""
        if self.unit == "kmh":
            return self.value
        if self.unit == "mph":
            v = int(self.value * 1.609344)
            return min(v, 0xFFFF) or None
        if self.unit == "knots":
            v = int(self.value * 1.852)
            return min(v, 0xFFFF) or None
        return None


def parse_speed_value(value: str, unit: str) -> SpeedValue | None:
    """``SpeedValue::parse`` (speed.rs:49-68): value must be a NonZeroU16;
    unrecognised units default to km/h."""
    try:
        numeric = int(value)
    except ValueError:
        return None
    if not (1 <= numeric <= 0xFFFF):
        return None
    if unit in ("mph", "knots"):
        return SpeedValue(unit, numeric)
    if unit == "kph":
        return SpeedValue("kmh", numeric)
    if unit in ("variable", "inherited", "none", "walk"):
        return SpeedValue(unit)
    return SpeedValue("kmh", numeric)


# ---------------------------------------------------------------------------
# Condition (condition.rs)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class Condition:
    """One parsed condition node. ``kind`` ∈ time/season/road/property/
    hazmat/occupants/load/and/or; payload fields by kind."""

    kind: str
    hours: OpeningHours | None = None
    comment: str | None = None
    name: str | None = None  # season / road / load string / property name
    op: str | None = None
    value: float | None = None
    unit: str | None = None
    left: "Condition | None" = None
    right: "Condition | None" = None


def _parse_value_with_unit(s: str) -> tuple[float, str | None] | None:
    """``parse_value_with_unit`` (condition.rs:562-585): pure float, else
    leading-number + unit suffix."""
    try:
        return float(s), None
    except ValueError:
        pass
    m = re.match(r"^\s*(\d+(?:\.\d+)?)\s*(\S+)\s*$", s)
    if not m:
        return None
    return float(m.group(1)), m.group(2)


def parse_condition(s: str) -> Condition:
    """``Condition::parse`` (condition.rs:321-390). Total: the vehicle-usage
    ``Load`` catch-all means every string parses to SOME condition."""
    t = s.strip()
    if t.startswith("(") and t.endswith(")"):
        t = t[1:-1]

    # combined AND/OR first (condition.rs:327-332, 395-428)
    upper = t.upper()
    for token, kind in ((" AND ", "and"), (" OR ", "or")):
        pos = upper.find(token)
        if pos >= 0:
            left = parse_condition(t[:pos].strip())
            right = parse_condition(t[pos + len(token):].strip())
            return Condition(kind, left=left, right=right)

    # TimeDate via opening-hours, optional quoted comment (430-446)
    q = t.find('"')
    if q >= 0:
        hours_str = t[:q].strip()
        comment = t[q + 1 : (t.rfind('"') if t.rfind('"') > q else len(t))]
    else:
        hours_str, comment = t, None
    try:
        return Condition("time", hours=parse_opening_hours(hours_str), comment=comment)
    except ValueError:
        pass

    if t in _SEASONS:
        return Condition("season", name=t)
    if t in _ROAD_CONDITIONS:
        return Condition("road", name=t)

    # vehicle property with comparison (455-482)
    for op in _OPERATORS:
        pos = t.find(op)
        if pos >= 0:
            prop = t[:pos].strip()
            if prop in _VEHICLE_PROPS:
                vu = _parse_value_with_unit(t[pos + len(op):].strip())
                if vu is not None:
                    return Condition(
                        "property", name=prop, op=op, value=vu[0], unit=vu[1]
                    )
            break  # first operator occurrence decides (condition.rs:458-461)

    # vehicle usage (484-508): hazmat / occupants<op>N / Load catch-all
    if t == "hazmat":
        return Condition("hazmat")
    if t.startswith("occupants"):
        rest = t[len("occupants"):]
        for op in _OPERATORS:
            pos = rest.find(op)
            if pos >= 0:
                try:
                    count = int(rest[pos + len(op):].strip())
                except ValueError:
                    break
                return Condition("occupants", op=op, value=float(count))
    return Condition("load", name=t)


def _compare(op: str, lhs, rhs: float):
    if op == "<":
        return lhs < rhs
    if op == ">":
        return lhs > rhs
    if op == "<=":
        return lhs <= rhs
    if op == ">=":
        return lhs >= rhs
    return lhs == rhs


def condition_applies(
    cond: Condition, ts_us: np.ndarray, env: dict | None = None
) -> np.ndarray:
    """Element-wise truth of ``cond`` at each probe timestamp.

    Non-time kinds read runtime signals from ``env`` (``road``, ``season``,
    vehicle-property floats, ``occupants``, ``hazmat``, ``load``); an
    absent signal yields False — the restriction is not known to apply.
    """
    ts_us = np.asarray(ts_us, dtype=np.int64)
    if cond.kind == "time":
        return cond.hours.is_open_at(ts_us)
    if cond.kind == "and":
        return condition_applies(cond.left, ts_us, env) & condition_applies(
            cond.right, ts_us, env
        )
    if cond.kind == "or":
        return condition_applies(cond.left, ts_us, env) | condition_applies(
            cond.right, ts_us, env
        )
    env = env or {}
    if cond.kind == "season":
        flag = env.get("season") == cond.name
    elif cond.kind == "road":
        flag = env.get("road") == cond.name
    elif cond.kind == "property":
        sig = env.get(cond.name)
        flag = sig is not None and bool(_compare(cond.op, float(sig), cond.value))
    elif cond.kind == "occupants":
        sig = env.get("occupants")
        flag = sig is not None and bool(_compare(cond.op, float(sig), cond.value))
    elif cond.kind == "hazmat":
        flag = bool(env.get("hazmat", False))
    else:  # load
        flag = env.get("load") == cond.name
    return np.full(ts_us.shape, flag, dtype=bool)


# ---------------------------------------------------------------------------
# Speed-limit entries (limit.rs / restriction.rs / collection.rs)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class ConditionalSpeed:
    """``PossiblyConditionalSpeedLimit`` (limit.rs:23-35)."""

    speed: SpeedValue
    condition: Condition | None = None


@dataclass(frozen=True)
class SpeedLimitEntry:
    """``SpeedLimitEntry`` (limit.rs:117-120): restriction + blanket or
    per-lane limit. ``lanes is None`` ⇔ blanket."""

    mode: str | None
    directionality: str | None
    blanket: ConditionalSpeed | None = None
    lanes: tuple[ConditionalSpeed | None, ...] | None = None


def parse_restriction(label: str) -> tuple[str | None, str | None]:
    """``Restriction::parse_builder`` (restriction.rs:52-66): fold over
    ':'-sections, first parsing section wins per field."""
    mode: str | None = None
    dirn: str | None = None
    for section in label.split(":"):
        if mode is None and section in TRANSPORT_MODES:
            mode = section
        if dirn is None and section in DIRECTIONALITIES:
            dirn = section
    return mode, dirn


def parse_conditional_speed(value: str) -> ConditionalSpeed | None:
    """``PossiblyConditionalSpeedLimit::parse`` (limit.rs:70-89)."""
    if not value:
        return None
    cm = CONDITION_RE.search(value)
    condition = parse_condition(cm.group(1)) if cm else None
    vm = VALUE_RE.match(value)
    if not vm:
        return None
    speed = parse_speed_value(
        vm.group(1).lower(), (vm.group(2) or "").lower()
    )
    if speed is None:
        return None
    return ConditionalSpeed(speed, condition)


def parse_tag(label: str, value: str) -> SpeedLimitEntry | None:
    """``SpeedLimitEntry::parse_tag`` (limit.rs:122-143)."""
    mode, dirn = parse_restriction(label)
    if "lanes" in label:
        # split_terminator: ONLY a trailing '|' drops its empty final slot
        parts = value.split("|")
        if parts and parts[-1] == "":
            parts.pop()
        lanes = tuple(parse_conditional_speed(p) for p in parts)
        return SpeedLimitEntry(mode, dirn, lanes=lanes)
    blanket = parse_conditional_speed(value)
    if blanket is None:
        return None
    return SpeedLimitEntry(mode, dirn, blanket=blanket)


def parse_collection(tags: list[tuple[str, str]]) -> list[SpeedLimitEntry]:
    """``SpeedLimitCollection::parse`` (collection.rs:57-72): every tag
    whose key starts with ``maxspeed``, deterministically ordered (the
    reference sorts by Debug format; we sort by the source tag)."""
    entries = []
    for k, v in sorted(t for t in tags if t[0].startswith("maxspeed")):
        e = parse_tag(k, v)
        if e is not None:
            entries.append(e)
    return entries


def relevant_limits(
    entries: list[SpeedLimitEntry],
    mode: str,
    directionality: str = "both_ways",
    lane: int | None = None,
) -> list[ConditionalSpeed]:
    """``SpeedLimitCollection::relevant_limits`` (collection.rs:23-53):
    exact-mode / exact-directionality filters; per-lane entries need a
    lane and index it DIRECTLY (NonZeroU8 semantics — slot 0 unreachable).
    """
    out: list[ConditionalSpeed] = []
    for e in entries:
        if e.mode is not None and e.mode != mode:
            continue
        if e.directionality is not None and e.directionality != directionality:
            continue
        if e.lanes is not None:
            # lane is 1-based NonZeroU8 in the reference (collection.rs
            # lane?.get() as index — slot 0 unreachable); lane < 1 means
            # no lane context, so per-lane entries never apply
            if lane is None or not (1 <= lane < len(e.lanes)):
                continue
            limit = e.lanes[lane]
            if limit is not None:
                out.append(limit)
        elif e.blanket is not None:
            out.append(e.blanket)
    return out


def effective_limit_kmh(
    entries: list[SpeedLimitEntry],
    mode: str,
    directionality: str,
    lane: int | None,
    ts_us: np.ndarray,
    env: dict | None = None,
) -> np.ndarray:
    """Effective km/h at each probe timestamp (float; NaN = no limit).

    Engine policy over the reference's ``relevant_limits``: at each probe,
    conditional limits whose condition applies OVERRIDE unconditional ones
    (OSM conditional-value-overrides-base, as in the access evaluator);
    ties resolve to the most restrictive (minimum) speed. Limits whose
    speed is a sentinel (no km/h) never contribute.
    """
    ts_us = np.asarray(ts_us, dtype=np.int64)
    cands = relevant_limits(entries, mode, directionality, lane)
    uncond = np.inf
    cond_best = np.full(ts_us.shape, np.inf)
    for c in cands:
        kmh = c.speed.in_kmh()
        if kmh is None:
            continue
        if c.condition is None:
            uncond = min(uncond, float(kmh))
        else:
            applies = condition_applies(c.condition, ts_us, env)
            cond_best = np.where(
                applies, np.minimum(cond_best, float(kmh)), cond_best
            )
    out = np.where(np.isfinite(cond_best), cond_best, uncond)
    return np.where(np.isfinite(out), out, np.nan)
