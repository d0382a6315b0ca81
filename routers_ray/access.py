"""Time-conditional edge accessibility — a core subset of the reference's
conditional-access / opening-hours parser fleet
(``routers_codec/src/osm/parsers/{condition.rs,opening_hours.rs}``, ~1.1k
LoC; the reference resolves the most-specific matching access restriction
with default-allow, ``osm/mod.rs:200-235``).

Supported syntax (the OSM patterns that matter for routing):

    "no @ (Mo-Fr 07:00-19:00)"          — closed weekday working hours
    "yes @ (Sa,Su)"                     — open weekends only (else default)
    "no @ (22:00-06:00)"                — closed nightly (wrapping range)
    "no"                                — unconditionally closed
    "yes" / "" / None                   — unconditionally open

Evaluation is vectorized over int64 µs-epoch timestamps: each rule compiles
once to (value, weekday-mask, minute-ranges) and evaluates per batch with
NumPy — the compile-once / evaluate-per-batch split an actor stage needs.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import numpy as np

_DAYS = ["Mo", "Tu", "We", "Th", "Fr", "Sa", "Su"]
_DAY_IDX = {d: i for i, d in enumerate(_DAYS)}
_TIME_RE = re.compile(r"^(\d{1,2}):(\d{2})-(\d{1,2}):(\d{2})$")


@dataclass
class AccessRule:
    """One compiled conditional: ``value`` applies when (weekday ∈ mask) and
    (minute-of-day ∈ one of the ranges); otherwise the default holds."""

    value: bool  # the access value WHEN the condition matches
    day_mask: int  # bit i set = weekday i (Mo=0) matches
    ranges: list[tuple[int, int]]  # minute-of-day [start, end); end<start wraps

    unconditional: bool = False  # plain "yes"/"no" — value always applies


def _parse_days(tok: str) -> int:
    mask = 0
    for part in tok.split(","):
        part = part.strip()
        if "-" in part:
            a, b = part.split("-")
            ia, ib = _DAY_IDX[a], _DAY_IDX[b]
            i = ia
            while True:
                mask |= 1 << i
                if i == ib:
                    break
                i = (i + 1) % 7
        elif part:
            mask |= 1 << _DAY_IDX[part]
    return mask


def parse_access(expr: str | None, default: bool = True) -> AccessRule:
    """Compile one conditional-access expression. Unparseable conditions
    fall back to the default (the reference's default-allow posture)."""
    if expr is None or expr.strip() in ("", "yes"):
        return AccessRule(True, 0, [], unconditional=True)
    expr = expr.strip()
    if expr == "no":
        return AccessRule(False, 0, [], unconditional=True)
    m = re.match(r"^(yes|no)\s*@\s*\((.*)\)$", expr)
    if not m:
        return AccessRule(default, 0, [], unconditional=True)
    value = m.group(1) == "yes"
    day_mask = 0
    ranges: list[tuple[int, int]] = []
    for tok in m.group(2).split():
        tm = _TIME_RE.match(tok)
        if tm:
            h1, m1, h2, m2 = (int(g) for g in tm.groups())
            ranges.append((h1 * 60 + m1, h2 * 60 + m2))
        else:
            day_mask |= _parse_days(tok)
    if day_mask == 0:
        day_mask = 0b1111111  # no day constraint → every day
    if not ranges:
        ranges = [(0, 24 * 60)]
    return AccessRule(value, day_mask, ranges)


def evaluate(rule: AccessRule, ts_us: np.ndarray, default: bool = True) -> np.ndarray:
    """Vectorized accessibility at µs-epoch timestamps (UTC).

    When the condition matches, ``rule.value`` applies; otherwise the
    opposite of ``rule.value`` for restriction-style rules ("no @ …" means
    open outside the window), matching OSM conditional semantics where the
    conditional value overrides the implied base value.
    """
    ts_us = np.asarray(ts_us, dtype=np.int64)
    if rule.unconditional:
        return np.full(ts_us.shape, rule.value, dtype=bool)
    days_since_epoch = ts_us // 86_400_000_000
    weekday = (days_since_epoch + 3) % 7  # 1970-01-01 was a Thursday (Mo=0 → 3)
    minute = (ts_us // 60_000_000) % 1440
    day_ok = (np.uint32(rule.day_mask) >> weekday.astype(np.uint32)) & np.uint32(1)
    time_ok = np.zeros(ts_us.shape, dtype=bool)
    for start, end in rule.ranges:
        if end >= start:
            time_ok |= (minute >= start) & (minute < end)
        else:  # wrapping range (22:00-06:00)
            time_ok |= (minute >= start) | (minute < end)
    cond = day_ok.astype(bool) & time_ok
    # conditional value inside the window, its complement outside
    # ("no @ (Mo-Fr 07:00-19:00)" = closed weekday daytime, open otherwise)
    return np.where(cond, rule.value, not rule.value)


def access_mask_batch(conditions: list[str | None], ts_us: np.ndarray) -> np.ndarray:
    """(n_edges × n_ts) accessibility matrix — compile each distinct
    condition once, evaluate vectorized (the actor-stage shape)."""
    compiled: dict[str | None, AccessRule] = {}
    out = np.empty((len(conditions), np.asarray(ts_us).size), dtype=bool)
    for i, c in enumerate(conditions):
        rule = compiled.get(c)
        if rule is None:
            rule = parse_access(c)
            compiled[c] = rule
        out[i] = evaluate(rule, ts_us)
    return out
