"""Time-conditional edge accessibility — the conditional-access /
opening-hours grammar of the reference's parser fleet
(``routers_codec/src/osm/parsers/primitives/{condition.rs,opening_hours.rs}``,
~1.1k LoC; the reference resolves the most-specific matching access
restriction with default-allow, ``osm/mod.rs:200-235``).

Supported conditional syntax (``value @ (condition)``):

    "no @ (Mo-Fr 07:00-19:00)"            — closed weekday working hours
    "yes @ (Sa,Su)"                       — open weekends only
    "no @ (22:00-06:00)"                  — closed nightly (wrapping range)
    "no @ (Jan-Mar)"                      — closed by month range
    "no @ (Nov-Feb Mo-Fr 07:00-09:00)"    — month ∧ weekday ∧ time
    "no @ (Mo-Fr 07:00-09:00,16:00-19:00)"— comma time-range lists
    "no @ (Sa; Su 10:00-14:00)"           — rule chaining: ANY group matches
    "no" / "yes" / "" / None              — unconditional
    "no @ (PH)" / "no @ (Mo-Fr,PH …)"     — OSM holiday tokens (PH public /
                                            SH school) against a supplied
                                            holiday table (holiday_days)
    "no @ (Mo-Fr 07:00-19:00); yes @ (PH)"— STACKED clauses (parse_access_
                                            stacked): top-level ';' splits
                                            paren-aware, last match wins

Plus the bare opening-hours surface mirrored from ``opening_hours.rs``:
``parse_opening_hours`` handles "24/7", "closed"/"off", ';'-chained rules,
full weekday names, bare-hour times ("7-19"), and single time points
(start + one hour, ``opening_hours.rs:276-283``).

Evaluation is vectorized over int64 µs-epoch timestamps: each rule compiles
once to (month-mask, weekday-mask, minute-ranges) groups and evaluates per
batch with NumPy — the compile-once / evaluate-per-batch split an actor
stage needs.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

import numpy as np

_DAYS = ["Mo", "Tu", "We", "Th", "Fr", "Sa", "Su"]
_DAY_IDX = {d: i for i, d in enumerate(_DAYS)}
_DAY_FULL = {
    "monday": 0, "tuesday": 1, "wednesday": 2, "thursday": 3,
    "friday": 4, "saturday": 5, "sunday": 6,
}
_MONTHS = ["Jan", "Feb", "Mar", "Apr", "May", "Jun",
           "Jul", "Aug", "Sep", "Oct", "Nov", "Dec"]
_MONTH_IDX = {m: i for i, m in enumerate(_MONTHS)}
_ALL_DAYS = 0b1111111
_ALL_MONTHS = 0b111111111111


def _day_of(tok: str) -> int | None:
    if tok in _DAY_IDX:
        return _DAY_IDX[tok]
    return _DAY_FULL.get(tok.lower())


class _ParseFail(Exception):
    pass


def _parse_days(tok: str) -> tuple[int, bool, bool]:
    """Weekday token → (7-bit mask, PH flag, SH flag). 'Mo-Fr', 'Sa,Su',
    'Mo', full names; ranges wrap the week (``Sa-Mo`` = Sa,Su,Mo); the OSM
    holiday tokens ``PH`` (public holiday) / ``SH`` (school holiday) may
    appear standalone or as comma-list members ("Mo-Fr,PH") and OR into
    the day predicate against a caller-supplied holiday table."""
    mask = 0
    ph = sh = False
    for part in tok.split(","):
        part = part.strip()
        if not part:
            continue
        if part == "PH":
            ph = True
            continue
        if part == "SH":
            sh = True
            continue
        if "-" in part:
            a, b = part.split("-", 1)
            ia, ib = _day_of(a), _day_of(b)
            if ia is None or ib is None:
                raise _ParseFail(tok)
            i = ia
            while True:
                mask |= 1 << i
                if i == ib:
                    break
                i = (i + 1) % 7
        else:
            i = _day_of(part)
            if i is None:
                raise _ParseFail(tok)
            mask |= 1 << i
    return mask, ph, sh


def _parse_months(tok: str) -> int:
    """Month token → 12-bit mask. 'Jan-Mar', 'Nov-Feb' (wraps), 'Dec',
    comma lists."""
    mask = 0
    for part in tok.split(","):
        part = part.strip()
        if not part:
            continue
        if "-" in part:
            a, b = part.split("-", 1)
            if a not in _MONTH_IDX or b not in _MONTH_IDX:
                raise _ParseFail(tok)
            i = _MONTH_IDX[a]
            ib = _MONTH_IDX[b]
            while True:
                mask |= 1 << i
                if i == ib:
                    break
                i = (i + 1) % 12
        else:
            if part not in _MONTH_IDX:
                raise _ParseFail(tok)
            mask |= 1 << _MONTH_IDX[part]
    return mask


_TIME_PART = re.compile(r"^(\d{1,2})(?::(\d{2}))?$")


def _parse_minute(tok: str) -> int:
    m = _TIME_PART.match(tok)
    if not m:
        raise _ParseFail(tok)
    h = int(m.group(1))
    mi = int(m.group(2) or 0)
    if h > 24 or mi > 59:  # Time::new bounds (opening_hours.rs:48-54)
        raise _ParseFail(tok)
    return h * 60 + mi


def _looks_like_time(tok: str) -> bool:
    """A token is a time spec iff it starts with a digit
    (``looks_like_time``, opening_hours.rs:198)."""
    return bool(tok) and tok[0].isdigit()


def _parse_times(tok: str) -> list[tuple[int, int]]:
    """Time token → [start, end) minute ranges. Comma lists; bare hours;
    a single time point spans one hour (opening_hours.rs:276-283)."""
    ranges: list[tuple[int, int]] = []
    for part in tok.split(","):
        part = part.strip()
        if not part:
            continue
        if "-" in part:
            a, b = part.split("-", 1)
            ranges.append((_parse_minute(a), _parse_minute(b)))
        else:
            start = _parse_minute(part)
            # A point ending exactly at midnight maps to end=00:00 (an
            # overnight range), matching Time::new(hour+1, …) in the
            # reference (opening_hours.rs:276-283): the end-inclusive
            # overnight check then also matches minute 0.
            ranges.append((start, (start + 60) % 1440))
    return ranges


@dataclass
class ConditionGroup:
    """One ';'-chained group: month ∧ (weekday ∨ holiday) ∧ time-of-day
    conjunction. ``ph``/``sh`` OR the public/school-holiday table into the
    day predicate; ``day_mask`` may be 0 when only a holiday token was
    given (holidays-only group)."""

    day_mask: int = _ALL_DAYS
    month_mask: int = _ALL_MONTHS
    ranges: list[tuple[int, int]] = field(default_factory=lambda: [(0, 1440)])
    ph: bool = False
    sh: bool = False


@dataclass
class AccessRule:
    """Compiled conditional: ``value`` applies when ANY group matches;
    otherwise the complement (OSM conditional-value-overrides-base)."""

    value: bool
    groups: list[ConditionGroup]
    unconditional: bool = False  # plain "yes"/"no" — value always applies


def _parse_group(text: str) -> ConditionGroup:
    day_mask = 0
    month_mask = 0
    ph = sh = False
    ranges: list[tuple[int, int]] = []
    for tok in text.split():
        if _looks_like_time(tok):
            ranges.extend(_parse_times(tok))
        elif tok.split(",")[0].split("-")[0] in _MONTH_IDX:
            month_mask |= _parse_months(tok)
        else:
            m, p, s = _parse_days(tok)
            day_mask |= m
            ph |= p
            sh |= s
    return ConditionGroup(
        # a holidays-only group keeps day_mask=0: weekdays contribute
        # nothing and the holiday table is the whole day predicate
        day_mask=day_mask if (day_mask or ph or sh) else _ALL_DAYS,
        month_mask=month_mask or _ALL_MONTHS,
        ranges=ranges or [(0, 1440)],
        ph=ph,
        sh=sh,
    )


def parse_access(expr: str | None, default: bool = True) -> AccessRule:
    """Compile one conditional-access expression. Unparseable conditions
    fall back to the default (the reference's default-allow posture)."""
    if expr is None or expr.strip() in ("", "yes"):
        return AccessRule(True, [], unconditional=True)
    expr = expr.strip()
    if expr == "no":
        return AccessRule(False, [], unconditional=True)
    m = re.match(r"^(yes|no)\s*@\s*\((.*)\)$", expr)
    if not m:
        return AccessRule(default, [], unconditional=True)
    value = m.group(1) == "yes"
    try:
        groups = [_parse_group(g) for g in m.group(2).split(";") if g.strip()]
    except _ParseFail:
        return AccessRule(default, [], unconditional=True)
    if not groups:
        return AccessRule(default, [], unconditional=True)
    return AccessRule(value, groups)


def _month_index(ts_us: np.ndarray) -> np.ndarray:
    """Vectorized month-of-year (Jan=0) from µs epoch, UTC."""
    months = ts_us.astype("datetime64[us]").astype("datetime64[M]")
    return (months.astype(np.int64) % 12 + 12) % 12


def holiday_days(dates) -> np.ndarray:
    """Normalize a holiday table ('YYYY-MM-DD' strings, datetime64[D]
    values, or day numbers) to int64 days-since-epoch for the vectorized
    PH/SH membership test."""
    arr = np.asarray(list(dates) if not isinstance(dates, np.ndarray) else dates)
    if arr.size == 0:
        return np.empty(0, np.int64)
    if arr.dtype.kind in ("U", "S", "O", "M"):
        return arr.astype("datetime64[D]").astype(np.int64)
    return arr.astype(np.int64)


def _group_matches(
    g: ConditionGroup,
    ts_us: np.ndarray,
    holidays: np.ndarray | None = None,
    school_holidays: np.ndarray | None = None,
) -> np.ndarray:
    days_since_epoch = ts_us // 86_400_000_000
    weekday = (days_since_epoch + 3) % 7  # 1970-01-01 was a Thursday (Mo=0 → 3)
    minute = (ts_us // 60_000_000) % 1440
    ok = ((np.uint32(g.day_mask) >> weekday.astype(np.uint32)) & np.uint32(1)).astype(bool)
    # holiday tokens OR into the day predicate ("Mo-Fr,PH"); a group with
    # PH/SH but no supplied table can never match through that token (the
    # conservative read: an unknown holiday calendar asserts nothing)
    if g.ph and holidays is not None and holidays.size:
        ok |= np.isin(days_since_epoch, holidays)
    if g.sh and school_holidays is not None and school_holidays.size:
        ok |= np.isin(days_since_epoch, school_holidays)
    if g.month_mask != _ALL_MONTHS:
        month = _month_index(ts_us)
        ok &= ((np.uint32(g.month_mask) >> month.astype(np.uint32)) & np.uint32(1)).astype(bool)
    time_ok = np.zeros(ts_us.shape, dtype=bool)
    for start, end in g.ranges:
        if end >= start:
            time_ok |= (minute >= start) & (minute < end)
        else:  # wrapping range (22:00-06:00)
            time_ok |= (minute >= start) | (minute < end)
    return ok & time_ok


def _group_matchable(
    g: ConditionGroup,
    holidays: np.ndarray | None,
    school_holidays: np.ndarray | None,
) -> bool:
    """Can this group EVER match given the supplied holiday tables? A
    holiday-only group (day_mask 0) with its table absent cannot — its
    condition is unevaluable, not false."""
    if g.day_mask:
        return True
    return (g.ph and holidays is not None and holidays.size > 0) or (
        g.sh and school_holidays is not None and school_holidays.size > 0
    )


def evaluate(
    rule: AccessRule,
    ts_us: np.ndarray,
    default: bool = True,
    holidays: np.ndarray | None = None,
    school_holidays: np.ndarray | None = None,
) -> np.ndarray:
    """Vectorized accessibility at µs-epoch timestamps (UTC).

    When any chained group matches, ``rule.value`` applies; otherwise the
    opposite ("no @ …" means open outside the window), matching OSM
    conditional semantics where the conditional value overrides the
    implied base value. ``holidays``/``school_holidays`` (from
    :func:`holiday_days`) feed the PH/SH tokens. A rule whose EVERY group
    is unevaluable (holiday-only groups with no table supplied) falls
    back to ``default`` — the unparseable-condition posture, so
    "yes @ (PH)" without a holiday calendar stays open rather than
    flipping to permanently closed.
    """
    ts_us = np.asarray(ts_us, dtype=np.int64)
    if rule.unconditional:
        return np.full(ts_us.shape, rule.value, dtype=bool)
    live = [g for g in rule.groups if _group_matchable(g, holidays, school_holidays)]
    if not live:
        return np.full(ts_us.shape, default, dtype=bool)
    cond = np.zeros(ts_us.shape, dtype=bool)
    for g in live:
        cond |= _group_matches(g, ts_us, holidays, school_holidays)
    return np.where(cond, rule.value, not rule.value)


@dataclass
class StackedAccess:
    """A full OSM conditional-restriction VALUE: ``v1 @ (c1); v2 @ (c2)``
    top-level clauses (paren-aware split — ';' also chains groups INSIDE
    a clause's parens) over an optional bare base value. Evaluation is
    last-match-wins: clauses apply in order and a later matching clause
    overrides an earlier one (OSM conditional-restrictions stacking)."""

    base: bool
    clauses: list[tuple[bool, list[ConditionGroup]]]
    explicit_base: bool = False  # a bare yes/no clause set the base


def _split_top(expr: str) -> list[str]:
    """Split on ';' at paren depth 0 only."""
    parts, depth, start = [], 0, 0
    for i, ch in enumerate(expr):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth = max(0, depth - 1)
        elif ch == ";" and depth == 0:
            parts.append(expr[start:i])
            start = i + 1
    parts.append(expr[start:])
    return [p for p in (s.strip() for s in parts) if p]


_CLAUSE_RE = re.compile(r"^(yes|no)\s*@\s*\((.*)\)$", re.S)


def parse_access_stacked(expr: str | None, default: bool = True) -> StackedAccess:
    """Compile a stacked conditional-access expression ("no @ (Mo-Fr
    07:00-19:00); yes @ (PH)"). A bare yes/no clause sets the base;
    unparseable clauses are dropped (default-allow posture, matching
    :func:`parse_access`)."""
    if expr is None or not expr.strip():
        return StackedAccess(default, [])
    base: bool | None = None
    clauses: list[tuple[bool, list[ConditionGroup]]] = []
    for piece in _split_top(expr.strip()):
        if piece in ("yes", "no"):
            base = piece == "yes"
            continue
        m = _CLAUSE_RE.match(piece)
        if not m:
            continue  # unparseable clause → asserts nothing
        try:
            groups = [_parse_group(g) for g in m.group(2).split(";") if g.strip()]
        except _ParseFail:
            continue
        if groups:
            clauses.append((m.group(1) == "yes", groups))
    explicit = base is not None
    if base is None:
        # no bare base value: the complement of the first clause's value
        # (matches parse_access's single-clause conditional-overrides-base
        # semantics: "yes @ (Sa,Su)" alone means closed on other days)
        base = (not clauses[0][0]) if clauses else default
    return StackedAccess(base, clauses, explicit_base=explicit)


def evaluate_stacked(
    sa: StackedAccess,
    ts_us: np.ndarray,
    holidays: np.ndarray | None = None,
    school_holidays: np.ndarray | None = None,
) -> np.ndarray:
    """Vectorized stacked evaluation: base value, then each clause in
    order overrides where its condition matches (last match wins).
    Clauses whose every group is unevaluable (holiday-only, no table)
    assert nothing; if NO clause is evaluable and the base was only
    inferred (no bare yes/no), the whole expression falls back to open —
    the unparseable posture of :func:`evaluate`."""
    ts_us = np.asarray(ts_us, dtype=np.int64)
    live = [
        (v, gs)
        for v, gs in sa.clauses
        if any(_group_matchable(g, holidays, school_holidays) for g in gs)
    ]
    if sa.clauses and not live and not sa.explicit_base:
        return np.full(ts_us.shape, True, dtype=bool)
    out = np.full(ts_us.shape, sa.base, dtype=bool)
    for value, groups in live:
        cond = np.zeros(ts_us.shape, dtype=bool)
        for g in groups:
            if not _group_matchable(g, holidays, school_holidays):
                continue
            cond |= _group_matches(g, ts_us, holidays, school_holidays)
        out = np.where(cond, value, out)
    return out


def access_mask_batch(
    conditions: list[str | None],
    ts_us: np.ndarray,
    holidays: np.ndarray | None = None,
    school_holidays: np.ndarray | None = None,
) -> np.ndarray:
    """(n_edges × n_ts) accessibility matrix — compile each distinct
    condition once, evaluate vectorized (the actor-stage shape)."""
    compiled: dict[str | None, AccessRule] = {}
    out = np.empty((len(conditions), np.asarray(ts_us).size), dtype=bool)
    for i, c in enumerate(conditions):
        rule = compiled.get(c)
        if rule is None:
            rule = parse_access(c)
            compiled[c] = rule
        out[i] = evaluate(rule, ts_us, holidays=holidays, school_holidays=school_holidays)
    return out


def access_mask_batch_stacked(
    conditions: list[str | None],
    ts_us: np.ndarray,
    holidays: np.ndarray | None = None,
    school_holidays: np.ndarray | None = None,
) -> np.ndarray:
    """Stacked-clause twin of :func:`access_mask_batch` (multi-clause
    conditional values + PH/SH holiday tokens)."""
    compiled: dict[str | None, StackedAccess] = {}
    out = np.empty((len(conditions), np.asarray(ts_us).size), dtype=bool)
    for i, c in enumerate(conditions):
        sa = compiled.get(c)
        if sa is None:
            sa = parse_access_stacked(c)
            compiled[c] = sa
        out[i] = evaluate_stacked(sa, ts_us, holidays, school_holidays)
    return out


# ---------------------------------------------------------------------------
# bare opening-hours surface (``opening_hours.rs`` mirror)
# ---------------------------------------------------------------------------


@dataclass
class OpeningRule:
    """``OpeningRule { weekdays, times, closed }``
    (opening_hours.rs:107-112). ``day_mask=None`` = no weekday
    restriction."""

    day_mask: int | None
    times: list[tuple[int, int]]
    closed: bool = False


@dataclass
class OpeningHours:
    rules: list[OpeningRule]

    def is_open_at(self, ts_us: np.ndarray) -> np.ndarray:
        """Open iff ANY non-closed rule matches (``is_open_at``,
        opening_hours.rs:311-338). End-inclusive time ranges
        (``time_in_range``, :341-355); we check weekday ranges properly
        where the reference leaves Range as a matched-for-now TODO."""
        ts_us = np.asarray(ts_us, dtype=np.int64)
        weekday = ((ts_us // 86_400_000_000) + 3) % 7
        minute = (ts_us // 60_000_000) % 1440
        out = np.zeros(ts_us.shape, dtype=bool)
        for r in self.rules:
            if r.closed:
                continue
            ok = (
                np.ones(ts_us.shape, dtype=bool)
                if r.day_mask is None
                else ((np.uint32(r.day_mask) >> weekday.astype(np.uint32)) & np.uint32(1)).astype(bool)
            )
            t_ok = np.zeros(ts_us.shape, dtype=bool)
            for start, end in r.times:
                if start <= end:
                    t_ok |= (minute >= start) & (minute <= end)
                else:  # overnight
                    t_ok |= (minute >= start) | (minute <= end)
            out |= ok & t_ok
        return out


def parse_opening_hours(expr: str) -> OpeningHours:
    """Parse an opening_hours value (``OpeningHoursParser::parse``,
    opening_hours.rs:143-174): '24/7', 'closed'/'off', ';'-separated
    rules of [weekdays] time-ranges. Raises ValueError on garbage —
    the reference returns Err."""
    text = expr.strip()
    if not text:
        raise ValueError("No rules")
    if text == "24/7":
        return OpeningHours([OpeningRule(None, [(0, 1440)], closed=False)])
    rules = []
    for part in text.split(";"):
        part = part.strip()
        if not part:
            continue
        if part.lower() in ("closed", "off"):
            rules.append(OpeningRule(None, [], closed=True))
            continue
        day_mask: int | None = None
        times: list[tuple[int, int]] = []
        try:
            for tok in part.split():
                if _looks_like_time(tok):
                    times.extend(_parse_times(tok))
                else:
                    m, ph, sh = _parse_days(tok)
                    if ph or sh:
                        # the reference's Weekday::from_str has no holiday
                        # tokens (opening_hours.rs:9-40) — bare opening
                        # hours reject them; only the conditional-access
                        # grammar (ConditionGroup) understands PH/SH
                        raise _ParseFail(tok)
                    day_mask = (day_mask or 0) | m
        except _ParseFail as exc:
            raise ValueError(f"Invalid rule part: {part}") from exc
        if not times:
            times = [(0, 1440)]
        rules.append(OpeningRule(day_mask, times, closed=False))
    if not rules:
        raise ValueError("No rules")
    return OpeningHours(rules)
