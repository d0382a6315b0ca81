"""Conditional-access evaluator tests (core subset of
``osm/parsers/{condition.rs,opening_hours.rs}`` semantics)."""

import numpy as np

from routers_ray.access import access_mask_batch, evaluate, parse_access


def ts(year_day_offset_days: int, hour: int, minute: int = 0) -> int:
    """µs epoch for 1970-01-01 (Thursday) + offset days at hour:minute UTC."""
    return ((year_day_offset_days * 24 + hour) * 60 + minute) * 60_000_000


MONDAY = 4  # 1970-01-05 was a Monday
SATURDAY = 2  # 1970-01-03


def test_unconditional():
    assert evaluate(parse_access("yes"), np.array([ts(0, 12)]))[0]
    assert not evaluate(parse_access("no"), np.array([ts(0, 12)]))[0]
    assert evaluate(parse_access(None), np.array([ts(0, 12)]))[0]
    assert evaluate(parse_access(""), np.array([ts(0, 12)]))[0]


def test_weekday_window_closed():
    rule = parse_access("no @ (Mo-Fr 07:00-19:00)")
    # Monday 12:00 → closed; Monday 20:00 → open; Saturday 12:00 → open
    out = evaluate(rule, np.array([ts(MONDAY, 12), ts(MONDAY, 20), ts(SATURDAY, 12)]))
    assert out.tolist() == [False, True, True]


def test_weekend_only_open():
    rule = parse_access("yes @ (Sa,Su)")
    out = evaluate(rule, np.array([ts(SATURDAY, 10), ts(MONDAY, 10)]))
    assert out.tolist() == [True, False]


def test_wrapping_night_closure():
    rule = parse_access("no @ (22:00-06:00)")
    out = evaluate(rule, np.array([ts(MONDAY, 23), ts(MONDAY, 3), ts(MONDAY, 12)]))
    assert out.tolist() == [False, False, True]


def test_day_range_wraps_week():
    rule = parse_access("no @ (Sa-Mo)")  # Sa, Su, Mo
    out = evaluate(rule, np.array([ts(SATURDAY, 12), ts(MONDAY, 12), ts(MONDAY + 1, 12)]))
    assert out.tolist() == [False, False, True]  # Tuesday open


def test_unparseable_falls_back_to_default():
    rule = parse_access("designated @ sunrise-sunset")
    assert evaluate(rule, np.array([ts(0, 12)]))[0]  # default allow


def test_boundary_minutes():
    rule = parse_access("no @ (07:00-19:00)")
    out = evaluate(
        rule,
        np.array([ts(MONDAY, 6, 59), ts(MONDAY, 7, 0), ts(MONDAY, 18, 59), ts(MONDAY, 19, 0)]),
    )
    assert out.tolist() == [True, False, False, True]  # [start, end)


def test_batch_matrix():
    conds = ["yes", "no", "no @ (Mo-Fr 07:00-19:00)", None]
    t = np.array([ts(MONDAY, 12), ts(SATURDAY, 12)])
    m = access_mask_batch(conds, t)
    assert m.shape == (4, 2)
    assert m[0].tolist() == [True, True]
    assert m[1].tolist() == [False, False]
    assert m[2].tolist() == [False, True]
    assert m[3].tolist() == [True, True]
