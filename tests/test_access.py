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


# ---------------------------------------------------------------------------
# round-3 grammar breadth: months, chaining, opening-hours surface
# ---------------------------------------------------------------------------

JAN6_MON_2025 = 20094  # days since epoch for 2025-01-06 (a Monday)


def ts_day(days: int, hour: int, minute: int = 0) -> int:
    return ((days * 24 + hour) * 60 + minute) * 60_000_000


def test_month_range_closed():
    rule = parse_access("no @ (Jan-Mar)")
    jan = ts_day(JAN6_MON_2025, 12)
    jun = ts_day(JAN6_MON_2025 + 31 + 28 + 31 + 30 + 31, 12)  # 2025-06-06
    out = evaluate(rule, np.array([jan, jun]))
    assert out.tolist() == [False, True]


def test_month_range_wraps_year():
    rule = parse_access("no @ (Nov-Feb)")
    jan = ts_day(JAN6_MON_2025, 12)
    dec = ts_day(JAN6_MON_2025 + 340, 12)  # 2025-12-12
    jul = ts_day(JAN6_MON_2025 + 31 + 28 + 31 + 30 + 31 + 30 + 10, 12)
    out = evaluate(rule, np.array([jan, dec, jul]))
    assert out.tolist() == [False, False, True]


def test_month_weekday_time_conjunction():
    rule = parse_access("no @ (Jan Mo-Fr 07:00-09:00)")
    mon_jan_8 = ts_day(JAN6_MON_2025, 8)
    mon_jan_12 = ts_day(JAN6_MON_2025, 12)
    sat_jan_8 = ts_day(JAN6_MON_2025 + 5, 8)
    mon_feb_8 = ts_day(JAN6_MON_2025 + 28, 8)  # 2025-02-03 is a Monday
    out = evaluate(rule, np.array([mon_jan_8, mon_jan_12, sat_jan_8, mon_feb_8]))
    assert out.tolist() == [False, True, True, True]


def test_rule_chaining_any_group():
    rule = parse_access("no @ (Sa; Su 10:00-14:00)")
    sat_8 = ts_day(JAN6_MON_2025 + 5, 8)
    sun_12 = ts_day(JAN6_MON_2025 + 6, 12)
    sun_8 = ts_day(JAN6_MON_2025 + 6, 8)
    mon_12 = ts_day(JAN6_MON_2025, 12)
    out = evaluate(rule, np.array([sat_8, sun_12, sun_8, mon_12]))
    assert out.tolist() == [False, False, True, True]


def test_comma_time_range_list():
    rule = parse_access("no @ (Mo-Fr 07:00-09:00,16:00-19:00)")
    out = evaluate(
        rule,
        np.array([ts_day(JAN6_MON_2025, 8), ts_day(JAN6_MON_2025, 12), ts_day(JAN6_MON_2025, 17)]),
    )
    assert out.tolist() == [False, True, False]


def test_bad_month_token_falls_back_default():
    rule = parse_access("no @ (Jam-Mar)")
    assert rule.unconditional and rule.value  # default allow


def test_opening_hours_surface():
    from routers_ray.access import parse_opening_hours

    oh = parse_opening_hours("Mo-Fr 09:00-17:00; Sa 10:00-14:00")
    assert len(oh.rules) == 2
    mon_noon = ts_day(JAN6_MON_2025, 12)
    mon_8 = ts_day(JAN6_MON_2025, 8)
    sat_11 = ts_day(JAN6_MON_2025 + 5, 11)
    sat_15 = ts_day(JAN6_MON_2025 + 5, 15)
    out = oh.is_open_at(np.array([mon_noon, mon_8, sat_11, sat_15]))
    assert out.tolist() == [True, False, True, False]

    assert parse_opening_hours("24/7").is_open_at(np.array([mon_8]))[0]
    closed = parse_opening_hours("closed")
    assert not closed.is_open_at(np.array([mon_noon]))[0]
    # full names + bare hours + single time point (one-hour span)
    oh2 = parse_opening_hours("Monday-Friday 7-19")
    assert oh2.is_open_at(np.array([ts_day(JAN6_MON_2025, 12)]))[0]
    assert not oh2.is_open_at(np.array([ts_day(JAN6_MON_2025 + 5, 12)]))[0]
    oh3 = parse_opening_hours("Mo 09:30")
    assert oh3.is_open_at(np.array([ts_day(JAN6_MON_2025, 10, 0)]))[0]
    assert not oh3.is_open_at(np.array([ts_day(JAN6_MON_2025, 11, 0)]))[0]
    import pytest as _pytest

    with _pytest.raises(ValueError):
        parse_opening_hours("")
    with _pytest.raises(ValueError):
        parse_opening_hours("Mo-Xx 09:00-17:00")


def test_month_condition_matches_datetime_brute():
    """Property: the vectorized month/weekday/time evaluation agrees with
    a per-timestamp datetime recomputation over a year of random probes."""
    import datetime as dt

    rng = np.random.default_rng(77)
    rule = parse_access("no @ (Nov-Feb Mo-Fr 07:00-19:00; Jul)")
    t0 = int(dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc).timestamp() * 1_000_000)
    probes = t0 + rng.integers(0, 366 * 86_400_000_000, 500)
    got = evaluate(rule, probes)
    for ts_us, g in zip(probes.tolist(), got.tolist()):
        d = dt.datetime.fromtimestamp(ts_us / 1e6, tz=dt.timezone.utc)
        in_g1 = (
            d.month in (11, 12, 1, 2)
            and d.weekday() < 5
            and (7 * 60 <= d.hour * 60 + d.minute < 19 * 60)
        )
        in_g2 = d.month == 7
        expect = not (in_g1 or in_g2)
        assert g == expect, d.isoformat()
