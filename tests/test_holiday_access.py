"""PH/SH holiday tokens + stacked conditional clauses (the condition-
grammar long tail past the reference's single-clause ``condition.rs``):
parsing, vectorized evaluation against a holiday table, last-match-wins
stacking, and the bare opening-hours surface REJECTING holiday tokens
(reference fidelity: ``opening_hours.rs:9-40`` has no PH/SH weekday)."""

import numpy as np
import pytest

from routers_ray.access import (
    access_mask_batch_stacked,
    evaluate,
    evaluate_stacked,
    holiday_days,
    parse_access,
    parse_access_stacked,
    parse_opening_hours,
)

PH = holiday_days(["2024-01-01", "2024-12-25", "2024-12-26"])
SH = holiday_days(
    np.arange(np.datetime64("2024-07-01"), np.datetime64("2024-09-01"))
)

XMAS_10 = 1735120800000000  # 2024-12-25 Wed 10:00
MON_10 = 1704708000000000   # 2024-01-08 Mon 10:00 (plain weekday)
SH_MON = 1721037600000000   # 2024-07-15 Mon 10:00 (school holiday)
SAT_14 = 1723298400000000   # 2024-08-10 Sat 14:00 (SH weekend)
TS = np.array([XMAS_10, MON_10, SH_MON, SAT_14], dtype=np.int64)


class TestHolidayTokens:
    def test_ph_alone_closes_holidays_only(self):
        r = parse_access("no @ (PH)")
        np.testing.assert_array_equal(
            evaluate(r, TS, holidays=PH), [False, True, True, True]
        )

    def test_ph_ors_into_weekday_list(self):
        # closed weekdays-or-holidays during working hours
        r = parse_access("no @ (Mo-Fr,PH 08:00-18:00)")
        np.testing.assert_array_equal(
            evaluate(r, TS, holidays=PH), [False, False, False, True]
        )

    def test_sh_conjunction_with_weekdays(self):
        # SH ∨ Mo-Fr — separate tokens OR in the day predicate
        r = parse_access("no @ (SH Mo-Fr)")
        np.testing.assert_array_equal(
            evaluate(r, TS, school_holidays=SH),
            [False, False, False, False],
        )

    def test_month_and_holiday_conjunction(self):
        r = parse_access("no @ (Dec PH)")
        np.testing.assert_array_equal(
            evaluate(r, TS, holidays=PH), [False, True, True, True]
        )

    def test_missing_table_is_conservative(self):
        # no holiday calendar supplied → the PH token can never match
        r = parse_access("no @ (PH)")
        np.testing.assert_array_equal(evaluate(r, TS), [True] * 4)

    def test_missing_table_yes_value_stays_default_allow(self):
        """'yes @ (PH)' with no table must NOT flip to permanently closed:
        an unevaluable condition falls back to default-allow, exactly like
        an unparseable one."""
        r = parse_access("yes @ (PH)")
        np.testing.assert_array_equal(evaluate(r, TS), [True] * 4)
        sa = parse_access_stacked("yes @ (PH)")
        np.testing.assert_array_equal(evaluate_stacked(sa, TS), [True] * 4)

    def test_missing_table_mixed_group_still_evaluates(self):
        # Mo-Fr,PH with no table: weekday half still applies, PH inert
        r = parse_access("no @ (Mo-Fr,PH 08:00-18:00)")
        np.testing.assert_array_equal(evaluate(r, TS), [False, False, False, True])

    def test_bare_time_point_one_hour_window(self):
        """'PH 10:00' = [10:00, 11:00) on holidays — engine and the
        independent scalar oracle agree (the oracle used to drop the
        clause on a bare point)."""
        from routers_ray.oracle_match import _scalar_stacked_open

        sa = parse_access_stacked("no @ (PH 10:00)")
        got = evaluate_stacked(sa, TS, holidays=PH)
        np.testing.assert_array_equal(got, [False, True, True, True])
        ref = [_scalar_stacked_open("no @ (PH 10:00)", int(t)) for t in TS]
        # scalar oracle uses the 2024 module-level holiday list; Xmas is in it
        np.testing.assert_array_equal(got, ref)

    def test_opening_hours_reject_holiday_tokens(self):
        with pytest.raises(ValueError):
            parse_opening_hours("Mo-Fr,PH 08:00-18:00")


class TestStackedClauses:
    def test_last_match_wins(self):
        sa = parse_access_stacked("no @ (Mo-Fr 07:00-19:00); yes @ (PH)")
        # Xmas is a Wednesday 10:00: first clause closes, second reopens
        np.testing.assert_array_equal(
            evaluate_stacked(sa, TS, holidays=PH), [True, False, False, True]
        )

    def test_single_clause_matches_parse_access(self):
        for expr in ("no @ (Mo-Fr 07:00-19:00)", "yes @ (Sa,Su)"):
            a = evaluate(parse_access(expr), TS)
            b = evaluate_stacked(parse_access_stacked(expr), TS)
            np.testing.assert_array_equal(a, b, err_msg=expr)

    def test_bare_base_value(self):
        sa = parse_access_stacked("no; yes @ (Sa,Su)")
        np.testing.assert_array_equal(
            evaluate_stacked(sa, TS), [False, False, False, True]
        )

    def test_inner_group_chaining_not_split(self):
        # ';' INSIDE parens chains groups; outside it separates clauses
        sa = parse_access_stacked("no @ (Sa; Su 10:00-14:00); yes @ (PH)")
        assert len(sa.clauses) == 2
        assert len(sa.clauses[0][1]) == 2

    def test_unparseable_clause_asserts_nothing(self):
        sa = parse_access_stacked("designated @ sunrise-sunset")
        np.testing.assert_array_equal(evaluate_stacked(sa, TS), [True] * 4)

    def test_batch_matches_rowwise(self):
        conds = [
            None,
            "no @ (PH)",
            "no @ (Mo-Fr 07:00-19:00); yes @ (PH)",
            "yes @ (SH)",
        ]
        mat = access_mask_batch_stacked(conds, TS, PH, SH)
        for i, c in enumerate(conds):
            np.testing.assert_array_equal(
                mat[i], evaluate_stacked(parse_access_stacked(c), TS, PH, SH)
            )


class TestScalarOracleAgreement:
    def test_vectorized_equals_scalar_on_planted_grid(self):
        """Every planted condition × probe: access.py's bitmask path must
        agree with oracle_match's independent datetime+set recomputation."""
        from routers_ray.oracle_match import (
            HOLIDAY_PROBES_US,
            PUBLIC_HOLIDAYS_2024,
            SCHOOL_HOLIDAYS_2024,
            _HOLIDAY_CONDITIONS,
            _scalar_stacked_open,
        )

        ph = holiday_days(PUBLIC_HOLIDAYS_2024)
        sh = holiday_days(SCHOOL_HOLIDAYS_2024)
        probes = np.asarray(HOLIDAY_PROBES_US, dtype=np.int64)
        for cond in _HOLIDAY_CONDITIONS:
            vec = evaluate_stacked(parse_access_stacked(cond), probes, ph, sh)
            ref = [_scalar_stacked_open(cond, int(t)) for t in probes]
            np.testing.assert_array_equal(vec, ref, err_msg=str(cond))


# ---------------------------------------------------------------------------
# property fuzz: random grammar expressions, vectorized == scalar oracle
# ---------------------------------------------------------------------------

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_DAY_TOKS = ["Mo", "Tu", "We", "Th", "Fr", "Sa", "Su", "Mo-Fr", "Sa-Mo",
             "Sa,Su", "Mo,We,Fr", "PH", "SH", "Mo-Fr,PH", "Sa,SH"]
_MON_TOKS = ["Jan", "Dec", "Jan-Mar", "Nov-Feb", "Jul", "Jun,Aug"]
_TIME_TOKS = ["07:00-19:00", "22:00-06:00", "10:00-14:00",
              "07:00-09:00,16:00-19:00", "08:00", "7-19", "23:30"]


@st.composite
def _group(draw):
    parts = []
    if draw(st.booleans()):
        parts.append(draw(st.sampled_from(_MON_TOKS)))
    if draw(st.booleans()) or not parts:
        parts.append(draw(st.sampled_from(_DAY_TOKS)))
    if draw(st.booleans()):
        parts.append(draw(st.sampled_from(_TIME_TOKS)))
    return " ".join(parts)


@st.composite
def _expr(draw):
    n = draw(st.integers(1, 3))
    clauses = []
    for _ in range(n):
        val = draw(st.sampled_from(["yes", "no"]))
        groups = "; ".join(draw(_group()) for _ in range(draw(st.integers(1, 2))))
        clauses.append(f"{val} @ ({groups})")
    if draw(st.booleans()):
        clauses.insert(0, draw(st.sampled_from(["yes", "no"])))
    return "; ".join(clauses)


@settings(max_examples=150, deadline=None)
@given(_expr(), st.integers(0, 8))
def test_fuzz_vectorized_equals_scalar(expr, probe_i):
    """Random stacked/holiday expressions at every planted probe: the
    bitmask/vectorized evaluator and the independent datetime+set scalar
    must agree exactly (both see the same holiday tables)."""
    from routers_ray.oracle_match import HOLIDAY_PROBES_US, _scalar_stacked_open

    ts = np.asarray([HOLIDAY_PROBES_US[probe_i]], dtype=np.int64)
    from routers_ray.access import holiday_days as _hd
    from routers_ray.oracle_match import PUBLIC_HOLIDAYS_2024, SCHOOL_HOLIDAYS_2024

    got = evaluate_stacked(
        parse_access_stacked(expr), ts,
        holidays=_hd(PUBLIC_HOLIDAYS_2024),
        school_holidays=_hd(SCHOOL_HOLIDAYS_2024),
    )[0]
    want = _scalar_stacked_open(expr, int(ts[0]))
    assert bool(got) == bool(want), expr
