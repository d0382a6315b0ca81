"""Speed-limit parser family vs the reference's own test matrix
(``speed_limit/test.rs``) plus an engine-vs-scalar-oracle fuzz."""

import numpy as np
import pytest

from routers_ray.oracle_match import (
    ACCESS_PROBES_US,
    _scalar_speed_kmh,
    _sl_cond_applies,
)
from routers_ray.speed_limit import (
    Condition,
    condition_applies,
    effective_limit_kmh,
    parse_collection,
    parse_condition,
    parse_restriction,
    parse_tag,
)

TS_MON_10 = 1704708000000000  # 2024-01-08 Mon 10:00 UTC
TS_MON_21 = 1704747600000000  # 2024-01-08 Mon 21:00 UTC
TS_SAT_14 = 1705154400000000  # 2024-01-13 Sat 14:00 UTC


# --- reference test.rs pins -------------------------------------------------


def test_blanket_plain():
    e = parse_tag("maxspeed", "50")
    assert e.mode is None and e.directionality is None
    assert e.blanket.speed.in_kmh() == 50 and e.blanket.condition is None


def test_blanket_mph_truncates():
    assert parse_tag("maxspeed", "20 mph").blanket.speed.in_kmh() == 32


def test_knots():
    assert parse_tag("maxspeed", "5 knots").blanket.speed.in_kmh() == 9


def test_transport_mode_label():
    e = parse_tag("maxspeed:hgv", "20 mph")
    assert e.mode == "hgv" and e.blanket.speed.in_kmh() == 32


def test_mode_and_directionality_label():
    e = parse_tag("maxspeed:bus:backward", "70")
    assert e.mode == "bus" and e.directionality == "backward"
    assert e.blanket.speed.in_kmh() == 70


def test_conditional_overnight():
    e = parse_tag("maxspeed:conditional", "130 @ (19:00-06:00)")
    assert e.mode is None and e.directionality is None
    c = e.blanket.condition
    assert c.kind == "time"
    # overnight 19:00-06:00: open at 21:00, closed at 10:00
    applies = condition_applies(c, np.array([TS_MON_10, TS_MON_21]))
    assert list(applies) == [False, True]


def test_lanes():
    e = parse_tag("maxspeed:lanes", "100|80|80|80|80|80")
    assert e.mode is None and e.blanket is None
    assert [l.speed.in_kmh() for l in e.lanes] == [100, 80, 80, 80, 80, 80]


def test_lanes_with_missing_slot():
    e = parse_tag("maxspeed:lanes", "|50")
    assert len(e.lanes) == 2
    assert e.lanes[0] is None and e.lanes[1].speed.in_kmh() == 50


def test_lanes_mph():
    e = parse_tag("maxspeed:lanes", "65 mph|65 mph|65 mph|25 mph")
    assert [l.speed.in_kmh() for l in e.lanes] == [104, 104, 104, 40]


def test_lanes_conditional():
    e = parse_tag(
        "maxspeed:lanes:conditional",
        "100 @ (22:00-06:00)|40 @ (Mo-Fr 07:00-9:00,16:00-20:00)|60",
    )
    assert [l.speed.in_kmh() for l in e.lanes] == [100, 40, 60]
    assert [None if l.condition is None else l.condition.kind for l in e.lanes] == [
        "time", "time", None,
    ]


def test_sentinels_dropped():
    # "none"/"walk" fail VALUE_PATTERN (no leading digits) → entry dropped,
    # matching limit.rs:79-89 (the enum variants need a numeric + unit)
    assert parse_tag("maxspeed", "none") is None
    assert parse_tag("maxspeed", "walk") is None
    assert parse_collection([("maxspeed", "none")]) == []
    # explicit sentinel unit parses but yields no km/h
    e = parse_tag("maxspeed", "30 none")
    assert e.blanket.speed.in_kmh() is None


def test_restriction_fold_first_wins():
    assert parse_restriction("maxspeed:hgv:backward") == ("hgv", "backward")
    assert parse_restriction("maxspeed:conditional") == (None, None)
    # first parsing section wins per field (restriction.rs fold with .or())
    assert parse_restriction("maxspeed:foot:hgv") == ("foot", None)
    assert parse_restriction("maxspeed:forward:backward")[1] == "forward"


# --- condition parse order (condition.rs:321-390) ---------------------------


@pytest.mark.parametrize(
    "text,kind",
    [
        ("Mo-Fr 07:00-19:00", "time"),
        ("24/7", "time"),
        ("winter", "season"),
        ("wet", "road"),
        ("snow", "road"),
        ("weight<7.5", "property"),
        ("height <= 3.5", "property"),
        ("hazmat", "hazmat"),
        ("occupants>1", "occupants"),
        # usage Load catch-all makes UserGroup/Purpose/StayDuration/Raw
        # unreachable from parse() — mirrored reference reachability
        ("destination", "load"),
        ("disabled", "load"),
        ("stay < 2 hours", "load"),
        ("Jan-Mar", "load"),  # months are not OpeningHoursParser surface
    ],
)
def test_condition_parse_order(text, kind):
    assert parse_condition(text).kind == kind


def test_combined_and_or():
    c = parse_condition("Sa-Su AND weight>7")
    assert c.kind == "and" and c.left.kind == "time" and c.right.kind == "property"
    c = parse_condition("(22:00-06:00 OR wet)")
    assert c.kind == "or"
    # OR with an unknowable side still applies when the time side does
    applies = condition_applies(c, np.array([TS_MON_10, TS_MON_21 + 7_200_000_000]))
    assert list(applies) == [False, True]
    # AND with an unknowable side never applies without an env signal
    c = parse_condition("22:00-06:00 AND wet")
    assert not condition_applies(c, np.array([TS_MON_21 + 7_200_000_000]))[0]
    assert condition_applies(
        c, np.array([TS_MON_21 + 7_200_000_000]), env={"road": "wet"}
    )[0]


def test_property_env_evaluation():
    c = parse_condition("weight>7.5")
    ts = np.array([TS_MON_10])
    assert not condition_applies(c, ts)[0]
    assert condition_applies(c, ts, env={"weight": 12.0})[0]
    assert not condition_applies(c, ts, env={"weight": 3.0})[0]


# --- effective-limit resolution ---------------------------------------------


def test_conditional_overrides_unconditional():
    entries = parse_collection(
        [("maxspeed", "100"), ("maxspeed:conditional", "130 @ (19:00-06:00)")]
    )
    out = effective_limit_kmh(
        entries, "motorcar", "both_ways", None, np.array([TS_MON_10, TS_MON_21])
    )
    assert list(out) == [100.0, 130.0]


def test_mode_exact_not_hierarchy():
    # relevant_limits uses EXACT mode equality (collection.rs:31-37) —
    # an hgv-only limit does not bind motorcar, and vice versa
    entries = parse_collection([("maxspeed:hgv", "60")])
    assert np.isnan(
        effective_limit_kmh(entries, "motorcar", "forward", None, np.array([TS_MON_10]))
    )[0]
    assert effective_limit_kmh(
        entries, "hgv", "forward", None, np.array([TS_MON_10])
    )[0] == 60.0


def test_directionality_filter():
    entries = parse_collection([("maxspeed:backward", "30"), ("maxspeed", "90")])
    fwd = effective_limit_kmh(entries, "motorcar", "forward", None, np.array([TS_MON_10]))
    bwd = effective_limit_kmh(entries, "motorcar", "backward", None, np.array([TS_MON_10]))
    assert fwd[0] == 90.0 and bwd[0] == 30.0


def test_lane_context():
    entries = parse_collection([("maxspeed:lanes", "100|80|60")])
    no_lane = effective_limit_kmh(entries, "motorcar", "forward", None, np.array([TS_MON_10]))
    lane1 = effective_limit_kmh(entries, "motorcar", "forward", 1, np.array([TS_MON_10]))
    assert np.isnan(no_lane)[0] and lane1[0] == 80.0


# --- engine vs independent scalar oracle fuzz --------------------------------

_FUZZ_KEYS = [
    "maxspeed", "maxspeed:conditional", "maxspeed:hgv", "maxspeed:bus",
    "maxspeed:forward", "maxspeed:backward", "maxspeed:hgv:forward",
    "maxspeed:lanes", "maxspeed:lanes:conditional",
]
_FUZZ_VALUES = [
    "50", "30 mph", "8 knots", "none", "120",
    "130 @ (19:00-06:00)", "60 @ (Mo-Fr 07:00-19:00)",
    "40 @ (Sa,Su; 22:00-06:00)", "80 @ wet", "70 @ (weight>7.5)",
    "90 @ (22:00-06:00 AND wet)", "90 @ (22:00-06:00 OR wet)",
    "100|80", "|50", "100 @ (22:00-06:00)|60", "20||20",
    "30 @ (Sa 10:00-14:00)", "110 @ (24/7)", "55 @ (Mo,We,Fr 6-18)",
]


def test_engine_matches_scalar_oracle_fuzz():
    rng = np.random.default_rng(123)
    probes = np.asarray(ACCESS_PROBES_US, dtype=np.int64)
    for _ in range(300):
        n_tags = int(rng.integers(1, 4))
        tags = [
            (
                _FUZZ_KEYS[int(rng.integers(0, len(_FUZZ_KEYS)))],
                _FUZZ_VALUES[int(rng.integers(0, len(_FUZZ_VALUES)))],
            )
            for _ in range(n_tags)
        ]
        mode = ["motorcar", "hgv", "bus"][int(rng.integers(0, 3))]
        dirn = ["forward", "backward"][int(rng.integers(0, 2))]
        lane = [None, 1, 2][int(rng.integers(0, 3))]
        entries = parse_collection(tags)
        got = effective_limit_kmh(entries, mode, dirn, lane, probes)
        tag_structs = [{"key": k, "value": v} for k, v in tags]
        for j, ts in enumerate(ACCESS_PROBES_US):
            want = _scalar_speed_kmh(tag_structs, mode, dirn, lane, ts)
            if want is None:
                assert np.isnan(got[j]), (tags, mode, dirn, lane, ts)
            else:
                assert got[j] == float(want), (tags, mode, dirn, lane, ts)


def test_scalar_cond_helper_sanity():
    assert _sl_cond_applies("19:00-06:00", TS_MON_21)
    assert not _sl_cond_applies("19:00-06:00", TS_MON_10)
    assert _sl_cond_applies("Sa,Su", TS_SAT_14)
    assert not _sl_cond_applies("wet", TS_MON_10)
