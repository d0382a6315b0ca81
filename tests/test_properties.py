"""Property / robustness tests: index-vs-brute equivalence on pseudo-random
points (reference ``primitive/index.rs:129-203``), hypothesis round-trips,
degenerate pipeline inputs."""

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from routers_ray import cells, geo
from routers_ray.matcher import MatchOptions, match_trajectory
from routers_ray.network import CellNetwork, build_network_store, fatten_edges, synth_network
from routers_ray.spans import DOCS_SCHEMA


@pytest.fixture(scope="module")
def net_world():
    nodes, edges = synth_network(seed=7, n_cities=1, grid=(10, 10))
    fat = fatten_edges(nodes, edges)
    return nodes, edges, CellNetwork.from_edge_rows(fat), fat


def test_candidate_index_matches_bruteforce_2000_points(net_world):
    """Cell-binned candidate search ≡ brute-force square-box scan over all
    edges, for 2000 pseudo-random points (reference R-tree equivalence
    test, ``index.rs:129-203``)."""
    nodes, edges, net, fat = net_world
    rng = np.random.default_rng(123)
    lon0 = float(np.asarray(nodes["lon"]).mean())
    lat0 = float(np.asarray(nodes["lat"]).mean())
    qlon = lon0 + rng.uniform(-0.008, 0.008, 2000)
    qlat = lat0 + rng.uniform(-0.008, 0.008, 2000)

    ax, ay = np.asarray(fat["ax"]), np.asarray(fat["ay"])
    bx, by = np.asarray(fat["bx"]), np.asarray(fat["by"])
    lo_x, hi_x = np.minimum(ax, bx), np.maximum(ax, bx)
    lo_y, hi_y = np.minimum(ay, by), np.maximum(ay, by)
    eid = np.asarray(fat["edge_id"])
    edir = np.asarray(fat["dir"])

    offsets, rows, frac, px, py, dist = net.candidates_batch(qlon, qlat, 50.0)
    for i in range(2000):
        got = {(int(net.edge_id[r]), int(net.dir[r])) for r in rows[offsets[i] : offsets[i + 1]]}
        # brute: square box via the same destination math
        _, north = geo.destination(qlon[i], qlat[i], 0.0, 50.0)
        east, _ = geo.destination(qlon[i], qlat[i], 90.0, 50.0)
        _, south = geo.destination(qlon[i], qlat[i], 180.0, 50.0)
        west, _ = geo.destination(qlon[i], qlat[i], 270.0, 50.0)
        hit = (hi_x >= west) & (lo_x <= east) & (hi_y >= south) & (lo_y <= north)
        want = {(int(a), int(b)) for a, b in zip(eid[hit], edir[hit])}
        assert got == want, f"point {i}: index={got} brute={want}"


@settings(max_examples=200, deadline=None)
@given(
    lon=st.floats(-179.99, 179.99),
    lat=st.floats(-84.9, 84.9),
    z=st.integers(1, 20),
)
def test_cell_roundtrip_property(lon, lat, z):
    c = cells.lonlat_to_cell(lon, lat, z)
    x, y, zz = cells.cell_decode(c)
    assert int(zz) == z
    w, s, e, n = cells.tile_bounds(int(x), int(y), z)
    assert w - 1e-9 <= lon <= e + 1e-9
    # the clamped-latitude cell still contains the (clamped) point
    lat_c = min(max(lat, -85.05112878), 85.05112878)
    assert s - 1e-7 <= lat_c <= n + 1e-7


@settings(max_examples=100, deadline=None)
@given(
    lon1=st.floats(-179, 179), lat1=st.floats(-84, 84),
    lon2=st.floats(-179, 179), lat2=st.floats(-84, 84),
)
def test_haversine_metric_properties(lon1, lat1, lon2, lat2):
    d12 = float(geo.haversine_m(lon1, lat1, lon2, lat2))
    d21 = float(geo.haversine_m(lon2, lat2, lon1, lat1))
    assert d12 == pytest.approx(d21, rel=1e-12, abs=1e-9)  # symmetry
    assert d12 >= 0.0
    assert float(geo.haversine_m(lon1, lat1, lon1, lat1)) == 0.0


@settings(max_examples=100, deadline=None)
@given(v=st.integers(-(2**31), 2**31 - 1))
def test_zigzag_roundtrip_property(v):
    from routers_ray.functions import zigzag_decode, zigzag_encode

    arr = np.array([v], dtype=np.int32)
    assert int(zigzag_decode(zigzag_encode(arr))[0]) == v


@settings(max_examples=50, deadline=None)
@given(prec=st.integers(1, 8), lon=st.floats(-179, 179), lat=st.floats(-84, 84))
def test_geohash_decode_within_cell(prec, lon, lat):
    h = cells.geohash_encode([lon], [lat], prec)[0]
    dl, db = cells.geohash_decode([h])
    # cell size shrinks 32× per char; center within half a cell of the input
    lon_err = 360.0 / (2 ** ((prec * 5 + 1) // 2))
    lat_err = 180.0 / (2 ** (prec * 5 // 2))
    assert abs(dl[0] - lon) <= lon_err
    assert abs(db[0] - lat) <= lat_err


class TestDegenerateInputs:
    def test_single_point_doc(self, net_world):
        nodes, edges, net, fat = net_world
        lon0 = float(np.asarray(nodes["lon"]).mean())
        lat0 = float(np.asarray(nodes["lat"]).mean())
        res = match_trajectory(net, [lon0], [lat0])
        assert len(res.layers) == 1 and res.layers[0].seq == 0
        assert res.layers[0].hop_lons.size == 0

    def test_two_identical_points(self, net_world):
        nodes, edges, net, fat = net_world
        lon0 = float(np.asarray(nodes["lon"]).mean())
        lat0 = float(np.asarray(nodes["lat"]).mean())
        res = match_trajectory(net, [lon0, lon0], [lat0, lat0])
        assert len(res.layers) == 2
        assert res.layers[0].edge_id == res.layers[1].edge_id

    def test_empty_docs_dataset(self, ray_session, tmp_path):
        import ray.data as rd

        from routers_ray.pipelines.match_pipeline import match_documents

        nodes, edges = synth_network(seed=7, n_cities=1, grid=(4, 4))
        store = str(tmp_path / "s")
        build_network_store(nodes, edges, store, use_ray=False)
        empty = pa.Table.from_pylist([], schema=DOCS_SCHEMA)
        ds = rd.from_arrow(empty)
        out = match_documents(ds, store, concurrency=1, batch_size=8)
        assert out.count() == 0

    def test_long_doc_tail_window(self, net_world):
        nodes, edges, net, fat = net_world
        lons = np.asarray(nodes["lon"])[:30]
        lats = np.asarray(nodes["lat"])[:30]
        res = match_trajectory(net, lons, lats, MatchOptions(max_layers=5, drop_unanchored=True))
        assert len(res.layers) <= 5


# ---------------------------------------------------------------------------
# round-2 property tests: access resolution, dated ranges, S2 hierarchy


_MODES = ["foot", "bicycle", "motorcar", "bus", "hgv"]
_TAG_MODES = ["all", "vehicle", "motor_vehicle", "bicycle", "foot", "psv", "bus", "goods", "hgv"]


@given(
    tags=st.lists(
        st.tuples(
            st.sampled_from(_TAG_MODES),
            st.sampled_from([0, 1, 2]),
            st.sampled_from(["yes", "no", "private"]),
        ),
        max_size=5,
    ),
    mode=st.sampled_from(_MODES),
    direction=st.sampled_from([0, 1]),
    allow_private=st.booleans(),
)
@settings(max_examples=200, deadline=None)
def test_access_resolution_matches_brute(tags, mode, direction, allow_private):
    """resolve_access == a direct transcription of the reference rule:
    filter applicable (chain ∋ tag mode, direction matches), take the
    first most-specific, map the value; default allow."""
    from routers_ray.metadata import SPECIFICITY, TRANSPORT_CHAIN, resolve_access

    chain = set(TRANSPORT_CHAIN[mode])
    applicable = [
        (SPECIFICITY[m], v)
        for m, d, v in tags
        if m in chain and (d == 2 or (d == 0 and direction == 0) or (d == 1 and direction == 1))
    ]
    if not applicable:
        expected = True
    else:
        best = -1
        val = None
        for s, v in applicable:
            if s > best:
                best, val = s, v
        expected = val == "yes" or (val == "private" and allow_private)
    assert resolve_access(tags, mode, direction, allow_private) is expected


@given(
    start=st.integers(min_value=19000, max_value=20000),
    span=st.integers(min_value=0, max_value=60),
    wd=st.sets(st.integers(min_value=0, max_value=6), min_size=1),
    off_us=st.integers(min_value=0, max_value=90 * 86_400_000_000),
)
@settings(max_examples=200, deadline=None)
def test_dated_range_matches_datetime_brute(start, span, wd, off_us):
    """DatedRange.within_us == python-datetime brute evaluation."""
    import datetime as dt

    from routers_ray.tiles import DatedRange

    r = DatedRange(start, start + span, frozenset(wd))
    ts = start * 86_400_000_000 - 5 * 86_400_000_000 + off_us
    got = bool(r.within_us(np.asarray([ts]))[0])
    t = dt.datetime(1970, 1, 1, tzinfo=dt.timezone.utc) + dt.timedelta(microseconds=ts)
    lo = dt.datetime(1970, 1, 1, tzinfo=dt.timezone.utc) + dt.timedelta(days=start)
    hi = dt.datetime(1970, 1, 1, tzinfo=dt.timezone.utc) + dt.timedelta(days=start + span)
    expected = (lo <= t <= hi) and (t.weekday() in wd)
    assert got == expected


@given(
    lon=st.floats(min_value=-179.9, max_value=179.9, allow_nan=False),
    lat=st.floats(min_value=-85.0, max_value=85.0, allow_nan=False),
    level=st.integers(min_value=2, max_value=20),
)
@settings(max_examples=150, deadline=None)
def test_s2_parent_contains_child_property(lon, lat, level):
    from routers_ray.strategy import S2Strategy

    child = S2Strategy(level).locate(np.asarray([lon]), np.asarray([lat]))
    parent = S2Strategy(level - 1).locate(np.asarray([lon]), np.asarray([lat]))
    assert np.array_equal(S2Strategy(level).parent(child), parent)


_DAY_TOKENS = ["Mo", "Tu", "We", "Th", "Fr", "Sa", "Su"]
_MON_TOKENS = ["Jan", "Feb", "Mar", "Apr", "May", "Jun",
               "Jul", "Aug", "Sep", "Oct", "Nov", "Dec"]


@given(
    da=st.integers(0, 6), db=st.integers(0, 6),
    ma=st.integers(0, 11), mb=st.integers(0, 11),
    h1=st.integers(0, 23), m1=st.integers(0, 59),
    h2=st.integers(0, 23), m2=st.integers(0, 59),
    use_months=st.booleans(), use_days=st.booleans(), use_time=st.booleans(),
    value=st.booleans(),
    probe_day=st.integers(0, 365), probe_min=st.integers(0, 1439),
)
@settings(max_examples=250, deadline=None)
def test_access_grammar_matches_datetime_brute(
    da, db, ma, mb, h1, m1, h2, m2, use_months, use_days, use_time, value,
    probe_day, probe_min,
):
    """Random month-range × weekday-range × time-window conditionals agree
    with a per-timestamp datetime recomputation (wrapping ranges included)."""
    import datetime as dt

    from routers_ray.access import evaluate, parse_access

    parts = []
    if use_months:
        parts.append(f"{_MON_TOKENS[ma]}-{_MON_TOKENS[mb]}")
    if use_days:
        parts.append(f"{_DAY_TOKENS[da]}-{_DAY_TOKENS[db]}")
    if use_time:
        parts.append(f"{h1:02d}:{m1:02d}-{h2:02d}:{m2:02d}")
    if not parts:
        parts = ["Mo-Su"]
    expr = f"{'yes' if value else 'no'} @ ({' '.join(parts)})"
    rule = parse_access(expr)

    base = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    t = base + dt.timedelta(days=probe_day, minutes=probe_min)
    ts = int(t.timestamp() * 1_000_000)
    got = bool(evaluate(rule, np.asarray([ts]))[0])

    def wrap_in(i, a, b, n):
        # membership of i in the a..b range that wraps modulo n
        return (a <= i <= b) if a <= b else (i >= a or i <= b)

    ok = True
    if use_months:
        ok &= wrap_in(t.month - 1, ma, mb, 12)
    if use_days:
        ok &= wrap_in(t.weekday(), da, db, 7)
    minute = t.hour * 60 + t.minute
    s, e = h1 * 60 + m1, h2 * 60 + m2
    if use_time:
        ok &= (s <= minute < e) if e >= s else (minute >= s or minute < e)
    # no explicit day/time token → all days / all minutes (parse defaults)
    expected = value if ok else (not value)
    assert got == expected, expr


@given(
    seed=st.integers(0, 10_000),
    na=st.integers(1, 12),
    nb=st.integers(1, 12),
)
@settings(max_examples=120, deadline=None)
def test_hausdorff_kernel_matches_scalar_brute(seed, na, nb):
    """The vectorized symmetric-Hausdorff kernel equals a scalar
    max-of-min double loop, and is symmetric / zero on identical sets."""
    import math

    from routers_ray.pipelines.queries import hausdorff_m, hav_m

    rng = np.random.default_rng(seed)
    lon_a = rng.uniform(-180.0, 179.9, na)
    lat_a = rng.uniform(-85.0, 84.9, na)
    lon_b = rng.uniform(-180.0, 179.9, nb)
    lat_b = rng.uniform(-85.0, 84.9, nb)

    def directed(l1, p1, l2, p2):
        return max(
            min(float(hav_m(l1[i], p1[i], l2[j], p2[j])) for j in range(l2.size))
            for i in range(l1.size)
        )

    brute = max(directed(lon_a, lat_a, lon_b, lat_b), directed(lon_b, lat_b, lon_a, lat_a))
    got = hausdorff_m(lon_a, lat_a, lon_b, lat_b)
    assert math.isclose(got, brute, rel_tol=0.0, abs_tol=0.0), (got, brute)
    # symmetry + identity
    assert hausdorff_m(lon_b, lat_b, lon_a, lat_a) == got
    assert hausdorff_m(lon_a, lat_a, lon_a, lat_a) == 0.0


@given(
    seed=st.integers(0, 10_000),
    n=st.integers(1, 200),
    n_users=st.integers(1, 8),
    n_splits=st.integers(1, 6),
)
@settings(max_examples=100, deadline=None)
def test_od_first_last_partials_are_split_invariant(seed, n, n_users, n_splits):
    """Per-batch first/last partials merged across an arbitrary batch split
    equal the single-pass global first/last per user (the combiner law
    behind q_od_flows); duplicate (ts, eid) keys allowed."""
    from routers_ray.pipelines.queries import od_first_last

    rng = np.random.default_rng(seed)
    uid = rng.integers(0, n_users, n).astype(np.int64)
    ts = rng.integers(0, 50, n).astype(np.int64)  # heavy ts ties
    eid = rng.permutation(n).astype(np.int64)

    f, l = od_first_last(uid, eid, ts)
    want = {
        int(uid[i]): ((int(ts[i]), int(eid[i])), (int(ts[j]), int(eid[j])))
        for i, j in zip(f.tolist(), l.tolist())
    }

    # random split → per-split partials → merge by (ts, eid) min/max
    cuts = np.sort(rng.integers(0, n + 1, n_splits - 1)) if n_splits > 1 else np.array([], np.int64)
    merged: dict[int, tuple] = {}
    for lo, hi in zip(np.r_[0, cuts], np.r_[cuts, n]):
        if hi <= lo:
            continue
        u, e, t = uid[lo:hi], eid[lo:hi], ts[lo:hi]
        pf, pl = od_first_last(u, e, t)
        for i, j in zip(pf.tolist(), pl.tolist()):
            k = int(u[i])
            fk, lk = (int(t[i]), int(e[i])), (int(t[j]), int(e[j]))
            if k in merged:
                of, ol = merged[k]
                merged[k] = (min(of, fk), max(ol, lk))
            else:
                merged[k] = (fk, lk)
    assert merged == want


@given(seed=st.integers(0, 10_000), n=st.integers(2, 20))
@settings(max_examples=150, deadline=None)
def test_crossing_count_matches_exact_rational_brute(seed, n):
    """The vectorized float orientation test equals an exact-rational
    (Fraction) proper-intersection brute count on integer random walks
    (where doubles are exact, the float predicate IS the exact one)."""
    from fractions import Fraction

    from routers_ray.pipelines.queries import crossing_count

    rng = np.random.default_rng(seed)
    # small-step integer random walk → frequent genuine crossings + ties
    steps = rng.integers(-3, 4, size=(n, 2))
    pts = np.cumsum(steps, axis=0)
    lon = pts[:, 0].astype(np.float64)
    lat = pts[:, 1].astype(np.float64)

    def ccw(ax, ay, bx, by, cx, cy):
        return (Fraction(bx) - ax) * (Fraction(cy) - ay) - (Fraction(by) - ay) * (Fraction(cx) - ax)

    m = n - 1
    brute = 0
    for i in range(m):
        for j in range(i + 2, m):
            a = (pts[i], pts[i + 1])
            b = (pts[j], pts[j + 1])
            d1 = ccw(*a[0], *a[1], *b[0])
            d2 = ccw(*a[0], *a[1], *b[1])
            d3 = ccw(*b[0], *b[1], *a[0])
            d4 = ccw(*b[0], *b[1], *a[1])
            if d1 * d2 < 0 and d3 * d4 < 0:
                brute += 1
    assert crossing_count(lon, lat) == brute


@given(
    seed=st.integers(0, 10_000),
    zipf_a=st.floats(1.2, 2.5),
    k=st.integers(2, 64),
    n_chunks=st.integers(1, 8),
)
@settings(max_examples=100, deadline=None)
def test_mg_merge_never_drops_a_true_heavy(seed, zipf_a, k, n_chunks):
    """Mergeable Misra-Gries guarantee: after arbitrary chunking, per-chunk
    summaries and a merge, every item with count > n/(k+1) survives as a
    candidate (the no-false-negative property heavy_hitters' exact recount
    relies on)."""
    from routers_ray.sketch import mg_merge, mg_summary

    rng = np.random.default_rng(seed)
    vals = rng.zipf(zipf_a, 5000)
    vals = vals[vals < 100_000]
    if vals.size == 0:
        return
    chunks = np.array_split(rng.permutation(vals), n_chunks)
    ks_all, cs_all = [], []
    for ch in chunks:
        if ch.size == 0:
            continue
        u, c = np.unique(ch, return_counts=True)
        a, b = mg_summary(u, c.astype(np.int64), k)
        ks_all.append(a), cs_all.append(b)
    mk, _ = mg_merge(
        np.concatenate(ks_all), np.concatenate(cs_all).astype(np.int64), k
    )
    u, c = np.unique(vals, return_counts=True)
    heavies = set(u[c > vals.size / (k + 1)].tolist())
    assert heavies <= set(mk.tolist())
    assert mk.size <= k


@given(seed=st.integers(0, 10_000), n=st.integers(0, 500), n_splits=st.integers(1, 6))
@settings(max_examples=80, deadline=None)
def test_extent_boxes_partials_are_split_invariant(seed, n, n_splits):
    """extent_boxes_of partials merged by (min, max, sum) across an
    arbitrary batch split equal the single-pass global boxes (the
    combiner law behind extent_cells), empty splits included."""
    from routers_ray.pipelines.queries import Z_EXTENT, extent_boxes_of

    rng = np.random.default_rng(seed)
    lon = rng.uniform(-180.0, 179.9, n)
    lat = rng.uniform(-85.0, 85.0, n)

    def merge(tables):
        import pandas as pd

        df = pd.concat([t.to_pandas() for t in tables], ignore_index=True)
        if df.empty:
            return df
        return (
            df.groupby(["x", "y"], as_index=False)
            .agg(min_lon=("min_lon", "min"), max_lon=("max_lon", "max"),
                 min_lat=("min_lat", "min"), max_lat=("max_lat", "max"),
                 n=("n", "sum"))
            .sort_values(["x", "y"]).reset_index(drop=True)
        )

    want = merge([extent_boxes_of(lon, lat, Z_EXTENT)])
    cuts = np.sort(rng.integers(0, n + 1, n_splits - 1)) if n_splits > 1 else np.array([], np.int64)
    parts = [
        extent_boxes_of(lon[lo:hi], lat[lo:hi], Z_EXTENT)
        for lo, hi in zip(np.r_[0, cuts], np.r_[cuts, n])
    ]
    got = merge(parts)
    import pandas as pd

    if want.empty:
        assert got.empty
    else:
        pd.testing.assert_frame_equal(
            got[want.columns].reset_index(drop=True), want, check_dtype=False
        )
