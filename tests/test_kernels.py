"""Geometry / cell / costing kernel tests against closed-form values."""

import numpy as np
import pytest

from routers_ray import cells, costing, geo


class TestGeo:
    def test_haversine_known(self):
        # SF → LA ≈ 559 km
        d = geo.haversine_m(-122.4194, 37.7749, -118.2437, 34.0522)
        assert d == pytest.approx(559_000, rel=0.01)

    def test_haversine_zero(self):
        assert geo.haversine_m(10.0, 20.0, 10.0, 20.0) == 0.0

    def test_bearing_cardinal(self):
        assert geo.bearing_deg(0.0, 0.0, 0.0, 1.0) == pytest.approx(0.0, abs=1e-9)
        assert geo.bearing_deg(0.0, 0.0, 1.0, 0.0) == pytest.approx(90.0, abs=1e-9)
        assert geo.bearing_deg(0.0, 1.0, 0.0, 0.0) == pytest.approx(180.0, abs=1e-9)

    def test_destination_roundtrip(self):
        lon, lat = geo.destination(151.20, -33.86, 45.0, 1000.0)
        d = geo.haversine_m(151.20, -33.86, lon, lat)
        assert d == pytest.approx(1000.0, rel=1e-6)

    def test_segment_projection(self):
        # point above the middle of a horizontal segment
        f = geo.segment_locate_fraction(0.5, 1.0, 0.0, 0.0, 1.0, 0.0)
        assert f == pytest.approx(0.5)
        # clamped beyond the end
        assert geo.segment_locate_fraction(2.0, 0.0, 0.0, 0.0, 1.0, 0.0) == 1.0
        # degenerate → NaN (reference returns None)
        assert np.isnan(geo.segment_locate_fraction(0.0, 0.0, 1.0, 1.0, 1.0, 1.0))

    def test_wrap_delta(self):
        assert geo.wrap_delta_deg(190.0) == pytest.approx(-170.0)
        assert geo.wrap_delta_deg(-190.0) == pytest.approx(170.0)
        assert geo.wrap_delta_deg(180.0) == pytest.approx(180.0)
        assert geo.wrap_delta_deg(-180.0) == pytest.approx(180.0)

    def test_complexity_straight_path_is_one(self):
        # reference doc example: straight = no deltas → 1.0
        assert geo.complexity_from_deltas([]) == 1.0
        assert geo.complexity_from_deltas([0.0, 0.0]) == 1.0

    def test_complexity_sharp_turn_zero(self):
        # ≥112.5° turn zeroes the whole path (entity.rs:283-291)
        assert geo.complexity_from_deltas([120.0]) == 0.0
        assert geo.complexity_from_deltas([0.0, -150.0, 0.0]) == 0.0

    def test_complexity_harmonic(self):
        c45 = float(np.cos(np.radians(45.0 * 0.8)))
        expected = 2.0 / (1.0 / 1.0 + 1.0 / c45)
        assert geo.complexity_from_deltas([0.0, 45.0]) == pytest.approx(expected)

    def test_headings_skip_sub_meter_pairs(self):
        lons = [0.0, 0.0, 1.0]
        lats = [0.0, 1e-9, 0.0]  # first hop < 1 m → dropped
        hs = geo.headings_from_positions(lons, lats)
        assert hs.size == 1


class TestCells:
    def test_tile_origin(self):
        x, y = cells.lonlat_to_tile(-180.0, 85.0511287, 2)
        assert (int(x), int(y)) == (0, 0)

    def test_tile_center_zoom1(self):
        x, y = cells.lonlat_to_tile(10.0, -10.0, 1)
        assert (int(x), int(y)) == (1, 1)

    def test_cell_roundtrip(self):
        rng = np.random.default_rng(0)
        lon = rng.uniform(-179, 179, 100)
        lat = rng.uniform(-80, 80, 100)
        for z in (3, 9, 15):
            c = cells.lonlat_to_cell(lon, lat, z)
            x, y, zz = cells.cell_decode(c)
            assert (zz == z).all()
            ex, ey = cells.lonlat_to_tile(lon, lat, z)
            assert (x == ex).all() and (y == ey).all()

    def test_parent_contains_child(self):
        c = cells.lonlat_to_cell(151.2, -33.86, 12)
        p = cells.cell_parent(c)
        assert p == cells.lonlat_to_cell(151.2, -33.86, 11)

    def test_disk_is_nine_cells(self):
        c = cells.lonlat_to_cell(10.0, 10.0, 8)
        disk = cells.cell_disk(c, 1)
        assert disk.shape == (1, 9)
        assert len(set(disk.ravel().tolist())) == 9
        assert int(np.asarray(c).ravel()[0] if np.ndim(c) else c) in set(disk.ravel().tolist())

    def test_bounds_roundtrip(self):
        x, y = cells.lonlat_to_tile(151.2, -33.86, 10)
        w, s, e, n = cells.tile_bounds(int(x), int(y), 10)
        assert w <= 151.2 <= e and s <= -33.86 <= n

    def test_covering_bbox(self):
        ids = cells.cells_covering_bbox(10.0, 10.0, 10.5, 10.4, 8)
        # every cell decodes back to zoom 8 and tiles tile the bbox corners
        _, _, zz = cells.cell_decode(ids)
        assert (zz == 8).all()
        assert cells.lonlat_to_cell(10.0, 10.0, 8) in set(ids.tolist())
        assert cells.lonlat_to_cell(10.5, 10.4, 8) in set(ids.tolist())

    def test_segment_covering(self):
        rows, cc = cells.segment_covering_cells(
            np.array([10.0]), np.array([10.0]), np.array([10.3]), np.array([10.2]), 8, 0.0, 0.0
        )
        assert (rows == 0).all()
        assert cells.lonlat_to_cell(10.0, 10.0, 8) in set(cc.tolist())
        assert cells.lonlat_to_cell(10.3, 10.2, 8) in set(cc.tolist())

    def test_hilbert_first_order(self):
        d = cells.hilbert_xy2d(np.array([0, 0, 1, 1]), np.array([0, 1, 1, 0]), 1)
        assert d.tolist() == [0, 1, 2, 3]

    def test_hilbert_locality(self):
        # consecutive hilbert ids are adjacent tiles
        z = 4
        n = 1 << z
        gx, gy = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
        d = cells.hilbert_xy2d(gx.ravel(), gy.ravel(), z)
        order = np.argsort(d)
        xs, ys = gx.ravel()[order], gy.ravel()[order]
        step = np.abs(np.diff(xs.astype(int))) + np.abs(np.diff(ys.astype(int)))
        assert (step == 1).all()


class TestCosting:
    def test_emission_zero_distance(self):
        assert int(costing.emission_cost(0.0)) == 100  # v=1 → cost=100

    def test_emission_monotonic(self):
        c = costing.emission_cost(np.array([0.0, 10.0, 25.0, 100.0, 1e9]))
        assert (np.diff(c.astype(np.int64)) >= 0).all()
        assert int(c[-1]) == int(100.0 / costing.EPSILON)  # clamp floor

    def test_emission_at_error_radius(self):
        # d = err → v = e^-1 → cost = 100·e
        assert int(costing.emission_cost(25.0)) == int(100.0 * np.e)

    def test_transition_perfect(self):
        assert costing.transition_cost(1.0, 1.0, 1.0) == 100

    def test_transition_clamped(self):
        assert costing.transition_score(0.0, 1.0, 1.0) == pytest.approx(np.sqrt(costing.EPSILON))

    def test_deviance(self):
        assert costing.deviance(100.0, 130.0) == pytest.approx(100.0 / 130.0)
        assert costing.deviance(5.0, 0.0) == 1.0
