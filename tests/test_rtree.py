"""STR-packed R-tree: packing invariants and brute-force parity for the
vectorized frontier traversals (point containment, radius intersect,
expanding-radius kNN candidate gather)."""

import numpy as np
import pytest

from routers_ray.rtree import STRtree, knn_candidates


def _rand_boxes(rng, n):
    w = rng.uniform(-180, 175, n)
    s = rng.uniform(-85, 80, n)
    return np.column_stack([w, s, w + rng.uniform(0.1, 8, n), s + rng.uniform(0.1, 8, n)])


def _pairs(qi, ii):
    return set(zip(qi.tolist(), ii.tolist()))


class TestPacking:
    @pytest.mark.parametrize("n", [0, 1, 2, 15, 16, 17, 100, 1000])
    def test_every_item_in_exactly_one_leaf(self, n):
        rng = np.random.default_rng(n + 1)
        t = STRtree(_rand_boxes(rng, n))
        assert sorted(t.item_order.tolist()) == list(range(n))

    def test_parents_contain_children(self):
        rng = np.random.default_rng(7)
        t = STRtree(_rand_boxes(rng, 500))
        below = t.item_boxes
        for boxes, starts, ends in reversed(t.levels):
            for j in range(boxes.shape[0]):
                c = below[starts[j]:ends[j]]
                assert boxes[j, 0] <= c[:, 0].min() and boxes[j, 1] <= c[:, 1].min()
                assert boxes[j, 2] >= c[:, 2].max() and boxes[j, 3] >= c[:, 3].max()
            below = boxes

    def test_root_is_single_node(self):
        rng = np.random.default_rng(9)
        t = STRtree(_rand_boxes(rng, 300))
        assert t.levels[0][0].shape[0] == 1


class TestQueries:
    @pytest.mark.parametrize("n,q", [(1, 50), (40, 200), (500, 300)])
    def test_point_containment_matches_brute(self, n, q):
        rng = np.random.default_rng(n * 31 + q)
        boxes = _rand_boxes(rng, n)
        t = STRtree(boxes)
        lons = rng.uniform(-180, 180, q)
        lats = rng.uniform(-85, 85, q)
        qi, ii = t.query_points(lons, lats)
        got = _pairs(qi, ii)
        inside = (
            (lons[:, None] >= boxes[None, :, 0])
            & (lons[:, None] <= boxes[None, :, 2])
            & (lats[:, None] >= boxes[None, :, 1])
            & (lats[:, None] <= boxes[None, :, 3])
        )
        want = _pairs(*np.nonzero(inside))
        assert got == want

    def test_radius_matches_brute(self):
        rng = np.random.default_rng(3)
        boxes = _rand_boxes(rng, 300)
        t = STRtree(boxes)
        lons = rng.uniform(-180, 180, 150)
        lats = rng.uniform(-85, 85, 150)
        r = 3.0
        qi, ii = t.query_radius_deg(lons, lats, r)
        hit = np.zeros((lons.size, boxes.shape[0]), dtype=bool)
        for shift in (0.0, -360.0, 360.0):  # the tree wraps longitude
            ql = lons + shift
            hit |= (
                (ql[:, None] + r >= boxes[None, :, 0])
                & (ql[:, None] - r <= boxes[None, :, 2])
                & (lats[:, None] + r >= boxes[None, :, 1])
                & (lats[:, None] - r <= boxes[None, :, 3])
            )
        assert _pairs(qi, ii) == _pairs(*np.nonzero(hit))

    def test_empty_tree_returns_nothing(self):
        t = STRtree(np.empty((0, 4)))
        qi, ii = t.query_points(np.array([0.0]), np.array([0.0]))
        assert qi.size == 0 and ii.size == 0


class TestKnnCandidates:
    def test_superset_of_true_knn(self):
        """The exact refine over the candidates must equal brute-force
        top-k by haversine with (dist, id) tie order."""
        from routers_ray.pipelines.queries import hav_m

        rng = np.random.default_rng(11)
        n, q, k = 60, 120, 3
        plon = rng.uniform(-170, 170, n)
        plat = rng.uniform(-80, 80, n)
        boxes = np.column_stack([plon, plat, plon, plat])  # degenerate point boxes
        t = STRtree(boxes)
        lons = rng.uniform(-170, 170, q)
        lats = rng.uniform(-80, 80, q)
        d_all = hav_m(lons[:, None], lats[:, None], plon[None, :], plat[None, :])
        qi, ii = knn_candidates(t, lons, lats, k, dist_m=lambda a, b: d_all[a, b])
        want = np.argsort(d_all, axis=1, kind="stable")[:, :k]
        for p in range(q):
            cand = ii[qi == p]
            d = d_all[p, cand]
            order = np.argsort(d, kind="stable")
            got = cand[order][:k]
            # exact refine over the candidate set reproduces brute top-k
            np.testing.assert_array_equal(np.sort(got), np.sort(want[p]))

    def test_antimeridian_neighbors_found(self):
        """The degree box does not wrap but the metric does: stations
        straddling lon ±180 must still yield the true haversine top-k
        (the naive non-wrapping early stop returns the wrong set)."""
        from routers_ray.pipelines.queries import hav_m

        plon = np.array([179.6, 179.7, 179.8, -179.9, 170.0, -170.0])
        plat = np.zeros(6)
        t = STRtree(np.column_stack([plon, plat, plon, plat]))
        lons = np.array([179.9, -179.95, 178.0])
        lats = np.zeros(3)
        k = 3
        d_all = hav_m(lons[:, None], lats[:, None], plon[None, :], plat[None, :])
        qi, ii = knn_candidates(
            t, lons, lats, k, r0_deg=1.0, dist_m=lambda a, b: d_all[a, b]
        )
        want = np.argsort(d_all, axis=1, kind="stable")[:, :k]
        for p in range(lons.size):
            cand = ii[qi == p]
            got = cand[np.argsort(d_all[p, cand], kind="stable")][:k]
            np.testing.assert_array_equal(np.sort(got), np.sort(want[p]))

    def test_every_point_gets_at_least_k(self):
        rng = np.random.default_rng(13)
        plon = rng.uniform(-10, 10, 25)
        plat = rng.uniform(-10, 10, 25)
        t = STRtree(np.column_stack([plon, plat, plon, plat]))
        lons = rng.uniform(-179, 179, 80)
        lats = rng.uniform(-80, 80, 80)
        from routers_ray.pipelines.queries import hav_m

        qi, _ = knn_candidates(
            t, lons, lats, 3, r0_deg=0.5,
            dist_m=lambda a, b: hav_m(lons[a], lats[a], plon[b], plat[b]),
        )
        counts = np.bincount(qi, minlength=80)
        assert (counts >= 3).all()
