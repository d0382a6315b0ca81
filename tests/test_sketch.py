"""HyperLogLog sketch: merge invariance, estimator accuracy, conventions."""

import numpy as np
import pyarrow as pa
import pytest

from routers_ray.sketch import hll_estimate, hll_merge, hll_partials, md5_u64


def test_md5_u64_matches_duckdb_number_upper():
    import duckdb

    vals = ["12", "hello", "doc-42-000000", ""]
    got = md5_u64(vals)
    want = duckdb.sql(
        "SELECT md5_number_upper(v) FROM (SELECT unnest(?) AS v)", params=[vals]
    ).fetchnumpy()
    key = list(want.keys())[0]
    assert np.array_equal(got, want[key].astype(np.uint64))


def test_partials_merge_invariance():
    rng = np.random.default_rng(5)
    h = rng.integers(0, 2**63, 50_000, dtype=np.int64).astype(np.uint64)
    whole = hll_merge([hll_partials(h, 10)], 10)
    parts = [hll_partials(c, 10) for c in np.array_split(h, 7)]
    assert np.array_equal(whole, hll_merge(parts, 10))


def test_estimate_within_theoretical_error():
    rng = np.random.default_rng(11)
    for n in (500, 5_000, 40_000):
        vals = [f"user-{i}" for i in range(n)]
        # duplicates must not move the sketch
        dup = vals + [vals[i] for i in rng.integers(0, n, n // 2)]
        dense = hll_merge([hll_partials(md5_u64(dup), 10)], 10)
        est = hll_estimate(dense)
        # 1.04/sqrt(1024) ~ 3.25% std err; allow 4 sigma
        assert abs(est - n) / n < 0.13, (n, est)


def test_rho_pinned_values():
    # hash = reg bits only (w = 0) -> rho = 55; low bit of w at position k
    p = 10
    t = hll_partials(np.array([3], dtype=np.uint64), p).to_pandas()
    assert list(t["reg"]) == [3] and list(t["rho"]) == [55]
    h = np.array([(1 << 10) | 5], dtype=np.uint64)  # w = 1 -> rho 1
    t = hll_partials(h, p).to_pandas()
    assert list(t["reg"]) == [5] and list(t["rho"]) == [1]
    h = np.array([(1 << 17) | 9], dtype=np.uint64)  # w = 128 -> rho 8
    t = hll_partials(h, p).to_pandas()
    assert list(t["reg"]) == [9] and list(t["rho"]) == [8]


def test_sketch_query_estimate_vs_exact(ray_session):
    import duckdb

    from routers_ray.pipelines.queries import q_hll_users

    sf = "/root/testdata/sf0.01"
    sparse = pa.Table.from_pandas(q_hll_users(sf).to_pandas())
    est = hll_estimate(hll_merge([sparse], 10))
    exact = duckdb.sql(
        f"SELECT COUNT(DISTINCT user_id) c FROM read_parquet('{sf}/events.parquet')"
    ).df()["c"][0]
    assert abs(est - exact) / exact < 0.13, (est, exact)


def test_cms_merge_invariance_and_bounds():
    from routers_ray.sketch import cms_merge, cms_partials, cms_query

    rng = np.random.default_rng(3)
    keys = [f"k{i}" for i in rng.integers(0, 200, 30_000)]
    uniq, counts = np.unique(np.asarray(keys, dtype=object), return_counts=True)
    whole = cms_merge([cms_partials([str(u) for u in uniq], counts)])
    # split into chunks, partial per chunk, merge
    parts = []
    for c in np.array_split(np.arange(len(keys)), 9):
        u, n = np.unique(np.asarray([keys[i] for i in c], dtype=object), return_counts=True)
        parts.append(cms_partials([str(x) for x in u], n))
    assert np.array_equal(whole, cms_merge(parts))
    true = dict(zip([str(u) for u in uniq], counts))
    N = len(keys)
    eps = np.e / 1024
    for k, t in list(true.items())[:50]:
        est = cms_query(whole, k)
        assert est >= t
        assert est <= t + eps * N * 4  # slack over the 1-delta bound


def test_cms_query_vs_exact(ray_session):
    import duckdb

    from routers_ray.pipelines.queries import q_cms_users
    from routers_ray.sketch import cms_merge, cms_query

    sf = "/root/testdata/sf0.001"
    dense = cms_merge([pa.Table.from_pandas(q_cms_users(sf).to_pandas())])
    exact = duckdb.sql(
        f"SELECT CAST(user_id AS VARCHAR) k, COUNT(*) n FROM read_parquet('{sf}/events.parquet') GROUP BY 1"
    ).df()
    for _, row in exact.iterrows():
        assert cms_query(dense, row["k"]) >= row["n"]


def test_heavy_hitters_partitioning_invariant(ray_session):
    """heavy_hitters' final table is exact and identical under different
    block splits, even though the intermediate MG summaries differ."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from routers_ray.sketch import heavy_hitters

    rng = np.random.default_rng(11)
    vals = rng.zipf(1.3, 20_000)
    vals = vals[vals < 1_000_000].astype(np.int64)
    tbl = pa.table({"v": pa.array(vals, pa.int64())})

    def vf(b):
        return np.asarray(b["v"], dtype=np.int64)

    outs = []
    for blocks in (1, 7):
        ds = rd.from_arrow(tbl).repartition(blocks)
        t = heavy_hitters(ds, vf, theta=0.01).to_pandas()
        outs.append(t.sort_values("item").reset_index(drop=True))
    import pandas as pd

    assert len(outs[0]) > 0
    pd.testing.assert_frame_equal(outs[0], outs[1])
    # exact ground truth
    u, c = np.unique(vals, return_counts=True)
    want = {int(k): int(n) for k, n in zip(u, c) if n >= 0.01 * vals.size}
    got = dict(zip(outs[0]["item"].astype(int), outs[0]["n"].astype(int)))
    assert got == want
