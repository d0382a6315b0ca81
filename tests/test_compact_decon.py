"""Unit + property tests for the round-5 additions: mixed-resolution cell
compaction (`cells.compact_xy`) and benchmark decontamination
(`text.word_ngrams_batch` / `text.decontaminate`).

The registry-level DuckDB oracle rows for `compact_cells` /
`decontaminate` live in test_queries_oracle.py; these tests pin the
kernel semantics the oracle cannot see (multi-level cascade, cover
minimality/disjointness, batch-split invariance, benchmark exclusion).
"""

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from routers_ray.cells import compact_xy
from routers_ray.text import word_ngrams_batch


# ---------------------------------------------------------------------------
# compact_xy


def _full_subtree(px: int, py: int, from_z: int, to_z: int):
    """All descendant tiles of (px, py)@from_z at zoom to_z."""
    s = to_z - from_z
    n = 1 << s
    xs = np.arange(px << s, (px << s) + n, dtype=np.int64)
    ys = np.arange(py << s, (py << s) + n, dtype=np.int64)
    gx, gy = np.meshgrid(xs, ys)
    return gx.ravel(), gy.ravel()


def _leaves_of(z, x, y, leaf_z: int):
    """Expand a mixed-zoom cover back to its leaf-set at leaf_z."""
    out = []
    for zz, xx, yy in zip(z, x, y):
        lx, ly = _full_subtree(int(xx), int(yy), int(zz), leaf_z)
        out.append((lx << np.int64(32)) | ly)
    return np.sort(np.concatenate(out)) if out else np.empty(0, np.int64)


def test_compact_full_subtree_collapses_to_floor():
    x, y = _full_subtree(5, 2, 3, 6)  # all 64 z6 leaves of z3 cell (5,2)
    z, cx, cy = compact_xy(x, y, 6, 3)
    assert z.tolist() == [3] and cx.tolist() == [5] and cy.tolist() == [2]


def test_compact_partial_quad_stays_at_leaf():
    # 3 of 4 siblings: nothing promotes
    x = np.array([10, 11, 10], dtype=np.int64)
    y = np.array([20, 20, 21], dtype=np.int64)
    z, cx, cy = compact_xy(x, y, 6, 3)
    assert z.tolist() == [6, 6, 6]
    assert sorted(zip(cx.tolist(), cy.tolist())) == [(10, 20), (10, 21), (11, 20)]


def test_compact_single_level_promotion():
    # one complete quad + one stray leaf → one z5 parent + one z6 leaf
    x = np.array([10, 11, 10, 11, 40], dtype=np.int64)
    y = np.array([20, 20, 21, 21, 40], dtype=np.int64)
    z, cx, cy = compact_xy(x, y, 6, 3)
    got = sorted(zip(z.tolist(), cx.tolist(), cy.tolist()))
    assert got == [(5, 5, 10), (6, 40, 40)]


def test_compact_dedups_input():
    x = np.array([10, 10, 10], dtype=np.int64)
    y = np.array([20, 20, 20], dtype=np.int64)
    z, cx, cy = compact_xy(x, y, 6, 3)
    assert len(z) == 1 and z[0] == 6


def test_compact_floor_equals_zoom_is_identity_distinct():
    x = np.array([1, 2, 2], dtype=np.int64)
    y = np.array([1, 1, 1], dtype=np.int64)
    z, cx, cy = compact_xy(x, y, 6, 6)
    assert z.tolist() == [6, 6]


def test_compact_rejects_floor_above_zoom():
    with pytest.raises(ValueError):
        compact_xy(np.array([1]), np.array([1]), 4, 6)


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 63), st.integers(0, 63)),
        min_size=1,
        max_size=200,
    )
)
def test_compact_cover_is_exact_minimal_disjoint(pts):
    """The compact cover (a) covers exactly the input leaf set, (b) holds
    no complete sibling quad at any level above floor (minimality), and
    (c) no cell is an ancestor of another (disjointness)."""
    x = np.array([p[0] for p in pts], dtype=np.int64)
    y = np.array([p[1] for p in pts], dtype=np.int64)
    z, cx, cy = compact_xy(x, y, 6, 3)
    # (a) exact cover
    want = np.unique((x << np.int64(32)) | y)
    got = _leaves_of(z, cx, cy, 6)
    assert np.array_equal(np.sort(want), got)
    # (b) minimal: no 4 siblings at the same zoom above floor
    for zz in range(6, 3, -1):
        m = z == zz
        pk = ((cx[m] >> 1) << np.int64(32)) | (cy[m] >> 1)
        if pk.size:
            assert np.unique(pk, return_counts=True)[1].max() < 4
    # (c) disjoint: no output cell contains another
    cells = set(zip(z.tolist(), cx.tolist(), cy.tolist()))
    for zz, xx, yy in cells:
        for up in range(1, zz - 3 + 1):
            assert (zz - up, xx >> up, yy >> up) not in cells


# ---------------------------------------------------------------------------
# word_ngrams_batch / decontaminate


def test_word_ngrams_basic():
    rows, grams = word_ngrams_batch(pa.chunked_array([["a b c d", "x y", None]]), 3)
    assert rows.tolist() == [0, 0]
    assert grams.to_pylist() == ["a b c", "b c d"]


def test_word_ngrams_no_cross_row_grams():
    rows, grams = word_ngrams_batch(pa.chunked_array([["a b", "c d e"]]), 3)
    assert rows.tolist() == [1]
    assert grams.to_pylist() == ["c d e"]


def test_word_ngrams_empty_batch():
    rows, grams = word_ngrams_batch(pa.chunked_array([pa.array([], pa.string())]), 3)
    assert rows.size == 0 and len(grams) == 0


@pytest.fixture(scope="module")
def decon_docs():
    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(30)]
    texts = [
        " ".join(rng.choice(vocab, size=int(rng.integers(3, 40))))
        for _ in range(120)
    ]
    return pa.table(
        {"doc_id": pa.array(np.arange(120), pa.int64()), "text": pa.array(texts)}
    )


def _brute_decon(tbl, n=3, mod=50):
    """Independent pure-Python reference."""
    grams = {}
    for did, text in zip(tbl["doc_id"].to_pylist(), tbl["text"].to_pylist()):
        toks = text.split(" ")
        grams[did] = {
            " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
        }
    block = set().union(*(g for d, g in grams.items() if d % mod == 0))
    return {
        d: len(g & block)
        for d, g in grams.items()
        if d % mod != 0 and g & block
    }


def test_uncompact_roundtrips_to_leaf_set(ray_session):
    """uncompact(compact(S)) == distinct leaf set S — the duality the
    registry oracle also checks, pinned here at sf0.001 with the exact
    leaf derivation inlined."""
    import duckdb

    from routers_ray.pipelines.queries import q_uncompact_cells, sql_uncompact_cells

    sf = "/root/testdata/sf0.001"
    got = q_uncompact_cells(sf).to_pandas().sort_values(["x", "y"]).reset_index(drop=True)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')")
    want = con.sql(sql_uncompact_cells()).df().sort_values(["x", "y"]).reset_index(drop=True)
    assert got.equals(want)
    assert not got.duplicated().any()


@pytest.mark.parametrize("n_blocks", [1, 7])
def test_decontaminate_matches_brute_and_is_split_invariant(
    decon_docs, n_blocks, ray_session
):
    import ray.data as rd

    from routers_ray.text import decontaminate

    ds = rd.from_arrow(decon_docs).repartition(n_blocks)
    got = decontaminate(ds, n=3, benchmark_mod=50).to_pandas()
    want = _brute_decon(decon_docs)
    assert dict(zip(got["doc_id"], got["n_hits"])) == want
    # benchmark docs themselves are never flagged
    assert not (got["doc_id"] % 50 == 0).any()
