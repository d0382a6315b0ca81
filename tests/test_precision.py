"""Machine-checked precision guarantees for the two approximate-by-design
(no_oracle) registry queries, on the real sf0.01 tables (VERDICT r03 next
round #5).

- ``minhash_pairs``: every emitted pair's EXACT shingle Jaccard is >= 0.8,
  recomputed here with an independent pure-Python implementation over
  texts fetched by a DuckDB semi-join against the emitted pair list.
- ``ann_lsh``: every emitted (query, neighbor, sim) carries the exact
  cosine similarity (recomputed independently with NumPy), per-query
  results are sorted descending with deterministic tie-breaks, and the
  result set reaches recall@10 >= 0.9 against the brute-force top-k.
"""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

SF_DIR = "/root/testdata/sf0.01"


def _as_table(res) -> pa.Table:
    if isinstance(res, pa.Table):
        return res
    if hasattr(res, "to_arrow_refs"):  # ray Dataset
        import ray

        tables = [t for t in ray.get(res.to_arrow_refs()) if t.num_rows]
        return pa.concat_tables(tables) if tables else res.schema().empty_table()
    return pa.Table.from_pandas(res)


def _jaccard_independent(a: str, b: str, k: int = 3) -> float:
    """Deliberately NOT routers_ray.text.jaccard — a from-scratch shingle
    Jaccard so the check is independent of the engine's kernel."""

    def shingle_set(t: str) -> set:
        toks = (t or "").split()
        if not toks:
            return set()
        if len(toks) < k:
            return {" ".join(toks)}
        return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}

    sa, sb = shingle_set(a), shingle_set(b)
    if not sa and not sb:
        return 1.0
    if not sa or not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)


def test_minhash_pairs_precision_sf(ray_session):
    from routers_ray.pipelines.queries import q_minhash_pairs

    pairs = _as_table(q_minhash_pairs(SF_DIR))
    assert pairs.num_rows > 0  # sf0.01 corpus has known near-dups
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF_DIR}/documents.parquet')"
    )
    con.register("pairs", pairs)
    # DuckDB semi-join: texts for exactly the emitted pair members
    fetched = con.execute(
        """
        SELECT p.doc_a, p.doc_b, p.jaccard, da.text AS text_a, db.text AS text_b
        FROM pairs p
        JOIN documents da ON da.doc_id = p.doc_a
        JOIN documents db ON db.doc_id = p.doc_b
        """
    ).fetch_arrow_table()
    assert fetched.num_rows == pairs.num_rows  # every pair resolved
    for row in fetched.to_pylist():
        exact = _jaccard_independent(row["text_a"], row["text_b"])
        # the emitted jaccard IS the exact one (the verify stage computes
        # it on the candidate pair), and it clears the 0.8 threshold
        assert exact >= 0.8, (row["doc_a"], row["doc_b"], exact)
        assert abs(exact - row["jaccard"]) < 1e-12


def test_ann_lsh_precision_sf(ray_session):
    import pyarrow.compute as pc
    import pyarrow.parquet as papq

    from routers_ray.pipelines.queries import q_ann_lsh

    res = _as_table(q_ann_lsh(SF_DIR))
    assert res.num_rows > 0

    etbl = papq.read_table(f"{SF_DIR}/embeddings.parquet")
    vec_ids = np.asarray(etbl["vec_id"], dtype=np.int64)
    mat = np.stack([np.asarray(v, dtype=np.float64) for v in etbl["embedding"].to_pylist()])
    mat_n = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    id_to_row = {int(v): i for i, v in enumerate(vec_ids)}

    qtbl = etbl.filter(pc.less(etbl["vec_id"], 5))
    qids = sorted(int(v) for v in qtbl["vec_id"].to_pylist())

    rows = res.to_pylist()
    by_q: dict[int, list[dict]] = {}
    for r in rows:
        by_q.setdefault(int(r["query_id"]), []).append(r)

    assert sorted(by_q) == qids  # every query answered
    total_hits, total_k = 0, 0
    for q, items in by_q.items():
        qvec = mat_n[id_to_row[q]]
        sims_all = mat_n @ qvec
        # (a) every emitted sim is the exact cosine, independently
        # recomputed (the engine rounds sims to 6 decimals — the repo's
        # oracle-exactness convention — so allow that half-ulp)
        for it in items:
            exact = float(sims_all[id_to_row[int(it["vec_id"])]])
            assert abs(exact - float(it["sim"])) < 5.01e-7, (q, it["vec_id"])
        # (b) per-query list sorted by sim descending
        sims = [float(it["sim"]) for it in items]
        assert sims == sorted(sims, reverse=True)
        assert len(items) <= 10
        # (c) recall@10 vs the brute top-10 (self excluded, ties broken by id
        # like the engine): the approximate result must stay near-exact
        order = np.lexsort((vec_ids, -sims_all))
        brute = [int(vec_ids[i]) for i in order if int(vec_ids[i]) != q][:10]
        got = {int(it["vec_id"]) for it in items}
        total_hits += len(got & set(brute))
        total_k += len(brute)
    assert total_hits / total_k >= 0.9, f"recall {total_hits}/{total_k}"
