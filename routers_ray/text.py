"""Text-analysis + deduplication operators for large-scale training-data
pipelines, as vectorized ``map_batches`` kernels over the ``documents``
table.

Operators (each surfaced as a ``queries()`` entry):

- exact dedup: content hash (md5) → hash-partition + per-group first;
- MinHash + LSH near-dup: shingle → minhash → band → bucket groupby;
- SimHash 64-bit fingerprints with Hamming-bucket grouping;
- n-gram Jaccard verification for candidate pairs;
- token counting (whitespace regex), language/quality scoring
  (length / punctuation / stopword ratios), document fingerprinting
  (sorted-distinct-token digest).

The MinHash/SimHash hash family is splitmix64 over md5-derived 64-bit token
ids — deterministic across processes (no PYTHONHASHSEED dependence).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .functions import splitmix64

_STOPWORDS = frozenset(
    "the a an and or of to in is are was were be been on at by for with as it this that".split()
)


def md5_hex(strings: list[str]) -> list[str]:
    return [hashlib.md5(s.encode("utf-8")).hexdigest() for s in strings]


def token_hashes_64(tokens: list[str]) -> np.ndarray:
    """Stable 64-bit token ids: first 8 bytes of md5, little-endian."""
    if not tokens:
        return np.empty(0, dtype=np.uint64)
    return np.frombuffer(
        b"".join(hashlib.md5(t.encode("utf-8")).digest()[:8] for t in tokens), dtype=np.uint64
    )


def tokenize_batch(texts: pa.Array) -> pa.ListArray:
    """Whitespace tokenization via Arrow (zero Python in the split)."""
    return pc.split_pattern_regex(texts, r"\s+")


def token_count_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    toks = tokenize_batch(batch[text_col])
    # split_pattern_regex never yields empty lists for non-empty strings;
    # empty string → [""] — count handled by the caller's semantics
    n = pc.list_value_length(toks)
    return batch.append_column("n_tokens", pc.cast(n, pa.int64()))


def quality_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Quality-scoring columns: token count, punctuation count, stopword
    ratio, mean token length — the standard cheap text-quality heuristics."""
    texts = batch[text_col]
    toks = tokenize_batch(texts)
    n_tok = pc.cast(pc.list_value_length(toks), pa.int64())
    n_chars = pc.cast(pc.utf8_length(texts), pa.int64())
    n_punct = pc.cast(pc.count_substring_regex(texts, r"[.!?,;:]"), pa.int64())

    flat = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    offsets = flat.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    words = flat.flatten()
    is_stop = pc.is_in(pc.utf8_lower(words), value_set=pa.array(sorted(_STOPWORDS)))
    stop_np = pc.fill_null(is_stop, False).to_numpy(zero_copy_only=False).astype(np.float64)
    counts = np.diff(offsets)
    sums = np.add.reduceat(stop_np, offsets[:-1], dtype=np.float64) if stop_np.size else np.zeros(len(batch))
    sums = np.where(counts > 0, sums, 0.0)
    ratio = np.where(counts > 0, sums / np.maximum(counts, 1), 0.0)

    out = batch.append_column("n_tokens", n_tok)
    out = out.append_column("n_chars_c", n_chars)
    out = out.append_column("n_punct", n_punct)
    out = out.append_column("stop_ratio", pa.array(ratio, pa.float64()))
    return out


def langid_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Heuristic language id over a tiny per-language stopword profile —
    the n-gram-free variant that works on the synthetic corpus. Emits
    ``lang_pred`` + ``lang_conf``."""
    profiles = {
        "en": {"the", "and", "of", "a", "to", "is"},
        "de": {"der", "die", "und", "das", "ist", "ein"},
        "fr": {"le", "la", "et", "les", "des", "est"},
        "es": {"el", "la", "y", "de", "que", "los"},
        "it": {"il", "la", "e", "di", "che", "un"},
    }
    texts = batch[text_col].to_pylist()
    preds, confs = [], []
    for t in texts:
        words = set((t or "").lower().split())
        best, score = "unk", 0
        for lang, prof in profiles.items():
            s = len(words & prof)
            if s > score:
                best, score = lang, s
        preds.append(best)
        confs.append(float(score) / 6.0)
    return batch.append_column("lang_pred", pa.array(preds, pa.string())).append_column(
        "lang_conf", pa.array(confs, pa.float64())
    )


def fingerprint_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Document fingerprint: md5 of the sorted distinct token set — an
    order-insensitive near-identity digest (SQL-expressible for the oracle)."""
    texts = batch[text_col].to_pylist()
    fps = [
        hashlib.md5(" ".join(sorted(set((t or "").split()))).encode("utf-8")).hexdigest()
        for t in texts
    ]
    return batch.append_column("fingerprint", pa.array(fps, pa.string()))


# ---------------------------------------------------------------------------
# MinHash + LSH


def _shingles(tokens: list[str], k: int) -> list[str]:
    if len(tokens) < k:
        return [" ".join(tokens)] if tokens else []
    return [" ".join(tokens[i : i + k]) for i in range(len(tokens) - k + 1)]


def minhash_signature(text: str, n_perm: int = 64, shingle_k: int = 3) -> np.ndarray:
    """n_perm-wide MinHash over k-token shingles. Permutations are
    splitmix64 streams seeded 1..n_perm applied to stable shingle ids."""
    sh = _shingles((text or "").split(), shingle_k)
    ids = token_hashes_64(sh)
    if ids.size == 0:
        return np.full(n_perm, np.uint64(0xFFFFFFFFFFFFFFFF), dtype=np.uint64)
    seeds = np.arange(1, n_perm + 1, dtype=np.uint64)
    with np.errstate(over="ignore"):
        m = splitmix64(ids[None, :] ^ (seeds[:, None] * np.uint64(0x9E3779B97F4A7C15)))
    return m.min(axis=1)


def minhash_bands_batch(
    batch: pa.Table, text_col: str = "text", n_perm: int = 64, bands: int = 16, shingle_k: int = 3
) -> pa.Table:
    """Explode docs to (band_id, band_hash, doc_id) LSH rows — the shuffle
    key for the bucket groupby. rows_per_band = n_perm // bands."""
    texts = batch[text_col].to_pylist()
    doc_ids = np.asarray(batch["doc_id"])
    r = n_perm // bands
    out_doc, out_band, out_hash = [], [], []
    for i, t in enumerate(texts):
        sig = minhash_signature(t, n_perm, shingle_k)
        for b in range(bands):
            h = hashlib.md5(sig[b * r : (b + 1) * r].tobytes()).digest()[:8]
            out_doc.append(doc_ids[i])
            out_band.append(b)
            out_hash.append(int.from_bytes(h, "little"))
    return pa.table(
        {
            "doc_id": pa.array(out_doc, pa.int64()),
            "band_id": pa.array(out_band, pa.int32()),
            "band_hash": pa.array(np.asarray(out_hash, dtype=np.uint64), pa.uint64()),
        }
    )


def jaccard(a: str, b: str, shingle_k: int = 3) -> float:
    sa = set(_shingles((a or "").split(), shingle_k))
    sb = set(_shingles((b or "").split(), shingle_k))
    if not sa and not sb:
        return 1.0
    if not sa or not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)


def simhash64(text: str) -> int:
    """64-bit SimHash over unigram token hashes (bit-majority vote)."""
    ids = token_hashes_64((text or "").split())
    if ids.size == 0:
        return 0
    bits = ((ids[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(
        np.int64
    )
    votes = bits.sum(axis=0) * 2 - ids.size  # >0 → bit set
    out = np.uint64(0)
    for b in range(64):
        if votes[b] > 0:
            out |= np.uint64(1) << np.uint64(b)
    return int(out)


def simhash_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    vals = [simhash64(t) for t in batch[text_col].to_pylist()]
    return batch.append_column("simhash", pa.array(np.asarray(vals, dtype=np.uint64), pa.uint64()))


def simhash_pairs(ds, text_col: str = "text", max_hamming: int = 3, bands: int = 4):
    """SimHash near-dup pairs: 16-bit band LSH (any of ``bands`` equal bands
    → candidate, pigeonhole-complete for hamming ≤ bands−1) verified by
    exact Hamming distance ≤ ``max_hamming``. Returns (doc_a, doc_b,
    hamming)."""
    import pandas as pd

    def _bands(b: pa.Table) -> pa.Table:
        out = simhash_batch(b, text_col)
        sh = np.asarray(out["simhash"]).astype(np.uint64)
        ids = np.asarray(pa.compute.cast(out["doc_id"], pa.int64()))
        rows_id, rows_band, rows_key, rows_sh = [], [], [], []
        width = 64 // bands
        mask = np.uint64((1 << width) - 1)
        for k in range(bands):
            rows_id.append(ids)
            rows_band.append(np.full(ids.size, k, dtype=np.int32))
            rows_key.append((sh >> np.uint64(k * width)) & mask)
            rows_sh.append(sh)
        return pa.table(
            {
                "doc_id": pa.array(np.concatenate(rows_id), pa.int64()),
                "band": pa.array(np.concatenate(rows_band), pa.int32()),
                "band_key": pa.array(np.concatenate(rows_key), pa.uint64()),
                "simhash": pa.array(np.concatenate(rows_sh), pa.uint64()),
            }
        )

    band_rows = ds.map_batches(_bands, batch_format="pyarrow")

    def _pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates("doc_id").sort_values("doc_id")
        ids = g["doc_id"].to_numpy()
        sh = g["simhash"].to_numpy().astype(np.uint64)
        if ids.size < 2:
            return pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                                 "doc_b": pd.Series([], dtype="int64"),
                                 "hamming": pd.Series([], dtype="int64")})
        a, b, h = [], [], []
        for i in range(ids.size):
            x = sh[i] ^ sh[i + 1 :]
            ham = np.array([bin(int(v)).count("1") for v in x])
            hit = np.flatnonzero(ham <= max_hamming)
            for j in hit:
                a.append(int(ids[i])), b.append(int(ids[i + 1 + j])), h.append(int(ham[j]))
        return pd.DataFrame({"doc_a": a, "doc_b": b, "hamming": h})

    pairs = band_rows.groupby(["band", "band_key"]).map_groups(_pairs, batch_format="pandas")
    pdf = pairs.to_pandas().drop_duplicates(["doc_a", "doc_b"]).reset_index(drop=True)
    return pa.table(
        {
            "doc_a": pa.array(pdf["doc_a"].astype("int64"), pa.int64()),
            "doc_b": pa.array(pdf["doc_b"].astype("int64"), pa.int64()),
            "hamming": pa.array(pdf["hamming"].astype("int64"), pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# dataset-level pipelines


def dedup_exact(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Exact dedup: md5 hash column → groupby(hash) keep min id.

    Hash-partitioned shuffle moves only (hash, id) pairs after the projection
    — the canonical exact-dedup shape."""

    def _hash(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                id_col: b[id_col],
                "content_md5": pa.array(md5_hex(b[text_col].to_pylist()), pa.string()),
            }
        )

    import pandas as pd

    hashed = ds.map_batches(_hash, batch_format="pyarrow")

    def _first(g: pd.DataFrame) -> pd.DataFrame:
        keep = g.sort_values(id_col).head(1)
        return keep[["content_md5", id_col]]

    return hashed.groupby("content_md5").map_groups(_first, batch_format="pandas")


def dedup_minhash(ds, text_col: str = "text", threshold: float = 0.8, n_perm: int = 64, bands: int = 16):
    """MinHash-LSH near-dup: band rows → bucket groupby → candidate pairs →
    exact-Jaccard verify. Returns verified duplicate pairs (doc_a < doc_b).

    Scale shape: the shuffle moves only (band_id, band_hash, doc_id) rows;
    candidate pairs are a tiny fraction of the corpus. Verification here
    joins pair rows against the docs needed for them — at 100 TB that join
    is hash-partitioned on doc_id; at test scale the pair set is small
    enough to gather and verify on the driver with a semi-join read of just
    the referenced docs.
    """
    import pandas as pd
    import pyarrow.compute as pc

    band_rows = ds.map_batches(
        lambda b: minhash_bands_batch(b, text_col, n_perm, bands), batch_format="pyarrow"
    )

    def _pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(g["doc_id"].unique())
        if len(ids) < 2:
            return pd.DataFrame({"doc_a": pd.Series([], dtype="int64"), "doc_b": pd.Series([], dtype="int64")})
        a, b = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a.append(ids[i])
                b.append(ids[j])
        return pd.DataFrame({"doc_a": a, "doc_b": b})

    cand = band_rows.groupby(["band_id", "band_hash"]).map_groups(_pairs, batch_format="pandas")
    cand_pdf = cand.to_pandas().drop_duplicates().reset_index(drop=True)

    # semi-join: fetch only the texts the candidate pairs reference
    needed = set(cand_pdf["doc_a"]).union(cand_pdf["doc_b"])
    texts: dict = {}
    if needed:
        needed_arr = pa.array(sorted(int(x) for x in needed), pa.int64())
        for bb in ds.iter_batches(batch_format="pyarrow"):
            t = pa.Table.from_batches([bb]) if isinstance(bb, pa.RecordBatch) else bb
            hit = t.filter(pc.is_in(t["doc_id"], value_set=needed_arr))
            texts.update(zip(hit["doc_id"].to_pylist(), hit[text_col].to_pylist()))

    out_a, out_b, out_j = [], [], []
    for _, row in cand_pdf.iterrows():
        j = jaccard(texts.get(row.doc_a, ""), texts.get(row.doc_b, ""))
        if j >= threshold:
            out_a.append(int(row.doc_a))
            out_b.append(int(row.doc_b))
            out_j.append(j)
    return pa.table(
        {
            "doc_a": pa.array(out_a, pa.int64()),
            "doc_b": pa.array(out_b, pa.int64()),
            "jaccard": pa.array(out_j, pa.float64()),
        }
    )
