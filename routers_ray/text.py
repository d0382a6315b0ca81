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
    """Whitespace token count per doc.

    Edge semantics (CONTRACT, mirrored by every SQL oracle): the count is
    ``len(string_split_regex(text, '\\s+'))`` — an empty string counts as
    ONE token (the single empty split piece), matching
    ``len(string_split_regex('', ...)) = 1`` in DuckDB. Callers needing
    python ``str.split()`` semantics (empty → 0) must filter empty texts
    first; the sf corpora contain none."""
    toks = tokenize_batch(batch[text_col])
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


# ordered: earlier language wins score ties (strict > while scanning)
LANG_PROFILES: tuple[tuple[str, tuple[str, ...]], ...] = (
    ("en", ("the", "and", "of", "a", "to", "is")),
    ("de", ("der", "die", "und", "das", "ist", "ein")),
    ("fr", ("le", "la", "et", "les", "des", "est")),
    ("es", ("el", "la", "y", "de", "que", "los")),
    ("it", ("il", "la", "e", "di", "che", "un")),
)


def langid_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Heuristic language id over a tiny per-language stopword profile —
    the n-gram-free variant that works on the synthetic corpus. Emits
    ``lang_pred`` + ``lang_conf``.

    Vectorized: Arrow lower+split once, then one ``pc.equal`` +
    segment-any per profile word (30 passes over the flat token array —
    no per-row Python)."""
    texts = pc.fill_null(batch[text_col], "")
    toks = pc.split_pattern_regex(pc.utf8_lower(texts), r"\s+")
    flat = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    offsets = flat.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    words = flat.flatten()
    n = len(batch)
    counts = np.diff(offsets)

    def _present(word: str) -> np.ndarray:
        eq = pc.fill_null(pc.equal(words, word), False).to_numpy(zero_copy_only=False)
        if eq.size == 0:
            return np.zeros(n, dtype=bool)
        # pad one zero so an offset == eq.size stays a valid reduceat index;
        # empty-doc segments read a neighbour's element but are masked below
        eqp = np.concatenate([eq.astype(np.int64), [0]])
        seg = np.add.reduceat(eqp, offsets[:-1])
        return (seg > 0) & (counts > 0)

    scores = np.zeros((len(LANG_PROFILES), n), dtype=np.int64)
    for li, (_, prof) in enumerate(LANG_PROFILES):
        for w in prof:
            scores[li] += _present(w)

    best_score = np.zeros(n, dtype=np.int64)
    best_idx = np.full(n, -1, dtype=np.int64)
    for li in range(len(LANG_PROFILES)):
        better = scores[li] > best_score  # strict >: earlier profile wins ties
        best_score = np.where(better, scores[li], best_score)
        best_idx = np.where(better, li, best_idx)

    names = np.asarray(["unk"] + [lang for lang, _ in LANG_PROFILES])
    preds = names[best_idx + 1]
    confs = best_score.astype(np.float64) / 6.0
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
# LSH bucket hygiene + vectorized popcount

# All-pairs inside one LSH bucket is O(n²): a degenerate bucket (e.g. every
# empty doc sharing one signature) is the skew bomb. Buckets are capped at a
# deterministic lowest-id prefix, and the cap is LOGGED — silent truncation
# would read as "covered everything".
_MAX_BUCKET = 256


def _log_bucket_cap(kind: str, size: int) -> None:
    import logging

    logging.getLogger(__name__).warning(
        "%s LSH bucket of %d docs exceeds cap %d — keeping the lowest-id "
        "prefix; raise _MAX_BUCKET or add more bands if this is not a "
        "degenerate-content bucket",
        kind, size, _MAX_BUCKET,
    )


_POP16 = np.array([bin(i).count("1") for i in range(1 << 16)], dtype=np.uint8)


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit popcount via a 16-bit LUT (numpy<2 lacks
    ``bitwise_count``)."""
    x = np.asarray(x, dtype=np.uint64)
    m = np.uint64(0xFFFF)
    return (
        _POP16[(x & m).astype(np.int64)].astype(np.int64)
        + _POP16[((x >> np.uint64(16)) & m).astype(np.int64)]
        + _POP16[((x >> np.uint64(32)) & m).astype(np.int64)]
        + _POP16[((x >> np.uint64(48)) & m).astype(np.int64)]
    )


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


def minhash_signatures_batch(
    texts: pa.Array, n_perm: int = 64, shingle_k: int = 3
) -> np.ndarray:
    """Batched MinHash: (n_perm, n_docs) signature matrix, equal per column
    to :func:`minhash_signature` of that doc.

    Vectorized path: one Arrow split, shingles via
    ``binary_join_element_wise`` over shifted token slices, md5 only per
    UNIQUE shingle, and all permutations in one ``splitmix64`` matrix with
    per-doc ``minimum.reduceat``. No per-row Python in the hot loop."""
    texts = pc.fill_null(texts, "")
    n = len(texts)
    toks = pc.split_pattern_regex(texts, r"\s+")
    flat = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    offsets = flat.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    words = flat.flatten()
    # regex split leaves '' edge tokens that str.split() would drop
    keep = pc.not_equal(words, "").to_numpy(zero_copy_only=False).astype(bool)
    doc_of = np.repeat(np.arange(n), np.diff(offsets))[keep]
    words = words.filter(pa.array(keep))
    counts = np.bincount(doc_of, minlength=n)
    doc_start = np.concatenate(([0], np.cumsum(counts)))

    # full-length shingles for docs with >= k tokens
    sh_texts: list[str] = []
    sh_doc: list[np.ndarray] = []
    if len(words) >= shingle_k:
        parts = [words.slice(j, len(words) - shingle_k + 1) for j in range(shingle_k)]
        joined = pc.binary_join_element_wise(*parts, " ")
        pos = np.arange(len(joined))
        d = doc_of[pos] if pos.size else np.empty(0, np.int64)
        # valid iff the whole k-window sits inside one doc
        valid = (pos - doc_start[d]) <= (counts[d] - shingle_k)
        valid &= counts[d] >= shingle_k
        sh_texts.extend(joined.filter(pa.array(valid)).to_pylist())
        sh_doc.append(d[valid])
    # short docs (0 < count < k): one shingle of all tokens (rare path)
    short = np.flatnonzero((counts > 0) & (counts < shingle_k))
    if short.size:
        wlist = words.to_pylist()
        for sd in short:
            sh_texts.append(" ".join(wlist[doc_start[sd] : doc_start[sd + 1]]))
            sh_doc.append(np.asarray([sd], dtype=np.int64))
    sh_doc_arr = np.concatenate(sh_doc) if sh_doc else np.empty(0, np.int64)

    sig = np.full((n_perm, n), np.uint64(0xFFFFFFFFFFFFFFFF), dtype=np.uint64)
    if sh_texts:
        order = np.argsort(sh_doc_arr, kind="stable")
        sh_doc_arr = sh_doc_arr[order]
        sh_sorted = [sh_texts[i] for i in order]
        uniq, inv = np.unique(np.asarray(sh_sorted, dtype=object), return_inverse=True)
        uid = np.frombuffer(
            b"".join(hashlib.md5(u.encode("utf-8")).digest()[:8] for u in uniq.tolist()),
            dtype=np.uint64,
        )
        ids = uid[inv]
        seeds = np.arange(1, n_perm + 1, dtype=np.uint64)
        with np.errstate(over="ignore"):
            m = splitmix64(ids[None, :] ^ (seeds[:, None] * np.uint64(0x9E3779B97F4A7C15)))
        docs_here, first = np.unique(sh_doc_arr, return_index=True)
        mins = np.minimum.reduceat(m, first, axis=1)
        sig[:, docs_here] = mins
    return sig


def minhash_bands_batch(
    batch: pa.Table, text_col: str = "text", n_perm: int = 64, bands: int = 16, shingle_k: int = 3
) -> pa.Table:
    """Explode docs to (band_id, band_hash, doc_id) LSH rows — the shuffle
    key for the bucket groupby. rows_per_band = n_perm // bands."""
    doc_ids = np.asarray(batch["doc_id"])
    r = n_perm // bands
    sig = minhash_signatures_batch(batch[text_col], n_perm, shingle_k)
    n = sig.shape[1]
    # md5 per (doc, band) block — 16 digests/doc vs one per shingle before
    blocks = np.ascontiguousarray(sig.T)  # (n_docs, n_perm) row-major
    out_hash = np.empty(n * bands, dtype=np.uint64)
    for i in range(n):
        row = blocks[i]
        for b in range(bands):
            out_hash[i * bands + b] = int.from_bytes(
                hashlib.md5(row[b * r : (b + 1) * r].tobytes()).digest()[:8], "little"
            )
    return pa.table(
        {
            "doc_id": pa.array(np.repeat(doc_ids, bands), pa.int64()),
            "band_id": pa.array(np.tile(np.arange(bands, dtype=np.int32), n), pa.int32()),
            "band_hash": pa.array(out_hash, pa.uint64()),
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
        if ids.size > _MAX_BUCKET:
            # degenerate-bucket skew bomb: O(n²) inside one group — keep the
            # deterministic lowest-id prefix and say so (no silent cap)
            _log_bucket_cap("simhash", int(ids.size))
            ids, sh = ids[:_MAX_BUCKET], sh[:_MAX_BUCKET]
        a, b, h = [], [], []
        for i in range(ids.size):
            ham = _popcount64(sh[i] ^ sh[i + 1 :])
            hit = np.flatnonzero(ham <= max_hamming)
            if hit.size:
                a.append(np.full(hit.size, ids[i], dtype=np.int64))
                b.append(ids[i + 1 + hit].astype(np.int64))
                h.append(ham[hit].astype(np.int64))
        if not a:
            return pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                                 "doc_b": pd.Series([], dtype="int64"),
                                 "hamming": pd.Series([], dtype="int64")})
        return pd.DataFrame(
            {"doc_a": np.concatenate(a), "doc_b": np.concatenate(b), "hamming": np.concatenate(h)}
        )

    pairs = band_rows.groupby(["band", "band_key"]).map_groups(_pairs, batch_format="pandas")
    # distributed dedup as an aggregate: a pair found by several bands has
    # ONE hamming value, so min() both dedups and preserves it — pair rows
    # only ever ride the shuffle, and no per-group Python body runs
    deduped = pairs.groupby(["doc_a", "doc_b"]).min("hamming").map_batches(
        lambda b: b.rename_columns(["doc_a", "doc_b", "hamming"]), batch_format="pyarrow"
    )
    return deduped


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

    hashed = ds.map_batches(_hash, batch_format="pyarrow")
    # keep-min-id per hash IS an aggregate — no per-group Python body
    return hashed.groupby("content_md5").min(id_col).map_batches(
        lambda b: b.rename_columns(["content_md5", id_col]), batch_format="pyarrow"
    )


def dedup_minhash(
    ds,
    text_col: str = "text",
    threshold: float = 0.8,
    n_perm: int = 64,
    bands: int = 16,
    num_partitions: int = 8,
):
    """MinHash-LSH near-dup: band rows → bucket groupby → candidate pairs →
    hash-partitioned pair↔doc joins → in-batch exact-Jaccard verify.
    Returns a Dataset of verified duplicate pairs (doc_a < doc_b, jaccard).

    Scale shape (no driver-side materialization anywhere):

    1. the LSH shuffle moves only (band_id, band_hash, doc_id) rows;
    2. buckets emit all-pairs under a logged ``_MAX_BUCKET`` cap (skew
       guard) and pairs dedup in a distributed (doc_a, doc_b) groupby;
    3. the verification tail is two hash joins of the pair rows against the
       (doc_id, text) projection — pair rows and only the referenced texts
       ride the exchange — with the exact Jaccard computed inside
       ``map_batches`` where the pair lands.
    """
    import pandas as pd

    band_rows = ds.map_batches(
        lambda b: minhash_bands_batch(b, text_col, n_perm, bands), batch_format="pyarrow"
    )

    def _pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(g["doc_id"].unique())
        if len(ids) > _MAX_BUCKET:
            _log_bucket_cap("minhash", len(ids))
            ids = ids[:_MAX_BUCKET]
        if len(ids) < 2:
            return pd.DataFrame({"doc_a": pd.Series([], dtype="int64"), "doc_b": pd.Series([], dtype="int64")})
        arr = np.asarray(ids, dtype=np.int64)
        ii, jj = np.triu_indices(arr.size, k=1)
        return pd.DataFrame({"doc_a": arr[ii], "doc_b": arr[jj]})

    cand = band_rows.groupby(["band_id", "band_hash"]).map_groups(_pairs, batch_format="pandas")
    # distributed pair dedup as an AGGREGATE (count + drop) — far cheaper
    # than spawning a map_groups body per tiny (doc_a, doc_b) group
    deduped = cand.groupby(["doc_a", "doc_b"]).count().map_batches(
        lambda b: b.select(["doc_a", "doc_b"]), batch_format="pyarrow"
    )
    # Ray's hash join cannot take a 0-row left side (its empty partitions
    # lose the schema and Acero rejects the key) — and a zero-pair corpus
    # is exactly that. The pair set is small BY DESIGN (bucket-capped), so
    # materialize it in the object store (texts still never materialize)
    # and short-circuit the empty case with a typed empty result.
    import ray.data as rd

    deduped = deduped.materialize()
    if deduped.count() == 0:
        return rd.from_arrow(
            pa.table(
                {
                    "doc_a": pa.array([], pa.int64()),
                    "doc_b": pa.array([], pa.int64()),
                    "jaccard": pa.array([], pa.float64()),
                }
            )
        )

    docs_proj = ds.map_batches(
        lambda b: pa.table(
            {"doc_id": pc.cast(b["doc_id"], pa.int64()), text_col: b[text_col]}
        ),
        batch_format="pyarrow",
    )

    with_a = deduped.join(
        docs_proj, "inner", num_partitions, on=("doc_a",), right_on=("doc_id",)
    ).map_batches(
        lambda b: pa.table(
            {"doc_a": b["doc_a"], "doc_b": b["doc_b"], "text_a": b[text_col]}
        ),
        batch_format="pyarrow",
    )
    with_b = with_a.join(
        docs_proj, "inner", num_partitions, on=("doc_b",), right_on=("doc_id",)
    )

    def _verify(b: pa.Table) -> pa.Table:
        ta = b["text_a"].to_pylist()
        tb = b[text_col].to_pylist()
        jac = np.asarray([jaccard(x, y) for x, y in zip(ta, tb)], dtype=np.float64)
        keep = jac >= threshold
        return pa.table(
            {
                "doc_a": pc.cast(b["doc_a"], pa.int64()).take(pa.array(np.flatnonzero(keep))),
                "doc_b": pc.cast(b["doc_b"], pa.int64()).take(pa.array(np.flatnonzero(keep))),
                "jaccard": pa.array(jac[keep], pa.float64()),
            }
        )

    return with_b.map_batches(_verify, batch_format="pyarrow")


# BPE-ish pre-tokenizer regex (the GPT-2 pattern family, minus the \s+(?!\S)
# lookahead RE2 cannot express — both Arrow and DuckDB run RE2, so the count
# is engine-portable by construction)
BPE_RE = r"'(?:[sdmt]|ll|ve|re)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"


def bpe_token_count_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Sub-word-style token counting: non-overlapping BPE_RE matches per
    doc — the 'BPE-ish regex' counting a training-data pipeline budgets
    with, next to the whitespace count."""
    n = pc.count_substring_regex(pc.fill_null(batch[text_col], ""), BPE_RE)
    return batch.append_column("n_bpe_tokens", pc.cast(n, pa.int64()))


def word_ngrams_batch(texts, n: int = 3) -> tuple[np.ndarray, pa.Array]:
    """(row_index, gram) for every consecutive word ``n``-gram in a batch
    of texts — fully vectorized: one split, one flatten, ``n`` shifted
    slices joined element-wise, a row-boundary mask. Returns ALL gram
    positions (dedup at the use site)."""
    toks = pc.split_pattern(pc.fill_null(texts, ""), " ")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = pc.list_flatten(toks)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    counts = pc.list_value_length(toks).cast(pa.int64()).to_numpy(zero_copy_only=False)
    total = len(flat)
    if total < n:
        return np.empty(0, np.int64), pa.array([], pa.string())
    rows = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    parts = [flat.slice(i, total - n + 1) for i in range(n)]
    grams = pc.binary_join_element_wise(*parts, " ")
    valid = rows[: total - n + 1] == rows[n - 1 :]
    return rows[: total - n + 1][valid], grams.filter(pa.array(valid))


def decontaminate(ds, id_col: str = "doc_id", text_col: str = "text",
                  n: int = 3, benchmark_mod: int = 50):
    """Benchmark decontamination: flag corpus docs sharing any word
    ``n``-gram with the benchmark subset (``id % benchmark_mod == 0``) —
    the eval-leakage scan a training-data pipeline runs before every
    pretraining cut.

    Scale shape: the benchmark side is FIXED-SIZE by contract (an eval
    suite, not a corpus), so its distinct n-gram set is built from
    per-batch distinct partials and gathered once to the driver — the
    broadcast-small-side pattern of ``sim.py``'s query matrix; Ray ships
    the captured blocklist to each task via the object store, never per
    batch. The corpus pass is one ``map_batches`` whose membership probe
    touches each DISTINCT batch gram once (dictionary encode → one hashed
    ``Index.get_indexer``), with per-row distinct-hit counting on packed
    (row, code) keys. Output: (id, n_hits) for flagged non-benchmark
    docs only — no shuffle at all.
    """
    import pandas as pd

    def _bench_grams(b: pa.Table) -> pa.Table:
        ids = pc.cast(b[id_col], pa.int64()).to_numpy(zero_copy_only=False)
        mask = (ids % benchmark_mod) == 0
        if not mask.any():
            return pa.table({"g": pa.array([], pa.string())})
        _, grams = word_ngrams_batch(b[text_col].filter(pa.array(mask)), n)
        return pa.table({"g": pc.unique(grams)})

    small = ds.map_batches(_bench_grams, batch_format="pyarrow").to_pandas()
    blocklist = pd.Index(pd.unique(small["g"])) if len(small) else pd.Index([])

    def _flag(b: pa.Table) -> pa.Table:
        ids = pc.cast(b[id_col], pa.int64()).to_numpy(zero_copy_only=False)
        hits = np.zeros(b.num_rows, np.int64)
        rows, grams = word_ngrams_batch(b[text_col], n)
        if len(grams) and len(blocklist):
            enc = pc.dictionary_encode(grams)
            codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
            member = (
                blocklist.get_indexer(enc.dictionary.to_numpy(zero_copy_only=False))
                >= 0
            )
            key = np.unique((rows << np.int64(32)) | codes)
            hit = member[(key & np.int64(0xFFFFFFFF)).astype(np.int64)]
            hits = np.bincount(
                (key >> np.int64(32))[hit], minlength=b.num_rows
            ).astype(np.int64)
        keep = ((ids % benchmark_mod) != 0) & (hits > 0)
        return pa.table(
            {
                id_col: pa.array(ids[keep], pa.int64()),
                "n_hits": pa.array(hits[keep], pa.int64()),
            }
        )

    return ds.map_batches(_flag, batch_format="pyarrow")
