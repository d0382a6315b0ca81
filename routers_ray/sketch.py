"""Mergeable cardinality sketch (HyperLogLog) as a Ray Data stage.

The 100-TB shape for approximate ``COUNT(DISTINCT ...)``: per-batch
register partials (a bounded ``m = 2^p`` array regardless of input
size) → one tiny ``groupby(reg).max(rho)`` — the exchange moves at most
``m`` rows per batch, and sketches merge by elementwise register max,
so any partitioning / run order yields the BIT-IDENTICAL sketch.

Hashing is the repo's md5-u64 convention (first 8 md5 digest bytes
little-endian == DuckDB ``md5_number_upper``), so the register table
itself is exactly SQL-expressible and the driver oracle checks the
sketch bit-for-bit; only the float estimate stays engine-side (checked
in tests against DuckDB's exact distinct within the theoretical error).

Rank variant: ``rho = 1 + trailing_zeros(h >> p)`` (trailing- instead
of leading-zero rank — the same geometric observable over uniform hash
bits, and exact in both engines via ``log2`` of the isolated low bit, a
power of two that float64 represents exactly).

Reference scope note: the reference engine has no sketches; this is a
"beyond the reference" training-data operator (SURVEY §2.5 metrics
family). Estimator constants follow Flajolet et al., "HyperLogLog: the
analysis of a near-optimal cardinality estimation algorithm" (AofA 2007),
with the standard small-range linear-counting correction.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

__all__ = [
    "hll_partials",
    "hll_sketch",
    "hll_merge",
    "hll_estimate",
    "md5_u64",
    "cms_partials",
    "cms_sketch",
    "cms_merge",
    "cms_query",
    "mg_summary",
    "mg_merge",
    "heavy_hitters",
]


def md5_u64(values: list[str]) -> np.ndarray:
    """First 8 md5 digest bytes little-endian — == DuckDB md5_number_upper."""
    return np.frombuffer(
        b"".join(hashlib.md5(v.encode("utf-8")).digest()[:8] for v in values),
        dtype=np.uint64,
    )


def hll_partials(hashes: np.ndarray, p: int = 10) -> pa.Table:
    """One batch's sparse register partials: (reg, rho) with per-batch max.

    ``reg`` is the low ``p`` hash bits; ``rho`` the trailing-zero rank of
    the remaining bits (+1), with the all-zero remainder pinned to
    ``64 - p + 1``. Bounded output: at most ``2^p`` rows per batch.
    """
    h = np.asarray(hashes, dtype=np.uint64)
    m = np.uint64((1 << p) - 1)
    reg = (h & m).astype(np.int64)
    w = h >> np.uint64(p)
    with np.errstate(over="ignore"):
        lowbit = w & (~w + np.uint64(1))
    # log2 of an isolated bit is an exact float64 integer
    rho = np.where(
        w == 0,
        np.int64(64 - p + 1),
        np.log2(np.maximum(lowbit, np.uint64(1)).astype(np.float64)).astype(np.int64)
        + np.int64(1),
    )
    dense = np.zeros(1 << p, dtype=np.int64)
    np.maximum.at(dense, reg, rho)
    hit = np.flatnonzero(dense)
    return pa.table(
        {
            "reg": pa.array(hit.astype(np.int64), pa.int64()),
            "rho": pa.array(dense[hit], pa.int64()),
        }
    )


def hll_sketch(ds, value_fn, p: int = 10):
    """Dataset → sparse sketch Dataset (reg, rho): per-batch partials then
    ``groupby(reg).max(rho)``. ``value_fn(batch) -> list[str]`` extracts
    the hashed strings."""

    def _partials(b: pa.Table) -> pa.Table:
        return hll_partials(md5_u64(value_fn(b)), p)

    out = ds.map_batches(_partials, batch_format="pyarrow").groupby("reg").max("rho")
    return out.map_batches(
        lambda t: t.rename_columns(["reg", "rho"]), batch_format="pyarrow"
    )


def hll_merge(sparse_tables: list[pa.Table], p: int = 10) -> np.ndarray:
    """Sketches merge by elementwise register max → dense register array."""
    dense = np.zeros(1 << p, dtype=np.int64)
    for t in sparse_tables:
        reg = np.asarray(t["reg"], dtype=np.int64)
        rho = np.asarray(t["rho"], dtype=np.int64)
        np.maximum.at(dense, reg, rho)
    return dense


def cms_partials(keys: list[str], counts: np.ndarray, depth: int = 4, width: int = 1024) -> pa.Table:
    """Count-Min row partials for one batch's (unique key, count) pairs:
    rows (j, col, n) with ``col = md5_u64(f"{j}:{key}") % width`` — the
    per-depth hash is a fresh md5 over a depth-prefixed key, so the
    counter table is exactly SQL-expressible (``md5_number_upper(j ||
    ':' || key) % width``). Bounded output: ≤ depth × width rows."""
    counts = np.asarray(counts, dtype=np.int64)
    dense = np.zeros((depth, width), dtype=np.int64)
    for j in range(depth):
        cols = (md5_u64([f"{j}:{k}" for k in keys]) % np.uint64(width)).astype(np.int64)
        np.add.at(dense[j], cols, counts)
    jj, cc = np.nonzero(dense)
    return pa.table(
        {
            "j": pa.array(jj.astype(np.int64), pa.int64()),
            "col": pa.array(cc.astype(np.int64), pa.int64()),
            "n": pa.array(dense[jj, cc], pa.int64()),
        }
    )


def cms_sketch(ds, value_fn, depth: int = 4, width: int = 1024):
    """Dataset → Count-Min counter Dataset (j, col, n): per-batch unique-
    key combiner → row partials → ``groupby(j, col).sum(n)``. Counters
    merge by addition, so any partitioning yields the identical table."""

    def _partials(b: pa.Table) -> pa.Table:
        vals = value_fn(b)
        uniq, counts = np.unique(np.asarray(vals, dtype=object), return_counts=True)
        return cms_partials([str(u) for u in uniq], counts, depth, width)

    out = ds.map_batches(_partials, batch_format="pyarrow").groupby(["j", "col"]).sum("n")
    return out.map_batches(
        lambda t: t.rename_columns(["j", "col", "n"]), batch_format="pyarrow"
    )


def cms_merge(sparse_tables: list[pa.Table], depth: int = 4, width: int = 1024) -> np.ndarray:
    """Counter tables merge by addition → dense (depth, width) array."""
    dense = np.zeros((depth, width), dtype=np.int64)
    for t in sparse_tables:
        j = np.asarray(t["j"], dtype=np.int64)
        c = np.asarray(t["col"], dtype=np.int64)
        n = np.asarray(t["n"], dtype=np.int64)
        np.add.at(dense, (j, c), n)
    return dense


def cms_query(dense: np.ndarray, key: str) -> int:
    """Point estimate: min over rows — ≥ the true count, ≤ true + εN with
    ε = e/width at the standard failure bound."""
    depth, width = dense.shape
    est = None
    for j in range(depth):
        col = int(md5_u64([f"{j}:{key}"])[0] % np.uint64(width))
        v = int(dense[j, col])
        est = v if est is None else min(est, v)
    return int(est)


def hll_estimate(dense: np.ndarray) -> float:
    """Flajolet raw estimator + linear counting below the 2.5m knee."""
    m = dense.size
    alpha = {16: 0.673, 32: 0.697, 64: 0.709}.get(m, 0.7213 / (1.0 + 1.079 / m))
    raw = alpha * m * m / np.sum(np.float64(2.0) ** (-dense.astype(np.float64)))
    zeros = int(np.count_nonzero(dense == 0))
    if raw <= 2.5 * m and zeros:
        return float(m * np.log(m / zeros))
    return float(raw)


# ---------------------------------------------------------------------------
# Misra-Gries heavy hitters (sketch-prefilter + exact-recount two-pass)


def mg_summary(keys: np.ndarray, counts: np.ndarray, k: int):
    """Order-free Misra-Gries summary of exact (key, count) pairs: keep
    the k largest-count keys with the (k+1)-th largest count subtracted
    (the mergeable-summaries form, Agarwal et al., PODS 2012). Undercount
    is at most n/(k+1), and no key with count > n/(k+1) is dropped — the
    no-false-negative guarantee the recount pass relies on."""
    if keys.size <= k:
        return keys, counts
    order = np.argsort(counts, kind="stable")[::-1]
    d = counts[order[k]]
    keep = order[:k]
    newc = counts[keep] - d
    pos = newc > 0
    return keys[keep][pos], newc[pos]


def mg_merge(keys: np.ndarray, counts: np.ndarray, k: int):
    """Merge concatenated summary rows: sum per key, then re-summarize.
    Composition preserves the MG guarantee (mergeable summaries)."""
    uniq, inv = np.unique(keys, return_inverse=True)
    sums = np.zeros(uniq.size, dtype=np.int64)
    np.add.at(sums, inv, counts)
    return mg_summary(uniq, sums, k)


def heavy_hitters(ds, value_fn, theta: float, k: int | None = None):
    """EXACT frequent items (count ≥ theta·N) at bounded memory — the
    10^12-row shape where a full groupby over the value domain is off the
    table: per-batch MG summaries (≤ k rows each, plus one total row) →
    driver merge (the candidate set, ≤ k keys — NEVER misses a true heavy
    while k ≥ 1/theta) → broadcast exact recount of the candidates only →
    threshold filter. The final output is exact and partitioning-invariant
    even though the intermediate summaries aren't.

    ``value_fn(batch) -> np.ndarray`` of int64 items. Returns a pyarrow
    Table (item, n) — at most k rows.
    """
    if k is None:
        k = max(int(np.ceil(1.0 / theta)), 1)

    def _partials(b: pa.Table) -> pa.Table:
        vals = np.asarray(value_fn(b), dtype=np.int64)
        u, c = np.unique(vals, return_counts=True)
        ks, cs = mg_summary(u, c.astype(np.int64), k)
        # one sentinel row (kind=1) carries the batch item-count so the
        # driver learns N without a second pass over the data
        return pa.table(
            {
                "item": pa.array(np.r_[ks, [-1]], pa.int64()),
                "n": pa.array(np.r_[cs, [vals.size]].astype(np.int64), pa.int64()),
                "kind": pa.array(np.r_[np.zeros(ks.size, np.int8), [1]], pa.int8()),
            }
        )

    parts = ds.map_batches(_partials, batch_format="pyarrow").to_pandas()
    total = int(parts.loc[parts["kind"] == 1, "n"].sum())
    mg = parts[parts["kind"] == 0]
    cand_keys, _ = mg_merge(
        mg["item"].to_numpy(np.int64), mg["n"].to_numpy(np.int64), k
    )
    if cand_keys.size == 0 or total == 0:
        return pa.table({"item": pa.array([], pa.int64()), "n": pa.array([], pa.int64())})
    cand = np.sort(cand_keys)

    def _recount(b: pa.Table) -> pa.Table:
        vals = np.asarray(value_fn(b), dtype=np.int64)
        keep = vals[np.isin(vals, cand)]
        u, c = np.unique(keep, return_counts=True)
        return pa.table(
            {"item": pa.array(u, pa.int64()), "n": pa.array(c.astype(np.int64), pa.int64())}
        )

    agg = ds.map_batches(_recount, batch_format="pyarrow").groupby("item").sum("n")
    pdf = agg.to_pandas()
    pdf.columns = ["item", "n"]
    pdf = pdf[pdf["n"] >= theta * total].sort_values("item").reset_index(drop=True)
    return pa.table(
        {"item": pa.array(pdf["item"].astype("int64")), "n": pa.array(pdf["n"].astype("int64"))}
    )
