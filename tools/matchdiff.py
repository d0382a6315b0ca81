"""matchdiff — compare two matched-output tables (the ``snapdiff`` analogue,
reference ``routers_viewer/src/bin/snapdiff``): per-doc row diffs with
1e-6 coordinate tolerance, exit code 1 when they differ.

    python tools/matchdiff.py A.parquet B.parquet [--tol 1e-6]
"""

from __future__ import annotations

import argparse
import sys

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

KEY = ["doc_id", "seq"]
ID_COLS = ["status", "edge_id", "dir", "src", "dst", "cost"]
GEO_COLS = ["snap_lon", "snap_lat"]


def load(path: str) -> pd.DataFrame:
    df = pq.read_table(path).to_pandas()
    cols = [c for c in KEY + ID_COLS + GEO_COLS if c in df.columns]
    return df[cols].sort_values(KEY).reset_index(drop=True)


def diff(a: pd.DataFrame, b: pd.DataFrame, tol: float) -> list[str]:
    lines: list[str] = []
    ka = set(map(tuple, a[KEY].itertuples(index=False)))
    kb = set(map(tuple, b[KEY].itertuples(index=False)))
    for k in sorted(ka - kb):
        lines.append(f"- only in A: {k}")
    for k in sorted(kb - ka):
        lines.append(f"+ only in B: {k}")
    both = a.merge(b, on=KEY, suffixes=("_a", "_b"))
    for c in ID_COLS:
        ca, cb = f"{c}_a", f"{c}_b"
        if ca in both.columns:
            m = both[ca].astype(str) != both[cb].astype(str)
            for _, row in both[m].iterrows():
                lines.append(f"~ {tuple(row[k] for k in KEY)}: {c} {row[ca]} → {row[cb]}")
    for c in GEO_COLS:
        ca, cb = f"{c}_a", f"{c}_b"
        if ca in both.columns:
            d = (both[ca].astype(float) - both[cb].astype(float)).abs()
            m = d.fillna(0) > tol
            for _, row in both[m].iterrows():
                lines.append(
                    f"~ {tuple(row[k] for k in KEY)}: {c} {row[ca]:.7f} → {row[cb]:.7f}"
                )
    return lines


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="matchdiff")
    p.add_argument("a")
    p.add_argument("b")
    p.add_argument("--tol", type=float, default=1e-6)
    p.add_argument("--limit", type=int, default=50)
    args = p.parse_args(argv)
    lines = diff(load(args.a), load(args.b), args.tol)
    for line in lines[: args.limit]:
        print(line)
    if len(lines) > args.limit:
        print(f"... {len(lines) - args.limit} more")
    print(f"{'IDENTICAL' if not lines else f'{len(lines)} diffs'}")
    return 1 if lines else 0


if __name__ == "__main__":
    sys.exit(main())
