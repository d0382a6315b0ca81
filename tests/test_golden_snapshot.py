"""Committed golden-snapshot test — the insta-snapshot analogue
(reference ``src/test.rs:19-51``): the deterministic oracle world's matched
output must stay byte-identical (coords at 1e-6) across refactors.

Regenerate deliberately with ``python tools/make_golden.py``.
"""

import os

import pandas as pd
import pyarrow.parquet as pq

from tools.make_golden import build_golden

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "matched_golden.parquet")


def test_matches_committed_golden():
    golden = pq.read_table(GOLDEN).to_pandas()
    current = build_golden().to_pandas()
    key = ["doc_id", "seq", "status"]
    golden = golden.sort_values(key).reset_index(drop=True)
    current = current.sort_values(key).reset_index(drop=True)
    assert len(golden) == len(current)
    pd.testing.assert_frame_equal(golden, current, check_dtype=False)
