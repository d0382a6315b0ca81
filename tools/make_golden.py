"""Regenerate the committed golden matched-output snapshot.

Single-process (no Ray) run of the deterministic oracle world — the
insta-snapshot analogue (reference ``src/test.rs:19-51``, coords rounded
1e-6). Run only when a deliberate semantic change is made; commit the diff.

    python tools/make_golden.py
"""

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from routers_ray.matcher import MatchOptions  # noqa: E402
from routers_ray.network import build_network_store, synth_network  # noqa: E402
from routers_ray.pipelines.match_pipeline import anchor_batch, get_store, match_batch  # noqa: E402
from routers_ray.spans import parse_trajectories  # noqa: E402
from routers_ray.synth import synth_corpus  # noqa: E402

GOLDEN_SEED = 42
GOLDEN_DOCS = 60


def build_golden() -> pa.Table:
    import tempfile

    nodes, edges = synth_network(seed=GOLDEN_SEED, n_cities=2, grid=(8, 8))
    store_dir = tempfile.mkdtemp(prefix="golden_store_")
    build_network_store(nodes, edges, store_dir, use_ray=False)
    docs = synth_corpus(n_docs=GOLDEN_DOCS, seed=GOLDEN_SEED, network=(nodes, edges))
    store = get_store(store_dir)
    parsed = anchor_batch(parse_trajectories(docs), store.partition_zoom, None)
    matched = match_batch(parsed, store, MatchOptions(), keep_spans=False)
    out = matched.select(
        ["doc_id", "seq", "status", "edge_id", "dir", "src", "dst", "snap_lon", "snap_lat", "cost", "cell"]
    )
    # 1e-6 snapshot rounding, like insta redactions (src/test.rs:27-33)
    for col in ("snap_lon", "snap_lat"):
        i = out.schema.get_field_index(col)
        vals = np.round(np.asarray(out[col], dtype=np.float64), 6)
        out = out.set_column(i, col, pa.array(vals, pa.float64()))
    return out


if __name__ == "__main__":
    golden = build_golden()
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests", "golden")
    os.makedirs(path, exist_ok=True)
    pq.write_table(golden, os.path.join(path, "matched_golden.parquet"))
    print(f"wrote {len(golden)} rows to tests/golden/matched_golden.parquet")
