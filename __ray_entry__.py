"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash →
CORRECTNESS_r{N}.json).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in routers_ray) calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline smoke: read the sf0.001 documents table, derive a
    deterministic interleaved-span corpus anchored on those doc ids, and run
    the Viterbi map-match pipeline end to end (parse → anchor/salt → route
    → matcher actor pool). Returns the matched Dataset."""
    import pyarrow.parquet as papq
    import ray.data as rd

    from routers_ray.pipelines.match_pipeline import match_documents
    from routers_ray.pipelines.queries import _match_world

    # touch the driver-provided table (the corpus scale is keyed to it)
    docs = papq.read_table("/root/testdata/sf0.001/documents.parquet", columns=["doc_id"])
    n_docs = min(len(docs), 120)

    world = _match_world(n_docs)
    ds = rd.read_parquet(world["paths"]["parquet"])
    return match_documents(ds, world["store"], concurrency=2, batch_size=64, keep_spans=False)


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2 plus
    the training-data suite (dedup / similarity / text / multimodal)."""
    from routers_ray.pipelines.queries import registry

    return {name: fn for name, (fn, _sql) in registry().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query (same column
    names/types; integer-exact aggregates; half-up float rounding)."""
    from routers_ray.pipelines.queries import registry

    # sql may be a lazy zero-arg callable (the flagship match/match_tiles
    # oracles generate their expected parquet on first resolution)
    return {
        name: (sql() if callable(sql) else sql)
        for name, (_fn, sql) in registry().items()
        if sql is not None
    }
