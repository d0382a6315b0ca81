"""CLI — the reference's binary surface (``generate-shards``, ``matcher``,
``replay``) as subcommands.

    python -m routers_ray synth-world --out DIR [--n-docs N] [--seed S]
    python -m routers_ray build-store --world DIR [--partition-zoom Z]
    python -m routers_ray match --docs FILE --store DIR --out DIR [--checkpoint]
    python -m routers_ray tiles --matched DIR --out FILE [--zooms 10,13,15]
    python -m routers_ray snap --points FILE --store DIR --out DIR

Owns its Ray session (guarded init + shutdown) — library code never does.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _ray(num_cpus: int | None):
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False
    return ray


def cmd_synth_world(args):
    from .network import build_network_store, synth_network
    from .synth import synth_corpus, write_corpus

    os.makedirs(args.out, exist_ok=True)
    nodes, edges = synth_network(seed=args.seed, n_cities=args.cities)
    build_network_store(nodes, edges, os.path.join(args.out, "netstore"), use_ray=False)
    docs = synth_corpus(n_docs=args.n_docs, seed=args.seed, network=(nodes, edges))
    paths = write_corpus(docs, os.path.join(args.out, "corpus"))
    print(json.dumps({"world": args.out, "n_docs": len(docs), **paths}))


def cmd_build_store(args):
    import pyarrow.parquet as pq

    from .network import build_network_store

    _ray(args.num_cpus)
    nodes = pq.read_table(args.nodes)
    edges = pq.read_table(args.edges)
    man = build_network_store(
        nodes, edges, args.out, partition_zoom=args.partition_zoom, use_ray=True
    )
    print(json.dumps({"store": args.out, "n_cells": man["n_cells"]}))


def cmd_match(args):
    ray = _ray(args.num_cpus)
    import ray.data as rd

    from .checkpoint import run_checkpointed
    from .pipelines.match_pipeline import match_documents, matched_ok

    ds = rd.read_parquet(args.docs)
    if args.checkpoint:
        stats = run_checkpointed(ds, args.store, args.out)
        print(json.dumps(stats))
    else:
        matched = match_documents(
            ds, args.store, concurrency=args.concurrency, batch_size=args.batch_size,
            keep_spans=not args.drop_spans,
        )
        matched_ok(matched).write_parquet(args.out)
        print(json.dumps({"out": args.out}))
    ray.shutdown()


def cmd_tiles(args):
    ray = _ray(args.num_cpus)
    import ray.data as rd

    from .tiles import materialize_tiles

    ds = rd.read_parquet(args.matched)
    tiles = materialize_tiles(ds, [int(z) for z in args.zooms.split(",")])
    import pyarrow.parquet as pq

    pq.write_table(tiles, args.out)
    print(json.dumps({"out": args.out, "n_tiles": tiles.num_rows}))
    ray.shutdown()


def cmd_snap(args):
    ray = _ray(args.num_cpus)
    import ray.data as rd

    from .pipelines.snap_pipeline import snap_points

    ds = rd.read_parquet(args.points)
    snap_points(ds, args.store, radius_m=args.radius).write_parquet(args.out)
    print(json.dumps({"out": args.out}))
    ray.shutdown()


def main(argv=None):
    p = argparse.ArgumentParser(prog="routers_ray")
    p.add_argument("--num-cpus", type=int, default=None)
    sub = p.add_subparsers(dest="cmd", required=True)

    s = sub.add_parser("synth-world", help="deterministic corpus + network world")
    s.add_argument("--out", required=True)
    s.add_argument("--n-docs", type=int, default=200)
    s.add_argument("--seed", type=int, default=42)
    s.add_argument("--cities", type=int, default=2)
    s.set_defaults(fn=cmd_synth_world)

    s = sub.add_parser("build-store", help="partitioned network store (generate-shards)")
    s.add_argument("--nodes", required=True)
    s.add_argument("--edges", required=True)
    s.add_argument("--out", required=True)
    s.add_argument("--partition-zoom", type=int, default=12)
    s.set_defaults(fn=cmd_build_store)

    s = sub.add_parser("match", help="match interleaved docs")
    s.add_argument("--docs", required=True)
    s.add_argument("--store", required=True)
    s.add_argument("--out", required=True)
    s.add_argument("--checkpoint", action="store_true")
    s.add_argument("--concurrency", type=int, default=4)
    s.add_argument("--batch-size", type=int, default=64)
    s.add_argument("--drop-spans", action="store_true")
    s.set_defaults(fn=cmd_match)

    s = sub.add_parser("tiles", help="materialize tile table from matched rows")
    s.add_argument("--matched", required=True)
    s.add_argument("--out", required=True)
    s.add_argument("--zooms", default="10,13,15")
    s.set_defaults(fn=cmd_tiles)

    s = sub.add_parser("snap", help="1-NN snap points to the network")
    s.add_argument("--points", required=True)
    s.add_argument("--store", required=True)
    s.add_argument("--out", required=True)
    s.add_argument("--radius", type=float, default=50.0)
    s.set_defaults(fn=cmd_snap)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
