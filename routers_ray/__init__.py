"""routers_ray — a Ray-Data-native spatial-join + tiling + map-matching engine.

A from-scratch engine with the query/data-processing capabilities of
``routers-org/routers`` (reference at /root/reference), re-expressed as
``ray.data.Dataset`` pipelines: zero-copy Arrow ``map_batches`` stages,
actor pools for network-holding state, cell-keyed shuffles for the wide
steps. Pure NumPy kernels (trellis/Viterbi, bounded Dijkstra over CSR,
haversine geometry, slippy/quadkey cells) carry the matching semantics;
Ray Data carries the scale.

No code is copied from the reference; file:line citations in docstrings
point at the behavior each piece reproduces.
"""

__version__ = "0.1.0"
