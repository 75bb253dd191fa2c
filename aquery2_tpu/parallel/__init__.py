"""Multi-chip distribution layer.

The reference is strictly single-node (SURVEY.md §2 "Parallelism
strategies": OpenMP SIMD + MonetDB threads + pipeline concurrency; no
NCCL/MPI). This package is the genuinely new axis (BASELINE.json north
star): tables hash-partitioned over a `jax.sharding.Mesh`, with

* distributed group-by: shard-local dense (perfect-hash) partial
  aggregates combined with `psum` over ICI — one collective per
  aggregate, no row exchange (parallel/dist_groupby.py);
* distributed join: radix `all_to_all` shuffle on key hash so matching
  keys land on the same chip, then the shard-local sort-merge probe
  (parallel/dist_join.py);
* window scans across shard boundaries: per-shard scan + carry exchange
  (parallel/dist_scan.py).

All paths are expressed with shard_map over a named mesh so XLA inserts
the collectives; they run identically on a virtual CPU mesh (tests) and
a real TPU slice.
"""

from aquery2_tpu.parallel.mesh import make_mesh, shard_1d

__all__ = ["make_mesh", "shard_1d"]
