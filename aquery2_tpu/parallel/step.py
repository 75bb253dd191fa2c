"""A combined distributed query step — the engine's "training step".

Exercises every collective pattern the distribution layer uses, in one
jitted program over a mesh (used by __graft_entry__.dryrun_multichip and
scaling benchmarks):

  1. shard-local filter mask (VPU)
  2. dense grouped sums with psum combine         (dist_groupby)
  3. radix all_to_all join pair count             (dist_join)
  4. ordered running sum with carry exchange      (dist_scan)
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from aquery2_tpu.parallel import dist_groupby, dist_join, dist_scan


def distributed_query_step(mesh: Mesh, axis: str, codes, v1, v3, time_col,
                           lkey, rkey, domain: int, bucket_cap: int):
    """Returns (group_counts[D], group_sums[D], group_fsum[D],
    join_pairs scalar, running[n]) — the fused one-step pipeline."""
    nrows = codes.shape[0]
    valid = jnp.ones((nrows,), jnp.bool_)

    counts, sums = dist_groupby.dist_grouped_sums(
        mesh, axis, codes, [v1], jnp.zeros((mesh.shape[axis],), jnp.int32), domain)
    _, fsums = dist_groupby.dist_grouped_sums(
        mesh, axis, codes, [v3], jnp.zeros((mesh.shape[axis],), jnp.int32), domain)

    # shuffle tier: all_to_all re-partition + shard-local sorted reduce
    # (the multi-chip form of the packed-sort group-by)
    _codes_g, sh_counts, _sh_sums, sh_ng, _sh_drop = (
        dist_groupby.dist_grouped_sums_shuffle(
            mesh, axis, codes, [v1], valid, bucket_cap, bucket_cap))

    pairs, _dropped = dist_join.dist_join_counts(mesh, axis, lkey, valid,
                                                 rkey, valid, bucket_cap)

    running = dist_scan.dist_sums(mesh, axis, time_col)
    return counts, sums, fsums, pairs, running, sh_counts, sh_ng


def make_example(mesh: Mesh, axis: str, rows_per_dev: int = 256,
                 domain: int = 32):
    """Tiny sharded example inputs for compile checks."""
    import numpy as np

    from aquery2_tpu.parallel.mesh import shard_1d

    ndev = mesh.shape[axis]
    n = ndev * rows_per_dev
    rng = np.random.default_rng(0)
    codes = shard_1d(mesh, jnp.asarray(rng.integers(0, domain, n), jnp.int32), axis)
    v1 = shard_1d(mesh, jnp.asarray(rng.integers(0, 5, n), jnp.int64), axis)
    v3 = shard_1d(mesh, jnp.asarray(rng.random(n), jnp.float32), axis)
    t = shard_1d(mesh, jnp.asarray(rng.integers(0, 100, n), jnp.int64), axis)
    lk = shard_1d(mesh, jnp.asarray(rng.integers(0, 64, n), jnp.int64), axis)
    rk = shard_1d(mesh, jnp.asarray(rng.integers(0, 64, n), jnp.int64), axis)
    return codes, v1, v3, t, lk, rk
