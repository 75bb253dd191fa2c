"""Pallas kernel tests (interpret mode on CPU; same code compiles with
Mosaic on TPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from aquery2_tpu.ops.pallas_kernels import best_profit, fused_running_stats


def test_fused_running_stats(rng):
    cap = 16384
    n = 10000
    x = np.zeros(cap, np.float32)
    x[:n] = rng.random(n).astype(np.float32) * 100 - 50
    sums, mins, maxs = fused_running_stats(jnp.asarray(x), interpret=True)
    np.testing.assert_allclose(np.asarray(sums)[:n],
                               np.cumsum(x[:n], dtype=np.float32), rtol=2e-5)
    np.testing.assert_array_equal(np.asarray(mins)[:n],
                                  np.minimum.accumulate(x[:n]))
    np.testing.assert_array_equal(np.asarray(maxs)[:n],
                                  np.maximum.accumulate(x[:n]))


def test_best_profit_kernel(rng):
    cap = 8192
    n = 5000
    x = np.zeros(cap, np.float32)
    x[:n] = rng.integers(1, 100, n)
    got = float(best_profit(jnp.asarray(x), n, interpret=True))
    want = float((x[:n] - np.minimum.accumulate(x[:n])).max())
    assert got == want
