"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding paths are validated
on XLA's host-platform virtual devices (SURVEY.md §7, task environment
notes). The driver separately dry-run-compiles the multi-chip path via
__graft_entry__.dryrun_multichip.
"""

import os

# NOTE: the environment presets JAX_PLATFORMS=axon (the TPU tunnel) AND
# /root/.axon_site/sitecustomize.py imports jax at interpreter startup,
# freezing that env into jax's config before conftest runs. Overriding
# the env var is therefore NOT enough — update the config directly
# (backends are not initialized yet at collection time).
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(12345)
