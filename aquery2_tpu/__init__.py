"""aquery2_tpu — a TPU-native, vectorized, in-memory columnar query engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of AQuery++
(reference: sunyinqi0508/AQuery2): an AQuery/SQL dialect with time-series
extensions (ASSUMING sort-order assumptions, moving-window aggregates,
subvec/pack), DDL/DML, hash group-by, joins, UDFs and aggregation UDFs,
user modules, triggers, and stored procedures.

Where the reference pairs an embedded MonetDB with per-query C++ codegen
(reference: prompt.py:485-527, server/server.cpp:236-619), this engine
lowers every query to jitted JAX programs over device-resident columns:
filters are mask+compaction kernels, group-bys are perfect-hash
scatter-adds or sort-segment reductions, window aggregates are
associative scans, and multi-chip scaling uses jax.sharding meshes with
XLA collectives instead of a second engine.

Public entry points:
    >>> import aquery2_tpu as aq
    >>> db = aq.connect()
    >>> db.execute("CREATE TABLE t(a INT, b INT)")
    >>> db.execute("INSERT INTO t VALUES (1, 2), (3, 4)")
    >>> db.execute("SELECT a, sum(b) FROM t GROUP BY a").to_pandas()
"""

from __future__ import annotations

import jax

# SQL semantics need exact 64-bit integer accumulation (the reference
# promotes int aggregates to `long`, common/types.py:211-256). Hot kernels
# opt back into 32-bit explicitly where safe.
jax.config.update("jax_enable_x64", True)

# Honor JAX_PLATFORMS / AQ_TPU_PLATFORM even when a site hook imported jax
# before us (an env sitecustomize can freeze the platform config; see
# tests/conftest.py). Without this, `JAX_PLATFORMS=cpu python -m
# aquery2_tpu` would silently run on the default device.
import os as _os0  # noqa: E402

# Multi-host process group (parallel/multihost.py): must join BEFORE the
# first jax computation initializes the local-only backend (including the
# platform probe below), so the env-driven launch path
# (AQ_COORDINATOR=host:port AQ_NUM_PROCESSES=N AQ_PROCESS_ID=i) binds
# here at import — connect() covers the programmatic path when nothing
# has touched the backend yet.
if _os0.environ.get("AQ_COORDINATOR"):
    from aquery2_tpu.parallel import multihost as _multihost  # noqa: E402

    _multihost.initialize()

_plat = _os0.environ.get("AQ_TPU_PLATFORM") or _os0.environ.get("JAX_PLATFORMS")
if _plat and jax.config.jax_platforms != _plat:
    try:
        jax.config.update("jax_platforms", _plat)
        # If a backend is already LIVE on the wrong platform (the site
        # hook initializes eagerly), the config update alone is not
        # enough — and a half-applied switch silently drops XLA_FLAGS
        # like --xla_force_host_platform_device_count, collapsing an
        # 8-device test mesh to 1 device where every psum is a no-op.
        # A full backend reset re-reads both the platform and the flags.
        _want = _plat.split(",")[0].strip().lower()
        _have = jax.devices()[0].platform.lower()
        if _want == "cpu" and _have != "cpu":
            from jax.extend import backend as _xbe

            _xbe.clear_backends()
    except Exception:
        pass

# Persistent XLA compilation cache — the TPU-native equivalent of the
# reference's md5-checksummed build cache (build.py:205-247 pickles source
# checksums to `.cached` to skip clang recompiles; we skip XLA recompiles).
import os as _os  # noqa: E402

if _os.environ.get("AQ_TPU_NO_COMPILE_CACHE") not in ("1", "true"):
    _cache_dir = _os.environ.get(
        "AQ_TPU_COMPILE_CACHE", _os.path.expanduser("~/.cache/aquery2_tpu/xla")
    )
    _os.makedirs(_cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

__version__ = "0.1.0"

from aquery2_tpu.storage.table import Table, Column  # noqa: E402
from aquery2_tpu.storage.result import Result  # noqa: E402

__all__ = [
    "Session",
    "connect",
    "Table",
    "Column",
    "Result",
    "__version__",
]


def __getattr__(name: str):
    # Session pulls in the parser/engine stack; import lazily so the
    # storage/ops layers stay usable standalone.
    if name in ("Session", "connect"):
        from aquery2_tpu.session import Session, connect

        return {"Session": Session, "connect": connect}[name]
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
