"""Multi-host bootstrap: one engine spanning N processes / N hosts.

The reference is strictly single-node (SURVEY.md §5: no NCCL/MPI
anywhere); this is the framework's defining new axis (BASELINE.md:
scaling 1 chip → 1 host → N hosts). JAX's distributed runtime provides
the process group: every process calls `initialize` against a shared
coordinator, after which `jax.devices()` is the GLOBAL device list and
meshes built over it span hosts — collectives ride ICI within a host
and DCN across hosts, inserted by XLA from the same shardings the
single-host SPMD programs use (no code change in the query tiers).

Launch line (each host, same program):

    AQ_COORDINATOR=host0:1234 AQ_NUM_PROCESSES=2 AQ_PROCESS_ID=<i> \
        python -m aquery2_tpu ...
    # or: aq.connect(mesh=N, coordinator="host0:1234",
    #                num_processes=2, process_id=i)

SPMD contract: every process must issue the SAME statements in the same
order (the standard JAX multi-controller model). Fully-replicated
outputs (every query result here) are addressable on all processes, so
results print identically everywhere.
"""

from __future__ import annotations

import os

_initialized = False


def initialize(coordinator: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Join the process group (idempotent). Arguments fall back to the
    AQ_COORDINATOR / AQ_NUM_PROCESSES / AQ_PROCESS_ID environment."""
    global _initialized
    if _initialized:
        return
    coordinator = coordinator or os.environ.get("AQ_COORDINATOR")
    if coordinator is None:
        return
    if num_processes is None:
        num_processes = int(os.environ.get("AQ_NUM_PROCESSES", "0")) or None
    if process_id is None:
        pid = os.environ.get("AQ_PROCESS_ID")
        process_id = int(pid) if pid is not None else None

    import jax

    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
    _initialized = True


def is_multiprocess() -> bool:
    import jax

    return jax.process_count() > 1
