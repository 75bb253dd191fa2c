"""Pallas compile-failure recovery.

The tunneled TPU environment's remote Mosaic compile service can break
independently of the chip (observed: HTTP 500 from :8083/remote_compile
after ~7 min of client retries, surfacing as JaxRuntimeError
FAILED_PRECONDITION / MosaicError). Programs ALREADY in the persistent
XLA cache keep executing fine — only fresh Pallas compiles fail. So the
engine tries Pallas-first (cached programs keep their measured speed)
and, on the first failure that looks like a Mosaic/Pallas compile error,
flips ``config.use_pallas`` off for the session lifetime, clears every
trace cache (the gates are read at trace time), and retries the
statement once on the pure-XLA formulations.

The reference has no analogue (single fixed backend); this is the
failure-detection/recovery subsystem item of SURVEY §5 applied to the
compile path.
"""

from __future__ import annotations

# Mosaic/Pallas-specific markers only: broad runtime strings like
# "failed_precondition" / "invalid type" can appear in genuine engine
# bugs, and matching them would silently disable Pallas and mask the bug
# for the session (ADVICE r4). A real remote-Mosaic failure always names
# the subsystem ("Mosaic failed to compile", "pallas_call",
# "remote_compile HTTP ...").
_MARKERS = ("mosaic", "pallas", "remote_compile", "remote compile")


def is_pallas_failure(e: BaseException) -> bool:
    """Does this exception name the Pallas/Mosaic compile path? Plain
    Python errors (TypeError from a kernel, assertion failures) do NOT
    match — those are engine bugs that must surface, not be retried."""
    from aquery2_tpu import config

    if not config.use_pallas:
        return False                    # already recovered once
    txt = f"{type(e).__name__}: {e}".lower()
    return any(m in txt for m in _MARKERS)


def disable_pallas_and_clear(cause: BaseException | None = None) -> None:
    """Sticky fallback: no further Pallas tracing this process; drop
    every traced-entry cache so retries rebuild pure-XLA programs."""
    import logging

    from aquery2_tpu import config
    from aquery2_tpu.engine import (dist_ordered, dist_query, dist_setop,
                                    dist_window, fused_groupby, fused_join,
                                    fused_ordered, fused_scan)

    config.use_pallas = False
    for mod in (fused_groupby, fused_ordered, fused_join, fused_scan,
                dist_query, dist_ordered, dist_setop, dist_window):
        mod._cache.clear()
    logging.getLogger("aquery2_tpu").warning(
        "Pallas compile failed (remote Mosaic service); retrying on "
        "pure-XLA kernels for the rest of this process",
        exc_info=cause)
