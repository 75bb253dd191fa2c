"""Global configuration for aquery2_tpu.

Plays the role of the reference's ``aquery_config.py`` (reference:
aquery_config.py:4-32 — platform detection, env-var driven flags) but for a
JAX/TPU engine: instead of picking a C++ compiler and MonetDB library paths,
we pick a JAX backend, shape-bucketing policy, and kernel strategy knobs.

Environment variables (all optional):
    AQ_TPU_PLATFORM     force a jax platform ("tpu", "cpu") — like the
                        reference's ``engine`` REPL command switching backends.
    AQ_TPU_DEBUG        1 → verbose logging + pallas interpret mode.
    AQ_TPU_STRICT_REF   1 (default) → mirror reference quirks bit-for-bit
                        where feasible (e.g. ``var`` divides by n+1,
                        reference: server/aggregations.h:333-348).
    AQ_TPU_BUCKET       shape-bucketing policy: "pow2" (default), "exact".
    AQ_TPU_DONATE       1 (default) → donate buffers on in-place ops.
"""

from __future__ import annotations

import os
import sys

version_string = "0.1.0"

# --- platform -------------------------------------------------------------

os_platform = (
    "win" if sys.platform.startswith("win")
    else "mac" if sys.platform.startswith("darwin")
    else "linux"
)


def _flag(name: str, default: bool) -> bool:
    v = os.environ.get(name)
    if v is None:
        return default
    return v.strip() not in ("", "0", "false", "False", "no")


debug: bool = _flag("AQ_TPU_DEBUG", False)

# Mirror reference numeric quirks (var/(n+1) etc.) for result parity.
strict_reference_semantics: bool = _flag("AQ_TPU_STRICT_REF", True)

# Shape bucketing: pad device columns to the next bucket so XLA recompiles
# O(log n) times instead of per-length (the reference recompiles C++ per
# query; we amortize XLA compiles per *shape bucket*).
bucket_policy: str = os.environ.get("AQ_TPU_BUCKET", "pow2")

donate_buffers: bool = _flag("AQ_TPU_DONATE", True)

# Pallas (Mosaic) kernels on the TPU hot paths: one-pass segmented
# scans/sums replacing log-n XLA doubling. AQ_TPU_PALLAS=0 falls back to
# pure-XLA formulations everywhere.
use_pallas: bool = _flag("AQ_TPU_PALLAS", True)

# Fused one-hot MXU segment reduction (pallas_kernels.onehot_segment_
# sums) for the dense group-by tier. Validated on the chip in round 5:
# after the i64-constant and bf16-select Mosaic fixes it compiles and
# matches the XLA tier bit-for-bit — but it is VPU-bound building the
# dp×rows one-hot in-kernel and measures ~2× SLOWER than the XLA scan
# tier (~4.5 ms vs ~2 ms per 2^24 rows at dp≈128; XLA keeps the one-hot
# fused into the dot so the presumed HBM-materialization advantage never
# existed). Stays opt-in as an A/B reference, not a production path.
use_pallas_onehot: bool = _flag("AQ_TPU_ONEHOT", False)

# Forced platform, if any (resolved lazily by runtime.device).
forced_platform: str | None = os.environ.get("AQ_TPU_PLATFORM") or None

# Distributed group-by partial merge: "owner" (default — hash(key)→owner
# all_to_all of compacted partials, each group re-reduced on ONE shard,
# wire O(partials + G)) or "replicated" (all-gather padded partials to
# every device; simpler, O(ndev·partials) wire; kept for A/B).
dist_merge: str = os.environ.get("AQ_TPU_DIST_MERGE", "owner")

# Minimum padded capacity for a device column. Multiples of 1024 keep the
# (8,128)/(16,128) TPU tile constraints satisfied after any reshape to 2D.
MIN_CAPACITY = 1024

# Direct-addressing (perfect-hash) group-by/join is used when the dense
# key domain is at most this many slots (reference's PerfectHashTable caps
# the packed key at 18 bits, server/hasher.h:209-322; a 2^27-slot int32
# position table is 0.5 GB of HBM — cheap next to the 1e8-row sort it
# replaces: h2o qjg at 1e8 rows was 33 s via the general join, ~2 s via
# the dense lookup).
PERFECT_HASH_MAX_DOMAIN = 1 << 27

# One-hot-matmul grouped reduction (MXU path) is used when the number of
# groups is at most this.
ONEHOT_MATMUL_MAX_GROUPS = 512


def bucket_size(n: int) -> int:
    """Padded capacity for a logical length ``n`` under the bucket policy.

    Buckets are {2^k, 3·2^(k-1)}: two per octave, so worst-case padding
    is 33% instead of pow2's 100% (at 1e8 rows the pow2 bucket 2^27
    wastes 34% of every array — 1.2 GB per int32 column; 3·2^25 wastes
    0.7%). Both forms are multiples of 8192, keeping TPU tile reshapes
    and the Pallas block kernels happy; compile count stays O(log n)."""
    if bucket_policy == "exact":
        return max(int(n), 1)
    cap = MIN_CAPACITY
    while cap < n:
        mid = cap + (cap >> 1)          # 3·2^(k-1)
        if n <= mid and mid % 1024 == 0:
            return mid
        cap <<= 1
    return cap
