"""TPU-native columnar operator library.

This package replaces the reference's C++ kernel headers with JAX/XLA/Pallas
formulations (SURVEY.md §7):

========================  =====================================================
reference                 here
========================  =====================================================
server/aggregations.h     ops.agg (masked reductions), ops.scan (running and
                          windowed aggregates as parallel scans — the
                          reference's sequential `#pragma omp simd` loops
                          become `associative_scan`/cumsum/doubling passes)
server/hasher.h           ops.hashing (key packing + perfect-hash stats),
                          engine/groupby.py (strategy selection)
server/table.h sort       ops.sort (multi-key lax.sort with direction
                          transforms instead of tuple-negation tricks)
filter scan loops         ops.filter (mask + compaction via stable argsort)
========================  =====================================================

Every kernel is shape-polymorphic over *bucketed* padded arrays and takes
the logical length `n` as a (traced or static) scalar, masking padding.
"""

from aquery2_tpu.ops import agg, filter as filter_ops, hashing, scan, segment, sort

__all__ = ["agg", "filter_ops", "hashing", "scan", "segment", "sort"]
