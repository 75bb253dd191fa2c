"""Query execution engine.

Replaces the reference's two-engine split — MonetDB for relational SQL +
codegen'd C++ for ordered post-processing (engine/ast.py `has_postproc`
decision :199-249) — with a single TPU executor: every statement lowers to
device kernels from aquery2_tpu.ops. The per-query clang compile of the
reference (build.py `build_dll`) becomes an XLA trace+compile, amortized by
shape bucketing and the persistent compilation cache.

Modules:
  executor.py  statement execution against a Session (DDL/DML/SELECT)
  eval.py      expression evaluation (ungrouped and grouped modes)
  groupby.py   grouping strategies (perfect-hash dense codes vs sort-based)
  join.py      equi-join (sort-merge) + join-graph extraction from WHERE
  udf.py       FUNCTION / AGGREGATION FUNCTION compilation
"""
