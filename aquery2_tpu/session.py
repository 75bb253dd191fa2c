"""Session: the public entry point.

Counterpart of the reference's `Context` pair — the Python compiler
context (engine/storage.py Context: queries/procs/udf accumulation) and
the C++ runtime Context (server/libaquery.h:118-161: tables, stored
procs, trigger hosts, session memory). One object here: catalog + UDFs +
modules + procedures + triggers + stats, executing statements directly.

    >>> import aquery2_tpu as aq
    >>> db = aq.connect()
    >>> db.execute("CREATE TABLE t(a INT, b INT)")
    >>> db.execute("INSERT INTO t VALUES (1,2),(1,3),(2,5)")
    >>> print(db.execute("SELECT a, sum(b) FROM t GROUP BY a").format())
"""

from __future__ import annotations

import os
import time

from aquery2_tpu.engine.executor import ExecError, Executor
from aquery2_tpu.parser import parse
from aquery2_tpu.parser import ast_nodes as A
from aquery2_tpu.runtime.procedures import ProcedureStore
from aquery2_tpu.runtime.stats import QueryStats
from aquery2_tpu.runtime.triggers import TriggerHost
from aquery2_tpu.storage.catalog import Catalog
from aquery2_tpu.storage.result import Result
from aquery2_tpu.utils import CaseInsensitiveDict


class Session:
    def __init__(self, base_dir: str | None = None,
                 mesh: "int | object | None" = None,
                 mesh_axis: str = "shards") -> None:
        # Distributed mode (SURVEY.md §7 step 6): tables row-shard over a
        # 1-D device mesh and grouped queries run as SPMD programs
        # (engine/dist_query.py). mesh: device count or a jax Mesh.
        self.mesh = None
        self.mesh_axis = mesh_axis
        if mesh is not None:
            from aquery2_tpu.parallel.mesh import make_mesh

            if isinstance(mesh, int):
                if mesh > 1:
                    if mesh & (mesh - 1):
                        raise ValueError("mesh size must be a power of two")
                    self.mesh = make_mesh(mesh, axis=mesh_axis)
            else:
                self.mesh = mesh
                self.mesh_axis = mesh.axis_names[0]
        self.catalog = Catalog()
        self.udfs: CaseInsensitiveDict = CaseInsensitiveDict()
        self.module_functions: CaseInsensitiveDict = CaseInsensitiveDict()
        self.modules: dict[str, object] = {}
        self.stats = QueryStats()
        self.triggers = TriggerHost(self)
        self.procedures = ProcedureStore(self)
        self.base_dir = base_dir or os.getcwd()
        self.executor = Executor(self)
        self.log_level = "info"
        # attached query-executing SQL backends by alias (reference
        # DataSource vtable + get_server[] slots, server.cpp:12-18)
        self.sources: dict[str, object] = {}
        # per-SELECT distributed-path tracking (engine/executor.py sets
        # these around run_select; dist tiers report through them)
        self._dist_hit = False
        self._dist_reason: str | None = None
        self._warned_fallbacks: set[str] = set()
        # (jitted fn, args) of the most recent SPMD query program, for
        # collective-volume accounting (parallel/comm.py)
        self._last_spmd = None

    # -- distributed-path accounting ----------------------------------------

    def note_spmd(self) -> None:
        """A distributed tier ran the current SELECT as one SPMD program."""
        self._dist_hit = True

    def note_dist_bail(self, reason: str) -> None:
        """A distributed tier declined the current SELECT (recorded by
        the executor as a fallback unless another tier takes it)."""
        if self._dist_reason is None:
            self._dist_reason = reason

    def _record_mesh_fallback(self, reason: str) -> None:
        self.stats.dist_fallback += 1
        self.stats.dist_fallback_reasons[reason] = \
            self.stats.dist_fallback_reasons.get(reason, 0) + 1
        if reason not in self._warned_fallbacks:
            self._warned_fallbacks.add(reason)
            self.log(f"mesh session: query fell back to the single-chip "
                     f"path ({reason}); GSPMD handles the sharded arrays "
                     f"implicitly. Further occurrences counted in `stats`.")

    # -- distributed placement ----------------------------------------------

    def place_table(self, tbl) -> None:
        """Row-shard a table's device columns over the session mesh
        (no-op single-chip). Contiguous blocks: NamedSharding(mesh,
        P(axis)) on the padded capacity, which every power-of-two
        bucket divides."""
        if self.mesh is None:
            return
        from aquery2_tpu.parallel.mesh import shard_1d

        for c in tbl.columns.values():
            if getattr(c, "is_vector", False):
                continue
            if c.data.shape[0] % self.mesh.shape[self.mesh_axis]:
                continue
            c.data = shard_1d(self.mesh, c.data, self.mesh_axis)
            if c.valid is not None:
                c.valid = shard_1d(self.mesh, c.valid, self.mesh_axis)

    # -- paths -------------------------------------------------------------

    def resolve_path(self, path: str) -> str:
        if os.path.isabs(path):
            return path
        return os.path.join(self.base_dir, path)

    # -- logging -----------------------------------------------------------

    def log(self, msg: str) -> None:
        if self.log_level == "info":
            print(msg)

    def log_error(self, msg: str) -> None:
        if self.log_level != "silent":
            print(f"error: {msg}")

    # -- execution ---------------------------------------------------------

    def execute(self, text: str) -> Result | None:
        """Parse and execute a statement batch; returns the last Result."""
        with self.stats.timed("parse"):
            stmts = parse(text)
        last: Result | None = None
        t0 = time.perf_counter()
        if stmts and self.procedures.recording is not None:
            # record the source batch (reference records the compiled
            # command stream, server.cpp:252-276; we record source and
            # re-execute on replay, runtime/procedures.py)
            self.procedures.record(text.strip())
        with self.stats.timed("exec"):
            for stmt in stmts:
                try:
                    r = self.executor.execute(stmt)
                except Exception as e:  # noqa: BLE001 — gated below
                    # broken remote Mosaic compile service → sticky
                    # pure-XLA fallback + one retry (engine/recover.py)
                    from aquery2_tpu.engine import recover

                    # only auto-retry side-effect-free statements: a
                    # partially-executed DML/DDL re-run would repeat its
                    # effects (ADVICE r4)
                    if not recover.is_pallas_failure(e) or \
                            not isinstance(stmt, A.Select):
                        raise
                    recover.disable_pallas_and_clear(e)
                    r = self.executor.execute(stmt)
                if r is not None:
                    last = r
        self.stats.record_query(text.strip(), time.perf_counter() - t0)
        return last

    # convenience aliases
    sql = execute

    def run_script(self, stmts: list[A.Statement]) -> Result | None:
        last = None
        for stmt in stmts:
            r = self.executor.execute(stmt)
            if r is not None:
                last = r
        return last

    # -- attached SQL backends (reference DataSource, DataSource_conn.h) ----

    def attach(self, alias: str, source) -> None:
        """Attach a query-executing backend. ``source`` is a DataSource,
        a DB-API connection, or a path/spec string (SQLite)."""
        from aquery2_tpu.storage.datasource import (DataSource, DBAPISource,
                                                    open_source)

        if isinstance(source, str):
            source = open_source(source if source == ":memory:"
                                 else self.resolve_path(source)
                                 if not source.startswith("sqlite:")
                                 else source)
        elif not isinstance(source, DataSource):
            source = DBAPISource(source)
        self.sources[alias.lower()] = source

    def detach(self, alias: str) -> None:
        src = self.sources.pop(alias.lower(), None)
        if src is not None:
            src.close()

    def _source(self, alias: str):
        src = self.sources.get(alias.lower())
        if src is None:
            raise ExecError(f"no attached backend {alias!r}; use attach()")
        return src

    def backend_exec(self, alias: str, sql: str, into: str | None = None):
        """Run SQL on an attached backend (reference DataSource::exec);
        row-returning statements come back as a device Table."""
        return self._source(alias).exec(sql, session=self, into=into)

    def backend_append(self, alias: str, table_name: str,
                       target: str | None = None) -> None:
        """Write a device table into an attached backend (the reference's
        monetdb_append_table path, table_ext_monetdb.hpp:34-86)."""
        tbl = self.catalog.get(table_name)
        self._source(alias).append_table(tbl, target or table_name)

    # -- stored procedures (REPL `procedure p record/stop/run/...`) --------

    def run_procedure(self, name: str) -> Result | None:
        return self.procedures.run(name)

    def notify_insert(self, table_name: str) -> None:
        self.triggers.notify_insert(table_name)

    # -- lifecycle ---------------------------------------------------------

    def close(self) -> None:
        self.triggers.shutdown()
        for src in self.sources.values():
            try:
                src.close()
            except Exception:
                pass
        self.sources.clear()

    def __enter__(self) -> "Session":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


def connect(base_dir: str | None = None,
            mesh: "int | object | None" = None,
            coordinator: str | None = None,
            num_processes: int | None = None,
            process_id: int | None = None) -> Session:
    """mesh: device count (power of two) or a jax Mesh for distributed
    execution; None/1 = single-chip.

    Multi-host: pass coordinator="host0:port", num_processes, process_id
    (or set AQ_COORDINATOR / AQ_NUM_PROCESSES / AQ_PROCESS_ID) on every
    participating process BEFORE the first jax computation — the mesh
    then spans all hosts' devices and every SPMD query tier runs over
    ICI + DCN unchanged (parallel/multihost.py)."""
    from aquery2_tpu.parallel import multihost

    multihost.initialize(coordinator, num_processes, process_id)
    return Session(base_dir=base_dir, mesh=mesh)
