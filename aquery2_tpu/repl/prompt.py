"""Interactive REPL and script runner.

Counterpart of the reference's `prompt.py` (statement accumulation +
command dispatch, :424-741). Command surface kept compatible:

    <sql statements>      accumulate into the buffer
    exec | xexec          run the buffer (one engine here — no hybrid)
    f <file>              append a script file to the buffer
    echo <text>           print
    stats [on|off|reset]  timing statistics (reference :630-645)
    procedure <p> <op>    record|stop|run|load|save|display (:646-677)
    save [path]           save buffer to file
    log <level>           info|error|silent
    sh [cmd]              shell escape (:694)
    script <file>         run a #!aquery script
    exit / q              quit

Scripts: a file starting with `#!aquery` is replayed through the REPL
line-by-line (reference prompt.py:602-620); otherwise the whole file is
parsed and executed as SQL directly.
"""

from __future__ import annotations

import os
import subprocess
import sys

from aquery2_tpu.session import Session


class Repl:
    def __init__(self, session: Session | None = None, echo_results: bool = True):
        self.session = session or Session()
        self.buffer: list[str] = []
        self.echo_results = echo_results
        self.done = False

    # -- command processing ------------------------------------------------

    def handle_line(self, line: str) -> None:
        stripped = line.strip()
        if not stripped:
            return
        if stripped.startswith("#"):
            return  # comment / shebang
        first, _, rest = stripped.partition(" ")
        cmd = first.lower()

        if cmd in ("exec", "xexec"):
            self.run_buffer()
        elif cmd == "f":
            path = self.session.resolve_path(rest.strip())
            with open(path) as fh:
                self.buffer.append(fh.read())
        elif cmd == "echo":
            print(rest)
        elif cmd == "stats":
            self._stats(rest.strip().lower())
        elif cmd == "procedure":
            self._procedure(rest.split())
        elif cmd == "save":
            path = rest.strip() or "buffer.a"
            with open(self.session.resolve_path(path), "w") as fh:
                fh.write("\n".join(self.buffer))
        elif cmd == "log":
            self.session.log_level = rest.strip().lower() or "info"
        elif cmd == "sh":
            if rest:
                subprocess.run(rest, shell=True)
            else:
                subprocess.run(os.environ.get("SHELL", "/bin/sh"))
        elif cmd == "script":
            self.run_script_file(rest.strip())
        elif cmd == "dbg":
            # reference drops into an interactive console on demand
            # (prompt.py:709-739); we open pdb over the live session
            import pdb

            session = self.session  # noqa: F841 (for the debugger user)
            pdb.set_trace()
        elif cmd == "engine":
            # the reference switches MonetDB/DuckDB/C++ backends here
            # (prompt.py:560-583); the analogue is the jax platform:
            # `engine cpu` / `engine tpu` retargets compute if the
            # backend is not yet pinned (jax fixes it at first use)
            want = rest.strip().lower()
            import jax

            if not want or want == "status":
                print(f"engine: jax platform = "
                      f"{jax.default_backend()}")
            elif want in ("cpu", "tpu", "gpu", "axon"):
                try:
                    cur = jax.default_backend()
                    if cur == want or (want == "tpu" and cur == "axon"):
                        print(f"engine: already on {cur}")
                    else:
                        self._switch_backend(want)
                        print(f"engine: switched to "
                              f"{jax.default_backend()}")
                except Exception as e:  # noqa: BLE001 — REPL surface
                    print(f"engine: cannot switch to {want!r} ({e}); "
                          f"set AQ_TPU_PLATFORM/JAX_PLATFORMS and restart")
            else:
                print(f"engine: unknown backend {want!r} "
                      f"(cpu|tpu|status)")
        elif cmd == "attach":
            # attach <alias> <path.db|sqlite:...|:memory:> — a query-
            # executing backend (reference DataSource + get_server[])
            parts = rest.split()
            if len(parts) != 2:
                print("usage: attach <alias> <sqlite-path|:memory:>")
            else:
                self.session.attach(parts[0], parts[1])
                print(f"attached {parts[0]} (SQLite)")
        elif cmd == "detach":
            self.session.detach(rest.strip())
        elif cmd == "backend":
            # backend <alias> <sql...> — run SQL on an attached backend;
            # SELECTs materialize as device tables and print
            alias, _, sql = rest.partition(" ")
            try:
                t = self.session.backend_exec(alias, sql.strip())
            except Exception as e:  # noqa: BLE001 — REPL surface
                print(f"error: {e}")
            else:
                if t is not None:
                    from aquery2_tpu.storage.result import Result

                    print(Result(t).format())
        elif cmd == "export":
            # export <table> <alias> [target] — append-back
            # (reference table_ext_monetdb.hpp:34-86)
            parts = rest.split()
            if len(parts) < 2:
                print("usage: export <table> <alias> [target]")
            else:
                self.session.backend_append(
                    parts[1], parts[0],
                    parts[2] if len(parts) > 2 else None)
        elif cmd == "keep":
            print("keep: compiled programs persist in the XLA cache by default")
        elif cmd in ("r", "rr"):
            self.run_buffer()
        elif cmd in ("exit", "q", "quit"):
            self.done = True
        elif cmd == "help":
            print(__doc__)
        else:
            self.buffer.append(line)

    def run_buffer(self) -> None:
        if not self.buffer:
            return
        text = "\n".join(self.buffer)
        self.buffer.clear()
        try:
            r = self.session.execute(text)
            if r is not None and self.echo_results:
                print(r.format(limit=100))
        except Exception as e:
            self.session.log_error(str(e))

    def _switch_backend(self, want: str) -> None:
        """Retarget jax to another platform mid-session (reference
        `engine <backend>` parity, prompt.py:560-583). Device arrays are
        backend-bound, so: snapshot every catalog column to host, drop
        the old backend + all jitted executables, re-upload on the new
        one. Compiled-programs caches keyed by shape are cleared too —
        they hold old-backend constants."""
        import jax
        import jax.numpy as jnp
        import numpy as np

        from aquery2_tpu.storage.table import Column, VectorColumn

        host: list[tuple[object, str, np.ndarray]] = []
        for tname in self.session.catalog.names():
            t = self.session.catalog.get(tname)
            for c in t.columns.values():
                if isinstance(c, VectorColumn):
                    host.append((c, "values", np.asarray(c.values)))
                    host.append((c, "offsets", np.asarray(c.offsets)))
                elif isinstance(c, Column):
                    host.append((c, "data", np.asarray(c.data)))
                    v = getattr(c, "valid", None)
                    if v is not None:
                        host.append((c, "valid", np.asarray(v)))

        jax.config.update("jax_platforms", want)
        import jax.extend.backend as _jb

        _jb.clear_backends()
        for mod_name in ("fused_groupby", "fused_ordered", "fused_scan",
                         "fused_star", "fused_join", "dist_query"):
            mod = __import__(f"aquery2_tpu.engine.{mod_name}",
                             fromlist=["_cache"])
            if hasattr(mod, "_cache"):
                mod._cache.clear()
        for obj, attr, arr in host:
            setattr(obj, attr, jnp.asarray(arr))

    # -- sub-commands ------------------------------------------------------

    def _stats(self, arg: str) -> None:
        st = self.session.stats
        if arg == "on":
            st.enabled = True
        elif arg == "off":
            st.enabled = False
        elif arg == "reset":
            st.reset()
        else:
            print(st.format())

    def _procedure(self, args: list[str]) -> None:
        if len(args) != 2:
            print("usage: procedure <name> <record|stop|run|load|save|display>")
            return
        name, op = args[0], args[1].lower()
        ps = self.session.procedures
        try:
            if op == "record":
                ps.start_recording(name)
            elif op == "stop":
                ps.stop_recording()
            elif op == "run":
                r = ps.run(name)
                if r is not None and self.echo_results:
                    print(r.format(limit=100))
            elif op == "load":
                ps.load(name)
            elif op == "save":
                ps.save(name)
            elif op == "display":
                print(ps.display(name))
            else:
                print(f"unknown procedure op {op!r}")
        except Exception as e:
            self.session.log_error(str(e))

    # -- scripts -----------------------------------------------------------

    def run_script_file(self, path: str) -> None:
        path = self.session.resolve_path(path)
        with open(path) as fh:
            text = fh.read()
        if text.lstrip().startswith("#!aquery"):
            for line in text.splitlines():
                self.handle_line(line)
                if self.done:
                    return
        else:
            self.buffer.append(text)
            self.run_buffer()

    # -- interactive loop --------------------------------------------------

    def loop(self) -> None:
        print(f"aquery2_tpu {__import__('aquery2_tpu').__version__} — "
              f"type statements, then `exec`; `help` for commands")
        while not self.done:
            try:
                prompt = ">>> " if not self.buffer else "... "
                line = input(prompt)
            except EOFError:
                break
            except KeyboardInterrupt:
                self.buffer.clear()
                print("^C (buffer cleared)")
                continue
            self.handle_line(line)


def main(argv: list[str] | None = None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    repl = Repl()
    try:
        if argv and argv[0] == "-c":
            r = repl.session.execute(" ".join(argv[1:]))
            if r is not None:
                print(r.format(limit=100))
        elif argv:
            repl.run_script_file(argv[0])
        else:
            repl.loop()
    finally:
        repl.session.close()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
