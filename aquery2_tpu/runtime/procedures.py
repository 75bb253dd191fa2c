"""Stored procedures: record / replay / persist.

Reference semantics (server/server.cpp:368-502, prompt.py:646-677):
`procedure p record` captures the subsequent command stream; `stop` ends
recording and persists `<name>.aqp` + per-step dll snapshots; `run`
replays; `load`/`save` move between disk and memory; `display` prints.

TPU-native redesign: instead of snapshotting compiled .so files we record
the **statement texts** (the logical plan source). Replay re-executes
them through the engine; XLA's persistent compilation cache plays the
role of the .so snapshots (compiled artifacts keyed by trace, not by
recording). The .aqp format here is a simple UTF-8 text file: one header
line `AQPROC <n>` + the statements, NUL-separated like the reference's
command buffer (server.cpp:390-436).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field


@dataclass
class StoredProcedure:
    name: str
    statements: list[str] = field(default_factory=list)


class ProcedureStore:
    def __init__(self, session, directory: str = "procedures") -> None:
        self.session = session
        self.directory = directory
        self.procedures: dict[str, StoredProcedure] = {}
        self.recording: StoredProcedure | None = None

    # -- recording ---------------------------------------------------------

    def start_recording(self, name: str) -> None:
        self.recording = StoredProcedure(name.lower())

    def record(self, stmt_text: str) -> None:
        if self.recording is not None:
            self.recording.statements.append(stmt_text)

    def stop_recording(self) -> None:
        if self.recording is None:
            return
        self.procedures[self.recording.name] = self.recording
        self.save(self.recording.name)
        self.recording = None

    # -- persistence (.aqp) ------------------------------------------------

    def _path(self, name: str) -> str:
        return os.path.join(self.session.resolve_path(self.directory),
                            f"{name.lower()}.aqp")

    def save(self, name: str) -> None:
        p = self.procedures[name.lower()]
        os.makedirs(os.path.dirname(self._path(name)), exist_ok=True)
        with open(self._path(name), "w") as f:
            f.write(f"AQPROC {len(p.statements)}\n")
            f.write("\0".join(p.statements))

    def load(self, name: str) -> StoredProcedure:
        key = name.lower()
        if key in self.procedures:
            return self.procedures[key]
        path = self._path(name)
        if not os.path.exists(path):
            raise KeyError(f"no stored procedure {name!r} (looked in {path})")
        with open(path) as f:
            header = f.readline()
            if not header.startswith("AQPROC"):
                raise ValueError(f"{path}: not an aqp file")
            body = f.read()
        stmts = [s for s in body.split("\0") if s.strip()]
        p = StoredProcedure(key, stmts)
        self.procedures[key] = p
        return p

    # -- replay ------------------------------------------------------------

    def run(self, name: str):
        p = self.load(name)
        last = None
        for s in p.statements:
            r = self.session.execute(s)
            if r is not None:
                last = r
        return last

    def display(self, name: str) -> str:
        p = self.load(name)
        return "\n".join(p.statements)
