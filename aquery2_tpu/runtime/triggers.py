"""Interval and conditional triggers.

Reference semantics (server/threading.cpp:158-270, engine/ast.py:
1190-1254):
  * `CREATE TRIGGER t ACTION a INTERVAL n` — run stored procedure `a`
    every n milliseconds (IntervalBasedTriggerHost: 50 ms tick loop).
  * `CREATE TRIGGER t ON tbl ACTION a WHEN q` — after each INSERT into
    `tbl`, run procedure `q`; if its result is truthy, run procedure `a`
    (CallbackBasedTriggerHost activated via the TA command).

Here both kinds drive Session.run_procedure. Interval triggers run on a
daemon ticker thread (started lazily). Conditional triggers dispatch to
a single worker thread through a queue — the inserting thread never
blocks on the condition/action (the reference dispatches through its
thread pool, threading.cpp:223-270; a slow action like the demo's RF
retrain must not stall ingest), while the one-consumer queue preserves
per-table firing order.
"""

from __future__ import annotations

import queue
import threading
import time
from dataclasses import dataclass


@dataclass
class Trigger:
    name: str
    action: str
    interval_ms: int | None = None
    table: str | None = None
    when: str | None = None
    next_fire: float = 0.0
    active: bool = True


class TriggerHost:
    TICK_SECONDS = 0.05  # reference ticks every 50 ms (threading.cpp:165)

    def __init__(self, session) -> None:
        self.session = session
        self.triggers: dict[str, Trigger] = {}
        self._lock = threading.Lock()
        self._ticker: threading.Thread | None = None
        self._stop = threading.Event()
        self._queue: "queue.Queue[Trigger | None]" = queue.Queue()
        self._worker: threading.Thread | None = None
        self._idle = threading.Event()
        self._idle.set()

    # -- registration ------------------------------------------------------

    def create(self, stmt) -> None:
        t = Trigger(stmt.name.lower(), stmt.action,
                    interval_ms=stmt.interval_ms,
                    table=stmt.table.lower() if stmt.table else None,
                    when=stmt.when)
        with self._lock:
            self.triggers[t.name] = t
        if t.interval_ms is not None:
            t.next_fire = time.monotonic() + t.interval_ms / 1000.0
            self._ensure_ticker()

    def drop(self, name: str) -> None:
        with self._lock:
            self.triggers.pop(name.lower(), None)

    # -- interval path -----------------------------------------------------

    def _ensure_ticker(self) -> None:
        if self._ticker is None or not self._ticker.is_alive():
            self._stop.clear()
            self._ticker = threading.Thread(target=self._tick_loop,
                                            name="aq-trigger-ticker",
                                            daemon=True)
            self._ticker.start()

    def _tick_loop(self) -> None:
        while not self._stop.wait(self.TICK_SECONDS):
            now = time.monotonic()
            due = []
            with self._lock:
                for t in self.triggers.values():
                    if t.active and t.interval_ms is not None and now >= t.next_fire:
                        t.next_fire = now + t.interval_ms / 1000.0
                        due.append(t)
            for t in due:
                try:
                    self.session.run_procedure(t.action)
                except Exception as e:  # keep the ticker alive
                    self.session.log_error(f"trigger {t.name}: {e}")

    def shutdown(self) -> None:
        self._stop.set()
        if self._worker is not None and self._worker.is_alive():
            self._queue.put(None)
            self._worker.join(timeout=2.0)

    # -- conditional path ----------------------------------------------------

    def notify_insert(self, table_name: str) -> None:
        """Enqueue conditional triggers watching `table_name` for the
        worker thread (reference `post_exec_triggers` → TA command →
        thread-pool dispatch, threading.cpp:223-270); the inserting
        thread returns immediately."""
        with self._lock:
            watchers = [t for t in self.triggers.values()
                        if t.active and t.table == table_name.lower()]
        if not watchers:
            return
        self._ensure_worker()
        for t in watchers:
            self._idle.clear()
            self._queue.put(t)

    def _ensure_worker(self) -> None:
        if self._worker is None or not self._worker.is_alive():
            self._worker = threading.Thread(target=self._work_loop,
                                            name="aq-trigger-worker",
                                            daemon=True)
            self._worker.start()

    def _work_loop(self) -> None:
        while True:
            t = self._queue.get()
            if t is None:
                return
            try:
                self._fire_conditional(t)
            except Exception as e:
                self.session.log_error(f"trigger {t.name}: {e}")
            finally:
                if self._queue.empty():
                    self._idle.set()

    def _fire_conditional(self, t: Trigger) -> None:
        cond = self.session.run_procedure(t.when) if t.when else None
        fire = True
        if cond is not None and cond.nrows:
            v = cond.rows(limit=1)[0][0]
            fire = bool(v)
        if fire:
            self.session.run_procedure(t.action)

    def drain(self, timeout: float = 10.0) -> bool:
        """Block until every queued conditional trigger has completed —
        for tests and orderly shutdown."""
        return self._idle.wait(timeout)
