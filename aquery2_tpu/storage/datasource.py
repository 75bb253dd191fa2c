"""Pluggable SQL data sources that EXECUTE queries (the DataSource vtable).

Counterpart of the reference's ``DataSource`` abstract backend
(server/DataSource_conn.h:27-54: connect/exec/getCol/getDSTable/close/
haserror/print_results) with its MonetDB / DuckDB / MariaDB
implementations (monetdb_conn.cpp, duckdb_conn.cpp, mariadb_conn.cpp),
plus the append-back path that pushes engine result tables INTO the
backend (table_ext_monetdb.hpp:34-86 ``monetdb_append_table`` =
CREATE TABLE IF NOT EXISTS + bulk append).

In this engine the device store is the primary database; an attached
source is a peer SQL engine you can
  * ``exec`` arbitrary SQL against (SELECTs come back as device tables),
  * ``get_table`` — map one backend table into the device store
    (reference ``getDSTable``, server.cpp:552-583 'C' opcode), and
  * ``append_table`` — write a device table back out.

Backends: SQLite (stdlib, always available) and any DB-API 2.0
connection (duckdb, mariadb, psycopg2, ...). Sessions hold attached
sources by alias (session.attach / detach / backend_exec), and the REPL
exposes them as `attach`/`detach`/`backend` commands.
"""

from __future__ import annotations

import sqlite3
from typing import Any

import numpy as np

from aquery2_tpu import types as T
from aquery2_tpu.storage.external import import_cursor
from aquery2_tpu.storage.table import Table, VectorColumn


class DataSourceError(Exception):
    pass


class DataSource:
    """Abstract query-executing backend (reference DataSource_conn.h:27-54)."""

    #: reference Backend_Type enum name (DataSource_conn.h:15-24)
    backend_type = "AQuery"

    def __init__(self) -> None:
        self.last_error: str | None = None

    # -- vtable -------------------------------------------------------------

    def exec(self, sql: str, session=None,
             into: str | None = None) -> Table | None:
        """Run SQL on the backend. Row-returning statements materialize
        as a device Table (registered in the session catalog as ``into``
        when given); DDL/DML return None."""
        raise NotImplementedError

    def get_table(self, name: str, session=None,
                  target: str | None = None) -> Table:
        """Map one backend table into the device store (getDSTable)."""
        return self.exec(f"SELECT * FROM {name}", session,
                         into=target or name)

    def append_table(self, table: Table, alt_name: str | None = None,
                     create: bool = True) -> None:
        """Write a device table into the backend (table_ext_monetdb.hpp:
        34-86: CREATE TABLE IF NOT EXISTS from the schema, then append)."""
        raise NotImplementedError

    def haserror(self) -> bool:
        return self.last_error is not None

    def close(self) -> None:
        pass

    # -- helpers ------------------------------------------------------------

    @staticmethod
    def _sql_decl(t: T.SQLType) -> str:
        if t.is_string:
            return "TEXT"
        if t.kind == "float":
            return "REAL"
        if t.kind == "bool":
            return "BOOLEAN"
        return "INTEGER"

    def _create_stmt(self, table: Table, name: str) -> str:
        cols = ", ".join(
            f"{c.name} {self._sql_decl(c.sqltype)}"
            for c in table.columns.values()
            if not isinstance(c, VectorColumn))
        return f"CREATE TABLE IF NOT EXISTS {name} ({cols})"

    @staticmethod
    def _rows_of(table: Table) -> list[tuple]:
        cols = [c for c in table.columns.values()
                if not isinstance(c, VectorColumn)]
        pys = [c.to_python() for c in cols]
        return list(zip(*pys)) if pys else []


class DBAPISource(DataSource):
    """Any DB-API 2.0 connection as a backend (reference's DuckDB/MariaDB
    slots, duckdb_conn.cpp / mariadb_conn.cpp)."""

    backend_type = "DBAPI"

    def __init__(self, conn: Any, paramstyle: str = "qmark") -> None:
        super().__init__()
        self.conn = conn
        self.placeholder = "?" if paramstyle == "qmark" else "%s"

    def exec(self, sql: str, session=None,
             into: str | None = None) -> Table | None:
        self.last_error = None
        try:
            cur = self.conn.cursor()
            cur.execute(sql)
            if cur.description is None:
                if hasattr(self.conn, "commit"):
                    self.conn.commit()
                return None
            name = into or "backend_result"
            if session is not None:
                return import_cursor(session, name, cur)
            return _cursor_to_table(name, cur)
        except Exception as e:  # noqa: BLE001 — mirror haserror semantics
            self.last_error = str(e)
            raise DataSourceError(str(e)) from e

    def append_table(self, table: Table, alt_name: str | None = None,
                     create: bool = True) -> None:
        name = alt_name or table.name
        cur = self.conn.cursor()
        if create:
            cur.execute(self._create_stmt(table, name))
        rows = self._rows_of(table)
        if rows:
            ph = ", ".join([self.placeholder] * len(rows[0]))
            cur.executemany(f"INSERT INTO {name} VALUES ({ph})", rows)
        if hasattr(self.conn, "commit"):
            self.conn.commit()

    def close(self) -> None:
        self.conn.close()


class SQLiteSource(DBAPISource):
    """Embedded SQLite backend — the always-available stand-in for the
    reference's embedded MonetDB (monetdb_conn.cpp:108-124 opens an
    in-process server the same way)."""

    backend_type = "SQLite"

    def __init__(self, path: str = ":memory:") -> None:
        super().__init__(sqlite3.connect(path, check_same_thread=False))
        self.path = path


def _cursor_to_table(name: str, cur) -> Table:
    """Cursor → device Table without a session (standalone use)."""
    from aquery2_tpu.storage.table import Column, StringDict

    rows = cur.fetchall()
    names = [d[0] for d in cur.description]
    cols = []
    for j, nm in enumerate(names):
        vals = [r[j] for r in rows]
        sample = next((v for v in vals if v is not None), None)
        if isinstance(sample, (int, np.integer)):
            cols.append(Column(nm, T.LongT, np.asarray(
                [0 if v is None else v for v in vals], np.int64)))
        elif isinstance(sample, (float, np.floating)):
            cols.append(Column(nm, T.DoubleT, np.asarray(
                [0.0 if v is None else v for v in vals], np.float64)))
        else:
            d = StringDict()
            codes = d.encode(["" if v is None else str(v) for v in vals])
            cols.append(Column(nm, T.StrT, codes, dictionary=d))
    return Table(name, cols)


def open_source(spec: str) -> DataSource:
    """'sqlite:/path/db' | '/path/file.db' | ':memory:' → a DataSource."""
    if spec.startswith("sqlite:"):
        return SQLiteSource(spec[len("sqlite:"):])
    return SQLiteSource(spec)
