"""Pluggable external data sources.

Counterpart of the reference's ``DataSource`` vtable with MonetDB /
DuckDB / MariaDB backends (server/DataSource_conn.h:27-54,
monetdb_conn.*, duckdb_conn.*). In this engine the device store IS the
database; external sources are *ingest/attach* points that materialize
into device tables:

  * SQLite (stdlib) — attach a .db file, import tables or query results
  * pandas DataFrames — zero-ceremony ingestion from Python callers
  * any DB-API 2.0 connection (duckdb, mariadb, ...) via import_cursor

Usage:
    db = aq.connect()
    attach_sqlite(db, "data.db", tables=["trades"])      # device tables
    from_dataframe(db, "t", df)
"""

from __future__ import annotations

import sqlite3
from typing import Any, Iterable

import numpy as np

from aquery2_tpu import types as T
from aquery2_tpu.storage.table import Column, StringDict, Table, VectorColumn


_SQLITE_TYPES = {
    "INTEGER": T.LongT, "INT": T.IntT, "BIGINT": T.LongT,
    "SMALLINT": T.ShortT, "TINYINT": T.ByteT,
    "REAL": T.DoubleT, "FLOAT": T.FloatT, "DOUBLE": T.DoubleT,
    "TEXT": T.StrT, "VARCHAR": T.StrT, "CHAR": T.StrT,
    "DATE": T.DateT, "TIMESTAMP": T.TimestampT, "BOOLEAN": T.BoolT,
}


def _sqlite_type(decl: str | None) -> T.SQLType:
    if not decl:
        return T.DoubleT
    base = decl.split("(")[0].strip().upper()
    return _SQLITE_TYPES.get(base, T.StrT)


def attach_sqlite(session, path: str, tables: Iterable[str] | None = None,
                  prefix: str = "") -> list[str]:
    """Import tables from a SQLite database into device tables."""
    conn = sqlite3.connect(session.resolve_path(path))
    try:
        if tables is None:
            rows = conn.execute(
                "SELECT name FROM sqlite_master WHERE type='table'").fetchall()
            tables = [r[0] for r in rows]
        out = []
        for tname in tables:
            info = conn.execute(f"PRAGMA table_info({tname})").fetchall()
            schema = [(r[1], _sqlite_type(r[2])) for r in info]
            cur = conn.execute(f"SELECT * FROM {tname}")
            target = prefix + tname
            import_cursor(session, target, cur, schema)
            out.append(target)
        return out
    finally:
        conn.close()


def import_cursor(session, table_name: str, cursor: Any,
                  schema: list[tuple[str, T.SQLType]] | None = None) -> Table:
    """Materialize any DB-API cursor's result set as a device table."""
    rows = cursor.fetchall()
    if schema is None:
        names = [d[0] for d in cursor.description]
        schema = []
        for j, nm in enumerate(names):
            sample = next((r[j] for r in rows if r[j] is not None), None)
            if isinstance(sample, (int, np.integer)):
                schema.append((nm, T.LongT))
            elif isinstance(sample, (float, np.floating)):
                schema.append((nm, T.DoubleT))
            else:
                schema.append((nm, T.StrT))
    cols: list[Column | VectorColumn] = []
    for j, (nm, t) in enumerate(schema):
        vals = [r[j] for r in rows]
        valid = None
        if any(v is None for v in vals):
            valid = np.asarray([v is not None for v in vals])
        if t.is_string:
            d = StringDict()
            codes = d.encode(["" if v is None else str(v) for v in vals])
            cols.append(Column(nm, T.StrT, codes, dictionary=d, valid=valid))
        else:
            arr = np.asarray([0 if v is None else v for v in vals],
                             dtype=t.np_dtype)
            cols.append(Column(nm, t, arr, valid=valid))
    tbl = Table(table_name, cols)
    session.catalog.create(tbl, replace=True)
    return tbl


def from_dataframe(session, table_name: str, df: Any) -> Table:
    """Ingest a pandas DataFrame as a device table."""
    cols: list[Column | VectorColumn] = []
    for name in df.columns:
        s = df[name]
        kind = s.dtype.kind
        if kind in "iu":
            cols.append(Column(str(name), T.LongT if s.dtype.itemsize > 4 else T.IntT,
                               s.to_numpy()))
        elif kind == "f":
            cols.append(Column(str(name),
                               T.DoubleT if s.dtype.itemsize > 4 else T.FloatT,
                               s.to_numpy()))
        elif kind == "b":
            cols.append(Column(str(name), T.BoolT, s.to_numpy()))
        else:
            d = StringDict()
            codes = d.encode([str(v) for v in s.tolist()])
            cols.append(Column(str(name), T.StrT, codes, dictionary=d))
    tbl = Table(table_name, cols)
    session.catalog.create(tbl, replace=True)
    return tbl


def to_dataframe(result) -> Any:
    return result.to_pandas()
