"""Query-executing external backends (reference DataSource vtable,
server/DataSource_conn.h:27-54) + append-back (table_ext_monetdb.hpp:34-86)."""

import sqlite3

import numpy as np
import pytest

import aquery2_tpu as aq


@pytest.fixture
def db(tmp_path):
    s = aq.connect(base_dir=str(tmp_path))
    yield s
    s.close()


def _seed_sqlite(path):
    conn = sqlite3.connect(path)
    conn.execute("CREATE TABLE trades(sym TEXT, price REAL, qty INTEGER)")
    conn.executemany("INSERT INTO trades VALUES (?,?,?)", [
        ("a", 10.0, 100), ("b", 20.0, 50), ("a", 12.0, 75),
        ("c", 5.0, None),
    ])
    conn.commit()
    conn.close()


def test_backend_exec_select(db, tmp_path):
    p = str(tmp_path / "x.db")
    _seed_sqlite(p)
    db.attach("ext", p)
    t = db.backend_exec(
        "ext", "SELECT sym, sum(qty) AS q FROM trades "
               "WHERE qty IS NOT NULL GROUP BY sym ORDER BY sym",
        into="agg")
    assert t.nrows == 2          # sym 'c' has only a NULL-qty row
    # materialized as a device table usable in engine SQL
    r = db.execute("SELECT sym FROM agg WHERE q > 60 ORDER BY sym")
    assert [row[0] for row in r.rows()] == ["a"]


def test_backend_exec_ddl_and_error(db, tmp_path):
    from aquery2_tpu.storage.datasource import DataSourceError

    db.attach("m", ":memory:")
    src = db.sources["m"]
    assert db.backend_exec("m", "CREATE TABLE z(a INTEGER)") is None
    assert not src.haserror()
    with pytest.raises(DataSourceError):
        db.backend_exec("m", "SELECT * FROM missing_table")
    assert src.haserror()
    # error state resets on the next successful exec
    db.backend_exec("m", "INSERT INTO z VALUES (1)")
    assert not src.haserror()


def test_get_table_maps_nulls(db, tmp_path):
    p = str(tmp_path / "y.db")
    _seed_sqlite(p)
    db.attach("ext", p)
    db.sources["ext"].get_table("trades", session=db)
    r = db.execute("SELECT sym FROM trades WHERE qty IS NULL")
    assert [row[0] for row in r.rows()] == ["c"]


def test_append_back_roundtrip(db, tmp_path):
    p = str(tmp_path / "z.db")
    db.attach("out", p)
    db.execute("CREATE TABLE res(k INT, v DOUBLE)")
    db.execute("INSERT INTO res VALUES (1, 1.5), (2, 2.5)")
    db.backend_append("out", "res")
    # read back through a raw connection: schema + rows landed
    conn = sqlite3.connect(p)
    rows = conn.execute("SELECT k, v FROM res ORDER BY k").fetchall()
    conn.close()
    assert rows == [(1, 1.5), (2, 2.5)]
    # append without create: doubles the rows
    db.backend_append("out", "res")
    conn = sqlite3.connect(p)
    n = conn.execute("SELECT count(*) FROM res").fetchone()[0]
    conn.close()
    assert n == 4


def test_engine_result_appends_back(db, tmp_path):
    """Device query result → backend (the reference's C++-result-into-
    MonetDB flow)."""
    p = str(tmp_path / "w.db")
    db.attach("out", p)
    db.execute("CREATE TABLE t(a INT, b INT)")
    db.execute("INSERT INTO t VALUES (1,2),(1,3),(2,5)")
    db.execute("SELECT a, sum(b) AS s FROM t GROUP BY a INTO gsum")
    db.backend_append("out", "gsum")
    conn = sqlite3.connect(p)
    rows = sorted(conn.execute("SELECT a, s FROM gsum").fetchall())
    conn.close()
    assert rows == [(1, 5), (2, 5)]


def test_dbapi_source_wraps_any_connection(db):
    conn = sqlite3.connect(":memory:")
    db.attach("raw", conn)       # bare DB-API connection
    db.backend_exec("raw", "CREATE TABLE q(a INTEGER)")
    db.backend_exec("raw", "INSERT INTO q VALUES (7)")
    t = db.backend_exec("raw", "SELECT a FROM q", into="qq")
    assert t.nrows == 1
    assert db.execute("SELECT a+1 FROM qq").scalar() == 8
