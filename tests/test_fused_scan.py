"""Fused ungrouped scan path: one program, ONE host sync.

VERDICT round-1 item 9: the general path paid a host sync per stage
(filter count, per-column materialization, host ORDER BY). The fused
scan traces WHERE + projections + ORDER BY into one jitted program;
the only device→host pull is the row-count scalar.
"""

import numpy as np
import pytest

import aquery2_tpu as aq
from aquery2_tpu.engine import fused_scan


@pytest.fixture()
def db(rng):
    s = aq.connect()
    s.execute("CREATE TABLE t(a INT, b INT, s VARCHAR(8), f DOUBLE)")
    n = 5000
    rows = list(zip(
        rng.integers(0, 1000, n).astype(int).tolist(),
        rng.integers(-50, 50, n).astype(int).tolist(),
        rng.choice(["xx", "yy", "zz"], n).tolist(),
        rng.random(n).tolist(),
    ))
    s.catalog.get("t").append_rows(rows)
    return s


def _oracle(db):
    t = db.catalog.get("t")
    a = np.asarray(t.columns["a"].data[: t.nrows])
    b = np.asarray(t.columns["b"].data[: t.nrows])
    f = np.asarray(t.columns["f"].data[: t.nrows])
    sc = np.asarray(t.columns["s"].data[: t.nrows])
    strs = np.asarray(t.columns["s"].dictionary.decode(sc))
    return a, b, strs, f


def test_scan_used_and_correct(db, monkeypatch):
    calls = []
    orig = fused_scan.try_run

    def spy(session, sel):
        out = orig(session, sel)
        calls.append(out is not None)
        return out

    monkeypatch.setattr(fused_scan, "try_run", spy)
    r = db.execute("SELECT a, b + 1 FROM t WHERE a > 500 AND b < 0 "
                   "ORDER BY a, b LIMIT 50")
    assert calls == [True]
    a, b, _, _ = _oracle(db)
    keep = (a > 500) & (b < 0)
    pairs = sorted(zip(a[keep].tolist(), (b[keep] + 1).tolist()))[:50]
    assert r.rows() == pairs


def test_scan_single_sync(db, monkeypatch):
    """Count device→host pulls during the query: exactly one."""
    from jax._src import array as jarray

    db.execute("SELECT a FROM t WHERE b > 0")   # warm the jit cache
    pulls = []
    for meth in ("__array__", "__int__", "__index__", "item"):
        orig = getattr(jarray.ArrayImpl, meth)

        def counting(self, *a, _orig=orig, **k):
            pulls.append(self.shape)
            return _orig(self, *a, **k)

        monkeypatch.setattr(jarray.ArrayImpl, meth, counting)
    db.execute("SELECT a, b FROM t WHERE b > 0 ORDER BY a LIMIT 10")
    # one scalar pull (the row count); nothing row-sized crosses
    assert len(pulls) == 1 and pulls[0] == (), pulls


def test_scan_string_projection_and_filter(db):
    r = db.execute('SELECT s, a FROM t WHERE s = "yy" AND a < 100')
    a, _, strs, _ = _oracle(db)
    keep = (strs == "yy") & (a < 100)
    assert sorted(r.rows()) == sorted(zip(strs[keep].tolist(),
                                          a[keep].tolist()))


def test_scan_order_by_string(db):
    r = db.execute("SELECT s FROM t WHERE a < 30 ORDER BY s DESC")
    _, _, strs, _ = _oracle(db)
    a, _, _, _ = _oracle(db)
    want = sorted(strs[a < 30].tolist(), reverse=True)
    assert [x for (x,) in r.rows()] == want


def test_scan_select_star(db):
    r = db.execute("SELECT * FROM t WHERE a = 1 OR a = 2")
    a, b, strs, f = _oracle(db)
    keep = (a == 1) | (a == 2)
    assert r.nrows == int(keep.sum())
    assert r.column_names() == ["a", "b", "s", "f"]


def test_scan_float_expression(db):
    r = db.execute("SELECT f * 2 + a FROM t WHERE f > 0.9 ORDER BY f")
    a, _, _, f = _oracle(db)
    keep = f > 0.9
    order = np.argsort(f[keep], kind="stable")
    want = (f[keep] * 2 + a[keep])[order]
    np.testing.assert_allclose(
        np.asarray([x for (x,) in r.rows()]), want, rtol=1e-12)


def test_scan_desc_ints(db):
    r = db.execute("SELECT b FROM t WHERE a < 50 ORDER BY b DESC")
    a, b, _, _ = _oracle(db)
    want = sorted(b[a < 50].tolist(), reverse=True)
    assert [x for (x,) in r.rows()] == want
