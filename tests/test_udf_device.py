"""Device-lowered AGGREGATION FUNCTION bodies (engine/udf_device.py).

Reference compiles UDF bodies to per-group C++ lambdas
(engine/ast.py:1551-1812); round 1 interpreted them on host. These tests
check the traced/vmapped device path produces the host interpreter's
exact results on the udf3.a covariances2 workload (:=, if, for, x[i],
dynamic slices x(a,b), _builtin_ret/_builtin_len).
"""

import numpy as np
import pytest

import aquery2_tpu as aq
from aquery2_tpu.engine import udf_device

COVARIANCES2 = """
AGGREGATION FUNCTION covariances2(x, y, win){
    xmeans := 0.;
    ymeans := 0.;
    l := _builtin_len;
    if (l > 0)
    {
        xmeans := x[0];
        ymeans := y[0];
        _builtin_ret[0] := 0.;
    }
    w := win;
    if (w > l)
        w := l;
    for (i := 1, j:= 0; i < w; i := i+1) {
        xmeans += x[i];
        ymeans += y[i];
        _builtin_ret[i] := avg (( x(0, i) - xmeans/i ) * (y(0, i) - ymeans/i ));
    }
    xmeans /= w;
    ymeans /= w;
    for (i := w; i < l; i += 1)
    {
        xmeans += (x[i] - x[i - w]) / w;
        ymeans += (y[i] - y[i - w]) / w;
        _builtin_ret[i] := avg (( x(i-w, i) - xmeans ) * (y(i - w, i) - ymeans ));
    }
    Null
}
"""


@pytest.fixture()
def db(rng):
    s = aq.connect()
    s.execute(COVARIANCES2)
    s.execute("CREATE TABLE t(a INT, b INT, c INT)")
    n = 400
    rows = list(zip(rng.integers(0, 50, n).astype(int).tolist(),
                    rng.integers(0, 50, n).astype(int).tolist(),
                    rng.integers(0, 7, n).astype(int).tolist()))
    s.catalog.get("t").append_rows(rows)
    return s


def _host_only(monkeypatch):
    monkeypatch.setattr(udf_device, "try_run_aggregation_udf",
                        lambda *a, **k: None)


def test_covariances2_device_matches_host(db, monkeypatch):
    q = "SELECT covariances2(a, b, 4), c FROM t GROUP BY c"
    dev = db.execute(q).rows()

    _host_only(monkeypatch)
    host = db.execute(q).rows()
    assert len(dev) == len(host)
    for (dv, dc), (hv, hc) in zip(dev, host):
        assert dc == hc
        np.testing.assert_allclose(np.asarray(dv), np.asarray(hv),
                                   rtol=1e-9, atol=1e-12)


def test_device_path_is_used(db):
    from aquery2_tpu.parser import parse
    calls = []
    orig = udf_device.try_run_aggregation_udf

    def spy(ctx, udf, args):
        out = orig(ctx, udf, args)
        calls.append(out is not None)
        return out

    import aquery2_tpu.engine.udf_device as ud
    saved = ud.try_run_aggregation_udf
    ud.try_run_aggregation_udf = spy
    try:
        db.execute("SELECT covariances2(a, b, 4), c FROM t GROUP BY c")
    finally:
        ud.try_run_aggregation_udf = saved
    assert calls and all(calls)


def test_scalar_returning_aggregation_udf(db, monkeypatch):
    db.execute("""AGGREGATION FUNCTION mysumsq(x){
        s := 0.;
        l := _builtin_len;
        for (i := 0; i < l; i += 1) { s += x[i] * x[i]; }
        s
    }""")
    q = "SELECT c, mysumsq(a) FROM t GROUP BY c ORDER BY c"
    dev = db.execute(q).rows()
    _host_only(monkeypatch)
    host = db.execute(q).rows()
    for (dc, dv), (hc, hv) in zip(dev, host):
        assert dc == hc
        assert dv == pytest.approx(hv, rel=1e-12)
    # numpy oracle
    a = np.array([r[0] for r in db.catalog.get("t")
                  .columns["a"].to_python()[:0]] or [])  # noqa: unused
    tbl = db.catalog.get("t")
    av = np.asarray(tbl.columns["a"].data[: tbl.nrows], dtype=np.float64)
    cv = np.asarray(tbl.columns["c"].data[: tbl.nrows])
    want = {k: float((av[cv == k] ** 2).sum()) for k in np.unique(cv)}
    for dc, dv in dev:
        assert dv == pytest.approx(want[dc], rel=1e-12)


def test_whole_table_aggregation_udf(db, monkeypatch):
    q = "SELECT covariances2(a, b, 3) FROM t"
    dev = db.execute(q).rows()
    _host_only(monkeypatch)
    host = db.execute(q).rows()
    np.testing.assert_allclose(
        np.asarray([r[0] for r in dev], dtype=np.float64),
        np.asarray([r[0] for r in host], dtype=np.float64),
        rtol=1e-9, atol=1e-12)
