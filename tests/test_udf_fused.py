"""Fused aggregation-UDF tier (engine/udf_device.try_run_fused).

`SELECT keys, udf(cols) ... GROUP BY keys` with a scalar-returning UDF
runs with a ONE-program grouping preamble instead of the general
executor's multi-sync pipeline; results must equal the general path
exactly (both trace the same f64 body).
"""

import numpy as np
import pytest

import aquery2_tpu as aq
from aquery2_tpu.engine import udf_device, udf_rewrite


@pytest.fixture(autouse=True)
def _no_rewrite(monkeypatch):
    """udfcov rewrites into plain aggregates (engine/udf_rewrite.py) and
    would never reach the fused-UDF tier under test — disable it here."""
    monkeypatch.setattr(udf_rewrite, "rewrite_select",
                        lambda session, sel: None)

UDFCOV = """AGGREGATION FUNCTION udfcov(x, y){
    sx := 0.; sy := 0.; sxy := 0.;
    l := _builtin_len;
    for (i := 0; i < l; i += 1) { sx += x[i]; sy += y[i]; sxy += x[i]*y[i]; }
    (sxy - sx * sy / l) / l
}"""


@pytest.fixture()
def db(rng):
    s = aq.connect()
    s.execute(UDFCOV)
    s.execute("CREATE TABLE t(k INT, k2 INT, a INT, b INT)")
    n = 4000
    rows = [(int(k), int(k2), int(x), int(y)) for k, k2, x, y in zip(
        rng.integers(1, 40, n), rng.integers(1, 5, n),
        rng.integers(0, 30, n), rng.integers(0, 30, n))]
    s.catalog.get("t").append_rows(rows)
    return s


QUERIES = [
    "SELECT k, udfcov(a, b) AS c FROM t GROUP BY k",
    "SELECT k, k2, udfcov(a, b) AS c FROM t GROUP BY k, k2",
    "SELECT k, udfcov(a, b) AS c FROM t WHERE a > 3 GROUP BY k",
]


@pytest.mark.parametrize("q", QUERIES)
def test_fused_udf_matches_general(db, q, monkeypatch):
    calls = []
    orig = udf_device.try_run_fused

    def spy(*a, **kw):
        out = orig(*a, **kw)
        calls.append(out is not None)
        return out

    monkeypatch.setattr(udf_device, "try_run_fused", spy)
    fused = sorted(db.execute(q).rows())
    assert calls and calls[-1], f"{q} did not take the fused UDF tier"

    monkeypatch.setattr(udf_device, "try_run_fused",
                        lambda *a, **kw: None)
    general = sorted(db.execute(q).rows())
    assert len(fused) == len(general)
    for fr, gr in zip(fused, general):
        assert fr[:-1] == gr[:-1]
        assert fr[-1] == pytest.approx(gr[-1], rel=1e-12, abs=1e-15)


def test_fused_udf_oracle(db):
    r = db.execute("SELECT k, udfcov(a, b) AS c FROM t GROUP BY k")
    tbl = db.catalog.get("t")
    n = tbl.nrows
    k = np.asarray(tbl.columns["k"].data[:n])
    a = np.asarray(tbl.columns["a"].data[:n]).astype(np.float64)
    b = np.asarray(tbl.columns["b"].data[:n]).astype(np.float64)
    got = dict(r.rows())
    for kk in np.unique(k):
        m = k == kk
        want = float((a[m] * b[m]).mean() - a[m].mean() * b[m].mean())
        assert got[int(kk)] == pytest.approx(want, rel=1e-9)


def test_vector_returning_udf_stays_general(db, monkeypatch):
    """Ragged-output UDFs (covariances2-style) keep the general path."""
    db.execute("""AGGREGATION FUNCTION runsum(x){
        s := 0.;
        l := _builtin_len;
        for (i := 0; i < l; i += 1) { s += x[i]; _builtin_ret[i] := s; }
        Null
    }""")
    r = db.execute("SELECT runsum(a), k2 FROM t GROUP BY k2")
    assert r.nrows == 4
    vals = r.rows()[0][0]
    assert len(vals) > 1 and vals[1] >= vals[0]
