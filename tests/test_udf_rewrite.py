"""Algebraic rewrite of accumulation-loop aggregation UDFs
(engine/udf_rewrite.py).

An accumulation-pattern UDF body rewrites into the equivalent aggregate
expression, so the fused single-chip and distributed SPMD tiers execute
it at built-in speed (VERDICT r3 missing #3 / #1: UDF queries must run
SPMD and within ~2x of built-ins). Reference analogue: the simd-
vectorized C++ lambda (engine/ast.py:1551-1812).
"""

import numpy as np
import pytest

import aquery2_tpu as aq
from aquery2_tpu.engine import udf_rewrite
from aquery2_tpu.parser import ast_nodes as A

UDFCOV = """AGGREGATION FUNCTION udfcov(x, y){
    sx := 0.; sy := 0.; sxy := 0.;
    l := _builtin_len;
    for (i := 0; i < l; i += 1) { sx += x[i]; sy += y[i]; sxy += x[i]*y[i]; }
    (sxy - sx * sy / l) / l
}"""


def _mkdb(mesh=None, n=4000, seed=7):
    rng = np.random.default_rng(seed)
    s = aq.connect(mesh=mesh) if mesh else aq.connect()
    s.execute(UDFCOV)
    s.execute("CREATE TABLE t(k INT, k2 INT, a INT, b INT)")
    rows = [(int(k), int(k2), int(x), int(y)) for k, k2, x, y in zip(
        rng.integers(1, 40, n), rng.integers(1, 5, n),
        rng.integers(0, 30, n), rng.integers(0, 30, n))]
    s.catalog.get("t").append_rows(rows)
    s.place_table(s.catalog.get("t"))
    return s


def test_rewrite_call_shape():
    """udfcov(a,b) rewrites to (sum(a*b) - sum(a)*sum(b)/count(*))/count(*)."""
    s = aq.connect()
    s.execute(UDFCOV)
    udf = s.udfs["udfcov"]
    call = A.Call("udfcov", (A.ColumnRef("a"), A.ColumnRef("b")))
    out = udf_rewrite.rewrite_call(udf, call, s.udfs)
    cnt = A.Call("count", (A.Star(),))
    a, b = A.ColumnRef("a"), A.ColumnRef("b")
    want = A.BinOp(
        "/",
        A.BinOp("-", A.Call("sum", (A.BinOp("*", a, b),)),
                A.BinOp("/", A.BinOp("*", A.Call("sum", (a,)),
                                     A.Call("sum", (b,))), cnt)),
        cnt)
    assert out == want


def test_rewrite_select_fires_and_matches_interpreter(monkeypatch):
    db = _mkdb()
    q = "SELECT k, udfcov(a, b) AS c FROM t GROUP BY k"
    rewritten = db.execute(q).rows()

    monkeypatch.setattr(udf_rewrite, "rewrite_select",
                        lambda session, sel: None)
    from aquery2_tpu.engine import udf_device
    monkeypatch.setattr(udf_device, "try_run_fused", lambda *a, **k: None)
    monkeypatch.setattr(udf_device, "try_run_aggregation_udf",
                        lambda *a, **k: None)   # host interpreter (oracle)
    oracle = db.execute(q).rows()

    assert len(rewritten) == len(oracle)
    got = dict(rewritten)
    for k, v in oracle:
        assert got[k] == pytest.approx(v, rel=1e-12, abs=1e-15), k


def test_rewritten_query_takes_fused_tier(monkeypatch):
    """The rewritten query must run the fused group-by program, not any
    UDF machinery."""
    from aquery2_tpu.engine import fused_groupby, udf_device

    db = _mkdb()
    fused_hits = []
    orig = fused_groupby.run

    def spy(session, sel, table):
        out = orig(session, sel, table)
        fused_hits.append(out is not None)
        return out

    monkeypatch.setattr(fused_groupby, "run", spy)
    monkeypatch.setattr(udf_device, "try_run_fused",
                        lambda *a, **k: pytest.fail("UDF tier reached"))
    db.execute("SELECT k, udfcov(a, b) AS c FROM t GROUP BY k")
    assert fused_hits and fused_hits[-1]


def test_rewritten_query_runs_spmd_on_mesh():
    """On a mesh session the rewritten UDF query is ONE distributed
    program (note_spmd), with results equal to single-chip."""
    s1 = _mkdb()
    s8 = _mkdb(mesh=8)
    q = "SELECT k, udfcov(a, b) AS c FROM t GROUP BY k ORDER BY k"
    spmd0 = s8.stats.dist_spmd
    r8 = s8.execute(q).rows()
    assert s8.stats.dist_spmd == spmd0 + 1, "UDF query fell back on mesh"
    r1 = s1.execute(q).rows()
    assert len(r1) == len(r8)
    for (k1, v1), (k8, v8) in zip(r1, r8):
        assert k1 == k8
        assert v8 == pytest.approx(v1, rel=1e-12, abs=1e-15)


def test_ungrouped_udf_rewrites():
    db = _mkdb()
    r = db.execute("SELECT udfcov(a, b) AS c FROM t").rows()
    tbl = db.catalog.get("t")
    n = tbl.nrows
    a = np.asarray(tbl.columns["a"].data[:n]).astype(np.float64)
    b = np.asarray(tbl.columns["b"].data[:n]).astype(np.float64)
    want = float((a * b).mean() - a.mean() * b.mean())
    assert r[0][0] == pytest.approx(want, rel=1e-12)


def test_reducer_prologue_rewrites():
    """Bodies made of reducer calls (no loop) rewrite too."""
    db = _mkdb()
    db.execute("AGGREGATION FUNCTION spread(x){ max(x) - min(x) }")
    r = dict(db.execute(
        "SELECT k2, spread(a) AS s FROM t GROUP BY k2 ORDER BY k2").rows())
    tbl = db.catalog.get("t")
    n = tbl.nrows
    k2 = np.asarray(tbl.columns["k2"].data[:n])
    a = np.asarray(tbl.columns["a"].data[:n])
    for kk in np.unique(k2):
        m = k2 == kk
        assert r[int(kk)] == int(a[m].max() - a[m].min())


def test_minus_accumulation_and_literal_param():
    db = _mkdb()
    db.execute("""AGGREGATION FUNCTION negsum(x, c){
        s := 0.;
        for (i := 0; i < _builtin_len; i += 1) { s -= x[i] * c; }
        s
    }""")
    r = dict(db.execute(
        "SELECT k2, negsum(a, 2) AS s FROM t GROUP BY k2").rows())
    tbl = db.catalog.get("t")
    n = tbl.nrows
    k2 = np.asarray(tbl.columns["k2"].data[:n])
    a = np.asarray(tbl.columns["a"].data[:n]).astype(np.int64)
    for kk in np.unique(k2):
        assert r[int(kk)] == pytest.approx(-2.0 * a[k2 == kk].sum())


def test_vector_returning_udf_does_not_rewrite():
    db = _mkdb()
    db.execute("""AGGREGATION FUNCTION runsum(x){
        s := 0.;
        l := _builtin_len;
        for (i := 0; i < l; i += 1) { s += x[i]; _builtin_ret[i] := s; }
        Null
    }""")
    udf = db.udfs["runsum"]
    call = A.Call("runsum", (A.ColumnRef("a"),))
    assert udf_rewrite.rewrite_call(udf, call, db.udfs) is None
    # ...and the query still works through the device/host paths
    r = db.execute("SELECT runsum(a), k2 FROM t GROUP BY k2")
    assert r.nrows == 4


def test_partial_range_loop_does_not_rewrite():
    """A loop not covering the whole group keeps loop semantics."""
    s = aq.connect()
    s.execute("""AGGREGATION FUNCTION firsthalf(x){
        s := 0.;
        h := _builtin_len / 2;
        for (i := 0; i < h; i += 1) { s += x[i]; }
        s
    }""")
    udf = s.udfs["firsthalf"]
    call = A.Call("firsthalf", (A.ColumnRef("a"),))
    assert udf_rewrite.rewrite_call(udf, call, s.udfs) is None


def test_nullable_args_do_not_rewrite():
    """SQL aggregates skip NULLs; the UDF loop visits every row — a
    nullable argument column must stay on the loop paths."""
    db = _mkdb()
    db.execute("CREATE TABLE tn(k INT, a INT, b INT)")
    db.execute("INSERT INTO tn VALUES (1, 1, 2), (1, NULL, 3), (2, 4, 5)")
    sel = None
    from aquery2_tpu.parser import parse
    sel = parse("SELECT k, udfcov(a, b) FROM tn GROUP BY k")[0]
    assert udf_rewrite.rewrite_select(db, sel) is None
