"""Model library + LOAD MODULE end-to-end (reference tests/dt2.a, rf.a,
demo/ workflows with libirf)."""

import os

import numpy as np
import pytest

import aquery2_tpu as aq
from aquery2_tpu.models import DecisionTree, IncrementalRandomForest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _blob_data(rng, n=400):
    """Two separable gaussian blobs."""
    X0 = rng.normal(0.0, 1.0, (n // 2, 4))
    X1 = rng.normal(3.0, 1.0, (n // 2, 4))
    X = np.concatenate([X0, X1])
    y = np.concatenate([np.zeros(n // 2, np.int64), np.ones(n // 2, np.int64)])
    idx = rng.permutation(n)
    return X[idx], y[idx]


def test_decision_tree(rng):
    X, y = _blob_data(rng)
    t = DecisionTree(max_depth=6).fit(X, y)
    acc = (t.predict(X) == y).mean()
    assert acc > 0.95


def test_incremental_forest(rng):
    X, y = _blob_data(rng)
    f = IncrementalRandomForest(height=6, n_trees=5, n_classes=2, seed=1)
    f.fit(X[:200], y[:200])
    acc1 = f.test(X[200:], y[200:])
    assert acc1 > 0.9
    f.fit_inc(X[200:], y[200:])
    acc2 = f.test(X, y)
    assert acc2 > 0.9


def test_load_module_sql_roundtrip(rng, tmp_path):
    """dt2.a-style flow: LOAD MODULE, newtree, fit(pack(...)), predict."""
    db = aq.connect(base_dir=REPO)
    db.execute(f"""LOAD MODULE FROM "aquery2_tpu/models/irf.py" FUNCTIONS (
        newtree(height:int, f:int64, sparse:vecint, forget:double,
                maxf:int64, noclasses:int64, e:int) -> bool,
        fit(X:vecvecdouble, y:vecint64) -> bool,
        predict(X:vecvecdouble) -> vecint,
        test(X:vecvecdouble, y:vecint64) -> double
    );""")
    db.execute("create table source(x1 double, x2 double, x3 double, x4 double, x5 int64)")
    X, y = _blob_data(rng, n=200)
    rows = ", ".join(
        f"({r[0]:.4f}, {r[1]:.4f}, {r[2]:.4f}, {r[3]:.4f}, {int(c)})"
        for r, c in zip(X, y))
    db.execute(f"insert into source values {rows}")
    db.execute("create table sparse(x int)")
    db.execute("insert into sparse values (1), (1), (1), (1)")
    r = db.execute("select newtree(6, 4, sparse.x, 0, 4, 2, 0) from sparse")
    assert r.scalar() in (True, 1)
    r = db.execute("select fit(pack(x1, x2, x3, x4), x5) from source")
    assert r.scalar() in (True, 1)
    r = db.execute("select predict(pack(x1, x2, x3, x4)) from source")
    preds = np.asarray([row[0] for row in r.rows()])
    acc = (preds == y).mean()
    assert acc > 0.9
    r = db.execute("select test(pack(x1, x2, x3, x4), x5) from source")
    assert r.scalar() > 0.9
    db.close()


def test_demo_workflow():
    """Streaming ingest + conditional-trigger retraining (demo/run_demo.py,
    reference demo/ parity)."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "aq_demo", os.path.join(REPO, "demo", "run_demo.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert mod.main() == 0
