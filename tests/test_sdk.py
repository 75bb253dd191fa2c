"""SDK tests: C shared-library modules and python modules via LOAD MODULE
(reference tests/modules.a, draw.a)."""

import os
import subprocess

import numpy as np
import pytest

import aquery2_tpu as aq

SDK_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "aquery2_tpu", "sdk")


@pytest.fixture(scope="module")
def c_module(tmp_path_factory):
    out = tmp_path_factory.mktemp("mod") / "test_module.so"
    subprocess.run(
        ["g++", "-O2", "-fPIC", "-shared", "-I", SDK_DIR,
         "-o", str(out), os.path.join(SDK_DIR, "example_module.cpp")],
        check=True)
    return str(out)


def test_c_module_roundtrip(c_module, tmp_path):
    db = aq.connect(base_dir=str(tmp_path))
    db.execute(f'''LOAD MODULE FROM "{c_module}" FUNCTIONS (
        mydiv(a:int, b:int) -> double,
        mulvec(a:int, b:vecfloat) -> vecfloat
    );''')
    # reference tests/modules.a: select mydiv(2,3)
    r = db.execute("select mydiv(2,3);")
    assert r.scalar() == pytest.approx(2 / 3)
    db.execute("CREATE TABLE v(x real)")
    db.execute("INSERT INTO v VALUES (1.5), (2.5), (3.5)")
    r2 = db.execute("select mulvec(2, x) from v")
    vals = [row[0] for row in r2.rows()]
    np.testing.assert_allclose(vals, [3.0, 5.0, 7.0])
    db.close()


def test_python_module(tmp_path):
    mod = tmp_path / "pymod.py"
    mod.write_text(
        "import numpy as np\n"
        "def triple(x):\n"
        "    return np.asarray(x) * 3\n"
        "def scalar_add(a, b):\n"
        "    return float(a) + float(b)\n")
    db = aq.connect(base_dir=str(tmp_path))
    db.execute('LOAD MODULE FROM "pymod.py" FUNCTIONS '
               '(triple(x:vecint) -> vecint, scalar_add(a:double, b:double) -> double);')
    db.execute("CREATE TABLE t(x int)")
    db.execute("INSERT INTO t VALUES (1), (2), (3)")
    r = db.execute("SELECT triple(x) FROM t")
    assert [row[0] for row in r.rows()] == [3, 6, 9]
    assert db.execute("SELECT scalar_add(1.5, 2)").scalar() == 3.5
    db.close()
