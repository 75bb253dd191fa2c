"""Runtime services: stored procedures (record/replay/persist), interval
and conditional triggers (reference server.cpp:368-502, threading.cpp:
158-270, tests/triggers.aquery, demo/)."""

import os
import time

import pytest

import aquery2_tpu as aq
from aquery2_tpu.repl.prompt import Repl


@pytest.fixture
def db(tmp_path):
    s = aq.connect(base_dir=str(tmp_path))
    yield s
    s.close()


def test_procedure_record_replay(db):
    ps = db.procedures
    db.execute("CREATE TABLE t(a INT)")
    ps.start_recording("addrow")
    db.execute("INSERT INTO t VALUES (1)")
    ps.stop_recording()
    assert db.execute("SELECT count(*) FROM t").scalar() == 1
    db.run_procedure("addrow")
    db.run_procedure("addrow")
    assert db.execute("SELECT count(*) FROM t").scalar() == 3


def test_procedure_persistence(db, tmp_path):
    ps = db.procedures
    db.execute("CREATE TABLE p(a INT)")
    ps.start_recording("fill")
    db.execute("INSERT INTO p VALUES (7)")
    ps.stop_recording()
    # fresh session, same base dir → loads .aqp from disk
    s2 = aq.connect(base_dir=str(tmp_path))
    s2.execute("CREATE TABLE p(a INT)")
    s2.run_procedure("fill")
    assert s2.execute("SELECT count(*) FROM p").scalar() == 1
    assert "INSERT" in s2.procedures.display("fill")
    s2.close()


def test_conditional_trigger(db):
    """reference: create trigger c on t action act when cond — fires the
    action after inserts into t when cond's result is truthy."""
    db.execute("CREATE TABLE t(a INT)")
    db.execute("CREATE TABLE audit(cnt INT)")
    ps = db.procedures
    ps.start_recording("cond")
    db.execute("SELECT count(*) > 1 FROM t")
    ps.stop_recording()
    ps.start_recording("act")
    db.execute("INSERT INTO audit VALUES (1)")
    ps.stop_recording()
    # audit gained a row during recording; clear it
    db.execute("DELETE FROM audit")
    db.execute("create trigger c on t action act when cond")
    db.execute("INSERT INTO t VALUES (1)")       # cond false (count=1)
    assert db.triggers.drain()                   # actions run async now
    assert db.execute("SELECT count(*) FROM audit").scalar() == 0
    db.execute("INSERT INTO t VALUES (2)")       # cond true (count=2)
    assert db.triggers.drain()
    assert db.execute("SELECT count(*) FROM audit").scalar() == 1
    db.execute("drop trigger c")
    db.execute("INSERT INTO t VALUES (3)")
    assert db.triggers.drain()
    assert db.execute("SELECT count(*) FROM audit").scalar() == 1


def test_conditional_trigger_does_not_block_insert(db):
    """A slow action must not stall the inserting thread (reference
    dispatches through its thread pool, threading.cpp:223-270)."""
    import time as _time

    db.execute("CREATE TABLE t2(a INT)")
    calls = []

    class SlowProc:
        def run(self, name):
            calls.append(name)
            _time.sleep(0.5)
            return None

    db.execute("CREATE TABLE dummy(a INT)")
    ps = db.procedures
    ps.start_recording("slowact")
    db.execute("INSERT INTO dummy VALUES (1)")
    ps.stop_recording()
    db.execute("DELETE FROM dummy")
    # make the recorded action slow by monkey-wrapping run_procedure
    orig = db.run_procedure

    def slow_run(name):
        if name == "slowact":
            _time.sleep(0.5)
        return orig(name)

    db.run_procedure = slow_run
    db.execute("create trigger s on t2 action slowact")
    t0 = _time.perf_counter()
    db.execute("INSERT INTO t2 VALUES (1)")
    insert_dt = _time.perf_counter() - t0
    assert insert_dt < 0.3, f"INSERT blocked {insert_dt:.2f}s on the action"
    assert db.triggers.drain()
    assert db.execute("SELECT count(*) FROM dummy").scalar() == 1
    db.execute("drop trigger s")
    db.run_procedure = orig


def test_interval_trigger(db):
    db.execute("CREATE TABLE tick(a INT)")
    ps = db.procedures
    ps.start_recording("pulse")
    db.execute("INSERT INTO tick VALUES (1)")
    ps.stop_recording()
    db.execute("DELETE FROM tick")
    db.execute("create trigger heartbeat action pulse interval 100")
    time.sleep(0.6)
    db.execute("drop trigger heartbeat")
    n = db.execute("SELECT count(*) FROM tick").scalar()
    assert n >= 2  # ~5 expected in 600ms at 100ms interval


def test_repl_commands(db, tmp_path, capsys):
    r = Repl(db)
    r.handle_line("CREATE TABLE x(a INT)")
    r.handle_line("INSERT INTO x VALUES (5), (6)")
    r.handle_line("exec")
    r.handle_line("SELECT sum(a) FROM x")
    r.handle_line("xexec")
    out = capsys.readouterr().out
    assert "11" in out
    r.handle_line("echo hello-from-repl")
    assert "hello-from-repl" in capsys.readouterr().out
    r.handle_line("stats")
    assert "Queries executed" in capsys.readouterr().out
    # script file
    script = tmp_path / "s.a"
    script.write_text("#!aquery\nSELECT count(*) FROM x\nexec\n")
    r.handle_line(f"script {script}")
    assert "2" in capsys.readouterr().out


def test_server_mode(tmp_path):
    """Client/server mode (reference IPC mode parity)."""
    from aquery2_tpu.repl.server import AqClient, AqServer

    srv = AqServer(port=0, session=aq.connect(base_dir=str(tmp_path)))
    srv.start_background()
    try:
        c = AqClient(port=srv.port)
        assert c.execute("CREATE TABLE t(a INT)") is None
        c.execute("INSERT INTO t VALUES (1), (2), (3)")
        out = c.execute("SELECT sum(a) FROM t")
        assert out["rows"] == [("6",)]
        with pytest.raises(RuntimeError):
            c.execute("SELECT * FROM missing_table")
        # second client shares the catalog
        c2 = AqClient(port=srv.port)
        assert c2.execute("SELECT count(*) FROM t")["rows"] == [("3",)]
        c.close()
        c2.close()
    finally:
        srv.shutdown()
        srv.session.close()


def test_engine_backend_switch_subprocess():
    """`engine <backend>` retargets jax and re-uploads catalog tables
    (reference prompt.py:560-583 backend switching). Runs in a
    subprocess: clear_backends() would poison this process's cached
    devices/meshes."""
    import subprocess
    import sys

    code = (
        "import os; os.environ['JAX_PLATFORMS']='cpu'\n"
        "from aquery2_tpu.repl.prompt import Repl\n"
        "r = Repl(echo_results=True)\n"
        "r.handle_line('CREATE TABLE t(a INT, b INT)'); r.handle_line('r')\n"
        "r.handle_line('INSERT INTO t VALUES (1,2),(1,3),(2,5)')\n"
        "r.handle_line('r')\n"
        "r._switch_backend('cpu')\n"          # full snapshot/re-upload path
        "r.handle_line('SELECT a, sum(b) FROM t GROUP BY a')\n"
        "r.handle_line('r')\n"
    )
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=240,
                         env={**os.environ, "JAX_PLATFORMS": "cpu"})
    assert out.returncode == 0, out.stderr[-2000:]
    assert "2 | 5" in out.stdout


# --------------------------------------------------------------------- #
# Pallas compile-failure recovery classification (engine/recover.py)
# --------------------------------------------------------------------- #

def test_recover_plain_errors_do_not_flip_pallas():
    """ADVICE r4: broad markers ("failed_precondition", "invalid type")
    misclassified genuine engine bugs as Mosaic failures and silently
    disabled Pallas. Only Mosaic/Pallas-specific text qualifies."""
    from aquery2_tpu import config
    from aquery2_tpu.engine import recover

    old = config.use_pallas
    config.use_pallas = True
    try:
        for e in (TypeError("invalid type promotion int32 vs float64"),
                  RuntimeError("FAILED_PRECONDITION: buffer mismatch"),
                  ValueError("MLIRError: something unrelated"),
                  KeyError("v1")):
            assert not recover.is_pallas_failure(e), e
        for e in (RuntimeError("Mosaic failed to compile module"),
                  RuntimeError("INTERNAL: remote_compile HTTP 500"),
                  Exception("error lowering pallas_call kernel")):
            assert recover.is_pallas_failure(e), e
    finally:
        config.use_pallas = old


def test_bound_bucket_monotone_pow2():
    """Cache-fingerprint soundness helper (ADVICE r4): pow2 round-up."""
    from aquery2_tpu.ops.reduce import bound_bucket

    assert bound_bucket(0) == 1
    assert bound_bucket(1) == 1
    assert bound_bucket(5) == 8
    assert bound_bucket(8) == 8
    assert bound_bucket(33) == 64
    assert bound_bucket(63) == 64
    for b in range(1, 300):
        assert bound_bucket(b) >= b
