"""Multi-host execution: 2 processes × 4 CPU devices, one 8-device mesh.

The BASELINE.md north star is scaling "1 chip → 1 host → N hosts"; the
reference has no multi-node story at all (SURVEY.md §5). This test
launches two REAL processes against a localhost coordinator
(jax.distributed.initialize via aq.connect), row-shards a table over the
GLOBAL 8-device mesh, runs distributed group-by / ungrouped / count-join
SQL in both processes (the SPMD multi-controller contract), and checks
the results against a NumPy oracle in each process.
"""

import os
import socket
import subprocess
import sys

import pytest

_CHILD = r"""
import os, sys
pid, port = int(sys.argv[1]), sys.argv[2]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
# env-driven multi-host launch path: the package joins the process group
# at import, before anything can initialize the local-only backend
os.environ["AQ_COORDINATOR"] = f"localhost:{port}"
os.environ["AQ_NUM_PROCESSES"] = "2"
os.environ["AQ_PROCESS_ID"] = str(pid)
import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np
import aquery2_tpu as aq

db = aq.connect(mesh=8)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8, len(jax.devices())
assert db.mesh is not None

rng = np.random.default_rng(99)          # same seed in both processes
n = 8 * 400
k = rng.integers(1, 9, n)
v = rng.integers(1, 100, n)
rows = [(int(a), int(b)) for a, b in zip(k, v)]
db.execute("CREATE TABLE t(k INT, v INT)")
db.catalog.get("t").append_rows(rows)
db.place_table(db.catalog.get("t"))

# dense tier group-by over the 2-process mesh
r = db.execute("SELECT k, sum(v), count(*) FROM t GROUP BY k ORDER BY k")
want = [(int(kk), int(v[k == kk].sum()), int((k == kk).sum()))
        for kk in sorted(np.unique(k))]
assert r.rows() == want, (r.rows()[:3], want[:3])

# packed tier: two keys
db.execute("CREATE TABLE t2(a INT, b INT, v INT)")
a2 = rng.integers(1, 6, n); b2 = rng.integers(1, 6, n); v2 = rng.integers(1, 50, n)
db.catalog.get("t2").append_rows(
    [(int(x), int(y), int(z)) for x, y, z in zip(a2, b2, v2)])
db.place_table(db.catalog.get("t2"))
r2 = db.execute("SELECT a, b, sum(v) FROM t2 GROUP BY a, b ORDER BY a, b")
want2 = [(int(aa), int(bb), int(v2[(a2 == aa) & (b2 == bb)].sum()))
         for aa in sorted(np.unique(a2)) for bb in sorted(np.unique(b2))
         if ((a2 == aa) & (b2 == bb)).any()]
assert r2.rows() == want2

# ungrouped psum
r3 = db.execute("SELECT count(*), sum(v), max(v) FROM t")
assert r3.rows() == [(n, int(v.sum()), int(v.max()))]

# distributed count-join (histogram psum tier)
db.execute("CREATE TABLE d(k INT, w INT)")
db.catalog.get("d").append_rows([(i, i % 3) for i in range(1, 6)])
db.place_table(db.catalog.get("d"))
r4 = db.execute("SELECT count(*) FROM t, d WHERE t.k = d.k")
assert r4.rows() == [(int(np.isin(k, [1, 2, 3, 4, 5]).sum()),)]

# distributed MEDIAN (shuffle-colocation tier, in-program merge — the
# h2o q6 class; VERDICT r3 missing #2: must run multi-process)
r5 = db.execute("SELECT k, median(v) FROM t GROUP BY k ORDER BY k")
want5 = [(int(kk), float(np.median(v[k == kk])))
         for kk in sorted(np.unique(k))]
got5 = r5.rows()
assert len(got5) == len(want5)
for (gk, gm), (wk, wm) in zip(got5, want5):
    assert gk == wk and abs(gm - wm) < 1e-9, (gk, gm, wk, wm)

# distributed ordered subvec (h2o q8 class: top-2 per group under
# ASSUMING DESC) — dense in-program merge, multi-process safe
# (no outer ORDER BY: the ordered tier's merge is already key-sorted)
r6 = db.execute("SELECT k, subvec(v, 0, 2) AS top2 FROM t "
                "ASSUMING DESC v GROUP BY k")
got6 = r6.rows()
assert len(got6) == len(np.unique(k))
for kk, top2 in got6:
    vv = np.sort(v[k == kk])[::-1][:2]
    assert list(top2) == [int(x) for x in vv], (kk, top2, vv)

# materialized distributed equi-join + SPMD aggregation
r7 = db.execute("SELECT t.k, count(*), sum(d.w) FROM t JOIN d "
                "ON t.k = d.k GROUP BY t.k ORDER BY t.k")
want7 = [(int(kk), int((k == kk).sum()), int((k == kk).sum() * ((kk) % 3)))
         for kk in range(1, 6) if (k == kk).any()]
assert r7.rows() == want7, (r7.rows()[:3], want7[:3])

# distributed LEFT OUTER join aggregation (unmatched keys 6..8)
r8 = db.execute("SELECT t.k, count(*), sum(d.w) FROM t LEFT JOIN d "
                "ON t.k = d.k GROUP BY t.k ORDER BY t.k")
for kk, cnt, sw in r8.rows():
    assert cnt == int((k == kk).sum())
    if kk >= 6:   # unmatched keys: all-NULL sum is 0 (engine convention,
        assert sw == 0, (kk, sw)   # same as the single-chip pipeline)

# dictionary-encoded VARCHAR group keys across 2 processes (both
# processes build the same dictionary from the same inserted rows, so
# the int32 codes agree shard-to-shard)
syms = ["aa", "bb", "cc", "dd"]
si = rng.integers(0, 4, n)
db.execute("CREATE TABLE sv(sym VARCHAR(4), price INT)")
db.catalog.get("sv").append_rows(
    [(syms[int(i)], int(p)) for i, p in zip(si, v)])
db.place_table(db.catalog.get("sv"))
r9 = db.execute("SELECT sym, sum(price), count(*) FROM sv "
                "GROUP BY sym ORDER BY sym")
want9 = [(s, int(v[si == j].sum()), int((si == j).sum()))
         for j, s in enumerate(syms)]
assert r9.rows() == want9, (r9.rows(), want9[:2])

# distributed top-k scan (replicated merge — multi-process safe)
r10 = db.execute("SELECT k, v FROM t ORDER BY v DESC LIMIT 7")
want10 = sorted(range(n), key=lambda i: (-v[i], i))[:7]
assert r10.rows() == [(int(k[i]), int(v[i])) for i in want10], r10.rows()

# OVER window across 2 processes (round 5: in-program inverse-shuffle
# write-back; O(rows) output, previously single-process only).
# Default frame = RANGE UNBOUNDED..CURRENT: peers (equal v) included.
r11 = db.execute("SELECT k, v, sum(v) OVER (PARTITION BY k ORDER BY v) "
                 "AS rs FROM t")
got11 = r11.rows()
assert len(got11) == n
for kk, vv, rs in got11[:500]:
    assert rs == int(v[(k == kk) & (v <= vv)].sum()), (kk, vv, rs)

# running-sums trades query (reference aggregations.h:127-330 class)
# across 2 processes: unbounded ordered tier, replicated assembly
ts = rng.permutation(n)
db.execute("CREATE TABLE tr(k INT, ts INT, v INT)")
db.catalog.get("tr").append_rows(
    [(int(a), int(b), int(c)) for a, b, c in zip(k, ts, v)])
db.place_table(db.catalog.get("tr"))
r12 = db.execute("SELECT k, sums(v) AS s FROM tr ASSUMING ASC ts "
                 "GROUP BY k")
got12 = r12.rows()
assert len(got12) == len(np.unique(k))
for kk, s in got12:
    vv = v[k == kk][np.argsort(ts[k == kk], kind="stable")]
    assert list(s) == [int(x) for x in np.cumsum(vv)], (kk, s[:4])

assert db.stats.dist_spmd >= 12 and db.stats.dist_fallback == 0, (
    db.stats.dist_spmd, db.stats.dist_fallback_reasons)
print(f"MULTIHOST_OK {pid}", flush=True)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_mesh(tmp_path):
    script = tmp_path / "child.py"
    script.write_text(_CHILD)
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(i), str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env)
        for i in range(2)]
    outs = []
    for i, p in enumerate(procs):
        try:
            out, err = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail(f"process {i} timed out")
        outs.append((p.returncode, out, err))
    for i, (rc, out, err) in enumerate(outs):
        assert rc == 0, f"process {i} failed:\n{err[-3000:]}"
        assert f"MULTIHOST_OK {i}" in out, (out, err[-1500:])
