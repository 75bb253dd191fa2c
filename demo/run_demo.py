"""Streaming ingest + online RF retraining demo (reference demo/ parity).

Uses interval + conditional triggers and the irf model module. Runs on
CPU by default (JAX_PLATFORMS=cpu python demo/run_demo.py).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import aquery2_tpu as aq  # noqa: E402
from aquery2_tpu.utils.datagen import electricity_csv  # noqa: E402


def main() -> int:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    db = aq.connect(base_dir=repo)
    work = os.path.join(repo, "demo", "_work")
    os.makedirs(work, exist_ok=True)

    # batches to stream
    batches = []
    for i in range(3):
        p = os.path.join(work, f"electricity{i}.csv")
        electricity_csv(p, n=120, seed=100 + i)
        batches.append(p)

    db.execute("create table source(x vecdouble, y int64);")
    db.execute("""LOAD MODULE FROM "aquery2_tpu/models/irf.py" FUNCTIONS (
        newtree(height:int, f:int64, sparse:vecint, forget:double,
                noclasses:int64, e:int) -> bool,
        fit_inc(X:vecvecdouble, y:vecint64) -> bool,
        predict(X:vecvecdouble) -> vecint,
        test(X:vecvecdouble, y:vecint64) -> double
    );""")
    db.execute("create table elec_sparse(v int);")
    db.execute("insert into elec_sparse values (0), (1), (1), (1), (1), (1), (1);")
    db.execute("select newtree(10, 7, elec_sparse.v, 0.3, 2, 1) from elec_sparse")

    # stored procedures: ingest / condition / retrain action
    state = {"next": 0}

    ps = db.procedures
    ps.start_recording("democq")
    db.execute("select count(*) > 100 from source")
    ps.stop_recording()

    ps.start_recording("democa")
    db.execute("select fit_inc(x, y) from source")
    ps.stop_recording()

    # interval ingest is a python-side pump here (the reference's demoi
    # loads the next CSV each tick); register it as a callable procedure
    def ingest():
        if state["next"] < len(batches):
            path = batches[state["next"]]
            state["next"] += 1
            db.execute(f"load complex data infile '{path}' into table source "
                       f"fields terminated by ',' element terminated by ';'")

    db.execute("create trigger c on source action democa when democq")

    for step in range(len(batches)):
        ingest()
        n = db.execute("select count(*) from source").scalar()
        acc = db.execute("select test(x, y) from source").scalar()
        print(f"batch {step}: rows={n} accuracy={acc:.3f}")
        time.sleep(0.1)

    assert acc > 0.8, "online model should fit the stream"
    print("demo OK")
    db.close()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
