"""Fused group-by path: correctness vs NumPy oracle on h2o-style queries."""

import numpy as np
import pytest

import aquery2_tpu as aq
from aquery2_tpu import types as T
from aquery2_tpu.storage.table import Column, Table


@pytest.fixture
def db(rng):
    s = aq.connect()
    n = 5000
    data = {
        "id1": rng.integers(1, 11, n).astype(np.int32),
        "id2": rng.integers(1, 11, n).astype(np.int32),
        "id3": rng.integers(1, 501, n).astype(np.int32),
        "v1": rng.integers(1, 6, n).astype(np.int32),
        "v2": rng.integers(1, 16, n).astype(np.int32),
        "v3": np.round(rng.random(n) * 100, 6).astype(np.float32),
    }
    t = Table("source", [
        Column(k, T.FloatT if k == "v3" else T.IntT, v) for k, v in data.items()
    ])
    s.catalog.create(t)
    s._data = data
    yield s
    s.close()


def _oracle_groupby(data, keys, reduce_fn):
    from collections import defaultdict
    groups = defaultdict(list)
    n = len(data[keys[0]])
    for i in range(n):
        groups[tuple(int(data[k][i]) for k in keys)].append(i)
    return {k: reduce_fn(idx) for k, idx in groups.items()}


def test_fused_sum_single_key(db):
    r = db.execute("SELECT id1, sum(v1) AS v1 FROM source GROUP BY id1")
    d = db._data
    want = _oracle_groupby(d, ["id1"], lambda idx: int(d["v1"][idx].sum()))
    got = {(row[0],): row[1] for row in r.rows()}
    assert got == want
    # deterministic order: ascending key
    keys = [row[0] for row in r.rows()]
    assert keys == sorted(keys)


def test_fused_multi_key_sum_avg(db):
    r = db.execute("SELECT id1, id2, sum(v1) AS s, avg(v3) AS a FROM source "
                   "GROUP BY id1, id2")
    d = db._data
    want_s = _oracle_groupby(d, ["id1", "id2"], lambda idx: int(d["v1"][idx].sum()))
    want_a = _oracle_groupby(
        d, ["id1", "id2"],
        lambda idx: d["v3"][idx].astype(np.float64).sum() / len(idx))
    for row in r.rows():
        k = (row[0], row[1])
        assert row[2] == want_s[k]
        assert row[3] == pytest.approx(want_a[k], rel=1e-6)


def test_fused_minmax_range(db):
    r = db.execute("SELECT id3, max(v1) - min(v2) AS range_v1_v2 FROM source "
                   "GROUP BY id3")
    d = db._data
    want = _oracle_groupby(
        d, ["id3"], lambda idx: int(d["v1"][idx].max()) - int(d["v2"][idx].min()))
    got = {(row[0],): row[1] for row in r.rows()}
    assert got == want


def test_fused_corr_pow(db):
    r = db.execute("SELECT id2, pow(corr(v1, v2), 2) AS r2 FROM source GROUP BY id2")
    d = db._data
    def corr2(idx):
        x = d["v1"][idx].astype(np.float64)
        y = d["v2"][idx].astype(np.float64)
        c = np.corrcoef(x, y)[0, 1]
        return c * c
    want = _oracle_groupby(d, ["id2"], corr2)
    for row in r.rows():
        assert row[1] == pytest.approx(want[(row[0],)], rel=1e-9)


def test_fused_count_star_where(db):
    r = db.execute("SELECT id1, count(*) AS cnt FROM source WHERE v1 > 2 GROUP BY id1")
    d = db._data
    m = d["v1"] > 2
    from collections import Counter
    want = Counter(d["id1"][m].tolist())
    got = {row[0]: row[1] for row in r.rows()}
    assert got == dict(want)


def test_fused_rowexpr_agg(db):
    r = db.execute("SELECT id1, sum(v1 * v2) AS sv FROM source GROUP BY id1")
    d = db._data
    want = _oracle_groupby(
        d, ["id1"],
        lambda idx: int((d["v1"][idx].astype(np.int64) * d["v2"][idx]).sum()))
    got = {(row[0],): row[1] for row in r.rows()}
    assert got == want


def test_fused_matches_general_path(db):
    """Same query through fused and general paths must agree."""
    from aquery2_tpu.engine import fused_groupby

    r1 = db.execute("SELECT id2, sum(v2) AS s FROM source GROUP BY id2")
    # disable fused path via cache poisoning: run a query shape it rejects
    r2 = db.execute("SELECT id2, sum(v2) AS s FROM source GROUP BY id2 ORDER BY id2")
    got1 = sorted(map(tuple, r1.rows()))
    got2 = sorted(map(tuple, r2.rows()))
    assert got1 == got2


def test_fused_var_stddev(db):
    r = db.execute("SELECT id1, var(v2) AS v, stddev(v2) AS s FROM source GROUP BY id1")
    d = db._data
    def ref_var(idx):
        x = d["v2"][idx].astype(np.int64)
        n = len(x)
        s = x.sum()
        ssq = (x * x).sum()
        return (ssq - s * s / (n + 1)) / (n + 1)  # reference quirk
    want = _oracle_groupby(d, ["id1"], ref_var)
    for row in r.rows():
        assert row[1] == pytest.approx(want[(row[0],)], rel=1e-12)
        assert row[2] == pytest.approx(np.sqrt(want[(row[0],)]), rel=1e-12)


def test_fused_sort_path_compound_keys(db, monkeypatch):
    """Force the packed-sort strategy by shrinking the MXU-tier cap."""
    from aquery2_tpu import config as cfg
    monkeypatch.setattr(cfg, "ONEHOT_MATMUL_MAX_GROUPS", 1)
    from aquery2_tpu.engine import fused_groupby
    fused_groupby._cache.clear()
    r = db.execute("SELECT id1, id2, sum(v1) AS s, count(*) AS c FROM source "
                   "GROUP BY id1, id2")
    d = db._data
    want = _oracle_groupby(d, ["id1", "id2"], lambda idx: int(d["v1"][idx].sum()))
    cnt = _oracle_groupby(d, ["id1", "id2"], len)
    got = {(row[0], row[1]): (row[2], row[3]) for row in r.rows()}
    assert {k: v[0] for k, v in got.items()} == want
    assert {k: v[1] for k, v in got.items()} == cnt
    # ascending lexicographic group order
    keys = [(row[0], row[1]) for row in r.rows()]
    assert keys == sorted(keys)
    fused_groupby._cache.clear()


def test_fused_sort_path_avg_minmax(db, monkeypatch):
    from aquery2_tpu import config as cfg
    monkeypatch.setattr(cfg, "ONEHOT_MATMUL_MAX_GROUPS", 1)
    from aquery2_tpu.engine import fused_groupby
    fused_groupby._cache.clear()
    r = db.execute("SELECT id3, avg(v3) AS a, max(v1) - min(v2) AS rg "
                   "FROM source GROUP BY id3")
    d = db._data
    want_a = _oracle_groupby(
        d, ["id3"], lambda idx: d["v3"][idx].astype(np.float64).sum() / len(idx))
    want_r = _oracle_groupby(
        d, ["id3"], lambda idx: int(d["v1"][idx].max()) - int(d["v2"][idx].min()))
    for row in r.rows():
        assert row[1] == pytest.approx(want_a[(row[0],)], rel=1e-6)
        assert row[2] == want_r[(row[0],)]
    fused_groupby._cache.clear()


def test_fused_join_count(db):
    import numpy as np
    from aquery2_tpu.storage.table import Column, Table
    from aquery2_tpu import types as T
    d = db._data
    dim_keys = np.unique(d["id3"])[::3].astype(np.int32)
    dim = Table("dim", [Column("id3", T.IntT, dim_keys)])
    db.catalog.create(dim)
    r = db.execute("SELECT count(*) FROM source s, dim d WHERE s.id3 = d.id3")
    want = int(np.isin(d["id3"], dim_keys).sum())
    assert r.scalar() == want


def test_fused_median_groupby(db):
    import numpy as np

    db.execute("CREATE TABLE mt(g INT, h INT, v DOUBLE)")
    rng = np.random.default_rng(5)
    g = rng.integers(1, 6, 200)
    h = rng.integers(1, 4, 200)
    v = np.round(rng.random(200) * 100, 3)
    rows = ",".join(f"({a},{b},{c})" for a, b, c in zip(g, h, v))
    db.execute(f"INSERT INTO mt VALUES {rows}")
    r = db.execute("SELECT g, h, median(v) AS m, stddev(v) AS s "
                   "FROM mt GROUP BY g, h")
    got = {(int(a), int(b)): (m, s) for a, b, m, s in r.rows()}
    for key in got:
        sel = v[(g == key[0]) & (h == key[1])]
        want = float(np.median(sel))
        assert abs(got[key][0] - want) < 1e-6, key
        n = len(sel)
        sf = np.asarray(sel, dtype=np.float64)
        denom = n + 1  # reference var quirk (strict mode)
        wants = float(np.sqrt(max(
            (np.sum(sf * sf) - np.sum(sf) ** 2 / denom) / denom, 0)))
        # float sum lanes square in f32 (exact limb sums of f32 values)
        assert abs(got[key][1] - wants) < 1e-4 * max(wants, 1), key


def test_fused_groupby_order_by(db):
    db.execute("CREATE TABLE ot(g INT, v INT)")
    db.execute("INSERT INTO ot VALUES (3,1),(1,10),(1,5),(2,2),(2,9),(3,4)")
    r = db.execute("SELECT g, sum(v) AS s FROM ot GROUP BY g ORDER BY s DESC")
    assert r.rows() == [(1, 15), (2, 11), (3, 5)]
    r = db.execute("SELECT g, sum(v) AS s FROM ot GROUP BY g "
                   "ORDER BY sum(v)")
    assert r.rows() == [(3, 5), (2, 11), (1, 15)]
    r = db.execute("SELECT g, sum(v) AS s FROM ot GROUP BY g "
                   "ORDER BY s DESC LIMIT 2")
    assert r.rows() == [(1, 15), (2, 11)]


def test_fused_groupby_having(db):
    db.execute("CREATE TABLE ht(g INT, v INT)")
    db.execute("INSERT INTO ht VALUES (1,10),(1,5),(2,2),(2,9),(2,1),(3,4)")
    r = db.execute("SELECT g, sum(v) AS s FROM ht GROUP BY g "
                   "HAVING count(*) > 1")
    assert r.rows() == [(1, 15), (2, 12)]
    r = db.execute("SELECT g, sum(v) AS s FROM ht GROUP BY g "
                   "HAVING sum(v) >= 12 ORDER BY s")
    assert r.rows() == [(2, 12), (1, 15)]


def test_fused_multiword_packed_keys(db):
    """Keys whose bit-fields span two int32 words (> 30 total bits)."""
    import numpy as np
    rng = np.random.default_rng(9)
    n = 600
    a = rng.integers(0, 1 << 20, n).astype(np.int32)   # 20 bits
    b = rng.integers(0, 1 << 20, n).astype(np.int32)   # 20 bits -> 2 words
    v = rng.integers(-100, 100, n).astype(np.int32)
    db.execute("CREATE TABLE mw(a INT, b INT, v INT)")
    rows = ",".join(f"({x},{y},{z})" for x, y, z in zip(a, b, v))
    db.execute(f"INSERT INTO mw VALUES {rows}")
    r = db.execute("SELECT a, b, sum(v) AS s, count(*) AS c "
                   "FROM mw GROUP BY a, b")
    want = {}
    for x, y, z in zip(a, b, v):
        k = (int(x), int(y))
        s, c = want.get(k, (0, 0))
        want[k] = (s + int(z), c + 1)
    got = {(row[0], row[1]): (row[2], row[3]) for row in r.rows()}
    assert got == want
    keys = [(row[0], row[1]) for row in r.rows()]
    assert keys == sorted(keys)


def test_fused_multikey_fallback_wide_key(db):
    """A key wider than 30 bits forces the multi-key sort fallback."""
    import numpy as np
    rng = np.random.default_rng(11)
    n = 400
    a = (rng.integers(0, 50, n).astype(np.int64) * (1 << 33))  # 38+ bits
    v = rng.integers(0, 100, n).astype(np.int32)
    db.execute("CREATE TABLE wk(a BIGINT, v INT)")
    rows = ",".join(f"({x},{z})" for x, z in zip(a, v))
    db.execute(f"INSERT INTO wk VALUES {rows}")
    r = db.execute("SELECT a, sum(v) AS s FROM wk GROUP BY a")
    want = {}
    for x, z in zip(a, v):
        want[int(x)] = want.get(int(x), 0) + int(z)
    got = {row[0]: row[1] for row in r.rows()}
    assert got == want


def test_fused_expression_group_key(db):
    r = db.execute("SELECT id1+id2 AS k, sum(v1) AS s FROM source "
                   "GROUP BY id1+id2")
    d = db._data
    want = _oracle_groupby({"k": d["id1"] + d["id2"], "v1": d["v1"]}, ["k"],
                           lambda idx: int(d["v1"][idx].sum()))
    got = {(row[0],): row[1] for row in r.rows()}
    assert got == want
    keys = [row[0] for row in r.rows()]
    assert keys == sorted(keys)
    # combined with HAVING + ORDER BY
    r = db.execute("SELECT id1*10+id2 AS k, count(*) AS c FROM source "
                   "GROUP BY id1*10+id2 HAVING count(*) > 0 ORDER BY c DESC")
    assert sum(row[1] for row in r.rows()) == len(d["id1"])
    cs = [row[1] for row in r.rows()]
    assert cs == sorted(cs, reverse=True)


def test_fused_star_join_groupby(db):
    """FK join + group-by through the star fast path, vs numpy oracle."""
    import numpy as np
    from aquery2_tpu.storage.table import Column, Table
    from aquery2_tpu import types as T
    d = db._data
    dim_keys = np.unique(d["id3"])[::2].astype(np.int32)   # unique FK side
    rng2 = np.random.default_rng(3)
    w = rng2.integers(1, 5, len(dim_keys)).astype(np.int32)
    db.catalog.create(Table("dimw", [Column("id3", T.IntT, dim_keys),
                                     Column("w", T.IntT, w)]), replace=True)
    r = db.execute("SELECT d.w, count(*) AS c, sum(s.v1) AS sv "
                   "FROM source s, dimw d WHERE s.id3 = d.id3 GROUP BY d.w")
    lut = dict(zip(dim_keys.tolist(), w.tolist()))
    from collections import defaultdict
    want_c = defaultdict(int)
    want_s = defaultdict(int)
    for k, v1 in zip(d["id3"], d["v1"]):
        if int(k) in lut:
            want_c[lut[int(k)]] += 1
            want_s[lut[int(k)]] += int(v1)
    got = {row[0]: (row[1], row[2]) for row in r.rows()}
    assert got == {k: (want_c[k], want_s[k]) for k in want_c}

    # probe-side filter stays in WHERE; dim key projected works too
    r2 = db.execute("SELECT d.id3, count(*) AS c FROM source s, dimw d "
                    "WHERE s.id3 = d.id3 AND s.v1 > 2 GROUP BY d.id3")
    m = d["v1"] > 2
    want2 = defaultdict(int)
    for k in d["id3"][m]:
        if int(k) in lut:
            want2[int(k)] += 1
    got2 = {row[0]: row[1] for row in r2.rows()}
    assert got2 == dict(want2)


def test_star_join_falls_back_on_dup_keys(db):
    """Duplicate build keys must fall back to the general join (results
    still correct, with pair multiplicity)."""
    import numpy as np
    from aquery2_tpu.storage.table import Column, Table
    from aquery2_tpu import types as T
    d = db._data
    keys = np.array([1, 1, 2], dtype=np.int32)   # dup key 1
    w = np.array([10, 20, 30], dtype=np.int32)
    db.catalog.create(Table("dimdup", [Column("id1", T.IntT, keys),
                                       Column("w", T.IntT, w)]), replace=True)
    r = db.execute("SELECT d.w, count(*) AS c FROM source s, dimdup d "
                   "WHERE s.id1 = d.id1 GROUP BY d.w")
    from collections import Counter
    c1 = Counter(d["id1"].tolist())
    want = {10: c1[1], 20: c1[1], 30: c1[2]}
    got = {row[0]: row[1] for row in r.rows()}
    assert got == want


def test_fused_star_natural_join_groupby(db):
    import numpy as np
    from aquery2_tpu.storage.table import Column, Table
    from aquery2_tpu import types as T
    d = db._data
    dim_keys = np.unique(d["id3"]).astype(np.int32)      # all keys, unique
    rng2 = np.random.default_rng(7)
    w = rng2.integers(1, 4, len(dim_keys)).astype(np.int32)
    db.catalog.create(Table("dimn", [Column("id3", T.IntT, dim_keys),
                                     Column("w", T.IntT, w)]), replace=True)
    r = db.execute("SELECT w, count(*) AS c FROM source NATURAL JOIN dimn "
                   "GROUP BY w")
    lut = dict(zip(dim_keys.tolist(), w.tolist()))
    from collections import Counter
    want = Counter(lut[int(k)] for k in d["id3"])
    got = {row[0]: row[1] for row in r.rows()}
    assert got == dict(want)

    # shared key projected unqualified + ON form
    r2 = db.execute("SELECT id3, count(*) AS c FROM source s JOIN dimn d "
                    "ON s.id3 = d.id3 GROUP BY id3")
    want2 = Counter(int(k) for k in d["id3"])
    got2 = {row[0]: row[1] for row in r2.rows()}
    assert got2 == dict(want2)


def test_six_key_extraction_repack(rng):
    """q10-shaped 6-key group-by: the key bit-fields span three sort
    words but re-pack into two full-32-bit extraction lanes
    (fused_groupby._plan_extract_words); sums/counts must stay exact."""
    s = aq.connect()
    n = 8192
    cols = {
        "id1": rng.integers(1, 11, n).astype(np.int32),
        "id2": rng.integers(1, 11, n).astype(np.int32),
        "id3": rng.integers(1, 1_000_001, n).astype(np.int32),
        "id4": rng.integers(1, 11, n).astype(np.int32),
        "id5": rng.integers(1, 11, n).astype(np.int32),
        "id6": rng.integers(1, 1_000_001, n).astype(np.int32),
        "v3": np.round(rng.random(n) * 100, 6).astype(np.float32),
    }
    # pin id3/id6 to full 24-bit ranges so the word plan matches q10's
    # (id1+id2 | id3+id4 | id5+id6 → three 30-bit sort words)
    cols["id3"][0] = 1; cols["id3"][1] = 16_000_000
    cols["id6"][0] = 1; cols["id6"][1] = 16_000_000
    t = Table("g6", [Column(k, T.FloatT if k == "v3" else T.IntT, v)
                     for k, v in cols.items()])
    s.catalog.create(t)
    from aquery2_tpu.engine.fused_groupby import (_plan_extract_words,
                                                  _plan_words)
    ranges = [int(cols[k].max()) - int(cols[k].min()) + 1
              for k in ("id1", "id2", "id3", "id4", "id5", "id6")]
    fields, nwords = _plan_words(ranges)
    assert nwords == 3
    assert _plan_extract_words(fields, 6) is not None     # 3 → 2 lanes
    r = s.execute("SELECT id1, id2, id3, id4, id5, id6, sum(v3) AS sv, "
                  "count(*) AS c FROM g6 GROUP BY id1, id2, id3, id4, "
                  "id5, id6 ORDER BY id1, id2, id3, id4, id5, id6")
    from collections import defaultdict
    sums = defaultdict(float)
    cnts = defaultdict(int)
    for i in range(n):
        k = tuple(int(cols[nm][i]) for nm in
                  ("id1", "id2", "id3", "id4", "id5", "id6"))
        sums[k] += float(np.float64(cols["v3"][i]))
        cnts[k] += 1
    rows = r.rows()
    assert len(rows) == len(sums)
    for row in rows:
        k = row[:6]
        assert cnts[k] == row[7]
        assert abs(row[6] - sums[k]) < 1e-3
    s.close()


def test_tagged_sort_count_join_edges(rng):
    """Tagged-sort count join (fused_join): negative keys, no matches,
    empty build side, and duplicate keys on both sides."""
    s = aq.connect()

    def mk(name, keys):
        arr = np.asarray(keys, np.int32)
        s.catalog.create(Table(name, [Column("k", T.IntT, arr)]),
                         replace=True)
        return arr

    lk = mk("l", rng.integers(-50, 50, 4000))
    rk = mk("r", rng.integers(-60, 40, 700))
    got = s.execute("SELECT count(*) FROM l, r WHERE l.k = r.k").rows()[0][0]
    want = sum(int((lk == k).sum()) for k in rk)
    assert got == want

    mk("r2", [999] * 5)                       # no overlap
    assert s.execute("SELECT count(*) FROM l, r2 "
                     "WHERE l.k = r2.k").rows()[0][0] == 0

    mk("l2", [7, 7, 7]); mk("r3", [7, 7])     # dup keys both sides
    assert s.execute("SELECT count(*) FROM l2, r3 "
                     "WHERE l2.k = r3.k").rows()[0][0] == 6
    s.close()


def test_median_disables_key_word_embed(rng):
    """Median rides the packed sort as the secondary key: within each
    group rows must order by the median argument FIRST, so carrier
    embedding in the key words (which would interpose carrier bits
    between the group key and the median key) is gated off. Exactness
    check on a shape whose carriers would otherwise embed."""
    s = aq.connect()
    n = 4096
    K = rng.integers(1, 3_000_000, n).astype(np.int32)   # 22 bits, spare 8
    V = rng.integers(1, 9, n).astype(np.int32)           # 3 bits: embeddable
    X = np.round(rng.random(n) * 100, 6).astype(np.float32)
    t = Table("m1", [Column("k", T.IntT, K), Column("v", T.IntT, V),
                     Column("x", T.FloatT, X)])
    s.catalog.create(t)
    r = s.execute("SELECT k, median(x) AS mx, sum(v) AS sv FROM m1 "
                  "GROUP BY k ORDER BY k")
    rows = r.rows()
    assert len(rows) == len(np.unique(K))
    for k, mx, sv in rows[:500]:
        m = K == k
        assert abs(mx - float(np.median(X[m].astype(np.float64)))) < 1e-6, k
        assert sv == int(V[m].sum())
    s.close()
