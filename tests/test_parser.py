"""Parser golden tests over the reference's own test scripts' syntax
(tests/*.a in the reference repo define the dialect surface)."""

import pytest

from aquery2_tpu.parser import parse, A


def one(sql):
    stmts = parse(sql)
    assert len(stmts) == 1, stmts
    return stmts[0]


def test_create_table():
    s = one("CREATE TABLE ticks(ID varchar(10), timestamp int, tradeDate date, price int)")
    assert isinstance(s, A.CreateTable)
    assert s.name == "ticks"
    assert [c.name for c in s.columns] == ["ID", "timestamp", "tradeDate", "price"]
    assert s.columns[0].type_name == "varchar"


def test_create_table_as_select():
    s = one("CREATE TABLE d AS SELECT c1, c2 AS twice FROM t")
    assert isinstance(s, A.CreateTable)
    assert s.as_select is not None
    assert s.as_select.projections[1].alias == "twice"


def test_insert_values_multirow():
    s = one("insert into t values(1,2), (2,3), (44, 2)")
    assert isinstance(s, A.Insert)
    assert len(s.values) == 3
    assert s.values[2][0].value == 44


def test_insert_select():
    s = one("INSERT INTO my_table SELECT * FROM my_table")
    assert isinstance(s, A.Insert)
    assert s.select is not None


def test_load_data():
    s = one('LOAD DATA INFILE "data/stock.csv" INTO TABLE ticks FIELDS TERMINATED BY ","')
    assert isinstance(s, A.Load)
    assert s.path == "data/stock.csv"
    assert s.field_sep == ","
    assert not s.complex


def test_load_complex_data():
    s = one("load complex data infile 'x.csv' into table f fields terminated by ',' "
            "element terminated by ';'")
    assert isinstance(s, A.Load)
    assert s.complex and s.element_sep == ";"


def test_select_assuming_where():
    s = one("""SELECT max(price-mins(price))
               FROM ticks ASSUMING ASC timestamp
               WHERE ID="S" AND tradeDate='2003-01-10'""")
    assert isinstance(s, A.Select)
    assert s.assumptions[0].col.name == "timestamp"
    assert s.assumptions[0].ascending
    w = s.where
    assert isinstance(w, A.BinOp) and w.op == "and"


def test_select_assuming_desc_multi():
    s = one("SELECT last(price) FROM ticks t, base b ASSUMING ASC name, ASC timestamp "
            "WHERE t.ID=b.ID AND name=\"x\"")
    assert len(s.sources) == 2
    assert s.sources[0].alias == "t"
    assert len(s.assumptions) == 2


def test_select_groupby_expr():
    s = one("SELECT src, dst, count(*), avg(len) FROM network "
            "ASSUMING ASC src, ASC dst, ASC _time "
            "GROUP BY src, dst, sums(deltas(_time) > 120)")
    assert len(s.group_by) == 3
    g = s.group_by[2]
    assert isinstance(g, A.Call) and g.func == "sums"


def test_select_into_outfile_after_groupby():
    s = one('select Mont, mins(2,sales) from sale assuming desc Mont group by Mont '
            'into outfile "flatten.csv"')
    assert s.into_outfile == "flatten.csv"
    assert not s.assumptions[0].ascending


def test_select_into_table_before_from():
    s = one("select distinct ID, TradeDate into td from TradedStocks")
    assert s.distinct and s.into_table == "td"


def test_natural_join():
    s = one("SELECT ID, avgs(10, ClosePrice) FROM td NATURAL JOIN HistoricQuotes hq "
            "ASSUMING ASC TradeDate GROUP BY hq.ID")
    assert isinstance(s.sources[0], A.JoinSource)
    assert s.sources[0].kind == "natural"
    assert s.sources[0].right.alias == "hq"


def test_orderby_directions():
    s = one("SELECT sum(c), b, d FROM testq1 group by a,b,d order by d DESC, b ASC;")
    assert not s.order_by[0].ascending
    assert s.order_by[1].ascending


def test_max_min_as_column_names():
    s = one("SELECT ID, max, min FROM ticks2")
    names = [p.expr.name for p in s.projections]
    assert names == ["ID", "max", "min"]


def test_function_udf():
    s = one("""FUNCTION covariance (x , y ) {
        xmean := avg (x) ;
        ymean := avg (y) ;
        avg (( x - xmean ) * (y - ymean ))
        }""")
    assert isinstance(s, A.CreateFunction)
    assert s.params == ["x", "y"]
    assert isinstance(s.body[-1], A.UdfExprStmt)
    assert not s.is_aggregation


def test_aggregation_function_full():
    src = open("/root/reference/tests/udf3.a").read()
    stmts = parse(src)
    f = stmts[0]
    assert isinstance(f, A.CreateFunction) and f.is_aggregation
    assert f.name == "covariances2"
    kinds = [type(st).__name__ for st in f.body]
    assert "UdfIf" in kinds and "UdfFor" in kinds
    sel = stmts[-1]
    assert isinstance(sel, A.Select)
    assert sel.group_by


def test_load_module():
    s = one("""LOAD MODULE FROM "./test.so" FUNCTIONS (
        mydiv(a:int, b:int) -> double,
        mulvec(a:int, b:vecfloat) -> vecfloat
    );""")
    assert isinstance(s, A.LoadModule)
    assert s.functions[0].name == "mydiv"
    assert s.functions[1].params[1] == ("b", "vecfloat")
    assert s.functions[1].ret_type == "vecfloat"


def test_triggers():
    s = one("create trigger t action demoi interval 5000")
    assert isinstance(s, A.CreateTrigger)
    assert s.interval_ms == 5000
    s2 = one("create trigger c on source action democa when democq")
    assert s2.table == "source" and s2.action == "democa" and s2.when == "democq"


def test_sql_block():
    stmts = parse("""CREATE TABLE t(a INT)
        <sql>
        INSERT INTO my_table VALUES(14, 24, 'example3');
        SELECT * FROM my_table WHERE c1 < 15;
        </sql>
        SELECT * FROM t""")
    assert isinstance(stmts[1], A.PassthroughSQL)
    inner = parse(stmts[1].text)
    assert isinstance(inner[0], A.Insert)
    assert isinstance(inner[1], A.Select)


def test_union_all():
    s = one("SELECT * FROM a UNION ALL SELECT * FROM b")
    assert len(s.unions) == 1 and s.unions[0][0] == "all"


def test_drop_if_exists():
    s = one("DROP TABLE IF EXISTS ticks")
    assert isinstance(s, A.DropTable) and s.if_exists


def test_reference_scripts_parse():
    import pathlib
    ok = ["stock.a", "moving_avg.a", "gb.a", "joins.a", "q1.sql", "udf3.a",
          "strings.a", "funcs.a", "modules.a", "network.a", "best_profit.a",
          "q4.a", "dt.a", "dt2.a", "jose_gh.a", "sqlblock.a", "cache.a",
          "complex_data.a", "rf.a", "draw.a"]
    for f in ok:
        src = pathlib.Path("/root/reference/tests", f).read_text()
        stmts = parse(src)
        assert stmts, f


def test_h2o_suite_parses():
    import pathlib
    src = pathlib.Path("/root/reference/benchmark/h2o/groupby.sql").read_text()
    stmts = parse(src)
    assert len(stmts) == 9  # q6 is commented out
    src2 = pathlib.Path("/root/reference/benchmark/h2o/groupby_prep.sql").read_text()
    assert len(parse(src2)) == 2
