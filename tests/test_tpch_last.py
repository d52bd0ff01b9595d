"""Differential tests for TPC-H Q20/Q21/Q22 — completes the 22-query suite."""

import numpy as np
import pandas as pd
import pytest

from datafusion_comet_tpu.exec.engine import Session
from datafusion_comet_tpu.models import tpch

SF = 0.001
ALL = ["lineitem", "orders", "customer", "supplier", "nation", "region", "part", "partsupp"]


@pytest.fixture(scope="module")
def data():
    return tpch.generate_tables(ALL, SF)


@pytest.fixture(scope="module")
def sess(data):
    s = Session()
    for name, cols in data.items():
        s.register_numpy(name, cols, tpch.SCHEMAS[name])
    return s


def df(data, name):
    return pd.DataFrame(data[name])


def test_q20(sess, data):
    out = sess.collect(tpch.q20())
    l, ps, s, n, p = (df(data, x) for x in ("lineitem", "partsupp", "supplier", "nation", "part"))
    pf = set(p[p.p_name.str.startswith("forest")].p_partkey)
    lf = l[(l.l_shipdate >= tpch._d("1994-01-01")) & (l.l_shipdate < tpch._d("1995-01-01"))]
    qty = lf.groupby(["l_partkey", "l_suppkey"]).l_quantity.sum()
    j = ps[ps.ps_partkey.isin(pf)].merge(
        qty.reset_index(), left_on=["ps_partkey", "ps_suppkey"], right_on=["l_partkey", "l_suppkey"]
    )
    ok = j[j.ps_availqty > 0.005 * j.l_quantity]
    suppkeys = set(ok.ps_suppkey)
    nf = set(n[n.n_name == "CANADA"].n_nationkey)
    exp = s[s.s_nationkey.isin(nf) & s.s_suppkey.isin(suppkeys)].sort_values("s_name")
    assert list(out["s_name"]) == list(exp.s_name)


def test_q21(sess, data):
    out = sess.collect(tpch.q21())
    l, o, s, n = (df(data, x) for x in ("lineitem", "orders", "supplier", "nation"))
    late = l[l.l_receiptdate > l.l_commitdate]
    fstat = set(o[o.o_orderstatus == "F"].o_orderkey)
    nsa = set(n[n.n_name == "SAUDI ARABIA"].n_nationkey)
    sn = s[s.s_nationkey.isin(nsa)][["s_suppkey", "s_name"]]
    l1 = late[late.l_orderkey.isin(fstat)].merge(sn, left_on="l_suppkey", right_on="s_suppkey")
    # exists other supplier on order
    order_supps = l.groupby("l_orderkey").l_suppkey.agg(set)
    late_supps = late.groupby("l_orderkey").l_suppkey.agg(set)

    def waited(row):
        others = order_supps.get(row.l_orderkey, set()) - {row.l_suppkey}
        if not others:
            return False
        late_others = late_supps.get(row.l_orderkey, set()) - {row.l_suppkey}
        return len(late_others) == 0

    keep = l1[l1.apply(waited, axis=1)] if len(l1) else l1
    g = (
        keep.groupby("s_name").size().reset_index(name="numwait")
        .sort_values(["numwait", "s_name"], ascending=[False, True], kind="stable").head(100)
    )
    assert list(out["s_name"]) == list(g.s_name)
    np.testing.assert_array_equal(out["numwait"], g.numwait.values)


def test_q22(sess, data):
    out = sess.collect(tpch.q22())
    c, o = df(data, "customer"), df(data, "orders")
    codes = ["13", "31", "23", "29", "30", "18", "17"]
    cc = c.assign(code=c.c_phone.str[:2])
    sel = cc[cc.code.isin(codes)]
    avg_bal = sel[sel.c_acctbal > 0].c_acctbal.mean()
    rich = sel[sel.c_acctbal > avg_bal]
    has_orders = set(o.o_custkey)
    final = rich[~rich.c_custkey.isin(has_orders)]
    g = final.groupby("code").agg(numcust=("c_custkey", "size"), tot=("c_acctbal", "sum")).reset_index().sort_values("code")
    assert list(out["cntrycode"]) == list(g.code)
    np.testing.assert_array_equal(out["numcust"], g.numcust.values)
    np.testing.assert_array_equal(out["totacctbal"], g.tot.values.astype(np.int64))
