"""TPC-H differential tests: engine vs an exact integer-arithmetic oracle.

The oracle computes decimal results with Python/numpy int64 math at the same
scales the engine uses, so comparisons are bit-exact (the checkSparkAnswer
pattern, CometTestBase.scala:162). Tiny SF keeps CPU compiles fast.
"""

import numpy as np
import pandas as pd
import pytest

from datafusion_comet_tpu.exec.engine import Session
from datafusion_comet_tpu.models import tpch

SF = 0.001


@pytest.fixture(scope="module")
def data():
    return tpch.generate_tables(
        ["lineitem", "orders", "customer", "supplier", "nation", "region"], SF
    )


@pytest.fixture(scope="module")
def sess(data):
    s = Session()
    for name, cols in data.items():
        s.register_numpy(name, cols, tpch.SCHEMAS[name])
    return s


def lineitem_df(data):
    return pd.DataFrame(data["lineitem"])


class TestQ1:
    def test_q1_exact(self, sess, data):
        out = sess.collect(tpch.q1())
        li = lineitem_df(data)
        cutoff = tpch._d("1998-09-02")
        f = li[li.l_shipdate <= cutoff]
        disc4 = f.l_extendedprice.astype(object) * (100 - f.l_discount)  # scale 4
        charge6 = disc4 * (100 + f.l_tax)  # scale 6, exact
        g = f.assign(disc4=disc4, charge6=charge6).groupby(
            ["l_returnflag", "l_linestatus"], sort=True
        )
        exp = g.agg(
            sum_qty=("l_quantity", "sum"),
            sum_base_price=("l_extendedprice", "sum"),
            sum_disc_price=("disc4", "sum"),
            sum_charge=("charge6", "sum"),
            count_order=("l_quantity", "size"),
        ).reset_index()
        assert list(out["l_returnflag"]) == list(exp.l_returnflag)
        assert list(out["l_linestatus"]) == list(exp.l_linestatus)
        np.testing.assert_array_equal(out["sum_qty"], exp.sum_qty.values.astype(np.int64))
        np.testing.assert_array_equal(out["sum_base_price"], exp.sum_base_price.values.astype(np.int64))
        np.testing.assert_array_equal(out["sum_disc_price"], exp.sum_disc_price.values.astype(np.int64))
        np.testing.assert_array_equal(out["sum_charge"], exp.sum_charge.values.astype(np.int64))
        np.testing.assert_array_equal(out["count_order"], exp.count_order.values)
        # avg(decimal(15,2)) → decimal(19,6): HALF_UP(sum * 10^4 / count)
        cnt = exp.count_order.values
        for col, src in [("avg_qty", "sum_qty"), ("avg_price", "sum_base_price")]:
            num = exp[src].values.astype(object) * 10**4
            expect = np.array(
                [((2 * n + c) // (2 * c)) if n >= 0 else -((-2 * n + c) // (2 * c)) for n, c in zip(num, cnt)],
                np.int64,
            )
            np.testing.assert_array_equal(out[col], expect)


class TestQ6:
    def test_q6_exact(self, sess, data):
        out = sess.collect(tpch.q6())
        li = lineitem_df(data)
        d0, d1 = tpch._d("1994-01-01"), tpch._d("1995-01-01")
        f = li[
            (li.l_shipdate >= d0)
            & (li.l_shipdate < d1)
            & (li.l_discount >= 5)
            & (li.l_discount <= 7)
            & (li.l_quantity < 2400)
        ]
        expected = int((f.l_extendedprice.astype(object) * f.l_discount).sum())  # scale 4
        assert int(out["revenue"][0]) == expected


class TestQ3:
    def test_q3_exact(self, sess, data):
        out = sess.collect(tpch.q3())
        li = lineitem_df(data)
        o = pd.DataFrame(data["orders"])
        c = pd.DataFrame(data["customer"])
        cut = tpch._d("1995-03-15")
        cf = c[c.c_mktsegment == "BUILDING"]
        of = o[o.o_orderdate < cut]
        lf = li[li.l_shipdate > cut]
        j = lf.merge(of, left_on="l_orderkey", right_on="o_orderkey").merge(
            cf, left_on="o_custkey", right_on="c_custkey"
        )
        j = j.assign(rev=j.l_extendedprice.astype(object) * (100 - j.l_discount))
        g = (
            j.groupby(["l_orderkey", "o_orderdate", "o_shippriority"]).rev.sum().reset_index()
        )
        g = g.sort_values(["rev", "o_orderdate"], ascending=[False, True], kind="stable").head(10)
        np.testing.assert_array_equal(out["revenue"], g.rev.values.astype(np.int64))
        np.testing.assert_array_equal(out["l_orderkey"], g.l_orderkey.values)
        np.testing.assert_array_equal(out["o_orderdate"], g.o_orderdate.values)


class TestQ5:
    def test_q5_exact(self, sess, data):
        out = sess.collect(tpch.q5())
        li = lineitem_df(data)
        o = pd.DataFrame(data["orders"])
        c = pd.DataFrame(data["customer"])
        s = pd.DataFrame(data["supplier"])
        n = pd.DataFrame(data["nation"])
        r = pd.DataFrame(data["region"])
        d0, d1 = tpch._d("1994-01-01"), tpch._d("1995-01-01")
        rf = r[r.r_name == "ASIA"]
        j = (
            li.merge(o[(o.o_orderdate >= d0) & (o.o_orderdate < d1)], left_on="l_orderkey", right_on="o_orderkey")
            .merge(c, left_on="o_custkey", right_on="c_custkey")
            .merge(s, left_on="l_suppkey", right_on="s_suppkey")
            .merge(n, left_on="s_nationkey", right_on="n_nationkey")
            .merge(rf, left_on="n_regionkey", right_on="r_regionkey")
        )
        j = j[j.c_nationkey == j.s_nationkey]
        j = j.assign(rev=j.l_extendedprice.astype(object) * (100 - j.l_discount))
        g = j.groupby("n_name").rev.sum().reset_index().sort_values("rev", ascending=False)
        assert list(out["n_name"]) == list(g.n_name)
        np.testing.assert_array_equal(out["revenue"], g.rev.values.astype(np.int64))
