"""TPC-DS expansion round 3: q12/q20 (channel revenue ratios), q26 (catalog
demographics averages), q88 (time-band count subqueries)."""

import numpy as np
import pandas as pd
import pytest

from datafusion_comet_tpu.exec.engine import Session
from datafusion_comet_tpu.models import tpcds

SF = 0.02
ALL = list(tpcds.SCHEMAS)


@pytest.fixture(scope="module")
def data():
    return tpcds.generate_tables(ALL, SF)


@pytest.fixture(scope="module")
def sess(data):
    s = Session()
    for name, cols in data.items():
        s.register_numpy(name, cols, tpcds.SCHEMAS[name])
    return s


def df(data, name):
    return pd.DataFrame(data[name])


def half_up_div(n, d):
    n, d = int(n), int(d)
    if n >= 0:
        return (2 * n + d) // (2 * d)
    return -((2 * (-n) + d) // (2 * d))


def _ratio_oracle(data, fact, item_col, price_col, date_col):
    f, dt, it = df(data, fact), df(data, "date_dim"), df(data, "item")
    j = (f.merge(dt[(dt.d_year == 1999) & (dt.d_moy >= 2) & (dt.d_moy <= 3)],
                 left_on=date_col, right_on="d_date_sk")
         .merge(it[it.i_category.isin(["Sports", "Books", "Home"])],
                left_on=item_col, right_on="i_item_sk"))
    g = j.groupby(["i_item_id", "i_item_desc", "i_category", "i_class", "i_current_price"]
                  )[price_col].sum().reset_index(name="itemrevenue")
    cls = g.groupby("i_class").itemrevenue.transform("sum")
    g["revenueratio"] = g.itemrevenue.astype(float) * 100.0 / cls.astype(float)
    return g.sort_values(["i_category", "i_class", "i_item_id", "i_item_desc", "revenueratio"],
                         kind="stable").head(100)


@pytest.mark.parametrize("qname,fact,item_col,price_col,date_col", [
    ("q12", "web_sales", "ws_item_sk", "ws_ext_sales_price", "ws_sold_date_sk"),
    ("q20", "catalog_sales", "cs_item_sk", "cs_ext_sales_price", "cs_sold_date_sk"),
])
def test_channel_ratio(sess, data, qname, fact, item_col, price_col, date_col):
    out = sess.collect(tpcds.QUERIES[qname]())
    o = _ratio_oracle(data, fact, item_col, price_col, date_col)
    np.testing.assert_array_equal(out["i_item_id"], o.i_item_id.values)
    np.testing.assert_array_equal(out["itemrevenue"], o.itemrevenue.values.astype(np.int64))
    np.testing.assert_allclose(out["revenueratio"], o.revenueratio.values, rtol=1e-9)


def test_q26(sess, data):
    out = sess.collect(tpcds.q26())
    cs, cd, dt, pr, it = (df(data, x) for x in
                          ("catalog_sales", "customer_demographics", "date_dim", "promotion", "item"))
    j = (cs.merge(cd[(cd.cd_gender == "M") & (cd.cd_marital_status == "S")
                     & (cd.cd_education_status == "College")],
                  left_on="cs_cdemo_sk", right_on="cd_demo_sk")
         .merge(dt[dt.d_year == 2000], left_on="cs_sold_date_sk", right_on="d_date_sk")
         .merge(pr[(pr.p_channel_email == "N") | (pr.p_channel_event == "N")],
                left_on="cs_promo_sk", right_on="p_promo_sk")
         .merge(it, left_on="cs_item_sk", right_on="i_item_sk"))
    g = j.groupby("i_item_id").agg(
        q=("cs_quantity", "sum"), n=("cs_quantity", "size"),
        lp=("cs_list_price", "sum"), ca=("cs_coupon_amt", "sum"), sp=("cs_sales_price", "sum"),
    ).reset_index().sort_values("i_item_id", kind="stable").head(100)
    np.testing.assert_array_equal(out["i_item_id"], g.i_item_id.values)
    np.testing.assert_allclose(out["agg1"], g.q.values / g.n.values, rtol=1e-12)
    np.testing.assert_array_equal(out["agg2"], [half_up_div(v * 10**4, n) for v, n in zip(g.lp, g.n)])
    np.testing.assert_array_equal(out["agg4"], [half_up_div(v * 10**4, n) for v, n in zip(g.sp, g.n)])


def test_q88(data):
    s = Session()
    for name, cols in data.items():
        s.register_numpy(name, cols, tpcds.SCHEMAS[name])
    out = s.collect(tpcds.q88(s))
    ss, td, hd, st = (df(data, x) for x in
                      ("store_sales", "time_dim", "household_demographics", "store"))
    base = (ss.merge(hd[hd.hd_dep_count == 5], left_on="ss_hdemo_sk", right_on="hd_demo_sk")
            .merge(td, left_on="ss_sold_time_sk", right_on="t_time_sk")
            .merge(st[st.s_store_name == "store_0"], left_on="ss_store_sk", right_on="s_store_sk"))
    i = 0
    for h in (8, 9, 10, 11):
        for half in (0, 1):
            m = (base.t_hour == h) & (base.t_minute >= 30 * half) & (base.t_minute <= 30 * half + 29)
            assert int(out[f"h{i}"][0]) == int(m.sum()), (h, half)
            i += 1


def test_q45(sess, data):
    out = sess.collect(tpcds.q45())
    ws, c, ca, it, dt = (df(data, x) for x in
                         ("web_sales", "customer", "customer_address", "item", "date_dim"))
    j = (ws.merge(c, left_on="ws_bill_customer_sk", right_on="c_customer_sk")
         .merge(ca, left_on="c_current_addr_sk", right_on="ca_address_sk")
         .merge(it, left_on="ws_item_sk", right_on="i_item_sk")
         .merge(dt[(dt.d_qoy == 2) & (dt.d_year == 2000)],
                left_on="ws_sold_date_sk", right_on="d_date_sk"))
    zips = {"85669", "86197", "88274", "83405", "86475"}
    sel = j[j.ca_zip.str[:5].isin(zips) | j.ws_item_sk.isin([2, 3, 5, 7, 11, 13, 17, 19, 23, 29])]
    g = (sel.groupby(["ca_zip", "ca_city"]).ws_sales_price.sum().reset_index()
         .sort_values(["ca_zip", "ca_city"], kind="stable").head(100))
    np.testing.assert_array_equal(out["ca_zip"], g.ca_zip.values)
    np.testing.assert_array_equal(out["total"], g.ws_sales_price.values.astype(np.int64))


def test_q60(sess, data):
    out = sess.collect(tpcds.q60())
    dt = df(data, "date_dim")
    dtf = dt[(dt.d_year == 2000) & (dt.d_moy == 9)]
    it = df(data, "item")
    itf = it[it.i_category == "Music"]
    ca = df(data, "customer_address")
    caf = ca[ca.ca_gmt_offset == -6]
    c = df(data, "customer")
    parts = []
    for fact, icol, ccol, dcol, pcol in [
        ("store_sales", "ss_item_sk", "ss_customer_sk", "ss_sold_date_sk", "ss_ext_sales_price"),
        ("catalog_sales", "cs_item_sk", "cs_bill_customer_sk", "cs_sold_date_sk", "cs_ext_sales_price"),
        ("web_sales", "ws_item_sk", "ws_bill_customer_sk", "ws_sold_date_sk", "ws_ext_sales_price"),
    ]:
        f = df(data, fact)
        j = (f.merge(dtf, left_on=dcol, right_on="d_date_sk")
             .merge(itf, left_on=icol, right_on="i_item_sk")
             .merge(c, left_on=ccol, right_on="c_customer_sk")
             .merge(caf, left_on="c_current_addr_sk", right_on="ca_address_sk"))
        parts.append(j.groupby("i_item_id")[pcol].sum().reset_index(name="t"))
    allp = pd.concat(parts)
    g = (allp.groupby("i_item_id").t.sum().reset_index()
         .sort_values(["i_item_id", "t"], kind="stable").head(100))
    np.testing.assert_array_equal(out["i_item_id"], g.i_item_id.values)
    np.testing.assert_array_equal(out["total_sales"], g.t.values.astype(np.int64))
