"""TPC-DS subset differential tests (q3, q34, q95) with skewed join keys —
exercises join fan-out re-planning under Zipf-distributed fact keys."""

import numpy as np
import pandas as pd
import pytest

from datafusion_comet_tpu.exec.engine import Session
from datafusion_comet_tpu.models import tpcds

SF = 0.02
ALL = ["date_dim", "item", "store", "household_demographics", "customer",
       "store_sales", "web_sales", "web_returns"]


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


def test_q3(sess, data):
    out = sess.collect(tpcds.q3())
    ss, dt, it = df(data, "store_sales"), df(data, "date_dim"), df(data, "item")
    j = ss.merge(dt[dt.d_moy == 11], left_on="ss_sold_date_sk", right_on="d_date_sk").merge(
        it[it.i_manufact_id == 128], left_on="ss_item_sk", right_on="i_item_sk"
    )
    g = (
        j.groupby(["d_year", "i_brand_id", "i_brand"]).ss_ext_sales_price.sum().reset_index()
        .sort_values(["d_year", "ss_ext_sales_price", "i_brand_id"], ascending=[True, False, True], kind="stable")
        .head(100)
    )
    np.testing.assert_array_equal(out["d_year"], g.d_year.values)
    np.testing.assert_array_equal(out["sum_agg"], g.ss_ext_sales_price.values.astype(np.int64))
    np.testing.assert_array_equal(out["i_brand_id"], g.i_brand_id.values)


def test_q34(sess, data):
    out = sess.collect(tpcds.q34())
    ss, dt, st, hd, c = (df(data, x) for x in
                         ("store_sales", "date_dim", "store", "household_demographics", "customer"))
    dtf = dt[(((dt.d_dom >= 1) & (dt.d_dom <= 3)) | ((dt.d_dom >= 25) & (dt.d_dom <= 28)))
             & dt.d_year.isin([1999, 2000, 2001])]
    hdf = hd[
        hd.hd_buy_potential.isin([">10000", "Unknown"])
        & (hd.hd_vehicle_count > 0)
        & (hd.hd_dep_count / hd.hd_vehicle_count.where(hd.hd_vehicle_count > 0, 1) > 1.2)
    ]
    stf = st[st.s_county.isin([f"county {i}" for i in range(4)])]
    j = (
        ss.merge(dtf, left_on="ss_sold_date_sk", right_on="d_date_sk")
        .merge(stf, left_on="ss_store_sk", right_on="s_store_sk")
        .merge(hdf, left_on="ss_hdemo_sk", right_on="hd_demo_sk")
    )
    per = j.groupby(["ss_ticket_number", "ss_customer_sk"]).size().reset_index(name="cnt")
    per = per[(per.cnt >= 15) & (per.cnt <= 20)]
    jj = per.merge(c, left_on="ss_customer_sk", right_on="c_customer_sk")
    g = jj.sort_values(
        ["c_last_name", "c_first_name", "c_salutation", "c_preferred_cust_flag", "ss_ticket_number"],
        ascending=[True, True, True, False, True], kind="stable",
    )
    np.testing.assert_array_equal(out["ss_ticket_number"], g.ss_ticket_number.values)
    np.testing.assert_array_equal(out["cnt"], g.cnt.values)


def test_q95(sess, data):
    out = sess.collect(tpcds.q95())
    ws, dt, wr = df(data, "web_sales"), df(data, "date_dim"), df(data, "web_returns")
    dtf = dt[(dt.d_year == 1999) & (dt.d_moy >= 2) & (dt.d_moy <= 3)]
    j = ws.merge(dtf, left_on="ws_ship_date_sk", right_on="d_date_sk")
    wh_per_order = ws.groupby("ws_order_number").ws_warehouse_sk.nunique()
    multi_orders = set(wh_per_order[wh_per_order > 1].index)
    returned = set(wr.wr_order_number)
    sel = j[j.ws_order_number.isin(multi_orders) & j.ws_order_number.isin(returned)]
    order_count = sel.ws_order_number.nunique()
    assert int(out["order_count"][0]) == order_count
    assert int(out["total_shipping_cost"][0]) == int(sel.ws_ext_ship_cost.sum())
    assert int(out["total_net_profit"][0]) == int(sel.ws_net_profit.sum())
