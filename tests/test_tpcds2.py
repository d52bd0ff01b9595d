"""TPC-DS expansion: 17 more queries, each differential-tested against a
pandas oracle mirroring the exact query semantics (decimal columns are scaled
int64 "cents", so sums compare exactly; avgs use half-up integer division at
Spark's result scale)."""

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
    """round-half-up n/d for positive d (matches decimal avg finalization)."""
    n = int(n)
    d = int(d)
    if n >= 0:
        return (2 * n + d) // (2 * d)
    return -((2 * (-n) + d) // (2 * d))


def decimal_avg(series, extra_scale=4):
    return half_up_div(series.sum() * 10**extra_scale, len(series))


def eq(out, name, values):
    np.testing.assert_array_equal(out[name], np.asarray(values))


def test_q7(sess, data):
    out = sess.collect(tpcds.q7())
    ss, cd, dt, pr, it = (df(data, x) for x in
                          ("store_sales", "customer_demographics", "date_dim", "promotion", "item"))
    cdf = cd[(cd.cd_gender == "M") & (cd.cd_marital_status == "S") & (cd.cd_education_status == "College")]
    dtf = dt[dt.d_year == 2000]
    prf = pr[(pr.p_channel_email == "N") | (pr.p_channel_event == "N")]
    j = (ss.merge(cdf, left_on="ss_cdemo_sk", right_on="cd_demo_sk")
         .merge(dtf, left_on="ss_sold_date_sk", right_on="d_date_sk")
         .merge(prf, left_on="ss_promo_sk", right_on="p_promo_sk")
         .merge(it, left_on="ss_item_sk", right_on="i_item_sk"))
    g = j.groupby("i_item_id").agg(
        q=("ss_quantity", "sum"), qn=("ss_quantity", "size"),
        lp=("ss_list_price", "sum"), ca=("ss_coupon_amt", "sum"), sp=("ss_sales_price", "sum"),
    ).reset_index().sort_values("i_item_id", kind="stable").head(100)
    eq(out, "i_item_id", g.i_item_id.values)
    # avg(int32) → double; avg(decimal) → decimal(scale+4) exact half-up
    np.testing.assert_allclose(out["agg1"], g.q.values / g.qn.values, rtol=1e-12)
    eq(out, "agg2", [half_up_div(lp * 10**4, n) for lp, n in zip(g.lp, g.qn)])
    eq(out, "agg3", [half_up_div(ca * 10**4, n) for ca, n in zip(g.ca, g.qn)])
    eq(out, "agg4", [half_up_div(sp * 10**4, n) for sp, n in zip(g.sp, g.qn)])


def test_q15(sess, data):
    out = sess.collect(tpcds.q15())
    cs, c, ca, dt = (df(data, x) for x in ("catalog_sales", "customer", "customer_address", "date_dim"))
    dtf = dt[(dt.d_qoy == 2) & (dt.d_year == 2001)]
    j = (cs.merge(c, left_on="cs_bill_customer_sk", right_on="c_customer_sk")
         .merge(ca, left_on="c_current_addr_sk", right_on="ca_address_sk")
         .merge(dtf, left_on="cs_sold_date_sk", right_on="d_date_sk"))
    sel = j[j.ca_zip.str[:2].isin(["85", "86", "88"]) | j.ca_state.isin(["CA", "WA", "GA"])
            | (j.cs_sales_price > 10000)]
    g = sel.groupby("ca_zip").cs_sales_price.sum().reset_index().sort_values("ca_zip", kind="stable").head(100)
    eq(out, "ca_zip", g.ca_zip.values)
    eq(out, "total", g.cs_sales_price.values.astype(np.int64))


def test_q19(sess, data):
    out = sess.collect(tpcds.q19())
    ss, dt, it, c, ca, st = (df(data, x) for x in
                             ("store_sales", "date_dim", "item", "customer", "customer_address", "store"))
    j = (ss.merge(dt[(dt.d_moy == 11) & (dt.d_year == 1998)], left_on="ss_sold_date_sk", right_on="d_date_sk")
         .merge(it[it.i_manager_id == 8], left_on="ss_item_sk", right_on="i_item_sk")
         .merge(c, left_on="ss_customer_sk", right_on="c_customer_sk")
         .merge(ca, left_on="c_current_addr_sk", right_on="ca_address_sk")
         .merge(st, left_on="ss_store_sk", right_on="s_store_sk"))
    sel = j[j.ca_city != j.s_city]
    g = (sel.groupby(["i_brand_id", "i_brand", "i_manufact_id"]).ss_ext_sales_price.sum()
         .reset_index()
         .sort_values(["ss_ext_sales_price", "i_brand_id"], ascending=[False, True], kind="stable")
         .head(100))
    eq(out, "i_brand_id", g.i_brand_id.values)
    eq(out, "ext_price", g.ss_ext_sales_price.values.astype(np.int64))


def _brand_month_oracle(data, manager, moy, year):
    ss, dt, it = (df(data, x) for x in ("store_sales", "date_dim", "item"))
    j = (ss.merge(dt[(dt.d_moy == moy) & (dt.d_year == year)], left_on="ss_sold_date_sk", right_on="d_date_sk")
         .merge(it[it.i_manager_id == manager], left_on="ss_item_sk", right_on="i_item_sk"))
    return (j.groupby(["d_year", "i_brand_id", "i_brand"]).ss_ext_sales_price.sum().reset_index()
            .sort_values(["d_year", "ss_ext_sales_price", "i_brand_id"],
                         ascending=[True, False, True], kind="stable").head(100))


def test_q52(sess, data):
    out = sess.collect(tpcds.q52())
    g = _brand_month_oracle(data, 1, 12, 2000)
    eq(out, "i_brand_id", g.i_brand_id.values)
    eq(out, "ext_price", g.ss_ext_sales_price.values.astype(np.int64))


def test_q55(sess, data):
    out = sess.collect(tpcds.q55())
    g = _brand_month_oracle(data, 28, 11, 1999)
    eq(out, "i_brand_id", g.i_brand_id.values)
    eq(out, "ext_price", g.ss_ext_sales_price.values.astype(np.int64))


def test_q42(sess, data):
    out = sess.collect(tpcds.q42())
    ss, dt, it = (df(data, x) for x in ("store_sales", "date_dim", "item"))
    j = (ss.merge(dt[(dt.d_moy == 11) & (dt.d_year == 2000)], left_on="ss_sold_date_sk", right_on="d_date_sk")
         .merge(it[it.i_manager_id == 1], left_on="ss_item_sk", right_on="i_item_sk"))
    g = (j.groupby(["d_year", "i_category"]).ss_ext_sales_price.sum().reset_index()
         .sort_values(["ss_ext_sales_price", "d_year", "i_category"],
                      ascending=[False, True, True], kind="stable").head(100))
    eq(out, "i_category", g.i_category.values)
    eq(out, "total", g.ss_ext_sales_price.values.astype(np.int64))


DAYS = ["Sunday", "Monday", "Tuesday", "Wednesday", "Thursday", "Friday", "Saturday"]


def test_q43(sess, data):
    out = sess.collect(tpcds.q43())
    ss, dt, st = (df(data, x) for x in ("store_sales", "date_dim", "store"))
    j = (ss.merge(dt[dt.d_year == 2000], left_on="ss_sold_date_sk", right_on="d_date_sk")
         .merge(st, left_on="ss_store_sk", right_on="s_store_sk"))
    g = j.groupby(["s_store_name", "s_store_id"])
    rows = []
    for (nm, sid), grp in g:
        row = {"s_store_name": nm, "s_store_id": sid}
        for d in DAYS:
            row[f"{d[:3].lower()}_sales"] = int(grp[grp.d_day_name == d].ss_sales_price.sum())
        rows.append(row)
    o = pd.DataFrame(rows).sort_values(["s_store_name", "s_store_id"], kind="stable").head(100)
    for d in DAYS:
        eq(out, f"{d[:3].lower()}_sales", o[f"{d[:3].lower()}_sales"].values)


def _latency_check(out, o, groups):
    for gcol in groups:
        eq(out, gcol, o[gcol].values)
    for b in ["d30", "d31_60", "d61_90", "d91_120", "d120p"]:
        np.testing.assert_array_equal(
            [0 if v is None else v for v in out[b]], o[b].values
        )


def _bucketize(o, lat):
    o["d30"] = (lat <= 30).astype(int)
    o["d31_60"] = ((lat > 30) & (lat <= 60)).astype(int)
    o["d61_90"] = ((lat > 60) & (lat <= 90)).astype(int)
    o["d91_120"] = ((lat > 90) & (lat <= 120)).astype(int)
    o["d120p"] = (lat > 120).astype(int)
    return o


def test_q50(sess, data):
    out = sess.collect(tpcds.q50())
    ss, sr, dt, st = (df(data, x) for x in ("store_sales", "store_returns", "date_dim", "store"))
    j = ss.merge(sr, left_on=["ss_ticket_number", "ss_item_sk", "ss_customer_sk"],
                 right_on=["sr_ticket_number", "sr_item_sk", "sr_customer_sk"])
    rdt = dt[(dt.d_year == 2001) & (dt.d_moy == 8)][["d_date_sk"]]
    j = j.merge(rdt, left_on="sr_returned_date_sk", right_on="d_date_sk")
    j = j.merge(st, left_on="ss_store_sk", right_on="s_store_sk")
    j = _bucketize(j, j.sr_returned_date_sk - j.ss_sold_date_sk)
    g = (j.groupby(["s_store_name", "s_store_id"])[["d30", "d31_60", "d61_90", "d91_120", "d120p"]]
         .sum().reset_index().sort_values(["s_store_name", "s_store_id"], kind="stable").head(100))
    # engine: sum(if(cond,1,null)) → null when no rows matched; oracle 0 ≡ null+0
    _latency_check({k: [0 if v is None else v for v in out[k]] if k.startswith("d") else out[k] for k in out},
                   g, ["s_store_name", "s_store_id"])


def test_q62(sess, data):
    out = sess.collect(tpcds.q62())
    ws, dt, w, sm, wsit = (df(data, x) for x in ("web_sales", "date_dim", "warehouse", "ship_mode", "web_site"))
    j = (ws.merge(dt[(dt.d_month_seq >= 24) & (dt.d_month_seq <= 35)], left_on="ws_ship_date_sk", right_on="d_date_sk")
         .merge(w, left_on="ws_warehouse_sk", right_on="w_warehouse_sk")
         .merge(sm, left_on="ws_ship_mode_sk", right_on="sm_ship_mode_sk")
         .merge(wsit, left_on="ws_web_site_sk", right_on="web_site_sk"))
    j = _bucketize(j, j.ws_ship_date_sk - j.ws_sold_date_sk)
    g = (j.groupby(["w_warehouse_name", "sm_type", "web_name"])[["d30", "d31_60", "d61_90", "d91_120", "d120p"]]
         .sum().reset_index()
         .sort_values(["w_warehouse_name", "sm_type", "web_name"], kind="stable").head(100))
    _latency_check({k: [0 if v is None else v for v in out[k]] if k.startswith("d") else out[k] for k in out},
                   g, ["w_warehouse_name", "sm_type", "web_name"])


def test_q99(sess, data):
    out = sess.collect(tpcds.q99())
    cs, dt, w, sm, cc = (df(data, x) for x in ("catalog_sales", "date_dim", "warehouse", "ship_mode", "call_center"))
    j = (cs.merge(dt[(dt.d_month_seq >= 24) & (dt.d_month_seq <= 35)], left_on="cs_ship_date_sk", right_on="d_date_sk")
         .merge(w, left_on="cs_warehouse_sk", right_on="w_warehouse_sk")
         .merge(sm, left_on="cs_ship_mode_sk", right_on="sm_ship_mode_sk")
         .merge(cc, left_on="cs_call_center_sk", right_on="cc_call_center_sk"))
    j = _bucketize(j, j.cs_ship_date_sk - j.cs_sold_date_sk)
    g = (j.groupby(["w_warehouse_name", "sm_type", "cc_name"])[["d30", "d31_60", "d61_90", "d91_120", "d120p"]]
         .sum().reset_index()
         .sort_values(["w_warehouse_name", "sm_type", "cc_name"], kind="stable").head(100))
    _latency_check({k: [0 if v is None else v for v in out[k]] if k.startswith("d") else out[k] for k in out},
                   g, ["w_warehouse_name", "sm_type", "cc_name"])


def test_q65(sess, data):
    out = sess.collect(tpcds.q65())
    ss, dt, st, it = (df(data, x) for x in ("store_sales", "date_dim", "store", "item"))
    j = ss.merge(dt[(dt.d_month_seq >= 24) & (dt.d_month_seq <= 35)],
                 left_on="ss_sold_date_sk", right_on="d_date_sk")
    per = j.groupby(["ss_store_sk", "ss_item_sk"]).ss_sales_price.sum().reset_index(name="revenue")
    ave = per.groupby("ss_store_sk").revenue.agg(["sum", "size"]).reset_index()
    ave["ave_scaled"] = [half_up_div(s * 10**4, n) for s, n in zip(ave["sum"], ave["size"])]
    m = per.merge(ave[["ss_store_sk", "ave_scaled"]], on="ss_store_sk")
    sel = m[m.revenue / 100.0 <= 0.1 * (m.ave_scaled / 10**6)]
    jj = (sel.merge(st, left_on="ss_store_sk", right_on="s_store_sk")
          .merge(it, left_on="ss_item_sk", right_on="i_item_sk"))
    g = jj.sort_values(["s_store_name", "i_item_desc"], kind="stable").head(100)
    eq(out, "s_store_name", g.s_store_name.values)
    eq(out, "i_item_desc", g.i_item_desc.values)
    eq(out, "revenue", g.revenue.values.astype(np.int64))


def _ticket_oracle(data, date_mask_fn, hd_mask_fn, cnt_lo, cnt_hi):
    ss, dt, st, hd, c = (df(data, x) for x in
                         ("store_sales", "date_dim", "store", "household_demographics", "customer"))
    j = (ss.merge(dt[date_mask_fn(dt)], left_on="ss_sold_date_sk", right_on="d_date_sk")
         .merge(st, left_on="ss_store_sk", right_on="s_store_sk")
         .merge(hd[hd_mask_fn(hd)], left_on="ss_hdemo_sk", right_on="hd_demo_sk"))
    per = j.groupby(["ss_ticket_number", "ss_customer_sk"]).size().reset_index(name="cnt")
    per = per[(per.cnt >= cnt_lo) & (per.cnt <= cnt_hi)]
    return per.merge(c, left_on="ss_customer_sk", right_on="c_customer_sk")


def test_q73(sess, data):
    out = sess.collect(tpcds.q73())
    jj = _ticket_oracle(
        data,
        lambda dt: ((dt.d_dom >= 1) & (dt.d_dom <= 2)) & dt.d_year.isin([1999, 2000, 2001]),
        lambda hd: hd.hd_buy_potential.isin([">10000", "Unknown"]) & (hd.hd_vehicle_count > 0)
        & (hd.hd_dep_count / hd.hd_vehicle_count.where(hd.hd_vehicle_count > 0, 1) > 1.0),
        1, 5,
    )
    g = jj.sort_values(["cnt", "c_last_name", "ss_ticket_number"],
                       ascending=[False, True, True], kind="stable")
    eq(out, "ss_ticket_number", g.ss_ticket_number.values)
    eq(out, "cnt", g.cnt.values)


def test_q79(sess, data):
    out = sess.collect(tpcds.q79())
    ss, dt, st, hd, c = (df(data, x) for x in
                         ("store_sales", "date_dim", "store", "household_demographics", "customer"))
    j = (ss.merge(dt[(dt.d_dow == 1) & dt.d_year.isin([1999, 2000, 2001])],
                  left_on="ss_sold_date_sk", right_on="d_date_sk")
         .merge(st, left_on="ss_store_sk", right_on="s_store_sk")
         .merge(hd[(hd.hd_dep_count == 6) | (hd.hd_vehicle_count > 2)],
                left_on="ss_hdemo_sk", right_on="hd_demo_sk"))
    per = j.groupby(["ss_ticket_number", "ss_customer_sk", "s_city"]).agg(
        amt=("ss_coupon_amt", "sum"), profit=("ss_net_profit", "sum")).reset_index()
    jj = per.merge(c, left_on="ss_customer_sk", right_on="c_customer_sk")
    g = jj.sort_values(["c_last_name", "c_first_name", "s_city", "profit", "ss_ticket_number"],
                       kind="stable").head(100)
    eq(out, "ss_ticket_number", g.ss_ticket_number.values)
    eq(out, "amt", g.amt.values.astype(np.int64))
    eq(out, "profit", g.profit.values.astype(np.int64))


def test_q68(sess, data):
    out = sess.collect(tpcds.q68())
    ss, dt, st, hd, ca, c = (df(data, x) for x in
                             ("store_sales", "date_dim", "store", "household_demographics",
                              "customer_address", "customer"))
    j = (ss.merge(dt[((dt.d_dom >= 1) & (dt.d_dom <= 2)) & dt.d_year.isin([1999, 2000, 2001])],
                  left_on="ss_sold_date_sk", right_on="d_date_sk")
         .merge(st, left_on="ss_store_sk", right_on="s_store_sk")
         .merge(hd[(hd.hd_dep_count == 5) | (hd.hd_vehicle_count == 3)],
                left_on="ss_hdemo_sk", right_on="hd_demo_sk")
         .merge(ca[ca.ca_city.isin(["city0", "city1"])], left_on="ss_addr_sk", right_on="ca_address_sk"))
    per = j.groupby(["ss_ticket_number", "ss_customer_sk", "ca_city"]).agg(
        extended_price=("ss_ext_sales_price", "sum"),
        extended_cost=("ss_ext_wholesale_cost", "sum")).reset_index()
    per = per.rename(columns={"ca_city": "bought_city"})
    jj = per.merge(c, left_on="ss_customer_sk", right_on="c_customer_sk")
    cur = df(data, "customer_address")[["ca_address_sk", "ca_city"]].rename(
        columns={"ca_address_sk": "cur_addr_sk", "ca_city": "cur_city"})
    jj = jj.merge(cur, left_on="c_current_addr_sk", right_on="cur_addr_sk")
    sel = jj[jj.cur_city != jj.bought_city]
    g = sel.sort_values(["c_last_name", "ss_ticket_number"], kind="stable").head(100)
    eq(out, "ss_ticket_number", g.ss_ticket_number.values)
    eq(out, "bought_city", g.bought_city.values)
    eq(out, "extended_price", g.extended_price.values.astype(np.int64))


def test_q96(sess, data):
    out = sess.collect(tpcds.q96())
    ss, td, hd, st = (df(data, x) for x in
                      ("store_sales", "time_dim", "household_demographics", "store"))
    j = (ss.merge(hd[hd.hd_dep_count == 5], left_on="ss_hdemo_sk", right_on="hd_demo_sk")
         .merge(td[(td.t_hour == 20) & (td.t_minute >= 30)], left_on="ss_sold_time_sk", right_on="t_time_sk")
         .merge(st[st.s_store_name == "store_0"], left_on="ss_store_sk", right_on="s_store_sk"))
    assert int(out["cnt"][0]) == len(j)


def test_q90(data):
    s = Session()
    for name, cols in data.items():
        s.register_numpy(name, cols, tpcds.SCHEMAS[name])
    out = s.collect(tpcds.q90_scalar(s))
    ws, td = df(data, "web_sales"), df(data, "time_dim")
    am = len(ws.merge(td[(td.t_hour >= 8) & (td.t_hour <= 9)], left_on="ws_sold_time_sk", right_on="t_time_sk"))
    pm = len(ws.merge(td[(td.t_hour >= 19) & (td.t_hour <= 20)], left_on="ws_sold_time_sk", right_on="t_time_sk"))
    assert out["am_pm_ratio"][0] == pytest.approx(am / pm, rel=1e-12)


def test_q98(sess, data):
    out = sess.collect(tpcds.q98())
    ss, dt, it = (df(data, x) for x in ("store_sales", "date_dim", "item"))
    j = (ss.merge(dt[(dt.d_year == 1999) & (dt.d_moy >= 2) & (dt.d_moy <= 3)],
                  left_on="ss_sold_date_sk", right_on="d_date_sk")
         .merge(it[it.i_category.isin(["Sports", "Books", "Home"])],
                left_on="ss_item_sk", right_on="i_item_sk"))
    g = j.groupby(["i_item_id", "i_item_desc", "i_category", "i_class", "i_current_price"]
                  ).ss_ext_sales_price.sum().reset_index(name="itemrevenue")
    cls = g.groupby("i_class").itemrevenue.transform("sum")
    g["revenueratio"] = g.itemrevenue.astype(float) / 100.0 * 100.0 / (cls.astype(float) / 100.0)
    o = g.sort_values(["i_category", "i_class", "i_item_id", "i_item_desc", "revenueratio"],
                      kind="stable").head(100)
    eq(out, "i_item_id", o.i_item_id.values)
    eq(out, "itemrevenue", o.itemrevenue.values.astype(np.int64))
    np.testing.assert_allclose(out["revenueratio"], o.revenueratio.values, rtol=1e-9)


def test_q25(sess, data):
    out = sess.collect(tpcds.q25())
    ss, sr, cs, dt, st, it = (df(data, x) for x in
                              ("store_sales", "store_returns", "catalog_sales", "date_dim", "store", "item"))
    d1 = set(dt[(dt.d_moy == 4) & (dt.d_year == 2000)].d_date_sk)
    d23 = set(dt[(dt.d_moy >= 4) & (dt.d_moy <= 10) & (dt.d_year == 2000)].d_date_sk)
    j = ss.merge(sr, left_on=["ss_customer_sk", "ss_item_sk", "ss_ticket_number"],
                 right_on=["sr_customer_sk", "sr_item_sk", "sr_ticket_number"])
    j = j.merge(cs, left_on=["ss_customer_sk", "ss_item_sk"],
                right_on=["cs_bill_customer_sk", "cs_item_sk"])
    sel = j[j.ss_sold_date_sk.isin(d1) & j.sr_returned_date_sk.isin(d23) & j.cs_sold_date_sk.isin(d23)]
    sel = (sel.merge(st, left_on="ss_store_sk", right_on="s_store_sk")
           .merge(it, left_on="ss_item_sk", right_on="i_item_sk"))
    g = (sel.groupby(["i_item_id", "i_item_desc", "s_store_id", "s_store_name"]).agg(
        store_sales_profit=("ss_net_profit", "sum"),
        store_returns_loss=("sr_return_amt", "sum"),
        catalog_sales_profit=("cs_net_profit", "sum")).reset_index()
        .sort_values(["i_item_id", "i_item_desc", "s_store_id", "s_store_name"], kind="stable").head(100))
    eq(out, "i_item_id", g.i_item_id.values)
    eq(out, "store_sales_profit", g.store_sales_profit.values.astype(np.int64))
    eq(out, "store_returns_loss", g.store_returns_loss.values.astype(np.int64))
    eq(out, "catalog_sales_profit", g.catalog_sales_profit.values.astype(np.int64))
