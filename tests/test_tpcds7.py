"""TPC-DS expansion: correlated-subquery / semi / anti / existence family
(q1, q6, q8, q10, q13, q16, q30, q32, q35, q48, q69, q81, q85, q92, q93,
q94). Correlated averages decorrelate to aggregate+join; EXISTS/NOT EXISTS
lower to semi/anti/existence joins (reference: planner.rs join lowering)."""

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


def canon(rows_dict, cols):
    n = len(next(iter(rows_dict.values())))
    out = []
    for i in range(n):
        row = []
        for c in cols:
            v = rows_dict[c][i]
            ok = rows_dict.get(f"{c}__valid")
            if ok is not None and not ok[i]:
                v = None
            if isinstance(v, (np.floating, float)):
                v = round(float(v), 9)
            elif v is not None and not isinstance(v, str):
                v = int(v)
            row.append(v)
        out.append(tuple(row))
    return sorted(out, key=lambda t: tuple((x is not None, x) for x in t))


def canon_df(frame, cols):
    out = []
    for _, r in frame.iterrows():
        row = []
        for c in cols:
            v = r[c]
            if v is None or (isinstance(v, float) and np.isnan(v)):
                v = None
            elif isinstance(v, (np.floating, float)):
                v = round(float(v), 9)
            elif not isinstance(v, str):
                v = int(v)
            row.append(v)
        out.append(tuple(row))
    return sorted(out, key=lambda t: tuple((x is not None, x) for x in t))


def test_q1(sess, data):
    out = sess.collect(tpcds.q1())
    sr, dt, st, c = (df(data, x) for x in ("store_returns", "date_dim", "store", "customer"))
    j = sr.merge(dt[dt.d_year == 2000], left_on="sr_returned_date_sk", right_on="d_date_sk")
    ctr = j.groupby(["sr_customer_sk", "sr_store_sk"]).sr_return_amt.sum().reset_index(
        name="ctr")
    ctr["avg"] = ctr.groupby("sr_store_sk").ctr.transform("mean") / 100.0
    keep = ctr[(ctr.ctr / 100.0) > 1.2 * ctr["avg"]]
    keep = keep.merge(st[st.s_state == "TN"], left_on="sr_store_sk", right_on="s_store_sk")
    keep = keep.merge(c, left_on="sr_customer_sk", right_on="c_customer_sk")
    o = keep.sort_values("c_customer_id", kind="stable").head(100)
    assert canon(out, ["c_customer_id"]) == canon_df(o, ["c_customer_id"])


def test_q6(sess, data):
    out = sess.collect(tpcds.q6())
    dt, it, ss, c, ca = (df(data, x) for x in
                         ("date_dim", "item", "store_sales", "customer", "customer_address"))
    seqs = set(dt[(dt.d_year == 1999) & (dt.d_moy == 5)].d_month_seq)
    dtf = dt[dt.d_month_seq.isin(seqs)]
    cat_avg = it.groupby("i_category").i_current_price.mean().rename("cat_avg")
    itj = it.join(cat_avg, on="i_category")
    itf = itj[itj.i_current_price > 1.2 * itj.cat_avg]
    j = (ss.merge(dtf, left_on="ss_sold_date_sk", right_on="d_date_sk")
         .merge(itf, left_on="ss_item_sk", right_on="i_item_sk")
         .merge(c, left_on="ss_customer_sk", right_on="c_customer_sk")
         .merge(ca, left_on="c_current_addr_sk", right_on="ca_address_sk"))
    g = j.groupby("ca_state").size().reset_index(name="cnt")
    g = g[g.cnt >= 3].sort_values(["cnt", "ca_state"], kind="stable").head(100)
    assert canon(out, ["ca_state", "cnt"]) == canon_df(g, ["ca_state", "cnt"])


def test_q8(sess, data):
    out = sess.collect(tpcds.q8())
    ca, c, st, ss, dt = (df(data, x) for x in
                         ("customer_address", "customer", "store", "store_sales", "date_dim"))
    prefixes = {f"{a}{b}" for a in range(1, 10) for b in range(0, 5)}
    a1 = set(z[:5] for z in ca.ca_zip if z[:2] in prefixes)
    pref = c[c.c_preferred_cust_flag == "Y"].merge(
        ca, left_on="c_current_addr_sk", right_on="ca_address_sk")
    cnt = pref.groupby(pref.ca_zip.str[:5]).size()
    a2 = set(cnt[cnt > 1].index)
    zip2 = {z[:2] for z in (a1 & a2)}
    stf = st[st.s_zip.str[:2].isin(zip2)]
    j = (ss.merge(dt[(dt.d_qoy == 2) & (dt.d_year == 1998)],
                  left_on="ss_sold_date_sk", right_on="d_date_sk")
         .merge(stf, left_on="ss_store_sk", right_on="s_store_sk"))
    g = j.groupby("s_store_name").ss_net_profit.sum().reset_index(name="net_profit")
    g = g.sort_values("s_store_name", kind="stable").head(100)
    assert canon(out, ["s_store_name", "net_profit"]) == canon_df(g, ["s_store_name", "net_profit"])


def _active_oracle(data, mode):
    dt, ss, ws, cs, c = (df(data, x) for x in
                         ("date_dim", "store_sales", "web_sales", "catalog_sales", "customer"))
    dsk = set(dt[(dt.d_year == 1999) & (dt.d_moy >= 1) & (dt.d_moy <= 4)].d_date_sk)
    ss_c = set(ss[ss.ss_sold_date_sk.isin(dsk)].ss_customer_sk)
    ws_c = set(ws[ws.ws_sold_date_sk.isin(dsk)].ws_bill_customer_sk)
    cs_c = set(cs[cs.cs_sold_date_sk.isin(dsk)].cs_bill_customer_sk)
    cf = c[c.c_customer_sk.isin(ss_c)]
    if mode == "either":
        return cf[cf.c_customer_sk.isin(ws_c | cs_c)]
    return cf[~cf.c_customer_sk.isin(ws_c) & ~cf.c_customer_sk.isin(cs_c)]


def test_q10(sess, data):
    out = sess.collect(tpcds.q10())
    ca, cd = df(data, "customer_address"), df(data, "customer_demographics")
    cf = _active_oracle(data, "either")
    counties = [f"county {i}" for i in range(5)]
    j = (cf.merge(ca[ca.ca_county.isin(counties)],
                  left_on="c_current_addr_sk", right_on="ca_address_sk")
         .merge(cd, left_on="c_current_cdemo_sk", right_on="cd_demo_sk"))
    keys = ["cd_gender", "cd_marital_status", "cd_education_status",
            "cd_purchase_estimate", "cd_credit_rating"]
    g = j.groupby(keys).size().reset_index(name="cnt")
    g = g.sort_values(keys, kind="stable").head(100)
    assert canon(out, keys + ["cnt"]) == canon_df(g, keys + ["cnt"])


def test_q35(sess, data):
    out = sess.collect(tpcds.q35())
    ca, cd = df(data, "customer_address"), df(data, "customer_demographics")
    cf = _active_oracle(data, "either")
    j = (cf.merge(ca, left_on="c_current_addr_sk", right_on="ca_address_sk")
         .merge(cd, left_on="c_current_cdemo_sk", right_on="cd_demo_sk"))
    keys = ["ca_state", "cd_gender", "cd_marital_status", "cd_dep_count",
            "cd_dep_employed_count", "cd_dep_college_count"]
    g = j.groupby(keys).agg(
        cnt1=("c_customer_sk", "size"), max_dep=("cd_dep_count", "max"),
        sum_emp=("cd_dep_employed_count", "sum"), avg_col=("cd_dep_college_count", "mean"),
    ).reset_index()
    g = g.sort_values(keys, kind="stable").head(100)
    cols = keys + ["cnt1", "max_dep", "sum_emp", "avg_col"]
    assert canon(out, cols) == canon_df(g, cols)


def test_q69(sess, data):
    out = sess.collect(tpcds.q69())
    ca, cd = df(data, "customer_address"), df(data, "customer_demographics")
    cf = _active_oracle(data, "neither")
    j = (cf.merge(ca[ca.ca_state.isin(["CA", "TX", "NY"])],
                  left_on="c_current_addr_sk", right_on="ca_address_sk")
         .merge(cd, left_on="c_current_cdemo_sk", right_on="cd_demo_sk"))
    keys = ["cd_gender", "cd_marital_status", "cd_education_status",
            "cd_purchase_estimate", "cd_credit_rating"]
    g = j.groupby(keys).size().reset_index(name="cnt")
    g = g.sort_values(keys, kind="stable").head(100)
    assert canon(out, keys + ["cnt"]) == canon_df(g, keys + ["cnt"])


def _bands_frame(data, year):
    ss, dt, st, cd, hd, ca = (df(data, x) for x in
                              ("store_sales", "date_dim", "store", "customer_demographics",
                               "household_demographics", "customer_address"))
    j = (ss.merge(dt[dt.d_year == year], left_on="ss_sold_date_sk", right_on="d_date_sk")
         .merge(st, left_on="ss_store_sk", right_on="s_store_sk")
         .merge(cd, left_on="ss_cdemo_sk", right_on="cd_demo_sk")
         .merge(ca, left_on="ss_addr_sk", right_on="ca_address_sk"))
    return j.merge(df(data, "household_demographics"),
                   left_on="ss_hdemo_sk", right_on="hd_demo_sk")


def test_q13(sess, data):
    out = sess.collect(tpcds.q13())
    j = _bands_frame(data, 2001)
    demo = (
        ((j.cd_marital_status == "M")
         & j.ss_sales_price.between(0, 15000) & j.hd_dep_count.between(0, 4))
        | ((j.cd_marital_status == "S")
           & j.ss_sales_price.between(5000, 20000) & j.hd_dep_count.between(1, 6))
        | ((j.cd_marital_status == "W")
           & j.ss_sales_price.between(2500, 17500) & j.hd_dep_count.between(3, 9))
    )
    addr = (
        (j.ca_state.isin(["CA", "TX"]) & j.ss_net_profit.between(-50000, 100000))
        | (j.ca_state.isin(["NY", "FL"]) & j.ss_net_profit.between(0, 200000))
        | (j.ca_state.isin(["WA", "GA"]) & j.ss_net_profit.between(5000, 150000))
    )
    f = j[demo & addr]
    assert float(out["avg_qty"][0]) == pytest.approx(f.ss_quantity.mean(), rel=1e-12)
    assert float(out["avg_esp"][0]) == pytest.approx(f.ss_ext_sales_price.mean() / 100, rel=1e-12)
    assert float(out["avg_ewc"][0]) == pytest.approx(f.ss_ext_wholesale_cost.mean() / 100, rel=1e-12)
    assert int(out["sum_ewc"][0]) == int(f.ss_ext_wholesale_cost.sum())


def test_q48(sess, data):
    out = sess.collect(tpcds.q48())
    ss, dt, st, cd, ca = (df(data, x) for x in
                          ("store_sales", "date_dim", "store", "customer_demographics",
                           "customer_address"))
    j = (ss.merge(dt[dt.d_year == 2000], left_on="ss_sold_date_sk", right_on="d_date_sk")
         .merge(st, left_on="ss_store_sk", right_on="s_store_sk")
         .merge(cd, left_on="ss_cdemo_sk", right_on="cd_demo_sk")
         .merge(ca, left_on="ss_addr_sk", right_on="ca_address_sk"))
    demo = (
        ((j.cd_marital_status == "M") & (j.cd_education_status == "4 yr Degree")
         & j.ss_sales_price.between(10000, 15000))
        | ((j.cd_marital_status == "D") & (j.cd_education_status == "Secondary")
           & j.ss_sales_price.between(5000, 10000))
        | ((j.cd_marital_status == "S") & (j.cd_education_status == "College")
           & j.ss_sales_price.between(15000, 20000))
    )
    addr = (
        (j.ca_state.isin(["CA", "TX"]) & j.ss_net_profit.between(0, 200000))
        | (j.ca_state.isin(["NY", "FL"]) & j.ss_net_profit.between(15000, 30000))
        | (j.ca_state.isin(["WA", "GA"]) & j.ss_net_profit.between(5000, 25000))
    )
    f = j[demo & addr]
    assert int(out["total_qty"][0]) == int(f.ss_quantity.sum())


@pytest.mark.parametrize("qname,fact,date_col,item_col,disc_col,manufact", [
    ("q32", "catalog_sales", "cs_sold_date_sk", "cs_item_sk", "cs_ext_discount_amt", 77),
    ("q92", "web_sales", "ws_sold_date_sk", "ws_item_sk", "ws_ext_discount_amt", 35),
])
def test_excess_discount(sess, data, qname, fact, date_col, item_col, disc_col, manufact):
    out = sess.collect(tpcds.QUERIES[qname]())
    f, dt, it = df(data, fact), df(data, "date_dim"), df(data, "item")
    j = (f.merge(dt[(dt.d_date_sk >= 100) & (dt.d_date_sk <= 190)],
                 left_on=date_col, right_on="d_date_sk")
         .merge(it[it.i_manufact_id == manufact], left_on=item_col, right_on="i_item_sk"))
    j["avg"] = j.groupby(item_col)[disc_col].transform("mean") / 100.0
    keep = j[(j[disc_col] / 100.0) > 1.3 * j["avg"]]
    got = out[disc_col.replace(disc_col, "excess_discount")][0]
    got = None if not out["excess_discount__valid"][0] else int(got)
    want = None if keep.empty else int(keep[disc_col].sum())
    assert got == want


@pytest.mark.parametrize("qname,rfact,cust_col,date_col,amt_col,states", [
    ("q30", "web_returns", "wr_returning_customer_sk", "wr_returned_date_sk",
     "wr_return_amt", ["CA", "TX", "NY", "FL"]),
    ("q81", "catalog_returns", "cr_returning_customer_sk", "cr_returned_date_sk",
     "cr_return_amount", ["TX", "WA", "GA", "IL"]),
])
def test_returns_above_state_avg(sess, data, qname, rfact, cust_col, date_col,
                                 amt_col, states):
    out = sess.collect(tpcds.QUERIES[qname]())
    r, dt, c, ca = (df(data, x) for x in (rfact, "date_dim", "customer", "customer_address"))
    j = (r.merge(dt[dt.d_year.isin([1999, 2000, 2001])], left_on=date_col, right_on="d_date_sk")
         .merge(c, left_on=cust_col, right_on="c_customer_sk")
         .merge(ca, left_on="c_current_addr_sk", right_on="ca_address_sk"))
    ctr = j.groupby([cust_col, "ca_state"])[amt_col].sum().reset_index(name="ctr")
    ctr["avg"] = ctr.groupby("ca_state").ctr.transform("mean") / 100.0
    keep = ctr[(ctr.ctr / 100.0) > 1.2 * ctr["avg"]]
    keep = keep.merge(c, left_on=cust_col, right_on="c_customer_sk")
    keep = keep.merge(ca[ca.ca_state.isin(states)].rename(columns={"ca_state": "home_state"}),
                      left_on="c_current_addr_sk", right_on="ca_address_sk")
    o = keep.rename(columns={"ctr": "ctr_total_return"}).sort_values(
        ["c_customer_id", "ctr_total_return"], kind="stable").head(100)
    cols = ["c_customer_id", "c_salutation", "c_first_name", "c_last_name",
            "ctr_total_return"]
    assert canon(out, cols) == canon_df(o, cols)


@pytest.mark.parametrize("qname,fact,order_col,wh_col,rfact,rorder,date_col,addr_col,state,ship,profit", [
    ("q16", "catalog_sales", "cs_order_number", "cs_warehouse_sk", "catalog_returns",
     "cr_order_number", "cs_ship_date_sk", "cs_ship_addr_sk", "GA",
     "cs_ext_ship_cost", "cs_net_profit"),
    ("q94", "web_sales", "ws_order_number", "ws_warehouse_sk", "web_returns",
     "wr_order_number", "ws_ship_date_sk", "ws_ship_addr_sk", "IL",
     "ws_ext_ship_cost", "ws_net_profit"),
])
def test_multi_warehouse(sess, data, qname, fact, order_col, wh_col, rfact, rorder,
                         date_col, addr_col, state, ship, profit):
    out = sess.collect(tpcds.QUERIES[qname]())
    f, r, ca = df(data, fact), df(data, rfact), df(data, "customer_address")
    multi = set(f.groupby(order_col)[wh_col].nunique().loc[lambda s: s >= 2].index)
    returned = set(r[rorder])
    j = f[(f[date_col] >= 60) & (f[date_col] <= 120)]
    j = j.merge(ca[ca.ca_state == state], left_on=addr_col, right_on="ca_address_sk")
    j = j[j[order_col].isin(multi) & ~j[order_col].isin(returned)]
    assert int(out["order_count"][0]) == j[order_col].nunique()
    if len(j):
        assert int(out["total_shipping_cost"][0]) == int(j[ship].sum())
        assert int(out["total_net_profit"][0]) == int(j[profit].sum())


def test_q85(sess, data):
    out = sess.collect(tpcds.q85())
    wr, ws, dt, wp, re_, cd = (df(data, x) for x in
                               ("web_returns", "web_sales", "date_dim", "web_page",
                                "reason", "customer_demographics"))
    wra = wr.groupby(["wr_item_sk", "wr_order_number", "wr_reason_sk",
                      "wr_refunded_cash", "wr_web_page_sk"]
                     ).wr_return_quantity.sum().reset_index(name="ret_qty")
    j = ws.merge(wra, left_on=["ws_item_sk", "ws_order_number"],
                 right_on=["wr_item_sk", "wr_order_number"])
    j = (j.merge(dt[dt.d_year == 2000], left_on="ws_sold_date_sk", right_on="d_date_sk")
         .merge(wp, left_on="ws_web_page_sk", right_on="wp_web_page_sk")
         .merge(re_, left_on="wr_reason_sk", right_on="r_reason_sk")
         .merge(cd, left_on="ws_bill_customer_sk", right_on="cd_demo_sk"))
    band = (
        ((j.cd_marital_status == "M") & j.ws_sales_price.between(0, 15000))
        | ((j.cd_marital_status == "S") & j.ws_sales_price.between(5000, 20000))
        | ((j.cd_marital_status == "W") & j.ws_sales_price.between(2500, 17500))
    )
    f = j[band]
    g = f.groupby("r_reason_desc").agg(
        avg_qty=("ws_quantity", "mean"), avg_refund=("wr_refunded_cash", "mean"),
        avg_ret_qty=("ret_qty", "mean")).reset_index()
    g["avg_refund"] = g.avg_refund / 100.0
    g = g.sort_values(["r_reason_desc", "avg_qty"], kind="stable").head(100)
    cols = ["r_reason_desc", "avg_qty", "avg_refund", "avg_ret_qty"]
    assert canon(out, cols) == canon_df(g, cols)


def test_q93(sess, data):
    out = sess.collect(tpcds.q93())
    ss, sr, re_ = df(data, "store_sales"), df(data, "store_returns"), df(data, "reason")
    rsk = set(re_[re_.r_reason_desc == "reason 3"].r_reason_sk)
    sra = (sr[sr.sr_reason_sk.isin(rsk)]
           .groupby(["sr_item_sk", "sr_ticket_number"])
           .sr_return_quantity.sum().reset_index(name="ret_qty"))
    j = ss.merge(sra, left_on=["ss_item_sk", "ss_ticket_number"],
                 right_on=["sr_item_sk", "sr_ticket_number"])
    j["act"] = (j.ss_quantity - j.ret_qty) * j.ss_sales_price
    g = j.groupby("ss_customer_sk").act.sum().reset_index(name="sumsales")
    g = g.sort_values(["sumsales", "ss_customer_sk"], kind="stable").head(100)
    cols = ["ss_customer_sk", "sumsales"]
    assert canon(out, cols) == canon_df(g, cols)
