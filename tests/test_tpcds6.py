"""TPC-DS expansion: multi-channel UNION family (q5, q33, q56, q71, q75,
q76, q80, q97) — per-channel subplans unioned, returns folded in via
pre-aggregated joins, channel/id rollups."""

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


def _channel_oracle(data, fact, date_col, item_col, addr_col, price_col, group_col, item_mask):
    f, dt, ca, it = (df(data, x) for x in (fact, "date_dim", "customer_address", "item"))
    j = (f.merge(dt[(dt.d_year == 1998) & (dt.d_moy == 5)], left_on=date_col, right_on="d_date_sk")
         .merge(ca[ca.ca_gmt_offset == -5], left_on=addr_col, right_on="ca_address_sk")
         .merge(it[item_mask(it)], left_on=item_col, right_on="i_item_sk"))
    return j.groupby(group_col)[price_col].sum().reset_index(name="total_sales")


def _three_channel_oracle(data, group_col, item_mask):
    parts = [
        _channel_oracle(data, "store_sales", "ss_sold_date_sk", "ss_item_sk",
                        "ss_addr_sk", "ss_ext_sales_price", group_col, item_mask),
        _channel_oracle(data, "catalog_sales", "cs_sold_date_sk", "cs_item_sk",
                        "cs_ship_addr_sk", "cs_ext_sales_price", group_col, item_mask),
        _channel_oracle(data, "web_sales", "ws_sold_date_sk", "ws_item_sk",
                        "ws_ship_addr_sk", "ws_ext_sales_price", group_col, item_mask),
    ]
    u = pd.concat(parts, ignore_index=True)
    g = u.groupby(group_col).total_sales.sum().reset_index()
    return g.sort_values(["total_sales", group_col], kind="stable").head(100)


def test_q33(sess, data):
    out = sess.collect(tpcds.q33())
    o = _three_channel_oracle(data, "i_manufact_id", lambda it: it.i_category == "Electronics")
    cols = ["i_manufact_id", "total_sales"]
    assert canon(out, cols) == canon_df(o, cols)


def test_q56(sess, data):
    out = sess.collect(tpcds.q56())
    o = _three_channel_oracle(
        data, "i_item_id", lambda it: it.i_color.isin(["navy", "olive", "plum"]))
    cols = ["i_item_id", "total_sales"]
    assert canon(out, cols) == canon_df(o, cols)


def test_q71(sess, data):
    out = sess.collect(tpcds.q71())
    dt = df(data, "date_dim")
    dtf = dt[(dt.d_year == 1999) & (dt.d_moy == 11)]
    it = df(data, "item")
    itf = it[it.i_manager_id == 1]
    td = df(data, "time_dim")
    tdf = td[td.t_hour.isin([8, 9, 17, 18])]
    parts = []
    for fact, date_col, item_col, time_col, price_col in [
        ("web_sales", "ws_sold_date_sk", "ws_item_sk", "ws_sold_time_sk", "ws_ext_sales_price"),
        ("catalog_sales", "cs_sold_date_sk", "cs_item_sk", "cs_sold_time_sk", "cs_ext_sales_price"),
        ("store_sales", "ss_sold_date_sk", "ss_item_sk", "ss_sold_time_sk", "ss_ext_sales_price"),
    ]:
        f = df(data, fact).merge(dtf, left_on=date_col, right_on="d_date_sk")
        parts.append(f[[item_col, time_col, price_col]].rename(
            columns={item_col: "sold_item_sk", time_col: "time_sk", price_col: "ext_price"}))
    u = pd.concat(parts, ignore_index=True)
    j = (u.merge(itf, left_on="sold_item_sk", right_on="i_item_sk")
         .merge(tdf, left_on="time_sk", right_on="t_time_sk"))
    g = j.groupby(["i_brand_id", "i_brand", "t_hour", "t_minute"]
                  ).ext_price.sum().reset_index()
    g = g.sort_values(["ext_price", "i_brand_id", "t_hour", "t_minute"],
                      ascending=[False, True, True, True], kind="stable").head(100)
    cols = ["i_brand_id", "i_brand", "t_hour", "t_minute", "ext_price"]
    assert canon(out, cols) == canon_df(g, cols)


def rollup2(frame, k1, k2, aggspec):
    frames = []
    for lvl, kept in enumerate([[k1, k2], [k1], []]):
        if kept:
            g = frame.groupby(kept).agg(**aggspec).reset_index()
        else:
            g = frame.groupby(lambda _: 0).agg(**aggspec).reset_index(drop=True)
        for k in [k1, k2][len(kept):]:
            g[k] = None
        g["lochierarchy"] = lvl
        frames.append(g)
    return pd.concat(frames, ignore_index=True)


def test_q5(sess, data):
    out = sess.collect(tpcds.q5())
    dt = df(data, "date_dim")
    dtf = dt[(dt.d_month_seq >= 12) & (dt.d_month_seq <= 13)]
    dsk = set(dtf.d_date_sk)
    rows = []
    ss, sr, st = df(data, "store_sales"), df(data, "store_returns"), df(data, "store")
    for _, r in ss[ss.ss_sold_date_sk.isin(dsk)].merge(
            st, left_on="ss_store_sk", right_on="s_store_sk").iterrows():
        rows.append(("store channel", r.s_store_id, r.ss_ext_sales_price, 0,
                     r.ss_net_profit, 0))
    for _, r in sr[sr.sr_returned_date_sk.isin(dsk)].merge(
            st, left_on="sr_store_sk", right_on="s_store_sk").iterrows():
        rows.append(("store channel", r.s_store_id, 0, r.sr_return_amt, 0, r.sr_net_loss))
    cs, cr, cp = df(data, "catalog_sales"), df(data, "catalog_returns"), df(data, "catalog_page")
    for _, r in cs[cs.cs_sold_date_sk.isin(dsk)].merge(
            cp, left_on="cs_catalog_page_sk", right_on="cp_catalog_page_sk").iterrows():
        rows.append(("catalog channel", r.cp_catalog_page_id, r.cs_ext_sales_price, 0,
                     r.cs_net_profit, 0))
    for _, r in cr[cr.cr_returned_date_sk.isin(dsk)].merge(
            cp, left_on="cr_catalog_page_sk", right_on="cp_catalog_page_sk").iterrows():
        rows.append(("catalog channel", r.cp_catalog_page_id, 0, r.cr_return_amount, 0,
                     r.cr_net_loss))
    ws, wr, web = df(data, "web_sales"), df(data, "web_returns"), df(data, "web_site")
    for _, r in ws[ws.ws_sold_date_sk.isin(dsk)].merge(
            web, left_on="ws_web_site_sk", right_on="web_site_sk").iterrows():
        rows.append(("web channel", r.web_name, r.ws_ext_sales_price, 0, r.ws_net_profit, 0))
    wra = (wr[wr.wr_returned_date_sk.isin(dsk)]
           .groupby(["wr_item_sk", "wr_order_number"])
           .agg(ret_amt=("wr_return_amt", "sum"), ret_loss=("wr_net_loss", "sum"))
           .reset_index())
    ws_sites = (ws.groupby(["ws_item_sk", "ws_order_number", "ws_web_site_sk"])
                .size().reset_index(name="n"))
    wrj = wra.merge(ws_sites, left_on=["wr_item_sk", "wr_order_number"],
                    right_on=["ws_item_sk", "ws_order_number"]).merge(
        web, left_on="ws_web_site_sk", right_on="web_site_sk")
    for _, r in wrj.iterrows():
        rows.append(("web channel", r.web_name, 0, r.ret_amt, 0, r.ret_loss))
    u = pd.DataFrame(rows, columns=["channel", "id", "sales", "returns_amt",
                                    "profit", "profit_loss"])
    u["net_profit"] = u.profit - u.profit_loss
    o = rollup2(u, "channel", "id",
                dict(sales=("sales", "sum"), returns_amt=("returns_amt", "sum"),
                     profit=("net_profit", "sum")))
    o = o.sort_values(
        ["channel", "id"], kind="stable",
        key=lambda s: s.map(lambda v: "\x00" if v is None else "\x01" + str(v))
        if s.dtype == object else s,
    ).head(100)
    cols = ["channel", "id", "lochierarchy", "sales", "returns_amt", "profit"]
    assert canon(out, cols) == canon_df(o, cols)


def test_q75(sess, data):
    out = sess.collect(tpcds.q75())
    dt, it = df(data, "date_dim"), df(data, "item")
    itf = it[it.i_category == "Books"]
    parts = []
    for fact, date_col, item_col, qty_col, price_col, rfact, rkeys, fkeys, rqty, ramt in [
        ("catalog_sales", "cs_sold_date_sk", "cs_item_sk", "cs_quantity",
         "cs_ext_sales_price", "catalog_returns",
         ["cr_item_sk", "cr_order_number"], ["cs_item_sk", "cs_order_number"],
         "cr_return_quantity", "cr_return_amount"),
        ("store_sales", "ss_sold_date_sk", "ss_item_sk", "ss_quantity",
         "ss_ext_sales_price", "store_returns",
         ["sr_item_sk", "sr_ticket_number"], ["ss_item_sk", "ss_ticket_number"],
         "sr_return_quantity", "sr_return_amt"),
        ("web_sales", "ws_sold_date_sk", "ws_item_sk", "ws_quantity",
         "ws_ext_sales_price", "web_returns",
         ["wr_item_sk", "wr_order_number"], ["ws_item_sk", "ws_order_number"],
         "wr_return_quantity", "wr_return_amt"),
    ]:
        f, r = df(data, fact), df(data, rfact)
        ragg = r.groupby(rkeys).agg(r_qty=(rqty, "sum"), r_amt=(ramt, "sum")).reset_index()
        j = f.merge(ragg, left_on=fkeys, right_on=rkeys, how="left")
        j = (j.merge(dt, left_on=date_col, right_on="d_date_sk")
             .merge(itf, left_on=item_col, right_on="i_item_sk"))
        j["sales_cnt"] = j[qty_col] - j.r_qty.fillna(0)
        j["sales_amt"] = j[price_col] - j.r_amt.fillna(0)
        parts.append(j[["d_year", "i_brand_id", "i_class", "i_category",
                        "i_manufact_id", "sales_cnt", "sales_amt"]])
    u = pd.concat(parts, ignore_index=True)
    g = u.groupby(["d_year", "i_brand_id", "i_class", "i_category", "i_manufact_id"]
                  ).agg(sales_cnt=("sales_cnt", "sum"),
                        sales_amt=("sales_amt", "sum")).reset_index()
    curr = g[g.d_year == 2000]
    prev = g[g.d_year == 1999]
    m = curr.merge(prev, on=["i_brand_id", "i_class", "i_category", "i_manufact_id"],
                   suffixes=("_c", "_p"))
    m = m[(m.sales_cnt_p > 0) & (m.sales_cnt_c / m.sales_cnt_p < 0.9)]
    m["d"] = m.sales_cnt_c - m.sales_cnt_p
    m = m.sort_values(["d", "i_brand_id", "i_class", "i_manufact_id"],
                      kind="stable").head(100)
    m = m.rename(columns={"i_brand_id": "c_brand", "i_class": "c_class",
                          "i_manufact_id": "c_man", "sales_cnt_c": "curr_cnt",
                          "sales_cnt_p": "prev_cnt", "sales_amt_c": "curr_amt",
                          "sales_amt_p": "prev_amt"})
    cols = ["c_brand", "c_class", "c_man", "curr_cnt", "prev_cnt", "curr_amt", "prev_amt"]
    assert canon(out, cols) == canon_df(m, cols)


def test_q76(sess, data):
    out = sess.collect(tpcds.q76())
    dt, it = df(data, "date_dim"), df(data, "item")
    parts = []
    for name, col_name, fact, predfn, item_col, date_col, price_col in [
        ("store", "ss_hdemo_sk", "store_sales", lambda f: f.ss_hdemo_sk <= 10,
         "ss_item_sk", "ss_sold_date_sk", "ss_ext_sales_price"),
        ("web", "ws_ship_mode_sk", "web_sales", lambda f: f.ws_ship_mode_sk == 1,
         "ws_item_sk", "ws_sold_date_sk", "ws_ext_sales_price"),
        ("catalog", "cs_warehouse_sk", "catalog_sales", lambda f: f.cs_warehouse_sk == 1,
         "cs_item_sk", "cs_sold_date_sk", "cs_ext_sales_price"),
    ]:
        f = df(data, fact)
        j = (f[predfn(f)].merge(it, left_on=item_col, right_on="i_item_sk")
             .merge(dt, left_on=date_col, right_on="d_date_sk"))
        j = j.assign(channel=name, col_name=col_name)
        parts.append(j[["channel", "col_name", "d_year", "d_qoy", "i_category",
                        price_col]].rename(columns={price_col: "p"}))
    u = pd.concat(parts, ignore_index=True)
    g = u.groupby(["channel", "col_name", "d_year", "d_qoy", "i_category"]
                  ).agg(sales_cnt=("p", "size"), sales_amt=("p", "sum")).reset_index()
    g = g.sort_values(["channel", "col_name", "d_year", "d_qoy", "i_category"],
                      kind="stable").head(100)
    cols = ["channel", "col_name", "d_year", "d_qoy", "i_category",
            "sales_cnt", "sales_amt"]
    assert canon(out, cols) == canon_df(g, cols)


def test_q80(sess, data):
    out = sess.collect(tpcds.q80())
    dt, it, pr = df(data, "date_dim"), df(data, "item"), df(data, "promotion")
    dtf = dt[(dt.d_month_seq >= 12) & (dt.d_month_seq <= 13)]
    itf = it[it.i_current_price > 5000]
    prf = pr[pr.p_channel_tv == "N"]
    parts = []
    for (name, fact, date_col, item_col, promo_col, id_join, id_scan, id_key,
         id_out, sales_col, profit_col, rfact, rkeys, fkeys, ramt, rloss) in [
        ("store channel", "store_sales", "ss_sold_date_sk", "ss_item_sk",
         "ss_promo_sk", "ss_store_sk", "store", "s_store_sk", "s_store_id",
         "ss_ext_sales_price", "ss_net_profit", "store_returns",
         ["sr_item_sk", "sr_ticket_number"], ["ss_item_sk", "ss_ticket_number"],
         "sr_return_amt", "sr_net_loss"),
        ("catalog channel", "catalog_sales", "cs_sold_date_sk", "cs_item_sk",
         "cs_promo_sk", "cs_catalog_page_sk", "catalog_page", "cp_catalog_page_sk",
         "cp_catalog_page_id", "cs_ext_sales_price", "cs_net_profit", "catalog_returns",
         ["cr_item_sk", "cr_order_number"], ["cs_item_sk", "cs_order_number"],
         "cr_return_amount", "cr_net_loss"),
    ]:
        f, r, idt = df(data, fact), df(data, rfact), df(data, id_scan)
        ragg = r.groupby(rkeys).agg(r_amt=(ramt, "sum"), r_loss=(rloss, "sum")).reset_index()
        j = f.merge(ragg, left_on=fkeys, right_on=rkeys, how="left")
        j = (j.merge(dtf, left_on=date_col, right_on="d_date_sk")
             .merge(itf, left_on=item_col, right_on="i_item_sk")
             .merge(prf, left_on=promo_col, right_on="p_promo_sk")
             .merge(idt, left_on=id_join, right_on=id_key))
        j = j.assign(channel=name, id=j[id_out],
                     sales=j[sales_col],
                     returns_amt=j.r_amt.fillna(0),
                     profit=j[profit_col] - j.r_loss.fillna(0))
        parts.append(j[["channel", "id", "sales", "returns_amt", "profit"]])
    u = pd.concat(parts, ignore_index=True)
    o = rollup2(u, "channel", "id",
                dict(sales=("sales", "sum"), returns_amt=("returns_amt", "sum"),
                     profit=("profit", "sum")))
    o = o.sort_values(
        ["channel", "id"], kind="stable",
        key=lambda s: s.map(lambda v: "\x00" if v is None else "\x01" + str(v))
        if s.dtype == object else s,
    ).head(100)
    cols = ["channel", "id", "lochierarchy", "sales", "returns_amt", "profit"]
    assert canon(out, cols) == canon_df(o, cols)


def test_q97(sess, data):
    out = sess.collect(tpcds.q97())
    ss, cs, dt = df(data, "store_sales"), df(data, "catalog_sales"), df(data, "date_dim")
    dsk = set(dt[(dt.d_month_seq >= 12) & (dt.d_month_seq <= 23)].d_date_sk)
    a = set(map(tuple, ss[ss.ss_sold_date_sk.isin(dsk)][
        ["ss_customer_sk", "ss_item_sk"]].drop_duplicates().values))
    b = set(map(tuple, cs[cs.cs_sold_date_sk.isin(dsk)][
        ["cs_bill_customer_sk", "cs_item_sk"]].drop_duplicates().values))
    assert int(out["store_only"][0]) == len(a - b)
    assert int(out["catalog_only"][0]) == len(b - a)
    assert int(out["store_and_catalog"][0]) == len(a & b)
