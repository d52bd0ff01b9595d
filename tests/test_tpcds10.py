"""TPC-DS final-breadth family (q14, q23, q24, q41, q46, q49, q54, q58, q77,
q78, q83, q90) — cross-channel intersections with scalar benchmarks,
frequent-item/best-customer thresholds, return-ratio rankings, channel
profit rollups, and traffic ratios. Differential oracles in pandas, same
discipline as tests/test_tpcds*.py."""

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
                v = round(float(v), 6)
            elif v is not None and not isinstance(v, str):
                v = int(v)
            row.append(v)
        out.append(tuple(row))
    return sorted(out, key=lambda t: tuple((x is not None, str(x)) for x in t))


def canon_df(frame, cols):
    out = []
    for _, r in frame.iterrows():
        row = []
        for c in cols:
            v = r[c]
            if v is None or (isinstance(v, float) and np.isnan(v)):
                v = None
            elif isinstance(v, (np.floating, float)):
                v = round(float(v), 6)
            elif not isinstance(v, str):
                v = int(v)
            row.append(v)
        out.append(tuple(row))
    return sorted(out, key=lambda t: tuple((x is not None, str(x)) for x in t))


def test_q41(sess, data):
    out = sess.collect(tpcds.q41())
    it = df(data, "item")
    women = it[(it.i_category == "Women") & it.i_color.isin(["red", "blue", "navy", "plum"])]
    men = it[(it.i_category == "Men") & it.i_color.isin(["black", "white", "olive", "salmon"])]
    manus = set(women.i_manufact) | set(men.i_manufact)
    keep = it[it.i_manufact_id.between(100, 600) & it.i_manufact.isin(manus)]
    names = sorted(set(keep.i_product_name))[:100]
    g = pd.DataFrame({"i_product_name": names})
    assert canon(out, ["i_product_name"]) == canon_df(g, ["i_product_name"])


def test_q90(sess, data):
    out = sess.collect(tpcds.q90())
    ws, td, wp = df(data, "web_sales"), df(data, "time_dim"), df(data, "web_page")
    pages = set(wp[wp.wp_char_count.between(2500, 5000)].wp_web_page_sk)

    def half(lo, hi):
        hrs = set(td[td.t_hour.between(lo, hi)].t_time_sk)
        return int((ws.ws_sold_time_sk.isin(hrs) & ws.ws_web_page_sk.isin(pages)).sum())

    g = pd.DataFrame({"am_pm_ratio": [half(6, 7) / half(14, 15)]})
    assert canon(out, ["am_pm_ratio"]) == canon_df(g, ["am_pm_ratio"])


def test_q46(sess, data):
    out = sess.collect(tpcds.q46())
    ss, dt, st, hd, ca, cu = (df(data, x) for x in
                              ("store_sales", "date_dim", "store",
                               "household_demographics", "customer_address", "customer"))
    dts = dt[dt.d_dow.isin([0, 6]) & dt.d_year.isin([1999, 2000, 2001])]
    stf = st[st.s_city.isin(["city0", "city2"])]
    hdf = hd[(hd.hd_dep_count == 4) | (hd.hd_vehicle_count == 3)]
    j = (ss.merge(dts, left_on="ss_sold_date_sk", right_on="d_date_sk")
         .merge(stf, left_on="ss_store_sk", right_on="s_store_sk")
         .merge(hdf, left_on="ss_hdemo_sk", right_on="hd_demo_sk")
         .merge(ca, left_on="ss_addr_sk", right_on="ca_address_sk"))
    per = j.groupby(["ss_ticket_number", "ss_customer_sk", "ca_city"]).agg(
        amt=("ss_coupon_amt", "sum"), profit=("ss_net_profit", "sum")).reset_index()
    per = per.rename(columns={"ca_city": "bought_city"})
    cur = ca[["ca_address_sk", "ca_city"]].rename(
        columns={"ca_address_sk": "cur_addr", "ca_city": "current_city"})
    j2 = (per.merge(cu, left_on="ss_customer_sk", right_on="c_customer_sk")
          .merge(cur, left_on="c_current_addr_sk", right_on="cur_addr"))
    j2 = j2[j2.bought_city != j2.current_city]
    g = j2.sort_values(["c_last_name", "c_first_name", "bought_city", "ss_ticket_number"],
                       kind="stable").head(100)
    cols = ["c_last_name", "c_first_name", "bought_city", "ss_ticket_number", "amt", "profit"]
    assert canon(out, cols) == canon_df(g, cols)


def test_q58(sess, data):
    out = sess.collect(tpcds.q58())
    dt = df(data, "date_dim")
    week = set(dt[dt.d_week_seq.between(1, 40)].d_date_sk)
    it = df(data, "item")

    def chan(fact, date_col, item_col, qty_col, name):
        f = df(data, fact)
        j = f[f[date_col].isin(week)].merge(it, left_on=item_col, right_on="i_item_sk")
        return j.groupby("i_item_id")[qty_col].apply(
            lambda x: float(np.float64(x.astype(np.float64).sum()) / len(x))).rename(name)

    ssr = chan("store_sales", "ss_sold_date_sk", "ss_item_sk", "ss_quantity", "ss_item_rev")
    csr = chan("catalog_sales", "cs_sold_date_sk", "cs_item_sk", "cs_quantity", "cs_item_rev")
    wsr = chan("web_sales", "ws_sold_date_sk", "ws_item_sk", "ws_quantity", "ws_item_rev")
    j = pd.concat([ssr, csr, wsr], axis=1, join="inner").reset_index()
    s, c, w = j.ss_item_rev, j.cs_item_rev, j.ws_item_rev
    m = ((s >= 0.8 * c) & (s <= 1.25 * c) & (s >= 0.8 * w) & (s <= 1.25 * w)
         & (c >= 0.8 * s) & (c <= 1.25 * s) & (c >= 0.8 * w) & (c <= 1.25 * w)
         & (w >= 0.8 * s) & (w <= 1.25 * s) & (w >= 0.8 * c) & (w <= 1.25 * c))
    j = j.assign(average=(s + c + w) / 3.0)[m]
    g = j.sort_values("i_item_id", kind="stable").head(100)
    cols = ["i_item_id", "ss_item_rev", "cs_item_rev", "ws_item_rev", "average"]
    assert canon(out, cols) == canon_df(g, cols)


def test_q83(sess, data):
    out = sess.collect(tpcds.q83())
    dt = df(data, "date_dim")
    weeks = set(dt[dt.d_week_seq.between(1, 50)].d_date_sk)
    it = df(data, "item")

    def chan(fact, date_col, item_col, qty_col, name):
        f = df(data, fact)
        j = f[f[date_col].isin(weeks)].merge(it, left_on=item_col, right_on="i_item_sk")
        return j.groupby("i_item_id")[qty_col].sum().astype(np.int64).rename(name)

    sr = chan("store_returns", "sr_returned_date_sk", "sr_item_sk", "sr_return_quantity", "sr_items")
    cr = chan("catalog_returns", "cr_returned_date_sk", "cr_item_sk", "cr_return_quantity", "cr_items")
    wr = chan("web_returns", "wr_returned_date_sk", "wr_item_sk", "wr_return_quantity", "wr_items")
    j = pd.concat([sr, cr, wr], axis=1, join="inner").reset_index()
    total = (j.sr_items + j.cr_items + j.wr_items).astype(float)
    j = j.assign(sr_dev=j.sr_items / total * 300.0, cr_dev=j.cr_items / total * 300.0,
                 wr_dev=j.wr_items / total * 300.0, average=total / 3.0)
    g = j.sort_values(["i_item_id", "sr_items"], kind="stable").head(100)
    cols = ["i_item_id", "sr_items", "sr_dev", "cr_items", "cr_dev",
            "wr_items", "wr_dev", "average"]
    assert canon(out, cols) == canon_df(g, cols)


def test_q77(sess, data):
    out = sess.collect(tpcds.q77())
    dt = df(data, "date_dim")
    window = set(dt[dt.d_date_sk.between(700, 760)].d_date_sk)

    def agg(fact, date_col, key, cols):
        f = df(data, fact)
        f = f[f[date_col].isin(window)]
        if key is None:
            return {o: f[c].sum() for c, o in cols}
        g = f.groupby(key).agg(**{o: (c, "sum") for c, o in cols}).reset_index()
        return g

    ss = agg("store_sales", "ss_sold_date_sk", "ss_store_sk",
             [("ss_ext_sales_price", "sales"), ("ss_net_profit", "profit")])
    sr = agg("store_returns", "sr_returned_date_sk", "sr_store_sk",
             [("sr_return_amt", "returns_amt"), ("sr_net_loss", "profit_loss")])
    store = ss.merge(sr, left_on="ss_store_sk", right_on="sr_store_sk", how="left")
    store = pd.DataFrame({
        "channel": "store channel", "id": store.ss_store_sk, "sales": store.sales,
        "returns_amt": store.returns_amt.fillna(0),
        "profit": store.profit - store.profit_loss.fillna(0)})

    cs = agg("catalog_sales", "cs_sold_date_sk", "cs_call_center_sk",
             [("cs_ext_sales_price", "sales"), ("cs_net_profit", "profit")])
    cr = agg("catalog_returns", "cr_returned_date_sk", None,
             [("cr_return_amount", "returns_amt"), ("cr_net_loss", "profit_loss")])
    catalog = pd.DataFrame({
        "channel": "catalog channel", "id": cs.cs_call_center_sk, "sales": cs.sales,
        "returns_amt": cr["returns_amt"],
        "profit": cs.profit - cr["profit_loss"]})

    ws = agg("web_sales", "ws_sold_date_sk", "ws_web_page_sk",
             [("ws_ext_sales_price", "sales"), ("ws_net_profit", "profit")])
    wr = agg("web_returns", "wr_returned_date_sk", "wr_web_page_sk",
             [("wr_return_amt", "returns_amt"), ("wr_net_loss", "profit_loss")])
    web = ws.merge(wr, left_on="ws_web_page_sk", right_on="wr_web_page_sk", how="left")
    web = pd.DataFrame({
        "channel": "web channel", "id": web.ws_web_page_sk, "sales": web.sales,
        "returns_amt": web.returns_amt.fillna(0),
        "profit": web.profit - web.profit_loss.fillna(0)})

    u = pd.concat([store, catalog, web], ignore_index=True)
    levels = [u.assign(lochierarchy=0)]
    lvl1 = u.groupby("channel", as_index=False).agg(
        sales=("sales", "sum"), returns_amt=("returns_amt", "sum"),
        profit=("profit", "sum")).assign(id=None, lochierarchy=1)
    lvl2 = pd.DataFrame({"channel": [None], "id": [None],
                         "sales": [u.sales.sum()], "returns_amt": [u.returns_amt.sum()],
                         "profit": [u.profit.sum()], "lochierarchy": [2]})
    # level 0 still needs grouping by (channel, id) in case of duplicate ids
    lvl0 = u.groupby(["channel", "id"], as_index=False).agg(
        sales=("sales", "sum"), returns_amt=("returns_amt", "sum"),
        profit=("profit", "sum")).assign(lochierarchy=0)
    full = pd.concat([lvl0, lvl1, lvl2], ignore_index=True)
    full = full.sort_values(["lochierarchy", "channel", "id"],
                            ascending=[False, True, True], kind="stable",
                            na_position="first").head(100)
    cols = ["channel", "id", "lochierarchy", "sales", "returns_amt", "profit"]
    assert canon(out, cols) == canon_df(full, cols)


def test_q54(sess, data):
    out = sess.collect(tpcds.q54())
    dt, it, cs, ws, ss = (df(data, x) for x in
                          ("date_dim", "item", "catalog_sales", "web_sales", "store_sales"))
    month = set(dt[dt.d_month_seq == 20].d_date_sk)
    items = set(it[it.i_category == "Women"].i_item_sk)
    custs = set(cs[cs.cs_sold_date_sk.isin(month) & cs.cs_item_sk.isin(items)].cs_bill_customer_sk)
    custs |= set(ws[ws.ws_sold_date_sk.isin(month) & ws.ws_item_sk.isin(items)].ws_bill_customer_sk)
    follow = set(dt[dt.d_month_seq.between(21, 23)].d_date_sk)
    mine = ss[ss.ss_sold_date_sk.isin(follow) & ss.ss_customer_sk.isin(custs)]
    rev = mine.assign(d=mine.ss_ext_sales_price // 100).groupby("ss_customer_sk").d.sum()
    seg = (rev.astype(float) / 5000.0).astype(np.int32)
    g = seg.value_counts().rename_axis("segment").reset_index(name="num_customers")
    g["segment_base"] = g.segment * 5000
    g = g.sort_values(["segment", "num_customers"], kind="stable").head(100)
    cols = ["segment", "num_customers", "segment_base"]
    assert canon(out, cols) == canon_df(g, cols)


def test_q78(sess, data):
    out = sess.collect(tpcds.q78())
    dt = df(data, "date_dim")
    yr = set(dt[dt.d_year == 2000].d_date_sk)

    def chan(fact, ret, skeys, rkeys, date_col, item_col, cust_col, qty, price, prefix):
        f, r = df(data, fact), df(data, ret)
        m = f.merge(r[rkeys].drop_duplicates(), left_on=skeys, right_on=rkeys,
                    how="left", indicator=True)
        f = m[m._merge == "left_only"]
        f = f[f[date_col].isin(yr)]
        g = f.groupby([item_col, cust_col]).agg(
            **{f"{prefix}_qty": (qty, "sum"), f"{prefix}_sp": (price, "sum")}).reset_index()
        return g

    ss = chan("store_sales", "store_returns", ["ss_ticket_number", "ss_item_sk"],
              ["sr_ticket_number", "sr_item_sk"], "ss_sold_date_sk",
              "ss_item_sk", "ss_customer_sk", "ss_quantity", "ss_sales_price", "ss")
    ws = chan("web_sales", "web_returns", ["ws_order_number", "ws_item_sk"],
              ["wr_order_number", "wr_item_sk"], "ws_sold_date_sk",
              "ws_item_sk", "ws_bill_customer_sk", "ws_quantity", "ws_sales_price", "ws")
    cs = chan("catalog_sales", "catalog_returns", ["cs_order_number", "cs_item_sk"],
              ["cr_order_number", "cr_item_sk"], "cs_sold_date_sk",
              "cs_item_sk", "cs_bill_customer_sk", "cs_quantity", "cs_sales_price", "cs")
    j = ss.merge(ws, left_on=["ss_item_sk", "ss_customer_sk"],
                 right_on=["ws_item_sk", "ws_bill_customer_sk"], how="left")
    j = j.merge(cs, left_on=["ss_item_sk", "ss_customer_sk"],
                right_on=["cs_item_sk", "cs_bill_customer_sk"], how="left")
    other_qty = j.ws_qty.fillna(0) + j.cs_qty.fillna(0)
    j = j.assign(other_chan_qty=other_qty,
                 other_chan_sp=j.ws_sp.fillna(0) + j.cs_sp.fillna(0),
                 ratio=j.ss_qty / other_qty, d_year=2000)
    j = j[other_qty > 0]
    g = j.sort_values(["ss_qty", "ss_item_sk", "ss_customer_sk"],
                      ascending=[False, True, True], kind="stable").head(100)
    cols = ["d_year", "ss_item_sk", "ss_customer_sk", "ratio", "ss_qty",
            "ss_sp", "other_chan_qty", "other_chan_sp"]
    assert canon(out, cols) == canon_df(g, cols)


def test_q49(sess, data):
    out = sess.collect(tpcds.q49())
    dt = df(data, "date_dim")
    win = set(dt[(dt.d_year == 2000) & (dt.d_moy == 12)].d_date_sk)

    def chan(label, fact, ret, skeys, rkeys, date_col, item_col, qty, paid, rqty, ramt):
        f, r = df(data, fact), df(data, ret)
        r = r[r[ramt] > 10000]
        f = f[f[date_col].isin(win)]
        j = f.merge(r, left_on=skeys, right_on=rkeys)
        g = j.groupby(item_col).agg(rq=(rqty, "sum"), sq=(qty, "sum"),
                                    ra=(ramt, "sum"), sa=(paid, "sum")).reset_index()
        g = g.assign(return_ratio=g.rq / g.sq, currency_ratio=g.ra / g.sa)
        g["return_rank"] = g.return_ratio.rank(method="min").astype(int)
        g["currency_rank"] = g.currency_ratio.rank(method="min").astype(int)
        g = g[(g.return_rank <= 10) | (g.currency_rank <= 10)]
        return pd.DataFrame({"channel": label, "item": g[item_col],
                             "return_ratio": g.return_ratio,
                             "return_rank": g.return_rank,
                             "currency_rank": g.currency_rank})

    web = chan("web", "web_sales", "web_returns",
               ["ws_order_number", "ws_item_sk"], ["wr_order_number", "wr_item_sk"],
               "ws_sold_date_sk", "ws_item_sk", "ws_quantity", "ws_net_paid",
               "wr_return_quantity", "wr_return_amt")
    cat = chan("catalog", "catalog_sales", "catalog_returns",
               ["cs_order_number", "cs_item_sk"], ["cr_order_number", "cr_item_sk"],
               "cs_sold_date_sk", "cs_item_sk", "cs_quantity", "cs_ext_sales_price",
               "cr_return_quantity", "cr_return_amount")
    st = chan("store", "store_sales", "store_returns",
              ["ss_ticket_number", "ss_item_sk"], ["sr_ticket_number", "sr_item_sk"],
              "ss_sold_date_sk", "ss_item_sk", "ss_quantity", "ss_net_paid",
              "sr_return_quantity", "sr_return_amt")
    u = pd.concat([web, cat, st], ignore_index=True)
    g = u.sort_values(["channel", "return_rank", "currency_rank", "item"],
                      kind="stable").head(100)
    cols = ["channel", "item", "return_ratio", "return_rank", "currency_rank"]
    assert canon(out, cols) == canon_df(g, cols)


def test_q14(sess, data):
    out = sess.collect(tpcds.q14())
    dt, it = df(data, "date_dim"), df(data, "item")
    yrs = set(dt[dt.d_year.between(1999, 2001)].d_date_sk)

    def keys_of(fact, date_col, item_col):
        f = df(data, fact)
        j = f[f[date_col].isin(yrs)].merge(it, left_on=item_col, right_on="i_item_sk")
        return set(map(tuple, j[["i_brand_id", "i_class", "i_category"]].values))

    common = (keys_of("store_sales", "ss_sold_date_sk", "ss_item_sk")
              & keys_of("catalog_sales", "cs_sold_date_sk", "cs_item_sk")
              & keys_of("web_sales", "ws_sold_date_sk", "ws_item_sk"))
    cross_items = set(
        it[[tuple(k) in common for k in
            it[["i_brand_id", "i_class", "i_category"]].values]].i_item_sk)

    allsales = []
    for fact, date_col, qty, price in [
            ("store_sales", "ss_sold_date_sk", "ss_quantity", "ss_list_price"),
            ("catalog_sales", "cs_sold_date_sk", "cs_quantity", "cs_list_price"),
            ("web_sales", "ws_sold_date_sk", "ws_quantity", "ws_sales_price")]:
        f = df(data, fact)
        f = f[f[date_col].isin(yrs)]
        allsales.append(f[qty].astype(np.int64) * (f[price] // 100).astype(np.int64))
    average_sales = float(pd.concat(allsales).mean())

    nov = set(dt[(dt.d_year == 2001) & (dt.d_moy == 11)].d_date_sk)
    parts = []
    for label, fact, date_col, item_col, qty, price in [
            ("store", "store_sales", "ss_sold_date_sk", "ss_item_sk", "ss_quantity", "ss_list_price"),
            ("catalog", "catalog_sales", "cs_sold_date_sk", "cs_item_sk", "cs_quantity", "cs_list_price"),
            ("web", "web_sales", "ws_sold_date_sk", "ws_item_sk", "ws_quantity", "ws_sales_price")]:
        f = df(data, fact)
        f = f[f[date_col].isin(nov) & f[item_col].isin(cross_items)]
        j = f.merge(it, left_on=item_col, right_on="i_item_sk")
        j = j.assign(sales=j[qty].astype(np.int64) * (j[price] // 100).astype(np.int64))
        g = j.groupby(["i_brand_id", "i_class", "i_category"]).agg(
            sales=("sales", "sum"), number_sales=("sales", "size")).reset_index()
        g = g[g.sales.astype(float) > average_sales].assign(channel=label)
        parts.append(g)
    u = pd.concat(parts, ignore_index=True)

    key_cols = ["channel", "i_brand_id", "i_class", "i_category"]
    levels = []
    for lvl in range(5):
        keep = key_cols[: 4 - lvl]
        if keep:
            g = u.groupby(keep, as_index=False, dropna=False).agg(
                sum_sales=("sales", "sum"), sum_number_sales=("number_sales", "sum"))
        else:
            g = pd.DataFrame({"sum_sales": [u.sales.sum()],
                              "sum_number_sales": [u.number_sales.sum()]})
        for c in key_cols[4 - lvl:]:
            g[c] = None
        g["lochierarchy"] = lvl
        levels.append(g)
    full = pd.concat(levels, ignore_index=True)
    full = full.sort_values(
        ["lochierarchy", "channel", "i_brand_id", "i_class", "i_category"],
        ascending=[False, True, True, True, True], kind="stable",
        na_position="first").head(100)
    cols = key_cols + ["lochierarchy", "sum_sales", "sum_number_sales"]
    assert canon(out, cols) == canon_df(full, cols)


def test_q23(sess, data):
    out = sess.collect(tpcds.q23())
    dt, ss = df(data, "date_dim"), df(data, "store_sales")
    yrs = set(dt[dt.d_year.between(1999, 2001)].d_date_sk)
    f = ss[ss.ss_sold_date_sk.isin(yrs)]
    cnt = f.groupby(["ss_item_sk", "ss_sold_date_sk"]).size()
    freq_items = set(cnt[cnt > 1].reset_index().ss_item_sk)
    csales = (ss.ss_quantity.astype(np.int64) * (ss.ss_sales_price // 100).astype(np.int64)
              ).groupby(ss.ss_customer_sk).sum()
    best = set(csales[csales * 20 > csales.max()].index)
    march = set(dt[(dt.d_year == 2001) & (dt.d_moy == 3)].d_date_sk)
    total = 0
    for fact, date_col, item_col, cust_col, qty, price in [
            ("catalog_sales", "cs_sold_date_sk", "cs_item_sk", "cs_bill_customer_sk",
             "cs_quantity", "cs_list_price"),
            ("web_sales", "ws_sold_date_sk", "ws_item_sk", "ws_bill_customer_sk",
             "ws_quantity", "ws_sales_price")]:
        f = df(data, fact)
        f = f[f[date_col].isin(march) & f[item_col].isin(freq_items)
              & f[cust_col].isin(best)]
        total += int((f[qty].astype(np.int64) * (f[price] // 100).astype(np.int64)).sum())
    g = pd.DataFrame({"sum_sales": [total]})
    assert canon(out, ["sum_sales"]) == canon_df(g, ["sum_sales"])


def test_q24(sess, data):
    out = sess.collect(tpcds.q24())
    ss, sr, st, it, cu, ca = (df(data, x) for x in
                              ("store_sales", "store_returns", "store", "item",
                               "customer", "customer_address"))
    j = (ss.merge(sr[["sr_ticket_number", "sr_item_sk"]],
                  left_on=["ss_ticket_number", "ss_item_sk"],
                  right_on=["sr_ticket_number", "sr_item_sk"])
         .merge(st, left_on="ss_store_sk", right_on="s_store_sk")
         .merge(it, left_on="ss_item_sk", right_on="i_item_sk")
         .merge(cu, left_on="ss_customer_sk", right_on="c_customer_sk")
         .merge(ca, left_on="c_current_addr_sk", right_on="ca_address_sk"))
    j = j[j.ca_zip != j.s_zip]
    ssales = j.groupby(["c_last_name", "c_first_name", "s_store_name", "i_color"]
                       ).ss_net_paid.sum().reset_index(name="netpaid")
    avg_all = float(ssales.netpaid.mean())
    red = ssales[ssales.i_color == "red"]
    red = red[red.netpaid.astype(float) > 0.05 * avg_all]
    g = red.sort_values(["c_last_name", "c_first_name", "s_store_name", "netpaid"],
                        kind="stable").head(100)
    cols = ["c_last_name", "c_first_name", "s_store_name", "netpaid"]
    assert canon(out, cols) == canon_df(g, cols)
