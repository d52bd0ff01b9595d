"""TPC-DS expansion: window family (q44, q47, q51, q53, q57, q63, q89) —
deviation-from-average filters, lag/lead chains, cumulative races,
two-sided rankings (reference: CometWindowExec surface)."""

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


def _dev_oracle(data, group_key, time_col):
    ss, dt, it, st = (df(data, x) for x in ("store_sales", "date_dim", "item", "store"))
    j = (ss.merge(dt[(dt.d_month_seq >= 12) & (dt.d_month_seq <= 23)],
                  left_on="ss_sold_date_sk", right_on="d_date_sk")
         .merge(it[it.i_category.isin(["Books", "Home", "Sports"])],
                left_on="ss_item_sk", right_on="i_item_sk")
         .merge(st, left_on="ss_store_sk", right_on="s_store_sk"))
    g = j.groupby([group_key, time_col]).ss_sales_price.sum().reset_index(name="sum_sales")
    g["avg"] = g.groupby(group_key).sum_sales.transform("mean") / 100.0
    g["val"] = g.sum_sales / 100.0
    g = g[(g["avg"] > 0) & ((g.val - g["avg"]).abs() / g["avg"] > 0.1)]
    return g


@pytest.mark.parametrize("qname,group_key,time_col", [
    ("q53", "i_manufact_id", "d_qoy"),
    ("q63", "i_manager_id", "d_moy"),
])
def test_deviation(sess, data, qname, group_key, time_col):
    out = sess.collect(tpcds.QUERIES[qname]())
    o = _dev_oracle(data, group_key, time_col)
    o = o.sort_values(["avg", "sum_sales", group_key, time_col], kind="stable").head(100)
    o = o.rename(columns={"avg": "avg_period_sales"})
    cols = [group_key, time_col, "sum_sales", "avg_period_sales"]
    assert canon(out, cols) == canon_df(o, cols)


def test_q89(sess, data):
    out = sess.collect(tpcds.q89())
    ss, dt, it, st = (df(data, x) for x in ("store_sales", "date_dim", "item", "store"))
    j = (ss.merge(dt[dt.d_year == 2000], left_on="ss_sold_date_sk", right_on="d_date_sk")
         .merge(it[it.i_category.isin(["Books", "Electronics", "Sports",
                                       "Men", "Jewelry", "Women"])],
                left_on="ss_item_sk", right_on="i_item_sk")
         .merge(st, left_on="ss_store_sk", right_on="s_store_sk"))
    keys = ["i_category", "i_class", "i_brand", "s_store_name", "s_county", "d_moy"]
    g = j.groupby(keys).ss_sales_price.sum().reset_index(name="sum_sales")
    g["avg_monthly_sales"] = g.groupby(
        ["i_category", "i_brand", "s_store_name", "s_county"]
    ).sum_sales.transform("mean") / 100.0
    g["val"] = g.sum_sales / 100.0
    g = g[(g.avg_monthly_sales != 0)
          & ((g.val - g.avg_monthly_sales).abs() / g.avg_monthly_sales > 0.1)]
    g["diff"] = g.val - g.avg_monthly_sales
    g = g.sort_values(["diff", "s_store_name", "i_category", "i_class", "i_brand", "d_moy"],
                      kind="stable").head(100)
    cols = keys + ["sum_sales", "avg_monthly_sales"]
    assert canon(out, cols) == canon_df(g, cols)


@pytest.mark.parametrize("qname,fact,date_col,item_col,price_col,ent,ent_key,fact_key,ent_name", [
    ("q47", "store_sales", "ss_sold_date_sk", "ss_item_sk", "ss_sales_price",
     "store", "s_store_sk", "ss_store_sk", "s_store_name"),
    ("q57", "catalog_sales", "cs_sold_date_sk", "cs_item_sk", "cs_sales_price",
     "call_center", "cc_call_center_sk", "cs_call_center_sk", "cc_name"),
])
def test_lag_lead(sess, data, qname, fact, date_col, item_col, price_col,
                  ent, ent_key, fact_key, ent_name):
    out = sess.collect(tpcds.QUERIES[qname]())
    f, dt, it, en = df(data, fact), df(data, "date_dim"), df(data, "item"), df(data, ent)
    j = (f.merge(dt[dt.d_year.isin([1999, 2000, 2001])], left_on=date_col, right_on="d_date_sk")
         .merge(it, left_on=item_col, right_on="i_item_sk")
         .merge(en, left_on=fact_key, right_on=ent_key))
    keys = ["i_category", "i_brand", ent_name, "d_year", "d_moy"]
    g = j.groupby(keys)[price_col].sum().reset_index(name="sum_sales")
    part = ["i_category", "i_brand", ent_name]
    g["avg_yearly"] = g.groupby(part + ["d_year"]).sum_sales.transform("mean") / 100.0
    g = g.sort_values(part + ["d_year", "d_moy"], kind="stable")
    g["psum"] = g.groupby(part).sum_sales.shift(1)
    g["nsum"] = g.groupby(part).sum_sales.shift(-1)
    g["val"] = g.sum_sales / 100.0
    g = g[(g.d_year == 2000) & (g.avg_yearly > 0)
          & ((g.val - g.avg_yearly).abs() / g.avg_yearly > 0.1)]
    g["diff"] = g.val - g.avg_yearly
    g = g.sort_values(["diff", "i_category", "i_brand", ent_name, "d_moy"],
                      kind="stable").head(100)
    cols = keys + ["sum_sales", "avg_yearly", "psum", "nsum"]
    assert canon(out, cols) == canon_df(g, cols)


def test_q51(sess, data):
    out = sess.collect(tpcds.q51())
    ws, ss, dt = (df(data, x) for x in ("web_sales", "store_sales", "date_dim"))
    dtf = dt[(dt.d_month_seq >= 12) & (dt.d_month_seq <= 23)]

    def side(f, item, date, price):
        j = f.merge(dtf, left_on=date, right_on="d_date_sk")
        return j.groupby([item, "d_date_sk"])[price].sum().reset_index(name="part")

    w = side(ws, "ws_item_sk", "ws_sold_date_sk", "ws_sales_price").rename(
        columns={"ws_item_sk": "item_sk"})
    s = side(ss, "ss_item_sk", "ss_sold_date_sk", "ss_sales_price").rename(
        columns={"ss_item_sk": "item_sk"})
    w["web_cum"] = w.sort_values("d_date_sk").groupby("item_sk").part.cumsum()
    s["store_cum"] = s.sort_values("d_date_sk").groupby("item_sk").part.cumsum()
    m = w[["item_sk", "d_date_sk", "web_cum"]].merge(
        s[["item_sk", "d_date_sk", "store_cum"]], on=["item_sk", "d_date_sk"], how="outer")
    m = m.fillna({"web_cum": 0, "store_cum": 0}).sort_values(
        ["item_sk", "d_date_sk"], kind="stable")
    m["web_max"] = m.groupby("item_sk").web_cum.cummax()
    m["store_max"] = m.groupby("item_sk").store_cum.cummax()
    m = m[m.web_max > m.store_max].sort_values(["item_sk", "d_date_sk"]).head(100)
    cols = ["item_sk", "d_date_sk", "web_max", "store_max"]
    assert canon(out, cols) == canon_df(m, cols)


def test_q44(sess, data):
    out = sess.collect(tpcds.q44())
    ss, it = df(data, "store_sales"), df(data, "item")
    v = (ss[ss.ss_store_sk == 4].groupby("ss_item_sk").ss_net_profit.mean()
         .reset_index(name="rank_col"))
    v = v.sort_values(["rank_col", "ss_item_sk"], kind="stable").reset_index(drop=True)
    v["rnk_asc"] = np.arange(1, len(v) + 1)
    vd = v.sort_values(["rank_col", "ss_item_sk"], ascending=[False, True],
                       kind="stable").reset_index(drop=True)
    vd["rnk_desc"] = np.arange(1, len(vd) + 1)
    names = it.set_index("i_item_sk").i_product_name
    best = vd[vd.rnk_desc <= 10].set_index("rnk_desc").ss_item_sk.map(names)
    worst = v[v.rnk_asc <= 10].set_index("rnk_asc").ss_item_sk.map(names)
    o = pd.DataFrame({"rnk": range(1, 11),
                      "best_performing": [best.get(i) for i in range(1, 11)],
                      "worst_performing": [worst.get(i) for i in range(1, 11)]})
    cols = ["rnk", "best_performing", "worst_performing"]
    assert canon(out, cols) == canon_df(o, cols)
