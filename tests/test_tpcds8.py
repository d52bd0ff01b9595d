"""TPC-DS expansion: year-over-year self-join family (q2, q4, q11, q31,
q39, q59, q74) — a shared aggregate reused under several filters and
joined against itself (the CTE-reuse pattern)."""

import numpy as np
import pandas as pd
import pytest

from datafusion_comet_tpu.exec.engine import Session
from datafusion_comet_tpu.models import tpcds

SF = 0.02
ALL = list(tpcds.SCHEMAS)
DOW = ["mon", "tue", "wed", "thu", "fri", "sat", "sun"]


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
                v = "NaN" if np.isnan(v) else round(float(v), 9)
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
            if v is None:
                v = None
            elif isinstance(v, (np.floating, float)):
                v = "NaN" if np.isnan(v) else round(float(v), 9)
            elif not isinstance(v, str):
                v = int(v)
            row.append(v)
        out.append(tuple(row))
    return sorted(out, key=lambda t: tuple((x is not None, str(x)) for x in t))


def dow_pivot(j, keys, price):
    g = j.groupby(keys + ["d_dow"])[price].sum().unstack("d_dow")
    g = g.reindex(columns=range(7))
    g.columns = DOW
    return g.reset_index()


def test_q2(sess, data):
    out = sess.collect(tpcds.q2())
    ws, cs, dt = df(data, "web_sales"), df(data, "catalog_sales"), df(data, "date_dim")
    u = pd.concat([
        ws[["ws_sold_date_sk", "ws_ext_sales_price"]].rename(
            columns={"ws_sold_date_sk": "sk", "ws_ext_sales_price": "p"}),
        cs[["cs_sold_date_sk", "cs_ext_sales_price"]].rename(
            columns={"cs_sold_date_sk": "sk", "cs_ext_sales_price": "p"}),
    ], ignore_index=True)
    j = u.merge(dt, left_on="sk", right_on="d_date_sk")
    piv = dow_pivot(j, ["d_week_seq"], "p")
    wk1 = set(dt[dt.d_year == 1999].d_week_seq)
    wk2 = set(dt[dt.d_year == 2000].d_week_seq)
    y1 = piv[piv.d_week_seq.isin(wk1)]
    y2 = piv[piv.d_week_seq.isin(wk2)].copy()
    y2["join_seq"] = y2.d_week_seq - 53
    m = y1.merge(y2, left_on="d_week_seq", right_on="join_seq", suffixes=("_1", "_2"))
    for n in DOW:
        r = m[f"{n}_1"].astype(float) / m[f"{n}_2"].astype(float)
        # missing dow cells are SQL NULLs (sum over empty), not NaNs
        m[f"r_{n}"] = r.astype(object).where(r.notna(), None)
    m = m.rename(columns={"d_week_seq_1": "y1_week_seq"})
    m = m.sort_values("y1_week_seq", kind="stable").head(100)
    cols = ["y1_week_seq"] + [f"r_{n}" for n in DOW]
    assert canon(out, cols) == canon_df(m, cols)


def test_q59(sess, data):
    out = sess.collect(tpcds.q59())
    ss, dt, st = df(data, "store_sales"), df(data, "date_dim"), df(data, "store")
    j = ss.merge(dt, left_on="ss_sold_date_sk", right_on="d_date_sk")
    piv = dow_pivot(j, ["d_week_seq", "ss_store_sk"], "ss_sales_price")
    piv = piv.merge(st, left_on="ss_store_sk", right_on="s_store_sk")
    wk1 = set(dt[dt.d_year == 1999].d_week_seq)
    wk2 = set(dt[dt.d_year == 2000].d_week_seq)
    y = piv[piv.d_week_seq.isin(wk1)]
    x = piv[piv.d_week_seq.isin(wk2)].copy()
    x["join_seq"] = x.d_week_seq - 52
    m = y.merge(x, left_on=["s_store_id", "d_week_seq"],
                right_on=["s_store_id", "join_seq"], suffixes=("_y", "_x"))
    for n in DOW:
        r = m[f"{n}_y"].astype(float) / m[f"{n}_x"].astype(float)
        m[f"r_{n}"] = r.astype(object).where(r.notna(), None)
    m = m.rename(columns={"s_store_name_y": "y_store_name", "d_week_seq_y": "y_week_seq",
                          "s_store_id": "y_store_id"})
    m = m.sort_values(["y_store_name", "y_store_id", "y_week_seq"], kind="stable").head(100)
    cols = ["y_store_name", "y_store_id", "y_week_seq"] + [f"r_{n}" for n in DOW]
    assert canon(out, cols) == canon_df(m, cols)


def _year_total_oracle(data, fact, cust, date_col, valfn, year):
    f, dt = df(data, fact), df(data, "date_dim")
    j = f.merge(dt[dt.d_year == year], left_on=date_col, right_on="d_date_sk")
    j = j.assign(v=valfn(j))
    return j.groupby(cust).v.sum()


def _growth_oracle(data, store_fn, web_fn, cat_fn=None):
    c = df(data, "customer")
    s1 = _year_total_oracle(data, "store_sales", "ss_customer_sk", "ss_sold_date_sk", store_fn, 1999)
    s2 = _year_total_oracle(data, "store_sales", "ss_customer_sk", "ss_sold_date_sk", store_fn, 2000)
    w1 = _year_total_oracle(data, "web_sales", "ws_bill_customer_sk", "ws_sold_date_sk", web_fn, 1999)
    w2 = _year_total_oracle(data, "web_sales", "ws_bill_customer_sk", "ws_sold_date_sk", web_fn, 2000)
    idx = s1.index.intersection(s2.index).intersection(w1.index).intersection(w2.index)
    rows = []
    for cust in idx:
        if s1[cust] <= 0 or w1[cust] <= 0:
            continue
        cond = w2[cust] / w1[cust] > s2[cust] / s1[cust]
        if cat_fn is not None:
            c1 = _year_total_oracle(data, "catalog_sales", "cs_bill_customer_sk",
                                    "cs_sold_date_sk", cat_fn, 1999)
            c2 = _year_total_oracle(data, "catalog_sales", "cs_bill_customer_sk",
                                    "cs_sold_date_sk", cat_fn, 2000)
            if cust not in c1.index or cust not in c2.index or c1[cust] <= 0:
                continue
            cond = cond and (c2[cust] / c1[cust] > s2[cust] / s1[cust])
        if cond:
            rows.append(cust)
    o = c[c.c_customer_sk.isin(rows)].sort_values("c_customer_id", kind="stable").head(100)
    return o


def test_q74(sess, data):
    out = sess.collect(tpcds.q74())
    o = _growth_oracle(data, lambda j: j.ss_net_paid, lambda j: j.ws_net_paid)
    cols = ["c_customer_id", "c_first_name", "c_last_name"]
    assert canon(out, cols) == canon_df(o, cols)


def test_q11(sess, data):
    out = sess.collect(tpcds.q11())
    o = _growth_oracle(data,
                       lambda j: j.ss_ext_list_price - j.ss_ext_discount_amt,
                       lambda j: j.ws_ext_list_price - j.ws_ext_discount_amt)
    cols = ["c_customer_id", "c_first_name", "c_last_name"]
    assert canon(out, cols) == canon_df(o, cols)


def test_q4(sess, data):
    out = sess.collect(tpcds.q4())

    def f(lp, wc, dc, sp):
        # engine decimal div by 2 rounds HALF_UP at scale 8 — growth RATIO
        # comparisons are insensitive to the common /2, so mirror with /2
        return lambda j: (j[lp] - j[wc] - j[dc] + j[sp]) / 2.0

    o = _growth_oracle(
        data,
        f("ss_ext_list_price", "ss_ext_wholesale_cost", "ss_ext_discount_amt", "ss_ext_sales_price"),
        f("ws_ext_list_price", "ws_ext_ship_cost", "ws_ext_discount_amt", "ws_ext_sales_price"),
        f("cs_ext_list_price", "cs_ext_ship_cost", "cs_ext_discount_amt", "cs_ext_sales_price"),
    )
    cols = ["c_customer_id", "c_first_name", "c_last_name"]
    assert canon(out, cols) == canon_df(o, cols)


def test_q31(sess, data):
    out = sess.collect(tpcds.q31())
    dt, ca = df(data, "date_dim"), df(data, "customer_address")

    def arm(fact, date_col, addr_col, price_col, qoy):
        f = df(data, fact)
        j = (f.merge(dt[(dt.d_year == 2000) & (dt.d_qoy == qoy)],
                     left_on=date_col, right_on="d_date_sk")
             .merge(ca, left_on=addr_col, right_on="ca_address_sk"))
        return j.groupby("ca_county")[price_col].sum()

    ss = {q: arm("store_sales", "ss_sold_date_sk", "ss_addr_sk", "ss_ext_sales_price", q)
          for q in (1, 2, 3)}
    ws = {q: arm("web_sales", "ws_sold_date_sk", "ws_ship_addr_sk", "ws_ext_sales_price", q)
          for q in (1, 2, 3)}
    idx = ss[1].index
    for s in list(ss.values())[1:] + list(ws.values()):
        idx = idx.intersection(s.index)
    rows = []
    for county in idx:
        if ss[1][county] <= 0 or ss[2][county] <= 0 or ws[1][county] <= 0 or ws[2][county] <= 0:
            continue
        if (ws[2][county] / ws[1][county] > ss[2][county] / ss[1][county]
                and ws[3][county] / ws[2][county] > ss[3][county] / ss[2][county]):
            rows.append((county,
                         ws[2][county] / ws[1][county], ss[2][county] / ss[1][county],
                         ws[3][county] / ws[2][county], ss[3][county] / ss[2][county]))
    o = pd.DataFrame(rows, columns=["ss1_county", "web_q1_q2_increase",
                                    "store_q1_q2_increase", "web_q2_q3_increase",
                                    "store_q2_q3_increase"])
    o = o.sort_values("ss1_county", kind="stable").head(100)
    cols = list(o.columns)
    assert canon(out, cols) == canon_df(o, cols)


def test_q39(sess, data):
    out = sess.collect(tpcds.q39())
    inv, dt = df(data, "inventory"), df(data, "date_dim")
    j = inv.merge(dt[dt.d_year == 2000], left_on="inv_date_sk", right_on="d_date_sk")
    g = j.groupby(["inv_warehouse_sk", "inv_item_sk", "d_moy"]
                  ).inv_quantity_on_hand.agg(["std", "mean"]).reset_index()
    # Spark NaN-greatest: stddev_samp of a 1-row group is NaN and
    # NaN > 1.0 holds, so single-observation months pass the cov filter
    g = g[(g["mean"] != 0) & (g["std"].isna() | (g["std"] / g["mean"] > 1.0))]
    g["cov"] = g["std"] / g["mean"]
    m = g.merge(g, left_on=["inv_warehouse_sk", "inv_item_sk"],
                right_on=["inv_warehouse_sk", "inv_item_sk"], suffixes=("_1", "_2"))
    m = m[m.d_moy_2 == m.d_moy_1 + 1]
    m = m.rename(columns={"inv_warehouse_sk": "w1", "inv_item_sk": "i1",
                          "d_moy_1": "m1", "mean_1": "mean1", "cov_1": "cov1",
                          "mean_2": "mean2", "cov_2": "cov2"})
    m = m.sort_values(["w1", "i1", "m1", "cov1"], kind="stable").head(100)
    cols = ["w1", "i1", "m1", "mean1", "cov1", "mean2", "cov2"]
    assert canon(out, cols) == canon_df(m, cols)
