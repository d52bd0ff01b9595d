"""TPC-DS expansion: ROLLUP family (q18, q22, q27, q36, q67, q70, q86).

Rollup = Expand over null-suffixed key levels + aggregate; oracles build
each grouping level in pandas and concat (reference: CometTPCDSQuerySuite
runs the same queries against Spark's rollup)."""

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


def rollup_levels(j, keys, aggfn):
    """Concat per-level aggregations: level L drops the last L keys."""
    frames = []
    for lvl in range(len(keys) + 1):
        kept = keys[: len(keys) - lvl]
        if kept:
            g = aggfn(j.groupby(kept)).reset_index()
        else:
            g = aggfn(j.groupby(lambda _: 0)).reset_index(drop=True)
        for k in keys[len(keys) - lvl:]:
            g[k] = None
        g["lochierarchy"] = lvl
        frames.append(g)
    return pd.concat(frames, ignore_index=True)


def sort_nulls_first(frame, cols):
    """Stable multi-key sort, ascending, nulls first (Spark default)."""
    tmp = frame.copy()
    helpers = []
    for i, c in enumerate(cols):
        h = f"__k{i}"
        col = tmp[c]
        if col.dtype == object:
            tmp[h] = col.map(lambda v: "\x00" if v is None or v != v else "\x01" + str(v))
        else:
            isna = col.isna()
            tmp[h + "n"] = (~isna).astype(int)
            tmp[h] = col.fillna(0)
            helpers.append(h + "n")
        helpers.append(h)
    return tmp.sort_values(helpers, kind="stable").drop(columns=helpers)


def canon(rows_dict, cols):
    """Engine output dict -> list of canonical tuples over cols."""
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
            out_v = v
            row.append(out_v)
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


def test_q27(sess, data):
    out = sess.collect(tpcds.q27())
    ss, dt, st, cd, it = (df(data, x) for x in
                          ("store_sales", "date_dim", "store", "customer_demographics", "item"))
    j = (ss.merge(dt[dt.d_year == 2000], left_on="ss_sold_date_sk", right_on="d_date_sk")
         .merge(st[st.s_state.isin(["TN", "CA"])], left_on="ss_store_sk", right_on="s_store_sk")
         .merge(cd[(cd.cd_gender == "M") & (cd.cd_marital_status == "S")
                   & (cd.cd_education_status == "College")],
                left_on="ss_cdemo_sk", right_on="cd_demo_sk")
         .merge(it, left_on="ss_item_sk", right_on="i_item_sk"))
    o = rollup_levels(
        j, ["i_item_id", "s_state"],
        lambda g: g.agg(q=("ss_quantity", "sum"), n=("ss_quantity", "size"),
                        lp=("ss_list_price", "sum"), ca=("ss_coupon_amt", "sum"),
                        sp=("ss_sales_price", "sum")),
    )
    o["agg1"] = o.q / o.n
    for src, dst in (("lp", "agg2"), ("ca", "agg3"), ("sp", "agg4")):
        o[dst] = [half_up_div(v * 10**4, n) / 10**6 for v, n in zip(o[src], o.n)]
    got = canon(out, ["i_item_id", "s_state", "lochierarchy", "agg1"])
    want = canon_df(o, ["i_item_id", "s_state", "lochierarchy", "agg1"])
    assert got == want
    # decimal avgs: compare unscaled int values
    got_d = {t[:3]: None for t in got}
    eng = canon(out, ["i_item_id", "s_state", "lochierarchy", "agg2", "agg3", "agg4"])
    ora = canon_df(
        o.assign(agg2=(o.agg2 * 10**6).round(), agg3=(o.agg3 * 10**6).round(),
                 agg4=(o.agg4 * 10**6).round()),
        ["i_item_id", "s_state", "lochierarchy", "agg2", "agg3", "agg4"])
    assert eng == ora


def test_q18(sess, data):
    out = sess.collect(tpcds.q18())
    cs, cd, dt, c, ca, it = (df(data, x) for x in
                             ("catalog_sales", "customer_demographics", "date_dim",
                              "customer", "customer_address", "item"))
    j = (cs.merge(dt[dt.d_year == 1998], left_on="cs_sold_date_sk", right_on="d_date_sk")
         .merge(cd[(cd.cd_gender == "F") & (cd.cd_education_status == "Unknown")],
                left_on="cs_cdemo_sk", right_on="cd_demo_sk")
         .merge(c[(c.c_birth_year >= 1950) & (c.c_birth_year <= 1980)],
                left_on="cs_bill_customer_sk", right_on="c_customer_sk")
         .merge(ca[ca.ca_state.isin(["CA", "NY", "TX"])],
                left_on="c_current_addr_sk", right_on="ca_address_sk")
         .merge(it, left_on="cs_item_sk", right_on="i_item_sk"))
    o = rollup_levels(
        j, ["i_item_id", "ca_state", "ca_county"],
        lambda g: g.agg(a1=("cs_quantity", "mean"), a2=("cs_list_price", "mean"),
                        a3=("cs_coupon_amt", "mean"), a4=("cs_sales_price", "mean"),
                        a5=("cs_net_profit", "mean"), a6=("c_birth_year", "mean"),
                        a7=("cd_dep_count", "mean")),
    )
    cols = ["i_item_id", "ca_state", "ca_county", "lochierarchy"]
    got = canon(out, cols + ["agg1", "agg5", "agg6", "agg7"])
    o = o.rename(columns={"a1": "agg1", "a5": "agg5", "a6": "agg6", "a7": "agg7"})
    # decimal columns were generated as unscaled ints; engine casts value (×10^-2)
    o["agg5"] = o.agg5 / 100.0
    want = canon_df(o, cols + ["agg1", "agg5", "agg6", "agg7"])
    assert got == want


def test_q22(sess, data):
    out = sess.collect(tpcds.q22())
    inv, dt, it = (df(data, x) for x in ("inventory", "date_dim", "item"))
    j = (inv.merge(dt[(dt.d_month_seq >= 12) & (dt.d_month_seq <= 23)],
                   left_on="inv_date_sk", right_on="d_date_sk")
         .merge(it, left_on="inv_item_sk", right_on="i_item_sk"))
    keys = ["i_product_name", "i_brand", "i_class", "i_category"]
    o = rollup_levels(j, keys, lambda g: g.agg(qoh=("inv_quantity_on_hand", "mean")))
    o = sort_nulls_first(o, ["qoh"] + keys).head(100)
    got = canon(out, keys + ["lochierarchy", "qoh"])
    want = canon_df(o, keys + ["lochierarchy", "qoh"])
    assert got == want


def margin_oracle(j, profit, sales):
    o = rollup_levels(
        j, ["i_category", "i_class"],
        lambda g: (g.agg(p=(profit, "sum"), s=(sales, "sum")) if sales
                   else g.agg(p=(profit, "sum"))),
    )
    if sales:
        o["gross_margin"] = o.p.astype(float) / o.s.astype(float)
    else:
        o["gross_margin"] = o.p.astype(float) / 100.0  # decimal cast to f64
    parent = [tuple(x) for x in zip(
        o.lochierarchy, np.where(o.lochierarchy == 0, o.i_category, None))]
    o["parent"] = parent
    o["rank_within_parent"] = (
        o.groupby("parent").gross_margin.rank(method="min").astype(int))
    return o


def test_q36(sess, data):
    out = sess.collect(tpcds.q36())
    ss, dt, it, st = (df(data, x) for x in ("store_sales", "date_dim", "item", "store"))
    j = (ss.merge(dt[dt.d_year == 2001], left_on="ss_sold_date_sk", right_on="d_date_sk")
         .merge(it, left_on="ss_item_sk", right_on="i_item_sk")
         .merge(st[st.s_state.isin(["TN", "CA", "TX", "NY"])],
                left_on="ss_store_sk", right_on="s_store_sk"))
    o = margin_oracle(j, "ss_net_profit", "ss_ext_sales_price")
    cols = ["i_category", "i_class", "lochierarchy", "gross_margin", "rank_within_parent"]
    assert canon(out, cols) == canon_df(o, cols)


def test_q86(sess, data):
    out = sess.collect(tpcds.q86())
    ws, dt, it = (df(data, x) for x in ("web_sales", "date_dim", "item"))
    j = (ws.merge(dt[dt.d_year == 2001], left_on="ws_sold_date_sk", right_on="d_date_sk")
         .merge(it, left_on="ws_item_sk", right_on="i_item_sk"))
    o = margin_oracle(j, "ws_net_profit", None)
    cols = ["i_category", "i_class", "lochierarchy", "gross_margin", "rank_within_parent"]
    assert canon(out, cols) == canon_df(o, cols)


def test_q70(sess, data):
    out = sess.collect(tpcds.q70())
    ss, dt, st = (df(data, x) for x in ("store_sales", "date_dim", "store"))
    dtf = dt[(dt.d_month_seq >= 12) & (dt.d_month_seq <= 23)]
    base = (ss.merge(dtf, left_on="ss_sold_date_sk", right_on="d_date_sk")
            .merge(st, left_on="ss_store_sk", right_on="s_store_sk"))
    prof = base.groupby("s_state").ss_net_profit.sum().reset_index()
    prof["rk"] = prof.ss_net_profit.rank(method="min", ascending=False).astype(int)
    top = set(prof[prof.rk <= 5].s_state)
    j = base[base.s_state.isin(top)]
    o = rollup_levels(j, ["s_state", "s_county"],
                      lambda g: g.agg(total_sum=("ss_net_profit", "sum")))
    parent = [tuple(x) for x in zip(
        o.lochierarchy, np.where(o.lochierarchy == 0, o.s_state, None))]
    o["parent"] = parent
    o["rank_within_parent"] = (
        o.groupby("parent").total_sum.rank(method="min", ascending=False).astype(int))
    cols = ["s_state", "s_county", "lochierarchy", "total_sum", "rank_within_parent"]
    assert canon(out, cols) == canon_df(o, cols)


def test_q67(sess, data):
    out = sess.collect(tpcds.q67())
    ss, dt, st, it = (df(data, x) for x in ("store_sales", "date_dim", "store", "item"))
    j = (ss.merge(dt[(dt.d_month_seq >= 12) & (dt.d_month_seq <= 23)],
                  left_on="ss_sold_date_sk", right_on="d_date_sk")
         .merge(st, left_on="ss_store_sk", right_on="s_store_sk")
         .merge(it, left_on="ss_item_sk", right_on="i_item_sk"))
    j = j.assign(sales_amt=j.ss_sales_price * j.ss_quantity)
    keys = ["i_category", "i_class", "i_brand", "i_product_name",
            "d_year", "d_qoy", "d_moy", "s_store_id"]
    o = rollup_levels(j, keys, lambda g: g.agg(sumsales=("sales_amt", "sum")))
    o["rk"] = (o.groupby("i_category", dropna=False)
               .sumsales.rank(method="min", ascending=False).astype(int))
    o = o[o.rk <= 100]
    o = sort_nulls_first(o, keys + ["sumsales", "rk"]).head(100)
    got = canon(out, keys + ["sumsales", "rk"])
    want = canon_df(o, keys + ["sumsales", "rk"])
    assert got == want
