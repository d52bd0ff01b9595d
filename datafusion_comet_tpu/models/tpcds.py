"""TPC-DS workload subset: schemas, skewed-key generator, queries q3/q34/q95.

BASELINE.json configs[3] names "TPC-DS SF1000 subset (q3, q34, q64, q95) with
skewed join keys". The generator draws fact-table join keys from a Zipf-like
distribution so shuffle/join skew handling is actually exercised. q64 (the
two-channel cross-year self-join) is tracked for round 2.

Reference parity surface: the reference runs the full TPC-DS suite as tests
(CometTPCDSQuerySuite) and benchmarks (benchmarks/tpc); golden answers here
come from the same differential-oracle pattern as models/tpch.py.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from datafusion_comet_tpu import types as T
from datafusion_comet_tpu.ir import expr as E
from datafusion_comet_tpu.ir import plan as P

__all__ = ["SCHEMAS", "generate_table", "generate_tables", "q3", "q34", "q95", "QUERIES"]

_dec = T.decimal

SCHEMAS: Dict[str, T.Schema] = {
    "date_dim": T.Schema(
        [
            T.Field("d_date_sk", T.INT64, False),
            T.Field("d_year", T.INT32, False),
            T.Field("d_moy", T.INT32, False),
            T.Field("d_dom", T.INT32, False),
        ]
    ),
    "item": T.Schema(
        [
            T.Field("i_item_sk", T.INT64, False),
            T.Field("i_brand_id", T.INT32, False),
            T.Field("i_brand", T.string(30), False),
            T.Field("i_manufact_id", T.INT32, False),
        ]
    ),
    "store": T.Schema(
        [
            T.Field("s_store_sk", T.INT64, False),
            T.Field("s_county", T.string(20), False),
        ]
    ),
    "household_demographics": T.Schema(
        [
            T.Field("hd_demo_sk", T.INT64, False),
            T.Field("hd_buy_potential", T.string(12), False),
            T.Field("hd_dep_count", T.INT32, False),
            T.Field("hd_vehicle_count", T.INT32, False),
        ]
    ),
    "customer": T.Schema(
        [
            T.Field("c_customer_sk", T.INT64, False),
            T.Field("c_last_name", T.string(20), False),
            T.Field("c_first_name", T.string(16), False),
            T.Field("c_salutation", T.string(6), False),
            T.Field("c_preferred_cust_flag", T.string(1), False),
        ]
    ),
    "store_sales": T.Schema(
        [
            T.Field("ss_sold_date_sk", T.INT64, False),
            T.Field("ss_item_sk", T.INT64, False),
            T.Field("ss_customer_sk", T.INT64, False),
            T.Field("ss_store_sk", T.INT64, False),
            T.Field("ss_hdemo_sk", T.INT64, False),
            T.Field("ss_ticket_number", T.INT64, False),
            T.Field("ss_ext_sales_price", _dec(7, 2), False),
        ]
    ),
    "web_sales": T.Schema(
        [
            T.Field("ws_order_number", T.INT64, False),
            T.Field("ws_warehouse_sk", T.INT64, False),
            T.Field("ws_ship_date_sk", T.INT64, False),
            T.Field("ws_ship_addr_sk", T.INT64, False),
            T.Field("ws_web_site_sk", T.INT64, False),
            T.Field("ws_ext_ship_cost", _dec(7, 2), False),
            T.Field("ws_net_profit", _dec(7, 2), False),
        ]
    ),
    "web_returns": T.Schema(
        [
            T.Field("wr_order_number", T.INT64, False),
        ]
    ),
}

_BUY_POTENTIAL = [">10000", "5001-10000", "1001-5000", "501-1000", "0-500", "Unknown"]


def _zipf_keys(rng, n, max_key, a=1.3):
    """Skewed join keys in [1, max_key] (Zipf truncated)."""
    z = rng.zipf(a, n)
    return ((z - 1) % max_key + 1).astype(np.int64)


def table_rows(name: str, sf: float) -> int:
    base = {
        "date_dim": 2000,
        "item": 2000,
        "store": 12,
        "household_demographics": 720,
        "customer": 10000,
        "store_sales": 300000,
        "web_sales": 60000,
        "web_returns": 6000,
    }[name]
    if name in ("date_dim", "store", "household_demographics"):
        return base
    return max(int(base * sf), 10)


def generate_table(name: str, sf: float, seed: int = 20030101) -> Dict[str, np.ndarray]:
    n = table_rows(name, sf)
    rng = np.random.default_rng(seed + hash(name) % (2**31))
    if name == "date_dim":
        sk = np.arange(1, n + 1, dtype=np.int64)
        year = 1998 + (sk - 1) // 365
        doy = (sk - 1) % 365
        moy = (doy // 30) % 12 + 1
        dom = doy % 30 + 1
        return {"d_date_sk": sk, "d_year": year.astype(np.int32),
                "d_moy": moy.astype(np.int32), "d_dom": dom.astype(np.int32)}
    if name == "item":
        sk = np.arange(1, n + 1, dtype=np.int64)
        brand = rng.integers(1, 1000, n).astype(np.int32)
        return {
            "i_item_sk": sk,
            "i_brand_id": brand,
            "i_brand": np.array([f"brand#{b}" for b in brand], object),
            "i_manufact_id": rng.integers(1, 1000, n).astype(np.int32),
        }
    if name == "store":
        return {
            "s_store_sk": np.arange(1, n + 1, dtype=np.int64),
            "s_county": np.array([f"county {i % 8}" for i in range(n)], object),
        }
    if name == "household_demographics":
        return {
            "hd_demo_sk": np.arange(1, n + 1, dtype=np.int64),
            "hd_buy_potential": np.array(_BUY_POTENTIAL, object)[rng.integers(0, 6, n)],
            "hd_dep_count": rng.integers(0, 10, n).astype(np.int32),
            "hd_vehicle_count": rng.integers(-1, 5, n).astype(np.int32),
        }
    if name == "customer":
        sk = np.arange(1, n + 1, dtype=np.int64)
        return {
            "c_customer_sk": sk,
            "c_last_name": np.array([f"Last{k % 500:03d}" for k in sk], object),
            "c_first_name": np.array([f"First{k % 300:03d}" for k in sk], object),
            "c_salutation": np.array(["Mr.", "Ms.", "Dr.", "Mrs.", "Sir"], object)[rng.integers(0, 5, n)],
            "c_preferred_cust_flag": np.array(["Y", "N"], object)[rng.integers(0, 2, n)],
        }
    if name == "store_sales":
        return {
            "ss_sold_date_sk": rng.integers(1, table_rows("date_dim", sf) + 1, n).astype(np.int64),
            "ss_item_sk": _zipf_keys(rng, n, table_rows("item", sf)),  # skewed
            "ss_customer_sk": _zipf_keys(rng, n, table_rows("customer", sf)),
            "ss_store_sk": rng.integers(1, table_rows("store", sf) + 1, n).astype(np.int64),
            "ss_hdemo_sk": rng.integers(1, table_rows("household_demographics", sf) + 1, n).astype(np.int64),
            "ss_ticket_number": rng.integers(1, max(n // 6, 2), n).astype(np.int64),
            "ss_ext_sales_price": rng.integers(100, 1000000, n).astype(np.int64),
        }
    if name == "web_sales":
        return {
            "ws_order_number": rng.integers(1, max(n // 4, 2), n).astype(np.int64),
            "ws_warehouse_sk": rng.integers(1, 6, n).astype(np.int64),
            "ws_ship_date_sk": rng.integers(1, table_rows("date_dim", sf) + 1, n).astype(np.int64),
            "ws_ship_addr_sk": rng.integers(1, 1000, n).astype(np.int64),
            "ws_web_site_sk": rng.integers(1, 30, n).astype(np.int64),
            "ws_ext_ship_cost": rng.integers(100, 10000, n).astype(np.int64),
            "ws_net_profit": rng.integers(-5000, 20000, n).astype(np.int64),
        }
    if name == "web_returns":
        return {
            "wr_order_number": rng.integers(1, max(table_rows("web_sales", sf) // 4, 2), n).astype(np.int64),
        }
    raise KeyError(name)


def generate_tables(names, sf: float, seed: int = 20030101):
    return {n: generate_table(n, sf, seed) for n in names}


def q3(max_groups: int = 1 << 14) -> P.PlanNode:
    """Brand revenue for manufacturer 128 in November, by year."""
    dt = P.Scan("date_dim", SCHEMAS["date_dim"]).filter(E.col("d_moy") == E.lit(11))
    it = P.Scan("item", SCHEMAS["item"]).filter(E.col("i_manufact_id") == E.lit(128))
    ss = P.Scan("store_sales", SCHEMAS["store_sales"])
    sd = P.HashJoin(ss, dt, (E.col("ss_sold_date_sk"),), (E.col("d_date_sk"),), P.JoinType.INNER, "right")
    sdi = P.HashJoin(sd, it, (E.col("ss_item_sk"),), (E.col("i_item_sk"),), P.JoinType.INNER, "right")
    agg = sdi.aggregate(
        [E.col("d_year"), E.col("i_brand_id"), E.col("i_brand")],
        [E.AggExpr("sum", E.col("ss_ext_sales_price"), "sum_agg")],
    )
    agg.max_groups = max_groups
    return agg.sort(
        [E.SortOrder(E.col("d_year")), E.SortOrder(E.col("sum_agg"), ascending=False),
         E.SortOrder(E.col("i_brand_id"))],
        fetch=100,
    )


def q34(max_groups: int = 1 << 16) -> P.PlanNode:
    """Tickets with 15-20 items bought by specific household profiles."""
    dt = P.Scan("date_dim", SCHEMAS["date_dim"]).filter(
        ((E.col("d_dom").between(1, 3)) | (E.col("d_dom").between(25, 28)))
        & E.col("d_year").isin(1999, 2000, 2001)
    )
    hd = P.Scan("household_demographics", SCHEMAS["household_demographics"]).filter(
        ((E.col("hd_buy_potential") == E.lit(">10000"))
         | (E.col("hd_buy_potential") == E.lit("Unknown")))
        & (E.col("hd_vehicle_count") > 0)
        & (
            E.col("hd_dep_count").cast(T.FLOAT64)
            / E.CaseWhen(((E.col("hd_vehicle_count") > 0, E.col("hd_vehicle_count")),), E.lit(1)).cast(T.FLOAT64)
            > E.lit(1.2)
        )
    )
    st = P.Scan("store", SCHEMAS["store"]).filter(
        E.col("s_county").isin("county 0", "county 1", "county 2", "county 3")
    )
    ss = P.Scan("store_sales", SCHEMAS["store_sales"])
    j1 = P.HashJoin(ss, dt, (E.col("ss_sold_date_sk"),), (E.col("d_date_sk"),), P.JoinType.INNER, "right")
    j2 = P.HashJoin(j1, st, (E.col("ss_store_sk"),), (E.col("s_store_sk"),), P.JoinType.INNER, "right")
    j3 = P.HashJoin(j2, hd, (E.col("ss_hdemo_sk"),), (E.col("hd_demo_sk"),), P.JoinType.INNER, "right")
    per_ticket = j3.aggregate(
        [E.col("ss_ticket_number"), E.col("ss_customer_sk")],
        [E.AggExpr("count", None, "cnt")],
    )
    per_ticket.max_groups = max_groups
    filt = P.Filter(per_ticket, E.col("cnt").between(15, 20))
    c = P.Scan("customer", SCHEMAS["customer"])
    j4 = P.HashJoin(filt, c, (E.col("ss_customer_sk"),), (E.col("c_customer_sk"),), P.JoinType.INNER, "right")
    return j4.sort(
        [E.SortOrder(E.col("c_last_name")), E.SortOrder(E.col("c_first_name")),
         E.SortOrder(E.col("c_salutation")),
         E.SortOrder(E.col("c_preferred_cust_flag"), ascending=False),
         E.SortOrder(E.col("ss_ticket_number"))]
    ).project(
        [E.col("c_last_name"), E.col("c_first_name"), E.col("c_salutation"),
         E.col("c_preferred_cust_flag"), E.col("ss_ticket_number"), E.col("cnt")]
    )


def q95(max_groups: int = 8) -> P.PlanNode:
    """Web sales shipped from one site in a window, where the order also ships
    from another warehouse (EXISTS self-join) and was returned (EXISTS)."""
    ws1 = P.Scan("web_sales", SCHEMAS["web_sales"])
    dt = P.Scan("date_dim", SCHEMAS["date_dim"]).filter(
        E.col("d_year").isin(1999) & E.col("d_moy").between(2, 3)
    )
    j1 = P.HashJoin(ws1, dt, (E.col("ws_ship_date_sk"),), (E.col("d_date_sk"),), P.JoinType.INNER, "right")
    # ws_wh: orders shipped from >1 warehouse (self-join inequality)
    ws2 = P.Scan("web_sales", SCHEMAS["web_sales"]).project(
        [E.col("ws_order_number").alias("o2"), E.col("ws_warehouse_sk").alias("w2")]
    )
    multi = P.HashJoin(
        j1, ws2, (E.col("ws_order_number"),), (E.col("o2"),), P.JoinType.LEFT_SEMI, "right",
        condition=E.col("w2") != E.col("ws_warehouse_sk"),
    )
    wr = P.Scan("web_returns", SCHEMAS["web_returns"])
    returned = P.HashJoin(
        multi, wr, (E.col("ws_order_number"),), (E.col("wr_order_number"),), P.JoinType.LEFT_SEMI, "right"
    )
    # count(distinct order) + sums
    dedup = returned.aggregate(
        [E.col("ws_order_number")],
        [E.AggExpr("sum", E.col("ws_ext_ship_cost"), "sc"), E.AggExpr("sum", E.col("ws_net_profit"), "np")],
    )
    dedup.max_groups = 1 << 14
    agg = dedup.aggregate(
        [],
        [E.AggExpr("count", E.col("ws_order_number"), "order_count"),
         E.AggExpr("sum", E.col("sc"), "total_shipping_cost"),
         E.AggExpr("sum", E.col("np"), "total_net_profit")],
    )
    agg.max_groups = max_groups
    return agg


QUERIES = {"q3": q3, "q34": q34, "q95": q95}
