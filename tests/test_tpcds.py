"""Real-schema TPC-DS mini-suite: the reference proves itself by running
all 103 TPC-DS variants end-to-end on the 24-table schema
(flink-end-to-end-tests/flink-tpcds-test/.../TpcdsTestProgram.java:76-86).
The registry's star_* entries cover the signature SHAPES; this suite
upgrades the three hardest shapes to QUERY-TEXT evidence: tiny
deterministic TPC-DS tables are generated in-test, the actual q72 / q75 /
q78 SQL text (public TPC-DS spec templates, qualification parameters)
runs through the engine's SQL surface, and DuckDB runs the identical
text on the identical parquet as the oracle.

Scale note: these are correctness pins — the scale-safe PLANS for the
same shapes are pinned by the star_shortage_weeks / star_yoy_decline
registry entries and their plan tests (queries/star.py:1592,1698)."""

from __future__ import annotations

import datetime

import numpy as np
import pandas as pd
import pytest

# ---------------------------------------------------------------- data --

ITEMS = 40
WAREHOUSES = 2
DEMOS = 24
CS_ROWS = 3000
SS_ROWS = 3000
WS_ROWS = 2000


def _date_dim() -> pd.DataFrame:
    start = datetime.date(1998, 12, 28)  # a Monday, so week_seq aligns cleanly
    days = 4 * 366
    rows = []
    for i in range(days):
        d = start + datetime.timedelta(days=i)
        # d_month_seq follows dsdgen's convention (Jan 2000 = 1200);
        # d_dow follows dsdgen's Sunday=0 convention
        rows.append(
            (i + 1, d, i // 7 + 5200, d.year, d.month, d.day,
             (d.month - 1) // 3 + 1, (d.year - 1900) * 12 + d.month - 1,
             (d.weekday() + 1) % 7)
        )
    return pd.DataFrame(
        rows,
        columns=["d_date_sk", "d_date", "d_week_seq", "d_year", "d_moy", "d_dom", "d_qoy", "d_month_seq", "d_dow"],
    )


def _date_sk(date: datetime.date) -> int:
    return (date - datetime.date(1998, 12, 28)).days + 1


def _gen_tables() -> dict[str, pd.DataFrame]:
    rng = np.random.RandomState(20260815)
    dd = _date_dim()
    n_dates = len(dd)

    item = pd.DataFrame(
        {
            "i_item_sk": np.arange(1, ITEMS + 1),
            "i_item_desc": [f"item description {i:05d}" for i in range(1, ITEMS + 1)],
            "i_product_name": [f"product {i:05d}" for i in range(1, ITEMS + 1)],
            "i_brand_id": rng.randint(1, 9, ITEMS),
            "i_class_id": rng.randint(1, 5, ITEMS),
            "i_category_id": rng.randint(1, 4, ITEMS),
            "i_manufact_id": rng.randint(1, 11, ITEMS),
            "i_category": rng.choice(["Books", "Music", "Home"], ITEMS),
            "i_current_price": rng.randint(60, 81, ITEMS).astype(float),
            "i_color": rng.choice(
                ["purple", "burlywood", "indian", "spring", "floral", "medium", "azure", "rose"],
                ITEMS,
            ),
        }
    )
    warehouse = pd.DataFrame(
        {
            "w_warehouse_sk": np.arange(1, WAREHOUSES + 1),
            "w_warehouse_name": [f"Warehouse {i}" for i in range(1, WAREHOUSES + 1)],
        }
    )
    promotion = pd.DataFrame({"p_promo_sk": np.arange(1, 7)})
    cd = pd.DataFrame(
        {
            "cd_demo_sk": np.arange(1, DEMOS + 1),
            "cd_marital_status": rng.choice(["D", "M", "S"], DEMOS),
        }
    )
    hd = pd.DataFrame(
        {
            "hd_demo_sk": np.arange(1, DEMOS + 1),
            "hd_buy_potential": rng.choice([">10000", "5001-10000"], DEMOS),
            "hd_income_band_sk": rng.randint(1, 6, DEMOS),
        }
    )
    income_band = pd.DataFrame({"ib_income_band_sk": np.arange(1, 6)})
    store = pd.DataFrame(
        {
            "s_store_sk": np.arange(1, 4),
            "s_store_name": [f"Store {i}" for i in range(1, 4)],
            "s_zip": [f"{10000 + i}" for i in range(1, 4)],
        }
    )
    n_addr = 60
    ca = pd.DataFrame(
        {
            "ca_address_sk": np.arange(1, n_addr + 1),
            "ca_street_number": [str(100 + i) for i in range(1, n_addr + 1)],
            "ca_street_name": [f"street {i % 12}" for i in range(1, n_addr + 1)],
            "ca_city": [f"city {i % 8}" for i in range(1, n_addr + 1)],
            "ca_zip": [f"{20000 + i % 30}" for i in range(1, n_addr + 1)],
        }
    )
    # weekly inventory snapshots for every (item, warehouse)
    inv_dates = dd[dd.d_date_sk % 7 == 1].d_date_sk.to_numpy()
    inv = pd.DataFrame(
        [
            (i, w, d, 0)
            for d in inv_dates
            for i in range(1, ITEMS + 1)
            for w in range(1, WAREHOUSES + 1)
        ],
        columns=["inv_item_sk", "inv_warehouse_sk", "inv_date_sk", "inv_quantity_on_hand"],
    )
    inv["inv_quantity_on_hand"] = rng.randint(0, 30, len(inv))

    def price(n):  # exact-in-binary money (quarter dollars) → exact double sums
        return rng.randint(4, 400, n) * 0.25

    def sales(prefix, n, order_col, customer_col):
        sold = rng.randint(1, n_dates - 20, n)
        df = pd.DataFrame(
            {
                f"{prefix}_item_sk": rng.randint(1, ITEMS + 1, n),
                order_col: np.arange(1, n + 1),
                f"{prefix}_quantity": rng.randint(2, 21, n),
                f"{prefix}_ext_sales_price": price(n),
                f"{prefix}_sold_date_sk": sold,
                customer_col: rng.randint(1, 200, n),
                f"{prefix}_wholesale_cost": price(n),
                f"{prefix}_sales_price": price(n),
            }
        )
        return df

    cs = sales("cs", CS_ROWS, "cs_order_number", "cs_bill_customer_sk")
    cs["cs_ship_date_sk"] = cs["cs_sold_date_sk"] + rng.randint(1, 15, CS_ROWS)
    cs["cs_bill_cdemo_sk"] = rng.randint(1, DEMOS + 1, CS_ROWS)
    cs["cs_bill_hdemo_sk"] = rng.randint(1, DEMOS + 1, CS_ROWS)
    cs["cs_promo_sk"] = np.where(
        rng.rand(CS_ROWS) < 0.4, rng.randint(1, 7, CS_ROWS), np.int64(-1)
    )
    cs["cs_ext_list_price"] = price(CS_ROWS) * 10
    ss = sales("ss", SS_ROWS, "ss_ticket_number", "ss_customer_sk")
    ss["ss_store_sk"] = rng.randint(1, 4, SS_ROWS)
    ss["ss_cdemo_sk"] = rng.randint(1, DEMOS + 1, SS_ROWS)
    ss["ss_hdemo_sk"] = rng.randint(1, DEMOS + 1, SS_ROWS)
    ss["ss_addr_sk"] = rng.randint(1, n_addr + 1, SS_ROWS)
    ss["ss_promo_sk"] = rng.randint(1, 7, SS_ROWS)
    ss["ss_list_price"] = price(SS_ROWS)
    ss["ss_coupon_amt"] = rng.randint(0, 20, SS_ROWS) * 0.25
    customer = pd.DataFrame(
        {
            "c_customer_sk": np.arange(1, 200),
            "c_current_cdemo_sk": rng.randint(1, DEMOS + 1, 199),
            "c_current_hdemo_sk": rng.randint(1, DEMOS + 1, 199),
            "c_current_addr_sk": rng.randint(1, n_addr + 1, 199),
            "c_first_sales_date_sk": rng.randint(1, n_dates - 20, 199),
            "c_first_shipto_date_sk": rng.randint(1, n_dates - 20, 199),
        }
    )
    ws = sales("ws", WS_ROWS, "ws_order_number", "ws_bill_customer_sk")

    # ---- round-8 additions (q14/q23/q39/q67/q95): a SEPARATE rng keeps
    # every pre-existing draw identical, so the r7 tests see the same data
    rng2 = np.random.RandomState(777)
    cs["cs_list_price"] = rng2.randint(4, 401, CS_ROWS) * 0.25
    ws["ws_list_price"] = rng2.randint(4, 401, WS_ROWS) * 0.25
    ws["ws_warehouse_sk"] = rng2.randint(1, WAREHOUSES + 1, WS_ROWS)
    ws["ws_ship_date_sk"] = ws["ws_sold_date_sk"] + rng2.randint(1, 16, WS_ROWS)
    ws["ws_ship_addr_sk"] = rng2.randint(1, n_addr + 1, WS_ROWS)
    ws["ws_web_site_sk"] = rng2.randint(1, 5, WS_ROWS)
    ws["ws_ext_ship_cost"] = rng2.randint(4, 200, WS_ROWS) * 0.25
    ws["ws_net_profit"] = rng2.randint(-100, 400, WS_ROWS) * 0.25
    # q95 needs multi-warehouse web orders: rows 0..399 pair up into 200
    # two-line orders with DIFFERENT warehouses (before wr is sampled,
    # so returns stay consistent with the remapped order numbers)
    ws.loc[: 400 - 1, "ws_order_number"] = 100000 + np.arange(400) // 2
    ws.loc[: 400 - 1, "ws_warehouse_sk"] = np.tile([1, 2], 200)
    # ...and 60 of those pair-rows ship to IL addresses via site 'pri'
    # inside the q95 date window (Feb-Apr 1999)
    ws.loc[: 60 - 1, "ws_ship_date_sk"] = _date_sk(datetime.date(1999, 2, 15))
    ws.loc[: 60 - 1, "ws_ship_addr_sk"] = rng2.randint(1, 16, 60)
    ws.loc[: 60 - 1, "ws_web_site_sk"] = 1

    def returns(sdf, prefix, rprefix, order_col, rorder_col, amt_col):
        ret = sdf.sample(frac=0.3, random_state=7)[
            [f"{prefix}_item_sk", order_col, f"{prefix}_quantity"]
        ].copy()
        # strictly fewer returned than sold → every netted count stays >= 1
        ret[f"{rprefix}_return_quantity"] = 1
        ret[amt_col] = rng.randint(1, 40, len(ret)) * 0.25
        ret = ret.rename(
            columns={f"{prefix}_item_sk": f"{rprefix}_item_sk", order_col: rorder_col}
        )
        return ret.drop(columns=[f"{prefix}_quantity"]).reset_index(drop=True)

    cr = returns(cs, "cs", "cr", "cs_order_number", "cr_order_number", "cr_return_amount")
    # q64's cs_ui leg: refund components, small so sale > 2*refund mostly holds
    cr["cr_refunded_cash"] = rng.randint(0, 40, len(cr)) * 0.25
    cr["cr_reversed_charge"] = rng.randint(0, 20, len(cr)) * 0.25
    cr["cr_store_credit"] = rng.randint(0, 20, len(cr)) * 0.25
    sr = returns(ss, "ss", "sr", "ss_ticket_number", "sr_ticket_number", "sr_return_amt")
    wr = returns(ws, "ws", "wr", "ws_order_number", "wr_order_number", "wr_return_amt")

    # ---- round-8 schema/table extensions (new columns via rng2 only) ----
    item["i_brand"] = [f"brand{b}" for b in item.i_brand_id]
    item["i_class"] = [f"class{c}" for c in item.i_class_id]
    item["i_item_id"] = [f"AAAA{i:04d}" for i in item.i_item_sk]
    item["i_manager_id"] = rng2.randint(1, 41, ITEMS)
    item.loc[4:6, "i_manager_id"] = 1    # q42/q52 qualification manager
    item.loc[7:8, "i_manager_id"] = 28   # q55 qualification manager
    item.loc[3:7, "i_manufact_id"] = 128  # q3 qualification manufacturer
    # q56's qualification colors (items 35..40 leave q64's color set)
    item.loc[34:39, "i_color"] = ["slate", "blanched", "burnished"] * 2
    # q32/q92/q37/q82 qualification manufacturers; q40's dollar items
    item.loc[13:15, "i_manufact_id"] = 977
    item.loc[16:18, "i_manufact_id"] = 350
    item.loc[19:22, "i_manufact_id"] = [677, 940, 694, 808]
    item.loc[23:26, "i_manufact_id"] = [129, 270, 821, 423]
    item.loc[27:28, "i_current_price"] = [1.25, 1.0]
    cs["cs_ext_discount_amt"] = rng2.randint(0, 120, CS_ROWS) * 0.25
    ws["ws_ext_discount_amt"] = rng2.randint(0, 120, WS_ROWS) * 0.25
    cs["cs_warehouse_sk"] = rng2.randint(1, WAREHOUSES + 1, CS_ROWS)
    warehouse["w_state"] = ["TN", "OH"][: WAREHOUSES]
    cd["cd_gender"] = rng2.choice(["M", "F"], DEMOS)
    cd["cd_education_status"] = rng2.choice(["College", "2 yr Degree", "4 yr Degree"], DEMOS)
    cd.loc[0:1, ["cd_gender", "cd_marital_status", "cd_education_status"]] = (
        ["M", "S", "College"]  # q7/q26 qualification demographic
    )
    promotion["p_channel_email"] = rng2.choice(["N", "Y"], len(promotion))
    promotion["p_channel_event"] = rng2.choice(["N", "Y"], len(promotion))
    hd["hd_dep_count"] = rng2.randint(0, 10, DEMOS)
    hd["hd_vehicle_count"] = rng2.randint(0, 6, DEMOS)
    hd.loc[0:3, "hd_dep_count"] = 7  # q96 qualification
    hd.loc[4:9, "hd_dep_count"] = [4, 4, 2, 2, 0, 0]  # q88 combos
    hd.loc[4:9, "hd_vehicle_count"] = [4, 5, 3, 2, 1, 0]
    ca["ca_gmt_offset"] = rng2.choice([-5.0, -5.0, -6.0, -7.0], len(ca))
    store.loc[1, "s_store_name"] = "ese"  # q88/q96 qualification store
    cs["cs_coupon_amt"] = rng2.randint(0, 20, CS_ROWS) * 0.25
    cs["cs_bill_addr_sk"] = rng2.randint(1, n_addr + 1, CS_ROWS)
    ws["ws_bill_addr_sk"] = rng2.randint(1, n_addr + 1, WS_ROWS)
    # seconds-of-day dimension at minute grain for the time-of-day queries
    time_dim = pd.DataFrame(
        {
            "t_time_sk": [h * 3600 + mi * 60 for h in range(24) for mi in range(60)],
            "t_hour": [h for h in range(24) for _ in range(60)],
            "t_minute": [mi for _ in range(24) for mi in range(60)],
        }
    )
    ss["ss_sold_time_sk"] = rng2.choice(time_dim.t_time_sk.to_numpy(), SS_ROWS)
    store["s_store_id"] = [f"S{i:03d}" for i in store.s_store_sk]
    ca["ca_state"] = rng2.choice(["IL", "CA", "TX", "GA"], len(ca))
    ca.loc[:14, "ca_state"] = "IL"  # q95 ship addresses 1..15
    customer["c_first_name"] = [f"First{i % 40}" for i in customer.c_customer_sk]
    customer["c_last_name"] = [f"Last{i % 60}" for i in customer.c_customer_sk]
    web_site = pd.DataFrame(
        {
            "web_site_sk": np.arange(1, 5),
            "web_company_name": ["pri", "pri", "able", "ese"],
        }
    )
    # q39 wants within-month inventory variance: half the items turn
    # BURSTY (mostly zero with occasional spikes → cov > 1), the rest
    # stay steady (cov << 1).  Overwrite only the VALUES (draw counts via
    # rng2), leaving the original rng stream untouched.
    bursty = (inv.inv_item_sk % 2 == 0).to_numpy()
    spike = rng2.rand(len(inv)) < 0.2
    qty = np.where(spike, rng2.randint(40, 120, len(inv)), 0)
    inv["inv_quantity_on_hand"] = np.where(
        bursty, qty, rng2.randint(10, 21, len(inv))
    ).astype(np.int64)

    # --- q1/q34/q46/q68/q73/q79 schema: store attributes, customer ids,
    # returns linkage (mapped from the pre-remap base rows), ticket sums
    store["s_city"] = ["Fairview", "Midway", "Fairview"]
    store["s_county"] = "Williamson County"
    store["s_state"] = "TN"
    store["s_number_employees"] = [250, 280, 300]
    customer["c_customer_id"] = [f"CUST{i:06d}" for i in customer.c_customer_sk]
    customer["c_salutation"] = rng2.choice(["Mr.", "Mrs.", "Ms.", "Dr."], len(customer))
    customer["c_preferred_cust_flag"] = rng2.choice(["Y", "N"], len(customer))
    hd.loc[10, ["hd_buy_potential", "hd_dep_count", "hd_vehicle_count"]] = (
        [">10000", 5, 3]  # q34's ratio > 1.2 qualification demographic
    )
    ss["ss_net_profit"] = rng2.randint(-200, 400, SS_ROWS) * 0.25
    ss["ss_ext_list_price"] = rng2.randint(40, 2000, SS_ROWS) * 0.25
    ss["ss_ext_tax"] = rng2.randint(0, 80, SS_ROWS) * 0.25
    base_by_ticket = ss.set_index("ss_ticket_number")
    sr["sr_customer_sk"] = sr.sr_ticket_number.map(base_by_ticket.ss_customer_sk)
    sr["sr_store_sk"] = sr.sr_ticket_number.map(base_by_ticket.ss_store_sk)
    sr["sr_returned_date_sk"] = sr.sr_ticket_number.map(
        base_by_ticket.ss_sold_date_sk
    ) + rng2.randint(1, 30, len(sr))
    # q34's 15-20-line tickets: remap rows 500..899 into 25 sixteen-line
    # tickets (one customer/store/demo/date each; d_dom=2, d_year=2000)
    q34_date = _date_sk(datetime.date(2000, 3, 2))
    idx = ss.index[500:900]
    ss.loc[idx, "ss_ticket_number"] = 800000 + (np.arange(400) // 16)
    ss.loc[idx, "ss_customer_sk"] = 30 + (np.arange(400) // 16)
    ss.loc[idx, "ss_store_sk"] = 1
    ss.loc[idx, "ss_hdemo_sk"] = 11
    ss.loc[idx, "ss_sold_date_sk"] = q34_date
    # one address per remapped ticket: q68 groups by (ticket, addr, city),
    # and a ticket split across cities would tie on its ORDER BY columns
    # at the LIMIT cutoff (engines break ties differently)
    ss.loc[idx, "ss_addr_sk"] = 1 + (np.arange(400) // 16) % 60

    # q95: guarantee some qualifying pair-orders have web returns
    wr_inject = ws.iloc[:20][["ws_item_sk", "ws_order_number"]].rename(
        columns={"ws_item_sk": "wr_item_sk", "ws_order_number": "wr_order_number"}
    )
    wr_inject["wr_return_quantity"] = 1
    wr_inject["wr_return_amt"] = rng2.randint(1, 40, len(wr_inject)) * 0.25
    wr = pd.concat([wr, wr_inject], ignore_index=True)

    # q23: force frequent store items (count>4 per item+date), a tight
    # best-customer set (4 customers with near-equal dominant store
    # sales), and catalog/web purchases by them in Feb 2000
    q23_dates = [_date_sk(datetime.date(2000, 2, 10)), _date_sk(datetime.date(2000, 5, 3)),
                 _date_sk(datetime.date(2000, 9, 17))]
    q23_rows = []
    for it in (1, 2, 3):
        for dsk in q23_dates:
            for k in range(8):  # 8 rows: count(*) > 4 and 2 rows per customer
                q23_rows.append((it, dsk, 1 + (k % 4)))
    ss_inject = pd.DataFrame(q23_rows, columns=["ss_item_sk", "ss_sold_date_sk", "ss_customer_sk"])
    n_inj = len(ss_inject)
    ss_inject["ss_ticket_number"] = 900000 + np.arange(n_inj)
    ss_inject["ss_quantity"] = 50
    ss_inject["ss_ext_sales_price"] = 100.0
    ss_inject["ss_wholesale_cost"] = 50.0
    ss_inject["ss_sales_price"] = 2500.0  # 50*2500 = 125k/row ⇒ base noise < 5%
    ss_inject["ss_store_sk"] = 1
    ss_inject["ss_cdemo_sk"] = 1
    ss_inject["ss_hdemo_sk"] = 1
    ss_inject["ss_addr_sk"] = 1
    ss_inject["ss_promo_sk"] = 1
    ss_inject["ss_list_price"] = 100.0
    ss_inject["ss_coupon_amt"] = 0.0
    ss_inject["ss_sold_time_sk"] = 10 * 3600
    ss_inject["ss_net_profit"] = 2.0
    ss_inject["ss_ext_list_price"] = 110.0
    ss_inject["ss_ext_tax"] = 1.0
    feb2000 = _date_sk(datetime.date(2000, 2, 20))
    cs_inject = pd.DataFrame(
        {
            "cs_item_sk": [1, 2, 3, 1, 2, 3],
            "cs_order_number": 900000 + np.arange(6),
            "cs_quantity": [5, 6, 7, 8, 9, 10],
            "cs_ext_sales_price": 100.0,
            "cs_sold_date_sk": feb2000,
            "cs_bill_customer_sk": [1, 2, 3, 4, 1, 2],
            "cs_wholesale_cost": 50.0,
            "cs_sales_price": 75.0,
            "cs_ship_date_sk": feb2000 + 7,
            "cs_bill_cdemo_sk": 1,
            "cs_bill_hdemo_sk": 1,
            "cs_promo_sk": 1,
            "cs_ext_list_price": 500.0,
            "cs_list_price": [20.0, 30.25, 40.5, 50.75, 60.0, 70.25],
            "cs_coupon_amt": 0.0,
            "cs_bill_addr_sk": 1,
            "cs_ext_discount_amt": 0.0,
            "cs_warehouse_sk": 1,
        }
    )
    ws_inject = pd.DataFrame(
        {
            "ws_item_sk": [1, 2, 3, 1],
            "ws_order_number": 910000 + np.arange(4),
            "ws_quantity": [4, 5, 6, 7],
            "ws_ext_sales_price": 100.0,
            "ws_sold_date_sk": feb2000,
            "ws_bill_customer_sk": [3, 4, 1, 2],
            "ws_wholesale_cost": 50.0,
            "ws_sales_price": 75.0,
            "ws_list_price": [25.0, 35.25, 45.5, 55.75],
            "ws_warehouse_sk": 1,
            "ws_ship_date_sk": feb2000 + 5,
            "ws_ship_addr_sk": 1,
            "ws_web_site_sk": 2,
            "ws_ext_ship_cost": 10.0,
            "ws_net_profit": 5.0,
            "ws_bill_addr_sk": 1,
            "ws_ext_discount_amt": 0.0,
        }
    )
    # q14b: one (brand,class,category) with above-average store sales in
    # the weeks containing Dec 11 of 1999 AND 2000 (item 10's triple)
    q14b_rows = []
    for dsk in (_date_sk(datetime.date(1999, 12, 11)), _date_sk(datetime.date(2000, 12, 11))):
        for k in range(6):
            q14b_rows.append((10, dsk - (k % 3), 20 + k))
    ss14 = pd.DataFrame(q14b_rows, columns=["ss_item_sk", "ss_sold_date_sk", "ss_customer_sk"])
    ss14["ss_ticket_number"] = 950000 + np.arange(len(ss14))
    ss14["ss_quantity"] = 30
    ss14["ss_ext_sales_price"] = 100.0
    ss14["ss_wholesale_cost"] = 50.0
    ss14["ss_sales_price"] = 60.0
    ss14["ss_store_sk"] = 2
    ss14["ss_cdemo_sk"] = 2
    ss14["ss_hdemo_sk"] = 2
    ss14["ss_addr_sk"] = 2
    ss14["ss_promo_sk"] = 2
    ss14["ss_list_price"] = 200.0  # 30*200 = 6k per row ≫ average single sale
    ss14["ss_coupon_amt"] = 0.0
    ss14["ss_sold_time_sk"] = 11 * 3600
    ss14["ss_net_profit"] = 2.0
    ss14["ss_ext_list_price"] = 110.0
    ss14["ss_ext_tax"] = 1.0
    ss = pd.concat([ss, ss_inject, ss14], ignore_index=True)
    cs = pd.concat([cs, cs_inject], ignore_index=True)
    ws = pd.concat([ws, ws_inject], ignore_index=True)

    # ---- round-8 batch-5 additions: a FRESH rng keeps every rng/rng2
    # draw identical (existing tests see unchanged data); new columns are
    # assigned on the post-concat frames so injected rows get values too
    rng3 = np.random.RandomState(888)
    ws["ws_net_paid"] = rng3.randint(4, 400, len(ws)) * 0.25

    # batch-6 schema: day names (dsdgen's Sunday=0 dow), shipping dims,
    # reason codes, counties, per-row paid/discount amounts
    day_names = np.array(
        ["Sunday", "Monday", "Tuesday", "Wednesday", "Thursday", "Friday", "Saturday"]
    )
    dd["d_day_name"] = day_names[dd.d_dow.to_numpy()]
    store["s_gmt_offset"] = -5.0
    store["s_company_id"] = 1
    store["s_company_name"] = "Unknown"
    ca["ca_county"] = [f"County {i % 5}" for i in ca.ca_address_sk]
    item["i_wholesale_cost"] = rng3.randint(4, 300, ITEMS) * 0.25
    reason = pd.DataFrame(
        {
            "r_reason_sk": np.arange(1, 6),
            "r_reason_desc": ["reason 28", "reason 2", "reason 3", "reason 4", "reason 5"],
        }
    )
    ship_mode = pd.DataFrame(
        {
            "sm_ship_mode_sk": np.arange(1, 6),
            "sm_type": ["EXPRESS", "OVERNIGHT", "REGULAR", "TWO DAY", "LIBRARY"],
        }
    )
    call_center = pd.DataFrame(
        {
            "cc_call_center_sk": np.arange(1, 4),
            "cc_name": ["NY Metro", "Mid Atlantic", "North Midwest"],
            "cc_county": ["Williamson County", "Williamson County", "Ziebach County"],
        }
    )
    web_site["web_name"] = [f"site_{i}" for i in range(len(web_site))]
    ws["ws_ship_mode_sk"] = rng3.randint(1, 6, len(ws))
    cs["cs_ship_mode_sk"] = rng3.randint(1, 6, len(cs))
    cs["cs_call_center_sk"] = rng3.randint(1, 4, len(cs))
    cs["cs_ship_addr_sk"] = rng3.randint(1, n_addr + 1, len(cs))
    sr["sr_reason_sk"] = rng3.randint(1, 6, len(sr))
    ss["ss_net_paid"] = rng3.randint(4, 400, len(ss)) * 0.25
    ss["ss_ext_discount_amt"] = rng3.randint(0, 120, len(ss)) * 0.25

    # batch-7 schema: quarter names, customer identity columns, spec
    # brand/class triples (q53/q63/q89 predicates), per-channel profit /
    # wholesale / list columns, and NULL foreign keys for q76's legs.
    # rng3 draws APPEND after batch-6's, so those values are unchanged.
    dd["d_quarter_name"] = dd.d_year.astype(str) + "Q" + dd.d_qoy.astype(str)
    customer["c_birth_country"] = rng3.choice(
        ["UNITED STATES", "CANADA", "MEXICO", "FRANCE"], len(customer)
    )
    customer["c_login"] = ""
    customer["c_email_address"] = [f"c{i}@example.com" for i in customer.c_customer_sk]
    item.loc[28:32, ["i_category", "i_class", "i_brand"]] = [
        ["Books", "personal", "scholaramalgamalg #14"],
        ["Books", "portable", "scholaramalgamalg #7"],
        ["Music", "classical", "edu packscholar #1"],
        ["Books", "computers", "scholaramalgamalg #9"],
        ["Electronics", "stereo", "importoscholar #1"],
    ]
    cs["cs_net_profit"] = rng3.randint(-100, 400, len(cs)) * 0.25
    sr["sr_net_loss"] = rng3.randint(1, 100, len(sr)) * 0.25
    ws["ws_ext_list_price"] = rng3.randint(40, 2000, len(ws)) * 0.25
    ss["ss_ext_wholesale_cost"] = rng3.randint(4, 300, len(ss)) * 0.25
    cs["cs_ext_wholesale_cost"] = rng3.randint(4, 300, len(cs)) * 0.25
    ws["ws_ext_wholesale_cost"] = rng3.randint(4, 300, len(ws)) * 0.25
    ws["ws_ship_customer_sk"] = rng3.randint(1, 200, len(ws)).astype(float)
    ws.loc[1000:1099, "ws_ship_customer_sk"] = np.nan
    ss["ss_store_sk"] = ss["ss_store_sk"].astype(float)
    ss.loc[2900:2949, "ss_store_sk"] = np.nan
    cs["cs_ship_addr_sk"] = cs["cs_ship_addr_sk"].astype(float)
    cs.loc[1000:1049, "cs_ship_addr_sk"] = np.nan

    # batch-8 schema: country/manufact columns, store-zip-aligned
    # addresses (q8's 2-char prefix match), NULL ss_addr slice (q44's
    # anchor subquery), and four sale-free q41 items (sk 41..44) crafted
    # for the color/units/size branch predicates — no sales row touches
    # them, so every sales-joining query is unaffected.
    ca["ca_country"] = "United States"
    ca.loc[0:9, "ca_zip"] = "10001"
    item["i_manufact"] = [f"manufact {m}" for m in item.i_manufact_id]
    ss.loc[2850:2899, "ss_addr_sk"] = np.nan
    item["i_size"] = "N/A"
    item["i_units"] = "Unknown"
    q41_rows = pd.DataFrame(
        [
            (41, "item description q41a", "amalgamalg q41 #1", 740, "Women",
             "powder", "Ounce", "medium"),
            (42, "item description q41b", "amalgamalg q41 #2", 740, "Women",
             "forest", "Ton", "small"),
            (43, "item description q41c", "amalgamalg q41 #3", 741, "Men",
             "floral", "Dozen", "petite"),
            (44, "item description q41d", "amalgamalg q41 #4", 742, "Men",
             "light", "Pound", "extra large"),
        ],
        columns=["i_item_sk", "i_item_desc", "i_product_name", "i_manufact_id",
                 "i_category", "i_color", "i_units", "i_size"],
    )
    q41_rows["i_manufact"] = [f"manufact {m}" for m in q41_rows.i_manufact_id]
    q41_rows["i_brand_id"] = 9
    q41_rows["i_class_id"] = 9
    q41_rows["i_category_id"] = 9
    q41_rows["i_current_price"] = 65.0
    q41_rows["i_brand"] = "brand9"
    q41_rows["i_class"] = "class9"
    q41_rows["i_item_id"] = [f"AAAA{i:04d}" for i in q41_rows.i_item_sk]
    q41_rows["i_manager_id"] = 35
    q41_rows["i_wholesale_cost"] = 30.0
    item = pd.concat([item, q41_rows], ignore_index=True)

    # batch-9 schema: full customer demographics, promotion channels,
    # meal times + per-channel sold-time keys, web_page dim, income-band
    # bounds (bands 2-3 sit inside q84's [38128, 88128] window), call
    # center identity, and catalog-return linkage columns
    cd["cd_purchase_estimate"] = rng3.choice([500, 1000, 1500, 2000], DEMOS)
    cd["cd_credit_rating"] = rng3.choice(["Low Risk", "Good", "High Risk", "Unknown"], DEMOS)
    cd["cd_dep_count"] = rng3.randint(0, 7, DEMOS)
    cd["cd_dep_employed_count"] = rng3.randint(0, 5, DEMOS)
    cd["cd_dep_college_count"] = rng3.randint(0, 3, DEMOS)
    cs["cs_ship_customer_sk"] = rng3.randint(1, 200, len(cs))
    promotion["p_channel_dmail"] = rng3.choice(["N", "Y"], len(promotion))
    promotion["p_channel_tv"] = rng3.choice(["N", "Y"], len(promotion))
    hours = time_dim.t_hour.to_numpy()
    time_dim["t_meal_time"] = np.select(
        [(hours >= 6) & (hours <= 9), (hours >= 17) & (hours <= 20)],
        ["breakfast", "dinner"],
        default=None,
    )
    ws["ws_sold_time_sk"] = rng3.choice(time_dim.t_time_sk.to_numpy(), len(ws))
    cs["cs_sold_time_sk"] = rng3.choice(time_dim.t_time_sk.to_numpy(), len(cs))
    web_page = pd.DataFrame(
        {
            "wp_web_page_sk": np.arange(1, 7),
            "wp_char_count": [5010, 5120, 4800, 5200, 2500, 5555],
        }
    )
    ws["ws_web_page_sk"] = rng3.randint(1, 7, len(ws))
    ws["ws_ship_hdemo_sk"] = rng3.randint(1, DEMOS + 1, len(ws))
    income_band["ib_lower_bound"] = [0, 38128, 60001, 90001, 120001]
    income_band["ib_upper_bound"] = [30000, 60000, 88128, 120000, 150000]
    sr["sr_cdemo_sk"] = rng3.randint(1, DEMOS + 1, len(sr))
    call_center["cc_call_center_id"] = [
        "AAAAAAAABAAAAAAA", "AAAAAAAACAAAAAAA", "AAAAAAAAEAAAAAAA"
    ]
    call_center["cc_manager"] = ["Bob Belcher", "Felipe Perkins", "Mark Hightower"]
    cr["cr_call_center_sk"] = rng3.randint(1, 4, len(cr))
    cr["cr_returning_customer_sk"] = rng3.randint(1, 200, len(cr))
    cr["cr_returned_date_sk"] = rng3.randint(1, n_dates + 1, len(cr))
    cr["cr_net_loss"] = rng3.randint(1, 100, len(cr)) * 0.25

    # batch-10 schema: customer birth/review columns, return address
    # linkage, full address attributes, catalog ship cost + q16's
    # multi-warehouse two-line catalog orders (rows 2000..2399 pair up;
    # 60 of them ship to forced-GA addresses inside the Feb-2002 window)
    cs["cs_ext_ship_cost"] = rng3.randint(4, 200, len(cs)) * 0.25
    ca.loc[15:19, "ca_state"] = "GA"
    cs.loc[2000:2399, "cs_order_number"] = 700000 + np.arange(400) // 2
    cs.loc[2000:2399, "cs_warehouse_sk"] = np.tile([1, 2], 200)
    cs.loc[2000:2059, "cs_ship_date_sk"] = _date_sk(datetime.date(2002, 2, 20))
    cs.loc[2000:2059, "cs_ship_addr_sk"] = 16.0 + (np.arange(60) % 5)
    customer["c_birth_year"] = rng3.randint(1940, 1995, len(customer))
    customer["c_birth_month"] = rng3.randint(1, 13, len(customer))
    customer["c_birth_day"] = rng3.randint(1, 29, len(customer))
    customer["c_last_review_date_sk"] = rng3.randint(1, n_dates + 1, len(customer))
    wr["wr_returning_customer_sk"] = rng3.randint(1, 200, len(wr))
    wr["wr_returned_date_sk"] = rng3.randint(1, n_dates + 1, len(wr))
    wr["wr_returning_addr_sk"] = rng3.randint(1, n_addr + 1, len(wr))
    cr["cr_returning_addr_sk"] = rng3.randint(1, n_addr + 1, len(cr))
    cr["cr_return_amt_inc_tax"] = cr["cr_return_amount"] + rng3.randint(0, 8, len(cr)) * 0.25
    ca["ca_street_type"] = rng3.choice(["Ave", "Blvd", "Ct", "Dr"], len(ca))
    ca["ca_suite_number"] = [f"Suite {i % 20}" for i in ca.ca_address_sk]
    ca["ca_location_type"] = rng3.choice(["apartment", "condo", "single family"], len(ca))

    # batch-11 schema: store market/street attributes (q24/q50), a
    # Women/maternity item (q54), and ten addresses whose county/state
    # match the stores' (q54's ca_county = s_county join)
    store["s_market_id"] = 8
    store["s_street_number"] = ["100", "200", "300"]
    store["s_street_name"] = ["Main", "Oak", "Pine"]
    store["s_street_type"] = "St"
    store["s_suite_number"] = ["Suite 1", "Suite 2", "Suite 3"]
    ca.loc[20:29, "ca_county"] = "Williamson County"
    ca.loc[20:29, "ca_state"] = "TN"
    item.loc[33, ["i_category", "i_class"]] = ["Women", "maternity"]
    # q54 qualification: customers 1..6 live at the county-aligned
    # addresses and buy the maternity item by catalog in Dec 2000 (rows
    # cloned from base rows so every cs column carries a valid value)
    customer.loc[0:5, "c_current_addr_sk"] = np.arange(21, 27)
    cs54 = cs.iloc[100:106].copy()
    cs54["cs_item_sk"] = 34
    cs54["cs_bill_customer_sk"] = np.arange(1, 7)
    cs54["cs_sold_date_sk"] = _date_sk(datetime.date(2000, 12, 15))
    cs54["cs_order_number"] = 920000 + np.arange(6)
    cs = pd.concat([cs, cs54], ignore_index=True)

    # batch-12 schema: catalog_page dim + page keys, web-return loss and
    # page keys, web_site id (q5/q77/q80 channel rollups)
    catalog_page = pd.DataFrame(
        {
            "cp_catalog_page_sk": np.arange(1, 11),
            "cp_catalog_page_id": [f"CPAG{i:04d}" for i in range(1, 11)],
        }
    )
    cs["cs_catalog_page_sk"] = rng3.randint(1, 11, len(cs))
    cr["cr_catalog_page_sk"] = rng3.randint(1, 11, len(cr))
    wr["wr_net_loss"] = rng3.randint(1, 100, len(wr)) * 0.25
    wr["wr_web_page_sk"] = rng3.randint(1, 7, len(wr))
    web_site["web_site_id"] = [f"WSIT{i:04d}" for i in range(1, len(web_site) + 1)]
    ws["ws_promo_sk"] = rng3.randint(1, 7, len(ws))

    # q58/q83 qualification: item 5 sells ~equal amounts in all three
    # channels in the week of 2000-01-03 (inject dwarfs base noise);
    # item 12 is returned via all three channels in the weeks of the
    # three q83 dates (synthetic keys stay outside every sales keyspace)
    d58 = _date_sk(datetime.date(2000, 1, 4))
    ss58 = ss.iloc[200:202].copy()
    ss58[["ss_item_sk", "ss_sold_date_sk", "ss_ext_sales_price"]] = [[5, d58, 2500.0]] * 2
    ss58["ss_ticket_number"] = [985000, 985001]
    cs58 = cs.iloc[200:202].copy()
    cs58[["cs_item_sk", "cs_sold_date_sk", "cs_ext_sales_price"]] = [[5, d58, 2500.0]] * 2
    cs58["cs_order_number"] = [985000, 985001]
    ws58 = ws.iloc[200:202].copy()
    ws58[["ws_item_sk", "ws_sold_date_sk", "ws_ext_sales_price"]] = [[5, d58, 2500.0]] * 2
    ws58["ws_order_number"] = [985000, 985001]
    ss = pd.concat([ss, ss58], ignore_index=True)
    cs = pd.concat([cs, cs58], ignore_index=True)
    ws = pd.concat([ws, ws58], ignore_index=True)
    q83_dates = [
        _date_sk(datetime.date(2000, 6, 30)),
        _date_sk(datetime.date(2000, 9, 27)),
        _date_sk(datetime.date(2000, 11, 17)),
    ]
    sr83 = sr.iloc[10:13].copy()
    sr83[["sr_item_sk", "sr_return_quantity"]] = [[12, 4]] * 3
    sr83["sr_returned_date_sk"] = q83_dates
    sr83["sr_ticket_number"] = 986000 + np.arange(3)
    cr83 = cr.iloc[10:13].copy()
    cr83[["cr_item_sk", "cr_return_quantity"]] = [[12, 5]] * 3
    cr83["cr_returned_date_sk"] = q83_dates
    cr83["cr_order_number"] = 986000 + np.arange(3)
    wr83 = wr.iloc[10:13].copy()
    wr83[["wr_item_sk", "wr_return_quantity"]] = [[12, 6]] * 3
    wr83["wr_returned_date_sk"] = q83_dates
    wr83["wr_order_number"] = 986000 + np.arange(3)
    sr = pd.concat([sr, sr83], ignore_index=True)
    cr = pd.concat([cr, cr83], ignore_index=True)
    wr = pd.concat([wr, wr83], ignore_index=True)

    # batch-13 schema (q49/q66/q85): warehouse geography + sq ft, time
    # value + ship carriers, catalog net-paid-inc-tax, and the web-return
    # refund columns.  Half the returning cdemo keys equal the refunded
    # key so q85's cd1=cd2 equality branches have mass.
    cs["cs_net_paid_inc_tax"] = rng3.randint(4, 420, len(cs)) * 0.25
    cs["cs_net_paid"] = rng3.randint(4, 400, len(cs)) * 0.25
    warehouse["w_warehouse_sq_ft"] = [73065, 59061][:WAREHOUSES]
    warehouse["w_city"] = ["Fairview", "Midway"][:WAREHOUSES]
    warehouse["w_county"] = "Williamson County"
    warehouse["w_country"] = "United States"
    time_dim["t_time"] = time_dim["t_time_sk"]
    ship_mode["sm_carrier"] = ["DHL", "BARIAN", "UPS", "FEDEX", "AIRBORNE"]
    wr["wr_refunded_cash"] = rng3.randint(0, 60, len(wr)) * 0.25
    wr["wr_fee"] = rng3.randint(0, 40, len(wr)) * 0.25
    wr["wr_refunded_cdemo_sk"] = rng3.randint(1, DEMOS + 1, len(wr))
    wr["wr_returning_cdemo_sk"] = np.where(
        rng3.rand(len(wr)) < 0.5,
        wr["wr_refunded_cdemo_sk"],
        rng3.randint(1, DEMOS + 1, len(wr)),
    )
    wr["wr_refunded_addr_sk"] = rng3.randint(1, n_addr + 1, len(wr))
    wr["wr_reason_sk"] = rng3.randint(1, 6, len(wr))

    return {
        "reason": reason,
        "ship_mode": ship_mode,
        "call_center": call_center,
        "web_page": web_page,
        "catalog_page": catalog_page,
        "web_site": web_site,
        "time_dim": time_dim,
        "date_dim": dd,
        "item": item,
        "warehouse": warehouse,
        "promotion": promotion,
        "customer_demographics": cd,
        "household_demographics": hd,
        "income_band": income_band,
        "store": store,
        "customer": customer,
        "customer_address": ca,
        "inventory": inv,
        "catalog_sales": cs,
        "catalog_returns": cr,
        "store_sales": ss,
        "store_returns": sr,
        "web_sales": ws,
        "web_returns": wr,
    }


@pytest.fixture(scope="module")
def tpcds(spark, tmp_path_factory):
    """Write the mini tables as parquet once; register Spark temp views
    and a DuckDB connection with views over the SAME files."""
    import duckdb

    root = tmp_path_factory.mktemp("tpcds")
    con = duckdb.connect()
    # ANSI leaves null ordering to the engine: Spark sorts NULLS FIRST on
    # ASC, DuckDB defaults NULLS LAST — align them so LIMIT cutoffs under
    # the templates' ORDER BY (rollup rows carry NULL keys) agree
    con.execute("SET default_null_order='nulls_first'")
    for name, pdf in _gen_tables().items():
        sdf = spark.createDataFrame(pdf)
        if "d_date" in pdf.columns:
            from pyspark.sql import functions as F

            sdf = sdf.withColumn("d_date", F.col("d_date").cast("date"))
        path = str(root / name)
        sdf.coalesce(1).write.mode("overwrite").parquet(path)
        spark.read.parquet(path).createOrReplaceTempView(name)
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}/*.parquet')"
        )
    yield spark, con
    con.close()


def _compare(spark, con, sql, ordered, min_rows=1, oracle_sql=None, check_names=True, approx=False, nonnull=False):
    from incubator_flink_spark.api.table import TableEnvironment

    env = TableEnvironment(spark)
    got_df = env.sql_query(sql).to_df()
    cols = got_df.columns
    got = [tuple(r) for r in got_df.collect()]
    want_pdf = con.execute(oracle_sql or sql).fetchdf()
    if check_names:
        # positional compare only for queries whose template emits
        # duplicate output names (q64) — engines disambiguate differently
        assert [c.lower() for c in want_pdf.columns] == [c.lower() for c in cols]
    want = [tuple(r) for r in want_pdf.itertuples(index=False, name=None)]

    def norm(rows):
        import decimal

        out = []
        for r in rows:
            vals = []
            for x in r:
                if isinstance(x, decimal.Decimal):
                    x = float(x)
                if isinstance(x, (pd.Timestamp, datetime.datetime)):
                    x = x.date()
                if isinstance(x, datetime.date):
                    x = str(x)
                if isinstance(x, (int, float, np.integer, np.floating)) and not isinstance(x, bool):
                    x = None if (isinstance(x, (float, np.floating)) and np.isnan(x)) else float(x)
                    if approx and x is not None:
                        # stddev_samp merge order differs between engines
                        # by last-ulp amounts: compare 10 significant digits
                        x = float(f"{x:.10g}")
                vals.append(x)
            out.append(tuple(vals))
        return out

    got_n, want_n = norm(got), norm(want)
    assert len(got_n) >= min_rows, f"suspiciously small result ({len(got_n)} rows)"
    if nonnull:
        assert all(v is not None for r in got_n for v in r), got_n
    if ordered:
        assert got_n == want_n
    else:
        assert sorted(got_n, key=repr) == sorted(want_n, key=repr)


# -------------------------------------------------------------- queries --

Q72 = """
select i_item_desc
      ,w_warehouse_name
      ,d1.d_week_seq
      ,sum(case when p_promo_sk is null then 1 else 0 end) no_promo
      ,sum(case when p_promo_sk is not null then 1 else 0 end) promo
      ,count(*) total_cnt
from catalog_sales
join inventory on (cs_item_sk = inv_item_sk)
join warehouse on (w_warehouse_sk = inv_warehouse_sk)
join item on (i_item_sk = cs_item_sk)
join customer_demographics on (cs_bill_cdemo_sk = cd_demo_sk)
join household_demographics on (cs_bill_hdemo_sk = hd_demo_sk)
join date_dim d1 on (cs_sold_date_sk = d1.d_date_sk)
join date_dim d2 on (inv_date_sk = d2.d_date_sk)
join date_dim d3 on (cs_ship_date_sk = d3.d_date_sk)
left outer join promotion on (cs_promo_sk = p_promo_sk)
left outer join catalog_returns on (cr_item_sk = cs_item_sk and cr_order_number = cs_order_number)
where d1.d_week_seq = d2.d_week_seq
  and inv_quantity_on_hand < cs_quantity
  and d3.d_date > d1.d_date + 5
  and hd_buy_potential = '>10000'
  and d1.d_year = 1999
  and cd_marital_status = 'D'
group by i_item_desc, w_warehouse_name, d1.d_week_seq
order by total_cnt desc, i_item_desc, w_warehouse_name, d_week_seq
limit 100
"""

Q75 = """
with all_sales as (
 select d_year
       ,i_brand_id
       ,i_class_id
       ,i_category_id
       ,i_manufact_id
       ,sum(sales_cnt) as sales_cnt
       ,sum(sales_amt) as sales_amt
 from (select d_year
             ,i_brand_id
             ,i_class_id
             ,i_category_id
             ,i_manufact_id
             ,cs_quantity - coalesce(cr_return_quantity,0) as sales_cnt
             ,cs_ext_sales_price - coalesce(cr_return_amount,0.0) as sales_amt
       from catalog_sales join item on i_item_sk=cs_item_sk
                          join date_dim on d_date_sk=cs_sold_date_sk
                          left join catalog_returns on (cs_order_number=cr_order_number
                                                    and cs_item_sk=cr_item_sk)
       where i_category='Books'
       union
       select d_year
             ,i_brand_id
             ,i_class_id
             ,i_category_id
             ,i_manufact_id
             ,ss_quantity - coalesce(sr_return_quantity,0) as sales_cnt
             ,ss_ext_sales_price - coalesce(sr_return_amt,0.0) as sales_amt
       from store_sales join item on i_item_sk=ss_item_sk
                        join date_dim on d_date_sk=ss_sold_date_sk
                        left join store_returns on (ss_ticket_number=sr_ticket_number
                                                and ss_item_sk=sr_item_sk)
       where i_category='Books'
       union
       select d_year
             ,i_brand_id
             ,i_class_id
             ,i_category_id
             ,i_manufact_id
             ,ws_quantity - coalesce(wr_return_quantity,0) as sales_cnt
             ,ws_ext_sales_price - coalesce(wr_return_amt,0.0) as sales_amt
       from web_sales join item on i_item_sk=ws_item_sk
                      join date_dim on d_date_sk=ws_sold_date_sk
                      left join web_returns on (ws_order_number=wr_order_number
                                            and ws_item_sk=wr_item_sk)
       where i_category='Books') sales_detail
 group by d_year, i_brand_id, i_class_id, i_category_id, i_manufact_id)
select prev_yr.d_year as prev_year
      ,curr_yr.d_year as year
      ,curr_yr.i_brand_id
      ,curr_yr.i_class_id
      ,curr_yr.i_category_id
      ,curr_yr.i_manufact_id
      ,prev_yr.sales_cnt as prev_yr_cnt
      ,curr_yr.sales_cnt as curr_yr_cnt
      ,curr_yr.sales_cnt - prev_yr.sales_cnt as sales_cnt_diff
      ,curr_yr.sales_amt - prev_yr.sales_amt as sales_amt_diff
from all_sales curr_yr, all_sales prev_yr
where curr_yr.i_brand_id = prev_yr.i_brand_id
  and curr_yr.i_class_id = prev_yr.i_class_id
  and curr_yr.i_category_id = prev_yr.i_category_id
  and curr_yr.i_manufact_id = prev_yr.i_manufact_id
  and curr_yr.d_year = 2002
  and prev_yr.d_year = 2002 - 1
  and cast(curr_yr.sales_cnt as decimal(17,2)) / cast(prev_yr.sales_cnt as decimal(17,2)) < 0.9
order by sales_cnt_diff, sales_amt_diff
limit 100
"""

Q78 = """
with ws as
  (select d_year as ws_sold_year, ws_item_sk,
    ws_bill_customer_sk ws_customer_sk,
    sum(ws_quantity) ws_qty,
    sum(ws_wholesale_cost) ws_wc,
    sum(ws_sales_price) ws_sp
   from web_sales
   left join web_returns on wr_order_number = ws_order_number and ws_item_sk = wr_item_sk
   join date_dim on ws_sold_date_sk = d_date_sk
   where wr_order_number is null
   group by d_year, ws_item_sk, ws_bill_customer_sk
   ),
cs as
  (select d_year as cs_sold_year, cs_item_sk,
    cs_bill_customer_sk cs_customer_sk,
    sum(cs_quantity) cs_qty,
    sum(cs_wholesale_cost) cs_wc,
    sum(cs_sales_price) cs_sp
   from catalog_sales
   left join catalog_returns on cr_order_number = cs_order_number and cs_item_sk = cr_item_sk
   join date_dim on cs_sold_date_sk = d_date_sk
   where cr_order_number is null
   group by d_year, cs_item_sk, cs_bill_customer_sk
   ),
ss as
  (select d_year as ss_sold_year, ss_item_sk,
    ss_customer_sk,
    sum(ss_quantity) ss_qty,
    sum(ss_wholesale_cost) ss_wc,
    sum(ss_sales_price) ss_sp
   from store_sales
   left join store_returns on sr_ticket_number = ss_ticket_number and ss_item_sk = sr_item_sk
   join date_dim on ss_sold_date_sk = d_date_sk
   where sr_ticket_number is null
   group by d_year, ss_item_sk, ss_customer_sk
   )
select
  ss_sold_year, ss_item_sk, ss_customer_sk,
  round(ss_qty / (coalesce(ws_qty, 0) + coalesce(cs_qty, 0)), 2) ratio,
  ss_qty store_qty, ss_wc store_wholesale_cost, ss_sp store_sales_price,
  coalesce(ws_qty, 0) + coalesce(cs_qty, 0) other_chan_qty,
  coalesce(ws_wc, 0) + coalesce(cs_wc, 0) other_chan_wholesale_cost,
  coalesce(ws_sp, 0) + coalesce(cs_sp, 0) other_chan_sales_price
from ss
left join ws on (ws_sold_year = ss_sold_year and ws_item_sk = ss_item_sk and ws_customer_sk = ss_customer_sk)
left join cs on (cs_sold_year = ss_sold_year and cs_item_sk = ss_item_sk and cs_customer_sk = ss_customer_sk)
where (coalesce(ws_qty, 0) > 0 or coalesce(cs_qty, 0) > 0) and ss_sold_year = 2000
order by
  ss_sold_year, ss_item_sk, ss_customer_sk,
  ss_qty desc, ss_wc desc, ss_sp desc,
  other_chan_qty,
  other_chan_wholesale_cost,
  other_chan_sales_price,
  ratio
limit 100
"""


def test_tpcds_q72_text(tpcds):
    """q72 verbatim — the reference's hardest join-order case (fact x fact
    forward-week shortage join over 9 joins incl. a triple date_dim).
    Ordered compare: the ORDER BY ends in the (unique) group key.  The
    oracle text qualifies the trailing ORDER BY column (DuckDB binds it
    to the ambiguous input columns; Spark binds the output alias, which
    is what the template relies on)."""
    spark, con = tpcds
    _compare(
        spark, con, Q72, ordered=True, min_rows=5,
        oracle_sql=Q72.replace("w_warehouse_name, d_week_seq", "w_warehouse_name, d1.d_week_seq"),
    )


def test_tpcds_q75_text(tpcds):
    """q75 verbatim — 3-channel UNION (distinct) returns netting + YoY
    self-join with a decimal-division predicate. Sorted compare: the
    ORDER BY (sales_cnt_diff, sales_amt_diff) admits cross-group ties."""
    spark, con = tpcds
    _compare(spark, con, Q75, ordered=False, min_rows=3)


def test_tpcds_q78_text(tpcds):
    """q78 verbatim — per-(year,item,customer) channel rollups with
    returned-order exclusion via null-extended left joins."""
    spark, con = tpcds
    _compare(spark, con, Q78, ordered=False, min_rows=3)


Q64 = """
with cs_ui as
 (select cs_item_sk
        ,sum(cs_ext_list_price) as sale
        ,sum(cr_refunded_cash + cr_reversed_charge + cr_store_credit) as refund
  from catalog_sales
      ,catalog_returns
  where cs_item_sk = cr_item_sk
    and cs_order_number = cr_order_number
  group by cs_item_sk
  having sum(cs_ext_list_price) > 2 * sum(cr_refunded_cash + cr_reversed_charge + cr_store_credit)),
cross_sales as
 (select i_product_name product_name
     ,i_item_sk item_sk
     ,s_store_name store_name
     ,s_zip store_zip
     ,ad1.ca_street_number b_street_number
     ,ad1.ca_street_name b_street_name
     ,ad1.ca_city b_city
     ,ad1.ca_zip b_zip
     ,ad2.ca_street_number c_street_number
     ,ad2.ca_street_name c_street_name
     ,ad2.ca_city c_city
     ,ad2.ca_zip c_zip
     ,d1.d_year as syear
     ,d2.d_year as fsyear
     ,d3.d_year s2year
     ,count(*) cnt
     ,sum(ss_wholesale_cost) s1
     ,sum(ss_list_price) s2
     ,sum(ss_coupon_amt) s3
  from   store_sales
        ,store_returns
        ,cs_ui
        ,date_dim d1
        ,date_dim d2
        ,date_dim d3
        ,store
        ,customer
        ,customer_demographics cd1
        ,customer_demographics cd2
        ,promotion
        ,household_demographics hd1
        ,household_demographics hd2
        ,customer_address ad1
        ,customer_address ad2
        ,income_band ib1
        ,income_band ib2
        ,item
  where  ss_store_sk = s_store_sk and
         ss_sold_date_sk = d1.d_date_sk and
         ss_customer_sk = c_customer_sk and
         ss_cdemo_sk = cd1.cd_demo_sk and
         ss_hdemo_sk = hd1.hd_demo_sk and
         ss_addr_sk = ad1.ca_address_sk and
         ss_item_sk = i_item_sk and
         ss_item_sk = sr_item_sk and
         ss_ticket_number = sr_ticket_number and
         ss_item_sk = cs_ui.cs_item_sk and
         c_current_cdemo_sk = cd2.cd_demo_sk and
         c_current_hdemo_sk = hd2.hd_demo_sk and
         c_current_addr_sk = ad2.ca_address_sk and
         c_first_sales_date_sk = d2.d_date_sk and
         c_first_shipto_date_sk = d3.d_date_sk and
         ss_promo_sk = p_promo_sk and
         hd1.hd_income_band_sk = ib1.ib_income_band_sk and
         hd2.hd_income_band_sk = ib2.ib_income_band_sk and
         cd1.cd_marital_status <> cd2.cd_marital_status and
         i_color in ('purple','burlywood','indian','spring','floral','medium') and
         i_current_price between 64 and 64 + 10 and
         i_current_price between 64 + 1 and 64 + 15
group by i_product_name
       ,i_item_sk
       ,s_store_name
       ,s_zip
       ,ad1.ca_street_number
       ,ad1.ca_street_name
       ,ad1.ca_city
       ,ad1.ca_zip
       ,ad2.ca_street_number
       ,ad2.ca_street_name
       ,ad2.ca_city
       ,ad2.ca_zip
       ,d1.d_year
       ,d2.d_year
       ,d3.d_year
)
select cs1.product_name
     ,cs1.store_name
     ,cs1.store_zip
     ,cs1.b_street_number
     ,cs1.b_street_name
     ,cs1.b_city
     ,cs1.b_zip
     ,cs1.c_street_number
     ,cs1.c_street_name
     ,cs1.c_city
     ,cs1.c_zip
     ,cs1.syear
     ,cs1.cnt
     ,cs1.s1 as s11
     ,cs1.s2 as s21
     ,cs1.s3 as s31
     ,cs2.s1 as s12
     ,cs2.s2 as s22
     ,cs2.s3 as s32
     ,cs2.syear
     ,cs2.cnt
from cross_sales cs1, cross_sales cs2
where cs1.item_sk = cs2.item_sk and
     cs1.syear = 1999 and
     cs2.syear = 1999 + 1 and
     cs2.cnt <= cs1.cnt and
     cs1.store_name = cs2.store_name and
     cs1.store_zip = cs2.store_zip
order by cs1.product_name
       ,cs1.store_name
       ,cs2.cnt
       ,cs1.s1
       ,cs2.s1
"""


def test_tpcds_q64_text(tpcds):
    """q64 verbatim — the spec's largest single query: a 17-table
    cross_sales CTE (triple date_dim, paired demographics/addresses/
    income bands, returns-qualified items via the cs_ui HAVING) self-
    joined across consecutive years.  Sorted compare (the template's
    ORDER BY admits ties) and positional columns (the template emits
    duplicate output names syear/cnt)."""
    spark, con = tpcds
    _compare(spark, con, Q64, ordered=False, min_rows=1, check_names=False)


# ---------------------------------------------------------- round 8 ----
# Five more distinctive families (VERDICT r7 item 1): q14 (cross-channel
# INTERSECT + best-selling), q23 (frequent-item / best-customer CTE
# stack), q39 (inventory stdev correlation), q67 (rollup + windowed rank
# over it), q95 (EXISTS-chain over multi-warehouse web orders).  Public
# TPC-DS spec templates with qualification parameters; the only dialect
# substitutions (same discipline as the reference's TPC-H modified-query
# dir) are q95's double-quoted output aliases -> plain identifiers and
# its dsdgen-only "+ N days" date arithmetic -> interval syntax, so ONE
# text parses on both Spark and DuckDB.

Q14A = """
with cross_items as
 (select i_item_sk ss_item_sk
 from item,
 (select iss.i_brand_id brand_id
     ,iss.i_class_id class_id
     ,iss.i_category_id category_id
 from store_sales
     ,item iss
     ,date_dim d1
 where ss_item_sk = iss.i_item_sk
   and ss_sold_date_sk = d1.d_date_sk
   and d1.d_year between 1999 AND 1999 + 2
 intersect
 select ics.i_brand_id
     ,ics.i_class_id
     ,ics.i_category_id
 from catalog_sales
     ,item ics
     ,date_dim d2
 where cs_item_sk = ics.i_item_sk
   and cs_sold_date_sk = d2.d_date_sk
   and d2.d_year between 1999 AND 1999 + 2
 intersect
 select iws.i_brand_id
     ,iws.i_class_id
     ,iws.i_category_id
 from web_sales
     ,item iws
     ,date_dim d3
 where ws_item_sk = iws.i_item_sk
   and ws_sold_date_sk = d3.d_date_sk
   and d3.d_year between 1999 AND 1999 + 2) x
 where i_brand_id = brand_id
   and i_class_id = class_id
   and i_category_id = category_id
),
 avg_sales as
 (select avg(quantity*list_price) average_sales
  from (select ss_quantity quantity
             ,ss_list_price list_price
        from store_sales
            ,date_dim
        where ss_sold_date_sk = d_date_sk
          and d_year between 1999 and 1999 + 2
        union all
        select cs_quantity quantity
             ,cs_list_price list_price
        from catalog_sales
            ,date_dim
        where cs_sold_date_sk = d_date_sk
          and d_year between 1999 and 1999 + 2
        union all
        select ws_quantity quantity
             ,ws_list_price list_price
        from web_sales
            ,date_dim
        where ws_sold_date_sk = d_date_sk
          and d_year between 1999 and 1999 + 2) x)
select channel, i_brand_id,i_class_id,i_category_id,sum(sales),sum(number_sales)
 from(
       select 'store' channel, i_brand_id,i_class_id
             ,i_category_id,sum(ss_quantity*ss_list_price) sales
             , count(*) number_sales
       from store_sales
           ,item
           ,date_dim
       where ss_item_sk in (select ss_item_sk from cross_items)
         and ss_item_sk = i_item_sk
         and ss_sold_date_sk = d_date_sk
         and d_year = 1999+2
         and d_moy = 11
       group by i_brand_id,i_class_id,i_category_id
       having sum(ss_quantity*ss_list_price) > (select average_sales from avg_sales)
       union all
       select 'catalog' channel, i_brand_id,i_class_id,i_category_id, sum(cs_quantity*cs_list_price) sales, count(*) number_sales
       from catalog_sales
           ,item
           ,date_dim
       where cs_item_sk in (select ss_item_sk from cross_items)
         and cs_item_sk = i_item_sk
         and cs_sold_date_sk = d_date_sk
         and d_year = 1999+2
         and d_moy = 11
       group by i_brand_id,i_class_id,i_category_id
       having sum(cs_quantity*cs_list_price) > (select average_sales from avg_sales)
       union all
       select 'web' channel, i_brand_id,i_class_id,i_category_id, sum(ws_quantity*ws_list_price) sales , count(*) number_sales
       from web_sales
           ,item
           ,date_dim
       where ws_item_sk in (select ss_item_sk from cross_items)
         and ws_item_sk = i_item_sk
         and ws_sold_date_sk = d_date_sk
         and d_year = 1999+2
         and d_moy = 11
       group by i_brand_id,i_class_id,i_category_id
       having sum(ws_quantity*ws_list_price) > (select average_sales from avg_sales)
 ) y
 group by rollup (channel, i_brand_id,i_class_id,i_category_id)
 order by channel,i_brand_id,i_class_id,i_category_id
 limit 100
"""


def test_tpcds_q14a_text(tpcds):
    """q14a verbatim — 3-channel INTERSECT of (brand,class,category)
    triples feeding per-channel best-seller sums over a shared
    avg_sales scalar, rolled up.  Sorted compare: the trailing rollup
    rows tie on the (NULL-keyed) ORDER BY columns."""
    spark, con = tpcds
    _compare(spark, con, Q14A, ordered=False, min_rows=3)


Q14B = """
with cross_items as
 (select i_item_sk ss_item_sk
 from item,
 (select iss.i_brand_id brand_id
     ,iss.i_class_id class_id
     ,iss.i_category_id category_id
 from store_sales
     ,item iss
     ,date_dim d1
 where ss_item_sk = iss.i_item_sk
   and ss_sold_date_sk = d1.d_date_sk
   and d1.d_year between 1999 AND 1999 + 2
 intersect
 select ics.i_brand_id
     ,ics.i_class_id
     ,ics.i_category_id
 from catalog_sales
     ,item ics
     ,date_dim d2
 where cs_item_sk = ics.i_item_sk
   and cs_sold_date_sk = d2.d_date_sk
   and d2.d_year between 1999 AND 1999 + 2
 intersect
 select iws.i_brand_id
     ,iws.i_class_id
     ,iws.i_category_id
 from web_sales
     ,item iws
     ,date_dim d3
 where ws_item_sk = iws.i_item_sk
   and ws_sold_date_sk = d3.d_date_sk
   and d3.d_year between 1999 AND 1999 + 2) x
 where i_brand_id = brand_id
   and i_class_id = class_id
   and i_category_id = category_id
),
 avg_sales as
 (select avg(quantity*list_price) average_sales
  from (select ss_quantity quantity
             ,ss_list_price list_price
        from store_sales
            ,date_dim
        where ss_sold_date_sk = d_date_sk
          and d_year between 1999 and 1999 + 2
        union all
        select cs_quantity quantity
             ,cs_list_price list_price
        from catalog_sales
            ,date_dim
        where cs_sold_date_sk = d_date_sk
          and d_year between 1999 and 1999 + 2
        union all
        select ws_quantity quantity
             ,ws_list_price list_price
        from web_sales
            ,date_dim
        where ws_sold_date_sk = d_date_sk
          and d_year between 1999 and 1999 + 2) x)
select this_year.channel ty_channel
                        ,this_year.i_brand_id ty_brand
                        ,this_year.i_class_id ty_class
                        ,this_year.i_category_id ty_category
                        ,this_year.sales ty_sales
                        ,this_year.number_sales ty_number_sales
                        ,last_year.channel ly_channel
                        ,last_year.i_brand_id ly_brand
                        ,last_year.i_class_id ly_class
                        ,last_year.i_category_id ly_category
                        ,last_year.sales ly_sales
                        ,last_year.number_sales ly_number_sales
 from
 (select 'store' channel, i_brand_id,i_class_id,i_category_id
        ,sum(ss_quantity*ss_list_price) sales, count(*) number_sales
 from store_sales
     ,item
     ,date_dim
 where ss_item_sk in (select ss_item_sk from cross_items)
   and ss_item_sk = i_item_sk
   and ss_sold_date_sk = d_date_sk
   and d_week_seq = (select d_week_seq
                     from date_dim
                     where d_year = 1999 + 1
                       and d_moy = 12
                       and d_dom = 11)
 group by i_brand_id,i_class_id,i_category_id
 having sum(ss_quantity*ss_list_price) > (select average_sales from avg_sales)) this_year,
 (select 'store' channel, i_brand_id,i_class_id
        ,i_category_id, sum(ss_quantity*ss_list_price) sales, count(*) number_sales
 from store_sales
     ,item
     ,date_dim
 where ss_item_sk in (select ss_item_sk from cross_items)
   and ss_item_sk = i_item_sk
   and ss_sold_date_sk = d_date_sk
   and d_week_seq = (select d_week_seq
                     from date_dim
                     where d_year = 1999
                       and d_moy = 12
                       and d_dom = 11)
 group by i_brand_id,i_class_id,i_category_id
 having sum(ss_quantity*ss_list_price) > (select average_sales from avg_sales)) last_year
 where this_year.i_brand_id= last_year.i_brand_id
   and this_year.i_class_id = last_year.i_class_id
   and this_year.i_category_id = last_year.i_category_id
 order by this_year.channel, this_year.i_brand_id, this_year.i_class_id, this_year.i_category_id
 limit 100
"""


def test_tpcds_q14b_text(tpcds):
    """q14b verbatim — the week-over-year variant: this-year vs last-year
    store sales for the week containing Dec 11, joined on the INTERSECTed
    item triples, each leg gated by the shared avg_sales scalar."""
    spark, con = tpcds
    _compare(spark, con, Q14B, ordered=False, min_rows=1)


Q23A = """
with frequent_ss_items as
 (select substr(i_item_desc,1,30) itemdesc,i_item_sk item_sk,d_date solddate,count(*) cnt
  from store_sales
      ,date_dim
      ,item
  where ss_sold_date_sk = d_date_sk
    and ss_item_sk = i_item_sk
    and d_year in (2000,2000+1,2000+2,2000+3)
  group by substr(i_item_desc,1,30),i_item_sk,d_date
  having count(*) >4),
 max_store_sales as
 (select max(csales) tpcds_cmax
  from (select c_customer_sk,sum(ss_quantity*ss_sales_price) csales
        from store_sales
            ,customer
            ,date_dim
        where ss_customer_sk = c_customer_sk
         and ss_sold_date_sk = d_date_sk
         and d_year in (2000,2000+1,2000+2,2000+3)
        group by c_customer_sk) x),
 best_ss_customer as
 (select c_customer_sk,sum(ss_quantity*ss_sales_price) ssales
  from store_sales
      ,customer
  where ss_customer_sk = c_customer_sk
  group by c_customer_sk
  having sum(ss_quantity*ss_sales_price) > (95/100.0) * (select
  *
 from
 max_store_sales))
  select sum(sales)
 from (select cs_quantity*cs_list_price sales
       from catalog_sales
           ,date_dim
       where d_year = 2000
         and d_moy = 2
         and cs_sold_date_sk = d_date_sk
         and cs_item_sk in (select item_sk from frequent_ss_items)
         and cs_bill_customer_sk in (select c_customer_sk from best_ss_customer)
      union all
      select ws_quantity*ws_list_price sales
       from web_sales
           ,date_dim
       where d_year = 2000
         and d_moy = 2
         and ws_sold_date_sk = d_date_sk
         and ws_item_sk in (select item_sk from frequent_ss_items)
         and ws_bill_customer_sk in (select c_customer_sk from best_ss_customer)) y
 limit 100
"""


def test_tpcds_q23a_text(tpcds):
    """q23a verbatim — the frequent-item (count>4 per item+day) /
    best-customer (within 5% of the max store spend) CTE stack feeding a
    cross-channel Feb-2000 purchase sum."""
    spark, con = tpcds
    _compare(spark, con, Q23A, ordered=True, min_rows=1)


Q23B = """
with frequent_ss_items as
 (select substr(i_item_desc,1,30) itemdesc,i_item_sk item_sk,d_date solddate,count(*) cnt
  from store_sales
      ,date_dim
      ,item
  where ss_sold_date_sk = d_date_sk
    and ss_item_sk = i_item_sk
    and d_year in (2000,2000+1,2000+2,2000+3)
  group by substr(i_item_desc,1,30),i_item_sk,d_date
  having count(*) >4),
 max_store_sales as
 (select max(csales) tpcds_cmax
  from (select c_customer_sk,sum(ss_quantity*ss_sales_price) csales
        from store_sales
            ,customer
            ,date_dim
        where ss_customer_sk = c_customer_sk
         and ss_sold_date_sk = d_date_sk
         and d_year in (2000,2000+1,2000+2,2000+3)
        group by c_customer_sk) x),
 best_ss_customer as
 (select c_customer_sk,sum(ss_quantity*ss_sales_price) ssales
  from store_sales
      ,customer
  where ss_customer_sk = c_customer_sk
  group by c_customer_sk
  having sum(ss_quantity*ss_sales_price) > (95/100.0) * (select
  *
 from max_store_sales))
  select c_last_name,c_first_name,sales
 from (select c_last_name,c_first_name,sum(cs_quantity*cs_list_price) sales
        from catalog_sales
            ,customer
            ,date_dim
        where d_year = 2000
         and d_moy = 2
         and cs_sold_date_sk = d_date_sk
         and cs_item_sk in (select item_sk from frequent_ss_items)
         and cs_bill_customer_sk in (select c_customer_sk from best_ss_customer)
         and cs_bill_customer_sk = c_customer_sk
       group by c_last_name,c_first_name
      union all
      select c_last_name,c_first_name,sum(ws_quantity*ws_list_price) sales
       from web_sales
           ,customer
           ,date_dim
       where d_year = 2000
         and d_moy = 2
         and ws_sold_date_sk = d_date_sk
         and ws_item_sk in (select item_sk from frequent_ss_items)
         and ws_bill_customer_sk in (select c_customer_sk from best_ss_customer)
         and ws_bill_customer_sk = c_customer_sk
       group by c_last_name,c_first_name) y
     order by c_last_name,c_first_name,sales
  limit 100
"""


def test_tpcds_q23b_text(tpcds):
    """q23b verbatim — same CTE stack, per-customer-name channel sums."""
    spark, con = tpcds
    _compare(spark, con, Q23B, ordered=True, min_rows=1)


Q39A = """
with inv as
(select w_warehouse_name,w_warehouse_sk,i_item_sk,d_moy
       ,stdev,mean, case mean when 0 then null else stdev/mean end cov
 from(select w_warehouse_name,w_warehouse_sk,i_item_sk,d_moy
            ,stddev_samp(inv_quantity_on_hand) stdev,avg(inv_quantity_on_hand) mean
      from inventory
          ,item
          ,warehouse
          ,date_dim
      where inv_item_sk = i_item_sk
        and inv_warehouse_sk = w_warehouse_sk
        and inv_date_sk = d_date_sk
        and d_year =2001
      group by w_warehouse_name,w_warehouse_sk,i_item_sk,d_moy) foo
 where case mean when 0 then 0 else stdev/mean end > 1)
select inv1.w_warehouse_sk,inv1.i_item_sk,inv1.d_moy,inv1.mean, inv1.cov
        ,inv2.w_warehouse_sk,inv2.i_item_sk,inv2.d_moy,inv2.mean, inv2.cov
from inv inv1,inv inv2
where inv1.i_item_sk = inv2.i_item_sk
  and inv1.w_warehouse_sk =  inv2.w_warehouse_sk
  and inv1.d_moy=1
  and inv2.d_moy=1+1
order by inv1.w_warehouse_sk,inv1.i_item_sk,inv1.d_moy,inv1.mean,inv1.cov
        ,inv2.d_moy,inv2.mean, inv2.cov
"""

Q39B = Q39A.replace(
    "  and inv1.d_moy=1\n  and inv2.d_moy=1+1",
    "  and inv1.d_moy=1\n  and inv2.d_moy=1+1\n  and inv1.cov > 1.5",
)


def test_tpcds_q39a_text(tpcds):
    """q39a verbatim — per-(warehouse,item,month) inventory coefficient of
    variation (stddev_samp/mean > 1) self-joined Jan-vs-Feb.  Positional
    columns (the template emits duplicate output names) and 10-sig-digit
    compare: the engines' stddev merge orders differ by last-ulp."""
    spark, con = tpcds
    _compare(spark, con, Q39A, ordered=True, min_rows=2, check_names=False, approx=True)


def test_tpcds_q39b_text(tpcds):
    """q39b verbatim — q39a plus the cov > 1.5 January gate."""
    spark, con = tpcds
    _compare(spark, con, Q39B, ordered=True, min_rows=1, check_names=False, approx=True)


Q67 = """
select  *
from (select i_category
            ,i_class
            ,i_brand
            ,i_product_name
            ,d_year
            ,d_qoy
            ,d_moy
            ,s_store_id
            ,sumsales
            ,rank() over (partition by i_category order by sumsales desc) rk
      from (select i_category
                  ,i_class
                  ,i_brand
                  ,i_product_name
                  ,d_year
                  ,d_qoy
                  ,d_moy
                  ,s_store_id
                  ,sum(coalesce(ss_sales_price*ss_quantity,0)) sumsales
            from store_sales
                ,date_dim
                ,store
                ,item
       where  ss_sold_date_sk=d_date_sk
          and ss_item_sk=i_item_sk
          and ss_store_sk = s_store_sk
          and d_month_seq between 1200 and 1200+11
       group by  rollup(i_category, i_class, i_brand, i_product_name, d_year, d_qoy, d_moy,s_store_id))dw1) dw2
where rk <= 100
order by i_category
        ,i_class
        ,i_brand
        ,i_product_name
        ,d_year
        ,d_qoy
        ,d_moy
        ,s_store_id
        ,sumsales
        ,rk
limit 100
"""


def test_tpcds_q67_text(tpcds):
    """q67 verbatim — 8-level ROLLUP over a year of store sales with a
    per-category rank() over the rollup rows, top-100.  The fixture pins
    DuckDB to NULLS FIRST so the LIMIT cutoff under the NULL-keyed ORDER
    BY agrees with Spark's ASC default."""
    spark, con = tpcds
    _compare(spark, con, Q67, ordered=True, min_rows=10)


Q95 = """
with ws_wh as
(select ws1.ws_order_number,ws1.ws_warehouse_sk wh1,ws2.ws_warehouse_sk wh2
 from web_sales ws1,web_sales ws2
 where ws1.ws_order_number = ws2.ws_order_number
   and ws1.ws_warehouse_sk <> ws2.ws_warehouse_sk)
 select
   count(distinct ws_order_number) as order_count
  ,sum(ws_ext_ship_cost) as total_shipping_cost
  ,sum(ws_net_profit) as total_net_profit
from
   web_sales ws1
  ,date_dim
  ,customer_address
  ,web_site
where
    d_date between '1999-2-01' and
           (cast('1999-2-01' as date) + interval '60' day)
and ws1.ws_ship_date_sk = d_date_sk
and ws1.ws_ship_addr_sk = ca_address_sk
and ca_state = 'IL'
and ws1.ws_web_site_sk = web_site_sk
and web_company_name = 'pri'
and ws1.ws_order_number in (select ws_order_number
                            from ws_wh)
and ws1.ws_order_number in (select wr_order_number
                            from web_returns,ws_wh
                            where wr_order_number = ws_wh.ws_order_number)
order by count(distinct ws_order_number)
limit 100
"""


def test_tpcds_q95_text(tpcds):
    """q95 verbatim (dialect: quoted aliases -> identifiers, '+ 60 days'
    -> interval) — returned multi-warehouse web orders shipped to IL via
    site 'pri': a self-join CTE probed through two IN-subqueries."""
    spark, con = tpcds
    _compare(spark, con, Q95, ordered=True, min_rows=1)


# Reporting family (brand/category monthly sums) + windowed revenue ratio
# — public spec templates, qualification parameters.  q98's dsdgen-only
# "+ 30 days" is the interval substitution (same dialect discipline as q95).

Q3 = """
select dt.d_year
       ,item.i_brand_id brand_id
       ,item.i_brand brand
       ,sum(ss_ext_sales_price) sum_agg
 from  date_dim dt
      ,store_sales
      ,item
 where dt.d_date_sk = store_sales.ss_sold_date_sk
   and store_sales.ss_item_sk = item.i_item_sk
   and item.i_manufact_id = 128
   and dt.d_moy=11
 group by dt.d_year
      ,item.i_brand_id
      ,item.i_brand
 order by dt.d_year
         ,sum_agg desc
         ,brand_id
 limit 100
"""

Q42 = """
select dt.d_year
 	,item.i_category_id
 	,item.i_category
 	,sum(ss_ext_sales_price)
 from 	date_dim dt
 	,store_sales
 	,item
 where dt.d_date_sk = store_sales.ss_sold_date_sk
 	and store_sales.ss_item_sk = item.i_item_sk
 	and item.i_manager_id = 1
 	and dt.d_moy=11
 	and dt.d_year=2000
 group by 	dt.d_year
 		,item.i_category_id
 		,item.i_category
 order by       sum(ss_ext_sales_price) desc,dt.d_year
 		,item.i_category_id
 		,item.i_category
limit 100
"""

Q52 = """
select dt.d_year
 	,item.i_brand_id brand_id
 	,item.i_brand brand
 	,sum(ss_ext_sales_price) ext_price
 from date_dim dt
     ,store_sales
     ,item
 where dt.d_date_sk = store_sales.ss_sold_date_sk
    and store_sales.ss_item_sk = item.i_item_sk
    and item.i_manager_id = 1
    and dt.d_moy=11
    and dt.d_year=2000
 group by dt.d_year
 	,item.i_brand_id
 	,item.i_brand
 order by dt.d_year
 	,ext_price desc
 	,brand_id
limit 100
"""

Q55 = """
select i_brand_id brand_id, i_brand brand,
 	sum(ss_ext_sales_price) ext_price
 from date_dim, store_sales, item
 where d_date_sk = ss_sold_date_sk
 	and ss_item_sk = i_item_sk
 	and i_manager_id=28
 	and d_moy=11
 	and d_year=1999
 group by i_brand_id, i_brand
 order by ext_price desc, brand_id
limit 100
"""

Q98 = """
select i_item_id
      ,i_item_desc
      ,i_category
      ,i_class
      ,i_current_price
      ,sum(ss_ext_sales_price) as itemrevenue
      ,sum(ss_ext_sales_price)*100/sum(sum(ss_ext_sales_price)) over
          (partition by i_class) as revenueratio
from
	store_sales
    	,item
    	,date_dim
where
	ss_item_sk = i_item_sk
  	and i_category in ('Sports', 'Books', 'Home')
  	and ss_sold_date_sk = d_date_sk
	and d_date between cast('1999-02-22' as date)
				and (cast('1999-02-22' as date) + interval '30' day)
group by
	i_item_id
        ,i_item_desc
        ,i_category
        ,i_class
        ,i_current_price
order by
	i_category
        ,i_class
        ,i_item_id
        ,i_item_desc
        ,revenueratio
"""


def test_tpcds_q3_text(tpcds):
    """q3 verbatim — per-year November brand sums for one manufacturer."""
    spark, con = tpcds
    _compare(spark, con, Q3, ordered=False, min_rows=3)


def test_tpcds_q42_text(tpcds):
    """q42 verbatim — Nov-2000 category sums for manager 1 (unnamed
    aggregate column round-trips both engines' naming)."""
    spark, con = tpcds
    _compare(spark, con, Q42, ordered=False, min_rows=1)


def test_tpcds_q52_text(tpcds):
    """q52 verbatim — Nov-2000 brand sums for manager 1."""
    spark, con = tpcds
    _compare(spark, con, Q52, ordered=False, min_rows=1)


def test_tpcds_q55_text(tpcds):
    """q55 verbatim — Nov-1999 brand sums for manager 28."""
    spark, con = tpcds
    _compare(spark, con, Q55, ordered=False, min_rows=1)


def test_tpcds_q98_text(tpcds):
    """q98 verbatim (interval dialect) — per-item revenue with a
    windowed per-class revenue ratio over a 30-day window."""
    spark, con = tpcds
    _compare(spark, con, Q98, ordered=True, min_rows=5)


# Demographics / time-of-day / multi-channel-by-address families —
# public spec templates, qualification parameters.

Q7 = """
select i_item_id,
        avg(ss_quantity) agg1,
        avg(ss_list_price) agg2,
        avg(ss_coupon_amt) agg3,
        avg(ss_sales_price) agg4
 from store_sales, customer_demographics, date_dim, item, promotion
 where ss_sold_date_sk = d_date_sk and
       ss_item_sk = i_item_sk and
       ss_cdemo_sk = cd_demo_sk and
       ss_promo_sk = p_promo_sk and
       cd_gender = 'M' and
       cd_marital_status = 'S' and
       cd_education_status = 'College' and
       (p_channel_email = 'N' or p_channel_event = 'N') and
       d_year = 2000
 group by i_item_id
 order by i_item_id
 limit 100
"""

Q26 = """
select i_item_id,
        avg(cs_quantity) agg1,
        avg(cs_list_price) agg2,
        avg(cs_coupon_amt) agg3,
        avg(cs_sales_price) agg4
 from catalog_sales, customer_demographics, date_dim, item, promotion
 where cs_sold_date_sk = d_date_sk and
       cs_item_sk = i_item_sk and
       cs_bill_cdemo_sk = cd_demo_sk and
       cs_promo_sk = p_promo_sk and
       cd_gender = 'M' and
       cd_marital_status = 'S' and
       cd_education_status = 'College' and
       (p_channel_email = 'N' or p_channel_event = 'N') and
       d_year = 2000
 group by i_item_id
 order by i_item_id
 limit 100
"""

Q45 = """
select ca_zip, ca_city, sum(ws_sales_price)
 from web_sales, customer, customer_address, date_dim, item
 where ws_bill_customer_sk = c_customer_sk
 	and c_current_addr_sk = ca_address_sk
 	and ws_item_sk = i_item_sk
 	and ( substr(ca_zip,1,5) in ('85669', '86197','88274','83405','86475', '85392', '85460', '80348', '81792')
 	      or
 	      i_item_id in (select i_item_id
                             from item
                             where i_item_sk in (2, 3, 5, 7, 11, 13, 17, 19, 23, 29)
                             )
 	    )
 	and ws_sold_date_sk = d_date_sk
 	and d_qoy = 2 and d_year = 2001
 group by ca_zip, ca_city
 order by ca_zip, ca_city
 limit 100
"""

Q56 = """
with ssales as
 (select i_item_id,sum(ss_ext_sales_price) total_sales
 from
 	store_sales,
 	date_dim,
         customer_address,
         item
 where i_item_id in (select
     i_item_id
from item
where i_color in ('slate','blanched','burnished'))
 and     ss_item_sk              = i_item_sk
 and     ss_sold_date_sk         = d_date_sk
 and     d_year                  = 2001
 and     d_moy                   = 2
 and     ss_addr_sk              = ca_address_sk
 and     ca_gmt_offset           = -5
 group by i_item_id),
 csales as
 (select i_item_id,sum(cs_ext_sales_price) total_sales
 from
 	catalog_sales,
 	date_dim,
         customer_address,
         item
 where
         i_item_id               in (select
  i_item_id
from item
where i_color in ('slate','blanched','burnished'))
 and     cs_item_sk              = i_item_sk
 and     cs_sold_date_sk         = d_date_sk
 and     d_year                  = 2001
 and     d_moy                   = 2
 and     cs_bill_addr_sk         = ca_address_sk
 and     ca_gmt_offset           = -5
 group by i_item_id),
 wsales as
 (select i_item_id,sum(ws_ext_sales_price) total_sales
 from
 	web_sales,
 	date_dim,
         customer_address,
         item
 where
         i_item_id               in (select
  i_item_id
from item
where i_color in ('slate','blanched','burnished'))
 and     ws_item_sk              = i_item_sk
 and     ws_sold_date_sk         = d_date_sk
 and     d_year                  = 2001
 and     d_moy                   = 2
 and     ws_bill_addr_sk         = ca_address_sk
 and     ca_gmt_offset           = -5
 group by i_item_id)
 select  i_item_id ,sum(total_sales) total_sales
 from  (select * from ssales
        union all
        select * from csales
        union all
        select * from wsales) tmp1
 group by i_item_id
 order by total_sales
 limit 100
"""

Q96 = """
select  count(*)
from store_sales
    ,household_demographics
    ,time_dim, store
where ss_sold_time_sk = time_dim.t_time_sk
    and ss_hdemo_sk = household_demographics.hd_demo_sk
    and ss_store_sk = s_store_sk
    and time_dim.t_hour = 20
    and time_dim.t_minute >= 30
    and household_demographics.hd_dep_count = 7
    and store.s_store_name = 'ese'
order by count(*)
limit 100
"""

Q88 = """
select  *
from
 (select count(*) h8_30_to_9
 from store_sales, household_demographics , time_dim, store
 where ss_sold_time_sk = time_dim.t_time_sk
     and ss_hdemo_sk = household_demographics.hd_demo_sk
     and ss_store_sk = s_store_sk
     and time_dim.t_hour = 8
     and time_dim.t_minute >= 30
     and ((household_demographics.hd_dep_count = 4 and household_demographics.hd_vehicle_count<=4+2) or
          (household_demographics.hd_dep_count = 2 and household_demographics.hd_vehicle_count<=2+2) or
          (household_demographics.hd_dep_count = 0 and household_demographics.hd_vehicle_count<=0+2))
     and store.s_store_name = 'ese') s1,
 (select count(*) h9_to_9_30
 from store_sales, household_demographics , time_dim, store
 where ss_sold_time_sk = time_dim.t_time_sk
     and ss_hdemo_sk = household_demographics.hd_demo_sk
     and ss_store_sk = s_store_sk
     and time_dim.t_hour = 9
     and time_dim.t_minute < 30
     and ((household_demographics.hd_dep_count = 4 and household_demographics.hd_vehicle_count<=4+2) or
          (household_demographics.hd_dep_count = 2 and household_demographics.hd_vehicle_count<=2+2) or
          (household_demographics.hd_dep_count = 0 and household_demographics.hd_vehicle_count<=0+2))
     and store.s_store_name = 'ese') s2,
 (select count(*) h9_30_to_10
 from store_sales, household_demographics , time_dim, store
 where ss_sold_time_sk = time_dim.t_time_sk
     and ss_hdemo_sk = household_demographics.hd_demo_sk
     and ss_store_sk = s_store_sk
     and time_dim.t_hour = 9
     and time_dim.t_minute >= 30
     and ((household_demographics.hd_dep_count = 4 and household_demographics.hd_vehicle_count<=4+2) or
          (household_demographics.hd_dep_count = 2 and household_demographics.hd_vehicle_count<=2+2) or
          (household_demographics.hd_dep_count = 0 and household_demographics.hd_vehicle_count<=0+2))
     and store.s_store_name = 'ese') s3,
 (select count(*) h10_to_10_30
 from store_sales, household_demographics , time_dim, store
 where ss_sold_time_sk = time_dim.t_time_sk
     and ss_hdemo_sk = household_demographics.hd_demo_sk
     and ss_store_sk = s_store_sk
     and time_dim.t_hour = 10
     and time_dim.t_minute < 30
     and ((household_demographics.hd_dep_count = 4 and household_demographics.hd_vehicle_count<=4+2) or
          (household_demographics.hd_dep_count = 2 and household_demographics.hd_vehicle_count<=2+2) or
          (household_demographics.hd_dep_count = 0 and household_demographics.hd_vehicle_count<=0+2))
     and store.s_store_name = 'ese') s4,
 (select count(*) h10_30_to_11
 from store_sales, household_demographics , time_dim, store
 where ss_sold_time_sk = time_dim.t_time_sk
     and ss_hdemo_sk = household_demographics.hd_demo_sk
     and ss_store_sk = s_store_sk
     and time_dim.t_hour = 10
     and time_dim.t_minute >= 30
     and ((household_demographics.hd_dep_count = 4 and household_demographics.hd_vehicle_count<=4+2) or
          (household_demographics.hd_dep_count = 2 and household_demographics.hd_vehicle_count<=2+2) or
          (household_demographics.hd_dep_count = 0 and household_demographics.hd_vehicle_count<=0+2))
     and store.s_store_name = 'ese') s5,
 (select count(*) h11_to_11_30
 from store_sales, household_demographics , time_dim, store
 where ss_sold_time_sk = time_dim.t_time_sk
     and ss_hdemo_sk = household_demographics.hd_demo_sk
     and ss_store_sk = s_store_sk
     and time_dim.t_hour = 11
     and time_dim.t_minute < 30
     and ((household_demographics.hd_dep_count = 4 and household_demographics.hd_vehicle_count<=4+2) or
          (household_demographics.hd_dep_count = 2 and household_demographics.hd_vehicle_count<=2+2) or
          (household_demographics.hd_dep_count = 0 and household_demographics.hd_vehicle_count<=0+2))
     and store.s_store_name = 'ese') s6,
 (select count(*) h11_30_to_12
 from store_sales, household_demographics , time_dim, store
 where ss_sold_time_sk = time_dim.t_time_sk
     and ss_hdemo_sk = household_demographics.hd_demo_sk
     and ss_store_sk = s_store_sk
     and time_dim.t_hour = 11
     and time_dim.t_minute >= 30
     and ((household_demographics.hd_dep_count = 4 and household_demographics.hd_vehicle_count<=4+2) or
          (household_demographics.hd_dep_count = 2 and household_demographics.hd_vehicle_count<=2+2) or
          (household_demographics.hd_dep_count = 0 and household_demographics.hd_vehicle_count<=0+2))
     and store.s_store_name = 'ese') s7,
 (select count(*) h12_to_12_30
 from store_sales, household_demographics , time_dim, store
 where ss_sold_time_sk = time_dim.t_time_sk
     and ss_hdemo_sk = household_demographics.hd_demo_sk
     and ss_store_sk = s_store_sk
     and time_dim.t_hour = 12
     and time_dim.t_minute < 30
     and ((household_demographics.hd_dep_count = 4 and household_demographics.hd_vehicle_count<=4+2) or
          (household_demographics.hd_dep_count = 2 and household_demographics.hd_vehicle_count<=2+2) or
          (household_demographics.hd_dep_count = 0 and household_demographics.hd_vehicle_count<=0+2))
     and store.s_store_name = 'ese') s8
"""


def test_tpcds_q7_text(tpcds):
    """q7 verbatim — demographic/promotion store-sales averages."""
    spark, con = tpcds
    _compare(spark, con, Q7, ordered=True, min_rows=5)


def test_tpcds_q26_text(tpcds):
    """q26 verbatim — the catalog-channel twin of q7."""
    spark, con = tpcds
    _compare(spark, con, Q26, ordered=True, min_rows=3)


def test_tpcds_q45_text(tpcds):
    """q45 verbatim — web sales by city/zip, zip-list OR item-subquery
    disjunction (unnamed aggregate column)."""
    spark, con = tpcds
    _compare(spark, con, Q45, ordered=True, min_rows=3)


def test_tpcds_q56_text(tpcds):
    """q56 verbatim — per-item 3-channel February sums for color-picked
    items shipped to gmt-5 addresses."""
    spark, con = tpcds
    _compare(spark, con, Q56, ordered=False, min_rows=1)


def test_tpcds_q96_text(tpcds):
    """q96 verbatim — 20:30+ store-traffic count for dep_count=7.
    Positional columns: the engines name a bare count(*) differently
    (Spark count(1) vs DuckDB count_star())."""
    spark, con = tpcds
    _compare(spark, con, Q96, ordered=True, min_rows=1, check_names=False)


def test_tpcds_q88_text(tpcds):
    """q88 verbatim — 8 half-hour traffic counters cross-joined into one
    row (scalar-count cross join)."""
    spark, con = tpcds
    _compare(spark, con, Q88, ordered=True, min_rows=1)


# Excess-discount / inventory-window / warehouse-state families — public
# spec templates, qualification parameters; quoted output aliases and
# dsdgen "+ N days" arithmetic take the same dialect substitutions as q95.

Q32 = """
select  sum(cs_ext_discount_amt)  as excess_discount_amount
from
   catalog_sales
   ,item
   ,date_dim
where
i_manufact_id = 977
and i_item_sk = cs_item_sk
and d_date between '2000-01-27' and
        (cast('2000-01-27' as date) + interval '90' day)
and d_date_sk = cs_sold_date_sk
and cs_ext_discount_amt
     > (
         select
            1.3 * avg(cs_ext_discount_amt)
         from
            catalog_sales
           ,date_dim
         where
              cs_item_sk = i_item_sk
          and d_date between '2000-01-27' and
                             (cast('2000-01-27' as date) + interval '90' day)
          and d_date_sk = cs_sold_date_sk
      )
limit 100
"""

Q92 = """
select
   sum(ws_ext_discount_amt)  as excess_discount_amount
from
    web_sales
   ,item
   ,date_dim
where
i_manufact_id = 350
and i_item_sk = ws_item_sk
and d_date between '2000-01-27' and
        (cast('2000-01-27' as date) + interval '90' day)
and d_date_sk = ws_sold_date_sk
and ws_ext_discount_amt
     > (
         SELECT
            1.3 * avg(ws_ext_discount_amt)
         FROM
            web_sales
           ,date_dim
         WHERE
              ws_item_sk = i_item_sk
          and d_date between '2000-01-27' and
                             (cast('2000-01-27' as date) + interval '90' day)
          and d_date_sk = ws_sold_date_sk
      )
order by sum(ws_ext_discount_amt)
limit 100
"""

Q37 = """
select  i_item_id
       ,i_item_desc
       ,i_current_price
 from item, inventory, date_dim, catalog_sales
 where i_current_price between 68 and 68 + 30
 and inv_item_sk = i_item_sk
 and d_date_sk=inv_date_sk
 and d_date between cast('2000-02-01' as date) and (cast('2000-02-01' as date) + interval '60' day)
 and i_manufact_id in (677,940,694,808)
 and inv_quantity_on_hand between 100 and 500
 and cs_item_sk = i_item_sk
 group by i_item_id,i_item_desc,i_current_price
 order by i_item_id
 limit 100
"""

Q82 = """
select  i_item_id
       ,i_item_desc
       ,i_current_price
 from item, inventory, date_dim, store_sales
 where i_current_price between 62 and 62+30
 and inv_item_sk = i_item_sk
 and d_date_sk=inv_date_sk
 and d_date between cast('2000-05-25' as date) and (cast('2000-05-25' as date) + interval '60' day)
 and i_manufact_id in (129,270,821,423)
 and inv_quantity_on_hand between 100 and 500
 and ss_item_sk = i_item_sk
 group by i_item_id,i_item_desc,i_current_price
 order by i_item_id
 limit 100
"""

Q40 = """
select
   w_state
  ,i_item_id
  ,sum(case when (cast(d_date as date) < cast ('2000-03-11' as date))
 		then cs_sales_price - coalesce(cr_refunded_cash,0) else 0 end) as sales_before
  ,sum(case when (cast(d_date as date) >= cast ('2000-03-11' as date))
 		then cs_sales_price - coalesce(cr_refunded_cash,0) else 0 end) as sales_after
 from
   catalog_sales left outer join catalog_returns on
       (cs_order_number = cr_order_number
        and cs_item_sk = cr_item_sk)
  ,warehouse
  ,item
  ,date_dim
 where
     i_current_price between 0.99 and 1.49
 and i_item_sk          = cs_item_sk
 and cs_warehouse_sk    = w_warehouse_sk
 and cs_sold_date_sk    = d_date_sk
 and d_date between (cast ('2000-03-11' as date) - interval '30' day)
                and (cast ('2000-03-11' as date) + interval '30' day)
 group by
    w_state,i_item_id
 order by w_state,i_item_id
limit 100
"""


def test_tpcds_q32_text(tpcds):
    """q32 verbatim — catalog excess discount vs a correlated 1.3x
    per-item average."""
    spark, con = tpcds
    _compare(spark, con, Q32, ordered=True, min_rows=1, nonnull=True)


def test_tpcds_q92_text(tpcds):
    """q92 verbatim — the web twin of q32."""
    spark, con = tpcds
    _compare(spark, con, Q92, ordered=True, min_rows=1, nonnull=True)


def test_tpcds_q37_text(tpcds):
    """q37 verbatim — catalog-sold items with mid-range inventory in a
    60-day window."""
    spark, con = tpcds
    _compare(spark, con, Q37, ordered=True, min_rows=1)


def test_tpcds_q82_text(tpcds):
    """q82 verbatim — the store twin of q37."""
    spark, con = tpcds
    _compare(spark, con, Q82, ordered=True, min_rows=1)


def test_tpcds_q40_text(tpcds):
    """q40 verbatim — returns-netted catalog sales by warehouse state
    before/after a pivot date for dollar-priced items."""
    spark, con = tpcds
    _compare(spark, con, Q40, ordered=True, min_rows=1)


# Customer-behavior families: returns-above-average (q1), multi-line
# ticket demographics (q34/q73), bought-city vs home-city (q46/q68),
# store-traffic profit (q79) — public spec templates, qualification
# parameters.

Q1 = """
with customer_total_return as
(select sr_customer_sk as ctr_customer_sk
,sr_store_sk as ctr_store_sk
,sum(SR_RETURN_AMT) as ctr_total_return
from store_returns
,date_dim
where sr_returned_date_sk = d_date_sk
and d_year =2000
group by sr_customer_sk
,sr_store_sk)
 select  c_customer_id
from customer_total_return ctr1
,store
,customer
where ctr1.ctr_total_return > (select avg(ctr_total_return)*1.2
from customer_total_return ctr2
where ctr1.ctr_store_sk = ctr2.ctr_store_sk)
and s_store_sk = ctr1.ctr_store_sk
and s_state = 'TN'
and ctr1.ctr_customer_sk = c_customer_sk
order by c_customer_id
limit 100
"""

Q34 = """
select c_last_name
       ,c_first_name
       ,c_salutation
       ,c_preferred_cust_flag
       ,ss_ticket_number
       ,cnt from
   (select ss_ticket_number
          ,ss_customer_sk
          ,count(*) cnt
    from store_sales,date_dim,store,household_demographics
    where store_sales.ss_sold_date_sk = date_dim.d_date_sk
    and store_sales.ss_store_sk = store.s_store_sk
    and store_sales.ss_hdemo_sk = household_demographics.hd_demo_sk
    and (date_dim.d_dom between 1 and 3 or date_dim.d_dom between 25 and 28)
    and (household_demographics.hd_buy_potential = '>10000' or
         household_demographics.hd_buy_potential = 'unknown')
    and household_demographics.hd_vehicle_count > 0
    and (case when household_demographics.hd_vehicle_count > 0
	then household_demographics.hd_dep_count/ household_demographics.hd_vehicle_count
	else null
	end)  > 1.2
    and date_dim.d_year in (1999,1999+1,1999+2)
    and store.s_county in ('Williamson County','Williamson County','Williamson County','Williamson County',
                           'Williamson County','Williamson County','Williamson County','Williamson County')
    group by ss_ticket_number,ss_customer_sk) dn,customer
    where ss_customer_sk = c_customer_sk
      and cnt between 15 and 20
    order by c_last_name,c_first_name,c_salutation,c_preferred_cust_flag desc, ss_ticket_number
"""

Q73 = """
select c_last_name
       ,c_first_name
       ,c_salutation
       ,c_preferred_cust_flag
       ,ss_ticket_number
       ,cnt from
   (select ss_ticket_number
          ,ss_customer_sk
          ,count(*) cnt
    from store_sales,date_dim,store,household_demographics
    where store_sales.ss_sold_date_sk = date_dim.d_date_sk
    and store_sales.ss_store_sk = store.s_store_sk
    and store_sales.ss_hdemo_sk = household_demographics.hd_demo_sk
    and date_dim.d_dom between 1 and 2
    and (household_demographics.hd_buy_potential = '>10000' or
         household_demographics.hd_buy_potential = 'unknown')
    and household_demographics.hd_vehicle_count > 0
    and case when household_demographics.hd_vehicle_count > 0 then
             household_demographics.hd_dep_count/ household_demographics.hd_vehicle_count else null end > 1
    and date_dim.d_year in (1999,1999+1,1999+2)
    and store.s_county in ('Williamson County','Williamson County','Williamson County','Williamson County')
    group by ss_ticket_number,ss_customer_sk) dj,customer
    where ss_customer_sk = c_customer_sk
      and cnt between 1 and 5
    order by cnt desc, c_last_name asc
"""

Q46 = """
select c_last_name
       ,c_first_name
       ,ca_city
       ,bought_city
       ,ss_ticket_number
       ,amt,profit
 from
   (select ss_ticket_number
          ,ss_customer_sk
          ,ca_city bought_city
          ,sum(ss_coupon_amt) amt
          ,sum(ss_net_profit) profit
    from store_sales,date_dim,store,household_demographics,customer_address
    where store_sales.ss_sold_date_sk = date_dim.d_date_sk
    and store_sales.ss_store_sk = store.s_store_sk
    and store_sales.ss_hdemo_sk = household_demographics.hd_demo_sk
    and store_sales.ss_addr_sk = customer_address.ca_address_sk
    and (household_demographics.hd_dep_count = 4 or
         household_demographics.hd_vehicle_count= 3)
    and date_dim.d_dow in (6,0)
    and date_dim.d_year in (1999,1999+1,1999+2)
    and store.s_city in ('Fairview','Midway','Fairview','Fairview',
                         'Fairview')
    group by ss_ticket_number,ss_customer_sk,ss_addr_sk,ca_city) dn,customer,customer_address current_addr
    where ss_customer_sk = c_customer_sk
      and customer.c_current_addr_sk = current_addr.ca_address_sk
      and current_addr.ca_city <> bought_city
  order by c_last_name
          ,c_first_name
          ,ca_city
          ,bought_city
          ,ss_ticket_number
  limit 100
"""

Q68 = """
select  c_last_name
       ,c_first_name
       ,ca_city
       ,bought_city
       ,ss_ticket_number
       ,extended_price
       ,extended_tax
       ,list_price
 from (select ss_ticket_number
             ,ss_customer_sk
             ,ca_city bought_city
             ,sum(ss_ext_sales_price) extended_price
             ,sum(ss_ext_list_price) list_price
             ,sum(ss_ext_tax) extended_tax
       from store_sales
           ,date_dim
           ,store
           ,household_demographics
           ,customer_address
       where store_sales.ss_sold_date_sk = date_dim.d_date_sk
         and store_sales.ss_store_sk = store.s_store_sk
        and store_sales.ss_hdemo_sk = household_demographics.hd_demo_sk
        and store_sales.ss_addr_sk = customer_address.ca_address_sk
        and date_dim.d_dom between 1 and 2
        and (household_demographics.hd_dep_count = 4 or
             household_demographics.hd_vehicle_count= 3)
        and date_dim.d_year in (1999,1999+1,1999+2)
        and store.s_city in ('Fairview','Midway')
       group by ss_ticket_number
               ,ss_customer_sk
               ,ss_addr_sk,ca_city) dn
      ,customer
      ,customer_address current_addr
 where ss_customer_sk = c_customer_sk
   and customer.c_current_addr_sk = current_addr.ca_address_sk
   and current_addr.ca_city <> bought_city
 order by c_last_name
         ,ss_ticket_number
 limit 100
"""

Q79 = """
select
  c_last_name,c_first_name,substr(s_city,1,30),ss_ticket_number,amt,profit
  from
   (select ss_ticket_number
          ,ss_customer_sk
          ,store.s_city
          ,sum(ss_coupon_amt) amt
          ,sum(ss_net_profit) profit
  from store_sales,date_dim,store,household_demographics
  where store_sales.ss_sold_date_sk = date_dim.d_date_sk
  and store_sales.ss_store_sk = store.s_store_sk
  and store_sales.ss_hdemo_sk = household_demographics.hd_demo_sk
  and (household_demographics.hd_dep_count = 6 or household_demographics.hd_vehicle_count > 2)
  and date_dim.d_dow = 1
  and date_dim.d_year in (1998,1998+1,1998+2)
  and store.s_number_employees between 200 and 295
  group by ss_ticket_number,ss_customer_sk,ss_store_sk,store.s_city) ms,customer
  where ss_customer_sk = c_customer_sk
 order by c_last_name,c_first_name,substr(s_city,1,30), profit
limit 100
"""


def test_tpcds_q1_text(tpcds):
    """q1 verbatim — customers whose store returns exceed 1.2x their
    store's average (correlated CTE self-reference)."""
    spark, con = tpcds
    _compare(spark, con, Q1, ordered=True, min_rows=1)


def test_tpcds_q34_text(tpcds):
    """q34 verbatim — 15-20-line tickets for high-dependency households
    around month boundaries."""
    spark, con = tpcds
    _compare(spark, con, Q34, ordered=False, min_rows=5)


def test_tpcds_q73_text(tpcds):
    """q73 verbatim — the 1-5-line-ticket variant of q34."""
    spark, con = tpcds
    _compare(spark, con, Q73, ordered=False, min_rows=5)


def test_tpcds_q46_text(tpcds):
    """q46 verbatim — weekend tickets bought in a city different from the
    customer's home city."""
    spark, con = tpcds
    _compare(spark, con, Q46, ordered=False, min_rows=3)


def test_tpcds_q68_text(tpcds):
    """q68 verbatim — the month-boundary price/tax variant of q46."""
    spark, con = tpcds
    _compare(spark, con, Q68, ordered=False, min_rows=3)


def test_tpcds_q79_text(tpcds):
    """q79 verbatim — Monday profit per ticket at mid-size stores."""
    spark, con = tpcds
    _compare(spark, con, Q79, ordered=False, min_rows=5)


# Batch 5: inventory / bucket-report / channel-overlap / shipping
# families — public spec templates, qualification parameters (dialect:
# "+ N days" -> interval, quoted aliases -> identifiers, as before).

Q12 = """
select i_item_id
      ,i_item_desc
      ,i_category
      ,i_class
      ,i_current_price
      ,sum(ws_ext_sales_price) as itemrevenue
      ,sum(ws_ext_sales_price)*100/sum(sum(ws_ext_sales_price)) over
          (partition by i_class) as revenueratio
from
	web_sales
    	,item
    	,date_dim
where
	ws_item_sk = i_item_sk
  	and i_category in ('Sports', 'Books', 'Home')
  	and ws_sold_date_sk = d_date_sk
	and d_date between cast('1999-02-22' as date)
				and (cast('1999-02-22' as date) + interval '30' day)
group by
	i_item_id
        ,i_item_desc
        ,i_category
        ,i_class
        ,i_current_price
order by
	i_category
        ,i_class
        ,i_item_id
        ,i_item_desc
        ,revenueratio
limit 100
"""

Q20 = """
select i_item_id
       ,i_item_desc
       ,i_category
       ,i_class
       ,i_current_price
       ,sum(cs_ext_sales_price) as itemrevenue
       ,sum(cs_ext_sales_price)*100/sum(sum(cs_ext_sales_price)) over
           (partition by i_class) as revenueratio
 from	catalog_sales
     ,item
     ,date_dim
 where cs_item_sk = i_item_sk
   and i_category in ('Sports', 'Books', 'Home')
   and cs_sold_date_sk = d_date_sk
 and d_date between cast('1999-02-22' as date)
 				and (cast('1999-02-22' as date) + interval '30' day)
 group by i_item_id
         ,i_item_desc
         ,i_category
         ,i_class
         ,i_current_price
 order by i_category
         ,i_class
         ,i_item_id
         ,i_item_desc
         ,revenueratio
limit 100
"""

Q15 = """
select ca_zip
       ,sum(cs_sales_price)
 from catalog_sales
     ,customer
     ,customer_address
     ,date_dim
 where cs_bill_customer_sk = c_customer_sk
 	and c_current_addr_sk = ca_address_sk
 	and ( substr(ca_zip,1,5) in ('85669', '86197','88274','83405','86475',
                                   '85392', '85460', '80348', '81792')
 	      or ca_state in ('CA','WA','GA')
 	      or cs_sales_price > 500)
 	and cs_sold_date_sk = d_date_sk
 	and d_qoy = 2 and d_year = 2000
 group by ca_zip
 order by ca_zip
 limit 100
"""

Q21 = """
select *
 from(select w_warehouse_name
            ,i_item_id
            ,sum(case when (cast(d_date as date) < cast ('2000-03-11' as date))
	                then inv_quantity_on_hand
                      else 0 end) as inv_before
            ,sum(case when (cast(d_date as date) >= cast ('2000-03-11' as date))
                      then inv_quantity_on_hand
                      else 0 end) as inv_after
   from inventory
       ,warehouse
       ,item
       ,date_dim
   where i_current_price between 0.99 and 1.49
     and i_item_sk          = inv_item_sk
     and inv_warehouse_sk   = w_warehouse_sk
     and inv_date_sk    = d_date_sk
     and d_date between (cast ('2000-03-11' as date) - interval '30' day)
                    and (cast ('2000-03-11' as date) + interval '30' day)
   group by w_warehouse_name, i_item_id) x
 where (case when inv_before > 0
             then inv_after / inv_before
             else null
             end) between 2.0/3.0 and 3.0/2.0
 order by w_warehouse_name
         ,i_item_id
 limit 100
"""

Q22 = """
select i_product_name
             ,i_brand
             ,i_class
             ,i_category
             ,avg(inv_quantity_on_hand) qoh
       from inventory
           ,date_dim
           ,item
       where inv_date_sk=d_date_sk
              and inv_item_sk=i_item_sk
              and d_month_seq between 1200 and 1200 + 11
       group by rollup(i_product_name
                       ,i_brand
                       ,i_class
                       ,i_category)
order by qoh, i_product_name, i_brand, i_class, i_category
limit 100
"""

Q27 = """
select i_item_id,
        s_state, grouping(s_state) g_state,
        avg(ss_quantity) agg1,
        avg(ss_list_price) agg2,
        avg(ss_coupon_amt) agg3,
        avg(ss_sales_price) agg4
 from store_sales, customer_demographics, date_dim, store, item
 where ss_sold_date_sk = d_date_sk and
       ss_item_sk = i_item_sk and
       ss_store_sk = s_store_sk and
       ss_cdemo_sk = cd_demo_sk and
       cd_gender = 'M' and
       cd_marital_status = 'S' and
       cd_education_status = 'College' and
       d_year = 2000 and
       s_state in ('TN','TN', 'TN', 'TN', 'TN', 'TN')
 group by rollup (i_item_id, s_state)
 order by i_item_id
         ,s_state
 limit 100
"""

Q28 = """
select  *
from (select avg(ss_list_price) B1_LP
            ,count(ss_list_price) B1_CNT
            ,count(distinct ss_list_price) B1_CNTD
      from store_sales
      where ss_quantity between 0 and 5
        and (ss_list_price between 8 and 8+10
             or ss_coupon_amt between 459 and 459+1000
             or ss_wholesale_cost between 57 and 57+20)) B1,
     (select avg(ss_list_price) B2_LP
            ,count(ss_list_price) B2_CNT
            ,count(distinct ss_list_price) B2_CNTD
      from store_sales
      where ss_quantity between 6 and 10
        and (ss_list_price between 90 and 90+10
             or ss_coupon_amt between 2323 and 2323+1000
             or ss_wholesale_cost between 31 and 31+20)) B2,
     (select avg(ss_list_price) B3_LP
            ,count(ss_list_price) B3_CNT
            ,count(distinct ss_list_price) B3_CNTD
      from store_sales
      where ss_quantity between 11 and 15
        and (ss_list_price between 142 and 142+10
             or ss_coupon_amt between 12214 and 12214+1000
             or ss_wholesale_cost between 79 and 79+20)) B3,
     (select avg(ss_list_price) B4_LP
            ,count(ss_list_price) B4_CNT
            ,count(distinct ss_list_price) B4_CNTD
      from store_sales
      where ss_quantity between 16 and 20
        and (ss_list_price between 135 and 135+10
             or ss_coupon_amt between 6071 and 6071+1000
             or ss_wholesale_cost between 38 and 38+20)) B4,
     (select avg(ss_list_price) B5_LP
            ,count(ss_list_price) B5_CNT
            ,count(distinct ss_list_price) B5_CNTD
      from store_sales
      where ss_quantity between 21 and 25
        and (ss_list_price between 122 and 122+10
             or ss_coupon_amt between 836 and 836+1000
             or ss_wholesale_cost between 17 and 17+20)) B5,
     (select avg(ss_list_price) B6_LP
            ,count(ss_list_price) B6_CNT
            ,count(distinct ss_list_price) B6_CNTD
      from store_sales
      where ss_quantity between 26 and 30
        and (ss_list_price between 154 and 154+10
             or ss_coupon_amt between 7326 and 7326+1000
             or ss_wholesale_cost between 7 and 7+20)) B6
limit 100
"""

Q38 = """
select count(*) from (
    select distinct c_last_name, c_first_name, d_date
    from store_sales, date_dim, customer
          where store_sales.ss_sold_date_sk = date_dim.d_date_sk
      and store_sales.ss_customer_sk = customer.c_customer_sk
      and d_month_seq between 1200 and 1200 + 11
  intersect
    select distinct c_last_name, c_first_name, d_date
    from catalog_sales, date_dim, customer
          where catalog_sales.cs_sold_date_sk = date_dim.d_date_sk
      and catalog_sales.cs_bill_customer_sk = customer.c_customer_sk
      and d_month_seq between 1200 and 1200 + 11
  intersect
    select distinct c_last_name, c_first_name, d_date
    from web_sales, date_dim, customer
          where web_sales.ws_sold_date_sk = date_dim.d_date_sk
      and web_sales.ws_bill_customer_sk = customer.c_customer_sk
      and d_month_seq between 1200 and 1200 + 11
) hot_cust
limit 100
"""

Q87 = """
select count(*)
from ((select distinct c_last_name, c_first_name, d_date
       from store_sales, date_dim, customer
       where store_sales.ss_sold_date_sk = date_dim.d_date_sk
         and store_sales.ss_customer_sk = customer.c_customer_sk
         and d_month_seq between 1200 and 1200+11)
       except
      (select distinct c_last_name, c_first_name, d_date
       from catalog_sales, date_dim, customer
       where catalog_sales.cs_sold_date_sk = date_dim.d_date_sk
         and catalog_sales.cs_bill_customer_sk = customer.c_customer_sk
         and d_month_seq between 1200 and 1200+11)
       except
      (select distinct c_last_name, c_first_name, d_date
       from web_sales, date_dim, customer
       where web_sales.ws_sold_date_sk = date_dim.d_date_sk
         and web_sales.ws_bill_customer_sk = customer.c_customer_sk
         and d_month_seq between 1200 and 1200+11)
) cool_cust
"""

Q97 = """
with ssci as (
select ss_customer_sk customer_sk
      ,ss_item_sk item_sk
from store_sales,date_dim
where ss_sold_date_sk = d_date_sk
  and d_month_seq between 1200 and 1200+11
group by ss_customer_sk
        ,ss_item_sk),
csci as(
 select cs_bill_customer_sk customer_sk
      ,cs_item_sk item_sk
from catalog_sales,date_dim
where cs_sold_date_sk = d_date_sk
  and d_month_seq between 1200 and 1200+11
group by cs_bill_customer_sk
        ,cs_item_sk)
 select sum(case when ssci.customer_sk is not null and csci.customer_sk is null then 1 else 0 end) store_only
      ,sum(case when ssci.customer_sk is null and csci.customer_sk is not null then 1 else 0 end) catalog_only
      ,sum(case when ssci.customer_sk is not null and csci.customer_sk is not null then 1 else 0 end) store_and_catalog
from ssci full outer join csci on (ssci.customer_sk=csci.customer_sk
                               and ssci.item_sk = csci.item_sk)
limit 100
"""

Q94 = """
select
   count(distinct ws_order_number) as order_count
  ,sum(ws_ext_ship_cost) as total_shipping_cost
  ,sum(ws_net_profit) as total_net_profit
from
   web_sales ws1
  ,date_dim
  ,customer_address
  ,web_site
where
    d_date between '1999-2-01' and
           (cast('1999-2-01' as date) + interval '60' day)
and ws1.ws_ship_date_sk = d_date_sk
and ws1.ws_ship_addr_sk = ca_address_sk
and ca_state = 'IL'
and ws1.ws_web_site_sk = web_site_sk
and web_company_name = 'pri'
and exists (select *
            from web_sales ws2
            where ws1.ws_order_number = ws2.ws_order_number
              and ws1.ws_warehouse_sk <> ws2.ws_warehouse_sk)
and not exists(select *
               from web_returns wr1
               where ws1.ws_order_number = wr1.wr_order_number)
order by count(distinct ws_order_number)
limit 100
"""

Q86 = """
select
    sum(ws_net_paid) as total_sum
   ,i_category
   ,i_class
   ,grouping(i_category)+grouping(i_class) as lochierarchy
   ,rank() over (
 	partition by grouping(i_category)+grouping(i_class),
 	case when grouping(i_class) = 0 then i_category end
 	order by sum(ws_net_paid) desc) as rank_within_parent
 from
    web_sales
   ,date_dim       d1
   ,item
 where
    d1.d_month_seq between 1200 and 1200+11
 and d1.d_date_sk = ws_sold_date_sk
 and i_item_sk  = ws_item_sk
 group by rollup(i_category,i_class)
 order by
   lochierarchy desc,
   case when lochierarchy = 0 then i_category end,
   rank_within_parent
 limit 100
"""


def test_tpcds_q12_text(tpcds):
    """q12 verbatim — web per-item revenue with windowed per-class ratio."""
    spark, con = tpcds
    _compare(spark, con, Q12, ordered=True, min_rows=5)


def test_tpcds_q20_text(tpcds):
    """q20 verbatim — catalog per-item revenue with windowed ratio."""
    spark, con = tpcds
    _compare(spark, con, Q20, ordered=True, min_rows=5)


def test_tpcds_q15_text(tpcds):
    """q15 verbatim — Q2-2000 catalog sales by zip (zip-prefix OR state OR
    high-price disjunction)."""
    spark, con = tpcds
    _compare(spark, con, Q15, ordered=True, min_rows=5, check_names=False)


def test_tpcds_q21_text(tpcds):
    """q21 verbatim — inventory before/after ratio around a cutoff date
    for sub-$1.49 items."""
    spark, con = tpcds
    _compare(spark, con, Q21, ordered=True, min_rows=1)


def test_tpcds_q22_text(tpcds):
    """q22 verbatim — avg quantity-on-hand over a 12-month window, 4-level
    rollup (NULL-first ordering aligned)."""
    spark, con = tpcds
    _compare(spark, con, Q22, ordered=True, min_rows=50)


def test_tpcds_q27_text(tpcds):
    """q27 verbatim — demographic store-sales averages, rollup over
    (item, state) with grouping()."""
    spark, con = tpcds
    _compare(spark, con, Q27, ordered=True, min_rows=10)


def test_tpcds_q28_text(tpcds):
    """q28 verbatim — six quantity-bucket list-price profiles as a 6-way
    cross join of 1-row aggregates (empty buckets stay NULL/0)."""
    spark, con = tpcds
    _compare(spark, con, Q28, ordered=False, min_rows=1)


def test_tpcds_q38_text(tpcds):
    """q38 verbatim — 3-channel INTERSECT of distinct (name, date)
    shoppers (count(*) naming differs by engine)."""
    spark, con = tpcds
    _compare(spark, con, Q38, ordered=False, min_rows=1, check_names=False, nonnull=True)


def test_tpcds_q87_text(tpcds):
    """q87 verbatim — the EXCEPT twin of q38."""
    spark, con = tpcds
    _compare(spark, con, Q87, ordered=False, min_rows=1, check_names=False, nonnull=True)


def test_tpcds_q97_text(tpcds):
    """q97 verbatim — store/catalog shopper overlap via FULL OUTER JOIN
    on (customer, item)."""
    spark, con = tpcds
    _compare(spark, con, Q97, ordered=False, min_rows=1, nonnull=True)


def test_tpcds_q94_text(tpcds):
    """q94 verbatim — unreturned multi-warehouse web orders via
    correlated EXISTS / NOT EXISTS (q95's decorrelated twin)."""
    spark, con = tpcds
    _compare(spark, con, Q94, ordered=True, min_rows=1, nonnull=True)


def test_tpcds_q86_text(tpcds):
    """q86 verbatim — web net-paid rollup with rank-within-parent over
    grouping() keys."""
    spark, con = tpcds
    _compare(spark, con, Q86, ordered=False, min_rows=5)


# Batch 6: day-of-week / shipping-lag / county-growth / gross-margin
# rollup families — public spec templates, qualification parameters
# (dialect: quoted day-bucket aliases -> identifiers).

Q2 = """
with wscs as
 (select sold_date_sk
        ,sales_price
  from (select ws_sold_date_sk sold_date_sk
              ,ws_ext_sales_price sales_price
        from web_sales
        union all
        select cs_sold_date_sk sold_date_sk
              ,cs_ext_sales_price sales_price
        from catalog_sales)),
 wswscs as
 (select d_week_seq,
        sum(case when (d_day_name='Sunday') then sales_price else null end) sun_sales,
        sum(case when (d_day_name='Monday') then sales_price else null end) mon_sales,
        sum(case when (d_day_name='Tuesday') then sales_price else null end) tue_sales,
        sum(case when (d_day_name='Wednesday') then sales_price else null end) wed_sales,
        sum(case when (d_day_name='Thursday') then sales_price else null end) thu_sales,
        sum(case when (d_day_name='Friday') then sales_price else null end) fri_sales,
        sum(case when (d_day_name='Saturday') then sales_price else null end) sat_sales
 from wscs
     ,date_dim
 where d_date_sk = sold_date_sk
 group by d_week_seq)
 select d_week_seq1
       ,round(sun_sales1/sun_sales2,2)
       ,round(mon_sales1/mon_sales2,2)
       ,round(tue_sales1/tue_sales2,2)
       ,round(wed_sales1/wed_sales2,2)
       ,round(thu_sales1/thu_sales2,2)
       ,round(fri_sales1/fri_sales2,2)
       ,round(sat_sales1/sat_sales2,2)
 from
 (select wswscs.d_week_seq d_week_seq1
        ,sun_sales sun_sales1
        ,mon_sales mon_sales1
        ,tue_sales tue_sales1
        ,wed_sales wed_sales1
        ,thu_sales thu_sales1
        ,fri_sales fri_sales1
        ,sat_sales sat_sales1
  from wswscs,date_dim
  where date_dim.d_week_seq = wswscs.d_week_seq and
        d_year = 2001) y,
 (select wswscs.d_week_seq d_week_seq2
        ,sun_sales sun_sales2
        ,mon_sales mon_sales2
        ,tue_sales tue_sales2
        ,wed_sales wed_sales2
        ,thu_sales thu_sales2
        ,fri_sales fri_sales2
        ,sat_sales sat_sales2
  from wswscs
      ,date_dim
  where date_dim.d_week_seq = wswscs.d_week_seq and
        d_year = 2001+1) z
 where d_week_seq1=d_week_seq2-53
 order by d_week_seq1
"""

Q9 = """
select case when (select count(*)
                  from store_sales
                  where ss_quantity between 1 and 20) > 1000
            then (select avg(ss_ext_discount_amt)
                  from store_sales
                  where ss_quantity between 1 and 20)
            else (select avg(ss_net_paid)
                  from store_sales
                  where ss_quantity between 1 and 20) end bucket1 ,
       case when (select count(*)
                  from store_sales
                  where ss_quantity between 21 and 40) > 2000
            then (select avg(ss_ext_discount_amt)
                  from store_sales
                  where ss_quantity between 21 and 40)
            else (select avg(ss_net_paid)
                  from store_sales
                  where ss_quantity between 21 and 40) end bucket2,
       case when (select count(*)
                  from store_sales
                  where ss_quantity between 41 and 60) > 3000
            then (select avg(ss_ext_discount_amt)
                  from store_sales
                  where ss_quantity between 41 and 60)
            else (select avg(ss_net_paid)
                  from store_sales
                  where ss_quantity between 41 and 60) end bucket3,
       case when (select count(*)
                  from store_sales
                  where ss_quantity between 61 and 80) > 4000
            then (select avg(ss_ext_discount_amt)
                  from store_sales
                  where ss_quantity between 61 and 80)
            else (select avg(ss_net_paid)
                  from store_sales
                  where ss_quantity between 61 and 80) end bucket4,
       case when (select count(*)
                  from store_sales
                  where ss_quantity between 81 and 100) > 5000
            then (select avg(ss_ext_discount_amt)
                  from store_sales
                  where ss_quantity between 81 and 100)
            else (select avg(ss_net_paid)
                  from store_sales
                  where ss_quantity between 81 and 100) end bucket5
from reason
where r_reason_sk = 1
"""

Q31 = """
with ss as
 (select ca_county,d_qoy, d_year,sum(ss_ext_sales_price) as store_sales
 from store_sales,date_dim,customer_address
 where ss_sold_date_sk = d_date_sk
  and ss_addr_sk=ca_address_sk
 group by ca_county,d_qoy, d_year),
 ws as
 (select ca_county,d_qoy, d_year,sum(ws_ext_sales_price) as web_sales
 from web_sales,date_dim,customer_address
 where ws_sold_date_sk = d_date_sk
  and ws_bill_addr_sk=ca_address_sk
 group by ca_county,d_qoy, d_year)
 select
        ss1.ca_county
       ,ss1.d_year
       ,ws2.web_sales/ws1.web_sales web_q1_q2_increase
       ,ss2.store_sales/ss1.store_sales store_q1_q2_increase
       ,ws3.web_sales/ws2.web_sales web_q2_q3_increase
       ,ss3.store_sales/ss2.store_sales store_q2_q3_increase
 from
        ss ss1
       ,ss ss2
       ,ss ss3
       ,ws ws1
       ,ws ws2
       ,ws ws3
 where
    ss1.d_qoy = 1
    and ss1.d_year = 2000
    and ss1.ca_county = ss2.ca_county
    and ss2.d_qoy = 2
    and ss2.d_year = 2000
 and ss2.ca_county = ss3.ca_county
    and ss3.d_qoy = 3
    and ss3.d_year = 2000
    and ss1.ca_county = ws1.ca_county
    and ws1.d_qoy = 1
    and ws1.d_year = 2000
    and ws1.ca_county = ws2.ca_county
    and ws2.d_qoy = 2
    and ws2.d_year = 2000
    and ws1.ca_county = ws3.ca_county
    and ws3.d_qoy = 3
    and ws3.d_year = 2000
    and case when ws1.web_sales > 0 then ws2.web_sales/ws1.web_sales else null end
       > case when ss1.store_sales > 0 then ss2.store_sales/ss1.store_sales else null end
    and case when ws2.web_sales > 0 then ws3.web_sales/ws2.web_sales else null end
       > case when ss2.store_sales > 0 then ss3.store_sales/ss2.store_sales else null end
 order by ss1.ca_county
"""

Q33 = """
with ss as (
 select
          i_manufact_id,sum(ss_ext_sales_price) total_sales
 from
 	store_sales,
 	date_dim,
         customer_address,
         item
 where
         i_manufact_id in (select
  i_manufact_id
from
 item
where i_category in ('Books'))
 and     ss_item_sk              = i_item_sk
 and     ss_sold_date_sk         = d_date_sk
 and     d_year                  = 2000
 and     d_moy                   = 2
 and     ss_addr_sk              = ca_address_sk
 and     ca_gmt_offset           = -5
 group by i_manufact_id),
 cs as (
 select
          i_manufact_id,sum(cs_ext_sales_price) total_sales
 from
 	catalog_sales,
 	date_dim,
         customer_address,
         item
 where
         i_manufact_id               in (select
  i_manufact_id
from
 item
where i_category in ('Books'))
 and     cs_item_sk              = i_item_sk
 and     cs_sold_date_sk         = d_date_sk
 and     d_year                  = 2000
 and     d_moy                   = 2
 and     cs_bill_addr_sk         = ca_address_sk
 and     ca_gmt_offset           = -5
 group by i_manufact_id),
 ws as (
 select
          i_manufact_id,sum(ws_ext_sales_price) total_sales
 from
 	web_sales,
 	date_dim,
         customer_address,
         item
 where
         i_manufact_id               in (select
  i_manufact_id
from
 item
where i_category in ('Books'))
 and     ws_item_sk              = i_item_sk
 and     ws_sold_date_sk         = d_date_sk
 and     d_year                  = 2000
 and     d_moy                   = 2
 and     ws_bill_addr_sk         = ca_address_sk
 and     ca_gmt_offset           = -5
 group by i_manufact_id)
 select  i_manufact_id ,sum(total_sales) total_sales
 from  (select * from ss
        union all
        select * from cs
        union all
        select * from ws) tmp1
 group by i_manufact_id
 order by total_sales
limit 100
"""

Q36 = """
select
    sum(ss_net_profit)/sum(ss_ext_sales_price) as gross_margin
   ,i_category
   ,i_class
   ,grouping(i_category)+grouping(i_class) as lochierarchy
   ,rank() over (
 	partition by grouping(i_category)+grouping(i_class),
 	case when grouping(i_class) = 0 then i_category end
 	order by sum(ss_net_profit)/sum(ss_ext_sales_price) asc) as rank_within_parent
 from
    store_sales
   ,date_dim       d1
   ,item
   ,store
 where
    d1.d_year = 2000
 and d1.d_date_sk = ss_sold_date_sk
 and i_item_sk  = ss_item_sk
 and s_store_sk  = ss_store_sk
 and s_state in ('TN','TN','TN','TN','TN','TN')
 group by rollup(i_category,i_class)
 order by
   lochierarchy desc
  ,case when lochierarchy = 0 then i_category end
  ,rank_within_parent
 limit 100
"""

Q43 = """
select s_store_name, s_store_id,
        sum(case when (d_day_name='Sunday') then ss_sales_price else null end) sun_sales,
        sum(case when (d_day_name='Monday') then ss_sales_price else null end) mon_sales,
        sum(case when (d_day_name='Tuesday') then ss_sales_price else  null end) tue_sales,
        sum(case when (d_day_name='Wednesday') then ss_sales_price else null end) wed_sales,
        sum(case when (d_day_name='Thursday') then ss_sales_price else null end) thu_sales,
        sum(case when (d_day_name='Friday') then ss_sales_price else null end) fri_sales,
        sum(case when (d_day_name='Saturday') then ss_sales_price else null end) sat_sales
 from date_dim, store_sales, store
 where d_date_sk = ss_sold_date_sk and
       s_store_sk = ss_store_sk and
       s_gmt_offset = -5 and
       d_year = 2000
 group by s_store_name, s_store_id
 order by s_store_name, s_store_id,sun_sales,mon_sales,tue_sales,wed_sales,thu_sales,fri_sales,sat_sales
 limit 100
"""

Q59 = """
with wss as
 (select d_week_seq,
        ss_store_sk,
        sum(case when (d_day_name='Sunday') then ss_sales_price else null end) sun_sales,
        sum(case when (d_day_name='Monday') then ss_sales_price else null end) mon_sales,
        sum(case when (d_day_name='Tuesday') then ss_sales_price else  null end) tue_sales,
        sum(case when (d_day_name='Wednesday') then ss_sales_price else null end) wed_sales,
        sum(case when (d_day_name='Thursday') then ss_sales_price else null end) thu_sales,
        sum(case when (d_day_name='Friday') then ss_sales_price else null end) fri_sales,
        sum(case when (d_day_name='Saturday') then ss_sales_price else null end) sat_sales
 from store_sales,date_dim
 where d_date_sk = ss_sold_date_sk
 group by d_week_seq,ss_store_sk
 )
  select  s_store_name1,s_store_id1,d_week_seq1
       ,sun_sales1/sun_sales2,mon_sales1/mon_sales2
       ,tue_sales1/tue_sales2,wed_sales1/wed_sales2,thu_sales1/thu_sales2
       ,fri_sales1/fri_sales2,sat_sales1/sat_sales2
 from
 (select s_store_name s_store_name1,wss.d_week_seq d_week_seq1
        ,s_store_id s_store_id1,sun_sales sun_sales1
        ,mon_sales mon_sales1,tue_sales tue_sales1
        ,wed_sales wed_sales1,thu_sales thu_sales1
        ,fri_sales fri_sales1,sat_sales sat_sales1
  from wss,store,date_dim d
  where d.d_week_seq = wss.d_week_seq and
        ss_store_sk = s_store_sk and
        d_month_seq between 1212 and 1212 + 11) y,
 (select s_store_name s_store_name2,wss.d_week_seq d_week_seq2
        ,s_store_id s_store_id2,sun_sales sun_sales2
        ,mon_sales mon_sales2,tue_sales tue_sales2
        ,wed_sales wed_sales2,thu_sales thu_sales2
        ,fri_sales fri_sales2,sat_sales sat_sales2
  from wss,store,date_dim d
  where d.d_week_seq = wss.d_week_seq and
        ss_store_sk = s_store_sk and
        d_month_seq between 1212+ 12 and 1212 + 23) x
 where s_store_id1=s_store_id2
   and d_week_seq1=d_week_seq2-52
 order by s_store_name1,s_store_id1,d_week_seq1
limit 100
"""

Q60 = """
with ss as (
 select
          i_item_id,sum(ss_ext_sales_price) total_sales
 from
 	store_sales,
 	date_dim,
         customer_address,
         item
 where
         i_item_id in (select
  i_item_id
from
 item
where i_category in ('Music'))
 and     ss_item_sk              = i_item_sk
 and     ss_sold_date_sk         = d_date_sk
 and     d_year                  = 2000
 and     d_moy                   = 9
 and     ss_addr_sk              = ca_address_sk
 and     ca_gmt_offset           = -5
 group by i_item_id),
 cs as (
 select
          i_item_id,sum(cs_ext_sales_price) total_sales
 from
 	catalog_sales,
 	date_dim,
         customer_address,
         item
 where
         i_item_id               in (select
  i_item_id
from
 item
where i_category in ('Music'))
 and     cs_item_sk              = i_item_sk
 and     cs_sold_date_sk         = d_date_sk
 and     d_year                  = 2000
 and     d_moy                   = 9
 and     cs_bill_addr_sk         = ca_address_sk
 and     ca_gmt_offset           = -5
 group by i_item_id),
 ws as (
 select
          i_item_id,sum(ws_ext_sales_price) total_sales
 from
 	web_sales,
 	date_dim,
         customer_address,
         item
 where
         i_item_id               in (select
  i_item_id
from
 item
where i_category in ('Music'))
 and     ws_item_sk              = i_item_sk
 and     ws_sold_date_sk         = d_date_sk
 and     d_year                  = 2000
 and     d_moy                   = 9
 and     ws_bill_addr_sk         = ca_address_sk
 and     ca_gmt_offset           = -5
 group by i_item_id)
 select
  i_item_id
 ,sum(total_sales) total_sales
 from  (select * from ss
        union all
        select * from cs
        union all
        select * from ws) tmp1
 group by i_item_id
 order by i_item_id
      ,total_sales
 limit 100
"""

Q62 = """
select
   substr(w_warehouse_name,1,20)
  ,sm_type
  ,web_name
  ,sum(case when (ws_ship_date_sk - ws_sold_date_sk <= 30 ) then 1 else 0 end)  as days_30
  ,sum(case when (ws_ship_date_sk - ws_sold_date_sk > 30) and
                 (ws_ship_date_sk - ws_sold_date_sk <= 60) then 1 else 0 end )  as days_31_60
  ,sum(case when (ws_ship_date_sk - ws_sold_date_sk > 60) and
                 (ws_ship_date_sk - ws_sold_date_sk <= 90) then 1 else 0 end)  as days_61_90
  ,sum(case when (ws_ship_date_sk - ws_sold_date_sk > 90) and
                 (ws_ship_date_sk - ws_sold_date_sk <= 120) then 1 else 0 end)  as days_91_120
  ,sum(case when (ws_ship_date_sk - ws_sold_date_sk  > 120) then 1 else 0 end)  as days_more_120
from
   web_sales
  ,warehouse
  ,ship_mode
  ,web_site
  ,date_dim
where
    d_month_seq between 1200 and 1200 + 11
and ws_ship_date_sk   = d_date_sk
and ws_warehouse_sk   = w_warehouse_sk
and ws_ship_mode_sk   = sm_ship_mode_sk
and ws_web_site_sk    = web_site_sk
group by
   substr(w_warehouse_name,1,20)
  ,sm_type
  ,web_name
order by
   substr(w_warehouse_name,1,20)
  ,sm_type
  ,web_name
  ,days_30
  ,days_31_60
  ,days_61_90
  ,days_91_120
  ,days_more_120
limit 100
"""

Q65 = """
select
	s_store_name,
	i_item_desc,
	sc.revenue,
	i_current_price,
	i_wholesale_cost,
	i_brand
 from store, item,
     (select ss_store_sk, avg(revenue) as ave
 	from
 	    (select  ss_store_sk, ss_item_sk, sum(ss_sales_price) as revenue
 		from store_sales, date_dim
 		where ss_sold_date_sk = d_date_sk and d_month_seq between 1200 and 1200+11
 		group by ss_store_sk, ss_item_sk) sa
 	group by ss_store_sk) sb,
     (select  ss_store_sk, ss_item_sk, sum(ss_sales_price) as revenue
 	from store_sales, date_dim
 	where ss_sold_date_sk = d_date_sk and d_month_seq between 1200 and 1200+11
 	group by ss_store_sk, ss_item_sk) sc
 where sb.ss_store_sk = sc.ss_store_sk and
       sc.revenue <= 0.1 * sb.ave and
       s_store_sk = sc.ss_store_sk and
       i_item_sk = sc.ss_item_sk
 order by s_store_name, i_item_desc
limit 100
"""

Q93 = """
select ss_customer_sk
            ,sum(act_sales) sumsales
      from (select ss_item_sk
                  ,ss_ticket_number
                  ,ss_customer_sk
                  ,case when sr_return_quantity is not null then (ss_quantity-sr_return_quantity)*ss_sales_price
                                                            else (ss_quantity*ss_sales_price) end act_sales
            from store_sales left outer join store_returns on (sr_item_sk = ss_item_sk
                                                               and sr_ticket_number = ss_ticket_number)
                ,reason
            where sr_reason_sk = r_reason_sk
              and r_reason_desc = 'reason 28') t
      group by ss_customer_sk
      order by sumsales, ss_customer_sk
limit 100
"""

Q99 = """
select
   substr(w_warehouse_name,1,20)
  ,sm_type
  ,cc_name
  ,sum(case when (cs_ship_date_sk - cs_sold_date_sk <= 30 ) then 1 else 0 end)  as days_30
  ,sum(case when (cs_ship_date_sk - cs_sold_date_sk > 30) and
                 (cs_ship_date_sk - cs_sold_date_sk <= 60) then 1 else 0 end )  as days_31_60
  ,sum(case when (cs_ship_date_sk - cs_sold_date_sk > 60) and
                 (cs_ship_date_sk - cs_sold_date_sk <= 90) then 1 else 0 end)  as days_61_90
  ,sum(case when (cs_ship_date_sk - cs_sold_date_sk > 90) and
                 (cs_ship_date_sk - cs_sold_date_sk <= 120) then 1 else 0 end)  as days_91_120
  ,sum(case when (cs_ship_date_sk - cs_sold_date_sk  > 120) then 1 else 0 end)  as days_more_120
from
   catalog_sales
  ,warehouse
  ,ship_mode
  ,call_center
  ,date_dim
where
    d_month_seq between 1200 and 1200 + 11
and cs_ship_date_sk   = d_date_sk
and cs_warehouse_sk   = w_warehouse_sk
and cs_ship_mode_sk   = sm_ship_mode_sk
and cs_call_center_sk = cc_call_center_sk
group by
   substr(w_warehouse_name,1,20)
  ,sm_type
  ,cc_name
order by substr(w_warehouse_name,1,20)
        ,sm_type
        ,cc_name
        ,days_30
        ,days_31_60
        ,days_61_90
        ,days_91_120
        ,days_more_120
limit 100
"""


def test_tpcds_q2_text(tpcds):
    """q2 verbatim — web+catalog weekly day-bucket sums, year-over-year
    ratio via a 53-week self-join (the spec's date_dim fan-out duplicates
    are reproduced identically by both engines)."""
    spark, con = tpcds
    _compare(spark, con, Q2, ordered=True, min_rows=20, check_names=False)


def test_tpcds_q9_text(tpcds):
    """q9 verbatim — five quantity buckets picking avg discount vs avg
    net-paid through CASE over scalar subqueries."""
    spark, con = tpcds
    _compare(spark, con, Q9, ordered=False, min_rows=1)


def test_tpcds_q31_text(tpcds):
    """q31 verbatim — county quarter-over-quarter web-vs-store growth
    (6-way self-join of two CTEs)."""
    spark, con = tpcds
    _compare(spark, con, Q31, ordered=True, min_rows=1)


def test_tpcds_q33_text(tpcds):
    """q33 verbatim — per-manufacturer 3-channel sales for one category
    by GMT offset."""
    spark, con = tpcds
    _compare(spark, con, Q33, ordered=False, min_rows=3)


def test_tpcds_q36_text(tpcds):
    """q36 verbatim — gross-margin rollup with rank-within-parent over
    grouping() keys."""
    spark, con = tpcds
    _compare(spark, con, Q36, ordered=False, min_rows=5)


def test_tpcds_q43_text(tpcds):
    """q43 verbatim — per-store day-of-week sales pivot."""
    spark, con = tpcds
    _compare(spark, con, Q43, ordered=True, min_rows=3)


def test_tpcds_q59_text(tpcds):
    """q59 verbatim — per-store weekly sales ratio, year over year."""
    spark, con = tpcds
    _compare(spark, con, Q59, ordered=True, min_rows=20, check_names=False)


def test_tpcds_q60_text(tpcds):
    """q60 verbatim — per-item 3-channel September sales by GMT offset."""
    spark, con = tpcds
    _compare(spark, con, Q60, ordered=True, min_rows=3)


def test_tpcds_q62_text(tpcds):
    """q62 verbatim — web shipping-lag day buckets by warehouse/mode/site."""
    spark, con = tpcds
    _compare(spark, con, Q62, ordered=True, min_rows=10, check_names=False)


def test_tpcds_q65_text(tpcds):
    """q65 verbatim — items selling at <=10% of their store's average
    revenue (nested aggregate-of-aggregate)."""
    spark, con = tpcds
    _compare(spark, con, Q65, ordered=True, min_rows=1)


def test_tpcds_q93_text(tpcds):
    """q93 verbatim — net sales after returns for one return reason (the
    spec's left-join-then-comma-reason shape)."""
    spark, con = tpcds
    _compare(spark, con, Q93, ordered=True, min_rows=20)


def test_tpcds_q99_text(tpcds):
    """q99 verbatim — catalog shipping-lag day buckets by
    warehouse/mode/call-center."""
    spark, con = tpcds
    _compare(spark, con, Q99, ordered=True, min_rows=10, check_names=False)


# Batch 7: customer year-over-year growth (q4/q11/q74), buy-return-rebuy
# (q17/q25/q29), rolling-average deviation with lag/lead self-joins
# (q47/q57, q53/q63/q89), NULL-FK channel counts (q76) — public spec
# templates, qualification parameters.

Q4 = """
with year_total as (
 select c_customer_id customer_id
       ,c_first_name customer_first_name
       ,c_last_name customer_last_name
       ,c_preferred_cust_flag customer_preferred_cust_flag
       ,c_birth_country customer_birth_country
       ,c_login customer_login
       ,c_email_address customer_email_address
       ,d_year dyear
       ,sum(((ss_ext_list_price-ss_ext_wholesale_cost-ss_ext_discount_amt)+ss_ext_sales_price)/2) year_total
       ,'s' sale_type
 from customer
     ,store_sales
     ,date_dim
 where c_customer_sk = ss_customer_sk
   and ss_sold_date_sk = d_date_sk
 group by c_customer_id
         ,c_first_name
         ,c_last_name
         ,c_preferred_cust_flag
         ,c_birth_country
         ,c_login
         ,c_email_address
         ,d_year
 union all
 select c_customer_id customer_id
       ,c_first_name customer_first_name
       ,c_last_name customer_last_name
       ,c_preferred_cust_flag customer_preferred_cust_flag
       ,c_birth_country customer_birth_country
       ,c_login customer_login
       ,c_email_address customer_email_address
       ,d_year dyear
       ,sum((((cs_ext_list_price-cs_ext_wholesale_cost-cs_ext_discount_amt)+cs_ext_sales_price)/2) ) year_total
       ,'c' sale_type
 from customer
     ,catalog_sales
     ,date_dim
 where c_customer_sk = cs_bill_customer_sk
   and cs_sold_date_sk = d_date_sk
 group by c_customer_id
         ,c_first_name
         ,c_last_name
         ,c_preferred_cust_flag
         ,c_birth_country
         ,c_login
         ,c_email_address
         ,d_year
union all
 select c_customer_id customer_id
       ,c_first_name customer_first_name
       ,c_last_name customer_last_name
       ,c_preferred_cust_flag customer_preferred_cust_flag
       ,c_birth_country customer_birth_country
       ,c_login customer_login
       ,c_email_address customer_email_address
       ,d_year dyear
       ,sum((((ws_ext_list_price-ws_ext_wholesale_cost-ws_ext_discount_amt)+ws_ext_sales_price)/2) ) year_total
       ,'w' sale_type
 from customer
     ,web_sales
     ,date_dim
 where c_customer_sk = ws_bill_customer_sk
   and ws_sold_date_sk = d_date_sk
 group by c_customer_id
         ,c_first_name
         ,c_last_name
         ,c_preferred_cust_flag
         ,c_birth_country
         ,c_login
         ,c_email_address
         ,d_year
         )
  select
                  t_s_secyear.customer_id
                 ,t_s_secyear.customer_first_name
                 ,t_s_secyear.customer_last_name
                 ,t_s_secyear.customer_preferred_cust_flag
 from year_total t_s_firstyear
     ,year_total t_s_secyear
     ,year_total t_c_firstyear
     ,year_total t_c_secyear
     ,year_total t_w_firstyear
     ,year_total t_w_secyear
 where t_s_secyear.customer_id = t_s_firstyear.customer_id
   and t_s_firstyear.customer_id = t_c_secyear.customer_id
   and t_s_firstyear.customer_id = t_c_firstyear.customer_id
   and t_s_firstyear.customer_id = t_w_firstyear.customer_id
   and t_s_firstyear.customer_id = t_w_secyear.customer_id
   and t_s_firstyear.sale_type = 's'
   and t_c_firstyear.sale_type = 'c'
   and t_w_firstyear.sale_type = 'w'
   and t_s_secyear.sale_type = 's'
   and t_c_secyear.sale_type = 'c'
   and t_w_secyear.sale_type = 'w'
   and t_s_firstyear.dyear =  2001
   and t_s_secyear.dyear = 2001+1
   and t_c_firstyear.dyear =  2001
   and t_c_secyear.dyear =  2001+1
   and t_w_firstyear.dyear = 2001
   and t_w_secyear.dyear = 2001+1
   and t_s_firstyear.year_total > 0
   and t_c_firstyear.year_total > 0
   and t_w_firstyear.year_total > 0
   and case when t_c_firstyear.year_total > 0 then t_c_secyear.year_total / t_c_firstyear.year_total else null end
           > case when t_s_firstyear.year_total > 0 then t_s_secyear.year_total / t_s_firstyear.year_total else null end
   and case when t_c_firstyear.year_total > 0 then t_c_secyear.year_total / t_c_firstyear.year_total else null end
           > case when t_w_firstyear.year_total > 0 then t_w_secyear.year_total / t_w_firstyear.year_total else null end
 order by t_s_secyear.customer_id
         ,t_s_secyear.customer_first_name
         ,t_s_secyear.customer_last_name
         ,t_s_secyear.customer_preferred_cust_flag
limit 100
"""

Q11 = """
with year_total as (
 select c_customer_id customer_id
       ,c_first_name customer_first_name
       ,c_last_name customer_last_name
       ,c_preferred_cust_flag customer_preferred_cust_flag
       ,c_birth_country customer_birth_country
       ,c_login customer_login
       ,c_email_address customer_email_address
       ,d_year dyear
       ,sum(ss_ext_list_price-ss_ext_discount_amt) year_total
       ,'s' sale_type
 from customer
     ,store_sales
     ,date_dim
 where c_customer_sk = ss_customer_sk
   and ss_sold_date_sk = d_date_sk
 group by c_customer_id
         ,c_first_name
         ,c_last_name
         ,c_preferred_cust_flag
         ,c_birth_country
         ,c_login
         ,c_email_address
         ,d_year
 union all
 select c_customer_id customer_id
       ,c_first_name customer_first_name
       ,c_last_name customer_last_name
       ,c_preferred_cust_flag customer_preferred_cust_flag
       ,c_birth_country customer_birth_country
       ,c_login customer_login
       ,c_email_address customer_email_address
       ,d_year dyear
       ,sum(ws_ext_list_price-ws_ext_discount_amt) year_total
       ,'w' sale_type
 from customer
     ,web_sales
     ,date_dim
 where c_customer_sk = ws_bill_customer_sk
   and ws_sold_date_sk = d_date_sk
 group by c_customer_id
         ,c_first_name
         ,c_last_name
         ,c_preferred_cust_flag
         ,c_birth_country
         ,c_login
         ,c_email_address
         ,d_year
         )
  select
                  t_s_secyear.customer_id
                 ,t_s_secyear.customer_first_name
                 ,t_s_secyear.customer_last_name
                 ,t_s_secyear.customer_preferred_cust_flag
 from year_total t_s_firstyear
     ,year_total t_s_secyear
     ,year_total t_w_firstyear
     ,year_total t_w_secyear
 where t_s_secyear.customer_id = t_s_firstyear.customer_id
         and t_s_firstyear.customer_id = t_w_secyear.customer_id
         and t_s_firstyear.customer_id = t_w_firstyear.customer_id
         and t_s_firstyear.sale_type = 's'
         and t_w_firstyear.sale_type = 'w'
         and t_s_secyear.sale_type = 's'
         and t_w_secyear.sale_type = 'w'
         and t_s_firstyear.dyear = 2001
         and t_s_secyear.dyear = 2001+1
         and t_w_firstyear.dyear = 2001
         and t_w_secyear.dyear = 2001+1
         and t_s_firstyear.year_total > 0
         and t_w_firstyear.year_total > 0
         and case when t_w_firstyear.year_total > 0 then t_w_secyear.year_total / t_w_firstyear.year_total else 0.0 end
             > case when t_s_firstyear.year_total > 0 then t_s_secyear.year_total / t_s_firstyear.year_total else 0.0 end
 order by t_s_secyear.customer_id
         ,t_s_secyear.customer_first_name
         ,t_s_secyear.customer_last_name
         ,t_s_secyear.customer_preferred_cust_flag
limit 100
"""

Q74 = """
with year_total as (
 select c_customer_id customer_id
       ,c_first_name customer_first_name
       ,c_last_name customer_last_name
       ,d_year as year
       ,sum(ss_net_paid) year_total
       ,'s' sale_type
 from customer
     ,store_sales
     ,date_dim
 where c_customer_sk = ss_customer_sk
   and ss_sold_date_sk = d_date_sk
   and d_year in (2001,2001+1)
 group by c_customer_id
         ,c_first_name
         ,c_last_name
         ,d_year
 union all
 select c_customer_id customer_id
       ,c_first_name customer_first_name
       ,c_last_name customer_last_name
       ,d_year as year
       ,sum(ws_net_paid) year_total
       ,'w' sale_type
 from customer
     ,web_sales
     ,date_dim
 where c_customer_sk = ws_bill_customer_sk
   and ws_sold_date_sk = d_date_sk
   and d_year in (2001,2001+1)
 group by c_customer_id
         ,c_first_name
         ,c_last_name
         ,d_year
         )
  select
        t_s_secyear.customer_id, t_s_secyear.customer_first_name, t_s_secyear.customer_last_name
 from year_total t_s_firstyear
     ,year_total t_s_secyear
     ,year_total t_w_firstyear
     ,year_total t_w_secyear
 where t_s_secyear.customer_id = t_s_firstyear.customer_id
         and t_s_firstyear.customer_id = t_w_secyear.customer_id
         and t_s_firstyear.customer_id = t_w_firstyear.customer_id
         and t_s_firstyear.sale_type = 's'
         and t_w_firstyear.sale_type = 'w'
         and t_s_secyear.sale_type = 's'
         and t_w_secyear.sale_type = 'w'
         and t_s_firstyear.year = 2001
         and t_s_secyear.year = 2001+1
         and t_w_firstyear.year = 2001
         and t_w_secyear.year = 2001+1
         and t_s_firstyear.year_total > 0
         and t_w_firstyear.year_total > 0
         and case when t_w_firstyear.year_total > 0 then t_w_secyear.year_total / t_w_firstyear.year_total else null end
           > case when t_s_firstyear.year_total > 0 then t_s_secyear.year_total / t_s_firstyear.year_total else null end
 order by 1, 2, 3
limit 100
"""

Q17 = """
select i_item_id
       ,i_item_desc
       ,s_state
       ,count(ss_quantity) as store_sales_quantitycount
       ,avg(ss_quantity) as store_sales_quantityave
       ,stddev_samp(ss_quantity) as store_sales_quantitystdev
       ,stddev_samp(ss_quantity)/avg(ss_quantity) as store_sales_quantitycov
       ,count(sr_return_quantity) as store_returns_quantitycount
       ,avg(sr_return_quantity) as store_returns_quantityave
       ,stddev_samp(sr_return_quantity) as store_returns_quantitystdev
       ,stddev_samp(sr_return_quantity)/avg(sr_return_quantity) as store_returns_quantitycov
       ,count(cs_quantity) as catalog_sales_quantitycount ,avg(cs_quantity) as catalog_sales_quantityave
       ,stddev_samp(cs_quantity) as catalog_sales_quantitystdev
       ,stddev_samp(cs_quantity)/avg(cs_quantity) as catalog_sales_quantitycov
 from store_sales
     ,store_returns
     ,catalog_sales
     ,date_dim d1
     ,date_dim d2
     ,date_dim d3
     ,store
     ,item
 where d1.d_quarter_name = '2001Q1'
   and d1.d_date_sk = ss_sold_date_sk
   and i_item_sk = ss_item_sk
   and s_store_sk = ss_store_sk
   and ss_customer_sk = sr_customer_sk
   and ss_item_sk = sr_item_sk
   and ss_ticket_number = sr_ticket_number
   and sr_returned_date_sk = d2.d_date_sk
   and d2.d_quarter_name in ('2001Q1','2001Q2','2001Q3')
   and sr_customer_sk = cs_bill_customer_sk
   and sr_item_sk = cs_item_sk
   and cs_sold_date_sk = d3.d_date_sk
   and d3.d_quarter_name in ('2001Q1','2001Q2','2001Q3')
 group by i_item_id
         ,i_item_desc
         ,s_state
 order by i_item_id
         ,i_item_desc
         ,s_state
limit 100
"""

Q25 = """
select
 i_item_id
 ,i_item_desc
 ,s_store_id
 ,s_store_name
 ,sum(ss_net_profit) as store_sales_profit
 ,sum(sr_net_loss) as store_returns_loss
 ,sum(cs_net_profit) as catalog_sales_profit
 from
 store_sales
 ,store_returns
 ,catalog_sales
 ,date_dim d1
 ,date_dim d2
 ,date_dim d3
 ,store
 ,item
 where
 d1.d_moy = 4
 and d1.d_year = 2000
 and d1.d_date_sk = ss_sold_date_sk
 and i_item_sk = ss_item_sk
 and s_store_sk = ss_store_sk
 and ss_customer_sk = sr_customer_sk
 and ss_item_sk = sr_item_sk
 and ss_ticket_number = sr_ticket_number
 and sr_returned_date_sk = d2.d_date_sk
 and d2.d_moy between 4 and 10
 and d2.d_year = 2000
 and sr_customer_sk = cs_bill_customer_sk
 and sr_item_sk = cs_item_sk
 and cs_sold_date_sk = d3.d_date_sk
 and d3.d_moy between 4 and 10
 and d3.d_year = 2000
 group by
 i_item_id
 ,i_item_desc
 ,s_store_id
 ,s_store_name
 order by
 i_item_id
 ,i_item_desc
 ,s_store_id
 ,s_store_name
 limit 100
"""

Q29 = """
select
     i_item_id
    ,i_item_desc
    ,s_store_id
    ,s_store_name
    ,sum(ss_quantity)        as store_sales_quantity
    ,sum(sr_return_quantity) as store_returns_quantity
    ,sum(cs_quantity)        as catalog_sales_quantity
 from
    store_sales
   ,store_returns
   ,catalog_sales
   ,date_dim             d1
   ,date_dim             d2
   ,date_dim             d3
   ,store
   ,item
 where
     d1.d_moy               = 9
 and d1.d_year              = 1999
 and d1.d_date_sk           = ss_sold_date_sk
 and i_item_sk              = ss_item_sk
 and s_store_sk             = ss_store_sk
 and ss_customer_sk         = sr_customer_sk
 and ss_item_sk             = sr_item_sk
 and ss_ticket_number       = sr_ticket_number
 and sr_returned_date_sk    = d2.d_date_sk
 and d2.d_moy               between 9 and  9 + 3
 and d2.d_year              = 1999
 and sr_customer_sk         = cs_bill_customer_sk
 and sr_item_sk             = cs_item_sk
 and cs_sold_date_sk        = d3.d_date_sk
 and d3.d_year              in (1999,1999+1,1999+2)
 group by
    i_item_id
   ,i_item_desc
   ,s_store_id
   ,s_store_name
 order by
    i_item_id
   ,i_item_desc
   ,s_store_id
   ,s_store_name
 limit 100
"""

Q47 = """
with v1 as(
 select i_category, i_brand,
        s_store_name, s_company_name,
        d_year, d_moy,
        sum(ss_sales_price) sum_sales,
        avg(sum(ss_sales_price)) over
          (partition by i_category, i_brand,
                     s_store_name, s_company_name, d_year)
          avg_monthly_sales,
        rank() over
          (partition by i_category, i_brand,
                     s_store_name, s_company_name
           order by d_year, d_moy) rn
 from item, store_sales, store, date_dim
 where ss_item_sk = i_item_sk and
       ss_sold_date_sk = d_date_sk and
       ss_store_sk = s_store_sk and
       (
         d_year = 2001 or
         ( d_year = 2001-1 and d_moy =12) or
         ( d_year = 2001+1 and d_moy =1)
       )
 group by i_category, i_brand,
          s_store_name, s_company_name,
          d_year, d_moy),
 v2 as(
 select v1.i_category, v1.i_brand, v1.s_store_name, v1.s_company_name, v1.d_year, v1.d_moy
        ,v1.avg_monthly_sales
        ,v1.sum_sales, v1_lag.sum_sales psum, v1_lead.sum_sales nsum
 from v1, v1 v1_lag, v1 v1_lead
 where v1.i_category = v1_lag.i_category and
       v1.i_category = v1_lead.i_category and
       v1.i_brand = v1_lag.i_brand and
       v1.i_brand = v1_lead.i_brand and
       v1.s_store_name = v1_lag.s_store_name and
       v1.s_store_name = v1_lead.s_store_name and
       v1.s_company_name = v1_lag.s_company_name and
       v1.s_company_name = v1_lead.s_company_name and
       v1.rn = v1_lag.rn + 1 and
       v1.rn = v1_lead.rn - 1)
  select  *
 from v2
 where  d_year = 2001 and
        avg_monthly_sales > 0 and
        case when avg_monthly_sales > 0 then abs(sum_sales - avg_monthly_sales) / avg_monthly_sales else null end > 0.1
 order by sum_sales - avg_monthly_sales, 3
 limit 100
"""

Q57 = """
with v1 as(
 select i_category, i_brand,
        cc_name,
        d_year, d_moy,
        sum(cs_sales_price) sum_sales,
        avg(sum(cs_sales_price)) over
          (partition by i_category, i_brand,
                     cc_name, d_year)
          avg_monthly_sales,
        rank() over
          (partition by i_category, i_brand,
                     cc_name
           order by d_year, d_moy) rn
 from item, catalog_sales, call_center, date_dim
 where cs_item_sk = i_item_sk and
       cs_sold_date_sk = d_date_sk and
       cc_call_center_sk= cs_call_center_sk and
       (
         d_year = 2001 or
         ( d_year = 2001-1 and d_moy =12) or
         ( d_year = 2001+1 and d_moy =1)
       )
 group by i_category, i_brand,
          cc_name , d_year, d_moy),
 v2 as(
 select v1.i_category, v1.i_brand, v1.cc_name, v1.d_year, v1.d_moy
        ,v1.avg_monthly_sales
        ,v1.sum_sales, v1_lag.sum_sales psum, v1_lead.sum_sales nsum
 from v1, v1 v1_lag, v1 v1_lead
 where v1.i_category = v1_lag.i_category and
       v1.i_category = v1_lead.i_category and
       v1.i_brand = v1_lag.i_brand and
       v1.i_brand = v1_lead.i_brand and
       v1. cc_name = v1_lag. cc_name and
       v1. cc_name = v1_lead. cc_name and
       v1.rn = v1_lag.rn + 1 and
       v1.rn = v1_lead.rn - 1)
  select  *
 from v2
 where  d_year = 2001 and
        avg_monthly_sales > 0 and
        case when avg_monthly_sales > 0 then abs(sum_sales - avg_monthly_sales) / avg_monthly_sales else null end > 0.1
 order by sum_sales - avg_monthly_sales, 3
 limit 100
"""

Q53 = """
select * from
(select i_manufact_id,
sum(ss_sales_price) sum_sales,
avg(sum(ss_sales_price)) over (partition by i_manufact_id) avg_quarterly_sales
from item, store_sales, date_dim, store
where ss_item_sk = i_item_sk and
ss_sold_date_sk = d_date_sk and
ss_store_sk = s_store_sk and
d_month_seq in (1200,1200+1,1200+2,1200+3,1200+4,1200+5,1200+6,1200+7,1200+8,1200+9,1200+10,1200+11) and
((i_category in ('Books','Children','Electronics') and
i_class in ('personal','portable','reference','self-help') and
i_brand in ('scholaramalgamalg #14','scholaramalgamalg #7',
		'exportiunivamalg #9','scholaramalgamalg #9'))
or(i_category in ('Women','Music','Men') and
i_class in ('accessories','classical','fragrances','pants') and
i_brand in ('amalgimporto #1','edu packscholar #1','exportiimporto #1',
		'importoamalg #1')))
group by i_manufact_id, d_qoy ) tmp1
where case when avg_quarterly_sales > 0
	then abs (sum_sales - avg_quarterly_sales)/ avg_quarterly_sales
	else null end > 0.1
order by avg_quarterly_sales,
	 sum_sales,
	 i_manufact_id
limit 100
"""

Q63 = """
select  *
from (select i_manager_id
             ,sum(ss_sales_price) sum_sales
             ,avg(sum(ss_sales_price)) over (partition by i_manager_id) avg_monthly_sales
      from item
          ,store_sales
          ,date_dim
          ,store
      where ss_item_sk = i_item_sk
        and ss_sold_date_sk = d_date_sk
        and ss_store_sk = s_store_sk
        and d_month_seq in (1200,1200+1,1200+2,1200+3,1200+4,1200+5,1200+6,1200+7,1200+8,1200+9,1200+10,1200+11)
        and ((    i_category in ('Books','Children','Electronics')
              and i_class in ('personal','portable','reference','self-help')
              and i_brand in ('scholaramalgamalg #14','scholaramalgamalg #7',
		                  'exportiunivamalg #9','scholaramalgamalg #9'))
           or(    i_category in ('Women','Music','Men')
              and i_class in ('accessories','classical','fragrances','pants')
              and i_brand in ('amalgimporto #1','edu packscholar #1',
		                 'exportiimporto #1','importoamalg #1')))
group by i_manager_id, d_moy) tmp1
where case when avg_monthly_sales > 0 then abs (sum_sales - avg_monthly_sales) / avg_monthly_sales else null end > 0.1
order by i_manager_id
        ,avg_monthly_sales
        ,sum_sales
limit 100
"""

Q76 = """
select channel, col_name, d_year, d_qoy, i_category, COUNT(*) sales_cnt, SUM(ext_sales_price) sales_amt FROM (
        SELECT 'store' as channel, 'ss_store_sk' col_name, d_year, d_qoy, i_category, ss_ext_sales_price ext_sales_price
         FROM store_sales, item, date_dim
         WHERE ss_store_sk IS NULL
           AND ss_sold_date_sk=d_date_sk
           AND ss_item_sk=i_item_sk
        UNION ALL
        SELECT 'web' as channel, 'ws_ship_customer_sk' col_name, d_year, d_qoy, i_category, ws_ext_sales_price ext_sales_price
         FROM web_sales, item, date_dim
         WHERE ws_ship_customer_sk IS NULL
           AND ws_sold_date_sk=d_date_sk
           AND ws_item_sk=i_item_sk
        UNION ALL
        SELECT 'catalog' as channel, 'cs_ship_addr_sk' col_name, d_year, d_qoy, i_category, cs_ext_sales_price ext_sales_price
         FROM catalog_sales, item, date_dim
         WHERE cs_ship_addr_sk IS NULL
           AND cs_sold_date_sk=d_date_sk
           AND cs_item_sk=i_item_sk) foo
GROUP BY channel, col_name, d_year, d_qoy, i_category
ORDER BY channel, col_name, d_year, d_qoy, i_category
limit 100
"""

Q89 = """
select  *
from(
select i_category, i_class, i_brand,
       s_store_name, s_company_name,
       d_moy,
       sum(ss_sales_price) sum_sales,
       avg(sum(ss_sales_price)) over
         (partition by i_category, i_brand, s_store_name, s_company_name)
         avg_monthly_sales
from item, store_sales, date_dim, store
where ss_item_sk = i_item_sk and
      ss_sold_date_sk = d_date_sk and
      ss_store_sk = s_store_sk and
      d_year in (2000) and
        ((i_category in ('Books','Electronics','Sports') and
          i_class in ('computers','stereo','football')
         )
      or (i_category in ('Men','Jewelry','Women') and
          i_class in ('shirts','birdal','dresses')
        ))
group by i_category, i_class, i_brand,
         s_store_name, s_company_name, d_moy) tmp1
where case when (avg_monthly_sales <> 0) then (abs(sum_sales - avg_monthly_sales) / avg_monthly_sales) else null end > 0.1
order by sum_sales - avg_monthly_sales, s_store_name
limit 100
"""


def test_tpcds_q4_text(tpcds):
    """q4 verbatim — 3-channel customer year-over-year growth (6-way
    self-join of the year_total CTE)."""
    spark, con = tpcds
    _compare(spark, con, Q4, ordered=True, min_rows=5)


def test_tpcds_q11_text(tpcds):
    """q11 verbatim — store-vs-web customer growth (4-way CTE self-join)."""
    spark, con = tpcds
    _compare(spark, con, Q11, ordered=True, min_rows=5)


def test_tpcds_q74_text(tpcds):
    """q74 verbatim — net-paid variant of q11 with ordinal ORDER BY."""
    spark, con = tpcds
    _compare(spark, con, Q74, ordered=True, min_rows=5)


def test_tpcds_q17_text(tpcds):
    """q17 verbatim — buy-return-rebuy quantity stats by quarter name
    (stddev_samp merge order differs by engine -> approx 10 sig digits)."""
    spark, con = tpcds
    _compare(spark, con, Q17, ordered=True, min_rows=1, approx=True)


def test_tpcds_q25_text(tpcds):
    """q25 verbatim — buy-return-rebuy profit sums, April window."""
    spark, con = tpcds
    _compare(spark, con, Q25, ordered=True, min_rows=1)


def test_tpcds_q29_text(tpcds):
    """q29 verbatim — buy-return-rebuy quantity sums, 3-year catalog
    window."""
    spark, con = tpcds
    _compare(spark, con, Q29, ordered=True, min_rows=1)


def test_tpcds_q47_text(tpcds):
    """q47 verbatim — store monthly sales deviation with lag/lead
    neighbors via rank self-joins."""
    spark, con = tpcds
    _compare(spark, con, Q47, ordered=False, min_rows=20)


def test_tpcds_q57_text(tpcds):
    """q57 verbatim — the call-center twin of q47."""
    spark, con = tpcds
    _compare(spark, con, Q57, ordered=False, min_rows=20)


def test_tpcds_q53_text(tpcds):
    """q53 verbatim — manufacturer quarterly deviation from windowed
    average over the spec's brand/class/category triples."""
    spark, con = tpcds
    _compare(spark, con, Q53, ordered=False, min_rows=3)


def test_tpcds_q63_text(tpcds):
    """q63 verbatim — the manager-id monthly twin of q53."""
    spark, con = tpcds
    _compare(spark, con, Q63, ordered=False, min_rows=3)


def test_tpcds_q76_text(tpcds):
    """q76 verbatim — NULL-foreign-key sales counts across 3 channels."""
    spark, con = tpcds
    _compare(spark, con, Q76, ordered=True, min_rows=20)


def test_tpcds_q89_text(tpcds):
    """q89 verbatim — monthly class sales deviation from brand/store
    average."""
    spark, con = tpcds
    _compare(spark, con, Q89, ordered=False, min_rows=5)


# Batch 8: zip-prefix store report, tri-branch demographic filters,
# item self-join existence, best/worst rank join — public spec
# templates, qualification parameters.

Q8 = """
select s_store_name
      ,sum(ss_net_profit)
 from store_sales
     ,date_dim
     ,store,
     (select ca_zip
     from (
      (SELECT substr(ca_zip,1,5) ca_zip
      FROM customer_address
      WHERE substr(ca_zip,1,5) IN ('10001','24128','76232','65084','87816','83926','77556','20548'))
      intersect
      (select ca_zip
      from (SELECT substr(ca_zip,1,5) ca_zip,count(*) cnt
            FROM customer_address, customer
            WHERE ca_address_sk = c_current_addr_sk and
                  c_preferred_cust_flag='Y'
            group by ca_zip
            having count(*) > 10)A1)
     )A2) V1
 where ss_store_sk = s_store_sk
  and ss_sold_date_sk = d_date_sk
  and d_qoy = 2 and d_year = 2000
  and (substr(s_zip,1,2) = substr(V1.ca_zip,1,2))
 group by s_store_name
 order by s_store_name
 limit 100
"""

Q13 = """
select avg(ss_quantity)
       ,avg(ss_ext_sales_price)
       ,avg(ss_ext_wholesale_cost)
       ,sum(ss_ext_wholesale_cost)
 from store_sales
     ,store
     ,customer_demographics
     ,household_demographics
     ,customer_address
     ,date_dim
 where s_store_sk = ss_store_sk
 and  ss_sold_date_sk = d_date_sk and d_year = 2001
 and((ss_hdemo_sk=hd_demo_sk
  and cd_demo_sk = ss_cdemo_sk
  and cd_marital_status = 'D'
  and cd_education_status = '4 yr Degree'
  and ss_sales_price between 50.00 and 100.00
  and hd_dep_count = 7
     )or
     (ss_hdemo_sk=hd_demo_sk
  and cd_demo_sk = ss_cdemo_sk
  and cd_marital_status = 'S'
  and cd_education_status = 'College'
  and ss_sales_price between 25.00 and 75.00
  and hd_dep_count = 4
     ) or
     (ss_hdemo_sk=hd_demo_sk
  and cd_demo_sk = ss_cdemo_sk
  and cd_marital_status = 'M'
  and cd_education_status = '4 yr Degree'
  and ss_sales_price between 0.00 and 50.00
  and hd_dep_count = 2
     ))
 and((ss_addr_sk = ca_address_sk
  and ca_country = 'United States'
  and ca_state in ('IL','TX','OH')
  and ss_net_profit between 0 and 200
     ) or
     (ss_addr_sk = ca_address_sk
  and ca_country = 'United States'
  and ca_state in ('CA','NM','KY')
  and ss_net_profit between 50 and 300
     ) or
     (ss_addr_sk = ca_address_sk
  and ca_country = 'United States'
  and ca_state in ('GA','TX','MS')
  and ss_net_profit between 0 and 250
     ))
"""

Q19 = """
select i_brand_id brand_id, i_brand brand, i_manufact_id, i_manufact,
 	sum(ss_ext_sales_price) ext_price
 from date_dim, store_sales, item,customer,customer_address,store
 where d_date_sk = ss_sold_date_sk
   and ss_item_sk = i_item_sk
   and i_manager_id=1
   and d_moy=11
   and d_year=2000
   and ss_customer_sk = c_customer_sk
   and c_current_addr_sk = ca_address_sk
   and substr(ca_zip,1,5) <> substr(s_zip,1,5)
   and ss_store_sk = s_store_sk
 group by i_brand
      ,i_brand_id
      ,i_manufact_id
      ,i_manufact
 order by ext_price desc
         ,i_brand
         ,i_brand_id
         ,i_manufact_id
         ,i_manufact
limit 100
"""

Q41 = """
select distinct(i_product_name)
 from item i1
 where i_manufact_id between 738 and 738+40
   and (select count(*) as item_cnt
from item
where (i_manufact = i1.i_manufact and
        ((i_category = 'Women' and
        (i_color = 'powder' or i_color = 'khaki') and
        (i_units = 'Ounce' or i_units = 'Oz') and
        (i_size = 'medium' or i_size = 'extra large')
        ) or
        (i_category = 'Women' and
        (i_color = 'brown' or i_color = 'forest') and
        (i_units = 'Lb' or i_units = 'Ton') and
        (i_size = 'N/A' or i_size = 'small')
        ) or
        (i_category = 'Men' and
        (i_color = 'floral' or i_color = 'deep') and
        (i_units = 'N/A' or i_units = 'Dozen') and
        (i_size = 'petite' or i_size = 'large')
        ) or
        (i_category = 'Men' and
        (i_color = 'light' or i_color = 'cornflower') and
        (i_units = 'Box' or i_units = 'Pound') and
        (i_size = 'medium' or i_size = 'extra large')
        ))) or
       (i_manufact = i1.i_manufact and
        ((i_category = 'Women' and
        (i_color = 'midnight' or i_color = 'snow') and
        (i_units = 'Pallet' or i_units = 'Gross') and
        (i_size = 'medium' or i_size = 'extra large')
        ) or
        (i_category = 'Women' and
        (i_color = 'cyan' or i_color = 'papaya') and
        (i_units = 'Cup' or i_units = 'Dram') and
        (i_size = 'N/A' or i_size = 'small')
        ) or
        (i_category = 'Men' and
        (i_color = 'orange' or i_color = 'frosted') and
        (i_units = 'Each' or i_units = 'Tbl') and
        (i_size = 'petite' or i_size = 'large')
        ) or
        (i_category = 'Men' and
        (i_color = 'forest' or i_color = 'ghost') and
        (i_units = 'Lb' or i_units = 'Bundle') and
        (i_size = 'medium' or i_size = 'extra large')
        )))) > 0
 order by i_product_name
 limit 100
"""

Q44 = """
select asceding.rnk, i1.i_product_name best_performing, i2.i_product_name worst_performing
from(select *
     from (select item_sk,rank() over (order by rank_col asc) rnk
           from (select ss_item_sk item_sk,avg(ss_net_profit) rank_col
                 from store_sales ss1
                 where ss_store_sk = 1
                 group by ss_item_sk
                 having avg(ss_net_profit) > 0.9*(select avg(ss_net_profit) rank_col
                                                  from store_sales
                                                  where ss_store_sk = 1
                                                    and ss_addr_sk is null
                                                  group by ss_store_sk))V1)V11
     where rnk  < 11) asceding,
    (select *
     from (select item_sk,rank() over (order by rank_col desc) rnk
           from (select ss_item_sk item_sk,avg(ss_net_profit) rank_col
                 from store_sales ss1
                 where ss_store_sk = 1
                 group by ss_item_sk
                 having avg(ss_net_profit) > 0.9*(select avg(ss_net_profit) rank_col
                                                  from store_sales
                                                  where ss_store_sk = 1
                                                    and ss_addr_sk is null
                                                  group by ss_store_sk))V2)V21
     where rnk  < 11) descending,
item i1, item i2
where asceding.rnk = descending.rnk
  and i1.i_item_sk=asceding.item_sk
  and i2.i_item_sk=descending.item_sk
order by asceding.rnk
limit 100
"""

Q48 = """
select sum (ss_quantity)
 from store_sales, store, customer_demographics, customer_address, date_dim
 where s_store_sk = ss_store_sk
 and  ss_sold_date_sk = d_date_sk and d_year = 2001
 and
 (
  (
   cd_demo_sk = ss_cdemo_sk
   and
   cd_marital_status = 'M'
   and
   cd_education_status = '4 yr Degree'
   and
   ss_sales_price between 50.00 and 100.00
   )
 or
  (
  cd_demo_sk = ss_cdemo_sk
   and
   cd_marital_status = 'D'
   and
   cd_education_status = '2 yr Degree'
   and
   ss_sales_price between 25.00 and 75.00
  )
 or
 (
  cd_demo_sk = ss_cdemo_sk
  and
   cd_marital_status = 'S'
   and
   cd_education_status = 'College'
   and
   ss_sales_price between 0.00 and 50.00
 )
 )
 and
 (
  (
  ss_addr_sk = ca_address_sk
  and
  ca_country = 'United States'
  and
  ca_state in ('IL', 'OH', 'TX')
  and ss_net_profit between 0 and 2000
  )
 or
  (ss_addr_sk = ca_address_sk
  and
  ca_country = 'United States'
  and
  ca_state in ('CA', 'MN', 'KY')
  and ss_net_profit between 150 and 3000
  )
 or
  (ss_addr_sk = ca_address_sk
  and
  ca_country = 'United States'
  and
  ca_state in ('GA', 'TX', 'MS')
  and ss_net_profit between 50 and 25000
  )
 )
"""


def test_tpcds_q8_text(tpcds):
    """q8 verbatim — store profit for zip prefixes shared with
    preferred-customer-heavy zips (INTERSECT + HAVING subquery)."""
    spark, con = tpcds
    _compare(spark, con, Q8, ordered=True, min_rows=1, check_names=False)


def test_tpcds_q13_text(tpcds):
    """q13 verbatim — tri-branch demographic x address disjunction
    averages."""
    spark, con = tpcds
    _compare(spark, con, Q13, ordered=False, min_rows=1, check_names=False, nonnull=True)


def test_tpcds_q19_text(tpcds):
    """q19 verbatim — brand/manufacturer revenue where customer and store
    zips differ."""
    spark, con = tpcds
    _compare(spark, con, Q19, ordered=True, min_rows=3)


def test_tpcds_q41_text(tpcds):
    """q41 verbatim — correlated COUNT(*) scalar subquery over the item
    dimension's color/units/size branches."""
    spark, con = tpcds
    _compare(spark, con, Q41, ordered=True, min_rows=3)


def test_tpcds_q44_text(tpcds):
    """q44 verbatim — best/worst performing items joined by rank (the
    NULL-addr anchor subquery sets the profitability bar)."""
    spark, con = tpcds
    _compare(spark, con, Q44, ordered=False, min_rows=5)


def test_tpcds_q48_text(tpcds):
    """q48 verbatim — the un-windowed quantity twin of q13."""
    spark, con = tpcds
    _compare(spark, con, Q48, ordered=False, min_rows=1, check_names=False, nonnull=True)


# Batch 9: demographic-profile EXISTS (q10), promo-ratio (q61), meal-time
# brand report (q71), income-band lookup (q84), am/pm ratio (q90), call
# center loss report (q91) — public spec templates, qualification
# parameters.

Q10 = """
select
  cd_gender,
  cd_marital_status,
  cd_education_status,
  count(*) cnt1,
  cd_purchase_estimate,
  count(*) cnt2,
  cd_credit_rating,
  count(*) cnt3,
  cd_dep_count,
  count(*) cnt4,
  cd_dep_employed_count,
  count(*) cnt5,
  cd_dep_college_count,
  count(*) cnt6
 from
  customer c,customer_address ca,customer_demographics
 where
  c.c_current_addr_sk = ca.ca_address_sk and
  ca_county in ('County 0','County 1','County 2','County 3','County 4') and
  cd_demo_sk = c.c_current_cdemo_sk and
  exists (select *
          from store_sales,date_dim
          where c.c_customer_sk = ss_customer_sk and
                ss_sold_date_sk = d_date_sk and
                d_year = 2002 and
                d_moy between 1 and 1+3) and
   (exists (select *
            from web_sales,date_dim
            where c.c_customer_sk = ws_bill_customer_sk and
                  ws_sold_date_sk = d_date_sk and
                  d_year = 2002 and
                  d_moy between 1 ANd 1+3) or
    exists (select *
            from catalog_sales,date_dim
            where c.c_customer_sk = cs_ship_customer_sk and
                  cs_sold_date_sk = d_date_sk and
                  d_year = 2002 and
                  d_moy between 1 and 1+3))
 group by cd_gender,
          cd_marital_status,
          cd_education_status,
          cd_purchase_estimate,
          cd_credit_rating,
          cd_dep_count,
          cd_dep_employed_count,
          cd_dep_college_count
 order by cd_gender,
          cd_marital_status,
          cd_education_status,
          cd_purchase_estimate,
          cd_credit_rating,
          cd_dep_count,
          cd_dep_employed_count,
          cd_dep_college_count
limit 100
"""

Q61 = """
select promotions,total,cast(promotions as decimal(15,4))/cast(total as decimal(15,4))*100
from
  (select sum(ss_ext_sales_price) promotions
   from  store_sales
        ,store
        ,promotion
        ,date_dim
        ,customer
        ,customer_address
        ,item
   where ss_sold_date_sk = d_date_sk
   and   ss_store_sk = s_store_sk
   and   ss_promo_sk = p_promo_sk
   and   ss_customer_sk= c_customer_sk
   and   ca_address_sk = c_current_addr_sk
   and   ss_item_sk = i_item_sk
   and   ca_gmt_offset = -5
   and   i_category = 'Books'
   and   (p_channel_dmail = 'Y' or p_channel_email = 'Y' or p_channel_tv = 'Y')
   and   s_gmt_offset = -5
   and   d_year = 2000
   and   d_moy  = 11) promotional_sales,
  (select sum(ss_ext_sales_price) total
   from  store_sales
        ,store
        ,date_dim
        ,customer
        ,customer_address
        ,item
   where ss_sold_date_sk = d_date_sk
   and   ss_store_sk = s_store_sk
   and   ss_customer_sk= c_customer_sk
   and   ca_address_sk = c_current_addr_sk
   and   ss_item_sk = i_item_sk
   and   ca_gmt_offset = -5
   and   i_category = 'Books'
   and   s_gmt_offset = -5
   and   d_year = 2000
   and   d_moy  = 11) all_sales
order by promotions, total
limit 100
"""

Q71 = """
select i_brand_id brand_id, i_brand brand,t_hour,t_minute,
 	sum(ext_price) ext_price
 from item, (select ws_ext_sales_price as ext_price,
                        ws_sold_date_sk as sold_date_sk,
                        ws_item_sk as sold_item_sk,
                        ws_sold_time_sk as time_sk
                 from web_sales,date_dim
                 where d_date_sk = ws_sold_date_sk
                   and d_moy=11
                   and d_year=2000
                 union all
                 select cs_ext_sales_price as ext_price,
                        cs_sold_date_sk as sold_date_sk,
                        cs_item_sk as sold_item_sk,
                        cs_sold_time_sk as time_sk
                 from catalog_sales,date_dim
                 where d_date_sk = cs_sold_date_sk
                   and d_moy=11
                   and d_year=2000
                 union all
                 select ss_ext_sales_price as ext_price,
                        ss_sold_date_sk as sold_date_sk,
                        ss_item_sk as sold_item_sk,
                        ss_sold_time_sk as time_sk
                 from store_sales,date_dim
                 where d_date_sk = ss_sold_date_sk
                   and d_moy=11
                   and d_year=2000
                 ) tmp,time_dim
 where sold_item_sk = i_item_sk
   and i_manager_id=1
   and time_sk = t_time_sk
   and (t_meal_time = 'breakfast' or t_meal_time = 'dinner')
 group by i_brand, i_brand_id,t_hour,t_minute
 order by ext_price desc, i_brand_id
"""

Q84 = """
select c_customer_id as customer_id
       , coalesce(c_last_name,'') || ', ' || coalesce(c_first_name,'') as customername
 from customer
     ,customer_address
     ,customer_demographics
     ,household_demographics
     ,income_band
     ,store_returns
 where ca_city	        =  'city 3'
   and c_current_addr_sk = ca_address_sk
   and ib_lower_bound   >=  38128
   and ib_upper_bound   <=  38128 + 50000
   and ib_income_band_sk = hd_income_band_sk
   and cd_demo_sk = c_current_cdemo_sk
   and hd_demo_sk = c_current_hdemo_sk
   and sr_cdemo_sk = cd_demo_sk
 order by c_customer_id
 limit 100
"""

Q90 = """
select cast(amc as decimal(15,4))/cast(pmc as decimal(15,4)) am_pm_ratio
 from ( select count(*) amc
       from web_sales, household_demographics , time_dim, web_page
       where ws_sold_time_sk = time_dim.t_time_sk
         and ws_ship_hdemo_sk = household_demographics.hd_demo_sk
         and ws_web_page_sk = web_page.wp_web_page_sk
         and time_dim.t_hour between 8 and 8+1
         and household_demographics.hd_dep_count = 2
         and web_page.wp_char_count between 5000 and 5200) at,
      ( select count(*) pmc
       from web_sales, household_demographics , time_dim, web_page
       where ws_sold_time_sk = time_dim.t_time_sk
         and ws_ship_hdemo_sk = household_demographics.hd_demo_sk
         and ws_web_page_sk = web_page.wp_web_page_sk
         and time_dim.t_hour between 19 and 19+1
         and household_demographics.hd_dep_count = 2
         and web_page.wp_char_count between 5000 and 5200) pt
 order by am_pm_ratio
 limit 100
"""

Q91 = """
select
        cc_call_center_id Call_Center,
        cc_name Call_Center_Name,
        cc_manager Manager,
        sum(cr_net_loss) Returns_Loss
from
        call_center,
        catalog_returns,
        date_dim,
        customer,
        customer_address,
        customer_demographics,
        household_demographics
where
        cr_call_center_sk       = cc_call_center_sk
and     cr_returned_date_sk     = d_date_sk
and     cr_returning_customer_sk= c_customer_sk
and     cd_demo_sk              = c_current_cdemo_sk
and     hd_demo_sk              = c_current_hdemo_sk
and     ca_address_sk           = c_current_addr_sk
and     d_year                  = 2000
and     d_moy                   = 11
and     ( (cd_marital_status       = 'M' and cd_education_status     = 'College')
        or(cd_marital_status       = 'S' and cd_education_status     = '2 yr Degree'))
and     hd_buy_potential like '>10000%'
and     ca_gmt_offset           = -5
group by cc_call_center_id,cc_name,cc_manager,cd_marital_status,cd_education_status
order by sum(cr_net_loss) desc
"""


def test_tpcds_q10_text(tpcds):
    """q10 verbatim — demographic profile of multi-channel Q1 shoppers
    via correlated EXISTS / OR-EXISTS."""
    spark, con = tpcds
    _compare(spark, con, Q10, ordered=True, min_rows=5)


def test_tpcds_q61_text(tpcds):
    """q61 verbatim — promotional share of category sales (decimal-cast
    ratio compared at 10 significant digits)."""
    spark, con = tpcds
    _compare(spark, con, Q61, ordered=False, min_rows=1, check_names=False, approx=True, nonnull=True)


def test_tpcds_q71_text(tpcds):
    """q71 verbatim — 3-channel brand revenue in breakfast/dinner hours."""
    spark, con = tpcds
    _compare(spark, con, Q71, ordered=False, min_rows=3)


def test_tpcds_q84_text(tpcds):
    """q84 verbatim — customers in one city within an income-band window
    (|| concat, returns-linked demographics)."""
    spark, con = tpcds
    _compare(spark, con, Q84, ordered=True, min_rows=10)


def test_tpcds_q90_text(tpcds):
    """q90 verbatim — web am/pm order-count ratio (decimal casts)."""
    spark, con = tpcds
    _compare(spark, con, Q90, ordered=False, min_rows=1, approx=True, nonnull=True)


def test_tpcds_q91_text(tpcds):
    """q91 verbatim — call-center catalog-return losses for targeted
    demographics."""
    spark, con = tpcds
    _compare(spark, con, Q91, ordered=True, min_rows=1)


# Batch 10: correlated-average price filter (q6), catalog shipping
# EXISTS chain (q16), decimal-cast rollup averages (q18), above-average
# returners by state (q30/q81), demographic EXISTS profiles (q35/q69) —
# public spec templates, qualification parameters.

Q6 = """
select a.ca_state state, count(*) cnt
 from customer_address a
     ,customer c
     ,store_sales s
     ,date_dim d
     ,item i
 where       a.ca_address_sk = c.c_current_addr_sk
 	and c.c_customer_sk = s.ss_customer_sk
 	and s.ss_sold_date_sk = d.d_date_sk
 	and s.ss_item_sk = i.i_item_sk
 	and d.d_month_seq =
 	     (select distinct (d_month_seq)
 	      from date_dim
               where d_year = 2000
 	        and d_moy = 3 )
 	and i.i_current_price > 1.2 *
             (select avg(j.i_current_price)
 	     from item j
 	     where j.i_category = i.i_category)
 group by a.ca_state
 having count(*) >= 10
 order by cnt, a.ca_state
 limit 100
"""

Q16 = """
select
   count(distinct cs_order_number) as order_count
  ,sum(cs_ext_ship_cost) as total_shipping_cost
  ,sum(cs_net_profit) as total_net_profit
from
   catalog_sales cs1
  ,date_dim
  ,customer_address
  ,call_center
where
    d_date between '2002-2-01' and
           (cast('2002-2-01' as date) + interval '60' day)
and cs1.cs_ship_date_sk = d_date_sk
and cs1.cs_ship_addr_sk = ca_address_sk
and ca_state = 'GA'
and cs1.cs_call_center_sk = cc_call_center_sk
and cc_county in ('Williamson County','Williamson County','Williamson County','Williamson County','Williamson County')
and exists (select *
            from catalog_sales cs2
            where cs1.cs_order_number = cs2.cs_order_number
              and cs1.cs_warehouse_sk <> cs2.cs_warehouse_sk)
and not exists(select *
               from catalog_returns cr1
               where cs1.cs_order_number = cr1.cr_order_number)
order by count(distinct cs_order_number)
limit 100
"""

Q18 = """
select i_item_id,
        ca_country,
        ca_state,
        ca_county,
        avg( cast(cs_quantity as decimal(12,2))) agg1,
        avg( cast(cs_list_price as decimal(12,2))) agg2,
        avg( cast(cs_coupon_amt as decimal(12,2))) agg3,
        avg( cast(cs_sales_price as decimal(12,2))) agg4,
        avg( cast(cs_net_profit as decimal(12,2))) agg5,
        avg( cast(c_birth_year as decimal(12,2))) agg6,
        avg( cast(cd1.cd_dep_count as decimal(12,2))) agg7
 from catalog_sales, customer_demographics cd1,
      customer_demographics cd2, customer, customer_address, date_dim, item
 where cs_sold_date_sk = d_date_sk and
       cs_item_sk = i_item_sk and
       cs_bill_cdemo_sk = cd1.cd_demo_sk and
       cs_bill_customer_sk = c_customer_sk and
       cd1.cd_gender = 'F' and
       cd1.cd_education_status = 'College' and
       c_current_cdemo_sk = cd2.cd_demo_sk and
       c_current_addr_sk = ca_address_sk and
       c_birth_month in (1,6,8,9,12,2) and
       d_year = 2000 and
       ca_state in ('IL','CA','TX','GA','IL','CA','TX')
 group by rollup (i_item_id, ca_country, ca_state, ca_county)
 order by ca_country, ca_state, ca_county, i_item_id
 limit 100
"""

Q30 = """
with customer_total_return as
 (select wr_returning_customer_sk as ctr_customer_sk
        ,ca_state as ctr_state,
 	sum(wr_return_amt) as ctr_total_return
 from web_returns
     ,date_dim
     ,customer_address
 where wr_returned_date_sk = d_date_sk
   and d_year =2002
   and wr_returning_addr_sk = ca_address_sk
 group by wr_returning_customer_sk
         ,ca_state)
  select c_customer_id,c_salutation,c_first_name,c_last_name,c_preferred_cust_flag
       ,c_birth_day,c_birth_month,c_birth_year,c_birth_country,c_login,c_email_address
       ,c_last_review_date_sk,ctr_total_return
 from customer_total_return ctr1
     ,customer_address
     ,customer
 where ctr1.ctr_total_return > (select avg(ctr_total_return)*1.2
 			  from customer_total_return ctr2
                  	  where ctr1.ctr_state = ctr2.ctr_state)
       and ca_address_sk = c_current_addr_sk
       and ca_state = 'GA'
       and ctr1.ctr_customer_sk = c_customer_sk
 order by c_customer_id,c_salutation,c_first_name,c_last_name,c_preferred_cust_flag
                  ,c_birth_day,c_birth_month,c_birth_year,c_birth_country,c_login,c_email_address
                  ,c_last_review_date_sk,ctr_total_return
limit 100
"""

Q35 = """
select
  ca_state,
  cd_gender,
  cd_marital_status,
  cd_dep_count,
  count(*) cnt1,
  avg(cd_dep_count),
  max(cd_dep_count),
  sum(cd_dep_count),
  cd_dep_employed_count,
  count(*) cnt2,
  avg(cd_dep_employed_count),
  max(cd_dep_employed_count),
  sum(cd_dep_employed_count),
  cd_dep_college_count,
  count(*) cnt3,
  avg(cd_dep_college_count),
  max(cd_dep_college_count),
  sum(cd_dep_college_count)
 from
  customer c,customer_address ca,customer_demographics
 where
  c.c_current_addr_sk = ca.ca_address_sk and
  cd_demo_sk = c.c_current_cdemo_sk and
  exists (select *
          from store_sales,date_dim
          where c.c_customer_sk = ss_customer_sk and
                ss_sold_date_sk = d_date_sk and
                d_year = 2002 and
                d_qoy < 4) and
   (exists (select *
            from web_sales,date_dim
            where c.c_customer_sk = ws_bill_customer_sk and
                  ws_sold_date_sk = d_date_sk and
                  d_year = 2002 and
                  d_qoy < 4) or
    exists (select *
            from catalog_sales,date_dim
            where c.c_customer_sk = cs_ship_customer_sk and
                  cs_sold_date_sk = d_date_sk and
                  d_year = 2002 and
                  d_qoy < 4))
 group by ca_state,
          cd_gender,
          cd_marital_status,
          cd_dep_count,
          cd_dep_employed_count,
          cd_dep_college_count
 order by ca_state,
          cd_gender,
          cd_marital_status,
          cd_dep_count,
          cd_dep_employed_count,
          cd_dep_college_count
 limit 100
"""

Q69 = """
select
  cd_gender,
  cd_marital_status,
  cd_education_status,
  count(*) cnt1,
  cd_purchase_estimate,
  count(*) cnt2,
  cd_credit_rating,
  count(*) cnt3
 from
  customer c,customer_address ca,customer_demographics
 where
  c.c_current_addr_sk = ca.ca_address_sk and
  ca_state in ('IL','TX','GA') and
  cd_demo_sk = c.c_current_cdemo_sk and
  exists (select *
          from store_sales,date_dim
          where c.c_customer_sk = ss_customer_sk and
                ss_sold_date_sk = d_date_sk and
                d_year = 2001 and
                d_moy between 4 and 4+2) and
   (not exists (select *
            from web_sales,date_dim
            where c.c_customer_sk = ws_bill_customer_sk and
                  ws_sold_date_sk = d_date_sk and
                  d_year = 2001 and
                  d_moy between 4 and 4+2) and
    not exists (select *
            from catalog_sales,date_dim
            where c.c_customer_sk = cs_ship_customer_sk and
                  cs_sold_date_sk = d_date_sk and
                  d_year = 2001 and
                  d_moy between 4 and 4+2))
 group by cd_gender,
          cd_marital_status,
          cd_education_status,
          cd_purchase_estimate,
          cd_credit_rating
 order by cd_gender,
          cd_marital_status,
          cd_education_status,
          cd_purchase_estimate,
          cd_credit_rating
 limit 100
"""

Q81 = """
with customer_total_return as
 (select cr_returning_customer_sk as ctr_customer_sk
        ,ca_state as ctr_state,
 	sum(cr_return_amt_inc_tax) as ctr_total_return
 from catalog_returns
     ,date_dim
     ,customer_address
 where cr_returned_date_sk = d_date_sk
   and d_year =2000
   and cr_returning_addr_sk = ca_address_sk
 group by cr_returning_customer_sk
         ,ca_state )
  select c_customer_id,c_salutation,c_first_name,c_last_name,ca_street_number,ca_street_name
                   ,ca_street_type,ca_suite_number,ca_city,ca_county,ca_state,ca_zip,ca_country,ca_gmt_offset
                  ,ca_location_type,ctr_total_return
 from customer_total_return ctr1
     ,customer_address
     ,customer
 where ctr1.ctr_total_return > (select avg(ctr_total_return)*1.2
 			  from customer_total_return ctr2
                  	  where ctr1.ctr_state = ctr2.ctr_state)
       and ca_address_sk = c_current_addr_sk
       and ca_state = 'GA'
       and ctr1.ctr_customer_sk = c_customer_sk
 order by c_customer_id,c_salutation,c_first_name,c_last_name,ca_street_number,ca_street_name
                   ,ca_street_type,ca_suite_number,ca_city,ca_county,ca_state,ca_zip,ca_country,ca_gmt_offset
                  ,ca_location_type,ctr_total_return
 limit 100
"""


def test_tpcds_q6_text(tpcds):
    """q6 verbatim — states where >=10 sales of items priced 20% above
    their category average (correlated scalar average)."""
    spark, con = tpcds
    _compare(spark, con, Q6, ordered=True, min_rows=1)


def test_tpcds_q16_text(tpcds):
    """q16 verbatim — unreturned multi-warehouse catalog orders (the
    catalog twin of q94)."""
    spark, con = tpcds
    _compare(spark, con, Q16, ordered=True, min_rows=1, nonnull=True)


def test_tpcds_q18_text(tpcds):
    """q18 verbatim — decimal-cast catalog averages over a 4-level
    rollup.  Spark's avg(decimal(12,2)) result type is decimal(16,6)
    (scale+4); DuckDB computes avg in double, so the oracle text casts
    each average to decimal(16,6) to align the declared result type —
    the rounded-to-scale-6 values must then match exactly."""
    spark, con = tpcds
    import re

    oracle = re.sub(
        r"avg\( cast\(([\w.]+) as decimal\(12,2\)\)\) (agg\d)",
        r"cast(avg( cast(\1 as decimal(12,2))) as decimal(16,6)) \2",
        Q18,
    )
    assert oracle.count("decimal(16,6)") == 7, oracle
    _compare(spark, con, Q18, ordered=True, min_rows=20, oracle_sql=oracle)


def test_tpcds_q30_text(tpcds):
    """q30 verbatim — web returners 20% above their state average."""
    spark, con = tpcds
    _compare(spark, con, Q30, ordered=True, min_rows=3)


def test_tpcds_q35_text(tpcds):
    """q35 verbatim — dependent-count stats for multi-channel shoppers
    (EXISTS + OR-EXISTS)."""
    spark, con = tpcds
    _compare(spark, con, Q35, ordered=True, min_rows=20, check_names=False)


def test_tpcds_q69_text(tpcds):
    """q69 verbatim — store-only shoppers (EXISTS + NOT EXISTS x2)."""
    spark, con = tpcds
    _compare(spark, con, Q69, ordered=True, min_rows=5)


def test_tpcds_q81_text(tpcds):
    """q81 verbatim — catalog returners 20% above their state average
    (full address projection)."""
    spark, con = tpcds
    _compare(spark, con, Q81, ordered=True, min_rows=3)


# Batch 11: same-zip clerk fraud (q24a/b), return-lag store buckets
# (q50), web-vs-store cumulative crossover (q51), maternity follow-on
# revenue segments (q54), state/county profit rollup with top-state
# subquery (q70) — public spec templates, qualification parameters.

Q24_BODY = """
with ssales as
(select c_last_name
      ,c_first_name
      ,s_store_name
      ,ca_state
      ,s_state
      ,i_color
      ,i_current_price
      ,i_manager_id
      ,i_units
      ,i_size
      ,sum(ss_net_paid) netpaid
from store_sales
    ,store_returns
    ,store
    ,item
    ,customer
    ,customer_address
where ss_ticket_number = sr_ticket_number
  and ss_item_sk = sr_item_sk
  and ss_customer_sk = c_customer_sk
  and ss_item_sk = i_item_sk
  and ss_store_sk = s_store_sk
  and c_current_addr_sk = ca_address_sk
  and c_birth_country <> upper(ca_country)
  and s_zip = ca_zip
and s_market_id=8
group by c_last_name
        ,c_first_name
        ,s_store_name
        ,ca_state
        ,s_state
        ,i_color
        ,i_current_price
        ,i_manager_id
        ,i_units
        ,i_size)
select c_last_name
      ,c_first_name
      ,s_store_name
      ,sum(netpaid) paid
from ssales
where i_color = '{color}'
group by c_last_name
        ,c_first_name
        ,s_store_name
having sum(netpaid) > (select 0.05*avg(netpaid)
                           from ssales)
order by c_last_name
        ,c_first_name
        ,s_store_name
"""

Q24A = Q24_BODY.format(color="medium")
Q24B = Q24_BODY.format(color="floral")

Q50 = """
select
   s_store_name
  ,s_company_id
  ,s_street_number
  ,s_street_name
  ,s_street_type
  ,s_suite_number
  ,s_city
  ,s_county
  ,s_state
  ,s_zip
  ,sum(case when (sr_returned_date_sk - ss_sold_date_sk <= 30 ) then 1 else 0 end)  as days_30
  ,sum(case when (sr_returned_date_sk - ss_sold_date_sk > 30) and
                 (sr_returned_date_sk - ss_sold_date_sk <= 60) then 1 else 0 end )  as days_31_60
  ,sum(case when (sr_returned_date_sk - ss_sold_date_sk > 60) and
                 (sr_returned_date_sk - ss_sold_date_sk <= 90) then 1 else 0 end)  as days_61_90
  ,sum(case when (sr_returned_date_sk - ss_sold_date_sk > 90) and
                 (sr_returned_date_sk - ss_sold_date_sk <= 120) then 1 else 0 end)  as days_91_120
  ,sum(case when (sr_returned_date_sk - ss_sold_date_sk  > 120) then 1 else 0 end)  as days_more_120
from
   store_sales
  ,store_returns
  ,store
  ,date_dim d1
  ,date_dim d2
where
    d2.d_year = 2001
and d2.d_moy  = 8
and ss_ticket_number = sr_ticket_number
and ss_item_sk = sr_item_sk
and ss_sold_date_sk   = d1.d_date_sk
and sr_returned_date_sk   = d2.d_date_sk
and ss_customer_sk = sr_customer_sk
and ss_store_sk = s_store_sk
group by
   s_store_name
  ,s_company_id
  ,s_street_number
  ,s_street_name
  ,s_street_type
  ,s_suite_number
  ,s_city
  ,s_county
  ,s_state
  ,s_zip
order by s_store_name
        ,s_company_id
        ,s_street_number
        ,s_street_name
        ,s_street_type
        ,s_suite_number
        ,s_city
        ,s_county
        ,s_state
        ,s_zip
        ,days_30
        ,days_31_60
        ,days_61_90
        ,days_91_120
        ,days_more_120
limit 100
"""

Q51 = """
WITH web_v1 as (
select
  ws_item_sk item_sk, d_date,
  sum(sum(ws_sales_price))
      over (partition by ws_item_sk order by d_date rows between unbounded preceding and current row) cume_sales
from web_sales
    ,date_dim
where ws_sold_date_sk=d_date_sk
  and d_month_seq between 1200 and 1200+11
  and ws_item_sk is not NULL
group by ws_item_sk, d_date),
store_v1 as (
select
  ss_item_sk item_sk, d_date,
  sum(sum(ss_sales_price))
      over (partition by ss_item_sk order by d_date rows between unbounded preceding and current row) cume_sales
from store_sales
    ,date_dim
where ss_sold_date_sk=d_date_sk
  and d_month_seq between 1200 and 1200+11
  and ss_item_sk is not NULL
group by ss_item_sk, d_date)
 select  *
from (select item_sk
     ,d_date
     ,web_sales
     ,store_sales
     ,max(web_sales)
         over (partition by item_sk order by d_date rows between unbounded preceding and current row) web_cumulative
     ,max(store_sales)
         over (partition by item_sk order by d_date rows between unbounded preceding and current row) store_cumulative
     from (select case when web.item_sk is not null then web.item_sk else store.item_sk end item_sk
                 ,case when web.d_date is not null then web.d_date else store.d_date end d_date
                 ,web.cume_sales web_sales
                 ,store.cume_sales store_sales
           from web_v1 web full outer join store_v1 store on (web.item_sk = store.item_sk
                                                          and web.d_date = store.d_date)
          )x )y
where web_cumulative > store_cumulative
order by item_sk
        ,d_date
limit 100
"""

Q54 = """
with my_customers as (
 select distinct c_customer_sk
        , c_current_addr_sk
 from
        ( select cs_sold_date_sk sold_date_sk,
                 cs_bill_customer_sk customer_sk,
                 cs_item_sk item_sk
          from   catalog_sales
          union all
          select ws_sold_date_sk sold_date_sk,
                 ws_bill_customer_sk customer_sk,
                 ws_item_sk item_sk
          from   web_sales
         ) cs_or_ws_sales,
         item,
         date_dim,
         customer
 where   sold_date_sk = d_date_sk
         and item_sk = i_item_sk
         and i_category = 'Women'
         and i_class = 'maternity'
         and c_customer_sk = cs_or_ws_sales.customer_sk
         and d_moy = 12
         and d_year = 2000
 )
 , my_revenue as (
 select c_customer_sk,
        sum(ss_ext_sales_price) as revenue
 from   my_customers,
        store_sales,
        customer_address,
        store,
        date_dim
 where  c_current_addr_sk = ca_address_sk
        and ca_county = s_county
        and ca_state = s_state
        and ss_sold_date_sk = d_date_sk
        and c_customer_sk = ss_customer_sk
        and d_month_seq between (select distinct d_month_seq+1
                                 from   date_dim where d_year = 2000 and d_moy = 12)
                           and  (select distinct d_month_seq+3
                                 from   date_dim where d_year = 2000 and d_moy = 12)
 group by c_customer_sk
 )
 , segments as
 (select cast((revenue/50) as int) as segment
  from   my_revenue
 )
  select segment, count(*) as num_customers, segment*50 as segment_base
 from segments
 group by segment
 order by segment, num_customers
 limit 100
"""

Q70 = """
select
    sum(ss_net_profit) as total_sum
   ,s_state
   ,s_county
   ,grouping(s_state)+grouping(s_county) as lochierarchy
   ,rank() over (
 	partition by grouping(s_state)+grouping(s_county),
 	case when grouping(s_county) = 0 then s_state end
 	order by sum(ss_net_profit) desc) as rank_within_parent
 from
    store_sales
   ,date_dim       d1
   ,store
 where
    d1.d_month_seq between 1200 and 1200+11
 and d1.d_date_sk = ss_sold_date_sk
 and s_store_sk  = ss_store_sk
 and s_state in
             ( select s_state
               from  (select s_state as s_state,
 			    rank() over ( partition by s_state order by sum(ss_net_profit) desc) as ranking
                      from   store_sales, store, date_dim
                      where  d_month_seq between 1200 and 1200+11
 			    and d_date_sk = ss_sold_date_sk
 			    and s_store_sk  = ss_store_sk
                      group by s_state
                     ) tmp1
               where ranking <= 5
             )
 group by rollup(s_state,s_county)
 order by
   lochierarchy desc
  ,case when lochierarchy = 0 then s_state end
  ,rank_within_parent
 limit 100
"""


def test_tpcds_q24a_text(tpcds):
    """q24a verbatim — same-zip customer/store net-paid with a CTE-wide
    average HAVING bar (color 'medium')."""
    spark, con = tpcds
    _compare(spark, con, Q24A, ordered=True, min_rows=1)


def test_tpcds_q24b_text(tpcds):
    """q24b verbatim — the second color variant ('floral')."""
    spark, con = tpcds
    _compare(spark, con, Q24B, ordered=True, min_rows=1)


def test_tpcds_q50_text(tpcds):
    """q50 verbatim — sold-to-returned day buckets per store (full
    street projection)."""
    spark, con = tpcds
    _compare(spark, con, Q50, ordered=True, min_rows=1)


def test_tpcds_q51_text(tpcds):
    """q51 verbatim — running-max cumulative web-vs-store crossover over
    a FULL OUTER join of two windowed CTEs."""
    spark, con = tpcds
    _compare(spark, con, Q51, ordered=True, min_rows=20)


def test_tpcds_q54_text(tpcds):
    """q54 verbatim — $50 revenue segments of maternity buyers' follow-on
    store spend.  Spark casts double->int by truncation, DuckDB by
    rounding: the oracle floors before casting to align the declared
    semantics (revenue is positive)."""
    spark, con = tpcds
    oracle = Q54.replace("cast((revenue/50) as int)", "cast(floor(revenue/50) as int)")
    assert "floor" in oracle
    _compare(spark, con, Q54, ordered=True, min_rows=1, oracle_sql=oracle)


def test_tpcds_q70_text(tpcds):
    """q70 verbatim — state/county profit rollup restricted to top-ranked
    states (rank subquery in the WHERE)."""
    spark, con = tpcds
    _compare(spark, con, Q70, ordered=False, min_rows=2)


# Batch 12 — the last five variants: channel rollups (q5/q77/q80) and
# cross-channel item consistency (q58/q83).  Public spec templates,
# qualification parameters.

Q5 = """
with ssr as
 (select s_store_id,
        sum(sales_price) as sales,
        sum(profit) as profit,
        sum(return_amt) as returns,
        sum(net_loss) as profit_loss
 from
  ( select  ss_store_sk as store_sk,
            ss_sold_date_sk  as date_sk,
            ss_ext_sales_price as sales_price,
            ss_net_profit as profit,
            cast(0 as decimal(7,2)) as return_amt,
            cast(0 as decimal(7,2)) as net_loss
    from store_sales
    union all
    select sr_store_sk as store_sk,
           sr_returned_date_sk as date_sk,
           cast(0 as decimal(7,2)) as sales_price,
           cast(0 as decimal(7,2)) as profit,
           sr_return_amt as return_amt,
           sr_net_loss as net_loss
    from store_returns
   ) salesreturns,
     date_dim,
     store
 where date_sk = d_date_sk
       and d_date between cast('2000-08-23' as date)
                  and (cast('2000-08-23' as date) +  interval '14' day)
       and store_sk = s_store_sk
 group by s_store_id)
 ,
 csr as
 (select cp_catalog_page_id,
        sum(sales_price) as sales,
        sum(profit) as profit,
        sum(return_amt) as returns,
        sum(net_loss) as profit_loss
 from
  ( select  cs_catalog_page_sk as page_sk,
            cs_sold_date_sk  as date_sk,
            cs_ext_sales_price as sales_price,
            cs_net_profit as profit,
            cast(0 as decimal(7,2)) as return_amt,
            cast(0 as decimal(7,2)) as net_loss
    from catalog_sales
    union all
    select cr_catalog_page_sk as page_sk,
           cr_returned_date_sk as date_sk,
           cast(0 as decimal(7,2)) as sales_price,
           cast(0 as decimal(7,2)) as profit,
           cr_return_amount as return_amt,
           cr_net_loss as net_loss
    from catalog_returns
   ) salesreturns,
     date_dim,
     catalog_page
 where date_sk = d_date_sk
       and d_date between cast('2000-08-23' as date)
                  and (cast('2000-08-23' as date) +  interval '14' day)
       and page_sk = cp_catalog_page_sk
 group by cp_catalog_page_id)
 ,
 wsr as
 (select web_site_id,
        sum(sales_price) as sales,
        sum(profit) as profit,
        sum(return_amt) as returns,
        sum(net_loss) as profit_loss
 from
  ( select  ws_web_site_sk as wsr_web_site_sk,
            ws_sold_date_sk  as date_sk,
            ws_ext_sales_price as sales_price,
            ws_net_profit as profit,
            cast(0 as decimal(7,2)) as return_amt,
            cast(0 as decimal(7,2)) as net_loss
    from web_sales
    union all
    select ws_web_site_sk as wsr_web_site_sk,
           wr_returned_date_sk as date_sk,
           cast(0 as decimal(7,2)) as sales_price,
           cast(0 as decimal(7,2)) as profit,
           wr_return_amt as return_amt,
           wr_net_loss as net_loss
    from web_returns left outer join web_sales on
         ( wr_item_sk = ws_item_sk
           and wr_order_number = ws_order_number)
   ) salesreturns,
     date_dim,
     web_site
 where date_sk = d_date_sk
       and d_date between cast('2000-08-23' as date)
                  and (cast('2000-08-23' as date) +  interval '14' day)
       and wsr_web_site_sk = web_site_sk
 group by web_site_id)
  select channel
        ,id
        ,sum(sales) as sales
        ,sum(returns) as returns
        ,sum(profit) as profit
 from
 (select 'store channel' as channel
        ,'store' || s_store_id as id
        ,sales
        ,returns
        ,(profit - profit_loss) as profit
 from   ssr
 union all
 select 'catalog channel' as channel
        ,'catalog_page' || cp_catalog_page_id as id
        ,sales
        ,returns
        ,(profit - profit_loss) as profit
 from  csr
 union all
 select 'web channel' as channel
        ,'web_site' || web_site_id as id
        ,sales
        ,returns
        ,(profit - profit_loss) as profit
 from   wsr
 ) x
 group by rollup (channel, id)
 order by channel
         ,id
 limit 100
"""

Q58 = """
with ss_items as
 (select i_item_id item_id
        ,sum(ss_ext_sales_price) ss_item_rev
 from store_sales
     ,item
     ,date_dim
 where ss_item_sk = i_item_sk
   and d_date in (select d_date
                  from date_dim
                  where d_week_seq = (select d_week_seq
                                      from date_dim
                                      where d_date = '2000-01-03'))
   and ss_sold_date_sk   = d_date_sk
 group by i_item_id),
 cs_items as
 (select i_item_id item_id
        ,sum(cs_ext_sales_price) cs_item_rev
  from catalog_sales
      ,item
      ,date_dim
 where cs_item_sk = i_item_sk
  and  d_date in (select d_date
                  from date_dim
                  where d_week_seq = (select d_week_seq
                                      from date_dim
                                      where d_date = '2000-01-03'))
  and  cs_sold_date_sk = d_date_sk
 group by i_item_id),
 ws_items as
 (select i_item_id item_id
        ,sum(ws_ext_sales_price) ws_item_rev
  from web_sales
      ,item
      ,date_dim
 where ws_item_sk = i_item_sk
  and  d_date in (select d_date
                  from date_dim
                  where d_week_seq =(select d_week_seq
                                     from date_dim
                                     where d_date = '2000-01-03'))
  and ws_sold_date_sk   = d_date_sk
 group by i_item_id)
  select ss_items.item_id
       ,ss_item_rev
       ,ss_item_rev/((ss_item_rev+cs_item_rev+ws_item_rev)/3) * 100 ss_dev
       ,cs_item_rev
       ,cs_item_rev/((ss_item_rev+cs_item_rev+ws_item_rev)/3) * 100 cs_dev
       ,ws_item_rev
       ,ws_item_rev/((ss_item_rev+cs_item_rev+ws_item_rev)/3) * 100 ws_dev
       ,(ss_item_rev+cs_item_rev+ws_item_rev)/3 average
 from ss_items,cs_items,ws_items
 where ss_items.item_id=cs_items.item_id
   and ss_items.item_id=ws_items.item_id
   and ss_item_rev between 0.9 * cs_item_rev and 1.1 * cs_item_rev
   and ss_item_rev between 0.9 * ws_item_rev and 1.1 * ws_item_rev
   and cs_item_rev between 0.9 * ss_item_rev and 1.1 * ss_item_rev
   and cs_item_rev between 0.9 * ws_item_rev and 1.1 * ws_item_rev
   and ws_item_rev between 0.9 * ss_item_rev and 1.1 * ss_item_rev
   and ws_item_rev between 0.9 * cs_item_rev and 1.1 * cs_item_rev
 order by ss_items.item_id
         ,ss_item_rev
 limit 100
"""

Q77 = """
with ss as
 (select s_store_sk,
         sum(ss_ext_sales_price) as sales,
         sum(ss_net_profit) as profit
 from store_sales,
      date_dim,
      store
 where ss_sold_date_sk = d_date_sk
       and d_date between cast('2000-08-23' as date)
                  and (cast('2000-08-23' as date) +  interval '30' day)
       and ss_store_sk = s_store_sk
 group by s_store_sk)
 ,
 sr as
 (select s_store_sk,
         sum(sr_return_amt) as returns,
         sum(sr_net_loss) as profit_loss
 from store_returns,
      date_dim,
      store
 where sr_returned_date_sk = d_date_sk
       and d_date between cast('2000-08-23' as date)
                  and (cast('2000-08-23' as date) +  interval '30' day)
       and sr_store_sk = s_store_sk
 group by s_store_sk),
 cs as
 (select cs_call_center_sk,
        sum(cs_ext_sales_price) as sales,
        sum(cs_net_profit) as profit
 from catalog_sales,
      date_dim
 where cs_sold_date_sk = d_date_sk
       and d_date between cast('2000-08-23' as date)
                  and (cast('2000-08-23' as date) +  interval '30' day)
 group by cs_call_center_sk
 ),
 cr as
 (select cr_call_center_sk,
         sum(cr_return_amount) as returns,
         sum(cr_net_loss) as profit_loss
 from catalog_returns,
      date_dim
 where cr_returned_date_sk = d_date_sk
       and d_date between cast('2000-08-23' as date)
                  and (cast('2000-08-23' as date) +  interval '30' day)
 group by cr_call_center_sk
 ),
 ws as
 ( select wp_web_page_sk,
        sum(ws_ext_sales_price) as sales,
        sum(ws_net_profit) as profit
 from web_sales,
      date_dim,
      web_page
 where ws_sold_date_sk = d_date_sk
       and d_date between cast('2000-08-23' as date)
                  and (cast('2000-08-23' as date) +  interval '30' day)
       and ws_web_page_sk = wp_web_page_sk
 group by wp_web_page_sk),
 wr as
 (select wp_web_page_sk,
        sum(wr_return_amt) as returns,
        sum(wr_net_loss) as profit_loss
 from web_returns,
      date_dim,
      web_page
 where wr_returned_date_sk = d_date_sk
       and d_date between cast('2000-08-23' as date)
                  and (cast('2000-08-23' as date) +  interval '30' day)
       and wr_web_page_sk = wp_web_page_sk
 group by wp_web_page_sk)
  select channel
        , id
        , sum(sales) as sales
        , sum(returns) as returns
        , sum(profit) as profit
 from
 (select 'store channel' as channel
        , ss.s_store_sk as id
        , sales
        , coalesce(returns, 0) as returns
        , (profit - coalesce(profit_loss,0)) as profit
 from   ss left join sr
        on  ss.s_store_sk = sr.s_store_sk
 union all
 select 'catalog channel' as channel
        , cs_call_center_sk as id
        , sales
        , returns
        , (profit - profit_loss) as profit
 from  cs
       , cr
 union all
 select 'web channel' as channel
        , ws.wp_web_page_sk as id
        , sales
        , coalesce(returns, 0) returns
        , (profit - coalesce(profit_loss,0)) as profit
 from   ws left join wr
        on  ws.wp_web_page_sk = wr.wp_web_page_sk
 ) x
 group by rollup (channel, id)
 order by channel
         ,id
 limit 100
"""

Q80 = """
with ssr as
 (select  s_store_id as store_id,
          sum(ss_ext_sales_price) as sales,
          sum(coalesce(sr_return_amt, 0)) as returns,
          sum(ss_net_profit - coalesce(sr_net_loss, 0)) as profit
  from store_sales left outer join store_returns on
         (ss_item_sk = sr_item_sk and ss_ticket_number = sr_ticket_number),
     date_dim,
     store,
     item,
     promotion
 where ss_sold_date_sk = d_date_sk
       and d_date between cast('2000-08-23' as date)
                  and (cast('2000-08-23' as date) +  interval '30' day)
       and ss_store_sk = s_store_sk
       and ss_item_sk = i_item_sk
       and i_current_price > 50
       and ss_promo_sk = p_promo_sk
       and p_channel_tv = 'N'
 group by s_store_id)
 ,
 csr as
 (select  cp_catalog_page_id as catalog_page_id,
          sum(cs_ext_sales_price) as sales,
          sum(coalesce(cr_return_amount, 0)) as returns,
          sum(cs_net_profit - coalesce(cr_net_loss, 0)) as profit
  from catalog_sales left outer join catalog_returns on
         (cs_item_sk = cr_item_sk and cs_order_number = cr_order_number),
     date_dim,
     catalog_page,
     item,
     promotion
 where cs_sold_date_sk = d_date_sk
       and d_date between cast('2000-08-23' as date)
                  and (cast('2000-08-23' as date) +  interval '30' day)
        and cs_catalog_page_sk = cp_catalog_page_sk
       and cs_item_sk = i_item_sk
       and i_current_price > 50
       and cs_promo_sk = p_promo_sk
       and p_channel_tv = 'N'
group by cp_catalog_page_id)
 ,
 wsr as
 (select  web_site_id,
          sum(ws_ext_sales_price) as sales,
          sum(coalesce(wr_return_amt, 0)) as returns,
          sum(ws_net_profit - coalesce(wr_net_loss, 0)) as profit
  from web_sales left outer join web_returns on
         (ws_item_sk = wr_item_sk and ws_order_number = wr_order_number),
     date_dim,
     web_site,
     item,
     promotion
 where ws_sold_date_sk = d_date_sk
       and d_date between cast('2000-08-23' as date)
                  and (cast('2000-08-23' as date) +  interval '30' day)
        and ws_web_site_sk = web_site_sk
       and ws_item_sk = i_item_sk
       and i_current_price > 50
       and ws_promo_sk = p_promo_sk
       and p_channel_tv = 'N'
group by web_site_id)
  select channel
        , id
        , sum(sales) as sales
        , sum(returns) as returns
        , sum(profit) as profit
 from
 (select 'store channel' as channel
        , 'store' || store_id as id
        , sales
        , returns
        , profit
 from   ssr
 union all
 select 'catalog channel' as channel
        , 'catalog_page' || catalog_page_id as id
        , sales
        , returns
        , profit
 from  csr
 union all
 select 'web channel' as channel
        , 'web_site' || web_site_id as id
        , sales
        , returns
        , profit
 from   wsr
 ) x
 group by rollup (channel, id)
 order by channel
         ,id
 limit 100
"""

Q83 = """
with sr_items as
 (select i_item_id item_id,
        sum(sr_return_quantity) sr_item_qty
 from store_returns,
      item,
      date_dim
 where sr_item_sk = i_item_sk
 and   d_date    in
	(select d_date
	from date_dim
	where d_week_seq in
		(select d_week_seq
		from date_dim
	  where d_date in ('2000-06-30','2000-09-27','2000-11-17')))
 and   sr_returned_date_sk   = d_date_sk
 group by i_item_id),
 cr_items as
 (select i_item_id item_id,
        sum(cr_return_quantity) cr_item_qty
 from catalog_returns,
      item,
      date_dim
 where cr_item_sk = i_item_sk
 and   d_date    in
	(select d_date
	from date_dim
	where d_week_seq in
		(select d_week_seq
		from date_dim
	  where d_date in ('2000-06-30','2000-09-27','2000-11-17')))
 and   cr_returned_date_sk   = d_date_sk
 group by i_item_id),
 wr_items as
 (select i_item_id item_id,
        sum(wr_return_quantity) wr_item_qty
 from web_returns,
      item,
      date_dim
 where wr_item_sk = i_item_sk
 and   d_date    in
	(select d_date
	from date_dim
	where d_week_seq in
		(select d_week_seq
		from date_dim
		where d_date in ('2000-06-30','2000-09-27','2000-11-17')))
 and   wr_returned_date_sk   = d_date_sk
 group by i_item_id)
  select sr_items.item_id
       ,sr_item_qty
       ,sr_item_qty/(sr_item_qty+cr_item_qty+wr_item_qty)/3.0 * 100 sr_dev
       ,cr_item_qty
       ,cr_item_qty/(sr_item_qty+cr_item_qty+wr_item_qty)/3.0 * 100 cr_dev
       ,wr_item_qty
       ,wr_item_qty/(sr_item_qty+cr_item_qty+wr_item_qty)/3.0 * 100 wr_dev
       ,(sr_item_qty+cr_item_qty+wr_item_qty)/3.0 average
 from sr_items
     ,cr_items
     ,wr_items
 where sr_items.item_id=cr_items.item_id
   and sr_items.item_id=wr_items.item_id
 order by sr_items.item_id
         ,sr_item_qty
 limit 100
"""


def test_tpcds_q5_text(tpcds):
    """q5 verbatim — sales/returns/profit rollup across the three
    channels (typed-zero union legs, web returns re-keyed through a
    left join)."""
    spark, con = tpcds
    _compare(spark, con, Q5, ordered=True, min_rows=10)


def test_tpcds_q58_text(tpcds):
    """q58 verbatim — items with near-equal single-week revenue in all
    three channels (six mutual BETWEEN bounds)."""
    spark, con = tpcds
    _compare(spark, con, Q58, ordered=True, min_rows=1)


def test_tpcds_q77_text(tpcds):
    """q77 verbatim — per-location channel profit rollup with left-join
    return legs (DuckDB parses bare `returns` only in some positions, so
    the oracle quotes the identifier; the engine runs the verbatim
    text)."""
    spark, con = tpcds
    import re

    oracle = re.sub(r"\breturns\b", '"returns"', Q77)
    _compare(spark, con, Q77, ordered=True, min_rows=10, oracle_sql=oracle)


def test_tpcds_q80_text(tpcds):
    """q80 verbatim — promo-filtered channel rollup over left-joined
    returns."""
    spark, con = tpcds
    _compare(spark, con, Q80, ordered=True, min_rows=5)


def test_tpcds_q83_text(tpcds):
    """q83 verbatim — items returned through all three channels in three
    chosen weeks."""
    spark, con = tpcds
    _compare(spark, con, Q83, ordered=True, min_rows=1)


# Batch 13 — final variants: per-channel return-ratio ranks (q49),
# 12-month warehouse shipping pivot (q66), refund-demographics averages
# (q85).  Public spec templates, qualification parameters.

Q49 = """
select channel, item, return_ratio, return_rank, currency_rank from
 (select
 'web' as channel
 ,web.item
 ,web.return_ratio
 ,web.return_rank
 ,web.currency_rank
 from (
 	select
 	 item
 	,return_ratio
 	,currency_ratio
 	,rank() over (order by return_ratio) as return_rank
 	,rank() over (order by currency_ratio) as currency_rank
 	from
 	(	select ws.ws_item_sk as item
 		,(cast(sum(coalesce(wr.wr_return_quantity,0)) as decimal(15,4))/
 		cast(sum(coalesce(ws.ws_quantity,0)) as decimal(15,4) )) as return_ratio
 		,(cast(sum(coalesce(wr.wr_return_amt,0)) as decimal(15,4))/
 		cast(sum(coalesce(ws.ws_net_paid,0)) as decimal(15,4) )) as currency_ratio
 		from
 		 web_sales ws left outer join web_returns wr
 			on (ws.ws_order_number = wr.wr_order_number and
 			ws.ws_item_sk = wr.wr_item_sk)
                 ,date_dim
 		where
 			wr.wr_return_amt > 1
 			and ws.ws_net_profit > 1
                         and ws.ws_net_paid > 0
                         and ws.ws_quantity > 0
                         and ws_sold_date_sk = d_date_sk
                         and d_year = 2001
                         and d_moy = 12
 		group by ws.ws_item_sk
 	) in_web
 ) web
 where
 (
 web.return_rank <= 10
 or
 web.currency_rank <= 10
 )
 union
 select
 'catalog' as channel
 ,catalog.item
 ,catalog.return_ratio
 ,catalog.return_rank
 ,catalog.currency_rank
 from (
 	select
 	 item
 	,return_ratio
 	,currency_ratio
 	,rank() over (order by return_ratio) as return_rank
 	,rank() over (order by currency_ratio) as currency_rank
 	from
 	(	select
 		cs.cs_item_sk as item
 		,(cast(sum(coalesce(cr.cr_return_quantity,0)) as decimal(15,4))/
 		cast(sum(coalesce(cs.cs_quantity,0)) as decimal(15,4) )) as return_ratio
 		,(cast(sum(coalesce(cr.cr_return_amount,0)) as decimal(15,4))/
 		cast(sum(coalesce(cs.cs_net_paid,0)) as decimal(15,4) )) as currency_ratio
 		from
 		catalog_sales cs left outer join catalog_returns cr
 			on (cs.cs_order_number = cr.cr_order_number and
 			cs.cs_item_sk = cr.cr_item_sk)
                ,date_dim
 		where
 			cr.cr_return_amount > 1
 			and cs.cs_net_profit > 1
                         and cs.cs_net_paid > 0
                         and cs.cs_quantity > 0
                         and cs_sold_date_sk = d_date_sk
                         and d_year = 2001
                         and d_moy = 12
                 group by cs.cs_item_sk
 	) in_cat
 ) catalog
 where
 (
 catalog.return_rank <= 10
 or
 catalog.currency_rank <=10
 )
 union
 select
 'store' as channel
 ,store.item
 ,store.return_ratio
 ,store.return_rank
 ,store.currency_rank
 from (
 	select
 	 item
 	,return_ratio
 	,currency_ratio
 	,rank() over (order by return_ratio) as return_rank
 	,rank() over (order by currency_ratio) as currency_rank
 	from
 	(	select sts.ss_item_sk as item
 		,(cast(sum(coalesce(sr.sr_return_quantity,0)) as decimal(15,4))/cast(sum(coalesce(sts.ss_quantity,0)) as decimal(15,4) )) as return_ratio
 		,(cast(sum(coalesce(sr.sr_return_amt,0)) as decimal(15,4))/cast(sum(coalesce(sts.ss_net_paid,0)) as decimal(15,4) )) as currency_ratio
 		from
 		store_sales sts left outer join store_returns sr
 			on (sts.ss_ticket_number = sr.sr_ticket_number and sts.ss_item_sk = sr.sr_item_sk)
                ,date_dim
 		where
 			sr.sr_return_amt > 1
 			and sts.ss_net_profit > 1
                         and sts.ss_net_paid > 0
                         and sts.ss_quantity > 0
                         and ss_sold_date_sk = d_date_sk
                         and d_year = 2001
                         and d_moy = 12
 		group by sts.ss_item_sk
 	) in_store
 ) store
 where  (
 store.return_rank <= 10
 or
 store.currency_rank <= 10
 )
 )
 order by 1,4,5,2
 limit 100
"""

Q66 = """select
         w_warehouse_name
 	,w_warehouse_sq_ft
 	,w_city
 	,w_county
 	,w_state
 	,w_country
        ,ship_carriers
        ,year
 	,sum(jan_sales) as jan_sales
 	,sum(feb_sales) as feb_sales
 	,sum(mar_sales) as mar_sales
 	,sum(apr_sales) as apr_sales
 	,sum(may_sales) as may_sales
 	,sum(jun_sales) as jun_sales
 	,sum(jul_sales) as jul_sales
 	,sum(aug_sales) as aug_sales
 	,sum(sep_sales) as sep_sales
 	,sum(oct_sales) as oct_sales
 	,sum(nov_sales) as nov_sales
 	,sum(dec_sales) as dec_sales
 	,sum(jan_sales/w_warehouse_sq_ft) as jan_sales_per_sq_foot
 	,sum(feb_sales/w_warehouse_sq_ft) as feb_sales_per_sq_foot
 	,sum(mar_sales/w_warehouse_sq_ft) as mar_sales_per_sq_foot
 	,sum(apr_sales/w_warehouse_sq_ft) as apr_sales_per_sq_foot
 	,sum(may_sales/w_warehouse_sq_ft) as may_sales_per_sq_foot
 	,sum(jun_sales/w_warehouse_sq_ft) as jun_sales_per_sq_foot
 	,sum(jul_sales/w_warehouse_sq_ft) as jul_sales_per_sq_foot
 	,sum(aug_sales/w_warehouse_sq_ft) as aug_sales_per_sq_foot
 	,sum(sep_sales/w_warehouse_sq_ft) as sep_sales_per_sq_foot
 	,sum(oct_sales/w_warehouse_sq_ft) as oct_sales_per_sq_foot
 	,sum(nov_sales/w_warehouse_sq_ft) as nov_sales_per_sq_foot
 	,sum(dec_sales/w_warehouse_sq_ft) as dec_sales_per_sq_foot
 	,sum(jan_net) as jan_net
 	,sum(feb_net) as feb_net
 	,sum(mar_net) as mar_net
 	,sum(apr_net) as apr_net
 	,sum(may_net) as may_net
 	,sum(jun_net) as jun_net
 	,sum(jul_net) as jul_net
 	,sum(aug_net) as aug_net
 	,sum(sep_net) as sep_net
 	,sum(oct_net) as oct_net
 	,sum(nov_net) as nov_net
 	,sum(dec_net) as dec_net
 from (

 select w_warehouse_name
 	,w_warehouse_sq_ft
 	,w_city
 	,w_county
 	,w_state
 	,w_country
 	,'DHL' || ',' || 'BARIAN' as ship_carriers
       ,d_year as year
	,sum(case when d_moy = 1 then ws_ext_sales_price* ws_quantity else 0 end) as jan_sales
	,sum(case when d_moy = 2 then ws_ext_sales_price* ws_quantity else 0 end) as feb_sales
	,sum(case when d_moy = 3 then ws_ext_sales_price* ws_quantity else 0 end) as mar_sales
	,sum(case when d_moy = 4 then ws_ext_sales_price* ws_quantity else 0 end) as apr_sales
	,sum(case when d_moy = 5 then ws_ext_sales_price* ws_quantity else 0 end) as may_sales
	,sum(case when d_moy = 6 then ws_ext_sales_price* ws_quantity else 0 end) as jun_sales
	,sum(case when d_moy = 7 then ws_ext_sales_price* ws_quantity else 0 end) as jul_sales
	,sum(case when d_moy = 8 then ws_ext_sales_price* ws_quantity else 0 end) as aug_sales
	,sum(case when d_moy = 9 then ws_ext_sales_price* ws_quantity else 0 end) as sep_sales
	,sum(case when d_moy = 10 then ws_ext_sales_price* ws_quantity else 0 end) as oct_sales
	,sum(case when d_moy = 11 then ws_ext_sales_price* ws_quantity else 0 end) as nov_sales
	,sum(case when d_moy = 12 then ws_ext_sales_price* ws_quantity else 0 end) as dec_sales
	,sum(case when d_moy = 1 then ws_net_paid * ws_quantity else 0 end) as jan_net
	,sum(case when d_moy = 2 then ws_net_paid * ws_quantity else 0 end) as feb_net
	,sum(case when d_moy = 3 then ws_net_paid * ws_quantity else 0 end) as mar_net
	,sum(case when d_moy = 4 then ws_net_paid * ws_quantity else 0 end) as apr_net
	,sum(case when d_moy = 5 then ws_net_paid * ws_quantity else 0 end) as may_net
	,sum(case when d_moy = 6 then ws_net_paid * ws_quantity else 0 end) as jun_net
	,sum(case when d_moy = 7 then ws_net_paid * ws_quantity else 0 end) as jul_net
	,sum(case when d_moy = 8 then ws_net_paid * ws_quantity else 0 end) as aug_net
	,sum(case when d_moy = 9 then ws_net_paid * ws_quantity else 0 end) as sep_net
	,sum(case when d_moy = 10 then ws_net_paid * ws_quantity else 0 end) as oct_net
	,sum(case when d_moy = 11 then ws_net_paid * ws_quantity else 0 end) as nov_net
	,sum(case when d_moy = 12 then ws_net_paid * ws_quantity else 0 end) as dec_net
     from
          web_sales
         ,warehouse
         ,date_dim
         ,time_dim
 	  ,ship_mode
     where
            ws_warehouse_sk =  w_warehouse_sk
        and ws_sold_date_sk = d_date_sk
        and ws_sold_time_sk = t_time_sk
 	and ws_ship_mode_sk = sm_ship_mode_sk
       and d_year = 2001
       and t_time between 30838 and 30838+28800
       and sm_carrier in ('DHL','BARIAN')
     group by
        w_warehouse_name
 	,w_warehouse_sq_ft
 	,w_city
 	,w_county
 	,w_state
 	,w_country
       ,d_year

 union all

 select w_warehouse_name
 	,w_warehouse_sq_ft
 	,w_city
 	,w_county
 	,w_state
 	,w_country
 	,'DHL' || ',' || 'BARIAN' as ship_carriers
       ,d_year as year
	,sum(case when d_moy = 1 then cs_sales_price* cs_quantity else 0 end) as jan_sales
	,sum(case when d_moy = 2 then cs_sales_price* cs_quantity else 0 end) as feb_sales
	,sum(case when d_moy = 3 then cs_sales_price* cs_quantity else 0 end) as mar_sales
	,sum(case when d_moy = 4 then cs_sales_price* cs_quantity else 0 end) as apr_sales
	,sum(case when d_moy = 5 then cs_sales_price* cs_quantity else 0 end) as may_sales
	,sum(case when d_moy = 6 then cs_sales_price* cs_quantity else 0 end) as jun_sales
	,sum(case when d_moy = 7 then cs_sales_price* cs_quantity else 0 end) as jul_sales
	,sum(case when d_moy = 8 then cs_sales_price* cs_quantity else 0 end) as aug_sales
	,sum(case when d_moy = 9 then cs_sales_price* cs_quantity else 0 end) as sep_sales
	,sum(case when d_moy = 10 then cs_sales_price* cs_quantity else 0 end) as oct_sales
	,sum(case when d_moy = 11 then cs_sales_price* cs_quantity else 0 end) as nov_sales
	,sum(case when d_moy = 12 then cs_sales_price* cs_quantity else 0 end) as dec_sales
	,sum(case when d_moy = 1 then cs_net_paid_inc_tax * cs_quantity else 0 end) as jan_net
	,sum(case when d_moy = 2 then cs_net_paid_inc_tax * cs_quantity else 0 end) as feb_net
	,sum(case when d_moy = 3 then cs_net_paid_inc_tax * cs_quantity else 0 end) as mar_net
	,sum(case when d_moy = 4 then cs_net_paid_inc_tax * cs_quantity else 0 end) as apr_net
	,sum(case when d_moy = 5 then cs_net_paid_inc_tax * cs_quantity else 0 end) as may_net
	,sum(case when d_moy = 6 then cs_net_paid_inc_tax * cs_quantity else 0 end) as jun_net
	,sum(case when d_moy = 7 then cs_net_paid_inc_tax * cs_quantity else 0 end) as jul_net
	,sum(case when d_moy = 8 then cs_net_paid_inc_tax * cs_quantity else 0 end) as aug_net
	,sum(case when d_moy = 9 then cs_net_paid_inc_tax * cs_quantity else 0 end) as sep_net
	,sum(case when d_moy = 10 then cs_net_paid_inc_tax * cs_quantity else 0 end) as oct_net
	,sum(case when d_moy = 11 then cs_net_paid_inc_tax * cs_quantity else 0 end) as nov_net
	,sum(case when d_moy = 12 then cs_net_paid_inc_tax * cs_quantity else 0 end) as dec_net
     from
          catalog_sales
         ,warehouse
         ,date_dim
         ,time_dim
 	 ,ship_mode
     where
            cs_warehouse_sk =  w_warehouse_sk
        and cs_sold_date_sk = d_date_sk
        and cs_sold_time_sk = t_time_sk
 	and cs_ship_mode_sk = sm_ship_mode_sk
       and d_year = 2001
       and t_time between 30838 and 30838+28800
       and sm_carrier in ('DHL','BARIAN')
     group by
        w_warehouse_name
 	,w_warehouse_sq_ft
 	,w_city
 	,w_county
 	,w_state
 	,w_country
       ,d_year

 ) x
 group by
        w_warehouse_name
 	,w_warehouse_sq_ft
 	,w_city
 	,w_county
 	,w_state
 	,w_country
 	,ship_carriers
        ,year
 order by w_warehouse_name
 limit 100"""

Q85 = """
select substr(r_reason_desc,1,20)
       ,avg(ws_quantity)
       ,avg(wr_refunded_cash)
       ,avg(wr_fee)
 from web_sales, web_returns, web_page, customer_demographics cd1,
      customer_demographics cd2, customer_address, date_dim, reason
 where ws_web_page_sk = wp_web_page_sk
   and ws_item_sk = wr_item_sk
   and ws_order_number = wr_order_number
   and ws_sold_date_sk = d_date_sk and d_year = 2000
   and cd1.cd_demo_sk = wr_refunded_cdemo_sk
   and cd2.cd_demo_sk = wr_returning_cdemo_sk
   and ca_address_sk = wr_refunded_addr_sk
   and r_reason_sk = wr_reason_sk
   and
   (
    (
     cd1.cd_marital_status = 'M'
     and
     cd1.cd_marital_status = cd2.cd_marital_status
     and
     cd1.cd_education_status = '4 yr Degree'
     and
     cd1.cd_education_status = cd2.cd_education_status
     and
     ws_sales_price between 50.00 and 100.00
    )
   or
    (
     cd1.cd_marital_status = 'S'
     and
     cd1.cd_marital_status = cd2.cd_marital_status
     and
     cd1.cd_education_status = 'College'
     and
     cd1.cd_education_status = cd2.cd_education_status
     and
     ws_sales_price between 25.00 and 75.00
    )
   or
    (
     cd1.cd_marital_status = 'D'
     and
     cd1.cd_marital_status = cd2.cd_marital_status
     and
     cd1.cd_education_status = '2 yr Degree'
     and
     cd1.cd_education_status = cd2.cd_education_status
     and
     ws_sales_price between 0.00 and 50.00
    )
   )
   and
   (
    (
     ca_country = 'United States'
     and
     ca_state in ('IL','CA','TX')
     and ws_net_profit between 0 and 200
    )
    or
    (
     ca_country = 'United States'
     and
     ca_state in ('GA','CA','TX')
     and ws_net_profit between 50 and 300
    )
    or
    (
     ca_country = 'United States'
     and
     ca_state in ('IL','GA','TX')
     and ws_net_profit between 0 and 250
    )
   )
group by r_reason_desc
order by substr(r_reason_desc,1,20)
        ,avg(ws_quantity)
        ,avg(wr_refunded_cash)
        ,avg(wr_fee)
limit 100
"""


def test_tpcds_q49_text(tpcds):
    """q49 verbatim — worst return ratios per channel via decimal-cast
    ratios ranked twice and UNIONed (10 significant digits: the engines'
    decimal-division result scales differ)."""
    spark, con = tpcds
    _compare(spark, con, Q49, ordered=False, min_rows=5, approx=True)


def test_tpcds_q66_text(tpcds):
    """q66 verbatim — 12-month web+catalog warehouse shipping pivot
    (44-column report, per-square-foot ratios)."""
    spark, con = tpcds
    _compare(spark, con, Q66, ordered=True, min_rows=2)


def test_tpcds_q85_text(tpcds):
    """q85 verbatim — refund demographics with cd1=cd2 equality branches
    over web returns."""
    spark, con = tpcds
    _compare(spark, con, Q85, ordered=True, min_rows=1, check_names=False)
