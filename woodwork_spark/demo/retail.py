"""Demo retail dataset (reference demo/retail.py:14-72).

The reference downloads a public CSV; this environment has no network, so
the same-schema dataset is synthesized deterministically (seed 42) —
column names, logical types, index, and time index match the reference's
``load_retail`` exactly, so every example written against it runs
unchanged.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import SparkSession

_PRODUCTS = [
    ("85123A", "WHITE HANGING HEART T-LIGHT HOLDER", 2.55),
    ("71053", "WHITE METAL LANTERN", 3.39),
    ("84406B", "CREAM CUPID HEARTS COAT HANGER", 2.75),
    ("84029G", "KNITTED UNION FLAG HOT WATER BOTTLE", 3.39),
    ("84029E", "RED WOOLLY HOTTIE WHITE HEART", 3.39),
    ("22752", "SET 7 BABUSHKA NESTING BOXES", 7.65),
    ("21730", "GLASS STAR FROSTED T-LIGHT HOLDER", 4.25),
    ("22633", "HAND WARMER UNION JACK", 1.85),
    ("22632", "HAND WARMER RED POLKA DOT", 1.85),
    ("84879", "ASSORTED COLOUR BIRD ORNAMENT", 1.69),
]
_CUSTOMERS = [
    "Andrea Brown", "Beth Clark", "Carlos Diaz", "Dana Evans",
    "Erin Foster", "Felix Green", "Gina Harris", "Hugo Ibanez",
]
_COUNTRIES = ["United Kingdom", "France", "Germany", "Spain", "Netherlands"]


def load_retail(id="demo_retail_data", nrows=None, init_woodwork=True, spark=None):
    """Synthetic stand-in for the reference's ``load_retail``: returns a
    Spark DataFrame (typed via ``init`` when ``init_woodwork``) with the
    reference's columns — order_product_id, order_id, product_id,
    description, quantity, order_date, unit_price, customer_name,
    country, total, cancelled."""
    spark = spark or SparkSession.getActiveSession() or SparkSession.builder.getOrCreate()
    n = nrows if nrows is not None else 1000
    base = _dt.datetime(2018, 1, 1, 8, 0, 0)
    rows = []
    state = 42
    for i in range(n):
        # deterministic LCG so the dataset is identical across runs/engines
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        r = state
        prod = _PRODUCTS[r % len(_PRODUCTS)]
        qty = 1 + (r >> 8) % 24
        cancelled = ((r >> 16) % 50) == 0
        rows.append(
            (
                i,
                f"5{36365 + i // 5}",
                prod[0],
                prod[1],
                int(qty) * (-1 if cancelled else 1),
                base + _dt.timedelta(minutes=7 * i),
                prod[2],
                _CUSTOMERS[(r >> 24) % len(_CUSTOMERS)],
                _COUNTRIES[(r >> 32) % len(_COUNTRIES)],
                round(prod[2] * qty, 2),
                cancelled,
            ),
        )
    df = spark.createDataFrame(
        rows,
        "order_product_id long, order_id string, product_id string,"
        " description string, quantity long, order_date timestamp,"
        " unit_price double, customer_name string, country string,"
        " total double, cancelled boolean",
    )
    if not init_woodwork:
        return df
    from woodwork_spark.accessor import init

    return init(
        df,
        name=id,
        index="order_product_id",
        time_index="order_date",
        logical_types={
            "order_product_id": "Categorical",
            "order_id": "Categorical",
            "product_id": "Categorical",
            "description": "NaturalLanguage",
            "quantity": "Integer",
            "order_date": "Datetime",
            "unit_price": "Double",
            "customer_name": "Categorical",
            "country": "Categorical",
            "total": "Double",
            "cancelled": "Boolean",
        },
    )
