"""Golden pin of the five §2.9 dashboard slices THROUGH the demo's chart
layer (scripts/demo_retail.py -> plans/semantic.py) — the reference's
only human-visible outputs, asserted end-to-end over the FIXTURES.md
retail fixture (the synthetic analogue of the published dashboard's
7.96M revenue / 1468 null-customer invoices / top-10 ordering).

Fixture arithmetic (kept rows only; see tests/test_pipeline_golden.ROWS):
  536365  85123 MUG       6 x 2.55 = 15.30   17850 UK        2009-12-01
  536366  71053 LANTERN   3 x 3.39 = 10.17   17850 UK        2009-12-02
  536369  21730 GLASS     4 x 4.25 = 17.00   unknown/NULL    2009-12-05
  536370  00000 (null)    2 x 1.00 =  2.00   13047 Belgium*  2009-12-05
  536373  21730 GLASS     1 x 4.25 =  4.25   13047 Belgium*  2009-12-07
  536374  21730 GLASS v2  1 x 4.25 =  4.25   17850 UK        2009-12-08
  536375  85123 MUG       2 x 2.55 =  5.10   17850 UK        2009-12-09  (x2)
  (* 13047's country is Belgium after SCD1 keep-last; 21730's product
   description is "GLASS v2" after keep-last — every 21730 fact joins it.)
"""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo/scripts")

from demo_retail import build_virtual_dataset, dashboard_charts

from etl_online_retail_spark.pipeline.retail import build_warehouse
from etl_online_retail_spark.plans.semantic import chart_query

TOTAL = 63.17  # 15.30+10.17+17.00+2.00+4.25+4.25+5.10+5.10


@pytest.fixture(scope="module")
def vds(spark):
    from tests.test_pipeline_golden import RAW_SCHEMA, ROWS

    raw = spark.createDataFrame(ROWS, RAW_SCHEMA)
    out = build_virtual_dataset(build_warehouse(raw))
    out.cache()
    yield out
    out.unpersist()


def _rows(vds, title):
    return chart_query(vds, dashboard_charts()[title]).collect()


def test_slice2_total_revenue(vds):
    rows = _rows(vds, "Total Revenue (slice 2)")
    assert len(rows) == 1
    assert float(rows[0].total_revenue) == pytest.approx(TOTAL)


def test_slice3_revenue_by_month(vds):
    rows = _rows(vds, "Revenue by month (slice 3)")
    got = {str(r[0])[:7]: float(r.revenue) for r in rows}
    assert got == {"2009-12": pytest.approx(TOTAL)}


def test_slice5_top10_products(vds):
    rows = _rows(vds, "Top 10 products (slice 5)")
    got = {r.prod_name: float(r.revenue) for r in rows}
    assert got == {"MUG": pytest.approx(25.50),
                   "GLASS v2": pytest.approx(25.50),   # keep-last desc
                   "LANTERN": pytest.approx(10.17),
                   None: pytest.approx(2.00)}          # unknown product
    # ordered by the metric DESC: the tied leaders precede the rest
    revs = [float(r.revenue) for r in rows]
    assert revs == sorted(revs, reverse=True)


def test_slice6_customer_location_donut(vds):
    rows = _rows(vds, "Customer location (slice 6)")
    got = {r.cust_country: r.n_customers for r in rows}
    # 17850 in the UK, 13047 keep-last Belgium, the unknown member NULL
    assert got == {"United Kingdom": 1, "Belgium": 1, None: 1}


def test_slice7_null_customer_invoices(vds):
    rows = _rows(vds, "Invoices lacking customer info (slice 7)")
    assert len(rows) == 1
    assert rows[0].n_invoices == 1  # only 536369
