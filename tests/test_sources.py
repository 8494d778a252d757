"""Boundary sources: CSV staging round-trip, warehouse DDL, catalog."""

from __future__ import annotations

import os
import tempfile

import pytest

from pyspark.sql import functions as F

from etl_online_retail_spark.catalog import SCHEMAS, load_table
from etl_online_retail_spark.sources.ddl import init_warehouse
from etl_online_retail_spark.sources.staging import (
    read_staging_csv,
    read_staging_parquet,
    write_staging_csv,
    write_staging_parquet,
)

SF = "/root/testdata/sf0.001"


def test_catalog_schemas_enforced(spark):
    for name in ("lineitem", "orders", "customer", "events"):
        df = load_table(spark, name, SF)
        assert df.schema.fieldNames()  # loads
        if name != "events":
            assert df.schema == SCHEMAS[name]


def test_parquet_staging_roundtrip_preserves_types(spark):
    orders = load_table(spark, "orders", SF)
    with tempfile.TemporaryDirectory() as d:
        write_staging_parquet(orders, f"{d}/orders")
        back = read_staging_parquet(spark, f"{d}/orders")
        assert back.schema == orders.schema
        assert back.count() == orders.count()


def test_csv_staging_requires_schema_and_roundtrips_values(spark):
    # CSV degrades types (SURVEY.md §1.3) - the reader re-pins the schema,
    # mirroring the reference's dtype maps on every read.
    orders = load_table(spark, "orders", SF).select(
        "o_orderkey", "o_orderstatus", "o_totalprice")
    with tempfile.TemporaryDirectory() as d:
        write_staging_csv(orders, f"{d}/orders")
        back = read_staging_csv(
            spark, f"{d}/orders",
            schema="o_orderkey long, o_orderstatus string, o_totalprice double")
        assert back.schema.simpleString() == orders.schema.simpleString()
        a = orders.agg(F.sum("o_orderkey"), F.count(F.lit(1))).collect()[0]
        b = back.agg(F.sum("o_orderkey"), F.count(F.lit(1))).collect()[0]
        assert tuple(a) == tuple(b)


def test_init_warehouse_ddl_and_seeds(spark):
    init_warehouse(spark, drop_first=True)
    try:
        tables = {r.tableName for r in spark.sql("SHOW TABLES IN retail").collect()}
        assert {"dim_customers", "dim_products", "dim_dates",
                "fct_invoices"} <= tables
        seed = spark.sql(
            "SELECT customer_dim_id, customer_id, country "
            "FROM retail.dim_customers").collect()
        assert len(seed) == 1
        assert (seed[0].customer_dim_id, seed[0].customer_id,
                seed[0].country) == (1, "00000", None)
    finally:
        spark.sql("DROP DATABASE IF EXISTS retail CASCADE")


# S1 Excel boundary (etl.py:46-52): exercised WITHOUT openpyxl via the
# stdlib zip/XML reader. The fixture is a hand-built minimal xlsx - shared
# strings for text cells, plain <v> numbers, an Excel day-serial date - the
# cell types the retail export uses.

def _write_fixture_xlsx(path: str) -> None:
    import zipfile

    header = ["Invoice", "StockCode", "Description", "Quantity",
              "InvoiceDate", "Price", "Customer ID", "Country"]
    # rows exercise: alphanumeric StockCode (int parser would mangle),
    # leading-zero-able Invoice kept string, null Customer ID
    strings = header + ["536365", "85123A", "WHITE HANGING HEART", "UK",
                        "536366", "22423", "REGENCY CAKESTAND"]
    si = "".join(f"<si><t>{s}</t></si>" for s in strings)
    shared = (f'<?xml version="1.0"?><sst count="{len(strings)}" '
              f'uniqueCount="{len(strings)}">{si}</sst>')

    def s(ref, i):  # shared-string cell
        return f'<c r="{ref}" t="s"><v>{i}</v></c>'

    def n(ref, v):  # numeric cell
        return f'<c r="{ref}"><v>{v}</v></c>'

    hdr = "".join(s(f"{chr(65 + i)}1", i) for i in range(8))
    # 2010-12-01 08:26 as an Excel day serial (1900 system)
    serial = 40513 + (8 * 60 + 26) / 1440.0
    row2 = (s("A2", 8) + s("B2", 9) + s("C2", 10) + n("D2", 6)
            + n("E2", serial) + n("F2", 2.55) + n("G2", 17850) + s("H2", 11))
    row3 = (s("A3", 12) + s("B3", 13) + s("C3", 14) + n("D3", 12)
            + n("E3", serial + 1) + n("F3", 12.75) + s("H3", 11))  # no cust
    sheet = ('<?xml version="1.0"?><worksheet><sheetData>'
             f'<row r="1">{hdr}</row><row r="2">{row2}</row>'
             f'<row r="3">{row3}</row></sheetData></worksheet>')
    with zipfile.ZipFile(path, "w") as z:
        z.writestr("[Content_Types].xml",
                   '<?xml version="1.0"?><Types '
                   'xmlns="http://schemas.openxmlformats.org/package/2006/'
                   'content-types"/>')
        z.writestr("xl/sharedStrings.xml", shared)
        z.writestr("xl/worksheets/sheet1.xml", sheet)


def test_excel_ingestion_without_openpyxl(spark):
    from etl_online_retail_spark.sources.excel import RAW_SCHEMA, ingest_excel

    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/retail.xlsx"
        _write_fixture_xlsx(path)
        df = ingest_excel(spark, path)
        assert df.schema == RAW_SCHEMA
        rows = {r.Invoice: r for r in df.collect()}
        assert set(rows) == {"536365", "536366"}
        r1, r2 = rows["536365"], rows["536366"]
        assert r1.StockCode == "85123A"          # not mangled to int
        assert (r1.Quantity, r1.Price) == (6, 2.55)
        assert r1["Customer ID"] == 17850
        assert r2["Customer ID"] is None         # nullable Int32 survives
        assert (r1.InvoiceDate.year, r1.InvoiceDate.month,
                r1.InvoiceDate.day, r1.InvoiceDate.hour,
                r1.InvoiceDate.minute) == (2010, 12, 1, 8, 26)
        assert r1.Country == "UK"


def test_jsonl_roundtrip_documents(spark):
    from etl_online_retail_spark.sources.formats import read_jsonl, write_jsonl

    docs = load_table(spark, "documents", SF)
    with tempfile.TemporaryDirectory() as d:
        write_jsonl(docs, f"{d}/docs")
        back = read_jsonl(spark, f"{d}/docs", docs.schema)
        assert back.count() == docs.count()
        a = docs.agg(F.sum("doc_id"), F.sum(F.length("text"))).collect()[0]
        b = back.agg(F.sum("doc_id"), F.sum(F.length("text"))).collect()[0]
        assert tuple(a) == tuple(b)


def test_jsonl_permissive_nulls_malformed_strict_raises(spark):
    import os

    from etl_online_retail_spark.sources.formats import (
        read_jsonl,
        read_jsonl_strict,
    )

    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "part-0.jsonl")
        with open(p, "w") as f:
            f.write('{"doc_id": 1, "text": "ok"}\n')
            f.write('{"doc_id": "NOT_A_NUMBER", "text": "bad"}\n')
        schema = "doc_id long, text string"
        rows = read_jsonl(spark, d, schema).collect()
        assert len(rows) == 2  # permissive: row kept, bad field nulled
        assert sorted([r.doc_id for r in rows], key=str) == [1, None]
        try:
            read_jsonl_strict(spark, d, schema).collect()
            raised = False
        except Exception:
            raised = True
        assert raised, "FAILFAST must abort on the malformed line"


def test_orc_roundtrip_preserves_types_and_pushdown(spark):
    from etl_online_retail_spark.sources.formats import read_orc, write_orc

    orders = load_table(spark, "orders", SF)
    with tempfile.TemporaryDirectory() as d:
        write_orc(orders, f"{d}/orders")
        back = read_orc(spark, f"{d}/orders", orders.schema)
        assert back.schema == orders.schema
        assert back.count() == orders.count()
        # predicate pushdown reaches the ORC scan
        plan = (back.filter(F.col("o_orderkey") == 7)
                ._jdf.queryExecution().executedPlan().toString())
        assert "PushedFilters: [" in plan and "o_orderkey" in plan


def test_jdbc_roundtrip_serial_parity_with_inplan_surrogate(spark, tmp_path):
    """S4/S5 integration: the reference's only network boundary executed
    for real. Round-trips the customer dim through an embedded Derby
    warehouse (the JDBC driver Spark itself ships) with a DB-assigned
    IDENTITY key — the Postgres SERIAL flow of etl.py:145-205 — and
    asserts the read-back keys equal the in-plan dense_keys surrogate
    path exactly: same 1..N+1 ids, same natural-key mapping, unknown
    member seeded at id 1 (init_db.sql:8-13)."""
    from etl_online_retail_spark.sources.jdbc import append_jdbc, read_jdbc
    from etl_online_retail_spark.workload import q_customer_dim_build

    jvm = spark._jvm
    jvm.java.lang.System.setProperty(
        "derby.stream.error.file", str(tmp_path / "derby.log"))
    url = f"jdbc:derby:{tmp_path}/warehouse;create=true"
    drv = "org.apache.derby.jdbc.EmbeddedDriver"
    jvm.java.lang.Class.forName(drv)
    conn = jvm.java.sql.DriverManager.getConnection(url)
    st = conn.createStatement()
    st.executeUpdate(
        "CREATE TABLE dim_customers ("
        "customer_dim_id INT GENERATED ALWAYS AS IDENTITY "
        "(START WITH 1, INCREMENT BY 1) PRIMARY KEY, "
        "customer_id VARCHAR(16) NOT NULL, c_name VARCHAR(64))")
    # unknown-member seed takes identity 1, as INSERT ... (DEFAULT, '00000')
    st.executeUpdate(
        "INSERT INTO dim_customers (customer_id, c_name) "
        "VALUES ('00000', NULL)")
    st.close()
    conn.close()

    c = (load_table(spark, "customer", SF)
         .select(F.lpad(F.col("c_custkey").cast("string"), 5, "0")
                  .alias("customer_id"),
                 F.col("c_name").cast("string").alias("c_name")))
    # one connection, natural-key order: the DB assigns 2..N+1 in the
    # same sequence the reference's sequential to_sql produced
    append_jdbc(c.coalesce(1).sortWithinPartitions("customer_id"),
                url, "dim_customers", driver=drv)

    n = c.count()
    back = read_jdbc(spark, url, "dim_customers",
                     partition_column="customer_dim_id",
                     num_partitions=4, lower_bound=1, upper_bound=n + 2,
                     driver=drv)
    assert back.rdd.getNumPartitions() == 4  # partitioned scan, not 1 task
    got = sorted(map(tuple, back.select(
        "customer_dim_id", "customer_id", "c_name").collect()))
    want = sorted(map(tuple,
                      q_customer_dim_build(spark, SF).collect()))
    assert got == want


@pytest.mark.skipif(
    not (os.environ.get("SPARK_GRAFT_PG_URL")
         and os.environ.get("SPARK_GRAFT_PG_JAR")),
    reason="no Postgres in this sandbox: set SPARK_GRAFT_PG_URL "
           "(jdbc:postgresql://...) and SPARK_GRAFT_PG_JAR (driver jar "
           "path) to run the real-dialect SERIAL parity suite; until "
           "then the embedded-Derby IDENTITY parity test above stands")
def test_jdbc_roundtrip_serial_parity_postgres(spark, tmp_path):
    """Round-5 verdict #7: the Derby parity suite against REAL Postgres
    SERIAL semantics (etl.py:145-205's actual warehouse), env-gated on a
    reachable server + driver jar. Same contract as the Derby twin: the
    DB assigns 2..N+1 in insertion order after the id-1 unknown-member
    seed, and the read-back equals the in-plan dense_keys surrogates."""
    from etl_online_retail_spark.sources.jdbc import append_jdbc, read_jdbc
    from etl_online_retail_spark.workload import q_customer_dim_build

    url = os.environ["SPARK_GRAFT_PG_URL"]
    jar = os.environ["SPARK_GRAFT_PG_JAR"]
    spark._jsc.addJar(jar)
    drv = "org.postgresql.Driver"
    jvm = spark._jvm
    jvm.java.lang.Class.forName(drv)
    props = jvm.java.util.Properties()
    conn = jvm.java.sql.DriverManager.getConnection(url, props)
    st = conn.createStatement()
    st.executeUpdate("DROP TABLE IF EXISTS dim_customers_parity")
    st.executeUpdate(
        "CREATE TABLE dim_customers_parity ("
        "customer_dim_id SERIAL PRIMARY KEY, "
        "customer_id VARCHAR(16) NOT NULL, c_name VARCHAR(64))")
    st.executeUpdate(
        "INSERT INTO dim_customers_parity (customer_id, c_name) "
        "VALUES ('00000', NULL)")
    st.close()
    conn.close()

    c = (load_table(spark, "customer", SF)
         .select(F.lpad(F.col("c_custkey").cast("string"), 5, "0")
                  .alias("customer_id"),
                 F.col("c_name").cast("string").alias("c_name")))
    append_jdbc(c.coalesce(1).sortWithinPartitions("customer_id"),
                url, "dim_customers_parity", driver=drv)
    n = c.count()
    back = read_jdbc(spark, url, "dim_customers_parity",
                     partition_column="customer_dim_id",
                     num_partitions=4, lower_bound=1, upper_bound=n + 2,
                     driver=drv)
    got = sorted(map(tuple, back.select(
        "customer_dim_id", "customer_id", "c_name").collect()))
    want = sorted(map(tuple,
                      q_customer_dim_build(spark, SF).collect()))
    assert got == want
